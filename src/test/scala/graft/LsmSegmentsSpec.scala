package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LsmSegments
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Protocol-level laws of the shared LSM segment layer that no tier
  * spec exercises: gc's tolerance of marker-directory junk it didn't
  * write, and the single-writer tripwire under an ACTUAL two-thread
  * race (the exclusive-marker contract every tier inherits). */
class LsmSegmentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def newStore(): String = {
    val p = Files.createTempDirectory("graft_lsm_spec").toString
    LsmSegments.initBase(spark, p)(b => {
      Files.createDirectories(Paths.get(b))
      Files.write(Paths.get(b, "data.bin"), Array[Byte](1, 2, 3))
    })
    p
  }

  test("gc survives stray non-marker files in gens/ and leaves them alone") {
    // a _SUCCESS-style name splits to an empty first segment (which is
    // vacuously all-digits) and a >Long digit run overflows — both
    // previously aborted the whole sweep with NumberFormatException
    // from a bare toLong. gc must parse with Try, retire what it owns,
    // and ignore what it can't parse.
    val p = newStore()
    Files.write(Paths.get(p, "gens", "_SUCCESS"), Array.emptyByteArray)
    Files.write(Paths.get(p, "gens", "99999999999999999999999_0"),
      Array.emptyByteArray)
    Files.write(Paths.get(p, "gens", "not_a_marker"), Array.emptyByteArray)
    // a name whose HEAD parses as a non-retained generation but whose
    // upto does not ("12_garbage") is invisible to genMarkers — gc
    // must leave it alone too (same parse for reads and deletes)
    Files.write(Paths.get(p, "gens", "12_garbage"), Array.emptyByteArray)
    // a second generation so gc has something real to retire
    Files.createDirectories(Paths.get(p, "base", "1"))
    Files.write(Paths.get(p, "base", "1", "data.bin"), Array[Byte](9))
    LsmSegments.writeGenMarker(spark, p, 1L, -1L)
    LsmSegments.gc(spark, p) // must not throw
    assert(!Files.exists(Paths.get(p, "gens", "0_-1")),
      "superseded real marker not retired")
    assert(Files.exists(Paths.get(p, "gens", "1_-1")),
      "current marker must survive gc")
    assert(Files.exists(Paths.get(p, "gens", "_SUCCESS")) &&
      Files.exists(Paths.get(p, "gens", "99999999999999999999999_0")) &&
      Files.exists(Paths.get(p, "gens", "12_garbage")),
      "gc deleted junk it cannot attribute to a generation")
    assert(LsmSegments.current(spark, p) == (1L, -1L))
  }

  test("two racing writers for one epoch: exactly one commits, the loser fails naming the contract, data uncorrupted") {
    // both threads pass the marker-absence check (barrier inside the
    // write step guarantees it), write an IDENTICAL payload, then race
    // to create the commit marker exclusively — the winner returns
    // true, the loser must throw the single-writer IllegalStateException
    // rather than silently "succeed" over the winner's commit.
    val p = newStore()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val payload = Array[Byte](42, 43, 44)
    def attempt(): Either[Throwable, Boolean] =
      try Right(LsmSegments.appendEpoch(spark, p, 7L) { d =>
        barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
        Files.createDirectories(Paths.get(d))
        Files.write(Paths.get(d, "data.bin"), payload,
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
          StandardOpenOption.WRITE)
      })
      catch { case t: Throwable => Left(t) }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence(Seq(Future(attempt()), Future(attempt()))), 60.seconds)
    val wins = results.collect { case Right(true) => () }
    val losses = results.collect { case Left(t) => t }
    assert(wins.size == 1, s"exactly one writer must commit, got: $results")
    assert(losses.size == 1, s"the loser must fail loudly, got: $results")
    losses.foreach { t =>
      assert(t.isInstanceOf[IllegalStateException] &&
        t.getMessage.contains("single-writer"),
        s"loser's error must name the contract: $t")
    }
    // the committed epoch is visible, replay-guarded, and its data is
    // exactly the payload (identical writes -> no interleaving hazard)
    assert(LsmSegments.committedEpochs(spark, p) == Seq(7L))
    assert(!LsmSegments.appendEpoch(spark, p, 7L)(_ => fail("replay re-wrote")))
    assert(Files.readAllBytes(
      Paths.get(p, "deltas", "7", "data.bin")).toSeq == payload.toSeq)
  }
}
