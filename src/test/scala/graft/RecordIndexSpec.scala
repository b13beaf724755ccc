package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RecordIndex

/** The durable ER screening index ([[graft.operators.RecordIndex]]):
  * the LSM delta-segment protocol carrying structured (id, name,
  * block) records — the fourth payload schema through the shared
  * machinery. */
class RecordIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def recs(rows: (Long, String, String)*) =
    rows.toDF("id", "name", "block")

  private def register = recs(
    (1L, "acme corp", "b1"), (2L, "zenith ltd", "b1"),
    (3L, "acme corp", "b2"), // same name, other block
    (10L, "nadir inc", "b1"), (11L, "acme corps", "b2"))

  private def probeSet(path: String, shard: org.apache.spark.sql.DataFrame,
      maxDist: Int = 1) =
    RecordIndex.probeShard(spark, path, shard, maxDist)
      .as[(Long, Long, Int)].collect().toSet

  test("probeShard matches within blocks across base and delta epochs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ri_spec_")
    val path = dir.toAbsolutePath.toString
    RecordIndex.write(register.where($"id" <= 3), path)
    assert(RecordIndex.appendEpoch(spark, path, 0L,
      register.where($"id" >= 10L)))
    val shard = recs((100L, "acme corpx", "b1"), (101L, "acme corpx", "b2"))
    // b1: only base row 1 within 1 edit; b2: base row 3 (dist 1) and
    // DELTA row 11 (dist 1) — the probe must see both segments
    assert(probeSet(path, shard) ==
      Set((100L, 1L, 1), (101L, 3L, 1), (101L, 11L, 1)))

    // replay is skipped and changes nothing
    assert(!RecordIndex.appendEpoch(spark, path, 0L, register))
    assert(probeSet(path, shard) ==
      Set((100L, 1L, 1), (101L, 3L, 1), (101L, 11L, 1)))

    // compaction + gc preserve the probe exactly
    RecordIndex.compact(spark, path)
    RecordIndex.gc(spark, path)
    assert(probeSet(path, shard) ==
      Set((100L, 1L, 1), (101L, 3L, 1), (101L, 11L, 1)))
  }

  test("probeShard touches only the shard's blocks; as-of excludes later epochs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ri_asof_")
    val path = dir.toAbsolutePath.toString
    RecordIndex.write(register.where($"id" <= 3), path)
    assert(RecordIndex.appendEpoch(spark, path, 0L,
      register.where($"id" >= 10L)))
    val shard = recs((101L, "acme corpx", "b2"))
    // full index sees both b2 matches; the base snapshot only row 3
    assert(probeSet(path, shard) == Set((101L, 3L, 1), (101L, 11L, 1)))
    val asOfBase = RecordIndex.probeShardOver(
      RecordIndex.readAsOf(spark, path, -1L), shard, maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(asOfBase == Set((101L, 3L, 1)),
      s"base snapshot must not see epoch 0: $asOfBase")
  }

  test("probeShard fails loudly when a block exceeds the pair budget") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ri_budget_")
    val path = dir.toAbsolutePath.toString
    RecordIndex.write(
      recs((1L to 30L).map(i => (i, s"name$i", "hot")): _*), path)
    val shard = recs((100L to 109L).map(i => (i, s"name$i", "hot")): _*)
    val e = intercept[Exception] {
      RecordIndex.probeShard(spark, path, shard, maxDist = 2,
        maxPairsPerBlock = 100L).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("maxPairsPerBlock")),
      s"wanted the loud block-budget message, got: ${e.getMessage}")
    // within budget the same probe serves
    assert(RecordIndex.probeShard(spark, path, shard, maxDist = 2,
      maxPairsPerBlock = 300L).count() > 0)
  }

  test("probeShard equals a driver-side brute force on random registers") {
    val rnd = new scala.util.Random(31)
    val names = Vector("alpha", "alphb", "alpzb", "beta", "betta")
    val idx = (1L to 60L).map(i =>
      (i, names(rnd.nextInt(names.size)), s"b${rnd.nextInt(3)}"))
    val shard = (200L to 215L).map(i =>
      (i, names(rnd.nextInt(names.size)) + "x", s"b${rnd.nextInt(3)}"))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ref = (for {
      s <- shard; x <- idx
      if s._3 == x._3
      dd = lev(s._2, x._2) if dd <= 2
    } yield (s._1, x._1, dd)).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_ri_brute_")
    val path = dir.toAbsolutePath.toString
    RecordIndex.write(recs(idx.take(30): _*), path)
    assert(RecordIndex.appendEpoch(spark, path, 0L, recs(idx.drop(30): _*)))
    assert(probeSet(path, recs(shard: _*), maxDist = 2) == ref)
  }

  test("probeShardMulti: field columns persist through the LSM lifecycle and screen at the register") {
    import graft.operators.EntityResolution.{FuzzyField, ExactField, NumericField}
    val fields = Seq(FuzzyField("name", maxDist = 1, weight = 3),
      ExactField("seg", weight = 2), NumericField("bal", tol = 50.0, weight = 1))
    def frecs(rows: (Long, String, String, String, Double)*) =
      rows.toDF("id", "name", "block", "seg", "bal")
    val reg = frecs(
      (1L, "acme corp", "b1", "AUTO", 100.0),
      (2L, "acme corpy", "b1", "AUTO", 500.0), // name+seg, bal off → 5
      (3L, "acme corp", "b1", "FOOD", 120.0), // name+bal, seg off → 4
      (4L, "zzzz zzzz", "b1", "AUTO", 100.0), // seg+bal only → 3, screened
      (5L, "acme corp", "b2", "AUTO", 100.0)) // other block — never paired
    val dir = java.nio.file.Files.createTempDirectory("graft_ri_multi_")
    val path = dir.toAbsolutePath.toString
    RecordIndex.write(reg.where($"id" <= 3), path)
    assert(RecordIndex.appendEpoch(spark, path, 0L, reg.where($"id" > 3)))
    val shard = frecs((100L, "acme corpx", "b1", "AUTO", 110.0))
    def multiSet() = {
      val m = RecordIndex.probeShardMulti(spark, path, shard, fields, minScore = 4)
      val got = m.as[(Long, Long, Int)].collect().toSet
      graft.operators.Storage.unpersistLocalCheckpoint(m)
      got
    }
    // 1: name 3 + seg 2 + bal 1 = 6; 2: 3+2 = 5; 3: 3+0+1 = 4;
    // 4: 0+2+1 = 3 screened out; 5: wrong block
    val want = Set((100L, 1L, 6), (100L, 2L, 5), (100L, 3L, 4))
    assert(multiSet() == want)
    // fields survive compaction + gc (segments fold byName, extras kept)
    RecordIndex.compact(spark, path)
    RecordIndex.gc(spark, path)
    assert(multiSet() == want)
    // the screen matches blockedPairsMulti's scorer on the same pool:
    // probe == the (shard × register) restriction of the batch scorer
    val pool = reg.unionByName(shard)
    val batch = graft.operators.EntityResolution.blockedPairsMulti(
      pool.withColumnRenamed("block", "blk"),
      blockCols = Seq("blk"), fields = fields, minScore = 4)
      .where($"b_id" === 100L)
      .select($"b_id", $"a_id", $"score")
      .as[(Long, Long, Int)].collect().toSet
    assert(batch == want)
  }

  test("probeShardMulti fails loudly when a block exceeds the pair budget") {
    import graft.operators.EntityResolution.FuzzyField
    def frecs(rows: (Long, String, String)*) = rows.toDF("id", "name", "block")
    val dir = java.nio.file.Files.createTempDirectory("graft_ri_mbud_")
    val path = dir.toAbsolutePath.toString
    RecordIndex.write(frecs((1L to 20L).map(i => (i, s"n$i", "hot")): _*), path)
    val shard = frecs((100L, "n1", "hot"), (101L, "n2", "hot"))
    val e = intercept[Exception] {
      RecordIndex.probeShardMulti(spark, path, shard,
        Seq(FuzzyField("name", maxDist = 1, weight = 1)), minScore = 1,
        maxPairsPerBlock = 10L).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("maxPairsPerBlock")),
      s"wanted budget guidance, got: ${e.getMessage}")
  }
}
