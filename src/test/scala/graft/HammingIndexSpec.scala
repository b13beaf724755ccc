package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, HammingIndex}
import graft.multimodal.Multimodal

/** The durable chunked-Hamming-signature index ([[HammingIndex]]):
  * the standard LSM tier battery (serve == batch over base∪deltas,
  * replay no-op, torn-segment invisibility, compact/gc) plus the
  * probe laws — the probe equals the all-pairs restriction to
  * shard-touching pairs (pigeonhole-exhaustive), planted perceptual
  * copies surface at hamming 0, and the hamming budget that would
  * break the pigeonhole is rejected loudly. */
class HammingIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sigs() = Multimodal.imageAHash(
    spark, Multimodal.imageAssets(
      spark, spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")))
    .toDF().withColumnRenamed("asset_id", "doc_id")
    .localCheckpoint(true)

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("serve over base∪deltas == batch pair law; replay/torn/compact/gc contracts hold") {
    val sg = sigs()
    val p = java.nio.file.Files.createTempDirectory("graft_ham_inc").toString
    HammingIndex.write(sg.where($"doc_id" % 3 === 0), p)
    HammingIndex.appendEpoch(spark, p, 0L, sg.where($"doc_id" % 3 === 1))
    HammingIndex.appendEpoch(spark, p, 1L, sg.where($"doc_id" % 3 === 2))
    def served() = pairSet(HammingIndex.servePairs(spark, p, maxHamming = 3))
    val want = pairSet(Dedup.hammingChunkPairs(sg, maxHamming = 3))
    assert(served() == want && want.nonEmpty,
      "incremental Hamming index diverges from the batch pair law")
    // replayed epoch: no-op
    assert(!HammingIndex.appendEpoch(spark, p, 1L, sg.where($"doc_id" % 3 === 2)))
    assert(served() == want, "replayed epoch changed the Hamming index")
    // torn segment: data written, no marker -> invisible
    sg.where($"doc_id" < 3).write.mode("overwrite").parquet(s"$p/deltas/2")
    assert(served() == want, "torn (uncommitted) segment leaked into serving")
    HammingIndex.compact(spark, p)
    HammingIndex.gc(spark, p)
    assert(served() == want, "compaction/gc changed serving results")
    assert(HammingIndex.appendEpoch(spark, p, 2L, sg.where($"doc_id" < 0)),
      "the torn epoch must be committable by its replay after gc")
    assert(served() == want, "an empty committed epoch broke serving")
  }

  test("probe == all-pairs restriction to shard-touching pairs; planted copies at hamming 0; bad budget rejected") {
    val sg = sigs()
    val p = java.nio.file.Files.createTempDirectory("graft_ham_probe").toString
    HammingIndex.write(sg, p)
    // a re-keyed shard: signature-identical copies of every 7th image
    val shard = sg.where($"doc_id" % 7 === 0)
      .select(($"doc_id" + 1000L).as("doc_id"),
        $"c0", $"c1", $"c2", $"c3").localCheckpoint(true)
    val got = pairSet(HammingIndex.probePairs(spark, p, shard))
    // reference: batch pair law over index ∪ shard, restricted to
    // pairs touching the shard (shard ids are all > 1000)
    val want = pairSet(
      Dedup.hammingChunkPairs(sg.unionByName(shard), maxHamming = 3)
        .where($"a_id" >= 1000L || $"b_id" >= 1000L))
    assert(got == want && got.nonEmpty,
      "probe diverged from the batch restriction")
    // every planted copy pairs with its original at hamming 0
    val zeros = got.filter(r => r._2 == r._1 + 1000L && r._3 == 0).map(_._1).toSet
    val planted = sg.where($"doc_id" % 7 === 0).select("doc_id")
      .as[Long].collect().toSet
    assert(zeros == planted, s"planted copies missed: ${planted -- zeros}")
    // a budget the 4-chunk pigeonhole can't guarantee fails loudly
    val e = intercept[IllegalArgumentException](
      HammingIndex.probePairs(spark, p, shard, maxHamming = 4))
    assert(e.getMessage.contains("pigeonhole"))
  }
}
