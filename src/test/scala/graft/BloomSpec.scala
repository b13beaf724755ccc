package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bloom

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every built key probes maybe=true") {
    val keys = (1L to 500L).toDF("k")
    val bits = Bloom.build(keys, "k", words = 64, k = 3)
    val probed = Bloom.maybeContains(keys, "k", bits, "maybe", words = 64, k = 3)
    assert(probed.where(!col("maybe")).count() == 0)
  }

  test("a sparse filter rejects most absent keys (false positives bounded)") {
    // 50 keys in 16128 bits: load ≈ 0.009 → fp ≈ (1-e^-0.009)^3 ≈ 1e-6,
    // deterministic for these md5 positions — zero of 5000 probes hit
    val keys = (1L to 50L).toDF("k")
    val bits = Bloom.build(keys, "k", words = 256, k = 3)
    val absent = (10001L to 15000L).toDF("k")
    val fp = Bloom.maybeContains(absent, "k", bits, "maybe", words = 256, k = 3)
      .where(col("maybe")).count()
    assert(fp <= 5, s"false-positive count $fp out of 5000 sparse probes")
  }

  test("bloom-prefiltered semi join equals the plain semi join") {
    val left = (1L to 2000L).toDF("k").withColumn("payload", col("k") * 7)
    val right = (1L to 999L).toDF("r").where(col("r") % 3 === 0)
      .select(col("r").as("rk"))
    val got = Bloom.semiJoinPrefiltered(left, "k", right, "rk", words = 64, k = 3)
      .select("k", "payload").as[(Long, Long)].collect().toSet
    val want = left.join(right.select(col("rk").as("k")).distinct(), Seq("k"), "semi")
      .select("k", "payload").as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("probe side is never shuffled: broadcast joins only, no sort-merge") {
    val keys = (1L to 500L).toDF("k")
    val bits = Bloom.build(keys, "k", words = 64, k = 3)
    val probed = Bloom.maybeContains(keys, "k", bits, "maybe", words = 64, k = 3)
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 3,
      "expected one broadcast join per hash seed:\n" + plan.take(1500))
  }
}
