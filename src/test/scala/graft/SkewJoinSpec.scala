package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain inner join on a skewed key") {
    // 90% of the probe side hits one hot key
    val left = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong))
      .toDF("k", "lv")
    val right = Seq((7L, "hot"), (10L, "cold"), (20L, "cold2")).toDF("rk", "rv")
    val plain = left.join(right, $"k" === $"rk").select("k", "lv", "rv")
      .as[(Long, Long, String)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(left, right, $"k", $"rk", salt = 8)
      .select("k", "lv", "rv").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 7L) == 900)
  }

  test("salted join replicates the build side, not the probe side") {
    val left = Seq((1L, 1L)).toDF("k", "lv")
    val right = Seq((1L, "x")).toDF("rk", "rv")
    // salt=4: right becomes 4 rows internally, but output stays 1 row
    val out = SkewJoin.saltedInnerJoin(left, right, $"k", $"rk", salt = 4)
    assert(out.count() == 1)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // the automatic alternative to manual salting: one hot key holds
    // ~all rows; with tiny skew thresholds AQE must mark the partition
    // skewed and split it (OptimizeSkewedJoin → AQEShuffleRead)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = (1 to 20000).map(i => (7L, i.toLong)).toDF("k", "lv")
      val right = (1 to 50).map(i => (if (i == 7) 7L else i.toLong, s"r$i")).toDF("rk", "rv")
      val qe = left.join(right, $"k" === $"rk").queryExecution
      qe.toRdd.count() // finalize the adaptive plan
      val p = qe.executedPlan.toString
      assert(p.contains("SortMergeJoin(skew=true)") || p.contains("skewed"),
        "AQE did not mark/split the skewed join:\n" + p.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
