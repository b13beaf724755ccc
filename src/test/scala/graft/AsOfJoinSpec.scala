package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join picks latest right row at-or-before, null when none") {
    val left = Seq((1L, 100L, 10L), (1L, 101L, 25L), (2L, 102L, 5L))
      .toDF("k", "lid", "t")
    val right = Seq((1L, 900L, 10L), (1L, 901L, 20L), (2L, 902L, 50L))
      .toDF("rk", "rid", "rt")
    val got = AsOfJoin.asOf(left, right,
      leftKey = $"k", rightKey = $"rk", leftTime = $"t", rightTime = $"rt")
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got(100L).contains(900L)) // exact tie: <= includes the right row
    assert(got(101L).contains(901L)) // latest of {10, 20} at t=25
    assert(got(102L).isEmpty)        // right row at 50 > 5: no match
  }

  test("as-of join carries matches independently per key") {
    val left = Seq((1L, 1L, 100L), (2L, 2L, 100L)).toDF("k", "lid", "t")
    val right = Seq((1L, 91L, 99L)).toDF("rk", "rid", "rt")
    val got = AsOfJoin.asOf(left, right, $"k", $"rk", $"t", $"rt")
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(91L))
    assert(got(2L).isEmpty) // key 2 never sees key 1's rows
  }

  test("native Catalyst as-of join matches the window formulation on real data") {
    val e = Tables.events(spark, TestSpark.sfDir)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("t_us"))
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id".as("r_user"), unix_micros($"ts").as("r_t"),
        $"event_id".as("click_id"))
      .groupBy("r_user", "r_t").agg(max("click_id").as("click_id"))
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"click_id", ($"t_us" - $"r_t").as("gap"))
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    val window = shape(AsOfJoin.asOf(
      purchases, clicks, $"user_id", $"r_user", $"t_us", $"r_t"))
    val native = shape(AsOfJoin.asOfNative(
      purchases, clicks, $"user_id", $"r_user", $"t_us", $"r_t"))
    assert(window.nonEmpty)
    assert(native == window,
      s"diff=${(native -- window).take(3)} / ${(window -- native).take(3)}")
  }

  test("native as-of handles self-join lineage (shared exprIds re-aliased)") {
    val df = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 30L, 102L))
      .toDF("k", "t", "v")
    // right side derives from the SAME plan: exprIds collide unless
    // asOfNative re-aliases
    val got = AsOfJoin.asOfNative(
      df.select($"k", $"t", $"v".as("lv")),
      df.select($"k".as("rk"), ($"t" - 1).as("rt"), $"v".as("rv")),
      col("k"), col("rk"), col("t"), col("rt"))
      .select($"lv", $"rv").as[(Long, Option[Long])].collect().toMap
    // k=1: left t=10 matches rt=9 (v=100); t=20 matches rt=19 (v=101)
    assert(got(100L).contains(100L))
    assert(got(101L).contains(101L))
    assert(got(102L).contains(102L))
  }

  test("native as-of tolerance: boundary-exact gap kept, one past dropped") {
    val left = Seq((1L, 100L, 1000L), (1L, 101L, 2000L), (2L, 102L, 500L))
      .toDF("k", "lid", "t")
    val right = Seq((1L, 900L, 900L), (1L, 901L, 1990L), (2L, 902L, 100L))
      .toDF("rk", "rid", "rt")
    // tolerance 100: gap(100→900)=100 boundary-exact (kept), gap(101→901)=10
    // (kept), gap(102→902)=400 (dropped — and no older row can be closer)
    val got = AsOfJoin.asOfNative(left, right, $"k", $"rk", $"t", $"rt",
      tolerance = Some(100L))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got(100L).contains(900L))
    assert(got(101L).contains(901L))
    assert(got(102L).isEmpty)
    // one unit tighter: the exact-boundary match flips to null
    val got99 = AsOfJoin.asOfNative(left, right, $"k", $"rk", $"t", $"rt",
      tolerance = Some(99L))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got99(100L).isEmpty)
    assert(got99(101L).contains(901L))
  }

  test("native as-of tolerance: null-time match is out of tolerance (3VL)") {
    val left = Seq((1L, 100L, 1000L)).toDF("k", "lid", "t")
    val right = Seq((1L, 900L, Option.empty[Long])).toDF("rk", "rid", "rt")
    // without a tolerance a null-time right row matches everything…
    val open = AsOfJoin.asOfNative(left, right, $"k", $"rk", $"t", $"rt")
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(open(100L).contains(900L))
    // …but its gap is undefined, so any tolerance rejects it (SQL 3VL)
    val tol = AsOfJoin.asOfNative(left, right, $"k", $"rk", $"t", $"rt",
      tolerance = Some(Long.MaxValue))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(tol(100L).isEmpty)
  }

  test("native as-of tolerance is overflow-safe at extreme time values") {
    val left = Seq((1L, 100L, 2L)).toDF("k", "lid", "t")
    val right = Seq((1L, 900L, Long.MinValue + 1)).toDF("rk", "rid", "rt")
    // the true gap exceeds Long.MaxValue, so the raw subtraction wraps
    // negative — the match must be rejected, not accepted via overflow
    val got = AsOfJoin.asOfNative(left, right, $"k", $"rk", $"t", $"rt",
      tolerance = Some(Long.MaxValue))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got(100L).isEmpty)
    // and without a tolerance the same extreme row still matches
    val open = AsOfJoin.asOfNative(left, right, $"k", $"rk", $"t", $"rt")
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(open(100L).contains(900L))
  }

  test("native as-of tolerance rejects a non-bigint time axis loudly") {
    val left = Seq((1L, 10, 1L)).toDF("k", "t", "lv")    // t: int
    val right = Seq((1L, 9, 2L)).toDF("rk", "rt", "rv")  // rt: int
    val e = intercept[Exception] {
      AsOfJoin.asOfNative(left, right, col("k"), col("rk"), col("t"), col("rt"),
        tolerance = Some(5L)).collect()
    }
    assert(e.getMessage.contains("bigint time axis"), e.getMessage)
  }

  test("native as-of rejects mismatched key/time types loudly") {
    val left = Seq((1, 10L, 1L)).toDF("k", "t", "lv")   // k: int
    val right = Seq((1L, 9L, 2L)).toDF("rk", "rt", "rv") // rk: long
    val e = intercept[Exception] {
      AsOfJoin.asOfNative(left, right, col("k"), col("rk"), col("t"), col("rt"))
        .collect()
    }
    assert(e.getMessage.contains("type mismatch"), e.getMessage)
  }

  test("native as-of survives adversarial AQE coalescing with lopsided inputs") {
    // AQE coalesces tiny shuffle partitions after the fact; if it ever
    // coalesced the two sides independently, the positional
    // zipPartitions pairing would mis-pair (the exec now fails loudly
    // on mismatched counts). Deliberately lopsided input partitioning
    // + aggressive coalescing exercises that path end-to-end.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "false")
    val prevCoalesce =
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try {
      val e = Tables.events(spark, TestSpark.sfDir)
      val purchases = e.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", unix_micros($"ts").as("t_us"))
        .repartition(7)
      val clicks = e.filter($"event_type" === "click")
        .select($"user_id".as("r_user"), unix_micros($"ts").as("r_t"),
          $"event_id".as("click_id"))
        .groupBy("r_user", "r_t").agg(max("click_id").as("click_id"))
        .repartition(3)
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select($"event_id", $"click_id").as[(Long, Option[Long])].collect().toSet
      val native = shape(AsOfJoin.asOfNative(
        purchases, clicks, $"user_id", $"r_user", $"t_us", $"r_t"))
      val window = shape(AsOfJoin.asOf(
        purchases, clicks, $"user_id", $"r_user", $"t_us", $"r_t"))
      assert(native.nonEmpty)
      assert(native == window,
        s"diff=${(native -- window).take(3)} / ${(window -- native).take(3)}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("native as-of plans as AsOfJoinExec with co-partitioned sorted children") {
    val left = Seq((1L, 1L, 100L), (2L, 2L, 100L)).toDF("k", "lid", "t")
    val right = Seq((1L, 91L, 99L)).toDF("rk", "rid", "rt")
    val df = AsOfJoin.asOfNative(left, right, $"k", $"rk", $"t", $"rt")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin ["), p.take(600)) // nodeName strips "Exec"
    assert(p.contains("Sort"), "children not sorted:\n" + p.take(600))
    // and it still computes the right answer through the custom exec
    val got = df.select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(91L) && got(2L).isEmpty)
  }
}
