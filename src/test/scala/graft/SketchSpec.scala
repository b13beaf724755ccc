package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Error-bound properties for the three declared-approximate sketch
  * queries (the only `SparkEntry.queries` entries without a DuckDB
  * oracle). The driver's gate can only count their rows; these specs
  * assert the part that MAKES them correct — the estimates actually
  * land within the configured accuracy of the exact answer — at two
  * scales, so the sketches are tested, not just executed.
  *
  * Bounds: approx_count_distinct's rsd default is 0.05 (a standard
  * deviation, so 3× is the practical envelope); DataSketches HLL at
  * lgK=12 has rse ≈ 1.04/√2¹² ≈ 1.6%; approx_percentile(accuracy=1000)
  * guarantees rank error ≤ n/1000. All checks are deterministic for a
  * fixed dataset + implementation — a bound violation means the query
  * or Spark's sketch changed, not "bad luck".
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val sf = dir.split('/').last

    test(s"sketch_hll: approx_count_distinct within 3×rsd of exact [$sf]") {
      val rows = SparkEntry.queries("sketch_hll")(spark, dir)
        .select($"approx_users", $"exact_users").as[(Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (approx, exact) =>
        assert(exact > 0)
        assert(math.abs(approx - exact).toDouble / exact <= 3 * 0.05,
          s"approx=$approx exact=$exact")
      }
    }

    test(s"sketch_hll_merge: lgK=12 union estimate within 3×rse of exact [$sf]") {
      val est = SparkEntry.queries("sketch_hll_merge")(spark, dir)
        .select($"distinct_users_global").as[Long].head()
      val exact = Tables.events(spark, dir)
        .select(countDistinct($"user_id")).as[Long].head()
      val rse = 1.04 / math.sqrt((1 << 12).toDouble)
      assert(math.abs(est - exact).toDouble / exact <= 3 * rse,
        s"est=$est exact=$exact rse=$rse")
    }

    test(s"sketch_cms: never underestimates; tight at 16KB state [$sf]") {
      val rows = SparkEntry.queries("sketch_cms")(spark, dir)
        .select($"user_id", $"cms_est", $"exact_n").as[(Long, Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (u, est, exact) =>
        assert(est >= exact, s"CMS underestimated user $u: $est < $exact")
        // depth 4 × width 512 over this cardinality: collisions add at
        // most a few strangers' counts — the estimate stays in the
        // same order of magnitude (loose sanity bound, not the 2en/w
        // Markov bound, which holds with prob 1-exp(-4) per probe)
        assert(est <= exact + (rows.map(_._3).sum / 64),
          s"CMS estimate implausibly inflated for $u: est=$est exact=$exact")
      }
    }

    test(s"sketch_quantiles: rank error ≤ n/accuracy per quantile [$sf]") {
      val qs = SparkEntry.queries("sketch_quantiles")(spark, dir).collect()
      assert(qs.nonEmpty)
      // one pass: join the probe values back and count below/at each
      val probes = qs.flatMap { r =>
        Seq((r.getString(0), 0.25, r.getDouble(1)),
          (r.getString(0), 0.50, r.getDouble(2)),
          (r.getString(0), 0.75, r.getDouble(3)))
      }.toSeq.toDF("event_type", "p", "q")
      val checked = Tables.events(spark, dir)
        .select($"event_type", $"value".cast("double").as("v"))
        .join(broadcast(probes), "event_type")
        .groupBy("event_type", "p", "q")
        .agg(count(lit(1)).as("n"),
          sum(when($"v" < $"q", 1L).otherwise(0L)).as("n_lt"),
          sum(when($"v" <= $"q", 1L).otherwise(0L)).as("n_le"))
        .as[(String, Double, Double, Long, Long, Long)].collect()
      assert(checked.length == qs.length * 3)
      checked.foreach { case (et, p, q, n, nLt, nLe) =>
        val target = p * n
        val eps = n / 1000.0 + 1 // rank tolerance + discreteness slack
        // the true rank interval of q is [nLt+1, nLe]; it must
        // intersect [target - eps, target + eps]
        assert(nLt + 1 <= target + eps && nLe >= target - eps,
          s"$et p=$p q=$q n=$n rank=[${nLt + 1},$nLe] target=$target±$eps")
      }
    }
  }
}
