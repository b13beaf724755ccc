package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsOfJoin

/** Temporal join operators (SURVEY.md §2.2 gaps Spark lacks natively):
  * as-of join (attribution) and range join, plus mergeable-sketch
  * aggregation. The time axis is integer epoch-microseconds on both
  * engines (unix_micros ⇔ epoch_us), which sidesteps parquet
  * nanos-vs-micros physical differences entirely.
  */
object TemporalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // last-click attribution: for each purchase, the same user's most
    // recent click at-or-before it. DuckDB verifies with native ASOF.
    "q_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("r_user"), unix_micros(col("ts")).as("r_t"),
          col("event_id").as("click_id"))
        .groupBy("r_user", "r_t").agg(max("click_id").as("click_id"))
      AsOfJoin.asOf(purchases, clicks,
        leftKey = col("user_id"), rightKey = col("r_user"),
        leftTime = col("t_us"), rightTime = col("r_t"))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (col("t_us") - col("r_t")).as("gap_us"))
    }),

    // identical semantics through the native Catalyst operator
    // (AsOfJoinPlan → AsOfJoinExec streaming merge) — same oracle, so
    // both physical paths are hash-verified against DuckDB ASOF JOIN.
    "q_asof_join_native" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("r_user"), unix_micros(col("ts")).as("r_t"),
          col("event_id").as("click_id"))
        .groupBy("r_user", "r_t").agg(max("click_id").as("click_id"))
      AsOfJoin.asOfNative(purchases, clicks,
        leftKey = col("user_id"), rightKey = col("r_user"),
        leftTime = col("t_us"), rightTime = col("r_t"))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (col("t_us") - col("r_t")).as("gap_us"))
    }),

    // as-of with tolerance: the match must also lie within the last
    // hour, else null — the standard financial-data as-of variant.
    // Same one-shuffle window shape; tolerance is a post-predicate on
    // the matched gap (most-recent-at-or-before is within the window
    // iff its gap is), so the scale story is unchanged.
    "q_asof_tolerance" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("r_user"), unix_micros(col("ts")).as("r_t"),
          col("event_id").as("click_id"))
        .groupBy("r_user", "r_t").agg(max("click_id").as("click_id"))
      val tolUs = 3600L * 1000 * 1000
      AsOfJoin.asOf(purchases, clicks,
        leftKey = col("user_id"), rightKey = col("r_user"),
        leftTime = col("t_us"), rightTime = col("r_t"))
        .select(col("event_id"), col("user_id"),
          when(col("t_us") - col("r_t") <= tolUs, col("click_id")).as("click_id"),
          when(col("t_us") - col("r_t") <= tolUs, col("t_us") - col("r_t")).as("gap_us"))
    }),

    // the same tolerance semantics through the native operator: the
    // merge rejects a carried match older than the bound (one long
    // comparison at emit, O(1) state) — same oracle as the window
    // formulation, so both physical paths are hash-verified.
    "q_asof_tolerance_native" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("r_user"), unix_micros(col("ts")).as("r_t"),
          col("event_id").as("click_id"))
        .groupBy("r_user", "r_t").agg(max("click_id").as("click_id"))
      AsOfJoin.asOfNative(purchases, clicks,
        leftKey = col("user_id"), rightKey = col("r_user"),
        leftTime = col("t_us"), rightTime = col("r_t"),
        tolerance = Some(3600L * 1000 * 1000))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (col("t_us") - col("r_t")).as("gap_us"))
    }),

    // RANGE window frame (value-based, not row-based): purchases in
    // the trailing hour per user — well-defined under timestamp ties
    // because the frame is bounded by VALUE distance.
    "q_window_range_frame" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("t_us"))
        .rangeBetween(-3600L * 1000 * 1000, org.apache.spark.sql.expressions.Window.currentRow)
      Tables.events(s, d).where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"))
        .select(col("user_id"), col("event_id"), col("t_us"),
          count(lit(1)).over(w).as("n_last_hour"))
    }),

    // range join: clicks in the hour before each purchase, keyed by
    // user — an equi-key + time-range join (sort-merge + range filter;
    // never a cross product).
    "q_range_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("r_user"), unix_micros(col("ts")).as("r_t"))
      purchases.join(clicks,
          col("user_id") === col("r_user") &&
            col("r_t") >= col("t_us") - expr("3600000000L") &&
            col("r_t") <= col("t_us"),
          "left_outer")
        .groupBy("event_id", "user_id")
        .agg(count(col("r_t")).as("n_recent_clicks"))
    }),

    // DataSketches HLL: per-group sketches unioned into a global
    // estimate — the mergeable-sketch pattern that replaces exact
    // countDistinct at 100 TB. Approximate → rows-only (no oracle).
    "sketch_hll_merge" -> ((s, d) => {
      val e = Tables.events(s, d)
      val perType = e.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      perType.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("distinct_users_global"),
        count(lit(1)).as("n_groups"))
    }))

  private val asofOracle =
    """WITH p AS (
         SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events
         WHERE event_type = 'purchase'),
       c AS (
         SELECT user_id AS r_user, epoch_us(ts) AS r_t, max(event_id) AS click_id
         FROM events WHERE event_type = 'click' GROUP BY 1, 2)
       SELECT p.event_id, p.user_id, c.click_id, p.t_us - c.r_t AS gap_us
       FROM p ASOF LEFT JOIN c
         ON p.user_id = c.r_user AND c.r_t <= p.t_us"""

  def oracles: Map[String, String] = Map(
    "q_asof_join_native" -> asofOracle,
    "q_asof_join" ->
      """WITH p AS (
           SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events
           WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id AS r_user, epoch_us(ts) AS r_t, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, c.click_id, p.t_us - c.r_t AS gap_us
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.r_user AND c.r_t <= p.t_us""",

    "q_window_range_frame" ->
      """SELECT user_id, event_id, epoch_us(ts) AS t_us,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS n_last_hour
         FROM events WHERE event_type = 'purchase'""",

    // identical tolerance oracle for the native-exec path
    "q_asof_tolerance_native" ->
      """WITH p AS (
           SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events
           WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id AS r_user, epoch_us(ts) AS r_t, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id,
                CASE WHEN p.t_us - c.r_t <= 3600000000 THEN c.click_id END AS click_id,
                CASE WHEN p.t_us - c.r_t <= 3600000000 THEN p.t_us - c.r_t END AS gap_us
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.r_user AND c.r_t <= p.t_us""",

    "q_asof_tolerance" ->
      """WITH p AS (
           SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events
           WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id AS r_user, epoch_us(ts) AS r_t, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id,
                CASE WHEN p.t_us - c.r_t <= 3600000000 THEN c.click_id END AS click_id,
                CASE WHEN p.t_us - c.r_t <= 3600000000 THEN p.t_us - c.r_t END AS gap_us
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.r_user AND c.r_t <= p.t_us""",

    "q_range_join" ->
      """WITH p AS (
           SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events
           WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id AS r_user, epoch_us(ts) AS r_t FROM events
           WHERE event_type = 'click')
         SELECT p.event_id, p.user_id, count(c.r_t) AS n_recent_clicks
         FROM p LEFT JOIN c
           ON p.user_id = c.r_user
          AND c.r_t >= p.t_us - 3600000000
          AND c.r_t <= p.t_us
         GROUP BY 1, 2""")
}
