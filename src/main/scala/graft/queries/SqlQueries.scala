package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SQL-entry-point coverage (reference operator O6: temp views +
  * spark.sql strings) plus the relational long tail: scalar /
  * correlated / IN subqueries, HAVING, pivot, session windows, array /
  * date / regexp / null-handling functions.
  */
object SqlQueries {

  private def withViews(s: SparkSession, d: String, names: String*)(sql: String): DataFrame = {
    names.foreach(n => Tables.table(s, d, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O6 — the reference's temp-view + SQL-string entry point.
    "q_sql_views" -> ((s, d) => withViews(s, d, "customer", "nation", "orders")(
      """SELECT n.n_name AS nation, count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY n.n_name
         HAVING count(*) > 10""")),

    "q_scalar_subquery" -> ((s, d) => withViews(s, d, "orders")(
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)""")),

    "q_correlated_subquery" -> ((s, d) => withViews(s, d, "orders")(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o1
         WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders o2
                               WHERE o2.o_custkey = o1.o_custkey)""")),

    "q_in_subquery" -> ((s, d) => withViews(s, d, "customer", "orders")(
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')""")),

    // LATERAL correlated subquery (SQL:1999 lateral derived table,
    // Spark 3.4+/DuckDB both native): per-nation top-2 customers by
    // account balance — the "top-n per outer row" idiom without a
    // window over the whole table.
    "q_lateral" -> ((s, d) => withViews(s, d, "nation", "customer")(
      """SELECT n.n_name, t.c_name, t.c_acctbal
         FROM nation n,
         LATERAL (SELECT c_name, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t""")),

    // UNPIVOT (wide → long): per-priority order stats melted to
    // (priority, metric, value) rows — the relational dual of q_pivot.
    "q_unpivot" -> ((s, d) => withViews(s, d, "orders")(
      """WITH agg AS (
           SELECT o_orderpriority,
                  CAST(count(*) AS DOUBLE) AS n_orders,
                  CAST(min(o_totalprice) AS DOUBLE) AS min_price,
                  CAST(max(o_totalprice) AS DOUBLE) AS max_price
           FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, metric, value
         FROM agg UNPIVOT (value FOR metric IN (n_orders, min_price, max_price))""")),

    "q_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .pivot("event_type", Seq("click", "view", "signup", "purchase", "error"))
        .agg(count(lit(1)))),

    "q_session_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))),

    "q_array_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          split(col("p_name"), " ").as("toks"))
        .select(
          col("p_partkey"),
          size(col("toks")).as("n_toks"),
          array_sort(col("toks")).getItem(0).as("first_sorted"),
          array_contains(col("toks"), "green").as("has_green"),
          concat_ws(",", array_sort(col("toks"))).as("sorted_csv"))),

    "q_date_arith" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
          datediff(lit("1998-12-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_end"),
          date_format(last_day(col("o_orderdate").cast("date")), "yyyy-MM-dd").as("month_end"),
          dayofweek(col("o_orderdate")).as("dow"))),

    "q_null_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          coalesce(nullif(col("event_type"), lit("error")), lit("was_error")).as("etype"),
          when(col("value") > 50, col("value")).otherwise(lit(null)).as("big_value"))
        .withColumn("big_value_filled", coalesce(col("big_value"), lit(-1.0)))),

    // map-typed columns: per-user event-type counts as a map, keyed
    // lookups back out (map machinery on the Spark side; the oracle
    // states the equivalent relational fact)
    "q_map_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
        .select(
          col("user_id"),
          // try_element_at: ANSI-safe missing-key lookup (null, not error)
          coalesce(try_element_at(col("m"), lit("click")), lit(0L)).as("clicks"),
          coalesce(try_element_at(col("m"), lit("purchase")), lit(0L)).as("purchases"),
          size(map_keys(col("m"))).as("n_types"))),

    // generator coverage: posexplode of a token array with ordinal
    "q_posexplode" -> ((s, d) =>
      Tables.part(s, d)
        .where(col("p_partkey") < 50)
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .toDF("p_partkey", "pos", "tok")),

    // unionByName: schemas in different column order still align
    "q_union_by_name" -> ((s, d) => {
      val a = Tables.customer(s, d)
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_acctbal"))
      val b = Tables.customer(s, d)
        .where(col("c_mktsegment") === "MACHINERY")
        .select(col("c_acctbal"), col("c_custkey")) // reversed order
      a.unionByName(b)
    }),

    "q_regexp" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("last_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
          col("p_name").rlike(".*(red|green|blue).*").as("is_rgb")))
  )

  def oracles: Map[String, String] = Map(
    "q_sql_views" ->
      """SELECT n_name AS nation, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name HAVING count(*) > 10""",

    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)""",

    "q_correlated_subquery" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o1
         WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders o2
                               WHERE o2.o_custkey = o1.o_custkey)""",

    "q_in_subquery" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')""",

    "q_lateral" ->
      """SELECT n.n_name, t.c_name, t.c_acctbal
         FROM nation n,
         LATERAL (SELECT c_name, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t""",

    // UNION ALL melt — the portable spelling of UNPIVOT (DuckDB's
    // UNPIVOT clause exists but the UNION form needs no dialect care)
    "q_unpivot" ->
      """WITH agg AS (
           SELECT o_orderpriority,
                  CAST(count(*) AS DOUBLE) AS n_orders,
                  CAST(min(o_totalprice) AS DOUBLE) AS min_price,
                  CAST(max(o_totalprice) AS DOUBLE) AS max_price
           FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM agg
         UNION ALL
         SELECT o_orderpriority, 'min_price', min_price FROM agg
         UNION ALL
         SELECT o_orderpriority, 'max_price', max_price FROM agg""",

    "q_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'view') AS view,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'error') AS error
         FROM events GROUP BY 1""",

    "q_session_window" ->
      """WITH flagged AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
         sessioned AS (
           SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged)
         SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                count(*) AS n_events
         FROM sessioned GROUP BY user_id, sid""",

    "q_array_funcs" ->
      """SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_toks,
           list_sort(string_split(p_name, ' '))[1] AS first_sorted,
           list_contains(string_split(p_name, ' '), 'green') AS has_green,
           array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_csv
         FROM part""",

    "q_date_arith" ->
      """SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           CAST(DATE '1998-12-01' - CAST(o_orderdate AS DATE) AS INT) AS days_to_end,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
         FROM orders""",

    "q_null_funcs" ->
      """SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'was_error') AS etype,
           CASE WHEN value > 50 THEN value END AS big_value,
           coalesce(CASE WHEN value > 50 THEN value END, -1.0) AS big_value_filled
         FROM events""",

    "q_map_funcs" ->
      """SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS clicks,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
           CAST(count(DISTINCT event_type) AS INT) AS n_types
         FROM events GROUP BY user_id""",

    "q_posexplode" ->
      """SELECT p_partkey,
           CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS INT) AS pos,
           unnest(string_split(p_name, ' ')) AS tok
         FROM part WHERE p_partkey < 50""",

    "q_union_by_name" ->
      """SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION ALL
         SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'MACHINERY'""",

    "q_regexp" ->
      """SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           regexp_matches(p_name, '.*(red|green|blue).*') AS is_rgb
         FROM part""")
}
