package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipelines.{StediPipelines, WireFixtures}

/** Reference-parity queries: the three STEDI pipelines run end-to-end
  * in batch form over wire-format fixtures synthesized from the
  * driver's testdata (WireFixtures). The DuckDB oracle recomputes the
  * expected *output* directly from the base tables, so a hash match
  * proves the whole to_json → base64 → envelope → unbase64 → from_json
  * → filter → split → join chain byte-exact (SURVEY.md §2.1 O1–O13).
  */
object RefQueries {

  // email/birthDay synthesis formulas mirrored in SQL by the oracle
  private val emailSql = "c_name || '@example.com'"
  private val birthYearSql = "CAST(1940 + c_custkey % 60 AS VARCHAR)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_customer_decode" -> ((s, d) =>
      StediPipelines.customerPipeline(WireFixtures.redisTopicFrame(s, d))
        .select(col("email"), col("birthYear").as("birth_year"))),

    "ref_risk_decode" -> ((s, d) =>
      StediPipelines.riskPipeline(WireFixtures.stediTopicFrame(s, d))),

    "ref_join" -> ((s, d) =>
      StediPipelines.joinedColumns(
        WireFixtures.redisTopicFrame(s, d),
        WireFixtures.stediTopicFrame(s, d))
        .select(col("email"), col("birthYear").as("birth_year"),
          col("customer"), col("score"))),

    "ref_join_json" -> ((s, d) =>
      StediPipelines.joinPipeline(
        WireFixtures.redisTopicFrame(s, d),
        WireFixtures.stediTopicFrame(s, d))))

  def oracles: Map[String, String] = Map(
    "ref_customer_decode" ->
      s"""SELECT $emailSql AS email, $birthYearSql AS birth_year
          FROM customer""",

    "ref_risk_decode" ->
      s"""SELECT $emailSql AS customer, CAST(o_totalprice AS VARCHAR) AS score
          FROM orders JOIN customer ON o_custkey = c_custkey""",

    "ref_join" ->
      s"""SELECT $emailSql AS email, $birthYearSql AS birth_year,
                 $emailSql AS customer, CAST(o_totalprice AS VARCHAR) AS score
          FROM orders JOIN customer ON o_custkey = c_custkey""",

    "ref_join_json" ->
      s"""SELECT '{"email":"' || $emailSql || '","birthYear":"' || $birthYearSql ||
                 '","customer":"' || $emailSql || '","score":"' ||
                 CAST(o_totalprice AS VARCHAR) || '"}' AS value
          FROM orders JOIN customer ON o_custkey = c_custkey""")
}
