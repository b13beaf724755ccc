package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, RefQueries, SqlQueries, TemporalQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query catalog layout:
  *  - RefQueries    — the reference's three pipelines end-to-end in
  *                    batch form (SURVEY.md §2.1, O1–O15)
  *  - CoreQueries   — the full relational category checklist
  *                    (SURVEY.md §2.2)
  *  - TextQueries   — dedup + text analysis north-star ops (§2.3)
  *  - VectorQueries — similarity search, sketches, multimodal (§2.3)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's join
    * pipeline (Redis-envelope decode ⋈ risk events → JSON), batch form.
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ref_join_json")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ CoreQueries.queries ++ SqlQueries.queries ++
      TemporalQueries.queries ++ TextQueries.queries ++ VectorQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hashing (xxhash64)
    * or approximate semantics (HLL, LSH buckets) are not expressible in
    * DuckDB → driver records a weaker rows-only check for those. */
  def oracleSql: Map[String, String] =
    RefQueries.oracles ++ CoreQueries.oracles ++ SqlQueries.oracles ++
      TemporalQueries.oracles ++ TextQueries.oracles ++ VectorQueries.oracles
}
