package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's deterministic Parquet testdata
  * (see /root/repo/TESTDATA.md). One method per table; every
  * `SparkEntry.queries` entry goes through these so that scan-level
  * concerns (vectorized parquet reader, column pruning, filter
  * pushdown) are uniform across the engine.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * loader indirection is the single seam where that swap happens.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
    * drops (Spark's reader rejects it; sessions set
    * spark.sql.legacy.parquet.nanosAsLong=true and this loader
    * truncates nanos → microseconds) and as TIMESTAMP(MICROS) without
    * UTC adjustment (read as TIMESTAMP_NTZ) in others. Normalize both
    * to a session-zone TIMESTAMP — sessions run UTC, so the NTZ cast
    * re-labels the identical wall-clock instant. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  /** documents/embeddings ship as one small parquet (often a single
    * row group → a single input split), while their per-row work
    * (shingling, hashing, vector math) is the heaviest in the engine.
    * Spread them across the session's parallelism up front — one
    * trivial shuffle; at production scale the scan itself would
    * provide the splits and this becomes a no-op-sized adjustment. */
  private def spread(s: SparkSession, df: DataFrame): DataFrame = {
    // conditional on the FILE count (cheap driver-side metadata — no
    // plan-to-RDD conversion like df.rdd.getNumPartitions would
    // force): only widen genuinely under-split inputs; a table that
    // already has enough splits is never shuffled, and never
    // down-partitioned
    val target = s.sparkContext.defaultParallelism
    if (df.inputFiles.length < target) df.repartition(target) else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "embeddings"))
}
