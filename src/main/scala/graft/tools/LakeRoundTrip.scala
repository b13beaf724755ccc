package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.FileSources

/** Runnable demo of the file-lake surface: read the events testdata,
  * land it as day-partitioned parquet, read it back with a partition
  * filter, and print the pruning evidence. Usage:
  *   sbt "runMain graft.tools.LakeRoundTrip [sfDir] [outDir]"
  */
object LakeRoundTrip {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_lake").toString)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    FileSources.writePartitionedParquet(events, s"$outDir/events", Seq("day"))
    val back = FileSources.parquet(spark, s"$outDir/events")
      .filter(col("day") === "2024-01-05")
    println(s"[lake] rows for 2024-01-05: ${back.count()}")
    val scan = back.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    println(s"[lake] partitionFilters: ${scan.partitionFilters.mkString(", ")}")
    spark.stop()
  }
}
