package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.FileSources

class FileSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned parquet round-trip prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lake").toString
    val events = Tables.events(spark, TestSpark.sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    FileSources.writePartitionedParquet(events, s"$dir/events", Seq("day"))
    val back = FileSources.parquet(spark, s"$dir/events")
    assert(back.count() == events.count())
    // partition pruning: a day filter must reach PartitionFilters
    val qe = back.filter(col("day") === "2024-01-05").queryExecution
    val scan = qe.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "day filter not applied as partition filter")
  }

  test("csv with explicit schema: values parse, malformed rows null out") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,name,score\n1,alice,3.5\n2,bob,not_a_number\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val got = FileSources.csv(spark, s"$dir/in.csv", schema)
      .orderBy("id").collect()
    assert(got(0).getLong(0) == 1L && got(0).getDouble(2) == 3.5)
    assert(got(1).isNullAt(2)) // PERMISSIVE: bad double -> null
  }

  test("json-lines with explicit schema round-trips through to_json") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .select(to_json(struct($"k", $"v")).as("value"))
      .write.mode("overwrite").text(s"$dir/in")
    val schema = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val got = FileSources.jsonLines(spark, s"$dir/in", schema)
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 1L), ("b", 2L)))
  }

  test("orc round-trips and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val o = Tables.orders(spark, TestSpark.sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    FileSources.writeOrc(o, s"$dir/orders")
    val back = FileSources.orc(spark, s"$dir/orders")
    assert(back.count() == o.count())
    val filtered = back.filter($"o_totalprice" > 100000)
    val pushed = filtered.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("GreaterThan(o_totalprice,100000"), pushed)
  }
}
