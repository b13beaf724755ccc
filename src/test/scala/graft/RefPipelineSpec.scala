package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.RefOps
import graft.pipelines.{StediPipelines, WireFixtures}

/** Golden tests for the reference pipeline semantics, using the exact
  * wire samples embedded in the reference
  * (/root/reference/project/starter/README.md:50-103 and the
  * sparkpy*.py expected-output comments — see FIXTURES.md §A).
  */
class RefPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // FIXTURES.md §A2 — the documented Sam Test envelope, verbatim.
  private val samTestEnvelope =
    """{"key":"Q3VzdG9tZXI=","existType":"NONE","Ch":false,"Incr":false,
      |"zSetEntries":[{"element":"eyJjdXN0b21lck5hbWUiOiJTYW0gVGVzdCIsImVtYWlsIjoic2FtLnRlc3RAdGVzdC5jb20iLCJwaG9uZSI6IjgwMTU1NTEyMTIiLCJiaXJ0aERheSI6IjIwMDEtMDEtMDMifQ==","Score":0.0}]}"""
      .stripMargin.replace("\n", "")

  test("customer decode chain reproduces the golden email/birthYear") {
    val in = Seq(("Q3VzdG9tZXI=", samTestEnvelope)).toDF("key", "value")
    val out = RefOps.customerDecodeChain(in).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "sam.test@test.com")
    assert(out(0).getString(1) == "2001")
  }

  test("risk decode coerces JSON number score to string (README.md:99-103)") {
    val in = Seq(("k", """{"customer":"Jason.Mitra@test.com","score":7.0,"riskDate":"2020-09-14T07:54:06.417Z"}"""))
      .toDF("key", "value")
    val out = RefOps.riskDecodeChain(in).collect()
    assert(out(0).getString(0) == "Jason.Mitra@test.com")
    assert(out(0).getString(1) == "7.0")
  }

  test("malformed and non-customer payloads are dropped by the not-null filter") {
    val in = Seq(
      ("k", "this is not json"),
      ("k", """{"key":"VHJ1Y2s=","existType":"NONE","Ch":false,"Incr":false,"zSetEntries":[{"element":"eyJ0cnVjayI6MX0=","Score":0.0}]}"""),
      ("Q3VzdG9tZXI=", samTestEnvelope)).toDF("key", "value")
    assert(RefOps.customerDecodeChain(in).count() == 1)
  }

  test("join pipeline emits the FIXTURES.md §A5 JSON contract") {
    val redis = Seq(("Q3VzdG9tZXI=", samTestEnvelope)).toDF("key", "value")
    val stedi = Seq(("k", """{"customer":"sam.test@test.com","score":28.5,"riskDate":"2020-09-14T07:54:06.417Z"}"""))
      .toDF("key", "value")
    val out = StediPipelines.joinPipeline(redis, stedi).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) ==
      """{"email":"sam.test@test.com","birthYear":"2001","customer":"sam.test@test.com","score":"28.5"}""")
  }

  test("streaming replay: customer pipeline over MemoryStream matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    mem.addData(("Q3VzdG9tZXI=", samTestEnvelope))
    val q = StediPipelines.customerPipeline(mem.toDF().toDF("key", "value"))
      .writeStream.format("memory").queryName("cust_replay").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cust_replay").collect()
      assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ==
        Set(("sam.test@test.com", "2001")))
    } finally q.stop()
  }

  test("streaming replay: stream-stream join without watermark (reference semantics)") {
    implicit val sqlCtx = spark.sqlContext
    val redisMem = MemoryStream[(String, String)]
    val stediMem = MemoryStream[(String, String)]
    redisMem.addData(("Q3VzdG9tZXI=", samTestEnvelope))
    stediMem.addData(("k", """{"customer":"sam.test@test.com","score":11.5,"riskDate":"2020-09-14T00:00:00.000Z"}"""))
    val joined = StediPipelines.joinPipeline(
      redisMem.toDF().toDF("key", "value"),
      stediMem.toDF().toDF("key", "value"))
    val q = joined.writeStream.format("memory").queryName("join_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // late-arriving risk event still joins: state is unbounded (no watermark)
      stediMem.addData(("k", """{"customer":"sam.test@test.com","score":99.0,"riskDate":"2020-09-15T00:00:00.000Z"}"""))
      q.processAllAvailable()
      val vals = spark.table("join_replay").as[String].collect().toSet
      assert(vals.exists(_.contains("\"score\":\"11.5\"")))
      assert(vals.exists(_.contains("\"score\":\"99.0\"")))
    } finally q.stop()
  }

  test("full 7-column Kafka relation shape decodes; metadata columns are ignored") {
    // FIXTURES.md §A1: key/value arrive as BINARY plus topic/partition/
    // offset/timestamp/timestampType metadata — the pipelines must cast
    // the payload columns and ignore the rest.
    val in = Seq((
      "Q3VzdG9tZXI=".getBytes("UTF-8"),
      samTestEnvelope.getBytes("UTF-8"),
      "redis-server", 0, 42L,
      java.sql.Timestamp.valueOf("2020-09-14 07:54:06"), 0))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val out = RefOps.customerDecodeChain(in).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "sam.test@test.com" && out(0).getString(1) == "2001")
  }

  test("wire fixtures round-trip through the full decode chain on testdata") {
    val decoded = StediPipelines.customerPipeline(
      WireFixtures.redisTopicFrame(spark, TestSpark.sfDir))
    assert(decoded.count() == 150) // = customer rows at sf0.001
    val one = decoded.filter($"email" === "Customer#000000001@example.com").collect()
    assert(one.length == 1 && one(0).getString(1) == (1940 + 1 % 60).toString)
  }
}
