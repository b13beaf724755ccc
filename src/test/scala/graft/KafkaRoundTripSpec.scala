package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.pipelines.{StediPipelines, WireFixtures}
import graft.sources.KafkaSources

/** Executes the Kafka sink/source builders end-to-end against the
  * test-classpath fake broker ([[graft.fakekafka.FakeKafkaProvider]],
  * registered under the "kafka" short name). Until now `toTopic` /
  * `topicBatch` were compile-contract only — no broker exists in the
  * sandbox — so the reference's full operational loop
  * (sparkpykafkajoin.py:131-152: join → to_json → Kafka topic with
  * checkpoint) had never actually run. Here the REAL builders run
  * unmodified; only the transport is in-memory.
  */
class KafkaRoundTripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join pipeline streams into the Kafka sink and reads back through O1 batch") {
    graft.fakekafka.FakeKafkaBroker.clear()
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_kafka").toString

    // wire-format rows from the driver's testdata, replayed as streams
    val redisRows = WireFixtures.redisTopicFrame(spark, TestSpark.sfDir)
      .as[(String, String)].collect().toSeq
    val stediRows = WireFixtures.stediTopicFrame(spark, TestSpark.sfDir)
      .as[(String, String)].collect().toSeq
    val redisMem = MemoryStream[(String, String)]
    val stediMem = MemoryStream[(String, String)]
    redisMem.addData(redisRows)
    stediMem.addData(stediRows)

    val joined = StediPipelines.joinPipeline(
      redisMem.toDF().toDF("key", "value"),
      stediMem.toDF().toDF("key", "value"))
    val q = KafkaSources.toTopic(
      joined,
      bootstrapServers = "fake:9092",
      topic = "stedi-graded",
      checkpointLocation = s"$dir/chk").start()
    try q.processAllAvailable() finally q.stop()

    // sink wrote through the checkpoint dir
    assert(new java.io.File(s"$dir/chk/offsets").exists())

    // O1 batch read returns the full 7-column Kafka shape
    val back = KafkaSources.topicBatch(spark, "fake:9092", "stedi-graded")
    assert(back.columns.toSeq == Seq(
      "key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))

    // round-tripped values == the batch formulation of the same pipeline
    val got = graft.ops.RefOps.castKeyValueToString(back)
      .select("value").as[String].collect().toSet
    val expected = StediPipelines.joinPipeline(
      WireFixtures.redisTopicFrame(spark, TestSpark.sfDir),
      WireFixtures.stediTopicFrame(spark, TestSpark.sfDir))
      .as[String].collect().toSet
    assert(expected.nonEmpty)
    assert(got == expected,
      s"missing=${(expected -- got).take(2)} extra=${(got -- expected).take(2)}")
  }

  test("the reference's literal topology runs: readStream kafka x2 -> join -> writeStream kafka") {
    // sparkpykafkajoin.py end-to-end with every arrow real: two Kafka
    // streaming SOURCES (O1, micro-batch path), the no-watermark
    // stream-stream join (O12), to_json (O13), and the Kafka SINK with
    // checkpoint (O15) — only the transport is in-memory.
    graft.fakekafka.FakeKafkaBroker.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_kafka3").toString

    // seed the two input topics through the batch write path
    WireFixtures.redisTopicFrame(spark, TestSpark.sfDir)
      .write.format("kafka").option("topic", "redis-server").save()
    WireFixtures.stediTopicFrame(spark, TestSpark.sfDir)
      .write.format("kafka").option("topic", "stedi-events").save()

    val joined = StediPipelines.joinPipeline(
      KafkaSources.topicStream(spark, "fake:9092", "redis-server"),
      KafkaSources.topicStream(spark, "fake:9092", "stedi-events"))
    assert(joined.isStreaming, "pipeline lost its streaming nature")
    val q = KafkaSources.toTopic(
      joined, "fake:9092", "customer-risk", s"$dir/chk").start()
    try q.processAllAvailable() finally q.stop()

    val got = graft.ops.RefOps.castKeyValueToString(
      KafkaSources.topicBatch(spark, "fake:9092", "customer-risk"))
      .select("value").as[String].collect().toSet
    val expected = StediPipelines.joinPipeline(
      WireFixtures.redisTopicFrame(spark, TestSpark.sfDir),
      WireFixtures.stediTopicFrame(spark, TestSpark.sfDir))
      .as[String].collect().toSet
    assert(expected.nonEmpty)
    assert(got == expected,
      s"missing=${(expected -- got).take(2)} extra=${(got -- expected).take(2)}")
  }

  test("sink enforces the Kafka write contract: a value column is required") {
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("id", "v").write.format("kafka")
        .option("topic", "t").save()
    }
    assert(e.getMessage.contains("value"), e.getMessage)
  }

  test("a GENUINELY replayed epoch (commit log truncated) does not double-write") {
    // the crash window the simple restart test can't reach: the sink
    // committed batch 0 but the driver died before writing commits/0.
    // On restart Spark re-executes batch 0 under a NEW runId — the
    // dedup key must therefore be the checkpoint-stable query id, or
    // this replay double-appends.
    graft.fakekafka.FakeKafkaBroker.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_kafka4").toString
    // input via the fake-kafka SOURCE (not MemoryStream, which purges
    // committed batches and so cannot serve a replay)
    Seq("a", "b").toDF("value").write.format("kafka")
      .option("topic", "in4").save()
    def start() = KafkaSources.toTopic(
      KafkaSources.topicStream(spark, "fake:9092", "in4")
        .selectExpr("CAST(value AS STRING) AS value"),
      "fake:9092", "t4", s"$dir/chk").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // simulate the crash: batch 0 landed in the sink, commit log lost
    // (the local FS keeps a .crc checksum sidecar — a real lost write
    // loses both, so delete both or the replayed rename collides)
    val commit0 = new java.io.File(s"$dir/chk/commits/0")
    assert(commit0.exists(), "expected commit log entry for batch 0")
    assert(commit0.delete())
    new java.io.File(s"$dir/chk/commits/.0.crc").delete()
    Seq("c").toDF("value").write.format("kafka").option("topic", "in4").save()
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val vals = graft.fakekafka.FakeKafkaBroker.read("t4")
      .map(r => new String(r._2, java.nio.charset.StandardCharsets.UTF_8)).sorted
    assert(vals == Seq("a", "b", "c"), s"replayed epoch double-wrote: $vals")
    // and the contract the dedup key rests on, proven not assumed:
    // Spark hands the writer the checkpoint-stable query id — equal
    // across both runs and equal to StreamingQuery.id, NOT the runId
    val ids = graft.fakekafka.FakeKafkaBroker.writerQueryIds.toSeq
    assert(ids.size >= 2, s"expected a writer per run, got $ids")
    assert(ids.distinct == Seq(q2.id.toString), s"ids=$ids q2.id=${q2.id}")
    assert(q1.id == q2.id && q1.runId != q2.runId)
  }

  test("replayed epochs after a checkpoint restart do not double-write") {
    graft.fakekafka.FakeKafkaBroker.clear()
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_kafka2").toString
    val mem = MemoryStream[String]
    mem.addData("a", "b")
    def start() = KafkaSources.toTopic(
      mem.toDF().toDF("value"), "fake:9092", "t2", s"$dir/chk").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart from the same checkpoint; only new data may land
    val q2 = start()
    try { mem.addData("c"); q2.processAllAvailable() } finally q2.stop()
    val vals = graft.fakekafka.FakeKafkaBroker.read("t2")
      .map(r => new String(r._2, java.nio.charset.StandardCharsets.UTF_8)).sorted
    assert(vals == Seq("a", "b", "c"), vals.toString)
  }
}
