package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Admission, ContentHashIndex, Dedup, LsmSegments, MinHashIndex}
import graft.streaming.StreamingOps

/** The production admission loop ([[graft.operators.Admission]]):
  * shards probed against the persisted exact + near-dup indexes,
  * survivors admitted and appended back into both, replay-safe at
  * every crash point. */
class AdmissionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // engineered corpus: tokens are long unique runs so every intended
  // near-dup pair sits at J ≈ 0.95+ (fixed-seed LSH recall is total
  // there — same regime MinHashIndexSpec pins)
  private val A = (1 to 40).map(i => s"alpha$i").mkString(" ")
  private val B = (1 to 40).map(i => s"beta$i").mkString(" ")
  private val C = (1 to 40).map(i => s"gamma$i").mkString(" ")
  private val D = (1 to 40).map(i => s"delta$i").mkString(" ")

  // shard 0: 2 near-dups A (keep 1), exact pair B (keep 3)
  private val shard0 = docs(
    (1L, A), (2L, A + " extraA"), (3L, B), (4L, B))
  // shard 1: exact copy of admitted A (drop), near-dup of admitted B
  // (drop), fresh C (keep), in-shard near-dup of C (drop)
  private val shard1 = docs(
    (10L, A), (11L, B + " extraB"), (12L, C), (13L, C + " extraC"))
  // shard 2: near-dup of REJECTED doc 2's text — its admitted twin 1
  // still catches it (drop); fresh D (keep); second near-dup of the
  // long-admitted B (drop — the index remembers epoch 0)
  private val shard2 = docs(
    (20L, A + " extraA"), (21L, D), (22L, B + " otherB"))

  private val wantByEpoch =
    Map(0L -> Set(1L, 3L), 1L -> Set(12L), 2L -> Set(21L))

  private def admittedIds(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id").as[Long].collect().toSet

  test("three-shard batch fold follows the policy; indexes converge to the admitted corpus") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_adm_spec_").toString
    Admission.init(spark, path)
    val got = Seq(shard0, shard1, shard2).zipWithIndex.map { case (sh, e) =>
      e.toLong -> admittedIds(Admission.admitEpoch(spark, path, e.toLong, sh))
    }.toMap
    assert(got == wantByEpoch, s"admission diverged: $got")
    assert(admittedIds(Admission.admittedAll(spark, path)) ==
      wantByEpoch.values.flatten.toSet)
    // both indexes hold EXACTLY the admitted corpus: the exact tier
    // serves one singleton group per admitted doc, and the admitted
    // corpus is exact- and near-dup-free by construction of the policy
    val admitted = Admission.admittedAll(spark, path)
    assert(ContentHashIndex.serveGroups(spark, s"$path/exact")
      .select("keep_doc_id", "n_copies")
      .as[(Long, Long)].collect().toSet ==
      wantByEpoch.values.flatten.map(id => (id, 1L)).toSet)
    assert(MinHashIndex.servePairs(spark, s"$path/neardup").isEmpty)
    assert(Dedup.exact(admitted).where($"n_copies" > 1).isEmpty)
  }

  test("replay at the worst crash point re-reads the committed decision, never re-decides") {
    // crash window: the admitted segment for epoch 1 committed, the
    // exact-index append committed, the MinHash append LOST. A replay
    // that re-DECIDED would probe indexes already holding epoch 1's
    // own docs, flag every one a duplicate of itself, and admit
    // nothing — the write-ahead decision log is what prevents that.
    val path = java.nio.file.Files
      .createTempDirectory("graft_adm_replay_").toString
    Admission.init(spark, path)
    Admission.admitEpoch(spark, path, 0L, shard0)
    // run epoch 1's first two protocol steps by hand, "crash" before
    // the MinHash append
    val decided = Admission.decide(spark, path, shard1, 0.5)
    try {
      LsmSegments.appendEpoch(spark, s"$path/admitted", 1L)(p =>
        decided.write.mode("overwrite").parquet(p))
    } finally graft.operators.Storage.unpersistLocalCheckpoint(decided)
    ContentHashIndex.appendEpoch(spark, s"$path/exact", 1L,
      spark.read.parquet(s"$path/admitted/deltas/1"))
    assert(LsmSegments.committedEpochs(spark, s"$path/neardup") == Seq(0L),
      "test harness: the MinHash append must be missing")
    // restart replays epoch 1 with the SAME batch content
    val replayed = admittedIds(Admission.admitEpoch(spark, path, 1L, shard1))
    assert(replayed == wantByEpoch(1L),
      s"replay changed the committed decision: $replayed")
    assert(LsmSegments.committedEpochs(spark, s"$path/neardup") ==
      Seq(0L, 1L), "replay did not complete the missing index append")
    // and the loop continues unharmed
    assert(admittedIds(Admission.admitEpoch(spark, path, 2L, shard2)) ==
      wantByEpoch(2L))
    assert(admittedIds(Admission.admittedAll(spark, path)) ==
      wantByEpoch.values.flatten.toSet)
  }

  test("streamed loop killed and resumed mid-stream equals the batch fold; compact preserves it") {
    // the end-to-end composition the round-11 review asked for: a
    // durable stream of shards through the admission loop, killed
    // after the first micro-batch, resumed from the same checkpoint
    // lineage, and pinned equal to the batch fold over the same
    // shards in arrival order.
    val base = java.nio.file.Files
      .createTempDirectory("graft_adm_stream_").toString
    val (src, ckpt, loop) = (s"$base/src", s"$base/chk", s"$base/loop")
    Admission.init(spark, loop)
    val perEpoch =
      scala.collection.concurrent.TrieMap.empty[Long, Set[Long]]
    // one file per shard + one file per trigger, so micro-batch
    // epochs are exactly the shards in arrival order
    def start() = StreamingOps.admissionIngestStream(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(src),
      loop, options = Map("checkpointLocation" -> ckpt)) { (ep, admitted) =>
      perEpoch(ep) = admittedIds(admitted)
    }
    shard0.coalesce(1).write.mode("append").parquet(src)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()   // KILL
    assert(perEpoch.get(0L).contains(wantByEpoch(0L)), s"$perEpoch")
    shard1.coalesce(1).write.mode("append").parquet(src)
    shard2.coalesce(1).write.mode("append").parquet(src)
    val q2 = start()                                  // RESUME
    try q2.processAllAvailable() finally q2.stop()
    assert(perEpoch.toMap == wantByEpoch, s"$perEpoch")
    assert(admittedIds(Admission.admittedAll(spark, loop)) ==
      wantByEpoch.values.flatten.toSet)
    // a fresh lineage against the live loop fails fast
    val ex = intercept[IllegalArgumentException] {
      StreamingOps.admissionIngestStream(
        spark.readStream.schema("doc_id LONG, text STRING").parquet(src),
        loop)()
    }
    assert(ex.getMessage.contains("checkpointLocation"), ex.getMessage)
    // maintenance folds all three stores without changing anything
    Admission.compact(spark, loop)
    assert(admittedIds(Admission.admittedAll(spark, loop)) ==
      wantByEpoch.values.flatten.toSet)
    assert(MinHashIndex.servePairs(spark, s"$loop/neardup").isEmpty)
  }

  test("streamed loop with compactEvery folds all three stores mid-stream without changing admissions") {
    // in-loop maintenance: with compactEvery = 2 the threshold fires
    // after epoch 1 (two unfolded epochs), folding admitted + exact +
    // neardup into generation 1 while the stream keeps running —
    // epoch 2 is then decided against the COMPACTED indexes and must
    // admit exactly what the uncompacted batch fold admits.
    val base = java.nio.file.Files
      .createTempDirectory("graft_adm_autocpt_").toString
    val (src, ckpt, loop) = (s"$base/src", s"$base/chk", s"$base/loop")
    Admission.init(spark, loop)
    val perEpoch =
      scala.collection.concurrent.TrieMap.empty[Long, Set[Long]]
    shard0.coalesce(1).write.mode("append").parquet(src)
    shard1.coalesce(1).write.mode("append").parquet(src)
    shard2.coalesce(1).write.mode("append").parquet(src)
    val q = StreamingOps.admissionIngestStream(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(src),
      loop, options = Map("checkpointLocation" -> ckpt),
      compactEvery = 2) { (ep, admitted) =>
      perEpoch(ep) = admittedIds(admitted)
    }
    try q.processAllAvailable() finally q.stop()
    assert(perEpoch.toMap == wantByEpoch, s"admissions diverged: $perEpoch")
    for (s <- Seq("admitted", "exact", "neardup")) {
      // threshold fired exactly once, after epoch 1; epoch 2 is the
      // one unfolded delta awaiting the next cycle
      assert(LsmSegments.current(spark, s"$loop/$s") == (1L, 1L),
        s"store $s did not fold: ${LsmSegments.current(spark, s"$loop/$s")}")
      // epoch markers survive the in-loop gc as the replay guard
      assert(LsmSegments.committedEpochs(spark, s"$loop/$s") ==
        Seq(0L, 1L, 2L), s"store $s lost epoch markers")
    }
    assert(admittedIds(Admission.admittedAll(spark, loop)) ==
      wantByEpoch.values.flatten.toSet)
    assert(MinHashIndex.servePairs(spark, s"$loop/neardup").isEmpty)
  }

  test("an un-initialized loop fails loudly instead of admitting into thin air") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_adm_uninit_").toString
    val e = intercept[IllegalArgumentException] {
      Admission.admitEpoch(spark, path, 0L, shard0)
    }
    assert(e.getMessage.contains("never initialized"), e.getMessage)
  }
}
