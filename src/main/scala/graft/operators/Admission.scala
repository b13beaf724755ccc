package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The production ADMISSION LOOP: arriving document shards are probed
  * against a pair of durable dedup indexes, the survivors admitted,
  * and the admitted docs appended back into BOTH indexes — so every
  * later shard dedups against everything admitted so far, without a
  * corpus re-scan, across process restarts. This is the gate an LLM
  * pretrain corpus actually runs at ingest time: the batch
  * `pretrainGate`/`dedup_exact`/`minhashLsh` composition served from
  * durable [[LsmSegments]] state instead of stream-local state-store
  * state. (Stateless quality/langid/decontamination gates compose
  * upstream of this loop unchanged — they need no index.)
  *
  * Three marker-last [[LsmSegments]] stores under one root `path`:
  *  - `path/admitted` — the admitted corpus (doc_id, text), one delta
  *    segment per epoch. This doubles as the loop's WRITE-AHEAD
  *    DECISION LOG: the admission decision for epoch e is computed
  *    once, against index state that cannot yet contain e, and
  *    committed here FIRST — replays re-read the stored decision
  *    instead of re-deciding against indexes that may already hold
  *    the epoch's own docs (which would wrongly flag every admitted
  *    doc as a duplicate of itself);
  *  - `path/exact`   — the [[ContentHashIndex]] of admitted docs;
  *  - `path/neardup` — the [[MinHashIndex]] of admitted docs.
  *
  * ADMISSION POLICY (deterministic; the oracle replays it in SQL):
  * per shard, in arrival (epoch) order —
  *  1. exact stage: a doc is dropped if its content hash is already
  *     indexed ([[ContentHashIndex.probeNew]]), or if a smaller-id
  *     doc in the same shard shares its hash (keep-first);
  *  2. near-dup stage: among exact survivors, a doc X is dropped if a
  *     verified pair (Jaccard ≥ threshold) connects X to any indexed
  *     doc, or to any smaller-id exact-survivor of the same shard
  *     ([[MinHashIndex.probePairs]] supplies exactly these pairs).
  *     Exact-dropped docs cannot shelter a near-dup: any pair through
  *     a dropped exact copy also exists through its indexed/surviving
  *     twin (identical text ⇒ identical shingle set);
  *  3. survivors are admitted and appended into both indexes under
  *     the shard's epoch id.
  *
  * Crash safety (the order IS the proof): the decision commits to
  * `admitted` first; only then do the (individually idempotent,
  * marker-guarded) index appends run. A crash before the admitted
  * marker leaves the indexes untouched, so the replay re-decides
  * against pre-epoch state and gets the same answer (deterministic
  * policy, exactly-once source replay). A crash after it finds the
  * decision committed and only re-runs whichever index appends are
  * missing. Single writer per root, per the [[LsmSegments]] contract;
  * run [[compact]] in maintenance windows (it folds all three stores
  * — an admitted delta segment must outlive its epoch's index appends,
  * which a mid-lineage gc of a crashed epoch could violate).
  *
  * 100 TB shape: per shard the work is one fingerprint pass over the
  * SHARD, o(index) broadcast-semi-join probes against both indexes,
  * and one shard shuffle on the 8-byte content hash — never a scan of
  * the admitted corpus. Shard doc_ids must be globally unique (crawl
  * record ids), so shards are disjoint from the indexes by
  * construction, as [[MinHashIndex.probePairs]] requires. */
object Admission {

  private def store(path: String, which: String) = s"$path/$which"

  /** Initialize all three stores empty. LSH parameters are fixed for
    * the life of the loop, like any [[MinHashIndex]]. */
  def init(
      spark: SparkSession, path: String, shingleN: Int = 3,
      numHashes: Int = 16, bands: Int = 8): Unit = {
    val empty = spark.range(0)
      .select(col("id").as("doc_id"), lit("").as("text"))
    LsmSegments.initBase(spark, store(path, "admitted"))(p =>
      empty.write.mode("overwrite").parquet(p))
    ContentHashIndex.write(empty, store(path, "exact"))
    MinHashIndex.write(empty, store(path, "neardup"), shingleN, numHashes, bands)
  }

  /** The admission decision for one shard against the CURRENT index
    * state — the pure policy, shared by the loop and its spec.
    * Returns an eagerly materialized (doc_id, text) frame (at most
    * shard-sized; release with [[Storage.unpersistLocalCheckpoint]]).
    * Does NOT mutate anything. */
  private[graft] def decide(
      spark: SparkSession, path: String, shard: DataFrame,
      threshold: Double): DataFrame = {
    // ONE scan of the shard source, materialized with its content
    // hash — every exact-stage branch (index probe, keep-first agg,
    // survivor projection) reads the checkpoint, never the source
    val hashed = shard.select(col("doc_id"), col("text"),
      xxhash64(col("text")).as("text_hash"))
      .localCheckpoint(eager = true)
    val exactSurvivors = try {
      val exactDropped = ContentHashIndex
        .probeNewPlan(spark, store(path, "exact"),
          hashed.select(col("doc_id"), col("text_hash")))
        .select("doc_id")
      // within-shard keep-first: min_by is a map-side-combinable
      // partial aggregate — one shard-sized shuffle on the 8-byte
      // hash, no per-hash window funnel
      hashed
        .groupBy("text_hash")
        .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id"))
          .as("first"))
        .select(col("first.doc_id").as("doc_id"),
          col("first.text").as("text"))
        .join(broadcast(exactDropped), Seq("doc_id"), "left_anti")
        .localCheckpoint(eager = true)
    } finally Storage.unpersistLocalCheckpoint(hashed)
    try {
      // near-dup stage: pairs touching the shard, vs index ∪ shard
      // (eager, output-sized — released below)
      val pairs = MinHashIndex.probePairs(
        spark, store(path, "neardup"), exactSurvivors, threshold)
      try {
        val survivorIds = exactSurvivors.select("doc_id")
        // pairs are oriented a < b: a shard-side b always has a
        // smaller-id partner (indexed or in-shard) — dropped; a
        // shard-side a with a non-shard b is paired with an indexed
        // doc — dropped
        val dropB = pairs
          .join(survivorIds, pairs("b_id") === survivorIds("doc_id"),
            "left_semi")
          .select(col("b_id").as("doc_id"))
        val dropA = pairs
          .join(survivorIds, pairs("b_id") === survivorIds("doc_id"),
            "left_anti")
          .select(col("a_id").as("doc_id"))
        exactSurvivors
          .join(broadcast(dropB.unionByName(dropA).distinct()),
            Seq("doc_id"), "left_anti")
          .localCheckpoint(eager = true)
      } finally Storage.unpersistLocalCheckpoint(pairs)
    } finally Storage.unpersistLocalCheckpoint(exactSurvivors)
  }

  /** Admit one epoch: decide (or, on replay, re-read the committed
    * decision), commit the admitted segment, then append the admitted
    * docs into both indexes. Idempotent under replay at every crash
    * point. Returns the admitted docs (lazy, over the stored
    * segment). */
  def admitEpoch(
      spark: SparkSession, path: String, epoch: Long, shard: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val admittedPath = store(path, "admitted")
    // fail fast on a loop that was never [[init]]ed — appendEpoch
    // itself would happily commit into a half-existing store
    LsmSegments.current(spark, admittedPath)
    LsmSegments.appendEpoch(spark, admittedPath, epoch) { p =>
      val admitted = decide(spark, path, shard, threshold)
      try admitted.write.mode("overwrite").parquet(p)
      finally Storage.unpersistLocalCheckpoint(admitted)
    }
    val admitted = spark.read.parquet(s"$admittedPath/deltas/$epoch")
    ContentHashIndex.appendEpoch(spark, store(path, "exact"), epoch, admitted)
    MinHashIndex.appendEpoch(spark, store(path, "neardup"), epoch, admitted)
    admitted
  }

  /** The admitted corpus: one consistent snapshot of the admitted
    * store (base ∪ committed deltas). */
  def admittedAll(spark: SparkSession, path: String): DataFrame = {
    val (basePath, deltaPaths) =
      LsmSegments.liveSegments(spark, store(path, "admitted"))
    deltaPaths.foldLeft(spark.read.parquet(basePath)) {
      (acc, p) => acc.unionByName(spark.read.parquet(p))
    }
  }

  /** Committed epochs of the admitted store (== fully decided
    * epochs). */
  def committedEpochs(spark: SparkSession, path: String): Seq[Long] =
    LsmSegments.committedEpochs(spark, store(path, "admitted"))

  /** Maintenance: fold + retire all three stores. With the default
    * `retainGens = 0`, run in a window when the ingest stream is
    * stopped (see the class contract). `retainGens = 1` is the
    * IN-LOOP policy ([[graft.streaming.StreamingOps.admissionIngestStream]]'s
    * `compactEvery`): one superseded generation per store stays alive,
    * so (a) concurrent read-only consumers of [[admittedAll]] keep
    * their snapshot for a full further cycle, and (b) the most recent
    * epoch's admitted delta segment — the decision a crash-replay of
    * that epoch re-reads — always outlives at least one compaction
    * (its data is only retired once a LATER generation has folded it,
    * by which point the stream checkpoint has committed the epoch and
    * it can never replay). */
  def compact(spark: SparkSession, path: String, retainGens: Int = 0): Unit = {
    LsmSegments.compact(spark, store(path, "admitted"),
      load = ps => ps.map(spark.read.parquet(_)).reduce(_.unionByName(_)),
      write = (df, p) => df.write.mode("overwrite").parquet(p))
    LsmSegments.gc(spark, store(path, "admitted"), retainGens)
    ContentHashIndex.compact(spark, store(path, "exact"))
    ContentHashIndex.gc(spark, store(path, "exact"), retainGens)
    MinHashIndex.compact(spark, store(path, "neardup"))
    MinHashIndex.gc(spark, store(path, "neardup"), retainGens)
  }
}
