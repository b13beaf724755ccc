package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable binary-quantization ANN index — the fourth (and cheapest)
  * persisted tier beside [[IvfIndex]]/[[Sq8Index]]/[[PqIndex]]: the
  * corpus rides as its packed sign bits ([[Similarity.binarySignatures]],
  * 64 dimensions per long — 32× smaller than float32, the standard
  * cheap first-pass retrieval at 100 TB), maintained with the same
  * marker-last [[LsmSegments]] protocol. Packing is a pure per-vector
  * function (no trained state), deltas commit idempotently, serving
  * scans base ∪ committed deltas with a couple of XOR+popcount per
  * candidate, and [[compact]] swaps in a new generation by a marker
  * written last.
  *
  * Longs round-trip parquet exactly, so [[serveAll]] over any
  * base/delta split is hash-identical to [[Similarity.binaryKnn]]
  * over the union (pinned by spec + the `knn_binary_delta` oracle). */
object BinaryIndex {

  private def writeSegment(df: DataFrame, p: String): Unit =
    df.write.mode("overwrite").parquet(p)

  /** Pack `vectors` (vec_id, embedding) and persist as base
    * generation 0. */
  def write(vectors: DataFrame, path: String): Unit =
    LsmSegments.initBase(vectors.sparkSession, path)(p =>
      writeSegment(Similarity.binarySignatures(vectors), p))

  /** Idempotently pack + append one epoch of vectors as a delta
    * segment; false = epoch already committed (replay — no write). */
  def appendEpoch(
      spark: SparkSession, path: String, epoch: Long,
      vectors: DataFrame): Boolean =
    LsmSegments.appendEpoch(spark, path, epoch)(p =>
      writeSegment(Similarity.binarySignatures(vectors), p))

  /** One consistent snapshot: current base generation ∪ committed
    * unfolded deltas. */
  def readAll(spark: SparkSession, path: String): DataFrame = {
    val (basePath, deltaPaths) = LsmSegments.liveSegments(spark, path)
    deltaPaths.foldLeft(spark.read.parquet(basePath)) {
      (acc, p) => acc.unionByName(spark.read.parquet(p))
    }
  }

  /** Top-k by hamming distance for `queries` = (query_id, qsig:
    * array<long> — pack with [[Similarity.binarySignatures]]),
    * self-matches excluded: the [[Similarity.binaryKnn]] serving plan
    * over the persisted segments. */
  def serveAll(
      spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 5, salts: Int = 32): DataFrame =
    serveSnapshot(readAll(spark, path), queries, k, salts)

  /** The serving plan over an ALREADY-RESOLVED snapshot — the seam a
    * long-lived server (e.g. [[graft.streaming.StreamingOps.binaryServeStream]])
    * uses to resolve the base∪deltas snapshot once and answer many
    * query batches against that one consistent view. */
  private[graft] def serveSnapshot(
      snapshot: DataFrame, queries: DataFrame,
      k: Int, salts: Int): DataFrame =
    Similarity.saltedTopK(
      Similarity.binaryScore(snapshot, queries),
      score = "hamming", ascending = true, k = k, salts = salts)

  /** Fold committed deltas into a new base generation (marker written
    * last — interleaved readers stay consistent); data retired by
    * [[gc]]. */
  def compact(spark: SparkSession, path: String): Unit =
    LsmSegments.compact(spark, path,
      load = ps => ps.map(spark.read.parquet(_)).reduce(_.unionByName(_)),
      write = writeSegment)

  /** Retire superseded generations + folded delta data (epoch markers
    * kept — the replay guard). */
  def gc(spark: SparkSession, path: String, retainGens: Int = 0): Unit =
    LsmSegments.gc(spark, path, retainGens)
}
