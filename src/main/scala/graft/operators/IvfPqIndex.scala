package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable IVF-PQ ANN index (IVFADC, Jégou et al. 2011 — the composed
  * billion-scale layout FAISS defaults to): the coarse centroid table
  * AND the residual codebook persisted once, the corpus persisted as
  * (inverted-list id, PQ codes over the residual v − c(v)) — so BOTH
  * prunings survive the disk round-trip: a query reads only its probed
  * c_id partitions (the IVF term, literal in the on-disk layout like
  * [[IvfIndex]]) and scores each candidate with `subspaces` table adds
  * (the PQ term, memory-bound like [[PqIndex]]). Maintained
  * incrementally with the marker-last [[LsmSegments]] protocol shared
  * by all the index tiers: arriving vectors are assigned + residual-
  * encoded against the FIXED trained state (train once, encode
  * forever) and committed as delta segments; [[compact]] folds deltas
  * into a new generation swapped in by a marker written last.
  *
  * Layout: `<path>/centroids` = (c_id, c_vec array<float>),
  * `<path>/codebook` = (cw_k int, cw full-dim array<double> — RESIDUAL
  * codewords, doubles because residuals are exact float32 differences
  * computed in double), `<path>/meta` = one row (subspaces, sub_dim),
  * plus the [[LsmSegments]] base/delta segments of (vec_id, c0..c_{M−1})
  * PARTITIONED BY c_id — one directory per inverted list per segment.
  * Codes are ints and centroid floats / codeword doubles round-trip
  * parquet exactly, so [[serveAll]] over any base/delta split is
  * hash-identical to [[Similarity.ivfPqKnn]] over the union with the
  * same trained state (pinned by spec + the `knn_ivfpq_delta` oracle). */
object IvfPqIndex {

  /** Shared with [[IvfIndex]]: c_id-partitioned with the empty-frame
    * fallback (an empty micro-batch epoch must not poison the store —
    * see [[LsmSegments.writeCidPartitionedSegment]]). */
  private def writeSegment(df: DataFrame, p: String): Unit =
    LsmSegments.writeCidPartitionedSegment(df, p)

  /** The c_id partition column comes back type-inferred (int); the
    * serving plan joins it against the probe LUTs' long. */
  private def loadSegment(spark: SparkSession, p: String): DataFrame =
    spark.read.parquet(p).withColumn("c_id", col("c_id").cast("long"))

  private def readMeta(spark: SparkSession, path: String): (Int, Int) = {
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getAs[Int]("subspaces"), r.getAs[Int]("sub_dim"))
  }

  /** Persist the trained state (coarse centroids + residual codebook +
    * grid metadata) and assign/encode `vectors` (vec_id, embedding) as
    * base generation 0. `centroids` = (c_id, c_vec); `codebook` =
    * (cw_k int, cw: full-dimension array<double> residual codewords) —
    * [[Similarity.ivfPqKnn]]'s seed form ([[Similarity.ivfPqSeedCodebook]])
    * or any trained equivalent. Both are FIXED for the life of the
    * index — re-training means a new index.
    *
    * ADC serving indexes LUTs POSITIONALLY (element_at over a
    * cw_k-sorted list), which is only correct when cw_k is dense
    * 0..K−1 — so the codebook is re-keyed dense here, order-preserving
    * (identity for an already-dense codebook, so the seed-form oracles
    * are unchanged; a trained codebook with gaps — an emptied cluster —
    * is made safe instead of silently misindexing). Encode and serve
    * both read the STORED (re-keyed) codebook, so they stay mutually
    * consistent by construction. */
  def write(
      vectors: DataFrame, centroids: DataFrame, codebook: DataFrame,
      path: String, subspaces: Int = 4, subDim: Int = 16): Unit = {
    val spark = vectors.sparkSession
    import spark.implicits._
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    Similarity.denseCodebook(codebook)
      .write.mode("overwrite").parquet(s"$path/codebook")
    Seq((subspaces, subDim)).toDF("subspaces", "sub_dim")
      .write.mode("overwrite").parquet(s"$path/meta")
    LsmSegments.initBase(spark, path)(p =>
      writeSegment(encode(spark, path, vectors, subspaces, subDim), p))
  }

  /** Assign + residual-encode against the STORED trained state. */
  private def encode(
      spark: SparkSession, path: String, vectors: DataFrame,
      subspaces: Int, subDim: Int): DataFrame =
    Similarity.ivfPqEncodeCodes(
      Similarity.ivfPqResiduals(
        vectors, spark.read.parquet(s"$path/centroids")),
      spark.read.parquet(s"$path/codebook"), subspaces, subDim)

  /** Idempotently assign + encode one epoch of vectors against the
    * stored trained state; false = epoch already committed (replay —
    * no write). */
  def appendEpoch(
      spark: SparkSession, path: String, epoch: Long,
      vectors: DataFrame): Boolean =
    LsmSegments.appendEpoch(spark, path, epoch) { p =>
      val (subspaces, subDim) = readMeta(spark, path)
      writeSegment(encode(spark, path, vectors, subspaces, subDim), p)
    }

  /** One consistent snapshot of the code segments. */
  def readAll(spark: SparkSession, path: String): DataFrame = {
    val (basePath, deltaPaths) = LsmSegments.liveSegments(spark, path)
    deltaPaths.foldLeft(loadSegment(spark, basePath)) {
      (acc, p) => acc.unionByName(loadSegment(spark, p))
    }
  }

  /** Resolve one consistent snapshot PLUS the index's fixed trained
    * state in a single call — the handle a long-lived server (e.g.
    * [[graft.streaming.StreamingOps.ivfPqServeStream]]) opens once and
    * answers many query batches against. */
  private[graft] def openAll(
      spark: SparkSession, path: String): (DataFrame, DataFrame, DataFrame, Int, Int) = {
    val (subspaces, subDim) = readMeta(spark, path)
    (readAll(spark, path),
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/codebook"), subspaces, subDim)
  }

  /** The serving plan over an [[openAll]] handle: per-(query, probed
    * centroid) ADC LUTs from the stored trained state (broadcast), one
    * scan over the probed c_id partitions of the persisted code
    * segments — the broadcast LUT join's c_id filter reaches every
    * segment's parquet source as a partition filter — two-phase salted
    * top-k. */
  private[graft] def serveSnapshot(
      snapshot: DataFrame, centroids: DataFrame, codebook: DataFrame,
      subspaces: Int, subDim: Int, queries: DataFrame,
      k: Int, nProbe: Int, salts: Int): DataFrame = {
    val luts = Similarity.ivfPqProbeLuts(
      queries, centroids, codebook, subspaces, subDim, nProbe)
    Similarity.saltedTopK(
      Similarity.ivfPqAdcScore(snapshot, luts, subspaces),
      score = "adc_dist", ascending = true, k = k, salts = salts)
  }

  /** Top-k by ADC distance over base ∪ committed deltas for `queries`
    * = (query_id, q: array<float>), self-matches excluded —
    * [[Similarity.ivfPqKnn]]'s serving plan over the persisted index,
    * hash-identical to it over the same union. */
  def serveAll(
      spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 4, salts: Int = 32): DataFrame = {
    val (snapshot, centroids, codebook, subspaces, subDim) = openAll(spark, path)
    serveSnapshot(
      snapshot, centroids, codebook, subspaces, subDim, queries, k, nProbe, salts)
  }

  /** Fold committed deltas into a new base generation (marker written
    * last — interleaved readers stay consistent); data retired by
    * [[gc]], not here. */
  def compact(spark: SparkSession, path: String): Unit =
    LsmSegments.compact(spark, path,
      load = ps => ps.map(loadSegment(spark, _)).reduce(_.unionByName(_)),
      write = writeSegment)

  /** Retire superseded generations + folded delta data (epoch commit
    * markers kept — the replay guard). */
  def gc(spark: SparkSession, path: String, retainGens: Int = 0): Unit =
    LsmSegments.gc(spark, path, retainGens)
}
