package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable IVF ANN index: the trained centroid table plus the
  * per-vector inverted-list assignment, persisted as parquet and
  * served WITHOUT retraining or reassignment — how a production
  * pipeline actually uses a trainer's output (train once, serve many).
  *
  * Layout:
  *  - `<path>/centroids`: (c_id, c_vec) — k rows;
  *  - `<path>/assignments`: (vec_id, embedding, c_id) PARTITIONED BY
  *    c_id — one directory per inverted list, so a probe of `nProbe`
  *    lists is a partition-pruned scan: the broadcast probe join's
  *    c_id filter reaches the parquet source as a partition filter
  *    (dynamic partition pruning), and the un-probed (nCentroids −
  *    nProbe)/nCentroids of the corpus is never read. That pruning is
  *    the entire point of IVF at 100 TB — the on-disk layout makes it
  *    literal instead of logical.
  *
  * float32 embeddings round-trip parquet bit-exactly, so serving from
  * the persisted index is hash-identical to the in-memory
  * [[Similarity.ivfKnnWith]] path (pinned by spec + the
  * `knn_ivf_persisted` oracle query). */
object IvfIndex {

  /** Build the assignment from `centroids` and persist both halves. */
  def write(embeddings: DataFrame, centroids: DataFrame, path: String): Unit = {
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    graft.sources.FileSources.writePartitionedParquet(
      Similarity.ivfAssign(embeddings, centroids),
      s"$path/assignments", partitionCols = Seq("c_id"))
  }

  /** Load the two index relations. The c_id partition column comes
    * back type-inferred (int), so it is cast to the long the serving
    * plan expects. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val assigned = spark.read.parquet(s"$path/assignments")
      .select(col("vec_id"), col("embedding"), col("c_id").cast("long").as("c_id"))
    (assigned, centroids)
  }

  /** Serve top-k from the persisted index: probe-list selection +
    * exact-cosine rank, corpus touched only in the probed partitions.
    * `queries` = (query_id, q: array<float>). */
  def serve(
      spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 4): DataFrame = {
    val (assigned, centroids) = read(spark, path)
    Similarity.ivfServe(assigned, centroids, queries, k, nProbe)
  }

  // ---- incremental index maintenance (delta segments, no retrain) ----
  //
  // The ingest-time half of a production ANN pipeline: new embeddings
  // keep arriving after the index is built, and retraining per batch is
  // off the table. Each epoch's vectors are assigned against the FIXED
  // trained centroids and written as their own c_id-partitioned delta
  // segment under `<path>/deltas/<epoch>`, committed by a marker file
  // under `<path>/epochs/` written LAST — the LSM pattern every real
  // ANN serving system uses (base segment + deltas + compaction).
  // Exactly-once: a replayed epoch (stream checkpoint lost the commit
  // race) finds its marker and is skipped; a TORN delta (crash
  // mid-write, no marker) is invisible to reads and simply overwritten
  // by the replay. Serving unions the base with the committed deltas —
  // every segment is c_id-partitioned parquet, so the probe's
  // partition pruning holds segment by segment.

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed delta epochs, ascending. */
  def committedEpochs(spark: SparkSession, path: String): Seq[Long] = {
    val fs = hadoopFs(spark, path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/epochs")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).sorted
  }

  /** Idempotently append one epoch of `vectors` (vec_id, embedding) as
    * a delta segment: assign against the trained centroids, write the
    * segment (overwrite — replays clobber torn attempts), then the
    * commit marker. Returns false if the epoch was already committed
    * (the replay case — nothing is written). */
  def appendEpoch(
      spark: SparkSession, path: String, epoch: Long,
      vectors: DataFrame): Boolean = {
    val fs = hadoopFs(spark, path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/epochs/$epoch")
    if (fs.exists(marker)) false
    else {
      val centroids = spark.read.parquet(s"$path/centroids")
      graft.sources.FileSources.writePartitionedParquet(
        Similarity.ivfAssign(vectors, centroids),
        s"$path/deltas/$epoch", partitionCols = Seq("c_id"))
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
      true
    }
  }

  /** Load the index INCLUDING committed delta segments. Epochs whose
    * marker survives but whose data segment was folded into the base
    * by [[compact]] are skipped (the marker outlives the segment ON
    * PURPOSE — it is the replay guard). */
  def readAll(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val (base, centroids) = read(spark, path)
    val fs = hadoopFs(spark, path)
    val all = committedEpochs(spark, path)
      .filter(e => fs.exists(new org.apache.hadoop.fs.Path(s"$path/deltas/$e")))
      .foldLeft(base) { (acc, e) =>
        acc.unionByName(spark.read.parquet(s"$path/deltas/$e")
          .select(col("vec_id"), col("embedding"),
            col("c_id").cast("long").as("c_id")))
      }
    (all, centroids)
  }

  /** [[serve]] over base + committed deltas. */
  def serveAll(
      spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 4): DataFrame = {
    val (assigned, centroids) = readAll(spark, path)
    Similarity.ivfServe(assigned, centroids, queries, k, nProbe)
  }

  /** Fold the committed deltas back into the base segment (the LSM
    * compaction): rewrites `<path>/assignments` from the merged view,
    * then retires the delta segments AND their markers — epoch ids are
    * monotone (streaming batch ids), so a replay of a compacted epoch
    * re-appends nothing only if its marker survives; compaction
    * therefore KEEPS the markers and deletes only the data segments. */
  def compact(spark: SparkSession, path: String): Unit = {
    val epochs = committedEpochs(spark, path)
    if (epochs.nonEmpty) {
      val (all, _) = readAll(spark, path)
      // materialize the merged view BEFORE overwriting the directory
      // it reads from (localCheckpoint cuts the scan lineage)
      val merged = all.localCheckpoint(true)
      try {
        graft.sources.FileSources.writePartitionedParquet(
          merged, s"$path/assignments", partitionCols = Seq("c_id"))
        val fs = hadoopFs(spark, path)
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/deltas"), true)
      } finally graft.operators.Storage.unpersistLocalCheckpoint(merged)
    }
  }
}
