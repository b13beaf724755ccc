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
}
