package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (vec_id, embedding: array<float>, label).
  *
  * Two paths:
  *  - brute-force top-k against a small query set: broadcast the query
  *    vectors, score every base vector (one scan, no shuffle for the
  *    scoring), then per-query top-k via window rank — the exactness
  *    baseline;
  *  - LSH-bucketed (random hyperplane signatures): candidates only
  *    within matching buckets — the 100 TB path, where an all-pairs
  *    cross join is impossible.
  *
  * Cosine arithmetic is strictly sequential double accumulation
  * (VectorFunctions) so the DuckDB oracle can match it exactly.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector (queries =
    * vec_id < nQueries; self-matches excluded). The query side is tiny
    * and broadcast; scoring is a single pass over the base table. */
  def bruteForceKnn(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val queries = embeddings
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val scored = embeddings
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"),
        cosine(col("q"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cos")
  }

  /** ANN via random-hyperplane LSH: bucket = packed sign bits of
    * `planes` deterministic hyperplane projections. Neighbor candidates
    * are pairs in the same bucket; top-k per query within candidates.
    * Trades recall for a shuffle bounded by bucket sizes. */
  def lshKnn(embeddings: DataFrame, planes: Int = 8, k: Int = 5): DataFrame = {
    val sig = embeddings.select(
      col("vec_id"), col("embedding"),
      hyperplaneSignature(col("embedding"), planes).as("bucket"))
    val a = sig.select(col("bucket"), col("vec_id").as("query_id"), col("embedding").as("q"))
    val b = sig.select(col("bucket"), col("vec_id"), col("embedding"))
    val scored = a.join(b, "bucket")
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("q"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cos")
  }

  /** Embedding-space near-duplicate pairs: cosine above threshold,
    * blocked by `label` (the natural partition key here; at scale the
    * block key would be a coarse LSH bucket) so the pair space is
    * per-block, never global. */
  def cosineNearDup(embeddings: DataFrame, threshold: Double = 0.9): DataFrame = {
    val a = embeddings.select(col("label"), col("vec_id").as("a_id"), col("embedding").as("a_v"))
    val b = embeddings.select(col("label"), col("vec_id").as("b_id"), col("embedding").as("b_v"))
    a.join(b, Seq("label"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), cosine(col("a_v"), col("b_v")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
