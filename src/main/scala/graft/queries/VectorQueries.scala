package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal
import graft.operators.Similarity

/** Similarity-search + sketch + multimodal query surface (SURVEY.md
  * §2.3). The DuckDB oracle reproduces cosine scores bit-exactly: both
  * engines widen float→double element-wise, multiply pairwise, and
  * accumulate strictly left-to-right (Spark `aggregate` from 0.0 ==
  * DuckDB `list_reduce` seeded with the first element, since
  * 0.0 + x == x), then one sqrt and one division — all IEEE-exact.
  */
object VectorQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "knn_brute" -> ((s, d) =>
      Similarity.bruteForceKnn(Tables.embeddings(s, d), nQueries = 8, k = 5)),

    "knn_lsh" -> ((s, d) =>
      Similarity.lshKnn(Tables.embeddings(s, d), planes = 8, k = 5)),

    // threshold 0.35 sits below the max pairwise cosine of the random
    // testdata embeddings at every SF, so the pass is non-vacuous
    // (threshold 0.9 matched nothing — empty ≡ empty proves nothing).
    // The headline operator is the banded-LSH one; the brute-force
    // definition is kept as its own oracled query so both the scale
    // path and the exactness baseline are hash-checked.
    "neardup_cosine" -> ((s, d) =>
      Similarity.cosineNearDup(Tables.embeddings(s, d), threshold = 0.35)),

    "neardup_cosine_exact" -> ((s, d) =>
      Similarity.cosineNearDupExact(Tables.embeddings(s, d), threshold = 0.35)),

    "emb_norms" -> ((s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        graft.functions.VectorFunctions.norm(col("embedding")).as("l2_norm"))),

    // scalar-row shape (vec_id, dim, u) rather than a raw array column:
    // array cells aren't sortable/hashable by the oracle harness, and
    // the exploded form is what a downstream per-dimension consumer
    // (e.g. the centroid query below) reads anyway.
    "emb_normalize" -> ((s, d) =>
      Tables.embeddings(s, d)
        .withColumn("n", graft.functions.VectorFunctions.norm(col("embedding")))
        .select(
          col("vec_id"),
          posexplode(transform(col("embedding"), x => x.cast("double") / col("n"))))
        .select(col("vec_id"), col("pos").cast("long").as("dim"), col("col").as("u"))),

    "emb_label_centroid_dist" -> ((s, d) => {
      // avg vector per label via posexplode + mean, then each vector's
      // dot with its label centroid — array agg exercised end-to-end.
      val e = Tables.embeddings(s, d)
      val dims = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding"))).toDF("vec_id", "label", "dim", "x")
      dims.groupBy("label", "dim")
        .agg(avg(col("x").cast("double")).as("cx"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_dims"),
          round(sum(col("cx") * col("cx")), 6).as("centroid_sq_norm"))
    }),

    "sketch_hll" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))),

    "sketch_quantiles" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(expr("approx_percentile(value, array(0.25, 0.5, 0.75), 1000)").as("qs"))
        .select(col("event_type"),
          element_at(col("qs"), 1).as("p25"),
          element_at(col("qs"), 2).as("p50"),
          element_at(col("qs"), 3).as("p75"))),

    // exploded to one row per histogram bin — same reason as
    // emb_normalize: the harness sorts output rows, and array cells
    // aren't sortable.
    "mm_features" -> ((s, d) =>
      Multimodal.extractFeatures(
        s, Multimodal.assetsFromDocuments(Tables.documents(s, d))).toDF()
        .select(col("asset_id"), col("kind"), col("n_bytes"),
          posexplode(col("features")))
        .select(col("asset_id"), col("kind"), col("n_bytes"),
          col("pos").cast("long").as("bin"), col("col").as("f"))),

    // multimodal → similarity composition: extract (stub) features
    // from binary payloads, then ANN over the feature space — the
    // end-to-end shape of an embedding-dedup pass over an asset lake.
    "mm_feature_knn" -> ((s, d) => {
      val feats = Multimodal.extractFeatures(
        s, Multimodal.assetsFromDocuments(Tables.documents(s, d))).toDF()
        .select(col("asset_id").as("vec_id"),
          transform(col("features"), x => x.cast("float")).as("embedding"))
      Similarity.bruteForceKnn(feats, nQueries = 4, k = 3)
    }),

    "mm_frames" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.assetsFromDocuments(Tables.documents(s, d)))
        .groupBy("asset_id")
        .agg(count(lit(1)).as("n_frames"), sum(length(col("frame_bytes"))).as("total_bytes"))))

  // dot(a,b) with strict left-to-right double accumulation, 1-based idx
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_transform($a, (x, i) -> CAST(x AS DOUBLE) * CAST(($b)[i] AS DOUBLE)), (acc, x) -> acc + x)"
  private def normSql(a: String) =
    s"sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))"
  private def cosSql(a: String, b: String) =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  // brute-force first-principles near-dup definition — the banded-LSH
  // operator must reproduce it exactly (recall ~1 by construction)
  private val neardupOracle =
    s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               ${cosSql("a.embedding", "b.embedding")} AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35"""

  def oracles: Map[String, String] = Map(
    "knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
           scored AS (
             SELECT q.query_id, e.vec_id,
                    ${cosSql("q.qv", "e.embedding")} AS cos
             FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
           ranked AS (
             SELECT query_id, vec_id, cos,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, vec_id ASC) AS rank
             FROM scored)
          SELECT query_id, vec_id, CAST(rank AS INT) AS rank, cos
          FROM ranked WHERE rank <= 5""",

    "neardup_cosine" -> neardupOracle,
    "neardup_cosine_exact" -> neardupOracle,

    "emb_norms" ->
      s"""SELECT vec_id, ${normSql("embedding")} AS l2_norm FROM embeddings""",

    "emb_normalize" ->
      s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings)
          SELECT vec_id,
                 CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
                 unnest(list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm)) AS u
          FROM n""")
}
