package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed record for a multimodal asset: the payload is an opaque
  * binary column plus typed metadata — the schema a 100 TB image/audio
  * lake would use (content-addressed binary + queryable metadata,
  * partition-prunable by `kind`). */
case class Asset(
    asset_id: Long,
    kind: String, // "image" | "audio" | "video" | "text"
    payload: Array[Byte],
    width: Int,
    height: Int,
    sample_rate: Int)

case class AssetFeatures(
    asset_id: Long,
    kind: String,
    n_bytes: Long,
    features: Array[Double])

/** Multimodal-column plumbing (SURVEY.md §2.3 north star). The decode /
  * feature-extraction step that would call an image/audio codec is
  * STUBBED with a deterministic byte-histogram "feature extractor"
  * (the codec libraries are not in this container); everything Spark-
  * side — binary schema, batch iteration shape, partition-parallel
  * execution via `mapPartitions`, typed Encoders — is real and tested.
  *
  * In PySpark the same seam is `mapInPandas` (iterator-of-batches);
  * `Dataset.mapPartitions` is the JVM-native equivalent with the same
  * batch-at-a-time contract, so a real decoder drops in per-partition
  * (amortizing codec init across a partition, exactly like a Pandas
  * UDF amortizes across a batch).
  */
object Multimodal {

  /** Synthesize an assets table from `documents`: payload = UTF-8 bytes
    * of the text, kind assigned round-robin. Deterministic. */
  def assetsFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video"), lit("text")),
        (col("doc_id") % 4 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      lit(16000).cast("int").as("sample_rate"))

  private val FEATURE_BINS = 16

  /** STUB decoder: a real implementation would decode the codec frame
    * here; the stand-in is a normalized histogram of payload bytes into
    * 16 bins — deterministic, cheap, and shape-identical to a real
    * feature vector. Runs per-partition so a real codec would be
    * initialized once per partition, not per row. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select("asset_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init of the (stub) decoder happens here
        rows.map { case (id, kind, payload) =>
          val hist = new Array[Double](FEATURE_BINS)
          var i = 0
          while (i < payload.length) {
            hist((payload(i) & 0xff) % FEATURE_BINS) += 1.0
            i += 1
          }
          val n = math.max(payload.length, 1).toDouble
          AssetFeatures(id, kind, payload.length.toLong, hist.map(_ / n))
        }
      }
  }

  /** "Frame sampling" stub: slice every `stride`-th byte window from the
    * payload — the plumbing (explode of per-asset frames with byte
    * offsets, ready for a per-frame decoder) is the real part. */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 32, stride: Int = 64): DataFrame =
    assets
      .select(
        col("asset_id"),
        posexplode(
          transform(
            sequence(lit(0), greatest(expr(s"length(payload) div $stride").cast("int") - 1, lit(0))),
            i => substring(col("payload"), (i * stride + 1).cast("int"), lit(frameBytes)))))
      .toDF("asset_id", "frame_no", "frame_bytes")
      .where(length(col("frame_bytes")) > 0)
}
