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

/** A fixture image asset: BMP-encoded payload plus its declared
  * dimensions (content-addressed binary + queryable metadata, the
  * schema a 100 TB image lake partition-prunes on). */
case class ImageAsset(asset_id: Long, width: Int, height: Int, payload: Array[Byte])

/** Features decoded from real image bytes: per-channel means over all
  * pixels plus two positional probe pixels (so a transposed or
  * channel-swapped decode cannot pass). */
case class ImageFeatures(
    asset_id: Long,
    width: Int,
    height: Int,
    n_pixels: Long,
    mean_r: Double,
    mean_g: Double,
    mean_b: Double,
    px00_r: Int,
    pxlast_b: Int)

/** A 64-bit perceptual image hash (block-mean aHash over decoded
  * pixels), carried as 4×16-bit chunk ints like the text SimHash
  * signatures — the chunks double as the pigeonhole blocking keys. */
case class ImagePHash(asset_id: Long, c0: Int, c1: Int, c2: Int, c3: Int)

/** A 64-bit perceptual audio fingerprint (frame-energy delta signs
  * over 64 fixed frames), carried as 4×16-bit chunk ints — the same
  * signature carriage as [[ImagePHash]] and the text SimHash, so the
  * shared pigeonhole blocking and the signature-agnostic
  * [[graft.operators.HammingIndex]] serve it unchanged. */
case class AudioPHash(asset_id: Long, c0: Int, c1: Int, c2: Int, c3: Int)

/** A fixture video asset: `n_frames` BMP-encoded frames concatenated
  * into one opaque payload (every frame the same `width`×`height`, so
  * frame boundaries are payload.length / n_frames — the fixed-size
  * frame-table form a real container's index provides). */
case class VideoAsset(
    asset_id: Long, n_frames: Int, width: Int, height: Int,
    payload: Array[Byte])

/** A 64-bit perceptual video fingerprint (temporal-majority of
  * per-frame aHash bits), carried as 4×16-bit chunk ints — the fourth
  * signature family through the shared carriage. */
case class VideoPHash(asset_id: Long, c0: Int, c1: Int, c2: Int, c3: Int)

/** A fixture audio asset: WAV-encoded (PCM16LE mono) payload plus its
  * declared sample geometry. */
case class AudioAsset(
    asset_id: Long, n_samples: Int, sample_rate: Int, payload: Array[Byte])

/** Features decoded from real WAV bytes: exact integer statistics
  * (mean amplitude divides once in double) plus first/last probe
  * samples, so a byte-order- or channel-confused decode cannot pass. */
case class AudioFeatures(
    asset_id: Long,
    n_samples: Long,
    sample_rate: Int,
    mean_amp: Double,
    energy: Long,
    first_s: Int,
    last_s: Int,
    peak_abs: Int)

/** Multimodal-column plumbing (SURVEY.md §2.3 north star).
  *
  * Two feature paths share the same per-partition decode seam:
  *  - [[extractFeatures]] — a codec-agnostic byte-histogram
  *    featurizer that works on ANY payload kind (image/audio/video/
  *    text) without decoding it; cheap, deterministic, and fully
  *    reproducible by the DuckDB oracle from the raw bytes;
  *  - [[decodeImageFeatures]] — a REAL image codec path: BMP payloads
  *    (written by [[imageAssets]] with a closed-form pixel formula)
  *    are decoded with JDK `javax.imageio.ImageIO` and reduced to
  *    per-channel statistics the oracle recomputes from the same
  *    closed-form formula — the bytes themselves never leave Spark.
  *
  * In PySpark the same seam is `mapInPandas` (iterator-of-batches);
  * `Dataset.mapPartitions` is the JVM-native equivalent with the same
  * batch-at-a-time contract: codec/reader initialization amortizes
  * across a partition, exactly like a Pandas UDF amortizes across a
  * batch, and adding a new codec (JPEG via ImageIO, audio via
  * javax.sound) changes only the closure body.
  */
object Multimodal {

  /** Direct BGR byte access for the decode hot loops: when a decoded
    * image is the canonical `TYPE_3BYTE_BGR` layout (what the JDK BMP
    * reader produces for 24-bit payloads — interleaved B,G,R bytes,
    * pixel stride 3, no scanline padding, zero offset), return its
    * backing byte array so per-pixel reads skip the
    * `getRGB`→ColorModel indirection (one virtual dispatch + sRGB
    * ColorModel unpack per pixel — the dominant per-pixel cost of the
    * decode kernels). Returns null for any other layout; callers MUST
    * fall back to the `getRGB` path, which reads the identical channel
    * values (TYPE_3BYTE_BGR getRGB is exactly
    * `0xff000000 | r<<16 | g<<8 | b` over these bytes — no color
    * conversion — so the two paths are bit-identical; MultimodalSpec
    * pins the parity). */
  private def bgrData(img: java.awt.image.BufferedImage): Array[Byte] = {
    if (img.getType != java.awt.image.BufferedImage.TYPE_3BYTE_BGR) return null
    val raster = img.getRaster
    if (raster.getSampleModelTranslateX != 0 ||
      raster.getSampleModelTranslateY != 0) return null
    raster.getSampleModel match {
      case sm: java.awt.image.PixelInterleavedSampleModel
          if sm.getPixelStride == 3 &&
            sm.getScanlineStride == img.getWidth * 3 &&
            java.util.Arrays.equals(sm.getBandOffsets, Array(2, 1, 0)) =>
        raster.getDataBuffer match {
          case db: java.awt.image.DataBufferByte
              if db.getOffset == 0 && db.getNumBanks == 1 =>
            db.getData
          case _ => null
        }
      case _ => null
    }
  }

  /** Encode one frame as BMP bytes: a `TYPE_3BYTE_BGR` image whose
    * raster bytes are filled DIRECTLY (the constructor guarantees the
    * canonical interleaved layout, so writing b,g,r at
    * `(y·w + x)·3` is exactly what `setRGB` would store — minus the
    * per-pixel ColorModel round trip), then the JDK ImageIO BMP
    * writer, so the payload bytes are identical to the historical
    * per-pixel `setRGB` encode. `rgb(x, y)` packs the channels as
    * `r<<16 | g<<8 | b`. */
  private def encodeBmp(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var off = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = rgb(x, y)
        data(off) = (p & 0xff).toByte            // B
        data(off + 1) = ((p >> 8) & 0xff).toByte // G
        data(off + 2) = ((p >> 16) & 0xff).toByte // R
        off += 3
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "bmp", out),
      "JDK ImageIO has no BMP writer")
    out.toByteArray
  }

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

  /** Codec-agnostic featurizer: a normalized histogram of payload
    * bytes into 16 bins — deterministic, cheap, works on every asset
    * kind without decoding, and exactly reproducible by the DuckDB
    * oracle (hex-decode + count). The codec-aware path for images is
    * [[decodeImageFeatures]]. Runs per-partition so any per-codec
    * state is initialized once per partition, not per row. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select("asset_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
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

  /** Deterministic BMP fixture images, one per document: dimensions
    * derive from the id (width = id%16+8, height = id%12+8) and every
    * pixel channel is a closed-form function of (asset_id, x, y):
    *
    *   r = (id·31 + x·7 + y·13) mod 256
    *   g = (id·17 + x·5 + y·11) mod 256
    *   b = (id·29 + x·3 + y·19) mod 256
    *
    * BMP is 24-bit uncompressed, so the encode→decode round trip is
    * bit-exact, and the DuckDB oracle can recompute any decoded
    * statistic from the formula without ever seeing the bytes. The
    * encoder (JDK ImageIO) runs inside `mapPartitions` — the same
    * per-partition codec seam a real ingest pipeline uses. */
  def imageAssets(spark: SparkSession, documents: DataFrame): Dataset[ImageAsset] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("asset_id"),
        (col("doc_id") % 16 + 8).cast("int").as("width"),
        (col("doc_id") % 12 + 8).cast("int").as("height"))
      .as[(Long, Int, Int)]
      .mapPartitions { rows =>
        // default ImageIO stream cache is a TEMP FILE per image —
        // per-row disk churn that compounds across a run; these
        // payloads are small, so cache in memory (JVM-global, set
        // once per partition = once per executor in practice)
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, w, h) =>
          // direct-raster fill + the same ImageIO BMP writer: payload
          // bytes identical to the per-pixel setRGB encode
          val payload = encodeBmp(w, h) { (x, y) =>
            val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
            val g = ((id * 17 + x * 5 + y * 11) % 256).toInt
            val b = ((id * 29 + x * 3 + y * 19) % 256).toInt
            (r << 16) | (g << 8) | b
          }
          ImageAsset(id, w, h, payload)
        }
      }
  }

  /** REAL image decode: `ImageIO.read` parses the BMP payload and the
    * features are per-channel pixel-mean statistics plus two probe
    * pixels — (0,0) red and (w−1,h−1) blue — so a decoder that
    * transposed axes or swapped channels cannot hash-match. Channel
    * sums accumulate in Long (exact; ≤ 255·w·h ≪ 2⁵³) and divide once
    * in double, so the value is IEEE-identical to the oracle's
    * CAST(sum AS DOUBLE)/n. Decoding runs per-partition: the ImageIO
    * reader registry is touched once per JVM and each task streams its
    * partition through the codec — the 100 TB shape, where decode
    * parallelism is exactly scan parallelism and nothing is collected
    * or shuffled to do it. */
  def decodeImageFeatures(
      spark: SparkSession, assets: Dataset[ImageAsset]): Dataset[ImageFeatures] = {
    import spark.implicits._
    assets.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory stream cache
      rows.map { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload))
        require(img != null, s"undecodable payload for asset ${a.asset_id}")
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        val data = bgrData(img)
        if (data != null) {
          // fast path: read the interleaved B,G,R bytes directly —
          // identical channel values to getRGB (see bgrData)
          var off = 0
          val end = w * h * 3
          while (off < end) {
            sb += data(off) & 0xff
            sg += data(off + 1) & 0xff
            sr += data(off + 2) & 0xff
            off += 3
          }
        } else {
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff
              sg += (p >> 8) & 0xff
              sb += p & 0xff
              x += 1
            }
            y += 1
          }
        }
        val n = w.toLong * h
        ImageFeatures(a.asset_id, w, h, n,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
          (img.getRGB(0, 0) >> 16) & 0xff,
          img.getRGB(w - 1, h - 1) & 0xff)
      }
    }
  }

  /** Exact comparison of the non-negative products a·b vs c·d in
    * 128-bit (high word via `Math.multiplyHigh`, low word unsigned) —
    * the cross-multiplied mean threshold of [[imageAHash]] stays
    * exact for ANY image size, with no silent-overflow cliff at large
    * pixel counts (luma sums reach ~255000·n, so a Long product
    * overflows past ~6 megapixels — real-photo territory). */
  private def cmpProd128(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }

  /** 64-bit perceptual hash (block-mean aHash) from REAL decoded
    * pixels: each pixel's integer luma (r·299 + g·587 + b·114 — the
    * scaled BT.601 weights, exact in Long) is block-mapped onto an
    * 8×8 grid (gx = ⌊x·8/w⌋, gy = ⌊y·8/h⌋ — dimension-robust: any
    * w,h ≥ 8 fills all 64 cells), and bit (gy·8 + gx) is set iff the
    * cell's mean luma exceeds the whole image's mean luma, compared
    * in EXACT integer cross-multiplied form
    * (cell_sum·n_pixels > total_sum·cell_n, evaluated in 128-bit via
    * [[cmpProd128]] so there is NO overflow cliff at large images —
    * no float ordering anywhere, so the DuckDB oracle recomputes
    * every bit from the closed-form pixel formula). Emitted as
    * 4×16-bit chunk ints (c0 = bits 0–15), the same signature
    * carriage as [[graft.operators.Dedup.simhashPairsMd5]] — no
    * uint64 traps, and the chunks are the Hamming-pigeonhole blocking
    * keys.
    *
    * Scale shape: one decode pass in the per-partition codec seam
    * (decode parallelism == scan parallelism), 4 ints out per asset —
    * the signature stage never shuffles. */
  /** The 64 block-mean aHash bits of one decoded image — the shared
    * kernel of [[imageAHash]] and the per-frame stage of
    * [[videoFingerprint]]. Returned as a Long bitset (bit i = cell i's
    * exact-integer mean-luma threshold). */
  private def aHashBits(img: java.awt.image.BufferedImage, id: Long): Long = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 8 && h >= 8,
      s"aHash needs w,h >= 8 to fill the 8x8 grid, got ${w}x$h (asset $id)")
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var totSum = 0L
    // per-row grid-column table: gx depends only on x, so hoist the
    // per-pixel integer division out of the inner loop
    val gxT = new Array[Int](w)
    locally {
      var x = 0
      while (x < w) { gxT(x) = x * 8 / w; x += 1 }
    }
    val data = bgrData(img)
    if (data != null) {
      // fast path: interleaved B,G,R bytes read directly — identical
      // channel values to getRGB (see bgrData), same exact Long luma
      var off = 0
      var y = 0
      while (y < h) {
        val row = y * 8 / h * 8
        var x = 0
        while (x < w) {
          val gray = (data(off + 2) & 0xff) * 299L +
            (data(off + 1) & 0xff) * 587L + (data(off) & 0xff) * 114L
          val i = row + gxT(x)
          cellSum(i) += gray
          cellN(i) += 1
          totSum += gray
          off += 3
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        val row = y * 8 / h * 8
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val gray = ((p >> 16) & 0xff) * 299L +
            ((p >> 8) & 0xff) * 587L + (p & 0xff) * 114L
          val i = row + gxT(x)
          cellSum(i) += gray
          cellN(i) += 1
          totSum += gray
          x += 1
        }
        y += 1
      }
    }
    val totN = w.toLong * h
    var bits = 0L
    var i = 0
    while (i < 64) {
      // exact-integer cell_mean > image_mean, compared in 128-bit
      // so oversized real-world images hash correctly (a Long
      // product of these sums overflows past ~6 megapixels)
      if (cmpProd128(cellSum(i), totN, totSum, cellN(i)) > 0)
        bits |= 1L << i
      i += 1
    }
    bits
  }

  private def bitsToChunks(bits: Long): Array[Int] = {
    val chunks = new Array[Int](4)
    var c = 0
    while (c < 4) {
      chunks(c) = ((bits >>> (c * 16)) & 0xffffL).toInt
      c += 1
    }
    chunks
  }

  def imageAHash(
      spark: SparkSession, assets: Dataset[ImageAsset]): Dataset[ImagePHash] = {
    import spark.implicits._
    assets.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory stream cache
      rows.map { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload))
        require(img != null, s"undecodable payload for asset ${a.asset_id}")
        val chunks = bitsToChunks(aHashBits(img, a.asset_id))
        ImagePHash(a.asset_id, chunks(0), chunks(1), chunks(2), chunks(3))
      }
    }
  }

  /** Multimodal near-dup dedup — the perceptual-hash analogue of the
    * text SimHash family: [[imageAHash]] signatures over the decoded
    * BMP fixtures, then the shared chunk-blocked Hamming pair law
    * ([[graft.operators.Dedup]]'s pigeonhole: a pair within
    * `maxHamming` ≤ 3 of a 64-bit hash must agree exactly on ≥ 1 of
    * the 4 chunks, so blocking is exhaustive, never probabilistic).
    * Returns (a_id, b_id, hamming ≤ maxHamming) — the pairs an image
    * ingest drops before a training corpus. */
  def imageNearDupPairs(
      spark: SparkSession, documents: DataFrame,
      maxHamming: Int = 3): DataFrame =
    graft.operators.Dedup.hammingChunkPairs(
      imageAHash(spark, imageAssets(spark, documents)).toDF()
        .withColumnRenamed("asset_id", "doc_id"),
      maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))

  /** Deterministic multi-frame video fixtures, one clip per document:
    * n_frames = id%6 + 4 frames of the SAME dimensions as the image
    * fixtures (w = id%16+8, h = id%12+8), each frame a real BMP whose
    * pixels extend the image formula with the frame index f:
    *
    *   r = (id·31 + f·41 + x·7 + y·13) mod 256
    *   g = (id·17 + f·23 + x·5 + y·11) mod 256
    *   b = (id·29 + f·47 + x·3 + y·19) mod 256
    *
    * The payload is the concatenation of the frame BMPs — equal-size
    * frames, so frame k occupies bytes [k·L, (k+1)·L) with
    * L = length / n_frames (the fixed-size frame-table form a real
    * container index provides). Encode runs in the same per-partition
    * codec seam as [[imageAssets]]; encode→decode is bit-exact (BMP),
    * so the DuckDB oracle recomputes any per-frame statistic from the
    * closed form. */
  def videoAssets(spark: SparkSession, documents: DataFrame): Dataset[VideoAsset] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("asset_id"),
        (col("doc_id") % 6 + 4).cast("int").as("n_frames"),
        (col("doc_id") % 16 + 8).cast("int").as("width"),
        (col("doc_id") % 12 + 8).cast("int").as("height"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, nf, w, h) =>
          val out = new java.io.ByteArrayOutputStream()
          var frameLen = -1
          var f = 0
          while (f < nf) {
            // direct-raster fill + the same ImageIO BMP writer: frame
            // bytes identical to the per-pixel setRGB encode
            val bytes = encodeBmp(w, h) { (x, y) =>
              val r = ((id * 31 + f * 41 + x * 7 + y * 13) % 256).toInt
              val g = ((id * 17 + f * 23 + x * 5 + y * 11) % 256).toInt
              val b = ((id * 29 + f * 47 + x * 3 + y * 19) % 256).toInt
              (r << 16) | (g << 8) | b
            }
            // equal-size frames are the slicing contract — BMP encode
            // is deterministic for fixed dimensions, but verify loudly
            if (frameLen < 0) frameLen = bytes.length
            require(bytes.length == frameLen,
              s"frame $f of asset $id encoded ${bytes.length} bytes, expected $frameLen")
            out.write(bytes)
            f += 1
          }
          VideoAsset(id, nf, w, h, out.toByteArray)
        }
      }
  }

  /** 64-bit perceptual video fingerprint from REAL per-frame decode:
    * the payload slices into its equal-size frames (the container's
    * frame table), each frame decodes through the SAME JDK ImageIO
    * path as [[imageAHash]] and contributes its 64 exact-integer
    * aHash bits, and video bit b is the strict TEMPORAL MAJORITY
    * (set iff more than half the frames set it — ties → 0). Majority
    * voting is frame-ORDER-blind and tolerant of a minority of
    * corrupted/re-encoded frames — the perceptual contract a video
    * re-crawl needs — and every bit is exact integer arithmetic, so
    * the DuckDB oracle recomputes the whole fingerprint from the
    * closed-form frame-pixel formula. Emitted as the shared 4×16-bit
    * chunk carriage: the FOURTH signature family (text SimHash, image
    * aHash, audio energy-delta, video temporal-majority) through
    * [[graft.operators.Dedup.hammingChunkPairs]] and the
    * signature-agnostic [[graft.operators.HammingIndex]].
    *
    * Scale shape: one decode pass per frame in the per-partition
    * codec seam (decode parallelism == scan parallelism), 4 ints out
    * per clip — no shuffle in the signature stage. */
  def videoFingerprint(
      spark: SparkSession, assets: Dataset[VideoAsset]): Dataset[VideoPHash] = {
    import spark.implicits._
    assets.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { a =>
        require(a.n_frames > 0 && a.payload.length % a.n_frames == 0,
          s"payload of asset ${a.asset_id} does not slice into " +
            s"${a.n_frames} equal frames")
        val frameLen = a.payload.length / a.n_frames
        val votes = new Array[Int](64)
        var f = 0
        while (f < a.n_frames) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              a.payload, f * frameLen, frameLen))
          require(img != null,
            s"undecodable frame $f of asset ${a.asset_id}")
          val bits = aHashBits(img, a.asset_id)
          var i = 0
          while (i < 64) {
            if (((bits >>> i) & 1L) == 1L) votes(i) += 1
            i += 1
          }
          f += 1
        }
        var bits = 0L
        var i = 0
        while (i < 64) {
          if (votes(i) * 2 > a.n_frames) bits |= 1L << i
          i += 1
        }
        val chunks = bitsToChunks(bits)
        VideoPHash(a.asset_id, chunks(0), chunks(1), chunks(2), chunks(3))
      }
    }
  }

  /** Deterministic WAV fixture audio, one clip per document:
    * n_samples = id%400 + 100 at 8 kHz, and every PCM16 sample is the
    * closed form
    *
    *   s(i) = ((id·37 + i·101) mod 65536) − 32768
    *
    * WAV PCM is uncompressed, so encode→decode is bit-exact and the
    * oracle recomputes every decoded statistic from the formula. The
    * encoder is the JDK's `javax.sound.sampled` WAVE writer (no audio
    * hardware involved — pure container framing), running inside the
    * same per-partition codec seam as [[imageAssets]]. */
  def audioAssets(spark: SparkSession, documents: DataFrame): Dataset[AudioAsset] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("asset_id"),
        (col("doc_id") % 400 + 100).cast("int").as("n_samples"))
      .as[(Long, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, n) =>
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = (((id * 37 + i * 101) % 65536) - 32768).toInt
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          AudioAsset(id, n, 8000, out.toByteArray)
        }
      }
  }

  /** REAL audio decode: `AudioSystem.getAudioInputStream` parses the
    * WAV container (format block honored, not assumed — the asserts
    * would catch a stereo or 8-bit misread), samples reconstruct from
    * little-endian PCM16, and the features are exact integer sums
    * (|s| ≤ 2¹⁵, n ≤ 500 ⇒ energy < 2⁴⁰ ≪ 2⁶³) with one double
    * division for the mean — IEEE-identical to the oracle's
    * CAST(sum AS DOUBLE)/n. Per-partition decode, same 100 TB shape
    * as [[decodeImageFeatures]]. */
  def decodeAudioFeatures(
      spark: SparkSession, assets: Dataset[AudioAsset]): Dataset[AudioFeatures] = {
    import spark.implicits._
    assets.mapPartitions { rows =>
      rows.map { a =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"unexpected decoded format $fmt for ${a.asset_id}")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        require(n > 0, s"empty decode for asset ${a.asset_id}")
        var i = 0
        var sum = 0L; var energy = 0L; var peak = 0
        var firstS = 0; var lastS = 0
        while (i < n) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
          if (i == 0) firstS = s
          if (i == n - 1) lastS = s
          sum += s
          energy += s.toLong * s
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 1
        }
        AudioFeatures(a.asset_id, n.toLong, fmt.getSampleRate.toInt,
          sum.toDouble / n, energy, firstS, lastS, peak)
      }
    }
  }

  /** 64-bit perceptual audio fingerprint from REAL decoded WAV bytes —
    * the THIRD signature family through the shared chunked-Hamming
    * carriage (after text SimHash and image aHash): samples decode via
    * the same `javax.sound.sampled` path as [[decodeAudioFeatures]],
    * each sample's exact integer energy s² accumulates into one of 64
    * fixed frames (frame = ⌊i·64/n⌋ — dimension-robust like
    * [[imageAHash]]'s grid: any n ≥ 64 fills all frames), and bit f is
    * set iff the NEXT frame's energy strictly exceeds frame f's
    * (E₍f₊₁ mod 64₎ > E_f — the energy-delta-sign form, with the wrap
    * delta as bit 63 so all 64 bits carry signal). Delta signs are
    * invariant to exact volume scaling and to polarity inversion
    * (energy is sign-blind), which is what makes the fingerprint a
    * PERCEPTUAL near-dup key rather than a byte hash. Exact integer
    * comparisons throughout (E_f ≤ n·2³⁰ ≪ 2⁶³ for any clip under
    * ~8·10⁹ samples), so the DuckDB oracle recomputes every bit from
    * the closed-form WAV sample formula. Emitted as 4×16-bit chunks —
    * the pigeonhole blocking keys of
    * [[graft.operators.Dedup.hammingChunkPairs]] and the carriage of
    * the signature-agnostic [[graft.operators.HammingIndex]].
    *
    * Scale shape: one decode pass in the per-partition codec seam
    * (decode parallelism == scan parallelism), 4 ints out per clip —
    * the signature stage never shuffles. */
  def audioFingerprint(
      spark: SparkSession, assets: Dataset[AudioAsset]): Dataset[AudioPHash] = {
    import spark.implicits._
    assets.mapPartitions { rows =>
      rows.map { a =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"unexpected decoded format $fmt for ${a.asset_id}")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        require(n >= 64,
          s"audioFingerprint needs n >= 64 samples to fill the 64 " +
            s"frames, got $n for asset ${a.asset_id}")
        val e = new Array[Long](64)
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
          e((i.toLong * 64 / n).toInt) += s.toLong * s
          i += 1
        }
        val chunks = new Array[Int](4)
        var f = 0
        while (f < 64) {
          if (e((f + 1) % 64) > e(f)) chunks(f / 16) |= 1 << (f % 16)
          f += 1
        }
        AudioPHash(a.asset_id, chunks(0), chunks(1), chunks(2), chunks(3))
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
