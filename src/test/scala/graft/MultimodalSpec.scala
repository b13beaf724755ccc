package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val assets = Multimodal.assetsFromDocuments(
    spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet"))

  test("assets table has the multimodal schema: opaque binary + typed metadata") {
    val sch = assets.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("kind").dataType.typeName == "string")
    assert(assets.select("kind").distinct().count() == 4)
  }

  test("feature extraction: normalized 16-bin histogram, deterministic") {
    val f = Multimodal.extractFeatures(spark, assets)
    val rows = f.limit(20).collect()
    rows.foreach { r =>
      assert(r.features.length == 16)
      assert(math.abs(r.features.sum - 1.0) < 1e-9)
      assert(r.n_bytes > 0)
    }
    val again = Multimodal.extractFeatures(spark, assets).limit(20).collect()
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("imageAssets emits real BMP bytes; ImageIO decode reproduces the pixel formula") {
    val imgs = Multimodal.imageAssets(spark,
      spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet"))
      .filter($"asset_id".isin(1L, 7L, 42L)).collect()
    assert(imgs.nonEmpty)
    imgs.foreach { a =>
      // BMP magic bytes prove a real encoder ran, not a fake payload
      assert(a.payload(0) == 'B'.toByte && a.payload(1) == 'M'.toByte)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
      assert(img.getWidth == a.width && img.getHeight == a.height)
      // every pixel of every channel round-trips the closed form
      for (y <- 0 until a.height; x <- 0 until a.width) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xff) == ((a.asset_id * 31 + x * 7 + y * 13) % 256).toInt, s"r($x,$y)")
        assert(((p >> 8) & 0xff) == ((a.asset_id * 17 + x * 5 + y * 11) % 256).toInt, s"g($x,$y)")
        assert((p & 0xff) == ((a.asset_id * 29 + x * 3 + y * 19) % 256).toInt, s"b($x,$y)")
      }
    }
  }

  test("decodeImageFeatures: decoded statistics match a by-hand pixel walk") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .filter($"doc_id" === 5L)
    val feats = Multimodal.decodeImageFeatures(
      spark, Multimodal.imageAssets(spark, docs)).collect()
    assert(feats.length == 1)
    val f = feats.head
    val (w, h) = ((5 % 16 + 8), (5 % 12 + 8))
    assert(f.width == w && f.height == h && f.n_pixels == w.toLong * h)
    val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
    def mean(mul: Long, xm: Long, ym: Long) =
      px.map { case (x, y) => (5L * mul + x * xm + y * ym) % 256 }.sum.toDouble / (w * h)
    assert(f.mean_r == mean(31, 7, 13))
    assert(f.mean_g == mean(17, 5, 11))
    assert(f.mean_b == mean(29, 3, 19))
    assert(f.px00_r == (5 * 31 % 256))
    assert(f.pxlast_b == ((5 * 29 + (w - 1) * 3 + (h - 1) * 19) % 256))
  }

  test("audioAssets emits real WAV bytes; javax.sound decode reproduces the samples") {
    val clips = Multimodal.audioAssets(spark,
      spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet"))
      .filter($"asset_id".isin(1L, 7L, 42L)).collect()
    assert(clips.nonEmpty)
    clips.foreach { a =>
      // RIFF/WAVE magic proves a real container writer ran
      assert(new String(a.payload.take(4), "US-ASCII") == "RIFF")
      assert(new String(a.payload.slice(8, 12), "US-ASCII") == "WAVE")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.payload))
      assert(ais.getFormat.getSampleRate == 8000f &&
        ais.getFormat.getChannels == 1)
      val bytes = ais.readAllBytes()
      assert(bytes.length == a.n_samples * 2)
      // every PCM16 sample round-trips the closed form
      for (i <- 0 until a.n_samples) {
        val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
        assert(s == ((a.asset_id * 37 + i * 101) % 65536 - 32768).toInt, s"s($i)")
      }
    }
  }

  test("decodeAudioFeatures: decoded statistics match a by-hand sample walk") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .filter($"doc_id" === 5L)
    val feats = Multimodal.decodeAudioFeatures(
      spark, Multimodal.audioAssets(spark, docs)).collect()
    assert(feats.length == 1)
    val f = feats.head
    val n = 5 % 400 + 100
    val ss = (0 until n).map(i => ((5L * 37 + i * 101) % 65536 - 32768).toInt)
    assert(f.n_samples == n.toLong && f.sample_rate == 8000)
    assert(f.mean_amp == ss.map(_.toLong).sum.toDouble / n)
    assert(f.energy == ss.map(s => s.toLong * s).sum)
    assert(f.first_s == ss.head && f.last_s == ss.last)
    assert(f.peak_abs == ss.map(math.abs).max)
  }

  test("frame sampling covers the payload with the configured stride") {
    val frames = Multimodal.sampleFrames(assets, frameBytes = 32, stride = 64)
    val one = frames.filter($"asset_id" === 1L).count()
    val expected = assets.filter($"asset_id" === 1L)
      .select(greatest(expr("length(payload) div 64"), lit(1)).cast("long"))
      .head().getLong(0)
    assert(one == expected)
  }
}
