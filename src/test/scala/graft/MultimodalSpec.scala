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

  private def bmpOf(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "bmp", out))
    out.toByteArray
  }

  test("direct-raster fast paths are bit-identical to the setRGB/getRGB reference") {
    import graft.multimodal.ImageAsset
    // encode parity: imageAssets fills the TYPE_3BYTE_BGR raster bytes
    // directly; bmpOf is this spec's independent per-pixel setRGB
    // encoder over the same formula — payloads must be BYTE-identical
    // across the fixture dimension grid (w ∈ [8,23], h ∈ [8,19])
    val ids = (0L until 192L) // covers every (w, h) = (id%16+8, id%12+8) cell
    val docs = spark.range(192).select(
      col("id").as("doc_id"), lit("x").as("text"))
    val fast = Multimodal.imageAssets(spark, docs).collect()
      .map(a => a.asset_id -> a).toMap
    ids.foreach { id =>
      val w = (id % 16 + 8).toInt; val h = (id % 12 + 8).toInt
      val ref = bmpOf(w, h) { (x, y) =>
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 5 + y * 11) % 256).toInt
        val b = ((id * 29 + x * 3 + y * 19) % 256).toInt
        (r << 16) | (g << 8) | b
      }
      assert(java.util.Arrays.equals(fast(id).payload, ref),
        s"asset $id (${w}x$h): direct-raster encode diverged from setRGB")
    }
    // decode parity: imageAHash reads the decoded raster bytes
    // directly; recompute each signature with a per-pixel getRGB walk
    // over the SAME decoded image and the same exact-integer law
    val sigs = Multimodal.imageAHash(
      spark, Multimodal.imageAssets(spark, docs)).collect()
      .map(p => p.asset_id -> Seq(p.c0, p.c1, p.c2, p.c3)).toMap
    ids.foreach { id =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fast(id).payload))
      val w = img.getWidth; val h = img.getHeight
      val cellSum = new Array[Long](64); val cellN = new Array[Long](64)
      var tot = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val gray = ((p >> 16) & 0xff) * 299L +
          ((p >> 8) & 0xff) * 587L + (p & 0xff) * 114L
        val i = y * 8 / h * 8 + x * 8 / w
        cellSum(i) += gray; cellN(i) += 1; tot += gray
      }
      val n = w.toLong * h
      val bits = (0 until 64).map { i =>
        // same exact cross-multiplied integer compare (sums here are
        // far below the 128-bit regime, so Long products suffice)
        if (cellSum(i) * n > tot * cellN(i)) 1L << i else 0L
      }.reduce(_ | _)
      val refChunks = (0 until 4).map(c => ((bits >>> (c * 16)) & 0xffffL).toInt)
      assert(sigs(id) == refChunks,
        s"asset $id: direct-raster aHash diverged from the getRGB walk")
    }
  }

  test("perceptual-hash near-dup: planted duplicate found at hamming 0, resize-invariant, unrelated image excluded") {
    import graft.multimodal.ImageAsset
    // a structured 16x16 half-dark/half-light image; a byte-identical
    // copy under a different id; the SAME pattern at 24x12 (block-mean
    // aHash is resize-invariant for block-constant patterns); a
    // brightness-shifted copy (+10 on all channels — shifts cell and
    // image means equally, so every bit is unchanged); and an inverted
    // pattern (every bit flips -> hamming 64, no pair)
    def pat(lum: (Int, Int) => Boolean)(w: Int, h: Int, lift: Int = 0) =
      bmpOf(w, h)((x, y) => {
        val v = (if (lum(x * 8 / w, y * 8 / h)) 200 else 40) + lift
        (v << 16) | (v << 8) | v
      })
    val half = (gx: Int, _: Int) => gx < 4
    val inv = (gx: Int, _: Int) => gx >= 4
    val planted = Seq(
      ImageAsset(0L, 16, 16, pat(half)(16, 16)),
      ImageAsset(1L, 16, 16, pat(half)(16, 16)), // byte-identical dup
      ImageAsset(2L, 24, 12, pat(half)(24, 12)), // same pattern, resized
      ImageAsset(3L, 16, 16, pat(half)(16, 16, lift = 10)), // brightness shift
      ImageAsset(4L, 16, 16, pat(inv)(16, 16))) // inverted: hamming 64
    val sigs = Multimodal.imageAHash(spark, planted.toDS()).collect()
      .map(p => p.asset_id -> (p.c0, p.c1, p.c2, p.c3)).toMap
    assert(sigs(0L) == sigs(1L) && sigs(0L) == sigs(2L) && sigs(0L) == sigs(3L),
      "dup/resize/brightness-shift must hash identically")
    assert(sigs(0L) != sigs(4L), "inverted pattern must not collide")
    val pairs = graft.operators.Dedup.hammingChunkPairs(
      planted.toDS().toDF().transform(df =>
        Multimodal.imageAHash(spark, df.as[ImageAsset]).toDF()
          .withColumnRenamed("asset_id", "doc_id")), maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((0L, 1L, 0), (0L, 2L, 0), (0L, 3L, 0),
      (1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)),
      s"planted near-dup pair set wrong: $pairs")
  }

  /** PCM16LE mono WAV bytes for explicit sample values — the spec's
    * own fixture encoder (same JDK writer as [[Multimodal.audioAssets]]). */
  private def wavOf(samples: Seq[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioFingerprint: bits match a by-hand frame-energy walk over the closed-form samples") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .filter($"doc_id".isin(3L, 8L, 21L))
    val got = Multimodal.audioFingerprint(
      spark, Multimodal.audioAssets(spark, docs)).collect()
      .map(p => p.asset_id -> (p.c0, p.c1, p.c2, p.c3)).toMap
    assert(got.size == 3)
    got.keys.foreach { id =>
      val n = (id % 400 + 100).toInt
      val ss = (0 until n).map(i => ((id * 37 + i * 101) % 65536 - 32768).toInt)
      val e = new Array[Long](64)
      ss.zipWithIndex.foreach { case (s, i) => e(i * 64 / n) += s.toLong * s }
      val cs = new Array[Int](4)
      for (f <- 0 until 64 if e((f + 1) % 64) > e(f)) cs(f / 16) |= 1 << (f % 16)
      assert(got(id) == ((cs(0), cs(1), cs(2), cs(3))), s"asset $id")
    }
  }

  test("audioFingerprint is perceptual: volume-scale and polarity-inversion invariant, identical copies at hamming 0, reshuffled energy excluded") {
    import graft.multimodal.AudioAsset
    // a 128-sample clip with a distinctive frame-energy profile
    // (amplitudes small enough that an exact 2x volume lift stays in
    // PCM16 range), plus: an identical copy, a doubled-volume copy
    // (energies scale exactly 4x -> every delta sign unchanged), a
    // polarity-inverted copy (energy is sign-blind), and a REVERSED
    // clip (the energy profile flips, so delta signs scramble)
    val base = (0 until 128).map(i => (math.sin(i * 0.7) * 8000 * ((i % 32) + 1) / 32).toInt)
    val planted = Seq(
      AudioAsset(0L, 128, 8000, wavOf(base)),
      AudioAsset(1L, 128, 8000, wavOf(base)),
      AudioAsset(2L, 128, 8000, wavOf(base.map(_ * 2))),
      AudioAsset(3L, 128, 8000, wavOf(base.map(-_))),
      AudioAsset(4L, 128, 8000, wavOf(base.reverse)))
    val sigs = Multimodal.audioFingerprint(spark, planted.toDS()).collect()
      .map(p => p.asset_id -> (p.c0, p.c1, p.c2, p.c3)).toMap
    assert(sigs(0L) == sigs(1L), "identical clip must hash identically")
    assert(sigs(0L) == sigs(2L), "exact volume doubling must not change delta signs")
    assert(sigs(0L) == sigs(3L), "polarity inversion must not change energies")
    assert(sigs(0L) != sigs(4L), "reversed clip must not collide")
    // and the pair law sees exactly the perceptual-copy cluster
    val pairs = graft.operators.Dedup.hammingChunkPairs(
      Multimodal.audioFingerprint(spark, planted.toDS()).toDF()
        .withColumnRenamed("asset_id", "doc_id"), maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.filter(_._3 == 0).map(p => (p._1, p._2)) ==
      Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)),
      s"planted perceptual-copy pairs wrong: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "reversed clip paired with an original")
  }

  test("audio signatures serve through the shared HammingIndex: serve == batch over base∪delta") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val sigs = Multimodal.audioFingerprint(
      spark, Multimodal.audioAssets(spark, docs)).toDF()
      .withColumnRenamed("asset_id", "doc_id").localCheckpoint(true)
    val p = java.nio.file.Files.createTempDirectory("graft_aud_ham").toString
    graft.operators.HammingIndex.write(sigs.where($"doc_id" % 2 === 0), p)
    graft.operators.HammingIndex.appendEpoch(spark, p, 0L,
      sigs.where($"doc_id" % 2 === 1))
    val served = graft.operators.HammingIndex.servePairs(spark, p, maxHamming = 3)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    val batch = graft.operators.Dedup.hammingChunkPairs(sigs, maxHamming = 3)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(served == batch,
      "audio fingerprints diverge between the durable index and the batch law")
  }

  test("videoAssets emits equal-size real BMP frames; per-frame decode reproduces the frame-pixel formula") {
    val clips = Multimodal.videoAssets(spark,
      spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet"))
      .filter($"asset_id".isin(2L, 9L)).collect()
    assert(clips.nonEmpty)
    clips.foreach { a =>
      val nf = (a.asset_id % 6 + 4).toInt
      assert(a.n_frames == nf && a.payload.length % nf == 0)
      val frameLen = a.payload.length / nf
      for (f <- 0 until nf) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload, f * frameLen, frameLen))
        assert(img.getWidth == a.width && img.getHeight == a.height, s"frame $f")
        // spot-check pixels of every frame against the closed form
        for ((x, y) <- Seq((0, 0), (a.width - 1, a.height - 1), (3, 2))) {
          val p = img.getRGB(x, y)
          assert(((p >> 16) & 0xff) ==
            ((a.asset_id * 31 + f * 41 + x * 7 + y * 13) % 256).toInt, s"r f=$f ($x,$y)")
          assert((p & 0xff) ==
            ((a.asset_id * 29 + f * 47 + x * 3 + y * 19) % 256).toInt, s"b f=$f ($x,$y)")
        }
      }
    }
  }

  test("videoFingerprint: temporal-majority bits match a by-hand per-frame walk; frame order is immaterial; identical copies pair at hamming 0") {
    import graft.multimodal.VideoAsset
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .filter($"doc_id".isin(2L, 9L, 13L))
    val got = Multimodal.videoFingerprint(
      spark, Multimodal.videoAssets(spark, docs)).collect()
      .map(p => p.asset_id -> (p.c0, p.c1, p.c2, p.c3)).toMap
    assert(got.size == 3)
    got.keys.foreach { id =>
      val nf = (id % 6 + 4).toInt
      val (w, h) = ((id % 16 + 8).toInt, (id % 12 + 8).toInt)
      val votes = new Array[Int](64)
      for (f <- 0 until nf) {
        val cs = new Array[Long](64); val cn = new Array[Long](64)
        var ts = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val gray = ((id * 31 + f * 41 + x * 7 + y * 13) % 256) * 299L +
            ((id * 17 + f * 23 + x * 5 + y * 11) % 256) * 587L +
            ((id * 29 + f * 47 + x * 3 + y * 19) % 256) * 114L
          val i = (y * 8 / h) * 8 + (x * 8 / w)
          cs(i) += gray; cn(i) += 1; ts += gray
        }
        val tn = w.toLong * h
        for (i <- 0 until 64 if cs(i) * tn > ts * cn(i)) votes(i) += 1
      }
      val want = new Array[Int](4)
      for (i <- 0 until 64 if votes(i) * 2 > nf)
        want(i / 16) |= 1 << (i % 16)
      assert(got(id) == ((want(0), want(1), want(2), want(3))), s"asset $id")
    }
    // frame-order invariance + identical-copy pairing: rebuild one
    // clip with its frames REVERSED (same multiset of frames) plus a
    // byte-identical copy; majority voting must not see the order
    val orig = Multimodal.videoAssets(spark, docs)
      .filter($"asset_id" === 9L).collect().head
    val frameLen = orig.payload.length / orig.n_frames
    val reversed = (orig.n_frames - 1 to 0 by -1).flatMap(f =>
      orig.payload.slice(f * frameLen, (f + 1) * frameLen)).toArray
    val planted = Seq(
      orig.copy(asset_id = 0L),
      VideoAsset(1L, orig.n_frames, orig.width, orig.height, reversed),
      orig.copy(asset_id = 2L))
    val sigs = Multimodal.videoFingerprint(spark, planted.toDS()).collect()
      .map(p => p.asset_id -> (p.c0, p.c1, p.c2, p.c3)).toMap
    assert(sigs(0L) == sigs(1L), "frame order changed the fingerprint")
    assert(sigs(0L) == sigs(2L), "identical copy must hash identically")
    val pairs = graft.operators.Dedup.hammingChunkPairs(
      Multimodal.videoFingerprint(spark, planted.toDS()).toDF()
        .withColumnRenamed("asset_id", "doc_id"), maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((0L, 1L, 0), (0L, 2L, 0), (1L, 2L, 0)), pairs.toString)
  }

  test("mm_neardup over the corpus: pair law (hamming <= 3, a < b) and signature determinism hold") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val pairs = Multimodal.imageNearDupPairs(spark, docs, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty, "fixture corpus should contain natural aHash near-dups")
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0 && p._3 <= 3))
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length,
      "duplicate pairs emitted")
    val again = Multimodal.imageNearDupPairs(spark, docs, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.sortBy(p => (p._1, p._2)).toSeq == again.sortBy(p => (p._1, p._2)).toSeq)
  }
}
