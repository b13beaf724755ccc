package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Admission-loop DEPTH probe: does per-epoch cost stay flat as the
  * loop ages? A production admission loop runs thousands of epochs;
  * its per-epoch cost must be governed by the SHARD (plus the o(index)
  * probes), not by how many epochs came before. Two effects could
  * break that and this tool measures both:
  *
  *  - READ AMPLIFICATION: with `compactEvery = 0` every committed
  *    epoch adds one more delta segment to every index, so the probe's
  *    base∪deltas snapshot is a union of E relations at epoch E —
  *    per-epoch cost grows with depth (expected, and measured here as
  *    the contrast case);
  *  - the IN-LOOP COMPACTION's whole claim: with `compactEvery = K`
  *    the segment count is bounded by K, so per-epoch cost at epoch 20
  *    must match per-epoch cost at epoch 5 (amortizing the periodic
  *    fold itself, which is admitted-corpus-sized but 1/K-frequent).
  *
  * Method: the sf-dir documents table is sliced into `epochs` disjoint
  * equal shards (doc_id % epochs — fixed shard size, so depth is the
  * ONLY variable), admitted epoch by epoch through the full
  * [[graft.operators.Admission.admitEpoch]] protocol with the same
  * in-loop maintenance policy [[graft.streaming.StreamingOps.admissionIngestStream]]
  * applies (threshold-triggered compact with retainGens = 1). Per-epoch
  * wall times print as [probe-json] lines with early/late medians +
  * their ratio; results land in SCALE10X.md. Not part of the driver
  * contract.
  *
  * SPARK_GRAFT_DEPTH_MODE selects the loop shape:
  *  - `text` (default) — the 3-store loop (round-13 table);
  *  - `semantic` — the 4-store loop: shards carry embeddings
  *    (documents ⋈ embeddings on id), the fourth store is the raw
  *    [[graft.operators.IvfIndex]] — the store that grows FASTEST at
  *    100 TB (one float32 vector per admitted doc), so its depth
  *    behavior is the one the round-13 table didn't cover;
  *  - `semantic_pq` — the same loop with the COMPRESSED fourth store
  *    ([[graft.operators.IvfPqIndex]], codes on disk, exact verify
  *    from the decision log);
  *  - `multimodal` — the 4-store loop with the PERCEPTUAL store
  *    ([[graft.operators.HammingIndex]]): shards carry image aHash
  *    signatures and the new stage's per-epoch probe/append cost is
  *    what the depth series measures. */
object AdmissionDepthScale {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val epochs = sys.env.getOrElse("SPARK_GRAFT_DEPTH_EPOCHS", "24").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_DEPTH_COMPACT", "6").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_DEPTH_MODE", "text")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docsAll = graft.Tables.documents(spark, base).select("doc_id", "text")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // semantic modes: shards carry the doc embedding (inner join —
    // only ids with a fixture vector participate, still epochs×~80
    // docs at sf0.1); fixed seed centroids like the admission spec
    val docs = mode match {
      case "text" => docsAll
      case "multimodal" =>
        // shards carry each doc's image aHash signature (computed
        // once up front — the loop times the ADMISSION path, the
        // per-shard signature pass is the ingest pipeline's decode
        // stage and is probed separately by the mm 10x case)
        docsAll.join(
          graft.multimodal.Multimodal.imageAHash(
            spark, graft.multimodal.Multimodal.imageAssets(
              spark, graft.Tables.documents(spark, base)))
            .toDF().withColumnRenamed("asset_id", "doc_id"),
          "doc_id")
          .select(col("doc_id"), col("text"),
            col("c0"), col("c1"), col("c2"), col("c3"))
      case _ =>
        docsAll.join(emb, docsAll("doc_id") === emb("vec_id"))
          .select(docsAll("doc_id"), col("text"), col("embedding"))
    }
    val seeds = emb.where(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    def initLoop(path: String): Unit = mode match {
      case "text" => graft.operators.Admission.init(spark, path)
      case "multimodal" => graft.operators.Admission.init(spark, path,
        perceptual = true)
      case "semantic" => graft.operators.Admission.init(spark, path,
        semanticCentroids = Some(seeds))
      case "semantic_pq" => graft.operators.Admission.init(spark, path,
        semanticCentroids = Some(seeds),
        semanticCodebook = Some(
          graft.operators.Similarity.ivfPqSeedCodebook(emb, seeds)))
      case other => sys.error(s"unknown SPARK_GRAFT_DEPTH_MODE: $other")
    }
    // fixed-size disjoint shards: depth is the only variable. Shards
    // are materialized up front so source-read cost is out of the
    // timed region's variance (each is tiny).
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft_adm_depth_shards_").toString
    (0 until epochs).foreach { e =>
      docs.where(col("doc_id") % epochs === e)
        .write.mode("overwrite").parquet(s"$shardDir/$e")
    }
    docs.count() // warmup source

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def load(): Double = osBean.getSystemLoadAverage
    println(f"[probe] start load=${load()}%.2f base=$base mode=$mode epochs=$epochs compactEvery=$compactEvery")

    def runLoop(label: String, ce: Int): List[Double] = {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_adm_depth_${label}_").toString
      initLoop(path)
      (0 until epochs).toList.map { e =>
        val shard = spark.read.parquet(s"$shardDir/$e")
        val t0 = System.nanoTime()
        graft.operators.Admission
          .admitEpoch(spark, path, e.toLong, shard).count()
        if (ce > 0) {
          // the stream's in-loop policy, run inline: fold when ce
          // committed epochs are unfolded in the admitted store
          val (_, upto) = graft.operators.LsmSegments
            .current(spark, s"$path/admitted")
          val unfolded = graft.operators.Admission
            .committedEpochs(spark, path).count(_ > upto)
          if (unfolded >= ce)
            graft.operators.Admission.compact(spark, path, retainGens = 1)
        }
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $label epoch $e%2d  $t%6.2f s  (load ${load()}%.2f)")
        t
      }
    }

    // contrast first (accreting deltas), then the claim under test
    val accrete = runLoop(s"${mode}_accrete", 0)
    val compacted = runLoop(s"${mode}_compacted", compactEvery)

    def med(xs: List[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    def report(label: String, ts: List[Double]): Unit = {
      val early = med(ts.slice(1, 1 + epochs / 3))    // skip epoch-0 warmup
      val late = med(ts.takeRight(epochs / 3))
      println(f"""[probe-json] {"case":"admission_depth_$label","epochs":$epochs,""" +
        f""""per_epoch":[${ts.map(t => f"$t%.2f").mkString(",")}],""" +
        f""""early_median":$early%.2f,"late_median":$late%.2f,""" +
        f""""late_over_early":${late / early}%.2f}""")
    }
    report(s"${mode}_accrete", accrete)
    report(s"${mode}_compact$compactEvery", compacted)
    println(f"[probe] end load=${load()}%.2f")
    spark.stop()
  }
}
