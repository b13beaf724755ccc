package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial hot-bucket probe for the chunked-Hamming pair family
  * ([[graft.operators.Dedup.hammingChunkPairs]] /
  * [[graft.operators.HammingIndex.probePairs]]): real web-crawl image
  * corpora are exactly where aHash is skewed — solid-color /
  * near-white assets collapse to a handful of chunk values — so this
  * probe plants N signature-identical assets (the worst case: ONE
  * (chunk, chunk_val) bucket of size N in all four chunks) on top of
  * the real sf0.1 aHash corpus and times the pair law:
  *
  *  - UNCAPPED (the exhaustive oracle contract): the hot bucket is a
  *    single-task O(N²) in-row expansion — the blow-up the round-14
  *    verdict flagged. Measured only at small N (the N² growth is the
  *    finding; at crawl-scale N it is an OOM, which is the point).
  *  - CAPPED (`maxBucket` — the production circuit breaker): the hot
  *    bucket saturates and contributes NO pairs, so cost must stay
  *    FLAT in N while the unsaturated corpus pairs are untouched.
  *
  * Emits [probe-json] lines; results land in SCALE10X.md. Not part of
  * the driver contract. */
object HotBucketProbe {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cap = sys.env.getOrElse("SPARK_GRAFT_HOT_CAP", "4096").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def load(): Double = osBean.getSystemLoadAverage

    // the real corpus signatures, computed once (decode cost excluded
    // from the pair-law timings below)
    val corpus = graft.multimodal.Multimodal.imageAHash(
        spark, graft.multimodal.Multimodal.imageAssets(
          spark, graft.Tables.documents(spark, base)))
      .toDF().withColumnRenamed("asset_id", "doc_id")
      .localCheckpoint(eager = true)
    val corpusN = corpus.count()

    // N identical plants: one signature far from the corpus (so every
    // plant pair is plant×plant — the pure hot-bucket cost), ids past
    // the corpus range
    def plants(n: Int) = spark.range(n)
      .select((col("id") + 10000000L).as("doc_id"),
        lit(0x5A5A).cast("int").as("c0"), lit(0x2B2B).cast("int").as("c1"),
        lit(0x4D4D).cast("int").as("c2"), lit(0x1E1E).cast("int").as("c3"))

    def timePairs(n: Int, maxBucket: Int): (Double, Long) = {
      val sigs = corpus.unionByName(plants(n)).localCheckpoint(eager = true)
      try {
        val t0 = System.nanoTime()
        val rows = graft.operators.Dedup
          .hammingChunkPairs(sigs, maxHamming = 3, maxBucket = maxBucket)
          .count()
        ((System.nanoTime() - t0) / 1e9, rows)
      } finally graft.operators.Storage.unpersistLocalCheckpoint(sigs)
    }

    println(f"[probe] hot-bucket start load=${load()}%.2f corpus=$corpusN cap=$cap")
    // uncapped: only small N — the quadratic growth IS the finding
    for (n <- Seq(1000, 2000, 4000); pass <- 1 to 3) {
      val (t, rows) = timePairs(n, Int.MaxValue)
      println(f"""[probe-json] {"case":"hot_bucket_uncapped","n_plants":$n,"pass":$pass,"sec":$t%.2f,"pairs":$rows,"load":${load()}%.2f}""")
    }
    // capped: the production path must stay flat while N grows 50x
    for (n <- Seq(1000, 10000, 50000); pass <- 1 to 3) {
      val (t, rows) = timePairs(n, cap)
      println(f"""[probe-json] {"case":"hot_bucket_capped","n_plants":$n,"pass":$pass,"sec":$t%.2f,"pairs":$rows,"load":${load()}%.2f}""")
    }
    println(f"[probe] hot-bucket end load=${load()}%.2f")
    spark.stop()
  }
}
