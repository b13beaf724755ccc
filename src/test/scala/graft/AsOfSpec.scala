package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._

/** TIME TRAVEL across every persisted LSM tier: `readAsOf`/`serveAsOf`
  * resolve the retained snapshot of a committed epoch
  * ([[graft.operators.LsmSegments.segmentsAsOf]]), so serving a
  * 3-segment index AS OF epoch 0 must be bit-identical to the LIVE
  * serve of a TWIN index built only from the prefix (base + epoch 0).
  * The horizon/retention battery (retained generations after
  * compact+gc, loud rejection past the horizon, future == live) lives
  * in HammingIndexSpec and SimilaritySpec over the shared resolver;
  * this suite pins the per-tier equality law for the remaining six
  * tiers. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_asof_$tag").toString

  private lazy val docs = spark.read
    .parquet(s"${TestSpark.sfDir}/documents.parquet").localCheckpoint(true)
  private lazy val embs = spark.read
    .parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    .select($"vec_id", $"embedding").localCheckpoint(true)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  /** Build base (m=0) + epochs 0 (m=1) and 1 (m=2) of `df` split on
    * `key` thirds into `path` via the given write/append, and a twin
    * holding only base + epoch 0; return the twin path. */
  private def buildPair(
      df: DataFrame, key: org.apache.spark.sql.Column, path: String,
      twin: String, write: (DataFrame, String) => Unit,
      append: (String, Long, DataFrame) => Unit): String = {
    write(df.where(key % 3 === 0), path)
    append(path, 0L, df.where(key % 3 === 1))
    append(path, 1L, df.where(key % 3 === 2))
    write(df.where(key % 3 === 0), twin)
    append(twin, 0L, df.where(key % 3 === 1))
    twin
  }

  test("ContentHashIndex: dup groups as of epoch 0 == live groups of the prefix twin") {
    val p = tmp("ch"); val t = tmp("ch_twin")
    buildPair(docs, $"doc_id", p, t,
      (d, pp) => ContentHashIndex.write(d, pp),
      (pp, e, d) => ContentHashIndex.appendEpoch(spark, pp, e, d))
    val asOf = rows(ContentHashIndex.serveGroupsAsOf(spark, p, 0L))
    assert(asOf.nonEmpty && asOf == rows(ContentHashIndex.serveGroups(spark, t)))
    assert(asOf != rows(ContentHashIndex.serveGroups(spark, p)),
      "epoch-1 docs should change the live group set")
  }

  test("MinHashIndex: verified pairs as of epoch 0 == live pairs of the prefix twin") {
    val p = tmp("mh"); val t = tmp("mh_twin")
    buildPair(docs, $"doc_id", p, t,
      (d, pp) => MinHashIndex.write(d, pp),
      (pp, e, d) => MinHashIndex.appendEpoch(spark, pp, e, d))
    val asOf = rows(MinHashIndex.servePairsAsOf(spark, p, 0L, threshold = 0.2))
    assert(asOf == rows(MinHashIndex.servePairs(spark, t, threshold = 0.2)))
  }

  test("Sq8Index: top-k as of epoch 0 == live serve of the prefix twin") {
    val q = embs.where($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val p = tmp("sq8"); val t = tmp("sq8_twin")
    buildPair(embs, $"vec_id", p, t,
      (d, pp) => Sq8Index.write(d, pp),
      (pp, e, d) => Sq8Index.appendEpoch(spark, pp, e, d))
    val asOf = rows(Sq8Index.serveAsOf(spark, p, 0L, q))
    assert(asOf.nonEmpty && asOf == rows(Sq8Index.serveAll(spark, t, q)))
  }

  test("PqIndex: ADC top-k as of epoch 0 == live serve of the prefix twin") {
    val cb = embs.where($"vec_id" < 16)
      .select($"vec_id".cast("int").as("cw_k"), $"embedding".as("cw"))
    val q = embs.where($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("q"))
    val p = tmp("pq"); val t = tmp("pq_twin")
    buildPair(embs, $"vec_id", p, t,
      (d, pp) => PqIndex.write(d, cb, pp),
      (pp, e, d) => PqIndex.appendEpoch(spark, pp, e, d))
    val asOf = rows(PqIndex.serveAsOf(spark, p, 0L, q))
    assert(asOf.nonEmpty && asOf == rows(PqIndex.serveAll(spark, t, q)))
  }

  test("MaxSimIndex: late-interaction top-k as of epoch 0 == live serve of the prefix twin") {
    val docOf = floor(col("vec_id") / 4).cast("long")
    val q = Similarity.tokenBags(embs, 4).where($"doc_id" < 4)
      .select($"doc_id".as("query_id"), $"toks".as("qtoks"))
    val p = tmp("ms"); val t = tmp("ms_twin")
    buildPair(embs, docOf, p, t,
      (d, pp) => MaxSimIndex.write(d, pp, tokensPerDoc = 4),
      (pp, e, d) => MaxSimIndex.appendEpoch(spark, pp, e, d))
    val asOf = rows(MaxSimIndex.serveAsOf(spark, p, 0L, q))
    assert(asOf.nonEmpty && asOf == rows(MaxSimIndex.serveAll(spark, t, q)))
  }

  test("IvfPqIndex: residual-ADC top-k as of epoch 0 == live serve of the prefix twin") {
    val seeds = embs.where($"vec_id" < 16)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val cb = Similarity.ivfPqSeedCodebook(embs, seeds)
    val q = embs.where($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("q"))
    val p = tmp("ivfpq"); val t = tmp("ivfpq_twin")
    buildPair(embs, $"vec_id", p, t,
      (d, pp) => IvfPqIndex.write(d, seeds, cb, pp),
      (pp, e, d) => IvfPqIndex.appendEpoch(spark, pp, e, d))
    val asOf = rows(IvfPqIndex.serveAsOf(spark, p, 0L, q))
    assert(asOf.nonEmpty && asOf == rows(IvfPqIndex.serveAll(spark, t, q)))
  }
}
