package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ContentHashIndex, Dedup}

/** The persisted exact-dedup index ([[graft.operators.ContentHashIndex]]):
  * the LSM delta-segment protocol on the content-hash tier. */
class ContentHashIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // exact-duplicate groups straddling the base/delta split: {1,2,10}
  // share text A (base×2 + delta), {11,12} share text B (delta-only
  // group across epochs), 3/13 unique
  private def corpus = docs(
    (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
    (3L, "unique base text"),
    (10L, "alpha beta gamma"),
    (11L, "delta epoch text"), (12L, "delta epoch text"),
    (13L, "unique shard text"))

  private def groupsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("keep_doc_id", "n_copies")
      .as[(Long, Long)].collect().toSet

  test("incremental serve == Dedup.exact over the union; replay/torn/compact/gc laws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ch_spec_")
    val path = dir.toAbsolutePath.toString
    ContentHashIndex.write(corpus.where($"doc_id" <= 3), path)
    assert(ContentHashIndex.appendEpoch(spark, path, 0L,
      corpus.where($"doc_id" === 10L || $"doc_id" === 11L)))
    assert(ContentHashIndex.appendEpoch(spark, path, 1L,
      corpus.where($"doc_id" >= 12L)))

    val want = groupsOf(Dedup.exact(corpus))
    assert(want == Set((1L, 3L), (3L, 1L), (11L, 2L), (13L, 1L)))
    assert(groupsOf(ContentHashIndex.serveGroups(spark, path)) == want,
      "base ∪ delta serve diverged from the batch operator")

    // replay skipped; torn segment invisible
    assert(!ContentHashIndex.appendEpoch(spark, path, 1L, corpus))
    ContentHashIndex.fingerprints(docs((99L, "alpha beta gamma")))
      .write.mode("overwrite").parquet(s"$path/deltas/2")
    assert(groupsOf(ContentHashIndex.serveGroups(spark, path)) == want)

    // compact + gc preserve results; markers outlive folded data
    ContentHashIndex.compact(spark, path)
    assert(groupsOf(ContentHashIndex.serveGroups(spark, path)) == want)
    ContentHashIndex.gc(spark, path)
    assert(!new java.io.File(s"$path/deltas/0").exists)
    assert(new java.io.File(s"$path/epochs/0").exists)
    // the torn epoch-2 dir (data, no marker, never replayed) is disk
    // leak, invisible to every reader — gc reclaims it (ADVICE r11)
    assert(!new java.io.File(s"$path/deltas/2").exists,
      "gc left a torn (uncommitted) delta directory behind")
    assert(groupsOf(ContentHashIndex.serveGroups(spark, path)) == want)
  }

  test("a second writer racing the same index fails loudly on the marker collision") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ch_race_")
    val path = dir.toAbsolutePath.toString
    ContentHashIndex.write(corpus.where($"doc_id" <= 3), path)
    // a second init against a live index = two writers with different
    // lineages pointed at one path; the gen-0 marker already exists,
    // so the loser must fail loudly BEFORE touching the stored data
    val e = intercept[IllegalArgumentException] {
      ContentHashIndex.write(corpus, path)
    }
    assert(e.getMessage.contains("already initialized"))
    // the index survives the failed second writer untouched
    assert(groupsOf(ContentHashIndex.serveGroups(spark, path)) ==
      groupsOf(Dedup.exact(corpus.where($"doc_id" <= 3))))
  }

  test("probeNew reports earliest indexed copy + multiplicity, only for colliding shard docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ch_probe_spec_")
    val path = dir.toAbsolutePath.toString
    ContentHashIndex.write(corpus.where($"doc_id" <= 3), path)
    val got = ContentHashIndex.probeNew(spark, path,
        corpus.where($"doc_id" >= 10L))
      .as[(Long, Long, Long)].collect().toSet
    // only doc 10 duplicates indexed content: earliest copy 1, two
    // indexed copies; 11/12 duplicate each other but nothing INDEXED
    assert(got == Set((10L, 1L, 2L)))
  }

  test("diffAsOf labels changed vs added; identical re-appends are not differences") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ch_diff_spec_")
    val path = dir.toAbsolutePath.toString
    ContentHashIndex.write(corpus.where($"doc_id" <= 3), path)
    assert(ContentHashIndex.appendEpoch(spark, path, 0L, docs(
      (1L, "alpha beta gamma"), // identical re-append: NOT a diff
      (2L, "alpha beta gamma REVISED"), // content moved under same id
      (20L, "brand new page")))) // new id
    val got = ContentHashIndex.diffAsOf(spark, path, -1L, 0L)
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed"), (20L, "added")),
      s"diff statuses wrong: $got")
    // empty diff when both snapshots are the same epoch
    assert(ContentHashIndex.diffAsOf(spark, path, 0L, 0L).isEmpty)
    // the diff survives compaction: fold everything into a new base
    // and the same epoch pair must resolve identically through the
    // retained-generation as-of protocol
    assert(ContentHashIndex.appendEpoch(spark, path, 1L,
      docs((30L, "late page"))))
    ContentHashIndex.compact(spark, path)
    val after = ContentHashIndex.diffAsOf(spark, path, -1L, 0L)
      .as[(Long, String)].collect().toSet
    assert(after == got, s"compaction changed the diff: $after")
  }
}
