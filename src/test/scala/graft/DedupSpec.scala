package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .withColumn("source", lit("test"))

  test("exact dedup groups identical texts, keeps min doc_id") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val got = Dedup.exact(d).select("keep_doc_id", "n_copies")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("normalized dedup catches case/whitespace variants") {
    val d = docs((1L, "Hello  World"), (2L, "hello world"), (3L, "different"))
    val got = Dedup.exactNormalized(d).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds heavily-overlapping docs and skips disjoint ones") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"tok$i").mkString(" ") + " tokX"
    val other = (100 to 140).map(i => s"other$i").mkString(" ")
    val d = docs((1L, base), (2L, nearDup), (3L, other))
    val pairs = Dedup.minhashLsh(d, shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("verifyJaccard computes exact shingle-set jaccard") {
    // "a b c d" shingles(3): {abc,bcd}; "a b c e": {abc,bce} → J = 1/3
    val d = docs((1L, "a b c d"), (2L, "a b c e"))
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val j = Dedup.verifyJaccard(pairs, d, 3).select("jaccard").head().getDouble(0)
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
  }

  test("simhash: identical docs collide at hamming 0; unrelated docs don't pair") {
    val txt = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (50 to 90).map(i => s"z$i").mkString(" ")
    val d = docs((1L, txt), (2L, txt), (3L, other))
    val got = Dedup.simhashPairs(d, maxHamming = 3)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Int)].collect()
    assert(got.map(t => (t._1, t._2)).toSet == Set((1L, 2L)))
    assert(got.head._3 == 0)
  }

  test("ngram jaccard brute force respects lang blocking") {
    val txt = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, txt, "en"), (2L, txt, "es"), (3L, txt, "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length($"text").cast("long"))
    val got = Dedup.ngramJaccard(d, 3, 0.9).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    // 1-2 blocked (different lang) even though identical text
    assert(got == Set((1L, 3L)))
  }

  test("single-pass shingle-set expression equals the HOF form element-for-element") {
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val both = d.select(
      graft.functions.ShingleSet($"text", 3).as("fast"),
      graft.functions.TextFunctions.shingleSet($"text", 3).as("ref"))
    assert(both.filter($"fast" =!= $"ref").count() == 0)
  }

  test("single-pass simhash expression is bit-identical to the aggregation form") {
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val fast = Dedup.simhashSignatures(d).as[(Long, Long)].collect().toMap
    val ref = Dedup.simhashSignaturesAgg(d).as[(Long, Long)].collect().toMap
    assert(fast == ref)
  }

  test("single-pass minhash expression is bit-identical to the aggregation form") {
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val fast = Dedup.minhashSignatures(d, 3, 16)
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toList).toMap
    val ref = Dedup.minhashSignaturesAgg(d, 3, 16)
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toList).toMap
    assert(fast == ref)
  }

  test("single-pass md5 simhash kernel is bit-identical to the aggregation form") {
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val fast = Dedup.simhashSignaturesMd5(d)
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    val ref = Dedup.simhashSignaturesMd5Agg(d)
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    assert(fast.nonEmpty)
    assert(fast == ref,
      s"diff=${(fast -- ref).take(3)} / ${(ref -- fast).take(3)}")
  }

  test("connected components merge chained pairs into one min-labeled cluster") {
    // chain 5-4, 4-3, 3-2, 2-1 needs several propagation rounds to
    // settle on min label 1; the 10-11 pair is a separate component
    val pairs = Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L), (10L, 11L))
      .toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components leave no superseded checkpoint blocks cached") {
    // the iterative loop localCheckpoints every round; superseded
    // rounds and the edge relation must be unpersisted, so storage is
    // flat in the round count — only the returned labels stay cached
    val pairs = Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L), (10L, 11L))
      .toDF("a_id", "b_id")
    val before = spark.sparkContext.getPersistentRDDs.size
    val got = Dedup.connectedComponents(pairs)
    got.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1,
      s"leaked checkpoint blocks: $before persistent RDDs before, $after after")
  }

  test("containment finds a short doc embedded in a long one that jaccard misses") {
    val short = (1 to 5).map(i => s"w$i").mkString(" ")
    val long = short + " " + (1 to 40).map(i => s"pad$i").mkString(" ")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    val d = docs((1L, short), (2L, long), (3L, other))
    val got = Dedup.ngramContainment(d, shingleN = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    // all 3 of short's shingles appear in long → containment = 1.0,
    // while jaccard = 3/43 ≈ 0.07 — and the length difference would
    // have put the pair in different len_bands, which is why
    // containment must not reuse the jaccard blocking
    assert(got.map(t => (t._1, t._2)).toSet == Set((1L, 2L)))
    assert(math.abs(got.head._3 - 1.0) < 1e-12)
    val j = Dedup.ngramJaccard(d, shingleN = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(j.isEmpty)
  }

  test("keepBest keeps the highest-quality member per cluster, ties to lowest id") {
    // quality's length term grows with token count, so the 40-token
    // doc 4 outranks its 10-token partner 3; docs 1/2 are identical
    // (equal quality) → the tie breaks to doc_id 1
    val t1 = (1 to 10).map(i => s"w$i").mkString(" ")
    val t4 = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs((1L, t1), (2L, t1), (3L, t1), (4L, t4))
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a_id", "b_id")
    val got = Dedup.keepBest(pairs, d)
      .select("cluster_id", "keep_doc_id", "n_members")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L), (3L, 4L, 2L)))
  }

  test("chunk dedup keeps corpus-wide first occurrence, reassembles in order") {
    // doc1 = [a b][c d]; doc2 = [c d][e f] (first chunk duplicates
    // doc1's second); doc3 duplicates doc1 entirely → vanishes
    val d = docs((1L, "a b c d"), (2L, "c d e f"), (3L, "a b c d"))
    val got = Dedup.chunkDedup(d, chunkTokens = 2)
      .select("doc_id", "clean_text", "n_kept")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a b c d", 2L), (2L, "e f", 1L)))
  }

  test("chunk dedup dedups within a document too, trailing chunk may be short") {
    // "x y x y z": chunks [x y][x y][z] → second [x y] is a within-doc
    // dup of chunk 0; the 1-token tail chunk survives
    val d = docs((1L, "x y x y z"))
    val got = Dedup.chunkDedup(d, chunkTokens = 2)
      .select("doc_id", "clean_text", "n_kept")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "x y z", 2L)))
  }

  test("span dedup merges overlapping duplicated windows into maximal spans") {
    // docs 1 and 2 share the 4-token passage "p q r s" embedded at
    // different offsets; W=2 windows [p q][q r][r s] are each
    // duplicated, and they overlap → ONE merged span per doc covering
    // exactly the shared passage. The surrounding tokens are unique,
    // so span boundaries are tight.
    val d = docs(
      (1L, "a b p q r s c d"),
      (2L, "e f g p q r s h"))
    val got = Dedup.spanDedup(d, windowTokens = 2)
      .select("doc_id", "span_start", "span_end", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 6L, 4L), (2L, 3L, 7L, 4L)))
  }

  test("span dedup catches within-doc repetition and keeps disjoint spans apart") {
    // "x y" repeats inside one doc at positions 0 and 4, separated by
    // unique tokens → two disjoint 2-token spans, not one merged span;
    // a doc with no repeated window yields no rows
    val d = docs(
      (1L, "x y a b x y c d"),
      (2L, "m n o p q"))
    val got = Dedup.spanDedup(d, windowTokens = 2)
      .select("doc_id", "span_start", "span_end", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 2L, 2L), (1L, 4L, 6L, 2L)))
  }

  test("span removal keeps the corpus-first copy and rewrites the others") {
    // shared passage "p q r s": doc1 owns every first occurrence and
    // is untouched; doc2's copy is covered only by non-surviving
    // windows and is excised. Docs round-trip (doc1 unchanged).
    val d = docs(
      (1L, "a b p q r s c d"),
      (2L, "e f g p q r s h"))
    val got = Dedup.spanDedupClean(d, windowTokens = 2)
      .select("doc_id", "clean_text", "n_dropped")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "a b p q r s c d", 0L),
      (2L, "e f g h", 4L)))
  }

  test("span removal keeps the first within-doc copy; clean docs unchanged") {
    val d = docs(
      (1L, "x y a b x y c d"),
      (2L, "m n o p q"))
    val got = Dedup.spanDedupClean(d, windowTokens = 2)
      .select("doc_id", "clean_text", "n_dropped")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "x y a b c d", 2L),
      (2L, "m n o p q", 0L)))
  }

  test("LSH candidates cover all true near-dups on real documents") {
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val truth = Dedup.ngramJaccard(d, 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(d, 3, 16, 8, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // 16 hashes / 8 bands of 2: real near-dups here have J >= 0.88, so
    // per-pair miss probability is (1-J²)^8 < 1e-5 — and the hash seeds
    // are fixed, so this is deterministic, not flaky.
    assert(truth.subsetOf(lsh), s"missed: ${truth -- lsh}")
    lsh.foreach { case (a, b) => assert(a < b) }
  }

  test("pairEval: hand-computed metrics, canonicalization, zero guards") {
    // pred canonicalizes to {1-2, 3-4, 5-6} ((2,1) is (1,2) reversed);
    // truth {1-2, 3-4, 7-8, 9-10} → hits 2, P = 2/3, R = 1/2,
    // F1 = 2PR/(P+R) = 4/7
    val pred = Seq((1L, 2L), (2L, 1L), (3L, 4L), (5L, 6L)).toDF("a_id", "b_id")
    val tru = Seq((1L, 2L), (3L, 4L), (7L, 8L), (9L, 10L)).toDF("a_id", "b_id")
    val r = Dedup.pairEval(pred, tru).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 4 && r.getLong(2) == 2)
    assert(math.abs(r.getDouble(3) - 2.0 / 3) < 1e-15)
    assert(r.getDouble(4) == 0.5)
    assert(math.abs(r.getDouble(5) - 4.0 / 7) < 1e-15)
    // empty prediction → zero precision/F1, never null or NaN
    val z = Dedup.pairEval(pred.where(lit(false)), tru).collect().head
    assert(z.getLong(0) == 0 && z.getLong(2) == 0 &&
      z.getDouble(3) == 0.0 && z.getDouble(4) == 0.0 && z.getDouble(5) == 0.0)
    // both sides empty → one all-zero row, not an empty frame
    val zz = Dedup.pairEval(
      pred.where(lit(false)), tru.where(lit(false))).collect().head
    assert(zz.getLong(1) == 0 && zz.getDouble(4) == 0.0 && zz.getDouble(5) == 0.0)
  }
}
