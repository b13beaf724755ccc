package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators over the `documents` table — the
  * training-data-pipeline surface (SURVEY.md §2.3). Four families:
  * exact, MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale design (100 TB): every variant is blocking-based — no
  * all-pairs cross join anywhere. Exact dedup is one hash aggregation;
  * MinHash/SimHash pair generation goes through band buckets
  * (`groupBy(band, key)`), so shuffle volume is O(docs × bands), and
  * candidate verification only touches colliding pairs. Skewed buckets
  * (e.g. boilerplate documents) are capped via `MAX_BUCKET`.
  */
object Dedup {

  /** Exact duplicate groups by full-text hash aggregation: one shuffle
    * on xxhash64(text) — the canonical group key is cheap to compare
    * and skew-resistant vs. grouping on the raw text bytes. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(xxhash64(col("text")).as("text_hash"))
      .agg(
        min("doc_id").as("keep_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Exact dedup keyed on a normalized form (lowercase, collapsed
    * whitespace) — catches trivially-reformatted duplicates. */
  def exactNormalized(documents: DataFrame): DataFrame =
    documents
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .groupBy(col("norm"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select("keep_doc_id", "n_copies")

  private val MAX_BUCKET = 64 // skew cap: ignore degenerate LSH buckets

  /** MinHash signature per document: explode distinct shingles once,
    * hash each shingle under `numHashes` seeds *inside one row* (an
    * array expression — no positional explode), then take per-seed MIN
    * in a single hash aggregation. Rows shuffled = docs × shingles,
    * each carrying a compact long array.
    */
  def minhashSignatures(documents: DataFrame, shingleN: Int, numHashes: Int): DataFrame = {
    val sh = documents
      .select(col("doc_id"), explode(shingleSet(col("text"), shingleN)).as("shingle"))
      .select(
        col("doc_id"),
        transform(
          sequence(lit(0), lit(numHashes - 1)),
          i => xxhash64(col("shingle"), i)).as("hs"))
    val mins = (0 until numHashes).map(i => min(element_at(col("hs"), i + 1)).as(s"h$i"))
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** LSH banding: split the signature into `bands` bands, bucket-join
    * docs whose band hashes collide, emit candidate pairs (a < b),
    * then verify candidates with true shingle-set Jaccard and keep
    * pairs >= `threshold`.
    */
  def minhashLsh(
      documents: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8, // 8 bands × 2 rows: P(miss | J=0.9) ≈ (1-J²)^8 ≈ 4e-6

      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(documents, shingleN, numHashes)
    val banded = sigs.select(
      col("doc_id"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("signature"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .toDF("doc_id", "band", "band_hash")
    val buckets = banded
      .groupBy("band", "band_hash")
      .agg(collect_list("doc_id").as("ids"))
      .where(size(col("ids")) between (2, MAX_BUCKET))
    val pairs = buckets
      .select(explode(pairCombinations(col("ids"))).as("p"))
      .select(col("p").getItem(0).as("a_id"), col("p").getItem(1).as("b_id"))
      .distinct()
    verifyJaccard(pairs, documents, shingleN)
      .where(col("jaccard") >= threshold)
  }

  /** All unordered pairs (a < b) from a bucket's id list, as an array
    * expression (buckets are capped, so this is small per row). */
  private def pairCombinations(ids: Column): Column = {
    val sorted = array_sort(ids)
    flatten(transform(sorted, (a, i) =>
      transform(slice(sorted, i + 2, lit(MAX_BUCKET)), b => array(a, b))))
  }

  /** Exact Jaccard for given candidate pairs via shingle-set overlap.
    * Distributed as two broadcast-friendly joins against the exploded
    * shingle relation — never materializes full texts per pair. */
  def verifyJaccard(pairs: DataFrame, documents: DataFrame, shingleN: Int): DataFrame = {
    val sets = documents.select(
      col("doc_id"),
      shingleSet(col("text"), shingleN).as("sh"),
      size(shingleSet(col("text"), shingleN)).as("n_sh"))
    val a = sets.select(col("doc_id").as("a_id"), col("sh").as("a_sh"), col("n_sh").as("a_n"))
    val b = sets.select(col("doc_id").as("b_id"), col("sh").as("b_sh"), col("n_sh").as("b_n"))
    pairs.join(a, "a_id").join(b, "b_id")
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .select(
        col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_n") + col("b_n") - col("inter")).cast("double")).as("jaccard"))
  }

  /** 64-bit SimHash per document: per-token xxhash64, each bit votes
    * +1/-1 weighted by token frequency; the signature is the sign
    * vector. Computed as 64 independent aggregates in one hash
    * aggregation pass (no per-bit shuffle). */
  def simhashSignatures(documents: DataFrame): DataFrame = {
    val toks = documents.select(
      col("doc_id"),
      explode(tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    toks.groupBy("doc_id")
      .agg(bitVotes.head, bitVotes.tail: _*)
      .select(
        col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
          .reduce((x, y) => x.bitwiseOR(y)).as("simhash"))
  }

  /** SimHash near-dup pairs: block on 16-bit chunks (a pair within
    * hamming distance <= 3 of a 64-bit hash must agree exactly on at
    * least one of 4 chunks — pigeonhole), then verify hamming distance.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(documents)
    val chunked = sigs.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL)): _*)))
      .toDF("doc_id", "simhash", "chunk", "chunk_val")
    val a = chunked.toDF("a_id", "a_sim", "chunk", "chunk_val")
    val b = chunked.toDF("b_id", "b_sim", "chunk", "chunk_val")
    a.join(b, Seq("chunk", "chunk_val"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard dedup, brute force *within blocks*: candidate
    * pairs share the same `lang` and a coarse length band, so at scale
    * the cross product stays per-block. This is the oracle-verifiable
    * ground-truth variant that the sketch-based ones approximate. */
  def ngramJaccard(
      documents: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.35): DataFrame = {
    val base = documents.select(
      col("doc_id"), col("lang"),
      (col("n_chars") / lit(200)).cast("long").as("len_band"),
      shingleSet(col("text"), shingleN).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val a = base.select(col("lang"), col("len_band"), col("doc_id").as("a_id"),
      col("sh").as("a_sh"), col("n_sh").as("a_n"))
    val b = base.select(col("lang"), col("len_band"), col("doc_id").as("b_id"),
      col("sh").as("b_sh"), col("n_sh").as("b_n"))
    a.join(b, Seq("lang", "len_band"))
      .where(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("a_n") + col("b_n") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }
}
