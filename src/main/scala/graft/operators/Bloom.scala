package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter build + probe, fully relational (no
  * driver-side bitset) and engine-neutral (md5 bit positions, so the
  * DuckDB oracle recomputes membership bit-for-bit).
  *
  * Scale design (100 TB): the filter is `words` 63-bit lanes (see bitPos) — a few
  * hundred rows at most — built with ONE map-side-combinable `bit_or`
  * aggregation over the key set (k rows per key pre-combine, ≤ words
  * rows after). Probing broadcasts those ≤ `words` rows and tests each
  * probe key's k bit positions with a `bool_and` — the big probe side
  * is never shuffled on the key. This is the classic runtime-filter
  * shape: ship a few KB of bits instead of shuffling the fact table
  * for a semi join, then (optionally) verify survivors exactly — the
  * bloom can false-positive but never false-negative, so
  * prefilter + exact join ≡ exact join.
  *
  * Spark's own `bloom_filter_agg`/`might_contain` (and the AQE-injected
  * runtime filter) cover the built-in case; this variant exists so the
  * bit layout is portable: bucket = md5(seed ":" key) like the CMS
  * sketch, making every bit reproducible in the oracle.
  */
object Bloom {

  /** Bit position of `key` for seed `seed`: first 8 md5 hex chars →
    * int → mod (words*63). Same formula as the CMS bucket hash. 63
    * bits per word, not 64: DuckDB's checked left shift rejects
    * `1 << 63` (signed overflow), so the top bit of each lane stays
    * unused to keep the filter bit-for-bit portable to the oracle. */
  private def bitPos(seed: Column, key: Column, words: Int): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), key.cast("string"))),
      1, 8), 16, 10).cast("long") % (words * 63)

  /** Build the filter over `keys(keyCol)`: one combinable aggregation
    * → ≤ `words` rows of (word, bits). */
  def build(keys: DataFrame, keyCol: String, words: Int = 64, k: Int = 3): DataFrame = {
    val seeds = explode(array((0 until k).map(i => lit(i)): _*)).as("seed")
    keys.select(col(keyCol).as("bf_key"), seeds)
      .select(bitPos(col("seed"), col("bf_key"), words).as("pos"))
      .select((col("pos") / 63).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("pos") % 63).cast("int")).as("mask"))
      .groupBy("word")
      .agg(bit_or(col("mask")).as("bits"))
  }

  /** Append boolean `maybeCol` to `probe`: true iff all k bit
    * positions of `keyCol` are set in `bits`. One broadcast hash join
    * per seed (k small, static) — row count and partitioning of the
    * probe side are untouched, so the big side is NEVER shuffled
    * (exploding k rows per key and re-grouping would shuffle the whole
    * probe table just to AND three booleans back together). A word
    * absent from the bits frame (no build key hashed into it) is
    * all-zeros, hence the left joins + coalesce. */
  def maybeContains(
      probe: DataFrame,
      keyCol: String,
      bits: DataFrame,
      maybeCol: String,
      words: Int = 64,
      k: Int = 3): DataFrame = {
    val probed = (0 until k).foldLeft(probe) { (acc, i) =>
      val b = bits.select(col("word").as(s"w_$i"), col("bits").as(s"bits_$i"))
      acc
        .withColumn(s"pos_$i", bitPos(lit(i), col(keyCol), words))
        .join(broadcast(b), (col(s"pos_$i") / 63).cast("int") === col(s"w_$i"), "left")
        .withColumn(s"hit_$i",
          coalesce(col(s"bits_$i"), lit(0L))
            .bitwiseAND(call_function("shiftleft", lit(1L), (col(s"pos_$i") % 63).cast("int"))) =!= 0)
    }
    val maybe = (0 until k).map(i => col(s"hit_$i")).reduce(_ && _)
    probed
      .withColumn(maybeCol, maybe)
      .drop((0 until k).flatMap(i => Seq(s"pos_$i", s"w_$i", s"bits_$i", s"hit_$i")): _*)
  }

  /** Bloom-prefiltered semi join: `left` rows whose `leftKey` appears
    * in `right(rightKey)`. The bloom drops most non-matching left rows
    * before the (exact) semi join, so the shuffle only carries
    * survivors; no false negatives ⇒ result identical to the plain
    * semi join (which is exactly what the oracle runs). */
  def semiJoinPrefiltered(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      words: Int = 64,
      k: Int = 3): DataFrame = {
    val bits = build(right.select(rightKey).distinct(), rightKey, words, k)
    maybeContains(left, leftKey, bits, "bf_maybe", words, k)
      .where(col("bf_maybe"))
      .drop("bf_maybe")
      .join(right.select(col(rightKey).as(leftKey)).distinct(), Seq(leftKey), "semi")
  }
}
