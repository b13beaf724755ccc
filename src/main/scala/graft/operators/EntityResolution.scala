package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution over STRUCTURED records — the blocking +
  * pairwise-scoring + clustering pipeline that deduplicates customer
  * / vendor / author tables, as opposed to the document-content
  * dedup in [[Dedup]] (reference scope: the STEDI pipeline joins two
  * record streams on an exact customer key,
  * `sparkpykafkajoin.py:141-146`; this is the fuzzy generalization a
  * warehouse needs when the key itself is dirty).
  *
  * Classic three stages (Fellegi–Sunter framing, blocking per
  * Christen 2012):
  *  1. **Blocking** — records are compared only within equal values
  *     of cheap deterministic keys, turning O(N²) into
  *     Σ_b |block_b|²;
  *  2. **Pairwise scoring** — Levenshtein edit distance on the name
  *     field (Spark's codegen'd `levenshtein`, matched exactly by
  *     DuckDB's — an integer, so thresholding has no float caveats);
  *  3. **Clustering** — matched pairs close transitively via
  *     [[Dedup.connectedComponents]], and each entity cluster elects
  *     one canonical survivor.
  *
  * 100 TB shape: pair generation is a self-equi-join on the blocking
  * keys — both sides shuffle-partition on the same key so the
  * quadratic expansion happens STREAMED inside each join partition
  * (never a whole block `collect_list`'d into one row). The two
  * branches do scan the records twice (Spark plan branches share no
  * work; at gate scale AQE broadcasts one side instead — see the
  * er_candidates digest) — the deliberate trade against a per-block
  * collect_list, whose hot-block row would OOM a task rather than
  * stream. Blocking-key choice owns the skew budget: a hot block
  * costs |block|² streamed comparisons, so keys must be chosen to
  * bound block size (the usual practice) — `maxPairsPerBlock` makes
  * that contract LOUD: any block whose pair count would exceed it
  * fails the job with the block key in the message (a partial pair
  * set is never silently served; same loud-saturation policy as the
  * Hamming cap, but ER blocks are caller-chosen, so failing beats
  * dropping).
  */
object EntityResolution {

  /** One field's contribution to a multi-field agreement score
    * ([[blockedPairsMulti]]) — the Fellegi–Sunter shape: each field
    * comparison yields agree/disagree, and agreement earns the
    * field's INTEGER weight (integer so the summed score is exact on
    * any engine). A NULL on either side is a DISAGREEMENT (missing
    * data earns no points — the conservative linkage default). */
  sealed trait FieldScore {
    def field: String
    def weight: Int
    private[operators] def agree(
        a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column
  }

  /** Fuzzy text agreement: `levenshtein(a, b) <= maxDist` (Spark's
    * codegen'd integer Levenshtein — matched exactly by DuckDB's),
    * evaluated through the BANDED threshold form
    * `levenshtein(a, b, maxDist)` (SPARK-40718): the DP runs only a
    * 2·maxDist+1 diagonal band and aborts early, returning −1 past
    * the threshold — O(len·maxDist) instead of O(len²) per pair, with
    * `dist ≤ maxDist ⟺ banded ≥ 0` (the banded form returns the exact
    * distance whenever it is within the threshold). */
  final case class FuzzyField(field: String, maxDist: Int, weight: Int)
      extends FieldScore {
    private[operators] def agree(
        a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      coalesce((levenshtein(a, b, maxDist) >= 0).cast("int"), lit(0))
  }

  /** Exact agreement on a secondary key (phone, tax id, zip). */
  final case class ExactField(field: String, weight: Int)
      extends FieldScore {
    private[operators] def agree(
        a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      coalesce((a === b).cast("int"), lit(0))
  }

  /** Numeric agreement within an absolute tolerance — exact on both
    * engines when the column is DECIMAL (the difference stays decimal
    * and the comparison has no float rounding at these scales). */
  final case class NumericField(field: String, tol: Double, weight: Int)
      extends FieldScore {
    private[operators] def agree(
        a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      coalesce((abs(a - b) <= tol).cast("int"), lit(0))
  }

  /** Candidate pairs: records compared within equal `blockCols`
    * values, kept when `levenshtein(name_a, name_b) <= maxDist`.
    * Input must carry `id` (int64, unique) and `name` (string);
    * returns (a_id, b_id, name_dist) with a_id < b_id.
    *
    * The block-size guard counts rows per block FIRST (one
    * combinable count over the same shuffle layout the join uses)
    * and raises before any oversized block expands. */
  def blockedPairs(
      records: DataFrame, blockCols: Seq[String], maxDist: Int,
      maxPairsPerBlock: Long = 100000000L): DataFrame = {
    val bcols = blockCols.map(col)
    // NULL-keyed records can never be compared (the equi-join drops
    // NULL keys), so they are excluded BEFORE the budget window:
    // otherwise the window groups them into one phantom "block" that
    // can trip maxPairsPerBlock loudly for data that cannot produce a
    // single pair. Exclusion here makes the guard's domain exactly
    // the join's domain.
    val participating = records.where(bcols.map(_.isNotNull).reduce(_ && _))
    // the guard RIDES the name column (a standalone flag column would
    // be pruned away, and raise_error with it): any oversized block
    // poisons every name it would have compared, so the join can
    // never stream a partial pair set past it
    val guarded = participating
      .withColumn("bn", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(bcols: _*))
        .cast("long"))
      .select((Seq(col("id"),
        when(col("bn") * (col("bn") - 1) / 2 <= maxPairsPerBlock, col("name"))
          .otherwise(raise_error(concat(
            lit("blockedPairs: block "), concat_ws("/", bcols: _*),
            lit(" expands "),
            (col("bn") * (col("bn") - 1) / 2).cast("string"),
            lit(s" pairs > maxPairsPerBlock=$maxPairsPerBlock — refine "
              + "the blocking keys")))).as("name")) ++ bcols): _*)
    val a = guarded.select(
      (Seq(col("id").as("a_id"), col("name").as("a_name")) ++ bcols): _*)
    val b = guarded.select(
      (Seq(col("id").as("b_id"), col("name").as("b_name")) ++ bcols): _*)
    a.join(b, blockCols)
      .where(col("a_id") < col("b_id"))
      // banded threshold Levenshtein (SPARK-40718): O(len·maxDist)
      // per pair with early abort, −1 past the threshold — identical
      // distance values for every surviving pair
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_name"), col("b_name"), maxDist)
          .cast("int").as("name_dist"))
      .where(col("name_dist") >= 0)
  }

  /** MULTI-FIELD candidate pairs — real record linkage weighs several
    * fields, not one ([[blockedPairs]] scores only the name): within
    * equal `blockCols` values, each field of `fields` is compared and
    * agreement earns its integer weight; pairs whose summed score
    * reaches `minScore` are returned as (a_id, b_id, score). The
    * weighted-agreement form of Fellegi–Sunter 1969 with
    * deterministic integer weights in place of estimated log-odds —
    * every comparison and the sum replay exactly in SQL.
    *
    * Same loud block budget and NULL-block exclusion as
    * [[blockedPairs]]; the guard rides the FIRST scored field (every
    * emitted pair evaluates it, so no pair can stream past a poisoned
    * block). Scale shape identical too: one self-equi-join on the
    * blocking keys, quadratic-in-block streamed in-partition, never a
    * per-block collect. */
  def blockedPairsMulti(
      records: DataFrame, blockCols: Seq[String], fields: Seq[FieldScore],
      minScore: Int, maxPairsPerBlock: Long = 100000000L): DataFrame = {
    require(fields.nonEmpty, "blockedPairsMulti: no fields to score")
    val bcols = blockCols.map(col)
    val participating = records.where(bcols.map(_.isNotNull).reduce(_ && _))
    // CHEAP-FIRST SCORING: the exact/numeric agreements are a few
    // codegen'd comparisons; the fuzzy (Levenshtein) ones are the
    // per-pair cost. When both kinds are present, the fuzzy fields are
    // evaluated only for pairs whose cheap score could still reach
    // minScore (cheap + Σ fuzzy weights ≥ minScore) — a pair that
    // fails that bound scores cheap-only, which is < minScore, so the
    // final filter drops it either way: output-identical, but the
    // Levenshtein runs on the corroborated fraction of the block
    // expansion instead of all of it. The loud block budget must keep
    // firing for EVERY pair of an oversized block, so the raise_error
    // poison rides the first EAGERLY-evaluated field: the first cheap
    // field when the fuzzy evaluation is guarded, else fields.head.
    val fuzzyFields = fields.collect { case f: FuzzyField => f }
    val cheapFields = fields.filterNot(_.isInstanceOf[FuzzyField])
    val guardFuzzy = fuzzyFields.nonEmpty && cheapFields.nonEmpty
    val pf = if (guardFuzzy) cheapFields.head.field else fields.head.field
    val guarded = participating
      .withColumn("bn", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(bcols: _*))
        .cast("long"))
      .select((Seq(col("id"),
        when(col("bn") * (col("bn") - 1) / 2 <= maxPairsPerBlock, col(pf))
          .otherwise(raise_error(concat(
            lit("blockedPairsMulti: block "), concat_ws("/", bcols: _*),
            lit(" expands "),
            (col("bn") * (col("bn") - 1) / 2).cast("string"),
            lit(s" pairs > maxPairsPerBlock=$maxPairsPerBlock — refine "
              + "the blocking keys")))).as(pf)) ++
        fields.filterNot(_.field == pf).map(f => col(f.field)) ++ bcols): _*)
    val a = guarded.select((col("id").as("a_id") +:
      fields.map(f => col(f.field).as(s"a_${f.field}"))) ++ bcols: _*)
    val b = guarded.select((col("id").as("b_id") +:
      fields.map(f => col(f.field).as(s"b_${f.field}"))) ++ bcols: _*)
    def fieldScore(fs: Seq[FieldScore]) = fs
      .map(f => lit(f.weight) * f.agree(col(s"a_${f.field}"), col(s"b_${f.field}")))
      .reduceOption(_ + _).getOrElse(lit(0))
    val score =
      if (!guardFuzzy) fieldScore(fields)
      else {
        val cheapScore = fieldScore(cheapFields)
        val fuzzyTotal = fuzzyFields.map(_.weight).sum
        // when() short-circuits per row in codegen: the Levenshtein
        // branch runs only where the bound can still be met
        cheapScore + when(cheapScore + lit(fuzzyTotal) >= minScore,
          fieldScore(fuzzyFields)).otherwise(lit(0))
      }
    a.join(b, blockCols)
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), score.cast("int").as("score"))
      .where(col("score") >= minScore)
  }

  /** Full resolution: candidate pairs → transitive closure →
    * canonical survivor per entity. `quality` is the column of
    * `records` that elects the survivor (max wins, ties toward the
    * smallest id — the [[Dedup.keepBest]] policy). Returns one row
    * per record that belongs to a multi-record entity:
    * (id, entity_id, is_survivor, n_members).
    *
    * Scale: the pair graph is bounded by match density (tiny against
    * the table), clustering touches only matched ids, and the
    * survivor election is one combinable max_by per entity — the
    * records table is read once for scoring and once for the
    * quality join, never windowed corpus-wide. */
  def resolve(
      records: DataFrame, blockCols: Seq[String], maxDist: Int,
      quality: String): DataFrame =
    resolveWith(records,
      blockedPairs(records, blockCols, maxDist), quality)

  /** [[resolve]] over an EXPLICIT candidate-pair relation — the seam
    * that lets any scorer feed the closure + survivor election:
    * [[blockedPairsMulti]]'s weighted-agreement pairs, a probe
    * result, or an externally-supplied match set. `pairs` needs only
    * (a_id, b_id). */
  def resolveWith(
      records: DataFrame, pairs: DataFrame, quality: String): DataFrame = {
    val cc = Dedup.connectedComponents(
      pairs.select(col("a_id"), col("b_id")))
    val members = cc
      .select(col("doc_id").as("id"), col("cluster_id").as("entity_id"))
      .join(records.select(col("id"), col(quality).as("q")), Seq("id"))
    val survivors = members
      .groupBy(col("entity_id"))
      // composite max: quality first, then smaller id — exact because
      // q rides as-is and the id only breaks ties via the struct order
      .agg(max(struct(col("q"), (-col("id")).as("negid"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("entity_id"), (-col("best.negid")).as("survivor_id"),
        col("n_members"))
    members
      .join(survivors, Seq("entity_id"))
      .select(col("id"), col("entity_id"),
        (col("id") === col("survivor_id")).as("is_survivor"),
        col("n_members"))
  }
}
