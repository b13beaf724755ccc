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
    // the guard RIDES the name column (a standalone flag column would
    // be pruned away, and raise_error with it): any oversized block
    // poisons every name it would have compared, so the join can
    // never stream a partial pair set past it
    val guarded = records
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
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_name"), col("b_name")).cast("int").as("name_dist"))
      .where(col("name_dist") <= maxDist)
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
      quality: String): DataFrame = {
    val cc = Dedup.connectedComponents(
      blockedPairs(records, blockCols, maxDist)
        .select(col("a_id"), col("b_id")))
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
