package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components (which
  * lives in [[Dedup.connectedComponents]]): fixed-iteration PageRank
  * over an edge list.
  *
  * Determinism: ranks are INTEGER-scaled (1e12 = rank 1.0) and every
  * step is integer arithmetic — `div` truncation and 64-bit sums are
  * order-independent, so the whole trajectory is reproducible by the
  * DuckDB oracle with `//`, with no float-accumulation-order caveats.
  * Overflow headroom: Σ ranks ≤ n_nodes·1e12 and the damping multiply
  * is ×85, so the int64 budget holds to ~1e15 scaled mass ≈ 1M nodes;
  * beyond that, lower SCALE (rank resolution) by the same factor.
  *
  * Scale shape per iteration: one join of the rank relation with the
  * edge list on `src` (both shuffle-partitioned on the join key; the
  * rank side is |V| rows, edges |E|) and one map-side-combinable sum
  * on `dst` — the canonical Pregel-style superstep as two relational
  * ops, nothing driver-side. Dangling nodes (outdeg 0) keep the base
  * rank and simply stop propagating — their mass is dropped, the
  * usual simplification for sink-heavy graphs.
  */
object Graph {

  private val SCALE = 1000000000000L // rank 1.0
  private val BASE = 150000000000L // (1 - d) · SCALE, d = 0.85

  /** `edges(src, dst)` is a directed multigraph — parallel edges act
    * as weight. Returns (node_id, pr) with pr scaled by 1e12. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val nodes = edges.select(col("src").as("node_id"))
      .union(edges.select(col("dst").as("node_id")))
      .distinct()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var pr = nodes.withColumn("pr", lit(SCALE))
    for (_ <- 1 to iters) {
      val contrib = pr
        .join(outdeg, pr("node_id") === outdeg("src"))
        .select(col("node_id").as("u"), expr("pr div outdeg").as("c"))
      val inbound = edges
        .join(contrib, edges("src") === contrib("u"))
        .groupBy(col("dst").as("node_id"))
        .agg(sum(col("c")).as("s"))
      pr = nodes
        .join(inbound, Seq("node_id"), "left")
        .select(col("node_id"),
          (lit(BASE) + expr("85 * coalesce(s, 0L) div 100")).as("pr"))
    }
    pr
  }
}
