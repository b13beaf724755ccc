package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pagerank: the node every edge points at outranks the pointers") {
    // star graph: 1..5 all point at 10; 10 points back at 1
    val edges = (Seq((10L, 1L)) ++ (1L to 5L).map(u => (u, 10L)))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(pr(10L) > pr(1L), s"hub not ranked above spoke: $pr")
    assert(pr(1L) > pr(2L), "backlinked spoke 1 should outrank plain spokes")
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L) && pr(4L) == pr(5L),
      "symmetric spokes must tie exactly (integer arithmetic)")
  }

  test("pagerank is deterministic across runs and partitionings") {
    val edges = (1L to 200L).map(i => (i, i * 7 % 50)).toDF("src", "dst")
    val a = Graph.pageRank(edges, iters = 3).as[(Long, Long)].collect().toSet
    val b = Graph.pageRank(edges.repartition(13), iters = 3)
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("pagerank releases every superseded checkpoint; only the result stays") {
    // base relations (edges/nodes/outdeg) and superseded rounds must
    // unpersist — same storage-flatness contract as connectedComponents
    val edges = (1L to 100L).map(i => (i, i % 10)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.size
    val pr = Graph.pageRank(edges, iters = 3)
    pr.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1,
      s"leaked checkpoint blocks: $before persistent RDDs before, $after after")
  }

  test("pagerank with zero iterations returns the base rank everywhere") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 0).as[(Long, Long)].collect().toMap
    assert(pr.values.toSet == Set(1000000000000L))
  }
}
