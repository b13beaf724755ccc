package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("all queries run and return rows on sf0.001 — no vacuous passes") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, TestSpark.sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }

  test("query names are stable snake_case identifiers") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("[a-z][a-z0-9_]*"), s"bad name: $k")
    }
  }
}
