package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join picks latest right row at-or-before, null when none") {
    val left = Seq((1L, 100L, 10L), (1L, 101L, 25L), (2L, 102L, 5L))
      .toDF("k", "lid", "t")
    val right = Seq((1L, 900L, 10L), (1L, 901L, 20L), (2L, 902L, 50L))
      .toDF("rk", "rid", "rt")
    val got = AsOfJoin.asOf(left, right,
      leftKey = $"k", rightKey = $"rk", leftTime = $"t", rightTime = $"rt")
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got(100L).contains(900L)) // exact tie: <= includes the right row
    assert(got(101L).contains(901L)) // latest of {10, 20} at t=25
    assert(got(102L).isEmpty)        // right row at 50 > 5: no match
  }

  test("as-of join carries matches independently per key") {
    val left = Seq((1L, 1L, 100L), (2L, 2L, 100L)).toDF("k", "lid", "t")
    val right = Seq((1L, 91L, 99L)).toDF("rk", "rid", "rt")
    val got = AsOfJoin.asOf(left, right, $"k", $"rk", $"t", $"rt")
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(91L))
    assert(got(2L).isEmpty) // key 2 never sees key 1's rows
  }
}
