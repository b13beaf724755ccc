package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain inner join on a skewed key") {
    // 90% of the probe side hits one hot key
    val left = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong))
      .toDF("k", "lv")
    val right = Seq((7L, "hot"), (10L, "cold"), (20L, "cold2")).toDF("rk", "rv")
    val plain = left.join(right, $"k" === $"rk").select("k", "lv", "rv")
      .as[(Long, Long, String)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(left, right, $"k", $"rk", salt = 8)
      .select("k", "lv", "rv").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 7L) == 900)
  }

  test("salted join replicates the build side, not the probe side") {
    val left = Seq((1L, 1L)).toDF("k", "lv")
    val right = Seq((1L, "x")).toDF("rk", "rv")
    // salt=4: right becomes 4 rows internally, but output stays 1 row
    val out = SkewJoin.saltedInnerJoin(left, right, $"k", $"rk", salt = 4)
    assert(out.count() == 1)
  }
}
