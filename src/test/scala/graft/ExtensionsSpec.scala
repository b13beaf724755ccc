package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine_sim is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1f, 0f), Array(1f, 0f)), (Array(1f, 0f), Array(0f, 1f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs ORDER BY c")
      .as[Double].collect().toSeq
    assert(got == Seq(0.0, 1.0))
  }

  test("cosine_sim rejects wrong argument types with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim('a', 'b')").collect()
    }
    assert(e.getMessage.contains("cosine_sim"))
  }
}
