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

  test("text/LSH kernels are callable from SQL and agree with the Scala API") {
    GraftExtensions.register(spark)
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet").limit(50)
    d.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT doc_id, simhash64(text) AS sh, shingle_set(text, 3) AS ss,
                minhash_sig(text, 3, 16) AS ms
         FROM ext_docs""")
      .as[(Long, Long, Seq[String], Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3.toList, r._4.toList)).toMap
    val api = d.select($"doc_id",
      graft.functions.SimHash64($"text").as("sh"),
      graft.functions.ShingleSet($"text", 3).as("ss"),
      graft.functions.MinHashSignature($"text", 3, 16).as("ms"))
      .as[(Long, Long, Seq[String], Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3.toList, r._4.toList)).toMap
    assert(sql == api)
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet").limit(20)
    e.createOrReplaceTempView("ext_vecs")
    val sqlSig = spark.sql(
      "SELECT vec_id, hyperplane_band_sig(embedding, 8, 1) AS s FROM ext_vecs")
      .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2.toList).toMap
    val apiSig = e.select($"vec_id",
      graft.functions.HyperplaneBandSignature($"embedding", 8, 1, 64).as("s"))
      .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2.toList).toMap
    assert(sqlSig == apiSig)
    // round-5 kernels: squared_l2 + gopher_repetition
    val sqlL2 = spark.sql(
      """SELECT a.vec_id, squared_l2(a.embedding, b.embedding) AS d
         FROM ext_vecs a JOIN ext_vecs b ON b.vec_id = 0""")
      .as[(Long, Double)].collect().toMap
    val apiL2 = e.crossJoin(e.where($"vec_id" === 0).select($"embedding".as("b")))
      .select($"vec_id", graft.functions.SquaredL2($"embedding", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(sqlL2 == apiL2)
    val sqlGr = spark.sql(
      "SELECT doc_id, gopher_repetition(text).total_2 AS t2 FROM ext_docs")
      .as[(Long, Option[Long])].collect().toMap
    val apiGr = d.select($"doc_id",
      graft.functions.GopherRepetition($"text").getField("total_2").as("t2"))
      .as[(Long, Option[Long])].collect().toMap
    assert(sqlGr == apiGr && sqlGr.values.flatten.exists(_ > 0))
  }

  test("shingle_set rejects a non-literal width") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_set('a b c', CAST(rand() * 3 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("cosine_sim rejects wrong argument types with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim('a', 'b')").collect()
    }
    assert(e.getMessage.contains("cosine_sim"))
  }
}
