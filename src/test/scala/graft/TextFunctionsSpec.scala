package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.model.Schemas

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic samples from a ScalaCheck Gen (no scalatestplus
    * bridge in the offline cache — sample by fixed seeds instead). */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("tokens / tokenCount") {
    val df = Seq("The quick  brown fox").toDF("text")
    assert(df.select(tokenCount($"text")).head().getInt(0) == 4)
    assert(df.select(tokens($"text")).head().getSeq[String](0) ==
      Seq("the", "quick", "brown", "fox"))
  }

  test("shingles: standard, exact-length, and too-short inputs") {
    val df = Seq("a b c d", "a b c", "a b", "").toDF("text")
    val got = df.select(shingleSet($"text", 3)).collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b c"))
    assert(got(2) == Seq.empty)
    // whitespace split of "" yields [""], still shorter than n=3
    assert(got(3) == Seq.empty)
  }

  test("fingerprint matches hand-computed rolling hash") {
    val expected = "ab".foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val got = Seq("ab").toDF("text").select(fingerprint($"text")).head().getLong(0)
    assert(got == expected)
  }

  test("langId identifies obvious languages and han text") {
    val df = Seq(
      ("the cat sat on the mat and it is a cat", "en"),
      ("el gato y la casa de la abuela en madrid", "es"),
      ("你好世界", "zh")).toDF("text", "expected")
    val got = df.select(langId($"text"), $"expected").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("quality score is in [0,1]") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val bad = docs.select(qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1).count()
    assert(bad == 0)
  }

  test("property: single-pass kernels match HOF/agg forms on adversarial strings") {
    // unicode, leading/trailing/multi-whitespace, empties — the edge
    // cases the real-document parity specs never exercise
    val charGen = Gen.frequency(
      (5, Gen.choose(32.toChar, 126.toChar)),
      (2, Gen.oneOf(' ', ' ', ' ', '\t', '\n')),
      (1, Gen.oneOf('é', 'ß', '中', '文', '€')))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    val inputs = (samples(textGen, 40) ++ Seq("", " ", "  a  ", "\ta b\n", "中 文 字 典"))
      .distinct
    val df = inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // ShingleSet vs HOF shingleSet
    val shDiff = df.select(
      graft.functions.ShingleSet($"text", 2).as("fast"),
      shingleSet($"text", 2).as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(shDiff == 0)
    // SimHash64 vs explode+agg form (docs whose token array is non-empty)
    val simFast = graft.operators.Dedup.simhashSignatures(df)
      .as[(Long, Long)].collect().toMap
    val simRef = graft.operators.Dedup.simhashSignaturesAgg(df)
      .as[(Long, Long)].collect().toMap
    simRef.foreach { case (id, sig) => assert(simFast(id) == sig, s"doc $id") }
    // MinHashSignature vs explode+agg form
    val mhFast = graft.operators.Dedup.minhashSignatures(df, 2, 8)
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toList).toMap
    val mhRef = graft.operators.Dedup.minhashSignaturesAgg(df, 2, 8)
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toList).toMap
    assert(mhFast == mhRef)
  }

  test("property: GopherRepetition kernel matches the (doc,n,gram) aggregation form") {
    // small vocab + repetition so gram multiplicities are interesting;
    // plus the degenerate shapes (empty, 1-token, exactly-2-token)
    val textGen = Gen.listOf(Gen.oneOf("a", "b", "c", "aa", "ab")).map(_.mkString(" "))
    val inputs = (samples(textGen, 40) ++
      Seq("", " ", "a", "a b", "a a a a", "x y x y x", " a  b a ")).distinct
    val df = inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    // the kernel form — same projection arithmetic as the query
    def dup(n: Int) = round(lit(1.0) -
      col(s"g.uniq_$n").cast("double") / col(s"g.total_$n").cast("double"), 6)
    def topf(n: Int) = round(
      col(s"g.top_$n").cast("double") / col(s"g.total_$n").cast("double"), 6)
    val fast = df.select(col("doc_id"), graft.functions.GopherRepetition(col("text")).as("g"))
      .where(col("g").isNotNull)
      .select(col("doc_id"), dup(2).as("d2"), topf(2).as("t2"), dup(3).as("d3"), topf(3).as("t3"))

    // the retired declarative form: explode every (doc, n, gram), three
    // aggregations — the ground truth the kernel must reproduce
    val grams = df.select(col("doc_id"),
      explode(map(lit(2), shingles(tokens(col("text")), 2),
        lit(3), shingles(tokens(col("text")), 3))))
      .toDF("doc_id", "n", "grams")
      .select(col("doc_id"), col("n"), explode(col("grams")).as("gram"))
    val per = grams.groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n").agg(
        sum("c").as("total"), count(lit(1)).as("uniq"), max("c").as("top_c"))
    def frac(numer: org.apache.spark.sql.Column) =
      round(numer / col("total").cast("double"), 6)
    val ref = per.groupBy("doc_id").agg(
      max(when(col("n") === 2,
        round(lit(1.0) - col("uniq").cast("double") / col("total").cast("double"), 6))).as("d2"),
      max(when(col("n") === 2, frac(col("top_c").cast("double")))).as("t2"),
      max(when(col("n") === 3,
        round(lit(1.0) - col("uniq").cast("double") / col("total").cast("double"), 6))).as("d3"),
      max(when(col("n") === 3, frac(col("top_c").cast("double")))).as("t3"))

    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> (1 to 4).map(i => Option(r.get(i))).toList).toMap
    val fastM = toMap(fast.collect())
    val refM = toMap(ref.collect())
    assert(fastM == refM)
  }

  test("property: unbase64(base64(s)) == s over printable ASCII") {
    val asciiGen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val inputs = samples(asciiGen, 30).distinct
    assert(inputs.nonEmpty)
    val got = inputs.toDF("t")
      .select($"t", unbase64(base64($"t".cast("binary"))).cast("string").as("rt"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0)))
  }

  test("property: from_json(to_json(customer)) round-trips") {
    val gen = for {
      name <- Gen.alphaNumStr.map(_.take(30))
      email <- Gen.alphaNumStr.map(_.take(30))
    } yield (name, email)
    val inputs = samples(gen, 20).distinct
    assert(inputs.nonEmpty)
    val rt = inputs.map { case (n, e) => (n, e, "555", "1990-01-01") }
      .toDF("customerName", "email", "phone", "birthDay")
      .select(to_json(struct($"customerName", $"email", $"phone", $"birthDay")).as("j"))
      .select(from_json($"j", Schemas.customer).as("c"))
      .select("c.*")
      .collect()
    rt.zip(inputs).foreach { case (r, (n, e)) =>
      assert(r.getString(0) == n && r.getString(1) == e)
    }
  }
}
