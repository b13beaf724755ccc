package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

class EntityResolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def recs(rows: (Long, String, Int, Double)*) =
    rows.toDF("id", "name", "block", "q")

  test("blockedPairs: matches stay inside blocks and under the distance cap") {
    val df = recs(
      (1L, "acme corp", 1, 0.0), (2L, "acme corpx", 1, 0.0), // dist 1
      (3L, "acme corp", 2, 0.0), // same name, OTHER block — never compared
      (4L, "zenith ltd", 1, 0.0)) // dist > 2 from both acme rows
    val got = EntityResolution
      .blockedPairs(df, blockCols = Seq("block"), maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1)),
      s"wanted only the in-block near-name pair: $got")
  }

  test("blockedPairs agrees with a driver-side brute force on random records") {
    val rnd = new scala.util.Random(11)
    val names = Vector("alpha", "alphb", "alpzb", "beta", "betta", "gamma")
    val rows = (1L to 120L).map(i =>
      (i, names(rnd.nextInt(names.size)), rnd.nextInt(4), 0.0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ref = (for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1
      d = lev(a._2, b._2) if d <= 2
    } yield (a._1, b._1, d)).toSet
    val got = EntityResolution
      .blockedPairs(recs(rows: _*), blockCols = Seq("block"), maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == ref)
  }

  test("blockedPairs fails loudly when a block exceeds the pair budget") {
    val df = recs((1L to 20L).map(i => (i, s"name$i", 1, 0.0)): _*)
    val e = intercept[Exception] {
      EntityResolution
        .blockedPairs(df, blockCols = Seq("block"), maxDist = 2,
          maxPairsPerBlock = 100L)
        .collect()
    }
    assert(exceptionChain(e).exists(_.contains("maxPairsPerBlock")),
      s"wanted the loud block-budget message, got: ${e.getMessage}")
  }

  test("blockedPairs: NULL blocking keys neither pair nor trip the budget") {
    // 50 NULL-keyed rows would (bn·(bn−1)/2 = 1225 > 100) trip the
    // budget as a phantom block if they reached the guard window —
    // but NULL keys can never join, so they must be excluded, and the
    // real block's pairs must come back untouched.
    val df = recs((1L, "acme corp", 1, 0.0), (2L, "acme corpx", 1, 0.0))
      .unionByName((100L to 149L).map(i => (i, s"n$i", 0, 0.0))
        .toDF("id", "name", "block", "q")
        .select(col("id"), col("name"),
          lit(null).cast("int").as("block"), col("q")))
    val got = EntityResolution
      .blockedPairs(df, blockCols = Seq("block"), maxDist = 2,
        maxPairsPerBlock = 100L)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1)),
      s"NULL-keyed rows must not pair or trip the budget: $got")
  }

  test("blockedPairsMulti agrees with a driver-side brute force on random records") {
    val rnd = new scala.util.Random(23)
    val names = Vector("alpha", "alphb", "alpzb", "beta", "betta", "gamma")
    val phones = Vector("555-0001", "555-0002", "555-0003")
    val rows = (1L to 100L).map(i =>
      (i, names(rnd.nextInt(names.size)), rnd.nextInt(3),
        phones(rnd.nextInt(phones.size)),
        BigDecimal(rnd.nextInt(2000)) / 100))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ref = (for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1
      score = 3 * (if (lev(a._2, b._2) <= 1) 1 else 0) +
        2 * (if (a._4 == b._4) 1 else 0) +
        1 * (if ((a._5 - b._5).abs <= BigDecimal(5)) 1 else 0)
      if score >= 3
    } yield (a._1, b._1, score)).toSet
    val df = rows.toDF("id", "name", "block", "phone", "bal")
      .withColumn("bal", col("bal").cast("decimal(12,2)"))
    val got = EntityResolution
      .blockedPairsMulti(df, blockCols = Seq("block"),
        fields = Seq(
          EntityResolution.FuzzyField("name", maxDist = 1, weight = 3),
          EntityResolution.ExactField("phone", weight = 2),
          EntityResolution.NumericField("bal", tol = 5.0, weight = 1)),
        minScore = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == ref, s"multi-field score mismatch: got ${got.size}, " +
      s"want ${ref.size}; diff ${(got diff ref) ++ (ref diff got)}")
  }

  test("cheap-first fuzzy guard: output-identical when cheap corroboration is REQUIRED") {
    // minScore 4 with weights 3/2/1 means the Levenshtein branch is
    // skipped for pairs with zero cheap agreement (3 + 0 < 4) — the
    // guard-false path this brute force must match exactly
    val rnd = new scala.util.Random(31)
    val names = Vector("alpha", "alphb", "alpzb", "beta", "betta", "gamma")
    val phones = Vector("555-0001", "555-0002", "555-0003", "555-0004")
    val rows = (1L to 100L).map(i =>
      (i, names(rnd.nextInt(names.size)), rnd.nextInt(3),
        phones(rnd.nextInt(phones.size)),
        BigDecimal(rnd.nextInt(2000)) / 100))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ref = (for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1
      score = 3 * (if (lev(a._2, b._2) <= 1) 1 else 0) +
        2 * (if (a._4 == b._4) 1 else 0) +
        1 * (if ((a._5 - b._5).abs <= BigDecimal(5)) 1 else 0)
      if score >= 4
    } yield (a._1, b._1, score)).toSet
    val df = rows.toDF("id", "name", "block", "phone", "bal")
      .withColumn("bal", col("bal").cast("decimal(12,2)"))
    val got = EntityResolution
      .blockedPairsMulti(df, blockCols = Seq("block"),
        fields = Seq(
          EntityResolution.FuzzyField("name", maxDist = 1, weight = 3),
          EntityResolution.ExactField("phone", weight = 2),
          EntityResolution.NumericField("bal", tol = 5.0, weight = 1)),
        minScore = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == ref, s"guarded multi-field score mismatch: got ${got.size}, " +
      s"want ${ref.size}; diff ${(got diff ref) ++ (ref diff got)}")
  }

  test("blockedPairsMulti budget still fails loudly with guarded fuzzy scoring") {
    // the poison rides the first CHEAP field when the fuzzy branch is
    // guarded — an oversized block must still raise before any pair
    // can stream past, even for pairs whose fuzzy branch is skipped
    val df = (1L to 30L).map(i => (i, s"name$i", 1, s"555-$i"))
      .toDF("id", "name", "block", "phone")
    val ex = intercept[Exception] {
      EntityResolution.blockedPairsMulti(df, blockCols = Seq("block"),
        fields = Seq(
          EntityResolution.FuzzyField("name", maxDist = 1, weight = 3),
          EntityResolution.ExactField("phone", weight = 2)),
        minScore = 4, maxPairsPerBlock = 10L)
        .collect()
    }
    assert(ex.getMessage != null)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxPairsPerBlock")),
      s"budget breach must surface the block contract: ${messages(ex)}")
  }

  test("blockedPairsMulti: NULL field values are disagreements, not errors") {
    val df = Seq(
      (1L, "acme corp", 1, "555-1", Some(BigDecimal(10))),
      (2L, "acme corpx", 1, null.asInstanceOf[String], None: Option[BigDecimal]))
      .toDF("id", "name", "block", "phone", "bal")
      .withColumn("bal", col("bal").cast("decimal(12,2)"))
    val got = EntityResolution
      .blockedPairsMulti(df, blockCols = Seq("block"),
        fields = Seq(
          EntityResolution.FuzzyField("name", maxDist = 2, weight = 3),
          EntityResolution.ExactField("phone", weight = 2),
          EntityResolution.NumericField("bal", tol = 5.0, weight = 1)),
        minScore = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 3)),
      s"NULL phone/bal must score 0, name alone scores 3: $got")
  }

  test("resolve: transitive closure + quality survivor; singletons excluded") {
    // chain a–b, b–c links {1,2,3} into one entity even though 1 and 3
    // are 2 edits apart only via b; 9 is a singleton and must not appear
    val df = recs(
      (1L, "smith", 1, 5.0), (2L, "smyth", 1, 9.0), (3L, "smythe", 1, 7.0),
      (9L, "unrelated", 1, 99.0))
    val got = EntityResolution
      .resolve(df, blockCols = Seq("block"), maxDist = 1, quality = "q")
      .as[(Long, Long, Boolean, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, false, 3L), (2L, 1L, true, 3L), (3L, 1L, false, 3L)),
      s"wanted one 3-member entity with survivor 2 (q=9.0): $got")
  }

  test("resolveWith over explicit pairs equals resolve over the same scorer") {
    val df = recs(
      (1L, "smith", 1, 5.0), (2L, "smyth", 1, 9.0), (3L, "smythe", 1, 7.0),
      (9L, "unrelated", 1, 99.0))
    val direct = EntityResolution
      .resolve(df, blockCols = Seq("block"), maxDist = 1, quality = "q")
      .as[(Long, Long, Boolean, Long)].collect().toSet
    val viaSeam = EntityResolution
      .resolveWith(df,
        EntityResolution.blockedPairs(df, Seq("block"), maxDist = 1),
        quality = "q")
      .as[(Long, Long, Boolean, Long)].collect().toSet
    assert(direct == viaSeam, "the explicit-pair seam drifted from resolve")
  }

  test("resolve survivor ties break toward the smaller id") {
    val df = recs((1L, "aa", 1, 5.0), (2L, "ab", 1, 5.0))
    val got = EntityResolution
      .resolve(df, blockCols = Seq("block"), maxDist = 1, quality = "q")
      .as[(Long, Long, Boolean, Long)].collect().toSet
    assert(got == Set((1L, 1L, true, 2L), (2L, 1L, false, 2L)))
  }

  private def exceptionChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
}
