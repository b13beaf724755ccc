package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, GopherRepetition, HyperplaneBandSignature, Md5SimHash64, MinHashSignature, ShingleSet, SimHash64, SquaredL2}

/** Engine extension wiring (SparkSessionExtensions): registers graft's
  * native Catalyst expressions as SQL functions, so `spark.sql` users
  * get them too:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions   // at session build
  *   // or imperatively on an existing session:
  *   GraftExtensions.register(spark)
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptors.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def buildCosine(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
    CosineSimilarity(args.head, args(1))
  }

  /** Extract a literal int argument (e.g. shingle width) at resolution
    * time — these parameters shape the expression itself, so they must
    * be foldable. */
  private def litInt(fn: String, e: Expression, what: String): Int = {
    require(e.foldable, s"$fn: $what must be a literal integer")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }
  }

  private def descriptor(
      name: String, clazz: Class[_], usage: String)(
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getCanonicalName, null, name, usage, ""),
    build)

  private[plans] val functionDescriptors = Seq(
    descriptor("cosine_sim", classOf[CosineSimilarity],
      "cosine_sim(a, b) - cosine similarity of two float vectors " +
        "(sequential double accumulation; codegen'd)")(buildCosine _),
    descriptor("simhash64", classOf[SimHash64],
      "simhash64(text) - 64-bit SimHash of whitespace-tokenized lowercase text") { args =>
      require(args.length == 1, s"simhash64 expects 1 argument, got ${args.length}")
      SimHash64(args.head)
    },
    descriptor("md5_simhash64", classOf[Md5SimHash64],
      "md5_simhash64(text) - 64-bit SimHash with per-token bits from md5 " +
        "(engine-neutral; SQL-oracle-verifiable)") { args =>
      require(args.length == 1, s"md5_simhash64 expects 1 argument, got ${args.length}")
      Md5SimHash64(args.head)
    },
    descriptor("shingle_set", classOf[ShingleSet],
      "shingle_set(text, n) - distinct word n-gram shingles, first-occurrence order") { args =>
      require(args.length == 2, s"shingle_set expects 2 arguments, got ${args.length}")
      ShingleSet(args.head, litInt("shingle_set", args(1), "n"))
    },
    descriptor("minhash_sig", classOf[MinHashSignature],
      "minhash_sig(text, n, k) - k-seed MinHash signature of the n-gram shingle set") { args =>
      require(args.length == 3, s"minhash_sig expects 3 arguments, got ${args.length}")
      MinHashSignature(args.head,
        litInt("minhash_sig", args(1), "n"), litInt("minhash_sig", args(2), "k"))
    },
    descriptor("squared_l2", classOf[SquaredL2],
      "squared_l2(a, b) - squared euclidean distance of two float vectors " +
        "(sequential double accumulation; codegen'd)") { args =>
      require(args.length == 2, s"squared_l2 expects 2 arguments, got ${args.length}")
      SquaredL2(args.head, args(1))
    },
    descriptor("gopher_repetition", classOf[GopherRepetition],
      "gopher_repetition(text) - struct(total_2, uniq_2, top_2, total_3, uniq_3, " +
        "top_3): per-row n-gram repetition counters for Gopher-style quality fractions") { args =>
      require(args.length == 1,
        s"gopher_repetition expects 1 argument, got ${args.length}")
      GopherRepetition(args.head)
    },
    descriptor("hyperplane_band_sig", classOf[HyperplaneBandSignature],
      "hyperplane_band_sig(vec, planes_per_band, bands) - banded random-hyperplane " +
        "LSH signatures of a float vector") { args =>
      require(args.length == 3,
        s"hyperplane_band_sig expects 3 arguments, got ${args.length}")
      HyperplaneBandSignature(args.head,
        litInt("hyperplane_band_sig", args(1), "planes_per_band"),
        litInt("hyperplane_band_sig", args(2), "bands"))
    })

  /** Imperative registration on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit = {
    functionDescriptors.foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}
