package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

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
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def buildCosine(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
    CosineSimilarity(args.head, args(1))
  }

  private[plans] val cosineSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(
      classOf[CosineSimilarity].getCanonicalName,
      null,
      "cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float vectors " +
        "(sequential double accumulation; codegen'd)",
      ""),
    buildCosine _)

  /** Imperative registration on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      cosineSimDescriptor._1, cosineSimDescriptor._2, cosineSimDescriptor._3)
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}
