package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row
  * with the same key whose time is <= the left row's time.
  *
  * Spark has no native as-of operator (SURVEY.md §2.2 gap). The
  * scalable formulation is NOT a range self-join (quadratic in ties)
  * but the union + ordered window trick:
  *
  *   1. tag both inputs and union them (right side sorts BEFORE left
  *      at equal timestamps → "<=" semantics),
  *   2. one hash-partition by key + sort by (time, side),
  *   3. last_value(right_payload, ignoreNulls) over the running frame
  *      carries the latest right row forward,
  *   4. keep left rows.
  *
  * One shuffle, no join explosion, skew-bounded by key cardinality —
  * this is how as-of joins scale to 100 TB. (Preference order per the
  * build brief: composing built-ins beats a custom SparkPlan when the
  * semantics fit exactly.)
  */
object AsOfJoin {

  /** @param right must be unique per (key, time) — pre-aggregate ties
    *              or results are pick-arbitrary (as in any engine). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column): DataFrame = {
    val leftCols = left.columns
    val rightCols = right.columns
    val l = left.select(
      leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(right.schema).as("_r"))
    val r = right.select(
      rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
      lit(null).cast(left.schema).as("_l"),
      struct(rightCols.map(col): _*).as("_r"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_l.*") +: rightCols.map(c => col(s"_match.$c")): _*)
  }

  /** The same as-of semantics through graft's native Catalyst operator
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]):
    * a streaming partition merge with O(1) per-key state instead of a
    * window buffer. Requires [[graft.plans.GraftExtensions]] on the
    * session (registered here imperatively, idempotent). Key/time
    * columns must be resolved against the inputs (use `df("col")`).
    *
    * @param tolerance max allowed `leftTime - rightTime` (same integral
    *                  unit as the time columns, epoch-µs by engine
    *                  convention); a match older than the bound emits
    *                  nulls like an unmatched row. */
  def asOfNative(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = left.sparkSession
    graft.plans.GraftExtensions.register(spark)
    // self-join lineage: if the two inputs share attribute exprIds the
    // combined output would be ambiguous and the exec would bind right
    // columns to left ordinals — re-alias the right side (fresh
    // exprIds), like DeduplicateRelations does for built-in joins.
    // Key/time columns must then be name-based (col("x")), which the
    // analyzer resolves against the re-aliased plan.
    val rightSafe =
      if (right.queryExecution.analyzed.outputSet
        .intersect(left.queryExecution.analyzed.outputSet).isEmpty) right
      else right.select(right.columns.map(c => col(c).as(c)): _*)
    // resolve each column against its own input through the analyzer
    // (a raw Column carries an opaque ColumnNode that the generic
    // resolver won't look inside)
    def exprOn(df: DataFrame, c: Column) =
      df.select(c).queryExecution.analyzed match {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.head match {
            case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
            case e => e
          }
        case other => other.output.head
      }
    Bridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      left.queryExecution.analyzed,
      rightSafe.queryExecution.analyzed,
      Seq(exprOn(left, leftKey)),
      Seq(exprOn(rightSafe, rightKey)),
      exprOn(left, leftTime),
      exprOn(rightSafe, rightTime),
      tolerance))
  }
}
