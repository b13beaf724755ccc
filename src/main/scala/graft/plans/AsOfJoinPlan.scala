package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator Catalyst integration for the as-of join (the (c)
  * tier of the build brief's preference order): a first-class
  * `LogicalPlan` node, a `SparkStrategy` that plans it, and a
  * `SparkPlan` that executes a streaming merge.
  *
  * The default engine path ([[graft.operators.AsOfJoin.asOf]]) composes
  * built-ins (union + ordered window); this native operator exists
  * behind `GraftExtensions` to demonstrate — and benchmark — the full
  * Catalyst range. Same semantics, different physical shape:
  *
  *  - EnsureRequirements satisfies `ClusteredDistribution` on the keys
  *    for both children (one co-partitioning shuffle each, exactly like
  *    a sort-merge join) and sorts each child by (key, time);
  *  - the exec then zips partitions and streams a single forward merge:
  *    O(1) state per key (the latest eligible right row), no window
  *    buffer, no struct-packing of whole rows — strictly less memory
  *    than the window formulation, and the same one-shuffle scale
  *    story at 100 TB.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long] = None)
  extends BinaryNode {

  // built-in joins get ImplicitTypeCasts from the analyzer; this
  // custom node must enforce type agreement itself — the merge exec
  // builds its orderings from LEFT-side types and would silently
  // mis-read mismatched right-side rows
  require(leftKeys.length == rightKeys.length,
    s"as-of join: ${leftKeys.length} left keys vs ${rightKeys.length} right keys")
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(org.apache.spark.sql.types.DataType.equalsStructurally(l.dataType, r.dataType, ignoreNullability = true),
      s"as-of join key type mismatch: ${l.dataType.simpleString} vs ${r.dataType.simpleString}")
  }
  require(org.apache.spark.sql.types.DataType.equalsStructurally(leftTime.dataType, rightTime.dataType, ignoreNullability = true),
    s"as-of join time type mismatch: ${leftTime.dataType.simpleString} vs " +
      rightTime.dataType.simpleString)
  // the tolerance bound subtracts times, which is only defined for an
  // integral time axis (the engine's convention is epoch-µs longs)
  require(tolerance.isEmpty ||
      leftTime.dataType == org.apache.spark.sql.types.LongType,
    s"as-of tolerance requires a bigint time axis, got ${leftTime.dataType.simpleString}")
  require(tolerance.forall(_ >= 0), s"negative as-of tolerance: $tolerance")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (or imperatively
  * through `GraftExtensions.register`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

/** Streaming-merge as-of join: children arrive co-partitioned by key
  * and sorted by (key, time); each partition pair merges in one
  * forward pass, carrying only the latest time-eligible right row.
  *
  * Left-outer semantics: unmatched left rows emit nulls for the right
  * side. Null keys group together (same as the window formulation's
  * partitionBy). Null times follow ascending-nulls-first sort order:
  * a null-time right row is eligible for every same-key left row.
  *
  * `tolerance` (epoch-µs bound, the financial-data as-of variant):
  * the carried match is the LATEST eligible right row, so if its gap
  * exceeds the bound every earlier row's does too — rejection is one
  * comparison at emit time, state stays O(1), and the merge itself is
  * unchanged. A match whose gap is undefined (either time null) is
  * out of tolerance, mirroring SQL's `t_l - t_r <= tol` three-valued
  * logic. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // rows leave the merge in the left child's (key, time) order
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val outAttrs = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatched")
    val tol = tolerance

    val lRdd = left.execute()
    val rRdd = right.execute()
    // The merge pairs partitions positionally, which is only sound if
    // both children arrive hash-partitioned on the keys into the SAME
    // partition count. EnsureRequirements co-partitions multi-child
    // clustered distributions and AQE coalesces sibling shuffles in
    // lockstep (and OptimizeSkewedJoin only rewrites SMJ/SHJ, so it
    // can never split one side of this node) — but ClusteredDistribution
    // does not *guarantee* equal counts, so fail loudly rather than
    // let zipPartitions throw its cryptic error or, worse, mis-pair.
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec children arrived with mismatched partition counts " +
        s"(left=${lRdd.getNumPartitions}, right=${rRdd.getNumPartitions}); " +
        "the streaming merge zips partitions pairwise and requires " +
        "identical hash co-partitioning on the join keys")

    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeBound = BindReferences.bindReference(lTimeExpr, lOut)
      val rTimeBound = BindReferences.bindReference(rTimeExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd =
        TypeUtils.getInterpretedOrdering(timeType).asInstanceOf[Ordering[Any]]
      // bind against a NULLABLE view of the right side: otherwise the
      // projection reads primitives without a null check and unmatched
      // rows surface as 0 instead of null
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // lookahead right row (projection buffers are reused → copy)
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: Any = _
        // latest right row consumed for its key (candidate match)
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        private var matchTime: Any = _
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next().copy()
            rKey = rKeyProj(rRow).copy()
            rTime = rTimeBound.eval(rRow)
          } else { rRow = null; rKey = null; rTime = null }

        // right sorts at-or-before the left timestamp (ascending sort
        // puts nulls first, so a null right time is always eligible)
        private def eligible(rt: Any, lt: Any): Boolean =
          rt == null || (lt != null && timeOrd.lteq(rt, lt))

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeBound.eval(l)
          var c = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
          while (rRow != null && (c < 0 || (c == 0 && eligible(rTime, lTime)))) {
            if (c == 0) { matchRow = rRow; matchKey = rKey; matchTime = rTime }
            advanceRight()
            c = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
          }
          // the carried match is the latest eligible row, so a gap
          // check on it alone implements the tolerance exactly
          val matched = matchKey != null && keyOrd.compare(matchKey, lKey) == 0 &&
            (tol match {
              case None => true
              case Some(t) => lTime != null && matchTime != null && {
                // eligibility guarantees matchTime <= lTime, so the true
                // gap is >= 0; a wrapped (negative) subtraction means the
                // gap exceeds Long.MaxValue — reject instead of letting
                // the overflowed value sneak under the bound
                val gap = lTime.asInstanceOf[Long] - matchTime.asInstanceOf[Long]
                gap >= 0 && gap <= t
              }
            })
          if (matched) matchedRows += 1
          outRows += 1
          resultProj(joined(l, if (matched) matchRow else nullRight))
        }
      }
    }
  }
}
