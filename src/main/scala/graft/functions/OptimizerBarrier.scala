package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that stops the optimizer from duplicating an
  * expensive expression.
  *
  * Why: Catalyst's `PushDownPredicates` substitutes a projected alias
  * into every predicate that references it, and whole-stage codegen's
  * subexpression elimination only dedupes within a single operator. A
  * filter `a IS NOT NULL AND b IS NOT NULL` over a projected
  * `from_json(...)` chain therefore evaluates the whole chain once per
  * conjunct plus once in the project (3x per row in the reference
  * decode pipelines — measured, not hypothetical).
  *
  * Marking the wrapper non-deterministic makes both rules keep their
  * hands off — `PushPredicateThroughNonJoin` only pushes through
  * all-deterministic projections, and `CollapseProject` never inlines
  * non-deterministic output — so the wrapped expression is evaluated
  * exactly once per row, in its own projection. Evaluation and codegen
  * are pure pass-through: output bytes are identical with or without
  * the wrapper; only the plan shape changes.
  *
  * Trade-off (documented, deliberate): the barrier also blocks
  * `OptimizeJsonExprs` schema pruning through it, so the wrapped
  * `from_json` parses its full declared schema. For the reference
  * pipelines that is a handful of short fields — parsing them once
  * beats parsing a pruned schema three times.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  // the whole point: look opaque to PushDownPredicates/CollapseProject
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OptimizerBarrier {
  /** Column-level entry point: evaluate `c` exactly once per row.
    *
    * BLAST RADIUS (wider than the schema-pruning note above): because
    * the wrapper reads as non-deterministic, `PushPredicateThroughNonJoin`
    * refuses to push ANY predicate through a projection containing it —
    * including filters on unrelated columns composed downstream — so
    * scan-level pushdown (parquet PushedFilters, partition pruning)
    * stops at the barrier for everything built on top of the wrapped
    * projection. Use it on terminal/near-terminal projections (the ref
    * decode chains, a row-local kernel feeding only its own null
    * filter), NOT under further filtering layers you want pushed to
    * the scan. If Spark's `With`/`CommonExpressionRef` CSE form ever
    * gets a stable public constructor, that is the surgical
    * replacement: the optimizer would dedupe the expression instead of
    * being fenced out. */
  def evalOnce(c: Column): Column =
    Bridge.column(OptimizerBarrier(Bridge.expression(c)))
}
