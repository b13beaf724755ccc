package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: intersection of two SORTED-ascending
  * `array<long>` (or `array<int>`) columns by two-pointer merge, with
  * whole-stage codegen.
  *
  * Why a custom Expression (SURVEY.md §7.4 "custom only-if-needed"):
  * `array_intersect` is input-order-agnostic, so it builds a hash set
  * per call — per-row allocation and hashing that dominates the
  * triangle-closure kernel, where one intersection runs per oriented
  * edge over the whole graph ([[graft.operators.Graph.trianglePlan]]).
  * When both sides are already sorted (the adjacency lists are built
  * with `sort_array`), a two-pointer merge does it allocation-free in
  * O(|a| + |b|).
  *
  * PRECONDITION: both inputs sorted ascending with distinct elements —
  * then the result is bit-identical to `array_intersect` (which keeps
  * left-side order = ascending; pinned by spec). Unsorted input gives
  * an arbitrary subset of the true intersection, NOT an error — this
  * kernel trades the check for speed, callers own the invariant.
  *
  * Nulls: null input array → null (BinaryExpression default); null
  * ELEMENTS are not expected (adjacency lists never hold them) and
  * read as 0 via ArrayData.getLong, same as Spark's primitive
  * accessors everywhere. */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect expects (array<bigint>, array<bigint>) or " +
          s"(array<int>, array<int>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  private def isInt: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def dataType: DataType =
    ArrayType(if (isInt) IntegerType else LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    if (isInt) {
      val buf = new Array[Int](math.min(nx, ny))
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        val xi = x.getInt(i)
        val yj = y.getInt(j)
        if (xi == yj) { buf(c) = xi; c += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(java.util.Arrays.copyOf(buf, c))
    } else {
      val buf = new Array[Long](math.min(nx, ny))
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        val xi = x.getLong(i)
        val yj = y.getLong(j)
        if (xi == yj) { buf(c) = xi; c += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(java.util.Arrays.copyOf(buf, c))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nx = ctx.freshName("nx")
    val ny = ctx.freshName("ny")
    val buf = ctx.freshName("buf")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val xi = ctx.freshName("xi")
    val yj = ctx.freshName("yj")
    val (jt, get) = if (isInt) ("int", "getInt") else ("long", "getLong")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |$jt[] $buf = new $jt[java.lang.Math.min($nx, $ny)];
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  $jt $xi = $a.$get($i);
         |  $jt $yj = $b.$get($j);
         |  if ($xi == $yj) { $buf[$c++] = $xi; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $c));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  /** Column-level entry point: sorted_intersect(a, b). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedIntersect(Bridge.expression(a), Bridge.expression(b)))
}
