package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression computing ALL banded random-hyperplane
  * LSH signatures of an `array<float>` vector in one fused loop:
  * `bands` longs, each packing `planesPerBand` sign bits.
  *
  * Why a custom Expression: the HOF formulation evaluates one
  * interpreted `aggregate(zip_with(...))` PER PLANE — for a 32×2
  * banding that is 64 interpreted array traversals and ~192 lambda
  * invocations per row, which dominated the near-dup operator's
  * runtime. Here the projections are a planes×dim literal weight
  * matrix walked in generated Java.
  *
  * Bit-parity with [[VectorFunctions.hyperplaneBandSignatures]] (the
  * HOF reference form, kept for the parity spec): same seed-42
  * gaussian stream, same float→double widening, same ascending-index
  * accumulation, same `proj >= 0` sign rule — signatures are
  * bit-identical, so bucket assignments (and therefore candidate
  * recall) do not change.
  */
case class HyperplaneBandSignature(
    child: Expression,
    planesPerBand: Int,
    bands: Int,
    dim: Int = 64)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_band_sig expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Flat row-major planes×dim weight matrix from the shared seed-42
    * gaussian stream (identical to VectorFunctions.signBits). */
  @transient private lazy val weights: Array[Double] = {
    val rnd = new scala.util.Random(42)
    Array.fill(planesPerBand * bands * dim)(rnd.nextGaussian())
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val sigs = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var p = 0
      while (p < planesPerBand) {
        val plane = b * planesPerBand + p
        var proj = 0.0
        var i = 0
        while (i < n) {
          proj += v.getFloat(i).toDouble * weights(plane * dim + i)
          i += 1
        }
        if (proj >= 0) sig |= (1L << p)
        p += 1
      }
      sigs(b) = sig
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("hyperplaneWeights", weights, "double[]")
    // fresh names for every local: generated blocks can be inlined
    // into scopes that already declare short identifiers
    val n = ctx.freshName("n")
    val sigs = ctx.freshName("sigs")
    val b = ctx.freshName("b")
    val sig = ctx.freshName("sig")
    val p = ctx.freshName("p")
    val plane = ctx.freshName("plane")
    val proj = ctx.freshName("proj")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $sigs = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $planesPerBand; $p++) {
         |    int $plane = $b * $planesPerBand + $p;
         |    double $proj = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $proj += ((double) $v.getFloat($i)) * $w[$plane * $dim + $i];
         |    }
         |    if ($proj >= 0) $sig |= (1L << $p);
         |  }
         |  $sigs[$b] = $sig;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBandSignature {
  def apply(v: Column, planesPerBand: Int, bands: Int, dim: Int): Column =
    Bridge.column(
      HyperplaneBandSignature(Bridge.expression(v), planesPerBand, bands, dim))
}
