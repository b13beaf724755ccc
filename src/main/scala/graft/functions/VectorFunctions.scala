package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * higher-order functions (`zip_with` / `aggregate`) so the arithmetic
  * is (a) fully distributed, (b) bit-deterministic: elements are
  * widened float→double and accumulated strictly left-to-right, which
  * lets the DuckDB oracle reproduce results exactly with the same
  * sequential reduction.
  */
object VectorFunctions {

  /** Cast an array<float> to array<double> (exact widening). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-to-right sum of an array<double>. */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(asDouble(a), asDouble(b), (x, y) => x * y))

  def norm(a: Column): Column =
    sqrt(arraySum(transform(asDouble(a), x => x * x)))

  /** Interpreted (higher-order-function) cosine — kept as the
    * reference formulation; bit-identical to [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity via the native codegen'd Catalyst expression
    * (one fused loop per row; same left-to-right double accumulation
    * as the HOF form and the DuckDB oracle — bit-identical). */
  def cosine(a: Column, b: Column): Column = CosineSimilarity(a, b)

  /** Random-hyperplane (SimHash-for-vectors) LSH signature: `planes`
    * fixed pseudo-random gaussian hyperplanes (seeded, embedded as
    * literal arrays so the projections are pure codegen'd arithmetic —
    * no hashing in the hot loop), each contributing one sign bit.
    * Vectors with high cosine similarity collide in signature buckets
    * with high probability — the scale path for ANN at 100 TB (bucket
    * join instead of an all-pairs cross join).
    */
  def hyperplaneSignature(v: Column, planes: Int, dim: Int = 64): Column =
    element_at(HyperplaneBandSignature(v, planesPerBand = planes, bands = 1, dim = dim), 1)

  /** LSH *banding* over hyperplane sign bits: `bands` signatures per
    * vector, each packing `planesPerBand` bits, all planes drawn
    * band-major from one seeded gaussian stream. Two vectors at angle
    * θ share a given band's bucket with probability (1−θ/π)^planesPerBand,
    * and miss EVERY band with ((1−(1−θ/π)^planesPerBand))^bands — the
    * recall knob for near-dup candidate generation: more bands → higher
    * recall, more planes per band → smaller buckets. Returned as
    * array<long> indexed by band (posexplode to (band, signature)).
    *
    * Computed by the codegen'd [[HyperplaneBandSignature]] expression
    * (one fused loop); [[hyperplaneBandSignaturesHof]] is the
    * interpreted reference formulation, bit-identical by construction
    * and pinned by a parity spec. */
  def hyperplaneBandSignatures(
      v: Column, planesPerBand: Int, bands: Int, dim: Int = 64): Column =
    HyperplaneBandSignature(v, planesPerBand, bands, dim)

  /** HOF reference form of [[hyperplaneBandSignatures]] (interpreted;
    * one aggregate(zip_with(...)) per plane — slow, kept for parity
    * testing only). */
  def hyperplaneBandSignaturesHof(
      v: Column, planesPerBand: Int, bands: Int, dim: Int = 64): Column = {
    val bits = signBits(v, planesPerBand * bands, dim)
    array((0 until bands).map { b =>
      packSignBits(bits.slice(b * planesPerBand, (b + 1) * planesPerBand))
    }: _*)
  }

  /** One sign bit per seeded gaussian hyperplane (seed 42, shared by
    * the single-signature and banded forms so buckets are comparable
    * across operators). Projections are literal-weight arithmetic —
    * pure codegen'd expressions, no hashing in the hot loop. */
  private def signBits(v: Column, planes: Int, dim: Int): Seq[Column] = {
    val rnd = new scala.util.Random(42)
    val weights = Seq.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
    weights.map { w =>
      val wLit = array(w.map(x => lit(x)): _*)
      val proj = aggregate(
        zip_with(asDouble(v), wLit, (x, y) => x * y),
        lit(0.0),
        // vectors shorter than `dim` zip against trailing weights as
        // null products — treat those as zero contribution
        (acc, x) => acc + coalesce(x, lit(0.0)))
      when(proj >= 0, lit(1L)).otherwise(lit(0L))
    }
  }

  private def packSignBits(bits: Seq[Column]): Column =
    bits.zipWithIndex
      .map { case (b, i) => b * (1L << i) }
      .reduce(_ + _)
}
