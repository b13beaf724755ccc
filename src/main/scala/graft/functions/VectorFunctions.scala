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

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane (SimHash-for-vectors) LSH signature: `planes`
    * pseudo-random hyperplanes derived deterministically from
    * xxhash64(plane, dim), each contributing one sign bit. Vectors with
    * high cosine similarity collide in signature buckets with high
    * probability — the scale path for ANN at 100 TB (bucket join
    * instead of an all-pairs cross join).
    */
  def hyperplaneSignature(v: Column, planes: Int): Column = {
    val d = asDouble(v)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      // deterministic pseudo-gaussian-ish weight in [-1, 1) per (plane, dim)
      val proj = aggregate(
        zip_with(d, sequence(lit(0), size(d) - 1), (x, i) => {
          val h = xxhash64(p, i)
          x * ((h % 1000L).cast("double") / 500.0 - 1.0)
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    })
    // pack bits into a long bucket id
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }
}
