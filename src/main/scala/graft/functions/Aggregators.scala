package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (`Aggregator[IN, BUF, OUT]`) — the
  * user-facing custom-aggregation API (SURVEY.md §7.4). Both are
  * mergeable (associative buffers), so Spark plans them as partial +
  * final aggregation with map-side combine, exactly like built-ins.
  */
object Aggregators {

  /** Geometric mean via mean-of-logs: exp(Σ ln x / n). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Fixed-width histogram: values bucketed into `bins` buckets of
    * `width` starting at `lo`; overflow clamps to the last bucket.
    * Buffer is a plain long array — integer counts merge exactly, so
    * the result is bit-deterministic regardless of partitioning (the
    * property that lets a DuckDB oracle verify a custom aggregate). */
  class Histogram(lo: Double, width: Double, bins: Int)
      extends Aggregator[Double, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](bins)
    override def reduce(b: Array[Long], x: Double): Array[Long] = {
      val i = math.min(math.max(((x - lo) / width).toInt, 0), bins - 1)
      b(i) += 1
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < bins) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
