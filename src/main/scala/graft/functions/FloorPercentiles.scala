package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact nearest-rank-floor percentile aggregate — B8 semantics
  * (`sorted[⌊p·(n−1)⌋]`, reference src/bench/metrics.ts:51-57).
  *
  * Spark's built-in `percentile` interpolates between ranks, so its output
  * can never hash-match the reference summary; this Aggregator implements
  * the floor-index method exactly, with map-side partial aggregation
  * (buffers merge associatively; the sort happens once in `finish`).
  * Memory note: exact percentiles inherently hold each group's values —
  * size groups accordingly or use approx_percentile at extreme scale.
  */
class FloorPercentiles(ps: Seq[Double])
    extends Aggregator[Double, ArrayBuffer[Double], Seq[Double]] {
  override def zero: ArrayBuffer[Double] = ArrayBuffer.empty
  override def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = {
    b += a; b
  }
  override def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    b1 ++= b2; b1
  }
  override def finish(b: ArrayBuffer[Double]): Seq[Double] = {
    if (b.isEmpty) ps.map(_ => Double.NaN)
    else {
      val sorted = b.toArray.sorted
      ps.map(p => sorted(math.floor(p * (sorted.length - 1)).toInt))
    }
  }
  override def bufferEncoder: Encoder[ArrayBuffer[Double]] =
    Encoders.kryo[ArrayBuffer[Double]]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object FloorPercentiles {
  /** Column form: floor_percentiles(value, Seq(0.5, 0.9, ...)) →
    * array<double> of the exact nearest-rank-floor percentiles. */
  def floor_percentiles(value: Column, ps: Seq[Double]): Column =
    udaf(new FloorPercentiles(ps)).apply(value)
}
