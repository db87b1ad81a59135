package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional data skipping.
  *
  * Parquet scans prune row groups and files from column min/max
  * statistics, but a layout sorted on ONE column only tightens that
  * column's ranges — a predicate on any other dimension still reads
  * everything. Interleaving the bits of two (or more) quantized columns
  * and range-partition-sorting on the interleaved key tightens the
  * per-file ranges of EVERY participating column at once, so a box
  * predicate `x BETWEEN .. AND y BETWEEN ..` skips on both dims. This is
  * the standard lakehouse layout technique (Delta/Iceberg `ZORDER BY` /
  * sort orders) re-expressed as plain DataFrame ops: a codegen-friendly
  * unrolled shift/mask expression, `repartitionByRange` on the key, and
  * `sortWithinPartitions` — no custom writer needed.
  *
  * At 100 TB the win is structural: skipped bytes never reach an
  * executor, so a 1% box over two z-ordered dims reads O(sqrt) of what
  * either single-sorted layout reads (measured in BASELINE.md round 8).
  */
object ZOrder {

  /** Morton key of two non-negative integer columns, `bits` bits each —
    * x occupies the odd bit positions (high), y the even. Pure unrolled
    * shift/mask column arithmetic: whole-stage codegen on the Spark side,
    * the identical expression in ANSI SQL for the oracle twin. */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }
    terms.reduce(_ + _)
  }

  /** The same Morton key as ANSI/DuckDB SQL text over expressions
    * `xe`/`ye` — exact integer arithmetic, so oracle rows hash-match. */
  def duckdbZExpr(xe: String, ye: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($xe >> $i) & 1) << ${2 * i + 1})",
          s"((($ye >> $i) & 1) << ${2 * i})")
    }.mkString(" + ")

  /** Min-max quantization of a numeric column onto `[0, 2^bits)`.
    * Constant-range degenerate case maps everything to 0. */
  private def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val levels = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(lit(levels),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(levels + 1)).cast("long"))
  }

  /** Writes `df` to parquet z-ordered on `(cx, cy)`: one stats pass for
    * the min/max quantization bounds, then `repartitionByRange` on the
    * Morton key (range exchange = each output file owns a contiguous
    * z-range) + `sortWithinPartitions`. The key column is dropped before
    * the write — the layout lives in row order and file stats, not the
    * schema. Returns the quantization bounds for reuse on later appends
    * (quantizing appended data with the SAME bounds keeps file z-ranges
    * comparable across batches). */
  def writeZOrdered(df: DataFrame, cx: String, cy: String, path: String,
      numFiles: Int, bits: Int = 16,
      bounds: Option[(Double, Double, Double, Double)] = None):
      (Double, Double, Double, Double) = {
    val (xlo, xhi, ylo, yhi) = bounds.getOrElse {
      val r = df.agg(min(col(cx)).cast("double"), max(col(cx)).cast("double"),
        min(col(cy)).cast("double"), max(col(cy)).cast("double")).first()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val z = zvalue(quantize(col(cx), xlo, xhi, bits),
      quantize(col(cy), ylo, yhi, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    (xlo, xhi, ylo, yhi)
  }
}
