package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  test("zvalue known answers: bit interleave with x in the odd positions") {
    // x=3 (11), y=1 (01), bits=2: z = x1 y1 x0 y0 = 1 0 1 1 = 11
    val got = Seq((3, 1), (0, 0), (1, 0), (0, 1), (2, 3))
      .toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y"), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (2,3): x1 y1 x0 y0 = 1 1 0 1 = 13
    assert(got == Seq(11L, 0L, 2L, 1L, 13L))
  }

  test("zvalue is a bijection on the quantized grid") {
    val n = 32 // full 5-bit grid
    val grid = spark.range(0, n.toLong * n)
      .select((col("id") / n).cast("long").as("x"), (col("id") % n).as("y"))
    val d = grid.select(ZOrder.zvalue(col("x"), col("y"), bits = 5).as("z"))
      .distinct().count()
    assert(d == n.toLong * n)
  }

  test("zvalue stays inside whole-stage codegen") {
    val plan = spark.range(100)
      .select(ZOrder.zvalue(col("id"), col("id") + 1, bits = 16).as("z"))
      .queryExecution.executedPlan.toString
    // the "*(1)" star prefix marks the Project as inside a
    // WholeStageCodegen span in executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("z-ordered layout tightens per-file ranges of BOTH dims; a linear " +
      "sort tightens only its own") {
    val n = 1 << 14 // 128x128 uniform grid, 16k rows
    val grid = spark.range(0, n)
      .select((col("id") / 128).cast("long").as("x"), (col("id") % 128).as("y"))
    val base = "/tmp/graft-zorder-spec"
    ZOrder.writeZOrdered(grid, "x", "y", s"$base/z", numFiles = 16, bits = 7)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/linear")

    def meanSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("s"))
        .collect().map(_.getLong(1).toDouble)
      spans.sum / spans.length
    }
    // rows survive the layout intact
    assert(spark.read.parquet(s"$base/z").count() == n)
    // linear-on-x: x spans collapse (~128/16), y spans stay full (~127)
    assert(meanSpan(s"$base/linear", "x") < 20.0)
    assert(meanSpan(s"$base/linear", "y") > 100.0)
    // z-order: BOTH spans shrink well below the full 127 range — each of
    // the 16 files covers a contiguous z-range = a small cluster of the
    // 2-d grid (~1/16 of the area => ~1/4 of each side, plus curve seams)
    assert(meanSpan(s"$base/z", "x") < 80.0, s"x span ${meanSpan(s"$base/z", "x")}")
    assert(meanSpan(s"$base/z", "y") < 80.0, s"y span ${meanSpan(s"$base/z", "y")}")
  }
}
