package graft.bench

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Data-skipping measurement for the z-order layout (round 8): writes
  * lineitem three ways — as-is, linearly sorted on l_partkey, z-ordered
  * on (l_partkey, l_suppkey) — then runs the same three selective
  * predicates against each and reports BYTES ACTUALLY READ (task
  * inputMetrics, which see parquet row-group pruning) plus wall and row
  * counts.
  *
  * The claim under test is the 100 TB one: a single-sorted layout only
  * skips on its own column; the z-order layout skips on BOTH dims at
  * once, at a modest penalty on the x-only predicate (curve seams). The
  * row counts double as the correctness check — every layout must return
  * identical rows for identical predicates.
  *
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.bench.ZOrderBenchMain"`
  */
object ZOrderBenchMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val numFiles = if (args.length > 0) args(0).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // one file = one row group = the skipping granule; keep Spark from
      // fusing many small files into one partition-read for the test
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bytesRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice")
    val (pLo, pHi, sLo, sHi) = {
      val r = li.agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).first()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // ~10%-of-range box on each dim
    def box(lo: Long, hi: Long): (Long, Long) = {
      val w = (hi - lo) / 10
      (lo + 4 * w, lo + 5 * w)
    }
    val (pa, pb) = box(pLo, pHi)
    val (sa, sb) = box(sLo, sHi)

    val base = "/tmp/graft-zorder-bench"
    li.repartition(numFiles).write.mode("overwrite").parquet(s"$base/asis")
    li.repartitionByRange(numFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$base/linear")
    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", s"$base/zorder",
      numFiles = numFiles, bits = 16)

    val preds = Seq(
      "x_only" -> (col("l_partkey").between(pa, pb)),
      "y_only" -> (col("l_suppkey").between(sa, sb)),
      "xy_box" -> (col("l_partkey").between(pa, pb) &&
        col("l_suppkey").between(sa, sb)))

    // warm the FS cache uniformly so bytesRead differences are pruning,
    // not cache state
    Seq("asis", "linear", "zorder").foreach { l =>
      spark.read.parquet(s"$base/$l").count()
    }

    println(f"${"layout"}%-8s ${"pred"}%-8s ${"rows"}%10s ${"MB_read"}%10s ${"sec"}%8s")
    val lines = for {
      layout <- Seq("asis", "linear", "zorder")
      (pname, pred) <- preds
    } yield {
      val df = spark.read.parquet(s"$base/$layout").filter(pred)
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain async; settle before reading the counter
      Thread.sleep(300)
      val mb = bytesRead.get() / 1e6
      val line = f"$layout%-8s $pname%-8s $n%10d $mb%10.1f $sec%8.2f"
      println(line)
      (layout, pname, n, mb, sec)
    }
    // correctness: identical rows per predicate across layouts
    val byPred = lines.groupBy(_._2).map { case (p, ls) => p -> ls.map(_._3).toSet }
    require(byPred.values.forall(_.size == 1),
      s"layouts disagree on predicate rows: $byPred")
    println("[zorder-bench] row counts identical across layouts: " +
      byPred.map { case (p, ns) => s"$p=${ns.head}" }.mkString(", "))
    spark.stop()
  }
}
