package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{KnnJoin, Recall}
import graft.sources.VectorSources
import graft.streaming.IncrementalBqIndex

/** The federation overhead question: what does serving ONE query set
  * across TWO half-corpus indexes (independently trained quantizers)
  * cost versus one index over the whole corpus — wall and recall, same
  * nprobe/rerank per member. The interesting property: each member
  * probes nprobe of ITS OWN C cells, so the federation scans
  * paths×nprobe cells of half size ≈ the single index's bytes; overhead
  * is the extra probe routing + the merge window. Recall can move
  * either way (two quantizers partition their halves better than one
  * shared geometry — or worse on a corpus one geometry fits).
  *
  * `sbt "runMain graft.bench.FedServingBenchMain 1000000 64 200"`
  */
object FedServingBenchMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val cells = if (args.length > 1) args(1).toInt else 64
    val nq = if (args.length > 2) args(2).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "48g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("fedbench").toString
    val base = VectorSources.syntheticClustered(spark, n, 64,
        numClusters = 256, spread = 0.15)
      .select("vec_id", "embedding").persist()
    base.count()
    val queries = base.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .persist()
    queries.count()

    val half = n / 2
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, bSingle) = timed(IncrementalBqIndex.build(
      base, s"$root/single", numCells = cells))
    val (_, bA) = timed(IncrementalBqIndex.build(
      base.filter(col("vec_id") < half), s"$root/a", numCells = cells / 2))
    val (_, bB) = timed(IncrementalBqIndex.build(
      base.filter(col("vec_id") >= half), s"$root/b", numCells = cells / 2))
    println(f"[fed-bench] n=$n builds: single=${bSingle}%.1fs " +
      f"halves=${bA}%.1f+${bB}%.1fs (C=$cells vs 2x${cells / 2})")

    val exact = KnnJoin.exactKnnJoin(base, queries, k = 10).persist()
    exact.count()

    // MATCHED TOTAL BUDGETS: a federation of m members each probing
    // nprobe of C/m cells with rerank r scans the same corpus fraction
    // and reranks the same candidate mass as a single index probing
    // m*nprobe of C cells with rerank m*r — compare THOSE, or the
    // federation silently gets m× the budget
    for ((np, rr) <- Seq((2, 500), (4, 1000))) {
      def singleRun() = IncrementalBqIndex.knnJoin(spark, s"$root/single",
        queries, k = 10, nprobe = 2 * np, rerank = 2 * rr)
      def fedRun() = IncrementalBqIndex.knnJoinFederated(spark,
        Seq(s"$root/a", s"$root/b"), queries,
        k = 10, nprobe = np, rerank = rr)
      val (sRows, sWall) = timed { singleRun().persist().count() }
      val sRec = Recall.microAvgRecall(singleRun(), exact)
        .select("recall").first().getDouble(0)
      val (fRows, fWall) = timed { fedRun().persist().count() }
      val fRec = Recall.microAvgRecall(fedRun(), exact)
        .select("recall").first().getDouble(0)
      println(f"[fed-bench] budget(np=${2 * np},rr=${2 * rr}) single: " +
        f"wall=$sWall%6.1fs recall=$sRec%.3f rows=$sRows | " +
        f"federated(2x np=$np,rr=$rr): wall=$fWall%6.1fs " +
        f"recall=$fRec%.3f rows=$fRows overhead=${fWall / sWall}%.2fx")
    }
    spark.stop()
  }
}
