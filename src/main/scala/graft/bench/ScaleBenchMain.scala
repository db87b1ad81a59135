package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{BuildProgress, HnswIndexer, HnswParams}
import graft.operators.{KnnJoin, Recall}
import graft.sources.VectorSources

/** Scale stress for the distributed index: build + query on a seeded
  * synthetic corpus far larger than the provisioned embeddings table
  * (`sbt "runMain graft.bench.ScaleBenchMain 100000 64 32 50,100,300"`).
  * One build, then the recall/latency curve over the efSearch list vs the
  * exact oracle on a query sample — the measured basis for BASELINE.md's
  * scale table and the SURVEY §7.4 P-sizing rule. */
object ScaleBenchMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val parts = if (args.length > 2) args(2).toInt else 32
    val efs: Seq[Int] =
      if (args.length > 3) args(3).split(",").map(_.trim.toInt).toSeq else Seq(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = VectorSources.synthetic(spark, n, dim, seed = 42).cache()
    base.count()
    val queries = base.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .cache()
    queries.count()

    val bp = BuildProgress.register(spark)
    val t0 = System.nanoTime()
    val model = HnswIndexer.fit(base, HnswParams(m = 16, efConstruction = 200,
      numPartitions = parts), progress = Some(bp))
    model.graph.count()
    val buildS = (System.nanoTime() - t0) / 1e9
    println(f"SCALE n=$n d=$dim P=$parts build=${buildS}%.1fs " +
      f"(${n / buildS}%.0f vec/s, progress acc=${bp.rows.value})")

    val t2 = System.nanoTime()
    val exact = KnnJoin.exactKnnJoin(base, queries, k = 10).cache()
    exact.count()
    val exactS = (System.nanoTime() - t2) / 1e9

    efs.foreach { ef =>
      val t1 = System.nanoTime()
      val approx = model.knnJoin(queries, k = 10, Some(ef)).cache()
      approx.count()
      val searchS = (System.nanoTime() - t1) / 1e9
      val recall = Recall.microAvgRecall(approx, exact)
        .select("recall").first().getDouble(0)
      approx.unpersist()
      println(f"SCALE n=$n d=$dim P=$parts ef=$ef search100=${searchS}%.2fs " +
        f"exact100=${exactS}%.2fs speedup=${exactS / searchS}%.1fx recall@10=$recall%.4f")
    }
    spark.stop()
  }
}
