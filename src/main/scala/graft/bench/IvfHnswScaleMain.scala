package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{HnswIndexer, HnswParams, IvfHnsw}
import graft.operators.{KnnJoin, Recall}
import graft.sources.VectorSources

/** Scale A/B for the hybrid index: shard-and-search HNSW (every query
  * searches every shard) vs IVF→HNSW cell routing (every query searches
  * `nprobe` of C cells) on the same synthetic corpus and shard count
  * (`sbt "runMain graft.bench.IvfHnswScaleMain 1000000 64 32 2,4,8,32"`).
  * The headline number is search wall vs corpus fraction touched — the
  * sublinearity BASELINE.md records. */
object IvfHnswScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val cells = if (args.length > 2) args(2).toInt else 32
    val nprobes: Seq[Int] =
      if (args.length > 3) args(3).split(",").map(_.trim.toInt).toSeq
      else Seq(2, 4, 8, cells)
    val slack = if (args.length > 4) args(4).toDouble else 0.0
    // "uniform" (adversarial: neighbor structure is centroid-free) or
    // "clustered" (mixture-of-Gaussians — the corpus shape IVF routing
    // serves; BASELINE.md carries both tables)
    val corpus = if (args.length > 5) args(5) else "uniform"
    // "noplain" skips the shard-and-search control (10M runs: the plain
    // build is already anchored by ScaleBenchMain/BASELINE tables)
    val skipPlain = args.length > 6 && args(6) == "noplain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = (corpus match {
      case "clustered" => VectorSources
        .syntheticClustered(spark, n, dim, numClusters = 4 * cells, spread = 0.15,
          seed = 42)
        .select("vec_id", "embedding")
      case _ => VectorSources.synthetic(spark, n, dim, seed = 42)
    }).cache()
    base.count()
    val queries = base.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .cache()
    queries.count()
    val params = HnswParams(m = 16, efConstruction = 200, efSearch = 100,
      numPartitions = cells)

    val exact = KnnJoin.exactKnnJoin(base, queries, k = 10).cache()
    exact.count()

    // baseline: shard-and-search over `cells` hash shards
    if (!skipPlain) {
      val t0 = System.nanoTime()
      val plain = HnswIndexer.fit(base, params)
      plain.graph.count()
      val plainBuildS = (System.nanoTime() - t0) / 1e9
      // warm the sub-index cache, then measure
      plain.knnJoin(queries.limit(1), k = 10).count()
      val t1 = System.nanoTime()
      val plainRes = plain.knnJoin(queries, k = 10).cache()
      plainRes.count()
      val plainSearchS = (System.nanoTime() - t1) / 1e9
      val plainRecall = Recall.microAvgRecall(plainRes, exact)
        .select("recall").first().getDouble(0)
      println(f"IVFHNSW-AB corpus=$corpus n=$n P=$cells plain build=${plainBuildS}%.1fs " +
        f"search100=${plainSearchS}%.2fs recall@10=$plainRecall%.4f (touches 100%% of shards)")
      plainRes.unpersist()
      plain.unpersist()
    }

    // hybrid: same shard count, cell-routed
    val t2 = System.nanoTime()
    val hybrid = IvfHnsw.fit(base, cells, params, balanceSlack = slack)
    val hybridBuildS = (System.nanoTime() - t2) / 1e9
    hybrid.hnsw.knnJoin(queries.limit(1), k = 10).count() // warm cache
    nprobes.foreach { np =>
      val t3 = System.nanoTime()
      val res = IvfHnsw.knnJoin(hybrid, queries, k = 10, nprobe = np).cache()
      res.count()
      val searchS = (System.nanoTime() - t3) / 1e9
      val recall = Recall.microAvgRecall(res, exact)
        .select("recall").first().getDouble(0)
      res.unpersist()
      println(f"IVFHNSW-AB corpus=$corpus n=$n C=$cells slack=$slack " +
        f"build=${hybridBuildS}%.1fs nprobe=$np search100=${searchS}%.2fs " +
        f"recall@10=$recall%.4f (touches ${100.0 * np / cells}%.0f%% of cells)")
    }
    spark.stop()
  }
}
