package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{HnswParams, IvfHnsw}
import graft.operators.{KnnJoin, Recall}
import graft.sources.VectorSources
import graft.streaming.IncrementalIvfIndex

/** Epoch-handoff serving at scale: after a compaction, the corpus lives
  * in a batch model and a fresh maintainer holds only the vectors that
  * arrived since — [[IncrementalIvfIndex.knnJoinMerged]] serves both
  * sides. The spec pins merged ≡ exact at toy scale; this main measures
  * the SERVING COST of the epoch pattern at 1M: batch-only qps vs merged
  * qps over the same probe wave (the overhead is the live side's probe +
  * the max-score dedup window), plus recall vs the exact scan for both —
  * batch-only MISSES every post-compact vector by construction, merged
  * must not.
  *
  * `sbt "runMain graft.bench.EpochServingBenchMain 1000000 100000 64 32 10000"`
  */
object EpochServingBenchMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val tailN = if (args.length > 1) args(1).toLong else 100000L
    val dim = if (args.length > 2) args(2).toInt else 64
    val cells = if (args.length > 3) args(3).toInt else 32
    val probeN = if (args.length > 4) args(4).toInt else 10000
    val nprobe = if (args.length > 5) args(5).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = VectorSources.syntheticClustered(spark, n, dim,
        numClusters = 4 * cells, spread = 0.15, seed = 42)
      .select("vec_id", "embedding").cache()
    base.count()
    val histN = n - tailN
    val hist = base.filter(col("vec_id") < histN)
    val tail = base.filter(col("vec_id") >= histN)
    val params = HnswParams(m = 16, efConstruction = 200, efSearch = 100,
      numPartitions = cells)

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"EPOCH-SERVE $label wall=$s%.2fs")
      (r, s)
    }

    // the "compacted" epoch: batch model over history, live tail on top
    val (batchModel, _) = timed(s"fit hist n=$histN")(
      IvfHnsw.fit(hist, cells, params, balanceSlack = 0.2))
    val maint = IncrementalIvfIndex.fromModel(spark, batchModel)
    val (_, _) = timed(s"ingest tail n=$tailN")(maint.processBatch(tail, 0L))

    // probe wave drawn across the WHOLE corpus (old and new regions)
    val probes = base.sample(withReplacement = false, fraction =
        math.min(1.0, probeN * 1.2 / n.toDouble), seed = 7)
      .limit(probeN)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .cache()
    val np = probes.count()

    // JIT/cache warm-up on a small slice so qps compares steady state
    IvfHnsw.knnJoinBatched(batchModel, probes.limit(100), k = 10, nprobe).count()
    maint.knnJoinMerged(batchModel, probes.limit(100), k = 10, nprobe).count()

    val (batchRows, batchS) = timed(s"batch-only ${np}q nprobe=$nprobe")(
      IvfHnsw.knnJoinBatched(batchModel, probes, k = 10, nprobe).count())
    val (mergedRows, mergedS) = timed(s"merged ${np}q nprobe=$nprobe")(
      maint.knnJoinMerged(batchModel, probes, k = 10, nprobe).count())
    require(batchRows == np * 10 && mergedRows == np * 10,
      s"row counts off: $batchRows $mergedRows")

    // recall vs exact on a 100-probe subset: batch-only must miss the
    // tail region, merged must not
    val sub = probes.limit(100).cache(); sub.count()
    val exact = KnnJoin.exactKnnJoin(base, sub, k = 10)
    def rec(df: org.apache.spark.sql.DataFrame): Double =
      Recall.microAvgRecall(df, exact).select("recall").first().getDouble(0)
    val recBatch = rec(IvfHnsw.knnJoinBatched(batchModel, sub, k = 10, nprobe))
    val recMerged = rec(maint.knnJoinMerged(batchModel, sub, k = 10, nprobe))
    println(f"EPOCH-SERVE summary n=$n tail=$tailN probes=$np " +
      f"batch_qps=${np / batchS}%.0f merged_qps=${np / mergedS}%.0f " +
      f"overhead=${mergedS / batchS}%.2fx " +
      f"recall_batch=$recBatch%.4f recall_merged=$recMerged%.4f")
    maint.close()
    spark.stop()
  }
}
