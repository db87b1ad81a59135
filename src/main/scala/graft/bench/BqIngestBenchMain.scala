package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{KnnJoin, Recall}
import graft.sources.VectorSources
import graft.streaming.IncrementalBqIndex

/** Scale point for the storage-backed streaming BQ index: bootstrap on
  * `bootN` clustered vectors, append the rest in `epochs` equal
  * micro-batch-sized epochs under the FROZEN quantizer, measuring
  * per-epoch append wall (the durable-ingest rate), then serve 100
  * probes cold from parquet and score recall vs exact — before and
  * after a growth-scaled REFIT compaction (C × growth, the round-6
  * remedy for growth-driven recall decline).
  *
  * `dim`/`family` extend the point to embedding widths and the rabitq
  * code family — the rabitq append pays an O(d²) rotation per row, the
  * ingest-side cost of the estimator's serving wins (BASELINE round 10).
  *
  * `sbt "runMain graft.bench.BqIngestBenchMain [n] [bootN] [epochs] [C] [dim] [family]"`
  */
object BqIngestBenchMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val bootN = if (args.length > 1) args(1).toLong else 100000L
    val epochs = if (args.length > 2) args(2).toInt else 9
    val c = if (args.length > 3) args(3).toInt else 128
    val dim = if (args.length > 4) args(4).toInt else 64
    val family = if (args.length > 5) args(5) else "bq"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = VectorSources.syntheticClustered(spark, n, dim,
        numClusters = 128, spread = 0.15)
      .select("vec_id", "embedding").persist()
    base.count()
    val probes = base.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = KnnJoin.exactKnnJoin(base, probes, k = 10,
      metric = "cosine", scoreDigits = 6).persist()
    exact.count()

    val path = java.nio.file.Files.createTempDirectory("bqingest")
      .toString + "/idx"
    val t0 = System.nanoTime()
    IncrementalBqIndex.build(base.filter(col("vec_id") < bootN), path,
      numCells = c, family = family)
    val t1 = System.nanoTime()
    println(f"BQ-INGEST family=$family d=$dim bootstrap n=$bootN C=$c " +
      f"build=${(t1 - t0) / 1e9}%.1fs")

    val perEpoch = (n - bootN) / epochs
    var appendWall = 0.0
    (0 until epochs).foreach { e =>
      val lo = bootN + e * perEpoch
      val hi = if (e == epochs - 1) n else lo + perEpoch
      val ta = System.nanoTime()
      IncrementalBqIndex.append(
        base.filter(col("vec_id") >= lo && col("vec_id") < hi), path)
      val w = (System.nanoTime() - ta) / 1e9
      appendWall += w
      println(f"BQ-INGEST epoch $e rows=${hi - lo} wall=$w%.1fs " +
        f"(${(hi - lo) / w}%.0f rows/s durable)")
    }
    println(f"BQ-INGEST total appended=${n - bootN} wall=$appendWall%.1fs " +
      f"(${(n - bootN) / appendWall}%.0f rows/s)")

    def measure(tag: String, nprobe: Int, growth: Double,
        rerank: Int = 400): Unit = {
      val ts = System.nanoTime()
      val approx = IncrementalBqIndex.knnJoin(spark, path, probes, k = 10,
        nprobe = nprobe, rerank = rerank, scoreDigits = 6).persist()
      val rows = approx.count()
      val wall = (System.nanoTime() - ts) / 1e9
      val r = Recall.microAvgRecall(approx, exact)
        .select("recall").first().getDouble(0)
      approx.unpersist()
      println(f"BQ-INGEST serve[$tag] nprobe=$nprobe rerank=$rerank " +
        f"rows=$rows wall=$wall%.1fs recall@10=$r%.3f growth=$growth%.1fx")
    }
    // growth costs a full codes scan — compute once per phase, not per
    // measurement (this binary's purpose is timing)
    val growth = IncrementalBqIndex.growthSinceFit(spark, path)
    measure("frozen-quantizer", 4, growth)
    measure("frozen-quantizer", 8, growth)
    val cScaled = math.max(c, (c * growth).toInt)
    val tc = System.nanoTime()
    IncrementalBqIndex.compact(spark, path, refit = true, numCells = cScaled)
    println(f"BQ-INGEST refit-compact C=$c -> $cScaled " +
      f"wall=${(System.nanoTime() - tc) / 1e9}%.1fs")
    // constant touched fraction: nprobe scales with C. NOTE: residual
    // hammings are comparable only within a cell, so the cross-cell
    // candidate cut needs rerank to scale WITH nprobe — measured both.
    val growth2 = IncrementalBqIndex.growthSinceFit(spark, path)
    measure("refit", 4 * cScaled / c, growth2)
    measure("refit rerank-scaled", 4 * cScaled / c, growth2,
      400 * cScaled / c)
    spark.stop()
  }
}
