package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.hnsw.{HnswIndexer, HnswParams}
import graft.operators.{KnnJoin, Recall}

/** One grid-cell result (reference src/bench/run.ts:29-53). */
case class RunResult(
    datasetName: String, metric: String, dimension: Int, count: Long, queries: Int,
    m: Int, efConstruction: Int, efSearch: Int, k: Int,
    buildMs: Double, latencyCount: Long, latencyAvg: Double,
    latencyP50: Double, latencyP90: Double, latencyP95: Double, latencyP99: Double,
    recallAtK: Double)

/** B9-B16: grid sweep runner and baseline-vs-candidate report.
  *
  * The sweep itself is a driver-side loop (builds are the unit of work —
  * SURVEY B9); everything inside a cell is Spark jobs. Latency summary
  * uses the exact floor-index percentile (sorted[⌊p/100·(n−1)⌋],
  * reference src/bench/metrics.ts:51-57); recall is micro-averaged (B7).
  */
object GridBench {

  /** B9: sweep M × efConstruction (build) × efSearch (query). */
  def runGrid(
      base: DataFrame, queries: DataFrame, datasetName: String,
      metric: String = "cosine",
      ms: Seq[Int] = Seq(8, 16), efCs: Seq[Int] = Seq(100, 200),
      efSearches: Seq[Int] = Seq(10, 50, 100), k: Int = 10,
      numPartitions: Int = 4): Seq[RunResult] = {
    val spark = base.sparkSession
    val count = base.count()
    val nQueries = queries.count().toInt
    val dim = base.selectExpr("size(embedding)").first().getInt(0)
    val exact = KnnJoin.exactKnnJoin(base, queries, k, metric)
      .select("query_id", "neighbor_id").cache()
    exact.count()
    val results = for {
      m <- ms
      efC <- efCs
    } yield {
      val t0 = System.nanoTime()
      val model = HnswIndexer.fit(base,
        HnswParams(m, efC, -1, metric, numPartitions = numPartitions))
      model.graph.count() // force build
      val buildMs = (System.nanoTime() - t0) / 1e6
      val cells = efSearches.map { ef =>
        val (approx, latencies) = model.knnJoinTimed(queries, k, Some(ef))
        val recall = Recall.microAvgRecall(approx, exact)
          .select("recall").first().getDouble(0)
        // honest per-query latency: max-over-shards in-executor search ms,
        // summarized with the exact floor-index percentile
        // (sorted[⌊p/100·(n−1)⌋], reference src/bench/metrics.ts:51-57)
        val lat = latencies.select("search_ms").collect().map(_.getDouble(0)).sorted
        def pct(p: Double): Double =
          if (lat.isEmpty) 0.0 else lat(math.floor(p * (lat.length - 1)).toInt)
        val avgLat = if (lat.isEmpty) 0.0 else lat.sum / lat.length
        RunResult(datasetName, metric, dim, count, nQueries,
          m, efC, ef, k, buildMs, lat.length, avgLat,
          pct(0.50), pct(0.90), pct(0.95), pct(0.99), recall)
      }
      model.unpersist()
      cells
    }
    exact.unpersist()
    results.flatten
  }

  /** B11: JSON sink — one file, reference naming bench-<ds>-<ts>.json. */
  def writeResults(spark: SparkSession, results: Seq[RunResult], outDir: String,
      datasetName: String): String = {
    import spark.implicits._
    val ts = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss")
      .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
    val path = s"$outDir/bench-$datasetName-$ts.json"
    val json = results.toDS().toJSON.collect().mkString("[", ",", "]")
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(outDir))
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    out.write(s"""{"results":$json}""".getBytes("UTF-8")); out.close()
    path
  }

  /** B16: directory source — union the `results` arrays of all JSON files. */
  def readResultsDir(spark: SparkSession, dir: String): DataFrame = {
    val rr = org.apache.spark.sql.Encoders.product[RunResult].schema
    val full = new org.apache.spark.sql.types.StructType()
      .add("results", org.apache.spark.sql.types.ArrayType(rr))
    spark.read.option("multiLine", true).schema(full).json(s"$dir/*.json")
      .select(explode(col("results")).as("r")).select("r.*")
  }

  private val keyCols = Seq("datasetName", "metric", "dimension", "count",
    "queries", "m", "efConstruction", "efSearch", "k")

  /** B12/B13: keyed full-outer comparison with null-side splits + deltas.
    * Returns (joinedRows, missingInBase, missingInCandidate). */
  def compare(base: DataFrame, candidate: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val metricCols = Seq("recallAtK", "latencyAvg", "latencyP95", "buildMs")
    val b = metricCols.foldLeft(base)((df, c) => df.withColumnRenamed(c, s"base_$c"))
      .select((keyCols ++ metricCols.map(c => s"base_$c")).map(col): _*)
    val c = metricCols.foldLeft(candidate)((df, x) => df.withColumnRenamed(x, s"cand_$x"))
      .select((keyCols ++ metricCols.map(x => s"cand_$x")).map(col): _*)
    val joined = b.join(c, keyCols, "full_outer")
    val both = metricCols.foldLeft(
      joined.filter(col("base_recallAtK").isNotNull && col("cand_recallAtK").isNotNull)) {
      (df, x) => df.withColumn(s"delta_$x", col(s"cand_$x") - col(s"base_$x"))
    }
    val missingInCandidate = joined.filter(col("cand_recallAtK").isNull)
      .select(keyCols.map(col): _*)
    val missingInBase = joined.filter(col("base_recallAtK").isNull)
      .select(keyCols.map(col): _*)
    (both, missingInBase, missingInCandidate)
  }

  /** B13: avg/min/max aggregation over the delta columns. */
  def deltaSummary(compared: DataFrame): DataFrame = {
    val deltas = compared.columns.filter(_.startsWith("delta_"))
    compared.agg(
      deltas.flatMap(d => Seq(avg(d).as(s"avg_$d"), min(d).as(s"min_$d"),
        max(d).as(s"max_$d"))).head,
      deltas.flatMap(d => Seq(avg(d).as(s"avg_$d"), min(d).as(s"min_$d"),
        max(d).as(s"max_$d"))).tail: _*)
  }

  /** B14: fixed-column CSV sink with fixed decimal formatting
    * (6dp recalls/latencies, 3dp buildMs — src/bench/report.ts:223-234). */
  def writeCsv(compared: DataFrame, path: String): Unit = {
    val f6 = Seq("base_recallAtK", "cand_recallAtK", "delta_recallAtK",
      "base_latencyAvg", "cand_latencyAvg", "delta_latencyAvg",
      "base_latencyP95", "cand_latencyP95", "delta_latencyP95")
    val f3 = Seq("base_buildMs", "cand_buildMs", "delta_buildMs")
    val formatted = compared.select(
      keyCols.map(col) ++
        f6.map(c => format_number(col(c), 6).as(c)) ++
        f3.map(c => format_number(col(c), 3).as(c)): _*)
    formatted.coalesce(1).write.mode("overwrite")
      .option("header", true).csv(path)
  }
}
