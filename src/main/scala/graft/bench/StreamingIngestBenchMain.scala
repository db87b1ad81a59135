package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.hnsw.{HnswParams, IvfHnsw}
import graft.operators.{KnnJoin, Recall}
import graft.sources.VectorSources
import graft.streaming.IncrementalIvfIndex

/** Streaming ingest-rate + recall-drift measurement (VERDICT r5 missing
  * #3): the frozen-quantizer caveat documented on [[IncrementalIvfIndex]]
  * quantified. Fits the coarse quantizer on an initial batch corpus,
  * then feeds `batches` micro-batches of `batchN` rows each through
  * `processBatch`, timing ingest (rows/sec) per batch; after each batch
  * it measures recall@10 for probes drawn from the NEWEST batch — the
  * region a drifting distribution pushes away from the frozen centroids
  * — against the exact scan over everything ingested so far.
  *
  * `drift` shifts every embedding of batch b by b·drift/√dim per
  * dimension (the cluster structure survives; its location walks away
  * from the fitted centroids). drift=0 is the control: recall should
  * hold flat. A widening gap vs the control is the compaction-refit
  * trigger the class doc tells users to watch for.
  *
  * `sbt "runMain graft.bench.StreamingIngestBenchMain 100000 50000 8 64 32 0.05"`
  */
object StreamingIngestBenchMain {
  def main(args: Array[String]): Unit = {
    val initN = if (args.length > 0) args(0).toLong else 100000L
    val batchN = if (args.length > 1) args(1).toLong else 50000L
    val batches = if (args.length > 2) args(2).toInt else 8
    val dim = if (args.length > 3) args(3).toInt else 64
    val cells = if (args.length > 4) args(4).toInt else 32
    val drift = if (args.length > 5) args(5).toDouble else 0.0
    val nprobe = if (args.length > 6) args(6).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def clustered(count: Long, idOffset: Long): DataFrame =
      VectorSources.syntheticClustered(spark, count, dim,
        numClusters = 4 * cells, spread = 0.15, seed = 42)
        .select((col("vec_id") + idOffset).as("vec_id"), col("embedding"))

    // freeze the quantizer on the initial batch corpus (the composition
    // contract), then stream — the initial rows also ingest so the
    // exact oracle covers one consistent corpus
    val init = clustered(initN, 0).cache()
    init.count()
    val params = HnswParams(m = 16, efConstruction = 200, efSearch = 100,
      numPartitions = cells)
    val t0 = System.nanoTime()
    val batchModel = IvfHnsw.fit(init, cells, params, balanceSlack = 0.2)
    val fitS = (System.nanoTime() - t0) / 1e9
    val maintainer = IncrementalIvfIndex.fromModel(spark, batchModel)
    batchModel.unpersist()

    val tInit = System.nanoTime()
    maintainer.processBatch(init, 0L)
    val initS = (System.nanoTime() - tInit) / 1e9
    println(f"STREAM-INGEST init n=$initN fit=${fitS}%.1fs ingest=${initS}%.1fs " +
      f"rate=${initN / initS}%.0f rows/s drift=$drift")

    var corpus = init
    var lastProbes: DataFrame = null
    (1 to batches).foreach { b =>
      val shift = (b * drift / math.sqrt(dim)).toFloat
      val batch = clustered(batchN, initN + (b - 1) * batchN)
        .select(col("vec_id"),
          transform(col("embedding"), x => x + lit(shift)).as("embedding"))
        .cache()
      batch.count() // materialize OUTSIDE the ingest timing
      val t1 = System.nanoTime()
      maintainer.processBatch(batch, b.toLong)
      val ingestS = (System.nanoTime() - t1) / 1e9
      corpus = corpus.unionByName(batch).cache()
      // probes from the NEWEST batch: the drifted region is where the
      // frozen quantizer mis-routes first
      val probes = batch.limit(100)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        .cache()
      probes.count()
      val exact = KnnJoin.exactKnnJoin(corpus, probes, k = 10)
      val approx = maintainer.knnJoin(probes, k = 10, nprobe = nprobe)
      val rec = Recall.microAvgRecall(approx, exact)
        .select("recall").first().getDouble(0)
      val total = maintainer.indexedCount()
      println(f"STREAM-INGEST batch=$b rows=$batchN ingest=${ingestS}%.1fs " +
        f"rate=${batchN / ingestS}%.0f rows/s indexed=$total " +
        f"recall@10(nprobe=$nprobe,newest100)=$rec%.4f drift=$drift")
      if (b == batches) lastProbes = probes else probes.unpersist()
    }
    // UPDATE phase (STREAM_UPDATE=<n>): re-deliver changed embeddings for
    // n EXISTING ids (the re-embed workload) — measures the upsert path's
    // throughput (every row is a registry hit + in-place re-link or
    // tombstone-and-move) and recall at the ids' NEW locations. The live
    // count must not change: updates replace, never grow.
    sys.env.get("STREAM_UPDATE").map(_.toLong).filter(_ > 0).foreach { updN =>
      val updates = VectorSources.syntheticClustered(spark, updN, dim,
        numClusters = 4 * cells, spread = 0.15, seed = 7)
        .select(col("vec_id"), col("embedding")).cache()
      updates.count() // materialize OUTSIDE the update timing
      val before = maintainer.indexedCount()
      val tU = System.nanoTime()
      maintainer.processBatch(updates, 1000L)
      val updS = (System.nanoTime() - tU) / 1e9
      val after = maintainer.indexedCount()
      val probes = updates.limit(100)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        .cache()
      probes.count()
      val corpusUpd = corpus.join(updates, Seq("vec_id"), "left_anti")
        .unionByName(updates).cache()
      val exactU = KnnJoin.exactKnnJoin(corpusUpd, probes, k = 10)
      val recU = Recall.microAvgRecall(
          maintainer.knnJoin(probes, k = 10, nprobe = nprobe), exactU)
        .select("recall").first().getDouble(0)
      println(f"STREAM-INGEST update n=$updN wall=${updS}%.1fs " +
        f"rate=${updN / updS}%.0f rows/s applied=${maintainer.appliedUpdateCount} " +
        f"indexed=$before->$after " +
        f"recall@10(nprobe=$nprobe,updated100)=$recU%.4f")
      corpus = corpusUpd // the compaction phase below sees the updated corpus
      probes.unpersist()
    }
    // compaction cost + recall recovery at the final size: refit the
    // quantizer over everything indexed (the remedy for the frozen-
    // quantizer recall decline measured above), then re-measure the SAME
    // newest-batch probes against the compacted batch model
    if (sys.env.get("STREAM_COMPACT").contains("1")) {
      val tC = System.nanoTime()
      val compacted = maintainer.compact(balanceSlack = 0.2)
      val compactS = (System.nanoTime() - tC) / 1e9
      val exact = KnnJoin.exactKnnJoin(corpus, lastProbes, k = 10)
      val recC = Recall.microAvgRecall(
          IvfHnsw.knnJoin(compacted, lastProbes, k = 10, nprobe = nprobe),
          exact)
        .select("recall").first().getDouble(0)
      println(f"STREAM-INGEST compact wall=${compactS}%.1fs " +
        f"indexed=${maintainer.indexedCount()} " +
        f"recall@10(nprobe=$nprobe,newest100)=$recC%.4f drift=$drift")
      compacted.hnsw.graph.unpersist()
      // growth-scaled compaction: the r5 P-sizing rule says recall is a
      // function of SHARD SIZE, so a same-C refit can't recover growth-
      // driven decline — refit with C scaled by corpus growth since fit
      // and nprobe scaled to keep the touched FRACTION constant
      val growth = math.max(1,
        math.round(maintainer.indexedCount().toDouble / initN).toInt)
      if (growth > 1) {
        val cellsNew = cells * growth
        val nprobeNew = nprobe * growth
        val tS = System.nanoTime()
        val scaled = maintainer.compact(numCellsNew = cellsNew,
          balanceSlack = 0.2)
        val scaledS = (System.nanoTime() - tS) / 1e9
        val recS = Recall.microAvgRecall(
            IvfHnsw.knnJoin(scaled, lastProbes, k = 10, nprobe = nprobeNew),
            exact)
          .select("recall").first().getDouble(0)
        println(f"STREAM-INGEST compact-scaled wall=${scaledS}%.1fs " +
          f"cells=$cellsNew nprobe=$nprobeNew " +
          f"recall@10(newest100)=$recS%.4f drift=$drift")
        scaled.hnsw.graph.unpersist()
      }
    }
    maintainer.close()
    spark.stop()
  }
}
