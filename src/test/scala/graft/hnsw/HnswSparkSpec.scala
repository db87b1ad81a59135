package graft.hnsw

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KnnJoin

class HnswSparkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  def emb = spark.read.parquet(s"$dir/embeddings.parquet")
  def probes = emb.filter(col("vec_id") < 20)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  test("distributed build + knnJoin achieves recall@10 >= 0.8 vs exact oracle (B6/B7)") {
    val model = HnswIndexer.fit(emb, HnswParams(m = 16, efConstruction = 200,
      numPartitions = 4))
    val approx = model.knnJoin(probes, k = 10, Some(100))
    val exact = KnnJoin.exactKnnJoin(emb, probes, k = 10, metric = "cosine")
    val hits = approx.select("query_id", "neighbor_id")
      .intersect(exact.select("query_id", "neighbor_id")).count()
    val total = exact.count()
    val recall = hits.toDouble / total
    assert(total == 200)
    assert(recall >= 0.8, s"shard-merge recall@10 = $recall")
    model.unpersist()
  }

  test("unpersist evicts executor sub-index cache; LRU bounds total entries") {
    val before = SubIndexCache.size
    val model = HnswIndexer.fit(emb, HnswParams(numPartitions = 2))
    model.knnJoin(probes.limit(2), k = 3).count() // populates the cache
    assert(SubIndexCache.size >= before)
    model.unpersist()
    // this model's entries are gone (local mode: driver JVM == executor JVM)
    assert(SubIndexCache.get(s"${model.modelId}/0") == null)
    assert(SubIndexCache.get(s"${model.modelId}/1") == null)
    // LRU bound: a sweep of many models cannot accumulate unboundedly
    (0 until 150).foreach(i => SubIndexCache.put(s"sweep-$i/0",
      new HnswIndex(4, 10, -1, Metric("cosine"), None, None, 1L)))
    assert(SubIndexCache.size <= 128)
    (0 until 150).foreach(i => SubIndexCache.evictModel(s"sweep-$i"))
  }

  test("distributed build progress: accumulators tick at the reference cadence (O11)") {
    // 500 rows, 1 partition, interval 100 → callbacks at 100..500 (5 ticks,
    // no final partial since 500 % 100 == 0); rows accumulator exact
    val bp = BuildProgress.register(spark, interval = 100L)
    val m1 = HnswIndexer.fit(emb, HnswParams(m = 8, efConstruction = 50,
      numPartitions = 1), progress = Some(bp))
    m1.graph.count() // force the (lazy, persisted) build
    assert(bp.rows.value == 500, s"rows = ${bp.rows.value}")
    assert(bp.ticks.value == 5, s"ticks = ${bp.ticks.value}")
    m1.unpersist()
    // multi-partition: per-partition cadence sums — rows still exact,
    // ticks = Σ_p (n_p / 100 + (1 if n_p % 100 != 0)); verify against the
    // actual hash-partition sizes
    val bp2 = BuildProgress.register(spark, interval = 100L)
    val m2 = HnswIndexer.fit(emb, HnswParams(m = 8, efConstruction = 50,
      numPartitions = 4), progress = Some(bp2))
    m2.graph.count()
    val sizes = m2.graph.groupBy("part").count().collect().map(_.getLong(1))
    val expectTicks = sizes.map(n => n / 100 + (if (n % 100 != 0) 1L else 0L)).sum
    assert(bp2.rows.value == 500, s"rows = ${bp2.rows.value}")
    assert(bp2.ticks.value == expectTicks,
      s"ticks = ${bp2.ticks.value}, expected $expectTicks (sizes ${sizes.mkString(",")})")
    m2.unpersist()
  }

  test("knnJoin output shape: k rows per query, ranked, scores descending") {
    val model = HnswIndexer.fit(emb, HnswParams(numPartitions = 2))
    val res = model.knnJoin(probes.limit(3), k = 5).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.size == 3)
    byQ.values.foreach { rows =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getDouble(2)).toSeq == sorted.map(_.getDouble(2)).sortBy(-(_: Double)).toSeq)
    }
    model.unpersist()
  }

  test("save/load round-trip preserves knnJoin results; delete then load is None (O13-O15)") {
    val path = java.nio.file.Files.createTempDirectory("hnsw-model").toString
    val model = HnswIndexer.fit(emb, HnswParams(numPartitions = 2))
    val before = model.knnJoin(probes.limit(5), k = 5)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    model.save(path)
    val loaded = HnswModel.load(spark, path)
    assert(loaded.isDefined)
    assert(loaded.get.params.m == model.params.m)
    val after = loaded.get.knnJoin(probes.limit(5), k = 5)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(before == after)
    HnswModel.delete(spark, path)
    assert(HnswModel.load(spark, path).isEmpty)
    model.unpersist()
  }

  test("knnJoinBatched matches knnJoin across hash batches") {
    val model = HnswIndexer.fit(emb, HnswParams(numPartitions = 2))
    val whole = model.knnJoin(probes, k = 5)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val batched = model.knnJoinBatched(probes, k = 5, batchRows = 7)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(whole == batched)
    model.unpersist()
  }

  test("deterministic across rebuilds: same data, same params → same results") {
    val m1 = HnswIndexer.fit(emb, HnswParams(numPartitions = 3))
    val m2 = HnswIndexer.fit(emb, HnswParams(numPartitions = 3))
    val r1 = m1.knnJoin(probes, k = 10).select("query_id", "neighbor_id", "rank")
      .collect().map(_.toSeq).toSet
    val r2 = m2.knnJoin(probes, k = 10).select("query_id", "neighbor_id", "rank")
      .collect().map(_.toSeq).toSet
    assert(r1 == r2)
    m1.unpersist(); m2.unpersist()
  }

  test("IVF-HNSW: cell routing recall, all-cells == shard-and-search, round-trip") {
    import graft.operators.{KnnJoin, Recall}
    val model = IvfHnsw.fit(emb, numCells = 8,
      HnswParams(m = 8, efConstruction = 120, numPartitions = 8))
    val exact = KnnJoin.exactKnnJoin(emb, probes, k = 10)
    // pruned probing (3 of 8 cells) keeps a useful recall floor (this
    // synthetic corpus clusters weakly, so the bar is the probe share
    // 3/8 clearly beaten, not production recall)
    val routed = IvfHnsw.knnJoin(model, probes, k = 10, nprobe = 3)
    val rec2 = Recall.microAvgRecall(routed, exact).select("recall").first().getDouble(0)
    assert(rec2 >= 0.55, s"nprobe=3 recall@10 = $rec2")
    // probing EVERY cell degenerates to shard-and-search over cell shards:
    // with ef >= cell size each sub-search is exhaustive → recall 1.0
    val all = IvfHnsw.knnJoin(model, probes, k = 10, nprobe = 8)
    val recAll = Recall.microAvgRecall(all, exact).select("recall").first().getDouble(0)
    assert(recAll == 1.0, s"all-cells recall@10 = $recAll")
    // determinism: a second fit reproduces the routed results exactly
    val model2 = IvfHnsw.fit(emb, numCells = 8,
      HnswParams(m = 8, efConstruction = 120, numPartitions = 8))
    val routed2 = IvfHnsw.knnJoin(model2, probes, k = 10, nprobe = 3)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(routed2 ==
      routed.select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet)
    // persistence round-trip preserves routed results; delete → None
    val path = java.nio.file.Files.createTempDirectory("ivfhnsw").toString + "/m"
    IvfHnsw.save(model, path)
    val loaded = IvfHnsw.load(spark, path).get
    val routed3 = IvfHnsw.knnJoin(loaded, probes, k = 10, nprobe = 3)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(routed3 == routed2)
    IvfHnsw.delete(spark, path)
    assert(IvfHnsw.load(spark, path).isEmpty)
    model.unpersist(); model2.unpersist(); loaded.unpersist()
  }

  test("IVF-HNSW: identity partitioning — one cell per build partition") {
    // the proxy-pid repartition must land cell c alone in partition c;
    // if a Spark version changes the hash this only costs balance (the
    // per-cell grouping keeps results correct), and this spec flags it
    val model = IvfHnsw.fit(emb, numCells = 8,
      HnswParams(m = 8, efConstruction = 120, numPartitions = 8))
    val cellsPerPart = model.hnsw.graph.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.map(_.part).toSet)
      }.collect().toMap
    assert(cellsPerPart.values.forall(_.size <= 1),
      s"a build partition holds >1 cell: $cellsPerPart")
    // and the mapping is identity: cell c sits in partition c
    cellsPerPart.foreach { case (pid, cells) =>
      cells.foreach(c => assert(c == pid, s"cell $c landed in partition $pid"))
    }
    model.unpersist()
  }

  test("IVF-HNSW: executor-side routing == driver-side centroid ranking") {
    val s = spark; import s.implicits._
    val model = IvfHnsw.fit(emb, numCells = 8,
      HnswParams(m = 8, efConstruction = 120, numPartitions = 8))
    val routed = IvfHnsw.routeProbes(model, probes, nprobe = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2).toSeq).toMap
    // the pre-r5 driver loop, verbatim: Metric.sim per (probe, centroid),
    // NaN → -1.0, (score desc, cell asc) total order
    val metric = Metric(model.hnsw.params.metric)
    val reference = probes
      .select(col("query_id").cast("long"), col("query_vec").cast("array<float>"))
      .as[(Long, Array[Float])].collect().map { case (qid, qv) =>
        qid -> model.centroids.map { case (c, cent) =>
          val sim = metric.sim(qv, cent)
          (if (java.lang.Double.isNaN(sim)) -1.0 else sim, c)
        }.sortBy { case (sc, c) => (-sc, c) }.take(3).map(_._2).toSeq
      }.toMap
    assert(routed == reference)
    model.unpersist()
  }

  test("IVF-HNSW: knnJoinBatched matches knnJoin across hash batches") {
    val model = IvfHnsw.fit(emb, numCells = 8,
      HnswParams(m = 8, efConstruction = 120, numPartitions = 8))
    val whole = IvfHnsw.knnJoin(model, probes, k = 5, nprobe = 3)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val batched = IvfHnsw.knnJoinBatched(model, probes, k = 5, nprobe = 3, batchRows = 7)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(whole == batched)
    model.unpersist()
  }

  test("IVF-HNSW: loaded model reads only the probed cells' files") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val model = IvfHnsw.fit(emb, numCells = 8,
      HnswParams(m = 8, efConstruction = 120, numPartitions = 8))
    val path = java.nio.file.Files.createTempDirectory("ivfhnsw_prune").toString + "/m"
    IvfHnsw.save(model, path)
    val loaded = IvfHnsw.load(spark, path).get
    val oneProbe = probes.limit(1)
    val probedCells = IvfHnsw.routeProbes(loaded, oneProbe, nprobe = 2)
      .collect().flatMap(_.getSeq[Int](2)).toSet
    assert(probedCells.size == 2)
    val q = IvfHnsw.knnJoin(loaded, oneProbe, k = 5, nprobe = 2)
    q.collect()
    // AQE hides materialized stages behind leaf wrapper nodes — recurse
    // through AdaptiveSparkPlanExec AND QueryStageExec to reach the scans
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val graphScans = scans(q.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/hnsw/graph")))
    assert(graphScans.nonEmpty, "expected a parquet file scan of the saved graph")
    val filesRead = graphScans.map(_.metrics("numFiles").value).sum
    def filesUnder(cells: Set[Int]): Long = cells.toSeq.map { c =>
      val d = new java.io.File(s"$path/hnsw/graph/part=$c")
      Option(d.listFiles()).map(_.count(_.getName.endsWith(".parquet")).toLong).getOrElse(0L)
    }.sum
    val allCells = (0 until 8).toSet
    assert(filesUnder(allCells) > filesUnder(probedCells),
      "fixture degenerate: probed cells hold every file")
    assert(filesRead == filesUnder(probedCells),
      s"scan read $filesRead files, expected only the ${probedCells.size} probed cells'")
    model.unpersist(); loaded.unpersist()
    IvfHnsw.delete(spark, path)
  }
}
