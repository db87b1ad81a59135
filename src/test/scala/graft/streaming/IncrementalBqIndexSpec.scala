package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfBq, IvfFlat}

class IncrementalBqIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  def emb: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")
  def probes: DataFrame = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  private def tmpPath(): String =
    java.nio.file.Files.createTempDirectory("incbq").toString + "/idx"

  private def serve(path: String): Set[Seq[Any]] =
    IncrementalBqIndex.knnJoin(spark, path, probes, k = 5, nprobe = 4,
        rerank = 20, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet

  /** Batch twin under the SAME frozen quantizer (trained on `fitBase`,
    * serving `corpus`). */
  private def twin(fitBase: DataFrame, corpus: DataFrame): Set[Seq[Any]] = {
    val ivf = IvfFlat.fit(fitBase, numCells = 4)
    val assigned = IvfFlat.assign(
      corpus.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<float>").as("vec")),
      ivf.centroids, "cosine")
    val m = IvfBq.fromIvf(IvfFlat.Model(ivf.centroids, assigned))
    val out = IvfBq.knnJoin(m, corpus, probes, k = 5, nprobe = 4, rerank = 20,
        scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    m.encoded.unpersist(); ivf.release()
    out
  }

  test("build + serve equals the direct batch IvfBq pipeline") {
    val path = tmpPath()
    IncrementalBqIndex.build(emb, path, numCells = 4)
    val direct = IvfBq.knnJoin(IvfBq.fit(emb, numCells = 4), emb, probes,
        k = 5, nprobe = 4, rerank = 20, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(serve(path) == direct)
    // the adaptive wrapper routes through the same live model
    val adWrap = IncrementalBqIndex.knnJoinAdaptive(spark, path, probes,
        k = 5, nprobe = 4, rerankFrac = 0.5, rerankMin = 5, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val adDirect = IvfBq.knnJoinAdaptive(
        IncrementalBqIndex.model(spark, path, withCounts = true),
        IncrementalBqIndex.vectors(spark, path), probes,
        k = 5, nprobe = 4, rerankFrac = 0.5, rerankMin = 5, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(adWrap == adDirect)
    IncrementalBqIndex.drop(spark, path)
  }

  test("epoch appends serve bit-identically to a frozen-quantizer batch " +
      "build over the union") {
    val path = tmpPath()
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b1 = emb.filter(col("vec_id") % 4 === 1)
    val b2 = emb.filter(col("vec_id") % 4 === 3)
    IncrementalBqIndex.build(a, path, numCells = 4)
    IncrementalBqIndex.append(b1, path)
    IncrementalBqIndex.append(b2, path)
    assert(IncrementalBqIndex.indexedCount(spark, path) == emb.count())
    assert(serve(path) == twin(a, emb))
    IncrementalBqIndex.drop(spark, path)
  }

  test("remove drops ids from every serving surface; results equal the " +
      "twin without them") {
    val path = tmpPath()
    val a = emb.filter(col("vec_id") % 2 === 0)
    IncrementalBqIndex.build(a, path, numCells = 4)
    IncrementalBqIndex.append(emb.filter(col("vec_id") % 2 === 1), path)
    import spark.implicits._
    val gone = Seq(12L, 13L, 14L).toDF("vec_id")
    IncrementalBqIndex.remove(gone, path)
    val survivors = emb.filter(!col("vec_id").isin(12L, 13L, 14L))
    assert(IncrementalBqIndex.indexedCount(spark, path) == survivors.count())
    assert(serve(path) == twin(a, survivors))
    IncrementalBqIndex.drop(spark, path)
  }

  test("fold compaction: serving identical before/after, delete vector " +
      "dropped, growth counter NOT reset") {
    val path = tmpPath()
    val a = emb.filter(col("vec_id") < 20)
    IncrementalBqIndex.build(a, path, numCells = 4)
    IncrementalBqIndex.append(emb.filter(col("vec_id") >= 20), path)
    import spark.implicits._
    IncrementalBqIndex.remove(Seq(30L, 31L).toDF("vec_id"), path)
    val before = serve(path)
    val growthBefore = IncrementalBqIndex.growthSinceFit(spark, path)
    IncrementalBqIndex.compact(spark, path, refit = false)
    assert(serve(path) == before)
    assert(IncrementalBqIndex.growthSinceFit(spark, path) == growthBefore)
    // deletes folded in: removing the dir means indexedCount is pure codes
    assert(IncrementalBqIndex.indexedCount(spark, path) ==
      emb.count() - 20 /* appended rows */ + 20 - 2)
    IncrementalBqIndex.drop(spark, path)
  }

  test("refit compaction: serving equals a fresh build on the live " +
      "corpus; growth resets") {
    val path = tmpPath()
    val a = emb.filter(col("vec_id") < 20)
    IncrementalBqIndex.build(a, path, numCells = 4)
    IncrementalBqIndex.append(emb.filter(col("vec_id") >= 20), path)
    assert(IncrementalBqIndex.needsCompaction(spark, path, factor = 2.0))
    IncrementalBqIndex.compact(spark, path, refit = true)
    assert(IncrementalBqIndex.growthSinceFit(spark, path) == 1.0)
    val fresh = tmpPath()
    IncrementalBqIndex.build(emb, fresh, numCells = 4)
    assert(serve(path) == serve(fresh))
    IncrementalBqIndex.drop(spark, path)
    IncrementalBqIndex.drop(spark, fresh)
  }

  test("re-appending a deleted id fails loudly (run compact first); " +
      "replaying the SAME epoch tag is idempotent") {
    val path = tmpPath()
    val a = emb.filter(col("vec_id") % 2 === 0)
    IncrementalBqIndex.build(a, path, numCells = 4)
    import spark.implicits._
    IncrementalBqIndex.remove(Seq(0L).toDF("vec_id"), path)
    intercept[IllegalArgumentException] {
      IncrementalBqIndex.append(
        emb.filter(col("vec_id") < 3), path)
    }
    IncrementalBqIndex.compact(spark, path, refit = false)
    // retry semantics: same tag overwrites its epoch dir, not append
    val b = emb.filter(col("vec_id") % 2 === 1)
    IncrementalBqIndex.append(b, path, epochTag = Some("b7"))
    val once = serve(path)
    val n1 = IncrementalBqIndex.indexedCount(spark, path)
    IncrementalBqIndex.append(b, path, epochTag = Some("b7")) // replay
    assert(IncrementalBqIndex.indexedCount(spark, path) == n1,
      "epoch replay must not duplicate rows")
    assert(serve(path) == once)
    IncrementalBqIndex.drop(spark, path)
  }

  test("streamingAppend: two micro-batches serve bit-identically to the " +
      "same appends run in batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val a = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val streamed = tmpPath(); val batch = tmpPath()
    IncrementalBqIndex.build(a, streamed, numCells = 4)
    IncrementalBqIndex.build(a, batch, numCells = 4)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = IncrementalBqIndex.streamingAppend(
      mem.toDF.toDF("vec_id", "embedding"), streamed, s"$streamed-ckpt")
    val (h1, h2) = rest.splitAt(rest.length / 2)
    mem.addData(h1.toSeq); q.processAllAvailable()
    mem.addData(h2.toSeq); q.processAllAvailable()
    q.stop()
    IncrementalBqIndex.append(h1.toSeq.toDF("vec_id", "embedding"), batch)
    IncrementalBqIndex.append(h2.toSeq.toDF("vec_id", "embedding"), batch)
    assert(serve(streamed) == serve(batch))
    assert(IncrementalBqIndex.indexedCount(spark, streamed) == emb.count())
    IncrementalBqIndex.drop(spark, streamed)
    IncrementalBqIndex.drop(spark, batch)
  }

  test("autoCompact policy: fires exactly at the growth threshold, " +
      "growth-scales C, post-compact serving equals a fresh build") {
    import spark.implicits._
    val path = tmpPath()
    val base = emb.filter(col("vec_id") < 100) // fit_n = 100
    IncrementalBqIndex.build(base, path, numCells = 4)
    // growth 1.99 — one row below the factor-2 threshold: must NOT fire
    IncrementalBqIndex.append(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 199), path)
    assert(!IncrementalBqIndex.autoCompact(spark, path, factor = 2.0))
    assert(IncrementalBqIndex.describe(spark, path).first()
      .getAs[Long]("epochs") == 2L, "no-fire must leave epochs alone")
    // +1 row → growth exactly 2.0: fires, refits with C x growth = 8
    IncrementalBqIndex.append(
      emb.filter(col("vec_id") === 199).select("vec_id", "embedding"), path)
    assert(IncrementalBqIndex.autoCompact(spark, path, factor = 2.0))
    val d = IncrementalBqIndex.describe(spark, path).first()
    assert(d.getAs[Long]("epochs") == 1L)
    assert(math.abs(d.getAs[Double]("growth_since_fit") - 1.0) < 1e-9,
      "refit resets growth to 1")
    assert(d.getAs[String]("detail").contains("cells=8"),
      s"C must scale with growth: ${d.getAs[String]("detail")}")
    assert(!IncrementalBqIndex.autoCompact(spark, path, factor = 2.0),
      "back-to-back policy call is a no-op")
    // post-compact serving ≡ a fresh build over the same live corpus
    // with the same scaled C and seed
    val fresh = tmpPath()
    IncrementalBqIndex.build(
      emb.filter(col("vec_id") < 200), fresh, numCells = 8)
    assert(serve(path) == serve(fresh))
    IncrementalBqIndex.drop(spark, path)
    IncrementalBqIndex.drop(spark, fresh)
  }

  test("streamingAppendAutoCompact: the policy acts between " +
      "micro-batches — a growth-crossing stream refits unattended") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val path = tmpPath()
    IncrementalBqIndex.build(emb.filter(col("vec_id") < 50), path,
      numCells = 4)
    val rest = emb.filter(col("vec_id") >= 50 && col("vec_id") < 250)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val mem = MemoryStream[(Long, Array[Float])]
    val q = IncrementalBqIndex.streamingAppendAutoCompact(
      mem.toDF.toDF("vec_id", "embedding"), path, s"$path-ckpt",
      factor = 2.0)
    // batch 1: 50 → 100 rows (growth 2.0 at next batch entry);
    // batch 2's entry fires the policy, then appends the rest
    val (h1, h2) = rest.splitAt(50)
    mem.addData(h1.toSeq); q.processAllAvailable()
    mem.addData(h2.toSeq); q.processAllAvailable()
    q.stop()
    val d = IncrementalBqIndex.describe(spark, path).first()
    // the refit folded epochs b0 and the bootstrap; b1 appended after
    assert(IncrementalBqIndex.indexedCount(spark, path) == 250L)
    assert(d.getAs[String]("detail").contains("fit_n=100"),
      s"policy refit on the 100-row live set: ${d.getAs[String]("detail")}")
    assert(d.getAs[String]("detail").contains("cells=8"))
    IncrementalBqIndex.drop(spark, path)
  }

  test("federation: exhaustive per-index serving merges to the exact " +
      "global top-k; overlapping ids dedupe; status reports growth") {
    import graft.operators.{KnnJoin, Recall}
    val pa = tmpPath(); val pb = tmpPath()
    val half = emb.count() / 2
    // two DISJOINT halves with independently trained quantizers, plus an
    // overlap: vector 0 lives in BOTH indexes
    IncrementalBqIndex.build(emb.filter(col("vec_id") < half), pa, numCells = 4)
    IncrementalBqIndex.build(
      emb.filter(col("vec_id") >= half || col("vec_id") === 0L), pb, numCells = 4)
    // exhaustive probes + full rerank per index -> per-index exact top-k
    // -> the global merge must equal brute force over the whole corpus
    val fed = IncrementalBqIndex.knnJoinFederated(spark, Seq(pa, pb), probes,
        k = 5, nprobe = 4, rerank = 1000, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(_.toSeq).toSet
    val exact = KnnJoin.exactKnnJoin(emb, probes, k = 5,
        metric = "cosine", scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(_.toSeq).toSet
    assert(fed == exact)
    // the duplicated id appears at most once per query
    val dupCounts = IncrementalBqIndex.knnJoinFederated(spark, Seq(pa, pb),
        probes, k = 5, nprobe = 4, rerank = 1000)
      .groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).count()
    assert(dupCounts == 0)
    // pruned serving still holds a recall floor through the merge
    val pruned = IncrementalBqIndex.knnJoinFederated(spark, Seq(pa, pb),
      probes, k = 5, nprobe = 2, rerank = 20)
    val rec = Recall.microAvgRecall(pruned,
        KnnJoin.exactKnnJoin(emb, probes, k = 5))
      .select("recall").first().getDouble(0)
    assert(rec >= 0.5, s"federated pruned recall = $rec")
    // staleness metadata: one row per member, growth = live / fit_n
    val st = IncrementalBqIndex.federationStatus(spark, Seq(pa, pb))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(st.size == 2)
    assert(st(pa)._1 == half && st(pa)._2 == half && st(pa)._3 == 1.0)
    assert(st(pb)._1 == emb.count() - half + 1)
    IncrementalBqIndex.drop(spark, pa)
    IncrementalBqIndex.drop(spark, pb)
  }

  test("warm-start refit keeps cell identities across compaction; " +
      "cold refit relabels them") {
    import graft.sources.VectorSources
    val boot = VectorSources.syntheticClustered(spark, 2000, 16,
        numClusters = 8, spread = 0.08)
      .select("vec_id", "embedding")
    val grow = VectorSources.syntheticClustered(spark, 4000, 16,
        numClusters = 8, spread = 0.08)
      .filter(col("vec_id") >= 2000).select("vec_id", "embedding")
    def cellsOf(path: String): Map[Long, Int] =
      spark.read.parquet(s"$path/codes").select("id", "cell")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def stability(path: String, warm: Boolean): Double = {
      IncrementalBqIndex.build(boot, path, numCells = 8)
      IncrementalBqIndex.append(grow, path)
      val before = cellsOf(path)
      IncrementalBqIndex.compact(spark, path, refit = true, warmStart = warm)
      val after = cellsOf(path)
      assert(after.size == 4000)
      val stable = before.count { case (id, c) => after(id) == c }
      stable.toDouble / before.size
    }
    val pw = tmpPath(); val pc = tmpPath()
    val warmStab = stability(pw, warm = true)
    val coldStab = stability(pc, warm = false)
    assert(warmStab >= 0.9,
      s"warm refit must keep cell identities (stability = $warmStab)")
    assert(warmStab >= coldStab,
      s"warm $warmStab must not be less stable than cold $coldStab")
    // warm-refit index still serves: exhaustive probes equal brute force
    import graft.operators.KnnJoin
    val all = boot.unionByName(grow)
    val qs = all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val served = IncrementalBqIndex.knnJoin(spark, pw, qs, k = 5,
        nprobe = 8, rerank = 5000, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val exact = KnnJoin.exactKnnJoin(all, qs, k = 5, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(served == exact)
    IncrementalBqIndex.drop(spark, pw)
    IncrementalBqIndex.drop(spark, pc)
  }

  // ---- rabitq code family (round 10): the same epoch layout carrying
  // rotated-residual sign bits + factor, served by the estimator scan ----

  private def serveR(path: String): Set[Seq[Any]] =
    IncrementalBqIndex.knnJoin(spark, path, probes, k = 5, nprobe = 4,
        rerank = 20, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet

  test("rabitq family: build + serve equals the direct batch IvfRabitq " +
      "pipeline; model() guards the family") {
    import graft.operators.IvfRabitq
    val path = tmpPath()
    IncrementalBqIndex.build(emb, path, numCells = 4, family = "rabitq")
    val m = IvfRabitq.fit(emb, numCells = 4)
    val direct = IvfRabitq.knnJoin(m, emb, probes, k = 5, nprobe = 4,
        rerank = 20, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    m.encoded.unpersist()
    assert(serveR(path) == direct)
    val e = intercept[IllegalArgumentException] {
      IncrementalBqIndex.model(spark, path)
    }
    assert(e.getMessage.contains("rabitq"))
    // adaptive serving dispatches to the estimator path and routes
    // through the same live model
    val adWrap = IncrementalBqIndex.knnJoinAdaptive(spark, path, probes,
        k = 5, nprobe = 4, rerankFrac = 0.5, rerankMin = 5, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val adDirect = graft.operators.IvfRabitq.knnJoinAdaptive(
        IncrementalBqIndex.rabitqModel(spark, path, withCounts = true),
        IncrementalBqIndex.vectors(spark, path), probes,
        k = 5, nprobe = 4, rerankFrac = 0.5, rerankMin = 5, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(adWrap == adDirect)
    IncrementalBqIndex.drop(spark, path)
  }

  test("rabitq family: epoch appends serve bit-identically to a " +
      "frozen-quantizer batch build over the union; replay idempotent; " +
      "fold compaction identical") {
    import graft.operators.IvfRabitq
    val path = tmpPath()
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b1 = emb.filter(col("vec_id") % 4 === 1)
    val b2 = emb.filter(col("vec_id") % 4 === 3)
    IncrementalBqIndex.build(a, path, numCells = 4, family = "rabitq")
    IncrementalBqIndex.append(b1, path, epochTag = Some("b1"))
    IncrementalBqIndex.append(b2, path, epochTag = Some("b2"))
    assert(IncrementalBqIndex.indexedCount(spark, path) == emb.count())
    // twin: same frozen quantizer (fit on a), codes for the whole corpus
    val ivf = IvfFlat.fit(a, numCells = 4)
    val assigned = IvfFlat.assign(
      emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<float>").as("vec")),
      ivf.centroids, "cosine")
    val tm = IvfRabitq.fromIvf(IvfFlat.Model(ivf.centroids, assigned))
    val twinR = IvfRabitq.knnJoin(tm, emb, probes, k = 5, nprobe = 4,
        rerank = 20, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    tm.encoded.unpersist(); ivf.release()
    val once = serveR(path)
    assert(once == twinR)
    // replaying an epoch overwrites, never duplicates
    IncrementalBqIndex.append(b2, path, epochTag = Some("b2"))
    assert(IncrementalBqIndex.indexedCount(spark, path) == emb.count())
    assert(serveR(path) == once)
    // fold compaction: serving identical, family survives the meta rewrite
    import spark.implicits._
    IncrementalBqIndex.remove(Seq(12L).toDF("vec_id"), path)
    val withDel = serveR(path)
    IncrementalBqIndex.compact(spark, path, refit = false)
    assert(serveR(path) == withDel)
    assert(IncrementalBqIndex.indexedCount(spark, path) == emb.count() - 1)
    IncrementalBqIndex.drop(spark, path)
  }

  test("rabitq family: refit compaction retrains codes, keeps the " +
      "rotation; serving equals a fresh rabitq build") {
    val path = tmpPath()
    val a = emb.filter(col("vec_id") < 20)
    IncrementalBqIndex.build(a, path, numCells = 4, family = "rabitq")
    IncrementalBqIndex.append(emb.filter(col("vec_id") >= 20), path)
    IncrementalBqIndex.compact(spark, path, refit = true)
    assert(IncrementalBqIndex.growthSinceFit(spark, path) == 1.0)
    val fresh = tmpPath()
    IncrementalBqIndex.build(emb, fresh, numCells = 4, family = "rabitq")
    assert(serveR(path) == serveR(fresh))
    IncrementalBqIndex.drop(spark, path)
    IncrementalBqIndex.drop(spark, fresh)
  }

  test("cell-clustered rerank store: pruned serving is identical to an " +
      "unpruned rerank over the plain vectors table, at nprobe that " +
      "genuinely excludes cells") {
    val path = tmpPath()
    IncrementalBqIndex.build(emb, path, numCells = 8)
    // the store's vectors carry the cell column; the public reader stays
    // (vec_id, embedding)
    val raw = spark.read.parquet(s"$path/vectors")
    assert(raw.columns.contains("cell"), "new layout must carry cell")
    assert(IncrementalBqIndex.vectors(spark, path).columns.toSeq ==
      Seq("vec_id", "embedding"))
    // nprobe=1 prunes 7 of 8 cells out of the rerank scan; results must
    // equal the same model served with the unpruned plain table
    for (np <- Seq(1, 2)) {
      val pruned = IncrementalBqIndex.knnJoin(spark, path, probes, k = 5,
          nprobe = np, rerank = 20, scoreDigits = 6)
        .select("query_id", "neighbor_id", "rank")
        .collect().map(_.toSeq).toSet
      val unpruned = IvfBq.knnJoin(IncrementalBqIndex.model(spark, path),
          IncrementalBqIndex.vectors(spark, path), probes, k = 5,
          nprobe = np, rerank = 20, scoreDigits = 6)
        .select("query_id", "neighbor_id", "rank")
        .collect().map(_.toSeq).toSet
      assert(pruned == unpruned, s"nprobe=$np pruned != unpruned")
    }
    IncrementalBqIndex.drop(spark, path)
  }

  test("legacy (pre-cell) store: serves unpruned with identical results, " +
      "and appends keep the legacy vectors layout") {
    val path = tmpPath()
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    IncrementalBqIndex.build(a, path, numCells = 4)
    val modern = serve(path)
    // downgrade the store in place to the pre-round-14 layout: meta
    // without vec_cell, vectors without the cell column
    import spark.implicits._
    val legacyVecs = spark.read.parquet(s"$path/vectors")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val f = new org.apache.hadoop.fs.Path(s"$path/vectors")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$path/vectors"), true)
    legacyVecs.toSeq.toDF("vec_id", "embedding")
      .write.parquet(s"$path/vectors/epoch=bootstrap")
    val meta = spark.read.parquet(s"$path/meta")
      .select("residual", "fit_n", "family", "rot_seed").collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getString(2), r.getLong(3)))
    f.delete(new org.apache.hadoop.fs.Path(s"$path/meta"), true)
    meta.toSeq.toDF("residual", "fit_n", "family", "rot_seed")
      .coalesce(1).write.parquet(s"$path/meta")
    // legacy store serves the same results (prune off)
    assert(serve(path) == modern)
    // an append keeps the legacy layout — no cell column anywhere, so a
    // mixed union can never null-out cells and break the prune
    IncrementalBqIndex.append(b, path, epochTag = Some("b1"))
    assert(!spark.read.parquet(s"$path/vectors").columns.contains("cell"))
    assert(serve(path) == twin(a, emb))
    // fold compaction UPGRADES to the cell layout; serving unchanged
    val before = serve(path)
    IncrementalBqIndex.compact(spark, path, refit = false)
    assert(spark.read.parquet(s"$path/vectors").columns.contains("cell"))
    assert(serve(path) == before)
    IncrementalBqIndex.drop(spark, path)
  }
}
