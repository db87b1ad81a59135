package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Bq, IvfBq, KnnJoin, Recall, Sq}
import graft.sources.VectorSources

/** Compressed-scan serving ladder: the bytes-per-vector story measured.
  * At 100 TB the exact float32 scan is bound by touched bytes; SQ8 cuts
  * them 4× and BQ (sign bits) 32×, each with a bounded exact rerank. This
  * main measures all three against the same 1M-vector corpus in one run
  * (same-run ratios only — this box's wall clock varies across runs):
  *
  *   - exact cosine scan, `probesExact` queries (the uncompressed anchor;
  *     its per-query cost is the window over n×q scored rows — the plan
  *     whose byte+shuffle cost the compressed paths exist to avoid)
  *   - SQ8 ADC scan + rerank, `probesSq` queries via `knnJoinBatched`
  *   - BQ Hamming scan + rerank, `probesBq` queries via `knnJoinBatched`
  *
  * Probe counts differ per path (each sized so the run stays in minutes);
  * qps numbers are per-path amortized walls, not a head-to-head at equal
  * batch shape — the honest comparison is qps × recall at the stated
  * probe count. Recall anchors on the first 100 queries vs the exact
  * scan in each path's own metric.
  *
  * `sbt "runMain graft.bench.CompressedScanBenchMain 1000000 64 100 2000 10000"`
  */
object CompressedScanBenchMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val probesExact = if (args.length > 2) args(2).toInt else 100
    val probesSq = if (args.length > 3) args(3).toInt else 2000
    val probesBq = if (args.length > 4) args(4).toInt else 10000
    val batchRows = if (args.length > 5) args(5).toInt else 2000
    // "uniform" is the adversarial shape for IVF routing (true neighbors
    // scatter across cells — the r5 hybrid-index finding); "clustered" is
    // the corpus shape cell routing serves
    val corpus = if (args.length > 6) args(6) else "uniform"
    // comma-set of ladder rungs to run (10M runs skip the flat scans)
    val paths: Set[String] =
      if (args.length > 7) args(7).split(",").map(_.trim).toSet
      else Set("exact", "sq", "bq", "ivfbq")
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
        .syntheticClustered(spark, n, dim, numClusters = 256,
          spread = 0.15, seed = 42)
        .select("vec_id", "embedding")
      case _ => VectorSources.synthetic(spark, n, dim, seed = 42)
    }).cache()
    base.count()
    def probeSet(nq: Int) = base.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val anchor = probeSet(100).cache(); anchor.count()
    val exactCos = KnnJoin.exactKnnJoin(base, anchor, k = 10,
      metric = "cosine").cache()
    exactCos.count()
    // the euclidean anchor is another full exact scan — only pay for it
    // when the SQ rung (the euclidean-contract path) actually runs
    lazy val exactEuc = {
      val e = KnnJoin.exactKnnJoin(base, anchor, k = 10,
        metric = "euclidean").cache()
      e.count(); e
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // exact float32 scan (cosine): 4·d bytes/vector touched per query.
    // Probe ids disjoint from the anchor so the cached anchor plan can't
    // serve the timed run.
    if (paths("exact")) {
      val q = base.filter(col("vec_id") >= 1000 &&
          col("vec_id") < 1000 + probesExact)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        .cache()
      q.count()
      val (cnt, wall) = timed(KnnJoin.exactKnnJoin(base, q, k = 10,
        metric = "cosine").count())
      println(f"CSCAN exact n=$n d=$dim bytes/vec=${4 * dim} nq=$probesExact " +
        f"wall=$wall%.1fs qps=${probesExact / wall}%.1f rows=$cnt recall=1.0")
    }

    // SQ8 ADC scan (euclidean contract): d bytes/vector
    if (paths("sq")) {
      val (m, fitS) = timed(Sq.fit(base))
      val q = probeSet(probesSq).cache(); q.count()
      val (cnt, wall) = timed(
        Sq.knnJoinBatched(m, base, q, k = 10, rerank = 100,
          batchRows = batchRows).count())
      val rec = Recall.microAvgRecall(
          Sq.knnJoin(m, base, anchor, k = 10, rerank = 100), exactEuc)
        .select("recall").first().getDouble(0)
      println(f"CSCAN sq8 n=$n d=$dim bytes/vec=$dim fit=$fitS%.1fs " +
        f"nq=$probesSq wall=$wall%.1fs qps=${probesSq / wall}%.0f " +
        f"rows=$cnt recall@100=$rec%.3f")
      m.encoded.unpersist()
    }

    // BQ Hamming scan (cosine contract): d/8 bytes/vector. The overfetch
    // must scale with n to hold recall (d-bit codes rank ever-more
    // candidates into the same integer Hamming levels as the corpus
    // grows), so measure a rerank ladder at the same corpus.
    if (paths("bq")) {
      val (m, fitS) = timed(Bq.fit(base))
      val q = probeSet(probesBq).cache(); q.count()
      val (cnt, wall) = timed(
        Bq.knnJoinBatched(m, base, q, k = 10, rerank = 100,
          batchRows = batchRows).count())
      val rec = Recall.microAvgRecall(
          Bq.knnJoin(m, base, anchor, k = 10, rerank = 100), exactCos)
        .select("recall").first().getDouble(0)
      println(f"CSCAN bq n=$n d=$dim bytes/vec=${dim / 8} fit=$fitS%.1fs " +
        f"nq=$probesBq wall=$wall%.1fs qps=${probesBq / wall}%.0f " +
        f"rows=$cnt recall@100=$rec%.3f rerank=100")
      Seq(1000, 4000).foreach { rr =>
        val nq = probesBq / 5
        val qr = probeSet(nq).cache(); qr.count()
        val (_, w2) = timed(
          Bq.knnJoinBatched(m, base, qr, k = 10, rerank = rr,
            batchRows = batchRows).count())
        val r2 = Recall.microAvgRecall(
            Bq.knnJoin(m, base, anchor, k = 10, rerank = rr), exactCos)
          .select("recall").first().getDouble(0)
        println(f"CSCAN bq n=$n d=$dim bytes/vec=${dim / 8} nq=$nq " +
          f"wall=$w2%.1fs qps=${nq / w2}%.0f recall@100=$r2%.3f rerank=$rr")
      }
      m.encoded.unpersist()
    }

    // RaBitQ (sign bits + one 8-byte factor): the answer to the bq rung's
    // Hamming-tie collapse at d≥768 — the real-valued unbiased estimator
    // has no tie mass, so rerank=100 should hold where bq needs 0.4%·n.
    // Timed path is the bit-sliced u4 popcount kernel (the production
    // scan); recall is anchored for BOTH kernels.
    if (paths("rabitq")) {
      import graft.operators.RabitQ
      val (m, fitS) = timed(RabitQ.fit(base))
      val q = probeSet(probesBq).cache(); q.count()
      val (cnt, wall) = timed(
        RabitQ.knnJoinU4Batched(m, base, q, k = 10, rerank = 100,
          batchRows = batchRows).count())
      val recExact = Recall.microAvgRecall(
          RabitQ.knnJoin(m, base, anchor, k = 10, rerank = 100), exactCos)
        .select("recall").first().getDouble(0)
      val recU4 = Recall.microAvgRecall(
          RabitQ.knnJoinU4(m, base, anchor, k = 10, rerank = 100), exactCos)
        .select("recall").first().getDouble(0)
      println(f"CSCAN rabitq n=$n d=$dim bytes/vec=${dim / 8 + 8} " +
        f"fit=$fitS%.1fs nq=$probesBq wall=$wall%.1fs " +
        f"qps=${probesBq / wall}%.0f rows=$cnt recall@100=$recU4%.3f " +
        f"recall_exact_est@100=$recExact%.3f rerank=100 kernel=u4")
      val r1k = Recall.microAvgRecall(
          RabitQ.knnJoinU4(m, base, anchor, k = 10, rerank = 1000), exactCos)
        .select("recall").first().getDouble(0)
      println(f"CSCAN rabitq n=$n d=$dim bytes/vec=${dim / 8 + 8} " +
        f"recall@100=$r1k%.3f rerank=1000 kernel=u4 (anchor only)")
      m.encoded.unpersist()
    }

    // IVF × PQ (euclidean contract, AUTO numSub = d/8): validates the
    // retuned subspace default at embedding widths — 2 bytes/subspace
    // ADC codes, cell-routed scan, exact rerank
    if (paths("ivfpq")) {
      import graft.operators.IvfPq
      val cells = if (n >= 10000000L) 256 else 64
      val (m, fitS) = timed(IvfPq.fit(base, numCells = cells))
      val nq = probesBq / 5
      val q = probeSet(nq).cache(); q.count()
      Seq((4, 1000), (8, 1000)).foreach { case (np, rr) =>
        val (cnt, wall) = timed(
          IvfPq.knnJoinBatched(m, base, q, k = 10, nprobe = np, rerank = rr,
            batchRows = batchRows).count())
        val rec = Recall.microAvgRecall(
            IvfPq.knnJoin(m, base, anchor, k = 10, nprobe = np, rerank = rr),
          exactEuc).select("recall").first().getDouble(0)
        println(f"CSCAN ivfpq n=$n d=$dim bytes/vec=${2 * m.numSub} " +
          f"numSub=${m.numSub} C=$cells nprobe=$np fit=$fitS%.1fs nq=$nq " +
          f"wall=$wall%.1fs qps=${nq / wall}%.0f rows=$cnt " +
          f"recall@100=$rec%.3f rerank=$rr")
      }
      m.encoded.unpersist()
    }

    // IVF × BQ: the high-recall configuration — cells divide the Hamming
    // scan AND the candidate exchange by ~nprobe/C, so the big rerank
    // that standalone BQ can't afford becomes payable
    if (paths("ivfbq")) {
      // the P-sizing rule: scale C with n to hold cell size constant
      val cells = if (n >= 10000000L) 256 else 64
      val (m, fitS) = timed(IvfBq.fit(base, numCells = cells))
      val nq = probesBq / 5
      val q = probeSet(nq).cache(); q.count()
      Seq((4, 100), (4, 1000), (4, 4000), (8, 4000)).foreach { case (np, rr) =>
        val (cnt, wall) = timed(
          IvfBq.knnJoinBatched(m, base, q, k = 10, nprobe = np, rerank = rr,
            batchRows = batchRows).count())
        val rec = Recall.microAvgRecall(
            IvfBq.knnJoin(m, base, anchor, k = 10, nprobe = np, rerank = rr),
          exactCos).select("recall").first().getDouble(0)
        println(f"CSCAN ivfbq n=$n d=$dim bytes/vec=${dim / 8} C=$cells " +
          f"nprobe=$np fit=$fitS%.1fs nq=$nq wall=$wall%.1fs " +
          f"qps=${nq / wall}%.0f rows=$cnt recall@100=$rec%.3f rerank=$rr")
      }
      m.encoded.unpersist()
    }

    // IVF × RaBitQ: same byte budget as IVF×BQ (d/8 codes + 8-byte factor)
    // but ranked by the unbiased estimator instead of raw Hamming — the
    // claim under test is that the estimator keeps rerank SMALL (100 vs
    // BQ's 0.4%·n at d≥768) because its error shrinks as O(1/√d)
    if (paths("ivfrabitq")) {
      import graft.operators.IvfRabitq
      val cells = if (n >= 10000000L) 256 else 64
      val (m, fitS) = timed(IvfRabitq.fit(base, numCells = cells))
      val nq = probesBq / 5
      val q = probeSet(nq).cache(); q.count()
      // same rerank rungs as ivfbq so the two families compare at
      // matched candidate budgets
      Seq((4, 100), (4, 1000), (4, 4000), (8, 100)).foreach { case (np, rr) =>
        // timed scan = the u4 production kernel (constant per-candidate
        // cost in d); recall reported for BOTH kernels at the anchor
        val (cnt, wall) = timed(
          IvfRabitq.knnJoinU4Batched(m, base, q, k = 10, nprobe = np,
            rerank = rr, batchRows = batchRows).count())
        val rec = Recall.microAvgRecall(
            IvfRabitq.knnJoin(m, base, anchor, k = 10, nprobe = np,
              rerank = rr), exactCos)
          .select("recall").first().getDouble(0)
        val recU4 = Recall.microAvgRecall(
            IvfRabitq.knnJoinU4(m, base, anchor, k = 10, nprobe = np,
              rerank = rr), exactCos)
          .select("recall").first().getDouble(0)
        println(f"CSCAN ivfrabitq n=$n d=$dim bytes/vec=${dim / 8 + 8} " +
          f"C=$cells nprobe=$np fit=$fitS%.1fs nq=$nq wall=$wall%.1fs " +
          f"qps=${nq / wall}%.0f rows=$cnt recall@100=$recU4%.3f " +
          f"recall_exact_est@100=$rec%.3f rerank=$rr kernel=u4")
      }
      m.encoded.unpersist()
    }
    spark.stop()
  }
}
