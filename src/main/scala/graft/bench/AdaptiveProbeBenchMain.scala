package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfBq, KnnJoin, Recall}
import graft.sources.VectorSources

/** Adaptive-nprobe vs fixed-nprobe at scale on a SKEWED clustered
  * corpus — the knob's whole point, measured: `knnJoinAdaptiveProbe`
  * stops probing once the ranked cells' cumulative LIVE population
  * covers `minCandidates`, so a query landing in dense cells touches
  * few cells and one landing in sparse cells escalates. On a corpus
  * with ~10:1 cell-population skew (80% of points in 8 clusters, 20%
  * across 248), the comparison at MATCHED mean touched fraction is:
  * fixed nprobe over-scans dense landings and under-scans sparse ones;
  * adaptive equalizes the candidate mass per query.
  *
  * Reports, for adaptive and the touched-fraction-matched fixed
  * setting: recall@100 vs the exact scan, qps over `nq` probes, mean/max
  * cells kept, and mean touched corpus fraction (computed driver-side
  * from the model's cellCounts through the same routing the operator
  * uses).
  *
  * `sbt "runMain graft.bench.AdaptiveProbeBenchMain 10000000 64 256 400"`
  */
object AdaptiveProbeBenchMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val cells = if (args.length > 2) args(2).toInt else 256
    val nq = if (args.length > 3) args(3).toInt else 400
    val minCand = if (args.length > 4) args(4).toInt else 40000
    val maxNp = if (args.length > 5) args(5).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // skewed corpus: 80% of mass in 8 tight clusters, 20% across 248
    val denseN = n * 4 / 5
    val dense = VectorSources.syntheticClustered(spark, denseN, dim,
        numClusters = 8, spread = 0.15, seed = 42)
      .select("vec_id", "embedding")
    val sparse = VectorSources.syntheticClustered(spark, n - denseN, dim,
        numClusters = 248, spread = 0.15, seed = 77)
      .select((col("vec_id") + denseN).as("vec_id"), col("embedding"))
    val base = dense.unionByName(sparse).cache()
    base.count()

    val (model, fitS) = {
      val t0 = System.nanoTime()
      val m = IvfBq.fit(base, numCells = cells)
      (m, (System.nanoTime() - t0) / 1e9)
    }
    val pops = model.cellCounts.values.toArray.sorted
    println(f"APROBE corpus n=$n dim=$dim C=$cells fit=$fitS%.1fs " +
      f"cellpop p50=${pops(pops.length / 2)} p99=${pops(pops.length * 99 / 100)} " +
      f"max=${pops.last} (skew ${pops.last.toDouble / pops(pops.length / 2)}%.1fx)")

    // probes: half dense-region, half sparse-region ids
    def probeIds = (0L until nq / 2) ++ (denseN until denseN + nq / 2)
    val probes = base.filter(col("vec_id").isInCollection(probeIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .cache()
    probes.count()
    val anchorIds = (0L until 50L) ++ (denseN until denseN + 50L)
    val anchors = base.filter(col("vec_id").isInCollection(anchorIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .cache()
    anchors.count()
    val exact = KnnJoin.exactKnnJoin(base, anchors, k = 10,
      metric = "cosine").cache()
    exact.count()

    // driver-side routing twin (cosine, ties (s desc, cell desc)) for
    // touched-fraction accounting
    val cents = model.centroids.sortBy(_._1)
    def rankedCells(q: Array[Float]): Array[Int] = {
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i); i += 1
        }
        if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
      }
      cents.map { case (c, v) => (c, cos(q, v)) }
        .sortBy { case (c, s) => (-s, -c) }.map(_._1)
    }
    val probeVecs = probes.collect()
      .map(r => r.getSeq[Float](1).toArray)
    def touched(kept: Array[Array[Int]]): (Double, Double, Int) = {
      val tp = kept.map(_.map(c => model.cellCounts.getOrElse(c, 0L)).sum)
      (tp.sum.toDouble / tp.length / n,
        kept.map(_.length.toDouble).sum / kept.length, kept.map(_.length).max)
    }

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- adaptive ---------------------------------------------------
    val adKept = probeVecs.map { q =>
      val ranked = rankedCells(q)
      val keep = scala.collection.mutable.ArrayBuffer.empty[Int]
      var cum = 0L; var i = 0
      while (i < ranked.length && (keep.isEmpty || cum < minCand)) {
        keep += ranked(i)
        cum += model.cellCounts.getOrElse(ranked(i), 0L)
        i += 1
      }
      keep.toArray
    }
    val (adFrac, adMean, adMax) = touched(adKept)
    // dense-landing vs sparse-landing recall separately: fixed nprobe
    // trades one group against the other; adaptive serves both from the
    // same mean budget
    def groupRecall(approx: org.apache.spark.sql.DataFrame): (Double, Double) = {
      def r(filtered: org.apache.spark.sql.DataFrame,
          ex: org.apache.spark.sql.DataFrame) =
        Recall.microAvgRecall(filtered, ex).select("recall").first().getDouble(0)
      (r(approx.filter(col("query_id") < denseN),
          exact.filter(col("query_id") < denseN)),
        r(approx.filter(col("query_id") >= denseN),
          exact.filter(col("query_id") >= denseN)))
    }
    val (adRows, adWall) = timed(
      IvfBq.knnJoinAdaptiveProbe(model, base, probes, k = 10,
        maxNprobe = maxNp, minNprobe = 1, minCandidates = minCand,
        rerankFrac = 0.1, rerankMin = 100).count())
    val adApprox = IvfBq.knnJoinAdaptiveProbe(model, base, anchors, k = 10,
      maxNprobe = maxNp, minNprobe = 1, minCandidates = minCand,
      rerankFrac = 0.1, rerankMin = 100).cache()
    val adRec = Recall.microAvgRecall(adApprox, exact)
      .select("recall").first().getDouble(0)
    val (adDense, adSparse) = groupRecall(adApprox)
    println(f"APROBE adaptive minCand=$minCand touched=$adFrac%.4f " +
      f"cells mean=$adMean%.1f max=$adMax nq=$nq wall=$adWall%.1fs " +
      f"qps=${nq / adWall}%.0f rows=$adRows recall@100=$adRec%.3f " +
      f"(dense=$adDense%.3f sparse=$adSparse%.3f)")

    // ---- fixed nprobe at the matched mean cell count ----------------
    Seq(math.max(1, math.round(adMean).toInt),
        math.max(1, math.ceil(adMean * 2).toInt)).distinct.foreach { np =>
      val fxKept = probeVecs.map(q => rankedCells(q).take(np))
      val (fxFrac, fxMean, _) = touched(fxKept)
      val (fxRows, fxWall) = timed(
        IvfBq.knnJoinAdaptive(model, base, probes, k = 10, nprobe = np,
          rerankFrac = 0.1, rerankMin = 100).count())
      val fxApprox = IvfBq.knnJoinAdaptive(model, base, anchors, k = 10,
        nprobe = np, rerankFrac = 0.1, rerankMin = 100).cache()
      val fxRec = Recall.microAvgRecall(fxApprox, exact)
        .select("recall").first().getDouble(0)
      val (fxDense, fxSparse) = groupRecall(fxApprox)
      println(f"APROBE fixed nprobe=$np touched=$fxFrac%.4f " +
        f"cells mean=$fxMean%.1f nq=$nq wall=$fxWall%.1fs " +
        f"qps=${nq / fxWall}%.0f rows=$fxRows recall@100=$fxRec%.3f " +
        f"(dense=$fxDense%.3f sparse=$fxSparse%.3f)")
    }
    spark.stop()
  }
}
