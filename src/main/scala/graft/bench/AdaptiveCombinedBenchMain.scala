package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfBq, KnnJoin, Recall}
import graft.sources.VectorSources

/** The COMBINED adaptive knobs at 10M (VERDICT r10 #4): round 10
  * measured cell-adaptive probing alone (rerank fixed at frac=0.1 both
  * arms) and found dense landings LOSE (0.342 vs fixed 0.458) while
  * sparse landings win (0.906 vs 0.848); the closing claim — "dense
  * landings need rerank depth, the knobs are complementary" — was
  * unmeasured. This main measures it, two ways:
  *
  *  1. CEILING PROBE: adaptive cells + `rerankFrac = 1.0` (exact rerank
  *     of EVERY candidate in the kept cells). Whatever recall this arm
  *     reports is the cell-coverage ceiling — if it stays near the
  *     frac=0.1 number, dense recall is COVERAGE-bound (the kept cell
  *     simply does not contain the true neighbors) and no rerank depth
  *     can buy it back; if it jumps, the knob was rerank depth all
  *     along.
  *
  *  2. MATCHED-BUDGET COMBO: `minCandidates` binary-searched through
  *     the driver-side routing twin until the adaptive arm's mean
  *     touched fraction EQUALS fixed nprobe=2's (the r10 comparison
  *     left adaptive at 0.69x the budget — cheaper, not matched), then
  *     both arms run at rerankFrac 0.1 and 0.3. The VERDICT gate:
  *     combined adaptive ≥ fixed on BOTH landings at equal touched
  *     fraction, or the honest finding that it can't.
  *
  * Corpus/probes/model identical to [[AdaptiveProbeBenchMain]] (same
  * seeds), so rows compare across the two artifacts.
  *
  * `sbt "runMain graft.bench.AdaptiveCombinedBenchMain 10000000 64 256 400"`
  */
object AdaptiveCombinedBenchMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val cells = if (args.length > 2) args(2).toInt else 256
    val nq = if (args.length > 3) args(3).toInt else 400
    val minCand0 = if (args.length > 4) args(4).toInt else 40000
    val maxNp = if (args.length > 5) args(5).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val denseN = n * 4 / 5
    val dense = VectorSources.syntheticClustered(spark, denseN, dim,
        numClusters = 8, spread = 0.15, seed = 42)
      .select("vec_id", "embedding")
    val sparse = VectorSources.syntheticClustered(spark, n - denseN, dim,
        numClusters = 248, spread = 0.15, seed = 77)
      .select((col("vec_id") + denseN).as("vec_id"), col("embedding"))
    val base = dense.unionByName(sparse).cache()
    base.count()
    val model = IvfBq.fit(base, numCells = cells)

    val anchorIds = (0L until 50L) ++ (denseN until denseN + 50L)
    val anchors = base.filter(col("vec_id").isInCollection(anchorIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .cache()
    anchors.count()
    val exact = KnnJoin.exactKnnJoin(base, anchors, k = 10,
      metric = "cosine").cache()
    exact.count()

    // driver-side routing twin (same tie order as the operator)
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
    val anchorVecs = anchors.collect().map(r => r.getSeq[Float](1).toArray)
    def meanTouched(mc: Int, minNp: Int = 1): Double = {
      val fr = anchorVecs.map { q =>
        val ranked = rankedCells(q)
        var cum = 0L; var i = 0
        while (i < ranked.length && (i < minNp || cum < mc)) {
          cum += model.cellCounts.getOrElse(ranked(i), 0L); i += 1
        }
        cum.toDouble / n
      }
      fr.sum / fr.length
    }
    def fixedTouched(np: Int): Double = {
      val fr = anchorVecs.map(q => rankedCells(q).take(np)
        .map(c => model.cellCounts.getOrElse(c, 0L)).sum.toDouble / n)
      fr.sum / fr.length
    }

    def groupRecall(approx: org.apache.spark.sql.DataFrame)
        : (Double, Double, Double) = {
      def r(a: org.apache.spark.sql.DataFrame,
          e: org.apache.spark.sql.DataFrame) =
        Recall.microAvgRecall(a, e).select("recall").first().getDouble(0)
      (r(approx, exact),
        r(approx.filter(col("query_id") < denseN),
          exact.filter(col("query_id") < denseN)),
        r(approx.filter(col("query_id") >= denseN),
          exact.filter(col("query_id") >= denseN)))
    }

    def runAdaptive(tag: String, mc: Int, frac: Double,
        minNp: Int = 1): Unit = {
      val t0 = System.nanoTime()
      val ap = IvfBq.knnJoinAdaptiveProbe(model, base, anchors, k = 10,
        maxNprobe = maxNp, minNprobe = minNp, minCandidates = mc,
        rerankFrac = frac, rerankMin = 100).cache()
      val (rec, dRec, sRec) = groupRecall(ap)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"ACOMBO $tag minCand=$mc minNp=$minNp frac=$frac " +
        f"touched=${meanTouched(mc, minNp)}%.4f recall=$rec%.3f " +
        f"dense=$dRec%.3f sparse=$sRec%.3f wall=$wall%.1fs")
      ap.unpersist(); ()
    }
    def runFixed(tag: String, np: Int, frac: Double): Unit = {
      val t0 = System.nanoTime()
      val fx = IvfBq.knnJoinAdaptive(model, base, anchors, k = 10,
        nprobe = np, rerankFrac = frac, rerankMin = 100).cache()
      val (rec, dRec, sRec) = groupRecall(fx)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"ACOMBO $tag nprobe=$np frac=$frac " +
        f"touched=${fixedTouched(np)}%.4f recall=$rec%.3f " +
        f"dense=$dRec%.3f sparse=$sRec%.3f wall=$wall%.1fs")
      fx.unpersist(); ()
    }

    // ---- 1. ceiling probe: is dense recall coverage- or rerank-bound?
    runAdaptive("r10_anchor", minCand0, 0.1)
    runAdaptive("ceiling", minCand0, 1.0)

    // ---- 2. matched-budget combo: minCand searched to fixed np=2 -----
    val target = fixedTouched(2)
    var lo = 1000; var hi = 2000000
    while (hi - lo > 1000) {
      val mid = (lo + hi) / 2
      if (meanTouched(mid) < target) lo = mid else hi = mid
    }
    val mcMatched = lo
    println(f"ACOMBO matched minCand=$mcMatched " +
      f"(adaptive touched=${meanTouched(mcMatched)}%.4f " +
      f"vs fixed np=2 $target%.4f)")
    Seq(0.1, 0.3).foreach { frac =>
      runAdaptive("combo", mcMatched, frac)
      runFixed("fixed", 2, frac)
    }

    // ---- 3. the both-classes remedy priced: a 2-cell FLOOR plus the
    // escalation — dense landings get fixed np=2's coverage, sparse
    // landings keep escalating to the candidate floor. The touched
    // fraction this arm reports IS the price of serving both classes.
    runAdaptive("floor2", minCand0, 0.1, minNp = 2)
    runFixed("fixed4_ref", 4, 0.1)
    spark.stop()
  }
}
