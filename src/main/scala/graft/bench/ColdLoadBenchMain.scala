package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{HnswParams, IvfHnsw}
import graft.sources.VectorSources

/** Cold-load serving cost (VERDICT-r5 next #7): a LOADED hybrid model
  * rebuilds executor sub-indexes from adjacency rows on first touch
  * ([[graft.hnsw.IvfHnsw.load]] is lazy; [[SubIndexCache]] absorbs
  * repeats). The scale question: does cell-file pruning make the cold
  * first QUERY cheap (touch nprobe cells ⇒ read+rebuild only those), or
  * does rebuild dominate regardless?
  *
  * Cold means a fresh JVM, so this main runs in phases across separate
  * invocations against a saved model:
  *  - `build n dim cells path`   — fit + save (pays the one-time cost)
  *  - `serve n dim cells path`   — cold 1-probe nprobe=2 (minimal touched
  *    set), warm repeat, then a 100-probe wave and its warm repeat
  *  - `serveall n dim cells path` — cold 1-probe with nprobe=cells (full
  *    rebuild: the no-pruning baseline the pruned path is measured against)
  *
  * `sbt "runMain graft.bench.ColdLoadBenchMain build 10000000 64 128 /tmp/coldload10m"`
  */
object ColdLoadBenchMain {
  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "build"
    val n = if (args.length > 1) args(1).toLong else 10000000L
    val dim = if (args.length > 2) args(2).toInt else 64
    val cells = if (args.length > 3) args(3).toInt else 128
    val path = if (args.length > 4) args(4) else "/tmp/coldload"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def probeSet(count: Int) = VectorSources
      .syntheticClustered(spark, n, dim, numClusters = 4 * cells,
        spread = 0.15, seed = 42)
      .filter(col("vec_id") < count)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"COLDLOAD $label wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    mode match {
      case "build" =>
        val base = VectorSources
          .syntheticClustered(spark, n, dim, numClusters = 4 * cells,
            spread = 0.15, seed = 42)
          .select("vec_id", "embedding")
        val model = timed(s"build n=$n cells=$cells")(
          IvfHnsw.fit(base, cells,
            HnswParams(m = 16, efConstruction = 200, efSearch = 100,
              numPartitions = cells),
            balanceSlack = 0.2))
        timed("save")(IvfHnsw.save(model, path))

      case "serve" =>
        val model = IvfHnsw.load(spark, path)
          .getOrElse(sys.error(s"no model at $path"))
        val q1 = probeSet(1).cache(); q1.count()
        val q100 = probeSet(100).cache(); q100.count()
        // cold: fresh JVM, nothing cached — 1 probe touches nprobe=2 cells
        val c1 = timed("cold 1-probe nprobe=2")(
          IvfHnsw.knnJoin(model, q1, k = 10, nprobe = 2).count())
        val w1 = timed("warm 1-probe nprobe=2")(
          IvfHnsw.knnJoin(model, q1, k = 10, nprobe = 2).count())
        // a 100-probe wave fans out over more cells (mostly still cold)
        val c100 = timed("100-probe nprobe=2 (mixed cold)")(
          IvfHnsw.knnJoin(model, q100, k = 10, nprobe = 2).count())
        // two warm repeats: the FIRST warm wave pays GC promotion of the
        // sub-indexes the cold wave just built (they graduate to old gen
        // under this wave's scan churn); the second is steady state
        val w100 = timed("warm 100-probe nprobe=2")(
          IvfHnsw.knnJoin(model, q100, k = 10, nprobe = 2).count())
        val w100b = timed("warm2 100-probe nprobe=2")(
          IvfHnsw.knnJoin(model, q100, k = 10, nprobe = 2).count())
        require(c1 == 10 && w1 == 10 && c100 == 1000 && w100 == 1000 &&
          w100b == 1000, s"row counts off: $c1 $w1 $c100 $w100 $w100b")

      case "serveall" =>
        val model = IvfHnsw.load(spark, path)
          .getOrElse(sys.error(s"no model at $path"))
        val q1 = probeSet(1).cache(); q1.count()
        val call = timed(s"cold 1-probe nprobe=$cells (full rebuild)")(
          IvfHnsw.knnJoin(model, q1, k = 10, nprobe = cells).count())
        val wall = timed(s"warm 1-probe nprobe=$cells")(
          IvfHnsw.knnJoin(model, q1, k = 10, nprobe = cells).count())
        require(call == 10 && wall == 10, s"row counts off: $call $wall")

      case "filtered" =>
        // metadata-filtered ANN k-guarantee at scale: 100 probes against
        // the saved 10M model under a 1% predicate (escalation regime —
        // enough matches that deeper probes satisfy most queries) and a
        // 0.01% predicate (guarantee regime — the exact fallback over the
        // ~1k-row filtered base must fire). Row-count checks are the
        // guarantee itself: k rows per query in both regimes.
        val model = IvfHnsw.load(spark, path)
          .getOrElse(sys.error(s"no model at $path"))
        val base = VectorSources
          .syntheticClustered(spark, n, dim, numClusters = 4 * cells,
            spread = 0.15, seed = 42)
          .select("vec_id", "embedding")
        val q = probeSet(100).cache(); q.count()
        val k = 10
        for ((label, pred) <- Seq(
            ("1pct", col("vec_id") % 100 === 0),
            ("0.01pct", col("vec_id") % 10000 === 0))) {
          val rows = timed(s"filtered $label 100-probe k=$k")(
            graft.operators.FilteredAnn.knnJoin(
              base, q, k, pred,
              (qs, kp, round) => IvfHnsw.knnJoin(model, qs, kp,
                nprobe = 2 << round),
              metric = "cosine").count())
          require(rows == 100L * k, s"guarantee broken: $label -> $rows")
        }

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
