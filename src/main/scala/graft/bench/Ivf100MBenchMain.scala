package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{KnnJoin, Recall}
import graft.sources.VectorSources
import graft.streaming.IncrementalBqIndex

/** The 100M-VECTOR serving point (VERDICT r12 #4): the 100 TB cost
  * model has been anchored at 10M since round 9 — this main moves the
  * anchor a decade. 100M × 64-d float32 is ~25.6 GB of raw vectors and
  * ~2 GB of RaBitQ codes (8B sign bits + 8B factor per vector), so the
  * corpus fits this box and the question becomes operational: build
  * wall at C=1024 (the P-sizing rule: ~100k vectors/cell, fit on the
  * Lloyd sample — never O(corpus·C) twice), serving qps through the
  * storage-backed cell-routed u4 kernel at a touched fraction MATCHED
  * to the 10M anchor (nprobe 16/1024 ≈ 4/256 ≈ 1.6%), and the COLD
  * serve from the cell-partitioned store in a fresh JVM.
  *
  * Phases (cold means a fresh JVM, so run them as separate invocations):
  *  - `build n dim cells path` — generate + fit + write the full
  *    IncrementalBqIndex rabitq layout (codes, vectors, quantizer)
  *  - `serve n dim cells path [nq]` — cold wave (first touch pays the
  *    store read), warm repeat, recall anchor vs the exact scan
  *
  * `sbt "runMain graft.bench.Ivf100MBenchMain build 100000000 64 1024 /tmp/ivf100m"`
  */
object Ivf100MBenchMain {
  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "build"
    val n = if (args.length > 1) args(1).toLong else 100000000L
    val dim = if (args.length > 2) args(2).toInt else 64
    val cells = if (args.length > 3) args(3).toInt else 1024
    val path = if (args.length > 4) args(4) else "/tmp/ivf100m"
    val nq = if (args.length > 5) args(5).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def base = VectorSources
      .syntheticClustered(spark, n, dim, numClusters = 4 * cells,
        spread = 0.15, seed = 42)
      .select("vec_id", "embedding")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    mode match {
      case "build" =>
        val (_, wall) = timed(IncrementalBqIndex.build(base, path,
          numCells = cells, family = "rabitq"))
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def gb(p: String): Double =
          fs.getContentSummary(new org.apache.hadoop.fs.Path(p))
            .getLength / 1e9
        println(f"IVF100M build n=$n d=$dim C=$cells wall=$wall%.0fs " +
          f"(${n / wall / 1e6}%.2fM vec/s) codes=${gb(s"$path/codes")}%.2fGB " +
          f"vectors=${gb(s"$path/vectors")}%.2fGB " +
          f"bytes/vec=${dim / 8 + 8} (+${4 * dim} rerank float32)")

      case "serve" =>
        // touched fraction matched to the 10M anchor (16/1024 = 1.56%)
        // unless given; rerank defaults to the twin-population knee
        // measured by the recall grid
        val nprobe = if (args.length > 6) args(6).toInt
          else math.max(1, (cells * 0.015625).toInt)
        val rerank = if (args.length > 7) args(7).toInt else 10000
        val probes = base.filter(col("vec_id") < nq)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"))
          .cache()
        probes.count()
        // COLD: the first wave pays the quantizer+codes store read
        val (c1, cold) = timed(IncrementalBqIndex.knnJoin(spark, path,
          probes, k = 10, nprobe = nprobe, rerank = rerank, u4 = true).count())
        // WARM: repeat (OS page cache + parquet footers warm)
        val (_, warm) = timed(IncrementalBqIndex.knnJoin(spark, path,
          probes, k = 10, nprobe = nprobe, rerank = rerank, u4 = true).count())
        println(f"IVF100M serve n=$n C=$cells nprobe=$nprobe rerank=$rerank " +
          f"touched=${nprobe.toDouble / cells}%.4f nq=$nq rows=$c1 " +
          f"cold=$cold%.1fs (${nq / cold}%.1f qps) " +
          f"warm=$warm%.1fs (${nq / warm}%.1f qps)")

        // optional: arg 8 = 0 skips the exact-scan recall anchor (the
        // small-wave latency rows re-measure a store whose recall the
        // 1000-query row already anchored — the 300 s full scan per
        // wave size adds nothing)
        if (args.length > 8 && args(8) == "0") { spark.stop(); return }

        // recall anchor: 20 probes vs the exact 100M scan
        val anchor = probes.filter(col("query_id") < 20).cache()
        anchor.count()
        val (exact, exactWall) = timed {
          val e = KnnJoin.exactKnnJoin(base, anchor, k = 10,
            metric = "cosine").cache()
          e.count(); e
        }
        val got = IncrementalBqIndex.knnJoin(spark, path, anchor,
          k = 10, nprobe = nprobe, rerank = 100, u4 = true)
        val rec = Recall.microAvgRecall(got, exact)
          .select("recall").first().getDouble(0)
        println(f"IVF100M recall n=$n nprobe=$nprobe rerank=100 " +
          f"recall@10=$rec%.3f (exact anchor: 20 probes, " +
          f"$exactWall%.0fs full scan)")

      case "recall" =>
        // diagnosis grid: exact anchor computed ONCE (cached parquet),
        // then (nprobe, rerank) swept against it
        val anchor = base.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"))
          .cache()
        anchor.count()
        val anchorPath = s"$path/exact_anchor"
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(anchorPath))) {
          val (_, w) = timed(KnnJoin.exactKnnJoin(base, anchor, k = 10,
              metric = "cosine")
            .write.mode("overwrite").parquet(anchorPath))
          println(f"IVF100M exact-anchor computed in $w%.0fs")
        }
        val exact = spark.read.parquet(anchorPath).cache()
        exact.count()
        // one (nprobe, rerank) pair per JVM when args are given: each
        // point's rerank join shuffles the full vectors frame, and 9
        // points' shuffle files in ONE app filled the disk (measured)
        val grid =
          if (args.length > 6) Seq((args(5).toInt, args(6).toInt))
          else Seq((4, 100), (4, 1000), (16, 1000))
        for ((np, rr) <- grid) {
          val (got, w) = timed {
            val g = IncrementalBqIndex.knnJoin(spark, path, anchor,
              k = 10, nprobe = np, rerank = rr, u4 = true).cache()
            g.count(); g
          }
          val rec = Recall.microAvgRecall(got, exact)
            .select("recall").first().getDouble(0)
          got.unpersist()
          println(f"IVF100M grid nprobe=$np rerank=$rr " +
            f"recall@10=$rec%.3f wall=$w%.0fs")
        }

      case "compact" =>
        // fold-only compaction — rewrites codes into the cell-sorted
        // layout (writeCodes) without refitting the quantizer
        val (_, w) = timed(IncrementalBqIndex.compact(spark, path))
        println(f"IVF100M compact wall=$w%.0fs")

      case "sortcodes" =>
        // codes-only in-place rewrite into the cell-sorted layout (a
        // delete-free store needs no vectors rewrite; full compact's
        // 26 GB vectors copy would not fit the box's remaining disk)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val codes = spark.read.parquet(s"$path/codes")
          .select("cell", "id", "bits", "g")
        val (_, w) = timed {
          codes.repartitionByRange(64, col("cell"))
            .sortWithinPartitions("cell")
            .write.mode("overwrite")
            .option("parquet.block.size", (8 * 1024 * 1024).toString)
            .parquet(s"$path/codes_sorted/epoch=bootstrap")
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/codes"), true)
          fs.rename(new org.apache.hadoop.fs.Path(s"$path/codes_sorted"),
            new org.apache.hadoop.fs.Path(s"$path/codes"))
        }
        println(f"IVF100M sortcodes wall=$w%.0fs")

      case other =>
        sys.error(s"unknown mode '$other' (build | serve | recall | compact)")
    }
    spark.stop()
  }
}
