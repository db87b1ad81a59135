package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{KnnJoin, Recall}
import graft.sources.VectorSources
import graft.streaming.IncrementalBqIndex

/** FEDERATED serving at the 100M point (VERDICT r13 #2): the 100 TB
  * serving story is m per-shard [[IncrementalBqIndex]] stores behind
  * `knnJoinFederated` — per-tenant / per-day shards, each with its own
  * frozen quantizer — and it has been bench-measured only at 1M
  * (FedServingBenchMain, r9). This main builds m shards over the SAME
  * 100M corpus `Ivf100MBenchMain` anchors (sliced by vec_id % m) and
  * serves at a MATCHED total budget: per-shard C = 1024/m and the same
  * nprobe keeps the touched fraction equal (m shards × nprobe/(C/m)
  * over n/m rows each ≡ nprobe/C over n), per-shard rerank = total/m
  * keeps the candidate volume equal. Cross-shard scores are comparable
  * by the rerank contract (exact cosine on originals), so the merge is
  * exact given each shard's candidates.
  *
  * Phases (fresh JVM each, the Ivf100MBenchMain convention):
  *  - `build n dim m cellsTotal path` — m shard stores (rabitq family)
  *  - `serve n dim m cellsTotal path [nq] [nprobe] [rerankTotal]`
  *
  *   scripts/run_main.sh graft.bench.Fed100MBenchMain build 100000000 64 4 1024 /tmp/fed100m
  */
object Fed100MBenchMain {
  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "build"
    val n = if (args.length > 1) args(1).toLong else 100000000L
    val dim = if (args.length > 2) args(2).toInt else 64
    val m = if (args.length > 3) args(3).toInt else 4
    val cellsTotal = if (args.length > 4) args(4).toInt else 1024
    val path = if (args.length > 5) args(5) else "/tmp/fed100m"
    val nq = if (args.length > 6) args(6).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the SAME synthetic corpus as Ivf100MBenchMain (same seed/geometry)
    def base = VectorSources
      .syntheticClustered(spark, n, dim, numClusters = 4 * cellsTotal,
        spread = 0.15, seed = 42)
      .select("vec_id", "embedding")
    def shardPaths = (0 until m).map(i => s"$path/shard$i")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    mode match {
      case "build" =>
        val perShardCells = math.max(1, cellsTotal / m)
        val (_, wall) = timed {
          (0 until m).foreach { i =>
            IncrementalBqIndex.build(
              base.filter(pmod(col("vec_id"), lit(m)) === i),
              s"$path/shard$i", numCells = perShardCells, family = "rabitq")
            println(s"FED100M shard $i built")
          }
        }
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bytes = fs.getContentSummary(
          new org.apache.hadoop.fs.Path(path)).getLength
        println(f"FED100M build n=$n d=$dim m=$m C/shard=$perShardCells " +
          f"wall=$wall%.0fs (${n / wall / 1e6}%.2fM vec/s) " +
          f"total=${bytes / 1e9}%.1fGB")

      case "serve" =>
        val perShardCells = math.max(1, cellsTotal / m)
        val nprobe = if (args.length > 7) args(7).toInt
          else math.max(1, (perShardCells * 0.015625).toInt)
        val rerankTotal = if (args.length > 8) args(8).toInt else 10000
        val rerank = math.max(100, rerankTotal / m)
        val probes = base.filter(col("vec_id") < nq)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"))
          .cache()
        probes.count()
        val (c1, cold) = timed(IncrementalBqIndex.knnJoinFederated(spark,
          shardPaths, probes, k = 10, nprobe = nprobe, rerank = rerank,
          u4 = true).count())
        val (_, warm) = timed(IncrementalBqIndex.knnJoinFederated(spark,
          shardPaths, probes, k = 10, nprobe = nprobe, rerank = rerank,
          u4 = true).count())
        println(f"FED100M serve n=$n m=$m nprobe=$nprobe/shard " +
          f"(touched=${nprobe.toDouble / perShardCells}%.4f) " +
          f"rerank=$rerank/shard nq=$nq rows=$c1 " +
          f"cold=$cold%.1fs (${nq / cold}%.1f qps) " +
          f"warm=$warm%.1fs (${nq / warm}%.1f qps)")

        // recall anchor vs the exact 100M scan (20 probes)
        val anchor = probes.filter(col("query_id") < 20).cache()
        anchor.count()
        val (exact, exactWall) = timed {
          val e = KnnJoin.exactKnnJoin(base, anchor, k = 10,
            metric = "cosine").cache()
          e.count(); e
        }
        val got = IncrementalBqIndex.knnJoinFederated(spark, shardPaths,
          anchor, k = 10, nprobe = nprobe, rerank = rerank, u4 = true)
        val rec = Recall.microAvgRecall(got, exact)
          .select("recall").first().getDouble(0)
        println(f"FED100M recall m=$m nprobe=$nprobe rerank=$rerank " +
          f"recall@10=$rec%.3f (exact anchor $exactWall%.0fs)")

      case other => sys.error(s"unknown mode '$other' (build | serve)")
    }
    spark.stop()
  }
}
