package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfFlat, Mining}

/** Hard-negative mining SCALE point: exact (one streamed corpus scan
  * per mining pass — the oracle shape) vs IVF-gated (candidates from
  * each anchor's nprobe cells, escalation for under-filled anchors) on
  * a clustered corpus where labels cut ACROSS clusters (label = id mod
  * L — the realistic shape: geometric neighborhoods mix labels, so
  * probed cells hold plenty of negatives and the miner's pruning is
  * honest). Reports wall + negative-pair recall of the gated path vs
  * the exact one.
  *
  * `sbt "runMain graft.bench.MiningScaleMain 1000000 64 128 1000 4"`
  */
object MiningScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val d = if (args.length > 1) args(1).toInt else 64
    val cells = if (args.length > 2) args(2).toInt else 128
    val nAnchors = if (args.length > 3) args(3).toInt else 1000
    val nprobe = if (args.length > 4) args(4).toInt else 4
    val k = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.sources.VectorSources
      .syntheticClustered(spark, n, d, numClusters = cells)
      .select(col("vec_id"), col("embedding"),
        pmod(col("vec_id"), lit(100)).cast("int").as("label"))
      .repartition(cpus.toInt).cache()
    base.count()
    val anchors = base.filter(col("vec_id") < nAnchors)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"), col("label").as("query_label"))
      .cache()
    anchors.count()

    val tFit = System.nanoTime()
    val model = IvfFlat.fit(base, numCells = cells,
      lloydSampleN = 200000)
    val fitS = (System.nanoTime() - tFit) / 1e9

    val t0 = System.nanoTime()
    val exact = Mining.hardNegatives(base, anchors, k = k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactS = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val gated = Mining.hardNegativesIvf(base, model, anchors, k = k,
        nprobe = nprobe)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gatedS = (System.nanoTime() - t1) / 1e9
    model.release()

    val recall = gated.intersect(exact).size.toDouble / exact.size
    println(f"MINING-SCALE n=$n anchors=$nAnchors k=$k cells=$cells " +
      f"fit=$fitS%.1fs exact=$exactS%.1fs gated(nprobe=$nprobe)=$gatedS%.1fs " +
      f"speedup=${exactS / gatedS}%.1fx neg_recall=$recall%.3f " +
      f"rows_exact=${exact.size} rows_gated=${gated.size}")
    spark.stop()
  }
}
