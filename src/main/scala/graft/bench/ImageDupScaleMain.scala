package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ImageDup, Multimodal}
import graft.sources.VectorSources

/** Perceptual image dedup at scale: REAL codec throughput (ImageIO
  * decode + 8x8 pooling + aHash per image) and the banded candidate
  * join's cost against the all-pairs count it avoids. The corpus is
  * clustered synthetic vectors rendered to actual BMP payloads; every
  * `plantEvery`-th image also appears as a PNG RE-ENCODE under a twin
  * id — the measured run must find every twin at Hamming 0 (the
  * codec-invariance recall floor), through two different codecs' bytes.
  *
  * `sbt "runMain graft.bench.ImageDupScaleMain 1000000 100"`
  */
object ImageDupScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val plantEvery = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "48g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // clustered 64-d vectors → real 8x8 BMPs; every plantEvery-th image
    // gets a PNG twin at id + n (same pixels, different codec bytes).
    // Cluster count scales with n (bounded ~100-image near-dup clusters,
    // the realistic corpus shape): within-cluster pair counts stay linear
    // in n instead of exploding quadratically per cluster.
    val base = VectorSources.syntheticClustered(spark, n, 64,
        numClusters = math.max(1024L, n / 100).toInt, spread = 0.15)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, v) =>
          val px = Multimodal.quantize255(v)
          val bmp = (id, Multimodal.encodeGray(px, 8, 8, "bmp"))
          if (id % plantEvery == 0)
            Iterator(bmp, (id + n, Multimodal.encodeGray(px, 8, 8, "png")))
          else Iterator.single(bmp)
        }
      }
      .toDF("media_id", "content")
      .persist()
    val total = base.count()
    println(s"[imagedup-scale] corpus $total real image payloads " +
      s"(${total - n} PNG twins)")

    // decode + pool + hash: the per-image kernel cost
    val t0 = System.nanoTime()
    val bands = ImageDup.aHashBands(
      Multimodal.decodeImagePooledRaw(base, grid = 8)).persist()
    val bandRows = bands.count()
    val hashS = (System.nanoTime() - t0) / 1e9
    println(f"[imagedup-scale] decode+hash wall=$hashS%.1fs " +
      f"(${total / hashS}%.0f images/s, $bandRows band rows)")

    // COLLAPSED near-dup edges (nearDupEdges): exact-hash groups become
    // linear star edges, banding runs over representatives only — the
    // 10M lesson: the pairwise formulation spilled >75 GB of
    // within-group pairs (tight clusters share the full 64-bit hash;
    // their duplication mass is quadratic), while the component
    // structure needs only the linear star
    // single-pass agg, no persist: caching this plan on top of the cached
    // bands hit SPARK's nested-cache rebuild NPE (CacheManager
    // recacheByPlan, "SparkPlan.session() is null") at 10M
    val t1 = System.nanoTime()
    val edgeStats = ImageDup.nearDupEdges(bands, maxHamming = 10)
      .agg(count(lit(1)).as("n"),
        sum(when(col("hamming") === 0, 1L).otherwise(0L)).as("exact"))
      .head()
    val nEdges = edgeStats.getLong(0)
    val exactEdges = edgeStats.getLong(1)
    val edgeS = (System.nanoTime() - t1) / 1e9
    println(f"[imagedup-scale] edges wall=$edgeS%.1fs found=$nEdges " +
      f"($exactEdges exact-group) vs ${total * (total - 1) / 2} all-pairs")
    // twin recall via hash identity: every PNG re-encode must carry its
    // BMP original's full hash (lossless codecs) — and therefore sit in
    // its exact group / connected component
    val wide = bands.groupBy("media_id")
      .agg(expr("transform(array_sort(collect_list(struct(band, val))), " +
        "x -> x.val)").as("vs"))
    val twinMatch = wide.as("o").join(wide.as("t"),
        col("t.media_id") === col("o.media_id") + n &&
          col("t.vs") === col("o.vs"))
      .count()
    val expectTwins = (n + plantEvery - 1) / plantEvery
    println(s"[imagedup-scale] twin_hash_identity=$twinMatch/$expectTwins")
    require(twinMatch == expectTwins,
      "every PNG re-encode must hash identically to its BMP original")
    bands.unpersist(); base.unpersist()
    spark.stop()
  }
}
