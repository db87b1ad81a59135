package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ImageDup, Multimodal}
import graft.sources.VectorSources

/** Perceptual image dedup at scale: REAL codec throughput (ImageIO
  * decode + pooling + aHash per image) and the banded candidate join's
  * cost against the all-pairs count it avoids. The corpus is clustered
  * synthetic vectors rendered to actual BMP payloads; every
  * `plantEvery`-th image also appears as a PNG RE-ENCODE under a twin
  * id — the measured run must find every twin at Hamming 0 (the
  * codec-invariance recall floor), through two different codecs' bytes.
  *
  * `side` (3rd arg, default 8) sets the rendered image side: 8 is the
  * thumbnail protocol of the early rounds; 32+ renders REAL-size
  * payloads (each 8x8 cell upscaled nearest-neighbor, so the pooled
  * features — and the clusters/twins — are identical to the thumbnail
  * corpus while the DECODE pays full-size work). The corpus goes
  * through parquet (generation is not billed to any stage), and an
  * IO-ONLY pass (scan + byte-length fold, no decode) is timed first so
  * the decode/IO split of the hash stage is measured, not guessed.
  *
  * `sbt "runMain graft.bench.ImageDupScaleMain 10000000 100 32"`
  *
  * An optional 4th arg points at an existing run's corpus directory
  * (the `.../media` parent printed below) so a rerun skips the
  * generation phase — generation at 10M x 32x32 writes 31 GB of
  * payloads and is the longest unbilled phase. The 5th arg picks the
  * hash family: `ahash` (default — 8x8 pooled mean threshold) or
  * `dct` (pHash: grid = side pooling, lowest 8x8 DCT block).
  */
object ImageDupScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val plantEvery = if (args.length > 1) args(1).toInt else 100
    val side = if (args.length > 2) args(2).toInt else 8
    // "-" (or empty) as the 4th arg means "generate fresh" — the
    // positional placeholder when only the 5th (family) arg is wanted
    val reuse = if (args.length > 3 && args(3).nonEmpty && args(3) != "-")
      Some(args(3)) else None
    val family = if (args.length > 4) args(4) else "ahash"
    require(side >= 8 && side % 8 == 0, "side must be a multiple of 8")
    require(family == "ahash" || family == "dct", "family is ahash or dct")
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

    // clustered 64-d vectors → real side x side BMPs (nearest-neighbor
    // upscale of the 8x8 cell grid); every plantEvery-th image gets a
    // PNG twin at id + n (same pixels, different codec bytes). Cluster
    // count scales with n (bounded ~100-image near-dup clusters, the
    // realistic corpus shape). The corpus is parqueted: at 10M x 32x32
    // an in-memory persist of raw payloads is the wrong layout — the
    // scan IS the production shape, and it lets the IO-only pass price
    // the read path separately.
    val up = side / 8
    val tmp = reuse.getOrElse(
      java.nio.file.Files.createTempDirectory("imgscale").toString)
    if (reuse.isEmpty) VectorSources.syntheticClustered(spark, n, 64,
        numClusters = math.max(1024L, n / 100).toInt, spread = 0.15)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, v) =>
          val cell = Multimodal.quantize255(v)
          val px =
            if (up == 1) cell
            else Array.tabulate(side * side)(i =>
              cell((i / side / up) * 8 + (i % side) / up))
          val bmp = (id, Multimodal.encodeGray(px, side, side, "bmp"))
          if (id % plantEvery == 0)
            Iterator(bmp, (id + n, Multimodal.encodeGray(px, side, side, "png")))
          else Iterator.single(bmp)
        }
      }
      .toDF("media_id", "content")
      .write.mode("overwrite").parquet(s"$tmp/media")
    val base = spark.read.parquet(s"$tmp/media")
    val total = base.count()
    val bytes = base.agg(sum(length(col("content")))).first().getLong(0)
    println(s"[imagedup-scale] corpus $total real ${side}x$side payloads " +
      s"(${total - n} PNG twins, ${bytes / 1048576} MB) at $tmp")

    // IO-only pass: scan + per-payload byte fold, no decode — the read
    // path's share of any downstream stage
    val tIo = System.nanoTime()
    base.select(sum(crc32(col("content")))).first()
    val ioS = (System.nanoTime() - tIo) / 1e9
    println(f"[imagedup-scale] io_scan wall=$ioS%.1fs " +
      f"(${total / ioS}%.0f images/s, ${bytes / ioS / 1048576}%.0f MB/s)")

    // decode + pool + hash: the per-image kernel cost (includes the
    // same scan — decode share = hash wall - io wall)
    val t0 = System.nanoTime()
    val bands = (family match {
      case "dct" => ImageDup.dctHashBands(
        Multimodal.decodeImagePooledRaw(base, grid = side), grid = side)
      case _ => ImageDup.aHashBands(
        Multimodal.decodeImagePooledRaw(base, grid = 8))
    }).persist()
    val bandRows = bands.count()
    val hashS = (System.nanoTime() - t0) / 1e9
    println(f"[imagedup-scale] decode+hash[$family] wall=$hashS%.1fs " +
      f"(${total / hashS}%.0f images/s, $bandRows band rows, " +
      f"decode_share=${(hashS - ioS) / hashS * 100}%.0f%%)")

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
    val wide = ImageDup.wideHashes(bands)
    val twinMatch = wide.as("o").join(wide.as("t"),
        col("t.media_id") === col("o.media_id") + n &&
          col("t.vs") === col("o.vs"))
      .count()
    val expectTwins = (n + plantEvery - 1) / plantEvery
    println(s"[imagedup-scale] twin_hash_identity=$twinMatch/$expectTwins")
    require(twinMatch == expectTwins,
      "every PNG re-encode must hash identically to its BMP original")
    bands.unpersist()
    if (reuse.isEmpty)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
