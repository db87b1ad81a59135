package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ImageDup, Multimodal}
import graft.sources.VectorSources

/** aHash vs DCT pHash under the perturbation that separates them:
  * BLUR. A lossless re-encode leaves both hashes identical (the twin
  * gates pin that); a 3×3 box blur is the realistic near-duplicate —
  * thumbnails, recompression smoothing. Two findings this main
  * establishes (BASELINE round 12):
  *
  *  1. the corpus must be SMOOTH for the question to be meaningful —
  *     on white-noise pixels blur lands EVERY family at mean Hamming
  *     ~24-28/63 (random): there is no low-frequency structure to
  *     preserve. Natural images are smooth, so originals here are the
  *     synthetic pixels upscaled to `side`×`side` and box-blurred
  *     twice; the twin is ONE further blur pass.
  *  2. pHash's robustness is the LOW-PASS KEEP, not the DCT itself: at
  *     grid = 8 (all 64 frequencies of an 8×8 spectrum hashed) most
  *     bits are signs of near-zero high-frequency coefficients and
  *     blur re-rolls them; at grid = `side` with only the lowest 8×8
  *     block kept (`dctHashBands(pooled32, grid = 32)` — the classic
  *     pHash shape) the discarded frequencies are exactly what blur
  *     perturbs.
  *
  * Per hash family the main measures the original↔twin Hamming
  * distribution (mean/p50/p95/max), confirm recall at the serving
  * threshold (≤ 10), and band recall (≥ 1 identical 16-bit band — the
  * fraction the banded equi-join can even SEE as candidates).
  *
  * `sbt "runMain graft.bench.HashRobustnessBenchMain 1000000 10 32"`
  */
object HashRobustnessBenchMain {

  /** Integer 3×3 box blur on a side×side grayscale grid (edge cells
    * use their in-bounds neighborhood; floor division). */
  private def blurN(px: Array[Int], side: Int): Array[Int] =
    Array.tabulate(side * side) { i =>
      val r = i / side; val c = i % side
      var s = 0; var n = 0
      var dr = -1
      while (dr <= 1) {
        var dc = -1
        while (dc <= 1) {
          val rr = r + dr; val cc = c + dc
          if (rr >= 0 && rr < side && cc >= 0 && cc < side) {
            s += px(rr * side + cc); n += 1
          }
          dc += 1
        }
        dr += 1
      }
      s / n
    }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val plantEvery = if (args.length > 1) args(1).toInt else 10
    val side = if (args.length > 2) args(2).toInt else 32
    val preBlur = if (args.length > 3) args(3).toInt else 1
    require(side >= 8 && side % 8 == 0, "side must be a multiple of 8")
    require(preBlur >= 0, "preBlur passes must be non-negative")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val up = side / 8
    val media = VectorSources.syntheticClustered(spark, n, 64,
        numClusters = math.max(1024L, n / 100).toInt, spread = 0.15)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, v) =>
          val cell = Multimodal.quantize255(v)
          val big = Array.tabulate(side * side)(i =>
            cell((i / side / up) * 8 + (i % side) / up))
          val px = (0 until preBlur).foldLeft(big)((p, _) => blurN(p, side))
          val orig = (id, Multimodal.encodeGray(px, side, side))
          if (id % plantEvery == 0)
            Iterator(orig,
              (id + n, Multimodal.encodeGray(blurN(px, side), side, side)))
          else Iterator.single(orig)
        }
      }
      .toDF("media_id", "content")
      .persist()
    val planted = media.count() - n
    println(s"[hash-robust] corpus $n ${side}x$side images (preBlur=$preBlur) + " +
      s"$planted blur twins")

    val pooled8 = Multimodal.decodeImagePooledRaw(media, grid = 8).persist()
    pooled8.count()
    // at side = 8 the third family would be a duplicate dct8 pass —
    // skip the second (full-resolution) decode pass entirely then
    val pooledS = if (side > 8)
      Some {
        val p = Multimodal.decodeImagePooledRaw(media, grid = side).persist()
        p.count(); p
      }
    else None

    val families = Seq(
      "ahash" -> ImageDup.aHashBands(pooled8),
      "dct8" -> ImageDup.dctHashBands(pooled8)) ++
      pooledS.map(p => s"dct$side" -> ImageDup.dctHashBands(p, grid = side))
    families.foreach {
      case (fam, bands) =>
        val t0 = System.nanoTime()
        val wide = ImageDup.wideHashes(bands)
        val pairs = wide.as("o").join(wide.as("t"),
            col("t.media_id") === col("o.media_id") + n)
          .select(expr(
            """aggregate(sequence(0, 3), CAST(0 AS BIGINT), (acc, k) ->
              |  acc + bit_count(o.vs[k] ^ t.vs[k]))""".stripMargin)
            .as("hamming"),
            expr("""exists(sequence(0, 3), k -> o.vs[k] = t.vs[k])""")
              .as("band_hit"))
          .persist()
        val row = pairs.agg(
            count(lit(1)), avg("hamming"),
            expr("percentile(hamming, 0.5)"), expr("percentile(hamming, 0.95)"),
            max("hamming"),
            sum(when(col("hamming") <= 10, 1L).otherwise(0L)),
            sum(when(col("band_hit"), 1L).otherwise(0L)))
          .first()
        val wallS = (System.nanoTime() - t0) / 1e9
        val np = row.getLong(0)
        println(f"[hash-robust] $fam%-6s pairs=$np " +
          f"mean=${row.getDouble(1)}%.2f p50=${row.getDouble(2)}%.1f " +
          f"p95=${row.getDouble(3)}%.1f max=${row.getLong(4)} " +
          f"confirm_recall@10=${row.getLong(5).toDouble / np}%.4f " +
          f"band_recall=${row.getLong(6).toDouble / np}%.4f " +
          f"wall=$wallS%.1fs")
        pairs.unpersist()
        ()
    }
    pooledS.foreach(_.unpersist())
    pooled8.unpersist()
    media.unpersist()
    spark.stop()
  }
}
