package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image near-duplicate detection — the multimodal leg of the
  * dedup family, on top of the REAL image codec ([[Multimodal]]).
  *
  * Classic average-hash (aHash) from the public pHash family: downscale
  * to an 8x8 grayscale grid (the real ImageIO decode + adaptive pooling
  * kernel), set bit b iff cell b's mean luma exceeds the whole-image
  * mean, giving a 64-bit signature that is stable under re-encoding,
  * resizing, and small noise. Near-duplicates are then found the same
  * way the text stack's SimHash path works at 100 TB: the 64-bit hash is
  * cut into 4 x 16-bit BANDS, candidates are the pairs that agree
  * exactly on at least one band (an equi-join — never all-pairs), and
  * each candidate is confirmed by full Hamming distance <= `maxHamming`.
  * A pair at Hamming distance d survives banding with certainty when
  * d < 4 (pigeonhole: some band is untouched) and with high probability
  * for d near the default threshold.
  *
  * Everything after the decode is EXACT integer arithmetic (cell-mean
  * comparison by cross-multiplication — no float means), so the whole
  * pipeline is cross-engine oracle-checkable from the pixel values.
  */
object ImageDup {

  /** 64-bit aHash as 4 x 16-bit band values, one row per band:
    * (media_id, band, val). Input is [[Multimodal.decodeImagePooledRaw]]
    * at grid 8 (64 cells). Bit b of the hash is cell-mean > image-mean,
    * compared exactly: psum[b] * totalCnt > totalSum * pcnt[b]. In-row
    * projection — zero shuffles at any corpus size. */
  def aHashBands(pooled: DataFrame): DataFrame =
    pooled
      .withColumn("ts", expr("aggregate(psum, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("tc", expr("aggregate(pcnt, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .select(col("media_id"), explode(expr(
        """transform(sequence(0, 3), k -> struct(
          |  k AS band,
          |  aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, j) ->
          |    acc + IF(psum[k*16 + j] * tc > ts * pcnt[k*16 + j],
          |             shiftleft(CAST(1 AS BIGINT), j),
          |             CAST(0 AS BIGINT))) AS val))"""
          .stripMargin)).as("bv"))
      .select(col("media_id"), col("bv.band").cast("int").as("band"),
        col("bv.val").as("val"))

  /** Fixed-point 1-D DCT-II basis for a `grid`-point input, 8 output
    * frequencies: dctBasis(grid)(u*grid+x) =
    * round(cos((2x+1)·u·π/(2·grid)) · 2^14). Integer so the hash below
    * is exact bit-for-bit on any engine — the float DCT's
    * sign-vs-median bits flip across math libraries exactly at
    * coefficient ties. */
  private[graft] def dctBasis(grid: Int): Array[Long] =
    Array.tabulate(8 * grid) { i =>
      math.round(math.cos((2 * (i % grid) + 1) * (i / grid) * math.Pi
        / (2.0 * grid)) * 16384.0)
    }

  /** The grid=8 basis (the oracle-gated configuration). */
  private[graft] val dctTable: Array[Long] = dctBasis(8)

  /** 63-bit DCT perceptual hash (pHash proper, vs [[aHashBands]]'
    * average hash): 2-D DCT-II of the 8×8 pooled luma grid, drop the DC
    * coefficient, threshold the 63 AC coefficients against their
    * median. Low-frequency structure drives every bit, so local noise
    * that flips aHash bits near the mean leaves pHash stable; a global
    * brightness shift moves only the discarded DC term (spec-pinned).
    *
    * Exactness: coefficients are Σ psum·C[u][x]·C[v][y] over the
    * integer basis table — pure int64 arithmetic (|coeff| ≤
    * 64·psum_max·2^28, safe beyond 100-MP images), and the median of 63
    * integers is an element, not an average — so the battery's
    * `media_dcthash` / `media_dcthash_pairs` entries hash-match DuckDB
    * re-deriving the DCT from raw pixels. Using psum (not the cell
    * mean) is exact sign-scaling when pcnt is uniform (image dims a
    * multiple of the grid — the pooled corpus shape); non-uniform edge
    * cells bias toward larger cells, acceptable for a perceptual
    * signal.
    *
    * `grid` must match the pooled frame's grid. At grid = 8 every
    * input frequency lands in the hash (the oracle-gated shape: 8×8
    * media re-derived exactly by DuckDB). At grid ≥ 16 the hash keeps
    * only the LOWEST 8×8 frequency block of the grid×grid spectrum —
    * pHash's actual robustness mechanism: the discarded high
    * frequencies are precisely what blur/recompression perturbs, so
    * bits survive low-pass near-duplication (measured: at grid=32 a
    * box-blur twin moves 0 of 63 bits where grid=8 moves ~24 and
    * aHash ~5 — BASELINE round 12).
    *
    * Output (media_id, band, val) — 4×16-bit bands (band 3 carries 15
    * live bits), drop-in for [[nearDupPairs]]/[[nearDupEdges]] and the
    * whole downstream dedup loop.
    *
    * Implementation is a typed per-partition kernel (separable DCT:
    * 8·grid² + 64·grid integer multiply-adds per image), NOT a
    * higher-order SQL expression: Spark evaluates `transform`/
    * `aggregate` lambdas INTERPRETED (never whole-stage codegen), and
    * chaining them through a projected intermediate re-inlines the
    * whole upstream lambda into every reference — measured 946 s for
    * 110k images at grid 8 where this kernel takes under a second.
    * Same narrow one-pass shape as the decode kernel it follows. */
  def dctHashBands(pooled: DataFrame, grid: Int = 8): DataFrame = {
    require(grid >= 8, "dct hash needs at least an 8x8 grid")
    val spark = pooled.sparkSession
    val basis = dctBasis(grid)
    val idIdx = pooled.schema.fieldIndex("media_id")
    val pIdx = pooled.schema.fieldIndex("psum")
    val out = pooled.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(idIdx)
        val seq = row.getSeq[Long](pIdx)
        val ps = new Array[Long](grid * grid)
        var i = 0
        while (i < ps.length) { ps(i) = seq(i); i += 1 }
        // rowf(u·grid + y) = Σ_x ps(x·grid + y) · C[u][x]
        val rowf = new Array[Long](8 * grid)
        var u = 0
        while (u < 8) {
          var y = 0
          while (y < grid) {
            var s = 0L; var x = 0
            while (x < grid) {
              s += ps(x * grid + y) * basis(u * grid + x); x += 1
            }
            rowf(u * grid + y) = s; y += 1
          }
          u += 1
        }
        // coeffs(u·8 + v) = Σ_y rowf(u·grid + y) · C[v][y]
        val coeffs = new Array[Long](64)
        var uv = 0
        while (uv < 64) {
          var s = 0L; var y = 0
          while (y < grid) {
            s += rowf((uv / 8) * grid + y) * basis((uv % 8) * grid + y)
            y += 1
          }
          coeffs(uv) = s; uv += 1
        }
        val ac = java.util.Arrays.copyOfRange(coeffs, 1, 64)
        java.util.Arrays.sort(ac)
        val med = ac(31)
        (0 until 4).iterator.map { k =>
          var v = 0L; var j = 0
          while (j < 16) {
            val b = k * 16 + j
            if (b <= 62 && coeffs(b + 1) > med) v |= 1L << j
            j += 1
          }
          org.apache.spark.sql.Row(id, k, v)
        }
      }
    }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("val",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Near-duplicate pairs from banded hashes: band-equality equi-join
    * for candidates (the SimHash/MinHash banding shape — a hot identical
    * image cluster is the only skew source, and it is REAL duplication
    * the downstream canonicalizer collapses), then the exact 64-bit
    * Hamming confirm over the 4 band values.
    *
    * `probeBits = 1` turns on 1-bit MULTIPROBE (the AnnLsh multiprobe
    * idea on the banding side): the probe side also emits every
    * one-bit flip of each band value (17× probe rows — still an
    * equi-join, never all-pairs), so a pair is a candidate iff SOME
    * band differs by ≤ probeBits bits. Pigeonhole guarantee: a pair at
    * Hamming d has a band with ≤ floor(d/4) flipped bits, so recall is
    * CERTAIN for d ≤ 4·(probeBits+1) − 1 — d ≤ 3 exact-band, d ≤ 7
    * multiprobe — and probabilistic above.
    *
    * The Hamming confirm runs INSIDE the band join: each banded row
    * carries its image's full 4-band hash array, so a candidate is
    * confirmed or dropped the moment it is formed and only SURVIVORS
    * reach a pair-level shuffle (the final distinct). The earlier
    * formulation — dedup raw candidates, then join hashes back on —
    * shuffled every candidate pair three times; at 10M images the
    * band buckets hold ~150 rows each and raw candidates run to ~3
    * BILLION, which spilled >70 GB and filled the disk twice. Carrying
    * 32 bytes of hash on the 40M-row join sides buys dropping ~90% of
    * the pair mass before it ever crosses the wire.
    * Output: (id1, id2, hamming) with id1 < id2, hamming <= maxHamming. */
  /** One row per image with its full hash as a band-ordered array
    * `vs` — the shared wide form of a band table (the pair confirm,
    * the edge collapse, and the bench twin checks all derive from it;
    * one definition so the band layout cannot silently diverge). */
  private[graft] def wideHashes(bands: DataFrame): DataFrame =
    bands.groupBy("media_id")
      .agg(expr("transform(array_sort(collect_list(struct(band, val))), " +
        "x -> x.val)").as("vs"))

  def nearDupPairs(bands: DataFrame, maxHamming: Int = 10,
      probeBits: Int = 0): DataFrame = {
    require(probeBits >= 0 && probeBits <= 1, "probeBits is 0 or 1")
    // (media_id, vs, band, val): one row per band, full hash alongside
    val exploded = wideHashes(bands)
      .select(col("media_id"), col("vs"),
        posexplode(col("vs")).as(Seq("band", "val")))
    val probe =
      if (probeBits == 0) exploded
      else exploded.select(col("media_id"), col("vs"), col("band"),
        explode(expr(
          """transform(sequence(-1, 15), j ->
            |  IF(j = -1, val, val ^ shiftleft(CAST(1 AS BIGINT), j)))"""
            .stripMargin)).as("val"))
    probe.as("a").join(exploded.as("c"),
        col("a.band") === col("c.band") && col("a.val") === col("c.val") &&
          col("a.media_id") < col("c.media_id"))
      .withColumn("hamming", expr(
        "aggregate(sequence(0, 3), CAST(0 AS BIGINT), " +
          "(acc, k) -> acc + bit_count(a.vs[k] ^ c.vs[k]))"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.media_id").as("id1"), col("c.media_id").as("id2"),
        col("hamming"))
      .distinct()
  }

  /** SCALABLE near-dup EDGES — the 10M finding: on a real corpus the
    * dominant duplication is EXACT-hash mass (tight clusters and true
    * copies share the full 64-bit hash), and any pairwise formulation
    * goes quadratic inside those groups (measured: the 10M pairwise run
    * spilled >75 GB of within-group pairs). Collapse first:
    *
    *   1. group by the FULL hash — each exact group contributes
    *      (size − 1) STAR edges to its min-id representative (linear);
    *   2. run the banded near-match over REPRESENTATIVES only (one row
    *      per distinct hash — the corpus the band join was sized for).
    *
    * The output's CONNECTED COMPONENTS are exactly the pairwise graph's
    * (spec-pinned): members share their rep's hash, so any cross-group
    * near-pair (m, x) implies the rep-level edge (rep(m), x) at the
    * same Hamming distance — same components, linear edge count.
    * Output: (id1, id2, hamming), id1 < id2; exact-group edges carry
    * hamming 0. */
  def nearDupEdges(bands: DataFrame, maxHamming: Int = 10,
      probeBits: Int = 0): DataFrame = {
    val wide = wideHashes(bands)
    val rep = wide.groupBy("vs").agg(min("media_id").as("rep_id"))
    val withRep = wide.join(rep, Seq("vs"))
    val exactEdges = withRep.filter(col("media_id") =!= col("rep_id"))
      .select(col("rep_id").as("id1"), col("media_id").as("id2"),
        lit(0L).as("hamming"))
    val repBands = withRep.filter(col("media_id") === col("rep_id"))
      .select(col("media_id"), posexplode(col("vs")))
      .toDF("media_id", "band", "val")
    nearDupPairs(repBands, maxHamming, probeBits)
      .unionByName(exactEdges)
  }

  /** Streaming ingest: decode + hash each micro-batch of media rows and
    * append its band rows as ONE epoch directory — the engine's
    * epoch-handoff contract (TextIndex.append / IncrementalBqIndex): an
    * at-least-once retry of a micro-batch OVERWRITES its own epoch
    * instead of appending duplicates, so stream-built bands are
    * bit-identical to batch-built ones (spec-pinned). Serving is the
    * unchanged batch [[nearDupPairs]] over [[bands]].
    *
    * `checkpoint` is REQUIRED: the idempotent-retry contract holds only
    * for CHECKPOINTED restarts — without one, a restarted query begins
    * again at batchId 0 and its Overwrite would silently replace earlier
    * epochs holding different data. */
  /** BATCH epoch append — the same layout [[streamingHashAppend]]
    * writes, for bounded ingest jobs: decode + band the batch and
    * OVERWRITE `bands/epoch=<tag>` (re-running a tag is idempotent,
    * the IncrementalBqIndex append contract). Batch- and stream-built
    * stores are interchangeable under [[bands]]/[[describe]]. */
  def hashAppend(batch: DataFrame, path: String, epochTag: String,
      grid: Int = 8): Unit = {
    aHashBands(Multimodal.decodeImagePooledRaw(batch, grid))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/bands/epoch=$epochTag")
  }

  def streamingHashAppend(stream: DataFrame, path: String,
      checkpoint: String,
      grid: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        aHashBands(Multimodal.decodeImagePooledRaw(batch, grid))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$path/bands/epoch=$batchId")
        ()
      }
      .start()

  /** Roll FORWARD a compaction interrupted between its two renames: the
    * replacement was fully written before the first rename ever ran, so
    * if the live `bands` dir is gone but `.compact-old` exists, finish
    * the compact (move the replacement in, drop the folded deletes and
    * the aside copy). Called from every read path, so a crashed compact
    * self-heals on the next [[bands]]. */
  private def recoverCompact(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val livP = new org.apache.hadoop.fs.Path(s"$path/bands")
    val oldP = new org.apache.hadoop.fs.Path(s"$path/.compact-old")
    val newP = new org.apache.hadoop.fs.Path(s"$path/.compact/bands")
    if (!fs.exists(livP) && fs.exists(oldP)) {
      if (fs.exists(newP)) {
        require(fs.rename(newP, livP),
          s"recoverCompact: rename $newP -> $livP failed")
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/deletes"), true)
      } else {
        // replacement gone too (should not happen) — roll back
        require(fs.rename(oldP, livP),
          s"recoverCompact: rollback $oldP -> $livP failed")
      }
      fs.delete(oldP, true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/.compact"), true)
      ()
    }
  }

  /** All LIVE band rows ingested so far (epoch column dropped, delete
    * vector anti-joined). Self-heals a compaction that crashed between
    * renames ([[recoverCompact]]). */
  def bands(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    recoverCompact(new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    val raw = spark.read.parquet(s"$path/bands")
      .select("media_id", "band", "val")
    val del = new org.apache.hadoop.fs.Path(s"$path/deletes")
    val fs = del.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(del))
      raw.join(broadcast(spark.read.parquet(s"$path/deletes")
          .select(col("media_id")).distinct()),
        Seq("media_id"), "left_anti")
    else raw
  }

  /** Record deleted media ids (bounded id rows); [[bands]] anti-joins
    * them until [[compact]] folds them away — the IncrementalBqIndex
    * delete-vector contract. */
  def remove(ids: DataFrame, path: String,
      idCol: String = "media_id"): Unit = {
    ids.select(col(idCol).cast("long").as("media_id")).distinct()
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/deletes")
  }

  /** One-row store observability ([[StoreDescription]] contract,
    * VERDICT r10 #7): live and deleted counts BOTH in distinct media
    * ids — the unit every store kind reports (TextIndex docs,
    * IncrementalBq vectors), so fleet-dashboard ratios like
    * deleted/live compare like with like; the band fan-out (4 rows per
    * media) is stated in `detail`. Epoch directories, bytes on disk,
    * the compaction trigger evaluated (pending deletes or epoch spread
    * — the anti-join and per-epoch file listing both grow with them).
    * No trained quantizer → `growth_since_fit` is None. Reads route
    * through [[bands]], so a crashed compact self-heals before
    * counting. */
  def describe(spark: org.apache.spark.sql.SparkSession, path: String,
      epochFactor: Long = 8): org.apache.spark.sql.DataFrame = {
    val live = bands(spark, path).select("media_id").distinct().count()
    val del = new org.apache.hadoop.fs.Path(s"$path/deletes")
    val fs = del.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deleted =
      if (fs.exists(del))
        spark.read.parquet(s"$path/deletes")
          .select("media_id").distinct().count()
      else 0L
    val epochs = StoreDescribe.epochDirs(spark, s"$path/bands")
    StoreDescribe.toDf(spark, StoreDescription(
      store_kind = "image_dup",
      location = path,
      family = "ahash_lsh",
      live_rows = live,
      deleted_rows = deleted,
      epochs = epochs,
      bytes_on_disk = StoreDescribe.pathBytes(spark, path),
      growth_since_fit = None,
      needs_compaction = deleted > 0 || epochs >= epochFactor,
      detail = "bands=4 bits_per_band=16"))
  }

  /** The POLICY LOOP over [[describe]]'s trigger (the
    * IncrementalBqIndex.autoCompact shape, uniform across store kinds):
    * fold when deletes are pending or epochs have spread past
    * `epochFactor`. Returns true when it fired; [[bands]] reads are
    * identical before/after (compact's contract). */
  def autoCompact(spark: org.apache.spark.sql.SparkSession, path: String,
      epochFactor: Long = 8): Boolean = {
    val del = new org.apache.hadoop.fs.Path(s"$path/deletes")
    val fsys = del.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pending = fsys.exists(del)
    val epochs = StoreDescribe.epochDirs(spark, s"$path/bands")
    if (pending || epochs >= epochFactor) { compact(spark, path); true }
    else false
  }

  /** COMPACTION: fold all epochs minus deletes into one epoch. Crash
    * safety is the IncrementalBqIndex aside dance — the replacement is
    * fully written to a temp dir, the live dir moves aside (rename,
    * checked), the replacement moves in, and the aside copy is deleted
    * only after every move succeeded. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val live = bands(spark, path)
    live.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/.compact/bands/epoch=compacted")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mv(from: String, to: String, onFail: String): Unit = {
      val src = new org.apache.hadoop.fs.Path(from)
      if (fs.exists(src))
        require(fs.rename(src, new org.apache.hadoop.fs.Path(to)),
          s"compact: rename $from -> $to failed; $onFail")
    }
    mv(s"$path/bands", s"$path/.compact-old",
      "band store left intact")
    mv(s"$path/.compact/bands", s"$path/bands",
      s"live bands are aside at $path/.compact-old; the next bands() " +
        "read rolls the compact forward automatically")
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/deletes"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/.compact-old"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/.compact"), true)
    ()
  }
}
