package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector dataset sources (B1-B3, reference src/bench/dataset.ts).
  *
  * - fvecs/ivecs: the classic binary ANN formats — per record an int32
  *   little-endian dimension then dim × (float32 | int32)
  *   (src/bench/dataset.ts:65-151). Decoded in executors over Spark's
  *   `binaryFile` source; ids are record positions; a truncated tail is
  *   tolerated (src/bench/dataset.ts:83-85); limit/offset applied at
  *   decode time (actual pushdown, src/bench/dataset.ts:87-93).
  * - synthetic: seeded deterministic generator. The reference uses a
  *   sequential mulberry32 stream (src/bench/dataset.ts:196-205); we key
  *   every component on (seed, id, dim) instead so ANY partitioning of
  *   `spark.range` yields identical data — the distribution (uniform
  *   [-1,1) or Box-Muller gaussian, src/bench/dataset.ts:207-213) is
  *   preserved, the sequential dependence is not (required for
  *   distributed determinism, SURVEY B1).
  */
object VectorSources {

  /** element encodings: fvecs float32, ivecs int32, bvecs uint8 */
  private val ElemFloat = 0
  private val ElemInt = 1
  private val ElemByte = 2
  private def elemBytes(kind: Int): Int = if (kind == ElemByte) 1 else 4

  private def decode(bytes: Array[Byte], elemKind: Int,
      limit: Int, offset: Int): Iterator[(Long, Array[Float])] = {
    val eb = elemBytes(elemKind)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[(Long, Array[Float])] {
      private var recordIdx = 0L
      private var emitted = 0
      private var nextRec: (Long, Array[Float]) = null
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && buf.remaining() >= 4 &&
            (limit < 0 || emitted < limit)) {
          val d = buf.getInt()
          val need = d.toLong * eb
          if (d <= 0 || buf.remaining() < need) {
            buf.position(buf.limit()) // truncated tail: stop cleanly
          } else if (recordIdx < offset) {
            buf.position(buf.position() + need.toInt)
            recordIdx += 1
          } else {
            val arr = new Array[Float](d)
            var i = 0
            while (i < d) {
              arr(i) = elemKind match {
                case ElemFloat => buf.getFloat()
                case ElemInt   => buf.getInt().toFloat
                case _         => (buf.get() & 0xFF).toFloat // unsigned byte
              }
              i += 1
            }
            nextRec = (recordIdx, arr)
            recordIdx += 1
            emitted += 1
          }
        }
      }
      advance()
      def hasNext: Boolean = nextRec != null
      def next(): (Long, Array[Float]) = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** B2: fvecs scan → (vec_id, embedding). */
  def readFvecs(spark: SparkSession, path: String, limit: Int = -1,
      offset: Int = 0): DataFrame =
    readVecs(spark, path, ElemFloat, limit, offset)

  /** B3: ivecs scan (int32 components cast to float). */
  def readIvecs(spark: SparkSession, path: String, limit: Int = -1,
      offset: Int = 0): DataFrame =
    readVecs(spark, path, ElemInt, limit, offset)

  /** bvecs scan (uint8 components cast to float) — the SIFT1B billion-
    * scale layout; additive beyond the reference's fvecs/ivecs pair. */
  def readBvecs(spark: SparkSession, path: String, limit: Int = -1,
      offset: Int = 0): DataFrame =
    readVecs(spark, path, ElemByte, limit, offset)

  /** Count whole records in one file's bytes (header-skip scan only). */
  private def countRecords(bytes: Array[Byte], elemKind: Int): Long = {
    val eb = elemBytes(elemKind)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var n = 0L
    var ok = true
    while (ok && buf.remaining() >= 4) {
      val d = buf.getInt()
      val need = d.toLong * eb
      if (d <= 0 || buf.remaining() < need) ok = false
      else { buf.position(buf.position() + need.toInt); n += 1 }
    }
    n
  }

  private def readVecs(spark: SparkSession, path: String, elemKind: Int,
      limit: Int, offset: Int): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    // Multi-file globs: record ids must be globally unique and limit/offset
    // global, so compute a per-file base offset from the record counts of
    // all path-ordered predecessor files. The counting pass re-reads the
    // raw bytes (header-skip only, no float decode) — for large
    // constant-dim corpora prefer FvecsSource.read, which derives counts
    // from file sizes without a second read.
    val nFiles = files.select("path").distinct().count()
    val bases: Map[String, Long] =
      if (nFiles <= 1) Map.empty.withDefaultValue(0L)
      else {
        val counts = files.as[(String, Array[Byte])]
          .map { case (p, bytes) => (p, countRecords(bytes, elemKind)) }
          .collect().sortBy(_._1)
        val cum = counts.scanLeft(0L)(_ + _._2)
        counts.map(_._1).zip(cum).toMap
      }
    files.as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val base = bases.getOrElse(p, 0L)
        // global limit/offset → per-file window [offset-base, offset+limit-base)
        val localOffset = math.max(0L, offset.toLong - base).toInt
        val localLimit =
          if (limit < 0) -1
          else math.max(0L, offset.toLong + limit - base - localOffset).toInt
        decode(bytes, elemKind, localLimit, localOffset)
          .map { case (i, v) => (base + i, v) }
      }
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  /** B1: seeded synthetic vectors, partition-independent.
    * @param distribution "uniform" ([-1,1)) | "gaussian" (Box-Muller) */
  def synthetic(spark: SparkSession, count: Long, dimension: Int,
      seed: Long = 42L, distribution: String = "uniform"): DataFrame = {
    import spark.implicits._
    require(distribution == "uniform" || distribution == "gaussian",
      s"unknown distribution: $distribution")
    val gaussian = distribution == "gaussian"
    spark.range(0, count).as[Long].map { id =>
      val arr = new Array[Float](dimension)
      var j = 0
      while (j < dimension) {
        val u1 = unitRandom(seed, id, 2 * j)
        if (gaussian) {
          val u2 = unitRandom(seed, id, 2 * j + 1)
          arr(j) = (math.sqrt(-2.0 * math.log(math.max(u1, 1e-12))) *
            math.cos(2.0 * math.Pi * u2)).toFloat
        } else {
          arr(j) = (u1 * 2.0 - 1.0).toFloat
        }
        j += 1
      }
      (id, arr)
    }.toDF("vec_id", "embedding")
  }

  /** B1 variant: seeded mixture-of-Gaussians — `numClusters` centers drawn
    * uniform in [-1,1)^d, each vector = its id-hashed center plus isotropic
    * gaussian noise of stddev `spread`. Partition-independent like
    * [[synthetic]] (every value is a pure function of (seed, id, j)).
    *
    * This is the corpus shape IVF routing is FOR: with spread well under
    * the inter-center distance, a query's nearest centroids cover its true
    * neighbors, so small-nprobe probes hold recall — unlike the uniform
    * corpus, the adversarial worst case where neighbor structure is
    * centroid-free. Emits (vec_id, embedding, cluster_id). */
  def syntheticClustered(spark: SparkSession, count: Long, dimension: Int,
      numClusters: Int = 64, spread: Double = 0.15, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    require(numClusters > 0 && spread >= 0.0)
    // centers are tiny (numClusters × d) — computed once, captured in the
    // closure (Spark serializes them with the task like a broadcast)
    val centers = Array.tabulate(numClusters) { c =>
      Array.tabulate(dimension)(j =>
        (unitRandom(seed ^ 0x5EEDC0DEL, c.toLong, j) * 2.0 - 1.0).toFloat)
    }
    val nc = numClusters
    spark.range(0, count).as[Long].map { id =>
      val c = math.min((unitRandom(seed ^ 0xA551D5L, id, Int.MaxValue) * nc).toInt, nc - 1)
      val center = centers(c)
      val arr = new Array[Float](dimension)
      var j = 0
      while (j < dimension) {
        val u1 = unitRandom(seed, id, 2 * j)
        val u2 = unitRandom(seed, id, 2 * j + 1)
        val g = math.sqrt(-2.0 * math.log(math.max(u1, 1e-12))) *
          math.cos(2.0 * math.Pi * u2)
        arr(j) = (center(j) + spread * g).toFloat
        j += 1
      }
      (id, arr, c)
    }.toDF("vec_id", "embedding", "cluster_id")
  }

  /** B1 variant: seeded ANISOTROPIC gaussians — latent coordinate i has
    * stddev `decay`^i, then a fixed seeded random rotation mixes every
    * raw coordinate. This is the spectrum shape real embedding models
    * emit (variance concentrated in a few principal directions, at an
    * arbitrary orientation): a raw dimension PREFIX sees only a 1/d
    * slice of every principal axis, while PCA recovers the axes — the
    * corpus shape trained dimensionality reduction is FOR.
    * Partition-independent like [[synthetic]]. */
  def syntheticAnisotropic(spark: SparkSession, count: Long, dimension: Int,
      decay: Double = 0.92, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    require(decay > 0.0 && decay <= 1.0)
    // seeded rotation: Gram-Schmidt over seeded gaussian rows — tiny
    // (d × d), computed once on the driver, closure-captured like the
    // cluster centers above
    val rot = Array.tabulate(dimension) { r =>
      Array.tabulate(dimension) { j =>
        val u1 = unitRandom(seed ^ 0x207A7E5EL, r.toLong, 2 * j)
        val u2 = unitRandom(seed ^ 0x207A7E5EL, r.toLong, 2 * j + 1)
        math.sqrt(-2.0 * math.log(math.max(u1, 1e-12))) *
          math.cos(2.0 * math.Pi * u2)
      }
    }
    var r = 0
    while (r < dimension) {
      var p = 0
      while (p < r) {
        var dot = 0.0
        var j = 0
        while (j < dimension) { dot += rot(r)(j) * rot(p)(j); j += 1 }
        j = 0
        while (j < dimension) { rot(r)(j) -= dot * rot(p)(j); j += 1 }
        p += 1
      }
      var nrm = 0.0
      var j = 0
      while (j < dimension) { nrm += rot(r)(j) * rot(r)(j); j += 1 }
      nrm = math.sqrt(nrm)
      require(nrm > 1e-9, "degenerate rotation draw")
      j = 0
      while (j < dimension) { rot(r)(j) /= nrm; j += 1 }
      r += 1
    }
    val scales = Array.tabulate(dimension)(i => math.pow(decay, i))
    spark.range(0, count).as[Long].map { id =>
      val z = new Array[Double](dimension)
      var j = 0
      while (j < dimension) {
        val u1 = unitRandom(seed, id, 2 * j)
        val u2 = unitRandom(seed, id, 2 * j + 1)
        z(j) = scales(j) * math.sqrt(-2.0 * math.log(math.max(u1, 1e-12))) *
          math.cos(2.0 * math.Pi * u2)
        j += 1
      }
      val arr = new Array[Float](dimension)
      var o = 0
      while (o < dimension) {
        var s = 0.0
        var i = 0
        while (i < dimension) { s += rot(i)(o) * z(i); i += 1 }
        arr(o) = s.toFloat
        o += 1
      }
      (id, arr)
    }.toDF("vec_id", "embedding")
  }

  /** splitmix64-mixed uniform in [0,1), pure in (seed, id, k). */
  private def unitRandom(seed: Long, id: Long, k: Int): Double = {
    var z = seed ^ (id * 0x9E3779B97F4A7C15L) ^ (k.toLong * 0xC2B2AE3D27D4EB4FL)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble
  }
}
