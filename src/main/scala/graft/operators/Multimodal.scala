package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side shape is real — schema, partitioning, batched
  * per-partition execution (the Scala analog of `mapInPandas`), row
  * explosion for frame sampling — while the codec itself is a STUB: this
  * container has no image/audio libraries, so `decodeFeaturesStub`
  * produces a deterministic content-derived feature vector where a real
  * deployment would call the decoder. Swap `stubFeature` for the real
  * kernel; nothing else changes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** === STUB === deterministic fake feature kernel (stands in for a real
    * image/audio decode): k float features folded from the bytes. */
  private[operators] def stubFeature(bytes: Array[Byte], k: Int): Array[Float] = {
    val out = new Array[Float](k)
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ bytes(i)) * 0x100000001B3L
      out(i % k) += (h & 0xFFFF).toFloat / 65536f
      i += 1
    }
    out
  }

  /** Decode/feature-extract: (media_id, media_type, content, …) →
    * (media_id, n_bytes, feature array<float>). Batched per partition. */
  def decodeFeaturesStub(media: DataFrame, featureDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (id, bytes.length.toLong, stubFeature(bytes, featureDim))
        }
      }
      .toDF("media_id", "n_bytes", "feature")
      .withColumn("feature", col("feature").cast("array<float>"))
  }

  /** Frame sampling for "video" content: emit every `stride`-th
    * fixed-size byte window as one frame row (generator shape —
    * one media row explodes into many frame rows). */
  def sampleFramesStub(media: DataFrame, frameBytes: Int = 256,
      stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = math.max(bytes.length / frameBytes, 1)
        (0 until nFrames by stride).map { f =>
          val from = math.min(f * frameBytes, bytes.length)
          val until = math.min(from + frameBytes, bytes.length)
          (id, f, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
      .toDF("media_id", "frame_no", "frame")
  }

  /** "Resize" metadata transform: pure column math (real at any scale). */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame =
    media.withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
}
