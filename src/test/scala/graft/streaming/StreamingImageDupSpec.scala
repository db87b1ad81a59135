package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ImageDup, Multimodal}

/** The real image codec under Structured Streaming: media payloads
  * arrive as micro-batches, each batch is decoded + perceptually hashed
  * through the SAME kernels as the batch path, and appended as one
  * idempotent epoch — stream-built bands must be bit-identical to
  * batch-built ones, and serving (nearDupPairs) runs unchanged over the
  * epoch union. */
class StreamingImageDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmpPath(): String =
    java.nio.file.Files.createTempDirectory("imgstream").toString + "/idx"

  private def img(id: Long, seed: Int, format: String = "bmp"): (Long, Array[Byte]) =
    (id, Multimodal.encodeGray(
      Array.tabulate(64)(i => (i * seed + seed) % 256), 8, 8, format))

  test("stream-built bands == batch-built; twin lands across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tmpPath()
    // batch 1: three distinct images; batch 2: two more + a PNG twin of
    // image 1 (same pixels, different codec) under id 100
    val b1 = Seq(img(1L, 7), img(2L, 11), img(3L, 13))
    val b2 = Seq(img(4L, 17), img(5L, 19),
      (100L, Multimodal.encodeGray(
        Array.tabulate(64)(i => (i * 7 + 7) % 256), 8, 8, "png")))
    val all = b1 ++ b2

    val source = MemoryStream[(Long, Array[Byte])]
    val q = ImageDup.streamingHashAppend(
      source.toDF().toDF("media_id", "content"), path, s"$path-ckpt")
    source.addData(b1: _*); q.processAllAvailable()
    source.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val streamed = ImageDup.bands(spark, path)
      .collect().map(_.toSeq).toSet
    val direct = ImageDup.aHashBands(Multimodal.decodeImagePooledRaw(
        all.toDF("media_id", "content"), grid = 8))
      .collect().map(_.toSeq).toSet
    assert(streamed == direct, "stream-built must equal batch-built")

    // serving over the epoch union finds the cross-batch, cross-codec twin
    val pairs = ImageDup.nearDupPairs(
        ImageDup.bands(spark, path), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 100L, 0L)),
      s"twin pair missing from ${pairs.toSeq}")
  }

  test("delete vector hides an id from serving; compaction folds epochs " +
      "and deletes away, results unchanged") {
    import spark.implicits._
    val path = tmpPath()
    val rows1 = Seq(img(1L, 7), img(2L, 11)).toDF("media_id", "content")
    val rows2 = Seq(img(3L, 13), (100L, Multimodal.encodeGray(
      Array.tabulate(64)(i => (i * 7 + 7) % 256), 8, 8, "png")))
      .toDF("media_id", "content")
    ImageDup.aHashBands(Multimodal.decodeImagePooledRaw(rows1, 8))
      .write.mode("overwrite").parquet(s"$path/bands/epoch=0")
    ImageDup.aHashBands(Multimodal.decodeImagePooledRaw(rows2, 8))
      .write.mode("overwrite").parquet(s"$path/bands/epoch=1")
    assert(ImageDup.bands(spark, path).count() == 16)
    // remove image 2: serving must no longer see it
    ImageDup.remove(Seq(2L).toDF("media_id"), path)
    assert(ImageDup.bands(spark, path)
      .select("media_id").distinct().collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 100L))
    val before = ImageDup.nearDupPairs(ImageDup.bands(spark, path),
        maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before == Set((1L, 100L))) // the cross-codec twin survives
    // compact: one epoch, no delete vector, identical serving
    ImageDup.compact(spark, path)
    assert(ImageDup.bands(spark, path).count() == 12)
    val after = ImageDup.nearDupPairs(ImageDup.bands(spark, path),
        maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before)
    // the deletes dir is gone (folded), bands is a single epoch
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/deletes")))
  }

  test("micro-batch replay overwrites its epoch — no duplicate bands") {
    import spark.implicits._
    val path = tmpPath()
    val rows = Seq(img(1L, 7), img(2L, 11)).toDF("media_id", "content")
    // simulate an at-least-once retry: the same batchId lands twice
    ImageDup.aHashBands(Multimodal.decodeImagePooledRaw(rows, 8))
      .write.mode("overwrite").parquet(s"$path/bands/epoch=0")
    ImageDup.aHashBands(Multimodal.decodeImagePooledRaw(rows, 8))
      .write.mode("overwrite").parquet(s"$path/bands/epoch=0")
    assert(ImageDup.bands(spark, path).count() == 8) // 2 images x 4 bands
  }

  test("checkpointed restart resumes batchIds — earlier epochs survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tmpPath(); val ckpt = s"$path-ckpt"
    val source = MemoryStream[(Long, Array[Byte])]
    val df = source.toDF().toDF("media_id", "content")
    val q1 = ImageDup.streamingHashAppend(df, path, ckpt)
    source.addData(img(1L, 7)); q1.processAllAvailable(); q1.stop()
    // restart with the SAME checkpoint: the next batch must take the
    // NEXT batchId, so epoch 0 survives — without a checkpoint a
    // restarted query restarts at batchId 0 and Overwrite clobbers it
    // (exactly why the checkpoint argument is required)
    val q2 = ImageDup.streamingHashAppend(df, path, ckpt)
    source.addData(img(2L, 11)); q2.processAllAvailable(); q2.stop()
    val ids = ImageDup.bands(spark, path)
      .select("media_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L),
      s"epoch 0 must survive the checkpointed restart, got $ids")
  }

  test("compaction crash between renames self-heals on next bands() read") {
    import spark.implicits._
    val path = tmpPath()
    val rows = Seq(img(1L, 7), img(2L, 11)).toDF("media_id", "content")
    ImageDup.aHashBands(Multimodal.decodeImagePooledRaw(rows, 8))
      .write.mode("overwrite").parquet(s"$path/bands/epoch=0")
    ImageDup.remove(Seq(2L).toDF("media_id"), path)
    val expected = ImageDup.bands(spark, path)
      .collect().map(_.toSeq).toSet
    // simulate the crash window: replacement fully written, live dir
    // moved aside, second rename never ran
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ImageDup.bands(spark, path).write.mode("overwrite")
      .parquet(s"$path/.compact/bands/epoch=compacted")
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/bands"),
      new org.apache.hadoop.fs.Path(s"$path/.compact-old")))
    // next read self-heals: rolls the compact forward, folds deletes away
    val healed = ImageDup.bands(spark, path).collect().map(_.toSeq).toSet
    assert(healed == expected, "post-recovery serving must be unchanged")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/bands")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/.compact-old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/deletes")))
  }
}
