package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ImageDup, Multimodal, TextIndex}

/** ONE event stream → all three modality indexes (text BM25, vector
  * residual-BQ, media perceptual-hash), with a mid-batch kill injected
  * into each index's own crash window and replayed — the combined
  * demo the per-index specs gate separately:
  *
  *   - each index consumes its projection of the SAME source through
  *     its own checkpointed query (the production fan-out shape);
  *   - the kill simulation writes each index's partial-epoch artifact
  *     exactly where a JVM death would leave it (text: postings dir
  *     without the stats commit marker; vector: orphan vectors/ dir
  *     without the codes commit marker; media: garbage bands in the
  *     next epoch dir);
  *   - after restart + replay, every index must serve BIT-IDENTICALLY
  *     to a batch build over the full corpus — the partial artifacts
  *     must be invisible before the replay and overwritten by it.
  */
class CombinedStreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("cmbwh").toString)
    .getOrCreate()

  private def event(i: Long): (Long, String, Array[Float], Array[Byte]) = (
    i,
    (0 until 12).map(j => s"tok${(i * 7 + j * j) % 23}").mkString(" "),
    Array.tabulate(8)(j => ((i * 13 + j * 5) % 17).toFloat - 8f),
    Multimodal.encodeGray(
      Array.tabulate(64)(p => ((p * (i + 2) + 3) % 256).toInt), 8, 8, "bmp"))

  test("one stream, three indexes: kill-mid-batch replay converges to " +
      "batch-built on every modality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("cmb").toString
    val textPrefix = "cmb_text"
    TextIndex.drop(spark, textPrefix)
    val textRoot = s"$tmp/text"; val bqPath = s"$tmp/bq"; val imgPath = s"$tmp/img"

    // vector bootstrap: the quantizer trains on a seed corpus (ids
    // 1000+), exactly the production stream-onto-built-index shape
    val seed = (1000L until 1016L).map(i => (i, event(i)._3))
      .toDF("vec_id", "embedding")
    IncrementalBqIndex.build(seed, bqPath, numCells = 2)

    val b1 = (0L until 20L).map(event)
    val b2 = (20L until 40L).map(event)

    val source = MemoryStream[(Long, String, Array[Float], Array[Byte])]
    val events = source.toDF().toDF("id", "text", "embedding", "content")
    def startAll() = (
      TextIndex.streamingAppendEpochs(
        events.select(col("id").as("doc_id"), col("text")),
        textPrefix, textRoot, s"$tmp/ckpt-text", numBuckets = 4),
      IncrementalBqIndex.streamingAppend(
        events.select(col("id").as("vec_id"), col("embedding")),
        bqPath, s"$tmp/ckpt-bq"),
      ImageDup.streamingHashAppend(
        events.select(col("id").as("media_id"), col("content")),
        imgPath, s"$tmp/ckpt-img"))

    val (qt1, qv1, qi1) = startAll()
    source.addData(b1: _*)
    Seq(qt1, qv1, qi1).foreach(_.processAllAvailable())
    Seq(qt1, qv1, qi1).foreach(_.stop())

    // ---- inject each index's own mid-batch kill artifact ------------
    // text: epoch b1 postings (real schema — a killed batch writes real
    // rows, just without the stats commit marker)
    Seq(("phantom", 999L, 1L, 3L)).toDF("term", "doc_id", "tf", "dl")
      .write.mode("overwrite").parquet(s"$textRoot/postings/epoch=b1")
    // vector: orphan vectors/epoch=b1 with no codes/epoch=b1
    Seq((999L, Array.fill(8)(0f))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$bqPath/vectors/epoch=b1")
    // media: garbage bands in the next epoch dir
    Seq((999L, 0, 12345L)).toDF("media_id", "band", "val")
      .write.mode("overwrite").parquet(s"$imgPath/bands/epoch=1")

    // the partial text epoch must be INVISIBLE to serving (no marker)
    val probeTerms = Seq((0L, "tok0"), (0L, "tok4"), (1L, "tok7"))
      .toDF("qid", "term")
    val served1 = TextIndex.bm25TopDocsWithEpochs(spark, textPrefix,
        textRoot, probeTerms, topk = 5)
      .collect().map(_.toSeq).toSet
    assert(!served1.exists(_.contains(999L)),
      "marker-less partial epoch leaked into text serving")

    // ---- restart with the SAME checkpoints; b2 replays as batch 1 ---
    val (qt2, qv2, qi2) = startAll()
    source.addData(b2: _*)
    Seq(qt2, qv2, qi2).foreach(_.processAllAvailable())
    Seq(qt2, qv2, qi2).foreach(_.stop())

    val all = b1 ++ b2

    // ---- text: stream-built ≡ batch-built ---------------------------
    val batchPrefix = "cmb_text_batch"
    TextIndex.drop(spark, batchPrefix)
    TextIndex.build(all.map(e => (e._1, e._2)).toDF("doc_id", "text"),
      batchPrefix, numBuckets = 4)
    val wantText = TextIndex.bm25TopDocs(spark, batchPrefix, probeTerms,
      topk = 5).collect().map(_.toSeq).toSet
    val gotText = TextIndex.bm25TopDocsWithEpochs(spark, textPrefix,
      textRoot, probeTerms, topk = 5).collect().map(_.toSeq).toSet
    assert(gotText == wantText, "text epoch-union serve != batch build")
    // fold epochs into the bucketed tables: serving unchanged, dirs gone
    TextIndex.foldEpochs(spark, textPrefix, textRoot, numBuckets = 4)
    val folded = TextIndex.bm25TopDocs(spark, textPrefix, probeTerms,
      topk = 5).collect().map(_.toSeq).toSet
    assert(folded == wantText, "post-fold serve != batch build")
    val fs = new org.apache.hadoop.fs.Path(textRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$textRoot/postings")))

    // ---- vector: stream-built ≡ batch-built over seed ∪ stream ------
    val probes = (0L until 5L).map(i => (i, event(i)._3))
      .toDF("query_id", "query_vec")
    val gotVec = IncrementalBqIndex.knnJoin(spark, bqPath, probes,
        k = 3, nprobe = 2, rerank = 10)
      .collect().map(_.toSeq).toSet
    val freshBq = s"$tmp/bqfresh"
    IncrementalBqIndex.build(seed, freshBq, numCells = 2)
    IncrementalBqIndex.append(
      all.map(e => (e._1, e._3)).toDF("vec_id", "embedding"), freshBq)
    val wantVec = IncrementalBqIndex.knnJoin(spark, freshBq, probes,
        k = 3, nprobe = 2, rerank = 10)
      .collect().map(_.toSeq).toSet
    assert(gotVec == wantVec, "vector epoch serve != batch append")
    assert(!gotVec.exists(_.contains(999L)),
      "orphan vectors epoch leaked into BQ serving")

    // ---- media: stream-built ≡ batch-built --------------------------
    val gotBands = ImageDup.bands(spark, imgPath)
      .collect().map(_.toSeq).toSet
    val wantBands = ImageDup.aHashBands(Multimodal.decodeImagePooledRaw(
        all.map(e => (e._1, e._4)).toDF("media_id", "content"), grid = 8))
      .collect().map(_.toSeq).toSet
    assert(gotBands == wantBands, "media stream bands != batch bands")

    TextIndex.drop(spark, textPrefix); TextIndex.drop(spark, batchPrefix)
  }
}
