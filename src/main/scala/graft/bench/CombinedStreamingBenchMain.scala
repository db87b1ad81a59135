package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ImageDup, Multimodal, TextIndex}
import graft.streaming.IncrementalBqIndex

/** Combined streaming ingest at 1M events: ONE event table (text +
  * embedding + real image payload per row) streamed through a file
  * source into all three modality indexes, with a KILL injected
  * mid-stream and the checkpointed restart asserted to converge every
  * index to its batch-built row count.
  *
  *   - text  → `TextIndex.streamingAppendEpochs` (postings epochs +
  *             stats commit markers)
  *   - vector→ `IncrementalBqIndex.streamingAppend` (residual-BQ code
  *             epochs, bootstrap-trained quantizer)
  *   - media → `ImageDup.streamingHashAppend` (decode → aHash bands)
  *
  * Each sink drains the same `files`-file source (maxFilesPerTrigger=1
  * ⇒ one epoch per file) SEQUENTIALLY for a clean per-sink ingest
  * rate; the media sink is killed after ~half its files and restarted
  * on the same checkpoint. Rates are events/s through the full decode/
  * tokenize/encode path of each modality.
  *
  * `sbt "runMain graft.bench.CombinedStreamingBenchMain 1000000 20"`
  */
object CombinedStreamingBenchMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val files = if (args.length > 1) args(1).toInt else 20
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("cmbwh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cmbbench").toString

    // ---- event table: Zipf text + clustered embedding + REAL 8x8 BMP
    val t0 = System.nanoTime()
    val emb = graft.sources.VectorSources
      .syntheticClustered(spark, n, dim, numClusters = 64, spread = 0.15)
      .select(col("vec_id").as("id"), col("embedding"))
    val text = TextIndexScaleMain.corpus(spark, n, len = 30, vocab = 50000)
      .select(col("doc_id").as("id"), col("text"))
    val events = emb.join(text, Seq("id"))
      .as[(Long, Array[Float], String)]
      .map { case (id, e, tx) =>
        val px = Array.tabulate(64)(p =>
          ((e(p % dim) * 127.0 + 128.0).toInt.max(0).min(255)))
        (id, tx, e, Multimodal.encodeGray(px, 8, 8, "bmp"))
      }.toDF("id", "text", "embedding", "content")
    events.repartition(files).write.mode("overwrite")
      .parquet(s"$tmp/events")
    println(f"CMBSTREAM events n=$n files=$files " +
      f"gen=${(System.nanoTime() - t0) / 1e9}%.1fs")

    val src = spark.readStream
      .schema(spark.read.parquet(s"$tmp/events").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/events")

    def drain(label: String)(start: => org.apache.spark.sql.streaming.StreamingQuery): Double = {
      val t = System.nanoTime()
      val q = start
      q.processAllAvailable(); q.stop()
      val wall = (System.nanoTime() - t) / 1e9
      println(f"CMBSTREAM sink=$label wall=$wall%.1fs " +
        f"rate=${n / wall}%.0f events/s")
      wall
    }

    // ---- text ------------------------------------------------------
    val textPrefix = "cmb_bench_text"
    TextIndex.drop(spark, textPrefix)
    drain("text") {
      TextIndex.streamingAppendEpochs(
        src.select(col("id").as("doc_id"), col("text")),
        textPrefix, s"$tmp/textroot", s"$tmp/ckpt-text")
    }
    val textStats = TextIndex.foldEpochs(spark, textPrefix, s"$tmp/textroot")
    println(s"CMBSTREAM text indexed n=${textStats.n} (fold to bucketed base done)")
    require(textStats.n == n, s"text index lost rows: ${textStats.n} != $n")

    // ---- vector (bootstrap-trained quantizer) ----------------------
    val bqPath = s"$tmp/bq"
    IncrementalBqIndex.build(
      emb.filter(col("id") < 100000)
        .select(col("id").as("vec_id"), col("embedding")),
      bqPath, numCells = 64)
    drain("vector") {
      IncrementalBqIndex.streamingAppend(
        src.filter(col("id") >= 100000)
          .select(col("id").as("vec_id"), col("embedding")),
        bqPath, s"$tmp/ckpt-bq")
    }
    val vecN = IncrementalBqIndex.indexedCount(spark, bqPath)
    println(s"CMBSTREAM vector indexed n=$vecN")
    require(vecN == n, s"vector index lost rows: $vecN != $n")

    // ---- media, WITH a mid-stream kill + checkpointed restart ------
    val imgPath = s"$tmp/img"
    val tm = System.nanoTime()
    val q1 = ImageDup.streamingHashAppend(
      src.select(col("id").as("media_id"), col("content")),
      imgPath, s"$tmp/ckpt-img")
    // kill after ~half the files have been committed
    while (q1.isActive && q1.recentProgress.length < files / 2)
      Thread.sleep(200)
    q1.stop()
    val committedAtKill = q1.recentProgress.length
    val q2 = ImageDup.streamingHashAppend(
      src.select(col("id").as("media_id"), col("content")),
      imgPath, s"$tmp/ckpt-img")
    q2.processAllAvailable(); q2.stop()
    val mediaWall = (System.nanoTime() - tm) / 1e9
    val bandRows = ImageDup.bands(spark, imgPath).count()
    println(f"CMBSTREAM sink=media wall=$mediaWall%.1fs " +
      f"rate=${n / mediaWall}%.0f events/s " +
      f"(killed after ~$committedAtKill batches, restarted on checkpoint)")
    require(bandRows == n * 4,
      s"media bands after kill+restart: $bandRows != ${n * 4}")
    println(s"CMBSTREAM media bands=$bandRows == 4n — kill+replay converged")
    spark.stop()
  }
}
