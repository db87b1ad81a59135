package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming crawl ingest through the WARC front door: files arriving
  * over time are decoded by the SAME splittable reader as the batch
  * path (plain and member-gzipped alike), so the stream's union must
  * equal the batch read of the final directory — including the
  * composed extract step a real ingest would run per micro-batch. */
class WarcStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def fixture(from: Int, n: Int): DataFrame =
    spark.range(from, from + n).select(
      concat(lit("https://example.test/doc/"), col("id")).as("url"),
      (lit(1700000000L) + col("id")).as("fetch_ts"),
      lit("text/html").as("content_type"),
      encode(concat(lit("<html><p>body "), col("id").cast("string"),
        lit("</p></html>")), "UTF-8").as("content"))

  test("files arriving across micro-batches stream the same records " +
      "the batch reader sees — plain and gz dumps mixed") {
    val dir = Files.createTempDirectory("warcstream").toString
    val ckpt = Files.createTempDirectory("warcstreamck").toString

    // wave 1 on disk BEFORE the stream starts (a: plain)
    val wave1 = Files.createTempDirectory("w1").toString
    Warc.write(fixture(0, 40).repartition(1), wave1)
    Files.copy(new java.io.File(wave1).listFiles()
      .filter(_.getName.endsWith(".warc")).head.toPath,
      Paths.get(dir, "a.warc"))

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
    val q = Warc.readStream(spark, dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        // the per-batch ingest a real pipeline runs: decode + measure
        val rows = batch
          .select(col("fetch_ts"), col("url"),
            length(decode(col("content"), "UTF-8")).as("n"))
          .collect()
        seen.synchronized {
          seen ++= rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val afterWave1 = seen.synchronized(seen.size)
      assert(afterWave1 == 40, s"wave 1: expected 40 rows, got $afterWave1")

      // wave 2 arrives while the stream runs (b: member-gzipped)
      val wave2 = Files.createTempDirectory("w2").toString
      Warc.writeGz(fixture(40, 25).repartition(1), wave2)
      Files.copy(new java.io.File(wave2).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).head.toPath,
        Paths.get(dir, "b.warc.gz"))
      q.processAllAvailable()
    } finally q.stop()

    val want = Warc.read(spark, dir)
      .select(col("fetch_ts"), col("url"),
        length(decode(col("content"), "UTF-8")).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(want.size == 65)
    assert(seen.synchronized(seen.toSet) == want)
  }
}
