package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.HtmlExtract
import graft.sources.Wrec

/** The raw-crawl FRONT DOOR at scale: N HTML pages (synthetic text
  * wrapped in crawl chrome — head/script/style, link-saturated nav and
  * footer) framed as wrec records, then the full ingest chain a 100 TB
  * crawl actually pays:
  *
  *   wrec scan (record-framed splittable source)
  *     → HTML boilerplate extraction (block split, link density, cut)
  *     → the corpus_clean convention (normalized text, length filter)
  *
  * Reported: wrec write + scan MB/s (the source's framing overhead),
  * end-to-end extraction docs/s and MB/s, and the boilerplate cut ratio
  * (chrome chars dropped / total) — the BASELINE decode-throughput row
  * for the crawl path (the media battery's decodeImage precedent).
  *
  * `sbt "runMain graft.bench.CrawlScaleMain 1000000 80 50000"`
  */
object CrawlScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val len = if (args.length > 1) args(1).toInt else 80
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("crawl").toString
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // synthetic pages: corpus text in crawl chrome (one <p> per half)
    val pages = TextIndexScaleMain.corpus(spark, n, len, vocab)
      .select(
        concat(lit("https://crawl.test/page/"), col("doc_id")).as("url"),
        (lit(1700000000L) + col("doc_id")).as("fetch_ts"),
        lit("text/html").as("content_type"),
        encode(concat(
          lit("<html><head><title>page "), col("doc_id").cast("string"),
          lit("</title><style>body{margin:0}</style>" +
            "<script>var x = 1 < 2;</script></head><body>" +
            "<!-- chrome --><nav><a href=\"/\">home</a> " +
            "<a href=\"/about\">about us</a> <a href=\"/tags\">all tags</a>" +
            "</nav><h1>page "),
          col("doc_id").cast("string"), lit("</h1><p>"),
          expr("substr(text, 1, cast(floor(length(text)/2.0) as int))"),
          lit("</p><p>"),
          expr("substr(text, cast(floor(length(text)/2.0) as int) + 1, " +
            "length(text))"),
          lit("</p><footer><a href=\"/privacy\">privacy policy</a> " +
            "<a href=\"/terms\">terms of use</a> (c) site</footer>" +
            "</body></html>"), lit(""))
          .cast("string"), "UTF-8").as("content"))
      .repartition(cpus.toInt)

    val (_, writeS) = timed(Wrec.write(pages, s"$tmp/wrec"))
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$tmp/wrec")).getLength
    println(f"CRAWL write n=$n bytes=${bytes / 1e9}%.2fGB wall=$writeS%.1fs " +
      f"(${bytes / writeS / 1e6}%.0f MB/s)")

    // scan-only: record framing + header parse, payloads pruned
    val (cnt0, scanS) = timed(
      Wrec.read(spark, s"$tmp/wrec").select("url", "fetch_ts").count())
    println(f"CRAWL scan-meta n=$cnt0 wall=$scanS%.1fs " +
      f"(${cnt0 / scanS / 1e3}%.0fk rec/s)")

    // the full front door: wrec scan → decode → extract → clean filter
    // (the typed KERNEL — the oracle-gated Column twin is spec-pinned
    // bit-identical; also timed below for the ratio)
    def frontDoor(kernel: Boolean) = {
      val recs = Wrec.read(spark, s"$tmp/wrec")
        .select(col("rec_id").as("doc_id"),
          decode(col("content"), "UTF-8").as("html"))
      val ex = if (kernel) HtmlExtract.extractKernel(recs, col("html"))
        else HtmlExtract.extract(recs, col("html"))
      ex.filter(col("content_chars") >= 20)
        .agg(count(lit(1)), sum("content_chars"), sum("n_blocks"),
          sum("n_content"))
        .first()
    }
    val (row, exS) = timed(frontDoor(kernel = true))
    val kept = row.getLong(0)
    val contentChars = row.getLong(1)
    println(f"CRAWL extract n=$n kept=$kept wall=$exS%.1fs " +
      f"(${n / exS / 1e3}%.1fk docs/s, ${bytes / exS / 1e6}%.0f MB/s in) " +
      f"content_chars=$contentChars " +
      f"cut_ratio=${1.0 - contentChars.toDouble / bytes}%.3f " +
      f"blocks=${row.getLong(2)} content_blocks=${row.getLong(3)} kernel=typed")
    val (row2, exS2) = timed(frontDoor(kernel = false))
    require(row2 == row, "Column pipeline diverged from the kernel")
    println(f"CRAWL extract-column wall=$exS2%.1fs " +
      f"(${n / exS2 / 1e3}%.1fk docs/s) ratio=${exS2 / exS}%.1fx")

    // the GZIP front door: the same pages as one-member-per-record
    // .warc.gz (the layout crawl archives actually ship), split-read on
    // CRC-validated member boundaries → decode → extract. The aggregate
    // must equal the wrec path's row — same documents, different codec.
    val (_, gzWriteS) = timed(graft.sources.Warc.writeGz(pages, s"$tmp/warcgz"))
    val gzBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$tmp/warcgz")).getLength
    println(f"CRAWL gz-write n=$n bytes=${gzBytes / 1e9}%.2fGB " +
      f"(${gzBytes.toDouble / bytes}%.2fx of wrec) wall=$gzWriteS%.1fs " +
      f"(${gzBytes / gzWriteS / 1e6}%.0f MB/s)")
    val (gzRow, gzS) = timed {
      val recs = graft.sources.Warc.read(spark, s"$tmp/warcgz")
        .select(col("rec_id").as("doc_id"),
          decode(col("content"), "UTF-8").as("html"))
      HtmlExtract.extractKernel(recs, col("html"))
        .filter(col("content_chars") >= 20)
        .agg(count(lit(1)), sum("content_chars"), sum("n_blocks"),
          sum("n_content"))
        .first()
    }
    require(gzRow == row, "gz front door diverged from the wrec path")
    println(f"CRAWL gz-extract n=$n wall=$gzS%.1fs " +
      f"(${n / gzS / 1e3}%.1fk docs/s, ${gzBytes / gzS / 1e6}%.0f MB/s " +
      f"compressed in) ratio=${gzS / exS}%.1fx of wrec")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
