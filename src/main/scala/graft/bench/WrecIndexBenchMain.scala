package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Wrec

/** The frame-index sidecar's measured case (VERDICT r13 #6): a
  * metadata-only pass over a crawl dump should not touch payload
  * bytes. At CrawlScaleMain's ~0.8 KB payloads the sidecar is neutral
  * (records are denser than the 64 KB read buffer, so the scan path
  * reads every byte anyway — measured 798k rec/s with or without);
  * the win case is the real-crawl shape, payloads of tens of KB to MB
  * (images, PDFs, media in the dump), where indexed iteration hops
  * header-to-header by positioned read and the scan path drags the
  * payload through the buffer. This main writes `n` records of
  * `payloadKb` payloads, metadata-scans with the sidecar present,
  * deletes the sidecars, and scans again — same rows both ways (the
  * WrecSpec identity, re-asserted here), the delta is pure I/O.
  *
  * Phases run as separate JVMs so the harness can drop the page cache
  * between them (a warm cache hides all I/O — measured: indexed and
  * scan are both ~0.4 s over 2 GB warm):
  *
  *   scripts/run_main.sh graft.bench.WrecIndexBenchMain write 20000 100 /tmp/wrecidx
  *   scripts/run_main.sh graft.bench.WrecIndexBenchMain scan 20000 100 /tmp/wrecidx
  *   scripts/run_main.sh graft.bench.WrecIndexBenchMain strip 20000 100 /tmp/wrecidx
  *   scripts/run_main.sh graft.bench.WrecIndexBenchMain scan 20000 100 /tmp/wrecidx
  */
object WrecIndexBenchMain {
  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "all"
    val n = if (args.length > 1) args(1).toLong else 20000L
    val payloadKb = if (args.length > 2) args(2).toInt else 100
    val dir = if (args.length > 3) args(3) else "/tmp/wrecidx"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytes: Long = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$dir/wrec")).getLength

    mode match {
      case "write" =>
        val payloadB = payloadKb * 1024
        val pages = spark.range(0, n)
          .select(
            concat(lit("https://crawl.test/blob/"), col("id")).as("url"),
            (lit(1700000000L) + col("id")).as("fetch_ts"),
            lit("application/octet-stream").as("content_type"),
            // per-record distinct bytes (repeat of the id) — cheap to
            // generate, distinct per record
            expr(s"cast(repeat(concat(cast(id as string), '|'), " +
              s"cast($payloadB / (length(cast(id as string)) + 1) + 1 as int)) " +
              s"as binary)").as("content"))
          .repartition(cpus.toInt)
        val (_, writeS) = timed(Wrec.write(pages, s"$dir/wrec"))
        println(f"WRECIDX write n=$n payload=${payloadKb}KB " +
          f"bytes=${bytes / 1e9}%.2fGB wall=$writeS%.1fs")

      case "strip" =>
        // drop the sidecars -> reader falls back to the scan path
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/wrec"))
          .filter(_.getPath.getName.endsWith(".gwx"))
          .foreach(s => fs.delete(s.getPath, false))
        println(s"WRECIDX stripped sidecars under $dir/wrec")

      case "scan" =>
        val hasIdx = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/wrec"))
          .exists(_.getPath.getName.endsWith(".gwx"))
        val label = if (hasIdx) "indexed" else "scan"
        val b = bytes
        val (rows, w) = timed(Wrec.read(spark, s"$dir/wrec")
          .select("url", "fetch_ts")
          .agg(count(lit(1)), sum(length(col("url"))))
          .first().getLong(0))
        require(rows == n, s"scan-meta rows $rows != expected $n")
        println(f"WRECIDX scan-meta $label n=$rows wall=$w%.2fs " +
          f"(${rows / w / 1e3}%.0fk rec/s over ${b / 1e9}%.2fGB on disk)")

      case "cold" =>
        // JVM-warm / data-cold: a whole-JVM cold run is dominated by
        // ~190 MB of jar+class loading (measured), so warm the session
        // with one scan, then drop the page cache and time the scan
        // alone — only the data file (and stragglers of lazy
        // classloading) re-read from disk
        val hasIdx = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/wrec"))
          .exists(_.getPath.getName.endsWith(".gwx"))
        val label = if (hasIdx) "indexed" else "scan"
        def scan(): (Long, Double) =
          timed(Wrec.read(spark, s"$dir/wrec")
            .select("url", "fetch_ts")
            .agg(count(lit(1)), sum(length(col("url"))))
            .first().getLong(0))
        scan() // warm the JVM
        import scala.sys.process._
        for (rep <- 1 to 2) {
          require(
            (Seq("/bin/sh", "-c",
              "sync && echo 3 > /proc/sys/vm/drop_caches").! == 0),
            "drop_caches failed (needs root)")
          val (rows, w) = scan()
          require(rows == n, s"scan-meta rows $rows != expected $n")
          println(f"WRECIDX cold-data $label rep=$rep n=$rows wall=$w%.2fs " +
            f"(${bytes / w / 1e6}%.0f MB/s stream-equiv)")
        }

      case "clean" =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

      case other => sys.error(s"unknown mode '$other'")
    }
    spark.stop()
  }
}
