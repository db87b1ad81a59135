package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def fixture(n: Int): org.apache.spark.sql.DataFrame =
    spark.range(0, n).select(
      concat(lit("https://example.test/doc/"), col("id")).as("url"),
      (lit(1700000000L) + col("id")).as("fetch_ts"),
      lit("text/html").as("content_type"),
      // payloads embed a fake WARC version line — a mid-payload
      // "WARC/1.0\r\n" must not be accepted as a record (chain rule)
      encode(concat(lit("<html>WARC/1.0\r\nContent-Length: 7\r\n body "),
        repeat(concat(col("id").cast("string"), lit(" ")),
          (pmod(col("id"), lit(40)) + 1).cast("int")),
        lit("</html>")), "UTF-8").as("content"))

  private def readAll(dir: String) =
    Warc.read(spark, dir)
      .select(col("url"), col("fetch_ts"), col("content_type"),
        decode(col("content"), "UTF-8").as("body"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet

  test("a hand-framed spec-form WARC/1.0 fixture decodes field-exact: " +
      "headers in any order/case, ISO date parsed, payload byte-exact") {
    val payload1 = "hello warc body one".getBytes(StandardCharsets.UTF_8)
    val payload2 = Array[Byte](0, 1, 2, 3, -1, -2, 13, 10, 13, 10, 7)
    val rec1 =
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n" +
        "WARC-Date: 2026-01-02T03:04:05Z\r\n" +
        "WARC-Target-URI: https://example.test/a\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${payload1.length}\r\n" +
        "\r\n"
    // different header ORDER and lower-case names; binary payload that
    // embeds \r\n\r\n (Content-Length framing must win over scanning)
    val rec2 =
      "WARC/1.0\r\n" +
        s"content-length: ${payload2.length}\r\n" +
        "warc-target-uri: https://example.test/b\r\n" +
        "content-type: application/octet-stream\r\n" +
        "warc-date: 2026-02-03T04:05:06Z\r\n" +
        "WARC-Type: resource\r\n" +
        "\r\n"
    val dir = Files.createTempDirectory("warcfix").toString
    val out = new java.io.ByteArrayOutputStream()
    out.write(rec1.getBytes(StandardCharsets.UTF_8)); out.write(payload1)
    out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    out.write(rec2.getBytes(StandardCharsets.UTF_8)); out.write(payload2)
    out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    Files.write(Paths.get(dir, "fix.warc"), out.toByteArray)

    val got = Warc.read(spark, dir)
      .orderBy("rec_id")
      .select("warc_type", "url", "fetch_ts", "content_type", "content")
      .collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "response")
    assert(got(0).getString(1) == "https://example.test/a")
    assert(got(0).getLong(2) ==
      java.time.Instant.parse("2026-01-02T03:04:05Z").getEpochSecond)
    assert(got(0).getString(3) == "text/plain")
    assert(got(0).getAs[Array[Byte]](4).toSeq == payload1.toSeq)
    assert(got(1).getString(0) == "resource")
    assert(got(1).getString(1) == "https://example.test/b")
    assert(got(1).getAs[Array[Byte]](4).toSeq == payload2.toSeq)
  }

  test("write → read round-trips every record across multiple files " +
      "with unique rec_ids") {
    val dir = Files.createTempDirectory("warc").toString
    val df = fixture(300)
    Warc.write(df.repartition(3), dir)
    val want = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getString(2), new String(r.getAs[Array[Byte]](3), "UTF-8"))).toSet
    assert(readAll(dir) == want)
    val ids = Warc.read(spark, dir).select("rec_id").collect().map(_.getLong(0))
    assert(ids.distinct.length == 300)
  }

  test("byte splits sync on the version line + chain rule: tiny splits " +
      "read exactly the same records as one big split") {
    val dir = Files.createTempDirectory("warcsplit").toString
    Warc.write(fixture(300).repartition(1), dir)
    val whole = readAll(dir)
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val oldCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val split = Warc.read(spark, dir)
      assert(split.rdd.getNumPartitions > 4,
        s"expected many splits, got ${split.rdd.getNumPartitions}")
      assert(readAll(dir) == whole)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", old)
      spark.conf.set("spark.sql.files.openCostInBytes", oldCost)
    }
  }

  test("truncated tail is skipped, not fatal; a torn mid-file record " +
      "loses only itself") {
    val dir = Files.createTempDirectory("warctrunc").toString
    Warc.write(fixture(100).repartition(1), dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc")).head.toPath
    val bytes = Files.readAllBytes(file)

    // drop the last 30 bytes: the final record's payload is incomplete
    val tdir = Files.createTempDirectory("warct1").toString
    Files.write(Paths.get(tdir, "a.warc"),
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 30))
    assert(readAll(tdir).size == 99)

    // zap one mid-file record's version line: the reader re-syncs past
    // it (and past the payload-planted fake version lines) and loses
    // exactly the torn record
    val marker = "WARC/1.0\r\nWARC-Type".getBytes(StandardCharsets.UTF_8)
    def offsets(b: Array[Byte]): Seq[Int] = {
      val acc = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i >= 0 && i < b.length) {
        i = indexOfSlice(b, marker, i)
        if (i >= 0) { acc += i; i += 1 }
      }
      acc.toSeq
    }
    val offs = offsets(bytes)
    assert(offs.length == 100)
    val victim = offs.minBy(o => math.abs(o - bytes.length / 2))
    val corrupt = bytes.clone()
    java.util.Arrays.fill(corrupt, victim, victim + 4, 0x5a.toByte)
    val cdir = Files.createTempDirectory("warct2").toString
    Files.write(Paths.get(cdir, "a.warc"), corrupt)
    val got = readAll(cdir)
    assert(got.size == 99, s"expected exactly the torn record lost, ${got.size}")
    assert(got.subsetOf(readAll(dir)))
  }

  test("column pruning: a metadata-only scan keeps header fields and " +
      "drops the content column from the plan") {
    val dir = Files.createTempDirectory("warcprune").toString
    Warc.write(fixture(50).repartition(1), dir)
    val meta = Warc.read(spark, dir).select("url", "fetch_ts", "warc_type")
    assert(!meta.queryExecution.executedPlan.toString.contains("content"))
    assert(meta.count() == 50)
    assert(meta.filter(col("warc_type") === "response").count() == 50)
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte],
      from: Int): Int = {
    var i = from
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
