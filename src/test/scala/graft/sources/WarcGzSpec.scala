package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the member-gzipped WARC path (`*.warc.gz`): the plain
  * WarcSpec's round-trip/split/truncation contract, plus the gz-only
  * hazards — a payload embedding the gzip magic (CRC sync must reject
  * it), a multi-record member (leniency), and mixed plain+gz dirs. */
class WarcGzSpec extends AnyFunSuite {

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
      // payloads embed BOTH hazard patterns: a fake WARC version line
      // and the raw gzip member magic bytes (1f 8b 08)
      concat(encode(lit("<html>WARC/1.0\r\nContent-Length: 7\r\n "), "UTF-8"),
        lit(Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x00, 0x00)),
        encode(concat(lit(" body "),
          repeat(concat(col("id").cast("string"), lit(" ")),
            (pmod(col("id"), lit(40)) + 1).cast("int")),
          lit("</html>")), "UTF-8")).as("content"))

  private def readAll(dir: String) =
    Warc.read(spark, dir)
      .select(col("url"), col("fetch_ts"), col("content_type"), col("content"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq))
      .toSet

  test("writeGz → read round-trips every record byte-exact across files " +
      "with unique rec_ids, despite payload-embedded gzip magic") {
    val dir = Files.createTempDirectory("warcgz").toString
    val df = fixture(300)
    Warc.writeGz(df.repartition(3), dir)
    val want = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getString(2), r.getAs[Array[Byte]](3).toSeq)).toSet
    assert(readAll(dir) == want)
    val ids = Warc.read(spark, dir).select("rec_id").collect().map(_.getLong(0))
    assert(ids.distinct.length == 300)
  }

  test("byte splits sync on CRC-valid member boundaries: tiny splits " +
      "read exactly the same records as one big split") {
    val dir = Files.createTempDirectory("warcgzsplit").toString
    Warc.writeGz(fixture(300).repartition(1), dir)
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

  test("truncated tail loses only the torn member; mid-file corruption " +
      "re-syncs losing only the zapped member") {
    val dir = Files.createTempDirectory("warcgztrunc").toString
    Warc.writeGz(fixture(100).repartition(1), dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head.toPath
    val bytes = Files.readAllBytes(file)

    // drop the last 9 bytes: the final member loses its CRC trailer
    val tdir = Files.createTempDirectory("warcgzt1").toString
    Files.write(Paths.get(tdir, "a.warc.gz"),
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 9))
    val truncated = readAll(tdir)
    assert(truncated.size == 99, s"expected 99, got ${truncated.size}")

    // zap 4 bytes mid-file: exactly one member's CRC breaks
    val corrupt = bytes.clone()
    val mid = bytes.length / 2
    java.util.Arrays.fill(corrupt, mid, mid + 4, 0x5a.toByte)
    val cdir = Files.createTempDirectory("warcgzt2").toString
    Files.write(Paths.get(cdir, "a.warc.gz"), corrupt)
    val got = readAll(cdir)
    assert(got.size == 99, s"expected exactly one member lost, ${got.size}")
    assert(got.subsetOf(readAll(dir)))
  }

  test("a member carrying several records emits all of them (leniency) " +
      "and a mixed plain+gz directory reads both") {
    // hand-frame one gzip member holding TWO records
    val p1 = "first payload".getBytes(StandardCharsets.UTF_8)
    val p2 = "second payload".getBytes(StandardCharsets.UTF_8)
    def rec(uri: String, p: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Date: 2026-01-02T03:04:05Z\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${p.length}\r\n" +
        "\r\n").getBytes(StandardCharsets.UTF_8) ++ p ++
        "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
    val member = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(member)
    gz.write(rec("https://example.test/a", p1))
    gz.write(rec("https://example.test/b", p2))
    gz.close()

    val dir = Files.createTempDirectory("warcgzmulti").toString
    Files.write(Paths.get(dir, "multi.warc.gz"), member.toByteArray)
    // plus one PLAIN warc file in the same directory
    Files.write(Paths.get(dir, "plain.warc"),
      rec("https://example.test/c", "third".getBytes(StandardCharsets.UTF_8)))

    val got = Warc.read(spark, dir)
      .select("url", "content").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8")))
      .toSet
    assert(got == Set(
      ("https://example.test/a", "first payload"),
      ("https://example.test/b", "second payload"),
      ("https://example.test/c", "third")))
    val ids = Warc.read(spark, dir).select("rec_id")
      .collect().map(_.getLong(0))
    assert(ids.distinct.length == 3)
  }
}
