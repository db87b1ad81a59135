package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WrecSpec extends AnyFunSuite {

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
      // variable-length payloads, some containing the magic bytes —
      // a mid-payload "GWR1" must not confuse the frame chain
      encode(concat(lit("<html>GWR1 body "),
        repeat(concat(col("id").cast("string"), lit(" ")),
          (pmod(col("id"), lit(40)) + 1).cast("int")),
        lit("</html>")), "UTF-8").as("content"))

  private def readAll(dir: String) =
    Wrec.read(spark, dir)
      .select(col("url"), col("fetch_ts"), col("content_type"),
        decode(col("content"), "UTF-8").as("body"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet

  test("write → read round-trips every record across multiple files, " +
      "with layout-stable global rec_ids") {
    val dir = Files.createTempDirectory("wrec").toString
    val df = fixture(500)
    Wrec.write(df.repartition(3), dir)
    val want = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getString(2), new String(r.getAs[Array[Byte]](3), "UTF-8"))).toSet
    assert(readAll(dir) == want)

    // rec_ids unique and stable across re-reads
    val ids1 = Wrec.read(spark, dir).select("rec_id").collect().map(_.getLong(0))
    assert(ids1.distinct.length == 500)
    val ids2 = Wrec.read(spark, dir).select("rec_id").collect().map(_.getLong(0))
    assert(ids1.sorted.toSeq == ids2.sorted.toSeq)
  }

  test("byte splits sync on the frame magic: tiny split sizes read " +
      "exactly the same records as one big split") {
    val dir = Files.createTempDirectory("wrecsplit").toString
    Wrec.write(fixture(300).repartition(1), dir)
    val whole = readAll(dir)
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val oldCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val split = Wrec.read(spark, dir)
      assert(split.rdd.getNumPartitions > 4,
        s"expected many splits, got ${split.rdd.getNumPartitions}")
      assert(readAll(dir) == whole)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", old)
      spark.conf.set("spark.sql.files.openCostInBytes", oldCost)
    }
  }

  test("truncated tail is skipped, not fatal; mid-file corruption " +
      "re-syncs and loses only the torn record") {
    val dir = Files.createTempDirectory("wrectrunc").toString
    Wrec.write(fixture(100).repartition(1), dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".wrec")).head.toPath
    val bytes = Files.readAllBytes(file)

    // truncate mid-record: drop the last 30 bytes
    val tdir = Files.createTempDirectory("wrect1").toString
    Files.write(Paths.get(tdir, "a.wrec"),
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 30))
    val got = readAll(tdir)
    assert(got.size == 99, s"expected 99 after tail truncation, ${got.size}")

    // tear ONE frame in the middle (zap its magic): the reader re-syncs
    // past payload bytes that merely LOOK like magic (the fixture plants
    // "GWR1" inside payloads) and loses exactly the torn record
    val offsets = {
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val acc = scala.collection.mutable.ArrayBuffer.empty[Int]
      var off = 0
      while (off + 16 <= bytes.length) {
        acc += off
        off += 16 + b.getInt(off + 4) + b.getLong(off + 8).toInt
      }
      acc.toSeq
    }
    val victim = offsets.minBy(o => math.abs(o - bytes.length / 2))
    val cdir = Files.createTempDirectory("wrect2").toString
    val corrupt = bytes.clone()
    java.util.Arrays.fill(corrupt, victim, victim + 4, 0x5a.toByte)
    Files.write(Paths.get(cdir, "a.wrec"), corrupt)
    val got2 = readAll(cdir)
    assert(got2.size == 99,
      s"expected exactly the torn record lost, got ${got2.size}")
    // and every surviving record is intact (a member of the original set)
    val want = readAll({ val d = Files.createTempDirectory("wrecref").toString
      Files.write(Paths.get(d, "a.wrec"), bytes); d })
    assert(got2.subsetOf(want))
  }

  test("frame-index sidecar: indexed and scan reads return identical " +
      "rows (rec_ids included); a torn record under the index loses " +
      "only itself; a corrupt sidecar falls back to scanning") {
    val dir = Files.createTempDirectory("wrecidx").toString
    Wrec.write(fixture(200).repartition(2), dir)
    // drop Hadoop local-FS .crc twins: this test edits files in place,
    // and a stale checksum would fail the read before the reader's own
    // fallback logic ever runs
    def dropCrc(d: String): Unit = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    dropCrc(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".gwx")), "writer must emit sidecars")
    def rows() = Wrec.read(spark, dir)
      .select("rec_id", "url", "fetch_ts", "content_type")
      .collect().map(_.toSeq).toSet
    val indexed = rows()
    // tiny splits under the index: binary-search positioning
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      assert(rows() == indexed)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    // corrupt one sidecar -> reader falls back to the scan path
    val gwx = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gwx")).head
    val gb = Files.readAllBytes(gwx.toPath)
    Files.write(gwx.toPath, "JUNK".getBytes ++ gb.drop(4))
    assert(rows() == indexed, "corrupt sidecar must fall back, not drop")
    Files.write(gwx.toPath, gb)
    // remove sidecars entirely -> scan path, identical rows
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gwx")).foreach(_.delete())
    assert(rows() == indexed, "scan path must equal the indexed path")

    // torn record WITH the index present: per-offset validation skips
    // exactly the victim
    val d2 = Files.createTempDirectory("wrecidx2").toString
    Wrec.write(fixture(100).repartition(1), d2)
    dropCrc(d2)
    val wf = new java.io.File(d2).listFiles()
      .filter(_.getName.endsWith(".wrec")).head
    val bytes = Files.readAllBytes(wf.toPath)
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var off = 0
    while (off + 16 <= bytes.length) {
      offs += off
      off += 16 + b.getInt(off + 4) + b.getLong(off + 8).toInt
    }
    val victim = offs.minBy(o => math.abs(o - bytes.length / 2))
    val corrupt = bytes.clone()
    java.util.Arrays.fill(corrupt, victim, victim + 4, 0x5a.toByte)
    Files.write(wf.toPath, corrupt)
    val got = Wrec.read(spark, d2).count()
    assert(got == 99, s"expected exactly the torn record lost, got $got")
  }

  test("a direct format(\"wrec\").load without the path option derives " +
      "path-hash file indexes: rec_ids stay unique across files") {
    val dir = Files.createTempDirectory("wrecdirect").toString
    Wrec.write(fixture(200).repartition(4), dir)
    val df = spark.read.format(classOf[WrecFileFormat].getName).load(dir)
    val ids = df.select("rec_id").collect().map(_.getLong(0))
    assert(ids.length == 200)
    assert(ids.distinct.length == 200,
      "equal offsets across files must not collide without the index map")
    assert(ids.forall(_ >= 0L), "path-hash index must keep rec_id positive")
    // and the indexed read sees the same records
    assert(df.select("url").collect().map(_.getString(0)).toSet ==
      Wrec.read(spark, dir).select("url").collect().map(_.getString(0)).toSet)
  }

  test("nested directories: the planned file index recurses, so every " +
      "scanned file is covered (no loud-absence failure)") {
    val root = Files.createTempDirectory("wrecnest").toString
    Wrec.write(fixture(60).repartition(2), s"$root/a/deep")
    Wrec.write(fixture(100).filter(col("url").endsWith("9")), s"$root/b")
    val got = Wrec.read(spark, s"$root/*").select("rec_id").collect()
      .map(_.getLong(0))
    assert(got.length == got.distinct.length, "rec_ids must be unique")
    assert(got.length == 70, s"expected 60 + 10 records, got ${got.length}")
  }

  test("column pruning: a metadata-only scan returns the same header " +
      "fields without the content column in the plan") {
    val dir = Files.createTempDirectory("wrecprune").toString
    Wrec.write(fixture(50).repartition(1), dir)
    val meta = Wrec.read(spark, dir).select("url", "fetch_ts")
    assert(!meta.queryExecution.executedPlan.toString.contains("content"))
    assert(meta.count() == 50)
  }
}
