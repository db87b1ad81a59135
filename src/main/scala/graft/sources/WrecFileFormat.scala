package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC-style record-framed crawl source — the raw front door a 100 TB
  * corpus actually arrives through (reference analog: the record-framed
  * binary decoders at /root/reference/src/bench/dataset.ts:65-151; the
  * framing semantics are WARC's, reduced to a length-prefixed binary
  * form so splits need no textual header parsing).
  *
  * Record layout (all ints little-endian):
  * {{{
  *   magic "GWR1" (4B) | headerLen int32 | payloadLen int64
  *   | header bytes (UTF-8 "url\tfetch_ts\tcontent_type")
  *   | payload bytes
  * }}}
  *
  * Unlike fvecs, records are VARIABLE length, so byte splits cannot
  * jump to a record boundary arithmetically. Instead each split SYNCS
  * the way Hadoop's splittable formats do: scan forward from the split
  * start for the magic, validate the frame (sane lengths, frame fits
  * the file), and own every record whose magic offset lies inside
  * [start, start+length) — a record may EXTEND past the split end (the
  * reader reads on), and a record STARTING past it belongs to the next
  * split. After a valid record the next frame must start immediately;
  * if it doesn't (corrupt middle, torn write), the reader re-syncs
  * forward on the magic rather than fail — and a TRUNCATED TAIL (frame
  * promises more bytes than the file has) is skipped, not fatal: crawl
  * dumps end mid-record all the time (the codec stance).
  *
  * `rec_id` is reproducible across layouts: `fileIndex << 40 | offset`
  * with files path-ordered at plan time (offset < 2^40 = 1 TB/file).
  * Column pruning is honored — a metadata-only scan never materializes
  * payload bytes, and when the hidden frame-index sidecar is present
  * (the writer emits one per file) the reader follows indexed offsets —
  * split positioning is a binary search, not a forward magic scan.
  */
class WrecFileFormat extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "wrec"
  override def toString: String = "Wrec"

  override def inferSchema(sparkSession: SparkSession,
      options: Map[String, String], files: Seq[FileStatus]): Option[StructType] =
    if (files.isEmpty) None else Some(Wrec.schema)

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean = true

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String], dataSchema: StructType): OutputWriterFactory =
    throw new UnsupportedOperationException(
      "use graft.sources.Wrec.write(df, path)")

  override protected def buildReader(sparkSession: SparkSession,
      dataSchema: StructType, partitionSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val serConf = new SerConf(hadoopConf)
    val fields = requiredSchema.fieldNames
    val fileIndex: Map[String, Long] = Wrec.fileIndexes(sparkSession, options)

    (file: PartitionedFile) => {
      val path = file.toPath
      val fs = path.getFileSystem(serConf.conf)
      val fileLen = fs.getFileStatus(path).getLen
      val in = fs.open(path)
      // rec_id file index: planned map when the `graft.wrec.path` option
      // supplied one (dense, path-ordered); a partial map that misses a
      // scanned file is a config error — fail loudly, a silent 0 would
      // collide rec_ids across files at equal offsets. A direct
      // format("wrec").load(...) without the option gets a stable 23-bit
      // path hash instead (keeps rec_id positive; collision odds are
      // n²/2^24 over n files — use Wrec.read for dense indexes).
      val fIx = fileIndex.get(path.toUri.getPath) match {
        case Some(i) => i
        case None if fileIndex.nonEmpty =>
          throw new IllegalStateException(
            s"wrec: scanned file ${path.toUri.getPath} is absent from the " +
              "graft.wrec.path file index — pass a path/glob covering " +
              "every scanned file (Wrec.read does this)")
        case None => Wrec.pathHashIndex(path.toUri.getPath)
      }
      val splitEnd = file.start + file.length

      // OPTIONAL frame-index sidecar (hidden ".<name>.gwx", written by
      // Wrec.write; invisible to Spark's listing and to the rec_id file
      // index): the writer's frame offsets, so split positioning is a
      // binary search instead of a forward byte scan — a split landing
      // inside a huge payload otherwise scans megabytes for the magic —
      // and the sequential read follows offsets instead of validating
      // chains. Every indexed offset is still magic+sanity checked
      // before use: a stale or torn index degrades per record to the
      // scan path's skip semantics, never to wrong bytes. Results are
      // identical with and without the sidecar (spec-pinned).
      val frameIdx: Array[Long] = Wrec.readFrameIndex(fs, path, fileLen)

      // buffered forward reader over [start, fileLen). Metadata-only
      // scans over an INDEXED file shrink the buffer to head-sized
      // reads: the 64 KB refill at every frame head would drag most of
      // each payload through the page cache anyway (measured: the
      // sidecar was I/O-neutral on cold 100 KB-payload scans until
      // this), while 1 KB covers head + a typical header and leaves
      // payload bytes untouched on disk. With `content` projected the
      // big buffer wins (those bytes are needed regardless); without
      // the index the scan path's re-sync needs the big buffer too.
      val bufSize =
        if (frameIdx != null && !fields.contains("content")) 1 << 10
        else 1 << 16
      val buf = new Array[Byte](bufSize)
      var bufStart = -1L
      var bufLen = 0
      def byteAt(off: Long): Int = {
        if (off >= fileLen) return -1
        if (off < bufStart || off >= bufStart + bufLen) {
          bufStart = off
          bufLen = math.min(bufSize.toLong, fileLen - off).toInt
          in.readFully(off, buf, 0, bufLen)
        }
        buf((off - bufStart).toInt) & 0xff
      }
      def bytesAt(off: Long, n: Int): Array[Byte] = {
        val a = new Array[Byte](n)
        // serve small reads from the buffer, large ones directly
        if (n <= bufSize && off >= bufStart && off + n <= bufStart + bufLen)
          System.arraycopy(buf, (off - bufStart).toInt, a, 0, n)
        else in.readFully(off, a, 0, n)
        a
      }

      /** First offset >= from where a VALID frame starts, or -1.
        * Validity: magic + sane lengths + frame head fits the file
        * (payload truncation is checked at read time → skip) + the
        * CHAIN look-ahead: the frame must end at/past EOF or be
        * followed immediately by another sane frame head. Magic+length
        * sanity alone is ~2^-45-per-byte weak over 100 TB of arbitrary
        * payload bytes near split boundaries; chaining squares the
        * false-accept odds. Cost: a record whose SUCCESSOR is corrupt
        * is skipped when sync (not the sequential chain step) is what
        * finds it — the same bounded-loss class as a torn frame. */
      def sync(from: Long): Long = {
        var off = from
        while (off + Wrec.HeadLen <= fileLen) {
          if (byteAt(off) == 'G' && byteAt(off + 1) == 'W' &&
              byteAt(off + 2) == 'R' && byteAt(off + 3) == '1' &&
              frameSane(off) && chainsOk(off))
            return off
          off += 1
        }
        -1L
      }

      /** Chain look-ahead for the frame at `off` (lengths already sane):
        * accept if it ends at/past EOF (clean tail, or a truncated tail
        * the reader's truncation path will skip), if fewer than HeadLen
        * bytes follow (a torn next head — unverifiable), or if the
        * bytes at its end are another sane frame head. */
      def chainsOk(off: Long): Boolean = {
        val head = ByteBuffer.wrap(bytesAt(off, Wrec.HeadLen))
          .order(ByteOrder.LITTLE_ENDIAN)
        val end = off + Wrec.HeadLen + head.getInt(4) + head.getLong(8)
        if (end + Wrec.HeadLen > fileLen) true
        else byteAt(end) == 'G' && byteAt(end + 1) == 'W' &&
          byteAt(end + 2) == 'R' && byteAt(end + 3) == '1' && frameSane(end)
      }

      /** Length sanity of the frame at `off` (magic already matched):
        * non-negative header within bound, payload within the int
        * materialization limit (a > 2 GB pLen would truncate in
        * `.toInt` — negative-size crash or silently wrong bytes), frame
        * head inside the file. Shared by sync() and the CHAINED-frame
        * step, which previously trusted lens after a magic match. */
      def frameSane(off: Long): Boolean = {
        val head = ByteBuffer.wrap(bytesAt(off, Wrec.HeadLen))
          .order(ByteOrder.LITTLE_ENDIAN)
        val hLen = head.getInt(4)
        val pLen = head.getLong(8)
        hLen >= 0 && hLen <= Wrec.MaxHeaderLen &&
          pLen >= 0 && pLen <= Wrec.MaxPayloadLen &&
          off + Wrec.HeadLen + hLen <= fileLen
      }

      var idxPtr = 0
      def idxAdvance(): Long = {
        while (frameIdx != null && idxPtr < frameIdx.length) {
          val off = frameIdx(idxPtr)
          idxPtr += 1
          if (off + Wrec.HeadLen <= fileLen &&
              byteAt(off) == 'G' && byteAt(off + 1) == 'W' &&
              byteAt(off + 2) == 'R' && byteAt(off + 3) == '1' &&
              frameSane(off)) return off
        }
        -1L
      }
      def idxNextAt(from: Long): Long = {
        var lo = 0; var hi = frameIdx.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (frameIdx(mid) < from) lo = mid + 1 else hi = mid
        }
        idxPtr = lo
        idxAdvance()
      }
      /** Next valid frame at/after `from` — indexed when the sidecar is
        * present, scanning otherwise. */
      def nextFrame(from: Long): Long =
        if (frameIdx != null) idxNextAt(from) else sync(from)

      // a limit/take stops consuming mid-split — close the stream on
      // task completion regardless (the EmbeddingBridge teardown shape)
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))

      new Iterator[InternalRow] {
        private var cur = nextFrame(file.start)
        private var nextRow: InternalRow = _
        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && cur >= 0 && cur < splitEnd) {
            val head = ByteBuffer.wrap(bytesAt(cur, Wrec.HeadLen))
              .order(ByteOrder.LITTLE_ENDIAN)
            val hLen = head.getInt(4)
            val pLen = head.getLong(8)
            val total = Wrec.HeadLen.toLong + hLen + pLen
            if (cur + total > fileLen) {
              // truncated tail: the frame promises more than the file
              // has — skip it (and anything the sync finds after it)
              cur = nextFrame(cur + 1)
            } else {
              val hdr = new String(bytesAt(cur + Wrec.HeadLen, hLen),
                StandardCharsets.UTF_8)
              val parts = hdr.split("\t", -1)
              if (parts.length != 3) {
                cur = nextFrame(cur + 1) // malformed header: re-sync
              } else {
                val row = new Array[Any](fields.length)
                var slot = 0
                fields.foreach { f =>
                  row(slot) = f match {
                    case "rec_id" =>
                      // offset shares the low 40 bits with the file
                      // index's high bits — a >1 TB file would silently
                      // corrupt both halves
                      require(cur < (1L << 40),
                        s"wrec: record offset $cur >= 2^40 in $path — " +
                          "file too large for packed rec_ids")
                      (fIx << 40) | cur
                    case "url" => UTF8String.fromString(parts(0))
                    case "fetch_ts" =>
                      try parts(1).toLong catch { case _: Exception => 0L }
                    case "content_type" => UTF8String.fromString(parts(2))
                    case "content" =>
                      bytesAt(cur + Wrec.HeadLen + hLen, pLen.toInt)
                  }
                  slot += 1
                }
                nextRow = new GenericInternalRow(row)
                val after = cur + total
                // the next frame should start immediately; a mismatch
                // is mid-file corruption — re-sync, don't fail (and the
                // chained frame's lengths must pass the same sanity
                // check sync() applies, or a torn header crashes later)
                cur = if (frameIdx != null) idxNextAt(after)
                  else if (after + Wrec.HeadLen > fileLen) -1L
                  else if (byteAt(after) == 'G' && byteAt(after + 1) == 'W' &&
                    byteAt(after + 2) == 'R' && byteAt(after + 3) == '1' &&
                    frameSane(after)) after
                  else sync(after)
              }
            }
          }
          if (nextRow == null) closeOnce()
        }
        advance()
        def hasNext: Boolean = nextRow != null
        def next(): InternalRow = {
          val r = nextRow; advance(); r
        }
      }
    }
  }
}

object Wrec {
  private[sources] val HeadLen = 16
  private[sources] val MaxHeaderLen = 1 << 20
  /** Payloads materialize as one JVM byte array: int-indexed. */
  private[sources] val MaxPayloadLen = Int.MaxValue.toLong - 64L

  val schema: StructType = StructType(Seq(
    StructField("rec_id", LongType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("fetch_ts", LongType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Read a wrec file/directory/glob with layout-stable rec_ids.
    * `recursiveFileLookup` matches [[fileIndexes]]'s recursive walk, so
    * nested crawl layouts (`dump/shard/part-*.wrec`) resolve with the
    * same file set on both sides. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(classOf[WrecFileFormat].getName)
      .option("recursiveFileLookup", "true")
      .option("graft.wrec.path", path).load(path)

  /** Path-ordered file index for the rec_id high bits. Directories are
    * walked RECURSIVELY (Spark's file index descends into nested dirs,
    * so a one-level listing would leave nested files out of the map and
    * fail the reader's loud-absence check). */
  private[sources] def fileIndexes(spark: SparkSession,
      options: Map[String, String]): Map[String, Long] =
    fileIndexesFor(spark, options, "graft.wrec.path")

  /** [[fileIndexes]] parameterized on the option key — shared with the
    * WARC twin ([[Warc]]). */
  private[sources] def fileIndexesFor(spark: SparkSession,
      options: Map[String, String], key: String): Map[String, Long] =
    options.get(key) match {
      case None => Map.empty
      case Some(glob) =>
        val hconf = spark.sessionState.newHadoopConf()
        val p = new Path(glob)
        val fs = p.getFileSystem(hconf)
        val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
        def walk(s: FileStatus): Seq[FileStatus] =
          if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(walk)
          else Seq(s)
        matched.toSeq.flatMap(walk)
          .filter(_.isFile).map(_.getPath.toUri.getPath)
          .filterNot(pth => pth.split('/').last.startsWith("_") ||
            pth.split('/').last.startsWith("."))
          .sorted
          .zipWithIndex.map { case (pth, i) => pth -> i.toLong }.toMap
    }

  /** Hidden sidecar path of a wrec data file ("." prefix keeps it out
    * of Spark's listing and the rec_id file index). */
  private[sources] def idxPathOf(data: Path): Path =
    new Path(data.getParent, "." + data.getName + ".gwx")

  /** Frame-index sidecar: "GWX1" + int64 dataFileLen + int64 count +
    * count × int64 offsets (little-endian). Null when absent, malformed
    * or STALE — the recorded data-file length must match the file on
    * disk, or a file rewritten/extended out-of-band under an old
    * sidecar would silently serve only the old offsets (per-offset
    * validation catches torn records, not MISSING index entries). The
    * reader falls back to the scan path on null. */
  private[sources] def readFrameIndex(
      fs: org.apache.hadoop.fs.FileSystem, data: Path,
      dataLen: Long): Array[Long] = {
    val p = idxPathOf(data)
    try {
      if (!fs.exists(p)) return null
      val len = fs.getFileStatus(p).getLen
      if (len < 20 || (len - 20) % 8 != 0) return null
      val bytes = new Array[Byte](len.toInt)
      val s = fs.open(p)
      try s.readFully(0, bytes, 0, bytes.length) finally s.close()
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bb.getInt(0) != 0x31585747) return null // "GWX1" LE
      if (bb.getLong(4) != dataLen) return null // stale: file changed
      val n = bb.getLong(12)
      if (n < 0 || 20 + n * 8 != len) return null
      val out = new Array[Long](n.toInt)
      var i = 0
      while (i < n) { out(i) = bb.getLong(20 + i * 8); i += 1 }
      out
    } catch { case _: Exception => null }
  }

  /** Stable 23-bit index for direct loads that bypass [[read]] (no
    * planned file map): FNV-1a over the path, masked to keep
    * `hash << 40` positive. */
  private[sources] def pathHashIndex(path: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < path.length) {
      h ^= path.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    (h ^ (h >>> 23)) & 0x7fffffL
  }

  /** Write (url, fetch_ts, content_type, content) as wrec files under
    * `path` (one file per partition) — the test/bench writer twin of
    * the reader; real crawl dumps arrive pre-framed. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val hconf = new SerConf(spark.sessionState.newHadoopConf())
    df.select(org.apache.spark.sql.functions.col("url").cast("string"),
        org.apache.spark.sql.functions.col("fetch_ts").cast("long"),
        org.apache.spark.sql.functions.col("content_type").cast("string"),
        org.apache.spark.sql.functions.col("content").cast("binary"))
      .as[(String, Long, String, Array[Byte])]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val p = new Path(path, f"part-$pid%05d.wrec")
        val fs = p.getFileSystem(hconf.conf)
        val out = fs.create(p, true)
        var n = 0L
        var off = 0L
        val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.foreach { case (url, ts, ct, payload) =>
          // the header is tab-framed: a tab inside url/content_type
          // would make the reader's 3-field parse silently DROP the
          // record on read — fail the write loudly instead
          require(!url.contains('\t') && !ct.contains('\t'),
            s"wrec header fields must be tab-free (url=$url)")
          val hdr = s"$url\t$ts\t$ct".getBytes(StandardCharsets.UTF_8)
          val head = ByteBuffer.allocate(HeadLen).order(ByteOrder.LITTLE_ENDIAN)
          head.put("GWR1".getBytes(StandardCharsets.US_ASCII))
          head.putInt(hdr.length)
          head.putLong(payload.length.toLong)
          out.write(head.array())
          out.write(hdr)
          out.write(payload)
          offsets += off
          off += HeadLen + hdr.length + payload.length
          n += 1
        }
        out.close()
        // frame-index sidecar: split positioning by binary search and
        // payload-skip iteration on read (hidden file — invisible to
        // Spark's listing and the rec_id index; reader falls back to
        // the scan path when it is absent)
        val ib = ByteBuffer.allocate(20 + offsets.length * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        ib.put("GWX1".getBytes(StandardCharsets.US_ASCII))
        ib.putLong(off) // total data bytes written: the staleness bind
        ib.putLong(offsets.length.toLong)
        offsets.foreach(ib.putLong)
        val iOut = fs.create(idxPathOf(p), true)
        iOut.write(ib.array())
        iOut.close()
        Iterator.single(n)
      }
      // rdd fold, not Dataset.reduce: an empty input (zero partitions)
      // must write nothing, not throw
      .rdd.fold(0L)(_ + _): Unit
  }
}
