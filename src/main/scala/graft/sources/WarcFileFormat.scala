package graft.sources

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

/** WARC/1.0 (ISO 28500) textual-header crawl source — the format real
  * crawl dumps actually arrive in (reference analog: the record-framed
  * decoders at /root/reference/src/bench/dataset.ts:65-151; [[Wrec]] is
  * the binary twin that proved the split-sync machinery this reader
  * reuses).
  *
  * Record grammar (all header text US-ASCII/UTF-8, lines CRLF-ended):
  * {{{
  *   WARC/1.0\r\n
  *   WARC-Type: response\r\n
  *   WARC-Target-URI: https://...\r\n
  *   WARC-Date: 2026-01-01T00:00:00Z\r\n
  *   Content-Type: text/html\r\n
  *   Content-Length: <n>\r\n
  *   \r\n
  *   <n payload bytes> \r\n\r\n
  * }}}
  *
  * Byte splits SYNC exactly like [[WrecFileFormat]]: scan forward for a
  * version line, validate the frame (headers terminate within bound,
  * Content-Length present and sane), and require the CHAIN look-ahead —
  * the frame must end at/past EOF or be followed by another sane frame
  * head — so a payload that embeds "WARC/1.0\r\n" (a WARC stored inside
  * a WARC, a quoted example in a crawled page) cannot be accepted as a
  * record off a split boundary. A record may extend past the split end
  * (the reader reads on); one starting past it belongs to the next
  * split. Truncated tails are skipped, mid-file corruption re-syncs —
  * crawl dumps are data, not errors (the codec stance).
  *
  * Leniency on read, strictness on write: [[Warc.write]] emits the
  * spec's exact two-CRLF trailer; the reader emits any record whose
  * headers parse and whose payload is fully present (a payload ending
  * at EOF without its trailer is a kept record, not a loss).
  *
  * `rec_id` is the [[Wrec]] scheme: `fileIndex << 40 | offset`, files
  * path-ordered at plan time via the `graft.warc.path` option (loud
  * failure on a partial map; stable path-hash fallback for direct
  * loads). Column pruning is honored — a metadata-only scan parses
  * headers and SKIPS payload bytes via positioned reads.
  *
  * MEMBER-GZIPPED dumps (`*.warc.gz` — the form crawl archives
  * actually ship: one gzip member per record, members concatenated)
  * are read by the same format: a `.gz` file splits on gzip member
  * boundaries instead of version lines. Sync = scan for the member
  * magic (1f 8b 08), inflate the candidate and accept it only when its
  * CRC32 + ISIZE trailer verifies — a payload embedding the magic
  * bytes cannot produce a phantom record, so no chain look-ahead is
  * needed. Each member's decompressed bytes are then parsed with the
  * record grammar above (leniently: a member may carry several
  * records). `rec_id` packs the member's COMPRESSED offset (+ record
  * ordinal within the member). One honest cost: gzip cannot seek, so a
  * metadata-only scan of a `.gz` dump still inflates payload bytes —
  * re-frame to plain WARC or [[Wrec]] for metadata-heavy workloads.
  */
class WarcFileFormat extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "warc"
  override def toString: String = "Warc"

  override def inferSchema(sparkSession: SparkSession,
      options: Map[String, String], files: Seq[FileStatus]): Option[StructType] =
    if (files.isEmpty) None else Some(Warc.schema)

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean = true

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String], dataSchema: StructType): OutputWriterFactory =
    throw new UnsupportedOperationException(
      "use graft.sources.Warc.write(df, path)")

  override protected def buildReader(sparkSession: SparkSession,
      dataSchema: StructType, partitionSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val serConf = new SerConf(hadoopConf)
    val fields = requiredSchema.fieldNames
    val fileIndex: Map[String, Long] =
      Wrec.fileIndexesFor(sparkSession, options, "graft.warc.path")

    (file: PartitionedFile) => {
      val path = file.toPath
      val fs = path.getFileSystem(serConf.conf)
      val fileLen = fs.getFileStatus(path).getLen
      val in = fs.open(path)
      val fIx = fileIndex.get(path.toUri.getPath) match {
        case Some(i) => i
        case None if fileIndex.nonEmpty =>
          throw new IllegalStateException(
            s"warc: scanned file ${path.toUri.getPath} is absent from the " +
              "graft.warc.path file index — pass a path/glob covering " +
              "every scanned file (Warc.read does this)")
        case None => Wrec.pathHashIndex(path.toUri.getPath)
      }
      val splitEnd = file.start + file.length

      // buffered forward reader (the WrecFileFormat shape)
      val bufSize = 1 << 16
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
        if (n <= bufSize && off >= bufStart && off + n <= bufStart + bufLen)
          System.arraycopy(buf, (off - bufStart).toInt, a, 0, n)
        else in.readFully(off, a, 0, n)
        a
      }

      /** "WARC/1.0\r\n" or "WARC/1.1\r\n" at `off`? */
      def versionAt(off: Long): Boolean =
        byteAt(off) == 'W' && byteAt(off + 1) == 'A' &&
          byteAt(off + 2) == 'R' && byteAt(off + 3) == 'C' &&
          byteAt(off + 4) == '/' && byteAt(off + 5) == '1' &&
          byteAt(off + 6) == '.' &&
          (byteAt(off + 7) == '0' || byteAt(off + 7) == '1') &&
          byteAt(off + 8) == '\r' && byteAt(off + 9) == '\n'

      /** First \r\n\r\n at/after `from`, bounded; -1 if none. */
      def headerEnd(from: Long, bound: Long): Long = {
        var off = from
        val lim = math.min(bound, fileLen - 3)
        while (off < lim) {
          if (byteAt(off) == '\r' && byteAt(off + 1) == '\n' &&
              byteAt(off + 2) == '\r' && byteAt(off + 3) == '\n')
            return off
          off += 1
        }
        -1L
      }

      /** Parsed frame at `off`: (headers text, payloadStart, payloadLen)
        * or null when the frame head is not sane. Sanity = version line,
        * header block terminates within MaxHeaderLen, Content-Length
        * present within the payload materialization bound. */
      def parseHead(off: Long): (String, Long, Long) = {
        if (!versionAt(off)) return null
        val he = headerEnd(off + 10, off + 10 + Warc.MaxHeaderLen)
        if (he < 0) return null
        val hdr = new String(bytesAt(off + 10, (he - off - 10).toInt),
          StandardCharsets.UTF_8)
        var pLen = -1L
        hdr.split("\r\n").foreach { line =>
          val c = line.indexOf(':')
          if (c > 0 && line.substring(0, c).trim
              .equalsIgnoreCase("Content-Length")) {
            try pLen = line.substring(c + 1).trim.toLong
            catch { case _: Exception => pLen = -1L }
          }
        }
        if (pLen < 0 || pLen > Warc.MaxPayloadLen) null
        else (hdr, he + 4, pLen)
      }

      /** Chain look-ahead (the [[WrecFileFormat]] rule): accept the
        * frame at `off` iff its record end is at/past EOF, too close to
        * EOF to verify, or followed by another sane frame head — after
        * skipping the spec's two-CRLF trailer. Leniency: up to 16 CRLF
        * pairs are skipped, because wild writers pad extra blank lines
        * between records and a strict two-pair rule would silently
        * reject EVERY record of such a file (crawl dumps are data, not
        * errors). Near-EOF unverifiability is accepted — a torn next
        * head must not lose the last complete record; the dual risk (a
        * payload-embedded fake header whose fake end lands within one
        * head of EOF on a split re-sync) is the same bounded tail
        * exposure the wrec twin documents. Returns the next frame
        * offset, -2 when the chain is broken, or -1 at EOF. */
      def chainNext(payloadEnd: Long): Long = {
        var nxt = payloadEnd
        var pairs = 0
        while (pairs < 16 && nxt + 1 < fileLen &&
            byteAt(nxt) == '\r' && byteAt(nxt + 1) == '\n') {
          nxt += 2; pairs += 1
        }
        if (nxt + 10 > fileLen) -1L // EOF (or torn next head): done
        else if (parseHead(nxt) != null) nxt
        else -2L
      }

      /** First offset >= from where a valid CHAINED frame starts. */
      def sync(from: Long): Long = {
        var off = from
        while (off + 10 <= fileLen) {
          if (versionAt(off)) {
            val head = parseHead(off)
            if (head != null) {
              val end = head._2 + head._3
              // truncated tail (payload past EOF) is skippable later;
              // otherwise require the chain
              if (end > fileLen || chainNext(end) != -2L) return off
            }
          }
          off += 1
        }
        -1L
      }

      def headerField(hdr: String, name: String): String =
        Warc.headerField(hdr, name)

      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))

      /** One fully-decoded record row. `rid` is the offset packed into
        * rec_id (frame offset for plain files; member offset + ordinal
        * for gz members). */
      def rowOf(hdr: String, payload: () => Array[Byte], rid: Long): InternalRow = {
        val row = new Array[Any](fields.length)
        var slot = 0
        fields.foreach { f =>
          row(slot) = f match {
            case "rec_id" =>
              require(rid < (1L << 40),
                s"warc: record offset $rid >= 2^40 in $path — " +
                  "file too large for packed rec_ids")
              (fIx << 40) | rid
            case "warc_type" =>
              UTF8String.fromString(headerField(hdr, "WARC-Type"))
            case "url" =>
              UTF8String.fromString(headerField(hdr, "WARC-Target-URI"))
            case "fetch_ts" =>
              try java.time.Instant
                .parse(headerField(hdr, "WARC-Date")).getEpochSecond
              catch { case _: Exception => 0L }
            case "content_type" =>
              UTF8String.fromString(headerField(hdr, "Content-Type"))
            case "content" => payload()
          }
          slot += 1
        }
        new GenericInternalRow(row)
      }

      if (path.getName.endsWith(".gz")) {
        // ---- member-gzipped path: split on gzip member boundaries ----

        def gzMagicAt(off: Long): Boolean =
          byteAt(off) == 0x1f && byteAt(off + 1) == 0x8b && byteAt(off + 2) == 8

        /** Inflate the gzip member at `off`: (decompressed, nextOff) or
          * null unless the full member is present and its CRC32 + ISIZE
          * trailer verifies (the gz sync rule — false positives on
          * payload bytes are ~2^-64). */
        def memberAt(off: Long): (Array[Byte], Long) = {
          if (!gzMagicAt(off)) return null
          val flg = byteAt(off + 3)
          if (flg < 0) return null
          var pos = off + 10
          if ((flg & 4) != 0) { // FEXTRA
            val x0 = byteAt(pos); val x1 = byteAt(pos + 1)
            if (x0 < 0 || x1 < 0) return null
            pos += 2 + (x0 | (x1 << 8))
          }
          var strings = (if ((flg & 8) != 0) 1 else 0) + // FNAME
            (if ((flg & 16) != 0) 1 else 0) // FCOMMENT
          while (strings > 0) {
            var b = byteAt(pos)
            while (b > 0) { pos += 1; b = byteAt(pos) }
            if (b < 0) return null
            pos += 1; strings -= 1
          }
          if ((flg & 2) != 0) pos += 2 // FHCRC
          val inf = new java.util.zip.Inflater(true)
          try {
            val outBuf = new java.io.ByteArrayOutputStream(16 * 1024)
            val outChunk = new Array[Byte](1 << 16)
            var inPos = pos
            while (!inf.finished()) {
              if (inf.needsInput()) {
                if (inPos >= fileLen) return null // torn member
                val n = math.min(1L << 16, fileLen - inPos).toInt
                inf.setInput(bytesAt(inPos, n), 0, n)
                inPos += n
              }
              val m = inf.inflate(outChunk)
              if (m > 0) {
                if (outBuf.size.toLong + m > Warc.MaxPayloadLen) return null
                outBuf.write(outChunk, 0, m)
              } else if (m == 0 && inf.needsDictionary()) return null
            }
            val trailerOff = pos + inf.getBytesRead
            if (trailerOff + 8 > fileLen) return null
            val bytes = outBuf.toByteArray
            def le32(o: Long): Long =
              (byteAt(o) | (byteAt(o + 1) << 8) | (byteAt(o + 2) << 16) |
                (byteAt(o + 3).toLong << 24)) & 0xffffffffL
            val crc = new java.util.zip.CRC32()
            crc.update(bytes)
            if (le32(trailerOff) != crc.getValue) return null
            if (le32(trailerOff + 4) != (bytes.length.toLong & 0xffffffffL))
              return null
            (bytes, trailerOff + 8)
          } catch {
            case _: java.util.zip.DataFormatException => null
            case _: java.io.EOFException => null
          } finally inf.end()
        }

        /** First offset >= from holding a complete CRC-valid member,
          * with its decode (sync pays the inflate; don't repeat it). */
        def gzSync(from: Long): (Long, (Array[Byte], Long)) = {
          var off = from
          while (off + 18 <= fileLen) { // min complete member size
            if (gzMagicAt(off)) {
              val m = memberAt(off)
              if (m != null) return (off, m)
            }
            off += 1
          }
          (-1L, null)
        }

        new Iterator[InternalRow] {
          private var cur = -1L
          private var pending: (Array[Byte], Long) = _
          locally {
            val s = gzSync(file.start)
            cur = s._1; pending = s._2
          }
          private var queue: List[InternalRow] = Nil
          private def advance(): Unit = {
            while (queue.isEmpty && cur >= 0 && cur < splitEnd) {
              val m = if (pending != null) pending else memberAt(cur)
              pending = null
              if (m == null) { // mid-file garbage: re-sync
                val s = gzSync(cur + 1)
                cur = s._1; pending = s._2
              } else {
                val (bytes, nxt) = m
                val recs = Warc.parseRecordsLenient(bytes)
                // rec_id = member offset + ordinal stays unique because
                // a member holding r records compresses to > r bytes
                require(recs.size < nxt - cur,
                  s"warc.gz: ${recs.size} records in a ${nxt - cur}-byte " +
                    s"member at $cur in $path — rec_ids would collide")
                queue = recs.zipWithIndex.map { case ((hdr, ps, pl), k) =>
                  rowOf(hdr, () => java.util.Arrays.copyOfRange(
                    bytes, ps, ps + pl), cur + k)
                }
                cur = nxt
              }
            }
            if (queue.isEmpty) closeOnce()
          }
          advance()
          def hasNext: Boolean = queue.nonEmpty
          def next(): InternalRow = {
            val r = queue.head; queue = queue.tail
            if (queue.isEmpty) advance()
            r
          }
        }
      } else new Iterator[InternalRow] {
        private var cur = sync(file.start)
        private var nextRow: InternalRow = _
        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && cur >= 0 && cur < splitEnd) {
            val head = parseHead(cur)
            if (head == null) { cur = sync(cur + 1) }
            else {
              val (hdr, pStart, pLen) = head
              if (pStart + pLen > fileLen) {
                // truncated tail: the payload promises more than the
                // file has — skip (crawl dumps end mid-record)
                cur = sync(cur + 1)
              } else {
                nextRow = rowOf(hdr, () => bytesAt(pStart, pLen.toInt), cur)
                cur = chainNext(pStart + pLen) match {
                  case -2L => sync(pStart + pLen + 1) // corruption: re-sync
                  case nxt => nxt
                }
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

object Warc {
  private[sources] val MaxHeaderLen = 1L << 20
  private[sources] val MaxPayloadLen = Int.MaxValue.toLong - 64L

  /** First value of a (case-insensitive) header line, "" if absent. */
  private[sources] def headerField(hdr: String, name: String): String = {
    var out = ""
    hdr.split("\r\n").foreach { line =>
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase(name)
          && out.isEmpty)
        out = line.substring(c + 1).trim
    }
    out
  }

  /** Parse every complete record in an in-memory (decompressed gzip
    * member) buffer: (headers, payloadStart, payloadLen) per record.
    * Same leniency as the streaming reader — re-sync past garbage,
    * skip ≤16 CRLF pairs between records, drop a truncated final
    * payload. No chain rule: the member's CRC already vouched for the
    * bytes, and a mid-member fake version line can only appear inside a
    * payload that Content-Length framing already steps over. */
  private[sources] def parseRecordsLenient(
      b: Array[Byte]): List[(String, Int, Int)] = {
    val out = List.newBuilder[(String, Int, Int)]
    val n = b.length
    def versionAt(o: Int): Boolean =
      o + 10 <= n && b(o) == 'W' && b(o + 1) == 'A' && b(o + 2) == 'R' &&
        b(o + 3) == 'C' && b(o + 4) == '/' && b(o + 5) == '1' &&
        b(o + 6) == '.' && (b(o + 7) == '0' || b(o + 7) == '1') &&
        b(o + 8) == '\r' && b(o + 9) == '\n'
    def headerEnd(from: Int, bound: Int): Int = {
      var o = from
      val lim = math.min(bound, n - 3)
      while (o < lim) {
        if (b(o) == '\r' && b(o + 1) == '\n' &&
            b(o + 2) == '\r' && b(o + 3) == '\n') return o
        o += 1
      }
      -1
    }
    var off = 0
    while (off + 10 <= n) {
      if (!versionAt(off)) off += 1
      else {
        val he = headerEnd(off + 10,
          math.min(n.toLong, off + 10 + MaxHeaderLen).toInt)
        if (he < 0) off += 1
        else {
          val hdr = new String(b, off + 10, he - off - 10,
            StandardCharsets.UTF_8)
          val pl =
            try headerField(hdr, "Content-Length").toLong
            catch { case _: Exception => -1L }
          if (pl < 0 || pl > MaxPayloadLen) off += 1
          else if (he + 4 + pl > n) off = n // truncated in-member tail
          else {
            out += ((hdr, he + 4, pl.toInt))
            var nxt = (he + 4 + pl).toInt
            var pairs = 0
            while (pairs < 16 && nxt + 1 < n &&
                b(nxt) == '\r' && b(nxt + 1) == '\n') {
              nxt += 2; pairs += 1
            }
            off = nxt
          }
        }
      }
    }
    out.result()
  }

  val schema: StructType = StructType(Seq(
    StructField("rec_id", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("fetch_ts", LongType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Read a WARC file/directory/glob with layout-stable rec_ids
    * (recursive lookup — crawl dumps nest `dump/segment/part.warc`). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(classOf[WarcFileFormat].getName)
      .option("recursiveFileLookup", "true")
      .option("graft.warc.path", path).load(path)

  /** Streaming crawl ingest: Structured Streaming's file source drives
    * the SAME splittable reader the batch path uses (plain and
    * member-gzipped files alike), so streaming and batch scans cannot
    * diverge; new dump files are picked up per trigger. rec_ids stay
    * stable iff files arrive in lexicographically increasing path order
    * (the part-file sink convention — the [[FvecsStream]] contract),
    * because the per-batch re-listing assigns file indexes in sorted
    * order. */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .format(classOf[WarcFileFormat].getName)
      .schema(schema)
      .option("recursiveFileLookup", "true")
      .option("graft.warc.path", dir)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(dir)

  /** Write (url, fetch_ts, content_type, content) as spec-form WARC/1.0
    * response records under `path` (one file per partition) — the
    * test/bench writer twin of the reader; real dumps arrive
    * pre-framed. Deterministic: WARC-Record-ID derives from
    * (url, fetch_ts), WARC-Date from fetch_ts. */
  def write(df: DataFrame, path: String): Unit = writeImpl(df, path, gz = false)

  /** The member-gzipped twin of [[write]]: each record becomes its own
    * gzip member (`part-*.warc.gz`, members concatenated) — the layout
    * real crawl archives use, because per-member framing is what makes
    * a compressed dump splittable at all. */
  def writeGz(df: DataFrame, path: String): Unit = writeImpl(df, path, gz = true)

  private def writeImpl(df: DataFrame, path: String, gz: Boolean): Unit = {
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
        val ext = if (gz) "warc.gz" else "warc"
        val p = new Path(path, f"part-$pid%05d.$ext")
        val fs = p.getFileSystem(hconf.conf)
        val out = fs.create(p, true)
        // gz members must not close the file between records; the
        // wrapper also forwards array writes (FilterOutputStream's
        // default degrades them to byte-at-a-time)
        val shield = new java.io.FilterOutputStream(out) {
          override def write(b: Array[Byte], o: Int, l: Int): Unit =
            out.write(b, o, l)
          override def close(): Unit = ()
        }
        var n = 0L
        it.foreach { case (url, ts, ct, payload) =>
          // header values are line-framed: an embedded CR/LF would
          // truncate the field and shift every following header
          require(!url.exists(c => c == '\r' || c == '\n') &&
            !ct.exists(c => c == '\r' || c == '\n'),
            s"warc header fields must be CRLF-free (url=$url)")
          val date = java.time.Instant.ofEpochSecond(ts).toString
          val rid = java.util.UUID.nameUUIDFromBytes(
            s"$url|$ts".getBytes(StandardCharsets.UTF_8))
          val hdr = ("WARC/1.0\r\n" +
            "WARC-Type: response\r\n" +
            s"WARC-Record-ID: <urn:uuid:$rid>\r\n" +
            s"WARC-Date: $date\r\n" +
            s"WARC-Target-URI: $url\r\n" +
            s"Content-Type: $ct\r\n" +
            s"Content-Length: ${payload.length}\r\n" +
            "\r\n").getBytes(StandardCharsets.UTF_8)
          val sink: java.io.OutputStream =
            if (gz) new java.util.zip.GZIPOutputStream(shield, 1 << 16)
            else shield
          sink.write(hdr)
          sink.write(payload)
          sink.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
          if (gz) sink.close() // finish the member; shield keeps `out` open
          n += 1
        }
        out.close()
        Iterator.single(n)
      }
      .rdd.fold(0L)(_ + _): Unit
  }
}
