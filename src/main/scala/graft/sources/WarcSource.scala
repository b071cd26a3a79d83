package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) reader + writer — the crawl-archive
  * front door of the curation pipeline (FineWeb / C4 / RefinedWeb all
  * start from WARC response records, not clean text; SURVEY §2.6).
  * The reference has no crawl reader — its formats are scientific —
  * so the surface here follows the public WARC/1.1 spec directly.
  *
  * Record framing: `WARC/1.x CRLF` + named header fields (one per
  * line, `Name: value`) + blank line + `Content-Length` bytes of
  * block + `CRLF CRLF`. `response`/`request` records whose
  * `Content-Type` is `application/http` additionally carry an HTTP
  * message in the block: status/request line + headers + blank line +
  * body — the reader surfaces the parsed status, the HTTP
  * content-type, and the BODY bytes (the HTML a curation pipeline
  * extracts from).
  *
  * Scale: partition = file, with RECORD-OFFSET SPLITS inside large
  * plain `.warc` files — a task opens its (start, end) byte range,
  * scans forward to the first `CRLF CRLF WARC/1.` boundary at or
  * after `start` (validated by PARSE: a `CRLF CRLF WARC/1.` byte run
  * inside an archived payload fails its header parse and the scan
  * resumes), and owns every record STARTING in the range (the Hadoop
  * text-split contract; a record may read past `end`). `.warc.gz`
  * files stream whole-file through GZIPInputStream (java.util.zip
  * reads the usual concatenated per-record gzip members natively);
  * without a member index they can't random-access, so each
  * compressed file is one split. A 100 TB crawl in the standard
  * ~1 GB-per-file layout therefore scans with file(×split)
  * granularity and no driver-side record work.
  */
object WarcSource {

  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("record_offset", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", TimestampNTZType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true)))

  /** default intra-file split size for plain .warc files */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  def read(spark: SparkSession, paths: Seq[String],
      splitBytes: Long = DefaultSplitBytes): DataFrame = {
    val files = FileCollection.expandGlobs(spark, paths)
      .filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz"))
    require(files.nonEmpty, s"no .warc/.warc.gz files match: ${paths.mkString(",")}")
    // (path, start, end, gzip) — one tuple per scan task
    val splits: Seq[(String, Long, Long, Boolean)] = files.flatMap { f =>
      if (f.endsWith(".gz")) Seq((f, 0L, Long.MaxValue, true))
      else {
        val size = graft.sources.io.ByteStore.size(f)
        if (size <= splitBytes) Seq((f, 0L, Long.MaxValue, false))
        else (0L until size by splitBytes).map(s =>
          (f, s, math.min(s + splitBytes, size), false))
      }
    }
    val enc = RowEncoder.encoderFor(schema)
    import spark.implicits._
    spark.createDataset(splits)
      .repartition(math.max(1,
        math.min(splits.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        it.flatMap { case (path, start, end, gz) =>
          new SplitReader(path, start, end, gz).rows()
        }
      }(enc).toDF()
  }

  // ---------------------------------------------------------- parsing

  private final case class Parsed(warcType: String, recordId: String,
      targetUri: Option[String], date: Option[java.time.LocalDateTime],
      contentType: Option[String], contentLength: Long, block: Array[Byte])

  /** One scan task: parses every record starting in [start, end) of
    * `path`, STREAMED — a record decodes only when the consumer pulls
    * it (a 128 MB split of HTML bodies must not sit in task heap as a
    * materialized buffer). The stream closes on exhaustion and on task
    * completion (a `limit` that stops early must not leak the handle).
    * Single-threaded per task; holds the one-byte pushback the
    * record-trailer read needs. */
  private final class SplitReader(path: String, start: Long, end: Long,
      gzip: Boolean) extends Iterator[Row] {

    private var readFrom: Long = 0L
    private var pos: Long = 0L     // bytes consumed past `readFrom`
    private var pending: Int = -1  // one-byte pushback
    private var in: InputStream = _
    private var closed = false

    // firstPrefix = the part of the version line the boundary scan
    // already consumed; Some(_) also marks "this alignment is not
    // yet parse-validated" for the rescan-on-false-magic path
    private var firstPrefix: Option[String] = None
    private var recordStart: Long = start
    private var primed = false
    private var done = false
    private var nextRow: Row = _

    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => close()))

    def rows(): Iterator[Row] = this

    /** (re)open the byte stream at absolute offset `from` */
    private def open(from: Long): Unit = {
      if (in != null) in.close()
      val raw = graft.sources.io.ByteStore.openStream(path)
      val base =
        if (gzip) new java.util.zip.GZIPInputStream(raw, 64 * 1024)
        else {
          var toSkip = from
          while (toSkip > 0) {
            val n = raw.skip(toSkip)
            if (n <= 0) throw new EOFException(
              s"warc: cannot seek to $from in $path")
            toSkip -= n
          }
          raw
        }
      readFrom = from
      pos = 0L
      pending = -1
      in = new BufferedInputStream(base, 64 * 1024)
    }

    // a record starting AT `start` is announced by a CRLFCRLF that ends
    // there — read from 4 bytes early so the boundary scan sees the full
    // magic for every record this split owns (earliest alignable start
    // is then exactly `start`; earlier records stay with the prior split)
    private def prime(): Unit = {
      primed = true
      open(if (gzip || start == 0) start else math.max(0L, start - 4))
      if (start != 0 && !gzip) scanToBoundary() match {
        case Some(pfx) =>
          firstPrefix = Some(pfx)
          recordStart = readFrom + consumedPos() - pfx.length
        case None => finish() // no record starts in this range
      }
    }

    private def finish(): Unit = { done = true; close() }

    private def close(): Unit =
      if (!closed) { closed = true; if (in != null) in.close() }

    override def hasNext: Boolean = {
      if (!primed) prime()
      while (!done && nextRow == null && recordStart < end) advance()
      if (!done && nextRow == null) finish() // next record is the peer split's
      nextRow != null
    }

    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException(s"warc: exhausted $path")
      val r = nextRow
      nextRow = null
      r
    }

    private def advance(): Unit = {
      val attempt =
        try Right(parseRecord(firstPrefix))
        catch {
          // a CRLFCRLF+WARC/1. byte run inside an archived payload:
          // not a record — resume the boundary scan
          case e @ (_: IllegalArgumentException | _: EOFException |
                    _: NumberFormatException)
              if firstPrefix.isDefined => Left(e)
        }
      attempt match {
        case Right(Some(p)) =>
          nextRow = buildRow(path, recordStart, p)
          firstPrefix = None
          recordStart = readFrom + consumedPos()
        case Right(None) => finish()
        case Left(_) =>
          // false magic: the speculative parse may have CONSUMED real
          // records past it (a bogus Content-Length reads arbitrarily
          // far), so rescanning from the current position would drop
          // them — REOPEN just past the false boundary instead. From
          // `recordStart - 3` the same 11-byte magic cannot re-match
          // (its first byte is out of window), so the scan strictly
          // advances; this path is !gzip by construction (only split
          // alignment speculates), so the seek is a plain skip.
          open(math.max(0L, recordStart - 3))
          scanToBoundary() match {
            case Some(pfx) =>
              firstPrefix = Some(pfx)
              recordStart = readFrom + consumedPos() - pfx.length
            case None => finish()
          }
      }
    }

    /** bytes consumed so far, net of the pushback byte */
    private def consumedPos(): Long = pos - (if (pending >= 0) 1 else 0)

    /** scan for `\r\n\r\nWARC/1.` from the current position, leaving
      * the stream just past the magic; the record's version line is
      * then `"WARC/1." + rest-of-line`. A hit that fails its record
      * parse makes the caller resume via [[parseRecord]]'s rescan. */
    private def scanToBoundary(): Option[String] = {
      // last-|magic| ring buffer, compared in full after each byte: a
      // prefix-restart matcher would need the KMP failure function here
      // (the magic self-overlaps via `\r\n\r\n\r\nWARC` runs — a block
      // ending in CRLF produces exactly that and a naive reset walks
      // PAST the real boundary, losing the record)
      val magic = "\r\n\r\nWARC/1.".getBytes(UTF_8)
      val m = magic.length
      val ring = new Array[Int](m)
      var n = 0
      var b = read()
      while (b >= 0) {
        ring(n % m) = b
        n += 1
        if (n >= m) {
          var i = 0
          while (i < m && ring((n - m + i) % m) == magic(i)) i += 1
          if (i == m) return Some("WARC/1.")
        }
        b = read()
      }
      None
    }

    private def read(): Int = {
      if (pending >= 0) { val p = pending; pending = -1; return p }
      val b = in.read()
      if (b >= 0) pos += 1
      b
    }

    /** one record; `versionPrefix` carries the part of the version line
      * the boundary scan already consumed (None = full line expected) */
    private def parseRecord(versionPrefix: Option[String]): Option[Parsed] = {
      var first = readLine().getOrElse(return None)
      var prefix = versionPrefix.getOrElse("")
      while (prefix.isEmpty && first.isEmpty) { // tolerate stray blank lines
        first = readLine().getOrElse(return None)
      }
      val version = prefix + first
      require(version.startsWith("WARC/1."),
        s"warc: bad version line '$version' in $path")
      val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var line = readLine().getOrElse(
        throw new EOFException(s"warc: EOF in record headers of $path"))
      while (line.nonEmpty) {
        val i = line.indexOf(':')
        require(i > 0, s"warc: bad header line '$line' in $path")
        headers += line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim
        line = readLine().getOrElse(
          throw new EOFException(s"warc: EOF in record headers of $path"))
      }
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException(
          s"warc: record without Content-Length in $path")).toLong
      require(len >= 0 && len <= Int.MaxValue.toLong,
        s"warc: unsupported block length $len in $path")
      val block = readFully(len.toInt)
      // trailing CRLF CRLF; the byte after it (next record's 'W') pushes back
      var trail = 0
      var b = read()
      while (b >= 0 && (b == '\r' || b == '\n') && trail < 4) { trail += 1; b = read() }
      if (b >= 0 && trail < 4)
        throw new IllegalArgumentException(s"warc: bad record trailer in $path")
      if (b >= 0) pending = b
      Some(Parsed(
        headers.getOrElse("warc-type", "unknown"),
        headers.getOrElse("warc-record-id", null),
        headers.get("warc-target-uri"),
        headers.get("warc-date").flatMap(parseDate),
        headers.get("content-type"),
        len, block))
    }

    private def readLine(): Option[String] = {
      val buf = new java.io.ByteArrayOutputStream(128)
      var b = read()
      if (b < 0) return None
      var prev = -1
      while (b >= 0 && b != '\n') {
        if (prev >= 0) buf.write(prev)
        prev = b
        b = read()
      }
      if (prev >= 0 && prev != '\r') buf.write(prev)
      Some(new String(buf.toByteArray, UTF_8))
    }

    private def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        if (pending >= 0) { buf(off) = pending.toByte; pending = -1; off += 1 }
        else {
          val r = in.read(buf, off, n - off)
          if (r < 0) throw new EOFException(
            s"warc: EOF inside block ($off of $n) in $path")
          pos += r
          off += r
        }
      }
      buf
    }
  }

  private def parseDate(s: String): Option[java.time.LocalDateTime] =
    try Some(java.time.OffsetDateTime.parse(s).toLocalDateTime)
    catch { case _: java.time.format.DateTimeParseException => None }

  private def buildRow(file: String, offset: Long, p: Parsed): Row = {
    val isHttp = p.contentType.exists(_.startsWith("application/http"))
    val (status, httpCt, body) =
      if (isHttp) parseHttp(p.block) else (null, null, p.block)
    Row(file, offset, p.warcType, p.recordId, p.targetUri.orNull,
      p.date.orNull, p.contentType.orNull, p.contentLength,
      status, httpCt, body)
  }

  /** HTTP message in a response/request block: split at the first
    * CRLFCRLF; status from the first line; content-type from headers */
  private def parseHttp(block: Array[Byte]): (Integer, String, Array[Byte]) = {
    val sep = indexOfCrlfCrlf(block)
    if (sep < 0) return (null, null, block)
    val head = new String(block, 0, sep, UTF_8)
    val body = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
    val lines = head.split("\r\n")
    val status: Integer = lines.headOption.flatMap { sl =>
      val parts = sl.split(" ")
      if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
        parts(1).toIntOption else None
    }.map(Integer.valueOf).orNull
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring("content-type:".length).trim
    }.orNull
    (status, ct, body)
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  // ---------------------------------------------------------- writer

  /** Distributed WARC writer for archive egress and gate fixtures:
    * each partition writes one `part-NNNNN.warc[.gz]` under `dir`,
    * leading with a `warcinfo` record, then one `response` record per
    * row — `HTTP/1.1 200 OK` + the UTF-8 payload. WARC-Date is a fixed
    * literal (deterministic fixtures; a crawl writer would stamp the
    * fetch time). @return rows written. */
  object Writer {
    val FixedDate = "2026-01-01T00:00:00Z"

    def write(df: DataFrame, dir: String, uriCol: String, payloadCol: String,
        files: Int = 2, gzip: Boolean = false,
        httpContentType: String = "text/html; charset=utf-8"): Long = {
      graft.sources.io.ByteStore.createDirectories(dir)
      val spark = df.sparkSession
      val rows = spark.sparkContext.longAccumulator("warc_rows")
      df.select(uriCol, payloadCol).repartition(files).foreachPartition {
        (it: Iterator[Row]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val ext = if (gzip) ".warc.gz" else ".warc"
          val target = graft.sources.io.ByteStore.resolve(dir, f"part-$pid%05d$ext")
          val (local, publish) = graft.sources.io.ByteStore.stageOut(target)
          val fileOut = java.nio.file.Files.newOutputStream(local)
          val out = new java.io.BufferedOutputStream(
            if (gzip) new java.util.zip.GZIPOutputStream(fileOut) else fileOut,
            64 * 1024)
          try {
            val info = "software: graft\r\nformat: WARC file version 1.1\r\n"
              .getBytes(UTF_8)
            writeRecord(out, Seq(
              "WARC-Type" -> "warcinfo",
              "WARC-Date" -> FixedDate,
              "WARC-Record-ID" -> s"<urn:graft:warcinfo:$pid>",
              "Content-Type" -> "application/warc-fields"), info)
            it.foreach { r =>
              val uri = r.getString(0)
              val payload = r.getString(1).getBytes(UTF_8)
              val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $httpContentType\r\n" +
                s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8)
              val block = http ++ payload
              writeRecord(out, Seq(
                "WARC-Type" -> "response",
                "WARC-Date" -> FixedDate,
                "WARC-Record-ID" -> s"<urn:graft:response:$uri>",
                "WARC-Target-URI" -> uri,
                "Content-Type" -> "application/http; msgtype=response"), block)
              rows.add(1)
            }
          } finally { out.close(); publish() }
      }
      rows.value
    }

    private def writeRecord(out: java.io.OutputStream,
        headers: Seq[(String, String)], block: Array[Byte]): Unit = {
      val head = new StringBuilder("WARC/1.1\r\n")
      headers.foreach { case (k, v) => head.append(k).append(": ").append(v).append("\r\n") }
      head.append("Content-Length: ").append(block.length).append("\r\n\r\n")
      out.write(head.toString.getBytes(UTF_8))
      out.write(block)
      out.write("\r\n\r\n".getBytes(UTF_8))
    }
  }
}
