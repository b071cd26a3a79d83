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
  * files of BOTH layouts:
  *
  *  - plain `.warc`: a task opens its (start, end) byte range, scans
  *    forward to the first `CRLF CRLF WARC/1.` boundary at or after
  *    `start` (validated by PARSE: a `CRLF CRLF WARC/1.` byte run
  *    inside an archived payload fails its header parse and the scan
  *    resumes), and owns every record STARTING in the range (the
  *    Hadoop text-split contract; a record may read past `end`).
  *  - `.warc.gz`: the standard crawl layout (WARC/1.1 Annex C, what
  *    Common-Crawl-shaped archives use) gzips EACH RECORD as its own
  *    gzip member, so member boundaries are record boundaries. A task
  *    scans its compressed (start, end) range for the RFC 1952 member
  *    magic (`1f 8b 08`), validates a candidate by actually parsing
  *    the member (header with reserved-FLG check, raw-deflate
  *    inflation, a decompressed block that parses as WARC records,
  *    CRC32 + ISIZE trailer), and owns every member STARTING in the
  *    range. A false magic inside compressed data fails its parse and
  *    the scan reopens just past it. Legacy whole-file single-member
  *    archives still read (one member carrying every record);
  *    `record_offset` is the record's member start offset in the
  *    COMPRESSED file — the offset a crawl index stores.
  *
  * A 100 TB crawl therefore scans with record(-member) granularity in
  * both layouts and no driver-side record work.
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
    StructField("body", BinaryType, nullable = true),
    // revisit plumbing (WARC/1.1 §6.7.2, identical-payload-digest):
    // which record a revisit stands in for, and the payload digest
    // shared by the keeper and its revisits
    StructField("refers_to", StringType, nullable = true),
    StructField("payload_digest", StringType, nullable = true)))

  /** default intra-file split size (plain bytes / compressed bytes) */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** Per-record block-size ceiling (256 MiB) and header-line ceiling
    * (64 KiB): crawl archives are UNTRUSTED input, and a single record
    * declaring a multi-GB Content-Length (or streaming an endless
    * header line) would otherwise allocate executor memory it can take
    * the whole task JVM down with. A record past the ceiling raises a
    * NAMED error carrying both the length and the ceiling — loud and
    * attributable, never an opaque executor OOM. Real-web records sit
    * far below it (Common Crawl truncates payloads at 1 MiB). */
  val MaxRecordBytes: Long = 256L * 1024 * 1024
  private val MaxHeaderLineBytes: Int = 64 * 1024

  def read(spark: SparkSession, paths: Seq[String],
      splitBytes: Long = DefaultSplitBytes,
      maxRecordBytes: Long = MaxRecordBytes): DataFrame = {
    require(maxRecordBytes > 0,
      s"warc: maxRecordBytes must be positive, got $maxRecordBytes")
    require(maxRecordBytes <= Int.MaxValue,
      s"warc: maxRecordBytes $maxRecordBytes exceeds ${Int.MaxValue} — record " +
        "blocks are read into a single JVM byte array, so ceilings above " +
        "Int.MaxValue cannot be honored; shard oversized captures upstream")
    val files = FileCollection.expandGlobs(spark, paths)
      .filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz"))
    require(files.nonEmpty, s"no .warc/.warc.gz files match: ${paths.mkString(",")}")
    // (path, start, end, gzip) — one tuple per scan task
    val splits: Seq[(String, Long, Long, Boolean)] = files.flatMap { f =>
      val gz = f.endsWith(".gz")
      val size = graft.sources.io.ByteStore.size(f)
      if (size <= splitBytes) Seq((f, 0L, Long.MaxValue, gz))
      else (0L until size by splitBytes).map(s =>
        (f, s, math.min(s + splitBytes, size), gz))
    }
    val enc = RowEncoder.encoderFor(schema)
    import spark.implicits._
    spark.createDataset(splits)
      .repartition(math.max(1,
        math.min(splits.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        it.flatMap { case (path, start, end, gz) =>
          if (gz) new GzSplitReader(path, start, end, maxRecordBytes).rows()
          else new SplitReader(path, start, end, maxRecordBytes).rows()
        }
      }(enc).toDF()
  }

  /** Random-access record fetch — the CDX→WARC join. `index` carries
    * one row per wanted record: an archive path and the record's byte
    * offset (plain files: the record's start; `.warc.gz`: the record's
    * gzip-member start in the COMPRESSED file — exactly what
    * [[CdxSource.index]] stores). Each fetch is one ranged read: open,
    * seek to the offset, parse one record (gz: inflate the one member)
    * — the object-store ranged-GET model, so a 100 TB archive serves a
    * filtered fetch reading only the requested byte ranges. Requests
    * range-partition by (path, offset) and sort within tasks, so a
    * local run walks each file forward (page-cache friendly) and a big
    * file's fetches still spread across tasks. A wrong offset fails
    * loudly (the bytes there don't parse as a record start). Gz fetch
    * requires the Annex-C one-record-per-member layout ([[Writer]]'s
    * `gzip = true`, the standard crawl shape): a legacy whole-file
    * member gives every record the same member-0 offset, which can
    * only address the member's FIRST record. */
  def fetch(index: DataFrame, pathCol: String = "warc_file",
      offsetCol: String = "record_offset"): DataFrame = {
    val enc = RowEncoder.encoderFor(schema)
    import org.apache.spark.sql.functions.col
    index.select(col(pathCol).cast(StringType).as("p"),
        col(offsetCol).cast(LongType).as("o"))
      .repartitionByRange(col("p"), col("o"))
      .sortWithinPartitions("p", "o")
      .mapPartitions(_.map(r => fetchOne(r.getString(0), r.getLong(1))))(enc)
      .toDF()
  }

  private def fetchOne(path: String, offset: Long): Row = {
    val raw = graft.sources.io.ByteStore.openStream(path)
    try {
      var toSkip = offset
      while (toSkip > 0) {
        val n = raw.skip(toSkip)
        if (n <= 0) throw new EOFException(s"warc: cannot seek to $offset in $path")
        toSkip -= n
      }
      val buffered = new BufferedInputStream(raw, 64 * 1024)
      val in =
        if (path.endsWith(".gz"))
          new java.util.zip.GZIPInputStream(buffered, 64 * 1024)
        else buffered
      val p = new RecordParser(in, path).parseRecord(None).getOrElse(
        throw new EOFException(s"warc: no record at offset $offset of $path"))
      buildRow(path, offset, p)
    } finally raw.close()
  }

  // ---------------------------------------------------------- parsing

  private final case class Parsed(warcType: String, recordId: String,
      targetUri: Option[String], date: Option[java.time.LocalDateTime],
      contentType: Option[String], contentLength: Long, block: Array[Byte],
      refersTo: Option[String] = None, payloadDigest: Option[String] = None)

  /** Streaming WARC record machinery over one opened byte stream:
    * boundary scan, record parse (version line + headers +
    * Content-Length block + CRLFCRLF trailer), and the one-byte
    * pushback the trailer read needs. Counts LOGICALLY consumed bytes
    * (net of pushback) so callers can compute record offsets. One
    * instance per (re)opened stream; shared by the plain-split reader
    * (over the file stream) and the gz reader (over each member's
    * decompressed stream). */
  private final class RecordParser(in: InputStream, path: String,
      maxRecordBytes: Long = MaxRecordBytes) {
    private var pending: Int = -1 // one-byte pushback
    private var nConsumed: Long = 0L

    /** bytes logically consumed so far (pushback not yet re-read
      * excluded) */
    def consumed: Long = nConsumed

    private def read(): Int = {
      if (pending >= 0) { val p = pending; pending = -1; nConsumed += 1; return p }
      val b = in.read()
      if (b >= 0) nConsumed += 1
      b
    }

    private def pushback(b: Int): Unit = { pending = b; nConsumed -= 1 }

    /** scan for `\r\n\r\nWARC/1.` from the current position, leaving
      * the stream just past the magic; the record's version line is
      * then `"WARC/1." + rest-of-line`. A hit that fails its record
      * parse makes the caller resume via a reopen-past-the-magic. */
    def scanToBoundary(): Option[String] = {
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

    /** one record; `versionPrefix` carries the part of the version line
      * the boundary scan already consumed (None = full line expected);
      * None result = clean end of stream before a record started */
    def parseRecord(versionPrefix: Option[String]): Option[Parsed] = {
      var first = readLine().getOrElse(return None)
      val prefix = versionPrefix.getOrElse("")
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
      require(len >= 0 && len <= maxRecordBytes,
        s"warc: record block of $len bytes exceeds the $maxRecordBytes-byte " +
          s"ceiling in $path — untrusted-input allocation guard " +
          "(WarcSource.MaxRecordBytes)")
      val block = readFully(len.toInt)
      // trailing CRLF CRLF; the byte after it (next record's 'W') pushes back
      var trail = 0
      var b = read()
      while (b >= 0 && (b == '\r' || b == '\n') && trail < 4) { trail += 1; b = read() }
      if (b >= 0 && trail < 4)
        throw new IllegalArgumentException(s"warc: bad record trailer in $path")
      if (b >= 0) pushback(b)
      Some(Parsed(
        headers.getOrElse("warc-type", "unknown"),
        headers.getOrElse("warc-record-id", null),
        headers.get("warc-target-uri"),
        headers.get("warc-date").flatMap(parseDate),
        headers.get("content-type"),
        len, block,
        headers.get("warc-refers-to"),
        headers.get("warc-payload-digest")))
    }

    private def readLine(): Option[String] = {
      val buf = new java.io.ByteArrayOutputStream(128)
      var b = read()
      if (b < 0) return None
      var prev = -1
      while (b >= 0 && b != '\n') {
        if (buf.size >= MaxHeaderLineBytes) throw new IllegalArgumentException(
          s"warc: header line exceeds $MaxHeaderLineBytes bytes in $path — " +
            "untrusted-input allocation guard")
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
        if (pending >= 0) { buf(off) = pending.toByte; pending = -1; nConsumed += 1; off += 1 }
        else {
          val r = in.read(buf, off, n - off)
          if (r < 0) throw new EOFException(
            s"warc: EOF inside block ($off of $n) in $path")
          nConsumed += r
          off += r
        }
      }
      buf
    }
  }

  /** One plain-`.warc` scan task: parses every record starting in
    * [start, end) of `path`, STREAMED — a record decodes only when the
    * consumer pulls it (a 128 MB split of HTML bodies must not sit in
    * task heap as a materialized buffer). The stream closes on
    * exhaustion and on task completion (a `limit` that stops early
    * must not leak the handle). */
  private final class SplitReader(path: String, start: Long, end: Long,
      maxRecordBytes: Long = MaxRecordBytes)
      extends Iterator[Row] {

    private var readFrom: Long = 0L
    private var in: InputStream = _
    private var parser: RecordParser = _
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
      var toSkip = from
      while (toSkip > 0) {
        val n = raw.skip(toSkip)
        if (n <= 0) throw new EOFException(
          s"warc: cannot seek to $from in $path")
        toSkip -= n
      }
      readFrom = from
      in = new BufferedInputStream(raw, 64 * 1024)
      parser = new RecordParser(in, path, maxRecordBytes)
    }

    // a record starting AT `start` is announced by a CRLFCRLF that ends
    // there — read from 4 bytes early so the boundary scan sees the full
    // magic for every record this split owns (earliest alignable start
    // is then exactly `start`; earlier records stay with the prior split)
    private def prime(): Unit = {
      primed = true
      open(if (start == 0) 0 else math.max(0L, start - 4))
      if (start != 0) parser.scanToBoundary() match {
        case Some(pfx) =>
          firstPrefix = Some(pfx)
          recordStart = readFrom + parser.consumed - pfx.length
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
        try Right(parser.parseRecord(firstPrefix))
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
          recordStart = readFrom + parser.consumed
        case Right(None) => finish()
        case Left(_) =>
          // false magic: the speculative parse may have CONSUMED real
          // records past it (a bogus Content-Length reads arbitrarily
          // far), so rescanning from the current position would drop
          // them — REOPEN just past the false boundary instead. From
          // `recordStart - 3` the same 11-byte magic cannot re-match
          // (its first byte is out of window), so the scan strictly
          // advances.
          open(math.max(0L, recordStart - 3))
          parser.scanToBoundary() match {
            case Some(pfx) =>
              firstPrefix = Some(pfx)
              recordStart = readFrom + parser.consumed - pfx.length
            case None => finish()
          }
      }
    }
  }

  // ----------------------------------------------------- gz members

  /** One `.warc.gz` scan task: owns every gzip MEMBER whose compressed
    * start offset falls in [start, end). Candidates come from a raw
    * scan for the `1f 8b 08` member magic and are validated by fully
    * parsing the member — RFC 1952 header (reserved FLG bits reject),
    * raw-deflate inflation, decompressed bytes that parse as WARC
    * records, and a CRC32 + ISIZE trailer check at member end. A false
    * magic inside compressed data fails one of those and the scan
    * REOPENS just past it (the 3-byte magic cannot self-overlap, so
    * `candidate + 3` cannot skip a real member). Validation is per
    * member: once a member's first record parses, later failures in
    * the SAME member are archive corruption and stay loud. Records
    * stream lazily member-by-member; decompressed member bytes never
    * materialize beyond the record block the parser is on. */
  private final class GzSplitReader(path: String, start: Long, end: Long,
      maxRecordBytes: Long = MaxRecordBytes)
      extends Iterator[Row] {

    private var raw: InputStream = _
    private var rawAbs: Long = 0L       // absolute offset of next raw byte
    private var pushBuf: Array[Byte] = _ // inflater over-read, re-served first
    private var pushPos: Int = 0
    private var closed = false
    private var primed = false
    private var done = false
    private var nextRow: Row = _

    // current member state (null between members)
    private var member: MemberStream = _
    private var memberStart: Long = -1L
    private var memberParser: RecordParser = _
    private var memberValidated = false

    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => close()))

    def rows(): Iterator[Row] = this

    private def open(from: Long): Unit = {
      if (raw != null) raw.close()
      if (member != null) { member.dispose(); member = null; memberParser = null }
      val s = graft.sources.io.ByteStore.openStream(path)
      var toSkip = from
      while (toSkip > 0) {
        val n = s.skip(toSkip)
        if (n <= 0) throw new EOFException(s"warc.gz: cannot seek to $from in $path")
        toSkip -= n
      }
      raw = new BufferedInputStream(s, 64 * 1024)
      rawAbs = from
      pushBuf = null
    }

    private def close(): Unit =
      if (!closed) {
        closed = true
        if (member != null) member.dispose()
        if (raw != null) raw.close()
      }

    private def finish(): Unit = { done = true; close() }

    // raw access for the scanner and the member inflater; the pushback
    // buffer re-serves bytes the inflater pulled past its member's end
    private def rawRead(): Int = {
      if (pushBuf != null) {
        val b = pushBuf(pushPos) & 0xff
        pushPos += 1
        if (pushPos == pushBuf.length) pushBuf = null
        rawAbs += 1
        return b
      }
      val b = raw.read()
      if (b >= 0) rawAbs += 1
      b
    }

    private def rawReadBulk(b: Array[Byte], off: Int, len: Int): Int = {
      if (pushBuf != null) {
        val n = math.min(len, pushBuf.length - pushPos)
        System.arraycopy(pushBuf, pushPos, b, off, n)
        pushPos += n
        if (pushPos == pushBuf.length) pushBuf = null
        rawAbs += n
        return n
      }
      val n = raw.read(b, off, len)
      if (n > 0) rawAbs += n
      n
    }

    private def rawPushback(b: Array[Byte], off: Int, len: Int): Unit = {
      // prepend: a small member can end inside a chunk that itself was
      // re-served from an earlier, larger pushback
      if (pushBuf == null) pushBuf = java.util.Arrays.copyOfRange(b, off, off + len)
      else {
        val rest = pushBuf.length - pushPos
        val merged = new Array[Byte](len + rest)
        System.arraycopy(b, off, merged, 0, len)
        System.arraycopy(pushBuf, pushPos, merged, len, rest)
        pushBuf = merged
      }
      pushPos = 0
      rawAbs -= len
    }

    override def hasNext: Boolean = {
      if (!primed) { primed = true; open(math.max(0L, start)) }
      while (!done && nextRow == null) advance()
      nextRow != null
    }

    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException(s"warc.gz: exhausted $path")
      val r = nextRow
      nextRow = null
      r
    }

    private def advance(): Unit =
      if (member == null) scanForMember()
      else {
        val attempt =
          try Right(memberParser.parseRecord(None))
          catch {
            case e @ (_: IllegalArgumentException | _: EOFException |
                      _: NumberFormatException | _: java.util.zip.ZipException)
                if !memberValidated => Left(e)
          }
        attempt match {
          case Right(Some(p)) =>
            memberValidated = true
            nextRow = buildRow(path, memberStart, p)
          case Right(None) =>
            // member decompressed stream exhausted cleanly; its trailer
            // verified inside MemberStream before EOF was reported
            val endAbs = member.endAbs
            member.dispose(); member = null; memberParser = null
            if (endAbs >= end) finish() // next member starts in a peer split
          case Left(_) => falseCandidate()
        }
      }

    /** scan raw bytes for the next `1f 8b 08` at or after the current
      * position; stops (peer split's work) once a candidate would
      * start at or past `end` */
    private def scanForMember(): Unit = {
      var b1 = -1; var b2 = -1
      var b = rawRead()
      while (b >= 0) {
        if (b1 == 0x1f && b2 == 0x8b && b == 0x08) {
          val c = rawAbs - 3
          if (c >= end) { finish(); return }
          memberStart = c
          memberValidated = false
          try {
            member = new MemberStream()
            memberParser = new RecordParser(member, path, maxRecordBytes)
          } catch {
            case _: EOFException | _: java.util.zip.ZipException =>
              falseCandidate()
          }
          return
        }
        b1 = b2; b2 = b
        b = rawRead()
      }
      finish() // EOF with no further member
    }

    /** a candidate that failed validation: reopen just past its magic
      * and resume the scan (no real member start can hide inside the
      * non-self-overlapping 3-byte magic) */
    private def falseCandidate(): Unit = {
      val resume = memberStart + 3
      if (member != null) { member.dispose(); member = null; memberParser = null }
      open(resume)
    }

    /** Decompressed byte stream of ONE gzip member: parses the RFC
      * 1952 header eagerly (throws on malformed fields / reserved FLG
      * bits), inflates raw-deflate lazily from the outer raw stream,
      * and on deflate-stream end verifies the CRC32 + ISIZE trailer,
      * pushes inflater over-read back to the outer reader, and records
      * the member's absolute compressed end offset. */
    private final class MemberStream extends InputStream {
      private val inflater = new java.util.zip.Inflater(true)
      private val crc = new java.util.zip.CRC32
      private val inBuf = new Array[Byte](16 * 1024)
      private var inLen = 0
      private var totalOut = 0L
      private var finished = false
      private var disposed = false
      private val one = new Array[Byte](1)

      /** absolute compressed offset just past this member; valid once
        * the stream has reported EOF */
      var endAbs: Long = -1L

      parseHeader()

      private def headByte(): Int = {
        val b = rawRead()
        if (b < 0) throw new EOFException(s"warc.gz: EOF in member header of $path")
        b
      }

      private def parseHeader(): Unit = {
        // magic (1f 8b) + CM (08) already consumed by the scanner
        val flg = headByte()
        if ((flg & 0xe0) != 0) // reserved bits must be zero (RFC 1952 §2.3.1)
          throw new java.util.zip.ZipException(s"warc.gz: reserved FLG bits in $path")
        var i = 0
        while (i < 6) { headByte(); i += 1 } // MTIME(4) XFL OS
        if ((flg & 0x04) != 0) { // FEXTRA
          val xlen = headByte() | (headByte() << 8)
          var j = 0
          while (j < xlen) { headByte(); j += 1 }
        }
        if ((flg & 0x08) != 0) while (headByte() != 0) () // FNAME
        if ((flg & 0x10) != 0) while (headByte() != 0) () // FCOMMENT
        if ((flg & 0x02) != 0) { headByte(); headByte() } // FHCRC
      }

      override def read(): Int = {
        val n = read(one, 0, 1)
        if (n < 0) -1 else one(0) & 0xff
      }

      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (finished) return -1
        if (len == 0) return 0
        var n = inflateOnce(b, off, len)
        while (n == 0 && !inflater.finished()) {
          if (inflater.needsInput()) {
            inLen = rawReadBulk(inBuf, 0, inBuf.length)
            if (inLen <= 0)
              throw new EOFException(s"warc.gz: EOF inside member deflate of $path")
            inflater.setInput(inBuf, 0, inLen)
          }
          n = inflateOnce(b, off, len)
        }
        if (n > 0) { crc.update(b, off, n); totalOut += n }
        if (inflater.finished()) finishMember()
        if (n == 0 && finished) -1 else n
      }

      private def inflateOnce(b: Array[Byte], off: Int, len: Int): Int =
        try inflater.inflate(b, off, len)
        catch {
          case e: java.util.zip.DataFormatException =>
            throw new java.util.zip.ZipException(
              s"warc.gz: bad deflate data in $path: ${e.getMessage}")
        }

      private def finishMember(): Unit = {
        finished = true
        val rem = inflater.getRemaining
        if (rem > 0) rawPushback(inBuf, inLen - rem, rem)
        // 8-byte trailer: CRC32 + ISIZE, both little-endian
        val tr = new Array[Byte](8)
        var off = 0
        while (off < 8) {
          val r = rawReadBulk(tr, off, 8 - off)
          if (r <= 0) throw new EOFException(s"warc.gz: EOF in member trailer of $path")
          off += r
        }
        def le32(o: Int): Long =
          ((tr(o) & 0xffL)) | ((tr(o + 1) & 0xffL) << 8) |
            ((tr(o + 2) & 0xffL) << 16) | ((tr(o + 3) & 0xffL) << 24)
        if (le32(0) != crc.getValue)
          throw new java.util.zip.ZipException(s"warc.gz: member CRC mismatch in $path")
        if (le32(4) != (totalOut & 0xffffffffL))
          throw new java.util.zip.ZipException(s"warc.gz: member ISIZE mismatch in $path")
        endAbs = rawAbs
        dispose()
      }

      def dispose(): Unit =
        if (!disposed) { disposed = true; inflater.end() }
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
      status, httpCt, body, p.refersTo.orNull, p.payloadDigest.orNull)
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
    * row — `HTTP/1.1 200 OK` + the UTF-8 payload. `gzip = true`
    * writes the standard crawl layout: ONE GZIP MEMBER PER RECORD
    * (WARC/1.1 Annex C), which is what makes the compressed archive
    * record-splittable on read. WARC-Date is a fixed literal
    * (deterministic fixtures; a crawl writer would stamp the fetch
    * time). `recordType = "conversion"` writes the WET shape instead —
    * extracted-text records whose block IS the UTF-8 payload
    * (`Content-Type: text/plain`, no HTTP message), the standard
    * extraction-egress companion of a response archive — and
    * `recordType = "metadata"` the WAT shape: per-page metadata
    * records whose block is the payload column's JSON
    * (`Content-Type: application/json`). @return rows written. */
  object Writer {
    val FixedDate = "2026-01-01T00:00:00Z"

    def write(df: DataFrame, dir: String, uriCol: String, payloadCol: String,
        files: Int = 2, gzip: Boolean = false,
        httpContentType: String = "text/html; charset=utf-8",
        recordType: String = "response"): Long = {
      require(Set("response", "conversion", "metadata")(recordType),
        s"warc writer records response|conversion|metadata, got $recordType")
      writeParts(df.select(uriCol, payloadCol), dir, files, gzip) { (r, emit) =>
        val uri = r.getString(0)
        val payload = r.getString(1).getBytes(UTF_8)
        if (recordType == "conversion" || recordType == "metadata")
          emit(Seq(
            "WARC-Type" -> recordType,
            "WARC-Date" -> FixedDate,
            "WARC-Record-ID" -> s"<urn:graft:$recordType:$uri>",
            "WARC-Target-URI" -> uri,
            "Content-Type" -> (if (recordType == "metadata")
              "application/json" else "text/plain")), payload)
        else
          emit(Seq(
            "WARC-Type" -> "response",
            "WARC-Date" -> FixedDate,
            "WARC-Record-ID" -> s"<urn:graft:response:$uri>",
            "WARC-Target-URI" -> uri,
            "Content-Type" -> "application/http; msgtype=response"),
            httpBlock(payload, httpContentType))
      }
    }

    private def httpBlock(payload: Array[Byte], contentType: String): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8) ++ payload

    /** The shared distributed-writer scaffold: one staged
      * `part-NNNNN.warc[.gz]` per partition, a leading warcinfo
      * record, the per-record gzip-member emit closure (each record
      * its own finished member over a close-shielded stream), and the
      * row count. `emitRow` writes ONE input row's record(s) through
      * the provided emit — the only part the writer flavors differ
      * in. */
    private def writeParts(prepped: DataFrame, dir: String, files: Int,
        gzip: Boolean)(
        emitRow: (Row, (Seq[(String, String)], Array[Byte]) => Unit) => Unit): Long = {
      graft.sources.io.ByteStore.createDirectories(dir)
      val rows = prepped.sparkSession.sparkContext.longAccumulator("warc_rows")
      prepped.repartition(files).foreachPartition { (it: Iterator[Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val ext = if (gzip) ".warc.gz" else ".warc"
        val target = graft.sources.io.ByteStore.resolve(dir, f"part-$pid%05d$ext")
        val (local, publish) = graft.sources.io.ByteStore.stageOut(target)
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(local), 64 * 1024)
        def emit(headers: Seq[(String, String)], block: Array[Byte]): Unit =
          if (gzip) {
            val g = new java.util.zip.GZIPOutputStream(nonClosing(out), 8 * 1024)
            writeRecord(g, headers, block)
            g.close() // finishes the member + ends the deflater; `out` stays open
          } else writeRecord(out, headers, block)
        try {
          emit(Seq(
            "WARC-Type" -> "warcinfo",
            "WARC-Date" -> FixedDate,
            "WARC-Record-ID" -> s"<urn:graft:warcinfo:$pid>",
            "Content-Type" -> "application/warc-fields"),
            "software: graft\r\nformat: WARC file version 1.1\r\n".getBytes(UTF_8))
          it.foreach { r => emitRow(r, emit); rows.add(1) }
        } finally { out.close(); publish() }
      }
      rows.value
    }

    /** Payload-deduped archive egress (WARC/1.1 §6.7.2, the
      * `identical-payload-digest` revisit profile): ONE `response`
      * record per distinct payload (the keeper — the numerically
      * smallest URI, a deterministic choice) and a `revisit` record
      * for every other URI carrying that payload — empty block,
      * `WARC-Refers-To` the keeper's record id, `WARC-Payload-Digest`
      * shared with the keeper. A crawl whose pages repeat (mirrors,
      * boilerplate pages, re-fetches) stores each payload once; the
      * archive reconstructs losslessly by joining revisits back to
      * their keepers. One digest shuffle (the keeper window), then the
      * normal distributed write. @return rows written (keepers +
      * revisits). */
    def writeDeduped(df: DataFrame, dir: String, uriCol: String,
        payloadCol: String, files: Int = 2, gzip: Boolean = false,
        httpContentType: String = "text/html; charset=utf-8"): Long = {
      import org.apache.spark.sql.functions._
      val keeperW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__dig")).orderBy(length(col("__uri")), col("__uri"))
      val prepped = df
        .select(col(uriCol).cast("string").as("__uri"),
          col(payloadCol).cast("string").as("__pl"))
        .withColumn("__dig", md5(col("__pl").cast("binary")))
        .withColumn("__keeper", first(col("__uri")).over(keeperW))
      writeParts(prepped, dir, files, gzip) { (r, emit) =>
        val uri = r.getString(0)
        val dig = r.getString(2)
        val keeper = r.getString(3)
        if (uri == keeper)
          emit(Seq(
            "WARC-Type" -> "response",
            "WARC-Date" -> FixedDate,
            "WARC-Record-ID" -> s"<urn:graft:response:$uri>",
            "WARC-Target-URI" -> uri,
            "WARC-Payload-Digest" -> s"md5:$dig",
            "Content-Type" -> "application/http; msgtype=response"),
            httpBlock(r.getString(1).getBytes(UTF_8), httpContentType))
        else
          emit(Seq(
            "WARC-Type" -> "revisit",
            "WARC-Date" -> FixedDate,
            "WARC-Record-ID" -> s"<urn:graft:revisit:$uri>",
            "WARC-Target-URI" -> uri,
            "WARC-Refers-To" -> s"<urn:graft:response:$keeper>",
            "WARC-Payload-Digest" -> s"md5:$dig",
            "WARC-Profile" ->
              "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"),
            Array.emptyByteArray)
      }
    }

    private def nonClosing(target: java.io.OutputStream): java.io.OutputStream =
      new java.io.FilterOutputStream(target) {
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          target.write(b, off, len)
        override def close(): Unit = flush() // member end must not close the file
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
