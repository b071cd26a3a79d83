package graft.sources.bbf

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** `read_bbf` — Beacon's binary ingest container, re-expressed as a
  * graft-native single-file format with the same READER SEMANTICS as the
  * reference's bbf bridge (beacon-arrow-bbf/src/datafusion/opener.rs):
  *
  *  - one file holds many NAMED ENTRIES, each with its own schema and
  *    rows; the table schema is the supercast merge over entries and a
  *    column an entry lacks comes back as NULL (opener.rs batch-adapter
  *    contract: "columns missing from an entry come back as nulls");
  *  - a PRUNING INDEX stores per-container (min, max, null_count,
  *    row_count) column statistics, and a pushed predicate skips
  *    containers without reading their data, failing open on any
  *    uncertainty (opener.rs BBFPruningStatistics); here a container is
  *    one BLOCK (row-group) so pruning is finer than per-entry;
  *  - batches stream in bounded row slices (opener.rs
  *    split_record_batch) — a block is the slice unit;
  *  - entries can be LOGICALLY DELETED (footer flag, data untouched —
  *    the reference reader's entries_logical_deletes surface) and a
  *    column's declared dtype can be updated in place via footer
  *    rewrite ([[BbfTools]], the toolbox analog).
  *
  * The byte layout is graft-designed (the reference's beacon-binary-format
  * crate is external and not part of the tree):
  *
  * {{{
  *   "GBBF1\n"                                    // 6-byte magic
  *   column chunks …                              // per entry/block/column
  *   footer JSON (entries → schema, blocks → per-column chunk offsets
  *                + statistics)
  *   footerLength: int64 LE
  *   "GBBFT\n"                                    // 6-byte trailer magic
  * }}}
  *
  * A column chunk is a validity bitmap (LSB-first, 1 = non-null,
  * ceil(rows/8) bytes) followed by the values: fixed-width little-endian
  * for numeric/bool/timestamp/date (null slots written as zero), and
  * int32-length-prefixed UTF-8 for strings (null = length -1). Chunks
  * are DEFLATE-compressed when that shrinks them (footer `codec` field:
  * "deflate" | "raw" per chunk) — per-chunk codecs keep every chunk
  * independently seekable and decompressible on its own executor.
  */
object BbfStore {

  val HeaderMagic: Array[Byte] = "GBBF1\n".getBytes(StandardCharsets.US_ASCII)
  val TrailerMagic: Array[Byte] = "GBBFT\n".getBytes(StandardCharsets.US_ASCII)

  /** dtype tags are the on-disk vocabulary; keep them stable */
  val Dtypes = Set("int32", "int64", "float64", "bool", "string", "timestamp", "date")

  def sparkType(dtype: String): DataType = dtype match {
    case "int32"     => IntegerType
    case "int64"     => LongType
    case "float64"   => DoubleType
    case "bool"      => BooleanType
    case "string"    => StringType
    case "timestamp" => TimestampNTZType
    case "date"      => DateType
    case other => throw new IllegalArgumentException(s"bbf dtype '$other' unsupported")
  }

  def dtypeOf(t: DataType): String = t match {
    case ByteType | ShortType | IntegerType => "int32"
    case LongType                           => "int64"
    case FloatType | DoubleType             => "float64"
    case _: DecimalType                     => "float64"
    case BooleanType                        => "bool"
    case StringType                         => "string"
    case TimestampNTZType | TimestampType   => "timestamp"
    case DateType                           => "date"
    case other => throw new IllegalArgumentException(
      s"bbf cannot store column type $other (supported: ${Dtypes.mkString(",")})")
  }

  private def widthOf(dtype: String): Int = dtype match {
    case "int32" | "date"                  => 4
    case "int64" | "timestamp" | "float64" => 8
    case "bool"                            => 1
    case "string"                          => -1
    case other => throw new IllegalArgumentException(s"bbf dtype '$other' unsupported")
  }

  // ----------------------------------------------------------- metadata

  /** per-block per-column statistics; min/max over NON-NULL values only
    * (numeric family as doubles — timestamp micros / date days / bool
    * 0|1 — strings lexicographic); None when the block is all-null */
  final case class ColStats(
      numMin: Option[Double], numMax: Option[Double],
      strMin: Option[String], strMax: Option[String], nullCount: Long)
  /** codec: "raw" | "deflate"; rawLength = decompressed byte length */
  final case class ColChunk(offset: Long, length: Long, stats: ColStats,
      codec: String = "raw", rawLength: Long = -1L)
  final case class Block(rows: Int, columns: Map[String, ColChunk])
  final case class Entry(name: String, schema: Seq[(String, String)], rows: Long,
      blocks: Seq[Block], deleted: Boolean = false) {
    def sparkSchema: StructType =
      StructType(schema.map { case (n, dt) => StructField(n, sparkType(dt), nullable = true) })
  }
  final case class Footer(path: String, entries: Seq[Entry]) {
    def entry(name: String): Entry = entries.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"bbf entry '$name' not in $path (have ${entries.map(_.name).mkString(",")})"))
  }

  /** positional read that loops until `dst` is full (FileChannel.read
    * may return short counts) */
  private def readFully(ch: java.nio.channels.FileChannel, dst: ByteBuffer, at: Long): Unit = {
    var pos = at
    while (dst.hasRemaining) {
      val n = ch.read(dst, pos)
      require(n > 0, s"bbf read past end of file at offset $pos")
      pos += n
    }
  }

  def isBbf(path: String): Boolean = {
    import graft.sources.io.ByteStore
    if (!ByteStore.exists(path) || ByteStore.isDirectory(path) ||
      ByteStore.size(path) < 26) return false
    java.util.Arrays.equals(ByteStore.readRange(path, 0, 6), HeaderMagic)
  }

  /** observables for specs: footer parses / block column-chunk reads */
  val footerParses = new java.util.concurrent.atomic.AtomicLong(0)
  val chunkReads = new java.util.concurrent.atomic.AtomicLong(0)

  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Footer]()

  /** per-JVM footer cache keyed by (path, mtime) — executors touching N
    * blocks of one file parse its footer once (the Zarr/atlas stance) */
  def openCached(path0: String): Footer = {
    val key = graft.sources.io.ByteStore.toLocal(path0)
    val mtime = graft.sources.io.ByteStore.mtime(path0)
    if (footerCache.size > 64) footerCache.clear()
    footerCache.computeIfAbsent((key, mtime), _ => open(path0))
  }

  def open(path0: String): Footer = {
    footerParses.incrementAndGet()
    import graft.sources.io.ByteStore
    // positioned range reads only (head magic, 14-byte tail, footer):
    // a remote object store serves a footer parse in three GETs
    val p = Paths.get(ByteStore.toLocal(path0))
    val size = ByteStore.size(path0)
    require(size >= 26, s"not a bbf file (too small): $p")
    require(java.util.Arrays.equals(ByteStore.readRange(path0, 0, 6), HeaderMagic),
      s"not a bbf file (bad magic): $p")
    val tail = ByteBuffer.wrap(ByteStore.readRange(path0, size - 14, 14))
      .order(ByteOrder.LITTLE_ENDIAN)
    val footerLen = tail.getLong
    val trailer = new Array[Byte](6)
    tail.get(trailer)
    require(java.util.Arrays.equals(trailer, TrailerMagic), s"bbf trailer magic missing: $p")
    require(footerLen > 0 && footerLen <= size - 20, s"bbf footer length corrupt: $p")
    val fb = ByteStore.readRange(path0, size - 14 - footerLen, footerLen.toInt)
    Footer(p.toString, parseFooter(new String(fb, StandardCharsets.UTF_8), p))
  }

  private def parseFooter(json: String, p: Path): Seq[Entry] = {
    val root = JsonMethods.parse(json)
    (root \ "entries") match {
      case JObject(es) => es.map { case (name, e) =>
        val schema = (e \ "schema") match {
          case JArray(fs) => fs.map { f =>
            val JString(n) = (f \ "name"): @unchecked
            val JString(dt) = (f \ "dtype"): @unchecked
            require(Dtypes.contains(dt), s"bbf dtype '$dt' unsupported in $p")
            n -> dt
          }
          case _ => throw new IllegalArgumentException(s"bbf entry $name has no schema: $p")
        }
        val blocks = (e \ "blocks") match {
          case JArray(bs) => bs.map { b =>
            val rows = (b \ "rows") match {
              case JInt(n) => n.toInt
              case JLong(n) => n.toInt
              case _ => throw new IllegalArgumentException(s"bbf block of $name has no rows: $p")
            }
            val cols = (b \ "columns") match {
              case JObject(cs) => cs.map { case (cn, c) =>
                val codec = jstrOpt(c \ "codec").getOrElse("raw")
                require(codec == "raw" || codec == "deflate",
                  s"bbf chunk codec '$codec' unsupported in $p")
                cn -> ColChunk(jlong(c \ "offset"), jlong(c \ "length"), ColStats(
                  jdoubleOpt(c \ "min"), jdoubleOpt(c \ "max"),
                  jstrOpt(c \ "min"), jstrOpt(c \ "max"), jlong(c \ "null_count")),
                  codec, jlongOpt(c \ "raw_length").getOrElse(-1L))
              }.toMap
              case _ => Map.empty[String, ColChunk]
            }
            Block(rows, cols)
          }
          case _ => Nil
        }
        val deleted = (e \ "deleted") match { case JBool(b) => b; case _ => false }
        Entry(name, schema, blocks.map(_.rows.toLong).sum, blocks, deleted)
      }
      case _ => throw new IllegalArgumentException(s"bbf footer has no entries object: $p")
    }
  }

  private def jlong(v: JValue): Long = v match {
    case JInt(n) => n.toLong
    case JLong(n) => n
    case JDouble(x) => x.toLong
    case _ => 0L
  }
  private def jlongOpt(v: JValue): Option[Long] = v match {
    case JInt(n) => Some(n.toLong)
    case JLong(n) => Some(n)
    case _ => None
  }
  private def jdoubleOpt(v: JValue): Option[Double] = v match {
    case JDouble(x) => Some(x)
    case JInt(n) => Some(n.toDouble)
    case JLong(n) => Some(n.toDouble)
    case _ => None
  }
  private def jstrOpt(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }

  // ----------------------------------------------------------- chunk io

  /** decoded column block: exactly one of the typed arrays is non-null;
    * `valid(i)` gates every array */
  final case class ColData(valid: Array[Boolean],
      ints: Array[Int], longs: Array[Long], doubles: Array[Double],
      bools: Array[Boolean], strs: Array[String])

  /** read + decode one column chunk of one block */
  def readChunk(path: String, dtype: String, rows: Int, chunk: ColChunk): ColData = {
    chunkReads.incrementAndGet()
    // one positioned range read per column chunk (remote-capable)
    val stored = graft.sources.io.ByteStore.readRange(path, chunk.offset, chunk.length.toInt)
    val bytes = ByteBuffer.wrap(
      if (chunk.codec == "deflate") inflate(stored, chunk.rawLength.toInt) else stored)
      .order(ByteOrder.LITTLE_ENDIAN)
    val bitmapLen = (rows + 7) / 8
    val bitmap = new Array[Byte](bitmapLen)
    bytes.get(bitmap)
    val valid = Array.tabulate(rows)(i => (bitmap(i >> 3) & (1 << (i & 7))) != 0)
    var ints: Array[Int] = null; var longs: Array[Long] = null
    var doubles: Array[Double] = null; var bools: Array[Boolean] = null
    var strs: Array[String] = null
    dtype match {
      case "int32" | "date" =>
        ints = new Array[Int](rows)
        var i = 0; while (i < rows) { ints(i) = bytes.getInt; i += 1 }
      case "int64" | "timestamp" =>
        longs = new Array[Long](rows)
        var i = 0; while (i < rows) { longs(i) = bytes.getLong; i += 1 }
      case "float64" =>
        doubles = new Array[Double](rows)
        var i = 0; while (i < rows) { doubles(i) = bytes.getDouble; i += 1 }
      case "bool" =>
        bools = new Array[Boolean](rows)
        var i = 0; while (i < rows) { bools(i) = bytes.get() != 0; i += 1 }
      case "string" =>
        strs = new Array[String](rows)
        var i = 0
        while (i < rows) {
          val len = bytes.getInt
          if (len >= 0) {
            val b = new Array[Byte](len)
            bytes.get(b)
            strs(i) = new String(b, StandardCharsets.UTF_8)
          }
          i += 1
        }
      case other => throw new IllegalArgumentException(s"bbf dtype '$other' unsupported")
    }
    ColData(valid, ints, longs, doubles, bools, strs)
  }

  private def inflate(data: Array[Byte], rawLen: Int): Array[Byte] = {
    require(rawLen >= 0, "bbf deflate chunk missing raw_length")
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](rawLen)
    var off = 0
    while (off < rawLen && !inf.finished()) off += inf.inflate(out, off, rawLen - off)
    inf.end()
    require(off == rawLen, s"bbf deflate chunk truncated: got $off of $rawLen bytes")
    out
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 4))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** In-place footer rewrite (the reference toolbox's FooterUpdater,
    * beacon-binary-format-toolbox/src/update/update_schema.rs): the
    * data section is immutable; the footer is truncated and rewritten
    * with the transformed entry metadata. Logical entry deletes and
    * reinterpret-safe datatype updates go through here. */
  def rewriteFooter(path0: java.nio.file.Path, transform: Seq[Entry] => Seq[Entry]): Unit = {
    val footer = open(path0.toString)
    val size = Files.size(path0)
    val ch = java.nio.channels.FileChannel.open(path0,
      java.nio.file.StandardOpenOption.READ, java.nio.file.StandardOpenOption.WRITE)
    try {
      val tail = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
      readFully(ch, tail, size - 14)
      tail.flip()
      val footerLen = tail.getLong
      val footerStart = size - 14 - footerLen
      val newFooter = Writer.renderFooter(transform(footer.entries))
        .getBytes(StandardCharsets.UTF_8)
      ch.truncate(footerStart)
      ch.position(footerStart)
      val out = ByteBuffer.allocate(newFooter.length + 14).order(ByteOrder.LITTLE_ENDIAN)
      out.put(newFooter)
      out.putLong(newFooter.length.toLong)
      out.put(TrailerMagic)
      out.flip()
      while (out.hasRemaining) ch.write(out)
    } finally ch.close()
    footerCache.clear() // mtime granularity can hide same-ms rewrites
  }

  // -------------------------------------------------------------- write

  /** Fixture/egress writer (driver-side, single file — the COPY TO
    * single-file stance): each (name → DataFrame) becomes one entry;
    * rows stream via `toLocalIterator` in partition order and split into
    * `blockRows`-row blocks with per-block column statistics. */
  object Writer {

    /** String-target egress: stage locally, publish to any Hadoop
      * scheme (the remote COPY TO path) */
    def write(target: String, entries: Seq[(String, DataFrame)]): Long = {
      val (local, publish) = graft.sources.io.ByteStore.stageOut(target)
      val n = write(local, entries)
      publish()
      n
    }

    /** @return total rows written across entries (the COPY TO receipt) */
    def write(path: Path, entries: Seq[(String, DataFrame)], blockRows: Int = 65536): Long = {
      require(entries.nonEmpty, "bbf: at least one entry required")
      require(entries.map(_._1).distinct.size == entries.size, "bbf: duplicate entry names")
      require(blockRows > 0, "bbf: blockRows must be positive")
      Option(path.getParent).foreach(Files.createDirectories(_))
      val out = new java.io.DataOutputStream(
        new BufferedOutputStream(new FileOutputStream(path.toFile)))
      var offset = 0L
      def emit(b: Array[Byte]): Long = { val at = offset; out.write(b); offset += b.length; at }
      emit(HeaderMagic)
      val entryMetas = entries.map { case (name, df) =>
        val schema = df.schema.fields.map(f => f.name -> dtypeOf(f.dataType)).toSeq
        val types = df.schema.fields.map(_.dataType)
        val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
        val it = df.toLocalIterator()
        val buf = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](blockRows)
        def flush(): Unit = if (buf.nonEmpty) {
          val cols = schema.zipWithIndex.map { case ((cn, dt), ci) =>
            val (raw, stats) = encodeColumn(buf, ci, types(ci), dt)
            // per-chunk deflate, kept only when it actually shrinks
            val packed = deflate(raw)
            val (bytes, codec, rawLen) =
              if (packed.length < raw.length) (packed, "deflate", raw.length.toLong)
              else (raw, "raw", -1L)
            val at = emit(bytes)
            cn -> ColChunk(at, bytes.length.toLong, stats, codec, rawLen)
          }.toMap
          blocks += Block(buf.length, cols)
          buf.clear()
        }
        while (it.hasNext) {
          buf += it.next()
          if (buf.length == blockRows) flush()
        }
        flush()
        Entry(name, schema, blocks.map(_.rows.toLong).sum, blocks.toSeq)
      }
      val footer = renderFooter(entryMetas).getBytes(StandardCharsets.UTF_8)
      emit(footer)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putLong(footer.length.toLong)
      out.write(tail.array())
      out.write(TrailerMagic)
      out.close()
      entryMetas.map(_.rows).sum
    }

    private def encodeColumn(rows: scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row],
        ci: Int, t: DataType, dtype: String): (Array[Byte], ColStats) = {
      val n = rows.length
      val bitmap = new Array[Byte]((n + 7) / 8)
      var nulls = 0L
      var numMin = Double.NaN; var numMax = Double.NaN
      var strMin: String = null; var strMax: String = null
      def seen(x: Double): Unit = {
        if (numMin.isNaN || x < numMin) numMin = x
        if (numMax.isNaN || x > numMax) numMax = x
      }
      val body = new java.io.ByteArrayOutputStream()
      val w = widthOf(dtype)
      val scratch = ByteBuffer.allocate(if (w > 0) w else 8).order(ByteOrder.LITTLE_ENDIAN)
      def put(): Unit = { body.write(scratch.array(), 0, scratch.position()); scratch.clear() }
      var i = 0
      while (i < n) {
        val row = rows(i)
        if (row.isNullAt(ci)) {
          nulls += 1
          dtype match {
            case "int32" | "date" => scratch.putInt(0); put()
            case "int64" | "timestamp" => scratch.putLong(0L); put()
            case "float64" => scratch.putDouble(0d); put()
            case "bool" => scratch.put(0.toByte); put()
            case "string" => scratch.putInt(-1); put()
          }
        } else {
          bitmap(i >> 3) = (bitmap(i >> 3) | (1 << (i & 7))).toByte
          dtype match {
            case "int32" =>
              val v = t match {
                case ByteType => row.getByte(ci).toInt
                case ShortType => row.getShort(ci).toInt
                case _ => row.getInt(ci)
              }
              seen(v.toDouble); scratch.putInt(v); put()
            case "date" =>
              val v = row.get(ci) match {
                case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
                case d: java.time.LocalDate => d.toEpochDay.toInt
                case other => throw new IllegalArgumentException(s"bbf date cell: $other")
              }
              seen(v.toDouble); scratch.putInt(v); put()
            case "int64" =>
              val v = row.getLong(ci)
              seen(v.toDouble); scratch.putLong(v); put()
            case "timestamp" =>
              val v = row.get(ci) match {
                case ldt: java.time.LocalDateTime =>
                  ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
                case ts: java.sql.Timestamp =>
                  Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
                case ins: java.time.Instant =>
                  ins.getEpochSecond * 1000000L + ins.getNano / 1000L
                case other => throw new IllegalArgumentException(s"bbf timestamp cell: $other")
              }
              seen(v.toDouble); scratch.putLong(v); put()
            case "float64" =>
              val v = t match {
                case FloatType => row.getFloat(ci).toDouble
                case _: DecimalType => row.getDecimal(ci).doubleValue()
                case _ => row.getDouble(ci)
              }
              if (!v.isNaN) seen(v)
              scratch.putDouble(v); put()
            case "bool" =>
              val v = row.getBoolean(ci)
              seen(if (v) 1d else 0d); scratch.put((if (v) 1 else 0).toByte); put()
            case "string" =>
              val s = row.getString(ci)
              if (strMin == null || s.compareTo(strMin) < 0) strMin = s
              if (strMax == null || s.compareTo(strMax) > 0) strMax = s
              val b = s.getBytes(StandardCharsets.UTF_8)
              scratch.putInt(b.length); put(); body.write(b)
          }
        }
        i += 1
      }
      val full = new java.io.ByteArrayOutputStream()
      full.write(bitmap)
      body.writeTo(full)
      val stats = ColStats(
        if (numMin.isNaN) None else Some(numMin), if (numMax.isNaN) None else Some(numMax),
        Option(strMin), Option(strMax), nulls)
      (full.toByteArray, stats)
    }

    private[bbf] def renderFooter(entries: Seq[Entry]): String = {
      val json = JObject(
        "bbf_format_version" -> JInt(1),
        "entries" -> JObject(entries.toList.map { e =>
          e.name -> (JObject(List[(String, JValue)](
            "schema" -> JArray(e.schema.toList.map { case (n, dt) =>
              JObject("name" -> JString(n), "dtype" -> JString(dt)) }),
            "rows" -> JLong(e.rows)) ++
            (if (e.deleted) List("deleted" -> (JBool(true): JValue)) else Nil) ++ List(
            "blocks" -> JArray(e.blocks.toList.map { b =>
              JObject(
                "rows" -> JInt(b.rows),
                "columns" -> JObject(b.columns.toList.sortBy(_._1).map { case (cn, c) =>
                  val dt = e.schema.find(_._1 == cn).map(_._2)
                  val statFields: List[(String, JValue)] =
                    if (dt.contains("string"))
                      c.stats.strMin.map(s => "min" -> (JString(s): JValue)).toList ++
                        c.stats.strMax.map(s => "max" -> (JString(s): JValue)).toList
                    else
                      c.stats.numMin.map(x => "min" -> (JDouble(x): JValue)).toList ++
                        c.stats.numMax.map(x => "max" -> (JDouble(x): JValue)).toList
                  val codecFields: List[(String, JValue)] =
                    if (c.codec == "raw") Nil
                    else List("codec" -> JString(c.codec), "raw_length" -> JLong(c.rawLength))
                  cn -> JObject(List[(String, JValue)](
                    "offset" -> JLong(c.offset), "length" -> JLong(c.length),
                    "null_count" -> JLong(c.stats.nullCount)) ++ codecFields ++ statFields)
                }))
            }))): JValue)
        }))
      JsonMethods.compact(JsonMethods.render(json))
    }
  }
}
