package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EXIF metadata for the multimodal pipeline — REAL parsing of the
  * public format (JPEG marker segments per ITU-T T.81 §B; the Exif
  * APP1 payload is a TIFF 6.0 byte stream: `II`/`MM` byte order, magic
  * 42, IFD entry walk), pure JVM, no image decode involved.
  *
  * Why it matters at 100 TB: EXIF is the typed metadata half of an
  * image corpus — capture time for dedup/recency, orientation for
  * normalize-before-hash, camera make/model for stratification, GPS
  * for geo-filtering — and it reads from the first few KB of each
  * payload without decoding pixels. [[ExifParse]] is a map-only
  * codegen kernel; messy crawl data yields NULL fields, never a task
  * failure (the from_json PERMISSIVE stance — image bytes from a crawl
  * are untrusted input).
  *
  * [[buildKernel]] is the inverse: a minimal, byte-exact JPEG (SOI +
  * Exif APP1 + EOI) carrying Make/Model/DateTime/Orientation and a GPS
  * IFD with degree/minute/second rationals — the egress half, and the
  * fixture builder the gate replays (the WARC writer/reader stance;
  * the parser is additionally pinned in ExifSpec against hand-written
  * hex blobs, including big-endian `MM`, so it follows the spec rather
  * than merely inverting the builder).
  */
object Exif {

  // ----------------------------------------------------------- schema

  val schema: StructType = StructType(Seq(
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("datetime", StringType),
    StructField("orientation", IntegerType),
    StructField("gps_lat", DoubleType),
    StructField("gps_lon", DoubleType)))

  // ----------------------------------------------------------- writer

  /** minimal JPEG with one Exif APP1 segment (little-endian TIFF).
    * `sec100` is seconds×100 (the RATIONAL is sec100/100) so every
    * coordinate is exact in the fixture algebra. Make/model must be
    * ≥ 4 chars so their ASCII values route through the data area (a
    * ≤ 4-byte TIFF value is inline by spec — this builder keeps one
    * layout). */
  def buildKernel(make: UTF8String, model: UTF8String, datetime: UTF8String,
      orientation: Int, latRef: UTF8String, latDeg: Int, latMin: Int,
      latSec100: Int, lonRef: UTF8String, lonDeg: Int, lonMin: Int,
      lonSec100: Int): Array[Byte] = {
    val mk = make.toString.getBytes("ISO-8859-1")
    val md = model.toString.getBytes("ISO-8859-1")
    val dt = datetime.toString.getBytes("ISO-8859-1")
    require(dt.length == 19, s"exif datetime must be 19 chars, got ${dt.length}")
    require(mk.length >= 4 && md.length >= 4,
      "exif builder: make/model must be >= 4 chars (offset-stored ASCII)")
    val out = new java.io.ByteArrayOutputStream(256)
    def u16le(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    // ---- TIFF blob (offsets relative to the blob start) ----
    val ifd0End = 8 + 2 + 5 * 12 + 4
    val makeOff = ifd0End
    val modelOff = makeOff + mk.length + 1
    val dtOff = modelOff + md.length + 1
    val gpsIfdOff = dtOff + 20
    val gpsIfdEnd = gpsIfdOff + 2 + 4 * 12 + 4
    val latValOff = gpsIfdEnd
    val lonValOff = latValOff + 24
    out.write('I'); out.write('I'); u16le(42); u32le(8)
    u16le(5) // IFD0 entry count
    def entry(tag: Int, tpe: Int, count: Int)(value: => Unit): Unit = {
      u16le(tag); u16le(tpe); u32le(count)
      val before = out.size(); value
      require(out.size() - before == 4, "exif entry value must be 4 bytes")
    }
    entry(0x010f, 2, mk.length + 1) { u32le(makeOff) }
    entry(0x0110, 2, md.length + 1) { u32le(modelOff) }
    entry(0x0112, 3, 1) { u16le(orientation); u16le(0) } // SHORT, inline
    entry(0x0132, 2, 20) { u32le(dtOff) }
    entry(0x8825, 4, 1) { u32le(gpsIfdOff) }
    u32le(0) // no IFD1
    require(out.size() == makeOff, "exif layout drift at make")
    out.write(mk); out.write(0)
    out.write(md); out.write(0)
    out.write(dt); out.write(0)
    require(out.size() == gpsIfdOff, "exif layout drift at gps ifd")
    u16le(4)
    entry(1, 2, 2) { out.write(latRef.toString.charAt(0)); out.write(0); u16le(0) }
    entry(2, 5, 3) { u32le(latValOff) }
    entry(3, 2, 2) { out.write(lonRef.toString.charAt(0)); out.write(0); u16le(0) }
    entry(4, 5, 3) { u32le(lonValOff) }
    u32le(0)
    def rational3(deg: Int, min: Int, sec100: Int): Unit = {
      u32le(deg); u32le(1); u32le(min); u32le(1); u32le(sec100); u32le(100)
    }
    rational3(latDeg, latMin, latSec100)
    rational3(lonDeg, lonMin, lonSec100)
    val tiff = out.toByteArray
    // ---- JPEG wrapper: SOI + APP1("Exif\0\0" + tiff) + EOI ----
    val jpeg = new java.io.ByteArrayOutputStream(tiff.length + 16)
    jpeg.write(0xff); jpeg.write(0xd8)
    jpeg.write(0xff); jpeg.write(0xe1)
    val segLen = 2 + 6 + tiff.length
    require(segLen <= 0xffff,
      s"exif_jpeg: APP1 segment of $segLen bytes exceeds the 16-bit JPEG " +
        "length field — shorten the make/model strings")
    jpeg.write((segLen >> 8) & 0xff); jpeg.write(segLen & 0xff)
    jpeg.write("Exif".getBytes("ISO-8859-1")); jpeg.write(0); jpeg.write(0)
    jpeg.write(tiff)
    jpeg.write(0xff); jpeg.write(0xd9)
    jpeg.toByteArray
  }

  // ----------------------------------------------------------- parser

  private def nullRow: InternalRow =
    new GenericInternalRow(Array[Any](null, null, null, null, null, null))

  /** parse EXIF out of a JPEG byte payload; every field NULL when the
    * payload is not a JPEG, has no Exif APP1, or lacks the tag */
  def parseKernel(payload: Array[Byte]): InternalRow =
    try {
      val blob = exifBlob(payload)
      if (blob == null) nullRow else parseTiff(payload, blob._1, blob._2)
    } catch { case _: Exception => nullRow }

  /** locate the Exif APP1 TIFF blob: walk marker segments from SOI
    * toward SOS/EOI per T.81 (each non-standalone marker carries a
    * big-endian length that includes its own two bytes); returns
    * (absolute tiff start, tiff length) or null */
  private def exifBlob(b: Array[Byte]): (Int, Int) = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return null
      // T.81 §B.1.1.2: markers may be preceded by any number of 0xFF
      // fill bytes — consume the run so a padded-but-valid JPEG's
      // marker byte isn't misread as a length
      while (i + 4 <= b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 4 > b.length) return null
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return null // EOI / SOS
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > b.length) return null
        if (marker == 0xe1 && len >= 8 &&
            b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
            b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0)
          return (i + 10, len - 8)
        i += 2 + len
      }
    }
    null
  }

  /** TIFF IFD walk; all offsets below are RELATIVE to `base` (the TIFF
    * header), per the TIFF 6.0 offset convention */
  private def parseTiff(b: Array[Byte], base: Int, len: Int): InternalRow = {
    if (len < 8) return nullRow
    val le = (b(base) & 0xff) match {
      case 0x49 if (b(base + 1) & 0xff) == 0x49 => true
      case 0x4d if (b(base + 1) & 0xff) == 0x4d => false
      case _ => return nullRow
    }
    def inBounds(off: Long, n: Long): Boolean =
      off >= 0 && n >= 0 && off + n <= len
    def u16(off: Int): Int = {
      val a = b(base + off) & 0xff; val c = b(base + off + 1) & 0xff
      if (le) a | (c << 8) else (a << 8) | c
    }
    def u32(off: Int): Long =
      if (le) (u16(off).toLong | (u16(off + 2).toLong << 16)) & 0xffffffffL
      else ((u16(off).toLong << 16) | u16(off + 2)) & 0xffffffffL
    if (u16(2) != 42) return nullRow

    case class Entry(tag: Int, tpe: Int, count: Long, at: Int) // at: relative
    def readIfd(off: Long): Seq[Entry] = {
      if (!inBounds(off, 2)) return Nil
      val n = u16(off.toInt)
      (0 until n).flatMap { k =>
        val e = off.toInt + 2 + k * 12
        if (!inBounds(e, 12)) None
        else Some(Entry(u16(e), u16(e + 2), u32(e + 4), e + 8))
      }
    }
    def ascii(e: Entry): UTF8String = {
      if (e.tpe != 2 || e.count < 1 || e.count > 65536) return null
      val n = e.count.toInt
      val rel =
        if (n <= 4) e.at.toLong
        else { val off = u32(e.at); if (!inBounds(off, n)) return null; off }
      if (!inBounds(rel, math.min(n, 4).toLong)) return null
      val start = base + rel.toInt
      var end = start
      val limit = math.min(start + n, b.length)
      while (end < limit && b(end) != 0) end += 1
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, end))
    }
    def short(e: Entry): Integer =
      if (e.tpe == 3 && e.count >= 1) Integer.valueOf(u16(e.at)) else null
    def rational3(e: Entry): Array[Double] = {
      if (e.tpe != 5 || e.count != 3) return null
      val off = u32(e.at)
      if (!inBounds(off, 24)) return null
      Array.tabulate(3) { k =>
        val num = u32(off.toInt + k * 8).toDouble
        val den = u32(off.toInt + k * 8 + 4).toDouble
        if (den == 0) 0.0 else num / den
      }
    }

    val ifd0 = readIfd(u32(4))
    def find(es: Seq[Entry], tag: Int): Option[Entry] = es.find(_.tag == tag)
    val make = find(ifd0, 0x010f).map(ascii).orNull
    val model = find(ifd0, 0x0110).map(ascii).orNull
    val orientation = find(ifd0, 0x0112).map(short).orNull
    // DateTimeOriginal (Exif sub-IFD 0x9003) wins over IFD0 DateTime
    val exifIfd = find(ifd0, 0x8769)
      .map(e => readIfd(u32(e.at))).getOrElse(Nil)
    val datetime = find(exifIfd, 0x9003).map(ascii).filter(_ != null)
      .orElse(find(ifd0, 0x0132).map(ascii)).orNull
    val gps = find(ifd0, 0x8825)
      .map(e => readIfd(u32(e.at))).getOrElse(Nil)
    def coord(refTag: Int, valTag: Int, negRef: Char): java.lang.Double = {
      val ref = find(gps, refTag).map(ascii).orNull
      val dms = find(gps, valTag).map(rational3).orNull
      if (ref == null || dms == null) null
      else {
        val v = dms(0) + dms(1) / 60.0 + dms(2) / 3600.0
        java.lang.Double.valueOf(
          if (ref.toString.startsWith(negRef.toString)) -v else v)
      }
    }
    new GenericInternalRow(Array[Any](make, model, datetime, orientation,
      coord(1, 2, 'S'), coord(3, 4, 'W')))
  }

  // -------------------------------------------------------- expressions

  case class ExifParse(child: Expression) extends UnaryExpression {
    // SQL-registered: a non-binary argument must be a plan-time
    // analysis error, not an executor-side ClassCastException
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"exif_metadata expects a BINARY payload, got ${child.dataType.simpleString}")
    override def dataType: DataType = schema
    override def prettyName: String = "exif_metadata"
    override def nullSafeEval(a: Any): Any =
      parseKernel(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.operators.Exif.parseKernel($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 12-arg fixture/egress builder as an expression: children are
    * (make, model, datetime, orientation, latRef, latDeg, latMin,
    * latSec100, lonRef, lonDeg, lonMin, lonSec100) */
  case class ExifBuild(children: Seq[Expression]) extends Expression {
    require(children.size == 12, "exif_jpeg takes 12 arguments")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "exif_jpeg"
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) null
      else buildKernel(
        vs(0).asInstanceOf[UTF8String], vs(1).asInstanceOf[UTF8String],
        vs(2).asInstanceOf[UTF8String], vs(3).asInstanceOf[Int],
        vs(4).asInstanceOf[UTF8String], vs(5).asInstanceOf[Int],
        vs(6).asInstanceOf[Int], vs(7).asInstanceOf[Int],
        vs(8).asInstanceOf[UTF8String], vs(9).asInstanceOf[Int],
        vs(10).asInstanceOf[Int], vs(11).asInstanceOf[Int])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val evs = children.map(_.genCode(ctx))
      val anyNull = evs.map(_.isNull).mkString(" || ")
      val args = Seq(
        s"${evs(0).value}", s"${evs(1).value}", s"${evs(2).value}",
        s"${evs(3).value}", s"${evs(4).value}", s"${evs(5).value}",
        s"${evs(6).value}", s"${evs(7).value}", s"${evs(8).value}",
        s"${evs(9).value}", s"${evs(10).value}", s"${evs(11).value}")
        .mkString(", ")
      ev.copy(code = code"""
        ${evs.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = $anyNull;
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.operators.Exif.buildKernel($args);
        }""")
    }
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression = copy(children = cs)
  }

  // ------------------------------------------------- Column-level API

  def exif_metadata(payload: Column): Column =
    ColumnBridge.column(ExifParse(ColumnBridge.expression(payload)))

  def exif_jpeg(make: Column, model: Column, datetime: Column,
      orientation: Column, latRef: Column, latDeg: Column, latMin: Column,
      latSec100: Column, lonRef: Column, lonDeg: Column, lonMin: Column,
      lonSec100: Column): Column =
    ColumnBridge.column(ExifBuild(Seq(make, model, datetime, orientation,
      latRef, latDeg, latMin, latSec100, lonRef, lonDeg, lonMin, lonSec100)
      .map(ColumnBridge.expression)))
}
