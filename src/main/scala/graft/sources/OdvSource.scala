package graft.sources

import scala.io.Source

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.core.{SuperType, UnionByName}

/** Ocean Data View spreadsheet (ODV ASCII) reader — `read_odv_ascii`
  * in the reference (beacon-arrow-odv/src/reader.rs; SURVEY §2.1).
  *
  * Format: `//`-prefixed semantic header (XML-ish `<MetaVariable>` /
  * `<DataVariable>` declarations carrying label/value_type/unit), one
  * tab-separated header row, then tab-separated data rows.
  *
  * Schema semantics mirrored from the reference:
  *  - declared value types: INDEXED_TEXT→string, INTEGER→bigint,
  *    FLOAT→float, DOUBLE→double, TEXT:n→string.
  *  - labels carry units as a `[unit]` suffix → stripped from the
  *    column name, kept as field metadata.
  *  - implicit defaults: Cruise/Station/Type (string) and the
  *    `yyyy-mm-ddThh:mm:ss.sss` timestamp column.
  *  - `time_ISO8601` columns parse as timestamps.
  *  - `QV:<schema>` header cells are quality flags for the PREVIOUS
  *    column → `<prev>_qc` (string); `QV:<schema>:<name>` → `<name>_qc`.
  *  - unknown header cells fall back to string.
  *  - empty cells are NULL.
  *
  * Execution: the header parse is driver-side (one small read per
  * file); data rows stream through a partition-parallel line parser
  * (spark.read.text → typed rows), so a many-file ODV archive scales
  * like any text scan. Multi-file schemas merge via the supercast
  * lattice.
  *
  * Compressed spreadsheets (`.zst` / `.gz`, the reference's
  * `test_file.txt.zst` shape) decompress transparently: the header
  * parse streams the decoder; the data scan reads a decompressed copy
  * cached per (path, mtime, size) beside the ByteStore download cache.
  */
object OdvSource {

  /** transparent container decompression + remote access */
  private def decodedStream(path: String): java.io.InputStream = {
    val raw = graft.sources.io.ByteStore.openStream(path)
    if (path.endsWith(".zst")) new com.github.luben.zstd.ZstdInputStream(raw)
    else if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw)
    else raw
  }

  /** path for the partition-parallel text scan: compressed files
    * materialize their decoded bytes once per JVM; plain paths (any
    * scheme) go straight to spark.read.text */
  private def scanPath(path: String): String =
    if (path.endsWith(".zst"))
      graft.sources.io.ByteStore.localizeTransformed(path, "un-zst") { (in, out) =>
        new com.github.luben.zstd.ZstdInputStream(in).transferTo(out)
      }
    else if (path.endsWith(".gz"))
      graft.sources.io.ByteStore.localizeTransformed(path, "un-gz") { (in, out) =>
        new java.util.zip.GZIPInputStream(in).transferTo(out)
      }
    else path

  private val metaVarRe =
    """(?s)^//<(?:MetaVariable|DataVariable)>.*?label="([^"]+)".*?value_type="([^"]+)".*""".r
  private val unitsRe = """^(.*?)\s*\[(.*?)\]$""".r

  final case class OdvSchema(header: String, schema: StructType)

  private def valueType(vt: String): DataType = vt match {
    case "INDEXED_TEXT"                 => StringType
    case "INTEGER"                      => LongType
    case "FLOAT"                        => FloatType
    case "DOUBLE"                       => DoubleType
    case t if t.startsWith("TEXT:")     => StringType
    case other => throw new IllegalArgumentException(s"unsupported ODV value_type: $other")
  }

  private def stripUnits(label: String): (String, Option[String]) = label match {
    case unitsRe(name, unit) => (name, Some(unit).filter(_.nonEmpty))
    case _ => (label, None)
  }

  /** Parse the `//` header + header row of one file (driver-side). */
  def readSchema(path0: String): OdvSchema = {
    val path = graft.sources.io.ByteStore.toLocal(path0)
    val src = Source.fromInputStream(decodedStream(path), "UTF-8")
    try {
      val lines = src.getLines()
      var declared = scala.collection.mutable.LinkedHashMap[String, StructField](
        "Cruise" -> StructField("Cruise", StringType),
        "Station" -> StructField("Station", StringType),
        "Type" -> StructField("Type", StringType),
        "yyyy-mm-ddThh:mm:ss.sss" ->
          StructField("yyyy-mm-ddThh:mm:ss.sss", TimestampNTZType))
      var headerRow: String = null
      while (headerRow == null && lines.hasNext) {
        val line = lines.next()
        if (line.startsWith("//")) {
          line match {
            case metaVarRe(label, vt) =>
              val (name, unit) = stripUnits(label)
              val md = unit.map(u => new MetadataBuilder().putString("units", u).build())
                .getOrElse(Metadata.empty)
              declared += name -> StructField(name, valueType(vt), nullable = true, md)
            case _ =>
          }
        } else headerRow = line
      }
      require(headerRow != null, s"no header row in $path")

      val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
      headerRow.split("\t", -1).foreach { cell =>
        val (name, _) = stripUnits(cell)
        declared.get(name) match {
          case Some(f) if name.equalsIgnoreCase("time_iso8601") =>
            fields += f.copy(dataType = TimestampNTZType)
          case Some(f) => fields += f
          case None if name.startsWith("QV:") =>
            val parts = name.split(":")
            val qcName =
              if (parts.length == 2)
                s"${fields.lastOption.map(_.name).getOrElse("unknown")}_qc"
              else s"${parts(2)}_qc"
            fields += StructField(dedupe(fields.map(_.name).toSet, qcName), StringType)
          case None => fields += StructField(dedupe(fields.map(_.name).toSet, name), StringType)
        }
      }
      OdvSchema(headerRow, StructType(fields.toSeq))
    } finally src.close()
  }

  /** a_qc, a_qc_2, a_qc_3 … when quality columns repeat */
  private def dedupe(taken: Set[String], name: String): String = {
    if (!taken(name)) name
    else Iterator.from(2).map(i => s"${name}_$i").find(n => !taken(n)).get
  }

  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val files = FileCollection.expandGlobs(spark, paths)
    require(files.nonEmpty, s"no files match: ${paths.mkString(",")}")
    val parsed = files.map(f => f -> readSchema(f))
    val merged = SuperType.superTypeSchemaScan(parsed.map(_._2.schema))
    val parts = parsed.map { case (f, odv) =>
      UnionByName.project(readFile(spark, f, odv), merged)
    }
    parts.reduce(_ union _)
  }

  private def readFile(spark: SparkSession, path: String, odv: OdvSchema): DataFrame = {
    val schema = odv.schema
    val header = odv.header
    val enc = RowEncoder.encoderFor(schema)
    import spark.implicits._
    spark.read.textFile(scanPath(path))
      .filter(line => !line.startsWith("//") && line != header && line.nonEmpty)
      .mapPartitions { lines =>
        lines.map { line =>
          val cells = line.split("\t", -1)
          val vals = schema.fields.zipWithIndex.map { case (f, i) =>
            val raw = if (i < cells.length) cells(i) else ""
            if (raw.isEmpty) null else parseValue(raw, f.dataType)
          }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }
      }(enc).toDF()
  }

  private def parseValue(s: String, t: DataType): Any = t match {
    case StringType       => s
    case LongType         => try s.trim.toLong catch { case _: NumberFormatException => null }
    case FloatType        => try s.trim.toFloat catch { case _: NumberFormatException => null }
    case DoubleType       => try s.trim.toDouble catch { case _: NumberFormatException => null }
    case TimestampNTZType => parseIso(s.trim)
    case other => throw new IllegalArgumentException(s"unsupported ODV column type: $other")
  }

  private def parseIso(s: String): Any =
    try java.time.LocalDateTime.parse(s)
    catch {
      case _: java.time.format.DateTimeParseException =>
        try java.time.LocalDate.parse(s).atStartOfDay()
        catch { case _: java.time.format.DateTimeParseException => null }
    }
}
