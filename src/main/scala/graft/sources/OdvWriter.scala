package graft.sources

import java.io.BufferedWriter

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** ODV ASCII writer — the `odv` output of the reference
  * (beacon-arrow-odv/src/writer.rs; SURVEY §2.2). Emits the semantic
  * `//`-header (one DataVariable declaration per column, units from
  * field metadata), the tab-separated header row, then streamed TSV
  * rows (driver-side, bounded memory — single-file writers, SURVEY
  * §7.3.6).
  *
  * Round-trip contract with [[OdvSource]]: declared value types map
  * back (INDEXED_TEXT/INTEGER/FLOAT/DOUBLE); a timestamp column keeps
  * its type across the round trip when named `time_ISO8601` (the ODV
  * convention) — other timestamp columns serialize as ISO text.
  */
object OdvWriter {

  private def valueType(t: DataType): String = t match {
    case StringType                      => "INDEXED_TEXT"
    case LongType | IntegerType |
         ShortType | ByteType            => "INTEGER"
    case FloatType                       => "FLOAT"
    case DoubleType                      => "DOUBLE"
    case TimestampNTZType | TimestampType => "INDEXED_TEXT"
    case other => throw new IllegalArgumentException(
      s"odv writer: unsupported column type ${other.simpleString}")
  }

  /** @return number of rows written (the COPY TO row receipt).
    * A `.zip` target wraps the spreadsheet in a ZIP archive holding one
    * `data.txt` entry — the reference's ODV responses are always ZIP
    * collections (docs api/querying/index.md §ODV). */
  def write(df: DataFrame, path: String): Long = {
    val schema = df.schema
    // staged egress: write locally, publish to the target scheme
    // (ZIP detection keys off the TARGET name, not the temp file)
    val (local, publish) = graft.sources.io.ByteStore.stageOut(path)
    // explicit UTF-8: FileWriter would use the platform charset, which
    // corrupts non-ASCII labels/units on non-UTF-8 JVMs while the ODV
    // reader always decodes UTF-8 (round-trip contract)
    val w: BufferedWriter =
      if (path.toLowerCase.endsWith(".zip")) {
        val zos = new java.util.zip.ZipOutputStream(
          java.nio.file.Files.newOutputStream(local))
        zos.putNextEntry(new java.util.zip.ZipEntry("data.txt"))
        new BufferedWriter(new java.io.OutputStreamWriter(
          zos, java.nio.charset.StandardCharsets.UTF_8))
      } else java.nio.file.Files.newBufferedWriter(
        local, java.nio.charset.StandardCharsets.UTF_8)
    val written = try {
      w.write("//ODV Spreadsheet V4.6\n")
      w.write("//<Creator>graft</Creator>\n")
      schema.fields.foreach { f =>
        val label =
          if (f.metadata.contains("units")) s"${f.name} [${f.metadata.getString("units")}]"
          else f.name
        w.write(s"""//<DataVariable> label="$label" value_type="${valueType(f.dataType)}" qf_schema="ODV" </DataVariable>\n""")
      }
      w.write(schema.fieldNames.mkString("\t"))
      w.write("\n")
      var n = 0L
      df.toLocalIterator().asScala.foreach { row =>
        val cells = schema.fields.zipWithIndex.map { case (f, i) =>
          if (row.isNullAt(i)) ""
          else f.dataType match {
            case TimestampNTZType =>
              row.getAs[java.time.LocalDateTime](i)
                .format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
            case TimestampType =>
              java.time.LocalDateTime.ofInstant(
                row.getAs[java.time.Instant](i), java.time.ZoneOffset.UTC)
                .format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
            case _ => String.valueOf(row.get(i))
          }
        }
        w.write(cells.mkString("\t"))
        w.write("\n")
        n += 1
      }
      n
    } finally w.close()
    publish()
    written
  }
}
