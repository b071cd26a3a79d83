package graft.sources.iceberg

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Apache Iceberg read support without the connector jar: a pure-JVM
  * reader of the open Iceberg table spec (v1/v2 metadata JSON +
  * Avro manifest lists/manifests), driving Spark's native parquet scan
  * for the data files.
  *
  * Mirrors the reference's `read_iceberg(location [, snapshot])` table
  * function and `STORED AS ICEBERG` definition
  * (beacon-iceberg/src/{table_function,definition}.rs). Like the
  * reference, this is READ-ONLY toward tables other systems write; the
  * [[Writer]] below exists to produce real fixture tables for tests.
  *
  * Current metadata is found from `metadata/version-hint.text` when
  * present, else the highest-versioned `*.metadata.json` — the same
  * resolution seam as the reference (`provider::resolve_metadata_location`).
  * Absolute paths inside metadata are relocated under the actual table
  * directory via the metadata's own `location` field, so a table can be
  * moved/copied wholesale (the reference fixture is exactly that).
  *
  * Unlike Delta/Hive layouts, Iceberg data files carry the partition
  * columns as real columns, so the scan needs no per-partition literal
  * branches: one native parquet relation over the snapshot's file set.
  * Row-level deletes (position/equality delete files) are detected and
  * rejected, not silently ignored.
  */
object IcebergSource {

  final case class DataFileEntry(path: String, format: String, recordCount: Long)
  final case class Snapshot(
      snapshotId: Long,
      sequenceNumber: Long,
      timestampMs: Long,
      schema: StructType,
      files: Seq[DataFileEntry])

  // -------------------------------------------------------- metadata

  /** Files.list with a closed stream (a leaked DirectoryStream costs an
    * fd until finalization) */
  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toVector finally s.close()
  }

  private[iceberg] def metadataDir(table: String): Path = Paths.get(table, "metadata")

  /** version-hint.text when present, else highest `*.metadata.json` by
    * numeric version (the vN naming is not zero-padded, so a raw
    * lexicographic sort would put v10 before v9; filename breaks ties) */
  private[iceberg] def resolveMetadataFile(table: String): Path = {
    val dir = metadataDir(table)
    require(Files.isDirectory(dir), s"not an Iceberg table (no metadata dir): $table")
    val hint = dir.resolve("version-hint.text")
    if (Files.exists(hint)) {
      val v = Files.readString(hint).trim
      val candidates = Seq(dir.resolve(s"v$v.metadata.json")) ++
        listDir(dir).filter(
          _.getFileName.toString.matches(s"0*$v-.*\\.metadata\\.json"))
      candidates.find(Files.exists(_)).getOrElse(
        throw new IllegalArgumentException(s"version-hint $v has no metadata file in $dir"))
    } else {
      listDir(dir)
        .filter(_.getFileName.toString.endsWith(".metadata.json"))
        .sortBy(p => (versionOfMetadataFile(p).getOrElse(-1), p.getFileName.toString))
        .lastOption
        .getOrElse(throw new IllegalArgumentException(s"no metadata files in $dir"))
    }
  }

  /** metadata version from either supported naming: %05d-uuid or vN */
  private def versionOfMetadataFile(p: Path): Option[Int] = {
    val n = p.getFileName.toString
    val digits =
      if (n.startsWith("v")) n.drop(1).takeWhile(_.isDigit)
      else n.takeWhile(_.isDigit)
    if (digits.nonEmpty) Some(digits.toInt) else None
  }

  def snapshot(tableLocation: String, travel: Option[String] = None): Snapshot = {
    val metaPath = resolveMetadataFile(tableLocation)
    val meta = JsonMethods.parse(Files.readString(metaPath))

    val declaredLocation = (meta \ "location") match {
      case JString(l) => l
      case _ => tableLocation
    }
    // exact-or-child match only: /data/t must not capture /data/t_backup/…
    def relocate(p: String): String =
      if (p == declaredLocation || p.startsWith(declaredLocation + "/"))
        Paths.get(tableLocation, p.stripPrefix(declaredLocation)).toString
      else p

    // ---- snapshot selection: none → current, digits → snapshot-id,
    // else RFC-3339 timestamp over snapshot-log
    val snaps = (meta \ "snapshots") match {
      case JArray(xs) => xs.collect { case o: JObject => o }
      case _ => Nil
    }
    require(snaps.nonEmpty, s"Iceberg table has no snapshots: $tableLocation")
    def jlong(v: JValue): Long = v match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case other => throw new IllegalArgumentException(s"expected integer, got $other")
    }
    val chosen: JObject = travel match {
      case None =>
        val cur = jlong(meta \ "current-snapshot-id")
        snaps.find(s => jlong(s \ "snapshot-id") == cur).getOrElse(
          throw new IllegalArgumentException(s"current snapshot $cur not in metadata"))
      case Some(t) if t.matches("""-?\d+""") =>
        val id = t.toLong
        snaps.find(s => jlong(s \ "snapshot-id") == id).getOrElse(
          throw new IllegalArgumentException(
            s"snapshot $id not in table (have ${snaps.map(s => jlong(s \ "snapshot-id")).mkString(",")})"))
      case Some(ts) =>
        val cutoff = java.time.OffsetDateTime.parse(ts).toInstant.toEpochMilli
        val eligible = snaps.filter(s => jlong(s \ "timestamp-ms") <= cutoff)
        require(eligible.nonEmpty, s"no Iceberg snapshot at or before $ts")
        eligible.maxBy(s => jlong(s \ "timestamp-ms"))
    }
    val snapId = jlong(chosen \ "snapshot-id")

    // ---- schema: the snapshot's schema-id when recorded, else current
    val schemaId = (chosen \ "schema-id") match {
      case JInt(n) => n.toInt
      case JLong(n) => n.toInt
      case _ => (meta \ "current-schema-id") match {
        case JInt(n) => n.toInt
        case JLong(n) => n.toInt
        case _ => 0
      }
    }
    val schemaJson = (meta \ "schemas") match {
      case JArray(xs) =>
        xs.collectFirst {
          case o: JObject if (o \ "schema-id") == JInt(schemaId) => o
        }.orElse(xs.collectFirst { case o: JObject => o })
          .getOrElse(throw new IllegalArgumentException("no schemas in metadata"))
      case _ => (meta \ "schema") match { // v1 single-schema layout
        case o: JObject => o
        case _ => throw new IllegalArgumentException("no schema in metadata")
      }
    }
    val schema = structFromIceberg(schemaJson)

    // ---- manifest list → manifests → live data files
    val manifestList = (chosen \ "manifest-list") match {
      case JString(p) => relocate(p)
      case _ => throw new IllegalArgumentException("snapshot has no manifest-list")
    }
    val files = scala.collection.mutable.ArrayBuffer.empty[DataFileEntry]
    readAvro(manifestList).foreach { mf =>
      val manifestPath = relocate(str(mf, "manifest_path"))
      val manifestContent = intField(mf, "content", 0) // 0 data, 1 deletes
      readAvro(manifestPath).foreach { entry =>
        val status = intField(entry, "status", 0) // 0 existing, 1 added, 2 deleted
        if (status != 2) {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          require(df != null, s"manifest entry without data_file in $manifestPath")
          val fileContent = intField(df, "content", manifestContent)
          require(fileContent == 0,
            s"Iceberg row-level deletes not supported by this reader (delete file ${str(df, "file_path")})")
          files += DataFileEntry(
            relocate(str(df, "file_path")),
            str(df, "file_format").toLowerCase,
            longField(df, "record_count", 0L))
        }
      }
    }
    Snapshot(snapId, longField1(chosen \ "sequence-number", 0L),
      jlong(chosen \ "timestamp-ms"), schema, files.toSeq)
  }

  // ------------------------------------------------------------ read

  def read(spark: SparkSession, tableLocation: String, travel: Option[String] = None): DataFrame = {
    val snap = snapshot(tableLocation, travel)
    snap.files.foreach(f => require(f.format == "parquet",
      s"unsupported Iceberg data file format: ${f.format}"))
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else
      spark.read.schema(snap.schema).parquet(snap.files.map(_.path): _*)
  }

  // ------------------------------------------------------------ avro

  private def readAvro(path: String): Seq[GenericRecord] = {
    val r = new DataFileReader[GenericRecord](
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toVector finally r.close()
  }

  private def str(r: GenericRecord, name: String): String = {
    val v = r.get(name)
    require(v != null, s"avro record missing $name")
    v.toString
  }
  private def intField(r: GenericRecord, name: String, dflt: Int): Int =
    if (r.getSchema.getField(name) == null || r.get(name) == null) dflt
    else r.get(name).asInstanceOf[Number].intValue()
  private def longField(r: GenericRecord, name: String, dflt: Long): Long =
    if (r.getSchema.getField(name) == null || r.get(name) == null) dflt
    else r.get(name).asInstanceOf[Number].longValue()
  private def longField1(v: JValue, dflt: Long): Long = v match {
    case JInt(n) => n.toLong
    case JLong(n) => n
    case _ => dflt
  }

  // ----------------------------------------------------------- types

  private val decimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val fixedRe = """fixed\[(\d+)\]""".r

  /** Iceberg schema JSON → Spark StructType. All fields are surfaced
    * nullable: `required` is an ingest-side constraint and Spark's
    * parquet reader treats missing-as-null uniformly. */
  private[iceberg] def structFromIceberg(struct: JValue): StructType = {
    val fields = (struct \ "fields") match {
      case JArray(fs) => fs.collect { case o: JObject => o }
      case _ => Nil
    }
    StructType(fields.map { f =>
      val JString(name) = (f \ "name"): @unchecked
      StructField(name, typeFromIceberg(f \ "type"), nullable = true)
    })
  }

  private def typeFromIceberg(t: JValue): DataType = t match {
    case JString(s) => s match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "time" => LongType // micros since midnight
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "timestamp_ns" => TimestampNTZType
      case "timestamptz_ns" => TimestampType
      case "string" => StringType
      case "uuid" => StringType
      case "binary" => BinaryType
      case decimalRe(p, sc) => DecimalType(p.toInt, sc.toInt)
      case fixedRe(_) => BinaryType
      case other => throw new IllegalArgumentException(s"unsupported Iceberg type: $other")
    }
    case o: JObject => (o \ "type") match {
      case JString("struct") => structFromIceberg(o)
      case JString("list") => ArrayType(typeFromIceberg(o \ "element"), containsNull = true)
      case JString("map") =>
        MapType(typeFromIceberg(o \ "key"), typeFromIceberg(o \ "value"), valueContainsNull = true)
      case other => throw new IllegalArgumentException(s"unsupported Iceberg complex type: $other")
    }
    case other => throw new IllegalArgumentException(s"bad Iceberg type node: $other")
  }

  private def icebergTypeOf(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case StringType => "string"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(s"no Iceberg mapping for $other")
  }

  // ----------------------------------------------------------- write

  /** Minimal Iceberg v2 writer — enough spec to produce real tables for
    * round-trip tests and gate fixtures: unpartitioned appends with one
    * manifest per snapshot. Data files are written by Spark's parquet
    * writer; record counts come from the parquet footers (no extra job).
    * Snapshot ids are sequential for deterministic fixtures. */
  object Writer {

    private val manifestEntrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"file_sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int"},
        |{"name":"file_path","type":"string"},
        |{"name":"file_format","type":"string"},
        |{"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
        |{"name":"record_count","type":"long"},
        |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

    private val manifestFileSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int"},
        |{"name":"sequence_number","type":"long"},
        |{"name":"min_sequence_number","type":"long"},
        |{"name":"added_snapshot_id","type":"long"},
        |{"name":"added_files_count","type":"int"},
        |{"name":"existing_files_count","type":"int"},
        |{"name":"deleted_files_count","type":"int"},
        |{"name":"added_rows_count","type":"long"},
        |{"name":"existing_rows_count","type":"long"},
        |{"name":"deleted_rows_count","type":"long"}]}""".stripMargin)

    private def writeAvro(path: Path, schema: org.apache.avro.Schema,
        records: Seq[GenericRecord], fileMeta: Map[String, String]): Long = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      fileMeta.foreach { case (k, v) => w.setMeta(k, v) }
      w.create(schema, path.toFile)
      records.foreach(w.append)
      w.close()
      Files.size(path)
    }

    private def parquetRowCount(spark: SparkSession, p: String): Long = {
      val conf = spark.sessionState.newHadoopConf()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(p), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }

    /** append `df` as a new snapshot; returns the new snapshot id */
    def append(spark: SparkSession, df: DataFrame, tableLocation: String): Long = {
      val table = Paths.get(tableLocation)
      val metaDir = metadataDir(tableLocation)
      val dataDir = table.resolve("data")
      Files.createDirectories(metaDir)
      Files.createDirectories(dataDir)

      val prior: Option[(JValue, Snapshot)] =
        if (listDir(metaDir).exists(
          _.getFileName.toString.endsWith(".metadata.json"))) {
          val m = JsonMethods.parse(Files.readString(resolveMetadataFile(tableLocation)))
          Some(m -> IcebergSource.snapshot(tableLocation))
        } else None
      val snapId = prior.map(_._2.snapshotId + 1).getOrElse(1L)
      val seq = prior.map(_._2.sequenceNumber + 1).getOrElse(1L)
      val version = prior.map { case (m, _) =>
        (m \ "last-metadata-version") match {
          case JInt(v) => v.toInt + 1
          case _ => // recover from the file name (%05d-uuid or vN forms)
            versionOfMetadataFile(resolveMetadataFile(tableLocation))
              .getOrElse(0) + 1
        }
      }.getOrElse(0)

      // ---- stage data files
      val tmp = Files.createTempDirectory(table, ".stage")
      df.write.mode("overwrite").parquet(tmp.toString)
      val staged = listDir(tmp)
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p)).toVector
      val dataFiles = staged.map { p =>
        val dest = dataDir.resolve(
          s"data-${java.util.UUID.randomUUID().toString.take(8)}-${p.getFileName}")
        Files.move(p, dest)
        DataFileEntry(dest.toString, "parquet", parquetRowCount(spark, dest.toString))
      }
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)

      // ---- manifest for this snapshot
      val manifestPath = metaDir.resolve(s"manifest-$snapId-m0.avro")
      val entries = dataFiles.map { f =>
        val dfr = new GenericData.Record(
          manifestEntrySchema.getField("data_file").schema())
        dfr.put("content", 0)
        dfr.put("file_path", f.path)
        dfr.put("file_format", "PARQUET")
        dfr.put("partition", new GenericData.Record(
          dfr.getSchema.getField("partition").schema()))
        dfr.put("record_count", f.recordCount)
        dfr.put("file_size_in_bytes", Files.size(Paths.get(f.path)))
        val e = new GenericData.Record(manifestEntrySchema)
        e.put("status", 1) // added
        e.put("snapshot_id", snapId)
        e.put("sequence_number", seq)
        e.put("file_sequence_number", seq)
        e.put("data_file", dfr)
        e
      }
      val manifestLen = writeAvro(manifestPath, manifestEntrySchema, entries,
        Map("format-version" -> "2", "content" -> "data"))

      // ---- manifest list: prior snapshot's manifests + the new one
      val priorManifests: Seq[GenericRecord] = prior.map { case (m, s) =>
        (m \ "snapshots") match {
          case JArray(xs) =>
            xs.collectFirst {
              case o: JObject if (o \ "snapshot-id") == JInt(BigInt(s.snapshotId)) ||
                  (o \ "snapshot-id") == JLong(s.snapshotId) =>
                (o \ "manifest-list") match {
                  case JString(p) => readAvroList(p)
                  case _ => Seq.empty[GenericRecord]
                }
            }.getOrElse(Seq.empty)
          case _ => Seq.empty
        }
      }.getOrElse(Seq.empty)
      val mf = new GenericData.Record(manifestFileSchema)
      mf.put("manifest_path", manifestPath.toString)
      mf.put("manifest_length", manifestLen)
      mf.put("partition_spec_id", 0)
      mf.put("content", 0)
      mf.put("sequence_number", seq)
      mf.put("min_sequence_number", seq)
      mf.put("added_snapshot_id", snapId)
      mf.put("added_files_count", dataFiles.size)
      mf.put("existing_files_count", 0)
      mf.put("deleted_files_count", 0)
      mf.put("added_rows_count", dataFiles.map(_.recordCount).sum)
      mf.put("existing_rows_count", 0L)
      mf.put("deleted_rows_count", 0L)
      // re-emit prior manifest-file records under our schema by name
      val carried = priorManifests.map { r =>
        val c = new GenericData.Record(manifestFileSchema)
        manifestFileSchema.getFields.asScala.foreach { f =>
          val v = if (r.getSchema.getField(f.name()) != null) r.get(f.name()) else null
          c.put(f.name(),
            if (v != null) v
            else if (f.schema().getType == org.apache.avro.Schema.Type.LONG) 0L
            else if (f.schema().getType == org.apache.avro.Schema.Type.INT) 0
            else v)
        }
        c
      }
      val listPath = metaDir.resolve(s"snap-$snapId-1-graft.avro")
      writeAvro(listPath, manifestFileSchema, carried :+ mf,
        Map("format-version" -> "2", "snapshot-id" -> snapId.toString,
          "sequence-number" -> seq.toString))

      // ---- metadata json
      val now = java.lang.System.currentTimeMillis()
      val schemaFields = df.schema.fields.zipWithIndex.map { case (f, i) =>
        JObject("id" -> JInt(i + 1), "name" -> JString(f.name),
          "required" -> JBool(false), "type" -> JString(icebergTypeOf(f.dataType)))
      }.toList
      val newSnap = JObject(
        "snapshot-id" -> JLong(snapId),
        "sequence-number" -> JLong(seq),
        "timestamp-ms" -> JLong(now),
        "schema-id" -> JInt(0),
        "manifest-list" -> JString(listPath.toString),
        "summary" -> JObject("operation" -> JString("append")))
      val priorSnaps = prior.map { case (m, _) =>
        (m \ "snapshots") match { case JArray(xs) => xs; case _ => Nil }
      }.getOrElse(Nil)
      val priorLog = prior.map { case (m, _) =>
        (m \ "snapshot-log") match { case JArray(xs) => xs; case _ => Nil }
      }.getOrElse(Nil)
      val meta = JObject(
        "format-version" -> JInt(2),
        "table-uuid" -> JString(prior.map { case (m, _) =>
          (m \ "table-uuid") match { case JString(u) => u; case _ => "graft" }
        }.getOrElse(java.util.UUID.randomUUID().toString)),
        "location" -> JString(table.toString),
        "last-sequence-number" -> JLong(seq),
        "last-updated-ms" -> JLong(now),
        "last-column-id" -> JInt(df.schema.size),
        "last-metadata-version" -> JInt(version),
        "schemas" -> JArray(List(JObject(
          "schema-id" -> JInt(0), "type" -> JString("struct"),
          "fields" -> JArray(schemaFields)))),
        "current-schema-id" -> JInt(0),
        "partition-specs" -> JArray(List(JObject(
          "spec-id" -> JInt(0), "fields" -> JArray(Nil)))),
        "default-spec-id" -> JInt(0),
        "current-snapshot-id" -> JLong(snapId),
        "snapshots" -> JArray(priorSnaps :+ newSnap),
        "snapshot-log" -> JArray(priorLog :+ JObject(
          "snapshot-id" -> JLong(snapId), "timestamp-ms" -> JLong(now))),
        "refs" -> JObject("main" -> JObject(
          "snapshot-id" -> JLong(snapId), "type" -> JString("branch"))))
      val metaName = f"$version%05d-${java.util.UUID.randomUUID()}.metadata.json"
      Files.write(metaDir.resolve(metaName),
        JsonMethods.pretty(JsonMethods.render(meta)).getBytes(StandardCharsets.UTF_8))
      Files.write(metaDir.resolve("version-hint.text"),
        version.toString.getBytes(StandardCharsets.UTF_8))
      snapId
    }

    private def readAvroList(path: String): Seq[GenericRecord] = {
      val r = new DataFileReader[GenericRecord](
        new java.io.File(path), new GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.toVector finally r.close()
    }
  }
}
