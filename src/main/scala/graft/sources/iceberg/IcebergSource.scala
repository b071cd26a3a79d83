package graft.sources.iceberg

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}
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
  *
  * Row-level deletes (Iceberg v2 merge-on-read, as the reference reads
  * via iceberg-rust — beacon-iceberg/src/provider.rs) are applied as
  * distributed anti-joins over the scan:
  *  - position deletes (content=1): `(file_path, pos)` rows anti-joined
  *    against `(_metadata.file_path, _metadata.row_index)`;
  *  - equality deletes (content=2): the delete file's rows anti-joined
  *    null-safely on the `equality_ids` columns, restricted to data
  *    files with a data sequence number STRICTLY below the delete's —
  *    rows appended after the delete survive, per spec.
  * Both scale as shuffles keyed by the join columns; nothing is
  * collected to the driver and the per-file lookup (one row per data
  * file) is the only broadcast.
  */
object IcebergSource {

  /** `path` is the relocated (actual) location; `declaredPath` the raw
    * manifest string — position-delete files reference the latter. */
  final case class DataFileEntry(
      path: String, format: String, recordCount: Long,
      declaredPath: String = "", sequenceNumber: Long = 0L)
  /** content: 1 = position deletes, 2 = equality deletes */
  final case class DeleteFileEntry(
      path: String, format: String, content: Int,
      sequenceNumber: Long, equalityCols: Seq[String])
  final case class Snapshot(
      snapshotId: Long,
      sequenceNumber: Long,
      timestampMs: Long,
      schema: StructType,
      files: Seq[DataFileEntry],
      deletes: Seq[DeleteFileEntry] = Nil)

  // -------------------------------------------------------- metadata

  // metadata access goes through ByteStore: an Iceberg table on any
  // Hadoop-configured scheme (s3a://, hdfs://) resolves the same way
  private def listDir(dir: String): Seq[String] =
    graft.sources.io.ByteStore.list(dir)

  private[iceberg] def metadataDir(table: String): String =
    graft.sources.io.ByteStore.resolve(table, "metadata")

  /** version-hint.text when present, else highest `*.metadata.json` by
    * numeric version (the vN naming is not zero-padded, so a raw
    * lexicographic sort would put v10 before v9; filename breaks ties) */
  private[iceberg] def resolveMetadataFile(table: String): String = {
    import graft.sources.io.ByteStore
    val dir = metadataDir(table)
    require(ByteStore.isDirectory(dir), s"not an Iceberg table (no metadata dir): $table")
    val hint = ByteStore.resolve(dir, "version-hint.text")
    if (ByteStore.exists(hint)) {
      val v = ByteStore.readString(hint).trim
      val candidates = Seq(ByteStore.resolve(dir, s"v$v.metadata.json")) ++
        listDir(dir).filter(
          ByteStore.fileName(_).matches(s"0*$v-.*\\.metadata\\.json"))
      candidates.find(ByteStore.exists(_)).getOrElse(
        throw new IllegalArgumentException(s"version-hint $v has no metadata file in $dir"))
    } else {
      listDir(dir)
        .filter(_.endsWith(".metadata.json"))
        .sortBy(p => (versionOfMetadataFile(p).getOrElse(-1), ByteStore.fileName(p)))
        .lastOption
        .getOrElse(throw new IllegalArgumentException(s"no metadata files in $dir"))
    }
  }

  /** metadata version from either supported naming: %05d-uuid or vN */
  private def versionOfMetadataFile(p: String): Option[Int] = {
    val n = graft.sources.io.ByteStore.fileName(p)
    val digits =
      if (n.startsWith("v")) n.drop(1).takeWhile(_.isDigit)
      else n.takeWhile(_.isDigit)
    if (digits.nonEmpty) Some(digits.toInt) else None
  }

  def snapshot(tableLocation: String, travel: Option[String] = None): Snapshot = {
    val metaPath = resolveMetadataFile(tableLocation)
    val meta = JsonMethods.parse(graft.sources.io.ByteStore.readString(metaPath))

    val declaredLocation = (meta \ "location") match {
      case JString(l) => l
      case _ => tableLocation
    }
    // exact-or-child match only: /data/t must not capture /data/t_backup/…
    def relocate(p: String): String =
      if (p == declaredLocation || p.startsWith(declaredLocation + "/"))
        graft.sources.io.ByteStore.resolve(
          tableLocation, p.stripPrefix(declaredLocation).stripPrefix("/"))
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
    // top-level field-id → name, for resolving equality_ids to columns
    val fieldNameById: Map[Int, String] = (schemaJson \ "fields") match {
      case JArray(fs) => fs.collect {
        case o: JObject =>
          val id = (o \ "id") match {
            case JInt(n) => n.toInt
            case JLong(n) => n.toInt
            case _ => -1
          }
          val name = (o \ "name") match { case JString(s) => s; case _ => "" }
          id -> name
      }.filter { case (id, n) => id >= 0 && n.nonEmpty }.toMap
      case _ => Map.empty
    }

    // ---- manifest list → manifests → live data + delete files
    val manifestList = (chosen \ "manifest-list") match {
      case JString(p) => relocate(p)
      case _ => throw new IllegalArgumentException("snapshot has no manifest-list")
    }
    val files = scala.collection.mutable.ArrayBuffer.empty[DataFileEntry]
    val deletes = scala.collection.mutable.ArrayBuffer.empty[DeleteFileEntry]
    readAvro(manifestList).foreach { mf =>
      val manifestPath = relocate(str(mf, "manifest_path"))
      val manifestContent = intField(mf, "content", 0) // 0 data, 1 deletes
      val manifestSeq = longField(mf, "sequence_number", 0L)
      readAvro(manifestPath).foreach { entry =>
        val status = intField(entry, "status", 0) // 0 existing, 1 added, 2 deleted
        if (status != 2) {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          require(df != null, s"manifest entry without data_file in $manifestPath")
          // a null entry sequence number inherits the manifest's (spec v2
          // metadata-inheritance rule for added entries)
          val entrySeq = longField(entry, "sequence_number", manifestSeq)
          val fileContent = intField(df, "content", if (manifestContent == 1) 1 else 0)
          val declared = str(df, "file_path")
          val fmt = str(df, "file_format").toLowerCase
          if (fileContent == 0)
            files += DataFileEntry(relocate(declared), fmt,
              longField(df, "record_count", 0L), declared, entrySeq)
          else {
            val eqCols = intListField(df, "equality_ids").map { id =>
              fieldNameById.getOrElse(id, throw new IllegalArgumentException(
                s"equality delete references unknown field id $id"))
            }
            require(fileContent != 2 || eqCols.nonEmpty,
              s"equality delete file without equality_ids: $declared")
            deletes += DeleteFileEntry(relocate(declared), fmt, fileContent, entrySeq, eqCols)
          }
        }
      }
    }
    Snapshot(snapId, longField1(chosen \ "sequence-number", 0L),
      jlong(chosen \ "timestamp-ms"), schema, files.toSeq, deletes.toSeq)
  }

  // ------------------------------------------------------------ read

  def read(spark: SparkSession, tableLocation: String, travel: Option[String] = None): DataFrame = {
    val snap = snapshot(tableLocation, travel)
    (snap.files.map(f => (f.path, f.format)) ++ snap.deletes.map(d => (d.path, d.format)))
      .foreach { case (p, f) =>
        require(f == "parquet", s"unsupported Iceberg file format: $f ($p)")
      }
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else if (snap.deletes.isEmpty)
      spark.read.schema(snap.schema).parquet(snap.files.map(_.path): _*)
    else
      applyDeletes(spark, snap)
  }

  /** Merge-on-read: the data scan minus the snapshot's delete files.
    * Shapes as two (or three) anti-joins, each a shuffle keyed by its
    * join columns — no driver materialization, delete sets stay
    * distributed. The only broadcast is the one-row-per-data-file
    * lookup mapping scan URIs to declared paths + sequence numbers. */
  private def applyDeletes(spark: SparkSession, snap: Snapshot): DataFrame = {
    val outCols = snap.schema.fieldNames.map(col).toSeq
    val base = spark.read.schema(snap.schema).parquet(snap.files.map(_.path): _*)
      .withColumn("__gf_uri", col("_metadata.file_path"))
      .withColumn("__gf_pos", col("_metadata.row_index"))
    val lookup = spark.createDataFrame(snap.files.map(f =>
        (scanUri(f.path), f.declaredPath, f.sequenceNumber)))
      .toDF("__gf_uri", "__gf_decl", "__gf_seq")
    var cur = base.join(broadcast(lookup), Seq("__gf_uri"), "left")

    // position deletes: (file_path, pos) → (declared path, row_index).
    // File paths are unique (never reused across snapshots), so the
    // path+pos join needs no sequence-number restriction.
    val posDeletes = snap.deletes.filter(_.content == 1)
    if (posDeletes.nonEmpty) {
      val pd = spark.read.parquet(posDeletes.map(_.path): _*)
        .select(col("file_path").as("__gf_decl"), col("pos").as("__gf_pos"))
      cur = cur.join(pd, Seq("__gf_decl", "__gf_pos"), "left_anti")
    }

    // equality deletes: null-safe match on the equality columns, applied
    // only to rows whose data sequence number is STRICTLY below the
    // delete's — rows (re-)appended after the delete survive.
    snap.deletes.filter(_.content == 2)
      .groupBy(d => (d.sequenceNumber, d.equalityCols)).toSeq
      .sortBy(_._1._1)
      .foreach { case ((dseq, eqCols), dfs) =>
        val eq = spark.read.parquet(dfs.map(_.path): _*)
          .select(eqCols.map(c => col(c).as(s"__gf_eq_$c")): _*)
          .distinct()
        val cond = eqCols.map(c => cur(c) <=> eq(s"__gf_eq_$c")).reduce(_ && _) &&
          cur("__gf_seq") < lit(dseq)
        cur = cur.join(eq, cond, "left_anti")
      }
    cur.select(outCols: _*)
  }

  /** the URI rendering Spark's `_metadata.file_path` uses for local
    * files — `file:/abs/path`, java.io.File.toURI form (NOT nio's
    * `file:///abs/path`) */
  private def scanUri(p: String): String =
    if (graft.sources.io.ByteStore.hasScheme(p)) p
    else new java.io.File(p).toURI.toString

  // ------------------------------------------------------------ avro

  private def readAvro(path: String): Seq[GenericRecord] = {
    // manifests are small metadata objects: one remote readAll each
    val r = DataFileReader.openReader(
      new org.apache.avro.file.SeekableByteArrayInput(
        graft.sources.io.ByteStore.readAll(path)),
      new GenericDatumReader[GenericRecord]())
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
  private def intListField(r: GenericRecord, name: String): Seq[Int] =
    if (r.getSchema.getField(name) == null || r.get(name) == null) Nil
    else r.get(name).asInstanceOf[java.util.List[_]].asScala.toSeq
      .map(_.asInstanceOf[Number].intValue())
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
    * round-trip tests and gate fixtures: unpartitioned appends plus
    * position/equality delete commits, one manifest per snapshot. Data
    * files are written by Spark's parquet writer; record counts come
    * from the parquet footers (no extra job). Snapshot ids are
    * sequential for deterministic fixtures. */
  object Writer {

    private final case class NewFile(
        path: String, content: Int, recordCount: Long, equalityIds: Seq[Int])

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
        |{"name":"file_size_in_bytes","type":"long"},
        |{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}]}}]}""".stripMargin)

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

    /** stage `df` as parquet and move the part files into data/ with the
      * given name prefix; returns (path, rowCount) per file */
    private def stageParquet(spark: SparkSession, df: DataFrame, table: Path,
        prefix: String): Seq[(String, Long)] = {
      val dataDir = table.resolve("data")
      Files.createDirectories(dataDir)
      val tmp = Files.createTempDirectory(table, ".stage")
      df.write.mode("overwrite").parquet(tmp.toString)
      val staged = listDir(tmp.toString)
        .map(Paths.get(_))
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p)).toVector
      val out = staged.map { p =>
        val dest = dataDir.resolve(
          s"$prefix-${java.util.UUID.randomUUID().toString.take(8)}-${p.getFileName}")
        Files.move(p, dest)
        (dest.toString, parquetRowCount(spark, dest.toString))
      }
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      out
    }

    /** append `df` as a new snapshot; returns the new snapshot id */
    def append(spark: SparkSession, df: DataFrame, tableLocation: String): Long = {
      val files = stageParquet(spark, df, Paths.get(tableLocation), "data")
      commit(spark, tableLocation, df.schema,
        files.map { case (p, n) => NewFile(p, 0, n, Nil) }, "append")
    }

    /** Commit a position-delete snapshot removing the current rows that
      * match `predicate`. The delete file is built distributed — scan →
      * filter → broadcast-join the per-file lookup — and written sorted
      * by (file_path, pos) as the spec asks. */
    def deleteWhere(spark: SparkSession, tableLocation: String, predicate: String): Long = {
      val snap = IcebergSource.snapshot(tableLocation)
      require(snap.files.nonEmpty, s"nothing to delete from: $tableLocation")
      val lookup = spark.createDataFrame(snap.files.map(f =>
          (scanUri(f.path), f.declaredPath)))
        .toDF("__gf_uri", "file_path")
      val pd = spark.read.schema(snap.schema).parquet(snap.files.map(_.path): _*)
        .withColumn("__gf_uri", col("_metadata.file_path"))
        .withColumn("pos", col("_metadata.row_index"))
        .filter(predicate)
        .join(broadcast(lookup), Seq("__gf_uri"))
        .select(col("file_path"), col("pos"))
        .sort("file_path", "pos")
      val files = stageParquet(spark, pd, Paths.get(tableLocation), "delete-pos")
      commit(spark, tableLocation, snap.schema,
        files.map { case (p, n) => NewFile(p, 1, n, Nil) }, "delete")
    }

    /** Commit an equality-delete snapshot: any existing row matching one
      * of `values`' rows on all of its columns is deleted; rows appended
      * afterwards are untouched (sequence-number semantics). */
    def equalityDelete(spark: SparkSession, tableLocation: String, values: DataFrame): Long = {
      val snap = IcebergSource.snapshot(tableLocation)
      val ids = values.columns.toSeq.map { c =>
        val i = snap.schema.fieldIndex(c) // field ids are ordinal+1 (see commit)
        i + 1
      }
      val files = stageParquet(spark, values, Paths.get(tableLocation), "delete-eq")
      commit(spark, tableLocation, snap.schema,
        files.map { case (p, n) => NewFile(p, 2, n, ids) }, "delete")
    }

    /** shared commit: one manifest for the new files, manifest list =
      * prior snapshot's manifests + the new one, new metadata json */
    private def commit(spark: SparkSession, tableLocation: String, schema: StructType,
        newFiles: Seq[NewFile], operation: String): Long = {
      val table = Paths.get(tableLocation)
      val metaDir = Paths.get(metadataDir(tableLocation))
      Files.createDirectories(metaDir)
      require(newFiles.nonEmpty, "empty commit")
      val isDelete = newFiles.exists(_.content != 0)
      require(newFiles.forall(f => (f.content != 0) == isDelete),
        "mixed data+delete commit not supported")

      val prior: Option[(JValue, Snapshot)] =
        if (listDir(metaDir.toString).exists(_.endsWith(".metadata.json"))) {
          val m = JsonMethods.parse(
            graft.sources.io.ByteStore.readString(resolveMetadataFile(tableLocation)))
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

      // ---- manifest for this snapshot
      val manifestPath = metaDir.resolve(s"manifest-$snapId-m0.avro")
      val entries = newFiles.map { f =>
        val dfr = new GenericData.Record(
          manifestEntrySchema.getField("data_file").schema())
        dfr.put("content", f.content)
        dfr.put("file_path", f.path)
        dfr.put("file_format", "PARQUET")
        dfr.put("partition", new GenericData.Record(
          dfr.getSchema.getField("partition").schema()))
        dfr.put("record_count", f.recordCount)
        dfr.put("file_size_in_bytes", Files.size(Paths.get(f.path)))
        if (f.equalityIds.nonEmpty)
          dfr.put("equality_ids", f.equalityIds.map(Integer.valueOf).asJava)
        val e = new GenericData.Record(manifestEntrySchema)
        e.put("status", 1) // added
        e.put("snapshot_id", snapId)
        e.put("sequence_number", seq)
        e.put("file_sequence_number", seq)
        e.put("data_file", dfr)
        e
      }
      val manifestLen = writeAvro(manifestPath, manifestEntrySchema, entries,
        Map("format-version" -> "2", "content" -> (if (isDelete) "deletes" else "data")))

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
      mf.put("content", if (isDelete) 1 else 0)
      mf.put("sequence_number", seq)
      mf.put("min_sequence_number", seq)
      mf.put("added_snapshot_id", snapId)
      mf.put("added_files_count", newFiles.size)
      mf.put("existing_files_count", 0)
      mf.put("deleted_files_count", 0)
      mf.put("added_rows_count", newFiles.map(_.recordCount).sum)
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

      // ---- metadata json (field ids are ordinal+1 — equalityDelete
      // relies on this when resolving columns to ids)
      val now = java.lang.System.currentTimeMillis()
      val schemaFields = schema.fields.zipWithIndex.map { case (f, i) =>
        JObject("id" -> JInt(i + 1), "name" -> JString(f.name),
          "required" -> JBool(false), "type" -> JString(icebergTypeOf(f.dataType)))
      }.toList
      val newSnap = JObject(
        "snapshot-id" -> JLong(snapId),
        "sequence-number" -> JLong(seq),
        "timestamp-ms" -> JLong(now),
        "schema-id" -> JInt(0),
        "manifest-list" -> JString(listPath.toString),
        "summary" -> JObject("operation" -> JString(operation)))
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
        "last-column-id" -> JInt(schema.size),
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
