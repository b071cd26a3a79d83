package graft.sources.delta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Delta Lake read support without the connector jar: a pure-JVM reader
  * of the open Delta transaction-log protocol (PROTOCOL.md), driving
  * Spark's native parquet scan for the data files.
  *
  * Mirrors the reference's `read_delta(location [, version_or_ts])`
  * table function (beacon-delta/src/table_function.rs:1-6): one table
  * directory (not a glob), optional time travel by integer version or
  * RFC-3339 timestamp.
  *
  * Snapshot reconstruction:
  *  - start from the newest parquet checkpoint at version ≤ target
  *    (`_last_checkpoint` is a hint only; the listing is authoritative),
  *  - replay the JSON commits after it in version order,
  *  - `add` puts a file, `remove` deletes it, `metaData` replaces the
  *    schema/partitioning (schemaString IS Spark StructType JSON).
  *
  * The scan is ONE parquet relation over a [[graft.sources.io.ManifestFileIndex]]
  * built from the snapshot's add actions: partition values live in the
  * index (typed, decoded once per distinct tuple), so the plan is O(1) in
  * partition count and partition predicates prune in-memory against the
  * log — no directory listing, no per-partition plan branches.
  * Data-column predicates and projection push into the parquet scan as
  * usual.
  *
  * At 100 TB the log (not the data) is the driver-side cost: the active
  * set is O(file count) driver memory, same stance as delta-rs.
  *
  * Modern writer features handled rather than rejected:
  *  - deletion vectors (writer v7 default on Databricks): each add's DV
  *    descriptor is decoded ON THE EXECUTORS (z85 + roaring, see
  *    [[DeletionVectors]]) into (file, row_index) rows and anti-joined
  *    against the scan — the driver never materializes a delete set;
  *  - column mapping mode `name`: data files are scanned under the
  *    fields' `delta.columnMapping.physicalName` and renamed back to
  *    logical names (mode `id` — parquet field-id resolution — is still
  *    rejected, not guessed).
  */
object DeltaSource {

  final case class AddFile(
      path: String, partitionValues: Map[String, String],
      deletionVector: Option[DeletionVectors.Descriptor] = None,
      size: Long = 0L, modificationTime: Long = 0L)
  final case class Snapshot(
      version: Long,
      dataSchema: StructType,
      partitionColumns: Seq[String],
      files: Seq[AddFile],
      columnMappingMode: String = "none")

  private val logDir = "_delta_log"

  // log access goes through ByteStore: a Delta table on any
  // Hadoop-configured scheme (s3a://, hdfs://) replays the same way
  private def listDir(dir: String): Seq[String] =
    graft.sources.io.ByteStore.list(dir)
  private val commitRe = """(\d{20})\.json""".r
  private val checkpointRe = """(\d{20})\.checkpoint\.parquet""".r

  // ------------------------------------------------------------- log

  private def listLog(table: String): (Seq[(Long, String)], Seq[(Long, String)]) = {
    val dir = graft.sources.io.ByteStore.resolve(table, logDir)
    require(graft.sources.io.ByteStore.isDirectory(dir),
      s"not a Delta table (no $logDir): $table")
    val entries = listDir(dir)
    val commits = entries.flatMap { p =>
      graft.sources.io.ByteStore.fileName(p) match {
        case commitRe(v) => Some(v.toLong -> p)
        case _ => None
      }
    }.sortBy(_._1)
    val checkpoints = entries.flatMap { p =>
      graft.sources.io.ByteStore.fileName(p) match {
        case checkpointRe(v) => Some(v.toLong -> p)
        case _ => None
      }
    }.sortBy(_._1)
    (commits, checkpoints)
  }

  /** commit timestamp for time travel: commitInfo.timestamp when the
    * commit carries one, else the log file's modification time */
  private def commitMillis(v: Long, p: String): Long = {
    val fromInfo = graft.sources.io.ByteStore.readString(p)
      .split('\n').iterator.filter(_.trim.nonEmpty)
      .map(JsonMethods.parse(_))
      .collectFirst(Function.unlift { j =>
        (j \ "commitInfo" \ "timestamp") match {
          case JInt(t) => Some(t.toLong)
          case JLong(t) => Some(t)
          case _ => None
        }
      })
    fromInfo.getOrElse(graft.sources.io.ByteStore.mtime(p))
  }

  def resolveVersion(tablePath: String, travel: Option[String]): Long = {
    val (commits, _) = listLog(tablePath)
    resolveVersionFrom(tablePath, commits, travel)
  }

  private def resolveVersionFrom(
      tablePath: String, commits: Seq[(Long, String)], travel: Option[String]): Long = {
    require(commits.nonEmpty, s"empty Delta log at $tablePath")
    travel match {
      case None => commits.last._1
      case Some(t) if t.matches("""\d+""") =>
        val v = t.toLong
        require(commits.exists(_._1 == v), s"version $v not in Delta log (have ${commits.map(_._1).mkString(",")})")
        v
      case Some(ts) =>
        val cutoff = java.time.OffsetDateTime.parse(ts).toInstant.toEpochMilli
        val eligible = commits.takeWhile { case (v, p) => commitMillis(v, p) <= cutoff }
        require(eligible.nonEmpty, s"no Delta version at or before $ts")
        eligible.last._1
    }
  }

  def snapshot(spark: SparkSession, tablePath: String, travel: Option[String] = None): Snapshot = {
    val (commits, checkpoints) = listLog(tablePath)
    val version = resolveVersionFrom(tablePath, commits, travel)

    var schema: StructType = null
    var partCols: Seq[String] = Seq.empty
    var mappingMode: String = "none"
    val active = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]

    def applyMeta(schemaString: String, partitionColumns: Seq[String], mode: String): Unit = {
      require(mode == "none" || mode == "name" || mode == "id",
        s"Delta column mapping mode '$mode' not supported by this reader (none/name/id)")
      schema = DataType.fromJson(schemaString).asInstanceOf[StructType]
      partCols = partitionColumns
      mappingMode = mode
    }
    def applyAdd(path: String, pv: Map[String, String],
        dv: Option[DeletionVectors.Descriptor], size: Long, modTime: Long): Unit =
      active(path) = AddFile(path, pv, dv, size, modTime)
    def applyRemove(path: String): Unit = active.remove(path)

    // newest checkpoint at or before the target version
    val cp = checkpoints.filter(_._1 <= version).lastOption
    cp.foreach { case (_, p) =>
      // a checkpoint is parquet rows of the same actions; driver-side
      // via Spark's reader (bounded by file count, not data size)
      val rows = spark.read.parquet(p).collect()
      val s = if (rows.isEmpty) new StructType() else rows.head.schema
      def struct(r: org.apache.spark.sql.Row, f: String): Option[org.apache.spark.sql.Row] =
        if (s.fieldNames.contains(f) && !r.isNullAt(s.fieldIndex(f)))
          Some(r.getStruct(s.fieldIndex(f))) else None
      rows.foreach { r =>
        struct(r, "metaData").foreach { m =>
          val mode =
            if (m.schema.fieldNames.contains("configuration") &&
              !m.isNullAt(m.fieldIndex("configuration")))
              Option(m.getAs[scala.collection.Map[String, String]]("configuration"))
                .flatMap(_.get("delta.columnMapping.mode")).getOrElse("none")
            else "none"
          // Row collection getters hand back mutable wrappers: convert
          applyMeta(m.getAs[String]("schemaString"),
            Option(m.getAs[scala.collection.Seq[String]]("partitionColumns"))
              .map(_.toSeq).getOrElse(Seq.empty), mode)
        }
        struct(r, "add").foreach { a =>
          val dv =
            if (a.schema.fieldNames.contains("deletionVector") &&
              !a.isNullAt(a.fieldIndex("deletionVector"))) {
              val d = a.getStruct(a.fieldIndex("deletionVector"))
              Some(DeletionVectors.Descriptor(
                d.getAs[String]("storageType"), d.getAs[String]("pathOrInlineDv"),
                if (d.schema.fieldNames.contains("offset") &&
                  !d.isNullAt(d.fieldIndex("offset"))) d.getAs[Number]("offset").intValue else 0,
                d.getAs[Number]("sizeInBytes").intValue,
                d.getAs[Number]("cardinality").longValue))
            } else None
          def num(f: String): Long =
            if (a.schema.fieldNames.contains(f) && !a.isNullAt(a.fieldIndex(f)))
              a.getAs[Number](f).longValue else 0L
          applyAdd(a.getAs[String]("path"),
            Option(a.getAs[scala.collection.Map[String, String]]("partitionValues"))
              .map(_.toMap).getOrElse(Map.empty), dv, num("size"), num("modificationTime"))
        }
        struct(r, "remove").foreach(rm => applyRemove(rm.getAs[String]("path")))
      }
    }

    // replay JSON commits after the checkpoint
    val from = cp.map(_._1).getOrElse(-1L)
    commits.filter { case (v, _) => v > from && v <= version }.foreach { case (_, p) =>
      graft.sources.io.ByteStore.readString(p)
        .split('\n').iterator.filter(_.trim.nonEmpty).foreach { line =>
        val j = JsonMethods.parse(line)
        (j \ "metaData") match {
          case m: JObject =>
            val JString(ss) = (m \ "schemaString"): @unchecked
            val pcs = (m \ "partitionColumns") match {
              case JArray(xs) => xs.collect { case JString(c) => c }
              case _ => Seq.empty
            }
            val mode = (m \ "configuration" \ "delta.columnMapping.mode") match {
              case JString(mm) => mm
              case _ => "none"
            }
            applyMeta(ss, pcs, mode)
          case _ =>
        }
        (j \ "add") match {
          case a: JObject =>
            val JString(path) = (a \ "path"): @unchecked
            val dv = (a \ "deletionVector") match {
              case d: JObject =>
                def s(f: String) = (d \ f) match { case JString(v) => v; case _ => "" }
                def i(f: String, dflt: Int) = (d \ f) match {
                  case JInt(v) => v.toInt; case JLong(v) => v.toInt; case _ => dflt
                }
                Some(DeletionVectors.Descriptor(
                  s("storageType"), s("pathOrInlineDv"),
                  i("offset", 0), i("sizeInBytes", 0), i("cardinality", 0).toLong))
              case _ => None
            }
            val pv = (a \ "partitionValues") match {
              case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
              case _ => Map.empty[String, String]
            }
            def num(f: String): Long = (a \ f) match {
              case JInt(v) => v.toLong; case JLong(v) => v; case _ => 0L
            }
            applyAdd(path, pv, dv, num("size"), num("modificationTime"))
          case _ =>
        }
        (j \ "remove") match {
          case rm: JObject =>
            val JString(path) = (rm \ "path"): @unchecked
            applyRemove(path)
          case _ =>
        }
      }
    }
    require(schema != null, s"Delta log at $tablePath has no metaData action")
    Snapshot(version, schema, partCols, active.values.toSeq, mappingMode)
  }

  // ------------------------------------------------------------ read

  def read(spark: SparkSession, tablePath: String, travel: Option[String] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, travel)
    // column mapping: scan under each field's physical name, rename
    // back to the logical name (partitionValues keys and data file
    // columns both use physical names). Mode 'id' additionally stamps
    // `parquet.field.id` on the requested schema, so Spark's parquet
    // reader resolves columns BY FIELD ID (fieldId.read.enabled in
    // GraftSession) — files whose physical names predate a rename still
    // bind correctly, the id-mode contract.
    val mapped = snap.columnMappingMode == "name" || snap.columnMappingMode == "id"
    def physName(f: StructField): String =
      if (mapped && f.metadata.contains("delta.columnMapping.physicalName"))
        f.metadata.getString("delta.columnMapping.physicalName")
      else f.name
    def scanField(f: StructField): StructField = {
      val md =
        if (snap.columnMappingMode == "id" && f.metadata.contains("delta.columnMapping.id"))
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("parquet.field.id", f.metadata.getLong("delta.columnMapping.id")).build()
        else org.apache.spark.sql.types.Metadata.empty
      StructField(physName(f), f.dataType, nullable = true, md)
    }
    val physByLogical = snap.dataSchema.fields.map(f => f.name -> physName(f)).toMap
    val dataFields = snap.dataSchema.fields.filterNot(f => snap.partitionColumns.contains(f.name))
    val dataSchema = StructType(dataFields.map(scanField))
    val outCols = snap.dataSchema.fields.toSeq.map(f => col(physByLogical(f.name)).as(f.name))

    def abs(p: String): String = {
      val decoded = java.net.URLDecoder.decode(p, "UTF-8")
      if (decoded.startsWith("/") || decoded.contains("://")) decoded
      else if (graft.sources.io.ByteStore.hasScheme(tablePath))
        graft.sources.io.ByteStore.resolve(tablePath, decoded)
      else Paths.get(tablePath).resolve(decoded).toString
    }

    if (snap.files.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.dataSchema)
    }

    val hasDv = snap.files.exists(_.deletionVector.isDefined)

    // ONE parquet relation over a manifest FileIndex: the plan is O(1) in
    // partition count (a 10k-partition table is still a single scan node),
    // and partition predicates prune in-memory against the log's
    // partitionValues via ManifestFileIndex.listFiles — the listing-table
    // shape the reference builds for Delta
    // (beacon-datafusion-ext/src/listing_factory.rs). Partition values are
    // decoded once per distinct tuple; sizes come from the add actions
    // (Spark splits tasks by FileStatus.getLen) with a stat() fallback for
    // logs that omitted them.
    val partSchema = StructType(snap.partitionColumns.map { c =>
      val f = snap.dataSchema(c)
      StructField(physByLogical(c), f.dataType, nullable = true)
    })
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    def pv0(m: Map[String, String], c: String): String =
      m.get(physByLogical(c)).orElse(m.get(c)).orNull
    val entries = snap.files.map { f =>
      val p0 = abs(f.path)
      // qualify local paths: _metadata.file_path reflects the FileStatus
      // path verbatim, and the DV anti-join matches on that URI
      val p = if (graft.sources.io.ByteStore.hasScheme(p0)) p0
        else new java.io.File(p0).toURI.toString
      val size = if (f.size > 0) f.size else graft.sources.io.ByteStore.size(p0)
      // keys in partitionValues use physical names under column mapping;
      // normalize to the partition schema's (physical) field names
      val pv = snap.partitionColumns.map { c =>
        physByLogical(c) -> pv0(f.partitionValues, c)
      }.toMap
      (pv, graft.sources.io.ManifestFileIndex.Entry(p, size, f.modificationTime))
    }
    val index = new graft.sources.io.ManifestFileIndex(
      new org.apache.hadoop.fs.Path(tablePath), partSchema,
      graft.sources.io.ManifestFileIndex.group(partSchema, entries, tz))
    val base0 = org.apache.spark.sql.graft.RelationBridge
      .parquetRelation(spark, index, partSchema, dataSchema)
    val base = if (hasDv)
      base0.withColumn("__gf_uri", col("_metadata.file_path"))
        .withColumn("__gf_pos", col("_metadata.row_index"))
    else base0
    val unioned = base.select(outCols ++
      (if (hasDv) Seq(col("__gf_uri"), col("__gf_pos")) else Nil): _*)
    if (!hasDv) unioned
    else {
      // deletion vectors: descriptors are tiny and ship to the executors,
      // where each one decodes (z85 → roaring) into its (file, row_index)
      // delete rows — one task per DV, no driver materialization — and the
      // union anti-joins them away on (file, position).
      import spark.implicits._
      val dvEntries = snap.files.collect { case AddFile(p, _, Some(d), _, _) =>
        // Spark's _metadata.file_path form: file:/ URI locally, the
        // scheme URI as-is for remote tables
        val uri = if (graft.sources.io.ByteStore.hasScheme(abs(p))) abs(p)
          else new java.io.File(abs(p)).toURI.toString
        (uri, d.storageType, d.pathOrInlineDv, d.offset, d.sizeInBytes, d.cardinality)
      }
      val tableAbs = if (graft.sources.io.ByteStore.hasScheme(tablePath)) tablePath
        else Paths.get(tablePath).toAbsolutePath.toString
      val dvRows = spark.createDataset(dvEntries)
        .flatMap { case (uri, st, poi, off, size, card) =>
          DeletionVectors.deletedRows(tableAbs,
            DeletionVectors.Descriptor(st, poi, off, size, card)).map(pos => (uri, pos))
        }.toDF("__gf_uri", "__gf_pos")
      unioned.join(dvRows, Seq("__gf_uri", "__gf_pos"), "left_anti")
        .drop("__gf_uri", "__gf_pos")
    }
  }

  // ----------------------------------------------------------- write

  /** Minimal Delta writer — enough protocol to produce real logs for
    * round-trip tests and fixtures: append / overwrite commits, a
    * logical delete (rewrite kept rows, remove old files), and parquet
    * checkpoints. Data files are written by Spark's parquet writer. */
  object Writer {
    private def nextVersion(table: Path): Long = {
      val dir = table.resolve(logDir)
      if (!Files.isDirectory(dir)) { Files.createDirectories(dir); return 0L }
      val vs = listDir(dir.toString).flatMap(p =>
        graft.sources.io.ByteStore.fileName(p) match {
          case commitRe(v) => Some(v.toLong); case _ => None })
      if (vs.isEmpty) 0L else vs.max + 1
    }

    private def jstr(s: String): String = JsonMethods.compact(JString(s))

    private def writeCommit(table: Path, version: Long, actions: Seq[String]): Unit = {
      val p = table.resolve(logDir).resolve(f"$version%020d.json")
      Files.write(p, actions.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    }

    private def metaActions(df: DataFrame, partitionColumns: Seq[String]): Seq[String] = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"graft-${java.util.UUID.randomUUID()}","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(df.schema.json)},""" +
        s""""partitionColumns":[${partitionColumns.map(jstr).mkString(",")}],"configuration":{}}}""")

    /** stage `df` as parquet data files under the table dir; returns
      * (relative path, partitionValues, size) per written file */
    private def stage(df: DataFrame, table: Path,
        partitionColumns: Seq[String]): Seq[(String, Map[String, String], Long)] = {
      val tmp = Files.createTempDirectory(table, ".stage")
      val w = df.write.mode("overwrite")
      (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
        .parquet(tmp.toString)
      val staged = Files.walk(tmp).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p)).toSeq
      val out = staged.map { p =>
        val rel = tmp.relativize(p).toString
        // hive-style dirs carry the partition values: a=1/b=x/part-….parquet
        val pv = rel.split('/').dropRight(1).flatMap { seg =>
          val i = seg.indexOf('=')
          if (i > 0) Some(seg.substring(0, i) ->
            java.net.URLDecoder.decode(seg.substring(i + 1), "UTF-8"))
          else None
        }.toMap
        val flatName = s"part-${java.util.UUID.randomUUID().toString.take(8)}-${p.getFileName}"
        val dest = table.resolve(flatName)
        val size = Files.size(p)
        Files.move(p, dest)
        (flatName, pv, size)
      }
      deleteRec(tmp)
      out
    }

    private def deleteRec(p: Path): Unit = {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }

    private def addAction(path: String, pv: Map[String, String],
        size: Long, dv: Option[DeletionVectors.Descriptor] = None): String = {
      val pvj = pv.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
      val dvj = dv.map { d =>
        s""","deletionVector":{"storageType":${jstr(d.storageType)},""" +
          s""""pathOrInlineDv":${jstr(d.pathOrInlineDv)},"offset":${d.offset},""" +
          s""""sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
      }.getOrElse("")
      s"""{"add":{"path":${jstr(path)},"partitionValues":$pvj,"size":$size,""" +
        s""""modificationTime":${System.currentTimeMillis()},"dataChange":true$dvj}}"""
    }
    private def removeAction(path: String): String =
      s"""{"remove":{"path":${jstr(path)},"deletionTimestamp":${System.currentTimeMillis()},"dataChange":true}}"""
    private def infoAction(op: String): String =
      s"""{"commitInfo":{"timestamp":${System.currentTimeMillis()},"operation":${jstr(op)}}}"""

    def append(df: DataFrame, tablePath: String, partitionColumns: Seq[String] = Seq.empty): Long = {
      val table = Paths.get(tablePath)
      Files.createDirectories(table)
      val v = nextVersion(table)
      val adds = stage(df, table, partitionColumns).map { case (p, pv, sz) => addAction(p, pv, sz) }
      val meta = if (v == 0L) metaActions(df, partitionColumns) else Seq.empty
      writeCommit(table, v, infoAction("WRITE") +: (meta ++ adds))
      v
    }

    /** INSERT OVERWRITE: replace the table contents — removes every
      * current file and adds the new data in one commit */
    def overwrite(spark: SparkSession, df: DataFrame, tablePath: String,
        partitionColumns: Seq[String] = Seq.empty): Long = {
      val table = Paths.get(tablePath)
      Files.createDirectories(table)
      val v = nextVersion(table)
      val removes =
        if (v == 0L) Seq.empty
        else DeltaSource.snapshot(spark, tablePath).files.map(f => removeAction(f.path))
      val adds = stage(df, table, partitionColumns).map { case (p, pv, sz) => addAction(p, pv, sz) }
      val meta = metaActions(df, partitionColumns) // overwrite may change the schema
      writeCommit(table, v, infoAction("WRITE") +: (meta ++ removes ++ adds))
      v
    }

    /** Merge-on-read DELETE WHERE: instead of rewriting data files,
      * attach a deletion vector to each touched file (the writer-v7
      * shape Databricks produces by default). Matching row indexes are
      * found with the scan's `_metadata.row_index`, serialized as one
      * roaring-bitmap DV block per file in a single
      * `deletion_vector_<uuid>.bin`, and committed as re-adds. */
    def dvDeleteWhere(spark: SparkSession, tablePath: String, predicateSql: String): Long = {
      val table = Paths.get(tablePath)
      val snap = DeltaSource.snapshot(spark, tablePath)
      require(snap.columnMappingMode == "none",
        "dvDeleteWhere fixture writer supports unmapped tables only")
      def abs(p: String): String = table.resolve(p).toString
      val uriToRel = snap.files.map(f => new java.io.File(abs(f.path)).toURI.toString -> f.path).toMap
      val dataSchema = StructType(snap.dataSchema.fields
        .filterNot(f => snap.partitionColumns.contains(f.name)))
      // fixture-scale collect: positions of rows being deleted
      val hit = spark.read.schema(dataSchema).parquet(snap.files.map(f => abs(f.path)): _*)
        .withColumn("__uri", col("_metadata.file_path"))
        .withColumn("__pos", col("_metadata.row_index"))
        .filter(expr(predicateSql))
        .select("__uri", "__pos").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // merge with any DV already on the file (compounding deletes)
      val priorRows: Map[String, Array[Long]] = snap.files.collect {
        case AddFile(p, _, Some(d), _, _) =>
          p -> DeletionVectors.deletedRows(table.toAbsolutePath.toString, d)
      }.toMap
      val perFile = hit.groupBy(h => uriToRel(h._1)).map { case (rel, hs) =>
        rel -> (hs.map(_._2) ++ priorRows.getOrElse(rel, Array.empty[Long])).distinct.sorted
      }.toSeq.sortBy(_._1)
      require(perFile.nonEmpty, s"DELETE matched no rows: $predicateSql")
      val descs = DeletionVectors.writeFile(table, perFile).toMap
      val byPath = snap.files.map(f => f.path -> f).toMap
      val adds = descs.toSeq.sortBy(_._1).map { case (rel, d) =>
        addAction(rel, byPath(rel).partitionValues, byPath(rel).size, Some(d))
      }
      val v = nextVersion(table)
      writeCommit(table, v, infoAction("DELETE") +: adds)
      v
    }

    /** append under column mapping mode `name` or `id`: data files
      * carry the physical names (with parquet field ids under `id` —
      * fieldId.write.enabled stamps them from the metadata), the
      * schemaString carries the logical→physical metadata — the shape
      * mapping-enabled writers produce */
    def appendWithColumnMapping(df: DataFrame, tablePath: String,
        physicalNames: Map[String, String], mode: String = "name"): Long = {
      require(mode == "name" || mode == "id", s"column mapping mode $mode")
      val table = Paths.get(tablePath)
      Files.createDirectories(table)
      val v = nextVersion(table)
      require(v == 0L, "column-mapping fixture writer only creates new tables")
      val mapped = StructType(df.schema.fields.zipWithIndex.map { case (f, i) =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString("delta.columnMapping.physicalName",
            physicalNames.getOrElse(f.name, f.name))
          .putLong("delta.columnMapping.id", i + 1L).build())
      })
      val physical = df.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
        val c = col(f.name).as(physicalNames.getOrElse(f.name, f.name))
        if (mode == "id")
          c.as(physicalNames.getOrElse(f.name, f.name),
            new MetadataBuilder().putLong("parquet.field.id", i + 1L).build())
        else c
      }: _*)
      val adds = stage(physical, table, Seq.empty).map { case (p, pv, sz) => addAction(p, pv, sz) }
      val meta = Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"graft-${java.util.UUID.randomUUID()}","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${jstr(mapped.json)},"partitionColumns":[],""" +
          s""""configuration":{"delta.columnMapping.mode":"$mode","delta.columnMapping.maxColumnId":"${df.schema.size}"}}}""")
      writeCommit(table, v, infoAction("WRITE") +: (meta ++ adds))
      v
    }

    /** logical DELETE WHERE: rewrite kept rows into new files, remove
      * every current file — one atomic commit */
    def deleteWhere(spark: SparkSession, tablePath: String, predicateSql: String): Long = {
      val table = Paths.get(tablePath)
      val snap = DeltaSource.snapshot(spark, tablePath)
      val kept = DeltaSource.read(spark, tablePath)
        .filter(!coalesce(expr(predicateSql), lit(false)))
      val adds = stage(kept, table, snap.partitionColumns).map { case (p, pv, sz) => addAction(p, pv, sz) }
      val removes = snap.files.map(f => removeAction(f.path))
      val v = nextVersion(table)
      writeCommit(table, v, infoAction("DELETE") +: (removes ++ adds))
      v
    }

    /** parquet checkpoint of the current snapshot + _last_checkpoint */
    def checkpoint(spark: SparkSession, tablePath: String): Unit = {
      import spark.implicits._
      val table = Paths.get(tablePath)
      val snap = DeltaSource.snapshot(spark, tablePath)
      val meta = (null: String, null: Map[String, String],
        snap.dataSchema.json, snap.partitionColumns,
        null: DeletionVectors.Descriptor, 0L)
      val rows = snap.files.map(f =>
        (f.path, f.partitionValues, null: String, null: Seq[String],
          f.deletionVector.orNull, f.size)) :+ meta
      val confJ = typedLit(Map(
        "delta.columnMapping.mode" -> snap.columnMappingMode))
      val df = rows.toDF("_path", "_pv", "_schema", "_pcols", "_dv", "_size").select(
        when($"_path".isNotNull, struct(
          $"_path".as("path"), $"_pv".as("partitionValues"),
          $"_size".as("size"), lit(System.currentTimeMillis()).as("modificationTime"),
          lit(true).as("dataChange"),
          $"_dv".as("deletionVector"))).as("add"),
        when($"_schema".isNotNull, struct(
          lit("graft").as("id"), $"_schema".as("schemaString"),
          $"_pcols".as("partitionColumns"), confJ.as("configuration"))).as("metaData"))
      val tmp = Files.createTempDirectory(table, ".ckpt")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Paths.get(listDir(tmp.toString)
        .find(_.endsWith(".parquet")).get)
      // the checkpoint names the version it snapshots — NOT nextVersion-1,
      // which would mislabel it if a writer committed after `snap` was read
      val v = snap.version
      Files.move(part, table.resolve(logDir).resolve(f"$v%020d.checkpoint.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      deleteRec(tmp)
      Files.write(table.resolve(logDir).resolve("_last_checkpoint"),
        s"""{"version":$v,"size":${snap.files.size + 1}}""".getBytes(StandardCharsets.UTF_8))
    }
  }
}
