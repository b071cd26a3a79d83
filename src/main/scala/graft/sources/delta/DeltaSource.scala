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
  * The scan itself is one Spark parquet relation per distinct partition
  * tuple, with the partition values injected as literal columns and the
  * branches unioned. Filters on partition columns constant-fold per
  * branch and the optimizer drops dead branches entirely — real
  * partition pruning with no custom FileIndex. Data-column predicates
  * and projection push into the parquet scan as usual.
  *
  * At 100 TB the log (not the data) is the driver-side cost: the active
  * set is O(file count) driver memory, same stance as delta-rs. Not
  * supported (detected and rejected, not silently wrong): deletion
  * vectors, column mapping.
  */
object DeltaSource {

  final case class AddFile(path: String, partitionValues: Map[String, String])
  final case class Snapshot(
      version: Long,
      dataSchema: StructType,
      partitionColumns: Seq[String],
      files: Seq[AddFile])

  private val logDir = "_delta_log"

  /** Files.list with a closed stream (a leaked DirectoryStream costs an
    * fd until finalization) */
  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toVector finally s.close()
  }
  private val commitRe = """(\d{20})\.json""".r
  private val checkpointRe = """(\d{20})\.checkpoint\.parquet""".r

  // ------------------------------------------------------------- log

  private def listLog(table: Path): (Seq[(Long, Path)], Seq[(Long, Path)]) = {
    val dir = table.resolve(logDir)
    require(Files.isDirectory(dir), s"not a Delta table (no $logDir): $table")
    val entries = listDir(dir)
    val commits = entries.flatMap { p =>
      p.getFileName.toString match {
        case commitRe(v) => Some(v.toLong -> p)
        case _ => None
      }
    }.sortBy(_._1)
    val checkpoints = entries.flatMap { p =>
      p.getFileName.toString match {
        case checkpointRe(v) => Some(v.toLong -> p)
        case _ => None
      }
    }.sortBy(_._1)
    (commits, checkpoints)
  }

  /** commit timestamp for time travel: commitInfo.timestamp when the
    * commit carries one, else the log file's modification time */
  private def commitMillis(v: Long, p: Path): Long = {
    val fromInfo = Files.readAllLines(p, StandardCharsets.UTF_8).asScala.iterator
      .map(JsonMethods.parse(_))
      .collectFirst(Function.unlift { j =>
        (j \ "commitInfo" \ "timestamp") match {
          case JInt(t) => Some(t.toLong)
          case JLong(t) => Some(t)
          case _ => None
        }
      })
    fromInfo.getOrElse(Files.getLastModifiedTime(p).toMillis)
  }

  def resolveVersion(tablePath: String, travel: Option[String]): Long = {
    val (commits, _) = listLog(Paths.get(tablePath))
    resolveVersionFrom(tablePath, commits, travel)
  }

  private def resolveVersionFrom(
      tablePath: String, commits: Seq[(Long, Path)], travel: Option[String]): Long = {
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
    val table = Paths.get(tablePath)
    val (commits, checkpoints) = listLog(table)
    val version = resolveVersionFrom(tablePath, commits, travel)

    var schema: StructType = null
    var partCols: Seq[String] = Seq.empty
    val active = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]

    def applyMeta(schemaString: String, partitionColumns: Seq[String]): Unit = {
      schema = DataType.fromJson(schemaString).asInstanceOf[StructType]
      partCols = partitionColumns
    }
    def applyAdd(path: String, pv: Map[String, String]): Unit =
      active(path) = AddFile(path, pv)
    def applyRemove(path: String): Unit = active.remove(path)
    def reject(feature: String, on: Boolean): Unit =
      require(!on, s"Delta feature not supported by this reader: $feature")

    // newest checkpoint at or before the target version
    val cp = checkpoints.filter(_._1 <= version).lastOption
    cp.foreach { case (_, p) =>
      // a checkpoint is parquet rows of the same actions; driver-side
      // via Spark's reader (bounded by file count, not data size)
      val rows = spark.read.parquet(p.toString).collect()
      val s = if (rows.isEmpty) new StructType() else rows.head.schema
      def struct(r: org.apache.spark.sql.Row, f: String): Option[org.apache.spark.sql.Row] =
        if (s.fieldNames.contains(f) && !r.isNullAt(s.fieldIndex(f)))
          Some(r.getStruct(s.fieldIndex(f))) else None
      rows.foreach { r =>
        struct(r, "metaData").foreach { m =>
          // Row collection getters hand back mutable wrappers: convert
          applyMeta(m.getAs[String]("schemaString"),
            Option(m.getAs[scala.collection.Seq[String]]("partitionColumns"))
              .map(_.toSeq).getOrElse(Seq.empty))
        }
        struct(r, "add").foreach { a =>
          reject("deletionVectors",
            a.schema.fieldNames.contains("deletionVector") && !a.isNullAt(a.fieldIndex("deletionVector")))
          applyAdd(a.getAs[String]("path"),
            Option(a.getAs[scala.collection.Map[String, String]]("partitionValues"))
              .map(_.toMap).getOrElse(Map.empty))
        }
        struct(r, "remove").foreach(rm => applyRemove(rm.getAs[String]("path")))
      }
    }

    // replay JSON commits after the checkpoint
    val from = cp.map(_._1).getOrElse(-1L)
    commits.filter { case (v, _) => v > from && v <= version }.foreach { case (_, p) =>
      Files.readAllLines(p, StandardCharsets.UTF_8).asScala.filter(_.trim.nonEmpty).foreach { line =>
        val j = JsonMethods.parse(line)
        (j \ "metaData") match {
          case m: JObject =>
            val JString(ss) = (m \ "schemaString"): @unchecked
            val pcs = (m \ "partitionColumns") match {
              case JArray(xs) => xs.collect { case JString(c) => c }
              case _ => Seq.empty
            }
            reject("columnMapping", (m \ "configuration" \ "delta.columnMapping.mode") match {
              case JString(mode) => mode != "none"
              case _ => false
            })
            applyMeta(ss, pcs)
          case _ =>
        }
        (j \ "add") match {
          case a: JObject =>
            val JString(path) = (a \ "path"): @unchecked
            reject("deletionVectors", (a \ "deletionVector").isInstanceOf[JObject])
            val pv = (a \ "partitionValues") match {
              case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
              case _ => Map.empty[String, String]
            }
            applyAdd(path, pv)
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
    Snapshot(version, schema, partCols, active.values.toSeq)
  }

  // ------------------------------------------------------------ read

  def read(spark: SparkSession, tablePath: String, travel: Option[String] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, travel)
    val dataFields = snap.dataSchema.fields.filterNot(f => snap.partitionColumns.contains(f.name))
    val dataSchema = StructType(dataFields)
    val outCols = snap.dataSchema.fieldNames.toSeq

    def abs(p: String): String = {
      val decoded = java.net.URLDecoder.decode(p, "UTF-8")
      if (decoded.startsWith("/") || decoded.contains("://")) decoded
      else Paths.get(tablePath).resolve(decoded).toString
    }

    if (snap.files.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.dataSchema)
    }

    // one branch per distinct partition tuple: partition values become
    // literal columns, so partition predicates constant-fold per branch
    // and pruned branches vanish from the physical plan
    val groups = snap.files.groupBy(_.partitionValues).toSeq
    val branches = groups.map { case (pv, files) =>
      val base = spark.read.schema(dataSchema).parquet(files.map(f => abs(f.path)): _*)
      val withParts = snap.partitionColumns.foldLeft(base) { (df, c) =>
        val dt = snap.dataSchema(c).dataType
        val v = pv.get(c).orNull
        df.withColumn(c, (if (v == null) lit(null) else lit(v)).cast(dt))
      }
      withParts.select(outCols.map(col): _*)
    }
    branches.reduce(_ unionAll _)
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
      val vs = listDir(dir).flatMap(p =>
        p.getFileName.toString match { case commitRe(v) => Some(v.toLong); case _ => None })
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
      * (relative path, partitionValues) per written file */
    private def stage(df: DataFrame, table: Path,
        partitionColumns: Seq[String]): Seq[(String, Map[String, String])] = {
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
        Files.move(p, dest)
        flatName -> pv
      }
      deleteRec(tmp)
      out
    }

    private def deleteRec(p: Path): Unit = {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }

    private def addAction(path: String, pv: Map[String, String]): String = {
      val pvj = pv.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
      s"""{"add":{"path":${jstr(path)},"partitionValues":$pvj,"size":0,""" +
        s""""modificationTime":${System.currentTimeMillis()},"dataChange":true}}"""
    }
    private def removeAction(path: String): String =
      s"""{"remove":{"path":${jstr(path)},"deletionTimestamp":${System.currentTimeMillis()},"dataChange":true}}"""
    private def infoAction(op: String): String =
      s"""{"commitInfo":{"timestamp":${System.currentTimeMillis()},"operation":${jstr(op)}}}"""

    def append(df: DataFrame, tablePath: String, partitionColumns: Seq[String] = Seq.empty): Long = {
      val table = Paths.get(tablePath)
      Files.createDirectories(table)
      val v = nextVersion(table)
      val adds = stage(df, table, partitionColumns).map { case (p, pv) => addAction(p, pv) }
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
      val adds = stage(df, table, partitionColumns).map { case (p, pv) => addAction(p, pv) }
      val meta = metaActions(df, partitionColumns) // overwrite may change the schema
      writeCommit(table, v, infoAction("WRITE") +: (meta ++ removes ++ adds))
      v
    }

    /** logical DELETE WHERE: rewrite kept rows into new files, remove
      * every current file — one atomic commit */
    def deleteWhere(spark: SparkSession, tablePath: String, predicateSql: String): Long = {
      val table = Paths.get(tablePath)
      val snap = DeltaSource.snapshot(spark, tablePath)
      val kept = DeltaSource.read(spark, tablePath)
        .filter(!coalesce(expr(predicateSql), lit(false)))
      val adds = stage(kept, table, snap.partitionColumns).map { case (p, pv) => addAction(p, pv) }
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
        snap.dataSchema.json, snap.partitionColumns)
      val rows = snap.files.map(f => (f.path, f.partitionValues, null: String, null: Seq[String])) :+ meta
      val df = rows.toDF("_path", "_pv", "_schema", "_pcols").select(
        when($"_path".isNotNull, struct(
          $"_path".as("path"), $"_pv".as("partitionValues"),
          lit(0L).as("size"), lit(System.currentTimeMillis()).as("modificationTime"),
          lit(true).as("dataChange"))).as("add"),
        when($"_schema".isNotNull, struct(
          lit("graft").as("id"), $"_schema".as("schemaString"),
          $"_pcols".as("partitionColumns"))).as("metaData"))
      val tmp = Files.createTempDirectory(table, ".ckpt")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = listDir(tmp)
        .find(_.toString.endsWith(".parquet")).get
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
