package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field => AField, Schema => ASchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ATimeUnit}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.{SuperType, UnionByName}

/** Arrow IPC (Feather v2 / .arrow) source and sink — `read_arrow` and
  * the `arrow` output in the reference (beacon-arrow-ipc; SURVEY §2.1).
  * Built directly on arrow-vector (ships with Spark).
  *
  * Read path: the file list is distributed one-file-per-task; each task
  * opens its file locally and streams record batches → rows, so a
  * many-file archive scans partition-parallel (partition = file; the
  * batch loop never materializes the file). Schemas merge through the
  * same supercast lattice as every other multi-file scan.
  *
  * Write path: one IPC file per partition (distributed), or a single
  * file written from the driver via `toLocalIterator` when a single
  * artifact is required (single-file writers are inherently driver-side
  * — same stance as the reference's NetCDF writer, SURVEY §7.3.6).
  */
object ArrowSource {

  /** glob expansion yields scheme-qualified URIs; arrow-vector needs a
    * local filesystem path (non-local stores would go through a Hadoop
    * input stream wrapper here) */
  /** remote granules localize to the executor cache; `file:` strips */
  private def localPath(p: String): String = graft.sources.io.ByteStore.localize(p)

  /** Supported lattice: the scalar types the engine's tables use, plus
    * lists of them (the embedding columns) and day dates. */
  private[graft] def arrowToSpark(f: AField): DataType = f.getType match {
    case t: ArrowType.Int if t.getBitWidth == 64 => LongType
    case t: ArrowType.Int if t.getBitWidth == 32 => IntegerType
    case t: ArrowType.Int if t.getBitWidth == 16 => ShortType
    case t: ArrowType.Int                        => ByteType
    case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case _: ArrowType.FloatingPoint              => FloatType
    case _: ArrowType.Utf8                       => StringType
    case _: ArrowType.Bool                       => BooleanType
    case _: ArrowType.Timestamp                  => TimestampNTZType
    case _: ArrowType.Binary                     => BinaryType
    case d: ArrowType.Date if d.getUnit == org.apache.arrow.vector.types.DateUnit.DAY => DateType
    case _: ArrowType.List =>
      ArrayType(arrowToSpark(f.getChildren.get(0)), containsNull = true)
    case other => throw new IllegalArgumentException(s"unsupported arrow type: $other")
  }

  private[graft] def sparkToArrow(name: String, t: DataType): AField = t match {
    case ArrayType(et, _) =>
      new AField(name,
        org.apache.arrow.vector.types.pojo.FieldType.nullable(ArrowType.List.INSTANCE),
        java.util.Collections.singletonList(sparkToArrow("element", et)))
    case _ =>
      val at: ArrowType = t match {
        case LongType         => new ArrowType.Int(64, true)
        case IntegerType      => new ArrowType.Int(32, true)
        case ShortType        => new ArrowType.Int(16, true)
        case ByteType         => new ArrowType.Int(8, true)
        case DoubleType       => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case FloatType        => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case StringType       => new ArrowType.Utf8()
        case BooleanType      => ArrowType.Bool.INSTANCE
        case TimestampNTZType => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, null)
        case TimestampType    => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, "UTC")
        case BinaryType       => new ArrowType.Binary()
        case DateType         => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
        case other => throw new IllegalArgumentException(s"unsupported spark type for arrow: $other")
      }
      AField.nullable(name, at)
  }

  def schemaOf(path0: String): StructType = {
    val path = localPath(path0)
    val alloc = new RootAllocator()
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val reader = new ArrowFileReader(ch, alloc)
      val fields = reader.getVectorSchemaRoot.getSchema.getFields.asScala
        .map(f => StructField(f.getName, arrowToSpark(f), f.isNullable))
      StructType(fields.toSeq)
    } finally { ch.close(); alloc.close() }
  }

  /** Read one or more IPC files (with glob support) into a DataFrame. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val files = FileCollection.expandGlobs(spark, paths)
    require(files.nonEmpty, s"no files match: ${paths.mkString(",")}")
    val schemas = files.map(f => f -> schemaOf(f))
    val merged = SuperType.superTypeSchemaScan(schemas.map(_._2))
    val bySchema = schemas.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val parts = bySchema.toSeq.map { case (schema, groupFiles) =>
      UnionByName.project(readGroup(spark, schema, groupFiles), merged)
    }
    parts.reduce(_ union _)
  }

  /** one same-schema file group through the vectorized DSv2 scan */
  private def readGroup(spark: SparkSession, schema: StructType, files: Seq[String]): DataFrame =
    spark.read.format("graft.sources.ArrowTableProvider")
      .option("files", org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(
          org.json4s.JArray(files.toList.map(org.json4s.JString(_))))))
      .load()

  // ----------------------------------------------------------- write

  /** Single IPC file from the driver (bounded memory: row iterator,
    * batched flushes). */
  /** @return number of rows written (the COPY TO row receipt) */
  def writeSingleFile(df: DataFrame, path: String, batchSize: Int = 4096): Long = {
    val schema = df.schema
    val aschema = new ASchema(schema.fields.map(f => sparkToArrow(f.name, f.dataType)).toList.asJava)
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(aschema, alloc)
    val (local, publish) = graft.sources.io.ByteStore.stageOut(path)
    val ch = FileChannel.open(local,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    val writer = new ArrowFileWriter(root, null, ch)
    val written = try {
      writer.start()
      val it = df.toLocalIterator().asScala
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      def flush(): Unit = if (buf.nonEmpty) {
        root.allocateNew()
        var i = 0
        buf.foreach { row =>
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            writeValue(root.getVector(c), i, if (row.isNullAt(c)) null else row.get(c), f.dataType)
          }
          i += 1
        }
        root.setRowCount(buf.length)
        writer.writeBatch()
        buf.clear()
      }
      var n = 0L
      it.foreach { row =>
        buf += row
        n += 1
        if (buf.length >= batchSize) flush()
      }
      flush()
      writer.end()
      n
    } finally { writer.close(); ch.close(); root.close(); alloc.close() }
    publish()
    written
  }

  /** Single IPC STREAM (not file) onto an already-open byte sink — the
    * remote transport's result framing ([[graft.remote.RemoteServer]]):
    * same bounded-memory row loop as [[writeSingleFile]], but the
    * stream format is socket-friendly (self-delimiting, end-of-stream
    * marker, no footer seek). Caller owns the output stream.
    *
    * Failure contract: if the Spark job feeding `toLocalIterator`
    * throws mid-stream, the Arrow end-of-stream marker is NOT written
    * (writer.end/close are skipped), so a reader can never mistake a
    * truncated result for a clean short one — it fails on the cut
    * stream instead. On success the EOS marker is written and the row
    * count returned, which the server frames as a trailing completion
    * receipt the client verifies. */
  private[graft] def writeIpcStream(df: DataFrame, out: java.io.OutputStream,
      batchSize: Int = 4096): Long = {
    val schema = df.schema
    val aschema = new ASchema(schema.fields.map(f => sparkToArrow(f.name, f.dataType)).toList.asJava)
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(aschema, alloc)
    // the caller owns `out` (and writes a completion receipt after the
    // Arrow bytes) — the writer must not close the socket under it
    val underlying = out
    val noClose = new java.io.FilterOutputStream(underlying) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        underlying.write(b, off, len)
      override def close(): Unit = underlying.flush()
    }
    val writer = new org.apache.arrow.vector.ipc.ArrowStreamWriter(root, null,
      java.nio.channels.Channels.newChannel(noClose))
    var failed = false
    try {
      writer.start()
      val it = df.toLocalIterator().asScala
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      def flush(): Unit = if (buf.nonEmpty) {
        root.allocateNew()
        var i = 0
        buf.foreach { row =>
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            writeValue(root.getVector(c), i, if (row.isNullAt(c)) null else row.get(c), f.dataType)
          }
          i += 1
        }
        root.setRowCount(buf.length)
        writer.writeBatch()
        buf.clear()
      }
      var n = 0L
      it.foreach { row =>
        buf += row
        n += 1
        if (buf.length >= batchSize) flush()
      }
      flush()
      writer.end()
      n
    } catch {
      case t: Throwable => failed = true; throw t
    } finally {
      // on failure, closing the writer would append the EOS marker to a
      // half-written stream — leave the stream visibly truncated instead
      if (!failed) writer.close()
      try root.close() catch { case scala.util.control.NonFatal(_) => }
      try alloc.close() catch { case _: Throwable => /* outstanding buffers on failure */ }
    }
  }

  private def writeValue(v: FieldVector, i: Int, value: Any, t: DataType): Unit = {
    if (value == null) v match {
      case x: BaseFixedWidthVector    => x.setNull(i)
      case x: BaseVariableWidthVector => x.setNull(i)
      case x: org.apache.arrow.vector.complex.ListVector => x.setNull(i)
      case other => throw new IllegalArgumentException(
        s"cannot set null on ${other.getClass.getSimpleName}")
    }
    else v match {
      case x: BigIntVector   => x.setSafe(i, value.asInstanceOf[Long])
      case x: IntVector      => x.setSafe(i, value.asInstanceOf[Int])
      case x: SmallIntVector => x.setSafe(i, value.asInstanceOf[Short])
      case x: TinyIntVector  => x.setSafe(i, value.asInstanceOf[Byte])
      case x: Float8Vector   => x.setSafe(i, value.asInstanceOf[Double])
      case x: Float4Vector   => x.setSafe(i, value.asInstanceOf[Float])
      case x: VarCharVector  => x.setSafe(i,
        value.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case x: BitVector      => x.setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
      case x: TimeStampMicroVector =>
        val ldt = value.asInstanceOf[java.time.LocalDateTime]
        x.setSafe(i, ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000)
      case x: TimeStampMicroTZVector =>
        val inst = value match {
          case ts: java.sql.Timestamp => ts.toInstant
          case in: java.time.Instant => in
        }
        x.setSafe(i, inst.getEpochSecond * 1000000L + inst.getNano / 1000)
      case x: VarBinaryVector => x.setSafe(i, value.asInstanceOf[Array[Byte]])
      case x: DateDayVector =>
        val days = value match {
          case d: java.sql.Date       => d.toLocalDate.toEpochDay.toInt
          case ld: java.time.LocalDate => ld.toEpochDay.toInt
        }
        x.setSafe(i, days)
      case x: org.apache.arrow.vector.complex.ListVector =>
        val et = t.asInstanceOf[ArrayType].elementType
        val elems: Seq[Any] = value match {
          case s: scala.collection.Seq[_] => s.toSeq
          case a: Array[_]                => a.toSeq
          case other => throw new IllegalArgumentException(
            s"unsupported array value: ${other.getClass.getSimpleName}")
        }
        val start = x.startNewValue(i)
        val child = x.getDataVector.asInstanceOf[FieldVector]
        var j = 0
        elems.foreach { e =>
          require(e != null, "null array elements are not supported in arrow egress")
          writeValue(child, start + j, e, et)
          j += 1
        }
        x.endValue(i, elems.length)
      case other => throw new IllegalArgumentException(
        s"unsupported arrow vector: ${other.getClass.getSimpleName}")
    }
  }
}

/** Arrow IPC DataSourceV2: partition = file, and each record batch
  * surfaces as a ColumnarBatch of [[org.apache.spark.sql.vectorized.ArrowColumnVector]]s
  * wrapping the loaded arrow vectors directly — zero value conversion
  * between the IPC buffers and Spark's columnar execution; scans feed
  * WholeStageCodegen through ColumnarToRow. One batch resides in
  * memory at a time (the streaming stance of the previous row-based
  * reader, kept), and resources close at partition end.
  */
class ArrowTableProvider extends org.apache.spark.sql.connector.catalog.TableProvider {
  import org.apache.spark.sql.util.CaseInsensitiveStringMap
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArrowSource.schemaOf(ArrowScanSpec.of(options).files.head)
  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table =
    new ArrowTable(ArrowScanSpec.of(
      new CaseInsensitiveStringMap(properties)), schema)
  override def supportsExternalMetadata(): Boolean = true
}

final case class ArrowScanSpec(files: Seq[String])
object ArrowScanSpec {
  def of(options: org.apache.spark.sql.util.CaseInsensitiveStringMap): ArrowScanSpec = {
    val raw = Option(options.get("files"))
      .getOrElse(throw new IllegalArgumentException("arrow: 'files' option required"))
    org.json4s.jackson.JsonMethods.parse(raw) match {
      case org.json4s.JArray(fs) =>
        ArrowScanSpec(fs.collect { case org.json4s.JString(s) => s })
      case other => throw new IllegalArgumentException(s"arrow: bad files option: $other")
    }
  }
}

class ArrowTable(spec: ArrowScanSpec, schema0: StructType)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  override def name(): String =
    s"arrow(${spec.files.head}${if (spec.files.size > 1) s" +${spec.files.size - 1}" else ""})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new ArrowScanBuilder(spec, schema0)
}

class ArrowScanBuilder(spec: ArrowScanSpec, fullSchema: StructType)
    extends org.apache.spark.sql.connector.read.ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = {
    if (requiredSchema.nonEmpty) required = requiredSchema
  }
  override def build(): org.apache.spark.sql.connector.read.Scan =
    new ArrowScan(spec, required)
}

class ArrowScan(spec: ArrowScanSpec, required: StructType)
    extends org.apache.spark.sql.connector.read.Scan
    with org.apache.spark.sql.connector.read.Batch {
  import org.apache.spark.sql.connector.read._
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    spec.files.map(f => ArrowFilePartition(f, required): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = new ArrowReaderFactory
}

final case class ArrowFilePartition(file: String, required: StructType)
    extends org.apache.spark.sql.connector.read.InputPartition

class ArrowReaderFactory extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.connector.read._
  import org.apache.spark.sql.vectorized.ColumnarBatch
  override def supportColumnarReads(p: InputPartition): Boolean = true
  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    throw new UnsupportedOperationException("arrow scan is columnar-only")
  override def createColumnarReader(p0: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = p0.asInstanceOf[ArrowFilePartition]
    new PartitionReader[ColumnarBatch] {
      import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector}
      private val alloc = new RootAllocator()
      private val ch = graft.sources.io.ByteStore.openLocalChannel(p.file)
      private val reader = new ArrowFileReader(ch, alloc)
      private val root = reader.getVectorSchemaRoot
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        if (!reader.loadNextBatch()) return false
        val vectors: Array[ColumnVector] = p.required.fields.map { f =>
          val v = root.getVector(f.name)
          require(v != null, s"arrow file ${p.file} lacks column ${f.name}")
          new ArrowColumnVector(v): ColumnVector
        }
        batch = new ColumnarBatch(vectors, root.getRowCount)
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = { reader.close(); ch.close(); alloc.close() }
    }
  }
}
