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
  private def localPath(p: String): String = p.stripPrefix("file:")

  /** Supported lattice: the scalar types the engine's tables use. */
  private def arrowToSpark(f: AField): DataType = f.getType match {
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
    case other => throw new IllegalArgumentException(s"unsupported arrow type: $other")
  }

  private def sparkToArrow(name: String, t: DataType): AField = {
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

  private def readGroup(spark: SparkSession, schema: StructType, files: Seq[String]): DataFrame = {
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap(f => readFileRows(f, schema))
    spark.createDataFrame(rdd, schema)
  }

  /** Executor-side: stream batches from one file lazily — one record
    * batch resides in memory at a time, so a multi-GB IPC file never
    * materializes in the task (resources close on exhaustion and, for
    * partially-consumed iterators, on task completion). */
  private def readFileRows(path0: String, schema: StructType): Iterator[Row] = {
    val path = localPath(path0)
    val alloc = new RootAllocator()
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    val reader = new ArrowFileReader(ch, alloc)
    val root = reader.getVectorSchemaRoot
    var closed = false
    def closeAll(): Unit = if (!closed) {
      closed = true
      reader.close(); ch.close(); alloc.close()
    }
    // a limit/take can drop the iterator mid-file: clean up at task end
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
    new Iterator[Row] {
      private var vectors: Array[FieldVector] = _
      private var batchRows = 0
      private var i = 0
      private def advance(): Boolean = {
        if (closed) return false
        while (i >= batchRows) {
          if (!reader.loadNextBatch()) { closeAll(); return false }
          batchRows = root.getRowCount
          vectors = schema.fields.map(f => root.getVector(f.name))
          i = 0
        }
        true
      }
      override def hasNext: Boolean = advance()
      override def next(): Row = {
        if (!advance()) throw new NoSuchElementException("end of arrow file")
        val row = Row.fromSeq(vectors.toIndexedSeq.map(v => readValue(v, i)))
        i += 1
        row
      }
    }
  }

  private def readValue(v: FieldVector, i: Int): Any = {
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector   => x.get(i)
      case x: IntVector      => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: TinyIntVector  => x.get(i)
      case x: Float8Vector   => x.get(i)
      case x: Float4Vector   => x.get(i)
      case x: VarCharVector  => new String(x.get(i), java.nio.charset.StandardCharsets.UTF_8)
      case x: BitVector      => x.get(i) == 1
      case x: TimeStampMicroVector =>
        java.time.LocalDateTime.ofEpochSecond(0, 0, java.time.ZoneOffset.UTC)
          .plusNanos(x.get(i) * 1000L)
      case x: TimeStampMicroTZVector =>
        java.time.Instant.EPOCH.plusNanos(x.get(i) * 1000L)
      case x: VarBinaryVector => x.get(i)
      case other => throw new IllegalArgumentException(
        s"unsupported arrow vector: ${other.getClass.getSimpleName}")
    }
  }

  // ----------------------------------------------------------- write

  /** Single IPC file from the driver (bounded memory: row iterator,
    * batched flushes). */
  /** @return number of rows written (the COPY TO row receipt) */
  def writeSingleFile(df: DataFrame, path: String, batchSize: Int = 4096): Long = {
    val schema = df.schema
    val aschema = new ASchema(schema.fields.map(f => sparkToArrow(f.name, f.dataType)).toList.asJava)
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(aschema, alloc)
    val ch = FileChannel.open(Paths.get(path),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    val writer = new ArrowFileWriter(root, null, ch)
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
    } finally { writer.close(); ch.close(); root.close(); alloc.close() }
  }

  private def writeValue(v: FieldVector, i: Int, value: Any, t: DataType): Unit = {
    if (value == null) v match {
      case x: BaseFixedWidthVector    => x.setNull(i)
      case x: BaseVariableWidthVector => x.setNull(i)
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
      case other => throw new IllegalArgumentException(
        s"unsupported arrow vector: ${other.getClass.getSimpleName}")
    }
  }
}
