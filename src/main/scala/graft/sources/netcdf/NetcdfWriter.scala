package graft.sources.netcdf

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, length, max}
import org.apache.spark.sql.types._

import graft.nd.NdDataset
import NetcdfClassic._

/** NetCDF classic (CDF-2) writers — the reference's `netcdf` (flat,
  * record-oriented; query/output.rs:188-204) and the binary half of
  * `ndnetcdf` (multi-dimensional; output.rs:205-221, fed by
  * [[graft.nd.NdPivot]]).
  *
  * Single-file writers are inherently driver-side (netcdf has no
  * parallel append); memory stays bounded: the flat writer streams
  * `toLocalIterator` rows straight into the record section, one record
  * in memory at a time — the same stance as the reference's sink
  * (beacon-arrow-netcdf/src/datafusion/sink.rs buffers batches to a
  * local temp file for the same reason).
  *
  * Type mapping (documented divergences):
  *  - Long → NC_DOUBLE (classic has no 64-bit int; exact to 2^53)
  *  - Timestamp → NC_DOUBLE microseconds since epoch + CF units attr
  *    (µs-as-double is exact until ~2255, so round-trips are lossless)
  *  - Date → NC_INT days since epoch + CF units attr
  *  - String → NC_CHAR matrix (record × per-column max length)
  *  - numeric NULL → _FillValue (NaN for floating, sentinel for ints)
  */
object NetcdfWriter {

  private val FILL_BYTE = -127.0
  private val FILL_SHORT = -32767.0
  private val FILL_INT = -2147483647.0

  private final case class ColSpec(
      name: String, ncType: Int, strLen: Int,
      attrs: Seq[(String, Either[String, Double])],
      toDouble: Any => Double)

  private def spec(f: StructField, strLen: Int): ColSpec = f.dataType match {
    case ByteType => ColSpec(f.name, NC_BYTE, 0,
      Seq("_FillValue" -> Right(FILL_BYTE)), v => v.asInstanceOf[Byte].toDouble)
    case BooleanType => ColSpec(f.name, NC_BYTE, 0,
      Seq("_FillValue" -> Right(FILL_BYTE)),
      v => if (v.asInstanceOf[Boolean]) 1.0 else 0.0)
    case ShortType => ColSpec(f.name, NC_SHORT, 0,
      Seq("_FillValue" -> Right(FILL_SHORT)), v => v.asInstanceOf[Short].toDouble)
    case IntegerType => ColSpec(f.name, NC_INT, 0,
      Seq("_FillValue" -> Right(FILL_INT)), v => v.asInstanceOf[Int].toDouble)
    case DateType => ColSpec(f.name, NC_INT, 0,
      Seq("_FillValue" -> Right(FILL_INT),
        "units" -> Left("days since 1970-01-01")),
      {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toDouble
        case d: java.time.LocalDate => d.toEpochDay.toDouble
      })
    case FloatType => ColSpec(f.name, NC_FLOAT, 0,
      Seq("_FillValue" -> Right(Double.NaN)), v => v.asInstanceOf[Float].toDouble)
    case DoubleType => ColSpec(f.name, NC_DOUBLE, 0,
      Seq("_FillValue" -> Right(Double.NaN)), v => v.asInstanceOf[Double])
    case LongType => ColSpec(f.name, NC_DOUBLE, 0,
      Seq("_FillValue" -> Right(Double.NaN)), v => v.asInstanceOf[Long].toDouble)
    case TimestampNTZType => ColSpec(f.name, NC_DOUBLE, 0,
      Seq("_FillValue" -> Right(Double.NaN),
        "units" -> Left("microseconds since 1970-01-01 00:00:00")),
      { case t: java.time.LocalDateTime =>
          (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L).toDouble })
    case TimestampType => ColSpec(f.name, NC_DOUBLE, 0,
      Seq("_FillValue" -> Right(Double.NaN),
        "units" -> Left("microseconds since 1970-01-01 00:00:00")),
      {
        case t: java.sql.Timestamp =>
          (t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L).toDouble
        case i: java.time.Instant =>
          (i.getEpochSecond * 1000000L + i.getNano / 1000L).toDouble
      })
    case StringType => ColSpec(f.name, NC_CHAR, math.max(1, strLen), Nil, null)
    case other => throw new IllegalArgumentException(
      s"netcdf writer: unsupported column type ${other.simpleString} for ${f.name}")
  }

  /** Flat record-oriented file: every column a variable on one record
    * dimension. */
  /** @return number of records written (the COPY TO row receipt) */
  def writeFlat(df: DataFrame, path: String, recordDim: String = "obs"): Long = {
    val schema = df.schema
    // one aggregate pass for string column widths (projection-pruned scan)
    val strCols = schema.fields.filter(_.dataType == StringType).map(_.name)
    val strLens: Map[String, Int] =
      if (strCols.isEmpty) Map.empty
      else {
        val aggs = strCols.map(c => max(length(col(c))).as(c))
        val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        strCols.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(i)) 1 else math.max(1, r.getInt(i)))
        }.toMap
      }
    val specs = schema.fields.map(f => spec(f, strLens.getOrElse(f.name, 1))).toSeq

    // dims: record dim first, then one strlen dim per char column
    val dims: Seq[(String, Int)] =
      (recordDim, 0) +: specs.filter(_.ncType == NC_CHAR)
        .map(s => (s"${s.name}_strlen", s.strLen))
    val dimIdx = dims.map(_._1).zipWithIndex.toMap

    val varDims: Seq[Seq[Int]] = specs.map { s =>
      if (s.ncType == NC_CHAR) Seq(0, dimIdx(s"${s.name}_strlen")) else Seq(0)
    }

    val perRec: Seq[Int] = specs.map(s =>
      if (s.ncType == NC_CHAR) s.strLen else typeSize(s.ncType))
    val single = specs.length == 1
    val slots: Seq[Int] = perRec.map(n => if (single) n else pad4i(n))
    val recBytes = slots.sum

    val header = buildHeader(numrecs = 0, dims,
      globalAttrs = Nil,
      vars = specs.zipWithIndex.map { case (s, i) =>
        HVar(s.name, varDims(i), s.attrs, s.ncType,
          vsize = slots(i).toLong, begin = 0L)
      })
    // patch begins now that the header length is known
    var off = header.length.toLong
    val begins = slots.map { n => val b = off; off += n; b }
    val finalHeader = buildHeader(0, dims, Nil,
      specs.zipWithIndex.map { case (s, i) =>
        HVar(s.name, varDims(i), s.attrs, s.ncType, slots(i).toLong, begins(i))
      })
    require(finalHeader.length == header.length, "header size must be stable")

    val (local, publish) = graft.sources.io.ByteStore.stageOut(path)
    val ch = FileChannel.open(local, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    val written = try {
      val out = new DataOutputStream(new BufferedOutputStream(
        java.nio.channels.Channels.newOutputStream(ch), 1 << 16))
      out.write(finalHeader)
      var n = 0L
      val rec = new Array[Byte](recBytes)
      df.toLocalIterator().asScala.foreach { row =>
        java.util.Arrays.fill(rec, 0.toByte)
        val bb = java.nio.ByteBuffer.wrap(rec).order(java.nio.ByteOrder.BIG_ENDIAN)
        var slot = 0
        specs.zipWithIndex.foreach { case (s, i) =>
          bb.position(slot)
          if (s.ncType == NC_CHAR) {
            val str = if (row.isNullAt(i)) "" else row.getString(i)
            val bytes = str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            bb.put(bytes, 0, math.min(bytes.length, s.strLen))
          } else {
            val d =
              if (row.isNullAt(i)) s.attrs.collectFirst {
                case ("_FillValue", Right(f)) => f
              }.getOrElse(Double.NaN)
              else s.toDouble(row.get(i))
            writeNum(bb, s.ncType, d)
          }
          slot += slots(i)
        }
        out.write(rec)
        n += 1
      }
      out.flush()
      // patch numrecs at offset 4
      val nb = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.BIG_ENDIAN)
      nb.putInt(n.toInt); nb.flip()
      ch.write(nb, 4)
      n
    } finally ch.close()
    publish()
    written
  }

  /** Multi-dimensional file from an [[NdDataset]] (ndnetcdf output):
    * fixed dims, coordinate + data variables, attributes verbatim. */
  def writeNd(ds: NdDataset, path: String): Unit = {
    val dims = ds.dims
    val dimIdx = dims.map(_._1).zipWithIndex.toMap
    val vars = ds.variables.map { v =>
      require(!v.isString, s"ndnetcdf writer: string variable ${v.name} unsupported")
      val attrs = v.attrs.toSeq.map { case (k, value) =>
        k -> (scala.util.Try(value.toDouble).toOption match {
          case Some(d) => Right(d): Either[String, Double]
          case None    => Left(value): Either[String, Double]
        })
      }
      HVar(v.name, v.dims.map(dimIdx), attrs, NC_DOUBLE,
        vsize = pad4i(v.data.length * 8).toLong, begin = 0L)
    }
    val gattrs = ds.globalAttrs.toSeq.map { case (k, v) =>
      k -> (Left(v): Either[String, Double])
    }
    val h0 = buildHeader(0, dims, gattrs, vars)
    var off = h0.length.toLong
    val begins = vars.map { v => val b = off; off += v.vsize; b }
    val header = buildHeader(0, dims, gattrs,
      vars.zip(begins).map { case (v, b) => v.copy(begin = b) })
    val (local, publish) = graft.sources.io.ByteStore.stageOut(path)
    val ch = FileChannel.open(local, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    try {
      val out = new DataOutputStream(new BufferedOutputStream(
        java.nio.channels.Channels.newOutputStream(ch), 1 << 16))
      out.write(header)
      ds.variables.foreach { v =>
        v.data.foreach(out.writeDouble)
        var pad = pad4i(v.data.length * 8) - v.data.length * 8
        while (pad > 0) { out.writeByte(0); pad -= 1 }
      }
      out.flush()
    } finally ch.close()
    publish()
  }

  // --------------------------------------------------- header building

  private final case class HVar(name: String, dimIds: Seq[Int],
      attrs: Seq[(String, Either[String, Double])], ncType: Int,
      vsize: Long, begin: Long)

  private def pad4i(n: Int): Int = (n + 3) / 4 * 4

  private def buildHeader(numrecs: Int, dims: Seq[(String, Int)],
      globalAttrs: Seq[(String, Either[String, Double])],
      vars: Seq[HVar]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeByte('C'); o.writeByte('D'); o.writeByte('F'); o.writeByte(2) // CDF-2
    o.writeInt(numrecs)
    // dim_list
    if (dims.isEmpty) { o.writeInt(0); o.writeInt(0) }
    else {
      o.writeInt(0x0A); o.writeInt(dims.length)
      dims.foreach { case (n, sz) => writeName(o, n); o.writeInt(sz) }
    }
    writeAttrList(o, globalAttrs)
    if (vars.isEmpty) { o.writeInt(0); o.writeInt(0) }
    else {
      o.writeInt(0x0B); o.writeInt(vars.length)
      vars.foreach { v =>
        writeName(o, v.name)
        o.writeInt(v.dimIds.length)
        v.dimIds.foreach(o.writeInt)
        writeAttrList(o, v.attrs)
        o.writeInt(v.ncType)
        o.writeInt(v.vsize.toInt)
        o.writeLong(v.begin) // CDF-2: 64-bit begin
      }
    }
    o.flush()
    bos.toByteArray
  }

  private def writeName(o: DataOutputStream, n: String): Unit = {
    val b = n.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    o.writeInt(b.length)
    o.write(b)
    var pad = pad4i(b.length) - b.length
    while (pad > 0) { o.writeByte(0); pad -= 1 }
  }

  private def writeAttrList(o: DataOutputStream,
      attrs: Seq[(String, Either[String, Double])]): Unit = {
    if (attrs.isEmpty) { o.writeInt(0); o.writeInt(0) }
    else {
      o.writeInt(0x0C); o.writeInt(attrs.length)
      attrs.foreach {
        case (n, Left(s)) =>
          writeName(o, n)
          o.writeInt(NC_CHAR)
          val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          o.writeInt(b.length)
          o.write(b)
          var pad = pad4i(b.length) - b.length
          while (pad > 0) { o.writeByte(0); pad -= 1 }
        case (n, Right(d)) =>
          writeName(o, n)
          o.writeInt(NC_DOUBLE)
          o.writeInt(1)
          o.writeDouble(d)
      }
    }
  }

  private def writeNum(bb: java.nio.ByteBuffer, t: Int, d: Double): Unit = t match {
    case NC_BYTE   => bb.put(d.toByte)
    case NC_SHORT  => bb.putShort(d.toShort)
    case NC_INT    => bb.putInt(d.toInt)
    case NC_FLOAT  => bb.putFloat(d.toFloat)
    case NC_DOUBLE => bb.putDouble(d)
    case other     => throw new IllegalArgumentException(s"writeNum: $other")
  }
}
