package graft.sources.netcdf

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

import graft.nd.{NdDataset, NdVariable}

/** NetCDF classic binary format (CDF-1 32-bit offsets, CDF-2 64-bit
  * offsets) parser — pure JVM, no native netcdf-c. The classic format
  * is a fixed big-endian layout: header (dims, global attrs, vars with
  * their attrs and data offsets) followed by fixed-size variable data
  * and record-interleaved data for variables on the unlimited
  * dimension.
  *
  * Semantics matched to the reference's `read_netcdf` surface
  * (beacon-arrow-netcdf/src/reader.rs; SURVEY §2.1): every variable
  * becomes a column via the arrays→tables rule, char matrices decode
  * to strings on their leading dims (≈ decoders/strings.rs), numeric
  * attributes surface verbatim as attribute columns, CF decoding
  * happens downstream in [[graft.nd.NdFlatten]]. NetCDF-4 files are
  * HDF5 containers and route to [[graft.sources.hdf5.Hdf5Reader]].
  *
  * Scale stance: one file = one task; the mapped buffer reads only the
  * pages the variables touch. This reader targets the "millions of
  * modest files" archive shape the reference optimizes for; huge
  * single files get chunk-partitioned reads in the Zarr DSv2 path.
  */
object NetcdfClassic {

  val NC_BYTE = 1; val NC_CHAR = 2; val NC_SHORT = 3
  val NC_INT = 4; val NC_FLOAT = 5; val NC_DOUBLE = 6

  def typeSize(t: Int): Int = t match {
    case NC_BYTE | NC_CHAR => 1
    case NC_SHORT          => 2
    case NC_INT | NC_FLOAT => 4
    case NC_DOUBLE         => 8
    case other => throw new IllegalArgumentException(s"unsupported nc_type $other")
  }

  final case class NcDim(name: String, size0: Int) { def isRecord: Boolean = size0 == 0 }
  final case class NcAttr(name: String, ncType: Int, str: String, nums: Array[Double])
  final case class NcVar(name: String, dimIds: Seq[Int], attrs: Seq[NcAttr],
      ncType: Int, vsize: Long, begin: Long)
  final case class NcFile(version: Int, numrecs: Long, dims: Seq[NcDim],
      globalAttrs: Seq[NcAttr], vars: Seq[NcVar])

  def isClassic(path: String): Boolean = {
    // 4-byte range probe: never localizes a remote granule just to sniff
    if (graft.sources.io.ByteStore.size(path) < 4) return false
    val b = graft.sources.io.ByteStore.readRange(path, 0, 4)
    b(0) == 'C'.toByte && b(1) == 'D'.toByte && b(2) == 'F'.toByte &&
      (b(3) == 1 || b(3) == 2)
  }

  // ------------------------------------------------------------ header

  def parseHeader(buf: ByteBuffer, fileSize: Long): NcFile = {
    require(buf.get() == 'C' && buf.get() == 'D' && buf.get() == 'F', "not a classic netcdf file")
    val version = buf.get().toInt
    require(version == 1 || version == 2,
      s"unsupported netcdf classic version $version (CDF-5 not supported)")
    val numrecs0 = buf.getInt() & 0xFFFFFFFFL // STREAMING = 0xFFFFFFFF

    def name(): String = {
      val len = buf.getInt()
      val bytes = new Array[Byte](len)
      buf.get(bytes)
      skipPad(buf, len)
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    }

    def dimList(): Seq[NcDim] = {
      val tag = buf.getInt(); val n = buf.getInt()
      require(tag == 0x0A || (tag == 0 && n == 0), s"bad dim_list tag $tag")
      (0 until n).map(_ => NcDim(name(), buf.getInt()))
    }

    def attrList(): Seq[NcAttr] = {
      val tag = buf.getInt(); val n = buf.getInt()
      require(tag == 0x0C || (tag == 0 && n == 0), s"bad att_list tag $tag")
      (0 until n).map { _ =>
        val nm = name()
        val t = buf.getInt()
        val ne = buf.getInt()
        t match {
          case NC_CHAR =>
            val bytes = new Array[Byte](ne)
            buf.get(bytes)
            skipPad(buf, ne)
            NcAttr(nm, t, new String(bytes, java.nio.charset.StandardCharsets.UTF_8), null)
          case _ =>
            val vals = new Array[Double](ne)
            var i = 0
            while (i < ne) { vals(i) = readNum(buf, t); i += 1 }
            skipPad(buf, ne * typeSize(t))
            NcAttr(nm, t, null, vals)
        }
      }
    }

    def varList(): Seq[NcVar] = {
      val tag = buf.getInt(); val n = buf.getInt()
      require(tag == 0x0B || (tag == 0 && n == 0), s"bad var_list tag $tag")
      (0 until n).map { _ =>
        val nm = name()
        val nd = buf.getInt()
        val dimIds = (0 until nd).map(_ => buf.getInt())
        val attrs = attrList()
        val t = buf.getInt()
        val vsize = buf.getInt() & 0xFFFFFFFFL
        val begin = if (version == 1) buf.getInt() & 0xFFFFFFFFL else buf.getLong()
        NcVar(nm, dimIds, attrs, t, vsize, begin)
      }
    }

    val dims = dimList()
    val gattrs = attrList()
    val vars = varList()

    // streaming numrecs: infer from file size and the record size
    val numrecs =
      if (numrecs0 != 0xFFFFFFFFL) numrecs0
      else {
        val recVars = vars.filter(_.dimIds.headOption.exists(dims(_).isRecord))
        if (recVars.isEmpty) 0L
        else {
          val rs = recSize(dims, vars)
          val dataStart = recVars.map(_.begin).min
          (fileSize - dataStart) / rs
        }
      }
    NcFile(version, numrecs, dims, gattrs, vars)
  }

  private def skipPad(buf: ByteBuffer, n: Int): Unit = {
    val pad = (4 - (n % 4)) % 4
    buf.position(buf.position() + pad)
  }

  private def readNum(buf: ByteBuffer, t: Int): Double = t match {
    case NC_BYTE   => buf.get().toDouble
    case NC_SHORT  => buf.getShort().toDouble
    case NC_INT    => buf.getInt().toDouble
    case NC_FLOAT  => buf.getFloat().toDouble
    case NC_DOUBLE => buf.getDouble()
    case other => throw new IllegalArgumentException(s"unsupported numeric nc_type $other")
  }

  /** per-record byte count of one record variable, unpadded */
  private def recBytesUnpadded(dims: Seq[NcDim], v: NcVar): Long =
    v.dimIds.drop(1).map(dims(_).size0.toLong).product * typeSize(v.ncType)

  /** total bytes of one record (the interleave stride). Single record
    * variable: no padding (format special case). */
  def recSize(dims: Seq[NcDim], vars: Seq[NcVar]): Long = {
    val recVars = vars.filter(_.dimIds.headOption.exists(dims(_).isRecord))
    if (recVars.length == 1) recBytesUnpadded(dims, recVars.head)
    else recVars.map(v => pad4(recBytesUnpadded(dims, v))).sum
  }

  private def pad4(n: Long): Long = (n + 3) / 4 * 4

  // ------------------------------------------------------------- data

  /** Parse a classic file into the format-agnostic ND model. Char
    * variables decode to strings over their leading dims (last dim =
    * string length). `keep` skips the data read (not the header parse)
    * of unselected variables — the DSv2 column-pruning hook. */
  def readDataset(path: String): NdDataset = readDataset(path, _ => true)

  def readDataset(path: String, keep: String => Boolean): NdDataset =
    readDataset(path, keep, None)

  /** `rowRange = Some((dim, start, end))` restricts the read to rows
    * [start,end) of that dimension: variables carrying it as axis 0
    * (incl. all record variables) read only those rows' bytes; carriers
    * at a deeper axis decode fully and slice; non-carriers pass
    * through. The returned dataset's `dim` size is end-start. */
  /** metadata-only parse: variables carry dims/type/attrs with EMPTY
    * data — exact schema + grid selection without reading data bytes */
  def readMeta(path: String): NdDataset =
    readDataset(path, _ => true, None, metaOnly = true)

  def readDataset(path: String, keep: String => Boolean,
      rowRange: Option[(String, Int, Int)]): NdDataset =
    readDataset(path, keep, rowRange, metaOnly = false)

  private def readDataset(path: String, keep: String => Boolean,
      rowRange: Option[(String, Int, Int)], metaOnly: Boolean): NdDataset = {
    val ch = graft.sources.io.ByteStore.openLocalChannel(path)
    try {
      val size = ch.size()
      val buf = ch.map(FileChannel.MapMode.READ_ONLY, 0, size)
      buf.order(java.nio.ByteOrder.BIG_ENDIAN)
      val f = parseHeader(buf, size)

      val fullSizes: Seq[(String, Int)] = f.dims.map { d =>
        d.name -> (if (d.isRecord) f.numrecs.toInt else d.size0)
      }
      val fullMap = fullSizes.toMap
      val (rdim, rstart, rend) = rowRange.getOrElse((null: String, 0, 0))
      val dimSizes = fullSizes.map { case (n, s) =>
        n -> (if (n == rdim) rend - rstart else s)
      }
      def fullSizeOf(id: Int): Int = fullSizes(id)._2
      def dimName(id: Int): String = fullSizes(id)._1

      val rs = recSize(f.dims, f.vars)

      val variables = f.vars.filter(v => keep(v.name)).map { v =>
        val isRec = v.dimIds.headOption.exists(f.dims(_).isRecord)
        val attrs = v.attrs.map(a => a.name -> attrString(a)).toMap
        val firstIsRange = rdim != null && v.dimIds.headOption.exists(dimName(_) == rdim)
        // axis-0 row window (full range when not the split axis)
        val n0 = v.dimIds.headOption.map(fullSizeOf).getOrElse(1)
        val (s0, e0) = if (firstIsRange) (rstart, rend) else (0, n0)
        val decoded: NdVariable = if (metaOnly) {
          if (v.ncType == NC_CHAR) {
            val outDims = if (v.dimIds.nonEmpty) v.dimIds.dropRight(1) else Seq.empty
            NdVariable(v.name, outDims.map(dimName), null, attrs, Array.empty[String])
          } else NdVariable(v.name, v.dimIds.map(dimName), Array.empty[Double], attrs)
        } else if (v.ncType == NC_CHAR) {
          // char matrix → strings over leading dims; scalar char var → 1 string
          val strLen = if (v.dimIds.nonEmpty) fullSizeOf(v.dimIds.last) else 1
          val outDims = if (v.dimIds.nonEmpty) v.dimIds.dropRight(1) else Seq.empty
          val outStride = outDims.drop(1).map(fullSizeOf(_).toLong).product max 1L
          val (i0, i1) =
            if (outDims.isEmpty) (0L, 1L)
            else (s0 * outStride, e0 * outStride)
          val out = new Array[String]((i1 - i0).toInt)
          val bytes = new Array[Byte](strLen)
          var i = i0
          while (i < i1) {
            seekElem(buf, f, v, isRec, rs, i * strLen)
            buf.get(bytes)
            var end = bytes.length
            while (end > 0 && (bytes(end - 1) == 0 || bytes(end - 1) == ' ')) end -= 1
            out((i - i0).toInt) = new String(bytes, 0, end, java.nio.charset.StandardCharsets.UTF_8)
            i += 1
          }
          NdVariable(v.name, outDims.map(dimName), null, attrs, out)
        } else {
          val rowStride = v.dimIds.drop(1).map(fullSizeOf(_).toLong).product max 1L
          val n = ((e0 - s0) * rowStride).toInt
          val out = new Array[Double](math.max(n, 0))
          if (isRec) {
            val perRec = rowStride.toInt
            var r = s0
            while (r < e0) {
              buf.position((v.begin + r * rs).toInt)
              var j = 0
              while (j < perRec) { out((r - s0) * perRec + j) = readNum(buf, v.ncType); j += 1 }
              r += 1
            }
          } else {
            buf.position((v.begin + s0 * rowStride * typeSize(v.ncType)).toInt)
            var i = 0
            while (i < n) { out(i) = readNum(buf, v.ncType); i += 1 }
          }
          NdVariable(v.name, v.dimIds.map(dimName), out, attrs)
        }
        // split axis at a deeper position: decode happened full, slice now
        if (rdim != null && !firstIsRange && decoded.dims.contains(rdim))
          graft.nd.NdSlice.sliceAxis(decoded, fullMap, rdim, rstart, rend)
        else decoded
      }
      NdDataset(dimSizes, variables, f.globalAttrs.map(a => a.name -> attrString(a)).toMap)
    } finally ch.close()
  }

  /** position the buffer at flat element offset `elem` (bytes) of a
    * variable, accounting for record interleave */
  private def seekElem(buf: ByteBuffer, f: NcFile, v: NcVar, isRec: Boolean,
      rs: Long, byteOff: Long): Unit = {
    if (!isRec) buf.position((v.begin + byteOff).toInt)
    else {
      val perRec = recBytesUnpadded(f.dims, v)
      val rec = byteOff / perRec
      buf.position((v.begin + rec * rs + byteOff % perRec).toInt)
    }
  }

  /** verbatim attribute rendering: integral numerics without '.0', char
    * attrs raw, arrays comma-joined (attribute-column contract,
    * table-functions.md:46-63) */
  def attrString(a: NcAttr): String =
    if (a.str != null) a.str
    else a.nums.map(render).mkString(",")

  private def render(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString
}
