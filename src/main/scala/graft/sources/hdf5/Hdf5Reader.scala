package graft.sources.hdf5

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

import scala.collection.mutable

import graft.nd.{NdDataset, NdVariable}

/** Minimal pure-JVM HDF5 reader — enough of the public HDF5 file format
  * to open NetCDF-4 files (which are HDF5 containers) and expose them
  * through the arrays→tables model, re-expressing the reference's
  * `read_netcdf`/`read_hdf5` surface (beacon-arrow-netcdf/src/reader.rs,
  * beacon-arrow-hdf5; registration note runtime_builder.rs:760-774).
  *
  * Implemented (scoped by what netcdf-c emits):
  *  - superblocks v0/v1 and v2/v3
  *  - object headers v1 and v2 (incl. OCHK continuation blocks)
  *  - messages: dataspace, datatype (fixed/float/string/vlen/reference),
  *    fill value, link, link info, layout v3 (compact/contiguous/
  *    chunked), filter pipeline (deflate, shuffle, fletcher32),
  *    attribute, attribute info, continuation, symbol table (v1 groups)
  *  - dense links/attributes: fractal heap (direct + indirect blocks)
  *    walked via the v2 B-tree name index (BTHD/BTIN/BTLF)
  *  - v1 group B-tree + local heap + SNOD symbol nodes
  *  - chunked data via the v1 B-tree chunk index, gzip + shuffle
  *  - global heap collections (vlen data, e.g. DIMENSION_LIST)
  *
  * NetCDF-4 semantics on top: dimension scales become dimensions (and
  * coordinate variables unless phony), DIMENSION_LIST attributes bind
  * variable axes, hidden bookkeeping attributes are dropped, char
  * matrices decode to strings over their leading dims. CF decoding
  * (units-since, scale/offset, _FillValue) happens downstream in
  * [[graft.nd.NdFlatten]], shared with every other ND container.
  */
object Hdf5Reader {

  private val UNDEF = -1L // 0xFFFF.. addresses

  final class H5(val buf: ByteBuffer, val offSize: Int, val lenSize: Int) {
    def at(pos: Long): ByteBuffer = { val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN); b.position(pos.toInt); b }
    def offset(b: ByteBuffer): Long = readN(b, offSize)
    def length(b: ByteBuffer): Long = readN(b, lenSize)
  }

  private def readN(b: ByteBuffer, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (b.get() & 0xFFL) << (8 * i); i += 1 }
    if (n == 8 && v == -1L) UNDEF
    else if (n < 8 && v == (1L << (8 * n)) - 1) UNDEF
    else v
  }

  private def u16(b: ByteBuffer): Int = b.getShort() & 0xFFFF
  private def u32(b: ByteBuffer): Long = b.getInt() & 0xFFFFFFFFL

  // ------------------------------------------------------------ model

  final case class Datatype(clazz: Int, size: Int, littleEndian: Boolean,
      signed: Boolean, base: Option[Datatype],
      members: Seq[(String, Int, Datatype)] = Nil) // compound: (name, byte offset, type)
  final case class Filter(id: Int, values: Seq[Int])
  final case class Dataset(
      name: String,
      addr: Long,                       // object header address (identity for refs)
      dims: Array[Long],
      dtype: Datatype,
      layoutClass: Int,                 // 0 compact, 1 contiguous, 2 chunked
      compact: Array[Byte],
      contigAddr: Long, contigSize: Long,
      chunkBtree: Long, chunkDims: Array[Int],
      filters: Seq[Filter],
      fill: Option[Array[Byte]],
      attrs: Map[String, AttrVal])
  final case class AttrVal(str: String, nums: Array[Double], refs: Array[Long]) {
    def render: String =
      if (str != null) str
      else if (nums != null) nums.map(renderNum).mkString(",")
      else ""
  }

  private def renderNum(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  // ------------------------------------------------------- entry point

  def readDataset(path: String): NdDataset = readDataset(path, _ => true)

  /** `keep` skips the (expensive) data decode of unselected variables;
    * structure and attributes still parse so dimensions resolve. */
  def readDataset(path: String, keep: String => Boolean): NdDataset =
    readDataset(path, keep, None)

  /** `rowRange = Some((dim, start, end))` restricts the read to rows
    * [start,end) of that dimension: axis-0 carriers read only the
    * intersecting chunks / contiguous byte range; deeper carriers
    * decode fully and slice. The returned `dim` size is end-start. */
  def readDataset(path: String, keep: String => Boolean,
      rowRange: Option[(String, Int, Int)]): NdDataset =
    readDataset(path, keep, rowRange, metaOnly = false)

  /** metadata-only parse: variables carry dims/type/attrs with EMPTY
    * data — exact schema + grid selection without touching data bytes */
  def readMeta(path: String): NdDataset =
    readDataset(path, _ => true, None, metaOnly = true)

  private def readDataset(path: String, keep: String => Boolean,
      rowRange: Option[(String, Int, Int)], metaOnly: Boolean): NdDataset = {
    val ch = graft.sources.io.ByteStore.openLocalChannel(path)
    try {
      val mapped = ch.map(FileChannel.MapMode.READ_ONLY, 0, ch.size())
      mapped.order(ByteOrder.LITTLE_ENDIAN)
      val (h5, rootAddr) = readSuperblock(mapped)
      val rootAttrs = mutable.LinkedHashMap.empty[String, AttrVal]
      val datasets = mutable.ArrayBuffer.empty[Dataset]
      walkGroup(h5, rootAddr, "", datasets, rootAttrs, depth = 0)
      toNd(h5, datasets.toSeq, rootAttrs.toMap, keep, rowRange, metaOnly)
    } finally ch.close()
  }

  /** planning metadata: chunk shape of the largest chunked dataset
    * whose rank matches `rank` (None = nothing chunked at that rank).
    * Metadata walk only — no data decode. */
  def chunkDimsOf(path: String, rank: Int): Option[Array[Int]] = {
    val ch = graft.sources.io.ByteStore.openLocalChannel(path)
    try {
      val mapped = ch.map(FileChannel.MapMode.READ_ONLY, 0, ch.size())
      mapped.order(ByteOrder.LITTLE_ENDIAN)
      val (h5, rootAddr) = readSuperblock(mapped)
      val rootAttrs = mutable.LinkedHashMap.empty[String, AttrVal]
      val datasets = mutable.ArrayBuffer.empty[Dataset]
      walkGroup(h5, rootAddr, "", datasets, rootAttrs, depth = 0)
      datasets.filter(d => d.layoutClass == 2 && d.dims.length == rank &&
          d.chunkDims.length > rank)
        .sortBy(d => -d.dims.product)
        .headOption.map(_.chunkDims.dropRight(1))
    } finally ch.close()
  }

  private def readSuperblock(buf: ByteBuffer): (H5, Long) = {
    val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
    val got = new Array[Byte](8)
    buf.position(0); buf.get(got)
    require(java.util.Arrays.equals(got, sig), "not an HDF5 file")
    val ver = buf.get().toInt
    ver match {
      case 0 | 1 =>
        buf.get(); buf.get(); buf.get() // fs, root group, reserved
        buf.get() // shared header version
        val offSize = buf.get().toInt
        val lenSize = buf.get().toInt
        buf.get()
        u16(buf); u16(buf) // group leaf/internal k
        buf.getInt() // flags
        if (ver == 1) { u16(buf); u16(buf) }
        val h5 = new H5(buf, offSize, lenSize)
        h5.offset(buf); h5.offset(buf); h5.offset(buf); h5.offset(buf)
        // root group symbol table entry
        h5.offset(buf) // link name offset
        val rootOH = h5.offset(buf)
        (h5, rootOH)
      case 2 | 3 =>
        val offSize = buf.get().toInt
        val lenSize = buf.get().toInt
        buf.get() // flags
        val h5 = new H5(buf, offSize, lenSize)
        h5.offset(buf) // base
        h5.offset(buf) // extension
        h5.offset(buf) // eof
        val rootOH = h5.offset(buf)
        (h5, rootOH)
      case other => throw new IllegalArgumentException(s"unsupported superblock v$other")
    }
  }

  // ------------------------------------------------ object header walk

  private final case class Msg(typ: Int, data: ByteBuffer)

  private def readMessages(h5: H5, ohAddr: Long): Seq[Msg] = {
    val b = h5.at(ohAddr)
    val out = mutable.ArrayBuffer.empty[Msg]
    val first = b.get(b.position()) & 0xFF
    if (first == 'O'.toInt) {
      // v2: "OHDR"
      require(b.get() == 'O' && b.get() == 'H' && b.get() == 'D' && b.get() == 'R', "bad OHDR")
      val ver = b.get()
      require(ver == 2, s"object header v$ver")
      val flags = b.get().toInt
      if ((flags & 0x20) != 0) { b.getInt(); b.getInt(); b.getInt(); b.getInt() }
      if ((flags & 0x10) != 0) { u16(b); u16(b) }
      val chunk0 = (flags & 0x3) match {
        case 0 => b.get() & 0xFFL
        case 1 => u16(b).toLong
        case 2 => u32(b)
        case 3 => b.getLong()
      }
      val track = (flags & 0x04) != 0
      readV2Msgs(h5, b, chunk0, track, out)
    } else {
      // v1
      val ver = b.get()
      require(ver == 1, s"object header v$ver")
      b.get()
      val nmsgs = u16(b)
      b.getInt() // refcount
      val hdrSize = u32(b)
      b.getInt() // pad to 8-byte boundary of messages
      readV1Msgs(h5, b, hdrSize, nmsgs, out)
    }
    out.toSeq
  }

  private def readV1Msgs(h5: H5, b: ByteBuffer, blockLen: Long, nTotal: Int,
      out: mutable.ArrayBuffer[Msg]): Unit = {
    var remaining = nTotal
    var blocks = List((b.position().toLong, blockLen))
    while (blocks.nonEmpty && remaining > 0) {
      val (pos, len) = blocks.head
      blocks = blocks.tail
      val mb = h5.at(pos)
      val end = pos + len
      while (remaining > 0 && mb.position() + 8 <= end) {
        val typ = u16(mb)
        val size = u16(mb)
        mb.get(); mb.get(); mb.get(); mb.get()
        val data = h5.at(mb.position().toLong)
        if (typ == 0x10) {
          val cb = h5.at(mb.position().toLong)
          val addr = h5.offset(cb)
          val clen = h5.length(cb)
          blocks = (addr, clen) :: blocks
        } else out += Msg(typ, data)
        remaining -= 1
        // v1 messages are 8-byte aligned
        val next = mb.position() + size
        mb.position(((next + 7) / 8 * 8).toInt)
      }
    }
  }

  private def readV2Msgs(h5: H5, b: ByteBuffer, blockLen: Long, track: Boolean,
      out: mutable.ArrayBuffer[Msg]): Unit = {
    var blocks = List((b.position().toLong, blockLen, false))
    while (blocks.nonEmpty) {
      val (pos0, len, isCont) = blocks.head
      blocks = blocks.tail
      var pos = pos0
      var end = pos0 + len
      if (isCont) {
        val cb = h5.at(pos)
        require(cb.get() == 'O' && cb.get() == 'C' && cb.get() == 'H' && cb.get() == 'K', "bad OCHK")
        pos += 4
        end = pos0 + len // length includes sig+checksum
      }
      val mb = h5.at(pos)
      val lim = end - 4 // trailing checksum
      var done = false
      while (!done && mb.position() + 4 <= lim) {
        val typ = mb.get() & 0xFF
        val size = u16(mb)
        mb.get() // flags
        if (track) { u16(mb) }
        if (mb.position() + size > lim) done = true
        else {
          val data = h5.at(mb.position().toLong)
          if (typ == 0x10) {
            val cb = h5.at(mb.position().toLong)
            val addr = h5.offset(cb)
            val clen = h5.length(cb)
            blocks = (addr, clen, true) :: blocks
          } else out += Msg(typ, data)
          mb.position(mb.position() + size)
          // gap smaller than a message header ends the block
          if (lim - mb.position() < 4) done = true
        }
      }
    }
  }

  // ---------------------------------------------------------- groups

  private def walkGroup(h5: H5, ohAddr: Long, prefix: String,
      datasets: mutable.ArrayBuffer[Dataset],
      rootAttrs: mutable.LinkedHashMap[String, AttrVal], depth: Int): Unit = {
    require(depth < 16, "group nesting too deep")
    val msgs = readMessages(h5, ohAddr)
    // collect attributes (root group only — netcdf global attrs)
    if (prefix.isEmpty) {
      attrsOf(h5, msgs).foreach { case (k, v) => rootAttrs(k) = v }
    }
    val links = mutable.ArrayBuffer.empty[(String, Long)]
    msgs.foreach { m =>
      m.typ match {
        case 0x06 => parseLink(h5, m.data).foreach(links += _)
        case 0x02 => // link info → dense links
          val b = m.data
          b.get() // version
          val flags = b.get().toInt
          if ((flags & 1) != 0) b.getLong()
          val fheap = h5.offset(b)
          val nameBt = h5.offset(b)
          if (fheap != UNDEF && nameBt != UNDEF) {
            val heap = new FractalHeap(h5, fheap)
            btree2Records(h5, nameBt).foreach { rec =>
              // type 5 record: hash(4) + heap id(7)
              val rb = rec.duplicate().order(ByteOrder.LITTLE_ENDIAN)
              rb.getInt()
              val id = new Array[Byte](heap.idLen)
              rb.get(id)
              val obj = heap.readObject(id)
              parseLink(h5, ByteBuffer.wrap(obj).order(ByteOrder.LITTLE_ENDIAN))
                .foreach(links += _)
            }
          }
        case 0x11 => // v1 symbol table
          val b = m.data
          val btAddr = h5.offset(b)
          val heapAddr = h5.offset(b)
          v1GroupLinks(h5, btAddr, heapAddr, links)
        case _ =>
      }
    }
    links.foreach { case (name, addr) =>
      val childMsgs = readMessages(h5, addr)
      val isGroup = childMsgs.exists(m => m.typ == 0x02 || m.typ == 0x11) &&
        !childMsgs.exists(_.typ == 0x08)
      if (isGroup) walkGroup(h5, addr, s"$prefix$name/", datasets, rootAttrs, depth + 1)
      else if (childMsgs.exists(_.typ == 0x08))
        datasets += parseDataset(h5, s"$prefix$name", addr, childMsgs)
    }
  }

  private def parseLink(h5: H5, data: ByteBuffer): Option[(String, Long)] = {
    val b = data
    val ver = b.get()
    require(ver == 1, s"link message v$ver")
    val flags = b.get().toInt
    val ltype = if ((flags & 0x08) != 0) b.get().toInt else 0
    if ((flags & 0x04) != 0) b.getLong()
    if ((flags & 0x10) != 0) b.get()
    val nameLen = (flags & 0x3) match {
      case 0 => b.get() & 0xFFL
      case 1 => u16(b).toLong
      case 2 => u32(b)
      case 3 => b.getLong()
    }
    val nameBytes = new Array[Byte](nameLen.toInt)
    b.get(nameBytes)
    val name = new String(nameBytes, java.nio.charset.StandardCharsets.UTF_8)
    if (ltype == 0) Some(name -> h5.offset(b)) else None // hard links only
  }

  private def v1GroupLinks(h5: H5, btAddr: Long, heapAddr: Long,
      out: mutable.ArrayBuffer[(String, Long)]): Unit = {
    if (btAddr == UNDEF) return
    // local heap: "HEAP" ver(1) res(3) data seg size(L) free list(L) data addr(O)
    val hb = h5.at(heapAddr)
    require(hb.get() == 'H' && hb.get() == 'E' && hb.get() == 'A' && hb.get() == 'P', "bad HEAP")
    hb.get(); hb.get(); hb.get(); hb.get()
    h5.length(hb); h5.length(hb)
    val heapData = h5.offset(hb)
    def walk(addr: Long): Unit = {
      val b = h5.at(addr)
      require(b.get() == 'T' && b.get() == 'R' && b.get() == 'E' && b.get() == 'E', "bad TREE")
      val nodeType = b.get()
      require(nodeType == 0, "expected group btree")
      val level = b.get()
      val used = u16(b)
      h5.offset(b); h5.offset(b) // siblings
      // keys (length offsets) and children interleaved
      val children = new Array[Long](used)
      h5.length(b) // key 0
      var i = 0
      while (i < used) {
        children(i) = h5.offset(b)
        h5.length(b) // next key
        i += 1
      }
      children.foreach { c =>
        if (level > 0) walk(c)
        else {
          val sb = h5.at(c)
          require(sb.get() == 'S' && sb.get() == 'N' && sb.get() == 'O' && sb.get() == 'D', "bad SNOD")
          sb.get(); sb.get()
          val n = u16(sb)
          var j = 0
          while (j < n) {
            val nameOff = h5.offset(sb)
            val oh = h5.offset(sb)
            sb.getInt(); sb.getInt() // cache type + reserved
            sb.position(sb.position() + 16) // scratch
            val nb = h5.at(heapData + nameOff)
            val sbb = new StringBuilder
            var ch = nb.get()
            while (ch != 0) { sbb.append(ch.toChar); ch = nb.get() }
            out += (sbb.toString -> oh)
            j += 1
          }
        }
      }
    }
    walk(btAddr)
  }

  // --------------------------------------------------------- datasets

  private def parseDataset(h5: H5, name: String, addr: Long, msgs: Seq[Msg]): Dataset = {
    var dims: Array[Long] = Array.empty
    var dtype: Datatype = null
    var layoutClass = -1
    var compact: Array[Byte] = null
    var contigAddr = UNDEF; var contigSize = 0L
    var chunkBtree = UNDEF; var chunkDims: Array[Int] = Array.empty
    var filters: Seq[Filter] = Nil
    var fill: Option[Array[Byte]] = None
    msgs.foreach { m =>
      m.typ match {
        case 0x01 => dims = Option(parseDataspace(h5, m.data)).getOrElse(Array.empty)
        case 0x03 => dtype = parseDatatype(m.data)
        case 0x05 => fill = parseFill(m.data)
        case 0x08 =>
          val b = m.data
          val ver = b.get()
          require(ver == 3, s"layout v$ver unsupported")
          layoutClass = b.get().toInt
          layoutClass match {
            case 0 =>
              val sz = u16(b)
              compact = new Array[Byte](sz)
              b.get(compact)
            case 1 =>
              contigAddr = h5.offset(b)
              contigSize = h5.length(b)
            case 2 =>
              val ndim = b.get().toInt
              chunkBtree = h5.offset(b)
              chunkDims = (0 until ndim).map(_ => b.getInt()).toArray
            case other => throw new IllegalArgumentException(s"layout class $other")
          }
        case 0x0B => filters = parseFilters(m.data)
        case _ =>
      }
    }
    Dataset(name, addr, dims, dtype, layoutClass, compact, contigAddr, contigSize,
      chunkBtree, chunkDims, filters, fill, attrsOf(h5, msgs))
  }

  /** returns null for a NULL dataspace (zero elements) */
  private def parseDataspace(h5: H5, data: ByteBuffer): Array[Long] = {
    val b = data
    val ver = b.get()
    val rank = b.get().toInt
    val flags = b.get().toInt
    var nullSpace = false
    if (ver == 1) { b.get(); b.getInt() }
    else { if (b.get() == 2) nullSpace = true } // v2 type: 2 = null dataspace
    if (nullSpace) null
    else (0 until rank).map(_ => h5.length(b)).toArray
  }

  /** CONSUMING parse: leaves the buffer positioned after this datatype's
    * header + properties, so compound members (which pack their member
    * datatypes back to back) parse sequentially. Property sizes per the
    * format spec's datatype message, v1-v3. */
  private def parseDatatype(b: ByteBuffer): Datatype = {
    val cv = b.get() & 0xFF
    val clazz = cv & 0x0F
    val ver = math.max(1, cv >>> 4)
    val b0 = b.get() & 0xFF
    val b1 = b.get() & 0xFF
    b.get()
    val size = b.getInt()
    def skip(n: Int): Unit = b.position(b.position() + n)
    clazz match {
      case 0 => val t = Datatype(0, size, (b0 & 1) == 0, (b0 & 0x08) != 0, None); skip(4); t // fixed
      case 1 => val t = Datatype(1, size, (b0 & 1) == 0, signed = true, None); skip(12); t   // float
      case 2 => skip(2); Datatype(2, size, (b0 & 1) == 0, signed = true, None)               // time
      case 3 => Datatype(3, size, littleEndian = true, signed = false, None)                 // string
      case 4 => val t = Datatype(0, size, (b0 & 1) == 0, signed = false, None); skip(4); t   // bitfield ≈ unsigned
      case 5 => skip(b0); Datatype(5, size, littleEndian = true, signed = false, None)       // opaque (tag)
      case 7 => Datatype(7, size, littleEndian = true, signed = false, None)                 // reference
      case 9 => // vlen: the base datatype message follows the properties
        val base = parseDatatype(b)
        Datatype(9, size, littleEndian = true, signed = false, Some(base))
      case 6 => // compound: members = (name, byte offset, member datatype)
        val n = b0 | (b1 << 8)
        val members = (0 until n).map { _ =>
          val name = nullTermName(b, pad8 = ver <= 2)
          val offset = ver match {
            case 1 | 2 => b.getInt()
            case _ => // v3: offset stored in min bytes needed for `size`
              val nb = if (size < 256) 1 else if (size < 65536) 2
                else if (size < (1 << 24)) 3 else 4
              readN(b, nb).toInt
          }
          if (ver == 1) skip(28) // dimensionality + perm + reserved + 4 dim sizes
          (name, offset, parseDatatype(b))
        }
        Datatype(6, size, littleEndian = true, signed = false, None, members)
      case 8 => // enum: base type + named values (consumed, surfaced as base)
        val base = parseDatatype(b)
        val n = b0 | (b1 << 8)
        (0 until n).foreach(_ => nullTermName(b, pad8 = ver <= 2))
        skip(n * base.size)
        Datatype(8, size, base.littleEndian, base.signed, Some(base))
      case 10 => // array: dims + base type
        val nd = b.get() & 0xFF
        if (ver <= 2) { skip(3); skip(nd * 8) } else skip(nd * 4)
        val base = parseDatatype(b)
        Datatype(10, size, base.littleEndian, base.signed, Some(base))
      case other => Datatype(other, size, littleEndian = true, signed = false, None)
    }
  }

  /** null-terminated name; v1/v2 datatype members pad to 8-byte multiples */
  private def nullTermName(b: ByteBuffer, pad8: Boolean): String = {
    val bytes = mutable.ArrayBuffer.empty[Byte]
    var c = b.get()
    var len = 1
    while (c != 0) { bytes += c; c = b.get(); len += 1 }
    if (pad8) {
      val total = (len + 7) / 8 * 8
      b.position(b.position() + (total - len))
    }
    new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def parseFill(data: ByteBuffer): Option[Array[Byte]] = {
    val b = data
    val ver = b.get().toInt
    ver match {
      case 1 | 2 =>
        b.get(); b.get()
        val defined = b.get()
        if (ver == 1 || defined == 1) {
          val sz = b.getInt()
          if (sz > 0) { val a = new Array[Byte](sz); b.get(a); Some(a) } else None
        } else None
      case 3 =>
        val flags = b.get().toInt
        if ((flags & 0x20) != 0) {
          val sz = b.getInt()
          if (sz > 0) { val a = new Array[Byte](sz); b.get(a); Some(a) } else None
        } else None
      case _ => None
    }
  }

  private def parseFilters(data: ByteBuffer): Seq[Filter] = {
    val b = data
    val ver = b.get().toInt
    val n = b.get().toInt
    if (ver == 1) { b.get(); b.get(); b.getInt() }
    (0 until n).map { _ =>
      val id = u16(b)
      val nameLen = if (ver == 2 && id < 256) 0 else u16(b)
      u16(b) // flags
      val nvals = u16(b)
      if (nameLen > 0) {
        val skip = if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen
        b.position(b.position() + skip)
      }
      val vals = (0 until nvals).map(_ => b.getInt()).toSeq
      if (ver == 1 && nvals % 2 == 1) b.getInt() // pad
      Filter(id, vals)
    }
  }

  // ------------------------------------------------------- attributes

  private def attrsOf(h5: H5, msgs: Seq[Msg]): Map[String, AttrVal] = {
    val out = mutable.LinkedHashMap.empty[String, AttrVal]
    msgs.foreach { m =>
      m.typ match {
        case 0x0C =>
          parseAttr(h5, m.data).foreach { case (k, v) => out(k) = v }
        case 0x15 =>
          val b = m.data
          b.get()
          val flags = b.get().toInt
          if ((flags & 1) != 0) u16(b)
          val fheap = h5.offset(b)
          val nameBt = h5.offset(b)
          if (fheap != UNDEF && nameBt != UNDEF) {
            val heap = new FractalHeap(h5, fheap)
            btree2Records(h5, nameBt).foreach { rec =>
              // type 8 record: heap id(8) + flags(1) + creation order(4) + hash(4)
              val rb = rec.duplicate().order(ByteOrder.LITTLE_ENDIAN)
              val id = new Array[Byte](heap.idLen)
              rb.get(id)
              val obj = heap.readObject(id)
              parseAttr(h5, ByteBuffer.wrap(obj).order(ByteOrder.LITTLE_ENDIAN))
                .foreach { case (k, v) => out(k) = v }
            }
          }
        case _ =>
      }
    }
    out.toMap
  }

  private def parseAttr(h5: H5, data: ByteBuffer): Option[(String, AttrVal)] = {
    val b = data
    val ver = b.get().toInt
    require(ver >= 1 && ver <= 3, s"attribute message v$ver")
    val flags = if (ver >= 2) b.get().toInt else { b.get(); 0 }
    val nameSize = u16(b)
    val dtSize = u16(b)
    val dsSize = u16(b)
    if (ver == 3) b.get() // charset
    def padded(n: Int): Int = if (ver == 1) (n + 7) / 8 * 8 else n
    val nameBytes = new Array[Byte](nameSize)
    b.get(nameBytes)
    b.position(b.position() + (padded(nameSize) - nameSize))
    var name = new String(nameBytes, java.nio.charset.StandardCharsets.UTF_8)
    if (name.nonEmpty && name.last == 0) name = name.dropRight(1)
    if ((flags & 1) != 0) return None // shared datatype — not emitted by netcdf
    // positions are relative to THIS buffer (which may be a detached
    // fractal-heap object, not the file map) — duplicate, never h5.at
    def dup(src: ByteBuffer): ByteBuffer = {
      val d = src.duplicate().order(ByteOrder.LITTLE_ENDIAN); d
    }
    val dtPos = b.position()
    val dtype = parseDatatype(dup(b))
    b.position(dtPos + padded(dtSize))
    val dsPos = b.position()
    val space = parseDataspace(h5, dup(b))
    b.position(dsPos + padded(dsSize))
    if (space == null) return Some(name -> AttrVal("", null, null)) // null dataspace
    val n = if (space.isEmpty) 1L else space.product
    val v = readAttrValues(h5, b, dtype, n.toInt)
    Some(name -> v)
  }

  private def readAttrValues(h5: H5, b: ByteBuffer, t: Datatype, n: Int): AttrVal = {
    t.clazz match {
      case 3 => // fixed string(s)
        val bytes = new Array[Byte](t.size * n)
        b.get(bytes)
        AttrVal(cString(bytes), null, null)
      case 0 | 1 =>
        val nums = new Array[Double](n)
        val bb = b.duplicate().order(
          if (t.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        var i = 0
        while (i < n) { nums(i) = readNumAt(bb, t); i += 1 }
        AttrVal(null, nums, null)
      case 7 => // object references
        val refs = new Array[Long](n)
        var i = 0
        while (i < n) { refs(i) = readN(b, t.size); i += 1 }
        AttrVal(null, null, refs)
      case 9 =>
        val base = t.base.get
        if (base.clazz == 7) {
          // vlen of references (DIMENSION_LIST): n × (len(4) gheap(O) idx(4))
          val refs = mutable.ArrayBuffer.empty[Long]
          var i = 0
          while (i < n) {
            val len = u32(b)
            val gaddr = h5.offset(b)
            val idx = b.getInt()
            val obj = globalHeapObject(h5, gaddr, idx)
            val ob = ByteBuffer.wrap(obj).order(ByteOrder.LITTLE_ENDIAN)
            var j = 0L
            while (j < len) { refs += readN(ob, base.size); j += 1 }
            i += 1
          }
          AttrVal(null, null, refs.toArray)
        } else if (base.clazz == 3) {
          // vlen string(s)
          val parts = (0 until n).map { _ =>
            val len = u32(b)
            val gaddr = h5.offset(b)
            val idx = b.getInt()
            if (gaddr == UNDEF || gaddr == 0) ""
            else new String(globalHeapObject(h5, gaddr, idx), 0, len.toInt,
              java.nio.charset.StandardCharsets.UTF_8)
          }
          AttrVal(parts.mkString(","), null, null)
        } else {
          AttrVal("", null, null)
        }
      case _ => AttrVal("", null, null)
    }
  }

  private def readNumAt(b: ByteBuffer, t: Datatype): Double = (t.clazz, t.size) match {
    case (1, 4) => b.getFloat().toDouble
    case (1, 8) => b.getDouble()
    case (0, 1) => if (t.signed) b.get().toDouble else (b.get() & 0xFF).toDouble
    case (0, 2) => if (t.signed) b.getShort().toDouble else u16(b).toDouble
    case (0, 4) => if (t.signed) b.getInt().toDouble else u32(b).toDouble
    case (0, 8) => b.getLong().toDouble // u64 > 2^63 degrade (documented)
    case other  => throw new IllegalArgumentException(s"unsupported numeric datatype $other")
  }

  private def cString(bytes: Array[Byte]): String = {
    var end = bytes.length
    while (end > 0 && bytes(end - 1) == 0) end -= 1
    new String(bytes, 0, end, java.nio.charset.StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------ global heap

  private def globalHeapObject(h5: H5, collAddr: Long, index: Int): Array[Byte] = {
    val b = h5.at(collAddr)
    require(b.get() == 'G' && b.get() == 'C' && b.get() == 'O' && b.get() == 'L', "bad GCOL")
    b.get(); b.get(); b.get(); b.get()
    val collSize = h5.length(b)
    val end = collAddr + collSize
    while (b.position() < end - 8) {
      val idx = u16(b)
      u16(b) // refcount
      b.getInt() // reserved
      val size = h5.length(b)
      if (idx == index) {
        val out = new Array[Byte](size.toInt)
        b.get(out)
        return out
      }
      val skip = (size + 7) / 8 * 8
      b.position((b.position() + skip).toInt)
    }
    throw new IllegalArgumentException(s"global heap object $index not found @$collAddr")
  }

  // ----------------------------------------------------- fractal heap

  final class FractalHeap(h5: H5, addr: Long) {
    private val b = h5.at(addr)
    require(b.get() == 'F' && b.get() == 'R' && b.get() == 'H' && b.get() == 'P', "bad FRHP")
    require(b.get() == 0, "fractal heap version")
    val idLen: Int = u16(b)
    private val filterLen = u16(b)
    private val flags = b.get().toInt
    private val maxManagedSize = u32(b)
    locally { h5.length(b); h5.offset(b) } // next huge id, huge btree
    locally { h5.length(b); h5.offset(b) } // free space, fs mgr
    locally { h5.length(b); h5.length(b); h5.length(b); h5.length(b) } // managed, alloc, iter, #managed
    locally { h5.length(b); h5.length(b); h5.length(b); h5.length(b) } // huge/tiny sizes+counts
    private val tableWidth = u16(b)
    private val startBlockSize = h5.length(b)
    private val maxDirectSize = h5.length(b)
    private val maxHeapBits = u16(b)
    locally { u16(b) } // starting # rows
    private val rootAddr = h5.offset(b)
    private val curRootRows = u16(b)
    require(filterLen == 0, "filtered fractal heaps unsupported")

    private val offBytes = (maxHeapBits + 7) / 8
    private val maxDirectRows =
      (java.lang.Long.numberOfTrailingZeros(maxDirectSize) -
        java.lang.Long.numberOfTrailingZeros(startBlockSize)) + 2

    private def rowSize(r: Int): Long =
      if (r < 2) startBlockSize else startBlockSize << (r - 1)

    /** heap offset → object bytes (managed objects only) */
    def readObject(id: Array[Byte]): Array[Byte] = {
      val ib = ByteBuffer.wrap(id).order(ByteOrder.LITTLE_ENDIAN)
      val flag = ib.get() & 0xFF
      require(((flag >> 4) & 0x3) == 0, "only managed heap objects supported")
      val off = readN(ib, offBytes)
      val lenBytes = id.length - 1 - offBytes
      val len = readN(ib, lenBytes)
      val out = new Array[Byte](len.toInt)
      val (blockAddr, blockOff) = locate(off)
      val db = h5.at(blockAddr)
      require(db.get() == 'F' && db.get() == 'H' && db.get() == 'D' && db.get() == 'B', "bad FHDB")
      db.position((blockAddr + (off - blockOff)).toInt)
      db.get(out)
      out
    }

    /** direct block containing heap offset → (file addr, block heap offset) */
    private def locate(off: Long): (Long, Long) = {
      if (curRootRows == 0) (rootAddr, 0L) // root IS a direct block
      else locateInIndirect(rootAddr, 0L, curRootRows, off)
    }

    private def locateInIndirect(iAddr: Long, iOff: Long, nrows: Int, off: Long): (Long, Long) = {
      val b = h5.at(iAddr)
      require(b.get() == 'F' && b.get() == 'H' && b.get() == 'I' && b.get() == 'B', "bad FHIB")
      b.get() // version
      h5.offset(b) // heap header
      readN(b, offBytes) // block offset
      // find row/col of target
      var row = 0
      var acc = iOff
      while (row < nrows) {
        val rs = rowSize(row)
        if (off < acc + rs * tableWidth) {
          val col = ((off - acc) / rs).toInt
          val entry = row * tableWidth + col
          // entries: direct rows store address only (unfiltered heap)
          val eb = h5.at(b.position().toLong)
          var skip = 0
          var r2 = 0
          var e = 0
          while (e < entry) { h5.offset(eb); e += 1 }
          val childAddr = h5.offset(eb)
          val childOff = acc + col * rs
          if (row < maxDirectRows) return (childAddr, childOff)
          else {
            val childRows = rowsForIndirectSize(rs)
            return locateInIndirect(childAddr, childOff, childRows, off)
          }
        }
        acc += rs * tableWidth
        row += 1
      }
      throw new IllegalArgumentException(s"heap offset $off beyond root block rows")
    }

    private def rowsForIndirectSize(size: Long): Int = {
      // an indirect block of "size" spans log2(size)-log2(start)+1 rows
      (java.lang.Long.numberOfTrailingZeros(java.lang.Long.highestOneBit(size)) -
        java.lang.Long.numberOfTrailingZeros(startBlockSize)) + 1
    }
  }

  // -------------------------------------------------------- btree v2

  /** all records of a v2 btree (depth ≤ 1 supported) */
  private def btree2Records(h5: H5, addr: Long): Seq[ByteBuffer] = {
    val b = h5.at(addr)
    require(b.get() == 'B' && b.get() == 'T' && b.get() == 'H' && b.get() == 'D', "bad BTHD")
    b.get() // version
    val btType = b.get()
    val nodeSize = u32(b)
    val recSize = u16(b)
    val depth = u16(b)
    b.get(); b.get() // split/merge percent
    val rootAddr = h5.offset(b)
    val rootNrec = u16(b)
    val totalNrec = h5.length(b)
    val out = mutable.ArrayBuffer.empty[ByteBuffer]
    // size of the "number of records" field for child pointers
    val maxLeafRec = (nodeSize - 10) / recSize
    val nrecBytes = bytesFor(maxLeafRec)

    def leaf(addr: Long, n: Int): Unit = {
      val lb = h5.at(addr)
      require(lb.get() == 'B' && lb.get() == 'T' && lb.get() == 'L' && lb.get() == 'F', "bad BTLF")
      lb.get(); lb.get() // version, type
      var i = 0
      while (i < n) {
        val rec = h5.at(lb.position().toLong)
        out += rec
        lb.position(lb.position() + recSize)
        i += 1
      }
    }

    if (depth == 0) leaf(rootAddr, rootNrec)
    else if (depth == 1) {
      val ib = h5.at(rootAddr)
      require(ib.get() == 'B' && ib.get() == 'T' && ib.get() == 'I' && ib.get() == 'N', "bad BTIN")
      ib.get(); ib.get()
      // all records first, then the nrec+1 child pointers
      var i = 0
      while (i < rootNrec) {
        out += h5.at(ib.position().toLong)
        ib.position(ib.position() + recSize)
        i += 1
      }
      i = 0
      while (i <= rootNrec) {
        val cAddr = h5.offset(ib)
        val cN = readN(ib, nrecBytes).toInt
        leaf(cAddr, cN)
        i += 1
      }
    } else throw new IllegalArgumentException(s"btree v2 depth $depth unsupported")
    out.toSeq
  }

  private def bytesFor(v: Long): Int = {
    var n = 1
    while ((1L << (8 * n)) <= v && n < 8) n += 1
    n
  }

  // ------------------------------------------------------ data reading

  /** raw (unfiltered) bytes of a dataset, fill-extended */
  def readRaw(h5: H5, d: Dataset): Array[Byte] =
    readRawRows(h5, d, 0, 0L, d.dims.headOption.getOrElse(1L))

  /** raw bytes of indices [s0,e0) along `axis`: chunked layouts visit
    * only intersecting chunks (any axis); contiguous/compact layouts
    * read only the byte range when axis = 0 (a leading-axis slice of
    * C-order data is contiguous), else read fully and slice. */
  def readRawRows(h5: H5, d: Dataset, axis: Int, s0: Long, e0: Long): Array[Byte] = {
    val elemSize = d.dtype.size
    val regionDims = d.dims.clone()
    if (regionDims.nonEmpty) regionDims(axis) = e0 - s0
    val total = (regionDims.product * elemSize).toInt
    val out = new Array[Byte](math.max(total, 0))
    d.fill.foreach { f =>
      if (f.length == elemSize && f.exists(_ != 0)) {
        var i = 0
        while (i + elemSize <= out.length) { System.arraycopy(f, 0, out, i, elemSize); i += elemSize }
      }
    }
    val inner = d.dims.drop(axis + 1).product max 1L
    val skipBytes = s0 * inner * elemSize // valid when axis = 0
    d.layoutClass match {
      case 0 =>
        if (axis == 0 || d.dims.isEmpty) {
          if (skipBytes < d.compact.length)
            System.arraycopy(d.compact, skipBytes.toInt, out, 0,
              math.min(d.compact.length - skipBytes, out.length.toLong).toInt)
        } else sliceBytesInto(d.compact, out, d.dims, axis, s0, e0, elemSize)
      case 1 =>
        if (d.contigAddr != UNDEF && d.contigSize > 0) {
          if (axis == 0 || d.dims.isEmpty) {
            if (d.contigSize > skipBytes) {
              val b = h5.at(d.contigAddr + skipBytes)
              b.get(out, 0, math.min(d.contigSize - skipBytes, total.toLong).toInt)
            }
          } else {
            val fullTotal = (d.dims.product * elemSize).toInt
            val tmp = new Array[Byte](fullTotal)
            val b = h5.at(d.contigAddr)
            b.get(tmp, 0, math.min(d.contigSize, fullTotal.toLong).toInt)
            sliceBytesInto(tmp, out, d.dims, axis, s0, e0, elemSize)
          }
        }
      case 2 =>
        readChunks(h5, d, out, axis, s0, e0)
      case -1 => // no layout → empty
      case other => throw new IllegalArgumentException(s"layout $other")
    }
    out
  }

  /** C-order byte slice of [s0,e0) along `axis` out of a full array */
  private def sliceBytesInto(src: Array[Byte], dst: Array[Byte], dims: Array[Long],
      axis: Int, s0: Long, e0: Long, elemSize: Int): Unit = {
    val outer = dims.take(axis).product max 1L
    val inner = (dims.drop(axis + 1).product max 1L) * elemSize
    val block = ((e0 - s0) * inner).toInt
    var o = 0L
    var w = 0
    while (o < outer) {
      val from = ((o * dims(axis) + s0) * inner).toInt
      if (from >= 0 && from + block <= src.length && w + block <= dst.length)
        System.arraycopy(src, from, dst, w, block)
      w += block
      o += 1
    }
  }

  private def readChunks(h5: H5, d: Dataset, out: Array[Byte],
      axis: Int, s0: Long, e0: Long): Unit = {
    if (d.chunkBtree == UNDEF) return
    val elemSize = d.dtype.size
    val rank = d.dims.length
    // chunkDims has rank+1 entries, last = element size
    val cdims = d.chunkDims.dropRight(1).map(_.toLong)
    // output array covers [s0,e0) along `axis`: shift placement by -s0
    // and clip; chunks entirely outside the window never load/inflate
    val regionDims = d.dims.clone()
    if (rank > 0) regionDims(axis) = e0 - s0

    def walk(addr: Long): Unit = {
      val b = h5.at(addr)
      require(b.get() == 'T' && b.get() == 'R' && b.get() == 'E' && b.get() == 'E', "bad chunk TREE")
      val nodeType = b.get()
      require(nodeType == 1, "expected raw-data btree")
      val level = b.get()
      val used = u16(b)
      h5.offset(b); h5.offset(b)
      var i = 0
      while (i < used) {
        // key: chunk size(4) filter mask(4) offsets(8 × rank+1)
        val chunkBytes = b.getInt()
        val mask = b.getInt()
        val offs = (0 to rank).map(_ => b.getLong()).toArray
        val child = h5.offset(b)
        if (level > 0) {
          val save = b.position()
          walk(child)
          b.position(save)
        } else {
          val coffs = offs.dropRight(1)
          val overlaps = rank == 0 ||
            (coffs(axis) < e0 && coffs(axis) + cdims(axis) > s0)
          if (overlaps) {
            val raw = new Array[Byte](chunkBytes)
            val cb = h5.at(child)
            cb.get(raw)
            val data = applyFilters(raw, d.filters, mask, elemSize)
            val shifted = coffs.clone()
            if (rank > 0) shifted(axis) -= s0
            placeChunk(out, data, regionDims, cdims, shifted, elemSize)
          }
        }
        i += 1
      }
    }
    walk(d.chunkBtree)
  }

  private def applyFilters(raw0: Array[Byte], filters: Seq[Filter], mask: Int,
      elemSize: Int): Array[Byte] = {
    var raw = raw0
    // filters apply in reverse on read; skip those disabled by the mask
    filters.zipWithIndex.reverse.foreach { case (f, i) =>
      if ((mask & (1 << i)) == 0) f.id match {
        case 1 => // deflate
          val inf = new java.util.zip.Inflater()
          inf.setInput(raw)
          val bos = new java.io.ByteArrayOutputStream(raw.length * 4)
          val tmp = new Array[Byte](65536)
          while (!inf.finished()) {
            val n = inf.inflate(tmp)
            if (n == 0 && inf.needsInput()) throw new RuntimeException("truncated deflate chunk")
            bos.write(tmp, 0, n)
          }
          inf.end()
          raw = bos.toByteArray
        case 2 => // shuffle: de-interleave elemSize planes
          val n = raw.length / elemSize
          val outB = new Array[Byte](raw.length)
          var j = 0
          while (j < elemSize) {
            var k = 0
            while (k < n) { outB(k * elemSize + j) = raw(j * n + k); k += 1 }
            j += 1
          }
          // trailing bytes (not multiple of elemSize) copy through
          var t = n * elemSize
          while (t < raw.length) { outB(t) = raw(t); t += 1 }
          raw = outB
        case 3 => // fletcher32 checksum: drop the trailing 4 bytes
          raw = java.util.Arrays.copyOf(raw, raw.length - 4)
        case other => throw new IllegalArgumentException(s"filter $other unsupported")
      }
    }
    raw
  }

  /** copy one chunk into the C-order target array with edge clipping.
    * `coffs` may be negative on axis 0 (region reads shift placement by
    * the window start): leading rows/cells outside the target skip. */
  private def placeChunk(out: Array[Byte], chunk: Array[Byte], dims: Array[Long],
      cdims: Array[Long], coffs: Array[Long], elemSize: Int): Unit = {
    val rank = dims.length
    if (rank == 0) { System.arraycopy(chunk, 0, out, 0, math.min(chunk.length, out.length)); return }
    // iterate over rows of the chunk's last dimension; a negative last-dim
    // offset (rank-1 region) clips the row head via `lead`
    val lead = math.max(0L, -coffs(rank - 1))
    val copyLen = math.min(cdims(rank - 1) - lead,
      dims(rank - 1) - (coffs(rank - 1) + lead)).toInt
    if (copyLen <= 0) return
    val outerDims = cdims.dropRight(1)
    val nOuter = outerDims.product
    val idx = new Array[Long](math.max(rank - 1, 0))
    var it = 0L
    while (it < nOuter) {
      // idx = position within chunk (outer dims)
      var rem = it
      var k = rank - 2
      while (k >= 0) { idx(k) = rem % outerDims(k); rem /= outerDims(k); k -= 1 }
      // clip: skip rows outside the dataset
      var inside = true
      var srcOff = 0L
      var dstOff = 0L
      var stride = 1L
      k = rank - 1
      var dstIdxOk = true
      // compute flat offsets
      var src = 0L
      var dst = 0L
      var mulSrc = 1L
      var mulDst = 1L
      k = rank - 1
      src = 0L; dst = 0L
      // last dim handled by the row copy
      mulSrc = cdims(rank - 1)
      mulDst = dims(rank - 1)
      k = rank - 2
      while (k >= 0) {
        val gi = coffs(k) + idx(k)
        if (gi < 0 || gi >= dims(k)) dstIdxOk = false
        src += idx(k) * mulSrc
        dst += gi * mulDst
        mulSrc *= cdims(k)
        mulDst *= dims(k)
        k -= 1
      }
      if (dstIdxOk) {
        val srcByte = (src + lead) * elemSize
        val dstByte = (dst + coffs(rank - 1) + lead) * elemSize
        if (dstByte >= 0 && dstByte + copyLen * elemSize <= out.length &&
            srcByte + copyLen * elemSize <= chunk.length)
          System.arraycopy(chunk, srcByte.toInt, out, dstByte.toInt, copyLen * elemSize)
      }
      it += 1
    }
  }

  // --------------------------------------------------- netcdf mapping

  private val hiddenAttrs = Set("CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST",
    "_Netcdf4Dimid", "_Netcdf4Coordinates", "_NCProperties")

  private def toNd(h5: H5, datasets: Seq[Dataset], rootAttrs: Map[String, AttrVal],
      keep: String => Boolean = _ => true,
      rowRange: Option[(String, Int, Int)] = None,
      metaOnly: Boolean = false): NdDataset = {
    val (rdim, rstart, rend) = rowRange.getOrElse((null: String, 0, 0))
    val dimScales = datasets.filter(_.attrs.get("CLASS").exists(_.render == "DIMENSION_SCALE"))
    val byAddr = dimScales.map(d => d.addr -> d).toMap
    val dims: Seq[(String, Int)] = dimScales.map(d => d.name -> d.dims.headOption.getOrElse(1L).toInt)

    def isPhony(d: Dataset): Boolean =
      d.attrs.get("NAME").exists(_.render.startsWith("This is a netCDF dimension"))

    def axisNames(d: Dataset): Seq[String] =
      d.attrs.get("DIMENSION_LIST") match {
        case Some(a) if a.refs != null && a.refs.length == d.dims.length =>
          a.refs.toIndexedSeq.map(r => byAddr.get(r).map(_.name)
            .getOrElse(throw new IllegalArgumentException(s"unresolved dim ref $r")))
        case _ if byAddr.contains(d.addr) => Seq(d.name) // a dim scale: itself
        case _ =>
          // no DIMENSION_LIST (plain HDF5): synthesize phony dims by size
          d.dims.toIndexedSeq.zipWithIndex.map { case (s, i) => s"phony_dim_$i" }
      }

    // a compound member the model can read: fixed-width numeric or string
    def readableMember(t: Datatype): Boolean =
      (t.clazz == 0 && Set(1, 2, 4, 8).contains(t.size)) ||
        (t.clazz == 1 && (t.size == 4 || t.size == 8)) ||
        (t.clazz == 3 && t.size > 0)
    // columns a dataset contributes (compound: one per modelled member +
    // one per dataset attribute; vlen/nested members are SKIPPED, the
    // reference's stance — beacon-arrow-hdf5/src/reader/mod.rs:37-39)
    def keepsAny(d: Dataset): Boolean =
      if (d.dtype.clazz == 6)
        d.dtype.members.exists { case (m, _, t) => readableMember(t) && keep(s"${d.name}/$m") } ||
          d.attrs.keys.exists(k => keep(s"${d.name}.$k"))
      else keep(d.name)

    val extraDims = mutable.LinkedHashMap.empty[String, Int]
    val vars = datasets
      .filter(d => !byAddr.contains(d.addr) || !isPhony(d))
      .filter(keepsAny)
      .flatMap { d =>
      val attrs = d.attrs.view.filterKeys(k => !hiddenAttrs.contains(k))
        .map { case (k, v) => k -> v.render }.toMap
      val axes0 = axisNames(d)
      axes0.zip(d.dims).foreach { case (n, s) =>
        if (!dims.exists(_._1 == n)) extraDims.getOrElseUpdate(n, s.toInt)
      }
      // carriers of the split dim read only their index window along it
      // (chunked: only intersecting chunks load; the netcdf char-matrix
      // string-length axis is never treated as a data axis)
      val axisIdx =
        if (rdim == null) -1
        else {
          val i = axes0.indexOf(rdim)
          if (i >= 0 && d.dtype.clazz == 3 && d.dtype.size == 1 &&
              i == d.dims.length - 1 && d.dims.length > 0) -1
          else i
        }
      val raw =
        if (metaOnly) Array.empty[Byte]
        else if (axisIdx >= 0) readRawRows(h5, d, axisIdx, rstart.toLong, rend.toLong)
        else readRaw(h5, d)
      val dimsEff = d.dims.clone()
      if (axisIdx >= 0 && dimsEff.nonEmpty) dimsEff(axisIdx) = (rend - rstart).toLong
      def finish(v: NdVariable): NdVariable =
        if (rdim != null && axisIdx < 0 && v.dims.contains(rdim))
          graft.nd.NdSlice.sliceAxis(v,
            axes0.zip(d.dims.map(_.toInt)).toMap, rdim, rstart, rend)
        else v
      // compound dataset → one column per modelled member, named
      // `{dataset}/{member}` over the dataset's own dims; the dataset's
      // attributes become rank-0 `{dataset}.{attr}` columns; the compound
      // itself is NOT a column (reference reader/open.rs compound tests)
      if (d.dtype.clazz == 6) {
        val recSize = d.dtype.size
        val n = math.max(dimsEff.product.toInt, 0)
        val memberVars = d.dtype.members
          .filter { case (m, _, t) => readableMember(t) && keep(s"${d.name}/$m") }
          .map { case (m, moff, t) =>
            val col = s"${d.name}/$m"
            val v: NdVariable =
              if (metaOnly) {
                if (t.clazz == 3) NdVariable(col, axes0, null, Map.empty, Array.empty[String])
                else NdVariable(col, axes0, Array.empty[Double], Map.empty)
              } else if (t.clazz == 3) {
                val out = Array.tabulate(n)(i => cString(
                  java.util.Arrays.copyOfRange(raw, i * recSize + moff, i * recSize + moff + t.size)))
                NdVariable(col, axes0, null, Map.empty, out)
              } else {
                val bb = ByteBuffer.wrap(raw).order(
                  if (t.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
                val out = new Array[Double](n)
                var i = 0
                while (i < n) { bb.position(i * recSize + moff); out(i) = readNumAt(bb, t); i += 1 }
                NdVariable(col, axes0, out, Map.empty)
              }
            finish(v)
          }
        val attrVars = attrs.toSeq.sortBy(_._1).collect {
          case (k, value) if keep(s"${d.name}.$k") =>
            NdVariable(s"${d.name}.$k", Seq.empty, null, Map.empty, Array(value))
        }
        memberVars ++ attrVars
      } else if (!keep(d.name)) Nil
      else Seq {
      val decoded: NdVariable = if (metaOnly) {
        if (d.dtype.clazz == 3) {
          val outDims =
            if (d.dtype.size > 1 || d.dims.isEmpty) axes0 else axes0.dropRight(1)
          NdVariable(d.name, outDims, null, attrs, Array.empty[String])
        } else NdVariable(d.name, axes0, Array.empty[Double], attrs)
      } else if (d.dtype.clazz == 3) {
        // char/fixed-string data → strings; element size > 1 = string per cell,
        // element size 1 = netcdf char matrix: last dim is the string length
        if (d.dtype.size > 1 || d.dims.isEmpty) {
          val n = math.max(1, dimsEff.product).toInt
          val w = d.dtype.size
          val out = Array.tabulate(n)(i =>
            cString(java.util.Arrays.copyOfRange(raw, i * w, (i + 1) * w)))
          NdVariable(d.name, axes0, null, attrs, out)
        } else {
          val strLen = dimsEff.last.toInt
          val outerDims = axes0.dropRight(1)
          val n = dimsEff.dropRight(1).product.toInt
          val out = Array.tabulate(math.max(n, 0))(i =>
            cString(java.util.Arrays.copyOfRange(raw, i * strLen, (i + 1) * strLen)))
          NdVariable(d.name, outerDims, null, attrs, out)
        }
      } else {
        val n = dimsEff.product.toInt
        val bb = ByteBuffer.wrap(raw).order(
          if (d.dtype.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        val out = new Array[Double](n)
        var i = 0
        while (i < n) { out(i) = readNumAt(bb, d.dtype); i += 1 }
        NdVariable(d.name, axes0, out, attrs)
      }
      finish(decoded)
      }
    }
    val allDims = (dims ++ extraDims.toSeq).map { case (n, s) =>
      n -> (if (n == rdim) rend - rstart else s)
    }
    NdDataset(allDims, vars,
      rootAttrs.view.filterKeys(k => !hiddenAttrs.contains(k))
        .map { case (k, v) => k -> v.render }.toMap)
  }
}
