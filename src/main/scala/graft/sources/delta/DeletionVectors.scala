package graft.sources.delta

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import java.util.zip.CRC32

/** Delta Lake deletion vectors (PROTOCOL.md "Deletion Vectors"): the
  * serialized form is a 64-bit RoaringBitmapArray in "portable" layout —
  * a 4-byte little-endian magic (1681511377), an 8-byte little-endian
  * bitmap count, then one standard-format 32-bit RoaringBitmap per high
  * word — wrapped on disk as `[size:int32 BE][data][crc32:int32 BE]`
  * blocks inside a `deletion_vector_<uuid>.bin` file whose first byte is
  * the format version (1). Descriptors locate the block by byte offset;
  * inline DVs (`storageType "i"`) carry the bitmap data itself,
  * Z85-encoded. The reference reads these through the deltalake crate
  * (beacon-delta/); this is a from-scratch JVM implementation of the
  * same open format.
  *
  * The 32-bit bitmap body follows the public RoaringFormatSpec: cookie
  * 12346 (no run containers, size in the next int) or 12347 (run flag
  * bitset follows; size in the cookie's high 16 bits), `size` pairs of
  * (key, cardinality-1) shorts, optional per-container byte offsets,
  * then the containers — sorted-short arrays (≤4096 values), 8 KiB
  * bitsets, or (start, length-1) run lists. Everything little-endian.
  */
object DeletionVectors {

  val PortableMagic = 1681511377

  // ------------------------------------------------------------- z85

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val m = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => m(c.toInt) = i }
    m
  }

  /** 4 bytes → 5 chars, big-endian per 4-byte group (ZeroMQ Z85) */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 input must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(Z85Alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 input must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 0
      while (k < 4) { out(i / 5 * 4 + k) = ((v >>> (8 * (3 - k))) & 0xFF).toByte; k += 1 }
      i += 5
    }
    out
  }

  // ------------------------------------------- roaring bitmap (array)

  /** decode a portable 64-bit RoaringBitmapArray → sorted row indexes */
  def decodeBitmap(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == PortableMagic, s"bad RoaringBitmapArray magic: $magic")
    val n = buf.getLong
    require(n >= 0 && n <= Int.MaxValue, s"bad bitmap count $n")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var hi = 0L
    while (hi < n) {
      decode32(buf, v => out += (hi << 32) | (v & 0xFFFFFFFFL))
      hi += 1
    }
    out.toArray
  }

  private val SerialCookie = 12347
  private val SerialCookieNoRun = 12346

  /** one standard-format 32-bit RoaringBitmap, values in ascending order */
  private def decode32(buf: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = buf.getInt
    val hasRun = (cookie & 0xFFFF) == SerialCookie
    require(hasRun || cookie == SerialCookieNoRun, s"bad roaring cookie $cookie")
    val size = if (hasRun) (cookie >>> 16) + 1 else buf.getInt
    val runFlags = new Array[Byte](if (hasRun) (size + 7) / 8 else 0)
    if (hasRun) buf.get(runFlags)
    def isRun(i: Int) = hasRun && (runFlags(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = buf.getShort & 0xFFFF
      cards(i) = (buf.getShort & 0xFFFF) + 1
      i += 1
    }
    // per-container offsets are present without runs, or with ≥4 containers
    if (!hasRun || size >= 4) { var j = 0; while (j < size) { buf.getInt; j += 1 } }
    i = 0
    while (i < size) {
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort & 0xFFFF
          val len = buf.getShort & 0xFFFF
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) { // bitset container: 1024 longs
        var w = 0
        while (w < 1024) {
          var bits = buf.getLong
          while (bits != 0) {
            val b = java.lang.Long.numberOfTrailingZeros(bits)
            emit(base | (w * 64 + b))
            bits &= bits - 1
          }
          w += 1
        }
      } else { // sorted short array
        var v = 0
        while (v < cards(i)) { emit(base | (buf.getShort & 0xFFFF)); v += 1 }
      }
      i += 1
    }
  }

  /** encode sorted row indexes as a portable 64-bit RoaringBitmapArray
    * (array containers ≤4096 values, bitset containers above) */
  def encodeBitmap(rows: Array[Long]): Array[Byte] = {
    require(rows.sameElements(rows.sorted), "row indexes must be sorted")
    val nBitmaps = if (rows.isEmpty) 0L else (rows.last >>> 32) + 1
    val out = new java.io.ByteArrayOutputStream()
    def putLE(bytes: Int, v: Long): Unit = {
      var i = 0
      while (i < bytes) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    putLE(4, PortableMagic)
    putLE(8, nBitmaps)
    var hi = 0L
    while (hi < nBitmaps) {
      val vals = rows.filter(r => (r >>> 32) == hi).map(r => (r & 0xFFFFFFFFL).toInt)
      val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      putLE(4, SerialCookieNoRun)
      putLE(4, byKey.size)
      byKey.foreach { case (k, vs) => putLE(2, k); putLE(2, vs.length - 1) }
      // offsets (always present with the no-run cookie)
      var off = 4 + 4 + byKey.size * 4 + byKey.size * 4
      byKey.foreach { case (_, vs) =>
        putLE(4, off)
        off += (if (vs.length > 4096) 8192 else vs.length * 2)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.length > 4096) {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low = v & 0xFFFF
            words(low / 64) |= 1L << (low % 64)
          }
          words.foreach(putLE(8, _))
        } else vs.foreach(v => putLE(2, v & 0xFFFF))
      }
      hi += 1
    }
    out.toByteArray
  }

  // ---------------------------------------------------------- on disk

  final case class Descriptor(
      storageType: String, pathOrInlineDv: String,
      offset: Int, sizeInBytes: Int, cardinality: Long)

  /** deleted row indexes for one descriptor ("i" inline, "u" relative
    * uuid file, "p" absolute path) */
  def deletedRows(tablePath: String, d: Descriptor): Array[Long] = d.storageType match {
    case "i" => decodeBitmap(z85Decode(d.pathOrInlineDv))
    case "u" | "p" =>
      val file =
        if (d.storageType == "p") d.pathOrInlineDv
        else {
          // pathOrInlineDv = <optional prefix><20-char z85 uuid>
          val z = d.pathOrInlineDv.takeRight(20)
          val prefix = d.pathOrInlineDv.dropRight(20)
          val b = ByteBuffer.wrap(z85Decode(z))
          val uuid = new java.util.UUID(b.getLong, b.getLong)
          val dir = if (prefix.isEmpty) tablePath
            else graft.sources.io.ByteStore.resolve(tablePath, prefix.stripSuffix("/"))
          graft.sources.io.ByteStore.resolve(dir, s"deletion_vector_$uuid.bin")
        }
      val all = graft.sources.io.ByteStore.readAll(file)
      val buf = ByteBuffer.wrap(all).order(ByteOrder.BIG_ENDIAN)
      buf.position(d.offset)
      val size = buf.getInt
      require(size == d.sizeInBytes,
        s"DV size mismatch at offset ${d.offset}: file says $size, descriptor ${d.sizeInBytes}")
      val data = new Array[Byte](size)
      buf.get(data)
      val crc = buf.getInt
      val c = new CRC32(); c.update(data)
      require(crc == c.getValue.toInt, s"DV checksum mismatch in $file")
      decodeBitmap(data)
    case other => throw new IllegalArgumentException(s"unknown DV storageType '$other'")
  }

  /** Write one DV file holding a bitmap per (relative data file path) and
    * return the descriptors. Layout: version byte 1, then per entry
    * `[size BE][data][crc32 BE]`. */
  def writeFile(tableDir: Path, perFile: Seq[(String, Array[Long])]): Seq[(String, Descriptor)] = {
    val uuid = java.util.UUID.randomUUID()
    val ub = ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits); ub.putLong(uuid.getLeastSignificantBits)
    val z = z85Encode(ub.array())
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // format version
    val descs = perFile.map { case (dataPath, rows) =>
      val data = encodeBitmap(rows)
      val offset = out.size()
      val hdr = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(data.length)
      out.write(hdr.array())
      out.write(data)
      val c = new CRC32(); c.update(data)
      val crc = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(c.getValue.toInt)
      out.write(crc.array())
      dataPath -> Descriptor("u", z, offset, data.length, rows.length.toLong)
    }
    Files.write(tableDir.resolve(s"deletion_vector_$uuid.bin"), out.toByteArray)
    descs
  }
}
