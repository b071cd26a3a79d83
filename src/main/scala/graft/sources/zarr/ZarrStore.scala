package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import graft.sources.io.ByteStore

import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.nd.{NdDataset, NdVariable}

/** Zarr store reader (v3 AND v2) — pure JVM. A v3 store is a directory
  * whose `zarr.json` declares a group (arrays in subdirectories) or a
  * single array; chunks live under `c/<i>/<j>/…` (default key
  * encoding). A v2 store carries `.zgroup`/`.zarray`/`.zattrs` JSON
  * (numpy dtype strings, `chunks`, `compressor`, C/F `order`,
  * "0.0"-style chunk keys) — or xarray's consolidated `.zmetadata`,
  * which is preferred when present so a remote store opens with ONE
  * metadata read instead of a listing. xarray's `_ARRAY_DIMENSIONS`
  * attribute binds v2 dimension names. Re-expresses the reference's
  * `read_zarr` surface (beacon-arrow-zarr/src/datafusion/source.rs,
  * backend.rs); chunk-grid pruning lives in [[ZarrSource]]'s DSv2 scan
  * (≈ beacon-nd-array/src/arrow/pushdown.rs).
  *
  * Codecs: bytes (endian), zstd (zstd-jni), gzip (java.util.zip),
  * zlib (raw deflate — numcodecs Zlib), lz4 (numcodecs 4-byte-header
  * framing), bz2 (commons-compress), blosc (header + lz4/zstd/zlib
  * blocks via the jars Spark ships), crc32c (verified-stripped), and
  * the v3 `transpose` array→array codec (which also carries v2
  * Fortran order as the reversed permutation). `sharding_indexed`
  * and v2 `filters` are not supported and error clearly, naming the
  * construct.
  */
object ZarrStore {

  final case class ZarrArray(
      name: String,
      dir: String,
      shape: Array[Long],
      dtype: String,
      chunkShape: Array[Int],
      sep: String,
      v2Keys: Boolean,
      fillValue: Double,
      codecs: List[(String, Map[String, JValue])],
      dims: Seq[String],
      attrs: Map[String, String])

  final case class Store(root: String, arrays: Seq[ZarrArray],
      globalAttrs: Map[String, String]) {
    /** name → size for every named dimension (consistency-checked) */
    def dimSizes: Seq[(String, Int)] = {
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      arrays.foreach { a =>
        a.dims.zip(a.shape).foreach { case (d, s) =>
          out.get(d) match {
            case Some(prev) => require(prev == s.toInt, s"dimension $d: $prev vs $s")
            case None => out(d) = s.toInt
          }
        }
      }
      out.toSeq
    }
  }

  /** the root metadata files that mark a zarr store, in open-precedence
    * order: v3, then v2 consolidated, then v2 listed */
  private val rootMetaNames = Seq("zarr.json", ".zmetadata", ".zgroup", ".zarray")

  def isZarr(path: String): Boolean =
    ByteStore.isDirectory(path) &&
      rootMetaNames.exists(n => ByteStore.exists(ByteStore.resolve(path, n)))

  // --------------------------------------------------------- metadata

  /** Per-JVM store-metadata cache: N chunk tasks scheduled on one
    * executor parse zarr.json (+ every array's zarr.json) once, not once
    * per task. Keyed by (path, root zarr.json mtime) so a rewritten
    * store is re-parsed, never served stale. */
  private val storeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Store]()
  /** observable for specs: number of full metadata parses performed */
  val metadataParses = new java.util.concurrent.atomic.AtomicLong(0)

  def openCached(path0: String): Store = {
    val root = ByteStore.toLocal(path0)
    val metaFile = rootMetaNames.map(ByteStore.resolve(root, _))
      .find(ByteStore.exists).getOrElse(ByteStore.resolve(root, "zarr.json"))
    val mtime = ByteStore.mtime(metaFile)
    // bounded: metadata is small, but a long-lived executor visiting many
    // (or rewritten) stores must not accumulate entries forever
    if (storeCache.size > 64) storeCache.clear()
    storeCache.computeIfAbsent((root, mtime), _ => open(path0))
  }

  def open(path0: String): Store = {
    metadataParses.incrementAndGet()
    val root = ByteStore.toLocal(path0)
    if (ByteStore.exists(ByteStore.resolve(root, "zarr.json"))) openV3(root)
    else if (ByteStore.exists(ByteStore.resolve(root, ".zmetadata")))
      openV2Consolidated(root)
    else if (ByteStore.exists(ByteStore.resolve(root, ".zgroup")) ||
      ByteStore.exists(ByteStore.resolve(root, ".zarray"))) openV2Listed(root)
    else throw new IllegalArgumentException(
      s"$root: no zarr metadata (zarr.json / .zmetadata / .zgroup / .zarray)")
  }

  private def openV3(root: String): Store = {
    val meta = parseJson(ByteStore.resolve(root, "zarr.json"))
    (meta \ "node_type") match {
      case JString("array") =>
        Store(root, Seq(parseArray(ByteStore.fileName(root), root, meta)),
          attrMap(meta \ "attributes"))
      case JString("group") =>
        val arrays = ByteStore.list(root)
          .filter(p => ByteStore.isDirectory(p) &&
            ByteStore.exists(ByteStore.resolve(p, "zarr.json")))
          .map { dir =>
            val am = parseJson(ByteStore.resolve(dir, "zarr.json"))
            (dir, am)
          }
          .collect { case (dir, am) if (am \ "node_type") == JString("array") =>
            parseArray(ByteStore.fileName(dir), dir, am)
          }
        Store(root, arrays, attrMap(meta \ "attributes"))
      case other => throw new IllegalArgumentException(s"zarr.json node_type: $other")
    }
  }

  /** v2 store opened from xarray's consolidated `.zmetadata`: every
    * `.zarray`/`.zattrs` document is embedded, so no directory listing
    * or per-array metadata reads happen — the store opens even when the
    * per-array sidecar files are absent (object stores serving only the
    * consolidated doc). */
  private def openV2Consolidated(root: String): Store = {
    val meta = parseJson(ByteStore.resolve(root, ".zmetadata"))
    val entries: Map[String, JValue] = (meta \ "metadata") match {
      case JObject(fields) => fields.toMap
      case other => throw new IllegalArgumentException(
        s"$root: .zmetadata has no 'metadata' object ($other)")
    }
    entries.get(".zarray") match {
      case Some(za) => // root-level single array
        Store(root, Seq(parseArrayV2(ByteStore.fileName(root), root, za,
          entries.getOrElse(".zattrs", JNothing))), Map.empty)
      case None =>
        val gattrs = entries.get(".zattrs").map(v => v2Attrs(v)._2).getOrElse(Map.empty)
        val arrays = entries.keys.filter(_.endsWith("/.zarray")).toSeq.sorted.map { k =>
          val rel = k.stripSuffix("/.zarray")
          val dir = rel.split('/').foldLeft(root)((r, seg) => ByteStore.resolve(r, seg))
          parseArrayV2(rel.split('/').last, dir, entries(k),
            entries.getOrElse(rel + "/.zattrs", JNothing))
        }
        require(arrays.map(_.name).distinct.size == arrays.size,
          s"$root: duplicate array names across consolidated group paths")
        Store(root, arrays, gattrs)
    }
  }

  /** v2 store opened by listing (no consolidated metadata) */
  private def openV2Listed(root: String): Store = {
    if (ByteStore.exists(ByteStore.resolve(root, ".zarray"))) {
      Store(root, Seq(parseArrayV2(ByteStore.fileName(root), root,
        parseJson(ByteStore.resolve(root, ".zarray")),
        optJson(ByteStore.resolve(root, ".zattrs")))), Map.empty)
    } else {
      val gattrs = v2Attrs(optJson(ByteStore.resolve(root, ".zattrs")))._2
      val arrays = ByteStore.list(root)
        .filter(p => ByteStore.isDirectory(p) &&
          ByteStore.exists(ByteStore.resolve(p, ".zarray")))
        .map { dir =>
          parseArrayV2(ByteStore.fileName(dir), dir,
            parseJson(ByteStore.resolve(dir, ".zarray")),
            optJson(ByteStore.resolve(dir, ".zattrs")))
        }
      Store(root, arrays, gattrs)
    }
  }

  private def parseJson(p: String): JValue =
    JsonMethods.parse(ByteStore.readString(p))

  private def optJson(p: String): JValue =
    if (ByteStore.exists(p)) parseJson(p) else JNothing

  /** one `.zarray` (+ optional `.zattrs`) document → the shared array
    * model. v2 specifics normalize into the v3 vocabulary: the numpy
    * dtype string splits into (data_type, endian) with the endian
    * riding a `bytes` codec, Fortran `order` becomes a reversed-
    * permutation `transpose` codec, and the `compressor` document maps
    * onto the codec chain. `filters` are rejected loudly by id. */
  private[sources] def parseArrayV2(name: String, dir: String, m: JValue,
      zattrs: JValue): ZarrArray = {
    require((m \ "zarr_format") == JInt(2), s"$name: .zarray zarr_format must be 2")
    val shape = (m \ "shape").asInstanceOf[JArray].arr.map(jLong).toArray
    val chunkShape = (m \ "chunks").asInstanceOf[JArray].arr.map(jLong(_).toInt).toArray
    val dtypeStr = (m \ "dtype") match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"$name: dtype $other")
    }
    val (dtype, endian) = numpyDtype(name, dtypeStr)
    val sep = (m \ "dimension_separator") match {
      case JString(s) => s
      case _ => "."
    }
    val fill = (m \ "fill_value") match {
      case JInt(v) => v.toDouble
      case JDouble(v) => v
      case JDecimal(v) => v.toDouble
      case JBool(b) => if (b) 1.0 else 0.0
      case JString("NaN") => Double.NaN
      case JString("Infinity") => Double.PositiveInfinity
      case JString("-Infinity") => Double.NegativeInfinity
      case _ => Double.NaN
    }
    (m \ "filters") match {
      case JNull | JNothing | JArray(Nil) => ()
      case JArray(fs) =>
        val ids = fs.map(f => (f \ "id") match {
          case JString(s) => s
          case _ => "?"
        })
        throw new IllegalArgumentException(
          s"$name: zarr v2 filters unsupported: ${ids.mkString(", ")}")
      case other => throw new IllegalArgumentException(s"$name: filters $other")
    }
    // v3 codec ordering (encode direction): array→array transpose first,
    // then the array→bytes endian codec, then bytes→bytes compression
    var codecs: List[(String, Map[String, JValue])] =
      List(("bytes", Map("endian" -> JString(endian))))
    (m \ "order") match {
      case JString("C") | JNothing => ()
      case JString("F") =>
        val perm = JArray(shape.indices.reverse.map(i => JInt(i): JValue).toList)
        codecs = ("transpose", Map[String, JValue]("order" -> perm)) :: codecs
      case other => throw new IllegalArgumentException(s"$name: order $other")
    }
    (m \ "compressor") match {
      case JNull | JNothing => ()
      case c =>
        val id = (c \ "id") match {
          case JString(s) => s
          case other => throw new IllegalArgumentException(s"$name: compressor id $other")
        }
        val conf = c match {
          case JObject(fields) => fields.toMap - "id"
          case _ => Map.empty[String, JValue]
        }
        val cname = id match {
          case "blosc" => "blosc"
          case "zlib" => "zlib"
          case "gzip" => "gzip"
          case "zstd" => "zstd"
          case "lz4" => "lz4_nc" // numcodecs framing: 4-byte LE raw size + block
          case "bz2" => "bz2"
          case other => throw new IllegalArgumentException(
            s"$name: zarr v2 compressor '$other' unsupported")
        }
        codecs = codecs :+ ((cname, conf))
    }
    val (dimsOpt, attrs) = v2Attrs(zattrs)
    val dims = dimsOpt.getOrElse(shape.indices.map(i => s"${name}_dim$i").toSeq)
    require(dims.length == shape.length,
      s"$name: _ARRAY_DIMENSIONS has ${dims.length} names for rank ${shape.length}")
    ZarrArray(name, dir, shape, dtype, chunkShape, sep, v2Keys = true, fill,
      codecs, dims, attrs)
  }

  /** numpy dtype string → (v3 data_type, endian). '|'/'=' mean
    * byte-order-free / native, which for a portable store is little. */
  private[graft] def numpyDtype(name: String, s: String): (String, String) = {
    require(s.length >= 3, s"$name: numpy dtype '$s' too short")
    val endian = s.head match {
      case '>' => "big"
      case '<' | '|' | '=' => "little"
      case other => throw new IllegalArgumentException(
        s"$name: numpy dtype byte order '$other' in '$s'")
    }
    val base = s.tail match {
      case "b1" => "bool"
      case "i1" => "int8"
      case "u1" => "uint8"
      case "i2" => "int16"
      case "u2" => "uint16"
      case "i4" => "int32"
      case "u4" => "uint32"
      case "i8" => "int64"
      case "u8" => "uint64"
      case "f4" => "float32"
      case "f8" => "float64"
      case other => throw new IllegalArgumentException(
        s"$name: numpy dtype '$s' unsupported")
    }
    (base, endian)
  }

  /** v2 `.zattrs` → (xarray `_ARRAY_DIMENSIONS` if present, attrs) */
  private def v2Attrs(v: JValue): (Option[Seq[String]], Map[String, String]) = v match {
    case JObject(fields) =>
      val dims = fields.toMap.get("_ARRAY_DIMENSIONS") match {
        case Some(JArray(ds)) => Some(ds.collect { case JString(d) => d })
        case _ => None
      }
      (dims, fields.filterNot(_._1 == "_ARRAY_DIMENSIONS")
        .map { case (k, jv) => k -> renderAttr(jv) }.toMap)
    case _ => (None, Map.empty)
  }

  private[sources] def parseArray(name: String, dir: String, m: JValue): ZarrArray = {
    require((m \ "zarr_format") == JInt(3), s"$name: only zarr v3 supported")
    val shape = (m \ "shape").asInstanceOf[JArray].arr.map(jLong).toArray
    val dtype = (m \ "data_type") match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"$name: data_type $other")
    }
    val chunkShape = (m \ "chunk_grid" \ "configuration" \ "chunk_shape")
      .asInstanceOf[JArray].arr.map(jLong(_).toInt).toArray
    require((m \ "chunk_grid" \ "name") == JString("regular"), "chunk_grid must be regular")
    val (sep, v2k) = (m \ "chunk_key_encoding" \ "name") match {
      case JString("default") =>
        ((m \ "chunk_key_encoding" \ "configuration" \ "separator") match {
          case JString(s) => s
          case _ => "/"
        }, false)
      case JString("v2") =>
        ((m \ "chunk_key_encoding" \ "configuration" \ "separator") match {
          case JString(s) => s
          case _ => "."
        }, true)
      case other => throw new IllegalArgumentException(s"chunk_key_encoding $other")
    }
    val fill = (m \ "fill_value") match {
      case JInt(v) => v.toDouble
      case JDouble(v) => v
      case JDecimal(v) => v.toDouble
      case JBool(b) => if (b) 1.0 else 0.0
      case JString("NaN") => Double.NaN
      case JString("Infinity") => Double.PositiveInfinity
      case JString("-Infinity") => Double.NegativeInfinity
      case _ => Double.NaN
    }
    val codecs = (m \ "codecs") match {
      case JArray(cs) => cs.map { c =>
        val cname = (c \ "name") match {
          case JString(s) => s
          case other => throw new IllegalArgumentException(s"codec name $other")
        }
        val conf = (c \ "configuration") match {
          case JObject(fields) => fields.toMap
          case _ => Map.empty[String, JValue]
        }
        (cname, conf)
      }
      case _ => List(("bytes", Map.empty[String, JValue]))
    }
    val dims = (m \ "dimension_names") match {
      case JArray(ds) => ds.zipWithIndex.map {
        case (JString(d), _) => d
        case (_, i) => s"${name}_dim$i"
      }
      case _ => shape.indices.map(i => s"${name}_dim$i").toSeq
    }
    ZarrArray(name, dir, shape, dtype, chunkShape, sep, v2k, fill, codecs, dims,
      attrMap(m \ "attributes"))
  }

  private def jLong(v: JValue): Long = v match {
    case JInt(i) => i.toLong
    case JDouble(d) => d.toLong
    case JDecimal(d) => d.toLong
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }

  /** verbatim attribute rendering (same contract as the NetCDF readers) */
  private def attrMap(v: JValue): Map[String, String] = v match {
    case JObject(fields) => fields.map { case (k, jv) => k -> renderAttr(jv) }.toMap
    case _ => Map.empty
  }

  private def renderAttr(v: JValue): String = v match {
    case JString(s) => s
    case JInt(i) => i.toString
    case JDouble(d) =>
      if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case JDecimal(d) => d.toString
    case JBool(b) => b.toString
    case JArray(vs) => vs.map(renderAttr).mkString(",")
    case JNull => ""
    case other => JsonMethods.compact(JsonMethods.render(other))
  }

  // ------------------------------------------------------------ types

  def elemSize(dtype: String): Int = dtype match {
    case "bool" | "int8" | "uint8" => 1
    case "int16" | "uint16" => 2
    case "int32" | "uint32" | "float32" => 4
    case "int64" | "uint64" | "float64" => 8
    case other => throw new IllegalArgumentException(s"zarr data_type $other unsupported")
  }

  private def readElem(b: ByteBuffer, dtype: String): Double = dtype match {
    case "bool"    => if (b.get() != 0) 1.0 else 0.0
    case "int8"    => b.get().toDouble
    case "uint8"   => (b.get() & 0xFF).toDouble
    case "int16"   => b.getShort().toDouble
    case "uint16"  => (b.getShort() & 0xFFFF).toDouble
    case "int32"   => b.getInt().toDouble
    case "uint32"  => (b.getInt() & 0xFFFFFFFFL).toDouble
    case "int64"   => b.getLong().toDouble
    case "uint64"  => b.getLong().toDouble // >2^63 degrades (documented)
    case "float32" => b.getFloat().toDouble
    case "float64" => b.getDouble()
  }

  // ----------------------------------------------------------- chunks

  def chunkKey(a: ZarrArray, idx: Array[Int]): String =
    if (a.v2Keys) {
      if (idx.isEmpty) "0" else idx.mkString(a.sep)
    } else {
      if (idx.isEmpty) "c" else "c" + a.sep + idx.mkString(a.sep)
    }

  /** decode one chunk into doubles (fill-valued when the file is absent) */
  def readChunk(a: ZarrArray, idx: Array[Int]): Array[Double] = {
    val n = a.chunkShape.map(_.toLong).product.toInt
    val p = ByteStore.resolve(a.dir, chunkKey(a, idx))
    if (!ByteStore.exists(p)) return Array.fill(n)(a.fillValue)
    decodeChunkBytes(a, ByteStore.readAll(p))
  }

  /** codec pipeline only: encoded chunk payload → doubles. Shared with
    * stores that fetch chunk bytes elsewhere (icechunk repositories). */
  def decodeChunkBytes(a: ZarrArray, bytes0: Array[Byte]): Array[Double] = {
    val n = a.chunkShape.map(_.toLong).product.toInt
    var bytes = bytes0
    var endian: ByteOrder = ByteOrder.LITTLE_ENDIAN
    // codecs apply in reverse on read; transpose (array→array) runs last,
    // after the bytes have decoded into values
    a.codecs.reverse.foreach { case (cname, conf) =>
      cname match {
        case "bytes" =>
          endian = conf.get("endian") match {
            case Some(JString("big")) => ByteOrder.BIG_ENDIAN
            case _ => ByteOrder.LITTLE_ENDIAN
          }
        case "transpose" => () // value-level; applied below
        case "zstd" =>
          val dst = new Array[Byte](n * elemSize(a.dtype))
          val got = com.github.luben.zstd.Zstd.decompress(dst, bytes)
          require(got == dst.length, s"zstd: $got of ${dst.length} bytes")
          bytes = dst
        case "gzip" =>
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes))
          bytes = in.readAllBytes()
          in.close()
        case "zlib" => // raw deflate stream (numcodecs Zlib)
          val inf = new java.util.zip.Inflater()
          inf.setInput(bytes)
          val dst = new Array[Byte](n * elemSize(a.dtype))
          var off = 0
          while (!inf.finished() && off < dst.length) {
            val got = inf.inflate(dst, off, dst.length - off)
            require(got > 0 || inf.finished(), s"zlib: truncated chunk at $off")
            off += got
          }
          inf.end()
          require(off == dst.length, s"zlib: $off of ${dst.length} bytes")
          bytes = dst
        case "lz4_nc" => // numcodecs LZ4: int32 LE raw size, then one block
          val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          val raw = bb.getInt()
          val dst = new Array[Byte](raw)
          net.jpountz.lz4.LZ4Factory.fastestJavaInstance().safeDecompressor()
            .decompress(bytes, 4, bytes.length - 4, dst, 0)
          bytes = dst
        case "bz2" =>
          val in = new org.apache.commons.compress.compressors.bzip2
            .BZip2CompressorInputStream(new java.io.ByteArrayInputStream(bytes))
          bytes = in.readAllBytes()
          in.close()
        case "blosc" =>
          bytes = bloscDecode(bytes, n * elemSize(a.dtype))
        case "crc32c" =>
          bytes = java.util.Arrays.copyOf(bytes, bytes.length - 4)
        case other =>
          throw new IllegalArgumentException(s"zarr codec '$other' unsupported")
      }
    }
    val bb = ByteBuffer.wrap(bytes).order(endian)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = readElem(bb, a.dtype); i += 1 }
    a.codecs.collectFirst { case ("transpose", conf) => conf } match {
      case Some(conf) =>
        val perm = conf.get("order") match {
          case Some(JArray(is)) => is.map(jLong(_).toInt).toArray
          case other => throw new IllegalArgumentException(
            s"transpose codec: order $other")
        }
        unpermute(out, a.chunkShape, perm)
      case None => out
    }
  }

  /** inverse of the v3 `transpose` codec (also carries v2 Fortran
    * order as the reversed permutation): the stored array's shape is
    * `chunkShape` permuted by `order` with
    * stored[x(order(0)), …, x(order(k))] = chunk[x(0), …, x(k)];
    * rebuild the chunk in C order. One pass, stride-incremental. */
  private[graft] def unpermute(stored: Array[Double], chunkShape: Array[Int],
      perm: Array[Int]): Array[Double] = {
    val rank = chunkShape.length
    require(perm.length == rank && perm.sorted.sameElements(0 until rank),
      s"transpose order ${perm.mkString(",")} is not a permutation of 0..${rank - 1}")
    if (rank <= 1 || perm.sameElements(Array.range(0, rank))) return stored
    // stride of decoded dim i inside the stored (C-order, permuted) layout
    val sShape = perm.map(chunkShape)
    val sStrides = new Array[Long](rank)
    var m = 1L
    var j = rank - 1
    while (j >= 0) { sStrides(j) = m; m *= sShape(j); j -= 1 }
    val strOfDim = new Array[Long](rank)
    j = 0
    while (j < rank) { strOfDim(perm(j)) = sStrides(j); j += 1 }
    val n = stored.length
    val out = new Array[Double](n)
    val idx = new Array[Int](rank)
    var p = 0
    var sOff = 0L
    while (p < n) {
      out(p) = stored(sOff.toInt)
      var d = rank - 1
      var cont = true
      while (cont && d >= 0) {
        idx(d) += 1
        sOff += strOfDim(d)
        if (idx(d) == chunkShape(d)) {
          sOff -= strOfDim(d) * chunkShape(d)
          idx(d) = 0
          d -= 1
        } else cont = false
      }
      p += 1
    }
    out
  }

  /** blosc frame: 16-byte header + optional block starts; inner blocks
    * lz4 / zstd / zlib; shuffle undone per typesize */
  private def bloscDecode(src: Array[Byte], rawSize: Int): Array[Byte] = {
    val h = ByteBuffer.wrap(src).order(ByteOrder.LITTLE_ENDIAN)
    h.get() // version
    h.get() // versionlz
    val flags = h.get() & 0xFF
    val typesize = h.get() & 0xFF
    val nbytes = h.getInt()
    val blocksize = h.getInt()
    val cbytes = h.getInt()
    require(nbytes == rawSize, s"blosc nbytes $nbytes != expected $rawSize")
    val out = new Array[Byte](nbytes)
    val memcpyed = (flags & 0x2) != 0
    if (memcpyed) {
      System.arraycopy(src, 16, out, 0, nbytes)
    } else {
      val nblocks = (nbytes + blocksize - 1) / blocksize
      val starts = (0 until nblocks).map(_ => h.getInt())
      val compressor = (flags >> 5) & 0x7
      var b = 0
      while (b < nblocks) {
        val off = starts(b)
        val thisRaw = math.min(blocksize, nbytes - b * blocksize)
        val bb = ByteBuffer.wrap(src).order(ByteOrder.LITTLE_ENDIAN)
        bb.position(off)
        val csize = bb.getInt()
        compressor match {
          case 1 => // lz4/lz4hc
            net.jpountz.lz4.LZ4Factory.fastestJavaInstance().fastDecompressor()
              .decompress(src, off + 4, out, b * blocksize, thisRaw)
          case 3 => // zlib
            val inf = new java.util.zip.Inflater()
            inf.setInput(src, off + 4, csize)
            inf.inflate(out, b * blocksize, thisRaw)
            inf.end()
          case 4 => // zstd
            val tmp = new Array[Byte](thisRaw)
            com.github.luben.zstd.Zstd.decompress(tmp,
              java.util.Arrays.copyOfRange(src, off + 4, off + 4 + csize))
            System.arraycopy(tmp, 0, out, b * blocksize, thisRaw)
          case 0 => // blosclz — no JVM impl
            throw new IllegalArgumentException("blosc: blosclz compressor unsupported")
          case other =>
            throw new IllegalArgumentException(s"blosc compressor $other unsupported")
        }
        b += 1
      }
    }
    val shuffle = flags & 0x1
    if (shuffle == 1 && typesize > 1) {
      val n = nbytes / typesize
      val un = new Array[Byte](nbytes)
      var j = 0
      while (j < typesize) {
        var k = 0
        while (k < n) { un(k * typesize + j) = out(j * n + k); k += 1 }
        j += 1
      }
      un
    } else out
  }

  // ----------------------------------------------------- region reads

  /** read an arbitrary region [start, end) per dim into a C-order array */
  def readRegion(a: ZarrArray, start: Array[Long], end: Array[Long]): Array[Double] = {
    val rank = a.shape.length
    require(start.length == rank && end.length == rank)
    val rdims = Array.tabulate(rank)(i => (end(i) - start(i)).toInt)
    val n = rdims.map(_.toLong).product.toInt
    val out = new Array[Double](math.max(n, 0))
    if (n == 0) return out
    if (rank == 0) return readChunk(a, Array.empty)

    val c0 = Array.tabulate(rank)(i => (start(i) / a.chunkShape(i)).toInt)
    val c1 = Array.tabulate(rank)(i => ((end(i) - 1) / a.chunkShape(i)).toInt)
    val cidx = c0.clone()
    var done = false
    while (!done) {
      val chunk = readChunk(a, cidx)
      copyOverlap(chunk, a.chunkShape, cidx, out, rdims, start, end)
      // advance odometer
      var d = rank - 1
      var carry = true
      while (carry && d >= 0) {
        cidx(d) += 1
        if (cidx(d) > c1(d)) { cidx(d) = c0(d); d -= 1 }
        else carry = false
      }
      if (carry) done = true
    }
    out
  }

  private[sources] def copyOverlap(chunk: Array[Double], cshape: Array[Int], cidx: Array[Int],
      out: Array[Double], rdims: Array[Int], start: Array[Long], end: Array[Long]): Unit = {
    val rank = cshape.length
    // overlap box in global coords
    val lo = new Array[Long](rank)
    val hi = new Array[Long](rank)
    var d = 0
    while (d < rank) {
      val cLo = cidx(d).toLong * cshape(d)
      lo(d) = math.max(cLo, start(d))
      hi(d) = math.min(cLo + cshape(d), end(d))
      if (hi(d) <= lo(d)) return
      d += 1
    }
    // iterate outer dims of the overlap, copy runs of the last dim
    val runLen = (hi(rank - 1) - lo(rank - 1)).toInt
    val nOuter = (0 until rank - 1).map(i => hi(i) - lo(i)).product
    val idx = new Array[Long](math.max(rank - 1, 0))
    var it = 0L
    val total = if (rank == 1) 1L else nOuter
    while (it < total) {
      var rem = it
      var k = rank - 2
      while (k >= 0) { val w = hi(k) - lo(k); idx(k) = rem % w; rem /= w; k -= 1 }
      var srcOff = 0L
      var dstOff = 0L
      var mulSrc = 1L
      var mulDst = 1L
      // last dim
      srcOff = (lo(rank - 1) - cidx(rank - 1).toLong * cshape(rank - 1))
      dstOff = (lo(rank - 1) - start(rank - 1))
      mulSrc = cshape(rank - 1)
      mulDst = rdims(rank - 1)
      k = rank - 2
      while (k >= 0) {
        val g = lo(k) + idx(k)
        srcOff += (g - cidx(k).toLong * cshape(k)) * mulSrc
        dstOff += (g - start(k)) * mulDst
        mulSrc *= cshape(k)
        mulDst *= rdims(k)
        k -= 1
      }
      System.arraycopy(chunk, srcOff.toInt, out, dstOff.toInt, runLen)
      it += 1
    }
  }

  // -------------------------------------------------------- ND mapping

  /** whole store → ND model (small stores / tests; the DSv2 path reads
    * per-chunk regions instead) */
  def readDataset(path: String): NdDataset = {
    val store = open(path)
    regionDataset(store, store.dimSizes.map { case (d, s) => (d, 0L, s.toLong) })
  }

  /** ND model restricted to a region given as (dim, start, end) */
  def regionDataset(store: Store, region: Seq[(String, Long, Long)]): NdDataset = {
    val bounds = region.map { case (d, a, b) => d -> (a, b) }.toMap
    // non-region dims keep full size (their variables fall outside the
    // grid and are dropped by the flatten rule, but must stay declared)
    val dims = region.map { case (d, a, b) => d -> (b - a).toInt } ++
      store.dimSizes.filterNot { case (d, _) => bounds.contains(d) }
    val vars = store.arrays.map { a =>
      val start = a.dims.map(d => bounds.get(d).map(_._1).getOrElse(0L)).toArray
      val end = a.dims.zip(a.shape).map { case (d, s) =>
        bounds.get(d).map(_._2).getOrElse(s)
      }.toArray
      NdVariable(a.name, a.dims, readRegion(a, start, end), a.attrs)
    }
    NdDataset(dims, vars, store.globalAttrs)
  }
}
