package graft.sources.tiff

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

import graft.nd.{NdDataset, NdVariable}

/** TIFF / GeoTIFF reader — pure JVM, no imageio. Produces the same ND
  * surface as the reference's `beacon-arrow-tiff` (reader.rs:76-180):
  * dims `y`(height) × `x`(width); one `band.N` variable per sample;
  * 1-D `geo.lat`(y) / `geo.lon`(x) axes derived from the GeoTIFF
  * tiepoint+scale or a rectilinear model transformation
  * (reader.rs:200-270: lon[x] = tie_wx + (x-tie_px)·sx,
  * lat[y] = tie_wy − (y-tie_py)·sy; matrix form lon[x] = a·x + d,
  * lat[y] = f·y + h, rejected when rotated); scalar metadata arrays
  * (`image.width`, `geo.epsg`, `geo.crs`, …) become constant columns
  * through the flatten rule. GDAL_NODATA surfaces as `_FillValue` so
  * CF decoding nulls those cells, matching the reference's nodata
  * masking.
  *
  * Format coverage: classic TIFF (II/MM, magic 42), strip and tile
  * layouts, chunky planar config, compression none/LZW/Deflate,
  * horizontal-differencing predictor, sample formats uint/int/float at
  * 8/16/32/64 bits. Unsupported shapes are rejected, not guessed.
  *
  * Scale: strips are the natural row-chunking — `rowRange` on `y`
  * decodes only intersecting strips (the intra-file split path shared
  * with NetCDF/HDF5); tiles fall back to full decode + slice.
  */
object TiffReader {

  def isTiff(path: String): Boolean = {
    // 4-byte range probe: never localizes a remote granule just to sniff
    if (graft.sources.io.ByteStore.size(path) < 4) return false
    val b = graft.sources.io.ByteStore.readRange(path, 0, 4)
    (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)
  }

  // ------------------------------------------------------------- tags

  private final case class Entry(tag: Int, typ: Int, count: Int, valueOff: Long)

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1
    case 3 | 8 => 2
    case 4 | 9 | 11 => 4
    case 5 | 10 | 12 | 16 | 17 => 8
    case _ => 1
  }

  private final class Ifd(buf: ByteBuffer, entries: Map[Int, Entry]) {

    private def valuesBuf(e: Entry): ByteBuffer = {
      val sz = typeSize(e.typ) * e.count
      val b = buf.duplicate().order(buf.order())
      if (sz <= 4) {
        // inline: the value bytes live where the offset would
        val inline = ByteBuffer.allocate(8).order(buf.order())
        inline.putInt((e.valueOff & 0xFFFFFFFFL).toInt)
        inline.flip()
        inline
      } else {
        b.position(e.valueOff.toInt)
        b
      }
    }

    def longs(tag: Int): Option[Array[Long]] = entries.get(tag).map { e =>
      val b = valuesBuf(e)
      Array.tabulate(e.count) { _ =>
        e.typ match {
          case 1 => (b.get() & 0xFF).toLong
          case 3 => (b.getShort() & 0xFFFF).toLong
          case 4 => b.getInt() & 0xFFFFFFFFL
          case 8 => b.getShort().toLong
          case 9 => b.getInt().toLong
          case other => throw new IllegalArgumentException(s"tag $tag: integer type $other")
        }
      }
    }

    def doubles(tag: Int): Option[Array[Double]] = entries.get(tag).flatMap { e =>
      e.typ match {
        case 11 | 12 | 5 =>
          val b = valuesBuf(e)
          Some(Array.tabulate(e.count) { _ =>
            e.typ match {
              case 11 => b.getFloat().toDouble
              case 12 => b.getDouble()
              case _ => val n = b.getInt() & 0xFFFFFFFFL; val d = b.getInt() & 0xFFFFFFFFL
                if (d == 0) 0.0 else n.toDouble / d
            }
          })
        case _ => longs(tag).map(_.map(_.toDouble)) // integral tag: element-wise
      }
    }

    def ascii(tag: Int): Option[String] = entries.get(tag).map { e =>
      val b = valuesBuf(e)
      val bytes = new Array[Byte](e.count)
      b.get(bytes)
      new String(bytes, java.nio.charset.StandardCharsets.US_ASCII)
        .replace("\u0000", "").trim
    }

    def long1(tag: Int, dflt: Long = -1L): Long = longs(tag).map(_.head).getOrElse(dflt)
    def has(tag: Int): Boolean = entries.contains(tag)
  }

  private def readIfd(buf: ByteBuffer): Ifd = {
    buf.position(0)
    val b0 = buf.get(); val b1 = buf.get()
    val order =
      if (b0 == 'I' && b1 == 'I') ByteOrder.LITTLE_ENDIAN
      else if (b0 == 'M' && b1 == 'M') ByteOrder.BIG_ENDIAN
      else throw new IllegalArgumentException("not a TIFF file")
    buf.order(order)
    require((buf.getShort() & 0xFFFF) == 42, "BigTIFF (magic 43) not supported")
    val ifdOff = buf.getInt() & 0xFFFFFFFFL
    buf.position(ifdOff.toInt)
    val n = buf.getShort() & 0xFFFF
    val entries = (0 until n).map { _ =>
      val tag = buf.getShort() & 0xFFFF
      val typ = buf.getShort() & 0xFFFF
      val cnt = buf.getInt()
      // raw 4 value/offset bytes — reinterpreted by valuesBuf
      val raw = buf.getInt() & 0xFFFFFFFFL
      tag -> Entry(tag, typ, cnt,
        if (typeSize(typ) * cnt <= 4) raw else raw)
    }.toMap
    new Ifd(buf, entries)
  }

  // ------------------------------------------------------ entry point

  def readDataset(path: String): NdDataset = readDataset(path, _ => true, None)

  def readDataset(path: String, keep: String => Boolean): NdDataset =
    readDataset(path, keep, None)

  /** metadata-only parse: band variables carry dims/attrs with EMPTY
    * data (geo axes and scalar metadata are header-derived and cheap,
    * so they stay real) */
  def readMeta(path: String): NdDataset =
    readDataset(path, _ => true, None, metaOnly = true)

  def readDataset(path: String, keep: String => Boolean,
      rowRange: Option[(String, Int, Int)]): NdDataset =
    readDataset(path, keep, rowRange, metaOnly = false)

  private def readDataset(path: String, keep: String => Boolean,
      rowRange: Option[(String, Int, Int)], metaOnly: Boolean): NdDataset = {
    val ch = graft.sources.io.ByteStore.openLocalChannel(path)
    try {
      val buf = ch.map(FileChannel.MapMode.READ_ONLY, 0, ch.size())
      val ifd = readIfd(buf)

      val width = ifd.long1(256).toInt
      val height = ifd.long1(257).toInt
      require(width > 0 && height > 0, s"bad TIFF dimensions ${width}x$height")
      val spp = math.max(1, ifd.long1(277, 1)).toInt
      // heterogeneous per-sample layouts are rejected, not decoded at
      // band 0's layout (the file contract is "rejected, not guessed")
      def uniform(tag: Int, what: String, default: Int): Int =
        ifd.longs(tag).map { vs =>
          require(vs.distinct.size == 1,
            s"per-sample $what differs across bands (${vs.mkString(",")}); not supported")
          vs.head.toInt
        }.getOrElse(default)
      val bits = uniform(258, "BitsPerSample", 8)
      val compression = ifd.long1(259, 1).toInt
      val predictor = ifd.long1(317, 1).toInt
      val sampleFormat = uniform(339, "SampleFormat", 1)
      val planar = ifd.long1(284, 1).toInt
      require(planar == 1, s"planar configuration $planar not supported (chunky only)")
      require(predictor != 3, "floating-point predictor (3) not supported")
      val tiled = ifd.has(322)

      // y windows decode strip-aligned; an x window decodes fully and
      // slices below (strips are row-major — no column-aligned chunks);
      // any other dim name is a planner bug, not silently-full output
      rowRange.foreach { case (d, _, _) =>
        require(d == "y" || d == "x", s"TIFF region on unknown dimension '$d'")
      }
      val (y0, y1) = rowRange match {
        case Some(("y", s, e)) => (s, e)
        case _ => (0, height)
      }
      val winRows = y1 - y0
      val xWindow = rowRange.collect { case ("x", s, e) => (s, e) }
      val winCols = xWindow.map { case (s, e) => e - s }.getOrElse(width)

      // ---- pixel decode → per-band doubles over the y window
      val bandData: Array[Array[Double]] =
        if (metaOnly) Array.fill(spp)(Array.empty[Double])
        else if (keepAnyBand(keep, spp)) decodeBands(buf, ifd, width, height, spp, bits,
          compression, predictor, sampleFormat, tiled, y0, y1)
        else Array.fill(spp)(null)

      // ---- geo axes
      val tiepoint = ifd.doubles(33922)
      val pixScale = ifd.doubles(33550)
      val transform = ifd.doubles(34264)
      val axes: Option[(Array[Double], Array[Double])] =
        (tiepoint, pixScale) match {
          case (Some(tp), Some(ps)) if tp.length >= 6 && ps.length >= 2 =>
            Some((Array.tabulate(width)(x => tp(3) + (x - tp(0)) * ps(0)),
              Array.tabulate(height)(y => tp(4) - (y - tp(1)) * ps(1))))
          case _ => transform match {
            case Some(m) if m.length >= 16 && m(1) == 0.0 && m(4) == 0.0 =>
              Some((Array.tabulate(width)(x => m(0) * x + m(3)),
                Array.tabulate(height)(y => m(5) * y + m(7))))
            case _ => None
          }
        }

      // ---- scalar metadata (reference reader.rs:80-150)
      val nodata = ifd.ascii(42113)
      val scalars = scala.collection.mutable.ArrayBuffer.empty[NdVariable]
      def num(name: String, v: Double): Unit =
        if (keep(name)) scalars += NdVariable(name, Seq.empty, Array(v), Map.empty)
      def str(name: String, v: String): Unit =
        if (keep(name)) scalars += NdVariable(name, Seq.empty, null, Map.empty, Array(v))
      num("image.width", width.toDouble)
      num("image.height", height.toDouble)
      num("image.samples_per_pixel", spp.toDouble)
      num("image.bits_per_sample", bits.toDouble)
      if (tiled) {
        num("image.tile_width", ifd.long1(322).toDouble)
        num("image.tile_height", ifd.long1(323).toDouble)
        num("image.tile_count_x", ((width + ifd.long1(322) - 1) / ifd.long1(322)).toDouble)
        num("image.tile_count_y", ((height + ifd.long1(323) - 1) / ifd.long1(323)).toDouble)
      }
      epsgOf(ifd).foreach { code =>
        num("geo.epsg", code.toDouble)
        str("geo.crs", s"EPSG:$code")
      }
      pixScale.foreach(v => str("geo.model_pixel_scale", v.mkString(",")))
      tiepoint.foreach(v => str("geo.model_tiepoint", v.mkString(",")))
      transform.foreach(v => str("geo.model_transformation", v.mkString(",")))
      nodata.foreach(v => str("geo.nodata", v))
      ifd.ascii(42112).foreach(v => str("geo.gdal_metadata", v))

      val bandAttrs = nodata.map(n => Map("_FillValue" -> n)).getOrElse(Map.empty)
      val fullX = Map("y" -> winRows, "x" -> width)
      val bands = (0 until spp).flatMap { b =>
        val name = s"band.$b"
        if (keep(name) && bandData(b) != null) {
          val v = NdVariable(name, Seq("y", "x"), bandData(b), bandAttrs)
          Some(xWindow match {
            case Some((s, e)) if v.data.nonEmpty =>
              graft.nd.NdSlice.sliceAxis(v, fullX, "x", s, e)
            case _ => v
          })
        } else None
      }
      val geoVars = axes.toSeq.flatMap { case (lons, lats) =>
        val latsW = java.util.Arrays.copyOfRange(lats, y0, y1)
        val lonsW = xWindow.map { case (s, e) => java.util.Arrays.copyOfRange(lons, s, e) }
          .getOrElse(lons)
        Seq(
          if (keep("geo.lat")) Some(NdVariable("geo.lat", Seq("y"), latsW, Map.empty)) else None,
          if (keep("geo.lon")) Some(NdVariable("geo.lon", Seq("x"), lonsW, Map.empty)) else None
        ).flatten
      }

      NdDataset(Seq("y" -> winRows, "x" -> winCols),
        bands ++ geoVars ++ scalars.toSeq, Map.empty)
    } finally ch.close()
  }

  private def keepAnyBand(keep: String => Boolean, spp: Int): Boolean =
    (0 until spp).exists(b => keep(s"band.$b"))

  /** strip rows (the natural split alignment); None for tiled files */
  def stripRows(path: String): Option[Int] = {
    val ch = graft.sources.io.ByteStore.openLocalChannel(path)
    try {
      val buf = ch.map(FileChannel.MapMode.READ_ONLY, 0, ch.size())
      val ifd = readIfd(buf)
      if (ifd.has(322)) None
      else Some(math.min(ifd.long1(278, Long.MaxValue), ifd.long1(257)).toInt)
    } finally ch.close()
  }

  // --------------------------------------------------------- decoding

  private def decodeBands(buf: ByteBuffer, ifd: Ifd, width: Int, height: Int,
      spp: Int, bits: Int, compression: Int, predictor: Int, sampleFormat: Int,
      tiled: Boolean, y0: Int, y1: Int): Array[Array[Double]] = {
    val winRows = y1 - y0
    val out = Array.fill(spp)(new Array[Double](winRows * width))
    val bytesPerSample = bits / 8

    def readSample(b: ByteBuffer): Double = (sampleFormat, bits) match {
      case (3, 32) => b.getFloat().toDouble
      case (3, 64) => b.getDouble()
      case (1, 8)  => (b.get() & 0xFF).toDouble
      case (1, 16) => (b.getShort() & 0xFFFF).toDouble
      case (1, 32) => (b.getInt() & 0xFFFFFFFFL).toDouble
      case (2, 8)  => b.get().toDouble
      case (2, 16) => b.getShort().toDouble
      case (2, 32) => b.getInt().toDouble
      case (f, w) => throw new IllegalArgumentException(s"sample format $f at $w bits not supported")
    }

    def decompress(raw: Array[Byte], expected: Int): Array[Byte] = compression match {
      case 1 => raw
      case 5 => lzwDecode(raw, expected)
      case 8 | 32946 =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(raw)
        val o = new Array[Byte](expected)
        var done = 0
        while (!inf.finished() && done < expected) {
          val n = inf.inflate(o, done, expected - done)
          if (n == 0 && inf.needsInput()) throw new IllegalArgumentException("truncated deflate strip")
          done += n
        }
        inf.end()
        o
      case other => throw new IllegalArgumentException(s"TIFF compression $other not supported")
    }

    /** undo horizontal differencing in place (integer data) */
    def unpredict(rowBytes: Array[Byte], rows: Int, cols: Int): Unit = {
      if (predictor != 2) return
      require(sampleFormat != 3, "predictor 2 on float samples unsupported")
      val b = ByteBuffer.wrap(rowBytes).order(buf.order())
      var r = 0
      while (r < rows) {
        var c = 1
        while (c < cols * spp) {
          val i = (r * cols * spp + c) * bytesPerSample
          val p = i - spp * bytesPerSample
          bytesPerSample match {
            case 1 => rowBytes(i) = (rowBytes(i) + rowBytes(p)).toByte
            case 2 => b.putShort(i, (b.getShort(i) + b.getShort(p)).toShort)
            case 4 => b.putInt(i, b.getInt(i) + b.getInt(p))
            case _ => throw new IllegalArgumentException("predictor at 64 bits unsupported")
          }
          c += 1
        }
        r += 1
      }
    }

    /** scatter decoded chunk pixels into the window-relative band arrays */
    def place(data: Array[Byte], chunkY: Int, chunkX: Int, rows: Int, cols: Int,
        rowStrideCols: Int): Unit = {
      val b = ByteBuffer.wrap(data).order(buf.order())
      var r = 0
      while (r < rows) {
        val gy = chunkY + r
        if (gy >= y0 && gy < y1) {
          var c = 0
          while (c < cols) {
            val gx = chunkX + c
            var s = 0
            while (s < spp) {
              b.position(((r * rowStrideCols + c) * spp + s) * bytesPerSample)
              val v = readSample(b)
              if (gx < width) out(s)((gy - y0) * width + gx) = v
              s += 1
            }
            c += 1
          }
        }
        r += 1
      }
    }

    if (!tiled) {
      val rowsPerStrip = math.min(ifd.long1(278, Long.MaxValue), height.toLong).toInt
      val offsets = ifd.longs(273).getOrElse(throw new IllegalArgumentException("no StripOffsets"))
      val counts = ifd.longs(279).getOrElse(throw new IllegalArgumentException("no StripByteCounts"))
      var s = 0
      while (s < offsets.length) {
        val sy = s * rowsPerStrip
        val rows = math.min(rowsPerStrip, height - sy)
        // strip-level row windowing: strips outside [y0,y1) never decode
        if (rows > 0 && sy < y1 && sy + rows > y0) {
          val raw = new Array[Byte](counts(s).toInt)
          val b = buf.duplicate()
          b.position(offsets(s).toInt)
          b.get(raw)
          val data = decompress(raw, rows * width * spp * bytesPerSample)
          unpredict(data, rows, width)
          place(data, sy, 0, rows, width, width)
        }
        s += 1
      }
    } else {
      val tw = ifd.long1(322).toInt
      val th = ifd.long1(323).toInt
      val tilesX = (width + tw - 1) / tw
      val offsets = ifd.longs(324).getOrElse(throw new IllegalArgumentException("no TileOffsets"))
      val counts = ifd.longs(325).getOrElse(throw new IllegalArgumentException("no TileByteCounts"))
      var t = 0
      while (t < offsets.length) {
        val ty = (t / tilesX) * th
        val tx = (t % tilesX) * tw
        if (ty < y1 && ty + th > y0) {
          val raw = new Array[Byte](counts(t).toInt)
          val b = buf.duplicate()
          b.position(offsets(t).toInt)
          b.get(raw)
          val data = decompress(raw, tw * th * spp * bytesPerSample)
          unpredict(data, th, tw)
          place(data, ty, tx, math.min(th, height - ty), math.min(tw, width - tx), tw)
        }
        t += 1
      }
    }
    out
  }

  /** TIFF-variant LZW: MSB-first codes, 256=Clear / 257=EOI, early code
    * width change at 510/1022/2046 (libtiff behavior). */
  private[tiff] def lzwDecode(in: Array[Byte], expected: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(expected, 64))
    val dict = new Array[Array[Byte]](4096)
    var i = 0
    while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
    var next = 258
    var widthBits = 9
    var bitPos = 0
    val totalBits = in.length * 8
    var prev: Array[Byte] = null
    def nextCode(): Int = {
      if (bitPos + widthBits > totalBits) return 257
      var v = 0
      var k = 0
      while (k < widthBits) {
        v = (v << 1) | ((in(bitPos >> 3) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1
        k += 1
      }
      v
    }
    var code = nextCode()
    while (code != 257) {
      if (code == 256) {
        next = 258; widthBits = 9; prev = null
      } else {
        val entry =
          if (code < 4096 && dict(code) != null && code < next) dict(code)
          else if (code == next && prev != null) prev :+ prev(0)
          else throw new IllegalArgumentException(s"corrupt LZW stream (code $code, next $next)")
        out.write(entry, 0, entry.length)
        if (prev != null && next < 4096) {
          dict(next) = prev :+ entry(0)
          next += 1
          // libtiff's MAXCODE(n)-1: 9-bit codes while next ≤ 510, then
          // widen when the next free index reaches 511/1023/2047
          if (next == 511) widthBits = 10
          else if (next == 1023) widthBits = 11
          else if (next == 2047) widthBits = 12
        }
        prev = entry
      }
      code = nextCode()
    }
    out.toByteArray
  }

  /** GeoKeyDirectory → EPSG code: ProjectedCSTypeGeoKey (3072) wins
    * over GeographicTypeGeoKey (2048); 0/32767 = undefined. */
  private def epsgOf(ifd: Ifd): Option[Int] = {
    ifd.longs(34735).flatMap { keys =>
      if (keys.length < 4) None
      else {
        val n = keys(3).toInt
        val m = (0 until n).flatMap { k =>
          val base = 4 + k * 4
          if (base + 3 < keys.length && keys(base + 1) == 0)
            Some(keys(base).toInt -> keys(base + 3).toInt)
          else None
        }.toMap
        def valid(v: Option[Int]) = v.filter(c => c != 0 && c != 32767)
        valid(m.get(3072)).orElse(valid(m.get(2048)))
      }
    }
  }
}
