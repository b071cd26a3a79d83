package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoParquet support (SURVEY §2.1 read_geoparquet / §2.2 geoparquet
  * output; reference beacon-arrow-geoparquet): parquet files whose
  * geometry columns carry WKB.
  *
  * Read: a plain vectorized parquet scan; geometry columns are
  * detected from the GeoParquet `geo` footer metadata when present
  * (parquet-hadoop footer read), else by the conventional
  * binary-`geometry` column name. `wkbToWkt` bridges WKB into the
  * engine's WKT-based geo functions (st_within_point …).
  *
  * Write: `{longitude_column, latitude_column}` → WKB point geometry
  * column, matching the reference's geoparquet output options
  * (output.rs:175-187). Spark's parquet writer exposes no hook for
  * custom footer key-value metadata, so after the write each part
  * file's footer is PATCHED IN PLACE with the spec's `geo` key
  * ([[rewriteFooterKv]]: the original thrift tail re-serialized with
  * the extra KV pair) — external GeoParquet readers recognize the
  * output directly. A `_geo.json` sidecar is also written; readers
  * here consult footer, then sidecar, then the geometry-column
  * convention.
  */
object GeoParquet {

  // --------------------------------------------------------- WKB codec

  /** WKB → WKT for Point / LineString / MultiLineString / Polygon /
    * MultiPolygon (2-D) */
  def wkbToWkt(wkb: Array[Byte]): String = {
    val b = ByteBuffer.wrap(wkb)
    readGeom(b)
  }

  /** WKT → WKB (little-endian, 2-D) for the same five types — the
    * encode half of the codec, so geometry egress isn't limited to
    * lon/lat points (trajectory LINESTRINGs write as real geoparquet
    * geometry). Inverse of [[wkbToWkt]] up to number formatting. */
  def wktToWkb(wkt: String): Array[Byte] = {
    val g = graft.functions.Geo.parseWktCached(wkt)
    val out = new java.io.ByteArrayOutputStream(64)
    def putInt(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def putDouble(d: Double): Unit = {
      var bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { out.write((bits & 0xFF).toInt); bits >>= 8; i += 1 }
    }
    def putRing(r: graft.functions.Geo.Ring): Unit = {
      putInt(r.size)
      var i = 0
      while (i < r.size) { putDouble(r.xs(i)); putDouble(r.ys(i)); i += 1 }
    }
    def putPoly(p: graft.functions.Geo.Polygon): Unit = {
      putInt(1 + p.holes.size)
      putRing(p.outer)
      p.holes.foreach(putRing)
    }
    def putGeom(g: graft.functions.Geo.Geom): Unit = {
      out.write(1) // little-endian marker
      g match {
        case graft.functions.Geo.PointGeom(x, y) =>
          putInt(1); putDouble(x); putDouble(y)
        case graft.functions.Geo.LineStringGeom(r) =>
          putInt(2); putRing(r)
        case graft.functions.Geo.PolygonGeom(p) =>
          putInt(3); putPoly(p)
        case graft.functions.Geo.MultiLineStringGeom(rs) =>
          putInt(5); putInt(rs.size)
          rs.foreach { r => out.write(1); putInt(2); putRing(r) }
        case graft.functions.Geo.MultiPolygonGeom(ps) =>
          putInt(6); putInt(ps.size)
          ps.foreach { p => out.write(1); putInt(3); putPoly(p) }
      }
    }
    putGeom(g)
    out.toByteArray
  }

  private def order(b: ByteBuffer): Unit =
    b.order(if (b.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)

  private def readGeom(b: ByteBuffer): String = {
    order(b)
    val t = b.getInt() & 0xFFFF // mask Z/M/SRID flag variants
    t match {
      case 1 => val x = b.getDouble(); val y = b.getDouble(); s"POINT ($x $y)"
      case 2 => s"LINESTRING ${readRing(b)}"
      case 3 => s"POLYGON ${readPoly(b)}"
      case 5 =>
        val n = b.getInt()
        val lines = (0 until n).map { _ => order(b); b.getInt(); readRing(b) }
        s"MULTILINESTRING (${lines.mkString(", ")})"
      case 6 =>
        val n = b.getInt()
        val polys = (0 until n).map { _ => order(b); b.getInt(); readPoly(b) }
        s"MULTIPOLYGON (${polys.mkString(", ")})"
      case other => throw new IllegalArgumentException(s"WKB geometry type $other unsupported")
    }
  }

  private def readRing(b: ByteBuffer): String = {
    val n = b.getInt()
    (0 until n).map(_ => s"${b.getDouble()} ${b.getDouble()}")
      .mkString("(", ", ", ")")
  }

  private def readPoly(b: ByteBuffer): String = {
    val nRings = b.getInt()
    (0 until nRings).map(_ => readRing(b)).mkString("(", ", ", ")")
  }

  /** (lon, lat) → WKB point (little-endian) */
  def pointWkb(lon: Double, lat: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.putInt(1); b.putDouble(lon); b.putDouble(lat)
    b.array()
  }

  // ---------------------------------------------------------- columns

  // codegen'd expressions (functions/GeoExprs.scala) — no per-row
  // ScalaUDF SerDe on the geoparquet read or egress paths
  def stWkbAsWkt(c: Column): Column = graft.functions.GeoExprs.st_wkb_as_wkt(c)
  def stPointWkb(lon: Column, lat: Column): Column =
    graft.functions.GeoExprs.st_point_wkb(lon, lat)

  // ------------------------------------------------------- read/write

  /** geometry column names from the GeoParquet footer `geo` metadata of
    * the first file, or the `geometry` convention */
  def geometryColumns(spark: SparkSession, path: String): Seq[String] = {
    val files = FileCollection.expandGlobs(spark, Seq(path))
    def parseGeo(json: String): Seq[String] = {
      val m = org.json4s.jackson.JsonMethods.parse(json)
      (m \ "columns") match {
        case org.json4s.JObject(cols) => cols.map(_._1)
        case _ => Seq.empty[String]
      }
    }
    val fromFooter = files.headOption.flatMap { f =>
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(f)
        val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
          conf, p, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
        val kv = footer.getFileMetaData.getKeyValueMetaData
        Option(kv.get("geo")).map(parseGeo)
      } catch { case _: Throwable => None }
    }.filter(_.nonEmpty)
    // r15: our own writer's `_geo.json` sidecar (Spark's parquet writer
    // has no footer-KV hook) — same JSON, checked after the footer
    val fromSidecar = fromFooter.orElse(files.headOption.flatMap { f =>
      try {
        val parent = f.substring(0, f.lastIndexOf('/'))
        Some(parseGeo(graft.sources.io.ByteStore.readString(s"$parent/_geo.json")))
      } catch { case _: Throwable => None }
    }.filter(_.nonEmpty))
    fromSidecar.getOrElse(Seq("geometry"))
  }

  /** read + expose geometry as WKT beside the raw WKB */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val df = FileCollection.parquet(spark, paths: _*)
    val geomCols = geometryColumns(spark, paths.head)
      .filter(c => df.schema.fieldNames.contains(c) &&
        df.schema(c).dataType == BinaryType)
    geomCols.foldLeft(df) { (d, c) =>
      d.withColumn(s"${c}_wkt", stWkbAsWkt(col(c)))
    }
  }

  /** geoparquet output: synthesize a WKB point geometry from lon/lat.
    * Since r15 the writer also emits the GeoParquet 1.1 bbox COVERING
    * — per-row `bbox_xmin/ymin/xmax/ymax` columns declared in the geo
    * metadata's `covering` section — so every downstream consumer of
    * parquet column statistics (row-group stats, [[
    * graft.stats.FileStats]] per-file ranges) gets spatial pruning
    * for free: the bbox columns are ordinary doubles, and a spatial
    * predicate becomes four range conditions over them. This is the
    * read-reduction the reference's Morton-sort benchmark measures
    * (reference benchmarks/README.md:94-99). */
  def write(df: DataFrame, path: String, lonCol: String, latCol: String): Unit = {
    val lon = col(lonCol).cast(DoubleType); val lat = col(latCol).cast(DoubleType)
    df.withColumn("geometry", stPointWkb(lon, lat))
      .withColumn("bbox_xmin", lon).withColumn("bbox_ymin", lat)
      .withColumn("bbox_xmax", lon).withColumn("bbox_ymax", lat)
      .write.mode("overwrite").parquet(path)
    writeGeoSidecar(path)
  }

  /** geometry egress from a WKT column (any of the codec's five
    * types): the column encodes to WKB as `geometry` — trajectory
    * LINESTRINGs and polygon footprints write as real geoparquet
    * geometry, not just lon/lat points. bbox covering as in [[write]]. */
  def writeGeometry(df: DataFrame, path: String, wktCol: String): Unit = {
    import graft.functions.GeoExprs
    df.withColumn("geometry", GeoExprs.st_wkt_as_wkb(col(wktCol)))
      .withColumn("bbox_xmin", GeoExprs.st_xmin(col(wktCol)))
      .withColumn("bbox_ymin", GeoExprs.st_ymin(col(wktCol)))
      .withColumn("bbox_xmax", GeoExprs.st_xmax(col(wktCol)))
      .withColumn("bbox_ymax", GeoExprs.st_ymax(col(wktCol)))
      .drop(wktCol)
      .write.mode("overwrite").parquet(path)
    writeGeoSidecar(path)
  }

  /** Spatially CLUSTERED geoparquet egress: Z-order (Morton) layout
    * over (lon, lat) before writing, so each of the `files` output
    * files covers a compact spatial box and the bbox-covering file
    * pruning ([[readPruned]]) pays off on arbitrary (unsharded) data —
    * the reference's own Morton-sort benchmark claim (~34% faster
    * spatial scans on sorted layout, reference benchmarks/
    * README.md:91-99) as a writer option. One extra range shuffle at
    * write time; the read side needs nothing new. */
  def writeSorted(df: DataFrame, path: String, lonCol: String,
      latCol: String, files: Int): Unit = {
    require(files >= 1, s"geoparquet: files must be >= 1, got $files")
    val lon = col(lonCol).cast(DoubleType); val lat = col(latCol).cast(DoubleType)
    val staged = df.withColumn("geometry", stPointWkb(lon, lat))
      .withColumn("bbox_xmin", lon).withColumn("bbox_ymin", lat)
      .withColumn("bbox_xmax", lon).withColumn("bbox_ymax", lat)
    graft.operators.ZOrder.zorderBy(staged, Seq("bbox_xmin", "bbox_ymin"), files)
      .write.mode("overwrite").parquet(path)
    writeGeoSidecar(path)
  }

  /** The `geo` metadata JSON (GeoParquet 1.1 shape with the bbox
    * covering declaration). Spark's parquet writer exposes no public
    * hook for custom footer key-value metadata, so the writer (r16)
    * REWRITES each part file's footer after the fact to add the spec's
    * `geo` key — external GeoParquet readers recognize the output —
    * and still drops the `_geo.json` SIDECAR with the same JSON for
    * transports where an in-place tail rewrite isn't possible.
    * [[geometryColumns]] checks the footer first, then the sidecar.
    * Underscore-prefixed files are invisible to parquet scans. */
  private[graft] val geoMetadataJson: String =
    """{"version":"1.1.0","primary_column":"geometry","columns":{""" +
      """"geometry":{"encoding":"WKB","geometry_types":[],""" +
      """"covering":{"bbox":{"xmin":["bbox_xmin"],"ymin":["bbox_ymin"],""" +
      """"xmax":["bbox_xmax"],"ymax":["bbox_ymax"]}}}}}"""

  private def writeGeoSidecar(path: String): Unit = {
    graft.sources.io.ByteStore.writeString(
      s"${path.stripSuffix("/")}/_geo.json", geoMetadataJson)
    addFooterGeoKey(path)
  }

  /** Stamp the GeoParquet `geo` key into every part file's footer
    * key-value metadata, in place. A parquet file is
    * [data][footer thrift][4-byte LE footer length][PAR1]; the footer
    * holds absolute offsets into the data section, so replacing only
    * the tail — same FileMetaData with one extra KV pair — leaves
    * every row group, page, and offset valid. Local filesystem only
    * (an object store can't rewrite a tail in place; the sidecar
    * covers those transports). Failures degrade to sidecar-only
    * output rather than failing the write. */
  private[graft] def addFooterGeoKey(path: String): Unit = {
    val dir = new java.io.File(
      path.stripPrefix("file:").stripSuffix("/"))
    if (!dir.isDirectory) return
    dir.listFiles().filter { f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")
    }.foreach { f =>
      try {
        rewriteFooterKv(f, "geo", geoMetadataJson)
        // the Hadoop local FS checksum sidecar no longer matches the
        // rewritten tail — drop it (checksums are a transport feature,
        // not part of the parquet file)
        val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
        if (crc.exists()) crc.delete()
      } catch { case e: Throwable =>
        System.err.println(
          s"[geoparquet] footer geo-key rewrite skipped for $f: " +
            s"${e.getMessage} (sidecar still present)")
      }
    }
  }

  private def rewriteFooterKv(file: java.io.File, key: String,
      value: String): Unit = {
    // patch the ORIGINAL footer thrift in place: parse, append one
    // KeyValue, re-serialize. No hadoop-metadata round-trip — the
    // column-index/offset-index/bloom-filter references and every
    // other footer field survive byte-for-byte (a converter-based
    // rebuild silently drops the page-index references, costing every
    // downstream reader its page-level pruning).
    val raf = new java.io.RandomAccessFile(file, "rw")
    try {
      val len = raf.length()
      raf.seek(len - 8)
      val b = new Array[Byte](4); raf.readFully(b)
      val oldFooterLen = (b(0) & 0xff) | ((b(1) & 0xff) << 8) |
        ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
      val magic = new Array[Byte](4); raf.readFully(magic)
      require(new String(magic, "ASCII") == "PAR1",
        s"not a parquet file: $file")
      val footerStart = len - 8 - oldFooterLen
      require(footerStart > 0, s"implausible footer length $oldFooterLen")
      val oldFooter = new Array[Byte](oldFooterLen)
      raf.seek(footerStart)
      raf.readFully(oldFooter)
      val fmd = org.apache.parquet.format.Util.readFileMetaData(
        new java.io.ByteArrayInputStream(oldFooter))
      val already = fmd.getKey_value_metadataSize > 0 && {
        val it = fmd.getKey_value_metadataIterator
        var found = false
        while (it.hasNext && !found) found = it.next().key == key
        found
      }
      if (!already) {
        val kv = new org.apache.parquet.format.KeyValue(key)
        kv.setValue(value)
        fmd.addToKey_value_metadata(kv)
        val bos = new java.io.ByteArrayOutputStream(oldFooterLen + 256)
        org.apache.parquet.format.Util.writeFileMetaData(fmd, bos)
        val footer = bos.toByteArray
        raf.seek(footerStart)
        raf.write(footer)
        raf.write(Array[Byte](
          (footer.length & 0xff).toByte, ((footer.length >> 8) & 0xff).toByte,
          ((footer.length >> 16) & 0xff).toByte,
          ((footer.length >> 24) & 0xff).toByte))
        raf.write("PAR1".getBytes("ASCII"))
        raf.setLength(footerStart + footer.length + 8)
      }
    } finally raf.close()
  }

  /** Spatially pruned read: drops files whose RECORDED bbox-column
    * ranges ([[graft.stats.FileStats]] registry at `statsDir`, built
    * by one `ANALYZE FILES`-style pass over the collection) provably
    * cannot intersect the query rectangle — a file intersects iff
    * min(bbox_xmin) ≤ xmax ∧ max(bbox_xmax) ≥ xmin (and same in y),
    * so the spatial test is four ordinary range conditions and pruning
    * is never lossy (files missing from the registry are kept). The
    * EXACT per-row rectangle filter is applied in-plan on top, so the
    * result is identical to the unpruned scan; only the file list
    * shrinks. Returns (frame, filesKept, filesTotal). */
  def readPruned(spark: SparkSession, paths: Seq[String], statsDir: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double)
      : (DataFrame, Int, Int) = {
    require(xmin <= xmax && ymin <= ymax,
      s"geoparquet: degenerate query rectangle [$xmin,$xmax]×[$ymin,$ymax]")
    import graft.stats.FileStats
    val files = FileCollection.expandGlobs(spark, paths)
    val conds = Seq(
      FileStats.Cond("bbox_xmin", "lte", Some(xmax), None),
      FileStats.Cond("bbox_xmax", "gte", Some(xmin), None),
      FileStats.Cond("bbox_ymin", "lte", Some(ymax), None),
      FileStats.Cond("bbox_ymax", "gte", Some(ymin), None))
    // a missing/empty registry keeps everything (never-lossy) — the
    // exact per-row filter below still guarantees the right rows
    val statsExist = try {
      val p = new org.apache.hadoop.fs.Path(statsDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    } catch { case _: Throwable => false }
    val kept =
      if (statsExist) FileStats.pruneFiles(spark, statsDir, files, conds)
      else files
    val df =
      if (kept.isEmpty) {
        // all files pruned: an empty frame with the collection schema
        FileCollection.parquet(spark, files: _*).limit(0)
      } else FileCollection.parquet(spark, kept: _*)
    val exact = df.filter(
      col("bbox_xmin") <= xmax && col("bbox_xmax") >= xmin &&
        col("bbox_ymin") <= ymax && col("bbox_ymax") >= ymin)
    (exact, kept.size, files.size)
  }
}
