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
  * (output.rs:175-187). Divergence (documented): Spark's parquet
  * writer exposes no hook for custom footer key-value metadata, so the
  * `geo` metadata block is not written; readers fall back to the
  * geometry-column convention.
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
    files.headOption.flatMap { f =>
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(f)
        val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
          conf, p, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
        val kv = footer.getFileMetaData.getKeyValueMetaData
        Option(kv.get("geo")).map { json =>
          val m = org.json4s.jackson.JsonMethods.parse(json)
          (m \ "columns") match {
            case org.json4s.JObject(cols) => cols.map(_._1)
            case _ => Seq.empty[String]
          }
        }
      } catch { case _: Throwable => None }
    }.filter(_.nonEmpty).getOrElse(Seq("geometry"))
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

  /** geoparquet output: synthesize a WKB point geometry from lon/lat */
  def write(df: DataFrame, path: String, lonCol: String, latCol: String): Unit =
    df.withColumn("geometry",
        stPointWkb(col(lonCol).cast(DoubleType), col(latCol).cast(DoubleType)))
      .write.mode("overwrite").parquet(path)

  /** geometry egress from a WKT column (any of the codec's five
    * types): the column encodes to WKB as `geometry` — trajectory
    * LINESTRINGs and polygon footprints write as real geoparquet
    * geometry, not just lon/lat points */
  def writeGeometry(df: DataFrame, path: String, wktCol: String): Unit =
    df.withColumn("geometry",
        graft.functions.GeoExprs.st_wkt_as_wkb(col(wktCol)))
      .drop(wktCol)
      .write.mode("overwrite").parquet(path)
}
