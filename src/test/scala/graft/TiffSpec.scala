package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.tiff.TiffReader

/** GeoTIFF reader vs fixtures decoded by an INDEPENDENT from-scratch
  * python implementation (tools/tiff_fixture.py — struct-level tag
  * parsing + its own LZW). The two test files cover uncompressed and
  * LZW strips, tiepoint+scale and transformation-matrix geolocation,
  * EPSG from both projected and geographic GeoKeys, and GDAL nodata. */
class TiffSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  val dir = "/root/reference/beacon-db/beacon-file-formats/beacon-arrow-tiff/test-files"
  val lzwTif = s"$dir/synthetic_lzw_stripped_f32.tif"
  val testTif = s"$dir/test.tif"
  val fixtures = "/root/repo/src/test/resources/fixtures"

  private def fixtureRows(name: String, limit: Int = Int.MaxValue) =
    spark.read.parquet(s"$fixtures/$name").orderBy("y", "x").limit(limit).collect()

  test("LZW strips decode bit-for-bit against the independent python decode") {
    val ds = TiffReader.readDataset(lzwTif)
    assert(ds.dims.toMap == Map("y" -> 48, "x" -> 64))
    val band = ds.variable("band.0")
    val exp = fixtureRows("tiff_lzw")
    assert(band.data.length == exp.length)
    // flatten C-order (y outer, x inner) == fixture (y,x) order
    exp.zipWithIndex.foreach { case (r, i) =>
      val v = band.data(i)
      if (r.isNullAt(r.fieldIndex("band0"))) {
        // nodata → _FillValue → NaN pre-decode
        val fill = graft.nd.NdFlatten.parseFill(band.attrs("_FillValue")).get
        assert(v == fill)
      } else assert(v == r.getAs[Double]("band0"), s"cell $i")
    }
    // geolocation from tiepoint + pixel scale
    val lat = ds.variable("geo.lat").data
    val lon = ds.variable("geo.lon").data
    exp.take(200).foreach { r =>
      assert(lat(r.getAs[Int]("y")) == r.getAs[Double]("lat"))
      assert(lon(r.getAs[Int]("x")) == r.getAs[Double]("lon"))
    }
    // scalar metadata per the reference surface
    assert(ds.variable("image.width").data.head == 64.0)
    assert(ds.variable("geo.epsg").data.head == 3035.0)
    assert(ds.variable("geo.crs").sdata.head == "EPSG:3035")
    assert(ds.variable("geo.nodata").sdata.head == "-3.3999999521443642e+38")
  }

  test("uncompressed strips + transformation-matrix axes (test.tif)") {
    val ds = TiffReader.readDataset(testTif)
    assert(ds.dims.toMap == Map("y" -> 380, "x" -> 1287))
    assert(ds.variable("geo.epsg").data.head == 4326.0)
    val band = ds.variable("band.0")
    val lat = ds.variable("geo.lat").data
    val lon = ds.variable("geo.lon").data
    val fill = graft.nd.NdFlatten.parseFill(band.attrs("_FillValue")).get
    val exp = fixtureRows("tiff_test") // y < 40 slice, 51480 cells
    exp.foreach { r =>
      val y = r.getAs[Int]("y"); val x = r.getAs[Int]("x")
      val v = band.data(y * 1287 + x)
      if (r.isNullAt(r.fieldIndex("band0"))) assert(v == fill)
      else assert(v == r.getAs[Double]("band0"))
      assert(lat(y) == r.getAs[Double]("lat") && lon(x) == r.getAs[Double]("lon"))
    }
  }

  test("strip-windowed read equals the full read's slice") {
    val full = TiffReader.readDataset(lzwTif)
    val win = TiffReader.readDataset(lzwTif, _ => true, Some(("y", 6, 18)))
    assert(win.dims.toMap == Map("y" -> 12, "x" -> 64))
    val fullBand = full.variable("band.0").data
    assert(win.variable("band.0").data.toSeq ==
      fullBand.slice(6 * 64, 18 * 64).toSeq)
    assert(win.variable("geo.lat").data.toSeq ==
      full.variable("geo.lat").data.slice(6, 18).toSeq)
    assert(win.variable("geo.lon").data.length == 64)
  }

  test("tiff reads through the DSL and splits into strip-aligned partitions") {
    import spark.implicits._
    val viaDsl = graft.dsl.JsonQuery.compile(spark,
      s"""{"select": [{"column": "band.0", "alias": "v"}],
           "filter": {"column": "band.0", "gt": 0},
           "from": {"tiff": {"paths": ["$lzwTif"]}}}""")
    assert(viaDsl.count() > 0)
    // intra-file split: test.tif = 380 rows x 1287 cols ≈ 489k cells
    val schema = graft.sources.netcdf.NdFileSource.schema(
      graft.sources.netcdf.NdFileSpec(Seq(testTif), Seq("y", "x")))
    val split = spark.read
      .format(classOf[graft.sources.netcdf.NdFileTableProvider].getName)
      .option("files", testTif)
      .option("grid", "y,x")
      .option("split_cells", "100000")
      .schema(schema).load()
    assert(split.rdd.getNumPartitions > 1)
    assert(split.count() == 380L * 1287)
    // windowed partitions see the same non-null population
    val whole = graft.sources.netcdf.NetcdfSource.read(spark, Seq(testTif))
    assert(split.filter(col("`band.0`").isNotNull).count() ==
      whole.filter(col("`band.0`").isNotNull).count())
  }
}
