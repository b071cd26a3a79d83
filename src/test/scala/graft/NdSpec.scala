package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.nd._

/** Golden tests for the arrays→tables rule (FIXTURES.md §3 worked
  * example) and CF decoding (FIXTURES.md §4). */
class NdSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  /** The FIXTURES §3 dataset: time=2, lat=3, lon=4; sst(time,lat,lon). */
  def demoSst: NdDataset = NdDataset(
    dims = Seq("time" -> 2, "lat" -> 3, "lon" -> 4),
    variables = Seq(
      NdVariable("time", Seq("time"), Array(1704067200.0, 1704153600.0),
        attrs = Map("units" -> "seconds since 1970-01-01")),
      NdVariable("lat", Seq("lat"), Array(50.0, 51.0, 52.0)),
      NdVariable("lon", Seq("lon"), Array(-4.0, -3.0, -2.0, -1.0)),
      NdVariable("sst", Seq("time", "lat", "lon"),
        (1 to 24).map(_.toDouble).toArray,
        attrs = Map("units" -> "degree_Celsius"))),
    globalAttrs = Map("title" -> "Demo SST"))

  test("24-row flattening in C-order: lon cycles fastest, time slowest") {
    val df = NdFlatten.flatten(spark, demoSst)
    val rows = df.collect()
    assert(rows.length == 24)
    // every variable attribute becomes a column (incl. time.units,
    // added here to exercise CF decoding on top of the FIXTURES example)
    assert(df.columns.toSeq ==
      Seq("time", "lat", "lon", "sst", "time.units", "sst.units", ".title"))

    // row 0: first of everything; sst = 1
    val r0 = rows(0)
    assert(r0.getAs[Double]("lat") == 50.0)
    assert(r0.getAs[Double]("lon") == -4.0)
    assert(r0.getAs[Double]("sst") == 1.0)
    // lon cycles every row: row 1 advances lon only
    assert(rows(1).getAs[Double]("lon") == -3.0)
    assert(rows(1).getAs[Double]("lat") == 50.0)
    assert(rows(1).getAs[Double]("sst") == 2.0)
    // lat advances every 4 rows
    assert(rows(4).getAs[Double]("lat") == 51.0)
    assert(rows(4).getAs[Double]("lon") == -4.0)
    // time advances every 12 rows
    assert(rows(12).getAs[Double]("lat") == 50.0)
    assert(rows(12).getAs[Double]("sst") == 13.0)
    // attribute columns are constant
    assert(rows.forall(_.getAs[String]("sst.units") == "degree_Celsius"))
    assert(rows.forall(_.getAs[String](".title") == "Demo SST"))
  }

  test("CF time decodes to timestamps (seconds since epoch)") {
    val df = NdFlatten.flatten(spark, demoSst)
    assert(df.schema("time").dataType == TimestampNTZType)
    val t0 = df.collect()(0).getAs[java.time.LocalDateTime]("time")
    assert(t0 == java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0))
    val t23 = df.collect()(23).getAs[java.time.LocalDateTime]("time")
    assert(t23 == java.time.LocalDateTime.of(2024, 1, 2, 0, 0, 0))
  }

  test("CF time: days since a base date") {
    val ds = NdDataset(
      dims = Seq("t" -> 2),
      variables = Seq(NdVariable("t", Seq("t"), Array(0.0, 365.25),
        attrs = Map("units" -> "days since 1950-01-01"))))
    val rows = NdFlatten.flatten(spark, ds).collect()
    assert(rows(0).getAs[java.time.LocalDateTime]("t") ==
      java.time.LocalDateTime.of(1950, 1, 1, 0, 0, 0))
    assert(rows(1).getAs[java.time.LocalDateTime]("t") ==
      java.time.LocalDateTime.of(1951, 1, 1, 6, 0, 0))  // .25 day = 6h
  }

  test("CF calendar: julian base dates shift to their Gregorian instant") {
    // julian 1858-11-05 00:00 = gregorian 1858-11-17 00:00 (12-day gap
    // in the 19th century); offsets stay uniform day counts
    val ds = NdDataset(
      dims = Seq("t" -> 3),
      variables = Seq(NdVariable("t", Seq("t"), Array(0.0, 1.0, 365.0),
        attrs = Map("units" -> "days since 1858-11-05",
          "calendar" -> "julian"))))
    val rows = NdFlatten.flatten(spark, ds).collect()
    assert(rows(0).getAs[java.time.LocalDateTime]("t") ==
      java.time.LocalDateTime.of(1858, 11, 17, 0, 0, 0))
    assert(rows(1).getAs[java.time.LocalDateTime]("t") ==
      java.time.LocalDateTime.of(1858, 11, 18, 0, 0, 0))
    assert(rows(2).getAs[java.time.LocalDateTime]("t") ==
      java.time.LocalDateTime.of(1859, 11, 17, 0, 0, 0))
    // julian leap rule: 1900 IS a leap year in the julian calendar, so
    // julian 1900-03-01 sits one day later than the proleptic-Gregorian
    // parse would put it (gregorian equivalent 1900-03-14)
    val leap = NdDataset(
      dims = Seq("t" -> 1),
      variables = Seq(NdVariable("t", Seq("t"), Array(0.0),
        attrs = Map("units" -> "days since 1900-03-01",
          "calendar" -> "julian"))))
    assert(NdFlatten.flatten(spark, leap).collect()(0)
      .getAs[java.time.LocalDateTime]("t") ==
      java.time.LocalDateTime.of(1900, 3, 14, 0, 0, 0))
    // explicit gregorian aliases keep the existing behavior
    for (cal <- Seq("standard", "gregorian", "proleptic_gregorian")) {
      val g = NdDataset(
        dims = Seq("t" -> 1),
        variables = Seq(NdVariable("t", Seq("t"), Array(0.0),
          attrs = Map("units" -> "days since 1950-01-01", "calendar" -> cal))))
      assert(NdFlatten.flatten(spark, g).collect()(0)
        .getAs[java.time.LocalDateTime]("t") ==
        java.time.LocalDateTime.of(1950, 1, 1, 0, 0, 0), s"calendar=$cal")
    }
    // golden .nc round-trip: the calendar attribute survives the file
    // format and drives the decode on read-back
    import graft.sources.netcdf.{NetcdfClassic, NetcdfWriter}
    val tmp = java.nio.file.Files.createTempDirectory("graft-julian")
      .resolve("julian.nc").toString
    NetcdfWriter.writeNd(ds, tmp)
    val back = NdFlatten.flatten(spark, NetcdfClassic.readDataset(tmp)).collect()
    assert(back(0).getAs[java.time.LocalDateTime]("t") ==
      java.time.LocalDateTime.of(1858, 11, 17, 0, 0, 0),
      "julian decode must survive a real .nc write → read round-trip")
  }

  test("CF calendar: non-instant calendars reject loudly") {
    for (cal <- Seq("360_day", "noleap", "365_day", "all_leap", "none")) {
      val ds = NdDataset(
        dims = Seq("t" -> 1),
        variables = Seq(NdVariable("t", Seq("t"), Array(0.0),
          attrs = Map("units" -> "days since 2000-01-01", "calendar" -> cal))))
      val e = intercept[IllegalArgumentException](
        NdFlatten.flatten(spark, ds).collect())
      assert(e.getMessage.contains(s"unsupported CF calendar '$cal'"),
        s"calendar=$cal must reject, got: ${e.getMessage}")
    }
  }

  test("scale_factor/add_offset apply; _FillValue nulls; others ignored") {
    val ds = NdDataset(
      dims = Seq("x" -> 4),
      variables = Seq(NdVariable("v", Seq("x"), Array(1.0, 2.0, -999.0, 4.0),
        attrs = Map("scale_factor" -> "0.5", "add_offset" -> "10",
          "_FillValue" -> "-999", "missing_value" -> "4",
          "valid_max" -> "1.5"))))
    val vals = NdFlatten.flatten(spark, ds).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vals(0).contains(10.5))
    assert(vals(1).contains(11.0))
    assert(vals(2).isEmpty, "_FillValue row must be NULL")
    assert(vals(3).contains(12.0), "missing_value/valid_max are ignored (pinned)")
  }

  test("explicit dimensions argument selects the grid and drops outside vars") {
    val df = NdFlatten.flatten(spark, demoSst, Some(Seq("lat", "lon")), 0)
    assert(df.count() == 12)
    // time (dims outside grid? time has dim 'time' ∉ {lat,lon}) dropped;
    // sst needs 'time' too → dropped; lat/lon kept
    assert(df.columns.toSeq == Seq("lat", "lon", ".title"))
  }

  test("scalar and lower-rank variables broadcast onto the grid") {
    val ds = NdDataset(
      dims = Seq("a" -> 2, "b" -> 3),
      variables = Seq(
        NdVariable("grid", Seq("a", "b"), (1 to 6).map(_.toDouble).toArray),
        NdVariable("per_a", Seq("a"), Array(10.0, 20.0)),
        NdVariable("per_b", Seq("b"), Array(7.0, 8.0, 9.0)),
        NdVariable("scalarv", Seq(), Array(99.0))))
    val rows = NdFlatten.flatten(spark, ds).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Double]("per_a")).toSeq == Seq(10, 10, 10, 20, 20, 20))
    assert(rows.map(_.getAs[Double]("per_b")).toSeq == Seq(7, 8, 9, 7, 8, 9))
    assert(rows.forall(_.getAs[Double]("scalarv") == 99.0))
  }

  test("pivot (ndnetcdf two-pass) round-trips through flatten") {
    import spark.implicits._
    val df = Seq(
      (1.0, 10.0, 100.0), (1.0, 20.0, 200.0),
      (2.0, 10.0, 300.0), (2.0, 20.0, 400.0))
      .toDF("t", "depth", "temp")
    val nd = NdPivot.pivot(df, Seq("t", "depth"))
    assert(nd.dims == Seq("t" -> 2, "depth" -> 2))
    val flat = NdFlatten.flatten(spark, nd)
      .select("t", "depth", "temp").orderBy("t", "depth").collect()
    assert(flat.map(_.getDouble(2)).toSeq == Seq(100.0, 200.0, 300.0, 400.0))
  }

  test("pivot slot lookup is a codegen binary search, not a ScalaUDF") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    val lookup = ColumnBridge.column(NdPivot.SortedIndexOf(
      ColumnBridge.expression($"v"), Array(1.0, 3.0, 7.0)))
    // repartition keeps the projection out of ConvertToLocalRelation's
    // constant folding so the codegen path actually executes
    val df = Seq(Some(1.0), Some(3.0), Some(7.0), Some(5.0), None)
      .toDF("v").repartition(1).select($"v", lookup.as("i"))
    // found → sorted position; absent → -1; null propagates
    val got = df.collect().map { r =>
      (if (r.isNullAt(0)) null else r.getDouble(0),
       if (r.isNullAt(1)) null else r.getInt(1))
    }.toSet
    assert(got == Set((1.0, 0), (3.0, 1), (7.0, 2), (5.0, -1), (null, null)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // `*(n)` is the WholeStageCodegen marker in plan strings (AQE keeps
    // the star but not the literal node name)
    assert(plan.contains("*(1) Project"), plan)
  }

  test("pivot leaves uncovered cells as NULL after flatten") {
    import spark.implicits._
    val df = Seq((1.0, 10.0, 100.0), (2.0, 20.0, 400.0)).toDF("t", "depth", "temp")
    val nd = NdPivot.pivot(df, Seq("t", "depth"))
    val flat = NdFlatten.flatten(spark, nd).orderBy("t", "depth").collect()
    assert(flat.length == 4)
    assert(flat.count(_.isNullAt(2)) == 2)
  }

  test("NdEmit: row masking decodes only surviving rows; values match the boxed path") {
    import org.apache.spark.sql.sources
    val schema = NdFlatten.plan(demoSst, None).schema
    // lat ∈ [51, 52] keeps 2 of 3 lat indices → 16 of 24 rows EMITTED
    // (rows-decoded ≈ rows-surviving, not 24 then post-filtered)
    val filters: Array[sources.Filter] = Array(
      sources.GreaterThanOrEqual("lat", 51.0), sources.LessThanOrEqual("lat", 52.0))
    val it = NdEmit.internalRows(demoSst, Seq("time", "lat", "lon"), schema, filters)
    val emitted = it.map(_.copy()).toVector
    assert(emitted.length == 16)
    // agree with the boxed reference path under the same predicate
    val latIdx = schema.fieldIndex("lat")
    val sstIdx = schema.fieldIndex("sst")
    val boxed = NdFlatten.localRows(demoSst, None)._2
      .filter(r => r.getAs[Double](latIdx) >= 51.0).toVector
    assert(emitted.map(_.getDouble(sstIdx)) == boxed.map(_.getAs[Double](sstIdx)))
    assert(emitted.forall(r => r.getDouble(latIdx) >= 51.0))
    // CF time column surfaces as epoch micros in the unsafe row
    val tIdx = schema.fieldIndex("time")
    assert(emitted.head.getLong(tIdx) == 1704067200L * 1000000L)
    // constant attribute columns ride along
    assert(emitted.head.getUTF8String(schema.fieldIndex("sst.units")).toString == "degree_Celsius")
  }

  test("NdEmit: masking an unselected coordinate still filters (projection-independent)") {
    import org.apache.spark.sql.sources
    val full = NdFlatten.plan(demoSst, None).schema
    val required = StructType(Seq(full("sst"))) // lat NOT selected
    val filters: Array[sources.Filter] = Array(sources.EqualTo("lat", 51.0))
    assert(NdEmit.maskColumns(filters, Seq("time", "lat", "lon")) == Set("lat"))
    val rows = NdEmit.internalRows(demoSst, Seq("time", "lat", "lon"), required, filters)
      .map(_.getDouble(0)).toVector
    assert(rows == Vector(5.0, 6.0, 7.0, 8.0, 17.0, 18.0, 19.0, 20.0))
  }

  test("NdEmit: OR-subtree predicates contribute no mask (conservative)") {
    import org.apache.spark.sql.sources
    val filters: Array[sources.Filter] = Array(
      sources.Or(sources.EqualTo("lat", 51.0), sources.EqualTo("lon", -4.0)))
    val schema = NdFlatten.plan(demoSst, None).schema
    val n = NdEmit.internalRows(demoSst, Seq("time", "lat", "lon"), schema, filters).size
    assert(n == 24) // all rows emitted; Spark's post-filter decides
  }

  test("pruneStats: planning min/max is in CF-decoded units (ADVICE r2)") {
    // packed axis: raw shorts 100..400, scale 0.1, offset 5 → 15.0..45.0
    val packed = NdFlatten.pruneStats(
      Map("scale_factor" -> "0.1", "add_offset" -> "5"),
      Array(100.0, 200.0, 300.0, 400.0))
    assert(packed.contains((15.0, 45.0)))
    // _FillValue elements must not poison min/max (plain and NaN fills)
    assert(NdFlatten.pruneStats(Map("_FillValue" -> "-9999"),
      Array(-9999.0, 3.0, 7.0)).contains((3.0, 7.0)))
    assert(NdFlatten.pruneStats(Map.empty,
      Array(Double.NaN, 3.0, 7.0)).contains((3.0, 7.0)))
    // base64 little-endian double NaN fill (zarr v3 style) + all-fill slab
    val b64NaN = java.util.Base64.getEncoder.encodeToString {
      val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putDouble(Double.NaN); bb.array()
    }
    assert(NdFlatten.pruneStats(Map("_FillValue" -> b64NaN),
      Array(Double.NaN, 1.5)).contains((1.5, 1.5)))
    assert(NdFlatten.pruneStats(Map.empty, Array(Double.NaN, Double.NaN)).isEmpty)
    // CF-time axes are never pruned on raw numbers
    assert(NdFlatten.pruneStats(
      Map("units" -> "days since 1950-01-01"), Array(1.0, 2.0)).isEmpty)
  }
}
