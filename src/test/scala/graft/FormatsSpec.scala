package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.nd.NdFlatten
import graft.sources.hdf5.Hdf5Reader
import graft.sources.netcdf.{NetcdfClassic, NetcdfSource, NetcdfWriter}
import graft.sources.zarr.{ZarrScanPlanner, ZarrSpec, ZarrStore}

/** ND container formats: NetCDF classic, NetCDF-4/HDF5, Zarr v3.
  *
  * The strongest check here is cross-format: the reference ships the
  * SAME dataset as `gridded-example.nc` (HDF5 container, deflate) and
  * `gridded-example.zarr` (Zarr v3, zstd). The two readers share no
  * container code — only the ND model — so byte-identical grids from
  * both is strong evidence against a common decode bug.
  */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  val refNc = "/root/reference/beacon-db/beacon-file-formats/beacon-arrow-netcdf/test_files/gridded-example.nc"
  val refZarr = "/root/reference/test-datasets/gridded-example.zarr"
  val refProf = "/root/reference/test-datasets/test_file.nc"

  // ------------------------------------------------- classic round trip

  test("netcdf classic: flat write → read round-trips values, types, nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 1.5, java.time.LocalDateTime.of(2020, 1, 2, 3, 4, 5, 123456000)),
      (2L, "beta", -2.25, java.time.LocalDateTime.of(1999, 12, 31, 23, 59, 59, 0)),
      (3L, null.asInstanceOf[String], Double.NaN, java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0, 0)))
      .toDF("id", "name", "value", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("graft-nc").resolve("flat.nc").toString
    NetcdfWriter.writeFlat(df, tmp)
    assert(NetcdfClassic.isClassic(tmp))
    val back = NetcdfSource.readFile(spark, tmp)
      .select($"id", $"name", $"value", $"ts").orderBy($"id").collect()
    assert(back.length == 3)
    assert(back.map(_.getDouble(0)).sameElements(Array(1.0, 2.0, 3.0)))
    assert(back.map(_.getString(1)).sameElements(Array("alpha", "beta", "")))
    assert(back(0).getDouble(2) == 1.5 && back(1).getDouble(2) == -2.25)
    assert(back(2).isNullAt(2), "NaN double writes as fill → NULL")
    // µs-exact timestamps (microseconds-since-epoch written as double)
    assert(back(0).getAs[java.time.LocalDateTime]("ts") ==
      java.time.LocalDateTime.of(2020, 1, 2, 3, 4, 5, 123456000))
    assert(back(1).getAs[java.time.LocalDateTime]("ts") ==
      java.time.LocalDateTime.of(1999, 12, 31, 23, 59, 59, 0))
  }

  test("netcdf classic: ndnetcdf (pivot) write → read round-trips the grid") {
    import spark.implicits._
    val df = Seq((0.0, 0.0, 1.0), (0.0, 1.0, 2.0), (1.0, 0.0, 3.0), (1.0, 1.0, 4.0))
      .toDF("x", "y", "v")
    val ds = graft.nd.NdPivot.pivot(df, Seq("x", "y"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-nc").resolve("grid.nc").toString
    NetcdfWriter.writeNd(ds, tmp)
    val back = NetcdfClassic.readDataset(tmp)
    assert(back.dims.map(_._2) == Seq(2, 2))
    assert(back.variable("v").data.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    assert(back.variable("x").data.toSeq == Seq(0.0, 1.0))
  }

  // ------------------------------------------- HDF5 vs Zarr cross-check

  test("gridded-example: HDF5 and Zarr v3 readers agree bit-for-bit") {
    val nc = Hdf5Reader.readDataset(refNc)
    val zr = ZarrStore.readDataset(refZarr)
    // same dims (order may differ)
    assert(nc.dims.toMap == zr.dims.toMap)
    for (name <- Seq("lat", "lon", "time", "analysed_sst", "analysis_error",
        "sea_ice_fraction", "mask")) {
      val a = nc.variable(name)
      val b = zr.variable(name)
      assert(a.dims == b.dims, s"$name dims")
      assert(java.util.Arrays.equals(a.data, b.data), s"$name values differ")
      // CF-relevant attrs agree wherever both containers carry them
      // (the zarr conversion added a base64-NaN _FillValue on the
      // coordinate axes that the .nc never had — metadata, not data)
      for (k <- Seq("scale_factor", "add_offset", "_FillValue", "units")
           if a.attrs.contains(k) && b.attrs.contains(k)) {
        // compare as the CF decoder sees them: numeric fills numerically,
        // units-since via the parsed epoch ("…1981-01-01" ≡ "…1981-01-01 00:00:00")
        def norm(s: String): Any =
          graft.nd.NdFlatten.parseFill(s).getOrElse {
            if (s.contains(" since "))
              graft.nd.NdFlatten.parseBaseMicros(s.split(" since ")(1))
            else s
          }
        assert(norm(a.attrs(k)) == norm(b.attrs(k)), s"$name.$k")
      }
    }
    // pinned golden values (independent of either container: the zarr
    // metadata documents valid ranges; positions from the CF grid)
    val lat = nc.variable("lat").data
    assert(lat.length == 1208 && math.abs(lat(0) - 38.75416564941406) < 1e-12)
    val lon = nc.variable("lon").data
    assert(lon.length == 1920 && math.abs(lon(0) - 26.379167556762695) < 1e-12)
    // time = 1014940800 s since 1981-01-01 → 2013-02-28T12:00 UTC region
    assert(nc.variable("time").data.head == 1.0149408e9)
  }

  test("read_netcdf flattens an HDF5 profile file (char matrices → strings)") {
    import spark.implicits._
    val df = NetcdfSource.readFile(spark, refProf, dimensions = Some(Seq("N_PROF")))
    val rows = df.select($"LATITUDE", $"LONGITUDE", $"PLATFORM_NUMBER")
      .orderBy($"LATITUDE").collect()
    assert(rows.length == 8)
    assert(math.abs(rows.head.getDouble(0) - 55.5833) < 1e-4)
    assert(rows.map(_.getString(2)).exists(_.trim == "Finngrundet"))
    // attribute columns surface verbatim
    assert(df.columns.contains("LATITUDE.units"))
  }

  test("read_netcdf CF-decodes the gridded file through the flatten rule") {
    import spark.implicits._
    // time axis as the grid → 1 row, time decoded via 'seconds since 1981-01-01'
    val df = NetcdfSource.readFile(spark, refNc, dimensions = Some(Seq("time")))
    val r = df.select($"time").collect()
    assert(r.length == 1)
    assert(r.head.getAs[java.time.LocalDateTime](0) ==
      java.time.LocalDateTime.of(1981, 1, 1, 0, 0).plusSeconds(1014940800L))
  }

  test("netcdf DSv2: column pruning reaches the container decode") {
    import spark.implicits._
    // only LATITUDE requested → other variables must not decode
    val df = NetcdfSource.readFile(spark, refProf, dimensions = Some(Seq("N_PROF")))
      .select($"LATITUDE")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") || plan.contains("netcdf"), plan.take(300))
    assert(df.collect().length == 8)
    // count(*) with zero kept variables still knows the grid row count
    val n = NetcdfSource.readFile(spark, refProf, dimensions = Some(Seq("N_PROF", "N_LEVELS")))
      .count()
    assert(n == 48)
    // decode-level pruning: a keep predicate skips variable data loads
    val pruned = NetcdfSource.readContainer(refProf, Set("LATITUDE").contains _)
    assert(pruned.variables.map(_.name) == Seq("LATITUDE"))
  }

  test("netcdf DSv2: coordinate predicates prune whole files at planning") {
    import graft.nd.{NdDataset, NdVariable}
    import graft.sources.netcdf.{NdFileSpec, NdFileSource}
    val dir = java.nio.file.Files.createTempDirectory("graft-ncprune")
    // four files covering disjoint x ranges [0,10), [10,20), …
    val files = (0 until 4).map { i =>
      val xs = Array.tabulate(10)(j => (i * 10 + j).toDouble)
      val ds = NdDataset(Seq("x" -> 10), Seq(
        NdVariable("x", Seq("x"), xs),
        NdVariable("v", Seq("x"), xs.map(_ * 2))))
      val p = dir.resolve(s"part$i.nc").toString
      NetcdfWriter.writeNd(ds, p)
      p
    }
    val spec = NdFileSpec(files, Seq("x"))
    import org.apache.spark.sql.sources._
    assert(NdFileSource.pruneFiles(spec, Array.empty).length == 4)
    val pruned = NdFileSource.pruneFiles(spec,
      Array(GreaterThanOrEqual("x", 25.0), LessThan("x", 31.0)))
    assert(pruned.length == 2, s"expected files 2,3 to survive, got $pruned")
    // end-to-end through the reader: filter answers stay exact
    import spark.implicits._
    val df = NetcdfSource.read(spark, files, dimensions = Some(Seq("x")))
      .filter($"x" >= 25.0 && $"x" < 31.0)
    assert(df.count() == 6)
    assert(df.rdd.getNumPartitions <= 2, "pruned files must not become partitions")
  }

  // --------------------------------------------------- Zarr DSv2 scan

  test("zarr DSv2: full scan matches store row count; values CF-decode") {
    import spark.implicits._
    val df = graft.sources.zarr.ZarrSource.read(spark, Seq(refZarr))
    assert(df.count() == 1L * 1208 * 1920)
    // scale/offset → kelvin; fill → NULL
    val some = df.select($"lat", $"lon", $"analysed_sst")
      .filter($"analysed_sst".isNotNull).limit(5).collect()
    assert(some.nonEmpty)
    assert(some.forall(r => r.getDouble(2) > 250 && r.getDouble(2) < 320))
  }

  test("zarr DSv2: coordinate predicates prune chunk partitions") {
    val spec = ZarrSpec(refZarr, None)
    val all = ZarrScanPlanner.partitions(spec, Array.empty)
    // lat chunks: 1208/302 = 4; lon chunks: 1920/960 = 2 → 8 regions
    assert(all.length == 8)
    val pruned = ZarrScanPlanner.partitions(spec,
      Array(org.apache.spark.sql.sources.LessThan("lat", 39.5)))
    assert(pruned.length == 2, s"expected 2 regions after lat pruning, got ${pruned.length}")
    val both = ZarrScanPlanner.partitions(spec,
      Array(org.apache.spark.sql.sources.LessThan("lat", 39.5),
        org.apache.spark.sql.sources.GreaterThan("lon", 40.0)))
    assert(both.length == 1)
    // and the pruned scan still answers correctly end-to-end
    import spark.implicits._
    val df = graft.sources.zarr.ZarrSource.read(spark, Seq(refZarr))
      .filter($"lat" < 39.5 && $"lon" > 40.0)
    val full = df.count()
    // every surviving row satisfies the predicate (Spark re-applies filters)
    assert(full > 0)
    assert(df.select(min($"lat"), max($"lat"), min($"lon")).collect().forall { r =>
      r.getDouble(1) < 39.5 && r.getDouble(2) > 40.0
    })
  }

  test("hdf5 compound dataset expands into one column per modelled member") {
    // plain (non-netcdf) HDF5 from the reference: dataset `measurements`
    // is compound {station i32, depth f32, temp f64, label fixed-string,
    // note vlen}; expected values are pinned by the reference's own
    // tests (beacon-arrow-hdf5/tests/backend_parity.rs:234-252,
    // src/reader/open.rs:313-368)
    val f = "/root/reference/beacon-db/beacon-file-formats/beacon-arrow-hdf5/test_files/compound.h5"
    val nd = Hdf5Reader.readDataset(f)
    def v(n: String) = nd.variables.find(_.name == n).getOrElse(
      fail(s"missing $n in ${nd.variables.map(_.name)}"))
    assert(v("measurements/station").data.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    assert(v("measurements/depth").data.toSeq == Seq(0.0, 10.0, 20.0, 30.0))
    assert(v("measurements/temp").data.toSeq == Seq(12.5, 11.25, 10.0, 9.75))
    assert(v("measurements/label").sdata.toSeq == Seq("alpha", "beta", "gamma", "delta"))
    // the vlen member is skipped; the compound itself is not a column
    assert(!nd.variables.exists(_.name == "measurements/note"))
    assert(!nd.variables.exists(_.name == "measurements"))
    // members share the dataset's shape/axes with ordinary variables
    assert(v("measurements/station").dims == v("measurements/label").dims)
    // dataset attribute rides as a rank-0 dotted column
    assert(nd.variables.exists(_.name == "measurements.description"))
    // and the flattened table reads end-to-end
    val (schema, rows) = NdFlatten.localRows(nd)
    assert(rows.size == 4)
    assert(schema.fieldNames.contains("measurements/station"))
  }

  test("hdf5 nested groups flatten to path-named columns (reference parity fixture)") {
    // backend_parity.rs:220-228 pins 3 stations × 4 samples = 12 rows with
    // group-path column names
    val f = "/root/reference/beacon-db/beacon-file-formats/beacon-arrow-hdf5/test_files/nested-groups.h5"
    val nd = Hdf5Reader.readDataset(f)
    val names = nd.variables.map(_.name)
    assert(names.contains("observations/temperature"))
    assert(names.contains("observations/qc/flag"))
    val (_, rows) = NdFlatten.localRows(nd)
    assert(rows.size == 12)
  }

  test("zarr planning: region product is lazy — a 1M-region grid never materializes") {
    // 100×100×100 chunk slices per dim = 1e6 regions; taking 5 must not
    // build the product (an eager fold would allocate all million)
    val dims = Seq("t", "y", "x").map(d =>
      (0L until 100L).map(i => (d, i * 10, i * 10 + 10)))
    val it = ZarrScanPlanner.regionProduct(dims)
    val first = it.take(5).toSeq
    assert(first.length == 5)
    assert(first.head == Seq(("t", 0L, 10L), ("y", 0L, 10L), ("x", 0L, 10L)))
    // iterator order is row-major: the 5th region advances only x
    assert(first(4) == Seq(("t", 0L, 10L), ("y", 0L, 10L), ("x", 40L, 50L)))
    // and a truly enormous (1e12) product can still be constructed + sampled
    val huge = Seq("a", "b", "c", "d", "e", "f").map(d =>
      (0L until 100L).map(i => (d, i, i + 1)))
    assert(ZarrScanPlanner.regionProduct(huge).take(3).size == 3)
  }

  test("zarr store metadata is parsed once per JVM across chunk tasks") {
    import spark.implicits._
    ZarrStore.metadataParses.set(0)
    val df = graft.sources.zarr.ZarrSource.read(spark, Seq(refZarr))
    assert(df.count() == 1L * 1208 * 1920) // 8 chunk tasks on local[*]
    val parses = ZarrStore.metadataParses.get()
    // one parse total (planner + every reader task share the cache);
    // allow one extra for a schema-inference call on a cold cache
    assert(parses <= 2, s"store metadata parsed $parses times for one scan")
  }

  // -------------------------------------- intra-file chunk-split reads

  /** DSv2 read with an explicit split_cells override */
  private def ndRead(files: Seq[String], grid: Seq[String], splitCells: Long) = {
    val schema = graft.sources.netcdf.NdFileSource.schema(
      graft.sources.netcdf.NdFileSpec(files, grid))
    spark.read
      .format(classOf[graft.sources.netcdf.NdFileTableProvider].getName)
      .option("files", files.mkString(graft.sources.netcdf.NdFileSource.SEP))
      .option("grid", grid.mkString(","))
      .option("split_cells", splitCells.toString)
      .schema(schema)
      .load()
  }

  test("hdf5 chunk-split: one partition per chunk range, identical rows") {
    import spark.implicits._
    val grid = Seq("time", "lat", "lon")
    // time=1 is degenerate → the split axis is lat (chunk rows 302)
    val split = ndRead(Seq(refNc), grid, splitCells = 400000)
    assert(split.rdd.getNumPartitions > 1,
      s"expected >1 partition, got ${split.rdd.getNumPartitions}")
    val whole = ndRead(Seq(refNc), grid, splitCells = Long.MaxValue)
    assert(whole.rdd.getNumPartitions == 1)
    assert(split.count() == 1L * 1208 * 1920)
    // aggregate fingerprints agree between split and unsplit reads
    // (sums compared with a relative tolerance: partitioning changes
    // float addition order by a few ulps, not values)
    def fp(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.agg(sum($"analysed_sst"), count($"analysed_sst"), sum($"lat"), sum($"lon"))
        .collect()(0).toSeq
    fp(split).zip(fp(whole)).foreach {
      case (a: Double, b: Double) => assert(math.abs(a - b) <= 1e-10 * math.abs(b))
      case (a, b) => assert(a == b)
    }
    // exact agreement on a value-order-insensitive check: per-row join
    val sm = split.filter($"lat" < 39.0).select($"lat", $"lon", $"analysed_sst")
    val wm = whole.filter($"lat" < 39.0).select($"lat", $"lon", $"analysed_sst")
    assert(sm.exceptAll(wm).count() == 0 && wm.exceptAll(sm).count() == 0)
  }

  test("hdf5 chunk-split: coordinate predicates prune split ranges") {
    import spark.implicits._
    val grid = Seq("time", "lat", "lon")
    val all = ndRead(Seq(refNc), grid, splitCells = 400000)
    val n = all.rdd.getNumPartitions
    val banded = all.filter($"lat" >= 43.0 && $"lat" <= 43.3)
    assert(banded.rdd.getNumPartitions < n,
      s"expected <$n partitions after lat pruning, got ${banded.rdd.getNumPartitions}")
    assert(banded.count() == 69120) // same slice the zarr gate pins
  }

  test("classic record-split: record variables stripe across partitions") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-split")
      .resolve("recs.nc").toString
    val df0 = spark.range(0, 200).select(
      $"id".cast("double").as("x"), ($"id" * 2).cast("double").as("y"))
    NetcdfWriter.writeFlat(df0, tmp)
    val grid = Seq("obs") // writeFlat's record dimension
    val split = ndRead(Seq(tmp), grid, splitCells = 50)
    assert(split.rdd.getNumPartitions == 4)
    assert(split.select(sum($"x"), sum($"y")).collect()(0).toSeq ==
      Seq(199.0 * 200 / 2, 199.0 * 200))
  }
}
