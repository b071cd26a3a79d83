package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftSession, Tables}
import graft.sources.netcdf.{NetcdfSource, NetcdfWriter}

/** Gate queries for the ND format layer (SURVEY §2.1 read_netcdf /
  * read_hdf5 / read_zarr + §2.2 netcdf writer).
  *
  *  - q_netcdf_roundtrip is fully non-circular: the events table is
  *    aggregated, written to a NetCDF classic file by [[NetcdfWriter]],
  *    read back by the classic parser, and the DuckDB oracle recomputes
  *    the aggregate from the original parquet.
  *  - q_netcdf_profile / q_zarr_gridded read the reference's own
  *    fixtures (an HDF5/NetCDF-4 profile file and a Zarr v3 store) and
  *    compare against committed parquet equivalents; their independence
  *    argument lives in FormatsSpec (bit-for-bit cross-container
  *    agreement between the two disjoint parsers).
  */
object QueriesFormats {

  val refProf = "/root/reference/test-datasets/test_file.nc"
  val refZarr = "/root/reference/test-datasets/gridded-example.zarr"
  val refTiffLzw = "/root/reference/beacon-db/beacon-file-formats/" +
    "beacon-arrow-tiff/test-files/synthetic_lzw_stripped_f32.tif"
  val refCompound = "/root/reference/beacon-db/beacon-file-formats/" +
    "beacon-arrow-hdf5/test_files/compound.h5"
  private val fixtures = "/root/repo/src/test/resources/fixtures"

  /** flattened Argo-style profile file over the (N_PROF, N_LEVELS) grid */
  def netcdfProfile(spark: SparkSession): DataFrame = {
    GraftSession.configure(spark)
    NetcdfSource.readFile(spark, refProf,
      dimensions = Some(Seq("N_PROF", "N_LEVELS")))
      .select(col("JULD").cast(TimestampNTZType).as("juld"),
        round(col("LATITUDE"), 6).as("lat"),
        round(col("LONGITUDE"), 6).as("lon"),
        round(col("TEMP"), 6).as("temp"),
        round(col("PSAL"), 6).as("psal"),
        round(col("DEPH"), 6).as("deph"),
        col("PLATFORM_NUMBER").as("platform"),
        col("DC_REFERENCE").as("dc_ref"))
      .orderBy("lat", "lon", "deph", "temp")
  }

  /** pruned Zarr v3 scan of the gridded SST store (2 of 8 chunk regions) */
  def zarrGridded(spark: SparkSession): DataFrame = {
    GraftSession.configure(spark)
    graft.sources.zarr.ZarrSource.read(spark, Seq(refZarr))
      .filter(col("lat") >= 43.0 && col("lat") <= 43.3) // open Black Sea band
      .select(round(col("lat"), 6).as("lat"),
        round(col("lon"), 6).as("lon"),
        round(col("analysed_sst"), 6).as("sst"),
        col("mask").cast(IntegerType).as("mask"))
      .orderBy("lat", "lon")
  }

  /** Zarr v2 fixture: a synthesized store whose cell values are
    * closed-form in the grid indices, so the DuckDB oracle recomputes
    * them from range() arithmetic — the v2 decode path is checked
    * against independent JDK / lz4-java ENCODERS (Deflater,
    * GZIPOutputStream, LZ4 block), never against our own reader.
    * Exercises: numpy dtype strings (<i8, <f8, <f4, >i2 big-endian,
    * |u1), zlib/gzip/lz4/raw compressors, Fortran order (anom), a
    * missing chunk served from fill_value (mask), xarray
    * _ARRAY_DIMENSIONS binding, and consolidated .zmetadata. */
  private[graft] object ZarrV2Fixture {
    import java.nio.{ByteBuffer, ByteOrder}

    val timeN = 6; val latN = 10; val lonN = 12
    def timeAt(t: Int): Double = t * 3600.0 + 100.0
    def latAt(y: Int): Double = 30.0 + y * 0.5
    def lonAt(x: Int): Double = -10.0 + x * 1.0
    def sstAt(t: Int, y: Int, x: Int): Double = (t * 100 + y * 10 + x) * 0.25
    def anomAt(t: Int, y: Int, x: Int): Double = (t * 2 - y + x) * 0.5
    def maskAt(y: Int, x: Int): Double =
      if (y >= 5 && x >= 6) -1.0 else (y * 12 + x) % 3 // the skipped chunk = fill
    def qcAt(t: Int, y: Int, x: Int): Double = (y * 7 + x * 3 + t) % 250

    final case class Arr(name: String, shape: Seq[Int], chunks: Seq[Int],
        dtype: String, order: String, comp: Option[String], fill: String,
        dims: Seq[String], value: Seq[Int] => Double,
        skip: Set[Seq[Int]] = Set.empty)

    val arrays: Seq[Arr] = Seq(
      Arr("time", Seq(timeN), Seq(timeN), "<i8", "C", None, "0",
        Seq("time"), i => timeAt(i(0))),
      Arr("lat", Seq(latN), Seq(5), "<f8", "C", Some("zlib"), "\"NaN\"",
        Seq("lat"), i => latAt(i(0))),
      Arr("lon", Seq(lonN), Seq(lonN), "<f8", "C", Some("zlib"), "\"NaN\"",
        Seq("lon"), i => lonAt(i(0))),
      Arr("sst", Seq(timeN, latN, lonN), Seq(2, 5, 6), "<f4", "C",
        Some("zlib"), "\"NaN\"", Seq("time", "lat", "lon"),
        i => sstAt(i(0), i(1), i(2))),
      Arr("anom", Seq(timeN, latN, lonN), Seq(3, 5, 4), "<f8", "F",
        Some("gzip"), "\"NaN\"", Seq("time", "lat", "lon"),
        i => anomAt(i(0), i(1), i(2))),
      Arr("mask", Seq(latN, lonN), Seq(5, 6), ">i2", "C", None, "-1",
        Seq("lat", "lon"), i => maskAt(i(0), i(1)), skip = Set(Seq(1, 1))),
      Arr("qc", Seq(timeN, latN, lonN), Seq(timeN, latN, lonN), "|u1", "C",
        Some("lz4"), "0", Seq("time", "lat", "lon"),
        i => qcAt(i(0), i(1), i(2))))

    private def zarrayJson(a: Arr): String = {
      val comp = a.comp match {
        case None => "null"
        case Some("zlib") => """{"id":"zlib","level":5}"""
        case Some("gzip") => """{"id":"gzip","level":5}"""
        case Some("lz4") => """{"id":"lz4","acceleration":1}"""
        case Some(other) => throw new IllegalArgumentException(other)
      }
      s"""{"zarr_format":2,"shape":[${a.shape.mkString(",")}],""" +
        s""""chunks":[${a.chunks.mkString(",")}],"dtype":"${a.dtype}",""" +
        s""""order":"${a.order}","fill_value":${a.fill},"compressor":$comp,""" +
        s""""filters":null,"dimension_separator":"."}"""
    }

    private def zattrsJson(a: Arr): String =
      s"""{"_ARRAY_DIMENSIONS":[${a.dims.map("\"" + _ + "\"").mkString(",")}]}"""

    /** odometer in C order (last dim fastest); F order = C over the
      * reversed shape with re-reversed indices */
    private def cOrder(sh: Seq[Int]): Iterator[Seq[Int]] =
      sh.foldLeft(Iterator.single(Vector.empty[Int]): Iterator[Seq[Int]]) {
        (acc, n) => acc.flatMap(p => (0 until n).iterator.map(p :+ _))
      }

    private def chunkBytes(a: Arr, cidx: Seq[Int]): Array[Byte] = {
      val n = a.chunks.product
      val es = a.dtype.tail.tail.toInt
      val bb = ByteBuffer.allocate(n * es).order(
        if (a.dtype.head == '>') ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      val locals: Iterator[Seq[Int]] =
        if (a.order == "C") cOrder(a.chunks)
        else cOrder(a.chunks.reverse).map(_.reverse)
      locals.foreach { local =>
        val global = local.indices.map(d => cidx(d) * a.chunks(d) + local(d))
        val v = a.value(global)
        a.dtype match {
          case "<i8" => bb.putLong(v.toLong)
          case "<f8" => bb.putDouble(v)
          case "<f4" => bb.putFloat(v.toFloat)
          case ">i2" => bb.putShort(v.toShort)
          case "|u1" => bb.put(v.toInt.toByte)
          case other => throw new IllegalArgumentException(s"fixture dtype $other")
        }
      }
      val raw = bb.array()
      a.comp match {
        case None => raw
        case Some("zlib") =>
          val d = new java.util.zip.Deflater(5)
          d.setInput(raw); d.finish()
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          d.end(); out.toByteArray
        case Some("gzip") =>
          val out = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(out)
          g.write(raw); g.close(); out.toByteArray
        case Some("lz4") => // numcodecs framing: int32 LE raw size + block
          val comp = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
            .fastCompressor().compress(raw)
          val out = ByteBuffer.allocate(4 + comp.length).order(ByteOrder.LITTLE_ENDIAN)
          out.putInt(raw.length).put(comp); out.array()
        case Some(other) => throw new IllegalArgumentException(other)
      }
    }

    /** write the store. `sidecars` controls the per-array
      * .zarray/.zattrs (+ root .zgroup) files; `consolidated` controls
      * .zmetadata. consolidated-only (sidecars=false) is the
      * object-store layout xarray's `consolidated=True` enables. */
    def write(root: java.nio.file.Path, sidecars: Boolean = true,
        consolidated: Boolean = true): Unit = {
      import java.nio.file.Files
      import java.nio.charset.StandardCharsets.UTF_8
      Files.createDirectories(root)
      val groupJson = """{"zarr_format":2}"""
      val groupAttrs = """{"title":"graft zarr v2 fixture"}"""
      if (sidecars) {
        Files.write(root.resolve(".zgroup"), groupJson.getBytes(UTF_8))
        Files.write(root.resolve(".zattrs"), groupAttrs.getBytes(UTF_8))
      }
      val metaEntries = scala.collection.mutable.LinkedHashMap[String, String](
        ".zgroup" -> groupJson, ".zattrs" -> groupAttrs)
      arrays.foreach { a =>
        val dir = root.resolve(a.name)
        Files.createDirectories(dir)
        if (sidecars) {
          Files.write(dir.resolve(".zarray"), zarrayJson(a).getBytes(UTF_8))
          Files.write(dir.resolve(".zattrs"), zattrsJson(a).getBytes(UTF_8))
        }
        metaEntries(s"${a.name}/.zarray") = zarrayJson(a)
        metaEntries(s"${a.name}/.zattrs") = zattrsJson(a)
        val grid = a.shape.indices.map(d => a.shape(d) / a.chunks(d))
        cOrder(grid).foreach { cidx =>
          if (!a.skip.contains(cidx))
            Files.write(dir.resolve(cidx.mkString(".")), chunkBytes(a, cidx))
        }
      }
      if (consolidated) {
        val body = metaEntries.map { case (k, v) => s""""$k":$v""" }.mkString(",")
        Files.write(root.resolve(".zmetadata"),
          s"""{"zarr_consolidated_format":1,"metadata":{$body}}""".getBytes(UTF_8))
      }
    }
  }

  /** events → daily aggregate used by the table-format round trips */
  private def dailyAgg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast(TimestampNTZType).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))

  private val dailyAggSql =
    """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
         event_type, count(*) AS n, round(sum(value), 4) AS total_value
       FROM events %s GROUP BY 1, 2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Delta tx-log round trip: append → DELETE WHERE → checkpoint, then
    // read latest through the JSON DSL (checkpoint replay + from.delta
    // wiring) and version 0 via time travel; oracle recomputes both
    // snapshots from the source parquet (non-circular).
    "q_delta_snapshot" -> { (s, dir) =>
      GraftSession.configure(s)
      import graft.sources.delta.DeltaSource
      val daily = dailyAgg(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-deltagate")
        .resolve("t").toString
      DeltaSource.Writer.append(daily, tmp)                          // v0
      DeltaSource.Writer.deleteWhere(s, tmp, "event_type = 'click'") // v1
      DeltaSource.Writer.checkpoint(s, tmp)                          // ckpt @1
      val cols = Seq("day", "event_type", "n", "total_value", "snap")
      val latest = graft.dsl.JsonQuery.compile(s,
        s"""{"select": ["day", "event_type", "n", "total_value"],
             "from": {"delta": {"paths": ["$tmp"]}}}""")
        .withColumn("snap", lit("latest")).select(cols.map(col): _*)
      val v0 = DeltaSource.read(s, tmp, Some("0"))
        .withColumn("snap", lit("v0")).select(cols.map(col): _*)
      latest.unionAll(v0).orderBy("snap", "day", "event_type")
    },
    // Iceberg round trip: two appended snapshots, read latest through
    // the DSL and snapshot 1 via time travel; oracle recomputes from
    // the source parquet. (The reference fixture's metadata — written
    // by iceberg-rust — is decoded in IcebergSpec; its data files are
    // not shipped, so the data gate rides our own Writer.)
    "q_iceberg_snapshot" -> { (s, dir) =>
      GraftSession.configure(s)
      import graft.sources.iceberg.IcebergSource
      val daily = dailyAgg(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-iceberggate")
        .resolve("t").toString
      IcebergSource.Writer.append(s, daily.filter(col("event_type") =!= "click"), tmp) // snap 1
      IcebergSource.Writer.append(s, daily.filter(col("event_type") === "click"), tmp) // snap 2
      val cols = Seq("day", "event_type", "n", "total_value", "snap")
      val latest = graft.dsl.JsonQuery.compile(s,
        s"""{"select": ["day", "event_type", "n", "total_value"],
             "from": {"iceberg": {"paths": ["$tmp"]}}}""")
        .withColumn("snap", lit("latest")).select(cols.map(col): _*)
      val snap1 = IcebergSource.read(s, tmp, Some("1"))
        .withColumn("snap", lit("s1")).select(cols.map(col): _*)
      latest.unionAll(snap1).orderBy("snap", "day", "event_type")
    },
    // Delta deletion vectors (writer-v7 merge-on-read): append → DV
    // DELETE of click rows (roaring-bitmap deletion_vector_*.bin, no
    // data-file rewrite) → checkpoint → read latest through the DSL
    // (checkpoint + DV replay) and v0 via time travel. Oracle recomputes
    // both states from the source parquet.
    "q_delta_dv" -> { (s, dir) =>
      GraftSession.configure(s)
      import graft.sources.delta.DeltaSource
      val daily = dailyAgg(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-deltadvgate")
        .resolve("t").toString
      DeltaSource.Writer.append(daily, tmp)                            // v0
      DeltaSource.Writer.dvDeleteWhere(s, tmp, "event_type = 'click'") // v1 (DV)
      DeltaSource.Writer.checkpoint(s, tmp)                            // ckpt @1
      val cols = Seq("day", "event_type", "n", "total_value", "snap")
      val latest = graft.dsl.JsonQuery.compile(s,
        s"""{"select": ["day", "event_type", "n", "total_value"],
             "from": {"delta": {"paths": ["$tmp"]}}}""")
        .withColumn("snap", lit("latest")).select(cols.map(col): _*)
      val v0 = DeltaSource.read(s, tmp, Some("0"))
        .withColumn("snap", lit("v0")).select(cols.map(col): _*)
      latest.unionAll(v0).orderBy("snap", "day", "event_type")
    },
    // Iceberg v2 merge-on-read: append → position-delete (click rows,
    // via a real (file_path, pos) delete file) → equality-delete (view
    // rows, on the event_type column) → RE-append the view rows. The
    // latest read must drop click, keep exactly one copy of view
    // (sequence semantics: the re-append post-dates the equality
    // delete), and time travel to snapshot 3 shows the fully-deleted
    // state. Oracle recomputes both from the source parquet.
    "q_iceberg_deletes" -> { (s, dir) =>
      GraftSession.configure(s)
      import graft.sources.iceberg.IcebergSource
      import s.implicits._
      val daily = dailyAgg(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-icedelgate")
        .resolve("t").toString
      IcebergSource.Writer.append(s, daily, tmp)                             // snap 1
      IcebergSource.Writer.deleteWhere(s, tmp, "event_type = 'click'")       // snap 2 (pos)
      IcebergSource.Writer.equalityDelete(s, tmp, Seq("view").toDF("event_type")) // snap 3 (eq)
      IcebergSource.Writer.append(s, daily.filter($"event_type" === "view"), tmp) // snap 4
      val cols = Seq("day", "event_type", "n", "total_value", "snap")
      val latest = IcebergSource.read(s, tmp)
        .withColumn("snap", lit("latest")).select(cols.map(col): _*)
      val s3 = IcebergSource.read(s, tmp, Some("3"))
        .withColumn("snap", lit("s3")).select(cols.map(col): _*)
      latest.unionAll(s3).orderBy("snap", "day", "event_type")
    },
    // Icechunk versioned-Zarr round trip: commit 1 = click-only hourly
    // grid (tagged), commit 2 = all-events grid on the same branch. The
    // main tip reads commit 2 through the DSL; the tag still serves
    // commit 1 AFTER the second commit landed (fixed-version contract,
    // reference beacon-icechunk/src/repository.rs). Oracle rebuilds both
    // dense grids from the source parquet.
    "q_icechunk_versions" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      import graft.sources.icechunk.{IcechunkSource, IcechunkStore}
      val root = java.nio.file.Files.createTempDirectory("graft-icechunkgate")
      def hourly(onlyClicks: Boolean) = {
        val base = Tables.load(s, dir, "events")
        val f = if (onlyClicks) base.filter($"event_type" === "click") else base
        f.groupBy(floor(unix_timestamp($"ts") / 86400).cast(DoubleType).as("d"),
            hour($"ts").cast(DoubleType).as("h"))
          .agg(count(lit(1)).cast(DoubleType).as("n"),
            round(sum($"value"), 4).as("total_value"))
      }
      val s1 = IcechunkStore.Writer.commit(root,
        graft.nd.NdPivot.pivot(hourly(onlyClicks = true), Seq("d", "h")), message = "clicks")
      IcechunkStore.Writer.tag(root, "clicks", s1)
      IcechunkStore.Writer.commit(root,
        graft.nd.NdPivot.pivot(hourly(onlyClicks = false), Seq("d", "h")), message = "all")
      val cols = Seq("d", "h", "n", "total_value", "snap")
      val tip = graft.dsl.JsonQuery.compile(s,
        s"""{"select": ["d", "h", "n", "total_value"],
             "from": {"icechunk": {"paths": ["$root"]}}}""")
        .withColumn("snap", lit("main")).select(cols.map(col): _*)
      val tagged = IcechunkSource.read(s, root.toString, tag = Some("clicks"))
        .select((Seq("d", "h", "n", "total_value").map(col) :+
          lit("clicks").as("snap")): _*)
      tip.unionAll(tagged).orderBy("snap", "d", "h")
    },
    "q_netcdf_roundtrip" -> { (s, dir) =>
      GraftSession.configure(s)
      val daily = Tables.load(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).cast(TimestampNTZType).as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-ncgate")
        .resolve("daily.nc").toString
      NetcdfWriter.writeFlat(daily, tmp)
      NetcdfSource.readFile(s, tmp)
        .select(col("day"), col("event_type"), col("n"), col("total_value"))
        .orderBy("day", "event_type")
    },
    "q_netcdf_profile" -> { (s, _) => netcdfProfile(s) },
    // Plain (non-netcdf) HDF5 with a compound dataset, through the DSL:
    // each modelled member becomes a `{dataset}/{member}` column over the
    // dataset's dims (the vlen member is skipped). Oracle = the member
    // values the REFERENCE's own tests pin for this file
    // (beacon-arrow-hdf5/tests/backend_parity.rs:234-252).
    "q_hdf5_compound" -> { (s, _) =>
      GraftSession.configure(s)
      graft.dsl.JsonQuery.compile(s,
        s"""{"select": [{"column": "measurements/station", "alias": "station"},
                        {"column": "measurements/depth", "alias": "depth"},
                        {"column": "measurements/temp", "alias": "temp"},
                        {"column": "measurements/label", "alias": "label"},
                        {"column": "index", "alias": "idx"}],
             "sort_by": [{"Asc": "station"}],
             "from": {"hdf5": {"paths": ["$refCompound"]}}}""")
    },
    // Atlas store round trip: per-event-type hourly grids written as two
    // named datasets (dataset attribute = event_type, surfacing as a
    // rank-0 column), read back through the DSL as the supercast union
    // of datasets. Uncovered cells are NULL; the oracle rebuilds each
    // dataset's dense grid from the source parquet.
    "q_atlas_gridded" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-atlasgate")
      Seq("click", "view").foreach { et =>
        val hourly = Tables.load(s, dir, "events").filter($"event_type" === et)
          .groupBy(floor(unix_timestamp($"ts") / 86400).cast(DoubleType).as("d"),
            hour($"ts").cast(DoubleType).as("h"))
          .agg(count(lit(1)).cast(DoubleType).as("n"),
            round(sum($"value"), 4).as("total_value"))
        graft.sources.atlas.AtlasStore.Writer.writeDataset(
          root, et, graft.nd.NdPivot.pivot(hourly, Seq("d", "h")),
          attrs = Map("event_type" -> et))
      }
      graft.dsl.JsonQuery.compile(s,
        s"""{"select": ["event_type", "d", "h", "n", "total_value"],
             "from": {"atlas": {"paths": ["$root"]}}}""")
        .orderBy("event_type", "d", "h")
    },
    // BBF container round trip: per-event-type daily aggregates written
    // as three entries of one .bbf file (the 'click' entry carries an
    // extra max_value column), read back through the DSL as the
    // supercast union of entries with a pushed numeric filter (block
    // statistics pruning is I/O-only; DuckDB replays the filter). The
    // oracle recomputes everything from the source parquet.
    "q_bbf_scan" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft-bbfgate")
        .resolve("events.bbf")
      val ev = Tables.load(s, dir, "events")
      def daily(et: String, extra: Boolean) = {
        val base = ev.filter($"event_type" === et)
          .groupBy(date_trunc("day", $"ts").cast(TimestampNTZType).as("day"))
        val agged =
          if (extra) base.agg(count(lit(1)).as("n"),
            round(sum($"value"), 4).as("total_value"),
            round(max($"value"), 4).as("max_value"))
          else base.agg(count(lit(1)).as("n"),
            round(sum($"value"), 4).as("total_value"))
        agged.withColumn("event_type", lit(et)).orderBy("day")
      }
      graft.sources.bbf.BbfStore.Writer.write(path, Seq(
        "click" -> daily("click", extra = true),
        "view" -> daily("view", extra = false),
        "purchase" -> daily("purchase", extra = false)), blockRows = 8)
      graft.dsl.JsonQuery.compile(s,
        s"""{"select": ["event_type", "day", "n", "total_value", "max_value"],
             "filters": [{"for_query_parameter": "n", "gt_eq": 3}],
             "from": {"bbf": {"paths": ["$path"]}}}""")
        .orderBy("event_type", "day")
    },
    // GeoTIFF raster through the DSL (from.tiff → LZW strip decode →
    // arrays→tables flatten → geo axes). The oracle parquet is decoded
    // by an INDEPENDENT from-scratch python implementation
    // (tools/tiff_fixture.py) — tags, LZW and axis math shared with
    // nothing in the Scala reader.
    "q_tiff_raster" -> { (s, _) =>
      GraftSession.configure(s)
      graft.dsl.JsonQuery.compile(s,
        s"""{"select": [{"column": "geo.lat", "alias": "lat"},
                        {"column": "geo.lon", "alias": "lon"},
                        {"column": "band.0", "alias": "band0"}],
             "sort_by": [{"Asc": "lat"}, {"Asc": "lon"}],
             "from": {"tiff": {"paths": ["$refTiffLzw"]}}}""")
    },
    "q_zarr_gridded" -> { (s, _) => zarrGridded(s) },
    // Zarr v2: synthesized store (closed-form cells; independent JDK /
    // lz4-java encoders) read through the same DSv2 scan — numpy
    // dtypes, zlib/gzip/lz4 chunks, F order, big-endian, a fill-valued
    // missing chunk, consolidated .zmetadata. The lat filter prunes
    // chunk rows and crosses the lat chunk boundary at y=5.
    "q_zarr_v2_gridded" -> { (s, _) =>
      GraftSession.configure(s)
      val root = java.nio.file.Files.createTempDirectory("graft-zarrv2")
        .resolve("v2store.zarr")
      ZarrV2Fixture.write(root)
      graft.sources.zarr.ZarrSource.read(s, Seq(root.toString))
        .filter(col("lat") >= 31.2 && col("lat") <= 33.8)
        .select(col("time").cast(LongType).as("time"),
          round(col("lat"), 6).as("lat"),
          round(col("lon"), 6).as("lon"),
          round(col("sst"), 6).as("sst"),
          round(col("anom"), 6).as("anom"),
          col("mask").cast(IntegerType).as("mask"),
          col("qc").cast(IntegerType).as("qc"))
        .orderBy("time", "lat", "lon")
    },
    // CSV egress (COPY TO semantics: header, distributed) → inference
    // read-back; oracle recomputes from the source parquet
    "q_csv_roundtrip" -> { (s, dir) =>
      GraftSession.configure(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft-csvgate")
        .resolve("daily.csv").toString
      graft.sql.Outputs.copyTo(dailyAgg(s, dir), tmp, Some("csv"))
      graft.sources.FileCollection.csv(s, Seq(tmp), Map.empty)
        .select(col("day").cast(TimestampNTZType).as("day"),
          col("event_type").cast(StringType).as("event_type"),
          col("n").cast(LongType).as("n"),
          col("total_value").cast(DoubleType).as("total_value"))
        .orderBy("day", "event_type")
    },
    // JSONL (one JSON object per line — the training-corpus interchange
    // format) egress → read-back round trip; timestamps travel as
    // ISO strings, re-typed on the read side like the csv gate
    "q_jsonl_roundtrip" -> { (s, dir) =>
      GraftSession.configure(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft-jsonlgate")
        .resolve("daily.jsonl").toString
      graft.sql.Outputs.copyTo(dailyAgg(s, dir), tmp, Some("jsonl"))
      graft.sql.Outputs.readClassified(s, "jsonl", tmp)
        .select(col("day").cast(TimestampNTZType).as("day"),
          col("event_type").cast(StringType).as("event_type"),
          col("n").cast(LongType).as("n"),
          col("total_value").cast(DoubleType).as("total_value"))
        .orderBy("day", "event_type")
    },
    // Arrow IPC single-file writer → batch-streaming reader round trip
    "q_arrow_roundtrip" -> { (s, dir) =>
      GraftSession.configure(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft-arrowgate")
        .resolve("daily.arrow").toString
      graft.sql.Outputs.copyTo(dailyAgg(s, dir), tmp, Some("arrow"))
      graft.sources.ArrowSource.read(s, Seq(tmp))
        .select(col("day"), col("event_type"), col("n"), col("total_value"))
        .orderBy("day", "event_type")
    },
    // GeoParquet: lon/lat → WKB point geometry → read-back → WKT; the
    // oracle rebuilds the WKT text from the same source coordinates
    "q_geoparquet_roundtrip" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      val pts = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          round($"l_discount" * 100).cast(IntegerType).as("lon"),
          $"l_quantity".cast(IntegerType).as("lat"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-geogate")
        .resolve("pts.parquet").toString
      graft.sources.GeoParquet.write(pts, tmp, "lon", "lat")
      graft.sources.GeoParquet.read(s, Seq(tmp))
        .select($"l_orderkey", $"l_linenumber", $"geometry_wkt")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    // ndnetcdf: table → dense (day × hour) grid → .nc → flatten back;
    // uncovered cells surface as NULL (_FillValue). Oracle rebuilds the
    // dense grid with a cross join + left join.
    "q_ndnetcdf_grid" -> { (s, dir) =>
      GraftSession.configure(s)
      import s.implicits._
      val hourly = Tables.load(s, dir, "events").groupBy(
          floor(unix_timestamp($"ts") / 86400).cast(DoubleType).as("d"),
          hour($"ts").cast(DoubleType).as("h"))
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          round(sum($"value"), 4).as("total_value"))
      val ds = graft.nd.NdPivot.pivot(hourly, Seq("d", "h"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-ndgate")
        .resolve("grid.nc").toString
      NetcdfWriter.writeNd(ds, tmp)
      NetcdfSource.readFile(s, tmp)
        .select(col("d"), col("h"), col("n"), col("total_value"))
        .orderBy("d", "h")
    },
    // WARC round trip (r12): documents → adversarial HTML pages →
    // distributed 2-file WARC archive (warcinfo + HTTP response
    // records) → record-offset-SPLIT read-back (64 KiB splits force
    // the mid-file boundary scan at gate scale). The oracle recomputes
    // every record field + body md5 from the source parquet.
    "q_warc_scan" -> { (s, dir) =>
      GraftSession.configure(s)
      val pages = Tables.load(s, dir, "documents").select(
        concat(lit("http://corpus.example/doc/"),
          col("doc_id").cast("string")).as("uri"),
        QueriesData.docHtml(col("doc_id"), col("text")).as("html"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-warcgate").toString
      graft.sources.WarcSource.Writer.write(pages, tmp, "uri", "html", files = 2)
      graft.sources.WarcSource.read(s, Seq(tmp), splitBytes = 64 * 1024)
        .select(col("warc_type"),
          coalesce(col("target_uri"), lit("-")).as("uri"),
          col("warc_date"), col("http_status"), col("http_content_type"),
          length(col("body").cast(StringType)).cast(LongType).as("body_chars"),
          md5(col("body")).as("body_md5"))
        .orderBy("warc_type", "uri")
    },
    // WARC gz-member round trip (r12): same archive content as
    // q_warc_scan but in the standard crawl layout — one gzip member
    // per record — read back through COMPRESSED-OFFSET member splits
    // (16 KiB splits force the raw magic scan + parse-validated member
    // alignment on every task). Same oracle shape as q_warc_scan.
    "q_warc_gz" -> { (s, dir) =>
      GraftSession.configure(s)
      val pages = Tables.load(s, dir, "documents").select(
        concat(lit("http://corpus.example/doc/"),
          col("doc_id").cast("string")).as("uri"),
        QueriesData.docHtml(col("doc_id"), col("text")).as("html"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-warcgz").toString
      graft.sources.WarcSource.Writer.write(pages, tmp, "uri", "html",
        files = 2, gzip = true)
      graft.sources.WarcSource.read(s, Seq(tmp), splitBytes = 16 * 1024)
        .select(col("warc_type"),
          coalesce(col("target_uri"), lit("-")).as("uri"),
          col("warc_date"), col("http_status"), col("http_content_type"),
          length(col("body").cast(StringType)).cast(LongType).as("body_chars"),
          md5(col("body")).as("body_md5"))
        .orderBy("warc_type", "uri")
    },
    // WET round trip (r12): the extraction-egress shape — html_extract
    // output written as WARC `conversion` records (block = the UTF-8
    // text itself, no HTTP message) in the gz member layout, read back
    // through member splits. The oracle replays the extraction CTEs
    // over the source parquet; matching md5s prove the conversion
    // block framing is byte-transparent.
    "q_wet_roundtrip" -> { (s, dir) =>
      GraftSession.configure(s)
      val pages = Tables.load(s, dir, "documents").select(
        concat(lit("http://corpus.example/doc/"),
          col("doc_id").cast("string")).as("uri"),
        graft.operators.TextOps.htmlExtractText(
          QueriesData.docHtml(col("doc_id"), col("text"))).as("wet"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-wetgate").toString
      graft.sources.WarcSource.Writer.write(pages, tmp, "uri", "wet",
        files = 2, gzip = true, recordType = "conversion")
      graft.sources.WarcSource.read(s, Seq(tmp), splitBytes = 32 * 1024)
        .filter(col("warc_type") === "conversion")
        .select(col("target_uri").as("uri"), col("content_type"),
          md5(col("body")).as("body_md5"),
          length(col("body").cast(StringType)).cast(LongType).as("body_chars"))
        .orderBy("uri")
    },
    // CDX index round trip (r12): pages → gz WARC archive → scan →
    // CdxSource.index (map-only) → CDXJ egress (range-partitioned
    // sorted runs) → splittable text read-back. The oracle restates
    // every index field closed-form — surt, capture ts, mime, status,
    // payload digest, and the WARC record length INCLUDING its HTTP
    // head (77 framing bytes + the Content-Length digits). offset and
    // filename are real but not closed-form (partition assignment);
    // q_cdx_fetch proves them by USING them.
    "q_cdx_scan" -> { (s, dir) =>
      GraftSession.configure(s)
      val pages = Tables.load(s, dir, "documents").select(
        concat(lit("http://corpus.example/doc/"),
          col("doc_id").cast("string")).as("uri"),
        QueriesData.docHtml(col("doc_id"), col("text")).as("html"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-cdxgate").toString
      graft.sources.WarcSource.Writer.write(pages, s"$tmp/warc", "uri", "html",
        files = 2, gzip = true)
      val idx = graft.sources.CdxSource.index(
        graft.sources.WarcSource.read(s, Seq(s"$tmp/warc")))
      graft.sources.CdxSource.write(idx, s"$tmp/cdx", files = 2)
      graft.sources.CdxSource.read(s, Seq(s"$tmp/cdx"))
        .select(col("surt"), col("ts"), col("url"), col("mime"),
          col("status"), col("digest"), col("length"))
        .orderBy("url")
    },
    // CDX-driven random-access fetch (r12): the index round trip's
    // offsets/filenames FEED WarcSource.fetch — a filtered subset of
    // records pulls back by ranged reads of their gzip members, never
    // a full archive scan. Matching bodies prove the stored compressed
    // offsets are byte-exact through the CDXJ text round trip.
    "q_cdx_fetch" -> { (s, dir) =>
      GraftSession.configure(s)
      val pages = Tables.load(s, dir, "documents").select(
        concat(lit("http://corpus.example/doc/"),
          col("doc_id").cast("string")).as("uri"),
        QueriesData.docHtml(col("doc_id"), col("text")).as("html"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-cdxfetch").toString
      graft.sources.WarcSource.Writer.write(pages, s"$tmp/warc", "uri", "html",
        files = 2, gzip = true)
      graft.sources.CdxSource.write(graft.sources.CdxSource.index(
        graft.sources.WarcSource.read(s, Seq(s"$tmp/warc"))), s"$tmp/cdx",
        files = 2)
      val wanted = graft.sources.CdxSource.read(s, Seq(s"$tmp/cdx"))
        .filter(regexp_extract(col("url"), "([0-9]+)$", 1)
          .cast(LongType) % 7 === 3)
        .select(concat(lit(s"$tmp/warc/"), col("filename")).as("warc_file"),
          col("offset").as("record_offset"))
      graft.sources.WarcSource.fetch(wanted)
        .select(col("target_uri").as("uri"), col("http_status"),
          length(col("body").cast(StringType)).cast(LongType).as("body_chars"),
          md5(col("body")).as("body_md5"))
        .orderBy("uri")
    },
    // Pruned key-range lookup (r13): the read-side half of the sorted
    // non-overlapping CDXJ layout — write publishes per-run (min,max)
    // SURT sidecars, lookup prunes whole files against them BEFORE the
    // text scan (CdxSpec pins the 1-of-4 files-opened counter; this
    // gate proves the pruned rows equal the full scan + filter). The
    // oracle restates the surviving range closed-form.
    "q_cdx_pruned_lookup" -> { (s, dir) =>
      GraftSession.configure(s)
      val pages = Tables.load(s, dir, "documents").select(
        concat(lit("http://corpus.example/doc/"),
          col("doc_id").cast("string")).as("uri"),
        QueriesData.docHtml(col("doc_id"), col("text")).as("html"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-cdxprune").toString
      graft.sources.WarcSource.Writer.write(pages, s"$tmp/warc", "uri", "html",
        files = 2, gzip = true)
      graft.sources.CdxSource.write(graft.sources.CdxSource.index(
        graft.sources.WarcSource.read(s, Seq(s"$tmp/warc"))), s"$tmp/cdx",
        files = 4)
      graft.sources.CdxSource.lookup(s, Seq(s"$tmp/cdx"),
          "example,corpus)/doc/2", "example,corpus)/doc/3")
        .select(col("surt"), col("ts"), col("url"), col("mime"),
          col("status"), col("digest"), col("length"))
        .orderBy("url")
    },
    // The same pruned lookup through the DSL FRONT DOOR (r14): a JSON
    // query with `from.cdx` and a filter tree pinning a `surt` range
    // routes through the identical sidecar pruning — the pruning is no
    // longer column-API-only. Rows must equal the q_cdx_pruned_lookup
    // restatement; CdxSpec pins the files-opened counter (inputFiles)
    // and the alias-shadowing guard for this path.
    "q_cdx_dsl_pruned" -> { (s, dir) =>
      GraftSession.configure(s)
      val pages = Tables.load(s, dir, "documents").select(
        concat(lit("http://corpus.example/doc/"),
          col("doc_id").cast("string")).as("uri"),
        QueriesData.docHtml(col("doc_id"), col("text")).as("html"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-cdxdsl").toString
      graft.sources.WarcSource.Writer.write(pages, s"$tmp/warc", "uri", "html",
        files = 2, gzip = true)
      graft.sources.CdxSource.write(graft.sources.CdxSource.index(
        graft.sources.WarcSource.read(s, Seq(s"$tmp/warc"))), s"$tmp/cdx",
        files = 4)
      graft.dsl.JsonQuery.compile(s,
        s"""{"from": {"cdx": {"paths": ["$tmp/cdx"]}},
             "select": ["surt", "ts", "url", "mime", "status", "digest", "length"],
             "filter": {"and": [
               {"column": "surt", "gt_eq": "example,corpus)/doc/2"},
               {"column": "surt", "lt": "example,corpus)/doc/3"}]},
             "sort_by": [{"asc": "url"}]}""")
    },
    // Index-driven selective curation (r12 capstone): a SURT KEY RANGE
    // over the CDX index picks the records (the crawl-index idiom —
    // sorted keys make "this host/prefix" a contiguous range), fetch
    // pulls ONLY those records' byte ranges, html_extract runs on the
    // fetched bodies — the archive itself is never scanned after
    // indexing, and since r13 the index lookup itself opens only the
    // sidecar-pruned runs. Oracle = the extraction CTEs over the id range.
    "q_cdx_curate" -> { (s, dir) =>
      GraftSession.configure(s)
      val pages = Tables.load(s, dir, "documents").select(
        concat(lit("http://corpus.example/doc/"),
          col("doc_id").cast("string")).as("uri"),
        QueriesData.docHtml(col("doc_id"), col("text")).as("html"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-cdxcur").toString
      graft.sources.WarcSource.Writer.write(pages, s"$tmp/warc", "uri", "html",
        files = 2, gzip = true)
      graft.sources.CdxSource.write(graft.sources.CdxSource.index(
        graft.sources.WarcSource.read(s, Seq(s"$tmp/warc"))), s"$tmp/cdx",
        files = 2)
      val wanted = graft.sources.CdxSource.lookup(s, Seq(s"$tmp/cdx"),
          "example,corpus)/doc/2", "example,corpus)/doc/3")
        .select(concat(lit(s"$tmp/warc/"), col("filename")).as("warc_file"),
          col("offset").as("record_offset"))
      val fetched = graft.sources.WarcSource.fetch(wanted)
        .select(col("target_uri").as("uri"),
          col("body").cast(StringType).as("text"))
      graft.dsl.CuratePipeline.compile(fetched,
          """{"stages": [{"op": "html_extract"}]}""", idCol = "uri")
        .select(col("uri"), md5(col("text")).as("text_md5"),
          length(col("text")).cast(LongType).as("n_chars"))
        .orderBy("uri")
    },
    // WAT round trip (r12): the metadata third of the crawl format
    // family — per-page JSON envelopes (url, title, declared lang,
    // resolved outlinks, extracted from the HTML by the engine's
    // row-local kernels) written as WARC `metadata` records, read back
    // through member splits, and re-parsed with from_json. Every field
    // is stated closed-form by the oracle.
    "q_wat_roundtrip" -> { (s, dir) =>
      GraftSession.configure(s)
      import graft.operators.TextOps
      val uri = concat(lit("http://corpus.example/doc/"),
        col("doc_id").cast("string"))
      val html = QueriesData.docHtml(col("doc_id"), col("text"))
      val pages = Tables.load(s, dir, "documents").select(
        uri.as("uri"),
        to_json(struct(
          uri.as("url"),
          TextOps.htmlTitle(html).as("title"),
          TextOps.htmlLang(html).as("lang"),
          TextOps.htmlLinks(html, uri).as("links"))).as("wat"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-watgate").toString
      graft.sources.WarcSource.Writer.write(pages, tmp, "uri", "wat",
        files = 2, gzip = true, recordType = "metadata")
      val watSchema = "struct<url:string,title:string,lang:string,links:array<string>>"
      graft.sources.WarcSource.read(s, Seq(tmp), splitBytes = 32 * 1024)
        .filter(col("warc_type") === "metadata")
        .select(col("content_type"),
          from_json(col("body").cast(StringType), watSchema,
            Map.empty[String, String]).as("j"))
        .select(col("content_type"), col("j.url").as("url"),
          col("j.title").as("title"), col("j.lang").as("lang"),
          array_join(col("j.links"), "|").as("links"))
        .orderBy("url")
    },
    // WARC revisit dedup (r12): the identical-payload-digest profile —
    // repeated payloads store ONCE (the keeper response) plus empty
    // revisit records pointing back; the gate reconstructs EVERY
    // (uri, body) by joining revisits to keepers through the member-
    // split gz read, proving the deduped archive is lossless. 10× of
    // the corpus stores as 50 payloads + 450 pointer records.
    "q_warc_revisit" -> { (s, dir) =>
      GraftSession.configure(s)
      val k = (col("doc_id") % 50).cast("string")
      val pages = Tables.load(s, dir, "documents").select(
        concat(lit("http://corpus.example/doc/"),
          col("doc_id").cast("string")).as("uri"),
        concat(lit("<p>shared payload "), k,
          lit(" repeated content</p>")).as("html"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-revisit").toString
      graft.sources.WarcSource.Writer.writeDeduped(pages, tmp, "uri", "html",
        files = 2, gzip = true)
      val rec = graft.sources.WarcSource.read(s, Seq(tmp), splitBytes = 16 * 1024)
      val resp = rec.filter(col("warc_type") === "response")
      val direct = resp.select(col("target_uri").as("uri"),
        md5(col("body")).as("body_md5"), lit(false).as("was_revisit"))
      val rejoined = rec.filter(col("warc_type") === "revisit")
        .join(resp.select(col("record_id").as("__rid"),
          md5(col("body")).as("__kmd5")),
          col("refers_to") === col("__rid"))
        .select(col("target_uri").as("uri"), col("__kmd5").as("body_md5"),
          lit(true).as("was_revisit"))
      direct.unionByName(rejoined).orderBy("uri")
    },
    // CDX generation merge (r12): two index generations (a recrawl
    // re-captures every third URL a month later) round-trip through
    // the CDXJ text layer, then `latest` keeps the newest capture per
    // SURT key — the incremental-recrawl maintenance step. Closed-form
    // oracle picks each doc's surviving generation.
    "q_cdx_latest" -> { (s, dir) =>
      GraftSession.configure(s)
      val d = col("doc_id").cast("string")
      def gen(docs: org.apache.spark.sql.DataFrame, ts: String, dig: String,
          off: org.apache.spark.sql.Column, file: String) =
        docs.select(
          concat(lit("com,site)/p/"), d).as("surt"), lit(ts).as("ts"),
          concat(lit("http://site.com/p/"), d).as("url"),
          lit("text/html").as("mime"), lit(200).as("status"),
          concat(lit(dig), d).as("digest"),
          (col("doc_id") + 100L).as("length"), off.as("offset"),
          lit(file).as("filename"))
      val docs = Tables.load(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft-cdxlatest").toString
      graft.sources.CdxSource.write(
        gen(docs, "20260101000000", "d1-", col("doc_id") * 10L, "gen1.warc.gz"),
        s"$tmp/g1", files = 2)
      graft.sources.CdxSource.write(
        gen(docs.filter(col("doc_id") % 3 === 0), "20260201000000", "d2-",
          col("doc_id") * 10L + 5L, "gen2.warc.gz"),
        s"$tmp/g2", files = 2)
      graft.sources.CdxSource.latest(
          graft.sources.CdxSource.read(s, Seq(s"$tmp/g1")),
          graft.sources.CdxSource.read(s, Seq(s"$tmp/g2")))
        .select(col("surt"), col("ts"), col("digest"), col("offset"),
          col("filename"))
        .orderBy("surt")
    },
    // The same newest-wins read through the DSL FRONT DOOR (r14,
    // completing the cdx DSL surface next to q_cdx_dsl_pruned): `from
    // .cdx` with `latest: true` reads the generation directories and
    // keeps the newest capture per SURT key — the incremental-recrawl
    // maintenance read, no column API required. Same rows as
    // q_cdx_latest.
    "q_cdx_dsl_latest" -> { (s, dir) =>
      GraftSession.configure(s)
      val d = col("doc_id").cast("string")
      def gen(docs: org.apache.spark.sql.DataFrame, ts: String, dig: String,
          off: org.apache.spark.sql.Column, file: String) =
        docs.select(
          concat(lit("com,site)/p/"), d).as("surt"), lit(ts).as("ts"),
          concat(lit("http://site.com/p/"), d).as("url"),
          lit("text/html").as("mime"), lit(200).as("status"),
          concat(lit(dig), d).as("digest"),
          (col("doc_id") + 100L).as("length"), off.as("offset"),
          lit(file).as("filename"))
      val docs = Tables.load(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft-cdxdsl2").toString
      graft.sources.CdxSource.write(
        gen(docs, "20260101000000", "d1-", col("doc_id") * 10L, "gen1.warc.gz"),
        s"$tmp/g1", files = 2)
      graft.sources.CdxSource.write(
        gen(docs.filter(col("doc_id") % 3 === 0), "20260201000000", "d2-",
          col("doc_id") * 10L + 5L, "gen2.warc.gz"),
        s"$tmp/g2", files = 2)
      graft.dsl.JsonQuery.compile(s,
        s"""{"from": {"cdx": {"paths": ["$tmp/g1", "$tmp/g2"], "latest": true}},
             "select": ["surt", "ts", "digest", "offset", "filename"],
             "sort_by": [{"asc": "surt"}]}""")
    },
    // digest-deduped fetch planning (r12): payloads repeat across URLs
    // (every 50th doc shares one body); group the INDEX by digest,
    // fetch ONE record per distinct payload — the
    // dedup-before-download idiom that saves both transfer and storage
    // on a 100 TB re-process. Keeper = numerically smallest URL.
    "q_cdx_dedup_fetch" -> { (s, dir) =>
      GraftSession.configure(s)
      val k = (col("doc_id") % 50).cast("string")
      val pages = Tables.load(s, dir, "documents").select(
        concat(lit("http://corpus.example/doc/"),
          col("doc_id").cast("string")).as("uri"),
        concat(lit("<p>shared payload "), k,
          lit(" repeated content</p>")).as("html"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-cdxdedup").toString
      graft.sources.WarcSource.Writer.write(pages, s"$tmp/warc", "uri", "html",
        files = 2, gzip = true)
      val idx = graft.sources.CdxSource.index(
        graft.sources.WarcSource.read(s, Seq(s"$tmp/warc")))
      val keepers = idx.withColumn("__rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("digest"))
            .orderBy(length(col("url")), col("url"))))
        .filter(col("__rn") === 1)
        .select(concat(lit(s"$tmp/warc/"), col("filename")).as("warc_file"),
          col("offset").as("record_offset"))
      graft.sources.WarcSource.fetch(keepers)
        .select(col("target_uri").as("uri"),
          md5(col("body")).as("body_md5"))
        .orderBy("uri")
    },
    // ODV writer+reader round trip, oracle recomputes from source parquet
    "q_odv_roundtrip" -> { (s, dir) =>
      GraftSession.configure(s)
      val daily = Tables.load(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).cast(TimestampNTZType).as("time_ISO8601"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-odvgate")
        .resolve("daily.txt").toString
      graft.sources.OdvWriter.write(daily, tmp)
      graft.sources.OdvSource.read(s, Seq(tmp))
        .select(col("time_ISO8601"), col("event_type"), col("n"), col("total_value"))
        .orderBy("time_ISO8601", "event_type")
    },
  )

  val oracles: Map[String, String] = Map(
    "q_delta_snapshot" ->
      s"""SELECT * FROM (
            SELECT 'latest' AS snap, q.* FROM (${dailyAggSql.format("WHERE event_type <> 'click'")}) q
            UNION ALL
            SELECT 'v0' AS snap, q.* FROM (${dailyAggSql.format("")}) q
          ) ORDER BY snap, day, event_type""",
    "q_iceberg_snapshot" ->
      s"""SELECT * FROM (
            SELECT 'latest' AS snap, q.* FROM (${dailyAggSql.format("")}) q
            UNION ALL
            SELECT 's1' AS snap, q.* FROM (${dailyAggSql.format("WHERE event_type <> 'click'")}) q
          ) ORDER BY snap, day, event_type""",
    "q_delta_dv" ->
      s"""SELECT * FROM (
            SELECT 'latest' AS snap, q.* FROM (${dailyAggSql.format("WHERE event_type <> 'click'")}) q
            UNION ALL
            SELECT 'v0' AS snap, q.* FROM (${dailyAggSql.format("")}) q
          ) ORDER BY snap, day, event_type""",
    "q_iceberg_deletes" ->
      s"""SELECT * FROM (
            SELECT 'latest' AS snap, q.* FROM (${dailyAggSql.format("WHERE event_type <> 'click'")}) q
            UNION ALL
            SELECT 's3' AS snap, q.* FROM (${dailyAggSql.format("WHERE event_type NOT IN ('click', 'view')")}) q
          ) ORDER BY snap, day, event_type""",
    // per-snapshot dense grids: all-events for the tip, click-only for the tag
    "q_icechunk_versions" ->
      """WITH ev AS (SELECT event_type,
                CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS DOUBLE) AS d,
                CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS h, value FROM events),
        a_agg AS (SELECT d, h, CAST(count(*) AS DOUBLE) AS n,
                  round(sum(value), 4) AS total_value FROM ev GROUP BY 1, 2),
        a_grid AS (SELECT dd.d, hh.h FROM (SELECT DISTINCT d FROM ev) dd,
                   (SELECT DISTINCT h FROM ev) hh),
        c_ev AS (SELECT * FROM ev WHERE event_type = 'click'),
        c_agg AS (SELECT d, h, CAST(count(*) AS DOUBLE) AS n,
                  round(sum(value), 4) AS total_value FROM c_ev GROUP BY 1, 2),
        c_grid AS (SELECT dd.d, hh.h FROM (SELECT DISTINCT d FROM c_ev) dd,
                   (SELECT DISTINCT h FROM c_ev) hh)
        SELECT * FROM (
          SELECT 'main' AS snap, g.d, g.h, a.n, a.total_value
          FROM a_grid g LEFT JOIN a_agg a ON a.d = g.d AND a.h = g.h
          UNION ALL
          SELECT 'clicks' AS snap, g.d, g.h, a.n, a.total_value
          FROM c_grid g LEFT JOIN c_agg a ON a.d = g.d AND a.h = g.h)
        ORDER BY snap, d, h""",
    // n comes back as DOUBLE (classic netcdf has no 64-bit int; documented)
    "q_netcdf_roundtrip" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           event_type, CAST(count(*) AS DOUBLE) AS n,
           round(sum(value), 4) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    "q_netcdf_profile" ->
      s"SELECT * FROM read_parquet('$fixtures/netcdf_profile/*.parquet') ORDER BY lat, lon, deph, temp",
    "q_hdf5_compound" ->
      """SELECT CAST(station AS DOUBLE) AS station, CAST(depth AS DOUBLE) AS depth,
           CAST(temp AS DOUBLE) AS temp, label, CAST(idx AS DOUBLE) AS idx
         FROM (VALUES (1, 0, 12.5, 'alpha', 0), (2, 10, 11.25, 'beta', 1),
                      (3, 20, 10.0, 'gamma', 2), (4, 30, 9.75, 'delta', 3))
           AS t(station, depth, temp, label, idx)
         ORDER BY station""",
    // per-event-type dense grid: distinct d × distinct h WITHIN each type
    "q_atlas_gridded" ->
      """WITH ev AS (SELECT event_type,
                CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS DOUBLE) AS d,
                CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS h, value
              FROM events WHERE event_type IN ('click', 'view')),
        agg AS (SELECT event_type, d, h, CAST(count(*) AS DOUBLE) AS n,
                round(sum(value), 4) AS total_value FROM ev GROUP BY 1, 2, 3),
        grid AS (SELECT dd.event_type, dd.d, hh.h
                 FROM (SELECT DISTINCT event_type, d FROM ev) dd
                 JOIN (SELECT DISTINCT event_type, h FROM ev) hh USING (event_type))
        SELECT g.event_type, g.d, g.h, a.n, a.total_value
        FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.d = g.d AND a.h = g.h
        ORDER BY g.event_type, g.d, g.h""",
    // entry union: max_value exists only in the 'click' entry → NULL
    // elsewhere; the DSL's n >= 3 filter replays as HAVING
    "q_bbf_scan" ->
      """WITH d AS (SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
             count(*) AS n, round(sum(value), 4) AS total_value,
             round(max(value), 4) AS max_value
           FROM events WHERE event_type IN ('click', 'view', 'purchase')
           GROUP BY 1, 2 HAVING count(*) >= 3)
        SELECT event_type, day, n, total_value,
          CASE WHEN event_type = 'click' THEN max_value END AS max_value
        FROM d ORDER BY event_type, day""",
    "q_tiff_raster" ->
      s"SELECT lat, lon, band0 FROM read_parquet('$fixtures/tiff_lzw/*.parquet') ORDER BY lat, lon",
    "q_ndnetcdf_grid" ->
      """WITH ev AS (SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS DOUBLE) AS d,
                CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS h, value FROM events),
        agg AS (SELECT d, h, CAST(count(*) AS DOUBLE) AS n,
                round(sum(value), 4) AS total_value FROM ev GROUP BY 1, 2),
        grid AS (SELECT dd.d, hh.h FROM (SELECT DISTINCT d FROM ev) dd,
                 (SELECT DISTINCT h FROM ev) hh)
        SELECT g.d, g.h, a.n, a.total_value
        FROM grid g LEFT JOIN agg a ON a.d = g.d AND a.h = g.h
        ORDER BY g.d, g.h""",
    "q_csv_roundtrip" ->
      s"""SELECT * FROM (${dailyAggSql.format("")}) ORDER BY day, event_type""",
    "q_jsonl_roundtrip" ->
      s"""SELECT * FROM (${dailyAggSql.format("")}) ORDER BY day, event_type""",
    "q_arrow_roundtrip" ->
      s"""SELECT * FROM (${dailyAggSql.format("")}) ORDER BY day, event_type""",
    // WKT text matches the engine's renderer: integral doubles print ".0"
    "q_geoparquet_roundtrip" ->
      """SELECT l_orderkey, l_linenumber,
           'POINT (' || CAST(CAST(round(l_discount * 100) AS INT) AS VARCHAR)
             || '.0 ' || CAST(CAST(l_quantity AS INT) AS VARCHAR) || '.0)'
             AS geometry_wkt
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_zarr_gridded" ->
      s"SELECT * FROM read_parquet('$fixtures/zarr_gridded_slice/*.parquet') ORDER BY lat, lon",
    // every cell recomputed arithmetically from the grid indices — the
    // same closed forms the fixture encoder packed into the chunks
    "q_zarr_v2_gridded" ->
      """SELECT CAST(t.t*3600 + 100 AS BIGINT) AS time,
           30.0 + y.y*CAST(0.5 AS DOUBLE) AS lat,
           -10.0 + x.x*CAST(1.0 AS DOUBLE) AS lon,
           round((t.t*100 + y.y*10 + x.x) * CAST(0.25 AS DOUBLE), 6) AS sst,
           round((t.t*2 - y.y + x.x) * CAST(0.5 AS DOUBLE), 6) AS anom,
           CAST(CASE WHEN y.y >= 5 AND x.x >= 6 THEN -1
                ELSE (y.y*12 + x.x) % 3 END AS INT) AS mask,
           CAST((y.y*7 + x.x*3 + t.t) % 250 AS INT) AS qc
         FROM (SELECT CAST(range AS INT) AS t FROM range(0, 6)) t,
              (SELECT CAST(range AS INT) AS y FROM range(0, 10)) y,
              (SELECT CAST(range AS INT) AS x FROM range(0, 12)) x
         WHERE 30.0 + y.y*CAST(0.5 AS DOUBLE) >= 31.2
           AND 30.0 + y.y*CAST(0.5 AS DOUBLE) <= 33.8
         ORDER BY time, lat, lon""",
    // response rows recompute the HTML payload; warcinfo rows are the
    // writer's fixed warc-fields block, one per part file; the gz
    // gate reads the SAME logical archive (member layout is a pure
    // encoding change the round trip must erase), so one oracle
    // serves both
    "q_warc_scan" -> warcOracle,
    "q_warc_gz" -> warcOracle,
    // the id range a surt key range selects, then the extraction CTEs
    "q_cdx_curate" ->
      s"""WITH h AS (SELECT doc_id, ${QueriesData.docHtmlSql("text")} AS html
            FROM documents WHERE CAST(doc_id AS VARCHAR) LIKE '2%'),
        ${QueriesData.htmlExtractCtes("h", "hx", "")}
        SELECT 'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
          md5(text) AS text_md5, CAST(len(text) AS BIGINT) AS n_chars
        FROM hx ORDER BY uri""",
    // every envelope field closed-form: the six rooted anchors of the
    // shared html wrap resolve against the page's own authority
    "q_wat_roundtrip" ->
      """SELECT 'application/json' AS content_type,
           'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           '' AS lang,
           'http://corpus.example/|http://corpus.example/about|'
             || 'http://corpus.example/contact|http://corpus.example/share|'
             || 'http://corpus.example/like|http://corpus.example/sub' AS links
         FROM documents ORDER BY url""",
    // lossless reconstruction stated closed-form: every uri answers
    // its payload's md5; revisit-ness = not the numerically smallest
    // uri of the payload group (doc_id >= 50)
    "q_warc_revisit" ->
      """SELECT 'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
           md5('<p>shared payload ' || CAST(doc_id % 50 AS VARCHAR)
             || ' repeated content</p>') AS body_md5,
           doc_id >= 50 AS was_revisit
         FROM documents ORDER BY uri""",
    // each key's surviving generation stated closed-form: recrawled
    // (%3=0) docs answer gen2's ts/digest/offset, the rest gen1's
    "q_cdx_latest" ->
      """SELECT 'com,site)/p/' || CAST(doc_id AS VARCHAR) AS surt,
           CASE WHEN doc_id % 3 = 0 THEN '20260201000000'
                ELSE '20260101000000' END AS ts,
           CASE WHEN doc_id % 3 = 0 THEN 'd2-' ELSE 'd1-' END
             || CAST(doc_id AS VARCHAR) AS digest,
           CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id * 10 + 5
                ELSE doc_id * 10 END AS BIGINT) AS offset,
           CASE WHEN doc_id % 3 = 0 THEN 'gen2.warc.gz'
                ELSE 'gen1.warc.gz' END AS filename
         FROM documents ORDER BY surt""",
    // identical restatement through the DSL front door
    "q_cdx_dsl_latest" ->
      """SELECT 'com,site)/p/' || CAST(doc_id AS VARCHAR) AS surt,
           CASE WHEN doc_id % 3 = 0 THEN '20260201000000'
                ELSE '20260101000000' END AS ts,
           CASE WHEN doc_id % 3 = 0 THEN 'd2-' ELSE 'd1-' END
             || CAST(doc_id AS VARCHAR) AS digest,
           CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id * 10 + 5
                ELSE doc_id * 10 END AS BIGINT) AS offset,
           CASE WHEN doc_id % 3 = 0 THEN 'gen2.warc.gz'
                ELSE 'gen1.warc.gz' END AS filename
         FROM documents ORDER BY surt""",
    // one fetch per distinct payload; keeper = numerically smallest
    // URL = the doc_ids under 50
    "q_cdx_dedup_fetch" ->
      """SELECT 'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
           md5('<p>shared payload ' || CAST(doc_id % 50 AS VARCHAR)
             || ' repeated content</p>') AS body_md5
         FROM documents WHERE doc_id < 50 ORDER BY uri""",
    // the extraction CTEs replayed over the source parquet
    "q_wet_roundtrip" ->
      s"""WITH h AS (SELECT doc_id, ${QueriesData.docHtmlSql("text")} AS html
            FROM documents),
        ${QueriesData.htmlExtractCtes("h", "hx", "")}
        SELECT 'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
          'text/plain' AS content_type, md5(text) AS body_md5,
          CAST(len(text) AS BIGINT) AS body_chars
        FROM hx ORDER BY uri""",
    // every index field closed-form; length = the HTTP head's 77
    // framing bytes + the Content-Length value's digits + the payload
    "q_cdx_scan" ->
      s"""WITH h AS (SELECT doc_id, ${QueriesData.docHtmlSql("text")} AS html
            FROM documents)
        SELECT 'example,corpus)/doc/' || CAST(doc_id AS VARCHAR) AS surt,
          '20260101000000' AS ts,
          'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
          'text/html' AS mime, 200 AS status, md5(html) AS digest,
          CAST(77 + len(CAST(octet_length(encode(html)) AS VARCHAR))
            + octet_length(encode(html)) AS BIGINT) AS length
        FROM h ORDER BY url""",
    // the q_cdx_scan restatement narrowed to the pruned SURT range —
    // identical rows whether the engine opened 4 runs or 1
    "q_cdx_pruned_lookup" ->
      s"""WITH h AS (SELECT doc_id, ${QueriesData.docHtmlSql("text")} AS html
            FROM documents
            WHERE CAST(doc_id AS VARCHAR) >= '2' AND CAST(doc_id AS VARCHAR) < '3')
        SELECT 'example,corpus)/doc/' || CAST(doc_id AS VARCHAR) AS surt,
          '20260101000000' AS ts,
          'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
          'text/html' AS mime, 200 AS status, md5(html) AS digest,
          CAST(77 + len(CAST(octet_length(encode(html)) AS VARCHAR))
            + octet_length(encode(html)) AS BIGINT) AS length
        FROM h ORDER BY url""",
    // same restated rows through the DSL front door — identical whether
    // the filter arrived via lookup(lo,hi) or a JSON filter tree
    "q_cdx_dsl_pruned" ->
      s"""WITH h AS (SELECT doc_id, ${QueriesData.docHtmlSql("text")} AS html
            FROM documents
            WHERE CAST(doc_id AS VARCHAR) >= '2' AND CAST(doc_id AS VARCHAR) < '3')
        SELECT 'example,corpus)/doc/' || CAST(doc_id AS VARCHAR) AS surt,
          '20260101000000' AS ts,
          'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
          'text/html' AS mime, 200 AS status, md5(html) AS digest,
          CAST(77 + len(CAST(octet_length(encode(html)) AS VARCHAR))
            + octet_length(encode(html)) AS BIGINT) AS length
        FROM h ORDER BY url""",
    "q_cdx_fetch" ->
      s"""WITH h AS (SELECT doc_id, ${QueriesData.docHtmlSql("text")} AS html
            FROM documents WHERE doc_id % 7 = 3)
        SELECT 'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
          200 AS http_status, CAST(len(html) AS BIGINT) AS body_chars,
          md5(html) AS body_md5
        FROM h ORDER BY uri""",
    "q_odv_roundtrip" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS "time_ISO8601",
           event_type, count(*) AS n, round(sum(value), 4) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY "time_ISO8601", event_type""",
  )

  private lazy val warcOracle: String =
      s"""WITH h AS (SELECT doc_id, ${QueriesData.docHtmlSql("text")} AS html
            FROM documents),
        resp AS (SELECT 'response' AS warc_type,
            'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
            CAST('2026-01-01 00:00:00' AS TIMESTAMP) AS warc_date,
            200 AS http_status,
            'text/html; charset=utf-8' AS http_content_type,
            CAST(len(html) AS BIGINT) AS body_chars,
            md5(html) AS body_md5
          FROM h),
        info AS (SELECT 'warcinfo' AS warc_type, '-' AS uri,
            CAST('2026-01-01 00:00:00' AS TIMESTAMP) AS warc_date,
            CAST(NULL AS INTEGER) AS http_status,
            CAST(NULL AS VARCHAR) AS http_content_type,
            CAST(len(wf) AS BIGINT) AS body_chars, md5(wf) AS body_md5
          FROM (SELECT 'software: graft' || chr(13) || chr(10)
                  || 'format: WARC file version 1.1' || chr(13) || chr(10) AS wf)
          CROSS JOIN range(2))
        SELECT * FROM (SELECT * FROM resp UNION ALL SELECT * FROM info)
        ORDER BY warc_type, uri"""
}
