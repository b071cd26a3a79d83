package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueriesFormats.ZarrV2Fixture
import graft.sources.zarr.ZarrStore

/** Zarr v2 (`.zgroup`/`.zarray`/`.zattrs` + consolidated `.zmetadata`).
  *
  * The fixture encoder (QueriesFormats.ZarrV2Fixture) packs closed-form
  * cell values with INDEPENDENT encoders — JDK Deflater / GZIP, the
  * lz4-java block compressor — so every decode assertion here checks the
  * reader against arithmetic and foreign codecs, never against itself.
  */
class ZarrV2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  private def freshStore(sidecars: Boolean, consolidated: Boolean): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-zarrv2spec")
      .resolve("store.zarr")
    ZarrV2Fixture.write(root, sidecars = sidecars, consolidated = consolidated)
    root.toString
  }

  private def checkValues(root: String): Unit = {
    val ds = ZarrStore.readDataset(root)
    val dims = ds.dims.toMap
    assert(dims("time") == 6 && dims("lat") == 10 && dims("lon") == 12)
    val byName = ds.variables.map(v => v.name -> v).toMap
    // coordinates
    assert(byName("time").data(3) == ZarrV2Fixture.timeAt(3))
    assert(byName("lat").data(7) == ZarrV2Fixture.latAt(7))
    // C-order float32 zlib (sst), F-order float64 gzip (anom), lz4 uint8
    // (qc): every cell against the closed form
    def at3(name: String, t: Int, y: Int, x: Int): Double =
      byName(name).data((t * 10 + y) * 12 + x)
    for (t <- 0 until 6; y <- 0 until 10; x <- 0 until 12) {
      assert(at3("sst", t, y, x) == ZarrV2Fixture.sstAt(t, y, x).toFloat.toDouble,
        s"sst($t,$y,$x)")
      assert(at3("anom", t, y, x) == ZarrV2Fixture.anomAt(t, y, x),
        s"anom($t,$y,$x)")
      assert(at3("qc", t, y, x) == ZarrV2Fixture.qcAt(t, y, x), s"qc($t,$y,$x)")
    }
    // big-endian int16 with the (1,1) chunk absent → fill_value -1
    def mask(y: Int, x: Int): Double = byName("mask").data(y * 12 + x)
    for (y <- 0 until 10; x <- 0 until 12)
      assert(mask(y, x) == ZarrV2Fixture.maskAt(y, x), s"mask($y,$x)")
    assert(mask(6, 8) == -1.0) // inside the skipped chunk
    // xarray dimension binding came from _ARRAY_DIMENSIONS
    assert(byName("anom").dims == Seq("time", "lat", "lon"))
    assert(byName("mask").dims == Seq("lat", "lon"))
  }

  test("v2 store opens by listing (.zgroup/.zarray, no .zmetadata)") {
    checkValues(freshStore(sidecars = true, consolidated = false))
  }

  test("consolidated-only store (.zmetadata, NO per-array sidecars) opens") {
    // xarray consolidated=True object-store layout: metadata served from
    // one document; per-array .zarray/.zattrs files absent entirely
    checkValues(freshStore(sidecars = false, consolidated = true))
  }

  test("v2 store reads through the DSv2 scan with chunk pruning") {
    val root = freshStore(sidecars = true, consolidated = true)
    val df = graft.sources.zarr.ZarrSource.read(spark, Seq(root))
      .filter(col("lat") >= 33.0) // y in 6..9: prunes the first lat chunk
      .select("time", "lat", "lon", "sst", "mask")
    val rows = df.collect()
    assert(rows.length == 6 * 4 * 12)
    rows.foreach { r =>
      val t = ((r.getAs[Double]("time") - 100.0) / 3600.0).toInt
      val y = ((r.getAs[Double]("lat") - 30.0) / 0.5).round.toInt
      val x = (r.getAs[Double]("lon") + 10.0).round.toInt
      assert(r.getAs[Double]("sst") == ZarrV2Fixture.sstAt(t, y, x).toFloat.toDouble)
      assert(r.getAs[Double]("mask") == ZarrV2Fixture.maskAt(y, x))
    }
    // pruning is observable in the partition count: lat chunks 5-wide,
    // filter keeps only the second chunk of the grid-defining array's
    // lat axis
    val spec = graft.sources.zarr.ZarrSpec(root, None)
    val all = graft.sources.zarr.ZarrScanPlanner.partitions(spec, Array.empty).size
    val pruned = graft.sources.zarr.ZarrScanPlanner.partitions(spec,
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("lat", 33.0))).size
    assert(pruned < all, s"pruned=$pruned all=$all")
  }

  test("transpose codec: randomized differential vs independent index math") {
    val rnd = new scala.util.Random(20260817)
    for (trial <- 0 until 25) {
      val rank = 1 + rnd.nextInt(3)
      val shape = Array.fill(rank)(1 + rnd.nextInt(5))
      val perm = rnd.shuffle((0 until rank).toList).toArray
      val n = shape.product
      val decoded = Array.fill(n)(rnd.nextDouble())
      // build the STORED array with independent stride math:
      // stored[x(perm(0)), …] = decoded[x(0), …] over stored C-order
      val sShape = perm.map(shape)
      val stored = new Array[Double](n)
      def cIndex(sh: Array[Int], idx: Array[Int]): Int =
        idx.indices.foldLeft(0)((acc, d) => acc * sh(d) + idx(d))
      val idx = new Array[Int](rank)
      var done = false
      while (!done) {
        val sIdx = perm.map(idx)
        stored(cIndex(sShape, sIdx)) = decoded(cIndex(shape, idx))
        var d = rank - 1
        var cont = true
        while (cont && d >= 0) {
          idx(d) += 1
          if (idx(d) == shape(d)) { idx(d) = 0; d -= 1 } else cont = false
        }
        if (d < 0) done = true
      }
      val out = ZarrStore.unpermute(stored, shape, perm)
      assert(out.sameElements(decoded),
        s"trial $trial shape=${shape.mkString("x")} perm=${perm.mkString(",")}")
    }
  }

  test("numpy dtype strings map to the shared model") {
    assert(ZarrStore.numpyDtype("a", "<f8") == ("float64", "little"))
    assert(ZarrStore.numpyDtype("a", ">i2") == ("int16", "big"))
    assert(ZarrStore.numpyDtype("a", "|u1") == ("uint8", "little"))
    assert(ZarrStore.numpyDtype("a", "=i4") == ("int32", "little"))
    assert(ZarrStore.numpyDtype("a", "|b1") == ("bool", "little"))
    val e = intercept[IllegalArgumentException](ZarrStore.numpyDtype("a", "<c8"))
    assert(e.getMessage.contains("unsupported"))
  }

  test("v2 filters and unknown compressors reject loudly, naming them") {
    val root = java.nio.file.Files.createTempDirectory("graft-zarrv2bad")
    def mk(name: String, zarray: String): String = {
      val dir = root.resolve(name)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve(".zarray"), zarray.getBytes("UTF-8"))
      dir.toString
    }
    val withFilter = mk("f",
      """{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"<f8","order":"C",
         "fill_value":0,"compressor":null,
         "filters":[{"id":"delta","dtype":"<f8"}]}""")
    val e1 = intercept[IllegalArgumentException](ZarrStore.open(withFilter))
    assert(e1.getMessage.contains("filters unsupported") && e1.getMessage.contains("delta"))
    val withComp = mk("c",
      """{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"<f8","order":"C",
         "fill_value":0,"compressor":{"id":"lzma"},"filters":null}""")
    val e2 = intercept[IllegalArgumentException](ZarrStore.open(withComp))
    assert(e2.getMessage.contains("lzma"))
  }

  test("bz2 chunks decode (commons-compress round trip)") {
    val root = java.nio.file.Files.createTempDirectory("graft-zarrbz2").resolve("a")
    java.nio.file.Files.createDirectories(root)
    val vals = Array.tabulate(12)(i => i * 1.5 - 3.0)
    val raw = java.nio.ByteBuffer.allocate(vals.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(raw.putDouble)
    val out = new java.io.ByteArrayOutputStream()
    val bz = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(out)
    bz.write(raw.array()); bz.close()
    java.nio.file.Files.write(root.resolve("0"), out.toByteArray)
    java.nio.file.Files.write(root.resolve(".zarray"),
      """{"zarr_format":2,"shape":[12],"chunks":[12],"dtype":"<f8","order":"C",
         "fill_value":0,"compressor":{"id":"bz2","level":5},"filters":null}"""
        .getBytes("UTF-8"))
    val ds = ZarrStore.readDataset(root.toString)
    assert(ds.variables.head.data.sameElements(vals))
  }

  test("format classifier recognizes a v2 store directory") {
    val root = freshStore(sidecars = true, consolidated = false)
    assert(graft.sql.Outputs.classifyPath(root) == Some("zarr"))
    assert(ZarrStore.isZarr(root))
  }
}
