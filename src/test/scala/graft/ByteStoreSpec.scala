package graft

import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.io.ByteStore

/** A real Hadoop FileSystem registered under a test scheme: every
  * `mockfs:/…` access goes down ByteStore's REMOTE branch (listStatus,
  * positioned FSDataInputStream reads, localize cache) while the bytes
  * live on local disk — the standard Hadoop-FS testing pattern. */
class MockFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockfs:///")
}

/** [[MockFs]] that counts open() calls — pins the readRange handle
  * cache: opens ∝ distinct files, not ∝ range reads */
class CountingFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("countfs:///")
  override def open(p: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    CountingFs.opens.incrementAndGet()
    super.open(p, bufferSize)
  }
}
object CountingFs {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** The storage seam: scheme dispatch, positioned remote reads, the
  * executor localize cache, and the custom readers end-to-end over a
  * Hadoop scheme (the 100 TB deployment shape: object store behind a
  * Hadoop connector, not POSIX). */
class ByteStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = GraftSession.build("local[4]", 4)
    s.sparkContext.hadoopConfiguration.set("fs.mockfs.impl", classOf[MockFs].getName)
    s
  }

  private def viaMock(path: String): String = { spark; s"mockfs:$path" }

  test("scheme detection: plain and file: are local, mockfs/s3a are not") {
    assert(!ByteStore.hasScheme("/data/x.nc"))
    assert(!ByteStore.hasScheme("file:/data/x.nc"))
    assert(!ByteStore.hasScheme("file:///data/x.nc"))
    assert(!ByteStore.hasScheme("C:/windows/style"))
    assert(ByteStore.hasScheme("s3a://bucket/key"))
    assert(ByteStore.hasScheme("mockfs:/tmp/x"))
    assert(ByteStore.toLocal("file:/a/b") == "/a/b")
    assert(ByteStore.toLocal("file:///a/b") == "/a/b")
    assert(ByteStore.toLocal("file://localhost/a/b") == "/a/b")
    assert(ByteStore.toLocal("/a/b") == "/a/b")
  }

  test("remote branch: exists/size/list/readAll/readRange agree with java.nio") {
    val dir = Files.createTempDirectory("graft-bytestore")
    val f = dir.resolve("payload.bin")
    val bytes = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    Files.write(f, bytes)
    val m = viaMock(f.toString)
    assert(ByteStore.exists(m))
    assert(!ByteStore.exists(viaMock(s"$dir/nope")))
    assert(ByteStore.isDirectory(viaMock(dir.toString)))
    assert(ByteStore.size(m) == 1000L)
    assert(ByteStore.readAll(m).toSeq == bytes.toSeq)
    assert(ByteStore.readRange(m, 100, 16).toSeq == bytes.slice(100, 116).toSeq)
    assert(ByteStore.list(viaMock(dir.toString)).map(ByteStore.fileName) == Seq("payload.bin"))
  }

  test("localize: one download per (path, mtime, size); mtime change re-fetches") {
    val dir = Files.createTempDirectory("graft-bytestore-loc")
    val f = dir.resolve("granule.dat")
    Files.write(f, "first contents".getBytes(StandardCharsets.UTF_8))
    val m = viaMock(f.toString)
    val before = ByteStore.cacheDownloads.get()
    val l1 = ByteStore.localize(m)
    val l2 = ByteStore.localize(m)
    assert(l1 == l2 && l1 != f.toString, "remote granule must map to a cache copy")
    assert(ByteStore.cacheDownloads.get() == before + 1, "second localize must hit the cache")
    assert(Files.readString(Paths.get(l1)) == "first contents")
    // a rewritten remote object (new mtime/size) must not serve stale bytes
    Files.write(f, "second contents!".getBytes(StandardCharsets.UTF_8))
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 2000))
    val l3 = ByteStore.localize(m)
    assert(l3 != l1 && Files.readString(Paths.get(l3)) == "second contents!")
    // plain local paths are identity — never copied
    assert(ByteStore.localize(f.toString) == f.toString)
  }

  test("zarr store reads over a Hadoop scheme match the local read") {
    val store = "/root/reference/test-datasets/gridded-example.zarr"
    val local = graft.sources.zarr.ZarrStore.readDataset(store)
    val remote = graft.sources.zarr.ZarrStore.readDataset(viaMock(store))
    assert(remote.dims == local.dims)
    assert(remote.variables.map(_.name) == local.variables.map(_.name))
    val lv = local.variables.maxBy(_.data.length)
    val rv = remote.variables.find(_.name == lv.name).get
    assert(java.util.Arrays.equals(rv.data, lv.data))
  }

  test("zarr DSv2 scan (partitions, pruning, decode) over a Hadoop scheme") {
    val store = "/root/reference/test-datasets/gridded-example.zarr"
    val local = graft.sources.zarr.ZarrSource.read(spark, Seq(store))
    val remote = graft.sources.zarr.ZarrSource.read(spark, Seq(viaMock(store)))
    assert(remote.schema == local.schema)
    assert(remote.count() == local.count())
    assert(remote.exceptAll(local).isEmpty && local.exceptAll(remote).isEmpty)
  }

  test("netcdf-4 (HDF5) container reads over a Hadoop scheme match the local read") {
    val nc = "/root/reference/test-datasets/test_file.nc"
    val local = graft.sources.netcdf.NetcdfSource.readContainer(nc)
    val remote = graft.sources.netcdf.NetcdfSource.readContainer(viaMock(nc))
    assert(remote.dims == local.dims)
    val lv = local.variables.maxBy(v => if (v.data == null) 0 else v.data.length)
    val rv = remote.variables.find(_.name == lv.name).get
    assert(java.util.Arrays.equals(rv.data, lv.data))
  }

  test("dataset classification (LIST DATASETS rule) over a Hadoop scheme") {
    val dir = Files.createTempDirectory("graft-bytestore-cls")
    Files.createDirectories(dir.resolve("z"))
    Files.writeString(dir.resolve("z/zarr.json"), "{}")
    Files.write(dir.resolve("t.tif"),
      Array[Byte]('I', 'I', 42, 0) ++ new Array[Byte](8))
    assert(graft.sql.Outputs.classifyPath(viaMock(s"$dir/z")) == Some("zarr"))
    assert(graft.sql.Outputs.classifyPath(viaMock(s"$dir/t.tif")) == Some("tiff"))
    assert(graft.sql.Outputs.classifyPath(viaMock(s"$dir")) == None)
  }

  test("delta log replay + DV anti-join over a Hadoop scheme") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-bytestore-delta").resolve("t").toString
    graft.sources.delta.DeltaSource.Writer.append(
      (1L to 10L).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "k"), t)
    graft.sources.delta.DeltaSource.Writer.dvDeleteWhere(spark, t, "k = 'even'")
    val rows = graft.sources.delta.DeltaSource.read(spark, viaMock(t))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("iceberg metadata + manifest resolution over a Hadoop scheme") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-bytestore-ice").resolve("t").toString
    graft.sources.iceberg.IcebergSource.Writer.append(
      spark, (1L to 10L).map(i => (i, s"v$i")).toDF("id", "k"), t)
    graft.sources.iceberg.IcebergSource.Writer.deleteWhere(spark, t, "id IN (2, 5)")
    val rows = graft.sources.iceberg.IcebergSource.read(spark, viaMock(t))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(1L, 3L, 4L, 6L, 7L, 8L, 9L, 10L))
  }

  test("bbf footer + chunk positioned reads work over a Hadoop scheme") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bytestore-bbf")
    val p = s"$dir/t.bbf"
    graft.sources.bbf.BbfStore.Writer.write(
      Paths.get(p), Seq("e1" -> Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "s")))
    val rows = graft.sources.bbf.BbfSource.read(spark, Seq(viaMock(p)))
      .orderBy("k").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(rows.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
  }

  test("single-file writers publish to a remote scheme and read back bit-equal") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bytestore-egress")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "k", "v")

    // arrow IPC
    val arrowT = viaMock(s"$dir/out.arrow")
    assert(graft.sources.ArrowSource.writeSingleFile(df, arrowT) == 3L)
    assert(graft.sources.ArrowSource.read(spark, Seq(arrowT))
      .orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))

    // netcdf classic (flat records)
    val ncT = viaMock(s"$dir/out.nc")
    assert(graft.sources.netcdf.NetcdfWriter.writeFlat(df, ncT) == 3L)
    assert(graft.sources.netcdf.NetcdfSource.read(spark, Seq(ncT)).count() == 3L)

    // odv ascii (+ the .zip collection shape)
    val odvT = viaMock(s"$dir/out.txt")
    assert(graft.sources.OdvWriter.write(df, odvT) == 3L)
    assert(graft.sources.OdvSource.read(spark, Seq(odvT)).count() == 3L)
    assert(graft.sources.OdvWriter.write(df, viaMock(s"$dir/out.zip")) == 3L)

    // bbf container
    val bbfT = viaMock(s"$dir/out.bbf")
    assert(graft.sources.bbf.BbfStore.Writer.write(bbfT, Seq("data" -> df)) == 3L)
    assert(graft.sources.bbf.BbfSource.read(spark, Seq(bbfT)).count() == 3L)
  }

  test("readRange reuses open handles: opens scale with files, not chunks") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.countfs.impl", classOf[CountingFs].getName)
    val dir = Files.createTempDirectory("graft-handle-reuse")
    val fileBytes = (0 until 3).map { i =>
      val bytes = Array.tabulate[Byte](4096)(j => ((i * 31 + j) % 251).toByte)
      Files.write(dir.resolve(s"granule-$i.bin"), bytes)
      bytes
    }
    CountingFs.opens.set(0)
    // a chunk-store scan shape: many range reads per granule, round-robin
    for (round <- 0 until 16; i <- 0 until 3) {
      val got = ByteStore.readRange(s"countfs:$dir/granule-$i.bin", round * 256L, 256)
      assert(got.toSeq == fileBytes(i).slice(round * 256, round * 256 + 256).toSeq)
    }
    // 48 positioned reads, 3 distinct files → exactly 3 opens
    assert(CountingFs.opens.get() == 3,
      s"expected one open per file, saw ${CountingFs.opens.get()}")
  }
}
