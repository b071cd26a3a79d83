package graft

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial robustness of the pure-JVM binary parsers: a 100 TB
  * crawl/archive inevitably contains truncated and bit-rotted files,
  * and a reader that loops forever or allocates unboundedly on one bad
  * byte takes an executor down with it. Contract pinned here: for
  * TRUNCATIONS and RANDOM BIT FLIPS of real fixture files, every
  * reader either returns a dataset or throws — within a hard time
  * budget, never a hang. (Exception TYPE is not pinned: any loud
  * failure is a task failure the driver surfaces; silence is the bug.)
  *
  * Fixtures are the reference repo's own test files (read-only;
  * mutations land in temp copies). Seeds are fixed — failures replay.
  */
class ReaderFuzzSpec extends AnyFunSuite {

  private val tmp = java.nio.file.Files.createTempDirectory("graft-fuzz")

  /** run `body` with a hard timeout; (completed?, threw?) */
  private def bounded(seconds: Int)(body: => Any): (Boolean, Boolean) = {
    val task = new java.util.concurrent.FutureTask[Boolean](() =>
      try { body; false } catch { case _: Throwable => true })
    val t = new Thread(task, "graft-fuzz-probe")
    t.setDaemon(true)
    t.start()
    try (true, task.get(seconds.toLong, java.util.concurrent.TimeUnit.SECONDS))
    catch {
      case _: java.util.concurrent.TimeoutException =>
        t.interrupt(); (false, false)
    }
  }

  private def fuzzOne(name: String, valid: Array[Byte], ext: String,
      read: String => Any): Unit = {
    val rnd = new scala.util.Random(20260815L)
    var probes = 0
    var threw = 0
    def probe(bytes: Array[Byte], what: String): Unit = {
      val p = tmp.resolve(s"$name-$probes$ext")
      java.nio.file.Files.write(p, bytes)
      val (completed, didThrow) = bounded(20)(read(p.toString))
      assert(completed, s"$name: reader HUNG on $what (${bytes.length} bytes)")
      probes += 1
      if (didThrow) threw += 1
    }
    // truncations — head slices across the whole range, denser early
    val n = valid.length
    val cuts = (Seq(0, 1, 2, 3, 4, 7, 8, 15, 16, 63, 64, 511, 512) ++
      (1 to 12).map(i => n * i / 13)).filter(_ < n).distinct
    cuts.foreach(c => probe(valid.take(c), s"truncation at $c"))
    // random single-byte flips (fixed seed — replayable)
    (1 to 60).foreach { _ =>
      val b = valid.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      probe(b, s"bit flip at $at")
    }
    // random garbage of plausible sizes
    Seq(64, 4096).foreach { sz =>
      val g = new Array[Byte](sz); rnd.nextBytes(g)
      probe(g, s"garbage $sz")
    }
    info(s"$name: $probes mutations, $threw threw, 0 hangs")
  }

  private def bytes(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

  private val refFmt = "/root/reference/beacon-db/beacon-file-formats"

  test("fuzz: GeoTIFF reader terminates on truncated/bit-flipped/garbage input") {
    fuzzOne("tiff",
      bytes(s"$refFmt/beacon-arrow-tiff/test-files/test.tif"), ".tif",
      p => graft.sources.tiff.TiffReader.readDataset(p))
  }

  test("fuzz: NetCDF classic reader terminates on truncated/bit-flipped/garbage input") {
    fuzzOne("nc",
      bytes(s"$refFmt/beacon-arrow-netcdf/test_files/gridded-example.nc"), ".nc",
      p => graft.sources.netcdf.NetcdfClassic.readDataset(p))
  }

  test("fuzz: HDF5 reader terminates on truncated/bit-flipped/garbage input") {
    fuzzOne("h5",
      bytes(s"$refFmt/beacon-arrow-hdf5/test_files/compound.h5"), ".h5",
      p => graft.sources.hdf5.Hdf5Reader.readDataset(p))
  }

  test("fuzz: media demuxers terminate on magic-prefixed garbage and zero-length framing") {
    val rnd = new scala.util.Random(7L)
    def withMagic(magic: Array[Byte], sz: Int): Array[Byte] = {
      val g = new Array[Byte](sz); rnd.nextBytes(g)
      magic ++ g
    }
    def probeAll(name: String, payloads: Seq[Array[Byte]],
        run: Array[Byte] => Any): Unit =
      payloads.zipWithIndex.foreach { case (p, i) =>
        val (completed, _) = bounded(20)(run(p))
        assert(completed, s"$name probe $i HUNG (${p.length} bytes)")
      }
    // AVI: RIFF header with bogus/zero sizes — chunk walkers that
    // advance by a length field must not spin on length 0
    val riff = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "AVI ".getBytes
    probeAll("avi", Seq(
      riff,
      riff ++ Array.fill[Byte](64)(0), // zero-length chunks forever
      withMagic(riff, 512),
      "RIFF".getBytes ++ Array[Byte](-1, -1, -1, -1) ++ "AVI ".getBytes ++
        Array.fill[Byte](32)(0)),
      p => graft.operators.AviDemux.sampleKeyframes(p, 3))
    // MP4: box size 0 ("to end") and size 1 (64-bit) and bogus sizes
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    probeAll("mp4", Seq(
      be32(0) ++ "ftyp".getBytes ++ Array.fill[Byte](24)(0), // size-0 box
      be32(1) ++ "ftyp".getBytes ++ Array.fill[Byte](8)(0),  // 64-bit size, truncated
      be32(16) ++ "ftyp".getBytes ++ withMagic(be32(0) ++ "moov".getBytes, 64),
      withMagic(be32(20) ++ "ftyp".getBytes, 256)),
      p => graft.operators.Mp4Demux.sampleKeyframes(p, 3))
    // MKV: EBML ids/varints with all-zero and all-ones length bytes
    val ebml = Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte)
    probeAll("mkv", Seq(
      ebml ++ Array.fill[Byte](32)(0),
      ebml ++ Array.fill[Byte](32)(-1),
      withMagic(ebml, 512)),
      p => graft.operators.MkvDemux.sampleKeyframes(p, 3))
  }

  test("fuzz: EXIF parser terminates and stays permissive on mutated JPEGs") {
    import org.apache.spark.unsafe.types.UTF8String
    def u8(s: String) = UTF8String.fromString(s)
    val valid = graft.operators.Exif.buildKernel(u8("Cam-1"), u8("Mod-1"),
      u8("2026:01:01 00:00:00"), 1, u8("N"), 10, 20, 300, u8("E"), 30, 40, 500)
    val rnd = new scala.util.Random(42L)
    (0 until valid.length).foreach { cut =>
      graft.operators.Exif.parseKernel(valid.take(cut)) // must not throw
    }
    (1 to 200).foreach { _ =>
      val b = valid.clone()
      b(rnd.nextInt(b.length)) =
        (b(rnd.nextInt(b.length)) ^ (1 << rnd.nextInt(8))).toByte
      graft.operators.Exif.parseKernel(b) // permissive: nulls, not throws
    }
  }
}
