package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Exif

class ExifSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  private def u8(s: String): UTF8String = UTF8String.fromString(s)

  private def parse(bytes: Array[Byte]): (String, String, String, Any, Any, Any) = {
    val r = Exif.parseKernel(bytes)
    def str(i: Int) = if (r.isNullAt(i)) null else r.getUTF8String(i).toString
    (str(0), str(1), str(2),
      if (r.isNullAt(3)) null else r.getInt(3),
      if (r.isNullAt(4)) null else r.getDouble(4),
      if (r.isNullAt(5)) null else r.getDouble(5))
  }

  test("exif: build → parse roundtrip, randomized fields (100 trials)") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 100).foreach { trial =>
      val mk = "Cam-" + rnd.nextInt(1000)
      val md = "Mod-" + ('A' + rnd.nextInt(26)).toChar
      val dt = f"2026:${1 + rnd.nextInt(12)}%02d:${1 + rnd.nextInt(28)}%02d " +
        f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"
      val ori = 1 + rnd.nextInt(8)
      val (laD, laM, laS) = (rnd.nextInt(90), rnd.nextInt(60), rnd.nextInt(6000))
      val (loD, loM, loS) = (rnd.nextInt(180), rnd.nextInt(60), rnd.nextInt(6000))
      val laR = if (rnd.nextBoolean()) "N" else "S"
      val loR = if (rnd.nextBoolean()) "E" else "W"
      val jpeg = Exif.buildKernel(u8(mk), u8(md), u8(dt), ori,
        u8(laR), laD, laM, laS, u8(loR), loD, loM, loS)
      val (m, o, d, r, lat, lon) = parse(jpeg)
      assert(m == mk && o == md && d == dt && r == ori, s"trial $trial")
      val wantLat = (laD + laM / 60.0 + laS / 100.0 / 3600.0) *
        (if (laR == "S") -1 else 1)
      val wantLon = (loD + loM / 60.0 + loS / 100.0 / 3600.0) *
        (if (loR == "W") -1 else 1)
      assert(math.abs(lat.asInstanceOf[Double] - wantLat) < 1e-12, s"lat $trial")
      assert(math.abs(lon.asInstanceOf[Double] - wantLon) < 1e-12, s"lon $trial")
    }
  }

  test("exif: hand-assembled BIG-ENDIAN blob parses — the parser follows TIFF, not the builder") {
    // an MM-order TIFF assembled here with independent big-endian
    // writes: IFD0 = Make (offset ASCII), Orientation (inline SHORT,
    // left-justified), DateTime (offset ASCII)
    val out = new java.io.ByteArrayOutputStream()
    def u16be(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def u32be(v: Int): Unit = { u16be((v >> 16) & 0xffff); u16be(v & 0xffff) }
    val mk = "BigCam"
    val dt = "1999:12:31 23:59:59"
    val ifd0End = 8 + 2 + 3 * 12 + 4
    out.write('M'); out.write('M'); u16be(42); u32be(8)
    u16be(3)
    u16be(0x010f); u16be(2); u32be(mk.length + 1); u32be(ifd0End)
    u16be(0x0112); u16be(3); u32be(1); u16be(6); u16be(0)
    u16be(0x0132); u16be(2); u32be(20); u32be(ifd0End + mk.length + 1)
    u32be(0)
    out.write(mk.getBytes("ISO-8859-1")); out.write(0)
    out.write(dt.getBytes("ISO-8859-1")); out.write(0)
    val tiff = out.toByteArray
    val jpeg = new java.io.ByteArrayOutputStream()
    jpeg.write(0xff); jpeg.write(0xd8)
    // a preceding APP0 (JFIF-style) segment the walker must skip
    jpeg.write(0xff); jpeg.write(0xe0); jpeg.write(0); jpeg.write(4)
    jpeg.write('J'); jpeg.write('F')
    jpeg.write(0xff); jpeg.write(0xe1)
    val segLen = 2 + 6 + tiff.length
    jpeg.write((segLen >> 8) & 0xff); jpeg.write(segLen & 0xff)
    jpeg.write("Exif".getBytes("ISO-8859-1")); jpeg.write(0); jpeg.write(0)
    jpeg.write(tiff)
    jpeg.write(0xff); jpeg.write(0xd9)
    val (m, o, d, r, lat, lon) = parse(jpeg.toByteArray)
    assert(m == "BigCam" && o == null && d == "1999:12:31 23:59:59")
    assert(r == 6 && lat == null && lon == null)
  }

  test("exif: Exif sub-IFD DateTimeOriginal wins over IFD0 DateTime") {
    // little-endian, IFD0 = [DateTime, ExifIFD→{DateTimeOriginal}]
    val out = new java.io.ByteArrayOutputStream()
    def u16le(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32le(v: Int): Unit = { u16le(v & 0xffff); u16le((v >> 16) & 0xffff) }
    val ifd0End = 8 + 2 + 2 * 12 + 4
    val dt0Off = ifd0End
    val exifIfdOff = dt0Off + 20
    val dtoOff = exifIfdOff + 2 + 12 + 4
    out.write('I'); out.write('I'); u16le(42); u32le(8)
    u16le(2)
    u16le(0x0132); u16le(2); u32le(20); u32le(dt0Off)
    u16le(0x8769); u16le(4); u32le(1); u32le(exifIfdOff)
    u32le(0)
    out.write("2000:01:01 00:00:00".getBytes("ISO-8859-1")); out.write(0)
    u16le(1)
    u16le(0x9003); u16le(2); u32le(20); u32le(dtoOff)
    u32le(0)
    out.write("1990:06:15 08:30:00".getBytes("ISO-8859-1")); out.write(0)
    val tiff = out.toByteArray
    val jpeg = new java.io.ByteArrayOutputStream()
    jpeg.write(0xff); jpeg.write(0xd8)
    jpeg.write(0xff); jpeg.write(0xe1)
    val segLen = 2 + 6 + tiff.length
    jpeg.write((segLen >> 8) & 0xff); jpeg.write(segLen & 0xff)
    jpeg.write("Exif".getBytes("ISO-8859-1")); jpeg.write(0); jpeg.write(0)
    jpeg.write(tiff); jpeg.write(0xff); jpeg.write(0xd9)
    val (_, _, d, _, _, _) = parse(jpeg.toByteArray)
    assert(d == "1990:06:15 08:30:00")
  }

  test("exif: untrusted input is PERMISSIVE — nulls, never a failure") {
    assert(parse(Array[Byte]()) == (null, null, null, null, null, null))
    assert(parse("not a jpeg".getBytes) == (null, null, null, null, null, null))
    // JPEG with no APP1
    assert(parse(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) ==
      (null, null, null, null, null, null))
    // truncated mid-segment
    val ok = Exif.buildKernel(u8("Cam-1"), u8("Mod-1"),
      u8("2026:01:01 00:00:00"), 1, u8("N"), 1, 2, 300, u8("E"), 3, 4, 500)
    (1 until ok.length by 7).foreach { cut =>
      parse(ok.take(cut)) // must not throw
    }
    // bad byte order / magic inside an otherwise-valid APP1
    val broken = ok.clone()
    broken(12) = 'X'.toByte // clobber the TIFF 'II'
    assert(parse(broken) == (null, null, null, null, null, null))
  }

  test("exif: SQL registration resolves — exif_metadata addressable from the DSL") {
    val s = spark
    GraftSession.configure(s)
    val r = s.sql("SELECT exif_metadata(X'00FF').make AS m").head()
    assert(r.isNullAt(0)) // permissive on garbage, resolved by name
    // a non-binary argument is a plan-time ANALYSIS error, not an
    // executor-side cast failure
    val e = intercept[Exception] {
      s.sql("SELECT exif_metadata('not bytes')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary"), e.getMessage)
  }

  test("exif: T.81 fill bytes before a marker do not derail the APP1 walk") {
    val ok = Exif.buildKernel(u8("Cam-f"), u8("Mod-f"),
      u8("2026:02:02 00:00:00"), 6, u8("N"), 10, 20, 300, u8("E"), 30, 40, 500)
    // inject a run of 0xFF fill bytes between SOI and the APP1 marker:
    // FF D8 | FF FF FF | FF E1 ...
    val padded = (ok.take(2) ++ Array.fill(3)(0xff.toByte) ++ ok.drop(2))
    val got = parse(padded)
    assert(got._1 == "Cam-f" && got._4 == 6,
      s"padded JPEG must still surface EXIF, got $got")
  }

  test("exif: builder refuses an APP1 segment past the 16-bit length field") {
    val e = intercept[IllegalArgumentException] {
      Exif.buildKernel(u8("M" * 70000), u8("Mod4"),
        u8("2026:01:01 00:00:00"), 1, u8("N"), 1, 2, 300, u8("E"), 3, 4, 500)
    }
    assert(e.getMessage.contains("16-bit"), e.getMessage)
  }

  test("exif: dHash normalizes orientation — camera-rotated copies near-dup their upright twin") {
    import graft.operators.Multimodal.ImageIoCodec
    // an asymmetric test pattern: diagonal gradient + two blobs
    def pattern(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val base = (x * 3 + y * 5) % 200
        val blob = if ((x - w / 4).abs < 5 && (y - h / 3).abs < 5) 255
          else if ((x - 3 * w / 4).abs < 7 && (y - 2 * h / 3).abs < 3) 0
          else base
        img.setRGB(x, y, (blob << 16) | (blob << 8) | blob)
      }
      img
    }
    def jpegOf(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def rot(img: java.awt.image.BufferedImage,
        f: (Int, Int, Int, Int) => (Int, Int),
        swap: Boolean): java.awt.image.BufferedImage = {
      val (w, h) = (img.getWidth, img.getHeight)
      val (nw, nh) = if (swap) (h, w) else (w, h)
      val out = new java.awt.image.BufferedImage(nw, nh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val (nx, ny) = f(x, y, w, h)
        out.setRGB(nx, ny, img.getRGB(x, y))
      }
      out
    }
    def tag(jpeg: Array[Byte], ori: Int): Array[Byte] = {
      val built = Exif.buildKernel(u8("Cam-x"), u8("Mod-x"),
        u8("2026:01:01 00:00:00"), ori, u8("N"), 0, 0, 0, u8("E"), 0, 0, 0)
      val app1 = built.slice(2, built.length - 2)
      jpeg.take(2) ++ app1 ++ jpeg.drop(2)
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val upright = pattern(64, 48)
    val h0 = ImageIoCodec.imageHash(jpegOf(upright))
    // stored = rot90ccw(upright), tagged orientation 6 → hashes upright
    val ccw = rot(upright, (x, y, w, _) => (y, w - 1 - x), swap = true)
    val stored6 = jpegOf(ccw)
    assert(ham(ImageIoCodec.imageHash(tag(stored6, 6)), h0) <= 4,
      "orientation-6 copy must hash with its upright twin")
    // the SAME bytes untagged hash far away (the flag does the work)
    assert(ham(ImageIoCodec.imageHash(stored6), h0) > 12,
      "untagged rotated copy should be far (else the pattern is too symmetric)")
    // stored = rot180(upright), tagged orientation 3
    val r180 = rot(upright, (x, y, w, h) => (w - 1 - x, h - 1 - y), swap = false)
    assert(ham(ImageIoCodec.imageHash(tag(jpegOf(r180), 3)), h0) <= 4,
      "orientation-3 copy must hash with its upright twin")
    // mirrored, tagged orientation 2
    val mir = rot(upright, (x, y, w, _) => (w - 1 - x, y), swap = false)
    assert(ham(ImageIoCodec.imageHash(tag(jpegOf(mir), 2)), h0) <= 4,
      "orientation-2 copy must hash with its upright twin")
    // orientation 1 tag is a no-op
    assert(ImageIoCodec.imageHash(tag(jpegOf(upright), 1)) == h0)
  }

  test("exif: codegen == interpreted through a DataFrame column") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 1), (1L, 5)).toDF("id", "ori")
      .select(col("id"), Exif.exif_jpeg(
        concat(lit("Cam-"), col("id")), concat(lit("Mod-"), col("id")),
        lit("2026:08:15 12:00:00"), col("ori").cast("int"),
        lit("N"), lit(10).cast("int"), lit(30).cast("int"), lit(0).cast("int"),
        lit("W"), lit(20).cast("int"), lit(0).cast("int"), lit(3600).cast("int"))
        .as("payload"))
      .select(col("id"), Exif.exif_metadata(col("payload")).as("x"))
      .select(col("id"), col("x.make"), col("x.orientation"),
        col("x.gps_lat"), col("x.gps_lon"))
      .orderBy("id").collect()
    assert(df(0).getAs[String]("make") == "Cam-0")
    assert(df(1).getAs[Int]("orientation") == 5)
    assert(math.abs(df(0).getAs[Double]("gps_lat") - 10.5) < 1e-12)
    assert(math.abs(df(0).getAs[Double]("gps_lon") - -20.01) < 1e-12)
  }
}
