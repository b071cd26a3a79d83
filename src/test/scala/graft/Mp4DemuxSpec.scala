package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Mp4Demux, Multimodal}

/** MP4 (ISO BMFF) demux: box walking, `stbl` sample-table resolution,
  * keyframe sampling, and the ImageIoCodec wire-up. The fixture is a
  * byte-level hand-rolled container (box framing per ISO/IEC 14496-12),
  * so every offset the demuxer computes is independently known. */
class Mp4DemuxSpec extends AnyFunSuite {

  // ------------------------------------------------- fixture builder

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8 + body.length) ++ typ.getBytes(StandardCharsets.US_ASCII) ++ body
  }

  /** 10 samples, sizes 10+i, chunks of (4,3,3), timescale 1000,
    * delta 100 (10 fps), sync samples 1/4/8 (1-based) */
  private lazy val fixture: Array[Byte] = {
    val sizes = (0 until 10).map(10 + _)
    val sampleBytes = (0 until 10).map(i => Array.fill[Byte](sizes(i))(i.toByte))

    val ftyp = box("ftyp",
      "isom".getBytes(StandardCharsets.US_ASCII), be32(0),
      "isom".getBytes(StandardCharsets.US_ASCII))
    val mdat = box("mdat", sampleBytes.flatten.toArray)
    val mdatPayloadAt = ftyp.length + 8L

    // chunk layout 4/3/3 → chunk byte offsets inside the file
    val chunkStarts = Seq(0, sizes.take(4).sum, sizes.take(7).sum)
      .map(mdatPayloadAt + _)

    val stsdEntry = { // VisualSampleEntry: 24 bytes reserved/pre_defined,
      val body = new ByteArrayOutputStream() //  then width(2) height(2), padding
      body.write(new Array[Byte](24))
      body.write(be16(64)); body.write(be16(48))
      body.write(new Array[Byte](42))
      box("avc1", body.toByteArray)
    }
    val stbl = box("stbl",
      box("stsd", be32(0), be32(1), stsdEntry),
      box("stts", be32(0), be32(1), be32(10), be32(100)),
      box("stss", be32(0), be32(3), be32(1), be32(4), be32(8)),
      box("stsz", be32(0), be32(0), be32(10),
        sizes.flatMap(be32).toArray),
      box("stsc", be32(0), be32(2),
        be32(1), be32(4), be32(1), // chunks 1..1: 4 samples
        be32(2), be32(3), be32(1)), // chunks 2..: 3 samples
      box("stco", be32(0), be32(3), chunkStarts.flatMap(o => be32(o.toInt)).toArray))
    val mdia = box("mdia",
      box("mdhd", be32(0), be32(0), be32(0), be32(1000), be32(1000)),
      box("hdlr", be32(0), be32(0),
        "vide".getBytes(StandardCharsets.US_ASCII), new Array[Byte](12)),
      box("minf", stbl))
    val moov = box("moov", box("trak", mdia))
    ftyp ++ mdat ++ moov
  }

  test("videoInfo: codec, dimensions, duration, sync count") {
    assert(Mp4Demux.isMp4(fixture))
    val info = Mp4Demux.videoInfo(fixture).get
    assert(info.codec == "avc1")
    assert(info.width == 64 && info.height == 48)
    assert(info.timescaleHz == 1000L)
    assert(info.durationMs == 1000L) // 10 samples × 100/1000 s
    assert(info.sampleCount == 10 && info.syncSampleCount == 3)
  }

  test("sample table: offsets across stsc chunk runs, times, sync flags") {
    val samples = Mp4Demux.videoSamples(fixture)
    assert(samples.size == 10)
    assert(samples.map(_.timeMs) == (0 until 10).map(_ * 100L))
    assert(samples.filter(_.sync).map(_.index) == Seq(0, 3, 7))
    // every sample's bytes must be its distinctive fill pattern
    samples.foreach { s =>
      val bytes = fixture.slice(s.offset.toInt, s.offset.toInt + s.size)
      assert(bytes.length == 10 + s.index)
      assert(bytes.forall(_ == s.index.toByte), s"sample ${s.index} mislocated")
    }
  }

  test("sampleKeyframes: evenly spaced sync samples with timestamps") {
    val two = Mp4Demux.sampleKeyframes(fixture, 2)
    assert(two.size == 2)
    assert(two.map(_._1) == Seq(0L, 300L)) // sync pool (0,3,7) → picks 0 and 3
    assert(two(0)._2.forall(_ == 0.toByte) && two(1)._2.forall(_ == 3.toByte))
    // more than available sync samples → all three, in decode order
    val all = Mp4Demux.sampleKeyframes(fixture, 99)
    assert(all.map(_._1) == Seq(0L, 300L, 700L))
  }

  test("ImageIoCodec frame-samples MP4 via demux; junk still rejects") {
    val frames = Multimodal.ImageIoCodec.sampleFrames(fixture, 3)
    assert(frames.size == 3)
    assert(frames(2).forall(_ == 7.toByte)) // third sync sample's payload
    val junk = Array.fill[Byte](64)(0x5A)
    val e = intercept[UnsupportedOperationException] {
      Multimodal.ImageIoCodec.sampleFrames(junk, 2)
    }
    assert(e.getMessage.contains("demuxable"))
  }

  test("stz2 compact sample sizes decode (16-bit field)") {
    val sizes = Seq(10, 11, 12)
    val sampleBytes = sizes.zipWithIndex.map { case (n, i) => Array.fill[Byte](n)(i.toByte) }
    val ftyp = box("ftyp", "isom".getBytes(StandardCharsets.US_ASCII), be32(0))
    val mdat = box("mdat", sampleBytes.flatten.toArray)
    val chunkStart = ftyp.length + 8
    val stbl = box("stbl",
      box("stsd", be32(0), be32(0)),
      box("stts", be32(0), be32(1), be32(3), be32(50)),
      box("stz2", be32(0), be32(16) /* reserved(3)+field_size=16 */, be32(3),
        sizes.flatMap(be16).toArray),
      box("stsc", be32(0), be32(1), be32(1), be32(3), be32(1)),
      box("stco", be32(0), be32(1), be32(chunkStart)))
    val fixture = ftyp ++ mdat ++ box("moov", box("trak", box("mdia",
      box("mdhd", be32(0), be32(0), be32(0), be32(1000), be32(150)),
      box("hdlr", be32(0), be32(0),
        "vide".getBytes(StandardCharsets.US_ASCII), new Array[Byte](12)),
      box("minf", stbl))))
    val samples = Mp4Demux.videoSamples(fixture)
    assert(samples.map(_.size) == sizes)
    samples.zipWithIndex.foreach { case (s, i) =>
      val bytes = fixture.slice(s.offset.toInt, s.offset.toInt + s.size)
      assert(bytes.forall(_ == i.toByte), s"stz2 sample $i mislocated")
    }
  }

  // -------------------------------------------- fragmented (CMAF/DASH)

  /** moov with EMPTY stbl + mvex/trex, then [moof][mdat] fragments:
    * 2 fragments × 3 samples, per-sample sizes/flags in trun, duration
    * from tfhd default, base decode times from tfdt (with a deliberate
    * gap so tfdt is provably honored over duration accumulation) */
  private lazy val fragmented: Array[Byte] = {
    val ftyp = box("ftyp",
      "cmfc".getBytes(StandardCharsets.US_ASCII), be32(0),
      "iso6".getBytes(StandardCharsets.US_ASCII))
    val stsdEntry = {
      val body = new ByteArrayOutputStream()
      body.write(new Array[Byte](24))
      body.write(be16(320)); body.write(be16(180))
      body.write(new Array[Byte](42))
      box("avc1", body.toByteArray)
    }
    val stbl = box("stbl",
      box("stsd", be32(0), be32(1), stsdEntry),
      box("stts", be32(0), be32(0)),
      box("stsc", be32(0), be32(0)),
      box("stsz", be32(0), be32(0), be32(0)),
      box("stco", be32(0), be32(0)))
    val trak = box("trak",
      box("tkhd", be32(0), be32(0), be32(0), be32(7) /* track_ID */,
        new Array[Byte](4), be32(0), new Array[Byte](60)),
      box("mdia",
        box("mdhd", be32(0), be32(0), be32(0), be32(1000), be32(0)),
        box("hdlr", be32(0), be32(0),
          "vide".getBytes(StandardCharsets.US_ASCII), new Array[Byte](12)),
        box("minf", stbl)))
    val mvex = box("mvex",
      box("trex", be32(0), be32(7), be32(1), be32(0), be32(0), be32(0)))
    val moov = box("moov", trak, mvex)

    def fragment(seq: Int, baseTimeMs: Long, fills: Seq[(Int, Byte, Boolean)]): Array[Byte] = {
      def buildMoof(dataOffset: Int): Array[Byte] = {
        val mfhd = box("mfhd", be32(0), be32(seq))
        // tfhd flags: 0x020008 = default-base-is-moof | default-sample-duration
        val tfhd = box("tfhd", be32(0x020008), be32(7), be32(40))
        val tfdt = box("tfdt", be32(0), be32(baseTimeMs.toInt))
        // trun flags: 0x000601 = data-offset | sample-size | sample-flags
        val trun = box("trun", be32(0x000601), be32(fills.size), be32(dataOffset),
          fills.flatMap { case (len, _, sync) =>
            be32(len) ++ be32(if (sync) 0 else 0x10000)
          }.toArray)
        box("moof", mfhd, box("traf", tfhd, tfdt, trun))
      }
      val moofLen = buildMoof(0).length
      val mdat = box("mdat", fills.flatMap { case (len, b, _) =>
        Array.fill[Byte](len)(b).toSeq
      }.toArray)
      buildMoof(moofLen + 8) ++ mdat // offset → first mdat payload byte
    }
    ftyp ++ moov ++
      fragment(1, 0L, Seq((11, 1.toByte, true), (12, 2.toByte, false), (13, 3.toByte, false))) ++
      fragment(2, 1000L, Seq((14, 4.toByte, true), (15, 5.toByte, false), (16, 6.toByte, false)))
  }

  test("fragmented mp4: trun/tfhd/tfdt sample tables resolve across fragments") {
    assert(Mp4Demux.isMp4(fragmented))
    val info = Mp4Demux.videoInfo(fragmented).get
    assert(info.codec == "avc1" && info.width == 320 && info.height == 180)
    assert(info.sampleCount == 6 && info.syncSampleCount == 2)
    assert(info.durationMs == 1120L) // tfdt 1000 + 3×40
    val samples = Mp4Demux.videoSamples(fragmented)
    assert(samples.map(_.timeMs) == Seq(0L, 40L, 80L, 1000L, 1040L, 1080L))
    assert(samples.filter(_.sync).map(_.index) == Seq(0, 3))
    samples.zipWithIndex.foreach { case (s, i) =>
      val bytes = fragmented.slice(s.offset.toInt, s.offset.toInt + s.size)
      assert(bytes.length == 11 + i && bytes.forall(_ == (i + 1).toByte),
        s"fragmented sample $i mislocated")
    }
    val kf = Mp4Demux.sampleKeyframes(fragmented, 2)
    assert(kf.map(_._1) == Seq(0L, 1000L))
    assert(kf(1)._2.forall(_ == 4.toByte))
  }

  test("videoFingerprints: real MP4 demux feeds frame fingerprints; copies pair (r10)") {
    val spark = GraftSession.build("local[4]", 4)
    import spark.implicits._
    // a re-muxed copy (identical samples) and a distinct stream (the
    // same layout with different frame payload bytes)
    val variant: Array[Byte] = {
      val sizes = (0 until 10).map(10 + _)
      val swap = fixture.clone()
      // rewrite the mdat payload in place: fill sample i with i+100
      var off = fixture.indexOfSlice("mdat".getBytes(StandardCharsets.US_ASCII)) + 4
      (0 until 10).foreach { i =>
        java.util.Arrays.fill(swap, off, off + sizes(i), (i + 100).toByte)
        off += sizes(i)
      }
      swap
    }
    val media = Seq((1L, fixture), (2L, fixture.clone()), (3L, variant))
      .toDF("media_id", "payload")
    val fps = Multimodal.videoFingerprints(media, "payload", "media_id", n = 3)
    // 3 sync samples per stream, deterministic fingerprints
    assert(fps.count() == 9)
    val pairs = graft.operators.Dedup.sharedFingerprintPairs(
        fps, "media_id", "frame_fp", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 3L)),
      s"the copy shares all 3 keyframes; the variant shares none: $pairs")
  }
}
