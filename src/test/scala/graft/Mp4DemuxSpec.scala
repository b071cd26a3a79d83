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
    assert(e.getMessage.contains("webm"))
  }

  test("fragmented (moof) containers reject loudly") {
    val frag = box("ftyp", "isom".getBytes(StandardCharsets.US_ASCII), be32(0)) ++
      box("moof", Array.empty[Byte]) ++ box("moov", Array.empty[Byte])
    val e = intercept[IllegalArgumentException] {
      Mp4Demux.videoSamples(frag)
    }
    assert(e.getMessage.contains("moof"))
  }
}
