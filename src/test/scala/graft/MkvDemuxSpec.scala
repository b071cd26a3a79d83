package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MkvDemux, Multimodal}

/** Matroska/WebM demux: EBML element walking, cluster/block frame
  * tables, keyframe flags (SimpleBlock bit + BlockGroup/ReferenceBlock
  * rule), and the ImageIoCodec wire-up — on a hand-rolled byte-level
  * fixture so every offset is independently known. */
class MkvDemuxSpec extends AnyFunSuite {

  // ------------------------------------------------- fixture builder

  /** minimal big-endian bytes of an element id (marker bits included) */
  private def idBytes(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (0 until n).map(i => ((id >> (8 * (n - 1 - i))) & 0xFF).toByte).toArray
  }
  private def sizeVint(n: Int): Array[Byte] =
    if (n < 127) Array((0x80 | n).toByte)
    else { require(n < 16383); Array((0x40 | (n >> 8)).toByte, (n & 0xFF).toByte) }

  private def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    idBytes(id) ++ sizeVint(body.length) ++ body
  }
  private def uintEl(id: Long, v: Long, width: Int): Array[Byte] =
    el(id, (0 until width).map(i => ((v >> (8 * (width - 1 - i))) & 0xFF).toByte).toArray)

  private def simpleBlock(track: Int, relTs: Int, flags: Int, fill: Byte, len: Int) =
    el(0xA3L, Array((0x80 | track).toByte,
      ((relTs >> 8) & 0xFF).toByte, (relTs & 0xFF).toByte, flags.toByte) ++
      Array.fill[Byte](len)(fill))

  private lazy val fixture: Array[Byte] = {
    val header = el(0x1A45DFA3L, uintEl(0x4286L, 1, 1)) // EBMLVersion=1
    val info = el(0x1549A966L,
      uintEl(0x2AD7B1L, 1000000L, 3), // TimestampScale = 1 ms
      el(0x4489L, { // Duration = 200.0 (float64)
        val bits = java.lang.Double.doubleToLongBits(200.0)
        (0 until 8).map(i => ((bits >> (8 * (7 - i))) & 0xFF).toByte).toArray
      }))
    val tracks = el(0x1654AE6BL, el(0xAEL,
      uintEl(0xD7L, 1, 1),  // TrackNumber
      uintEl(0x83L, 1, 1),  // TrackType = video
      el(0x86L, "V_VP9".getBytes("US-ASCII")),
      el(0xE0L, uintEl(0xB0L, 640, 2), uintEl(0xBAL, 360, 2))))
    val cluster1 = el(0x1F43B675L,
      uintEl(0xE7L, 0, 1),
      simpleBlock(1, 0, 0x80, 1.toByte, 10),  // keyframe
      simpleBlock(1, 40, 0x00, 2.toByte, 11)) // delta frame
    val blockGroup = el(0xA0L,
      el(0xA1L, Array[Byte](0x81.toByte, 0, 40, 0) ++ Array.fill[Byte](13)(4.toByte)),
      uintEl(0xFBL, 0, 1)) // ReferenceBlock → not a keyframe
    val cluster2 = el(0x1F43B675L,
      uintEl(0xE7L, 100, 1),
      simpleBlock(1, 0, 0x80, 3.toByte, 12),
      blockGroup)
    header ++ el(0x18538067L, info, tracks, cluster1, cluster2)
  }

  test("videoInfo: codec, dimensions, duration, keyframe count") {
    assert(MkvDemux.isMkv(fixture))
    val info = MkvDemux.videoInfo(fixture).get
    assert(info.codec == "V_VP9")
    assert(info.width == 640 && info.height == 360)
    assert(info.timescaleNs == 1000000L)
    assert(info.durationMs == 200L)
    assert(info.frameCount == 4 && info.keyframeCount == 2)
  }

  test("frame table: cluster+relative times, key flags, payload bytes") {
    val frames = MkvDemux.videoFrames(fixture)
    assert(frames.map(_.timeMs) == Seq(0L, 40L, 100L, 140L))
    assert(frames.map(_.key) == Seq(true, false, true, false))
    frames.zipWithIndex.foreach { case (f, i) =>
      val bytes = fixture.slice(f.offset.toInt, f.offset.toInt + f.size)
      assert(bytes.length == 10 + i && bytes.forall(_ == (i + 1).toByte),
        s"frame $i mislocated")
    }
  }

  test("sampleKeyframes picks evenly spaced keyframes; ImageIoCodec wires up") {
    val kf = MkvDemux.sampleKeyframes(fixture, 2)
    assert(kf.map(_._1) == Seq(0L, 100L))
    assert(kf(0)._2.forall(_ == 1.toByte) && kf(1)._2.forall(_ == 3.toByte))
    val viaCodec = Multimodal.ImageIoCodec.sampleFrames(fixture, 2)
    assert(viaCodec.size == 2 && viaCodec(1).forall(_ == 3.toByte))
  }

  test("laced blocks reject loudly") {
    val laced = el(0x1A45DFA3L) ++ el(0x18538067L,
      el(0x1654AE6BL, el(0xAEL, uintEl(0xD7L, 1, 1), uintEl(0x83L, 1, 1))),
      el(0x1F43B675L, uintEl(0xE7L, 0, 1),
        simpleBlock(1, 0, 0x80 | 0x02, 9.toByte, 5))) // Xiph lacing bit
    val e = intercept[IllegalArgumentException](MkvDemux.videoFrames(laced))
    assert(e.getMessage.contains("laced"))
  }
}
