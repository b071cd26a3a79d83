package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AviDemux, Multimodal}

/** AVI (RIFF) demux: chunk walking, stream-header clock, movi frame
  * chunks, idx1 keyframe flags — hand-rolled byte-level fixture. */
class AviDemuxSpec extends AnyFunSuite {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)

  private def chunk(id: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
    cc(id) ++ le32(body.length) ++ padded
  }
  private def list(typ: String, payload: Array[Byte]*): Array[Byte] =
    chunk("LIST", cc(typ) +: payload: _*)

  /** 4 frames at 20 fps (scale 1, rate 20), keyframes 0 and 2 via idx1 */
  private lazy val fixture: Array[Byte] = {
    val avih = chunk("avih", le32(50000), le32(0), le32(0), le32(0),
      le32(4) /* totalFrames */, le32(0), le32(1), le32(0),
      le32(256) /* width */, le32(128) /* height */, new Array[Byte](16))
    val strh = chunk("strh", cc("vids"), cc("mjpg"), le32(0), le32(0), le32(0),
      le32(1) /* scale */, le32(20) /* rate */, le32(0), le32(4), new Array[Byte](20))
    val hdrl = list("hdrl", avih, list("strl", strh))

    val frameChunks = (0 until 4).map(i =>
      chunk("00dc", Array.fill[Byte](10 + i)((i + 1).toByte)))
    val movi = list("movi", frameChunks: _*)

    // idx1 offsets relative to the 'movi' fourcc position; payload = 4
    // (fourcc) + preceding chunks
    val offsets = frameChunks.scanLeft(4)(_ + _.length).init
    val idx1 = chunk("idx1", (0 until 4).flatMap { i =>
      cc("00dc") ++ le32(if (i % 2 == 0) 0x10 else 0) ++
        le32(offsets(i)) ++ le32(10 + i)
    }.toArray)

    val body = cc("AVI ") ++ hdrl ++ movi ++ idx1
    cc("RIFF") ++ le32(body.length) ++ body
  }

  test("videoInfo: codec, clock, dimensions, keyframes") {
    assert(AviDemux.isAvi(fixture))
    val info = AviDemux.videoInfo(fixture).get
    assert(info.codec == "mjpg")
    assert(info.width == 256 && info.height == 128)
    assert(info.frameCount == 4 && info.keyframeCount == 2)
    assert(info.durationMs == 200L) // 4 frames at 20 fps
  }

  test("frame table: movi offsets, frame-clock times, idx1 key flags") {
    val frames = AviDemux.videoFrames(fixture)
    assert(frames.map(_.timeMs) == Seq(0L, 50L, 100L, 150L))
    assert(frames.map(_.key) == Seq(true, false, true, false))
    frames.zipWithIndex.foreach { case (f, i) =>
      val bytes = fixture.slice(f.offset.toInt, f.offset.toInt + f.size)
      assert(bytes.length == 10 + i && bytes.forall(_ == (i + 1).toByte),
        s"frame $i mislocated")
    }
  }

  test("sampleKeyframes + ImageIoCodec wire-up") {
    val kf = AviDemux.sampleKeyframes(fixture, 2)
    assert(kf.map(_._1) == Seq(0L, 100L))
    assert(kf(1)._2.forall(_ == 3.toByte))
    val viaCodec = Multimodal.ImageIoCodec.sampleFrames(fixture, 2)
    assert(viaCodec.size == 2 && viaCodec(0).forall(_ == 1.toByte))
  }
}
