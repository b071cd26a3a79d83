package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM AVI (RIFF) DEMUXER for the multimodal frame-sampling pass —
  * the third container family beside [[Mp4Demux]] and [[MkvDemux]].
  *
  * Parsed per the public RIFF/AVI layout (little-endian chunks,
  * even-byte padding): `hdrl` headers (`avih` main header for
  * width/height, `strl/strh` stream headers for the `vids` stream's
  * scale/rate clock), the `movi` LIST whose `##dc`/`##db` chunks carry
  * one encoded video frame each, and the `idx1` legacy index whose
  * AVIIF_KEYFRAME (0x10) flag marks sync frames. `idx1` offsets are
  * movi-relative or absolute — both occur in the wild; disambiguated by
  * probing the first entry. Without `idx1`, every frame is treated as a
  * keyframe (the uncompressed-stream convention).
  *
  * Sampled frames are the ENCODED chunk payloads + frame-clock
  * timestamps — demux on the cluster, decode downstream.
  */
object AviDemux {

  final case class VideoInfo(codec: String, scale: Long, rate: Long,
      durationMs: Long, width: Int, height: Int, frameCount: Int, keyframeCount: Int)

  final case class Frame(index: Int, offset: Long, size: Int, timeMs: Long, key: Boolean)

  def isAvi(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      new String(payload, 0, 4, StandardCharsets.US_ASCII) == "RIFF" &&
      new String(payload, 8, 4, StandardCharsets.US_ASCII) == "AVI "

  // ------------------------------------------------------ RIFF chunks

  /** (ckid, listType-or-null, payloadStart, payloadEnd) */
  private final case class Chunk(id: String, listType: String, payloadStart: Long, payloadEnd: Long)

  private def children(buf: ByteBuffer, start: Long, end: Long): Seq[Chunk] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var pos = start
    while (pos + 8 <= end) {
      val id = fourcc(buf, pos)
      val size = buf.getInt((pos + 4).toInt) & 0xFFFFFFFFL
      val payloadStart = pos + 8
      val payloadEnd = payloadStart + size
      require(payloadEnd <= end, s"avi: chunk '$id' overruns its container")
      val listType = if (id == "LIST" || id == "RIFF") fourcc(buf, payloadStart) else null
      out += Chunk(id, listType, payloadStart, payloadEnd)
      pos = payloadEnd + (size & 1L) // even-byte padding
    }
    out.toSeq
  }

  private def fourcc(buf: ByteBuffer, at: Long): String = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = buf.get((at + i).toInt); i += 1 }
    new String(b, StandardCharsets.US_ASCII)
  }

  // ------------------------------------------------------------ parse

  def videoInfo(payload: Array[Byte]): Option[VideoInfo] = parse(payload).map(_._1)

  def videoFrames(payload: Array[Byte]): IndexedSeq[Frame] =
    parse(payload).map(_._2).getOrElse(IndexedSeq.empty)

  /** `n` evenly spaced keyframes: (time ms, encoded frame bytes) */
  def sampleKeyframes(payload: Array[Byte], n: Int): Seq[(Long, Array[Byte])] = {
    require(n > 0, "sampleKeyframes: n must be positive")
    val all = videoFrames(payload)
    require(all.nonEmpty, "avi: no video stream (or no frames)")
    val keys = all.filter(_.key)
    val pool = if (keys.nonEmpty) keys else all
    val wanted = if (n >= pool.size) pool
      else (0 until n).map(i => pool((i.toLong * pool.size / n).toInt))
    wanted.map { f =>
      (f.timeMs, java.util.Arrays.copyOfRange(payload, f.offset.toInt,
        (f.offset + f.size).toInt))
    }
  }

  private def parse(payload: Array[Byte]): Option[(VideoInfo, IndexedSeq[Frame])] = {
    require(isAvi(payload), "avi: no RIFF/AVI header")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    // RIFF payload starts after 'AVI ' fourcc
    val top = children(buf, 12L, payload.length.toLong)

    val hdrl = top.find(c => c.id == "LIST" && c.listType == "hdrl").getOrElse(
      throw new IllegalArgumentException("avi: no hdrl LIST"))
    val hdrlKids = children(buf, hdrl.payloadStart + 4, hdrl.payloadEnd)
    val avih = hdrlKids.find(_.id == "avih").getOrElse(
      throw new IllegalArgumentException("avi: no avih header"))
    val width = buf.getInt((avih.payloadStart + 32).toInt)
    val height = buf.getInt((avih.payloadStart + 36).toInt)

    // first 'vids' stream: its index among streams = the ## chunk prefix
    var vidsStream = -1
    var codec = "????"
    var scale = 1L
    var rate = 25L
    hdrlKids.filter(c => c.id == "LIST" && c.listType == "strl").zipWithIndex.foreach {
      case (strl, i) =>
        children(buf, strl.payloadStart + 4, strl.payloadEnd).find(_.id == "strh").foreach { strh =>
          if (vidsStream < 0 && fourcc(buf, strh.payloadStart) == "vids") {
            vidsStream = i
            codec = fourcc(buf, strh.payloadStart + 4)
            scale = math.max(buf.getInt((strh.payloadStart + 20).toInt).toLong, 1L)
            rate = math.max(buf.getInt((strh.payloadStart + 24).toInt).toLong, 1L)
          }
        }
    }
    if (vidsStream < 0) return None
    val vidPrefix = f"$vidsStream%02d"

    val movi = top.find(c => c.id == "LIST" && c.listType == "movi").getOrElse(
      throw new IllegalArgumentException("avi: no movi LIST"))
    val moviFourccAt = movi.payloadStart // position of the 'movi' fourcc

    // video chunks in stream order ('##dc' compressed / '##db' raw)
    val chunks = children(buf, movi.payloadStart + 4, movi.payloadEnd).filter { c =>
      c.id.startsWith(vidPrefix) && (c.id.endsWith("dc") || c.id.endsWith("db"))
    }

    // idx1 keyframe flags: entries (ckid, flags, offset, size); offsets
    // are movi-relative (to the 'movi' fourcc) or absolute — probe entry 0
    val keyAt = scala.collection.mutable.Set.empty[Long]
    var hasIdx = false
    top.find(_.id == "idx1").foreach { idx =>
      hasIdx = true
      val nEntries = ((idx.payloadEnd - idx.payloadStart) / 16).toInt
      if (nEntries > 0) {
        val firstOff = buf.getInt((idx.payloadStart + 8).toInt) & 0xFFFFFFFFL
        // the movi-relative probe must itself stay in bounds: an
        // absolute-offset AVI whose headers are a large fraction of the
        // file can push moviFourccAt + firstOff past the buffer — treat
        // out-of-range as absolute rather than throwing
        val relative =
          firstOff + 8 <= payload.length &&
            moviFourccAt + firstOff + 4 <= payload.length &&
            fourcc(buf, moviFourccAt + firstOff) == fourcc(buf, idx.payloadStart)
        var i = 0
        while (i < nEntries) {
          val e = idx.payloadStart + 16L * i
          val ckid = fourcc(buf, e)
          val flags = buf.getInt((e + 4).toInt)
          val off = buf.getInt((e + 8).toInt) & 0xFFFFFFFFL
          if (ckid.startsWith(vidPrefix) && (flags & 0x10) != 0)
            keyAt += (if (relative) moviFourccAt + off else off) + 8 // chunk payload start
          i += 1
        }
      }
    }

    val frames = chunks.zipWithIndex.map { case (c, i) =>
      Frame(i, c.payloadStart, (c.payloadEnd - c.payloadStart).toInt,
        i.toLong * scale * 1000L / rate,
        if (hasIdx) keyAt.contains(c.payloadStart) else true)
    }.toIndexedSeq
    if (frames.isEmpty) return None

    val durationMs = frames.size.toLong * scale * 1000L / rate
    Some((VideoInfo(codec, scale, rate, durationMs, width, height,
      frames.size, frames.count(_.key)), frames))
  }
}
