package graft.operators

import java.nio.charset.StandardCharsets

/** Pure-JVM Matroska/WebM DEMUXER for the multimodal frame-sampling
  * pass — the EBML sibling of [[Mp4Demux]]: no JDK codec exists for
  * VP8/VP9/AV1, but keyframe SAMPLING only needs the container tables.
  *
  * Parsed per the public Matroska/EBML specs (RFC 8794 + the Matroska
  * element registry): EBML variable-length element ids/sizes, the
  * `Segment` tree, `Info/TimestampScale`, `Tracks/TrackEntry`
  * (TrackType 1 = video, CodecID, PixelWidth/Height), and `Cluster`
  * bodies — `Timestamp` plus `SimpleBlock` frames (track vint, signed
  * 16-bit relative timestamp, flags byte whose 0x80 bit marks a
  * keyframe) and `BlockGroup/Block` (a Block inside a group is a
  * keyframe iff no `ReferenceBlock` sibling).
  *
  * Sampled frames are the ENCODED VP8/VP9/AV1 frame payloads +
  * timestamps (lacing unsupported → rejected loudly, not guessed), the
  * same demux-on-cluster / decode-downstream shape as MP4.
  */
object MkvDemux {

  final case class VideoInfo(codec: String, timescaleNs: Long, durationMs: Long,
      width: Int, height: Int, frameCount: Int, keyframeCount: Int)

  /** one encoded frame: byte range in the payload + time + keyframe */
  final case class Frame(index: Int, offset: Long, size: Int, timeMs: Long, key: Boolean)

  /** EBML header magic 0x1A45DFA3 */
  def isMkv(payload: Array[Byte]): Boolean =
    payload.length >= 4 &&
      (payload(0) & 0xFF) == 0x1A && (payload(1) & 0xFF) == 0x45 &&
      (payload(2) & 0xFF) == 0xDF && (payload(3) & 0xFF) == 0xA3

  // ------------------------------------------------------------- EBML

  /** (value, bytesRead) of a vint at `at`; `keepMarker` keeps the
    * length-marker bit (element IDs) or strips it (sizes) */
  private def vint(b: Array[Byte], at: Long, keepMarker: Boolean): (Long, Int) = {
    val first = b(at.toInt) & 0xFF
    require(first != 0, s"mkv: invalid vint at $at")
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
    var v: Long = if (keepMarker) first.toLong else (first & (0xFF >> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(at.toInt + i) & 0xFFL); i += 1 }
    (v, len)
  }

  private final case class El(id: Long, payloadStart: Long, payloadEnd: Long)

  /** children of [start, end) — unknown-size elements (all size bits
    * set) extend to the enclosing end, the streaming-Cluster shape */
  private def children(b: Array[Byte], start: Long, end: Long): Seq[El] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[El]
    var pos = start
    while (pos < end) {
      val (id, idLen) = vint(b, pos, keepMarker = true)
      val (size0, szLen) = vint(b, pos + idLen, keepMarker = false)
      val payloadStart = pos + idLen + szLen
      val unknown = size0 == (1L << (7 * szLen)) - 1 // all value bits set
      val payloadEnd = if (unknown) end else payloadStart + size0
      require(payloadEnd <= end, s"mkv: element 0x${id.toHexString} overruns container")
      out += El(id, payloadStart, payloadEnd)
      pos = payloadEnd
    }
    out.toSeq
  }

  private def uint(b: Array[Byte], e: El): Long = {
    var v = 0L
    var i = e.payloadStart
    while (i < e.payloadEnd) { v = (v << 8) | (b(i.toInt) & 0xFFL); i += 1 }
    v
  }

  private def str(b: Array[Byte], e: El): String =
    new String(b, e.payloadStart.toInt, (e.payloadEnd - e.payloadStart).toInt,
      StandardCharsets.US_ASCII).takeWhile(_ != 0)

  private def double(b: Array[Byte], e: El): Double =
    (e.payloadEnd - e.payloadStart) match {
      case 4 => java.lang.Float.intBitsToFloat(uint(b, e).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(b, e))
      case 0 => 0.0
      case n => throw new IllegalArgumentException(s"mkv: float of $n bytes")
    }

  // element IDs (Matroska registry)
  private val SEGMENT = 0x18538067L
  private val INFO = 0x1549A966L
  private val TIMESTAMP_SCALE = 0x2AD7B1L
  private val DURATION = 0x4489L
  private val TRACKS = 0x1654AE6BL
  private val TRACK_ENTRY = 0xAEL
  private val TRACK_NUMBER = 0xD7L
  private val TRACK_TYPE = 0x83L
  private val CODEC_ID = 0x86L
  private val VIDEO = 0xE0L
  private val PIXEL_WIDTH = 0xB0L
  private val PIXEL_HEIGHT = 0xBAL
  private val CLUSTER = 0x1F43B675L
  private val CLUSTER_TS = 0xE7L
  private val SIMPLE_BLOCK = 0xA3L
  private val BLOCK_GROUP = 0xA0L
  private val BLOCK = 0xA1L
  private val REFERENCE_BLOCK = 0xFBL

  // ------------------------------------------------------------ parse

  def videoInfo(payload: Array[Byte]): Option[VideoInfo] =
    parse(payload).map(_._1)

  def videoFrames(payload: Array[Byte]): IndexedSeq[Frame] =
    parse(payload).map(_._2).getOrElse(IndexedSeq.empty)

  /** `n` evenly spaced keyframes: (time ms, encoded frame bytes) */
  def sampleKeyframes(payload: Array[Byte], n: Int): Seq[(Long, Array[Byte])] = {
    require(n > 0, "sampleKeyframes: n must be positive")
    val all = videoFrames(payload)
    require(all.nonEmpty, "mkv: no video track (or no frames)")
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
    require(isMkv(payload), "mkv: no EBML header")
    val top = children(payload, 0L, payload.length.toLong)
    val seg = top.find(_.id == SEGMENT).getOrElse(
      throw new IllegalArgumentException("mkv: no Segment element"))
    val segKids = children(payload, seg.payloadStart, seg.payloadEnd)

    // Info: TimestampScale (default 1 ms) + Duration (in scale units)
    val info = segKids.find(_.id == INFO)
      .map(i => children(payload, i.payloadStart, i.payloadEnd)).getOrElse(Nil)
    val scaleNs = info.find(_.id == TIMESTAMP_SCALE).map(uint(payload, _))
      .getOrElse(1000000L)
    val durScale = info.find(_.id == DURATION).map(double(payload, _)).getOrElse(0.0)

    // Tracks: first video TrackEntry
    val entries = segKids.find(_.id == TRACKS)
      .map(t => children(payload, t.payloadStart, t.payloadEnd)).getOrElse(Nil)
      .filter(_.id == TRACK_ENTRY)
      .map(e => children(payload, e.payloadStart, e.payloadEnd))
    val video = entries.find(_.exists(k => k.id == TRACK_TYPE && uint(payload, k) == 1L))
      .getOrElse(return None)
    val trackNum = video.find(_.id == TRACK_NUMBER).map(uint(payload, _)).getOrElse(1L)
    val codec = video.find(_.id == CODEC_ID).map(str(payload, _)).getOrElse("?")
    val vid = video.find(_.id == VIDEO)
      .map(v => children(payload, v.payloadStart, v.payloadEnd)).getOrElse(Nil)
    val width = vid.find(_.id == PIXEL_WIDTH).map(uint(payload, _).toInt).getOrElse(0)
    val height = vid.find(_.id == PIXEL_HEIGHT).map(uint(payload, _).toInt).getOrElse(0)

    // Clusters → frames
    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    var lastMs = 0L
    segKids.filter(_.id == CLUSTER).foreach { cl =>
      val kids = children(payload, cl.payloadStart, cl.payloadEnd)
      val clusterTs = kids.find(_.id == CLUSTER_TS).map(uint(payload, _)).getOrElse(0L)
      def addBlock(blk: El, keyOverride: Option[Boolean]): Unit = {
        val (tn, tnLen) = vint(payload, blk.payloadStart, keepMarker = false)
        if (tn == trackNum) {
          val relTs = ((payload((blk.payloadStart + tnLen).toInt) & 0xFF) << 8 |
            (payload((blk.payloadStart + tnLen + 1).toInt) & 0xFF)).toShort.toLong
          val flags = payload((blk.payloadStart + tnLen + 2).toInt) & 0xFF
          require((flags & 0x06) == 0,
            "mkv: laced blocks unsupported — one frame per block expected")
          val dataStart = blk.payloadStart + tnLen + 3
          val ms = (clusterTs + relTs) * scaleNs / 1000000L
          lastMs = math.max(lastMs, ms)
          frames += Frame(frames.size, dataStart, (blk.payloadEnd - dataStart).toInt,
            ms, keyOverride.getOrElse((flags & 0x80) != 0))
        }
      }
      kids.foreach { k =>
        if (k.id == SIMPLE_BLOCK) addBlock(k, None)
        else if (k.id == BLOCK_GROUP) {
          val gk = children(payload, k.payloadStart, k.payloadEnd)
          // in a BlockGroup, keyframe = no ReferenceBlock sibling
          val isKey = !gk.exists(_.id == REFERENCE_BLOCK)
          gk.filter(_.id == BLOCK).foreach(addBlock(_, Some(isKey)))
        }
      }
    }
    if (frames.isEmpty) return None
    val durationMs =
      if (durScale > 0) (durScale * scaleNs / 1000000.0).toLong else lastMs
    Some((VideoInfo(codec, scaleNs, durationMs, width, height,
      frames.size, frames.count(_.key)), frames.toIndexedSeq))
  }
}
