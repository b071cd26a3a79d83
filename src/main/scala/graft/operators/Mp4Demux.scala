package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM ISO BMFF (MP4/MOV) DEMUXER for the multimodal frame-sampling
  * pass. The JDK ships no video *codec*, but frame SAMPLING does not need
  * one: the container's sample tables (`stbl`) locate every encoded video
  * sample and mark the sync samples (keyframes), so "sample n frames"
  * demuxes to n encoded access units + timestamps without decoding a
  * pixel — the standard shape for training-data video pipelines, where a
  * downstream GPU stage does the actual decode.
  *
  * Parsed per ISO/IEC 14496-12 (public spec): box framing (32-bit size,
  * `largesize`, size-0-to-EOF), `moov/trak/mdia` hierarchy, `mdhd`
  * v0/v1 timescale, `hdlr` handler type, and the `stbl` tables —
  * `stsd` (codec fourcc + visual width/height), `stts` (decode times),
  * `stss` (sync samples; absent = every sample is sync), `stsz`/`stz2`
  * (sizes), `stsc` (sample→chunk runs), `stco`/`co64` (chunk offsets).
  *
  * Sampled frames are the ENCODED payloads (e.g. AVC/HEVC access units
  * in the `stsd`-declared parameter-set context) — decodable bytes for a
  * real decoder, deterministic and inspectable for tests.
  *
  * FRAGMENTED MP4 (CMAF/DASH: `moov` with empty `stbl` + `mvex/trex`
  * defaults, then `[moof][mdat]` fragments) is demuxed too: `tfhd`
  * per-fragment defaults, `tfdt` base decode times, `trun` per-sample
  * sizes/durations/flags, sample offsets from `base_data_offset` or the
  * default-base-is-moof rule, keyframes from the
  * `sample_is_non_sync_sample` flag bit.
  */
object Mp4Demux {

  final case class VideoInfo(codec: String, timescaleHz: Long, durationMs: Long,
      width: Int, height: Int, sampleCount: Int, syncSampleCount: Int)

  /** one encoded video sample: byte range + decode time + keyframe flag */
  final case class Sample(index: Int, offset: Long, size: Int, timeMs: Long, sync: Boolean)

  /** `ftyp`/`styp` (or streaming-style `moov`-first) magic at the first box */
  def isMp4(payload: Array[Byte]): Boolean =
    payload.length >= 12 && {
      val t = new String(payload, 4, 4, StandardCharsets.US_ASCII)
      t == "ftyp" || t == "styp" || t == "moov"
    }

  // -------------------------------------------------------- box walking

  private final case class Box(typ: String, start: Long, payloadStart: Long, payloadEnd: Long)

  /** children of [start, end): MP4 boxes are (size, fourcc, payload) */
  private def children(buf: ByteBuffer, start: Long, end: Long): Seq[Box] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Box]
    var pos = start
    while (pos + 8 <= end) {
      val size32 = buf.getInt(pos.toInt) & 0xFFFFFFFFL
      val typ = fourcc(buf, pos + 4)
      val (payloadStart, boxEnd) =
        if (size32 == 1L) { // 64-bit largesize follows the fourcc
          require(pos + 16 <= end, s"mp4: truncated largesize box '$typ'")
          (pos + 16, pos + buf.getLong((pos + 8).toInt))
        } else if (size32 == 0L) (pos + 8, end) // to end of enclosing box
        else (pos + 8, pos + size32)
      require(boxEnd <= end && boxEnd > pos, s"mp4: box '$typ' overruns its container")
      out += Box(typ, pos, payloadStart, boxEnd)
      pos = boxEnd
    }
    out.toSeq
  }

  private def fourcc(buf: ByteBuffer, at: Long): String = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = buf.get((at + i).toInt); i += 1 }
    new String(b, StandardCharsets.US_ASCII)
  }

  private def child(buf: ByteBuffer, parent: Box, typ: String): Option[Box] =
    children(buf, parent.payloadStart, parent.payloadEnd).find(_.typ == typ)

  // ------------------------------------------------------------- parse

  /** the first video (`vide` handler) track's info; None when the
    * container has no video track */
  def videoInfo(payload: Array[Byte]): Option[VideoInfo] =
    videoTrack(payload).map(_._1)

  /** full sample table of the first video track (offsets into `payload`) */
  def videoSamples(payload: Array[Byte]): IndexedSeq[Sample] =
    videoTrack(payload).map(_._2).getOrElse(IndexedSeq.empty)

  /** `n` evenly spaced sync samples (all samples when the container
    * marks none beyond the first as sync and n exceeds their count):
    * (decode time ms, encoded sample bytes) */
  def sampleKeyframes(payload: Array[Byte], n: Int): Seq[(Long, Array[Byte])] = {
    require(n > 0, "sampleKeyframes: n must be positive")
    val all = videoSamples(payload)
    require(all.nonEmpty, "mp4: no video track (or empty sample table)")
    val syncs = all.filter(_.sync)
    val pool = if (syncs.nonEmpty) syncs else all
    val wanted: Seq[Sample] =
      if (n >= pool.size) pool
      else (0 until n).map(i => pool((i.toLong * pool.size / n).toInt))
    wanted.map { s =>
      val bytes = java.util.Arrays.copyOfRange(payload, s.offset.toInt,
        (s.offset + s.size).toInt)
      (s.timeMs, bytes)
    }
  }

  private def videoTrack(payload: Array[Byte]): Option[(VideoInfo, IndexedSeq[Sample])] = {
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
    val top = children(buf, 0L, payload.length.toLong)
    val moov = top.find(_.typ == "moov").getOrElse(
      throw new IllegalArgumentException("mp4: no moov box (not an ISO BMFF file?)"))
    val moofs = top.filter(_.typ == "moof")
    val traks = children(buf, moov.payloadStart, moov.payloadEnd).filter(_.typ == "trak")
    if (moofs.isEmpty) traks.flatMap(parseTrack(buf, _)).headOption
    else traks.flatMap(parseFragmented(buf, moov, moofs, _)).headOption
  }

  // ------------------------------------------------ fragmented (moof)

  /** fragments of the first video track: moov carries the static info
    * (+ `trex` defaults), each `moof/traf` carries `tfhd` overrides,
    * a `tfdt` base decode time and `trun` sample runs */
  private def parseFragmented(buf: ByteBuffer, moov: Box, moofs: Seq[Box],
      trak: Box): Option[(VideoInfo, IndexedSeq[Sample])] = {
    val mdia = child(buf, trak, "mdia").getOrElse(return None)
    val hdlr = child(buf, mdia, "hdlr").getOrElse(return None)
    if (fourcc(buf, hdlr.payloadStart + 8) != "vide") return None
    val tkhd = child(buf, trak, "tkhd").getOrElse(return None)
    val tkhdV = buf.get(tkhd.payloadStart.toInt) & 0xFF
    val trackId = buf.getInt((tkhd.payloadStart + (if (tkhdV == 1) 20 else 12)).toInt)

    val mdhd = child(buf, mdia, "mdhd").getOrElse(return None)
    val mdhdV = buf.get(mdhd.payloadStart.toInt) & 0xFF
    val timescale =
      if (mdhdV == 1) buf.getInt((mdhd.payloadStart + 20).toInt) & 0xFFFFFFFFL
      else buf.getInt((mdhd.payloadStart + 12).toInt) & 0xFFFFFFFFL
    require(timescale > 0, "mp4: mdhd timescale must be positive")

    val stbl = child(buf, mdia, "minf").flatMap(child(buf, _, "stbl"))
    val (codec, width, height) = stbl.flatMap(child(buf, _, "stsd")).map { stsd =>
      children(buf, stsd.payloadStart + 8, stsd.payloadEnd).headOption match {
        case Some(e) if e.payloadEnd - e.payloadStart >= 28 =>
          (e.typ, buf.getShort((e.payloadStart + 24).toInt) & 0xFFFF,
            buf.getShort((e.payloadStart + 26).toInt) & 0xFFFF)
        case Some(e) => (e.typ, 0, 0)
        case None => ("????", 0, 0)
      }
    }.getOrElse(("????", 0, 0))

    // mvex/trex defaults for this track (fields after vf(4), track_ID(4),
    // default_sample_description_index(4))
    val trex = child(buf, moov, "mvex").toSeq
      .flatMap(m => children(buf, m.payloadStart, m.payloadEnd))
      .find(b => b.typ == "trex" && buf.getInt((b.payloadStart + 4).toInt) == trackId)
    val trexDur = trex.map(b => buf.getInt((b.payloadStart + 12).toInt)).getOrElse(0)
    val trexSize = trex.map(b => buf.getInt((b.payloadStart + 16).toInt)).getOrElse(0)
    val trexFlags = trex.map(b => buf.getInt((b.payloadStart + 20).toInt)).getOrElse(0)

    val samples = scala.collection.mutable.ArrayBuffer.empty[Sample]
    var t = 0L
    moofs.foreach { moof =>
      children(buf, moof.payloadStart, moof.payloadEnd).filter(_.typ == "traf").foreach { traf =>
        val tfhd = child(buf, traf, "tfhd").getOrElse(
          throw new IllegalArgumentException("mp4: traf without tfhd"))
        val tfFlags = buf.getInt(tfhd.payloadStart.toInt) & 0xFFFFFF
        if (buf.getInt((tfhd.payloadStart + 4).toInt) == trackId) {
          var p = tfhd.payloadStart + 8
          val baseOffset: Option[Long] =
            if ((tfFlags & 0x01) != 0) { val v = buf.getLong(p.toInt); p += 8; Some(v) }
            else None
          if ((tfFlags & 0x02) != 0) p += 4 // sample_description_index
          val defDur =
            if ((tfFlags & 0x08) != 0) { val v = buf.getInt(p.toInt); p += 4; v } else trexDur
          val defSize =
            if ((tfFlags & 0x10) != 0) { val v = buf.getInt(p.toInt); p += 4; v } else trexSize
          val defFlags =
            if ((tfFlags & 0x20) != 0) { val v = buf.getInt(p.toInt); p += 4; v } else trexFlags
          // base: explicit offset, else the moof's first byte (covers the
          // default-base-is-moof flag AND the first-traf fallback)
          val base = baseOffset.getOrElse(moof.start)
          child(buf, traf, "tfdt").foreach { tfdt =>
            val v = buf.get(tfdt.payloadStart.toInt) & 0xFF
            t = if (v == 1) buf.getLong((tfdt.payloadStart + 4).toInt)
                else buf.getInt((tfdt.payloadStart + 4).toInt) & 0xFFFFFFFFL
          }
          var runOff: Long = -1L // continue after the previous run when absent
          children(buf, traf.payloadStart, traf.payloadEnd).filter(_.typ == "trun").foreach { trun =>
            val trFlags = buf.getInt(trun.payloadStart.toInt) & 0xFFFFFF
            val n = buf.getInt((trun.payloadStart + 4).toInt)
            var q = trun.payloadStart + 8
            val dataOff: Option[Int] =
              if ((trFlags & 0x01) != 0) { val v = buf.getInt(q.toInt); q += 4; Some(v) }
              else None
            val firstFlags: Option[Int] =
              if ((trFlags & 0x04) != 0) { val v = buf.getInt(q.toInt); q += 4; Some(v) }
              else None
            var off = dataOff.map(base + _).getOrElse(if (runOff >= 0) runOff else base)
            var i = 0
            while (i < n) {
              val dur =
                if ((trFlags & 0x100) != 0) { val v = buf.getInt(q.toInt); q += 4; v }
                else defDur
              val size =
                if ((trFlags & 0x200) != 0) { val v = buf.getInt(q.toInt); q += 4; v }
                else defSize
              val sFlags =
                if ((trFlags & 0x400) != 0) { val v = buf.getInt(q.toInt); q += 4; v }
                else if (i == 0 && firstFlags.isDefined) firstFlags.get
                else defFlags
              if ((trFlags & 0x800) != 0) q += 4 // composition time offset
              require(size > 0, "mp4: fragment sample without a size (no trun/tfhd/trex default)")
              samples += Sample(samples.size, off, size, t * 1000L / timescale,
                (sFlags & 0x10000) == 0) // !sample_is_non_sync_sample
              off += size
              t += dur
              i += 1
            }
            runOff = off
          }
        }
      }
    }
    if (samples.isEmpty) return None
    val info = VideoInfo(codec, timescale, t * 1000L / timescale, width, height,
      samples.size, samples.count(_.sync))
    Some((info, samples.toIndexedSeq))
  }

  private def parseTrack(buf: ByteBuffer, trak: Box): Option[(VideoInfo, IndexedSeq[Sample])] = {
    val mdia = child(buf, trak, "mdia").getOrElse(return None)
    val hdlr = child(buf, mdia, "hdlr").getOrElse(return None)
    // hdlr payload: version+flags(4), pre_defined(4), handler_type(4)
    if (fourcc(buf, hdlr.payloadStart + 8) != "vide") return None

    val mdhd = child(buf, mdia, "mdhd").getOrElse(return None)
    val mdhdVersion = buf.get(mdhd.payloadStart.toInt) & 0xFF
    val (timescale, duration) =
      if (mdhdVersion == 1)
        (buf.getInt((mdhd.payloadStart + 20).toInt) & 0xFFFFFFFFL,
          buf.getLong((mdhd.payloadStart + 24).toInt))
      else
        (buf.getInt((mdhd.payloadStart + 12).toInt) & 0xFFFFFFFFL,
          (buf.getInt((mdhd.payloadStart + 16).toInt) & 0xFFFFFFFFL))
    require(timescale > 0, "mp4: mdhd timescale must be positive")

    val stbl = child(buf, mdia, "minf").flatMap(child(buf, _, "stbl")).getOrElse(return None)

    // stsd: version+flags(4), entry_count(4), then sample entries
    val (codec, width, height) = child(buf, stbl, "stsd").map { stsd =>
      val entry = children(buf, stsd.payloadStart + 8, stsd.payloadEnd).headOption
      entry match {
        case Some(e) =>
          // VisualSampleEntry: 6 reserved + 2 data_ref, 16 pre_defined/
          // reserved, width(2), height(2) at payload offsets 24/26
          val w = if (e.payloadEnd - e.payloadStart >= 28)
            buf.getShort((e.payloadStart + 24).toInt) & 0xFFFF else 0
          val h = if (e.payloadEnd - e.payloadStart >= 28)
            buf.getShort((e.payloadStart + 26).toInt) & 0xFFFF else 0
          (e.typ, w, h)
        case None => ("????", 0, 0)
      }
    }.getOrElse(("????", 0, 0))

    // stsz: version+flags(4), sample_size(4), sample_count(4)[, sizes];
    // stz2: version+flags(4), reserved(3)+field_size(1), sample_count(4),
    // packed 4/8/16-bit sizes
    val (sampleCount, sizes): (Int, Int => Int) =
      child(buf, stbl, "stsz") match {
        case Some(stsz) =>
          val uniformSize = buf.getInt((stsz.payloadStart + 4).toInt)
          val n = buf.getInt((stsz.payloadStart + 8).toInt)
          (n,
            if (uniformSize != 0) (_: Int) => uniformSize
            else (i: Int) => buf.getInt((stsz.payloadStart + 12 + 4L * i).toInt))
        case None =>
          val stz2 = child(buf, stbl, "stz2").getOrElse(return None)
          val fieldSize = buf.get((stz2.payloadStart + 7).toInt) & 0xFF
          val n = buf.getInt((stz2.payloadStart + 8).toInt)
          val base = stz2.payloadStart + 12
          val f: Int => Int = fieldSize match {
            case 4 =>
              i => {
                val b = buf.get((base + i / 2).toInt) & 0xFF
                if (i % 2 == 0) b >> 4 else b & 0x0F
              }
            case 8 => i => buf.get((base + i).toInt) & 0xFF
            case 16 => i => buf.getShort((base + 2L * i).toInt) & 0xFFFF
            case other =>
              throw new IllegalArgumentException(s"mp4: stz2 field_size $other")
          }
          (n, f)
      }

    // stco/co64 chunk offsets
    val chunkOffsets: IndexedSeq[Long] =
      child(buf, stbl, "stco").map { b =>
        val n = buf.getInt((b.payloadStart + 4).toInt)
        (0 until n).map(i => buf.getInt((b.payloadStart + 8 + 4L * i).toInt) & 0xFFFFFFFFL)
      }.orElse(child(buf, stbl, "co64").map { b =>
        val n = buf.getInt((b.payloadStart + 4).toInt)
        (0 until n).map(i => buf.getLong((b.payloadStart + 8 + 8L * i).toInt))
      }).getOrElse(return None)

    // stsc runs: (first_chunk 1-based, samples_per_chunk, sdi)
    val stsc = child(buf, stbl, "stsc").getOrElse(return None)
    val stscN = buf.getInt((stsc.payloadStart + 4).toInt)
    val runs = (0 until stscN).map { i =>
      val at = stsc.payloadStart + 8 + 12L * i
      (buf.getInt(at.toInt), buf.getInt((at + 4).toInt))
    }

    // stts → per-sample decode times
    val stts = child(buf, stbl, "stts").getOrElse(return None)
    val sttsN = buf.getInt((stts.payloadStart + 4).toInt)
    val times = new Array[Long](sampleCount)
    var t = 0L
    var si = 0
    var ri = 0
    while (ri < sttsN && si < sampleCount) {
      val at = stts.payloadStart + 8 + 8L * ri
      val cnt = buf.getInt(at.toInt)
      val delta = buf.getInt((at + 4).toInt) & 0xFFFFFFFFL
      var k = 0
      while (k < cnt && si < sampleCount) { times(si) = t; t += delta; si += 1; k += 1 }
      ri += 1
    }

    // stss sync set (absent → every sample is a keyframe, per spec)
    val syncSet: Option[Set[Int]] = child(buf, stbl, "stss").map { b =>
      val n = buf.getInt((b.payloadStart + 4).toInt)
      (0 until n).map(i => buf.getInt((b.payloadStart + 8 + 4L * i).toInt)).toSet
    }

    // chunk walk: samples are contiguous within each chunk
    val samples = new scala.collection.mutable.ArrayBuffer[Sample](sampleCount)
    var sample = 0
    var chunk = 0
    while (sample < sampleCount && chunk < chunkOffsets.size) {
      // samples-per-chunk for chunk (1-based) = last run with first_chunk <= chunk+1
      val spc = runs.takeWhile(_._1 <= chunk + 1).lastOption.map(_._2)
        .getOrElse(runs.headOption.map(_._2).getOrElse(0))
      var off = chunkOffsets(chunk)
      var k = 0
      while (k < spc && sample < sampleCount) {
        val sz = sizes(sample)
        samples += Sample(sample, off, sz, times(sample) * 1000L / timescale,
          syncSet.forall(_.contains(sample + 1)))
        off += sz
        sample += 1
        k += 1
      }
      chunk += 1
    }
    require(samples.size == sampleCount,
      s"mp4: chunk tables cover ${samples.size} of $sampleCount samples")

    val info = VideoInfo(codec, timescale, t * 1000L / timescale, width, height,
      sampleCount, syncSet.map(_.size).getOrElse(sampleCount))
    Some((info, samples.toIndexedSeq))
  }
}
