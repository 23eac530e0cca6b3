package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal ISO-BMFF (MP4) container demuxer/muxer in pure Scala — no
  * external dependency. The demuxer walks the real box tree
  * (`moov/trak/mdia/minf/stbl`) and reconstructs the per-sample byte
  * ranges from the sample tables (`stsd` codec + geometry, `stsz` sizes,
  * `stsc`+`stco`/`co64` chunk layout, `stts` timing, `mdhd` timescale), so
  * frame extraction from `video/mp4` payloads is REAL container work, not
  * a stub. Pixel decode of the extracted samples is then codec-dependent:
  * MJPEG tracks (`jpeg`/`mjpa` sample entries, each sample a complete JPEG)
  * decode through `javax.imageio`; H.264/H.265 samples have no JDK codec
  * and stay honestly undecodable ([[JdkMediaCodec]] records which path ran).
  *
  * The muxer writes the same subset back (single self-contained MJPEG
  * video track, one chunk) — enough to round-trip fixtures and export
  * frame-sampled clips without any media library.
  *
  * Box layout follows the public ISO/IEC 14496-12 structure; field offsets
  * for the visual sample entry are the standard 78-byte layout.
  */
object Mp4 {

  /** One parsed video track: codec fourcc, geometry, timing, and the
    * absolute byte range of every sample (frame) in the payload. */
  case class VideoTrack(
      codec: String,
      width: Int,
      height: Int,
      timescale: Long,
      duration: Long,
      sampleOffsets: Array[Long],
      sampleSizes: Array[Int],
      sampleTimes: Array[Long]) {
    def frameCount: Int = sampleSizes.length
    def durationMs: Long =
      if (timescale == 0) 0L else duration * 1000L / timescale
    /** End of the REAL content in ms, derived from the stts sample table
      * (last sample's start + its inferred duration) rather than the mdhd
      * duration field. The two agree on well-formed files; on a corrupt or
      * hostile container (timescale=1, duration=2^32) the mdhd value is
      * unbounded while this stays bounded by the demuxed sample count —
      * use it to clamp any per-timestamp sweep. */
    def contentEndMs: Long = {
      if (timescale == 0 || sampleTimes.isEmpty) return 0L
      val n = sampleTimes.length
      val lastStart = sampleTimes(n - 1)
      val lastDelta =
        if (n >= 2) sampleTimes(n - 1) - sampleTimes(n - 2)
        else math.max(0L, duration - lastStart)
      (lastStart + lastDelta) * 1000L / timescale
    }
    /** Index of the last sample whose decode time is <= tsMs (or 0).
      * Binary search over the non-decreasing stts-derived times — a
      * per-timestamp linear scan made timestamp sweeps quadratic in
      * frame count. */
    def sampleAt(tsMs: Long): Int = {
      if (timescale == 0 || sampleTimes.isEmpty) return 0
      val t = tsMs * timescale / 1000L
      var lo = 0
      var hi = sampleTimes.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (sampleTimes(mid) <= t) lo = mid else hi = mid - 1
      }
      lo
    }
  }

  private final class Reader(p: Array[Byte]) {
    val buf: ByteBuffer = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    def u32(at: Long): Long = buf.getInt(at.toInt) & 0xffffffffL
    def u64(at: Long): Long = buf.getLong(at.toInt)
    def u16(at: Long): Int = buf.getShort(at.toInt) & 0xffff
    def fourcc(at: Long): String =
      new String(p, at.toInt, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    def length: Long = p.length.toLong
  }

  /** (boxType, payloadStart, payloadEnd) for each top-level box in
    * [start, end); 64-bit `size==1` largesize boxes supported. */
  private def boxes(r: Reader, start: Long, end: Long): List[(String, Long, Long)] = {
    var at = start
    val out = List.newBuilder[(String, Long, Long)]
    while (at + 8 <= end) {
      val size0 = r.u32(at)
      val typ = r.fourcc(at + 4)
      val (hdr, size) =
        if (size0 == 1L && at + 16 <= end) (16L, r.u64(at + 8))
        else (8L, if (size0 == 0L) end - at else size0)
      if (size < hdr || at + size > end) return out.result() // malformed: stop
      out += ((typ, at + hdr, at + size))
      at += size
    }
    out.result()
  }

  private def child(r: Reader, bs: List[(String, Long, Long)], typ: String) =
    bs.find(_._1 == typ)

  /** Parse the first video track of an MP4 payload; None when the payload
    * is not a parseable ISO-BMFF container with a complete sample table. */
  def demux(payload: Array[Byte]): Option[VideoTrack] =
    try {
      val r = new Reader(payload)
      val top = boxes(r, 0L, r.length)
      val moov = child(r, top, "moov").getOrElse(return None)
      val traks = boxes(r, moov._2, moov._3).filter(_._1 == "trak")
      traks.view.flatMap(t => parseTrak(r, t)).headOption
    } catch { case _: RuntimeException => None }

  private def parseTrak(r: Reader, trak: (String, Long, Long)): Option[VideoTrack] = {
    val tb = boxes(r, trak._2, trak._3)
    val mdia = child(r, tb, "mdia").getOrElse(return None)
    val mb = boxes(r, mdia._2, mdia._3)
    // handler must be 'vide' (offset 8 past version/flags + pre_defined)
    val hdlr = child(r, mb, "hdlr").getOrElse(return None)
    if (r.fourcc(hdlr._2 + 8) != "vide") return None
    val mdhd = child(r, mb, "mdhd").getOrElse(return None)
    val v = r.buf.get(mdhd._2.toInt) & 0xff
    val (timescale, duration) =
      if (v == 1) (r.u32(mdhd._2 + 20), r.u64(mdhd._2 + 24))
      else (r.u32(mdhd._2 + 12), r.u32(mdhd._2 + 16))
    val minf = child(r, mb, "minf").getOrElse(return None)
    val stbl = child(r, boxes(r, minf._2, minf._3), "stbl").getOrElse(return None)
    val sb = boxes(r, stbl._2, stbl._3)

    // stsd: first sample entry's fourcc + visual geometry (std 78-byte entry:
    // fourcc at +4..8 of the entry, width/height at +32/+34 past entry start)
    val stsd = child(r, sb, "stsd").getOrElse(return None)
    val entry = stsd._2 + 8 // version/flags(4) + entry_count(4)
    val codec = r.fourcc(entry + 4)
    val width = r.u16(entry + 32)
    val height = r.u16(entry + 34)

    // stsz: per-sample sizes (or a constant size)
    val stsz = child(r, sb, "stsz").getOrElse(return None)
    val constSize = r.u32(stsz._2 + 4)
    val nSamples = r.u32(stsz._2 + 8).toInt
    // plausibility gate BEFORE any nSamples-sized allocation: every sample
    // occupies >= 1 byte of the payload in any real container, so a declared
    // count beyond the payload length is hostile/corrupt (a u32 count of
    // 2^32 would otherwise allocate gigabytes here)
    if (nSamples < 0 || nSamples.toLong > r.length) return None
    val sizes = Array.tabulate(nSamples) { i =>
      (if (constSize != 0) constSize else r.u32(stsz._2 + 12 + 4L * i)).toInt
    }

    // stco / co64: chunk offsets
    val chunkOffsets: Array[Long] =
      child(r, sb, "stco") match {
        case Some((_, s, _)) =>
          Array.tabulate(r.u32(s + 4).toInt)(i => r.u32(s + 8 + 4L * i))
        case None =>
          val (_, s, _) = child(r, sb, "co64").getOrElse(return None)
          Array.tabulate(r.u32(s + 4).toInt)(i => r.u64(s + 8 + 8L * i))
      }

    // stsc: sample-to-chunk runs -> absolute offset per sample
    val stsc = child(r, sb, "stsc").getOrElse(return None)
    val nRuns = r.u32(stsc._2 + 4).toInt
    val runs = Array.tabulate(nRuns) { i =>
      val at = stsc._2 + 8 + 12L * i
      (r.u32(at).toInt, r.u32(at + 4).toInt) // (firstChunk 1-based, samplesPerChunk)
    }
    val offsets = new Array[Long](nSamples)
    var sample = 0
    var run = 0
    var chunk = 1
    while (sample < nSamples && chunk <= chunkOffsets.length) {
      while (run + 1 < nRuns && runs(run + 1)._1 <= chunk) run += 1
      val perChunk = runs(run)._2
      var off = chunkOffsets(chunk - 1)
      var i = 0
      while (i < perChunk && sample < nSamples) {
        offsets(sample) = off
        off += sizes(sample)
        sample += 1
        i += 1
      }
      chunk += 1
    }
    if (sample < nSamples) return None // chunk map doesn't cover the samples

    // stts: decode timestamps from (count, delta) runs
    val stts = child(r, sb, "stts").getOrElse(return None)
    val nTimeRuns = r.u32(stts._2 + 4).toInt
    val times = new Array[Long](nSamples)
    var t = 0L
    var ti = 0
    var tr = 0
    while (tr < nTimeRuns && ti < nSamples) {
      val at = stts._2 + 8 + 8L * tr
      val count = r.u32(at).toInt
      val delta = r.u32(at + 4)
      var c = 0
      while (c < count && ti < nSamples) {
        times(ti) = t; t += delta; ti += 1; c += 1
      }
      tr += 1
    }

    val last = offsets.lazyZip(sizes).map((o, s) => o + s).foldLeft(0L)(math.max)
    if (last > r.length) return None // sample ranges must lie inside the payload
    Some(VideoTrack(codec, width, height, timescale, duration, offsets, sizes, times))
  }

  /** The raw bytes of sample `i` (a complete JPEG for MJPEG tracks). */
  def sampleBytes(payload: Array[Byte], t: VideoTrack, i: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(payload,
      t.sampleOffsets(i).toInt, (t.sampleOffsets(i) + t.sampleSizes(i)).toInt)

  // ---- muxer ----------------------------------------------------------

  /** Write a single-track self-contained MP4: all frames in one `mdat`
    * chunk, constant frame duration, millisecond timescale. `codec` is the
    * sample-entry fourcc — "jpeg" for MJPEG (each frame a complete JPEG).
    * `use64BitOffsets` emits a `co64` chunk-offset box instead of `stco` —
    * what a >4 GiB clip needs; the demuxer reads both. */
  def mux(frames: Seq[Array[Byte]], width: Int, height: Int,
      frameDurMs: Int, codec: String = "jpeg",
      use64BitOffsets: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty && codec.length == 4)
    val durationMs = frames.length.toLong * frameDurMs

    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val n = 8 + payload.map(_.length).sum
      val b = ByteBuffer.allocate(n).order(ByteOrder.BIG_ENDIAN)
      b.putInt(n).put(typ.getBytes("ISO-8859-1"))
      payload.foreach(b.put)
      b.array()
    }
    def full(typ: String, version: Int, flags: Int, payload: Array[Byte]): Array[Byte] =
      box(typ, Array[Byte](version.toByte,
        ((flags >> 16) & 0xff).toByte, ((flags >> 8) & 0xff).toByte,
        (flags & 0xff).toByte), payload)
    def u32s(vs: Long*): Array[Byte] = {
      val b = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.BIG_ENDIAN)
      vs.foreach(v => b.putInt(v.toInt)); b.array()
    }
    def u16s(vs: Int*): Array[Byte] = {
      val b = ByteBuffer.allocate(2 * vs.length).order(ByteOrder.BIG_ENDIAN)
      vs.foreach(v => b.putShort(v.toShort)); b.array()
    }

    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), u32s(0x200),
      "isommp41".getBytes("ISO-8859-1"))

    // identity 3x3 fixed-point matrix used by mvhd/tkhd
    val matrix = u32s(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val mvhd = full("mvhd", 0, 0, Array.concat(
      u32s(0, 0, 1000, durationMs),              // created, modified, timescale, duration
      u32s(0x10000), u16s(0x0100, 0), u32s(0, 0), // rate, volume, reserved
      matrix, u32s(0, 0, 0, 0, 0, 0), u32s(2)))   // predefineds, next track id
    val tkhd = full("tkhd", 0, 7, Array.concat(
      u32s(0, 0, 1, 0, durationMs),              // created, modified, trackId, rsvd, duration
      u32s(0, 0), u16s(0, 0, 0, 0),              // reserved, layer, group, volume, rsvd
      matrix, u32s(width << 16, height << 16)))  // 16.16 fixed geometry
    val mdhd = full("mdhd", 0, 0, Array.concat(
      u32s(0, 0, 1000, durationMs), u16s(0x55c4, 0))) // und language, quality
    val hdlr = full("hdlr", 0, 0, Array.concat(
      u32s(0), "vide".getBytes("ISO-8859-1"), u32s(0, 0, 0),
      "GraftVideo ".getBytes("ISO-8859-1")))
    val vmhd = full("vmhd", 0, 1, u16s(0, 0, 0, 0))
    val dref = full("dref", 0, 0,
      Array.concat(u32s(1), full("url ", 0, 1, Array.emptyByteArray)))
    val dinf = box("dinf", dref)

    // 78-byte visual sample entry: reserved(6) + dataRefIdx(2) + predef/rsvd
    // (16) + width/height + 72dpi resolutions + frameCount 1 + name(32) +
    // depth 24 + predef -1
    val sampleEntry = box(codec, Array.concat(
      new Array[Byte](6), u16s(1), new Array[Byte](16),
      u16s(width, height), u32s(0x480000, 0x480000, 0), u16s(1),
      new Array[Byte](32), u16s(24, 0xffff)))
    val stsd = full("stsd", 0, 0, Array.concat(u32s(1), sampleEntry))
    val stts = full("stts", 0, 0, u32s(1, frames.length, frameDurMs))
    val stsc = full("stsc", 0, 0, u32s(1, 1, frames.length, 1))
    val stsz = full("stsz", 0, 0,
      u32s((0L +: frames.length.toLong +: frames.map(_.length.toLong)): _*))

    // mdat precedes moov; its payload offset depends only on ftyp+mdat headers
    val mdatPayloadAt = ftyp.length + 8
    val chunkOffsets =
      if (use64BitOffsets) {
        val b = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
        b.putInt(1).putLong(mdatPayloadAt.toLong)
        full("co64", 0, 0, b.array())
      } else full("stco", 0, 0, u32s(1, mdatPayloadAt))

    val stbl = box("stbl", stsd, stts, stsc, stsz, chunkOffsets)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val mdat = box("mdat", frames: _*)

    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.toByteArray
  }
}
