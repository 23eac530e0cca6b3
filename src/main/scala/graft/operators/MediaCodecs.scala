package graft.operators

import java.io.ByteArrayInputStream

/** The decode seam [[Multimodal]] plugs a codec into: one function from an
  * asset to fixed-width features. Implementations must be serializable —
  * they ride inside `mapPartitions` closures. */
trait MediaCodec extends Serializable {
  def decode(a: MmAsset): MmFeatures
}

/** REAL media decode built on the JDK's own codecs — `javax.imageio`
  * (PNG/JPEG/BMP/GIF) and `javax.sound.sampled` (WAV/PCM) are public Java
  * standard-library APIs, so no external dependency is needed. This is the
  * production end of the seam [[Multimodal.FakeDecoder]] stubs: images
  * decode to per-channel/luma statistics, audio decodes to
  * amplitude/energy statistics, both as the same fixed-width vector shape
  * a model-embedding codec would emit.
  *
  * Video runs through [[Mp4]], a real ISO-BMFF demuxer: the container's
  * sample tables yield true frame count, geometry, duration and per-frame
  * byte ranges for ANY parseable MP4, and MJPEG tracks (`jpeg`/`mjpa`
  * sample entries) additionally get REAL pixel decode — each sample is a
  * complete JPEG the `javax.imageio` codec reads. H.264/H.265 samples have
  * no JDK codec, so their tracks report demuxed container stats with the
  * `decoded` flag 0; payloads that aren't parseable MP4 at all fall back
  * to byte-level statistics, also with `decoded` 0.
  *
  * SCALE: decode is pure per-row CPU inside `mapPartitions` (no shuffle,
  * no driver involvement); codec instances are JVM-static so executor
  * reuse amortizes class-init across batches.
  */
object JdkMediaCodec extends MediaCodec {
  val Dim = 8

  def decode(a: MmAsset): MmFeatures = {
    val feats =
      if (a.mime.startsWith("image/")) decodeImage(a.payload)
      else if (a.mime == "audio/wav" || a.mime == "audio/x-wav") decodeWav(a.payload)
      else if (a.mime == "video/mp4") decodeVideo(a.payload)
      else None
    MmFeatures(a.doc_id, a.mime, a.payload.length.toLong,
      feats.getOrElse(byteStats(a.payload)))
  }

  /** slot 0: 1.0 = real decode ran, 0.0 = byte-stat fallback. */
  private def byteStats(p: Array[Byte]): Array[Float] = {
    var sum = 0L; var i = 0
    while (i < p.length) { sum += (p(i) & 0xff); i += 1 }
    val mean = if (p.length == 0) 0f else sum.toFloat / p.length
    Array(0f, p.length.toFloat, mean / 255f, 0f, 0f, 0f, 0f, 0f)
  }

  /** [decoded=1, width, height, meanR, meanG, meanB, meanLuma, stdLuma] —
    * channel means in [0,1]; luma = Rec.601 integer weights. */
  private[operators] def decodeImage(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var sy = 0.0; var syy = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sr += r; sg += g; sb += b
            val luma = (299 * r + 587 * g + 114 * b) / 1000.0
            sy += luma; syy += luma * luma
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val meanLuma = sy / n
        val varLuma = math.max(0.0, syy / n - meanLuma * meanLuma)
        Some(Array(1f, w.toFloat, h.toFloat,
          sr.toFloat / n / 255f, sg.toFloat / n / 255f, sb.toFloat / n / 255f,
          (meanLuma / 255.0).toFloat, (math.sqrt(varLuma) / 255.0).toFloat))
      }
    } catch { case _: java.io.IOException => None }

  /** [decoded=1, sampleRate, channels, frames, meanAbs, rms, zeroCrossRate,
    * peak] — amplitudes normalized to [0,1] against the sample width. */
  private[operators] def decodeWav(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None // 16-bit PCM is the contract
        else {
          val bytes = in.readAllBytes()
          val big = fmt.isBigEndian
          val n = bytes.length / 2
          var i = 0; var sumAbs = 0.0; var sumSq = 0.0
          var crossings = 0L; var prevNeg = false; var peak = 0.0
          while (i < n) {
            val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
            val hi = bytes(2 * i + (if (big) 0 else 1))
            val s = ((hi << 8) | lo).toShort / 32768.0
            val a = math.abs(s)
            sumAbs += a; sumSq += s * s
            if (a > peak) peak = a
            val neg = s < 0
            if (i > 0 && neg != prevNeg) crossings += 1
            prevNeg = neg
            i += 1
          }
          if (n == 0) None
          else Some(Array(1f, fmt.getSampleRate, fmt.getChannels.toFloat,
            (n / fmt.getChannels).toFloat, (sumAbs / n).toFloat,
            math.sqrt(sumSq / n).toFloat, (crossings.toDouble / n).toFloat,
            peak.toFloat))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Raw int16 PCM samples + sample rate from a WAV payload — the
    * sample-level seam [[Multimodal.applyAudioFrames]] frames over.
    * Returning the RAW shorts (not normalized floats) keeps downstream
    * energy sums exact integer arithmetic. Stricter than [[decodeWav]]
    * (which folds stats across channels): MONO SIGNED 16-bit PCM only,
    * None on anything else. */
  private[operators] def wavSamples(
      payload: Array[Byte]): Option[(Float, Array[Short])] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        // mono signed 16-bit PCM is the contract: a stereo or unsigned
        // stream would otherwise decode "successfully" into garbage
        // (interleaved channels / biased amplitudes) instead of None
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getChannels != 1) None
        else {
          val bytes = in.readAllBytes()
          val big = fmt.isBigEndian
          val n = bytes.length / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
            val hi = bytes(2 * i + (if (big) 0 else 1))
            out(i) = ((hi << 8) | lo).toShort
            i += 1
          }
          if (n == 0) None else Some((fmt.getSampleRate, out))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** [decoded, nFrames, width, height, meanLuma, stdLuma, durationMs, fps]
    * — container fields come from the REAL [[Mp4]] demux (sample tables,
    * not metadata guesses). `decoded`=1 iff the track's samples pixel-
    * decoded (MJPEG); an H.264 track demuxes (real frame count/geometry/
    * timing) but reports luma 0 with `decoded`=0. Non-MP4 payloads return
    * None → byte-stat fallback. */
  private[operators] def decodeVideo(payload: Array[Byte]): Option[Array[Float]] =
    Mp4.demux(payload).map { t =>
      val durMs = t.durationMs
      val fps =
        if (durMs == 0) 0f else t.frameCount.toFloat * 1000f / durMs
      var sy = 0.0; var syy = 0.0; var n = 0L
      var i = 0
      while (i < t.frameCount) {
        frameLuma(payload, t, i).foreach { case (s, ss, cnt) =>
          sy += s; syy += ss; n += cnt
        }
        i += 1
      }
      if (n == 0)
        Array(0f, t.frameCount.toFloat, t.width.toFloat, t.height.toFloat,
          0f, 0f, durMs.toFloat, fps)
      else {
        val mean = sy / n
        val varL = math.max(0.0, syy / n - mean * mean)
        Array(1f, t.frameCount.toFloat, t.width.toFloat, t.height.toFloat,
          (mean / 255.0).toFloat, (math.sqrt(varL) / 255.0).toFloat,
          durMs.toFloat, fps)
      }
    }

  /** (sumGray, pixelCount) of one demuxed frame read from the RAW
    * decoded raster — EXACT integers for grayscale JPEG (no colorspace
    * pass: getRGB would map the linear-gray raster through the
    * linear→sRGB curve and destroy exactness). Multi-band frames fall
    * back to the Rec.601 integer luma over getRGB, ×1000 to stay
    * integral. Scale: gray frames return sum×1000 too, so callers
    * divide by 1000·count uniformly. */
  def frameGraySum(payload: Array[Byte], t: Mp4.VideoTrack,
      i: Int): Option[(Long, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(Mp4.sampleBytes(payload, t, i)))
      if (img == null) None
      else {
        val r = img.getRaster
        var s = 0L
        var y = 0
        if (r.getNumBands == 1) {
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { s += r.getSample(x, y, 0); x += 1 }
            y += 1
          }
          Some((s * 1000L, img.getWidth.toLong * img.getHeight))
        } else {
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              s += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          Some((s, img.getWidth.toLong * img.getHeight))
        }
      }
    } catch { case _: java.io.IOException => None }

  /** (sumLuma, sumLumaSq, pixelCount) of one demuxed frame, when its
    * sample bytes decode as an image (MJPEG). */
  def frameLuma(payload: Array[Byte], t: Mp4.VideoTrack,
      i: Int): Option[(Double, Double, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(Mp4.sampleBytes(payload, t, i)))
      if (img == null) None
      else {
        var sy = 0.0; var syy = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000.0
            sy += luma; syy += luma * luma
            x += 1
          }
          y += 1
        }
        Some((sy, syy, img.getWidth.toLong * img.getHeight))
      }
    } catch { case _: java.io.IOException => None }

  /** Real aspect-preserving re-encode for [[Multimodal.resizePlan]]'s
    * payload seam: decode, high-quality bilinear scale to (outW, outH),
    * re-encode PNG. Returns None when the payload isn't a decodable
    * image (callers keep the original bytes — same pass-through contract
    * as the stub). */
  def resizeImage(payload: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val dst = new java.awt.image.BufferedImage(outW, outH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, outW, outH, null)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        Some(out.toByteArray)
      }
    } catch { case _: java.io.IOException => None }
}

/** Minimal pure-Scala baseline-JPEG encoder for FLAT gray images whose
  * decode is EXACT by construction — the piece that upgrades the video
  * near-dup register row from rows-only to fully oracle-checkable.
  *
  * Why exact: a uniform 8x8 block has a single nonzero (DC) coefficient
  * S00 = 8·(level−128). With the DC quantum pinned to 8, the quantized
  * value is exactly level−128 (no rounding loss), and every conformant
  * decoder reconstructs the flat block as dequant/8 + 128 = level — the
  * DC-only IDCT path is exact integer arithmetic in libjpeg-family
  * decoders, so the JVM codec returns the encoded level bit-for-bit.
  * (An ImageIO-ENCODED gray JPEG, by contrast, rides the writer's
  * default quant tables and is only near-exact — the old rows-only
  * limitation.) Grayscale JPEG has no chroma, so getRGB replicates the
  * level into all three channels and the Rec.601 integer luma is the
  * level itself.
  *
  * Tables: standard Annex K DC luminance Huffman table; a minimal legal
  * one-entry AC table (just EOB, code '0'). All public-format knowledge
  * (ITU T.81). */
object FlatJpeg {
  /** Encode a w×h uniform `level` (0..255) grayscale baseline JPEG. */
  def encode(w: Int, h: Int, level: Int): Array[Byte] = {
    require(w > 0 && h > 0 && level >= 0 && level <= 255,
      s"flat jpeg: w=$w h=$h level=$level")
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    // SOI
    b(0xFF, 0xD8)
    // DQT: table 0, all quanta 8 (DC exactness needs only Q00 = 8)
    b(0xFF, 0xDB, 0x00, 0x43, 0x00)
    (0 until 64).foreach(_ => b(8))
    // SOF0: 8-bit, h×w, 1 component (id 1, 1x1 sampling, quant table 0)
    b(0xFF, 0xC0, 0x00, 0x0B, 0x08, h >> 8, h & 0xff, w >> 8, w & 0xff,
      0x01, 0x01, 0x11, 0x00)
    // DHT DC0: Annex K luminance (BITS 0,1,5,1,1,1,1,1,1,0..; vals 0..11)
    b(0xFF, 0xC4, 0x00, 0x1F, 0x00,
      0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    (0 to 11).foreach(b(_))
    // DHT AC0: one code — EOB as '0' (length 1); legal minimal table
    b(0xFF, 0xC4, 0x00, 0x14, 0x10,
      1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x00)
    // SOS: 1 component, DC/AC table 0, full spectral range
    b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00)
    // entropy-coded data: first block DC diff = level−128, rest diff 0;
    // every block ends with the 1-bit EOB
    var acc = 0L; var nbits = 0
    val stuffed = new java.io.ByteArrayOutputStream()
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nbits += len
      while (nbits >= 8) {
        val byte = ((acc >> (nbits - 8)) & 0xff).toInt
        stuffed.write(byte)
        if (byte == 0xff) stuffed.write(0x00)
        nbits -= 8
      }
    }
    // Annex K DC codes by category: 0→00, 1..5→010..110, 6→1110, 7→11110, 8→111110
    def dcCode(cat: Int): (Int, Int) =
      if (cat == 0) (0x0, 2)
      else if (cat <= 5) (cat + 1, 3)
      else (((1 << (cat - 2)) - 2), cat - 2) // 6→1110(4), 7→11110(5), 8→111110(6)
    def putDc(diff: Int): Unit = {
      var cat = 0; var m = math.abs(diff)
      while (m > 0) { cat += 1; m >>= 1 }
      val (c, l) = dcCode(cat)
      put(c, l)
      if (cat > 0) put(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
    }
    val blocks = ((w + 7) / 8) * ((h + 7) / 8)
    var k = 0
    while (k < blocks) {
      putDc(if (k == 0) level - 128 else 0)
      put(0x0, 1) // EOB
      k += 1
    }
    if (nbits > 0) put(0xff, 8 - nbits) // pad with 1s
    out.write(stuffed.toByteArray)
    // EOI
    b(0xFF, 0xD9)
    out.toByteArray
  }
}
