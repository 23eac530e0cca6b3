package graft

import graft.operators.{JdkMediaCodec, MmAsset, Multimodal}
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real-decode path: the JDK's own codecs through the [[MediaCodec]] seam,
  * on deterministic fixtures generated in-test (no media files needed). */
class MediaCodecSpec extends GraftSpec {
  import spark.implicits._

  /** Solid-color PNG, w x h, encoded with the JDK encoder. */
  private def png(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** 16-bit mono PCM WAV: square wave alternating +/-16384 (= 0.5 full
    * scale) each sample — every statistic has a closed form. */
  private def wav(nSamples: Int, sampleRate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    (0 until nSamples).foreach { i =>
      val s: Short = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (s & 0xff).toByte        // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("PNG decodes to exact channel means and zero luma variance") {
    val f = JdkMediaCodec.decode(
      MmAsset(1L, "image/png", png(64, 48, 200, 100, 50), 64, 48, 0L)).features
    assert(f(0) == 1f, "real decode must run")
    assert(f(1) == 64f && f(2) == 48f)
    assert(math.abs(f(3) - 200f / 255f) < 1e-6)
    assert(math.abs(f(4) - 100f / 255f) < 1e-6)
    assert(math.abs(f(5) - 50f / 255f) < 1e-6)
    val luma = (299 * 200 + 587 * 100 + 114 * 50) / 1000.0 / 255.0
    assert(math.abs(f(6) - luma) < 1e-6)
    assert(f(7) == 0f, "solid color has zero luma std")
  }

  test("WAV decodes to exact amplitude statistics") {
    val f = JdkMediaCodec.decode(
      MmAsset(2L, "audio/wav", wav(4000), 0, 0, 500L)).features
    assert(f(0) == 1f)
    assert(f(1) == 8000f && f(2) == 1f && f(3) == 4000f)
    assert(math.abs(f(4) - 0.5f) < 1e-4, s"meanAbs ${f(4)}")
    assert(math.abs(f(5) - 0.5f) < 1e-4, s"rms ${f(5)}")
    assert(math.abs(f(6) - 3999f / 4000f) < 1e-4, s"zcr ${f(6)}")
    assert(math.abs(f(7) - 0.5f) < 1e-4, s"peak ${f(7)}")
  }

  test("audio frames: stereo WAV is rejected, not interleaved into mono") {
    // a stereo stream read as mono would double the apparent sample count
    // and interleave channels — wavSamples must return None instead, so
    // the frame pipeline emits nothing for it
    val nFrames = 400
    val pcm = new Array[Byte](nFrames * 2 * 2)
    (0 until nFrames * 2).foreach { i => // L/R interleaved square wave
      val s: Short = if (i % 4 < 2) 16384 else -16384
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val assets = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
    assert(Multimodal.applyAudioFrames(spark, assets, 25, 10).count() == 0L,
      "stereo payload must decode to None, not garbage frames")
  }

  test("undecodable payloads fall back to byte stats, flagged as such") {
    val f = JdkMediaCodec.decode(
      MmAsset(3L, "video/mp4", Array[Byte](1, 2, 3, 4), 0, 0, 0L)).features
    assert(f(0) == 0f, "fallback must not claim a real decode")
    assert(f(1) == 4f)
    val garbagePng = JdkMediaCodec.decode(
      MmAsset(4L, "image/png", Array[Byte](9, 9, 9), 0, 0, 0L)).features
    assert(garbagePng(0) == 0f)
  }

  test("distributed extractFeatures with the real codec end-to-end") {
    val assets = Seq(
      MmAsset(1L, "image/png", png(16, 16, 255, 0, 0), 16, 16, 0L),
      MmAsset(2L, "image/png", png(8, 8, 0, 0, 255), 8, 8, 0L),
      MmAsset(3L, "audio/wav", wav(800), 0, 0, 100L),
      MmAsset(4L, "video/mp4", Array[Byte](7, 7), 0, 0, 1000L)).toDS()
    val got = Multimodal
      .extractFeatures(spark, assets, partitions = 2, codec = JdkMediaCodec)
      .collect().map(f => f.doc_id -> f).toMap
    assert(got(1L).features(3) > 0.99f && got(1L).features(5) < 0.01f)
    assert(got(2L).features(5) > 0.99f && got(2L).features(3) < 0.01f)
    assert(got(3L).features(0) == 1f && got(3L).features(1) == 8000f)
    assert(got(4L).features(0) == 0f)
    assert(got.values.forall(_.features.length == JdkMediaCodec.Dim))
  }

  /** JPEG of one solid gray level (r=g=b): chroma is constant and luma is
    * spatially flat, so even the lossy codec round-trips the level to
    * within quantization error — closed-form enough for tight bounds. */
  private def jpegGray(w: Int, h: Int, level: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (level << 16) | (level << 8) | level
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** 3-frame MJPEG MP4, 200 ms per frame, gray levels 64/128/192. */
  private def mjpeg(w: Int = 32, h: Int = 24): Array[Byte] =
    graft.operators.Mp4.mux(
      Seq(jpegGray(w, h, 64), jpegGray(w, h, 128), jpegGray(w, h, 192)),
      w, h, frameDurMs = 200)

  test("MJPEG MP4 demuxes to the muxed sample table and really pixel-decodes") {
    val clip = mjpeg()
    val t = graft.operators.Mp4.demux(clip).get
    assert(t.codec == "jpeg" && t.frameCount == 3)
    assert(t.width == 32 && t.height == 24)
    assert(t.durationMs == 600L && t.sampleTimes.toSeq == Seq(0L, 200L, 400L))
    // per-frame pixel decode recovers each frame's gray level
    val lumas = (0 until 3).map { i =>
      val (s, _, n) = JdkMediaCodec.frameLuma(clip, t, i).get
      s / n
    }
    assert(math.abs(lumas(0) - 64) < 2 && math.abs(lumas(1) - 128) < 2 &&
      math.abs(lumas(2) - 192) < 2, s"lumas $lumas")

    val f = JdkMediaCodec.decode(MmAsset(5L, "video/mp4", clip, 32, 24, 600L)).features
    assert(f(0) == 1f, "MJPEG must count as a real decode")
    assert(f(1) == 3f && f(2) == 32f && f(3) == 24f)
    assert(math.abs(f(4) - 128f / 255f) < 0.01f, s"mean luma ${f(4)}")
    assert(f(6) == 600f && math.abs(f(7) - 5f) < 1e-4, "duration + fps from mdhd/stts")
  }

  test("an undecodable-codec track still demuxes real container stats, decoded=0") {
    // same container, but the sample entry claims avc1 and the samples are
    // not JPEGs -> demux succeeds, pixel decode honestly refuses
    val clip = graft.operators.Mp4.mux(
      Seq(Array[Byte](0, 0, 0, 1, 0x65), Array[Byte](0, 0, 0, 1, 0x41)),
      640, 360, frameDurMs = 40, codec = "avc1")
    val t = graft.operators.Mp4.demux(clip).get
    assert(t.codec == "avc1" && t.frameCount == 2 && t.width == 640)
    val f = JdkMediaCodec.decode(MmAsset(6L, "video/mp4", clip, 640, 360, 80L)).features
    assert(f(0) == 0f, "no JDK H.264 codec: must not claim pixel decode")
    assert(f(1) == 2f && f(2) == 640f && f(3) == 360f && f(6) == 80f)
  }

  test("applyFrameSample decodes the frame at each sampled timestamp, distributed") {
    val assets = Seq(
      MmAsset(20L, "video/mp4", mjpeg(), 32, 24, 600L),
      MmAsset(21L, "video/mp4", Array[Byte](9, 9, 9), 0, 0, 500L)).toDS()
    val rows = Multimodal.applyFrameSample(spark, assets, everyMs = 250)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getDouble(4), r.getInt(5)))
      .sortBy(r => (r._1, r._2))
    // corrupt clip dropped; 600ms clip sampled at 0/250/500 -> frames 0/1/2
    assert(rows.map(_._1).distinct.toSeq == Seq(20L))
    assert(rows.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 0L, 0), (1L, 250L, 1), (2L, 500L, 2)))
    assert(rows.forall(_._6 == 1), "MJPEG frames must really decode")
    val got = rows.map(_._5)
    assert(math.abs(got(0) - 64.0 / 255) < 0.01 && math.abs(got(1) - 128.0 / 255) < 0.01 &&
      math.abs(got(2) - 192.0 / 255) < 0.01, s"per-frame lumas ${got.toSeq}")
  }

  test("property: mux -> demux recovers the exact sample table for random clips") {
    import org.scalacheck.Gen
    val genClip = for {
      n <- Gen.choose(1, 6)
      sizes <- Gen.listOfN(n, Gen.choose(1, 200))
      w <- Gen.choose(1, 1920)
      h <- Gen.choose(1, 1080)
      dur <- Gen.choose(1, 2000)
      codec <- Gen.oneOf("jpeg", "avc1", "mjpa")
      seed <- Gen.choose(0, 1000000)
      co64 <- Gen.oneOf(false, true)
    } yield (sizes, w, h, dur, codec, seed, co64)
    Gen.listOfN(40, genClip).sample.get.foreach {
      case (sizes, w, h, dur, codec, seed, co64) =>
        val rng = new scala.util.Random(seed)
        val frames = sizes.map { s =>
          val b = new Array[Byte](s); rng.nextBytes(b); b
        }
        val clip = graft.operators.Mp4.mux(frames, w, h, dur, codec,
          use64BitOffsets = co64)
        val t = graft.operators.Mp4.demux(clip)
          .getOrElse(fail(s"demux failed for $codec n=${sizes.length}"))
        assert(t.codec == codec && t.width == w && t.height == h)
        assert(t.frameCount == frames.length)
        assert(t.sampleSizes.toSeq == sizes)
        assert(t.durationMs == frames.length.toLong * dur)
        assert(t.sampleTimes.toSeq ==
          frames.indices.map(_.toLong * dur), "stts expansion")
        frames.indices.foreach { i =>
          assert(java.util.Arrays.equals(
            graft.operators.Mp4.sampleBytes(clip, t, i), frames(i)),
            s"sample $i bytes must round-trip exactly")
        }
    }
  }

  test("hostile mdhd duration cannot explode the frame-sample sweep") {
    // take a valid 3-frame clip and patch its mdhd to timescale=1,
    // duration=2^31-1 — the untrusted header now claims ~68 years of
    // content while the stts sample table still holds 3 frames
    val clip = mjpeg()
    val idx = clip.indices.find(i => i + 4 <= clip.length &&
      new String(clip, i, 4, "ISO-8859-1") == "mdhd").get
    val p = idx + 4 // mdhd payload: ver/flags(4) created(4) modified(4) ts(4) dur(4)
    val bb = java.nio.ByteBuffer.wrap(clip).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(p + 12, 1)
    bb.putInt(p + 16, Int.MaxValue)
    val t = graft.operators.Mp4.demux(clip).get
    assert(t.durationMs == Int.MaxValue.toLong * 1000L, "mdhd read as claimed")
    // content end derives from the stts table, not the hostile header:
    // last start 400 (timescale units) + delta 200, over timescale 1 -> 600000 ms
    assert(t.contentEndMs == 600000L, s"contentEndMs ${t.contentEndMs}")
    val assets = Seq(MmAsset(30L, "video/mp4", clip, 32, 24, 0L)).toDS()
    val capped = Multimodal.applyFrameSample(spark, assets, everyMs = 250,
      maxFrames = 16).collect()
    assert(capped.length == 16, s"cap must bound rows, got ${capped.length}")
    val uncapped = Multimodal.applyFrameSample(spark, assets, everyMs = 250)
      .count()
    assert(uncapped == 600000L / 250 + 1,
      s"sweep must clamp to the sample-table content end, got $uncapped")
  }

  test("demux rejects malformed containers instead of throwing") {
    val clip = graft.operators.Mp4.mux(
      Seq(Array[Byte](1, 2, 3)), 8, 8, 100)
    // truncations at every prefix length must return None, never throw
    (0 until clip.length by 7).foreach { cut =>
      graft.operators.Mp4.demux(java.util.Arrays.copyOf(clip, cut))
    }
    // bit flips in the box headers must not throw either
    (0 until math.min(clip.length, 64)).foreach { i =>
      val mut = clip.clone(); mut(i) = (mut(i) ^ 0x5a).toByte
      graft.operators.Mp4.demux(mut)
    }
    assert(graft.operators.Mp4.demux(Array.emptyByteArray).isEmpty)
  }

  test("applyResize re-encodes images to the plan's computed geometry") {
    val assets = Seq(
      MmAsset(10L, "image/png", png(64, 48, 10, 200, 30), 64, 48, 0L)).toDS()
    val plan = Multimodal.resizePlan(assets.toDF(), maxSide = 32)
    val out = Multimodal.applyResize(spark, plan).collect()
    assert(out.length == 1)
    val row = out(0)
    assert(row.getLong(1) == 32L && row.getLong(2) == 24L)
    val img = ImageIO.read(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("payload")))
    assert(img.getWidth == 32 && img.getHeight == 24)
    // bilinear resize of a solid color stays that color
    val rgb = img.getRGB(16, 12)
    assert(((rgb >> 16) & 0xff) == 10 && ((rgb >> 8) & 0xff) == 200 && (rgb & 0xff) == 30)
  }

  test("audio frames: plan geometry == executed geometry; closed-form rms") {
    import org.apache.spark.sql.functions.col
    // square wave +/-16384: every frame's rms is exactly 16384
    val assets = Seq((1L, 8000, 800L, wav(800)), (2L, 8000, 100L, wav(100)))
      .toDF("doc_id", "sample_rate", "n_samples", "payload")
    val plan = Multimodal.audioFramePlan(assets, frameMs = 25, hopMs = 10)
      .select("doc_id", "frame_idx", "start_sample")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Multimodal.applyAudioFrames(spark, assets, frameMs = 25, hopMs = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSet == plan,
      "the plan's generate and the codec execution must frame identically")
    // doc 2 is shorter than one 200-sample frame -> no rows
    assert(got.forall(_._1 == 1L))
    // (800 - 200) / 80 + 1 = 8 frames, each rms exactly 16384 (square wave)
    assert(got.length == 8 && got.forall(_._4 == 16384.0), s"got ${got.toSeq}")
  }

  test("FlatJpeg: every level 0..255 decodes EXACTLY (raw raster), " +
      "multi-block and partial-block dims included") {
    def allGray(img: java.awt.image.BufferedImage, v: Int): Boolean =
      (0 until img.getHeight).forall(y => (0 until img.getWidth)
        .forall(x => img.getRaster.getSample(x, y, 0) == v))
    for (level <- 0 to 255) {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(
        graft.operators.FlatJpeg.encode(8, 8, level)))
      assert(img != null && allGray(img, level), s"level $level inexact")
    }
    for ((w, h) <- Seq((16, 16), (10, 6), (24, 8))) {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(
        graft.operators.FlatJpeg.encode(w, h, 137)))
      assert(img != null && img.getWidth == w && img.getHeight == h &&
        allGray(img, 137), s"dims ($w,$h) inexact")
    }
  }

  test("video luma signature equals the closed-form doc_id formula " +
      "(the q421 oracle's premise) on FlatJpeg motif assets") {
    import graft.operators.Multimodal
    val docs = spark.range(0, 40)
      .select(org.apache.spark.sql.functions.col("id").as("doc_id"))
    val sig = Multimodal.videoLumaSig(spark,
      Multimodal.vidMotifAssets(spark, docs))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](2)))
    assert(sig.length == 40)
    sig.foreach { case (id, lumas) =>
      val n = 2 + (id % 2).toInt
      val want = (0 until n).map { i =>
        val base = ((id % 7) * 29 + i * 41) % 256
        if (id % 4 == 0 && i == 0) base + 1 else base
      }
      assert(lumas == want, s"doc $id: $lumas != $want")
    }
  }
}
