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
}
