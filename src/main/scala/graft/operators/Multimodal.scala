package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: opaque payload bytes + typed metadata. */
case class MmAsset(doc_id: Long, mime: String, payload: Array[Byte],
    width: Int, height: Int, duration_ms: Long)

/** Extracted features for one asset. */
case class MmFeatures(doc_id: Long, mime: String, n_bytes: Long,
    features: Array[Float])

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, processed partition-wise.
  *
  * Decode runs through the [[MediaCodec]] seam with two ends:
  * [[JdkMediaCodec]] REALLY decodes PNG/JPEG/BMP/GIF and WAV through the
  * JDK's own `javax.imageio` / `javax.sound.sampled` codecs (and really
  * re-encodes resized images, and demuxes MP4 through [[Mp4]] with real
  * pixel decode for MJPEG tracks); [[FakeDecoder]] derives deterministic
  * pseudo-features so the ORACLE queries stay exact on the synthetic
  * fixtures, whose payloads are text bytes, not media.
  *
  * SCALE: payloads stay opaque bytes end-to-end (never exploded into rows),
  * decode runs `mapPartitions` so a codec can amortize per-batch init
  * (model load, GPU context) across a partition, and assets are
  * repartitioned by doc_id so downstream joins against text/embedding
  * tables co-locate without a second shuffle.
  */
object Multimodal {

  /** Deterministic stand-in for a media decoder: hashes bytes into a
    * fixed-width vector so oracle queries can assert exact values on the
    * SYNTHETIC payloads (UTF-8 text bytes, not real media). The real end
    * of the same [[MediaCodec]] seam is [[JdkMediaCodec]], which decodes
    * actual PNG/JPEG/WAV payloads through the JDK's own codecs —
    * [[extractFeatures]] takes either. */
  object FakeDecoder extends MediaCodec {
    val Dim = 8
    def decode(a: MmAsset): MmFeatures = {
      val feats = Array.tabulate(Dim) { i =>
        var h = 1125899906842597L + i * 2654435761L
        var j = 0
        while (j < a.payload.length) { h = 31 * h + a.payload(j); j += 1 }
        ((h % 1000L).toFloat) / 1000.0f
      }
      MmFeatures(a.doc_id, a.mime, a.payload.length.toLong, feats)
    }
  }

  /** Wrap the documents table as fake multimodal assets: payload = UTF-8
    * bytes of the text, metadata derived deterministically from doc_id. */
  def assets(spark: SparkSession, docs: DataFrame): Dataset[MmAsset] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      (col("doc_id") * 33 % 90000).as("duration_ms"))
      .as[MmAsset]
  }

  /** Deterministic REAL video assets derived from doc_id: `doc_id % 3 + 1`
    * solid-gray 8x8 JPEG frames (level `(doc_id*37 + i*41) % 256`), 100 ms
    * each, muxed into a valid MP4 through [[Mp4.mux]]. Unlike [[assets]]
    * (opaque fake payloads for the stub/oracle path), these payloads the
    * REAL codec demuxes and pixel-decodes — they drive the video path in
    * driver-checked queries (q97), where the frame/timestamp/sample
    * mapping and the decoded flag are exactly oracle-able even though
    * JPEG luma is only near-exact. Encode is per-row CPU on executors. */
  def mjpegAssets(spark: SparkSession, docs: DataFrame): Dataset[MmAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val n = (id % 3 + 1).toInt
      val frames = (0 until n).map(i => grayJpeg(8, 8, ((id * 37 + i * 41) % 256).toInt))
      MmAsset(id, "video/mp4", Mp4.mux(frames, 8, 8, frameDurMs = 100), 8, 8, n * 100L)
    }
  }

  private def grayJpeg(w: Int, h: Int, level: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (level << 16) | (level << 8) | level
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Partition-wise feature extraction through the decoder seam.
    * `mapPartitions` is deliberate: a codec amortizes per-partition init
    * (native buffers, model load) across the batch. Default codec is the
    * deterministic stub (the oracle fixtures are synthetic bytes); pass
    * [[JdkMediaCodec]] for real PNG/JPEG/WAV decode. */
  def extractFeatures(spark: SparkSession, assets: Dataset[MmAsset],
      partitions: Int = 0, codec: MediaCodec = FakeDecoder): Dataset[MmFeatures] = {
    import spark.implicits._
    val parted = if (partitions > 0) assets.repartition(partitions, col("doc_id")) else assets
    parted.mapPartitions(it => it.map(codec.decode))
  }

  /** Aspect-preserving resize PLAN for image assets: the target geometry
    * (scale factor, output dims) is computed as deterministic column
    * arithmetic — per-row, shuffle-free, oracle-checkable — and the pixel
    * transform itself is the stub seam (payload passes through; a real
    * impl maps it through the codec with the computed dims). Never
    * upscales; dims floor to >= 1. */
  def resizePlan(assets: DataFrame, maxSide: Int): DataFrame = {
    val f = least(lit(1.0), lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    assets.where(col("mime") === "image/png")
      .select(col("doc_id"), col("width"), col("height"),
        greatest(lit(1L), floor(col("width") * f)).as("out_w"),
        greatest(lit(1L), floor(col("height") * f)).as("out_h"),
        col("payload")) // stub: a codec would re-encode to (out_w, out_h)
  }

  /** Executes [[resizePlan]]'s payload seam with the REAL codec: each
    * image payload is re-encoded to its computed (out_w, out_h) via
    * [[JdkMediaCodec.resizeImage]]; payloads the codec can't decode pass
    * through unchanged (the stub's contract). Pure per-row CPU in
    * `mapPartitions` — the plan's geometry columns stay oracle-checkable,
    * the pixel work stays distributed. */
  def applyResize(spark: SparkSession, plan: DataFrame): DataFrame = {
    import spark.implicits._
    plan.select(col("doc_id"), col("out_w"), col("out_h"), col("payload"))
      .as[(Long, Long, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, w, h, p) =>
        (id, w, h, JdkMediaCodec.resizeImage(p, w.toInt, h.toInt).getOrElse(p))
      })
      .toDF("doc_id", "out_w", "out_h", "payload")
  }

  /** Frame-sampling PLAN for video assets: one row per sampled frame every
    * `everyMs` milliseconds of the clip (frame 0 always included, bounds
    * inclusive). Pure generate — the row explosion, timestamps and frame
    * indices are real Spark plumbing; grabbing the frame bytes at ts_ms is
    * the codec stub seam. */
  def frameSamplePlan(assets: DataFrame, everyMs: Int): DataFrame =
    assets.where(col("mime") === "video/mp4")
      .select(col("doc_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs.toLong))).as("ts_ms"))
      .select(col("doc_id"), (col("ts_ms") / everyMs).cast("long").as("frame_idx"),
        col("ts_ms"))

  /** Executes [[frameSamplePlan]]'s grab-the-frame seam with the REAL
    * [[Mp4]] demuxer: each video payload's sample tables are parsed once
    * per asset, each sampled timestamp maps to the last frame at-or-before
    * it, and MJPEG frames additionally pixel-decode to a luma mean
    * (`decoded`=1). Assets that aren't parseable MP4 are dropped — same
    * contract as a codec rejecting a corrupt clip. The clip's own duration
    * (from the demuxed media header, not the metadata column) bounds the
    * sweep — CLAMPED to the stts-derived content end: the mdhd duration is
    * untrusted input, and a hostile container (timescale=1, duration=2^32)
    * would otherwise generate billions of rows per asset from a
    * kilobyte payload. `maxFrames` additionally hard-caps sampled rows per
    * asset (a legitimate 10 h clip at 100 ms sampling is 360k frames — the
    * default cap admits it; anything past the cap is truncated, which at
    * pipeline scale is a sampling-density decision, not data loss).
    * Per-asset CPU inside `mapPartitions`; the payload is demuxed once for
    * all of its sampled frames, and the frame lookup per timestamp is a
    * binary search. */
  def applyFrameSample(spark: SparkSession, assets: Dataset[MmAsset],
      everyMs: Int, maxFrames: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    assets.filter(col("mime") === "video/mp4")
      .mapPartitions(_.flatMap { a =>
        Mp4.demux(a.payload).toSeq.flatMap { t =>
          val endMs = math.min(t.durationMs, t.contentEndMs)
          val sweep = (0L to endMs by everyMs.toLong).take(maxFrames)
          sweep.map { ts =>
            val si = t.sampleAt(ts)
            val luma = JdkMediaCodec.frameLuma(a.payload, t, si)
            (a.doc_id, ts / everyMs, ts, si,
              luma.map { case (s, _, n) => s / n / 255.0 }.getOrElse(0.0),
              if (luma.isDefined) 1 else 0)
          }
        }
      })
      .toDF("doc_id", "frame_idx", "ts_ms", "sample_idx", "mean_luma", "decoded")
  }
}
