package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
    * JPEG luma is only near-exact. Encode is per-row CPU on executors.
    * Memoized per (session, source plan) like [[pngAssets]]: the
    * JPEG-encode + mux churn was the whole q97 bench drift (r12's
    * 0.69 → 1.16 s regression reproduced as JIT/GC noise of the
    * per-sample ASSET BUILD, not the measured decode path). */
  private val mjpegCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int), Dataset[MmAsset]]

  def mjpegAssets(spark: SparkSession, docs: DataFrame): Dataset[MmAsset] =
    mjpegCache.computeIfAbsent(
      (spark, docs.queryExecution.analyzed.semanticHash()), _ => {
        import spark.implicits._
        docs.select(col("doc_id")).as[Long].map { id =>
          val n = (id % 3 + 1).toInt
          val frames = (0 until n).map(i =>
            grayJpeg(8, 8, ((id * 37 + i * 41) % 256).toInt))
          MmAsset(id, "video/mp4", Mp4.mux(frames, 8, 8, frameDurMs = 100),
            8, 8, n * 100L)
        }.localCheckpoint()
      })

  /** Deterministic REAL video assets with MOTIFS — the video twin of
    * [[pngAssets]]' planted near-dup groups: 2 + (id % 2) uniform-gray
    * 8×8 JPEG frames, frame i at level (g·29 + i·41) mod 256 with
    * g = doc_id % 7, plus a +1 perturbation of frame 0 when
    * doc_id % 4 == 0 (motif frame-0 levels sit 29 apart, so a ±2 luma
    * tolerance never crosses motifs). Same (motif, parity, perturbed)
    * assets are BYTE-identical MP4s; the perturbed variant differs by
    * one quantized DC step the decoder reproduces within ~1 luma.
    * Memoized like [[mjpegAssets]]. */
  private val vidMotifCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int), Dataset[MmAsset]]

  def vidMotifAssets(spark: SparkSession, docs: DataFrame): Dataset[MmAsset] =
    vidMotifCache.computeIfAbsent(
      (spark, docs.queryExecution.analyzed.semanticHash()), _ => {
        import spark.implicits._
        docs.select(col("doc_id")).as[Long].map { id =>
          val g = (id % 7).toInt
          val n = 2 + (id % 2).toInt
          val frames = (0 until n).map { i =>
            val base = (g * 29 + i * 41) % 256
            // FlatJpeg, not the ImageIO writer: flat blocks under the
            // DC-8 quant table decode EXACTLY to the encoded level, so
            // the downstream luma signature is the closed-form function
            // of doc_id the SQL oracle replays (was rows-only).
            FlatJpeg.encode(8, 8,
              if (id % 4 == 0 && i == 0) base + 1 else base)
          }
          MmAsset(id, "video/mp4", Mp4.mux(frames, 8, 8, frameDurMs = 100),
            8, 8, n * 100L)
        }.localCheckpoint()
      })

  /** Per-frame REAL decoded mean-luma signature of every video sample:
    * one mapPartitions pass over the asset table — demux (real ISO-BMFF
    * sample tables), pixel-decode every MJPEG frame, round its mean
    * gray level to the nearest integer. Scan-speed, shuffle-free;
    * downstream dedup operates on the integer sequences, never pixels.
    * Reads the RAW raster (not getRGB — the linear→sRGB colorspace pass
    * would bend the values), so for [[FlatJpeg]] fixtures the signature
    * equals the encoded level EXACTLY and the register row carries a
    * full SQL oracle (upgraded from the r13 rows-only class). */
  def videoLumaSig(spark: SparkSession, assets: Dataset[MmAsset]): DataFrame = {
    import spark.implicits._
    assets.filter(col("mime") === "video/mp4")
      .mapPartitions(_.map { a =>
        val t = Mp4.demux(a.payload).get
        val lumas = (0 until t.frameCount).map { i =>
          JdkMediaCodec.frameGraySum(a.payload, t, i)
            .map { case (s, n) => math.round(s / (1000.0 * n)) }
            .getOrElse(-1L)
        }
        (a.doc_id, t.frameCount, lumas)
      })
      .toDF("doc_id", "n_frames", "lumas")
  }

  /** Blocked video near-dup pairs over [[videoLumaSig]] signatures:
    * candidates come from a TWO-PROBE bucket key (n_frames is implicit
    * via the framewise compare; bucket = frame-0 luma / 8 and its
    * successor, so any pair within tolerance shares ≥ 1 bucket), the
    * verify is the exact framewise max-|Δ| fold — never all-pairs;
    * candidate mass is bucket-bounded exactly like the SRP/Manku
    * pairings. */
  def videoNearDupPairs(sig: DataFrame, tol: Int = 2): DataFrame = {
    val bkt = floor(element_at(col("lumas"), 1).cast("double") / 8.0)
      .cast("long")
    val keyed = sig.select(col("doc_id"), col("n_frames"), col("lumas"),
      explode(array(bkt, bkt + 1)).as("bkt"))
    val l = keyed.select(col("bkt"), col("doc_id").as("id_a"),
      col("n_frames").as("na"), col("lumas").as("la"))
    val r = keyed.select(col("bkt"), col("doc_id").as("id_b"),
      col("n_frames").as("nb"), col("lumas").as("lb"))
    l.join(r, Seq("bkt"))
      .where(col("id_a") < col("id_b") && col("na") === col("nb"))
      .select(col("id_a"), col("id_b"), col("na").as("n_frames"),
        aggregate(zip_with(col("la"), col("lb"),
          (x, y) => abs(x - y)), lit(0L),
          (m, v) => greatest(m, v)).as("max_dluma"))
      .where(col("max_dluma") <= tol)
      .distinct()
  }

  /** Deterministic REAL audio assets derived from doc_id: 16-bit mono
    * 8 kHz PCM WAVs whose sample i is the integer pseudo-noise
    * `((i·31 + 7) mod 201 − 100)·50` — SQL-reproducible, so frame
    * energies are exactly oracle-able — with doc-dependent length
    * `100` (shorter than one analysis frame: emits no frames) when
    * `doc_id % 5 = 0`, else `400 + (doc_id % 5)·300`. Encode is per-row
    * CPU on executors through the real `javax.sound` writer.
    * Memoized per (session, source plan) like [[pngAssets]] — same
    * synthetic-asset-vs-measured-path argument (q135/q149). */
  private val pcmCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int), DataFrame]

  def pcmAssets(spark: SparkSession, docs: DataFrame): DataFrame =
    pcmCache.computeIfAbsent(
      (spark, docs.queryExecution.analyzed.semanticHash()),
      _ => buildPcmAssets(spark, docs).localCheckpoint())

  private def buildPcmAssets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val n = if (id % 5 == 0) 100 else (400 + (id % 5) * 300).toInt
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = (((i * 31 + 7) % 201 - 100) * 50).toShort
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      (id, 8000, n.toLong, out.toByteArray)
    }.toDF("doc_id", "sample_rate", "n_samples", "payload")
  }

  /** Deterministic REAL image assets: 16x16 grayscale PNGs whose pixel
    * (x, y) is the SQL-reproducible integer
    * `((x+1)(g+3)·7 + (y+1)(g+5)·11) mod 256` with g = doc_id % 7 (seven
    * structural "motifs"), plus a +8 perturbation of pixel (0,0) when
    * doc_id % 4 == 0 (no mod-wrap: the base of (0,0) is 18g+76 <= 202) —
    * planted exact-and-near duplicate groups. PNG is LOSSLESS, so the
    * real `javax.imageio` decode returns these integers exactly and the
    * whole downstream hash is oracle-able. Encode is per-row CPU on
    * executors.
    *
    * The built asset table is MEMOIZED per (session, source plan) as a
    * localCheckpoint: the per-row PNG encode is JIT/GC-bound synthetic
    * asset construction, not engine work, and re-paying it on every
    * bench sample made q147's three samples spread 4.2–8.9 s (r12
    * verdict task #7). Real corpora read binary payloads from parquet —
    * a scan — so caching the synthetic stand-in restores the honest
    * measured shape (the hash path). Bounded: one entry per distinct
    * source plan; blocks are row-count-sized (16x16 PNGs) and live for
    * the session. */
  private val assetCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int), DataFrame]

  def pngAssets(spark: SparkSession, docs: DataFrame): DataFrame =
    assetCache.computeIfAbsent(
      (spark, docs.queryExecution.analyzed.semanticHash()),
      _ => buildPngAssets(spark, docs).localCheckpoint())

  private def buildPngAssets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val g = (id % 7).toInt
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          var v = ((x + 1) * (g + 3) * 7 + (y + 1) * (g + 5) * 11) % 256
          if (id % 4 == 0 && x == 0 && y == 0) v += 8
          r.setSample(x, y, 0, v)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      (id, out.toByteArray)
    }.toDF("doc_id", "payload")
  }

  /** Average-hash (aHash) perceptual fingerprint over REAL decoded
    * pixels: grid x grid block sums vs the global sum, bit b set iff
    * blockSum * grid^2 > totalSum — the mean comparison cleared of
    * divisions, so every bit is an exact integer compare reproducible
    * from the pixel formula. Output is the bit STRING (row-major blocks)
    * — engine-portable, no 64-bit sign traps. Near-identical images
    * (small local edits) agree on almost all bits; hamming distance over
    * these strings is the standard image near-dup signal, bucketable by
    * the same Manku block-combination machinery as SimHash.
    *
    * SCALE: decode + hash run in `mapPartitions` (codec-init pattern);
    * one pass per asset, no shuffle — the hash is scan-speed over the
    * asset table and downstream dedup operates on 64-char strings, never
    * pixels. */
  def imageAHash(spark: SparkSession, assets: DataFrame, grid: Int = 8): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val (w, h) = (img.getWidth, img.getHeight)
          val (bw, bh) = (w / grid, h / grid)
          val raster = img.getRaster
          val sums = new Array[Long](grid * grid)
          var total = 0L
          var y = 0
          while (y < grid * bh) {
            var x = 0
            while (x < grid * bw) {
              val v = raster.getSample(x, y, 0).toLong
              sums((y / bh) * grid + (x / bw)) += v
              total += v
              x += 1
            }
            y += 1
          }
          val bits = new Array[Char](grid * grid)
          var b = 0
          while (b < grid * grid) {
            bits(b) = if (sums(b) * grid * grid > total) '1' else '0'
            b += 1
          }
          (id, new String(bits))
        }
      }.toDF("doc_id", "ahash")
  }

  /** Orthonormal DCT-II basis, quantized: entry (u, x) =
    * round(α(u)·cos((2x+1)uπ/2n)·10⁶) with α(0)=√(1/n), α(k)=√(2/n) —
    * the normalization FOLDED INTO the table so downstream coefficient
    * arithmetic is pure integer. The same integer table is embedded
    * verbatim in the q418 oracle SQL (literal VALUES), so Spark and
    * DuckDB fold the exact same numbers and the hash is bit-replayable
    * cross-engine. Computed once driver-side; java.lang.Math only. */
  def dctTableQ6(n: Int): Array[Array[Long]] =
    Array.tabulate(n, n) { (u, x) =>
      val a = if (u == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      math.round(a * math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)) * 1e6)
    }

  /** DCT perceptual hash (pHash) over REAL decoded pixels — the
    * frequency-domain companion to [[imageAHash]]'s spatial mean hash:
    * bits encode LOW-FREQUENCY structure, so localized high-frequency
    * edits that push a block mean across aHash's threshold barely move
    * any kept coefficient. 2-D DCT-II
    * of the 16×16 grayscale plane through the quantized [[dctTableQ6]]
    * basis, keep the top-left keep×keep low-frequency block, threshold
    * every coefficient against the MEDIAN of the 63 non-DC coefficients
    * (order statistic 32 — exact integer compare, no division anywhere).
    * Coefficient magnitude is bounded by maxPixel·(Σ|c_u|)² ≈ 8.4·10¹⁵,
    * inside Long.
    *
    * SCALE: decode + DCT + threshold run per row in `mapPartitions` —
    * one pass, no shuffle, 64-char signatures out; near-dup pairing
    * rides [[graft.operators.Dedup.hammingPairs]] like q148. */
  def imagePHash(spark: SparkSession, assets: DataFrame,
      keep: Int = 8): DataFrame = {
    import spark.implicits._
    val tb = dctTableQ6(16)
    assets.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val raster = img.getRaster
          val p = Array.tabulate(16, 16)((x, y) =>
            raster.getSample(x, y, 0).toLong)
          val k = new Array[Long](keep * keep)
          var u = 0
          while (u < keep) {
            var v = 0
            while (v < keep) {
              var s = 0L
              var x = 0
              while (x < 16) {
                var y = 0
                while (y < 16) {
                  s += p(x)(y) * tb(u)(x) * tb(v)(y)
                  y += 1
                }
                x += 1
              }
              k(u * keep + v) = s
              v += 1
            }
            u += 1
          }
          val rest = java.util.Arrays.copyOfRange(k, 1, keep * keep)
          java.util.Arrays.sort(rest)
          val med = rest((keep * keep - 2) / 2)
          val bits = new Array[Char](keep * keep)
          var b = 0
          while (b < keep * keep) {
            bits(b) = if (k(b) > med) '1' else '0'
            b += 1
          }
          (id, new String(bits))
        }
      }.toDF("doc_id", "phash")
  }

  /** Deterministic REAL audio assets with MOTIFS: 1625-sample (65 frames
    * of 25) 16-bit mono 8 kHz WAVs whose sample i is the SQL-reproducible
    * integer `((i·31 + 7 + g·13) mod 201 − 100)·50` with g = doc_id % 7,
    * plus a +50 perturbation of sample 0 when doc_id % 4 == 0 — the audio
    * twin of [[pngAssets]]' planted near-dup groups. Encode is per-row
    * CPU on executors through the real `javax.sound` writer. */
  def pcmMotifAssets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val g = (id % 7).toInt
      val n = 1625
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        var s = ((i * 31 + 7 + g * 13) % 201 - 100) * 50
        if (id % 4 == 0 && i == 0) s += 50
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      (id, out.toByteArray)
    }.toDF("doc_id", "payload")
  }

  /** Audio energy-delta fingerprint over REAL WAV decode (the classic
    * Haitsma-Kalker shape reduced to one band): 65 frames of 25 samples,
    * e_k = Σ s² exact in integer arithmetic, bit k set iff
    * e_{k+1} > e_k — 64 exact integer compares the oracle reproduces
    * from the sample formula. Output is the 64-char bit string, routed
    * to near-dup pairing by the same [[Dedup.hammingPairs]] machinery as
    * SimHash and the image aHash.
    *
    * SCALE: decode + fingerprint is one `mapPartitions` pass (codec-init
    * pattern), no shuffle; downstream dedup never touches samples. */
  def audioFingerprint(spark: SparkSession, assets: DataFrame,
      frameLen: Int = 25, nBits: Int = 64): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val fp = JdkMediaCodec.wavSamples(bytes) match {
            case Some((_, samples)) if samples.length >= (nBits + 1) * frameLen =>
              val e = Array.tabulate(nBits + 1) { k =>
                var s = 0L
                var i = k * frameLen
                while (i < (k + 1) * frameLen) {
                  s += samples(i).toLong * samples(i); i += 1
                }
                s
              }
              val bits = new Array[Char](nBits)
              var k = 0
              while (k < nBits) {
                bits(k) = if (e(k + 1) > e(k)) '1' else '0'; k += 1
              }
              new String(bits)
            case _ => null
          }
          (id, fp)
        }
      }.toDF("doc_id", "afp")
      .where(col("afp").isNotNull)
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
  /** Audio analysis-frame PLAN: one row per (frameMs, hopMs) sliding
    * window over a clip — the first stage of every audio pipeline (VAD,
    * silence trimming, feature extraction). Geometry is pure integer
    * column arithmetic from (sample_rate, n_samples): frame_len =
    * rate·frameMs/1000, hop_len = rate·hopMs/1000, frames only where
    * they fit entirely (n_frames = (n−frame_len)/hop_len + 1; clips
    * shorter than one frame emit nothing). Shuffle-free generate;
    * computing each frame's energy from the payload is the codec seam
    * [[applyAudioFrames]] executes for real. */
  def audioFramePlan(assets: DataFrame, frameMs: Int, hopMs: Int): DataFrame = {
    def intDiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val frameLen = intDiv(col("sample_rate") * frameMs, lit(1000))
    val hopLen = intDiv(col("sample_rate") * hopMs, lit(1000))
    assets
      .select(col("doc_id"), col("n_samples").cast("long").as("n_samples"),
        frameLen.as("frame_len"), hopLen.as("hop_len"))
      .where(col("n_samples") >= col("frame_len"))
      .select(col("doc_id"), col("frame_len"), col("hop_len"),
        explode(sequence(lit(0L),
          intDiv(col("n_samples") - col("frame_len"), col("hop_len")))).as("k"))
      .select(col("doc_id"), col("k").as("frame_idx"),
        (col("k") * col("hop_len")).as("start_sample"), col("frame_len"))
  }

  /** Executes [[audioFramePlan]]'s energy seam with the REAL
    * `javax.sound` WAV decode: each payload's int16 samples are decoded
    * once per asset ([[JdkMediaCodec.wavSamples]]), each analysis frame's
    * energy sum Σ s² accumulates in exact integer arithmetic (raw int16
    * scale — bounded by frame_len·32768² « 2⁶³), and
    * rms = sqrt(Σ s² / frame_len) is a correctly-rounded double of exact
    * inputs, so the value is engine- and partitioning-deterministic.
    * Undecodable payloads are dropped — the [[applyFrameSample]]
    * contract. Per-asset CPU inside `mapPartitions`. */
  def applyAudioFrames(spark: SparkSession, assets: DataFrame,
      frameMs: Int, hopMs: Int): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        JdkMediaCodec.wavSamples(payload).toSeq.flatMap { case (rate, s) =>
          val frameLen = (rate.toLong * frameMs / 1000).toInt
          val hopLen = (rate.toLong * hopMs / 1000).toInt
          if (frameLen <= 0 || hopLen <= 0 || s.length < frameLen) Seq.empty
          else (0 to (s.length - frameLen) / hopLen).map { k =>
            val st = k * hopLen
            var sumSq = 0L
            var i = st
            while (i < st + frameLen) { sumSq += s(i).toLong * s(i); i += 1 }
            (id, k.toLong, st.toLong,
              math.sqrt(sumSq.toDouble / frameLen))
          }
        }
      })
      .toDF("doc_id", "frame_idx", "start_sample", "rms")
  }

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
