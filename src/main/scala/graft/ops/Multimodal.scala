package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video ride as opaque `binary`
 * columns with a typed metadata struct alongside. IMAGE decode is REAL:
 * the JDK's own ImageIO readers (PNG/JPEG/GIF/BMP ship with Java 17, no
 * external deps) parse the container header in [[ImageCodec]]. AUDIO
 * header decode is REAL too: `javax.sound.sampled.AudioSystem` parses
 * WAV/AIFF/AU containers in [[AudioCodec]]. Only VIDEO stays STUBBED
 * behind `FakeCodec` — the JDK genuinely ships no video demuxer; swap it
 * for a real decoder (JNI or `mapInPandas` on the Python side) without
 * touching the pipeline shape.
 *
 * Scale design: decode/feature-extract run inside `mapPartitions` so a
 * real codec amortizes per-partition init (model load, JNI handle) across
 * rows — same shape as a Pandas-UDF batch. The image probe is HEADER-ONLY
 * (no pixel decode), so metadata extraction over a 100 TB media corpus
 * reads a few hundred bytes per object. No shuffle anywhere; frame
 * sampling explodes rows but stays partition-local.
 */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                        channels: Int, format: String, sha: String, feature: Array[Float])

  def sha256Hex(payload: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /**
   * REAL image decode via the JDK's ImageIO plugin registry (PNG, JPEG,
   * GIF, BMP, WBMP readers ship with Java 17 — zero external deps,
   * headless-safe). `probe` is header-only: the reader parses the
   * container header for dimensions/format/components without decoding
   * pixel data, so metadata extraction stays cheap at any image size.
   */
  object ImageCodec {
    /** Header-only probe: None when the bytes are not a recognized image
      * (no reader claims the magic bytes). */
    def probe(payload: Array[Byte]): Option[MediaMeta] = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val channels = {
              val types = r.getImageTypes(0)
              if (types.hasNext) types.next().getNumComponents else 3
            }
            Some(MediaMeta(r.getWidth(0), r.getHeight(0), channels,
              r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
          } finally r.dispose()
        }
      } catch {
        // truncated / corrupt container: not an image for our purposes.
        // NonFatal, not just IOException — ImageIO plugin readers throw
        // RuntimeExceptions (IllegalArgument, NegativeArraySize, CCE) on
        // malformed bytes, and one corrupt payload in a 100 TB corpus must
        // degrade to the fallback decoder, not fail the Spark task
        case scala.util.control.NonFatal(_) => None
      } finally if (in != null) in.close()
    }

    /** REAL aspect-preserving resize via the JDK's BufferedImage pipeline
      * (ImageIO decode → Graphics2D bilinear scale → PNG re-encode; zero
      * external deps, headless-safe). The fit rule is integer arithmetic a
      * SQL oracle can restate: scale to the largest (w, h) with
      * w ≤ maxW, h ≤ maxH preserving aspect —
      * `outW = max(1, min(maxW, w*maxH/h))`, `outH = max(1, min(maxH,
      * h*maxW/w))` (floor division). Upscales small images too (training
      * pipelines normalize to a fixed grid). None when the payload is not
      * a decodable image — one corrupt object degrades, never fails the
      * task. */
    def resize(payload: Array[Byte], maxW: Int, maxH: Int)
        : Option[(Int, Int, Array[Byte])] = {
      require(maxW > 0 && maxH > 0, s"bad target: ${maxW}x$maxH")
      try {
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (src == null) None
        else {
          val (w, h) = (src.getWidth, src.getHeight)
          val outW = math.max(1, math.min(maxW.toLong,
            w.toLong * maxH / h).toInt)
          val outH = math.max(1, math.min(maxH.toLong,
            h.toLong * maxW / w).toInt)
          val dst = new java.awt.image.BufferedImage(outW, outH,
            java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, outW, outH, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          Some((outW, outH, bos.toByteArray))
        }
      } catch {
        case scala.util.control.NonFatal(_) => None
      }
    }

    /** REAL image feature vector: decode → bilinear 8x8 → per-pixel
      * luminance (BT.601 integer weights), 64 floats in [0,1] row-major —
      * the classic perceptual-thumbnail embedding (aHash's vector form),
      * computed entirely in the JDK. Feed it to the embedding near-dup /
      * ANN ops for visual dedup: the same picture re-encoded (PNG vs
      * JPEG) lands within cosine ~0.99; unrelated pictures don't. None
      * for non-images — degrade, never fail the task. */
    def feature(payload: Array[Byte]): Option[Array[Float]] = {
      try {
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (src == null) None
        else {
          val dst = new java.awt.image.BufferedImage(8, 8,
            java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, 8, 8, null)
          } finally g.dispose()
          val out = new Array[Float](64)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val rgb = dst.getRGB(x, y)
              val lum = 299 * ((rgb >> 16) & 0xff) +
                587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
              out(y * 8 + x) = lum / 255000.0f
              x += 1
            }
            y += 1
          }
          Some(out)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Encode a deterministic (width × height) image — the test-fixture /
      * gate-query generator (there is no real media in the testdata, so
      * the gate synthesizes real PNG/JPEG bytes and decodes them back). */
    def encode(width: Int, height: Int, format: String, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y, ((seed * 31 + y.toLong * width + x) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, format, bos),
        s"no ImageIO writer for format: $format")
      bos.toByteArray
    }
  }

  /**
   * REAL audio header probe via the JDK's sampled-audio registry
   * (`javax.sound.sampled.AudioSystem` parses WAV/AIFF/AU containers in
   * Java 17 — zero external deps). Header-only: `getAudioFileFormat` reads
   * the container header, never the sample data, so metadata extraction
   * over a large audio corpus touches a few dozen bytes per object.
   *
   * MediaMeta mapping for audio: width = sample rate (Hz), height =
   * bits per sample, channels = channel count, format = container type
   * ("wave" / "aiff" / "au").
   */
  object AudioCodec {
    /** None when no installed reader claims the magic bytes (or the
      * container is truncated/corrupt — same degradation as ImageCodec). */
    def probe(payload: Array[Byte]): Option[MediaMeta] = {
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val f = aff.getFormat
        Some(MediaMeta(width = f.getSampleRate.toInt,
          height = f.getSampleSizeInBits, channels = f.getChannels,
          format = aff.getType.toString.toLowerCase(java.util.Locale.ROOT)))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case scala.util.control.NonFatal(_) => None
      }
    }

    /** Encode deterministic 16-bit PCM audio in a real container via the
      * JDK's own writers — the test-fixture / gate-query generator
      * (there is no real media in the testdata, so the gate synthesizes
      * real WAV/AIFF/AU bytes and probes them back). */
    def encode(sampleRate: Int, channels: Int, frames: Int,
               fileType: String, seed: Long): Array[Byte] = {
      import javax.sound.sampled._
      val (typ, bigEndian) = fileType.toLowerCase(java.util.Locale.ROOT) match {
        case "wave" | "wav" => (AudioFileFormat.Type.WAVE, false)
        case "aiff" => (AudioFileFormat.Type.AIFF, true)
        case "au" => (AudioFileFormat.Type.AU, true)
        case other => throw new IllegalArgumentException(
          s"no JDK audio writer for container: $other")
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
        /*signed=*/ true, bigEndian)
      val data = new Array[Byte](frames * channels * 2)
      var i = 0
      while (i < data.length) { data(i) = ((seed * 31 + i) & 0xff).toByte; i += 1 }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, typ, bos)
      bos.toByteArray
    }
  }

  /**
   * STUB decoder for video payloads (and the non-media fallback):
   * deterministic pseudo-decode of a byte payload. A real implementation
   * would parse the container format here.
   */
  object FakeCodec {
    def decode(payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      MediaMeta(width = n % 640, height = (n * 7) % 480, channels = 3,
        format = if (n % 2 == 0) "png" else "jpeg")
    }

    /** Fake 8-dim visual feature: byte-histogram moments. Deterministic. */
    def feature(payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        f(payload(i) & 0x7) += 1f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      f.map(_ / n)
    }

    /** Fake frame sampler: one "frame" per `stride` bytes, max `maxFrames`. */
    def sampleFrames(payload: Array[Byte], stride: Int, maxFrames: Int): Seq[Array[Byte]] =
      payload.grouped(stride).take(maxFrames).toSeq
  }

  /** Attach a binary payload column (here: UTF-8 of text — the testdata
    * has no real media; the pipeline treats it as opaque bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Partition-wise decode + feature extraction (batch shape of a real
    * codec pipeline): payloads that parse as a real image get ImageIO
    * header metadata, real audio containers get AudioSystem header
    * metadata; only video/non-media falls back to the stub. The feature
    * vector stays the deterministic byte-histogram stand-in (a real
    * embedding model is per-partition init here). */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init of a real feature model would go here
      rows.map { r =>
        val meta = ImageCodec.probe(r.payload)
          .orElse(AudioCodec.probe(r.payload))
          .getOrElse(FakeCodec.decode(r.payload))
        DecodedRow(r.doc_id, r.payload.length, meta.width, meta.height,
          meta.channels, meta.format, sha256Hex(r.payload), FakeCodec.feature(r.payload))
      }
    }
  }

  /** Frame sampling: explode each payload into frame rows, partition-local. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   stride: Int = 64, maxFrames: Int = 4): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      FakeCodec.sampleFrames(r.payload, stride, maxFrames).zipWithIndex.map {
        case (frame, idx) => (r.doc_id, idx, frame.length, FakeCodec.feature(frame))
      }
    }.toDF("doc_id", "frame_idx", "frame_bytes", "feature")
  }

  /** REAL image features over a (doc_id, payload) frame: one 64-dim
    * luminance-thumbnail vector per decodable image ([[ImageCodec
    * .feature]]), emitted as (vec_id, embedding) so the output plugs
    * STRAIGHT into [[Dedup.embeddingNearDupLsh]] / [[Similarity]] for
    * visual near-dup at corpus scale. Narrow map, no shuffle; non-images
    * drop. */
  def imageFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].flatMap(r =>
      ImageCodec.feature(r.payload).map(f => (r.doc_id, f)))
      .toDF("vec_id", "embedding")
  }

  /** REAL image resize over a (doc_id, payload) frame: partition-local
    * decode → aspect-fit scale into (maxW, maxH) → PNG re-encode
    * ([[ImageCodec.resize]]). Non-image payloads are DROPPED (the row
    * carries nothing a training grid can use); the dataflow is a narrow
    * map — no shuffle at any corpus size. Output: (doc_id, src_w, src_h,
    * out_w, out_h, png). */
  def resizeImages(spark: SparkSession, media: DataFrame,
      maxW: Int = 64, maxH: Int = 64): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      ImageCodec.probe(r.payload).flatMap { src =>
        ImageCodec.resize(r.payload, maxW, maxH).map { case (w, h, png) =>
          (r.doc_id, src.width, src.height, w, h, png)
        }
      }
    }.toDF("doc_id", "src_w", "src_h", "out_w", "out_h", "png")
  }
}
