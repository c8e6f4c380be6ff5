package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video ride as opaque `binary`
 * columns with a typed metadata struct alongside. IMAGE decode is REAL:
 * the JDK's own ImageIO readers (PNG/JPEG/GIF/BMP ship with Java 17, no
 * external deps) parse the container header in [[ImageCodec]]. Audio and
 * video stay STUBBED behind `FakeCodec` — no codec for those exists in
 * this container; swap it for a real decoder (JNI or `mapInPandas` on the
 * Python side) without touching the pipeline shape.
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
        // truncated / corrupt container: not an image for our purposes
        case _: java.io.IOException => None
      } finally if (in != null) in.close()
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
   * STUB decoder for audio/video payloads (and the non-media fallback):
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
    * header metadata; everything else falls back to the audio/video stub.
    * The feature vector stays the deterministic byte-histogram stand-in
    * (a real embedding model is per-partition init here). */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init of a real feature model would go here
      rows.map { r =>
        val meta = ImageCodec.probe(r.payload).getOrElse(FakeCodec.decode(r.payload))
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
}
