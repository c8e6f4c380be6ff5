package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video ride as opaque `binary`
 * columns with a typed metadata struct alongside. The Spark-side dataflow
 * (schema, batching, partition-wise processing) is real; the actual media
 * decode is STUBBED behind `FakeCodec` because no image/audio libraries
 * exist in this container — swap `FakeCodec` for a real decoder (JNI or
 * `mapInPandas` on the Python side) without touching the pipeline shape.
 *
 * Scale design: decode/feature-extract run inside `mapPartitions` so a
 * real codec amortizes per-partition init (model load, JNI handle) across
 * rows — same shape as a Pandas-UDF batch. No shuffle anywhere; frame
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
   * STUB decoder: deterministic pseudo-decode of a byte payload.
   * A real implementation would parse the container format here.
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
    * codec pipeline). */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init of a real codec would go here
      rows.map { r =>
        val meta = FakeCodec.decode(r.payload)
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
