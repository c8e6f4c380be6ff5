package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video ride as opaque `binary`
 * columns with a typed metadata struct alongside. IMAGE decode is REAL:
 * the JDK's own ImageIO readers (PNG/JPEG/GIF/BMP ship with Java 17, no
 * external deps) parse the container header in [[ImageCodec]]. AUDIO
 * header decode is REAL too: `javax.sound.sampled.AudioSystem` parses
 * WAV/AIFF/AU containers in [[AudioCodec]]. VIDEO header decode is REAL
 * as well: [[VideoCodec]] parses the MP4/ISO-BMFF box tree (dimensions /
 * duration need no codec — they are plain big-endian metadata in `moov`).
 * Only FRAME decode would need a real demuxer (JNI or `mapInPandas` on
 * the Python side — swap in without touching the pipeline shape);
 * `FakeCodec` remains solely the non-media fallback.
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
   * REAL video header probe: plain big-endian parsing of the MP4/ISO-BMFF
   * box structure (ISO 14496-12 — a public spec; no codec needed, because
   * dimensions and duration live in the `moov` metadata boxes, not the
   * encoded samples). Walks top-level boxes to `moov`, reads
   * `mvhd` (timescale + duration, version 0 and 1 layouts) and each
   * `trak/tkhd` (16.16 fixed-point width/height), and never touches
   * `mdat` — header-only like the image and audio probes, a few hundred
   * bytes per object at any corpus size.
   *
   * MediaMeta mapping for video: width/height = first visual track's
   * dimensions (rounded from 16.16 fixed point), channels = track count,
   * format = the ftyp major brand (e.g. "isom", "mp42").
   */
  object VideoCodec {
    private def u32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def u64(b: Array[Byte], i: Int): Long =
      (u32(b, i) << 32) | u32(b, i + 4)
    private def fourcc(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Iterate child boxes of `[from, until)`, calling `f(type, payloadFrom,
      * payloadUntil)`. Malformed sizes end the walk (never loop/overrun). */
    private def walk(b: Array[Byte], from: Int, until: Int)
        (f: (String, Int, Int) => Unit): Unit = {
      var i = from
      while (i + 8 <= until) {
        val size32 = u32(b, i)
        val typ = fourcc(b, i + 4)
        val (payload, boxEnd) =
          if (size32 == 1L && i + 16 <= until) (i + 16L, i + u64(b, i + 8))
          else if (size32 == 0L) (i + 8L, until.toLong) // box runs to end
          else (i + 8L, i + size32)
        if (boxEnd <= i || boxEnd > until || payload > boxEnd) return
        f(typ, payload.toInt, boxEnd.toInt)
        i = boxEnd.toInt
      }
    }

    /** (timescale, durationTicks, tracks as (width, height)). */
    private case class Moov(timescale: Long, duration: Long,
                            tracks: Seq[(Int, Int)])

    private def parseMoov(b: Array[Byte], from: Int, until: Int): Moov = {
      var timescale = 0L; var duration = 0L; var fragDuration = 0L
      val tracks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      walk(b, from, until) {
        case ("mvhd", p, e) =>
          val v = b(p) & 0xff
          // v0: ver/flags(4) creation(4) modification(4) timescale(4)
          // duration(4); v1 widens the three time fields to 8 bytes
          if (v == 0 && p + 20 <= e) {
            timescale = u32(b, p + 12); duration = u32(b, p + 16)
          } else if (v == 1 && p + 32 <= e) {
            timescale = u32(b, p + 20); duration = u64(b, p + 24)
          }
        case ("mvex", p, e) =>
          // fragmented MP4 (the dominant streaming-origin container):
          // mvhd carries duration 0 and the total movie duration lives in
          // mvex/mehd — ver/flags(4) then fragment_duration (4 or 8)
          walk(b, p, e) {
            case ("mehd", mp, me) =>
              val v = b(mp) & 0xff
              if (v == 1 && mp + 12 <= me) fragDuration = u64(b, mp + 4)
              else if (v == 0 && mp + 8 <= me) fragDuration = u32(b, mp + 4)
            case _ =>
          }
        case ("trak", p, e) =>
          walk(b, p, e) {
            case ("tkhd", tp, te) =>
              val v = b(tp) & 0xff
              // width/height are 16.16 fixed point at the end of tkhd:
              // v0 payload offset 76/80, v1 (8-byte times) offset 88/92
              val off = if (v == 1) 88 else 76
              if (tp + off + 8 <= te)
                tracks += (((u32(b, tp + off) >> 16).toInt,
                  (u32(b, tp + off + 4) >> 16).toInt))
            case _ =>
          }
        case _ =>
      }
      Moov(timescale, if (duration > 0) duration else fragDuration,
        tracks.toSeq)
    }

    /** None when the bytes are not ISO-BMFF (no leading `ftyp`) or the
      * box tree is truncated/corrupt — same degradation contract as the
      * image and audio probes: one bad payload falls through, never fails
      * the task. */
    def probe(payload: Array[Byte]): Option[MediaMeta] = {
      try {
        if (payload.length < 16 || fourcc(payload, 4) != "ftyp") return None
        val brand = fourcc(payload, 8).trim.toLowerCase(java.util.Locale.ROOT)
        var result: Option[MediaMeta] = None
        walk(payload, 0, payload.length) {
          case ("moov", p, e) if result.isEmpty =>
            val m = parseMoov(payload, p, e)
            val (w, h) = m.tracks.find(t => t._1 > 0 && t._2 > 0)
              .getOrElse((0, 0))
            result = Some(MediaMeta(w, h, m.tracks.size, brand))
          case _ =>
        }
        result
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Duration in SECONDS (mvhd duration / timescale), None for
      * non-BMFF / missing-moov / zero-timescale payloads. */
    def probeDurationSec(payload: Array[Byte]): Option[Double] = {
      try {
        if (payload.length < 16 || fourcc(payload, 4) != "ftyp") return None
        var result: Option[Double] = None
        walk(payload, 0, payload.length) {
          case ("moov", p, e) if result.isEmpty =>
            val m = parseMoov(payload, p, e)
            if (m.timescale > 0)
              result = Some(m.duration.toDouble / m.timescale)
          case _ =>
        }
        result
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Encode a deterministic minimal MP4 (ftyp + moov{mvhd, trak{tkhd}}
      * — no mdat; a header probe never reads samples) — the test-fixture /
      * gate-query generator, mirroring ImageCodec.encode /
      * AudioCodec.encode. All fields big-endian per ISO 14496-12. */
    def encode(width: Int, height: Int, timescale: Long, durationTicks: Long,
               brand: String = "isom"): Array[Byte] = {
      require(brand.length == 4, s"brand must be a fourcc: '$brand'")
      val bb = java.nio.ByteBuffer.allocate(24 + 216)
      def fourccBytes(s: String): Array[Byte] =
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      // ftyp: major brand + minor version + 2 compatible brands
      bb.putInt(24).put(fourccBytes("ftyp")).put(fourccBytes(brand))
        .putInt(0).put(fourccBytes(brand)).put(fourccBytes("mp42"))
      // moov{mvhd(108), trak{tkhd(92)}} = 8 + 108 + 100
      bb.putInt(216).put(fourccBytes("moov"))
      bb.putInt(108).put(fourccBytes("mvhd"))
        .putInt(0)                       // version 0 + flags
        .putInt(0).putInt(0)             // creation / modification
        .putInt(timescale.toInt).putInt(durationTicks.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
        .put(new Array[Byte](10))        // reserved
        .putInt(0x00010000).putInt(0).putInt(0) // unity matrix rows
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
        .put(new Array[Byte](24))        // pre_defined
        .putInt(2)                       // next_track_ID
      bb.putInt(100).put(fourccBytes("trak"))
      bb.putInt(92).put(fourccBytes("tkhd"))
        .putInt(7)                       // version 0, flags: enabled+in-movie+in-preview
        .putInt(0).putInt(0)             // creation / modification
        .putInt(1).putInt(0)             // track_ID, reserved
        .putInt(durationTicks.toInt)
        .put(new Array[Byte](8))         // reserved
        .putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/volume/reserved
        .putInt(0x00010000).putInt(0).putInt(0) // unity matrix rows
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
        .putInt(width << 16).putInt(height << 16) // 16.16 fixed point
      bb.array()
    }

    /** Fragmented-MP4 twin of [[encode]]: mvhd duration 0 (as fMP4 muxers
      * write it), total movie duration in moov{mvex{mehd}}, one empty
      * moof fragment after the moov. Fixture generator for the fMP4
      * duration path. */
    def encodeFragmented(width: Int, height: Int, timescale: Long,
               durationTicks: Long, brand: String = "iso5"): Array[Byte] = {
      require(brand.length == 4, s"brand must be a fourcc: '$brand'")
      val bb = java.nio.ByteBuffer.allocate(24 + 240 + 24)
      def fourccBytes(s: String): Array[Byte] =
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      bb.putInt(24).put(fourccBytes("ftyp")).put(fourccBytes(brand))
        .putInt(0).put(fourccBytes(brand)).put(fourccBytes("mp42"))
      // moov{mvhd(108), trak{tkhd(92)}, mvex{mehd(16)}} = 8+108+100+24
      bb.putInt(240).put(fourccBytes("moov"))
      bb.putInt(108).put(fourccBytes("mvhd"))
        .putInt(0)                       // version 0 + flags
        .putInt(0).putInt(0)             // creation / modification
        .putInt(timescale.toInt).putInt(0) // duration 0: lives in mehd
        .putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
        .put(new Array[Byte](10))        // reserved
        .putInt(0x00010000).putInt(0).putInt(0) // unity matrix rows
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
        .put(new Array[Byte](24))        // pre_defined
        .putInt(2)                       // next_track_ID
      bb.putInt(100).put(fourccBytes("trak"))
      bb.putInt(92).put(fourccBytes("tkhd"))
        .putInt(7)                       // version 0, flags
        .putInt(0).putInt(0)             // creation / modification
        .putInt(1).putInt(0)             // track_ID, reserved
        .putInt(0)                       // duration 0 in fragmented tracks
        .put(new Array[Byte](8))         // reserved
        .putShort(0).putShort(0).putShort(0).putShort(0)
        .putInt(0x00010000).putInt(0).putInt(0) // unity matrix rows
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
        .putInt(width << 16).putInt(height << 16) // 16.16 fixed point
      bb.putInt(24).put(fourccBytes("mvex"))
      bb.putInt(16).put(fourccBytes("mehd"))
        .putInt(0)                       // version 0 + flags
        .putInt(durationTicks.toInt)     // fragment_duration
      // one (empty) movie fragment: moof{mfhd} — the probe must skip it
      bb.putInt(24).put(fourccBytes("moof"))
      bb.putInt(16).put(fourccBytes("mfhd"))
        .putInt(0)                       // version 0 + flags
        .putInt(1)                       // sequence_number
      bb.array()
    }
  }

  /**
   * WebM / Matroska header probe: a real EBML parse (public Matroska/EBML
   * layout, RFC 8794) of the other dominant crawl-corpus video container.
   * Variable-length element IDs (marker kept) and sizes (marker
   * stripped; all-ones = unknown size, payload runs to the end — how
   * live-muxed Segments are written). Reads EBML{DocType},
   * Segment{Info{TimecodeScale, Duration}, Tracks{TrackEntry{Video
   * {PixelWidth, PixelHeight}}}} and never touches Cluster (media) data —
   * header-only, like the BMFF probe.
   *
   * MediaMeta mapping: width/height = first video track's pixel
   * dimensions, channels = track count, format = the EBML DocType
   * ("webm" / "matroska").
   */
  object WebmCodec {
    private def idLen(first: Int): Int =
      if ((first & 0x80) != 0) 1
      else if ((first & 0x40) != 0) 2
      else if ((first & 0x20) != 0) 3
      else if ((first & 0x10) != 0) 4
      else -1

    /** (id-with-marker, next index), or null at end/corrupt. */
    private def readId(b: Array[Byte], i: Int, until: Int): (Long, Int) = {
      if (i >= until) return null
      val n = idLen(b(i) & 0xff)
      if (n < 0 || i + n > until) return null
      var v = 0L; var k = 0
      while (k < n) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
      (v, i + n)
    }

    /** (size, next index) with the marker bit stripped; size -1 =
      * "unknown" (all data bits set), or null at end/corrupt. */
    private def readSize(b: Array[Byte], i: Int, until: Int): (Long, Int) = {
      if (i >= until) return null
      val first = b(i) & 0xff
      var mask = 0x80; var n = 1
      while (n <= 8 && (first & mask) == 0) { mask >>= 1; n += 1 }
      if (n > 8 || i + n > until) return null
      var v = (first & (0xff >>> n)).toLong
      var k = 1
      while (k < n) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
      (if (v == (1L << (7 * n)) - 1) -1L else v, i + n)
    }

    /** Iterate sibling elements of `[from, until)`; malformed input ends
      * the walk (never loops or overruns). */
    private def walk(b: Array[Byte], from: Int, until: Int)
        (f: (Long, Int, Int) => Unit): Unit = {
      var i = from
      while (i < until) {
        val id = readId(b, i, until); if (id == null) return
        val sz = readSize(b, id._2, until); if (sz == null) return
        val payFrom = sz._2
        val payEnd = if (sz._1 < 0) until.toLong else payFrom.toLong + sz._1
        if (payEnd > until || payEnd < payFrom) return
        f(id._1, payFrom, payEnd.toInt)
        i = payEnd.toInt
      }
    }

    private def uint(b: Array[Byte], from: Int, until: Int): Long = {
      var v = 0L; var i = from
      while (i < until) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      v
    }
    private def fp(b: Array[Byte], from: Int, until: Int): Double =
      until - from match {
        case 4 => java.lang.Float.intBitsToFloat(uint(b, from, until).toInt).toDouble
        case 8 => java.lang.Double.longBitsToDouble(uint(b, from, until))
        case _ => 0.0
      }

    private val Ebml = 0x1A45DFA3L
    private val DocType = 0x4282L
    private val Segment = 0x18538067L
    private val Info = 0x1549A966L
    private val TimecodeScale = 0x2AD7B1L
    private val Duration = 0x4489L
    private val Tracks = 0x1654AE6BL
    private val TrackEntry = 0xAEL
    private val VideoEl = 0xE0L
    private val PixelWidth = 0xB0L
    private val PixelHeight = 0xBAL

    private def isEbml(payload: Array[Byte]): Boolean =
      payload.length >= 4 && (payload(0) & 0xff) == 0x1A &&
        (payload(1) & 0xff) == 0x45 && (payload(2) & 0xff) == 0xDF &&
        (payload(3) & 0xff) == 0xA3

    /** None for non-EBML or truncated/corrupt payloads — the same
      * degradation contract as the BMFF probe. */
    def probe(payload: Array[Byte]): Option[MediaMeta] = {
      try {
        if (!isEbml(payload)) return None
        var docType = "matroska" // the EBML-spec default when absent
        var w = 0; var h = 0; var nTracks = 0; var sawTracks = false
        walk(payload, 0, payload.length) {
          case (Ebml, p, e) =>
            walk(payload, p, e) {
              case (DocType, dp, de) =>
                docType = new String(payload, dp, de - dp,
                  java.nio.charset.StandardCharsets.US_ASCII).trim
              case _ =>
            }
          case (Segment, p, e) =>
            walk(payload, p, e) {
              case (Tracks, tp, te) =>
                sawTracks = true
                walk(payload, tp, te) {
                  case (TrackEntry, ep, ee) =>
                    nTracks += 1
                    walk(payload, ep, ee) {
                      case (VideoEl, vp, ve) if w == 0 =>
                        walk(payload, vp, ve) {
                          case (PixelWidth, xp, xe) => w = uint(payload, xp, xe).toInt
                          case (PixelHeight, yp, ye) => h = uint(payload, yp, ye).toInt
                          case _ =>
                        }
                      case _ =>
                    }
                  case _ =>
                }
              case _ =>
            }
          case _ =>
        }
        if (sawTracks) Some(MediaMeta(w, h, nTracks, docType)) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Duration in SECONDS: Info.Duration (in TimecodeScale ticks) ×
      * TimecodeScale (ns per tick, default 1,000,000) / 1e9. */
    def probeDurationSec(payload: Array[Byte]): Option[Double] = {
      try {
        if (!isEbml(payload)) return None
        var scale = 1000000L; var dur = -1.0
        walk(payload, 0, payload.length) {
          case (Segment, p, e) =>
            walk(payload, p, e) {
              case (Info, ip, ie) =>
                walk(payload, ip, ie) {
                  case (TimecodeScale, sp, se) => scale = uint(payload, sp, se)
                  case (Duration, dp, de) => dur = fp(payload, dp, de)
                  case _ =>
                }
              case _ =>
            }
          case _ =>
        }
        if (dur >= 0) Some(dur * scale / 1e9) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Deterministic minimal WebM fixture generator (the EBML twin of
      * VideoCodec.encode): EBML{DocType} + Segment{Info{TimecodeScale,
      * Duration}, Tracks{TrackEntry{TrackType, Video{PixelWidth,
      * PixelHeight}}}} + one empty Cluster. `unknownSegmentSize` writes
      * the Segment with the all-ones unknown size, as live muxers do. */
    def encode(width: Int, height: Int, durationSec: Double,
               docType: String = "webm",
               unknownSegmentSize: Boolean = false): Array[Byte] = {
      def idBytes(id: Long): Array[Byte] = {
        val n = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
          else if (id <= 0xffffffL) 3 else 4
        (0 until n).map(k => ((id >> (8 * (n - 1 - k))) & 0xff).toByte).toArray
      }
      def sz(n: Int): Array[Byte] = // 2-byte size: marker 0x40 + 14 bits
        Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
      def elem(id: Long, payload: Array[Byte]): Array[Byte] =
        idBytes(id) ++ sz(payload.length) ++ payload
      def uintBytes(v: Long): Array[Byte] = {
        var n = 1; while (n < 8 && (v >>> (8 * n)) != 0) n += 1
        (0 until n).map(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte).toArray
      }
      val info = elem(Info,
        elem(TimecodeScale, uintBytes(1000000L)) ++
        elem(Duration, { // 8-byte float, ticks at the 1 ms default scale
          val bits = java.lang.Double.doubleToLongBits(durationSec * 1000.0)
          (0 until 8).map(k => ((bits >> (8 * (7 - k))) & 0xff).toByte).toArray
        }))
      val tracks = elem(Tracks, elem(TrackEntry,
        elem(0x83L, Array(1.toByte)) ++ // TrackType: video
        elem(VideoEl,
          elem(PixelWidth, uintBytes(width.toLong)) ++
          elem(PixelHeight, uintBytes(height.toLong)))))
      val cluster = elem(0x1F43B675L, Array.empty[Byte])
      val segPayload = info ++ tracks ++ cluster
      val segment =
        if (unknownSegmentSize)
          idBytes(Segment) ++ Array(0xff.toByte) ++ segPayload // 1-byte all-ones
        else elem(Segment, segPayload)
      elem(Ebml, elem(DocType,
        docType.getBytes(java.nio.charset.StandardCharsets.US_ASCII))) ++
        segment
    }
  }

  /**
   * STUB decoder for non-media payloads: deterministic pseudo-decode of a
   * byte payload. Image (ImageIO), audio (AudioSystem) and video
   * (ISO-BMFF and EBML/WebM byte parsing) containers are all probed for
   * REAL before any payload falls through to here.
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
    * metadata, real MP4/ISO-BMFF containers get moov-box header metadata;
    * only non-media falls back to the stub. The feature vector stays the
    * deterministic byte-histogram stand-in (a real embedding model is
    * per-partition init here). */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init of a real feature model would go here
      rows.map { r =>
        val meta = ImageCodec.probe(r.payload)
          .orElse(AudioCodec.probe(r.payload))
          .orElse(VideoCodec.probe(r.payload))
          .orElse(WebmCodec.probe(r.payload))
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
