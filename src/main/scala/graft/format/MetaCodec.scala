package graft.format

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Byte codec for the metadata hot path — manifests and manifest lists.
  *
  * The reference writes Avro manifests (core/.../ManifestWriter.java,
  * ManifestListWriter.java); ours are JSON for debuggability, which at 10⁶
  * entries is several× the bytes on every planning read. This codec closes
  * the byte gap: manifests/lists are gzip-compressed by default (~6-10×
  * smaller; JSON text is highly repetitive), controlled per table by
  * `write.metadata.codec` = `gzip` | `none`.
  *
  * Reads auto-detect by the gzip magic (0x1f 0x8b), NOT by file name or
  * table property, so mixed trees read fine: tables written before this
  * codec, tables whose property changed mid-history, and `rewriteManifests`
  * as the migration path (it re-writes every live manifest under the
  * current property). Version metadata files stay plain JSON — they are
  * small, and the commit CAS + version-hint protocol wants them readable.
  */
object MetaCodec {
  val Key = "write.metadata.codec"
  val Gzip = "gzip"
  val None_ = "none"
  val Default: String = Gzip

  def codecFor(props: Map[String, String]): String =
    props.getOrElse(Key, Default) match {
      case c @ (Gzip | None_) => c
      case other => throw new IllegalArgumentException(
        s"unknown $Key: $other (expected $Gzip or $None_)")
    }

  /** File extension advertising the codec (reads sniff content, not names). */
  def ext(codec: String): String =
    if (codec == Gzip) ".json.gz" else ".json"

  def encode(json: String, codec: String): Array[Byte] = {
    val raw = json.getBytes(StandardCharsets.UTF_8)
    if (codec != Gzip) raw
    else {
      val bos = new ByteArrayOutputStream(math.max(64, raw.length / 6))
      val gz = new GZIPOutputStream(bos, 8192)
      gz.write(raw); gz.close()
      bos.toByteArray
    }
  }

  def decode(bytes: Array[Byte]): String = {
    val gzipped = bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b
    if (!gzipped) new String(bytes, StandardCharsets.UTF_8)
    else {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 8192)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }
  }
}
