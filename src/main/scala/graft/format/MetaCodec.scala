package graft.format

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import org.apache.spark.sql.types.{DataType, StructType}

/** Codec for the metadata hot path — manifests and manifest lists.
  *
  * Three encodings, selected per table by `write.metadata.codec`:
  *  - `avro` (default): Avro Object Container Files with binary
  *    single-value bounds — the reference's own manifest encoding
  *    (core/.../ManifestWriter.java; see [[ManifestAvro]]).
  *  - `gzip`: gzip-compressed JSON (debuggable, ~as compact as avro).
  *  - `none`: plain JSON (fully debuggable; several× the bytes at scale).
  *
  * Reads auto-detect by CONTENT — the Avro OCF magic (`Obj\1`) or the gzip
  * magic (0x1f 0x8b), NOT file name or table property — so mixed trees read
  * fine: tables written before a codec existed, tables whose property
  * changed mid-history, and `rewriteManifests` as the migration path (it
  * re-writes every live manifest under the current property). Version
  * metadata files stay plain JSON — they are small, and the commit CAS +
  * version-hint protocol wants them readable.
  */
object MetaCodec {
  val Key = "write.metadata.codec"
  val Avro = "avro"
  val Gzip = "gzip"
  val None_ = "none"
  val Default: String = Avro

  def codecFor(props: Map[String, String]): String =
    props.getOrElse(Key, Default) match {
      case c @ (Avro | Gzip | None_) => c
      case other => throw new IllegalArgumentException(
        s"unknown $Key: $other (expected $Avro, $Gzip or $None_)")
    }

  /** File extension advertising the codec (reads sniff content, not names). */
  def ext(codec: String): String = codec match {
    case Avro => ".avro"
    case Gzip => ".json.gz"
    case _ => ".json"
  }

  // ---- manifest entry points (dispatch on codec / sniff on read) ----

  def writeManifest(entries: Seq[ManifestEntry], schema: StructType,
      partTypes: Map[String, DataType], codec: String): Array[Byte] =
    if (codec == Avro) ManifestAvro.writeManifest(entries, schema, partTypes)
    else encode(Model.manifestToJson(entries, schema, partTypes), codec)

  def readManifest(bytes: Array[Byte], schema: StructType,
      partTypes: Map[String, DataType]): Seq[ManifestEntry] =
    if (ManifestAvro.isAvro(bytes)) ManifestAvro.readManifest(bytes, schema, partTypes)
    else Model.manifestFromJson(decode(bytes), schema, partTypes)

  def writeManifestList(mfs: Seq[ManifestFile],
      partTypesOf: Int => Seq[(String, DataType)], codec: String): Array[Byte] =
    if (codec == Avro) ManifestAvro.writeManifestList(mfs, partTypesOf)
    else encode(Model.manifestListToJson(mfs, partTypesOf), codec)

  def readManifestList(bytes: Array[Byte],
      partTypesOf: Int => Seq[(String, DataType)]): Seq[ManifestFile] =
    if (ManifestAvro.isAvro(bytes)) ManifestAvro.readManifestList(bytes, partTypesOf)
    else Model.manifestListFromJson(decode(bytes), partTypesOf)

  // ---- JSON byte codec (gzip | none) ----

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
