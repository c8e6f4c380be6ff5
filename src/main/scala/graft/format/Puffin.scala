package graft.format

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Puffin file format — the public Iceberg sidecar container for table
  * statistics and deletion vectors (iceberg puffin-spec: Magic "PFA1",
  * concatenated blobs, then a footer of [Magic, FooterPayload JSON,
  * FooterPayloadSize int4 LE, Flags int4, Magic]). The reference fork
  * predates Puffin entirely; this follows the published spec so the layout
  * decisions (offset-addressed blobs, self-describing footer) carry the
  * spec's scale rationale: a reader seeks straight to the one blob it
  * needs and never parses the rest of the file.
  *
  * Footer payloads are stored uncompressed (flags = 0) — footers are a few
  * hundred bytes of JSON; blob payloads carry their own encoding (DV blobs
  * embed a compressed roaring bitmap already).
  */
object Puffin {

  val Magic: Array[Byte] = Array('P'.toByte, 'F'.toByte, 'A'.toByte, '1'.toByte)

  /** Blob descriptor (puffin-spec FileMetadata.blobs[i]). `offset`/`length`
    * address the blob payload inside the file; `properties` carries
    * type-specific keys (DVs: referenced-data-file, cardinality). */
  final case class BlobMeta(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      properties: Map[String, String])

  /** Serialize a whole Puffin file from in-memory blobs. DV files are
    * per-write-task artifacts (a handful of bitmaps), so building the byte
    * image in memory matches how they are produced; statistics files are
    * similarly bounded. Returns (bytes, blob metas with final offsets). */
  def write(blobs: Seq[(String, Seq[Int], Long, Long, Array[Byte], Map[String, String])],
      fileProperties: Map[String, String] = Map.empty)
      : (Array[Byte], Seq[BlobMeta]) = {
    val out = new ByteArrayOutputStream(8192)
    out.write(Magic)
    val metas = blobs.map { case (tpe, fields, snapId, seq, payload, props) =>
      val off = out.size().toLong
      out.write(payload)
      BlobMeta(tpe, fields, snapId, seq, off, payload.length.toLong, props)
    }
    // footer: Magic, payload, payload size (LE int), flags (0), Magic
    out.write(Magic)
    val payload = footerJson(metas, fileProperties).getBytes(StandardCharsets.UTF_8)
    out.write(payload)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length)
    tail.putInt(0) // flags: footer payload not compressed
    out.write(tail.array())
    out.write(Magic)
    (out.toByteArray, metas)
  }

  private def footerJson(metas: Seq[BlobMeta],
      fileProperties: Map[String, String]): String = {
    import Json._
    val root = obj()
    val arr = root.putArray("blobs")
    metas.foreach { b =>
      val o = arr.addObject()
      o.put("type", b.blobType)
      val fa = o.putArray("fields"); b.fields.foreach(fa.add)
      o.put("snapshot-id", b.snapshotId)
      o.put("sequence-number", b.sequenceNumber)
      o.put("offset", b.offset)
      o.put("length", b.length)
      if (b.properties.nonEmpty) putStrMap(o, "properties", b.properties)
    }
    if (fileProperties.nonEmpty) putStrMap(root, "properties", fileProperties)
    Json.write(root)
  }

  /** File-level footer properties (puffin-spec FileMetadata.properties). */
  def readFileProperties(bytes: Array[Byte]): Map[String, String] = {
    import Json._
    strMap(footerNode(bytes).get("properties"))
  }

  /** Parse the footer of a serialized Puffin file into blob descriptors. */
  def readFooter(bytes: Array[Byte]): Seq[BlobMeta] = {
    import Json._
    val n = footerNode(bytes)
    elems(n.get("blobs")).map { o =>
      BlobMeta(
        blobType = getStr(o, "type"),
        fields = Option(o.get("fields"))
          .map(a => elems(a).map(_.asInt()).toSeq).getOrElse(Nil),
        snapshotId = getLong(o, "snapshot-id"),
        sequenceNumber = getLong(o, "sequence-number"),
        offset = getLong(o, "offset"),
        length = getLong(o, "length"),
        properties = strMap(o.get("properties")))
    }.toSeq
  }

  def isPuffin(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
      bytes(2) == Magic(2) && bytes(3) == Magic(3)

  private def footerNode(bytes: Array[Byte])
      : com.fasterxml.jackson.databind.JsonNode = {
    require(bytes.length >= 20, "puffin file too short")
    def magicAt(off: Int): Boolean =
      bytes(off) == Magic(0) && bytes(off + 1) == Magic(1) &&
        bytes(off + 2) == Magic(2) && bytes(off + 3) == Magic(3)
    require(magicAt(0), "not a puffin file (bad head magic)")
    require(magicAt(bytes.length - 4), "not a puffin file (bad tail magic)")
    val tail = ByteBuffer.wrap(bytes, bytes.length - 12, 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    val payloadSize = tail.getInt()
    val flags = tail.getInt()
    require((flags & 1) == 0, "compressed puffin footers not supported")
    val payloadStart = bytes.length - 12 - payloadSize
    require(payloadStart >= 8 && magicAt(payloadStart - 4),
      "corrupt puffin footer (payload start magic missing)")
    Json.parse(
      new String(bytes, payloadStart, payloadSize, StandardCharsets.UTF_8))
  }

  // ---- deletion-vector-v1 blob codec (iceberg v3 spec) ----
  // [combined length of magic+vector: int4 BE] [magic D1 D3 39 64]
  // [roaring64 portable bitmap] [crc32 of magic+vector: int4 BE]

  val DvBlobType = "deletion-vector-v1"
  private val DvMagic: Array[Byte] =
    Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)

  def dvBlobPayload(bitmap: Roaring64NavigableMap): Array[Byte] = {
    bitmap.runOptimize()
    val body = new ByteArrayOutputStream(64)
    body.write(DvMagic)
    bitmap.serializePortable(new DataOutputStream(body))
    val vec = body.toByteArray
    val crc = new CRC32
    crc.update(vec)
    val out = ByteBuffer.allocate(4 + vec.length + 4)
    out.putInt(vec.length)
    out.put(vec)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  def dvFromBlobPayload(payload: Array[Byte]): Roaring64NavigableMap = {
    val in = ByteBuffer.wrap(payload)
    val vecLen = in.getInt()
    require(vecLen >= 4 && vecLen <= payload.length - 8,
      s"corrupt DV blob: vector length $vecLen of ${payload.length} bytes")
    val crc = new CRC32
    crc.update(payload, 4, vecLen)
    val stored = ByteBuffer.wrap(payload, 4 + vecLen, 4).getInt()
    require(stored == crc.getValue.toInt,
      "corrupt DV blob: CRC-32 mismatch")
    require(payload(4) == DvMagic(0) && payload(5) == DvMagic(1) &&
      payload(6) == DvMagic(2) && payload(7) == DvMagic(3),
      "corrupt DV blob: bad magic")
    val bm = new Roaring64NavigableMap()
    bm.deserializePortable(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(payload, 8, vecLen - 4)))
    bm
  }
}
