package graft.format

import java.io.ByteArrayOutputStream
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** Avro codec for manifests and manifest lists — the reference's actual
  * metadata encoding (core/.../ManifestWriter.java, ManifestListWriter.java,
  * V2Metadata.java): Avro Object Container Files of manifest-entry records,
  * deflate-compressed, with bounds and partition values stored as UNTYPED
  * `bytes` in single-value binary form (api/.../types/Conversions.java —
  * our [[Values.toBytes]]) and decoded against the table schema / partition
  * spec by the reader.
  *
  * Unlike the reference we keep ONE static entry schema for all tables:
  * the partition tuple is a `map<union[null,bytes]>` keyed by partition
  * field name rather than a per-spec typed struct — readers always hold the
  * spec (they pass `partTypes`), so the typing information is identical,
  * and a single schema means mixed-spec trees and spec evolution never need
  * per-file schema juggling. Stats maps are keyed by field-id strings
  * (Avro map keys are strings).
  *
  * Byte-level compatibility with reference manifests is a NON-goal (our
  * table format is already its own JSON dialect); what this closes is the
  * metadata-scale cost — binary + deflate instead of JSON text on the
  * planning hot path, the last recorded trade vs the reference.
  */
object ManifestAvro {

  /** Avro OCF magic: 'O' 'b' 'j' 0x01 — the content sniff for reads. */
  def isAvro(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'b' &&
      bytes(2) == 'j' && bytes(3) == 1

  // ---- schemas (static; field defaults make future additions readable
  //      by this reader via Avro schema resolution) ----

  private def bytesOrNull: Schema = SchemaBuilder.unionOf().nullType().and().bytesType().endUnion()

  private[format] val entrySchema: Schema = {
    val dataFile = SchemaBuilder.record("data_file").namespace("graft.manifest").fields()
      .requiredString("path")
      .requiredInt("content")
      .name("partition").`type`().map().values(bytesOrNull).mapDefault(java.util.Map.of())
      .requiredLong("record_count")
      .requiredLong("file_size_in_bytes")
      .requiredInt("schema_id")
      .requiredInt("spec_id")
      .name("value_counts").`type`().map().values().longType().mapDefault(java.util.Map.of())
      .name("null_value_counts").`type`().map().values().longType().mapDefault(java.util.Map.of())
      .name("lower_bounds").`type`().map().values(bytesOrNull).mapDefault(java.util.Map.of())
      .name("upper_bounds").`type`().map().values(bytesOrNull).mapDefault(java.util.Map.of())
      .name("equality_ids").`type`().array().items().intType().arrayDefault(java.util.List.of())
      .name("split_offsets").`type`().array().items().longType().arrayDefault(java.util.List.of())
      .name("full_bound_ids").`type`().array().items().intType().arrayDefault(java.util.List.of())
      .name("file_format").`type`().stringType().stringDefault(FileFormats.Parquet)
      // deletion-vector address (v3): null on data files and non-DV deletes;
      // null defaults keep pre-DV manifests readable via schema resolution
      .name("referenced_data_file").`type`().unionOf().nullType().and()
        .stringType().endUnion().nullDefault()
      .name("content_offset").`type`().unionOf().nullType().and()
        .longType().endUnion().nullDefault()
      .name("content_size_in_bytes").`type`().unionOf().nullType().and()
        .longType().endUnion().nullDefault()
      // row-lineage base (v3): null default keeps pre-lineage manifests
      // readable via schema resolution
      .name("first_row_id").`type`().unionOf().nullType().and()
        .longType().endUnion().nullDefault()
      .endRecord()
    SchemaBuilder.record("manifest_entry").namespace("graft.manifest").fields()
      .requiredInt("status")
      .requiredLong("snapshot_id")
      .requiredLong("sequence_number")
      .name("data_file").`type`(dataFile).noDefault()
      .endRecord()
  }

  private[format] val manifestFileSchema: Schema = {
    val summary = SchemaBuilder.record("field_summary").namespace("graft.manifest").fields()
      .requiredBoolean("contains_null")
      .name("lower").`type`(bytesOrNull).withDefault(null)
      .name("upper").`type`(bytesOrNull).withDefault(null)
      .endRecord()
    SchemaBuilder.record("manifest_file").namespace("graft.manifest").fields()
      .requiredString("path")
      .requiredLong("length")
      .requiredInt("spec_id")
      .requiredInt("content")
      .requiredLong("added_snapshot_id")
      .requiredInt("added_files_count")
      .requiredInt("existing_files_count")
      .requiredInt("deleted_files_count")
      .requiredLong("added_rows_count")
      .requiredLong("existing_rows_count")
      .requiredLong("deleted_rows_count")
      .requiredLong("min_sequence_number")
      .name("partition_summaries").`type`().array().items(summary)
        .arrayDefault(java.util.List.of())
      .endRecord()
  }

  // ---- generic helpers ----

  private def bb(v: Any, dt: DataType): java.nio.ByteBuffer =
    java.nio.ByteBuffer.wrap(Values.toBytes(v, dt))

  private def bytesOf(v: Any): Array[Byte] = v match {
    case null => null
    case b: java.nio.ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
  }

  private def strKey(k: Any): String = k.toString // Utf8 | String

  private def writeOcf(schema: Schema, records: Iterator[GenericRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8192)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    // deflate ≈ gzip's codec; level 6 matches the JSON-gzip path's tradeoff.
    // Manifests are read whole (never split), so large blocks cost nothing
    // and give deflate a full window — default 64 KB blocks compress ~15%
    // worse here
    w.setCodec(CodecFactory.deflateCodec(6))
    w.setSyncInterval(1 << 20)
    w.create(schema, bos)
    try records.foreach(w.append) finally w.close()
    bos.toByteArray
  }

  private def readOcf(bytes: Array[Byte], readerSchema: Schema): Iterator[GenericRecord] = {
    val in = new java.io.ByteArrayInputStream(bytes)
    val r = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord](null, readerSchema))
    // fully drained before return (manifests are bounded); stream closes here
    try r.iterator().asScala.toVector.iterator finally r.close()
  }

  // ---- manifest (entries) ----

  def writeManifest(entries: Seq[ManifestEntry], schema: StructType,
      partTypes: Map[String, DataType]): Array[Byte] = {
    val types = FieldIds.typeById(schema) ++ Deletes.reservedBoundTypes
    val dfSchema = entrySchema.getField("data_file").schema()
    writeOcf(entrySchema, entries.iterator.map { e =>
      val f = e.file
      val df = new GenericData.Record(dfSchema)
      df.put("path", f.path)
      df.put("content", f.content)
      val part = new java.util.LinkedHashMap[String, Any]()
      f.partition.toSeq.sortBy(_._1).foreach { case (k, v) =>
        part.put(k, if (v == null) null else bb(v, partTypes(k)))
      }
      df.put("partition", part)
      df.put("record_count", f.recordCount)
      df.put("file_size_in_bytes", f.fileSizeInBytes)
      df.put("schema_id", f.schemaId)
      df.put("spec_id", f.specId)
      def longMap(m: Map[Int, Long]): java.util.Map[String, java.lang.Long] = {
        val out = new java.util.LinkedHashMap[String, java.lang.Long]()
        m.toSeq.sortBy(_._1).foreach { case (k, v) => out.put(k.toString, v) }
        out
      }
      df.put("value_counts", longMap(f.valueCounts))
      df.put("null_value_counts", longMap(f.nullValueCounts))
      // bounds for ids absent from the resolution schema are skipped, same
      // as the JSON path (they cannot be typed for decode)
      def boundMap(m: Map[Int, Any]): java.util.Map[String, Any] = {
        val out = new java.util.LinkedHashMap[String, Any]()
        m.toSeq.sortBy(_._1).foreach { case (k, v) =>
          types.get(k).foreach(dt => out.put(k.toString, if (v == null) null else bb(v, dt)))
        }
        out
      }
      df.put("lower_bounds", boundMap(f.lowerBounds))
      df.put("upper_bounds", boundMap(f.upperBounds))
      df.put("equality_ids", f.equalityIds.map(Int.box).asJava)
      df.put("split_offsets", f.splitOffsets.map(Long.box).asJava)
      df.put("full_bound_ids", f.fullBoundIds.map(Int.box).asJava)
      df.put("file_format", f.fileFormat)
      df.put("referenced_data_file", f.referencedDataFile.orNull)
      df.put("content_offset", f.contentOffset.map(Long.box).orNull)
      df.put("content_size_in_bytes", f.contentSizeInBytes.map(Long.box).orNull)
      df.put("first_row_id", f.firstRowId.map(Long.box).orNull)
      val rec = new GenericData.Record(entrySchema)
      rec.put("status", e.status)
      rec.put("snapshot_id", e.snapshotId)
      rec.put("sequence_number", e.sequenceNumber)
      rec.put("data_file", df)
      rec
    })
  }

  def readManifest(bytes: Array[Byte], schema: StructType,
      partTypes: Map[String, DataType]): Seq[ManifestEntry] = {
    val types = FieldIds.typeById(schema) ++ Deletes.reservedBoundTypes
    readOcf(bytes, entrySchema).map { rec =>
      val df = rec.get("data_file").asInstanceOf[GenericRecord]
      def longMap(name: String): Map[Int, Long] =
        df.get(name).asInstanceOf[java.util.Map[Any, java.lang.Long]].asScala
          .map { case (k, v) => strKey(k).toInt -> v.longValue() }.toMap
      def boundMap(name: String): Map[Int, Any] =
        df.get(name).asInstanceOf[java.util.Map[Any, Any]].asScala
          .flatMap { case (k, v) =>
            val id = strKey(k).toInt
            types.get(id).map(dt => id -> (if (v == null) null else Values.fromBytes(bytesOf(v), dt)))
          }.toMap
      def intSeq(name: String): Seq[Int] =
        df.get(name).asInstanceOf[java.util.List[java.lang.Integer]].asScala.map(_.intValue()).toSeq
      val partition = df.get("partition").asInstanceOf[java.util.Map[Any, Any]].asScala
        .map { case (k, v) =>
          val name = strKey(k)
          name -> (if (v == null) null else Values.fromBytes(bytesOf(v), partTypes(name)))
        }.toMap
      ManifestEntry(
        status = rec.get("status").asInstanceOf[Int],
        snapshotId = rec.get("snapshot_id").asInstanceOf[Long],
        sequenceNumber = rec.get("sequence_number").asInstanceOf[Long],
        file = DataFile(
          path = strKey(df.get("path")),
          content = df.get("content").asInstanceOf[Int],
          partition = partition,
          recordCount = df.get("record_count").asInstanceOf[Long],
          fileSizeInBytes = df.get("file_size_in_bytes").asInstanceOf[Long],
          schemaId = df.get("schema_id").asInstanceOf[Int],
          specId = df.get("spec_id").asInstanceOf[Int],
          valueCounts = longMap("value_counts"),
          nullValueCounts = longMap("null_value_counts"),
          lowerBounds = boundMap("lower_bounds"),
          upperBounds = boundMap("upper_bounds"),
          equalityIds = intSeq("equality_ids"),
          splitOffsets = df.get("split_offsets")
            .asInstanceOf[java.util.List[java.lang.Long]].asScala.map(_.longValue()).toSeq,
          fullBoundIds = intSeq("full_bound_ids"),
          fileFormat = strKey(df.get("file_format")),
          referencedDataFile = Option(df.get("referenced_data_file")).map(strKey),
          contentOffset = Option(df.get("content_offset"))
            .map(_.asInstanceOf[java.lang.Long].longValue()),
          contentSizeInBytes = Option(df.get("content_size_in_bytes"))
            .map(_.asInstanceOf[java.lang.Long].longValue()),
          firstRowId = Option(df.get("first_row_id"))
            .map(_.asInstanceOf[java.lang.Long].longValue())))
    }.toVector
  }

  // ---- manifest list (ManifestFile descriptors) ----

  def writeManifestList(mfs: Seq[ManifestFile],
      partTypesOf: Int => Seq[(String, DataType)]): Array[Byte] = {
    val sumSchema = manifestFileSchema.getField("partition_summaries")
      .schema().getElementType
    writeOcf(manifestFileSchema, mfs.iterator.map { mf =>
      val rec = new GenericData.Record(manifestFileSchema)
      rec.put("path", mf.path)
      rec.put("length", mf.length)
      rec.put("spec_id", mf.specId)
      rec.put("content", mf.content)
      rec.put("added_snapshot_id", mf.addedSnapshotId)
      rec.put("added_files_count", mf.addedFilesCount)
      rec.put("existing_files_count", mf.existingFilesCount)
      rec.put("deleted_files_count", mf.deletedFilesCount)
      rec.put("added_rows_count", mf.addedRowsCount)
      rec.put("existing_rows_count", mf.existingRowsCount)
      rec.put("deleted_rows_count", mf.deletedRowsCount)
      rec.put("min_sequence_number", mf.minSequenceNumber)
      val types = partTypesOf(mf.specId)
      val sums = mf.partitionSummaries.zip(types).map { case (s, (_, dt)) =>
        val so = new GenericData.Record(sumSchema)
        so.put("contains_null", s.containsNull)
        so.put("lower", if (s.lower == null) null else bb(s.lower, dt))
        so.put("upper", if (s.upper == null) null else bb(s.upper, dt))
        so
      }
      rec.put("partition_summaries", sums.asJava)
      rec
    })
  }

  def readManifestList(bytes: Array[Byte],
      partTypesOf: Int => Seq[(String, DataType)]): Seq[ManifestFile] = {
    readOcf(bytes, manifestFileSchema).map { rec =>
      val specId = rec.get("spec_id").asInstanceOf[Int]
      val types = partTypesOf(specId)
      val sums = rec.get("partition_summaries")
        .asInstanceOf[java.util.List[GenericRecord]].asScala
        .zip(types.iterator).map { case (so, (_, dt)) =>
          FieldSummary(
            so.get("contains_null").asInstanceOf[Boolean],
            Option(so.get("lower")).map(b => Values.fromBytes(bytesOf(b), dt)).orNull,
            Option(so.get("upper")).map(b => Values.fromBytes(bytesOf(b), dt)).orNull)
        }.toSeq
      ManifestFile(
        path = strKey(rec.get("path")),
        length = rec.get("length").asInstanceOf[Long],
        specId = specId,
        content = rec.get("content").asInstanceOf[Int],
        addedSnapshotId = rec.get("added_snapshot_id").asInstanceOf[Long],
        addedFilesCount = rec.get("added_files_count").asInstanceOf[Int],
        existingFilesCount = rec.get("existing_files_count").asInstanceOf[Int],
        deletedFilesCount = rec.get("deleted_files_count").asInstanceOf[Int],
        addedRowsCount = rec.get("added_rows_count").asInstanceOf[Long],
        existingRowsCount = rec.get("existing_rows_count").asInstanceOf[Long],
        deletedRowsCount = rec.get("deleted_rows_count").asInstanceOf[Long],
        minSequenceNumber = rec.get("min_sequence_number").asInstanceOf[Long],
        partitionSummaries = sums)
    }.toVector
  }
}
