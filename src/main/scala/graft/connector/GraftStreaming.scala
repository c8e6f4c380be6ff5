package graft.connector

import graft.format._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Snapshot-id offset for the incremental source (reference
  * MicroBatches.java offset model: SURVEY §2.10). */
final case class SnapshotOffset(snapshotId: Long) extends Offset {
  override def json(): String = snapshotId.toString
}

/** DSv2 micro-batch source: each batch reads the data files APPENDED in
  * (startSnapshot, endSnapshot] — `spark.readStream.table("g.db.t")`
  * (reference spark2 incremental source scaffold + MicroBatches slicing).
  * The physical read is Spark's ParquetScan partitions, same as batch. */
final class GraftMicroBatchStream(spark: SparkSession, table: GraftTable,
    options: CaseInsensitiveStringMap) extends MicroBatchStream {

  private def schema: StructType = StructType(table.schema.fields.map(f =>
    f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))

  private def scanFor(files: Seq[DataFile]): ParquetScan =
    ParquetScan(spark, spark.sessionState.newHadoopConf(),
      new GraftFileIndex(spark, files), schema, schema,
      StructType(Nil), Array.empty, options)

  override def latestOffset(): Offset =
    SnapshotOffset(table.currentSnapshot.map(_.snapshotId).getOrElse(0L))

  override def initialOffset(): Offset =
    SnapshotOffset(options.getLong("start-snapshot-id", 0L))

  override def deserializeOffset(json: String): Offset =
    SnapshotOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[SnapshotOffset].snapshotId
    val to = end.asInstanceOf[SnapshotOffset].snapshotId
    if (to <= from) return Array.empty
    val files =
      if (from == 0L) table.newScan().useSnapshot(to).planFiles().files
      else table.newScan().appendsBetween(from, to).planFiles().files
    if (files.isEmpty) Array.empty
    else scanFor(files).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // factory depends only on schema/conf, not the batch's file list
    scanFor(Nil).toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** DSv2 streaming sink with epoch-idempotent commits — `writeStream
  * .toTable("g.db.t")` (reference spark2/.../StreamingWriter.java:42-98:
  * replayed epochs detected via snapshot summary and skipped; Append →
  * fastAppend, Complete/truncate → overwrite-all). Reuses the batch fanout
  * writers. */
final class GraftStreamingWrite(table: GraftTable, truncateFirst: Boolean,
    queryId: String) extends StreamingWrite {
  import GraftBatchWrite.TaskFiles

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val m = table.metadata
    val schema = m.schema
    val nameToIdx = schema.fieldNames.zipWithIndex.toMap
    val fields = m.spec.fields.map { pf =>
      val src = FieldIds.findById(schema, pf.sourceId).get
      GraftBatchWrite.SpecField(pf.name, nameToIdx(src.name), pf.transform, src.dataType)
    }
    val conf = table.spark.sessionState.newHadoopConf()
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    val staging = s"${table.location}/data/${java.util.UUID.randomUUID()}"
    val cleanSchema = StructType(schema.fields.map(f =>
      f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
    val batchFactory = new GraftWriterFactory(cleanSchema, schema, fields, staging,
      new org.apache.spark.util.SerializableConfiguration(conf))
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        batchFactory.createWriter(partitionId, taskId)
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val replayed = table.metadata.snapshots.exists(s =>
      s.summary.get(Streaming.EpochKey).contains(epochId.toString) &&
        s.summary.get(Streaming.QueryKey).contains(queryId))
    if (replayed) { abort(epochId, messages); return }
    val m = table.metadata
    // metrics were computed executor-side (GraftFanoutWriter.commit);
    // the epoch commit is metadata-only on the driver
    val files = messages.collect { case TaskFiles(fs) => fs }.flatten.map { sf =>
      val fm = sf.metrics
      DataFile(path = sf.path, partition = sf.partition,
        recordCount = fm.recordCount, fileSizeInBytes = fm.fileSize,
        schemaId = m.currentSchemaId, specId = m.defaultSpecId,
        valueCounts = fm.valueCounts, nullValueCounts = fm.nullValueCounts,
        lowerBounds = fm.lowerBounds, upperBounds = fm.upperBounds)
    }.toSeq
    val summary = Map(Streaming.EpochKey -> epochId.toString,
      Streaming.QueryKey -> queryId)
    if (truncateFirst) Commits.overwriteByFilter(table, AlwaysTrue, files)
    else Commits.fastAppend(table, files, summary)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case TaskFiles(fs) => fs }.flatten.foreach {
      sf => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(sf.path))
    }
}
