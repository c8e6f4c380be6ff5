package graft.connector

import graft.format._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Merge-on-read row-level operations (SupportsDelta → WriteDelta):
  * instead of rewriting every file that contains a match (copy-on-write),
  * the operation emits POSITION DELETES for matched rows plus data files
  * for inserts/updated rows, committed as one RowDelta — the write cost is
  * proportional to the CHANGE, not to the files touched. This is the
  * natural fit for the reference's v2 delete design (api/.../RowDelta.java,
  * PositionDeleteWriter): the commit algebra and delete-applying scans
  * already exist; this wires Spark's delta planner onto them.
  *
  * Mode selection is per-command via Iceberg-named table properties
  * `write.delete.mode` / `write.update.mode` / `write.merge.mode`
  * (`copy-on-write` default, `merge-on-read` opt-in). Reads after a
  * merge-on-read commit apply the deletes on the fly (parquet row-index /
  * ORC row-path counter); compaction materializes them away.
  */
final class GraftDeltaOperation(spark: SparkSession, table: GraftTable,
    cmd: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {

  // snapshot the operation read: the commit validates its position-delete
  // targets are still live when the table advanced in between
  private val baseSnapshot =
    new java.util.concurrent.atomic.AtomicReference[Option[Long]](None)

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft merge-on-read $cmd"

  /** Matched rows are addressed by (file, position) — the position-delete
    * key (reference PositionDelete<T>). */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(GraftSparkTable.FileColumn),
      Expressions.column(GraftSparkTable.PosColumn))

  /** An updated row may land in a different partition (the update can
    * change partition-source columns), so updates are DELETE + REINSERT —
    * same choice as the reference's Spark integration. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  /** A NORMAL scan: row-level filters push down (matched rows only are
    * needed — there is no carry-over set in a delta plan); `_file`/`_pos`
    * arrive via the metadata-column machinery. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    baseSnapshot.set(table.currentSnapshot.map(_.snapshotId))
    new GraftScanBuilder(spark, table, table.newScan(), options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def description(): String = s"graft row-delta $cmd"
        override def toBatch: DeltaBatchWrite =
          new GraftDeltaBatchWrite(table, () => baseSnapshot.get())
      }
    }
}

/** One atomic RowDelta commit: executor tasks fan out data files for
  * inserted/updated rows (the same writers batch INSERT uses) and one
  * sorted position-delete file per task; the driver commit is pure
  * metadata (reference BaseRowDelta). */
final class GraftDeltaBatchWrite(table: GraftTable,
    base: () => Option[Long] = () => None) extends DeltaBatchWrite {
  import GraftBatchWrite._

  private val m = table.metadata
  private val stagingDir =
    table.locations.newDataLocation(java.util.UUID.randomUUID().toString)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val schema = m.schema
    val nameToIdx = schema.fieldNames.zipWithIndex.toMap
    val fields = m.spec.fields.map { pf =>
      val src = FieldIds.findById(schema, pf.sourceId).get
      SpecField(pf.name, nameToIdx(src.name), pf.transform, src.dataType)
    }
    val conf = ParquetIO.writeConf(table.spark)
    new GraftDeltaWriterFactory(
      StructType(schema.fields.map(f => f.copy(metadata = Metadata.empty))),
      schema, fields, stagingDir,
      new org.apache.spark.util.SerializableConfiguration(conf),
      Metrics.modesFor(schema, m.properties),
      writeFormat(m.properties), m.properties,
      dvMode = Dvs.enabled(m), m.currentSchemaId, m.defaultSpecId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fmt = writeFormat(m.properties)
    val (dataMsgs, deleteMsgs, dvMsgs) = messages.collect {
      case GraftDeltaWriterFactory.DeltaTaskFiles(data, dels, dvs) =>
        (data, dels, dvs)
    }.unzip3
    val dataFiles = dataMsgs.flatten.map { sf =>
      val fm = sf.metrics
      DataFile(path = sf.path, partition = sf.partition,
        recordCount = fm.recordCount, fileSizeInBytes = fm.fileSize,
        schemaId = m.currentSchemaId, specId = m.defaultSpecId,
        valueCounts = fm.valueCounts, nullValueCounts = fm.nullValueCounts,
        lowerBounds = fm.lowerBounds, upperBounds = fm.upperBounds,
        splitOffsets = fm.splitOffsets, fullBoundIds = fm.fullBoundIds,
        fileFormat = fmt)
    }.toSeq
    val deleteFiles = deleteMsgs.flatten.map { sf =>
      val base = DataFile(path = sf.path, content = FileContent.PositionDeletes,
        recordCount = sf.metrics.recordCount,
        fileSizeInBytes = sf.metrics.fileSize,
        schemaId = m.currentSchemaId, specId = m.defaultSpecId)
      (sf.metrics.lowerBounds.get(graft.format.Deletes.PathFieldId),
        sf.metrics.upperBounds.get(graft.format.Deletes.PathFieldId)) match {
        case (Some(lo: String), Some(hi: String)) =>
          graft.format.Deletes.withPosTargets(base, lo, hi)
        case _ => base
      }
    }.toSeq ++ dvMsgs.flatten.toSeq
    if (dataFiles.nonEmpty || deleteFiles.nonEmpty)
      Commits.rowDelta(table, dataFiles, deleteFiles, base())
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case GraftDeltaWriterFactory.DeltaTaskFiles(data, dels, dvs) =>
      (data.map(_.path) ++ dels.map(_.path) ++ dvs.map(_.path).distinct)
        .foreach(p => table.ops.io.deleteIfExists(p))
    }
}

object GraftDeltaWriterFactory {
  /** Commit message: data files (inserts/updated rows) + position-delete
    * files with task-computed metrics + (v3) deletion-vector descriptors,
    * which are complete manifest entries already. */
  final case class DeltaTaskFiles(data: Seq[GraftBatchWrite.StagedFile],
      deletes: Seq[GraftBatchWrite.StagedFile],
      dvs: Seq[DataFile] = Nil) extends WriterCommitMessage
}

final class GraftDeltaWriterFactory(schema: StructType, idSchema: StructType,
    fields: Seq[GraftBatchWrite.SpecField], stagingDir: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    statModes: Map[Int, Metrics.Mode],
    format: String,
    props: Map[String, String],
    dvMode: Boolean = false,
    schemaId: Int = 0,
    specId: Int = 0) extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      // inserts ride the SAME fanout writers batch INSERT uses
      private val inserts = new GraftFanoutWriter(schema, idSchema, fields,
        stagingDir, partitionId, taskId, conf, statModes, format, props)
      // deletes buffer as (file, pos) and flush as ONE sorted parquet file
      // per task (reference PositionDeleteWriter requires sorted input)
      private val deletes =
        scala.collection.mutable.ArrayBuffer.empty[(String, Long)]

      override def insert(row: InternalRow): Unit = inserts.write(row)

      override def reinsert(metadata: InternalRow, row: InternalRow): Unit =
        insert(row)

      override def delete(metadata: InternalRow, id: InternalRow): Unit =
        deletes += ((id.getUTF8String(0).toString, id.getLong(1)))

      override def update(metadata: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        // unreachable with representUpdateAsDeleteAndInsert=true, but keep
        // the semantics anyway
        delete(metadata, id)
        insert(row)
      }

      override def commit(): WriterCommitMessage = {
        val dataFiles = inserts.commit() match {
          case GraftBatchWrite.TaskFiles(fs) => fs
          case other => throw new IllegalStateException(s"unexpected $other")
        }
        if (dvMode && deletes.nonEmpty) {
          // v3: one puffin file per task, one bitmap blob per data file.
          // Canonicalize each distinct raw path ONCE — a task masks rows in
          // a handful of files but may buffer millions of positions
          val canonOf = scala.collection.mutable.HashMap[String, String]()
          val byFile = scala.collection.mutable
            .HashMap[String, org.roaringbitmap.longlong.Roaring64NavigableMap]()
          deletes.foreach { case (f, p) =>
            byFile.getOrElseUpdate(
              canonOf.getOrElseUpdate(f, ParquetIO.canonPath(f)),
              new org.roaringbitmap.longlong.Roaring64NavigableMap()).addLong(p)
          }
          val hp = new org.apache.hadoop.fs.Path(stagingDir)
          hp.getFileSystem(conf.value).mkdirs(hp)
          val path = s"$stagingDir/dv-$partitionId-$taskId-" +
            s"${java.util.UUID.randomUUID()}.puffin"
          val dvFiles = Dvs.writePuffin(path, byFile.toSeq, schemaId, specId,
            conf.value)
          return GraftDeltaWriterFactory.DeltaTaskFiles(dataFiles, Nil, dvFiles)
        }
        val deleteFiles =
          if (deletes.isEmpty) Nil
          else {
            val path = s"$stagingDir/delete-$partitionId-$taskId-" +
              s"${java.util.UUID.randomUUID()}.parquet"
            val deleteSchema = StructType(Seq(
              StructField("file_path", StringType, nullable = false),
              StructField("pos", LongType, nullable = false)))
            val hp = new org.apache.hadoop.fs.Path(stagingDir)
            hp.getFileSystem(conf.value).mkdirs(hp)
            val w = ParquetIO.openWriter(path, deleteSchema, conf.value)
            try {
              deletes.sortInPlaceBy(identity) // (file_path, pos) order
              deletes.foreach { case (f, p) =>
                val r = new GenericInternalRow(2)
                r.update(0, UTF8String.fromString(f))
                r.update(1, p)
                w.write(r)
              }
            } finally w.close()
            // target metadata for per-task attachment at scan time
            // (Deletes.posIndex): canonical min/max of the paths this file
            // masks, carried to the manifest via the reserved path-bound id
            val canon = deletes.iterator.map(_._1).distinct
              .map(ParquetIO.canonPath).toSeq
            val fm = Metrics.fromParquetFooter(path, idSchema, conf.value)
              .copy(valueCounts = Map.empty, nullValueCounts = Map.empty,
                lowerBounds = Map(graft.format.Deletes.PathFieldId -> canon.min),
                upperBounds = Map(graft.format.Deletes.PathFieldId -> canon.max),
                fullBoundIds = Seq(graft.format.Deletes.PathFieldId))
            Seq(GraftBatchWrite.StagedFile(path, Map.empty, fm))
          }
        GraftDeltaWriterFactory.DeltaTaskFiles(dataFiles, deleteFiles)
      }

      override def abort(): Unit = inserts.abort()
      override def close(): Unit = ()
    }
}
