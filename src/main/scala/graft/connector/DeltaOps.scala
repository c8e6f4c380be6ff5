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
    cmd: RowLevelOperation.Command,
    // `t.branch_x` identifier target: the operation reads the BRANCH head
    // and the RowDelta commits to the branch ref — main is never touched
    branch: Option[String] = None) extends RowLevelOperation with SupportsDelta {

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
    val head = branch.map(b => table.metadata.refSnapshotId(b).getOrElse(
        throw new IllegalArgumentException(s"no such branch: $b")))
      .orElse(table.currentSnapshot.map(_.snapshotId))
    baseSnapshot.set(head)
    var s = table.newScan()
    // branch pin keeps the CURRENT schema (branch semantics) — see
    // GraftRowLevelOperation.newScanBuilder
    head.filter(_ => branch.isDefined).foreach(id =>
      s = s.useSnapshot(id).withCurrentSchema)
    new GraftScanBuilder(spark, table, s, options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite
        with RequiresDistributionAndOrdering {
        override def description(): String = s"graft row-delta $cmd"
        // sort each task's rows by (_file, _pos), nulls first: insert rows
        // (null metadata) lead, delete rows follow in position order — the
        // writer then STREAMS deletes to one sorted file per task instead
        // of buffering every (path, pos) tuple on heap and sorting at
        // commit (reference SparkPositionDeltaWrite orders by
        // _spec_id/_partition/_file/_pos the same way). Distribution stays
        // unspecified: clustering by _file would funnel all insert rows
        // (null _file) into one task.
        override def requiredDistribution():
            org.apache.spark.sql.connector.distributions.Distribution =
          org.apache.spark.sql.connector.distributions.Distributions
            .unspecified()
        override def requiredOrdering():
            Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array(
            Expressions.sort(
              Expressions.column(GraftSparkTable.FileColumn),
              org.apache.spark.sql.connector.expressions.SortDirection
                .ASCENDING),
            Expressions.sort(
              Expressions.column(GraftSparkTable.PosColumn),
              org.apache.spark.sql.connector.expressions.SortDirection
                .ASCENDING))
        override def toBatch: DeltaBatchWrite =
          new GraftDeltaBatchWrite(table, () => baseSnapshot.get(), branch)
      }
    }
}

/** One atomic RowDelta commit: executor tasks fan out data files for
  * inserted/updated rows (the same writers batch INSERT uses) and one
  * sorted position-delete file per task; the driver commit is pure
  * metadata (reference BaseRowDelta). */
final class GraftDeltaBatchWrite(table: GraftTable,
    base: () => Option[Long] = () => None,
    branch: Option[String] = None) extends DeltaBatchWrite {
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
      Commits.rowDelta(table, dataFiles, deleteFiles, base(), branch = branch)
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
      // every file this task stages besides the insert outputs — abort()
      // must clean them too, or a failure after the delete/DV write leaks
      // the staged file until an orphan sweep (and each retry leaks one)
      private val stagedPaths = scala.collection.mutable.ArrayBuffer.empty[String]
      // DV mode: per-file roaring bitmaps, built as rows arrive (compact —
      // a 100M-position mask is tens of MB, never a tuple-per-row buffer)
      private val canonOf = scala.collection.mutable.HashMap[String, String]()
      private val byFile = scala.collection.mutable
        .HashMap[String, org.roaringbitmap.longlong.Roaring64NavigableMap]()
      // parquet mode: deletes STREAM to one sorted file per task — the
      // write declares ordering by (_file, _pos), so rows arrive sorted
      // (reference PositionDeleteWriter requires sorted input) and no
      // task-level (path, pos) buffer or commit-time sort is needed. An
      // out-of-order row means the required ordering was not honored —
      // fail the task loudly rather than write an unsorted delete file.
      private var delWriter: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = null
      private var delPath: String = null
      private var delCanonMin: String = null
      private var delCanonMax: String = null
      private var lastFile: String = null
      private var lastPos: Long = -1L
      private val deleteSchema = StructType(Seq(
        StructField("file_path", StringType, nullable = false),
        StructField("pos", LongType, nullable = false)))

      override def insert(row: InternalRow): Unit = inserts.write(row)

      override def reinsert(metadata: InternalRow, row: InternalRow): Unit =
        insert(row)

      override def delete(metadata: InternalRow, id: InternalRow): Unit = {
        val f = id.getUTF8String(0).toString
        val p = id.getLong(1)
        if (dvMode) {
          byFile.getOrElseUpdate(
            canonOf.getOrElseUpdate(f, ParquetIO.canonPath(f)),
            new org.roaringbitmap.longlong.Roaring64NavigableMap()).addLong(p)
        } else {
          if (delWriter == null) {
            val hp = new org.apache.hadoop.fs.Path(stagingDir)
            hp.getFileSystem(conf.value).mkdirs(hp)
            delPath = s"$stagingDir/delete-$partitionId-$taskId-" +
              s"${java.util.UUID.randomUUID()}.parquet"
            stagedPaths += delPath
            delWriter = ParquetIO.openWriter(delPath, deleteSchema, conf.value)
          }
          if (lastFile != null &&
              (f < lastFile || (f == lastFile && p < lastPos)))
            throw new IllegalStateException(
              s"position deletes arrived unsorted (($f, $p) after " +
              s"($lastFile, $lastPos)) — required ordering not honored")
          val r = new GenericInternalRow(2)
          r.update(0, UTF8String.fromString(f))
          r.update(1, p)
          delWriter.write(r)
          if (f != lastFile) {
            val c = canonOf.getOrElseUpdate(f, ParquetIO.canonPath(f))
            if (delCanonMin == null || c < delCanonMin) delCanonMin = c
            if (delCanonMax == null || c > delCanonMax) delCanonMax = c
          }
          lastFile = f
          lastPos = p
        }
      }

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
        if (dvMode && byFile.nonEmpty) {
          // v3: one puffin file per task, one bitmap blob per data file
          val hp = new org.apache.hadoop.fs.Path(stagingDir)
          hp.getFileSystem(conf.value).mkdirs(hp)
          val path = s"$stagingDir/dv-$partitionId-$taskId-" +
            s"${java.util.UUID.randomUUID()}.puffin"
          stagedPaths += path
          val dvFiles = Dvs.writePuffin(path, byFile.toSeq, schemaId, specId,
            conf.value)
          return GraftDeltaWriterFactory.DeltaTaskFiles(dataFiles, Nil, dvFiles)
        }
        val deleteFiles =
          if (delWriter == null) Nil
          else {
            delWriter.close()
            delWriter = null
            // target metadata for per-task attachment at scan time
            // (Deletes.posIndex): canonical min/max of the paths this file
            // masks, carried to the manifest via the reserved path-bound id
            val fm = Metrics.fromParquetFooter(delPath, idSchema, conf.value)
              .copy(valueCounts = Map.empty, nullValueCounts = Map.empty,
                lowerBounds = Map(graft.format.Deletes.PathFieldId -> delCanonMin),
                upperBounds = Map(graft.format.Deletes.PathFieldId -> delCanonMax),
                fullBoundIds = Seq(graft.format.Deletes.PathFieldId))
            Seq(GraftBatchWrite.StagedFile(delPath, Map.empty, fm))
          }
        GraftDeltaWriterFactory.DeltaTaskFiles(dataFiles, deleteFiles)
      }

      override def abort(): Unit = {
        inserts.abort()
        if (delWriter != null) {
          try delWriter.close() catch { case _: Exception => () }
          delWriter = null
        }
        val fs = new org.apache.hadoop.fs.Path(stagingDir)
          .getFileSystem(conf.value)
        stagedPaths.foreach { p =>
          try fs.delete(new org.apache.hadoop.fs.Path(p), false)
          catch { case _: java.io.IOException => () }
        }
      }
      override def close(): Unit = ()
    }
}
