package graft.connector

import graft.format.{GraftTable, ParquetIO, ScanPlan}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.ProjectingInternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.concurrent.atomic.AtomicReference

/** SQL MERGE INTO / UPDATE / DELETE via Spark's group-based row-level
  * operation planning (SupportsRowLevelOperations → ReplaceData). This is
  * beyond the reference fork — it exposes only the RowDelta primitives
  * (api/.../RowDelta.java) — but the commit algebra was already complete:
  * the operation is a copy-on-write rewrite, exactly the shape
  * Commits.rewriteFiles commits.
  *
  * Contract (RowLevelOperation javadoc): the scan uses the pushed command
  * condition to select GROUPS (files) that may contain matches and
  * produces every row of those groups; Spark's rewritten query applies the
  * merge logic (modified rows + carried-over rows + new source rows); the
  * write replaces exactly the scanned files with the rewritten output in
  * one atomic commit. Inclusive metrics pruning is precisely "may contain
  * matches", so the group selection rides the normal 3-level planner.
  *
  * Reads go through the delete-applying scan path, so live
  * equality/position deletes are materialized into the rewritten files —
  * the rewrite carries a newer sequence number, exactly like the library
  * deleteWhere path. */
final class GraftRowLevelOperation(spark: SparkSession, table: GraftTable,
    cmd: RowLevelOperation.Command,
    // `t.branch_x` identifier target: the operation reads the BRANCH head
    // and commits the rewrite to the branch ref — main is never touched
    branch: Option[String] = None) extends RowLevelOperation {

  /** Files the operation's scan planned — written at scan build (driver),
    * read at commit (driver). Canonical paths, matching manifests. */
  private val scanned = new AtomicReference[Set[String]](Set.empty)
  // the snapshot the operation read: its commit validates no delete file
  // landed in between (captured before planning, so a racing delete can
  // only cause a spurious retry, never a missed conflict)
  private val baseSnapshot = new AtomicReference[Option[Long]](None)

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft copy-on-write $cmd"

  /** The operation's read carries `_file` so (a) Spark's runtime group
    * filtering can build the dynamic matched-files subquery and (b) the
    * ReplaceData plan gets a metadata projection, which hands the writer
    * clean data-width rows (reference SparkCopyOnWriteOperation requires
    * the same attribute). */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftSparkTable.FileColumn))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // base = the head this operation reads: the branch ref's snapshot for
    // branch DML, main's current snapshot otherwise
    val head = branch.map(b => table.metadata.refSnapshotId(b).getOrElse(
        throw new IllegalArgumentException(s"no such branch: $b")))
      .orElse(table.currentSnapshot.map(_.snapshotId))
    baseSnapshot.set(head)
    var s = table.newScan()
    // branch pin keeps the CURRENT schema (branch semantics) — Spark has
    // planned the operation against the table's schema, so a
    // snapshot-schema scan would fail column resolution after evolution
    head.filter(_ => branch.isDefined).foreach(id =>
      s = s.useSnapshot(id).withCurrentSchema)
    new GraftScanBuilder(spark, table, s, options,
      groupGranular = true,
      onPlan = (plan: ScanPlan) =>
        scanned.set(plan.tasks.map(_.file.path).toSet),
      // runtime group filtering narrowed the scan to files that actually
      // contain matches — the commit must replace exactly that set
      onRuntimeFilter = (keep: Set[String]) =>
        scanned.updateAndGet(_.filter(p => keep.contains(ParquetIO.canonPath(p)))))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def description(): String = s"graft replace-data $cmd"
        override def toBatch: BatchWrite = {
          val inner = new GraftBatchWrite(table,
            GraftBatchWrite.RewriteMatched(() => scanned.get(),
              () => baseSnapshot.get()), branch)
          // ReplaceData's physical rows carry a leading __row_operation
          // column when the plan has no metadata projection to strip it
          // (ReplaceDataExec falls back to the plain writing task) — adapt
          // the incoming rows to the declared write schema
          new BatchWrite {
            override def createBatchWriterFactory(p: PhysicalWriteInfo): DataWriterFactory =
              RowOperationAdapterFactory(
                inner.createBatchWriterFactory(p), info.schema())
            override def commit(msgs: Array[WriterCommitMessage]): Unit =
              inner.commit(msgs)
            override def abort(msgs: Array[WriterCommitMessage]): Unit =
              inner.abort(msgs)
          }
        }
      }
    }
}

/** Projects incoming rows down to the declared write schema when Spark's
  * ReplaceData plan prepends bookkeeping columns (__row_operation): the
  * data columns are the TRAILING `schema.length` fields, in write-schema
  * order. Rows already at the declared width pass through untouched. */
final case class RowOperationAdapterFactory(inner: DataWriterFactory,
    schema: StructType) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val w = inner.createWriter(partitionId, taskId)
      private var proj: ProjectingInternalRow = _

      override def write(row: InternalRow): Unit =
        if (row.numFields == schema.length) w.write(row)
        else {
          if (proj == null) {
            val offset = row.numFields - schema.length
            require(offset > 0, s"write row has ${row.numFields} fields for " +
              s"a ${schema.length}-column schema")
            proj = ProjectingInternalRow(schema,
              (offset until row.numFields).toIndexedSeq)
          }
          proj.project(row)
          // safe to reuse the view: the fanout writer extracts values
          // before the next call
          w.write(proj)
        }

      override def commit(): WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
}
