package graft.format

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter

/** Structured-Streaming integration.
  *
  * Sink: epoch-idempotent commits — a replayed epoch is detected by scanning
  * recent snapshots' `streaming.epoch-id` summary and skipped, exactly the
  * reference's trick (spark2/.../StreamingWriter.java:42-98, dedup :60-68).
  * Append mode → fastAppend; Complete mode → overwrite-all (:70-86).
  *
  * Source: micro-batch incremental reads — each poll plans only files ADDED
  * since the last consumed snapshot, the reference's MicroBatches model
  * (core/.../MicroBatches.java:41-123) with offset = snapshot id.
  */
object Streaming {

  val EpochKey = "streaming.epoch-id"
  val QueryKey = "streaming.query-id"

  /** Idempotent epoch commit for foreachBatch sinks. Returns false when the
    * epoch was already committed (replay after failure). */
  def commitEpoch(table: GraftTable, df: DataFrame, epochId: Long,
      queryId: String = "default", complete: Boolean = false): Boolean = {
    val replayed = table.metadata.snapshots.exists(s =>
      s.summary.get(EpochKey).contains(epochId.toString) &&
        s.summary.get(QueryKey).contains(queryId))
    if (replayed) return false
    val files = GraftWrite.writeFiles(table, df)
    val summary = Map(EpochKey -> epochId.toString, QueryKey -> queryId)
    if (complete) {
      // Complete mode: replace the whole table (OverwriteFiles alwaysTrue)
      Commits.overwriteByFilter(table, AlwaysTrue, files)
    } else {
      Commits.fastAppend(table, files, summary)
    }
    true
  }

  /** foreachBatch-ready sink function. */
  def sink(table: GraftTable, queryId: String = "default")
      : (DataFrame, Long) => Unit =
    (df, epochId) => { commitEpoch(table, df, epochId, queryId); () }

  /** Attach the epoch-dedup sink to a stream writer. */
  def writeTo[T](w: DataStreamWriter[T], table: GraftTable,
      queryId: String = "default"): DataStreamWriter[T] =
    w.foreachBatch((batch: org.apache.spark.sql.Dataset[T], epochId: Long) =>
      { commitEpoch(table, batch.toDF(), epochId, queryId); () })

  /** Incremental micro-batch source: stateful poller that returns the new
    * appended rows (and advances its offset) on each call — the
    * MicroBatchStream latestOffset/planInputPartitions cycle as a library
    * surface. */
  final class IncrementalSource(table: GraftTable, startSnapshotId: Option[Long] = None,
      maxBytesPerBatch: Long = Long.MaxValue) {
    @volatile private var lastConsumed: Long =
      startSnapshotId.getOrElse(0L)

    def currentOffset: Long = lastConsumed

    /** Rows appended since the last poll; None when caught up. The batch
      * endpoint advances snapshot-by-snapshot until the size budget is hit
      * (reference MicroBatches.java:112-123 `targetSizeInBytes` slicing —
      * ours slices at snapshot granularity: epochs are the natural batch
      * boundary and stay replayable). */
    def nextBatch(): Option[DataFrame] = {
      val m = table.metadata
      val current = m.currentSnapshotId.getOrElse(0L)
      if (current <= lastConsumed) return None
      if (lastConsumed == 0L && startSnapshotId.isEmpty) {
        lastConsumed = current
        return Some(table.newScan().toDF()) // initial load: full current state
      }
      // grow the range while within budget (always take at least one)
      val pending = m.ancestors(Some(current))
        .filter(_.snapshotId > lastConsumed)
      var end = lastConsumed
      var bytes = 0L
      pending.foreach { s =>
        val sz = table.newScan().appendsBetween(lastConsumed, s.snapshotId)
          .planFiles().tasks.map(_.file.fileSizeInBytes).sum
        if (end == lastConsumed || sz <= maxBytesPerBatch) end = s.snapshotId
        bytes = sz
      }
      val df = table.newScan().appendsBetween(lastConsumed, end).toDF()
      lastConsumed = end
      Some(df)
    }
  }

  def incrementalSource(table: GraftTable, startSnapshotId: Option[Long] = None,
      maxBytesPerBatch: Long = Long.MaxValue): IncrementalSource =
    new IncrementalSource(table, startSnapshotId, maxBytesPerBatch)
}
