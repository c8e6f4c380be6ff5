package graft.format

/** Per-partition scan summary (reference core/.../ScanSummary.java:50-260:
  * fileCount / recordCount / totalSize per partition, with snapshot
  * timestamp-range filters and a partition limit that throws when
  * exceeded — `throwIfLimited` :114-119).
  */
object ScanSummary {

  final case class PartitionMetrics(fileCount: Int, recordCount: Long,
      totalSize: Long, dataTimestampMillis: Long)

  final class Builder(table: GraftTable) {
    private var afterMillis: Long = Long.MinValue
    private var beforeMillis: Long = Long.MaxValue
    private var limitN: Int = Int.MaxValue
    private var throwIfLimitedFlag = false

    def after(millis: Long): Builder = { afterMillis = millis; this }
    def before(millis: Long): Builder = { beforeMillis = millis; this }
    def limit(n: Int): Builder = { limitN = n; this }
    def throwIfLimited(): Builder = { throwIfLimitedFlag = true; this }

    /** partition (rendered as k=v/...) → metrics. Entries are attributed to
      * the snapshot that ADDED them; timestamp range filters on that. */
    def build(): Map[String, PartitionMetrics] = {
      val m = table.metadata
      val snapTs = m.snapshots.map(s => s.snapshotId -> s.timestampMillis).toMap
      val acc = collection.mutable.Map[String, PartitionMetrics]()
      val manifests = m.currentSnapshot.toSeq
        .flatMap(s => table.readManifestList(m, s))
      val byPath = TableScan.readManifestsParallel(table, manifests, m.schema)
      manifests
        .flatMap(mf => byPath(mf.path))
        .filter(_.status != EntryStatus.Deleted)
        .foreach { e =>
          val ts = snapTs.getOrElse(e.snapshotId, 0L)
          if (ts >= afterMillis && ts <= beforeMillis) {
            val key =
              if (e.file.partition.isEmpty) ""
              else e.file.partition.toSeq.sortBy(_._1)
                .map { case (k, v) => s"$k=${Values.toDirString(v)}" }.mkString("/")
            val prev = acc.getOrElse(key, PartitionMetrics(0, 0L, 0L, 0L))
            acc(key) = PartitionMetrics(
              prev.fileCount + 1,
              prev.recordCount + e.file.recordCount,
              prev.totalSize + e.file.fileSizeInBytes,
              math.max(prev.dataTimestampMillis, ts))
            if (acc.size > limitN) {
              if (throwIfLimitedFlag)
                throw new IllegalStateException(
                  s"scan summary exceeded partition limit $limitN")
            }
          }
        }
      if (acc.size > limitN) acc.toSeq.sortBy(_._1).take(limitN).toMap
      else acc.toMap
    }
  }

  def of(table: GraftTable): Builder = new Builder(table)
}
