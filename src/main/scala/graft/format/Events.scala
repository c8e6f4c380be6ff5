package graft.format

/** One scan-planning event (reference api/.../events/ScanEvent.java, plus
  * the pruning counters our ScanPlan already tracks): emitted once per
  * planFiles so table owners can audit who scans what, with which filter,
  * and how well the metadata pruned. */
final case class ScanEvent(
    tableLocation: String,
    snapshotId: Long,
    filter: Expr,
    projection: Seq[String],
    manifestsTotal: Int,
    manifestsScanned: Int,
    filesTotal: Long,
    filesScanned: Int)

/** One successful commit that created snapshots (the reference fork's
  * event surface stops at ScanEvent — api/.../events/ — this is the
  * commit-side dual later Iceberg added as CreateSnapshotEvent): emitted
  * once per NEW snapshot, after the metadata swap is durable, so audit
  * hooks never observe a commit that subsequently lost its CAS race. */
final case class CommitEvent(
    tableLocation: String,
    snapshotId: Long,
    sequenceNumber: Long,
    operation: String,
    summary: Map[String, String])

/** Process-wide scan-listener registry (reference
  * api/.../events/Listeners.java: static register + notifyAll). Listener
  * failures propagate to the scan, exactly like the reference — a listener
  * is part of the table contract, not best-effort telemetry. */
object Listeners {
  private val listeners =
    new java.util.concurrent.CopyOnWriteArrayList[ScanEvent => Unit]()
  private val commitListeners =
    new java.util.concurrent.CopyOnWriteArrayList[CommitEvent => Unit]()

  def register(l: ScanEvent => Unit): ScanEvent => Unit = {
    listeners.add(l); l
  }

  def unregister(l: ScanEvent => Unit): Unit = listeners.remove(l)

  def registerCommit(l: CommitEvent => Unit): CommitEvent => Unit = {
    commitListeners.add(l); l
  }

  def unregisterCommit(l: CommitEvent => Unit): Unit =
    commitListeners.remove(l)

  private[format] def isEmpty: Boolean = listeners.isEmpty
  private[format] def isCommitEmpty: Boolean = commitListeners.isEmpty

  private[format] def notifyAll(e: ScanEvent): Unit =
    listeners.forEach(l => l(e))

  private[format] def notifyAll(e: CommitEvent): Unit =
    commitListeners.forEach(l => l(e))
}
