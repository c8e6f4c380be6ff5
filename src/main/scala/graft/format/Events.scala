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

/** Process-wide scan-listener registry (reference
  * api/.../events/Listeners.java: static register + notifyAll). Listener
  * failures propagate to the scan, exactly like the reference — a listener
  * is part of the table contract, not best-effort telemetry. */
object Listeners {
  private val listeners =
    new java.util.concurrent.CopyOnWriteArrayList[ScanEvent => Unit]()

  def register(l: ScanEvent => Unit): ScanEvent => Unit = {
    listeners.add(l); l
  }

  def unregister(l: ScanEvent => Unit): Unit = listeners.remove(l)

  private[format] def isEmpty: Boolean = listeners.isEmpty

  private[format] def notifyAll(e: ScanEvent): Unit =
    listeners.forEach(l => l(e))
}
