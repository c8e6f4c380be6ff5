package graft.format

/** Row lineage (iceberg v3 spec, "Row Lineage" — past the reference fork's
  * horizon): every row of a format-version-3 table has a durable identity
  * `_row_id` and a `_last_updated_sequence_number` recording the commit
  * that last wrote it. Ids are assigned LAZILY: the commit gives each
  * added data file a `first_row_id` base (Commits.assignRowIds) and rows
  * read `base + position` — no per-row storage cost on append-only paths.
  * Rewrites that must PRESERVE identity (compaction) materialize the two
  * columns physically in the output files and mark the manifest entry
  * [[Materialized]]; readers then take the stored values instead of
  * computing them. Files committed before the table reached v3 have no
  * base and read NULL lineage. */
object Lineage {

  /** Metadata column names (iceberg v3 reserved names). */
  val RowIdColumn = "_row_id"
  val LastUpdatedColumn = "_last_updated_sequence_number"

  /** Manifest `first_row_id` sentinel: the file carries the lineage
    * COLUMNS physically (compaction output) — never a computed base. */
  val Materialized: Long = -1L

  /** Lineage is a format-version-3 feature. */
  def enabled(m: TableMetadata): Boolean = m.formatVersion >= 3

  /** Per-file read strategy for `_row_id` / `_last_updated_sequence_number`. */
  sealed trait Mode extends Serializable
  /** base + row position; sequence number from the manifest entry. */
  final case class Computed(firstRowId: Long, seq: Long) extends Mode
  /** the file stores both columns physically. */
  case object Stored extends Mode
  /** pre-v3 file: lineage reads NULL. */
  case object Absent extends Mode

  def modeOf(file: DataFile, seq: Long): Mode = file.firstRowId match {
    case Some(Materialized) => Stored
    case Some(base) => Computed(base, seq)
    case None => Absent
  }
}
