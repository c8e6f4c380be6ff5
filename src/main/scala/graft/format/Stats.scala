package graft.format

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table-level column statistics: per-column NDV estimates tied to a
  * snapshot (reference api/.../StatisticsFile.java + the Puffin
  * theta-sketch files the reference's ANALYZE writes; ours is a JSON map
  * produced by one distributed HLL++ aggregation).
  *
  * The NDV job is a single `approx_count_distinct` pass: HLL sketches are
  * partial-aggregated map-side and merged, so the driver sees one row of
  * (col → ndv) no matter the table size — the 100 TB cost is one full scan
  * of the analyzed columns, which is the floor for any NDV computation.
  * The scan reports these to Spark's CBO (GraftScan.columnStats), which is
  * what makes join reordering and broadcast decisions informed instead of
  * size-only guesses. */
object Stats {

  /** NDVs are keyed by FIELD ID, not name: a metadata-only rename must not
    * leave a stale column's NDV answering for an unrelated new column
    * (manifest metrics key by id for exactly the same reason). */
  final case class TableStats(snapshotId: Long, rowCount: Long,
      ndv: Map[Int, Long]) {
    def ndvByName(schema: org.apache.spark.sql.types.StructType): Map[String, Long] =
      ndv.flatMap { case (id, v) =>
        FieldIds.findById(schema, id).map(_.name -> v)
      }
  }

  /** Columns eligible for NDV analysis: top-level atomic fields. */
  def analyzableColumns(schema: StructType): Seq[String] =
    schema.fields.filter(f => f.dataType match {
      case _: StructType | _: ArrayType | _: MapType => false
      case _ => true
    }).map(_.name).toSeq

  /** One distributed aggregation over the current snapshot → TableStats.
    * `columns` defaults to every top-level atomic column. `rsd` is the
    * HLL++ relative standard deviation: 0.02 keeps the sketch a few KB
    * per column while staying exact for small cardinalities (the sparse
    * representation) and ±2% at scale. */
  def analyze(table: GraftTable, columns: Seq[String] = Nil,
      rsd: Double = 0.02): TableStats = {
    val m = table.metadata
    val snapId = m.currentSnapshotId.getOrElse(
      throw new IllegalStateException("cannot analyze a table with no snapshot"))
    val cols =
      if (columns.nonEmpty) columns
      else analyzableColumns(Types.cleanType(m.schema).asInstanceOf[StructType])
    val bad = cols.filterNot(c => m.schema.fieldNames.contains(c))
    require(bad.isEmpty, s"no such columns: ${bad.mkString(", ")}")
    // pin the scan to the snapshot captured above: a concurrent commit
    // between the metadata read and the scan must not record NDVs computed
    // over a newer snapshot against the older snapshot id
    val df = table.newScan().useSnapshot(snapId).toDF()
    val aggs = count(lit(1)).as("_row_count") +:
      cols.map(c => approx_count_distinct(col(c), rsd).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nameToId = FieldIds.nameToId(m.schema)
    TableStats(snapId, row.getLong(0),
      cols.zipWithIndex.map { case (c, i) => nameToId(c) -> row.getLong(i + 1) }.toMap)
  }

  /** Run the NDV job and commit the result: the stats land as a PUFFIN
    * statistics file like the reference's ANALYZE output — one blob per
    * analyzed column (type `graft-ndv-v1`, fields = [field id], blob
    * property `ndv`, payload = the 8-byte BE estimate; the reference's
    * payload is an apache-datasketches theta sketch, ours is the merged
    * HLL++ point estimate), row count as a footer file property — then
    * recorded in metadata (replacing any previous stats for the same
    * snapshot). Returns the committed pointer. */
  def analyzeAndCommit(table: GraftTable,
      columns: Seq[String] = Nil): (StatisticsFile, TableStats) = {
    val stats = analyze(table, columns)
    val seq = table.metadata.snapshot(stats.snapshotId)
      .map(_.sequenceNumber).getOrElse(-1L)
    val blobs = stats.ndv.toSeq.sortBy(_._1).map { case (id, v) =>
      ("graft-ndv-v1", Seq(id), stats.snapshotId, seq,
        java.nio.ByteBuffer.allocate(8).putLong(v).array(),
        Map("ndv" -> v.toString))
    }
    val (bytes, _) = Puffin.write(blobs,
      Map("row-count" -> stats.rowCount.toString))
    val name = s"stats-${stats.snapshotId}-${java.util.UUID.randomUUID()}.puffin"
    val path = table.ops.writeMetadataBytes(name, bytes)
    val sf = StatisticsFile(stats.snapshotId, path)
    Commits.setStatistics(table, sf)
    (sf, stats)
  }

  /** Stats for a snapshot, if a statistics file was committed for it.
    * Content-sniffed: puffin (current) or the pre-round-10 JSON map. */
  def read(table: GraftTable, snapshotId: Long): Option[TableStats] =
    table.metadata.statisticsFor(snapshotId).flatMap { sf =>
      try {
        val bytes = table.ops.io.readBytes(sf.path)
        if (Puffin.isPuffin(bytes)) Some(fromPuffin(snapshotId, bytes))
        else Some(fromJson(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  private def fromPuffin(snapshotId: Long, bytes: Array[Byte]): TableStats = {
    val ndv = Puffin.readFooter(bytes)
      .filter(b => b.blobType == "graft-ndv-v1" && b.fields.size == 1)
      .flatMap(b => b.properties.get("ndv").map(v => b.fields.head -> v.toLong))
      .toMap
    val rows = Puffin.readFileProperties(bytes)
      .get("row-count").map(_.toLong).getOrElse(0L)
    TableStats(snapshotId, rows, ndv)
  }

  def toJson(s: TableStats): String = {
    val o = Json.obj()
    o.put("snapshot-id", s.snapshotId)
    o.put("row-count", s.rowCount)
    val n = o.putObject("ndv") // keys are field ids
    s.ndv.toSeq.sortBy(_._1).foreach { case (id, v) => n.put(id.toString, v) }
    Json.pretty(o)
  }

  def fromJson(s: String): TableStats = {
    val n = Json.parse(s)
    val ndv = Option(n.get("ndv")).filterNot(_.isNull).map { no =>
      Json.fields(no).map { case (k, v) => k.toInt -> v.asLong() }.toMap
    }.getOrElse(Map.empty)
    TableStats(Json.getLong(n, "snapshot-id"), Json.getLong(n, "row-count"), ndv)
  }
}
