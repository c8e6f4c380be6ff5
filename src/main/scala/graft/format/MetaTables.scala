package graft.format

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Metadata tables — the reference's 9 scannable metadata relations
  * (core/.../MetadataTableType.java:24-34; SnapshotsTable, HistoryTable:36-43,
  * PartitionsTable:39-43, ManifestsTable, DataFilesTable,
  * ManifestEntriesTable, AllDataFilesTable, AllEntriesTable,
  * AllManifestsTable).
  *
  * Two tiers, mirroring the reference split between StaticDataTask and
  * ManifestReadTask (core/.../DataFilesTable.java):
  *  - snapshots / history / manifests / all_manifests are driver-side
  *    LocalRelations: their row count is the snapshot-log / manifest-list
  *    size, which stays tiny even on a 100 TB table.
  *  - files / entries / all_data_files / all_entries / partitions scale
  *    with the number of DATA FILES (millions at 100 TB), so their rows are
  *    parsed executor-side: the driver reads only the manifest LIST (one
  *    descriptor per manifest), and each executor task parses a slice of
  *    manifests into rows ([[manifestRows]]). `partitions` is a distributed
  *    aggregation over the distributed `files` relation.
  *
  * Like the reference's AllDataFilesTable/AllEntriesTable, the `all_*`
  * relations may contain duplicate rows: a file added in one snapshot and
  * carried as Existing in a later rewrite appears once per manifest that
  * lists it. Callers needing set semantics apply `.distinct` (the expiry
  * diff uses `except`, which is already set-semantic).
  */
object MetaTables {

  def apply(table: GraftTable, name: String): DataFrame = name.toLowerCase match {
    case "snapshots" => snapshots(table)
    case "history" => history(table)
    case "manifests" => manifests(table)
    case "files" => files(table)
    case "entries" => entries(table)
    case "partitions" => partitions(table)
    case "all_data_files" => allDataFiles(table)
    case "all_entries" => allEntries(table)
    case "all_manifests" => allManifests(table)
    case "refs" => refs(table)
    case "statistics" => statistics(table)
    case "data_files" => dataFiles(table)
    case "delete_files" => deleteFilesTable(table)
    case "all_files" => allFiles(table) // data + delete files, all snapshots
    case "all_delete_files" => allDeleteFiles(table)
    case "position_deletes" => positionDeletes(table)
    case other => throw new IllegalArgumentException(s"unknown metadata table $other")
  }

  private def df(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  /** `t$snapshots` (reference SnapshotsTable.java:30-89). */
  def snapshots(t: GraftTable): DataFrame = {
    val schema = StructType(Seq(
      StructField("committed_at", TimestampType),
      StructField("snapshot_id", LongType),
      StructField("parent_id", LongType),
      StructField("operation", StringType),
      StructField("manifest_list", StringType),
      StructField("summary", MapType(StringType, StringType))))
    df(t.spark, schema, t.metadata.snapshots.map(s =>
      Row(new java.sql.Timestamp(s.timestampMillis), s.snapshotId,
        s.parentId.map(Long.box).orNull, s.operation, s.manifestList,
        s.summary)))
  }

  /** `t$history` with is_current_ancestor (reference HistoryTable.java:36-43). */
  def history(t: GraftTable): DataFrame = {
    val m = t.metadata
    val ancestors = m.ancestors().map(_.snapshotId).toSet
    val schema = StructType(Seq(
      StructField("made_current_at", TimestampType),
      StructField("snapshot_id", LongType),
      StructField("parent_id", LongType),
      StructField("is_current_ancestor", BooleanType)))
    df(t.spark, schema, m.snapshotLog.map(e =>
      Row(new java.sql.Timestamp(e.timestampMillis), e.snapshotId,
        m.snapshot(e.snapshotId).flatMap(_.parentId).map(Long.box).orNull,
        ancestors.contains(e.snapshotId))))
  }

  private val manifestSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("length", LongType),
    StructField("partition_spec_id", IntegerType),
    StructField("content", IntegerType),
    StructField("added_snapshot_id", LongType),
    StructField("added_data_files_count", IntegerType),
    StructField("existing_data_files_count", IntegerType),
    StructField("deleted_data_files_count", IntegerType)))

  private def manifestRowsOf(t: GraftTable, snaps: Seq[Snapshot]): Seq[Row] =
    manifestsOf(t, snaps).map(mf =>
      Row(mf.path, mf.length, mf.specId, mf.content, mf.addedSnapshotId,
        mf.addedFilesCount, mf.existingFilesCount, mf.deletedFilesCount))

  def manifests(t: GraftTable): DataFrame =
    df(t.spark, manifestSchema, manifestRowsOf(t, t.currentSnapshot.toSeq))

  def allManifests(t: GraftTable): DataFrame =
    df(t.spark, manifestSchema, manifestRowsOf(t, t.metadata.snapshots))

  /** `t$refs`: named branches/tags plus the implicit "main" row (public
    * Iceberg RefsTable shape; snapshot-log scale → LocalRelation tier). */
  /** `t$statistics` — committed NDV statistics files (reference
    * StatisticsTable over StatisticsFile entries). */
  def statistics(t: GraftTable): DataFrame = {
    val schema = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("statistics_path", StringType, nullable = false),
      StructField("row_count", LongType),
      StructField("ndv", MapType(StringType, LongType))))
    df(t.spark, schema, t.metadata.statistics.sortBy(_.snapshotId).map { sf =>
      val st = Stats.read(t, sf.snapshotId)
      Row(sf.snapshotId, sf.path,
        st.map(s => Long.box(s.rowCount)).orNull,
        st.map(_.ndvByName(t.metadata.schema)).orNull)
    })
  }

  def refs(t: GraftTable): DataFrame = {
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("min_snapshots_to_keep", IntegerType),
      StructField("max_snapshot_age_in_ms", LongType),
      StructField("max_ref_age_in_ms", LongType)))
    val m = t.metadata
    val main = m.currentSnapshotId.map(id =>
      Row("main", "BRANCH", id, null, null, null)).toSeq
    df(t.spark, schema, main ++ m.refs.toSeq.sortBy(_._1).map { case (n, r) =>
      Row(n, if (r.isBranch) "BRANCH" else "TAG", r.snapshotId,
        r.minSnapshotsToKeep.map(Int.box).orNull,
        r.maxSnapshotAgeMs.map(Long.box).orNull,
        r.maxRefAgeMs.map(Long.box).orNull)
    })
  }

  private[graft] val fileSchema = StructType(Seq(
    StructField("content", IntegerType),
    StructField("file_path", StringType),
    StructField("file_format", StringType),
    StructField("partition", MapType(StringType, StringType)),
    StructField("record_count", LongType),
    StructField("file_size_in_bytes", LongType),
    StructField("spec_id", IntegerType),
    StructField("schema_id", IntegerType),
    // deletion-vector address (null on data files / non-DV deletes)
    StructField("referenced_data_file", StringType),
    StructField("content_offset", LongType),
    StructField("content_size_in_bytes", LongType)))

  private[graft] val entrySchema = StructType(
    StructField("status", IntegerType) +:
    StructField("snapshot_id", LongType) +:
    StructField("sequence_number", LongType) +: fileSchema.fields.toSeq)

  /** Manifest descriptors reachable from `snaps` — a driver-side read of
    * the manifest LIST only (one small descriptor per manifest). */
  private def manifestsOf(t: GraftTable, snaps: Seq[Snapshot]): Seq[ManifestFile] =
    snaps.flatMap(s => t.readManifestList(t.metadata, s)).distinctBy(_.path)

  /** Parse ONE manifest into metadata-table rows. Runs executor-side (all
    * arguments are serializable); the reference counterpart is
    * ManifestReadTask.rows (core/.../DataFilesTable.java). `filesOnly`
    * selects the `files` projection: live entries only, file columns only. */
  private[graft] def manifestRows(io: FileIO, path: String,
      idSchema: StructType, partTypes: Map[String, DataType],
      filesOnly: Boolean): Seq[Row] = {
    val entries = MetaCodec.readManifest(io.readBytes(path), idSchema, partTypes)
    val selected =
      if (filesOnly) entries.filter(_.status != EntryStatus.Deleted) else entries
    selected.map { e =>
      val f = e.file
      val fileCols = Seq[Any](f.content, f.path, f.fileFormat,
        f.partition.map { case (k, v) => k -> Values.toDirString(v) },
        f.recordCount, f.fileSizeInBytes, f.specId, f.schemaId,
        f.referencedDataFile.orNull, f.contentOffset.map(Long.box).orNull,
        f.contentSizeInBytes.map(Long.box).orNull)
      if (filesOnly) Row(fileCols: _*)
      else Row((Seq[Any](e.status, e.snapshotId, e.sequenceNumber) ++ fileCols): _*)
    }
  }

  /** Everything a task needs to parse manifests without the driver: the
    * manifest slices ship in the closure; entry rows never do. */
  private[graft] final case class ManifestReadSpec(
      io: FileIO,
      idSchema: StructType,
      partTypesBySpec: Map[Int, Map[String, DataType]],
      filesOnly: Boolean) extends Serializable {
    def rows(path: String, specId: Int): Seq[Row] =
      manifestRows(io, path, idSchema, partTypesBySpec(specId), filesOnly)
  }

  private[graft] def readSpec(t: GraftTable, manifests: Seq[ManifestFile],
      filesOnly: Boolean): ManifestReadSpec = {
    val m = t.metadata
    // promotion-safe id-resolution schema (same pick as
    // GraftTable.readManifest — a stale narrow-type copy here decoded
    // post-promotion 8-byte bounds through the 4-byte branch)
    val idSchema = FieldIds.idResolutionSchema(m.schemas)
    val typesBySpec = manifests.map(_.specId).distinct
      .map(id => id -> t.partTypesOf(m)(id).toMap).toMap
    ManifestReadSpec(t.ops.io, idSchema, typesBySpec, filesOnly)
  }

  /** Distributed entry/file relation: the driver ships (path, specId) pairs;
    * executors parse. A million-file table surfaces here without a single
    * entry row materializing on the driver. */
  /** Manifest descriptors selected by CONTENT: data and delete files live
    * in separate manifests, so `data_files` / `delete_files` need no row
    * filter at all — just a smaller manifest list. */
  private def manifestsByContent(t: GraftTable, snaps: Seq[Snapshot],
      deletesOnly: Option[Boolean]): Seq[ManifestFile] = {
    val all = manifestsOf(t, snaps)
    deletesOnly match {
      case Some(true) => all.filterNot(_.content == FileContent.Data)
      case Some(false) => all.filter(_.content == FileContent.Data)
      case None => all
    }
  }

  private def entriesDf(t: GraftTable, snaps: Seq[Snapshot],
      filesOnly: Boolean, deletesOnly: Option[Boolean] = None): DataFrame = {
    val schema = if (filesOnly) fileSchema else entrySchema
    val manifests = manifestsByContent(t, snaps, deletesOnly)
    if (manifests.isEmpty) return df(t.spark, schema, Nil)
    val spec = readSpec(t, manifests, filesOnly)
    val sc = t.spark.sparkContext
    val tasks = math.min(manifests.size, math.max(1, sc.defaultParallelism * 2))
    val rdd = sc.parallelize(manifests.map(mf => (mf.path, mf.specId)), tasks)
      .flatMap { case (p, specId) => spec.rows(p, specId) }
    t.spark.createDataFrame(rdd, schema)
  }

  /** Inputs for the DSv2 distributed surface (connector.MetaScanTable):
    * Some((manifest (path, specId) pairs, read spec, schema)) for the
    * file-scale relations, None for the snapshot-log-scale ones (those stay
    * LocalRelations — reference StaticDataTask). */
  private[graft] def distributedScanInputs(t: GraftTable, name: String)
      : Option[(Seq[(String, Int)], ManifestReadSpec, StructType)] =
    name.toLowerCase match {
      case n @ ("files" | "entries" | "all_data_files" | "all_entries" |
                "data_files" | "delete_files" | "all_files" |
                "all_delete_files") =>
        val filesOnly = n != "entries" && n != "all_entries"
        val snaps =
          if (n.startsWith("all_")) t.metadata.snapshots else t.currentSnapshot.toSeq
        val deletesOnly = n match {
          // all_data_files = DATA only, like the reference AllDataFilesTable
          // (it returned delete files too until round 10's review caught it)
          case "data_files" | "all_data_files" => Some(false)
          case "delete_files" | "all_delete_files" => Some(true)
          case _ => None
        }
        val manifests = manifestsByContent(t, snaps, deletesOnly)
        Some((manifests.map(mf => (mf.path, mf.specId)),
          readSpec(t, manifests, filesOnly),
          if (filesOnly) fileSchema else entrySchema))
      case _ => None
    }

  def entries(t: GraftTable): DataFrame =
    entriesDf(t, t.currentSnapshot.toSeq, filesOnly = false)

  def allEntries(t: GraftTable): DataFrame =
    entriesDf(t, t.metadata.snapshots, filesOnly = false)

  def files(t: GraftTable): DataFrame =
    entriesDf(t, t.currentSnapshot.toSeq, filesOnly = true)

  def dataFiles(t: GraftTable): DataFrame =
    entriesDf(t, t.currentSnapshot.toSeq, filesOnly = true,
      deletesOnly = Some(false))

  def deleteFilesTable(t: GraftTable): DataFrame =
    entriesDf(t, t.currentSnapshot.toSeq, filesOnly = true,
      deletesOnly = Some(true))

  def allDataFiles(t: GraftTable): DataFrame =
    entriesDf(t, t.metadata.snapshots, filesOnly = true,
      deletesOnly = Some(false))

  def allFiles(t: GraftTable): DataFrame =
    entriesDf(t, t.metadata.snapshots, filesOnly = true)

  def allDeleteFiles(t: GraftTable): DataFrame =
    entriesDf(t, t.metadata.snapshots, filesOnly = true,
      deletesOnly = Some(true))

  /** `t$position_deletes` (reference-successor PositionDeletesTable): every
    * live deleted position as (data file, pos, source delete file) rows —
    * parquet position-delete files read through Spark's source (delete file
    * path from row metadata), DV blobs expanded executor-side from their
    * bitmaps. Useful for delete-state inspection and as the read half of
    * external delete-rewrite tooling. */
  def positionDeletes(t: GraftTable): DataFrame =
    Deletes.positionsDF(t.spark, Deletes.posDeleteFilesOf(t), withSource = true)

  /** `t$partitions`: record_count/file_count per partition
    * (reference PartitionsTable.java:39-43) — a distributed aggregation
    * over the distributed `files` relation (partial aggregation executor-
    * side; only one row per partition value reaches the result). */
  def partitions(t: GraftTable): DataFrame = {
    import org.apache.spark.sql.functions._
    files(t).groupBy(col("partition"))
      .agg(sum(col("record_count")).as("record_count"),
        count(lit(1)).as("file_count"))
  }
}
