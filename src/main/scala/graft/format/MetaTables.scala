package graft.format

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Metadata tables — the reference's 9 scannable metadata relations
  * (core/.../MetadataTableType.java:24-34; SnapshotsTable, HistoryTable:36-43,
  * PartitionsTable:39-43, ManifestsTable, DataFilesTable,
  * ManifestEntriesTable, AllDataFilesTable, AllEntriesTable,
  * AllManifestsTable). Metadata rows are driver-side tiny (that's the whole
  * point of scan planning from one node, site/docs/performance.md:20-29), so
  * a LocalRelation-backed DataFrame is the right Spark mapping.
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

  private def manifestRows(t: GraftTable, snaps: Seq[Snapshot]): Seq[Row] = {
    val m = t.metadata
    snaps.flatMap(s => t.readManifestList(m, s)).distinctBy(_.path).map(mf =>
      Row(mf.path, mf.length, mf.specId, mf.content, mf.addedSnapshotId,
        mf.addedFilesCount, mf.existingFilesCount, mf.deletedFilesCount))
  }

  def manifests(t: GraftTable): DataFrame =
    df(t.spark, manifestSchema, manifestRows(t, t.currentSnapshot.toSeq))

  def allManifests(t: GraftTable): DataFrame =
    df(t.spark, manifestSchema, manifestRows(t, t.metadata.snapshots))

  private val fileSchema = StructType(Seq(
    StructField("content", IntegerType),
    StructField("file_path", StringType),
    StructField("file_format", StringType),
    StructField("partition", MapType(StringType, StringType)),
    StructField("record_count", LongType),
    StructField("file_size_in_bytes", LongType),
    StructField("spec_id", IntegerType),
    StructField("schema_id", IntegerType)))

  private val entrySchema = StructType(
    StructField("status", IntegerType) +:
    StructField("snapshot_id", LongType) +:
    StructField("sequence_number", LongType) +: fileSchema.fields.toSeq)

  private def entryRows(t: GraftTable, snaps: Seq[Snapshot]): Seq[Row] = {
    val m = t.metadata
    // parallel manifest I/O, same pool as scan planning — all_* tables over
    // a long-lived table read every manifest ever committed
    val manifests = snaps.flatMap(s => t.readManifestList(m, s)).distinctBy(_.path)
    val byPath = TableScan.readManifestsParallel(t, manifests, m.schema)
    manifests.flatMap(mf => byPath(mf.path))
      .map { e =>
        val f = e.file
        Row(e.status, e.snapshotId, e.sequenceNumber,
          f.content, f.path, "parquet",
          f.partition.map { case (k, v) => k -> Values.toDirString(v) },
          f.recordCount, f.fileSizeInBytes, f.specId, f.schemaId)
      }
  }

  def entries(t: GraftTable): DataFrame =
    df(t.spark, entrySchema, entryRows(t, t.currentSnapshot.toSeq))

  def allEntries(t: GraftTable): DataFrame =
    df(t.spark, entrySchema, entryRows(t, t.metadata.snapshots).distinct)

  def files(t: GraftTable): DataFrame =
    df(t.spark, fileSchema, entryRows(t, t.currentSnapshot.toSeq)
      .filter(_.getInt(0) != EntryStatus.Deleted)
      .map(r => Row(r.toSeq.drop(3): _*)))

  def allDataFiles(t: GraftTable): DataFrame =
    df(t.spark, fileSchema, entryRows(t, t.metadata.snapshots)
      .filter(_.getInt(0) != EntryStatus.Deleted)
      .map(r => Row(r.toSeq.drop(3): _*)).distinct)

  /** `t$partitions`: record_count/file_count per partition
    * (reference PartitionsTable.java:39-43). */
  def partitions(t: GraftTable): DataFrame = {
    import org.apache.spark.sql.functions._
    files(t).groupBy(col("partition"))
      .agg(sum(col("record_count")).as("record_count"),
        count(lit(1)).as("file_count"))
  }
}
