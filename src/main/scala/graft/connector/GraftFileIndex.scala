package graft.connector

import graft.format.{DataFile, Values}
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileStatusCache, PartitionDirectory, PartitionSpec => SparkPartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.types.StructType
import scala.collection.mutable.LinkedHashMap

/** FileIndex fed directly from manifest metadata — no driver-side listing or
  * per-file stat calls at planning time. This is the reference's core scale
  * claim (site/docs/performance.md:20-29: plan multi-petabyte tables from a
  * single node using metadata only): file sizes come from the committed
  * DataFiles, so planning cost is O(matching manifest entries) instead of
  * O(files) filesystem RPCs — the difference between milliseconds and
  * minutes against an object store with millions of files.
  *
  * When `partSchema` is non-empty the index also SERVES partition values:
  * files group by their identity-partition tuple and Spark's parquet
  * readers append those columns as constants (the reference's
  * PartitionUtil.constantsMap — how identity-partitioned columns read when
  * they are not stored in the data files, e.g. imported hive layouts). */
final class GraftFileIndex(spark: SparkSession, files: Seq[DataFile],
    partSchema: StructType = StructType(Nil),
    partValues: DataFile => Seq[Any] = _ => Nil)
  extends PartitioningAwareFileIndex(spark, Map.empty,
    None, FileStatusCache.getOrCreate(spark)) {

  private val statusOf: Map[String, FileStatus] = files.map { f =>
    // plain paths are local files; scheme-qualified paths (hdfs://, s3a://,
    // file://) pass through untouched
    val hp = if (new HPath(f.path).toUri.getScheme == null)
      new HPath("file://" + f.path) else new HPath(f.path)
    val st = new FileStatus(f.fileSizeInBytes, false, 1, 128L * 1024 * 1024, 0L, hp)
    // LocatedFileStatus, not FileStatus: Spark's split planning asks every
    // plain status for its block locations with a PER-FILE filesystem RPC
    // on the driver — exactly the O(files) stat storm this index exists to
    // avoid (measured ~6 ms/file: 1,500 small delete files cost ~9 s per
    // scan). Synthesize one no-host block instead; locality hints are
    // meaningless on an object store anyway.
    f.path -> new org.apache.hadoop.fs.LocatedFileStatus(st,
      Array(new org.apache.hadoop.fs.BlockLocation(
        Array.empty[String], Array.empty[String], 0L, f.fileSizeInBytes)))
  }.toMap

  private val statuses: Seq[FileStatus] = files.map(f => statusOf(f.path))

  // CACHED, not recomputed per call: PartitioningAwareFileIndex.allFiles()
  // consults these once PER ROOT PATH — with thousands of small files a
  // def-rebuilt map turns every scan's planning into O(files²) Path
  // normalization (measured ~9 s per job at 1,500 delete files; ~0.1 s
  // cached)
  private val leafFilesCached: LinkedHashMap[HPath, FileStatus] =
    LinkedHashMap(statuses.map(s => s.getPath -> s): _*)
  private val leafDirsCached: Map[HPath, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).map { case (d, fs) => d -> fs.toArray }

  // partition columns must be declared for FileScan's readPartitionSchema
  // validation; the actual (values → files) grouping comes from listFiles
  override def partitionSpec(): SparkPartitionSpec =
    if (partSchema.fields.isEmpty) SparkPartitionSpec.emptySpec
    else SparkPartitionSpec(partSchema, Nil)

  // cached like the leaf maps: Spark lists several times per query
  // (statistics, partitioning, execution) and the grouping is pure
  private lazy val partitionedDirs: Seq[PartitionDirectory] =
    files.groupBy(partValues).toSeq.sortBy(_._1.mkString("/"))
      .map { case (vals, fs) =>
        val row = InternalRow.fromSeq(vals.zip(partSchema.fields).map {
          case (v, f) => Values.toCatalyst(v, f.dataType)
        })
        PartitionDirectory(row, fs.map(f => statusOf(f.path)).toArray)
      }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    if (partSchema.fields.isEmpty) super.listFiles(partitionFilters, dataFilters)
    else partitionedDirs

  override def leafFiles: LinkedHashMap[HPath, FileStatus] = leafFilesCached

  override def leafDirToChildrenFiles: Map[HPath, Array[FileStatus]] =
    leafDirsCached

  override def rootPaths: Seq[HPath] = statuses.map(_.getPath)

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_.fileSizeInBytes).sum
}
