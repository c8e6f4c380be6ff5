package graft.connector

import graft.format.DataFile
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{FileStatusCache, PartitionSpec => SparkPartitionSpec, PartitioningAwareFileIndex}
import scala.collection.mutable.LinkedHashMap

/** FileIndex fed directly from manifest metadata — no driver-side listing or
  * per-file stat calls at planning time. This is the reference's core scale
  * claim (site/docs/performance.md:20-29: plan multi-petabyte tables from a
  * single node using metadata only): file sizes come from the committed
  * DataFiles, so planning cost is O(matching manifest entries) instead of
  * O(files) filesystem RPCs — the difference between milliseconds and
  * minutes against an object store with millions of files. */
final class GraftFileIndex(spark: SparkSession, files: Seq[DataFile])
  extends PartitioningAwareFileIndex(spark, Map.empty,
    None, FileStatusCache.getOrCreate(spark)) {

  private val statuses: Seq[FileStatus] = files.map { f =>
    new FileStatus(f.fileSizeInBytes, false, 1, 128L * 1024 * 1024, 0L,
      new HPath("file://" + f.path))
  }

  override def partitionSpec(): SparkPartitionSpec = SparkPartitionSpec.emptySpec

  override def leafFiles: LinkedHashMap[HPath, FileStatus] =
    LinkedHashMap(statuses.map(s => s.getPath -> s): _*)

  override def leafDirToChildrenFiles: Map[HPath, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).map { case (d, fs) => d -> fs.toArray }

  override def rootPaths: Seq[HPath] = statuses.map(_.getPath)

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_.fileSizeInBytes).sum
}
