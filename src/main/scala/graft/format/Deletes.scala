package graft.format

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** v2 row-level delete writers (reference core/.../deletes/
  * {PositionDeleteWriter,EqualityDeleteWriter}.java + RowDelta commit).
  *
  * Position deletes: rows sorted by (file_path, pos) — the writer contract
  * the reference enforces (PositionDeleteWriter requires sorted input;
  * SURVEY §2.6) — we get it with sortWithinPartitions.
  * Equality deletes: a file of key tuples; rows in OLDER data files whose
  * keys match are invisible (applied in TableScan.applyDeletes).
  */
object Deletes {

  /** Canonical data-file paths targeted by position-delete files (one
    * driver-side read of the small per-commit path column). Shared by both
    * scan paths' parquet-only guard, so the check cannot drift. */
  def posDeleteTargets(paths: Seq[String],
      conf: org.apache.hadoop.conf.Configuration): Set[String] = {
    val out = scala.collection.mutable.HashSet[String]()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file_path",
        org.apache.spark.sql.types.StringType)))
    paths.foreach(p => ParquetIO.readAll(p, schema, conf) { r =>
      if (!r.isNullAt(0)) out += ParquetIO.canonPath(r.getUTF8String(0).toString)
    })
    out.toSet
  }

  /** Target detection over the delete FILES: deletion vectors name their
    * data file in the manifest (zero I/O); parquet position deletes need
    * the per-file path-column read above. */
  def posDeleteTargetFiles(files: Seq[DataFile],
      conf: org.apache.hadoop.conf.Configuration): Set[String] = {
    val (dvs, parquet) = files.partition(_.fileFormat == FileFormats.Puffin)
    dvs.flatMap(_.referencedDataFile).map(ParquetIO.canonPath).toSet ++
      posDeleteTargets(parquet.map(_.path).distinct, conf)
  }

  /** The live position-delete FILES of a table, deduplicated at entry
    * granularity (the same delete file — or the same DV blob — can be
    * planned through several manifests after rewrites). */
  def posDeleteFilesOf(t: GraftTable): Seq[DataFile] =
    t.newScan().planFiles().deleteFiles
      .filter(_._1.content == FileContent.PositionDeletes).map(_._1)
      .distinctBy(f => (f.path, f.referencedDataFile))

  /** All (canonical file_path, pos) pairs of a mixed set of position-delete
    * files as one DataFrame: parquet files read through Spark's source; DV
    * blobs expand executor-side from their bitmaps (one task per blob).
    * `withSource` appends a canonical `delete_file_path` column (the
    * position_deletes metadata-table shape). */
  def positionsDF(spark: SparkSession, files: Seq[DataFile],
      withSource: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    // null-tolerant like the executor-side loader (PosDeleteCache skips
    // null rows): canonicalizing before filtering must not throw
    val canon = udf((s: String) => if (s == null) null else ParquetIO.canonPath(s))
    val (dvs, parquetFiles) = files.partition(_.fileFormat == FileFormats.Puffin)
    val out = StructType(Seq(StructField("file_path", StringType),
      StructField("pos", LongType)) ++
      (if (withSource) Seq(StructField("delete_file_path", StringType)) else Nil))
    val parts = Seq.newBuilder[DataFrame]
    if (parquetFiles.nonEmpty) {
      val base = spark.read.parquet(parquetFiles.map(_.path).distinct: _*)
        .select(Seq(canon(col("file_path")).as("file_path"), col("pos")) ++
          (if (withSource)
            Seq(canon(col("_metadata.file_path")).as("delete_file_path"))
          else Nil): _*)
      parts += base.filter(col("file_path").isNotNull && col("pos").isNotNull)
    }
    val slices = Dvs.slicesOf(dvs)
    if (slices.nonEmpty) {
      val sconf = new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf())
      val rdd = spark.sparkContext
        .parallelize(slices, math.max(1, slices.size))
        .flatMap { s =>
          val src = ParquetIO.canonPath(s.path)
          val it = Dvs.read(s.path, s.offset, s.length, sconf.value).getLongIterator
          new Iterator[Row] {
            override def hasNext: Boolean = it.hasNext
            override def next(): Row =
              if (withSource) Row(s.referenced, it.next(), src)
              else Row(s.referenced, it.next())
          }
        }
      parts += spark.createDataFrame(rdd, out)
    }
    val built = parts.result()
    if (built.isEmpty) spark.createDataFrame(
      new java.util.ArrayList[Row](), out)
    else built.reduce(_ unionByName _)
  }

  private def stage(table: GraftTable, df: DataFrame, sorted: Seq[String]): Seq[String] = {
    val dir = table.locations.newDataLocation(s"deletes-${UUID.randomUUID()}")
    val out = if (sorted.nonEmpty) df.sortWithinPartitions(sorted.map(col): _*) else df
    out.write.mode(SaveMode.ErrorIfExists).parquet(dir)
    table.ops.io.list(dir, ".parquet").map(_.path).sorted
  }

  /** Delete specific row positions. `positions`: (file_path, pos) — use the
    * values surfaced by `_metadata.file_path` / `_metadata.row_index` of a
    * table scan. Commits a RowDelta; on format-version 3 tables the
    * positions land as puffin deletion vectors instead of parquet files. */
  def deletePositions(table: GraftTable, positions: DataFrame): TableMetadata = {
    if (Dvs.enabled(table.metadata))
      return Commits.rowDelta(table, Nil, Dvs.stageFromPositions(table, positions))
    val named = positions.toDF("file_path", "pos")
      .withColumn("pos", col("pos").cast("long"))
    val paths = stage(table, named.coalesce(1), Seq("file_path", "pos"))
    val files = paths.map { p =>
      val fm = Metrics.fromParquetFooter(p, table.schema)
      DataFile(path = p, content = FileContent.PositionDeletes,
        recordCount = fm.recordCount, fileSizeInBytes = fm.fileSize,
        schemaId = table.metadata.currentSchemaId,
        specId = table.metadata.defaultSpecId)
    }
    Commits.rowDelta(table, Nil, files)
  }

  /** Write (but do not commit) equality-delete files for `keys` — shared
    * by deleteByEquality and the streaming upsert sink, which commits them
    * atomically WITH its epoch's data files in one RowDelta. */
  def stageEqualityDeletes(table: GraftTable, keys: DataFrame): Seq[DataFile] = {
    val m = table.metadata
    val ids = keys.columns.map(FieldIds.nameToId(m.schema)).toSeq
    val paths = stage(table, keys.dropDuplicates().coalesce(1), keys.columns.toSeq)
    paths.map { p =>
      val fm = Metrics.fromParquetFooter(p, m.schema)
      DataFile(path = p, content = FileContent.EqualityDeletes,
        recordCount = fm.recordCount, fileSizeInBytes = fm.fileSize,
        schemaId = m.currentSchemaId, specId = m.defaultSpecId,
        equalityIds = ids)
    }
  }

  /** Delete all rows whose key columns match any row of `keys` (written
    * before this commit). Commits a RowDelta with equality-delete files. */
  def deleteByEquality(table: GraftTable, keys: DataFrame): TableMetadata =
    Commits.rowDelta(table, Nil, stageEqualityDeletes(table, keys))

  /** SQL-DELETE-shaped helper: metadata-only when provable, else rewrite the
    * partially-matching files without the matching rows (copy-on-write
    * DELETE — what Spark's SupportsRowLevelOperations would drive). */
  def deleteWhere(table: GraftTable, filter: Expr): TableMetadata = {
    try Commits.deleteByFilter(table, filter)
    catch {
      case _: ValidationException =>
        val m = table.metadata
        val baseSnapshot = m.currentSnapshotId
        val schema = m.schema
        val bound = Exprs.bind(filter, schema)
        val plan = table.newScan().filter(filter).planFiles()
        val touched = plan.tasks.map(_.file.path)
        // read the touched files through the DELETE-APPLYING scan path (an
        // unfiltered scan so no residual re-filter) — a raw parquet read
        // would resurrect rows hidden by live equality/position deletes,
        // since the rewritten files carry a NEWER sequence number
        val remaining = table.newScan()
          .dfFor(ScanPlan(plan.tasks, plan.deleteFiles, 0, 0, 0L, plan.tasks.size))
          .filter(!Exprs.toColumn(bound))
        val staged = GraftWrite.writeFiles(table, remaining)
        // a copy-on-write DELETE changes the logical row set — commit as
        // "overwrite", not "replace" (replace is reserved for row-preserving
        // rewrites and is skipped by CDC changelog reads)
        Commits.rewriteFiles(table, touched.toSet, staged, baseSnapshot,
          operation = "overwrite")
    }
  }
}
