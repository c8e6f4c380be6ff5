package graft.format

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A planned unit of scan work (reference api/.../FileScanTask.java): the
  * data file, its entry sequence number (for delete application), and the
  * residual filter. */
final case class FileScanTask(file: DataFile, sequenceNumber: Long, residual: Expr)

/** Plan result + pruning observability (used by tests and `$scan_report`). */
final case class ScanPlan(
    tasks: Seq[FileScanTask],
    deleteFiles: Seq[(DataFile, Long)],
    manifestsTotal: Int,
    manifestsScanned: Int,
    filesTotal: Long,
    filesScanned: Int) {
  def files: Seq[DataFile] = tasks.map(_.file)
}

/** Snapshot-isolated, refinable table scan (reference api/.../TableScan.java:
  * 33-212, core/.../BaseTableScan.java:48-312 + IncrementalDataTableScan).
  *
  * Pruning pipeline = the reference's §3.1 driver path:
  *  manifest-list partition summaries (ManifestEvaluator)
  *  → per-entry partition-tuple filter (inclusive projection + Evaluator)
  *  → per-file column stats (InclusiveMetricsEvaluator)
  * then file groups become one DataFrame via Spark's parquet reader —
  * Catalyst/Tungsten own everything relational above the scan (SURVEY §7.0).
  */
final class TableScan private[format] (
    table: GraftTable,
    snapshotId: Option[Long] = None,
    asOfMillis: Option[Long] = None,
    rowFilter: Expr = AlwaysTrue,
    projection: Option[Seq[String]] = None,
    incremental: Option[(Long, Long)] = None) {

  def useSnapshot(id: Long): TableScan =
    new TableScan(table, Some(id), asOfMillis, rowFilter, projection, incremental)
  def asOfTime(millis: Long): TableScan =
    new TableScan(table, snapshotId, Some(millis), rowFilter, projection, incremental)
  def filter(expr: Expr): TableScan =
    new TableScan(table, snapshotId, asOfMillis, Exprs.and(rowFilter, expr), projection, incremental)
  def select(cols: String*): TableScan =
    new TableScan(table, snapshotId, asOfMillis, rowFilter, Some(cols), incremental)
  /** Appends in (fromSnapshotId, toSnapshotId] — reference
    * api/.../TableScan.java:150-160. */
  def appendsBetween(from: Long, to: Long): TableScan =
    new TableScan(table, snapshotId, asOfMillis, rowFilter, projection, Some((from, to)))

  private def meta: TableMetadata = table.metadata

  def snapshot: Option[Snapshot] = {
    val m = meta
    snapshotId.map(id => m.snapshot(id).getOrElse(
        throw new IllegalArgumentException(s"no snapshot $id")))
      .orElse(asOfMillis.flatMap(m.snapshotAsOfTime))
      .orElse(m.currentSnapshot)
  }

  /** Scan schema: current schema for current reads; the snapshot's schema
    * when explicitly time traveling (reference BaseTableScan.schema()). */
  def scanSchema: StructType = {
    val m = meta
    if (snapshotId.isEmpty && asOfMillis.isEmpty) m.schema
    else snapshot.flatMap(s => s.summary.get("schema-id").map(_.toInt))
      .flatMap(m.schemas.get).getOrElse(m.schema)
  }

  def planFiles(): ScanPlan = {
    val m = meta
    val schema = scanSchema
    val bound =
      if (rowFilter == AlwaysTrue) AlwaysTrue else Exprs.bind(rowFilter, schema)

    val manifests: Seq[ManifestFile] = incremental match {
      case Some((from, to)) =>
        // union of manifests added by append snapshots in (from, to]
        val m2 = meta
        val snaps = m2.ancestors(Some(to))
          .filter(s => s.snapshotId > from && s.snapshotId <= to)
          .filter(_.operation == "append")
        snaps.flatMap(s => table.readManifestList(m2, s))
          .filter(mf => snaps.exists(_.snapshotId == mf.addedSnapshotId))
          .distinctBy(_.path)
      case None =>
        snapshot.map(s => table.readManifestList(m, s)).getOrElse(Nil)
    }

    var manifestsScanned = 0
    var filesTotal = 0L
    val tasks = Seq.newBuilder[FileScanTask]
    val deletes = Seq.newBuilder[(DataFile, Long)]

    manifests.foreach { mf =>
      filesTotal += mf.addedFilesCount + mf.existingFilesCount
      val spec = m.specs(mf.specId)
      val partTypes = spec.resultTypes(schema)
      val projected =
        if (bound == AlwaysTrue || !spec.isPartitioned) AlwaysTrue
        else Projections.inclusive(bound, spec, schema)
      val mightMatch = projected == AlwaysTrue ||
        Evaluators.manifestMightMatch(projected, spec, mf.partitionSummaries, partTypes)
      if (mightMatch) {
        manifestsScanned += 1
        table.readManifest(mf, schema).foreach { e =>
          if (e.status != EntryStatus.Deleted) {
            val keepByAdded = incremental.isEmpty ||
              (e.status == EntryStatus.Added &&
                manifests.exists(_.addedSnapshotId == e.snapshotId))
            val partOk = projected == AlwaysTrue ||
              Projections.evalOnPartition(projected, e.file.partition)
            if (keepByAdded && partOk) {
              if (e.file.content == FileContent.Data) {
                if (bound == AlwaysTrue || Evaluators.inclusiveMetrics(bound, e.file))
                  tasks += FileScanTask(e.file, e.sequenceNumber, bound)
              } else deletes += ((e.file, e.sequenceNumber))
            }
          }
        }
      }
    }
    val ts = tasks.result()
    ScanPlan(ts, deletes.result(), manifests.size, manifestsScanned, filesTotal, ts.size)
  }

  /** Materialize as a DataFrame: pruned file list → Spark parquet scan
    * (vectorized, codegen'd — SURVEY §7.0's "Catalyst owns the physical
    * plan"), schema-aligned by field id across schema versions, row-level
    * deletes applied, residual re-applied (reference residual-safety:
    * SparkScanBuilder.java:121-123). */
  def toDF(): DataFrame = {
    val spark = table.spark
    val m = meta
    val schema = scanSchema
    val plan = planFiles()
    if (plan.tasks.isEmpty) {
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), projectedSchema(schema))
    }

    // group files by writer schema; align old columns to the scan schema by id
    val byName = FieldIds.nameToId(schema)
    val grouped = plan.tasks.groupBy(_.file.schemaId)
    val parts = grouped.toSeq.sortBy(_._1).map { case (schemaId, tasks) =>
      val fileSchema = m.schemas.getOrElse(schemaId, schema)
      val raw = spark.read.schema(stripIds(fileSchema))
        .parquet(tasks.map(_.file.path): _*)
      alignToSchema(raw, fileSchema, schema)
    }
    var df = parts.reduce(_ unionByName _)

    df = applyDeletes(df, plan, schema)

    val bound =
      if (rowFilter == AlwaysTrue) AlwaysTrue else Exprs.bind(rowFilter, schema)
    if (bound != AlwaysTrue) df = df.filter(Exprs.toColumn(bound))
    projection match {
      case Some(cols) => df.select(cols.map(col): _*)
      case None => df
    }
  }

  private def projectedSchema(schema: StructType): StructType =
    projection match {
      case Some(cols) =>
        StructType(cols.map(c => schema.fields.find(_.name == c).get))
      case None => stripIds(schema)
    }

  private def stripIds(st: StructType): StructType =
    StructType(st.fields.map(f => f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))

  /** Rename/add columns so an old-schema read matches the scan schema —
    * id-based resolution (reference SparkSchemaUtil.prune / NameMapping). */
  private def alignToSchema(df: DataFrame, fileSchema: StructType,
      target: StructType): DataFrame = {
    val fileById = FieldIds.idToName(fileSchema)
    val cols = target.fields.map { tf =>
      val id = FieldIds.idOf(tf)
      fileById.get(id) match {
        case Some(oldName) => col(oldName).cast(tf.dataType).as(tf.name)
        case None => lit(null).cast(tf.dataType).as(tf.name) // added column
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** v2 row-level deletes (reference core/.../deletes/Deletes.java:60-159):
    * position deletes anti-join on (_file, _pos); equality deletes anti-join
    * on the equality columns, applied only to files with a smaller sequence
    * number. */
  private def applyDeletes(df0: DataFrame, plan: ScanPlan,
      schema: StructType): DataFrame = {
    if (plan.deleteFiles.isEmpty) return df0
    val spark = table.spark
    var df = df0

    val posDeletes = plan.deleteFiles.filter(_._1.content == FileContent.PositionDeletes)
    val eqDeletes = plan.deleteFiles.filter(_._1.content == FileContent.EqualityDeletes)

    if (posDeletes.nonEmpty) {
      // re-read with file/pos metadata; join is broadcast-able (delete files
      // are small relative to data at 100 TB: it's per-commit churn)
      val withPos = df.withColumn("_g_file", col("_metadata.file_path"))
        .withColumn("_g_pos", col("_metadata.row_index"))
      val dels = spark.read.parquet(posDeletes.map(_._1.path): _*)
        .select(col("file_path").as("_g_file"), col("pos").as("_g_pos"))
      df = withPos.join(broadcast(dels), Seq("_g_file", "_g_pos"), "left_anti")
        .drop("_g_file", "_g_pos")
    }

    if (eqDeletes.nonEmpty) {
      // group delete files by (equality ids, seq); apply each to older rows.
      // data rows carry their file's seq via a path→seq map column.
      val seqByPath = plan.tasks.map(t => t.file.path -> t.sequenceNumber).toMap
      val pathSeq = typedLit(seqByPath.map { case (p, s) =>
        ("file:" + (if (p.startsWith("/")) "" else "/") + p, s) })
      var cur = df.withColumn("_g_seq",
        coalesce(element_at(pathSeq, col("_metadata.file_path")),
          element_at(pathSeq, regexp_replace(col("_metadata.file_path"), "^file:", ""))))
      eqDeletes.groupBy(d => (d._1.equalityIds, d._2)).foreach {
        case ((ids, seq), group) =>
          val names = ids.map(id => FieldIds.findById(schema, id).get.name)
          val dels = spark.read.parquet(group.map(_._1.path): _*)
            .select(names.map(col): _*).dropDuplicates(names)
          val cond = names.map(n => cur(n) <=> dels(n))
            .reduce(_ && _) && cur("_g_seq") < lit(seq)
          cur = cur.join(broadcast(dels), cond, "left_anti")
      }
      df = cur.drop("_g_seq")
    }
    df
  }
}

/** The table facade (reference api/.../Table.java:31-246). */
final class GraftTable(val ops: TableOps, val spark: SparkSession) {

  def metadata: TableMetadata = {
    val m = ops.current()
    require(m != null, s"table does not exist at ${ops.location}")
    m
  }

  def location: String = ops.location
  def schema: StructType = metadata.schema
  def spec: PartitionSpec = metadata.spec
  def properties: Map[String, String] = metadata.properties
  def currentSnapshot: Option[Snapshot] = metadata.currentSnapshot
  def snapshots: Seq[Snapshot] = metadata.snapshots
  def history: Seq[SnapshotLogEntry] = metadata.snapshotLog

  def newScan(): TableScan = new TableScan(this)

  def toDF(): DataFrame = newScan().toDF()

  // ---- manifest I/O (shared with Commits/Actions) ----
  private[format] def partTypesOf(m: TableMetadata)(specId: Int): Seq[(String, DataType)] = {
    val spec = m.specs(specId)
    // resolve against any schema that has all source ids (latest wins)
    val sch = m.schemas.toSeq.sortBy(-_._1).map(_._2)
      .find(s => spec.fields.forall(f => FieldIds.findById(s, f.sourceId).isDefined))
      .getOrElse(m.schema)
    spec.resultTypes(sch)
  }

  private[format] def readManifestList(m: TableMetadata, s: Snapshot): Seq[ManifestFile] =
    Model.manifestListFromJson(ops.readFile(s.manifestList), partTypesOf(m))

  private[format] def readManifest(mf: ManifestFile, schema: StructType): Seq[ManifestEntry] = {
    val m = metadata
    val types = partTypesOf(m)(mf.specId).toMap
    Model.manifestFromJson(ops.readFile(mf.path),
      m.schemas.toSeq.map(_._2).reduceLeft((a, b) =>
        if (FieldIds.maxId(b) > FieldIds.maxId(a)) b else a),
      types)
  }
}

object GraftTable {
  /** Create a new (empty) table — metadata v1, no snapshot. */
  def create(spark: SparkSession, location: String, schema: StructType,
      specBuild: PartitionSpec.Builder => PartitionSpec.Builder = identity,
      properties: Map[String, String] = Map.empty): GraftTable = {
    val withIds = if (FieldIds.hasIds(schema)) schema else FieldIds.assignFresh(schema)
    val spec = specBuild(PartitionSpec.builderFor(withIds)).build(0)
    val meta = TableMetadata(
      formatVersion = 2,
      tableUuid = java.util.UUID.randomUUID().toString,
      location = location,
      lastSequenceNumber = 0L,
      lastUpdatedMillis = System.currentTimeMillis(),
      lastColumnId = FieldIds.maxId(withIds),
      currentSchemaId = 0,
      schemas = Map(0 -> withIds),
      defaultSpecId = 0,
      specs = Map(0 -> spec),
      properties = properties,
      currentSnapshotId = None,
      snapshots = Nil,
      snapshotLog = Nil)
    val ops = new TableOps(location)
    require(!ops.exists(), s"table already exists at $location")
    ops.commit(0, meta)
    new GraftTable(ops, spark)
  }

  def load(spark: SparkSession, location: String): GraftTable = {
    val ops = new TableOps(location)
    require(ops.exists(), s"no table at $location")
    new GraftTable(ops, spark)
  }

  def exists(location: String): Boolean = new TableOps(location).exists()

  /** Drop any existing table dir and create fresh (test/query helper). */
  def recreate(spark: SparkSession, location: String, schema: StructType,
      specBuild: PartitionSpec.Builder => PartitionSpec.Builder = identity,
      properties: Map[String, String] = Map.empty): GraftTable = {
    val dir = java.nio.file.Paths.get(location)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    create(spark, location, schema, specBuild, properties)
  }
}
