package graft.format

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A planned unit of scan work (reference api/.../FileScanTask.java): the
  * data file, its entry sequence number (for delete application), and the
  * residual filter. */
final case class FileScanTask(file: DataFile, sequenceNumber: Long, residual: Expr)

/** Plan result + pruning observability (consumed by tests and ScanEvent). */
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
    incremental: Option[(Long, Long)] = None,
    // BRANCH-read semantics (public Iceberg): a branch pin still reads
    // the table's CURRENT schema — only tags and time travel read the
    // snapshot's own schema
    currentSchema: Boolean = false) {

  def useSnapshot(id: Long): TableScan =
    new TableScan(table, Some(id), asOfMillis, rowFilter, projection, incremental, currentSchema)
  /** Read a named ref — branch head or tag ("main" = current). Branch
    * reads use the table's current schema (Iceberg branch semantics);
    * tag reads use the snapshot's schema. */
  def useRef(name: String): TableScan = {
    val pinned = useSnapshot(table.metadata.refSnapshotId(name).getOrElse(
      throw new IllegalArgumentException(s"no such ref: $name")))
    val isBranch = name == "main" ||
      table.metadata.refs.get(name).exists(_.isBranch)
    if (isBranch) pinned.withCurrentSchema else pinned
  }
  /** Pin a snapshot but keep the table's CURRENT schema — how a branch
    * head is read (the branch follows the table's schema evolution). */
  def withCurrentSchema: TableScan =
    new TableScan(table, snapshotId, asOfMillis, rowFilter, projection, incremental, currentSchema = true)
  def asOfTime(millis: Long): TableScan =
    new TableScan(table, snapshotId, Some(millis), rowFilter, projection, incremental, currentSchema)
  def filter(expr: Expr): TableScan =
    new TableScan(table, snapshotId, asOfMillis, Exprs.and(rowFilter, expr), projection, incremental, currentSchema)
  def select(cols: String*): TableScan =
    new TableScan(table, snapshotId, asOfMillis, rowFilter, Some(cols), incremental, currentSchema)
  /** Appends in (fromSnapshotId, toSnapshotId] — reference
    * api/.../TableScan.java:150-160. */
  def appendsBetween(from: Long, to: Long): TableScan =
    new TableScan(table, snapshotId, asOfMillis, rowFilter, projection, Some((from, to)), currentSchema)

  private def meta: TableMetadata = table.metadata

  def snapshot: Option[Snapshot] = {
    val m = meta
    snapshotId.map(id => m.snapshot(id).getOrElse(
        throw new IllegalArgumentException(s"no snapshot $id")))
      .orElse(asOfMillis.flatMap(m.snapshotAsOfTime))
      .orElse(m.currentSnapshot)
  }

  /** Scan schema: current schema for current reads AND branch reads; the
    * snapshot's schema when explicitly time traveling (reference
    * BaseTableScan.schema(); branch semantics per public Iceberg). */
  def scanSchema: StructType = {
    val m = meta
    if (currentSchema || (snapshotId.isEmpty && asOfMillis.isEmpty)) m.schema
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
        val chain = m2.ancestors(Some(to))
        require(chain.nonEmpty, s"snapshot $to not found")
        // history completeness: the ancestor walk from `to` stops silently
        // at a missing (expired) parent — if that parent is NEWER than
        // `from`, appends inside the gap are unreconstructible and a
        // silent skip would hand an incremental consumer a hole instead
        // of an error (reference parity: SnapshotUtil.snapshotIdsBetween
        // throws "Cannot determine history"). `from` itself being expired
        // is fine: it's the exclusive bound, nothing in (from, to] is lost.
        chain.head.parentId.filter(_ > from).foreach { pid =>
          throw new IllegalStateException(
            s"cannot read incremental data in ($from, $to]: ancestor " +
              s"snapshot $pid was expired — history is incomplete")
        }
        // divergence: a `from` that still exists but is NOT in `to`'s
        // ancestry (rollback/set_current_snapshot moved the line, then new
        // commits) means the consumer's last-seen state is on an abandoned
        // branch — the numeric (from, to] filter would silently SKIP
        // retained-line appends with ids below `from` (reference parity:
        // IncrementalDataTableScan.java:147-148 requires `from` to be an
        // ancestor of `to`). An expired `from` passed the hole check above
        // and stays legal: it is the exclusive bound.
        if (m2.snapshot(from).isDefined && !chain.exists(_.snapshotId == from))
          throw new IllegalArgumentException(
            s"from snapshot $from is not an ancestor of to snapshot $to — " +
              "the table was rolled back past it; restart the incremental " +
              "read from a snapshot on the current line")
        val inRange = chain
          .filter(s => s.snapshotId > from && s.snapshotId <= to)
        // reference parity (IncrementalDataTableScan.snapshotsWithin): an
        // OVERWRITE inside the range is an ERROR — rows silently treated as
        // appends would resurrect overwritten data; replace/delete skip
        inRange.find(_.operation == "overwrite").foreach { s =>
          throw new UnsupportedOperationException(
            s"Found overwrite operation (snapshot ${s.snapshotId}), cannot " +
            s"support incremental data in snapshots ($from, $to]")
        }
        val snaps = inRange.filter(_.operation == "append")
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
    // tuple-carrying delete entries whose partition fails the projected
    // filter under their OWN spec. Dropping them is only sound when every
    // surviving data file shares that spec: cross-spec application is
    // conservative (Deletes.eqDeleteCanHit — tuples aren't comparable
    // across specs), so a delete pruned by its spec-1 tuple may still have
    // to mask surviving spec-0 rows. Whole-file consumers (deleteWhere's
    // copy-on-write rewrite) would otherwise resurrect those rows at a
    // newer sequence number.
    val tuplePruned = Seq.newBuilder[(DataFile, Long, Int)]
    val keptDataSpecs = scala.collection.mutable.HashSet[Int]()

    // summary-level pruning first (pure in-memory), then the surviving
    // manifests are read IN PARALLEL — manifest I/O + parse is what
    // dominates planning a large table from one node (reference
    // ManifestGroup.java:182-186 ParallelIterable). Entry filtering below
    // stays sequential in manifest order, so results are deterministic.
    val evaluated0 = manifests.map { mf =>
      val spec = m.specs(mf.specId)
      val partTypes = spec.resultTypes(schema)
      val projected =
        if (bound == AlwaysTrue || !spec.isPartitioned) AlwaysTrue
        else Projections.inclusive(bound, spec, schema)
      val mightMatch = projected == AlwaysTrue ||
        Evaluators.manifestMightMatch(projected, spec, mf.partitionSummaries, partTypes)
      (mf, projected, mightMatch)
    }
    // summary-pruning a DELETE manifest is only sound when every data
    // manifest that might match shares its spec: tuples aren't comparable
    // across specs, and the entry-level cross-spec guard (tuplePruned
    // below) can only see entries that were READ — a summary-skipped
    // delete manifest is the same resurrection hole one level up. Any
    // possibly-matching data manifest of another spec forces the delete
    // manifest back in; its entries then flow through the entry guard.
    val dataSpecsMaybe = evaluated0.collect {
      case (mf, _, true) if mf.content == FileContent.Data => mf.specId }.toSet
    val evaluated = evaluated0.map {
      case (mf, projected, false)
          if mf.content != FileContent.Data &&
            dataSpecsMaybe.exists(_ != mf.specId) =>
        (mf, projected, true)
      case other => other
    }
    val entriesByPath: Map[String, Seq[ManifestEntry]] =
      TableScan.readManifestsParallel(table,
        evaluated.collect { case (mf, _, true) => mf }, schema)

    evaluated.foreach { case (mf, projected, mightMatch) =>
      filesTotal += mf.addedFilesCount + mf.existingFilesCount
      if (mightMatch) {
        manifestsScanned += 1
        entriesByPath(mf.path).foreach { e =>
          if (e.status != EntryStatus.Deleted) {
            val keepByAdded = incremental.isEmpty ||
              (e.status == EntryStatus.Added &&
                manifests.exists(_.addedSnapshotId == e.snapshotId))
            // delete files with an EMPTY partition tuple are
            // partition-global (position deletes, DVs, unclustered eq
            // deletes) — partition pruning must not drop them, or masked
            // rows resurrect under any partition-filtered scan. Tuple-
            // carrying eq deletes prune under their own spec, but the drop
            // is deferred until the kept data specs are known (see
            // tuplePruned above).
            val partOk = projected == AlwaysTrue ||
              (e.file.content != FileContent.Data && e.file.partition.isEmpty) ||
              Projections.evalOnPartition(projected, e.file.partition)
            if (keepByAdded && partOk) {
              if (e.file.content == FileContent.Data) {
                if (bound == AlwaysTrue || Evaluators.inclusiveMetrics(bound, e.file)) {
                  tasks += FileScanTask(e.file, e.sequenceNumber, bound)
                  keptDataSpecs += mf.specId
                }
              } else deletes += ((e.file, e.sequenceNumber))
            } else if (keepByAdded && e.file.content != FileContent.Data) {
              tuplePruned += ((e.file, e.sequenceNumber, mf.specId))
              // NOTE: delete entries are NEVER pruned by the row filter
              // here — library consumers (deleteWhere's copy-on-write
              // rewrite, group-granular row-level ops) plan with a filter
              // but then read WHOLE files, where a filter-pruned equality
              // delete would resurrect masked rows. The DSv2 scan, which
              // re-applies the full filter as a residual, prunes its own
              // eq-delete entries (GraftScanBuilder.buildFileScan).
            }
          }
        }
      }
    }
    val ts = tasks.result()
    // a tuple-pruned delete stays dropped only if every kept data file is
    // of the delete's own spec; any cross-spec survivor forces it back in
    val keptDeletes = deletes.result() ++ tuplePruned.result().collect {
      case (f, seq, specId) if keptDataSpecs.exists(_ != specId) => (f, seq)
    }
    val plan = ScanPlan(ts, keptDeletes, manifests.size, manifestsScanned,
      filesTotal, ts.size)
    // scan observability (reference Listeners.notifyAll(new ScanEvent(...))
    // in BaseTableScan.planFiles): skipped entirely when nobody listens
    if (!Listeners.isEmpty)
      Listeners.notifyAll(ScanEvent(table.location,
        snapshot.map(_.snapshotId).getOrElse(-1L), bound,
        projection.getOrElse(schema.fieldNames.toSeq),
        plan.manifestsTotal, plan.manifestsScanned,
        plan.filesTotal, plan.filesScanned))
    plan
  }

  /** Materialize as a DataFrame: pruned file list → Spark parquet scan
    * (vectorized, codegen'd — SURVEY §7.0's "Catalyst owns the physical
    * plan"), schema-aligned by field id across schema versions, row-level
    * deletes applied, residual re-applied (reference residual-safety:
    * SparkScanBuilder.java:121-123). */
  def toDF(): DataFrame = dfFor(planFiles())

  /** Table rows plus the v3 row-lineage columns `_row_id` /
    * `_last_updated_sequence_number` ([[Lineage]]) — the library twin of
    * the DSv2 metadata columns. Computed files derive base + position
    * (parquet via `_metadata.row_index`, ORC/Avro via the row-path
    * counter readers), compacted files read their stored columns, pre-v3
    * files read NULL. Also the input for lineage-preserving clustered
    * rewrites (Actions.rewriteSorted / rewriteZOrdered). */
  def lineageDF(): DataFrame = dfFor(planFiles(), withLineage = true)

  /** Materialize an EXPLICIT plan (used by toDF and by the streaming
    * source's file-sliced micro-batches, which select a file subset of an
    * append range). */
  private[format] def dfFor(plan: ScanPlan,
      withLineage: Boolean = false): DataFrame = {
    val spark = table.spark
    val m = meta
    val schema = scanSchema
    val linCols = Seq(
      StructField(Lineage.RowIdColumn, LongType, nullable = true),
      StructField(Lineage.LastUpdatedColumn, LongType, nullable = true))
    if (plan.tasks.isEmpty) {
      val base = projectedSchema(schema)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        if (withLineage) StructType(base.fields ++ linCols) else base)
    }
    // per-file lineage constants (metadata-only): canonical path →
    // (first_row_id base, data sequence number); absent for stored/pre-v3
    lazy val linInfo: Map[String, (Long, Long)] =
      plan.tasks.flatMap(ts => ts.file.firstRowId match {
        case Some(b) if b >= 0 =>
          Some(ParquetIO.canonPath(ts.file.path) -> (b, ts.sequenceNumber))
        case _ => None
      }).toMap
    lazy val rowIdOf = udf((f: String, p: Long) => linInfo.get(f).map(i => i._1 + p))
    lazy val seqOf = udf((f: String) => linInfo.get(f).map(_._2))
    lazy val canonOf = udf((s: String) => ParquetIO.canonPath(s))

    val eqDeletes = plan.deleteFiles.filter(_._1.content == FileContent.EqualityDeletes)
    val posDeletes = plan.deleteFiles.filter(_._1.content == FileContent.PositionDeletes)

    // position deletes ride parquet's `_metadata.row_index`; ORC and Avro
    // groups a position delete actually TARGETS read through their planted
    // scans with a per-file position counter (scrubbedOrc / scanAvro —
    // position deletes are format-agnostic in the reference,
    // Deletes.java:70-123).
    // Target detection is one small driver read of the delete files' path
    // column, only on tables that mix formats under live position deletes.
    lazy val posTargets: Set[String] = Deletes.posDeleteTargetFiles(
      posDeletes.map(_._1), spark.sessionState.newHadoopConf())

    // group files by (writer schema, sequence number, file format) — the
    // seq key exists only when equality deletes are live, exactly like the
    // DSv2 path, so delete recency resolves per GROUP and no per-file
    // path→seq map ever enters the plan (a 100k-file scan previously
    // embedded a 100k-entry literal map in every equality-delete read)
    val grouped = plan.tasks.groupBy(t =>
      (t.file.schemaId, if (eqDeletes.isEmpty) 0L else t.sequenceNumber,
        t.file.fileFormat,
        // lineage splits groups by read strategy, like the DSv2 path:
        // 1 = computed (base + position), 2 = stored columns, 0 = null
        if (!withLineage) 0
        else Lineage.modeOf(t.file, t.sequenceNumber) match {
          case _: Lineage.Computed => 1
          case Lineage.Stored => 2
          case Lineage.Absent => 0
        }))
    val parts = grouped.toSeq.sortBy(_._1).flatMap {
      case ((schemaId, seq, fmt, linKind), tasks) =>
      val fileSchema = m.schemas.getOrElse(schemaId, schema)
      val groupPos = posDeletes.nonEmpty && (fmt match {
        case FileFormats.Parquet => true // row-index column is free
        case _ => tasks.exists(t => // orc/avro: only targeted groups pay
          posTargets.contains(ParquetIO.canonPath(t.file.path)))
      })
      // computed-lineage ORC/Avro groups need row positions even without
      // live position deletes
      val posRead = groupPos ||
        (withLineage && linKind == 1 && fmt != FileFormats.Parquet)
      // parquet/orc read through a metadata-fed FileIndex (HadoopFsRelation
      // over GraftFileIndex, the same index the DSv2 and streaming paths
      // use): spark.read.parquet(paths) existence-checks every root path on
      // the driver at analysis time — 100k files means 100k stat calls
      // (HEADs, on an object store) before the first byte of data. Sizes
      // are already committed in the manifests; planning must not re-derive
      // them from the filesystem.
      def readIndexed(files: Seq[DataFile], clean: StructType): DataFrame = {
        val fileFormat = fmt match {
          case FileFormats.Orc =>
            new org.apache.spark.sql.execution.datasources.orc.OrcFileFormat()
          case _ =>
            new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
        }
        spark.baseRelationToDataFrame(
          org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            new graft.connector.GraftFileIndex(spark, files),
            StructType(Nil), clean, None, fileFormat, Map.empty)(spark))
      }
      def readTasks(ts: Seq[FileScanTask]): DataFrame = {
        // stored-lineage files (compaction outputs) physically carry the
        // two lineage columns — read them like data columns, kept through
        // the alignment projection
        val linRead = withLineage && linKind == 2
        val clean = StructType(stripIds(fileSchema).fields ++
          (if (linRead) linCols else Nil))
        val linKeep =
          if (linRead) Seq(Lineage.RowIdColumn, Lineage.LastUpdatedColumn)
          else Nil
        // scrub-routed ORC scans get no optimizer column pruning (the scan
        // is planted post-pushdown), so prune here: only file columns whose
        // field id survives into the target schema AND is actually consumed
        // downstream — the scan projection, the row filter's references,
        // and this group's applicable equality-delete keys. Unconsumed
        // target columns read as typed nulls (alignToSchema's absent-id
        // branch) and are dropped by the final projection. The ROUTING
        // check runs on the pruned set too — a scan projecting no float
        // leaf keeps the vectorized OrcScan even if the table has one.
        lazy val neededIds: Option[Set[Int]] = projection.map { cols =>
          val byName = schema.fields.map(f => f.name -> FieldIds.idOf(f)).toMap
          (cols ++ Exprs.references(rowFilter)).flatMap(byName.get).toSet ++
            eqDeletes.filter(_._2 > seq).flatMap(_._1.equalityIds)
        }
        lazy val readFileSchema: StructType = {
          val targetIds = schema.fields.map(FieldIds.idOf).toSet
          val pruned = fileSchema.fields.filter { f =>
            val id = FieldIds.idOf(f)
            targetIds.contains(id) && neededIds.forall(_.contains(id))
          }
          // empty projections (pure row counting) still need one stream
          if (pruned.isEmpty && fileSchema.fields.nonEmpty)
            StructType(fileSchema.fields.take(1))
          else StructType(pruned)
        }
        lazy val cleanScan: StructType =
          StructType(stripIds(readFileSchema).fields ++
            (if (linRead) linCols else Nil))
        // columnar ORC read through the mixed-sign-zero scrub: OrcIO's
        // batch iterator + Spark's own OrcColumnVector wrappers, planted
        // as a DSv2 scan relation — full vectorization, no OrcStruct /
        // per-row conversion (the pre-r21 shape converted every row four
        // times: batch → OrcStruct → InternalRow → Row → re-encode)
        def scrubbedOrc(withPos: Boolean): DataFrame = {
          val sconf = new org.apache.spark.util.SerializableConfiguration(
            spark.sessionState.newHadoopConf())
          val scan = new graft.connector.GraftOrcRowScan(cleanScan,
            ts.map(t => (t.file.path, t.file.fileSizeInBytes,
              if (withPos) Seq(org.apache.spark.unsafe.types.UTF8String
                .fromString(ParquetIO.canonPath(t.file.path)))
              else Nil)),
            sconf,
            partConsts = if (withPos) StructType(Seq(
              StructField("_g_file", StringType, nullable = false)))
            else new StructType(),
            withRowIndex = withPos,
            maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes,
            minPartitions = spark.sparkContext.defaultParallelism)
          val df = org.apache.spark.sql.execution.datasources.v2.GraftV2Shims
            .scanToDF(spark, scan, s"graft-orc-scrub(${ts.size} files)")
          if (withPos) df.withColumnRenamed("_graft_row_index", "_g_pos")
          else df
        }
        // avro twin: the DSv2 GraftAvroScan planted the same way — its
        // readers produce InternalRow directly, replacing the prior
        // RDD-of-external-Rows shape (Catalyst-to-Scala converter + Row
        // re-encode per row, and NO column pruning since an RDD-backed
        // DataFrame materializes every column before Catalyst sees it).
        // With positions the canonical file path rides as a per-file
        // partition constant and files stay unsplit (absolute positions);
        // without, large container files split into sync-bounded ranges.
        def scanAvro(withPos: Boolean): DataFrame = {
          val sconf = new org.apache.spark.util.SerializableConfiguration(
            spark.sessionState.newHadoopConf())
          val scan = new graft.connector.GraftAvroScan(cleanScan,
            if (withPos) StructType(Seq(
              StructField("_g_file", StringType, nullable = false)))
            else new StructType(),
            ts.map(t => (t.file.path, t.file.fileSizeInBytes,
              if (withPos) Seq(org.apache.spark.unsafe.types.UTF8String
                .fromString(ParquetIO.canonPath(t.file.path)))
              else Nil)),
            sconf,
            spark.sessionState.conf.filesMaxPartitionBytes,
            withRowIndex = withPos)
          val df = org.apache.spark.sql.execution.datasources.v2.GraftV2Shims
            .scanToDF(spark, scan, s"graft-avro(${ts.size} files)")
          if (withPos) df.withColumnRenamed("_graft_row_index", "_g_pos")
          else df
        }
        fmt match {
          case FileFormats.Orc if posRead =>
            // scrubbed columnar read carrying (_g_file, _g_pos) — kept
            // through the alignment projection for the position anti-join
            // below (one partition per file keeps positions absolute).
            // fileSchema is MASKED to the read columns so pruned-away
            // target columns take the null branch instead of resolving
            // against a column the scan never produced.
            alignToSchema(scrubbedOrc(withPos = true),
              readFileSchema, schema, keep = Seq("_g_file", "_g_pos") ++ linKeep)
          case FileFormats.Orc if Types.hasFloatLeaf(cleanScan) =>
            // double/float reads leave Spark's OrcScan even without live
            // position deletes: orc-core's collapsed mixed-sign-zero
            // batches (OrcIO.ZeroSignScrubReader) have no interception
            // seam there, and compaction's rewrite reader MATERIALIZES
            // what it reads. Scans projecting no floating-point leaf (the
            // flag only misfires on ±0.0) keep the vectorized reader below.
            alignToSchema(scrubbedOrc(withPos = false),
              readFileSchema, schema, keep = linKeep)
          case FileFormats.Avro if posRead =>
            alignToSchema(scanAvro(withPos = true),
              readFileSchema, schema, keep = Seq("_g_file", "_g_pos") ++ linKeep)
          case FileFormats.Avro =>
            alignToSchema(scanAvro(withPos = false),
              readFileSchema, schema, keep = linKeep)
          case _ =>
            alignToSchema(readIndexed(ts.map(_.file), clean), fileSchema,
              schema, keep = linKeep)
        }
      }
      // identity-partition source columns absent from the FILES (imported
      // hive layouts — the column lives only in directory names / partition
      // tuples): sub-group by tuple value and fill as typed literals, the
      // library-path analog of the reference's PartitionUtil.constantsMap
      val fileIds = fileSchema.fields.map(FieldIds.idOf).toSet
      val fills = schema.fields.toSeq
        .filter(tf => !fileIds.contains(FieldIds.idOf(tf)))
        .filter(tf => m.specs.values.exists(_.fields.exists(pf =>
          pf.sourceId == FieldIds.idOf(tf) && pf.transform == Transforms.IdentityT)))
      val subs: Seq[DataFrame] =
        if (fills.isEmpty) Seq(readTasks(tasks))
        else tasks.groupBy { ts =>
          val sp = m.specs(ts.file.specId)
          fills.map(tf => sp.fields.find(pf =>
              pf.sourceId == FieldIds.idOf(tf) && pf.transform == Transforms.IdentityT)
            .map(pf => ts.file.partition.getOrElse(pf.name, null)).getOrElse(null))
        }.toSeq.sortBy(_._1.mkString("/")).map { case (vals, sub) =>
          fills.zip(vals).foldLeft(readTasks(sub)) { case (d, (tf, v)) =>
            // alignToSchema emitted a null column in target position;
            // withColumn replaces it in place, preserving column order
            d.withColumn(tf.name,
              Values.toLiteral(v, Types.cleanType(tf.dataType)))
          }
        }
      // deletes apply per sub-read, while the plan is still a pure
      // projection over the file relation (`_metadata` columns do not
      // resolve above joins/unions): positions first, then only the
      // equality sets NEWER than this group's files
      subs.map { df0 =>
        // lineage attaches BEFORE the delete anti-joins (`_metadata` does
        // not resolve above a join); values are per-row facts, so dead
        // rows simply drop afterwards and survivors keep their identity
        val withLin =
          if (!withLineage) df0
          else linKind match {
            case 1 if fmt == FileFormats.Parquet =>
              val cf = canonOf(col("_metadata.file_path"))
              df0.withColumn(Lineage.RowIdColumn,
                  rowIdOf(cf, col("_metadata.row_index")))
                .withColumn(Lineage.LastUpdatedColumn, seqOf(cf))
            case 1 =>
              // _g_file is already canonical in the row-path readers
              val base = df0.withColumn(Lineage.RowIdColumn,
                  rowIdOf(col("_g_file"), col("_g_pos")))
                .withColumn(Lineage.LastUpdatedColumn, seqOf(col("_g_file")))
              if (groupPos) base else base.drop("_g_file", "_g_pos")
            case 2 => df0 // stored columns already read
            case _ => df0
              .withColumn(Lineage.RowIdColumn, lit(null).cast(LongType))
              .withColumn(Lineage.LastUpdatedColumn, lit(null).cast(LongType))
          }
        val posApplied =
          if (!groupPos) withLin
          else if (fmt == FileFormats.Parquet) applyPosDeletes(withLin, posDeletes)
          else antiJoinPositions(withLin, posDeletes) // orc/avro row-path reads
        applyEqDeletes(posApplied, eqDeletes.filter(_._2 > seq), schema)
      }
    }
    var df = parts.reduce(_ unionByName _)

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
    Types.cleanType(st).asInstanceOf[StructType]

  /** Rename/add columns so an old-schema read matches the scan schema —
    * id-based resolution at EVERY struct level (reference
    * SparkSchemaUtil.prune / NameMapping; nested per UpdateSchema.java's
    * nested evolution). */
  private def alignToSchema(df: DataFrame, fileSchema: StructType,
      target: StructType, keep: Seq[String] = Nil): DataFrame = {
    val fileById = fileSchema.fields.map(f => FieldIds.idOf(f) -> f).toMap
    val cols = target.fields.map { tf =>
      fileById.get(FieldIds.idOf(tf)) match {
        case Some(ff) => alignCol(col(ff.name), ff.dataType, tf.dataType).as(tf.name)
        case None =>
          // column added after this file was written: its initial default
          // backfills every row (iceberg v3); absent default reads null
          Defaults.of(tf) match {
            case Some(v) => Values.toLiteral(v, Types.cleanType(tf.dataType)).as(tf.name)
            case None => lit(null).cast(Types.cleanType(tf.dataType)).as(tf.name)
          }
      }
    }
    df.select((cols.toSeq ++ keep.map(col)): _*)
  }

  /** Align one file-side column to its target type: struct levels with ids
    * on both sides rebuild field-by-field by id (nested rename = pick by
    * id, nested add = null, nested promote = cast); anything else is a
    * plain cast (also the legacy fallback for id-less nested fields). */
  private def alignCol(src: Column, fileDt: DataType, targetDt: DataType): Column =
    (fileDt, targetDt) match {
      case (fs: StructType, ts: StructType)
          if FieldIds.structHasIds(fs) && FieldIds.structHasIds(ts) =>
        val byId = fs.fields.map(f => FieldIds.idOf(f) -> f).toMap
        val parts = ts.fields.map { tf =>
          byId.get(FieldIds.idOf(tf)) match {
            case Some(ff) =>
              alignCol(src.getField(ff.name), ff.dataType, tf.dataType).as(tf.name)
            case None =>
              // nested add: its initial default backfills (iceberg v3);
              // absent default reads null
              Defaults.of(tf) match {
                case Some(v) =>
                  Values.toLiteral(v, Types.cleanType(tf.dataType)).as(tf.name)
                case None =>
                  lit(null).cast(Types.cleanType(tf.dataType)).as(tf.name)
              }
          }
        }
        // struct() of nulls is a non-null struct — preserve struct-level nulls
        when(src.isNotNull, struct(parts.toSeq: _*))
          .otherwise(lit(null))
          .cast(Types.cleanType(ts))
      case _ => src.cast(Types.cleanType(targetDt))
    }

  /** Equality deletes for ONE (schema, seq) group (reference
    * EqualitySetDeleteFilter, core/.../deletes/Deletes.java:128): anti-join
    * on the equality columns against every delete set newer than the group.
    * Seq-gating already happened at the caller (group seq vs delete seq), so
    * the join needs no per-row sequence column. */
  private def applyEqDeletes(df0: DataFrame, dels: Seq[(DataFile, Long)],
      schema: StructType): DataFrame = {
    if (dels.isEmpty) return df0
    val spark = table.spark
    var cur = df0
    // sub-group by file-side key names: delete files staged under an older
    // schema may carry the key columns under pre-rename names — reading by
    // CURRENT name would null-fill and resurrect their deletes
    val groups = dels.groupBy(d => (d._1.equalityIds,
        Deletes.eqKeyFileNames(table.metadata.schemas, schema, d._1)))
    // loud-fail parity with the DSv2 path (DeleteKeyCache requireAll):
    // indexedDF rides Spark's ParquetFileFormat, which name-matches and
    // silently NULL-FILLS an absent key column — an all-null key set
    // anti-join-deletes the null-keyed data rows and drops every intended
    // delete. Validate each delete file's footer EXECUTOR-side (one tiny
    // job per scan, no driver stats — GDPR-scale sets stay distributed).
    locally {
      val checks = groups.toSeq.flatMap { case ((_, fileNames), group) =>
        group.map(_._1.path).distinct.map(p => (p, fileNames)) }
      val sconf = HadoopFileIO.sessionConf()
      spark.sparkContext
        .parallelize(checks, math.max(1, math.min(checks.size, 32)))
        .foreach { case (p, names) =>
          ParquetIO.requireColumns(p, names, sconf.value, "equality-delete") }
    }
    groups.foreach { case ((ids, fileNames), group) =>
      val fields = ids.map(id => FieldIds.findById(schema, id).get)
      val names = fields.map(_.name)
      // descriptor-backed read: a GDPR-scale delete set (thousands of
      // files) must not stat every path on the driver at analysis time
      val keySchema = StructType(fileNames.zip(fields).map { case (fn, f) =>
        StructField(fn, Types.cleanType(f.dataType), nullable = true) })
      val del = DataFileIO.indexedDF(spark,
        group.map(_._1).distinctBy(_.path), FileFormats.Parquet, keySchema)
        .toDF(names: _*) // positional rename back to scan-schema names
        .dropDuplicates(names)
      val cond = names.map(n => cur(n) <=> del(n)).reduce(_ && _)
      cur = cur.join(broadcast(del), cond, "left_anti")
    }
    cur
  }

  /** Position deletes (reference PositionStreamDeleteFilter, Deletes.java:
    * 60-123): anti-join on (_file, _pos) row metadata; broadcast-able —
    * delete files are per-commit churn, small relative to data at 100 TB.
    * No sequence gating: a position delete names its data file by path, and
    * paths are never reused. */
  private def applyPosDeletes(df0: DataFrame,
      posDeletes: Seq[(DataFile, Long)]): DataFrame = {
    // both sides canonicalize through the SAME helper, so any URI spelling
    // of the same file matches (file:/p vs /p vs file:///p; hdfs kept apart)
    val canon = udf((s: String) => ParquetIO.canonPath(s))
    antiJoinPositions(df0
      .withColumn("_g_file", canon(col("_metadata.file_path")))
      .withColumn("_g_pos", col("_metadata.row_index")), posDeletes)
  }

  /** The anti-join half: `df0` already carries canonical (_g_file, _g_pos)
    * columns (parquet: from row metadata; ORC: from the row-path counter). */
  private def antiJoinPositions(df0: DataFrame,
      posDeletes: Seq[(DataFile, Long)]): DataFrame = {
    val dels = Deletes.positionsDF(table.spark, posDeletes.map(_._1))
      .toDF("_g_file", "_g_pos")
    df0.join(broadcast(dels), Seq("_g_file", "_g_pos"), "left_anti")
      .drop("_g_file", "_g_pos")
  }

}

object TableScan {
  /** Shared bounded pool for manifest reads: planning is driver-side, so one
    * static daemon pool serves every concurrent scan without per-plan
    * thread churn (reference ManifestGroup's ParallelIterable worker pool,
    * core/.../util/ThreadPools.java). */
  private lazy val manifestPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      math.max(8, Runtime.getRuntime.availableProcessors()),
      (r: Runnable) => {
        val t = new Thread(r, "graft-manifest-reader")
        t.setDaemon(true)
        t
      })

  /** Parsed-manifest LRU, weighted by entry count. Manifest files are
    * immutable once written (UUID paths, never overwritten), so caching
    * the parse is always safe; the key carries the id-resolution schema
    * and partition types because the SAME bytes parse differently after a
    * schema/spec evolution. Sized so a ~200k-entry table plans hot with
    * zero parse work — the difference between a changelog/planning loop
    * that re-parses the whole tree per snapshot and one that parses each
    * manifest once (reference caches at the ContentCache/manifest layer
    * for the same reason). */
  private object ManifestCache {
    private val MaxWeight = 200000L
    private val map =
      new java.util.LinkedHashMap[AnyRef, (Seq[ManifestEntry], Long)](
        256, 0.75f, true)
    private var weight = 0L

    def getOrLoad(key: AnyRef, load: => Seq[ManifestEntry]): Seq[ManifestEntry] = {
      val hit = map.synchronized(Option(map.get(key)))
      hit match {
        case Some((e, _)) => e
        case None =>
          val e = load // parse outside the lock; racing loads duplicate work, not state
          val w = math.max(e.size.toLong, 1L)
          map.synchronized {
            if (map.get(key) == null) {
              map.put(key, (e, w))
              weight += w
              val it = map.entrySet().iterator()
              while (weight > MaxWeight && it.hasNext) {
                val eldest = it.next()
                weight -= eldest.getValue._2
                it.remove()
              }
            }
          }
          e
      }
    }
  }

  private[format] def cachedManifest(key: AnyRef,
      load: => Seq[ManifestEntry]): Seq[ManifestEntry] =
    ManifestCache.getOrLoad(key, load)

  /** Read many manifests concurrently; results keyed by manifest path so the
    * caller can process them in its own deterministic order. */
  private[format] def readManifestsParallel(table: GraftTable,
      manifests: Seq[ManifestFile],
      schema: StructType): Map[String, Seq[ManifestEntry]] =
    if (manifests.sizeIs <= 1)
      manifests.map(mf => mf.path -> table.readManifest(mf, schema)).toMap
    else {
      val futures = manifests.map(mf =>
        mf.path -> manifestPool.submit(
          new java.util.concurrent.Callable[Seq[ManifestEntry]] {
            override def call(): Seq[ManifestEntry] = table.readManifest(mf, schema)
          }))
      futures.map { case (p, f) => p -> f.get() }.toMap
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
  /** Data-file placement for this table's current properties (reference
    * Table.locationProvider()). */
  def locations: LocationProvider =
    LocationProviders.forTable(location, metadata.properties)
  def schema: StructType = metadata.schema
  def spec: PartitionSpec = metadata.spec
  def properties: Map[String, String] = metadata.properties
  def currentSnapshot: Option[Snapshot] = metadata.currentSnapshot
  def snapshots: Seq[Snapshot] = metadata.snapshots
  def history: Seq[SnapshotLogEntry] = metadata.snapshotLog

  def newScan(): TableScan = new TableScan(this)

  def toDF(): DataFrame = newScan().toDF()

  // ---- manifest I/O (shared with Commits/Actions) ----
  private[format] def partTypesOf(m: TableMetadata)(specId: Int): Seq[(String, DataType)] =
    GraftTable.partTypesOf(m)(specId)

  private[format] def readManifestList(m: TableMetadata, s: Snapshot): Seq[ManifestFile] =
    MetaCodec.readManifestList(ops.io.readBytes(s.manifestList), partTypesOf(m))

  private[format] def readManifest(mf: ManifestFile, schema: StructType): Seq[ManifestEntry] = {
    val m = metadata
    val types = partTypesOf(m)(mf.specId).toMap
    // promotion-safe pick shared by every manifest decode/encode site —
    // 8-byte post-promotion bounds must never decode through a 4-byte
    // branch (see FieldIds.idResolutionSchema)
    val idSchema = FieldIds.idResolutionSchema(m.schemas)
    TableScan.cachedManifest((mf.path, idSchema, types),
      MetaCodec.readManifest(ops.io.readBytes(mf.path), idSchema, types))
  }
}

object GraftTable {

  /** Partition-tuple result types of a spec, pure over the metadata (no
    * session state) so executor tasks can resolve manifests from a parsed
    * TableMetadata alone. */
  private[format] def partTypesOf(m: TableMetadata)(specId: Int): Seq[(String, DataType)] = {
    val spec = m.specs(specId)
    // resolve against any schema that has all source ids (latest wins)
    val sch = m.schemas.toSeq.sortBy(-_._1).map(_._2)
      .find(s => spec.fields.forall(f => FieldIds.findById(s, f.sourceId).isDefined))
      .getOrElse(m.schema)
    spec.resultTypes(sch)
  }
  /** Create a new (empty) table — metadata v1, no snapshot. */
  def create(spark: SparkSession, location: String, schema: StructType,
      specBuild: PartitionSpec.Builder => PartitionSpec.Builder = identity,
      properties: Map[String, String] = Map.empty): GraftTable = {
    val withIds = if (FieldIds.hasIds(schema)) schema else FieldIds.assignFresh(schema)
    val spec = specBuild(PartitionSpec.builderFor(withIds)).build(0)
    // `format-version` is a metadata FIELD, not a property: 2 (default) or
    // 3 (deletion vectors) — same surface as iceberg's table-property spell
    val fv = properties.get("format-version").map(_.trim.toInt).getOrElse(2)
    require(fv == 2 || fv == 3, s"unsupported format-version $fv (2 or 3)")
    val meta = TableMetadata(
      formatVersion = fv,
      tableUuid = java.util.UUID.randomUUID().toString,
      location = location,
      lastSequenceNumber = 0L,
      lastUpdatedMillis = System.currentTimeMillis(),
      lastColumnId = FieldIds.maxId(withIds),
      currentSchemaId = 0,
      schemas = Map(0 -> withIds),
      defaultSpecId = 0,
      specs = Map(0 -> spec),
      properties = properties - "format-version",
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
    LocalFileIO.deleteRecursive(location)
    create(spark, location, schema, specBuild, properties)
  }
}
