package graft.format

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changelog semantics (Changes.between / Changes.net): inserts from
  * appends, row-accurate deletes for metadata/equality/position deletes,
  * silence on replace commits, net collapse of copy-on-write churn. */
class ChangesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-changes-spec/$name"

  private def fresh(name: String, df: DataFrame): GraftTable = {
    val t = GraftTable.recreate(spark, tmp(name), df.schema)
    t
  }

  private def docs(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"text-$i", i % 3)).toDF("id", "body", "grp")

  test("appends emit INSERT rows with commit-ordered ordinals") {
    val t = fresh("appends", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 4).coalesce(1))
    GraftWrite.append(t, docs(4 until 6).coalesce(1))
    val ch = Changes.between(t)
    val byOrdinal = ch.groupBy(col(Changes.ChangeOrdinal), col(Changes.ChangeType))
      .agg(count(lit(1)).as("n")).orderBy(col(Changes.ChangeOrdinal))
      .as[(Int, String, Long)].collect().toSeq
    assert(byOrdinal === Seq((0, "INSERT", 4L), (1, "INSERT", 2L)))
    // ordinals carry the right snapshot ids in commit order
    val snaps = t.snapshots.map(_.snapshotId)
    val ords = ch.select(col(Changes.ChangeOrdinal), col(Changes.CommitSnapshotId))
      .distinct().as[(Int, Long)].collect().toMap
    assert(ords === Map(0 -> snaps.head, 1 -> snaps.last))
  }

  test("expiration horizon: pre-horizon state becomes the baseline INSERT batch") {
    val t = fresh("horizon", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 4).coalesce(1)) // A — will be expired
    GraftWrite.append(GraftTable.load(spark, tmp("horizon")),
      docs(4 until 6).coalesce(1)) // B
    Deletes.deleteByEquality(GraftTable.load(spark, tmp("horizon")),
      Seq(1L).toDF("id")) // C
    // expire A: ancestors() now truncates at B — a naive walk would seed
    // the baseline with only B's appends, silently dropping A's rows from
    // the changelog (or re-attributing them to C)
    Commits.expireSnapshots(GraftTable.load(spark, tmp("horizon")),
      olderThanMillis = System.currentTimeMillis() + 1000, retainLast = 2)
    val t2 = GraftTable.load(spark, tmp("horizon"))
    assert(t2.snapshots.size === 2, "fixture: A must be expired")
    val ch = Changes.between(t2)
    // replaying the changelog reconstructs the table exactly: horizon
    // snapshot B's FULL state (A's rows + B's rows) as INSERT ordinal 0,
    // then C's delete of id=1
    val net = Changes.net(ch).select("id").as[Long].collect().sorted
    assert(net.toSeq === GraftTable.load(spark, tmp("horizon"))
      .toDF().select("id").as[Long].collect().sorted.toSeq)
    val byType = ch.groupBy(col(Changes.ChangeType))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(byType("INSERT") === 6L, "baseline must carry ALL pre-horizon rows")
    assert(byType("DELETE") === 1L)
    // ordinals stay dense: baseline 0, delete commit 1
    val ords = ch.select(col(Changes.ChangeOrdinal)).distinct()
      .as[Int].collect().sorted
    assert(ords.toSeq === Seq(0, 1))
  }

  test("from is exclusive and must be an ancestor of to") {
    val t = fresh("range", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 4).coalesce(1))
    GraftWrite.append(t, docs(4 until 6).coalesce(1))
    val ids = t.snapshots.map(_.snapshotId)
    val ch = Changes.between(t, from = Some(ids.head))
    assert(ch.count() === 2)
    assert(Changes.between(t, from = Some(ids.last)).count() === 0)
    intercept[IllegalArgumentException] {
      Changes.between(t, from = Some(ids.head + 999)).count()
    }
  }

  test("equality-delete commit emits exactly the suppressed rows as DELETE") {
    val t = fresh("eqdel", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 8).coalesce(2))
    Deletes.deleteByEquality(t, Seq(1L, 5L).toDF("id"))
    val ch = Changes.between(t)
    val dels = ch.filter(col(Changes.ChangeType) === "DELETE")
      .select("id").as[Long].collect().sorted.toSeq
    assert(dels === Seq(1L, 5L))
    assert(ch.filter(col(Changes.ChangeType) === "INSERT").count() === 8)
    // and the delete carries the second commit's ordinal
    val delOrd = ch.filter(col(Changes.ChangeType) === "DELETE")
      .select(col(Changes.ChangeOrdinal)).distinct().as[Int].collect().toSeq
    assert(delOrd === Seq(1))
  }

  test("position-delete commit emits exactly the targeted rows as DELETE") {
    val t = fresh("posdel", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 6).coalesce(1))
    val path = t.newScan().planFiles().tasks.head.file.path
    val pos = spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") === 2L || col("id") === 4L)
      .select("file_path", "pos")
    Deletes.deletePositions(t, pos)
    val dels = Changes.between(t).filter(col(Changes.ChangeType) === "DELETE")
      .select("id").as[Long].collect().sorted.toSeq
    assert(dels === Seq(2L, 4L))
  }

  test("metadata-only delete emits the removed files' live rows as DELETE") {
    // drop a whole file by a filter its stats prove (ids 0-3 < 4)
    val t2 = fresh("metadel2", docs(0 until 0))
    GraftWrite.append(t2, docs(0 until 4).coalesce(1))
    GraftWrite.append(t2, docs(4 until 8).coalesce(1))
    Commits.deleteByFilter(t2, Exprs.lt("id", 4L))
    val ch = Changes.between(t2)
    val dels = ch.filter(col(Changes.ChangeType) === "DELETE")
      .select("id").as[Long].collect().sorted.toSeq
    assert(dels === Seq(0L, 1L, 2L, 3L))
  }

  test("rows already dead at the parent are not re-reported when their file is removed") {
    val t = fresh("deadrows", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 4).coalesce(1))
    Deletes.deleteByEquality(t, Seq(1L).toDF("id"))      // kill id=1 (MoR)
    Commits.deleteByFilter(t, Exprs.lt("id", 100L))      // drop the file
    val ch = Changes.between(t)
    val dels = ch.filter(col(Changes.ChangeType) === "DELETE")
      .groupBy("id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    // id=1 deleted once (by the eq delete), never again; others once each
    assert(dels === Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("changelog over a branch's line sees branch DML, not main's") {
    // toId = branch head: the ancestry walk follows the branch's parents,
    // so the changelog reports the branch's own DML while commits on main
    // after the fork stay invisible (and vice versa)
    val t = fresh("branchcdc", docs(0 until 8))
    GraftWrite.append(t, docs(0 until 8).coalesce(1))
    val base = t.currentSnapshot.get.snapshotId
    Commits.createBranch(t, "work")
    // branch: DELETE WHERE id < 2, committed to the ref (CoW or
    // metadata-only — either way a row-DELETING commit, unlike
    // rewriteFiles/"replace" which is row-preserving and rightly silent)
    Deletes.deleteWhere(t, Exprs.lt("id", 2L), branch = Some("work"))
    // main: unrelated append AFTER the fork
    GraftWrite.append(t, docs(100 until 104).coalesce(1))
    val t2 = GraftTable.load(spark, t.location)
    val brHead = t2.metadata.refSnapshotId("work")
    // net: the branch DELETE fell back to a CoW rewrite, so the raw
    // changelog carries carryover churn (same as on main) — the net view
    // must collapse it to exactly the logical delete
    val br = Changes.net(Changes.between(t2, Some(base), brHead))
      .select(col("id"), col(Changes.ChangeType)).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(br === Seq((0L, "DELETE"), (1L, "DELETE")),
      s"branch changelog must be the branch's own DML: ${br.toSeq}")
    // the main line since the fork reports only its append
    val mn = Changes.between(t2, Some(base), t2.metadata.currentSnapshotId)
      .select(col("id"), col(Changes.ChangeType)).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(mn === (100L until 104L).map((_, "INSERT")),
      s"main changelog must not see branch DML: ${mn.toSeq}")
  }

  test("replace commits (compaction) emit nothing") {
    val t = fresh("compact", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 4).coalesce(1))
    GraftWrite.append(t, docs(4 until 8).coalesce(1))
    val res = Actions.forTable(t).rewriteDataFiles(targetSizeBytes = 1L << 30)
    assert(t.metadata.currentSnapshot.get.operation === "replace")
    val ch = Changes.between(t)
    assert(ch.filter(col(Changes.ChangeType) === "DELETE").count() === 0)
    assert(ch.count() === 8)
    // and the baseline advances THROUGH the replace: a delete after
    // compaction diffs against the compacted file set
    Deletes.deleteByEquality(t, Seq(6L).toDF("id"))
    val dels = Changes.between(t).filter(col(Changes.ChangeType) === "DELETE")
      .select("id").as[Long].collect().toSeq
    assert(dels === Seq(6L))
  }

  test("net collapses copy-on-write churn to the logical delete") {
    val t = fresh("cownet", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 6).coalesce(1))
    Deletes.deleteWhere(t, Exprs.equal("id", 3L)) // CoW: rewrites the file
    val ch = Changes.between(t)
    // physical log: 6 inserts, then 6 deletes + 5 re-inserts (file rewrite)
    assert(ch.filter(col(Changes.ChangeType) === "DELETE").count() === 6)
    val netted = Changes.net(
      Changes.between(t, from = Some(t.snapshots.head.snapshotId)))
    // net effect of the CoW commit alone: exactly one row deleted
    val rows = netted.select(col("id"), col(Changes.ChangeType))
      .as[(Long, String)].collect().toSeq
    assert(rows === Seq((3L, "DELETE")))
    // net over the whole history: the 5 survivors inserted, nothing else
    val full = Changes.net(Changes.between(t))
    assert(full.filter(col(Changes.ChangeType) === "DELETE").count() === 0)
    assert(full.select("id").as[Long].collect().sorted.toSeq ===
      Seq(0L, 1L, 2L, 4L, 5L))
  }

  test("net: a key inserted then deleted inside the range disappears") {
    val t = fresh("netrange", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 4).coalesce(1))  // commit 1
    GraftWrite.append(t, docs(4 until 8).coalesce(1))  // commit 2
    Deletes.deleteWhere(t, Exprs.equal("id", 5L))       // commit 3 (CoW)
    // the WHOLE range: id 5 was born and died inside it — it must leave
    // no trace, while every other id nets to exactly one INSERT
    val full = Changes.net(Changes.between(t))
      .select(col("id"), col(Changes.ChangeType)).as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    assert(full === (0L until 8L).filterNot(_ == 5L).map(_ -> "INSERT"))
    // a SUB-range that excludes the birth commit still reports the delete
    // (and the CoW rewrite's carryover churn nets to nothing)
    val tail = Changes.net(Changes.between(t,
        from = Some(t.snapshots(1).snapshotId)))
      .select(col("id"), col(Changes.ChangeType)).as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    assert(tail === Seq((5L, "DELETE")))
  }

  test("removeCarryovers cancels copy-on-write rewrite churn per commit") {
    val t = fresh("carry", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 6).coalesce(1))
    Deletes.deleteWhere(t, Exprs.equal("id", 3L)) // CoW: rewrites the file
    val raw = Changes.between(t)
    // physical log: 6 inserts, then 6 deletes + 5 re-inserts (carryovers)
    assert(raw.count() === 17)
    val cleaned = Changes.removeCarryovers(raw)
    // per-commit view after cancellation: ordinal 0 inserts 0..5, ordinal 1
    // deletes ONLY the logically removed row
    val byOrdinal = cleaned
      .groupBy(col(Changes.ChangeOrdinal), col(Changes.ChangeType))
      .agg(count(lit(1)).as("n")).orderBy(col(Changes.ChangeOrdinal))
      .as[(Int, String, Long)].collect().toSeq
    assert(byOrdinal === Seq((0, "INSERT", 6L), (1, "DELETE", 1L)))
    assert(cleaned.filter(col(Changes.ChangeType) === "DELETE")
      .select("id").as[Long].collect().toSeq === Seq(3L))
    // duplicate rows that only partially cancel keep their surplus: append
    // the same row twice, CoW-delete one copy of it
    val d = fresh("carrydup", docs(0 until 0))
    val dup = Seq((9L, "same", 0), (9L, "same", 0)).toDF("id", "body", "grp")
    GraftWrite.append(d, dup.coalesce(1))
    // rewrite the file keeping only ONE copy (overwrite with filter)
    GraftWrite.overwrite(d,
      Seq((9L, "same", 0)).toDF("id", "body", "grp").coalesce(1),
      Exprs.equal("id", 9L))
    val dc = Changes.removeCarryovers(Changes.between(d,
      from = Some(d.snapshots.head.snapshotId)))
    val kinds = dc.select(col(Changes.ChangeType)).as[String].collect().toSeq
    assert(kinds === Seq("DELETE"), s"surplus delete must survive: $kinds")
  }

  test("computeUpdates pairs same-key DELETE+INSERT into update images") {
    val t = fresh("updates", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 4).coalesce(1))
    // one commit that updates id=1 (CoW rewrite changes its body), keeps
    // the rest as carryovers, via deleteWhere + append in one... simplest:
    // overwrite the file with id=1 modified — DELETE(old 1) + INSERT(new 1)
    // + carryovers for 0,2,3 in the same commit
    val updated = Seq((0L, "text-0", 0), (1L, "CHANGED", 1),
      (2L, "text-2", 2), (3L, "text-3", 0)).toDF("id", "body", "grp")
    GraftWrite.overwrite(t, updated.coalesce(1), Exprs.alwaysTrue)
    val cleaned = Changes.removeCarryovers(
      Changes.between(t, from = Some(t.snapshots.head.snapshotId)))
    val upd = Changes.computeUpdates(cleaned, Seq("id"))
    val rows = upd.select(col("id"), col("body"), col(Changes.ChangeType))
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(rows === Seq(
      (1L, "CHANGED", Changes.UpdateAfter),
      (1L, "text-1", Changes.UpdateBefore)))
    // a key with only an INSERT in its commit keeps its plain type
    GraftWrite.append(t, docs(10 until 11).coalesce(1))
    val all = Changes.computeUpdates(Changes.removeCarryovers(
      Changes.between(t, from = Some(t.snapshots.head.snapshotId))), Seq("id"))
    val kinds = all.select(col("id"), col(Changes.ChangeType))
      .as[(Long, String)].collect().toSet
    assert(kinds === Set((1L, Changes.UpdateBefore), (1L, Changes.UpdateAfter),
      (10L, "INSERT")))
  }

  test("create_changelog_view with identifier_columns emits update images") {
    val wh = java.nio.file.Files.createTempDirectory("graft-cdcup").toString
    spark.conf.set("spark.sql.catalog.cdcup", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdcup.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdcup.db")
    spark.sql("""CREATE TABLE cdcup.db.t (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.update.mode'='merge-on-read')""")
    spark.sql("INSERT INTO cdcup.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("UPDATE cdcup.db.t SET v = 'A' WHERE id = 1")
    spark.sql("""CALL cdcup.system.create_changelog_view(
                   table => 'db.t', changelog_view => 'cdcup_changes',
                   identifier_columns => 'id')""")
    val rows = spark.sql(
      """SELECT id, v, _change_type FROM cdcup_changes
         ORDER BY _change_ordinal, _change_type, id""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows === Seq((1L, "a", "INSERT"), (2L, "b", "INSERT"),
      (1L, "A", Changes.UpdateAfter), (1L, "a", Changes.UpdateBefore)))
    // net_changes + identifier_columns is refused
    intercept[Exception] {
      spark.sql("""CALL cdcup.system.create_changelog_view(
                     table => 'db.t', net_changes => true,
                     identifier_columns => 'id')""").collect()
    }
  }

  test("a 200-commit range builds a bounded plan and stays correct") {
    val t = fresh("manycommits", docs(0 until 0))
    // stage 200 one-row files in ONE job, then give each its own commit —
    // the changelog cost under test is metadata/plan shape, not file writes
    val dir = tmp("manycommits-stage")
    docs(0 until 200).repartitionByRange(200, col("id"))
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .sorted.toSeq
    assert(files.size === 200)
    val m0 = t.metadata
    val fms = Metrics.forFiles(spark, files, m0.schema,
      Metrics.modesFor(m0.schema, m0.properties))
    files.foreach { f =>
      val fm = fms(f)
      Commits.fastAppend(t, Seq(DataFile(path = f,
        recordCount = fm.recordCount, fileSizeInBytes = fm.fileSize,
        schemaId = m0.currentSchemaId, specId = m0.defaultSpecId,
        valueCounts = fm.valueCounts, nullValueCounts = fm.nullValueCounts,
        lowerBounds = fm.lowerBounds, upperBounds = fm.upperBounds,
        splitOffsets = fm.splitOffsets)))
    }
    assert(t.snapshots.size === 200)
    val ch = Changes.between(t, maxPlanWidth = 16)
    // plan is ceil(200/16) = 13 checkpointed leaves, not 200 scan branches
    val nodes = ch.queryExecution.analyzed.collect { case n => n }.size
    assert(nodes < 80, s"changelog plan has $nodes nodes — union not bounded?")
    assert(ch.count() === 200)
    assert(ch.filter(col(Changes.ChangeType) === "INSERT").count() === 200)
    val ords = ch.select(col(Changes.ChangeOrdinal)).distinct().count()
    assert(ords === 200)
    // batched and unbatched plans agree row-for-row
    val unbatched = Changes.between(t)
    assert(ch.select("id").as[Long].collect().sorted.toSeq ===
      unbatched.select("id").as[Long].collect().sorted.toSeq)
  }

  test("timestamp ranges resolve to snapshot boundaries") {
    val t = fresh("tsrange", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 2).coalesce(1))
    val afterFirst = t.metadata.currentSnapshot.get.timestampMillis
    Thread.sleep(5)
    GraftWrite.append(t, docs(2 until 5).coalesce(1))
    // start at the first commit's time → exclusive: only the second commit
    val (from, to) = Changes.rangeForTimestamps(t, Some(afterFirst), None)
    assert(from === Some(t.snapshots.head.snapshotId) && to.isEmpty)
    assert(Changes.between(t, from, to).count() === 3)
    // start before the first snapshot = since table creation
    val (f2, _) = Changes.rangeForTimestamps(t, Some(afterFirst - 100000), None)
    assert(f2.isEmpty)
    // end before the first snapshot is an error, not an empty range
    intercept[IllegalArgumentException](
      Changes.rangeForTimestamps(t, None, Some(afterFirst - 100000)))
  }

  test("changelog source streams each commit's changes exactly once") {
    val t = fresh("stream", docs(0 until 0))
    val src = Streaming.changelogSource(t)
    assert(src.nextBatch().isEmpty) // empty table: nothing to stream
    GraftWrite.append(t, docs(0 until 4).coalesce(1))
    GraftWrite.append(t, docs(4 until 6).coalesce(1))
    val b1 = src.nextBatch().get // both commits in one batch
    assert(b1.filter(col(Changes.ChangeType) === "INSERT").count() === 6)
    assert(src.nextBatch().isEmpty) // caught up: offset advanced
    Deletes.deleteByEquality(t, Seq(0L, 5L).toDF("id"))
    val b2 = src.nextBatch().get // only the delete commit streams
    val rows = b2.select(col(Changes.ChangeType), col("id"))
      .as[(String, Long)].collect().sorted.toSeq
    assert(rows === Seq(("DELETE", 0L), ("DELETE", 5L)))
    assert(src.nextBatch().isEmpty)
  }

  test("changelog source slices batches at commit granularity") {
    val t = fresh("streamslice", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 4).coalesce(1))
    GraftWrite.append(t, docs(4 until 6).coalesce(1))
    GraftWrite.append(t, docs(6 until 9).coalesce(1))
    // start AFTER the first commit, one commit per batch
    val src = Streaming.changelogSource(t,
      startSnapshotId = Some(t.snapshots.head.snapshotId),
      maxSnapshotsPerBatch = 1)
    assert(src.nextBatch().get.count() === 2)
    assert(src.nextBatch().get.count() === 3)
    assert(src.nextBatch().isEmpty)
    // a rolled-back offset fails loudly instead of streaming garbage
    Commits.rollbackTo(t, t.snapshots.head.snapshotId)
    intercept[IllegalArgumentException](src.nextBatch())
  }

  test("overwrite emits deletes for replaced rows and inserts for new ones") {
    val t = fresh("overwrite", docs(0 until 0))
    GraftWrite.append(t, docs(0 until 4).coalesce(1))
    val replacement = Seq((100L, "new", 0)).toDF("id", "body", "grp")
    GraftWrite.overwrite(t, replacement, Exprs.lt("id", 100L))
    val ch = Changes.between(t, from = Some(t.snapshots.head.snapshotId))
    val byType = ch.groupBy(col(Changes.ChangeType)).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(byType === Map("DELETE" -> 4L, "INSERT" -> 1L))
  }
}
