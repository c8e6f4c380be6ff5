package graft.connector

import graft.SparkSpec
import graft.format.{Commits, GraftTable, GraftWrite}
import java.nio.file.{Files, Paths}

/** SQL `CALL` procedures through the DSv2 ProcedureCatalog (Spark 4.1
  * SPARK-44167). The reference fork has no procedure surface — these expose
  * the same actions its Java API ships (the `actions` package,
  * `core/.../SnapshotManager.java`) under the argument names Apache Iceberg
  * later standardized publicly. */
class ProcedureSpec extends SparkSpec {

  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-proc-wh").toString
    spark.conf.set("spark.sql.catalog.gp", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gp.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gp.db")
    d
  }

  private var n = 0
  /** Fresh table with `inserts` single-row append snapshots; returns name. */
  private def fresh(inserts: Int): String = {
    wh; n += 1
    val name = s"p$n"
    spark.sql(s"CREATE TABLE gp.db.$name (id BIGINT, v STRING)")
    (1 to inserts).foreach(i =>
      spark.sql(s"INSERT INTO gp.db.$name VALUES ($i, 'v$i')"))
    name
  }

  private def snapshotIds(name: String): Seq[Long] =
    spark.sql(s"SELECT snapshot_id FROM gp.db.`$name$$snapshots` ORDER BY committed_at, snapshot_id")
      .collect().map(_.getLong(0)).toSeq

  test("rollback_to_snapshot returns (previous, current) and moves the table") {
    val t = fresh(2)
    val ids = snapshotIds(t)
    val out = spark.sql(
      s"CALL gp.system.rollback_to_snapshot('db.$t', ${ids.head})").collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == ids.last, "previous_snapshot_id")
    assert(out.head.getLong(1) == ids.head, "current_snapshot_id")
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 1)
  }

  test("set_current_snapshot rolls forward again") {
    val t = fresh(2)
    val ids = snapshotIds(t)
    spark.sql(s"CALL gp.system.rollback_to_snapshot('db.$t', ${ids.head})")
    spark.sql(s"CALL gp.system.set_current_snapshot('db.$t', ${ids.last})")
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 2)
  }

  test("rollback_to_timestamp picks the latest snapshot at or before the cutoff") {
    val t = fresh(2)
    val ids = snapshotIds(t)
    val ts1 = spark.sql(
      s"SELECT committed_at FROM gp.db.`$t$$snapshots` WHERE snapshot_id = ${ids.head}")
      .collect().head.getTimestamp(0)
    val out = spark.sql(
      s"CALL gp.system.rollback_to_timestamp('db.$t', TIMESTAMP'$ts1')").collect()
    assert(out.head.getLong(1) == ids.head)
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 1)
  }

  test("cherrypick_snapshot and publish_changes surface WAP staging in SQL") {
    val t = fresh(1)
    val gt = GraftTable.load(spark, s"$wh/db/$t")
    import spark.implicits._
    val files = GraftWrite.writeFiles(gt,
      Seq((100L, "staged")).toDF("id", "v").coalesce(1))
    val (_, stagedId) = Commits.stageAppend(gt, files, wapId = "audit-9")
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 1,
      "staged snapshot must stay invisible")
    val out = spark.sql(
      s"CALL gp.system.publish_changes('db.$t', 'audit-9')").collect()
    assert(out.head.getLong(0) == stagedId)
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 2)
  }

  test("publish_changes refuses a second publish of the same wap id") {
    val t = fresh(1)
    val gt = GraftTable.load(spark, s"$wh/db/$t")
    import spark.implicits._
    val files = GraftWrite.writeFiles(gt,
      Seq((200L, "once")).toDF("id", "v").coalesce(1))
    Commits.stageAppend(gt, files, wapId = "audit-10")
    spark.sql(s"CALL gp.system.publish_changes('db.$t', 'audit-10')").collect()
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 2)
    // a retried CALL (client timeout, at-least-once runner) must NOT
    // append the staged files again
    val e = intercept[Exception](
      spark.sql(s"CALL gp.system.publish_changes('db.$t', 'audit-10')").collect())
    assert(e.getMessage.contains("already published"), s"got: $e")
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 2)
  }

  test("rollback_to_snapshot requires an ancestor; set_current_snapshot does not") {
    val t = fresh(1)
    val gt = GraftTable.load(spark, s"$wh/db/$t")
    import spark.implicits._
    val files = GraftWrite.writeFiles(gt,
      Seq((300L, "staged")).toDF("id", "v").coalesce(1))
    val (_, stagedId) = Commits.stageAppend(gt, files, wapId = "nope")
    // the staged snapshot EXISTS but is not an ancestor of current
    val e = intercept[Exception](spark.sql(
      s"CALL gp.system.rollback_to_snapshot('db.$t', $stagedId)").collect())
    assert(e.getMessage.contains("not an ancestor"), s"got: $e")
    // the explicit any-snapshot variant still reaches it
    spark.sql(
      s"CALL gp.system.set_current_snapshot('db.$t', $stagedId)").collect()
    // the staged snapshot carries base + staged rows
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 2)
  }

  test("bare expire_snapshots keeps recent history (5-day default window)") {
    val t = fresh(3)
    assert(snapshotIds(t).size == 3)
    val out = spark.sql(
      s"CALL gp.system.expire_snapshots('db.$t')").collect()
    // every snapshot is younger than the 5-day default retention — a bare
    // maintenance call must not wipe time travel / rollback history
    assert(out.head.getInt(0) == 0, "no snapshot may expire")
    assert(snapshotIds(t).size == 3)
  }

  test("import_table refuses to overwrite an existing table") {
    val t = fresh(1)
    val src = Files.createTempDirectory("graft-imp-src").toString
    spark.range(3).selectExpr("id", "'x' AS v").coalesce(1)
      .write.mode("overwrite").parquet(src)
    val e = intercept[Exception](spark.sql(
      s"CALL gp.system.import_table(table => 'db.$t', source_path => '$src')")
      .collect())
    assert(e.getMessage.contains("refusing to overwrite"), s"got: $e")
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 1,
      "existing table must be untouched")
  }

  test("expire_snapshots with named args honors defaults and deletes files") {
    val t = fresh(3)
    // overwrite so older append files become unreferenced, then expire
    spark.sql(s"INSERT OVERWRITE gp.db.$t VALUES (9, 'only')")
    val out = spark.sql(
      s"""CALL gp.system.expire_snapshots(
            table => 'db.$t',
            older_than => TIMESTAMP'2099-01-01 00:00:00')""").collect()
    assert(out.head.getInt(0) == 3, "expired_snapshots_count")
    assert(out.head.getInt(1) == 3, "deleted_data_files_count")
    assert(spark.sql(s"SELECT v FROM gp.db.$t").collect().map(_.getString(0)).toSeq == Seq("only"))
    assert(snapshotIds(t).size == 1)
  }

  test("remove_orphan_files reports and deletes unreferenced data files") {
    val t = fresh(1)
    val junk = Paths.get(s"$wh/db/$t/data/zz-orphan.parquet")
    Files.write(junk, Array[Byte](1, 2, 3))
    val out = spark.sql(
      s"""CALL gp.system.remove_orphan_files(
            table => 'db.$t',
            older_than => TIMESTAMP'2099-01-01 00:00:00')""").collect()
    assert(out.map(_.getString(0)).exists(_.endsWith("zz-orphan.parquet")))
    assert(!Files.exists(junk))
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 1)
  }

  test("rewrite_data_files bin-packs small files; rewrite_manifests compacts metadata") {
    val t = fresh(3)
    val out = spark.sql(
      s"CALL gp.system.rewrite_data_files('db.$t', 134217728L, 2)").collect()
    assert(out.head.getInt(0) == 3, "rewritten_data_files_count")
    assert(out.head.getInt(1) == 1, "added_data_files_count")
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 3)
    val m = spark.sql(s"CALL gp.system.rewrite_manifests('db.$t')").collect()
    assert(m.head.getInt(0) >= 1)
    assert(spark.sql(s"SELECT * FROM gp.db.$t").count() == 3)
  }

  test("rewrite_data_files with sort_by range-clusters instead of bin-packing") {
    val t = fresh(0)
    (0 until 4).foreach(i => spark.sql(
      s"INSERT INTO gp.db.$t SELECT id, CAST(id AS STRING) FROM range(${i * 25}, ${i * 25 + 100}, 4)"))
    val out = spark.sql(
      s"""CALL gp.system.rewrite_data_files(
            table => 'db.$t', sort_by => 'id desc')""").collect()
    assert(out.head.getInt(0) >= 4, "all interleaved input files rewritten")
    assert(out.head.getInt(1) >= 1 && out.head.getInt(1) < out.head.getInt(0))
    assert(spark.sql(s"SELECT COUNT(DISTINCT id) FROM gp.db.$t").collect()
      .head.getLong(0) == 100)
  }

  test("add/drop_partition_field evolve the default spec through SQL") {
    val t = fresh(0)
    spark.sql(s"INSERT INTO gp.db.$t SELECT id, CAST(id AS STRING) FROM range(4)")
    // append a bucket field: new data partitions, old files keep spec 0
    val add = spark.sql(
      s"CALL gp.system.add_partition_field('db.$t', 'bucket(4, id)')").collect()
    assert(add.head.getInt(0) === 1 && add.head.getString(1).contains("id_bucket"))
    spark.sql(s"INSERT INTO gp.db.$t SELECT id, CAST(id AS STRING) FROM range(4, 8)")
    // both generations scan together
    assert(spark.sql(s"SELECT COUNT(DISTINCT id) FROM gp.db.$t")
      .collect().head.getLong(0) === 8)
    // pruning bites on the NEW generation's files
    assert(spark.sql(s"SELECT id FROM gp.db.$t WHERE id = 5").collect()
      .map(_.getLong(0)).toSeq === Seq(5L))
    // drop it by transform spelling; a third generation is unpartitioned
    val drop = spark.sql(
      s"CALL gp.system.drop_partition_field('db.$t', 'bucket(4, id)')").collect()
    assert(drop.head.getInt(0) === 2 && drop.head.getString(1) === "")
    spark.sql(s"INSERT INTO gp.db.$t SELECT id, CAST(id AS STRING) FROM range(8, 10)")
    assert(spark.sql(s"SELECT COUNT(*) FROM gp.db.$t")
      .collect().head.getLong(0) === 10)
    // unknown field refuses loudly
    val e = intercept[Exception](spark.sql(
      s"CALL gp.system.drop_partition_field('db.$t', 'nope')").collect())
    assert(e.getMessage.contains("no partition field"), s"got: $e")
  }

  test("where scope refuses NOT IN with a NULL literal (polarity rule)") {
    val t = fresh(2)
    // `id NOT IN (1, NULL)` is never TRUE in SQL; the null-dropping IN
    // conversion is only sound in positive position, so the scope parser
    // must refuse rather than silently widen the file selection
    val e = intercept[Exception](spark.sql(
      s"""CALL gp.system.rewrite_data_files(
            table => 'db.$t', where => 'id NOT IN (1, NULL)')""").collect())
    assert(e.getMessage.contains("unsupported where predicate"), s"got: $e")
    // positive-position NULL-carrying IN still converts (row-equivalent)
    val ok = spark.sql(
      s"""CALL gp.system.rewrite_data_files(
            table => 'db.$t', where => 'id IN (1, NULL)',
            min_input_files => 1)""").collect()
    assert(ok.nonEmpty)
  }

  test("rewrite_position_deletes is a no-op without enough delete files") {
    val t = fresh(2)
    val out = spark.sql(
      s"CALL gp.system.rewrite_position_deletes('db.$t')").collect()
    assert(out.head.getInt(0) == 0 && out.head.getInt(1) == 0)
  }

  test("ancestors_of walks the parent chain (current by default)") {
    val t = fresh(3)
    val ids = snapshotIds(t)
    val out = spark.sql(s"CALL gp.system.ancestors_of('db.$t')").collect()
    assert(out.map(_.getLong(0)).toSeq == ids.reverse, "current-first chain")
    val fromMiddle = spark.sql(
      s"CALL gp.system.ancestors_of('db.$t', ${ids(1)})").collect()
    assert(fromMiddle.map(_.getLong(0)).toSeq == ids.take(2).reverse)
  }

  test("import_table registers an existing parquet directory in place") {
    wh
    val src = Files.createTempDirectory("graft-proc-import").toString
    spark.range(10).selectExpr("id", "CAST(id AS STRING) AS v")
      .coalesce(2).write.mode("overwrite").parquet(src)
    val out = spark.sql(
      s"CALL gp.system.import_table('db.imported', '$src')").collect()
    assert(out.head.getLong(0) == 2, "imported_files_count")
    assert(spark.sql("SELECT * FROM gp.db.imported").count() == 10)
    assert(spark.sql("SELECT * FROM gp.db.imported WHERE id < 3").count() == 3)
  }

  test("create_changelog_view registers a queryable CDC view") {
    val t = fresh(3)
    val ids = snapshotIds(t)
    spark.sql(s"DELETE FROM gp.db.$t WHERE id = 2")
    val view = spark.sql(
      s"CALL gp.system.create_changelog_view(table => 'db.$t')")
      .collect().head.getString(0)
    assert(view === s"db_${t}_changes")
    val rows = spark.sql(
      s"SELECT _change_type, id FROM $view ORDER BY _change_ordinal, id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("INSERT", 1L), ("INSERT", 2L), ("INSERT", 3L),
      ("DELETE", 2L)))
    // explicit view name + snapshot range + net collapse: within
    // (first, head], id=2's insert and delete cancel, id=3 survives
    val v2 = spark.sql(
      s"""CALL gp.system.create_changelog_view(table => 'db.$t',
          changelog_view => 'net_v', start_snapshot_id => ${ids.head},
          net_changes => true)""").collect().head.getString(0)
    assert(v2 === "net_v")
    val net = spark.sql("SELECT _change_type, id FROM net_v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(net === Seq(("INSERT", 3L)))
  }

  test("create_changelog_view accepts wall-clock range arguments") {
    wh
    spark.sql("CREATE TABLE gp.db.tsrange (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gp.db.tsrange VALUES (1, 'a')")
    Thread.sleep(5) // commits must not share a millisecond timestamp
    spark.sql("INSERT INTO gp.db.tsrange VALUES (2, 'b')")
    Thread.sleep(5)
    spark.sql("INSERT INTO gp.db.tsrange VALUES (3, 'c')")
    val ms = spark.sql(
      "SELECT committed_at FROM gp.db.`tsrange$snapshots` ORDER BY committed_at")
      .collect().head.getTimestamp(0).getTime
    // start at the first commit's own time → exclusive → commits 2 and 3
    spark.sql(
      s"""CALL gp.system.create_changelog_view(table => 'db.tsrange',
          changelog_view => 'ts_v', start_timestamp => timestamp_millis(${ms}L))""")
    assert(spark.sql("SELECT count(*) FROM ts_v").collect().head.getLong(0) == 2)
    // a snapshot id and a timestamp for the same boundary conflict
    intercept[Exception](spark.sql(
      s"""CALL gp.system.create_changelog_view(table => 'db.tsrange',
          start_snapshot_id => 1, start_timestamp => timestamp_millis(${ms}L))"""))
  }

  test("SHOW PROCEDURES and DESCRIBE PROCEDURE surface the registry") {
    wh
    val names = spark.sql("SHOW PROCEDURES IN gp.system").collect()
      .map(_.getAs[String]("procedure_name")).toSet
    assert(names.contains("rollback_to_snapshot"))
    assert(names.contains("rewrite_data_files"))
    assert(names.contains("import_table"))
    val desc = spark.sql("DESCRIBE PROCEDURE gp.system.expire_snapshots")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("expire_snapshots"))
  }

  test("unknown procedure fails with a helpful message") {
    wh
    val e = intercept[Exception](spark.sql("CALL gp.system.nope()"))
    assert(e.getMessage.contains("nope") || e.getMessage.toLowerCase.contains("procedure"))
  }
}
