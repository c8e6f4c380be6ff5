package graft.connector

import graft.SparkSpec
import graft.format.{FileContent, GraftTable}
import java.nio.file.Files

/** Merge-on-read row-level operations (SupportsDelta → WriteDelta →
  * RowDelta commit): matched rows become position deletes, inserts/updated
  * rows become data files, untouched data files are NEVER rewritten. */
class DeltaMergeSpec extends SparkSpec {

  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-dmwh").toString
    spark.conf.set("spark.sql.catalog.dm", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dm.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dm.db")
    d
  }

  test("merge-on-read MERGE: position deletes instead of file rewrites") {
    wh
    spark.sql("""CREATE TABLE dm.db.t (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.merge.mode'='merge-on-read')""")
    spark.sql("INSERT INTO dm.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val before = GraftTable.load(spark, s"$wh/db/t")
      .newScan().planFiles().files.map(_.path).toSet
    spark.sql("CREATE TABLE dm.db.s (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dm.db.s VALUES (2, 'B'), (9, 'I')")

    spark.sql("""MERGE INTO dm.db.t t USING dm.db.s s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET t.v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")

    val rows = spark.sql("SELECT id, v FROM dm.db.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "I")))

    val t = GraftTable.load(spark, s"$wh/db/t")
    val plan = t.newScan().planFiles()
    // every original data file is still referenced (no rewrite)...
    assert(before.subsetOf(plan.files.map(_.path).toSet))
    // ...and the matched row is masked by a position delete
    assert(plan.deleteFiles.exists(_._1.content == FileContent.PositionDeletes))
    // RowDelta commits stamp "overwrite" (same as the reference's
    // DataOperations.OVERWRITE) with a delete-files summary counter
    assert(t.snapshots.last.operation === "overwrite")
    assert(t.snapshots.last.summary.get("delete-files").exists(_.toInt >= 1))
  }

  test("merge-on-read DELETE and UPDATE via table properties") {
    wh
    spark.sql("""CREATE TABLE dm.db.u (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                                'write.update.mode'='merge-on-read')""")
    spark.sql("INSERT INTO dm.db.u SELECT id, concat('v', id) FROM range(10)")
    val before = GraftTable.load(spark, s"$wh/db/u")
      .newScan().planFiles().files.map(_.path).toSet

    // non-provable predicate: copy-on-write would rewrite; MoR masks
    spark.sql("DELETE FROM dm.db.u WHERE id % 3 = 0")
    assert(spark.sql("SELECT count(*) FROM dm.db.u").collect().head.getLong(0) === 6L)

    spark.sql("UPDATE dm.db.u SET v = 'X' WHERE id = 1")
    val rows = spark.sql("SELECT id, v FROM dm.db.u ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.map(_._1) === Seq(1L, 2L, 4L, 5L, 7L, 8L))
    assert(rows.head === ((1L, "X")))

    val t = GraftTable.load(spark, s"$wh/db/u")
    val plan = t.newScan().planFiles()
    assert(before.subsetOf(plan.files.map(_.path).toSet),
      "original files must survive merge-on-read delete/update")
    // compaction materializes the deletes away — and drops the now-
    // dangling position AND equality delete files in the same commit
    graft.format.Deletes.deleteByEquality(t, spark.sql("SELECT CAST(8 AS BIGINT) AS id"))
    graft.format.Actions.forTable(t).rewriteDataFiles(minInputFiles = 1)
    val after = GraftTable.load(spark, s"$wh/db/u").newScan().planFiles()
    assert(after.deleteFiles.isEmpty)
    assert(spark.sql("SELECT id, v FROM dm.db.u ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      === rows.filterNot(_._1 == 8L))
  }

  test("merge-on-read MERGE on a partitioned table routes inserts") {
    wh
    spark.sql("""CREATE TABLE dm.db.p (id BIGINT, cat STRING)
                 PARTITIONED BY (cat)
                 TBLPROPERTIES ('write.merge.mode'='merge-on-read')""")
    spark.sql("INSERT INTO dm.db.p VALUES (1, 'x'), (2, 'y')")
    spark.sql("CREATE TABLE dm.db.ps (id BIGINT, cat STRING)")
    spark.sql("INSERT INTO dm.db.ps VALUES (2, 'z'), (3, 'w')")
    spark.sql("""MERGE INTO dm.db.p t USING dm.db.ps s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET t.cat = s.cat
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT id, cat FROM dm.db.p ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "x"), (2L, "z"), (3L, "w")))
    // updated row moved partition: new file carries cat=z tuple
    val parts = GraftTable.load(spark, s"$wh/db/p").newScan().planFiles()
      .files.flatMap(_.partition.get("cat")).map(_.toString).toSet
    assert(Set("z", "w").subsetOf(parts))
  }

  test("rewritePositionDeletes compacts per-commit delete files") {
    wh
    spark.sql("""CREATE TABLE dm.db.pc (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO dm.db.pc SELECT id, concat('v', id) FROM range(12)")
    // three MoR deletes -> at least three position-delete files
    spark.sql("DELETE FROM dm.db.pc WHERE id % 4 = 0")
    spark.sql("DELETE FROM dm.db.pc WHERE id % 4 = 1")
    spark.sql("DELETE FROM dm.db.pc WHERE id = 2")
    val t = GraftTable.load(spark, s"$wh/db/pc")
    val before = t.newScan().planFiles().deleteFiles
      .filter(_._1.content == FileContent.PositionDeletes).map(_._1.path).distinct
    assert(before.size >= 3, s"expected >=3 delete files, got ${before.size}")
    val expected = spark.sql("SELECT id FROM dm.db.pc ORDER BY id").collect()
      .map(_.getLong(0)).toSeq

    val res = graft.format.Actions.forTable(t).rewritePositionDeletes()
    assert(res.rewrittenFiles == before.size && res.addedFiles >= 1)
    val after = GraftTable.load(spark, s"$wh/db/pc").newScan().planFiles()
      .deleteFiles.filter(_._1.content == FileContent.PositionDeletes)
      .map(_._1.path).distinct
    assert(after.size < before.size)
    assert(spark.sql("SELECT id FROM dm.db.pc ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === expected)
  }

  test("property: copy-on-write and merge-on-read MERGE agree (randomized)") {
    wh
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 4) {
      val modes = Seq("copy-on-write", "merge-on-read")
      val names = modes.map(m => s"prop_${round}_${m.take(4).replace("-", "")}")
      val baseRows = (0 until 20).map(i => (i.toLong, rnd.nextInt(100)))
      val srcRows = rnd.shuffle((0 until 30).toList).take(12)
        .map(i => (i.toLong, rnd.nextInt(100)))
      names.zip(modes).foreach { case (n, mode) =>
        spark.sql(s"""CREATE TABLE dm.db.$n (id BIGINT, x INT)
                      TBLPROPERTIES ('write.merge.mode'='$mode')""")
        spark.sql(s"INSERT INTO dm.db.$n VALUES " +
          baseRows.map { case (i, x) => s"($i, $x)" }.mkString(", "))
      }
      spark.sql("DROP TABLE IF EXISTS dm.db.prop_src")
      spark.sql("CREATE TABLE dm.db.prop_src (id BIGINT, x INT)")
      spark.sql("INSERT INTO dm.db.prop_src VALUES " +
        srcRows.map { case (i, x) => s"($i, $x)" }.mkString(", "))
      val results = names.map { n =>
        spark.sql(s"""MERGE INTO dm.db.$n t USING dm.db.prop_src s ON t.id = s.id
                      WHEN MATCHED AND s.x % 3 = 0 THEN DELETE
                      WHEN MATCHED THEN UPDATE SET t.x = t.x + s.x
                      WHEN NOT MATCHED AND s.x % 2 = 0 THEN INSERT *""")
        spark.sql(s"SELECT id, x FROM dm.db.$n ORDER BY id").collect()
          .map(r => (r.getLong(0), r.getInt(1))).toSeq
      }
      assert(results(0) === results(1),
        s"round $round: copy-on-write and merge-on-read diverged")
    }
  }

  test("invalid mode property raises a clear error") {
    wh
    spark.sql("""CREATE TABLE dm.db.bad (id BIGINT)
                 TBLPROPERTIES ('write.merge.mode'='nope')""")
    spark.sql("INSERT INTO dm.db.bad VALUES (1)")
    spark.sql("CREATE TABLE dm.db.bads (id BIGINT)")
    spark.sql("INSERT INTO dm.db.bads VALUES (1)")
    val e = intercept[Exception](
      spark.sql("""MERGE INTO dm.db.bad t USING dm.db.bads s ON t.id = s.id
                   WHEN MATCHED THEN DELETE"""))
    assert(e.getMessage.contains("write.merge.mode") ||
      Option(e.getCause).exists(_.getMessage.contains("write.merge.mode")))
  }
}
