package graft.connector

import graft.SparkSpec
import graft.format._
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** Metadata-only aggregate pushdown (AggPushdown): full-table COUNT/MIN/MAX
  * must fold into a LocalRelation (no BatchScan, no file I/O), and every
  * refusal condition must fall back to a real scan with identical answers. */
class AggPushdownSpec extends SparkSpec {

  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-aggwh").toString
    spark.conf.set("spark.sql.catalog.ga", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ga.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ga.db")
    d
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertPushed(df: DataFrame): Unit = {
    val p = planOf(df)
    assert(p.contains("LocalTableScan"), s"expected LocalTableScan, got:\n$p")
    assert(!p.contains("BatchScan"), s"expected no BatchScan, got:\n$p")
  }

  private def assertNotPushed(df: DataFrame): Unit = {
    val p = planOf(df)
    assert(p.contains("BatchScan"), s"expected a real scan, got:\n$p")
  }

  test("count/min/max fold to a LocalRelation and match a real scan") {
    wh
    spark.sql("""CREATE TABLE ga.db.t (id BIGINT, d DATE, s STRING, f DOUBLE)""")
    spark.sql("""INSERT INTO ga.db.t VALUES
      (5, DATE'2024-01-03', 'abc', 1.5),
      (2, DATE'2024-02-01', null, 2.5),
      (9, DATE'2023-12-31', 'zz', 3.5)""")
    spark.sql("INSERT INTO ga.db.t VALUES (1, null, 'm', 0.5)")

    val q = spark.sql(
      "SELECT count(*) AS n, count(d) AS nd, min(id) AS mn, max(id) AS mx, " +
      "min(d) AS mnd, max(d) AS mxd FROM ga.db.t")
    assertPushed(q)
    val r = q.collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getLong(2) == 1 && r.getLong(3) == 9)
    assert(r.getDate(4).toString == "2023-12-31" && r.getDate(5).toString == "2024-02-01")
  }

  test("refusals fall back to a real scan, same answers") {
    wh
    // WHERE clause: every filter is residual, so aggregates must not push
    val filtered = spark.sql("SELECT count(*) AS n FROM ga.db.t WHERE id > 2")
    assertNotPushed(filtered)
    assert(filtered.collect()(0).getLong(0) == 2)

    // float/double min/max: NaN-unsafe without NaN counts
    val dbl = spark.sql("SELECT min(f) AS mf FROM ga.db.t")
    assertNotPushed(dbl)
    assert(dbl.collect()(0).getDouble(0) == 0.5)

    // string min/max under default truncate(16) metrics: not value-exact
    val str = spark.sql("SELECT max(s) AS ms FROM ga.db.t")
    assertNotPushed(str)
    assert(str.collect()(0).getString(0) == "zz")

    // DISTINCT cannot come from counts
    val dist = spark.sql("SELECT count(DISTINCT id) AS nd FROM ga.db.t")
    assertNotPushed(dist)
    assert(dist.collect()(0).getLong(0) == 4)

    // GROUP BY needs per-group metrics we don't have
    val grouped = spark.sql("SELECT s, count(*) AS n FROM ga.db.t GROUP BY s")
    assertNotPushed(grouped)
    assert(grouped.collect().length == 4)
  }

  test("string min/max pushes when the metrics mode is full") {
    wh
    spark.sql("""CREATE TABLE ga.db.full_s (s STRING)
                 TBLPROPERTIES ('write.metadata.metrics.default'='full')""")
    spark.sql("INSERT INTO ga.db.full_s VALUES ('a-very-long-string-beyond-16-chars'), ('b')")
    val q = spark.sql("SELECT min(s) AS mn, max(s) AS mx FROM ga.db.full_s")
    assertPushed(q)
    val r = q.collect()(0)
    assert(r.getString(0) == "a-very-long-string-beyond-16-chars" && r.getString(1) == "b")
  }

  test("pushed string min/max follows UTF-8 order on astral codepoints") {
    wh
    // an astral string sorts ABOVE U+FFFF in UTF-8 (Spark's order) but
    // below it in Java's UTF-16 ordering: the metadata-only answer must
    // equal the real scan's, or pushdown silently returns the wrong MAX
    spark.sql("""CREATE TABLE ga.db.astral_s (s STRING)
                 TBLPROPERTIES ('write.metadata.metrics.default'='full')""")
    spark.sql("INSERT INTO ga.db.astral_s VALUES ('\uffff-high-bmp'), ('\ud83d\ude00-astral'), ('plain')")
    val q = spark.sql("SELECT min(s) AS mn, max(s) AS mx FROM ga.db.astral_s")
    assertPushed(q)
    val real = spark.sql(
      "SELECT min(s), max(s) FROM ga.db.astral_s WHERE s IS NOT NULL OR s IS NULL")
    val (r, rr) = (q.collect()(0), real.collect()(0))
    assert(r.getString(0) == rr.getString(0) && r.getString(1) == rr.getString(1),
      s"pushed ${r} != scan ${rr}")
    assert(r.getString(1) == "\ud83d\ude00-astral", "UTF-8 max is the astral string")
  }

  test("string min/max refuses when a live file predates the full-metrics mode") {
    wh
    spark.sql("CREATE TABLE ga.db.mixed_s (s STRING)")
    spark.sql("INSERT INTO ga.db.mixed_s VALUES ('z-very-long-string-beyond-16-chars-zzz')")
    // switching the mode AFTER the write cannot make the old file's
    // truncated bounds value-exact — the per-file attestation must refuse
    spark.sql("""ALTER TABLE ga.db.mixed_s
                 SET TBLPROPERTIES ('write.metadata.metrics.default'='full')""")
    val q = spark.sql("SELECT max(s) AS mx FROM ga.db.mixed_s")
    assertNotPushed(q)
    assert(q.collect()(0).getString(0) == "z-very-long-string-beyond-16-chars-zzz")

    // a new full-mode file doesn't legitimize the old truncated one
    spark.sql("INSERT INTO ga.db.mixed_s VALUES ('a')")
    val q2 = spark.sql("SELECT max(s) AS mx FROM ga.db.mixed_s")
    assertNotPushed(q2)
    assert(q2.collect()(0).getString(0) == "z-very-long-string-beyond-16-chars-zzz")
  }

  test("live deletes refuse pushdown; schema evolution counts only non-null") {
    wh
    spark.sql("CREATE TABLE ga.db.ev (id BIGINT)")
    spark.sql("INSERT INTO ga.db.ev VALUES (1), (2), (3)")
    spark.sql("ALTER TABLE ga.db.ev ADD COLUMN late STRING")
    spark.sql("INSERT INTO ga.db.ev VALUES (4, 'x'), (5, null)")
    // files from before the ADD COLUMN have no metrics for `late`, but the
    // writer schema proves the column is all-null there: count is exact
    val q = spark.sql("SELECT count(late) AS n, count(*) AS all FROM ga.db.ev")
    assertPushed(q)
    val r = q.collect()(0)
    assert(r.getLong(0) == 1 && r.getLong(1) == 5)

    spark.sql("DELETE FROM ga.db.ev WHERE id = 2")
    val afterDel = spark.sql("SELECT count(*) AS n FROM ga.db.ev")
    // metadata-only delete rewrote the file list → no delete files → may
    // push; a row-level delete leaves delete files → must not push. Either
    // way the answer must be right.
    assert(afterDel.collect()(0).getLong(0) == 4)
  }

  test("GROUP BY identity partition columns folds to per-partition metadata rows") {
    wh
    spark.sql("""CREATE TABLE ga.db.parted (id BIGINT, cat STRING, v DOUBLE)
                 PARTITIONED BY (cat)""")
    spark.sql("""INSERT INTO ga.db.parted
      SELECT id, concat('c', id % 3), CAST(id AS DOUBLE) FROM range(90)""")
    spark.sql("INSERT INTO ga.db.parted VALUES (1000, 'c0', 0.5)")

    val q = spark.sql(
      "SELECT cat, count(*) AS n, min(id) AS mn, max(id) AS mx " +
      "FROM ga.db.parted GROUP BY cat")
    assertPushed(q)
    val rows = q.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("c0") == (31L, 0L, 1000L))
    assert(rows("c1") == (30L, 1L, 88L))
    assert(rows("c2") == (30L, 2L, 89L))

    // grouping by a NON-partition column must fall back to a real scan
    val byId = spark.sql("SELECT v, count(*) AS n FROM ga.db.parted GROUP BY v")
    assertNotPushed(byId)
    assert(byId.collect().map(_.getLong(1)).sum == 91)
  }

  test("empty table: count 0, min/max null") {
    wh
    spark.sql("CREATE TABLE ga.db.empty (id BIGINT)")
    val q = spark.sql("SELECT count(*) AS n, min(id) AS mn FROM ga.db.empty")
    assertPushed(q)
    val r = q.collect()(0)
    assert(r.getLong(0) == 0 && r.isNullAt(1))
  }

  test("GROUP BY over an empty partitioned table yields zero rows") {
    wh
    spark.sql("""CREATE TABLE ga.db.emptyp (id BIGINT, cat STRING)
                 PARTITIONED BY (cat)""")
    val q = spark.sql("SELECT cat, count(*) AS n FROM ga.db.emptyp GROUP BY cat")
    assert(q.collect().isEmpty)
  }
}
