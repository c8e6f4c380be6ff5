package graft.format

import graft.SparkSpec
import java.nio.file.Files

/** Table statistics: the ANALYZE job, the metadata roundtrip, CBO
  * reporting through the scan, and expiry cleanup. */
class StatsSpec extends SparkSpec {

  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-statswh").toString
    spark.conf.set("spark.sql.catalog.gs", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gs.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs.db")
    spark.sql("CREATE TABLE gs.db.t (id BIGINT, cat STRING, v DOUBLE)")
    spark.sql("""INSERT INTO gs.db.t
      SELECT id, concat('c', id % 7), CAST(id AS DOUBLE) / 3 FROM range(500)""")
    d
  }

  test("analyze computes exact NDV at small cardinality and roundtrips") {
    wh
    val t = GraftTable.load(spark, s"$wh/db/t")
    val (sf, stats) = Stats.analyzeAndCommit(t)
    assert(stats.rowCount == 500)
    val byName = stats.ndvByName(t.metadata.schema)
    assert(byName("cat") == 7) // HLL++ sparse mode is exact here
    assert(byName("id") >= 450 && byName("id") <= 550,
      s"ndv(id)=${byName("id")} outside ±10% of 500")
    val reread = Stats.read(GraftTable.load(spark, s"$wh/db/t"), sf.snapshotId)
    assert(reread.contains(stats))
    // the committed file is a puffin statistics file (reference ANALYZE
    // shape): one ndv blob per column + a row-count footer property
    val bytes = t.ops.io.readBytes(sf.path)
    assert(Puffin.isPuffin(bytes))
    assert(Puffin.readFooter(bytes).forall(_.blobType == "graft-ndv-v1"))
    assert(Puffin.readFileProperties(bytes)("row-count") == "500")
    // pre-round-10 JSON statistics files still read (content sniff)
    t.ops.io.writeBytes(sf.path,
      Stats.toJson(stats).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(Stats.read(GraftTable.load(spark, s"$wh/db/t"), sf.snapshotId)
      .contains(stats))
  }

  test("the procedure records stats and the scan reports NDV to the CBO") {
    wh
    val out = spark.sql(
      "CALL gs.system.analyze_table(table => 'db.t', columns => 'cat,id')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("cat") == 7 && out("id") >= 450 && out("id") <= 550)

    val relation = spark.sql("SELECT * FROM gs.db.t").queryExecution
      .optimizedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation]
    val colStats = relation.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().columnStats()
    import scala.jdk.CollectionConverters._
    val byName = colStats.asScala.map { case (k, v) => k.describe() -> v }
    assert(byName("cat").distinctCount().getAsLong == 7)
    assert(byName("id").distinctCount().getAsLong == out("id"))
    assert(byName("cat").nullCount().getAsLong == 0)
  }

  test("stats are pinned to their snapshot: a new commit stops reporting them") {
    wh
    spark.sql("INSERT INTO gs.db.t VALUES (1000, 'c-new', 1.0)")
    val t = GraftTable.load(spark, s"$wh/db/t")
    val current = t.metadata.currentSnapshotId.get
    assert(Stats.read(t, current).isEmpty, "new snapshot has no stats yet")
    // the old snapshot's stats remain readable
    val analyzed = t.metadata.statistics.map(_.snapshotId)
    assert(analyzed.nonEmpty && analyzed.forall(_ != current))
  }

  test("with CBO enabled, NDV reaches the optimizer's attribute stats") {
    wh
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.planStats.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    // stats are pinned per snapshot; analyze the CURRENT one
    spark.sql("CALL gs.system.analyze_table(table => 'db.t', columns => 'cat')")
    try {
      val expected = spark.sql("SELECT count(DISTINCT cat) FROM gs.db.t")
        .collect()(0).getLong(0)
      val stats = spark.sql("SELECT cat, v FROM gs.db.t")
        .queryExecution.optimizedPlan.stats
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.get("cat").flatMap(_.distinctCount).contains(BigInt(expected)),
        s"expected ndv(cat)=$expected in $byName")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("the $statistics metadata table lists committed stats") {
    wh
    val rows = spark.sql("SELECT snapshot_id, row_count, ndv FROM gs.db.`t$statistics`")
      .collect()
    assert(rows.nonEmpty)
    val latest = rows.maxBy(_.getLong(0))
    assert(latest.getLong(1) >= 500)
    val expected = spark.sql("SELECT count(DISTINCT cat) FROM gs.db.t")
      .collect()(0).getLong(0)
    assert(latest.getMap[String, Long](2).get("cat").contains(expected))
  }

  test("expiring a snapshot drops its statistics file") {
    wh
    val loc = Files.createTempDirectory("graft-stats-exp").toString + "/t"
    import spark.implicits._
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("id", "s").schema)
    GraftWrite.append(t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val (sf1, _) = Stats.analyzeAndCommit(t)
    GraftWrite.append(t, Seq((3L, "c")).toDF("id", "s"))
    Stats.analyzeAndCommit(t)
    val (m, orphaned) = Commits.expireSnapshots(t,
      olderThanMillis = System.currentTimeMillis() + 1000, retainLast = 1)
    assert(m.statistics.map(_.snapshotId) == Seq(m.currentSnapshotId.get))
    assert(orphaned.contains(sf1.path), "expired snapshot's stats file is orphaned")
  }

  test("the expire ACTION physically deletes expired statistics files") {
    wh
    val loc = Files.createTempDirectory("graft-stats-act").toString + "/t"
    import spark.implicits._
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("id", "s").schema)
    GraftWrite.append(t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val (sf1, _) = Stats.analyzeAndCommit(t)
    GraftWrite.append(t, Seq((3L, "c")).toDF("id", "s"))
    Stats.analyzeAndCommit(t)
    assert(t.ops.io.exists(sf1.path))
    // the distributed data-file diff can't see stats files — the action
    // must delete the expired snapshot's puffin itself, not leave it to
    // a later orphan sweep
    Actions.forTable(GraftTable.load(spark, loc))
      .expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    assert(!t.ops.io.exists(sf1.path),
      "expired statistics file must be physically deleted by the action")
  }

  test("transaction setProperties upgrades format-version like the direct commit") {
    wh
    val loc = Files.createTempDirectory("graft-txn-fv").toString + "/t"
    import spark.implicits._
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("id", "s").schema)
    GraftTransaction.begin(t)
      .setProperties(Map("format-version" -> "3", "k" -> "v")).commit()
    val m = GraftTable.load(spark, loc).metadata
    assert(m.formatVersion === 3)
    assert(m.properties.get("k").contains("v"))
    assert(!m.properties.contains("format-version"),
      "format-version is a metadata field, never a plain property")
    intercept[IllegalArgumentException](
      GraftTransaction.begin(GraftTable.load(spark, loc))
        .setProperties(Map("format-version" -> "2")).commit())
  }
}
