package graft.format

import graft.SparkSpec
import java.time.LocalTime
import org.apache.spark.sql.types.TimeType

/** TIME columns end-to-end (closes the last §1.2 type row): Spark 4.1's
  * TimeType maps to canonical nanos-of-day longs through metadata JSON,
  * footer metrics, expression pruning and the SQL surface. The reference
  * models time as micros-of-day longs (api/.../types/Types.java:189) but
  * its own Spark conversion throws — this engine supports it outright. */
class TimeTypeSpec extends SparkSpec {
  import spark.implicits._

  // Spark 4.1 gates TimeType behind this flag (SQLConf.TIME_TYPE_ENABLED,
  // default false); graft supports the type whenever the session does
  spark.conf.set("spark.sql.timeType.enabled", "true")

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-timetype/$name"

  test("canonical codec + coercion + ordering for TIME") {
    val t = TimeType(6)
    val noon = LocalTime.NOON.toNanoOfDay
    assert(Exprs.coerce(LocalTime.NOON, t) === noon)
    assert(Exprs.coerce("12:00", t) === noon)
    assert(Exprs.coerce(noon, t) === noon)
    assert(Exprs.ordering(t).lt(
      LocalTime.of(1, 0).toNanoOfDay, LocalTime.of(2, 0).toNanoOfDay))
    val o = Json.obj()
    Values.toJson(o, "v", noon, t)
    assert(Values.fromJson(o.get("v"), t) === noon)
    assert(Values.fromBytes(Values.toBytes(noon, t), t) === noon)
  }

  test("TIME columns write, scan, and stat-prune through the library path") {
    val df = Seq(
      (1L, LocalTime.of(1, 15, 0)),
      (2L, LocalTime.of(9, 30, 0)),
      (3L, LocalTime.of(22, 45, 0))).toDF("id", "t")
    val table = GraftTable.recreate(spark, tmp("lib"), df.schema)
    GraftWrite.append(table, df.filter($"id" < 3L).coalesce(1))
    GraftWrite.append(table, df.filter($"id" === 3L).coalesce(1))

    val all = table.toDF().orderBy("id").collect()
    assert(all.map(_.getAs[LocalTime]("t")).toSeq ===
      Seq(LocalTime.of(1, 15), LocalTime.of(9, 30), LocalTime.of(22, 45)))

    // footer metrics became canonical bounds → file-level pruning works
    val pruned = table.newScan()
      .filter(Exprs.gt("t", LocalTime.of(12, 0))).planFiles()
    assert(pruned.tasks.size === 1, "afternoon filter must prune the morning file")
    val rows = table.newScan().filter(Exprs.gt("t", LocalTime.of(12, 0)))
      .toDF().collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("TIME through SQL: DDL, DML, filters, metadata-only min/max") {
    val wh = java.nio.file.Files.createTempDirectory("graft-timewh").toString
    spark.conf.set("spark.sql.catalog.gtt", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtt.db")
    spark.sql("CREATE TABLE gtt.db.shifts (id BIGINT, start TIME)")
    spark.sql("""INSERT INTO gtt.db.shifts VALUES
      (1, TIME'06:00:00'), (2, TIME'14:00:00'), (3, TIME'22:00:00')""")
    assert(spark.sql("SELECT * FROM gtt.db.shifts").count() === 3)
    val late = spark.sql(
      "SELECT id FROM gtt.db.shifts WHERE start > TIME'13:00:00' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(late === Seq(2L, 3L))
    // metadata-only MIN/MAX: TIME bounds are exact (never truncated)
    val mm = spark.sql("SELECT min(start) AS mn, max(start) AS mx FROM gtt.db.shifts")
    val r = mm.collect()(0)
    assert(r.getAs[LocalTime]("mn") === LocalTime.of(6, 0))
    assert(r.getAs[LocalTime]("mx") === LocalTime.of(22, 0))
  }

  test("TIME as a partition source writes through the DSv2 fanout writer") {
    val wh = java.nio.file.Files.createTempDirectory("graft-timepart").toString
    spark.conf.set("spark.sql.catalog.gtp", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtp.db")
    // hour-bucketing a TIME column is a natural shift-table layout; the
    // fanout writer must extract the nanos-of-day long (it threw
    // IllegalArgumentException("partition source type") before the fix)
    spark.sql("""CREATE TABLE gtp.db.shifts (id BIGINT, start TIME)
      PARTITIONED BY (bucket(4, start))""")
    spark.sql("""INSERT INTO gtp.db.shifts VALUES
      (1, TIME'06:00:00'), (2, TIME'14:00:00'), (3, TIME'22:00:00')""")
    val rows = spark.sql("SELECT id, start FROM gtp.db.shifts ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getAs[LocalTime](1)))
    assert(rows.toSeq === Seq((1L, LocalTime.of(6, 0)),
      (2L, LocalTime.of(14, 0)), (3L, LocalTime.of(22, 0))))
    // partition pruning actually bites: an equality filter on the source
    // column projects to its bucket
    val one = spark.sql(
      "SELECT id FROM gtp.db.shifts WHERE start = TIME'14:00:00'").collect()
    assert(one.map(_.getLong(0)).toSeq === Seq(2L))

    // identity TIME partitioning: the tuple value (nanos-of-day) round-trips
    // through the manifest codec and partition dir strings
    spark.sql("""CREATE TABLE gtp.db.slots (id BIGINT, at TIME)
      PARTITIONED BY (at)""")
    spark.sql("""INSERT INTO gtp.db.slots VALUES
      (1, TIME'06:30:00'), (2, TIME'06:30:00'), (3, TIME'18:00:00')""")
    assert(spark.sql(
      "SELECT id FROM gtp.db.slots WHERE at = TIME'06:30:00' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(spark.sql("SELECT * FROM gtp.db.slots").count() === 3)
  }

  test("MoR deletes on a TIME-carrying table stay columnar and correct") {
    val wh = java.nio.file.Files.createTempDirectory("graft-timemor").toString
    spark.conf.set("spark.sql.catalog.gtm", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtm.db")
    spark.sql("""CREATE TABLE gtm.db.punches (id BIGINT, at TIME)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.sql("""INSERT INTO gtm.db.punches VALUES
      (1, TIME'06:00:00'), (2, TIME'12:00:00'),
      (3, TIME'18:00:00'), (4, TIME'23:59:59')""")
    spark.sql("DELETE FROM gtm.db.punches WHERE id IN (2, 4)")
    // TIME is packable (long lane): live position deletes must not drop
    // the scan off the vectorized path (assert on the sort-free plan — AQE
    // wraps sorted plans before the scan node prints)
    val flat = spark.sql("SELECT id, at FROM gtm.db.punches")
    assert(flat.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      s"TIME MoR scan must stay columnar:\n${flat.queryExecution.executedPlan}")
    val df = spark.sql("SELECT id, at FROM gtm.db.punches ORDER BY id")
    assert(df.collect().map(r => (r.getLong(0), r.getAs[LocalTime](1))).toSeq
      === Seq((1L, LocalTime.of(6, 0)), (3L, LocalTime.of(18, 0))))
  }
}
