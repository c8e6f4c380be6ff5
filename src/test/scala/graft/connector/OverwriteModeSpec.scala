package graft.connector

import graft.SparkSpec
import java.nio.file.Files

/** INSERT OVERWRITE under an explicit partitionOverwriteMode, on
  * PARTITIONED tables (CatalogSpec covers the unpartitioned truncate and
  * the dynamic case). Static mode without a PARTITION clause truncates the
  * whole table regardless of layout — pinned because the round-20 fuzzer
  * exercised both modes against an oracle model across layouts. */
class OverwriteModeSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-owm").toString
    spark.conf.set("spark.sql.catalog.om", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.om.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS om.db")
    d
  }
  private def withMode[T](mode: String)(f: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, mode)
    try f finally prev.foreach(spark.conf.set(key, _))
  }

  test("static INSERT OVERWRITE truncates an identity-partitioned table") {
    wh
    spark.sql("CREATE TABLE om.db.so (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO om.db.so VALUES (1, 'a'), (2, 'b')")
    withMode("static") {
      spark.sql("INSERT OVERWRITE om.db.so VALUES (9, 'c')")
    }
    val rows = spark.sql("SELECT id, cat FROM om.db.so ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((9L, "c")), s"static overwrite must truncate; got $rows")
  }

  test("static INSERT OVERWRITE with a column list truncates too") {
    wh
    spark.sql("CREATE TABLE om.db.so3 (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO om.db.so3 VALUES (1, 'a'), (2, 'b')")
    withMode("static") {
      spark.sql("INSERT OVERWRITE om.db.so3 (id, cat) VALUES (9, 'c')")
    }
    val rows = spark.sql("SELECT id, cat FROM om.db.so3 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((9L, "c")), s"static overwrite must truncate; got $rows")
  }

  test("static INSERT OVERWRITE with a column list truncates a bucket table") {
    wh
    spark.sql("CREATE TABLE om.db.so4 (id BIGINT, cat STRING) " +
      "PARTITIONED BY (cat, bucket(4, id))")
    spark.sql("INSERT INTO om.db.so4 VALUES (1, 'a'), (2, 'b')")
    withMode("static") {
      spark.sql("INSERT OVERWRITE om.db.so4 (id, cat) VALUES (9, 'c')")
    }
    val rows = spark.sql("SELECT id, cat FROM om.db.so4 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((9L, "c")), s"static overwrite must truncate; got $rows")
  }

  test("static INSERT OVERWRITE truncates a bucket-partitioned table") {
    wh
    spark.sql("CREATE TABLE om.db.so2 (id BIGINT, cat STRING) " +
      "PARTITIONED BY (cat, bucket(4, id))")
    spark.sql("INSERT INTO om.db.so2 VALUES (1, 'a'), (2, 'b')")
    withMode("static") {
      spark.sql("INSERT OVERWRITE om.db.so2 VALUES (9, 'c')")
    }
    val rows = spark.sql("SELECT id, cat FROM om.db.so2 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((9L, "c")), s"static overwrite must truncate; got $rows")
  }
}
