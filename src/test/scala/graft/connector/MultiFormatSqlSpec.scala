package graft.connector

import graft.SparkSpec
import graft.format.{FileFormats, GraftTable}
import java.nio.file.Files

/** ORC and Avro data files through the DSv2 SQL surface: the catalog path
  * plans one file-source scan per (schema generation, format) — Spark's
  * vectorized OrcScan for ORC groups, the custom Avro batch for Avro
  * groups (GraftSparkTable group dispatch). */
class MultiFormatSqlSpec extends SparkSpec {

  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-mfwh").toString
    spark.conf.set("spark.sql.catalog.mf", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mf.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mf.db")
    d
  }

  test("orc table: SQL insert/select, vectorized scan, DELETE rewrite stays orc") {
    wh
    spark.sql("""CREATE TABLE mf.db.orct (id BIGINT, data STRING)
                 TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("INSERT INTO mf.db.orct VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val t = GraftTable.load(spark, s"$wh/db/orct")
    val files = t.newScan().planFiles().files
    assert(files.nonEmpty && files.forall(_.fileFormat == FileFormats.Orc))

    val df = spark.sql("SELECT data FROM mf.db.orct WHERE id >= 2 ORDER BY data")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("b", "c"))
    // ORC group scans stay columnar (Spark's vectorized ORC reader)
    val plan = spark.sql("SELECT * FROM mf.db.orct").queryExecution.executedPlan
    assert(plan.toString.contains("ColumnarToRow"), s"orc scan not columnar:\n$plan")

    // copy-on-write DELETE rewrites in the table's format
    spark.sql("DELETE FROM mf.db.orct WHERE id = 2")
    assert(spark.sql("SELECT id FROM mf.db.orct ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(GraftTable.load(spark, s"$wh/db/orct").newScan().planFiles()
      .files.forall(_.fileFormat == FileFormats.Orc))
  }

  test("avro table: SQL insert/select through the custom batch") {
    wh
    spark.sql("""CREATE TABLE mf.db.avrot (id BIGINT, data STRING)
                 TBLPROPERTIES ('write.format.default'='avro')""")
    spark.sql("INSERT INTO mf.db.avrot VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val t = GraftTable.load(spark, s"$wh/db/avrot")
    assert(t.newScan().planFiles().files.forall(_.fileFormat == FileFormats.Avro))
    val df = spark.sql("SELECT data FROM mf.db.avrot WHERE id >= 2 ORDER BY data")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("b", "c"))
    assert(spark.sql("SELECT count(*) FROM mf.db.avrot").collect().head.getLong(0) === 3L)
  }

  test("mixed formats under one SQL table scan together") {
    wh
    spark.sql("CREATE TABLE mf.db.mixed (id BIGINT, data STRING)")
    spark.sql("INSERT INTO mf.db.mixed VALUES (1, 'p')")
    spark.sql("ALTER TABLE mf.db.mixed SET TBLPROPERTIES ('write.format.default'='orc')")
    spark.sql("INSERT INTO mf.db.mixed VALUES (2, 'o')")
    spark.sql("ALTER TABLE mf.db.mixed SET TBLPROPERTIES ('write.format.default'='avro')")
    spark.sql("INSERT INTO mf.db.mixed VALUES (3, 'a')")
    val t = GraftTable.load(spark, s"$wh/db/mixed")
    assert(t.newScan().planFiles().files.map(_.fileFormat).sorted
      === Seq("avro", "orc", "parquet"))
    assert(spark.sql("SELECT data FROM mf.db.mixed ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("p", "o", "a"))
    // filters still prune parquet/orc groups by stats; the avro group has
    // none, so the row survives via residual filtering
    assert(spark.sql("SELECT count(*) FROM mf.db.mixed WHERE id > 1").collect()
      .head.getLong(0) === 2L)
  }

  test("streaming source and sink run over orc tables") {
    wh
    spark.sql("""CREATE TABLE mf.db.ssrc (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("""CREATE TABLE mf.db.ssink (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("INSERT INTO mf.db.ssrc VALUES (1, 'a'), (2, 'b')")
    val ckpt = Files.createTempDirectory("graft-orc-ckpt").toString
    val q = spark.readStream.table("mf.db.ssrc").writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("mf.db.ssink")
    q.awaitTermination(60000)
    assert(spark.sql("SELECT id FROM mf.db.ssink ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // the streaming sink wrote ORC files (epoch commit carries the format)
    val t = GraftTable.load(spark, s"$wh/db/ssink")
    assert(t.newScan().planFiles().files.forall(_.fileFormat == FileFormats.Orc))
  }

  test("equality deletes on an orc table keep the scan columnar") {
    wh
    spark.sql("""CREATE TABLE mf.db.orcdel (id BIGINT, data STRING)
                 TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("INSERT INTO mf.db.orcdel VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    val t = GraftTable.load(spark, s"$wh/db/orcdel")
    import spark.implicits._
    graft.format.Deletes.deleteByEquality(t, Seq(2L, 4L).toDF("id"))
    val df = spark.sql("SELECT id FROM mf.db.orcdel ORDER BY id")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // the columnar delete filter runs on ORC batches exactly as on parquet
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"orc scan with live eq-deletes dropped to rows:\n$plan")
  }

  test("CTAS and RTAS work through the catalog (any format)") {
    wh
    spark.sql("""CREATE TABLE mf.db.ctsrc (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("INSERT INTO mf.db.ctsrc VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("""CREATE TABLE mf.db.ctas
                 TBLPROPERTIES ('write.format.default'='avro')
                 AS SELECT id, v FROM mf.db.ctsrc WHERE id > 1""")
    assert(spark.sql("SELECT id FROM mf.db.ctas ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(2L, 3L))
    assert(GraftTable.load(spark, s"$wh/db/ctas").newScan().planFiles()
      .files.forall(_.fileFormat == FileFormats.Avro))
    spark.sql("REPLACE TABLE mf.db.ctas AS SELECT id FROM mf.db.ctsrc")
    assert(spark.sql("SELECT count(*) FROM mf.db.ctas").collect()
      .head.getLong(0) === 3L)
  }

  test("schema rename reads across formats through SQL (id resolution)") {
    wh
    spark.sql("""CREATE TABLE mf.db.ren (id BIGINT, data STRING)
                 TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("INSERT INTO mf.db.ren VALUES (1, 'before')")
    spark.sql("ALTER TABLE mf.db.ren RENAME COLUMN data TO payload")
    spark.sql("INSERT INTO mf.db.ren VALUES (2, 'after')")
    assert(spark.sql("SELECT payload FROM mf.db.ren ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("before", "after"))
  }

  test("position deletes apply to orc groups inside SQL reads") {
    wh
    import spark.implicits._
    spark.sql("""CREATE TABLE mf.db.orcpos (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("INSERT INTO mf.db.orcpos SELECT id, CONCAT('v', id) FROM range(5)")
    val t = GraftTable.load(spark, s"$wh/db/orcpos")
    // positions within each file, in file row order
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val keySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val paths = t.newScan().planFiles().tasks.map(_.file.path)
    val pos = spark.sparkContext.parallelize(paths, paths.size).flatMap { p =>
      val out = Seq.newBuilder[(String, Long, Long)]
      var i = -1L
      graft.format.OrcIO.readAll(p, keySchema, sconf.value) { r =>
        i += 1; out += ((p, i, r.getLong(0)))
      }
      out.result()
    }.toDF("file_path", "pos", "id")
      .filter($"id" % 2 === 0).select("file_path", "pos")
    graft.format.Deletes.deletePositions(t, pos)
    assert(spark.sql("SELECT id FROM mf.db.orcpos ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // equality aggregate over the filtered read
    assert(spark.sql("SELECT count(*) FROM mf.db.orcpos").collect()
      .head.getLong(0) === 2L)
  }

  test("position deletes apply to avro groups inside SQL reads") {
    wh
    import spark.implicits._
    spark.sql("""CREATE TABLE mf.db.avropos (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.format.default'='avro')""")
    spark.sql("INSERT INTO mf.db.avropos SELECT id, CONCAT('v', id) FROM range(6)")
    val t = GraftTable.load(spark, s"$wh/db/avropos")
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val keySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val paths = t.newScan().planFiles().tasks.map(_.file.path)
    val pos = spark.sparkContext.parallelize(paths, paths.size).flatMap { p =>
      val out = Seq.newBuilder[(String, Long, Long)]
      val it = graft.format.AvroIO.open(p, keySchema, sconf.value, 0L, Long.MaxValue)
      try {
        var i = -1L
        var r = it.read()
        while (r != null) { i += 1; out += ((p, i, r.getLong(0))); r = it.read() }
      } finally it.close()
      out.result()
    }.toDF("file_path", "pos", "id")
      .filter($"id" % 3 === 0).select("file_path", "pos")
    graft.format.Deletes.deletePositions(t, pos)
    assert(spark.sql("SELECT id FROM mf.db.avropos ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 5L))
    assert(spark.sql("SELECT count(*) FROM mf.db.avropos").collect()
      .head.getLong(0) === 4L)
  }

  test("merge-on-read DELETE works on an avro table end-to-end") {
    wh
    spark.sql("""CREATE TABLE mf.db.avromor (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.format.default'='avro',
                                'write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO mf.db.avromor SELECT id, CONCAT('v', id) FROM range(6)")
    spark.sql("DELETE FROM mf.db.avromor WHERE id IN (1, 4)")
    assert(spark.sql("SELECT id FROM mf.db.avromor ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(0L, 2L, 3L, 5L))
    val t = GraftTable.load(spark, s"$wh/db/avromor")
    val dels = t.newScan().planFiles().deleteFiles.map(_._1.content).distinct
    assert(dels.contains(graft.format.FileContent.PositionDeletes),
      s"expected MoR position deletes, got $dels")
  }

  test("_pos on an imported hive-layout ORC table serves partition constants") {
    wh
    import spark.implicits._
    val src = Files.createTempDirectory("graft-orcimp-src").toString
    Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("cat", "id")
      .repartition(1).write.mode("overwrite").partitionBy("cat").orc(src)
    graft.format.GraftWrite.importOrc(spark, s"$wh/db/orcimp", src)
    // `cat` lives only in directory names (partition-served); `_pos`
    // forces the ORC row-path scan, which must append the partition
    // constants in the same slot the vectorized readers serve them —
    // the pre-fix scan emitted a row NARROWER than the declared output
    val rows = spark.sql("SELECT cat, id, _pos FROM mf.db.orcimp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(t => (t._1, t._2)).toSet ===
      Set(("a", 1L), ("a", 2L), ("b", 3L)))
    assert(rows.filter(_._1 == "a").map(_._3).sorted.toSeq === Seq(0L, 1L))
    assert(rows.filter(_._1 == "b").map(_._3).toSeq === Seq(0L))
  }

  test("_pos works on avro groups (unsplit counter scan)") {
    wh
    spark.sql("""CREATE TABLE mf.db.avroidx (id BIGINT)
                 TBLPROPERTIES ('write.format.default'='avro')""")
    spark.sql("INSERT INTO mf.db.avroidx SELECT id FROM range(4)")
    val rows = spark.sql("SELECT _pos, id FROM mf.db.avroidx")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 4)
    // per file, positions start at 0 and are dense
    assert(rows.map(_._1).min == 0L)
    assert(rows.groupBy(_._1).forall(_._2.length <= rows.length))
  }
}
