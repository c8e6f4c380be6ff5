package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Table import (reference SparkTableUtil.java:501-631): unpartitioned and
  * hive-style partitioned layouts, metadata-only partition columns filled on
  * read, pruning over imported tuples, and NameMapping id stability. */
class ImportSpec extends SparkSpec {
  import spark.implicits._

  private def freshLoc(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name")
    Files.delete(d)
    d.toString
  }

  private def hiveTable(): String = {
    val src = freshLoc("hive-src")
    Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (4L, "d", "p2"),
      (5L, "e", "p3"))
      .toDF("id", "v", "part")
      .write.partitionBy("part").parquet(src)
    src
  }

  test("partitioned import: files referenced in place, partition column filled on read") {
    val src = hiveTable()
    val t = GraftWrite.importParquet(spark, freshLoc("imp-part"), src)
    // schema: data columns then partition column LAST
    assert(t.schema.fieldNames.toSeq == Seq("id", "v", "part"))
    val out = t.toDF()
    assert(out.count() == 5)
    // the partition column reads its directory value, not null
    assert(out.where(col("part") === "p2").select("id").as[Long].collect().sorted.toSeq
      == Seq(3L, 4L))
    assert(out.select("part").distinct().as[String].collect().sorted.toSeq
      == Seq("p1", "p2", "p3"))
    // combined data+partition predicate works through the fill
    assert(out.where(col("part") === "p1" && col("id") > 1).count() == 1)
  }

  test("pruning fires on an imported partitioned table (ScanPlan assertion)") {
    val src = hiveTable()
    val t = GraftWrite.importParquet(spark, freshLoc("imp-prune"), src)
    val all = t.newScan().planFiles()
    val pruned = t.newScan().filter(Exprs.equal("part", "p2")).planFiles()
    assert(all.tasks.size >= 3)
    assert(pruned.tasks.size < all.tasks.size,
      s"no pruning: ${pruned.tasks.size} of ${all.tasks.size}")
    assert(pruned.tasks.forall(_.file.partition("part") == "p2"))
    assert(t.newScan().filter(Exprs.equal("part", "p2")).toDF().count() == 2)
  }

  test("imported table reads through the DSv2 SQL path with partition constants") {
    val src = hiveTable()
    val wh = freshLoc("imp-wh")
    spark.conf.set("spark.sql.catalog.gimp", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gimp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gimp.db")
    GraftWrite.importParquet(spark, s"$wh/db/imported", src)
    val rows = spark.sql(
      "SELECT id, v, part FROM gimp.db.imported WHERE part = 'p2' ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 4L))
    assert(rows.map(_.getString(2)).toSeq == Seq("p2", "p2"))
    // aggregate over the served partition column
    val agg = spark.sql(
      "SELECT part, COUNT(*) AS n FROM gimp.db.imported GROUP BY part ORDER BY part")
      .collect()
    assert(agg.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("p1", 2L), ("p2", 2L), ("p3", 1L)))
  }

  test("NameMapping: supplied mapping pins ids; recorded mapping survives evolution") {
    val src = hiveTable()
    // map v to a deliberately non-sequential id
    val mapping = NameMapping(Map("id" -> 7, "v" -> 3, "part" -> 9))
    val t = GraftWrite.importParquet(spark, freshLoc("imp-map"), src,
      Map(NameMapping.PropertyKey -> mapping.toJson))
    val sch = t.schema
    assert(FieldIds.idOf(sch("id")) == 7)
    assert(FieldIds.idOf(sch("v")) == 3)
    assert(FieldIds.idOf(sch("part")) == 9)
    // the table records its mapping for future id-less importers
    val recorded = NameMapping.of(t).get
    assert(recorded.idFor("v").contains(3))
    // rename after import: old files still resolve by the mapped id
    SchemaUpdate(t).renameColumn("v", "val").commit()
    assert(t.toDF().where(col("val") === "c").select("id").as[Long].head() == 3L)
    // round-trip
    assert(NameMapping.fromJson(mapping.toJson) == mapping)
  }

  test("compaction of an imported table materializes the partition column") {
    val src = freshLoc("hive-multi")
    // two separate writes → two files per partition, so compaction has work
    Seq((1L, "a", "p1"), (3L, "c", "p2")).toDF("id", "v", "part")
      .coalesce(1).write.partitionBy("part").parquet(src)
    Seq((2L, "b", "p1"), (4L, "d", "p2")).toDF("id", "v", "part")
      .coalesce(1).write.mode("append").partitionBy("part").parquet(src)
    val t = GraftWrite.importParquet(spark, freshLoc("imp-compact"), src)
    assert(t.toDF().count() == 4)
    val res = Actions.forTable(t).rewriteDataFiles(minInputFiles = 2)
    assert(res.rewrittenFiles >= 2 && res.addedFiles >= 1)
    // rewritten files carry the current schema WITH the partition column —
    // its values must come from the partition tuple, not read as null
    val out = t.toDF()
    assert(out.count() == 4)
    assert(out.where(col("part").isNull).count() == 0,
      "compaction dropped metadata-only partition values")
    assert(out.where(col("part") === "p1").select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
    assert(out.where(col("part") === "p2").select("id").as[Long].collect().sorted.toSeq
      == Seq(3L, 4L))
  }

  test("struct-NESTED initial defaults on partition-served tables are refused, not misread") {
    // imported hive layouts serve identity-partition columns from directory
    // metadata; fill ordinals are computed over the logical row INCLUDING
    // those columns, so a backfill would misalign — the guard must catch
    // nested defaults exactly like top-level ones
    val src = freshLoc("hive-nstruct")
    Seq((1L, "a", "p1"), (2L, "b", "p2"))
      .toDF("id", "v", "part")
      .withColumn("info", struct(col("v").as("tag")))
      .select("id", "info", "part")
      .write.partitionBy("part").parquet(src)
    val wh = freshLoc("imp-ndef-wh")
    spark.conf.set("spark.sql.catalog.gimpn", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gimpn.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gimpn.db")
    val loc = s"$wh/db/t"
    val t = GraftWrite.importParquet(spark, loc, src,
      properties = Map("format-version" -> "3"))
    SchemaUpdate(t)
      .addColumn("info.pri", StringType, initialDefault = Some("std"))
      .commit()
    // partition column + defaulted struct requested together → refused on
    // the DSv2 path (the fill would misalign with the physical row)
    val ex = intercept[Exception] {
      spark.sql("SELECT part, info FROM gimpn.db.t").collect()
    }
    assert(ex.getMessage != null &&
      ex.getMessage.contains("initial defaults"), s"wrong error: $ex")
    // without the partition-served column the backfill aligns and applies
    val vals = spark.sql("SELECT id, info.pri FROM gimpn.db.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(vals === Map(1L -> "std", 2L -> "std"))
  }

  test("unpartitioned import still round-trips with name mapping recorded") {
    val src = freshLoc("flat-src")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").coalesce(1).write.parquet(src)
    val t = GraftWrite.importParquet(spark, freshLoc("imp-flat"), src)
    assert(t.toDF().count() == 2)
    assert(NameMapping.of(t).isDefined)
  }
}
