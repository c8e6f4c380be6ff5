package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Initial column defaults (iceberg v3): metadata-only backfill of files
  * that predate the column, on every read surface, materialized by
  * rewrites. */
class DefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def freshLoc(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name")
    Files.delete(d)
    d.toString
  }

  test("library reads backfill old files; new files store real values") {
    val df = (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = GraftTable.create(spark, freshLoc("deflib"), df.schema,
      properties = Map("format-version" -> "3"))
    GraftWrite.append(t, df.coalesce(1)) // generation 1: no tier column
    SchemaUpdate(t)
      .addColumn("tier", StringType, initialDefault = Some("basic"))
      .addColumn("score", LongType, initialDefault = Some(7L))
      .commit()
    val gen2 = (10L until 15L).map(i => (i, s"v$i", "gold", 99L))
      .toDF("id", "v", "tier", "score")
    GraftWrite.append(t, gen2.coalesce(1))
    val rows = t.toDF().select("id", "tier", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rows.take(10).forall(r => r._2 == "basic" && r._3 == 7L))
    assert(rows.drop(10).forall(r => r._2 == "gold" && r._3 == 99L))
    // natural Scala literals coerce to the canonical domain (Int → Long
    // for a BIGINT column) instead of failing inside the JSON codec
    SchemaUpdate(GraftTable.load(spark, t.location))
      .addColumn("rank", LongType, initialDefault = Some(3)).commit()
    val coerced = GraftTable.load(spark, t.location).toDF()
      .select("rank").distinct().collect().map(_.getLong(0)).toSet
    assert(coerced === Set(3L))
    // defaults are refused where they cannot be honored
    intercept[IllegalArgumentException](SchemaUpdate(t)
      .addColumn("s", StructType(Seq(StructField("a", LongType))),
        initialDefault = Some(1L)))
    intercept[IllegalArgumentException](SchemaUpdate(t)
      .addColumn("b", ByteType, initialDefault = Some(1.toByte)))
    // a v2 table refuses defaults (a spec-compliant v2 reader would read
    // null where we backfill — silent interop divergence)
    val v2 = GraftTable.create(spark, freshLoc("defv2"), df.schema)
    GraftWrite.append(v2, df.coalesce(1))
    intercept[IllegalArgumentException](SchemaUpdate(v2)
      .addColumn("tier", StringType, initialDefault = Some("basic")).commit())
  }

  test("branch reads backfill a default added on main after the branch") {
    // branch reads follow the table's CURRENT schema (public-Iceberg
    // branch semantics) — a default added on main AFTER the branch was
    // cut must backfill the branch's pre-default files, and the row-id
    // machinery must keep working on the cross (v3)
    val df = (0L until 6L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = GraftTable.create(spark, freshLoc("defbr"), df.schema,
      properties = Map("format-version" -> "3"))
    GraftWrite.append(t, df.coalesce(1))
    Commits.createBranch(t, "work")
    // branch-only append BEFORE the default exists
    GraftWrite.appendToBranch(t, "work",
      (6L until 9L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1))
    SchemaUpdate(GraftTable.load(spark, t.location))
      .addColumn("tier", StringType, initialDefault = Some("basic")).commit()
    val t2 = GraftTable.load(spark, t.location)
    val branchRows = t2.newScan().useRef("work").toDF()
      .select("id", "tier").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(branchRows.length === 9)
    assert(branchRows.forall(_._2 == "basic"),
      s"branch read must backfill the post-branch default: ${branchRows.toSeq}")
    // and a branch append AFTER the default writes real values
    GraftWrite.appendToBranch(t2, "work",
      Seq((9L, "b9", "gold")).toDF("id", "v", "tier").coalesce(1))
    val after = GraftTable.load(spark, t.location).newScan().useRef("work")
      .toDF().select("id", "tier").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(after(9L) === "gold" && after(0L) === "basic")
    // main never saw the branch rows
    assert(GraftTable.load(spark, t.location).toDF().count() === 6)
  }

  test("nested initial defaults backfill struct fields across every surface") {
    val df = (0L until 8L).map(i => (i, s"v$i")).toDF("id", "v")
      .withColumn("info", when(col("id") =!= 7L, struct(col("v").as("tag"))))
    val t = GraftTable.create(spark, freshLoc("defnest"), df.schema,
      properties = Map("format-version" -> "3"))
    GraftWrite.append(t, df.coalesce(1)) // generation 1: info = {tag}
    SchemaUpdate(t)
      .addColumn("info.pri", StringType, initialDefault = Some("std"))
      .commit()
    val gen2 = (10L until 13L).map(i => (i, s"v$i")).toDF("id", "v")
      .withColumn("info", struct(col("v").as("tag"), lit("high").as("pri")))
    GraftWrite.append(t, gen2.coalesce(1))
    def check(rows: Seq[(Long, String)], surface: String): Unit = {
      val byId = rows.toMap
      (0L until 7L).foreach(i => assert(byId(i) == "std", s"$surface: row $i backfills"))
      assert(byId(7L) == null, s"$surface: null parent struct stays null")
      (10L until 13L).foreach(i => assert(byId(i) == "high", s"$surface: row $i stores"))
    }
    // library surface
    check(t.toDF().select(col("id"), col("info.pri")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq,
      "library")
    // DSv2 SQL surface
    val wh = Files.createTempDirectory("graft-defnwh").toString
    spark.conf.set("spark.sql.catalog.gnest", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gnest.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnest.db")
    spark.sql("CREATE TABLE gnest.db.t (id BIGINT, v STRING, " +
      "info STRUCT<tag: STRING>) TBLPROPERTIES ('format-version'='3')")
    val ct = GraftTable.load(spark, s"$wh/db/t")
    GraftWrite.append(ct, df.coalesce(1))
    SchemaUpdate(ct)
      .addColumn("info.pri", StringType, initialDefault = Some("std"))
      .commit()
    GraftWrite.append(GraftTable.load(spark, s"$wh/db/t"), gen2.coalesce(1))
    check(spark.sql("SELECT id, info.pri FROM gnest.db.t").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq,
      "dsv2")
    // nested-pruning scope: the scan un-prunes `info` only while a planned
    // generation MISSES the defaulted descendant; a query over a defaulted
    // column's sibling widens to the full struct pre-compaction (the
    // backfill must observe parent null-ness) and prunes again once every
    // generation stores the field
    def infoReadFields(): Seq[String] =
      spark.sql("SELECT info.tag FROM gnest.db.t").queryExecution.sparkPlan
        .collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }.head.output.find(_.name == "info").get.dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(infoReadFields() === Seq("tag", "pri"),
      "mixed generations must un-prune the defaulted struct")
    // compaction MATERIALIZES the nested default (the output claims the
    // current schema, so the backfill must become physical)
    // each generation is its own single-file group — compact them all
    new Actions(GraftTable.load(spark, s"$wh/db/t")).rewriteDataFiles(minInputFiles = 1)
    val t2 = GraftTable.load(spark, s"$wh/db/t")
    check(spark.sql("SELECT id, info.pri FROM gnest.db.t").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toSeq,
      "post-compaction")
    assert(infoReadFields() === Seq("tag"),
      "all generations store the default now — nested pruning must return")
    val physical = spark.read.parquet(
      t2.newScan().planFiles().tasks.map(_.file.path): _*)
      .select(col("id"), col("info.pri")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
    check(physical.toSeq, "physical")
  }

  test("DSv2 SQL reads backfill vectorized, compose with DVs, and survive compaction") {
    val wh = Files.createTempDirectory("graft-defwh").toString
    spark.conf.set("spark.sql.catalog.gdef", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdef.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdef.db")
    spark.sql("""CREATE TABLE gdef.db.t (id BIGINT, v STRING)
                 TBLPROPERTIES ('format-version'='3',
                                'write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO gdef.db.t SELECT id, concat('v', id) FROM range(10)")
    val t = GraftTable.load(spark, s"$wh/db/t")
    SchemaUpdate(t)
      .addColumn("tier", StringType, initialDefault = Some("basic"))
      .commit()
    spark.sql("INSERT INTO gdef.db.t VALUES (100, 'x', 'gold')")
    // a DV on the OLD generation: fill and delete filters must compose
    spark.sql("DELETE FROM gdef.db.t WHERE id = 3")
    val got = spark.sql("SELECT id, tier FROM gdef.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === ((0L until 10L).filterNot(_ == 3L).map(_ -> "basic") :+
      (100L -> "gold")))
    // filtering ON the defaulted column works on both generations
    assert(spark.sql("SELECT count(*) FROM gdef.db.t WHERE tier = 'basic'")
      .as[Long].head() === 9L)
    // compaction MATERIALIZES the default: the rewritten file physically
    // holds 'basic', and the backfill survives without any fill machinery
    Actions.forTable(GraftTable.load(spark, s"$wh/db/t"))
      .rewriteDataFiles(minInputFiles = 1)
    val t2 = GraftTable.load(spark, s"$wh/db/t")
    val paths = t2.newScan().planFiles().tasks.map(_.file.path)
    val physical = spark.read.parquet(paths: _*)
      .filter(col("id") < 10).select("tier").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(physical === Seq("basic"))
    assert(spark.sql("SELECT count(*) FROM gdef.db.t WHERE tier = 'basic'")
      .as[Long].head() === 9L)
  }

  test("MoR UPDATE keyed on a backfilled column materializes the default") {
    val wh = Files.createTempDirectory("graft-defmor").toString
    spark.conf.set("spark.sql.catalog.gdefm", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdefm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdefm.db")
    spark.sql("""CREATE TABLE gdefm.db.t (id BIGINT, v STRING)
                 TBLPROPERTIES ('format-version'='3',
                                'write.update.mode'='merge-on-read')""")
    spark.sql("INSERT INTO gdefm.db.t SELECT id, concat('v', id) FROM range(5)")
    SchemaUpdate(GraftTable.load(spark, s"$wh/db/t"))
      .addColumn("tier", StringType, initialDefault = Some("basic"))
      .commit()
    // the predicate only matches through the BACKFILL; the delta write's
    // reinsert must carry the filled value so it materializes
    spark.sql("UPDATE gdefm.db.t SET v = 'X' WHERE tier = 'basic' AND id = 2")
    val rows = spark.sql("SELECT id, v, tier FROM gdefm.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows === (0L until 5L).map(i =>
      (i, if (i == 2) "X" else s"v$i", "basic")))
    // the updated row's tier is now PHYSICAL (its new file carries the
    // current schema), no longer a metadata backfill
    val t = GraftTable.load(spark, s"$wh/db/t")
    val newFiles = t.newScan().planFiles().tasks
      .filter(_.file.schemaId == t.metadata.currentSchemaId).map(_.file.path)
    assert(newFiles.nonEmpty)
    assert(spark.read.parquet(newFiles: _*).select("tier")
      .collect().map(_.getString(0)).toSeq === Seq("basic"))
  }

  test("the add_column procedure spells defaults in SQL") {
    val wh = Files.createTempDirectory("graft-defproc").toString
    spark.conf.set("spark.sql.catalog.gdefp", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdefp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdefp.db")
    spark.sql("""CREATE TABLE gdefp.db.t (id BIGINT)
                 TBLPROPERTIES ('format-version'='3')""")
    spark.sql("INSERT INTO gdefp.db.t SELECT id FROM range(5)")
    spark.sql("""CALL gdefp.system.add_column(table => 'db.t',
                   name => 'score', type => 'BIGINT',
                   initial_default => '42')""")
    assert(spark.sql("SELECT DISTINCT score FROM gdefp.db.t")
      .as[Long].collect().toSeq === Seq(42L))
    // date defaults: the catalyst days-int IS the codec's canonical domain
    spark.sql("""CALL gdefp.system.add_column(table => 'db.t',
                   name => 'since', type => 'DATE',
                   initial_default => '2024-01-15')""")
    assert(spark.sql("SELECT DISTINCT CAST(since AS STRING) FROM gdefp.db.t")
      .as[String].collect().toSeq === Seq("2024-01-15"))
    intercept[Exception] {
      spark.sql("""CALL gdefp.system.add_column(table => 'db.t',
                     name => 'bad', type => 'BIGINT',
                     initial_default => 'not-a-number')""").collect()
    }
  }

  test("metadata-only aggregates refuse defaulted columns with missing stats") {
    val df = (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v")
    val wh = Files.createTempDirectory("graft-defagg").toString
    spark.conf.set("spark.sql.catalog.gdefa", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdefa.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdefa.db")
    val t = GraftTable.create(spark, s"$wh/db/t", df.schema,
      properties = Map("format-version" -> "3"))
    GraftWrite.append(t, df.coalesce(1))
    SchemaUpdate(t).addColumn("score", LongType, initialDefault = Some(7L)).commit()
    // MIN over a column the old file has no stats for must NOT fold to a
    // (wrong) metadata answer — it must scan and see the backfill
    assert(spark.sql("SELECT MIN(score) FROM gdefa.db.t").as[Long].head() === 7L)
  }
}
