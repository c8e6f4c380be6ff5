package graft.connector

import graft.SparkSpec
import graft.format.GraftTable
import java.nio.file.Files

/** SQL MERGE INTO / UPDATE through SupportsRowLevelOperations (group-based
  * copy-on-write ReplaceData). Unmatched rows in affected files must be
  * carried over, untouched files must survive by reference, and the whole
  * operation must be one atomic snapshot. */
class MergeSpec extends SparkSpec {

  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-mgwh").toString
    spark.conf.set("spark.sql.catalog.mg", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mg.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mg.db")
    d
  }

  test("MERGE INTO: update matched, insert unmatched, carry the rest") {
    wh
    spark.sql("CREATE TABLE mg.db.tgt (id BIGINT, v STRING, n BIGINT)")
    spark.sql("INSERT INTO mg.db.tgt VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    spark.sql("CREATE TABLE mg.db.src (id BIGINT, v STRING)")
    spark.sql("INSERT INTO mg.db.src VALUES (2, 'B'), (4, 'D')")

    spark.sql("""MERGE INTO mg.db.tgt t USING mg.db.src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET t.v = s.v, t.n = t.n + 1
                 WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, 0)""")

    val rows = spark.sql("SELECT id, v, n FROM mg.db.tgt ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "a", 10L), (2L, "B", 21L), (3L, "c", 30L), (4L, "D", 0L)))

    // one atomic snapshot for the whole MERGE; 'overwrite' because the
    // logical row set changed ('replace' is reserved for row-preserving
    // rewrites, which CDC changelog reads skip)
    val t = GraftTable.load(spark, s"$wh/db/tgt")
    assert(t.snapshots.size === 2)
    assert(t.snapshots.last.operation === "overwrite")
  }

  test("MERGE WHEN MATCHED DELETE; untouched files survive by reference") {
    wh
    spark.sql("""CREATE TABLE mg.db.tgt2 (id BIGINT, v STRING)
                 TBLPROPERTIES ('commit.manifest.min-count-to-merge'='1000')""")
    spark.sql("INSERT INTO mg.db.tgt2 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO mg.db.tgt2 VALUES (100, 'x'), (200, 'y')")
    val before = GraftTable.load(spark, s"$wh/db/tgt2")
      .newScan().planFiles().files.map(_.path).toSet
    spark.sql("CREATE TABLE mg.db.src2 (id BIGINT)")
    spark.sql("INSERT INTO mg.db.src2 VALUES (2)")

    // the target-only conjunct (t.id < 50) is pushable and prunes the
    // (100, 200) file by stats; the join conjunct can only be evaluated at
    // runtime and selects within the surviving groups
    spark.sql("""MERGE INTO mg.db.tgt2 t USING mg.db.src2 s
                 ON t.id = s.id AND t.id < 50
                 WHEN MATCHED THEN DELETE""")

    assert(spark.sql("SELECT id FROM mg.db.tgt2 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 100L, 200L))
    // files whose stats exclude id<50 were never rewritten (group pruning)
    val after = GraftTable.load(spark, s"$wh/db/tgt2")
      .newScan().planFiles().files.map(_.path).toSet
    assert((before -- after).nonEmpty, "matched file should be rewritten")
    assert((before & after).nonEmpty,
      "files that can't contain matches must survive by reference")
  }

  test("_file metadata column serves the source file path") {
    wh
    spark.sql("""CREATE TABLE mg.db.mf (id BIGINT, v STRING)
                 TBLPROPERTIES ('commit.manifest.min-count-to-merge'='1000')""")
    spark.sql("INSERT INTO mg.db.mf VALUES (1, 'a')")
    spark.sql("INSERT INTO mg.db.mf VALUES (2, 'b')")
    val rows = spark.sql("SELECT id, _file FROM mg.db.mf ORDER BY id").collect()
    val paths = GraftTable.load(spark, s"$wh/db/mf")
      .newScan().planFiles().files.map(_.path).toSet
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSet.subsetOf(paths))
    assert(rows.map(_.getString(1)).distinct.length == 2)
    // plain SELECT * does not include the metadata column
    assert(spark.sql("SELECT * FROM mg.db.mf").columns.toSeq === Seq("id", "v"))
    // aggregating by _file: per-file row counts
    val counts = spark.sql(
      "SELECT _file, count(*) AS n FROM mg.db.mf GROUP BY _file").collect()
    assert(counts.length == 2 && counts.forall(_.getLong(1) == 1L))
  }

  test("_file works alongside live row-level deletes") {
    wh
    import spark.implicits._
    spark.sql("CREATE TABLE mg.db.mfd (id BIGINT, v STRING)")
    spark.sql("INSERT INTO mg.db.mfd VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val t = GraftTable.load(spark, s"$wh/db/mfd")
    graft.format.Deletes.deleteByEquality(t, Seq(2L).toDF("id"))
    val rows = spark.sql("SELECT id, _file FROM mg.db.mfd ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(rows.forall(_.getString(1).nonEmpty))
  }

  test("join-only MERGE prunes groups at runtime (dynamic file filter)") {
    wh
    spark.sql("""CREATE TABLE mg.db.rt (id BIGINT, v STRING)
                 TBLPROPERTIES ('commit.manifest.min-count-to-merge'='1000')""")
    spark.sql("INSERT INTO mg.db.rt VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO mg.db.rt VALUES (100, 'x'), (200, 'y')")
    val before = GraftTable.load(spark, s"$wh/db/rt")
      .newScan().planFiles().files.map(_.path).toSet
    spark.sql("CREATE TABLE mg.db.rsrc (id BIGINT)")
    spark.sql("INSERT INTO mg.db.rsrc VALUES (2)")

    // NO static target-only conjunct: group selection must come from the
    // runtime file filter (dynamic subquery over _file)
    spark.sql("""MERGE INTO mg.db.rt t USING mg.db.rsrc s ON t.id = s.id
                 WHEN MATCHED THEN DELETE""")

    assert(spark.sql("SELECT id FROM mg.db.rt ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 100L, 200L))
    val after = GraftTable.load(spark, s"$wh/db/rt")
      .newScan().planFiles().files.map(_.path).toSet
    assert((before -- after).nonEmpty, "matched file must be rewritten")
    assert((before & after).nonEmpty,
      "files the runtime filter excluded must survive by reference")
  }

  test("UPDATE SET via SQL (row-level op path)") {
    wh
    spark.sql("CREATE TABLE mg.db.upd (id BIGINT, v STRING)")
    spark.sql("INSERT INTO mg.db.upd VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("UPDATE mg.db.upd SET v = concat(v, '!') WHERE id % 2 = 1")
    assert(spark.sql("SELECT v FROM mg.db.upd ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("a!", "b", "c!"))
  }

  test("_pos metadata column: SQL-native position-delete workflow") {
    wh
    import spark.implicits._
    spark.sql("CREATE TABLE mg.db.mp (id BIGINT, v STRING)")
    spark.sql("INSERT INTO mg.db.mp SELECT id, concat('v', id) FROM range(6)")
    // positions are per-file row indexes, pairing with _file
    val provenance = spark.sql(
      "SELECT id, _file, _pos FROM mg.db.mp ORDER BY _file, _pos").collect()
    assert(provenance.length == 6)
    assert(provenance.groupBy(_.getString(1)).values
      .forall(rows => rows.map(_.getLong(2)).toSeq == rows.indices.map(_.toLong)))
    // the provenance drives a position delete directly
    val pos = spark.sql(
      "SELECT _file AS file_path, _pos AS pos FROM mg.db.mp WHERE id % 2 = 0")
    val t = GraftTable.load(spark, s"$wh/db/mp")
    graft.format.Deletes.deletePositions(t, pos)
    assert(spark.sql("SELECT id FROM mg.db.mp ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L, 5L))
    // _pos still serves correctly THROUGH the live position deletes
    val after = spark.sql("SELECT id, _pos FROM mg.db.mp ORDER BY id").collect()
    assert(after.map(_.getLong(0)).toSeq === Seq(1L, 3L, 5L))
    assert(after.forall(_.getLong(1) >= 0))
  }

  test("_pos on an ORC table takes the row-path counter") {
    wh
    spark.sql("""CREATE TABLE mg.db.mporc (id BIGINT)
                 TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("INSERT INTO mg.db.mporc SELECT id FROM range(4)")
    val rows = spark.sql("SELECT id, _file, _pos FROM mg.db.mporc ORDER BY _file, _pos")
      .collect()
    assert(rows.length == 4)
    assert(rows.groupBy(_.getString(1)).values
      .forall(rs => rs.map(_.getLong(2)).toSeq == rs.indices.map(_.toLong)))
  }

  test("_pos on avro serves the unsplit row-path counter") {
    wh
    spark.sql("""CREATE TABLE mg.db.mpav (id BIGINT)
                 TBLPROPERTIES ('write.format.default'='avro')""")
    spark.sql("INSERT INTO mg.db.mpav VALUES (1)")
    val rows = spark.sql("SELECT _pos, id FROM mg.db.mpav").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
  }

  test("DELETE with a non-convertible predicate falls back to ReplaceData") {
    wh
    spark.sql("CREATE TABLE mg.db.ncd (id BIGINT, v STRING)")
    spark.sql("INSERT INTO mg.db.ncd VALUES (1, 'keep'), (2, 'drop-me'), (3, 'keep2')")
    // contains() has no Filter conversion -> SupportsDelete.canDeleteWhere
    // is false; the row-level op path must take over
    spark.sql("DELETE FROM mg.db.ncd WHERE contains(v, 'drop')")
    assert(spark.sql("SELECT id FROM mg.db.ncd ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }

  test("MERGE on a partitioned table routes rewritten rows to partitions") {
    wh
    spark.sql("""CREATE TABLE mg.db.ptgt (id BIGINT, cat STRING)
                 PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO mg.db.ptgt VALUES (1, 'x'), (2, 'y')")
    spark.sql("CREATE TABLE mg.db.psrc (id BIGINT, cat STRING)")
    spark.sql("INSERT INTO mg.db.psrc VALUES (2, 'z'), (3, 'x')")
    spark.sql("""MERGE INTO mg.db.ptgt t USING mg.db.psrc s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET t.cat = s.cat
                 WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql("SELECT id, cat FROM mg.db.ptgt ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "x"), (2L, "z"), (3L, "x")))
    // partition tuples reflect the post-merge values
    val t = GraftTable.load(spark, s"$wh/db/ptgt")
    val parts = t.newScan().planFiles().files
      .flatMap(_.partition.get("cat")).map(_.toString).toSet
    assert(parts === Set("x", "z"))
  }
}
