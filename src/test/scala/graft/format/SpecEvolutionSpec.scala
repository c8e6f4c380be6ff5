package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition-spec evolution (beyond the reference, whose
  * UpdatePartitionSpec is absent): a layout change is ONE metadata commit —
  * new writes land under the new spec, existing files keep theirs forever,
  * and the planner prunes each manifest under its own spec. */
class SpecEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshLoc(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name")
    Files.delete(d)
    d.toString
  }

  private def rows(day: Int, n: Int = 4) =
    (0 until n).map(i => ((day * 100 + i).toLong, s"d$day-$i",
      java.sql.Timestamp.valueOf(f"2024-03-0$day%d 10:0$i%d:00")))
      .toDF("id", "data", "ts")

  test("unpartitioned -> day(ts): one metadata commit, both layouts scan") {
    val loc = freshLoc("spec-evo")
    val t = GraftTable.create(spark, loc, rows(1).schema)
    GraftWrite.append(t, rows(1).coalesce(1)) // gen1: unpartitioned
    Commits.updateSpec(t)(_.day("ts"))
    assert(t.spec.fields.map(_.transform) === Seq(Transforms.DayT))
    assert(t.spec.specId === 1)
    GraftWrite.append(t, rows(2).union(rows(3)).coalesce(1)) // gen2: 2 days

    val all = t.newScan().planFiles()
    assert(all.files.map(_.specId).toSet === Set(0, 1))
    // gen1 files carry no tuple; gen2 route one file per day
    assert(all.files.filter(_.specId == 0).forall(_.partition.isEmpty))
    assert(all.files.filter(_.specId == 1).forall(_.partition.nonEmpty))
    assert(t.toDF().count() === 12)

    // pruning under the NEW spec drops the other day's file; the OLD
    // generation survives partition pruning (no tuple) and is cut by
    // file stats instead
    val pruned = t.newScan()
      .filter(Exprs.and(Exprs.gtEq("ts", "2024-03-03 00:00:00"),
        Exprs.lt("ts", "2024-03-04 00:00:00"))).planFiles()
    assert(pruned.tasks.size < all.tasks.size)
    assert(t.newScan()
      .filter(Exprs.gtEq("ts", "2024-03-03 00:00:00")).toDF().count() === 4)
  }

  test("compaction preserves each generation's spec") {
    val loc = freshLoc("spec-evo-compact")
    val t = GraftTable.create(spark, loc, rows(1).schema)
    GraftWrite.append(t, rows(1).coalesce(1))
    GraftWrite.append(t, rows(1, 2).coalesce(1)) // 2 unpartitioned files
    Commits.updateSpec(t)(_.day("ts"))
    GraftWrite.append(t, rows(2).coalesce(1))
    GraftWrite.append(t, rows(2, 2).coalesce(1)) // 2 files in day bucket

    val expected = t.toDF().select("id").as[Long].collect().sorted.toSeq
    val res = Actions.forTable(t).rewriteDataFiles(minInputFiles = 2)
    assert(res.rewrittenFiles >= 4)
    val after = t.newScan().planFiles().files
    // outputs keep their group's spec: the old generation is still spec 0
    assert(after.map(_.specId).toSet === Set(0, 1))
    assert(after.filter(_.specId == 1).forall(_.partition.nonEmpty))
    assert(t.toDF().select("id").as[Long].collect().sorted.toSeq === expected)
  }

  test("SQL reads and writes work across the evolution") {
    val d = Files.createTempDirectory("graft-sewh").toString
    spark.conf.set("spark.sql.catalog.se", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.se.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS se.db")
    spark.sql("CREATE TABLE se.db.evo (id BIGINT, cat STRING)")
    spark.sql("INSERT INTO se.db.evo VALUES (1, 'x'), (2, 'y')")
    val t = GraftTable.load(spark, s"$d/db/evo")
    Commits.updateSpec(t)(_.identity("cat"))
    spark.sql("INSERT INTO se.db.evo VALUES (3, 'x'), (4, 'z')")
    assert(spark.sql("SELECT id FROM se.db.evo ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(spark.sql("SELECT id FROM se.db.evo WHERE cat = 'x' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // new files carry identity tuples, old ones none
    val files = GraftTable.load(spark, s"$d/db/evo").newScan().planFiles().files
    assert(files.exists(_.partition.nonEmpty) && files.exists(_.partition.isEmpty))
  }
}
