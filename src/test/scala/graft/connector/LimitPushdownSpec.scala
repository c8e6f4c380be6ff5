package graft.connector

import graft.SparkSpec
import graft.format.{GraftTable, GraftWrite}
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** Bare-LIMIT pushdown: the scan must plan only enough files to cover the
  * limit, and every unsafe case must keep the full file set. File counts
  * are read from the scan description (partition counts are not 1:1 with
  * files — Spark bin-packs small files). */
class LimitPushdownSpec extends SparkSpec {

  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-limwh").toString
    spark.conf.set("spark.sql.catalog.gl", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gl.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gl.db")
    // four deterministic single-file commits, two rows each
    import spark.implicits._
    val t = GraftTable.create(spark, s"$d/db/t",
      Seq((0L, "x")).toDF("id", "s").schema)
    (0 until 4).foreach { i =>
      GraftWrite.append(t,
        Seq((i.toLong, s"a$i"), (i + 10L, s"b$i")).toDF("id", "s").coalesce(1))
    }
    d
  }

  private def plannedFiles(df: DataFrame): Int = {
    val p = df.queryExecution.executedPlan.toString
    "files=(\\d+)".r.findFirstMatchIn(p) match {
      case Some(m) => m.group(1).toInt
      case None => sys.error(s"no graft scan in plan:\n$p")
    }
  }

  test("LIMIT plans only enough files") {
    wh
    val q = spark.sql("SELECT * FROM gl.db.t LIMIT 3")
    // 3 rows need two 2-row files, not all four
    assert(plannedFiles(q) == 2, s"planned ${plannedFiles(q)} files")
    assert(q.count() == 3)
  }

  test("LIMIT beyond the row count keeps every file and all rows") {
    wh
    val q = spark.sql("SELECT * FROM gl.db.t LIMIT 100")
    assert(plannedFiles(q) == 4)
    assert(q.count() == 8)
  }

  test("a WHERE clause disables file truncation") {
    wh
    val q = spark.sql("SELECT * FROM gl.db.t WHERE s LIKE 'b%' LIMIT 4")
    assert(plannedFiles(q) == 4)
    assert(q.count() == 4)
  }

  test("live position deletes keep the full file set") {
    wh
    spark.sql("""CREATE TABLE gl.db.td (id BIGINT)
                 TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    // two-row files, so deleting one row cannot become a whole-file delete
    import spark.implicits._
    val td = GraftTable.load(spark, s"$wh/db/td")
    (0 until 3).foreach(i =>
      GraftWrite.append(td, Seq(i.toLong, i + 10L).toDF("id").coalesce(1)))
    spark.sql("DELETE FROM gl.db.td WHERE id = 0")
    assert(spark.sql("SELECT * FROM gl.db.td").count() == 5)
    val full = plannedFiles(spark.sql("SELECT * FROM gl.db.td"))
    val q = spark.sql("SELECT * FROM gl.db.td LIMIT 2")
    assert(plannedFiles(q) == full, "deletes make per-file survivor counts unknown")
    assert(q.count() == 2)
  }
}
