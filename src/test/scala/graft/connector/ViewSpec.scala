package graft.connector

import graft.SparkSpec
import java.nio.file.Files

/** SQL views through the ViewCatalog: create/read/replace/alter/rename/
  * drop, persistence across catalog instances, and view-over-table reads
  * resolving through the defining context. */
class ViewSpec extends SparkSpec {

  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-viewwh").toString
    spark.conf.set("spark.sql.catalog.gv", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gv.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gv.db")
    spark.sql("CREATE TABLE gv.db.base (id BIGINT, cat STRING, v DOUBLE)")
    spark.sql("""INSERT INTO gv.db.base
      SELECT id, concat('c', id % 3), CAST(id AS DOUBLE) FROM range(30)""")
    d
  }

  test("CREATE VIEW + SELECT resolves the stored SQL against the base table") {
    wh
    spark.sql("""CREATE VIEW gv.db.v1 AS
                 SELECT cat, count(*) AS n, sum(v) AS total
                 FROM gv.db.base GROUP BY cat""")
    val rows = spark.sql("SELECT * FROM gv.db.v1 ORDER BY cat").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(1)).sum == 30)
    // the view tracks the table: new data is visible without re-creating
    spark.sql("INSERT INTO gv.db.base VALUES (100, 'c0', 1.0)")
    assert(spark.sql("SELECT sum(n) FROM gv.db.v1").collect()(0).getLong(0) == 31)
  }

  test("views persist across catalog instances (JSON on disk)") {
    wh
    spark.sql("CREATE VIEW gv.db.pv AS SELECT id FROM gv.db.base WHERE id < 5")
    spark.conf.set("spark.sql.catalog.gv2", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gv2.warehouse", wh)
    assert(spark.sql("SELECT * FROM gv2.db.pv").count() == 5)
  }

  test("REPLACE, ALTER SET properties, SHOW VIEWS, rename, drop") {
    wh
    spark.sql("CREATE VIEW gv.db.rv AS SELECT id FROM gv.db.base")
    spark.sql("CREATE OR REPLACE VIEW gv.db.rv AS SELECT cat FROM gv.db.base")
    assert(spark.sql("SELECT * FROM gv.db.rv").columns.toSeq == Seq("cat"))

    spark.sql("ALTER VIEW gv.db.rv SET TBLPROPERTIES ('k'='v1')")
    val c = spark.sessionState.catalogManager.catalog("gv")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("db"), "rv")
    assert(c.loadView(ident).properties().get("k") == "v1")

    val listed = spark.sql("SHOW VIEWS IN gv.db").collect().map(_.getString(1))
    assert(listed.contains("rv"))

    spark.sql("ALTER VIEW gv.db.rv RENAME TO gv.db.rv2")
    assert(!c.viewExists(ident) && spark.sql("SELECT * FROM gv.db.rv2").count() > 0)

    spark.sql("DROP VIEW gv.db.rv2")
    intercept[Exception](spark.sql("SELECT * FROM gv.db.rv2").collect())
  }

  test("ALTER VIEW AS replaces the query but keeps properties") {
    wh
    spark.sql("CREATE VIEW gv.db.av AS SELECT id FROM gv.db.base")
    spark.sql("ALTER VIEW gv.db.av SET TBLPROPERTIES ('keep'='me')")
    spark.sql("ALTER VIEW gv.db.av AS SELECT cat, v FROM gv.db.base")
    assert(spark.sql("SELECT * FROM gv.db.av").columns.toSeq == Seq("cat", "v"))
    val c = spark.sessionState.catalogManager.catalog("gv")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("db"), "av")
    assert(c.loadView(ident).properties().get("keep") == "me")
  }

  test("a view over a view expands recursively; INSERT INTO a view refuses") {
    wh
    spark.sql("""CREATE VIEW gv.db.inner_v AS
                 SELECT cat, v FROM gv.db.base WHERE v >= 10""")
    spark.sql("""CREATE VIEW gv.db.outer_v AS
                 SELECT cat, count(*) AS n FROM gv.db.inner_v GROUP BY cat""")
    val n = spark.sql("SELECT sum(n) FROM gv.db.outer_v").collect()(0).getLong(0)
    assert(n == spark.sql("SELECT count(*) FROM gv.db.base WHERE v >= 10")
      .collect()(0).getLong(0))

    val ex = intercept[Exception](
      spark.sql("INSERT INTO gv.db.inner_v VALUES ('x', 1.0)"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("cannot write to a view")))
  }

  test("DESCRIBE shows the view schema; EXTENDED adds the stored SQL") {
    wh
    spark.sql("CREATE VIEW gv.db.dv AS SELECT id, cat FROM gv.db.base")
    val cols = spark.sql("DESCRIBE gv.db.dv").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(cols.take(2).toSeq == Seq(("id", "bigint"), ("cat", "string")))
    val ext = spark.sql("DESCRIBE EXTENDED gv.db.dv").collect()
      .map(_.getString(0))
    assert(ext.contains("View Text"))
  }

  test("temp views are never hijacked; relative SHOW VIEWS; ALTER AS on missing fails") {
    wh
    spark.sql("CREATE VIEW gv.db.shadow AS SELECT id FROM gv.db.base")
    spark.sql("CREATE TEMP VIEW shadow AS SELECT 42 AS answer")
    spark.sql("USE gv.db")
    try {
      // bare name under a graft current catalog: the TEMP view must win
      assert(spark.sql("SELECT * FROM shadow").columns.toSeq == Seq("answer"))
      spark.sql("DROP VIEW shadow") // drops the temp view, not the stored one
      val c = spark.sessionState.catalogManager.catalog("gv")
        .asInstanceOf[GraftCatalog]
      assert(c.viewExists(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "shadow")), "stored view must survive DROP of the temp view")

      // relative namespace resolves through the current catalog
      val listed = spark.sql("SHOW VIEWS IN db").collect().map(_.getString(1))
      assert(listed.contains("shadow"))

      // ALTER VIEW ... AS must not create a missing view
      intercept[Exception](
        spark.sql("ALTER VIEW gv.db.nope_missing AS SELECT 1"))
      assert(!c.viewExists(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "nope_missing")))
    } finally spark.sql("USE spark_catalog.default")
  }

  test("namespace-qualified names under USE; stored views ignore reader temp views") {
    wh
    val c = spark.sessionState.catalogManager.catalog("gv")
      .asInstanceOf[GraftCatalog]
    def ident(n: String) =
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), n)
    spark.sql("CREATE VIEW gv.db.nsv AS SELECT id FROM gv.db.base WHERE id < 3")
    spark.sql("USE gv.db")
    try {
      // db.nsv under USE gv.db resolves to namespace [db], not [db, db]
      assert(spark.sql("SELECT * FROM db.nsv").count() == 3)
      spark.sql("CREATE VIEW db.nsv2 AS SELECT id FROM gv.db.base WHERE id < 2")
      assert(c.viewExists(ident("nsv2")))
      assert(spark.sql("SELECT * FROM db.nsv2").count() == 2)
      spark.sql("DROP VIEW db.nsv2")
      assert(!c.viewExists(ident("nsv2")))

      // a stored view defined over a bare table name must not be captured
      // by a READER temp view of that name — every reader sees the same view
      spark.sql("CREATE VIEW bare_v AS SELECT id FROM base")
      spark.sql("CREATE TEMP VIEW base AS SELECT 1 AS x")
      try {
        assert(spark.sql("SELECT * FROM gv.db.bare_v").columns.toSeq == Seq("id"))
        assert(spark.sql("SELECT count(*) FROM gv.db.bare_v")
          .collect()(0).getLong(0) >= 30)
      } finally spark.sql("DROP VIEW base")

      // CREATE VIEW whose body references a temp view is rejected
      spark.sql("CREATE TEMP VIEW tvx AS SELECT 7 AS y")
      try {
        val ex = intercept[Exception](
          spark.sql("CREATE VIEW gv.db.badv AS SELECT * FROM tvx"))
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(ex).exists(_.contains("temporary view")))
        assert(!c.viewExists(ident("badv")))
      } finally spark.sql("DROP VIEW tvx")
    } finally spark.sql("USE spark_catalog.default")
  }

  test("subquery expressions inside view bodies are qualified and guarded too") {
    wh
    spark.sql("USE gv.db")
    try {
      // defining context captured for references INSIDE an IN-subquery
      spark.sql("""CREATE VIEW subq_v AS
                   SELECT id FROM base WHERE id IN (SELECT id FROM base WHERE id < 4)""")
      spark.sql("USE spark_catalog.default")
      assert(spark.sql("SELECT * FROM gv.db.subq_v").count() === 4)

      // temp-view references hiding inside a subquery are still rejected
      spark.sql("CREATE TEMP VIEW sq_tv AS SELECT 1 AS id")
      try {
        val ex = intercept[Exception](spark.sql(
          """CREATE VIEW gv.db.badsq AS
             SELECT id FROM gv.db.base WHERE id IN (SELECT id FROM sq_tv)"""))
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(ex).exists(_.contains("temporary view")))
      } finally spark.sql("DROP VIEW sq_tv")
    } finally spark.sql("USE spark_catalog.default")
  }

  test("SHOW VIEWS pattern treats regex metacharacters as literals") {
    wh
    spark.sql("CREATE VIEW gv.db.pat1 AS SELECT id FROM gv.db.base")
    // '.' must match itself, not any character
    assert(spark.sql("SHOW VIEWS IN gv.db LIKE 'pat.'").collect().isEmpty)
    assert(spark.sql("SHOW VIEWS IN gv.db LIKE 'pat*'").collect()
      .map(_.getString(1)).contains("pat1"))
    // '|' alternation still works alongside quoting
    assert(spark.sql("SHOW VIEWS IN gv.db LIKE 'zzz|pat*'").collect()
      .map(_.getString(1)).contains("pat1"))
  }

  test("CREATE VIEW on an existing name fails; IF NOT EXISTS is quiet") {
    wh
    spark.sql("CREATE VIEW gv.db.dup AS SELECT id FROM gv.db.base")
    intercept[Exception](
      spark.sql("CREATE VIEW gv.db.dup AS SELECT cat FROM gv.db.base"))
    spark.sql("CREATE VIEW IF NOT EXISTS gv.db.dup AS SELECT cat FROM gv.db.base")
    assert(spark.sql("SELECT * FROM gv.db.dup").columns.toSeq == Seq("id"))
  }
}
