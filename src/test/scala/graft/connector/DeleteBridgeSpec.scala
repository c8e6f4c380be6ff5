package graft.connector

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.{Or, Predicate}
import org.apache.spark.sql.sources

/** The metadata-DELETE predicate bridge. Spark's default
  * SupportsDelete.canDeleteWhere(Predicate[]) bridge narrows an OR whose
  * one side fails v1 conversion to the OTHER SIDE ALONE
  * (PredicateUtils.toV1, verified against spark-catalyst 4.1.2) — a
  * metadata DELETE then removes only that disjunct's rows while Spark
  * reports the whole DELETE done (round-20 fuzz finding: `DELETE WHERE
  * id % 2 = 0 OR d > x` deleted nothing and rows matching only the modulo
  * survived). graft overrides the V2 entry points with an all-or-nothing
  * converter so inexact conditions fall back to the row-level rewrite. */
class DeleteBridgeSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-dbr").toString
    spark.conf.set("spark.sql.catalog.dbr", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dbr.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dbr.db")
    d
  }

  test("DELETE with OR of unconvertible + convertible disjuncts deletes exactly") {
    wh
    spark.sql("CREATE TABLE dbr.db.t (id BIGINT, cat STRING, d DECIMAL(38,30)) " +
      "PARTITIONED BY (cat)")
    spark.sql("INSERT INTO dbr.db.t VALUES (27, 'sp ace', NULL), (3, 'a', NULL)")
    // rows arriving through a MERGE ride the ReplaceData write path — the
    // fuzz case that exposed the narrowed delete
    spark.sql("""MERGE INTO dbr.db.t t
      USING (SELECT * FROM VALUES (12L, '😀x'), (1L, 'cc') AS s(sid, nc)) s
      ON t.id = s.sid
      WHEN MATCHED THEN UPDATE SET cat = s.nc
      WHEN NOT MATCHED THEN INSERT (id, cat, d) VALUES (s.sid, s.nc, NULL)""")
    // `id % 2 = 0` has no v1 Filter form; `d > lit` does. The lossy default
    // bridge kept only the d-clause; the strict bridge refuses and the
    // row-level rewrite evaluates the real condition.
    spark.sql("DELETE FROM dbr.db.t WHERE id % 2L = 0L " +
      "OR d > CAST('-7.25' AS DECIMAL(38,30))")
    val rows = spark.sql("SELECT id, cat FROM dbr.db.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "cc"), (3L, "a"), (27L, "sp ace")), s"got $rows")
  }

  test("toV1Strict: OR is all-or-nothing, never one disjunct") {
    val idGt = new Predicate(">",
      Array(Expressions.column("id"), Expressions.literal(5L)))
    val opaque = new Predicate("=", Array(
      new org.apache.spark.sql.connector.expressions.GeneralScalarExpression(
        "%", Array(Expressions.column("id"), Expressions.literal(2L))),
      Expressions.literal(0L)))
    assert(FilterBridge.toV1Strict(idGt) ===
      Some(sources.GreaterThan("id", 5L)))
    assert(FilterBridge.toV1Strict(opaque).isEmpty)
    assert(FilterBridge.toV1Strict(new Or(idGt, opaque)).isEmpty,
      "an OR with an unconvertible side must NOT convert")
    assert(FilterBridge.toV1Strict(new Or(idGt, idGt)) ===
      Some(sources.Or(sources.GreaterThan("id", 5L),
        sources.GreaterThan("id", 5L))))
    // reversed operand order flips the comparison
    val flipped = new Predicate("<",
      Array(Expressions.literal(5L), Expressions.column("id")))
    assert(FilterBridge.toV1Strict(flipped) ===
      Some(sources.GreaterThan("id", 5L)))
  }

  test("fully-convertible DELETE still takes the metadata path") {
    wh
    spark.sql("CREATE TABLE dbr.db.m (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO dbr.db.m VALUES (1, 'a'), (2, 'b')")
    spark.sql("DELETE FROM dbr.db.m WHERE cat = 'a' OR cat = 'c'")
    assert(spark.sql("SELECT id FROM dbr.db.m").collect().map(_.getLong(0)).toSeq
      === Seq(2L))
    // metadata-only: the snapshot operation is 'delete', not 'overwrite'
    val ops = spark.sql("SELECT operation FROM dbr.db.`m$snapshots` " +
      "ORDER BY snapshot_id").collect().map(_.getString(0)).toSeq
    assert(ops === Seq("append", "delete"), s"got $ops")
  }
}
