package graft.format

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ORC's timestamp encoding hole, found by the round-20 workload fuzzer:
  * orc-core's TimestampTreeWriter stores seconds with TRUNCATING division,
  * so micros in [-999000, -1] (the sub-second window just before the epoch)
  * lose their sign at rest and every standard reader — Spark, Hive, the
  * Arrow C++ reader — returns them shifted +1 s. Spark's own
  * `df.write.orc` silently corrupts the same window (verified against an
  * independent Arrow reader: the corruption is IN THE FILE, not the read
  * path). graft refuses to write what it cannot store: the ORC row writer
  * fails loudly on unrepresentable values, the write task dies, and the
  * atomic commit leaves the table untouched. Parquet and Avro store micros
  * exactly and are unaffected. */
class OrcTimestampHoleSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("id", LongType),
    StructField("ts", TimestampType)))
  private def conf = spark.sessionState.newHadoopConf()

  test("boundary values round-trip exactly through the ORC writer") {
    val ok = Seq(-2000001L, -1000001L, -1000000L, -999001L,
      0L, 1L, 999999L, 1000000L, -62135596800000000L + 1000000L)
    val dir = Files.createTempDirectory("orc-hole-ok").toString
    val path = s"$dir/f.orc"
    val w = OrcIO.openWriter(path, schema, conf)
    ok.foreach(m => w.write(InternalRow(m, m)))
    w.close()
    val got = spark.read.orc(path).selectExpr("id", "unix_micros(ts)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    ok.foreach(m => assert(got(m) === m, s"micros $m corrupted to ${got(m)}"))
  }

  test("the unrepresentable window [-999000, -1] micros fails loudly") {
    val dir = Files.createTempDirectory("orc-hole-bad").toString
    for (m <- Seq(-1L, -999L, -500000L, -998999L, -999000L)) {
      val w = OrcIO.openWriter(s"$dir/f$m.orc", schema, conf)
      val e = intercept[IllegalArgumentException] { w.write(InternalRow(m, m)) }
      assert(e.getMessage.contains("ORC cannot represent"), s"micros $m")
      w.close()
    }
  }

  test("nested timestamps (struct / array / map) are checked too") {
    val nested = StructType(Seq(
      StructField("s", StructType(Seq(StructField("ts", TimestampType)))),
      StructField("a", ArrayType(TimestampType)),
      StructField("m", MapType(LongType, TimestampType))))
    val dir = Files.createTempDirectory("orc-hole-nested").toString
    def rowWith(structTs: Long, arrTs: Long, mapTs: Long) = InternalRow(
      InternalRow(structTs),
      new GenericArrayData(Array[Any](arrTs)),
      ArrayBasedMapData(Array[Any](1L), Array[Any](mapTs)))
    // all representable: writes fine
    val w0 = OrcIO.openWriter(s"$dir/ok.orc", nested, conf)
    w0.write(rowWith(-1000000L, 0L, 999999L)); w0.close()
    // one hole value in each container: loud failure
    for ((r, i) <- Seq(rowWith(-1L, 0L, 0L), rowWith(0L, -999L, 0L),
        rowWith(0L, 0L, -500000L)).zipWithIndex) {
      val w = OrcIO.openWriter(s"$dir/bad$i.orc", nested, conf)
      val e = intercept[IllegalArgumentException] { w.write(r) }
      assert(e.getMessage.contains("ORC cannot represent"))
      w.close()
    }
  }

  test("ORC timestamp predicates are not pruned at millis granularity") {
    // ORC's search argument works at MILLISECOND granularity:
    // `ts < timestamp_micros(1)` ties with ts=0 at 0 ms and wrongly
    // proves "cannot match"; even `ts = timestamp_micros(5)` prunes the
    // matching row (round-20 fuzz findings). graft keeps EVERY timestamp
    // comparison out of the ORC sarg.
    val whd = Files.createTempDirectory("orc-ts-sarg").toString
    spark.conf.set("spark.sql.catalog.ots", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ots.warehouse", whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ots.db")
    spark.sql("CREATE TABLE ots.db.t (id BIGINT, ts TIMESTAMP) " +
      "TBLPROPERTIES ('write.format.default'='orc')")
    spark.sql("INSERT INTO ots.db.t VALUES (1, timestamp_micros(0L)), " +
      "(2, timestamp_micros(5L)), (3, timestamp_micros(1500L))")
    def ids(pred: String): Seq[Long] =
      spark.sql(s"SELECT id FROM ots.db.t WHERE $pred ORDER BY id").collect()
        .map(_.getLong(0)).toSeq
    assert(ids("ts < timestamp_micros(1L)") === Seq(1L))
    assert(ids("ts <= timestamp_micros(5L)") === Seq(1L, 2L))
    assert(ids("ts > timestamp_micros(4L)") === Seq(2L, 3L))
    assert(ids("ts = timestamp_micros(5L)") === Seq(2L))
    assert(ids("ts >= timestamp_micros(1001L)") === Seq(3L))
  }

  test("SQL INSERT of a hole value into an ORC table fails atomically") {
    val wh = Files.createTempDirectory("orc-hole-sql").toString
    spark.conf.set("spark.sql.catalog.oh", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.oh.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS oh.db")
    spark.sql("CREATE TABLE oh.db.t (id BIGINT, ts TIMESTAMP) " +
      "TBLPROPERTIES ('write.format.default'='orc')")
    spark.sql("INSERT INTO oh.db.t VALUES (1L, timestamp_micros(-1000000L))")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO oh.db.t VALUES (2L, timestamp_micros(-1L)), " +
        "(3L, timestamp_micros(0L))")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("ORC cannot represent")), chain(e).mkString(" | "))
    // failed write committed nothing: the table still holds exactly row 1
    val rows = spark.sql("SELECT id, unix_micros(ts) FROM oh.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, -1000000L)))
    // ...and parquet tables hold the same value exactly
    spark.sql("CREATE TABLE oh.db.p (id BIGINT, ts TIMESTAMP)")
    spark.sql("INSERT INTO oh.db.p VALUES (1L, timestamp_micros(-1L))")
    assert(spark.sql("SELECT unix_micros(ts) FROM oh.db.p").collect()
      .head.getLong(0) === -1L)
  }
}
