package graft.format

import graft.SparkSpec
import java.nio.file.Files

/** Manifests are single-content (data XOR deletes), like the reference's
  * ManifestContent DATA/DELETES split. Round-20 fuzz finding: rewriteManifests
  * consolidated data and delete entries into ONE manifest, buildManifestFile
  * flagged it as a DELETE manifest, and every consumer that selects data
  * manifests by `content == FileContent.Data` silently skipped its data
  * entries — above all the metadata-only DELETE path, which passed the
  * manifest through untouched and let every matching row in it survive. */
class ManifestContentSpec extends SparkSpec {

  private lazy val wh: String = {
    val d = Files.createTempDirectory("graft-mcwh").toString
    spark.conf.set("spark.sql.catalog.mc", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mc.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mc.db")
    d
  }

  test("rewriteManifests keeps data and delete manifests separate") {
    wh
    spark.sql("CREATE TABLE mc.db.rm (id BIGINT, cat STRING) " +
      "PARTITIONED BY (cat)")
    spark.sql("INSERT INTO mc.db.rm VALUES (1,'a'),(2,'b'),(3,'c')")
    val t0 = GraftTable.load(spark, s"$wh/db/rm")
    Deletes.deleteByEquality(t0, spark.sql("SELECT * FROM VALUES (2L) k(id)"))
    Actions.forTable(GraftTable.load(spark, s"$wh/db/rm")).rewriteManifests()

    val t = GraftTable.load(spark, s"$wh/db/rm")
    val m = t.metadata
    val manifests = t.readManifestList(m, m.currentSnapshot.get)
    assert(manifests.nonEmpty)
    manifests.foreach { mf =>
      val entries = t.readManifest(mf, m.schema)
      val classes = entries.map(_.file.content == FileContent.Data).distinct
      assert(classes.size == 1,
        s"manifest ${mf.path} mixes data and delete entries")
      // the descriptor's content flag must agree with the entries
      assert((mf.content == FileContent.Data) == classes.head,
        s"manifest ${mf.path} content flag disagrees with its entries")
    }
    // both classes survived the rewrite
    assert(manifests.exists(_.content == FileContent.Data))
    assert(manifests.exists(_.content != FileContent.Data))
    // and the table still reads correctly (eq-delete still applied)
    assert(spark.sql("SELECT id FROM mc.db.rm ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }

  test("DELETE after eqDelete + rewriteManifests covers pre-rewrite files") {
    wh
    spark.sql("CREATE TABLE mc.db.dl (id BIGINT, cat STRING) " +
      "PARTITIONED BY (cat, bucket(4, id))")
    spark.sql("INSERT INTO mc.db.dl VALUES (1,'a'),(2,'b'),(3,'sp ace')," +
      "(4,'e=;/x'),(5,''),(6,CAST(NULL AS STRING)),(7,'😀x'),(8,'￿')")
    val path = s"$wh/db/dl"
    def t() = GraftTable.load(spark, path)
    Deletes.deleteByEquality(t(), spark.sql("SELECT * FROM VALUES (2L) k(id)"))
    Actions.forTable(t()).rewriteManifests()
    spark.sql("INSERT INTO mc.db.dl VALUES (10,'b'),(11,'cc')")
    // NOT(cat = ...) keeps NULL rows (three-valued logic) and must reach
    // the files consolidated by the manifest rewrite
    spark.sql("DELETE FROM mc.db.dl WHERE NOT (cat = 'sp ace')")
    val rows = spark.sql("SELECT id, cat FROM mc.db.dl ORDER BY id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(rows === Seq((3L, "sp ace"), (6L, null)), s"got $rows")
  }

  test("merged delete manifests keep partition-global masks visible under filters") {
    wh
    // commit-time manifest merging may put tuple-carrying eq-delete entries
    // and tuple-LESS (partition-global) pos-delete entries in one delete
    // manifest. Its partition summary must stay UNBOUNDED: a summary built
    // from the eq tuples alone would let a partition filter prune the
    // manifest and drop the global masks (pos-deleted rows resurrect in
    // every filtered scan while unfiltered scans stay correct — the exact
    // round-20 fuzz failure).
    spark.sql("""CREATE TABLE mc.db.gm (id BIGINT, cat STRING, v DOUBLE)
      PARTITIONED BY (cat)
      TBLPROPERTIES ('write.update.mode'='merge-on-read',
                     'commit.manifest.min-count-to-merge'='1')""")
    spark.sql("INSERT INTO mc.db.gm VALUES (1,'a',1.0),(2,'a',2.0)," +
      "(3,'zz',3.0),(4,'zz',4.0)")
    // scoped eq-delete (tuple-carrying entry: keys determine the partition)
    Deletes.deleteByEquality(GraftTable.load(spark, s"$wh/db/gm"),
      spark.sql("SELECT * FROM VALUES ('zz', 3L) k(cat, id)"))
    // MoR update: partition-global pos-delete entries (empty tuples)
    spark.sql("UPDATE mc.db.gm SET v = -1.0 WHERE id IN (1, 4)")
    // filtered scans must still apply the pos-delete masks
    val a = spark.sql("SELECT id, v FROM mc.db.gm WHERE cat = 'a' ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === Seq((1L, -1.0), (2L, 2.0)), s"got $a")
    val z = spark.sql("SELECT id, v FROM mc.db.gm WHERE cat > 'b' ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(z === Seq((4L, -1.0)), s"got $z")
    // summaries over entries with an absent field are unbounded (the
    // producer-side invariant behind the scan behavior above)
    val t = GraftTable.load(spark, s"$wh/db/gm")
    val m = t.metadata
    t.readManifestList(m, m.currentSnapshot.get)
      .filter(_.content != FileContent.Data)
      .foreach { mf =>
        val entries = t.readManifest(mf, m.schema)
        if (entries.exists(_.file.partition.isEmpty))
          mf.partitionSummaries.foreach { s =>
            assert(s.lower == null && s.upper == null && s.containsNull,
              s"global delete entries must make the summary unbounded: $s")
          }
      }
  }

  test("buildManifestFile refuses mixed data + delete entries") {
    wh
    spark.sql("CREATE TABLE mc.db.mx (id BIGINT)")
    spark.sql("INSERT INTO mc.db.mx VALUES (1)")
    val t = GraftTable.load(spark, s"$wh/db/mx")
    val m = t.metadata
    val mf = t.readManifestList(m, m.currentSnapshot.get).head
    val dataEntry = t.readManifest(mf, m.schema).head
    val delEntry = dataEntry.copy(file = dataEntry.file.copy(
      path = "deletes/fake.parquet", content = FileContent.EqualityDeletes,
      equalityIds = Seq(1)))
    val e = intercept[IllegalArgumentException] {
      Commits.buildManifestFile("mixed.avro", 1L, m.defaultSpecId,
        Seq(dataEntry, delEntry), 0L, m.spec,
        t.partTypesOf(m)(m.defaultSpecId))
    }
    assert(e.getMessage.contains("mix"))
  }
}
