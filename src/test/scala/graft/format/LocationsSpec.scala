package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** LocationProvider seam (reference core/.../LocationProviders.java): every
  * data-file path the writers construct flows through one trait, so data
  * placement — folder layout, custom data root, object-store hash
  * prefixes — is a table property, not a code change. */
class LocationsSpec extends AnyFunSuite {

  test("default provider places under {location}/data") {
    val p = LocationProviders.forTable("/wh/t", Map.empty)
    assert(p.isInstanceOf[DefaultLocationProvider])
    assert(p.newDataLocation("f1.parquet") === "/wh/t/data/f1.parquet")
    assert(p.dataRoot === "/wh/t/data")
  }

  test("write.folder-storage.path overrides the data root") {
    val p = LocationProviders.forTable("/wh/t",
      Map(LocationProviders.FolderStoragePath -> "s3a://bucket/other"))
    assert(p.newDataLocation("f1.parquet") === "s3a://bucket/other/f1.parquet")
  }

  test("object-store provider injects a deterministic hash prefix") {
    val p = LocationProviders.forTable("/wh/t",
      Map(LocationProviders.ObjectStoreEnabled -> "true"))
    assert(p.isInstanceOf[ObjectStoreLocationProvider])
    val loc = p.newDataLocation("batch-1")
    assert(loc.matches("/wh/t/data/[0-9a-f]{8}/batch-1"), loc)
    // deterministic (a retry lands on the same key)…
    assert(loc === p.newDataLocation("batch-1"))
    // …and distributing (names spread across prefixes)
    val prefixes = (0 until 64)
      .map(i => p.newDataLocation(s"batch-$i").split("/")(4)).distinct
    assert(prefixes.size > 32, s"poor prefix spread: ${prefixes.size}")
    // write.object-storage.path wins over the default root
    val p2 = LocationProviders.forTable("/wh/t", Map(
      LocationProviders.ObjectStoreEnabled -> "true",
      LocationProviders.ObjectStorePath -> "s3a://bucket/shards"))
    assert(p2.newDataLocation("x").startsWith("s3a://bucket/shards/"))
  }

  test("object-store table end-to-end: writes hash-prefixed, reads fine") {
    val spark = graft.SparkSpecBase.spark
    import spark.implicits._
    val loc = {
      val d = java.nio.file.Files.createTempDirectory("graft-oslp")
      java.nio.file.Files.delete(d); d.toString
    }
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df.schema,
      properties = Map(LocationProviders.ObjectStoreEnabled -> "true"))
    GraftWrite.append(t, df)
    Deletes.deleteByEquality(t, Seq(2L).toDF("id"))
    val files = t.newScan().planFiles()
    (files.files ++ files.deleteFiles.map(_._1)).foreach { f =>
      assert(f.path.matches(s"$loc/data/[0-9a-f]{8}/.*"), f.path)
    }
    assert(t.toDF().select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    // maintenance still finds the tree (orphan listing walks dataRoot)
    val res = Actions.forTable(t).removeOrphanFiles(olderThanMillis = 0L)
    assert(res.deletedOrphans.isEmpty) // nothing orphaned — all referenced
  }
}
