package graft.format

import graft.SparkSpec
import java.nio.file.Files

/** Rolling manifest writes (reference RollingManifestWriter +
  * TableProperties.MANIFEST_TARGET_SIZE_BYTES) and target-size-binned
  * manifest merging (ManifestMergeManager.groupManifests): one oversized
  * append lands as several target-sized manifests so plan-time reads
  * parallelize; steady-state full manifests are never re-merged; a
  * file-count-scale import writes its manifest chunks in executors. */
class RollingManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshLoc(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name")
    Files.delete(d)
    d.toString
  }

  private val schema = Seq((0L, "v")).toDF("id", "v").schema

  private def manifestsOf(t: GraftTable): Seq[ManifestFile] = {
    val m = t.metadata
    t.readManifestList(m, m.currentSnapshot.get)
  }

  private def descs(n: Int, offset: Int = 0): Seq[DataFile] =
    (0 until n).map(i => DataFile(
      path = f"/data/file-${offset + i}%05d.parquet",
      recordCount = 10L, fileSizeInBytes = 1000L,
      lowerBounds = Map(1 -> (offset + i).toLong * 10),
      upperBounds = Map(1 -> ((offset + i).toLong * 10 + 9))))

  test("fastAppend rolls one oversized append into target-sized manifests") {
    val t = GraftTable.create(spark, freshLoc("roll"), schema,
      properties = Map(Commits.ManifestTargetSizeKey -> "2000"))
    Commits.fastAppend(t, descs(60))
    val mfs = manifestsOf(t)
    assert(mfs.size > 1, "an oversized append must roll into several manifests")
    assert(mfs.map(_.addedFilesCount).sum === 60)
    // every rolled manifest respects the target (one entry of slack: the
    // roll cuts BEFORE the entry that would overflow)
    assert(mfs.forall(_.addedFilesCount < 60))
    val plan = t.newScan().planFiles()
    assert(plan.tasks.size === 60)
    assert(plan.manifestsScanned === mfs.size)
    // bounds-pruned scan touches a strict subset of manifests' entries
    val pruned = t.newScan().filter(Exprs.gtEq("id", 550L)).planFiles()
    assert(pruned.tasks.size === 5)
  }

  test("mergeAppend bins by target size: full manifests pass through untouched") {
    val t = GraftTable.create(spark, freshLoc("bins"), schema,
      properties = Map(
        Commits.ManifestTargetSizeKey -> "2000",
        Commits.ManifestMinMergeCount -> "2"))
    // grow the table until at least two manifests reach the target
    (0 until 10).foreach(i => Commits.mergeAppend(t, descs(8, offset = i * 8)))
    val before = manifestsOf(t)
    val full = before.filter(_.length >= 1200).map(_.path).toSet
    assert(full.size >= 2, s"expected full manifests, got ${before.map(_.length)}")
    // another merge-append: full manifests keep their PATHS (no re-read,
    // no re-encode) — the quadratic-metadata-rewrite guard
    Commits.mergeAppend(t, descs(8, offset = 80))
    val after = manifestsOf(t).map(_.path).toSet
    assert(full.subsetOf(after),
      "full manifests must not be re-merged by later appends")
    // nothing lost across all the merging
    val plan = t.newScan().planFiles()
    assert(plan.tasks.size === 88)
    assert(plan.tasks.map(_.file.path).distinct.size === 88)
  }

  test("large import writes rolled manifest chunks in executors") {
    val src = freshLoc("dimp-src")
    (0L until 30L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(6).write.parquet(src)
    val t = GraftWrite.importParquet(spark, freshLoc("dimp"), src,
      properties = Map(
        Commits.ManifestTargetSizeKey -> "400",
        GraftWrite.ImportManifestThresholdKey -> "2"))
    val mfs = manifestsOf(t)
    assert(mfs.size > 1, "the import must roll into several manifests")
    assert(mfs.map(_.addedFilesCount).sum === 6)
    assert(t.toDF().select("id").as[Long].collect().sorted.toSeq ===
      (0L until 30L))
  }

  test("distributed append falls back when a rival commit moves the ids") {
    val loc = s"mem://bucket/dfall-${java.util.UUID.randomUUID()}"
    GraftTable.create(spark, loc, schema)
    // wrap the store so a rival append lands between our provisional id
    // read and our CAS — the distributed append must detect the moved ids
    // and fall back to the driver-side write on fresh metadata
    val faulty = new RivalInjectingStore(InMemoryObjectStore)
    val t = new GraftTable(new TableOps(loc, new ObjectStoreFileIO(faulty)), spark)
    faulty.beforePutIfAbsent = () => {
      val rival = new GraftTable(new TableOps(loc), spark)
      Commits.fastAppend(rival, descs(3, offset = 1000))
    }
    Commits.fastAppendDistributed(t, descs(5))
    val t2 = new GraftTable(new TableOps(loc), spark)
    val plan = t2.newScan().planFiles()
    assert(plan.tasks.size === 8, "both appends' files must be live")
    assert(plan.tasks.map(_.file.path).distinct.size === 8)
    // v3 would also need distinct row-id bases; this table is v2, so the
    // invariant here is simply both snapshots in the log
    assert(t2.metadata.snapshots.size === 2)

    // the fallback orphaned the provisionally-written manifests; the
    // metadata sweep of removeOrphanFiles reclaims exactly those and
    // leaves every version-referenced manifest, list and version file
    val io = t2.ops.io
    val before = io.list(s"$loc/metadata").map(_.path).toSet
    val res = Actions.forTable(t2)
      .removeOrphanFiles(System.currentTimeMillis() + 60000)
    val metaOrphans = res.deletedOrphans.filter(_.contains("/metadata/"))
    assert(metaOrphans.nonEmpty,
      "the fallback's provisional manifests must be reclaimed")
    // the retry also orphans attempt 1's manifest LIST (written before the
    // CAS that the rival won) — both kinds are commit-attempt leftovers
    assert(metaOrphans.forall(p =>
      p.contains("manifest-") || p.contains("/snap-")))
    assert(metaOrphans.exists(_.contains("manifest-")))
    val after = io.list(s"$loc/metadata").map(_.path).toSet
    assert(after === before -- metaOrphans)
    // nothing live was touched: the table still reads fine
    val t3 = new GraftTable(new TableOps(loc), spark)
    assert(t3.newScan().planFiles().tasks.size === 8)
    assert(t3.metadata.snapshots.size === 2)
  }

  test("metadata sweep FAILS on a transient manifest-list read error instead of deleting live manifests") {
    val loc = s"mem://bucket/msweepf-${java.util.UUID.randomUUID()}"
    GraftTable.create(spark, loc, schema)
    val t0 = new GraftTable(new TableOps(loc), spark)
    Commits.fastAppend(t0, descs(5))
    Commits.fastAppend(t0, descs(5, offset = 5))
    val metaBefore = t0.ops.io.list(s"$loc/metadata").map(_.path).toSet
    // every GET of a live manifest list hiccups (transient store error,
    // NOT not-found) — the sweep must fail the action, because treating
    // the list as expired would classify its manifests as orphans and
    // delete live metadata (reference RemoveOrphanFiles fails on
    // unreadable metadata rather than classifying)
    val faulty = new FailingGetStore(InMemoryObjectStore, "/metadata/snap-")
    val tf = new GraftTable(new TableOps(loc, new ObjectStoreFileIO(faulty)), spark)
    val ex = intercept[Exception] {
      Actions.forTable(tf).removeOrphanFiles(System.currentTimeMillis() + 60000)
    }
    def causes(e: Throwable): List[Throwable] =
      if (e == null) Nil else e :: causes(e.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null && c.getMessage.contains("injected")),
      s"expected the injected store error to surface, got: $ex")
    assert(t0.ops.io.list(s"$loc/metadata").map(_.path).toSet === metaBefore,
      "a failed sweep must not have deleted anything")
    assert(new GraftTable(new TableOps(loc), spark)
      .newScan().planFiles().tasks.size === 10)
  }

  test("metadata sweep keeps every referenced manifest across snapshots") {
    val loc = freshLoc("msweep")
    val t = GraftTable.create(spark, loc, schema,
      properties = Map(Commits.ManifestTargetSizeKey -> "2000"))
    Commits.fastAppend(t, descs(30))
    Commits.fastAppend(t, descs(30, offset = 30))
    val metaBefore = t.ops.io.list(s"${t.location}/metadata").map(_.path).toSet
    val res = Actions.forTable(t)
      .removeOrphanFiles(System.currentTimeMillis() + 60000)
    assert(res.deletedOrphans.filter(_.contains("/metadata/")).isEmpty,
      "a clean commit history has no metadata orphans")
    assert(t.ops.io.list(s"${t.location}/metadata").map(_.path).toSet === metaBefore)
    assert(t.newScan().planFiles().tasks.size === 60)
  }
}

/** Minimal hook-carrying store wrapper (the ObjectStoreSpec FaultyStore
  * pattern): runs `beforePutIfAbsent` once, just before the next CAS. */
private final class RivalInjectingStore(inner: ObjectStoreClient)
  extends ObjectStoreClient {
  @volatile var beforePutIfAbsent: () => Unit = null
  override def get(key: String): Option[Array[Byte]] = inner.get(key)
  override def put(key: String, bytes: Array[Byte]): Unit = inner.put(key, bytes)
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val hook = beforePutIfAbsent
    if (hook != null) { beforePutIfAbsent = null; hook() }
    inner.putIfAbsent(key, bytes)
  }
  override def delete(key: String): Unit = inner.delete(key)
  override def list(prefix: String): Seq[(String, Long, Long)] = inner.list(prefix)
}

/** Store whose GETs of keys containing `substr` always fail with a plain
  * IOException (a transient store error, NOT not-found). Top-level so the
  * closure-captured FileIO serializes into local-mode tasks. */
private final class FailingGetStore(inner: ObjectStoreClient, substr: String)
  extends ObjectStoreClient {
  override def get(key: String): Option[Array[Byte]] =
    if (key.contains(substr))
      throw new java.io.IOException(s"injected: transient GET failure $key")
    else inner.get(key)
  override def put(key: String, bytes: Array[Byte]): Unit = inner.put(key, bytes)
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    inner.putIfAbsent(key, bytes)
  override def delete(key: String): Unit = inner.delete(key)
  override def list(prefix: String): Seq[(String, Long, Long)] = inner.list(prefix)
}
