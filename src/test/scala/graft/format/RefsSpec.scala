package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Named refs — branches and tags (public Iceberg v2 refs; the reference
  * fork predates them): ref CRUD + JSON persistence, isolated branch
  * writes, fast-forward publish (branch WAP), expiry protection, SQL
  * VERSION AS OF by name, the `$refs` metadata table and ref procedures. */
class RefsSpec extends SparkSpec {
  import spark.implicits._

  private def freshLoc(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name")
    Files.delete(d)
    d.toString
  }

  private def rows(n: Int, off: Int = 0) =
    (0 until n).map(i => ((off * 1000 + i).toLong, s"d-$off-$i"))
      .toDF("id", "data")

  test("refs round-trip through metadata JSON and survive reload") {
    val loc = freshLoc("refs")
    val t = GraftTable.create(spark, loc, rows(1).schema)
    GraftWrite.append(t, rows(2, 0))
    val s1 = t.currentSnapshot.get.snapshotId
    Commits.createTag(t, "v1", maxRefAgeMs = Some(123456L))
    Commits.createBranch(t, "dev")
    val re = GraftTable.load(spark, loc).metadata
    assert(re.refs("v1") == SnapshotRef(s1, isBranch = false,
      maxRefAgeMs = Some(123456L)))
    assert(re.refs("dev") == SnapshotRef(s1, isBranch = true))
    assert(re.refSnapshotId("main").contains(s1))
    intercept[IllegalArgumentException](Commits.createBranch(t, "dev"))
    intercept[IllegalArgumentException](Commits.createBranch(t, "main"))
    Commits.dropRef(t, "v1")
    assert(!GraftTable.load(spark, loc).metadata.refs.contains("v1"))
  }

  test("branch appends are invisible on main until fastForward publishes") {
    val loc = freshLoc("refswap")
    val t = GraftTable.create(spark, loc, rows(1).schema)
    GraftWrite.append(t, rows(2, 0))
    Commits.createBranch(t, "audit")
    GraftWrite.appendToBranch(t, "audit", rows(3, 1))
    GraftWrite.appendToBranch(t, "audit", rows(1, 2))
    assert(t.toDF().count() == 2, "main must not see branch writes")
    assert(t.newScan().useRef("audit").toDF().count() == 6)
    assert(t.newScan().useRef("main").toDF().count() == 2)
    // the branch head parents back to the fork point
    val m = t.metadata
    val head = m.snapshot(m.refs("audit").snapshotId).get
    assert(m.ancestors(Some(head.snapshotId)).map(_.snapshotId)
      .contains(m.currentSnapshotId.get))
    // publish: fast-forward main to the branch head
    Commits.fastForward(t, "main", head.snapshotId)
    assert(t.toDF().count() == 6)
    // a tag is not fast-forwardable; a non-descendant is rejected
    Commits.createTag(t, "pin")
    intercept[IllegalArgumentException](
      Commits.fastForward(t, "pin", head.snapshotId))
    GraftWrite.append(t, rows(1, 3))
    intercept[IllegalArgumentException](
      Commits.fastForward(t, "main", head.snapshotId))
  }

  test("expireSnapshots keeps ref-reachable snapshots; aged tags retire") {
    val loc = freshLoc("refsexp")
    val t = GraftTable.create(spark, loc, rows(1).schema)
    GraftWrite.append(t, rows(1, 0))
    val s1 = t.currentSnapshot.get.snapshotId
    GraftWrite.append(t, rows(1, 1))
    GraftWrite.append(t, rows(1, 2))
    Commits.createTag(t, "keepme", Some(s1))
    Commits.createTag(t, "stale", Some(s1), maxRefAgeMs = Some(1L))
    Thread.sleep(5)
    val (m2, _) = Commits.expireSnapshots(t, System.currentTimeMillis() + 1000)
    assert(m2.snapshot(s1).isDefined, "tagged snapshot survives expiry")
    assert(m2.refs.contains("keepme"))
    assert(!m2.refs.contains("stale"), "aged-out tag retires")
    assert(t.newScan().useRef("keepme").toDF().count() == 1)
    // drop the tag; the next expiry removes the snapshot
    Commits.dropRef(t, "keepme")
    val (m3, _) = Commits.expireSnapshots(t, System.currentTimeMillis() + 1000)
    assert(m3.snapshot(s1).isEmpty)
  }

  test("SQL: VERSION AS OF ref name, $refs table, ref procedures") {
    val wh = Files.createTempDirectory("graft-refs-wh").toString
    spark.conf.set("spark.sql.catalog.rf", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rf.db")
    spark.sql("CREATE TABLE rf.db.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rf.db.t VALUES (1, 'one')")
    spark.sql("CALL rf.system.create_tag('db.t', 'v1')")
    spark.sql("INSERT INTO rf.db.t VALUES (2, 'two')")
    val br = spark.sql("CALL rf.system.create_branch('db.t', 'dev')").collect()
    assert(br.head.getString(0) == "dev")
    // branch write via the library against the warehouse path
    val gt = GraftTable.load(spark, s"$wh/db/t")
    GraftWrite.appendToBranch(gt, "dev", Seq((9L, "dev-only")).toDF("id", "v"))
    assert(spark.sql("SELECT * FROM rf.db.t").count() == 2)
    assert(spark.sql("SELECT * FROM rf.db.t VERSION AS OF 'v1'").count() == 1)
    assert(spark.sql("SELECT * FROM rf.db.t VERSION AS OF 'dev'").count() == 3)
    assert(spark.sql("SELECT * FROM rf.db.t VERSION AS OF 'main'").count() == 2)
    val refs = spark.sql("SELECT name, type, snapshot_id FROM rf.db.`t$refs` ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(refs == Seq(("dev", "BRANCH"), ("main", "BRANCH"), ("v1", "TAG")))
    // publish dev via fast_forward(to = ref name), then read main
    val ff = spark.sql("CALL rf.system.fast_forward('db.t', 'main', 'dev')").collect()
    assert(ff.head.getString(0) == "main")
    assert(spark.sql("SELECT * FROM rf.db.t").count() == 3)
    spark.sql("CALL rf.system.drop_ref('db.t', 'dev')")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM rf.db.t VERSION AS OF 'dev'").collect())
    assert(e.getMessage.contains("dev"))
  }

  test("branch-WAP with DML: staged data is fixed on the branch, then published") {
    // the classic write-audit-publish flow, now with a row-level fix ON
    // the staging branch: stage an append, audit flags bad rows, a branch
    // CoW rewrite removes them, fast-forward publishes — main jumps from
    // its untouched head straight to the audited state
    val loc = freshLoc("refswapdml")
    val t = GraftTable.create(spark, loc, rows(1).schema)
    GraftWrite.append(t, rows(10, 0)) // main: ids 0-9
    val mainHead = t.metadata.currentSnapshotId.get
    Commits.createBranch(t, "audit")
    GraftWrite.appendToBranch(t, "audit", rows(10, 1).coalesce(1)) // staged
    // audit: id 1005 is bad — rewrite the staged file on the BRANCH
    val t1 = GraftTable.load(spark, loc)
    val branchFiles = t1.newScan().useRef("audit").planFiles()
      .tasks.map(_.file.path).toSet
    val stagedOnly = branchFiles -- t1.newScan().useSnapshot(mainHead)
      .planFiles().tasks.map(_.file.path).toSet
    val fixed = GraftWrite.writeFiles(t1, t1.newScan().useRef("audit").toDF()
      .filter(col("id") >= 1000L && col("id") =!= 1005L))
    Commits.rewriteFiles(t1, stagedOnly, fixed,
      baseSnapshotId = t1.metadata.refSnapshotId("audit"),
      branch = Some("audit"))
    // main is still pre-stage; the publish fast-forwards it to the
    // audited branch head (main's head is branch ancestry, so it's legal)
    val t2 = GraftTable.load(spark, loc)
    assert(t2.metadata.currentSnapshotId.contains(mainHead))
    Commits.fastForward(t2, "main", t2.metadata.refSnapshotId("audit").get)
    val ids = GraftTable.load(spark, loc).toDF()
      .select("id").as[Long].collect().toSet
    assert(ids === ((0L until 10L) ++
      (1000L until 1010L).filterNot(_ == 1005L)).toSet)
  }

  test("two rewrites of the same branch file: one wins, the loser fails loudly") {
    // both stage a CoW rewrite of the SAME branch file; the winner swaps
    // it, the loser must hit the missing-required-files validation — a
    // silent skip would re-add the loser's carried-over rows (duplicates)
    val loc = freshLoc("refsconflict")
    val t = GraftTable.create(spark, loc, rows(1).schema,
      properties = Map("commit.retry.num-retries" -> "50"))
    GraftWrite.append(t, rows(10, 0).coalesce(1))
    Commits.createBranch(t, "w")
    val base = t.metadata.refSnapshotId("w").get
    val files = t.newScan().useRef("w").planFiles().tasks.map(_.file.path).toSet
    val stagedA = GraftWrite.writeFiles(t,
      t.newScan().useRef("w").toDF().filter(col("id") =!= 3L))
    val stagedB = GraftWrite.writeFiles(t,
      t.newScan().useRef("w").toDF().filter(col("id") =!= 7L))
    Commits.rewriteFiles(t, files, stagedA,
      baseSnapshotId = Some(base), branch = Some("w"))
    val e = intercept[ValidationException](
      Commits.rewriteFiles(GraftTable.load(spark, loc), files, stagedB,
        baseSnapshotId = Some(base), branch = Some("w")))
    assert(e.getMessage.contains("missing required files"))
    // the branch holds exactly the winner's state
    assert(GraftTable.load(spark, loc).newScan().useRef("w").toDF()
      .select("id").as[Long].collect().toSet === (0L until 10L).toSet - 3L)
  }

  test("branch commits race main commits: both lines converge to the serial state") {
    // 2 main appenders, 2 branch appenders, and a branch CoW rewrite all
    // race under the optimistic CAS: every commit must land (the retry
    // re-reads head/ref inside the transaction), main must see ONLY its
    // own appends, the branch ONLY its own — any cross-line bleed or a
    // lost commit breaks the row sets.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val loc = freshLoc("refsrace")
    val t0 = GraftTable.create(spark, loc, rows(1).schema,
      properties = Map("commit.retry.num-retries" -> "100"))
    GraftWrite.append(t0, rows(100, 0).coalesce(1)) // base: ids 0-99
    Commits.createBranch(t0, "work")
    val baseFiles = t0.newScan().useRef("work").planFiles()
      .tasks.map(_.file.path).toSet
    val branchBase = t0.metadata.refSnapshotId("work").get
    // the rewrite's replacement is staged BEFORE the race (CoW shape)
    val staged = GraftWrite.writeFiles(t0,
      t0.newScan().useRef("work").toDF().filter(col("id") >= 50L))
    val pool = Executors.newFixedThreadPool(5)
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    def task(body: => Unit): Runnable = () => {
      gate.await()
      try body catch { case e: Throwable => errs.add(e) }
    }
    pool.submit(task(GraftWrite.append(GraftTable.load(spark, loc), rows(10, 1))))
    pool.submit(task(GraftWrite.append(GraftTable.load(spark, loc), rows(10, 2))))
    pool.submit(task(GraftWrite.appendToBranch(GraftTable.load(spark, loc),
      "work", rows(10, 3))))
    pool.submit(task(GraftWrite.appendToBranch(GraftTable.load(spark, loc),
      "work", rows(10, 4))))
    pool.submit(task(Commits.rewriteFiles(GraftTable.load(spark, loc),
      baseFiles, staged, baseSnapshotId = Some(branchBase),
      branch = Some("work"))))
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"commit failed: ${errs.peek()}")
    val t = GraftTable.load(spark, loc)
    val mainIds = t.toDF().select("id").as[Long].collect().toSet
    val branchIds = t.newScan().useRef("work").toDF()
      .select("id").as[Long].collect().toSet
    assert(mainIds ===
      ((0L until 100L) ++ (1000L until 1010L) ++ (2000L until 2010L)).toSet)
    assert(branchIds ===
      ((50L until 100L) ++ (3000L until 3010L) ++ (4000L until 4010L)).toSet)
  }
}
