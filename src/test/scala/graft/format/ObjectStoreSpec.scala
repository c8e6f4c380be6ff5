package graft.format

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Conditional-PUT object-store commit path (ObjectStoreFileIO over
  * mem://): FileIO semantics, the version-file CAS, stale/out-of-order
  * hint recovery, and a concurrent-commit stress run of the full commit
  * protocol with zero lost updates. The fail-fast for rename-based object
  * store schemes (s3a via HadoopFileIO) stays — FileIOSpec covers it. */
class ObjectStoreSpec extends AnyFunSuite {

  private def freshLoc(name: String): String = {
    val loc = s"mem://bucket/$name-${java.util.UUID.randomUUID()}"
    loc
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("forPath routes mem:// to the object-store impl") {
    assert(FileIO.forPath("mem://b/t").isInstanceOf[ObjectStoreFileIO])
  }

  test("object-store io semantics: put/get/list/shallow/exclusive") {
    val io = FileIO.forPath("mem://x")
    val dir = freshLoc("sem")
    io.writeString(s"$dir/a/one.json", "{\"k\":1}")
    io.writeString(s"$dir/a/b/two.json", "{\"k\":2}")
    assert(io.readString(s"$dir/a/one.json") === "{\"k\":1}")
    assert(io.exists(s"$dir/a/one.json"))
    assert(io.exists(s"$dir/a"), "prefix with objects under it exists")
    assert(!io.exists(s"$dir/nope"))
    intercept[java.io.FileNotFoundException](io.readString(s"$dir/nope"))

    assert(io.list(dir).size === 2)
    assert(io.list(s"$dir/a", ".json").size === 2)
    val (dirs, files) = io.listShallow(s"$dir/a")
    assert(dirs === Seq(s"$dir/a/b") && files.map(_.path) === Seq(s"$dir/a/one.json"))

    // PUT is last-writer-wins; conditional PUT is first-writer-wins
    io.writeString(s"$dir/a/one.json", "{\"k\":9}")
    assert(io.readString(s"$dir/a/one.json") === "{\"k\":9}")
    assert(io.writeExclusive(s"$dir/v1", "first"))
    assert(!io.writeExclusive(s"$dir/v1", "second"))
    assert(io.readString(s"$dir/v1") === "first")

    io.deleteRecursive(s"$dir/a")
    assert(io.list(dir).map(_.path) === Seq(s"$dir/v1"))
  }

  test("conditional PUT under contention: 8 writers, one winner") {
    val io = FileIO.forPath("mem://x")
    val target = s"${freshLoc("cas")}/v3.metadata.json"
    val pool = Executors.newFixedThreadPool(8)
    val wins = new AtomicInteger
    val gate = new CountDownLatch(1)
    (0 until 8).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          gate.await()
          if (io.writeExclusive(target, s"writer-$i")) wins.incrementAndGet()
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    pool.awaitTermination(30, TimeUnit.SECONDS)
    assert(wins.get() === 1)
  }

  test("a stale or out-of-order version hint cannot hide commits") {
    val spark = graft.SparkSpecBase.spark
    val loc = freshLoc("hint")
    val t = GraftTable.create(spark, loc, schema)
    val ops = t.ops
    val m1 = ops.current()
    ops.commit(1, m1)
    ops.commit(2, m1)
    assert(ops.currentVersion() === 3)
    // simulate the losing committer's hint landing last (object stores
    // have no write ordering across keys)
    ops.io.writeString(s"${ops.location}/metadata/version-hint.text", "1")
    assert(ops.currentVersion() === 3, "must probe forward past the hint")
    assert(ops.current() != null)
  }

  test("full commit protocol over the object store: no lost updates") {
    val spark = graft.SparkSpecBase.spark
    val loc = freshLoc("stress")
    val table = GraftTable.create(spark, loc, schema,
      properties = Map("commit.retry.num-retries" -> "100"))
    assert(table.ops.io.isInstanceOf[ObjectStoreFileIO])

    val threads = 8
    val commitsPer = 6
    val pool = Executors.newFixedThreadPool(threads)
    val gate = new CountDownLatch(1)
    val failures = new AtomicInteger
    (0 until threads).foreach { th =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          gate.await()
          // each runner gets its own GraftTable handle (own metadata cache)
          val t = GraftTable.load(spark, loc)
          (0 until commitsPer).foreach { i =>
            try Commits.fastAppend(t, Seq(DataFile(
              path = s"$loc/data/t$th-f$i.parquet",
              recordCount = 1L, fileSizeInBytes = 10L)))
            catch { case _: Throwable => failures.incrementAndGet() }
          }
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.get() === 0, s"${failures.get()} commits failed")

    val m = table.metadata
    assert(m.snapshots.size === threads * commitsPer, "every commit is a snapshot")
    // every file from every thread is live exactly once
    val live = table.newScan().planFiles().tasks.map(_.file.path)
    assert(live.size === threads * commitsPer)
    assert(live.distinct.size === live.size)
    // the ancestry is one unbroken chain through all commits
    assert(m.ancestors().size === threads * commitsPer)
  }

  // ---- fault injection around the ObjectStoreClient seam ----

  /** Programmable-fault wrapper: faults fire once, then clear. */
  private final class FaultyStore(inner: ObjectStoreClient)
    extends ObjectStoreClient {
    /** Perform the conditional PUT, then throw (the RESPONSE is lost). */
    @volatile var losePutIfAbsentResponse = false
    /** Do NOT perform the conditional PUT, throw (request never arrived). */
    @volatile var dropPutIfAbsent = false
    /** Do NOT perform the next plain PUT to a key containing this
      * substring, throw instead. */
    @volatile var dropPutMatching: String = null
    /** Runs just before the next conditional PUT (race interposition). */
    @volatile var beforePutIfAbsent: () => Unit = null
    /** Fail the next N GETs of keys containing this substring. */
    @volatile var failGetMatching: String = null
    @volatile var failGetCount = 0

    override def get(key: String): Option[Array[Byte]] = {
      val fg = failGetMatching
      if (fg != null && key.contains(fg) && failGetCount > 0) {
        failGetCount -= 1
        if (failGetCount == 0) failGetMatching = null
        throw new java.io.IOException(s"injected: GET $key failed")
      }
      inner.get(key)
    }
    override def put(key: String, bytes: Array[Byte]): Unit = {
      val drop = dropPutMatching
      if (drop != null && key.contains(drop)) {
        dropPutMatching = null
        throw new java.io.IOException(s"injected: PUT $key dropped")
      }
      inner.put(key, bytes)
    }
    override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
      val hook = beforePutIfAbsent
      if (hook != null) { beforePutIfAbsent = null; hook() }
      if (dropPutIfAbsent) {
        dropPutIfAbsent = false
        throw new java.io.IOException(s"injected: conditional PUT $key dropped")
      }
      val r = inner.putIfAbsent(key, bytes)
      if (losePutIfAbsentResponse) {
        losePutIfAbsentResponse = false
        throw new java.io.IOException(s"injected: response for $key lost")
      }
      r
    }
    override def delete(key: String): Unit = inner.delete(key)
    override def list(prefix: String): Seq[(String, Long, Long)] =
      inner.list(prefix)
  }

  test("CAS lands but the response is lost: commit resolves, no double-apply") {
    val spark = graft.SparkSpecBase.spark
    val loc = freshLoc("unk1")
    GraftTable.create(spark, loc, schema)
    val faulty = new FaultyStore(InMemoryObjectStore)
    val fops = new TableOps(loc, new ObjectStoreFileIO(faulty))
    var applies = 0
    faulty.losePutIfAbsentResponse = true
    val updated = fops.commitTransaction { m =>
      applies += 1
      m.copy(properties = m.properties + ("fault" -> "survived"))
    }
    assert(applies === 1, "a landed CAS must not re-apply the transform")
    assert(updated.properties.get("fault").contains("survived"))
    assert(new TableOps(loc).currentVersion() === 2)
    assert(new TableOps(loc).current().properties("fault") === "survived")
  }

  test("CAS loses the race AND the response is lost: plain retry, no lost update") {
    val spark = graft.SparkSpecBase.spark
    val loc = freshLoc("unk2")
    GraftTable.create(spark, loc, schema)
    val faulty = new FaultyStore(InMemoryObjectStore)
    val fops = new TableOps(loc, new ObjectStoreFileIO(faulty))
    // just before our CAS fires, a rival commits version 2; our CAS then
    // returns false but its response is ALSO lost — read-back sees the
    // rival's bytes → ordinary CommitFailed → optimistic retry re-applies
    // on the new base and wins version 3
    faulty.beforePutIfAbsent = () => {
      val rival = new TableOps(loc)
      rival.commitTransaction(m =>
        m.copy(properties = m.properties + ("rival" -> "first")))
    }
    faulty.losePutIfAbsentResponse = true
    var applies = 0
    fops.commitTransaction { m =>
      applies += 1
      m.copy(properties = m.properties + ("ours" -> "second"))
    }
    assert(applies === 2, "lost race must retry on the fresh base")
    val m = new TableOps(loc).current()
    assert(m.properties("rival") === "first" && m.properties("ours") === "second")
    assert(new TableOps(loc).currentVersion() === 3)
  }

  test("CAS lands, response lost, AND the read-back GET flakes: retry resolves the durable commit") {
    val spark = graft.SparkSpecBase.spark
    val loc = freshLoc("unk4")
    GraftTable.create(spark, loc, schema)
    val faulty = new FaultyStore(InMemoryObjectStore)
    val fops = new TableOps(loc, new ObjectStoreFileIO(faulty))
    faulty.losePutIfAbsentResponse = true
    // the first read-back GET of v2 fails transiently; the bounded retry
    // must find the landed bytes instead of reporting CommitStateUnknown.
    // Armed just before the CAS so the version-probe GETs don't consume it.
    faulty.beforePutIfAbsent = () => {
      faulty.failGetMatching = "v2.metadata.json"
      faulty.failGetCount = 1
    }
    var applies = 0
    val updated = fops.commitTransaction { m =>
      applies += 1
      m.copy(properties = m.properties + ("flaky" -> "resolved"))
    }
    assert(applies === 1, "a landed CAS must not re-apply the transform")
    assert(updated.properties.get("flaky").contains("resolved"))
    assert(new TableOps(loc).currentVersion() === 2)
    assert(new TableOps(loc).current().properties("flaky") === "resolved")
  }

  test("CAS response lost with nothing at the key: CommitStateUnknown, no blind retry") {
    val spark = graft.SparkSpecBase.spark
    val loc = freshLoc("unk3")
    GraftTable.create(spark, loc, schema)
    val faulty = new FaultyStore(InMemoryObjectStore)
    val fops = new TableOps(loc, new ObjectStoreFileIO(faulty))
    faulty.dropPutIfAbsent = true
    var applies = 0
    intercept[CommitStateUnknownException] {
      fops.commitTransaction { m =>
        applies += 1
        m.copy(properties = m.properties + ("never" -> "lands"))
      }
    }
    assert(applies === 1, "unknown outcome must not be retried")
    assert(new TableOps(loc).currentVersion() === 1)
    assert(!new TableOps(loc).current().properties.contains("never"))
  }

  test("a lost hint write cannot fail a durable commit") {
    val spark = graft.SparkSpecBase.spark
    val loc = freshLoc("unk4")
    GraftTable.create(spark, loc, schema)
    val faulty = new FaultyStore(InMemoryObjectStore)
    val fops = new TableOps(loc, new ObjectStoreFileIO(faulty))
    faulty.dropPutMatching = "version-hint"
    fops.commitTransaction(m =>
      m.copy(properties = m.properties + ("hint" -> "lost")))
    // a FRESH reader (clean io, no caches) must converge on the committed
    // version by probing forward past the stale hint
    val reader = new TableOps(loc)
    assert(reader.currentVersion() === 2)
    assert(reader.current().properties("hint") === "lost")
  }
}
