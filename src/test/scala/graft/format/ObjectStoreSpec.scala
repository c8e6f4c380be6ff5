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
}
