package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Concurrent RowDelta × spec-evolution stress (the reference's conflict
  * surface in MergingSnapshotProducer / BaseRowDelta validation,
  * core/src/main/java/org/apache/iceberg/MergingSnapshotProducer.java):
  * N writers commit equality-delete RowDeltas on DISJOINT key sets while
  * another thread evolves the partition spec under them. Every commit must
  * land (optimistic retry), staged delete files must stay valid across the
  * spec flips they raced with (their specId references a registered,
  * possibly non-default spec), and the final table must equal the SERIAL
  * application of all deletes — disjoint-key eq deletes commute and spec
  * changes move no rows, so any interleaving must converge to the same
  * row set. */
class ConcurrentRowDeltaSpec extends SparkSpec {
  import spark.implicits._

  test("interleaved rowDelta + updateSpec: all commits land, rows match serial application") {
    val d = Files.createTempDirectory("graft-racedelta")
    Files.delete(d)
    val loc = d.toString
    val df = (0L until 1000L).map(i => (i, i % 2, i % 4, s"v$i"))
      .toDF("id", "grp", "grp2", "v")
    val t0 = GraftTable.create(spark, loc, df.schema, _.identity("grp"),
      properties = Map("commit.retry.num-retries" -> "100"))
    GraftWrite.append(t0, df.repartition(4))

    // 4 writer threads × 3 commits, each deleting one DISJOINT 40-id chunk:
    // chunk c covers [c*40, (c+1)*40). Threads 0-1 stage (grp, id) pairs —
    // partition-scoped under identity(grp), global after the flip to grp2,
    // so the staging decision races the spec change — threads 2-3 stage
    // bare ids (always global).
    val writers = 4
    val chunksPer = 3
    val pool = Executors.newFixedThreadPool(writers + 1)
    val gate = new CountDownLatch(1)
    val failures = new AtomicInteger
    val firstErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    (0 until writers).foreach { th =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          gate.await()
          val t = GraftTable.load(spark, loc)
          (0 until chunksPer).foreach { c =>
            val chunk = ((th * chunksPer + c) * 40).toLong
            val ids = (chunk until chunk + 40L)
            try {
              val keys =
                if (th < 2) ids.map(i => (i % 2, i)).toDF("grp", "id")
                else ids.toDF("id")
              Deletes.deleteByEquality(t, keys)
            } catch {
              case e: Throwable =>
                failures.incrementAndGet()
                firstErr.compareAndSet(null, e)
            }
          }
        }
      })
    }
    // the spec thread flips the default spec twice mid-flight
    pool.submit(new Runnable {
      override def run(): Unit = {
        gate.await()
        val t = GraftTable.load(spark, loc)
        try {
          Commits.updateSpec(t)(_.identity("grp2"))
          Thread.sleep(50)
          Commits.updateSpec(GraftTable.load(spark, loc))(_.identity("grp"))
        } catch {
          case e: Throwable =>
            failures.incrementAndGet()
            firstErr.compareAndSet(null, e)
        }
      }
    })
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(failures.get() === 0,
      s"${failures.get()} commits failed; first: ${firstErr.get()}")

    val t = GraftTable.load(spark, loc)
    val m = t.metadata
    // every rowDelta is a snapshot on one unbroken chain (append + 12)
    assert(m.snapshots.size === 1 + writers * chunksPer)
    assert(m.ancestors().size === 1 + writers * chunksPer)
    // both spec updates landed; old specs stay registered for old files
    assert(m.specs.size === 3, s"expected 3 registered specs, got ${m.specs.keys}")
    // serial-application check: any interleaving must converge to
    // all-chunks-deleted
    val expected = (480L until 1000L)
    assert(t.toDF().select("id").as[Long].collect().sorted.toSeq === expected)
    // and a partition-filtered read through the evolved-spec history stays
    // exact (cross-spec delete attachment under the raced flips)
    assert(t.newScan().filter(Exprs.equal("grp", 1L)).toDF()
      .select("id").as[Long].collect().sorted.toSeq ===
      expected.filter(_ % 2 == 1))
  }
}
