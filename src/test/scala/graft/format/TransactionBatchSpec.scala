package graft.format

import graft.SparkSpec
import java.nio.file.Files

/** Commit batching posture for high-commit-rate deployments (a 100 TB
  * nightly lands thousands of appends): the seams that keep the driver's
  * commit path off the metadata-write critical loop.
  *
  *   1. one `fastAppend` over the batch — ONE manifest write, ONE snapshot,
  *      ONE version CAS, regardless of how many writers produced the files;
  *   2. independently-built operations composed through ONE
  *      `commitTransaction` call — every staged snapshot lands atomically
  *      under a single version CAS (one probe + one conditional PUT + one
  *      hint write against the store instead of N round-trips, and no
  *      N-writer retry storm).
  *
  * Both are pins over existing seams (`TableOps.commitTransaction` takes an
  * arbitrary metadata transform; `Commits.fastAppendOn` is the composable
  * form of `fastAppend`), not new machinery. */
class TransactionBatchSpec extends SparkSpec {
  import spark.implicits._

  private def freshLoc(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name")
    Files.delete(d)
    d.toString
  }

  private def rows(n: Int, off: Int = 0) =
    (0 until n).map(i => (i.toLong + off * 1000L, s"d-$i")).toDF("id", "data")

  test("batched fastAppend: N writers' files, one manifest, one commit") {
    val loc = freshLoc("batchappend")
    val t = GraftTable.create(spark, loc, rows(1).schema)
    val v0 = t.ops.currentVersion()
    val batch = (0 until 4).flatMap(i => GraftWrite.writeFiles(t, rows(3, i)))
    Commits.fastAppend(t, batch)
    assert(t.ops.currentVersion() === v0 + 1, "one version swap for the batch")
    assert(t.snapshots.size === 1)
    assert(t.toDF().count() === 12)
    // the batch's entries share manifests (size-packed), not one per writer
    val mfs = t.readManifestList(t.metadata, t.currentSnapshot.get)
    assert(mfs.size < 4, s"expected packed manifests, got ${mfs.size}")
  }

  test("composed transforms: N operations, one version CAS, all-or-nothing") {
    val loc = freshLoc("batchtxn")
    val t = GraftTable.create(spark, loc, rows(1).schema)
    val files1 = GraftWrite.writeFiles(t, rows(2, 0))
    val files2 = GraftWrite.writeFiles(t, rows(3, 1))
    val v0 = t.ops.currentVersion()
    t.ops.commitTransaction { m =>
      val m1 = Commits.fastAppendOn(t, m, files1)
      Commits.fastAppendOn(t, m1, files2)
    }
    assert(t.ops.currentVersion() === v0 + 1,
      "both operations must land under a single version swap")
    assert(t.snapshots.size === 2, "each staged operation keeps its snapshot")
    assert(t.toDF().count() === 5)
  }
}
