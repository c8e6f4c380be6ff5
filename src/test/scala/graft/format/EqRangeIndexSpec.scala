package graft.format

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** [[EqRangeIndex]] unit coverage: the interval pre-filter must stay a
  * conservative SUPERSET of the exact multi-key predicate
  * ([[Deletes.eqBoundsCanHit]]) while INTERSECTING per-key admissions —
  * a low-cardinality key (few tenants) must not degrade the pre-filter
  * to a near-full scan when another key (user ids) can rule files out,
  * and a composite where NO single key is selective must still narrow
  * through the joint ranges. */
class EqRangeIndexSpec extends AnyFunSuite {

  private val schema = FieldIds.assignFresh(StructType(Seq(
    StructField("tenant_id", LongType),
    StructField("user_id", LongType),
    StructField("v", StringType))))
  private val tenantId = FieldIds.nameToId(schema)("tenant_id")
  private val userId = FieldIds.nameToId(schema)("user_id")

  private def eqDel(i: Int, tenantLo: Long, tenantHi: Long,
      userLo: Long, userHi: Long): DataFile =
    DataFile(path = s"deletes/eq-$i.parquet",
      content = FileContent.EqualityDeletes,
      recordCount = 10L, fileSizeInBytes = 1L << 10,
      nullValueCounts = Map(tenantId -> 0L, userId -> 0L),
      lowerBounds = Map(tenantId -> tenantLo, userId -> userLo),
      upperBounds = Map(tenantId -> tenantHi, userId -> userHi),
      equalityIds = Seq(tenantId, userId))

  private def dataFile(tenantLo: Long, tenantHi: Long,
      userLo: Long, userHi: Long): DataFile =
    DataFile(path = s"data/f-$userLo.parquet",
      recordCount = 100L, fileSizeInBytes = 1L << 20,
      nullValueCounts = Map(tenantId -> 0L, userId -> 0L),
      lowerBounds = Map(tenantId -> tenantLo, userId -> userLo),
      upperBounds = Map(tenantId -> tenantHi, userId -> userHi))

  test("composite key with low-cardinality first key: the selective key is chosen") {
    // 200 delete files, ALL spanning the same single tenant — first-key
    // indexing would return every file for any tenant-1 data file; user_id
    // ranges are tight and disjoint, so the selective-key index narrows to
    // the one file whose user range overlaps
    val dels = (0 until 200).map(i =>
      eqDel(i, 1L, 1L, i * 10L, i * 10L + 9L))
    val idx = EqRangeIndex.build(dels, schema)
    val data = dataFile(1L, 1L, 1003L, 1005L)
    val cands = idx.candidatesFor(data)
    assert(cands === Seq("deletes/eq-100.parquet"),
      s"selective-key index must narrow to the overlapping file, got ${cands.size}")
    // a data file overlapping no user range gets nothing
    assert(idx.candidatesFor(dataFile(1L, 1L, 5000L, 5100L)).isEmpty)
  }

  test("composite key where NO single key is selective: intersection still narrows") {
    // every file's tenant range and user range each overlap ~half the
    // population for the probe point, but jointly only ONE file admits
    // it: best-single-key indexing returns ~50 candidates either way
    // (blowing the downstream exact-recheck cap), the intersection
    // returns exactly the joint match
    val dels = (0 until 100).map(i =>
      eqDel(i, i.toLong, i + 60L, 1000L - 10 * i, 1600L - 10 * i))
    val idx = EqRangeIndex.build(dels, schema)
    val cands = idx.candidatesFor(dataFile(50L, 50L, 500L, 500L))
    // tenant=50 admits i in [0,50] (51 files); user=500 admits i in
    // [50,99] (50 files); jointly only i=50
    assert(cands === Seq("deletes/eq-50.parquet"),
      s"intersection must narrow to the joint match, got ${cands.size}")
    // sanity: each single key really is non-selective here
    assert(dels.count(d => d.lowerBounds(tenantId).asInstanceOf[Long] <= 50L &&
      d.upperBounds(tenantId).asInstanceOf[Long] >= 50L) === 51)
    assert(dels.count(d => d.lowerBounds(userId).asInstanceOf[Long] <= 500L &&
      d.upperBounds(userId).asInstanceOf[Long] >= 500L) === 50)
  }

  test("index candidates are a superset of the exact multi-key predicate") {
    // mixed shapes: overlapping user ranges, multi-tenant files, one file
    // without user bounds (must always be returned), one that may hold
    // null users
    val dels = (0 until 50).map(i =>
      eqDel(i, (i % 5).toLong, (i % 5).toLong, i * 7L, i * 7L + 20L)) ++
      Seq(
        DataFile(path = "deletes/unbounded.parquet",
          content = FileContent.EqualityDeletes,
          recordCount = 1L, fileSizeInBytes = 1L,
          equalityIds = Seq(tenantId, userId)),
        eqDel(998, 0L, 4L, 0L, 400L).copy(path = "deletes/wide.parquet"),
        eqDel(999, 2L, 2L, 90L, 95L).copy(path = "deletes/nullish.parquet",
          nullValueCounts = Map(tenantId -> 0L)))
    val idx = EqRangeIndex.build(dels, schema)
    val datas = (0 until 40).map(i =>
      dataFile((i % 3).toLong, (i % 3).toLong, i * 11L, i * 11L + 15L)) :+
      dataFile(0L, 4L, 0L, 500L)
    datas.foreach { df =>
      val cands = idx.candidatesFor(df).toSet
      dels.foreach { del =>
        if (Deletes.eqBoundsCanHit(del, df, schema))
          assert(cands.contains(del.path),
            s"index dropped ${del.path} which eqBoundsCanHit admits for ${df.path}")
      }
    }
  }

  test("files whose only bounded key differs are indexed under their own keys") {
    // one population bounded only on tenant, another only on user — each
    // must land in its own group and narrow on its own ranges
    val tenantOnly = (0 until 10).map { i =>
      DataFile(path = s"deletes/t-$i.parquet",
        content = FileContent.EqualityDeletes,
        recordCount = 1L, fileSizeInBytes = 1L,
        nullValueCounts = Map(tenantId -> 0L, userId -> 0L),
        lowerBounds = Map(tenantId -> i.toLong),
        upperBounds = Map(tenantId -> i.toLong),
        equalityIds = Seq(tenantId, userId))
    }
    val userOnly = (0 until 10).map { i =>
      DataFile(path = s"deletes/u-$i.parquet",
        content = FileContent.EqualityDeletes,
        recordCount = 1L, fileSizeInBytes = 1L,
        nullValueCounts = Map(tenantId -> 0L, userId -> 0L),
        lowerBounds = Map(userId -> (i * 100L)),
        upperBounds = Map(userId -> (i * 100L + 50L)),
        equalityIds = Seq(tenantId, userId))
    }
    val idx = EqRangeIndex.build(tenantOnly ++ userOnly, schema)
    val cands = idx.candidatesFor(dataFile(3L, 3L, 120L, 130L)).toSet
    assert(cands === Set("deletes/t-3.parquet", "deletes/u-1.parquet"))
  }

  test("property: the index never drops a delete file whose rows can match (2000 seeded cases)") {
    // row-level truth, the same strategy as PruningPropertySpec: generate
    // ACTUAL delete rows and data rows, derive honest per-file stats
    // (sometimes dropping them, as truncated metrics modes do), and assert
    // that whenever some delete row null-safe-equals some data row on ALL
    // equality columns, the index returns that delete file as a candidate.
    // This is the property that makes the index safe to use as a
    // pre-filter: a miss here is a resurrected deleted row at read time.
    val rnd = new scala.util.Random(20260814L)
    def genRow(): (Option[Long], Option[Long]) = (
      if (rnd.nextInt(8) == 0) None else Some(rnd.nextLong(4)),
      if (rnd.nextInt(8) == 0) None else Some(rnd.nextLong(60)))
    def stats(rows: Seq[(Option[Long], Option[Long])], dropBounds: Boolean,
        dropNullCounts: Boolean): (Map[Int, Any], Map[Int, Any], Map[Int, Long]) = {
      val (ts, us) = (rows.map(_._1).flatten, rows.map(_._2).flatten)
      val lower = (if (ts.nonEmpty && !dropBounds) Map(tenantId -> (ts.min: Any)) else Map.empty[Int, Any]) ++
        (if (us.nonEmpty && !dropBounds) Map(userId -> (us.min: Any)) else Map.empty[Int, Any])
      val upper = (if (ts.nonEmpty && !dropBounds) Map(tenantId -> (ts.max: Any)) else Map.empty[Int, Any]) ++
        (if (us.nonEmpty && !dropBounds) Map(userId -> (us.max: Any)) else Map.empty[Int, Any])
      val nulls = if (dropNullCounts) Map.empty[Int, Long] else Map(
        tenantId -> rows.count(_._1.isEmpty).toLong,
        userId -> rows.count(_._2.isEmpty).toLong)
      (lower, upper, nulls)
    }
    (0 until 2000).foreach { iter =>
      val delFiles = (0 until (2 + rnd.nextInt(28))).map { i =>
        val rows = Seq.fill(1 + rnd.nextInt(4))(genRow())
        val (lo, hi, nulls) = stats(rows, rnd.nextInt(6) == 0, rnd.nextInt(6) == 0)
        (DataFile(path = s"d-$i", content = FileContent.EqualityDeletes,
          recordCount = rows.size.toLong, fileSizeInBytes = 1L,
          nullValueCounts = nulls, lowerBounds = lo, upperBounds = hi,
          equalityIds = Seq(tenantId, userId)), rows)
      }
      val idx = EqRangeIndex.build(delFiles.map(_._1), schema)
      (0 until (1 + rnd.nextInt(7))).foreach { _ =>
        val dataRows = Seq.fill(1 + rnd.nextInt(6))(genRow())
        val (lo, hi, nulls) = stats(dataRows, rnd.nextInt(6) == 0, rnd.nextInt(6) == 0)
        val data = DataFile(path = "data", recordCount = dataRows.size.toLong,
          fileSizeInBytes = 1L, nullValueCounts = nulls,
          lowerBounds = lo, upperBounds = hi)
        val cands = idx.candidatesFor(data).toSet
        delFiles.foreach { case (df, delRows) =>
          val canMatch = delRows.exists(d => dataRows.exists(r =>
            d._1 == r._1 && d._2 == r._2)) // null-safe equality on BOTH keys
          if (canMatch)
            assert(cands.contains(df.path),
              s"iter $iter: index dropped ${df.path} with matching rows " +
              s"(del=$delRows data=$dataRows)")
        }
      }
    }
  }

  test("build survives narrow pre-promotion runtime bounds (Integer under LongType)") {
    // descriptors staged before an int→long promotion still carry
    // java.lang.Integer bounds in memory — BOTH the cluster-scoring sweep
    // and the group build must widen before ordering, or planning dies
    // with a ClassCastException inside Ordering.Long
    def narrowDel(i: Int, lo: Int, hi: Int): DataFile =
      DataFile(path = s"deletes/narrow-$i.parquet",
        content = FileContent.EqualityDeletes,
        recordCount = 10L, fileSizeInBytes = 1L << 10,
        nullValueCounts = Map(userId -> 0L),
        lowerBounds = Map(userId -> Int.box(lo)),
        upperBounds = Map(userId -> Int.box(hi)),
        equalityIds = Seq(userId))
    val mixed = Seq(narrowDel(0, 10, 20), narrowDel(1, 30, 40),
      eqDel(2, 1L, 1L, 25L, 35L)) // post-promotion file with Long bounds
    val idx = EqRangeIndex.build(mixed, schema)
    val hit = idx.candidatesFor(dataFile(1L, 1L, 15L, 15L))
    assert(hit.contains("deletes/narrow-0.parquet"))
    assert(!hit.contains("deletes/narrow-1.parquet"))
    val overlap = idx.candidatesFor(dataFile(1L, 1L, 32L, 33L))
    assert(overlap.toSet ==
      Set("deletes/narrow-1.parquet", "deletes/eq-2.parquet"))
  }

  test("composite-key index stays bounded at 20k delete files") {
    // GDPR-accumulation scale: 20k two-key delete files; the build is one
    // sorted array + segment tree per key, a query is O(log n + hits) per
    // key plus the intersection count. Generous wall-clock bounds guard
    // against an accidental O(n) regression per query, not host speed.
    val n = 20000
    val dels = (0 until n).map(i =>
      eqDel(i, i.toLong, i + 5L, 1000000L - 10L * i, 1000040L - 10L * i))
    val t0 = System.nanoTime()
    val idx = EqRangeIndex.build(dels, schema)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    assert(buildSecs < 10.0, f"build took $buildSecs%.1f s")
    val t1 = System.nanoTime()
    var hits = 0L
    (0 until 2000).foreach { i =>
      val tenant = (i * 9).toLong
      hits += idx.candidatesFor(
        dataFile(tenant, tenant, 1000000L - 10L * tenant,
          1000000L - 10L * tenant)).size
    }
    val querySecs = (System.nanoTime() - t1) / 1e9
    assert(querySecs < 10.0, f"2000 queries took $querySecs%.1f s")
    assert(hits > 0, "probe points must hit some candidates")
    // spot-exactness: the intersection stays a superset at this scale
    val data = dataFile(500L, 500L, 995000L, 995000L)
    val cands = idx.candidatesFor(data).toSet
    dels.foreach { d =>
      if (Deletes.eqBoundsCanHit(d, data, schema))
        assert(cands.contains(d.path))
    }
  }

  test("a data file without bounds on a group's key keeps that whole group") {
    val dels = (0 until 20).map(i => eqDel(i, 1L, 1L, i * 10L, i * 10L + 5L))
    val idx = EqRangeIndex.build(dels, schema)
    val blind = DataFile(path = "data/noStats.parquet",
      recordCount = 100L, fileSizeInBytes = 1L << 20)
    assert(idx.candidatesFor(blind).toSet === dels.map(_.path).toSet,
      "no data bounds → every delete file stays a candidate")
  }
}
