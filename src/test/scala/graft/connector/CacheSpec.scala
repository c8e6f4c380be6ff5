package graft.connector

import graft.SparkSpec
import graft.format.ParquetIO
import java.nio.file.Files

/** Unit coverage for the executor-side delete caches: WeightedLruCache
  * eviction order / weight accounting / never-evict-current, PosDeleteCache
  * loading + path canonicalization across URI spellings. */
class CacheSpec extends SparkSpec {

  test("WeightedLruCache evicts least-recently-used first") {
    val cache = new WeightedLruCache[java.lang.Integer](10L)(_.toLong)
    cache.get("a")(4) // weight 4
    cache.get("b")(4) // weight 8
    cache.get("a")(99) // touch a — b is now LRU
    cache.get("c")(4) // weight 12 > 10 → evict b (LRU), not a
    assert(cache.contains("a"))
    assert(!cache.contains("b"))
    assert(cache.contains("c"))
    assert(cache.currentWeight == 8)
  }

  test("WeightedLruCache weight accounting tracks inserts and evictions") {
    val cache = new WeightedLruCache[java.lang.Integer](100L)(_.toLong)
    cache.get("a")(30)
    cache.get("b")(30)
    assert(cache.currentWeight == 60)
    assert(cache.entryCount == 2)
    cache.get("c")(50) // 110 > 100 → evict a
    assert(cache.currentWeight == 80)
    assert(cache.entryCount == 2)
    assert(!cache.contains("a") && cache.contains("b") && cache.contains("c"))
  }

  test("WeightedLruCache never evicts the entry being served") {
    val cache = new WeightedLruCache[java.lang.Integer](10L)(_.toLong)
    cache.get("huge")(50) // alone over budget — must stay (it's being served)
    assert(cache.contains("huge"))
    assert(cache.currentWeight == 50)
    cache.get("small")(1) // over budget → huge (LRU, not current) goes
    assert(!cache.contains("huge"))
    assert(cache.contains("small"))
    assert(cache.currentWeight == 1)
  }

  test("WeightedLruCache loads each key once") {
    val cache = new WeightedLruCache[java.lang.Integer](100L)(_.toLong)
    var loads = 0
    def load: java.lang.Integer = { loads += 1; 1 }
    cache.get("k")(load)
    cache.get("k")(load)
    cache.get("k")(load)
    assert(loads == 1)
  }

  test("DeleteKeyCache holds its 512 MB budget under a GDPR-scale key-set storm") {
    // the global-shipping worst case, measured: demand ~880 MB of key sets
    // (100 sets × 100k single-column keys ≈ 8.8 MB weighed each) through
    // the REAL executor cache — it must evict, never exceed its budget,
    // and keep the entry being served resident
    val cache = DeleteKeyCache.cache
    val budget = 512L * 1024 * 1024
    val t0 = System.nanoTime()
    (0 until 100).foreach { i =>
      val s = cache.get(s"cachespec-eq-$i") {
        (0 until 100000).map(k => Vector[Any](i * 1000000L + k)).toSet
      }
      assert(s.size == 100000)
      assert(cache.currentWeight <= budget,
        s"budget exceeded at insert $i: ${cache.currentWeight}")
      assert(cache.contains(s"cachespec-eq-$i"),
        "the set being served must stay resident")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cache.entryCount < 100, "some sets must have been evicted")
    info(f"100 × 100k-key sets: retained ${cache.entryCount} entries, " +
      f"weight ${cache.currentWeight / (1024 * 1024)} MB, $secs%.1f s")
    assert(secs < 60.0)
  }

  test("canonPath collapses file: URIs and keeps other schemes distinct") {
    assert(ParquetIO.canonPath("/data/f.parquet") == "/data/f.parquet")
    assert(ParquetIO.canonPath("file:/data/f.parquet") == "/data/f.parquet")
    assert(ParquetIO.canonPath("file:///data/f.parquet") == "/data/f.parquet")
    // authority-bearing file URI: host must NOT fold into the path
    assert(ParquetIO.canonPath("file://host/data/f.parquet") ==
      "file://host/data/f.parquet")
    assert(ParquetIO.canonPath("hdfs://nn:8020/data/f.parquet") ==
      "hdfs://nn:8020/data/f.parquet")
    assert(ParquetIO.canonPath("s3a://bucket/data/f.parquet") ==
      "s3a://bucket/data/f.parquet")
    // idempotent (partition side re-canonicalizes already-canonical values)
    for (p <- Seq("/d/f", "file:/d/f", "hdfs://nn/d/f", "s3a://b/d/f"))
      assert(ParquetIO.canonPath(ParquetIO.canonPath(p)) == ParquetIO.canonPath(p))
    // an hdfs path never matches a local path of the same spelling
    assert(ParquetIO.canonPath("hdfs://nn/data/f.parquet") !=
      ParquetIO.canonPath("file:///data/f.parquet"))
  }

  test("PosDeleteCache groups sorted positions per canonical data file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pos_cache").toString
    // delete rows spell the same file three different ways + one hdfs path
    Seq(
      ("file:///data/a.parquet", 7L),
      ("file:/data/a.parquet", 3L),
      ("/data/a.parquet", 11L),
      ("hdfs://nn/data/a.parquet", 5L))
      .toDF("file_path", "pos")
      .coalesce(1).write.parquet(s"$dir/deletes")
    val files = Files.list(java.nio.file.Paths.get(s"$dir/deletes")).iterator()
    var path: String = null
    while (files.hasNext) {
      val p = files.next().toString
      if (p.endsWith(".parquet")) path = p
    }
    assert(path != null)
    val conf = spark.sessionState.newHadoopConf()
    val m = PosDeleteCache.get(Seq(path), Nil, conf)
    // the three local spellings collapse to ONE canonical key
    assert(m(ParquetIO.canonPath("file:/data/a.parquet")).toArray.toSeq ==
      Seq(3L, 7L, 11L))
    // the hdfs path stays its own key
    assert(m("hdfs://nn/data/a.parquet").toArray.toSeq == Seq(5L))
    assert(m.size == 2)
    // cache hit: same paths key returns the same instance without reload
    assert(PosDeleteCache.get(Seq(path), Nil, conf) eq m)
  }
}
