package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** FileIO seam (reference api/.../io/FileIO.java): local hard-link CAS and
  * the Hadoop-FS impl that opens the path to hdfs/object stores. The
  * Hadoop impl is exercised through `file://` URIs — same code path the
  * other schemes take, minus the network. */
class FileIOSpec extends AnyFunSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-io").toString

  test("forPath picks the impl by scheme") {
    assert(FileIO.forPath("/plain/path") eq LocalFileIO)
    // file: URIs must NOT hit LocalFileIO — java.nio would read the scheme
    // as a relative path component; Hadoop parses them correctly
    assert(FileIO.forPath("file:/x/y").isInstanceOf[HadoopFileIO])
    assert(FileIO.forPath("hdfs://nn/x").isInstanceOf[HadoopFileIO])
    assert(FileIO.forPath("s3a://bucket/x").isInstanceOf[HadoopFileIO])
  }

  test("hadoop io: write/read/list/delete roundtrip over file://") {
    val io = new HadoopFileIO
    val dir = "file://" + tmpDir()
    io.writeString(s"$dir/a/b/one.json", "{\"k\":1}")
    io.writeString(s"$dir/a/two.txt", "hello")
    assert(io.readString(s"$dir/a/b/one.json") === "{\"k\":1}")
    assert(io.exists(s"$dir/a/two.txt"))
    val listed = io.list(dir).map(_.path).sorted
    assert(listed.size === 2)
    assert(listed.forall(_.startsWith("file:")))
    assert(io.list(dir, ".json").size === 1)
    // overwrite via writeString is last-writer-wins
    io.writeString(s"$dir/a/two.txt", "world")
    assert(io.readString(s"$dir/a/two.txt") === "world")
    io.deleteIfExists(s"$dir/a/two.txt")
    assert(!io.exists(s"$dir/a/two.txt"))
    io.deleteRecursive(s"$dir/a")
    assert(io.list(dir).isEmpty)
  }

  test("listShallow splits one level into (dirs, files) on both impls") {
    val local = tmpDir()
    LocalFileIO.writeString(s"$local/top.txt", "t")
    LocalFileIO.writeString(s"$local/p1/a.parquet", "a")
    LocalFileIO.writeString(s"$local/p2/deep/b.parquet", "b")
    val (dirs, files) = LocalFileIO.listShallow(local)
    assert(dirs.map(d => d.substring(d.lastIndexOf('/') + 1)).sorted == Seq("p1", "p2"))
    assert(files.map(_.path).map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("top.txt"))
    assert(LocalFileIO.listShallow(s"$local/nope") == ((Nil, Nil)))
    val io = new HadoopFileIO
    val hdir = "file://" + tmpDir()
    io.writeString(s"$hdir/top.txt", "t")
    io.writeString(s"$hdir/p1/a.parquet", "a")
    val (hdirs, hfiles) = io.listShallow(hdir)
    assert(hdirs.size == 1 && hdirs.head.endsWith("/p1"))
    assert(hfiles.size == 1 && hfiles.head.path.endsWith("/top.txt"))
    assert(io.listShallow(s"$hdir/nope") == ((Nil, Nil)))
  }

  test("hadoop io: writeExclusive is first-writer-wins") {
    val io = new HadoopFileIO
    val dir = "file://" + tmpDir()
    val target = s"$dir/v1.metadata.json"
    assert(io.writeExclusive(target, "first"))
    assert(!io.writeExclusive(target, "second"),
      "second exclusive write must lose")
    assert(io.readString(target) === "first")
  }

  test("hadoop io: file:// CAS is the hard link, under contention") {
    // LocalFileSystem's no-overwrite rename pre-checks existence
    // non-atomically — writeExclusive must route file: URIs to link(2)
    val io = new HadoopFileIO
    val target = "file://" + tmpDir() + "/v9.metadata.json"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val wins = new java.util.concurrent.atomic.AtomicInteger
    val gate = new java.util.concurrent.CountDownLatch(1)
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
    pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
    assert(wins.get() === 1)
    assert(io.readString(target).startsWith("writer-"))
  }

  test("hadoop io: object-store schemes fail fast on the commit CAS") {
    val io = new HadoopFileIO
    for (scheme <- Seq("s3a", "gs", "abfs")) {
      val e = intercept[UnsupportedOperationException](
        io.writeExclusive(s"$scheme://bucket/t/metadata/v1.metadata.json", "x"))
      assert(e.getMessage.contains("not atomic"), scheme)
    }
  }

  test("hadoop io carries the session's hadoop conf, not a fresh default") {
    // session-runtime keys reach newHadoopConf verbatim (spark.hadoop.*
    // prefix-stripping applies to SparkContext-level conf at startup); a
    // fresh default Configuration would see neither spelling
    val spark = graft.SparkSpecBase.spark
    spark.conf.set("spark.hadoop.graft.test.marker", "from-session")
    try {
      val io = new HadoopFileIO
      val f = classOf[HadoopFileIO].getDeclaredField("sconf")
      f.setAccessible(true)
      val conf = f.get(io)
        .asInstanceOf[org.apache.spark.util.SerializableConfiguration].value
      assert(conf.get("spark.hadoop.graft.test.marker") === "from-session")
    } finally spark.conf.unset("spark.hadoop.graft.test.marker")
  }

  test("hadoop io survives serialization (executor shipping)") {
    val io = new HadoopFileIO
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(io); oos.close(); bos.toByteArray
    }
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes)).readObject().asInstanceOf[HadoopFileIO]
    val dir = "file://" + tmpDir()
    back.writeString(s"$dir/x.txt", "roundtrip")
    assert(back.readString(s"$dir/x.txt") === "roundtrip")
  }

  test("full table lifecycle at a file:// location (HadoopFileIO end-to-end)") {
    val spark = graft.SparkSpecBase.spark
    import spark.implicits._
    val loc = "file://" + tmpDir() + "/t"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df.schema)
    assert(t.ops.io.isInstanceOf[HadoopFileIO])
    GraftWrite.append(t, df)
    GraftWrite.append(t, Seq((4L, "d")).toDF("id", "v"))
    assert(t.toDF().count() === 4)
    assert(t.newScan().filter(Exprs.gtEq("id", 3L)).toDF().count() === 2)
    assert(t.snapshots.size === 2)
    // maintenance over the seam too
    Actions.forTable(t).rewriteDataFiles(minInputFiles = 2)
    assert(t.toDF().select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L, 4L))
  }

  test("local io: hard-link CAS under contention (8 writers, one winner)") {
    val dir = tmpDir()
    val target = s"$dir/v7.metadata.json"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val wins = new java.util.concurrent.atomic.AtomicInteger
    val gate = new java.util.concurrent.CountDownLatch(1)
    (0 until 8).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          gate.await()
          if (LocalFileIO.writeExclusive(target, s"writer-$i")) wins.incrementAndGet()
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
    assert(wins.get() === 1)
    assert(LocalFileIO.readString(target).startsWith("writer-"))
  }
}
