package graft.tools

import graft.format.{GraftTable, GraftWrite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B for the scrub-routed ORC read path (r21 item 1):
  *
  *   arm G — graft library scan of an ORC table with a float-projecting
  *           query (routes through the zero-sign scrub; pre-r21 this was
  *           the row path, post-r21 the scrubbed columnar scan)
  *   arm V — Spark's own vectorized `spark.read.orc` over the SAME files,
  *           same aggregate (the parity target; NOT zero-sign safe)
  *   arm D — DSv2 catalog scan of the same table (GraftSparkTable routing)
  *
  * `runMain graft.tools.OrcScanProbe [runs]` with SPARK_GRAFT_SF_DIR.
  * Arms alternate pass-by-pass so host drift hits all arms equally.
  */
object OrcScanProbe {
  def main(args: Array[String]): Unit = {
    val runs = if (args.length > 0) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.connector.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val loc = java.nio.file.Files.createTempDirectory("orcprobe").toString + "/t"
    // 8x key-shifted replicas so the float-projecting scan is long enough
    // to separate read-path costs from plan/serve overhead
    val reps = sys.env.getOrElse("ORC_PROBE_REPS", "64").toInt
    val c0 = spark.read.parquet(s"$sfDir/customer.parquet")
    val c = (0 until reps).map(i =>
        c0.withColumn("c_custkey", col("c_custkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    val t = GraftTable.recreate(spark, loc, c.schema,
      properties = Map("write.format.default" -> "orc"))
    GraftWrite.append(t, c.filter(col("c_custkey") % 2 === 0).coalesce(2))
    GraftWrite.append(t, c.filter(col("c_custkey") % 2 === 1).coalesce(2))

    spark.conf.set("spark.sql.catalog.op", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.op.warehouse",
      java.nio.file.Files.createTempDirectory("orcprobe-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS op.db")
    spark.sql("DROP TABLE IF EXISTS op.db.c")
    c.withColumn("c_acctbal", col("c_acctbal").cast("double"))
      .writeTo("op.db.c")
      .tableProperty("write.format.default", "orc").create()

    val orcFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(loc))
        .filter(f => f.getName.endsWith(".orc") && !f.getName.startsWith("."))
        .map(_.getPath)
    }
    System.err.println(s"orc files: ${orcFiles.size}")

    def aggOf(df: org.apache.spark.sql.DataFrame): Unit = {
      df.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    def armG(): Unit = aggOf(
      GraftTable.load(spark, loc).newScan()
        .select("c_nationkey", "c_acctbal").toDF())
    def armV(): Unit = aggOf(
      spark.read.orc(orcFiles: _*).select("c_nationkey", "c_acctbal"))
    def armD(): Unit = {
      val t0 = System.nanoTime()
      val df = spark.sql("SELECT c_nationkey, c_acctbal FROM op.db.c")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("s"))
      df.queryExecution.executedPlan // force planning
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      System.err.println(f"    [armD plan=${(t1 - t0) / 1e9}%5.3f]")
    }
    // same catalog-written files through the LIBRARY scan — isolates
    // GraftSparkTable's read machinery from the files themselves
    val whTablePath = spark.conf.get("spark.sql.catalog.op.warehouse") + "/db/c"
    def armD2(): Unit = aggOf(
      GraftTable.load(spark, whTablePath).newScan().toDF()
        .select("c_nationkey", "c_acctbal"))
    // arm R — the PRE-r21 row path, reproduced verbatim (OrcIO row iterator
    // → Catalyst-to-Scala converter → external Row → re-encode), so the
    // before/after lives in ONE session
    def armR(): Unit = {
      val sconf = new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf())
      val clean = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_nationkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_acctbal",
          org.apache.spark.sql.types.DoubleType)))
      val rdd = spark.sparkContext
        .parallelize(orcFiles, math.max(1, orcFiles.size))
        .flatMap { p =>
          val it = graft.format.OrcIO.open(p, clean, sconf.value)
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => it.close()))
          val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToScalaConverter(clean)
          new Iterator[org.apache.spark.sql.Row] {
            private var cur = it.read()
            override def hasNext: Boolean = cur != null
            override def next(): org.apache.spark.sql.Row = {
              val data = conv(cur).asInstanceOf[org.apache.spark.sql.Row]
              cur = it.read()
              data
            }
          }
        }
      aggOf(spark.createDataFrame(rdd, clean))
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    if (sys.env.contains("ORC_PROBE_EXPLAIN")) {
      System.err.println(spark.sql(
        "SELECT c_nationkey, c_acctbal FROM op.db.c").queryExecution.executedPlan.toString.take(3000))
      val g = GraftTable.load(spark, loc).newScan().toDF()
        .select("c_nationkey", "c_acctbal")
      System.err.println(g.queryExecution.executedPlan.toString.take(3000))
    }
    // warm all arms
    armG(); armV(); armD(); armR()
    // row-count agreement guard (G vs V must see identical data)
    val nG = GraftTable.load(spark, loc).newScan().toDF().count()
    val nV = spark.read.orc(orcFiles: _*).count()
    val nD = spark.sql("SELECT * FROM op.db.c").count()
    System.err.println(s"rows G=$nG V=$nV D=$nD")
    val (gs, vs, ds, rs) = (Array.ofDim[Double](runs), Array.ofDim[Double](runs),
      Array.ofDim[Double](runs), Array.ofDim[Double](runs))
    for (i <- 0 until runs) {
      gs(i) = time(armG()); vs(i) = time(armV()); ds(i) = time(armD())
      rs(i) = time(armR())
      val d2 = time(armD2())
      System.err.println(f"pass$i graft=${gs(i)}%6.3f vec=${vs(i)}%6.3f dsv2=${ds(i)}%6.3f rowpath=${rs(i)}%6.3f lib-on-cat=$d2%6.3f")
    }
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    System.err.println(f"MEDIANS graft=${med(gs)}%6.3f vec=${med(vs)}%6.3f dsv2=${med(ds)}%6.3f rowpath=${med(rs)}%6.3f ratioG/V=${med(gs) / med(vs)}%5.2f ratioR/V=${med(rs) / med(vs)}%5.2f")
    spark.stop()
  }
}
