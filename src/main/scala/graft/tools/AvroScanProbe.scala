package graft.tools

import graft.format.{GraftTable, GraftWrite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B for the library Avro read path (r21: DSv2 scan replacing
  * the RDD-of-external-Rows shape):
  *
  *   arm G  — graft library scan, projecting 2 of the table's columns
  *            (post-change: planted GraftAvroScan, InternalRow direct,
  *            pruned decode; pre-change: external-Row RDD, full decode)
  *   arm Rf — the PRE-change path reproduced verbatim: AvroIO row iterator
  *            over the FULL schema → Catalyst-to-Scala converter → external
  *            Row → re-encode (the old readAvro got no column pruning — an
  *            RDD-backed DataFrame materializes every column)
  *   arm Rp — same row path but pruned to the 2 read columns, separating
  *            the decode-width win from the InternalRow/codegen win
  *
  * Arms alternate pass-by-pass so host drift hits all arms equally.
  * `runMain graft.tools.AvroScanProbe [runs]` with SPARK_GRAFT_SF_DIR.
  */
object AvroScanProbe {
  def main(args: Array[String]): Unit = {
    val runs = if (args.length > 0) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val loc = java.nio.file.Files.createTempDirectory("avroprobe").toString + "/t"
    // key-shifted replicas so the scan is long enough to separate read-path
    // costs from plan/serve overhead
    val reps = sys.env.getOrElse("AVRO_PROBE_REPS", "32").toInt
    val c0 = spark.read.parquet(s"$sfDir/customer.parquet")
    val c = (0 until reps).map(i =>
        c0.withColumn("c_custkey", col("c_custkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    val t = GraftTable.recreate(spark, loc, c.schema,
      properties = Map("write.format.default" -> "avro"))
    GraftWrite.append(t, c.coalesce(4))

    def aggOf(df: org.apache.spark.sql.DataFrame): Unit = {
      df.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    def armG(): Unit = aggOf(
      GraftTable.load(spark, loc).newScan()
        .select("c_nationkey", "c_acctbal").toDF())

    val avroFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      // data dir only — manifests are avro too and must not leak into arm R
      walk(new java.io.File(GraftTable.load(spark, loc).locations.dataRoot))
        .filter(f => f.getName.endsWith(".avro") && !f.getName.startsWith("."))
        .map(p => (p.getPath, p.length()))
    }
    System.err.println(s"avro files: ${avroFiles.size}")

    // the pre-change readAvro, verbatim
    def rowPath(clean: org.apache.spark.sql.types.StructType)
        : org.apache.spark.sql.DataFrame = {
      val sconf = new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf())
      val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
      val splits: Seq[(String, Long, Long)] = avroFiles.flatMap { case (p, size) =>
        graft.connector.GraftAvroScan.ranges(size, maxSplit)
          .map { case (s, e) => (p, s, e) }
      }
      val rdd = spark.sparkContext
        .parallelize(splits, math.max(1, splits.size))
        .flatMap { case (p, start, end) =>
          val it = graft.format.AvroIO.open(p, clean, sconf.value, start, end)
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => it.close()))
          val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToScalaConverter(clean)
          new Iterator[org.apache.spark.sql.Row] {
            private var cur = it.read()
            override def hasNext: Boolean = cur != null
            override def next(): org.apache.spark.sql.Row = {
              val out = conv(cur).asInstanceOf[org.apache.spark.sql.Row]
              cur = it.read()
              out
            }
          }
        }
      spark.createDataFrame(rdd, clean)
    }
    val fullSchema = org.apache.spark.sql.types.StructType(
      c.schema.fields.map(f => f.copy(metadata =
        org.apache.spark.sql.types.Metadata.empty)))
    val twoCols = org.apache.spark.sql.types.StructType(
      fullSchema.fields.filter(f =>
        f.name == "c_nationkey" || f.name == "c_acctbal"))
    def armRf(): Unit = aggOf(
      rowPath(fullSchema).select("c_nationkey", "c_acctbal"))
    def armRp(): Unit = aggOf(rowPath(twoCols))

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm all arms
    armG(); armRf(); armRp()
    // row-count agreement guard
    val nG = GraftTable.load(spark, loc).newScan().toDF().count()
    val nR = rowPath(twoCols).count()
    System.err.println(s"rows G=$nG R=$nR expected=${c.count()}")
    val (gs, rfs, rps) = (Array.ofDim[Double](runs),
      Array.ofDim[Double](runs), Array.ofDim[Double](runs))
    for (i <- 0 until runs) {
      gs(i) = time(armG()); rfs(i) = time(armRf()); rps(i) = time(armRp())
      System.err.println(f"pass$i graft=${gs(i)}%6.3f rowFull=${rfs(i)}%6.3f rowPruned=${rps(i)}%6.3f")
    }
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    System.err.println(f"MEDIANS graft=${med(gs)}%6.3f rowFull=${med(rfs)}%6.3f rowPruned=${med(rps)}%6.3f ratioG/Rf=${med(gs) / med(rfs)}%5.2f ratioG/Rp=${med(gs) / med(rps)}%5.2f")
    spark.stop()
  }
}
