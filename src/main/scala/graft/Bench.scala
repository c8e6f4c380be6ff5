package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json). */
object Bench {
  def main(args: Array[String]): Unit = {
    // The driver machine-parses stdout as a single JSON line; anything the
    // JVM or Spark prints to System.out during startup would break that.
    // Divert stdout to stderr for the whole run and keep the real stream
    // for the one JSON line at the end.
    val realOut = System.out
    System.setOut(new java.io.PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.err), true))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.connector.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Queries.headline.filter(SparkEntry.queries.contains)
    // full warmup pass (JVM/codegen/file-footer caches AND one-time graft
    // table builds for the format queries), then measure steady-state
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => }
    }
    def timeSec(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }
    // median-of-5 measured passes per query, with the min/max spread
    // recorded alongside: same-tree variance at sf0.1 is ±15% run to run,
    // larger than most code-level deltas — the median plus the published
    // spread is what makes a cross-round comparison able to tell a real
    // regression from host noise
    val Runs = 5
    val samples: Seq[Seq[(String, Double)]] = (0 until Runs).map { _ =>
      names.map(n => n -> timeSec(SparkEntry.queries(n)(spark, sfDir).count()))
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val perQuery: Seq[(String, Seq[Double])] = names.zipWithIndex.map {
      case (n, i) => n -> samples.map(_(i)._2)
    }
    val results: Seq[(String, Double)] = perQuery.map {
      case (n, xs) => n -> median(xs)
    }
    // pinned HOST-calibration workload, independent of the library and the
    // data: 64M rows hashed and shuffled into 1k groups. Its median lets
    // cross-round comparisons normalize away machine drift (a round's
    // meaningful signal is total/calibration, not raw seconds).
    val calRuns = (0 until Runs).map { _ =>
      timeSec {
        spark.range(0L, 64000000L, 1L, cpus.toInt)
          .selectExpr("xxhash64(id) % 1024 AS b", "id")
          .groupBy("b").count().count()
      }
    }
    val calibration = median(calRuns)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // the stable cross-round signal: same 11 queries since round 1
    // (per-query noise is ±20%; new queries only widen `total`)
    val lfl11 = results.filter(r => Queries.likeForLike11.contains(r._1))
      .map(_._2).sum
    spark.stop()
    val calJson = calRuns.mkString("[", ",", "]")
    val spreadJson = perQuery.map { case (n, xs) =>
      "\"" + n + "\":[" + xs.min + "," + xs.max + "]"
    }.mkString("{", ",", "}")
    realOut.println(s"""{"metric":"total","value":$total,"unit":"sec","lfl11":$lfl11,"runs":$Runs,"calibration":$calibration,"calibration_runs":$calJson,"queries":$qs,"queries_spread":$spreadJson,"sf":"$sfDir"}""")
    realOut.flush()
  }
}
