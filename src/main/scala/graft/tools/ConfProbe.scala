package graft.tools
import org.apache.spark.sql.SparkSession

/** A/B a runtime SQL conf over one query in the SAME session:
  * `runMain graft.tools.ConfProbe <query> <confKey> <valueA> <valueB> [runs]`
  * with SPARK_GRAFT_SF_DIR. Alternates A/B per pass so host drift hits
  * both arms equally. */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val Array(q, key, va, vb) = args.take(4)
    val runs = if (args.length > 4) args(4).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.connector.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(q)(spark, sfDir).count() // warm
    for (i <- 1 to runs; (label, v) <- Seq("A" -> va, "B" -> vb)) {
      spark.conf.set(key, v)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      System.err.println(
        f"$q $label($key=$v) pass$i ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
    }
    spark.stop()
  }
}
