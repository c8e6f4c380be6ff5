package graft.tools
import org.apache.spark.sql.SparkSession

/** Time one gate query at a given sf dir: `runMain graft.tools.OneQuery
  * <query> [runs]` with SPARK_GRAFT_SF_DIR. Warm + N measured passes. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(q)(spark, sfDir).count() // warm
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      System.err.println(f"$q run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
    }
    spark.stop()
  }
}
