package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: run one query, print the FINAL adaptive plan (after
  * execution) so runtime exchange/stage reuse is visible.
  * `runMain graft.tools.Scratch <query>` with SPARK_GRAFT_SF_DIR. */
object FinalPlanProbe {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.connector.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    df.count()
    System.err.println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
