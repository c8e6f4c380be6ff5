package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Find partition-less WindowExec nodes (the "Moving all data to a single
  * partition" scale hazard) across every declared query's physical plan.
  * `runMain graft.tools.WindowAudit [sfDir]`. */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.connector.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, dir).queryExecution.sparkPlan
        val bad = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty)
          System.err.println(s"GLOBAL-WINDOW $name: ${bad.size} node(s): " +
            bad.map(_.windowExpression.mkString(",").take(120)).mkString(" | "))
      } catch {
        case e: Throwable =>
          System.err.println(s"SKIP $name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    System.err.println("audit done")
    spark.stop()
  }
}
