package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan}

/** Find ScalaUDFs that execution evaluates more than once per input row:
  * a UDF inside a FilterExec condition (the project above re-evaluates it
  * — the q34/q125 double-evaluation class fixed in r21), or the same UDF
  * call appearing twice within one projection list (codegen CSE handles
  * the latter; flagged for review only).
  * `runMain graft.tools.UdfEvalAudit [sfDir]`. */
object UdfEvalAudit {
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
    def udfsIn(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.collect { case _: ScalaUDF => 1 }.size
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan: SparkPlan = fn(spark, dir).queryExecution.sparkPlan
        plan.foreach {
          case f: FilterExec if udfsIn(f.condition) > 0 =>
            System.err.println(s"UDF-IN-FILTER $name: ${f.condition.sql.take(140)}")
          case p: ProjectExec =>
            // same UDF function object applied twice in one project list
            val calls = p.projectList.flatMap(_.collect {
              case u: ScalaUDF => (u.function, u.children.map(_.semanticHash())) })
            val dups = calls.groupBy(identity).filter(_._2.size > 1)
            if (dups.nonEmpty)
              System.err.println(s"UDF-DUP-IN-PROJECT $name: ${dups.size} dup group(s)")
          case _ =>
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"SKIP $name: ${e.getClass.getSimpleName}")
      }
    }
    System.err.println("udf audit done")
    spark.stop()
  }
}
