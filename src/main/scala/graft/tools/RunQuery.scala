package graft.tools
import org.apache.spark.sql.SparkSession

/** Run one gate query locally: `runMain graft.tools.RunQuery <name> [sfDir]`.
  * Prints the result (first 50 rows) — the fast iteration loop for a new
  * gate query before the driver's full DuckDB compare. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.show(50, truncate = false)
    println(s"ROWS: ${df.count()}")
    graft.SparkEntry.oracleSql.get(name).foreach(sql => println(s"ORACLE SQL:\n$sql"))
    spark.stop()
  }
}
