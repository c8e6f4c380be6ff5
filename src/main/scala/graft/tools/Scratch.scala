package graft.tools
import org.apache.spark.sql.SparkSession

/** Driver-smoke main (kept intentionally in `main`; the repo's verify
  * recipe runs it): a FRESH session with hostile confs must still serve
  * entry() rows and the events queries. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // simulate the DRIVER's own session: no graft-specific confs at all
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "America/Los_Angeles") // hostile TZ
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ENTRY ROWS: " + graft.SparkEntry.entry(spark).count())
    // events query must self-set the nanos conf AND pin UTC rendering
    val q17 = graft.SparkEntry.queries("q17_events_hourly")(spark, "/root/testdata/sf0.001")
    q17.limit(2).collect().foreach(r => println("Q17 SAMPLE: " + r))
    println("EVENTS ROWS: " + q17.count())
    // probe: bogus dir should throw a clear error, not hang
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, "/root/nosuchdir").count()
    catch { case e: Throwable => println("BOGUS DIR ERROR: " + e.getClass.getSimpleName) }
    spark.stop()
  }
}
