package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan audit for the incremental dedup family: prints the
  * formatted physical plans the round-16 operators produce at sf0.01 —
  * run manually while iterating (`runMain graft.tools.PlanProbe [sfDir]`),
  * not part of the driver contract. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q113_incremental_jaccard", "q114_embedding_neardup_incr",
        "q115_exact_dedup_incr")) {
      println(s"==== $q ====")
      graft.SparkEntry.queries(q)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
