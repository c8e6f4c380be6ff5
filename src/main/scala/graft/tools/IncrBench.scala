package graft.tools
import org.apache.spark.sql.SparkSession

/** One-shot wall-clock probe for the incremental dedup family at a given
  * sf dir (not part of the driver bench — used to record scale evidence
  * in COVERAGE). */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      System.err.println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    for (q <- Seq("q34_minhash_lsh_pairs", "q125_incremental_minhash",
        "q35_simhash", "q126_incremental_simhash", "q127_signature_store",
        "q113_incremental_jaccard", "q128_gram_store")) {
      try {
        graft.SparkEntry.queries(q)(spark, sfDir).count() // warm
        time(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
      } catch { case e: Throwable => System.err.println(s"$q FAILED: $e") }
    }
    spark.stop()
  }
}
