package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** A/B harness for the jaccardPairs hot spot at sf0.1. */
object BenchJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"RESULT $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }

    // warmup both paths once at small scale
    val small = docs.limit(500).cache(); small.count()
    Dedup.jaccardPairs(small, 3, 0.5).count()
    Dedup.jaccardPairsFast(small, 3, 0.5).count()

    time("old")(Dedup.jaccardPairs(docs, 3, 0.5).count())
    time("fast_nofilter")(Dedup.jaccardPairsFast(docs, 3, 0.5, maxDf = 0).count())
    time("fast_prefilter")(Dedup.jaccardPairsFast(docs, 3, 0.5).count())
    time("fast_prefilter2")(Dedup.jaccardPairsFast(docs, 3, 0.5).count())
    // equality check — both sides exact (maxDf = 0), matching the q33 gate;
    // the prefiltered variant is timed above but is approximate by design
    val a = Dedup.jaccardPairs(docs, 3, 0.5).select("a", "b", "jaccard")
    val b = Dedup.jaccardPairsFast(docs, 3, 0.5, maxDf = 0).select("a", "b", "jaccard")
    println("DIFF " + a.exceptAll(b).count() + " / " + b.exceptAll(a).count())
    spark.stop()
  }
}
