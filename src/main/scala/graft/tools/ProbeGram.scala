package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Measures the gram-hash stage alone vs the full jaccard pipeline. */
object ProbeGram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(s"RESULT $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    val g = docs.select(col("doc_id"), TextOps.gramHashes(3)(col("text")).as("gs"))
    g.count() // warm
    time("gram_only")(g.select(sum(size(col("gs")))).collect().head.getLong(0))
    time("gram_explode")(g.select(explode(col("gs"))).count())
    time("full_exact")(graft.ops.Dedup.jaccardPairsFast(docs, 3, 0.5, maxDf = 0).count())
    time("full_guarded")(graft.ops.Dedup.jaccardPairsFast(docs, 3, 0.5, maxDf = 2000).count())
    time("full_exact2")(graft.ops.Dedup.jaccardPairsFast(docs, 3, 0.5, maxDf = 0).count())
    time("full_guarded2")(graft.ops.Dedup.jaccardPairsFast(docs, 3, 0.5, maxDf = 2000).count())
    spark.stop()
  }
}
