package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"TIME $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()
    val grams = docs.select(col("doc_id"),
        explode(TextOps.wordNgrams(TextOps.tokens(col("text")), 3)).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("g"))
    time("warm-grams")(grams.count())
    time("grams")(grams.count())
    val docLists = grams.groupBy("g").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    time("docLists")(docLists.count())
    val pairs = docLists.select(explode(flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + lit(2), size(col("ds"))), y =>
        struct(x.as("a"), y.as("b")))))).as("p"))
    time("pairs")(pairs.count())
    val inter = pairs.select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    time("inter")(inter.count())
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val full = inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"), (col("inter") / (col("sza") + col("szb") - col("inter"))).as("j"))
      .filter(col("j") >= 0.5)
    time("full")(full.count())
    time("full2")(full.count())
    spark.stop()
  }
}
