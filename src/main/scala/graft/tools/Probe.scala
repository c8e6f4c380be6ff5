package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val grams = docs.select(col("doc_id"),
      explode(TextOps.wordNgrams(TextOps.tokens(col("text")), 3)).as("gram"))
    val df = grams.groupBy("gram").agg(countDistinct("doc_id").as("df"))
    println("GRAM GROUPS: " + df.count())
    df.selectExpr("sum(df*(df-1)/2) as pairs", "max(df) as maxdf",
      "sum(case when df>1 then 1 else 0 end) as shared").show()
    df.orderBy(col("df").desc).show(10)
    println("DOCS: " + docs.count())
    println("AVG GRAMS/DOC: " + grams.count() / docs.count())
  }
}
