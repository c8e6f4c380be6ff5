package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("=== PLAN q103 ===")
    println(graft.ops.Dedup.duplicateSpans(docs, 20).queryExecution.executedPlan.toString.take(4000))
    println("=== PLAN q102 ===")
    println(graft.ops.Sampling.stratified(docs, col("lang"), col("doc_id"), 40).queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
