package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.hadoop.fs.{Path => HPath}

object DsvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = "/root/testdata/sf0.001/nation.parquet"
    val schema = spark.read.parquet(path).schema
    val index = new InMemoryFileIndex(spark, Seq(new HPath(path)),
      Map.empty[String, String], Some(schema))
    val scan = ParquetScan(spark, spark.sessionState.newHadoopConf(), index,
      schema, schema, StructType(Nil), Array.empty,
      CaseInsensitiveStringMap.empty())
    val batch = scan.toBatch
    println("PARTITIONS: " + batch.planInputPartitions().length)
    println("PROBE OK")
    spark.stop()
  }
}
