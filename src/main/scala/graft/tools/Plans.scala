package graft.tools

import org.apache.spark.sql.SparkSession
import graft.format._

/** Plan inspection: verify pushdown/pruning/broadcast choices hold. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    println("=== q06 selective filter (pushdown check) ===")
    graft.SparkEntry.queries("q06_selective_filter")(spark, dir).explain("formatted")

    println("=== q03 join (broadcast check) ===")
    graft.SparkEntry.queries("q03_revenue_by_nation")(spark, dir).explain("formatted")

    println("=== format scan: partition pruning effectiveness ===")
    // run the gate query first so the cached table exists at the CURRENT
    // builder version, then inspect its plans
    graft.SparkEntry.queries("q63_partition_prune")(spark, dir).count()
    val t = GraftTable.load(spark,
      s"${sys.props("java.io.tmpdir")}/graft-tables/v2/${Integer.toHexString(dir.hashCode & 0x7fffffff)}/lineitem_bymonth")
    val all = t.newScan().planFiles()
    val pruned = t.newScan().filter(Exprs.and(Exprs.gtEq("l_shipdate", "1995-01-01"),
      Exprs.lt("l_shipdate", "1995-07-01"))).planFiles()
    println(s"FILES all=${all.filesScanned} pruned=${pruned.filesScanned} " +
      s"manifests=${pruned.manifestsScanned}/${pruned.manifestsTotal}")
    t.newScan().filter(Exprs.gtEq("l_shipdate", "1995-01-01")).toDF().explain("formatted")

    println("=== q81 imported partitioned table (partition-constant serving) ===")
    graft.SparkEntry.queries("q81_partitioned_import")(spark, dir).explain("formatted")

    println("=== q80 nested evolution read ===")
    graft.SparkEntry.queries("q80_nested_evolution")(spark, dir).explain("formatted")
    spark.stop()
  }
}
