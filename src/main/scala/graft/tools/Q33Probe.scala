package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost localization + tail A/B for the q33 family (r21 item 6).
  *
  * Stages (noop sinks, interleaved per pass): map-only gram hashing, the
  * first (group-by-gram) shuffle, and the full query.
  *
  * Tail A/B: the pair-count shuffle grouped by (a, b, sza, szb) — the
  * pre-r21 shape — vs (a, b, szsum): same grams input, both built inline so
  * the comparison lives in ONE session. `runMain graft.tools.Q33Probe [runs]`.
  */
object Q33Probe {
  def main(args: Array[String]): Unit = {
    val runs = if (args.length > 0) args(0).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
    val grams = docs
      .select(col("doc_id"), graft.ops.TextOps.gramHashes(3)(col("text")).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("sz"), explode(col("gs")).as("g"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val grouped = grams.groupBy("g")
      .agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
    val docLists = grouped.filter(size(col("ds")) >= 2)
    // Dedup.pairCombos is private — same tight two-loop UDF, copied
    val combos = udf((ds: Seq[org.apache.spark.sql.Row]) => {
      val k = ds.length
      val out = new Array[(Long, Int, Long, Int)](k * (k - 1) / 2)
      var idx = 0
      var i = 0
      while (i < k) {
        val a = ds(i).getLong(0)
        val sa = ds(i).getInt(1)
        var j = i + 1
        while (j < k) {
          val b = ds(j).getLong(0)
          out(idx) =
            if (a < b) (a, sa, b, ds(j).getInt(1))
            else (b, ds(j).getInt(1), a, sa)
          idx += 1
          j += 1
        }
        i += 1
      }
      out.toSeq
    })
    // pre-r21 tail: 4 grouping columns, sizes carried separately
    val oldTail = docLists.select(explode(combos(col("ds"))).as("p"))
      .select(col("p._1").as("a"), col("p._2").as("sza"),
        col("p._3").as("b"), col("p._4").as("szb"))
      .groupBy("a", "b", "sza", "szb").agg(count(lit(1)).as("inter"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("sza") + col("szb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    // r21 tail: 3 grouping columns, szsum packed before the exchange
    val newTail = docLists.select(explode(combos(col("ds"))).as("p"))
      .select(col("p._1").as("a"), col("p._3").as("b"),
        (col("p._2").cast("long") + col("p._4")).as("szs"))
      .groupBy("a", "b", "szs").agg(count(lit(1)).as("inter"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("szs") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    val full = graft.ops.Dedup.jaccardPairsFast(
      spark.read.parquet(s"$sfDir/documents.parquet"), n = 3,
      threshold = 0.5, maxDf = 0)
    // result agreement guard
    val nOld = oldTail.count(); val nNew = newTail.count()
    System.err.println(s"pairs old=$nOld new=$nNew")
    // warm
    noop(grams); noop(oldTail); noop(newTail); full.count()
    for (i <- 1 to runs) {
      val a = t(noop(grams))
      val o = t(noop(oldTail))
      val n = t(noop(newTail))
      val c = t(full.count())
      System.err.println(f"pass$i gramsOnly=$a%6.3f oldTail=$o%6.3f newTail=$n%6.3f full=$c%6.3f")
    }
    spark.stop()
  }
}
