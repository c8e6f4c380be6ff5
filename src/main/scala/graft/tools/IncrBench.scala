package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot wall-clock probe for the incremental dedup family at a given
  * sf dir (not part of the driver bench — used to record scale evidence
  * in COVERAGE). Pass `longdocs` as the first arg to run the
  * long-document store-vs-recompute fixture instead of the query sweep. */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"$name%-34s $sec%8.2f s  rows=$n")
      sec
    }
    if (args.headOption.contains("longdocs")) longDocs(spark, sfDir, time)
    else for (q <- Seq("q34_minhash_lsh_pairs", "q125_incremental_minhash",
        "q35_simhash", "q126_incremental_simhash", "q127_signature_store",
        "q113_incremental_jaccard", "q128_gram_store")) {
      try {
        graft.SparkEntry.queries(q)(spark, sfDir).count() // warm
        time(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
      } catch { case e: Throwable => System.err.println(s"$q FAILED: $e") }
    }
    spark.stop()
  }

  /** Long-document fixture (VERDICT r17 item 2): every 20 consecutive sf
    * documents concatenate into one ~20x-length doc (real text, ~20x
    * distinct grams — no artificial repetition), so tokenize+hash cost
    * dominates the store read the way it does on real corpora of long
    * documents. Measures the SAME increment three ways: full recompute of
    * corpus grams per run vs the persisted bucket[16](g) gram store read
    * back through the catalog with the v2 bucketing confs on
    * (storage-partitioned semi-join — the store side never shuffles).
    * The one-time store build is timed and printed too: amortization is
    * a claim about the Nth run, not a free lunch on the first. */
  private def longDocs(spark: SparkSession, sfDir: String,
      time: String => (=> Long) => Double): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-ldwh").toString
    spark.conf.set("spark.sql.catalog.graftld", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftld.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftld.db")
    val ldPath = s"$wh/longdocs.parquet"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy((col("doc_id") / 20).cast("long").as("doc_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("doc_id").as("i"), col("text")))),
        x => x.getField("text")), " ").as("text"))
      .write.mode("overwrite").parquet(ldPath)
    val ld = spark.read.parquet(ldPath)
    val nDocs = ld.count()
    val avgLen = ld.agg(avg(length(col("text")))).head().getDouble(0)
    System.err.println(f"longdocs: $nDocs docs, avg ${avgLen / 1024}%.1f KiB")
    def corpus = ld.filter(col("doc_id") % 10 =!= 0)
    def fresh = ld.filter(col("doc_id") % 10 === 0)

    // steady-state recompute: the corpus is re-tokenized every run
    def recompute() = graft.ops.Dedup.incrementalJaccardPairs(
      corpus, fresh, n = 3, threshold = 0.5, maxDf = 0).count()
    recompute() // warm
    val tRecompute = time("incremental (recompute grams)")(recompute())

    // one-time store build: tokenize the corpus ONCE into bucket[16](g)
    val loc = s"$wh/db/long_grams"
    val tBuild = time("store build (once per corpus)") {
      val grams = graft.ops.Dedup.gramStore(corpus, n = 3)
      val tt = graft.format.GraftTable.recreate(spark, loc, grams.schema,
        specBuild = _.bucket("g", 16))
      graft.format.GraftWrite.append(tt, grams)
      graft.format.GraftTable.load(spark, loc).toDF().count()
    }

    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    def store() = graft.ops.Dedup.incrementalJaccardPairsFromStore(
      spark.table("graftld.db.long_grams"), fresh,
      n = 3, threshold = 0.5, maxDf = 0).count()
    store() // warm
    val tStore = time("incremental (bucketed store)")(store())
    System.err.println(
      f"store/recompute = ${tStore / tRecompute}%.2f  " +
        f"(build amortizes after ${tBuild / (tRecompute - tStore)}%.1f runs)")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
  }
}
