package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build a scaled copy of a testdata dir for scale-sanity benching:
  * `runMain graft.tools.MakeScaled <srcDir> <outDir> <copies>` writes
  * `copies` key-shifted replicas of every fact table (referential
  * integrity preserved inside each replica — all int64 keys shift by the
  * same per-copy offset), dimensions (region/nation) stay 1×. Document
  * text gets a per-copy suffix token and embeddings a tiny per-copy
  * delta, so dedup/similarity workloads see near-dups, not 10 exact
  * clones of every row (which would blow up pair expansion beyond what a
  * true larger scale factor contains). Deterministic — no randomness. */
object MakeScaled {
  private val Off = 10_000_000_000L

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesS) = args.take(3)
    val copies = copiesS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scaled(table: String, keyCols: Seq[String],
        tweak: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val parts = (0 until copies).map { i =>
        val shifted = keyCols.foldLeft(base)((d, k) =>
          d.withColumn(k, col(k) + lit(i * Off)))
        tweak(shifted, i)
      }
      parts.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      System.err.println(s"scaled $table x$copies")
    }
    def copy1(table: String): Unit = {
      spark.read.parquet(s"$src/$table.parquet")
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      System.err.println(s"copied $table")
    }

    copy1("region"); copy1("nation")
    scaled("customer", Seq("c_custkey"))
    scaled("supplier", Seq("s_suppkey"))
    scaled("part", Seq("p_partkey"))
    scaled("orders", Seq("o_orderkey", "o_custkey"))
    scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    scaled("events", Seq("event_id", "user_id"))
    // Documents: per-copy word-substitution CIPHER (a bijection over the
    // corpus vocabulary, shift differs per copy). A bijection preserves
    // every within-copy n-gram relationship exactly — the source's
    // near-dup cluster structure, so the dup RATE stays sf0.1-like at any
    // multiple — while copies share no words, so no cross-copy n-gram can
    // match. (The earlier suffix-token tweak left cross-copy texts
    // near-identical: every doc became a `copies`-sized cluster and the
    // pair-emitting dedup workloads blew up ~copies² beyond what a true
    // larger scale factor contains.)
    val vocab = spark.read.parquet(s"$src/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct().orderBy("w")
      .collect().map(_.getString(0))
    require(vocab.length > copies,
      s"cipher needs |vocab| (${vocab.length}) > copies ($copies)")
    val vIdx = vocab.zipWithIndex.toMap
    scaled("documents", Seq("doc_id"), (d, i) =>
      if (i == 0) d
      else {
        // shift = i: distinct nonzero shifts for every copy as long as
        // copies < |vocab| (checked), so no copy's cipher collapses to
        // identity and no two copies share a mapping
        val perm = udf((t: String) => if (t == null) null else
          t.split(' ').map(w =>
            vIdx.get(w).map(ix => vocab((ix + i) % vocab.length))
              .getOrElse(w)).mkString(" "))
        d.withColumn("text", perm(col("text")))
          .withColumn("n_chars", length(col("text")).cast("long"))
      })
    scaled("embeddings", Seq("vec_id"), (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), x => x + lit(i * 1e-4f))))
    spark.stop()
  }
}
