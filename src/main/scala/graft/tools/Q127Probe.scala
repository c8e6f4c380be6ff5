package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-timing probe for q127 (signature-store near-dup): localizes the
  * per-pass cost across fresh hashing, banding+candidates, and the exact
  * verify tail, plus the effect of the `freshSigs` single-evaluation
  * hook. Ad-hoc diagnostic; not part of the driver contract. */
object Q127Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = d.filter(col("doc_id") % 10 =!= 0)
    val fresh = d.filter(col("doc_id") % 10 === 0)
    // materialized store stand-in (the real q127 reads a graft table;
    // this isolates compute from the table-read cost)
    val store = Dedup.minhashSignatures(corpus, n = 3, bands = 32, rows = 2)
      .persist()
    System.err.println(s"store rows: ${store.count()}")

    def time(label: String, runs: Int = 3)(body: => Long): Unit = {
      body // warm
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      System.err.println(f"$label%-28s ${ts.map(_._1).min}%6.2f s (min of $runs)  rows=${ts.head._2}")
    }

    time("fresh signatures") {
      Dedup.minhashSignatures(fresh, n = 3, bands = 32, rows = 2).count()
    }
    time("full fromStore") {
      Dedup.minhashLshPairsFromStore(store, fresh, d,
        n = 3, bands = 32, rows = 2, threshold = 0.5).count()
    }
    val fs = Dedup.minhashSignatures(fresh, n = 3, bands = 32, rows = 2).persist()
    fs.count()
    time("full + freshSigs persisted") {
      Dedup.minhashLshPairsFromStore(store, fresh, d,
        n = 3, bands = 32, rows = 2, threshold = 0.5,
        freshSigs = Some(fs)).count()
    }
    // candidate volume (what the verify tail pays for)
    val bandUdf = udf((sig: Array[Byte]) => {
      val bb = java.nio.ByteBuffer.wrap(sig)
      val ints = Array.fill(sig.length / 4)(bb.getInt)
      (0 until 32).map(bd => bd.toLong << 32 |
        (graft.util.Murmur3.hashString(
          ints.slice(bd * 2, bd * 2 + 2).mkString(",")).toLong & 0xffffffffL))
    })
    def banded(w: org.apache.spark.sql.DataFrame) =
      w.select(col("doc_id"), explode(bandUdf(col("sig"))).as("band"))
    val fb = banded(fs)
    val all = banded(store).unionByName(fb)
    val cand = fb.as("x").join(all.as("y"), Seq("band"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b"))
      .distinct().persist()
    time("banding + candidates") { cand.count() }
    val touched = cand.select(col("a").as("doc_id"))
      .unionByName(cand.select(col("b").as("doc_id"))).distinct()
    time("touched docs") { touched.count() }
    time("gram prep for touched") {
      d.join(touched, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          graft.ops.TextOps.wordNgrams(
            graft.ops.TextOps.tokens(col("text")), 3).as("grams"))
        .count()
    }
    spark.stop()
  }
}
