package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Does the fused minhash prep UDF evaluate once or twice per row?
  *
  * The prep pipeline projects `udf(text)` and drops gram-less docs with
  * `.filter(p.isNotNull)`; Catalyst collapses the projects and pushes the
  * filter down as `isnotnull(UDF(text))`, so FilterExec and ProjectExec
  * each evaluate the UDF (codegen subexpression elimination does not span
  * operators). Shape A reproduces that; shape B pre-filters on the cheap
  * builtin condition that is EXACTLY the UDF's null condition
  * (text null or token count < n) so the expensive UDF runs only in the
  * project. Counters count actual invocations (local mode, shared JVM);
  * arms alternate per pass. `runMain graft.tools.PrepEvalProbe [runs]`. */
object PrepEvalProbe {
  val countA = new AtomicLong(0)
  val countB = new AtomicLong(0)

  def main(args: Array[String]): Unit = {
    val runs = if (args.length > 0) args(0).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 3; val k = 64
    def kernel(text: String): (Array[Long], Array[Int]) = {
      if (text == null) return null
      val toks = text.split(" ", -1)
      if (toks.length < n) return null
      val seen = new java.util.HashSet[String]()
      val sig = Array.fill(k)(Int.MaxValue)
      val seenH = new java.util.HashSet[Long]()
      val gh = new scala.collection.mutable.ArrayBuffer[Long](toks.length)
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        val g = sb.toString
        if (seen.add(g)) {
          val b = g.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var p = 0
          while (p < k) {
            val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
              .hashUnsafeBytes2(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                b.length, p * 0x9e3779b1 + 0x85ebca77)
            if (h < sig(p)) sig(p) = h
            p += 1
          }
          val x = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
              b.length, 42L)
          if (seenH.add(x)) gh += x
        }
        i += 1
      }
      if (gh.isEmpty) null else (gh.toArray, sig)
    }
    val udfA = udf((t: String) => { countA.incrementAndGet(); kernel(t) })
    val udfB = udf((t: String) => { countB.incrementAndGet(); kernel(t) })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val nRows = docs.count()
    def shapeA = docs.select(col("doc_id"), udfA(col("text")).as("p"))
      .filter(col("p").isNotNull)
      .select(col("doc_id"), col("p._1").as("gh"), col("p._2").as("sig"))
    def shapeB = docs
      .filter(col("text").isNotNull &&
        size(split(col("text"), " ", -1)) >= n)
      .select(col("doc_id"), udfB(col("text")).as("p"))
      .select(col("doc_id"), col("p._1").as("gh"), col("p._2").as("sig"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // row agreement
    System.err.println(s"rows=$nRows A=${shapeA.count()} B=${shapeB.count()}")
    noop(shapeA); noop(shapeB) // warm
    countA.set(0); countB.set(0)
    noop(shapeA); noop(shapeB)
    System.err.println(s"one pass: udfA invocations=${countA.get()} udfB invocations=${countB.get()} (rows=$nRows)")
    for (i <- 1 to runs) {
      val a = t(noop(shapeA)); val b = t(noop(shapeB))
      System.err.println(f"pass$i current=$a%6.3f prefiltered=$b%6.3f")
    }
    spark.stop()
  }
}
