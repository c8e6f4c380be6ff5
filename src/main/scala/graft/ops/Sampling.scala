package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling & splitting for training-data pipelines.
  *
  * Everything keys on a CONTENT hash (md5-lower-64, the engine's pinned
  * cross-engine hash — TextOps.md5Lower64 = DuckDB `md5_number_lower`), so
  * results are stable across runs, cluster sizes, and partitionings — the
  * property `df.sample()` (RNG + partition-dependent) cannot give a
  * reproducible pipeline. Pure per-row maps: no shuffle, no state.
  */
object Sampling {

  private val hashUdf = udf((s: String) => TextOps.md5Lower64(s))

  /** Uniform bucket in [0, buckets) from the key's content hash. `buckets`
    * must be a power of two: our hash is the SIGNED reinterpretation of the
    * unsigned md5 low 64 bits, and signed pmod agrees with unsigned mod
    * exactly when the modulus divides 2^64. */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two: $buckets")
    pmod(hashUdf(key.cast("string")), lit(buckets.toLong)).cast("int")
  }

  /** Keep ~rate of rows, chosen by content hash of `key` — deterministic:
    * the same key is always in or always out, at any scale, in any engine
    * that agrees on md5 (salt the key string to re-roll). */
  def hashSample(df: DataFrame, key: Column, rate: Double,
      buckets: Int = 8192): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.filter(hashBucket(key, buckets) < (rate * buckets).toInt)
  }

  /** Exactly `n` rows per group (fewer when the group is smaller), chosen
    * deterministically: the rows with the smallest md5(key) win, ties
    * broken by the key itself. The hex DIGEST string is the sort key —
    * lexicographic hex order equals unsigned numeric order in any engine,
    * where a signed-long reinterpretation would not. Spark plans the
    * rank<=n filter as a WindowGroupLimit: every task keeps only its local
    * top-n per group BEFORE the shuffle, so the exchange carries at most
    * n rows per (group, input-partition) — the scalable top-n-per-group
    * shape even when one group holds most of the corpus. */
  def stratified(df: DataFrame, group: Column, key: Column, n: Int): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(group)
      .orderBy(md5(key.cast("string")).asc, key.cast("string").asc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n).drop("_rk")
  }

  /** Label each row train/val/test by content hash: fractions in [0,1],
    * train gets the remainder. Deterministic and disjoint by construction. */
  def split(df: DataFrame, key: Column, valFraction: Double,
      testFraction: Double, buckets: Int = 8192): DataFrame = {
    require(valFraction >= 0 && testFraction >= 0 &&
      valFraction + testFraction <= 1, "fractions must sum to <= 1")
    val b = hashBucket(key, buckets)
    val valCut = (valFraction * buckets).toInt
    val testCut = valCut + (testFraction * buckets).toInt
    df.withColumn("split",
      when(b < valCut, "val").when(b < testCut, "test").otherwise("train"))
  }
}
