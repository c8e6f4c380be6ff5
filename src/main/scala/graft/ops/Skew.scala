package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware join helpers for 100 TB shuffles.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) is the
  * first line of defense and needs no code. Salting is the explicit
  * fallback when a single join key is pathologically hot (the classic
  * power-law user_id): the big side gets a random-but-deterministic salt in
  * [0, buckets), the build side is replicated once per salt value, and the
  * join key becomes (key, salt) — one hot partition becomes `buckets`
  * even ones. Results are identical to the unsalted join (verified against
  * a DuckDB oracle in q08).
  */
object Skew {

  /** Inner equi-join `big ⋈ build` on `key`, salted into `buckets` lanes.
    * `build` is replicated `buckets`× — keep it the smaller side. */
  def saltedJoin(big: DataFrame, build: DataFrame, key: String,
      buckets: Int = 8): DataFrame = {
    // deterministic salt: spread rows of a hot key across lanes by row
    // content hash (xxhash64 of all big-side columns), not rand() — keeps
    // the operator replayable (speculative tasks, stage retries)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(buckets)).cast("int"))
    val replicated = build
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
