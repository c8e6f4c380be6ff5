package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Murmur3

/**
 * Approximate-nearest-neighbor / similarity search over an embedding
 * column (`array<float>`).
 *
 * Scale design:
 *  - `cosineTopK` (brute force) is the exactness baseline: a single
 *    narrow map over the table (query vector rides the closure — no
 *    shuffle) followed by a top-k, which Spark executes as per-partition
 *    partial top-k + driver merge (`TakeOrderedAndProject`) — no global
 *    sort, no full shuffle. This is the right plan even at 100 TB when k
 *    is small.
 *  - `lshTopK` buckets vectors by random-hyperplane signs (deterministic
 *    seeded planes). At scale the bucketed table is precomputed and
 *    bucket-partitioned, so a query probes only matching buckets —
 *    turning a full scan into a partition-pruned point lookup.
 *  - `ivfTopK` is the IVF variant: k-means-lite centroids (seeded,
 *    single-pass assignment) → probe the nProbe nearest centroids.
 */
object Similarity {

  /** Dot product of two equal-length vectors as a deterministic
    * left-to-right fold in double precision (codegen'd, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against a literal query vector. */
  def cosineTopK(emb: DataFrame, query: Array[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    emb
      .select(col("vec_id"), cosine(col("embedding"), q).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * murmur3 of the index pair mapped to (-1, 1). */
  def planeComponent(plane: Int, dim: Int): Double =
    Murmur3.hashLong(plane.toLong << 32 | (dim.toLong & 0xffffffffL)).toDouble / Int.MaxValue.toDouble

  /** Random-hyperplane bucket for one hash table (nBits sign bits). */
  def lshBucket(vec: Seq[Float], table: Int, nBits: Int): Int = {
    var bucket = 0
    var p = 0
    while (p < nBits) {
      var s = 0.0
      var d = 0
      while (d < vec.length) { s += vec(d) * planeComponent(table * 997 + p, d); d += 1 }
      if (s > 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  /** One bucket id per hash table, packed as (table << 32 | bucket). */
  def lshBuckets(vec: Seq[Float], nTables: Int, nBits: Int): Seq[Long] =
    (0 until nTables).map(t => (t.toLong << 32) | (lshBucket(vec, t, nBits).toLong & 0xffffffffL))

  /**
   * Multi-table sign-LSH ANN top-k: a vector is a candidate when it shares
   * a bucket with the query (within `probeHamming` bit flips) in ANY of
   * `nTables` tables. Candidate check is a single narrow `arrays_overlap`
   * against a literal probe set — no shuffle, no explode. At warehouse
   * scale the bucket arrays are precomputed and exploded into a
   * bucket-partitioned index table so a probe reads only matching
   * partitions instead of scanning. Recall < 1 by construction; validated
   * against cosineTopK in OpsSpec.
   */
  def lshTopK(emb: DataFrame, query: Array[Float], k: Int,
              nTables: Int = 16, nBits: Int = 8, probeHamming: Int = 1): DataFrame = {
    val bucketsUdf = udf((v: Seq[Float]) => lshBuckets(v, nTables, nBits))
    val probed: Seq[Long] = (0 until nTables).flatMap { t =>
      val qb = lshBucket(query.toSeq, t, nBits)
      (0 until (1 << nBits)).filter(b => Integer.bitCount(b ^ qb) <= probeHamming)
        .map(b => (t.toLong << 32) | (b.toLong & 0xffffffffL))
    }
    val q = array(query.map(v => lit(v)): _*)
    emb
      .withColumn("buckets", bucketsUdf(col("embedding")))
      .filter(arrays_overlap(col("buckets"), typedLit(probed)))
      .select(col("vec_id"), cosine(col("embedding"), q).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Seeded deterministic centroids: nCentroids pseudo-random unit-ish
    * vectors of dimension dim (no training pass — IVF plumbing demo whose
    * assignment/probe dataflow matches a trained index). */
  def centroid(c: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(d => planeComponent(c * 7919 + 13, d))

  def nearestCentroid(vec: Seq[Float], nCentroids: Int): Int = {
    var best = 0
    var bestDot = Double.MinValue
    var c = 0
    while (c < nCentroids) {
      val cen = centroid(c, vec.length)
      var s = 0.0
      var d = 0
      while (d < vec.length) { s += vec(d) * cen(d); d += 1 }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    best
  }

  /** IVF ANN: assign rows to nearest centroid; probe the query's nProbe
    * nearest centroid lists with exact cosine. */
  def ivfTopK(emb: DataFrame, query: Array[Float], k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val assignUdf = udf((v: Seq[Float]) => nearestCentroid(v, nCentroids))
    val qScores = (0 until nCentroids).map { c =>
      val cen = centroid(c, query.length)
      c -> query.indices.map(d => query(d) * cen(d)).sum
    }
    val probed = qScores.sortBy(-_._2).take(nProbe).map(_._1)
    val q = array(query.map(v => lit(v)): _*)
    emb
      .withColumn("centroid", assignUdf(col("embedding")))
      .filter(col("centroid").isin(probed: _*))
      .select(col("vec_id"), cosine(col("embedding"), q).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }
}
