package graft

class QueriesSpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and is non-degenerate") {
    val empties = Set("q09_customers_without_orders", "q33_jaccard_pairs",
      "q34_minhash_lsh_pairs") // legitimately empty at tiny scale
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!empties.contains(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a query") {
    SparkEntry.oracleSql.keys.foreach(k => assert(SparkEntry.queries.contains(k)))
  }
}
