package graft

/** Every declared query must run at sf0.001 and (except the pair-mining
  * queries, which may legitimately be sparse there) return rows. */
class QueriesSpec extends SparkSpec {

  private val mayBeSmall = Set("llm_minhash_pairs", "llm_simhash_pairs")

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows") {
      val n = fn(spark, sf).count()
      if (!mayBeSmall(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("bench queries all exist") {
    val missing = SparkEntry.benchQueries.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"bench names without queries: $missing")
  }
}
