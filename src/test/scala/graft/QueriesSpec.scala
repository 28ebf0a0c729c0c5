package graft

/** Every SparkEntry query runs and returns rows at sf0.001, and its schema
  * column set matches what the oracle SQL will produce (columns are the
  * hash-compare contract).
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs non-empty at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(df.columns.distinct.length == df.columns.length, s"$name has dup columns")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }
}
