package graft

/** Smoke: every declared query runs on sf0.001 and yields rows, and every
  * query has a matching oracle entry (the driver's gate needs both). */
class QueriesSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs and returns rows") {
      assert(SparkEntry.queries(name)(spark, dir).count() > 0)
    }
  }

  test("oracle coverage: every oracleSql key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }
}
