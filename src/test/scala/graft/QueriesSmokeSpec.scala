package graft

/** Every declared query must run end-to-end on the smoke-scale data.
  * This is the fast regression net under the driver's sf0.01 oracle
  * gate: a query that throws or returns a broken plan fails here in
  * seconds.
  */
class QueriesSmokeSpec extends SparkSpec {
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val n = fn(spark, sf()).count()
      assert(n >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
