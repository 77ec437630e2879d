package graft

/** Every declared query must build and execute on sf0.001; oracle-backed
  * queries must be non-degenerate (rows > 0) so the driver's hash compare
  * actually compares something. */
class QueriesSmokeSpec extends SparkSuite {

  SparkEntry.all.foreach { q =>
    test(s"${q.name} executes on sf0.001") {
      val n = q.build(spark, sf()).count()
      if (q.oracle.isDefined)
        assert(n > 0, s"${q.name} returned 0 rows — degenerate oracle check")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all oracle keys correspond to declared queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every declared query carries a full oracle — the correctness contract") {
    // a query without an oracle gets only the driver's weak rows>0
    // check; the engine's standing claim is that EVERY declared query
    // is hash-verified, so an oracle-less declaration is a regression
    val missing = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"oracle-less queries: ${missing.mkString(", ")}")
  }
}
