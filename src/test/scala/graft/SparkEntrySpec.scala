package graft

class SparkEntrySpec extends SparkSuite {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and every oracle key has a query") {
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).count()
    }
    // q06 (anti join) legitimately returns 0 at tiny scale; near-dup pair
    // sets may be empty on the synthetic corpus — everything else must
    // produce rows.
    val allowEmpty = Set("q06_anti_join")
    results.foreach { case (name, n) =>
      assert(n >= 0)
      if (!allowEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
