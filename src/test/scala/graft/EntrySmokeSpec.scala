package graft

/** Driver-contract smoke: entry() yields rows; every registered query has
  * matching column names with its oracle's aliases; headline queries run
  * non-empty at the smoke scale factor. */
class EntrySmokeSpec extends SparkSpec {

  private val smokeDir = "/root/testdata/sf0.001"

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle entry has a query and every name is unique") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert(QueryRegistry.all.map(_.name).distinct.size === QueryRegistry.all.size)
  }

  test("headline queries run non-empty at sf0.001") {
    QueryRegistry.all.filter(_.headline).foreach { q =>
      val n = q.run(spark, smokeDir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
