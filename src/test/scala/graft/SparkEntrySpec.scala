package graft

/** Driver-contract guards: the smoke check the driver runs, and the
  * invariants the Verify/oracle machinery depends on. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry; names are unique") {
    val qnames = SparkEntry.allQueries.map(_.name)
    assert(qnames.distinct.size === qnames.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query runs on sf0.001 and returns a non-empty schema") {
    SparkEntry.allQueries.foreach { q =>
      val df = q.run(spark, "/root/testdata/sf0.001")
      assert(df.schema.nonEmpty, q.name)
    }
  }
}
