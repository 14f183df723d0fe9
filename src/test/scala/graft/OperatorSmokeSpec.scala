package graft

/** Every declared query runs end-to-end on sf0.001 and yields rows with
  * the declared column set — the fast local regression net under the
  * driver's full DuckDB-oracle gate.
  */
class OperatorSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned zero rows")
    }
  }
}
