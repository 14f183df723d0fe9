package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-integrity guard for the driver's correctness gate — the
  * compile-time-ish form of round 6's lesson (s07 shipped an oracle
  * whose interpolated quota constant was still 0 at string-build time,
  * so the driver compared 397 Spark rows against a degenerate 0-row
  * oracle). Pure map checks, no Spark session needed.
  */
class OracleRegistrySpec extends AnyFunSuite {

  private val queries = SparkEntry.queries.keySet
  private val oracles = SparkEntry.oracleSql
  private val rowsOnly = SparkEntry.rowsOnly

  test("every registered query has an oracle OR a declared rows-only marker") {
    val uncovered = queries -- oracles.keySet -- rowsOnly
    assert(uncovered.isEmpty,
      s"queries with neither oracle nor rows-only declaration: $uncovered")
  }

  test("no query is both oracle-checked and declared rows-only") {
    val both = oracles.keySet & rowsOnly
    assert(both.isEmpty, s"conflicting declarations: $both")
  }

  test("every oracle key names a registered query") {
    val orphans = oracles.keySet -- queries
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("every rows-only key names a registered query") {
    val orphans = rowsOnly -- queries
    assert(orphans.isEmpty, s"rows-only markers without a query: $orphans")
  }

  test("no oracle SQL carries a degenerate non-positive rank/quota guard") {
    // the exact round-6 failure signature: an uninitialized interpolated
    // Int constant renders as 0, turning `rn <= $Quota` into `rn <= 0`
    // `(?![.\d])` keeps legitimate decimal thresholds (`<= 0.05`) legal
    val degenerate = "(?s).*<=\\s*0(?![.\\d]).*".r
    val bad = oracles.collect {
      case (k, sql) if degenerate.pattern.matcher(sql).matches => k
    }
    assert(bad.isEmpty, s"oracle SQL with `<= 0` guard (uninitialized constant?): $bad")
  }

  test("every oracle SQL is substantial and references a table or literal relation") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings", "VALUES")
    oracles.foreach { case (k, sql) =>
      assert(sql.trim.length > 20, s"$k oracle suspiciously short")
      assert(tables.exists(sql.contains), s"$k oracle references no known table")
    }
  }
}
