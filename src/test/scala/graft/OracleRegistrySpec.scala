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

  // ---- round-8 HUGEINT lesson: DuckDB SUM(BIGINT) returns HUGEINT,
  // which the driver materializes as Arrow decimal128(38,0) while Spark
  // emits int64 — value-equal, hash-divergent (q30/q31 shipped red this
  // way; every local fetchall()-based probe was blind to it). Statically
  // ban the signature at registration time: an alias bound to a SUM
  // (aggregate or window) may only reach the FINAL projection through a
  // CAST or a division (DuckDB `/` yields DOUBLE).

  /** Aliases bound as `SUM(...) [OVER (...)] AS ident` anywhere in the
    * SQL. `CAST(SUM(..) AS BIGINT) AS x` yields ident=BIGINT here, which
    * the type-keyword filter drops — exactly the safe pattern.
    */
  private def sumAliases(sql: String): Set[String] = {
    val up = sql.toUpperCase
    val typeKw = Set("BIGINT", "HUGEINT", "INT", "INTEGER", "DOUBLE",
      "VARCHAR", "DECIMAL", "SMALLINT", "UBIGINT", "FLOAT", "REAL", "DATE")
    def parenSpan(from: Int): Int = { // from points at '('; returns index after ')'
      var depth = 0; var i = from
      while (i < up.length) {
        if (up(i) == '(') depth += 1
        else if (up(i) == ')') { depth -= 1; if (depth == 0) return i + 1 }
        i += 1
      }
      up.length
    }
    val ident = "^\\s*AS\\s+(\\w+)".r
    var out = Set.empty[String]
    var i = up.indexOf("SUM")
    while (i >= 0) {
      val wordStart = i == 0 || !up(i - 1).isLetterOrDigit
      val open = up.indexWhere(!_.isWhitespace, i + 3)
      if (wordStart && open >= 0 && up(open) == '(') {
        var after = parenSpan(open)
        // optional OVER (...)
        val rest = up.drop(after)
        val trimmed = rest.dropWhile(_.isWhitespace)
        if (trimmed.startsWith("OVER")) {
          val overOpen = after + (rest.length - trimmed.length) + 4
          val realOpen = up.indexWhere(!_.isWhitespace, overOpen)
          if (realOpen >= 0 && up(realOpen) == '(') after = parenSpan(realOpen)
        }
        ident.findFirstMatchIn(up.drop(after)).foreach { m =>
          if (!typeKw(m.group(1))) out += m.group(1)
        }
      }
      i = up.indexOf("SUM", i + 3)
    }
    out
  }

  /** Top-level projection items of the LAST depth-0 SELECT. */
  private def finalProjectionItems(sql: String): Seq[String] = {
    val up = sql.toUpperCase
    var depth = 0; var lastSel = -1; var i = 0
    while (i < up.length) {
      up(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'S' if depth == 0 && up.startsWith("SELECT", i) &&
          (i == 0 || !up(i - 1).isLetterOrDigit) => lastSel = i
        case _ =>
      }
      i += 1
    }
    if (lastSel < 0) return Nil
    // find matching top-level FROM
    depth = 0; i = lastSel + 6; var from = up.length
    while (i < up.length && from == up.length) {
      up(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'F' if depth == 0 && up.startsWith("FROM", i) &&
          !up(i - 1).isLetterOrDigit => from = i
        case _ =>
      }
      i += 1
    }
    val proj = sql.substring(lastSel + 6, from)
    // split on depth-0 commas
    val items = scala.collection.mutable.Buffer.empty[String]
    val sb = new StringBuilder; depth = 0
    proj.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => items += sb.toString; sb.clear()
      case c => sb += c
    }
    items += sb.toString
    items.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  test("no oracle re-emits a SUM-derived alias uncast in its final projection") {
    val bad = SparkEntry.oracleSql.toSeq.flatMap { case (k, sql) =>
      val hazards = sumAliases(sql)
      if (hazards.isEmpty) Nil
      else finalProjectionItems(sql).flatMap { item =>
        val upItem = item.toUpperCase
        val refs = hazards.filter(h =>
          s"(?i)(?<![\\w.])${h}(?![\\w])".r.findFirstIn(item).isDefined)
        // safe if the item casts, divides (→ DOUBLE), or is itself the
        // SUM definition site (then the AS-ident scan governs it)
        if (refs.nonEmpty && !upItem.contains("CAST") &&
          !upItem.contains("/") && !upItem.contains("SUM"))
          Some(s"$k: '$item' re-emits SUM alias ${refs.mkString(",")}")
        else None
      }
    }
    assert(bad.isEmpty,
      "HUGEINT hazard (DuckDB SUM→decimal128 vs Spark int64):\n" +
        bad.mkString("\n"))
  }

  test("the SUM-alias lint actually fires on a seeded bare-SUM oracle") {
    val seeded =
      """WITH per AS (SELECT l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q
        | FROM lineitem GROUP BY 1)
        |SELECT l_suppkey, q FROM per ORDER BY 1""".stripMargin
    assert(sumAliases(seeded) == Set("Q"))
    val items = finalProjectionItems(seeded)
    assert(items.exists(i => i.trim.equalsIgnoreCase("q")),
      s"projection items: $items")
    // and the safe spellings pass
    assert(sumAliases("SELECT CAST(SUM(x) AS BIGINT) AS q FROM t").isEmpty)
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
