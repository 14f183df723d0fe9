package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Accuracy bounds for the sketch-based scale-path aggregates (q12/q13)
  * against their exact counterparts (q09/q11) — the rows-only gate
  * checks existence, these check the estimates are actually usable.
  */
class ApproxAccuracySpec extends SparkSpec {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("q12 HLL distinct counts are within 5% of exact per group") {
    dirs.foreach { dir =>
      val exact = Relational.queries("q09_distinct_users_per_type")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val approx = Relational.queries("q12_distinct_approx")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet)
      exact.foreach { case (k, n) =>
        val err = math.abs(approx(k) - n).toDouble / n
        assert(err <= 0.05, s"$dir $k: approx ${approx(k)} vs exact $n ($err)")
      }
    }
  }

  test("q13 approx percentiles land within 1% of the exact quantile values") {
    dirs.foreach { dir =>
      val exact = Relational.queries("q11_group_percentiles")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val approx = Relational.queries("q13_percentiles_approx")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(approx.keySet == exact.keySet)
      exact.foreach { case (k, (m, p95)) =>
        assert(math.abs(approx(k)._1 - m) / m <= 0.01,
          s"$dir $k median: ${approx(k)._1} vs $m")
        assert(math.abs(approx(k)._2 - p95) / p95 <= 0.01,
          s"$dir $k p95: ${approx(k)._2} vs $p95")
      }
    }
  }
}
