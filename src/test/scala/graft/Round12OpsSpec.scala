package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Text}

/** Semantic pins for the round-12 registrations: d23's delta-vs-base
  * containment screen and t35's per-source tokenizer fertility.
  */
class Round12OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("d23 verdicts every delta doc exactly once") {
    import spark.implicits._
    val out = Dedup.queries("d23_containment_delta")(spark, dir)
    val nDelta = Tables(spark, dir, "documents")
      .filter($"doc_id" % 2 === 1).count()
    assert(out.count() == nDelta)
    assert(out.select($"doc_id").distinct().count() == nDelta)
    val verdicts = out.select($"verdict").distinct()
      .collect().map(_.getString(0)).toSet
    assert(verdicts.subsetOf(
      Set("contained_in_base", "kept", "contains_base")))
    assert(verdicts.contains("contained_in_base") || verdicts.contains(
      "contains_base"), "fixture has no cross-parity containment at all")
  }

  test("d23 agrees with d22 on every cross-parity containment pair") {
    import spark.implicits._
    // same rare-gram universe, same τ: any d22 pair with one odd and
    // one even side must surface in d23 — the odd side cannot be kept
    val d22 = Dedup.queries("d22_containment")(spark, dir)
      .filter(($"doc_a" % 2) =!= ($"doc_b" % 2))
      .select(when($"doc_a" % 2 === 1, $"doc_a").otherwise($"doc_b")
        .as("delta_id"))
      .distinct()
    val kept = Dedup.queries("d23_containment_delta")(spark, dir)
      .filter($"verdict" === "kept")
      .select($"doc_id".as("delta_id"))
    assert(d22.count() > 0, "fixture has no cross-parity d22 pairs")
    assert(d22.join(kept, Seq("delta_id")).count() == 0,
      "a d22 cross-parity pair's delta side was verdicted kept by d23")
  }

  test("d23 never flags a delta doc with no base candidate") {
    import spark.implicits._
    val out = Dedup.queries("d23_containment_delta")(spark, dir)
    val flaggedNoMatch = out
      .filter($"verdict" =!= "kept" && $"n_base_matches" === 0).count()
    val keptWithMatch = out
      .filter($"verdict" === "kept" &&
        ($"n_base_matches" > 0 || $"max_containment".isNotNull)).count()
    assert(flaggedNoMatch == 0 && keptWithMatch == 0)
  }

  test("s16 sweep: recall and candidate cost both grow with the radius") {
    import spark.implicits._
    val rows = operators.Similarity.queries("s16_probe_sweep")(spark, dir)
      .orderBy($"max_hamming").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 9, 37, 93),
      "probe counts must be C(8,0..h) cumulative")
    val cand = rows.map(_.getLong(2))
    val recall = rows.map(_.getDouble(5))
    assert(cand.zip(cand.tail).forall { case (a, b) => a <= b },
      "candidate cost must be monotone in the radius")
    assert(recall.zip(recall.tail).forall { case (a, b) => a <= b + 1e-12 },
      "recall must be monotone in the radius (supersets of candidates)")
    assert(rows.forall(r => r.getLong(3) <= r.getLong(4)),
      "hits cannot exceed the exact total")
    // radius 1 must reproduce s09's micro recall (same engine, s02)
    val s09 = operators.Similarity.queries("s09_ann_recall")(spark, dir)
      .agg(org.apache.spark.sql.functions.sum($"n_hit"),
        org.apache.spark.sql.functions.sum($"n_exact")).collect()(0)
    val r1 = rows(1)
    assert(r1.getLong(3) == s09.getLong(0) && r1.getLong(4) == s09.getLong(1),
      "s16@h=1 diverged from s09's hit/exact totals")
  }

  test("d24 occupancy stats agree with the band frame they profile") {
    import spark.implicits._
    val stats = operators.Dedup.queries("d24_index_stats")(spark, dir)
    assert(stats.count() == 16, "one row per band")
    // n_rows summed over bands = 16 x per-doc signature count (each
    // doc contributes one row per band)
    val nDocs = Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"text", " ")) >= 3).count()
    val totalRows = stats.agg(org.apache.spark.sql.functions.sum($"n_rows"))
      .collect()(0).getLong(0)
    assert(totalRows == 16L * nDocs,
      s"expected ${16L * nDocs} band rows, got $totalRows")
    val bad = stats.filter($"max_occupancy" < $"p90_occupancy" ||
      $"p90_occupancy" < $"p50_occupancy" || $"n_buckets" > $"n_rows").count()
    assert(bad == 0)
  }

  test("q41 histogram partitions the whole customer base") {
    import spark.implicits._
    val q41 = operators.Relational.queries("q41_custdist")(spark, dir)
    val nCust = Tables(spark, dir, "customer").count()
    val total = q41.agg(sum($"custdist")).collect()(0).getLong(0)
    assert(total == nCust,
      s"histogram must cover every customer: $total vs $nCust")
    // the histogram is a partition: buckets are distinct and non-empty
    assert(q41.filter($"custdist" <= 0).count() == 0)
    assert(q41.select($"c_count").distinct().count() == q41.count())
    // re-derive the per-customer counts independently (inner-join side)
    // and check the left join only ADDS a zero bucket, never loses one
    val inner = Tables(spark, dir, "orders")
      .filter($"o_orderpriority" =!= "1-URGENT")
      .groupBy($"o_custkey").agg(count(lit(1)).as("c_count"))
      .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
    val mismatch = q41.filter($"c_count" > 0).as("a")
      .join(inner.as("b"), "c_count")
      .filter($"a.custdist" =!= $"b.custdist").count()
    assert(mismatch == 0, "non-zero buckets must match the inner-join rollup")
  }

  test("t35 fertility is t06's token counts rolled up by source") {
    import spark.implicits._
    val t35 = Text.queries("t35_token_fertility")(spark, dir)
    val fromT06 = Text.queries("t06_bpe_tokens")(spark, dir)
      .join(Tables(spark, dir, "documents").select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("nw")), "doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bpe_tokens".cast("long")).as("n_bpe_tokens"),
        sum($"nw").as("n_words"))
    val joined = t35.as("a").join(fromT06.as("b"), "source")
      .filter($"a.n_docs" =!= $"b.n_docs" ||
        $"a.n_bpe_tokens" =!= $"b.n_bpe_tokens" ||
        $"a.n_words" =!= $"b.n_words")
    assert(joined.count() == 0, "t35 rollup drifted from t06's counts")
    // fertility is the exact quotient of the emitted sums
    val bad = t35.filter(
      $"fertility" =!= $"n_bpe_tokens".cast("double") /
        $"n_words".cast("double")).count()
    assert(bad == 0)
    assert(t35.count() > 1, "documents table should span several sources")
  }
}
