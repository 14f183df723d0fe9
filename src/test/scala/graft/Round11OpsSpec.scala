package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, Text}

/** Pins the round-11 additions beyond their DuckDB oracles:
  * d20's verdicts against d15's exact-dup ground truth, d21's leak
  * flag against t16's actual split assignment, and s15's occupancy
  * accounting against the raw embeddings table.
  */
class Round11OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("d20: every exact base dup (≥3 tokens) is caught as base_near_dup") {
    import spark.implicits._
    // an exact copy has est-Jaccard 1.0 and identical band buckets, so
    // d15's base_dup verdict (md5 ground truth) must be a subset of
    // d20's base_near_dup on the ≥3-token roster
    val d15 = Dedup.queries("d15_delta_dedup")(spark, dir)
      .filter($"verdict" === "base_dup").select($"doc_id")
    val roster = Tables(spark, dir, "documents")
      .filter(size(split($"text", " ")) >= 3).select($"doc_id")
    val d20 = Dedup.queries("d20_delta_minhash")(spark, dir)
    val missed = d15.join(roster, "doc_id")
      .join(d20.filter($"verdict" === "base_near_dup").select($"doc_id"),
        Seq("doc_id"), "left_anti")
      .count()
    assert(missed == 0L,
      s"$missed exact base dups escaped the near-dup delta screen")
  }

  test("d20: confirmed matches respect the delta convention (base even, earlier delta odd)") {
    import spark.implicits._
    val d20 = Dedup.queries("d20_delta_minhash")(spark, dir)
    assert(d20.filter($"first_base_match".isNotNull &&
      $"first_base_match" % 2 =!= 0).count() == 0L,
      "a base match id is odd")
    assert(d20.filter($"first_delta_match".isNotNull &&
      ($"first_delta_match" % 2 =!= 1 ||
        $"first_delta_match" >= $"doc_id")).count() == 0L,
      "a delta match is not an EARLIER odd doc")
    assert(d20.filter($"verdict" === "base_near_dup" &&
      $"n_base_confirmed" === 0).count() == 0L)
    assert(d20.count() > 0)
  }

  test("d21: leak flag agrees with t16's split assignment on every pair") {
    import spark.implicits._
    val splits = Text.queries("t16_hash_split")(spark, dir)
      .select($"doc_id", $"split")
    val bad = Dedup.queries("d21_split_leakage")(spark, dir)
      .join(splits.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(splits.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
      .filter(($"split_a" =!= $"sa") || ($"split_b" =!= $"sb") ||
        ($"leaks" === 1) =!= ($"sa" =!= $"sb"))
      .count()
    assert(bad == 0L, s"$bad d21 rows disagree with t16's splits")
  }

  test("d21: byte-identical duplicate pairs can never leak") {
    import spark.implicits._
    // t16 keys the split on md5(text), so two identical texts always
    // share a split — the property that makes d21 measure only the
    // NEAR-dup leakage the split rule cannot prevent
    val h = Tables(spark, dir, "documents").select($"doc_id", md5($"text").as("h"))
    val exactLeaks = Dedup.queries("d21_split_leakage")(spark, dir)
      .join(h.select($"doc_id".as("doc_a"), $"h".as("ha")), "doc_a")
      .join(h.select($"doc_id".as("doc_b"), $"h".as("hb")), "doc_b")
      .filter($"ha" === $"hb" && $"leaks" === 1)
      .count()
    assert(exactLeaks == 0L, "an exact duplicate pair straddles a split")
  }

  test("d22: containment dominates jaccard and catches every high-jaccard d04 pair") {
    import spark.implicits._
    val d22 = Dedup.queries("d22_containment")(spark, dir)
    assert(d22.count() > 0)
    // |A∩B|/min ≥ |A∩B|/|A∪B| always, and every row clears the τ gate
    assert(d22.filter($"containment" < $"jaccard" ||
      $"containment" < 0.6).count() == 0L)
    // jaccard ≥ τ ⟹ containment ≥ τ, so d04's pairs at τ are a subset
    val missed = Dedup.queries("d04_ngram_jaccard")(spark, dir)
      .filter($"jaccard" >= 0.6).select($"doc_a", $"doc_b")
      .join(d22.select($"doc_a", $"doc_b"), Seq("doc_a", "doc_b"), "left_anti")
      .count()
    assert(missed == 0L, s"$missed high-jaccard pairs escaped d22")
  }

  test("d22: contained_doc is the smaller-gram-set side, recomputed from raw text") {
    import spark.implicits._
    val gs = Tables(spark, dir, "documents")
      .select($"doc_id", expr(
        """size(array_distinct(transform(sequence(0, size(split(text, ' ')) - 2),
          |  i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i + 1]))))"""
          .stripMargin).as("ng"))
    val bad = Dedup.queries("d22_containment")(spark, dir)
      .join(gs.select($"doc_id".as("doc_a"), $"ng".as("na")), "doc_a")
      .join(gs.select($"doc_id".as("doc_b"), $"ng".as("nb")), "doc_b")
      .filter($"contained_doc" =!= when($"na" <= $"nb", $"doc_a").otherwise($"doc_b"))
      .count()
    assert(bad == 0L, s"$bad rows name the wrong contained side")
  }

  test("t34: labels, internal consistency, and class separation") {
    import spark.implicits._
    val out = Text.queries("t34_quality_classifier")(spark, dir)
    val docs = Tables(spark, dir, "documents")
    assert(out.count() == docs.count())
    // is_ref reproduces the source-membership label for every doc
    val lbl = docs.select($"doc_id",
      when($"source".isin("src0", "src1", "src2", "src3"), 1).otherwise(0).as("l"))
    assert(out.join(lbl, "doc_id").filter($"is_ref" =!= $"l").count() == 0L)
    // pred is exactly the score>0 threshold, and n_toks the token count
    assert(out.filter(($"pred" === 1) =!= ($"score" > 0.0)).count() == 0L)
    val nt = docs.select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    assert(out.join(nt, "doc_id").filter($"n_toks" =!= $"n").count() == 0L)
    // the model separates its own training classes: mean ref score above
    // mean non-ref score (the weakest claim a working NB filter makes)
    val m = out.groupBy($"is_ref").agg(avg($"score").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(1) > m(0), s"ref mean ${m(1)} not above non-ref mean ${m(0)}")
  }

  test("s15: occupancy accounting matches the embeddings table exactly") {
    import spark.implicits._
    val out = Similarity.queries("s15_index_upsert")(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    val nEven = emb.filter($"vec_id" % 2 === 0).count()
    val nOdd = emb.filter($"vec_id" % 2 === 1).count()
    val sums = out.agg(sum($"n_base").as("b"), sum($"n_delta").as("d"))
      .head()
    assert(sums.getLong(0) == nEven && sums.getLong(1) == nOdd,
      s"bucket occupancy sums ${sums} != sides ($nEven, $nOdd)")
    // the flag is the documented 2×-uniform rule, re-derived here
    val total = nEven + nOdd
    val bad = out.filter((($"n_base" + $"n_delta") * 256L > 2L * total) =!=
      ($"needs_split" === 1)).count()
    assert(bad == 0L, s"$bad buckets carry an inconsistent needs_split flag")
  }
}
