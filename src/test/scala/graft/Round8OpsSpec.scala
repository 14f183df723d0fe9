package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 operators on CRAFTED inputs — the
  * edge cases the DuckDB oracle can't distinguish because both engines
  * would make the same mistake: boundary packing, novelty extremes,
  * divergence extremes, sweep monotonicity, non-contiguous pedigree
  * keys (the exact bug the sf1 probe caught in e59), and index-health
  * internal consistency.
  */
class Round8OpsSpec extends SparkSpec {

  import spark.implicits._

  /** Writes a crafted documents/customer table to a temp dir readable
    * by the operators' `Tables(s, dir, …)` loader.
    */
  private def tmpTables(name: String)(write: String => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory(name).toString
    write(dir)
    dir
  }

  test("t29 novelty: a verbatim duplicate scores 0, the original 1") {
    val dir = tmpTables("t29") { d =>
      Seq(
        (1L, "alpha beta gamma delta epsilon", "en", "src0", 30L),
        (2L, "alpha beta gamma delta epsilon", "en", "src0", 30L), // dup of 1
        (3L, "zeta eta theta iota kappa", "en", "src0", 25L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$d/documents.parquet")
    }
    val out = graft.operators.Text.queries("t29_ngram_novelty")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0, s"first occurrence owns all its grams: $out")
    assert(out(2L) == 0.0, s"verbatim duplicate adds nothing: $out")
    assert(out(3L) == 1.0)
  }

  test("t27 divergence: split-half of one text ≈ 0, disjoint vocab = 1") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val dir = tmpTables("t27") { d =>
      Seq(
        (1L, base, "en", "same_a", 10L), (2L, base, "en", "same_b", 10L),
        (3L, "xx yy zz xx yy zz xx yy", "en", "other", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$d/documents.parquet")
    }
    val out = graft.operators.Text.queries("t27_domain_divergence")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("same_a", "same_b")) == 0.0,
      s"identical distributions diverge by 0: $out")
    assert(out(("other", "same_a")) == 1.0 && out(("other", "same_b")) == 1.0,
      s"disjoint vocabularies diverge by 1: $out")
  }

  test("d17 sweep: pair and flagged counts are non-increasing in tau") {
    val rows = graft.operators.Dedup.queries("d17_threshold_sweep")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((t1, p1, f1), (t2, p2, f2)) =>
        assert(p2 <= p1, s"pairs must shrink as tau rises: $t1->$t2")
        assert(f2 <= f1, s"flagged docs must shrink as tau rises: $t1->$t2")
      case _ =>
    }
  }

  test("e59 depth survives NON-contiguous customer keys (sf1 probe bug)") {
    // keys with huge gaps — raw-key parenting would dangle every chain
    val keys = Seq(7L, 900000L, 12L, 44444444L, 3L, 100L, 2L)
    val dir = tmpTables("e59") { d =>
      keys.map(k => (k, s"c$k", 0, 0.0, "SEG"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.parquet(s"$d/customer.parquet")
    }
    val out = graft.operators.Inheritance.queries("e59_generation_depth")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 7 ranked members -> depths: 1->0; 2,3->1; 4..7->2
    assert(out == Map(0L -> 1L, 1L -> 2L, 2L -> 4L), s"got $out")
  }

  test("m11 pack: media slot cost and budget boundary open new sequences") {
    val gif = "GIF8" + ("x" * 60) // routed as media by m08's magic bytes
    val dir = tmpTables("m11") { d =>
      Seq(
        // text doc costing exactly 2048 tokens fills sequence 0 alone
        (1L, "plain", "en", "src0", 8192L),
        (2L, "tiny doc", "en", "src0", 40L), // lands in sequence 1
        (3L, gif, "en", "src0", 64L)) // media: 16 text + 576 slot tokens
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$d/documents.parquet")
    }
    val out = graft.operators.Multimodal.queries("m11_interleave_pack")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // seq 0: doc1 only (2048 text tokens); seq 1: doc2 (10) + doc3 (16 + 576)
    assert(out(("src0", 0)) == ((1L, 0L, 2048L, 0L, 2048L)), s"got $out")
    assert(out(("src0", 1)) == ((2L, 1L, 26L, 576L, 602L)), s"got $out")
  }

  test("t30 Zipf fit recovers the exact slope of synthetic power-law text") {
    // source where token w_r appears round(1024 / r) times: an exact
    // Zipf corpus whose log-log points are colinear with slope -1
    val words = (1 to 32).flatMap { r =>
      Seq.fill(math.round(1024.0 / r).toInt)(f"w$r%02d")
    }
    val dir = tmpTables("t30") { d =>
      Seq((1L, words.mkString(" "), "en", "zipf", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$d/documents.parquet")
    }
    val r = graft.operators.Text.queries("t30_zipf_slope")(spark, dir)
      .collect().head
    assert(r.getString(0) == "zipf" && r.getLong(1) == 32L)
    val slope = r.getDouble(2)
    // rounding 1024/r to integer counts perturbs the tail slightly —
    // the fitted slope must sit within 2% of the true -1
    assert(math.abs(slope + 1.0) < 0.02, s"slope $slope")
  }

  test("st13: a single-event session bounces, a two-event session does not") {
    import graft.streaming.Event
    val dir = tmpTables("st13") { d =>
      Seq(
        Event(1, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), 1, "view"),
        Event(2, java.sql.Timestamp.valueOf("2024-03-01 10:05:00"), 1, "click"),
        Event(3, java.sql.Timestamp.valueOf("2024-03-01 12:00:00"), 2, "view"),
        Event(4, java.sql.Timestamp.valueOf("2024-03-02 09:00:00"), 1, "view"))
        .toDF().withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
        .write.parquet(s"$d/events.parquet")
    }
    val out = graft.operators.StreamingOps.queries("st13_bounce_rate")(spark, dir)
      .collect().map(r => r.getTimestamp(0).toString.take(10) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("2024-03-01") == ((2L, 1L, 0.5)), s"got $out") // u1 engaged, u2 bounced
    assert(out("2024-03-02") == ((1L, 1L, 1.0)), s"got $out")
  }

  test("e62 odds ratio: fixture's affected s1 carries in every gene") {
    val out = graft.operators.Stats.queries("e62_burden_assoc")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // s1 (the one affected sample) is het/hom-alt at BRCA1 1:100,
    // TP53 1:200, and EGFR's 2:300 alts, so aff_carrier = 1 and
    // aff_noncarrier = 0 in every gene; OR denominators follow the
    // unaffected carriers only
    out.foreach { case (g, (ac, an, _, _)) =>
      assert(ac == 1L && an == 0L, s"$g: affected carrier row off")
    }
    assert(out.keySet == Set("BRCA1", "TP53", "EGFR"))
  }

  test("s13 health: occupancies cover the corpus and quantiles are ordered") {
    val r = graft.operators.Similarity.queries("s13_lsh_bucket_stats")(
      spark, "/root/testdata/sf0.001").collect().head
    val (nBuckets, nVectors) = (r.getLong(0), r.getLong(1))
    val (minOcc, maxOcc) = (r.getLong(2), r.getLong(3))
    val (p50, p90) = (r.getDouble(4), r.getDouble(5))
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert(nVectors == corpus, "every vector lands in exactly one bucket")
    assert(nBuckets <= 256 &&
      r.getDouble(6) == math.rint(nBuckets / 256.0 * 1e6) / 1e6)
    assert(minOcc <= p50 && p50 <= p90 && p90 <= maxOcc)
    assert(r.getDouble(7) >= 1.0, "skew = max/mean is >= 1 by definition")
  }
}
