package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Estimator-quality checks for the near-dup family: the MinHash
  * estimate must track exact 3-shingle Jaccard on the pairs it
  * surfaces, and banding must surface every strong pair.
  */
class DedupQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("minhash est_jaccard tracks exact 3-shingle jaccard") {
    import spark.implicits._
    val pairs = Dedup.queries("d02_dedup_minhash")(spark, dir)
    val grams = Tables(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("gs", expr(
        "array_distinct(transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))
      .select($"doc_id", $"gs")
    val joined = pairs
      .join(grams.select($"doc_id".as("doc_a"), $"gs".as("gs_a")), "doc_a")
      .join(grams.select($"doc_id".as("doc_b"), $"gs".as("gs_b")), "doc_b")
      .withColumn("exact", expr(
        "size(array_intersect(gs_a, gs_b)) / CAST(size(gs_a) + size(gs_b) - size(array_intersect(gs_a, gs_b)) AS DOUBLE)"))
      .select($"doc_a", $"doc_b", $"est_jaccard", $"exact")
      .collect()
    assert(joined.nonEmpty, "banding surfaced no candidate pairs")
    val errs = joined.map(r =>
      math.abs(r.getAs[Double]("est_jaccard") - r.getAs[Double]("exact")))
    assert(errs.max <= 0.25, s"worst estimator error ${errs.max}")
    assert(errs.sum / errs.length <= 0.10, "mean estimator error too high")
  }

  test("d14 leakage report is consistent with d02's pair view") {
    import spark.implicits._
    val d14 = Dedup.queries("d14_fuzzy_decontaminate")(spark, dir).collect()
    assert(d14.nonEmpty, "eval roster must always report")
    // the roster is exactly the signature-bearing %50 == 0 docs
    val roster = Tables(spark, dir, "documents")
      .filter($"doc_id" % 50 === 0 && size(split($"text", " ")) >= 3)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(d14.map(_.getLong(0)).toSet == roster)
    d14.foreach { r =>
      val (nc, conf) = (r.getLong(1), r.getLong(2))
      assert(conf <= nc)
      assert((nc == 0) == r.isNullAt(3), "max_est null iff no candidates")
      assert((conf == 0) == r.isNullAt(4), "first_match null iff none confirmed")
    }
    // every d02 pair with exactly one eval-side member and est >= tau
    // must appear as a confirmed hit for that eval doc
    val strong = Dedup.queries("d02_dedup_minhash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        if (a % 50 == 0 ^ b % 50 == 0)
          Some((if (a % 50 == 0) a else b, j)) else None
      }
      .filter(_._2 >= 0.5)
      .groupBy(_._1).view.mapValues(_.length).toMap
    val confirmed = d14.map(r => r.getLong(0) -> r.getLong(2)).toMap
    strong.foreach { case (evalId, n) =>
      assert(confirmed.getOrElse(evalId, 0L) >= n,
        s"eval $evalId: d02 sees $n strong pairs, d14 confirmed ${confirmed.get(evalId)}")
    }
  }

  test("banding surfaces every strong pair (exact jaccard >= 0.5)") {
    import spark.implicits._
    val caught = Dedup.queries("d02_dedup_minhash")(spark, dir)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = Dedup.queries("d04_ngram_jaccard")(spark, dir)
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.nonEmpty)
    // P(miss | j=0.5, 16 bands x 4 rows) ~ (1-0.5^4)^16 = 0.36... so we
    // assert recall on the set, not each pair: bigram-strong pairs are
    // 3-shingle-weaker; require >= 80% recall of the strong set
    val recall = (strong & caught).size.toDouble / strong.size
    assert(recall >= 0.8, s"LSH recall $recall over ${strong.size} strong pairs")
  }

  test("simhash bucket cap keeps adversarial corpora sub-quadratic") {
    import spark.implicits._
    // 1k docs sharing every chunk bucket (identical text): without the
    // cap the self-join emits C(1000,2) = 499,500 pairs on one shuffle
    // key; with it the degenerate buckets drop entirely
    val boiler = (0 until 1000).map(i =>
      (i.toLong, "the same boilerplate text repeated everywhere verbatim"))
    assert(Dedup.d03Pairs(spark, boiler.toDF("doc_id", "text")).count() == 0)
    // a duplicate group under the cap still pairs up fully
    val small = (0 until 30).map(i =>
      (i.toLong, "another duplicated body of text sitting right here"))
    assert(Dedup.d03Pairs(spark, small.toDF("doc_id", "text")).count() == 30 * 29 / 2)
  }

  test("s04 PQ ADC re-rank recalls most of the exact top-10") {
    import graft.operators.Similarity
    def topk(name: String) = Similarity.queries(name)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topk("s01_ann_bruteforce_topk")
    val pq = topk("s04_ann_pq")
    assert(exact.size == 50 && pq.size == 50)
    val recall = (exact & pq).size.toDouble / exact.size
    // 4×16 codebooks on 64 random-ish dims is a coarse quantizer; the
    // 3K-deep exact re-rank recovers most of the true neighbors. The
    // bound is a regression floor, not a benchmark claim.
    assert(recall >= 0.5, s"PQ recall@10 = $recall")
  }

  test("quantizer fit input is bounded to the constant row budget") {
    import graft.operators.Similarity
    val big = spark.range(300000).toDF("id")
    // above the budget: a seeded Bernoulli sample lands near the budget
    val n = Similarity.fitSample(big, budget = 4096L, seed = 7L).count()
    assert(n < 5000 && n > 3300, s"sampled $n rows for a 4096 budget")
    // at or below the budget the frame passes through untouched, so
    // small-scale fits (and their oracle comparisons) are unchanged
    assert(Similarity.fitSample(big, budget = 300000L).count() == 300000L)
    assert(Similarity.fitSample(big, budget = 1000000L).count() == 300000L)
  }

  test("d09 survivors: one per d07 cluster, the max-score member") {
    import spark.implicits._
    val comps = Dedup.queries("d07_dedup_clusters")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val survivors = Dedup.queries("d09_dedup_survivor")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = comps.groupBy(_._2)
    assert(survivors.length == byCluster.size, "one survivor per component")
    survivors.foreach { case (cid, sid, n) =>
      val members = byCluster(cid).map(_._1).toSet
      assert(members.contains(sid), s"survivor $sid outside cluster $cid")
      assert(members.size == n, s"cluster $cid size mismatch")
    }
  }

  test("d11 SemDeDup: kept/dropped is exactly the greedy in-cell cosine partition") {
    val out = Dedup.queries("d11_semantic_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getBoolean(2)))).toMap
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    assert(out.size == emb.size, "every corpus row must appear with a verdict")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    // re-derive the rule from exact cosines, trusting only the CELLS:
    // dropped iff some lower-id same-cell mate reaches tau
    out.foreach { case (id, (cell, kept)) =>
      val hasNearLower = out.exists { case (id2, (cell2, _)) =>
        id2 < id && cell2 == cell && cos(emb(id2), emb(id)) >= 0.45
      }
      assert(kept == !hasNearLower, s"vec $id: kept=$kept but nearLower=$hasNearLower")
    }
    // the synthetic corpus carries real near-dups: some must drop
    assert(out.values.exists(!_._2), "expected at least one semantic duplicate")
  }

  test("s08 MMR picks replay the greedy integer-score selection exactly") {
    val out = graft.operators.Similarity.queries("s08_mmr_rerank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(4)))
      .toMap
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    def cos6(a: Array[Double], b: Array[Double]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.round(1e6 * d / math.sqrt(na * nb))
    }
    val qIds = emb.keys.filter(_ < 3)
    assert(out.size == qIds.size * 5, "3 queries x 5 picks expected")
    qIds.foreach { q =>
      // replay: pool = top-12 by rel6 (vec_id tie-break), then greedy
      val rel = emb.collect { case (id, v) if id != q => id -> cos6(emb(q), v) }
      val pool = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(12)
      var picked = Vector(pool.head._1)
      var scores = Vector(pool.head._2 * 7)
      while (picked.size < 5) {
        val best = pool.filterNot(p => picked.contains(p._1)).map { case (id, r) =>
          val msim = picked.map(s => cos6(emb(id), emb(s))).max
          (id, 7 * r - 3 * msim)
        }.minBy { case (id, sc) => (-sc, id) }
        picked :+= best._1; scores :+= best._2
      }
      picked.zip(scores).zipWithIndex.foreach { case ((id, sc), i) =>
        assert(out((q, i + 1)) == ((id, sc)),
          s"query $q step ${i + 1}: engine ${out((q, i + 1))} vs replay ($id, $sc)")
      }
    }
    // diversity must bite somewhere: across the query set, at least one
    // greedy pick sequence departs from pure-relevance rank order
    // (per-query it may legitimately coincide when the pool is
    // near-orthogonal and the penalty term can't reorder)
    val departed = qIds.exists { q =>
      val rel = emb.collect { case (id, v) if id != q => id -> cos6(emb(q), v) }
      val pureOrder = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(5).map(_._1)
      val mmrOrder = (1 to 5).map(i => out((q, i))._1)
      mmrOrder != pureOrder
    }
    assert(departed, "MMR never departed from pure relevance on any query")
  }

  test("d15 delta dedup verdicts: base_dup, delta_dup, kept") {
    import spark.implicits._
    // base (even ids): doc 0 carries content X; delta (odd ids):
    // 1 repeats X (base_dup), 3 and 5 share fresh content Y (3 keeps,
    // 5 is delta_dup), 7 is unique (kept)
    val docs = Seq(
      (0L, "x x x", "en", "s", 0L), (2L, "base only", "en", "s", 0L),
      (1L, "x x x", "en", "s", 0L), (3L, "y y y", "en", "s", 0L),
      (5L, "y y y", "en", "s", 0L), (7L, "fresh z", "en", "s", 0L))
    val dir = java.nio.file.Files.createTempDirectory("d15").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Dedup.queries("d15_delta_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "base_dup", 3L -> "kept",
      5L -> "delta_dup", 7L -> "kept"))
  }

  test("s12 filtered ANN pre-filters: label-pure results post-filter can't give") {
    val S = graft.operators.Similarity
    val emb = graft.Tables(spark, dir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.get(2)).toMap
    val filtered = S.queries("s12_filtered_ann")(spark, dir).collect()
    // every hit carries its query's label (the predicate actually gates)
    filtered.foreach { r =>
      assert(emb(r.getLong(2)) == r.get(1),
        s"vec ${r.getLong(2)} broke the label filter")
    }
    // pre-filter vs post-filter: the filtered top-10 must reach vectors
    // the UNfiltered top-10 never surfaces (a post-filter of s01 would
    // return fewer than k for selective labels)
    val unfiltered = S.queries("s01_ann_bruteforce_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val beyond = filtered.count(r => !unfiltered((r.getLong(0), r.getLong(2))))
    assert(beyond > 0, "filtered search never looked past the global top-10")
  }

  test("d16 audit: 64-lane minhash estimates track exact jaccard") {
    val rows = graft.operators.Dedup.queries("d16_minhash_audit")(spark, dir)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // 64 lanes → the estimate's std error is sqrt(j(1-j)/64) ≤ 0.0625;
    // allow 4 sigma per pair and a much tighter mean across pairs
    rows.foreach { case (est, exact, err) =>
      assert(err <= 0.25, s"estimate $est vs exact $exact (err $err)")
    }
    val meanErr = rows.map(_._3).sum / rows.length
    assert(meanErr <= 0.10, s"mean |est - exact| = $meanErr")
  }

  test("s11 int8-quantized shortlist recalls nearly all of the exact top-10") {
    val S = graft.operators.Similarity
    def topk(name: String): Map[Long, Set[Long]] =
      S.queries(name)(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
    val exact = topk("s01_ann_bruteforce_topk")
    val sq = topk("s11_ann_scalar_quant")
    // int8 symmetric quantization on 64-dim unit-ish vectors perturbs
    // cosines by ~1e-2 — with a 3×K shortlist the exact re-rank should
    // recover ≥90% of the true top-10 per query
    exact.keys.foreach { q =>
      val r = (exact(q) & sq.getOrElse(q, Set())).size.toDouble / exact(q).size
      assert(r >= 0.9, s"query $q: int8 recall@10 = $r")
    }
  }

  test("s10 multiprobe recall@10 dominates s02 single-probe on every query") {
    val S = graft.operators.Similarity
    def topk(name: String): Map[Long, Set[Long]] =
      S.queries(name)(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
    val exact = topk("s01_ann_bruteforce_topk")
    val h1 = topk("s02_ann_lsh")
    val h2 = topk("s10_ann_multiprobe")
    exact.keys.foreach { q =>
      val r1 = (exact(q) & h1.getOrElse(q, Set())).size
      val r2 = (exact(q) & h2.getOrElse(q, Set())).size
      assert(r2 >= r1, s"query $q: multiprobe recall $r2 < single-probe $r1")
    }
    // wider probing must actually buy recall somewhere (toSeq first:
    // a Set.map would collapse queries with equal hit counts)
    val total1 = exact.keys.toSeq.map(q => (exact(q) & h1.getOrElse(q, Set())).size).sum
    val total2 = exact.keys.toSeq.map(q => (exact(q) & h2.getOrElse(q, Set())).size).sum
    assert(total2 > total1,
      s"Hamming-2 probing bought no recall ($total2 <= $total1)")
  }

  test("s14 composed path: multiprobe recall survives the int8 shortlist") {
    val S = graft.operators.Similarity
    def topk(name: String): Map[Long, Set[Long]] =
      S.queries(name)(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
    val exact = topk("s01_ann_bruteforce_topk")
    val single = topk("s02_ann_lsh")
    val multi = topk("s10_ann_multiprobe")
    val composed = topk("s14_ann_composed")
    // toSeq first: mapping over the key SET would collapse queries
    // with equal hit counts before the sum
    def hits(ap: Map[Long, Set[Long]]) =
      exact.keys.toSeq.map(q => (exact(q) & ap.getOrElse(q, Set())).size).sum
    // per query: the full pipeline must keep multiprobe's dominance
    // over single-probe — the cheap-code stage sits BETWEEN candidate
    // generation and the exact re-rank, so a recall collapse here means
    // the int8 shortlist is mis-sized
    exact.keys.foreach { q =>
      val rc = (exact(q) & composed.getOrElse(q, Set())).size
      val r1 = (exact(q) & single.getOrElse(q, Set())).size
      assert(rc >= r1, s"query $q: composed recall $rc < single-probe $r1")
    }
    // corpus-wide: the 3xK shortlist may cost at most 2 of multiprobe's
    // hits to quantization, and the measured floor stays pinned
    // (measured on this frame: composed = multiprobe = 19/50 = 0.38)
    assert(hits(composed) >= hits(multi) - 2,
      s"int8 shortlist destroyed multiprobe recall: " +
        s"${hits(composed)} < ${hits(multi)} - 2")
    val total = hits(composed).toDouble / exact.values.map(_.size).sum
    assert(total >= 0.35, s"composed recall@10 = $total, floor 0.35")
  }

  test("blocked d05 is a subset of exact pairs with identical cosines") {
    val blocked = Dedup.queries("d05_dedup_embedding")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Dedup.d05Exact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(blocked.nonEmpty, "blocking surfaced no pairs")
    // precision 1.0: every blocked pair is a true ≥τ pair, same cosine
    blocked.foreach { case (k, cos) =>
      assert(exact.get(k).contains(cos), s"blocked pair $k not exact-confirmed")
    }
    val recall = blocked.size.toDouble / exact.size
    assert(recall >= 0.25,
      s"d05 Hamming-1 blocking recall $recall over ${exact.size} exact pairs")
  }
}
