package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline sf-scaling queries, one warmup pass
  * (JIT + codegen + broadcast build amortized out, the steady-state a
  * long-lived cluster job actually runs at) then MULTIPLE timed passes,
  * fully materialized through the noop sink (every column computed —
  * `count()` would let Spark skip work). Every OTHER registered query
  * gets a tier-2 record too: one shared warmup pass then min-of-2
  * timed passes, so the whole surface has REPRODUCIBLE numbers each
  * round (a single cold pass reads as a phantom 2–4x regression on an
  * unchanged plan).
  *
  * Every pass (warmup included) is reported in the JSON so environment
  * contention is distinguishable from a real plan regression: `queries`
  * carries the per-query MIN across timed passes (the reproducible
  * cost), `passes` carries each pass verbatim, `warmup` the first run.
  */
object Bench {
  /** Queries whose input grows with sf, plus the shuffle-bearing
    * LLM-pipeline operators (dedup/ANN/sampling run on the fixed-size
    * document/embedding tables at every sf — their timings don't scale
    * with sf but are tracked here so a plan regression in the candidate
    * joins is visible round over round).
    */
  private val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_topk_orders",
    "q04_order_priority_semijoin", "q05_customer_no_orders_antijoin",
    "q06_selective_filter", "q07_window_running_total",
    "q08_rollup_status_priority", "q09_distinct_users_per_type",
    "q10_orders_by_month", "q11_group_percentiles", "q14_asof_join",
    "q15_cube_status_priority", "q16_funnel", "q17_salted_distinct",
    "q18_topk_per_group",
    "st01_window_agg", "st02_sessionize", "st03_dedup_events",
    "st04_interval_join", "st06_rate_anomaly",
    "e01_flatten_info", "e08_pack_blob", "e29_windower",
    // GEMINI stats-family representatives: fixture-cohort-sized (their
    // inputs don't scale with sf), tracked so a plan regression — e36's
    // cohort²/2 aggregate key especially — shows up as a timing step
    "e30_hwe", "e33_burden_calpha", "e36_mds", "e49_tped",
    "d02_dedup_minhash", "d04_ngram_jaccard", "d05_dedup_embedding",
    "d07_dedup_clusters", "d10_substring_dedup", "d11_semantic_dedup",
    "d12_dup_downweight",
    "s01_ann_bruteforce_topk", "s02_ann_lsh", "s06_knn_graph",
    "s07_diversity_sample",
    "s08_mmr_rerank", "s09_ann_recall",
    "t07_stratified_sample", "t08_pii_scrub", "t10_unigram_logprob",
    "t12_seq_pack", "t13_line_dedup", "t14_tfidf", "t15_gopher_rules",
    "t17_temperature_mix", "t18_heavy_hitters", "d13_source_overlap",
    "t19_bigram_logprob", "t20_code_detect", "m07_phash_dedup",
    "q22_revenue_deciles",
    // round-7 additions that shuffle or scale with sf: q24 is the
    // suite's one fact-fact join; st08 windows the whole event stream;
    // t22's df shuffle and s11's quantized scan track plan regressions
    "q24_ship_delay", "st08_latest_state", "t22_boilerplate_trim",
    "s11_ann_scalar_quant",
    "q25_value_concentration", "q26_price_standing", "st09_disorder_audit",
    "st10_attribution_outer", "d15_delta_dedup", "t23_word_entropy",
    "m09_shard_pack", "q27_nation_trade", "q28_rolling_actives",
    "t25_source_quality",
    // round-8 additions that scale with sf: q29's fact collapse +
    // order-keyed window, st11's windowed counts over the event stream
    "q29_sole_return_supplier", "st11_window_topk",
    // late round-8 additions: the Q20/Q2/Q22/MoM fact collapses, the
    // sessionized funnel's event-stream windows, t29's gram-keyed
    // novelty join, e59's iterative pointer-doubling joins
    "q30_excess_share_supplier", "q31_min_cost_supplier",
    "q32_dormant_capital", "q33_mom_growth", "st12_session_funnel",
    "t29_ngram_novelty", "e59_generation_depth",
    // final round-8 batch: q34's fact⋈growing-dim mode, st13's
    // session→day rollup, t30's token-shuffle + per-source rank window
    "q34_modal_priority", "st13_bounce_rate", "t30_zipf_slope",
    // round-9 additions (never timed in round 9 — the bench died on a
    // compile error): the pivot/unpivot reshapes, q37's event anti-join
    // audience, q38's min_by/max_by lifecycle, q39's two-phase MAD,
    // t31's shuffle-free chunker, t32's posting expansion + broadcast
    // corpus stats, e63's constant-width cohort-merge shuffle
    "q35_pivot_matrix", "q36_unpivot", "q37_browse_only_days",
    "q38_order_span", "q39_mad", "t31_rag_chunk", "t32_bm25",
    "e63_cohort_merge",
    // round-10: d18's bloom screen-then-confirm vs d15's full-delta join
    "d18_bloom_delta",
    // round-11: the four keys registered after the r10 bench ran —
    // q40's nation-window Pareto, s14's composed serving path, t33's
    // gram-df corpus join, st14's user-window churn audit
    "q40_cust_pareto", "s14_ann_composed", "t33_dup_gram_fraction",
    "st14_upsert_churn",
    // d19: the sharded-filter form of d18 — tracked beside it so the
    // literal-vs-frame probe overhead stays visible round over round
    "d19_bloom_sharded",
    // round-11 additions: d20's near-dup delta screen (the banded
    // index probe), d21's split-leakage audit (d02 + split columns),
    // s15's index-upsert occupancy audit
    "d20_delta_minhash", "d21_split_leakage", "s15_index_upsert",
    // round-12 promotions (r11 verdict ask #5): d22's rare-shingle
    // candidate join is exactly the regression class the headline set
    // watches; t34's token shuffle + top-V + broadcast scoring join is
    // t10's regime with a second class column
    "d22_containment", "t34_quality_classifier",
    // round-12 addition: d23's delta-probe gram join (d22's class with
    // the parity split) — t35 is a join-free scan, tier-2 suffices
    "d23_containment_delta",
    // q41's customer⋈orders fact join + double aggregate scales with
    // sf — the headline's regression class
    "q41_custdist",
    // round-13 promotions (r12 verdict ask #3): d16/d17 are real banded
    // audit operators whose tier-2 single-pass numbers read as phantom
    // 2x regressions; d24 is the banded-index health scan — all three
    // now carry min-of-3 evidence
    "d16_minhash_audit", "d17_threshold_sweep", "d24_index_stats",
    // round-14: s17 audits the auto-sized LSH geometry (one corpus
    // scan + constant-key combine — s13's regression class); s18's
    // index-vs-batch bucket join is the banded-join regression class
    "s17_lsh_geometry", "s18_vec_index_probe",
    // round-15: the designated CPU-scaling probe (iterated hash chain,
    // per-row compute × rows/cores) — the one key whose 8-vs-32-core
    // ratio is designed to move at bench SF, so the driver can decide
    // "cpus honored?" from output instead of inferring it
    "q42_pseudonym_digest")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Dev aid: SPARK_GRAFT_BENCH_ONLY=e08_pack_blob,q01_pricing_summary
    // restricts the run to the named queries (driver leaves it unset).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val bench = headline.filter(n => only.forall(_.contains(n)))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      // label the jobs (guide §1.5) so an event log / UI of a bench run
      // maps stages back to keys; thread-local, cleared after the run
      spark.sparkContext.setJobDescription(s"bench: $name")
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      finally spark.sparkContext.setJobDescription(null)
      (System.nanoTime() - t0) / 1e9
    }

    def jsonMap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) =>
        // Locale.ROOT: a comma-decimal default locale would otherwise
        // emit 1,234 and break the line-is-JSON bench contract
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      }.mkString("{", ",", "}")

    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    require(nPasses >= 1, s"SPARK_GRAFT_BENCH_PASSES must be >= 1, got $nPasses")
    val warmup = bench.map(n => n -> run(n)) // JIT, codegen cache, file listing
    val passes = (1 to nPasses).map(_ => bench.map(n => n -> run(n)))
    // min across timed passes = the reproducible cost of the plan; the
    // per-pass spread (visible in `passes`) is the environment's noise.
    val best = bench.map(n => n -> passes.map(_.toMap.apply(n)).min)
    val total = best.map(_._2).sum
    val passesJson = passes.map(jsonMap).mkString("[", ",", "]")
    // TIER 2: every registered query outside the 3-pass headline set
    // gets one shared warmup pass then TWO timed runs, min reported —
    // round 12's single cold pass produced phantom 2–4x "regressions"
    // on unchanged plans (e02/e03/e04/e18/e25), so the record was
    // useless for regression detection. Skipped in
    // SPARK_GRAFT_BENCH_ONLY dev runs; SPARK_GRAFT_BENCH_TIER2=0
    // disables it explicitly.
    val tier2on = only.isEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_BENCH_TIER2", "1") != "0"
    val tier2Keys =
      if (tier2on) SparkEntry.queries.keys.toSeq.sorted.filterNot(headline.toSet)
      else Seq.empty
    val tier2Warmup = tier2Keys.map(n => n -> run(n))
    val tier2Passes = (1 to 2).map(_ => tier2Keys.map(n => n -> run(n)))
    val tier2 = tier2Keys.map(n =>
      n -> tier2Passes.map(_.toMap.apply(n)).min)
    val tier2Total = tier2.map(_._2).sum
    // PHASE SPLIT for the MLlib-fit operators (round-8 verdict ask #6):
    // their composite timings are ~all constant-size quantizer fitting
    // at toy SF, which hides query-path regressions. Time the bounded
    // fit and the corpus scan separately so `s04_query` is comparable
    // round over round while `s04_fit` amortizes away at scale.
    val phases: Seq[(String, Double)] =
      if (tier2on) {
        def timed[A](f: => A): (A, Double) = {
          val t0 = System.nanoTime(); val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        try {
          val (m3, fit3) = timed(operators.Similarity.s03Fit(spark, sfDir))
          val (_, q3) = timed(noop(operators.Similarity.s03Scan(spark, sfDir, m3)))
          val (m4, fit4) = timed(operators.Similarity.s04Fit(spark, sfDir))
          val (_, q4) = timed(noop(operators.Similarity.s04Scan(spark, sfDir, m4)))
          val (m11, fit11) = timed(operators.Dedup.d11Fit(spark, sfDir))
          val (_, q11) = timed(noop(operators.Dedup.d11Scan(spark, sfDir, m11)))
          // d20's production split: index build+persist vs the probe
          // from the RELOADED parquet index — the probe number is the
          // per-delta cost the incremental design actually pays.
          val idxDir = java.nio.file.Files
            .createTempDirectory("graft-bench-d20idx").toString
          val (_, idx20) = timed(operators.Dedup.d20Index(spark, sfDir)
            .write(idxDir))
          val reloaded = operators.Dedup.MinhashIndex.load(spark, idxDir)
          val delta = Tables(spark, sfDir, "documents")
            .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
          val (_, p20) = timed(noop(operators.Dedup.d20Probe(reloaded, delta)))
          Seq("s03_fit" -> fit3, "s03_query" -> q3,
            "s04_fit" -> fit4, "s04_query" -> q4,
            "d11_fit" -> fit11, "d11_query" -> q11,
            "d20_index" -> idx20, "d20_probe" -> p20)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] phase split failed: ${e.getMessage}")
            Seq.empty
        }
      } else Seq.empty
    // JOB-LEVEL timings (round-13 verdict ask #5): the two product
    // jobs ran only as PLANS.md prose wall-times before, so a job
    // regression was not machine-detected. Same configs as the quoted
    // round-12 runs (every optional CurateCorpus stage on; delta =
    // odd docs probed against the even-doc index with grams), timed
    // in-process so the number is the job, not sbt/JVM startup.
    // gate.sh asserts these keys exist in BENCH_FULL.json.
    val jobs: Seq[(String, Double)] =
      if (tier2on) {
        try {
          def timedJob[A](f: => A): Double = {
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }
          val docs = Tables(spark, sfDir, "documents")
          val tmp = java.nio.file.Files
            .createTempDirectory("graft-bench-jobs").toString
          val tCorpus = timedJob(CurateCorpus.run(docs, s"$tmp/corpus",
            routeCode = true, trimBoilerplate = true,
            containment = Some(0.6), auditLeakage = true))
          val base = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
          val delta = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
          val tIdx = timedJob(CurateDelta.buildIndex(base, s"$tmp/idx",
            withGrams = true))
          val tDelta = timedJob(CurateDelta.run(delta, s"$tmp/idx",
            s"$tmp/delta", containment = Some(0.6)))
          Seq("job_curate_corpus" -> tCorpus,
            "job_delta_index" -> tIdx,
            "job_curate_delta" -> tDelta)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] job timing failed: ${e.getMessage}")
            Seq.empty
        }
      } else Seq.empty
    // Stop Spark BEFORE printing so its shutdown logging can't land
    // after the JSON: the driver reads the bench line from the END of
    // stdout, and anything printed below it breaks the parse.
    spark.stop()
    // COMPLETE record (full names, warmup, every pass, tier-2, phase
    // splits) → BENCH_FULL.json, committed each round. The stdout line
    // must fit the driver's 2000-char tail TO PARSE AT ALL (round 11's
    // BENCH_r11.json came back `parsed: null` once the headline set hit
    // 98 keys), so stdout carries only totals + per-query mins under
    // the unique family-number prefix ("q01_pricing_summary" → "q01");
    // BENCH_FULL.json maps prefixes back to full names.
    val tier2Json =
      if (tier2on)
        s""""tier2_total":${String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(tier2Total))},"tier2":${jsonMap(tier2)},""" +
          s""""tier2_warmup":${jsonMap(tier2Warmup)},""" +
          s""""tier2_passes":${tier2Passes.map(jsonMap).mkString("[", ",", "]")},""" +
          (if (phases.nonEmpty) s""""phases":${jsonMap(phases)},""" else "") +
          (if (jobs.nonEmpty) s""""jobs":${jsonMap(jobs)},""" else "")
      else ""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","cpus":$cpus,"warmup":${jsonMap(warmup)},"passes":$passesJson,$tier2Json"queries":${jsonMap(best)}}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_FULL.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_FULL.json write failed: ${e.getMessage}")
    }
    def short(n: String): String = n.takeWhile(_ != '_')
    val shorts = best.map { case (k, v) => short(k) -> v }
    val compact =
      if (shorts.map(_._1).distinct.size == shorts.size) shorts
      else best // prefix collision (new naming family?): full names win
    val tier2TotalJson =
      if (tier2on)
        s""""tier2_total":${String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(tier2Total))},"""
      else ""
    val totalStr = String.format(java.util.Locale.ROOT, "%.3f", Double.box(total))
    // "cpus" echoes the RESOLVED core count so the driver's scaling
    // check can tell "env var ignored" from "overhead-bound at this
    // sf" straight from the output (round-14 verdict ask #2)
    val line =
      s"""{"metric":"total","value":$totalStr,"unit":"sec","sf":"$sfDir","cpus":$cpus,${tier2TotalJson}"full":"BENCH_FULL.json","queries":${jsonMap(compact)}}"""
    if (line.length > 1900)
      System.err.println(s"[bench] stdout line ${line.length} chars — " +
        "nearing the driver's 2000-char tail; trim the headline set")
    println(line)
    System.out.flush()
  }
}
