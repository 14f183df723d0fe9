package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Scale

class ScaleSpec extends SparkSpec {

  test("bucketed tables join without any Exchange") {
    import spark.implicits._
    val base = Files.createTempDirectory("bucketed").toString
    val left = (1 to 10000).map(i => (i.toLong, i * 2)).toDF("k", "a")
    val right = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("k", "b")
    Scale.writeBucketed(left, "bkt_left", s"$base/l", "k", 8)
    Scale.writeBucketed(right, "bkt_right", s"$base/r", "k", 8)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("salted count-distinct equals the direct aggregate") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val direct = events.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_distinct"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Scale.saltedCountDistinct(events, col("event_type"), col("user_id"))
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted == direct)
  }

  test("salted sum equals the direct aggregate (exact decimal)") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .withColumn("qty", col("l_quantity").cast("decimal(12,2)"))
    val direct = li.groupBy(col("l_returnflag")).agg(sum(col("qty")).as("total"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDecimal(1))).toSeq
    val salted = Scale.saltedSum(li, col("l_returnflag"), col("qty"))
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getDecimal(1))).toSeq
    assert(salted == direct)
  }

  test("range-sorted layout yields disjoint per-file key ranges and pushdown") {
    import spark.implicits._
    val path = Files.createTempDirectory("rangesorted").resolve("t").toString
    val chroms = Seq("1", "2", "3", "X")
    val df = (1 to 20000).map { i =>
      (chroms(i % 4), (i * 37 % 50000).toLong, s"payload$i")
    }.toDF("chrom", "pos", "payload")
    Scale.writeRangeSorted(df, path, 8, col("chrom"), col("pos"))

    val back = spark.read.parquet(path)
    assert(back.count() == 20000)

    // per-file (chrom,pos) ranges must not overlap — the property that
    // lets parquet min/max prune whole files for a region predicate
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min(struct(col("chrom"), col("pos"))).as("lo"),
        max(struct(col("chrom"), col("pos"))).as("hi"))
      .collect()
      .map(r => (r.getStruct(1).getString(0), r.getStruct(1).getLong(1),
        r.getStruct(2).getString(0), r.getStruct(2).getLong(1)))
      .sortBy(t => (t._1, t._2))
    assert(ranges.length > 1)
    val ord = Ordering.Tuple2(Ordering.String, Ordering.Long)
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(ord.lteq((a._3, a._4), (b._1, b._2)),
        s"file ranges overlap: $a vs $b")
    }

    // a region query over the layout pushes both predicates to the scan
    val q = back.filter(col("chrom") === "2" && col("pos") >= 1000 && col("pos") <= 2000)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(chrom,2)"))
    assert(q.count() ==
      df.filter(col("chrom") === "2" && col("pos") >= 1000 && col("pos") <= 2000).count())
  }

  test("e36 MDS kernel at a real cohort width (96 samples x 2k sites)") {
    // the cohort²/2 aggregate key is e36's inherent hotspot (SURVEY §5):
    // this pins that a non-toy cohort — 4560 pair keys over ~9.1M
    // exploded pair rows — completes locally and stays exact, so the
    // documented subsampling remedy has a measured baseline to beat
    val n = 96; val m = 2000
    val samples = (0 until n).map(i => f"p$i%02d")
    // classes drawn from {0,1,3} (no unknowns → every pair sees all m
    // sites); samples 0 and 1 get IDENTICAL genotypes → distance 0
    // carries (chrom, pos) so the maxSites knob below keys its sample
    // on site IDENTITY — this fixture has only 3 distinct gt_types
    // patterns, where a content-hash key would tie pathologically
    val variants = spark.range(m).select(
      lit("1").as("chrom"), col("id").as("pos"),
      expr(
        s"""transform(sequence(0, ${n - 1}), s ->
           |  element_at(array(0, 1, 3),
           |    CAST(pmod(id * 31 + greatest(s, 1) * 7919, 3) AS INT) + 1))"""
          .stripMargin).as("gt_types"))
    val t0 = System.nanoTime()
    val got = graft.operators.Stats.mdsDistances(spark, variants, samples)
      .collect()
    info(f"96x2k MDS wall: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    assert(got.length == n * (n - 1) / 2)
    assert(got.forall(_.getAs[Long]("n_sites") == m.toLong))
    val d01 = got.find(r => r.getAs[String]("sample_a") == "p00" &&
      r.getAs[String]("sample_b") == "p01").get.getAs[Double]("distance")
    assert(d01 == 0.0)
    assert(got.exists(_.getAs[Double]("distance") > 0.5))

    // the biobank remedy AS A KNOB: maxSites bounds the per-pair cost
    // deterministically. At two rates: full pair matrix retained, each
    // pair sees exactly k sites, identical-genotype pair stays at 0,
    // the subsampled estimate tracks the exact all-sites distance, and
    // a rerun reproduces the same numbers (no RNG in the sample).
    val exact = got.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Double]("distance")).toMap
    for (k <- Seq(500, 1000)) {
      val sub = graft.operators.Stats
        .mdsDistances(spark, variants, samples, maxSites = Some(k)).collect()
      assert(sub.length == n * (n - 1) / 2)
      assert(sub.forall(_.getAs[Long]("n_sites") == k.toLong))
      val s01 = sub.find(r => r.getString(0) == "p00" && r.getString(1) == "p01")
        .get.getAs[Double]("distance")
      assert(s01 == 0.0, s"identical pair must stay 0 at maxSites=$k")
      val maxDrift = sub.iterator.map(r =>
        math.abs(r.getAs[Double]("distance") -
          exact((r.getString(0), r.getString(1))))).max
      assert(maxDrift < 0.5, f"maxSites=$k estimate drifted $maxDrift%.3f")
      val rerun = graft.operators.Stats
        .mdsDistances(spark, variants, samples, maxSites = Some(k)).collect()
      assert(rerun.map(_.toSeq).sameElements(sub.map(_.toSeq)),
        s"maxSites=$k subsample must be deterministic across runs")
    }
  }
}
