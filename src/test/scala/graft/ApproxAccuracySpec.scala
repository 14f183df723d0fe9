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

  test("t19 bigram LM penalizes scrambled word order; t10 unigram cannot") {
    import spark.implicits._
    // 30 fluent docs sharing phrase structure build the corpus LM; one
    // probe doc is a natural member, its twin the SAME token multiset
    // deterministically reversed — identical unigram stats, broken
    // bigrams
    val phrase = "the quick brown fox jumps over the lazy dog near the old stone bridge"
    val fluent = (0 until 30).map { i =>
      (i.toLong, s"$phrase in the quiet town number $i", "en", "web",
        0L)
    }
    val natural = (100L, phrase, "en", "web", 0L)
    val scrambled = (101L, phrase.split(" ").reverse.mkString(" "), "en", "web", 0L)
    val dir = java.nio.file.Files.createTempDirectory("t19lm").toString
    (fluent :+ natural :+ scrambled)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t19 = graft.operators.Text.queries("t19_bigram_logprob")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val t10 = graft.operators.Text.queries("t10_unigram_logprob")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // reversal preserves the token multiset → unigram score identical
    assert(math.abs(t10(100L) - t10(101L)) < 1e-12,
      s"unigram must not distinguish: ${t10(100L)} vs ${t10(101L)}")
    // the bigram LM must cleanly separate fluent from scrambled
    assert(t19(100L) > t19(101L) + 0.5,
      s"bigram LM failed to separate: natural ${t19(100L)} vs scrambled ${t19(101L)}")
  }

  test("t22 strips a per-source template banner, keeps rare lines") {
    import spark.implicits._
    // srcA: 10 docs, each = the SAME 10-token banner + unique tail
    // (banner df = 10/10 docs → boilerplate); srcB: 10 docs, banner in
    // only ONE (df=1 < BoilerMinDocs → kept). Tails are 10 distinct
    // tokens so each forms its own chunk and never repeats.
    val banner = (1 to 10).map(i => s"nav$i").mkString(" ")
    val a = (0 until 10).map { i =>
      (i.toLong, banner + " " + (1 to 10).map(j => s"a${i}x$j").mkString(" "),
        "en", "srcA", 0L)
    }
    val b = (10 until 20).map { i =>
      val body = (1 to 10).map(j => s"b${i}x$j").mkString(" ")
      val text = if (i == 10) banner + " " + body else body
      (i.toLong, text, "en", "srcB", 0L)
    }
    val dir = java.nio.file.Files.createTempDirectory("t22").toString
    (a ++ b).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Text.queries("t22_boilerplate_trim")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // every srcA doc loses exactly the banner chunk (1 of its 2 lines)
    (0L until 10L).foreach { id =>
      assert(out(id) == ((2L, 1L)), s"srcA doc $id: ${out(id)}")
    }
    // srcB's lone banner instance is below the df threshold — all kept
    (10L until 20L).foreach { id =>
      assert(out(id)._2 == 0L, s"srcB doc $id must keep all lines")
    }
  }

  test("q24 ship-delay histogram partitions the joined fact rows") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Relational.queries("q24_ship_delay")(spark, dir).collect()
    // bucket counts partition the join: sum of n_lines = |lineitem ⋈ orders|
    val joined = graft.Tables(spark, dir, "lineitem")
      .join(graft.Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(out.map(_.getLong(2)).sum == joined)
    // every row's avg lies inside its own week bucket's day range
    out.foreach { r =>
      val (wk, avg) = (r.getInt(1), r.getDouble(3))
      assert(avg >= wk * 7.0 && avg < wk * 7.0 + 7.0,
        s"avg $avg outside week-$wk bounds")
    }
  }

  test("t23 entropy flags token-loop spam the length/stopword gates pass") {
    import spark.implicits._
    // spam: 60 tokens but only 3 distinct, arranged so stopwords appear
    // (t01/t15-passable); diverse: 60 distinct tokens
    val spam = (0 until 20).flatMap(_ => Seq("the", "buy", "now")).mkString(" ")
    val diverse = (0 until 60).map(i => s"w$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("t23").toString
    Seq((1L, spam, "en", "s", 0L), (2L, diverse, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Text.queries("t23_word_entropy")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out(1L)._2, s"spam must flag low_diversity: ${out(1L)}")
    assert(!out(2L)._2 && out(2L)._1 > 0.99,
      s"60 distinct tokens ~ maximal diversity: ${out(2L)}")
    // entropy of the 3-symbol loop is log2(3) = 1.585 bits
    val spamH = graft.operators.Text.queries("t23_word_entropy")(spark, dir)
      .collect().find(_.getLong(0) == 1L).get.getDouble(3)
    assert(math.abs(spamH - math.log(3) / math.log(2)) < 1e-4, s"H=$spamH")
  }

  test("t24 confusion matrix partitions the corpus with unit row shares") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.operators.Text.queries("t24_langid_eval")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val total = graft.Tables(spark, dir, "documents").count()
    assert(rows.map(_._3).sum == total, "matrix must partition the corpus")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val s = cells.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$lang shares sum to $s")
    }
  }

  test("t20 flags injected code, not the prose corpus") {
    import spark.implicits._
    val code =
      "def main(argv): { int x = 0; for (i = 0; i < 10; i++) { x += fooBar(i); } return x; }"
    val prose = "the committee reviewed the annual report and approved the budget for next year"
    val docs = Seq((1L, code, "en", "gh", 0L), (2L, prose, "en", "web", 0L))
    val dir = java.nio.file.Files.createTempDirectory("t20").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Text.queries("t20_code_detect")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out(1L), "code snippet must flag is_code")
    assert(!out(2L), "prose must not flag is_code")
    // the real corpus is prose: no false positives at sf0.001
    val corpus = graft.operators.Text.queries("t20_code_detect")(
      spark, "/root/testdata/sf0.001").collect()
    assert(corpus.count(_.getBoolean(6)) == 0,
      "synthetic prose corpus should carry no code flags")
  }
}
