package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Etl.VcfFixture
import graft.sources.{PedSource, VcfReader}

/** GEMINI's burden-analysis tool family (SURVEY.md §2.2), Spark-first:
  * `lof_sieve` (loss-of-function carrier listing), the default
  * per-gene-per-sample burden matrix, and `burden --calpha` (the
  * C-alpha rare-variant association test of Neale et al., PLoS
  * Genetics 2011 — the statistic GEMINI computes from case/control
  * alt-allele counts).
  *
  * All three run the real VCF reader + PED pedigree over the embedded
  * fixture (sf-independent, bit-exact oracles). Scale shapes:
  * carriers come from ONE posexplode of the packed gt_types array
  * filtered to carrier classes (fan-out = carriers-per-site, never
  * cohort x variants), impacts join on the (chrom, pos, alt) key, and
  * every aggregate output is gene- or gene-x-sample-dim-sized.
  */
object Burden {

  /** VEP consequence terms GEMINI's lof_sieve treats as LoF. */
  val lofConsequences: Seq[String] = Seq(
    "stop_gained", "frameshift_variant",
    "splice_acceptor_variant", "splice_donor_variant")

  /** Long-form carriers: one row per (variant, carrier sample) with the
    * genotype class and alt-allele copy count (het=1, hom_alt=2).
    */
  def carriers(s: SparkSession, variants: DataFrame,
               samples: Seq[String]): DataFrame = {
    import s.implicits._
    variants
      .select($"chrom", $"pos", $"alt",
        posexplode($"gt_types").as(Seq("six", "gt_class")))
      .filter($"gt_class".isin(1, 3))
      .select($"chrom", $"pos", $"alt", $"gt_class",
        element_at(typedLit(samples), $"six" + 1).as("sample"),
        when($"gt_class" === 1, 1).otherwise(2).as("copies"))
  }

  /** e31: gemini `lof_sieve` — every loss-of-function impact paired
    * with the samples carrying the alt allele. The LoF filter is a
    * selective IN over the impacts table (pushes to its scan); the
    * carrier explode fans out only for LoF sites.
    */
  def e31(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (h, variants, impacts) = VcfReader.fromLines(s, VcfFixture.lines)
    val lof = impacts
      .filter($"consequence".isin(lofConsequences: _*))
      .select($"chrom", $"pos", $"ref", $"alt", $"symbol", $"biotype",
        $"consequence", $"impact_severity")
    lof.join(carriers(s, variants, h.samples), Seq("chrom", "pos", "alt"))
      .select($"chrom", $"pos", $"ref", $"alt", $"symbol", $"biotype",
        $"consequence", $"impact_severity", $"sample", $"gt_class")
      .orderBy($"chrom", $"pos", $"alt", $"consequence", $"sample")
  }

  /** e32: gemini `burden` default mode — per (gene, sample) count of
    * distinct MED/HIGH-severity variants the sample carries. Long form
    * rather than a pivoted matrix: (gene, sample) is the scalable
    * output key (a pivot would put the whole cohort on one row).
    */
  def e32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (h, variants, impacts) = VcfReader.fromLines(s, VcfFixture.lines)
    val damaging = impacts
      .filter($"impact_severity".isin("MED", "HIGH"))
      .select($"chrom", $"pos", $"alt", $"symbol").distinct()
    damaging.join(carriers(s, variants, h.samples), Seq("chrom", "pos", "alt"))
      .groupBy($"symbol", $"sample")
      .agg(countDistinct($"chrom", $"pos", $"alt").as("n_variants"))
      .orderBy($"symbol", $"sample")
  }

  // -------------------------------------------------------------- C-alpha

  /** Left fold over the integer sequence [from, to] — the one construct
    * the two engines spell differently. Spark: `aggregate(sequence)`.
    * DuckDB: `list_reduce` seeds its accumulator with the FIRST list
    * element, so the init value is prepended (list type unification
    * turns the elements into DOUBLEs — bodies must CAST the element
    * var back when an integer is needed; the values are tiny integers,
    * so the round-trip is lossless). Same elementary IEEE ops on the
    * same operands in the same order on both sides.
    */
  private def fold(duck: Boolean, from: String, to: String, init: String,
                   acc: String, x: String, body: String): String =
    if (duck)
      s"list_reduce(list_prepend(CAST($init AS DOUBLE), range($from, ($to) + 1)), ($acc, $x) -> $body)"
    else
      s"aggregate(sequence($from, $to), CAST($init AS DOUBLE), ($acc, $x) -> $body)"

  /** The C-alpha per-variant pieces over y = alt copies in cases and
    * n = alt copies overall at binomial proportion p0 (Neale 2011):
    *
    *   term    = (y - n*p0)^2 - n*p0*(1-p0)            — contributes T
    *   var_sum = sum_{u=0}^{n} g(u)^2 * pmf(u | n, p0)  — contributes c
    *
    * Emitted for BOTH engines from one builder so the formulas cannot
    * drift. With a dyadic p0 (cases/samples = k/2^m, e.g. 1/4 here)
    * every intermediate is an exactly representable dyadic rational —
    * bit-identical across engines regardless of evaluation order. pmf
    * uses factorial-based binomial coefficients (exact longs for the
    * n <= 20 a small cohort produces; a biobank-scale run would switch
    * to the log-gamma form and accept 1-ulp noise, which a test
    * statistic tolerates) and REPEATED MULTIPLICATION for p^u and
    * q^(n-u) — `pow` is not correctly rounded in either engine and is
    * banned from this path.
    */
  private def calphaPieces(duck: Boolean, p0: String): Seq[(String, String)] = {
    val q = s"(1.0e0 - $p0)"
    val ui = if (duck) "CAST(u AS INTEGER)" else "u"
    def powBy(base: String, k: String) =
      s"(CASE WHEN $k = 0 THEN 1.0e0 ELSE " +
        fold(duck, "1", k, "1.0e0", "a", "j", s"a * $base") + " END)"
    val g = s"((CAST($ui AS DOUBLE) - CAST(n AS DOUBLE) * $p0) " +
      s"* (CAST($ui AS DOUBLE) - CAST(n AS DOUBLE) * $p0) " +
      s"- CAST(n AS DOUBLE) * $p0 * $q)"
    val pmf = s"(CAST(factorial(n) AS DOUBLE) " +
      s"/ (CAST(factorial($ui) AS DOUBLE) * CAST(factorial(n - $ui) AS DOUBLE)) " +
      s"* ${powBy(p0, ui)} * ${powBy(q, s"(n - $ui)")})"
    Seq(
      "term" -> (s"((CAST(y AS DOUBLE) - CAST(n AS DOUBLE) * $p0) " +
        s"* (CAST(y AS DOUBLE) - CAST(n AS DOUBLE) * $p0) " +
        s"- CAST(n AS DOUBLE) * $p0 * $q)"),
      "var_sum" -> fold(duck, "0", "n", "0.0e0", "acc", "u",
        s"acc + $g * $g * $pmf"))
  }

  /** e33: gemini `burden --calpha` — the C-alpha test statistic T, its
    * variance c, and Z = T / sqrt(c) per gene; cases vs controls from
    * the PED phenotype column (2 = affected). One carrier explode, one
    * (chrom,pos,alt)-keyed join to gene labels, one gene-keyed partial
    * agg: gene-dim-sized output at any cohort size. The p-value is
    * left to the caller (it needs erfc, absent in DuckDB; Z > 1.645 is
    * the one-sided 5% bar).
    */
  def e33(s: SparkSession, dir: String): DataFrame = {
    val ped = PedSource.fromLines(s, VcfFixture.pedLines)
    val cases = ped.filter(col("phenotype") === "2")
      .select("sample_id").collect().map(_.getString(0)).toSet
    calpha(s, cases, ped.count().toInt)
  }

  def calpha(s: SparkSession, cases: Set[String], nSamples: Int): DataFrame = {
    import s.implicits._
    require(isDyadic(nSamples / gcd(cases.size, nSamples)),
      "bit-exact oracle sharing needs a dyadic p0 = cases/samples")
    val (h, variants, impacts) = VcfReader.fromLines(s, VcfFixture.lines)
    val p0 = s"(CAST(${cases.size} AS DOUBLE) / CAST($nSamples AS DOUBLE))"
    val genes = impacts.select($"chrom", $"pos", $"alt", $"symbol").distinct()
    var df = carriers(s, variants, h.samples)
      .withColumn("case_copies",
        when($"sample".isin(cases.toSeq: _*), $"copies").otherwise(0))
      .groupBy($"chrom", $"pos", $"alt")
      .agg(sum($"case_copies").cast("int").as("y"),
        sum($"copies").cast("int").as("n"))
      .join(genes, Seq("chrom", "pos", "alt"))
    calphaPieces(duck = false, p0).foreach { case (nm, sql) =>
      df = df.withColumn(nm, expr(sql))
    }
    df.groupBy($"symbol")
      .agg(sum($"term").as("t_stat"), sum($"var_sum").as("c_var"))
      .withColumn("z_score", expr("t_stat / sqrt(c_var)"))
      .orderBy($"symbol")
  }

  private def isDyadic(d0: Int): Boolean = {
    var d = d0
    while (d % 2 == 0) d /= 2
    d == 1
  }
  private def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)

  // ---------------------------------------------------------------- oracles

  /** Long-form carrier unpivot of the fixture's gtValues (the same
    * shape the e24 oracle uses), restricted to carrier classes.
    */
  private val carriersSql: String =
    s"""(SELECT chrom, pos, alt, gt AS gt_class,
       |   's' || CAST(six AS VARCHAR) AS sample,
       |   CASE WHEN gt = 1 THEN 1 ELSE 2 END AS copies
       | FROM (
       |  SELECT chrom, pos, alt, 1 AS six, gt_s1 AS gt FROM ${VcfFixture.gtValues}
       |  UNION ALL SELECT chrom, pos, alt, 2, gt_s2 FROM ${VcfFixture.gtValues}
       |  UNION ALL SELECT chrom, pos, alt, 3, gt_s3 FROM ${VcfFixture.gtValues}
       |  UNION ALL SELECT chrom, pos, alt, 4, gt_s4 FROM ${VcfFixture.gtValues}) gg
       | WHERE gt IN (1, 3)) carr""".stripMargin

  val oracle: Map[String, String] = Map(
    "e31_lof_sieve" ->
      s"""SELECT i.chrom, CAST(i.pos AS BIGINT) AS pos, i.ref, i.alt,
         | i.symbol, i.biotype, i.consequence, i.impact_severity,
         | carr.sample, CAST(carr.gt_class AS INTEGER) AS gt_class
         |FROM ${VcfFixture.impactsValues}
         |JOIN $carriersSql
         |  ON i.chrom = carr.chrom AND i.pos = carr.pos AND i.alt = carr.alt
         |WHERE i.consequence IN (${lofConsequences.map(c => s"'$c'").mkString(", ")})
         |ORDER BY i.chrom, i.pos, i.alt, i.consequence, carr.sample""".stripMargin,
    "e32_burden_matrix" ->
      s"""WITH damaging AS (
         | SELECT DISTINCT chrom, pos, alt, symbol FROM ${VcfFixture.impactsValues}
         | WHERE impact_severity IN ('MED', 'HIGH'))
         |SELECT d.symbol, carr.sample,
         | CAST(COUNT(DISTINCT d.chrom || '|' || CAST(d.pos AS VARCHAR) || '|' || d.alt) AS BIGINT) AS n_variants
         |FROM damaging d
         |JOIN $carriersSql
         |  ON d.chrom = carr.chrom AND d.pos = carr.pos AND d.alt = carr.alt
         |GROUP BY d.symbol, carr.sample
         |ORDER BY d.symbol, carr.sample""".stripMargin,
    "e33_burden_calpha" -> {
      // s1 is the single affected sample of the 4-sample PED: p0 = 1/4
      val p0 = "(CAST(1 AS DOUBLE) / CAST(4 AS DOUBLE))"
      val pieces = calphaPieces(duck = true, p0).toMap
      s"""WITH pv AS (
         | SELECT carr.chrom, carr.pos, carr.alt,
         |  CAST(SUM(CASE WHEN carr.sample = 's1' THEN carr.copies ELSE 0 END) AS INTEGER) AS y,
         |  CAST(SUM(carr.copies) AS INTEGER) AS n
         | FROM $carriersSql GROUP BY 1, 2, 3),
         |pg AS (
         | SELECT DISTINCT pv.*, i.symbol FROM pv
         | JOIN ${VcfFixture.impactsValues}
         |   ON i.chrom = pv.chrom AND i.pos = pv.pos AND i.alt = pv.alt),
         |pieces AS (
         | SELECT symbol, ${pieces("term")} AS term,
         |  ${pieces("var_sum")} AS var_sum
         | FROM pg)
         |SELECT symbol, SUM(term) AS t_stat, SUM(var_sum) AS c_var,
         | SUM(term) / sqrt(SUM(var_sum)) AS z_score
         |FROM pieces GROUP BY symbol ORDER BY symbol""".stripMargin
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e31_lof_sieve" -> (e31 _),
    "e32_burden_matrix" -> (e32 _),
    "e33_burden_calpha" -> (e33 _)
  )
}
