package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Etl.VcfFixture
import graft.sources.VcfReader

/** GEMINI's tumor-normal tools (`set_somatic`, `actionable_mutations`),
  * Spark-first. The tumor/normal pairing is a BROADCAST dim joined
  * against one variants scan with a non-equi depth/frequency predicate
  * (the e17 trio-dim shape: per-sample values resolve by array index,
  * never a per-sample explode), so a biobank-scale cohort streams once
  * per query.
  */
object Somatic {

  /** Tumor → matched-normal pairs; VALUES mirror in the oracles. */
  private val pairRows = Seq(("s1", "s2"), ("s4", "s3"))

  /** GEMINI set_somatic's default-shaped thresholds. */
  private val minDepth = 10
  private val minTumorFreq = 0.2
  private val maxNormalFreq = 0.05

  private def freq(refD: Column, altD: Column): Column =
    altD.cast("double") / (refD + altD).cast("double")

  /** Somatic candidates over (variant × pair): both sides deep enough,
    * tumor alt fraction high, matched normal clean. The -1 missing
    * sentinel fails the depth floor, so AD-less rows drop without a
    * special case.
    */
  def somaticCandidates(s: SparkSession, variants: DataFrame,
                        samples: Seq[String]): DataFrame = {
    import s.implicits._
    val pairs = pairRows.toDF("tumor", "normal")
      .select($"tumor", $"normal",
        typedLit(samples).as("smp"))
      .select($"tumor", $"normal",
        array_position($"smp", $"tumor").cast("int").as("t_ix"),
        array_position($"smp", $"normal").cast("int").as("n_ix"))
    def at(arr: String, ix: Column) = element_at(col(arr), ix)
    val tRef = at("gt_ref_depths", $"t_ix"); val tAlt = at("gt_alt_depths", $"t_ix")
    val nRef = at("gt_ref_depths", $"n_ix"); val nAlt = at("gt_alt_depths", $"n_ix")
    val tDp = at("gt_depths", $"t_ix"); val nDp = at("gt_depths", $"n_ix")
    variants
      .join(broadcast(pairs),
        tDp >= minDepth && nDp >= minDepth &&
          (tRef + tAlt) > 0 && (nRef + nAlt) > 0 &&
          freq(tRef, tAlt) >= minTumorFreq &&
          freq(nRef, nAlt) <= maxNormalFreq)
      .select($"chrom", $"pos", $"alt", $"tumor", $"normal",
        tDp.as("tumor_dp"), nDp.as("normal_dp"),
        freq(tRef, tAlt).as("tumor_alt_freq"),
        freq(nRef, nAlt).as("normal_alt_freq"))
  }

  /** e43: gemini `set_somatic` — flag variants where the tumor carries
    * the alt but the matched normal is clean and both are well-covered.
    */
  def e43(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (h, variants, _) = VcfReader.fromLines(s, VcfFixture.lines)
    somaticCandidates(s, variants, h.samples)
      .orderBy($"chrom", $"pos", $"alt", $"tumor")
  }

  /** e44: gemini `actionable_mutations` — somatic candidates restricted
    * to damaging (MED/HIGH) impacts in an actionability gene panel. The
    * panel is a broadcast IN-filter pushed onto the impacts scan before
    * the variant-keyed join.
    */
  def e44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val panel = Seq("BRCA1", "EGFR")
    val (h, variants, impacts) = VcfReader.fromLines(s, VcfFixture.lines)
    val damaging = impacts
      .filter($"impact_severity".isin("MED", "HIGH") &&
        $"symbol".isin(panel: _*))
      .select($"chrom", $"pos", $"alt", $"symbol", $"consequence",
        $"impact_severity").distinct()
    somaticCandidates(s, variants, h.samples)
      .join(damaging, Seq("chrom", "pos", "alt"))
      .select($"chrom", $"pos", $"alt", $"symbol".as("gene"),
        $"consequence", $"impact_severity", $"tumor", $"normal",
        $"tumor_alt_freq")
      .orderBy($"chrom", $"pos", $"alt", $"gene", $"consequence", $"tumor")
  }

  /** e57's tumor→normal pairing (distinct from [[pairRows]]: LOH needs
    * a HET normal, which the fixture provides for these orientations);
    * VALUES mirror in the oracle.
    */
  private val lohPairRows = Seq(("s2", "s1"), ("s1", "s3"))

  /** e57: somatic LOSS OF HETEROZYGOSITY — sites where the matched
    * normal is HET but the tumor has collapsed to a single allele
    * (HOM-REF or HOM-ALT), labeled with the retained allele: the
    * second hit of the two-hit model and the standard tumor-suppressor
    * screen gemini's somatic family pairs with `set_somatic`. A
    * genotype-TRANSITION call — e43's depth/frequency gating composes
    * in front when ADs are present (the fixture's GT-only rows are
    * exactly the records a depth gate would silently drop).
    *
    * Scale shape: e43's regime verbatim — broadcast pair dim × ONE
    * variants scan, per-sample classes by array index, no explode.
    */
  def e57(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (h, variants, _) = VcfReader.fromLines(s, VcfFixture.lines)
    val pairs = lohPairRows.toDF("tumor", "normal")
      .select($"tumor", $"normal", typedLit(h.samples).as("smp"))
      .select($"tumor", $"normal",
        array_position($"smp", $"tumor").cast("int").as("t_ix"),
        array_position($"smp", $"normal").cast("int").as("n_ix"))
    def at(arr: String, ix: Column) = element_at(col(arr), ix)
    val tGt = at("gt_types", $"t_ix")
    val nGt = at("gt_types", $"n_ix")
    variants
      .join(broadcast(pairs), nGt === 1 && (tGt === 0 || tGt === 3))
      .select($"chrom", $"pos", $"alt", $"tumor", $"normal",
        when(tGt === 3, lit("alt")).otherwise(lit("ref")).as("retained"))
      .orderBy($"chrom", $"pos", $"alt", $"tumor")
  }

  // ---------------------------------------------------------------- oracles

  private val pairValues: String = pairRows
    .map { case (t, n) => s"(${t.drop(1)}, ${n.drop(1)})" }
    .mkString("(VALUES ", ", ", ") p(t_ix, n_ix)")

  /** The somatic rule over the long-form FORMAT fixture, shared by both
    * oracles; column list matches somaticCandidates.
    */
  private val somaticSql: String =
    s"""SELECT t.chrom, CAST(t.pos AS BIGINT) AS pos, t.alt,
       | 's' || CAST(p.t_ix AS VARCHAR) AS tumor,
       | 's' || CAST(p.n_ix AS VARCHAR) AS normal,
       | t.dp AS tumor_dp, n.dp AS normal_dp,
       | CAST(t.alt_d AS DOUBLE) / CAST(t.ref_d + t.alt_d AS DOUBLE)
       |   AS tumor_alt_freq,
       | CAST(n.alt_d AS DOUBLE) / CAST(n.ref_d + n.alt_d AS DOUBLE)
       |   AS normal_alt_freq
       |FROM $pairValues
       |JOIN (SELECT * FROM ${VcfFixture.gtFormatValues}) t
       |  ON t.sample_ix = p.t_ix
       |JOIN (SELECT * FROM ${VcfFixture.gtFormatValues}) n
       |  ON n.sample_ix = p.n_ix AND n.chrom = t.chrom
       |  AND n.pos = t.pos AND n.alt = t.alt
       |WHERE t.dp >= $minDepth AND n.dp >= $minDepth
       | AND t.ref_d + t.alt_d > 0 AND n.ref_d + n.alt_d > 0
       | AND CAST(t.alt_d AS DOUBLE) / CAST(t.ref_d + t.alt_d AS DOUBLE)
       |   >= $minTumorFreq
       | AND CAST(n.alt_d AS DOUBLE) / CAST(n.ref_d + n.alt_d AS DOUBLE)
       |   <= $maxNormalFreq""".stripMargin

  private val lohPairValues: String = lohPairRows
    .map { case (t, n) => s"(${t.drop(1)}, ${n.drop(1)})" }
    .mkString("(VALUES ", ", ", ") p(t_ix, n_ix)")

  val oracle: Map[String, String] = Map(
    "e57_loh" -> {
      val gtLong =
        s"""(SELECT chrom, pos, alt, 1 AS six, gt_s1 AS gt FROM ${VcfFixture.gtValues}
           | UNION ALL SELECT chrom, pos, alt, 2, gt_s2 FROM ${VcfFixture.gtValues}
           | UNION ALL SELECT chrom, pos, alt, 3, gt_s3 FROM ${VcfFixture.gtValues}
           | UNION ALL SELECT chrom, pos, alt, 4, gt_s4 FROM ${VcfFixture.gtValues})""".stripMargin
      s"""SELECT t.chrom, CAST(t.pos AS BIGINT) AS pos, t.alt,
         | 's' || CAST(p.t_ix AS VARCHAR) AS tumor,
         | 's' || CAST(p.n_ix AS VARCHAR) AS normal,
         | CASE WHEN t.gt = 3 THEN 'alt' ELSE 'ref' END AS retained
         |FROM $lohPairValues
         |JOIN $gtLong t ON t.six = p.t_ix
         |JOIN $gtLong n ON n.six = p.n_ix AND n.chrom = t.chrom
         |  AND n.pos = t.pos AND n.alt = t.alt
         |WHERE n.gt = 1 AND t.gt IN (0, 3)
         |ORDER BY t.chrom, t.pos, t.alt, tumor""".stripMargin
    },
    "e43_set_somatic" ->
      s"""SELECT * FROM ($somaticSql)
         |ORDER BY chrom, pos, alt, tumor""".stripMargin,
    "e44_actionable" ->
      s"""SELECT s.chrom, s.pos, s.alt, i.symbol AS gene, i.consequence,
         | i.impact_severity, s.tumor, s.normal, s.tumor_alt_freq
         |FROM ($somaticSql) s
         |JOIN (SELECT DISTINCT chrom, pos, alt, symbol, consequence,
         |       impact_severity
         |      FROM ${VcfFixture.impactsValues}
         |      WHERE impact_severity IN ('MED', 'HIGH')
         |        AND symbol IN ('BRCA1', 'EGFR')) i
         |  ON i.chrom = s.chrom AND i.pos = s.pos AND i.alt = s.alt
         |ORDER BY s.chrom, s.pos, s.alt, gene, i.consequence,
         | s.tumor""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e43_set_somatic" -> (e43 _),
    "e44_actionable" -> (e44 _),
    "e57_loh" -> (e57 _)
  )
}
