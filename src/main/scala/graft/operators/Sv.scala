package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VcfReader

/** Structural-variant support — the GEMINI `fusions` tool re-expressed
  * Spark-first (reference checkout empty; semantics from the public
  * GEMINI docs: breakend (BND) pairs whose two ends land in two
  * DIFFERENT genes are candidate gene fusions).
  *
  * VCF 4.2 breakend ALTs encode the mate coordinate inline
  * (`t[p[`, `t]p]`, `]p]t`, `[p[t` with p = chrom:pos), so both ends of
  * every breakend are known from ONE row — no mate self-join is ever
  * needed. Gene labeling is the e14 interval-join shape: the gene dim
  * (~20k rows at any corpus size) explodes into coordinate bins and
  * BROADCASTS; the variants fact joins it on the (chrom, bin) equi-key
  * plus an exact BETWEEN — never a chrom-only join (24-key skew).
  *
  * 100 TB notes: breakend parsing is one per-row codegen
  * `regexp_extract`; each gene labeling is a broadcast hash join; the
  * fact table never shuffles and is scanned once.
  */
object Sv {

  /** Mate coordinate inside a VCF breakend ALT: the bracketed
    * `chrom:pos` core (bracket direction encodes strand/orientation,
    * irrelevant to WHERE the mate is). The identical pattern text runs
    * in Spark's Java regex AND the oracle's RE2 — `\[`-escapes are
    * legal in both, and DuckDB's standard-conforming single-quoted
    * strings pass backslashes through untouched. (The backslash-free
    * POSIX `[][]` trick is NOT Java-legal — Java requires the escapes.)
    */
  private[graft] val MateRe = "[\\[\\]]([^\\[\\]:]+):([0-9]+)[\\[\\]]"

  /** Rows whose ALT is a breakend, with the mate coordinate parsed out.
    * Non-BND rows (symbolic `<DEL>` alts included) drop here — their
    * two ends live on one chromosome and are served by the interval
    * tools, not the fusion tool.
    */
  def breakends(variants: DataFrame): DataFrame =
    variants
      .withColumn("mate_chrom", regexp_extract(col("alt"), MateRe, 1))
      .filter(col("mate_chrom") =!= "")
      .withColumn("mate_pos", regexp_extract(col("alt"), MateRe, 2).cast("long"))

  /** Candidate gene fusions: breakends whose own end and mate end fall
    * in two different genes. `genes` columns: g_chrom, g_start, g_end
    * (1-based inclusive), gene. Each qualifying breakend ROW reports
    * once (a reciprocal mate pair yields its mirrored row, exactly like
    * the GEMINI tool's per-breakend output).
    */
  def fusions(variants: DataFrame, genes: DataFrame,
      binW: Long = 100000L): DataFrame = {
    val binned = genes.withColumn("g_bin",
      explode(expr(s"sequence(g_start div $binW, g_end div $binW)")))
    val endA = binned.select(col("g_chrom").as("a_chrom"),
      col("g_bin").as("a_bin"), col("g_start").as("a_start"),
      col("g_end").as("a_end"), col("gene").as("gene_a"))
    val endB = binned.select(col("g_chrom").as("b_chrom"),
      col("g_bin").as("b_bin"), col("g_start").as("b_start"),
      col("g_end").as("b_end"), col("gene").as("gene_b"))
    breakends(variants)
      .withColumn("bin", expr(s"pos div $binW"))
      .withColumn("m_bin", expr(s"mate_pos div $binW"))
      .join(broadcast(endA),
        col("chrom") === col("a_chrom") && col("bin") === col("a_bin") &&
          col("pos").between(col("a_start"), col("a_end")))
      .join(broadcast(endB),
        col("mate_chrom") === col("b_chrom") && col("m_bin") === col("b_bin") &&
          col("mate_pos").between(col("b_start"), col("b_end")))
      .filter(col("gene_a") =!= col("gene_b"))
      .select(col("chrom"), col("pos"), col("alt"),
        col("mate_chrom"), col("mate_pos"), col("gene_a"), col("gene_b"))
  }

  // ------------------------------------------------------------- fixture

  /** SV fixture: a reciprocal inter-gene BND pair (the fusion), an
    * intra-gene BND, a BND with a gene-less mate, and a symbolic DEL —
    * only the reciprocal pair's two rows may fuse.
    */
  object SvFixture {
    val lines: Vector[String] = Vector(
      "##fileformat=VCFv4.2",
      "##INFO=<ID=SVTYPE,Number=1,Type=String,Description=\"SV type\">",
      "##INFO=<ID=END,Number=1,Type=Integer,Description=\"SV end\">",
      "##INFO=<ID=MATEID,Number=1,Type=String,Description=\"Mate id\">",
      "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"Genotype\">",
      Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO",
        "FORMAT", "t1", "n1").mkString("\t"),
      Seq("2", "100100", "bnd1", "A", "A[17:200200[", "60.0", "PASS",
        "SVTYPE=BND;MATEID=bnd2", "GT", "0/1", "0/0").mkString("\t"),
      Seq("2", "100500", "bnd3", "T", "T]2:100800]", "55.0", "PASS",
        "SVTYPE=BND;MATEID=bnd4", "GT", "0/1", "0/0").mkString("\t"),
      // intra-chromosomal DEL- and DUP-orientation junctions (both ends
      // inside GENE_A, so the fusion tool ignores them by design)
      Seq("2", "100200", "bnd6", "A", "A[2:100650[", "50.0", "PASS",
        "SVTYPE=BND;MATEID=bnd7", "GT", "0/1", "0/0").mkString("\t"),
      Seq("2", "100250", "bnd8", "G", "]2:100900]G", "50.0", "PASS",
        "SVTYPE=BND", "GT", "0/1", "0/0").mkString("\t"),
      Seq("2", "100700", "del1", "G", "<DEL>", "40.0", "PASS",
        "SVTYPE=DEL;END=100900", "GT", "0/1", "0/0").mkString("\t"),
      Seq("5", "50000", "bnd5", "C", "C[2:100300[", "45.0", "PASS",
        "SVTYPE=BND", "GT", "0/1", "0/0").mkString("\t"),
      Seq("17", "200200", "bnd2", "G", "]2:100100]G", "60.0", "PASS",
        "SVTYPE=BND;MATEID=bnd1", "GT", "0/1", "0/0").mkString("\t"))

    /** The body rows the oracle re-parses (chrom, pos, alt). */
    val recordValues: String =
      """(VALUES
        | ('2', 100100, 'A[17:200200['),
        | ('2', 100500, 'T]2:100800]'),
        | ('2', 100200, 'A[2:100650['),
        | ('2', 100250, ']2:100900]G'),
        | ('2', 100700, '<DEL>'),
        | ('5', 50000, 'C[2:100300['),
        | ('17', 200200, ']2:100100]G')
        |) r(chrom, pos, alt)""".stripMargin

    /** The same rows with the symbolic END payload (NULL on breakends)
      * for the e58 classifier oracle.
      */
    val svRecordValues: String =
      """(VALUES
        | ('2', 100100, 'A[17:200200[', NULL),
        | ('2', 100500, 'T]2:100800]', NULL),
        | ('2', 100200, 'A[2:100650[', NULL),
        | ('2', 100250, ']2:100900]G', NULL),
        | ('2', 100700, '<DEL>', 100900),
        | ('5', 50000, 'C[2:100300[', NULL),
        | ('17', 200200, ']2:100100]G', NULL)
        |) r(chrom, pos, alt, end_)""".stripMargin

    val geneRows = Seq(
      ("2", 100000L, 101000L, "GENE_A"),
      ("17", 200000L, 201000L, "GENE_B"),
      ("5", 1000L, 2000L, "GENE_C"))

    /** The gene dim as a VALUES relation under a caller-chosen alias
      * (the oracle joins it twice — once per breakend end).
      */
    def geneValues(alias: String): String = geneRows
      .map { case (c, a, b, g) => s"('$c', $a, $b, '$g')" }
      .mkString("(VALUES\n ", ",\n ",
        s"\n) $alias(g_chrom, g_start, g_end, gene)")

    def genes(s: SparkSession): DataFrame = {
      import s.implicits._
      geneRows.toDF("g_chrom", "g_start", "g_end", "gene")
    }
  }

  /** e45: `gemini fusions` — candidate gene fusions from breakend SVs,
    * via the real parser over the SV fixture.
    */
  def e45(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, variants, _) = VcfReader.fromLines(s, SvFixture.lines)
    fusions(variants, SvFixture.genes(s))
      .orderBy($"chrom", $"pos", $"alt")
  }

  /** The breakend-orientation → SV-class rule (the delly/svtools-style
    * heuristic over VCF 4.2 bracket grammar): `t[p[` and its mirror
    * `]p]t` are DEL- or DUP-type junctions depending on which side is
    * upstream; `t]p]` and `[p[t` are INV-type; a mate on another
    * chromosome is a translocation. Bracket-shape tests are plain
    * substring compares (no regex escaping divergence between
    * engines); spelled with `pos`/`mate_pos`/`mate_chrom`/`chrom`
    * column names so the IDENTICAL text runs in Spark and DuckDB.
    */
  private val svClassCase: String =
    """CASE
      | WHEN mate_chrom <> chrom THEN 'TRA'
      | WHEN substr(alt, 1, 1) = ']' THEN
      |   CASE WHEN mate_pos > pos THEN 'DUP' ELSE 'DEL' END
      | WHEN substr(alt, 1, 1) = '[' THEN 'INV'
      | WHEN alt LIKE '%[%' THEN
      |   CASE WHEN mate_pos > pos THEN 'DEL' ELSE 'DUP' END
      | ELSE 'INV' END""".stripMargin

  /** e58: SV CLASSIFICATION — every structural record typed from what
    * the VCF actually encodes: symbolic alts (`<DEL>`, `<DUP>`, …)
    * keep their symbol with an END-derived span; breakends classify
    * from bracket orientation + mate side ([[svClassCase]]) with the
    * junction span for intra-chromosomal events. The triage step
    * before any downstream SV tool (e45 consumes only the TRA-capable
    * subset; interval tools take the symbolic spans).
    *
    * Scale shape: pure per-row codegen parsing + CASE over one scan —
    * no join, no shuffle beyond the presentation sort.
    */
  def e58(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, variants, _) = VcfReader.fromLines(s, SvFixture.lines)
    variants
      .withColumn("mate_chrom", regexp_extract($"alt", MateRe, 1))
      // guarded cast: symbolic alts extract '' (ANSI cast would throw)
      .withColumn("mate_pos", when($"mate_chrom" =!= "",
        regexp_extract($"alt", MateRe, 2).cast("long")))
      .filter($"alt".startsWith("<") || $"mate_chrom" =!= "")
      .withColumn("sv_type", when($"alt".startsWith("<"),
        expr("trim(BOTH '<>' FROM alt)")).otherwise(expr(svClassCase)))
      .withColumn("span", expr(
        """CASE WHEN alt LIKE '<%' THEN end_ - pos + 1
          | WHEN mate_chrom = chrom THEN abs(mate_pos - pos)
          | ELSE NULL END""".stripMargin).cast("long"))
      .select($"chrom", $"pos", $"alt", $"sv_type", $"span")
      .orderBy($"chrom", $"pos", $"alt")
  }

  val oracle: Map[String, String] = Map(
    "e58_sv_classify" ->
      s"""WITH b AS (
         | SELECT chrom, pos, alt, end_,
         |   regexp_extract(alt, '$MateRe', 1) AS mate_chrom,
         |   CAST(nullif(regexp_extract(alt, '$MateRe', 2), '') AS BIGINT) AS mate_pos
         | FROM ${SvFixture.svRecordValues}
         | WHERE alt LIKE '<%' OR regexp_extract(alt, '$MateRe', 1) <> '')
         |SELECT chrom, CAST(pos AS BIGINT) AS pos, alt,
         | CASE WHEN alt LIKE '<%' THEN trim(alt, '<>')
         |      ELSE ($svClassCase) END AS sv_type,
         | CAST(CASE WHEN alt LIKE '<%' THEN end_ - pos + 1
         |      WHEN mate_chrom = chrom THEN abs(mate_pos - pos)
         |      ELSE NULL END AS BIGINT) AS span
         |FROM b ORDER BY chrom, pos, alt""".stripMargin,
    "e45_fusions" ->
      s"""WITH b AS (
         | SELECT chrom, pos, alt,
         |   regexp_extract(alt, '$MateRe', 1) AS mate_chrom,
         |   CAST(regexp_extract(alt, '$MateRe', 2) AS BIGINT) AS mate_pos
         | FROM ${SvFixture.recordValues}
         | WHERE regexp_extract(alt, '$MateRe', 1) <> '')
         |SELECT b.chrom, CAST(b.pos AS BIGINT) AS pos, b.alt,
         | b.mate_chrom, b.mate_pos, ga.gene AS gene_a, gb.gene AS gene_b
         |FROM b
         |JOIN ${SvFixture.geneValues("ga")}
         |  ON b.chrom = ga.g_chrom AND b.pos BETWEEN ga.g_start AND ga.g_end
         |JOIN ${SvFixture.geneValues("gb")}
         |  ON b.mate_chrom = gb.g_chrom AND b.mate_pos BETWEEN gb.g_start AND gb.g_end
         |WHERE ga.gene <> gb.gene
         |ORDER BY b.chrom, b.pos, b.alt""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e45_fusions" -> (e45 _),
    "e58_sv_classify" -> (e58 _)
  )
}
