package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Etl.VcfFixture
import graft.sources.VcfReader

/** GEMINI's gene-network tools (`pathways`, `interactions`),
  * Spark-first. Both treat the gene→pathway map and the
  * protein-interaction edge list as BROADCAST dims — at biobank scale
  * the variants/impacts facts are the 100 TB side and the gene
  * universe stays ~20k rows, so the network never shuffles the fact.
  */
object GeneNetwork {

  /** Gene → pathway dim (a KEGG-like map); VALUES mirror in the e41
    * oracle.
    */
  private val pathwayRows = Seq(
    ("BRCA1", "dna_repair"), ("BRCA1", "cancer"),
    ("TP53", "cancer"), ("TP53", "apoptosis"),
    ("EGFR", "signaling"))

  /** Undirected protein-interaction edges (a HPRD-like list); VALUES
    * mirror in the e42 oracle.
    */
  private val edgeRows = Seq(("BRCA1", "TP53"), ("TP53", "EGFR"))

  /** e41: gemini `pathways` — each variant's carrier samples annotated
    * with the pathways its impacted gene belongs to. Impacts collapse
    * to distinct (variant, gene) BEFORE the joins (a variant's many
    * transcripts share genes); the pathway dim broadcasts; the carrier
    * explode joins on the (chrom, pos, alt) variant key. Fan-out is
    * carriers × pathways-per-gene — both bounded multipliers.
    */
  def e41(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (h, variants, impacts) = VcfReader.fromLines(s, VcfFixture.lines)
    val genes = impacts.select($"chrom", $"pos", $"alt", $"symbol").distinct()
    val pathways = pathwayRows.toDF("symbol", "pathway")
    genes.join(broadcast(pathways), Seq("symbol"))
      .join(Burden.carriers(s, variants, h.samples), Seq("chrom", "pos", "alt"))
      .select($"chrom", $"pos", $"alt", $"symbol".as("gene"), $"pathway",
        $"sample")
      .orderBy($"chrom", $"pos", $"alt", $"gene", $"pathway", $"sample")
  }

  /** e42: gemini `interactions -r 2` — variants (and their carriers)
    * in genes within `radius` interaction hops of a seed gene. The
    * k-hop neighborhood is computed by `radius` iterated joins over
    * the edge DIM (never the fact; radius is a small constant), with
    * min-hop labeling, then broadcast against the impacts scan. The
    * seed itself is excluded, matching GEMINI's "interacting genes"
    * output.
    */
  def e42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (h, variants, impacts) = VcfReader.fromLines(s, VcfFixture.lines)
    interactions(s, variants, impacts, h.samples, seed = "BRCA1", radius = 2)
  }

  def interactions(s: SparkSession, variants: DataFrame, impacts: DataFrame,
                   samples: Seq[String], seed: String, radius: Int): DataFrame = {
    import s.implicits._
    val e = edgeRows.toDF("src", "dst")
    val und = e.union(e.select($"dst", $"src")).toDF("src", "dst")
    var frontier = Seq((seed, 0)).toDF("gene", "hops")
    var reached = frontier
    for (h <- 1 to radius) {
      frontier = frontier.join(und, frontier("gene") === und("src"))
        .select($"dst".as("gene"), lit(h).as("hops"))
      reached = reached.union(frontier)
    }
    val neighbors = reached.groupBy($"gene")
      .agg(min($"hops").as("hops"))
      .filter($"hops" > 0)
    val genes = impacts.select($"chrom", $"pos", $"alt", $"symbol").distinct()
    genes.join(broadcast(neighbors), genes("symbol") === neighbors("gene"))
      .join(Burden.carriers(s, variants, samples), Seq("chrom", "pos", "alt"))
      .select($"gene", $"hops", $"chrom", $"pos", $"alt", $"sample")
      .orderBy($"gene", $"hops", $"chrom", $"pos", $"alt", $"sample")
  }

  // ---------------------------------------------------------------- oracles

  private val pathwayValues: String = pathwayRows
    .map { case (g, p) => s"('$g', '$p')" }
    .mkString("(VALUES ", ", ", ") p(p_gene, pathway)")

  private val edgeValues: String = edgeRows
    .map { case (a, b) => s"('$a', '$b')" }
    .mkString("(VALUES ", ", ", ") e(src, dst)")

  private val carriersLong: String =
    s"""(SELECT chrom, pos, alt, 's' || CAST(six AS VARCHAR) AS sample
       | FROM (
       |  SELECT chrom, pos, alt, 1 AS six, gt_s1 AS gt FROM ${VcfFixture.gtValues}
       |  UNION ALL SELECT chrom, pos, alt, 2, gt_s2 FROM ${VcfFixture.gtValues}
       |  UNION ALL SELECT chrom, pos, alt, 3, gt_s3 FROM ${VcfFixture.gtValues}
       |  UNION ALL SELECT chrom, pos, alt, 4, gt_s4 FROM ${VcfFixture.gtValues}) gg
       | WHERE gt IN (1, 3))""".stripMargin

  val oracle: Map[String, String] = Map(
    "e41_pathways" ->
      s"""SELECT i.chrom, CAST(i.pos AS BIGINT) AS pos, i.alt,
         | i.symbol AS gene, p.pathway, c.sample
         |FROM (SELECT DISTINCT chrom, pos, alt, symbol
         |      FROM ${VcfFixture.impactsValues}) i
         |JOIN $pathwayValues ON p.p_gene = i.symbol
         |JOIN $carriersLong c
         |  ON c.chrom = i.chrom AND c.pos = i.pos AND c.alt = i.alt
         |ORDER BY i.chrom, pos, i.alt, gene, p.pathway, c.sample""".stripMargin,
    "e42_interactions" ->
      s"""WITH und AS (
         | SELECT src, dst FROM $edgeValues
         | UNION ALL SELECT dst, src FROM $edgeValues
         |), n1 AS (
         | SELECT DISTINCT dst AS gene, 1 AS hops FROM und WHERE src = 'BRCA1'
         |), n2 AS (
         | SELECT DISTINCT u.dst AS gene, 2 AS hops
         | FROM und u JOIN n1 ON u.src = n1.gene
         | WHERE u.dst <> 'BRCA1' AND u.dst NOT IN (SELECT gene FROM n1)
         |), nb AS (SELECT * FROM n1 UNION ALL SELECT * FROM n2)
         |SELECT nb.gene, nb.hops, i.chrom, CAST(i.pos AS BIGINT) AS pos,
         | i.alt, c.sample
         |FROM nb
         |JOIN (SELECT DISTINCT chrom, pos, alt, symbol
         |      FROM ${VcfFixture.impactsValues}) i ON i.symbol = nb.gene
         |JOIN $carriersLong c
         |  ON c.chrom = i.chrom AND c.pos = i.pos AND c.alt = i.alt
         |ORDER BY nb.gene, nb.hops, i.chrom, pos, i.alt, c.sample""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e41_pathways" -> (e41 _),
    "e42_interactions" -> (e42 _)
  )
}
