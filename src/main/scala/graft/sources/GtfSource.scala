package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** GTF/GFF2 gene-model file → gene-span DataFrame for the interval
  * annotate join (the refGene-style gene table GEMINI's `region
  * --gene` / annotation DB is built from; GTF is the public
  * interchange format for gene models — Ensembl/GENCODE ship it).
  *
  * GTF is TAB-separated (seqname, source, feature, start, end, score,
  * strand, frame, attributes) with 1-based INCLUSIVE coordinates —
  * emitted unchanged (`r_start`/`r_end` compare directly against VCF
  * `pos`, unlike BED's 0-based half-open, which BedSource shifts).
  * Attributes are `key "value";` pairs; `gene_id` is required by the
  * spec, `gene_name` optional (falls back to gene_id).
  *
  * `genes()` collapses to one span per (chrom, gene): GTF carries
  * exon/transcript/CDS rows too — a `feature == "gene"` row where
  * present, else the min-start/max-end hull of the gene's features
  * (older refGene-derived GTFs have no explicit gene rows).
  */
object GtfSource {

  val schema: StructType = StructType(Seq(
    StructField("r_chrom", StringType),
    StructField("feature", StringType),
    StructField("r_start", LongType),
    StructField("r_end", LongType),
    StructField("strand", StringType),
    StructField("gene_id", StringType),
    StructField("gene_name", StringType)))

  private val attr = """(\w+)\s+"([^"]*)"""".r

  def parse(lines: Seq[String]): Seq[Row] =
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val f = l.split("\t", -1)
        require(f.length >= 9, s"GTF line needs 9 tab fields: '$l'")
        val attrs = attr.findAllMatchIn(f(8))
          .map(m => m.group(1) -> m.group(2)).toMap
        val gid = attrs.getOrElse("gene_id",
          sys.error(s"GTF attributes missing gene_id: '${f(8)}'"))
        Row(f(0), f(2), f(3).toLong, f(4).toLong, f(6), gid,
          attrs.getOrElse("gene_name", gid))
      }
      .toSeq

  def fromLines(spark: SparkSession, lines: Seq[String]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(parse(lines), 1), schema)

  /** One span per (chrom, gene): explicit `gene` rows win; genes known
    * only through transcript/exon rows get their feature hull. A
    * gene-model file is dim-sized (~20k genes / ~3M exon rows), so
    * this collapse is driver-adjacent work feeding a broadcast join.
    * Name/strand use the same gene-row-wins coalesce as the span
    * columns (max, not first — first() is partition-order-dependent,
    * so a multi-partition GTF with attribute-discordant feature rows
    * would otherwise vary run to run).
    */
  def genes(gtf: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    gtf.groupBy(col("r_chrom"), col("gene_id"))
      .agg(
        coalesce(
          min(when(col("feature") === "gene", col("r_start"))),
          min(col("r_start"))).as("r_start"),
        coalesce(
          max(when(col("feature") === "gene", col("r_end"))),
          max(col("r_end"))).as("r_end"),
        coalesce(
          max(when(col("feature") === "gene", col("gene_name"))),
          max(col("gene_name"))).as("gene_name"),
        coalesce(
          max(when(col("feature") === "gene", col("strand"))),
          max(col("strand"))).as("strand"))
  }

  /** Driver-side read with transparent gunzip (BedSource's path — a
    * gene-model file is a dim at any corpus scale).
    */
  def fromPath(spark: SparkSession, path: String): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(hp)
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
        VcfIo.maybeGunzip(path, in), "UTF-8"))
      fromLines(spark,
        Iterator.continually(reader.readLine()).takeWhile(_ != null).toVector)
    } finally in.close()
  }
}
