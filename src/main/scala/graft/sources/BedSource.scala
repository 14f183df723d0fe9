package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** BED interval file → regions DataFrame for the interval-annotate
  * join (gemini `annotate -a` takes BED input; reference usage
  * SURVEY.md §1 downstream-query capability).
  *
  * BED is 0-based half-open; the emitted `r_start`/`r_end` are 1-based
  * INCLUSIVE to match VCF `pos` comparisons directly. Columns beyond
  * the 4th are ignored; a missing name column yields NULL.
  */
object BedSource {

  val schema: StructType = StructType(Seq(
    StructField("r_chrom", StringType),
    StructField("r_start", LongType),
    StructField("r_end", LongType),
    StructField("region", StringType)))

  def parse(lines: Seq[String]): Seq[Row] =
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") &&
        !l.startsWith("track") && !l.startsWith("browser"))
      .map { l =>
        val f = l.split("""\s+""")
        require(f.length >= 3, s"BED line needs chrom/start/end: '$l'")
        Row(f(0), f(1).toLong + 1L, f(2).toLong,
          if (f.length > 3) f(3) else null)
      }
      .toSeq

  def fromLines(spark: SparkSession, lines: Seq[String]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(parse(lines), 1), schema)

  def fromPath(spark: SparkSession, path: String): DataFrame = {
    val src = scala.io.Source.fromFile(path)
    try fromLines(spark, src.getLines().toSeq) finally src.close()
  }
}
