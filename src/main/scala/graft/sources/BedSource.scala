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

  /** BED files are dim-sized: read driver-side via Hadoop FileSystem
    * (cluster URIs work) with transparent gunzip — the same path
    * VcfReader uses for headers, and for the same reason: a local-only
    * or compression-blind read silently parses garbage.
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
