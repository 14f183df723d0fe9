package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** PED pedigree file → `samples` DataFrame — the reference's samples
  * table (family_id, sample_id, paternal_id, maternal_id, sex,
  * phenotype + any extra columns, named by an optional `#`-header line).
  */
object PedSource {

  private val baseCols = Vector(
    "family_id", "sample_id", "paternal_id", "maternal_id", "sex", "phenotype")

  def schema(extraCols: Seq[String]): StructType =
    StructType((baseCols ++ extraCols.map(VcfParser.sanitize))
      .map(StructField(_, StringType)))

  def parse(lines: Seq[String]): (StructType, Seq[Row]) = {
    val (headerLines, body) = lines.filter(_.nonEmpty).partition(_.startsWith("#"))
    val extras: Seq[String] = headerLines.lastOption match {
      case Some(hl) =>
        val cols = hl.stripPrefix("#").trim.split("""\s+""").toSeq
        if (cols.length > 6) cols.drop(6) else Seq.empty
      case None => Seq.empty
    }
    val sch = schema(extras)
    val n = sch.length
    val rows = body.map { l =>
      val f = l.trim.split("""\s+""").toSeq
      Row.fromSeq(f.padTo(n, null).take(n))
    }
    (sch, rows)
  }

  def fromLines(spark: SparkSession, lines: Seq[String]): DataFrame = {
    val (sch, rows) = parse(lines)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sch)
  }

  def fromPath(spark: SparkSession, path: String): DataFrame = {
    val src = scala.io.Source.fromFile(path)
    try fromLines(spark, src.getLines().toSeq) finally src.close()
  }
}
