package graft

import java.nio.file.Files

import graft.operators.Etl.VcfFixture

class VcfDataSourceSpec extends SparkSpec {

  private lazy val vcfPath: String = {
    val dir = Files.createTempDirectory("vcfsrc")
    val f = dir.resolve("fixture.vcf")
    Files.writeString(f, VcfFixture.lines.mkString("\n") + "\n")
    f.toString
  }

  test("spark.read.format(vcf): header-driven schema + decomposed rows") {
    val df = spark.read.format("vcf").load(vcfPath)
    assert(df.columns.take(7).toSeq ==
      Seq("chrom", "pos", "vid", "ref", "alt", "qual", "filter"))
    assert(df.columns.contains("af") && df.columns.contains("call_rate"))
    assert(df.count() == 5)
    val alts = df.filter("pos = 300").orderBy("alt").collect()
    assert(alts.map(_.getAs[String]("alt")).toSeq == Seq("A", "T"))
    assert(alts.map(_.getAs[Double]("af")).toSeq == Seq(0.5, 0.25))
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val df = spark.read.format("vcf").load(vcfPath).select("chrom", "pos", "aaf")
    val plan = df.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints its (pruned) output column list
    assert("BatchScan[^\\[]*\\[chrom#\\d+, pos#\\d+L, aaf#\\d+\\]".r
      .findFirstIn(plan).isDefined,
      s"pruned read schema not pushed:\n$plan")
    val rows = df.orderBy("chrom", "pos").collect()
    assert(rows.length == 5)
    assert(rows.head.getAs[Double]("aaf") == 0.375)
  }

  test("fromPath distributed text-scan path agrees with the v2 source") {
    val (_, viaReader, _) = graft.sources.VcfReader.fromPath(spark, vcfPath)
    val viaV2 = spark.read.format("vcf").load(vcfPath)
    val a = viaReader.select("chrom", "pos", "alt", "aaf").orderBy("chrom", "pos", "alt").collect()
    val b = viaV2.select("chrom", "pos", "alt", "aaf").orderBy("chrom", "pos", "alt").collect()
    assert(a.toSeq == b.toSeq)
  }
}
