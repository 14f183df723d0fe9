package graft

import java.nio.file.Files

/** Volume test: a generated 20k-record VCF (some multi-allelic) through
  * the DataSourceV2 reader — exercises the per-partition parse path at
  * a size where laziness/streaming bugs surface, and cross-checks
  * aggregate invariants computed two independent ways.
  */
class VcfVolumeSpec extends SparkSpec {

  private val nRecords = 20000

  private lazy val vcfPath: String = {
    val sb = new StringBuilder
    sb ++= "##fileformat=VCFv4.2\n"
    sb ++= "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">\n"
    sb ++= "##INFO=<ID=AF,Number=A,Type=Float,Description=\"AF\">\n"
    sb ++= "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"Genotype\">\n"
    sb ++= Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO",
      "FORMAT", "s1", "s2").mkString("\t") + "\n"
    val gts = Vector("0/0", "0/1", "1/1", "./.")
    (1 to nRecords).foreach { i =>
      val multi = i % 10 == 0
      val alt = if (multi) "G,T" else "G"
      val af = if (multi) "0.25,0.5" else "0.25"
      sb ++= Seq(
        s"${1 + i % 22}", s"${i * 7}", ".", "A", alt, s"$i.0", "PASS",
        s"DP=${i % 100};AF=$af", "GT", gts(i % 4), gts((i / 4) % 4)
      ).mkString("\t") + "\n"
    }
    val f = Files.createTempDirectory("vcfvol").resolve("vol.vcf")
    Files.writeString(f, sb.toString)
    f.toString
  }

  test("20k-record VCF parses with exact decomposed row count") {
    val df = spark.read.format("vcf").load(vcfPath)
    val expected = nRecords + nRecords / 10 // one extra row per multi-allelic
    assert(df.count() == expected)
  }

  test("pushdown row-skip + byte splits agree with the unsplit scan") {
    val cond = "chrom = '5' AND pos >= 70000 AND pos <= 100000"
    val whole = spark.read.format("vcf").load(vcfPath)
      .filter(cond).select("chrom", "pos", "alt", "dp")
      .collect().map(_.toSeq).sortBy(_.toString)
    val split = spark.read.format("vcf").option("splitSize", "65536")
      .load(vcfPath)
      .filter(cond).select("chrom", "pos", "alt", "dp")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(whole.nonEmpty, "filter selected nothing — test is vacuous")
    assert(whole.toSeq == split.toSeq)
  }

  test("aggregate invariants: dp distribution and per-alt AF") {
    import org.apache.spark.sql.functions._
    val df = spark.read.format("vcf").load(vcfPath)
    // dp = i % 100 over 1..20000 decomposed — check via two paths
    val dpSum = df.filter(col("alt") === "G").agg(sum("dp")).head().getLong(0)
    val exp = (1 to nRecords).map(_ % 100).sum.toLong
    assert(dpSum == exp)
    // Number=A decompose: every T row (the second alt) carries AF=0.5
    val afT = df.filter(col("alt") === "T").select("af").distinct().collect()
    assert(afT.map(_.getDouble(0)).toSeq == Seq(0.5))
    // genotype stats bounded
    val bad = df.filter(col("aaf") < 0 || col("aaf") > 1 ||
      col("call_rate") < 0 || col("call_rate") > 1).count()
    assert(bad == 0)
  }
}
