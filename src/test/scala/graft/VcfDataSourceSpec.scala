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

/** Sharded-cohort read: a directory of VCF shards (same header) reads
  * as ONE table with one input partition per shard — the bgzip-shard
  * parallelism layout of a 100 TB cohort.
  */
class VcfShardedReadSpec extends SparkSpec {
  import java.nio.file.Files
  import graft.operators.Etl.VcfFixture

  test("directory of shards = union of shards, one partition each") {
    val dir = Files.createTempDirectory("vcfshards")
    val header = VcfFixture.lines.takeWhile(_.startsWith("#"))
    val body = VcfFixture.lines.filterNot(_.startsWith("#"))
    Files.writeString(dir.resolve("shard-00.vcf"),
      (header ++ body.take(2)).mkString("\n") + "\n")
    Files.writeString(dir.resolve("shard-01.vcf"),
      (header ++ body.drop(2)).mkString("\n") + "\n")
    val df = spark.read.format("vcf").load(dir.toString)
    assert(df.count() == 5) // 4 records, one multi-allelic
    assert(df.rdd.getNumPartitions == 2) // one per shard
    assert(df.select("chrom").distinct().count() == 3)
  }
}

/** Corrupt-row tolerance: strict mode fails the scan, permissive mode
  * skips bad lines — the 100 TB default where a handful of corrupt
  * rows must not kill a multi-hour job.
  */
class VcfPermissiveSpec extends SparkSpec {
  import java.nio.file.Files
  import graft.operators.Etl.VcfFixture

  private lazy val corruptPath: String = {
    val lines = VcfFixture.lines ++ Vector(
      "1\tNOT_A_NUMBER\t.\tA\tG\t.\t.\tDP=1\tGT\t0/1\t0/0\t0/0\t0/0",
      "truncated line")
    val f = Files.createTempDirectory("vcfbad").resolve("bad.vcf")
    Files.writeString(f, lines.mkString("\n") + "\n")
    f.toString
  }

  test("strict mode surfaces the corrupt line as a failure") {
    intercept[org.apache.spark.SparkException] {
      spark.read.format("vcf").load(corruptPath).count()
    }
  }

  test("permissive mode skips corrupt lines and keeps the rest") {
    val df = spark.read.format("vcf")
      .option("permissive", "true").load(corruptPath)
    assert(df.count() == 5) // the 4 good records (5 decomposed rows)
  }

  test("Dataset-path permissive flag agrees") {
    import spark.implicits._
    val lines = VcfFixture.lines :+ "garbage\trow"
    val h = graft.sources.VcfReader.headerOf(lines)
    val body = spark.createDataset(
      lines.filter(graft.sources.VcfParser.isBodyLine))
    val df = graft.sources.VcfReader.variants(h, body, permissive = true)
    assert(df.count() == 5)
  }
}

/** Compressed-shard read: .vcf.gz (and BGZF multi-member gzip) reads
  * transparently, one partition per shard.
  */
class VcfGzipSpec extends SparkSpec {
  import java.nio.file.Files
  import graft.operators.Etl.VcfFixture

  test("gzip shard reads identically to plain text") {
    val dir = Files.createTempDirectory("vcfgz")
    val gz = dir.resolve("fixture.vcf.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    out.write((VcfFixture.lines.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
    val df = spark.read.format("vcf").load(gz.toString)
    assert(df.count() == 5)
    assert(df.filter("pos = 300").count() == 2)
  }

  test("multi-member gzip (BGZF-style) concatenation reads fully") {
    val dir = Files.createTempDirectory("vcfbgz")
    val f = dir.resolve("fixture.vcf.bgz")
    val bytes = new java.io.ByteArrayOutputStream()
    val header = VcfFixture.lines.takeWhile(_.startsWith("#"))
    val body = VcfFixture.lines.filterNot(_.startsWith("#"))
    // two independent gzip members, as bgzip produces
    for (chunk <- Seq(header.mkString("\n") + "\n", body.mkString("\n") + "\n")) {
      val gz = new java.util.zip.GZIPOutputStream(bytes)
      gz.write(chunk.getBytes("UTF-8")); gz.close()
    }
    java.nio.file.Files.write(f, bytes.toByteArray)
    val df = spark.read.format("vcf").load(f.toString)
    assert(df.count() == 5)
  }
}

/** Byte-range splitting: one big plain-text VCF fans out over multiple
  * partitions with exact once-each line ownership.
  */
class VcfSplitSpec extends SparkSpec {
  import java.nio.file.Files

  test("split read equals unsplit read on a large single file") {
    val sb = new StringBuilder
    sb ++= "##fileformat=VCFv4.2\n"
    sb ++= "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">\n"
    sb ++= "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
    (1 to 5000).foreach { i =>
      sb ++= s"${1 + i % 5}\t${i * 3}\t.\tA\tG\t.\tPASS\tDP=$i\tGT\t0/1\n"
    }
    val f = Files.createTempDirectory("vcfsplit").resolve("big.vcf")
    Files.writeString(f, sb.toString)

    val whole = spark.read.format("vcf").load(f.toString)
    val split = spark.read.format("vcf")
      .option("splitSize", "8192").load(f.toString)
    assert(split.rdd.getNumPartitions > 5, "expected many byte-range splits")
    assert(split.count() == 5000)
    // exact ownership: identical multiset of rows
    val a = whole.select("chrom", "pos", "dp").collect().map(_.toSeq).sortBy(_.toString)
    val b = split.select("chrom", "pos", "dp").collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}
