package graft

import graft.operators.Etl.VcfFixture
import graft.sources.{PedSource, VcfReader}

class VcfReaderSpec extends SparkSpec {

  test("fixture variants: decomposed rows, typed INFO, stats") {
    val (h, variants, _) = VcfReader.fromLines(spark, VcfFixture.lines)
    assert(h.samples == Vector("s1", "s2", "s3", "s4"))
    val rows = variants.orderBy("chrom", "pos", "alt").collect()
    assert(rows.length == 5) // 4 records, one with two alts
    val r0 = rows(0)
    assert(r0.getAs[String]("chrom") == "1")
    assert(r0.getAs[Int]("dp") == 10)
    assert(r0.getAs[Double]("af") == 0.25)
    assert(r0.getAs[Boolean]("db"))
    assert(r0.getAs[Double]("aaf") == 0.375)
    // multi-allelic record decomposes with per-alt AF (Number=A)
    val alts = rows.filter(_.getAs[Long]("pos") == 300L)
    assert(alts.map(_.getAs[String]("alt")).toSeq == Seq("A", "T"))
    assert(alts.map(_.getAs[Double]("af")).toSeq == Seq(0.5, 0.25))
    // Flag default false, absent scalar null
    assert(!rows(1).getAs[Boolean]("db"))
    assert(rows(4).isNullAt(rows(4).fieldIndex("dp")))
  }

  test("e63 cohort merge: union sites, file-order samples, missing ./. fills") {
    val a = VcfReader.fromLines(spark, VcfFixture.shardALines)
    val b = VcfReader.fromLines(spark, VcfFixture.shardBLines)
    val (samples, merged) =
      VcfReader.mergeVariants(Seq((a._1, a._2), (b._1, b._2)))
    assert(samples == Vector("s1", "s2", "s5", "s6"))
    val rows = merged.orderBy("chrom", "pos", "alt").collect()
    assert(rows.length == 4) // 1:100 shared, 1:200 A-only, 2:300 ×2 B-only
    val shared = rows(0)
    assert(shared.getAs[String]("vid") == "rs1") // lowest carrier's id
    assert(shared.getAs[Double]("qual") == 60.0) // max across carriers
    assert(shared.getAs[String]("filter") == "PASS") // lowest carrier's
    assert(shared.getSeq[String](shared.fieldIndex("gts")) ==
      Seq("0/1", "0/0", "1/1", "0/1"))
    assert(shared.getSeq[Int](shared.fieldIndex("gt_depths")) ==
      Seq(10, 12, -1, -1)) // shard B declares no DP FORMAT
    assert(shared.getAs[Double]("aaf") == 0.5)
    val aOnly = rows(1)
    assert(aOnly.getSeq[String](aOnly.fieldIndex("gts")) ==
      Seq("0/1", "1/1", "./.", "./."))
    assert(aOnly.getSeq[Int](aOnly.fieldIndex("gt_types")) == Seq(1, 3, 2, 2))
    assert(aOnly.getAs[Double]("call_rate") == 0.5)
    val bAltT = rows(3) // decomposed second alt of B's multi-allelic
    assert(bAltT.getAs[String]("alt") == "T")
    assert(bAltT.isNullAt(bAltT.fieldIndex("qual"))) // '.' QUAL stays null
    assert(bAltT.getSeq[Int](bAltT.fieldIndex("gt_types")) == Seq(2, 2, 1, 1))
    // duplicate sample ids across shards fail loudly (bcftools' rule)
    val ex = intercept[IllegalArgumentException] {
      VcfReader.mergeVariants(Seq((a._1, a._2), (a._1, a._2)))
    }
    assert(ex.getMessage.contains("duplicate sample ids"))
  }

  test("sites-only annotation VCF parses with empty cohort arrays") {
    val (h, ann, _) = VcfReader.fromLines(spark, VcfFixture.annLines)
    assert(h.samples.isEmpty)
    val rows = ann.orderBy("chrom", "pos", "alt").collect()
    assert(rows.length == 5) // 4 records, one decomposed into two alts
    // Number=A CAF splits per decomposed alt
    val multi = rows.filter(_.getAs[Long]("pos") == 300L)
    assert(multi.map(_.getAs[String]("alt")).toSeq == Seq("A", "T"))
    assert(multi.map(_.getAs[Double]("caf")).toSeq == Seq(0.3, 0.05))
    assert(rows(0).getAs[String]("clnsig") == "benign")
    assert(rows(0).getSeq[String](rows(0).fieldIndex("gts")).isEmpty)
  }

  test("e53 annotate-vcf: allele-exact left join, no leakage, NULL misses") {
    val got = graft.operators.Etl.e53(spark, "").collect().map(r =>
      ((r.getAs[String]("chrom"), r.getAs[Long]("pos"), r.getAs[String]("alt")),
        (r.getAs[String]("rsid"), r.getAs[String]("clnsig")))).toMap
    assert(got.size == 5) // cohort rows only — 3:500 rs99 must not leak
    assert(got(("1", 200L, "T")) == (("rs77", "pathogenic")))
    // per-alt CAF: each decomposed alt of 2:300 annotated independently
    assert(got(("2", 300L, "A")) == (("rs3", null)))
    // cohort variant absent from the annotation source survives as NULL
    assert(got(("X", 400L, "C")) == ((null, null)))
  }

  test("fixture variants: full FORMAT arrays (DP/GQ/AD + gts)") {
    val (_, variants, _) = VcfReader.fromLines(spark, VcfFixture.lines)
    val rows = variants.orderBy("chrom", "pos", "alt").collect()
    def ints(r: org.apache.spark.sql.Row, c: String): Seq[Int] =
      r.getAs[scala.collection.Seq[Int]](c).toSeq
    def strs(r: org.apache.spark.sql.Row, c: String): Seq[String] =
      r.getAs[scala.collection.Seq[String]](c).toSeq
    val r0 = rows(0) // 1:100 A>G, GT:DP:GQ:AD
    assert(strs(r0, "gts") == Seq("0/1", "0/0", "0/0", "1/1"))
    assert(ints(r0, "gt_depths") == Seq(10, 12, 9, 7))
    assert(ints(r0, "gt_quals") == Seq(99, 80, 50, 20))
    assert(ints(r0, "gt_ref_depths") == Seq(5, 12, 9, 0))
    assert(ints(r0, "gt_alt_depths") == Seq(5, 0, 0, 7))
    val r1 = rows(1) // 1:200 C>T — GQ '.' for uncalled samples → -1
    assert(ints(r1, "gt_quals") == Seq(45, 60, -1, -1))
    // GT-only records: numeric arrays are all missing, gts still carried
    val r2 = rows(2) // 2:300 G>A
    assert(strs(r2, "gts") == Seq("1/2", "0/1", "2/2", "0/0"))
    assert(ints(r2, "gt_depths") == Seq(-1, -1, -1, -1))
    assert(ints(r2, "gt_alt_depths") == Seq(-1, -1, -1, -1))
  }

  test("FORMAT PL splits into phred-likelihood columns with decompose indexing") {
    val lines = Vector(
      "##fileformat=VCFv4.2",
      "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"Genotype\">",
      "##FORMAT=<ID=PL,Number=G,Type=Integer,Description=\"Phred likelihoods\">",
      Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO",
        "FORMAT", "s1", "s2").mkString("\t"),
      // biallelic: PL = [0/0, 0/1, 1/1]
      Seq("1", "100", ".", "A", "G", "99", "PASS", ".", "GT:PL",
        "0/1:40,0,35", "0/0:0,21,210").mkString("\t"),
      // multiallelic: PL over [0/0, 0/1, 1/1, 0/2, 1/2, 2/2] — alt 2's
      // triple is indexes (0, 3, 5); '.' and short lists → -1
      Seq("1", "200", ".", "C", "G,T", "99", "PASS", ".", "GT:PL",
        "1/2:50,10,0,45,5,60", "2/2:.").mkString("\t"))
    val (_, variants, _) = VcfReader.fromLines(spark, lines)
    val rows = variants.orderBy("pos", "alt").collect()
    def ints(r: org.apache.spark.sql.Row, c: String): Seq[Int] =
      r.getAs[scala.collection.Seq[Int]](c).toSeq
    val bi = rows(0)
    assert(ints(bi, "gt_phred_ll_homref") == Seq(40, 0))
    assert(ints(bi, "gt_phred_ll_het") == Seq(0, 21))
    assert(ints(bi, "gt_phred_ll_homalt") == Seq(35, 210))
    val altG = rows(1) // 200 C>G (alt index 1)
    assert(ints(altG, "gt_phred_ll_het") == Seq(10, -1))
    assert(ints(altG, "gt_phred_ll_homalt") == Seq(0, -1))
    val altT = rows(2) // 200 C>T (alt index 2): triple (0, 3, 5)
    assert(ints(altT, "gt_phred_ll_homref") == Seq(50, -1))
    assert(ints(altT, "gt_phred_ll_het") == Seq(45, -1))
    assert(ints(altT, "gt_phred_ll_homalt") == Seq(60, -1))
    // no PL in FORMAT → all Missing
    val (_, noPl, _) = VcfReader.fromLines(spark, VcfFixture.lines)
    val r = noPl.limit(1).collect().head
    assert(ints(r, "gt_phred_ll_homref").forall(_ == -1))
  }

  test("FORMAT without GT still yields cohort-width unknown gt arrays") {
    val lines = Vector(
      "##fileformat=VCFv4.2",
      "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"Read depth\">",
      Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO",
        "FORMAT", "s1", "s2", "s3").mkString("\t"),
      Seq("1", "100", ".", "A", "G", "99", "PASS", ".", "DP",
        "10", "12", "9").mkString("\t"))
    val (_, variants, _) = VcfReader.fromLines(spark, lines)
    val r = variants.collect().head
    def ints(c: String) = r.getAs[scala.collection.Seq[Int]](c).toSeq
    assert(ints("gt_types") == Seq(2, 2, 2), "no GT -> UNKNOWN, full width")
    assert(r.getAs[scala.collection.Seq[String]]("gts").toSeq == Seq("", "", ""))
    assert(ints("gt_depths") == Seq(10, 12, 9))
    assert(r.getAs[Int]("num_unknown") == 3)
  }

  test("CSQ entries with VEP-minimised indel alleles attach to their alt") {
    val lines = Vector(
      "##fileformat=VCFv4.2",
      "##INFO=<ID=CSQ,Number=.,Type=String,Description=\"Consequence annotations from Ensembl VEP. Format: Allele|Consequence|SYMBOL\">",
      Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO").mkString("\t"),
      // insertion T>TA: VEP Allele = 'A'; deletion TA>T: Allele = '-'
      Seq("1", "100", ".", "T", "TA", "99", "PASS",
        "CSQ=A|frameshift_variant|G1").mkString("\t"),
      Seq("1", "200", ".", "TA", "T", "99", "PASS",
        "CSQ=-|inframe_deletion|G2").mkString("\t"))
    val (_, _, impacts) = VcfReader.fromLines(spark, lines)
    val rows = impacts.orderBy("pos").collect()
    assert(rows.length == 2, "indel annotations must not drop")
    assert(rows(0).getAs[String]("alt") == "TA" &&
      rows(0).getAs[String]("consequence") == "frameshift_variant")
    assert(rows(1).getAs[String]("alt") == "T" &&
      rows(1).getAs[String]("consequence") == "inframe_deletion")
  }

  test("gt_phases flags phased calls") {
    val lines = Vector(
      "##fileformat=VCFv4.2",
      "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"Genotype\">",
      Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO",
        "FORMAT", "s1", "s2", "s3").mkString("\t"),
      Seq("1", "100", ".", "A", "G", "99", "PASS", ".", "GT",
        "0|1", "0/1", "./.").mkString("\t"))
    val (_, variants, _) = VcfReader.fromLines(spark, lines)
    val r = variants.collect().head
    assert(r.getAs[scala.collection.Seq[Int]]("gt_phases").toSeq == Seq(1, 0, 0))
  }

  test("fixture impacts: CSQ expansion with severity") {
    val (_, _, impacts) = VcfReader.fromLines(spark, VcfFixture.lines)
    val rows = impacts.orderBy("chrom", "pos", "alt", "severity_rank").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[String]("consequence")).toSeq ==
      Seq("missense_variant", "intron_variant", "stop_gained",
        "synonymous_variant", "frameshift_variant"))
    assert(rows.map(_.getAs[String]("impact_severity")).toSeq ==
      Seq("MED", "LOW", "HIGH", "LOW", "HIGH"))
    // allele-matched: the A entry attaches only to the A alt
    assert(rows.filter(_.getAs[String]("alt") == "A")
      .forall(_.getAs[String]("allele") == "A"))
  }

  test("Number=R/G INFO fields become typed per-alt arrays") {
    val (_, variants, _) = VcfReader.fromLines(spark, VcfFixture.lines)
    val rows = variants.orderBy("chrom", "pos", "alt").collect()
    def ints(r: org.apache.spark.sql.Row, c: String): Seq[Int] =
      r.getAs[scala.collection.Seq[Int]](c).toSeq
    // biallelic: R → [ref, alt], G → [0/0, 0/1, 1/1]
    assert(ints(rows(0), "adi") == Seq(30, 12))
    assert(ints(rows(0), "pl") == Seq(0, 40, 90))
    // multi-allelic decompose: each alt picks ITS allele/genotype slots
    val a = rows(2) // 2:300 G>A (altIx 1)
    val t = rows(3) // 2:300 G>T (altIx 2)
    assert(ints(a, "adi") == Seq(20, 8) && ints(t, "adi") == Seq(20, 5))
    assert(ints(a, "pl") == Seq(10, 20, 30)) // G indices 0,1,2
    assert(ints(t, "pl") == Seq(10, 40, 60)) // G indices 0,3,5
    // absent field → NULL array, not empty
    assert(rows(1).isNullAt(rows(1).fieldIndex("adi")))
  }

  test("PED source: base + extra columns") {
    val df = PedSource.fromLines(spark, Seq(
      "#family_id sample_id paternal_id maternal_id sex phenotype ethnicity",
      "fam1 s1 -9 -9 1 2 eur",
      "fam1 s2 s1 -9 2 1 afr"))
    assert(df.columns.toSeq ==
      Seq("family_id", "sample_id", "paternal_id", "maternal_id", "sex",
        "phenotype", "ethnicity"))
    val rows = df.orderBy("sample_id").collect()
    assert(rows.map(_.getAs[String]("ethnicity")).toSeq == Seq("eur", "afr"))
  }

  test("pruned decomposedRows leaves unneeded slots null, needed ones intact") {
    import graft.sources.VcfParser
    val h = VcfParser.parseHeader(VcfFixture.lines)
    val body = VcfFixture.lines.filter(graft.sources.VcfParser.isBodyLine)
    val full = VcfReader.decomposedRows(h, body.head)
    val pruned = VcfReader.decomposedRows(h, body.head,
      Set("chrom", "pos", "aaf"))
    val schema = VcfReader.variantSchema(h)
    def ix(n: String) = schema.fieldIndex(n)
    assert(pruned.length == full.length)
    val (p0, f0) = (pruned.head, full.head)
    assert(p0.get(ix("chrom")) == f0.get(ix("chrom")))
    assert(p0.get(ix("pos")) == f0.get(ix("pos")))
    assert(p0.get(ix("aaf")) == f0.get(ix("aaf")), "aaf needs gt stats computed")
    // unneeded expensive slots skipped (null), present in the full parse
    Seq("dp", "gt_types", "gts", "gt_depths", "gt_quals", "gt_phases").foreach { c =>
      assert(p0.get(ix(c)) == null, s"$c should be skipped in the pruned parse")
      assert(f0.get(ix(c)) != null)
    }
  }

  test("PED source: whitespace lines skipped; gzipped path reads transparently") {
    val df = PedSource.fromLines(spark, Seq(
      "#family_id sample_id paternal_id maternal_id sex phenotype",
      "fam1 s1 -9 -9 1 2",
      "   ", // must not become a phantom sample
      ""))
    assert(df.count() == 1)
    val dir = java.nio.file.Files.createTempDirectory("ped_gz")
    val gz = dir.resolve("cohort.ped.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    out.write(("#family_id sample_id paternal_id maternal_id sex phenotype\n" +
      "fam1 s1 -9 -9 1 2\nfam1 s2 s1 -9 2 1\n").getBytes("UTF-8"))
    out.close()
    val back = PedSource.fromPath(spark, gz.toString)
    assert(back.count() == 2)
    assert(back.orderBy("sample_id").collect().map(_.getString(1)).toSeq ==
      Seq("s1", "s2"))
  }

  test("vcf_header raw lines preserved (reference's vcf_header table)") {
    val (h, _, _) = VcfReader.fromLines(spark, VcfFixture.lines)
    assert(h.rawLines.size == 13)
    assert(h.rawLines.head == "##fileformat=VCFv4.2")
  }

  test("e30 HWE chi-square and inbreeding F match hand-computed values") {
    import graft.operators.Etl
    val rows = Etl.hwe(spark, VcfFixture.variants(spark)).collect()
    assert(rows.length == 5)
    def r(chrom: String, pos: Long, alt: String) = rows.find(x =>
      x.getAs[String]("chrom") == chrom && x.getAs[Long]("pos") == pos &&
        x.getAs[String]("alt") == alt).get
    // 1:100 G — counts (2 hom-ref, 1 het, 1 hom-alt), p_ref = 5/8
    val a = r("1", 100L, "G")
    assert(a.getAs[Int]("n_called") == 4)
    assert(a.getAs[Double]("p_ref") == 0.625)
    assert(math.abs(a.getAs[Double]("hwe_chi2") - 0.8711111111111111) < 1e-12)
    assert(math.abs(a.getAs[Double]("inbreeding_f") - 0.4666666666666667) < 1e-12)
    // 1:200 T — all-het (0,2,0): maximal het excess, F = -1, chi2 = n = 2
    val b = r("1", 200L, "T")
    assert(b.getAs[Double]("hwe_chi2") == 2.0)
    assert(b.getAs[Double]("inbreeding_f") == -1.0)
    // X:400 C — (0,2,2), p_ref = 1/4
    val c = r("X", 400L, "C")
    assert(math.abs(c.getAs[Double]("hwe_chi2") - 0.4444444444444444) < 1e-12)
    assert(math.abs(c.getAs[Double]("inbreeding_f") - (-1.0 / 3.0)) < 1e-12)
  }

  test("e30 HWE guards: monomorphic sites yield NULL statistics") {
    import org.apache.spark.sql.functions._
    // all hom-ref (p=1) and all hom-alt (p=0): chi2/F undefined -> NULL
    val df = spark.range(2).select(
      lit("1").as("chrom"), col("id").as("pos"), lit("G").as("alt"),
      when(col("id") === 0, typedLit(Seq(0, 0, 0)))
        .otherwise(typedLit(Seq(3, 3, 3))).as("gt_types"))
    val out = graft.operators.Etl.hwe(spark, df).collect()
    assert(out.length == 2)
    out.foreach { row =>
      assert(row.isNullAt(row.fieldIndex("hwe_chi2")))
      assert(row.isNullAt(row.fieldIndex("inbreeding_f")))
    }
  }
}
