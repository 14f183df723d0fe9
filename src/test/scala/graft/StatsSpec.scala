package graft

import graft.operators.Stats

/** Value-level checks for the gemini-stats family on the embedded
  * fixture (hand-derived expectations).
  */
class StatsSpec extends SparkSpec {

  test("e35 site frequency spectrum bins alt-allele counts") {
    val got = Stats.e35(spark, "").collect()
      .map(r => (r.getAs[Int]("ac"), r.getAs[Long]("n_variants"))).toSet
    // ACs: 1:100 G=3, 1:200 T=2, 2:300 A=2, 2:300 T=3, X:400 C=6
    assert(got == Set((2, 2L), (3, 2L), (6, 1L)))
  }

  test("e36 MDS pairwise distances match hand-computed values") {
    val got = Stats.e36(spark, "").collect().map(r =>
      ((r.getAs[String]("sample_a"), r.getAs[String]("sample_b")),
        (r.getAs[Long]("n_sites"), r.getAs[Double]("distance")))).toMap
    // copies per (variant, sample), unknown excluded:
    // 1:100 (1,0,0,2); 1:200 (1,1,-,-); 2:300A (1,1,0,0);
    // 2:300T (1,0,2,0); X:400 (2,2,1,1)
    assert(got(("s1", "s2")) == ((5L, 0.4)))
    assert(got(("s1", "s3")) == ((4L, 1.0)))
    assert(got(("s1", "s4")) == ((4L, 1.0)))
    assert(got(("s2", "s3")) == ((4L, 1.5)))
    assert(got(("s2", "s4")) == ((4L, 1.5)))
    assert(got(("s3", "s4")) == ((4L, 2.0)))
  }

  test("e37 show-samples lists het and hom-alt carriers per variant") {
    val got = Stats.e37(spark, "").collect().map(r =>
      ((r.getAs[String]("chrom"), r.getAs[Long]("pos"), r.getAs[String]("alt")),
        (r.getAs[String]("het_samples"), r.getAs[String]("hom_alt_samples"))))
      .toMap
    assert(got(("1", 100L, "G")) == (("s1", "s4")))
    assert(got(("1", 200L, "T")) == (("s1,s2", "")))
    assert(got(("2", 300L, "A")) == (("s1,s2", "")))
    assert(got(("2", 300L, "T")) == (("s1", "s3")))
    assert(got(("X", 400L, "C")) == (("s3,s4", "s1,s2")))
  }

  test("e38 vars-by-sample counts carried variants per sample") {
    val got = Stats.e38(spark, "").collect()
      .map(r => (r.getAs[String]("sample"), r.getAs[Long]("n_variants")))
      .toMap
    // carrier classes per sample across the 5 decomposed variants:
    // s1 (1,1,1,1,3)=5; s2 (0,1,1,0,3)=3; s3 (0,2,0,3,1)=2; s4 (3,2,0,0,1)=2
    assert(got == Map("s1" -> 5L, "s2" -> 3L, "s3" -> 2L, "s4" -> 2L))
  }

  test("e39 gts-by-sample tallies genotype classes per sample") {
    val got = Stats.e39(spark, "").collect().map(r =>
      (r.getAs[String]("sample"),
        (r.getAs[Long]("n_hom_ref"), r.getAs[Long]("n_het"),
          r.getAs[Long]("n_hom_alt"), r.getAs[Long]("n_unknown")))).toMap
    assert(got("s1") == ((0L, 4L, 1L, 0L)))
    assert(got("s2") == ((2L, 2L, 1L, 0L)))
    assert(got("s3") == ((2L, 1L, 1L, 1L)))
    assert(got("s4") == ((2L, 1L, 1L, 1L)))
  }

  test("e40 carrier summary splits carriers by PED phenotype") {
    val got = Stats.e40(spark, "").collect().map(r =>
      ((r.getAs[String]("chrom"), r.getAs[Long]("pos"), r.getAs[String]("alt")),
        (r.getAs[Long]("n_aff_carrier"), r.getAs[Long]("n_aff_noncarrier"),
          r.getAs[Long]("n_unaff_carrier"),
          r.getAs[Long]("n_unaff_noncarrier")))).toMap
    // affected = s1 only; unknown genotypes count toward neither side
    assert(got(("1", 100L, "G")) == ((1L, 0L, 1L, 2L)))
    assert(got(("1", 200L, "T")) == ((1L, 0L, 1L, 0L)))
    assert(got(("2", 300L, "A")) == ((1L, 0L, 1L, 2L)))
    assert(got(("2", 300L, "T")) == ((1L, 0L, 1L, 2L)))
    assert(got(("X", 400L, "C")) == ((1L, 0L, 3L, 0L)))
  }

  test("e47 gene_wise keeps only genes hit in >= 2 kindreds") {
    val got = Stats.e47(spark, "").collect().map(r =>
      (r.getAs[String]("gene"), r.getAs[String]("chrom"),
        r.getAs[Long]("pos"), r.getAs[String]("alt"),
        r.getAs[String]("family_id"), r.getAs[Int]("n_kindreds")))
    // BRCA1 (1:100 G: s1@F1 het, s4@F2 hom-alt) is the only gene whose
    // carriers span both fixture families; TP53/EGFR carriers are all F1
    assert(got.toSeq == Seq(
      ("BRCA1", "1", 100L, "G", "F1", 2),
      ("BRCA1", "1", 100L, "G", "F2", 2)))
  }

  test("e48 snp-counts tallies substitution types over SNP rows") {
    val got = Stats.e48(spark, "").collect().map(r =>
      r.getAs[String]("substitution") -> r.getAs[Long]("n_variants")).toMap
    assert(got == Map("A->G" -> 1L, "C->T" -> 1L, "G->A" -> 1L,
      "G->T" -> 1L, "T->C" -> 1L))
  }

  test("e49 TPED recode: biallelic bases, other-alt and missing -> 0 0") {
    val got = Stats.e49(spark, "").collect().map(r =>
      (r.getAs[String]("snp_id"), r.getAs[String]("genotypes")))
    // 1:100 A>G: 0/1 -> "A G", 0/0 -> "A A", 1/1 -> "G G"
    assert(got.contains(("rs1", "A G A A A A G G")))
    // 1:200 missing calls degrade to plink's 0 0
    assert(got.contains(("1:200", "C T C T 0 0 0 0")))
    // 2:300 multi-allelic: samples carrying the OTHER alt are 0 0 on
    // each decomposed row; clean hom-alt (2/2 on the T row) survives
    assert(got.contains(("rs3", "0 0 0 0 T T G G"))) // T row
    assert(got.contains(("rs3", "0 0 G A 0 0 G G"))) // A row
    assert(got.count(_._1 == "rs3") == 2)
  }

  test("e51 ts/tv stratified by worst-impact severity, one row per variant") {
    val got = Stats.e51(spark, "").collect().map(r =>
      (r.getAs[String]("impact_severity"),
        (r.getAs[Long]("n_ts"), r.getAs[Long]("n_tv")))).toMap
    // worst per variant: 1:100 A>G MED (ts), 1:200 C>T HIGH (ts),
    // 2:300 G>A LOW (ts), 2:300 G>T HIGH (tv); X:400 has no impact row
    assert(got == Map("HIGH" -> ((1L, 1L)), "MED" -> ((1L, 0L)),
      "LOW" -> ((1L, 0L))))
    val high = Stats.e51(spark, "").filter("impact_severity = 'HIGH'")
      .collect().head
    assert(high.getAs[Double]("tstv") == 1.0)
  }

  test("e52 VCF export reassembles spec-conformant body lines") {
    val got = Stats.e52(spark, "").collect().map(r =>
      ((r.getAs[String]("chrom"), r.getAs[Long]("pos"), r.getAs[String]("alt")),
        r.getAs[String]("vcf_line"))).toMap
    assert(got(("1", 100L, "G")) ==
      "1\t100\trs1\tA\tG\t50.0\tPASS\tDP=10;AF=0.25;DB")
    // null qual/filter render as '.'; multiallelic decomposed rows keep
    // their own alt
    assert(got(("2", 300L, "T")) == "2\t300\trs3\tG\tT\t.\tq10\tDP=5;AF=0.25")
    // no INFO fields at all would render '.'; X:400 has AF and TYPE
    assert(got(("X", 400L, "C")) == "X\t400\t.\tT\tC\t10.5\t.\tAF=0.75;TYPE=snp")
  }

  test("e54 JSON export lines parse and round-trip the typed fields") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val out = Stats.e54(spark, "")
    val schema = StructType(Seq(
      StructField("chrom", StringType), StructField("pos", LongType),
      StructField("id", StringType), StructField("ref", StringType),
      StructField("alt", StringType), StructField("qual", DoubleType),
      StructField("filter", StringType), StructField("dp", LongType),
      StructField("af", DoubleType)))
    // every line must be machine-parseable JSON whose fields equal the
    // source columns (from_json yields null for a corrupt record —
    // chrom is never null in the fixture, so parsed.chrom catches it)
    val parsed = out.select(col("pos").as("src_pos"), col("alt").as("src_alt"),
      from_json(col("json_line"), schema).as("j"))
    val rows = parsed.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val j = r.getStruct(2)
      assert(j.getAs[String]("chrom") != null, s"unparseable JSON in $r")
      assert(j.getAs[Long]("pos") == r.getLong(0))
      assert(j.getAs[String]("alt") == r.getString(1))
    }
    // null handling: X:400 has no id/filter/dp -> JSON nulls, af present
    val x = rows.map(_.getStruct(2)).find(_.getAs[String]("chrom") == "X").get
    assert(x.getAs[String]("id") == null && x.getAs[String]("filter") == null)
    assert(x.getAs[Double]("af") == 0.75)
  }

  test("e54 jsonEscape survives quotes and backslashes in string fields") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hostile field values a real VCF can carry (ID/FILTER free text)
    val hostile = Seq("""plain""", """has "quotes" inside""",
      """back\slash""", """both \" mixed \\ ends\""").toDF("v")
    val rt = hostile
      .select($"v", concat(lit("{\"v\": \""),
        graft.operators.Stats.jsonEscape($"v"), lit("\"}")).as("line"))
      .select($"v", get_json_object($"line", "$.v").as("parsed"))
      .collect()
    rt.foreach { r =>
      assert(r.getString(1) != null, s"unparseable JSON for ${r.getString(0)}")
      assert(r.getString(1) == r.getString(0),
        s"round-trip mismatch: '${r.getString(0)}' -> '${r.getString(1)}'")
    }
  }

  test("e55 db_info inventories every testdata table and column") {
    val got = Stats.e55(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(got.map(_._1).distinct.sorted.toSeq == graft.Tables.all.sorted)
    val li = got.filter(_._1 == "lineitem").sortBy(_._3)
    assert(li.head == ("lineitem", "l_orderkey", 1))
    assert(li.map(_._2).toSeq == Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"))
    // ordinals are 1-based and contiguous per table
    got.groupBy(_._1).foreach { case (t, cols) =>
      assert(cols.map(_._3).sorted.toSeq == (1 to cols.length),
        s"$t ordinals not contiguous")
    }
  }

  test("e56 GTF parsing: attribute extraction, gene-row precedence, hulls") {
    import graft.sources.GtfSource
    val rows = GtfSource.parse(Stats.gtfLines)
    // comments skipped; attributes parsed from the quoted key-value list
    assert(rows.length == 5)
    assert(rows.head.getString(5) == "ENSG1" && rows.head.getString(6) == "BRCA1")
    val genes = GtfSource.genes(GtfSource.fromLines(spark, Stats.gtfLines))
      .collect().map(r => r.getAs[String]("gene_id") ->
        ((r.getAs[Long]("r_start"), r.getAs[Long]("r_end"),
          r.getAs[String]("strand")))).toMap
    // explicit gene row wins verbatim
    assert(genes("ENSG1") == ((50L, 150L, "+")))
    // no gene row -> transcript/exon hull (min start 180, max end 260)
    assert(genes("ENSG2") == ((180L, 260L, "-")))
    // a gene_name-less record falls back to gene_id
    val bare = GtfSource.parse(Vector(
      "3\tx\tgene\t1\t9\t.\t+\t.\tgene_id \"G9\";")).head
    assert(bare.getString(6) == "G9")
    // the e56 join itself: X:400 sits in no gene span and must not appear
    val out = Stats.e56(spark, "").collect()
    assert(out.length == 4 && !out.exists(_.getString(0) == "X"))
  }

  test("e34 annotate-extract aggregates overlapping interval scores") {
    val got = Stats.e34(spark, "").collect().map(r =>
      ((r.getAs[String]("chrom"), r.getAs[Long]("pos"), r.getAs[String]("alt")),
        (r.getAs[Int]("n_overlaps"), r.getAs[Double]("score_mean"),
          r.getAs[Double]("score_max")))).toMap
    assert(got(("1", 100L, "G")) == ((2, 1.875, 2.25))) // (1.5+2.25)/2
    assert(got(("1", 200L, "T")) == ((1, 0.5, 0.5)))
    assert(got(("2", 300L, "A")) == ((1, 3.0, 3.0)))
    assert(got(("2", 300L, "T")) == ((1, 3.0, 3.0)))
    assert(got(("X", 400L, "C")) == ((1, 1.25, 1.25)))
  }
}
