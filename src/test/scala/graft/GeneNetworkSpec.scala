package graft

import graft.operators.GeneNetwork

/** Value-level checks for the gemini gene-network tools on the
  * embedded fixture (hand-derived expectations).
  */
class GeneNetworkSpec extends SparkSpec {

  test("e41 pathways annotates carrier samples with gene pathways") {
    val got = GeneNetwork.e41(spark, "").collect().map(r =>
      (r.getAs[String]("chrom"), r.getAs[Long]("pos"), r.getAs[String]("alt"),
        r.getAs[String]("gene"), r.getAs[String]("pathway"),
        r.getAs[String]("sample"))).toSet
    // carriers: 1:100G s1,s4 (BRCA1); 1:200T s1,s2 (TP53);
    // 2:300A s1,s2 (EGFR); 2:300T s1,s3 (EGFR); X:400C has no impacts
    val expect = for {
      (c, p, a, g, samples) <- Seq(
        ("1", 100L, "G", "BRCA1", Seq("s1", "s4")),
        ("1", 200L, "T", "TP53", Seq("s1", "s2")),
        ("2", 300L, "A", "EGFR", Seq("s1", "s2")),
        ("2", 300L, "T", "EGFR", Seq("s1", "s3")))
      pw <- Map(
        "BRCA1" -> Seq("dna_repair", "cancer"),
        "TP53" -> Seq("cancer", "apoptosis"),
        "EGFR" -> Seq("signaling"))(g)
      sm <- samples
    } yield (c, p, a, g, pw, sm)
    assert(got == expect.toSet)
  }

  test("e42 interactions reaches TP53 at hop 1 and EGFR at hop 2") {
    val got = GeneNetwork.e42(spark, "").collect().map(r =>
      (r.getAs[String]("gene"), r.getAs[Int]("hops"), r.getAs[String]("chrom"),
        r.getAs[Long]("pos"), r.getAs[String]("alt"),
        r.getAs[String]("sample"))).toSet
    val expect = Set(
      ("TP53", 1, "1", 200L, "T", "s1"), ("TP53", 1, "1", 200L, "T", "s2"),
      ("EGFR", 2, "2", 300L, "A", "s1"), ("EGFR", 2, "2", 300L, "A", "s2"),
      ("EGFR", 2, "2", 300L, "T", "s1"), ("EGFR", 2, "2", 300L, "T", "s3"))
    assert(got == expect)
  }

  test("interactions excludes the seed gene even when a cycle returns to it") {
    import graft.sources.VcfReader
    import graft.operators.Etl.VcfFixture
    val (h, variants, impacts) = VcfReader.fromLines(spark, VcfFixture.lines)
    val genes = GeneNetwork.interactions(spark, variants, impacts, h.samples,
      seed = "BRCA1", radius = 3)
      .collect().map(_.getAs[String]("gene")).toSet
    assert(!genes.contains("BRCA1"))
  }
}
