package graft

import graft.operators.Sv

/** Value-level checks for the SV breakend / fusion tools on the
  * embedded SV fixture (hand-derived expectations).
  */
class SvSpec extends SparkSpec {

  test("breakends parses mate coordinates from every BND alt form") {
    val (_, variants, _) =
      graft.sources.VcfReader.fromLines(spark, Sv.SvFixture.lines)
    val got = Sv.breakends(variants)
      .select("chrom", "pos", "alt", "mate_chrom", "mate_pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    // the <DEL> symbolic alt must NOT parse as a breakend
    assert(got == Set(
      ("2", 100100L, "A[17:200200[", "17", 200200L),
      ("2", 100500L, "T]2:100800]", "2", 100800L),
      ("2", 100200L, "A[2:100650[", "2", 100650L),
      ("2", 100250L, "]2:100900]G", "2", 100900L),
      ("5", 50000L, "C[2:100300[", "2", 100300L),
      ("17", 200200L, "]2:100100]G", "2", 100100L)))
  }

  test("e45 reports only the inter-gene reciprocal pair") {
    val got = Sv.e45(spark, "").collect().map(r =>
      (r.getAs[String]("chrom"), r.getAs[Long]("pos"),
        r.getAs[String]("gene_a"), r.getAs[String]("gene_b")))
    // intra-gene bnd3 (both ends GENE_A) and gene-less-mate bnd5 drop;
    // the reciprocal pair reports one row per breakend, mirrored
    assert(got.toSeq == Seq(
      ("17", 200200L, "GENE_B", "GENE_A"),
      ("2", 100100L, "GENE_A", "GENE_B")))
  }

  test("fusions spans a bin boundary when a gene straddles it") {
    import spark.implicits._
    // gene crosses the 100 k bin edge; breakend pos in bin 1, gene
    // starts in bin 0 — the bin explode must still find it
    val genes = Seq(("1", 99000L, 101000L, "G1"), ("9", 500L, 900L, "G2"))
      .toDF("g_chrom", "g_start", "g_end", "gene")
    val v = Seq(("1", 100100L, "A[9:600[")).toDF("chrom", "pos", "alt")
    val got = Sv.fusions(v, genes).collect()
    assert(got.length == 1 &&
      got(0).getAs[String]("gene_a") == "G1" &&
      got(0).getAs[String]("gene_b") == "G2")
  }
  test("e58 classifies symbolic and breakend records with spans") {
    val got = graft.operators.Sv.queries("e58_sv_classify")(spark, "")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got(("2", 100100L)) == (("TRA", -1L)))  // inter-chrom junction
    assert(got(("2", 100200L)) == (("DEL", 450L))) // t[p[ downstream mate
    assert(got(("2", 100250L)) == (("DUP", 650L))) // ]p]t upstream anchor
    assert(got(("2", 100500L)) == (("INV", 300L))) // t]p] same-side join
    assert(got(("2", 100700L)) == (("DEL", 201L))) // symbolic END span
    assert(got(("5", 50000L)) == (("TRA", -1L)))
    assert(got(("17", 200200L)) == (("TRA", -1L)))
  }
}
