package graft

import graft.operators.Somatic

/** Value-level checks for the tumor-normal tools on the embedded
  * fixture (hand-derived expectations).
  */
class SomaticSpec extends SparkSpec {

  test("e43 flags the one pair-variant passing depth and frequency gates") {
    val got = Somatic.e43(spark, "").collect().map(r =>
      (r.getAs[String]("chrom"), r.getAs[Long]("pos"), r.getAs[String]("alt"),
        r.getAs[String]("tumor"), r.getAs[String]("normal"),
        r.getAs[Int]("tumor_dp"), r.getAs[Int]("normal_dp"),
        r.getAs[Double]("tumor_alt_freq"), r.getAs[Double]("normal_alt_freq")))
    // 1:100 (s1 tumor AD 5,5 dp10; s2 normal AD 12,0 dp12) passes;
    // 1:200 fails tumor depth (8) AND normal depth (9); 2:300/X:400
    // have no AD (the -1 sentinel fails the depth floor); pair (s4,s3)
    // fails tumor depth (7) at 1:100.
    assert(got.toSeq == Seq(("1", 100L, "G", "s1", "s2", 10, 12, 0.5, 0.0)))
  }

  test("e44 restricts somatic candidates to damaging panel impacts") {
    val got = Somatic.e44(spark, "").collect().map(r =>
      (r.getAs[String]("chrom"), r.getAs[Long]("pos"), r.getAs[String]("alt"),
        r.getAs[String]("gene"), r.getAs[String]("consequence"),
        r.getAs[String]("impact_severity"), r.getAs[String]("tumor")))
    // 1:100 G's BRCA1 missense (MED) is in the panel; its intron
    // impact is LOW and drops
    assert(got.toSeq ==
      Seq(("1", 100L, "G", "BRCA1", "missense_variant", "MED", "s1")))
  }
  test("e57 LOH calls HET normals collapsing in the tumor, both directions") {
    val got = graft.operators.Somatic.queries("e57_loh")(spark, "")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(5))).toSet
    // s1 HET at 1:100 and 2:300(T) collapses to REF in tumor s2; s3 HET
    // at X:400 collapses to ALT in tumor s1
    assert(got == Set(
      ("1", 100L, "G", "s2", "ref"),
      ("2", 300L, "T", "s2", "ref"),
      ("X", 400L, "C", "s1", "alt")))
  }
}
