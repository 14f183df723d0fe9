package graft

import graft.operators.Burden

/** Value-level checks for the burden tool family against hand-derived
  * expectations on the embedded VCF/PED fixture (1 case, 3 controls,
  * p0 = 1/4 — dyadic, so every C-alpha intermediate is exact).
  */
class BurdenSpec extends SparkSpec {

  test("e31 lof_sieve lists exactly the LoF carriers") {
    val rows = Burden.e31(spark, "").collect()
    val got = rows.map(r => (r.getAs[String]("chrom"), r.getAs[Long]("pos"),
      r.getAs[String]("alt"), r.getAs[String]("sample"),
      r.getAs[Int]("gt_class"))).toSet
    // stop_gained 1:200 T carried het by s1,s2; frameshift 2:300 T
    // carried het by s1 (1/2) and hom by s3 (2/2)
    assert(got == Set(
      ("1", 200L, "T", "s1", 1), ("1", 200L, "T", "s2", 1),
      ("2", 300L, "T", "s1", 1), ("2", 300L, "T", "s3", 3)))
    assert(rows.forall(r =>
      Burden.lofConsequences.contains(r.getAs[String]("consequence"))))
  }

  test("e32 burden matrix counts damaging variants per gene per sample") {
    val got = Burden.e32(spark, "").collect().map(r =>
      (r.getAs[String]("symbol"), r.getAs[String]("sample"),
        r.getAs[Long]("n_variants"))).toSet
    // 2:300 A is synonymous (LOW) and does NOT count; only 2:300 T does
    assert(got == Set(
      ("BRCA1", "s1", 1L), ("BRCA1", "s4", 1L), // 1:100 G het s1, hom s4
      ("TP53", "s1", 1L), ("TP53", "s2", 1L), // 1:200 T het s1,s2
      ("EGFR", "s1", 1L), ("EGFR", "s3", 1L))) // 2:300 T het s1, hom s3
  }

  test("e33 C-alpha matches hand-computed T, c, and Z per gene") {
    val rows = Burden.e33(spark, "").collect()
    def r(sym: String) = rows.find(_.getAs[String]("symbol") == sym).get
    // BRCA1 (y=1, n=3): T = (1-.75)^2 - .5625 = -0.5, c = 0.5625
    val brca = r("BRCA1")
    assert(brca.getAs[Double]("t_stat") == -0.5)
    assert(brca.getAs[Double]("c_var") == 0.5625)
    assert(math.abs(brca.getAs[Double]("z_score") - (-2.0 / 3.0)) < 1e-15)
    // TP53 (y=1, n=2): T = (1-.5)^2 - .375 = -0.125, c = 15/64
    val tp53 = r("TP53")
    assert(tp53.getAs[Double]("t_stat") == -0.125)
    assert(tp53.getAs[Double]("c_var") == 0.234375)
    // EGFR = A-variant (y=1,n=2) + T-variant (y=1,n=3), sums of the above
    val egfr = r("EGFR")
    assert(egfr.getAs[Double]("t_stat") == -0.625)
    assert(egfr.getAs[Double]("c_var") == 0.796875)
    assert(math.abs(egfr.getAs[Double]("z_score") -
      (-0.625 / math.sqrt(0.796875))) < 1e-15)
  }

  test("calpha rejects a non-dyadic case fraction") {
    intercept[IllegalArgumentException] {
      Burden.calpha(spark, Set("s1"), 3) // p0 = 1/3 cannot be bit-shared
    }
  }
}
