package graft

import graft.operators.Etl
import graft.operators.Etl.VcfFixture
import graft.sources.VcfReader

/** e17 trio de-novo semantics: trio derivation from PED text and the
  * child-HET / parents-HOM-REF candidate filter over gt-array indexing.
  */
class TrioSpec extends SparkSpec {

  private def variants = VcfReader.fromLines(spark, VcfFixture.lines)
  private val samples = Seq("s1", "s2", "s3", "s4")

  test("e17 finds exactly the fixture's one de novo candidate with depths") {
    val (_, v, _) = variants
    val rows = Etl.trioDenovo(spark, v, samples, VcfFixture.pedLines).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getString(0), r.getLong(1), r.getString(2)) == ("1", 100L, "G"))
    assert((r.getString(3), r.getString(4)) == ("F1", "s1"))
    assert((r.getInt(5), r.getInt(6), r.getInt(7)) == ((10, 12, 9)))
  }

  test("founder-only PED yields no trios and an empty (non-crashing) result") {
    val (_, v, _) = variants
    val ped = Vector(
      "#family_id sample_id paternal_id maternal_id sex phenotype",
      "F1 s1 0 0 1 1", "F1 s2 0 0 1 1")
    assert(Etl.trioDenovo(spark, v, samples, ped).count() == 0)
  }

  test("a trio whose parent is absent from the VCF drops out instead of crashing") {
    val (_, v, _) = variants
    val ped = Vector(
      "F1 s1 s2 sMISSING 1 2", // mom not a VCF sample → no gt index
      "F1 s2 0 0 1 1")
    assert(Etl.trioDenovo(spark, v, samples, ped).count() == 0)
  }

  test("a quad family (two children, shared parents) emits no duplicate rows") {
    val (_, v, _) = variants
    val ped = Vector(
      "#family_id sample_id paternal_id maternal_id sex phenotype",
      "F1 s1 s2 s3 1 2",
      "F1 s4 s2 s3 2 1", // second child: HET only where a parent isn't HOM-REF
      "F1 s2 0 0 1 1",
      "F1 s3 0 0 2 1")
    val rows = Etl.trioDenovo(spark, v, samples, ped).collect()
    assert(rows.length == 1 && rows.head.getString(4) == "s1")
  }
}
