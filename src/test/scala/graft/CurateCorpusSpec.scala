package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Text}

/** End-to-end curation job: the [[CurateCorpus]] pipeline's stage
  * contracts verified on the real synthetic corpus, not fixtures.
  */
class CurateCorpusSpec extends SparkSpec {

  test("curate pipeline: monotone attrition, stage contracts hold on the output") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("text"))
    // inject known exact duplicates (same text, fresh ids) so the
    // exact stage provably cuts
    val base = docs.filter(col("doc_id") % 50 =!= 0)
    val dupes = base.orderBy("doc_id").limit(5)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val corpus = base.unionByName(dupes)
    val out = Files.createTempDirectory("curate").resolve("out").toString

    val r = CurateCorpus.run(corpus, out, benchmark = Some(bench))
    assert(r.nInput == base.count() + 5)

    assert(r.nInput >= r.nAfterExactDedup)
    assert(r.nAfterExactDedup >= r.nAfterNearDedup)
    assert(r.nAfterNearDedup >= r.nAfterQuality)
    assert(r.nAfterQuality >= r.nAfterDecontam)
    assert(r.nAfterDecontam > 0, "pipeline dropped everything")
    assert(r.nAfterExactDedup < r.nInput, "corpus has exact dupes the stage must cut")

    val survivors = spark.read.parquet(out)
    assert(survivors.count() == r.nAfterDecontam)

    // exact-dedup contract: texts are unique
    assert(survivors.select(md5(col("text"))).distinct().count() == r.nAfterDecontam)
    // near-dup contract: no surviving pair at or above the threshold
    // (cluster roots of different components can never be a pair)
    assert(Dedup.jaccardPairs(
      survivors.select(col("doc_id"), col("text")), 0.5).isEmpty)
    // quality contract: the floor holds on every survivor
    assert(Text.qualitySignals(survivors)
      .filter(col("q_score") < 0.25).isEmpty)
    // decontamination contract: no survivor shares a 4-gram with the
    // benchmark set
    assert(Dedup.decontaminate(
      survivors.select(col("doc_id"), split(col("text"), " ").as("toks")),
      bench.select(split(col("text"), " ").as("toks")), 4).isEmpty)
  }
}
