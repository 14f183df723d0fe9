package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Pins the executable incremental-dedup index (round-11 verdict ask
  * #3): d15/d20's probe legs must run from a PERSISTED index plus a
  * delta frame alone — no base text reachable — and reproduce the
  * registered composed queries row for row.
  */
class IncrementalIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The delta as an in-memory frame: if the probe output matches the
    * registered query, the probe provably never read base text (the
    * only files in its plan are the reloaded index parquet).
    */
  private def deltaFrame = {
    import spark.implicits._
    val rows = Tables(spark, dir, "documents")
      .filter($"doc_id" % 2 === 1)
      .select($"doc_id", $"text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }

  test("d20 probe from a parquet-reloaded index matches registered d20") {
    val tmp = Files.createTempDirectory("graft-d20-index").toString
    Dedup.d20Index(spark, dir).write(tmp)
    val probe = Dedup.d20Probe(Dedup.MinhashIndex.load(spark, tmp), deltaFrame)
    val full = Dedup.queries("d20_delta_minhash")(spark, dir)
    assert(probe.schema.fieldNames.toSeq == full.schema.fieldNames.toSeq)
    assert(probe.exceptAll(full).isEmpty && full.exceptAll(probe).isEmpty,
      "index-probe d20 disagrees with the registered composed form")
  }

  test("d20 probe plan scans only the index parquet (base text untouched)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-d20-scan").toString
    Dedup.d20Index(spark, dir).write(tmp)
    val plan = Dedup.d20Probe(Dedup.MinhashIndex.load(spark, tmp), deltaFrame)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "probe plan reads the documents table — the index did not decouple it")
    assert(plan.contains("sigs.parquet") && plan.contains("buckets.parquet"),
      "probe plan does not read the persisted index")
  }

  test("d20 probe on an empty delta returns zero rows, not an error") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-d20-empty").toString
    Dedup.d20Index(spark, dir).write(tmp)
    val empty = spark.createDataFrame(Seq.empty[(Long, String)])
      .toDF("doc_id", "text")
    assert(Dedup.d20Probe(Dedup.MinhashIndex.load(spark, tmp), empty)
      .count() == 0L)
  }

  test("d23 probe from a parquet-reloaded gram index matches registered d23") {
    val tmp = Files.createTempDirectory("graft-d23-index").toString
    Dedup.d23Index(spark, dir).write(tmp)
    val probe = Dedup.d23Probe(Dedup.GramIndex.load(spark, tmp), deltaFrame)
    val full = Dedup.queries("d23_containment_delta")(spark, dir)
    assert(probe.schema.fieldNames.toSeq == full.schema.fieldNames.toSeq)
    assert(probe.exceptAll(full).isEmpty && full.exceptAll(probe).isEmpty,
      "index-probe d23 disagrees with the registered composed form")
  }

  test("d23 probe plan scans only the gram index (base text untouched)") {
    val tmp = Files.createTempDirectory("graft-d23-scan").toString
    Dedup.d23Index(spark, dir).write(tmp)
    val plan = Dedup.d23Probe(Dedup.GramIndex.load(spark, tmp), deltaFrame)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "probe plan reads the documents table — the index did not decouple it")
    assert(plan.contains("grams.parquet") && plan.contains("gramrows.parquet"),
      "probe plan does not read the persisted gram index")
  }

  test("d15 probe from a parquet-reloaded key store matches registered d15") {
    val tmp = Files.createTempDirectory("graft-d15-index").toString
    Dedup.d15Index(spark, dir).write.mode("overwrite")
      .parquet(s"$tmp/keys.parquet")
    val keys = spark.read.parquet(s"$tmp/keys.parquet")
    val probe = Dedup.d15Probe(keys, deltaFrame)
    val full = Dedup.queries("d15_delta_dedup")(spark, dir)
    assert(probe.schema.fieldNames.toSeq == full.schema.fieldNames.toSeq)
    assert(probe.exceptAll(full).isEmpty && full.exceptAll(probe).isEmpty,
      "key-store d15 disagrees with the registered composed form")
  }

  test("appending a delta to the index is a union+merge, no base recompute") {
    import spark.implicits._
    // production append: index.merge(delta's index) — building it must
    // equal d20IndexOf(base ∪ delta)
    val docs = Tables(spark, dir, "documents").select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 2 === 0)
    val delta = docs.filter($"doc_id" % 2 === 1)
    val merged = Dedup.d20IndexOf(base).merge(Dedup.d20IndexOf(delta))
    val whole = Dedup.d20IndexOf(docs)
    assert(merged.counts.exceptAll(whole.counts).isEmpty &&
      whole.counts.exceptAll(merged.counts).isEmpty,
      "merged per-bucket counts diverge from a from-scratch rebuild")
    assert(merged.sigs.count() == whole.sigs.count() &&
      merged.buckets.count() == whole.buckets.count())
  }

  test("appending a delta to the gram index is a union+merge, no base recompute") {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents").select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 2 === 0)
    val delta = docs.filter($"doc_id" % 2 === 1)
    val merged = Dedup.d23IndexOf(base).merge(Dedup.d23IndexOf(delta))
    val whole = Dedup.d23IndexOf(docs)
    assert(merged.counts.exceptAll(whole.counts).isEmpty &&
      whole.counts.exceptAll(merged.counts).isEmpty,
      "merged per-gram df diverges from a from-scratch rebuild")
    assert(merged.grams.count() == whole.grams.count() &&
      merged.rows.count() == whole.rows.count())
  }

  test("a probe from a MERGED gram index equals one from a rebuilt index") {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents").select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 4 === 0)
    val added = docs.filter($"doc_id" % 4 === 2)
    val merged = Dedup.d23IndexOf(base).merge(Dedup.d23IndexOf(added))
    val rebuilt = Dedup.d23IndexOf(docs.filter($"doc_id" % 2 === 0))
    val probeM = Dedup.d23Probe(merged, deltaFrame)
    val probeR = Dedup.d23Probe(rebuilt, deltaFrame)
    assert(probeM.exceptAll(probeR).isEmpty && probeR.exceptAll(probeM).isEmpty,
      "probing the merged gram index disagrees with probing a rebuild")
  }
}
