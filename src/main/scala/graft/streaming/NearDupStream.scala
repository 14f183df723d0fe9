package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.operators.Dedup.MinhashIndex

/** Streaming twin of [[graft.operators.Dedup.d20Probe]] (and of
  * CurateDelta's NEAR screen) — the companion of [[DeltaDedupStream]]'s
  * exact screen, completing the continuous form of the daily-ingest
  * pipeline: a document stream is verdicted against the persisted base
  * [[MinhashIndex]] per micro-batch, and an ACCUMULATED index of every
  * earlier micro-batch plays the within-stream "earlier doc" role.
  *
  * Why foreachBatch, not flatMapGroupsWithState: the exact screen's
  * match key is an equality (the content hash), so one long of
  * GroupState per key suffices. A near-dup match is a 64-lane
  * signature comparison over LSH-bucket candidates — there is no
  * equality key to group state on, and the state a probe needs (the
  * banded index of everything seen) is exactly [[MinhashIndex]]. So
  * each micro-batch runs [[Dedup.d20ProbeIncr]] (base index + seen
  * index + batch) and the seen index advances by the documented
  * union+count-merge append ([[MinhashIndex.merge]]) — CurateDelta's
  * versioned daily update at micro-batch granularity.
  *
  * Semantics: `base_near_dup` (confirmed against the base index),
  * `delta_near_dup` (confirmed only against an earlier stream doc —
  * an earlier micro-batch, or an earlier doc_id within this one),
  * `kept`; docs under 3 tokens carry no signature and emit no verdict
  * (d20's roster rule). When per-batch delivery follows doc_id order,
  * converged verdicts equal the one-shot batch d20Probe row for row
  * (parity-pinned in StreamingSpec) — except in buckets that cross the
  * ≤50 skew cap only mid-stream, which refuse candidates from that
  * point on where the batch form refuses them all.
  *
  * Scale notes: per-batch work is d20Probe's delta-bounded shape (the
  * cap join touches only the batch's buckets; the confirm is
  * candidate-bounded). The seen index is VERSIONED per micro-batch
  * (`stateDir/v<batchId>` in, `v<batchId+1>` out), so a replayed batch
  * id reads the same input index and overwrites the same output —
  * restart-idempotent state; the verdict parquet append is the usual
  * foreachBatch at-least-once output (sinks needing exactly-once
  * dedup on doc_id downstream). The full-index rewrite per batch is
  * the simple form; production appends sig/bucket delta files and
  * merges counts at compaction, same contract.
  */
object NearDupStream {

  /** Starts the screen: verdicts append to `outDir` as parquet, the
    * seen index versions under `stateDir`. The caller owns doc_id
    * uniqueness across the stream and against the base index.
    */
  def start(docs: Dataset[DeltaDoc], base: MinhashIndex,
      stateDir: String, outDir: String): StreamingQuery = {
    val s = docs.sparkSession
    docs.writeStream
      .foreachBatch { (batch: Dataset[DeltaDoc], batchId: Long) =>
        val seen =
          if (batchId == 0L) None
          else Some(MinhashIndex.load(s, s"$stateDir/v$batchId"))
        val b = batch.toDF().persist()
        Dedup.d20ProbeIncr(base, seen, b)
          .write.mode("append").parquet(outDir)
        // no cutSigs: the batch is micro-batch-sized, so the kernel
        // re-runs the builders pay are batch-bounded, and a per-batch
        // cut would leave blocks to release on every batch
        val bIdx = Dedup.d20IndexOf(b)
        seen.map(_.merge(bIdx)).getOrElse(bIdx)
          .write(s"$stateDir/v${batchId + 1}")
        b.unpersist()
        ()
      }
      .start()
  }
}
