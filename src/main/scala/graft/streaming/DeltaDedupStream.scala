package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One arriving document on the continuous-ingest lane. */
case class DeltaDoc(doc_id: Long, text: String)

/** A doc after the stream-static key-store join. */
case class DeltaHashed(doc_id: Long, h: String, in_base: Boolean)

/** First kept doc id for a content hash — the whole per-key state. */
case class FirstKept(doc_id: Long)

/** One emitted verdict — d15's exact three-class contract. */
case class DeltaVerdictRow(doc_id: Long, h: String, verdict: String)

/** Streaming twin of [[graft.operators.Dedup.d15Probe]] (and of
  * CurateDelta's exact screen): a CONTINUOUS ingest stream verdicted
  * against the persisted base key store — the base side enters as a
  * STREAM-STATIC left join (the index is a plain parquet frame, never
  * a stream), and within-stream first-wins dedup is one
  * `flatMapGroupsWithState` keyed on the content hash whose entire
  * per-key state is the first kept doc id.
  *
  * Semantics: `base_dup` (hash in the key store), `delta_dup` (an
  * earlier stream row already kept this hash), `kept`. First-wins is
  * by ARRIVAL (rows sorted by doc_id within a micro-batch) — the
  * streaming-native convention; when per-hash delivery follows doc_id
  * order, the converged verdicts equal the batch d15Probe row for row
  * (parity-pinned in StreamingSpec). Verdicts are IDEMPOTENT per
  * doc_id under at-least-once redelivery: a redelivered copy of the
  * kept row re-verdicts `kept` (its id is the stored first-kept id),
  * never `delta_dup`.
  *
  * Scale notes: the static side joins like any dim (broadcast when it
  * fits, shuffle otherwise — Spark plans it per micro-batch); state is
  * ONE long per distinct non-base hash (the minimum any exact dedup
  * must remember), partitioned by the hash across executors.
  * Production swaps the key-store frame for [[graft.operators.Dedup]]'s
  * d18/d19 bloom screen when even the hash join is too wide.
  */
object DeltaDedupStream {

  def verdicts(docs: Dataset[DeltaDoc], baseKeys: DataFrame): Dataset[DeltaVerdictRow] = {
    val s = docs.sparkSession
    import s.implicits._
    val joined = docs
      .withColumn("h", md5($"text"))
      .join(baseKeys.select($"h").withColumn("in_base", lit(true)),
        Seq("h"), "left")
      .select($"doc_id", $"h",
        coalesce($"in_base", lit(false)).as("in_base"))
      .as[DeltaHashed]
    joined.groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }

  private def step(h: String, rows: Iterator[DeltaHashed],
      state: GroupState[FirstKept]): Iterator[DeltaVerdictRow] = {
    val sorted = rows.toArray.sortBy(_.doc_id)
    var first: Option[Long] = state.getOption.map(_.doc_id)
    val out = sorted.map { r =>
      val v =
        if (r.in_base) "base_dup"
        // at-least-once delivery: a REDELIVERED copy of the row that
        // was originally verdicted kept must re-verdict kept, not
        // delta_dup — the verdict stream stays idempotent per doc_id
        else if (first.contains(r.doc_id)) "kept"
        else if (first.isDefined) "delta_dup"
        else { first = Some(r.doc_id); "kept" }
      DeltaVerdictRow(r.doc_id, h, v)
    }
    // state written AFTER the batch's rows are verdicted: the first
    // kept id must not shadow its own row
    if (state.getOption.map(_.doc_id) != first)
      first.foreach(f => state.update(FirstKept(f)))
    out.iterator
  }
}
