package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw event on the churn-audit lane; `event_id` is the arrival
  * axis (st09's definition), so per-key delivery in event_id order
  * makes the streaming audit equal the batch one.
  */
case class ChurnEvent(user_id: Long, event_id: Long, event_type: String)

/** Per-key running audit state. `types` is bounded by the event-type
  * VOCABULARY (not the event count), so state stays O(keys · |vocab|).
  */
case class ChurnAcc(n_events: Long, n_changes: Long, types: Seq[String],
    first_type: String, last_type: String)

/** One emitted audit row — the same shape as the batch st14 output. */
case class ChurnRow(user_id: Long, n_events: Long, n_changes: Long,
    n_types: Long, first_type: String, last_type: String)

/** Streaming twin of operators.StreamingOps.st14 — the UPSERT-CHURN
  * audit as a `flatMapGroupsWithState` operator: per-key state is the
  * running (count, change-count, type set, first/last type) tuple,
  * refreshed and re-emitted once per micro-batch that touches the key
  * (Update mode — a CDC-sink sizing dashboard upserts these rows).
  *
  * Semantics: arrival-adjacent type flips over the event_id axis,
  * exactly the batch st14 `lag` definition. Rows are sorted by
  * event_id WITHIN each micro-batch; across batches the CDC lane is
  * assumed to deliver each key in arrival order (the same contract
  * st09 audits violations of). Under that contract the converged
  * per-key emission equals the batch audit row — parity-pinned in
  * StreamingSpec against st14 on the same events table.
  *
  * Scale notes: state is partitioned by the group key (linear shard
  * across executors); per-key size is bounded by the type vocabulary,
  * not the stream length; a batch with no rows for a key emits
  * nothing, so emission volume tracks active keys per interval. No
  * timeout: the audit is cumulative (production would swap in a TTL).
  */
object ChurnState {

  private def step(user: Long, rows: Iterator[ChurnEvent],
      state: GroupState[ChurnAcc]): Iterator[ChurnRow] = {
    val sorted = rows.toArray.sortBy(_.event_id)
    if (sorted.isEmpty) Iterator.empty
    else {
      var st = state.getOption
        .getOrElse(ChurnAcc(0L, 0L, Seq.empty, null, null))
      sorted.foreach { e =>
        val flip = st.n_events > 0L && st.last_type != e.event_type
        st = ChurnAcc(
          st.n_events + 1L,
          st.n_changes + (if (flip) 1L else 0L),
          if (st.types.contains(e.event_type)) st.types
          else st.types :+ e.event_type,
          if (st.n_events == 0L) e.event_type else st.first_type,
          e.event_type)
      }
      state.update(st)
      Iterator.single(ChurnRow(user, st.n_events, st.n_changes,
        st.types.size.toLong, st.first_type, st.last_type))
    }
  }

  /** raw per-key events → per-batch refreshed churn audit rows. */
  def churn(events: Dataset[ChurnEvent]): Dataset[ChurnRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ChurnAcc, ChurnRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(step)
  }
}
