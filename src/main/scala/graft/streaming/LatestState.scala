package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw event on the CDC lane. `ts_us` is epoch MICROS — the
  * engine-neutral clock the st08 batch query also emits (the nanos
  * parquet clock collapses to micros identically in Spark and DuckDB).
  */
case class CdcEvent(user_id: Long, event_id: Long, ts_us: Long,
    event_type: String, value: Double)

/** The materialized latest-event row for one key. */
case class LatestRow(user_id: Long, last_event_id: Long, last_ts_us: Long,
    last_type: String, last_value: Double)

/** Streaming twin of operators.StreamingOps.st08 — CDC LAST-VALUE
  * compaction as a `flatMapGroupsWithState` operator: per-key state is
  * ONE row (the current winner under the (ts, event_id) order), and a
  * key emits only when its winner changes — the update stream a
  * downstream materialized view consumes.
  *
  * Scale notes: state is O(keys) single rows (the minimum any
  * last-value materialization can hold) and is partitioned by the
  * group key, so a 1000-executor cluster shards it linearly; late or
  * duplicate deliveries lose the max-order race idempotently —
  * replays emit nothing. No timeout: a CDC compaction's state IS the
  * table (production would swap in a TTL for keys with retention).
  */
object LatestState {

  private def step(user: Long, rows: Iterator[CdcEvent],
      state: GroupState[LatestRow]): Iterator[LatestRow] = {
    val prev = state.getOption
    val candidates = prev.iterator ++ rows.map(e =>
      LatestRow(user, e.event_id, e.ts_us, e.event_type, e.value))
    val best = candidates.maxBy(r => (r.last_ts_us, r.last_event_id))
    if (prev.contains(best)) Iterator.empty
    else { state.update(best); Iterator.single(best) }
  }

  /** raw per-key events → last-value updates (append emits only
    * winner changes).
    */
  def latest(events: Dataset[CdcEvent]): Dataset[LatestRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestRow, LatestRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}
