package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event (mirrors the events table's stream-relevant columns). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

/** Open-session state carried between micro-batches. */
case class SessState(session_id: Long, n_events: Long, t_start: Timestamp, t_end: Timestamp)

/** One closed (emitted) session. */
case class Session(user_id: Long, session_id: Long, n_events: Long,
    t_start: Timestamp, t_end: Timestamp)

/** Gap-based sessionization as a Structured Streaming stateful operator —
  * the streaming twin of operators.StreamingOps.st02 (same 30-min gap
  * semantics, verified against it in the test suite).
  *
  * Scale notes: state is per-user and O(1) (one open session — no event
  * buffering); the event-time timeout closes sessions as the watermark
  * passes, so state size is bounded by ACTIVE users, not history. This
  * is the `flatMapGroupsWithState` pattern the builder mandate names for
  * custom streaming state.
  */
object Sessionize {

  val GapMs: Long = 30L * 60L * 1000L

  /** How long (event time) a user's session COUNTER outlives their last
    * session. When the gap timeout closes a session the state is not
    * removed but downgraded to a tombstone (n_events = 0) carrying the
    * last session_id, so the next session numbers monotonically —
    * matching batch st02 — instead of restarting at 1 and making
    * (user_id, session_id) non-unique. The tombstone itself expires
    * after this TTL (bounded state: counters of long-gone users are
    * dropped; only a user returning after >24h restarts numbering).
    */
  val CounterTtlMs: Long = 24L * 60L * 60L * 1000L

  private def close(user: Long, s: SessState): Session =
    Session(user, s.session_id, s.n_events, s.t_start, s.t_end)

  private def step(user: Long, events: Iterator[Event],
      state: GroupState[SessState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      state.getOption match {
        case Some(s) if s.n_events > 0 => // gap elapsed: close, keep counter
          state.update(SessState(s.session_id, 0L, s.t_end, s.t_end))
          // clamp: after a large event-time jump (backfill, weekend gap)
          // the watermark may already be past t_end+TTL, and Spark
          // rejects a timeout timestamp at/below the watermark — the
          // tombstone then just expires on the next trigger
          state.setTimeoutTimestamp(math.max(
            state.getCurrentWatermarkMs() + 1, s.t_end.getTime + CounterTtlMs))
          Iterator.single(close(user, s))
        case _ => // tombstone TTL elapsed: forget the counter entirely
          state.remove()
          Iterator.empty
      }
    } else {
      val sorted = events.toVector.sortBy(e => (e.ts.getTime, e.event_id))
      // a tombstone (n_events == 0) is "no open session, counter = id"
      var cur = state.getOption.filter(_.n_events > 0)
      var nextId = state.getOption.map(_.session_id + 1).getOrElse(1L)
      val closed = Vector.newBuilder[Session]
      sorted.foreach { e =>
        cur match {
          case None =>
            cur = Some(SessState(nextId, 1L, e.ts, e.ts))
          case Some(c) if e.ts.getTime - c.t_end.getTime > GapMs =>
            closed += close(user, c)
            cur = Some(SessState(c.session_id + 1, 1L, e.ts, e.ts))
          case Some(c) if c.t_start.getTime - e.ts.getTime > GapMs =>
            // a late event more than a GAP older than the open session
            // belongs to its OWN session under the batch semantics —
            // merging it would silently stretch the session backwards.
            // It closes immediately with the lower (chronological) id
            // and the open session renumbers above it. Exact whenever
            // the watermark delay ≤ gap (such events are then dropped
            // upstream); beyond that, an approximation that never
            // merges and keeps (user, session_id) unique.
            closed += Session(user, c.session_id, 1L, e.ts, e.ts)
            cur = Some(c.copy(session_id = c.session_id + 1))
          case Some(c) =>
            // a late event (cross-batch, still within watermark) within
            // a gap of the open session's bounds — extend monotonically
            cur = Some(c.copy(n_events = c.n_events + 1,
              t_start = if (e.ts.before(c.t_start)) e.ts else c.t_start,
              t_end = if (e.ts.after(c.t_end)) e.ts else c.t_end))
        }
      }
      cur.foreach { c =>
        state.update(c)
        state.setTimeoutTimestamp(c.t_end.getTime + GapMs)
      }
      closed.result().iterator
    }
  }

  /** events (already watermarked on ts) → closed sessions, append-mode. */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }

  /** Streaming twin of StreamingOps.st01: the SAME tumbling-window plan
    * behind a watermark (late data beyond 10 min dropped, windows
    * finalized in append mode).
    */
  def windowCounts(events: Dataset[Event]): org.apache.spark.sql.DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n_events"))
}
