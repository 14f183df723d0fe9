package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session funnel state: [[Sessionize]]'s gap/counter machinery
  * plus the ordered stage times (first view, first click after it,
  * first purchase after that). Like SessState, `n_events == 0` marks a
  * counter tombstone.
  */
case class FunnelState(session_id: Long, n_events: Long,
    t_start: Timestamp, t_end: Timestamp,
    t_view: Option[Timestamp], t_click: Option[Timestamp],
    t_purchase: Option[Timestamp])

/** One closed session's funnel stages (None = stage never reached). */
case class SessionFunnelRow(user_id: Long, session_id: Long,
    t_view: Option[Timestamp], t_click: Option[Timestamp],
    t_purchase: Option[Timestamp])

/** Streaming twin of operators.StreamingOps.st12: gap-based sessions
  * (Sessionize's exact close/tombstone semantics) carrying the funnel
  * stage times in the per-user state and emitting one stage row per
  * CLOSED session — the frame st12's batch rollup aggregates, produced
  * incrementally.
  *
  * Exactness: within a micro-batch events apply in (ts, event_id)
  * order, so the ordered-stage mins match batch st12 whenever a
  * session's events don't straddle batches out of order; a cross-batch
  * late event (still within watermark and gap) updates t_view
  * monotonically downward but cannot resurrect a click that was
  * rejected against the OLD t_view — the same "never merges, may
  * split" approximation contract Sessionize documents, exact when the
  * watermark delay ≤ the session gap. State is O(1) per active user
  * (three optional timestamps on top of SessState).
  */
object SessionFunnel {

  import Sessionize.{CounterTtlMs, GapMs}

  private def minTs(a: Option[Timestamp], b: Timestamp): Option[Timestamp] =
    a match {
      case Some(x) if !b.before(x) => a
      case _ => Some(b)
    }

  private def open(id: Long, e: Event): FunnelState = {
    val base = FunnelState(id, 1L, e.ts, e.ts, None, None, None)
    stage(base, e)
  }

  /** Apply one event's funnel transition to the open state. */
  private def stage(s: FunnelState, e: Event): FunnelState =
    e.event_type match {
      case "view" => s.copy(t_view = minTs(s.t_view, e.ts))
      case "click" if s.t_view.exists(v => e.ts.after(v)) =>
        s.copy(t_click = minTs(s.t_click, e.ts))
      case "purchase" if s.t_click.exists(c => e.ts.after(c)) =>
        s.copy(t_purchase = minTs(s.t_purchase, e.ts))
      case _ => s
    }

  private def close(user: Long, s: FunnelState): SessionFunnelRow =
    SessionFunnelRow(user, s.session_id, s.t_view, s.t_click, s.t_purchase)

  private def step(user: Long, events: Iterator[Event],
      state: GroupState[FunnelState]): Iterator[SessionFunnelRow] = {
    if (state.hasTimedOut) {
      state.getOption match {
        case Some(s) if s.n_events > 0 => // gap elapsed: close, keep counter
          state.update(FunnelState(s.session_id, 0L, s.t_end, s.t_end,
            None, None, None))
          state.setTimeoutTimestamp(math.max(
            state.getCurrentWatermarkMs() + 1, s.t_end.getTime + CounterTtlMs))
          Iterator.single(close(user, s))
        case _ => // tombstone TTL elapsed: forget the counter
          state.remove()
          Iterator.empty
      }
    } else {
      val sorted = events.toVector.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = state.getOption.filter(_.n_events > 0)
      var nextId = state.getOption.map(_.session_id + 1).getOrElse(1L)
      val closed = Vector.newBuilder[SessionFunnelRow]
      sorted.foreach { e =>
        cur match {
          case None =>
            cur = Some(open(nextId, e))
          case Some(c) if e.ts.getTime - c.t_end.getTime > GapMs =>
            closed += close(user, c)
            cur = Some(open(c.session_id + 1, e))
          case Some(c) if c.t_start.getTime - e.ts.getTime > GapMs =>
            // Sessionize's rule: a late event a full gap older than the
            // open session is its OWN session at the lower id; the open
            // session renumbers above it
            closed += close(user, open(c.session_id, e))
            cur = Some(c.copy(session_id = c.session_id + 1))
          case Some(c) =>
            cur = Some(stage(c, e).copy(n_events = c.n_events + 1,
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

  /** events (already watermarked on ts) → closed-session funnel rows,
    * append-mode.
    */
  def funnels(events: Dataset[Event]): Dataset[SessionFunnelRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, SessionFunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}
