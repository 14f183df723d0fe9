package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One finalized tumbling-window count (the shape st01/windowCounts
  * emits in append mode, or a metrics topic delivers pre-aggregated).
  */
case class WindowCount(ws: Timestamp, event_type: String, n_events: Long)

/** Per-type monitor state: the last ≤3 finalized window counts,
  * oldest first.
  */
case class RateState(recent: List[Long])

/** One monitored window: its count, the trailing average of the
  * previous ≤3 windows (None until any history exists), and the
  * anomaly flag (count > 2 × trailing average).
  */
case class RateFlag(ws: Timestamp, event_type: String, n_events: Long,
    trailing_avg: Option[Double], anomaly: Boolean)

/** Streaming twin of operators.StreamingOps.st06 — the rate-anomaly
  * monitor as a `flatMapGroupsWithState` operator over finalized
  * window counts, keyed on event_type.
  *
  * Scale notes: state is O(event types) × 3 longs — a bounded dim, so
  * no timeout is needed (`NoTimeout`); an unbounded stream monitors
  * forever in constant memory. Windows are consumed in ws order per
  * micro-batch; because the upstream windowed aggregation only emits a
  * window once its watermark closes it, cross-batch arrival order per
  * type is already monotone — the same contract st02's sessionizer
  * leans on. The trailing average divides an exact long sum by a 1–3
  * count, matching the batch query's arithmetic bit for bit.
  */
object RateMonitor {

  private val History = 3

  private def step(tpe: String, rows: Iterator[WindowCount],
      state: GroupState[RateState]): Iterator[RateFlag] = {
    val sorted = rows.toVector.sortBy(_.ws.getTime)
    var recent = state.getOption.map(_.recent).getOrElse(Nil)
    val out = Vector.newBuilder[RateFlag]
    sorted.foreach { w =>
      val avg =
        if (recent.isEmpty) None
        else Some(recent.sum.toDouble / recent.length)
      out += RateFlag(w.ws, tpe, w.n_events, avg,
        avg.exists(a => w.n_events > 2 * a))
      recent = (recent :+ w.n_events).takeRight(History)
    }
    state.update(RateState(recent))
    out.result().iterator
  }

  /** finalized window counts → per-window anomaly flags, append-mode. */
  def flags(windows: Dataset[WindowCount]): Dataset[RateFlag] = {
    import windows.sparkSession.implicits._
    windows
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[RateState, RateFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}
