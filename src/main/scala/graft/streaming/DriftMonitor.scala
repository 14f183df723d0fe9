package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Monitor state: the previous finalized window's type histogram and
  * its total (None of history until the first window closes).
  */
case class DriftState(prev: Map[String, Long], prevTotal: Long)

/** One monitored window: its event total, the exact integer L1
  * numerator vs the previous window (None for the first window), the
  * normalized L1 drift, and the shift flag (drift > 0.2 — the batch
  * query's DriftTau).
  */
case class DriftFlag(ws: Timestamp, n: Long, drift_num: Option[Long],
    drift: Option[Double], shifted: Boolean)

/** Streaming twin of operators.StreamingOps.st07 — the type-mix
  * distribution-drift monitor as a `flatMapGroupsWithState` operator
  * over finalized per-(window, type) counts.
  *
  * Scale notes: the input is the PRE-AGGREGATED window×type stream
  * (st01's windowed agg output — a dim-sized stream, timeline/5min ×
  * types rows, NOT the raw firehose), so the single global key routes
  * only dim-sized traffic through one task, and state is O(types)
  * longs with no timeout needed. Windows are consumed in ws order; the
  * upstream watermark-closed aggregation guarantees monotone arrival
  * (st06's contract). The drift arithmetic is the batch query's exact
  * integer form: Σ|c_w·n_prev − c_prev·n_w| as a long sum, one double
  * division — bit-identical to the oracle-verified batch rule.
  */
object DriftMonitor {

  private val DriftTau = 0.2

  private def step(key: Int, rows: Iterator[WindowCount],
      state: GroupState[DriftState]): Iterator[DriftFlag] = {
    val byWindow = rows.toVector.groupBy(_.ws).toVector.sortBy(_._1.getTime)
    var prev = state.getOption
    val out = Vector.newBuilder[DriftFlag]
    byWindow.foreach { case (ws, wcs) =>
      val hist = wcs.groupBy(_.event_type)
        .map { case (t, v) => t -> v.map(_.n_events).sum }
      val n = hist.values.sum
      prev match {
        case Some(DriftState(ph, pn)) =>
          val types = hist.keySet ++ ph.keySet
          val num = types.toSeq.map { t =>
            math.abs(hist.getOrElse(t, 0L) * pn - ph.getOrElse(t, 0L) * n)
          }.sum
          // (n * pn) multiplies in LONG then converts once, matching
          // the batch query's CAST(n * n_prev AS DOUBLE) bit for bit
          val drift = num.toDouble / (n * pn).toDouble
          out += DriftFlag(ws, n, Some(num), Some(drift), drift > DriftTau)
        case None =>
          out += DriftFlag(ws, n, None, None, shifted = false)
      }
      prev = Some(DriftState(hist, n))
    }
    state.update(prev.get)
    out.result().iterator
  }

  /** finalized (window, type) counts → per-window drift flags,
    * append-mode.
    */
  def flags(windows: Dataset[WindowCount]): Dataset[DriftFlag] = {
    import windows.sparkSession.implicits._
    windows
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[DriftState, DriftFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}
