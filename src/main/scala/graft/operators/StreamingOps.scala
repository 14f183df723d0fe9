package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Stream-shaped operators over the events table (SURVEY.md §2.4),
  * written so the SAME transformations run in batch (verified against
  * the oracle here) and under Structured Streaming (exercised with
  * `readStream`/MemoryStream in the test suite — see
  * graft.streaming.Sessionize).
  */
object StreamingOps {

  private def T(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** st01: tumbling-window aggregation — `window(ts, 5 min)` × event
    * type. In streaming the identical plan runs behind a watermark;
    * value sums go through exact decimal then a final double (the
    * engine-portable money pattern from Relational).
    */
  def st01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "events")
      .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 2)))
          .cast(DecimalType(38, 2)).cast("double").as("sum_value"))
      .select($"w.start".as("ws"), $"w.end".as("we"), $"event_type",
        $"n_events", $"sum_value")
      .orderBy($"ws", $"event_type")
  }

  /** st02: gap-based sessionization (30-min inactivity). Batch form:
    * lag + running sum of session-start indicators — two windows over
    * ONE (user_id) shuffle, then a per-session aggregate. The streaming
    * form with identical semantics is
    * graft.streaming.Sessionize.flatMapGroupsWithState.
    */
  def st02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    T(s, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      // pure timestamp comparison (ts > prev + 30min) — works for both
      // TIMESTAMP and TIMESTAMP_NTZ inputs, exactly mirrors the
      // oracle's `ts - lag(ts) > INTERVAL 30 minutes`
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          $"ts" > $"prev_ts" + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_id",
        sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("t_start"), max($"ts").as("t_end"))
      .orderBy($"user_id", $"session_id")
  }

  /** st03: ingestion dedup — collapse duplicate event deliveries to one
    * canonical survivor per (user, type, minute) key. Batch form picks
    * the deterministic min-event_id survivor with ONE partial-agg
    * shuffle on the dedup key; the streaming form with bounded state is
    * `dropDuplicatesWithinWatermark` over the same key columns
    * (exercised in StreamingSpec — state is evicted once the watermark
    * passes, so it holds O(active keys), not O(stream)).
    */
  def st03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "events")
      .withColumn("minute", date_trunc("minute", $"ts"))
      .groupBy($"user_id", $"event_type", $"minute")
      .agg(min($"event_id").as("event_id"), count(lit(1)).as("n_dupes"))
      .orderBy($"user_id", $"event_type", $"minute")
  }

  /** st04: event-time interval join — each purchase paired with the
    * same user's views in the preceding 24 hours (attribution
    * candidates; q14 picks the single as-of winner, this keeps ALL
    * in-window pairs). Batch form: equi-join keyed on user_id with the
    * time range as a post-join predicate — one shuffle pair, never a
    * range-only join (which would explode quadratically). The streaming
    * form is Spark's watermarked stream-stream inner join with the
    * interval condition bounding state (StreamStreamJoinSpec exercises
    * it on MemoryStreams: late rows beyond the watermark are dropped,
    * state is evicted past the interval).
    */
  def st04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = T(s, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_event_id"), $"ts".as("p_ts"))
    val v = ev.filter($"event_type" === "view")
      .select($"user_id".as("v_user_id"), $"event_id".as("v_event_id"), $"ts".as("v_ts"))
    p.join(v, $"user_id" === $"v_user_id" &&
        $"v_ts" >= $"p_ts" - expr("INTERVAL 24 HOURS") && $"v_ts" <= $"p_ts")
      .select($"user_id", $"p_event_id", $"p_ts", $"v_event_id", $"v_ts")
      .orderBy($"user_id", $"p_event_id", $"v_event_id")
  }

  /** st05: streaming corpus curation — the LLM-ingest shape: quality-
    * gate each arriving document (Text.scoreExpr, the same rule t02 /
    * CurateCorpus cut on), then collapse exact duplicates on a
    * constant-width md5 content key. Batch form (this query, oracle-
    * verified): ONE partial-agg shuffle on the md5 key, min-doc_id
    * survivor — d01's scale shape behind a map-side filter that
    * discards low-quality rows BEFORE they shuffle. Streaming form
    * (StreamingSpec "st05"): identical filter, then
    * `dropDuplicatesWithinWatermark(content_md5)` — state holds only
    * in-watermark keys, so an unbounded ingest stream curates with
    * bounded memory.
    */
  def st05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "documents")
      .withColumn("score", expr(s"round(${Text.scoreExpr}, 6)"))
      .filter($"score" >= 0.3)
      .withColumn("content_md5", md5($"text"))
      .groupBy($"content_md5")
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_dupes"),
        min($"score").as("score"))
      .orderBy($"content_md5")
  }

  /** st06: streaming RATE-ANOMALY monitor — per-type tumbling 5-minute
    * event counts compared against the trailing average of the previous
    * three observed windows; a window running at more than twice its
    * trailing average flags `anomaly` (the ingest-pipeline health check:
    * a scraper gone hot, a duplicate-delivery storm, a bot burst —
    * caught at the window level before the corpus absorbs it).
    *
    * Batch form (this query): st01's windowed partial-agg shuffle, then
    * ONE window shuffle keyed on event_type over the window-count frame
    * — which is timeline/5min × types sized, vanishing next to the raw
    * stream at any scale. The trailing avg divides exact long sums by
    * a 1–3 count, IEEE-identical in both engines; the first windows of
    * each type (no history) report no anomaly. Streaming twin
    * (StreamingSpec "st06"): the same windowed counts behind a
    * watermark, then `flatMapGroupsWithState` keyed on event_type
    * holding only the last three window counts — O(types) state.
    */
  def st06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byType = Window.partitionBy($"event_type").orderBy($"ws")
    T(s, dir, "events")
      .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select($"w.start".as("ws"), $"event_type", $"n_events")
      .withColumn("trailing_avg",
        avg($"n_events").over(byType.rowsBetween(-3, -1)))
      .withColumn("anomaly",
        $"trailing_avg".isNotNull &&
          $"n_events" > lit(2) * $"trailing_avg")
      .withColumn("trailing_avg", round($"trailing_avg", 6))
      .orderBy($"event_type", $"ws")
  }

  /** st07 drift threshold — L1 distance between consecutive window
    * type-mix distributions above which the mix counts as shifted.
    */
  private final val DriftTau = 0.2

  /** st07: streaming DISTRIBUTION-DRIFT monitor — per tumbling 5-min
    * window, the L1 distance between this window's event-type mix and
    * the previous (non-empty) window's, flagging shifts > [[DriftTau]].
    * st06 watches per-type VOLUME bursts; this watches the SHAPE of the
    * mix — the standard ingest data-drift check (a scraper source going
    * dark or a new event type flooding in moves the mix long before any
    * single type's rate alarms).
    *
    * Exactness: the L1 numerator stays in integer space —
    * Σ_t |c_w,t·n_{w-1} − c_{w-1},t·n_w| is an exact BIGINT sum
    * (order-free), and the ONE division by n_w·n_{w-1} happens on
    * identical operands in both engines (a per-type share subtraction
    * would be order-sensitive double math).
    *
    * Scale shape: the only corpus-scale work is st01's windowed
    * partial agg; everything after runs on the (timeline/5min × types)
    * dim frame (st06's argument) — the dense grid, the per-type lag
    * window, and the single-partition window over the bounded timeline
    * dim. Streaming twin = DriftMonitor.flags (flatMapGroupsWithState,
    * single global key over pre-aggregated window counts — a dim-sized
    * stream), parity-tested in StreamingSpec.
    */
  def st07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = T(s, dir, "events")
      .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("c"))
      .select($"w.start".as("ws"), $"event_type", $"c")
    val grid = counts.select($"ws").distinct()
      .crossJoin(broadcast(counts.select($"event_type").distinct()))
      .join(counts, Seq("ws", "event_type"), "left")
      .na.fill(0L, Seq("c"))
    val lagged = grid.withColumn("c_prev",
      lag($"c", 1).over(Window.partitionBy($"event_type").orderBy($"ws")))
    val tot = grid.groupBy($"ws").agg(sum($"c").as("n"))
      .withColumn("n_prev", lag($"n", 1).over(Window.orderBy($"ws")))
    lagged.join(tot, "ws")
      .filter($"c_prev".isNotNull)
      .groupBy($"ws", $"n", $"n_prev")
      .agg(sum(abs($"c" * $"n_prev" - $"c_prev" * $"n")).as("drift_num"))
      .withColumn("drift", expr(
        "CAST(drift_num AS DOUBLE) / CAST(n * n_prev AS DOUBLE)"))
      .withColumn("shifted", $"drift" > DriftTau)
      .select($"ws", $"n", $"drift_num", $"drift", $"shifted")
      .orderBy($"ws")
  }

  /** st08: CDC LAST-VALUE compaction — each key's (user's) single
    * latest event under the total (ts, event_id) order: the
    * materialized-view primitive behind "current state of every
    * entity" tables (upsert/CDC ingestion, feature stores, profile
    * stores). st03 suppresses duplicate DELIVERIES of one event; this
    * collapses a key's whole history to its newest row.
    *
    * Batch form (this query): ONE window shuffle keyed on user_id —
    * rank-1 rows survive; the timestamp is emitted as epoch MICROS
    * (the nanos parquet clock collapses to micros identically in both
    * engines — raw ns timestamps do not cross engines losslessly).
    * Streaming twin (`streaming.LatestState.latest`, StreamingSpec
    * "st08"): flatMapGroupsWithState keyed on user_id holding ONE row
    * per key, emitting only winner changes; late/duplicate deliveries
    * lose the max-order race idempotently.
    */
  def st08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    T(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id".as("last_event_id"),
        // ts is TIMESTAMP_NTZ; the session TZ is pinned UTC, so the
        // cast to instant is the identity and unix_micros applies
        unix_micros($"ts".cast("timestamp")).as("last_ts_us"),
        $"event_type".as("last_type"), $"value".as("last_value"))
      .orderBy($"user_id")
  }

  /** st09 lateness tolerance: 10 minutes of event-time disorder. */
  private final val DisorderTolUs = 600000000L

  /** st09: event-time DISORDER audit — per key (user), how far events
    * arrive BEHIND the maximum event time already seen on that key's
    * stream (arrival order = event_id): count beyond the
    * [[DisorderTolUs]] tolerance and the worst regression. This is the
    * measurement that SIZES a watermark — `withWatermark(d)` drops
    * exactly the events this audit counts at tolerance d, so you run
    * it batch over history before committing a streaming delay
    * (st01–st08's watermarks are assumptions; this is the data).
    *
    * Scale shape: ONE user-keyed window shuffle (running max over the
    * arrival order), and the per-user rollup reuses the SAME
    * hash-partitioning — Catalyst inserts no second Exchange; the
    * disorder rule is integer micros spelled identically in both
    * engines.
    */
  def st09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    T(s, dir, "events")
      .withColumn("ts_us", unix_micros($"ts".cast("timestamp")))
      .withColumn("prev_max", max($"ts_us").over(w))
      .withColumn("disorder_us", expr(
        """CASE WHEN prev_max IS NULL OR prev_max <= ts_us THEN 0L
          | ELSE prev_max - ts_us END""".stripMargin))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when($"disorder_us" > DisorderTolUs, 1)).as("n_late"),
        max($"disorder_us").as("max_disorder_us"))
      .orderBy($"user_id")
  }

  /** st10: OUTER interval join — st04's attribution pairs with the
    * unmatched purchases KEPT (null view columns): "which conversions
    * had no preceding touchpoint" is the business question an inner
    * join silently deletes. In streaming form this is Spark's
    * watermarked stream-stream LEFT OUTER join, whose null-padded
    * rows emit only when the watermark proves no match can still
    * arrive (StreamingSpec "st10" pins exactly that).
    *
    * Scale shape: st04's — equi-join keyed on user (ONE shuffle pair;
    * the time-range predicate rides the equi-join, never a range-only
    * join); outer polarity adds no shuffle, only per-key retention of
    * unmatched build rows until the bound passes.
    */
  def st10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = T(s, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_event_id"), $"ts".as("p_ts"))
    val v = ev.filter($"event_type" === "view")
      .select($"user_id".as("v_user_id"), $"event_id".as("v_event_id"), $"ts".as("v_ts"))
    p.join(v, $"user_id" === $"v_user_id" &&
        $"v_ts" >= $"p_ts" - expr("INTERVAL 24 HOURS") && $"v_ts" <= $"p_ts",
      "left_outer")
      .withColumn("attributed", $"v_event_id".isNotNull)
      .select($"user_id", $"p_event_id", $"p_ts", $"v_event_id", $"v_ts",
        $"attributed")
      .orderBy($"user_id", $"p_event_id", $"v_event_id")
  }

  /** st11's K — types reported per window. */
  private final val TopKTypes = 3

  /** st11: per-window TOP-K event types — the streaming leaderboard
    * ("what's trending this 5 minutes") every ingest dashboard runs;
    * t18's heavy-hitters question asked per TIME WINDOW instead of
    * corpus-wide. Batch form: st01's tumbling counts, then rank within
    * each window. Streaming twin (StreamingSpec "st11"): the windowed
    * counts run behind a watermark and the dim-sized rank applies
    * per emitted result set (foreachBatch) — ranking is not
    * incremental across un-closed windows, so it rides the OUTPUT of
    * the stateful agg, never inside it.
    *
    * Scale shape: ONE windowed partial-agg shuffle over the stream
    * (map-side combine absorbs per-type volume); the rank window runs
    * on the windows×types dim frame. Ties break lexicographically so
    * both engines and every rerun emit the same K.
    */
  def st11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rk = Window.partitionBy($"ws")
      .orderBy($"n_events".desc, $"event_type".asc)
    T(s, dir, "events")
      .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select($"w.start".as("ws"), $"event_type", $"n_events")
      .withColumn("rank", row_number().over(rk))
      .filter($"rank" <= TopKTypes)
      .orderBy($"ws", $"rank")
  }

  /** st12's per-session stage frame, shared with the streaming twin's
    * parity spec: st02's gap sessionization plus the ORDERED funnel
    * stage times — first view, first click AFTER that view, first
    * purchase AFTER that click (q16's lifetime funnel asks "did the
    * user ever convert"; this asks "did the session", the form
    * attribution and UX work actually use). The three stage windows
    * and the session rollup all share st02's user_id clustering, so
    * the whole derivation rides ONE exchange.
    */
  private[graft] def sessionStages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val bySess = Window.partitionBy($"user_id", $"session_id")
    T(s, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          $"ts" > $"prev_ts" + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_id",
        sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t_view",
        min(when($"event_type" === "view", $"ts")).over(bySess))
      .withColumn("t_click",
        min(when($"event_type" === "click" && $"ts" > $"t_view", $"ts")).over(bySess))
      .withColumn("t_purchase",
        min(when($"event_type" === "purchase" && $"ts" > $"t_click", $"ts")).over(bySess))
      .groupBy($"user_id", $"session_id")
      .agg(max($"t_view").as("t_view"), max($"t_click").as("t_click"),
        max($"t_purchase").as("t_purchase"))
  }

  /** st12: SESSION-FUNNEL conversion — how many sessions saw a view,
    * a view→click, a view→click→purchase (strictly ordered within the
    * session), and the end-to-end conversion rate. The sessionized
    * counterpart of q16: a returning user converts once per SESSION
    * here, not once per lifetime, which is what funnel dashboards and
    * attribution models consume. Streaming twin:
    * [[graft.streaming.SessionFunnel]] tracks the stage times in the
    * per-user session state and emits the same per-session stage row
    * at session close (parity-pinned in the spec).
    *
    * Scale shape: [[sessionStages]]'s single user-keyed exchange, then
    * a single-row rollup (partial aggs combine map-side); the final
    * conversion division is one double op on identical BIGINT counts
    * in both engines.
    */
  def st12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sessionStages(s, dir)
      .agg(count(lit(1)).as("n_sessions"),
        count($"t_view").as("n_view"),
        count($"t_click").as("n_view_click"),
        count($"t_purchase").as("n_full_funnel"))
      .withColumn("conv_rate", expr(
        "round(CAST(n_full_funnel AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)"))
  }

  /** st13: DAILY BOUNCE RATE — per day (of session start), how many
    * sessions closed with a single event: the engagement-health trend
    * product teams watch beside st12's conversion funnel (a bounce
    * spike with steady traffic = landing-page or latency regression).
    * Composes st02's session frame — the sessionization is defined
    * ONCE and every session-grain metric reuses it.
    *
    * Scale shape: st02's single user-keyed exchange, then one
    * partial-agg shuffle from the session grain to the calendar-
    * bounded day grain (map-side combine absorbs the sessions); the
    * bounce rate is one double division on identical BIGINT counts.
    */
  def st13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    st02(s, dir)
      .groupBy(date_trunc("day", $"t_start").as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        count(when($"n_events" === 1, 1)).as("n_bounces"))
      .withColumn("bounce_rate", expr(
        "round(CAST(n_bounces AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)"))
      .orderBy($"day")
  }

  /** st14: UPSERT CHURN audit — per key (user), how often its
    * materialized state actually CHANGES under arrival order
    * (event_id, st09's arrival axis): event count, state-change count
    * (arrival-adjacent type flips), distinct states, first/last state.
    * st08 materializes the final state; this prices MAINTAINING it —
    * a key with 500 events but 3 changes costs 3 upserts, and
    * flip-flopping keys dominate a CDC sink's write amplification, so
    * this audit is what sizes that sink (and the emit volume of
    * st08's streaming twin, which emits exactly on winner changes).
    *
    * Scale shape: ONE user-keyed window shuffle (lag over arrival
    * order); the rollup groups the already-user-partitioned frame —
    * no second Exchange. min_by/max_by on the BIGINT event_id are
    * exact in both engines (q38's argmin discipline). Streaming twin:
    * `streaming.ChurnState.churn` (flatMapGroupsWithState, O(keys)
    * state bounded by the type vocabulary), parity-pinned in
    * StreamingSpec.
    */
  def st14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id".asc)
    T(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type")
      .withColumn("prev", lag($"event_type", 1).over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"prev".isNotNull && $"prev" =!= $"event_type", 1L)
          .otherwise(0L)).as("n_changes"),
        countDistinct($"event_type").as("n_types"),
        min_by($"event_type", $"event_id").as("first_type"),
        max_by($"event_type", $"event_id").as("last_type"))
      .orderBy($"user_id")
  }

  val oracle: Map[String, String] = Map(
    "st14_upsert_churn" ->
      """WITH o AS (SELECT user_id, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        | FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> event_type
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
        | CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        | arg_min(event_type, event_id) AS first_type,
        | arg_max(event_type, event_id) AS last_type
        |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin,
    "st13_bounce_rate" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked),
        |sess AS (SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS t_start FROM numbered GROUP BY 1, 2)
        |SELECT CAST(date_trunc('day', t_start) AS TIMESTAMP) AS day,
        | count(*) AS n_sessions,
        | count(*) FILTER (WHERE n_events = 1) AS n_bounces,
        | round(CAST(count(*) FILTER (WHERE n_events = 1) AS DOUBLE)
        |   / CAST(count(*) AS DOUBLE), 6) AS bounce_rate
        |FROM sess GROUP BY 1 ORDER BY day""".stripMargin,
    "st12_session_funnel" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts, event_type,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked),
        |v AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
        |    OVER (PARTITION BY user_id, session_id) AS t_view FROM numbered),
        |c AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
        |    OVER (PARTITION BY user_id, session_id) AS t_click FROM v),
        |p AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
        |    OVER (PARTITION BY user_id, session_id) AS t_purchase FROM c),
        |sess AS (SELECT user_id, session_id,
        |  max(t_view) AS t_view, max(t_click) AS t_click,
        |  max(t_purchase) AS t_purchase
        | FROM p GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        | count(t_view) AS n_view,
        | count(t_click) AS n_view_click,
        | count(t_purchase) AS n_full_funnel,
        | round(CAST(count(t_purchase) AS DOUBLE)
        |   / CAST(count(*) AS DOUBLE), 6) AS conv_rate
        |FROM sess""".stripMargin,
    "st11_window_topk" ->
      s"""WITH w AS (
         | SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type,
         |  COUNT(*) AS n_events
         | FROM events GROUP BY 1, 2),
         |r AS (SELECT ws, event_type, n_events,
         |  row_number() OVER (PARTITION BY ws
         |    ORDER BY n_events DESC, event_type ASC) AS rank
         | FROM w)
         |SELECT ws, event_type, n_events, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= $TopKTypes ORDER BY ws, rank""".stripMargin,
    "st10_attribution_outer" ->
      """SELECT p.user_id, p.event_id AS p_event_id, p.ts AS p_ts,
        | v.event_id AS v_event_id, v.ts AS v_ts,
        | (v.event_id IS NOT NULL) AS attributed
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts >= p.ts - INTERVAL '24 hours' AND v.ts <= p.ts
        |ORDER BY p.user_id, p_event_id, v_event_id""".stripMargin,
    "st09_disorder_audit" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         |m AS (SELECT user_id, event_id, ts_us,
         |  max(ts_us) OVER (PARTITION BY user_id ORDER BY event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
         |  FROM e),
         |d AS (SELECT user_id,
         |  CASE WHEN prev_max IS NULL OR prev_max <= ts_us THEN 0
         |       ELSE prev_max - ts_us END AS disorder_us FROM m)
         |SELECT user_id, count(*) AS n_events,
         | count(*) FILTER (WHERE disorder_us > $DisorderTolUs) AS n_late,
         | CAST(max(disorder_us) AS BIGINT) AS max_disorder_us
         |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,
    "st07_drift_monitor" ->
      s"""WITH c AS (
         | SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type,
         |  COUNT(*) AS c
         | FROM events GROUP BY 1, 2),
         |grid AS (
         | SELECT w.ws, t.event_type, coalesce(c.c, 0) AS c
         | FROM (SELECT DISTINCT ws FROM c) w
         | CROSS JOIN (SELECT DISTINCT event_type FROM c) t
         | LEFT JOIN c ON c.ws = w.ws AND c.event_type = t.event_type),
         |lagged AS (
         | SELECT ws, event_type, c,
         |  lag(c) OVER (PARTITION BY event_type ORDER BY ws) AS c_prev
         | FROM grid),
         |tot AS (
         | SELECT ws, CAST(SUM(c) AS BIGINT) AS n,
         |  lag(CAST(SUM(c) AS BIGINT)) OVER (ORDER BY ws) AS n_prev
         | FROM grid GROUP BY ws),
         |d AS (
         | SELECT l.ws, t.n, t.n_prev,
         |  CAST(SUM(abs(l.c * t.n_prev - l.c_prev * t.n)) AS BIGINT) AS drift_num
         | FROM lagged l JOIN tot t USING (ws)
         | WHERE l.c_prev IS NOT NULL GROUP BY 1, 2, 3)
         |SELECT ws, n, drift_num,
         | CAST(drift_num AS DOUBLE) / CAST(n * n_prev AS DOUBLE) AS drift,
         | (CAST(drift_num AS DOUBLE) / CAST(n * n_prev AS DOUBLE) > $DriftTau) AS shifted
         |FROM d ORDER BY ws""".stripMargin,
    "st06_rate_anomaly" ->
      """WITH w AS (
        | SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type,
        |  COUNT(*) AS n_events
        | FROM events GROUP BY 1, 2),
        |t AS (
        | SELECT ws, event_type, n_events,
        |  avg(n_events) OVER (PARTITION BY event_type ORDER BY ws
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS trailing_avg
        | FROM w)
        |SELECT ws, event_type, n_events,
        | (trailing_avg IS NOT NULL AND n_events > 2 * trailing_avg)
        |   AS anomaly,
        | round(trailing_avg, 6) AS trailing_avg
        |FROM t ORDER BY event_type, ws""".stripMargin,
    "st05_stream_curate" ->
      s"""WITH scored AS (
         | SELECT doc_id, md5(text) AS content_md5,
         |  round(0.5e0 * least(len(string_split(text, ' ')), 100) / 100.0e0
         |   + 0.5e0 * (CAST(${Text.hitsSql(Text.stopwords.head._2)} AS DOUBLE)
         |              / len(string_split(text, ' '))), 6) AS score
         | FROM documents)
         |SELECT content_md5, MIN(doc_id) AS doc_id, COUNT(*) AS n_dupes,
         | MIN(score) AS score
         |FROM scored WHERE score >= 0.3
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "st08_latest_state" ->
      """WITH r AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        | FROM events)
        |SELECT user_id, event_id AS last_event_id, ts_us AS last_ts_us,
        | event_type AS last_type, value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "st03_dedup_events" ->
      """SELECT user_id, event_type,
        | CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
        | MIN(event_id) AS event_id, COUNT(*) AS n_dupes
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, minute""".stripMargin,
    "st01_window_agg" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws,
        | time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS we,
        | event_type,
        | COUNT(*) AS n_events,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY ws, event_type""".stripMargin,
    "st02_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | MIN(ts) AS t_start, MAX(ts) AS t_end
        |FROM numbered GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    "st04_interval_join" ->
      """SELECT p.user_id, p.event_id AS p_event_id, p.ts AS p_ts,
        | v.event_id AS v_event_id, v.ts AS v_ts
        |FROM events p JOIN events v
        |  ON p.user_id = v.user_id
        | AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND v.ts >= p.ts - INTERVAL '24 hours' AND v.ts <= p.ts
        |ORDER BY p.user_id, p_event_id, v_event_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_window_agg" -> (st01 _),
    "st02_sessionize" -> (st02 _),
    "st03_dedup_events" -> (st03 _),
    "st04_interval_join" -> (st04 _),
    "st05_stream_curate" -> (st05 _),
    "st06_rate_anomaly" -> (st06 _),
    "st07_drift_monitor" -> (st07 _),
    "st08_latest_state" -> (st08 _),
    "st09_disorder_audit" -> (st09 _),
    "st10_attribution_outer" -> (st10 _),
    "st11_window_topk" -> (st11 _),
    "st12_session_funnel" -> (st12 _),
    "st13_bounce_rate" -> (st13 _),
    "st14_upsert_churn" -> (st14 _)
  )
}
