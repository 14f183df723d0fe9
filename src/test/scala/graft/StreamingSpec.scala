package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{Event, Session, Sessionize}

class StreamingSpec extends SparkSpec {

  private def ts(minutes: Long) = new Timestamp(1700000400000L + minutes * 60000L) // base aligned to 5-min boundary

  test("flatMapGroupsWithState sessionization closes sessions on gap + watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "1 minute"))
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // user 1: two bursts 2h apart -> first burst closes when the
      // watermark (driven by user 2's later events) passes its gap
      input.addData(
        Event(1, ts(0), 1, "view"), Event(2, ts(10), 1, "click"),
        Event(3, ts(0), 2, "view"))
      q.processAllAvailable()
      input.addData(Event(4, ts(240), 2, "view")) // watermark -> ts(239)
      q.processAllAvailable()
      input.addData(Event(5, ts(241), 2, "view")) // flush timed-out state
      q.processAllAvailable()
      val out = spark.table("sessions_out").as[Session].collect()
        .sortBy(s => (s.user_id, s.session_id))
      assert(out.exists(s => s.user_id == 1 && s.n_events == 2 &&
        s.t_start == ts(0) && s.t_end == ts(10)))
      assert(out.exists(s => s.user_id == 2 && s.n_events == 1))
    } finally q.stop()
  }

  test("session numbering stays monotonic across a timeout-closed session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(
      input.toDS().withWatermark("ts", "1 minute")).writeStream
      .format("memory").queryName("sessions_mono")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(Event(1, ts(0), 1, "view"), Event(2, ts(0), 2, "view"))
      q.processAllAvailable()
      input.addData(Event(3, ts(240), 2, "view")) // watermark → user 1's gap elapses
      q.processAllAvailable()
      input.addData(Event(4, ts(241), 2, "view")) // flush the timed-out session
      q.processAllAvailable()
      // user 1 returns AFTER their session was closed by timeout (well
      // within the counter TTL): the tombstone keeps numbering monotonic
      input.addData(Event(5, ts(250), 1, "view"))
      q.processAllAvailable()
      input.addData(Event(6, ts(600), 2, "view"))
      q.processAllAvailable()
      input.addData(Event(7, ts(601), 2, "view")) // flush again
      q.processAllAvailable()
      val u1 = spark.table("sessions_mono").as[Session].collect()
        .filter(_.user_id == 1).sortBy(_.session_id)
      assert(u1.map(_.session_id).toSeq == Seq(1L, 2L),
        s"expected monotonic ids, got ${u1.toSeq}")
    } finally q.stop()
  }

  test("a late event more than a gap before the open session splits, never merges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // 3h watermark delay: a 60-min-late event is legal input
    val q = Sessionize.sessions(input.toDS().withWatermark("ts", "3 hours"))
      .writeStream.format("memory").queryName("late_split_out")
      .outputMode("append").start()
    try {
      input.addData(Event(1, ts(60), 1, "view"), Event(2, ts(65), 1, "view"))
      q.processAllAvailable()
      input.addData(Event(3, ts(0), 1, "view")) // 60 min before t_start
      q.processAllAvailable()
      input.addData(Event(4, ts(600), 1, "view")) // closes the open session
      q.processAllAvailable()
      val out = spark.table("late_split_out").collect()
        .map(r => (r.getAs[Long]("session_id"), r.getAs[Long]("n_events"),
          r.getAs[Timestamp]("t_start")))
        .sortBy(_._1)
      // batch semantics: [ts0] alone, then [ts60, ts65] — never one
      // stretched session of 3 events
      assert(out.length == 2)
      assert(out(0) == ((1L, 1L, ts(0))))
      assert(out(1) == ((2L, 2L, ts(60))))
    } finally q.stop()
  }

  test("a >24h event-time jump does not crash the gap-timeout handler") {
    // the tombstone's TTL timestamp (t_end + 24h) can be BELOW the
    // watermark after a backfill-style jump; setTimeoutTimestamp must be
    // clamped above the watermark or Spark throws and kills the query
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(
      input.toDS().withWatermark("ts", "1 minute")).writeStream
      .format("memory").queryName("sessions_jump")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(Event(1, ts(0), 1, "view"), Event(2, ts(0), 2, "view"))
      q.processAllAvailable()
      input.addData(Event(3, ts(3000), 2, "view")) // 50h jump → watermark ≫ t_end+TTL
      q.processAllAvailable()
      input.addData(Event(4, ts(3001), 2, "view")) // user 1's gap timeout fires here
      q.processAllAvailable()
      val u1 = spark.table("sessions_jump").as[Session].collect().filter(_.user_id == 1)
      assert(u1.map(_.session_id).toSeq == Seq(1L))
    } finally q.stop()
  }

  test("streaming session semantics match the batch st02 operator") {
    import spark.implicits._
    // batch path over the same tiny event set
    val df = Seq(
      (1L, ts(0), 7L, "view"), (2L, ts(10), 7L, "view"),
      (3L, ts(100), 7L, "view"), (4L, ts(105), 8L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    df.createOrReplaceTempView("ev_tiny")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    import org.apache.spark.sql.functions._
    val batch = df
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_sess", when($"prev_ts".isNull ||
        unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum($"new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"), min($"ts").as("t_start"), max($"ts").as("t_end"))
      .orderBy($"user_id", $"session_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(batch.toSeq == Seq((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L)))
  }

  test("streaming tumbling-window agg finalizes windows behind watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Sessionize.windowCounts(input.toDS()).writeStream
      .format("memory").queryName("windows_out")
      .outputMode("append")
      .start()
    try {
      input.addData(
        Event(1, ts(1), 1, "view"), Event(2, ts(2), 1, "view"),
        Event(3, ts(4), 2, "click"))
      q.processAllAvailable()
      input.addData(Event(4, ts(60), 1, "view")) // watermark passes window [0,5)
      q.processAllAvailable()
      input.addData(Event(5, ts(120), 1, "view"))
      q.processAllAvailable()
      val out = spark.table("windows_out").collect()
        .map(r => (r.getAs[Timestamp]("ws"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"))).toSet
      assert(out.contains((ts(0), "view", 2L)))
      assert(out.contains((ts(0), "click", 1L)))
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events without stream-side state") {
    // the streaming ENRICHMENT shape: a dim (here event_type -> weight)
    // joins into an unbounded stream as a broadcast hash join - no
    // watermark, no join state, the dim re-broadcasts per micro-batch.
    // At 100 TB/day this is how reference data (user dims, geo tables,
    // model routing tables) attaches to a firehose.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("view", 1.0), ("click", 2.0), ("purchase", 10.0))
      .toDF("event_type", "weight")
    val input = MemoryStream[Event]
    val enriched = input.toDS()
      .join(org.apache.spark.sql.functions.broadcast(dim), "event_type")
      .select($"event_id", $"user_id", $"event_type", $"weight")
    val q = enriched.writeStream
      .format("memory").queryName("enriched_out")
      .outputMode("append")
      .start()
    try {
      input.addData(
        Event(1, ts(0), 1, "view"), Event(2, ts(1), 1, "purchase"),
        Event(3, ts(2), 2, "pageping")) // not in the dim -> dropped (inner)
      q.processAllAvailable()
      val out = spark.table("enriched_out").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("weight"))).toSet
      assert(out == Set((1L, 1.0), (2L, 10.0)))
    } finally q.stop()
  }

  test("streaming VCF ingestion fails fast on a shard with mismatched samples") {
    import java.nio.file.Files
    import graft.operators.Etl.VcfFixture
    import graft.sources.VcfReader
    val dir = Files.createTempDirectory("vcf_stream_bad")
    val header = VcfFixture.lines.takeWhile(_.startsWith("#"))
    // same fields but sample columns swapped: positional genotype
    // assignment would silently attribute mom's calls to dad
    val badHeader = header.init :+
      header.last.replace("s1\ts2\ts3\ts4", "s2\ts1\ts3\ts4")
    Files.writeString(dir.resolve("bad.vcf"),
      (badHeader ++ VcfFixture.lines.dropWhile(_.startsWith("#")).take(1))
        .mkString("\n") + "\n")
    val q = VcfReader.streamVariants(spark, header, dir.toString)
      .writeStream.format("memory").queryName("vcf_stream_bad_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("header mismatch") ||
        Option(e.getCause).exists(_.toString.contains("header mismatch")))
    } finally q.stop()
  }

  test("streaming VCF ingestion: shards dropped into a directory parse incrementally") {
    import java.nio.file.Files
    import graft.operators.Etl.VcfFixture
    import graft.sources.VcfReader
    val dir = Files.createTempDirectory("vcf_stream")
    val header = VcfFixture.lines.takeWhile(_.startsWith("#"))
    val body = VcfFixture.lines.dropWhile(_.startsWith("#"))
    // shard 1 arrives before the stream starts
    Files.writeString(dir.resolve("shard1.vcf"),
      (header ++ body.take(2)).mkString("\n") + "\n")

    val q = VcfReader.streamVariants(spark, header, dir.toString)
      .writeStream.format("memory").queryName("vcf_stream_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("vcf_stream_out").count() == 2)
      // shard 2 lands mid-stream: its 2 records decompose to 3 rows
      // (the multiallelic 2:300 G->A,T) and only the delta appends.
      // Written OUTSIDE the watched dir then atomically moved in — the
      // file-source contract; a non-atomic write can be listed empty.
      val tmp2 = Files.createTempFile("shard2", ".vcf")
      Files.writeString(tmp2, (header ++ body.drop(2)).mkString("\n") + "\n")
      Files.move(tmp2, dir.resolve("shard2.vcf"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      q.processAllAvailable()
      val rows = spark.table("vcf_stream_out")
      assert(rows.count() == 5)
      assert(rows.select("chrom", "pos", "alt").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet ==
        Set(("1", 100L, "G"), ("1", 200L, "T"),
          ("2", 300L, "A"), ("2", 300L, "T"), ("X", 400L, "C")))
    } finally q.stop()
  }
}

/** Stream-stream equi-join within watermark bounds — the remaining
  * streaming join shape (e.g. click↔view attribution over event time).
  */
class StreamStreamJoinSpec extends SparkSpec {
  import java.sql.Timestamp
  private def ts(minutes: Long) = new Timestamp(1700000400000L + minutes * 60000L)

  test("watermarked stream-stream join matches pairs inside the interval") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val views = MemoryStream[graft.streaming.Event]
    val clicks = MemoryStream[graft.streaming.Event]
    val v = views.toDS().withWatermark("ts", "10 minutes")
      .select($"user_id".as("v_user"), $"ts".as("v_ts"), $"event_id".as("v_id"))
    val c = clicks.toDS().withWatermark("ts", "10 minutes")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val joined = v.join(c,
      expr("v_user = c_user AND c_ts BETWEEN v_ts AND v_ts + INTERVAL 5 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      views.addData(graft.streaming.Event(1, ts(0), 7, "view"))
      clicks.addData(
        graft.streaming.Event(10, ts(3), 7, "click"),  // inside window
        graft.streaming.Event(11, ts(9), 7, "click"),  // outside window
        graft.streaming.Event(12, ts(3), 8, "click"))  // other user
      q.processAllAvailable()
      views.addData(graft.streaming.Event(2, ts(60), 9, "view")) // advance watermark
      clicks.addData(graft.streaming.Event(13, ts(60), 9, "click"))
      q.processAllAvailable()
      val pairs = spark.table("ssj_out")
        .select("v_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 10L)))
      assert(!pairs.contains((1L, 11L)) && !pairs.contains((1L, 12L)))
    } finally q.stop()
  }

  test("streaming corpus curation: quality gate + in-watermark exact dedup (st05 analog)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // (arrival ts, doc_id, text) — an ingest stream of documents
    val input = MemoryStream[(Timestamp, Long, String)]
    // must clear the 0.3 quality gate: 23 tokens, 13 en-stopword hits
    // -> 0.5*23/100 + 0.5*13/23 = 0.3976
    val good = "the cat is one of the best of all the cats and " +
      "the dog is one of the best of all the dogs"
    val junk = "zxqj vwpk"  // no stopwords, tiny -> fails the gate
    val curated = input.toDS()
      .toDF("ts", "doc_id", "text")
      .withWatermark("ts", "1 minute")
      .withColumn("score",
        expr(s"round(${graft.operators.Text.scoreExpr}, 6)"))
      .filter($"score" >= 0.3)
      .withColumn("content_md5", md5($"text"))
      .dropDuplicatesWithinWatermark("content_md5")
    val q = curated.writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 1L, good), (ts(0), 2L, good), (ts(0), 3L, junk))
      q.processAllAvailable()
      // a later duplicate still within the watermark: dropped by state
      input.addData((ts(1), 4L, good))
      q.processAllAvailable()
      // advance the watermark past the first content's expiry: state
      // evicts at the END of the batch whose watermark passed the key,
      // so a separate pusher batch must land first
      input.addData((ts(240), 9L, good + " again and again"))
      q.processAllAvailable()
      // key evicted -> the same content re-admits (bounded state: the
      // stream never holds the full corpus)
      input.addData((ts(300), 5L, good))
      q.processAllAvailable()
      val out = spark.table("curate_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out.contains(1L), s"first good doc must survive: $out")
      assert(!out.contains(2L) && !out.contains(4L), s"in-watermark dups must drop: $out")
      assert(!out.contains(3L), s"low-quality doc must be gated out: $out")
      assert(out.contains(5L), s"post-eviction re-admit expected: $out")
      // batch/stream parity on the shared rule: the batch query's
      // survivor for this content is the min doc_id the stream saw first
      val batch = graft.operators.StreamingOps.st05(spark, "/root/testdata/sf0.001")
      assert(batch.columns.toSeq ==
        Seq("content_md5", "doc_id", "n_dupes", "score"))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate deliveries within the watermark (st03 analog)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = input.toDS()
      .withWatermark("ts", "1 minute")
      .withColumn("minute", date_trunc("minute", $"ts"))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // three deliveries of the same logical event + one distinct event
      input.addData(
        Event(1, ts(0), 7, "view"), Event(2, ts(0), 7, "view"),
        Event(3, ts(0), 7, "view"), Event(4, ts(0), 7, "click"))
      q.processAllAvailable()
      // late duplicate still within the watermark window: also dropped
      input.addData(Event(5, ts(0), 7, "view"))
      q.processAllAvailable()
      // advance the watermark far past the key's window → state evicted;
      // a fresh event for the SAME key in a later minute passes through
      input.addData(Event(6, ts(240), 7, "view"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[Event].collect()
      assert(out.count(e => e.user_id == 7 && e.event_type == "view" && e.ts == ts(0)) == 1,
        s"duplicates survived: ${out.toSeq}")
      assert(out.count(e => e.event_type == "click") == 1)
      assert(out.count(e => e.ts == ts(240)) == 1)
    } finally q.stop()
  }

  test("st06 streaming twin: RateMonitor flags match the batch trailing rule") {
    import spark.implicits._
    import graft.streaming.{RateFlag, RateMonitor, WindowCount}
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.StreamingOps
      .st06(spark, "/root/testdata/sf0.001").collect()
    def toTs(a: Any): Timestamp = a match {
      case t: Timestamp => t
      case l: java.time.LocalDateTime => Timestamp.valueOf(l)
    }
    val wcs = batch
      .map(r => WindowCount(toTs(r.get(0)), r.getString(1), r.getLong(2)))
      .sortBy(_.ws.getTime)
    val input = MemoryStream[WindowCount]
    val q = RateMonitor.flags(input.toDS()).writeStream
      .format("memory").queryName("rate_out").outputMode("append").start()
    try {
      // two micro-batches: state must carry trailing counts across them
      val (b1, b2) = wcs.splitAt(wcs.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val out = spark.table("rate_out").as[RateFlag].collect()
        .map(f => (f.event_type, f.ws.getTime) -> f).toMap
      assert(out.size == batch.length)
      batch.foreach { r =>
        val f = out((r.getString(1), toTs(r.get(0)).getTime))
        assert(f.n_events == r.getLong(2))
        val bAvg = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        val sAvg = f.trailing_avg.map(a =>
          BigDecimal(a).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        assert(sAvg == bAvg, s"trailing_avg mismatch at ${r.get(0)}/${r.getString(1)}")
        assert(f.anomaly == r.getBoolean(4))
      }
      // every type's first window has no history -> never an anomaly
      wcs.groupBy(_.event_type).foreach { case (tpe, ws) =>
        val first = ws.minBy(_.ws.getTime)
        assert(!out((tpe, first.ws.getTime)).anomaly)
        assert(out((tpe, first.ws.getTime)).trailing_avg.isEmpty)
      }
    } finally q.stop()
  }

  test("st07 streaming twin: DriftMonitor matches the batch L1 drift rule") {
    import spark.implicits._
    import graft.streaming.{DriftFlag, DriftMonitor, WindowCount}
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    def toTs(a: Any): Timestamp = a match {
      case t: Timestamp => t
      case l: java.time.LocalDateTime => Timestamp.valueOf(l)
    }
    // feed the twin the same pre-aggregated (window, type) counts the
    // batch query derives internally
    val wcs = Tables(spark, dir, "events")
      .groupBy(org.apache.spark.sql.functions.window($"ts", "5 minutes")
        .as("w"), $"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
      .select($"w.start".as("ws"), $"event_type", $"c")
      .collect()
      .map(r => WindowCount(toTs(r.get(0)), r.getString(1), r.getLong(2)))
      .sortBy(_.ws.getTime)
    val batch = graft.operators.StreamingOps.st07(spark, dir).collect()
      .map(r => toTs(r.get(0)).getTime ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    val input = MemoryStream[WindowCount]
    val q = DriftMonitor.flags(input.toDS()).writeStream
      .format("memory").queryName("drift_out").outputMode("append").start()
    try {
      // split mid-stream: the previous-window histogram must carry
      // across micro-batches
      val (b1, b2) = wcs.splitAt(wcs.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val out = spark.table("drift_out").as[DriftFlag].collect()
        .map(f => f.ws.getTime -> f).toMap
      // streaming emits every window (first with no drift); batch drops
      // the history-less first window
      assert(out.size == batch.size + 1)
      val firstWs = wcs.map(_.ws.getTime).min
      assert(out(firstWs).drift.isEmpty && !out(firstWs).shifted)
      batch.foreach { case (ws, (n, num, drift, shifted)) =>
        val f = out(ws)
        assert(f.n == n, s"window $ws: total ${f.n} vs $n")
        assert(f.drift_num.contains(num), s"window $ws: num ${f.drift_num} vs $num")
        assert(f.drift.contains(drift), s"window $ws: drift ${f.drift} vs $drift")
        assert(f.shifted == shifted)
      }
    } finally q.stop()
  }

  test("st08 streaming twin: LatestState converges to the batch compaction") {
    import spark.implicits._
    import org.apache.spark.sql.functions.unix_micros
    import graft.streaming.{CdcEvent, LatestRow, LatestState}
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.StreamingOps
      .st08(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))).toMap
    val raw = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("ts_us"),
        $"event_type", $"value")
      .as[CdcEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    val input = MemoryStream[CdcEvent]
    val q = LatestState.latest(input.toDS()).writeStream
      .format("memory").queryName("latest_out").outputMode("append").start()
    try {
      // two micro-batches: per-key winners must carry across them
      val (b1, b2) = raw.splitAt(raw.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val out = spark.table("latest_out").as[LatestRow].collect()
      // each emission strictly improves a key, so the max-order row per
      // key is the converged state
      val fin = out.groupBy(_.user_id).map { case (u, rows) =>
        u -> rows.maxBy(r => (r.last_ts_us, r.last_event_id)) }
      assert(fin.keySet == batch.keySet)
      batch.foreach { case (u, (eid, tsUs, tpe, v)) =>
        val f = fin(u)
        assert((f.last_event_id, f.last_ts_us, f.last_type, f.last_value)
          == ((eid, tsUs, tpe, v)), s"user $u diverged from batch")
      }
      // a full replay of the stream is a no-op: every row loses the
      // max-order race against existing state (CDC idempotence)
      val before = spark.table("latest_out").count()
      input.addData(raw.toSeq); q.processAllAvailable()
      assert(spark.table("latest_out").count() == before)
    } finally q.stop()
  }

  test("st14 streaming twin: ChurnState converges to the batch audit") {
    import spark.implicits._
    import graft.streaming.{ChurnEvent, ChurnRow, ChurnState}
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.StreamingOps
      .st14(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    // arrival axis = event_id (st09's definition): deliver in that order
    val raw = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"event_id", $"event_type")
      .as[ChurnEvent].collect().sortBy(_.event_id)
    val input = MemoryStream[ChurnEvent]
    val q = ChurnState.churn(input.toDS()).writeStream
      .format("memory").queryName("churn_out").outputMode("update").start()
    try {
      // three micro-batches: flips spanning batch boundaries must count
      val third = raw.length / 3
      input.addData(raw.take(third).toSeq); q.processAllAvailable()
      input.addData(raw.slice(third, 2 * third).toSeq); q.processAllAvailable()
      input.addData(raw.drop(2 * third).toSeq); q.processAllAvailable()
      val out = spark.table("churn_out").as[ChurnRow].collect()
      // each emission strictly grows a key's n_events, so the max row
      // per key is the converged audit
      val fin = out.groupBy(_.user_id).map { case (u, rows) =>
        u -> rows.maxBy(_.n_events) }
      assert(fin.keySet == batch.keySet)
      batch.foreach { case (u, (ne, nc, nt, ft, lt)) =>
        val f = fin(u)
        assert((f.n_events, f.n_changes, f.n_types, f.first_type, f.last_type)
          == ((ne, nc, nt, ft, lt)), s"user $u diverged from batch st14")
      }
    } finally q.stop()
  }

  test("delta-dedup streaming twin converges to d15Probe's verdicts") {
    import spark.implicits._
    import graft.streaming.{DeltaDedupStream, DeltaDoc, DeltaVerdictRow}
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("ddstream").toString
    graft.operators.Dedup.d15Index(spark, dir)
      .write.mode("overwrite").parquet(s"$tmp/keys.parquet")
    val keys = spark.read.parquet(s"$tmp/keys.parquet")
    val delta = Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    val batch = graft.operators.Dedup
      .d15Probe(keys, delta.select($"doc_id", $"text"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // per-hash delivery in doc_id order = the batch first-wins rule
    val raw = delta.select($"doc_id", $"text").as[DeltaDoc]
      .collect().sortBy(_.doc_id)
    val input = MemoryStream[DeltaDoc]
    val q = DeltaDedupStream.verdicts(input.toDS(), keys).writeStream
      .format("memory").queryName("dd_out").outputMode("append").start()
    try {
      // three micro-batches: within-stream dups spanning batch
      // boundaries must still lose to the earlier kept row
      val third = raw.length / 3
      input.addData(raw.take(third).toSeq); q.processAllAvailable()
      input.addData(raw.slice(third, 2 * third).toSeq); q.processAllAvailable()
      input.addData(raw.drop(2 * third).toSeq); q.processAllAvailable()
      val out = spark.table("dd_out").as[DeltaVerdictRow].collect()
      assert(out.length == raw.length, "append mode must emit each doc once")
      out.foreach { r =>
        assert(batch(r.doc_id) == r.verdict,
          s"doc ${r.doc_id}: stream ${r.verdict} vs batch ${batch(r.doc_id)}")
      }
      // at-least-once REDELIVERY is idempotent: replaying the whole
      // stream re-verdicts every doc exactly as before — the original
      // kept row re-verdicts kept (it IS the stored first-kept id),
      // dups stay dups; no doc_id ever carries contradictory verdicts
      input.addData(raw.toSeq); q.processAllAvailable()
      val replay = spark.table("dd_out").as[DeltaVerdictRow].collect()
        .drop(out.length)
      assert(replay.length == raw.length)
      replay.foreach { r =>
        assert(batch(r.doc_id) == r.verdict,
          s"redelivered doc ${r.doc_id}: ${r.verdict} vs original ${batch(r.doc_id)}")
      }
    } finally q.stop()
  }

  test("near-dup streaming twin converges to d20Probe's verdicts") {
    import spark.implicits._
    import graft.streaming.{DeltaDoc, NearDupStream}
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("ndstream").toString
    graft.operators.Dedup.d20Index(spark, dir).write(s"$tmp/idx")
    val base = graft.operators.Dedup.MinhashIndex.load(spark, s"$tmp/idx")
    // fixture odd docs + an injected near-dup pair that STRADDLES a
    // micro-batch boundary (the fixture has no within-delta near dups,
    // so without it the cross-batch seen-index path is never load-
    // bearing); the pair's ids sit above every fixture id and share no
    // tokens with it, so global first-wins order is unaffected
    val nd1 = (1 to 20).map(i => s"zz$i").mkString(" ")
    val nd2 = ((1 to 19).map(i => s"zz$i") :+ "zz99").mkString(" ")
    val fixture = Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
      .select($"doc_id", $"text").as[DeltaDoc].collect().sortBy(_.doc_id)
    val delta = fixture.toSeq ++
      Seq(DeltaDoc(2001L, nd1), DeltaDoc(2003L, nd2))
    val batchV = graft.operators.Dedup
      .d20Probe(base, delta.toDF("doc_id", "text"))
    val third = fixture.length / 3
    val input = MemoryStream[DeltaDoc]
    val q = NearDupStream.start(input.toDS(), base,
      s"$tmp/state", s"$tmp/out")
    try {
      // batch 2 carries nd1, batch 3 nd2: the match crosses the boundary
      input.addData(fixture.take(third).toSeq); q.processAllAvailable()
      input.addData(fixture.slice(third, 2 * third).toSeq :+ DeltaDoc(2001L, nd1))
      q.processAllAvailable()
      input.addData(fixture.drop(2 * third).toSeq :+ DeltaDoc(2003L, nd2))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$tmp/out")
      assert(out.count() == batchV.count(), "one verdict per sig-bearing doc")
      assert(out.exceptAll(batchV).isEmpty && batchV.exceptAll(out).isEmpty,
        "stream verdicts diverge from the one-shot batch d20Probe")
      // the cross-batch pair exercised the seen index: nd2 must have
      // lost to nd1 (an earlier MICRO-BATCH, not an earlier row of its own)
      val nd2Row = out.filter($"doc_id" === 2003L).collect().head
      assert(nd2Row.getAs[String]("verdict") == "delta_near_dup" &&
        nd2Row.getAs[Long]("first_delta_match") == 2001L)
      assert(out.filter($"verdict" === "base_near_dup").count() > 0,
        "fixture must exercise the base-index leg too")
    } finally q.stop()
  }

  test("near-dup stream: the documented cap-crossing batch/stream divergence") {
    // NearDupStream.scala:33-36 promises: a bucket that crosses the
    // ≤50 occupancy cap only MID-stream refuses candidates from that
    // point on, where the one-shot batch form refuses them all. Pin
    // both halves with a bucket built to cross exactly at batch 2.
    import spark.implicits._
    import graft.streaming.{DeltaDoc, NearDupStream}
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ndcap").toString
    // a standing index with none of the hot bucket's shingles
    val base = graft.operators.Dedup.d20IndexOf(
      Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
        .toDF("doc_id", "text"))
    base.write(s"$tmp/idx")
    val idx = graft.operators.Dedup.MinhashIndex.load(spark, s"$tmp/idx")
    // 60 IDENTICAL docs: one signature, all 16 band buckets at
    // occupancy 60 — past the cap as a whole, under it at 30
    val hotText = (1 to 10).map(i => s"capx$i").mkString(" ")
    val hot = (0 until 60).map(i => DeltaDoc(100L + i, hotText))
    // batch form: 60 > 50 in every bucket -> ALL candidates refused
    val batchV = graft.operators.Dedup
      .d20Probe(idx, hot.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict"))
      .toMap
    assert(batchV.size == 60 && batchV.values.forall(_ == "kept"),
      "one-shot batch must refuse the whole capped bucket")
    // stream form: batch 1 (30 docs) is under the cap -> first doc
    // kept, the other 29 confirm against it; batch 2 sees
    // seen(30) + delta(30) = 60 > 50 -> refuses from that point on
    val input = MemoryStream[DeltaDoc]
    val q = NearDupStream.start(input.toDS(), idx, s"$tmp/state", s"$tmp/out")
    try {
      input.addData(hot.take(30)); q.processAllAvailable()
      input.addData(hot.drop(30)); q.processAllAvailable()
      val out = spark.read.parquet(s"$tmp/out").collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[String]("verdict"), r.getAs[Any]("first_delta_match"))))
        .toMap
      assert(out.size == 60)
      assert(out(100L)._1 == "kept", "stream batch 1: first doc survives")
      (101L to 129L).foreach { id =>
        assert(out(id) == (("delta_near_dup", 100L)),
          s"stream batch 1 doc $id must confirm against doc 100")
      }
      (130L to 159L).foreach { id =>
        assert(out(id)._1 == "kept",
          s"stream batch 2 doc $id must be refused (cap crossed mid-stream)")
      }
      // the divergence, stated: batch refuses 59 verdicts the stream
      // split 29/30 — identical everywhere EXCEPT batch 1's confirms
      val diverging = out.filter { case (id, (v, _)) => v != batchV(id) }
      assert(diverging.keySet == (101L to 129L).toSet,
        "batch/stream divergence must be exactly batch 1's confirmed docs")
    } finally q.stop()
  }

  test("st09 disorder audit matches a hand-rolled per-user replay") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.StreamingOps.st09(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val events = graft.Tables(spark, dir, "events")
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_micros($"ts".cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    assert(out.keySet == byUser.keySet)
    byUser.foreach { case (u, evs) =>
      var prevMax = Long.MinValue
      var late = 0L; var worst = 0L
      evs.sortBy(_._2).foreach { case (_, _, us) =>
        val d = if (prevMax == Long.MinValue || prevMax <= us) 0L else prevMax - us
        if (d > 600000000L) late += 1
        worst = math.max(worst, d)
        prevMax = math.max(prevMax, us)
      }
      assert(out(u) == ((evs.length.toLong, late, worst)), s"user $u")
    }
  }

  test("st10 stream-stream LEFT OUTER join emits null-padded rows on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val purchases = MemoryStream[graft.streaming.Event]
    val views = MemoryStream[graft.streaming.Event]
    val p = purchases.toDS().withWatermark("ts", "10 minutes")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
    val v = views.toDS().withWatermark("ts", "10 minutes")
      .select($"user_id".as("v_user"), $"ts".as("v_ts"), $"event_id".as("v_id"))
    val joined = p.join(v,
      expr("p_user = v_user AND v_ts BETWEEN p_ts - INTERVAL 30 minutes AND p_ts"),
      "leftOuter")
    val q = joined.writeStream.format("memory").queryName("st10_out")
      .outputMode("append").start()
    try {
      purchases.addData(
        graft.streaming.Event(1, ts(40), 7, "purchase"),  // view 5 min before
        graft.streaming.Event(2, ts(40), 8, "purchase"))  // no view at all
      views.addData(graft.streaming.Event(10, ts(35), 7, "view"))
      q.processAllAvailable()
      // matched row emits immediately; the unmatched one must WAIT
      val early = spark.table("st10_out").collect()
      assert(early.exists(r => r.getAs[Long]("p_id") == 1L
        && r.getAs[Long]("v_id") == 10L))
      assert(!early.exists(r => r.getAs[Long]("p_id") == 2L),
        "outer row emitted before the watermark proved no match")
      // push the watermark far past purchase 2's join bound on BOTH
      // streams -> the null-padded outer row flushes
      purchases.addData(graft.streaming.Event(3, ts(600), 9, "purchase"))
      views.addData(graft.streaming.Event(11, ts(600), 9, "view"))
      q.processAllAvailable()
      q.processAllAvailable()
      val out = spark.table("st10_out").collect()
      val unmatched = out.filter(r => r.getAs[Long]("p_id") == 2L)
      assert(unmatched.length == 1 && unmatched.head.isNullAt(
        unmatched.head.fieldIndex("v_id")),
        s"expected one null-padded row for purchase 2, got ${out.toSeq}")
    } finally q.stop()
  }

  test("st11 streaming twin: watermarked window counts + downstream rank match the batch rule") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // st11's documented streaming shape: the stateful windowed count
    // runs behind the watermark (append mode — windows emit once
    // closed); the dim-sized rank applies to the EMITTED frame, never
    // inside the stateful agg
    val counts = input.toDS().withWatermark("ts", "1 minute")
      .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select($"w.start".as("ws"), $"event_type", $"n_events")
    val q = counts.writeStream.format("memory").queryName("st11_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // window A (min 0-5): view x4, click x3, purchase x2, scroll x1
      // window B (min 5-10): click x5, scroll x4, buy x1, view x1 (tie)
      var id = 0L
      def ev(m: Long, t: String): Event = { id += 1; Event(id, ts(m), 1, t) }
      input.addData(
        (Seq.fill(4)("view") ++ Seq.fill(3)("click") ++
          Seq.fill(2)("purchase") ++ Seq("scroll")).map(ev(1, _)) ++
        (Seq.fill(5)("click") ++ Seq.fill(4)("scroll") ++
          Seq("buy", "view")).map(ev(6, _)): _*)
      q.processAllAvailable()
      input.addData(ev(30, "flush")) // watermark 29 min: closes A and B
      q.processAllAvailable()
      val rk = org.apache.spark.sql.expressions.Window
        .partitionBy($"ws").orderBy($"n_events".desc, $"event_type".asc)
      val ranked = spark.table("st11_out")
        .withColumn("rank", row_number().over(rk))
        .filter($"rank" <= 3)
        .select($"ws", $"event_type", $"n_events", $"rank")
        .collect()
        .map(r => (r.getTimestamp(0), r.getInt(3)) ->
          (r.getString(1), r.getLong(2))).toMap
      assert(ranked((ts(0), 1)) == ("view", 4L))
      assert(ranked((ts(0), 2)) == ("click", 3L))
      assert(ranked((ts(0), 3)) == ("purchase", 2L))
      assert(ranked((ts(5), 1)) == ("click", 5L))
      assert(ranked((ts(5), 2)) == ("scroll", 4L))
      // the 1-count tie breaks lexicographically: 'buy' beats 'view'
      assert(ranked((ts(5), 3)) == ("buy", 1L))
      assert(ranked.size == 6, s"exactly top-3 per closed window: $ranked")
    } finally q.stop()
  }

  test("SessionFunnel streaming twin matches batch st12's stage frame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{SessionFunnel, SessionFunnelRow}
    // user 10: full funnel, then a second session with no click (its
    // purchase must NOT count); user 11: view only; user 12: a click
    // BEFORE any view (must not count) then view→click→purchase
    val evs = Seq(
      Event(1, ts(0), 10, "view"), Event(2, ts(5), 10, "click"),
      Event(3, ts(9), 10, "purchase"),
      Event(4, ts(120), 10, "view"), Event(5, ts(125), 10, "purchase"),
      Event(6, ts(0), 11, "view"),
      Event(7, ts(0), 12, "click"), Event(8, ts(3), 12, "view"),
      Event(9, ts(6), 12, "click"), Event(10, ts(8), 12, "purchase"))

    val dir = java.nio.file.Files.createTempDirectory("st12_parity").toString
    evs.toDS().write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.operators.StreamingOps.sessionStages(spark, dir)
      .select($"user_id", $"session_id", $"t_view", $"t_click", $"t_purchase")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.getTimestamp(2)), Option(r.getTimestamp(3)),
          Option(r.getTimestamp(4)))).toMap

    val input = MemoryStream[Event]
    val q = SessionFunnel.funnels(
      input.toDS().withWatermark("ts", "1 minute")).writeStream
      .format("memory").queryName("st12_twin_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(Event(90, ts(600), 99, "view")) // watermark → 599
      q.processAllAvailable()
      input.addData(Event(91, ts(601), 99, "view")) // flush timed-out state
      q.processAllAvailable()
      val streamed = spark.table("st12_twin_out").as[SessionFunnelRow]
        .collect().filter(_.user_id != 99)
        .map(r => (r.user_id, r.session_id) ->
          (r.t_view, r.t_click, r.t_purchase)).toMap
      assert(streamed.keySet == batch.keySet,
        s"closed sessions: $streamed vs batch $batch")
      streamed.foreach { case (k, v) =>
        assert(v == batch(k), s"stage times for $k: $v vs ${batch(k)}")
      }
      // spot-pin the semantics the fixture encodes
      assert(batch((10L, 1L))._3.isDefined) // full funnel
      assert(batch((10L, 2L))._3.isEmpty) // purchase without click
      assert(batch((12L, 1L)) ==
        (Some(ts(3)), Some(ts(6)), Some(ts(8)))) // pre-view click skipped
    } finally q.stop()
  }
}
