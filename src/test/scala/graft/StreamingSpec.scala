package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("streaming windowed agg over MemoryStream matches batch result") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(1), 10, "click", 1.5),
      Event(2, ts(2), 10, "click", 2.5),
      Event(3, ts(61), 11, "view", 4.0))

    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = EventStreams.windowedAgg(mem.toDF(), windowLen = "1 hour")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_out")
      .orderBy("window_start", "event_type").collect()
    val batch = EventStreams.windowedAgg(events.toDF(), windowLen = "1 hour")
      .orderBy("window_start", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.length === 2)
    assert(streamed.head.getAs[Long]("n_events") === 2L)
    assert(streamed.head.getAs[Double]("sum_value") === 4.0)
  }

  test("streaming windowed HLL state equals the batch sketch per window") {
    implicit val sqlCtx = spark.sqlContext
    // two 1-hour windows; users overlap and repeat within windows
    val w1 = (1 to 40).map(u => Event(u.toLong, ts(u % 50), (u % 25).toLong, "c", 0.0))
    val w2 = (1 to 30).map(u => Event(100 + u.toLong, ts(60 + (u % 50)), (u % 17).toLong, "c", 0.0))
    val closer = Event(999, ts(600), 1, "c", 0.0) // advances the watermark

    val mem = MemoryStream[Event]
    mem.addData(w1 ++ w2: _*)
    val q = EventStreams.hllDistinctWindows(mem.toDS(), windowMs = 3600000L,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("hll_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      mem.addData(closer)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("hll_out")
      .orderBy("window_start").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getDouble(1), r.getLong(2)))
    assert(streamed.length === 2) // both hour windows flushed, 10-min window open
    // batch twin on the same rows, grouped by the same tumbling window
    val batch = graft.llm.Sketches.hllDistinct(
        (w1 ++ w2).toDF().selectExpr(
          "cast(floor(cast(ts as double) / 3600) * 3600000 as long) as win",
          "user_id"),
        "win", "user_id")
      .orderBy("win").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(streamed.toSeq === batch.toSeq)
    // sanity: estimates track the true cardinalities (25 and 17)
    assert(math.abs(streamed(0)._2 - 25.0) < 10.0)
    assert(math.abs(streamed(1)._2 - 17.0) < 8.0)
  }

  test("streaming windowed CMS cells equal the batch sketch per window") {
    implicit val sqlCtx = spark.sqlContext
    // two 1-hour windows of skewed user traffic (ts ≥ 1 min: a row at
    // exactly epoch 0 ties the initial watermark and is dropped as late —
    // the standard watermark contract, not a sketch property)
    val w1 = (1 to 60).map(u => Event(u.toLong, ts(1 + u % 50), (u % 7).toLong, "c", 0.0))
    val w2 = (1 to 40).map(u => Event(100 + u.toLong, ts(60 + (u % 50)), (u % 5).toLong, "c", 0.0))
    val closer = Event(999, ts(600), 1, "c", 0.0) // advances the watermark

    val mem = MemoryStream[Event]
    mem.addData(w1 ++ w2: _*)
    val q = EventStreams.cmsWindows(mem.toDS(), windowMs = 3600000L,
        d = 4, w = 128, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      mem.addData(closer)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("cms_out")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    // batch twin: the same cell derivation over the same rows per window
    import org.apache.spark.sql.functions._
    val batch = (w1 ++ w2).toDF()
      .selectExpr(
        "cast(floor(cast(ts as double) / 3600) * 3600000 as long) as win",
        "cast(user_id as string) as value")
      .select(col("win"), col("value"),
        explode(array((0 until 4).map(lit): _*)).as("r"))
      .withColumn("cell", pmod(
        conv(substring(md5(concat(lit("cms"), col("r").cast("string"),
          lit("|"), col("value"))), 1, 2), 16, 10).cast("int"), lit(128)))
      .groupBy("win", "r", "cell").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(streamed === batch)
    // sanity: a known heavy user's point estimate upper-bounds its truth
    val u3w1 = (1 to 60).count(_ % 7 == 3) // true count of user 3 in window 1
    val est = (0 until 4).map { r =>
      streamed((0L, r, graft.llm.Sketches.cmsScalarCell(r, "3", 128)))
    }.min
    assert(est >= u3w1)
  }

  test("streaming dedup drops repeated keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupedStream(mem.toDF(), keys = Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(1, ts(2), 10, "click", 1.0), // duplicate id within watermark
        Event(2, ts(3), 11, "view", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L))
  }

  test("sliding streaming windows agree with the batch dual") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(10), 10, "click", 1.0),
      Event(2, ts(40), 10, "click", 2.0),
      Event(3, ts(70), 11, "view", 4.0))
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = EventStreams.windowedAgg(mem.toDF(), windowLen = "1 hour",
        slide = Some("30 minutes"))
      .writeStream.format("memory").queryName("slide_out")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("slide_out")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventStreams.windowedAgg(events.toDF(), windowLen = "1 hour",
        slide = Some("30 minutes"))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed === batch)
    // every event lands in exactly len/slide = 2 windows
    assert(streamed.map(_.getAs[Long]("n_events")).sum === 2L * events.size)
  }

  test("windowed agg in append mode drops data later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.windowedAgg(mem.toDF(), windowLen = "1 hour",
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: window [0,60) gets 2 events; max ts = 200min
      mem.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(2), 10, "click", 2.0),
        Event(3, ts(200), 10, "click", 4.0))
      q.processAllAvailable() // watermark advances to 190min; [0,60) closes
      // batch 2: an event for the CLOSED [0,60) window — must be dropped
      mem.addData(Event(4, ts(3), 10, "click", 100.0))
      q.processAllAvailable()
      // advance far enough to also close [180,240)
      mem.addData(Event(5, ts(500), 10, "click", 8.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("late_out")
      .select("window_start", "n_events", "sum_value")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000L,
        r.getLong(1), r.getDouble(2))).toSet
    // [0,60) emitted once with the pre-watermark events only (late event
    // 4 discarded, no re-emission); [180,240) has exactly event 3
    assert(rows.contains((0L, 2L, 3.0)), rows)
    assert(rows.contains((180L, 1L, 4.0)), rows)
    assert(!rows.exists(_._3 == 103.0), rows)
  }

  test("stream-static enrichment broadcast-joins each micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (11L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[Event]
    val q = EventStreams.enrichWithStatic(mem.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(2), 12, "view", 2.0)) // user 12 not in dim -> null tier
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("enrich_out")
      .select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(1L -> Some("gold"), 2L -> None))
  }

  test("stream-stream interval join matches pairs within lookback, per key") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val joined = EventStreams.intervalJoin(
        clicks.toDF().selectExpr("event_id AS click_id", "user_id", "ts"),
        views.toDF().selectExpr("event_id AS view_id", "user_id", "ts"),
        lookback = "10 minutes")
    val q = joined
      .selectExpr("click_id", "view_id")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(Event(101, ts(1), 10, "view", 0.0),   // 9 min before → in
        Event(102, ts(25), 10, "view", 0.0),              // 15 min after → out
        Event(103, ts(8), 11, "view", 0.0))               // other user → out
      clicks.addData(Event(1, ts(10), 10, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ij_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 101L)))
    assert(joined.isStreaming)
  }

  test("foreachBatch idempotent load appends each key exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/t"
    def existing(): org.apache.spark.sql.DataFrame =
      try spark.read.parquet(dir)
      catch { case _: Throwable =>
        Seq.empty[(Long, Long)].toDF("event_id", "user_id") }
    val mem = MemoryStream[Event]
    val q = mem.toDF().select($"event_id", $"user_id")
      .writeStream
      .foreachBatch(EventStreams.idempotentForeachBatch(
        () => existing(),
        b => b.write.mode("append").parquet(dir),
        keys = Seq("event_id")))
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Event(1, ts(1), 10, "a", 1.0), Event(2, ts(2), 11, "b", 1.0),
        Event(1, ts(1), 10, "a", 1.0)) // in-batch duplicate key
      q.processAllAvailable()
      mem.addData(Event(2, ts(3), 11, "b", 1.0), // replay of key 2
        Event(3, ts(4), 12, "c", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.parquet(dir).select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("foreachBatch quality monitor: per-batch verdicts, batch-stamped") {
    import graft.engine.Quality
    implicit val sqlCtx = spark.sqlContext
    val sink = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Double, Boolean)]
    val mem = MemoryStream[Event]
    val q = mem.toDF()
      .writeStream
      .foreachBatch(EventStreams.qualityForeachBatch(
        Seq(
          Quality.Check("v_min", "value", Quality.minOf("value"), 0.0, 1e9),
          Quality.Check("type_ok", "event_type",
            Quality.acceptedValues("event_type", Seq("a", "b")), 1.0, 1.0)),
        rep => sink ++= rep
          .select("batch_id", "check_name", "metric_value", "passed")
          .collect().map(r => (r.getLong(0), r.getString(1),
            r.getDouble(2), r.getBoolean(3)))))
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Event(1, ts(1), 10, "a", 1.0), Event(2, ts(2), 11, "b", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(3), 12, "zzz", -5.0)) // both checks fail
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = sink.groupBy(_._1).view.mapValues(
      _.map(v => v._2 -> v._4).toMap).toMap
    assert(byBatch(0L) === Map("v_min" -> true, "type_ok" -> true))
    assert(byBatch(1L) === Map("v_min" -> false, "type_ok" -> false))
  }

  test("batch sessionization (gaps-and-islands) agrees with streaming state") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Event(1, ts(1), 10, "click", 1.0), Event(2, ts(3), 10, "click", 2.0),
      Event(3, ts(40), 10, "click", 4.0), // 37-min gap → new session
      Event(4, ts(5), 11, "view", 1.5))
    val batch = EventStreams.sessionizeBatch(evs.toDF(), gapMs = 30 * 60000L)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(batch.length === 3)
    assert(batch.head._3 === 2L) // user 10, first session: 2 events
    assert(batch.head._4 === 3.0)

    // streaming path emits the same CLOSED sessions (a subset: the final
    // session per user never closes without more data)
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sess_cmp")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      mem.addData(Event(9, ts(600), 99, "view", 0.0)) // push watermark
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_cmp").as[EventStreams.SessionSummary]
      .collect().map(s => (s.user_id, s.n_events, s.total_value)).toSet
    assert(streamed.subsetOf(
      batch.map(b => (b._1, b._3, b._4)).toSet))
    assert(streamed.contains((10L, 2L, 3.0))) // user 10's closed session
  }

  test("sessionization closes sessions on gap and emits summaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMs = 5 * 60000L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // session 1: user 10, minutes 1-3; then a 30-minute gap
      mem.addData(Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(3), 10, "click", 2.0))
      q.processAllAvailable()
      // events past the gap + watermark push → session 1 must close
      mem.addData(Event(3, ts(33), 10, "click", 4.0),
        Event(4, ts(90), 99, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(5, ts(180), 99, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val sessions = spark.table("sess_out").as[EventStreams.SessionSummary]
      .collect().filter(_.user_id == 10)
    assert(sessions.nonEmpty)
    val s1 = sessions.minBy(_.session_start.getTime)
    assert(s1.session_start === ts(1))
    assert(s1.session_end === ts(3))
    assert(s1.n_events === 2L)
    assert(s1.total_value === 3.0)
  }

  test("streaming near-dup ingest: batches dedup against a GROWING corpus") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame

    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // corpus starts with doc 1; its band table is the persisted LSH state
    var corpus: DataFrame = Seq((1L, base)).toDF("doc_id", "text")
      .localCheckpoint()
    var bandState: DataFrame = graft.llm.Dedup.bandTable(
      corpus, "doc_id", "text", 3, 3, 3).localCheckpoint()

    val sink = EventStreams.nearDupIngestForeachBatch(
      () => corpus, () => bandState,
      docs => corpus = corpus.unionByName(docs).localCheckpoint(),
      bds => bandState = bandState.unionByName(bds).localCheckpoint(),
      "doc_id", "text", n = 3, bands = 3, rowsPerBand = 3, threshold = 0.5)

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(sink).start()
    try {
      // batch 1: near-dup of corpus doc 1 (rejected) + novel doc 10 (kept)
      mem.addData(
        (5L, base.replace("kappa", "lambda")),
        (10L, "completely novel content about spark adaptive execution plans"))
      q.processAllAvailable()
      assert(corpus.select("doc_id").as[Long].collect().sorted.toSeq ===
        Seq(1L, 10L))

      // batch 2: near-dup of BATCH-1's accepted doc 10 (rejected — proves
      // the band state grew), near-dup chain inside the batch (21 kept,
      // 22 rejected for 21), novel 30 kept
      mem.addData(
        (20L, "completely novel content about spark adaptive execution engine"),
        (21L, "fresh second batch document with its own distinctive words"),
        (22L, "fresh second batch document with its own distinctive tokens"),
        (30L, "yet another unrelated document mentioning catalyst optimizer rules"))
      q.processAllAvailable()
      assert(corpus.select("doc_id").as[Long].collect().sorted.toSeq ===
        Seq(1L, 10L, 21L, 30L))
      // band state covers exactly the kept docs (3 bands each)
      assert(bandState.select("doc_id").distinct().as[Long].collect()
        .sorted.toSeq === Seq(1L, 10L, 21L, 30L))

      // replay guard: foreachBatch is at-least-once — re-delivering an
      // already-ingested batch (same ids) must be a NO-OP, not a
      // duplicate append (same-id pairs are invisible to the near-dup
      // join, so only the id anti-join protects state integrity here)
      sink(Seq(
        (21L, "fresh second batch document with its own distinctive words"),
        (30L, "yet another unrelated document mentioning catalyst optimizer rules"))
        .toDF("doc_id", "text"), 99L)
      assert(corpus.select("doc_id").as[Long].collect().sorted.toSeq ===
        Seq(1L, 10L, 21L, 30L))
      assert(bandState.count() === 4 * 3)
    } finally q.stop()
  }

  test("streaming per-host cap: admission stops at cap across batches; " +
      "replay is a no-op; winners are the md5-smallest ids") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, lit}

    // docs store stamped with the admitting batch; VERSIONED counts
    // (batch N reads v(N-1), writes vN — the replay-repairable contract)
    val emptyDocs = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "host", "batch_id")
    val emptyCounts = Seq.empty[(String, Long)].toDF("host", "n_admitted")
    var admitted: DataFrame = emptyDocs.localCheckpoint()
    val versions = scala.collection.mutable.Map[Long, DataFrame]()
    def countsState: DataFrame =
      if (versions.isEmpty) emptyCounts else versions(versions.keys.max)

    val sink = EventStreams.hostCapIngestForeachBatch(
      () => admitted.select("doc_id"),
      id => admitted.where(col("batch_id") === id).select("doc_id", "host"),
      id => versions.getOrElse(id - 1, emptyCounts),
      (docs, id) => admitted = admitted.unionByName(
        docs.withColumn("batch_id", lit(id))).localCheckpoint(),
      (c, id) => versions(id) = c.localCheckpoint(),
      "doc_id", "host", cap = 3)

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "host")
      .writeStream.foreachBatch(sink).start()
    try {
      // batch 1: 4 docs on host a (one over cap), 1 on host b
      mem.addData((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (10L, "b"))
      q.processAllAvailable()
      val after1 = admitted.select("doc_id").as[Long].collect().sorted.toSeq
      assert(after1.length === 4) // 3 of a + 1 of b
      assert(after1.contains(10L))
      val aAfter1 = after1.filter(_ != 10L)
      // the admitted 3 are the md5-smallest of {1,2,3,4} — pin by replay
      // of the samplePerGroup order
      val expect3 = graft.llm.Sampling.samplePerGroup(
        Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a")).toDF("doc_id", "host"),
        "doc_id", "host", k = 3).select("doc_id").as[Long].collect().sorted
      assert(aAfter1 === expect3.toSeq)
      assert(countsState.as[(String, Long)].collect().toMap ===
        Map("a" -> 3L, "b" -> 1L))

      // batch 2: host a is FULL (everything rejected), host b admits 2
      // more then stops
      mem.addData((20L, "a"), (21L, "b"), (22L, "b"), (23L, "b"))
      q.processAllAvailable()
      assert(countsState.as[(String, Long)].collect().toMap ===
        Map("a" -> 3L, "b" -> 3L))
      assert(admitted.count() === 6L)
      assert(!admitted.select("doc_id").as[Long].collect().contains(20L))

      // replay: re-delivering batch 0's data UNDER ITS OWN batch id must
      // change nothing except rewriting the identical v0 (at-least-once)
      sink(Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (10L, "b"))
        .toDF("doc_id", "host"), 0L)
      assert(admitted.count() === 6L)
      assert(versions(0L).as[(String, Long)].collect().toMap ===
        Map("a" -> 3L, "b" -> 1L))
      assert(countsState.as[(String, Long)].collect().toMap ===
        Map("a" -> 3L, "b" -> 3L))
    } finally q.stop()
  }

  test("host-cap crash window: a count write lost after the doc append " +
      "is rebuilt on replay — cap never exceeded, ids never doubled") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, lit}

    val emptyDocs = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "host", "batch_id")
    val emptyCounts = Seq.empty[(String, Long)].toDF("host", "n_admitted")
    var admitted: DataFrame = emptyDocs.localCheckpoint()
    val versions = scala.collection.mutable.Map[Long, DataFrame]()
    var crashCountsWrite = false
    val sink = EventStreams.hostCapIngestForeachBatch(
      () => admitted.select("doc_id"),
      id => admitted.where(col("batch_id") === id).select("doc_id", "host"),
      id => versions.getOrElse(id - 1, emptyCounts),
      (docs, id) => admitted = admitted.unionByName(
        docs.withColumn("batch_id", lit(id))).localCheckpoint(),
      (c, id) => {
        if (crashCountsWrite) throw new RuntimeException("simulated crash")
        versions(id) = c.localCheckpoint()
      },
      "doc_id", "host", cap = 3)

    // batch 0 crashes in the non-atomic window: docs appended, counts
    // version never written — the exact hazard from the round-4 advice
    val b0 = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (10L, "b"))
      .toDF("doc_id", "host")
    crashCountsWrite = true
    intercept[RuntimeException] { sink(b0, 0L) }
    assert(admitted.count() === 4L) // 3 of a + 1 of b persisted
    assert(versions.isEmpty)        // the count delta is lost

    // replay of batch 0: the crashed rows are charged to the budget (so
    // doc 4 of host 'a' is NOT admitted even though no counts version
    // exists yet) and v0 is rebuilt from the docs store
    crashCountsWrite = false
    sink(b0, 0L)
    assert(admitted.count() === 4L) // nothing doubled, nothing extra
    assert(versions(0L).as[(String, Long)].collect().toMap ===
      Map("a" -> 3L, "b" -> 1L))

    // next batch sees the repaired counts: host a is full
    sink(Seq((30L, "a"), (31L, "b")).toDF("doc_id", "host"), 1L)
    assert(versions(1L).as[(String, Long)].collect().toMap ===
      Map("a" -> 3L, "b" -> 2L))
    val ids = admitted.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(31L) && !ids.contains(30L))
    // per-host invariant held through the crash: never above cap
    assert(admitted.groupBy("host").count()
      .collect().forall(_.getLong(1) <= 3L))
  }

  test("scd2ForeachBatch: CDC stream builds the versioned dimension; " +
      "in-batch changes compact last-wins; replay rewrites the same version") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-02-01")
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "k LONG, attr STRING, valid_from DATE, valid_to DATE"))
    // versioned state: batch N reads v(N-1), writes vN — replays rewrite
    val state = scala.collection.mutable.Map[Long, DataFrame]()
    val sink = EventStreams.scd2ForeachBatch(
      id => state.getOrElse(id - 1, empty),
      (df, id) => state(id) = df.localCheckpoint(),
      Seq("k"), Seq("attr"), "seq",
      id => lit(java.sql.Date.valueOf(f"2024-${id + 1}%02d-01")))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("k", "attr", "seq")
      .writeStream.foreachBatch(sink).start()
    try {
      // batch 0: two changes to k=1 inside ONE batch -> last (seq 2) wins
      mem.addData((1L, "a", 1L), (2L, "b", 1L), (1L, "a1", 2L))
      q.processAllAvailable()
      val v0 = state(0L).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDate(2),
          Option(r.getDate(3)))).toSet
      assert(v0 === Set((1L, "a1", d1, None), (2L, "b", d1, None)))

      // batch 1: k=1 changes again (close + reopen), k=2 silent, k=3 new
      mem.addData((1L, "a2", 1L), (3L, "c", 1L))
      q.processAllAvailable()
      val v1rows = state(1L).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDate(2),
          Option(r.getDate(3)))).toSet
      assert(v1rows === Set(
        (1L, "a1", d1, Some(d2)), (1L, "a2", d2, None),
        (2L, "b", d1, None), (3L, "c", d2, None)))

      // at-least-once replay: re-running batch 1 reads v0 again and
      // rewrites an IDENTICAL v1 (no double-close, no extra versions)
      sink(Seq((1L, "a2", 1L), (3L, "c", 1L)).toDF("k", "attr", "seq"), 1L)
      val v1again = state(1L).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDate(2),
          Option(r.getDate(3)))).toSet
      assert(v1again === v1rows)
    } finally q.stop()
  }

  test("ivmForeachBatch: CDC stream maintains the aggregate; " +
      "result equals full recompute; replay rewrites the same version") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "k STRING, n LONG, sum_v DECIMAL(38,2)"))
    val state = scala.collection.mutable.Map[Long, DataFrame]()
    val sink = EventStreams.ivmForeachBatch(
      id => state.getOrElse(id - 1, empty),
      (df, id) => state(id) = df.localCheckpoint(),
      Seq("k"), "mult", Seq("v"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Int)]
    val q = mem.toDF().toDF("k", "v", "mult")
      .writeStream.foreachBatch(sink).start()
    def view(id: Long) = state(id).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSet
    try {
      // batch 0: inserts only
      mem.addData(("a", 1.0, 1), ("a", 2.0, 1), ("b", 5.0, 1))
      q.processAllAvailable()
      assert(view(0L) === Set(("a", 2L, 3.0), ("b", 1L, 5.0)))

      // batch 1: update a (delete 2.0, insert 2.5), delete b entirely,
      // new key c
      mem.addData(("a", 2.0, -1), ("a", 2.5, 1), ("b", 5.0, -1),
        ("c", 7.0, 1))
      q.processAllAvailable()
      val v1 = view(1L)
      assert(v1 === Set(("a", 2L, 3.5), ("c", 1L, 7.0)))
      // equals the from-scratch aggregate of the surviving multiset
      val recomputed = graft.engine.Ivm.fullAgg(
        Seq(("a", 1.0), ("a", 2.5), ("c", 7.0)).toDF("k", "v"),
        Seq("k"), Seq("v")).collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).doubleValue())).toSet
      assert(v1 === recomputed)

      // at-least-once replay of batch 1: reads v0 again, rewrites an
      // IDENTICAL v1 — the delta is not applied twice
      sink(Seq(("a", 2.0, -1), ("a", 2.5, 1), ("b", 5.0, -1),
        ("c", 7.0, 1)).toDF("k", "v", "mult"), 1L)
      assert(view(1L) === v1)
    } finally q.stop()
  }

  test("cusumForeachBatch: constant per-group state tracks the exact peak " +
      "across batches; silent groups carry; replay rewrites the version") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "g STRING, cum DECIMAL(28,2), runmin DECIMAL(28,2), " +
          "peak DECIMAL(28,2), peak_at BIGINT, n BIGINT"))
    val state = scala.collection.mutable.Map[Long, DataFrame]()
    val sink = EventStreams.cusumForeachBatch(
      id => state.getOrElse(id - 1, empty),
      (df, id) => state(id) = df.localCheckpoint(),
      "g", "pos", "id", "v", mu0 = lit(10.0))
    def snap(id: Long) = state(id).collect()
      .map(r => (r.getString(0), r.getDecimal(0 + 1).doubleValue(),
        r.getDecimal(2).doubleValue(), r.getDecimal(3).doubleValue(),
        r.getLong(4), r.getLong(5))).toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long, Double)]
    val q = mem.toDF().toDF("g", "pos", "id", "v")
      .writeStream.foreachBatch(sink).start()
    try {
      // a: y = +2, −2 → cum 2,0; runmin (incl. the cum_0 = 0 baseline)
      // 0,0; C 2,0 → peak 2 at pos 1
      // b: single +10 above target → cum 10, runmin 0, C 10 → peak 10
      // (the whole point of the baseline: above-target-from-the-start
      // drift is VISIBLE — the review-found bug reported 0 here)
      mem.addData(("a", 1L, 1L, 12.0), ("a", 2L, 2L, 8.0),
        ("b", 1L, 1L, 20.0))
      q.processAllAvailable()
      assert(snap(0L) === Set(("a", 0.0, 0.0, 2.0, 1L, 2L),
        ("b", 10.0, 0.0, 10.0, 1L, 1L)))

      // batch 1: a gets +5 → cum 5, runmin min(0,5)=0, C 5 → new peak 5
      // at pos 3; b is silent and must carry
      mem.addData(("a", 3L, 3L, 15.0))
      q.processAllAvailable()
      val v1 = snap(1L)
      assert(v1 === Set(("a", 5.0, 0.0, 5.0, 3L, 3L),
        ("b", 10.0, 0.0, 10.0, 1L, 1L)))

      // batch 2: a falls back (−5): cum 0, C 0 → peak STAYS 5 at pos 3
      mem.addData(("a", 4L, 4L, 5.0))
      q.processAllAvailable()
      assert(snap(2L) === Set(("a", 0.0, 0.0, 5.0, 3L, 4L),
        ("b", 10.0, 0.0, 10.0, 1L, 1L)))

      // at-least-once replay of batch 1 reads v0 and rewrites v1 exactly
      sink(Seq(("a", 3L, 3L, 15.0)).toDF("g", "pos", "id", "v"), 1L)
      assert(snap(1L) === v1)
    } finally q.stop()
  }

  test("foreachBatch drift monitor: in-distribution batch ≈ 0 PSI, " +
      "shifted batch alerts; replay rewrites identical rows") {
    implicit val sqlCtx = spark.sqlContext
    // reference: uniform over [0, 100) in 4 quartile bins
    val edges = Seq(25.0, 50.0, 75.0)
    val refProps = Seq(0.25, 0.25, 0.25, 0.25)
    val sink = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double)] // (batch_id, bin, contrib)
    val fn = EventStreams.driftForeachBatch("value", edges, refProps,
      rep => sink ++= rep.select("batch_id", "bin", "contrib")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
    val mem = MemoryStream[Event]
    val q = mem.toDF().writeStream.foreachBatch(fn)
      .outputMode(OutputMode.Append).start()
    try {
      // batch 0: one value per quartile — matches the reference exactly
      mem.addData(Event(1, ts(1), 1, "a", 10.0),
        Event(2, ts(2), 1, "a", 30.0), Event(3, ts(3), 1, "a", 60.0),
        Event(4, ts(4), 1, "a", 90.0))
      q.processAllAvailable()
      val b0 = sink.filter(_._1 == 0L)
      assert(b0.map(_._3).sum === 0.0)

      // batch 1: everything lands in the top quartile → large PSI
      mem.addData(Event(5, ts(5), 1, "a", 80.0),
        Event(6, ts(6), 1, "a", 85.0), Event(7, ts(7), 1, "a", 95.0))
      q.processAllAvailable()
      val b1 = sink.filter(_._1 == 1L)
      assert(b1.map(_._3).sum > 0.25, b1) // "major shift" threshold
      // ALL reference bins report — the three the batch never hit carry
      // the (p−eps)·ln(p/eps) collapse penalty (≈ 1.95 each), which is
      // most of the drift signal in a severe shift
      assert(b1.length === 4, b1)
      assert(b1.filter(_._2 < 3L).forall(_._3 > 1.0), b1)
    } finally q.stop()

    // at-least-once replay: the same batch produces identical rows
    val before = sink.filter(_._1 == 1L).toSet
    import spark.implicits._
    fn(Seq(80.0, 85.0, 95.0).toDF("value"), 1L)
    val after = sink.filter(_._1 == 1L).toSet
    assert(after === before)
  }

  test("foreachBatch conformal coverage monitor: calibrated batch quiet, " +
      "shifted batch and unmodelled group alarm; replay identical") {
    implicit val sqlCtx = spark.sqlContext
    // fixed intervals from a (notional) calibration fit: group a covers
    // [20, 80] (pred 50, qhat 30); minCoverage 0.8
    val intervals = Seq(("a", 50.0, 30.0))
    val sink = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Option[Double], Boolean)]
    val fn = EventStreams.conformalMonitorForeachBatch("event_type",
      "value", intervals, minCoverage = 0.8,
      rep => sink ++= rep
        .select("batch_id", "event_type", "n", "n_covered", "coverage",
          "alarm")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5))))
    val mem = MemoryStream[Event]
    val q = mem.toDF().writeStream.foreachBatch(fn)
      .outputMode(OutputMode.Append).start()
    try {
      // batch 0: all of a's values inside [20, 80] → coverage 1, quiet
      mem.addData(Event(1, ts(1), 1, "a", 30.0),
        Event(2, ts(2), 1, "a", 60.0), Event(3, ts(3), 1, "a", 70.0))
      q.processAllAvailable()
      assert(sink.filter(_._1 == 0L).toSet ===
        Set((0L, "a", 3L, 3L, Some(1.0), false)))

      // batch 1: a shifts out of the interval (1/4 covered) AND an
      // unmodelled group b appears — both must alarm
      mem.addData(Event(4, ts(4), 1, "a", 90.0),
        Event(5, ts(5), 1, "a", 95.0), Event(6, ts(6), 1, "a", 10.0),
        Event(7, ts(7), 1, "a", 30.0), Event(8, ts(8), 1, "b", 50.0))
      q.processAllAvailable()
      val b1 = sink.filter(_._1 == 1L).toSet
      assert(b1 === Set((1L, "a", 4L, 1L, Some(0.25), true),
        (1L, "b", 1L, 0L, None, true)))

      // at-least-once replay: same batch content → identical rows
      import spark.implicits._
      fn(Seq(("a", 90.0), ("a", 95.0), ("a", 10.0), ("a", 30.0),
        ("b", 50.0)).toDF("event_type", "value"), 1L)
      assert(sink.filter(_._1 == 1L).toSet === b1)
    } finally q.stop()
  }

  test("conformal monitor crash drill: a crash between partial append " +
      "and checkpoint commit cannot lose or contradict an alarm") {
    // The monitor is stateless; its one external write is `append`.
    // Crash windows: (a) before append — no rows; (b) mid-append — a
    // TORN prefix of the verdict rows; (c) after append, before the
    // checkpoint commit — all rows, batch replays anyway. In every
    // case the replay must leave readers keyed on (batch_id, group)
    // with exactly the correct verdict.
    import spark.implicits._
    val intervals = Seq(("a", 50.0, 30.0))
    val log = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Option[Double], Boolean)]
    def rows(rep: org.apache.spark.sql.DataFrame) = rep
      .select("batch_id", "event_type", "n", "n_covered", "coverage",
        "alarm")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getBoolean(5)))
    val fn = EventStreams.conformalMonitorForeachBatch("event_type",
      "value", intervals, minCoverage = 0.8, rep => log ++= rows(rep))
    val batch = Seq(("a", 90.0), ("a", 95.0), ("a", 10.0), ("a", 30.0),
      ("b", 50.0)).toDF("event_type", "value")
    val want = Set(
      (7L, "a", 4L, 1L, Some(0.25), true),   // shifted → alarm
      (7L, "b", 1L, 0L, None, true))         // unmodelled → alarm

    // (a) crash BEFORE append: nothing written; the replay delivers
    // the full verdict — the alarm is not lost
    fn(batch, 7L)
    assert(log.toSet === want)

    // (b) crash MID-append: simulate a torn write — only group "a"'s
    // row landed before the crash; replay appends the full verdict
    log.clear()
    log += ((7L, "a", 4L, 1L, Some(0.25), true)) // the torn prefix
    fn(batch, 7L)
    // the torn row's replay twin is bit-identical (duplicate, not a
    // contradiction) and a keyed reader sees exactly `want`
    assert(log.count(_ == ((7L, "a", 4L, 1L, Some(0.25), true))) === 2)
    assert(log.groupBy(r => (r._1, r._2)).values
      .forall(_.distinct.length == 1), log)
    assert(log.toSet === want)

    // (c) crash AFTER append: the whole verdict duplicates; keyed
    // readers still collapse to the single correct row set
    fn(batch, 7L)
    assert(log.toSet === want)
    assert(log.groupBy(r => (r._1, r._2)).values
      .forall(_.distinct.length == 1), log)
  }
}
