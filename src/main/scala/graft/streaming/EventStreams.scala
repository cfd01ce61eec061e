package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` shape.
  *
  * The reference has no streaming at all (SURVEY.md §2: "Streaming: none"),
  * but a training-data engine needs incremental ingest; these are the
  * streaming duals of the batch event queries: the same transformations
  * compiled against `readStream` instead of `read`, which is exactly how
  * Spark unifies the two (identical logical plans, incremental execution).
  *
  * Scale notes: watermarks bound state; the windowed aggregation keeps one
  * row of state per (window × event_type); sessionization keeps one state
  * object per active user and evicts via event-time timeout — both are the
  * canonical bounded-state shapes for indefinitely-running streams.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Internal per-user session accumulator (public: the state encoder's
    * generated code needs reflective access to the constructor). */
  final case class SessionState(startMs: Long, lastMs: Long,
      n: Long, total: Double)

  /** Tumbling (or, with `slide` < `windowLen`, sliding) window counts/sums
    * per event type. Works identically on a batch or streaming frame (same
    * logical plan); sliding windows multiply state by windowLen/slide open
    * windows per key, still watermark-bounded. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      slide: Option[String] = None): DataFrame = {
    val src = if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay) else events
    src.groupBy(window(col("ts"), windowLen, slide.getOrElse(windowLen)),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension (broadcast — the stream side never shuffles, no streaming
    * state, no watermark). The static side is re-resolved per micro-batch,
    * so slowly-changing dimension reloads (new parquet snapshot under the
    * same path) flow into later batches — the standard SCD-light pattern. */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Streaming exact-dedup: drop events whose key was already seen within
    * the watermark horizon (`dropDuplicatesWithinWatermark`) — the
    * streaming dual of `Dedup.exactGroups`, with state bounded by the
    * watermark instead of growing forever. */
  def dedupedStream(events: DataFrame, keys: Seq[String],
      watermarkDelay: String = "10 minutes",
      tsCol: String = "ts"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join: each left event joined to right events
    * of the same key whose timestamp falls in
    * `[left.ts − lookback, left.ts]` — the streaming dual of the batch
    * temporal joins in `engine.TimeJoins` (bounded lookback instead of
    * unbounded as-of, because unbounded right-side state cannot be evicted
    * on a stream).
    *
    * Scale: watermarks on BOTH sides plus the time-range predicate are
    * what let Spark evict buffered rows once `watermark − lookback` passes
    * them — state is bounded by rate × (delay + lookback) per side. Both
    * inputs shuffle once on the join key; works identically on batch
    * frames (the watermark is a no-op there). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts",
      lookback: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark(tsCol, watermarkDelay)
      else left).alias("l")
    val r = (if (right.isStreaming) right.withWatermark(tsCol, watermarkDelay)
      else right).alias("r")
    l.join(r, expr(
      s"""l.`$keyCol` = r.`$keyCol` AND
         |r.`$tsCol` BETWEEN l.`$tsCol` - INTERVAL $lookback AND l.`$tsCol`
         |""".stripMargin))
  }

  /** Idempotent streaming load: `foreachBatch` + the engine's anti-join
    * dedup — each micro-batch appends only rows whose keys the target has
    * not seen (the reference loader's read→anti-join→append shape,
    * `load.py:123-165`, applied per batch). Combined with
    * `dropDuplicatesWithinWatermark` upstream this gives effectively-once
    * delivery to sinks without transactional append (plain parquet dirs,
    * JDBC). `readExisting`/`append` abstract the target so the same logic
    * drives files or JDBC. */
  def idempotentForeachBatch(
      readExisting: () => DataFrame,
      append: DataFrame => Unit,
      keys: Seq[String]): (DataFrame, Long) => Unit = { (batch, _) =>
    val fresh = graft.engine.LoadDedup
      .antiJoinOnKeys(batch, readExisting(), keys)
      // a batch can also collide with itself (retried offsets)
      .dropDuplicates(keys)
    append(fresh)
  }

  /** Streaming data-quality monitoring: run the declarative check suite
    * ([[graft.engine.Quality]]) over every micro-batch and append the
    * verdict rows — stamped with the batch id — to a metrics sink. The
    * streaming dual of `q_dq_report`: a pipeline gates ingest on the
    * report (alert/stop on failed verdicts) instead of discovering bad
    * batches downstream. One aggregation pass per batch, whatever the
    * suite width; replaying a batch id rewrites the same verdicts
    * (idempotent metrics under at-least-once foreachBatch). */
  def qualityForeachBatch(
      checks: Seq[graft.engine.Quality.Check],
      append: DataFrame => Unit): (DataFrame, Long) => Unit = { (batch, id) =>
    append(graft.engine.Quality.verify(batch, checks)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(id)))
  }

  /** Streaming corpus ingest with near-dup rejection: each micro-batch is
    * deduped against the persisted corpus STATE — its kept documents and
    * their MinHash band table — via the incremental LSH path
    * ([[graft.llm.Dedup.minhashNearDupsIncremental]]: only the batch is
    * hashed, the corpus read is candidate-pruned), then survivors are
    * appended and the band table extended with THEIR bands only. The
    * continuous-ingest shape of a production training-data pipeline:
    * per-batch cost ∝ batch size + its collisions, never corpus size.
    *
    * Rejection policy (deterministic, single-pass): a batch document is
    * rejected iff it near-dups any corpus document or any SMALLER-ID
    * document of the same batch. Chains may over-reject (b rejected for
    * corpus, c rejected for b) — the conservative trade production
    * ingest makes for a one-pass decision; run a periodic compaction
    * with [[graft.llm.Dedup.dupClusters]] if chain precision matters.
    *
    * State I/O is abstracted (`readCorpus`/`readBands`/`appendDocs`/
    * `appendBands`) so parquet zones, JDBC, or a table format all fit. */
  def nearDupIngestForeachBatch(
      readCorpus: () => DataFrame,
      readBands: () => DataFrame,
      appendDocs: DataFrame => Unit,
      appendBands: DataFrame => Unit,
      idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int,
      threshold: Double): (DataFrame, Long) => Unit = { (batch0, _) =>
    import graft.llm.Dedup
    val corpus = readCorpus()
    // replay guard: foreachBatch is at-least-once — a retried batch's docs
    // may ALREADY be in the corpus under the same ids, and same-id pairs
    // are invisible to the near-dup join (id1 < id2), so without this
    // anti-join a replay would append them a second time and corrupt the
    // dedup state. Same reasoning as idempotentForeachBatch.
    val batch = batch0.dropDuplicates(idCol)
      .join(corpus.select(col(idCol)), Seq(idCol), "left_anti")
    val pairs = Dedup.minhashNearDupsIncremental(batch, corpus, readBands(),
      idCol, textCol, n, bands, rowsPerBand, threshold)
      .select("id1", "id2")
    val corpusIds = corpus.select(col(idCol).as("__cid"))
    // id1 < id2 always; either side may be the corpus one
    val rejects = pairs
      .join(corpusIds, col("id1") === col("__cid"), "left_semi")
      .select(col("id2").as(idCol))
      .unionByName(pairs
        .join(corpusIds, col("id2") === col("__cid"), "left_semi")
        .select(col("id1").as(idCol)))
      .unionByName(pairs // batch-internal pair: larger id loses
        .join(corpusIds, col("id1") === col("__cid"), "left_anti")
        .join(corpusIds, col("id2") === col("__cid"), "left_anti")
        .select(col("id2").as(idCol)))
      .distinct()
    val accepted = batch.join(rejects, Seq(idCol), "left_anti")
      // one materialization: accepted feeds the doc append AND the band
      // derivation; without it the whole dedup plan runs twice
      .localCheckpoint()
    appendDocs(accepted)
    appendBands(graft.llm.Dedup.bandTable(accepted, idCol, textCol,
      n, bands, rowsPerBand))
  }

  /** Per-host admission cap at INGEST time — the streaming dual of
    * `q_url_host_cap` (the RefinedWeb host-dominance guard run where it
    * belongs in production: while the corpus is being built, not as an
    * after-the-fact filter). Each micro-batch admits a host's documents
    * only while the host's persisted admitted-count stays under `cap`;
    * within a batch the winners are the md5-smallest ids (the
    * [[graft.llm.Sampling.samplePerGroup]] order, so admission is
    * deterministic under replay and any partitioning).
    *
    * State: the admitted-docs table, stamped with the admitting BATCH id
    * (`appendDocs(accepted, batchId)` — append to a per-batch partition
    * so the stamp is free and `readBatchAdmitted` is a ∝-batch read),
    * plus a VERSIONED (host, n_admitted) counts table: batch N reads
    * version N−1 (`readHostCounts(N)`) and writes version N — the
    * [[scd2ForeachBatch]]/[[ivmForeachBatch]] versioned-state replay
    * contract. Both per-batch joins broadcast (host-cardinality);
    * per-batch cost ∝ batch + hosts, never ∝ corpus.
    *
    * Crash-window guarantee (the two state writes are not atomic, so
    * replay must repair, not re-increment): version N is RECOMPUTED as
    * v(N−1) + every row the docs store holds stamped N + every row
    * freshly accepted this attempt — never read-modify-write of the
    * latest counts. A crash before `appendDocs` leaves no state (clean
    * replay); a crash BETWEEN the writes leaves docs stamped N whose
    * count delta the replay rebuilds from `readBatchAdmitted(N)` (and
    * whose ids the admitted-set anti-join keeps out of double
    * admission); a crash after `writeHostCounts` makes the replay
    * rewrite the identical vN from the identical inputs. The replayed
    * rows also charge the admission BUDGET (`cap − v(N−1) − replayed`),
    * so a replay can never over-admit a host past `cap` — under any
    * crash/replay pattern the per-host admitted count stays ≤ cap and
    * no id is admitted twice; the only at-least-once surface left is
    * `appendDocs` itself (make it per-batch idempotent — overwrite the
    * `batch=<id>` partition — for exactly-once end to end). */
  def hostCapIngestForeachBatch(
      readAdmittedIds: () => DataFrame,
      readBatchAdmitted: Long => DataFrame,
      readHostCounts: Long => DataFrame,
      appendDocs: (DataFrame, Long) => Unit,
      writeHostCounts: (DataFrame, Long) => Unit,
      idCol: String, hostCol: String, cap: Int,
      seed: String = "sample"): (DataFrame, Long) => Unit = { (batch0, batchId) =>
    require(cap > 0, s"cap=$cap")
    // rows a CRASHED earlier attempt of THIS batch already admitted:
    // in the docs store stamped batchId, but in no counts version yet
    val replayed = readBatchAdmitted(batchId)
      .select(col(idCol), col(hostCol)).localCheckpoint()
    val replayCounts = replayed.groupBy(col(hostCol))
      .agg(count(lit(1)).as("__replayed"))
    // replay guard: at-least-once delivery — already-admitted ids must
    // not be re-admitted (they would double both the docs AND the counts)
    val batch = batch0.dropDuplicates(idCol)
      .join(readAdmittedIds().select(col(idCol)), Seq(idCol), "left_anti")
    val counts = readHostCounts(batchId) // version batchId-1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hostCol))
      .orderBy(graft.llm.Sampling.uniformHex(seed, col(idCol)).asc,
        col(idCol).asc)
    val accepted = batch.withColumn("__rn", row_number().over(w))
      .join(broadcast(counts), Seq(hostCol), "left")
      .join(broadcast(replayCounts), Seq(hostCol), "left")
      // budget charges BOTH the committed count and the crashed-attempt
      // rows — a replay can never push a host past cap
      .withColumn("__n0", coalesce(col("n_admitted"), lit(0L)) +
        coalesce(col("__replayed"), lit(0L)))
      .filter(col("__rn") <= lit(cap.toLong) - col("__n0"))
      .drop("__rn", "n_admitted", "__replayed", "__n0")
      // one materialization: accepted feeds the append AND the count
      // delta; without it the admission plan runs twice
      .localCheckpoint()
    appendDocs(accepted, batchId)
    // version batchId = version (batchId-1) + everything THIS batch
    // admitted (fresh + crashed-attempt rows): pure recomputation, so
    // any crash/replay pattern rewrites the same vN
    val merged = accepted.select(col(hostCol))
      .unionByName(replayed.select(col(hostCol)))
      .groupBy(col(hostCol)).agg(count(lit(1)).as("__add"))
      .join(counts, Seq(hostCol), "full_outer")
      .select(col(hostCol),
        (coalesce(col("__add"), lit(0L)) +
          coalesce(col("n_admitted"), lit(0L))).as("n_admitted"))
    writeHostCounts(merged, batchId)
  }

  /** Deterministic last-change-wins compaction of a CDC micro-batch: one
    * surviving row per key — the one with the greatest `orderCol`, ties
    * broken by the attribute tuple (a struct-max aggregate, so the choice
    * is identical under any partitioning, unlike `dropDuplicates`). */
  def lastWinsByKey(batch: DataFrame, keyCols: Seq[String],
      orderCol: String, attrCols: Seq[String]): DataFrame =
    batch.groupBy(keyCols.map(col): _*)
      .agg(max(struct(col(orderCol) +: attrCols.map(col): _*)).as("__b"))
      .select(keyCols.map(col) ++
        attrCols.map(c => col(s"__b.$c").as(c)): _*)

  /** Streaming CDC → versioned dimension: each micro-batch of attribute
    * changes compacts to last-change-wins per key ([[lastWinsByKey]] —
    * several changes to one key inside a micro-batch are legal CDC) and
    * merges into the SCD2 dimension ([[graft.engine.Scd.scd2Apply]]:
    * changed keys close their current version and open a new one).
    *
    * Replay safety: foreachBatch is at-least-once. `readDim`/`writeDim`
    * abstract the state target; writing VERSIONED state (e.g. a
    * `v<batchId>` dir keyed by the batch id, reading `v<batchId-1>`)
    * makes a replayed batch rewrite the same version from the same
    * predecessor — bit-identical, so retries cannot double-close or
    * double-open versions. `batchTs` maps the batch id to the version
    * timestamp (injectable clock, as in the batch loaders). */
  def scd2ForeachBatch(
      readDim: Long => DataFrame,
      writeDim: (DataFrame, Long) => Unit,
      keyCols: Seq[String], attrCols: Seq[String], orderCol: String,
      batchTs: Long => Column): (DataFrame, Long) => Unit = { (batch, id) =>
    val compacted = lastWinsByKey(batch, keyCols, orderCol, attrCols)
    writeDim(graft.engine.Scd.scd2Apply(readDim(id), compacted,
      keyCols, attrCols, batchTs(id)), id)
  }

  /** Streaming incremental view maintenance: each micro-batch of CDC
    * rows (`multCol` = +1 insert / −1 delete) folds into the maintained
    * keyed aggregate via [[graft.engine.Ivm.applyDelta]] — per batch,
    * one delta aggregation (∝ batch) plus one group-cardinality merge;
    * the 100 TB base is NEVER rescanned. Same versioned-state replay
    * contract as [[scd2ForeachBatch]]: batch N reads v(N−1) and writes
    * vN, so an at-least-once redelivery rewrites the same version from
    * the same predecessor — bit-identical, no double-application. */
  def ivmForeachBatch(
      readView: Long => DataFrame,
      writeView: (DataFrame, Long) => Unit,
      keyCols: Seq[String], multCol: String,
      measureCols: Seq[String]): (DataFrame, Long) => Unit = { (batch, id) =>
    writeView(graft.engine.Ivm.applyDelta(readView(id),
      graft.engine.Ivm.deltaAgg(batch, keyCols, multCol, measureCols),
      keyCols, measureCols), id)
  }

  /** Streaming CUSUM drift monitor against a FIXED reference mean `mu0`
    * (the SPC setup — batch [[graft.engine.Stats.cusumDrift]] centers by
    * the observed global mean, which is not incrementally maintainable;
    * monitoring against a target level is, and is the standard online
    * form of Page 1954). Per group the carried state is four scalars —
    * (cum, runmin, peak, peak_at) plus a row count — so state size is
    * |groups|, never data-proportional:
    *
    *   cum_i    = cum_{i-1} + (x_i − mu0)          (exact DECIMAL)
    *   runmin_i = min(runmin_{i-1}, cum_i)
    *   C_i      = cum_i − runmin_i ; peak = running max C_i (earliest)
    *
    * Each micro-batch: one state join + the same two windows as the
    * batch operator over batch rows only. Versioned-state replay
    * contract as in [[scd2ForeachBatch]]: batch N reads v(N−1), writes
    * vN — at-least-once redelivery rewrites vN bit-identically.
    * State/output schema: groupCol, cum (decimal), runmin (decimal),
    * peak (decimal), peak_at, n. */
  def cusumForeachBatch(
      readState: Long => DataFrame,
      writeState: (DataFrame, Long) => Unit,
      groupCol: String, orderCol: String, tieCol: String, valueCol: String,
      mu0: Column): (DataFrame, Long) => Unit = { (batch, id) =>
    import org.apache.spark.sql.expressions.Window
    val g = col(groupCol)
    val wRun = Window.partitionBy(g).orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = readState(id).select(g, col("cum").as("__c0"),
      col("runmin").as("__m0"), col("peak").as("__p0"),
      col("peak_at").as("__pat0"), col("n").as("__n0"))
    val rows = batch
      .select(g, col(orderCol), col(tieCol),
        (col(valueCol).cast("decimal(18,2)") - mu0.cast("decimal(18,2)"))
          .as("__y"))
      .join(st, Seq(groupCol), "left")
      .withColumn("__cum", coalesce(col("__c0"), lit(0).cast("decimal(18,2)"))
        + sum(col("__y")).over(wRun))
      // the history min seeds with the IMPLICIT cum_0 = 0 baseline (the
      // recursion starts at C_0 = 0) — without it a stream running above
      // target from its first row reports zero drift forever
      .withColumn("__rm",
        least(coalesce(col("__m0"), lit(0).cast("decimal(28,2)")),
          min(col("__cum")).over(wRun)))
      .withColumn("__c", col("__cum") - col("__rm"))
    // batch-local peak (earliest occurrence), then merge with history
    val wPick = Window.partitionBy(g)
      .orderBy(col("__c").desc, col(orderCol), col(tieCol))
    val summary = rows.withColumn("__rn", row_number().over(wPick))
      .withColumn("__last",
        row_number().over(Window.partitionBy(g)
          .orderBy(col(orderCol).desc, col(tieCol).desc)))
      .groupBy(g, col("__p0"), col("__pat0"), col("__n0"))
      .agg(
        max(when(col("__last") === 1, col("__cum"))).as("__cumN"),
        max(when(col("__last") === 1, col("__rm"))).as("__rmN"),
        max(when(col("__rn") === 1, col("__c"))).as("__pc"),
        max(when(col("__rn") === 1, col(orderCol))).as("__pcat"),
        count(lit(1)).as("__bn"))
    // state decimals pinned at (28,2) so every version has one schema
    val updated = summary.select(g,
      col("__cumN").cast("decimal(28,2)").as("cum"),
      col("__rmN").cast("decimal(28,2)").as("runmin"),
      when(col("__p0").isNull || col("__pc") > col("__p0"), col("__pc"))
        .otherwise(col("__p0")).cast("decimal(28,2)").as("peak"),
      when(col("__p0").isNull || col("__pc") > col("__p0"), col("__pcat"))
        .otherwise(col("__pat0")).as("peak_at"),
      (coalesce(col("__n0"), lit(0L)) + col("__bn")).as("n"))
    // groups silent this batch carry state forward unchanged
    val silent = st.join(batch.select(g).distinct(), Seq(groupCol), "left_anti")
      .select(g, col("__c0").cast("decimal(28,2)").as("cum"),
        col("__m0").cast("decimal(28,2)").as("runmin"),
        col("__p0").cast("decimal(28,2)").as("peak"),
        col("__pat0").as("peak_at"), col("__n0").as("n"))
    writeState(updated.unionByName(silent), id)
  }

  /** Batch sessionization: the gaps-and-islands window formulation — a
    * session break is a gap > gapMs from the previous event of the same
    * user; session id = running count of breaks. Relational dual of
    * [[sessionize]] (which holds the same semantics as streaming state);
    * closes every session since a batch has a defined end.
    * Output: user_id, session_start, session_end, n_events, total_value. */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col("ts"))
    val newSession = when(
      lag(us, 1).over(order).isNull ||
        us - lag(us, 1).over(order) > gapMs * 1000L, 1L).otherwise(0L)
    events
      .withColumn("__brk", newSession)
      .withColumn("__sid", sum(col("__brk")).over(running))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("ts")).cast("timestamp_ntz").as("session_start"),
        max(col("ts")).cast("timestamp_ntz").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .drop("__sid")
  }

  /** Event-time sessionization with a gap timeout: custom state via
    * `flatMapGroupsWithState` (the reference-free operator Spark's built-in
    * aggregations can't express). Emits one summary per closed session. */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._

    def flush(userId: Long, st: SessionState): SessionSummary =
      SessionSummary(userId, new Timestamp(st.startMs), new Timestamp(st.lastMs),
        st.n, st.total)

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionSummary] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(flush(userId, _)).iterator
        state.remove()
        return out
      }
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[SessionSummary]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(st) if t - st.lastMs <= gapMs =>
            cur = Some(st.copy(lastMs = math.max(st.lastMs, t),
              n = st.n + 1, total = st.total + e.value))
          case Some(st) =>
            closed ::= flush(userId, st)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur match {
        case Some(st) =>
          state.update(st)
          state.setTimeoutTimestamp(st.lastMs + gapMs)
        case None => ()
      }
      closed.reverseIterator
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class HllWindow(window_start: Timestamp, hll_estimate: Double,
      buckets_used: Long)

  /** Streaming distinct-user estimate per tumbling window: the
    * [[graft.llm.Sketches.hllDistinct]] sketch as FLAT custom state — each
    * open window holds exactly 64 bytes (the per-bucket rho maxima),
    * regardless of how many users stream through. The window flushes once
    * the watermark passes its end (event-time timeout), emitting the
    * identical estimate the batch operator computes on equal input
    * (same md5 derivations, same exact-integer sum, same estimate
    * branches — StreamingSpec asserts equality).
    *
    * This is what a built-in `approx_count_distinct` window cannot give a
    * stream: `dropDuplicates` state grows with distinct keys; this state
    * is CONSTANT per window — the sketch-tier shape for
    * distinct-cardinality monitoring over unbounded streams. */
  def hllDistinctWindows(events: Dataset[Event], windowMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[HllWindow] = {
    import events.sparkSession.implicits._
    import graft.llm.Sketches

    def flush(winStartMs: Long, rmax: Array[Byte]): HllWindow =
      HllWindow(new Timestamp(winStartMs), Sketches.hllScalarEstimate(rmax),
        rmax.count(_ > 0).toLong)

    def update(winStartMs: Long, rows: Iterator[Event],
        state: GroupState[Array[Byte]]): Iterator[HllWindow] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(flush(winStartMs, _)).iterator
        state.remove()
        return out
      }
      val rmax = state.getOption.getOrElse(new Array[Byte](Sketches.HllBuckets))
      rows.foreach { e =>
        val v = e.user_id.toString
        val b = Sketches.hllScalarBucket(v)
        val r = Sketches.hllScalarRho(v).toByte
        if (r > rmax(b)) rmax(b) = r
      }
      state.update(rmax)
      state.setTimeoutTimestamp(winStartMs + windowMs)
      Iterator.empty
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(e => Math.floorDiv(e.ts.getTime, windowMs) * windowMs)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class CmsWindow(window_start: Timestamp, r: Int, cell: Int,
      cnt: Long)

  /** Streaming Count-Min sketch per tumbling window: each open window
    * holds exactly d·w long counters however many events stream through —
    * the mergeable frequency state a monitoring pipeline keeps instead of
    * per-key counts (whose state grows with key cardinality). Counter
    * updates are ORDER-FREE integer increments, so the flushed cells are
    * bit-equal to the batch sketch ([[graft.llm.Sketches.cmsCounts]]'
    * internal aggregation — same md5 cell derivation via
    * [[graft.llm.Sketches.cmsScalarCell]]) on equal input; StreamingSpec
    * asserts cell-for-cell equality. The counted value is `user_id`
    * (stringified, matching the batch cast); empty cells are not emitted,
    * matching the batch groupBy. Downstream, the flushed (r, cell, cnt)
    * rows answer point queries / heavy-hitters exactly like the batch
    * probe side of cmsCounts. */
  def cmsWindows(events: Dataset[Event], windowMs: Long, d: Int = 4,
      w: Int = 128, watermarkDelay: String = "10 minutes"): Dataset[CmsWindow] = {
    import events.sparkSession.implicits._
    import graft.llm.Sketches
    require(d >= 1 && w >= 1 && w <= 256 && 256 % w == 0,
      s"cmsWindows: w must divide 256 (got d=$d, w=$w)")

    def flush(winStartMs: Long, cnts: Array[Long]): Iterator[CmsWindow] =
      cnts.indices.iterator.filter(cnts(_) > 0L).map { i =>
        CmsWindow(new Timestamp(winStartMs), i / w, i % w, cnts(i))
      }

    def update(winStartMs: Long, rows: Iterator[Event],
        state: GroupState[Array[Long]]): Iterator[CmsWindow] = {
      if (state.hasTimedOut) {
        val out = state.getOption.iterator.flatMap(flush(winStartMs, _))
        state.remove()
        return out
      }
      val cnts = state.getOption.getOrElse(new Array[Long](d * w))
      rows.foreach { e =>
        val v = e.user_id.toString
        var r = 0
        while (r < d) {
          cnts(r * w + Sketches.cmsScalarCell(r, v, w)) += 1L
          r += 1
        }
      }
      state.update(cnts)
      state.setTimeoutTimestamp(winStartMs + windowMs)
      Iterator.empty
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(e => Math.floorDiv(e.ts.getTime, windowMs) * windowMs)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming distribution-drift monitoring: per micro-batch PSI of
    * `valueCol` against FIXED reference bins
    * ([[graft.engine.Drift.psiAgainstReference]] — edges and reference
    * proportions computed once from the training/baseline population
    * and closed over, so each batch costs one aggregation over its own
    * rows; no state, no reference re-scan). The streaming dual of
    * `q_psi_drift`: a pipeline alerts when a batch's Σ contrib crosses
    * the 0.1/0.25 thresholds instead of discovering skewed serving
    * data offline. Verdict rows append stamped with the batch id —
    * replaying a batch id rewrites the same rows (idempotent metrics
    * under at-least-once foreachBatch, the qualityForeachBatch
    * contract). */
  def driftForeachBatch(valueCol: String, edges: Seq[Double],
      refProps: Seq[Double], append: DataFrame => Unit)
      : (DataFrame, Long) => Unit = { (batch, id) =>
    append(graft.engine.Drift
      .psiAgainstReference(batch, valueCol, edges, refProps)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(id)))
  }

  /** Per-micro-batch conformal coverage monitor — the uncertainty
    * complement of [[driftForeachBatch]]: each batch's per-group
    * coverage against the FIXED (group, pred, q̂) intervals a
    * calibration fit produced (driver-side literals closed over, like
    * the PSI reference bins). Stateless — one aggregation per batch,
    * no reference re-scan; at-least-once replay recomputes identical
    * monitor rows for the same batch_id (pure function of batch
    * content). An alarm means live coverage fell below `minCoverage`
    * (or an unmodelled group appeared): recalibrate before trusting
    * the intervals.
    *
    * Crash-window guarantee (the [[hostCapIngestForeachBatch]]
    * treatment, degenerate here because the monitor keeps NO state —
    * the one external write is `append`): every verdict row is a pure
    * function of (batch content, batch_id, the closed-over intervals),
    * so a crash at ANY point leaves either nothing (before append —
    * replay emits the full verdict) or a prefix of the rows (a torn
    * multi-partition append — replay rewrites every row BIT-IDENTICALLY
    * beside the torn ones). A coverage alarm can therefore never be
    * lost and never be contradicted by a replay: readers keying on
    * (batch_id, group) — last- or first-wins, either collapses
    * duplicates to the same row — see exactly one verdict per group
    * per batch under any crash/replay pattern. */
  def conformalMonitorForeachBatch(groupCol: String, yCol: String,
      intervals: Seq[(String, Double, Double)], minCoverage: Double,
      append: DataFrame => Unit): (DataFrame, Long) => Unit = {
    (batch, id) =>
      append(graft.engine.Eval
        .coverageAgainstIntervals(batch, groupCol, yCol, intervals,
          minCoverage)
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(id)))
  }
}
