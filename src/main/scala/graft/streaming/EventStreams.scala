package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming operators over the `events` stream shape
 * (SURVEY.md §2.9 — absent in the reference, required by the north star):
 * watermarked tumbling/sliding windows, built-in session windows, and a
 * custom stateful sessionizer on `flatMapGroupsWithState` for semantics
 * the built-in can't express (per-session event cap + emitted aggregates).
 *
 * All transforms are DataFrame→DataFrame so they run identically on a
 * batch frame or a `readStream` source; watermarks bound state at scale
 * (without one, 100 TB of late data pins every window in memory forever).
 */
object EventStreams {

  /** Tumbling hourly counts/sums per event type, 2h watermark. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Sliding window (1h window / 15m slide) per user. */
  def slidingUserActivity(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("user_id"), col("n"))

  /** Built-in session window with a 30-minute gap. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("s.start").as("session_start"), col("s.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Stream-stream join: each click pairs with the same user's purchases
    * from the preceding hour. Both sides carry watermarks and the join
    * condition bounds the time range, so each side's state store retains
    * only the watermark+range window — unbounded-state stream joins never
    * ship at 100 TB/day. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      range: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr(s"INTERVAL $range") &&
        col("purchase_ts") <= col("click_ts"))
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("purchase_value"))
  }

  /**
   * LEFT-OUTER stream-stream join: like `clickPurchaseJoin`, but clicks
   * with no in-range purchase are still emitted, null-extended — the
   * "abandoned funnel" stream. Outer stream-stream joins require exactly
   * what this plan has (watermarks on BOTH sides + a time-range join
   * condition): Spark can only emit the null side once the watermark
   * proves no matching purchase can still arrive, at which point the
   * click's state-store entry is evicted — so the unmatched rows appear
   * one watermark delay late, and state stays bounded. Without the range
   * condition the join would be rejected (unbounded state).
   */
  def clickPurchaseLeftJoin(clicks: DataFrame, purchases: DataFrame,
      range: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr(s"INTERVAL $range") &&
        col("purchase_ts") <= col("click_ts"),
      "leftOuter")
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_value"))
  }

  /** Streaming exact dedup: drop events whose content key was already seen
    * within the watermark horizon — the streaming twin of
    * `Dedup.dropExactDuplicates`. `dropDuplicatesWithinWatermark` bounds
    * the dedup state store by event time (a plain dropDuplicates would pin
    * every key forever — unusable on an unbounded 100 TB/day stream). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment join: each micro-batch joins the stream
    * against a STATIC dimension frame (re-read per batch if the source
    * supports it). Stateless — no watermark, no state store — and the
    * static side broadcasts under the usual threshold, so the 100 TB/day
    * stream pays a map-side hash join per batch, never a shuffle. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Streaming exact-incremental dedup: drop stream rows whose key
    * already exists in a STATIC reference set (the daily-ingest shape —
    * the reference is a precomputed digest table, the stream never scans
    * reference content). Spelled as stream-static left join + null
    * filter (supported in append mode); stateless, unlike
    * dropDuplicatesWithinWatermark which handles WITHIN-stream dups —
    * compose both for full incremental dedup. */
  def dropSeenKeys(stream: DataFrame, seen: DataFrame, keyCol: String): DataFrame = {
    val marked = seen.select(col(keyCol)).distinct()
      .withColumn("__seen", lit(1))
    stream.join(broadcast(marked), Seq(keyCol), "left")
      .filter(col("__seen").isNull)
      .drop("__seen")
  }

  /** Streaming contamination flags: the streaming twin of
    * TextAnalysis.winnowOverlap — each arriving document explodes to its
    * winnowing fingerprints and inner-joins a STATIC eval-set fingerprint
    * table; output is the (doc, fingerprint) hit stream. Deliberately
    * emits HITS rather than per-doc totals: the per-doc aggregation would
    * force stateful append-mode windows, while the hit stream is
    * stateless and exactly-once — downstream either alerts on first hit
    * or aggregates in its own store. */
  def contaminationFlags(docs: DataFrame, evalFps: DataFrame,
      idCol: String, textCol: String,
      k: Int = 5, window: Int = 4): DataFrame = {
    import graft.functions.HashFunctions.winnow_fingerprint
    docs.select(col(idCol), col(textCol))
      .withColumn("h", explode(winnow_fingerprint(col(textCol), k, window)))
      .join(broadcast(evalFps.select(col("h")).distinct()), Seq("h"))
      .select(col(idCol), col("h"))
  }

  /**
   * The 100-TB state-store default, as a conf map callers thread into
   * `startExactlyOnceParquetSink` / the drain harnesses: RocksDB keeps
   * state off-heap and on local disk with incremental checkpoint
   * uploads, where the HDFS-backed default holds every store's full map
   * in executor memory and re-uploads snapshots — the BASELINE.md r11
   * A/B measured the default ahead only at toy state (bounded drain
   * slices) and RocksDB ahead as state grows; at real key cardinality
   * (millions of sessions/users per partition) RocksDB is the only
   * provider that holds. Ambient sessions stay on the built-in default;
   * this map OPTS a query in, pinned at query start (Structured
   * Streaming clones the session when a query starts, so the setting is
   * per-query, not a session-wide mutation).
   */
  val RocksDbStateStore: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /**
   * Exactly-once streaming table sink for non-transactional stores:
   * `foreachBatch` writing each micro-batch into a DETERMINISTIC
   * batch-id directory with overwrite semantics. After a crash between
   * data write and checkpoint commit, Structured Streaming REPLAYS the
   * micro-batch with the same batchId — the replay overwrites its own
   * directory instead of appending a duplicate, which is the standard
   * idempotence recipe (batch output committed by rename, offsets by the
   * checkpoint; both replay-safe). Readers see the table as one
   * partitioned parquet dataset under `baseDir`.
   *
   * `confs` (e.g. [[RocksDbStateStore]]) apply for THIS query only: they
   * are set before `start()` — which clones the session, freezing them
   * into the query — and restored before returning.
   */
  def startExactlyOnceParquetSink(df: DataFrame, baseDir: String,
      checkpoint: String, confs: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val s = df.sparkSession
    // The set-start-restore window mutates SESSION-WIDE conf; two
    // concurrent query starts on one session could interleave and leak
    // the state-store provider into an unrelated query (ADVICE r13).
    // Serialized under the same lock SparkEntry uses for its identical
    // pattern — start() returns promptly (the clone freezes the confs
    // into the query), so the hold window is short.
    graft.SparkEntry.sessionConfLock.synchronized {
      val prev = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        df.writeStream
          .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            writeBatchIdempotent(batch.toDF(), baseDir, batchId)
          }
          .option("checkpointLocation", checkpoint)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
  }

  /** The idempotent per-batch write — exposed so specs (and manual
    * backfills) can exercise replay semantics directly. */
  def writeBatchIdempotent(batch: DataFrame, baseDir: String, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$baseDir/batch_id=$batchId")

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      n_events: Int, total_value: Double, closed_by: String)

  /** First-touch MICROS per funnel step; -1 = unseen. µs, not ms: the
    * batch funnel (and its oracle) compare `epoch_us` values, so a
    * same-millisecond view/click pair must order identically here —
    * `Timestamp.getTime` truncation to ms would merge them into a tie. */
  final case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)

  /** µs since epoch from a Timestamp (getTime carries whole ms; the
    * sub-ms remainder lives in getNanos). */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  final case class FunnelOut(user_id: Long, prev_stage: Int, stage: Int,
      kind: String)

  /** Same stage rule as the batch `events_funnel` query: how deep the
    * user got with steps in first-touch order. */
  def funnelStageOf(s: FunnelState): Int =
    if (s.tView < 0) 0
    else if (s.tClick < 0 || s.tClick <= s.tView) 1
    else if (s.tPurchase < 0 || s.tPurchase <= s.tClick) 2
    else 3

  /**
   * Custom stateful sessionizer: emits a SessionOut when a session closes
   * by gap timeout or by hitting `maxEvents` (the per-session cap the
   * built-in session_window cannot express). State per user is O(1).
   */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      maxEvents: Int = 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // timeout invocations come with NO rows and must be handled
          // FIRST: the previous shape re-armed the (already-expired)
          // timer before checking hasTimedOut, which (a) made the
          // timeout-emit branch unreachable and (b) threw once the
          // watermark had jumped past last+gap ("timeout timestamp
          // cannot be earlier than the watermark") — surfaced by the
          // transformWithState parity spec, which drives all three
          // close paths in one drain
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.start), s.n, s.total, "timeout"))
          } else {
            val out = Seq.newBuilder[SessionOut]
            var st = state.getOption.orNull
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              if (st == null) st = SessionState(t, t, 1, e.value)
              else if (t - st.last > gapMs) {
                out += SessionOut(userId, new Timestamp(st.start), st.n, st.total, "gap")
                st = SessionState(t, t, 1, e.value)
              } else {
                st = SessionState(st.start, t, st.n + 1, st.total + e.value)
                if (st.n >= maxEvents) {
                  out += SessionOut(userId, new Timestamp(st.start), st.n, st.total, "cap")
                  st = null
                }
              }
            }
            if (st != null) {
              state.update(st)
              // the event-time timeout may not precede the watermark; a
              // session already idle past the gap when its batch lands
              // times out at the next watermark tick instead
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, st.last + gapMs))
            } else state.remove()
            out.result().iterator
          }
      }
  }

  /** µs-resolution session state/output for the transformWithState
    * sessionizer: everything integer so the drain output replays against
    * the batch gaps-and-islands SQL with no timestamp reconstruction. */
  final case class SessionStateUs(startUs: Long, lastUs: Long, n: Int, total: Double)
  final case class SessionOutUs(user_id: Long, start_us: Long, n_events: Int,
      total_value: Double, closed_by: String)

  /**
   * The same sessionizer on Spark 4's `transformWithState` — the
   * arbitrary-state API that supersedes flatMapGroupsWithState (typed
   * ValueState/ListState/MapState handles, explicit timers, initial
   * state, state TTL; and it REQUIRES the RocksDB state-store provider,
   * which is this engine's documented 100-TB default anyway —
   * [[RocksDbStateStore]]). Session semantics are `sessionize`'s with
   * µs-exact gap arithmetic: break strictly-greater than the gap,
   * per-session event cap, event-time timers closing idle sessions.
   * Timers are registered per batch and staleness-checked at expiry
   * (a later event extends the session past an earlier timer; the stale
   * timer must not close it).
   */
  /** The sessionizer's pure fold, shared by the TWS processors and the
    * batch bootstrap: (open state or null, events in (µs, id) order) →
    * (new open state or null, sessions closed along the way). */
  private[streaming] def sessionFold(userId: Long, s0: SessionStateUs,
      events: Seq[Event], gapUs: Long, maxEvents: Int)
      : (SessionStateUs, Seq[SessionOutUs]) = {
    val out = Seq.newBuilder[SessionOutUs]
    var s = s0
    events.foreach { e =>
      val t = micros(e.ts)
      if (s == null) s = SessionStateUs(t, t, 1, e.value)
      else if (t - s.lastUs > gapUs) {
        out += SessionOutUs(userId, s.startUs, s.n, s.total, "gap")
        s = SessionStateUs(t, t, 1, e.value)
      } else {
        s = SessionStateUs(s.startUs, t, s.n + 1, s.total + e.value)
        if (s.n >= maxEvents) {
          out += SessionOutUs(userId, s.startUs, s.n, s.total, "cap")
          s = null
        }
      }
    }
    (s, out.result())
  }

  class SessionProcessor(gapMs: Long, maxEvents: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, SessionOutUs] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues}
    @transient protected var st: org.apache.spark.sql.streaming.ValueState[SessionStateUs] = _
    protected def gapUs: Long = gapMs * 1000L
    protected def timerFor(s: SessionStateUs): Long = s.lastUs / 1000L + gapMs + 1

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionStateUs]("session",
        org.apache.spark.sql.Encoders.product[SessionStateUs], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[SessionOutUs] = {
      val s0 = if (st.exists()) st.get() else null
      val (s, out) = sessionFold(userId, s0,
        rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)), gapUs, maxEvents)
      // retire the superseded timer: without this every batch a key
      // appears in leaves one more dormant timer in the store — bounded
      // in a drain, unbounded on a long-lived stream. The stale-check in
      // handleExpiredTimer stays as the belt to this suspender.
      if (s0 != null && (s == null || timerFor(s) != timerFor(s0)))
        getHandle.deleteTimer(timerFor(s0))
      if (s != null) {
        st.update(s)
        if (s0 == null || timerFor(s) != timerFor(s0))
          getHandle.registerTimer(timerFor(s))
      } else st.clear()
      out.iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOutUs] = {
      if (!st.exists()) Iterator.empty
      else {
        val s = st.get()
        // stale-timer guard: only the timer matching the CURRENT session
        // tail closes it
        if (info.getExpiryTimeInMs >= timerFor(s)) {
          st.clear()
          Iterator(SessionOutUs(userId, s.startUs, s.n, s.total, "timeout"))
        } else Iterator.empty
      }
    }
  }

  /**
   * Warm-start variant (`StatefulProcessorWithInitialState`): streaming
   * state BOOTSTRAPPED from a batch snapshot — the production shape when
   * a sessionizing stream starts against a table of history (backfill,
   * migration off another engine, disaster recovery into a fresh
   * checkpoint). Each user's open session from the batch fold seeds the
   * store before the first micro-batch, with its idle timer registered,
   * so a session spanning the batch/stream boundary is ONE session.
   */
  class SessionProcessorWithInit(gapMs: Long, maxEvents: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, Event, SessionOutUs, SessionStateUs] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues}
    @transient private var st: org.apache.spark.sql.streaming.ValueState[SessionStateUs] = _
    private def gapUs: Long = gapMs * 1000L
    private def timerFor(s: SessionStateUs): Long = s.lastUs / 1000L + gapMs + 1

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionStateUs]("session",
        org.apache.spark.sql.Encoders.product[SessionStateUs], TTLConfig.NONE)

    override def handleInitialState(userId: Long, initial: SessionStateUs,
        tv: TimerValues): Unit = {
      st.update(initial)
      getHandle.registerTimer(timerFor(initial))
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[SessionOutUs] = {
      val s0 = if (st.exists()) st.get() else null
      val (s, out) = sessionFold(userId, s0,
        rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)), gapUs, maxEvents)
      // retire the superseded timer: without this every batch a key
      // appears in leaves one more dormant timer in the store — bounded
      // in a drain, unbounded on a long-lived stream. The stale-check in
      // handleExpiredTimer stays as the belt to this suspender.
      if (s0 != null && (s == null || timerFor(s) != timerFor(s0)))
        getHandle.deleteTimer(timerFor(s0))
      if (s != null) {
        st.update(s)
        if (s0 == null || timerFor(s) != timerFor(s0))
          getHandle.registerTimer(timerFor(s))
      } else st.clear()
      out.iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOutUs] = {
      if (!st.exists()) Iterator.empty
      else {
        val s = st.get()
        if (info.getExpiryTimeInMs >= timerFor(s)) {
          st.clear()
          Iterator(SessionOutUs(userId, s.startUs, s.n, s.total, "timeout"))
        } else Iterator.empty
      }
    }
  }

  /** Batch half of the warm start: fold history per user with the SAME
    * fold the stream runs; returns (sessions already closed inside the
    * history, each user's still-open state to seed the stream with). */
  def bootstrapSessions(history: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L, maxEvents: Int = 1000)
      : (Dataset[SessionOutUs], Dataset[(Long, SessionStateUs)]) = {
    import history.sparkSession.implicits._
    val grouped = history.groupByKey(_.user_id)
    val closed = grouped.flatMapGroups { (uid, it) =>
      sessionFold(uid, null,
        it.toSeq.sortBy(e => (micros(e.ts), e.event_id)),
        gapMs * 1000L, maxEvents)._2.iterator
    }
    val open = grouped.flatMapGroups { (uid, it) =>
      Option(sessionFold(uid, null,
        it.toSeq.sortBy(e => (micros(e.ts), e.event_id)),
        gapMs * 1000L, maxEvents)._1).map(uid -> _).iterator
    }
    (closed, open)
  }

  def sessionizeTwsWarm(events: Dataset[Event],
      initial: Dataset[(Long, SessionStateUs)],
      gapMs: Long = 30 * 60 * 1000L,
      maxEvents: Int = 1000): Dataset[SessionOutUs] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessorWithInit(gapMs, maxEvents),
        TimeMode.EventTime(), OutputMode.Append(),
        initial.groupByKey(_._1).mapValues(_._2))
  }

  def sessionizeTws(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      maxEvents: Int = 1000): Dataset[SessionOutUs] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs, maxEvents),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /**
   * Streaming twin of the batch `events_funnel` query: per-user
   * first-touch funnel stage, emitting a FunnelOut on every stage CHANGE
   * — including regressions, which are real under late data (a late
   * early click can invalidate the click-after-view ordering). State per
   * user is three longs; the event-time timeout emits a "final" row and
   * purges, so the state store is bounded by ACTIVE users, not all users
   * ever seen.
   */
  def funnelStream(events: Dataset[Event],
      horizonMs: Long = 2 * 3600 * 1000L): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(FunnelOut(uid, funnelStageOf(st), funnelStageOf(st), "final"))
          } else {
            var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            val out = Seq.newBuilder[FunnelOut]
            var lastMs = 0L
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val before = funnelStageOf(st)
              val t = micros(e.ts) // state compares at µs; timeouts at ms
              st = e.event_type match {
                case "view" if st.tView < 0 || t < st.tView => st.copy(tView = t)
                case "click" if st.tClick < 0 || t < st.tClick => st.copy(tClick = t)
                case "purchase" if st.tPurchase < 0 || t < st.tPurchase =>
                  st.copy(tPurchase = t)
                case _ => st
              }
              val after = funnelStageOf(st)
              if (after != before)
                out += FunnelOut(uid, before, after,
                  if (after > before) "advance" else "regress")
              lastMs = math.max(lastMs, e.ts.getTime)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, lastMs) + horizonMs)
            out.result().iterator
          }
      }
  }
}
