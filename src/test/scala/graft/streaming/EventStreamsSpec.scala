package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.EventStreams.Event

class EventStreamsSpec extends AnyFunSuite with SparkTestBase {

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private def runStream[T](q: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val query = q.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination(60000)
  }

  test("observe under streaming: metrics surface per micro-batch via query progress") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "buy", 5.0))
    // batch-style Observation.get does NOT complete for streaming queries
    // (Spark contract) — streaming reads CollectMetrics results from each
    // micro-batch's progress.observedMetrics instead; same plan node,
    // same zero-extra-scan economics
    val observed = mem.toDF().observe("gate",
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"),
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("event_type") === "click", 1L)
          .otherwise(0L)).as("n_clicks"))
    val query = observed.writeStream.format("memory").queryName("obs_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination(60000)
    val metrics = query.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("gate")))
    assert(metrics.nonEmpty, "no observed metrics in any micro-batch progress")
    assert(metrics.map(_.getAs[Long]("n_rows")).sum == 3L)
    assert(metrics.map(_.getAs[Long]("n_clicks")).sum == 2L)
  }

  test("hourly windowed agg over a memory stream with watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "buy", 5.0),
      Event(4, ts(200), 1, "click", 1.0)) // advances watermark past first windows
    runStream(EventStreams.hourlyByType(mem.toDF()), "hourly")
    val rows = spark.table("hourly").orderBy("hour", "event_type").collect()
    // watermark advances to min200 - 120 = min80: only the [0,60) window has
    // end ≤ watermark and is emitted in append mode
    assert(rows.length == 1)
    val first = rows.head
    assert(first.getAs[Long]("n") == 2)
    assert(first.getAs[Double]("total_value") == 3.0)
  }

  test("sliding windows: each event lands in window/slide overlapping panes") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(16), 1, "click", 1.0),  // panes starting min -45..15
      Event(2, ts(700), 9, "click", 1.0)) // far future: emits all 4 panes
    runStream(EventStreams.slidingUserActivity(mem.toDF()), "sliding")
    val rows = spark.table("sliding")
      .filter(col("user_id") === 1).orderBy("w_start").collect()
    // 1h window / 15m slide → exactly 4 panes contain the event
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[Long]("n") == 1))
    val starts = rows.map(_.getAs[Timestamp]("w_start").getTime)
    assert(starts.toSeq == starts.sorted.toSeq)
    assert(starts.zip(starts.tail).forall { case (a, b) => b - a == 15 * 60000L })
  }

  test("session windows close on gap") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 7, "a", 1.0),
      Event(2, ts(5), 7, "a", 1.0),   // same session (gap 5m < 30m)
      Event(3, ts(60), 7, "a", 1.0),  // new session
      Event(4, ts(600), 7, "a", 0.0)) // far future: closes both via watermark
    runStream(EventStreams.sessionWindows(mem.toDF()), "sessions")
    val rows = spark.table("sessions").orderBy("session_start").collect()
    assert(rows.length >= 2)
    assert(rows.head.getAs[Long]("n_events") == 2)
    assert(rows(1).getAs[Long]("n_events") == 1)
  }

  test("custom sessionizer emits gap-closed sessions with aggregates") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "a", 2.0),
      Event(2, ts(10), 1, "a", 3.0),
      Event(3, ts(120), 1, "a", 1.0)) // >30m gap → first session closes
    val out = EventStreams.sessionize(mem.toDS())
    val query = out.writeStream.format("memory").queryName("sess2")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination(60000)
    val rows = spark.table("sess2").collect()
    assert(rows.length == 1) // second session still open in state
    val r = rows.head
    assert(r.getAs[Long]("user_id") == 1)
    assert(r.getAs[Int]("n_events") == 2)
    assert(r.getAs[Double]("total_value") == 5.0)
    assert(r.getAs[String]("closed_by") == "gap")
  }

  test("streaming dedup drops in-watermark duplicates, keeps state bounded") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(1), 1, "click", 1.0),  // dup key within watermark → dropped
      Event(2, ts(2), 2, "buy", 5.0),
      Event(3, ts(10), 1, "click", 2.0))
    runStream(
      EventStreams.dedupStream(mem.toDF(), Seq("event_id")), "deduped")
    val rows = spark.table("deduped").collect()
    assert(rows.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-stream join pairs clicks with in-range purchases only") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    clicks.addData(Event(1, ts(70), 7, "click", 0.0))
    purchases.addData(
      Event(100, ts(30), 7, "purchase", 9.99),  // 40m before → in range
      Event(101, ts(80), 7, "purchase", 1.0),   // after the click → out
      Event(102, ts(30), 8, "purchase", 2.0))   // other user → out
    runStream(
      EventStreams.clickPurchaseJoin(clicks.toDF(), purchases.toDF()), "ssj")
    val rows = spark.table("ssj").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("click_id") == 1L)
    assert(rows.head.getAs[Long]("purchase_id") == 100L)
  }

  test("left-outer stream-stream join: unmatched clicks emit null-extended after watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssoj_ckpt_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ssoj_out_").toString
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    def run(): Unit = {
      val q = EventStreams.clickPurchaseLeftJoin(clicks.toDF(), purchases.toDF())
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    clicks.addData(
      Event(1, ts(70), 7, "click", 0.0),  // will match purchase 100
      Event(2, ts(75), 8, "click", 0.0))  // user 8 never purchases
    purchases.addData(Event(100, ts(30), 7, "purchase", 9.99))
    run()
    // advance BOTH watermarks far enough that click 2's range is provably
    // unmatched (watermark = max_ts - 2h must pass click_ts)
    clicks.addData(Event(3, ts(400), 9, "click", 0.0))
    purchases.addData(Event(101, ts(400), 9, "purchase", 1.0))
    run()
    val rows = spark.read.parquet(outDir).filter(col("click_id").isNotNull)
      .select("click_id", "purchase_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // matched click carries its purchase; orphan click emitted exactly
    // once with a NULL purchase — only after the watermark evicted it
    assert(rows(1L) == Some(100L))
    assert(rows.contains(2L) && rows(2L).isEmpty,
      s"unmatched click must emit null-extended after watermark (got $rows)")
  }

  test("curation transforms run unchanged on a stream (stateless operators)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, "the cat sat on the mat and it was a fine day for all of the cats"),
      (2L, "x@y.org !!!"), // fails the quality gate
      (3L, "see https://a.b/c for the info on it and a lot of the rest now ok"))
    val curated = graft.operators.TextAnalysis.qualityFilter(
      graft.operators.TextAnalysis.redactPii(
        mem.toDF().toDF("doc_id", "text"), "text")
        .drop("text").withColumnRenamed("redacted", "text"),
      "text")
    val q = curated.writeStream.format("memory").queryName("curated")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("curated").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 3L))
    assert(rows.forall(r => !r.getAs[String]("text").contains("https://")))
  }

  test("checkpoint recovery: windowed agg state survives a restart, no loss or dup") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ckpt_out_").toString
    val mem = MemoryStream[Event]
    def run(): Unit = {
      // parquet sink: fault-tolerant (memory sink refuses checkpoint recovery)
      val q = EventStreams.hourlyByType(mem.toDF())
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0))
    run() // watermark hasn't passed the window end: nothing emitted yet
    // "restart": a new query from the SAME checkpoint picks up state
    mem.addData(Event(3, ts(300), 2, "click", 1.0)) // advances watermark
    run()
    val rows = spark.read.parquet(outDir)
      .filter(col("n").isNotNull).orderBy("hour", "event_type").collect()
    // the [0, 60) window closed exactly once, with BOTH pre-restart events
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n") == 2)
    assert(rows.head.getAs[Double]("total_value") == 3.0)
  }

  test("stream-static enrichment: dim attributes ride along, misses stay null") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 2, "click", 1.0),
      Event(3, ts(2), 9, "click", 1.0)) // user 9 absent from the dim
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    runStream(EventStreams.enrichWithDim(mem.toDF(), dim, "user_id"), "enriched")
    val rows = spark.table("enriched").orderBy("event_id")
      .select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
    assert(rows.toSeq == Seq(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
  }

  test("dropSeenKeys: stream rows whose key exists in the static reference are dropped") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "click", 1.0),
      Event(3, ts(2), 1, "click", 1.0),
      Event(4, ts(3), 1, "click", 1.0))
    val seen = Seq(1L, 3L, 99L).toDF("event_id")
    runStream(EventStreams.dropSeenKeys(mem.toDF(), seen, "event_id"), "unseen")
    val kept = spark.table("unseen").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 4L))
  }

  test("contamination flags: only docs sharing eval fingerprints emit hits") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    import graft.functions.HashFunctions.winnow_fingerprint
    val evalText = "the quick brown fox jumps over the lazy dog by the river"
    val evalFps = Seq(Tuple1(evalText)).toDF("text")
      .select(explode(winnow_fingerprint(col("text"), 5, 4)).as("h"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, evalText),          // exact copy: every fingerprint hits
      (2L, "zzz qqq vvv kkk www xxx uuu mmm nnn ppp")) // disjoint chars: no hits
    val flags = EventStreams.contaminationFlags(
      mem.toDF().toDF("doc_id", "text"), evalFps, "doc_id", "text")
    runStream(flags, "contam")
    val hits = spark.table("contam").groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.getOrElse(1L, 0L) > 0, "copy must emit fingerprint hits")
    assert(!hits.contains(2L), "novel doc must emit none")
  }

  test("streaming funnel: advances, late-data regression, timeout final") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fnl_ckpt_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_fnl_out_").toString
    val mem = MemoryStream[Event]
    def run(): Unit = {
      val q = EventStreams.funnelStream(mem.toDS())
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    // batch 1: user 1 walks the full funnel in order -> 0→1→2→3
    mem.addData(
      Event(1, ts(0), 1, "view", 0.0),
      Event(2, ts(10), 1, "click", 0.0),
      Event(3, ts(20), 1, "purchase", 1.0),
      // user 2: view then click -> 0→1→2
      Event(4, ts(100), 2, "view", 0.0),
      Event(5, ts(200), 2, "click", 0.0))
    run()
    // batch 2: a LATE click for user 2 at min 90 — earlier than the view
    // at 100, still inside the 2 h watermark (wm = 200 - 120 = 80). The
    // first-touch click moves to 90 <= t_view -> stage regresses 2→1
    mem.addData(Event(6, ts(90), 2, "click", 0.0))
    run()
    // batch 3: far-future event advances the watermark past both users'
    // timeout horizon (last + 2 h) -> "final" rows emitted, state purged
    mem.addData(Event(7, ts(1000), 3, "view", 0.0))
    run()
    mem.addData(Event(8, ts(2000), 3, "view", 0.0))
    run()
    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("prev_stage"),
        r.getAs[Int]("stage"), r.getAs[String]("kind")))
    val u1 = rows.filter(_._1 == 1L).sortBy(_._3)
    assert(u1.contains((1L, 0, 1, "advance")) && u1.contains((1L, 1, 2, "advance"))
      && u1.contains((1L, 2, 3, "advance")))
    val u2 = rows.filter(_._1 == 2L)
    assert(u2.contains((2L, 0, 1, "advance")) && u2.contains((2L, 1, 2, "advance")))
    assert(u2.contains((2L, 2, 1, "regress")), s"no regression emitted: ${u2.toSeq}")
    // finals: user 1 at stage 3, user 2 at the regressed stage 1
    assert(rows.contains((1L, 3, 3, "final")))
    assert(rows.contains((2L, 1, 1, "final")))
  }

  test("late data past the watermark is dropped; within-watermark late data counts") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_late_ckpt_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_late_out_").toString
    val mem = MemoryStream[Event]
    def run(): Unit = {
      // checkpointed parquet sink so the WATERMARK persists across runs —
      // a fresh query would reset it to 0 and "late" would stop being late
      val q = EventStreams.hourlyByType(mem.toDF())
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    // run 1: two on-time events in window [0h, 1h) — watermark still behind
    mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0))
    run()
    // run 2: min 200 advances the watermark to min 80 → [0h,1h) closes, n=2
    mem.addData(Event(3, ts(200), 2, "click", 4.0))
    run()
    // run 3: one TOO-LATE row (min 5: its window end 60 < watermark 80 —
    // must be dropped, and must NOT re-emit or duplicate the closed window)
    // and one late-but-within-watermark row (min 90 > watermark 80: its
    // window [60,120) is still open, so it must be counted)
    mem.addData(Event(4, ts(5), 1, "click", 100.0), Event(5, ts(90), 3, "click", 8.0))
    run()
    // run 4: far-future event closes everything still open
    mem.addData(Event(6, ts(400), 2, "click", 1.0))
    run()
    val rows = spark.read.parquet(outDir).filter(col("n").isNotNull)
      .orderBy("hour", "event_type").collect()
    val byHour = rows.groupBy(_.getAs[Timestamp]("hour").getTime)
    // window() aligns to epoch hours, not to the test's base timestamp
    def hourStart(min: Long): Long = {
      val t = ts(min).getTime; t - (t % 3600000L)
    }
    val h0 = hourStart(0); val h1 = hourStart(90); val h3 = hourStart(200)
    // [0h,1h): exactly ONE output row, n=2 — the min-5 straggler neither
    // re-opened the window nor produced a duplicate/updated row
    assert(byHour(h0).length == 1)
    assert(byHour(h0).head.getAs[Long]("n") == 2)
    assert(byHour(h0).head.getAs[Double]("total_value") == 3.0)
    // [1h,2h): the within-watermark late row WAS counted
    assert(byHour(h1).length == 1)
    assert(byHour(h1).head.getAs[Long]("n") == 1)
    assert(byHour(h1).head.getAs[Double]("total_value") == 8.0)
    // [3h,4h): the run-2 event closed normally
    assert(byHour(h3).head.getAs[Long]("n") == 1)
    // and nothing ever carried the dropped row's value anywhere
    assert(!rows.exists(_.getAs[Double]("total_value") == 100.0))
  }

  test("exactly-once sink: micro-batch replay overwrites instead of duplicating") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_eo_ckpt_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_eo_out_").toString
    val mem = MemoryStream[Event]
    mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "click", 2.0))
    EventStreams.startExactlyOnceParquetSink(mem.toDF(), outDir, ckpt)
      .awaitTermination(60000)
    mem.addData(Event(3, ts(2), 3, "click", 3.0))
    EventStreams.startExactlyOnceParquetSink(mem.toDF(), outDir, ckpt)
      .awaitTermination(60000)
    val before = spark.read.parquet(outDir)
    assert(before.count() == 3)
    // simulate the crash-replay: the batch that wrote events 1-2 runs
    // again with the same batchId (what Structured Streaming does after a
    // failure between data write and checkpoint commit)
    val replay = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "click", 2.0)).toDF()
    EventStreams.writeBatchIdempotent(replay, outDir, batchId = 0L)
    val after = spark.read.parquet(outDir)
    assert(after.count() == 3, "replayed micro-batch must not duplicate rows")
    assert(after.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("transformWithState sessionizer: parity with flatMapGroupsWithState on gap, cap, and timeout closes") {
    // Spark 4's arbitrary-state API (ValueState + explicit timers,
    // RocksDB-only by design) must close the same sessions as the
    // flatMapGroupsWithState sessionizer — gap-closed mid-stream,
    // cap-closed at maxEvents, timeout-closed by the watermark.
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val data = Seq(
      Event(1, ts(0), 1, "a", 1.0), Event(2, ts(10), 1, "a", 2.0),
      Event(3, ts(70), 1, "a", 4.0), // >30m gap: closes session 1
      Event(4, ts(75), 1, "a", 8.0),
      Event(5, ts(0), 2, "b", 1.0), Event(6, ts(1), 2, "b", 1.0),
      Event(7, ts(2), 2, "b", 1.0), // cap=3 closes user 2's session
      Event(8, ts(400), 9, "w", 0.0)) // watermark push: times out stragglers
    def viaTws(): Seq[(Long, Int, Double, String)] = {
      val mem = MemoryStream[Event]
      mem.addData(data: _*)
      val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      EventStreams.RocksDbStateStore.foreach { case (k, v) => s.conf.set(k, v) }
      try runStream(
        EventStreams.sessionizeTws(mem.toDS(), maxEvents = 3).toDF(), "tws_sess")
      finally prev match {
        case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      spark.table("tws_sess").orderBy("user_id", "start_us")
        .collect().map(r => (r.getLong(0), r.getInt(2), r.getDouble(3),
          r.getString(4))).toSeq
    }
    def viaFmgws(): Seq[(Long, Int, Double, String)] = {
      val mem = MemoryStream[Event]
      mem.addData(data: _*)
      runStream(EventStreams.sessionize(mem.toDS(), maxEvents = 3).toDF(), "fm_sess")
      spark.table("fm_sess").orderBy("user_id", "session_start")
        .collect().map(r => (r.getLong(0), r.getInt(2), r.getDouble(3),
          r.getString(4))).toSeq
    }
    val tws = viaTws()
    val fm = viaFmgws()
    assert(tws.nonEmpty, "TWS drain emitted nothing")
    assert(tws == fm, s"TWS sessions $tws != flatMapGroupsWithState $fm")
    // the close reasons cover all three paths in one drain
    assert(tws.map(_._4).toSet == Set("gap", "cap", "timeout"))
  }

  test("warm-start sessionization: batch bootstrap + live stream == one cold stream over everything") {
    // StatefulProcessorWithInitialState: history folds batch-side, open
    // sessions seed the stream's state store (with their idle timers),
    // and a session SPANNING the batch/stream boundary must come out as
    // ONE session — the backfill/migration correctness property.
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val history = Seq(
      Event(1, ts(0), 1, "a", 1.0), Event(2, ts(10), 1, "a", 2.0), // open at cut
      Event(3, ts(0), 2, "b", 1.0), // user 2: closes inside history (gap below)
      Event(4, ts(50), 2, "b", 4.0)) // >30m after e3 -> history closes e3's session
    val live = Seq(
      Event(5, ts(20), 1, "a", 4.0), // within gap of e2: SAME session continues
      Event(6, ts(120), 1, "a", 8.0), // new session for user 1
      Event(7, ts(400), 9, "w", 0.0)) // watermark push
    def collectSessions(table: String): Set[(Long, Long, Int, Double)] =
      spark.table(table).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .filter(_._1 != 9).toSet
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    EventStreams.RocksDbStateStore.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // cold reference: everything through one stream
      val memAll = MemoryStream[Event]
      memAll.addData(history ++ live: _*)
      runStream(EventStreams.sessionizeTws(memAll.toDS()).toDF(), "cold_sess")
      val cold = collectSessions("cold_sess")
      // warm: history folds batch-side, live streams over the seeded store
      val (closed, open) = EventStreams.bootstrapSessions(history.toDS())
      val memLive = MemoryStream[Event]
      memLive.addData(live: _*)
      runStream(EventStreams.sessionizeTwsWarm(memLive.toDS(), open).toDF(), "warm_sess")
      val warm = collectSessions("warm_sess") ++ closed.collect()
        .map(o => (o.user_id, o.start_us, o.n_events, o.total_value)).toSet
      assert(cold.nonEmpty)
      assert(warm == cold, s"warm $warm != cold $cold")
      // the boundary-spanning session exists: user 1's first session has
      // events from BOTH sides (n=3: e1, e2 from history + e5 live)
      assert(cold.exists { case (u, _, n, total) => u == 1 && n == 3 && total == 7.0 },
        s"no boundary-spanning session in $cold")
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("RocksDB state store: stateful drain output identical to the default provider") {
    // VERDICT r12 next #8: the provider knob surfaced. The same
    // watermarked windowed aggregation drains once under each provider;
    // output must be row-identical — the store is an implementation
    // choice (EventStreams.RocksDbStateStore is the documented 100-TB
    // default), never a semantics change. Each query pins its provider
    // at start (cloned session), so the ambient session is untouched.
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def drain(confs: Map[String, String], name: String): Seq[String] = {
      val mem = MemoryStream[Event]
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(70), 2, "buy", 5.0),
        Event(4, ts(95), 2, "buy", 7.0),
        Event(5, ts(400), 1, "click", 1.0)) // watermark far past both windows
      val prev = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try runStream(EventStreams.hourlyByType(mem.toDF()), name)
      finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
      spark.table(name).orderBy("hour", "event_type")
        .collect().map(_.toString).toSeq
    }
    val default = drain(Map.empty, "prov_default")
    val rocks = drain(EventStreams.RocksDbStateStore, "prov_rocksdb")
    assert(rocks.nonEmpty, "drain emitted nothing — watermark never closed a window")
    assert(rocks == default,
      s"provider changed RESULTS: default=$default rocksdb=$rocks")
    // the ambient session still runs the built-in default
    assert(!s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
    // and the exactly-once sink accepts the same conf map (compiles +
    // runs under RocksDB; idempotence semantics unchanged)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rock_ckpt_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_rock_out_").toString
    val mem2 = MemoryStream[Event]
    mem2.addData(Event(1, ts(0), 1, "click", 1.0))
    EventStreams.startExactlyOnceParquetSink(mem2.toDF(), outDir, ckpt,
      confs = EventStreams.RocksDbStateStore).awaitTermination(60000)
    assert(spark.read.parquet(outDir).count() == 1)
  }

  test("session_window boundary: event exactly gap-after-previous MERGES (break is >)") {
    // pins the semantics the events_session_builtin oracle encodes
    // (measured, not assumed): Spark merges a follower at exactly +gap
    // into the running session — the break condition is strict >, same
    // as the lag-based sessionize; one past +gap starts a new session
    val s = spark
    import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    val df = Seq((1L, t0), (1L, plus(1800000)), (2L, t0), (2L, plus(1800001)))
      .toDF("user_id", "ts")
    val n = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // user 1: exact-gap follower merges -> one session of 2;
    // user 2: 1 ms past the gap -> two singleton sessions
    assert(n == Seq((1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("batch/stream parity: hourlyByType on the events table matches groupBy") {
    // schema-adaptive load (nanos-as-long OR native timestamp[us])
    val ev = graft.SparkEntry.events(spark, "/root/testdata/sf0.001")
    val viaOperator = EventStreams.hourlyByType(ev)
      .agg(sum("n")).head().getLong(0)
    assert(viaOperator == ev.count())
  }

  test("harness queries drain in ONE lifecycle of at most 2 micro-batches") {
    // Pins the round-11 restructure (BASELINE.md: a micro-batch costs ~1 s
    // of state-store lifecycle regardless of rows; the old 3-lifecycle /
    // 6-batch harness shape tripled the floor). The checkpoint's offsets
    // dir carries one file per micro-batch ever run at that checkpoint —
    // if a refactor reintroduces sentinel lifecycles, this count jumps.
    for ((q, name) <- Seq(("events_funnel_stream", "funnel"),
        ("events_hourly_stream", "hourly"))) {
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      val tag = "/root/testdata/sf0.001".replaceAll("[^A-Za-z0-9]", "_")
      val offsets = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_stream_${name}_$tag/ckpt/offsets")
      assert(offsets.isDirectory, s"$q: no checkpoint offsets dir")
      val batches = offsets.listFiles.count(_.getName.forall(_.isDigit))
      assert(batches <= 2,
        s"$q ran $batches micro-batches — the single-lifecycle harness allows 2")
    }
  }

  test("events_join_stream runs through the symmetric-hash-join state store") {
    // Non-vacuity pin for the fifth oracled streaming row: the query must
    // actually exercise Spark's stream-stream join STATE machinery (four
    // stores per partition: left/right keyToNumValues + keyWithIndexToValue),
    // not fall back to a batch join over the drained feed. The state dirs
    // under the checkpoint are the execution's own evidence.
    val out = graft.SparkEntry.queries("events_join_stream")(
      spark, "/root/testdata/sf0.001")
    out.count() // 0 matches at sf0.001 is fine — the state store still ran
    val tag = "/root/testdata/sf0.001".replaceAll("[^A-Za-z0-9]", "_")
    val state = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_stream_ssjoin_$tag/ckpt/state/0")
    assert(state.isDirectory, "no join state under the checkpoint")
    val storeNames = state.listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).map(_.getName).toSet
    for (n <- Seq("left-keyToNumValues", "right-keyToNumValues",
        "left-keyWithIndexToValue", "right-keyWithIndexToValue"))
      assert(storeNames.contains(n), s"missing join state store $n in $storeNames")
  }
}
