package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming semantics the batch-driven oracle queries cannot show:
  * watermark late-data drop and incremental multi-batch processing via
  * MemoryStream. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops late rows in append-mode windowed aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val agg = in.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(sum($"v").as("total"))
      .select($"window.start".as("w"), $"total")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("graft_late_test").start()
    try {
      // batch 1: events in [00:00, 00:10) and [00:20, 00:30) — watermark
      // advances to 00:29 - 10m = 00:19, closing the first window
      in.addData((ts("2024-01-01 00:01:00"), 1L), (ts("2024-01-01 00:29:00"), 5L))
      q.processAllAvailable()
      // batch 2: a LATE row for the already-closed first window + a fresh row
      in.addData((ts("2024-01-01 00:02:00"), 100L), (ts("2024-01-01 00:41:00"), 7L))
      q.processAllAvailable()
      // batch 3: advance watermark far enough to close everything else
      in.addData((ts("2024-01-01 01:30:00"), 9L))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("graft_late_test")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(out("2024-01-01 00:00:00.0") == 1L, s"late row must be dropped: $out")
    assert(out("2024-01-01 00:20:00.0") == 5L)
    assert(out("2024-01-01 00:40:00.0") == 7L)
  }

  test("streaming session_window equals batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:30:00"), 1L), // session A
      (ts("2024-01-01 02:00:00"), 1L),                                  // session B
      (ts("2024-01-01 00:10:00"), 2L))                                  // other user
    val in = MemoryStream[(Timestamp, Long)]
    val agg = in.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window($"ts", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".as("s"), $"user_id", $"n")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("graft_sess_test").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("graft_sess_test")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val batch = events.toDF("ts", "user_id")
      .groupBy(session_window($"ts", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".as("s"), $"user_id", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.contains((ts("2024-01-01 00:00:00"), 1L, 2L)))
  }

  test("file-stream replay executes >=3 time-ordered microbatches end-to-end") {
    // covers the staged-slice path in CI (runToTable's batchId require
    // throws if the fixture collapses into fewer batches) and checks the
    // multi-batch result still equals the batch answer
    val got = Streams.tumbling(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    import spark.implicits._
    val want = graft.core.Tables.events(spark, sf)
      .groupBy(date_trunc("day", $"ts").as("w_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("AvailableNow restart catches up incrementally and equals the batch answer") {
    // the two-run restart law: run 1 drains the staged history and
    // self-terminates; a slice lands; run 2 restarts from the same
    // checkpoint. The operator require's run 2 read EXACTLY the delta
    // (a history reprocess throws), and the re-emitted complete state
    // must equal the batch aggregate over everything.
    val got = Streams.availableNow(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    import spark.implicits._
    val want = graft.core.Tables.events(spark, sf)
      .groupBy(date_trunc("day", $"ts").as("w_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("incremental CDC snapshot equals the batch latest-per-user answer") {
    // the foreachBatch merge runs >=3 versioned merges (require inside
    // upsertSink); the final snapshot must be exactly the batch
    // last-writer-wins state — one row per user, independent of where
    // the batch boundaries fell
    import spark.implicits._
    val got = Streams.upsertSink(spark, sf)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val want = graft.core.Tables.events(spark, sf)
      .withColumn("rk", row_number().over(w)).where($"rk" === 1)
      .select($"user_id", $"ts", $"event_type")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(got == want)
    assert(got.size == graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count())
  }

  test("streaming quantified pattern equals the batch run-automaton per user") {
    // one stream match row per (signup, view+, purchase) run triple,
    // independent of batch boundaries — aggregating the match rows must
    // reproduce events_quant_pattern's per-user measures exactly
    import spark.implicits._
    val got = Streams.quantPattern(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"b_len").as("total"), max($"b_len").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val want = graft.operators.Relational.eventsQuantPattern(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(want.nonEmpty && got == want)
  }

  test("update mode revises batch-boundary windows (more revisions than keys)") {
    // staged-fixture property: the quantile slice cuts fall INSIDE 1-day
    // windows, so at least one (window, key) is emitted in more than one
    // microbatch — the observable separating update mode from append
    val revisions = Streams.tumblingUpdateRevisions(spark, sf)
    val keys = revisions.select("w_start", "event_type").distinct()
    assert(revisions.count() > keys.count(),
      "no (window, key) was revised across microbatches — slice cuts " +
      "appear to align with window boundaries")
  }

  test("transformWithState event-time timers fire on watermark advance and evict state") {
    // the timer half of the Spark-4 state API (stream_transform_state
    // exercises the state-variable half): a processor counts per-key
    // rows, arms an event-time timer at lastTs + 20 min (re-arming on
    // each batch), and on expiry emits a close marker and clears state.
    // MemoryStream + explicit watermark control makes firing
    // deterministic: the timer must fire exactly when the watermark
    // passes it, and the close marker must carry the full count.
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 20L * 60 * 1000
    class CloseOnIdle extends StatefulProcessor[Long, (Long, Timestamp), (Long, String, Long)] {
      @transient private var n: ValueState[Long] = _
      @transient private var armed: ValueState[Long] = _
      override def init(om: OutputMode, tm: TimeMode): Unit = {
        n = getHandle.getValueState("n", Encoders.scalaLong, TTLConfig.NONE)
        armed = getHandle.getValueState("armed", Encoders.scalaLong, TTLConfig.NONE)
      }
      override def handleInputRows(k: Long, rows: Iterator[(Long, Timestamp)],
          tv: TimerValues): Iterator[(Long, String, Long)] = {
        var cnt = if (n.exists()) n.get else 0L
        var lastMs = 0L
        rows.foreach { case (_, t) => cnt += 1; lastMs = math.max(lastMs, t.getTime) }
        n.update(cnt)
        if (armed.exists()) getHandle.deleteTimer(armed.get)
        getHandle.registerTimer(lastMs + gapMs)
        armed.update(lastMs + gapMs)
        Iterator((k, "open", cnt))
      }
      override def handleExpiredTimer(k: Long, tv: TimerValues,
          info: ExpiredTimerInfo): Iterator[(Long, String, Long)] = {
        val cnt = if (n.exists()) n.get else 0L
        n.clear(); armed.clear()
        Iterator((k, "closed", cnt))
      }
    }
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Timestamp)]
      val out = in.toDS()
        .withColumnRenamed("_1", "user").withColumnRenamed("_2", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Long, Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new CloseOnIdle, TimeMode.EventTime(), OutputMode.Update())
        .toDF("user", "kind", "n")
      val q = out.writeStream.outputMode("update")
        .format("memory").queryName("graft_timer_test").start()
      try {
        // batch 1: two rows for user 1 — timer armed at 00:02 + 20 min
        in.addData((1L, ts("2024-01-01 00:01:00")), (1L, ts("2024-01-01 00:02:00")))
        q.processAllAvailable()
        // batch 2: user 2 appears at 00:10 — watermark (00:10) is still
        // before user 1's 00:22 timer, so no close yet
        in.addData((2L, ts("2024-01-01 00:10:00")))
        q.processAllAvailable()
        val mid = spark.table("graft_timer_test")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        assert(!mid.exists(_._2 == "closed"), s"timer fired early: ${mid.mkString(",")}")
        // batch 3: advance the watermark to 00:25 — BETWEEN user 1's
        // 00:22 timer (fires, with the full count, and evicts) and
        // user 2's 00:30 timer (stays armed)
        in.addData((3L, ts("2024-01-01 00:25:00")))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("graft_timer_test")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((1L, "closed", 2L)),
        s"expected user 1 closed with n=2: $rows")
      assert(!rows.exists(r => r._1 == 2L && r._2 == "closed"),
        s"user 2's timer must still be armed: $rows")
      assert(rows.contains((1L, "open", 2L)) && rows.contains((2L, "open", 1L)))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
