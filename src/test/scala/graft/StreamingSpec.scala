package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingSync

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_stream_$tag").toFile.getAbsolutePath

  test("continuous sync applies the strategy per micro-batch with checkpointed state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val cfg = PipelineConfig(
      SourceConfig("/stream", "people"),
      StoreConfig(tmp("state") + "/state", "people_col"),
      UpdateType.UpsertChecksum, "id", 1L)
    val checkpoint = tmp("ckpt")

    in.addData(("a", 1.0), ("b", 2.0))
    val q1 = StreamingSync.run(spark, in.toDF().toDF("id", "score"), cfg, checkpoint)
    q1.awaitTermination(60000)
    val store = new graft.state.StateStore(spark, cfg.store.statePath)
    assert(store.load().count() == 2)

    // second batch: one update, one insert — strategy semantics preserved
    in.addData(("a", 9.0), ("c", 3.0))
    val q2 = StreamingSync.run(spark, in.toDF().toDF("id", "score"), cfg, checkpoint)
    q2.awaitTermination(60000)
    val out = store.load().select("id", "score").as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 9.0, "b" -> 2.0, "c" -> 3.0))
  }

  test("streaming dedup drops cross-batch duplicate keys") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val dedup = StreamingSync.dedupStream(
      in.toDF().toDF("ts", "event_id", "value"), Seq("event_id"), "1 hour")
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
    in.addData((t, 1L, 1.0), (t, 1L, 1.0), (t, 2L, 2.0)) // in-batch dup
    q.processAllAvailable()
    // cross-batch re-delivery of key 1 with a DIFFERENT ts (retry
    // re-stamping) must still be dropped — per-key dedup, not per-(key,ts)
    in.addData((t2, 1L, 1.0), (t, 3L, 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("session windows close on gap once the watermark passes, emit once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val sessions = StreamingSync.sessionize(
      in.toDF().toDF("ts", "user_id", "value"), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 7 bursts at 10:00-10:10, again at 12:00; user 8 once at 10:20.
    in.addData(
      (ts("2024-01-01 10:00:00"), 7L, 1.0),
      (ts("2024-01-01 10:10:00"), 7L, 2.0),
      (ts("2024-01-01 10:20:00"), 8L, 5.0))
    q.processAllAvailable()
    // nothing emitted yet: watermark hasn't passed any session end
    assert(spark.table("sessions_out").isEmpty)
    // 12:00 advances the watermark to 11:30 > both sessions' end -> emit
    in.addData((ts("2024-01-01 12:00:00"), 7L, 4.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions_out")
      .select("user_id", "start_ts", "end_ts", "n_events", "total_value")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.size == 2)
    val s7 = out(7L)
    assert(s7._2 == ts("2024-01-01 10:00:00") && s7._3 == ts("2024-01-01 10:40:00"))
    assert(s7._4 == 2L && s7._5 == 3.0) // end = last event + gap
    val s8 = out(8L)
    assert(s8._4 == 1L && s8._5 == 5.0)
  }

  test("session windows: exactly-gap-spaced event MERGES; one past gap splits") {
    // pins the boundary strictness q250's oracle assumes: Spark's
    // session_window merges when the next event's start is at or before
    // the current end (INCLUSIVE — an event exactly gap after its
    // predecessor CONTINUES the session); only an event strictly past
    // prev + gap opens a new one. The oracle's chaining must therefore
    // be `ts > prev + INTERVAL gap`, not `>=`. (The events fixture has
    // no exactly-boundary pairs at any SF — checked round 9 at
    // sub-second resolution — so only this spec exercises the edge.)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val sessions = StreamingSync.sessionize(
      in.toDF().toDF("ts", "user_id", "value"), gapMinutes = 30)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_boundary_out").outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(
      (ts("2024-01-01 10:00:00"), 3L, 1.0),
      (ts("2024-01-01 10:30:00"), 3L, 2.0),       // exactly gap: merges
      (ts("2024-01-01 11:00:00.001"), 3L, 4.0))   // 1ms past gap: splits
    q.processAllAvailable()
    in.addData((ts("2024-01-02 00:00:00"), 9L, 0.0))
    q.processAllAvailable()
    in.addData((ts("2024-01-03 00:00:00"), 9L, 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions_boundary_out")
      .filter(col("user_id") === 3L)
      .select("start_ts", "end_ts", "n_events", "total_value")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().sortBy(_._1.getTime)
    assert(out.length == 2, s"expected 2 sessions, got ${out.toSeq}")
    assert(out(0)._1 == ts("2024-01-01 10:00:00") &&
      out(0)._2 == ts("2024-01-01 11:00:00") && out(0)._3 == 2L &&
      out(0)._4 == 3.0)
    assert(out(1)._1 == ts("2024-01-01 11:00:00.001") &&
      out(1)._2 == ts("2024-01-01 11:30:00.001") && out(1)._3 == 1L &&
      out(1)._4 == 4.0)
  }

  test("watermarked windowed counts aggregate an event stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = StreamingSync.windowedCounts(
      in.toDF().toDF("ts", "event_type", "value"), "10 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    in.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "click", 1.5),
      (java.sql.Timestamp.valueOf("2024-01-01 10:04:00"), "click", 2.5),
      (java.sql.Timestamp.valueOf("2024-01-01 10:11:00"), "view", 4.0))
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .select(col("window.start").cast("string"), col("event_type"), col("n"), col("total_value"))
      .as[(String, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 10:00:00", "click", 2L, 4.0),
      ("2024-01-01 10:10:00", "view", 1L, 4.0)))
  }

  test("native UDAFs aggregate under streaming incremental execution") {
    // bitmap_distinct and top_k_pairs are TypedImperativeAggregates —
    // their partial buffers must also merge across MICRO-BATCHES via
    // the streaming state store, not just across tasks
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Double)]
    val agg = in.toDF().toDF("k", "id", "score")
      .groupBy("k")
      .agg(graft.functions.BitmapDistinct.bitmapDistinct(col("id")).as("n_ids"),
        graft.functions.TopKPairs.topK(col("score"), col("id"), k = 2).as("top"))
    val q = agg.writeStream.format("memory").queryName("udaf_stream")
      .outputMode("complete").start()
    in.addData(("a", 1L, 5.0), ("a", 2L, 7.0), ("b", 9L, 1.0))
    q.processAllAvailable()
    in.addData(("a", 1L, 6.0), ("a", 3L, 9.0), ("b", 9L, 2.0))
    q.processAllAvailable()
    val byK = spark.table("udaf_stream")
      .select(col("k"), col("n_ids")).as[(String, Long)].collect().toMap
    // duplicate id 1 across batches collapses; id 9 stays one distinct
    assert(byK == Map("a" -> 3L, "b" -> 1L))
    val tops = spark.table("udaf_stream")
      .select(col("k"), expr("transform(top, p -> p.id)"))
      .as[(String, Seq[Long])].collect().toMap
    q.stop()
    // top-2 by score across both batches: a -> (3: 9.0, 2: 7.0);
    // b keeps both of id 9's rows — the aggregate ranks ROWS, not ids
    assert(tops("a") == Seq(3L, 2L))
    assert(tops("b") == Seq(9L, 9L))
  }

  test("stream-stream interval join matches clicks to purchases in-window") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = StreamingSync.streamIntervalJoin(
      purchases.toDF().toDF("p_user", "p_ts"),
      clicks.toDF().toDF("c_user", "c_ts", "c_value"),
      "p_user", "c_user", "p_ts", "c_ts",
      beforeSec = 1800, afterSec = 0, watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    clicks.addData((7L, ts("2024-01-01 10:00:00"), 1.5)) // in-window for 10:10
    clicks.addData((7L, ts("2024-01-01 09:00:00"), 9.9)) // too early
    clicks.addData((8L, ts("2024-01-01 10:05:00"), 2.5)) // wrong user
    purchases.addData((7L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    val got = spark.table("ssj_out").select("p_user", "c_value")
      .as[(Long, Double)].collect().toSet
    q.stop()
    assert(got == Set((7L, 1.5)))
  }

  test("custom-state funnel advances stages across micro-batches, in order") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingSync.funnelPerKey(
      in.toDF().toDF("user_id", "ts", "event_type"), "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"))
      .toDF("user_id", "funnel_stage")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    // batch 1: user 1's click arrives BEFORE its view in arrival order but
    // AFTER in event time -> stage 2; user 2's purchase-before-view -> 1
    in.addData((1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:01:00"), "view"))
    q.processAllAvailable()
    // batch 2: user 1 completes; user 2's click continues from stage 1
    in.addData((1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-01 10:02:00"), "click"))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("funnel_out").groupBy("user_id")
      .agg(max("funnel_stage").as("stage")) // stage is monotone
      .as[(Long, Long)].collect().toMap
    assert(last == Map(1L -> 3L, 2L -> 2L))
    // cross-check: the batch operator over the union of both batches
    val all = Seq(
      (1L, ts("2024-01-01 10:01:00"), 1L, "click"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "view"),
      (2L, ts("2024-01-01 10:00:00"), 3L, "purchase"),
      (2L, ts("2024-01-01 10:01:00"), 4L, "view"),
      (1L, ts("2024-01-01 10:02:00"), 5L, "purchase"),
      (2L, ts("2024-01-01 10:02:00"), 6L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val batch = graft.operators.Sequence.funnelStages(all, "user_id",
      Seq("ts", "event_id"), "event_type", Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(batch == last)
  }

  test("streaming transitions agree with the batch pairs across any micro-batch cut") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingSync.transitionsPerKey(
      in.toDF().toDF("user_id", "ts", "event_type"), "user_id", "ts",
      "event_type")
      .toDF("user_id", "from_type", "to_type")
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    // batch 1: user 1 out of arrival order (event time must win);
    // user 2 one event only (no pair yet — state carries it)
    in.addData((1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "view"))
    q.processAllAvailable()
    // batch 2: the cross-batch pairs (1: click->purchase, 2: view->error)
    // come from carried state
    in.addData((1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-01 10:02:00"), "error"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("trans_out")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(streamed == Seq(
      (1L, "click", "purchase"), (1L, "view", "click"),
      (2L, "view", "error")))
    // batch cross-check: lag-window pairs over the union of both batches
    val all = Seq(
      (1L, ts("2024-01-01 10:01:00"), 1L, "click"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "view"),
      (2L, ts("2024-01-01 10:00:00"), 3L, "view"),
      (1L, ts("2024-01-01 10:02:00"), 4L, "purchase"),
      (2L, ts("2024-01-01 10:02:00"), 5L, "error"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = all.withColumn("_prev", lag($"event_type", 1).over(w))
      .filter($"_prev".isNotNull)
      .select($"user_id", $"_prev", $"event_type")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(batch == streamed)
  }

  test("custom-state EMA carries the recurrence across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val ema = StreamingSync.emaPerKey(
      in.toDF().toDF("user_id", "ts", "value"), "user_id", "ts", "value", 0.5)
      .toDF("user_id", "ema", "n_events")
    val q = ema.writeStream.format("memory").queryName("ema_out")
      .outputMode("update").start()
    // batch 1, key 7: fold 1.0 then 2.0 (event-time order) -> 1.5
    in.addData((7L, ts("2024-01-01 10:01:00"), 2.0),
      (7L, ts("2024-01-01 10:00:00"), 1.0), (9L, ts("2024-01-01 10:00:00"), 8.0))
    q.processAllAvailable()
    // batch 2, key 7: state 1.5 continues -> 0.5*4 + 0.5*1.5 = 2.75
    in.addData((7L, ts("2024-01-01 10:02:00"), 4.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("ema_out").groupBy("user_id")
      .agg(max(struct(col("n_events"), col("ema"))).as("s"))
      .select(col("user_id"), col("s.ema"), col("s.n_events"))
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(last(7L) == ((2.75, 3L)))
    assert(last(9L) == ((8.0, 1L)))
    // sub-millisecond events in ONE batch must fold in event-time order
    // (Timestamp.getTime truncates to ms; compareTo carries the nanos):
    // 8,4,2 in time order -> ema 4.0; a value-order fold would give 5.5
    val in2 = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q2 = StreamingSync.emaPerKey(
      in2.toDF().toDF("user_id", "ts", "value"), "user_id", "ts", "value", 0.5)
      .toDF("user_id", "ema", "n_events")
      .writeStream.format("memory").queryName("ema_subms").outputMode("update").start()
    in2.addData(
      (1L, ts("2024-01-01 10:00:00.000300"), 2.0),
      (1L, ts("2024-01-01 10:00:00.000100"), 8.0),
      (1L, ts("2024-01-01 10:00:00.000200"), 4.0))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.table("ema_subms").select("ema").as[Double].head() == 4.0)
    // disjoint-column guard on the stream-stream join fires up front
    val err = intercept[IllegalArgumentException] {
      StreamingSync.streamIntervalJoin(
        Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("k1", "t1", "value"),
        Seq((1L, ts("2024-01-01 10:00:00"), 2.0)).toDF("k2", "t2", "value"),
        "k1", "k2", "t1", "t2", 60, 0, "1 hour")
    }
    assert(err.getMessage.contains("value"))

    // batch counterpart agrees with the streaming fold on the same data
    val batch = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1L, 1.0), (7L, ts("2024-01-01 10:01:00"), 2L, 2.0),
      (7L, ts("2024-01-01 10:02:00"), 3L, 4.0), (9L, ts("2024-01-01 10:00:00"), 4L, 8.0))
      .toDF("user_id", "ts", "event_id", "value")
    val b = graft.operators.Stats.emaPerKey(batch, "user_id", Seq("ts", "event_id"), "value", 0.5)
      .select("user_id", "ema").as[(Long, Double)].collect().toMap
    assert(b == Map(7L -> 2.75, 9L -> 8.0))
  }

  test("idleTimeout variants fold identically to the no-timeout custom-state ops") {
    // the eviction knob must not change WHAT is computed — only when idle
    // state dies. The idle path swaps mapGroupsWithState for
    // flatMapGroupsWithState around the SAME fold; driving both variants
    // over the same batch frame pins that refactor (timeouts never fire
    // in batch execution, so the fold logic is exactly what runs).
    // NOTE: with a real trigger, ProcessingTimeTimeout causes continuous
    // timeout-check batches — fine for a long-running production query,
    // hostile to processAllAvailable-style tests.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2.0), (1L, ts("2024-01-01 10:01:00"), 4.0),
      (1L, ts("2024-01-01 10:02:00"), 6.0), (2L, ts("2024-01-01 10:00:00"), 8.0))
      .toDF("k", "ts", "v")
    def emaOf(idle: String) = StreamingSync.emaPerKey(
      events, "k", "ts", "v", 0.5, idleTimeout = idle)
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(emaOf("") == emaOf("30 minutes"))
    assert(emaOf("30 minutes") == Map(1L -> ((4.5, 3L)), 2L -> ((8.0, 1L))))
    val funnelEv = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"), (1L, ts("2024-01-01 10:00:30"), "cart"),
      (1L, ts("2024-01-01 10:01:00"), "buy"), (2L, ts("2024-01-01 10:00:00"), "buy"))
      .toDF("k", "ts", "y")
    def funOf(idle: String) = StreamingSync.funnelPerKey(
      funnelEv, "k", "ts", "y", Seq("view", "cart", "buy"), idleTimeout = idle)
      .collect().toMap
    assert(funOf("") == funOf("30 minutes"))
    assert(funOf("30 minutes") == Map(1L -> 3L, 2L -> 0L))
    def rollOf(idle: String) = StreamingSync.rollingPerKeyStream(
      events, "k", "ts", "v", 60L, idleTimeout = idle)
      .collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(rollOf("") == rollOf("30 minutes"))
    // key 1's trailing 60s at 10:02:00 holds only the 10:02:00 bucket
    assert(rollOf("")(1L)._2 == 1L && rollOf("")(1L)._3 == 6.0)
  }

  test("streaming rolling window: bounded bucket state, agrees with batch") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val roll = StreamingSync.rollingPerKeyStream(
      in.toDF().toDF("user_id", "ts", "value"), "user_id", "ts", "value",
      windowSec = 20)
      .toDF("user_id", "win_end", "n_win", "sum_win")
    val q = roll.writeStream.format("memory").queryName("roll_out")
      .outputMode("update").start()
    in.addData((7L, ts("2024-01-01 00:00:00"), 1.0),
      (7L, ts("2024-01-01 00:00:10"), 2.0))
    q.processAllAvailable()
    // batch 2 advances past event 1: window [11, 30] holds events at 10s, 30s
    in.addData((7L, ts("2024-01-01 00:00:30"), 8.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("roll_out").orderBy(col("win_end").desc)
      .limit(1).select("n_win", "sum_win").as[(Long, Double)].head()
    // trailing window [11, 30]: the 0s/10s events evicted, only 30s left
    assert(last == ((1L, 8.0)), s"got $last")
    // batch counterpart: the LAST row per key of Stats.rollingPerKey
    val batch = Seq(
      (7L, ts("2024-01-01 00:00:00"), 1.0),
      (7L, ts("2024-01-01 00:00:10"), 2.0),
      (7L, ts("2024-01-01 00:00:30"), 8.0)).toDF("user_id", "ts", "value")
    val b = graft.operators.Stats.rollingPerKey(batch, "user_id", "ts",
      "value", windowSec = 20)
      .orderBy(col("ts").desc).limit(1)
      .select("n_win", "sum_win").as[(Long, Double)].head()
    assert(b == last, s"batch $b != stream $last")
  }

  test("streaming quota gate admits per-epoch in order, rejects late closed epochs") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val gate = StreamingSync.quotaPerKey(
      in.toDF().toDF("src", "ts", "event_id"), "src", "ts", "event_id",
      epochSec = 60, quota = 2)
      .toDF("src", "event_id", "epoch", "admitted")
    val q = gate.writeStream.format("memory").queryName("quota_out")
      .outputMode("update").start()
    // epoch A: three events -> first two (by event time) admitted
    in.addData((1L, ts("2024-01-01 00:00:30"), 12L),
      (1L, ts("2024-01-01 00:00:05"), 10L),
      (1L, ts("2024-01-01 00:00:20"), 11L))
    q.processAllAvailable()
    // epoch B next batch: quota resets; a LATE epoch-A event is rejected
    // (closed accounting never reopens), even though A admitted only 2
    in.addData((1L, ts("2024-01-01 00:01:10"), 20L),
      (1L, ts("2024-01-01 00:00:50"), 13L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("quota_out")
      .select("event_id", "admitted").as[(Long, Boolean)].collect().toMap
    assert(got == Map(10L -> true, 11L -> true, 12L -> false,
      20L -> true, 13L -> false), s"got $got")
    // batch twin for the epoch-aligned arrivals: row_number <= quota
    // per (key, epoch) over (ts, id)
    val batch = Seq(
      (1L, ts("2024-01-01 00:00:05"), 10L), (1L, ts("2024-01-01 00:00:20"), 11L),
      (1L, ts("2024-01-01 00:00:30"), 12L), (1L, ts("2024-01-01 00:01:10"), 20L))
      .toDF("src", "ts", "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"), (col("ts").cast("long") / 60).cast("long"))
      .orderBy(col("ts"), col("event_id"))
    val b = batch.withColumn("admitted", row_number().over(w) <= 2)
      .select("event_id", "admitted").as[(Long, Boolean)].collect().toMap
    assert(b == got.filterKeys(_ != 13L).toMap, s"batch $b")
  }

  test("streaming anomaly gate agrees with the batch operator across batches") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // 40 noisy-but-bounded values, then a spike in a LATER batch
    val base = (1 to 40).map(i => (5L, ts(i.toLong), i.toLong,
      5.0 + (i * 37 % 21 - 10) / 10.0))
    val spike = Seq((5L, ts(41L), 41L, 50.0), (5L, ts(42L), 42L, 5.3))
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val gate = StreamingSync.anomalyPerKey(
      in.toDF().toDF("k", "ts", "id", "v"), "k", "ts", "id", "v",
      lookback = 100, minN = 30, z = 3.0)
      .toDF("k", "sec", "id", "value", "n_base")
    val q = gate.writeStream.format("memory").queryName("anom_out")
      .outputMode("update").start()
    in.addData(base: _*); q.processAllAvailable()
    in.addData(spike: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("anom_out")
      .select("id", "value", "n_base").as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((41L, 50.0, 40L)), s"got $got")
    // batch twin over the identical event set flags the identical row
    val batch = graft.operators.Stats.rollingAnomaly(
      (base ++ spike).toDF("k", "ts", "id", "v"), "k", "ts", "id", "v",
      lookback = 100, minN = 30, z = 3.0)
      .select("id", "value", "n_base").as[(Long, Double, Long)].collect().toSeq
    assert(batch == got, s"batch $batch != stream $got")
  }

  test("streaming near-dup gate flags incoming docs that duplicate the corpus") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = StreamingSync.nearDupGate(
      in.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text",
      Files.createTempDirectory("graft_gate_ckpt").toString,
      m => seen ++= m.select("new_id", "corpus_id").as[(Long, Long)].collect(),
      bands = 8, rows = 2, threshold = 0.5,
      // continuous trigger: AvailableNow would stop after the first batch
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    in.addData(
      (100L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (101L, "totally unrelated text about nothing shared at all"))
    q.processAllAvailable()
    in.addData((102L, "beta gamma delta epsilon zeta")) // near-dup of 1
    q.processAllAvailable()
    q.stop()
    assert(seen.toSet == Set((100L, 1L), (102L, 1L))) // 101 passes the gate
  }

  test("streaming bloom novelty gate passes exactly the anti-join survivors") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = (1L to 500L).map(k => (k, s"c$k")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    // deliberately undersized sketch: high fp rate forces the exact path
    val q = StreamingSync.bloomNovelGate(
      in.toDF().toDF("doc_id", "text"), corpus, "doc_id",
      Files.createTempDirectory("graft_bloom_ckpt").toString,
      novel => seen ++= novel.select("doc_id").as[Long].collect(),
      expectedItems = 64, fpp = 0.2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    in.addData((1L, "dup"), (900L, "new"), (901L, "new"))
    q.processAllAvailable()
    in.addData((250L, "dup"), (902L, "new"))
    q.processAllAvailable()
    q.stop()
    assert(seen.toSet == Set(900L, 901L, 902L), s"got ${seen.toSet}")
  }

  test("streaming HLL per key: cross-batch register state, bit-exact batch agreement") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = StreamingSync.hllPerKey(in.toDF().toDF("k", "v"), "k", "v")
    val q = out.toDF().toDF("k", "n_est", "n_events").writeStream
      .format("memory").queryName("hll_stream_out").outputMode("update").start()
    val batch1 = (1 to 300).map(i => (1L, s"u$i")) ++ Seq((2L, "x"), (2L, "y"))
    val batch2 = (250 to 700).map(i => (1L, s"u$i")) ++ Seq((2L, "y"), (2L, "z"))
    in.addData(batch1: _*)
    q.processAllAvailable()
    in.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    // latest emission per key (n_events is monotone within a key)
    val got = spark.table("hll_stream_out").as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._3) }
    val batch = (batch1 ++ batch2).toDF("k", "v")
      .groupBy("k").agg(graft.operators.Sketches.hllRegisters(col("v")).as("regs"))
      .select(col("k"), graft.operators.Sketches.hllEstimate("regs").as("e"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L)._2 == batch(1L),
      s"key 1: stream ${got(1L)._2} vs batch ${batch(1L)}")
    assert(got(2L)._2 == batch(2L),
      s"key 2: stream ${got(2L)._2} vs batch ${batch(2L)}")
    // dedup-free event counts survive the restartable state
    assert(got(1L)._3 == (batch1.count(_._1 == 1L) + batch2.count(_._1 == 1L)).toLong)
    // the big key's estimate is in the 6.5%-se band of the exact count
    val exact1 = (batch1 ++ batch2).filter(_._1 == 1L).map(_._2).distinct.size
    assert(math.abs(got(1L)._2 - exact1).toDouble / exact1 < 0.2,
      s"estimate ${got(1L)._2} vs exact $exact1")
  }

  test("streaming changelog maintains the rollup through inserts AND deletes") {
    // a CDC feed arriving as micro-batches of I/D rows drives
    // IncrementalAgg.applyChangelog per batch (foreachBatch — the
    // retraction path has no append-only shortcut); after any batch cut
    // the maintained state must equal a from-scratch rebuild of the
    // surviving rows.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.IncrementalAgg
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val day = (c: org.apache.spark.sql.Column) => to_date(c)
    val base = Seq((1L, 10L, ts0, 5.0), (1L, 11L, ts0, 9.0),
      (2L, 20L, ts0, 7.0)).toDF("k", "id", "ts", "v")
    var live = base.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3))).toSeq
    var state = IncrementalAgg.partials(base, Seq("k"), day(col("ts")), "v")
      .localCheckpoint()
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, Double, String)]
    val q = in.toDF().toDF("k", "id", "ts", "v", "op")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ch = batch.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getDouble(3), r.getString(4)))
        live = live.filterNot(x => ch.exists(c => c._5 == "D" && c._2 == x._2)) ++
          ch.filter(_._5 == "I").map(c => (c._1, c._2, c._3, c._4))
        val after = live.toDF("k", "id", "ts", "v")
        state = IncrementalAgg.applyChangelog(state, batch, after,
          Seq("k"), day, "ts", "v", "op").localCheckpoint()
        ()
      }.start()
    // batch 1: delete group 1's max, insert a new group
    in.addData((1L, 11L, ts0, 9.0, "D"), (3L, 30L, ts0, 4.0, "I"))
    q.processAllAvailable()
    // batch 2: delete ALL of group 2, add more to group 3
    in.addData((2L, 20L, ts0, 7.0, "D"), (3L, 31L, ts0, 6.0, "I"))
    q.processAllAvailable()
    q.stop()
    val incr = IncrementalAgg.rollup(state, Seq("k"))
    val rebuild = IncrementalAgg.rollup(IncrementalAgg.partials(
      live.toDF("k", "id", "ts", "v"), Seq("k"), day(col("ts")), "v"), Seq("k"))
    assertSameRows(incr, rebuild)
    val got = incr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 3L -> 2L), "group 2 left; group 3 entered")
  }

  test("replay split invariance: epoch-aligned micro-batch boundaries cannot change verdicts") {
    // the q238/q239/q240 replay-gate contract: as long as batch splits
    // align with epochs (no window straddles a boundary), the SPLIT
    // choice must be invisible — one batch, three batches, identical
    // output. 180 events for key 7 over three 60s epochs.
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val events = (0 until 180).map { i =>
      (7L, ts(i.toLong), i.toLong, 5.0 + (i * 37 % 21 - 10) / 10.0 +
        (if (i == 150) 40.0 else 0.0)) // one spike for the anomaly gate
    }
    val splits: Seq[Seq[Seq[(Long, java.sql.Timestamp, Long, Double)]]] = Seq(
      Seq(events),                                  // single batch
      Seq(events.take(60), events.slice(60, 120), events.drop(120))) // per-epoch
    def runQuota(batches: Seq[Seq[(Long, java.sql.Timestamp, Long, Double)]]) = {
      val in = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
      val gate = StreamingSync.quotaPerKey(
        in.toDF().toDF("k", "ts", "id", "v"), "k", "ts", "id",
        epochSec = 60, quota = 10)
        .toDF("k", "id", "epoch", "admitted")
      val name = s"split_q_${System.nanoTime()}"
      val q = gate.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val out = spark.table(name).select("id", "epoch", "admitted")
        .as[(Long, Long, Boolean)].collect().toSet
      spark.catalog.dropTempView(name)
      out
    }
    def runAnomaly(batches: Seq[Seq[(Long, java.sql.Timestamp, Long, Double)]]) = {
      val in = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
      val gate = StreamingSync.anomalyPerKey(
        in.toDF().toDF("k", "ts", "id", "v"), "k", "ts", "id", "v",
        lookback = 100, minN = 30, z = 3.0)
        .toDF("k", "sec", "id", "value", "n_base")
      val name = s"split_a_${System.nanoTime()}"
      val q = gate.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val out = spark.table(name).select("id", "value", "n_base")
        .as[(Long, Double, Long)].collect().toSet
      spark.catalog.dropTempView(name)
      out
    }
    val quotas = splits.map(runQuota)
    assert(quotas(0) == quotas(1), "quota verdicts moved with the batch split")
    assert(quotas(0).exists(!_._3) && quotas(0).exists(_._3),
      "fixture must exercise both admit and reject")
    val anomalies = splits.map(runAnomaly)
    assert(anomalies(0) == anomalies(1), "anomaly flags moved with the batch split")
    assert(anomalies(0).exists(_._1 == 150L), "the spike must flag")
  }

  test("transformWithState sessions: inline close, timer close, gap-tie merge") {
    // the TWS processor's three emission paths under one run:
    //  - an in-batch gap closes the earlier session INLINE (emitted in
    //    the same micro-batch, before any watermark movement);
    //  - a session extending across batches deletes + re-registers its
    //    timer (no premature expiry from the stale first-batch timer);
    //  - the watermark firing the timer emits the tail session once;
    //  - an event at EXACTLY last+gap merges (closure needs strict >).
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val sessions = StreamingSync.sessionizeTws(
        in.toDS(), gapMinutes = 30, watermark = "30 minutes").toDF()
      val q = sessions.writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      def rows = spark.table("tws_out")
        .select("user_id", "start_sec", "end_sec", "n_events", "id_sum")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      def sec(s: String) = ts(s).getTime / 1000L
      // batch 1: user 7 bursts at 10:00/10:30 (exactly-gap tie: merges),
      // then 12:00 — the >gap jump closes the first session INLINE
      in.addData(
        (7L, ts("2024-01-01 10:00:00"), 10L),
        (7L, ts("2024-01-01 10:30:00"), 20L),
        (7L, ts("2024-01-01 12:00:00"), 40L))
      q.processAllAvailable()
      assert(rows.toSeq == Seq((7L, sec("2024-01-01 10:00:00"),
        sec("2024-01-01 10:30:00"), 2L, 30L)),
        s"inline close expected one tied session, got ${rows.toSeq}")
      // batch 2: 12:20 extends the open 12:00 session across the batch
      // boundary (its batch-1 timer at 12:30 must NOT fire first —
      // watermark is only 11:30 here)
      in.addData((7L, ts("2024-01-01 12:20:00"), 80L))
      q.processAllAvailable()
      assert(rows.length == 1, s"stale timer fired early: ${rows.toSeq}")
      // sentinel pair advances the watermark past 12:50 -> timer fires
      in.addData((99L, ts("2024-01-02 00:00:00"), 0L))
      q.processAllAvailable()
      in.addData((99L, ts("2024-01-03 00:00:00"), 0L))
      q.processAllAvailable()
      q.stop()
      val fin = rows.filter(_._1 == 7L)
      assert(fin.toSeq == Seq(
        (7L, sec("2024-01-01 10:00:00"), sec("2024-01-01 10:30:00"), 2L, 30L),
        (7L, sec("2024-01-01 12:00:00"), sec("2024-01-01 12:20:00"), 2L, 120L)),
        s"timer close mismatch: ${fin.toSeq}")
    } finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }

  test("transformWithState sessions: cross-batch LATE events (within " +
      "watermark) merge backward or detach as an earlier session") {
    // A later batch may deliver an event OLDER than the open session's
    // start (watermark permitting). Two shapes must match exact
    // gap-sessionization semantics:
    //  - user 5: late 11:50 lands within gap of the open 12:00 session
    //    -> merges and moves start_sec BACKWARD;
    //  - user 6: late 10:30 is farther back than the gap -> a separate
    //    EARLIER session, closed inline, leaving the 12:00 one open.
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val sessions = StreamingSync.sessionizeTws(
        in.toDS(), gapMinutes = 30, watermark = "2 hours").toDF()
      val name = s"tws_late_${System.nanoTime()}"
      val q = sessions.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      def sec(s: String) = ts(s).getTime / 1000L
      def rows = spark.table(name)
        .select("user_id", "start_sec", "end_sec", "n_events", "id_sum")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      in.addData(
        (5L, ts("2024-01-01 12:00:00"), 1L),
        (6L, ts("2024-01-01 12:00:00"), 1L))
      q.processAllAvailable() // watermark now 10:00 (2h delay)
      in.addData(
        (5L, ts("2024-01-01 11:50:00"), 2L), // within gap of open start
        (6L, ts("2024-01-01 10:30:00"), 2L)) // > gap before open start
      q.processAllAvailable()
      assert(rows.toSeq == Seq((6L, sec("2024-01-01 10:30:00"),
        sec("2024-01-01 10:30:00"), 1L, 2L)),
        s"detached earlier session should close inline, got ${rows.toSeq}")
      // advance the watermark so the open sessions' timers fire
      in.addData((99L, ts("2024-01-02 00:00:00"), 0L))
      q.processAllAvailable()
      in.addData((99L, ts("2024-01-03 00:00:00"), 0L))
      q.processAllAvailable()
      q.stop()
      val fin = rows.filter(r => r._1 == 5L || r._1 == 6L)
      spark.catalog.dropTempView(name)
      assert(fin.toSeq == Seq(
        (5L, sec("2024-01-01 11:50:00"), sec("2024-01-01 12:00:00"), 2L, 3L),
        (6L, sec("2024-01-01 10:30:00"), sec("2024-01-01 10:30:00"), 1L, 2L),
        (6L, sec("2024-01-01 12:00:00"), sec("2024-01-01 12:00:00"), 1L, 1L)),
        s"late-merge mismatch: ${fin.toSeq}")
    } finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }
}
