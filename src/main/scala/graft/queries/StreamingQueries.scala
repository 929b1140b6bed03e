package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryShared._

/** Deterministic-replay gates that drive the REAL Structured Streaming
  * path (MemoryStream -> flatMapGroupsWithState -> memory sink) under
  * the DuckDB oracle — not the operators' batch twins. The replay
  * discipline that makes a streaming run oracle-checkable:
  *
  *  - the events fixture feeds in EVENT-TIME order as day-ranged
  *    micro-batches, so no window/epoch ever straddles a batch and the
  *    stream's closed-state accounting cannot diverge from the batch
  *    formulation the oracle computes;
  *  - the driver-side collect is the replay HARNESS (production reads
  *    Kafka) — all state, ordering, and verdict logic runs inside the
  *    streaming engine, and the feed is capped by a loud require;
  *  - each run gets a fresh memory-sink name (Bench runs a query twice
  *    in one JVM) and the tiny aggregated result is localCheckpoint-ed
  *    so the sink and temp view can be dropped before returning.
  *
  * Reference basis: the reference syncs record streams batch-at-a-time
  * (`lib/airtable_sync.py` full-table pulls); these gates cover the
  * beyond-parity continuous-ingest surface (SURVEY §2.9).
  */
private[graft] object StreamingQueries {

  private val memNonce = new java.util.concurrent.atomic.AtomicInteger(0)
  /** pid@host, sanitized — distinguishes overlapping JVMs' checkpoints
    * (the same reason QueryShared.scratchPath embeds it). */
  private val procNonce =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .replaceAll("[^A-Za-z0-9]", "_")

  /** event_type -> integer key code, mirrored verbatim in the oracles
    * (the streaming state ops key by integral columns). */
  private def typeCode = when(col("event_type") === "click", 0L)
    .when(col("event_type") === "error", 1L)
    .when(col("event_type") === "purchase", 2L)
    .when(col("event_type") === "signup", 3L)
    .when(col("event_type") === "view", 4L)

  private val typeCodeSql =
    """CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
      |    WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4
      |  END""".stripMargin
  private val typeInSql =
    "event_type IN ('click', 'error', 'purchase', 'signup', 'view')"

  /** Split replay rows into at most `nBatches` day-ranged micro-batches
    * (32/nBatches-day spans from the minimum day) — deterministic,
    * event-time ordered, epoch-aligned. Two batches suffice to exercise
    * cross-batch state; four stress it harder — but every data batch
    * costs a full engine micro-batch (plus a watermark-triggered
    * no-data batch on watermarked gates), so the heavier replays run
    * at two. */
  private def dayBatches[T](rows: Array[T], tsOf: T => java.sql.Timestamp,
      nBatches: Int = 4): Seq[Seq[T]] = {
    require(rows.nonEmpty, "streaming replay needs a non-empty fixture")
    require(rows.length <= 2000000,
      s"${rows.length} rows exceed the driver-feed replay cap")
    require(nBatches == 2 || nBatches == 4, s"unsupported nBatches $nBatches")
    val span = 32L / nBatches
    def day(t: java.sql.Timestamp): Long = Math.floorDiv(t.getTime, 86400000L)
    val d0 = rows.iterator.map(r => day(tsOf(r))).min
    rows.groupBy(r => math.min((day(tsOf(r)) - d0) / span, nBatches - 1L))
      .toSeq.sortBy(_._1).map(_._2.toSeq)
  }

  /** Run `body` with shuffle partitions pinned to 4 for a replay
    * stream's lifetime, restoring the session conf after: a stateful
    * stream inherits shuffle partitions at start(), and the replays key
    * by a handful of codes (or a few thousand windows), so the session's
    * 32 would mostly spin empty state-store tasks per micro-batch —
    * each state-store instance pays per-batch instantiate/commit file
    * I/O, and a stream-stream join carries FOUR stores per partition,
    * so partition count is the dominant fixed cost of a replay (8 -> 4
    * cut the join replay's wall time ~40% with identical results).
    * Result rows are partition-count-invariant (DeterminismSpec's
    * engine-wide contract). */
  private def withReplayPartitions[A](s: SparkSession)(body: => A): A = {
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = s.conf.get(noData)
    // 4 -> 2 (round 13): ProfileReplay reads ~10-15% off both the pure-
    // machinery and data-batch shapes — the per-partition state-store
    // instantiate/commit is the dominant fixed cost and the replays key
    // by a handful of codes, so 2 partitions still exercises multi-
    // partition state while halving the store count. Results are
    // partition-count-invariant (DeterminismSpec).
    s.conf.set("spark.sql.shuffle.partitions", "2")
    val retain = "spark.sql.streaming.minBatchesToRetain"
    val prevRetain = s.conf.getOption(retain)
    // replays never restart from an old batch: retain the minimum
    // checkpoint history instead of the 100-batch default (less
    // per-commit file churn in the state store)
    s.conf.set(retain, "2")
    // every micro-batch costs ~0.3-0.5s of pure machinery (re-plan +
    // state-store instantiate/commit + offset/commit WAL — measured by
    // ProfileReplay: a 40-row 4-batch replay pays 2.2s), and a
    // watermarked gate fires a NO-DATA batch after every data batch.
    // The replays don't rely on them: watermark-closed emissions are
    // forced deterministically by sentinel DATA batches (q242's
    // discipline), so the no-data batches are pure fixed cost here.
    // Scoped set+restore; the oracle gates pin the results unchanged.
    s.conf.set(noData, "false")
    // whole-stage codegen compiles a fresh Janino class per gate per
    // micro-batch plan — several hundred ms of the FIRST batch of every
    // replay, pure overhead for the family's tiny per-batch row counts
    // (interpreted execution of a 10-row batch is faster than compiling
    // its perfect loop). Scoped set+restore like the rest; results are
    // identical by construction (codegen is an execution strategy, not
    // semantics — DeterminismSpec pins the family's outputs).
    val ws = "spark.sql.codegen.wholeStage"
    val prevWs = s.conf.get(ws)
    s.conf.set(ws, "false")
    try body finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.conf.set(noData, prevNoData)
      s.conf.set(ws, prevWs)
      prevRetain match {
        case Some(v) => s.conf.set(retain, v)
        case None => s.conf.unset(retain)
      }
    }
  }

  /** Run `gate` (a streaming frame fed by `in`) over the batched feed
    * in update mode, then hand the caller's aggregation of the memory
    * sink back MATERIALIZED, so sink and temp view can be dropped
    * before returning.
    *
    * REPLAY CONTRACT (applies to every gate driven under
    * [[withReplayPartitions]], including the hand-rolled ones below
    * that don't go through this helper): no-data micro-batches are
    * DISABLED for the whole family, so a watermark-closed emission
    * (append-mode window close, event-time timeout) happens only when
    * a LATER DATA batch advances the watermark past it. Every replay's
    * final emission must therefore be forced by a sentinel DATA batch
    * (q242's discipline) — a gate relying on a trailing no-data batch
    * after its last data batch will silently emit fewer rows. The
    * day-ranged batching satisfies this for closed-window gates (each
    * batch's data closes the previous batch's windows); gates whose
    * LAST window must close append an explicit sentinel event past the
    * horizon. */
  private def replay[T](s: SparkSession,
      in: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T],
      gate: DataFrame, batches: Seq[Seq[T]])(
      finish: DataFrame => DataFrame): DataFrame = withReplayPartitions(s) {
    val mem = s"graft_stream_replay_${memNonce.incrementAndGet()}"
    // explicit checkpoint on the scratch root (tmpfs when available):
    // a Spark-generated temp checkpoint lands under java.io.tmpdir, and
    // the per-batch checkpoint + state-store file I/O there is the
    // replay family's dominant fixed cost. The name carries a PROCESS
    // nonce on top of the per-JVM counter — the driver runs Verify and
    // Bench as overlapping JVMs, and a shared counter-only path would
    // let one replay resume the other's WAL. Deleted on completion —
    // replays are one-shot, never restarted.
    val ckpt = new java.io.File(QueryShared.scratchRoot,
      s"${mem}_$procNonce")
    val q = gate.writeStream.format("memory").queryName(mem)
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // materialize the (tiny) result BEFORE the sink goes away
      finish(s.table(mem)).localCheckpoint()
    } finally {
      q.stop()
      s.catalog.dropTempView(mem)
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- streaming admission quota, replay-gated (§2.9) ------------
    "q238_stream_quota_replay" -> ((s, dir) => {
      // q164's per-(type, day) 5-event budget driven through the REAL
      // streaming gate (StreamingSync.quotaPerKey): per-event verdicts
      // accumulate in the memory sink across four epoch-aligned
      // micro-batches; the oracle recomputes them as the row_number
      // twin. admitted_id_sum pins WHICH events admitted (first five by
      // event time), not just how many.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = memoFeed("q238_rows_feed", dir) { rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("event_id").isNotNull &&
          typeCode.isNotNull)
        .select(typeCode.as("k"), col("ts"), col("event_id").cast("long").as("id"))
        .as[(Long, java.sql.Timestamp, Long)]
        .collect() }
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Long)]
      val gate = graft.streaming.StreamingSync.quotaPerKey(
          in.toDF().toDF("k", "ts", "id"), "k", "ts", "id",
          epochSec = 86400L, quota = 5L)
        .toDF("type_code", "id", "epoch", "admitted")
      replay(s, in, gate, dayBatches[(Long, java.sql.Timestamp, Long)](rows, _._2)) { t =>
        t.groupBy("type_code", "epoch")
          .agg(sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
            sum(when(col("admitted"), 0L).otherwise(1L)).as("n_rejected"),
            sum(when(col("admitted"), col("id")).otherwise(0L))
              .as("admitted_id_sum"))
          .filter(col("n_rejected") > 0)
          .orderBy("type_code", "epoch")
      }
    }),


    // ----- DSv2 streaming source under the oracle (§2.1 x §2.9) ------
    "q241_stream_source_replay" -> ((s, dir) => {
      // the graft-records MICRO_BATCH_READ path end-to-end: the customer
      // fixture is written through the source's own staged-commit WRITE
      // in two appends, and a streaming read tails the directory across
      // both (first trigger sees slice one, second trigger sees ONLY the
      // newly committed files); the streamed rows must aggregate to the
      // plain SQL over customer. Fresh checkpoint + sink per run (the
      // bench times each query twice in one JVM).
      import org.apache.hadoop.fs.Path
      val base = scratchPath(dir, "q241_records")
      val run = memNonce.incrementAndGet()
      val ckpt = s"${base}_ckpt_$run"
      val fs = new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      fs.delete(new Path(ckpt), true)
      val cust = rd(s, dir, "customer").select(
        col("c_custkey").cast("string").as("_record_id"),
        col("c_acctbal").cast("double").as("c_acctbal"),
        col("c_mktsegment").cast("string").as("c_mktsegment"))
      def append(df: DataFrame): Unit = df.write.format("graft-records")
        .option("path", base).mode("append").save()
      append(cust.filter(col("c_mktsegment") < "F"))
      val stream = s.readStream.format("graft-records")
        .option("path", base)
        .option("fieldTypes", "c_acctbal:number,c_mktsegment:singleLineText")
        .load()
      val mem = s"graft_stream_src_$run"
      val q = stream.select("c_mktsegment", "c_acctbal")
        .writeStream.format("memory").queryName(mem).outputMode("append")
        .option("checkpointLocation", ckpt).start()
      try {
        q.processAllAvailable()
        append(cust.filter(col("c_mktsegment") >= "F"))
        q.processAllAvailable()
        s.table(mem).groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
              .as("sum_bal"))
          .orderBy("c_mktsegment")
          .localCheckpoint()
      } finally {
        q.stop()
        s.catalog.dropTempView(mem)
      }
    }),


    // ----- watermarked window finalization + late-drop (§2.9) --------
    "q242_stream_watermark_replay" -> ((s, dir) => {
      // q31's hourly windows driven through the WATERMARKED append-mode
      // streaming path, with both watermark behaviors under the oracle:
      // (1) a LATE row (global-min timestamp replayed in the final data
      // batch, hours behind the watermark) must be DROPPED — the oracle
      // aggregates the original table only, so a leak would break the
      // hash; (2) window FINALIZATION is forced deterministically by two
      // far-future sentinel batches (the second batch's watermark closes
      // every real window during a DATA batch — no reliance on no-data
      // micro-batch timing), so every real window emits exactly once.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = memoFeed("q242_rows_feed", dir) { rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("event_type").isNotNull &&
          col("value").isNotNull)
        .select(col("ts"), col("event_type"),
          col("value").cast("double").as("value"))
        .as[(java.sql.Timestamp, String, Double)]
        .collect() }
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, String, Double)]
      val gate = graft.streaming.StreamingSync.windowedCounts(
          in.toDF().toDF("ts", "event_type", "value"),
          "1 hour", "2 hours")
        .select(unix_timestamp(col("window.start")).as("hour_start"),
          col("event_type"), col("n"), col("total_value"))
      withReplayPartitions(s) {
      val mem = s"graft_stream_wm_${memNonce.incrementAndGet()}"
      val q = gate.writeStream.format("memory").queryName(mem)
        .outputMode("append").start()
      try {
        val batches = dayBatches[(java.sql.Timestamp, String, Double)](rows, _._1)
        batches.init.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        val minTs = rows.iterator.map(_._1.getTime).min
        val maxTs = rows.iterator.map(_._1.getTime).max
        // final data batch carries the LATE replay of the oldest event —
        // hours behind the watermark by now, it must not reopen its
        // window (only meaningful once earlier batches set the watermark)
        val late =
          if (batches.size >= 2)
            Seq((new java.sql.Timestamp(minTs), "click", 1.0)) else Seq.empty
        in.addData(batches.last ++ late: _*)
        q.processAllAvailable()
        // sentinel pair: the second batch processes under a watermark
        // that closes every real window, flushing them as DATA-batch
        // output (sentinel windows themselves stay open and never emit)
        in.addData((new java.sql.Timestamp(maxTs + 86400000L), "sentinel", 0.0))
        q.processAllAvailable()
        in.addData((new java.sql.Timestamp(maxTs + 90000000L), "sentinel", 0.0))
        q.processAllAvailable()
        s.table(mem)
          .filter(col("event_type") =!= "sentinel")
          .select("hour_start", "event_type", "n", "total_value")
          .orderBy("hour_start", "event_type")
          .localCheckpoint()
      } finally {
        q.stop()
        s.catalog.dropTempView(mem)
      }
      }
    }),


    // ----- streaming per-key EMA, replay-gated (§2.9) ----------------
    "q240_stream_ema_replay" -> ((s, dir) => {
      // q66's order-sensitive sequential fold driven through the REAL
      // streaming path (StreamingSync.emaPerKey, mapGroupsWithState,
      // O(1) state per key): each micro-batch emits the running
      // (ema, n) per touched key; the FINAL state per key is the row
      // with the maximum cumulative n (strictly increasing), and it
      // must equal the oracle's whole-history list_reduce fold
      // bit-for-bit — same IEEE op chain, same (ts, id) order (the
      // fixture has no (user, ts) ties at any SF, so the stream's
      // value-tiebreak never fires).
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = memoFeed("q240_rows_feed", dir) { rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("value").isNotNull &&
          col("user_id").isNotNull)
        .select(col("user_id").cast("long").as("k"), col("ts"),
          col("value").cast("double").as("v"))
        .as[(Long, java.sql.Timestamp, Double)]
        .collect() }
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Double)]
      val gate = graft.streaming.StreamingSync.emaPerKey(
          in.toDF().toDF("k", "ts", "v"), "k", "ts", "v", alpha = 0.5)
        .toDF("user_id", "ema", "n_events")
      replay(s, in, gate,
        dayBatches[(Long, java.sql.Timestamp, Double)](rows, _._2)) { t =>
        t.groupBy("user_id")
          .agg(max(struct(col("n_events"), col("ema"))).as("fin"))
          .select(col("user_id"), col("fin.n_events").as("n_events"),
            col("fin.ema").as("ema"))
          .orderBy("user_id")
      }
    }),


    // ----- streaming funnel state machine, replay-gated (§2.9) -------
    "q245_stream_funnel_replay" -> ((s, dir) => {
      // q70's strict-order view->click->purchase funnel driven through
      // the REAL streaming state machine (funnelPerKey,
      // mapGroupsWithState, O(1) state per key): each batch emits the
      // running stage per touched key; the FINAL stage per key (stages
      // are monotone) must bucket users exactly as the oracle's
      // earliest-occurrence chaining does (provably the same as the
      // greedy fold). The replay covers the corpus's FIRST DAY only (a
      // month leaves every user at stage 3 — no discrimination), fed as
      // four 6-hour micro-batches, and the per-stage user-id sum pins
      // WHICH users landed in each bucket.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val all = rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull &&
          col("event_type").isNotNull)
        .select(col("user_id").cast("long").as("k"), col("ts"),
          col("event_type").cast("string").as("et"))
      val rows = memoFeed("q245_rows_feed", dir) { all
        .withColumn("_day", floor(col("ts").cast("long") / 86400))
        .filter(col("_day") === all.agg(
          min(floor(col("ts").cast("long") / 86400))).head().getLong(0))
        .drop("_day")
        .as[(Long, java.sql.Timestamp, String)]
        .collect() }
      require(rows.nonEmpty && rows.length <= 2000000, "bad replay fixture")
      // fixture-assumption guard (round-8 advice): the oracle's strict
      // `ts >` chaining assumes no (user, ts) ties among funnel-STEP
      // events — check it on the already-collected feed instead of
      // trusting the generator (a regenerated fixture with ties would
      // diverge silently: engine tie-breaks by type, oracle drops)
      locally {
        val steps = Set("view", "click", "purchase")
        val stepKeys = rows.iterator.filter(r => steps(r._3))
          .map(r => (r._1, r._2)).toArray
        require(stepKeys.distinct.length == stepKeys.length,
          "events fixture has (user_id, ts) ties among funnel steps in " +
            "the replay slice — q245's strict-inequality oracle assumes " +
            "tie-freedom")
      }
      val h0 = rows.iterator.map(_._2.getTime).min
      val batches = rows
        .groupBy(r => math.min((r._2.getTime - h0) / 21600000L, 3L))
        .toSeq.sortBy(_._1).map(_._2.toSeq)
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, String)]
      val gate = graft.streaming.StreamingSync.funnelPerKey(
          in.toDF().toDF("k", "ts", "et"), "k", "ts", "et",
          steps = Seq("view", "click", "purchase"))
        .toDF("user_id", "stage")
      replay(s, in, gate, batches) { t =>
        t.groupBy("user_id").agg(max(col("stage")).as("funnel_stage"))
          .groupBy("funnel_stage")
          .agg(count(lit(1)).as("n_keys"), sum(col("user_id")).as("uid_sum"))
          .orderBy("funnel_stage")
      }
    }),


    // ----- streaming rolling anomaly, replay-gated (§2.9) ------------
    "q239_stream_anomaly_replay" -> ((s, dir) => {
      // q158's trailing-100 3-sigma gate driven through the REAL
      // streaming path (StreamingSync.anomalyPerKey): O(lookback) state
      // per key, decimal-snapped moments identical to the batch
      // operator's DECIMAL route, so for this in-order replay the
      // stream must flag EXACTLY the oracle's rows. Timestamps feed at
      // WHOLE-SECOND granularity because the batch/oracle frame orders
      // by (sec, id) — sub-second bits would give the stream a finer
      // order than the oracle's window can express.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = memoFeed("q239_rows_feed", dir) { rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("event_id").isNotNull &&
          col("value").isNotNull && typeCode.isNotNull)
        .select(typeCode.as("k"),
          col("ts").cast("long").cast("timestamp").as("ts"),
          col("event_id").cast("long").as("id"),
          col("value").cast("double").as("v"))
        .as[(Long, java.sql.Timestamp, Long, Double)]
        .collect() }
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
      val gate = graft.streaming.StreamingSync.anomalyPerKey(
          in.toDF().toDF("k", "ts", "id", "v"), "k", "ts", "id", "v",
          lookback = 100, minN = 30, z = 3.0)
        .toDF("key", "sec", "id", "value", "n_base")
      replay(s, in, gate,
        dayBatches[(Long, java.sql.Timestamp, Long, Double)](rows, _._2)) { t =>
        t.select("key", "sec", "id", "value", "n_base")
          .orderBy("key", "sec", "id")
      }
    }),


    // ----- streaming trailing-window rolling stats (§2.9) ------------
    "q248_stream_rolling_replay" -> ((s, dir) => {
      // StreamingSync.rollingPerKeyStream driven through the REAL
      // mapGroupsWithState path: per user, a second-bucketed
      // (count, sum) map capped at the trailing hour. Values feed as
      // floor(value*100) — integer-valued doubles, so the bucket
      // partial sums are EXACT in any fold order and the stream's
      // final (n, sum) must equal the oracle's batch aggregation over
      // [max_sec - 3599, max_sec] bit-for-bit. The final state per key
      // is the (window_end, n, sum)-lexicographic max across the
      // update-mode sink rows: window_end is monotone per key, and
      // within one window_end n only grows (every fold that changes
      // state folds >= 1 retained event).
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = memoFeed("q248_rows_feed", dir) { rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull &&
          col("value").isNotNull)
        .select(col("user_id").cast("long").as("k"), col("ts"),
          floor(col("value").cast("double") * 100).as("v"))
        .as[(Long, java.sql.Timestamp, Double)]
        .collect() }
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Double)]
      val gate = graft.streaming.StreamingSync.rollingPerKeyStream(
          in.toDF().toDF("k", "ts", "v"), "k", "ts", "v", windowSec = 3600L)
        .toDF("user_id", "window_end_sec", "n_win", "sum_win")
      replay(s, in, gate,
        dayBatches[(Long, java.sql.Timestamp, Double)](rows, _._2)) { t =>
        t.groupBy("user_id")
          .agg(max(struct(col("window_end_sec"), col("n_win"),
            col("sum_win"))).as("fin"))
          .select(col("user_id"),
            col("fin.window_end_sec").as("window_end_sec"),
            col("fin.n_win").as("n_win"),
            col("fin.sum_win").cast("long").as("sum_win"))
          .orderBy("user_id")
      }
    }),


    // ----- streaming per-key HLL distinct-count (§2.9 x sketches) ----
    "q249_stream_hll_replay" -> ((s, dir) => {
      // StreamingSync.hllPerKey driven through the REAL streaming state
      // path: one 256-byte register array per event-type key, updated
      // per event with the portable md5-prefix60 arithmetic, so the
      // running estimate must agree with the q146-family SQL
      // reconstruction register-for-register. The n_est > 1500 filter
      // keeps every gated key on the RAW estimate branch on both
      // engines — the small-range correction is m*ln(m/V) with raw <=
      // 640, whose value is bounded by 256*ln(256) ~= 1419.6, so any
      // value above 1500 was provably computed libm-free (the q189
      // discipline; at sf0.001 all keys fall below the filter and the
      // gate is vacuous there, by design). Final row per key = max
      // n_events (the seen-counter is strictly increasing per fold).
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = memoFeed("q249_rows_feed", dir) { rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("event_id").isNotNull &&
          typeCode.isNotNull)
        .select(typeCode.as("k"), col("ts"),
          col("event_id").cast("string").as("v"))
        .as[(Long, java.sql.Timestamp, String)]
        .collect() }
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, String)]
      val gate = graft.streaming.StreamingSync.hllPerKey(
          in.toDF().toDF("k", "ts", "v"), "k", "v")
        .toDF("type_code", "n_est", "n_events")
      replay(s, in, gate,
        dayBatches[(Long, java.sql.Timestamp, String)](rows, _._2)) { t =>
        t.groupBy("type_code")
          .agg(max(struct(col("n_events"), col("n_est"))).as("fin"))
          .select(col("type_code"), col("fin.n_est").as("n_est"),
            col("fin.n_events").as("n_events"))
          .filter(col("n_est") > 1500)
          .orderBy("type_code")
      }
    }),


    // ----- gap-based session windows, watermark-closed (§2.9) --------
    "q250_stream_session_replay" -> ((s, dir) => {
      // StreamingSync.sessionize (the BUILT-IN session_window operator,
      // Spark-managed merging state) under the oracle: per-user sessions
      // close when the watermark passes last_event + 30min and emit
      // exactly once in append mode. Closure is forced by the q242
      // sentinel-pair discipline (the second sentinel batch processes
      // under a watermark that closes every real session). The oracle
      // re-derives sessions with lag/gap chaining — exact INTERVAL
      // arithmetic on both sides, and the fixture has no (user_id, ts)
      // ties at any SF (checked round 9), so the lag order is total.
      // total_value rides the DECIMAL(18,2) route (order-insensitive).
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = memoFeed("q250_rows_feed", dir) { rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull &&
          col("value").isNotNull)
        .select(col("user_id").cast("long").as("user_id"), col("ts"),
          col("value").cast("double").as("value"))
        .as[(Long, java.sql.Timestamp, Double)]
        .collect() }
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Double)]
      val gate = graft.streaming.StreamingSync.sessionize(
          in.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30)
        .select(col("user_id"),
          unix_timestamp(col("start_ts")).as("start_sec"),
          unix_timestamp(col("end_ts")).as("end_sec"),
          col("n_events"), col("total_value"))
      withReplayPartitions(s) {
        val mem = s"graft_stream_sess_${memNonce.incrementAndGet()}"
        val q = gate.writeStream.format("memory").queryName(mem)
          .outputMode("append").start()
        try {
          val batches =
            dayBatches[(Long, java.sql.Timestamp, Double)](rows, _._2,
              nBatches = 2)
          batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
          val maxTs = rows.iterator.map(_._2.getTime).max
          // sentinel pair (user -1 matches no real key): the second
          // batch runs under a watermark past every real session's end,
          // flushing all of them as data-batch append output
          in.addData((-1L, new java.sql.Timestamp(maxTs + 86400000L), 0.0))
          q.processAllAvailable()
          in.addData((-1L, new java.sql.Timestamp(maxTs + 90000000L), 0.0))
          q.processAllAvailable()
          s.table(mem)
            .filter(col("user_id") >= 0)
            .select("user_id", "start_sec", "end_sec", "n_events",
              "total_value")
            .orderBy("user_id", "start_sec")
            .localCheckpoint()
        } finally {
          q.stop()
          s.catalog.dropTempView(mem)
        }
      }
    }),


    // ----- streaming JOIN IVM through foreachBatch (§2.9 x q286) -----
    "q288_stream_join_ivm_replay" -> ((s, dir) => {
      // q286's signed join maintenance driven through the REAL
      // streaming path: a two-sided changelog (inserts AND -1
      // retractions on both sides) arrives as two micro-batches, and
      // each batch applies the bilinear delta rule against the
      // PRE-BATCH sides inside foreachBatch — never a rescan of the
      // joined state. The oracle joins the net final sides; a delta
      // applied against the wrong side version flips a decimal sum.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import graft.operators.IncrementalAgg.{consolidate, joinDelta}
      val orders = rd(s, dir, "orders").select(
        col("o_custkey").cast("long").as("k"),
        col("o_orderkey").cast("long").as("okey"),
        col("o_totalprice").cast("double").as("price"))
      val cust = rd(s, dir, "customer").select(
        col("c_custkey").cast("long").as("k"), col("c_mktsegment").as("seg"))
      // changelog rows: (side, k, okey, price, seg, m) — payload fields
      // are only read on their own side
      def lRow(m: Long)(df: DataFrame) = df.select(lit("L").as("side"),
        col("k"), col("okey"), col("price"), lit("-").as("seg"),
        lit(m).as("m"))
      def rRow(m: Long)(df: DataFrame) = df.select(lit("R").as("side"),
        col("k"), lit(-1L).as("okey"), lit(0.0).as("price"), col("seg"),
        lit(m).as("m"))
      val wave1 = lRow(1L)(orders.filter(col("okey") % 3 < 2))
        .unionByName(rRow(1L)(cust.filter(col("k") % 2 === 0)))
      val wave2 = lRow(1L)(orders.filter(col("okey") % 3 === 2))
        .unionByName(lRow(-1L)(orders.filter(col("okey") % 7 === 0)))
        .unionByName(rRow(1L)(cust.filter(col("k") % 2 === 1)))
        .unionByName(rRow(-1L)(cust.filter(col("k") % 5 === 0)))
      val waves = memoFeed("q288_waves_feed", dir) { Seq(wave1, wave2).map(
        _.as[(String, Long, Long, Double, String, Long)].collect().toSeq) }
      require(waves.forall(w => w.nonEmpty && w.length <= 2000000),
        "bad replay fixture")
      val empty = lRow(1L)(orders).limit(0)
      var stL = empty.select("k", "okey", "price", "m").localCheckpoint()
      var stR = empty.select("k", "seg", "m").localCheckpoint()
      var stJ = joinDelta(stL, stR.limit(0), stL.limit(0), stR, Seq("k"))
        .localCheckpoint()
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long, Long, Double, String, Long)]
      withReplayPartitions(s) {
        val q = in.toDF().toDF("side", "k", "okey", "price", "seg", "m")
          .writeStream.outputMode("append")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val b = batch.localCheckpoint()
            val dL = b.filter(col("side") === "L")
              .select("k", "okey", "price", "m")
            val dR = b.filter(col("side") === "R").select("k", "seg", "m")
            stJ = consolidate(stJ.unionByName(
              joinDelta(stL, stR, dL, dR, Seq("k")))).localCheckpoint()
            stL = consolidate(stL.unionByName(dL)).localCheckpoint()
            stR = consolidate(stR.unionByName(dR)).localCheckpoint()
            ()
          }.start()
        try {
          waves.foreach { w => in.addData(w: _*); q.processAllAvailable() }
        } finally q.stop()
      }
      stJ.groupBy(col("seg").as("segment"))
        .agg(sum(col("m")).as("n_rows"),
          sum((col("m") * col("price")).cast("decimal(28,2)"))
            .cast("double").as("sum_price"))
        .orderBy("segment")
    }),


    // ----- transformWithState sessionization (§2.9 x Spark-4 TWS) ----
    "q276_stream_tws_replay" -> ((s, dir) => {
      // StreamingSync.sessionizeTws — the Spark 4 transformWithState
      // API (typed ValueState + event-time TIMERS) under the oracle.
      // Sessions close inline on in-batch gaps and via watermark-fired
      // timers at batch boundaries; the q250 sentinel pair flushes the
      // final open sessions. id_sum pins WHICH events joined each
      // session, and end_sec is the inclusive last-event second the
      // built-in session_window cannot emit. Runs on the RocksDB state
      // store provider (TWS requires it), restored after the replay.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = memoFeed("q276_rows_feed", dir) { rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull &&
          col("event_id").isNotNull)
        .select(col("user_id").cast("long").as("user_id"), col("ts"),
          col("event_id").cast("long").as("id"))
        .as[(Long, java.sql.Timestamp, Long)]
        .collect() }
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Long)]
      val gate = graft.streaming.StreamingSync.sessionizeTws(
          in.toDS(), gapMinutes = 30, watermark = "30 minutes")
        .toDF()
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = s.conf.getOption(provKey)
      s.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try withReplayPartitions(s) {
        val mem = s"graft_stream_tws_${memNonce.incrementAndGet()}"
        val q = gate.writeStream.format("memory").queryName(mem)
          .outputMode("update").start()
        try {
          val batches =
            dayBatches[(Long, java.sql.Timestamp, Long)](rows, _._2,
              nBatches = 2)
          batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
          val maxTs = rows.iterator.map(_._2.getTime).max
          // sentinel pair (user -1): the second batch runs under a
          // watermark past every real last_event + gap, firing every
          // outstanding timer as an expiry emission
          in.addData((-1L, new java.sql.Timestamp(maxTs + 86400000L), 0L))
          q.processAllAvailable()
          in.addData((-1L, new java.sql.Timestamp(maxTs + 90000000L), 0L))
          q.processAllAvailable()
          s.table(mem)
            .filter(col("user_id") >= 0)
            .select("user_id", "start_sec", "end_sec", "n_events", "id_sum")
            .orderBy("user_id", "start_sec")
            .localCheckpoint()
        } finally {
          q.stop()
          s.catalog.dropTempView(mem)
        }
      } finally prevProv match {
        case Some(p) => s.conf.set(provKey, p)
        case None => s.conf.unset(provKey)
      }
    }),


    // ----- watermarked stream-stream interval join (§2.9 x J-family) -
    "q251_stream_interval_join_replay" -> ((s, dir) => {
      // StreamingSync.streamIntervalJoin under the oracle: view events
      // join purchase events of the same user within [view, view + 1h],
      // through the REAL two-sided streaming join state. Both sides
      // feed in aligned event-time batches (shared day boundaries, so
      // neither side's watermark can outrun the other and evict state a
      // cross-batch match still needs — eviction keeps lTs > wm - after
      // by construction); inner-join output emits eagerly, so no
      // sentinel flush is needed. The oracle is the batch interval
      // self-join; the per-user id sums pin exactly WHICH pairs joined.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = memoFeed("q251_ev_feed", dir) { rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull &&
          col("event_id").isNotNull)
        .select(col("user_id").cast("long").as("u"), col("ts"),
          col("event_id").cast("long").as("id"),
          col("event_type").cast("string").as("et"))
        .as[(Long, java.sql.Timestamp, Long, String)]
        .collect() }
      val views = ev.filter(_._4 == "view").map(r => (r._1, r._2, r._3))
      val purch = ev.filter(_._4 == "purchase").map(r => (r._1, r._2, r._3))
      require(views.nonEmpty && purch.nonEmpty, "bad replay fixture")
      // shared day boundaries across BOTH sides, two data batches (the
      // heaviest replay: a stream-stream join carries four state stores
      // per partition per micro-batch)
      def day(t: java.sql.Timestamp): Long = Math.floorDiv(t.getTime, 86400000L)
      val d0 = ev.iterator.map(r => day(r._2)).min
      def split(rs: Array[(Long, java.sql.Timestamp, Long)]) =
        (0L to 1L).map(i => rs.filter(r =>
          math.min((day(r._2) - d0) / 16L, 1L) == i).toSeq)
      val (lb, rb) = (split(views), split(purch))
      val lin = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Long)]
      val rin = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Long)]
      val gate = graft.streaming.StreamingSync.streamIntervalJoin(
          lin.toDF().toDF("l_user", "l_ts", "l_id"),
          rin.toDF().toDF("r_user", "r_ts", "r_id"),
          "l_user", "r_user", "l_ts", "r_ts",
          beforeSec = 0L, afterSec = 3600L, watermark = "2 hours")
        .select(col("l_user").as("user_id"), col("l_id").as("view_id"),
          col("r_id").as("purchase_id"))
      withReplayPartitions(s) {
        val mem = s"graft_stream_ij_${memNonce.incrementAndGet()}"
        val q = gate.writeStream.format("memory").queryName(mem)
          .outputMode("append").start()
        try {
          (0 until 2).foreach { i =>
            if (lb(i).nonEmpty) lin.addData(lb(i): _*)
            if (rb(i).nonEmpty) rin.addData(rb(i): _*)
            q.processAllAvailable()
          }
          s.table(mem)
            .groupBy("user_id")
            .agg(count(lit(1)).as("n_pairs"),
              sum(col("view_id")).as("view_id_sum"),
              sum(col("purchase_id")).as("purchase_id_sum"))
            .orderBy("user_id")
            .localCheckpoint()
        } finally {
          q.stop()
          s.catalog.dropTempView(mem)
        }
      }
    }),


    // ----- streaming retraction IVM through foreachBatch (§2.9) ------
    "q252_stream_changelog_replay" -> ((s, dir) => {
      // q219's retractable rollup driven through the REAL streaming
      // path: the I/D changelog arrives as two micro-batches
      // (split by event_id parity) and each batch incrementally
      // maintains the moments state via IncrementalAgg.applyChangelog
      // inside foreachBatch — count/sum/sumsq retract algebraically,
      // extrema recompute only for touched groups. Additivity makes
      // two-batch application bit-equal to the one-shot batch twin, so
      // q219's oracle applies verbatim; the gate proves the equality
      // holds through the actual streaming engine.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = rd(s, dir, "events").filter(col("user_id") % 20 === 0)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val day = (c: org.apache.spark.sql.Column) => to_date(c)
      val dels = ev.filter(col("event_id") % 7 === 0).withColumn("op", lit("D"))
      val ins = ev.filter(col("event_id") % 11 === 0)
        .select(col("user_id"), (col("event_id") + 1000000L).as("event_id"),
          col("ts"), (col("value") * 2).as("value"))
        .withColumn("op", lit("I"))
      // post-change raw after the first n parity batches have applied
      // (ins ids keep their original parity: +1000000 is even)
      def rawAfter(n: Int): DataFrame = ev
        .filter(!(col("event_id") % 7 === 0 && col("event_id") % 2 < n))
        .unionByName(ins.drop("op").filter(col("event_id") % 2 < n))
      val ops = memoFeed("q252_ops_feed", dir) { dels.unionByName(ins)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value").cast("double").as("value"), col("op"))
        .as[(Long, Long, java.sql.Timestamp, Double, String)]
        .collect() }
      require(ops.nonEmpty && ops.length <= 2000000, "bad replay fixture")
      var state = graft.operators.IncrementalAgg.partials(
        ev, Seq("user_id"), day(col("ts")), "value").localCheckpoint()
      var applied = 0
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp, Double, String)]
      withReplayPartitions(s) {
        val q = in.toDF().toDF("user_id", "event_id", "ts", "value", "op")
          .writeStream.outputMode("append")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            applied += 1
            state = graft.operators.IncrementalAgg.applyChangelog(
              state, batch, rawAfter(applied), Seq("user_id"), day,
              "ts", "value", "op").localCheckpoint()
            ()
          }.start()
        try {
          (0 until 2).foreach { i =>
            val b = ops.filter(_._2 % 2 == i).toSeq
            if (b.nonEmpty) in.addData(b: _*)
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      graft.operators.IncrementalAgg.rollup(state, Seq("user_id"))
        .orderBy("user_id")
    }),


    // ----- streaming bloom novelty gate (§2.9 x join pre-filter) -----
    "q253_stream_bloom_gate_replay" -> ((s, dir) => {
      // StreamingSync.bloomNovelGate end-to-end: the corpus bloom
      // sketch is built once at gate start; each micro-batch of
      // incoming customers routes through might-contain, and only the
      // minority that might collide pays the exact anti-join — the
      // emitted novelty set is EXACT (a bloom filter has no false
      // negatives, the anti-join clears false positives), so the
      // oracle is the plain set difference. Batches accumulate
      // additive aggregates; the id/balance sums pin WHICH rows
      // passed.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val cust = rd(s, dir, "customer").select(
        col("c_custkey").cast("long").as("c_custkey"),
        col("c_acctbal").cast("double").as("c_acctbal"))
      val corpus = cust.filter(col("c_custkey") % 3 =!= 0)
      val rows = memoFeed("q253_rows_feed", dir) { cust.as[(Long, Double)].collect() }
      require(rows.nonEmpty && rows.length <= 2000000, "bad replay fixture")
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Double)]
      val ckpt = scratchPath(dir, s"q253_ckpt_${memNonce.incrementAndGet()}")
      val fs = new org.apache.hadoop.fs.Path(ckpt)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
      val acc = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, java.math.BigDecimal)]
      // offset ranges queued BEFORE start: AvailableNow latches the
      // available end offset at query start, drains it, and stops
      val half = rows.length / 2
      in.addData(rows.take(half).toSeq: _*)
      in.addData(rows.drop(half).toSeq: _*)
      withReplayPartitions(s) {
        val q = graft.streaming.StreamingSync.bloomNovelGate(
          in.toDF().toDF("c_custkey", "c_acctbal"), corpus, "c_custkey",
          ckpt, onNovel = { novel =>
            val r = novel.agg(count(lit(1)).as("n"),
              coalesce(sum(col("c_custkey")), lit(0L)).as("key_sum"),
              coalesce(sum(col("c_acctbal").cast("decimal(18,2)")),
                lit(0).cast("decimal(28,2)")).as("bal_sum"))
              .head()
            acc += ((r.getLong(0), r.getLong(1), r.getDecimal(2)))
            ()
          },
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        try q.awaitTermination(120000L) finally q.stop()
      }
      require(acc.nonEmpty, "bloom gate emitted no batches")
      val n = acc.map(_._1).sum
      val keySum = acc.map(_._2).sum
      // exact DECIMAL accumulation across batches; one final cast to
      // double = the oracle's CAST(sum(...) AS DOUBLE) bit-for-bit
      val balSum = acc.map(_._3).reduce(_ add _).doubleValue()
      Seq((n, keySum, balSum)).toDF("n_novel", "key_sum", "bal_sum")
    }),


    // ----- streaming near-dup admission gate (§2.9 x dedup) ----------
    "q254_stream_neardup_gate_replay" -> ((s, dir) => {
      // StreamingSync.nearDupGate end-to-end with the portable md5
      // hash family: the corpus (documents) is sketched ONCE at gate
      // start; each micro-batch of incoming docs sketches itself,
      // band-joins the corpus sketches, and exact-verifies candidates
      // — the q50 incremental-ingest shape driven through the real
      // foreachBatch gate. Incoming = the %7 near-dup variants plus
      // %13 exact copies (q50's fixture), split across two batches;
      // the oracle is q50's new-vs-corpus banded pipeline verbatim.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val base = docsBase(s, dir)
      val incoming = memoFeed("q254_incoming_feed", dir) { base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
        .unionByName(base.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 20000).as("doc_id"), col("text")))
        .as[(Long, String)].collect() }
      require(incoming.nonEmpty && incoming.length <= 2000000,
        "bad replay fixture")
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val ckpt = scratchPath(dir, s"q254_ckpt_${memNonce.incrementAndGet()}")
      val fs = new org.apache.hadoop.fs.Path(ckpt)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
      val acc = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      // queue before start: AvailableNow latches offsets at query start
      val half = incoming.length / 2
      in.addData(incoming.take(half).toSeq: _*)
      in.addData(incoming.drop(half).toSeq: _*)
      withReplayPartitions(s) {
        val q = graft.streaming.StreamingSync.nearDupGate(
          in.toDF().toDF("doc_id", "text"), base, "doc_id", "text",
          ckpt, onMatches = { m =>
            acc ++= m.select(col("new_id"), col("corpus_id"),
              col("jaccard")).collect()
            ()
          },
          k = 3, bands = 8, rows = 2, threshold = 0.6,
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
          md5Family = true)
        try q.awaitTermination(180000L) finally q.stop()
      }
      require(acc.nonEmpty, "near-dup gate emitted no matches")
      acc.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toDF("new_id", "corpus_id", "jaccard")
        .orderBy("new_id", "corpus_id")
    }),


    // ----- DSv2 STREAMING WRITE under the oracle (§2.1 x §2.9) -------
    "q275_stream_rate_limit" -> ((s, dir) => {
      // admission control under the oracle: a 5-file backlog (equal
      // slices of documents, one file per doc_id%5 class) drained at
      // maxFilesPerTrigger=2 must arrive as exactly ceil(5/2)=3 bounded
      // micro-batches of 2s, 2s, s rows — the backpressure contract a
      // production tail needs so a burst never becomes one giant
      // catch-up batch. Batch sizes (not file identities, which carry
      // task-id names) are the deterministic surface: slices are equal,
      // so the per-batch row counts are pure arithmetic for the oracle
      import s.implicits._
      import org.apache.hadoop.fs.Path
      val run = memNonce.incrementAndGet()
      val base = scratchPath(dir, s"q275_records_$run")
      val ckpt = s"${base}_ckpt"
      val fs = new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      fs.delete(new Path(ckpt), true)
      val docs = rd(s, dir, "documents").select(
        concat(lit("d"), col("doc_id")).as("_record_id"),
        col("doc_id").cast("double").as("DocId"))
      (0 until 5).foreach { b =>
        docs.filter(col("DocId") % 5 === b).coalesce(1)
          .write.format("graft-records").option("path", base)
          .mode("append").save()
      }
      val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = s.readStream.format("graft-records")
        .option("path", base)
        .option("fieldTypes", "DocId:number")
        .option("maxFilesPerTrigger", "2")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          val n = b.count()
          batches.synchronized { batches += ((id, n)) }; ()
        }.start()
      q.awaitTermination(300000)
      batches.toSeq.toDF("batch_id", "n_rows").orderBy("batch_id")
    }),


    "q255_stream_sink_replay" -> ((s, dir) => {
      // q241's dual: the graft-records STREAMING_WRITE path end-to-end.
      // The customer fixture streams INTO the sink as two epoch-staged
      // micro-batch commits (per-epoch staging dir -> rename -> marker,
      // exactly-once across retries — RecordSourceSpec drives the retry
      // itself), and a batch read of the committed record log must
      // aggregate to the plain SQL over customer. Fresh sink dir +
      // checkpoint per run (the bench times each query twice per JVM).
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import org.apache.hadoop.fs.Path
      val run = memNonce.incrementAndGet()
      val base = scratchPath(dir, s"q255_records_$run")
      val ckpt = s"${base}_ckpt"
      val fs = new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      fs.delete(new Path(ckpt), true)
      val rows = memoFeed("q255_rows_feed", dir) { rd(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("k"),
          col("c_acctbal").cast("double").as("bal"),
          col("c_mktsegment").cast("string").as("seg"))
        .as[(Long, Double, String)].collect() }
      require(rows.nonEmpty && rows.length <= 2000000, "bad replay fixture")
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Double, String)]
      val out = in.toDF().toDF("k", "bal", "seg")
        .select(col("k").cast("string").as("_record_id"),
          col("bal").as("c_acctbal"), col("seg").as("c_mktsegment"))
      withReplayPartitions(s) {
        val q = out.writeStream.format("graft-records")
          .option("path", base)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try {
          val half = rows.length / 2
          in.addData(rows.take(half).toSeq: _*)
          q.processAllAvailable()
          in.addData(rows.drop(half).toSeq: _*)
          q.processAllAvailable()
        } finally q.stop()
      }
      s.read.format("graft-records")
        .option("path", base)
        .option("fieldTypes", "c_acctbal:number,c_mktsegment:singleLineText")
        .load()
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    // ----- streaming CDC off the lake's snapshot history --------------
    "q294_cdc_stream_replay" -> ((s, dir) => {
      // the lake as its own change feed: four mutation waves (append,
      // merge-on-read delete, append, delete) each snapshot; the
      // cdc=true STREAM replays exactly one snapshot transition per
      // micro-batch, and a per-language aggregate maintained ONLY from
      // the signed deltas must equal the oracle's full recompute. The
      // first delete runs BEFORE the second append, so a consumer that
      // nets waves out of order (or misses a DV-diff) diverges.
      import s.implicits._
      val run = memNonce.incrementAndGet()
      val out = scratchPath(dir, s"q294_records_$run")
      val ckpt = s"${out}_ckpt"
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out) // v1
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out) // v2
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out) // v3
      graft.operators.DeletionVectors.delete(s, out, types,
        col("DocId") % 10 === 7)
      graft.operators.LakeSnapshots.commit(s, out) // v4
      // maintained state: lang -> (n, sum_chars, id_sum), driver-side
      // (bounded by distinct languages); fed ONLY by the stream's waves
      val state = scala.collection.mutable.Map
        .empty[String, (Long, Long, Long)]
      var waves = 0
      val q = s.readStream.format("graft-records").option("path", out)
        .option("fieldTypes", types)
        .option("cdc", "true").option("startingVersion", "0")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val deltas = df.groupBy("Lang")
            .agg(sum(col("m")).as("dn"),
              sum(col("m") * col("Chars")).as("dsc"),
              sum(col("m") * col("DocId")).as("dsi"))
            .collect()
          state.synchronized {
            waves += 1
            deltas.foreach { r =>
              val lang = r.getString(0)
              val (n0, c0, i0) = state.getOrElse(lang, (0L, 0L, 0L))
              state(lang) = (n0 + r.getLong(1),
                c0 + (if (r.isNullAt(2)) 0L else r.getDouble(2).toLong),
                i0 + r.getDouble(3).toLong)
            }
          }
          ()
        }.start()
      q.processAllAvailable()
      q.stop()
      require(waves == 4,
        s"expected one micro-batch per snapshot transition (4), got $waves")
      state.toSeq.filter(_._2._1 > 0)
        .map { case (lang, (n, sc, si)) => (lang, n, sc, si) }
        .toDF("lang", "n_docs", "sum_chars", "id_sum")
        .orderBy("lang")
    }),

    // ----- per-epoch snapshot commits from the streaming sink ---------
    "q290_epoch_snapshots" -> ((s, dir) => {
      // the sink's snapshotPerEpoch option freezes a manifest after
      // every epoch commit, so time travel addresses "the table as of
      // epoch N": three custkey-residue epochs stream in, and each
      // snapshot version must read back EXACTLY the cumulative prefix —
      // rows from later epochs invisible. The oracle recomputes the
      // three prefixes from the residue split alone.
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import org.apache.hadoop.fs.Path
      val run = memNonce.incrementAndGet()
      val base = scratchPath(dir, s"q290_records_$run")
      val ckpt = s"${base}_ckpt"
      val fs = new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      fs.delete(new Path(ckpt), true)
      val rows = memoFeed("q290_rows_feed", dir) { rd(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("k"),
          col("c_acctbal").cast("double").as("bal"))
        .as[(Long, Double)].collect() }
      require(rows.nonEmpty && rows.length <= 2000000, "bad replay fixture")
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Double)]
      val out = in.toDF().toDF("k", "bal")
        .select(col("k").cast("string").as("_record_id"),
          col("bal").as("c_acctbal"))
      withReplayPartitions(s) {
        val q = out.writeStream.format("graft-records")
          .option("path", base)
          .option("checkpointLocation", ckpt)
          .option("snapshotPerEpoch", "true")
          .outputMode("append").start()
        try {
          (0 until 3).foreach { e =>
            in.addData(rows.filter(_._1 % 3 == e).toSeq: _*)
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      val versions = graft.operators.LakeSnapshots.versions(s, base)
      require(versions == Seq(1L, 2L, 3L),
        s"three epochs must commit three snapshots, got $versions")
      versions.map { v =>
        s.read.format("graft-records").option("path", base)
          .option("fieldTypes", "c_acctbal:number")
          .option("versionAsOf", v.toString).load()
          .agg(count(lit(1)).as("n_cust"),
            sum(col("_record_id").cast("long")).as("key_sum"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
              .as("sum_bal"))
          .select(lit(s"epoch$v").as("phase"), col("n_cust"),
            col("key_sum"), col("sum_bal"))
      }.reduce(_ unionByName _).orderBy("phase")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q238_stream_quota_replay" ->
      s"""WITH v AS (SELECT
         |    $typeCodeSql AS type_code,
         |    event_id,
         |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS epoch,
         |    row_number() OVER (PARTITION BY event_type,
         |      CAST(floor(epoch(ts) / 86400) AS BIGINT)
         |      ORDER BY ts, event_id) AS rn
         |  FROM events
         |  WHERE $typeInSql AND ts IS NOT NULL AND event_id IS NOT NULL)
         |SELECT CAST(type_code AS BIGINT) AS type_code, epoch,
         |  CAST(sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_admitted,
         |  CAST(sum(CASE WHEN rn <= 5 THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_rejected,
         |  CAST(sum(CASE WHEN rn <= 5 THEN event_id ELSE 0 END) AS BIGINT)
         |    AS admitted_id_sum
         |FROM v GROUP BY 1, 2 HAVING n_rejected > 0
         |ORDER BY type_code, epoch""".stripMargin,

    // the wire format carries acctbal as double (exact round trip), so
    // the streamed aggregate must equal the direct table aggregate
    "q241_stream_source_replay" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    // earliest-occurrence chaining, equivalent to the greedy fold: the
    // fold advances on the FIRST matching event, so stage k is reached
    // iff min(view) < min(click after it) < min(purchase after that) —
    // deliberately NOT q70's list_reduce formulation, which DuckDB
    // 1.0.0 mis-correlates for struct accumulators when several grouped
    // lists fold in one vectorized batch (inline single-group evaluation
    // gives the right answer, the grouped CTE does not). Strict '>'
    // matches the fold because the fixture has no (user, ts) ties.
    "q245_stream_funnel_replay" ->
      """WITH e AS (SELECT * FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL
        |    AND CAST(floor(epoch(ts) / 86400) AS BIGINT) =
        |      (SELECT min(CAST(floor(epoch(ts) / 86400) AS BIGINT))
        |       FROM events WHERE ts IS NOT NULL)),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |st AS (SELECT u.user_id,
        |  CASE WHEN s3.user_id IS NOT NULL THEN 3
        |       WHEN s2.user_id IS NOT NULL THEN 2
        |       WHEN s1.user_id IS NOT NULL THEN 1
        |       ELSE 0 END AS stage
        |  FROM u LEFT JOIN s1 USING (user_id)
        |    LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id))
        |SELECT CAST(stage AS BIGINT) AS funnel_stage, count(*) AS n_keys,
        |  CAST(sum(user_id) AS BIGINT) AS uid_sum
        |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,

    // the ORIGINAL table only: the synthetic late replay the stream
    // ingests must be dropped by the watermark, and every real window
    // must emit exactly once — any leak or loss breaks the hash.
    // DECIMAL(18,2) mirrors StreamingSync.windowedCounts' sum route.
    "q242_stream_watermark_replay" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q66's whole-history fold verbatim (dyadic alpha keeps every step
    // IEEE-exact), restricted by the same null guards the feed applies.
    // NUMERIC-accumulator list_reduce is safe — the DuckDB 1.0.0
    // mis-correlation q245's comment documents bites STRUCT accumulators
    // only (this per-user output would expose it immediately if not)
    "q240_stream_ema_replay" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  list_reduce(list(CAST(value AS DOUBLE)
        |                   ORDER BY CAST(ts AS TIMESTAMP), event_id),
        |              (acc, x) -> 0.5*x + 0.5*acc) AS ema
        |FROM events
        |WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q158's window arithmetic verbatim (decimal-routed moments), keyed
    // by the integer type code and projected to the stream gate's
    // alert-row shape
    "q239_stream_anomaly_replay" ->
      s"""WITH e AS (SELECT $typeCodeSql AS key,
         |  CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id AS id,
         |  CAST(value AS DOUBLE) AS v FROM events
         |  WHERE $typeInSql AND ts IS NOT NULL AND event_id IS NOT NULL
         |    AND value IS NOT NULL),
         |w AS (SELECT key, sec, id, v,
         |  CAST(sum(CAST(v AS DECIMAL(28,12))) OVER fr AS DOUBLE) AS s1,
         |  CAST(sum(CAST(v * v AS DECIMAL(28,12))) OVER fr AS DOUBLE) AS s2,
         |  count(v) OVER fr AS n
         |  FROM e WINDOW fr AS (PARTITION BY key ORDER BY sec, id
         |    ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING))
         |SELECT CAST(key AS BIGINT) AS key, sec, id, v AS value,
         |  CAST(n AS BIGINT) AS n_base
         |FROM w
         |WHERE n >= 30
         |  AND abs(v - s1 / n) > 3.0 * sqrt(greatest((s2 - s1 * s1 / n) / n, 0))
         |ORDER BY key, sec, id""".stripMargin,

    // the trailing-hour window at each key's newest second — integer-
    // valued doubles (floor(value*100)) make the stream's fold-order-
    // dependent double sums exact, hence bit-comparable
    "q248_stream_rolling_replay" ->
      """WITH e AS (SELECT CAST(user_id AS BIGINT) AS k,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |  floor(CAST(value AS DOUBLE) * 100) AS v
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL),
        |hi AS (SELECT k, max(sec) AS hi FROM e GROUP BY 1)
        |SELECT e.k AS user_id, hi.hi AS window_end_sec,
        |  count(*) AS n_win, CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS sum_win
        |FROM e JOIN hi ON e.k = hi.k AND e.sec >= hi.hi - 3599
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // q146's register reconstruction keyed by type code; the > 1500
    // filter is provably raw-branch-only on both engines (the ln
    // correction's ceiling is 256*ln(256) ~= 1419.6 and fires only when
    // raw <= 640), so no libm value can reach the gate
    "q249_stream_hll_replay" ->
      s"""WITH e AS (SELECT $typeCodeSql AS k, CAST(event_id AS VARCHAR) AS v
         |  FROM events
         |  WHERE $typeInSql AND ts IS NOT NULL AND event_id IS NOT NULL),
         |h AS (SELECT k, v,
         |  CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS hv FROM e),
         |b AS (SELECT k, hv % 256 AS bucket,
         |  CASE WHEN hv // 256 = 0 THEN 53
         |       ELSE 53 - length(bin(hv // 256)) END AS rho FROM h),
         |regs AS (SELECT k, bucket, max(rho) AS m FROM b GROUP BY 1, 2),
         |d AS (SELECT k, count(*) AS nz,
         |  sum(1::BIGINT << (53 - m)) AS sden FROM regs GROUP BY 1),
         |est AS (SELECT k,
         |  CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)
         |    * 65536.0 * 9007199254740992.0
         |    / CAST((256 - nz) * 9007199254740992 + sden AS DOUBLE) AS raw
         |  FROM d),
         |n AS (SELECT k, count(*) AS n_events FROM e GROUP BY 1)
         |SELECT CAST(est.k AS BIGINT) AS type_code,
         |  CAST(floor(raw + 0.5) AS BIGINT) AS n_est,
         |  CAST(n_events AS BIGINT) AS n_events
         |FROM est JOIN n ON est.k = n.k
         |WHERE floor(raw + 0.5) > 1500
         |ORDER BY type_code""".stripMargin,

    // lag/gap session chaining with exact INTERVAL arithmetic; end =
    // last event + gap; the split condition is STRICT `>` because
    // session_window's merge boundary is inclusive — an event exactly
    // gap after its predecessor continues the session (pinned in
    // StreamingSpec's boundary test). DECIMAL-routed value sums; no
    // (user_id, ts) ties exist at any SF (round-9 check)
    "q250_stream_session_replay" ->
      """WITH e AS (SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL),
        |m AS (SELECT user_id, ts, v,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts > lag(ts) OVER w + INTERVAL 1800 SECONDS THEN 1
        |       ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, v,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id,
        |  CAST(floor(epoch(min(ts))) AS BIGINT) AS start_sec,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) + 1800 AS end_sec,
        |  count(*) AS n_events, CAST(sum(v) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY 1, 2""".stripMargin,

    // the oracle joins the NET final sides (all %7=0 orders retract —
    // the %3=2∩%7=0 ones cancel in-wave; customers lose %5=0 the same
    // way): any delta applied against a stale side version diverges
    "q288_stream_join_ivm_replay" ->
      """WITH l AS (SELECT o_custkey AS k, o_totalprice AS price
        |  FROM orders WHERE NOT (o_orderkey % 7 = 0)),
        |r AS (SELECT c_custkey AS k, c_mktsegment AS seg
        |  FROM customer WHERE NOT (c_custkey % 5 = 0))
        |SELECT r.seg AS segment, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l.price AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        |FROM l JOIN r ON l.k = r.k
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the same lag-chain islands as q250, but over event ids with the
    // INCLUSIVE end (last event's second) the TWS processor emits; the
    // merge rule matches the engine exactly (ties at last+gap merge —
    // closure requires ts strictly past last + 30min)
    "q276_stream_tws_replay" ->
      """WITH e AS (SELECT user_id, ts, CAST(event_id AS BIGINT) AS id
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL),
        |m AS (SELECT user_id, ts, id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts > lag(ts) OVER w + INTERVAL 1800 SECONDS THEN 1
        |       ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, id)),
        |s AS (SELECT user_id, ts, id,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, id
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id,
        |  CAST(floor(epoch(min(ts))) AS BIGINT) AS start_sec,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) AS end_sec,
        |  count(*) AS n_events, CAST(sum(id) AS BIGINT) AS id_sum
        |FROM s GROUP BY user_id, sid ORDER BY 1, 2""".stripMargin,

    // the batch interval join verbatim: purchases within [view, view+1h]
    // of the same user; INTERVAL arithmetic is microsecond-exact in both
    // engines, so the boundary semantics cannot diverge
    "q251_stream_interval_join_replay" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_id IS NOT NULL),
        |v AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, ts, event_id FROM e
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT v.user_id, v.event_id AS vid, p.event_id AS pid
        |  FROM v JOIN p ON v.user_id = p.user_id
        |    AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 3600 SECONDS)
        |SELECT user_id, count(*) AS n_pairs,
        |  CAST(sum(vid) AS BIGINT) AS view_id_sum,
        |  CAST(sum(pid) AS BIGINT) AS purchase_id_sum
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // q219's oracle VERBATIM: two-batch incremental application must be
    // bit-equal to the from-scratch rebuild of the surviving rows
    "q252_stream_changelog_replay" ->
      """WITH e AS (SELECT user_id, event_id, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE user_id % 20 = 0),
        |after AS (
        |  SELECT user_id, v FROM e WHERE event_id % 7 != 0
        |  UNION ALL
        |  SELECT user_id, v * 2 AS v FROM e WHERE event_id % 11 = 0),
        |m AS (SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(v * v AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |  min(v) AS min_value, max(v) AS max_value
        |  FROM after GROUP BY 1)
        |SELECT user_id, n,
        |  floor(s1 * 1000000 + 0.5) / 1000000 AS sum_value,
        |  floor(s1 / n * 1000000 + 0.5) / 1000000 AS avg_value,
        |  floor((s2 - s1 * s1 / n) / n * 1000000 + 0.5) / 1000000 AS var_value,
        |  min_value, max_value
        |FROM m ORDER BY user_id""".stripMargin,

    // exact novelty: the gate's bloom is a pre-filter only (no false
    // negatives; the anti-join clears false positives), so the emitted
    // set is exactly the customers outside the corpus
    "q253_stream_bloom_gate_replay" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_novel,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
        |FROM customer WHERE c_custkey % 3 = 0""".stripMargin,

    // q50's new-vs-corpus banded MinHash pipeline verbatim (the gate
    // splits incoming across two micro-batches; per-pair verdicts are
    // batch-split invariant because the corpus side is static)
    "q254_stream_neardup_gate_replay" ->
      """WITH tagged AS (
        |  SELECT 'c' AS side, doc_id, text FROM documents
        |  UNION ALL
        |  SELECT 'n', doc_id + 10000, substr(text, strpos(text, ' ') + 1)
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT 'n', doc_id + 20000, text FROM documents WHERE doc_id % 13 = 0),
        |toks AS (SELECT side, doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM tagged),
        |sh AS (SELECT side, doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
        |  END AS sh FROM toks),
        |sig AS (SELECT side, doc_id, sh,
        |  [CAST(list_min([CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '#' || s), 1, 15)) AS BIGINT)
        |                  FOR s IN sh]) AS VARCHAR) FOR j IN range(0, 16)] AS sg
        |  FROM sh),
        |bands AS (SELECT side, doc_id, b,
        |  md5(array_to_string(sg[b*2+1:b*2+2], '|')) AS band_key
        |  FROM sig, range(0, 8) t(b)),
        |cand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
        |  FROM bands n JOIN bands c ON n.b = c.b AND n.band_key = c.band_key
        |  WHERE n.side = 'n' AND c.side = 'c'),
        |hsh AS (SELECT side, doc_id,
        |  list_distinct([CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) FOR s IN sh]) AS hs
        |  FROM sh),
        |pairs AS (SELECT new_id, corpus_id,
        |  CAST(len(list_intersect(n.hs, c.hs)) AS DOUBLE) /
        |  CAST(len(list_distinct(list_concat(n.hs, c.hs))) AS DOUBLE) AS j
        |  FROM cand
        |  JOIN hsh n ON n.side = 'n' AND n.doc_id = cand.new_id
        |  JOIN hsh c ON c.side = 'c' AND c.doc_id = cand.corpus_id)
        |SELECT new_id, corpus_id, floor(j * 10000 + 0.5) / 10000 AS jaccard
        |FROM pairs WHERE j >= 0.6 ORDER BY new_id, corpus_id""".stripMargin,

    // the streamed-in record log must aggregate to the source table:
    // the wire format round-trips acctbal as double exactly (q241's
    // guarantee, here exercised through the STREAMING_WRITE path)
    "q255_stream_sink_replay" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the FINAL state from the mutation ordering;
    // the engine must get there by streaming one signed delta wave per
    // snapshot transition (delete1 precedes append2 — order matters)
    "q294_cdc_stream_replay" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE NOT (doc_id % 10 = 7)
        |    AND (doc_id % 3 = 2 OR NOT coalesce(n_chars < 200, FALSE)))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the cumulative residue prefixes; the engine
    // must produce them by TIME TRAVEL over per-epoch snapshot commits
    "q290_epoch_snapshots" ->
      """SELECT 'epoch' || CAST(e AS VARCHAR) AS phase,
        |  CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer, (SELECT unnest([1, 2, 3]) AS e)
        |WHERE c_custkey % 3 <= e - 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // a 5-slice backlog at 2 files/trigger: batch sizes are pure
    // arithmetic over the per-slice counts (doc_id%5 slices of equal
    // size when COUNT(*) divides by 5 — the fixtures do)
    "q275_stream_rate_limit" ->
      """WITH s AS (SELECT CAST(COUNT(*) / 5 AS BIGINT) AS sz FROM documents)
        |SELECT CAST(b.i AS BIGINT) AS batch_id,
        |  CAST(CASE WHEN b.i < 2 THEN 2 * sz ELSE sz END AS BIGINT) AS n_rows
        |FROM (VALUES (0), (1), (2)) b(i), s
        |ORDER BY batch_id""".stripMargin
  )
}
