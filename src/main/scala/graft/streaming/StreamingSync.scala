package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import graft.PipelineConfig
import graft.operators.Strategies
import graft.state.StateStore

/** Structured-Streaming surface. The reference is strictly batch
  * (reference: lib/AirtableToDatastore.py:28-49) — re-running the pipeline
  * is its "incremental" mode. Here the same strategies run continuously:
  * each micro-batch is one MERGE via foreachBatch, giving exactly the
  * batch semantics per trigger with checkpointed progress.
  */
object StreamingSync {

  /** Continuous sync: apply the configured update strategy to every
    * micro-batch of source records. Single-writer per state path. */
  def run(spark: SparkSession, stream: DataFrame, cfg: PipelineConfig,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val store = new StateStore(spark, cfg.store.statePath)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val src = graft.functions.Normalize.filterValidPk(batch, cfg.primaryKey)
        val state = Strategies.purgeOtherUpdateTypes(
          Strategies.alignState(store.load(), src), cfg)
        store.overwrite(Strategies.get(cfg.updateType)(src, state, cfg))
      }
      .start()
  }

  /** Streaming ingestion dedup gate: per micro-batch of incoming docs,
    * compute which near-duplicate the existing corpus and hand the
    * matches to `onMatches` (quarantine table, metric sink, ...).
    * foreachBatch rather than a stream-static join because sketching the
    * batch needs a per-batch aggregation, which an unaggregated
    * stream-static equi-join cannot express; each micro-batch is a static
    * frame, so the whole batch operator surface applies.
    *
    * Cache lifecycle: the corpus sketch frame is computed and persisted
    * ONCE at gate start (it is static for the query's lifetime) and
    * released when the query terminates; each batch's sketch frame is
    * persisted for its two consumers and released as soon as `onMatches`
    * returns — a long-running gate holds exactly one cached corpus frame,
    * never an accumulating per-batch backlog.
    *
    * Banding defaults to 8 bands x 2 rows: ~99.9% candidate recall at
    * J=0.75 (4x4 would silently pass ~1 in 4 gate-worthy near-dups). */
  def nearDupGate(stream: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, checkpoint: String, onMatches: DataFrame => Unit,
      k: Int = 3, bands: Int = 8, rows: Int = 2, threshold: Double = 0.7,
      trigger: Trigger = Trigger.AvailableNow(),
      md5Family: Boolean = false): StreamingQuery = {
    import graft.operators.DedupApprox
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val corpusSk = DedupApprox
      .docSketches(corpus, idCol, textCol, k, bands * rows, md5Family)
      .persist(lvl)
    // Release the corpus sketch when this gate's query ends. The listener
    // must be attached BEFORE start(): with a fast trigger (AvailableNow on
    // an empty source) the query can terminate before a post-start
    // registration sees the event, leaking both the cached sketch and the
    // listener on the shared StreamingQueryManager. The gate's query is
    // identified by a unique name: QueryStartedEvent is delivered
    // synchronously inside start(), so the id is bound before any
    // termination event can be compared against it.
    val gateName = "graft-neardup-gate-" + java.util.UUID.randomUUID()
    val streams = stream.sparkSession.streams
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      private val gateId =
        new java.util.concurrent.atomic.AtomicReference[java.util.UUID](null)
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        if (e.name == gateName) gateId.set(e.id)
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == gateId.get()) {
          corpusSk.unpersist()
          streams.removeListener(this)
        }
    }
    streams.addListener(listener)
    try {
      stream.writeStream
        .queryName(gateName)
        .option("checkpointLocation", checkpoint)
        .trigger(trigger)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val batchSk = DedupApprox
            .docSketches(batch, idCol, textCol, k, bands * rows, md5Family)
            .persist(lvl)
          try onMatches(DedupApprox.nearDupsFromSketches(
            corpusSk, batchSk, bands, rows, threshold))
          finally batchSk.unpersist()
        }
        .start()
    } catch {
      case t: Throwable =>
        streams.removeListener(listener)
        corpusSk.unpersist()
        throw t
    }
  }

  /** Streaming bloom novelty gate: per micro-batch, hand `onNovel`
    * exactly the rows whose key is NOT in the static corpus — anti-join
    * semantics at bloom cost. The corpus sketch (fixed-size bytes,
    * independent of corpus rows) is built ONCE at gate start and
    * captured by value in the batch closure — unlike [[nearDupGate]]
    * there is no cached frame and so no listener lifecycle to manage.
    * Rows the sketch has never seen are definitely novel and skip the
    * exact check (a bloom filter has no false negatives); only the
    * might-contain minority anti-joins the corpus to clear false
    * positives (see [[graft.operators.BloomJoin.novelRows]]). */
  def bloomNovelGate(stream: DataFrame, corpus: DataFrame, keyCol: String,
      checkpoint: String, onNovel: DataFrame => Unit,
      expectedItems: Long = 1000000L, fpp: Double = 0.03,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import graft.operators.BloomJoin
    val sketch = BloomJoin.buildFilter(corpus, keyCol, expectedItems, fpp)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onNovel(BloomJoin.novelRows(batch, corpus, keyCol, sketch))
      }
      .start()
  }

  /** Watermarked tumbling-window aggregate over an event stream —
    * the standard streaming-analytics shape on the events table. */
  def windowedCounts(events: DataFrame, window_ : String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** Streaming per-KEY dedup: emits the first arrival of each key and
    * drops later re-deliveries even when they carry a different event
    * time (at-least-once sources re-stamp on retry), bounding state with
    * the watermark — the streaming analog of the batch latest-wins dedup. */
  def dedupStream(events: DataFrame, keyCols: Seq[String], watermark: String): DataFrame = {
    require(keyCols.nonEmpty, "dedupStream needs at least one key column")
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)
  }

  /** Watermarked stream-stream interval join — the streaming analog of
    * the batch range join (q55): left events join right events on a key
    * within [leftTs - beforeSec, leftTs + afterSec]. The time-bound join
    * condition is what lets Spark expire both sides' state past the
    * watermark; without it a stream-stream join buffers forever. Column
    * names must be disjoint across sides (Spark requirement for
    * stream-stream joins on raw columns). */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      beforeSec: Long, afterSec: Long, watermark: String): DataFrame = {
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"stream-stream join needs fully disjoint column names per side; " +
        s"shared: ${shared.toSeq.sorted.mkString(", ")}")
    require(left.columns.contains(leftKey) && left.columns.contains(leftTs) &&
      right.columns.contains(rightKey) && right.columns.contains(rightTs),
      "key/ts columns must come from their own side")
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $beforeSec SECONDS") &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $afterSec SECONDS"))
  }

  /** Streaming per-key event-time rolling window — the
    * [[graft.operators.Stats.rollingPerKey]] batch semantics with
    * BOUNDED state: per key, a second-bucketed map
    * `floor-epoch-second -> (count, sum)` capped at `windowSec` entries,
    * never the event history. Each micro-batch folds its events into the
    * buckets, evicts buckets older than the key's newest second minus
    * the window, and emits `(key, window_end_sec, n_win, sum_win)` for
    * the CURRENT trailing window (update mode — latest row per key is
    * the answer). Late events inside the retained span fold correctly;
    * events older than the span are dropped, the same contract a
    * watermark would impose.
    *
    * State is O(windowSec) PER KEY; TOTAL state grows with key
    * cardinality. `idleTimeout` (e.g. "30 minutes"; empty = keep state
    * forever) evicts a key's state after that much processing time with
    * no new events — set it on long-running queries over unbounded key
    * domains, where "every key ever seen" is itself the leak. An evicted
    * key that reappears restarts with an empty window — correct here,
    * since its old buckets would be outside the trailing window anyway.
    * Operational note (applies to all three idleTimeout ops): a
    * processing-time timeout makes the engine run timeout-check batches
    * continuously even with no new data — expected on a long-running
    * query (it is HOW idle state gets evicted), but give the query a real
    * trigger interval so those checks don't spin back-to-back. */
  def rollingPerKeyStream(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowSec: Long,
      idleTimeout: String = ""): Dataset[(Long, Long, Long, Double)] = {
    require(windowSec > 0, s"windowSec $windowSec must be positive")
    requireIntegralKey(events, keyCol, "rollingPerKeyStream")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def fold(k: Long, it: Iterator[(Long, Long, Double)],
        st: GroupState[Map[Long, (Long, Double)]]): (Long, Long, Long, Double) = {
      var m = st.getOption.getOrElse(Map.empty[Long, (Long, Double)])
      var hi = m.keySet.foldLeft(Long.MinValue)(math.max)
      // deterministic fold order WITHIN the batch ((sec, value)) and
      // ACROSS buckets (sorted keys): double addition is order-
      // sensitive in the last ulp, and iterator/hash-map order would
      // make reruns differ. Micro-batch BOUNDARIES still decide the
      // bucket partial-sum grouping — inherent to streaming; the
      // batch form's DECIMAL route is the engine-exact one.
      it.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, s, v) =>
        hi = math.max(hi, s)
        val (n0, s0) = m.getOrElse(s, (0L, 0.0))
        m += s -> (n0 + 1L, s0 + v)
      }
      m = m.filter { case (sec, _) => sec >= hi - windowSec + 1 }
      st.update(m)
      val (n, sum) = m.toSeq.sortBy(_._1).map(_._2).foldLeft((0L, 0.0)) {
        case ((an, as), (bn, bs)) => (an + bn, as + bs)
      }
      (k, hi, n, sum)
    }
    val grouped = events.selectExpr(s"CAST($keyCol AS LONG) AS _k",
        s"CAST($tsCol AS LONG) AS _s", s"CAST($valueCol AS DOUBLE) AS _v")
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
    if (idleTimeout.isEmpty)
      grouped.mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold)
    else
      grouped.flatMapGroupsWithState(OutputMode.Update(),
          GroupStateTimeout.ProcessingTimeTimeout) {
        (k: Long, it: Iterator[(Long, Long, Double)],
            st: GroupState[Map[Long, (Long, Double)]]) =>
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            val r = fold(k, it, st)
            st.setTimeoutDuration(idleTimeout)
            Iterator.single(r)
          }
      }
  }

  /** Custom-state streaming operator: running per-key exponential moving
    * average via mapGroupsWithState — the one semantics here that no
    * built-in windowed aggregate composes (the recurrence
    * `ema_i = alpha*x_i + (1-alpha)*ema_{i-1}` is order-sensitive and
    * unbounded, so it needs explicit O(1)-per-key state: the running ema
    * and count survive across micro-batches in the state store). Events
    * inside a batch fold in (event-time, value) order; emits one updated
    * `(key, ema, n_events)` row per key per batch (update output mode).
    * Batch counterpart: [[graft.operators.Stats.emaPerKey]]. */
  /** The tuple-encoded state path carries keys as LONG; a silent cast
    * would merge 7.2 and 7.9 into one state and NULL out strings. */
  private def requireIntegralKey(events: DataFrame, keyCol: String,
      op: String): Unit = {
    val dt = events.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op keys ride the state store as LONG; $keyCol is $dt — " +
        "a lossy cast would silently merge distinct keys (or NULL out " +
        "strings). Map the key to a long (e.g. xxhash64) first.")
  }

  /** `idleTimeout` (empty = keep state forever): per-key state is O(1),
    * but total state grows with key cardinality — set a timeout on
    * long-running queries over unbounded key domains. NOTE an evicted key
    * that reappears restarts its EMA from scratch (n=0), so only evict
    * when key retirement is real (sessions, short-lived entities). */
  def emaPerKey(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alpha: Double,
      idleTimeout: String = ""): Dataset[(Long, Double, Long)] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
    requireIntegralKey(events, keyCol, "emaPerKey")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def fold(k: Long, it: Iterator[(Long, java.sql.Timestamp, Double)],
        st: GroupState[(Double, Long)]): (Long, Double, Long) = {
      // order by the FULL timestamp (Timestamp.compareTo carries the
      // nanos field; getTime truncates to milliseconds and would let
      // sub-millisecond events fold in value order), value tiebreak
      val xs = it.toSeq.sortWith { (a, b) =>
        val c = a._2.compareTo(b._2)
        c < 0 || (c == 0 && a._3 < b._3)
      }
      var (ema, n) = st.getOption.getOrElse((0.0, 0L))
      xs.foreach { case (_, _, v) =>
        ema = if (n == 0) v else alpha * v + (1 - alpha) * ema
        n += 1
      }
      st.update((ema, n))
      (k, ema, n)
    }
    val grouped = events
      .selectExpr(s"CAST($keyCol AS LONG) AS _k", s"$tsCol AS _t",
        s"CAST($valueCol AS DOUBLE) AS _v")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
    if (idleTimeout.isEmpty)
      grouped.mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold)
    else
      grouped.flatMapGroupsWithState(OutputMode.Update(),
          GroupStateTimeout.ProcessingTimeTimeout) {
        (k: Long, it: Iterator[(Long, java.sql.Timestamp, Double)],
            st: GroupState[(Double, Long)]) =>
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            val r = fold(k, it, st)
            st.setTimeoutDuration(idleTimeout)
            Iterator.single(r)
          }
      }
  }

  /** Streaming funnel: the batch
    * [[graft.operators.Sequence.funnelStages]] recurrence with O(1)
    * explicit state per key — only the current stage survives across
    * micro-batches, so a key's unbounded event history is never
    * materialized (the batch form's maxEventsPerKey hazard cannot exist
    * here). Events inside a batch advance the state machine in
    * (event-time, type) order — the full-timestamp comparator, like
    * [[emaPerKey]], so sub-millisecond events keep event-time order.
    * Emits one updated `(key, funnel_stage)` row per key per batch
    * (update output mode); stage is monotone, so the latest row per key
    * is the answer. */
  /** `idleTimeout` (empty = keep state forever): per-key state is one
    * Int, but total state grows with key cardinality; evicting an idle
    * key resets its funnel to stage 0 on reappearance — appropriate when
    * the funnel itself has a session lifetime. */
  def funnelPerKey(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      idleTimeout: String = ""): Dataset[(Long, Long)] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    requireIntegralKey(events, keyCol, "funnelPerKey")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def fold(k: Long, it: Iterator[(Long, java.sql.Timestamp, String)],
        st: GroupState[Int]): (Long, Long) = {
      val xs = it.toSeq.sortWith { (a, b) =>
        val c = a._2.compareTo(b._2)
        c < 0 || (c == 0 && a._3 < b._3)
      }
      var stage = st.getOption.getOrElse(0)
      xs.foreach { case (_, _, t) =>
        if (stage < steps.length && t == steps(stage)) stage += 1
      }
      st.update(stage)
      (k, stage.toLong)
    }
    val grouped = events
      .selectExpr(s"CAST($keyCol AS LONG) AS _k", s"$tsCol AS _t",
        s"CAST($typeCol AS STRING) AS _y")
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
    if (idleTimeout.isEmpty)
      grouped.mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold)
    else
      grouped.flatMapGroupsWithState(OutputMode.Update(),
          GroupStateTimeout.ProcessingTimeTimeout) {
        (k: Long, it: Iterator[(Long, java.sql.Timestamp, String)],
            st: GroupState[Int]) =>
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            val r = fold(k, it, st)
            st.setTimeoutDuration(idleTimeout)
            Iterator.single(r)
          }
      }
  }

  /** Streaming per-key EVENT TRANSITIONS — the incremental form of the
    * batch transition-matrix derivation (q181): each key's state is
    * ONLY its last event type (one string), so consecutive-pair mining
    * over an unbounded stream never materializes event history. Events
    * inside a batch pair up in (event-time, type) order — the
    * full-timestamp comparator shared with [[emaPerKey]] — and the
    * pair spanning a batch boundary comes from the carried state, so
    * the emitted transition multiset is EXACTLY the batch operator's
    * regardless of how the stream is cut into micro-batches
    * (StreamingSpec pins the agreement). Emits one
    * `(key, from_type, to_type)` row per transition per batch (update
    * output mode); the |types|²-row matrix aggregation runs downstream
    * on the emitted pairs. */
  def transitionsPerKey(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String,
      idleTimeout: String = ""): Dataset[(Long, String, String)] = {
    requireIntegralKey(events, keyCol, "transitionsPerKey")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def fold(k: Long, it: Iterator[(Long, java.sql.Timestamp, String)],
        st: GroupState[String]): Iterator[(Long, String, String)] = {
      val xs = it.toSeq.sortWith { (a, b) =>
        val c = a._2.compareTo(b._2)
        c < 0 || (c == 0 && a._3 < b._3)
      }
      var prev = st.getOption.orNull
      val out = Seq.newBuilder[(Long, String, String)]
      xs.foreach { case (_, _, t) =>
        if (prev != null) out += ((k, prev, t))
        prev = t
      }
      if (prev != null) st.update(prev)
      out.result().iterator
    }
    val grouped = events
      .selectExpr(s"CAST($keyCol AS LONG) AS _k", s"$tsCol AS _t",
        s"CAST($typeCol AS STRING) AS _y")
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
    grouped.flatMapGroupsWithState(OutputMode.Append(),
        if (idleTimeout.isEmpty) GroupStateTimeout.NoTimeout
        else GroupStateTimeout.ProcessingTimeTimeout) {
      (k: Long, it: Iterator[(Long, java.sql.Timestamp, String)],
          st: GroupState[String]) =>
        if (st.hasTimedOut) { st.remove(); Iterator.empty }
        else {
          val r = fold(k, it, st)
          if (idleTimeout.nonEmpty) st.setTimeoutDuration(idleTimeout)
          r
        }
    }
  }

  /** Streaming per-key ADMISSION QUOTA — ingest rate limiting with an
    * exact, deterministic verdict per event: at most `quota` events per
    * key per `epochSec` event-time window are admitted, in (event-time,
    * id) order; the rest carry `admitted = false` so the caller routes
    * them (drop, deadletter, downsample tier) instead of losing them
    * silently. This is the per-source crawl-budget / abuse-throttle
    * gate a 100-TB ingest runs in front of everything else, and no
    * built-in windowed aggregate can emit a PER-EVENT verdict that
    * depends on arrival rank within the window — hence custom state.
    *
    * State per key is O(1): (newest epoch seen, admitted count in it).
    * Epochs advance monotonically; an event arriving AFTER its epoch's
    * accounting has moved on (epoch < state's) is REJECTED — quota
    * accounting for a closed window never reopens, the conservative
    * read (admitting would overshoot the closed window's quota).
    * Batch counterpart: a (key, epoch) row_number ≤ quota window —
    * batch/stream agreement pinned in StreamingSpec for epoch-aligned
    * arrivals. Emits one `(key, id, epoch, admitted)` row per event
    * per batch (update output mode). */
  def quotaPerKey(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, epochSec: Long, quota: Long,
      idleTimeout: String = ""): Dataset[(Long, Long, Long, Boolean)] = {
    require(epochSec > 0, s"epochSec $epochSec must be positive")
    require(quota > 0, s"quota $quota must be positive")
    requireIntegralKey(events, keyCol, "quotaPerKey")
    requireIntegralKey(events, idCol, "quotaPerKey")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def fold(k: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
        st: GroupState[(Long, Long)]): Iterator[(Long, Long, Long, Boolean)] = {
      val xs = it.toSeq.sortWith { (a, b) =>
        val c = a._2.compareTo(b._2)
        c < 0 || (c == 0 && a._3 < b._3)
      }
      var (epoch, used) = st.getOption.getOrElse((Long.MinValue, 0L))
      val out = xs.map { case (_, t, id) =>
        // event-time epoch from the FULL timestamp's millis (epochSec
        // granularity makes sub-millisecond truncation irrelevant here)
        val e = Math.floorDiv(t.getTime, epochSec * 1000L)
        if (e > epoch) { epoch = e; used = 0L }
        val admit = e == epoch && used < quota
        if (admit) used += 1
        (k, id, e, admit)
      }
      st.update((epoch, used))
      out.iterator
    }
    val grouped = events
      .selectExpr(s"CAST($keyCol AS LONG) AS _k", s"$tsCol AS _t",
        s"CAST($idCol AS LONG) AS _i")
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
    grouped.flatMapGroupsWithState(OutputMode.Update(),
        if (idleTimeout.isEmpty) GroupStateTimeout.NoTimeout
        else GroupStateTimeout.ProcessingTimeTimeout) {
      (k: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
          st: GroupState[(Long, Long)]) =>
        if (st.hasTimedOut) { st.remove(); Iterator.empty }
        else {
          val r = fold(k, it, st)
          if (idleTimeout.nonEmpty) st.setTimeoutDuration(idleTimeout)
          r
        }
    }
  }

  /** Streaming ROLLING ANOMALY gate — the per-event twin of
    * [[graft.operators.Stats.rollingAnomaly]]: each event is judged
    * against its key's trailing `lookback` values (probe excluded,
    * `minN` warm-up, flag when `|v − mean| > z·std`), with O(lookback)
    * state per key. Emits ONLY the flagged events — the alert stream a
    * telemetry pipeline routes to paging — as
    * `(key, sec, id, value, n_base)` rows in update mode.
    *
    * Agreement contract: moments are computed with the SAME
    * decimal(28,12) arithmetic the batch form routes through
    * (per-value HALF_UP snap, exact sum), so for in-order arrivals the
    * stream flags exactly the rows the batch operator returns —
    * pinned in StreamingSpec. Events inside a batch fold in
    * (event-time, id) order; late cross-batch arrivals fold at arrival
    * (their baseline is whatever the state held — streaming's
    * honest semantics). */
  def anomalyPerKey(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, lookback: Int, minN: Int, z: Double,
      idleTimeout: String = ""): Dataset[(Long, Long, Long, Double, Long)] = {
    require(lookback > 0, s"lookback $lookback must be positive")
    require(minN > 1 && minN <= lookback,
      s"minN $minN must be in (1, lookback $lookback]")
    require(z > 0, s"z $z must be positive")
    requireIntegralKey(events, keyCol, "anomalyPerKey")
    requireIntegralKey(events, idCol, "anomalyPerKey")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def snap(v: Double): java.math.BigDecimal =
      new java.math.BigDecimal(v).setScale(12, java.math.RoundingMode.HALF_UP)
    def fold(k: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
        st: GroupState[List[Double]]): Iterator[(Long, Long, Long, Double, Long)] = {
      val xs = it.toSeq.sortWith { (a, b) =>
        val c = a._2.compareTo(b._2)
        c < 0 || (c == 0 && a._3 < b._3)
      }
      // newest-first window, <= lookback; the exact snapped sums are
      // rebuilt ONCE per micro-batch from state, then SLID in O(1) per
      // event — BigDecimal add/subtract is exact, so the slid sums equal
      // a per-event recompute bit-for-bit (the naive recompute was
      // O(lookback) BigDecimal ops per event: 100x the work at
      // lookback=100 for identical output)
      val window = scala.collection.mutable.ArrayDeque
        .from(st.getOption.getOrElse(Nil))
      var s1 = java.math.BigDecimal.ZERO
      var s2 = java.math.BigDecimal.ZERO
      window.foreach { x => s1 = s1.add(snap(x)); s2 = s2.add(snap(x * x)) }
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Double, Long)]
      xs.foreach { case (_, t, id, v) =>
        val n = window.size
        if (n >= minN) {
          // identical arithmetic to the batch DECIMAL route: each value
          // (and square) snaps to scale 12 HALF_UP, sums are exact
          val s1d = s1.doubleValue()
          val s2d = s2.doubleValue()
          val nd = n.toDouble
          val mean = s1d / nd
          val variance = (s2d - s1d * s1d / nd) / nd
          if (math.abs(v - mean) > z * math.sqrt(math.max(variance, 0.0)))
            out += ((k, Math.floorDiv(t.getTime, 1000L), id, v, n.toLong))
        }
        window.prepend(v)
        s1 = s1.add(snap(v)); s2 = s2.add(snap(v * v))
        if (window.size > lookback) {
          val d = window.removeLast()
          s1 = s1.subtract(snap(d)); s2 = s2.subtract(snap(d * d))
        }
      }
      st.update(window.toList)
      out.iterator
    }
    val grouped = events
      .selectExpr(s"CAST($keyCol AS LONG) AS _k", s"$tsCol AS _t",
        s"CAST($idCol AS LONG) AS _i", s"CAST($valueCol AS DOUBLE) AS _v")
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
    grouped.flatMapGroupsWithState(OutputMode.Update(),
        if (idleTimeout.isEmpty) GroupStateTimeout.NoTimeout
        else GroupStateTimeout.ProcessingTimeTimeout) {
      (k: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
          st: GroupState[List[Double]]) =>
        if (st.hasTimedOut) { st.remove(); Iterator.empty }
        else {
          val r = fold(k, it, st)
          if (idleTimeout.nonEmpty) st.setTimeoutDuration(idleTimeout)
          r
        }
    }
  }

  /** Streaming per-key DISTINCT-COUNT sketch — the streaming face of
    * the portable HLL family: each key (a day bucket, a source, a
    * tenant) holds ONE 256-byte register array in state, updated per
    * event with the SAME md5-prefix60 register arithmetic as the batch
    * [[graft.functions.HllRegisters]] aggregate, so a restart/replay
    * lands on register-identical sketches and the running estimate
    * agrees with the batch path bit-for-bit
    * ([[graft.operators.Sketches.hllEstimateLocal]] mirrors the
    * declarative estimate) — pinned in StreamingSpec. Emits
    * (key, n_est, n_events) per touched key per batch (update mode);
    * state is O(256) per key regardless of cardinality, which is the
    * whole point: a streaming COUNT(DISTINCT) holds every value in
    * state, this holds 256 bytes at any scale. */
  def hllPerKey(events: DataFrame, keyCol: String, valueCol: String,
      idleTimeout: String = ""): Dataset[(Long, Long, Long)] = {
    requireIntegralKey(events, keyCol, "hllPerKey")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def fold(k: Long, it: Iterator[(Long, String, Long)],
        st: GroupState[(Array[Byte], Long)]): Iterator[(Long, Long, Long)] = {
      val (regs, seen0) = st.getOption.getOrElse((new Array[Byte](256), 0L))
      var seen = seen0
      it.foreach { case (_, v, _) =>
        if (v != null) {
          val h = graft.functions.Md5Hash.prefix60(
            org.apache.spark.unsafe.types.UTF8String.fromString(v))
          val bucket = (h & 255L).toInt
          val rest = h >>> 8
          val rho = if (rest == 0L) 53
            else 53 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
          if (rho > regs(bucket)) regs(bucket) = rho.toByte
        }
        seen += 1
      }
      st.update((regs, seen))
      Iterator.single((k,
        graft.operators.Sketches.hllEstimateLocal(regs), seen))
    }
    val grouped = events
      .selectExpr(s"CAST($keyCol AS LONG) AS _k",
        s"CAST($valueCol AS STRING) AS _v", "1L AS _one")
      .as[(Long, String, Long)]
      .groupByKey(_._1)
    grouped.flatMapGroupsWithState(OutputMode.Update(),
        if (idleTimeout.isEmpty) GroupStateTimeout.NoTimeout
        else GroupStateTimeout.ProcessingTimeTimeout) {
      (k: Long, it: Iterator[(Long, String, Long)],
          st: GroupState[(Array[Byte], Long)]) =>
        if (st.hasTimedOut) { st.remove(); Iterator.empty }
        else {
          val r = fold(k, it, st)
          if (idleTimeout.nonEmpty) st.setTimeoutDuration(idleTimeout)
          r
        }
    }
  }

  /** Stateful sessionization with the BUILT-IN session_window (gap-based
    * dynamic windows, state managed by Spark): per-user sessions close
    * when the watermark passes last_event + gap, then emit exactly once
    * in append mode. `end_ts` is the session window's exclusive end
    * (last event + gap) per Spark semantics.
    *
    * Chosen over a hand-rolled flatMapGroupsWithState implementation
    * deliberately: session windows are expressible with a built-in
    * operator, so the custom-state API (`KeyValueGroupedDataset
    * .flatMapGroupsWithState`) stays reserved for semantics the engine
    * genuinely can't compose — none of the reference's require it. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"),
        col("n_events"), col("total_value"))

  /** Open per-key session for [[sessionizeTws]]: start/last event millis,
    * event count, event-id sum. One typed ValueState slot per key. */
  case class TwsOpenSession(startMs: Long, lastMs: Long, n: Long, idSum: Long)

  /** A closed session emitted by [[sessionizeTws]]. `end_sec` is the
    * LAST EVENT's second (inclusive), which the built-in session_window
    * cannot emit (its end is the exclusive last+gap). */
  case class TwsClosedSession(user_id: Long, start_sec: Long, end_sec: Long,
      n_events: Long, id_sum: Long)

  /** Gap-based sessionization through Spark 4's `transformWithState` —
    * the arbitrary-stateful successor to flatMapGroupsWithState: a typed
    * `ValueState` holds each key's open session and an EVENT-TIME TIMER
    * (registered at last_event + gap, deleted/re-registered as the
    * session extends) closes it exactly once when the watermark passes.
    * In-batch gaps close sessions inline in `handleInputRows`; only the
    * batch-tail session rides a timer, so state stays O(1) per key.
    * Merge rule: an event at exactly last+gap still merges (closure
    * requires ts - last > gap), mirroring the lag-chain oracle. Needs
    * the RocksDB state store provider (TWS rejects the HDFS-backed one);
    * rows older than the watermark are dropped by the engine.
    *
    * Input tuples are (key, ts, id); complements [[sessionize]] with
    * per-session id accounting and the inclusive end. */
  def sessionizeTws(events: Dataset[(Long, java.sql.Timestamp, Long)],
      gapMinutes: Int, watermark: String): Dataset[TwsClosedSession] = {
    val s = events.sparkSession
    import s.implicits._
    events.toDF("user_id", "ts", "id")
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(new TwsSessionProcessor(gapMinutes * 60000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** The StatefulProcessor behind [[sessionizeTws]]. The timer-hygiene
    * invariant: whenever the ValueState holds an open session, exactly
    * one timer exists, at lastMs + gap — extending the session deletes
    * the old timer before registering the new one, and the expiry guard
    * (`expiry == last + gap`) makes any stale timer a no-op instead of a
    * premature close. */
  private class TwsSessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp, Long), TwsClosedSession] {
    @transient private var open:
      org.apache.spark.sql.streaming.ValueState[TwsOpenSession] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      open = getHandle.getValueState("open",
        org.apache.spark.sql.Encoders.product[TwsOpenSession],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def closed(key: Long, s: TwsOpenSession) = TwsClosedSession(
      key, Math.floorDiv(s.startMs, 1000L), Math.floorDiv(s.lastMs, 1000L),
      s.n, s.idSum)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsClosedSession] = {
      val sorted = rows.toArray.sortBy(r => (r._2.getTime, r._3))
      if (sorted.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[TwsClosedSession]
      // Cross-batch out-of-order (within watermark): the restored open
      // session may START LATER than incoming events. Re-sessionize the
      // open session TOGETHER with the batch as sorted INTERVALS — an
      // open session is a valid session (internal events chain within
      // gap), so interval-gap merging reproduces exact point
      // sessionization: a late event within gap of the open session's
      // start merges and moves startMs BACKWARD; one farther back than
      // the gap forms a separate earlier session (closed here when the
      // open session follows it beyond the gap).
      val items = sorted.iterator.map { case (_, ts, id) =>
        TwsOpenSession(ts.getTime, ts.getTime, 1L, id) }.toArray
      val all =
        if (open.exists()) {
          val prev = open.get()
          getHandle.deleteTimer(prev.lastMs + gapMs)
          (prev +: items).sortBy(s => (s.startMs, s.lastMs, s.idSum))
        } else items
      var cur: TwsOpenSession = null
      all.foreach { it =>
        if (cur == null) cur = it
        else if (it.startMs - cur.lastMs > gapMs) {
          out += closed(key, cur)
          cur = it
        } else cur = TwsOpenSession(cur.startMs,
          math.max(cur.lastMs, it.lastMs), cur.n + it.n, cur.idSum + it.idSum)
      }
      open.update(cur)
      getHandle.registerTimer(cur.lastMs + gapMs)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[TwsClosedSession] =
      if (open.exists() &&
          open.get().lastMs + gapMs == info.getExpiryTimeInMs) {
        val s = open.get()
        open.clear()
        Iterator.single(closed(key, s))
      } else Iterator.empty
  }
}
