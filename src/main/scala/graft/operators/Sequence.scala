package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared guard for the bounded-per-key-events contract of the fold
  * operators ([[Sequence.funnelStages]], [[Stats.emaPerKey]]): when a cap
  * is set, a cheap partial-aggregated count runs FIRST and names the
  * offending key, so one hot key fails loudly up front instead of
  * silently OOMing an executor inside collect_list. Opt-in (cap 0 = off)
  * because it costs one extra pass over the input. */
private[operators] object BoundedKeys {
  def enforce(df: DataFrame, keyCol: String, cap: Int, op: String): Unit =
    if (cap > 0) {
      df.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > cap)
        .limit(1).collect().headOption.foreach { r =>
          throw new IllegalArgumentException(
            s"$op: key ${r.get(0)} has ${r.getLong(1)} events, over " +
              s"maxEventsPerKey=$cap — the per-key fold materializes the " +
              "key's full event list; unbounded keys belong in the " +
              "streaming custom-state form")
        }
    }
}

/** Event-sequence analytics: per-key ORDERED pattern matching expressed
  * as a deterministic left fold over the key's time-sorted events — the
  * portable core of MATCH_RECOGNIZE-style funnels. The fold is plain
  * expression arithmetic (a CASE chain over an integer state), so any
  * engine with a list fold reproduces it exactly; the collect_list is
  * bounded by the per-key event count (the same contract as
  * [[Stats.emaPerKey]]; unbounded keys belong in the streaming
  * custom-state API). */
object Sequence {

  /** Furthest funnel stage reached per key: stage i+1 is entered when an
    * event of type `steps(i)` arrives while the key sits at stage i —
    * strictly ordered, so a purchase BEFORE the first view does not
    * count. Returns `(keyCol, funnel_stage)` with stage in
    * [0, steps.length]. `maxEventsPerKey` (0 = off) enforces the
    * bounded-key contract up front via [[BoundedKeys]]. */
  def funnelStages(events: DataFrame, keyCol: String, orderCols: Seq[String],
      typeCol: String, steps: Seq[String], maxEventsPerKey: Int = 0): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(orderCols.nonEmpty, "funnel needs ordering columns")
    BoundedKeys.enforce(events, keyCol, maxEventsPerKey, "funnelStages")
    val arr = sort_array(collect_list(struct(
      orderCols.map(col) :+ col(typeCol).as("_t"): _*)))
    def advance(acc: Column, x: Column): Column =
      steps.zipWithIndex.foldRight(acc) { case ((step, i), els) =>
        when(acc === i && x.getField("_t") === step, lit(i + 1)).otherwise(els)
      }
    events.groupBy(col(keyCol))
      .agg(arr.as("_a"))
      .select(col(keyCol),
        aggregate(col("_a"), lit(0), advance).cast("long").as("funnel_stage"))
  }

  /** Funnel report: how many keys reached each stage (exactly — not
    * cumulative; cumulate downstream if needed). */
  def funnelCounts(events: DataFrame, keyCol: String, orderCols: Seq[String],
      typeCol: String, steps: Seq[String]): DataFrame =
    funnelStages(events, keyCol, orderCols, typeCol, steps)
      .groupBy(col("funnel_stage"))
      .agg(count(lit(1)).as("n_keys"))

  /** Batch SESSIONIZATION — the gaps-and-islands rule: within a key,
    * consecutive events belong to one session until the time gap to the
    * previous event exceeds `gapSec`; then a new session starts. The
    * batch twin of Structured Streaming's `session_window` (which covers
    * the live path in streaming/StreamingSync) — this form replays
    * history at rest, where the streaming operator cannot.
    *
    * Per-key event order must be TOTAL for the lag to be deterministic:
    * `tieCol` (a unique event id) breaks same-second ties. Output: one
    * row per session — (key, session_id 1-based within key, start_sec,
    * end_sec, n_events).
    *
    * Scale shape: one hash exchange on the key; both windows (lag, then
    * running session counter) and the final groupBy reuse that
    * clustering — no global sort, parallel across keys, O(events/key)
    * per task. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSec: Long): DataFrame = {
    require(gapSec > 0, s"gapSec $gapSec must be positive")
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col(keyCol).as("key"),
      col(tsCol).cast("long").as("_sec"), col(tieCol).as("_tie"))
    val w = Window.partitionBy(col("key")).orderBy(col("_sec"), col("_tie"))
    val prev = lag(col("_sec"), 1).over(w)
    base
      .withColumn("_new",
        when(prev.isNull || col("_sec") - prev > gapSec, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new")).over(w))
      .groupBy(col("key"), col("session_id"))
      .agg(min(col("_sec")).as("start_sec"), max(col("_sec")).as("end_sec"),
        count(lit(1)).as("n_events"))
  }

  /** SCD Type-2 history build — the dimension-table form of "what was
    * this entity's state at time t": consecutive duplicate states
    * collapse, each surviving change opens a validity range
    * `[valid_from, valid_to)` closed by the NEXT change, and the last
    * range per key is open-ended (`valid_to` NULL, `is_current` true).
    * The reference's sync engine keeps only latest-or-versioned rows
    * (lib/FirestoreWrapper.py version chains); this is the queryable
    * range form warehouses build from exactly that history.
    *
    * Per-key order must be TOTAL (`tieCol` breaks same-second ties) or
    * the lag/lead pair is nondeterministic. NULL states are dropped up
    * front — a NULL attribute is an unknown observation, not a state
    * transition. Scale shape: ONE hash exchange on the key; the
    * change-detection lag, the range-closing lead, and their filters
    * all reuse that clustering — no global sort, parallel across keys. */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col(keyCol).as("key"),
      col(attrCol).as("state"), col(tsCol).cast("long").as("_sec"),
      col(tieCol).as("_tie"))
      .filter(col("state").isNotNull)
    val w = Window.partitionBy(col("key")).orderBy(col("_sec"), col("_tie"))
    val changes = base
      .withColumn("_prev", lag(col("state"), 1).over(w))
      .filter(col("_prev").isNull || col("state") =!= col("_prev"))
    // second window over the FILTERED frame: same key clustering, so no
    // new exchange — lead closes each range with the next change
    changes
      .withColumn("valid_to", lead(col("_sec"), 1).over(w))
      .select(col("key"), col("state"), col("_sec").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** Coalesce overlapping/touching per-key intervals `[start, end)` into
    * maximal disjoint spans — activity coverage, downtime merging, lease
    * union. Classic gaps-and-islands on the RUNNING MAX of interval
    * ends: a new island starts exactly where an interval begins after
    * every earlier interval has closed. One hash exchange on the key +
    * one in-partition sort — no self-join, no explode-per-second;
    * abutting intervals (start == previous end) merge, a zero-length
    * interval never splits a span. Output:
    * `(key, island, start_sec, end_sec)` with island numbered from 1 in
    * time order. */
  def coalesceIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("_s"), col("_e"))
    val wPrev = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(keyCol).as("key"),
        col(startCol).cast("long").as("_s"), col(endCol).cast("long").as("_e"))
      .where(col("_s").isNotNull && col("_e").isNotNull && col("_e") >= col("_s"))
      .withColumn("_prevMaxEnd", max(col("_e")).over(wPrev))
      .withColumn("_newIsland",
        when(col("_prevMaxEnd").isNull || col("_s") > col("_prevMaxEnd"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("_newIsland")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("key"), col("island"))
      .agg(min(col("_s")).as("start_sec"), max(col("_e")).as("end_sec"))
  }
}
