package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates — the materialized-
  * rollup pattern: per-(key, period) PARTIALS are the persisted unit;
  * a new day's data appends its partials; totals fold from partials
  * without ever rescanning history. COUNT/SUM/AVG/VAR/MIN/MAX all
  * decompose algebraically (n, s1, s2, mn, mx), so the fold is
  * bit-identical to recomputation from raw: decimal moment sums are
  * aggregation-order-exact, and the final ops are correctly-rounded
  * IEEE (the q106/q72 parity discipline).
  *
  * Reference ties: the sync engine re-reads the full source per run
  * to rebuild derived state (`lib/DataProcessor.py` pipelines); at
  * 100 TB a rollup touched by every run must instead maintain
  * partials — one period's scan per increment, kilobytes per key
  * moved at fold time.
  */
object IncrementalAgg {

  /** Algebraic partials of `valueCol` per (keyCols..., period): the
    * increment unit. One partial-aggregated pass over the slice; the
    * output is (keys, period, n, s1, s2, mn, mx) with DECIMAL-exact
    * moments — safe to persist, union with later periods, re-fold. */
  def partials(df: DataFrame, keyCols: Seq[String], periodCol: Column,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "partials need at least one key column")
    val v = col(valueCol).cast("double")
    df.groupBy(keyCols.map(col) :+ periodCol.as("period"): _*).agg(
      count(lit(1)).as("n"),
      sum(v.cast("decimal(28,12)")).as("s1"),
      sum((v * v).cast("decimal(28,12)")).as("s2"),
      min(v).as("mn"), max(v).as("mx"))
  }

  /** Fold a partials frame (any number of periods, any number of
    * unioned increments) to per-key totals: n, sum, avg, population
    * variance, min, max — sum/avg/var on the 1e-6 floor lattice so the
    * values hash-reproduce across engines at any parallelism. */
  def rollup(partialsDf: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "rollup needs at least one key column")
    def r6(c: Column): Column = floor(c * lit(1000000) + lit(0.5)) / lit(1000000)
    val folded = partialsDf.groupBy(keyCols.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("s1")).as("s1"),
      sum(col("s2")).as("s2"),
      min(col("mn")).as("mn"), max(col("mx")).as("mx"))
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    folded.select(keyCols.map(col) ++ Seq(
      col("n"),
      r6(s1).as("sum_value"),
      r6(s1 / n).as("avg_value"),
      r6((s2 - s1 * s1 / n) / n).as("var_value"),
      col("mn").as("min_value"),
      col("mx").as("max_value")): _*)
  }

  /** RETRACTION-aware maintenance — incremental view maintenance for a
    * changelog of inserts AND deletes, the step beyond [[partials]]'
    * append-only increments (a correction/GDPR-deletion/late-data feed
    * is never append-only):
    *
    *   - COUNT/SUM/SUMSQ retract algebraically: the changelog's partials
    *     are folded in SIGNED (+1 insert, -1 delete) — no history
    *     rescan, DECIMAL-exact, so retract-then-fold is bit-identical
    *     to rebuild.
    *   - MIN/MAX cannot retract (deleting the current minimum says
    *     nothing about the runner-up), so they are recomputed ONLY for
    *     the (key, period) groups the changelog touched, by a
    *     semi-join-pruned scan of the post-change raw slice. Untouched
    *     groups keep their stored extrema untouched. At 100 TB the
    *     touched set is the changelog's key set — tiny and
    *     broadcastable — so the "rescan" reads one key-pruned sliver,
    *     not history.
    *
    * Groups whose rows are all deleted leave the state (n=0 rows drop);
    * groups born in the changelog enter it. Output is partials-shaped:
    * feed it to [[rollup]] exactly like any other partials frame. */
  def applyChangelog(state: DataFrame, changes: DataFrame,
      rawAfter: DataFrame, keyCols: Seq[String], periodOf: Column => Column,
      tsCol: String, valueCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    val sign = when(col(opCol) === "D", lit(-1L)).otherwise(lit(1L))
    val v = col(valueCol).cast("double")
    val signed = changes.groupBy(
        keyCols.map(col) :+ periodOf(col(tsCol)).as("period"): _*)
      .agg(sum(sign).as("n"),
        sum((sign.cast("double") * v).cast("decimal(28,12)")).as("s1"),
        sum((sign.cast("double") * v * v).cast("decimal(28,12)")).as("s2"))
    // additive moments: one union + one fold, no raw access
    val additive = state.select(
        (keyCols.map(col) ++ Seq(col("period"), col("n"), col("s1"), col("s2"))): _*)
      .unionByName(signed)
      .groupBy(keyCols.map(col) :+ col("period"): _*)
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"), sum(col("s2")).as("s2"))
      .filter(col("n") > 0L)
    // extrema: recompute ONLY the touched groups from the post-change
    // raw, pruned by a broadcastable semi join on the changelog's keys
    val touched = signed.select(keyCols.map(col) :+ col("period"): _*).distinct()
    val prunedRaw = rawAfter
      .withColumn("period", periodOf(col(tsCol)))
      .join(broadcast(touched), keyCols :+ "period", "left_semi")
    val rescanned = prunedRaw
      .groupBy(keyCols.map(col) :+ col("period"): _*)
      .agg(min(v).as("mn_new"), max(v).as("mx_new"))
    val oldExtrema = state.select(
      (keyCols.map(col) ++ Seq(col("period"),
        col("mn").as("mn_old"), col("mx").as("mx_old"))): _*)
    additive
      .join(oldExtrema, keyCols :+ "period", "left")
      .join(rescanned, keyCols :+ "period", "left")
      .select((keyCols.map(col) ++ Seq(col("period"),
        col("n"), col("s1"), col("s2"),
        coalesce(col("mn_new"), col("mn_old")).as("mn"),
        coalesce(col("mx_new"), col("mx_old")).as("mx"))): _*)
  }

  /** Signed incremental JOIN maintenance — the bilinear delta rule over
    * Z-relations (rows carry an integer multiplicity `m`; a delete is a
    * -1 row): Δ(L ⋈ R) = ΔL⋈R + L⋈ΔR + ΔL⋈ΔR, with multiplicities
    * MULTIPLYING across the join (differential-dataflow/DBSP's join
    * rule). `oldL`/`oldR` are the consolidated pre-delta sides; the
    * returned delta unions with the old join state and
    * [[consolidate]]s. The cost per increment is |ΔL|·matches +
    * |ΔR|·matches — never a rescan of L⋈R — which is what keeps a
    * continuously-maintained join view affordable at 100 TB: the deltas
    * are small however big the sides are. Retractions compose exactly:
    * deleting an L row emits -1·(its matches), cancelling the joined
    * rows algebraically. */
  def joinDelta(oldL: DataFrame, oldR: DataFrame,
      dL: DataFrame, dR: DataFrame, keys: Seq[String],
      mult: String = "m"): DataFrame = {
    require(keys.nonEmpty, "joinDelta needs join keys")
    def parts(l: DataFrame, r: DataFrame): DataFrame = {
      val lm = l.withColumnRenamed(mult, "_ml")
      val rm = r.withColumnRenamed(mult, "_mr")
      lm.join(rm, keys)
        .withColumn(mult, col("_ml") * col("_mr"))
        .drop("_ml", "_mr")
    }
    parts(dL, oldR)
      .unionByName(parts(oldL, dR))
      .unionByName(parts(dL, dR))
  }

  /** Collapse a signed multiset to net multiplicities, dropping
    * cancelled rows. The state normal form between increments. */
  def consolidate(state: DataFrame, mult: String = "m"): DataFrame = {
    val dims = state.columns.filterNot(_ == mult).toSeq
    state.groupBy(dims.map(col): _*)
      .agg(sum(col(mult)).as(mult))
      .filter(col(mult) =!= 0L)
  }
}
