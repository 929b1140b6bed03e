package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketch-based scale path for order
  * statistics and cardinality where the exact forms (sort-based
  * percentile, distinct-count shuffle) stop being affordable:
  *
  *  - quantiles via `approx_percentile` (KLL-style sketch: bounded
  *    memory, partial-aggregated, mergeable across executors);
  *  - distinct counts via HyperLogLog++ (`approx_count_distinct`,
  *    constant ~1.5 KB state per group at 5% error).
  *
  * Exact counterparts stay available (percentile / count distinct) and
  * the spec pins the approximation error against them. The gate's
  * oracle-checked queries use only exact forms — sketches are not
  * reproducible across engines by construction. */
object Stats {

  /** The one clamped fixed-histogram bin expression every estimator in
    * this file shares: `floor((v − lo) / (hi − lo) · bins)` clamped to
    * `[0, bins)` — extracted so the four consumers (global and per-group
    * quantiles, both drift forms) and their oracle SQL mirrors can never
    * silently diverge. */
  private def binExpr(valueCol: String, lo: Double, hi: Double,
      bins: Int): Column =
    least(greatest(
      floor((col(valueCol).cast("double") - lit(lo)) / lit(hi - lo) * lit(bins)),
      lit(0.0)), lit((bins - 1).toDouble)).cast("long")

  /** EXACT per-group weighted quantile — the order statistic under
    * integer row weights (sampling multiplicities, token counts,
    * replication factors): the smallest value whose cumulative weight
    * reaches `qNum/qDen` of the group's total. Fully declarative and
    * engine-exact: ONE hash exchange (the window's partitioning, reused
    * by the final aggregate), a cumulative-sum window ordered by value,
    * and an integer-arithmetic crossing test `cumw · qDen >= qNum · W` —
    * no doubles, no sort beyond the window's own, no driver state, no
    * group-count cap (contrast [[exactQuantilesPerGroup]], whose
    * histogram refinement is the unweighted wide-range path). Ties on
    * the value are safe: every row of a tied run carries the same
    * value, so whichever tie crosses first answers identically.
    * NULL keys/values and non-positive weights are excluded (documented
    * contract — a non-positive multiplicity is data damage). */
  def weightedQuantilePerGroup(df: DataFrame, keyCol: String,
      valueCol: String, weightCol: String, qNum: Long, qDen: Long): DataFrame = {
    require(qDen > 0 && qNum >= 0 && qNum <= qDen,
      s"quantile $qNum/$qDen must lie in [0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.filter(col(keyCol).isNotNull && col(valueCol).isNotNull &&
        col(weightCol).cast("long") > 0)
      .select(col(keyCol), col(valueCol).cast("double").as("_v"),
        col(weightCol).cast("long").as("_w"))
      .withColumn("_cumw", sum(col("_w")).over(w))
      .withColumn("_tot", sum(col("_w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))))
      .filter(col("_cumw") * lit(qDen) >= lit(qNum) * col("_tot"))
      .groupBy(col(keyCol))
      .agg(min(col("_v")).as("value"),
        max(col("_tot")).as("total_weight"))
  }

  /** Approximate quantiles per group; `accuracy` trades memory for error
    * (err <= 1/accuracy of the rank). */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val probsExpr = probs.mkString("array(", ", ", ")")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_percentile($valueCol, $probsExpr, $accuracy)").as("quantiles"))
  }

  /** Approximate distinct cardinality per group (HLL++, default 5% rsd). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Reusable HLL-style sketch column for pre-aggregated rollups: count
    * distinct over arbitrary re-groupings without rescanning, via
    * hll_sketch_agg/hll_union_agg. */
  def hllSketch(c: Column): Column = hll_sketch_agg(c)
  def hllUnion(c: Column): Column = hll_union_agg(c)
  def hllEstimate(c: Column): Column = hll_sketch_estimate(c)

  /** Deterministic binned quantile estimate — the REPRODUCIBLE scale path
    * for percentiles. Exact percentiles need a full sort (q34's route —
    * fine per group, hopeless per 100 TB column), and approx_percentile's
    * sketch is engine- and merge-order-specific; a fixed [lo, hi] / bins
    * histogram instead costs ONE partial-aggregated count pass with exact
    * integer bin counts, and each requested quantile interpolates inside
    * its bin with single IEEE ops — bit-reproducible at any parallelism
    * and in any engine. Error is bounded by the bin width (caller picks
    * the resolution); values outside [lo, hi] clamp into the edge bins,
    * NULLs are excluded. Everything after the first aggregation operates
    * on at most `bins` rows. Output: one (q, bin, quantile_est) row per
    * requested quantile. */
  def binnedQuantiles(df: DataFrame, valueCol: String, lo: Double,
      hi: Double, bins: Int, qs: Seq[Double]): DataFrame = {
    require(bins > 0, s"bins $bins must be positive")
    require(hi > lo, s"need hi $hi > lo $lo")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    val width = (hi - lo) / bins
    val bin = binExpr(valueCol, lo, hi, bins)
    val counts = df.filter(col(valueCol).isNotNull)
      .select(bin.as("bin")).groupBy("bin").agg(count(lit(1)).as("bn"))
    // the remaining plan touches <= bins rows: a single-partition window
    // for the cumulative count is the right plan, not a hazard
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = counts
      .withColumn("cum", sum(col("bn")).over(w))
      .withColumn("cum_prev", col("cum") - col("bn"))
      .crossJoin(counts.agg(sum(col("bn")).as("n_total")))
    val qframe = df.sparkSession.range(1)
      .select(explode(array(qs.map(lit): _*)).as("q"))
    cum.crossJoin(qframe)
      .filter(col("cum").cast("double") >= col("q") * col("n_total").cast("double"))
      .groupBy(col("q"))
      .agg(min(struct(col("bin"), col("bn"), col("cum_prev"), col("n_total"))).as("s"))
      .select(col("q"), col("s.bin").as("bin"),
        (lit(lo) + lit(width) * (col("s.bin").cast("double") +
          least(greatest(
            (col("q") * col("s.n_total").cast("double") -
              col("s.cum_prev").cast("double")) / col("s.bn").cast("double"),
            lit(0.0)), lit(1.0)))).as("quantile_est"))
  }

  /** Per-group WEIGHTED median — the importance-weighted robust center
    * ("median token count weighted by document length"): the smallest
    * value whose cumulative weight reaches half the group's total
    * (the lower weighted median — a value from the data, never an
    * interpolation). Weights must be integral (cast to long; NULL
    * weights and NULL values drop the row), so every cumulative sum is
    * exact and the pick reproduces in any engine. Equal values are
    * PEERS: the cumulative window uses the default RANGE frame, so all
    * rows at one value share one cumulative weight — no tie-order
    * sensitivity.
    *
    * Scale shape: one hash exchange on the group key; two key-partitioned
    * windows and one groupBy reuse the clustering. */
  def weightedMedianPerGroup(df: DataFrame, keyCol: String,
      valueCol: String, weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .select(col(keyCol).as("key"), col(valueCol).cast("double").as("v"),
        col(weightCol).cast("long").as("w"))
    val cum = Window.partitionBy(col("key")).orderBy(col("v"))
    val tot = Window.partitionBy(col("key"))
    base
      .withColumn("cumw", sum(col("w")).over(cum))
      .withColumn("totw", sum(col("w")).over(tot))
      .groupBy(col("key"))
      .agg(min(when(col("cumw") * 2 >= col("totw"), col("v")))
        .as("weighted_median"))
  }

  /** Per-GROUP binned quantiles — [[binnedQuantiles]] partitioned by a
    * key: the percentile path that scales to millions of groups (the
    * exact interpolated form [[winsorizePerGroup]] uses needs each
    * group's values sorted; this one needs one count pass and ≤ `bins`
    * rows per group, hash-reproducible at any parallelism). Same fixed
    * [lo, hi) histogram, same in-bin linear interpolation, same IEEE
    * shapes — one (q, bin, quantile_est) row set per group. The
    * cumulative window partitions BY KEY (parallel across groups — never
    * the single-partition form the global version is allowed on its
    * ≤ bins rows). */
  def binnedQuantilesPerGroup(df: DataFrame, keyCol: String,
      valueCol: String, lo: Double, hi: Double, bins: Int,
      qs: Seq[Double]): DataFrame = {
    require(bins > 0, s"bins $bins must be positive")
    require(hi > lo, s"need hi $hi > lo $lo")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    val width = (hi - lo) / bins
    val bin = binExpr(valueCol, lo, hi, bins)
    val counts = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), bin.as("bin"))
      .groupBy("key", "bin").agg(count(lit(1)).as("bn"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tw = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    val cum = counts
      .withColumn("cum", sum(col("bn")).over(w))
      .withColumn("cum_prev", col("cum") - col("bn"))
      .withColumn("n_total", sum(col("bn")).over(tw))
    val qframe = df.sparkSession.range(1)
      .select(explode(array(qs.map(lit): _*)).as("q"))
    cum.crossJoin(qframe)
      .filter(col("cum").cast("double") >= col("q") * col("n_total").cast("double"))
      .groupBy(col("key"), col("q"))
      .agg(min(struct(col("bin"), col("bn"), col("cum_prev"), col("n_total"))).as("s"))
      .select(col("key"), col("q"), col("s.bin").as("bin"),
        (lit(lo) + lit(width) * (col("s.bin").cast("double") +
          least(greatest(
            (col("q") * col("s.n_total").cast("double") -
              col("s.cum_prev").cast("double")) / col("s.bn").cast("double"),
            lit(0.0)), lit(1.0)))).as("quantile_est"))
  }

  /** Per-group z-score normalization (feature scaling): attach
    * `(v - mean) / stddev_pop` computed from window aggregates whose sums
    * route through DECIMAL — the moments are aggregation-order-exact, so
    * every downstream double op is deterministic and engine-portable
    * (plain double window sums would drift in the last ulp with
    * partition order). One hash exchange on the group key. */
  def zscorePerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      zCol: String = "zscore"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)
    val v = col(valueCol).cast("double")
    val s1 = sum(v.cast("decimal(28,12)")).over(w).cast("double")
    val s2 = sum((v * v).cast("decimal(28,12)")).over(w).cast("double")
    // count the VALUES, not the rows: sums skip nulls, so a row count
    // would deflate the mean and inflate the variance in null-bearing
    // groups (null rows still get a null z, which is right)
    val n = count(v).over(w).cast("double")
    val mean = s1 / n
    val variance = (s2 - s1 * s1 / n) / n
    // explicit NULL for degenerate (constant or single-value) groups: a
    // bare divide-by-zero happens to be NULL here but ±inf/NaN in
    // IEEE-mode engines — the guard makes the semantics engine-portable
    df.withColumn(zCol, when(variance > 0, (v - mean) / sqrt(variance)))
  }

  /** Per-group winsorization (quantile clipping): clamp `valueCol` into
    * its group's continuous [pLo, pHi] quantiles — outlier-robust
    * feature scaling. Quantiles are computed ONCE per group, and the
    * one-row-per-group bounds frame is broadcast back, so the data-sized
    * side never shuffles. Assumes bounded group cardinality (the
    * broadcast hint makes that explicit).
    *
    * `accuracy` picks the quantile engine: 0 = exact `percentile`
    * (linear interpolation, the engine-portable quantile_cont semantics
    * — but the exact aggregate BUFFERS every group value in its
    * aggregation state, so a billion-row group belongs on the approx
    * path); > 0 = `approx_percentile(accuracy)`, bounded memory at any
    * group size with rank error ≤ 1/accuracy. NULL values take no part
    * in the quantiles and stay NULL; a NULL GROUP is a group of its own
    * (null-safe join — its rows clamp among themselves, matching groupBy
    * semantics, instead of silently vanishing as a plain equi-join
    * would). */
  def winsorizePerGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, pLo: Double, pHi: Double,
      outCol: String = "winsorized", accuracy: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "winsorize needs group columns")
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    require(accuracy >= 0, s"accuracy $accuracy must be >= 0 (0 = exact)")
    val lo = TempCols.fresh(df, "_lo")
    val hi = TempCols.fresh(df, "_hi")
    def q(p: Double): Column =
      if (accuracy == 0) expr(s"percentile($valueCol, $p)")
      else expr(s"approx_percentile($valueCol, $p, $accuracy)").cast("double")
    val grp = groupCols.map(c => TempCols.fresh(df, s"_g_$c"))
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(q(pLo).as(lo), q(pHi).as(hi))
      .select(groupCols.zip(grp).map { case (c, g) => col(c).as(g) } ++
        Seq(col(lo), col(hi)): _*)
    val cond = groupCols.zip(grp).map { case (c, g) => df(c) <=> col(g) }
      .reduce(_ && _)
    df.join(broadcast(bounds), cond)
      // greatest/least IGNORE nulls (they would clamp a NULL value to the
      // lower bound) — the null-in/null-out contract needs the guard
      .withColumn(outCol, when(col(valueCol).isNotNull,
        least(greatest(col(valueCol).cast("double"), col(lo)), col(hi))))
      .drop(grp: _*).drop(lo, hi)
  }

  /** One-pass column profile — the data-audit report (row counts, null
    * counts, distinct cardinality, min/max) for every listed column in a
    * SINGLE scan: all metrics are aggregate expressions in one agg, and
    * the one-row result pivots to a per-column frame driver-side (it is
    * metrics-sized, not data-sized). Numeric min/max surface as doubles,
    * string min/max as strings — never engine-formatted number-to-string
    * casts, which would not be portable. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val isNum = cols.map(c =>
      c -> df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).toMap
    val aggs = cols.flatMap { c =>
      val numOrNull = (f: Column => Column) =>
        if (isNum(c)) f(col(c)).cast("double") else lit(null).cast("double")
      val strOrNull = (f: Column => Column) =>
        if (isNum(c)) lit(null).cast("string") else f(col(c)).cast("string")
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        numOrNull(min).as(s"${c}__min_num"), numOrNull(max).as(s"${c}__max_num"),
        strOrNull(min).as(s"${c}__min_str"), strOrNull(max).as(s"${c}__max_str"))
    } :+ count(lit(1)).as("__n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = one.select(col("__n_rows"), explode(array(cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__nulls").as("n_nulls"), col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min_num").as("min_num"), col(s"${c}__max_num").as("max_num"),
        col(s"${c}__min_str").as("min_str"), col(s"${c}__max_str").as("max_str"))
    }: _*)).as("p"))
    rows.select(col("p.column").as("column"), col("__n_rows").as("n_rows"),
      col("p.n_nulls"), col("p.n_distinct"), col("p.min_num"), col("p.max_num"),
      col("p.min_str"), col("p.max_str"))
  }

  /** 2-D CHI-SQUARE INDEPENDENCE audit — "is this feature associated
    * with that label?" without libm: `x` binned onto the fixed
    * [lo, hi] grid (the [[binExpr]] clamp — mis-scaled values stay
    * visible in the boundary bins), `y` categorical, and the statistic
    * Σ (O−E)²/E assembled deterministically: observed counts and
    * marginal totals are exact integers, E = rowTot·colTot/N is one
    * IEEE divide per cell (the long product exact), each cell term
    * snaps to the 1e-6 lattice, and the final sum routes through
    * DECIMAL so cell order can never perturb it. The 1-D two-sample
    * form is [[distributionDrift]]; this is its feature-vs-label
    * sibling (leakage screening, stratification checks).
    *
    * NULL x or y rows drop. Returns one row per OBSERVED (bin, y)
    * cell: (bin, y, o, e [1e-6], term [1e-6]) — callers aggregate
    * `sum(term)` for the statistic and count distinct bins/categories
    * for the dof, both trivially exact downstream. Scale shape: one
    * partial-aggregated (bin, y) count — the only data-sized shuffle —
    * then marginal joins on ≤bins and ≤|labels| rows. */
  def chiSquareCells(df: DataFrame, xCol: String, lo: Double, hi: Double,
      bins: Int, yCol: String): DataFrame = {
    require(bins > 0, s"bins $bins must be positive")
    require(hi > lo, s"need hi $hi > lo $lo")
    val lattice6 = (c: Column) => floor(c * 1000000 + 0.5) / 1000000
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(binExpr(xCol, lo, hi, bins).as("bin"),
        col(yCol).cast("string").as("y"))
      .groupBy("bin", "y").agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("bin").agg(sum(col("o")).as("_rt"))
    val colTot = cells.groupBy("y").agg(sum(col("o")).as("_ct"))
    val n = cells.agg(sum(col("o")).as("_n"))
    val e = (col("_rt") * col("_ct")).cast("double") / col("_n").cast("double")
    cells
      .join(broadcast(rowTot), "bin")
      .join(broadcast(colTot), "y")
      .crossJoin(broadcast(n))
      .select(col("bin"), col("y"), col("o"),
        lattice6(e).as("e"),
        lattice6((col("o").cast("double") - e) *
          (col("o").cast("double") - e) / e).as("term"))
  }

  /** Snapshot PROFILE DRIFT — the column-level diff a nightly data-ops
    * gate runs between yesterday's and today's table before promoting:
    * [[columnProfile]] on both sides joined per column, with the
    * derived signals (null-rate delta on the 1e-6 lattice, distinct
    * ratio, range movement) that decide "ship / investigate". Both
    * profiles are ONE aggregation pass each; the join frame is
    * |columns| rows. `range_moved` uses null-safe comparison across the
    * numeric AND string min/max, so a column gaining its first NULLs or
    * an all-NULL column appearing reads as movement, not as equality.
    *
    * NULL `null_rate` on an empty side (0 rows) keeps 0/0 out of the
    * report — an empty snapshot is a louder signal than any rate. */
  def profileDrift(oldDf: DataFrame, newDf: DataFrame,
      cols: Seq[String]): DataFrame = {
    val lattice6 = (c: Column) => floor(c * 1000000 + 0.5) / 1000000
    def side(df: DataFrame, p: String): DataFrame =
      columnProfile(df, cols).select(col("column"),
        col("n_rows").as(s"${p}_n_rows"), col("n_nulls").as(s"${p}_n_nulls"),
        col("n_distinct").as(s"${p}_n_distinct"),
        col("min_num").as(s"${p}_min_num"), col("max_num").as(s"${p}_max_num"),
        col("min_str").as(s"${p}_min_str"), col("max_str").as(s"${p}_max_str"))
    def rate(p: String): Column = when(col(s"${p}_n_rows") > 0,
      lattice6(col(s"${p}_n_nulls").cast("double") /
        col(s"${p}_n_rows").cast("double")))
    side(oldDf, "old").join(side(newDf, "new"), "column")
      .select(col("column"),
        col("old_n_rows"), col("new_n_rows"),
        col("old_n_nulls"), col("new_n_nulls"),
        rate("old").as("old_null_rate"), rate("new").as("new_null_rate"),
        (rate("new") - rate("old")).as("null_rate_delta"),
        col("old_n_distinct"), col("new_n_distinct"),
        when(col("old_n_distinct") > 0, lattice6(
          col("new_n_distinct").cast("double") /
            col("old_n_distinct").cast("double"))).as("distinct_ratio"),
        (!(col("old_min_num") <=> col("new_min_num")) ||
          !(col("old_max_num") <=> col("new_max_num")) ||
          !(col("old_min_str") <=> col("new_min_str")) ||
          !(col("old_max_str") <=> col("new_max_str"))).as("range_moved"))
  }

  /** Per-key exponential moving average over the key's events in
    * `orderCols` order, seeded with the first value:
    * `ema_1 = x_1; ema_i = alpha*x_i + (1-alpha)*ema_{i-1}`.
    *
    * The recurrence is order-sensitive, so it folds a sorted per-key
    * array left-to-right — a deterministic sequential reduction that any
    * engine with a list fold reproduces exactly (with a dyadic alpha
    * like 0.5, bit-for-bit). The collect_list is bounded by the per-key
    * event count; for unbounded keys use the streaming form
    * ([[graft.streaming.StreamingSync.emaPerKey]]), whose state is O(1)
    * per key. `maxEventsPerKey` (0 = off) enforces that contract up front
    * via [[Sequence]]'s shared [[BoundedKeys]] guard. */
  def emaPerKey(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, alpha: Double, maxEventsPerKey: Int = 0): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
    BoundedKeys.enforce(df, keyCol, maxEventsPerKey, "emaPerKey")
    val packed = sort_array(collect_list(struct(
      orderCols.map(col) :+ col(valueCol).cast("double").as("_v"): _*)))
    df.groupBy(col(keyCol))
      .agg(packed.as("_a"))
      .select(col(keyCol),
        size(col("_a")).cast("long").as("n_events"),
        aggregate(
          slice(col("_a"), lit(2), greatest(size(col("_a")) - 1, lit(0))),
          element_at(col("_a"), 1).getField("_v"),
          (acc, x) => lit(alpha) * x.getField("_v") + lit(1 - alpha) * acc)
          .as("ema"))
  }

  /** Per-key EVENT-TIME rolling aggregate over a trailing window of
    * `windowSec` seconds (the "7-day rolling spend per user" shape):
    * attaches `n_win` / `sum_win` over the RANGE frame
    * `[t - windowSec + 1, t]` in floor-epoch-seconds. A RANGE frame is
    * peer-inclusive, so rows inside the same second share one frame and
    * the result is deterministic no matter how ties are ordered — a ROWS
    * frame would not be.
    *
    * Scale shape: one hash exchange on the key + per-partition sort —
    * the minimum any per-key windowing needs; the frame is computed by
    * Spark's sliding window accumulator, not a per-row rescan. The sum
    * routes through DECIMAL(28,12) so accumulation order cannot perturb
    * the double result (the engine-parity rule used throughout). */
  def rollingPerKey(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowSec > 0, s"windowSec $windowSec must be positive")
    require(!df.columns.contains("n_win") && !df.columns.contains("sum_win"),
      "input already has an n_win/sum_win column")
    val sec = col(tsCol).cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(sec)
      .rangeBetween(-(windowSec - 1), 0)
    df.withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win",
        sum(col(valueCol).cast("decimal(28,12)")).over(w).cast("double"))
  }

  /** Per-key time-series GAP FILL — regularize an event stream onto a
    * fixed bucket grid with explicit zero rows for empty buckets, the
    * prerequisite for any windowed model input or rate chart ("events per
    * key per hour, including the hours with none"). Each key's grid spans
    * ITS OWN [min, max] bucket (a key absent for a month emits that
    * month's zeros only if it reappears — grids never extend past a key's
    * observed range, so the output is bounded by actual key lifetimes,
    * not by the global time span).
    *
    * Output: (key, bucket_start — epoch seconds, n — 0 for gaps, sum_val
    * — DECIMAL-routed sum of `valueCol`, 0.0 for gaps).
    *
    * Scale shape: one partial-aggregated groupBy to per-(key, bucket)
    * counts (the only data-sized shuffle), a per-key span aggregate on
    * the ALREADY-bucketed frame, then `sequence()` + explode to generate
    * each key's grid and a left join back on (key, bucket) — the
    * generated grid is (span / bucketSec) rows per key, never
    * events-sized. A key with a pathological span (one event, silence,
    * one event years later) is bounded by `maxBucketsPerKey` with a loud
    * failure rather than a silent 10^8-row explode. */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSec: Long,
      maxBucketsPerKey: Long = 1000000L): DataFrame = {
    require(bucketSec > 0, s"bucketSec $bucketSec must be positive")
    val bucket = (floor(col(tsCol).cast("long") / bucketSec) * bucketSec)
      .cast("long")
    val actual = df
      .select(col(keyCol).as("key"), bucket.as("bucket_start"),
        col(valueCol).cast("decimal(28,12)").as("_v"))
      .groupBy(col("key"), col("bucket_start"))
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("_sum"))
    val spans = actual.groupBy(col("key"))
      .agg(min(col("bucket_start")).as("_lo"), max(col("bucket_start")).as("_hi"))
    // the guard lives INSIDE the exploded expression — a side column
    // would be pruned away by the optimizer and never evaluated
    val gridSeq = when(
      (col("_hi") - col("_lo")) / bucketSec + 1 > maxBucketsPerKey,
      raise_error(concat(lit("gapFill: key "), col("key").cast("string"),
        lit(s" spans more than $maxBucketsPerKey buckets — widen bucketSec" +
          s" or raise maxBucketsPerKey"))).cast("array<bigint>"))
      .otherwise(sequence(col("_lo"), col("_hi"), lit(bucketSec)))
    val grid = spans.select(col("key"), explode(gridSeq).as("bucket_start"))
    grid.join(actual, Seq("key", "bucket_start"), "left")
      .select(col("key"), col("bucket_start"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("_sum").cast("double"), lit(0.0)).as("sum_val"))
  }

  /** Distribution DRIFT between two snapshots of a numeric column — the
    * data-quality gate that catches a silently shifted feature before it
    * poisons a training run ("did this week's corpus move?"). Both sides
    * are binned onto the same fixed [lo, hi) histogram (same binning as
    * [[binnedQuantiles]]) and compared per bin with the symmetric
    * chi-square-style term `(p − q)² / (p + q)` (p, q = the bin's rate on
    * each side). Deliberately NOT the textbook PSI/KL: those need ln(),
    * whose last ulp is libm-specific — this rational form is IEEE-exact
    * in any engine, monotone in the same drift, and bounded in [0, 2]
    * summed. The per-bin term lands on the 1e-12 integer lattice
    * (`drift12`), so callers sum LONGS — order-independent — for the
    * headline number.
    *
    * Output: one row per bin occupied on either side — (bin, cnt_a,
    * cnt_b, drift12). Scale shape: each side collapses to ≤ `bins` rows
    * in one partial-aggregated pass before anything joins; the
    * full-outer join and the rate arithmetic touch ≤ 2·bins rows. */
  def distributionDrift(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0, s"bins $bins must be positive")
    require(hi > lo, s"need hi $hi > lo $lo")
    def binned(df: DataFrame, cname: String): DataFrame = {
      val bin = binExpr(valueCol, lo, hi, bins)
      df.filter(col(valueCol).isNotNull)
        .select(bin.as("bin")).groupBy("bin").agg(count(lit(1)).as(cname))
    }
    // the binned frames are <= bins rows — eagerly local-checkpoint them
    // so the totals (a driver action over those rows) and the join reuse
    // ONE scan of each data-sized input instead of a second full count
    // pass (checkpoint blocks are ContextCleaner-released, unlike a
    // Dataset persist's pinned CacheManager entry)
    val ca = binned(a, "cnt_a").localCheckpoint(true)
    val cb = binned(b, "cnt_b").localCheckpoint(true)
    val na = ca.agg(coalesce(sum(col("cnt_a")), lit(0L))).head().getLong(0)
    val nb = cb.agg(coalesce(sum(col("cnt_b")), lit(0L))).head().getLong(0)
    require(na > 0 && nb > 0, "distributionDrift needs non-empty sides")
    val joined = ca.join(cb, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    // p and q are single divisions of exact integers; the drift term is
    // a fixed chain of IEEE ops — bit-identical in any engine
    val p = col("cnt_a").cast("double") / lit(na.toDouble)
    val q = col("cnt_b").cast("double") / lit(nb.toDouble)
    val term = when(col("cnt_a") + col("cnt_b") === 0, lit(0.0))
      .otherwise((p - q) * (p - q) / (p + q))
    joined.withColumn("drift12",
      floor(term * lit(1e12) + lit(0.5)).cast("long"))
  }

  /** DRIFT OVER TIME — the monitoring form of [[distributionDrift]]:
    * bucket the stream by `bucketSec`, histogram `valueCol` per bucket,
    * and score every bucket against its DIRECT predecessor with the same
    * ln-free symmetric chi-square term on the 1e-12 lattice. One row per
    * bucket that has a predecessor: (bucket_start, n_prev, n_cur,
    * drift12) — the series a data-quality dashboard alerts on ("did
    * yesterday's ingest move?").
    *
    * Scale shape: ONE pass collapses the data to (bucket, bin) counts
    * (≤ bins rows per bucket); "previous bucket" is an equi-join on the
    * shifted bucket key — no window, no global sort, so the comparison
    * never touches event-sized data. Buckets whose predecessor slot is
    * empty are skipped (no denominator to compare against), matching the
    * two-sided require in [[distributionDrift]]. */
  def driftOverTime(df: DataFrame, tsCol: String, valueCol: String,
      bucketSec: Long, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bucketSec > 0, s"bucketSec $bucketSec must be positive")
    require(bins > 0, s"bins $bins must be positive")
    require(hi > lo, s"need hi $hi > lo $lo")
    val bucket = (floor(col(tsCol).cast("long") / bucketSec) * bucketSec)
      .cast("long")
    val bin = binExpr(valueCol, lo, hi, bins)
    val counts = df.filter(col(valueCol).isNotNull)
      .select(bucket.as("bucket_start"), bin.as("bin"))
      .groupBy("bucket_start", "bin").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.groupBy("bucket_start").agg(sum(col("cnt")).as("n"))
    // buckets with a DIRECT predecessor: equi-join on the shifted key
    val pairsT = totals.select(col("bucket_start"), col("n").as("n_cur"))
      .join(totals.select((col("bucket_start") + bucketSec).as("bucket_start"),
        col("n").as("n_prev")), Seq("bucket_start"))
    val prevShift = counts.select(
      (col("bucket_start") + bucketSec).as("bucket_start"),
      col("bin"), col("cnt").as("cnt_prev"))
    val fo = counts.select(col("bucket_start"), col("bin"),
        col("cnt").as("cnt_cur"))
      .join(prevShift, Seq("bucket_start", "bin"), "full_outer")
      .select(col("bucket_start"), col("bin"),
        coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"),
        coalesce(col("cnt_prev"), lit(0L)).as("cnt_prev"))
      .join(pairsT, Seq("bucket_start"))
    val p = col("cnt_prev").cast("double") / col("n_prev").cast("double")
    val q = col("cnt_cur").cast("double") / col("n_cur").cast("double")
    val term = when(col("cnt_prev") + col("cnt_cur") === 0, lit(0.0))
      .otherwise((p - q) * (p - q) / (p + q))
    fo.withColumn("_t12", floor(term * lit(1e12) + lit(0.5)).cast("long"))
      .groupBy(col("bucket_start"), col("n_prev"), col("n_cur"))
      .agg(sum(col("_t12")).as("drift12"))
      .select(col("bucket_start"), col("n_prev"), col("n_cur"), col("drift12"))
  }

  /** Per-group ROBUST scaling — median/MAD instead of mean/stddev, the
    * outlier-resistant normalization a quality-score pipeline wants when
    * a handful of degenerate docs would otherwise drag the mean (the
    * z-score twin is [[zscorePerGroup]]; this one is immune to the tail).
    * Adds `robust_z = (value − median) / MAD`; explicit NULL when MAD is
    * 0 (over half the group at one value — no scale to express) or value
    * is NULL, mirroring zscorePerGroup's degenerate-group contract.
    *
    * Scale shape: two group-sized aggregates (median, then median
    * absolute deviation computed against the broadcast medians) and one
    * broadcast join back — group-cardinality frames only; the data-sized
    * frame is scanned twice, never shuffled on the group key. Exact
    * interpolated percentiles, not sketches: engine-reproducible (the
    * q79 winsorize parity), sized for group counts that fit an exact
    * aggregation — at extreme group cardinality swap in
    * [[binnedQuantiles]] per group. */
  def robustScalePerGroup(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    require(!df.columns.contains("robust_z"),
      "input already has a robust_z column")
    val med = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("_med"))
    val mad = df.join(broadcast(med), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(expr(s"percentile(abs($valueCol - _med), 0.5)").as("_mad"))
    df.join(broadcast(med), Seq(keyCol)).join(broadcast(mad), Seq(keyCol))
      .withColumn("robust_z",
        when(col("_mad") === 0.0 || col(valueCol).isNull, lit(null))
          .otherwise((col(valueCol).cast("double") - col("_med")) / col("_mad")))
      .drop("_med", "_mad")
  }

  /** ROLLING anomaly detection — the streaming-adjacent twin of
    * [[zscorePerGroup]]: each row is judged against the `lookback` rows
    * BEFORE it (ordered by `tsCol`, `idCol` tiebreak, current row
    * excluded — a spike must not launder its own baseline), flagging
    * `|v − mean| > z·std`. This is the metric-drift / loss-spike /
    * ingest-anomaly alert a pipeline runs over its telemetry; the
    * baseline excluding the probe row is what makes a level SHIFT flag
    * its first rows rather than instantly normalizing itself.
    *
    * Moments route through DECIMAL window sums (aggregation-order-exact;
    * within-frame double sums would be engine-portable here since the
    * frame order is total, but the decimal route removes even that
    * dependence), then one divide each — deterministic across engines.
    * A frame thinner than `minN` stays unflagged (cold start); a
    * zero-variance baseline flags ANY deviation (`|v − mean| > z·0`),
    * which is exactly the constant-series-then-spike case a threshold on
    * a NULL z-score would silently pass — `zscore` is NULL there, the
    * flag is not.
    *
    * Scale shape: one hash exchange on the key + an in-partition sort;
    * the frame is row-bounded so window state is O(lookback) per task.
    * Returns only the flagged rows: (key, sec, id, value, n_base,
    * mean [1e-6 lattice], zscore [1e-6 lattice, NULL on zero variance]). */
  /** CALIBRATION audit over a scored dataset (quality classifiers,
    * reward models, dedup-confidence scores): bin predictions on the
    * fixed `[0, 1]` grid and compare each bin's mean score (confidence)
    * against its positive rate (accuracy). The per-bin `gap` is the
    * reliability-diagram readout; the weighted |gap| total is ECE.
    * Returns one row per NON-EMPTY bin:
    * (bin, n, n_pos, confidence, accuracy, gap) — confidence/accuracy
    * on the 1e-6 lattice, `gap = accuracy − confidence` recomputed from
    * the LATTICE values so Σ|gap|·n is reproducible downstream without
    * re-deriving the raw moments.
    *
    * Exactness: positives count as integers; score sums route through
    * DECIMAL (aggregation-order-exact); each ratio is one IEEE divide.
    * Scores outside [0, 1] clamp into the boundary bins (a mis-scaled
    * score still lands SOMEWHERE visible); NULL scores or labels drop.
    * Scale shape: one partial-aggregated pass to ≤ `bins` rows. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: Column,
      bins: Int): DataFrame = {
    require(bins > 0, s"bins $bins must be positive")
    val s = col(scoreCol).cast("double")
    val bin = least(greatest(floor(s * bins), lit(0.0)), lit((bins - 1).toDouble))
      .cast("long")
    val lattice6 = (c: Column) => floor(c * 1000000 + 0.5) / 1000000
    df.filter(s.isNotNull && labelCol.isNotNull)
      .select(bin.as("bin"), s.as("_s"),
        when(labelCol, 1L).otherwise(0L).as("_y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"),
        sum(col("_s").cast("decimal(28,12)")).cast("double").as("_ss"))
      .select(col("bin"), col("n"), col("n_pos"),
        lattice6(col("_ss") / col("n").cast("double")).as("confidence"),
        lattice6(col("n_pos").cast("double") / col("n").cast("double"))
          .as("accuracy"))
      .withColumn("gap", col("accuracy") - col("confidence"))
  }

  /** Tie-aware ROC-AUC of an integer score against a boolean label —
    * the rank-sum (Mann-Whitney) identity, computed without ever
    * ranking a row: collapse to per-DISTINCT-SCORE counts first (one
    * partial-aggregated pass to |scores| rows), then exclusive prefix
    * sums over the score groups via [[GlobalOrder.withRunningTotals]]
    * (range exchange, NO SinglePartition window — the naive
    * `rank() OVER (ORDER BY score)` collapses the corpus into one
    * task). With `cb` = rows strictly below the group and `n` its
    * size, every member's average 1-based rank is `cb + (n+1)/2`, so
    *   2·Σ_pos ranks = Σ_groups nPos·(2·cb + n + 1)
    * — ALL integer arithmetic. AUC = (2·S − nPos·(nPos+1)) /
    * (2·nPos·nNeg): one IEEE divide at the end, sums DECIMAL-routed so
    * no count can overflow a long at any corpus size. Ties get the
    * standard midrank treatment exactly, not approximately.
    *
    * Returns one row: n_pos, n_neg, n_scores, auc (NULL when either
    * class is empty — AUC is undefined, not 0). */
  def rocAuc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val g = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("long").as("_score"),
        when(labelCol, 1L).otherwise(0L).as("_y"))
      .groupBy(col("_score"))
      .agg(sum(col("_y")).as("_np"),
        (count(lit(1)) - sum(col("_y"))).as("_nn"),
        count(lit(1)).as("_n"))
    GlobalOrder.withRunningTotals(g, Seq(col("_score")), "_n", cumCol = "_cb")
      .agg(
        sum((col("_np") * (col("_cb") * 2 + col("_n") + 1))
          .cast("decimal(38,0)")).as("_s2"),
        sum(col("_np").cast("decimal(38,0)")).as("_npos"),
        sum(col("_nn").cast("decimal(38,0)")).as("_nneg"),
        count(lit(1)).as("n_scores"))
      .select(
        col("_npos").cast("long").as("n_pos"),
        col("_nneg").cast("long").as("n_neg"),
        col("n_scores"),
        when(col("_npos") > 0 && col("_nneg") > 0,
          floor((col("_s2") - col("_npos") * (col("_npos") + 1)).cast("double") /
            (col("_npos") * col("_nneg") * 2).cast("double") * 1000000 + 0.5)
            / 1000000).as("auc"))
  }

  def rollingAnomaly(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, lookback: Int, minN: Int,
      z: Double): DataFrame = {
    require(lookback > 0, s"lookback $lookback must be positive")
    require(minN > 1 && minN <= lookback,
      s"minN $minN must be in (1, lookback $lookback]")
    require(z > 0, s"z $z must be positive")
    val sec = col(tsCol).cast("long")
    val v = col(valueCol).cast("double")
    // trailing-frame moments as CUMULATIVE sums minus their lagged
    // selves: a bounded ROWS frame re-aggregates O(lookback) values per
    // row, the running-total frame is O(1)/row — and because the sums
    // are DECIMAL (exact, no cancellation), the subtraction equals the
    // frame aggregate to the last bit, something float cumsums could
    // not promise
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(sec.asc, col(idCol).asc)
    val wcum = ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0L)
    val zero = lit(0).cast("decimal(28,12)")
    val cum1 = sum(v.cast("decimal(28,12)")).over(wcum)
    val cum2 = sum((v * v).cast("decimal(28,12)")).over(wcum)
    val cumn = count(v).over(wcum)
    def trail(c: Column, z: Column): Column =
      coalesce(lag(c, 1).over(ord), z) -
        coalesce(lag(c, lookback + 1).over(ord), z)
    val s1 = trail(cum1, zero).cast("double")
    val s2 = trail(cum2, zero).cast("double")
    val n = trail(cumn.cast("long"), lit(0L))
    val nd = n.cast("double")
    val mean = s1 / nd
    val variance = (s2 - s1 * s1 / nd) / nd
    val lattice6 = (c: Column) => floor(c * 1000000 + 0.5) / 1000000
    df.select(col(keyCol).as("key"), sec.as("sec"), col(idCol).as("id"),
        v.as("value"),
        n.as("n_base"), mean.as("_mean"), variance.as("_var"))
      .filter(col("n_base") >= minN && col("value").isNotNull &&
        abs(col("value") - col("_mean")) >
          lit(z) * sqrt(greatest(col("_var"), lit(0.0))))
      .select(col("key"), col("sec"), col("id"), col("value"), col("n_base"),
        lattice6(col("_mean")).as("mean"),
        when(col("_var") > 0, lattice6(
          (col("value") - col("_mean")) / sqrt(col("_var")))).as("zscore"))
  }

  /** EXACT discrete quantiles without a global sort — the scale answer
    * to "p99 of 100 TB": a global `orderBy` ships the entire column
    * through one range exchange; approx_percentile answers with an
    * error bar. This takes the histogram route to an exact answer:
    *
    *   pass 1: min/max/count (partial-aggregated, one reduce);
    *   pass 2: a `bins`-bucket histogram (one aggregation, `bins` rows
    *           to the driver — centroid-sized, like the k-means step);
    *   pass 3: per requested quantile, the target RANK lands in one
    *           known bucket, so only that bucket's rows (~n/bins) are
    *           filtered (pruned scan), top-k'd, and reduced to the
    *           exact k-th smallest.
    *
    * Rank semantics are lower-ceiling discrete — k = max(1, ceil(q·n)),
    * the k-th smallest value — matching DuckDB's quantile_disc. NULLs
    * are excluded. Output: one row per q, (q, value). */
  /** PER-GROUP exact discrete quantile by the same histogram
    * refinement as [[exactQuantiles]], fully distributed across groups:
    * per-group stats and histograms compute in ONE aggregation each
    * (driver holds only #groups and #groups x bins summary rows —
    * bounded by `maxGroups`), then a single pruned scan keeps only each
    * group's TARGET bucket (~n/bins rows per group) and one window
    * ranks inside it. No per-group driver loop, no global sort, no
    * full-column range exchange — the "exact per-tenant p99" plan.
    * Groups where every value is NULL are absent, and rows with a NULL
    * group key are excluded (a NULL key is not a rankable group).
    * Output: (key, q, value). */
  def exactQuantilesPerGroup(df: DataFrame, keyCol: String, valueCol: String,
      q: Double, bins: Int = 1024, maxGroups: Int = 10000): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q must lie in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    // NULL group keys are excluded alongside NULL values (documented
    // contract): a NULL key is not a rankable group, and letting it
    // through would NPE in the driver-side bucket lookup below
    val rows = df.filter(v.isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("k"), v.as("v"))
    val stats = rows.groupBy("k")
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n")).collect()
    require(stats.length <= maxGroups,
      s"${stats.length} groups exceed maxGroups=$maxGroups: the per-group " +
        "summaries are driver-side state — raise the cap deliberately or " +
        "pre-aggregate the key space")
    // the REAL driver-memory bound is groups x bins (the histogram
    // collect below), not groups alone: cap the product so the defaults
    // (10k x 1024 ~= 10M tuples) can't silently grow into driver OOM
    // when a caller raises both knobs
    require(stats.length.toLong * bins <= 16L * 1000 * 1000,
      s"${stats.length} groups x $bins bins = ${stats.length.toLong * bins} " +
        "driver-side histogram cells exceed the 16M cap — lower bins or " +
        "pre-aggregate the key space")
    if (stats.isEmpty) return Seq.empty[(String, Double, Double)].toDF("k", "q", "value")
      .withColumnRenamed("k", keyCol)
    val info = stats.map { r =>
      (r.get(0), (r.getDouble(1), r.getDouble(2), r.getLong(3)))
    }.toMap
    // per-group bin assignment (width varies per group): broadcast the
    // tiny stats frame in, never collect data rows
    val statsDf = broadcast(stats.toSeq.map(r =>
      (r.get(0).toString, r.getDouble(1), r.getDouble(2))).toDF("ks", "mn", "mx"))
    val binned = rows.join(statsDf, col("k").cast("string") === col("ks"))
      .withColumn("b", when(col("mx") === col("mn"), lit(0))
        .otherwise(least(floor((col("v") - col("mn")) /
          ((col("mx") - col("mn")) / bins)), lit(bins - 1)).cast("int")))
    val hist = binned.groupBy("k", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.get(0), r.getInt(1)) -> r.getLong(2)).toMap
    // driver: locate each group's target bucket + in-bucket rank
    val targets = info.map { case (k, (mn, mx, n)) =>
      val kth = math.max(1L, math.ceil(q * n).toLong)
      if (mn == mx) (k.toString, 0, 1L)
      else {
        var cum = 0L
        var b = 0
        while (cum + hist.getOrElse((k, b), 0L) < kth) {
          cum += hist.getOrElse((k, b), 0L); b += 1
        }
        (k.toString, b, kth - cum)
      }
    }.toSeq
    val targetDf = broadcast(targets.toDF("ks2", "tb", "rank"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v"))
    binned.join(targetDf,
        col("k").cast("string") === col("ks2") && col("b") === col("tb"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === col("rank"))
      .select(col("k").as(keyCol), lit(q).as("q"), col("v").as("value"))
  }

  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[Double], bins: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must lie in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull).select(v.as("v"))
    val head = rows.agg(min(col("v")), max(col("v")), count(lit(1))).head()
    if (head.getLong(2) == 0L) return Seq.empty[(Double, Double)].toDF("q", "value")
    val (mn, mx, n) = (head.getDouble(0), head.getDouble(1), head.getLong(2))
    if (mn == mx) return qs.sorted.map(q => (q, mn)).toDF("q", "value")
    val w = (mx - mn) / bins
    val binOf = least(floor((col("v") - lit(mn)) / lit(w)), lit(bins - 1))
      .cast("int")
    val hist = rows.groupBy(binOf.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cum = (0 until bins).scanLeft(0L)((acc, b) => acc + hist.getOrElse(b, 0L))
    val out = qs.sorted.map { q =>
      val k = math.max(1L, math.ceil(q * n).toLong)
      // last bucket whose cumulative-before is < k holds the k-th value
      val b = (0 until bins).find(i => cum(i + 1) >= k).get
      val rankInBin = (k - cum(b)).toInt
      val value = rows.filter(binOf === b)
        .orderBy(col("v")).limit(rankInBin)
        .agg(max(col("v"))).head().getDouble(0)
      (q, value)
    }
    out.toDF("q", "value")
  }
}
