package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines.
  *
  * Membership is a pure function of the row's key — `md5(key)`'s first
  * 8 hex chars compared against a rate cutoff — not of an RNG seed or
  * partition layout. That buys three properties `sample()` cannot give:
  * reruns (and incremental reruns over grown data) keep exactly the same
  * rows, the sample is reproducible in ANY engine that has md5, and the
  * predicate is a plain filter — no shuffle, no state, evaluated at scan
  * speed behind whatever pushdown the format supports.
  *
  * Stratified form: a per-stratum rate map (e.g. downsample the dominant
  * language, keep all of a rare one) compiled to one CASE cutoff column.
  */
/** Collision-free temp-column names: `withColumn` with a fixed name like
  * `_rn` would silently REPLACE an input column of that name and then drop
  * it from the output — the name must be proven absent first. */
private[operators] object TempCols {
  def fresh(df: DataFrame, base: String): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(n => !df.columns.contains(n)).get
}

object Sampling {

  /** First 8 md5 hex chars of the '#'-joined key — a uniform draw in
    * [0, 2^32) encoded as zero-padded lowercase hex, so LEXICOGRAPHIC
    * comparison equals numeric comparison and any SQL engine reproduces
    * the exact sample membership. */
  def uniformHex(keys: Seq[Column]): Column =
    substring(md5(concat_ws("#", keys.map(_.cast("string")): _*)), 1, 8)

  /** Hex cutoff for a sampling rate: `uniformHex < hexCutoff(rate)` keeps
    * ~rate of rows (exactly round(rate * 2^32) of the hash space). Rate
    * 1.0 returns "g", which every 8-hex-char draw sorts below — a cutoff
    * of "ffffffff" would silently drop rows whose hash IS ffffffff. */
  def hexCutoff(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    val cells = math.round(rate * 4294967296.0)
    if (cells >= 4294967296L) "g" else f"$cells%08x"
  }

  /** Uniform deterministic sample: keep ~`rate` of rows keyed by
    * `keyCols` (stable across reruns and engines). */
  def hashSample(df: DataFrame, keyCols: Seq[String], rate: Double): DataFrame =
    df.filter(uniformHex(keyCols.map(col)) < lit(hexCutoff(rate)))

  /** EXACTLY-n deterministic sample: the n rows with the smallest
    * uniform draw (key tiebreak) — for when a rate is the wrong contract
    * (eval sets, human-review batches, "give me 10k examples"). Plans as
    * TakeOrderedAndProject: each task keeps a bounded n-row heap and one
    * gather ranks n·partitions survivors — no full sort, no second pass
    * to calibrate a rate, rerun-stable like every sampler here. Rows are
    * uniform because the draw is; n > rows returns everything. */
  def exactNSample(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame = {
    require(keyCols.nonEmpty, "exact-n sample needs key columns")
    require(n > 0, s"n $n must be positive")
    df.orderBy((uniformHex(keyCols.map(col)) +: keyCols.map(col)): _*)
      .limit(n)
  }

  /** The same uniform draw as [[uniformHex]], decoded to a long in
    * [0, 2^32) — for comparing against a PER-ROW rate, where a hex-string
    * cutoff would need per-row formatting. */
  def uniformLong(keys: Seq[Column]): Column =
    conv(substring(md5(concat_ws("#", keys.map(_.cast("string")): _*)), 1, 8),
      16, 10).cast("long")

  /** Weighted deterministic sample: each row's keep-probability is its
    * OWN `rateCol` value (clamped to [0, 1]) — e.g. quality-weighted
    * corpus downsampling, where high-quality docs survive at a higher
    * rate. Still a pure scan-speed filter with all of [[hashSample]]'s
    * properties (rerun-stable, engine-portable, and monotone in the
    * rate: raising a row's rate can only add it, never swap it). A NULL
    * rate is an EXPLICIT rate 0 — the row is dropped (coalesced, not
    * left to null-comparison semantics that read as an accident). */
  def weightedHashSample(df: DataFrame, keyCols: Seq[String],
      rateCol: Column): DataFrame = {
    require(keyCols.nonEmpty, "weighted sample needs key columns")
    val clamped = least(greatest(
      coalesce(rateCol.cast("double"), lit(0.0)), lit(0.0)), lit(1.0))
    df.filter(uniformLong(keyCols.map(col)) <
      floor(clamped * lit(4294967296.0) + 0.5))
  }

  /** Deterministic dataset split: label every row with the name of the
    * hash range its uniform draw lands in — e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Splits are
    * DISJOINT and EXHAUSTIVE by construction (consecutive ranges over one
    * draw), stable across reruns/engines, and adding data never moves an
    * existing row between splits — the properties a train/eval split
    * must have to avoid leakage. Fractions must sum to ~1. */
  def splitAssign(df: DataFrame, keyCols: Seq[String],
      splits: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(keyCols.nonEmpty, "split assignment needs key columns — " +
      "zero keys would hash a constant and put ALL rows in one split")
    require(splits.nonEmpty && splits.forall(_._2 >= 0), "need non-negative fractions")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions sum to $total, not 1")
    val cums = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val draw = uniformHex(keyCols.map(col))
    // ranges close with the rate-1.0 cutoff ("g"), so the last split
    // also captures the maximal draw
    // clamp accumulated float error (0.8 + 0.1 + 0.1 sums past 1.0 in
    // doubles) so the final range's cutoff is exactly the total one
    val assigned = splits.map(_._1).zip(cums.map(c => hexCutoff(math.min(c, 1.0)))).foldRight(
      lit(null).cast("string")) { case ((name, hi), els) =>
      when(draw < lit(hi), lit(name)).otherwise(els)
    }
    df.withColumn(splitCol, assigned)
  }

  /** Deterministic weighted PRIORITY sample: exactly `k` rows, chosen
    * by priority `weight / draw` descending (equivalently
    * `draw / weight` ascending) with the usual md5 draw as the
    * uniform — the Duffield-Lund-Thorup priority-sampling shape with
    * the RNG replaced by the engine's portable hash, so the sample is
    * rerun-stable and any engine reproduces the member set. Heavier
    * rows are proportionally likelier to make the cut; combined with
    * [[exactNSample]] (uniform exact-k) and [[weightedHashSample]]
    * (per-row rate, variable size) this completes the sampling
    * triangle. The ranking key is ONE IEEE division of exactly-
    * representable operands — deterministic everywhere; plans as
    * TakeOrderedAndProject (per-partition top-k before one k-row
    * exchange), never a full global sort. Rows with NULL or
    * non-positive weight are excluded — they have no sampling mass. */
  def prioritySample(df: DataFrame, keyCols: Seq[String], weightCol: String,
      k: Int): DataFrame = {
    require(keyCols.nonEmpty, "priority sample needs key columns")
    require(k > 0, s"k $k must be positive")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_prio",
        uniformLong(keyCols.map(col)).cast("double") /
          col(weightCol).cast("double"))
      .orderBy((col("_prio").asc +: keyCols.map(col(_).asc)): _*)
      .limit(k)
  }

  /** Importance resampling to a TARGET bin distribution: the maximal
    * deterministic subset whose bin shares track integer target
    * weights — "reshape this year's crawl to last year's length/source
    * mix" without an RNG. The binding bin b* minimizes n_b / t_b and
    * keeps everything; every other bin thins at rate
    * (n_b*·t_b) / (t_b*·n_b) via the usual md5-cutoff draw. Cutoffs
    * are EXACT: `min_c floor(2^32·n_c·t_b / (t_c·n_b))` over DECIMAL
    * integer cross-products (floor distributes over min; no double
    * ever touches the decision), so any engine reproduces the member
    * set bit-for-bit. Scale shape: one partial-aggregated bin-count
    * pass, a |bins|² cutoff frame, one broadcast join + scan-speed
    * filter — the data shuffles ZERO times. Bins not in `targets`
    * drop; a target bin the data lacks makes the match infeasible and
    * empties the result (K = 0) — the honest reading, not a silent
    * re-normalization. */
  def importanceResample(df: DataFrame, binCol: Column, keyCols: Seq[String],
      targets: Seq[(String, Long)]): DataFrame = {
    require(keyCols.nonEmpty, "importance resample needs key columns")
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "need positive integer target weights")
    require(targets.map(_._1).distinct.size == targets.size,
      s"duplicate target bins in ${targets.map(_._1).mkString(", ")}")
    val tgt = df.sparkSession.range(1)
      .select(explode(array(targets.map { case (b, w) =>
        struct(lit(b).as("_bin"), lit(w).as("_t")) }: _*)).as("e"))
      .select(col("e._bin").as("_bin"), col("e._t").as("_t"))
    val tagged = df.withColumn("_bin", binCol)
    // right join keeps data-absent target bins as n=0 rows — they must
    // drive K to 0, not vanish from the min
    val counts = tagged.groupBy("_bin").agg(count(lit(1)).as("_nraw"))
      .join(broadcast(tgt), Seq("_bin"), "right")
      .select(col("_bin"), coalesce(col("_nraw"), lit(0L)).as("_n"), col("_t"))
    val cutoffs = counts.as("b")
      .crossJoin(counts.select(col("_n").as("_nc"), col("_t").as("_tc")).as("c"))
      // n=0 guard: an empty bin's own-cutoff row would divide by zero
      // (ANSI errors); its cutoff is irrelevant (no rows to filter) but
      // the row must not poison the plan — emit 0 directly
      .select(col("_bin"), when(col("b._n") === 0, lit(0L)).otherwise(expr(
        """CAST((CAST(4294967296 AS DECIMAL(18,0)) * CAST(_nc AS DECIMAL(18,0))
          |  * CAST(_t AS DECIMAL(18,0))) div
          | (CAST(_tc AS DECIMAL(18,0)) * CAST(_n AS DECIMAL(18,0)))
          | AS BIGINT)""".stripMargin)).as("_cut"))
      .groupBy("_bin").agg(min(col("_cut")).as("_cut"))
    tagged.join(broadcast(cutoffs), Seq("_bin"))
      .filter(uniformLong(keyCols.map(col)) < col("_cut"))
      .drop("_bin", "_cut")
  }

  /** Leakage-safe dataset split: assignment at the near-dup COMPONENT
    * level, so a document and all its near-copies land in the same
    * split by construction — the doc-level [[splitAssign]]'s silent
    * failure mode is eval text memorized from train via a near-copy.
    * `pairs` is the verified near-dup pair set (aCol, bCol ids); docs
    * appearing in no pair are their own singleton component. Returns
    * (idCol, component, split). Scale shape: CC over pairs (O(log n)
    * rounds, [[Components.connectedComponents]]) + ONE left join of
    * docs against the component map + the hash-assign projection. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, splits: Seq[(String, Double)]): DataFrame = {
    val comp = Components.connectedComponents(pairs, aCol, bCol)
    val labeled = docs.select(col(idCol))
      .join(comp, col(idCol) === col("node"), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("component"))
    splitAssign(labeled, Seq("component"), splits)
  }

  /** Deterministic per-group cap: keep at most `k` rows per group, chosen
    * in uniform-hash-of-key order (the published "max documents per
    * domain" corpus rule) — a fixed-size sample per group where
    * [[stratifiedHashSample]] is fixed-RATE. Hash order makes the kept
    * set a uniform draw that is stable across reruns and engines, with
    * the key itself as tiebreak (first-8-hex md5 collisions exist).
    * Plans as one hash exchange on the group key + WindowGroupLimit, so
    * the shuffle carries at most k rows per group after the partial
    * limit, not the full group. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], keyCols: Seq[String],
      k: Int): DataFrame = {
    require(k > 0, s"cap $k must be positive")
    require(groupCols.nonEmpty && keyCols.nonEmpty, "group and key columns required")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy((uniformHex(keyCols.map(col)) +: keyCols.map(col)): _*)
    val rn = TempCols.fresh(df, "_rn")
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Batch ADMISSION QUOTA — the batch twin of
    * [[graft.streaming.StreamingSync.quotaPerKey]]: within each
    * (key, event-time epoch of `epochSec`) window, the first `quota`
    * rows in (ts, id) order are admitted, the rest marked
    * `admitted = false` — per-source crawl budgets / abuse throttles
    * re-scored over history. One hash exchange on (key, epoch) +
    * WindowGroupLimit-style rank; every verdict is deterministic (total
    * order within the window via the id tiebreak). */
  def admitQuota(df: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, epochSec: Long, quota: Long,
      epochCol: String = "epoch", outCol: String = "admitted"): DataFrame = {
    require(keyCols.nonEmpty, "admission quota needs key columns")
    require(epochSec > 0, s"epochSec $epochSec must be positive")
    require(quota > 0, s"quota $quota must be positive")
    val taken = Seq(epochCol, outCol).filter(df.columns.contains)
    require(taken.isEmpty,
      s"input already has column(s) ${taken.mkString(", ")} that admitQuota emits")
    val epoch = floor(col(tsCol).cast("long") / epochSec).cast("long")
    val rn = TempCols.fresh(df, "_rn")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((keyCols.map(col) :+ epoch): _*)
      .orderBy(col(tsCol).asc, col(idCol).asc)
    df.withColumn(epochCol, epoch)
      .withColumn(rn, row_number().over(w))
      .withColumn(outCol, col(rn) <= quota)
      .drop(rn)
  }

  /** Stratified deterministic sample: per-stratum rates with an optional
    * default for unlisted strata. One filter, no shuffle; the cutoff CASE
    * folds to a constant per stratum value. */
  def stratifiedHashSample(df: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "stratified sample needs key columns")
    val cutoff = rates.toSeq.sortBy(_._1).foldLeft(lit(hexCutoff(defaultRate))) {
      case (els, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexCutoff(rate))).otherwise(els)
    }
    df.filter(uniformHex(keyCols.map(col)) < cutoff)
  }

  /** Deterministic MIXTURE sampling — the pretraining data-mix step:
    * downsample each source so the kept weight (tokens/chars) hits
    * `budget × targets(source)` in expectation, with per-source rates
    * `min(1, budget·frac / sourceWeight)` derived from ONE aggregation
    * (a |sources|-row collect, never data). Membership is the same
    * md5-cutoff filter as every sampler here: rerun-stable, nested under
    * rate changes, no RNG state, scan-speed. Sources absent from
    * `targets` are dropped (rate 0) — the mixture is exactly what was
    * asked for, not "everything else too". */
  def mixtureSample(df: DataFrame, sourceCol: String, keyCols: Seq[String],
      weightCol: String, targets: Map[String, Double],
      budget: Long): DataFrame = {
    require(keyCols.nonEmpty, "mixture sample needs key columns")
    require(targets.nonEmpty && targets.values.forall(_ >= 0),
      "need non-negative target fractions")
    require(budget > 0, s"budget $budget must be positive")
    // explicit cast: a DOUBLE/DECIMAL weight column otherwise surfaces as
    // a ClassCastException at getLong; coalesce covers an all-NULL group
    val totals = df.groupBy(col(sourceCol))
      .agg(coalesce(sum(col(weightCol)).cast("long"), lit(0L)).as("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rate = targets.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (els, (src, frac)) =>
        val t = totals.getOrElse(src, 0L)
        val r = if (t == 0) 0.0
          else math.min(budget.toDouble * frac / t.toDouble, 1.0)
        when(col(sourceCol) === src, lit(r)).otherwise(els)
    }
    df.filter(uniformLong(keyCols.map(col)) <
      floor(rate * lit(4294967296.0) + lit(0.5)))
  }

  /** TEMPERATURE-smoothed mixture allocation (α = 0.5) — the
    * multilingual-corpus sampling rule ("upsample the tail languages"):
    * source s with share p_s gets target weight ∝ √p_s, flattening the
    * head so low-resource sources keep representation. Unlike
    * [[mixtureSample]], whose target fractions are caller-supplied,
    * here the weights DERIVE from the data in one pass.
    *
    * Reproducibility: √(n_s/N) is one IEEE divide + one IEEE sqrt
    * (sqrt is correctly-rounded by the standard — no libm drift),
    * snapped to the 1e-9 lattice as a LONG before the cross-source
    * normalization, so the weight total is an order-independent
    * integer sum; each allocation is `(budget · w9) div Σw9` — exact
    * integer division. Per-source keep-rate is one final divide on the
    * 1e-6 lattice.
    *
    * Scale shape: one partial-aggregated groupBy to |sources| rows,
    * two broadcast 1-row totals. Returns per source: (sourceCol,
    * n_docs, share, weight, alloc_budget, rate). */
  def temperatureAllocation(df: DataFrame, sourceCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val r6 = (c: Column) => floor(c * 1000000 + 0.5) / 1000000
    val counts = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("_N"))
    val w = counts.crossJoin(broadcast(tot))
      .withColumn("_w9", floor(sqrt(col("n_docs").cast("double") /
        col("_N").cast("double")) * 1000000000 + 0.5).cast("long"))
    val wsum = w.agg(sum(col("_w9")).as("_ws"))
    w.crossJoin(broadcast(wsum))
      .select(col(sourceCol), col("n_docs"),
        r6(col("n_docs").cast("double") / col("_N").cast("double")).as("share"),
        r6(col("_w9").cast("double") / col("_ws").cast("double")).as("weight"),
        expr(s"($budget * _w9) div _ws").as("alloc_budget"))
      .withColumn("rate", r6(least(lit(1.0),
        col("alloc_budget").cast("double") / col("n_docs").cast("double"))))
  }

  /** NEYMAN-allocated stratified sample — the survey-sampling optimum:
    * a `totalN`-row budget split across strata proportional to
    * `N_h · S_h` (stratum size × stddev), so high-variance strata get
    * the rows and near-constant strata are barely sampled — minimizing
    * the variance of any downstream mean estimate at a fixed budget.
    * `N_h · S_h` collapses to `sqrt(n·Σv² − (Σv)²)`, so the whole
    * allocation needs one tiny aggregate per stratum.
    *
    * Reproducibility (the oracle contract): values snap to the
    * `1/valueScale` lattice first, moments are EXACT integer sums
    * (DECIMAL-routed), each stratum's allocation weight lands on a 1e-3
    * lattice before the cross-strata total (longs — order-independent),
    * and membership is the usual md5-cutoff draw — rerun-stable, no RNG.
    * Rows with a NULL value OR a NULL stratum are excluded from stats
    * AND the sample (a NULL stratum can never match the rate dispatch,
    * so letting it into the stats would silently divert budget to rows
    * that cannot be drawn).
    * Zero-variance strata get rate 0 (pure Neyman — they contribute
    * nothing to estimator variance); at least one stratum must vary.
    *
    * Scale shape: one partial-aggregated stats pass to |strata| rows, a
    * driver-side fold over those, then a scan-speed cutoff filter —
    * identical shape to [[mixtureSample]]. */
  def neymanSample(df: DataFrame, strataCol: String, keyCols: Seq[String],
      valueCol: String, totalN: Long, valueScale: Long = 100L): DataFrame = {
    require(keyCols.nonEmpty, "neyman sample needs key columns")
    require(totalN > 0, s"totalN $totalN must be positive")
    require(valueScale > 0, s"valueScale $valueScale must be positive")
    val nonNull = df.filter(col(valueCol).isNotNull && col(strataCol).isNotNull)
    val vm = floor(col(valueCol).cast("double") * valueScale + 0.5)
      .cast("decimal(38,0)")
    val stats = nonNull.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"), sum(vm).as("s1"), sum(vm * vm).as("s2"))
      .collect()
      .map { r =>
        val n = r.getLong(1)
        val s1 = r.getDecimal(2); val s2 = r.getDecimal(3)
        // N_h·S_h = sqrt(n·Σvm² − (Σvm)²): exact integer SS, one sqrt
        val ss = s2.multiply(java.math.BigDecimal.valueOf(n))
          .subtract(s1.multiply(s1))
        val w3 = math.floor(math.sqrt(ss.doubleValue) * 1000 + 0.5).toLong
        (r.getString(0), n, w3)
      }
    val totalW = stats.map(_._3).sum
    require(totalW > 0, "neymanSample: every stratum has zero variance")
    val rate = stats.sortBy(_._1).foldLeft(lit(0.0)) {
      case (els, (stratum, n, w3)) =>
        val r = math.min(
          totalN.toDouble * (w3.toDouble / totalW.toDouble) / n.toDouble, 1.0)
        when(col(strataCol) === stratum, lit(r)).otherwise(els)
    }
    nonNull.filter(uniformLong(keyCols.map(col)) <
      floor(rate * lit(4294967296.0) + lit(0.5)))
  }

  /** Deterministic negative sampling for contrastive training: for every
    * anchor row, up to `k` pseudo-random negatives drawn by hashing
    * `(anchor id, slot)` onto the dense id domain `[0, n)` — rerun-stable
    * (pure md5 arithmetic, no RNG state to checkpoint), and uniform
    * enough for training. Accidental self-draws are dropped rather than
    * resampled (keeps the op one pass; callers get AT MOST k negatives,
    * which contrastive losses tolerate). `payloadCols` are fetched from
    * the sampled negative via the join.
    *
    * Scale shape: one generator explode (k rows per anchor) + ONE
    * equi-join on the sampled id — sampling stays attached to the data,
    * no driver loop, no RNG. Requires a dense `[0, n)` id domain; for
    * sparse ids, build a rank table (`row_number` over sorted ids) once
    * and join through it — same join shape, one extra window over the
    * aggregated id frame. */
  def negativeSample(docs: DataFrame, idCol: String, k: Int,
      payloadCols: Seq[String]): DataFrame = {
    require(k > 0, s"k $k must be positive")
    require(payloadCols.nonEmpty, "negativeSample needs payload columns")
    val reserved = Seq("anchor_id", "slot", "neg_id").filter(payloadCols.contains)
    require(reserved.isEmpty,
      s"payload columns collide with output columns: ${reserved.mkString(", ")}")
    val n = docs.count() // dense-domain size, folded to a literal
    require(n > 1, "negative sampling needs at least 2 rows")
    val draws = docs.select(col(idCol).as("anchor_id"))
      .select(col("anchor_id"),
        explode(sequence(lit(0L), lit((k - 1).toLong))).as("slot"))
      .withColumn("neg_id", pmod(
        graft.functions.Checksums.md5PrefixLong(
          concat(col("anchor_id").cast("string"), lit("#"),
            col("slot").cast("string"))),
        lit(n)))
      .filter(col("neg_id") =!= col("anchor_id"))
    draws.join(
      docs.select((col(idCol).as("neg_id") +: payloadCols.map(col)): _*),
      Seq("neg_id"))
      .select((Seq(col("anchor_id"), col("slot"), col("neg_id")) ++
        payloadCols.map(col)): _*)
  }

  /** WATER-FILLING budget allocation — the data-mix planning step that
    * precedes [[mixtureSample]]'s rate-based execution: split a total
    * token/char `budget` across groups so every group gets its full
    * weight when it fits, and all groups that don't fit are leveled at
    * one common integer cap `c` — the largest cap with
    * `Σ min(avail_g, c) ≤ budget` (the max-min-fair allocation). The
    * mix this produces is the "cap the giant sources, keep the tail
    * whole" corpus rule, with the cap DERIVED from the budget instead
    * of hand-tuned per source.
    *
    * All arithmetic is integer (sums, one integer division per
    * candidate row), so any engine reproduces the allocation exactly;
    * the classic closed form needs the groups ordered by weight, and
    * the first position `j` (1-based, ascending) where
    * `(budget − prefixBefore_j) div (nGroups − j + 1) < avail_j` binds
    * the cap — every earlier group keeps its full weight, every later
    * group levels at the cap. No binding row means the budget covers
    * everything and the cap is vacuous.
    *
    * Scale shape: ONE aggregation reduces the data to |groups| rows;
    * the window + self-join that solve for the cap touch only that
    * tiny frame (group count = sources/domains, not documents). Output:
    * group cols + (avail, alloc, capped), alloc summing to
    * `min(budget, Σ avail)` up to the sub-cap integer remainder that
    * water-filling leaves unspent by definition. */
  def fairShareBudget(df: DataFrame, groupCols: Seq[String], sizeCol: String,
      budget: Long): DataFrame = {
    require(groupCols.nonEmpty, "fair-share allocation needs group columns")
    require(budget >= 0, s"budget $budget must be non-negative")
    val sizes = df.groupBy(groupCols.map(col): _*)
      .agg(coalesce(sum(col(sizeCol).cast("long")), lit(0L)).as("avail"))
    // deterministic total order: weight asc, group cols as tiebreak
    val ord = col("avail").asc +: groupCols.map(col(_).asc)
    val w = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(ord: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val ranked = sizes
      .withColumn("_j", row_number().over(w))
      .withColumn("_before", coalesce(
        sum(col("avail")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("_n", count(lit(1)).over(wAll))
    // candidate cap at j: level the remaining budget across rows j..N;
    // it binds when it cannot cover row j's own weight. The numerator
    // is provably non-negative at the FIRST binding row (the previous
    // row's non-binding inequality bounds the budget from below), so
    // guarding on the NUMERATOR — not the quotient — discards every
    // negative-division row BEFORE engines can disagree on it (long
    // `div` truncates toward zero, SQL `//` floors; they differ only
    // below zero).
    val cand = expr(s"(${budget}L - _before) div (_n - _j + 1)")
    val binding = ranked
      .filter(lit(budget) - col("_before") >= 0)
      .withColumn("_cap", cand)
      .filter(col("_cap") < col("avail"))
    // first binding row by j — min(struct) avoids an orderBy+limit(1)
    // exchange on the already-tiny frame
    val capRow = binding.agg(
      min(struct(col("_j"), col("_cap"))).as("_first"))
      .select(col("_first").getField("_cap").as("_cap_global"))
    sizes.crossJoin(broadcast(capRow))
      .select((groupCols.map(col) :+ col("avail") :+
        least(col("avail"), coalesce(col("_cap_global"), col("avail")))
          .as("alloc")): _*)
      .withColumn("capped", col("alloc") < col("avail"))
  }
}
