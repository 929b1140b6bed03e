package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cardinality/overlap SKETCHES with fully portable semantics — the
  * "estimate it from kilobytes instead of joining terabytes" toolkit.
  * Both sketch families here are deterministic functions of the data
  * (md5-based hashing, integer register/rank math), so an external SQL
  * engine reproduces every estimate bit-for-bit — unlike the engine-
  * internal sketches behind `approx_count_distinct`, these can be
  * persisted, merged, and AUDITED across engines.
  *
  * Reference ties: the sync engine reconciles batches by comparing
  * key sets between source and target (`lib/DataProcessor.py`); at
  * 100 TB those key sets do not fit anywhere — sketches are the form
  * in which key-set comparison survives scale.
  */
object Sketches {

  /** Mergeable 256-register HLL sketch of a string column — one pass,
    * 256 bytes of state per group (see [[graft.functions.HllRegisters]]
    * for the register spec and the scale rationale). */
  def hllRegisters(v: Column): Column =
    graft.functions.HllRegisters.hllRegisters(v)

  /** Element-wise max of two register arrays — HLL sketch union. The
    * merged sketch is EXACTLY the sketch of the unioned data (register
    * max is associative/commutative/idempotent), so rollups over
    * persisted per-partition sketches are loss-free. */
  def hllMerge(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => greatest(x, y))

  /** Merge each group's register arrays down to one — the rollup form:
    * `df` holds (groupCols..., regsCol); one exploded max per register
    * position, rebuilt in order. 256 rows per input group move — the
    * rollup never touches raw data. */
  def hllMergeAll(df: DataFrame, regsCol: String): DataFrame =
    df.select(posexplode(col(regsCol)).as(Seq("_p", "_r")))
      .groupBy(col("_p")).agg(max(col("_r")).as("_r"))
      .agg(array_sort(collect_list(struct(col("_p"), col("_r")))).as("_o"))
      .select(transform(col("_o"), s => s.getField("_r")).as(regsCol))

  /** Driver/executor-local mirror of [[hllEstimate]]'s arithmetic (same
    * integer-exact denominator, same raw/ln branch, same floor snap) —
    * for consumers that hold a register array in hand (the streaming
    * per-key state fold) and must agree with the declarative batch
    * estimate bit-for-bit. */
  private[graft] def hllEstimateLocal(regs: Array[Byte]): Long = {
    var denom = 0L
    var empty = 0L
    var j = 0
    while (j < regs.length) {
      denom += 1L << (53 - regs(j))
      if (regs(j) == 0) empty += 1
      j += 1
    }
    val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
      9007199254740992.0 / denom.toDouble
    val e = if (empty > 0 && raw <= 640.0) 256.0 * math.log(256.0 / empty)
      else raw
    math.floor(e + 0.5).toLong
  }

  /** Trailing-window sketch rollup — the "pre-aggregate per period,
    * answer any window" pattern: for each target key (integer `keyCol`
    * rows of `targets`, e.g. full-coverage days), merge the register
    * arrays of every sketch row whose key lies in
    * `(target − window, target]`. Everything here is sketch-frame
    * sized — |sketches|·256 exploded register rows range-joined against
    * a broadcast target list — so a year of daily sketches answers
    * every trailing-7-day distinct question without ever rescanning
    * raw data; absent periods simply contribute nothing (registers of
    * a missing day are all-zero by definition). */
  def hllTrailingMerge(sketches: DataFrame, targets: DataFrame,
      keyCol: String, regsCol: String, window: Int): DataFrame = {
    require(window > 0, s"window $window must be positive")
    val src = sketches.select(col(keyCol).as("_sk"),
      posexplode(col(regsCol)).as(Seq("_p", "_r")))
    src.join(broadcast(targets.select(col(keyCol))),
        col("_sk") > col(keyCol) - window && col("_sk") <= col(keyCol))
      .groupBy(col(keyCol), col("_p")).agg(max(col("_r")).as("_r"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("_p"), col("_r")))).as("_o"))
      .select(col(keyCol), transform(col("_o"), s => s.getField("_r")).as(regsCol))
  }

  /** Cardinality estimate from a register array, as a LONG.
    *
    * The float math is arranged so both engines compute IDENTICAL
    * doubles (the oracle contract — see the verify notes: no libm pow):
    * the harmonic denominator is the exact INTEGER
    * `Σ_j 2^(53 − M_j)` (shift, not pow; empty registers' 2^53 terms
    * included — long-exact, order-free), and the numerator constant
    * `α_256 · 256² · 2^53` folds identically from the same literal
    * formula (`0.7213/(1 + 1.079/256)`, then two exact power-of-two
    * scalings). One IEEE division + the floor(+0.5) snap. The standard
    * small-range correction (`m·ln(m/V)` when the raw estimate is
    * under 2.5·m and empty registers remain) uses ln — fine in Scala,
    * but callers putting the estimate under a cross-engine oracle
    * should keep fixture cardinality above ~640 so the raw branch is
    * the one exercised (libm ln differs in the last ulp). */
  def hllEstimate(regsCol: String): Column = {
    val denom = expr(
      // integer-exact: each register contributes 2^(53 - M_j); an empty
      // register (M_j = 0) contributes 2^53 — the "V empty registers"
      // term of the textbook formula, absorbed into one exact sum
      s"aggregate($regsCol, 0L, (acc, r) -> acc + shiftleft(1L, 53 - r))")
    val v = expr(
      s"aggregate($regsCol, 0L, (acc, r) -> acc + IF(r = 0, 1L, 0L))")
    val raw = lit(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0) /
      denom.cast("double")
    val e = when(v > 0 && raw <= 640.0,
      lit(256.0) * log(lit(256.0) / v.cast("double"))).otherwise(raw)
    floor(e + 0.5).cast("long")
  }

  /** Count-min sketch per group: `d` hash rows × `w` counters, built in
    * ONE partial-aggregated pass. Each value increments one cell per row
    * (`col = md5_prefix60(row ':' value) mod w`), so the sketch is a
    * (group, row, col, cnt) frame of at most d·w cells per group —
    * FIXED size regardless of value cardinality. Frequency estimates
    * (min over rows, [[cmsEstimate]]) never underestimate; sketches for
    * different partitions/sources/days merge by cell-wise SUM
    * ([[cmsMergeAll]]) with zero loss — the mergeable-counter
    * complement to [[hllRegisters]]'s mergeable distinct-counter.
    *
    * Scale shape: explode(d) multiplies rows ×d, but the partial
    * aggregate collapses each task's output to ≤ d·w cells before the
    * exchange — the shuffle carries sketch cells, never token counts. */
  def cmsSketch(df: DataFrame, groupCol: String, valueCol: String,
      d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 1, s"need d>0, w>1; got d=$d w=$w")
    df.select(col(groupCol).as("g"), col(valueCol).as("v"),
        explode(array((0 until d).map(lit): _*)).as("r"))
      .select(col("g"), col("r"),
        pmod(graft.functions.Checksums.md5PrefixLong(
          concat(col("r").cast("string"), lit(":"), col("v"))), lit(w.toLong))
          .as("c"))
      .groupBy("g", "r", "c").agg(count(lit(1)).as("cnt"))
  }

  /** Merge all groups' CMS cells into one sketch: cell-wise sum — the
    * merged sketch is EXACTLY the sketch of the concatenated data. */
  def cmsMergeAll(sketch: DataFrame): DataFrame =
    sketch.groupBy("r", "c").agg(sum(col("cnt")).as("cnt"))

  /** Point frequency estimates from a (r, c, cnt) sketch for a probe
    * frame: recompute each probe's d cells, left-join the sketch, take
    * the min over rows (absent cell = count 0). Join shape: probes
    * explode ×d and hash-join d·w-bounded cells — never the raw data. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, probeCol: String,
      d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 1, s"need d>0, w>1; got d=$d w=$w")
    probes.select(col("*"),
        explode(array((0 until d).map(lit): _*)).as("r"))
      .withColumn("c", pmod(graft.functions.Checksums.md5PrefixLong(
        concat(col("r").cast("string"), lit(":"), col(probeCol))),
        lit(w.toLong)))
      .join(sketch, Seq("r", "c"), "left")
      .groupBy(probeCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  /** KMV (k-minimum-values / bottom-k theta) sketch per group: the `k`
    * smallest DISTINCT hash values of `hashCol` within each `groupCol`
    * value. The sketch supports distinct-count estimation AND — unlike
    * HLL — set-intersection estimation, because the k smallest hashes
    * are a uniform coordinated sample of the group's distinct values.
    *
    * Scale shape: one distinct + one per-group top-k (window rank over
    * a hash-partitioned frame; Catalyst rewrites the rank filter to
    * WindowGroupLimit, so each partition keeps k rows before any
    * shuffle). Raw data is touched ONCE per group; everything pairwise
    * happens in sketch space. */
  def kmvSketches(df: DataFrame, groupCol: String, hashCol: String,
      k: Int): DataFrame = {
    require(k > 1, s"k $k must exceed 1")
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    df.select(col(groupCol).as("g"), col(hashCol).as("h")).distinct()
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** All-pairs overlap estimates from KMV sketches — the pairwise
    * source-overlap matrix WITHOUT any pairwise pass over raw data.
    * For each group pair (a < b): the pair's union sketch is the k
    * smallest of the two sketches' union; with θ its largest member,
    *
    *   |A ∪ B|  ≈ (k−1) · 2^60 / θ          (exact count when < k seen)
    *   J(A, B)  ≈ |union sketch ∩ K(A) ∩ K(B)| / |union sketch|
    *   |A ∩ B|  ≈ J · |A ∪ B|
    *
    * Every step is integer/rank math plus one IEEE division, so the
    * estimates are deterministic and oracle-reproducible. Join shape:
    * the pair frame explodes to (pair, group) and equi-joins the sketch
    * frame — hash joins on sketch-sized inputs (G·k rows), never a
    * nested loop, never raw data. G groups → G(G−1)/2 pair rows, each
    * O(k): fine for thousands of groups; shard the pair frame for
    * millions. */
  def kmvPairwiseOverlap(sketches: DataFrame, k: Int): DataFrame = {
    require(k > 1, s"k $k must exceed 1")
    val sk = sketches.select(col("g"), col("h"))
    val groups = sk.select(col("g")).distinct()
    val pairs = groups.as("x").join(groups.as("y"), col("x.g") < col("y.g"))
      .select(col("x.g").as("ga"), col("y.g").as("gb"))
    val mem = pairs
      .select(col("ga"), col("gb"), explode(array(col("ga"), col("gb"))).as("g"))
      .join(sk, "g").select(col("ga"), col("gb"), col("h")).distinct()
    val wu = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val u = mem.withColumn("_rn", row_number().over(wu)).filter(col("_rn") <= k)
    val flagged = u
      .join(sk.select(col("g").as("ga"), col("h"), lit(1).as("_ina")),
        Seq("ga", "h"), "left")
      .join(sk.select(col("g").as("gb"), col("h"), lit(1).as("_inb")),
        Seq("gb", "h"), "left")
    val agg = flagged.groupBy(col("ga"), col("gb")).agg(
      count(lit(1)).as("cu"), max(col("h")).as("theta"),
      sum(when(col("_ina") === 1 && col("_inb") === 1, 1L).otherwise(0L))
        .as("rho"))
    // (k-1)·2^60 folds to an exact double (7 significant bits); theta's
    // nearest-double cast and the division are identical IEEE ops in
    // any engine — see hllEstimate's parity note
    val unionEst = when(col("cu") < k, col("cu").cast("double"))
      .otherwise(lit((k - 1).toDouble * 1152921504606846976.0) /
        col("theta").cast("double"))
    val jacc = col("rho").cast("double") / col("cu").cast("double")
    agg.select(col("ga"), col("gb"),
      floor(unionEst + 0.5).cast("long").as("union_est"),
      (floor(jacc * 10000 + 0.5) / 10000).as("jaccard_est"),
      floor(jacc * unionEst + 0.5).cast("long").as("intersect_est"))
  }
}
