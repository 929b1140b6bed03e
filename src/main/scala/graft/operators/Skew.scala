package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for hot keys — the fallback when AQE's runtime
  * skew-join/partial-agg handling isn't enough (e.g. a single key holding
  * >1 executor-memory of rows, or a non-AQE environment).
  *
  * Both helpers are deterministic: the salt derives from row content, not
  * RNG, so reruns produce identical partitioning and results.
  */
object Skew {

  /** Deterministic salt in [0, salts) from arbitrary discriminator
    * columns (use columns that vary WITHIN a hot key). */
  def saltOf(salts: Int, discriminators: Column*): Column =
    pmod(hash(discriminators: _*), lit(salts))

  /** Key-distribution profile — the measurement that DECIDES whether the
    * mitigations below (or a bigger salt count, or a broadcast) are
    * needed: the `topK` heaviest keys with their row counts, share of the
    * table, and a skew factor (count / mean-count-per-key). One
    * partial-aggregated count per key, two 1-row global aggregates folded
    * in by crossJoin (broadcast by size), and a bounded top-k — no
    * collect, no full sort, so profiling a 100 TB table costs one
    * aggregation pass. Shares/factors are single IEEE divisions over
    * exact integer counts (oracle-reproducible). */
  def keyProfile(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK $topK must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("_total"),
      count(lit(1)).as("_n_keys"))
    counts.crossJoin(totals)
      .select(col(keyCol), col("n"),
        (col("n").cast("double") / col("_total").cast("double")).as("share"),
        (col("n").cast("double") * col("_n_keys").cast("double") /
          col("_total").cast("double")).as("skew_factor"))
      .orderBy(col("n").desc, col(keyCol).asc)
      .limit(topK)
  }

  /** Pre-flight JOIN cardinality forecast — the other measurement a
    * 100 TB join wants before it runs: the exact output row count of
    * `a JOIN b ON key` is `sum_k cnt_a(k) * cnt_b(k)`, computable from
    * the two per-key count aggregates WITHOUT running the join — two
    * partial-aggregated count passes and one join of key-cardinality-
    * sized frames, instead of materializing a possibly-exploding
    * result. Returns the `topK` keys by output contribution plus their
    * per-key fan-out, so the caller can decide: broadcast, salt the
    * listed keys ([[saltedJoin]]), or cap them upstream.
    *
    * Everything is exact integer arithmetic (counts and products) —
    * oracle-reproducible; the product routes through DECIMAL so two
    * billion-row hot sides cannot wrap a long mid-sum, and the final
    * projection returns BIGINT (the decimal-cell hashing rule). */
  def joinCardinality(a: DataFrame, b: DataFrame, keyCol: String,
      topK: Int): DataFrame = {
    require(topK > 0, s"topK $topK must be positive")
    val ca = a.groupBy(col(keyCol)).agg(count(lit(1)).as("_na"))
    val cb = b.groupBy(col(keyCol)).agg(count(lit(1)).as("_nb"))
    ca.join(cb, Seq(keyCol))
      .select(col(keyCol), col("_na").as("n_left"), col("_nb").as("n_right"),
        (col("_na").cast("decimal(38,0)") * col("_nb").cast("decimal(38,0)"))
          .cast("long").as("out_rows"))
      .orderBy(col("out_rows").desc, col(keyCol).asc)
      .limit(topK)
  }

  /** Total forecast rows of `a JOIN b ON key` as a 1-row frame —
    * [[joinCardinality]]'s headline number (decimal-routed sum,
    * BIGINT-projected). */
  def joinCardinalityTotal(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val ca = a.groupBy(col(keyCol)).agg(count(lit(1)).as("_na"))
    val cb = b.groupBy(col(keyCol)).agg(count(lit(1)).as("_nb"))
    ca.join(cb, Seq(keyCol))
      .agg(sum(col("_na").cast("decimal(38,0)") * col("_nb").cast("decimal(38,0)"))
        .cast("long").as("out_rows"))
      .select(coalesce(col("out_rows"), lit(0L)).as("out_rows"))
  }

  /** SALT PLAN — the step between measuring ([[keyProfile]],
    * [[joinCardinality]]) and mitigating ([[saltedJoin]]/[[saltedSum]]):
    * for every key whose row count exceeds `targetPerTask`, the salt
    * count that brings its per-reducer load back under target —
    * `ceil(n / target)`, capped at `maxSalts` (dimension replication
    * cost grows with the cap) — plus the residual per-reducer load
    * after salting. All integer ceiling division
    * (`(n + d − 1) div d`), so the plan reproduces bit-for-bit; one
    * partial-aggregated count pass, output bounded by the number of
    * hot keys. */
  def saltPlan(df: DataFrame, keyCol: String, targetPerTask: Long,
      maxSalts: Int): DataFrame = {
    require(targetPerTask > 0, s"targetPerTask $targetPerTask must be positive")
    require(maxSalts > 1, s"maxSalts $maxSalts must exceed 1")
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > targetPerTask)
      .withColumn("salts", least(
        expr(s"(n_rows + ${targetPerTask - 1}) div $targetPerTask"),
        lit(maxSalts.toLong)))
      .withColumn("residual_per_task", expr("(n_rows + salts - 1) div salts"))
      .withColumn("under_target", col("residual_per_task") <= targetPerTask)
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt) — spreading a hot key over `salts` reducers — then final
    * aggregate on key. Results equal the direct groupBy for any
    * algebraic aggregate (sum/count/min/max).
    *
    * (Catalyst's map-side partial aggregation already handles most skew;
    * this guards the reduce side when one key's PARTIAL results are still
    * too big — extremely high cardinality payloads, collect_list, etc.) */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int,
      discriminator: Option[Column] = None): DataFrame = {
    val disc = discriminator.getOrElse(col(valueCol))
    df.withColumn("_salt", saltOf(salts, disc))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }

  /** Skew-safe equi-join of a skewed fact side against a dimension:
    * the dimension is replicated `salts` times (one copy per salt value)
    * and the fact side salts deterministically, so one hot key spreads
    * over `salts` reducers instead of one. Inner/left semantics match the
    * plain join. Dimension grows by `salts`x — keep salts small (8-32) or
    * broadcast the dimension instead when it fits. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      joinType: String = "inner", discriminator: Option[Column] = None): DataFrame = {
    val disc = discriminator.getOrElse(
      hash(fact.columns.map(col).toIndexedSeq: _*))
    val saltedFact = fact.withColumn("_salt", saltOf(salts, disc))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
