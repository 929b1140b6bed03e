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
