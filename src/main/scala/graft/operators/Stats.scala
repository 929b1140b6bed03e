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
}
