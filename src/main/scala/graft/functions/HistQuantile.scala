package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Read-side quantile estimation over a MAINTAINED histogram column
  * (`hs_<col>` from [[graft.operators.LakeView.HistSpec]] fold rules:
  * `array<long>` of underflow + bins + overflow counts over
  * `[lo, hi)`). A pure Column expression — composes into any readout
  * of the maintained state with zero extra jobs; the estimate is the
  * MIDPOINT of the bin holding the target rank (undershoot bounded by
  * half a bin width), with the underflow bin answering `lo` and the
  * overflow bin `hi` (their true values are outside the tracked
  * range). NULL/empty histograms estimate NULL. Ranks use
  * `ceil(p * total)` with `p` in (0, 1]; `p = 0.5` is the median.
  *
  * This is the 100-TB drift-dashboard shape: per-group quantile
  * estimates served from ∝-delta maintained state — no scan, no sort,
  * no sketch library — at fixed-bin resolution chosen at view
  * definition. */
object HistQuantile {

  def histQuantile(hs: Column, lo: Double, hi: Double, p: Double): Column = {
    require(p > 0.0 && p <= 1.0, s"quantile p must be in (0, 1], got $p")
    val bins = size(hs) - 2
    val step = (lit(hi) - lit(lo)) / bins.cast("double")
    val total = aggregate(hs, lit(0L), (a, x) => a + x)
    val rank = ceil(lit(p) * total.cast("double")).cast("long")
    // one fold tracks (cumulative, first index reaching the rank)
    val acc0 = struct(lit(0L).as("cum"), lit(-1).as("idx"))
    val indexed = zip_with(hs, sequence(lit(0), size(hs) - 1),
      (c, i) => struct(c.as("c"), i.as("i")))
    val found = aggregate(indexed, acc0,
      (acc, x) => struct(
        (acc("cum") + x("c")).as("cum"),
        when(acc("idx") >= 0, acc("idx"))
          .when(acc("cum") + x("c") >= rank, x("i"))
          .otherwise(lit(-1)).as("idx")))("idx")
    val mid = lit(lo) + (found.cast("double") - lit(0.5)) * step
    when(hs.isNull || total <= 0L, lit(null).cast("double"))
      .when(found === 0, lit(lo))
      .when(found === size(hs) - 1, lit(hi))
      .otherwise(mid)
  }

  /** The SAME estimator as a catalyst Expression for the SQL-registered
    * form (`hist_quantile(hs, lo, hi, p)` with literal bounds): the
    * function-registry builder must return a catalyst tree the analyzer
    * can finish — a composite built through the public Column API would
    * leak unresolved Column AST nodes into codegen — so the fold is a
    * parsed SQL template with the `hs` argument spliced in for a
    * placeholder attribute. `transform(array(<idx>), i -> ...)` binds
    * the found index once as a lambda variable (the template would
    * otherwise repeat the fold three times). */
  def sqlExpression(hs: org.apache.spark.sql.catalyst.expressions.Expression,
      lo: Double, hi: Double, p: Double)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(p > 0.0 && p <= 1.0, s"quantile p must be in (0, 1], got $p")
    val idx =
      s"""aggregate(
         |  zip_with(__hs, sequence(0, size(__hs) - 1),
         |    (c, i) -> struct(c AS c, i AS i)),
         |  struct(CAST(0 AS BIGINT) AS cum, -1 AS idx),
         |  (acc, x) -> struct(acc.cum + x.c AS cum,
         |    CASE WHEN acc.idx >= 0 THEN acc.idx
         |         WHEN acc.cum + x.c >= CAST(ceil(${p}D *
         |           CAST(aggregate(__hs, CAST(0 AS BIGINT),
         |             (a, v) -> a + v) AS DOUBLE)) AS BIGINT)
         |           THEN x.i
         |         ELSE -1 END AS idx)).idx""".stripMargin
    val step = s"((${hi}D - ${lo}D) / CAST(size(__hs) - 2 AS DOUBLE))"
    val tpl =
      s"""CASE
         |  WHEN __hs IS NULL
         |    OR aggregate(__hs, CAST(0 AS BIGINT), (a, v) -> a + v) <= 0
         |    THEN CAST(NULL AS DOUBLE)
         |  ELSE element_at(transform(array($idx), i ->
         |    CASE WHEN i = 0 THEN ${lo}D
         |         WHEN i = size(__hs) - 1 THEN ${hi}D
         |         ELSE ${lo}D + (CAST(i AS DOUBLE) - 0.5D) * $step
         |    END), 1)
         |END""".stripMargin
    val parsed = org.apache.spark.sql.SparkSession.active.sessionState
      .sqlParser.parseExpression(tpl)
    parsed.transformUp {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.name == "__hs" => hs
      // inside a lambda body the parser emits lambda-variable
      // candidates, not attributes — the placeholder appears there too
      case v: org.apache.spark.sql.catalyst.expressions
          .UnresolvedNamedLambdaVariable
          if v.nameParts == Seq("__hs") => hs
    }
  }
}
