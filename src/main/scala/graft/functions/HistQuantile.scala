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
}
