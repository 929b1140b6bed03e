package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-layout
  * operator: interleave the quantized bits of several columns into one
  * sort key, so rows close in ANY clustered dimension land close on
  * disk. Written as range-partitioned, z-sorted parquet, every row
  * group's min/max stats become tight in EVERY dimension at once, and a
  * predicate on any clustered column (not just the leading sort column)
  * prunes row groups at the scan — the property a plain lexicographic
  * sort only gives its first column. This is the layout step behind
  * "OPTIMIZE ZORDER BY"-style maintenance in lakehouse engines.
  *
  * Everything here is integer/double arithmetic in pure codegen'd
  * expressions (bits×dims terms — e.g. 16 for 8 bits × 2 dims — well
  * inside whole-stage codegen), no UDF, no shuffle for the key itself;
  * [[cluster]] adds the one range-exchange that any global re-sort
  * needs.
  */
object ZOrder {

  /** Quantize `v` into [0, 2^bits) over the fixed range [min, max],
    * clamping out-of-range values into the edge cells (so bounds may be
    * approximate — e.g. yesterday's observed min/max at 100 TB). */
  def quantize(v: Column, min: Double, max: Double, bits: Int): Column = {
    require(max > min, s"empty quantize range [$min, $max]")
    val levels = (1L << bits) - 1
    val scaled = (v.cast("double") - lit(min)) / lit(max - min) * lit(levels.toDouble)
    least(greatest(floor(scaled).cast("long"), lit(0L)), lit(levels))
  }

  /** Morton interleave of pre-quantized cell coordinates: bit b of dim d
    * lands at position b*dims + d. */
  def interleave(cells: Seq[Column], bitsPerDim: Int): Column = {
    require(cells.nonEmpty, "interleave needs at least one dimension")
    require(bitsPerDim * cells.size <= 62,
      s"$bitsPerDim bits x ${cells.size} dims overflows a signed long")
    val terms = for {
      b <- 0 until bitsPerDim
      (q, d) <- cells.zipWithIndex
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * cells.size + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-value for `dims` = (column, min, max) triples. */
  def zValue(dims: Seq[(Column, Double, Double)], bitsPerDim: Int): Column =
    interleave(dims.map { case (c, mn, mx) => quantize(c, mn, mx, bitsPerDim) },
      bitsPerDim)

  /** Cluster a frame by z-value: one range exchange + in-partition sort,
    * ready to write as parquet whose row groups are min/max-tight in
    * every clustered dimension. `nFiles` bounds output file count (range
    * partitioning keeps files balanced even on skewed z distributions). */
  def cluster(df: DataFrame, dims: Seq[(String, Double, Double)],
      bitsPerDim: Int = 16, nFiles: Int = 0): DataFrame = {
    val z = zValue(dims.map { case (n, mn, mx) => (col(n), mn, mx) }, bitsPerDim)
    val zc = TempCols.fresh(df, "_z")
    val withZ = df.withColumn(zc, z)
    val ranged =
      if (nFiles > 0) withZ.repartitionByRange(nFiles, col(zc))
      else withZ.repartitionByRange(col(zc))
    ranged.sortWithinPartitions(zc).drop(zc)
  }
}
