package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join — all (left, right) pairs sharing a key with the
  * right timestamp inside `[left.ts - beforeSec, left.ts + afterSec]`.
  *
  * Spark plans a raw range predicate (`r.ts BETWEEN ...`) as a
  * broadcast-nested-loop — quadratic per key. The scale shape is bin
  * bucketing: with bin width = the window span, every right row lands in
  * exactly ONE bin and every left window covers at most TWO consecutive
  * bins, so the rendezvous is a plain equi-join on (key, bin) followed by
  * the exact range filter — one shuffle, output-linear cost.
  */
object RangeJoin {

  /** Pairs (all left columns, all right columns) matching the window.
    * Column names must not collide between the sides (alias beforehand).
    * `beforeSec + afterSec` must be positive. */
  def byKeyAndWindow(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, beforeSec: Long,
      afterSec: Long): DataFrame = {
    val span = beforeSec + afterSec
    require(span > 0, "window span must be positive")
    // epoch seconds; floorDiv semantics via FLOOR on double division would
    // drift on negatives — use integer floor division in the engine
    def binOf(ts: org.apache.spark.sql.Column) =
      floor(unix_timestamp(ts).cast("double") / span).cast("long")
    val lBinLo = floor((unix_timestamp(col(leftTs)) - beforeSec).cast("double") / span).cast("long")
    val lBinHi = floor((unix_timestamp(col(leftTs)) + afterSec).cast("double") / span).cast("long")
    val l = left
      .withColumn("_lbin", explode(sequence(lBinLo, lBinHi)))
      .withColumn("_lk", col(keyCol))
    val r = right
      .withColumn("_rbin", binOf(col(rightTs)))
      .withColumn("_rk", col(keyCol)).drop(keyCol)
    // bins use second-truncated epochs (coverage still holds: truncation
    // moves both sides the same way); the exact filter compares raw
    // timestamps at full microsecond precision
    l.join(r, col("_lk") === col("_rk") && col("_lbin") === col("_rbin"))
      .filter(col(rightTs) >= col(leftTs) - expr(s"INTERVAL $beforeSec SECOND") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $afterSec SECOND"))
      .drop("_lbin", "_rbin", "_lk", "_rk")
  }
}
