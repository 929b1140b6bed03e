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
    val reserved = Seq("_lbin", "_lk", "_rbin", "_rk")
    require(!reserved.exists(left.columns.contains) &&
      !reserved.exists(right.columns.contains),
      s"columns named ${reserved.mkString("/")} are reserved by the range join")
    // FLOOR over the double quotient IS floor division (correct for
    // negative epochs too — do NOT "simplify" to integer `div`, which
    // truncates toward zero and would shift pre-1970 bins by one)
    def binOfEpoch(epochSec: org.apache.spark.sql.Column) =
      floor(epochSec.cast("double") / span).cast("long")
    val l = left
      .withColumn("_lbin", explode(sequence(
        binOfEpoch(unix_timestamp(col(leftTs)) - beforeSec),
        binOfEpoch(unix_timestamp(col(leftTs)) + afterSec))))
      .withColumn("_lk", col(keyCol))
    val r = right
      .withColumn("_rbin", binOfEpoch(unix_timestamp(col(rightTs))))
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
