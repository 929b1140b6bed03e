package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the single latest right row
  * whose timestamp is <= the left row's, per key. Spark has no native
  * as-of operator; a theta join (`l.ts >= r.ts`) would plan as a
  * broadcast-nested-loop and recompute per pair. This composition is the
  * scale shape: tag both sides, union, and carry the right side's values
  * forward with a running `last(ignoreNulls)` window — ONE shuffle on the
  * key, linear in |left| + |right|, no range condition anywhere.
  *
  * Matches DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`
  * (equal timestamps match: the right row orders before the left row at
  * the same instant). The right side must be unique per (key, ts) —
  * pre-aggregate it otherwise, or the surviving row at a duplicated
  * instant is partition-order-dependent.
  */
object AsofJoin {

  /** Left rows + `valueCols` (and `<rightTs>` as `asof_ts`) from the
    * latest right row at-or-before each left row's `leftTs`; right-less
    * left rows keep nulls (left-outer semantics). */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightTsType = right.schema(rightTs).dataType
    // union schema: key, ts, side (right=0 < left=1 at equal ts),
    // left payload struct (null on right rows), right values (null on left)
    val carryCols = "_rts" +: valueCols.map(c => s"_v_$c")
    val lTagged = left.select(Seq(
      col(keyCol).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(rightTsType).as("_rts")) ++
      valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_v_$c")): _*)
    val rTagged = right.select(Seq(
      col(keyCol).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("_l"),
      col(rightTs).as("_rts")) ++
      valueCols.map(c => col(c).as(s"_v_$c")): _*)
    val w = Window.partitionBy(col("_k")).orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(col("*") +: carryCols.map(c =>
        last(col(c), ignoreNulls = true).over(w).as(s"_carry$c")): _*)
    carried.filter(col("_side") === 1)
      .select(leftCols.map(c => col("_l").getField(c).as(c)) ++
        Seq(col("_carry_rts").as("asof_ts")) ++
        valueCols.map(c => col(s"_carry_v_$c").as(c)): _*)
  }
}
