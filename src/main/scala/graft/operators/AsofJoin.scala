package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the single latest right row
  * whose timestamp is <= the left row's, per key. Spark has no native
  * as-of operator; a theta join (`l.ts >= r.ts`) would plan as a
  * broadcast-nested-loop and recompute per pair. This composition is the
  * scale shape: tag both sides, union, and carry the right side's payload
  * forward with a running `last(ignoreNulls)` window — ONE shuffle on the
  * key, linear in |left| + |right|, no range condition anywhere.
  *
  * Matches DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`:
  * equal timestamps match (the right row orders before the left row at the
  * same instant); null keys and null timestamps never match (null-key /
  * null-ts right rows are excluded up front; a null-ts left row orders
  * before every right row and a null-key left row shares its partition
  * only with excluded rows — both therefore carry no match, while still
  * appearing in the output with nulls, which is exactly SQL's
  * `NULL >= x -> no match` left-outer behavior). The right payload is
  * carried as ONE struct, so a matched row's null value columns come
  * through as nulls — never patched from an older row. The right side
  * must be unique per (key, ts) — pre-aggregate it otherwise, or the
  * surviving row at a duplicated instant is partition-order-dependent.
  */
object AsofJoin {

  /** Left rows + `valueCols` (and `<rightTs>` as `asof_ts`) from the
    * latest right row at-or-before each left row's `leftTs`; right-less
    * left rows keep nulls (left-outer semantics). `valueCols` and
    * `"asof_ts"` must not collide with left column names. */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val outCollisions = leftCols.toSet.intersect((valueCols :+ "asof_ts").toSet)
    require(outCollisions.isEmpty,
      s"output columns collide with left columns: $outCollisions — alias them first")
    // union schema: key, ts, side (right=0 < left=1 at equal ts),
    // left payload struct (null on right rows), right payload struct
    // (null on left rows — ONE struct, so the carry is atomic per row)
    val rPayload = struct((col(rightTs).as("_rts") +:
      valueCols.map(c => col(c).as(s"_v_$c"))): _*)
    val lTagged = left.select(
      col(keyCol).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(right.select(rPayload).schema.head.dataType).as("_r"))
    val rTagged = right
      .filter(col(keyCol).isNotNull && col(rightTs).isNotNull) // can never match
      .select(
        col(keyCol).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("_l"),
        rPayload.as("_r"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col("_l").getField(c).as(c)) ++
        Seq(col("_match").getField("_rts").as("asof_ts")) ++
        valueCols.map(c => col("_match").getField(s"_v_$c").as(c)): _*)
  }
}
