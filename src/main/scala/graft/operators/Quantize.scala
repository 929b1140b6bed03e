package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns (`array<float>`) — the
  * 4× size cut that turns 100 TB of float32 vectors into 25 TB of bytes
  * plus one scale per vector, which is the difference between an ANN
  * index that fits executor memory and one that spills. Per-vector
  * max-abs scaling: `q_i = round(x_i / scale * 127)`, `scale =
  * max_i |x_i|`, so every vector uses the full ±127 range regardless of
  * its magnitude and cosine ordering is preserved to ~1/254 relative
  * error per coordinate.
  *
  * Everything is a pure Catalyst expression over the array — codegen'd,
  * embarrassingly parallel, zero shuffle: quantizing a corpus is exactly
  * one parquet-speed scan. Rounding is phrased as `floor(v + 0.5)`
  * (round half toward +inf) — the one rounding rule every IEEE SQL
  * engine reproduces bit-identically, which keeps the op oracle-checkable.
  */
object Quantize {

  /** Per-vector max-abs scale: `max_i |x_i|` as double (float→double is
    * exact). Zero for the all-zero vector. */
  def maxAbsScale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Quantize one vector given its scale: `floor(x/scale*127 + 0.5)` per
    * element, int-typed; the all-zero vector (scale 0) maps to zeros. */
  def int8(vec: Column, scale: Column): Column =
    when(scale > 0,
      transform(vec, x => floor(x.cast("double") / scale * 127 + lit(0.5)).cast("int")))
      .otherwise(transform(vec, _ => lit(0)))

  /** Reconstruct: `q_i * scale / 127` (double). */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale / lit(127))

  /** Quantize a whole embedding table: adds `scale` (double) and `qvec`
    * (array<int>, values in [-127, 127]) next to the input columns. */
  def quantize(embeddings: DataFrame, vecCol: String): DataFrame = {
    val sc = TempCols.fresh(embeddings, "scale")
    val qc = TempCols.fresh(embeddings, "qvec")
    embeddings
      .withColumn(sc, maxAbsScale(col(vecCol)))
      .withColumn(qc, int8(col(vecCol), col(sc)))
  }

  /** Per-vector quantization report — scalar, order-independent summaries
    * (sum / min / max / saturation count / max reconstruction error), so
    * the whole frame is exact-hash comparable across engines without
    * serializing arrays. `max_abs_err <= scale/254` by construction
    * (half a quantization step). */
  def int8Report(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = TempCols.fresh(embeddings, "_v")
    val q = TempCols.fresh(embeddings, "_q")
    val s1 = embeddings.select(col(idCol), col(vecCol).as(v),
      maxAbsScale(col(vecCol)).as("scale"))
    val s2 = s1.select(col(idCol), col(v), col("scale"),
      int8(col(v), col("scale")).as(q))
    s2.select(col(idCol), col("scale"),
      aggregate(col(q), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
      array_min(col(q)).as("q_min"),
      array_max(col(q)).as("q_max"),
      size(filter(col(q), x => abs(x) === 127)).cast("long").as("n_sat"),
      array_max(zip_with(col(v), col(q),
        (x, qi) => abs(x.cast("double") - qi.cast("double") * col("scale") / lit(127))))
        .as("max_abs_err"))
  }
}
