package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd random-hyperplane LSH code over an `array<float>`
  * embedding: bit i of the result is the sign of `<vec, plane_i>`.
  *
  * The composable form this replaces unrolled `bits x dim` (= 512 for the
  * default 8x64) `element_at * lit` terms into one expression tree —
  * ~1,500 Catalyst nodes per row that fell out of whole-stage codegen and
  * cost seconds over thousand-row tables. This expression is the same
  * pattern as [[CosineSimilarity]]: the hyperplane matrix is built once at
  * plan time (deterministic md5-seeded components, no RNG — see
  * [[LshCode.planeComponent]]) and referenced from a fused primitive loop.
  *
  * Arithmetic is bit-identical to the unrolled form AND to the SQL-oracle
  * rebuild for well-formed vectors (length == dim, no null elements): per
  * plane, a left-to-right double accumulation of
  * `(double) vec[d] * plane(i, d)`; bit set iff the sum is `>= 0`.
  *
  * Degenerate inputs: vectors SHORTER than `dim` project over their
  * available elements only — matching the SQL-oracle form, whose loop runs
  * over len(vec) (the old unrolled element_at form threw under ANSI);
  * null elements read as 0.0, matching SQL list_sum's null-skip. Vectors
  * LONGER than `dim` use only the first `dim` components — callers must
  * pass the embedding's true dimensionality (annTopK enforces this on the
  * probe side).
  */
case class LshCode(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")
  // dim = 0 would make every projection the empty sum (>= 0), collapsing
  // all vectors into one all-bits-set bucket with no error
  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_code"

  @transient private lazy val planes: Array[Array[Double]] =
    LshCode.planeMatrix(bits, dim)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var code = 0L
    var i = 0
    while (i < bits) {
      val p = planes(i)
      var acc = 0.0
      var d = 0
      while (d < n) { acc += v.getFloat(d).toDouble * p(d); d += 1 }
      if (acc >= 0) code |= (1L << i)
      i += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val code = ctx.freshName("code")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      s"""
         |long $code = 0L;
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |for (int $i = 0; $i < $bits; $i++) {
         |  double[] $p = $planesRef[$i];
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += ((double) $v.getFloat($d)) * $p[$d];
         |  }
         |  if ($acc >= 0) $code |= (1L << $i);
         |}
         |${ev.value} = $code;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshCode {

  /** Deterministic pseudo-random hyperplane component: the 60-bit md5
    * prefix of "plane:dim" mapped to [-1, 1). No RNG — reproducible across
    * runs AND engines, so a SQL oracle can rebuild the identical planes:
    * `CAST(('0x'||substr(md5(p||':'||d),1,15)) AS BIGINT) / 1152921504606846975.0 * 2 - 1`.
    */
  def planeComponent(plane: Int, dim: Int): Double =
    Md5Hash.prefix60(org.apache.spark.unsafe.types.UTF8String
      .fromString(s"$plane:$dim")).toDouble / 0xFFFFFFFFFFFFFFFL.toDouble * 2 - 1

  def planeMatrix(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits, dim)(planeComponent)

  /** Driver-side code of one vector — the exact arithmetic of the
    * expression (left-to-right double accumulation), for probe-code
    * computation without a Spark job. */
  def codeOf(vec: Seq[Float], bits: Int, dim: Int): Long = {
    val planes = planeMatrix(bits, dim)
    val n = math.min(dim, vec.length)
    var code = 0L
    var i = 0
    while (i < bits) {
      var acc = 0.0
      var d = 0
      while (d < n) { acc += vec(d).toDouble * planes(i)(d); d += 1 }
      if (acc >= 0) code |= (1L << i)
      i += 1
    }
    code
  }

  /** All codes within Hamming distance `radius` of `center` over `bits`
    * bit positions — the multi-probe ball an ANN query scans. Size is
    * `sum_{h<=radius} C(bits, h)` (37 for bits=8, radius=2). */
  def hammingBall(center: Long, bits: Int, radius: Int): Seq[Long] = {
    def flips(positions: List[Int], remaining: Int): Seq[Long] =
      if (remaining == 0) Seq(0L)
      else positions match {
        case Nil => Seq.empty
        case p :: rest =>
          flips(rest, remaining - 1).map(m => m | (1L << p)) ++ flips(rest, remaining)
      }
    val masks = (0 to radius).flatMap(h => flips((0 until bits).toList, h)).distinct
    masks.map(center ^ _)
  }
}
