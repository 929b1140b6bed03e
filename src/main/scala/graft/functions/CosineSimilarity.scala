package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * The composable form (`aggregate(zip_with(...))`, see
  * [[graft.operators.Similarity.cosine]]) evaluates higher-order
  * functions interpreted — per-row lambda dispatch and boxing. This
  * expression compiles to a single fused primitive loop inside
  * whole-stage codegen: one pass accumulating dot product and both
  * norms, no allocation. Semantics are bit-identical to the composable
  * form on equal-length vectors (same double ops in the same order):
  * `dot/(sqrt(na)*sqrt(nb))`, left-to-right accumulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    var j = n // norms run over each full vector (matches dot(a,a) form)
    while (j < x.numElements()) { val v = x.getFloat(j).toDouble; na += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getFloat(j).toDouble; nb += v * v; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |for (int $i = $n; $i < $x.numElements(); $i++) {
         |  double $xi = (double) $x.getFloat($i); $na += $xi * $xi;
         |}
         |for (int $i = $n; $i < $y.numElements(); $i++) {
         |  double $yi = (double) $y.getFloat($i); $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
