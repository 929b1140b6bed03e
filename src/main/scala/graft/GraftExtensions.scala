package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

/** Session extensions: registers the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` and
  * `call_function("cosine_sim", ...)` work anywhere.
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(args.head, args(1))
      }))
  }
}
