package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{BitmapDistinct, CosineSimilarity, LshCode, Md5Prefix60, NfcNormalize, TopKDistinct, TopKPairs}

/** Session extensions: registers the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT cosine_sim(a, b) ...")`,
  * `lsh_code(vec, bits, dim)`, `md5_prefix60(s)` and
  * `call_function(...)` work anywhere — plus the whole-operator planner
  * strategy for the native as-of join
  * ([[graft.plans.AsofJoinStrategy]] → [[graft.plans.AsofJoinExec]]).
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions())` — the engine's own entry
  * points (Verify/Bench/Smoke) install it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom operators (SURVEY §2.10 tier (c)): logical plan -> strategy
    // -> physical exec; extra strategies run before Spark's own
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // optimizer rewrites (conf-gated): exact COUNT(DISTINCT integral)
    // -> mergeable bitmap aggregate, killing the Expand/double-exchange
    ext.injectOptimizerRule(_ => graft.plans.RewriteCountDistinctBitmap)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("lsh_code"),
      new ExpressionInfo(classOf[LshCode].getName, "lsh_code"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "lsh_code takes (vec, bits, dim)")
        LshCode(args.head, intLit(args(1), "bits"), intLit(args(2), "dim"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "md5_prefix60 takes exactly 1 argument")
        Md5Prefix60(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize takes exactly 1 argument")
        NfcNormalize(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bitmap_distinct"),
      new ExpressionInfo(classOf[BitmapDistinct].getName, "bitmap_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "bitmap_distinct takes exactly 1 argument")
        BitmapDistinct(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_k_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "top_k_pairs"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "top_k_pairs takes (score, id, k)")
        TopKPairs(args.head, args(1), intLit(args(2), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hist_quantile"),
      new ExpressionInfo(graft.functions.HistQuantile.getClass.getName,
        "hist_quantile"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "hist_quantile takes (hs, lo, hi, p) with literal lo/hi/p")
        def dbl(e: Expression, what: String): Double = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null => v.toString.toDouble
          case other => throw new IllegalArgumentException(
            s"hist_quantile: $what must be a numeric literal, got $other")
        }
        graft.functions.HistQuantile.sqlExpression(args.head,
          dbl(args(1), "lo"), dbl(args(2), "hi"), dbl(args(3), "p"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_k_distinct"),
      new ExpressionInfo(classOf[TopKDistinct].getName, "top_k_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "top_k_distinct takes (value, k)")
        TopKDistinct(args.head, intLit(args(1), "k"))
      }))
    // table-valued: the lake's change feed in FROM position —
    // SELECT * FROM table_changes('cat.ns.t', v1, v2)
    ext.injectTableFunction((
      new FunctionIdentifier("table_changes"),
      new ExpressionInfo(graft.plans.TableChanges.getClass.getName,
        "table_changes"),
      (args: Seq[Expression]) => graft.plans.TableChanges.plan(args)))
    // maintained materialized views in SQL: define / advance / read
    // (graft.plans.LakeViewSql over graft.operators.LakeView)
    ext.injectTableFunction((
      new FunctionIdentifier("create_lake_view"),
      new ExpressionInfo(graft.plans.LakeViewSql.getClass.getName,
        "create_lake_view"),
      (args: Seq[Expression]) => graft.plans.LakeViewSql.createPlan(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("refresh_lake_view"),
      new ExpressionInfo(graft.plans.LakeViewSql.getClass.getName,
        "refresh_lake_view"),
      (args: Seq[Expression]) => graft.plans.LakeViewSql.refreshPlan(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("lake_view"),
      new ExpressionInfo(graft.plans.LakeViewSql.getClass.getName,
        "lake_view"),
      (args: Seq[Expression]) => graft.plans.LakeViewSql.readPlan(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("drop_lake_view"),
      new ExpressionInfo(graft.plans.LakeViewSql.getClass.getName,
        "drop_lake_view"),
      (args: Seq[Expression]) => graft.plans.LakeViewSql.dropPlan(args)))
    // a view's generation feed in FROM position — the view-layer twin
    // of table_changes: SELECT * FROM view_changes('/v', 1, 3)
    ext.injectTableFunction((
      new FunctionIdentifier("view_changes"),
      new ExpressionInfo(graft.plans.LakeViewSql.getClass.getName,
        "view_changes"),
      (args: Seq[Expression]) => graft.plans.LakeViewSql.changesPlan(args)))
    // lake maintenance in SQL: compaction, DV materialization, snapshot
    // retention, vacuum (graft.plans.LakeMaintenance — one-row reports)
    ext.injectTableFunction((
      new FunctionIdentifier("optimize_lake"),
      new ExpressionInfo(graft.plans.LakeMaintenance.getClass.getName,
        "optimize_lake"),
      (args: Seq[Expression]) => graft.plans.LakeMaintenance.optimizePlan(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("materialize_lake_dvs"),
      new ExpressionInfo(graft.plans.LakeMaintenance.getClass.getName,
        "materialize_lake_dvs"),
      (args: Seq[Expression]) =>
        graft.plans.LakeMaintenance.materializeDvsPlan(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("expire_lake_snapshots"),
      new ExpressionInfo(graft.plans.LakeMaintenance.getClass.getName,
        "expire_lake_snapshots"),
      (args: Seq[Expression]) =>
        graft.plans.LakeMaintenance.expireSnapshotsPlan(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("vacuum_lake"),
      new ExpressionInfo(graft.plans.LakeMaintenance.getClass.getName,
        "vacuum_lake"),
      (args: Seq[Expression]) => graft.plans.LakeMaintenance.vacuumPlan(args)))
  }
}
