package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** A side-effecting lake operation as a proper Catalyst COMMAND — the
  * engine's `table_changes`-style TVFs that DO things (refresh a view,
  * compact a table, expire snapshots) resolve to this instead of
  * running at analysis time.
  *
  * Why a `RunnableCommand` and not command-at-resolution: Spark's
  * query execution runs commands EAGERLY when a statement executes
  * (`QueryExecution.eagerlyExecuteCommands`), so
  * `spark.sql("SELECT * FROM optimize_lake(...)")` still performs the
  * operation exactly once and returns its report row — no caller
  * change. But analysis-only paths plan with
  * `CommandExecutionMode.SKIP`, so `EXPLAIN SELECT * FROM
  * optimize_lake(...)` (and a failed outer statement's analysis) is
  * INERT: the plan prints, the table's layout is untouched. That is
  * the same contract `EXPLAIN INSERT` has — explaining a mutation must
  * not mutate. Argument-shape validation and definition loading stay
  * at resolution (a bad path is an analysis error, like a missing
  * table); only the WORK moves to `run`. */
case class LakeCommand(name: String,
    override val output: Seq[Attribute],
    body: SparkSession => Seq[Row]) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] =
    body(sparkSession)
  override def simpleString(maxFields: Int): String =
    s"LakeCommand($name)"
}

object LakeCommand {
  /** One-report-row command (every maintenance/refresh TVF's shape). */
  def oneRow(name: String, schema: StructType)
      (body: SparkSession => Row): LogicalPlan =
    LakeCommand(name, DataTypeUtils.toAttributes(schema),
      spark => Seq(body(spark)))
}
