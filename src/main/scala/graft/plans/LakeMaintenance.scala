package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The lake's MAINTENANCE operations in SQL `FROM` position — the last
  * Scala-only corner of the lake's operational surface (the data plane
  * has DML/DDL via the catalog, the change feed has `table_changes`,
  * views have `create/refresh/lake_view`; compaction, DV
  * materialization, snapshot retention, and vacuum were API-only):
  *
  * {{{
  * SELECT * FROM optimize_lake('/lake/t')                -- compact small files
  * SELECT * FROM optimize_lake('/lake/t', 134217728)     -- explicit target bytes
  * SELECT * FROM materialize_lake_dvs('/lake/t')         -- rewrite DV-carrying files
  * SELECT * FROM expire_lake_snapshots('/lake/t', 5)     -- keep newest 5 manifests
  * SELECT * FROM vacuum_lake('/lake/t')                  -- crash-debris sweep
  * }}}
  *
  * Each resolves to a [[LakeCommand]] — a proper Catalyst command:
  * executing the statement runs the operation exactly once and returns
  * a one-row report (`spark.sql(...)` executes commands eagerly, so
  * callers need no action), while ANALYSIS-ONLY paths are INERT —
  * `EXPLAIN SELECT * FROM optimize_lake(...)` prints the plan and
  * touches nothing (commands plan under `CommandExecutionMode.SKIP`),
  * the same contract `EXPLAIN INSERT` has. Maintenance is the surface
  * users habitually EXPLAIN first, which is why these were the nodes
  * that most needed execution-time side effects. The operations
  * themselves are unchanged — same single-maintainer discipline, same
  * conflict validation against the optimistic commit log, same
  * crashed-swap recovery — so the SQL surface adds no new failure
  * modes, only reach. Argument-shape errors still surface at analysis
  * (a malformed call is an analysis error, like a missing table). */
object LakeMaintenance {

  /** Delta-ish default target: 128 MB output files. */
  val DefaultTargetBytes: Long = 128L << 20

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"lake maintenance: $what must be a string literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"lake maintenance: $what must be an integer literal, got $other")
  }

  def optimizePlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 || args.length == 2,
      "optimize_lake(path[, targetBytes])")
    val path = strLit(args.head, "path")
    val target = args.lift(1).map(longLit(_, "targetBytes"))
      .getOrElse(DefaultTargetBytes)
    LakeCommand.oneRow("optimize_lake", StructType(Seq(
      StructField("files_written", IntegerType, nullable = false)))) {
      spark => Row(
        graft.sources.v2.RecordCompaction.compact(spark, path, target))
    }
  }

  def materializeDvsPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "materialize_lake_dvs(path)")
    val path = strLit(args.head, "path")
    LakeCommand.oneRow("materialize_lake_dvs", StructType(Seq(
      StructField("files_rewritten", IntegerType, nullable = false)))) {
      spark => Row(graft.operators.DeletionVectors.materialize(spark, path))
    }
  }

  def expireSnapshotsPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2, "expire_lake_snapshots(path, keepLast)")
    val path = strLit(args.head, "path")
    val keep = longLit(args(1), "keepLast").toInt
    LakeCommand.oneRow("expire_lake_snapshots", StructType(Seq(
      StructField("snapshots_expired", IntegerType, nullable = false)))) {
      spark => Row(graft.operators.LakeSnapshots.expire(spark, path, keep))
    }
  }

  def vacuumPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 || args.length == 2,
      "vacuum_lake(path[, commitLogKeepLast])")
    val path = strLit(args.head, "path")
    val keep = args.lift(1).map(longLit(_, "commitLogKeepLast").toInt)
      .getOrElse(1000)
    LakeCommand.oneRow("vacuum_lake", StructType(Seq(
      StructField("markers_replayed", IntegerType, nullable = false),
      StructField("staging_dirs_removed", IntegerType, nullable = false),
      StructField("orphan_sidecars_removed", IntegerType, nullable = false),
      StructField("commit_entries_expired", IntegerType, nullable = false),
      StructField("stale_tmp_swept", IntegerType, nullable = false)))) {
      spark =>
        val r = graft.operators.Vacuum.clean(spark, path, keep)
        Row(r.markersReplayed, r.stagingDirsRemoved,
          r.orphanSidecarsRemoved, r.commitEntriesExpired, r.staleTmpSwept)
    }
  }
}
