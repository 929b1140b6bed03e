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
  * Each executes when the statement is analyzed (command-at-resolution,
  * the `table_changes`/`refresh_lake_view` contract) and returns a
  * one-row report. The operations themselves are unchanged — same
  * single-maintainer discipline, same conflict validation against the
  * optimistic commit log, same crashed-swap recovery — so the SQL
  * surface adds no new failure modes, only reach.
  *
  * CAVEAT of command-at-resolution: ANALYSIS-ONLY paths run the side
  * effect too — `EXPLAIN SELECT * FROM optimize_lake(...)` compacts,
  * a CACHE/CTAS whose outer statement later fails has still vacuumed,
  * and a dry plan against a production table is not dry. Don't probe
  * plans against tables you aren't prepared to maintain; every
  * operation here is semantics-preserving (layout only), so the blast
  * radius is wasted work, never changed answers — but refreshes DO
  * advance view watermarks. Same contract as `table_changes`'
  * resolution-time catalog reads, documented here because maintenance
  * is the surface where users habitually EXPLAIN first. */
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

  private def oneRow(spark: SparkSession, schema: StructType,
      row: Row): LogicalPlan =
    spark.createDataFrame(java.util.Collections.singletonList(row), schema)
      .queryExecution.logical

  def optimizePlan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    require(args.length == 1 || args.length == 2,
      "optimize_lake(path[, targetBytes])")
    val path = strLit(args.head, "path")
    val target = args.lift(1).map(longLit(_, "targetBytes"))
      .getOrElse(DefaultTargetBytes)
    val written =
      graft.sources.v2.RecordCompaction.compact(spark, path, target)
    oneRow(spark, StructType(Seq(
      StructField("files_written", IntegerType, nullable = false))),
      Row(written))
  }

  def materializeDvsPlan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    require(args.length == 1, "materialize_lake_dvs(path)")
    val rewritten = graft.operators.DeletionVectors.materialize(
      spark, strLit(args.head, "path"))
    oneRow(spark, StructType(Seq(
      StructField("files_rewritten", IntegerType, nullable = false))),
      Row(rewritten))
  }

  def expireSnapshotsPlan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    require(args.length == 2, "expire_lake_snapshots(path, keepLast)")
    val expired = graft.operators.LakeSnapshots.expire(spark,
      strLit(args.head, "path"), longLit(args(1), "keepLast").toInt)
    oneRow(spark, StructType(Seq(
      StructField("snapshots_expired", IntegerType, nullable = false))),
      Row(expired))
  }

  def vacuumPlan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    require(args.length == 1 || args.length == 2,
      "vacuum_lake(path[, commitLogKeepLast])")
    val r = graft.operators.Vacuum.clean(spark, strLit(args.head, "path"),
      args.lift(1).map(longLit(_, "commitLogKeepLast").toInt)
        .getOrElse(1000))
    oneRow(spark, StructType(Seq(
      StructField("markers_replayed", IntegerType, nullable = false),
      StructField("staging_dirs_removed", IntegerType, nullable = false),
      StructField("orphan_sidecars_removed", IntegerType, nullable = false),
      StructField("commit_entries_expired", IntegerType, nullable = false),
      StructField("stale_tmp_swept", IntegerType, nullable = false))),
      Row(r.markersReplayed, r.stagingDirsRemoved, r.orphanSidecarsRemoved,
        r.commitEntriesExpired, r.staleTmpSwept))
  }
}
