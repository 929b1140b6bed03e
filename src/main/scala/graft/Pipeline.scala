package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.Normalize
import graft.operators.{Dedup, Strategies}
import graft.sources.{Sources, View}
import graft.state.StateStore

/** End-to-end sync run (reference: lib/AirtableToDatastore.py:28-49):
  * scan -> view-project -> normalize -> pk-filter -> dedupe -> purge
  * foreign update_types -> strategy join -> atomic snapshot write.
  *
  * The whole run is ONE Spark job graph: a scan, at most one shuffle on
  * the primary key (dedup window and strategy join share the hash
  * partitioning), and a write. The reference's per-record RPC loop
  * (lib/UpdateStrategies.py:216-248) has no surviving equivalent.
  */
final class SyncPipeline(spark: SparkSession, cfg: PipelineConfig,
    view: Option[View] = None) {

  cfg.validate()

  val store = new StateStore(spark, cfg.store.statePath)

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[SyncPipeline])

  /** Metrics of the most recent [[run]]: `skipped_rows` / `input_rows`
    * (the reference's per-skip counter, lib/DataProcessor.py:94-95) and
    * `added_fields` / `removed_fields` (schema drift vs the prior state,
    * lib/UpdateStrategies.py:501-511). Empty before the first run. */
  @volatile var lastRunMetrics: Map[String, Any] = Map.empty

  /** Normalize + dedupe the raw source
    * (reference: lib/AirtableToDatastore.py:51-56). */
  def prepare(raw: DataFrame,
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val projected = view.map(v => Sources.applyView(raw, v)).getOrElse(raw)
    val typed =
      if (cfg.source.fieldTypes.isEmpty) projected
      else projected.select(projected.columns.toSeq.map { c =>
        Normalize.castTo(org.apache.spark.sql.functions.col(c),
          cfg.source.fieldTypes.getOrElse(c, "passthrough")).as(c)
      }: _*)
    val keyed = obs match {
      case Some(o) => Normalize.filterValidPkObserved(typed, cfg.primaryKey, o)
      case None => Normalize.filterValidPk(typed, cfg.primaryKey)
    }
    val orderCol =
      if (keyed.columns.contains("_created_time")) Some("_created_time")
      else if (keyed.columns.contains("Created")) Some("Created")
      else None
    val tiebreak = if (keyed.columns.contains("_record_id")) Some("_record_id") else None
    orderCol.map(oc => Dedup.latestWins(keyed, cfg.primaryKey, oc, tiebreak)).getOrElse(keyed)
  }

  /** Align record-level state with the source schema; table-level
    * snapshots keep their own fixed schema and must NOT be aligned — the
    * snapshot frame has none of the source's data columns, and aligning it
    * would persist spurious null columns (and break the versioned union on
    * the next changed run). */
  private def staged(state: DataFrame, src: DataFrame): DataFrame = {
    val aligned = if (cfg.updateType.isTableLevel) state
      else Strategies.alignState(state, src)
    Strategies.purgeOtherUpdateTypes(aligned, cfg)
  }

  /** Run one sync: returns the new state (already persisted). Skip and
    * schema-drift counters land in [[lastRunMetrics]]. */
  def run(raw: DataFrame): DataFrame = {
    val obs = org.apache.spark.sql.Observation()
    // persist + count: completes the observation with EXACT counts (a
    // probe action like limit(1) would otherwise latch partial metrics)
    // and materializes src once for the strategies that reference it twice
    val src = prepare(raw, Some(obs)).persist()
    src.count()
    val skips = obs.get
    val skipped = skips("skipped_rows").asInstanceOf[Long]
    if (skipped > 0)
      log.warn(s"skipped $skipped record(s) with null/empty primary key " +
        s"'${cfg.primaryKey}' (reference: lib/DataProcessor.py:94-95)")
    val prior = store.load()
    // schema drift vs prior state: fields the source grew/lost since the
    // last run (reference warns per added/removed field,
    // lib/UpdateStrategies.py:501-511) — a driver-side column-set compare.
    // All engine-managed columns (incl. the table-snapshot trio) are
    // excluded from both sides; table-level states hold a pivoted
    // snapshot, not source columns, so drift is undefined there.
    val sysCols: Set[String] =
      Strategies.systemCols.toSet ++ graft.functions.Checksums.SystemColumns
    val driftDefined = prior.columns.nonEmpty && !cfg.updateType.isTableLevel
    val priorData = prior.columns.toSet -- sysCols
    val srcData = src.columns.toSet -- sysCols
    val added = if (driftDefined) srcData -- priorData else Set.empty[String]
    val removed = if (driftDefined) priorData -- srcData else Set.empty[String]
    if (added.nonEmpty || removed.nonEmpty)
      log.warn(s"schema drift on ${cfg.source.table}: added=$added removed=$removed")
    lastRunMetrics = Map(
      "skipped_rows" -> skipped,
      "input_rows" -> skips("input_rows").asInstanceOf[Long],
      "added_fields" -> added,
      "removed_fields" -> removed)
    try {
      val newState = Strategies.get(cfg.updateType)(src, staged(prior, src), cfg)
      store.overwrite(newState)
    } finally src.unpersist()
    store.load()
  }

  /** Pure (non-persisting) form for tests and dry runs. */
  def plan(raw: DataFrame, state: DataFrame): DataFrame = {
    val src = prepare(raw)
    Strategies.get(cfg.updateType)(src, staged(state, src), cfg)
  }
}
