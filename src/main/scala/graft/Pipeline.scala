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

  /** Normalize + dedupe the raw source
    * (reference: lib/AirtableToDatastore.py:51-56). */
  def prepare(raw: DataFrame): DataFrame = {
    val projected = view.map(v => Sources.applyView(raw, v)).getOrElse(raw)
    val typed =
      if (cfg.source.fieldTypes.isEmpty) projected
      else projected.select(projected.columns.toSeq.map { c =>
        Normalize.castTo(org.apache.spark.sql.functions.col(c),
          cfg.source.fieldTypes.getOrElse(c, "passthrough")).as(c)
      }: _*)
    val keyed = Normalize.filterValidPk(typed, cfg.primaryKey)
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

  /** Run one sync: returns the new state (already persisted). */
  def run(raw: DataFrame): DataFrame = {
    val src = prepare(raw)
    val newState = Strategies.get(cfg.updateType)(src, staged(store.load(), src), cfg)
    store.overwrite(newState)
    store.load()
  }

  /** Pure (non-persisting) form for tests and dry runs. */
  def plan(raw: DataFrame, state: DataFrame): DataFrame = {
    val src = prepare(raw)
    Strategies.get(cfg.updateType)(src, staged(state, src), cfg)
  }
}
