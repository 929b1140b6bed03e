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
    orderCol.map(oc => Dedup.latestWins(keyed, cfg.primaryKey, oc)).getOrElse(keyed)
  }

  /** Run one sync: returns the new state (already persisted). */
  def run(raw: DataFrame): DataFrame = {
    val src = prepare(raw)
    val state = Strategies.purgeOtherUpdateTypes(
      Strategies.alignState(store.load(), src), cfg)
    val strategy = Strategies.get(cfg.updateType)
    val newState = strategy(src, state, cfg)
    store.overwrite(newState)
    store.load()
  }

  /** Pure (non-persisting) form for tests and dry runs. */
  def plan(raw: DataFrame, state: DataFrame): DataFrame = {
    val src = prepare(raw)
    val aligned = Strategies.purgeOtherUpdateTypes(
      Strategies.alignState(state, src), cfg)
    Strategies.get(cfg.updateType)(src, aligned, cfg)
  }
}
