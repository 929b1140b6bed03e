package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{PipelineConfig, UpdateType}
import graft.functions.Checksums

/** The reference's ten update strategies (+ APPEND, documented but missing
  * there — reference: README.md:58-59), re-expressed as set operations.
  *
  * The reference runs one target point-query per source record inside a
  * Python loop (N+1 — reference: lib/UpdateStrategies.py:62,82,148,220,259).
  * Every record-level strategy here is instead ONE full-outer join on the
  * primary key followed by a single conditional projection: one shuffle,
  * no per-row branches on the driver, no union-of-recomputed-join branches.
  * Catalyst picks broadcast-hash when one side is small, sort-merge
  * otherwise; AQE handles skew at scale.
  *
  * A strategy is a pure function `(source, state, cfg) => newState`.
  * `source` carries only data columns (pk included, already normalized and
  * deduped); `state` carries data columns + system columns. The caller
  * persists `newState` atomically (see [[graft.state.StateStore]]).
  */
object Strategies {

  /** System columns maintained by the engine on every state row
    * (reference: lib/UpdateStrategies.py:48-55,128-139,166-177). */
  val systemSchema: Seq[(String, DataType)] = Seq(
    "doc_id" -> StringType,
    "update_type" -> StringType,
    "write_timestamp" -> TimestampType,
    "is_deleted" -> BooleanType,
    "version" -> LongType,
    "version_id" -> LongType,
    "start_date" -> TimestampType,
    "end_date" -> TimestampType,
    "latest" -> BooleanType)
  val systemCols: Seq[String] = systemSchema.map(_._1)

  /** Deterministic surrogate doc id. The reference auto-generates ids
    * (lib/FirestoreWrapper.py:47); a content-derived id keeps reruns
    * idempotent and tests golden. Unique per (update_type, pk, version). */
  def docId(cfg: PipelineConfig, pk: Column, versionId: Column): Column =
    md5(concat_ws("|", lit(cfg.updateType.value), pk.cast("string"), versionId.cast("string")))

  /** Add missing data/system columns to `state` as typed nulls so that
    * first-run (empty/old-schema) state aligns with the source schema. */
  def alignState(state: DataFrame, src: DataFrame): DataFrame = {
    val have = state.columns.toSet
    val addData = src.schema.fields.filterNot(f => have(f.name)).toSeq
      .map(f => lit(null).cast(f.dataType).as(f.name))
    val addSys = systemSchema.filterNot { case (n, _) => have(n) }
      .map { case (n, t) => lit(null).cast(t).as(n) }
    if (addData.isEmpty && addSys.isEmpty) state
    else state.select((state.columns.toSeq.map(col) ++ addData ++ addSys): _*)
  }

  /** Base-class purge: rows whose update_type differs from the run's are
    * dropped before the strategy applies
    * (reference: lib/UpdateStrategies.py:31-34). */
  def purgeOtherUpdateTypes(state: DataFrame, cfg: PipelineConfig): DataFrame =
    if (!state.columns.contains("update_type")) state
    else state.filter(col("update_type").isNull || col("update_type") === lit(cfg.updateType.value))

  // ---------------------------------------------------------------------
  // Shared join scaffolding: pack both sides into structs (no ambiguous
  // column refs even when src and state share lineage), full-outer join
  // on pk, then one conditional projection builds the new state.
  // ---------------------------------------------------------------------

  private case class Joined(df: DataFrame, dataCols: Seq[String],
      srcPresent: Column, tgtPresent: Column, changed: Column) {
    def s(c: String): Column = col("_s").getField(c)
    def t(c: String): Column = col("_t").getField(c)
  }

  private def fullOuterOnPk(src: DataFrame, state0: DataFrame, cfg: PipelineConfig): Joined = {
    val state = alignState(state0, src)
    val dataCols = src.columns.toSeq
    val ck = Checksums.rowChecksum(dataCols)
    val sp = src.select(col(cfg.primaryKey).as("_spk"),
      struct(dataCols.map(col): _*).as("_s"), ck.as("_sck"))
    val tp = state.select(col(cfg.primaryKey).as("_tpk"),
      struct(state.columns.toIndexedSeq.map(col): _*).as("_t"), ck.as("_tck"))
    val j = sp.join(tp, sp("_spk") === tp("_tpk"), "full_outer")
    Joined(j, dataCols,
      srcPresent = col("_s").isNotNull,
      tgtPresent = col("_t").isNotNull,
      changed = col("_sck") =!= col("_tck"))
  }

  /** Source<->target diff classification by primary key: the semantic core
    * of every upsert strategy (reference: lib/UpdateStrategies.py:214-294)
    * exposed for observability and oracle checks. */
  def classify(src: DataFrame, state: DataFrame, cfg: PipelineConfig): DataFrame = {
    val j = fullOuterOnPk(src, state, cfg)
    j.df.select(
      coalesce(col("_spk"), col("_tpk")).as(cfg.primaryKey),
      when(!j.tgtPresent, lit("insert"))
        .when(!j.srcPresent, lit("delete"))
        .when(j.changed, lit("update"))
        .otherwise(lit("unchanged")).as("action"))
  }

  // ---------------------------------------------------------------------
  // Record-level strategies
  // ---------------------------------------------------------------------

  type Strategy = (DataFrame, DataFrame, PipelineConfig) => DataFrame

  private def stamped(src: DataFrame, cfg: PipelineConfig, extra: (String, Column)*): DataFrame = {
    val base = Map(
      "doc_id" -> docId(cfg, col(cfg.primaryKey), lit(cfg.versionId)),
      "update_type" -> lit(cfg.updateType.value),
      "write_timestamp" -> current_timestamp(),
      "is_deleted" -> lit(null).cast(BooleanType),
      "version" -> lit(null).cast(LongType),
      "version_id" -> lit(null).cast(LongType),
      "start_date" -> lit(null).cast(TimestampType),
      "end_date" -> lit(null).cast(TimestampType),
      "latest" -> lit(null).cast(BooleanType)) ++ extra.toMap
    src.select((src.columns.toSeq.map(col) ++ systemCols.map(c => base(c).as(c))): _*)
  }

  /** FULL_REFRESH: truncate and reload
    * (reference: lib/UpdateStrategies.py:44-55). */
  val fullRefresh: Strategy = (src, _, cfg) => stamped(src, cfg)

  /** REPLACE: delete any target rows sharing a source pk, insert the source
    * rows fresh; unmatched target rows survive
    * (reference: lib/UpdateStrategies.py:57-72). */
  val replace: Strategy = (src, state, cfg) => {
    val j = fullOuterOnPk(src, state, cfg)
    val sys: Map[String, Column] = Map(
      "doc_id" -> when(j.srcPresent, docId(cfg, col("_spk"), lit(cfg.versionId))).otherwise(j.t("doc_id")),
      "update_type" -> when(j.srcPresent, lit(cfg.updateType.value)).otherwise(j.t("update_type")),
      "write_timestamp" -> when(j.srcPresent, current_timestamp()).otherwise(j.t("write_timestamp"))) ++
      Seq("is_deleted", "version", "version_id", "start_date", "end_date", "latest")
        .map(c => c -> when(j.srcPresent, lit(null)).otherwise(j.t(c)).cast(typeOf(c)))
    j.df.select(
      (j.dataCols.map(c => when(j.srcPresent, j.s(c)).otherwise(j.t(c)).as(c))
        ++ systemCols.map(c => sys(c).as(c))): _*)
  }

  /** APPEND: insert source rows whose pk is absent from the target; never
    * touch existing rows (reference: README.md:58-59, documented only). */
  val append: Strategy = (src, state0, cfg) => {
    val state = alignState(state0, src)
    val newRows = stamped(
      src.join(state.select(col(cfg.primaryKey)), Seq(cfg.primaryKey), "left_anti"), cfg)
    state.select(newRows.columns.toIndexedSeq.map(col): _*).unionByName(newRows)
  }

  /** UPSERT_CHECKSUM: matched+changed -> update in place (doc id kept, new
    * version_id); new pk -> insert; target-only rows survive
    * (reference: lib/UpdateStrategies.py:214-248). */
  val upsertChecksum: Strategy = (src, state, cfg) => upsert(src, state, cfg, deleteMissing = false)

  /** UPSERT_CHECKSUM_WITH_DELETE: same, but target rows whose pk left the
    * source are deleted (reference: lib/UpdateStrategies.py:250-294). */
  val upsertChecksumWithDelete: Strategy = (src, state, cfg) => upsert(src, state, cfg, deleteMissing = true)

  private def upsert(src: DataFrame, state: DataFrame, cfg: PipelineConfig,
      deleteMissing: Boolean): DataFrame = {
    val j = fullOuterOnPk(src, state, cfg)
    val isInsert = j.srcPresent && !j.tgtPresent
    val isUpdate = j.srcPresent && j.tgtPresent && j.changed
    val takeSrc = isInsert || isUpdate
    val sys: Map[String, Column] = Map(
      "doc_id" -> when(isInsert, docId(cfg, col("_spk"), lit(cfg.versionId))).otherwise(j.t("doc_id")),
      "update_type" -> when(takeSrc, lit(cfg.updateType.value)).otherwise(j.t("update_type")),
      "write_timestamp" -> when(takeSrc, current_timestamp()).otherwise(j.t("write_timestamp")),
      "version_id" -> when(takeSrc, lit(cfg.versionId)).otherwise(j.t("version_id"))) ++
      Seq("is_deleted", "version", "start_date", "end_date", "latest")
        .map(c => c -> j.t(c).cast(typeOf(c)))
    val out = j.df.select(
      (j.dataCols.map(c => when(takeSrc, j.s(c)).otherwise(j.t(c)).as(c))
        ++ systemCols.map(c => sys(c).as(c)) ++ Seq(j.srcPresent.as("_keep"))): _*)
    val kept = if (deleteMissing) out.filter(col("_keep")) else out
    kept.drop("_keep")
  }

  /** SOFT_DELETE: upsert in place, and flag (never drop) target rows whose
    * pk left the source; re-appearing rows are undeleted
    * (reference: lib/UpdateStrategies.py:74-118). */
  val softDelete: Strategy = (src, state, cfg) => {
    val j = fullOuterOnPk(src, state, cfg)
    val wasDeleted = coalesce(j.t("is_deleted"), lit(false))
    val isInsert = j.srcPresent && !j.tgtPresent
    val isUpdate = j.srcPresent && j.tgtPresent && (j.changed || wasDeleted)
    val takeSrc = isInsert || isUpdate
    val nowDeleted = !j.srcPresent && j.tgtPresent && !wasDeleted
    val sys: Map[String, Column] = Map(
      "doc_id" -> when(isInsert, docId(cfg, col("_spk"), lit(cfg.versionId))).otherwise(j.t("doc_id")),
      "update_type" -> when(takeSrc, lit(cfg.updateType.value)).otherwise(j.t("update_type")),
      "write_timestamp" -> when(takeSrc || nowDeleted, current_timestamp()).otherwise(j.t("write_timestamp")),
      "is_deleted" -> when(takeSrc, lit(false)).when(nowDeleted, lit(true)).otherwise(j.t("is_deleted"))) ++
      Seq("version", "version_id", "start_date", "end_date", "latest")
        .map(c => c -> j.t(c).cast(typeOf(c)))
    j.df.select(
      (j.dataCols.map(c => when(takeSrc, j.s(c)).otherwise(j.t(c)).as(c))
        ++ systemCols.map(c => sys(c).as(c))): _*)
  }

  /** VERSIONED: every run appends a full new version of every source row
    * and demotes all previous rows (reference: lib/UpdateStrategies.py:121-139).
    * No join at all — a union of the demoted history and the new set. */
  val versioned: Strategy = (src, state0, cfg) => {
    val state = alignState(state0, src)
    val demoted = state.withColumn("latest", lit(false))
    val fresh = stamped(src, cfg,
      "version" -> lit(cfg.versionId),
      "start_date" -> current_timestamp(),
      "end_date" -> lit(null).cast(TimestampType),
      "latest" -> lit(true))
    demoted.select(fresh.columns.toIndexedSeq.map(col): _*).unionByName(fresh)
  }

  /** VERSIONED_CHECKSUM: append a new version only for pks whose latest
    * version's checksum differs (or which are new); demote the previous
    * latest of exactly those pks. Missing pks keep their chains (the
    * reference's delete path is dead code —
    * lib/UpdateStrategies.py:141-191,203-208). */
  val versionedChecksum: Strategy = (src, state0, cfg) => {
    val state = alignState(state0, src)
    val dataCols = src.columns.toSeq
    val ck = Checksums.rowChecksum(dataCols)
    val latest = state.filter(coalesce(col("latest"), lit(false)))
      .select(col(cfg.primaryKey).as("_tpk"), ck.as("_tck"))
    val changed = src.withColumn("_sck", ck)
      .join(latest, col(cfg.primaryKey) === col("_tpk"), "left_outer")
      .filter(col("_tpk").isNull || col("_sck") =!= col("_tck"))
      .select(dataCols.map(col): _*)
    val fresh = stamped(changed, cfg,
      "version_id" -> lit(cfg.versionId),
      "latest" -> lit(true))
    val changedPks = changed.select(col(cfg.primaryKey).as("_cpk"))
    val demoted = state
      .join(changedPks, col(cfg.primaryKey) === col("_cpk"), "left_outer")
      .withColumn("latest",
        when(col("_cpk").isNotNull && coalesce(col("latest"), lit(false)), lit(false))
          .otherwise(col("latest")))
      .drop("_cpk")
    demoted.select(fresh.columns.toIndexedSeq.map(col): _*).unionByName(fresh)
  }

  /** VERSIONED_SET: if ANY change exists (new/changed/deleted pk vs the
    * current latest set), demote everything and append the whole source as
    * one new versioned set; otherwise no-op
    * (reference: lib/UpdateStrategies.py:296-345). The change probe is an
    * early-out `limit(1).isEmpty`, not a full aggregate. */
  val versionedSet: Strategy = (src, state0, cfg) => {
    val state = alignState(state0, src)
    val latestOnly = state.filter(coalesce(col("latest"), lit(false)))
    val anyChange = !classify(src, latestOnly, cfg)
      .filter(col("action") =!= "unchanged").limit(1).isEmpty
    if (!anyChange) state
    else {
      val demoted = state.withColumn("latest", lit(false))
      val fresh = stamped(src, cfg,
        "version_id" -> lit(cfg.versionId),
        "latest" -> lit(true))
      demoted.select(fresh.columns.toIndexedSeq.map(col): _*).unionByName(fresh)
    }
  }

  private def typeOf(sysCol: String): DataType =
    systemSchema.find(_._1 == sysCol).get._2

  // ---------------------------------------------------------------------
  // Table-level strategies (whole-table snapshot documents)
  // ---------------------------------------------------------------------

  /** Pivot the (view-projected) table into a single snapshot row:
    * `table_data: map<pk, canonical-record-json>` + metadata + checksum
    * (reference: lib/UpdateStrategies.py:420-444). Inner records stay
    * canonical-JSON strings so the snapshot schema is stable regardless of
    * the table's own schema (SURVEY.md §7.4). */
  def tableSnapshot(src: DataFrame, cfg: PipelineConfig): DataFrame = {
    val dataCols = src.columns.toSeq.filterNot(Checksums.SystemColumns).sorted
    val rowJson = to_json(struct(dataCols.map(col): _*))
    val pk = col(cfg.primaryKey).cast("string")
    src.select(pk.as("_pk"), rowJson.as("_json"))
      .agg(
        map_from_entries(sort_array(collect_list(struct(col("_pk"), col("_json"))))).as("table_data"),
        md5(concat_ws("\n", sort_array(collect_list(concat_ws(":", col("_pk"), col("_json")))))).as("table_checksum"))
      .select(
        col("table_data"), col("table_checksum"),
        map_from_arrays(
          array(lit("Name"), lit("ViewName")),
          array(lit(cfg.source.table), lit(cfg.source.viewName.getOrElse("")))).as("metadata"),
        lit(cfg.updateType.value).as("update_type"),
        current_timestamp().as("write_timestamp"))
  }

  /** Build the snapshot with the size guard applied BEFORE the pivot: the
    * row count is a cheap distributed count, so an over-cap table fails
    * fast instead of OOMing the single fold task the cap exists to
    * prevent. The pivot's one output row is then collected and rebuilt as
    * a local frame — the checksum probe and the state write both read the
    * local row, so the whole-table aggregation runs exactly once, with no
    * cache entry left behind (a persisted plan would leak in the
    * CacheManager on every changed run). */
  private def guardedSnapshot(src: DataFrame, cfg: PipelineConfig): DataFrame = {
    val n = src.count()
    require(n <= cfg.maxSnapshotRows,
      s"table has $n rows (snapshot cap ${cfg.maxSnapshotRows}): the one-doc pivot " +
        "is a single-task fold and will not scale — use " +
        "Checksums.orderInsensitiveChecksum for change detection on large tables")
    val snap = tableSnapshot(src, cfg)
    src.sparkSession.createDataFrame(
      java.util.Arrays.asList(snap.collect(): _*), snap.schema)
  }

  /** UPSERT_TABLE_CHECKSUM: one snapshot doc per table, replaced only when
    * the table checksum moves; the doc is keyed by the TABLE name
    * (reference: lib/UpdateStrategies.py:484-522, doc id at :488-490). */
  val upsertTableChecksum: Strategy = (src, state, cfg) => {
    val snap = guardedSnapshot(src, cfg)
      .withColumn("doc_id", lit(cfg.source.table))
      .withColumn("version_id", lit(cfg.versionId))
      .withColumn("latest", lit(true))
    val cur = snap.select("table_checksum").collect().head.getString(0)
    val unchanged = state.columns.contains("table_checksum") && {
      val prev = state.filter(col("doc_id") === lit(cfg.source.table))
        .select("table_checksum").limit(1).collect()
      prev.nonEmpty && prev.head.getString(0) == cur
    }
    if (unchanged) state else snap
  }

  /** VERSIONED_TABLE_CHECKSUM: append a new snapshot version when the
    * checksum moves; demote previous versions
    * (reference: lib/UpdateStrategies.py:451-481). State here is the raw
    * snapshot frame (never schema-aligned with the source — the union
    * below is on the snapshot's own fixed columns). */
  val versionedTableChecksum: Strategy = (src, state, cfg) => {
    val snap = guardedSnapshot(src, cfg)
      .withColumn("doc_id", md5(concat_ws("|", lit(cfg.source.table), lit(cfg.versionId.toString))))
      .withColumn("version_id", lit(cfg.versionId))
      .withColumn("latest", lit(true))
    val cur = snap.select("table_checksum").collect().head.getString(0)
    val hasPrev = state.columns.contains("table_checksum")
    val unchanged = hasPrev && {
      val prev = state.filter(coalesce(col("latest"), lit(false)))
        .orderBy(col("version_id").desc).select("table_checksum").limit(1).collect()
      prev.nonEmpty && prev.head.getString(0) == cur
    }
    if (unchanged) state
    else if (!hasPrev) snap
    else state.withColumn("latest", lit(false))
      .unionByName(snap, allowMissingColumns = true)
  }

  // ---------------------------------------------------------------------

  /** Strategy registry with user extensibility
    * (reference: lib/UpdateStrategies.py:528-551). */
  private var registry: Map[UpdateType, Strategy] = Map(
    UpdateType.FullRefresh -> fullRefresh,
    UpdateType.Replace -> replace,
    UpdateType.Append -> append,
    UpdateType.SoftDelete -> softDelete,
    UpdateType.Versioned -> versioned,
    UpdateType.VersionedChecksum -> versionedChecksum,
    UpdateType.VersionedSet -> versionedSet,
    UpdateType.UpsertChecksum -> upsertChecksum,
    UpdateType.UpsertChecksumWithDelete -> upsertChecksumWithDelete,
    UpdateType.UpsertTableChecksum -> upsertTableChecksum,
    UpdateType.VersionedTableChecksum -> versionedTableChecksum)

  def get(updateType: UpdateType): Strategy =
    registry.getOrElse(updateType,
      throw new IllegalArgumentException(s"no strategy for $updateType"))

  def register(updateType: UpdateType, s: Strategy): Unit =
    registry = registry.updated(updateType, s)
}
