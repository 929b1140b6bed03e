package graft

/** Update strategies supported by the engine.
  *
  * Mirrors the reference's `UpdateType` enum
  * (reference: lib/AirtablePipelineConfigs.py:5-15) plus APPEND, which the
  * reference documents but never implemented (reference: README.md:58-59).
  */
sealed trait UpdateType {
  def value: String
  /** Table-level strategies persist one whole-table snapshot document, not
    * per-record rows — their state must never be schema-aligned with the
    * source (reference: lib/UpdateStrategies.py:420-522). */
  def isTableLevel: Boolean = false
}
object UpdateType {
  case object FullRefresh extends UpdateType { val value = "full_refresh" }
  case object Replace extends UpdateType { val value = "replace" }
  case object Append extends UpdateType { val value = "append" }
  case object SoftDelete extends UpdateType { val value = "soft_delete" }
  case object Versioned extends UpdateType { val value = "versioned" }
  case object VersionedChecksum extends UpdateType { val value = "versioned_checksum" }
  case object VersionedSet extends UpdateType { val value = "versioned_set" }
  case object UpsertChecksum extends UpdateType { val value = "upsert_checksum" }
  case object UpsertChecksumWithDelete extends UpdateType { val value = "upsert_checksum_with_delete" }
  case object UpsertTableChecksum extends UpdateType {
    val value = "upsert_table_checksum"; override val isTableLevel = true }
  case object VersionedTableChecksum extends UpdateType {
    val value = "versioned_table_checksum"; override val isTableLevel = true }

  val all: Seq[UpdateType] = Seq(
    FullRefresh, Replace, Append, SoftDelete, Versioned, VersionedChecksum,
    VersionedSet, UpsertChecksum, UpsertChecksumWithDelete,
    UpsertTableChecksum, VersionedTableChecksum)

  def fromValue(v: String): UpdateType =
    all.find(_.value == v).getOrElse(
      throw new IllegalArgumentException(s"unknown update type: $v"))
}

/** Source-side config (reference: lib/AirtablePipelineConfigs.py:17-26).
  * `path` points at a parquet/JSON dataset instead of an Airtable base;
  * `fieldTypes` is the discovered {field -> source type} map
  * (reference: lib/AirtableDataFetcher.py:39-63). */
final case class SourceConfig(
    path: String,
    table: String,
    viewName: Option[String] = None,
    fieldTypes: Map[String, String] = Map.empty) {
  def validate(): Unit = {
    require(path.nonEmpty, "source path required")
    require(table.nonEmpty, "source table required")
  }
}

/** Target-side config (reference: lib/AirtablePipelineConfigs.py:28-33).
  * The "collection" is a keyed parquet state snapshot. */
final case class StoreConfig(statePath: String, collection: String) {
  def validate(): Unit = {
    require(statePath.nonEmpty, "state path required")
    require(collection.nonEmpty, "collection required")
  }
}

/** Full pipeline config (reference: lib/AirtablePipelineConfigs.py:35-49).
  *
  * `versionId` is captured once per run (epoch seconds in the reference,
  * frozen at module import — lib/UpdateStrategies.py:25). Here it is
  * injected explicitly so runs are deterministic and testable.
  */
final case class PipelineConfig(
    source: SourceConfig,
    store: StoreConfig,
    updateType: UpdateType,
    primaryKey: String,
    versionId: Long,
    /** Row cap for the one-doc table-snapshot pivot (a single-task fold by
      * the reference's semantics); per-pipeline rather than a JVM-global so
      * concurrent pipelines can't race on a shared mutable cap. */
    maxSnapshotRows: Long = 5000000L) {
  def validate(): Unit = {
    source.validate(); store.validate()
    require(primaryKey.nonEmpty, "primary key required")
    require(maxSnapshotRows > 0, "maxSnapshotRows must be positive")
  }
}

/** Fluent builder (reference: lib/AirtableToDatastoreBuilder.py:16-61). */
final class PipelineBuilder {
  private var path: String = ""
  private var table: String = ""
  private var view: Option[String] = None
  private var fieldTypes: Map[String, String] = Map.empty
  private var statePath: String = ""
  private var collection: String = ""
  private var updateType: UpdateType = UpdateType.UpsertChecksum
  private var primaryKey: String = ""
  private var versionId: Long = 0L

  def withSource(p: String, t: String): PipelineBuilder = { path = p; table = t; this }
  def withView(v: String): PipelineBuilder = { view = Some(v); this }
  def withFieldTypes(ft: Map[String, String]): PipelineBuilder = { fieldTypes = ft; this }
  def withStore(p: String, c: String): PipelineBuilder = { statePath = p; collection = c; this }
  def withUpdateType(u: UpdateType): PipelineBuilder = { updateType = u; this }
  def withPrimaryKey(k: String): PipelineBuilder = { primaryKey = k; this }
  def withVersionId(v: Long): PipelineBuilder = { versionId = v; this }

  def build(): PipelineConfig = {
    val cfg = PipelineConfig(
      SourceConfig(path, table, view, fieldTypes),
      StoreConfig(statePath, collection), updateType, primaryKey, versionId)
    cfg.validate()
    cfg
  }
}
