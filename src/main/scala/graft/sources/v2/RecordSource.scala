package graft.sources.v2

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.schema.SchemaMapper

/** DataSource V2 provider for record-shaped sources — the production
  * ingestion path SURVEY.md §2.1/S1 sketches: newline-delimited JSON
  * records `{id, createdTime, fields:{name->value}}` (the reference's
  * wire shape, lib/AirtableDataFetcher.py:27-34), exposed as a typed
  * table with schema driven by a discovered {field->type} map.
  *
  * Usage:
  * {{{
  * spark.read.format("graft-records")
  *   .option("path", "/data/records.jsonl")
  *   .option("fieldTypes", "Name:singleLineText,Score:number")
  *   .load()
  * }}}
  *
  * Column pruning is pushed INTO the source (`SupportsPushDownRequiredColumns`):
  * a `select("Name")` reads and parses only the `Name` field of each
  * record — the engine-native equivalent of the reference passing a view's
  * field list to the REST API (lib/UpdateStrategies.py:365). At 100 TB
  * this is the difference between parsing every field of every record and
  * parsing two.
  *
  * The same table also serves as a STREAMING source
  * (`spark.readStream.format("graft-records")...`): a micro-batch tail of
  * the record directory with file-set offsets ([[RecordMicroBatchStream]]),
  * so the reference's poll-the-whole-table sync loop becomes an
  * incremental, exactly-once ingest — new record files (including those
  * landed by this source's own staged write commit) flow to the stream,
  * replays after restart come from checkpointed offsets.
  */
class RecordSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-records"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = RecordSource.fullSchema(RecordSource.fieldTypes(options))
    // cdc=true reads the table's CHANGE FEED: table columns + signed `m`
    if (Option(options.get("cdc")).exists(_.toBoolean))
      RecordCdc.cdcSchema(base)
    else base
  }

  // a write's schema comes from the DataFrame being written (so callers
  // don't have to restate it as a fieldTypes option); reads still infer
  // from fieldTypes when no schema is supplied
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val props = properties.asScala.toMap
    if (props.get("cdc").exists(_.toBoolean)) {
      // the inferred schema already carries `m` — strip it back to the
      // table columns the diff readers materialize
      val tableSchema = StructType(
        schema.fields.filterNot(_.name == RecordCdc.MultCol))
      new RecordCdcTable(tableSchema, props)
    } else new RecordTable(schema, props)
  }
}

private[v2] object RecordSource {
  /** Malformed-line policies, mirroring Spark's JSON source contract:
    * FAILFAST (default) aborts naming file+line; DROPMALFORMED skips the
    * line; PERMISSIVE keeps it as an all-NULL row whose raw text lands in
    * the `_corrupt_record` column when the schema declares one
    * (`fieldTypes=...,_corrupt_record:singleLineText`). */
  val ParseModes: Set[String] = Set("FAILFAST", "DROPMALFORMED", "PERMISSIVE")
  val CorruptCol = "_corrupt_record"
  /** Hidden metadata columns ([[RecordTable.metadataColumns]]). */
  val FileCol = "_file"
  val PosCol = "_pos"
  /** Rebuild a Hadoop Configuration from captured session properties.
    * Built once per deserialized factory (transient lazy), not per file. */
  def confFrom(props: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Parse the `formerNames` option ("Cur:Old1|Old0,Cur2:OldX"). */
  def parseFormer(opt: Option[String]): Map[String, Seq[String]] =
    opt.map { s =>
      s.split(",").filter(_.nonEmpty).map { e =>
        val Array(cur, olds) = e.split(":", 2)
        cur -> olds.split("\\|").toSeq.filter(_.nonEmpty)
      }.toMap
    }.getOrElse(Map.empty)

  def fieldTypes(options: CaseInsensitiveStringMap): Seq[(String, String)] =
    Option(options.get("fieldTypes")).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map { kv =>
        val parts = kv.split(":", 2)
        if (parts.length != 2 || parts(0).trim.isEmpty || parts(1).trim.isEmpty)
          throw new IllegalArgumentException(
            s"graft-records: malformed fieldTypes entry '$kv' — expected " +
              "'name:type' pairs separated by commas, e.g. " +
              "fieldTypes=Name:string,Qty:long")
        parts(0).trim -> parts(1).trim
      }).getOrElse(Seq.empty)

  /** System columns + typed fields, all nullable (sparse records). */
  def fullSchema(fields: Seq[(String, String)]): StructType =
    StructType(
      StructField("_record_id", StringType) ::
      StructField("_created_time", TimestampType) ::
      fields.toList.map { case (n, t) =>
        StructField(n, SchemaMapper.toDataType(t), nullable = true)
      })
}

private[v2] class RecordTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** Surface the resolved table options (path, fieldTypes, formerNames,
    * layout props) — SHOW TBLPROPERTIES and the `table_changes` TVF
    * read the lake's addressing from here. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** SQL `UPDATE` / `MERGE INTO` (and DELETEs whose condition is
    * outside the metadata surface) run as group-based COPY-ON-WRITE:
    * Spark rewrites the plan into "replacement rows for the read
    * groups", and the commit swaps exactly those files. This
    * implementation reads the WHOLE table as one group — always
    * correct (appends racing the rewrite survive: they are not in the
    * planned set); file-level group pruning is the optimization this
    * deliberately defers. Pushable DELETEs never get here — the
    * metadata-only deletion-vector path wins
    * (OptimizeMetadataOnlyDeleteFromTable + [[canDeleteWhere]]). */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new RecordRowLevelOperation(info.command(), schema,
      props.getOrElse("path", throw new IllegalStateException(
        "row-level operations need a table path")), sessionConfProps,
      // a clustered/bloomed table's layout survives its rewrites
      props.get("clusterBy"),
      props.get("bloomFilterColumns")
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Seq.empty),
      // renamed columns: the rewrite's SCAN must read old rows through
      // their former wire keys, or a copy-on-write would NULL them out
      RecordSource.parseFormer(props.get("formerNames")))
  override def name(): String = s"graft-records(${props.getOrElse("path", "?")})"
  override def schema(): StructType = schema

  /** SQL `DELETE FROM t WHERE …` lands here (via [[RecordCatalog]]):
    * merge-on-read through deletion vectors — one sidecar write per
    * touched file, zero data-file rewrites
    * ([[graft.operators.DeletionVectors.deleteWhere]]). The supported
    * WHERE surface is exactly the pushdown surface; anything else is
    * refused at analysis (Spark reports the table cannot delete that
    * condition) rather than half-applied. */
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall {
      case _: org.apache.spark.sql.sources.AlwaysTrue => true // DELETE FROM t
      case _: org.apache.spark.sql.sources.AlwaysFalse => true
      case f => RecordFilterEval.pushable(f, schema)
    }

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    graft.operators.DeletionVectors.deleteWhere(
      org.apache.spark.sql.SparkSession.active,
      props.getOrElse("path",
        throw new IllegalStateException("deleteWhere needs a table path")),
      schema, filters,
      // renamed columns: the delete scan must see old rows too
      props.get("formerNames").map("formerNames" -> _).toMap)

  // The V2-Predicate entry points are overridden because the DEFAULT
  // conversion (SupportsDelete -> PredicateUtils.toV1) is lossy on
  // boolean trees: `(Score % 2 = 0) OR (Score > 15)` silently became
  // `Score > 15` — for a scan filter a lossy rewrite only loses
  // pruning, but for a DELETE it deletes the WRONG ROW SET. The strict
  // converter below recurses AND/OR/NOT itself and demands every leaf
  // convert; one untranslatable leaf anywhere refuses the whole DELETE.
  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean =
    RecordTable.strictToV1(predicates).exists(canDeleteWhere)

  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit =
    deleteWhere(RecordTable.strictToV1(predicates).getOrElse(
      throw new IllegalArgumentException(
        s"DELETE condition ${predicates.mkString(" AND ")} is outside " +
          "the supported surface (canDeleteWhere should have refused it)")))

  /** Hidden metadata columns (parquet's `_metadata` pattern): `_file` is
    * the data file's full path, `_pos` the row's 0-based physical line
    * ordinal in it. Together they are a row's physical address — what a
    * merge-on-read DELETE records in a deletion-vector sidecar instead
    * of rewriting the file ([[DeletionVector]]). Resolvable by name in
    * any query over this table, absent from `SELECT *`. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = Array(
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = RecordSource.FileCol
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "data file path (hidden)"
    },
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = RecordSource.PosCol
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "0-based line ordinal in _file (hidden)"
    })
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  // capture the session's Hadoop configuration (credentials, fs impls,
  // spark.hadoop.* overrides) as a serializable map for the executors —
  // a bare `new Configuration()` would ignore all session settings
  private def sessionConfProps: Map[String, String] =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => e.getKey -> e.getValue).toMap

  private def resolvedPath(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).orElse(props.get("path"))
      .getOrElse(throw new IllegalArgumentException("path option required"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val mode = Option(options.get("mode")).getOrElse("FAILFAST").toUpperCase
    require(RecordSource.ParseModes.contains(mode),
      s"graft-records mode '$mode' is not one of " +
        RecordSource.ParseModes.mkString(", "))
    val maxFiles = Option(options.get("maxFilesPerTrigger")).map { v =>
      val n = try v.toInt catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"maxFilesPerTrigger '$v' is not an integer") }
      require(n > 0, s"maxFilesPerTrigger $n must be positive")
      n
    }
    // read option, or table property (catalog tables created with
    // TBLPROPERTIES('clusterBy'='K') are clustered in pure SQL)
    val clusterBy = Option(options.get("clusterBy"))
      .orElse(props.get("clusterBy")).map { k =>
      require(schema.fieldNames.contains(k),
        s"clusterBy column '$k' absent from the table schema")
      schema(k).dataType match {
        case StringType | DoubleType | BooleanType | TimestampType | DateType => ()
        case dt => throw new IllegalArgumentException(
          s"clusterBy '$k': $dt is not a zone-trackable scalar type")
      }
      k
    }
    // read option, or table property (the SQL `VERSION AS OF` path —
    // RecordCatalog.loadTable(ident, version) pins it in props)
    val versionAsOf = Option(options.get("versionAsOf"))
      .orElse(props.get("versionAsOf")).map { v =>
      val n = try v.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"versionAsOf '$v' is not an integer") }
      require(n > 0, s"versionAsOf $n must be positive")
      n
    }
    // read option: restrict the scan to these data-file NAMES (after
    // snapshot/live resolution) — the changelog reader's pruning handle:
    // CDC between snapshots reads ONLY changed files, so its cost is
    // ∝ the delta however big the table ([[graft.operators
    // .LakeChangelog]]). Names, not paths: composes with versionAsOf.
    val fileSubset = Option(options.get("fileSubset")).map { s =>
      val names = s.split(",").map(_.trim).filter(_.nonEmpty).toSet
      require(names.nonEmpty, "fileSubset given but names empty")
      names
    }
    // "Cur:Old1|Old0,Cur2:OldX" — a renamed column's former wire keys
    // (RecordCatalog sets this from _table.json after RENAME COLUMN)
    val former = RecordSource.parseFormer(Option(options.get("formerNames"))
      .orElse(props.get("formerNames")))
    // columnar tier: dataFormat=parquet gates aggregate pushdown (the
    // parquet reader prunes row groups instead) — read option or table
    // property, like clusterBy
    val dataFormat = Option(options.get("dataFormat"))
      .orElse(props.get("dataFormat")).getOrElse("jsonl")
    require(dataFormat == "jsonl" || dataFormat == "parquet",
      s"dataFormat '$dataFormat' is not one of jsonl, parquet")
    new RecordScanBuilder(schema, resolvedPath(options), sessionConfProps,
      mode, maxFiles, clusterBy, versionAsOf, fileSubset = fileSubset,
      former = former, dataFormat = dataFormat)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    RecordWriteSupport.validateWriteSchema(info.schema())
    val clusterBy = Option(info.options.get("clusterBy"))
      .orElse(props.get("clusterBy")).map { k =>
      require(info.schema().fieldNames.contains(k),
        s"clusterBy column '$k' absent from the write schema")
      info.schema()(k).dataType match {
        case StringType | DoubleType | BooleanType | TimestampType | DateType => ()
        case dt => throw new IllegalArgumentException(
          s"clusterBy '$k': $dt is not a zone-trackable scalar type")
      }
      k
    }
    val bloomCols = Option(info.options.get("bloomFilterColumns"))
      .orElse(props.get("bloomFilterColumns"))
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)
    bloomCols.foreach { c =>
      require(info.schema().fieldNames.contains(c),
        s"bloomFilterColumns column '$c' absent from the write schema")
      require(info.schema()(c).dataType == StringType,
        s"bloomFilterColumns '$c': point-lookup blooms index STRING " +
          s"columns (ids); ${info.schema()(c).dataType} ranges belong " +
          "to zone maps")
    }
    val bloomBits = Option(info.options.get("bloomBits")).map(_.toInt)
      .getOrElse(BloomSidecar.DefaultBits)
    // streaming-sink option: commit a snapshot manifest per epoch, so
    // time travel can address "the table as of epoch N" and changelog
    // consumers (LakeChangelog) can CDC off the stream's commits
    val snapshotPerEpoch = Option(info.options.get("snapshotPerEpoch"))
      .exists(_.toBoolean)
    val dataFormat = Option(info.options.get("dataFormat"))
      .orElse(props.get("dataFormat")).getOrElse("jsonl")
    require(dataFormat == "jsonl" || dataFormat == "parquet",
      s"dataFormat '$dataFormat' is not one of jsonl, parquet")
    if (dataFormat == "parquet")
      ParquetRecords.validateUserNames(info.schema())
    val rowGroupBytes = Option(info.options.get("parquetRowGroupBytes"))
      .map(_.toLong)
      .getOrElse(org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong)
    new RecordWriteBuilder(info.schema(), info.queryId(),
      resolvedPath(info.options()), sessionConfProps, clusterBy,
      bloomCols, bloomBits, snapshotPerEpoch, dataFormat, rowGroupBytes)
  }
}

private[v2] object RecordTable {
  import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Literal => V2Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Not => V2Not, Or => V2Or, Predicate}
  import org.apache.spark.sql.sources._

  /** STRICT V2-Predicate -> V1-Filter conversion: boolean structure is
    * recursed (never dropped), leaves convert by hand with both operand
    * orders handled, and ANY failure anywhere yields None for the whole
    * set. Exists because Spark's default lossy conversion is sound for
    * pruning but not for mutations (see [[RecordTable.deleteWhere]] —
    * it turned `(a % 2 = 0) OR (b > 15)` into `b > 15`). */
  def strictToV1(predicates: Array[Predicate]): Option[Array[Filter]] = {
    def field(e: V2Expr): Option[String] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    def litVal(e: V2Expr): Option[Any] = e match {
      case l: V2Literal[_] => Some(l.dataType() match {
        case StringType => if (l.value() == null) null else l.value().toString
        case TimestampType => l.value() match {
          case micros: java.lang.Long => java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros.longValue, 1000000L),
            Math.floorMod(micros.longValue, 1000000L) * 1000L)
          case other => other
        }
        case DateType => l.value() match {
          case days: java.lang.Integer =>
            java.time.LocalDate.ofEpochDay(days.longValue)
          case other => other
        }
        case _ => l.value()
      })
      case _ => None
    }
    def cmp(name: String, c: Array[V2Expr]): Option[Filter] = {
      if (c.length != 2) return None
      def build(attr: String, v: Any, flipped: Boolean): Option[Filter] =
        if (v == null) None else (name, flipped) match {
          case ("=", _) => Some(EqualTo(attr, v))
          case ("<=>", _) => Some(EqualNullSafe(attr, v))
          case (">", false) => Some(GreaterThan(attr, v))
          case (">", true) => Some(LessThan(attr, v))
          case (">=", false) => Some(GreaterThanOrEqual(attr, v))
          case (">=", true) => Some(LessThanOrEqual(attr, v))
          case ("<", false) => Some(LessThan(attr, v))
          case ("<", true) => Some(GreaterThan(attr, v))
          case ("<=", false) => Some(LessThanOrEqual(attr, v))
          case ("<=", true) => Some(GreaterThanOrEqual(attr, v))
          case _ => None
        }
      (field(c(0)), litVal(c(1)), field(c(1)), litVal(c(0))) match {
        case (Some(a), Some(v), _, _) => build(a, v, flipped = false)
        case (_, _, Some(a), Some(v)) => build(a, v, flipped = true)
        case _ => None
      }
    }
    def one(p: Predicate): Option[Filter] = p match {
      case a: V2And => for (l <- one(a.left()); r <- one(a.right())) yield And(l, r)
      case o: V2Or => for (l <- one(o.left()); r <- one(o.right())) yield Or(l, r)
      case n: V2Not => one(n.child()).map(Not)
      case leaf => leaf.name() match {
        case "ALWAYS_TRUE" => Some(AlwaysTrue) // unconditional DELETE FROM t
        case "ALWAYS_FALSE" => Some(AlwaysFalse)
        case "=" | "<=>" | ">" | ">=" | "<" | "<=" =>
          cmp(leaf.name(), leaf.children())
        case "IN" =>
          val c = leaf.children()
          for {
            a <- if (c.nonEmpty) field(c(0)) else None
            vs <- Some(c.drop(1).map(litVal))
              .filter(xs => xs.nonEmpty && xs.forall(x =>
                x.isDefined && x.get != null))
          } yield In(a, vs.map(_.get))
        case "IS_NULL" if leaf.children().length == 1 =>
          field(leaf.children()(0)).map(IsNull)
        case "IS_NOT_NULL" if leaf.children().length == 1 =>
          field(leaf.children()(0)).map(IsNotNull)
        case _ => None
      }
    }
    val fs = predicates.map(one)
    if (fs.forall(_.isDefined)) Some(fs.map(_.get)) else None
  }
}

/** Per-partition top-N pushed into the scan: sort key, direction, and the
  * per-partition row cap. Always PARTIAL — Spark re-applies the global
  * sort+limit over the (bounded) survivors, so the connector only has to
  * shrink each partition's output, never totally order it. */
private[v2] case class PushedTopN(field: String, descending: Boolean,
    nullsFirst: Boolean, limit: Int)

/** One pushed aggregate column: op in {count_star, count, min, max};
  * `field` is empty for count_star. */
private[v2] case class PushedAggCol(op: String, field: String)
private[v2] case class PushedAggSpec(groupCols: Seq[String], aggs: Seq[PushedAggCol])

private[v2] object RecordScanBuilder {
  /** Hard ceiling on distinct group keys a pushed aggregation may
    * accumulate per partition: the reader's hash table cannot spill, so
    * past this it fails loudly (see `buildAgg`) instead of OOMing. At
    * ~100 bytes/entry the bound caps the table near 10 MB. */
  val MaxPushedGroups: Int = 100000
}

private[v2] class RecordScanBuilder(fullSchema: StructType, path: String,
    confProps: Map[String, String], mode: String = "FAILFAST",
    maxFilesPerTrigger: Option[Int] = None,
    clusterBy: Option[String] = None,
    versionAsOf: Option[Long] = None,
    rowLevelFiles: Option[Seq[String]] = None,
    fileSubset: Option[Set[String]] = None,
    former: Map[String, Seq[String]] = Map.empty,
    dataFormat: String = "jsonl")
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownTopN
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  import org.apache.spark.sql.sources._

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var topN: Option[PushedTopN] = None
  private var limit: Option[Int] = None
  private var agg: Option[PushedAggSpec] = None
  private var aggSchema: Option[StructType] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the source's field order for the pruned subset; hidden
    // metadata columns (_file/_pos) are not in fullSchema and keep their
    // Spark-assigned position AFTER the data columns
    required = StructType(
      fullSchema.fields.filter(f =>
        requiredSchema.fieldNames.contains(f.name)) ++
      requiredSchema.fields.filter(f =>
        f.name == RecordSource.FileCol || f.name == RecordSource.PosCol))

  /** The reference's target-side predicate surface — eq/neq/gt/ge/lt/le on
    * typed fields (lib/FirestoreWrapper.py:86-100) — plus null probes and
    * boolean combinations. A filter is accepted only when every leaf
    * references a known top-level column of a type with an
    * exactly-reproducible total order (array/struct keys would compare as
    * JSON text, not Spark's element order) with an exactly-evaluable
    * comparison; everything else stays with Spark. Shared with the
    * runtime-filter gate ([[RecordScan.filter]]). */
  private def supported(f: Filter): Boolean =
    RecordFilterEval.pushable(f, fullSchema)
  private def fieldOk(attr: String): Boolean =
    !attr.contains(".") && fullSchema.fieldNames.contains(attr) &&
      (fullSchema(attr).dataType match {
        case StringType | DoubleType | BooleanType | TimestampType | DateType => true
        case _ => false
      })

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // a ROW-LEVEL-OPERATION scan must deliver every row of its groups —
    // a pushed row filter would VANISH the non-matching rows from the
    // copy-on-write replacement (data loss), so nothing is accepted
    if (rowLevelFiles.isDefined) return filters
    val (ok, residual) = filters.partition(supported)
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean =
    if (rowLevelFiles.isDefined) false else { limit = Some(l); true }
  // partial: other partitions may still produce rows, Spark re-limits
  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NullOrdering, SortDirection}
    if (rowLevelFiles.isDefined) return false
    if (orders.length != 1 || l <= 0 || l > 1000000) return false
    val o = orders.head
    o.expression() match {
      case ref: org.apache.spark.sql.connector.expressions.NamedReference
          if ref.fieldNames().length == 1 && fieldOk(ref.fieldNames()(0)) =>
        topN = Some(PushedTopN(ref.fieldNames()(0),
          o.direction() == SortDirection.DESCENDING,
          o.nullOrdering() == NullOrdering.NULLS_FIRST, l))
        true
      case _ => false
    }
  }

  /** MIN/MAX/COUNT/COUNT(*) (non-distinct) over atomic fields, grouped by
    * atomic fields — the same function surface Spark's own parquet
    * aggregate pushdown accepts, for the same reason: those partials
    * merge exactly; SUM over doubles would make results depend on
    * partition order. Partial pushdown only (`supportCompletePushDown`
    * stays false): each partition emits pre-aggregated rows and Spark
    * runs the final merge, so multi-file tables stay correct. */
  // Both tiers fold pushed aggregates in-reader (JSONL:
  // RecordPartitionReader.buildAgg; parquet: ParquetAggPartitionReader).
  // For JSONL any accepted shape wins (folding beats parsing every
  // field of every record). For PARQUET the pushdown is accepted ONLY
  // when the footer-stats fast path can answer it — global (no group
  // columns), no pushed filters, no deletion vectors, stats-safe ops —
  // because for every other shape the VECTORIZED columnar scan +
  // Spark's codegen aggregate beats a row-materializing in-reader fold
  // (the same reasoning behind Spark's own parquet aggregate pushdown
  // accepting only global MIN/MAX/COUNT). The reader still carries a
  // decode fallback for races (a DV landing between planning and
  // execution) and stats-less files.
  private lazy val parquetPresent: Boolean = dataFormat == "parquet" ||
    RecordScan.listDataFiles(path, RecordSource.confFrom(confProps))
      .exists(_.endsWith(ParquetRecords.Extension))

  /** Any deletion-vector state visible to this scan (live sidecars, or
    * the pinned manifest's inline DVs for a versionAsOf read) — checked
    * at planning; the reader re-checks at execution. */
  private def anyDeletionVectors: Boolean = {
    val conf = RecordSource.confFrom(confProps)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    versionAsOf match {
      case Some(v) => Snapshots.load(fs, path, v).files.exists(_._2.isDefined)
      case None =>
        val dvDir = new org.apache.hadoop.fs.Path(dir, DeletionVector.Dir)
        fs.exists(dvDir) && fs.listStatus(dvDir).exists(_.isFile)
    }
  }

  private def parquetAggOk(spec: PushedAggSpec): Boolean =
    spec.groupCols.isEmpty && pushed.isEmpty &&
      spec.aggs.forall {
        case PushedAggCol("count_star", _) | PushedAggCol("count", _) => true
        // sums are never stats-answerable; on the parquet tier Spark's
        // codegen agg over the vectorized scan beats a row-materializing
        // in-reader fold, so refuse the push rather than decode-fold
        case PushedAggCol("sum", _) => false
        case PushedAggCol(_, f) => fullSchema(f).dataType match {
          case DoubleType | BooleanType | TimestampType | DateType => true
          case _ => false // string extrema: truncatable binary stats
        }
      } && !anyDeletionVectors

  override def pushAggregation(aggregation:
      org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (rowLevelFiles.isDefined) return false
    if (topN.nonEmpty || limit.nonEmpty) return false
    def name(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames().length == 1 &&
          fieldOk(r.fieldNames()(0)) => Some(r.fieldNames()(0))
        case _ => None
      }
    val groups = aggregation.groupByExpressions.toSeq.map(name)
    if (groups.exists(_.isEmpty)) return false
    val cols = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(PushedAggCol("count_star", ""))
      case c: Count if !c.isDistinct => name(c.column).map(PushedAggCol("count", _))
      case m: Min => name(m.column).map(PushedAggCol("min", _))
      case m: Max => name(m.column).map(PushedAggCol("max", _))
      // SUM partials fold in-reader at no structural cost (one double
      // slot per buffer); doubles only — the engine's numeric wire type.
      // AVG rides for free: Spark rewrites it to sum/count before
      // pushing partial aggregates (V2ScanRelationPushDown).
      case s: Sum if !s.isDistinct =>
        name(s.column).filter(f => fullSchema(f).dataType == DoubleType)
          .map(PushedAggCol("sum", _))
      case _ => None
    }
    if (cols.exists(_.isEmpty)) return false
    val spec = PushedAggSpec(groups.map(_.get), cols.map(_.get))
    // a clusterBy table grouped ON its cluster key aggregates
    // shuffle-free off the reported KeyGroupedPartitioning — pushing
    // partials would REINTRODUCE the merge exchange Spark otherwise
    // elides, strictly worse than the storage-partitioned plan
    if (clusterBy.exists(spec.groupCols.contains)) return false
    if (parquetPresent && !parquetAggOk(spec)) return false
    // scan output convention (V2ScanRelationPushDown zips positionally):
    // group columns first, then one column per aggregate — counts are
    // non-null longs, min/max carry the field's type
    val fields = spec.groupCols.map(fullSchema(_)) ++ spec.aggs.map {
      case PushedAggCol("count_star", _) => StructField("count(*)", LongType, nullable = false)
      case PushedAggCol("count", f) => StructField(s"count($f)", LongType, nullable = false)
      case PushedAggCol(op, f) => StructField(s"$op($f)", fullSchema(f).dataType)
    }
    agg = Some(spec)
    aggSchema = Some(StructType(fields))
    true
  }

  override def build(): Scan =
    new RecordScan(aggSchema.getOrElse(required), fullSchema, path, confProps,
      pushed, topN, limit.filter(_ => topN.isEmpty), agg, mode,
      maxFilesPerTrigger, clusterBy, versionAsOf, rowLevelFiles, fileSubset,
      former)
}

private[v2] class RecordScan(readSchema: StructType, fullSchema: StructType,
    path: String, confProps: Map[String, String],
    filters: Array[org.apache.spark.sql.sources.Filter],
    topN: Option[PushedTopN], limit: Option[Int],
    agg: Option[PushedAggSpec] = None, mode: String = "FAILFAST",
    maxFilesPerTrigger: Option[Int] = None,
    clusterBy: Option[String] = None,
    versionAsOf: Option[Long] = None,
    rowLevelFiles: Option[Seq[String]] = None,
    fileSubset: Option[Set[String]] = None,
    former: Map[String, Seq[String]] = Map.empty)
    extends Scan with Batch
    with SupportsRuntimeFiltering with SupportsReportStatistics
    with SupportsReportPartitioning {

  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    RecordSource.confFrom(confProps)

  // --- time travel (versionAsOf): the snapshot manifest replaces BOTH
  // the directory listing (appends after the snapshot are invisible)
  // and each file's live deletion vector (deletes after it are
  // reversed by the inlined DV state). None = live table.
  private lazy val snapshot: Option[Snapshots.Manifest] = versionAsOf.map { v =>
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hadoopConf)
    Snapshots.load(fs, path, v)
  }

  /** The scan's candidate data files (full paths): the row-level
    * operation's frozen group set, a snapshot's frozen set, or the live
    * listing. CACHED for the scan's lifetime: columnar eligibility,
    * partition planning, statistics, and cluster grouping must all see
    * ONE consistent file set (a non-parquet file committed between two
    * live listings would be planned into a scan that already promised
    * columnar reads), and one scan should pay the commit-log settle
    * loop once, not once per consumer. A Scan is created per query
    * plan, so the freeze is exactly snapshot-at-plan semantics. */
  private lazy val candidateFiles: Array[String] = {
    val base = rowLevelFiles match {
      case Some(fs) => fs.toArray
      case None => snapshot match {
        case Some(m) => m.files.map { case (n, _) =>
          new org.apache.hadoop.fs.Path(path, n).toString }.toArray
        // LIVE read: reconcile against the commit log so a compaction
        // flip mid-listing can't double-read or vanish files
        case None => RecordScan.consistentDataFiles(path, hadoopConf)._1
      }
    }
    fileSubset match {
      case Some(keep) => base.filter(f =>
        keep.contains(new org.apache.hadoop.fs.Path(f).getName))
      case None => base
    }
  }

  /** For a snapshot read: full path -> the DV json AT COMMIT TIME (None
    * = nothing was deleted then, even if a live DV exists now). */
  private def dvOverrides: Option[Map[String, Option[String]]] =
    snapshot.map(_.files.map { case (n, dv) =>
      new org.apache.hadoop.fs.Path(path, n).toString -> dv
    }.toMap)
  override def readSchema(): StructType = readSchema
  override def description(): String =
    s"RecordScan(path=$path, ReadSchema=${readSchema.simpleString}, " +
      s"PushedFilters=[${filters.mkString(", ")}]" +
      topN.map(t => s", PushedTopN=$t").getOrElse("") +
      limit.map(l => s", PushedLimit=$l").getOrElse("") +
      agg.map(a => s", PushedAggregation=[groupBy=${a.groupCols.mkString(",")}; " +
        a.aggs.map(c => s"${c.op}(${c.field})").mkString(",") + "]").getOrElse("") + ")"
  override def toBatch: Batch = this

  // --- DPP-style runtime filtering (SupportsRuntimeFiltering) ------------
  // Spark hands the scan join-derived predicates (typically In(key, ...)
  // from a filtered build side) at EXECUTION time; they compose with the
  // statically pushed filters for both zone-map file pruning and row-level
  // evaluation. Dropping data here is always sound: Spark only routes a
  // runtime filter at a scan when the filter is a valid predicate on the
  // scan's output, and the join re-evaluates its own condition regardless.
  private var runtimeFilters: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty

  /** Attributes runtime filters may reference: the scan's output columns
    * that carry an exactly-evaluable order (the pushdown gate's types) —
    * under aggregate pushdown the output carries synthetic `count(*)`-
    * style columns, which no join key can be. */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (rowLevelFiles.isDefined)
      // a row-level scan accepts runtime filters ONLY on the `_file`
      // metadata column: that is Spark's group-filter subquery
      // (RowLevelOperationRuntimeGroupFiltering evaluates the DML
      // condition once to find the files that CAN match, then prunes
      // this scan to them) — file-granular, so groups still arrive
      // WHOLE; a data-column filter would drop rows from the
      // replacement and is refused
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(RecordSource.FileCol))
    else readSchema.fields
      .filter(f => fullSchema.fieldNames.contains(f.name) && (f.dataType match {
        case StringType | DoubleType | BooleanType | TimestampType | DateType => true
        case _ => false
      }))
      .map(f => org.apache.spark.sql.connector.expressions.Expressions.column(f.name))

  // the group-filter file set a row-level scan received at runtime
  // (full paths); None until/unless the group-filter subquery fires
  @volatile private var groupFileFilter: Option[Set[String]] = None
  // what the row-level scan LAST planned — the exact set the
  // copy-on-write commit must replace
  private val lastPlanned =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](null)
  private[v2] def plannedGroups: Option[Seq[String]] = Option(lastPlanned.get)

  override def filter(fs: Array[org.apache.spark.sql.sources.Filter]): Unit =
    if (rowLevelFiles.isDefined) {
      // only In/EqualTo on _file can arrive (filterAttributes); collect
      // the admitted file set — file-granular pruning only
      import org.apache.spark.sql.sources.{EqualTo, In}
      val sets = fs.collect {
        case In(a, vs) if a == RecordSource.FileCol =>
          vs.collect { case s: String => s }.toSet
        case EqualTo(a, v: String) if a == RecordSource.FileCol => Set(v)
      }
      if (sets.nonEmpty) groupFileFilter = Some(sets.reduce(_ intersect _))
    } else {
      // keep only filters the row evaluator understands exactly (unknown
      // shapes return None from RecordFilterEval.eval, which would
      // WRONGLY drop rows as three-valued unknown)
      runtimeFilters = fs.filter(RecordFilterEval.pushable(_, fullSchema))
    }

  private def effectiveFilters: Array[org.apache.spark.sql.sources.Filter] =
    filters ++ runtimeFilters

  override def planInputPartitions(): Array[InputPartition] = clusterGroups match {
    case Some(groups) =>
      // one InputPartition per key (all of the key's files together):
      // the shape KeyGroupedPartitioning promises. Runtime filters skip
      // FILE pruning here (the key set was reported at planning and
      // must not shrink under it) but still drop rows in the reader.
      groups.map { case (k, files) =>
        RecordKeyedPartition(files, keyRow(k)): InputPartition
      }.toArray
    case None if rowLevelFiles.isDefined =>
      // a row-level operation reads its groups WHOLE (no row filters);
      // the only pruning is the runtime group filter — exact file
      // membership from Spark's own condition subquery, so a pruned
      // file provably holds no matching rows and stays untouched. The
      // planned set is recorded: the copy-on-write commit replaces
      // EXACTLY these files.
      val files = groupFileFilter match {
        case Some(keep) => candidateFiles.filter(keep.contains)
        case None => candidateFiles
      }
      lastPlanned.set(files.toSeq)
      files.map(RecordInputPartition(_): InputPartition)
    case None =>
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hadoopConf)
      // zone maps answer ranges; bloom sidecars answer POINT lookups on
      // high-cardinality columns (an id equality prunes ~99% of files a
      // min/max span cannot). Both advisory, both composed with runtime
      // (DPP) filters — an In(...) arriving from a join build side
      // prunes files here before any byte is read.
      val pointPreds = effectiveFilters
      ZoneMap.pruneFiles(candidateFiles, effectiveFilters, fs, former)
        .filter { case (f, _) =>
          BloomSidecar.load(fs, f).forall(bls =>
            pointPreds.forall(BloomSidecar.mayMatch(_, bls)))
        }
        .map { case (f, _) => RecordInputPartition(f): InputPartition }
  }

  // --- storage-partitioned scan (SupportsReportPartitioning) -------------
  // With the `clusterBy` read option, every kept file must be KEY-PURE in
  // that column (zone min == max, no nulls — the shape the clusterBy
  // WRITE option produces), and the scan groups files by key into one
  // InputPartition each, reporting KeyGroupedPartitioning over the
  // column. Two tables clustered on their join key then join with ZERO
  // exchanges (Spark's storage-partitioned join, v2 bucketing) — at
  // 100 TB the difference between shuffling both sides and streaming
  // co-located partitions. Purity is checked from metadata only (zone
  // sidecars), never by scanning data; an impure file fails LOUDLY —
  // a declared clustering that silently fell back would reshuffle the
  // whole join without anyone noticing.
  private lazy val clusterGroups: Option[Seq[(Any, Seq[String])]] =
    clusterBy.flatMap { k =>
      // a query that pruned the key away cannot be key-grouped — run
      // unclustered (sound: no partitioning claim is made); purity
      // violations below stay LOUD (a silent fallback there would
      // reshuffle every join without anyone noticing)
      if (!readSchema().fieldNames.contains(k)) None
      else Some {
      val fsys = new org.apache.hadoop.fs.Path(path).getFileSystem(hadoopConf)
      // static filters only: the key set is fixed at planning time
      val kept = ZoneMap.pruneFiles(candidateFiles, filters, fsys, former)
      kept.toSeq.map { case (f, zOpt) =>
        val z = zOpt.getOrElse(throw new IllegalStateException(
          s"clusterBy '$k': $f has no zone sidecar — not a clustered " +
            "table (write it with the clusterBy option)"))
        val st = z.stats(k)
        if (st.nulls != 0L || st.min == null ||
            RecordFilterEval.nullAwareCompare(st.min, st.max,
              descending = false, nullsFirst = false) != 0)
          throw new IllegalStateException(
            s"clusterBy '$k': $f is not key-pure (zone " +
              s"min=${st.min}, max=${st.max}, nulls=${st.nulls}) — " +
              "rewrite the table with the clusterBy write option")
        (st.min, f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toSeq
        .sortWith { case ((a, _), (b, _)) =>
          RecordFilterEval.nullAwareCompare(a, b,
            descending = false, nullsFirst = false) < 0
        }
      }
    }

  /** The key's single-column InternalRow (internal representations). */
  private def keyRow(v: Any): InternalRow = InternalRow.fromSeq(Seq(v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }))

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    clusterGroups match {
      case Some(groups) if groups.nonEmpty =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .identity(clusterBy.get)),
          groups.length)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  /** Planning-time stats from the zone-map sidecars: row counts are the
    * sum over files surviving the STATIC filters (runtime filters arrive
    * after planning); bytes are the surviving files' on-disk lengths. A
    * file without a sidecar contributes its bytes but makes the row count
    * unknown — Spark treats absent numRows conservatively. These numbers
    * feed join sizing (broadcast decisions) and DPP's benefit heuristic. */
  override def estimateStatistics(): Statistics = {
    val fsys = new org.apache.hadoop.fs.Path(path).getFileSystem(hadoopConf)
    val kept = ZoneMap.pruneFiles(candidateFiles, filters, fsys, former)
    val bytes = kept.map { case (f, _) =>
      fsys.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
    }.sum
    // merge-on-read: deletion-vector'd rows never reach the scan, so the
    // planning row count subtracts each kept file's rows_deleted —
    // broadcast decisions must see the post-delete cardinality. A
    // snapshot read subtracts the MANIFEST's DV state, not the live one.
    val dvOf: String => Long = dvOverrides match {
      case Some(m) => f => m.getOrElse(f, None)
        .map(DeletionVector.parse(_).count).getOrElse(0L)
      case None => f => DeletionVector.load(fsys, f).map(_.count).getOrElse(0L)
    }
    val rows: java.util.OptionalLong =
      if (kept.forall(_._2.isDefined))
        java.util.OptionalLong.of(kept.map { case (f, z) =>
          z.get.rows - dvOf(f)
        }.sum)
      else java.util.OptionalLong.empty()
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = rows
    }
  }

  /** Vectorized (ColumnarBatch) reads fit when the whole scan is
    * parquet files read one-per-partition with a flat atomic
    * projection: every candidate file `.parquet` (Spark refuses mixed
    * row/columnar partitions in one scan), no keyed grouping, no
    * pushed agg/topN (they fold rows inside the reader), no row-level
    * rewrite (those feed whole-group copy-on-write), and every
    * projected/filtered column a scalar the batch decoder carries.
    * Everything else takes the row-materializing reader. */
  private def columnarEligible: Boolean = {
    if (!RecordSourceMetrics.columnarEnabled) return false
    def flatOk(name: String, dt: org.apache.spark.sql.types.DataType): Boolean =
      name == RecordSource.FileCol || name == RecordSource.PosCol ||
        name == RecordSource.CorruptCol || (dt match {
          case StringType | DoubleType | BooleanType | TimestampType |
               DateType => true
          case ArrayType(StringType | DoubleType, _) => true // list decode
          case _ => false
        })
    agg.isEmpty && topN.isEmpty && clusterBy.isEmpty &&
      rowLevelFiles.isEmpty &&
      readSchema.fields.forall(f => flatOk(f.name, f.dataType)) && {
        val files = candidateFiles
        files.nonEmpty && files.forall(_.endsWith(ParquetRecords.Extension))
      }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RecordReaderFactory(readSchema, fullSchema, confProps,
      if (rowLevelFiles.isDefined) Array.empty else effectiveFilters,
      topN, limit, agg, mode, dvOverrides, former,
      columnarEligible = columnarEligible)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(versionAsOf.isEmpty,
      "versionAsOf is a batch-read option — a stream tails the LIVE " +
        "table (a frozen snapshot has no new files to deliver)")
    new RecordMicroBatchStream(readSchema, fullSchema, path, confProps,
      filters, mode, maxFilesPerTrigger, former)
  }
}

private[v2] object RecordScan {
  /** Data files under `path` (or `path` itself when it is a file), with
    * `_`/`.`-prefixed names skipped — the staging/marker convention the
    * write path relies on (`_staging-<queryId>` is a DIRECTORY, but a
    * half-moved marker file must never read as data either). */
  def listDataFiles(path: String,
      conf: org.apache.hadoop.conf.Configuration): Array[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(_.isFile)
        .filterNot(st => st.getPath.getName.startsWith("_") ||
          st.getPath.getName.startsWith("."))
        .map(_.getPath.toString)
    else Array(path)
  }

  /** A LIVE listing that is CONSISTENT with the commit log — the read
    * side of the optimistic protocol. A raw listing taken mid-flip of a
    * concurrent compaction/materialize can see BOTH the merged file and
    * its inputs (silent double-read) or a file the flip then deletes
    * (FileNotFound at open). Flips happen only inside a
    * committed-but-unapplied window, so: settle every committed entry
    * (wait for a live owner's applied marker; replay a crashed one),
    * list, and accept the listing only if the log head did not move and
    * nothing new is in flight — otherwise a flip may have straddled the
    * listing, so re-list. Tables without a commit log (plain record
    * dirs, single files) fall back to the raw listing. */
  def consistentDataFiles(path: String,
      conf: org.apache.hadoop.conf.Configuration): (Array[String], Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.getFileStatus(p).isDirectory ||
        !fs.exists(new org.apache.hadoop.fs.Path(p, OptimisticCommit.Dir)))
      return (listDataFiles(path, conf), 0L)
    val deadline = System.currentTimeMillis + 120000L
    while (true) {
      OptimisticCommit.awaitApplied(fs, p,
        OptimisticCommit.standardRecover(path, conf))
      val h1 = OptimisticCommit.head(fs, p)
      val files = listDataFiles(path, conf)
      val (vs2, applied2) = OptimisticCommit.logState(fs, p)
      if (vs2.lastOption.getOrElse(0L) == h1 && vs2.forall(applied2.contains))
        return (files, h1)
      if (System.currentTimeMillis > deadline)
        throw new IllegalStateException(
          s"listing of $path never stabilized against the commit log — " +
            "writers are committing faster than one listing completes")
      Thread.sleep(5)
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Streaming offset for [[RecordMicroBatchStream]]: the SET of data files
  * already delivered, as a sorted JSON array. The record directory is
  * append-only by construction (the write path renames whole files in at
  * job commit and never rewrites them), so set difference of two offsets
  * is exactly the undelivered files. Plain and auditable; a deployment
  * whose directory grows to millions of files would graduate to a
  * compacted seen-file log (what Spark's own FileStreamSource keeps) with
  * the same semantics. */
private[graft] case class RecordStreamOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    files.sorted.foreach(arr.add)
    mapper.writeValueAsString(arr)
  }
}

private[graft] object RecordStreamOffset {
  def fromJson(json: String): RecordStreamOffset = {
    val node = new ObjectMapper().readTree(json)
    RecordStreamOffset(node.elements().asScala.map(_.asText()).toSeq.sorted)
  }
}

/** Micro-batch tail of a record directory — the continuous-ingest face of
  * the same source (§2.9 meets §2.1): each trigger delivers the files
  * that appeared since the last committed offset, one input partition per
  * file, through the SAME reader implementation the batch path uses.
  * HONESTY NOTE on pushdown: as of Spark 4.1, the engine does NOT run
  * V2ScanRelationPushDown for streaming relations — the micro-batch scan
  * is built with the full schema and no pushed filters (a streaming
  * `.where(...)` is applied by Spark ABOVE the scan; ZoneMapSpec pins
  * this). The filter/zone plumbing below therefore activates only for
  * the batch path today; it is kept wired so the streaming tail prunes
  * identically the moment Spark (or an explicit filter API) hands
  * filters to streaming scans. Exactly-once delivery comes
  * from the offset contract: Spark checkpoints the end offset per batch
  * and replays `planInputPartitions(start, end)` deterministically on
  * recovery, and the write path's staged commit guarantees a file is
  * either fully present or absent — no torn reads to re-deliver. */
private[v2] class RecordMicroBatchStream(readSchema: StructType,
    fullSchema: StructType, path: String, confProps: Map[String, String],
    filters: Array[org.apache.spark.sql.sources.Filter], mode: String,
    maxFilesPerTrigger: Option[Int] = None,
    former: Map[String, Seq[String]] = Map.empty)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def hadoopConf = RecordSource.confFrom(confProps)

  // Trigger.AvailableNow contract: freeze the file set at preparation,
  // then drain toward that snapshot in rate-limited batches — files
  // landing mid-drain wait for the next run (Spark terminates the query
  // once the committed offset reaches reportLatestOffset)
  @volatile private var availableNowSnapshot: Option[Seq[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowSnapshot =
      Some(RecordScan.listDataFiles(path, hadoopConf).toSeq.sorted)

  private def currentFiles: Seq[String] = availableNowSnapshot.getOrElse(
    RecordScan.listDataFiles(path, hadoopConf).toSeq.sorted)

  override def initialOffset(): Offset = RecordStreamOffset(Seq.empty)

  override def latestOffset(): Offset =
    RecordStreamOffset(RecordScan.listDataFiles(path, hadoopConf).toSeq.sorted)

  // --- admission control (maxFilesPerTrigger): production backpressure —
  // a burst of landed files drains as bounded micro-batches instead of
  // one giant catch-up batch (the same contract Spark's own file source
  // exposes). The engine drives the 2-arg latestOffset when this
  // interface is present; reportLatestOffset tells AvailableNow where
  // "caught up" is so bounded draining still terminates.
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[RecordStreamOffset].files.toSet
    val fresh = currentFiles.filterNot(seen)
    val cap = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        m.maxFiles()
      case _ => maxFilesPerTrigger.getOrElse(Int.MaxValue)
    }
    val take = if (fresh.length > cap) fresh.take(cap) else fresh
    RecordStreamOffset((seen ++ take).toSeq.sorted)
  }

  override def reportLatestOffset(): Offset = RecordStreamOffset(currentFiles)

  override def deserializeOffset(json: String): Offset =
    RecordStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[RecordStreamOffset].files.toSet
    val fresh = end.asInstanceOf[RecordStreamOffset].files
      .filterNot(seen).sorted.toArray
    // zone-map pruning applies per micro-batch too: a pruned file is
    // still marked delivered by the offset advance, it just never opens
    val fsys = new org.apache.hadoop.fs.Path(path).getFileSystem(hadoopConf)
    ZoneMap.pruneFiles(fresh, filters, fsys, former)
      .map { case (f, _) => RecordInputPartition(f): InputPartition }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RecordReaderFactory(readSchema, fullSchema, confProps, filters,
      topN = None, limit = None, agg = None, mode, former = former)

  override def commit(end: Offset): Unit = () // nothing to release per batch
  override def stop(): Unit = ()
}

private[v2] case class RecordInputPartition(file: String) extends InputPartition

/** One cluster key's files, carrying the key value for Spark's
  * storage-partitioned join machinery ([[RecordScan.outputPartitioning]]).
  * `key` is a single-column InternalRow in internal representation. */
private[v2] case class RecordKeyedPartition(files: Seq[String],
    key: InternalRow) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Observability hook for zone-map pruning: counts data files actually
  * opened by readers in this JVM (local mode / tests — a cluster would
  * surface the same signal as a custom task metric). */
private[graft] object RecordSourceMetrics {
  val filesOpened = new java.util.concurrent.atomic.AtomicLong(0)
  // parquet tier: row groups actually decoded vs pruned by footer stats
  val rowGroupsRead = new java.util.concurrent.atomic.AtomicLong(0)
  val rowGroupsSkipped = new java.util.concurrent.atomic.AtomicLong(0)
  val dbgFilters = new java.util.concurrent.atomic.AtomicReference[String](null)
  /** Bench/debug seam: force the parquet tier onto the row-materializing
    * reader to measure the vectorized path's gain (ProfileParquet). */
  @volatile var columnarEnabled = true
}

private[v2] class RecordReaderFactory(readSchema: StructType, fullSchema: StructType,
    confProps: Map[String, String],
    filters: Array[org.apache.spark.sql.sources.Filter],
    topN: Option[PushedTopN], limit: Option[Int],
    agg: Option[PushedAggSpec], mode: String = "FAILFAST",
    dvOverrides: Option[Map[String, Option[String]]] = None,
    former: Map[String, Seq[String]] = Map.empty,
    columnarEligible: Boolean = false)
    extends PartitionReaderFactory {
  @transient private lazy val conf = RecordSource.confFrom(confProps)

  // the vectorized path: Spark requires the answer to be UNIFORM across
  // a scan's partitions, so [[RecordScan.createReaderFactory]] grants
  // eligibility only when EVERY candidate file is parquet and the
  // projection/filters fit the batch decoder (flat atomic columns, no
  // pushed agg/topN, single-file partitions)
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnarEligible && partition.isInstanceOf[RecordInputPartition]

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    partition match {
      case RecordInputPartition(file) =>
        new ParquetColumnarPartitionReader(file, readSchema, fullSchema,
          conf, filters, dvOverrides, former)
      case other => throw new IllegalStateException(
        s"columnar read of a non-columnar partition: $other")
    }
  private def readerFor(file: String): PartitionReader[InternalRow] =
    if (file.endsWith(ParquetRecords.Extension)) {
      // the columnar tier: pushed LIMIT/TopN are declared partial, so a
      // reader that returns all matching rows is correct (Spark
      // re-applies the global step); pushed AGGREGATES fold in-reader —
      // footer-stats fast path when no filters/DV/groups, decode
      // fallback otherwise (ParquetAgg)
      agg match {
        case Some(spec) =>
          new ParquetAggPartitionReader(file, readSchema, fullSchema,
            conf, filters, spec, mode, dvOverrides, former)
        case None =>
          new ParquetRecordPartitionReader(file, readSchema, fullSchema,
            conf, filters, mode, dvOverrides, former)
      }
    } else new RecordPartitionReader(file, readSchema, fullSchema,
      conf, filters, topN, limit, agg, mode, dvOverrides, former)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case RecordInputPartition(file) => readerFor(file)
      case RecordKeyedPartition(files, _) =>
        // a key group reads its files back to back; pushed limit/topN/agg
        // stay per-file partials (Spark re-applies the global step)
        new ConcatPartitionReader(files.iterator.map(f => () => readerFor(f)))
      case other => throw new IllegalStateException(s"foreign partition: $other")
    }
}

/** Chains per-file readers of one key group sequentially. */
private[v2] class ConcatPartitionReader(
    readers: Iterator[() => PartitionReader[InternalRow]])
    extends PartitionReader[InternalRow] {
  private var cur: PartitionReader[InternalRow] = _
  override def next(): Boolean = {
    while (true) {
      if (cur == null) {
        if (!readers.hasNext) return false
        cur = readers.next()()
      }
      if (cur.next()) return true
      cur.close(); cur = null
    }
    false // unreachable
  }
  override def get(): InternalRow = cur.get()
  override def close(): Unit = if (cur != null) { cur.close(); cur = null }
}

/** Parses one JSONL file of records; emits only the pruned columns, only
  * rows passing the pushed filters (evaluated on the raw parsed record,
  * BEFORE any column conversion — non-matching rows never materialize),
  * bounded by the pushed per-partition top-N/limit.
  * Jackson is the JSON parser already on Spark's classpath. */
private[v2] class RecordPartitionReader(file: String, readSchema: StructType,
    fullSchema: StructType, conf: org.apache.hadoop.conf.Configuration,
    filters: Array[org.apache.spark.sql.sources.Filter],
    topN: Option[PushedTopN], limit: Option[Int],
    agg: Option[PushedAggSpec] = None, mode: String = "FAILFAST",
    dvOverrides: Option[Map[String, Option[String]]] = None,
    former: Map[String, Seq[String]] = Map.empty)
    extends PartitionReader[InternalRow] {

  /** A RENAMED column reads under its current key first, then its
    * former wire keys (rows written before the rename keep the old key
    * — rename is metadata-only; the catalog forbids re-using a former
    * name, so the fallback is unambiguous). */
  private def fetchField(fields: JsonNode, name: String): JsonNode = {
    if (fields == null) return null
    val v = fields.get(name)
    if (v != null) v
    else former.get(name) match {
      case Some(olds) => olds.iterator.map(fields.get)
        .collectFirst { case x if x != null => x }.orNull
      case None => null
    }
  }

  import org.apache.spark.sql.sources._

  private val mapper = new ObjectMapper()
  private val p = new org.apache.hadoop.fs.Path(file)
  RecordSourceMetrics.filesOpened.incrementAndGet()
  private val fs = p.getFileSystem(conf)
  // merge-on-read: rows whose line ordinal the deletion-vector sidecar
  // marks are skipped before parsing (a deleted malformed line no longer
  // aborts FAILFAST — deleted rows are gone in every sense). Loading is
  // strict: an unreadable sidecar fails the scan (DeletionVector.load).
  // A snapshot read (versionAsOf) uses the MANIFEST's frozen DV state
  // instead of the live sidecar — deletes after the snapshot reverse.
  private val dv: Option[DeletionVector.Vector] = dvOverrides match {
    case Some(m) => m.getOrElse(file, None).map(DeletionVector.parse)
    case None => DeletionVector.load(fs, file)
  }
  private val in = fs.open(p)
  private val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  private var current: InternalRow = _
  private var emitted = 0
  // lazily-built bounded heap for pushed top-N
  private var heapIter: Iterator[InternalRow] = _
  // lazily-built per-partition pre-aggregation for pushed aggregates
  private var aggIter: Iterator[InternalRow] = _

  /** One record per non-empty line: `(node, null)` for well-formed JSON,
    * `(null, rawLine)` for a malformed line surviving PERMISSIVE mode.
    * FAILFAST aborts naming the file and line number; DROPMALFORMED
    * skips. Corrupt records behave as all-NULL rows (NULL group keys,
    * skipped by min/max/count(field), counted by count(*)) whose raw
    * text is exposed through the `_corrupt_record` column when the
    * schema declares it — Spark's JSON-source semantics. */
  private lazy val records: Iterator[(JsonNode, String, Long)] =
    lines.zipWithIndex.flatMap { case (l, i) =>
      if (dv.exists(_.contains(i.toLong))) None
      else if (l.trim.isEmpty) None
      else
        try Some((mapper.readTree(l), null: String, i.toLong))
        catch {
          case e: com.fasterxml.jackson.core.JacksonException => mode match {
            case "PERMISSIVE" => Some((null: JsonNode, l, i.toLong))
            case "DROPMALFORMED" => None
            case _ => throw new java.io.IOException(
              s"graft-records: malformed JSON at $file:${i + 1}: " +
                s"'${l.take(80)}' (mode=FAILFAST; use mode=PERMISSIVE to " +
                "keep malformed lines as _corrupt_record rows, or " +
                "DROPMALFORMED to skip them)", e)
          }
        }
    }

  /** Field lookup over a record that may be corrupt. */
  private def fieldValue(node: JsonNode, raw: String, name: String,
      dt: DataType): Any =
    if (node != null) rawValue(node, name, dt)
    else if (name == RecordSource.CorruptCol) raw
    else null

  override def next(): Boolean = agg match {
    case Some(a) =>
      if (aggIter == null) aggIter = buildAgg(a)
      if (aggIter.hasNext) { current = aggIter.next(); true } else false
    case None => nextPlain()
  }

  private def nextPlain(): Boolean = topN match {
    case Some(t) =>
      if (heapIter == null) heapIter = buildTopN(t)
      if (heapIter.hasNext) { current = heapIter.next(); true } else false
    case None =>
      if (limit.exists(emitted >= _)) return false
      var found = false
      while (!found && records.hasNext) {
        val (node, raw, pos) = records.next()
        if (passes(node, raw)) {
          current = convert(node, raw, pos); found = true; emitted += 1
        }
      }
      found
  }

  /** Pre-aggregate this partition's matching rows: one buffer per group
    * key holding count/min/max partials. Filters apply BEFORE aggregation
    * (Spark pushed them in that order). A GLOBAL aggregate (no group
    * columns) always emits exactly one row, so an all-filtered-out
    * partition still contributes count 0 to the final merge; a grouped
    * aggregate rightly emits nothing for absent groups.
    *
    * The buffer holds one entry per distinct group key and cannot spill
    * (pushdown cannot be un-accepted mid-scan), so a group-by on a
    * high-cardinality column (a string id, say) is bounded by
    * [[RecordScanBuilder.MaxPushedGroups]] — past it the reader FAILS
    * LOUDLY naming the fix (group on a bounded-cardinality column, or
    * keep the aggregation in Spark) instead of growing until an executor
    * OOM that would blame the wrong stage. */
  private def buildAgg(a: PushedAggSpec): Iterator[InternalRow] = {
    val groupTypes = a.groupCols.map(c => fullSchema(c).dataType)
    val buf = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Array[Any]]
    def checkBound(): Unit = // called pre-insert: size == keys already held
      if (buf.size >= RecordScanBuilder.MaxPushedGroups)
        throw new IllegalStateException(
          s"graft-records aggregate pushdown exceeded MaxPushedGroups=" +
            s"${RecordScanBuilder.MaxPushedGroups} distinct keys for group " +
            s"columns ${a.groupCols.mkString("(", ", ", ")")} in one " +
            "partition — the in-reader hash table cannot spill. Group on a " +
            "bounded-cardinality column, or keep the aggregation in Spark " +
            "(it spills) by aggregating a non-pushable expression")
    def newBuffer(): Array[Any] = a.aggs.map {
      case PushedAggCol("count_star", _) | PushedAggCol("count", _) => 0L: Any
      case _ => null: Any
    }.toArray
    if (a.groupCols.isEmpty) buf(Seq.empty) = newBuffer()
    while (records.hasNext) {
      val (node, raw, _) = records.next()
      if (passes(node, raw)) {
        val key = a.groupCols.zip(groupTypes).map { case (c, dt) =>
          fieldValue(node, raw, c, dt)
        }
        val st = buf.getOrElseUpdate(key, { checkBound(); newBuffer() })
        a.aggs.zipWithIndex.foreach { case (ac, i) =>
          ac.op match {
            case "count_star" => st(i) = st(i).asInstanceOf[Long] + 1L
            case "count" =>
              if (fieldValue(node, raw, ac.field, fullSchema(ac.field).dataType) != null)
                st(i) = st(i).asInstanceOf[Long] + 1L
            case "sum" => // doubles only (gated at push); all-null -> null
              val v = fieldValue(node, raw, ac.field, fullSchema(ac.field).dataType)
              if (v != null) {
                val d = v.asInstanceOf[java.lang.Double].doubleValue
                st(i) =
                  if (st(i) == null) java.lang.Double.valueOf(d)
                  else java.lang.Double.valueOf(
                    st(i).asInstanceOf[java.lang.Double].doubleValue + d)
              }
            case "min" | "max" =>
              val v = fieldValue(node, raw, ac.field, fullSchema(ac.field).dataType)
              val better = v != null && (st(i) == null || {
                val c = RecordFilterEval.nullAwareCompare(v, st(i),
                  descending = false, nullsFirst = false)
                if (ac.op == "min") c < 0 else c > 0
              })
              if (better) st(i) = v
          }
        }
      }
    }
    buf.iterator.map { case (key, st) =>
      InternalRow.fromSeq((key ++ st.toSeq).map(toInternal))
    }
  }

  /** Raw comparable values -> internal representation (strings are the
    * only raw type whose internal form differs). */
  private def toInternal(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }

  /** Keep the per-partition top `limit` rows by the pushed sort key in a
    * bounded heap (worst-at-head). Output order is irrelevant — the push
    * is partial, Spark re-sorts the survivors. */
  private def buildTopN(t: PushedTopN): Iterator[InternalRow] = {
    val keyType = fullSchema(t.field).dataType
    // heap comparator: REVERSE of the sort order, so poll() evicts the worst
    val cmp = new java.util.Comparator[(Any, InternalRow)] {
      def compare(a: (Any, InternalRow), b: (Any, InternalRow)): Int =
        -RecordFilterEval.nullAwareCompare(a._1, b._1, t.descending, t.nullsFirst)
    }
    val heap = new java.util.PriorityQueue[(Any, InternalRow)](t.limit + 1, cmp)
    while (records.hasNext) {
      val (node, raw, pos) = records.next()
      if (passes(node, raw)) {
        heap.offer((fieldValue(node, raw, t.field, keyType),
          convert(node, raw, pos).copy()))
        if (heap.size > t.limit) heap.poll()
      }
    }
    scala.jdk.CollectionConverters.IteratorHasAsScala(heap.iterator()).asScala.map(_._2)
  }

  // compiled ONCE per reader: hoists e.g. a large In list's hash set
  // out of the per-row path (RecordFilterEval.compile)
  private val compiledFilters = filters.map(RecordFilterEval.compile)

  private def passes(node: JsonNode, raw: String): Boolean =
    compiledFilters.forall(p => p(name =>
      fieldValue(node, raw, name, fullSchema(name).dataType)).contains(true))

  /** The comparable value of one field of the raw record: String, Double,
    * Boolean, Long epoch-micros (timestamps) or Int epoch-days (dates). */
  private def rawValue(node: JsonNode, name: String, dt: DataType): Any = {
    val v = name match {
      case "_record_id" => node.get("id")
      case "_created_time" => node.get("createdTime")
      case n => fetchField(node.get("fields"), n)
    }
    if (v == null || v.isNull) null
    else dt match {
      case StringType => if (v.isTextual) v.asText() else v.toString
      case DoubleType => java.lang.Double.valueOf(v.asDouble())
      case BooleanType => java.lang.Boolean.valueOf(v.asBoolean())
      case TimestampType => tsMicros(v)
      case DateType => java.lang.Integer.valueOf(
        java.time.LocalDate.parse(v.asText().take(10)).toEpochDay.toInt)
      case _ => if (v.isTextual) v.asText() else v.toString
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()

  private def convert(node: JsonNode, raw: String = null,
      pos: Long = -1L): InternalRow = {
    if (node == null) // corrupt record (PERMISSIVE): all NULL except the
      return InternalRow.fromSeq(readSchema.fields.toIndexedSeq.map { f =>
        f.name match {
          case RecordSource.CorruptCol => UTF8String.fromString(raw)
          case RecordSource.FileCol => UTF8String.fromString(file)
          case RecordSource.PosCol => pos: Any
          case _ => null
        }
      })
    val fields = node.get("fields")
    InternalRow.fromSeq(readSchema.fields.toIndexedSeq.map { f =>
      f.name match {
        case "_record_id" => utf8(node.get("id"))
        case "_created_time" => tsMicros(node.get("createdTime"))
        case RecordSource.FileCol => UTF8String.fromString(file)
        case RecordSource.PosCol => pos: Any
        case name =>
          val v = fetchField(fields, name)
          if (v == null || v.isNull) null else cast(v, f.dataType)
      }
    })
  }

  private def utf8(n: JsonNode): UTF8String =
    if (n == null || n.isNull) null else UTF8String.fromString(n.asText())

  private[v2] def tsMicros(n: JsonNode): java.lang.Long =
    if (n == null || n.isNull) null
    else {
      val i = java.time.Instant.parse(n.asText())
      java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    }

  private def cast(v: JsonNode, dt: DataType): Any = dt match {
    case StringType => UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
    case DoubleType => v.asDouble()
    case BooleanType => v.asBoolean()
    case TimestampType => tsMicros(v)
    case DateType =>
      java.time.LocalDate.parse(v.asText().take(10)).toEpochDay.toInt
    case ArrayType(StringType, _) =>
      val elems = v.elements().asScala.toArray.map { e =>
        // attachment objects keep only the url (lib/DataProcessor.py:58-59)
        val s = if (e.isObject && e.has("url")) e.get("url").asText() else e.asText()
        UTF8String.fromString(s): Any
      }
      new GenericArrayData(elems): ArrayData
    case ArrayType(DoubleType, _) => // embedding-shaped payloads
      val elems = v.elements().asScala.toArray.map { e =>
        if (e.isNull) null else java.lang.Double.valueOf(e.asDouble()): Any
      }
      new GenericArrayData(elems): ArrayData
    case _ => UTF8String.fromString(v.toString)
  }
}

/** Exact evaluator for the pushed filter subset, over raw record values
  * (String / Double / Boolean / Long epoch-micros / Int epoch-days).
  * SQL three-valued logic: None = NULL; a row passes a filter only on
  * Some(true) — identical to what Spark would compute post-scan, which is
  * the contract for claiming a filter as fully pushed. */
private[v2] object RecordFilterEval {
  import org.apache.spark.sql.sources._

  /** Is `f` exactly evaluable by [[eval]] against `schema`? Every leaf
    * must reference a known top-level column of atomic type with a
    * comparable literal — the gate [[RecordScanBuilder]] applies before
    * accepting a pushed filter, and [[RecordScan.filter]] applies to
    * runtime filters (an unevaluable filter reaching [[eval]] would
    * return None for every row, and `passes` would WRONGLY drop them). */
  def pushable(f: Filter, schema: StructType): Boolean = {
    def fieldOk(attr: String): Boolean =
      !attr.contains(".") && schema.fieldNames.contains(attr) &&
        (schema(attr).dataType match {
          case StringType | DoubleType | BooleanType | TimestampType | DateType => true
          case _ => false
        })
    def leafOk(attr: String, v: Any): Boolean = fieldOk(attr) && (v match {
      case null => false
      case _: String | _: java.lang.Double | _: java.lang.Float | _: java.lang.Long |
           _: java.lang.Integer | _: java.lang.Short | _: java.lang.Byte |
           _: java.lang.Boolean | _: java.sql.Timestamp | _: java.time.Instant |
           _: java.sql.Date | _: java.time.LocalDate => true
      case _ => false
    })
    def ok(f: Filter): Boolean = f match {
      case EqualTo(a, v) => leafOk(a, v)
      case GreaterThan(a, v) => leafOk(a, v)
      case GreaterThanOrEqual(a, v) => leafOk(a, v)
      case LessThan(a, v) => leafOk(a, v)
      case LessThanOrEqual(a, v) => leafOk(a, v)
      case In(a, vs) => vs.nonEmpty && vs.forall(leafOk(a, _))
      case IsNull(a) => fieldOk(a)
      case IsNotNull(a) => fieldOk(a)
      case Not(inner) => ok(inner)
      case And(l, r) => ok(l) && ok(r)
      case Or(l, r) => ok(l) && ok(r)
      case _ => false
    }
    ok(f)
  }

  /** Compile a filter to a row predicate, hoisting per-filter structures
    * out of the per-row path — above this size an all-string In list
    * becomes ONE hash set built at reader construction instead of an
    * O(|values|) scan per row (an 11k-id GDPR purge list over a 150k-row
    * table is 1.7e9 comparisons the naive way; string equality under
    * [[cmp]] is exactly string equality, so the set is semantics-
    * preserving). Everything else delegates to [[eval]]. */
  def compile(f: Filter): (String => Any) => Option[Boolean] = f match {
    case In(a, vs) if vs.length > 16 && vs.forall(_.isInstanceOf[String]) =>
      val set = vs.iterator.map(_.asInstanceOf[String]).toSet
      lookup => lookup(a) match {
        case null => None
        case s: String => Some(set.contains(s))
        case other => eval(f, _ => other) // non-string raw: exact slow path
      }
    case And(l, r) =>
      val (cl, cr) = (compile(l), compile(r))
      lookup => (cl(lookup), cr(lookup)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
    case Or(l, r) =>
      val (cl, cr) = (compile(l), compile(r))
      lookup => (cl(lookup), cr(lookup)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
    case Not(inner) =>
      val ci = compile(inner)
      lookup => ci(lookup).map(!_)
    case other => eval(other, _)
  }

  def eval(f: Filter, lookup: String => Any): Option[Boolean] = f match {
    case EqualTo(a, v) => cmp(lookup(a), v).map(_ == 0)
    case GreaterThan(a, v) => cmp(lookup(a), v).map(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(lookup(a), v).map(_ >= 0)
    case LessThan(a, v) => cmp(lookup(a), v).map(_ < 0)
    case LessThanOrEqual(a, v) => cmp(lookup(a), v).map(_ <= 0)
    case In(a, vs) =>
      val x = lookup(a)
      if (x == null) None
      else {
        val hits = vs.map(v => cmp(x, v))
        if (hits.exists(_.contains(0))) Some(true)
        else if (hits.exists(_.isEmpty)) None
        else Some(false)
      }
    case IsNull(a) => Some(lookup(a) == null)
    case IsNotNull(a) => Some(lookup(a) != null)
    case Not(inner) => eval(inner, lookup).map(!_)
    case And(l, r) => (eval(l, lookup), eval(r, lookup)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, lookup), eval(r, lookup)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case _ => None // never pushed (supported() gates), defensive
  }

  /** String comparison in Spark's order: UTF8String compares UTF-8 bytes
    * (= code-point order), while java.lang.String.compareTo compares
    * UTF-16 code units — they disagree for supplementary characters
    * (surrogates sort above U+E000..U+FFFF in UTF-16 but below them in
    * code-point order). A pushed filter must reproduce Spark exactly. */
  private def utf8Cmp(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Double comparison in Spark's order: -0.0 == 0.0 (unlike
    * Double.compareTo); NaN sorts above everything, as in both. */
  private[v2] def dblCmp(a: Double, b: Double): Int =
    java.lang.Double.compare(a + 0.0d, b + 0.0d)

  /** Three-valued comparison of a raw record value with a Spark literal.
    * None when either side is null or the pair is incomparable. */
  def cmp(raw: Any, lit: Any): Option[Int] = {
    if (raw == null || lit == null) return None
    (raw, lit) match {
      case (a: String, b: String) => Some(utf8Cmp(a, b))
      case (a: java.lang.Double, b) => numeric(b).map(x => dblCmp(a, x))
      case (a: java.lang.Boolean, b: java.lang.Boolean) => Some(a.compareTo(b))
      case (a: java.lang.Long, b) => tsMicros(b).map(a.compareTo(_)) // timestamp field
      case (a: java.lang.Integer, b) => epochDays(b).map(x => a.compareTo(x)) // date field
      case _ => None
    }
  }

  private[v2] def numeric(v: Any): Option[java.lang.Double] = v match {
    case d: java.lang.Double => Some(d)
    case f: java.lang.Float => Some(f.doubleValue())
    case l: java.lang.Long => Some(l.doubleValue())
    case i: java.lang.Integer => Some(i.doubleValue())
    case s: java.lang.Short => Some(s.doubleValue())
    case b: java.lang.Byte => Some(b.doubleValue())
    case _ => None
  }

  private[v2] def tsMicros(v: Any): Option[java.lang.Long] = v match {
    case t: java.sql.Timestamp =>
      // getTime is floored millis (incl. the nanos' ms part, negative-safe);
      // add only the sub-millisecond micros — `/1000*1000000 + nanos/1000`
      // double-counted millis and truncated toward zero pre-epoch
      Some(t.getTime * 1000L + (t.getNanos % 1000000) / 1000L)
    case i: java.time.Instant =>
      // getEpochSecond floors and getNano is in [0, 1e9): negative-safe
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  private[v2] def epochDays(v: Any): Option[Int] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
    case _ => None
  }

  /** Null-aware key comparison in SORT order (direction + null placement
    * applied): negative when `a` sorts before `b`. */
  def nullAwareCompare(a: Any, b: Any, descending: Boolean, nullsFirst: Boolean): Int =
    (a, b) match {
      case (null, null) => 0
      case (null, _) => if (nullsFirst) -1 else 1
      case (_, null) => if (nullsFirst) 1 else -1
      case _ =>
        val c = (a, b) match {
          case (x: String, y: String) => utf8Cmp(x, y)
          case (x: java.lang.Double, y: java.lang.Double) => dblCmp(x, y)
          case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
          case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
          case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
          case _ => 0
        }
        if (descending) -c else c
    }
}

// ---------------------------------------------------------------------------
// Write path — the production sink the reference's store wrapper represents
// (lib/FirestoreWrapper.py:37-169, S9-S14): rows become JSONL records
// `{id, createdTime, fields:{...}}` in the SAME wire shape the read path
// parses, so a round trip through the source is lossless.
//
// Commit protocol (two-phase, driver-coordinated):
//   1. each task writes its rows to `<path>/_staging-<queryId>/part-...`
//      (the `_` prefix keeps staged files invisible to the reader and to
//      content fingerprints, which skip `_`/`.` path segments);
//   2. task commit hands the staged file name to the driver;
//   3. job commit moves exactly the COMMITTED files into `<path>/`
//      (speculative/failed attempts stay in staging) and deletes the
//      staging dir; job abort deletes staging wholesale. Readers therefore
//      never observe a torn write: data files appear only at job commit.
// ---------------------------------------------------------------------------

private[v2] object RecordWriteSupport {
  /** Types with an exact JSONL wire form (the same set the reader
    * parses). Checked ONCE at write planning — a per-row failure would
    * waste the whole job to report a schema mistake. */
  def validateWriteSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      val ok = f.dataType match {
        case StringType | DoubleType | BooleanType | TimestampType | DateType => true
        case ArrayType(StringType | DoubleType, _) => true
        case _ => false
      }
      if (!ok) throw new IllegalArgumentException(
        s"graft-records cannot write column '${f.name}' of type " +
          s"${f.dataType.simpleString}: the record wire format carries " +
          "string/double/boolean/timestamp/date/array<string>/" +
          "array<double> — cast the column first")
    }

  def stagingDir(path: String, queryId: String): String =
    s"$path/_staging-$queryId"
}

private[v2] class RecordWriteBuilder(schema: StructType, queryId: String,
    path: String, confProps: Map[String, String],
    clusterBy: Option[String] = None, bloomCols: Seq[String] = Seq.empty,
    bloomBits: Int = BloomSidecar.DefaultBits,
    snapshotPerEpoch: Boolean = false,
    dataFormat: String = "jsonl",
    rowGroupBytes: Long = org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  // SaveMode.Overwrite arrives as truncate() on the builder
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write =
    new RecordWrite(schema, queryId, path, confProps, truncateFirst,
      clusterBy, bloomCols, bloomBits, snapshotPerEpoch, dataFormat,
      rowGroupBytes)
}

private[v2] class RecordWrite(schema: StructType, queryId: String,
    path: String, confProps: Map[String, String], truncateFirst: Boolean,
    clusterBy: Option[String] = None, bloomCols: Seq[String] = Seq.empty,
    bloomBits: Int = BloomSidecar.DefaultBits,
    snapshotPerEpoch: Boolean = false,
    dataFormat: String = "jsonl",
    rowGroupBytes: Long = org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(!truncateFirst,
      "graft-records streaming sink supports append output mode only " +
        "(complete-mode truncate-per-epoch would rewrite the record log " +
        "every trigger — materialize a rollup table instead)")
    require(dataFormat == "jsonl",
      "graft-records streaming sink writes jsonl only — parquet epochs " +
        "would be tiny files anyway; compact into parquet downstream")
    new RecordStreamingWrite(schema, queryId, path, confProps,
      clusterBy, bloomCols, bloomBits, snapshotPerEpoch)
  }
  override def description(): String =
    s"RecordWrite(path=$path, truncate=$truncateFirst)"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new RecordWriterFactory(schema,
      RecordWriteSupport.stagingDir(path, queryId), confProps, clusterBy,
      bloomCols, bloomBits, dataFormat, rowGroupBytes)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = RecordSource.confFrom(confProps)
    val dest = new org.apache.hadoop.fs.Path(path)
    val fs = dest.getFileSystem(conf)
    fs.mkdirs(dest)
    if (truncateFirst) {
      fs.listStatus(dest).filter(_.isFile)
        .foreach(st => fs.delete(st.getPath, false))
      // truncated files' sidecars must not describe the replacements —
      // a stale DELETION VECTOR especially: if a replacement file ever
      // reused a truncated file's name, leftover positions would
      // silently delete the wrong rows. Snapshots of the truncated
      // state are equally void (their files are gone).
      fs.delete(new org.apache.hadoop.fs.Path(dest, ZoneMap.Dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(dest, BloomSidecar.Dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(dest, DeletionVector.Dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(dest, Snapshots.Dir), true)
      // the commit log coordinates WRITERS over the files it names —
      // all gone now; truncate is quiesce-first (documented), so a
      // fresh history is consistent
      fs.delete(new org.apache.hadoop.fs.Path(dest, OptimisticCommit.Dir), true)
    }
    val landed = messages.flatMap(RecordCommitMessage.partsOf).map {
      case (staged, zoneJson, bloomJson) =>
      val src = new org.apache.hadoop.fs.Path(staged)
      val to = new org.apache.hadoop.fs.Path(dest, src.getName)
      // sidecar BEFORE the data file becomes visible: a reader that can
      // see the file can always see its stats (stats are advisory, so
      // the reverse orphan — sidecar without file after a crash here —
      // is inert)
      ZoneMap.write(fs, dest, src.getName, zoneJson)
      bloomJson.foreach(BloomSidecar.write(fs, dest, src.getName, _))
      if (!fs.rename(src, to))
        throw new java.io.IOException(
          s"graft-records commit failed moving $src -> $to")
      to.getName
    }
    fs.delete(new org.apache.hadoop.fs.Path(
      RecordWriteSupport.stagingDir(path, queryId)), true)
    // declare AFTER flipping: an append touches nothing, so it cannot
    // conflict — the entry exists so destructive writers validating
    // their windows see the full history (and never blocks them)
    val v = OptimisticCommit.commit(fs, dest,
      OptimisticCommit.head(fs, dest), op = "append",
      added = landed.toSeq)
    OptimisticCommit.markApplied(fs, dest, v)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = RecordSource.confFrom(confProps)
    val staging = new org.apache.hadoop.fs.Path(
      RecordWriteSupport.stagingDir(path, queryId))
    staging.getFileSystem(conf).delete(staging, true)
  }
}

/** `zoneJson` carries the staged file's zone-map stats ([[ZoneMap]]) to
  * the driver, which writes the sidecar at commit — stats ride the commit
  * protocol, so a sidecar exists if and only if its file was committed. */
private[v2] case class RecordCommitMessage(stagedFile: String,
    zoneJson: String, bloomJson: Option[String] = None)
    extends WriterCommitMessage

/** A clustered task's commit: one (stagedFile, zoneJson, bloomJson)
  * triple PER KEY the task saw ([[ClusteredRecordDataWriter]]). */
private[v2] case class RecordMultiCommitMessage(
    parts: Seq[(String, String, Option[String])]) extends WriterCommitMessage

private[v2] object RecordCommitMessage {
  /** Normalize either message shape to (stagedFile, zoneJson, bloomJson). */
  def partsOf(m: WriterCommitMessage): Seq[(String, String, Option[String])] =
    m match {
      case RecordCommitMessage(f, z, b) => Seq((f, z, b))
      case RecordMultiCommitMessage(ps) => ps
      case other => throw new IllegalStateException(s"foreign commit: $other")
    }
}

/** STREAMING_WRITE for `graft-records`: per-epoch staged two-phase
  * commit, composing the batch path's staging discipline with an
  * idempotence marker for exactly-once across micro-batch retries.
  *
  * Shape per epoch: tasks write to `_staging-<queryId>-epoch-<E>/`
  * (epoch-scoped file names, so no epoch can clobber another);
  * `commit(E)` renames the acknowledged files into the table directory,
  * then drops a `_epoch-<E>.committed` MARKER, then deletes the staging
  * dir. The marker is keyed by PATH + epoch, not by query run (a
  * restarted run has a fresh runId but must still recognize the commit):
  * if a failure lands between sink commit and the engine's commit-log
  * write, the restarted run re-executes epoch E, and `commit(E)` finds
  * the marker, discards the replayed staging wholesale, and returns —
  * the one window where the engine alone cannot guarantee exactly-once.
  * Single-writer per table path, the same discipline the state store's
  * WriterLease documents; markers/staging are `_`-prefixed so
  * [[RecordScan.listDataFiles]] never reads them as data.
  *
  * Reference basis: the reference's writes are per-record RPCs with no
  * transactional grouping (lib/FirestoreWrapper.py:141-169 commits a
  * mutation per document); this is the same record stream given
  * atomic, idempotent epoch grouping. */
private[v2] class RecordStreamingWrite(schema: StructType, queryId: String,
    path: String, confProps: Map[String, String],
    clusterBy: Option[String] = None, bloomCols: Seq[String] = Seq.empty,
    bloomBits: Int = BloomSidecar.DefaultBits,
    snapshotPerEpoch: Boolean = false)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.hadoop.fs.Path

  private def stagingDir(epochId: Long): String =
    s"$path/_staging-$queryId-epoch-$epochId"
  private def marker(epochId: Long): Path =
    new Path(path, s"_epoch-$epochId.committed")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new RecordStreamingWriterFactory(schema, path, queryId, confProps,
      clusterBy, bloomCols, bloomBits)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = RecordSource.confFrom(confProps)
    val dest = new Path(path)
    val fs = dest.getFileSystem(conf)
    fs.mkdirs(dest)
    if (fs.exists(marker(epochId))) {
      // epoch already committed — a retry after a post-commit failure:
      // drop the replayed staging wholesale (exactly-once), keep the
      // first commit's files as the epoch's truth
      fs.delete(new Path(stagingDir(epochId)), true)
      return
    }
    // an unmarked epoch may still have left files from a previous
    // attempt that crashed BETWEEN its renames and its marker; task ids
    // differ across attempts, so those files must be cleared before
    // this attempt's renames or both attempts' rows would coexist.
    // Epoch file names are `part-<E>-...` with the epoch delimited by
    // dashes, so the prefix match cannot touch another epoch's files or
    // the batch writer's `part-<00000>-...` names.
    val attemptPrefix = s"part-$epochId-"
    fs.listStatus(dest).filter(_.isFile).map(_.getPath)
      .filter(_.getName.startsWith(attemptPrefix))
      .foreach { p =>
        fs.delete(ZoneMap.sidecar(dest, p.getName), false) // stale attempt's stats
        fs.delete(BloomSidecar.sidecar(dest, p.getName), false)
        // stale files were reader-visible between the crash and this
        // restart — a DELETE in that window left a DV sidecar that
        // would otherwise orphan (matching RecordReplaceDataWrite's
        // retirement discipline)
        fs.delete(DeletionVector.sidecar(dest, p.getName), false)
        fs.delete(p, false)
      }
    val landed = messages.flatMap(RecordCommitMessage.partsOf).map {
      case (staged, zoneJson, bloomJson) =>
      val src = new Path(staged)
      val to = new Path(dest, src.getName)
      ZoneMap.write(fs, dest, src.getName, zoneJson) // before visibility, as in batch
      bloomJson.foreach(BloomSidecar.write(fs, dest, src.getName, _))
      if (!fs.rename(src, to))
        throw new java.io.IOException(
          s"graft-records epoch $epochId commit failed moving $src -> $to")
      to.getName
    }
    // marker only AFTER every file is live: a crash before this line
    // re-runs the epoch, and the pre-clean above makes that re-run
    // supersede this attempt's files — idempotent either way
    fs.create(marker(epochId), true).close()
    // declare-after-flip, as in batch append: epochs add files only
    val v = OptimisticCommit.commit(fs, dest,
      OptimisticCommit.head(fs, dest), op = "epoch", added = landed.toSeq)
    OptimisticCommit.markApplied(fs, dest, v)
    // per-epoch snapshot: versionAsOf addresses "the table as of epoch
    // N", and LakeChangelog can CDC between the stream's commits. The
    // exactly-once marker above already short-circuits retries, so a
    // replayed epoch never double-snapshots.
    if (snapshotPerEpoch)
      Snapshots.commit(fs, path, conf)
    fs.delete(new Path(stagingDir(epochId)), true)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = RecordSource.confFrom(confProps)
    val staging = new Path(stagingDir(epochId))
    staging.getFileSystem(conf).delete(staging, true)
  }
}

/** Serializable (ships to executors): carries only the path/queryId
  * strings and rebuilds the staged file name per (epoch, partition,
  * task) — epoch-scoped names keep concurrent epoch attempts and task
  * retries from ever colliding. */
private[v2] class RecordStreamingWriterFactory(schema: StructType,
    path: String, queryId: String, confProps: Map[String, String],
    clusterBy: Option[String] = None, bloomCols: Seq[String] = Seq.empty,
    bloomBits: Int = BloomSidecar.DefaultBits)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val base = f"$path/_staging-$queryId-epoch-$epochId/" +
      f"part-$epochId-$partitionId%05d-$taskId.jsonl"
    clusterBy match {
      case Some(k) => new ClusteredRecordDataWriter(schema, k, base,
        RecordSource.confFrom(confProps), bloomCols, bloomBits)
      case None => new RecordDataWriter(schema, base,
        RecordSource.confFrom(confProps), bloomCols, bloomBits)
    }
  }
}

/** Group-based copy-on-write row-level operation (UPDATE / MERGE /
  * non-metadata DELETE): ONE frozen group = the table's data files at
  * plan time. The scan delivers those files whole (no file pruning, no
  * row filters — [[RecordScanBuilder]] refuses all pushdown under
  * `rowLevelFiles`); Spark's rewritten plan computes the replacement
  * rows; [[RecordReplaceDataWrite]] swaps exactly the frozen set behind
  * a marker. Appends racing the operation survive (not in the frozen
  * set); a racing DV delete on a frozen file is superseded by the swap
  * (single-writer discipline, as everywhere on this lake). Deletion
  * vectors on the frozen files MATERIALIZE as a side effect: the scan
  * subtracts them, the swap discards their sidecars. File-level group
  * pruning (only rewriting files that CAN match) is the deliberate
  * next optimization — correctness never depends on it. */
private[v2] class RecordRowLevelOperation(
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    fullSchema: StructType, path: String, confProps: Map[String, String],
    clusterBy: Option[String] = None, bloomCols: Seq[String] = Seq.empty,
    former: Map[String, Seq[String]] = Map.empty)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {

  /** The frozen candidate set: listed once, against the APPLIED commit
    * head (the listing's readVersion rides to the write, which CAS-
    * validates against it — a concurrent commit touching these files
    * between plan and commit aborts the statement loudly). The scan may
    * shrink the set via Spark's runtime group filter (condition subquery
    * on `_file`); the write replaces whatever the scan LAST planned. */
  private lazy val plannedFiles: (Long, Seq[String]) = {
    val conf = RecordSource.confFrom(confProps)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    val readVersion = OptimisticCommit.head(fs, dir)
    OptimisticCommit.awaitApplied(fs, dir,
      OptimisticCommit.standardRecover(path, conf))
    (readVersion, RecordScan.listDataFiles(path, conf).sorted.toSeq)
  }

  private val scanRef =
    new java.util.concurrent.atomic.AtomicReference[RecordScan](null)

  override def command()
      : org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

  /** Requesting `_file` does double duty: Spark's rewritten plan then
    * carries a metadata projection, which is what routes execution
    * through the PROJECTING write task — without it the writer would
    * receive the raw rewrite rows (operation column and all) instead of
    * table-schema rows. The projected `_file` itself is the row's
    * provenance, unused by this full-group write. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(RecordSource.FileCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RecordScanBuilder(fullSchema, path, confProps, "FAILFAST",
      None, None, None, Some(plannedFiles._2), former = former) {
      override def build(): Scan = {
        val sc = super.build().asInstanceOf[RecordScan]
        scanRef.set(sc)
        sc
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    RecordWriteSupport.validateWriteSchema(info.schema())
    new WriteBuilder {
      override def build(): Write = new RecordReplaceDataWrite(info.schema(),
        info.queryId(), path, confProps,
        // resolved AT COMMIT: the exact set the executed scan planned
        // (group-filtered or not); falls back to the full frozen set
        // only if no scan was ever built (defensive — Spark always
        // builds the scan before the write runs)
        () => (plannedFiles._1, Option(scanRef.get).flatMap(_.plannedGroups)
          .getOrElse(plannedFiles._2)),
        clusterBy, bloomCols)
    }
  }
}

private[graft] object RecordReplaceDataWrite {
  private val MarkerPrefix = "_rlo-"

  private[v2] def markerPath(dir: org.apache.hadoop.fs.Path, id: String) =
    new org.apache.hadoop.fs.Path(dir, s"$MarkerPrefix$id.json")

  /** Replay pending replace-data markers to completion (idempotent):
    * finish outstanding renames, then retire the old files. */
  def recover(path: String, conf: org.apache.hadoop.conf.Configuration): Int = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return 0
    val markers = fs.listStatus(dir).filter(_.isFile)
      .map(_.getPath).filter(_.getName.startsWith(MarkerPrefix))
    markers.foreach { mp =>
      val in = fs.open(mp)
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      in.close()
      val root = new ObjectMapper().readTree(bytes.toString("UTF-8"))
      val entries = scala.jdk.CollectionConverters
        .IteratorHasAsScala(root.get("entries").elements()).asScala.map(e =>
          (e.get("staged").asText(), e.get("new").asText())).toSeq
      entries.foreach { case (staged, newName) =>
        val np = new org.apache.hadoop.fs.Path(dir, newName)
        val sp = new org.apache.hadoop.fs.Path(staged)
        if (!fs.exists(np) && fs.exists(sp))
          if (!fs.rename(sp, np))
            throw new java.io.IOException(s"rlo recovery rename failed: $sp")
      }
      if (entries.forall { case (_, nn) =>
        fs.exists(new org.apache.hadoop.fs.Path(dir, nn)) }) {
        scala.jdk.CollectionConverters
          .IteratorHasAsScala(root.get("olds").elements()).asScala
          .map(_.asText()).foreach { o =>
            fs.delete(ZoneMap.sidecar(dir, o), false)
            fs.delete(BloomSidecar.sidecar(dir, o), false)
            fs.delete(DeletionVector.sidecar(dir, o), false)
            fs.delete(new org.apache.hadoop.fs.Path(dir, o), false)
          }
        fs.delete(mp, false)
      }
    }
    markers.length
  }
}

/** The copy-on-write swap behind [[RecordRowLevelOperation]]: tasks
  * stage the replacement rows through the ordinary record writer; the
  * driver writes a `_rlo-` marker (olds + staged→new pairs), renames
  * the replacements in, then retires the frozen old files WITH their
  * zone/bloom/deletion-vector sidecars. Empty task outputs (a partition
  * that produced no replacement rows) are dropped at commit, not
  * committed as zero-row files. Live snapshot manifests referencing a
  * frozen file refuse the commit — expire first, vacuum's contract. */
private[v2] class RecordReplaceDataWrite(schema: StructType, queryId: String,
    path: String, confProps: Map[String, String],
    oldsFn: () => (Long, Seq[String]),
    clusterBy: Option[String] = None, bloomCols: Seq[String] = Seq.empty)
    extends Write with BatchWrite {
  import org.apache.hadoop.fs.Path

  override def toBatch: BatchWrite = this
  override def description(): String = s"RecordReplaceData(path=$path)"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new RecordWriterFactory(schema,
      RecordWriteSupport.stagingDir(path, queryId), confProps,
      clusterBy, bloomCols)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = RecordSource.confFrom(confProps)
    val dest = new Path(path)
    val fs = dest.getFileSystem(conf)
    RecordReplaceDataWrite.recover(path, conf) // heal any prior crash
    val (readVersion, olds) = oldsFn()
    val oldNames = olds.map(f => new Path(f).getName)
    val snapRefs = Snapshots.referencedFiles(fs, dest)
    val pinned = oldNames.filter(snapRefs.contains)
    require(pinned.isEmpty,
      s"copy-on-write: ${pinned.length} file(s) to replace are " +
        s"referenced by live snapshots (${pinned.take(3).mkString(", ")}…)" +
        " — Snapshots.expire the old manifests first")
    val runId = java.util.UUID.randomUUID().toString.take(12)
    val entries = messages.flatMap(RecordCommitMessage.partsOf)
      .filter { case (_, zoneJson, _) => ZoneMap.parse(zoneJson).rows > 0 }
      .zipWithIndex
      .map { case ((staged, zone, _), i) =>
        (staged, s"rlo-$runId-p$i.jsonl", zone) }
    // CAS against the plan-time readVersion BEFORE the marker: a
    // concurrent commit that touched the frozen set since planning
    // aborts the statement here (Spark cannot re-run the rewrite from
    // inside the sink — the caller re-runs the SQL, the Iceberg
    // CommitFailedException contract)
    val committed = try OptimisticCommit.commit(fs, dest, readVersion,
        op = "replace", added = entries.map(_._2).toSeq,
        removed = oldNames, dv = oldNames,
        staging = Some(RecordWriteSupport.stagingDir(path, queryId)))
      catch { case e: OptimisticCommit.CommitConflictException =>
        abort(messages)
        throw new IllegalStateException(
          s"copy-on-write on $path lost an optimistic-commit race — " +
            s"re-run the statement. ${e.getMessage}", e)
      }
    // marker next: from here the swap completes exactly once even
    // across a crash (recover replays renames, then the retirements)
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val oldsArr = root.putArray("olds")
    oldNames.foreach(oldsArr.add)
    val entArr = root.putArray("entries")
    entries.foreach { case (staged, newName, _) =>
      val e = entArr.addObject()
      e.put("staged", staged); e.put("new", newName)
    }
    val mout = fs.create(RecordReplaceDataWrite.markerPath(dest, runId), true)
    mout.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    mout.close()
    entries.foreach { case (staged, newName, zone) =>
      ZoneMap.write(fs, dest, newName, zone)
      if (!fs.rename(new Path(staged), new Path(dest, newName)))
        throw new java.io.IOException(
          s"copy-on-write rename failed: $staged -> $newName")
    }
    oldNames.foreach { o =>
      fs.delete(ZoneMap.sidecar(dest, o), false)
      fs.delete(BloomSidecar.sidecar(dest, o), false)
      fs.delete(DeletionVector.sidecar(dest, o), false)
      fs.delete(new Path(dest, o), false)
    }
    fs.delete(RecordReplaceDataWrite.markerPath(dest, runId), false)
    fs.delete(new Path(RecordWriteSupport.stagingDir(path, queryId)), true)
    OptimisticCommit.markApplied(fs, dest, committed)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = RecordSource.confFrom(confProps)
    val staging = new Path(RecordWriteSupport.stagingDir(path, queryId))
    staging.getFileSystem(conf).delete(staging, true)
  }
}

private[v2] class RecordWriterFactory(schema: StructType, stagingDir: String,
    confProps: Map[String, String],
    clusterBy: Option[String] = None, bloomCols: Seq[String] = Seq.empty,
    bloomBits: Int = BloomSidecar.DefaultBits,
    dataFormat: String = "jsonl",
    rowGroupBytes: Long = org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val ext = if (dataFormat == "parquet") ParquetRecords.Extension else ".jsonl"
    val base = f"$stagingDir/part-$partitionId%05d-$taskId$ext"
    val conf = RecordSource.confFrom(confProps)
    clusterBy match {
      case Some(k) => new ClusteredRecordDataWriter(schema, k, base, conf,
        bloomCols, bloomBits, dataFormat, rowGroupBytes)
      case None if dataFormat == "parquet" =>
        new ParquetRecordDataWriter(schema, base, conf, bloomCols,
          bloomBits, rowGroupBytes)
      case None => new RecordDataWriter(schema, base, conf, bloomCols, bloomBits)
    }
  }
}

/** Serializes one partition's rows as JSONL records. `_record_id` maps to
  * the record id — NULL ids get an auto-generated one (S9's auto-id
  * insert; explicit ids are S10); `_created_time` maps to `createdTime`
  * (omitted when NULL); every other column becomes a `fields` entry,
  * NULLs omitted (sparse records, the wire format's convention — the
  * reader returns NULL for absent fields, so the round trip is exact). */
private[v2] class RecordDataWriter(schema: StructType, stagedFile: String,
    conf: org.apache.hadoop.conf.Configuration,
    bloomCols: Seq[String] = Seq.empty,
    bloomBits: Int = BloomSidecar.DefaultBits)
    extends DataWriter[InternalRow] {

  private val mapper = new ObjectMapper()
  private val p = new org.apache.hadoop.fs.Path(stagedFile)
  private val out = p.getFileSystem(conf).create(p, true)
  private val w = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(out, java.nio.charset.StandardCharsets.UTF_8))
  private var closed = false
  // per-file zone-map stats, committed alongside the file (ZoneMap doc)
  private val zone = new ZoneMap.Collector(schema)
  // per-file point-lookup blooms (BloomSidecar doc); fixed-size bitsets,
  // fed the same values the reader will see
  private val blooms = bloomCols.map(c => new BloomSidecar.Collector(c, bloomBits))
  private val bloomIdx = bloomCols.map(schema.fieldNames.indexOf(_))

  private def isoMicros(micros: Long): String =
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(
      java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L))

  override def write(row: InternalRow): Unit = {
    val root = mapper.createObjectNode()
    val fields = mapper.createObjectNode()
    var id: String = null
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      f.name match {
        case "_record_id" =>
          if (!row.isNullAt(i)) id = row.getUTF8String(i).toString
        case "_created_time" =>
          if (!row.isNullAt(i)) {
            root.put("createdTime", isoMicros(row.getLong(i)))
            zone.observe(i, java.lang.Long.valueOf(row.getLong(i)))
          } else zone.observe(i, null)
        case name if !row.isNullAt(i) =>
          f.dataType match {
            case StringType =>
              val s = row.getUTF8String(i).toString
              fields.put(name, s); zone.observe(i, s)
            case DoubleType =>
              fields.put(name, row.getDouble(i))
              zone.observe(i, java.lang.Double.valueOf(row.getDouble(i)))
            case BooleanType =>
              fields.put(name, row.getBoolean(i))
              zone.observe(i, java.lang.Boolean.valueOf(row.getBoolean(i)))
            case TimestampType =>
              fields.put(name, isoMicros(row.getLong(i)))
              zone.observe(i, java.lang.Long.valueOf(row.getLong(i)))
            case DateType =>
              fields.put(name,
                java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString)
              zone.observe(i, java.lang.Integer.valueOf(row.getInt(i)))
            case ArrayType(StringType, _) =>
              val arr = fields.putArray(name)
              val a = row.getArray(i)
              (0 until a.numElements()).foreach { j =>
                if (a.isNullAt(j)) arr.addNull()
                else arr.add(a.getUTF8String(j).toString)
              }
              zone.observe(i, a) // non-null: counts only, no min/max
            case ArrayType(DoubleType, _) =>
              val arr = fields.putArray(name)
              val a = row.getArray(i)
              (0 until a.numElements()).foreach { j =>
                if (a.isNullAt(j)) arr.addNull()
                else arr.add(a.getDouble(j))
              }
              zone.observe(i, a) // non-null: counts only, no min/max
            case dt => throw new IllegalStateException(
              s"unreachable: $dt passed validateWriteSchema") // defensive
          }
        case _ => zone.observe(i, null) // NULL field: omitted — sparse record
      }
    }
    // auto-id (S9): content-independent, collision-safe across tasks/reruns
    val finalId =
      if (id != null) id
      else "rec" + java.util.UUID.randomUUID().toString.replace("-", "")
    root.put("id", finalId)
    // the id the READER will see (explicit or generated) is what the
    // zone must describe
    val idIdx = schema.fieldNames.indexOf("_record_id")
    if (idIdx >= 0) zone.observe(idIdx, finalId)
    zone.rowDone()
    blooms.zip(bloomIdx).foreach { case (b, i) =>
      if (b.column == "_record_id") b.add(finalId)
      else if (!row.isNullAt(i)) b.add(row.getUTF8String(i).toString)
    }
    root.set("fields", fields)
    w.write(mapper.writeValueAsString(root))
    w.newLine()
  }

  override def commit(): WriterCommitMessage = {
    w.flush(); w.close(); closed = true
    RecordCommitMessage(stagedFile, zone.toJson,
      if (blooms.isEmpty) None else Some(BloomSidecar.render(blooms)))
  }

  override def abort(): Unit = {
    try { if (!closed) { w.close(); closed = true } }
    catch { case _: java.io.IOException => }
    p.getFileSystem(conf).delete(p, false)
  }

  override def close(): Unit =
    if (!closed) { w.close(); closed = true }
}

private[v2] object ClusteredRecordDataWriter {
  /** Per-task open-key cap: each key holds an open stream + zone
    * collector, and the in-task routing table cannot spill. Past it the
    * write FAILS LOUDLY naming the fix (repartition by the cluster
    * column so each task sees few keys) instead of exhausting file
    * handles mid-write. */
  val MaxKeysPerTask = 256
}

/** Routes each row to a per-key staged file, so every committed file is
  * KEY-PURE in the cluster column — its zone sidecar has min == max ==
  * the key, which is what lets the scan report KeyGroupedPartitioning
  * and a same-keyed join skip its exchanges entirely
  * ([[RecordScan.outputPartitioning]]). NULL cluster keys are rejected
  * loudly (a null-keyed file would poison the whole table's clustering
  * claim). Callers should `df.repartition(col(k))` first so each key's
  * rows meet in one task — the writer still commits correctly without
  * it, just with one file per (task, key) instead of per key. */
private[v2] class ClusteredRecordDataWriter(schema: StructType,
    clusterBy: String, stagedBase: String,
    conf: org.apache.hadoop.conf.Configuration,
    bloomCols: Seq[String] = Seq.empty,
    bloomBits: Int = BloomSidecar.DefaultBits,
    dataFormat: String = "jsonl",
    rowGroupBytes: Long = org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong)
    extends DataWriter[InternalRow] {
  private val ki = schema.fieldNames.indexOf(clusterBy)
  require(ki >= 0, s"clusterBy column '$clusterBy' absent from write schema")
  private val ext =
    if (dataFormat == "parquet") ParquetRecords.Extension else ".jsonl"
  private val base = stagedBase.stripSuffix(".jsonl")
    .stripSuffix(ParquetRecords.Extension)
  private val writers =
    scala.collection.mutable.LinkedHashMap.empty[Any, DataWriter[InternalRow]]

  private def keyOf(row: InternalRow): Any = schema.fields(ki).dataType match {
    case StringType => row.getUTF8String(ki).toString
    case DoubleType => row.getDouble(ki)
    case BooleanType => row.getBoolean(ki)
    case TimestampType => row.getLong(ki)
    case DateType => row.getInt(ki)
    case dt => throw new IllegalArgumentException(
      s"clusterBy '$clusterBy': $dt is not a zone-trackable scalar type")
  }

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(ki),
      s"clustered write: NULL in cluster column '$clusterBy' — filter " +
        "nulls out (or write them to a separate unclustered table)")
    val w = writers.getOrElseUpdate(keyOf(row), {
      require(writers.size < ClusteredRecordDataWriter.MaxKeysPerTask,
        s"clustered write exceeded MaxKeysPerTask=" +
          s"${ClusteredRecordDataWriter.MaxKeysPerTask} distinct " +
          s"'$clusterBy' keys in one task — repartition by the cluster " +
          "column first so each task sees few keys")
      val staged = s"$base-k${writers.size}$ext"
      if (dataFormat == "parquet")
        new ParquetRecordDataWriter(schema, staged, conf, bloomCols,
          bloomBits, rowGroupBytes)
      else new RecordDataWriter(schema, staged, conf, bloomCols, bloomBits)
    })
    w.write(row)
  }

  override def commit(): WriterCommitMessage =
    RecordMultiCommitMessage(writers.values.map(_.commit()).map {
      case RecordCommitMessage(f, z, b) => (f, z, b)
      case other => throw new IllegalStateException(s"unexpected: $other")
    }.toSeq)

  override def abort(): Unit = writers.values.foreach(_.abort())
  override def close(): Unit = writers.values.foreach(_.close())
}
