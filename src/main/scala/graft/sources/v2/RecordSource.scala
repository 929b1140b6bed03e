package graft.sources.v2

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
  */
class RecordSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-records"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RecordSource.fullSchema(RecordSource.fieldTypes(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new RecordTable(schema, properties.asScala.toMap)
}

private[v2] object RecordSource {
  /** Rebuild a Hadoop Configuration from captured session properties.
    * Built once per deserialized factory (transient lazy), not per file. */
  def confFrom(props: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  def fieldTypes(options: CaseInsensitiveStringMap): Seq[(String, String)] =
    Option(options.get("fieldTypes")).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map { kv =>
        val Array(n, t) = kv.split(":", 2)
        n.trim -> t.trim
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
    extends Table with SupportsRead {
  override def name(): String = s"graft-records(${props.getOrElse("path", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // capture the session's Hadoop configuration (credentials, fs impls,
    // spark.hadoop.* overrides) as a serializable map for the executors —
    // a bare `new Configuration()` would ignore all session settings
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val confProps = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    new RecordScanBuilder(schema,
      Option(options.get("path")).orElse(props.get("path"))
        .getOrElse(throw new IllegalArgumentException("path option required")),
      confProps)
  }
}

private[v2] class RecordScanBuilder(fullSchema: StructType, path: String,
    confProps: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the source's field order for the pruned subset
    required = StructType(fullSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new RecordScan(required, path, confProps)
}

private[v2] class RecordScan(readSchema: StructType, path: String,
    confProps: Map[String, String])
    extends Scan with Batch {

  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    RecordSource.confFrom(confProps)
  override def readSchema(): StructType = readSchema
  override def description(): String =
    s"RecordScan(path=$path, ReadSchema=${readSchema.simpleString})"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
      else Array(path)
    files.map(f => RecordInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RecordReaderFactory(readSchema, confProps)
}

private[v2] case class RecordInputPartition(file: String) extends InputPartition

private[v2] class RecordReaderFactory(readSchema: StructType,
    confProps: Map[String, String]) extends PartitionReaderFactory {
  @transient private lazy val conf = RecordSource.confFrom(confProps)
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RecordPartitionReader(
      partition.asInstanceOf[RecordInputPartition].file, readSchema, conf)
}

/** Parses one JSONL file of records; emits only the pruned columns.
  * Jackson is the JSON parser already on Spark's classpath. */
private[v2] class RecordPartitionReader(file: String, readSchema: StructType,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val p = new org.apache.hadoop.fs.Path(file)
  private val in = p.getFileSystem(conf).open(p)
  private val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  private var current: InternalRow = _

  override def next(): Boolean = {
    val line = lines.find(_.trim.nonEmpty)
    line match {
      case Some(l) => current = convert(mapper.readTree(l)); true
      case None => false
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()

  private def convert(node: JsonNode): InternalRow = {
    val fields = node.get("fields")
    InternalRow.fromSeq(readSchema.fields.toIndexedSeq.map { f =>
      f.name match {
        case "_record_id" => utf8(node.get("id"))
        case "_created_time" => tsMicros(node.get("createdTime"))
        case name =>
          val v = if (fields == null) null else fields.get(name)
          if (v == null || v.isNull) null else cast(v, f.dataType)
      }
    })
  }

  private def utf8(n: JsonNode): UTF8String =
    if (n == null || n.isNull) null else UTF8String.fromString(n.asText())

  private def tsMicros(n: JsonNode): java.lang.Long =
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
    case _ => UTF8String.fromString(v.toString)
  }
}
