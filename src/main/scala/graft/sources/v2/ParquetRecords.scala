package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetWriter}
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Columnar data files for the record lake: the `dataFormat=parquet`
  * table option swaps the line-oriented JSONL wire format for parquet
  * under the SAME sidecar discipline — zone maps, blooms, deletion
  * vectors (positions = row ordinals instead of line ordinals),
  * snapshots, the optimistic commit log, and the staged two-phase
  * commit are all format-agnostic because they key on file names and
  * row positions. What parquet adds is the 100 TB scan path: row-group
  * pruning from footer statistics (the same [[ZoneMap.mayMatch]]
  * semantics evaluated per row group — one pruning algebra, two stats
  * sources) and columnar storage. Readers dispatch PER FILE by
  * extension, so a table can hold both formats mid-migration.
  *
  * Uses the parquet-java library already on Spark's classpath (the
  * Group example API — deliberately independent of Spark's internal
  * vectorized reader, which is not a public surface). */
private[graft] object ParquetRecords {

  val Extension = ".parquet"

  /** User column names the parquet wire schema reserves: `_record_id`
    * serializes as `id` and `_created_time` as `createdTime`, so a USER
    * field with either literal name would alias the record-id/created
    * column in the flat wire namespace — the reader's wireName mapping
    * and footer-stats zones would silently resolve it to the wrong
    * column (the JSONL tier is immune: user fields nest under
    * `fields.*`). Refused loudly at write planning. */
  def validateUserNames(schema: StructType): Unit =
    schema.fieldNames.filter(n => n == "id" || n == "createdTime")
      .foreach { n =>
        throw new IllegalArgumentException(
          s"graft-records parquet tier: user column '$n' collides with " +
            "the reserved wire name for " +
            s"${if (n == "id") "_record_id" else "_created_time"} — " +
            "rename the column before writing with dataFormat=parquet " +
            "(the JSONL tier accepts it; a silent parquet migration " +
            "would change its meaning)")
      }

  /** The parquet schema for a record table: `id` + optional
    * `createdTime` + one optional column per user field. Wire names are
    * the COLUMN names (renames never rewrite files — the reader falls
    * back through former keys, as in JSONL). */
  def messageType(schema: StructType): MessageType = {
    validateUserNames(schema)
    var b = Types.buildMessage()
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("id")
    schema.fields.foreach { f =>
      f.name match {
        case "_record_id" => ()
        case "_created_time" =>
          b = b.optional(INT64).as(LogicalTypeAnnotation.timestampType(
            true, LogicalTypeAnnotation.TimeUnit.MICROS)).named("createdTime")
        case n => f.dataType match {
          case StringType =>
            b = b.optional(BINARY)
              .as(LogicalTypeAnnotation.stringType()).named(n)
          case DoubleType => b = b.optional(DOUBLE).named(n)
          case BooleanType => b = b.optional(BOOLEAN).named(n)
          case TimestampType =>
            b = b.optional(INT64).as(LogicalTypeAnnotation.timestampType(
              true, LogicalTypeAnnotation.TimeUnit.MICROS)).named(n)
          case DateType =>
            b = b.optional(INT32)
              .as(LogicalTypeAnnotation.dateType()).named(n)
          case ArrayType(StringType, _) =>
            b = b.optionalGroup().as(LogicalTypeAnnotation.listType())
              .repeatedGroup()
              .optional(BINARY).as(LogicalTypeAnnotation.stringType())
              .named("element")
              .named("list")
              .named(n)
          case ArrayType(DoubleType, _) => // embedding-shaped payloads
            b = b.optionalGroup().as(LogicalTypeAnnotation.listType())
              .repeatedGroup()
              .optional(DOUBLE)
              .named("element")
              .named("list")
              .named(n)
          case dt => throw new IllegalArgumentException(
            s"graft-records parquet tier cannot store '$n': $dt")
        }
      }
    }
    b.named("record")
  }

  /** Wire column name for a schema field. */
  def wireName(field: String): String = field match {
    case "_record_id" => "id"
    case "_created_time" => "createdTime"
    case n => n
  }
  def logicalName(wire: String): String = wire match {
    case "id" => "_record_id"
    case "createdTime" => "_created_time"
    case n => n
  }

  /** Copy a parquet file dropping the DV-marked row ordinals — the
    * materialize rewrite for the columnar tier (schema comes from the
    * source footer; groups copy verbatim). */
  def rewriteWithoutDeleted(conf: Configuration, src: Path, staged: Path,
      dv: DeletionVector.Vector): Unit = {
    val in = ParquetFileReader.open(HadoopInputFile.fromPath(src, conf))
    try {
      val schema = in.getFooter.getFileMetaData.getSchema
      val w = writerFor(conf, staged, schema, ParquetWriter.DEFAULT_BLOCK_SIZE)
      try {
        var pos = 0L
        var pages = in.readNextRowGroup()
        while (pages != null) {
          val io = new ColumnIOFactory().getColumnIO(schema)
          val rr = io.getRecordReader(pages, new GroupRecordConverter(schema))
          (0L until pages.getRowCount).foreach { _ =>
            val g = rr.read()
            if (!dv.contains(pos)) w.write(g)
            pos += 1
          }
          pages = in.readNextRowGroup()
        }
      } finally w.close()
    } finally in.close()
  }

  /** The footer schema's signature — compaction merges only files whose
    * schemas are IDENTICAL (schema evolution means a table's parquet
    * files can differ; cross-schema merge would need column fill-in). */
  def schemaSignature(conf: Configuration, file: Path): String = {
    val in = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try in.getFooter.getFileMetaData.getSchema.toString finally in.close()
  }

  /** Rewrite-merge `srcs` (identical schemas) into one staged parquet
    * file — the columnar tier's compaction (byte concat is a JSONL
    * property; parquet merges by row copy through the Group API). */
  def mergeFiles(conf: Configuration, srcs: Seq[Path], staged: Path): Unit = {
    require(srcs.nonEmpty, "empty merge group")
    val schema = {
      val in = ParquetFileReader.open(HadoopInputFile.fromPath(srcs.head, conf))
      try in.getFooter.getFileMetaData.getSchema finally in.close()
    }
    val w = writerFor(conf, staged, schema, ParquetWriter.DEFAULT_BLOCK_SIZE)
    try srcs.foreach { src =>
      val in = ParquetFileReader.open(HadoopInputFile.fromPath(src, conf))
      try {
        var pages = in.readNextRowGroup()
        while (pages != null) {
          val io = new ColumnIOFactory().getColumnIO(schema)
          val rr = io.getRecordReader(pages, new GroupRecordConverter(schema))
          (0L until pages.getRowCount).foreach(_ => w.write(rr.read()))
          pages = in.readNextRowGroup()
        }
      } finally in.close()
    } finally w.close()
  }

  /** The pruned wire schema a scan requests from a file: the projected
    * and filtered logical columns resolved to wire names (with former
    * keys falling back per file). An all-metadata projection (count(*))
    * still needs one column to drive row iteration in the ROW reader —
    * `id` is the narrowest always-present one; the COLUMNAR reader
    * special-cases the empty projection to pure footer metadata. */
  def requestedSchema(fileSchema: MessageType, readSchema: StructType,
      filters: Array[org.apache.spark.sql.sources.Filter],
      former: Map[String, Seq[String]],
      emptyNeedsDriver: Boolean): MessageType = {
    val needed = (readSchema.fieldNames.toSeq ++
      filters.toSeq.flatMap(_.references.toSeq))
      .distinct.filterNot(n => n == RecordSource.FileCol ||
        n == RecordSource.PosCol || n == RecordSource.CorruptCol)
    val wires = needed.flatMap { n =>
      (wireName(n) +: former.getOrElse(n, Seq.empty))
        .filter(fileSchema.containsField)
    }.distinct
    val keep =
      if (wires.isEmpty && emptyNeedsDriver)
        Seq("id").filter(fileSchema.containsField)
      else wires
    new MessageType("record",
      keep.map(w => fileSchema.getFields.get(fileSchema.getFieldIndex(w)))
        .asJava)
  }

  /** Row-group footer stats as a [[ZoneMap.FileZone]] — the same
    * pruning algebra the record sidecars use, fed from parquet's
    * per-block min/max/nullCount. */
  def blockZone(b: org.apache.parquet.hadoop.metadata.BlockMetaData)
      : ZoneMap.FileZone = {
    val fields = b.getColumns.asScala.flatMap { cc =>
      if (cc.getPath.size != 1) None
      else {
        val wire = cc.getPath.iterator().next()
        val st = cc.getStatistics
        if (st == null || !st.isNumNullsSet) None
        else if (!st.hasNonNullValue) {
          if (st.getNumNulls == b.getRowCount)
            Some(logicalName(wire) ->
              ZoneMap.FieldStats(null, null, b.getRowCount))
          else None
        } else {
          val tn = cc.getPrimitiveType.getPrimitiveTypeName
          val conv: Any => Any = tn match {
            case BINARY => v =>
              v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
            // -0.0 normalized on adoption so the zone bound sorts exactly
            // like dblCmp (Spark's -0.0 == 0.0)
            case DOUBLE => v => java.lang.Double.valueOf(
              v.asInstanceOf[java.lang.Double].doubleValue + 0.0d)
            case BOOLEAN => identity
            case INT64 => identity
            case INT32 => identity
            case _ => null
          }
          // parquet-java folds double stats with Math.min/Math.max, so a
          // single NaN row poisons BOTH bounds to NaN — under Spark's
          // NaN-greatest order a NaN min is a lie (the true min is the
          // smallest non-NaN value) and pruning on it would drop live
          // blocks. No stats for the field → the block is kept.
          def nanPoisoned: Boolean = tn == DOUBLE && {
            val mn = st.genericGetMin().asInstanceOf[java.lang.Double]
            val mx = st.genericGetMax().asInstanceOf[java.lang.Double]
            mn.isNaN || mx.isNaN
          }
          if (conv == null || nanPoisoned) None
          else Some(logicalName(wire) -> ZoneMap.FieldStats(
            conv(st.genericGetMin()), conv(st.genericGetMax()),
            st.getNumNulls))
        }
      }
    }.toMap
    ZoneMap.FileZone(b.getRowCount, fields)
  }

  /** A block is skippable only on filters whose EVERY referenced column
    * has stats in the block zone (directly or via a former key) —
    * unknown columns must keep the block (footer stats, unlike record
    * sidecars, say nothing about absent columns). */
  def blockMayMatch(filters: Array[org.apache.spark.sql.sources.Filter],
      former: Map[String, Seq[String]], z: ZoneMap.FileZone): Boolean =
    filters.forall { f =>
      val decidable = f.references.forall(c =>
        z.fields.contains(c) ||
          former.getOrElse(c, Seq.empty).exists(z.fields.contains))
      !decidable || ZoneMap.mayMatch(f, z, former)
    }

  def writerFor(conf: Configuration, path: Path, schema: MessageType,
      rowGroupBytes: Long): ParquetWriter[Group] = {
    GroupWriteSupport.setSchema(schema, conf)
    ExampleParquetWriter.builder(HadoopOutputFile.fromPath(path, conf))
      .withConf(conf)
      .withType(schema)
      .withRowGroupSize(rowGroupBytes)
      // tests shrink row groups to exercise pruning — pages must fit
      .withPageSize(math.max(64,
        math.min(rowGroupBytes, ParquetWriter.DEFAULT_PAGE_SIZE.toLong)).toInt)
      .build()
  }
}

/** Serializes one partition's rows as a parquet record file — the
  * columnar twin of [[RecordDataWriter]]: same zone/bloom collectors,
  * same auto-id, same commit message (sidecars ride the commit). */
private[v2] class ParquetRecordDataWriter(schema: StructType,
    stagedFile: String, conf: Configuration,
    bloomCols: Seq[String] = Seq.empty,
    bloomBits: Int = BloomSidecar.DefaultBits,
    rowGroupBytes: Long = ParquetWriter.DEFAULT_BLOCK_SIZE.toLong)
    extends DataWriter[InternalRow] {

  private val p = new Path(stagedFile)
  private val message = ParquetRecords.messageType(schema)
  private val writer =
    ParquetRecords.writerFor(new Configuration(conf), p, message, rowGroupBytes)
  private val factory = new SimpleGroupFactory(message)
  private val zone = new ZoneMap.Collector(schema)
  private val blooms = bloomCols.map(c => new BloomSidecar.Collector(c, bloomBits))
  private val bloomIdx = bloomCols.map(schema.fieldNames.indexOf(_))

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var id: String = null
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      f.name match {
        case "_record_id" =>
          if (!row.isNullAt(i)) id = row.getUTF8String(i).toString
        case "_created_time" =>
          if (!row.isNullAt(i)) {
            g.add("createdTime", row.getLong(i))
            zone.observe(i, java.lang.Long.valueOf(row.getLong(i)))
          } else zone.observe(i, null)
        case name if !row.isNullAt(i) =>
          f.dataType match {
            case StringType =>
              val s = row.getUTF8String(i).toString
              g.add(name, s); zone.observe(i, s)
            case DoubleType =>
              g.add(name, row.getDouble(i))
              zone.observe(i, java.lang.Double.valueOf(row.getDouble(i)))
            case BooleanType =>
              g.add(name, row.getBoolean(i))
              zone.observe(i, java.lang.Boolean.valueOf(row.getBoolean(i)))
            case TimestampType =>
              g.add(name, row.getLong(i))
              zone.observe(i, java.lang.Long.valueOf(row.getLong(i)))
            case DateType =>
              g.add(name, row.getInt(i))
              zone.observe(i, java.lang.Integer.valueOf(row.getInt(i)))
            case ArrayType(StringType, _) =>
              val lg = g.addGroup(name)
              val a = row.getArray(i)
              (0 until a.numElements()).foreach { j =>
                val e = lg.addGroup("list")
                if (!a.isNullAt(j))
                  e.add("element", a.getUTF8String(j).toString)
              }
              zone.observe(i, a)
            case ArrayType(DoubleType, _) =>
              val lg = g.addGroup(name)
              val a = row.getArray(i)
              (0 until a.numElements()).foreach { j =>
                val e = lg.addGroup("list")
                if (!a.isNullAt(j)) e.add("element", a.getDouble(j))
              }
              zone.observe(i, a)
            case dt => throw new IllegalStateException(
              s"unreachable: $dt passed validateWriteSchema")
          }
        case _ => zone.observe(i, null)
      }
    }
    val finalId =
      if (id != null) id
      else "rec" + java.util.UUID.randomUUID().toString.replace("-", "")
    g.add("id", finalId)
    val idIdx = schema.fieldNames.indexOf("_record_id")
    if (idIdx >= 0) zone.observe(idIdx, finalId)
    zone.rowDone()
    blooms.zip(bloomIdx).foreach { case (b, i) =>
      if (b.column == "_record_id") b.add(finalId)
      else if (!row.isNullAt(i)) b.add(row.getUTF8String(i).toString)
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    RecordCommitMessage(stagedFile, zone.toJson,
      if (blooms.isEmpty) None else Some(BloomSidecar.render(blooms)))
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    p.getFileSystem(conf).delete(p, false)
  }

  override def close(): Unit =
    try writer.close() catch { case _: Exception => () }
}

/** Reads one parquet record file: row-group pruning from footer
  * statistics (the [[ZoneMap.mayMatch]] algebra over per-group
  * min/max/nullCount — a skipped group's rows still advance the row
  * ordinal, so deletion vectors stay exact), then per-row pushed-filter
  * evaluation and DV subtraction. Renamed columns resolve through
  * `former` wire keys, as in the JSONL reader. */
private[v2] class ParquetRecordPartitionReader(file: String,
    readSchema: StructType, fullSchema: StructType, conf: Configuration,
    filters: Array[org.apache.spark.sql.sources.Filter],
    mode: String = "FAILFAST",
    dvOverrides: Option[Map[String, Option[String]]] = None,
    former: Map[String, Seq[String]] = Map.empty)
    extends PartitionReader[InternalRow] {

  private val p = new Path(file)
  RecordSourceMetrics.filesOpened.incrementAndGet()
  private val fs = p.getFileSystem(conf)
  private val dv: Option[DeletionVector.Vector] = dvOverrides match {
    case Some(m) => m.getOrElse(file, None).map(DeletionVector.parse)
    case None => DeletionVector.load(fs, file)
  }
  private val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
  private val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema
  private val blocks = reader.getFooter.getBlocks.asScala.toSeq

  /** COLUMNAR projection — the point of the parquet tier: only the
    * pages of columns the query projects OR filters are read
    * (`setRequestedSchema`), with former wire keys resolved per file. */
  private val requested: MessageType = ParquetRecords.requestedSchema(
    fileSchema, readSchema, filters, former, emptyNeedsDriver = true)
  reader.setRequestedSchema(requested)

  private val compiledFilters = filters.map(RecordFilterEval.compile)

  private def blockMayMatch(z: ZoneMap.FileZone): Boolean =
    ParquetRecords.blockMayMatch(filters, former, z)

  // --- iteration ------------------------------------------------------
  private var rowIndex = 0L
  private var blockIdx = 0
  private var groupReader: org.apache.parquet.io.RecordReader[Group] = _
  private var groupRemaining = 0L
  private var current: InternalRow = _

  private def advanceBlock(): Boolean = {
    while (blockIdx < blocks.length) {
      val b = blocks(blockIdx)
      blockIdx += 1
      if (filters.nonEmpty && !blockMayMatch(ParquetRecords.blockZone(b))) {
        reader.skipNextRowGroup()
        RecordSourceMetrics.rowGroupsSkipped.incrementAndGet()
        rowIndex += b.getRowCount
      } else {
        val pages = reader.readNextRowGroup()
        RecordSourceMetrics.rowGroupsRead.incrementAndGet()
        val io = new ColumnIOFactory().getColumnIO(requested)
        groupReader = io.getRecordReader(pages, new GroupRecordConverter(requested))
        groupRemaining = pages.getRowCount
        return true
      }
    }
    false
  }

  override def next(): Boolean = {
    while (true) {
      if (groupRemaining <= 0 && !advanceBlock()) return false
      while (groupRemaining > 0) {
        val g = groupReader.read()
        val pos = rowIndex
        rowIndex += 1
        groupRemaining -= 1
        if (!dv.exists(_.contains(pos)) && passes(g)) {
          current = convert(g, pos)
          return true
        }
      }
    }
    false // unreachable
  }

  private def fieldIndex(gt: GroupType, logical: String): Int = {
    val wire = ParquetRecords.wireName(logical)
    if (gt.containsField(wire)) gt.getFieldIndex(wire)
    else former.getOrElse(logical, Seq.empty).find(gt.containsField)
      .map(gt.getFieldIndex).getOrElse(-1)
  }

  /** Comparable raw value (the RecordFilterEval contract: String /
    * Double / Boolean / Long micros / Int days). */
  private def rawValue(g: Group, logical: String, dt: DataType): Any = {
    val idx = fieldIndex(requested, logical)
    if (idx < 0 || g.getFieldRepetitionCount(idx) == 0) null
    else dt match {
      case StringType => g.getBinary(idx, 0).toStringUsingUTF8
      case DoubleType => java.lang.Double.valueOf(g.getDouble(idx, 0))
      case BooleanType => java.lang.Boolean.valueOf(g.getBoolean(idx, 0))
      case TimestampType => java.lang.Long.valueOf(g.getLong(idx, 0))
      case DateType => java.lang.Integer.valueOf(g.getInteger(idx, 0))
      case _ => g.getValueToString(idx, 0)
    }
  }

  private def passes(g: Group): Boolean =
    compiledFilters.forall(p => p(name =>
      rawValue(g, name, fullSchema(name).dataType)).contains(true))

  private def convert(g: Group, pos: Long): InternalRow =
    InternalRow.fromSeq(readSchema.fields.toIndexedSeq.map { f =>
      f.name match {
        case RecordSource.FileCol => UTF8String.fromString(file)
        case RecordSource.PosCol => pos: Any
        case RecordSource.CorruptCol => null // parquet rows cannot half-parse
        case name =>
          val idx = fieldIndex(requested, name)
          if (idx < 0 || g.getFieldRepetitionCount(idx) == 0) null
          else f.dataType match {
            case StringType =>
              UTF8String.fromString(g.getBinary(idx, 0).toStringUsingUTF8)
            case DoubleType => g.getDouble(idx, 0)
            case BooleanType => g.getBoolean(idx, 0)
            case TimestampType => g.getLong(idx, 0)
            case DateType => g.getInteger(idx, 0)
            case ArrayType(StringType, _) =>
              val lg = g.getGroup(idx, 0)
              val n = lg.getFieldRepetitionCount("list")
              val elems = (0 until n).map { k =>
                val e = lg.getGroup("list", k)
                if (e.getFieldRepetitionCount("element") == 0) null
                else UTF8String.fromString(
                  e.getBinary("element", 0).toStringUsingUTF8): Any
              }.toArray
              new GenericArrayData(elems): ArrayData
            case ArrayType(DoubleType, _) =>
              val lg = g.getGroup(idx, 0)
              val n = lg.getFieldRepetitionCount("list")
              val elems = (0 until n).map { k =>
                val e = lg.getGroup("list", k)
                if (e.getFieldRepetitionCount("element") == 0) null
                else java.lang.Double.valueOf(e.getDouble("element", 0)): Any
              }.toArray
              new GenericArrayData(elems): ArrayData
            case _ => UTF8String.fromString(g.getValueToString(idx, 0))
          }
      }
    })

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
