package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.ColumnReader
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.{ConstantColumnVector, OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** VECTORIZED reads for the parquet record tier: decodes whole row
  * groups column-at-a-time through parquet-java's public `ColumnReader`
  * API straight into Spark `OnHeapColumnVector`s and hands the engine
  * `ColumnarBatch`es — no per-row `Group` object tree, and downstream
  * operators run their columnar/whole-stage-codegen paths over the
  * batches. This is the scan inner loop the 100 TB story rides on; the
  * row-materializing [[ParquetRecordPartitionReader]] remains the
  * fallback for shapes the batch path doesn't carry (keyed/clustered
  * partitions, mixed-format directories).
  *
  * ARRAY columns (string and double elements — the embedding payload
  * shape) ride the same path: parquet-java's `ColumnReader` exposes
  * repetition levels, so list columns decode straight into the batch's
  * array vectors — record boundaries are rep-level-0 positions, the
  * value cursor carries across 4096-row chunks within a row group, and
  * null array / empty array / null element distinguish by definition
  * level against the element descriptor (optional- and required-element
  * 3-level list shapes both supported).
  *
  * Everything the row reader guarantees is preserved:
  *  - row-group pruning from footer stats ([[ParquetRecords.blockZone]]
  *    / [[ParquetRecords.blockMayMatch]]), with skipped groups still
  *    advancing the row ordinal so deletion vectors stay exact;
  *  - columnar projection (`setRequestedSchema`) with former wire keys
  *    resolved per file;
  *  - pushed-filter evaluation (the source ACCEPTS pushed filters, so
  *    the reader must apply them) and DV subtraction, via a per-chunk
  *    keep mask: survivors compact into the output vectors, and a
  *    fully-surviving chunk ships the decoded vectors as-is;
  *  - `_file`/`_pos`/`_corrupt` metadata columns (constant, ordinal,
  *    constant-null respectively).
  *
  * An EMPTY projection with no filters (count(*)) never touches pages
  * at all: batch sizes come from footer row counts minus the DV.
  *
  * Reference basis: the reference's Firestore reads are per-document
  * RPCs (lib/FirestoreWrapper.py:60-100); a columnar batch decode is
  * the scan discipline that replaces them at lake scale. */
private[v2] class ParquetColumnarPartitionReader(file: String,
    readSchema: StructType, fullSchema: StructType, conf: Configuration,
    filters: Array[org.apache.spark.sql.sources.Filter],
    dvOverrides: Option[Map[String, Option[String]]] = None,
    former: Map[String, Seq[String]] = Map.empty)
    extends PartitionReader[ColumnarBatch] {

  private val Cap = 4096

  private val p = new Path(file)
  RecordSourceMetrics.filesOpened.incrementAndGet()
  private val fs = p.getFileSystem(conf)
  private val dv: DeletionVector.Vector = (dvOverrides match {
    case Some(m) => m.getOrElse(file, None).map(DeletionVector.parse)
    case None => DeletionVector.load(fs, file)
  }).orNull
  private val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
  private val fileSchema: MessageType =
    reader.getFooter.getFileMetaData.getSchema
  private val createdBy: String =
    reader.getFooter.getFileMetaData.getCreatedBy
  private val blocks = reader.getFooter.getBlocks.asScala.toSeq

  private val requested: MessageType = ParquetRecords.requestedSchema(
    fileSchema, readSchema, filters, former, emptyNeedsDriver = false)
  reader.setRequestedSchema(requested)
  /** No pages needed: footer row counts (minus DV) are the whole read. */
  private val metadataOnly = requested.getFieldCount == 0

  private val compiledFilters = filters.map(RecordFilterEval.compile)

  // ---- column plumbing -------------------------------------------------
  /** One decoded wire column: the logical name it serves, its Spark
    * type, its wire descriptor (None = absent from this file → nulls),
    * and the scratch vector it decodes into. */
  private case class Slot(logical: String, dt: DataType,
      wire: Option[String], vec: WritableColumnVector)

  private def resolveWire(logical: String): Option[String] =
    (ParquetRecords.wireName(logical) +: former.getOrElse(logical, Seq.empty))
      .find(requested.containsField)

  /** The column-chunk path for a wire field: scalars are the field
    * itself; LIST columns descend through the repeated group to the
    * element leaf (names taken from the actual file schema, so any
    * 3-level list spelling works). */
  private def columnPath(w: String): Array[String] = {
    val t = requested.getType(requested.getFieldIndex(w))
    if (t.isPrimitive) Array(w)
    else {
      val rep = t.asGroupType().getFields.get(0)
      if (rep.isPrimitive) Array(w, rep.getName)
      else Array(w, rep.getName, rep.asGroupType().getFields.get(0).getName)
    }
  }

  /** Data columns to decode: the projected fields plus filter-only
    * references (decoded for the keep mask, not shipped). */
  private val dataFields: Seq[StructField] = readSchema.fields.toSeq
    .filterNot(f => f.name == RecordSource.FileCol ||
      f.name == RecordSource.PosCol || f.name == RecordSource.CorruptCol)
  private val filterOnly: Seq[String] = filters.toSeq
    .flatMap(_.references.toSeq).distinct
    .filterNot(n => dataFields.exists(_.name == n))

  private val slots: Seq[Slot] =
    (dataFields.map(f => (f.name, f.dataType)) ++
      filterOnly.map(n => (n, fullSchema(n).dataType))).map {
      case (name, dt) =>
        Slot(name, dt, resolveWire(name), new OnHeapColumnVector(Cap, dt))
    }
  private val slotByName: Map[String, Slot] =
    slots.map(s => s.logical -> s).toMap
  private val fieldSlots: Array[Slot] =
    dataFields.map(f => slotByName(f.name)).toArray

  // output vectors for compacted chunks (allocated lazily — an
  // unfiltered, undeleted scan never needs them)
  private var outVecs: Array[WritableColumnVector] = _
  private def ensureOutVecs(): Unit =
    if (outVecs == null)
      outVecs = dataFields.map(f =>
        new OnHeapColumnVector(Cap, f.dataType): WritableColumnVector).toArray

  // metadata vectors
  private val fileVec: ConstantColumnVector = {
    val v = new ConstantColumnVector(Cap, StringType)
    v.setUtf8String(UTF8String.fromString(file))
    v
  }
  private val corruptVec: ConstantColumnVector = {
    val v = new ConstantColumnVector(Cap, StringType)
    v.setNull()
    v
  }
  private val posVec = new OnHeapColumnVector(Cap, LongType)
  private def nullVecFor(dt: DataType): ConstantColumnVector = {
    val v = new ConstantColumnVector(Cap, dt)
    v.setNull()
    v
  }

  /** The batch's column array in readSchema order — prebuilt once per
    * variant (vectors are REUSED across chunks): `direct` ships the
    * decoded scratch vectors, the compacted variant ships the
    * survivor-copy vectors. */
  private def batchColumns(direct: Boolean): Array[ColumnVector] =
    readSchema.fields.map { f =>
      f.name match {
        case RecordSource.FileCol => fileVec: ColumnVector
        case RecordSource.CorruptCol => corruptVec: ColumnVector
        case RecordSource.PosCol => posVec: ColumnVector
        case n =>
          val s = slotByName(n)
          if (s.wire.isEmpty) nullVecFor(s.dt): ColumnVector
          else if (direct) s.vec: ColumnVector
          else outVecs(dataFields.indexWhere(_.name == n)): ColumnVector
      }
    }
  private lazy val directBatch = new ColumnarBatch(batchColumns(direct = true), 0)
  private lazy val compactBatch = {
    ensureOutVecs()
    new ColumnarBatch(batchColumns(direct = false), 0)
  }

  // ---- row-group iteration --------------------------------------------
  private var rowIndex = 0L // file-wide row ordinal (DV positions)
  private var blockIdx = 0
  private var groupRemaining = 0L
  private var readers: Map[String, ColumnReader] = Map.empty
  private var maxDefs: Map[String, Int] = Map.empty
  // list-column state: def level meaning an empty (but present) array,
  // and the value cursor — record boundaries don't align with the
  // 4096-row chunk grid, so consumption carries across decode() calls
  // within one row group
  private var emptyDefs: Map[String, Int] = Map.empty
  private var chunkTotals: Map[String, Long] = Map.empty
  private val chunkConsumed = scala.collection.mutable.Map.empty[String, Long]
  private var batch: ColumnarBatch = _

  private def advanceBlock(): Boolean = {
    while (blockIdx < blocks.length) {
      val b = blocks(blockIdx)
      blockIdx += 1
      if (filters.nonEmpty &&
          !ParquetRecords.blockMayMatch(filters, former,
            ParquetRecords.blockZone(b))) {
        if (!metadataOnly) reader.skipNextRowGroup()
        RecordSourceMetrics.rowGroupsSkipped.incrementAndGet()
        rowIndex += b.getRowCount
      } else if (metadataOnly) {
        RecordSourceMetrics.rowGroupsRead.incrementAndGet()
        groupRemaining = b.getRowCount
        return true
      } else {
        val pages = reader.readNextRowGroup()
        RecordSourceMetrics.rowGroupsRead.incrementAndGet()
        val store = new ColumnReadStoreImpl(pages,
          new GroupRecordConverter(requested).getRootConverter,
          requested, createdBy)
        val descs = slots.flatMap(s => s.wire.map(w =>
          s.logical -> requested.getColumnDescription(columnPath(w)))).toMap
        readers = descs.map { case (l, d) => l -> store.getColumnReader(d) }
        maxDefs = descs.map { case (l, d) => l -> d.getMaxDefinitionLevel }
        emptyDefs = descs.collect { case (l, d) if d.getPath.length > 1 =>
          // 3-level list: value=maxDef; an OPTIONAL element spends one
          // level on its own nullability (null element = maxDef-1,
          // empty list = maxDef-2); a REQUIRED element has no
          // null-element state (empty list = maxDef-1)
          val elemOptional = d.getPrimitiveType.getRepetition ==
            org.apache.parquet.schema.Type.Repetition.OPTIONAL
          l -> (d.getMaxDefinitionLevel - (if (elemOptional) 2 else 1))
        }
        chunkTotals = readers.map { case (l, cr) => l -> cr.getTotalValueCount }
        chunkConsumed.clear()
        readers.keysIterator.foreach(l => chunkConsumed(l) = 0L)
        groupRemaining = pages.getRowCount
        return true
      }
    }
    false
  }

  /** Decode `n` values of one column into its scratch vector. A column
    * absent from this file (no wire name resolved) ships the constant
    * null vector instead — nothing to decode. */
  private def decode(s: Slot, n: Int): Unit = {
    if (s.wire.isEmpty) return
    val vec = s.vec
    vec.reset()
    val cr = readers(s.logical)
    val maxDef = maxDefs(s.logical)
    var i = 0
    s.dt match {
      case StringType =>
        while (i < n) {
          if (cr.getCurrentDefinitionLevel < maxDef) vec.putNull(i)
          else {
            // no-copy view: putByteArray copies into the vector at once
            val b = cr.getBinary.getBytesUnsafe
            vec.putByteArray(i, b, 0, b.length)
          }
          cr.consume(); i += 1
        }
      case DoubleType =>
        while (i < n) {
          if (cr.getCurrentDefinitionLevel < maxDef) vec.putNull(i)
          else vec.putDouble(i, cr.getDouble)
          cr.consume(); i += 1
        }
      case BooleanType =>
        while (i < n) {
          if (cr.getCurrentDefinitionLevel < maxDef) vec.putNull(i)
          else vec.putBoolean(i, cr.getBoolean)
          cr.consume(); i += 1
        }
      case TimestampType =>
        while (i < n) {
          if (cr.getCurrentDefinitionLevel < maxDef) vec.putNull(i)
          else vec.putLong(i, cr.getLong)
          cr.consume(); i += 1
        }
      case DateType =>
        while (i < n) {
          if (cr.getCurrentDefinitionLevel < maxDef) vec.putNull(i)
          else vec.putInt(i, cr.getInteger)
          cr.consume(); i += 1
        }
      case ArrayType(et, _) =>
        // elements append into the child vector; the parent row is set
        // with an EXPLICIT putArray(row, startOffset, len) — startOffset
        // captured BEFORE the element appends (appendArray would record
        // the post-append child count as the offset, shifting every
        // array one record forward)
        val child = vec.arrayData()
        val total = chunkTotals(s.logical)
        var consumed = chunkConsumed(s.logical)
        val emptyDef = emptyDefs(s.logical)
        while (i < n) {
          val d = cr.getCurrentDefinitionLevel
          if (d < emptyDef) { // the outer optional group is null
            vec.putNull(i)
            cr.consume(); consumed += 1
          } else if (d == emptyDef) { // present but no list entries
            vec.putArray(i, child.getElementsAppended, 0)
            cr.consume(); consumed += 1
          } else {
            val start = child.getElementsAppended
            var len = 0
            var more = true
            while (more) {
              if (cr.getCurrentDefinitionLevel < maxDef) child.appendNull()
              else et match {
                case StringType =>
                  val b = cr.getBinary.getBytesUnsafe
                  child.appendByteArray(b, 0, b.length)
                case DoubleType => child.appendDouble(cr.getDouble)
                case other => throw new IllegalStateException(
                  s"unreachable: array<$other> passed the eligibility gate")
              }
              len += 1
              cr.consume(); consumed += 1
              // next rep-level-0 value starts the next record; guard the
              // probe when the chunk is fully consumed
              more = consumed < total && cr.getCurrentRepetitionLevel != 0
            }
            vec.putArray(i, start, len)
          }
          i += 1
        }
        chunkConsumed(s.logical) = consumed
      case dt => throw new IllegalStateException(
        s"unreachable: $dt passed the columnar eligibility gate")
    }
  }

  // ---- vectorized filter evaluation -------------------------------------
  // Pushed filters are the pushable-gate's shapes (cmp/In/IsNull over
  // atomic columns, And/Or/Not); compile them to PRIMITIVE three-valued
  // row tests over the decoded vectors (-1 false / 0 null-unknown / +1
  // true, keep iff +1) — no per-row boxing, no String materialization
  // (UTF8String compares in place, matching RecordFilterEval's UTF8
  // byte order). A shape the compiler doesn't carry falls back to the
  // boxed RecordFilterEval path for the WHOLE filter set (semantics
  // come first; both paths implement the same algebra).
  private def compileVec(f: org.apache.spark.sql.sources.Filter)
      : Option[Int => Int] = {
    import org.apache.spark.sql.sources._
    def leafCmp(attr: String, lit: Any, test: Int => Boolean)
        : Option[Int => Int] = {
      val s = slotByName.getOrElse(attr, null)
      if (s == null) return None
      if (s.wire.isEmpty) return Some(_ => 0) // column absent: always null
      val vec = s.vec
      s.dt match {
        case StringType =>
          lit match {
            case str: String =>
              val u = UTF8String.fromString(str)
              Some(i => if (vec.isNullAt(i)) 0
                else if (test(vec.getUTF8String(i).compareTo(u))) 1 else -1)
            case _ => None
          }
        case DoubleType =>
          RecordFilterEval.numeric(lit).map { d =>
            val x = d.doubleValue()
            i => if (vec.isNullAt(i)) 0
              else if (test(RecordFilterEval.dblCmp(vec.getDouble(i), x))) 1
              else -1
          }
        case BooleanType =>
          lit match {
            case b: java.lang.Boolean =>
              val x = b.booleanValue()
              Some(i => if (vec.isNullAt(i)) 0
                else if (test(java.lang.Boolean.compare(vec.getBoolean(i), x))) 1
                else -1)
            case _ => None
          }
        case TimestampType =>
          RecordFilterEval.tsMicros(lit).map { m =>
            val x = m.longValue()
            i => if (vec.isNullAt(i)) 0
              else if (test(java.lang.Long.compare(vec.getLong(i), x))) 1
              else -1
          }
        case DateType =>
          RecordFilterEval.epochDays(lit).map { d =>
            val x = d.intValue()
            i => if (vec.isNullAt(i)) 0
              else if (test(java.lang.Integer.compare(vec.getInt(i), x))) 1
              else -1
          }
        case _ => None
      }
    }
    def nullProbe(attr: String, wantNull: Boolean): Option[Int => Int] = {
      val s = slotByName.getOrElse(attr, null)
      if (s == null) return None
      if (s.wire.isEmpty) return Some(_ => if (wantNull) 1 else -1)
      val vec = s.vec
      Some(i => if (vec.isNullAt(i) == wantNull) 1 else -1)
    }
    f match {
      case EqualTo(a, v) => leafCmp(a, v, _ == 0)
      case GreaterThan(a, v) => leafCmp(a, v, _ > 0)
      case GreaterThanOrEqual(a, v) => leafCmp(a, v, _ >= 0)
      case LessThan(a, v) => leafCmp(a, v, _ < 0)
      case LessThanOrEqual(a, v) => leafCmp(a, v, _ <= 0)
      case In(a, vs) =>
        val eqs = vs.toSeq.map(v => leafCmp(a, v, _ == 0))
        if (eqs.exists(_.isEmpty)) None
        else {
          val tests = eqs.map(_.get).toArray
          Some { (i: Int) =>
            var any0 = false
            var hit = false
            var j = 0
            while (j < tests.length && !hit) {
              val t = tests(j)(i)
              if (t > 0) hit = true
              else if (t == 0) any0 = true
              j += 1
            }
            if (hit) 1 else if (any0) 0 else -1
          }
        }
      case IsNull(a) => nullProbe(a, wantNull = true)
      case IsNotNull(a) => nullProbe(a, wantNull = false)
      case Not(inner) => compileVec(inner).map(t => (i: Int) => -t(i))
      case And(l, r) =>
        for (cl <- compileVec(l); cr <- compileVec(r)) yield { (i: Int) =>
          val a = cl(i)
          if (a < 0) -1
          else {
            val b = cr(i)
            if (b < 0) -1 else if (a > 0 && b > 0) 1 else 0
          }
        }
      case Or(l, r) =>
        for (cl <- compileVec(l); cr <- compileVec(r)) yield { (i: Int) =>
          val a = cl(i)
          if (a > 0) 1
          else {
            val b = cr(i)
            if (b > 0) 1 else if (a < 0 && b < 0) -1 else 0
          }
        }
      case _ => None
    }
  }

  /** All-or-nothing vectorized compile of the pushed filter set. */
  private val vecFilters: Option[Array[Int => Int]] = {
    val compiled = filters.map(compileVec)
    if (compiled.forall(_.isDefined)) Some(compiled.map(_.get))
    else None
  }

  /** The row reader's raw-value contract for filter eval, read from the
    * decoded scratch vectors. */
  private def rawAt(name: String, i: Int): Any = {
    val s = slotByName(name)
    if (s.wire.isEmpty || s.vec.isNullAt(i)) null
    else s.dt match {
      case StringType => s.vec.getUTF8String(i).toString
      case DoubleType => java.lang.Double.valueOf(s.vec.getDouble(i))
      case BooleanType => java.lang.Boolean.valueOf(s.vec.getBoolean(i))
      case TimestampType => java.lang.Long.valueOf(s.vec.getLong(i))
      case DateType => java.lang.Integer.valueOf(s.vec.getInt(i))
      case _ => null
    }
  }

  private def copyRow(src: WritableColumnVector, dt: DataType,
      dst: WritableColumnVector, si: Int, di: Int): Unit = dt match {
    // array columns copy append-style: the dst's element counter tracks
    // child offsets, and survivors are copied in order so the appended
    // row index always equals `di`
    case ArrayType(et, _) =>
      if (src.isNullAt(si)) dst.putNull(di)
      else {
        val a = src.getArray(si)
        val m = a.numElements()
        val child = dst.arrayData()
        val start = child.getElementsAppended
        var k = 0
        while (k < m) {
          if (a.isNullAt(k)) child.appendNull()
          else et match {
            case StringType =>
              val b = a.getUTF8String(k).getBytes
              child.appendByteArray(b, 0, b.length)
            case DoubleType => child.appendDouble(a.getDouble(k))
            case other => throw new IllegalStateException(
              s"unreachable: array<$other>")
          }
          k += 1
        }
        dst.putArray(di, start, m)
      }
    case _ if src.isNullAt(si) => dst.putNull(di)
    case StringType =>
      val u = src.getUTF8String(si)
      val b = u.getBytes
      dst.putByteArray(di, b, 0, b.length)
    case DoubleType => dst.putDouble(di, src.getDouble(si))
    case BooleanType => dst.putBoolean(di, src.getBoolean(si))
    case TimestampType => dst.putLong(di, src.getLong(si))
    case DateType => dst.putInt(di, src.getInt(si))
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  private val keep = new Array[Boolean](Cap)

  override def next(): Boolean = {
    while (true) {
      if (groupRemaining <= 0 && !advanceBlock()) return false
      val n = math.min(Cap.toLong, groupRemaining).toInt
      val basePos = rowIndex
      groupRemaining -= n
      rowIndex += n

      if (!metadataOnly) slots.foreach(decode(_, n))

      // keep mask: DV subtraction + pushed-filter evaluation
      var kept = n
      if (dv != null || compiledFilters.nonEmpty) {
        kept = 0
        val vf = vecFilters.orNull
        var i = 0
        while (i < n) {
          var k = dv == null || !dv.contains(basePos + i)
          if (k && filters.nonEmpty) {
            if (vf != null) {
              var j = 0
              while (k && j < vf.length) {
                k = vf(j)(i) > 0
                j += 1
              }
            } else {
              val lookup: String => Any = rawAt(_, i)
              k = compiledFilters.forall(p => p(lookup).contains(true))
            }
          }
          keep(i) = k
          if (k) kept += 1
          i += 1
        }
      }
      if (kept == 0) {
        // whole chunk filtered/deleted: fall through to the next one
      } else if (kept == n) {
        // fast path: ship the decoded vectors directly
        posVec.reset()
        var i = 0
        while (i < n) { posVec.putLong(i, basePos + i); i += 1 }
        directBatch.setNumRows(n)
        batch = directBatch
        return true
      } else {
        val cb = compactBatch // forces outVecs allocation
        outVecs.foreach(_.reset())
        posVec.reset()
        var i = 0
        var o = 0
        while (i < n) {
          if (keep(i)) {
            var c = 0
            while (c < fieldSlots.length) {
              val s = fieldSlots(c)
              if (s.wire.nonEmpty) copyRow(s.vec, s.dt, outVecs(c), i, o)
              c += 1
            }
            posVec.putLong(o, basePos + i)
            o += 1
          }
          i += 1
        }
        cb.setNumRows(kept)
        batch = cb
        return true
      }
    }
    false // unreachable
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    reader.close()
    (slots.map(_.vec) ++ Option(outVecs).toSeq.flatten :+ posVec)
      .foreach(_.close())
  }
}
