package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Aggregate pushdown for the parquet record tier — the capability the
  * JSONL tier has had since the pushdown landed, now symmetric:
  *
  *  - STATS FAST PATH: a GLOBAL aggregate (no group columns) over a
  *    file with no pushed filters and no deletion vector answers
  *    entirely from the FOOTER — `count(*)` from row counts,
  *    `count(col)` from `rowCount − numNulls`, `min/max(col)` from
  *    row-group statistics — ZERO pages read. Binary (string) min/max
  *    stays OFF this path: parquet may truncate binary statistics
  *    (safe for pruning, where a truncated max is still an upper
  *    bound, but NOT exact), so string extrema take the decode path.
  *  - DECODE FALLBACK: everything else (grouped aggregates, pushed
  *    filters, DV-carrying files, string extrema) folds the ordinary
  *    row reader's output into per-group partial buffers — the same
  *    shapes and [[RecordScanBuilder.MaxPushedGroups]] bound as the
  *    JSONL reader, so mixed-format directories merge partials
  *    uniformly.
  *
  * Either way the emission is PARTIAL (one row per group per
  * partition); Spark runs the final merge. At 100 TB the fast path is
  * the point: `SELECT count(*), max(ts) FROM lake` is a metadata
  * operation, not a scan. */
private[v2] class ParquetAggPartitionReader(file: String,
    aggSchema: StructType, fullSchema: StructType, conf: Configuration,
    filters: Array[org.apache.spark.sql.sources.Filter],
    spec: PushedAggSpec, mode: String,
    dvOverrides: Option[Map[String, Option[String]]] = None,
    former: Map[String, Seq[String]] = Map.empty)
    extends PartitionReader[InternalRow] {

  private val p = new Path(file)
  private val fs = p.getFileSystem(conf)
  private val dv: Option[DeletionVector.Vector] = dvOverrides match {
    case Some(m) => m.getOrElse(file, None).map(DeletionVector.parse)
    case None => DeletionVector.load(fs, file)
  }

  private def statsEligible: Boolean =
    filters.isEmpty && spec.groupCols.isEmpty && dv.isEmpty &&
      spec.aggs.forall {
        case PushedAggCol("count_star", _) => true
        case PushedAggCol("count", _) => true
        case PushedAggCol("sum", _) => false // footers carry no sums
        case PushedAggCol(_, f) => fullSchema(f).dataType match {
          case DoubleType | BooleanType | TimestampType | DateType => true
          case _ => false // strings: truncatable binary stats
        }
      }

  /** One partial row from footer metadata alone, or None when any block
    * lacks the statistics an aggregate needs (then the decode path
    * answers — correctness never rides on optional stats). */
  private def statsFold(): Option[InternalRow] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      def wireOf(logical: String): Option[String] =
        (ParquetRecords.wireName(logical) +:
          former.getOrElse(logical, Seq.empty)).find(schema.containsField)
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val acc = new Array[Any](spec.aggs.length)
      spec.aggs.zipWithIndex.foreach {
        case (PushedAggCol("count_star" | "count", _), i) => acc(i) = 0L
        case (_, i) => acc(i) = null
      }
      for (b <- blocks) {
        val byWire = b.getColumns.asScala
          .filter(_.getPath.size == 1)
          .map(cc => cc.getPath.iterator().next() -> cc).toMap
        for ((ac, i) <- spec.aggs.zipWithIndex) ac match {
          case PushedAggCol("count_star", _) =>
            acc(i) = acc(i).asInstanceOf[Long] + b.getRowCount
          case PushedAggCol("count", f) =>
            wireOf(f).flatMap(byWire.get) match {
              case None => () // column absent from this file: all null
              case Some(cc) =>
                val st = cc.getStatistics
                if (st == null || !st.isNumNullsSet) return None
                acc(i) = acc(i).asInstanceOf[Long] +
                  (b.getRowCount - st.getNumNulls)
            }
          case PushedAggCol(op, f) =>
            wireOf(f).flatMap(byWire.get) match {
              case None => () // absent column contributes nothing
              case Some(cc) =>
                val st = cc.getStatistics
                if (st == null || !st.isNumNullsSet) return None
                if (st.getNumNulls == b.getRowCount) () // all-null block
                else if (!st.hasNonNullValue) return None
                else {
                  val v: Any = cc.getPrimitiveType.getPrimitiveTypeName match {
                    case DOUBLE =>
                      // parquet-java folds double stats via Math.min/max:
                      // one NaN row poisons both bounds to NaN, but under
                      // Spark's NaN-greatest order the true min is the
                      // smallest NON-NaN value — a NaN bound is not an
                      // answer, so the decode path must answer. -0.0 is
                      // normalized on adoption (Spark: -0.0 == 0.0),
                      // matching dblCmp's comparison-side trick.
                      val mn = st.genericGetMin.asInstanceOf[java.lang.Double]
                      val mx = st.genericGetMax.asInstanceOf[java.lang.Double]
                      if (mn.isNaN || mx.isNaN) return None
                      java.lang.Double.valueOf(
                        (if (op == "min") mn.doubleValue else mx.doubleValue)
                          + 0.0d)
                    case BOOLEAN =>
                      (if (op == "min") st.genericGetMin else st.genericGetMax)
                        .asInstanceOf[java.lang.Boolean]
                    case INT64 =>
                      (if (op == "min") st.genericGetMin else st.genericGetMax)
                        .asInstanceOf[java.lang.Long]
                    case INT32 =>
                      (if (op == "min") st.genericGetMin else st.genericGetMax)
                        .asInstanceOf[java.lang.Integer]
                    case _ => return None
                  }
                  val better = acc(i) == null ||
                    (if (op == "min") cmpAny(v, acc(i)) < 0
                     else cmpAny(v, acc(i)) > 0)
                  if (better) acc(i) = v
                }
            }
        }
      }
      Some(InternalRow.fromSeq(acc.toIndexedSeq))
    } finally reader.close()
  }

  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Double, y: java.lang.Double) =>
      RecordFilterEval.dblCmp(x, y)
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
    case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
    case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case _ => throw new IllegalStateException(
      s"incomparable agg partials: ${a.getClass} vs ${b.getClass}")
  }

  /** Decode fallback: fold the ordinary row reader's output (filters +
    * DV already applied there) into per-group partial buffers. */
  private def decodeFold(): Iterator[InternalRow] = {
    val needed = (spec.groupCols ++
      spec.aggs.collect { case PushedAggCol(op, f) if op != "count_star" => f })
      .distinct
    val innerSchema = StructType(needed.map(n => fullSchema(n)))
    val inner = new ParquetRecordPartitionReader(file, innerSchema,
      fullSchema, conf, filters, mode, dvOverrides, former)
    val idxOf = needed.zipWithIndex.toMap
    val dtOf = needed.map(n => n -> fullSchema(n).dataType).toMap
    def valueAt(row: InternalRow, n: String): Any = {
      val i = idxOf(n)
      if (row.isNullAt(i)) null
      else dtOf(n) match {
        case StringType => row.getUTF8String(i)
        case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
        case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
        case TimestampType => java.lang.Long.valueOf(row.getLong(i))
        case DateType => java.lang.Integer.valueOf(row.getInt(i))
        case dt => throw new IllegalStateException(s"unreachable: $dt")
      }
    }
    val buf = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Array[Any]]
    def newBuffer(): Array[Any] = spec.aggs.map {
      case PushedAggCol("count_star", _) | PushedAggCol("count", _) => 0L: Any
      case _ => null: Any
    }.toArray
    if (spec.groupCols.isEmpty) buf(Seq.empty) = newBuffer()
    try {
      while (inner.next()) {
        val row = inner.get()
        val key = spec.groupCols.map(valueAt(row, _))
        val st = buf.getOrElseUpdate(key, {
          if (buf.size >= RecordScanBuilder.MaxPushedGroups)
            throw new IllegalStateException(
              "graft-records aggregate pushdown exceeded MaxPushedGroups=" +
                s"${RecordScanBuilder.MaxPushedGroups} distinct keys for " +
                s"group columns ${spec.groupCols.mkString("(", ", ", ")")} " +
                "in one partition — the in-reader hash table cannot " +
                "spill. Group on a bounded-cardinality column, or keep " +
                "the aggregation in Spark")
          newBuffer()
        })
        spec.aggs.zipWithIndex.foreach { case (ac, i) =>
          ac.op match {
            case "count_star" => st(i) = st(i).asInstanceOf[Long] + 1L
            case "count" =>
              if (valueAt(row, ac.field) != null)
                st(i) = st(i).asInstanceOf[Long] + 1L
            case "sum" => // reached only by a parquet file landing in a
              // directory whose PLANNING saw none (the push gate refuses
              // sums when parquet is present) — fold it anyway so the
              // mixed-directory race stays correct
              val v = valueAt(row, ac.field)
              if (v != null) {
                val d = v.asInstanceOf[java.lang.Double].doubleValue
                st(i) =
                  if (st(i) == null) java.lang.Double.valueOf(d)
                  else java.lang.Double.valueOf(
                    st(i).asInstanceOf[java.lang.Double].doubleValue + d)
              }
            case op =>
              val v = valueAt(row, ac.field)
              val better = v != null && (st(i) == null ||
                (if (op == "min") cmpAny(v, st(i)) < 0
                 else cmpAny(v, st(i)) > 0))
              if (better) st(i) = v
          }
        }
      }
    } finally inner.close()
    buf.iterator.map { case (key, st) =>
      InternalRow.fromSeq((key ++ st.toSeq).toIndexedSeq)
    }
  }

  private lazy val out: Iterator[InternalRow] =
    if (statsEligible) statsFold() match {
      case Some(row) => Iterator.single(row)
      case None => decodeFold() // stats missing: answer from data
    } else decodeFold()

  private var current: InternalRow = _
  override def next(): Boolean =
    if (out.hasNext) { current = out.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
