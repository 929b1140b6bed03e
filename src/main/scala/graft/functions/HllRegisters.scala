package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native mergeable HyperLogLog REGISTER aggregate with fully PORTABLE
  * semantics — the approximate count-distinct primitive whose sketch a
  * SQL oracle can rebuild bit-for-bit.
  *
  * Why not `approx_count_distinct`: Spark's built-in HLL++ is fast but
  * its sketch is an engine-internal black box — no external system can
  * reproduce the estimate, so a cross-engine pipeline cannot verify it,
  * and sketches persisted by one engine are useless to another. This
  * aggregate pins every bit of the sketch to public arithmetic:
  *
  *   h      = first 60 bits of md5(value)   (the engine's portable hash,
  *            [[Md5Hash.prefix60]] = `conv(substring(md5(x),1,15),16,10)`)
  *   bucket = h & 255                        (m = 256 registers,
  *                                            ~6.5% standard error)
  *   rest   = h >>> 8                        (remaining 52 bits)
  *   rho    = 53 - bitLength(rest), rho = 53 when rest = 0
  *   M_j    = max rho seen in bucket j       (0 = empty register)
  *
  * Any engine with md5 and integer math reproduces M_0..M_255 exactly —
  * the DuckDB oracle does, with `CAST(('0x'||substr(md5(v),1,15)) AS
  * BIGINT)` and `length(bin(...))`.
  *
  * Why it matters at 100 TB: a COUNT(DISTINCT) carries one shuffle row
  * per distinct value; this aggregate's state is 256 BYTES regardless of
  * cardinality, partials merge map-side with element-wise max, and
  * sketches for different partitions/sources/days merge by the same max
  * — so a per-source daily sketch table answers "distinct users this
  * quarter, any source subset" with NO rescan of the raw data. The
  * estimate itself is derived declaratively from the returned register
  * array ([[graft.operators.Sketches.hllEstimate]]), keeping the
  * error-bearing float math out of the mergeable state.
  *
  * Reference ties: the sync engine's batch reconciliation counts
  * distinct record keys per run (`lib/DataProcessor.py` key-set
  * comparison); this is that count at sketch cost.
  */
case class HllRegisters(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](256)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Md5Hash.prefix60(v.asInstanceOf[UTF8String])
      val bucket = (h & 255L).toInt
      val rest = h >>> 8
      // bitLength(rest) = 64 - nlz(rest); rho counts how deep the 52
      // remaining bits' leading-zero run goes, +1 for the first set bit
      val rho =
        if (rest == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < 256) { if (other(j) > buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  // INT elements, not BYTE: every consumer does integer arithmetic on
  // the registers (shiftleft, comparisons) and would cast anyway
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_registers"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren(0))
}

object HllRegisters {
  import org.apache.spark.sql.Column

  /** Column-level entry: `hllRegisters(v)` over a STRING column (format
    * non-string keys with a deterministic cast first, as the oracle
    * will). */
  def hllRegisters(v: Column): Column =
    org.apache.spark.sql.graftbridge.column(
      HllRegisters(org.apache.spark.sql.graftbridge.expression(v))
        .toAggregateExpression())
}
