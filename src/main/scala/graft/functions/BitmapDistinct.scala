package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Native mergeable EXACT count-distinct over integer keys — the
  * bitmap-union primitive big warehouses use in place of
  * `COUNT(DISTINCT id)`.
  *
  * Why it matters at 100 TB: Catalyst plans `COUNT(DISTINCT x)`
  * alongside other aggregates as an Expand (every input row duplicated
  * per aggregate group) followed by TWO aggregation exchanges keyed on
  * `(group, x)` — the shuffle carries one row per distinct value per
  * group. `bitmap_distinct(x)` is one ordinary partial-aggregated pass:
  * each task ORs ids into a sparse bitmap per group, partial bitmaps
  * merge map-side, and the single exchange carries one compressed
  * bitmap per (task, group) — shuffle volume O(range/64 words touched),
  * independent of row count, and the result is still EXACT (no HLL
  * error bar).
  *
  * State is a sparse word map (`v >> 6` → 64-bit word, `v & 63` the
  * bit) — the degenerate-simple cousin of a roaring bitmap: dense id
  * spaces (TPC-H-style surrogate keys) cost 1 bit per candidate id;
  * arbitrary longs (hashes) degrade gracefully to ~16 bytes per
  * distinct value, the same as a hash-set but with free unions.
  * Negative ids work (arithmetic shift keys the map). NULLs are skipped
  * (the aggregate NULL contract). Serialization is a flat fixed-width
  * (wordIndex, word) buffer.
  *
  * Reference ties: the sync engine counts distinct record keys when
  * reconciling batches (`lib/DataProcessor.py` key-set comparisons);
  * this is that count made exact-at-scale.
  */
case class BitmapDistinct(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]]
    with ImplicitCastInputTypes {

  // analysis-time coercion: INT/SHORT ids arrive as LONG instead of a
  // runtime ClassCastException inside eval
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long],
      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      val word = id >> 6 // arithmetic shift: negatives get their own keys
      val bit = 1L << (id & 63)
      buf(word) = buf.getOrElse(word, 0L) | bit
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (word, bits) =>
      buf(word) = buf.getOrElse(word, 0L) | bits
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    var n = 0L
    buf.foreachEntry { (_, bits) => n += java.lang.Long.bitCount(bits) }
    n
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (word, bits) => bb.putLong(word); bb.putLong(bits) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf(bb.getLong) = bb.getLong; j += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bitmap_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinct =
    copy(child = newChildren(0))
}

object BitmapDistinct {
  import org.apache.spark.sql.Column

  /** Column-level entry: `bitmapDistinct(id)` — id is cast to long, so
    * callers can pass any integral column. */
  def bitmapDistinct(id: Column): Column =
    org.apache.spark.sql.graftbridge.column(
      BitmapDistinct(
        org.apache.spark.sql.graftbridge.expression(id.cast("long")))
        .toAggregateExpression())
}
