package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Native mergeable TOP-K DISTINCT aggregate: the k LARGEST DISTINCT
  * values of a numeric column, returned sorted descending as
  * `array<double>`. The bounded-state sibling of [[TopKPairs]]: each
  * task keeps at most k distinct values per group (a sorted set capped
  * by evicting its minimum), partials merge associatively, and neither
  * the group's full row set nor its full VALUE set ever materializes —
  * `slice(sort_array(collect_set(v)), ...)` buffers every distinct
  * value of the group, this buffers exactly k. NULLs are skipped (the
  * aggregate NULL contract); duplicates collapse on entry, so heavy
  * value repetition (the hot-group shape) costs set lookups, not
  * memory. Deterministic: the result depends only on the value SET, so
  * it is reproducible and oracle-comparable after exploding.
  *
  * This is the maintained-view `tk_` fold rule's rescan primitive
  * (`LakeView.refreshAggregate(topKs)`): top-k is non-invertible under
  * deletes exactly like extrema (the k-th largest dying needs the
  * (k+1)-th, which the state no longer holds), so it rides the same
  * touched-group rescan, with O(k) state per group in the pass.
  */
case class TopKDistinct(valueExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Double]]
    with ImplicitCastInputTypes {

  require(k > 0 && k <= 100000, s"k $k must be in [1, 1e5]")

  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def createAggregationBuffer(): mutable.TreeSet[Double] =
    mutable.TreeSet.empty[Double]

  private def add(buf: mutable.TreeSet[Double], v: Double): Unit =
    if (buf.size < k) buf += v
    else if (v > buf.head && !buf.contains(v)) { buf -= buf.head; buf += v }

  override def update(buf: mutable.TreeSet[Double],
      input: InternalRow): mutable.TreeSet[Double] = {
    val v = valueExpr.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: mutable.TreeSet[Double],
      other: mutable.TreeSet[Double]): mutable.TreeSet[Double] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Double]): Any =
    new GenericArrayData(
      buf.toArray.reverseIterator.map(v => v: Any).toArray)

  override def serialize(buf: mutable.TreeSet[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf += bb.getDouble; j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr)
  override def prettyName: String = "top_k_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKDistinct =
    copy(valueExpr = newChildren(0))
}

object TopKDistinct {
  import org.apache.spark.sql.Column

  /** Column-level entry: `topKDistinct(v, k)` — v is cast to double. */
  def topKDistinct(v: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.column(
      TopKDistinct(
        org.apache.spark.sql.graftbridge.expression(v.cast("double")),
        k).toAggregateExpression())
}
