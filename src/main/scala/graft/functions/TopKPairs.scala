package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Native mergeable TOP-K aggregate — the bounded-heap primitive behind
  * TakeOrderedAndProject, exposed as an aggregate function so per-GROUP
  * top-k runs in ONE partial-aggregated pass: each task keeps a k-element
  * heap per group, partial heaps merge associatively, and no sort of the
  * group's full row set ever happens. The window formulation
  * (`row_number() <= k`) buffers and sorts every row of every group;
  * this buffers exactly k.
  *
  * `top_k_pairs(score DOUBLE, id BIGINT, k)` keeps the k pairs largest
  * by (score DESC, id ASC) and returns them sorted in that order as
  * `array<struct<score, id>>` — the deterministic total order makes the
  * result reproducible and oracle-comparable after exploding. NULL
  * scores/ids are skipped (an aggregate's NULL contract).
  *
  * State is O(k) per group regardless of group size; serialization is a
  * flat fixed-width buffer (8+8 bytes per kept pair).
  */
case class TopKPairs(scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with ImplicitCastInputTypes {

  require(k > 0 && k <= 1000000, s"k $k must be in [1, 1e6]")

  // analysis-time coercion for the SQL-registered form: a DECIMAL score
  // or INT id arrives as DOUBLE/BIGINT instead of a runtime
  // ClassCastException inside eval
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  // the queue's max is the WORST kept pair (lowest score, then largest
  // id) so eviction compares against head in O(1)
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  private def better(p: (Double, Long), w: (Double, Long)): Boolean =
    p._1 > w._1 || (p._1 == w._1 && p._2 < w._2)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val p = (s.asInstanceOf[Double], i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(p)
      else if (better(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { p =>
      if (buf.size < k) buf.enqueue(p)
      else if (better(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortBy(p => (-p._1, p._2))
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def prettyName: String = "top_k_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKPairs {
  import org.apache.spark.sql.Column

  /** Column-level entry: `topK(score, id, k)` — score is cast to double,
    * id to long, so callers can pass any numeric columns. */
  def topK(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.column(
      TopKPairs(
        org.apache.spark.sql.graftbridge.expression(score.cast("double")),
        org.apache.spark.sql.graftbridge.expression(id.cast("long")),
        k).toAggregateExpression())
}
