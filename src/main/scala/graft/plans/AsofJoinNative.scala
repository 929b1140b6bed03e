package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join — the full custom-operator extension stack
  * (SURVEY §2.10, tier (c)): a Catalyst [[AsofJoinPlan]] logical node, a
  * planner [[AsofJoinStrategy]], and a whole-operator [[AsofJoinExec]]
  * physical plan, registered through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]], `injectPlannerStrategy`).
  *
  * Semantics are IDENTICAL to the composed [[graft.operators.AsofJoin]]
  * (DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`):
  * equal timestamps match; null keys / null timestamps never match but
  * left rows always survive (left-outer); the right side must be unique
  * per (key, ts). q260 holds both implementations to the same oracle.
  *
  * Why a native operator when the composition already scales: the
  * composed form materializes |left| + |right| union rows, carries the
  * right payload through a running-`last` window (a second pass over
  * every partition's sorted run), then filters half the rows back out.
  * The exec does ONE forward merge per co-partitioned pair — same
  * exchange (hash on key) and same per-partition sort Spark would insert
  * for the window, but no union, no window buffering, no tag-and-filter.
  * Catalyst still owns everything around it: `EnsureRequirements` plants
  * the exchanges/sorts from the declared distribution/ordering (AQE can
  * re-plan them), and reuse rules see a plain binary node.
  *
  * Scale shape: requiredChildDistribution = ClusteredDistribution(key)
  * on both sides — co-partitioned merge, no broadcast, no nested loop;
  * memory per task is O(1): one lookahead right row and one buffered
  * candidate (the merge never holds a key group).
  *
  * Reference basis: the reference keeps per-record version history and
  * probes "latest at-or-before" during sync (lib/UpdateStrategies.py's
  * versioned strategies); this is that probe as a relational operator.
  */
object AsofJoinNative {

  /** Left rows + (`asof_ts`, `valueCols`) from the latest right row
    * at-or-before each left row's `leftTs`, per `keyCol`. Requires
    * [[graft.GraftExtensions]] on the session (injectPlannerStrategy) —
    * the engine's own entry points install it. */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame =
    build(left, right, keyCol, leftTs, rightTs, valueCols, forward = false)

  /** FORWARD as-of: the EARLIEST right row at-or-after each left row's
    * `leftTs` (DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND
    * l.ts <= r.ts`). Same merge, mirrored: no candidate buffering at
    * all — the lookahead right row IS the match when its key agrees. */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame =
    build(left, right, keyCol, leftTs, rightTs, valueCols, forward = true)

  private def build(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      forward: Boolean): DataFrame = {
    val collisions = left.columns.toSet.intersect((valueCols :+ "asof_ts").toSet)
    require(collisions.isEmpty,
      s"output columns collide with left columns: $collisions — alias them first")
    // re-alias the right side so both children's exprIds are disjoint
    // even when they derive from the same source (the analyzer's
    // deduplication rules know nothing about this node)
    val rightFresh = right.select(right.columns.map(c =>
      org.apache.spark.sql.functions.col(c).alias(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightFresh.queryExecution.analyzed
    def attrOf(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"$side column '$name' not in ${plan.output.map(_.name).mkString(", ")}"))
    val lKey = attrOf(lPlan, keyCol, "left")
    val lTs = attrOf(lPlan, leftTs, "left")
    val rKey = attrOf(rPlan, keyCol, "right")
    val rTs = attrOf(rPlan, rightTs, "right")
    require(lKey.dataType == rKey.dataType,
      s"key types differ: ${lKey.dataType} vs ${rKey.dataType}")
    require(lTs.dataType == rTs.dataType,
      s"timestamp types differ: ${lTs.dataType} vs ${rTs.dataType}")
    val rVals = valueCols.map(attrOf(rPlan, _, "right"))
    val outAttrs = AttributeReference("asof_ts", rTs.dataType, nullable = true)() +:
      valueCols.zip(rVals).map { case (n, a) =>
        AttributeReference(n, a.dataType, nullable = true)()
      }
    org.apache.spark.sql.graftbridge.GraftPlanBridge.ofRows(left.sparkSession,
      AsofJoinPlan(lPlan, rPlan, lKey, lTs, rKey, rTs, rVals, outAttrs, forward))
  }
}

/** Logical as-of join. `outAttrs` (asof_ts + right values, all nullable)
  * are produced here, not drawn from a child — [[producedAttributes]]
  * keeps CheckAnalysis' missing-input audit honest. */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute], outAttrs: Seq[Attribute],
    forward: Boolean = false)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] to [[AsofJoinExec]]; everything else falls
  * through to Spark's own strategies. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(p.leftKey, p.leftTs, p.rightKey, p.rightTs,
        p.rightValues, p.outAttrs, p.forward,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned streaming merge: children arrive hash-clustered on the
  * key and sorted by (key, ts) — `EnsureRequirements` plants those
  * exchanges/sorts from the declarations below — and each partition pair
  * is merged in one forward pass with O(1) state (a lookahead right row
  * and one buffered candidate). Left order is preserved (outputOrdering),
  * so a downstream window over (key, ts) re-uses the sort. */
case class AsofJoinExec(leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute], outAttrs: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan, right: SparkPlan)
    extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // nulls-first ascending on (key, ts): null keys/timestamps sort ahead
  // of every real value, so the merge meets them before any candidate
  // for their key exists — they can never steal a match
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyB = BindReferences.bindReference(leftKey: Expression, lOut)
    val lTsB = BindReferences.bindReference(leftTs: Expression, lOut)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, rOut)
    val rTsB = BindReferences.bindReference(rightTs: Expression, rOut)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val rProjExprs: Seq[Expression] = (rightTs +: rightValues)
    val nOut = outAttrs.length
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val rValProj = UnsafeProjection.create(rProjExprs, rOut)
      val resultProj = UnsafeProjection.create(
        outputAttrs.map(a => a: Expression), outputAttrs)
      val joined = new JoinedRow
      val nullMatch = new GenericInternalRow(nOut)

      new Iterator[InternalRow] {
        // lookahead right row (the row object is reused by the child
        // iterator, so rHeadKey/rHeadTs die at the next advance — they
        // are never retained across one)
        private var rHead: InternalRow = _
        private var rHeadKey: Any = _
        private var rHeadTs: Any = _
        // last right row consumed with key == its left key at the time —
        // the projection is COPIED out of the reused buffer, and the key
        // deep-copied, because both outlive arbitrarily many advances
        private var cand: InternalRow = _
        private var candKey: Any = _

        private def copyKey(v: Any): Any = v match {
          case s: UTF8String => s.copy()
          case other => other // primitives/Decimal/etc. are immutable
        }

        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyB.eval(r)
            val t = rTsB.eval(r)
            // null key / null ts right rows can never match anything
            if (k != null && t != null) { rHead = r; rHeadKey = k; rHeadTs = t }
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKeyB.eval(l)
          if (k == null) return resultProj(joined(l, nullMatch))
          val t = lTsB.eval(l)
          if (forward) {
            // mirrored merge: discard right rows strictly BEHIND this
            // left row (smaller keys, or same key before t); the
            // lookahead itself is then the earliest at-or-after match —
            // no candidate buffering, it must stay put for equal-ts and
            // later left rows of the same key
            var advance = rHead != null
            while (advance) {
              val c = keyOrd.compare(rHeadKey, k)
              if (c < 0 || (c == 0 && t != null && tsOrd.compare(rHeadTs, t) < 0))
                advanceRight()
              else advance = false
              if (rHead == null) advance = false
            }
            val m =
              if (t != null && rHead != null && keyOrd.compare(rHeadKey, k) == 0)
                rValProj(rHead)
              else nullMatch
            return resultProj(joined(l, m))
          }
          // backward: consume right rows that are behind this left row:
          // strictly smaller keys (discard), or same key at ts <= t
          // (each becomes the new candidate — the LAST one consumed is
          // the as-of match)
          var advance = rHead != null
          while (advance) {
            val c = keyOrd.compare(rHeadKey, k)
            if (c < 0) advanceRight()
            else if (c == 0 && t != null && tsOrd.compare(rHeadTs, t) <= 0) {
              cand = rValProj(rHead).copy()
              candKey = copyKey(rHeadKey)
              advanceRight()
            } else advance = false
            if (rHead == null) advance = false
          }
          val m =
            if (t != null && cand != null && keyOrd.compare(candKey, k) == 0) cand
            else nullMatch
          resultProj(joined(l, m))
        }
      }
    }
  }
}
