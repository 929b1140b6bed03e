package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchical (recursive) rollups over a parent-pointer forest — the
  * engine's recursive-CTE surface: org charts, category trees,
  * bill-of-materials chains, reply threads. The reference has no
  * hierarchy operator (its record model is flat,
  * `lib/DataProcessor.py:17`); this is part of the beyond-parity
  * relational tier, with DuckDB's native `WITH RECURSIVE` as the oracle.
  *
  * Algorithm: pointer doubling (path halving). Every node starts with
  * `(anc = parent, d = 1)`; each round joins the frame against itself on
  * `anc = node`, composing ancestor pointers — after round k every
  * pointer has jumped `2^k` edges (or landed on its root). A
  * parent-at-a-time walk needs O(depth) rounds; doubling needs
  * O(log2 depth), and each round is ONE equi-join + no aggregation, so a
  * million-deep chain resolves in ~20 shuffles. Lineage is truncated
  * per round (the Components discipline) so Catalyst re-analyzes a
  * constant-size plan regardless of iteration count.
  *
  * Scale shape: the join key is the current ancestor pointer. Real
  * forests funnel pointers toward a few roots, which would skew the LAST
  * rounds' join — but rows whose pointer already reached a root are
  * FIXED and are split out of the join entirely (they re-enter by cheap
  * union), so the skewed keys never shuffle again. Each round therefore
  * joins only the still-unresolved suffix, which shrinks geometrically.
  */
object Hierarchy {

  /** Resolve every node of a parent-pointer forest to
    * `(node, root, depth)` — root = the fixpoint of the parent chain
    * (a node whose parent is itself or NULL), depth = #edges to it.
    * `edges` carries one row per node (`nodeCol`, `parentCol`). Cycles
    * (which a parent-pointer TABLE can encode even though a tree never
    * should) would loop forever under any traversal; after `maxIter`
    * doubling rounds (2^maxIter depth capacity) unresolved rows fail
    * loudly rather than silently mislabel. */
  def rootsAndDepths(edges: DataFrame, nodeCol: String, parentCol: String,
      maxIter: Int = 40, checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    // Lineage truncation must ALSO reset plan statistics: checkpointed
    // frames inherit their child plan's stats, and a pointer-doubling
    // round self-joins the frame, so the size estimate's bit-length
    // doubles per round — after enough rounds the driver burns minutes
    // in BigInteger constant folding (observed via jstack in the SCC
    // sibling, Graph.stronglyConnectedComponents). The external-RDD
    // round trip rebuilds the frame with fresh default stats.
    def truncate(df: DataFrame): DataFrame = {
      val ck = checkpointDir match {
        case Some(dir) =>
          // URI-path prefix test ([[Checkpointing]]): an equality test
          // never matches the qualified dir/<UUID> and every round would
          // mint a fresh orphan UUID subdirectory under `dir`
          Checkpointing.ensureDir(spark.sparkContext, dir)
          df.checkpoint()
        case None => df.localCheckpoint()
      }
      spark.createDataFrame(ck.rdd, ck.schema)
    }
    // (node, anc, d, fin): anc is d edges above node; fin marks rows
    // whose pointer has PROVABLY reached a root. NULL parent == self
    // parent == root; both normalize to the closed form anc=node, d=0.
    var frame = truncate(edges.select(
      col(nodeCol).cast("long").as("node"),
      coalesce(col(parentCol).cast("long"), col(nodeCol).cast("long")).as("anc"))
      .withColumn("d", when(col("anc") === col("node"), 0L).otherwise(1L))
      .withColumn("anc", when(col("d") === 0L, col("node")).otherwise(col("anc")))
      .withColumn("fin", col("d") === 0L))
    var iter = 0
    var remaining = 1L
    while (remaining > 0 && iter < maxIter) {
      // finished rows exit the join entirely: pointers funnel toward a
      // few roots, which is exactly where a naive self-join would skew —
      // but a row whose pointer sits on a root has nothing left to
      // resolve, so the hot root keys never shuffle again. Each round
      // joins only the unresolved suffix, which shrinks geometrically.
      val fixed = frame.filter(col("fin"))
      val moving = frame.filter(!col("fin"))
      // compose: my ancestor's ancestor becomes my ancestor; distances
      // add. Landing on a row with td=0 means the pointee IS a root —
      // the composed row is final. A DANGLING pointer (parent id with no
      // row of its own — a forest cut at missing ancestors) left-joins to
      // NULL and is treated as having reached its root, rather than
      // silently dropping the node the way an inner join would.
      val stepped = moving.as("m")
        .join(frame.select(col("node").as("tn"), col("anc").as("ta"),
          col("d").as("td")).as("t"), col("m.anc") === col("tn"), "left")
        .select(col("m.node").as("node"),
          coalesce(col("ta"), col("m.anc")).as("anc"),
          (col("m.d") + coalesce(col("td"), lit(0L))).as("d"),
          (col("td") === 0L || col("tn").isNull).as("fin"))
      frame = truncate(fixed.unionByName(stepped))
      // one cheap action per round; no join — the fin flag carries the
      // convergence state
      remaining = frame.filter(!col("fin")).count()
      iter += 1
    }
    require(remaining == 0,
      s"hierarchy unresolved after $maxIter doubling rounds (depth > 2^$maxIter " +
        "or a parent-pointer cycle): refusing to emit partial roots")
    frame.select(col("node"), col("anc").as("root"), col("d").as("depth"))
  }

  /** Per-root rollup of a forest: node counts, max depth, and an exact
    * decimal sum of `valueCol` over each root's subtree — the org-chart /
    * category-tree report. One doubling resolution + one aggregation. */
  def subtreeRollup(edges: DataFrame, nodeCol: String, parentCol: String,
      valueCol: String): DataFrame = {
    val resolved = rootsAndDepths(edges, nodeCol, parentCol)
    resolved.join(edges.select(col(nodeCol).cast("long").as("node"),
        col(valueCol).as("v")), Seq("node"))
      .groupBy("root")
      .agg(count(lit(1)).as("n_nodes"), max(col("depth")).as("max_depth"),
        sum(col("v").cast("decimal(28,6)")).cast("double").as("total_value"))
  }
}
