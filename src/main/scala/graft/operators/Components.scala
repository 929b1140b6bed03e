package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster step
  * of a dedup pipeline: near-dup PAIRS (MinHash/SimHash/embedding-LSH)
  * become clusters, and each cluster keeps one canonical document
  * (the minimum id), so transitive duplicates A~B~C collapse together
  * even when A and C never matched directly.
  *
  * Algorithm: iterative min-label propagation — each round every node
  * takes the minimum label among itself and its neighbors; fixpoint =
  * every node labeled with its component's minimum id. This is the
  * Pregel-style CC (GraphX's built-in uses the same min-message), and
  * converges in O(diameter) rounds. Near-dup clusters are shallow
  * (duplicates of a common source), so rounds stay single-digit; for
  * adversarially long path graphs the alternating large-star/small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) converges in O(log n) rounds with the same
  * join+groupBy building blocks used here.
  *
  * Scale shape: each round is one shuffle-join of edges against labels
  * on the neighbor key plus one min-aggregation on the node key — both
  * partial-aggregated, both on uniform hash keys. Lineage is truncated
  * every round with an eager localCheckpoint (on a cluster, a reliable
  * `checkpoint` to the state store's FS serves the same purpose), so the
  * plan stays O(1) per round instead of growing with the iteration count.
  */
object Components {

  /** Label every node of the undirected graph `edges` (pairs in
    * `aCol`/`bCol`) with its component's minimum node id. Output:
    * `(node, label)`, one row per distinct endpoint. Fails loudly if the
    * fixpoint is not reached within `maxIter` rounds — a silently
    * unconverged labeling would merge nothing visibly wrong but split
    * real clusters. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    val np = edges.sparkSession.sparkContext.defaultParallelism
    val e = edges.select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
    // both directions once: every node then appears on the x side, so the
    // per-round aggregation covers the full vertex set
    val und = e.unionByName(e.select(col("y").as("x"), col("x").as("y")))
      .distinct()
      .repartition(np, col("y")) // pre-shuffled on the probe key, reused every round
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = und.select(col("x").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIter) {
      val neighMin = und
        .join(labels.select(col("node").as("y"), col("label").as("nlab")), Seq("y"))
        .groupBy(col("x").as("node")).agg(min(col("nlab")).as("nmin"))
      val next = labels.join(neighMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).cast("long").as("_chg"))
        .localCheckpoint() // eager: materializes the round, truncates lineage
      changed = next.agg(sum(col("_chg"))).head().getLong(0)
      labels = next.select("node", "label")
      round += 1
    }
    und.unpersist()
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "pathologically deep graph; use large-star/small-star (O(log n) rounds)")
    labels
  }

  /** Canonical-doc assignment for a corpus given its near-dup pairs:
    * every doc maps to its cluster's minimum id (itself when unpaired
    * — singleton docs are their own canonical). The downstream keep-rule
    * is then a simple `filter(col(idCol) === col("canonical_id"))`. */
  def canonicalize(docs: DataFrame, pairs: DataFrame, idCol: String,
      aCol: String, bCol: String): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
      .select(col("node").as(idCol), col("label").as("canonical_id"))
    docs.join(comp, Seq(idCol), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col(idCol)))
  }
}
