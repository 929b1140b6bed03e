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
  * every round with an eager checkpoint, so the plan stays O(1) per
  * round instead of growing with the iteration count; pass
  * `checkpointDir` to make the truncation a RELIABLE checkpoint (round
  * state survives executor loss — the cluster-production mode) instead
  * of the default executor-memory localCheckpoint.
  */
object Components {

  /** Per-round lineage truncation: `localCheckpoint` (executor-memory
    * blocks — fast, but executor loss mid-run restarts the whole
    * clustering) or, when `checkpointDir` is set, a RELIABLE
    * `checkpoint` to that filesystem path — the cluster-production mode:
    * round state survives executor loss at the price of one FS write per
    * round. The checkpoint dir is set process-wide (Spark has exactly one
    * per SparkContext); passing a different dir moves it. */
  private def truncate(df: DataFrame,
      checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        // URI-path prefix test, not equality: setCheckpointDir stores a
        // QUALIFIED dir/<random-UUID>, so `contains(dir)` never matches
        // and every round would mint a fresh orphan UUID subdirectory
        Checkpointing.ensureDir(df.sparkSession.sparkContext, dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }

  /** Label every node of the undirected graph `edges` (pairs in
    * `aCol`/`bCol`) with its component's minimum node id. Output:
    * `(node, label)`, one row per distinct endpoint. Fails loudly if the
    * fixpoint is not reached within `maxIter` rounds — a silently
    * unconverged labeling would merge nothing visibly wrong but split
    * real clusters. `checkpointDir` (None = localCheckpoint) switches
    * per-round truncation to reliable checkpointing — see [[truncate]]. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50, checkpointDir: Option[String] = None): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // checkpoint the typed edge frame FIRST — this does two distinct jobs:
    // (1) the undirected expansion below fans it into four plan branches,
    // each of which would otherwise re-run the caller's whole upstream
    // pipeline (e.g. the MinHash candidate/verify chain); (2) it TRUNCATES
    // the logical plan, so each round's query re-analyzes a one-node
    // LogicalRDD instead of the upstream pipeline's full tree — with a
    // large upstream plan, per-round Catalyst analysis otherwise dwarfs
    // the actual execution of a shallow graph's rounds.
    Seq(aCol, bCol).foreach { c =>
      val dt = edges.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"edge column '$c' is $dt: a long cast would silently null " +
          "non-numeric ids and return an empty labeling — map string ids " +
          "to longs (e.g. xxhash64) before clustering")
    }
    val e = truncate(
      edges.select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
        .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y")),
      checkpointDir)
    // both directions + a self-loop per node: the self-loop folds each
    // node's own label into the neighbor-min, so a round is ONE join +
    // ONE aggregation — no join-back to merge the previous label.
    // No explicit repartition: AQE sizes the distinct/join/agg shuffles to
    // the graph's actual volume (coalescing a toy graph's rounds to a
    // task or two, fanning a 100 TB edge list wide), which a fixed
    // repartition(n) would defeat in both directions.
    val bidir = e.unionByName(e.select(col("y").as("x"), col("x").as("y")))
    val und = bidir.unionByName(bidir.select(col("x"), col("x").as("y")))
      .distinct()
      .persist(lvl)
    // ONE action per round: the round's frame is materialized by an eager
    // checkpoint (truncating lineage — local or reliable per
    // `checkpointDir`), and the convergence signal rides the SAME action
    // as an observe() metric — labels are per-node non-increasing, so the
    // label SUM is strictly monotone until fixpoint, and an unchanged sum
    // IS convergence.
    def propagate(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = truncate(
        df.observe(obs, sum(col("label").cast("decimal(38,0)")).as("s")),
        checkpointDir)
      // sum over an EMPTY frame is null — normalize so a no-edge graph
      // (every doc a singleton upstream) converges instead of NPE-ing
      val s = obs.get("s") match {
        case null => java.math.BigDecimal.ZERO
        case d: java.math.BigDecimal => d
      }
      (ck, s)
    }
    // release a superseded round's checkpointed blocks NOW rather than at
    // GC time: up to maxIter full label sets would otherwise stay pinned
    // in MEMORY_AND_DISK for the run's duration
    def release(df: DataFrame): Unit =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(blocking = false))
    // init already performs the first propagation: label = min(self, neighbors)
    var (labels, prevSum) = propagate(
      und.groupBy(col("x").as("node")).agg(min(col("y")).as("label")))
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val (next, s) = propagate(und
        .join(labels.select(col("node").as("y"), col("label")), Seq("y"))
        .groupBy(col("x").as("node")).agg(min(col("label")).as("label")))
      release(labels) // next is materialized; the previous round is dead
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      round += 1
    }
    release(e)
    und.unpersist() // the one CacheManager entry this call creates
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "pathologically deep graph; use connectedComponentsStar " +
        "(alternating large-star/small-star, O(log n) rounds)")
    labels
  }

  /** O(log n)-round connected components via alternating large-star /
    * small-star (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the fallback [[connectedComponents]]'s failure
    * message advertises, for graphs whose diameter defeats per-round
    * min-propagation (a depth-10⁶ path converges here in ~20 rounds).
    *
    * large-star: every node u computes m = min(Γ(u) ∪ {u}) and rewires its
    * LARGER neighbors v > u to m. small-star: edges oriented larger→smaller,
    * u rewires its smaller neighbors (and itself) to m. Both are one
    * groupBy-min plus one equi-join back on the node key — per-node MIN
    * aggregation only, so (unlike a collect_list formulation) a
    * billion-degree hub node costs nothing special. The fixpoint is a star
    * forest: every node points straight at its component's minimum id.
    *
    * Output matches [[connectedComponents]]: `(node, label)`, one row per
    * distinct endpoint. Convergence is checked SOUNDLY (distinct edge-set
    * equality via count + one-sided except, not a hash-sum that could
    * collide), one count action per round and the except only on
    * equal counts. */
  def connectedComponentsStar(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50, checkpointDir: Option[String] = None): DataFrame = {
    Seq(aCol, bCol).foreach { c =>
      val dt = edges.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"edge column '$c' is $dt: a long cast would silently null " +
          "non-numeric ids and return an empty labeling — map string ids " +
          "to longs (e.g. xxhash64) before clustering")
    }
    def release(df: DataFrame): Unit =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(blocking = false))
    def largeStar(d: DataFrame): DataFrame = {
      val b = d.unionByName(d.select(col("y").as("x"), col("x").as("y")))
      val mins = b.groupBy(col("x")).agg(min(col("y")).as("mn"))
        .select(col("x").as("u"), least(col("mn"), col("x")).as("m"))
      b.join(mins, b("x") === mins("u"))
        .where(col("y") > col("x"))
        .select(col("y").as("x"), col("m").as("y"))
        .where(col("x") =!= col("y"))
        .distinct()
    }
    def smallStar(d: DataFrame): DataFrame = {
      val o = d.select(greatest(col("x"), col("y")).as("x"),
        least(col("x"), col("y")).as("y"))
      val mins = o.groupBy(col("x")).agg(min(col("y")).as("m")) // m < x always
      val members = o.join(mins, Seq("x"))
        .select(col("y").as("x"), col("m").as("y"))
        .where(col("x") =!= col("y")) // v == m: already carried as (u, m)
      members.unionByName(mins.select(col("x"), col("m").as("y"))).distinct()
    }
    // one checkpointed frame per round (local or reliable per
    // `checkpointDir`), count riding the same action
    def materialize(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = truncate(df.observe(obs, count(lit(1)).as("n")), checkpointDir)
      (ck, obs.get("n").asInstanceOf[Long])
    }
    var (e, cnt) = materialize(
      edges.select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
        .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
        .distinct())
    var converged = cnt == 0 // edgeless graph: nothing to label
    var round = 0
    while (!converged && round < maxIter) {
      val (next, nextCnt) = materialize(smallStar(largeStar(e)))
      converged = nextCnt == cnt && next.except(e).limit(1).isEmpty
      release(e)
      e = next
      cnt = nextCnt
      round += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds — " +
        "at ~20 rounds per 10^6-depth path this indicates a degenerate " +
        "input, not a deep graph; inspect the edge frame")
    // fixpoint is a star forest: x values are non-roots, y values roots
    e.select(col("x").as("node"), col("y").as("label"))
      .unionByName(e.select(col("y").as("node"), col("y").as("label")))
      .distinct()
  }

  /** Incremental connected components — fold a batch of NEW edges into
    * an existing min-id assignment without re-clustering the corpus.
    * The daily reality of a near-dup graph: the pair set only ever
    * grows (edges merge components, never split them), so the previous
    * assignment can stand in for everything it already clustered.
    *
    * Shape: map each new edge's endpoints through `prev` (unknown
    * endpoints stand for themselves), which collapses every touched
    * previous component to its canonical id — then run full CC on that
    * QUOTIENT graph only. The quotient is O(|new edges|), independent
    * of corpus size: a 10-billion-node assignment absorbs a million new
    * edges by clustering a million-edge graph, in the same round
    * complexity [[connectedComponents]] has, while untouched components
    * cost one left join. Because previous labels are component minima,
    * the quotient minimum IS the merged component's global minimum —
    * the result is bit-identical to a full rebuild over the union edge
    * set (the q142 oracle equality).
    *
    * `prev` is (nodeCol, labelCol) with label = min member id, the
    * exact frame [[connectedComponents]] emits; nodes absent from
    * `prev` are treated as previously-unseen singletons. Output is the
    * same shape over prev's nodes plus every node the new edges touch. */
  def incrementalComponents(prev: DataFrame, newEdges: DataFrame,
      nodeCol: String, labelCol: String, aCol: String, bCol: String,
      maxIter: Int = 50, checkpointDir: Option[String] = None): DataFrame = {
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = prev.select(col(nodeCol).cast("long").as("node"),
      col(labelCol).cast("long").as("label")).persist(sl)
    val e = newEdges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull).persist(sl)
    // an empty delta short-circuits (CC's convergence loop wants a
    // non-empty frame); limit(1)-sized action, not a count
    if (e.isEmpty) return p
      .select(col("node").as(nodeCol), col("label").as(labelCol))
    // endpoints through prev: coalesce keeps never-seen nodes as
    // themselves, so they enter the quotient directly
    val mapped = e
      .join(p.select(col("node").as("a"), col("label").as("_la")), Seq("a"), "left")
      .join(p.select(col("node").as("b"), col("label").as("_lb")), Seq("b"), "left")
      .select(coalesce(col("_la"), col("a")).as("qa"),
        coalesce(col("_lb"), col("b")).as("qb"))
    val q = connectedComponents(mapped, "qa", "qb", maxIter, checkpointDir)
      .persist(sl)
    // touched previous components re-label through the quotient result;
    // untouched ones coalesce back to their old label
    val relabel = q.select(col("node").as("label"), col("label").as("_ql"))
    val prevOut = p.join(relabel, Seq("label"), "left")
      .select(col("node"), coalesce(col("_ql"), col("label")).as("label"))
    // nodes the new edges introduced (absent from prev) read their
    // label straight off the quotient assignment
    val newNodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
      .join(p.select("node"), Seq("node"), "left_anti")
    val newOut = newNodes
      .join(q.select(col("node"), col("label").as("_ql")), Seq("node"), "left")
      .select(col("node"), coalesce(col("_ql"), col("node")).as("label"))
    prevOut.unionByName(newOut)
      .select(col("node").as(nodeCol), col("label").as(labelCol))
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

  /** Canonical-doc assignment with an EXPLICIT keep-rule: every doc maps
    * to the cluster member maximizing `(score, then smallest id)` — keep
    * the longest / highest-quality duplicate instead of [[canonicalize]]'s
    * arbitrary minimum id (published dedup pipelines keep by quality, not
    * by id accident). Same cluster labeling and join shape, plus ONE
    * window over the cluster label (one hash exchange — labels bound
    * cluster size, so no hot-partition risk beyond the clusters
    * themselves). Unpaired docs stay their own canonical. */
  def canonicalizeBy(docs: DataFrame, pairs: DataFrame, idCol: String,
      aCol: String, bCol: String, score: org.apache.spark.sql.Column): DataFrame = {
    // the component label travels under a fresh name: a docs frame with
    // its own 'label' column (a common ML-corpus name) must not make the
    // join ambiguous
    val raw = TempCols.fresh(docs, "_complbl")
    val comp = connectedComponents(pairs, aCol, bCol)
      .select(col("node").as(idCol), col("label").as(raw))
    val lbl = TempCols.fresh(docs, "_lbl")
    val labeled = docs.join(comp, Seq(idCol), "left")
      .withColumn(lbl, coalesce(col(raw), col(idCol))).drop(raw)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(lbl))
      .orderBy(score.desc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    labeled.withColumn("canonical_id", first(col(idCol)).over(w)).drop(lbl)
  }
}
