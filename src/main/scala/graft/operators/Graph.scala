package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames — PageRank and triangle counting,
  * the two classic whole-graph measures a corpus/provenance pipeline
  * reaches for (authority scoring over a citation/co-purchase graph;
  * clustering-coefficient inputs for community detection). Complements
  * [[Components]] (connectivity) with centrality and local density.
  *
  * Both operators are joins + partial-aggregated groupBys on the edge
  * relation — no driver-side adjacency, no per-node loops — so they
  * scale exactly as far as the shuffle does.
  */
object Graph {

  /** Per-round lineage truncation for the iterative ops, with STATS
    * RESET: the checkpointed rows round-trip through an external RDD so
    * the rebuilt frame carries fresh default statistics (localCheckpoint
    * alone inherits the child plan's stats, and a self-joining loop then
    * doubles the size estimate's bit-length every round — see
    * [[stronglyConnectedComponents]]). `checkpointDir = None` truncates
    * with `localCheckpoint` (executor-memory blocks — fast, but executor
    * loss mid-run restarts the whole iteration); `Some(dir)` switches to
    * a RELIABLE filesystem checkpoint, the cluster-production mode: a
    * 100-iteration SCC on 1000 executors WILL see an executor die, and
    * replaying every round from scratch is the difference between a
    * hiccup and a restart. Prefix test on getCheckpointDir, not equality:
    * setCheckpointDir stores dir/<random-UUID>. */
  private def truncator(spark: org.apache.spark.sql.SparkSession,
      checkpointDir: Option[String]): DataFrame => DataFrame = { df =>
    val ck = checkpointDir match {
      case Some(dir) =>
        Checkpointing.ensureDir(spark.sparkContext, dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
    spark.createDataFrame(ck.rdd, ck.schema)
  }

  /** PageRank with `iterations` synchronous power steps at `damping`
    * (the fixed-iteration form — at corpus scale a handful of steps is
    * the production choice; convergence thresholds add a driver round
    * per check without changing the ranking much).
    *
    * Cross-engine determinism (the oracle contract): per-edge
    * contributions `pr(src)/outdeg(src)` snap onto the 1e-12 integer
    * lattice BEFORE the per-node sum, so the only order-sensitive
    * reduction in the loop sums LONGS — exact at any parallelism and in
    * any engine. Everything else is a fixed chain of IEEE ops. Dangling
    * nodes (no out-edges) simply leak their mass — the standard
    * simplification; ranks still order correctly.
    *
    * Scale shape: the edge+degree frame is built once and persisted; each
    * iteration is ONE join (rank onto edges by src) + ONE
    * partial-aggregated groupBy(dst) + a left join back onto the node
    * set. Plan depth grows linearly with `iterations` — bound it (<= 10)
    * or checkpoint externally. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations $iterations must be in [1, 10] (plan depth grows per step)")
    require(damping > 0 && damping < 1, s"damping $damping must be in (0, 1)")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist(sl)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ewd = e.join(deg, "src").persist(sl)
    var pr = nodes.withColumn("pr", lit(1.0) / lit(n.toDouble))
    for (_ <- 1 to iterations) {
      val inflow = ewd.join(pr, ewd("src") === pr("node"))
        .select(col("dst"),
          floor(col("pr") / col("deg").cast("double") * lit(1e12) + lit(0.5))
            .cast("long").as("c12"))
        .groupBy("dst").agg(sum(col("c12")).as("s12"))
      pr = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .select(nodes("node"),
          (lit(1.0 - damping) / lit(n.toDouble) + lit(damping) *
            (coalesce(col("s12"), lit(0L)).cast("double") / lit(1e12))).as("pr"))
    }
    pr
  }

  /** HITS hubs/authorities over a DIRECTED (typically bipartite) edge
    * set — `iterations` synchronous steps of a(d) = Σ_{s→d} h(s);
    * h(s) = Σ_{s→d} a(d), starting from h ≡ 1. Scores are deliberately
    * UNNORMALIZED: the classic per-step L2 normalization only rescales
    * (the ranking is what matters), and skipping it keeps every score
    * an exact INTEGER — a1 is plain in-degree, and each later step is a
    * sum of integers, so the result reproduces bit-for-bit in any
    * engine with zero floats. Sums route through DECIMAL(38,0): scores
    * grow like degree^k, which overflows a long within a few steps on a
    * petabyte graph (hence the tight iteration bound, which also caps
    * plan depth).
    *
    * Scale shape: identical to [[pageRank]] — the distinct edge frame
    * persists once; each half-step is ONE equi-join (scores onto edges)
    * + ONE partial-aggregated groupBy. Returns
    * (role ∈ {authority, hub}, node, score) for every scored node. */
  def hitsBipartite(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 4,
      s"iterations $iterations must be in [1, 4] (scores grow like degree^k)")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist(sl)
    var h = e.select(col("src")).distinct()
      .withColumn("h", lit(1L).cast("decimal(38,0)"))
    var a = e.sparkSession.emptyDataFrame
    for (_ <- 1 to iterations) {
      a = e.join(h, "src").groupBy("dst").agg(sum(col("h")).as("a"))
      h = e.join(a, "dst").groupBy("src").agg(sum(col("a")).as("h"))
    }
    a.select(lit("authority").as("role"), col("dst").as("node"),
        col("a").as("score"))
      .unionByName(h.select(lit("hub").as("role"), col("src").as("node"),
        col("h").as("score")))
  }

  /** Per-node triangle participation over an UNDIRECTED edge set
    * (`edges` may list either or both directions; it is canonicalized to
    * a < b internally, self-loops dropped). Returns (node, n_triangles)
    * for every node in at least one triangle.
    *
    * Shape: the canonical edge frame joins itself twice — wedges
    * (a,b)x(b,c) closed by the (a,c) edge — every step an equi-join
    * Catalyst plans as a hash join. Each triangle {a<b<c} is found
    * exactly once, then credited to its three corners with one explode
    * (no distinct over pair sets). The per-order pair expansion that
    * BUILDS a co-occurrence edge list is the caller's concern
    * ([[DedupApprox.lshCandidatePairs]]-style caps apply there); here the
    * quadratic hazard is a hub vertex, which the wedge join bounds by
    * deg² of that hub — at real-graph skew, salt or pre-filter hubs
    * before calling. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tri = canon.as("e1")
      .join(canon.as("e2"), col("e1.b") === col("e2.a"))
      .join(canon.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-round k-core peeling over an UNDIRECTED edge set: `rounds`
    * synchronous iterations of "drop every node with degree < k and its
    * incident edges", returning the surviving nodes with their residual
    * degree. The dense-core extractor for community detection and for
    * pruning a near-dup graph down to its pathological knots before
    * deeper analysis.
    *
    * Fixed rounds, not a fixpoint loop, for the same reason
    * [[pageRank]] fixes iterations: every extra convergence check is a
    * driver round-trip, and the unrolled form is what an external
    * engine can replay exactly (the oracle contract). Peeling converges
    * monotonically — a node dropped in round r stays dropped — so
    * `rounds` only ever under-peels, never mis-peels; at corpus scale a
    * handful of rounds removes the overwhelming mass of the shell.
    *
    * Scale shape: each round is one degree aggregation (partial-
    * aggregated groupBy over the exploded endpoints) + two left-semi
    * hash joins filtering the edge frame; each round's survivor frame
    * persists so round r+1 reads a materialized frame, not a replayed
    * lineage. Plan depth grows linearly with `rounds` — bound it (<= 8)
    * or truncate lineage externally ([[Components]]-style checkpointing)
    * for deeper peels. */
  /** Synchronous label-propagation community detection (LPA): every
    * node starts as its own community and, for `iterations` rounds,
    * adopts the most frequent label among its NEIGHBORS from the
    * previous round (ties to the smallest label — the rule that makes
    * the async algorithm's order-dependence disappear, so reruns and
    * engines agree bit-for-bit). The cheap community pass for "which
    * template family / seller ring / topic cluster is this node in"
    * when CC is too coarse (everything touching anything merges) and
    * modularity solvers are too heavy.
    *
    * Edges are treated as UNDIRECTED (symmetrized internally, either
    * input orientation accepted); isolated input nodes never reach the
    * edge frame and are the caller's concern. Fixed synchronous rounds,
    * not convergence polling: each round is ONE join (labels onto
    * edges), ONE partial-aggregated (node, label) count, and one
    * WindowGroupLimit argmax per node — plan depth grows per round,
    * bound it (<= 10) or checkpoint externally. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations $iterations must be in [1, 10] (plan depth grows per round)")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val half = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter(col("s") =!= col("d"))
    val sym = half
      .unionByName(half.select(col("d").as("s"), col("s").as("d")))
      .distinct().persist(sl)
    // symmetry ⇒ every node appears as a source; one side suffices
    val nodes = sym.select(col("s").as("node")).distinct().persist(sl)
    var lab = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iterations) {
      val counts = sym.join(lab, sym("s") === lab("node"))
        .groupBy(sym("d").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node"))
        .orderBy(col("c").desc, col("label").asc)
      lab = counts.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("node"), col("label"))
    }
    lab
  }

  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(rounds >= 1 && rounds <= 8,
      s"rounds $rounds must be in [1, 8] (plan depth grows per round)")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node"))
        .union(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b")).distinct()
      .persist(sl)
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select("node")
      e = e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .persist(sl)
    }
    degrees(e)
  }

  /** Strongly connected components of a DIRECTED graph by iterative
    * partition refinement — the directed sibling of
    * [[graft.operators.Components.connectedComponents]] (which ignores
    * direction and merges everything a web-link or citation graph
    * should keep apart).
    *
    * Each phase runs min-label propagation to fixpoint along WITHIN-
    * CLASS edges in BOTH directions INDEPENDENTLY (the two propagations
    * share one within-class edge set and run CONCURRENTLY — neither
    * reads the other's output), then re-keys every class by the label
    * PAIR (new class id = min node of the (class, fwdLabel, bwdLabel)
    * group) — the FW-BW intersection argument, label-ified:
    *   - an SCC is never split: a propagation path between two members
    *     stays inside the SCC, hence inside their class, so both always
    *     see the same forward label and the same backward label;
    *   - any class that is NOT a single SCC is split: with m the class
    *     minimum, exactly SCC(m) has fwdLabel = bwdLabel = m (mutual
    *     reachability with m inside the class), so the rest lands in
    *     different pair-groups.
    * Phases are bounded by the condensation's chain depth; inner
    * propagation by O(log diameter) via pointer doubling — every step
    * is an equi-join + min-aggregation (both partial-aggregated), with
    * lineage truncated per round, the CC scale discipline. Inner
    * convergence is detected IN the round that converges (an observed
    * moved-count rides the truncation action — no confirming round, no
    * separate count job), and phase convergence reads off the class-id
    * sum (refinement only splits, so the sum is monotone).
    *
    * Output: `(node, scc)` with scc = the component's minimum node id. */
  def stronglyConnectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxPhases: Int = 20, maxIter: Int = 200,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    // HARD lineage truncation: localCheckpoint alone is not enough for a
    // doubly-nested iteration, because LogicalRDD deliberately inherits
    // the child plan's STATISTICS — and a self-join's size estimate is
    // the product of its inputs, so the estimate's bit-length DOUBLES
    // every round. After ~15 rounds the driver spends minutes in
    // BigInteger.multiply constant-folding statistics (observed via
    // jstack: Toom-Cook multiplication in the analyzer). Round-tripping
    // the checkpointed rows through an external RDD rebuilds the frame
    // with fresh default stats, capping planner cost at O(1) per round.
    // checkpointDir switches the truncation to RELIABLE checkpointing
    // (round state survives executor loss) — see [[truncator]].
    val seed = truncator(spark, checkpointDir)(
      edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      .where(col("s").isNotNull && col("d").isNotNull && col("s") =!= col("d"))
      .distinct())
    val edgeCount = seed.count()
    if (edgeCount == 0L)
      return seed.select(col("s").as("node"), col("s").as("scc"))
    // the refinement runs tens of TINY chained jobs; size their shuffle
    // parallelism to the graph instead of inheriting the session's
    // (32-to-hundreds of near-empty tasks per stage dominate wall time
    // on a small condensation) — ~100k edges per shuffle partition,
    // never above the caller's setting, so a trillion-edge graph keeps
    // its full parallelism. An isolated child session scopes the knob:
    // the caller's conf is never touched.
    val loop = spark.newSession()
    loop.conf.set("spark.sql.shuffle.partitions",
      math.max(1L, math.min(
        spark.sessionState.conf.numShufflePartitions.toLong,
        edgeCount / 100000L + 1L)).toString)
    // on a SMALL graph the refinement's wall time is pure per-stage
    // coordination, and AQE's stage-by-stage replanning is most of it
    // (each of a round's ~3 exchanges becomes a separately scheduled
    // and re-optimized query stage); a large graph keeps AQE — skew and
    // runtime re-plan matter there, coordination is amortized
    if (edgeCount < 1000000L && sys.env.get("GRAFT_SCC_AQE").isEmpty)
      loop.conf.set("spark.sql.adaptive.enabled", "false")
    // the unrolled K-hop plans are wide (2^K small nodes); bound the
    // UI/listener plan-description string so building it can never
    // dominate (or OOM) an action
    loop.conf.set("spark.sql.maxPlanStringLength", "100000")
    val truncate = truncator(loop, checkpointDir)
    val e = loop.createDataFrame(seed.rdd, seed.schema)
    val nodes = e.select(col("s").as("node"))
      .union(e.select(col("d").as("node"))).distinct()
    val dbg = sys.env.contains("GRAFT_SCC_DEBUG")
    def tms = System.nanoTime() / 1000000
    // min-label propagation to FIXPOINT along the within-class edges
    // `ec` (computed ONCE per phase, shared by both directions —
    // "bwd" just swaps the endpoints). Each round is one equi-join +
    // one min-aggregation, truncated, with convergence read off an
    // observed MOVED count on the same action: a round that moves no
    // label IS the fixpoint, detected without a confirming round.
    val hopsPerAction = math.max(1, spark.conf
      .getOption("spark.graft.scc.hopsPerAction")
      .orElse(sys.env.get("GRAFT_SCC_HOPS")).map(_.toInt).getOrElse(5))
    def propagate(cls: DataFrame, ec: DataFrame, dir: String): DataFrame = {
      val (from, to) = if (dir == "fwd") ("s", "d") else ("d", "s")
      val edgesDir = ec.select(col(from).as("src"), col(to).as("dst"))
      val nullL = lit(null).cast("long")
      // one HOP: pull the best label one step along a within-class
      // edge, plus a SELF stream carrying the node's current label,
      // class, and — on the convergence hop — the label entering the
      // hop. Every node has a self row, so ONE min/max aggregation
      // replaces the candidate-merge left join: min(c) is the new
      // label, max over the self-only columns recovers them. The jump
      // stream (lab(x) names a same-class node with a path to x — or
      // from x, in bwd — and reachability is transitive, so
      // lab(lab(x)) is also a valid label, shortcutting chains of
      // decreasing labels; a minimum crossing a cycle still needs edge
      // steps) runs only on the FIRST hop after a truncation boundary:
      // there the input is an O(1) LogicalRDD, so its two extra plan
      // references are free, while on inner unrolled hops they would
      // compound — each reference duplicates the whole unrolled
      // subtree at ANALYSIS time (persist dedups execution, not
      // planning), and 3^K-node trees make Catalyst the bottleneck.
      // Inner hops keep 2 references → 2^K SMALL nodes, still cheap.
      // below ~1M edges the label frame is megabytes — hint it as the
      // joins' build side so each hop spends one exchange (the agg)
      // instead of three; a big graph keeps shuffle joins (the hint
      // would collect the full label frame to the driver)
      def bc(df: DataFrame): DataFrame =
        if (edgeCount < 1000000L) broadcast(df) else df
      def hop(lab: DataFrame, withJump: Boolean,
          withPrev: Boolean): DataFrame = {
        val pull = edgesDir
          .join(bc(lab.select(col("node").as("src"), col("lab").as("c"))),
            "src")
          .select(col("dst").as("node"), nullL.as("cls"), col("c"),
            nullL.as("plab"))
        val cand = if (withJump) pull.unionByName(lab
            .join(bc(lab.select(col("node").as("jn"), col("lab").as("jl"))),
              col("lab") === col("jn"))
            .select(col("node"), nullL.as("cls"), col("jl").as("c"),
              nullL.as("plab")))
          else pull
        val self = lab.select(col("node"), col("cls"),
          col("lab").as("c"), col("lab").as("plab"))
        val agg = cand.unionByName(self)
          .groupBy("node")
          .agg(max(col("cls")).as("cls"), min(col("c")).as("lab"),
            max(col("plab")).as("plab"))
        if (withPrev) agg else agg.drop("plab")
      }
      var lab = cls.withColumn("lab", col("node"))
      var it = 0
      var converged = false
      while (!converged && it < maxIter) {
        // K hops per driver action — the q224/q226 lazy-unrolling trick
        // (min spreading is diameter-bound on cycles, and the per-
        // action fixed cost of scheduling + truncation dominates at
        // condensation scale). Intermediate hops persist (a hop reads
        // its input twice — edge pull and self — so an unpersisted
        // chain recomputes exponentially in K); the convergence signal
        // rides the action as an observed metric on the LAST hop's
        // carried previous label: a final hop that moves NOTHING means
        // its input was already a fixpoint, and the final frame equals
        // it — so moved == 0 is exactly convergence.
        val k = math.min(hopsPerAction, math.max(1, maxIter - it))
        val mids = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        var cur = lab
        var i = 0
        while (i < k - 1) {
          val m = hop(cur, withJump = i == 0, withPrev = false).persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          mids += m
          cur = m
          i += 1
        }
        val obs = org.apache.spark.sql.Observation()
        val next =
          try truncate(hop(cur, withJump = k == 1, withPrev = true)
            .observe(obs,
              sum(when(col("lab") < col("plab"), 1L).otherwise(0L))
                .as("moved"))
            .drop("plab"))
          finally mids.foreach(_.unpersist(false))
        // a runtime-empty observed subtree can be pruned under AQE —
        // a missing key therefore MEANS nothing moved
        val moved = obs.get.getOrElse("moved", null) match {
          case null => 0L
          case v: java.lang.Long => v.longValue()
          case v => v.asInstanceOf[Long]
        }
        if (dbg)
          System.err.println(s"[scc] dir=$dir it=$it k=$k moved=$moved t=$tms")
        converged = moved == 0L
        lab = next
        it += k
      }
      require(converged,
        s"SCC label propagation unconverged after $maxIter rounds")
      lab
    }
    var cls = truncate(nodes.withColumn("cls", lit(0L)))
    var phase = 0
    var moving = true
    // refinement only SPLITS classes (new id = min node of the refined
    // subgroup), so every node's class id is non-decreasing and the
    // class-id SUM is strictly monotone while anything still moves —
    // phase convergence reads off an observed metric on the refine's
    // own truncation action instead of a dedicated change-count job
    var clsSum: java.math.BigDecimal = java.math.BigDecimal.ZERO
    while (moving && phase < maxPhases) {
      val t0 = tms
      // within-class edges ONCE per phase (classes are frozen inside a
      // phase; phase 0 has everything in one class, so EVERY edge
      // qualifies and the class-lookup joins are skipped). TRUNCATED,
      // not just persisted: every unrolled hop of both directions
      // references it, so it must be an O(1) plan node or the
      // class-lookup joins reappear K times in every action's tree.
      val ecBase = if (phase == 0) e
        else truncate(e
          .join(cls.select(col("node").as("s"), col("cls").as("sc")), "s")
          .join(cls.select(col("node").as("d"), col("cls").as("dc")), "d")
          .filter(col("sc") === col("dc"))
          .select(col("s"), col("d")))
      val ec = ecBase
      val (pf, pb, t1) = {
        // the two directions are INDEPENDENT (both start from `cls`,
        // neither reads the other), so they overlap on the cluster
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        val fwdF = Future(propagate(cls, ec, "fwd"))(graphEc)
        val b = propagate(cls, ec, "bwd")
        val f =
          try Await.result(fwdF, Duration.Inf)
          catch { case t: Throwable =>
            scala.util.Try(Await.ready(fwdF, Duration.Inf)); throw t }
        (f, b, tms)
      }
      // refine by the label PAIR: new class id = min node over the
      // (class, fwdLabel, bwdLabel) group — the FW-BW intersection
      val pair = pf.select(col("node"), col("cls"), col("lab").as("fl"))
        .join(pb.select(col("node"), col("lab").as("bl")), "node")
      val key = struct(col("cls"), col("fl"), col("bl"))
      val obs = org.apache.spark.sql.Observation()
      val refined = truncate(pair.withColumn("g", key)
        .select(col("node"), col("g"))
        .join(pair.groupBy(col("cls"), col("fl"), col("bl"))
          .agg(min(col("node")).as("newCls"))
          .withColumn("g", key)
          .select(col("g"), col("newCls")), "g")
        .select(col("node"), col("newCls").as("cls"))
        .observe(obs, sum(col("cls").cast("decimal(38,0)")).as("s")))
      val cur = obs.get("s").asInstanceOf[java.math.BigDecimal]
      // phase 0's baseline (the literal all-zero class) is not
      // member-derived, so its sum carries no monotonicity guarantee —
      // always run a confirming phase 1
      moving = phase == 0 || cur.compareTo(clsSum) != 0
      clsSum = cur
      if (dbg) System.err.println(
        s"[scc] phase=$phase prop=${t1 - t0} refine=${tms - t1} moving=$moving")
      cls = refined
      phase += 1
    }
    require(!moving, s"SCC refinement unconverged after $maxPhases phases")
    // re-root the result in the CALLER's session (the loop ran under
    // the tuned child session; handing its frame back would leak the
    // child's conf into downstream plans)
    val out = cls.select(col("node"), col("cls").as("scc"))
    spark.createDataFrame(out.rdd, out.schema)
  }

  /** Executor for the concurrent propagation directions of
    * [[stronglyConnectedComponents]] — daemon threads, jobs overlap on
    * the scheduler's slack. */
  private lazy val graphEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(
        (r: Runnable) => {
          val t = new Thread(r, "graph-scc")
          t.setDaemon(true)
          t
        }))

  /** Bounded-hop BFS distances from a SOURCE SET along directed edges:
    * `(node, dist)` with dist = minimum hops <= maxHops (unreached nodes
    * absent). The blast-radius primitive — "everything within k hops of
    * these seeds" (contamination spread through a derivation graph,
    * link-graph crawl frontiers, dependency fallout).
    *
    * Deliberately FIXED-HOP, like [[pageRank]]'s fixed iterations: the
    * k rounds unroll LAZILY (one equi-join + one min-aggregation each),
    * with a stats-resetting truncation every 4 rounds — so the whole
    * expansion runs as ~maxHops/4 jobs, no per-round convergence
    * actions. Fixed hops also makes the result an exact finite object
    * an external engine can replay (the oracle contract); unbounded
    * BFS is maxHops >= diameter. */
  def boundedHopDistances(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, sourceCol: String, maxHops: Int,
      checkpointDir: Option[String] = None): DataFrame =
    boundedCostDistances(edges.withColumn("_w", lit(1L)), srcCol, dstCol,
      "_w", sources, sourceCol, maxHops, checkpointDir)

  /** Weighted shortest-path costs (Bellman-Ford relaxation) from a seed
    * set: `(node, dist)` = minimum total edge weight over paths of at
    * most `rounds` edges. Non-negative integer weights keep every cost
    * an exact long — no float accumulation anywhere. Same lazily
    * unrolled shape as [[boundedHopDistances]] (which is this with
    * weight 1): one equi-join + one min-aggregation per round,
    * stats-resetting truncation every 4 rounds, ~rounds/4 jobs total.
    * `rounds >= longest-useful-path` makes the answer exact shortest
    * path; fewer rounds is the bounded-effort approximation, exact over
    * the admitted path lengths. */
  def boundedCostDistances(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sources: DataFrame, sourceCol: String,
      rounds: Int, checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds $rounds must be in [1, 64]")
    val spark = edges.sparkSession
    val truncate = truncator(spark, checkpointDir)
    // negative (or NULL) weights break the non-negative relaxation
    // invariant — fail LOUDLY instead of silently dropping those edges
    // and returning plausible-but-wrong costs. The audit count rides the
    // truncation action as an observed metric: zero extra jobs.
    val badW = org.apache.spark.sql.Observation()
    val e = truncate(edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"),
        col(weightCol).cast("long").as("w"))
      .where(col("s").isNotNull && col("d").isNotNull)
      .observe(badW, sum(when(col("w").isNull || col("w") < 0L, 1L)
        .otherwise(0L)).as("n_bad"))
      .where(col("w") >= 0L)
      .groupBy("s", "d").agg(min(col("w")).as("w"))) // parallel edges: keep cheapest
    val nBad = Option(badW.get("n_bad")).fold(0L)(_.asInstanceOf[Long])
    require(nBad == 0L,
      s"$nBad edges carry a NULL or negative '$weightCol': Bellman-Ford " +
        "relaxation over longs requires non-negative integer weights — " +
        "clean or clamp the weight column explicitly before calling")
    var dist = sources.select(col(sourceCol).cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L))
    for (h <- 1 to rounds) {
      dist = dist.unionByName(
          e.join(dist.select(col("node").as("s"), col("dist")), "s")
            .select(col("d").as("node"), (col("dist") + col("w")).as("dist")))
        .groupBy("node").agg(min(col("dist")).as("dist"))
      if (h % 4 == 0 || h == rounds) dist = truncate(dist)
    }
    dist
  }

  /** TIME-RESPECTING reachability: earliest arrival at each node over
    * paths whose edge times are NONDECREASING — how information (or
    * contamination) actually flows through timed interactions: a
    * Tuesday edge cannot carry influence that only arrived on
    * Wednesday. Plain reachability (q224) overstates spread on temporal
    * graphs, sometimes wildly.
    *
    * `(node, arrival)` = minimum time of the last edge on any valid
    * path of at most `rounds` edges from a seed (seeds arrive at
    * `startTime`). Earlier arrival admits a superset of onward edges
    * (t >= arrival), so min-arrival has optimal substructure and the
    * relaxation is exact over the admitted path lengths. Same lazily
    * unrolled shape as the other bounded walks: one theta-join
    * (equi on node + the time gate) + one min-aggregation per round. */
  def temporalReachability(edges: DataFrame, srcCol: String, dstCol: String,
      timeCol: String, sources: DataFrame, sourceCol: String,
      startTime: Long, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds $rounds must be in [1, 64]")
    val spark = edges.sparkSession
    val truncate = truncator(spark, checkpointDir)
    val e = truncate(edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"),
        col(timeCol).cast("long").as("t"))
      .where(col("s").isNotNull && col("d").isNotNull && col("t").isNotNull)
      .distinct())
    var arr = sources.select(col(sourceCol).cast("long").as("node")).distinct()
      .withColumn("arrival", lit(startTime))
    for (h <- 1 to rounds) {
      arr = arr.unionByName(
          e.join(arr.select(col("node").as("s"), col("arrival")), "s")
            .filter(col("t") >= col("arrival")) // the time gate
            .select(col("d").as("node"), col("t").as("arrival")))
        .groupBy("node").agg(min(col("arrival")).as("arrival"))
      if (h % 4 == 0 || h == rounds) arr = truncate(arr)
    }
    arr
  }
}
