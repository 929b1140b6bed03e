package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side Tarjan — independent ground truth for the distributed
    * SCC refinement. */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val idx = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.Stack[Long]()
    val out = scala.collection.mutable.Map[Long, Long]()
    var counter = 0
    def strong(v: Long): Unit = {
      idx(v) = counter; low(v) = counter; counter += 1
      stack.push(v); onStack += v
      adj.getOrElse(v, Seq.empty).foreach { w =>
        if (!idx.contains(w)) { strong(w); low(v) = math.min(low(v), low(w)) }
        else if (onStack(w)) low(v) = math.min(low(v), idx(w))
      }
      if (low(v) == idx(v)) {
        val comp = scala.collection.mutable.Buffer[Long]()
        var w = -1L
        while ({ w = stack.pop(); onStack -= w; comp += w; w != v }) ()
        val m = comp.min
        comp.foreach(out(_) = m)
      }
    }
    nodes.foreach(v => if (!idx.contains(v)) strong(v))
    out.toMap
  }

  test("SCC: cycles merge, chains stay singleton, direction respected") {
    // two 3-cycles bridged one-way, plus a pure chain and a 2-cycle
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),       // SCC {1,2,3}
      (3L, 10L),                          // one-way bridge
      (10L, 11L), (11L, 12L), (12L, 10L), // SCC {10,11,12}
      (20L, 21L), (21L, 22L),             // chain: singletons
      (30L, 31L), (31L, 30L)              // SCC {30,31}
    )
    val got = Graph.stronglyConnectedComponents(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == tarjan(edges))
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(12L) == 10L)
    assert(got(20L) == 20L && got(21L) == 21L && got(22L) == 22L,
      "an undirected-CC merge here would be wrong: the chain has no cycles")
    assert(got(30L) == 30L && got(31L) == 30L)
  }

  test("boundedHopDistances: min hops, seed-set semantics, cap and reachability") {
    // 1 -> 2 -> 3 -> 4 -> 5, shortcut 1 -> 3, island 9 -> 10, back-edge 5 -> 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L),
      (9L, 10L), (5L, 1L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("n")
    val got = Graph.boundedHopDistances(edges, "s", "d", seeds, "n", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shortcut wins: 3 is one hop, not two; 5 (3 hops via the shortcut)
    // sits beyond the 2-hop cap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L),
      s"got $got")
    // raising the cap reaches 5, and the 5 -> 1 back-edge cannot shrink
    // the seed's own distance below zero
    val far = Graph.boundedHopDistances(edges, "s", "d", seeds, "n", maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(far(5L) == 3L && far(1L) == 0L && !far.contains(9L) && !far.contains(10L))
    // multiple seeds: every node takes the CLOSEST seed
    val multi = Graph.boundedHopDistances(edges, "s", "d",
      Seq(1L, 4L).toDF("n"), "n", maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi(5L) == 1L && multi(3L) == 1L)
  }

  test("boundedCostDistances: cheap long way beats short expensive way") {
    // 1 -> 4 direct costs 10; 1 -> 2 -> 3 -> 4 costs 3; parallel edge
    // 1 -> 2 at cost 7 must lose to the cost-1 copy
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (1L, 2L, 7L),
      (2L, 3L, 1L), (3L, 4L, 1L)).toDF("s", "d", "w")
    val seeds = Seq(1L).toDF("n")
    val got = Graph.boundedCostDistances(edges, "s", "d", "w", seeds, "n",
      rounds = 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), s"got $got")
    // with only ONE relaxation round, just the direct edges are
    // admissible — the bounded-effort semantics, not an approximation bug
    val one = Graph.boundedCostDistances(edges, "s", "d", "w", seeds, "n",
      rounds = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(4L) == 10L && one(2L) == 1L)
  }

  test("temporalReachability: nondecreasing-time gate, earliest arrivals") {
    // 1 -(t5)-> 2 -(t3)-> 3 : the 2->3 edge fires BEFORE influence
    // reaches 2, so 3 is temporally unreachable via that path;
    // 1 -(t1)-> 4 -(t2)-> 3 is time-respecting and arrives at t2
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 3L), (1L, 4L, 1L), (4L, 3L, 2L),
      (3L, 5L, 1L) // fires at t1 < arrival(3)=2: 5 stays unreachable
    ).toDF("s", "d", "t")
    val got = Graph.temporalReachability(edges, "s", "d", "t",
      Seq(1L).toDF("n"), "n", startTime = 0L, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 2L, 4L -> 1L), s"got $got")
    // a later start time closes the early edges: only the t5 edge admits
    val late = Graph.temporalReachability(edges, "s", "d", "t",
      Seq(1L).toDF("n"), "n", startTime = 4L, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(late == Map(1L -> 4L, 2L -> 5L), s"late $late")
    // sanity: plain BFS would reach node 5 — the time gate is the
    // difference, not connectivity
    val bfs = Graph.boundedHopDistances(edges.select("s", "d"), "s", "d",
      Seq(1L).toDF("n"), "n", maxHops = 5)
      .collect().map(_.getLong(0)).toSet
    assert(bfs.contains(5L) && !got.contains(5L))
  }

  test("SCC agrees with Tarjan on a pseudo-random functional graph") {
    // k -> 3k+1 mod 31 plus chords: rho-shaped cycles, nontrivial
    // condensation. Kept small because each propagation round moves a
    // min label ONE edge — wall-clock is rounds x job latency in a
    // local test, though each round is a single shuffle at any scale.
    val edges = ((0L until 31L).map(k => (k, (3 * k + 1) % 31)) ++
      (0L until 31L by 5).map(k => (k, (k + 7) % 31))).filter(e => e._1 != e._2)
    val got = Graph.stronglyConnectedComponents(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == tarjan(edges))
  }

  test("pageRank: center of a symmetric star outranks leaves, mass ~1") {
    // undirected star 1-{2,3,4}: both directions listed explicitly
    val ed = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val sym = (ed ++ ed.map(_.swap)).toDF("src", "dst")
    val pr = Graph.pageRank(sym, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 4)
    assert(pr(1L) > pr(2L) && pr(2L) == pr(3L) && pr(3L) == pr(4L))
    // symmetric graph has no dangling nodes: total mass conserved up to
    // the 1e-12 contribution lattice
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    intercept[IllegalArgumentException] {
      Graph.pageRank(sym, "src", "dst", iterations = 0)
    }
  }

  test("pageRank: dangling sink still ranks above its feeder") {
    // 1 -> 2 only: 2 accumulates 1's mass, 2's own mass leaks (dangling)
    val pr = Graph.pageRank(Seq((1L, 2L)).toDF("s", "d"), "s", "d",
      iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(2L) > pr(1L))
  }

  test("hitsBipartite: hand-unrolled integer scores, duplicate edges collapse") {
    // c1 -> {s1, s2}, c2 -> s1 (listed twice — must dedupe):
    // a1 = indeg: s1=2, s2=1; h1: c1=3, c2=2; a2: s1=5, s2=3; h2: c1=8, c2=5
    val edges = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"), ("c2", "s1"))
      .toDF("c", "s")
    val out = Graph.hitsBipartite(edges, "c", "s", iterations = 2)
      .select($"role", $"node", $"score".cast("long"))
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(
      ("authority", "s1", 5L), ("authority", "s2", 3L),
      ("hub", "c1", 8L), ("hub", "c2", 5L)), s"was $out")
    // one iteration: authority is plain in-degree
    val one = Graph.hitsBipartite(edges, "c", "s", iterations = 1)
      .filter($"role" === "authority")
      .select($"node", $"score".cast("long")).as[(String, Long)].collect().toMap
    assert(one == Map("s1" -> 2L, "s2" -> 1L))
  }

  test("triangleCounts: square with one diagonal, direction/dup agnostic") {
    // 1-2-3-4-1 plus diagonal 1-3: triangles {1,2,3} and {1,3,4};
    // reversed and duplicated edges must not change anything
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (4L, 1L), (1L, 3L),
      (2L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges, "src", "dst")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L)))
    // self-loops never form triangles
    val loops = edges.unionAll(Seq((2L, 2L)).toDF("src", "dst"))
    assert(Graph.triangleCounts(loops, "src", "dst")
      .agg(sum("n_triangles")).head().getLong(0) == 6L)
  }

  test("kCorePeel: peels the pendant chain off a 4-clique, round by round") {
    // 4-clique {1,2,3,4} + chain 4-5-6; reversed + duplicate edges and a
    // self-loop must not perturb the canonicalized simple graph
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L),
      (2L, 1L), (4L, 3L), (5L, 5L)).toDF("src", "dst")
    def run(k: Int, rounds: Int) =
      Graph.kCorePeel(edges, "src", "dst", k, rounds)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // round 1 drops only 6 (deg 1); 5 survives at deg 2, then shows deg 1
    assert(run(k = 2, rounds = 1) ==
      Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 4L), (5L, 1L)))
    // round 2 peels 5; the clique is the 2-core (and the 3-core)
    assert(run(k = 2, rounds = 2) ==
      Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // extra rounds are a fixpoint no-op once converged
    assert(run(k = 2, rounds = 4) == run(k = 2, rounds = 2))
    // k above the max degree empties the graph
    assert(run(k = 5, rounds = 2).isEmpty)
  }

  test("labelPropagation: two cliques joined by a bridge separate; ties go low") {
    // cliques {1,2,3} and {4,5,6} with bridge 3-4; reversed/duplicate
    // edges and a self-loop must not perturb the symmetrized graph
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L),
      (2L, 1L), (6L, 4L), (5L, 5L)).toDF("src", "dst")
    def labels(iters: Int): Map[Long, Long] =
      Graph.labelPropagation(edges, "src", "dst", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1, node by node (neighbor labels, ties to smallest):
    // 1:{2,3}->2  2:{1,3}->1  3:{1,2,4}->1  4:{3,5,6}->3  5:{4,6}->4  6:{4,5}->4
    assert(labels(1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      5L -> 4L, 6L -> 4L))
    // two more synchronous rounds settle each clique onto one label —
    // hand-unrolled: l2 = {1:1,2:1,3:1,4:4,5:3,6:3}, then round 3
    // resolves the bridge side to its clique
    assert(labels(3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      5L -> 3L, 6L -> 3L))
    // determinism: same input, same labels, every run
    assert(labels(3) == labels(3))
  }

  test("reliable-checkpoint mode matches localCheckpoint mode on every iterative walk") {
    // same graphs through both truncation modes — results must be
    // bit-identical; only the fault-tolerance of round state differs
    // (the ComponentsSamplingSpec pattern, extended to Graph's walks)
    val sccEdges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 10L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L))
    val costEdges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 4L, 1L)).toDF("s", "d", "w")
    val tEdges = Seq((1L, 2L, 5L), (2L, 3L, 3L), (1L, 4L, 1L), (4L, 3L, 2L))
      .toDF("s", "d", "t")
    val seeds = Seq(1L).toDF("n")
    val ckDir = java.nio.file.Files.createTempDirectory("graft_graph_ck").toString
    try {
      def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m(Graph.stronglyConnectedComponents(sccEdges.toDF("s", "d"),
          "s", "d", checkpointDir = Some(ckDir))) ==
        m(Graph.stronglyConnectedComponents(sccEdges.toDF("s", "d"), "s", "d")))
      assert(m(Graph.boundedCostDistances(costEdges, "s", "d", "w", seeds, "n",
          rounds = 5, checkpointDir = Some(ckDir))) ==
        m(Graph.boundedCostDistances(costEdges, "s", "d", "w", seeds, "n",
          rounds = 5)))
      assert(m(Graph.temporalReachability(tEdges, "s", "d", "t", seeds, "n",
          startTime = 0L, rounds = 5, checkpointDir = Some(ckDir))) ==
        m(Graph.temporalReachability(tEdges, "s", "d", "t", seeds, "n",
          startTime = 0L, rounds = 5)))
      // round state actually went through the reliable dir, and repeated
      // truncations reused ONE checkpoint root (the prefix-test guard:
      // an equality test would mint a UUID subdir per round)
      val subdirs = new java.io.File(ckDir).listFiles
      assert(subdirs != null && subdirs.nonEmpty,
        s"no checkpoint data written under $ckDir")
      assert(subdirs.length == 1,
        s"expected one checkpoint UUID root, got ${subdirs.length}: " +
          "setCheckpointDir is being re-called per round")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckDir))
    }
  }

  test("boundedCostDistances rejects NULL and negative weights loudly") {
    val seeds = Seq(1L).toDF("n")
    val neg = Seq((1L, 2L, 3L), (2L, 3L, -1L)).toDF("s", "d", "w")
    val errNeg = intercept[IllegalArgumentException] {
      Graph.boundedCostDistances(neg, "s", "d", "w", seeds, "n", rounds = 2)
        .collect()
    }
    assert(errNeg.getMessage.contains("negative"))
    val nul = Seq((1L, 2L, java.lang.Long.valueOf(3L)),
      (2L, 3L, null.asInstanceOf[java.lang.Long])).toDF("s", "d", "w")
    val errNul = intercept[IllegalArgumentException] {
      Graph.boundedCostDistances(nul, "s", "d", "w", seeds, "n", rounds = 2)
        .collect()
    }
    assert(errNul.getMessage.contains("NULL"))
  }
}
