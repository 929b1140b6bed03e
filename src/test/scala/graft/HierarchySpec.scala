package graft

import org.apache.spark.sql.functions._
import graft.operators.Hierarchy

/** Pointer-doubling hierarchy resolution: roots, depths, subtree
  * rollups, and the failure modes (cycles, dangling parents) — the
  * recursive-CTE surface. */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("deep chain resolves with exact depths in O(log depth) rounds") {
    // 1 <- 2 <- 3 <- ... <- 200: depth(k) = k-1, all rooted at 1. A
    // parent-at-a-time walk needs 199 rounds; doubling must finish well
    // inside maxIter=10 (2^10 = 1024 depth capacity proves the doubling
    // actually doubles — a linear walk would trip the require).
    val nodes = (1L to 200L).map(k => (k, if (k == 1) 1L else k - 1))
      .toDF("node", "parent")
    val out = Hierarchy.rootsAndDepths(nodes, "node", "parent", maxIter = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 200)
    (1L to 200L).foreach { k => assert(out(k) == (1L, k - 1)) }
  }

  test("forest: NULL parent and self-parent both mean root") {
    val nodes = Seq(
      (10L, null.asInstanceOf[java.lang.Long]), // NULL parent root
      (20L, java.lang.Long.valueOf(20L)),       // self-parent root
      (11L, java.lang.Long.valueOf(10L)),
      (21L, java.lang.Long.valueOf(20L)),
      (22L, java.lang.Long.valueOf(21L))
    ).toDF("node", "parent")
    val out = Hierarchy.rootsAndDepths(nodes, "node", "parent")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(10L) == (10L, 0L) && out(20L) == (20L, 0L))
    assert(out(11L) == (10L, 1L))
    assert(out(21L) == (20L, 1L) && out(22L) == (20L, 2L))
  }

  test("dangling parent becomes the root instead of dropping the node") {
    // 5's parent 99 has no row of its own (forest cut at a missing
    // ancestor): an inner-join walk would silently lose node 5
    val nodes = Seq((5L, 99L), (6L, 5L)).toDF("node", "parent")
    val out = Hierarchy.rootsAndDepths(nodes, "node", "parent")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(5L) == (99L, 1L))
    assert(out(6L) == (99L, 2L))
  }

  test("parent-pointer cycle fails loudly, never mislabels") {
    val nodes = Seq((1L, 2L), (2L, 1L)).toDF("node", "parent")
    val e = intercept[IllegalArgumentException] {
      Hierarchy.rootsAndDepths(nodes, "node", "parent", maxIter = 5)
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("subtreeRollup: counts, max depth, and exact value totals per root") {
    val nodes = Seq(
      (1L, 1L, 10.5), (2L, 1L, 1.25), (3L, 1L, 2.25), (4L, 2L, 0.5),
      (7L, 7L, 100.0), (8L, 7L, 0.125)
    ).toDF("node", "parent", "bal")
    val out = Hierarchy.subtreeRollup(nodes, "node", "parent", "bal")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (4L, 2L, 14.5))
    assert(out(7L) == (2L, 1L, 100.125))
  }

  test("doubling agrees with a naive parent-at-a-time walk on a random forest") {
    // deterministic pseudo-random forest: parent(k) = k/7 (k>10 — always
    // < k, so acyclic), roots 1..10. Naive walk = ground truth.
    val n = 500
    val parents = (1 to n).map(k => k.toLong ->
      (if (k <= 10) k.toLong else (k / 7).toLong)).toMap
    def naive(k: Long): (Long, Long) = {
      var cur = k; var d = 0L
      while (parents(cur) != cur) { cur = parents(cur); d += 1 }
      (cur, d)
    }
    val nodes = parents.toSeq.toDF("node", "parent")
    val out = Hierarchy.rootsAndDepths(nodes, "node", "parent")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (1 to n).foreach { k => assert(out(k.toLong) == naive(k.toLong), s"node $k") }
  }
}
