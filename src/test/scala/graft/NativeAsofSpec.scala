package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin
import graft.plans.AsofJoinNative

/** Native as-of join ([[graft.plans.AsofJoinNative]]) — the custom
  * LogicalPlan → Strategy → SparkPlan stack — must agree bit-for-bit
  * with the composed [[graft.operators.AsofJoin]] on every edge the
  * composed operator documents, and must plan as a single co-partitioned
  * merge (no window, no union). q260 holds it to the DuckDB oracle. */
class NativeAsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // edge fixture: equal-ts match, right-less key, null left key/ts rows,
  // null right key/ts rows (excluded), multiple candidates per left row
  private lazy val left = Seq(
    (Some(1L), Some(ts("2024-01-01 10:00:00")), "l1"),
    (Some(1L), Some(ts("2024-01-01 12:00:00")), "l2"),
    (Some(1L), Some(ts("2024-01-01 09:00:00")), "l0"), // before any right
    (Some(2L), Some(ts("2024-01-02 00:00:00")), "l3"), // right-less key
    (None, Some(ts("2024-01-01 10:00:00")), "lnullkey"),
    (Some(3L), None, "lnullts"),
    (Some(3L), Some(ts("2024-01-03 00:00:00")), "l4")
  ).toDF("k", "t", "tag")

  private lazy val right = Seq(
    (Some(1L), Some(ts("2024-01-01 10:00:00")), Some(10.0)), // equal-ts: matches l1
    (Some(1L), Some(ts("2024-01-01 11:30:00")), Some(11.5)),
    (Some(1L), Some(ts("2024-01-01 11:00:00")), Some(11.0)),
    (Some(3L), Some(ts("2024-01-02 23:00:00")), None), // matched row with NULL value
    (None, Some(ts("2024-01-01 00:00:00")), Some(99.0)), // null key: never matches
    (Some(1L), None, Some(98.0)) // null ts: never matches
  ).toDF("k", "rt", "v")

  test("agrees with the composed as-of join on every documented edge") {
    val nat = AsofJoinNative.backward(left, right, "k", "t", "rt", Seq("v"))
    val comp = AsofJoin.backward(left, right, "k", "t", "rt", Seq("v"))
    assert(nat.columns.toSeq == comp.columns.toSeq)
    assertSameRows(nat, comp)
    // spot semantics: equal ts matches, null-value rows come through as
    // matched-with-null (never patched from an older candidate)
    val byTag = nat.collect().map(r => r.getAs[String]("tag") ->
      (Option(r.getAs[java.sql.Timestamp]("asof_ts")), Option(r.getAs[Any]("v")))).toMap
    assert(byTag("l1") == (Some(ts("2024-01-01 10:00:00")), Some(10.0)))
    assert(byTag("l2") == (Some(ts("2024-01-01 11:30:00")), Some(11.5)))
    assert(byTag("l0") == (None, None))
    assert(byTag("l3") == (None, None))
    assert(byTag("lnullkey") == (None, None))
    assert(byTag("lnullts") == (None, None))
    assert(byTag("l4") == (Some(ts("2024-01-02 23:00:00")), None))
  }

  test("plans as one co-partitioned merge: no window, no union") {
    val nat = AsofJoinNative.backward(left, right, "k", "t", "rt", Seq("v"))
    nat.collect() // finalize the AQE plan
    val plan = nat.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val s = plan.toString
    assert(s.contains("AsofJoin"), s)
    assert(!s.contains("Window") && !s.contains("Union"), s)
    // one hash exchange per side on the key, and the per-side sorts
    // planted by EnsureRequirements from the declared ordering (AQE may
    // wrap the exec in query-stage leaves, so assertions are textual)
    assert(s.split("hashpartitioning").length - 1 >= 2, s)
    assert(s.split("Sort \\[").length - 1 == 2, s)
    assert("AsofJoin\\b".r.findFirstIn(s).isDefined, s)
  }

  test("string keys and many rows per key stay exact vs the composed form") {
    val l = spark.range(500).select(
      concat(lit("u"), ($"id" % 7).cast("string")).as("k"),
      to_timestamp(lit("2024-01-01 00:00:00")).plus(
        expr("make_interval(0, 0, 0, 0, 0, 0, id * 37 % 86400)")).as("t"),
      $"id".as("lid"))
    val r = spark.range(200).select(
      concat(lit("u"), ($"id" % 9).cast("string")).as("k"),
      to_timestamp(lit("2024-01-01 00:00:00")).plus(
        expr("make_interval(0, 0, 0, 0, 0, 0, id * 101 % 86400)")).as("rt"),
      ($"id" * 2).cast("double").as("v"))
      .groupBy("k", "rt").agg(max($"v").as("v")) // unique per (key, ts)
    assertSameRows(
      AsofJoinNative.backward(l, r, "k", "t", "rt", Seq("v")),
      AsofJoin.backward(l, r, "k", "t", "rt", Seq("v")))
  }

  test("forward direction: earliest at-or-after, same edge discipline") {
    val out = AsofJoinNative.forward(left, right, "k", "t", "rt", Seq("v"))
    val byTag = out.collect().map(r => r.getAs[String]("tag") ->
      (Option(r.getAs[java.sql.Timestamp]("asof_ts")), Option(r.getAs[Any]("v")))).toMap
    // equal ts matches itself; l0 (09:00) gets the 10:00 row; l2 (12:00)
    // has nothing after it; null key/ts never match; l4 precedes nothing
    assert(byTag("l1") == (Some(ts("2024-01-01 10:00:00")), Some(10.0)))
    assert(byTag("l0") == (Some(ts("2024-01-01 10:00:00")), Some(10.0)))
    assert(byTag("l2") == (None, None))
    assert(byTag("l3") == (None, None))
    assert(byTag("lnullkey") == (None, None))
    assert(byTag("lnullts") == (None, None))
    assert(byTag("l4") == (None, None))
  }

  test("forward agrees with a theta-join reference on randomized data") {
    val l = spark.range(300).select(
      concat(lit("u"), ($"id" % 5).cast("string")).as("k"),
      to_timestamp(lit("2024-01-01 00:00:00")).plus(
        expr("make_interval(0, 0, 0, 0, 0, 0, id * 41 % 5000)")).as("t"),
      $"id".as("lid"))
    val r = spark.range(120).select(
      concat(lit("u"), ($"id" % 8).cast("string")).as("k"),
      to_timestamp(lit("2024-01-01 00:00:00")).plus(
        expr("make_interval(0, 0, 0, 0, 0, 0, id * 97 % 5000)")).as("rt"),
      ($"id" * 3).cast("double").as("v"))
      .groupBy("k", "rt").agg(max($"v").as("v"))
    val nat = AsofJoinNative.forward(l, r, "k", "t", "rt", Seq("v"))
    val ref = l.as("l").join(r.as("r"),
        $"l.k" === $"r.k" && $"l.t" <= $"r.rt", "left")
      .groupBy($"l.k", $"l.t", $"l.lid")
      .agg(min(struct($"r.rt", $"r.v")).as("m"))
      .select($"k", $"t", $"lid", $"m.rt".as("asof_ts"), $"m.v".as("v"))
    assertSameRows(nat, ref)
  }

  test("rejects colliding output names and mismatched types") {
    val bad = left.withColumnRenamed("tag", "asof_ts")
    val e = intercept[IllegalArgumentException] {
      AsofJoinNative.backward(bad, right, "k", "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
    val badTs = right.withColumn("rt", $"rt".cast("string"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoinNative.backward(left, badTs, "k", "t", "rt", Seq("v"))
    }
    assert(e2.getMessage.contains("timestamp types differ"))
  }

  test("self-source both sides (shared exprIds) resolves cleanly") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"), "a", 1.0),
      (1L, ts("2024-01-01 11:00:00"), "b", 2.0))
      .toDF("k", "t", "cls", "v")
    val l = ev.filter($"cls" === "b").select("k", "t")
    val r = ev.filter($"cls" === "a").select($"k", $"t".as("rt"), $"v")
    val out = AsofJoinNative.backward(l, r, "k", "t", "rt", Seq("v")).collect()
    assert(out.length == 1 && out(0).getAs[Double]("v") == 1.0)
  }
}
