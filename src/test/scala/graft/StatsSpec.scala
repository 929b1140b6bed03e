package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Approximate aggregates stay within their error bounds of the exact
  * forms on real data (sf0.001 orders/lineitem). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("approx quantiles track exact percentiles") {
    val approx = Stats.approxQuantiles(orders, Seq("o_orderstatus"),
      "o_totalprice", Seq(0.5, 0.9))
      .select($"o_orderstatus", $"quantiles"(0).as("p50"), $"quantiles"(1).as("p90"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = orders.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    for ((k, (a50, a90)) <- approx) {
      assert(math.abs(a50 - exact(k)._1) / exact(k)._1 < 0.05, s"$k p50")
      assert(math.abs(a90 - exact(k)._2) / exact(k)._2 < 0.05, s"$k p90")
    }
  }

  test("approx distinct within rsd of exact; HLL sketches merge across groups") {
    val approx = Stats.approxDistinct(orders, Seq("o_orderstatus"), "o_custkey")
      .as[(String, Long)].collect().toMap
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("n")).as[(String, Long)].collect().toMap
    for ((k, a) <- approx)
      assert(math.abs(a - exact(k)).toDouble / exact(k) < 0.15, s"$k: $a vs ${exact(k)}")
    // sketch -> union -> estimate equals a direct global approx count
    val perGroup = orders.groupBy("o_orderstatus")
      .agg(Stats.hllSketch($"o_custkey").as("sk"))
    val merged = perGroup.agg(
      Stats.hllEstimate(Stats.hllUnion($"sk")).as("est")).as[Long].head()
    val globalExact = orders.select(countDistinct("o_custkey")).as[Long].head()
    assert(math.abs(merged - globalExact).toDouble / globalExact < 0.15)
  }

  test("binned quantiles: hand-checked interpolation, clamping, NULL exclusion") {
    // 10 values 1..10 into bins of width 1 over [0, 10): bin b holds
    // value b (count 1). q=0.5 -> target 5, first cum >= 5 is bin 5
    // (value 5, cum 5, cum_prev 4) -> est = 0 + 1*(5 + (5-4)/1) = 6.0
    val vals = (1 to 10).map(_.toDouble) ++ Seq(Double.NaN).filter(_ => false)
    val df = (vals.map(Some(_)) :+ Option.empty[Double]).toDF("v")
    val got = Stats.binnedQuantiles(df, "v", lo = 0.0, hi = 10.0, bins = 10,
      qs = Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(0.5) == ((5L, 6.0)))
    // q=1: target 10 -> bin 9 fully consumed -> right edge of its bin
    assert(got(1.0) == ((9L, 10.0)))
    // q=0: target 0 -> first bin present (bin 1), frac clamps to 0
    assert(got(0.0) == ((1L, 1.0)))
    // out-of-range values clamp into the edge bins instead of vanishing
    val clamped = Stats.binnedQuantiles(
      Seq(-5.0, 0.5, 99.0).toDF("v"), "v", 0.0, 1.0, 2, Seq(1.0))
      .collect()(0)
    assert(clamped.getLong(1) == 1L) // 99.0 landed in the top bin
    // estimate error is bounded by bin width: median of 1..1000 within
    // one 50-wide bin of the exact 500
    val wide = (1 to 1000).map(_.toDouble).toDF("v")
    val med = Stats.binnedQuantiles(wide, "v", 0.0, 1000.0, 20, Seq(0.5))
      .collect()(0).getDouble(2)
    assert(math.abs(med - 500.0) <= 50.0, s"median est $med")
  }

  test("group z-scores normalize to mean 0 / unit spread per group") {
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0), ("b", 10.0), ("b", 20.0))
      .toDF("g", "v")
    val z = Stats.zscorePerGroup(df, Seq("g"), "v")
      .select("g", "v", "zscore").as[(String, Double, Double)].collect()
    // group a: mean 4, pop std sqrt(8/3); group b: mean 15, std 5
    val za = z.filter(_._1 == "a").map(r => r._2 -> r._3).toMap
    assert(za(4.0) == 0.0)
    assert(math.abs(za(6.0) - 2.0 / math.sqrt(8.0 / 3)) < 1e-12)
    assert(za(2.0) == -za(6.0))
    val zb = z.filter(_._1 == "b").map(r => r._2 -> r._3).toMap
    assert(zb(10.0) == -1.0 && zb(20.0) == 1.0)
    // null values don't enter the moments (a row count would skew every
    // non-null z in the group); the null row itself gets a null z
    val withNull = Seq(("a", Some(0.0)), ("a", Some(2.0)), ("a", None))
      .toDF("g", "v")
    val zn = Stats.zscorePerGroup(withNull, Seq("g"), "v")
      .select("v", "zscore").as[(Option[Double], Option[Double])].collect().toMap
    assert(zn(Some(2.0)) == Some(1.0) && zn(Some(0.0)) == Some(-1.0))
    assert(zn(None).isEmpty)
    // degenerate groups (constant or single value) yield an EXPLICIT null,
    // not an engine-dependent divide-by-zero (±inf/NaN in IEEE mode)
    val degen = Seq(("c", 5.0), ("c", 5.0), ("d", 42.0)).toDF("g", "v")
    val zd = Stats.zscorePerGroup(degen, Seq("g"), "v")
      .select("g", "zscore").as[(String, Option[Double])].collect()
    assert(zd.forall(_._2.isEmpty))
  }

  test("winsorize clamps to exact group quantiles; nulls and mid values pass through") {
    val df = ((1 to 99).map(i => ("a", Some(i.toDouble))) :+ (("a", None)) :+
      (("b", Some(1000.0)))).toDF("g", "v")
    val w = Stats.winsorizePerGroup(df, Seq("g"), "v", 0.10, 0.90)
    val byV = w.filter($"g" === "a")
      .select("v", "winsorized").as[(Option[Double], Option[Double])]
      .collect().toMap
    // exact interpolated p10/p90 of 1..99 are 10.8 and 89.2
    assert(byV(Some(1.0)) == Some(10.8))
    assert(byV(Some(99.0)) == Some(89.2))
    assert(byV(Some(50.0)) == Some(50.0)) // mid values untouched
    assert(byV(None).isEmpty)             // null stays null
    // single-value group: lo == hi == the value, nothing moves
    assert(w.filter($"g" === "b").select("winsorized").as[Double].head() == 1000.0)
    // the bounds side must broadcast — the data side never reshuffles
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // a NULL group is a group of its own: its rows clamp among themselves
    // instead of vanishing through a null-never-matches equi-join
    val withNullGroup = Seq((Some("a"), 1.0), (None, 10.0), (None, 20.0),
      (None, 30.0)).toDF("g", "v")
    val ng = Stats.winsorizePerGroup(withNullGroup, Seq("g"), "v", 0.25, 0.75)
    assert(ng.count() == 4) // no row loss
    val nulls = ng.filter($"g".isNull).select("v", "winsorized")
      .as[(Double, Double)].collect().toMap
    assert(nulls(10.0) == 15.0 && nulls(30.0) == 25.0 && nulls(20.0) == 20.0)
    // approx path: bounded memory, quantiles within sketch tolerance
    val approx = Stats.winsorizePerGroup(df, Seq("g"), "v", 0.10, 0.90,
      accuracy = 10000).filter($"g" === "a")
      .select("v", "winsorized").as[(Option[Double], Option[Double])]
      .collect().toMap
    assert(math.abs(approx(Some(1.0)).get - 10.8) <= 1.0)
    assert(math.abs(approx(Some(99.0)).get - 89.2) <= 1.0)
  }

  test("rocAuc: midrank ties hand-checked, degenerate classes NULL, equals brute-force pair counting") {
    // pos scores {2,3}, neg scores {1,2}: ranks 1, 2.5, 2.5, 4 ->
    // S_pos = 2.5 + 4 = 6.5, AUC = (6.5 - 3) / (2*2) = 0.875
    val tiny = Seq((1L, false), (2L, false), (2L, true), (3L, true))
      .toDF("s", "y")
    val row = Stats.rocAuc(tiny, col("s"), col("y")).collect().head
    assert(row.getLong(0) == 2 && row.getLong(1) == 2 && row.getLong(2) == 3)
    assert(row.getDouble(3) == 0.875)
    // perfect separation = 1; single-class = NULL (undefined, not 0)
    val sep = Seq((1L, false), (2L, false), (3L, true), (4L, true)).toDF("s", "y")
    assert(Stats.rocAuc(sep, col("s"), col("y")).collect().head.getDouble(3) == 1.0)
    val onec = Seq((1L, true), (2L, true)).toDF("s", "y")
    assert(Stats.rocAuc(onec, col("s"), col("y")).collect().head.isNullAt(3))
    // equals the brute-force pair statistic (wins + half-ties) on a
    // deterministic pseudo-random set spread across partitions
    val data = (0 until 400).map { i =>
      val s = (i * 2654435761L) % 97
      (s, (i * 40503L) % 5 == 0 || s > 60)
    }
    val df = data.toDF("s", "y").repartition(7)
    val pos = data.filter(_._2).map(_._1)
    val neg = data.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = math.floor(wins / (pos.size.toDouble * neg.size) * 1e6 + 0.5) / 1e6
    assert(Stats.rocAuc(df, col("s"), col("y")).collect().head.getDouble(3) == expected)
  }

  test("emaPerKey bounded-key guard names the offending hot key") {
    val hot = spark.range(1000).select(lit("hotkey").as("k"),
      $"id".as("t"), ($"id" % 7).cast("double").as("v"))
    val err = intercept[IllegalArgumentException] {
      Stats.emaPerKey(hot, "k", Seq("t"), "v", alpha = 0.5, maxEventsPerKey = 100)
    }
    assert(err.getMessage.contains("hotkey") && err.getMessage.contains("1000"))
    // under the cap: identical results to the unguarded form
    val ok = Stats.emaPerKey(hot, "k", Seq("t"), "v", alpha = 0.5,
      maxEventsPerKey = 1000)
    val free = Stats.emaPerKey(hot, "k", Seq("t"), "v", alpha = 0.5)
    assert(ok.collect().toSeq == free.collect().toSeq)
  }

  test("column profile reports nulls, cardinality, and typed min/max in one pass") {
    val df = Seq((1L, Some("b"), Some(2.5)), (2L, None, Some(-1.0)),
      (3L, Some("a"), None), (3L, Some("a"), Some(9.0)))
      .toDF("k", "s", "v")
    val got = Stats.columnProfile(df, Seq("k", "s", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = got("k"); val s = got("s"); val v = got("v")
    assert(k.getLong(1) == 4 && k.getLong(2) == 0 && k.getLong(3) == 3)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 3.0 && k.isNullAt(6))
    assert(s.getLong(2) == 1 && s.getLong(3) == 2) // nulls excluded from distinct
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "b")
    assert(v.getLong(2) == 1 && v.getDouble(4) == -1.0 && v.getDouble(5) == 9.0)
  }

  test("rollingPerKey: trailing range frame, peer-inclusive ties, keys isolated") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1.0, 7L),
      (2L, "2024-01-01 00:00:10", 2.0, 7L),
      (3L, "2024-01-01 00:00:10", 4.0, 7L),  // same-second peer of event 2
      (4L, "2024-01-01 00:00:30", 8.0, 7L),
      (5L, "2024-01-01 00:00:10", 16.0, 9L)) // other key, never mixed in
      .toDF("event_id", "ts", "value", "user_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Stats.rollingPerKey(df, "user_id", "ts", "value", windowSec = 20)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getDouble(5)))
    // frames: e1 alone; e2/e3 peers share {e1,e2,e3}; e4 sees only itself
    assert(out.toSeq == Seq((1L, 1L, 1.0), (2L, 3L, 7.0), (3L, 3L, 7.0),
      (4L, 1L, 8.0), (5L, 1L, 16.0)))
    intercept[IllegalArgumentException] {
      Stats.rollingPerKey(df.withColumn("n_win", lit(1)), "user_id", "ts",
        "value", windowSec = 20)
    }
  }

  test("gapFill: zero rows for empty buckets, grids span per key, loud guard") {
    val df = Seq(
      ("a", "2024-01-01 00:00:05", 1.5),
      ("a", "2024-01-01 00:00:35", 2.5),  // 3 buckets apart at 10s: 0, 30
      ("b", "2024-01-01 00:00:12", 4.0))  // single bucket: grid is 1 row
      .toDF("k", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Stats.gapFill(df, "k", "ts", "value", bucketSec = 10L)
      .orderBy("key", "bucket_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    assert(out.toSeq == Seq(
      ("a", base, 1L, 1.5), ("a", base + 10, 0L, 0.0),
      ("a", base + 20, 0L, 0.0), ("a", base + 30, 1L, 2.5),
      ("b", base + 10, 1L, 4.0)))
    // a key spanning more buckets than the cap fails loudly, not OOM
    val boom = intercept[Exception] { // SparkRuntimeException from raise_error
      Stats.gapFill(df, "k", "ts", "value", bucketSec = 10L,
        maxBucketsPerKey = 2L).collect()
    }
    assert(boom.getMessage.contains("gapFill"))
  }

  test("weightedMedianPerGroup: weight dominance, peers, NULL drops") {
    val df = Seq(
      ("a", 1.0, Some(1L)), ("a", 2.0, Some(1L)), ("a", 3.0, Some(10L)),
      ("b", 1.0, Some(1L)), ("b", 2.0, Some(1L)), ("b", 3.0, Some(1L)),
      ("b", 4.0, Some(1L)),
      ("c", 5.0, Some(1L)), ("c", 5.0, Some(1L)), ("c", 7.0, Some(1L)),
      ("c", 9.0, None)) // NULL weight: dropped, cannot shift the median
      .toDF("k", "v", "w")
    val got = Stats.weightedMedianPerGroup(df, "k", "v", "w")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a: the w=10 row dominates; b: lower median of 1..4 is 2;
    // c: the two peers at 5 share cumw=2, 2*2 >= 3
    assert(got == Map("a" -> 3.0, "b" -> 2.0, "c" -> 5.0))
  }

  test("binnedQuantilesPerGroup equals the global estimator per group slice") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 8.0), ("a", 9.0),
      ("b", 4.0), ("b", 4.5), ("b", 6.0)).toDF("k", "v")
    val per = Stats.binnedQuantilesPerGroup(df, "k", "v",
      lo = 0.0, hi = 10.0, bins = 10, qs = Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    for (k <- Seq("a", "b")) {
      val global = Stats.binnedQuantiles(df.filter(col("k") === k), "v",
        lo = 0.0, hi = 10.0, bins = 10, qs = Seq(0.5, 0.9))
        .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(2)))
      global.foreach { case (q, want) => assert(per((k, q)) == want) }
    }
  }

  test("driftOverTime: stable buckets read 0, shifts score, gaps skip") {
    val rows = Seq(
      (0L, 1.0), (2L, 1.0), (5L, 2.0),      // bucket 0
      (10L, 1.0), (12L, 1.0), (15L, 2.0),   // bucket 10: identical dist
      (20L, 9.0), (22L, 9.0), (25L, 9.0),   // bucket 20: fully shifted
      (40L, 5.0))                           // bucket 40: predecessor 30 empty
    val df = rows.toDF("sec", "value")
      .withColumn("ts", col("sec").cast("timestamp"))
    val got = Stats.driftOverTime(df, "ts", "value", bucketSec = 10L,
      lo = 0.0, hi = 10.0, bins = 10)
      .orderBy("bucket_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // identical -> 0; disjoint -> sum of p + q rates = 2 exactly on the
    // lattice (2/3 + 1/3 + 1); bucket 40 has no direct predecessor
    assert(got.toSeq == Seq(
      (10L, 3L, 3L, 0L), (20L, 3L, 3L, 2000000000000L)))
  }

  test("robustScalePerGroup: MAD ignores the outlier, constant group NULLs") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 100.0), // the outlier that would wreck mean/stddev
      ("b", 5L, 7.0), ("b", 6L, 7.0), ("b", 7L, 7.0)) // MAD 0 -> NULL
      .toDF("k", "id", "v")
    val out = Stats.robustScalePerGroup(df, "k", "v")
      .orderBy("id").collect()
    // median 2.5, abs devs {1.5, 0.5, 0.5, 97.5} -> MAD 1.0: the scale is
    // set by the bulk, so the outlier lands at z = 97.5, not z ~ 1.5
    val z = out.filter(!_.isNullAt(3)).map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(z == Map(1L -> -1.5, 2L -> -0.5, 3L -> 0.5, 4L -> 97.5))
    assert(out.filter(_.getString(0) == "b").forall(_.isNullAt(3)))
    intercept[IllegalArgumentException] {
      Stats.robustScalePerGroup(df.withColumn("robust_z", lit(1)), "k", "v")
    }
  }

  test("distributionDrift: identical sides read 0, disjoint sides max out") {
    val a = Seq(1.0, 2.0, 5.0, 9.0).toDF("v")
    val same = Stats.distributionDrift(a, a, "v", lo = 0.0, hi = 10.0, bins = 10)
      .collect()
    assert(same.forall(_.getLong(3) == 0L)) // p == q in every bin
    // all of A in low bins, all of B in one high bin: each occupied bin's
    // term is p²/p = p (or q²/q = q) — the lattice values are exact
    val b = Seq(9.5, 9.5).toDF("v")
    val far = Stats.distributionDrift(a, b, "v", lo = 0.0, hi = 10.0, bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // A-only bins: p = 1/4, q = 0 -> p²/p = 0.25; the mixed bin 9 has
    // p = 1/4, q = 1 -> (3/4)² / (5/4) = 0.45 exactly
    assert(far.toSeq == Seq(
      (1L, 1L, 0L, 250000000000L), (2L, 1L, 0L, 250000000000L),
      (5L, 1L, 0L, 250000000000L), (9L, 1L, 2L, 450000000000L)))
    intercept[IllegalArgumentException] {
      Stats.distributionDrift(a.limit(0), a, "v", 0.0, 10.0, 10)
    }
  }

  test("exactQuantiles: k-th smallest matches a full sort, all shapes") {
    import spark.implicits._
    // skewed values with duplicates and a NULL; ground truth by sort
    val vals = Seq(5.0, 1.0, 9.0, 1.0, 3.0, 7.0, 3.0, 3.0, 100.0, 2.0)
    val df = (vals.map(Option(_)) :+ Option.empty[Double]).toDF("v")
    val sorted = vals.sorted
    def truth(q: Double): Double =
      sorted(math.max(1, math.ceil(q * vals.size).toInt) - 1)
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = Stats.exactQuantiles(df, "v", qs, bins = 4)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    qs.foreach { q => assert(got(q) == truth(q), s"q=$q") }
    // tiny bin count still exact (stress the in-bin top-k path)
    val got1 = Stats.exactQuantiles(df, "v", Seq(0.5), bins = 2)
      .collect().head.getDouble(1)
    assert(got1 == truth(0.5))
    // all-equal column short-circuits; empty input yields no rows
    assert(Stats.exactQuantiles(Seq(4.2, 4.2).toDF("v"), "v", Seq(0.5))
      .collect().head.getDouble(1) == 4.2)
    assert(Stats.exactQuantiles(df.filter($"v".isNull), "v", Seq(0.5)).isEmpty)
    intercept[IllegalArgumentException] {
      Stats.exactQuantiles(df, "v", Seq(1.5))
    }
  }

  test("exactQuantilesPerGroup: per-group k-th smallest, skewed sizes, edges") {
    import spark.implicits._
    val data: Seq[(String, Option[Double])] =
      Seq.tabulate(100)(i => ("big", Some(i.toDouble))) ++
        Seq(("small", Some(5.0)), ("small", Some(1.0)), ("small", Some(9.0))) ++
        Seq(("flat", Some(4.2)), ("flat", Some(4.2)), ("nulls", None))
    val df = data.toDF("k", "v")
    def truth(vals: Seq[Double], q: Double): Double =
      vals.sorted(Ordering.Double.TotalOrdering)
        .apply(math.max(1, math.ceil(q * vals.size).toInt) - 1)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val got = Stats.exactQuantilesPerGroup(df, "k", "v", q, bins = 8)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(got("big") == truth((0 until 100).map(_.toDouble), q), s"big q=$q")
      assert(got("small") == truth(Seq(5.0, 1.0, 9.0), q), s"small q=$q")
      assert(got("flat") == 4.2)
      assert(!got.contains("nulls"), "all-NULL groups must be absent")
    }
    // group cap fails loudly, not with a driver OOM
    intercept[IllegalArgumentException] {
      Stats.exactQuantilesPerGroup(df, "k", "v", 0.5, maxGroups = 2)
    }
  }

  test("weightedQuantilePerGroup: crossing semantics, ties, exclusions") {
    import spark.implicits._
    // group a: values 1..4 with weights 1,1,6,2 (W=10): p50 crosses at
    // cumw 8 -> value 3; p90 needs cumw >= 9 -> value 4
    // group b: all weights 1 -> weighted == unweighted order statistic
    val df = Seq(
      ("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 6L), ("a", 4.0, 2L),
      ("b", 10.0, 1L), ("b", 20.0, 1L), ("b", 30.0, 1L),
      ("a", 99.0, 0L), ("a", 98.0, -5L), // non-positive: excluded
      (null, 1.0, 1L), ("a", Double.NaN, 1L) // NaN sorts greatest, w=1
    ).toDF("k", "v", "w")
      .filter(!isnan($"v") || $"v".isNotNull) // keep as-is; NaN row stays
    def get(num: Long, den: Long) = Stats
      .weightedQuantilePerGroup(df, "k", "v", "w", num, den)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val p50 = get(1, 2)
    assert(p50("a") == ((3.0, 11L))) // W=10+NaN's 1
    assert(p50("b") == ((20.0, 3L)))
    val p90 = get(9, 10)
    assert(p90("a") == ((4.0, 11L)))
    assert(p90("b") == ((30.0, 3L)))
    // q=1 lands on the greatest value (NaN, which sorts last)
    val p100 = get(1, 1)
    assert(p100("b") == ((30.0, 3L)))
    assert(p100("a")._1.isNaN)
    // ties: duplicated values answer identically however ties order
    val ties = Seq(("t", 5.0, 3L), ("t", 5.0, 3L), ("t", 7.0, 4L)).toDF("k", "v", "w")
    val m = Stats.weightedQuantilePerGroup(ties, "k", "v", "w", 1, 2)
      .collect()(0)
    assert(m.getDouble(1) == 5.0 && m.getLong(2) == 10L)
  }
}
