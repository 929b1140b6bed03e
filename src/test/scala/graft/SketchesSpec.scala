package graft

import org.apache.spark.sql.functions._
import graft.functions.Checksums
import graft.operators.Sketches

/** Portable-sketch invariants the oracle gate can't see: register-level
  * merge identities and the exact-regime guarantees of KMV overlap. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    .select($"o_orderstatus".as("g"), $"o_custkey".cast("string").as("v"))

  test("HLL: merged per-group sketches == direct global sketch, register-exact") {
    val perGroup = orders.groupBy("g").agg(Sketches.hllRegisters($"v").as("regs"))
    val merged = Sketches.hllMergeAll(perGroup.select("regs"), "regs")
      .select(col("regs").cast("array<int>")).as[Seq[Int]].head()
    val direct = orders.agg(Sketches.hllRegisters($"v").as("regs"))
      .select(col("regs").cast("array<int>")).as[Seq[Int]].head()
    assert(merged == direct, "union-of-sketches must equal sketch-of-union")
    // pairwise form agrees with the rollup form
    val two = perGroup.limit(2)
      .select($"g", col("regs").cast("array<int>").as("regs"))
      .as[(String, Seq[Int])].collect()
    val pairMerged = spark.sql("select 1").select(
      Sketches.hllMerge(typedLit(two(0)._2), typedLit(two(1)._2)).as("m"))
      .as[Seq[Int]].head()
    val expected = two(0)._2.zip(two(1)._2).map { case (a, b) => a max b }
    assert(pairMerged == expected)
  }

  test("HLL estimate within 3 standard errors of exact (m=256 -> 6.5% se)") {
    val est = orders.agg(Sketches.hllRegisters($"v").as("regs"))
      .select(Sketches.hllEstimate("regs").as("e")).as[Long].head()
    val exact = orders.select(countDistinct($"v")).as[Long].head()
    assert(math.abs(est - exact).toDouble / exact < 0.20,
      s"estimate $est vs exact $exact")
  }

  test("HLL trailing merge: each window's rollup == direct sketch of the window's raw data") {
    // keys 10..14, with key 12 ABSENT — the gap must contribute nothing
    val rows = Seq(10 -> "a", 10 -> "b", 11 -> "c", 13 -> "d", 13 -> "a",
      14 -> "e", 14 -> "f").toDF("k", "v")
    val per = rows.groupBy("k").agg(Sketches.hllRegisters($"v").as("regs"))
    val targets = Seq(12, 13, 14).toDF("k")
    val merged = Sketches.hllTrailingMerge(per, targets, "k", "regs", 3)
      .select($"k", col("regs").cast("array<int>"))
      .as[(Int, Seq[Int])].collect().toMap
    assert(merged.keySet == Set(12, 13, 14))
    for (t <- Seq(12, 13, 14)) {
      val direct = rows.filter($"k" > t - 3 && $"k" <= t)
        .agg(Sketches.hllRegisters($"v").as("regs"))
        .select(col("regs").cast("array<int>")).as[Seq[Int]].head()
      assert(merged(t) == direct,
        s"window ending $t: rollup registers must equal the direct sketch")
    }
  }

  test("CMS: merged per-group sketches == direct global sketch, cell-exact; never underestimates") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"source".as("g"), explode(split(lower($"text"), "\\s+")).as("tok"))
      .filter(length($"tok") > 0)
    val perSource = Sketches.cmsSketch(toks, "g", "tok", d = 4, w = 512)
    val merged = Sketches.cmsMergeAll(perSource)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    val direct = Sketches.cmsSketch(toks.withColumn("g", lit("all")),
        "g", "tok", d = 4, w = 512)
      .drop("g").as[(Int, Long, Long)].collect().sorted.toSeq
    assert(merged == direct, "sum-of-sketches must equal sketch-of-union")
    // one-sided error: estimates never fall below exact counts
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
    val sk = Sketches.cmsMergeAll(perSource)
    val checked = Sketches.cmsEstimate(sk, exact, "tok", d = 4, w = 512)
      .join(exact, "tok").select($"tok", $"n_exact", $"n_est")
      .as[(String, Long, Long)].collect()
    assert(checked.nonEmpty)
    for ((t, ex, est) <- checked)
      assert(est >= ex, s"CMS underestimated '$t': $est < $ex")
  }

  test("KMV: below-k groups give EXACT union/intersection/jaccard") {
    // groups small enough that every distinct hash fits in the sketch:
    // the estimates must collapse to exact set arithmetic
    val a = (1 to 40).map(i => ("a", s"tok$i"))
    val b = (25 to 60).map(i => ("b", s"tok$i")) // overlap 25..40 = 16
    val df = (a ++ b).toDF("g", "t")
      .select($"g", Checksums.md5PrefixLong($"t").as("h"))
    val sk = Sketches.kmvSketches(df, "g", "h", 128)
    val out = Sketches.kmvPairwiseOverlap(sk, 128)
      .select($"union_est", $"intersect_est", $"jaccard_est")
      .as[(Long, Long, Double)].head()
    assert(out._1 == 60L, s"union ${out._1}")
    assert(out._2 == 16L, s"intersect ${out._2}")
    assert(out._3 == math.floor(16.0 / 60.0 * 10000 + 0.5) / 10000)
  }

  test("KMV estimate tracks exact Jaccard on real vocab (k=128)") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"source".as("g"),
        explode(split(lower($"text"), "\\s+")).as("t"))
      .filter(length($"t") > 0)
    val hashed = toks.select($"g", Checksums.md5PrefixLong($"t").as("h"))
    val sk = Sketches.kmvSketches(hashed, "g", "h", 128)
    val est = Sketches.kmvPairwiseOverlap(sk, 128)
      .select($"ga", $"gb", $"jaccard_est")
      .as[(String, String, Double)].collect()
      .map { case (x, y, j) => (x, y) -> j }.toMap
    val sets = hashed.distinct().as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSet }
    var checked = 0
    for (((x, y), j) <- est if checked < 10) {
      val exact = sets(x).intersect(sets(y)).size.toDouble /
        sets(x).union(sets(y)).size
      assert(math.abs(j - exact) < 0.12, s"($x,$y): est $j vs exact $exact")
      checked += 1
    }
    assert(checked > 0)
  }
}
