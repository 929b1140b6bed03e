package graft

import org.apache.spark.sql.functions._
import graft.plans.RewriteCountDistinctBitmap

/** The injectOptimizerRule rewrite: COUNT(DISTINCT integral) →
  * BitmapDistinct. Parity with Spark's own planning (both exact), plan
  * shape (Expand gone, ObjectHashAggregate in), conf toggle, and the
  * scope guards (strings, FILTER, multi-arg stay untouched). */
class RewriteCountDistinctSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = spark.range(2000).select(
    ($"id" % 7).as("g"),
    ($"id" % 131).as("k"),
    ($"id" % 63).cast("int").as("j"),
    concat(lit("s"), ($"id" % 11).cast("string")).as("s"))

  private def withFlag[A](on: Boolean)(body: => A): A = {
    val old = spark.conf.getOption(RewriteCountDistinctBitmap.ConfKey)
    spark.conf.set(RewriteCountDistinctBitmap.ConfKey, on.toString)
    try body finally old match {
      case Some(v) => spark.conf.set(RewriteCountDistinctBitmap.ConfKey, v)
      case None => spark.conf.unset(RewriteCountDistinctBitmap.ConfKey)
    }
  }

  private def q() = df.groupBy("g").agg(
    countDistinct($"k").as("nk"),
    countDistinct($"j").as("nj"), // 2 distincts: the Expand case
    count(lit(1)).as("n"),
    sum($"k").as("sk"))

  test("bit-identical results with the rewrite on and off") {
    val on = withFlag(true) { q().collect() }
    val off = withFlag(false) { q().collect() }
    assert(on.map(_.toSeq.toList).sortBy(_.toString).toSeq ==
      off.map(_.toSeq.toList).sortBy(_.toString).toSeq)
    // negative and boundary ids round-trip the bitmap's word/bit split
    val neg = Seq(-1L, -64L, -65L, 0L, 63L, 64L, Long.MinValue + 1, -1L)
      .toDF("v").agg(countDistinct($"v"))
    assert(withFlag(true) { neg.collect()(0).getLong(0) } == 7L)
  }

  test("plan shape: Expand and double exchange gone, bitmap aggregate in") {
    val pOn = withFlag(true) { q().queryExecution.executedPlan.toString }
    val pOff = withFlag(false) { q().queryExecution.executedPlan.toString }
    assert(pOff.contains("Expand"), pOff) // two distincts: Spark expands
    assert(!pOn.contains("Expand"), pOn)
    assert(pOn.contains("ObjectHashAggregate") &&
      pOn.contains("bitmap_distinct"), pOn)
    // one exchange total instead of Expand's keyed double-shuffle
    assert(pOn.split("Exchange").length - 1 == 1, pOn)
  }

  test("scope guards: strings, FILTER, and multi-arg distinct untouched") {
    withFlag(true) {
      val s = df.groupBy("g").agg(countDistinct($"s").as("ns"))
      assert(!s.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
      assert(s.collect().forall(_.getLong(1) == 11L))
      val filtered = spark.sql(
        "SELECT COUNT(DISTINCT id % 10) FILTER (WHERE id % 2 = 0) FROM range(100)")
      assert(!filtered.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
      assert(filtered.collect()(0).getLong(0) == 5L)
      val multi = df.groupBy("g").agg(countDistinct($"k", $"j").as("nkj"))
      assert(!multi.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
    }
  }

  test("global aggregate (no groups) and all-NULL column behave exactly") {
    withFlag(true) {
      assert(df.agg(countDistinct($"k")).collect()(0).getLong(0) == 131L)
      val nulls = Seq[Option[Long]](None, None).toDF("v")
        .agg(countDistinct($"v"))
      assert(nulls.collect()(0).getLong(0) == 0L)
    }
  }
}
