package graft

import graft.operators.IncrementalAgg.{consolidate, joinDelta}
import org.apache.spark.sql.functions._

/** Signed incremental join maintenance: the bilinear delta rule's edge
  * cases — exact retraction, multiplicity products, and why the ΔL⋈ΔR
  * term is not optional. */
class JoinIvmSpec extends SparkSpec {
  import spark.implicits._

  private def L(rows: (Long, String, Long)*) =
    rows.toDF("k", "lv", "m")
  private def R(rows: (Long, String, Long)*) =
    rows.toDF("k", "rv", "m")

  test("retraction cancels exactly; multiplicities multiply") {
    val l0 = L((1L, "a", 1L), (2L, "b", 2L)) // k=2 held TWICE
    val r0 = R((1L, "x", 1L), (2L, "y", 1L))
    val j0 = joinDelta(l0.limit(0), r0.limit(0), l0, r0, Seq("k"))
    assert(consolidate(j0).orderBy("k").as[(Long, String, String, Long)]
      .collect().toSeq == Seq((1L, "a", "x", 1L), (2L, "b", "y", 2L)))
    // retract ONE of k=2's two copies and all of k=1
    val dl = L((2L, "b", -1L), (1L, "a", -1L))
    val j1 = consolidate(j0.unionByName(
      joinDelta(l0, r0, dl, r0.limit(0), Seq("k"))))
    assert(j1.as[(Long, String, String, Long)].collect().toSeq ==
      Seq((2L, "b", "y", 1L)))
  }

  test("the delta-delta term carries same-batch arrivals") {
    val l0 = L((1L, "a", 1L))
    val r0 = R((1L, "x", 1L))
    val j0 = consolidate(joinDelta(l0.limit(0), r0.limit(0), l0, r0, Seq("k")))
    // k=5 arrives on BOTH sides in one batch: only ΔL⋈ΔR sees the pair
    val dl = L((5L, "e", 1L))
    val dr = R((5L, "z", 1L))
    val withDD = consolidate(j0.unionByName(
      joinDelta(l0, r0, dl, dr, Seq("k"))))
    assert(withDD.count() == 2, "ΔL⋈ΔR must contribute the (5,5) pair")
    val withoutDD = consolidate(j0
      .unionByName(joinDelta(l0, r0, dl, dr.limit(0), Seq("k")))
      .unionByName(joinDelta(l0, r0, dl.limit(0), dr, Seq("k"))))
    assert(withoutDD.count() == 1, "dropping ΔL⋈ΔR loses same-batch pairs")
  }

  test("increments reproduce the from-scratch join after mixed waves") {
    val all = spark.range(0, 60).select(($"id" % 10).as("k"),
      concat(lit("l"), $"id".cast("string")).as("lv"), lit(1L).as("m"))
    val rs = spark.range(0, 10).select($"id".as("k"),
      concat(lit("r"), $"id".cast("string")).as("rv"), lit(1L).as("m"))
    val l0 = all.filter($"lv".substr(2, 10).cast("long") % 2 === 0)
    val dl1 = all.filter($"lv".substr(2, 10).cast("long") % 2 === 1)
      .unionByName(l0.filter($"k" === 3).withColumn("m", lit(-1L)))
    val r0 = rs.filter($"k" < 5)
    val dr1 = rs.filter($"k" >= 5)
    val j0 = joinDelta(l0.limit(0), r0.limit(0), l0, r0, Seq("k"))
    val j1 = consolidate(j0.unionByName(joinDelta(l0, r0, dl1, dr1, Seq("k"))))
    val lNet = consolidate(l0.unionByName(dl1))
    val expected = consolidate(
      joinDelta(lNet.limit(0), rs.limit(0), lNet, rs, Seq("k")))
    assert(j1.orderBy("k", "lv").collect().toSeq ==
      expected.orderBy("k", "lv").collect().toSeq)
  }
}
