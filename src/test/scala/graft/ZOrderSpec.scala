package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side Morton reference: bit b of dim d at position b*dims+d. */
  private def mortonRef(cells: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; (v, d) <- cells.zipWithIndex)
      z |= ((v >> b) & 1L) << (b * cells.size + d)
    z
  }

  test("interleave matches the bit-level Morton reference") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L), (37L, 200L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.interleave(Seq($"a", $"b"), 8).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => mortonRef(Seq(a, b), 8) })
    // adjacent cells differ in low bits: locality is in the key itself
    assert(mortonRef(Seq(2L, 3L), 8) == 14L) // 2=(10,11) interleaved -> 1110
  }

  test("quantize clamps out-of-range values into edge cells") {
    val got = Seq(-5.0, 0.0, 499.0, 999.9, 1000.0, 4242.0).toDF("v")
      .select(ZOrder.quantize($"v", 0.0, 1000.0, 8).as("q")).as[Long].collect().toSeq
    assert(got.head == 0L && got(1) == 0L && got.last == 255L)
    assert(got.forall(q => q >= 0 && q <= 255))
  }

  test("clustering makes every partition tight in BOTH dimensions") {
    // 64x64 grid; a lexicographic sort on x gives y-span 63 in every
    // partition, z-order bounds both spans
    val grid = spark.range(64 * 64).select(
      ($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    val clustered = ZOrder.cluster(grid,
      Seq(("x", 0.0, 64.0), ("y", 0.0, 64.0)), bitsPerDim = 6, nFiles = 8)
    val withPid = clustered
      .select(spark_partition_id().as("p"), $"x", $"y")
      .persist()
    assert(withPid.count() == 64 * 64 &&
      withPid.select("p").distinct().count() == 8)
    def touched(c: org.apache.spark.sql.Column): Long =
      withPid.filter(c).select("p").distinct().count()
    // the pruning property: a 16x16 corner box occupies ONE consecutive
    // z range (z < 256 of 4096), so nearly all partitions are prunable —
    // and a predicate on EITHER single dimension still prunes, which a
    // lexicographic sort only gives its leading column (x < 8 under an
    // x-sort hits 1 partition but y < 8 hits all 8)
    assert(touched($"x" < 16 && $"y" < 16) <= 2)
    assert(touched($"x" < 8) <= 5)
    assert(touched($"y" < 8) <= 5)
    withPid.unpersist()
  }
}
