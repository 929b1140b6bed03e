package graft

/** Parallelism invariance: the 100 TB claim is that the same query
  * produces the SAME rows on any cluster width. The DuckDB gate checks
  * determinism at one fixed parallelism; this suite re-runs the
  * parallelism-sensitive query families at different
  * `spark.sql.shuffle.partitions` and asserts identical results — the
  * failure mode it hunts is any reduction whose value depends on
  * partition boundaries or reduction order (float sums, first-wins
  * tie-breaks, partition-indexed ids). */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def atPartitions[T](n: Int)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def invariant(name: String): Unit = {
    val a = atPartitions(3)(rowsOf(SparkEntry.queries(name)(spark, dir)))
    val b = atPartitions(13)(rowsOf(SparkEntry.queries(name)(spark, dir)))
    assert(a == b, s"$name differs across shuffle parallelism 3 vs 13")
    assert(a.nonEmpty, s"$name returned no rows — vacuous invariance")
  }

  // salted aggregation: the salt must rendezvous, not leak into results
  test("salted sum is parallelism-invariant")(invariant("q36_salted_sum"))
  // budgeted sampling: deterministic hash ranks, not partition order
  test("mixture sample is parallelism-invariant")(invariant("q109_mixture_sample"))
  // global sequence ids: range exchange + per-partition offsets
  test("global sequence is parallelism-invariant")(invariant("q122_global_sequence"))
  // histogram-refined quantiles: bucket boundaries + in-bucket top-k
  test("exact quantiles are parallelism-invariant")(invariant("q221_exact_quantiles"))
  // bucket digests: decimal sums must commute across partitionings
  test("replica diff is parallelism-invariant")(invariant("q223_replica_diff"))
  // lattice-snapped float iteration
  test("pagerank is parallelism-invariant")(invariant("q126_pagerank"))
  // iterative refinement with checkpoints inside the loop
  test("SCC labels are parallelism-invariant")(invariant("q222_scc"))
}
