package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine — one codegen'd expression per row, no
  * shuffle, then a top-k. Scale path: random-hyperplane LSH bucketing —
  * probe only matching buckets, turning O(N) scans per query into
  * O(N / 2^bits) with recall tunable via multi-probe.
  */
object Similarity {

  /** Dot product of two float arrays in index order (deterministic
    * left-to-right fold, double accumulation). Composable reference form;
    * higher-order functions evaluate interpreted. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Composable cosine (interpreted HOFs) — kept as the semantic
    * reference; [[cosine]] is the fused native form. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity via the native codegen'd expression — one fused
    * primitive loop per row, bit-identical to [[cosineHof]] on
    * equal-length vectors. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.graftbridge.expression(a),
        org.apache.spark.sql.graftbridge.expression(b)))

  /** All vectors with cosine(v, probe) above `threshold` (set semantics —
    * robust to floating-point ordering at the margin). */
  def aboveThreshold(embeddings: DataFrame, idCol: String, vecCol: String,
      probe: Seq[Float], threshold: Double): DataFrame = {
    val p = lit(probe.toArray)
    embeddings.select(col(idCol), cosine(col(vecCol), p).as("cos"))
      .filter(col("cos") > threshold)
  }

  /** Brute-force top-k nearest by cosine to a probe vector; deterministic
    * tie-break on id. */
  def topK(embeddings: DataFrame, idCol: String, vecCol: String,
      probe: Seq[Float], k: Int): DataFrame = {
    val p = lit(probe.toArray)
    embeddings.select(col(idCol), cosine(col(vecCol), p).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component: the portable
    * md5-prefix hash of "plane:dim" mapped to [0, 1) then recentered to
    * [-1, 1). No RNG — reproducible across runs AND across engines, so a
    * SQL oracle can rebuild the same hyperplanes:
    * `CAST(('0x'||substr(md5(p||':'||d),1,15)) AS BIGINT) / 1152921504606846975.0 * 2 - 1`.
    *
    * The components are row-INDEPENDENT, so they are computed once here
    * at plan-build time and inlined as literals — an expression form
    * would re-hash bits*dim md5s per row for values that never change. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$dim".getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16).toDouble / 0xFFFFFFFFFFFFFFFL.toDouble * 2 - 1
  }

  /** Random-hyperplane LSH code: `bits` sign bits of <v, plane_i>. Vectors
    * close in cosine agree on most bits. `dim` is the (fixed) embedding
    * dimensionality; the unrolled sum keeps the whole computation inside
    * whole-stage codegen with constant-folded plane components. */
  def lshCode(vec: Column, bits: Int, dim: Int): Column = {
    val proj = (i: Int) =>
      (0 until dim).map(d =>
        element_at(vec, d + 1).cast("double") * lit(planeComponent(i, d)))
        .reduce(_ + _)
    (0 until bits).map(i => when(proj(i) >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
  }

  /** Bucketed ANN index: one pass computing the LSH code per vector.
    * Persist partitioned/bucketed by `lsh_code` so probes prune to
    * matching buckets (partition pruning at the scan). */
  def buildIndex(embeddings: DataFrame, vecCol: String, bits: Int = 8,
      dim: Int = 64): DataFrame =
    embeddings.withColumn("lsh_code", lshCode(col(vecCol), bits, dim))

  /** ANN query: search only buckets whose code is within `probeHamming`
    * bits of the probe's code (multi-probe recall knob), then exact-rank
    * the survivors. Scans 1/2^bits of the corpus per probed bucket.
    * `dim` MUST equal the dim the index was built with — a mismatch would
    * hash the probe against different hyperplanes and silently select
    * wrong buckets, so it is enforced against the probe length. */
  def annTopK(index: DataFrame, idCol: String, vecCol: String,
      probe: Seq[Float], k: Int, bits: Int = 8, probeHamming: Int = 1,
      dim: Int = 64): DataFrame = {
    require(probe.length == dim,
      s"probe has ${probe.length} dims but the index was built with dim=$dim")
    val probeCodeRow = index.sparkSession.range(1)
      .select(lshCode(lit(probe.toArray), bits, dim).as("c")).collect()(0)
    val probeCode = probeCodeRow.getLong(0)
    val candidates = index.filter(
      bit_count(col("lsh_code").bitwiseXOR(lit(probeCode))) <= probeHamming)
    topK(candidates, idCol, vecCol, probe, k)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket grouping + exact
    * cosine verification within buckets (same shape as MinHash LSH). One
    * groupBy on the code — no self-join, so the hyperplane-projection
    * pipeline runs once; pair expansion happens inside each bucket. */
  def cosineNearDups(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 8, dim: Int = 64): DataFrame = {
    val idx = buildIndex(embeddings, vecCol, bits, dim)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("lsh_code"))
    idx.groupBy(col("lsh_code"))
      .agg(collect_list(struct(col("id"), col("v"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(flatten(transform(col("ds"),
        a => transform(col("ds"), b => struct(a.as("a"), b.as("b")))))).as("p"))
      .filter(col("p.a.id") < col("p.b.id"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        cosine(col("p.a.v"), col("p.b.v")).as("cos"))
      .filter(col("cos") > threshold)
  }
}
