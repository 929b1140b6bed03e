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

  /** Matryoshka-style dimension-truncation audit: for each prefix
    * length `m`, the top-k neighbor set under cosine over only the
    * FIRST m components (renormalization is implicit in cosine),
    * intersected with the full-dimension top-k — the measurement
    * behind "serve the first m dims of the embedding": how much of
    * the true neighborhood each truncation tier retains, per probe.
    * Deterministic ties (cos desc, id asc) on both sides.
    *
    * Audit-scale by design: |dims| driver scalars (one count per
    * tier), each from a top-k plan the optimizer runs as
    * TakeOrderedAndProject — no global sort, no all-pairs. */
  def truncationRecall(embeddings: DataFrame, idCol: String, vecCol: String,
      probe: Seq[Float], k: Int, dims: Seq[Int]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(dims.nonEmpty && dims.forall(_ >= 1), "dims must be positive")
    val fullIds = topK(embeddings, idCol, vecCol, probe, k).select(idCol)
    dims.map { m =>
      val trunc = embeddings.select(col(idCol),
        slice(col(vecCol), 1, m).as(vecCol))
      val ids = topK(trunc, idCol, vecCol, probe.take(m), k).select(idCol)
      val overlap = ids.join(fullIds, Seq(idCol), "left_semi").count()
      (m, k, overlap)
    }.toDF("m", "k", "n_overlap")
  }

  /** FEATURE-HASHED bag-of-words embedding — dense-ish document vectors
    * with NO model dependency: each token hashes to one of `dims`
    * buckets via the portable 60-bit md5 prefix, contributing ±1 (the
    * hashing-trick sign, an INDEPENDENT salted hash mod 2, decorrelates
    * bucket collisions). Components are exact INTEGER sums, so the "embedding"
    * reproduces bit-for-bit in any md5-bearing engine — the in-engine
    * stand-in wherever a real encoder's vectors haven't landed yet, and
    * directly consumable by [[sparseCosineTopK]].
    *
    * Scale shape: one token explode + ONE partial-aggregated
    * groupBy(id, bucket) — the sparse (id, bucket, v) layout, never a
    * dims-wide dense row. Returns (id, bucket, v) with v ≠ 0. */
  def hashedBowEmbedding(docs: DataFrame, idCol: String, textCol: String,
      dims: Int): DataFrame = {
    require(dims >= 2, s"dims $dims must be >= 2")
    val tok = explode(split(TextAnalysis.normText(col(textCol)), " ")).as("_t")
    val h = graft.functions.Checksums.md5PrefixLong(col("_t"))
    val hs = graft.functions.Checksums.md5PrefixLong(
      concat(lit("s#"), col("_t")))
    docs.select(col(idCol).as("id"), tok)
      .filter(col("_t") =!= "")
      .select(col("id"), pmod(h, lit(dims.toLong)).as("bucket"),
        (pmod(hs, lit(2L)) * 2 - 1).as("_s"))
      .groupBy("id", "bucket").agg(sum(col("_s")).as("v"))
      .filter(col("v") =!= 0)
  }

  /** Cosine top-k over SPARSE (id, bucket, v) embeddings against one
    * probe id — dot products via a bucket equi-join against the
    * broadcast |dims|-row probe vector, norms via one per-id aggregate;
    * integer dot/norm products route through DECIMAL, one sqrt + one
    * divide per candidate at the end (IEEE-exact both engines). The
    * probe itself is excluded. */
  def sparseCosineTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val probe = emb.filter(col("id") === probeId)
      .select(col("bucket"), col("v").as("_pv"))
    val pn2 = probe.agg(sum(col("_pv") * col("_pv")).as("_pn2"))
    val n2 = emb.groupBy("id")
      .agg(sum(col("v").cast("decimal(38,0)") * col("v").cast("decimal(38,0)"))
        .as("_n2"))
    val dots = emb.join(broadcast(probe), "bucket")
      .groupBy("id")
      .agg(sum(col("v").cast("decimal(38,0)") * col("_pv").cast("decimal(38,0)"))
        .as("_dot"))
    dots.join(n2, "id").crossJoin(broadcast(pn2))
      .filter(col("id") =!= probeId)
      .select(col("id"),
        (floor(col("_dot").cast("double") /
          sqrt((col("_n2") * col("_pn2").cast("decimal(38,0)")).cast("double"))
          * 1000000 + 0.5) / 1000000).as("cos"))
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }

  /** BATCHED brute-force ANN — the serving shape: top-k per probe for a
    * whole probe FRAME in one pass over the corpus, instead of one
    * corpus scan per query vector. The probe set broadcasts (query
    * batches are small by nature); scoring is a map-side cross product
    * with the codegen'd cosine, and the per-probe rank filter runs as a
    * WindowGroupLimit — each task keeps only its local top-k per probe
    * BEFORE the exchange, so the one shuffle carries
    * O(partitions · probes · k) rows, never the scored cross product.
    * Output: (probe id, candidate id, cos), k rows per probe,
    * deterministic id tie-break. */
  def topKBatch(embeddings: DataFrame, idCol: String, vecCol: String,
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val p = probes.select(col(probeIdCol).as("_probe_id"),
      col(probeVecCol).as("_probe_vec"))
    val scored = embeddings
      .crossJoin(org.apache.spark.sql.functions.broadcast(p))
      .select(col("_probe_id"), col(idCol),
        cosine(col(vecCol), col("_probe_vec")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_probe_id"))
      .orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("_probe_id").as(probeIdCol), col(idCol), col("cos"))
  }

  /** Random-hyperplane LSH code: `bits` sign bits of <v, plane_i>. Vectors
    * close in cosine agree on most bits. One native codegen'd expression
    * per row (see [[graft.functions.LshCode]]) — the earlier composable
    * form unrolled bits*dim `element_at * lit` terms into a ~1,500-node
    * tree that fell out of whole-stage codegen and dominated the bench. */
  def lshCode(vec: Column, bits: Int, dim: Int): Column =
    org.apache.spark.sql.graftbridge.column(
      graft.functions.LshCode(
        org.apache.spark.sql.graftbridge.expression(vec), bits, dim))

  /** Ad hoc ANN index: one pass computing the LSH code per vector. For
    * repeated probes, persist it with [[writeIndex]] so queries prune to
    * matching code partitions instead of rescanning the corpus. */
  def buildIndex(embeddings: DataFrame, vecCol: String, bits: Int = 8,
      dim: Int = 64): DataFrame =
    embeddings.withColumn("lsh_code", lshCode(col(vecCol), bits, dim))

  /** Signature identifying an index's code scheme: any change to bits,
    * dim, or the plane-hash formula must change this string, so cached
    * index paths keyed on it can never serve incompatible codes. */
  def indexSignature(bits: Int, dim: Int): String =
    s"b${bits}_d${dim}_md5planes1"

  /** Persist the ANN index partitioned by `lsh_code`: codes are computed
    * ONCE, and every probe afterwards is a partition-pruned read of the
    * Hamming-ball directories (<= sum C(bits,h) of 2^bits partitions) —
    * O(N / 2^bits) per probed bucket instead of a full corpus scan.
    * Key reusable paths by [[indexSignature]] + a source fingerprint. */
  def writeIndex(embeddings: DataFrame, vecCol: String, path: String,
      bits: Int = 8, dim: Int = 64): Unit =
    buildIndex(embeddings, vecCol, bits, dim)
      .write.mode("overwrite").partitionBy("lsh_code").parquet(path)

  /** Open a persisted ANN index; `lsh_code` comes back as a partition
    * column, so code predicates prune at planning time. */
  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ANN query: search only buckets whose code is within `probeHamming`
    * bits of the probe's code (multi-probe recall knob), then exact-rank
    * the survivors. The ball codes are enumerated on the driver (no Spark
    * job) and pushed as an IN-list, so a [[writeIndex]]-persisted index
    * prunes to the matching partitions at the scan. `dim` MUST equal the
    * dim the index was built with — a mismatch would hash the probe
    * against different hyperplanes and silently select wrong buckets, so
    * it is enforced against the probe length. */
  def annTopK(index: DataFrame, idCol: String, vecCol: String,
      probe: Seq[Float], k: Int, bits: Int = 8, probeHamming: Int = 1,
      dim: Int = 64): DataFrame = {
    require(probe.length == dim,
      s"probe has ${probe.length} dims but the index was built with dim=$dim")
    val probeCode = graft.functions.LshCode.codeOf(probe, bits, dim)
    val ball = graft.functions.LshCode.hammingBall(probeCode, bits, probeHamming)
    val candidates = index.filter(col("lsh_code").isin(ball: _*))
    topK(candidates, idCol, vecCol, probe, k)
  }

  // ---------------------------------------------------------------------
  // IVF-style ANN: coarse quantization into centroid cells, probe only
  // the cells nearest the query — the inverted-file alternative to the
  // hyperplane-LSH path above.
  // ---------------------------------------------------------------------

  /** Deterministic seed centroids: the `k` vectors with the smallest ids.
    * Production would refine these with k-means iterations (each a
    * map-side assign + per-cell mean aggregation); the assignment/probe
    * machinery below is identical either way, and deterministic seeds keep
    * the operator oracle-checkable. */
  def ivfCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[Seq[Float]] =
    embeddings.orderBy(col(idCol)).limit(k).select(vecCol)
      .collect().map(_.getSeq[Float](0).toSeq).toSeq

  /** Cell assignment: argmax cosine over the centroid list. Ties break to
    * the larger cell id (struct max is lexicographic on (cos, cell)).
    * One native cosine per centroid per row — k fused loops, no shuffle. */
  def ivfAssign(vec: Column, centroids: Seq[Seq[Float]]): Column =
    bestCell(vec, centroids).getField("cell")

  /** Argmax-cosine struct over the centroid list — `greatest` needs two
    * or more arguments, so a single-centroid list (a legitimate
    * one-cluster audit) short-circuits to its only candidate. */
  private def bestCell(vec: Column, centroids: Seq[Seq[Float]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(vec, lit(c.toArray)).as("cos"), lit(i).as("cell"))
    }
    if (scored.size == 1) scored.head else greatest(scored: _*)
  }

  /** Driver-side mirror of the native cosine arithmetic (same interleaved
    * accumulation order, same full-vector tail norms as
    * [[graft.functions.CosineSimilarity]]), for probe-side cell ranking
    * without a job — on unequal lengths both sides must rank cells
    * identically or the probe reads the wrong cells. */
  private[graft] def cosineLocal(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    var j = n // norms run over each full vector (matches the native expr)
    while (j < a.length) { val v = a(j).toDouble; na += v * v; j += 1 }
    j = n
    while (j < b.length) { val v = b(j).toDouble; nb += v * v; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** One k-means refinement step for the IVF centroids: assign every
    * vector to its nearest (cosine) centroid, then per-cell per-dim
    * means. One map-side assign (k fused native cosine loops) + one
    * partial-aggregated groupBy on (cell, dim) — the standard Lloyd
    * iteration shape; loop it to refine, with each step one job.
    * Sums route through DECIMAL(28,12) so partial-aggregation order
    * cannot perturb the mean (the oracle-parity rule), then divide as
    * doubles. Output: (cell, dim, n_members, mean) — `transpose` back to
    * array form with collect_list over dim order if the next iteration
    * needs Seq[Seq[Float]] centroids. */
  def kmeansStep(embeddings: DataFrame, vecCol: String,
      centroids: Seq[Seq[Float]]): DataFrame = {
    val assigned = embeddings
      .withColumn("_cell", ivfAssign(col(vecCol), centroids))
    assigned
      .select(col("_cell").cast("long").as("cell"), posexplode(col(vecCol)))
      .groupBy(col("cell"), col("pos").cast("long").as("dim"))
      // count VALUES (array<float> permits null elements, which the sum
      // skips — a row count would deflate that dim's mean)
      .agg(count(col("col")).as("n_members"),
        (sum(col("col").cast("double").cast("decimal(28,12)")).cast("double") /
          count(col("col")).cast("double")).as("mean"))
  }

  /** IVF ANN query: assign every vector to its cell, scan only the
    * `nProbe` cells whose centroids are nearest the probe, exact-rank the
    * survivors — O(N * nProbe / k) scanned per query. Persist the
    * assignment `partitionBy("ivf_cell")` (same pattern as [[writeIndex]])
    * to make the cell filter a partition-pruned read at scale. */
  /** Iterative Lloyd refinement: [[kmeansStep]] composed into a loop.
    * Each iteration is ONE distributed job (map-side assign + one
    * partial-aggregated mean per (cell, dim)); the per-iteration collect
    * is CENTROID-sized (k*dim rows), never data-sized. New centroid
    * components round through Float so the refined centroids are exactly
    * representable in the embedding space (and in any engine that
    * reproduces the DECIMAL-routed means — the oracle-parity rule).
    * Cells that lose all members — and dims whose values are all null —
    * keep their previous component, the standard Lloyd fallback.
    *
    * Convergence rides the same collect: iteration stops early once the
    * max L2 centroid movement is <= `tol` (tol 0 = run all `iters`).
    * Returns the refined centroids plus the per-iteration movement trace
    * — the trace makes convergence testable and regressions visible. */
  def kmeansRefine(embeddings: DataFrame, vecCol: String,
      seeds: Seq[Seq[Float]], iters: Int,
      tol: Double = 0.0): (Seq[Seq[Float]], Seq[Double]) = {
    require(seeds.nonEmpty, "kmeansRefine needs seed centroids")
    require(iters >= 1, s"iters $iters must be positive")
    var cents = seeds
    val moves = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    var done = false
    while (i < iters && !done) {
      val stepped = kmeansStep(embeddings, vecCol, cents).collect()
      val byCell = stepped.groupBy(_.getLong(0))
      val next = cents.zipWithIndex.map { case (old, c) =>
        byCell.get(c.toLong) match {
          case Some(rows) =>
            val dims = rows.iterator.filterNot(_.isNullAt(3))
              .map(r => r.getLong(1) -> r.getDouble(3)).toMap
            old.indices.map(d =>
              dims.get(d.toLong).map(_.toFloat).getOrElse(old(d))).toSeq
          case None => old // empty cell: keep the previous centroid
        }
      }
      val move = cents.zip(next).map { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) =>
          val d = x.toDouble - y.toDouble; d * d }.sum)
      }.max
      moves += move
      cents = next
      done = move <= tol
      i += 1
    }
    (cents, moves.toSeq)
  }

  /** Driver-side cell ranking for a probe (no Spark job): nProbe cells by
    * centroid cosine, ties to the smaller cell id. Shared by the ad hoc
    * and persisted probe paths so both read the SAME cells. */
  private def rankProbeCells(centroids: Seq[Seq[Float]], probe: Seq[Float],
      nProbe: Int): Seq[Int] = {
    require(centroids.nonEmpty, "IVF probe needs at least one centroid")
    centroids.find(_.length != probe.length).foreach { c =>
      throw new IllegalArgumentException(
        s"probe has ${probe.length} dims but a centroid has ${c.length} — " +
          "a dim mismatch would rank cells against different geometry")
    }
    centroids.zipWithIndex
      .map { case (c, i) => (cosineLocal(probe, c), i) }
      .sortBy { case (cos, cell) => (-cos, cell) }
      .take(nProbe).map(_._2)
  }

  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Float]], probe: Seq[Float], k: Int,
      nProbe: Int): DataFrame = {
    val probeCells = rankProbeCells(centroids, probe, nProbe)
    val assigned = embeddings.withColumn("ivf_cell", ivfAssign(col(vecCol), centroids))
    topK(assigned.filter(col("ivf_cell").isin(probeCells: _*)), idCol, vecCol, probe, k)
  }

  /** Signature identifying an IVF index's geometry: the centroid VALUES
    * are the code scheme (unlike the LSH path, where bits/dim suffice), so
    * the signature hashes them — any reseed or k-means refinement changes
    * the path, and a cached index can never serve stale cells. */
  def ivfSignature(centroids: Seq[Seq[Float]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(4)
    centroids.foreach(_.foreach { v =>
      bb.clear(); bb.putFloat(v); md.update(bb.array(), 0, 4)
    })
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    // "ivf2": layout v2 (cells/ subdir + root completion marker) — the
    // version in the signature keeps a cache keyed by it from serving a
    // v1-layout directory
    s"ivf2k${centroids.length}_d${dim}_" +
      md.digest().map("%02x".format(_)).mkString.take(12)
  }

  /** Persist the IVF assignment partitioned by cell — the inverted file.
    * Assignment runs ONCE; every [[ivfTopKIndexed]] probe afterwards is a
    * partition-pruned read of its nProbe cell directories, O(N * nProbe/k)
    * IO instead of re-assigning the whole corpus per query (the
    * [[writeIndex]] pattern, cell-quantized instead of code-quantized).
    * Key reusable paths by [[ivfSignature]] + a source fingerprint.
    *
    * Layout: cells under `<path>/cells`, completion marker at the ROOT —
    * dropped before any write, restored only when the build (including
    * later [[appendToIvfIndex]] steps of a composed build, via
    * `markComplete = false` here) is entirely done, so a crash mid-build
    * leaves an unmarked, rebuildable directory rather than a
    * complete-looking partial index (the BM25-index discipline). */
  def writeIvfIndex(embeddings: DataFrame, vecCol: String, path: String,
      centroids: Seq[Seq[Float]], markComplete: Boolean = true): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(
      embeddings.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), false)
    embeddings.withColumn("ivf_cell", ivfAssign(col(vecCol), centroids))
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(s"$path/cells")
    if (markComplete)
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
  }

  /** Append a vector batch to an existing IVF index — embedding corpora
    * grow append-only, and re-assigning the whole corpus per ingest is
    * exactly what the persisted inverted file exists to avoid. The batch
    * is assigned with the index's OWN centroids (key the path by
    * [[ivfSignature]] so a geometry mismatch is structurally impossible)
    * and appended into the cell directories; existing files are never
    * touched. Assignment is pure per-vector arithmetic over fixed
    * centroids, so build-then-append is bit-identical to a from-scratch
    * build over the union — the append ≡ rebuild law the spec pins.
    * The completion marker is dropped first and restored last. */
  def appendToIvfIndex(newVectors: DataFrame, vecCol: String, path: String,
      centroids: Seq[Seq[Float]]): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(
      newVectors.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), false)
    newVectors.withColumn("ivf_cell", ivfAssign(col(vecCol), centroids))
      .write.mode("append").partitionBy("ivf_cell").parquet(s"$path/cells")
    fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
  }

  /** Open a persisted IVF index; `ivf_cell` comes back as a partition
    * column, so the probe's cell IN-list prunes at planning time. */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/cells")

  /** Fold a SIGNED change batch — the lake change feed's shape
    * ([[LakeChangelog.changes]] / the `cdc=true` read: the table's
    * columns + net multiplicity `m`) — into a persisted IVF index, so
    * the index tracks a mutating table at cost ∝ the DELTA:
    *
    *  - inserts (`m > 0`) assign with the index's own centroids and
    *    append into their cell directories ([[appendToIvfIndex]]'s
    *    append ≡ rebuild law — existing files untouched);
    *  - deletes (`m < 0`) rewrite ONLY the cell directories holding
    *    retracted ids — each deleted row carries its vector, so its
    *    cell is pure arithmetic (no index scan to find it), and the
    *    rewrite is an anti-join per touched cell, swapped in by
    *    temp-write + rename. A cell whose rows all retract becomes an
    *    EMPTY directory (dynamic partition overwrite would silently
    *    keep it — the reason for the per-cell swap).
    *
    * Re-indexing a 100-TB corpus per mutation wave is the non-starter
    * this exists to avoid: the touched-cell set is bounded by the
    * centroid count, and untouched cells are never read. Deletes are
    * applied BEFORE inserts so a re-added id (delete + insert of a new
    * vector in one window) survives.
    *
    * Crash safety is the lake compaction's MARKER protocol
    * ([[graft.sources.v2.RecordCompaction]]): all new bytes stage under
    * `.ivfstage-<id>/` (cells untouched), then a marker
    * `_ivffold-<id>.json` records every flip (cell swaps + append
    * renames), then the flips apply, then marker + stage are swept and
    * the completion marker returns. A crash BEFORE the marker leaves
    * the index intact at the old watermark (the caller re-folds); a
    * crash AFTER it replays to completion via [[recoverIvfIndex]] —
    * never a full rebuild, never a complete-looking partial index.
    * Single-maintainer, like every index build here. Returns
    * (inserted, deleted) row counts.
    *
    * `windowToken` makes the retry contract EXACTLY-ONCE: pass a token
    * naming the consumed window (e.g. `"v3-5"` for snapshot window
    * `(3,5]`) and the fold persists it as the index's watermark
    * (`_ivfwatermark.json`) in the same committed unit as the flips —
    * the marker carries it, so a crash-after-marker replay also lands
    * it. A retrying caller whose token EQUALS the persisted watermark
    * no-ops with (0,0): without this, a crash after the marker would
    * replay window W at recovery and then the caller's re-fold would
    * append W's inserts a SECOND time (deletes are idempotent
    * anti-joins; inserts are not), breaking fold ≡ rebuild. Tokens are
    * opaque — only equality with the LAST committed window is checked,
    * which is exactly the crash-retry shape (single-maintainer callers
    * fold windows in order). Without a token the weaker contract
    * stands: the caller must not re-fold a window whose first attempt
    * reached the marker. */
  def applyChangesToIvfIndex(changes: DataFrame, idCol: String,
      vecCol: String, path: String,
      centroids: Seq[Seq[Float]],
      windowToken: Option[String] = None): (Long, Long) = {
    val spark = changes.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // finish any crashed fold first (the RecordCompaction discipline);
    // a crash BEFORE its marker left the cells untouched, so the caller
    // simply re-folds the window — recovery only sweeps the orphan stage
    recoverIvfIndex(spark, path)
    // exactly-once under retry: a replayed (or previously completed)
    // fold already committed this window — its token is the watermark.
    // A token in the RECENT HISTORY but no longer the watermark is a
    // rewound caller (e.g. replaying from an older checkpoint after the
    // maintainer advanced): re-folding it would double-append that
    // window's inserts, so it refuses loudly instead of corrupting.
    val (lastToken, tokenHistory) = readIvfWatermark(fs, root)
    windowToken.foreach { t =>
      if (lastToken.contains(t)) return (0L, 0L)
      if (tokenHistory.contains(t)) throw new IllegalStateException(
        s"applyChangesToIvfIndex: window token '$t' was already " +
          s"committed and the index has since advanced to " +
          s"'${lastToken.getOrElse("")}' — re-folding an older window " +
          "would double-append its inserts; resume from the committed " +
          "watermark instead")
    }
    fs.delete(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), false)
    // NET the batch first: a multi-version window emits per-version rows
    // (an id inserted then deleted nets to zero — without consolidation
    // the delete sweep no-ops on the absent id and the stale +1 row
    // would be appended anyway). One CDC read then feeds the delete
    // sweep, the append, and both counts.
    val assigned = IncrementalAgg.consolidate(changes)
      .withColumn("ivf_cell", ivfAssign(col(vecCol), centroids))
      .localCheckpoint()
    // ONE metadata job over the checkpointed batch — per-cell
    // delete/insert counts plus the set-semantics guard (this was four
    // separate actions: a |m|-probe, a distinct-cell collect, and two
    // counts; per-cell rows are bounded by |centroids|, so the collect
    // is metadata either way).
    val cellStats: Array[(Int, Long, Long, Long)] = assigned
      .groupBy(col("ivf_cell"))
      .agg(sum(when(col("m") < 0, 1L).otherwise(0L)).as("_dels"),
        sum(when(col("m") > 0, 1L).otherwise(0L)).as("_inss"),
        max(abs(col("m"))).as("_maxAbs"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the fold assumes SET semantics (the lake's _record_id-unique
    // change feed): |m| == 1 after netting. A generic Z-relation with
    // multiplicities would silently diverge from the fold ≡ rebuild
    // law (the append lands ONE row per id, the sweep retracts ALL),
    // so a non-set batch fails loudly instead of corrupting the index.
    require(cellStats.forall(_._4 == 1L),
      "applyChangesToIvfIndex needs a set-semantics change batch " +
        "(|m| == 1 per id after consolidation)")
    val delIds = assigned.filter(col("m") < 0)
      .select(col("ivf_cell").as("_del_cell"), col(idCol).as("_del_id"))
    val touched: Array[Int] =
      cellStats.filter(_._2 > 0).map(_._1).sorted
    val touchedSet = touched.toSet
    val nDel = cellStats.map(_._2).sum
    val ins = assigned.filter(col("m") > 0).drop("m")
    val nIns = cellStats.map(_._3).sum

    // ---- STAGE (index untouched until the marker lands) ----
    // Swap-staged content: per delete-touched cell, its survivors plus
    // its OWN inserts — the inserts ride the swap so a replayed swap
    // can never orphan an already-renamed append file. Inserts into
    // untouched cells stage separately and rename in one-by-one.
    val runId = java.util.UUID.randomUUID().toString.take(12)
    val stage = s".ivfstage-$runId"
    val existingTouched = touched.filter(c =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/cells/ivf_cell=$c")))
    if (existingTouched.nonEmpty) {
      val oldTouched = spark.read
        .option("basePath", s"$path/cells")
        .parquet(existingTouched.toSeq
          .map(c => s"$path/cells/ivf_cell=$c"): _*)
        .join(delIds, col("ivf_cell") === col("_del_cell") &&
          col(idCol) === col("_del_id"), "left_anti")
        .drop("_del_cell", "_del_id")
      oldTouched.unionByName(ins.filter(col("ivf_cell").isin(
          existingTouched.map(Integer.valueOf).toSeq: _*)))
        .write.mode("overwrite").partitionBy("ivf_cell")
        .parquet(s"$path/$stage/swap")
    }
    val insElsewhere = ins.filter(!col("ivf_cell").isin(
      existingTouched.map(Integer.valueOf).toSeq: _*))
    if (nIns > 0)
      insElsewhere.write.mode("overwrite").partitionBy("ivf_cell")
        .parquet(s"$path/$stage/ins")
    // enumerate staged append files and assign deterministic dest names
    val appends: Seq[(String, String)] = {
      val insDir = new org.apache.hadoop.fs.Path(s"$path/$stage/ins")
      if (!fs.exists(insDir)) Seq.empty
      else fs.listStatus(insDir).filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith("ivf_cell="))
        .sortBy(_.getPath.getName)
        .flatMap { cd =>
          val cell = cd.getPath.getName.stripPrefix("ivf_cell=")
          fs.listStatus(cd.getPath).filter(_.isFile)
            .map(_.getPath.getName).filterNot(_.startsWith("_"))
            .sorted.zipWithIndex.map { case (f, i) =>
              (s"$stage/ins/ivf_cell=$cell/$f",
                s"cells/ivf_cell=$cell/fold-$runId-$i.parquet")
            }
        }.toSeq
    }
    // swaps: every delete-touched EXISTING cell; staged=false means the
    // cell's rows all retracted with no inserts — apply leaves no dir
    val swaps: Seq[(Int, Boolean)] = existingTouched.toSeq.map { c =>
      c -> fs.exists(new org.apache.hadoop.fs.Path(
        s"$path/$stage/swap/ivf_cell=$c"))
    }

    // ---- MARKER: from here the fold is committed; any crash replays
    // to completion via recoverIvfIndex ----
    writeIvfMarker(fs, root, runId, stage, swaps, appends, windowToken)
    applyIvfMarker(fs, root, stage, swaps, appends)
    // watermark BEFORE the marker sweep: a crash in between leaves the
    // marker, whose replay rewrites the same watermark — so a torn
    // watermark file always has a live marker to heal it
    windowToken.foreach(writeIvfWatermark(fs, root, _))
    fs.delete(new org.apache.hadoop.fs.Path(root, s"_ivffold-$runId.json"),
      false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/$stage"), true)
    fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
    // the flips happen by RENAME under Spark's back: drop any cached
    // file listing so a session that already read the index sees the
    // folded cells (datasource writes invalidate this themselves)
    spark.catalog.refreshByPath(s"$path/cells")
    (nIns, nDel)
  }

  private val IvfWatermarkName = "_ivfwatermark.json"

  /** How many committed window tokens the watermark file remembers —
    * enough to catch any realistic checkpoint replay depth at a few
    * hundred bytes of metadata. */
  private val IvfTokenHistory = 64

  /** The committed fold windows' tokens: (last, recent history
    * most-recent-last, last included). A torn file reads as absent — by
    * the write ordering a torn watermark always has a live marker whose
    * replay rewrites it. */
  private def readIvfWatermark(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): (Option[String], Seq[String]) = {
    val p = new org.apache.hadoop.fs.Path(root, IvfWatermarkName)
    if (!fs.exists(p)) return (None, Nil)
    try {
      val in = fs.open(p)
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      in.close()
      val rootNode = Option(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(bytes.toString("UTF-8")))
      val last = rootNode.flatMap(r => Option(r.get("token"))).map(_.asText())
      import scala.jdk.CollectionConverters._
      val hist = rootNode.flatMap(r => Option(r.get("history")))
        .map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(last.toSeq)
      (last, hist)
    } catch { case scala.util.control.NonFatal(_) => (None, Nil) }
  }

  private def writeIvfWatermark(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, token: String): Unit = {
    // carry a bounded, deduped history so a caller replaying a window
    // OLDER than the watermark (a rewound checkpoint) can be refused
    // instead of silently double-appending its inserts
    val (_, prior) = readIvfWatermark(fs, root)
    val hist = (prior.filterNot(_ == token) :+ token)
      .takeRight(IvfTokenHistory)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("token", token)
    val arr = node.putArray("history")
    hist.foreach(arr.add)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(root, IvfWatermarkName), true)
    try out.write(mapper.writeValueAsString(node).getBytes("UTF-8"))
    finally out.close()
  }

  private def writeIvfMarker(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, runId: String, stage: String,
      swaps: Seq[(Int, Boolean)], appends: Seq[(String, String)],
      windowToken: Option[String] = None): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("stage", stage)
    windowToken.foreach(node.put("token", _))
    val sw = node.putArray("swaps")
    swaps.foreach { case (c, staged) =>
      val e = sw.addObject(); e.put("cell", c); e.put("staged", staged)
    }
    val ap = node.putArray("appends")
    appends.foreach { case (src, dst) =>
      val e = ap.addObject(); e.put("src", src); e.put("dst", dst)
    }
    val out = fs.create(
      new org.apache.hadoop.fs.Path(root, s"_ivffold-$runId.json"), true)
    try out.write(mapper.writeValueAsString(node).getBytes("UTF-8"))
    finally out.close()
  }

  /** Apply (or re-apply) a fold's directory flips — idempotent at every
    * crash position:
    *  - a staged swap cell still holding its stage dir gets (re)built:
    *    drop the live cell dir, rename the staged one in (the staged
    *    content is FINAL — survivors + that cell's inserts — so a
    *    replay after a partial apply just rebuilds the same bytes);
    *    a swap whose stage dir is gone already applied — skipped;
    *  - an all-retracted swap (staged=false) deletes the cell dir —
    *    deleting again is harmless, nothing recreates it;
    *  - a staged append file renames to its RECORDED dest name; gone
    *    means applied. Appends only target cells no swap touches, so
    *    replayed swaps can never eat a renamed append. */
  private def applyIvfMarker(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, stage: String,
      swaps: Seq[(Int, Boolean)], appends: Seq[(String, String)]): Unit = {
    swaps.foreach { case (c, staged) =>
      val cellDir = new org.apache.hadoop.fs.Path(root, s"cells/ivf_cell=$c")
      if (staged) {
        val st = new org.apache.hadoop.fs.Path(root, s"$stage/swap/ivf_cell=$c")
        if (fs.exists(st)) {
          fs.delete(cellDir, true)
          require(fs.rename(st, cellDir), s"cell swap failed for $cellDir")
        }
      } else fs.delete(cellDir, true)
    }
    appends.foreach { case (src, dst) =>
      val s = new org.apache.hadoop.fs.Path(root, src)
      if (fs.exists(s)) {
        val d = new org.apache.hadoop.fs.Path(root, dst)
        fs.mkdirs(d.getParent)
        require(fs.rename(s, d), s"append rename failed: $s -> $d")
      }
    }
  }

  /** Replay any pending fold markers to completion, then sweep orphan
    * stage directories (a crash BEFORE its marker staged bytes but
    * never touched the cells — the index is intact at the old
    * watermark, the caller re-folds the window). Returns the number of
    * markers replayed. The completion marker is restored only when a
    * marker was actually replayed to done — an unmarked index with no
    * pending marker stays unmarked (it may be a crashed BUILD, which
    * only a rebuild can finish). Single-maintainer, like the fold. */
  def recoverIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val markers = fs.listStatus(root).filter(_.isFile).map(_.getPath)
      .filter(_.getName.startsWith("_ivffold-"))
    import scala.jdk.CollectionConverters._
    markers.foreach { mp =>
      val in = fs.open(mp)
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(bytes.toString("UTF-8"))
      val stage = node.get("stage").asText()
      val swaps = node.get("swaps").elements().asScala
        .map(e => e.get("cell").asInt() -> e.get("staged").asBoolean()).toSeq
      val appends = node.get("appends").elements().asScala
        .map(e => e.get("src").asText() -> e.get("dst").asText()).toSeq
      applyIvfMarker(fs, root, stage, swaps, appends)
      // the replayed window's token becomes the watermark (before the
      // marker sweep, same ordering as the fold path) so a retrying
      // caller skips the window instead of double-appending its inserts
      Option(node.get("token")).filterNot(_.isNull).map(_.asText())
        .foreach(writeIvfWatermark(fs, root, _))
      fs.delete(mp, false)
      fs.delete(new org.apache.hadoop.fs.Path(root, stage), true)
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
      spark.catalog.refreshByPath(s"$path/cells")
    }
    // pre-marker orphan stages: never applied, safe to drop
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith(".ivfstage-"))
      .foreach(fs.delete(_, true))
    markers.length
  }

  /** Probe a persisted IVF index: rank cells driver-side (no job), read
    * only those partitions, exact-rank the survivors. `centroids` MUST be
    * the set the index was written with — key the path by [[ivfSignature]]
    * so a mismatch is structurally impossible. */
  def ivfTopKIndexed(index: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Float]], probe: Seq[Float], k: Int,
      nProbe: Int): DataFrame = {
    val probeCells = rankProbeCells(centroids, probe, nProbe)
    topK(index.filter(col("ivf_cell").isin(probeCells: _*)), idCol, vecCol, probe, k)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket grouping + exact
    * cosine verification within buckets (same shape as MinHash LSH). One
    * groupBy on the code — no self-join, so the hyperplane-projection
    * pipeline runs once; pair expansion happens inside each bucket.
    *
    * SIZE THE CODE TO THE CORPUS: `bits` bounds the key space at 2^bits
    * buckets, so expected bucket occupancy is N / 2^bits REGARDLESS of the
    * data — at bits=8 (256 buckets) a billion-vector corpus averages ~4M
    * vectors per bucket and the in-bucket quadratic expansion cannot work.
    * Grow bits with log2(N) (e.g. bits ≈ log2(N) − log2(targetBucket)), or
    * band multiple independent codes as the MinHash path does. `maxBucket`
    * (0 = unlimited) is the backstop, mirroring
    * [[graft.operators.DedupApprox.lshCandidatePairs]]: buckets larger than
    * the cap (boilerplate/zero vectors collapsing onto one code) are
    * dropped rather than expanded quadratically. */
  def cosineNearDups(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 8, dim: Int = 64,
      maxBucket: Int = 0): DataFrame = {
    val idx = buildIndex(embeddings, vecCol, bits, dim)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("lsh_code"))
    val buckets = idx.groupBy(col("lsh_code"))
      .agg(collect_list(struct(col("id"), col("v"))).as("ds"))
      .filter(size(col("ds")) > 1)
    val capped =
      if (maxBucket > 0) buckets.filter(size(col("ds")) <= maxBucket) else buckets
    capped
      .select(explode(flatten(transform(col("ds"),
        a => transform(col("ds"), b => struct(a.as("a"), b.as("b")))))).as("p"))
      .filter(col("p.a.id") < col("p.b.id"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        cosine(col("p.a.v"), col("p.b.v")).as("cos"))
      .filter(col("cos") > threshold)
  }

  /** Embedding outlier detection: flag vectors in the cosine-distance
    * tail of their own cluster — mislabeled/garbage embeddings for corpus
    * audit, or candidates for re-clustering. Each vector is assigned to
    * its nearest centroid (the [[ivfAssign]] argmax, same tie-break), its
    * distance is `1 - cos`, and rows beyond the cell's exact interpolated
    * `pctl` quantile are returned.
    *
    * Scale shape: assignment is k fused native cosine loops per row (no
    * shuffle); the per-cell quantile aggregates to k rows which join back
    * broadcast; one filter. The exact `percentile` buffers each CELL's
    * distances on one executor — fine for k ≪ N cells of bounded size;
    * pass the approx path (accuracy knob, as in
    * [[Stats.winsorizePerGroup]]) if cells outgrow memory. Output
    * distances snap to the 1e-6 lattice (IEEE-exact ops only), so a SQL
    * oracle reproduces the frame bit-for-bit. */
  def centroidOutliers(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Float]], pctl: Double = 0.95): DataFrame = {
    require(centroids.nonEmpty, "centroidOutliers needs centroids")
    require(pctl > 0 && pctl < 1, s"pctl $pctl must be in (0, 1)")
    val best = bestCell(col(vecCol), centroids)
    val assigned = embeddings.select(col(idCol).as("id"),
      best.getField("cell").cast("long").as("cell"),
      (lit(1.0) - best.getField("cos")).as("dist"))
    val bounds = assigned.groupBy(col("cell"))
      .agg(expr(s"percentile(dist, $pctl)").as("bound"))
    assigned.join(broadcast(bounds), Seq("cell"))
      .filter(col("dist") > col("bound"))
      .select(col("id"), col("cell"),
        (floor(col("dist") * 1000000 + 0.5) / 1000000).as("dist"),
        (floor(col("bound") * 1000000 + 0.5) / 1000000).as("cutoff"))
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (lexical BM25 + dense ANN, or any N ranked lists):
    * `score(d) = Σ_lists 1 / (kRrf + rank_list(d))`, a document absent
    * from a list contributing 0 from it. Rank-based fusion needs no score
    * calibration between heterogeneous retrievers, which is exactly why
    * it is the default hybrid combiner in production search stacks.
    *
    * Each input frame must carry (`idCol`, "rank") with rank 1-based and
    * unique per frame — the bounded top-k output of [[topK]],
    * [[TextAnalysis.bm25Rank]] (+ row_number), or any other retriever.
    * Inputs are top-k-sized, NOT corpus-sized: the chain of full-outer
    * joins and the final sort all run on at most Σ k_i rows, so the
    * fusion cost is independent of corpus scale (AQE broadcasts every
    * join). Determinism: each term is one IEEE division of exact
    * integers and the sum folds left-to-right in input order — a SQL
    * engine mirroring the same expression reproduces the double
    * bit-for-bit. Ties break by id. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, kRrf: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two ranked lists")
    require(kRrf >= 0, s"kRrf $kRrf must be non-negative")
    require(topK > 0, s"topK $topK must be positive")
    val renamed = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), col("rank").cast("long").as(s"rank_$i"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"rank_$i").cast("double")),
        lit(0.0)))
      .reduce(_ + _)
    joined
      .select((col(idCol) +: rankings.indices.map(i => col(s"rank_$i")) :+
        score.as("rrf_score")): _*)
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
  }

  // ---------------------------------------------------------------------
  // Product quantization (PQ) — the memory-side ANN scale path: each
  // vector compresses to m small codes (m bytes at k<=256), and probe
  // scoring becomes m table lookups instead of a dim-wide loop. At 100 TB
  // the corpus's PQ codes fit in a fraction of the raw footprint, and the
  // probe never touches a float of corpus data — the complement to the
  // IVF path's IO pruning (IVF-PQ composes the two: prune cells, then
  // ADC-score codes).
  // ---------------------------------------------------------------------

  /** Squared L2 distance between two float arrays (index-order left
    * fold, double accumulation — the [[dot]] parity discipline). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Deterministic PQ codebooks: the `k` smallest-id vectors' subspace
    * slices — m codebooks of k centroids × (dim/m) dims. Deterministic
    * seeds keep the codec oracle-checkable (the [[ivfCentroids]]
    * rationale); production refines each subspace's codebook with
    * [[kmeansRefine]] over the sliced column and nothing downstream
    * changes. */
  def pqCodebooks(embeddings: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Seq[Seq[Seq[Float]]] = {
    require(m > 0 && k > 0, s"need m>0, k>0; got m=$m k=$k")
    val seeds = embeddings.orderBy(col(idCol)).limit(k).select(vecCol)
      .collect().map(_.getSeq[Float](0).toSeq).toSeq
    require(seeds.nonEmpty, "pqCodebooks needs a non-empty corpus")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val s = dim / m
    (0 until m).map(j => seeds.map(v => v.slice(j * s, j * s + s)))
  }

  /** Encode every vector to its m nearest-centroid codes (`_code0` ..):
    * per subspace an argmin-L2 over the codebook — m·k fused loops per
    * row, NO shuffle, ties to the smaller code (struct min is
    * lexicographic on (dist, code)). The encoded frame is the artifact
    * to persist: m ints per vector replace dim floats. */
  def pqEncode(df: DataFrame, vecCol: String,
      codebooks: Seq[Seq[Seq[Float]]]): DataFrame =
    codebooks.zipWithIndex.foldLeft(df) { case (acc, (cb, j)) =>
      val s = cb.head.length
      val sub = slice(col(vecCol), j * s + 1, s)
      val scored = cb.zipWithIndex.map { case (c, ci) =>
        struct(l2sq(sub, lit(c.toArray)).as("d"), lit(ci).as("c")) }
      acc.withColumn(s"_code$j",
        (if (scored.size == 1) scored.head else least(scored: _*))
          .getField("c"))
    }

  /** ADC (asymmetric distance computation) top-k: the probe's m×k
    * distance table is computed driver-side (tiny), then every encoded
    * row's approximate distance is m literal-array lookups summed left
    * to right — no corpus float is ever read. Returns (idCol, adc)
    * ascending. The index-order double arithmetic mirrors [[l2sq]], so
    * an external engine reproduces every distance bit-for-bit. */
  def pqAdcTopK(encoded: DataFrame, idCol: String, probe: Seq[Float],
      codebooks: Seq[Seq[Seq[Float]]], k: Int): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val tables = codebooks.zipWithIndex.map { case (cb, j) =>
      val s = cb.head.length
      cb.map { c =>
        var acc = 0.0; var d = 0
        while (d < s) {
          val diff = probe(j * s + d).toDouble - c(d).toDouble
          acc += diff * diff; d += 1
        }
        acc
      }.toArray
    }
    val adc = tables.zipWithIndex.map { case (t, j) =>
      element_at(lit(t), col(s"_code$j") + 1) }.reduce(_ + _)
    encoded.select(col(idCol), adc.as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication where K-MEANS CELLS bucket the corpus — exact cosine
    * pairs expand only WITHIN a cell (cosine is scale-invariant, so a
    * scaled duplicate always lands in its original's cell), duplicate
    * groups are connected components over the in-cell pair graph, and
    * each group keeps the member FARTHEST from its cell centroid (the
    * paper's policy: the least prototypical example carries the most
    * information; ties break to the smaller id). Complements the
    * LSH-bucketed q114 path: there the bucketing is random hyperplanes,
    * here it is learned geometry, so near-dups that straddle an LSH
    * bucket boundary still meet.
    *
    * Scale: one shuffle by cell for the pair join; per-cell expansion is
    * quadratic, so cells are capped LOUDLY (`maxCell`) — at 100 TB you
    * raise k (more, smaller cells), not the cap. The cell-count probe
    * collects k rows (one per centroid), never data.
    *
    * Returns (id, cell, grp, cos_c, kept). */
  def semDedup(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Float]], threshold: Double,
      maxCell: Long = 1000000L): DataFrame = {
    require(centroids.nonEmpty, "semDedup needs centroids")
    val e = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("cell", ivfAssign(col("v"), centroids))
    val sizes = e.groupBy("cell").count().collect() // k rows, bounded
    sizes.foreach { r =>
      require(r.getLong(1) <= maxCell,
        s"semDedup cell ${r.get(0)} holds ${r.getLong(1)} vectors > " +
          s"maxCell=$maxCell — in-cell pair expansion is quadratic; " +
          "raise k (more, smaller cells) instead of the cap")
    }
    val pairs = e.select(col("cell"), col("id").as("id_a"), col("v").as("va"))
      .join(e.select(col("cell"), col("id").as("id_b"), col("v").as("vb")),
        Seq("cell"))
      .where(col("id_a") < col("id_b") &&
        cosine(col("va"), col("vb")) >= threshold)
      .select("id_a", "id_b")
    val comp = Components.connectedComponentsStar(pairs, "id_a", "id_b")
      .select(col("node").as("id"), col("label"))
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cell", "cv")
    val scored = e.join(broadcast(centDf), "cell")
      .withColumn("cos_c", cosine(col("v"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("cos_c").asc, col("id").asc)
    scored.join(comp, Seq("id"), "left")
      .withColumn("grp", coalesce(col("label"), col("id")))
      .withColumn("kept", row_number().over(w) === 1)
      .select("id", "cell", "grp", "cos_c", "kept")
  }
}
