package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Checksums, Normalize}
import graft.operators.{Dedup, DedupApprox, Export, Multimodal, Similarity, Strategies, TextAnalysis}
import graft.sources.Sources

import QueryShared._

/** Embedding similarity and clustering queries: brute-force and
  * LSH/IVF ANN, k-means, quantization, centroid audits. */
private[graft] object SimilarityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- brute-force cosine top-k ----------------------------------
    "q27_cosine_topk" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      Similarity.topK(e, "vec_id", "embedding", probeVec(s, dir), 20)
        .select(col("vec_id"), r(col("cos"), 6).as("cos"))
    }),


    // ----- Matryoshka truncation recall curve ------------------------
    "q269_truncation_recall" -> ((s, dir) => {
      // how much of the true top-20 neighborhood each embedding prefix
      // tier (8/16/32/64 of 64 dims) retains for the standard probe —
      // the audit behind serving truncated (MRL-style) embeddings.
      // Cosine renormalizes implicitly, so truncation is a slice;
      // both engines fold the dot products in index order and break
      // ties (cos desc, vec_id)
      graft.operators.Similarity.truncationRecall(
        rd(s, dir, "embeddings"), "vec_id", "embedding",
        probeVec(s, dir), k = 20, dims = Seq(8, 16, 32, 64))
        .orderBy("m")
    }),


    // ----- cosine threshold scan -------------------------------------
    "q28_cosine_threshold" -> ((s, dir) => {
      Similarity.aboveThreshold(rd(s, dir, "embeddings"), "vec_id", "embedding",
        probeVec(s, dir), 0.15)
        .select(col("vec_id"), r(col("cos"), 6).as("cos"))
        .orderBy("vec_id")
    }),


    // ----- product-quantization ADC ANN (memory-side scale path) -----
    "q193_pq_ann" -> ((s, dir) => {
      // every vector compresses to 8 codes (argmin-L2 per 8-dim
      // subspace over 16 deterministic centroids); the probe never
      // reads a corpus float — its 8×16 distance table is computed
      // driver-side and approximate distances are 8 literal lookups
      // per row. The exact-L2 top-10 rides along as the recall flag;
      // at 100 TB the codes are ~1/32 of the raw footprint and this
      // composes with the IVF cell pruning (q49) into IVF-PQ
      val emb = rd(s, dir, "embeddings")
      val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16)
      val probe = emb.orderBy(col("vec_id").desc).limit(1)
        .select("embedding").collect()(0).getSeq[Float](0).toSeq
      val approx = Similarity.pqAdcTopK(
        Similarity.pqEncode(emb, "embedding", cbs),
        "vec_id", probe, cbs, k = 10)
      val exact = emb.select(col("vec_id"),
          Similarity.l2sq(col("embedding"), lit(probe.toArray)).as("_d"))
        .orderBy(col("_d").asc, col("vec_id").asc).limit(10)
        .select(col("vec_id"), lit(true).as("in_exact_topk"))
      approx.join(exact, Seq("vec_id"), "left")
        .select(col("vec_id"), r(col("adc"), 6).as("adc"),
          coalesce(col("in_exact_topk"), lit(false)).as("in_exact_topk"))
        .orderBy("adc", "vec_id")
    }),


    // ----- embedding near-dup via hyperplane LSH (rows-only) ---------
    "q29_embed_neardup" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      // inject exact-duplicate vectors (scaled copies have cosine 1.0)
      val dup = e.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      Similarity.cosineNearDups(
        e.select("vec_id", "embedding").unionByName(dup),
        "vec_id", "embedding", threshold = 0.999, bits = 8,
        maxBucket = 100000)
        .select(col("id_a"), col("id_b"), r(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b")
    }),

    // ----- split leakage at the embedding level ----------------------
    "q205_embedding_leakage" -> ((s, dir) => {
      // the eval-on-memorized-vectors audit: near-identical embedding
      // pairs (q29's LSH-bucketed cosine > 0.999) whose endpoints
      // landed in DIFFERENT doc-level splits are leakage — q149 fixes
      // this for text near-dups, this measures it for embeddings.
      // Pair counts per unordered split pair, leak rows flagged
      val e = rd(s, dir, "embeddings")
      val dup = e.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      val aug = e.select("vec_id", "embedding").unionByName(dup)
      val pairs = Similarity.cosineNearDups(aug, "vec_id", "embedding",
        threshold = 0.999, bits = 8, maxBucket = 100000)
      val split = graft.operators.Sampling.splitAssign(
        aug.select("vec_id"), Seq("vec_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      pairs
        .join(split.select(col("vec_id").as("id_a"), col("split").as("_sa")),
          "id_a")
        .join(split.select(col("vec_id").as("id_b"), col("split").as("_sb")),
          "id_b")
        .select(least(col("_sa"), col("_sb")).as("split_a"),
          greatest(col("_sa"), col("_sb")).as("split_b"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("leaks", col("split_a") =!= col("split_b"))
        .orderBy("split_a", "split_b")
    }),


    // ----- SEMANTIC dedup: embedding pairs -> clusters -> canonical --
    "q114_semantic_canonical" -> ((s, dir) => {
      // the embedding-space analog of q73's text canonicalization:
      // hyperplane-LSH-bucketed cosine near-dup pairs (q29's operator)
      // feed the O(log n) large-star/small-star clustering — the
      // adversarial-depth-safe CC variant, here under the oracle gate
      // (elsewhere spec-only) — and every vector maps to its cluster's
      // minimum id; unpaired vectors stay their own canonical
      val e = rd(s, dir, "embeddings")
      val dup = e.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      val aug = e.select("vec_id", "embedding").unionByName(dup)
      val pairs = Similarity.cosineNearDups(aug, "vec_id", "embedding",
        threshold = 0.999, bits = 8, maxBucket = 100000)
      val comp = graft.operators.Components
        .connectedComponentsStar(pairs, "id_a", "id_b")
        .select(col("node").as("vec_id"), col("label").as("canonical_id"))
      aug.select("vec_id").join(comp, Seq("vec_id"), "left")
        .withColumn("canonical_id", coalesce(col("canonical_id"), col("vec_id")))
        .withColumn("kept", col("canonical_id") === col("vec_id"))
        .orderBy("vec_id")
    }),


    // ----- SemDeDup: k-means cells -> in-cell cosine -> keep-farthest --
    "q279_semdedup" -> ((s, dir) => {
      // SemDeDup (arXiv:2303.09540) end to end: k-means cells bucket
      // the corpus (cosine is scale-invariant, so q114's scaled
      // duplicates land in their originals' cells by construction),
      // exact cosine pairs expand ONLY within a cell, duplicate groups
      // are connected components, and each group keeps the member
      // FARTHEST from its cell centroid — the paper's keep-the-least-
      // prototypical policy, the opposite of q114's min-id canonical.
      // The oracle replays assignment (argmax cosine, ties to the
      // larger cell, the q68 convention), in-cell pairs, recursive-CTE
      // components, and the keep window, all on exact double folds.
      val e = rd(s, dir, "embeddings")
      val dup = e.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      val aug = e.select("vec_id", "embedding").unionByName(dup)
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      Similarity.semDedup(aug, "vec_id", "embedding", cents,
          threshold = 0.999)
        .select(col("id").as("vec_id"), col("cell").cast("long").as("cell"),
          col("grp"), r(col("cos_c"), 6).as("cos_c"), col("kept"))
        .orderBy("vec_id")
    }),


    // ----- ANN top-k via persisted LSH index (partition-pruned probe) --
    "q30_ann_topk" -> ((s, dir) => {
      // build-once/probe-many (cachedIndexPath): codes are computed in ONE
      // indexing pass and persisted partitionBy(lsh_code); the probe
      // enumerates its Hamming ball driver-side and reads only those
      // partitions
      val idxPath = cachedIndexPath(s, dir, "graft_q30_index", "embeddings",
        Similarity.indexSignature(bits = 8, dim = 64)) { p =>
        Similarity.writeIndex(rd(s, dir, "embeddings"), "embedding", p, bits = 8)
      }
      val idx = Similarity.readIndex(s, idxPath)
      Similarity.annTopK(idx, "vec_id", "embedding", probeVec(s, dir),
        k = 10, bits = 8, probeHamming = 2, dim = 64)
        .select(col("vec_id"), r(col("cos"), 6).as("cos"))
    }),


    // ----- IVF-style ANN: persisted inverted file, pruned cell probe --
    "q49_ivf_topk" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      // build-once/probe-many (cachedIndexPath, keyed by the
      // centroid-value signature): the cell assignment is computed in ONE
      // indexing pass and persisted partitionBy(ivf_cell); the probe
      // reads only its nProbe cell directories
      val idxPath = cachedIndexPath(s, dir, "graft_q49_index", "embeddings",
        Similarity.ivfSignature(cents)) { p =>
        Similarity.writeIvfIndex(e, "embedding", p, cents)
      }
      val idx = Similarity.readIvfIndex(s, idxPath)
      Similarity.ivfTopKIndexed(idx, "vec_id", "embedding", cents,
        probeVec(s, dir), k = 10, nProbe = 2)
        .select(col("vec_id"), r(col("cos"), 6).as("cos"))
    }),


    // ----- batched multi-probe ANN (the serving shape) ---------------
    // ----- hybrid retrieval: BM25 + dense ANN fused by RRF -----------
    "q120_hybrid_rrf" -> ((s, dir) => {
      // the production hybrid-search shape: one lexical top-15 (BM25),
      // one dense top-15 (cosine vs the probe vector, ids shared with
      // documents), fused by reciprocal-rank fusion — no score
      // calibration across retrievers, rank-only. Both inputs are
      // bounded top-k frames, so the rank windows and the fusion joins
      // run on <=30 rows regardless of corpus size (the corpus-sized
      // work lives inside the two retrievers, which are independently
      // scale-shaped). Ranks are assigned over lattice-snapped scores
      // (bm25 is exact by construction; cos snapped to 1e-6) so rank
      // order is engine-portable even in the last ulp.
      val bm = TextAnalysis.bm25Rank(docsBase(s, dir), "doc_id", "text",
        Seq("dup", "vector", "spark"), topK = 15)
        .select(col("id").as("doc_id"),
          row_number().over(Window.orderBy(col("bm25").desc, col("id"))).as("rank"))
      val ann = Similarity.topK(rd(s, dir, "embeddings"), "vec_id", "embedding",
        probeVec(s, dir), 15)
        .select(col("vec_id").as("doc_id"), r(col("cos"), 6).as("cos"))
        .select(col("doc_id"),
          row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))).as("rank"))
      Similarity.rrfFuse(Seq(bm, ann), "doc_id", kRrf = 60, topK = 10)
        .select(col("doc_id"), col("rank_0").as("rank_bm25"),
          col("rank_1").as("rank_ann"), r(col("rrf_score"), 6).as("rrf_score"))
    }),


    "q116_ann_batch" -> ((s, dir) => {
      // top-k per probe for a 4-probe batch in ONE corpus pass: probes
      // broadcast, WindowGroupLimit keeps each task's local top-k per
      // probe before the exchange (asserted in PlanSpec)
      val e = rd(s, dir, "embeddings")
      val probes = e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      Similarity.topKBatch(e, "vec_id", "embedding",
        probes, "probe_id", "embedding", k = 5)
        .select(col("probe_id"), col("vec_id"), r(col("cos"), 6).as("cos"))
        .orderBy("probe_id", "vec_id")
    }),


    // ----- IVF incremental append: build half, append half -----------
    "q115_ivf_incremental" -> ((s, dir) => {
      // index built from the even vec_id half, odd half APPENDED with the
      // SAME centroids — the probe must equal q49's from-scratch ranking
      // (same oracle): assignment is pure arithmetic over fixed
      // geometry, so append ≡ rebuild bit-for-bit
      val e = rd(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      val idxPath = cachedIndexPath(s, dir, "graft_q115_index", "embeddings",
        Similarity.ivfSignature(cents) + "_incr") { p =>
        // markComplete=false: only the LAST step of a composed build may
        // create the completion marker the cache keys on
        Similarity.writeIvfIndex(e.filter(col("vec_id") % 2 === 0),
          "embedding", p, cents, markComplete = false)
        Similarity.appendToIvfIndex(e.filter(col("vec_id") % 2 =!= 0),
          "embedding", p, cents)
      }
      val idx = Similarity.readIvfIndex(s, idxPath)
      Similarity.ivfTopKIndexed(idx, "vec_id", "embedding", cents,
        probeVec(s, dir), k = 10, nProbe = 2)
        .select(col("vec_id"), r(col("cos"), 6).as("cos"))
    }),


    // ----- IVF maintained off the lake's change feed ------------------
    "q306_ivf_cdc_maintenance" -> ((s, dir) => {
      // the full CDC -> ANN-index loop: an IVF index built from the
      // table AT v1 is advanced to v2 by folding the SIGNED change feed
      // (appends assigned into their cells, deletes retracted by
      // touched-cell rewrite) — cost ∝ the delta, never a corpus
      // re-assignment. The delete wave removes vec_id%9==4, which
      // includes a CENTROID SEED (id 4): its vector scores cos=1.0
      // against its own cell, so a stale index entry would top the
      // ranking — the probe result is the retraction detector. The run
      // also gates folded ≡ rebuilt-from-live cell-for-cell; the oracle
      // replays assignment + probe over the live set in SQL.
      val out = scratchPath(dir, "q306_records")
      val idxPath = scratchPath(dir, "q306_index")
      val rebuiltPath = scratchPath(dir, "q306_rebuild")
      val types = "Vec:numberArray,VecId:number"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, idxPath, rebuiltPath).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val e = rd(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      def asLake(df: org.apache.spark.sql.DataFrame) = df.select(
        concat(lit("v"), lpad(col("vec_id").cast("string"), 7, "0"))
          .as("_record_id"),
        col("embedding").cast("array<double>").as("Vec"),
        col("vec_id").cast("double").as("VecId"))
      def toVecs(df: org.apache.spark.sql.DataFrame) = df.select(
        col("VecId").cast("long").as("vec_id"),
        col("Vec").cast("array<float>").as("embedding")) // exact roundtrip
      asLake(e.filter(col("vec_id") % 3 < 2)).coalesce(1)
        .write.format("graft-records").option("path", out)
        .option("dataFormat", "parquet").mode("append").save()
      val v1 = graft.operators.LakeSnapshots.commit(s, out)
      Similarity.writeIvfIndex(
        toVecs(s.read.format("graft-records").option("path", out)
          .option("fieldTypes", types).option("versionAsOf", v1.toString)
          .load()),
        "embedding", idxPath, cents)
      asLake(e.filter(col("vec_id") % 3 === 2)).coalesce(1)
        .write.format("graft-records").option("path", out)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.DeletionVectors.delete(s, out, types,
        col("VecId") % 9 === 4)
      val v2 = graft.operators.LakeSnapshots.commit(s, out)
      val changes = graft.operators.LakeChangelog
        .changes(s, out, types, v1, v2)
      // the window token makes a crash-retry exactly-once: a re-fold of
      // an already-committed window no-ops instead of double-appending
      val (nIns, nDel) = Similarity.applyChangesToIvfIndex(
        changes.select(col("VecId").cast("long").as("vec_id"),
          col("Vec").cast("array<float>").as("embedding"), col("m")),
        "vec_id", "embedding", idxPath, cents,
        windowToken = Some(s"v$v1-$v2"))
      require(nIns > 0 && nDel > 0,
        s"the window must carry both signs: +$nIns -$nDel")
      val retried = Similarity.applyChangesToIvfIndex(
        changes.select(col("VecId").cast("long").as("vec_id"),
          col("Vec").cast("array<float>").as("embedding"), col("m")),
        "vec_id", "embedding", idxPath, cents,
        windowToken = Some(s"v$v1-$v2"))
      require(retried == ((0L, 0L)),
        s"a retried committed window must no-op, got $retried")
      // folded ≡ rebuilt-from-live, cell for cell (assignment is pure
      // arithmetic over fixed geometry, so the sets must be identical).
      // The rebuild is a SECOND full index build run purely as a gate —
      // production only ever pays the ∝-delta fold — so it runs at the
      // correctness SFs (sf0.001/sf0.01, where the driver's oracle gate
      // executes) and the bench SF measures the fold alone.
      val sfName = new java.io.File(dir).getName
      if (sfName == "sf0.001" || sfName == "sf0.01") {
        Similarity.writeIvfIndex(
          toVecs(s.read.format("graft-records").option("path", out)
            .option("fieldTypes", types).load()),
          "embedding", rebuiltPath, cents)
        val a = Similarity.readIvfIndex(s, idxPath)
          .select(col("vec_id"), col("ivf_cell"))
        val b = Similarity.readIvfIndex(s, rebuiltPath)
          .select(col("vec_id"), col("ivf_cell"))
        require(a.exceptAll(b).unionByName(b.exceptAll(a)).limit(1).isEmpty,
          "CDC-folded index diverged from a rebuild over the live table")
      }
      Similarity.ivfTopKIndexed(Similarity.readIvfIndex(s, idxPath),
        "vec_id", "embedding", cents, probeVec(s, dir), k = 10, nProbe = 2)
        .select(col("vec_id"), r(col("cos"), 6).as("cos"))
    }),


    // ----- k-means refinement step (Lloyd iteration for IVF) ---------
    "q68_kmeans_step" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      Similarity.kmeansStep(e, "embedding", cents)
        .select(col("cell"), col("dim"), col("n_members"), r(col("mean"), 6).as("mean"))
        .orderBy("cell", "dim")
    }),


    // ----- iterated k-means: refine once, then re-assign -------------
    "q75_kmeans_refine" -> ((s, dir) => {
      // one full Lloyd refinement (assign -> DECIMAL-routed means ->
      // Float-rounded centroids) and then the SECOND step's aggregation
      // over the refined geometry; the oracle unrolls both iterations as
      // CTEs, so assignment, fallback, and Float rounding all replay
      // engine-independently
      val e = rd(s, dir, "embeddings")
      val seeds = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      val (cents1, _) = Similarity.kmeansRefine(e, "embedding", seeds, iters = 1)
      Similarity.kmeansStep(e, "embedding", cents1)
        .select(col("cell"), col("dim"), col("n_members"), r(col("mean"), 6).as("mean"))
        .orderBy("cell", "dim")
    }),


    "q82_quantize_int8" -> ((s, dir) => {
      // per-vector max-abs int8: scalar order-independent summaries keep
      // the frame exact-hash comparable (floor(v+0.5) rounding and pure
      // IEEE mul/div reproduce bit-identically in DuckDB)
      graft.operators.Quantize.int8Report(rd(s, dir, "embeddings"),
        "vec_id", "embedding")
        .orderBy("vec_id")
    }),


    // ----- feature-hashed BoW embedding + sparse cosine top-k --------
    "q180_hash_embedding" -> ((s, dir) => {
      // model-free document vectors straight from the token stream: the
      // hashing trick (16 md5 buckets, independent salted sign hash)
      // gives exact-integer sparse components any md5-bearing engine
      // reproduces; similarity search then runs on the sparse layout —
      // dot via a bucket equi-join against the broadcast probe vector,
      // one sqrt + one divide per candidate
      val emb = Similarity.hashedBowEmbedding(docsBase(s, dir),
        "doc_id", "text", dims = 16)
      Similarity.sparseCosineTopK(emb, probeId = 42L, k = 15)
        .withColumnRenamed("id", "doc_id")
    }),


    // ----- per-cluster embedding outlier audit -----------------------
    "q88_centroid_outliers" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      Similarity.centroidOutliers(e, "vec_id", "embedding", cents, pctl = 0.9)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    }),

  )

  /** The q29 LSH-bucketed cosine near-dup pair derivation (augmented
    * embeddings -> 8-bit hyperplane codes -> in-bucket exact cosine),
    * shared by the pair query (q29) and the semantic canonicalization
    * built on top of it (q114). */
  private val cosinePairCtes =
    """WITH aug AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000, [CAST(x * CAST(2.0 AS FLOAT) AS FLOAT) FOR x IN embedding]
      |  FROM embeddings WHERE vec_id % 5 = 0),
      |code AS (SELECT vec_id, embedding,
      |  list_sum([CASE WHEN list_sum([CAST(embedding[d] AS DOUBLE) *
      |      (CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(d - 1 AS VARCHAR)), 1, 15)) AS BIGINT)
      |       / 1152921504606846975.0 * 2 - 1)
      |      FOR d IN range(1, len(embedding) + 1)]) >= 0
      |    THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END FOR i IN range(0, 8)]) AS lsh_code
      |  FROM aug),
      |pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(b.embedding[d] AS DOUBLE)
      |            FOR d IN range(1, len(a.embedding) + 1)]) /
      |  (sqrt(list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(a.embedding[d] AS DOUBLE)
      |                  FOR d IN range(1, len(a.embedding) + 1)])) *
      |   sqrt(list_sum([CAST(b.embedding[d] AS DOUBLE) * CAST(b.embedding[d] AS DOUBLE)
      |                  FOR d IN range(1, len(b.embedding) + 1)]))) AS cos
      |  FROM code a JOIN code b ON a.lsh_code = b.lsh_code AND a.vec_id < b.vec_id)""".stripMargin

  /** From-scratch IVF top-k: centroids = first 8 vectors, nProbe=2,
    * k=10. Shared by q49 (one-shot build) and q115 (build-then-append),
    * which must be indistinguishable by construction. */
  private val ivfTopKOracle =
    """WITH cent AS (SELECT vec_id AS cell, embedding AS cv
      |  FROM embeddings WHERE vec_id < 8),
      |probe AS (SELECT embedding AS pv FROM embeddings ORDER BY vec_id LIMIT 1),
      |scored AS (SELECT e.vec_id, e.embedding, c.cell,
      |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
      |            FOR d IN range(1, len(e.embedding) + 1)]) /
      |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
      |                  FOR d IN range(1, len(e.embedding) + 1)])) *
      |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
      |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
      |  FROM embeddings e CROSS JOIN cent c),
      |assigned AS (SELECT vec_id, embedding FROM (
      |  SELECT vec_id, embedding, cell,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
      |  FROM scored)
      |  WHERE rn = 1 AND cell IN (
      |    SELECT cell FROM (
      |      SELECT c.cell,
      |        list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(p.pv[d] AS DOUBLE)
      |                  FOR d IN range(1, len(c.cv) + 1)]) /
      |        (sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
      |                        FOR d IN range(1, len(c.cv) + 1)])) *
      |         sqrt(list_sum([CAST(p.pv[d] AS DOUBLE) * CAST(p.pv[d] AS DOUBLE)
      |                        FOR d IN range(1, len(p.pv) + 1)]))) AS pcos
      |      FROM cent c CROSS JOIN probe p)
      |    ORDER BY pcos DESC, cell LIMIT 2)),
      |c AS (SELECT a.vec_id,
      |  list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(p.pv[d] AS DOUBLE)
      |            FOR d IN range(1, len(a.embedding) + 1)]) /
      |  (sqrt(list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(a.embedding[d] AS DOUBLE)
      |                  FOR d IN range(1, len(a.embedding) + 1)])) *
      |   sqrt(list_sum([CAST(p.pv[d] AS DOUBLE) * CAST(p.pv[d] AS DOUBLE)
      |                  FOR d IN range(1, len(p.pv) + 1)]))) AS cos
      |  FROM assigned a CROSS JOIN probe p)
      |SELECT vec_id, floor(cos * 1000000 + 0.5) / 1000000 AS cos
      |FROM c ORDER BY c.cos DESC, vec_id LIMIT 10""".stripMargin

  val oracleSql: Map[String, String] = Map(

    // per tier m: top-20 under prefix-m cosine, intersected with the
    // m=64 (full) set — the same index-order double fold as q27
    "q269_truncation_recall" ->
      """WITH p AS (SELECT embedding AS pv FROM embeddings ORDER BY vec_id LIMIT 1),
        |ms AS (SELECT unnest([8, 16, 32, 64]) AS m),
        |sc AS (SELECT ms.m, vec_id,
        |  list_sum([CAST(embedding[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |            FOR i IN range(1, ms.m + 1)]) /
        |  (sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |                  FOR i IN range(1, ms.m + 1)])) *
        |   sqrt(list_sum([CAST(pv[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |                  FOR i IN range(1, ms.m + 1)]))) AS cos
        |  FROM embeddings, p, ms),
        |top AS (SELECT m, vec_id,
        |  row_number() OVER (PARTITION BY m ORDER BY cos DESC, vec_id) AS rn
        |  FROM sc),
        |sel AS (SELECT m, vec_id FROM top WHERE rn <= 20),
        |fullset AS (SELECT vec_id FROM sel WHERE m = 64)
        |SELECT CAST(s.m AS INTEGER) AS m, CAST(20 AS INTEGER) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n_overlap
        |FROM sel s JOIN fullset f USING (vec_id)
        |GROUP BY s.m ORDER BY m""".stripMargin,


    "q27_cosine_topk" ->
      """WITH p AS (SELECT embedding AS pv FROM embeddings ORDER BY vec_id LIMIT 1),
        |c AS (SELECT vec_id,
        |  list_sum([CAST(embedding[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |            FOR i IN range(1, len(embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |                  FOR i IN range(1, len(embedding) + 1)])) *
        |   sqrt(list_sum([CAST(pv[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |                  FOR i IN range(1, len(pv) + 1)]))) AS cos
        |  FROM embeddings, p)
        |SELECT vec_id, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |FROM c ORDER BY c.cos DESC, vec_id LIMIT 20""".stripMargin,


    // full PQ rebuild: codebooks from the 16 smallest ids, per-(vector,
    // subspace) argmin assignment, probe table, ordered-by-j ADC sum —
    // every double the same index-order fold the engine computes
    "q193_pq_ann" ->
      """WITH p AS (SELECT embedding AS pv FROM embeddings
        |  ORDER BY vec_id DESC LIMIT 1),
        |seeds AS (SELECT vec_id, embedding FROM embeddings
        |  ORDER BY vec_id LIMIT 16),
        |js AS (SELECT unnest(range(0, 8)) AS j),
        |cb AS (SELECT j,
        |  row_number() OVER (PARTITION BY j ORDER BY vec_id) - 1 AS ci,
        |  embedding[j*8+1 : j*8+8] AS c
        |  FROM seeds CROSS JOIN js),
        |sub AS (SELECT e.vec_id, js.j, e.embedding[js.j*8+1 : js.j*8+8] AS sv
        |  FROM embeddings e CROSS JOIN js),
        |dist AS (SELECT sub.vec_id, sub.j, cb.ci,
        |  list_sum([(CAST(sub.sv[d] AS DOUBLE) - CAST(cb.c[d] AS DOUBLE))
        |          * (CAST(sub.sv[d] AS DOUBLE) - CAST(cb.c[d] AS DOUBLE))
        |          FOR d IN range(1, 9)]) AS dd
        |  FROM sub JOIN cb ON cb.j = sub.j),
        |code AS (SELECT vec_id, j, ci FROM (
        |  SELECT vec_id, j, ci,
        |    row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, ci) AS rn
        |  FROM dist) WHERE rn = 1),
        |pt AS (SELECT cb.j, cb.ci,
        |  list_sum([(CAST(p.pv[cb.j*8+d] AS DOUBLE) - CAST(cb.c[d] AS DOUBLE))
        |          * (CAST(p.pv[cb.j*8+d] AS DOUBLE) - CAST(cb.c[d] AS DOUBLE))
        |          FOR d IN range(1, 9)]) AS dd
        |  FROM cb CROSS JOIN p),
        |adc AS (SELECT code.vec_id, list_sum(list(pt.dd ORDER BY pt.j)) AS adc
        |  FROM code JOIN pt ON pt.j = code.j AND pt.ci = code.ci GROUP BY 1),
        |top AS (SELECT vec_id, adc FROM adc ORDER BY adc, vec_id LIMIT 10),
        |ex AS (SELECT e.vec_id,
        |  list_sum([(CAST(e.embedding[i] AS DOUBLE) - CAST(p.pv[i] AS DOUBLE))
        |          * (CAST(e.embedding[i] AS DOUBLE) - CAST(p.pv[i] AS DOUBLE))
        |          FOR i IN range(1, len(e.embedding) + 1)]) AS d
        |  FROM embeddings e CROSS JOIN p),
        |ext AS (SELECT vec_id FROM ex ORDER BY d, vec_id LIMIT 10)
        |SELECT top.vec_id, floor(adc * 1000000 + 0.5) / 1000000 AS adc,
        |  (ext.vec_id IS NOT NULL) AS in_exact_topk
        |FROM top LEFT JOIN ext USING (vec_id)
        |ORDER BY adc, vec_id""".stripMargin,

    "q28_cosine_threshold" ->
      """WITH p AS (SELECT embedding AS pv FROM embeddings ORDER BY vec_id LIMIT 1),
        |c AS (SELECT vec_id,
        |  list_sum([CAST(embedding[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |            FOR i IN range(1, len(embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |                  FOR i IN range(1, len(embedding) + 1)])) *
        |   sqrt(list_sum([CAST(pv[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |                  FOR i IN range(1, len(pv) + 1)]))) AS cos
        |  FROM embeddings, p)
        |SELECT vec_id, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |FROM c WHERE cos > 0.15 ORDER BY vec_id""".stripMargin,


    "q29_embed_neardup" -> (cosinePairCtes +
      """
        |SELECT id_a, id_b, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |FROM pr WHERE cos > 0.999 ORDER BY id_a, id_b""".stripMargin),

    "q205_embedding_leakage" -> {
      val c80 = graft.operators.Sampling.hexCutoff(0.8)
      val c90 = graft.operators.Sampling.hexCutoff(math.min(0.8 + 0.1, 1.0))
      cosinePairCtes + s""",
        |sp AS (SELECT vec_id,
        |  CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) < '$c80' THEN 'train'
        |       WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) < '$c90' THEN 'val'
        |       ELSE 'test' END AS split FROM aug),
        |pr2 AS (SELECT id_a, id_b FROM pr WHERE cos > 0.999),
        |lab AS (SELECT least(a.split, b.split) AS split_a,
        |  greatest(a.split, b.split) AS split_b
        |  FROM pr2 JOIN sp a ON a.vec_id = pr2.id_a
        |  JOIN sp b ON b.vec_id = pr2.id_b)
        |SELECT split_a, split_b, count(*) AS n_pairs,
        |  split_a != split_b AS leaks
        |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q114_semantic_canonical" -> (
      cosinePairCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |p AS (SELECT id_a, id_b FROM pr WHERE cos > 0.999),
        |e AS (SELECT id_a AS x, id_b AS y FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, label) AS (
        |  SELECT x, x FROM e
        |  UNION
        |  SELECT e2.x, r.label FROM e e2 JOIN reach r ON e2.y = r.node),
        |lab AS (SELECT node, min(label) AS label FROM reach GROUP BY node)
        |SELECT a.vec_id, coalesce(l.label, a.vec_id) AS canonical_id,
        |  (coalesce(l.label, a.vec_id) = a.vec_id) AS kept
        |FROM aug a LEFT JOIN lab l ON a.vec_id = l.node
        |ORDER BY a.vec_id""".stripMargin),


    // assignment = q68's argmax convention; components = q114's
    // recursive-CTE pattern; keep = min (cos-to-centroid, id) per group
    "q279_semdedup" ->
      """WITH RECURSIVE aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000, [CAST(x * CAST(2.0 AS FLOAT) AS FLOAT) FOR x IN embedding]
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |cent AS (SELECT vec_id AS cell, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (SELECT a.vec_id, a.embedding, c.cell,
        |  list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(a.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(a.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(a.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
        |  FROM aug a CROSS JOIN cent c),
        |asg AS (SELECT vec_id, embedding, cell FROM (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
        |  FROM scored) WHERE rn = 1),
        |prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(b.embedding[d] AS DOUBLE)
        |            FOR d IN range(1, len(a.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(a.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(a.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(b.embedding[d] AS DOUBLE) * CAST(b.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(b.embedding) + 1)]))) >= 0.999),
        |ed AS (SELECT id_a AS x, id_b AS y FROM prs
        |       UNION ALL SELECT id_b, id_a FROM prs),
        |reach(node, label) AS (
        |  SELECT x, x FROM ed
        |  UNION
        |  SELECT e2.x, r.label FROM ed e2 JOIN reach r ON e2.y = r.node),
        |lab AS (SELECT node, min(label) AS label FROM reach GROUP BY node),
        |cosc AS (SELECT g.vec_id, g.cell,
        |  list_sum([CAST(g.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(g.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(g.embedding[d] AS DOUBLE) * CAST(g.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(g.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos_c
        |  FROM asg g JOIN cent c ON g.cell = c.cell),
        |grp AS (SELECT c.vec_id, c.cell,
        |  coalesce(l.label, c.vec_id) AS grp, c.cos_c
        |  FROM cosc c LEFT JOIN lab l ON c.vec_id = l.node)
        |SELECT vec_id, CAST(cell AS BIGINT) AS cell, CAST(grp AS BIGINT) AS grp,
        |  floor(cos_c * 1000000 + 0.5) / 1000000 AS cos_c,
        |  (row_number() OVER (PARTITION BY grp ORDER BY cos_c ASC, vec_id ASC) = 1) AS kept
        |FROM grp ORDER BY vec_id""".stripMargin,


    "q30_ann_topk" ->
      """WITH code AS (SELECT vec_id, embedding,
        |  list_sum([CASE WHEN list_sum([CAST(embedding[d] AS DOUBLE) *
        |      (CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(d - 1 AS VARCHAR)), 1, 15)) AS BIGINT)
        |       / 1152921504606846975.0 * 2 - 1)
        |      FOR d IN range(1, len(embedding) + 1)]) >= 0
        |    THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END FOR i IN range(0, 8)]) AS lsh_code
        |  FROM embeddings),
        |p AS (SELECT lsh_code AS pc, embedding AS pv FROM code ORDER BY vec_id LIMIT 1),
        |c AS (SELECT vec_id,
        |  list_sum([CAST(embedding[d] AS DOUBLE) * CAST(pv[d] AS DOUBLE)
        |            FOR d IN range(1, len(embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(embedding[d] AS DOUBLE) * CAST(embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(embedding) + 1)])) *
        |   sqrt(list_sum([CAST(pv[d] AS DOUBLE) * CAST(pv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(pv) + 1)]))) AS cos
        |  FROM code, p WHERE bit_count(xor(lsh_code, pc)) <= 2)
        |SELECT vec_id, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |FROM c ORDER BY c.cos DESC, vec_id LIMIT 10""".stripMargin,


    "q120_hybrid_rrf" -> ("WITH " + bm25Ctes + """,
        |bmtop AS (SELECT doc_id, CAST(ms AS DOUBLE) / 1000000.0 AS bm25
        |  FROM agg ORDER BY bm25 DESC, doc_id LIMIT 15),
        |bmr AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_bm25 FROM bmtop),
        |p AS (SELECT embedding AS pv FROM embeddings ORDER BY vec_id LIMIT 1),
        |c AS (SELECT vec_id AS doc_id,
        |  list_sum([CAST(embedding[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |            FOR i IN range(1, len(embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |                  FOR i IN range(1, len(embedding) + 1)])) *
        |   sqrt(list_sum([CAST(pv[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |                  FOR i IN range(1, len(pv) + 1)]))) AS cos
        |  FROM embeddings, p),
        |anntop AS (SELECT doc_id, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |  FROM c ORDER BY c.cos DESC, doc_id LIMIT 15),
        |annr AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY cos DESC, doc_id) AS rank_ann FROM anntop),
        |f AS (SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
        |  b.rank_bm25, a.rank_ann,
        |  COALESCE(1.0 / (60.0 + CAST(b.rank_bm25 AS DOUBLE)), 0.0) +
        |  COALESCE(1.0 / (60.0 + CAST(a.rank_ann AS DOUBLE)), 0.0) AS rrf_score
        |  FROM bmr b FULL OUTER JOIN annr a ON b.doc_id = a.doc_id)
        |SELECT doc_id, rank_bm25, rank_ann,
        |  floor(rrf_score * 1000000 + 0.5) / 1000000 AS rrf_score
        |FROM f ORDER BY f.rrf_score DESC, doc_id LIMIT 10""").stripMargin,

    "q116_ann_batch" ->
      """WITH probes AS (SELECT vec_id AS probe_id, embedding AS pv
        |  FROM embeddings WHERE vec_id < 4),
        |scored AS (SELECT p.probe_id, e.vec_id,
        |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(p.pv[d] AS DOUBLE)
        |            FOR d IN range(1, len(e.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(e.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(p.pv[d] AS DOUBLE) * CAST(p.pv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(p.pv) + 1)]))) AS cos
        |  FROM embeddings e CROSS JOIN probes p),
        |ranked AS (SELECT probe_id, vec_id, cos,
        |  row_number() OVER (PARTITION BY probe_id
        |                     ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM scored)
        |SELECT probe_id, vec_id, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |FROM ranked WHERE rn <= 5 ORDER BY probe_id, vec_id""".stripMargin,

    "q49_ivf_topk" -> ivfTopKOracle,

    // append ≡ rebuild: the incrementally-built index must reproduce
    // q49's from-scratch ranking exactly, so both gates share ONE oracle
    "q115_ivf_incremental" -> ivfTopKOracle,

    // the SAME assignment + probe replay as q49/q115, restricted to the
    // LIVE set (the delete predicate) — centroid geometry and the probe
    // stay corpus-derived, exactly as the engine's fixed-geometry fold;
    // derived from ivfTopKOracle so the three cannot drift apart
    "q306_ivf_cdc_maintenance" ->
      ("WITH live AS (SELECT * FROM embeddings WHERE NOT (vec_id % 9 = 4)),\n" +
        ivfTopKOracle.stripPrefix("WITH ")
          .replace("FROM embeddings e CROSS JOIN cent c",
            "FROM live e CROSS JOIN cent c")),


    "q68_kmeans_step" ->
      """WITH cent AS (SELECT vec_id AS cell, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (SELECT e.vec_id, e.embedding, c.cell,
        |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(e.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(e.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
        |  FROM embeddings e CROSS JOIN cent c),
        |asg AS (SELECT vec_id, embedding, cell FROM (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
        |  FROM scored) WHERE rn = 1),
        |pts AS (SELECT cell,
        |  unnest([{'d': d, 'v': CAST(embedding[d] AS DOUBLE)}
        |          FOR d IN range(1, len(embedding) + 1)]) AS s
        |  FROM asg)
        |SELECT CAST(cell AS BIGINT) AS cell, CAST(s.d - 1 AS BIGINT) AS dim,
        |  count(*) AS n_members,
        |  floor(CAST(sum(CAST(s.v AS DECIMAL(28,12))) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean
        |FROM pts GROUP BY 1, 2 ORDER BY cell, dim""".stripMargin,


    // both Lloyd iterations unrolled: assignment (argmax cosine, ties to
    // the larger cell), DECIMAL-routed means, Float-rounded refined
    // centroids (empty cells keep their seed), then the second
    // assignment's aggregation — every stage replayed engine-side
    "q75_kmeans_refine" ->
      """WITH cent0 AS (SELECT vec_id AS cell, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |scored0 AS (SELECT e.vec_id, e.embedding, c.cell,
        |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(e.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(e.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
        |  FROM embeddings e CROSS JOIN cent0 c),
        |asg0 AS (SELECT vec_id, embedding, cell FROM (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
        |  FROM scored0) WHERE rn = 1),
        |pts0 AS (SELECT cell,
        |  unnest([{'d': d, 'v': CAST(embedding[d] AS DOUBLE)}
        |          FOR d IN range(1, len(embedding) + 1)]) AS s
        |  FROM asg0),
        |m0 AS (SELECT cell, s.d AS d,
        |  CAST(sum(CAST(s.v AS DECIMAL(28,12))) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE) AS mean
        |  FROM pts0 GROUP BY 1, 2),
        |cent1 AS (SELECT c0.cell,
        |  coalesce(m.arr, c0.cv) AS cv
        |  FROM cent0 c0 LEFT JOIN (
        |    SELECT cell, list(CAST(mean AS FLOAT) ORDER BY d) AS arr
        |    FROM m0 GROUP BY cell) m ON c0.cell = m.cell),
        |scored1 AS (SELECT e.vec_id, e.embedding, c.cell,
        |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(e.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(e.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
        |  FROM embeddings e CROSS JOIN cent1 c),
        |asg1 AS (SELECT vec_id, embedding, cell FROM (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
        |  FROM scored1) WHERE rn = 1),
        |pts1 AS (SELECT cell,
        |  unnest([{'d': d, 'v': CAST(embedding[d] AS DOUBLE)}
        |          FOR d IN range(1, len(embedding) + 1)]) AS s
        |  FROM asg1)
        |SELECT CAST(cell AS BIGINT) AS cell, CAST(s.d - 1 AS BIGINT) AS dim,
        |  count(*) AS n_members,
        |  floor(CAST(sum(CAST(s.v AS DECIMAL(28,12))) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean
        |FROM pts1 GROUP BY 1, 2 ORDER BY cell, dim""".stripMargin,


    "q82_quantize_int8" ->
      """WITH s AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding,
        |    x -> abs(CAST(x AS DOUBLE)))) AS scale FROM embeddings),
        |z AS (SELECT vec_id, embedding, scale,
        |  CASE WHEN scale > 0 THEN list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) / scale * 127 + 0.5) AS INT))
        |  ELSE list_transform(embedding, x -> 0) END AS qv FROM s)
        |SELECT vec_id, scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  list_min(qv) AS q_min,
        |  list_max(qv) AS q_max,
        |  CAST(len(list_filter(qv, v -> abs(v) = 127)) AS BIGINT) AS n_sat,
        |  list_max([abs(CAST(embedding[i] AS DOUBLE) - qv[i] * scale / 127)
        |    FOR i IN range(1, len(embedding) + 1)]) AS max_abs_err
        |FROM z ORDER BY vec_id""".stripMargin,


    // the hashing trick mirrored in SQL: 60-bit md5 prefix mod 16 for
    // the bucket, salted second hash mod 2 for the sign; exact integer
    // components, sqrt+divide only at the final cosine
    "q180_hash_embedding" ->
      """WITH toks AS (SELECT doc_id AS id,
        |  unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
        |  FROM documents),
        |tt AS (SELECT id,
        |  CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 16 AS bucket,
        |  (CAST(('0x' || substr(md5('s#' || t), 1, 15)) AS BIGINT) % 2) * 2 - 1 AS s
        |  FROM toks WHERE t != ''),
        |emb AS (SELECT id, bucket, CAST(sum(s) AS BIGINT) AS v
        |  FROM tt GROUP BY 1, 2 HAVING sum(s) != 0),
        |probe AS (SELECT bucket, v AS pv FROM emb WHERE id = 42),
        |pn AS (SELECT CAST(sum(pv * pv) AS BIGINT) AS pn2 FROM probe),
        |n2 AS (SELECT id, CAST(sum(v * v) AS BIGINT) AS n2 FROM emb GROUP BY 1),
        |dots AS (SELECT emb.id, CAST(sum(emb.v * probe.pv) AS BIGINT) AS dot
        |  FROM emb JOIN probe USING (bucket) GROUP BY 1)
        |SELECT d.id AS doc_id,
        |  floor(CAST(dot AS DOUBLE) / sqrt(CAST(n2.n2 * pn.pn2 AS DOUBLE))
        |    * 1000000 + 0.5) / 1000000 AS cos
        |FROM dots d JOIN n2 ON d.id = n2.id CROSS JOIN pn
        |WHERE d.id != 42
        |ORDER BY cos DESC, doc_id LIMIT 15""".stripMargin,

    "q88_centroid_outliers" ->
      """WITH cent AS (SELECT vec_id AS cell, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (SELECT e.vec_id, c.cell,
        |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(e.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(e.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
        |  FROM embeddings e CROSS JOIN cent c),
        |asg AS (SELECT vec_id, cell, 1.0 - cos AS dist FROM (
        |  SELECT vec_id, cell, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
        |  FROM scored) WHERE rn = 1),
        |b AS (SELECT cell, quantile_cont(dist, 0.9) AS bound FROM asg GROUP BY 1)
        |SELECT asg.vec_id, CAST(asg.cell AS BIGINT) AS cell,
        |  floor(dist * 1000000 + 0.5) / 1000000 AS dist,
        |  floor(bound * 1000000 + 0.5) / 1000000 AS cutoff
        |FROM asg JOIN b ON asg.cell = b.cell
        |WHERE dist > bound ORDER BY asg.vec_id""".stripMargin,

  )
}
