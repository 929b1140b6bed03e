package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data curation: exact hashing,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale shape: (a) explode tokens/shingles once and sketch them in a
  * partially-aggregated groupBy keyed by doc id; (b) one groupBy on the
  * bucket key, with pair expansion INSIDE each bucket (no self-join — the
  * sketch pipeline executes once); (c) exact verification only on
  * candidate pairs, against pre-hashed sets. No all-pairs join ever
  * materializes; bucket keys are uniformly hash-distributed unless the
  * corpus is pathologically self-similar (mitigate: `maxBucket` cap on
  * degenerate buckets).
  */
object DedupApprox {

  /** Default cap for [[prefixFilterPairsTokens]]'s candidate-pair
    * forecast fence (~8.6e9): far above any legitimate single-corpus
    * exact-join run here, far below the quadratic blowup a
    * boilerplate-heavy crawl produces. Overridable per session via
    * `spark.graft.prefixJoin.maxCandidatePairs`. */
  val MaxCandidatePairs: Long = 1L << 33

  /** Exact dedup by content hash: keep the smallest id per normalized-text
    * group. groupBy(hash) with map-side partial aggregation — one shuffle
    * on a uniformly distributed key. */
  def exactByContent(docs: DataFrame, idCol: String, textCol: String,
      md5Family: Boolean = false): DataFrame = {
    val fp = if (md5Family) TextAnalysis.md5Fingerprint(col(textCol))
      else TextAnalysis.fingerprint(col(textCol)).cast("string")
    docs.select(col(idCol), fp.as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))
  }

  /** Lane hash: a 60-bit numeric prefix of md5 (portable — DuckDB:
    * `CAST(('0x'||substr(md5(j||'#'||s),1,15)) AS BIGINT)`) or salted
    * xxhash64. Numeric lanes matter: min(long) aggregates in a
    * HashAggregate, while min(string) falls back to sort-based
    * aggregation (var-length buffers don't fit the unsafe hash map). */
  private def laneHash(shingle: Column, j: Int, md5Family: Boolean): Column =
    if (md5Family)
      graft.functions.Checksums.md5PrefixLong(concat_ws("#", lit(j.toString), shingle))
    else xxhash64(lit(j.toLong), xxhash64(shingle))

  /** MinHash signature as `numHashes` independent min-hashes over the
    * document's k-shingle set — single-row expression form, used for ad
    * hoc column work. Hash family: salted xxhash64 (engine-fast) or, with
    * `md5Family=true`, the portable md5-prefix lanes any SQL engine can
    * recompute.
    *
    * NOTE: this form re-evaluates the shingling expression once per hash
    * lane; for whole-corpus work use [[minhashSignatures]], which
    * materializes each shingle exactly once. */
  def minhashSignature(text: Column, k: Int, numHashes: Int,
      md5Family: Boolean = false): Column = {
    val sigs = (0 until numHashes).map { j =>
      array_min(transform(TextAnalysis.shingleStrings(text, k),
        s => laneHash(s, j, md5Family))).cast("string")
    }
    array(sigs: _*)
  }

  /** Whole-corpus MinHash signatures: explode shingles once, then ONE
    * partially-aggregated groupBy computing every per-lane minimum. Each
    * shingle string is materialized exactly once instead of `numHashes`
    * re-evaluations of the shingling tree (16-64x less regex/string work),
    * and the min-aggregation combines map-side, so the only shuffle
    * carries `numHashes` partial minima per doc — the scale shape for a
    * 100 TB corpus. Hash values are identical to [[minhashSignature]]. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int, md5Family: Boolean = false): DataFrame = {
    // hash-partition by id up front: spreads the hash-heavy explode stage
    // across all cores even when the source is a single parquet row group,
    // and the groupBy below reuses the partitioning (no second shuffle).
    // Explicit partition count — AQE would coalesce a bare repartition(col)
    // of a small corpus back to one partition and serialize the hashing.
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val exploded = docs.repartition(np, col(idCol)).select(col(idCol).as("id"),
      explode(TextAnalysis.shingleStrings(col(textCol), k)).as("_shingle"))
    val mins = (0 until numHashes).map { j =>
      min(laneHash(col("_shingle"), j, md5Family)).as(s"_m$j")
    }
    exploded.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(j => col(s"_m$j").cast("string")): _*).as("_sig"))
  }

  /** LSH banding: split the signature into `bands` bands of `rows` hashes;
    * docs sharing any band key are candidate pairs. Returns
    * (id, band, band_key) — one output row per band per doc. */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, rows: Int, md5Family: Boolean = false): DataFrame =
    minhashSignatures(docs, idCol, textCol, k, bands * rows, md5Family)
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(array_join(slice(col("_sig"), b * rows + 1, lit(rows)), "|")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")

  /** Candidate near-dup pairs from LSH buckets (a < b, deduped across
    * bands). Instead of a self-join — which would compute the whole
    * upstream minhash pipeline once per side — buckets are collected with
    * ONE groupBy and pairs expand inside each bucket with array
    * expressions. `maxBucket` (0 = unlimited) drops degenerate buckets
    * (e.g. a boilerplate band shared by millions of docs) whose quadratic
    * expansion would dominate at corpus scale; real near-dup buckets are
    * small by construction. */
  def lshCandidatePairs(bandsDf: DataFrame, maxBucket: Int = 0): DataFrame = {
    val buckets = bandsDf.groupBy(col("band"), col("band_key"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
    val capped = if (maxBucket > 0) buckets.filter(size(col("ids")) <= maxBucket) else buckets
    capped
      .select(explode(flatten(transform(col("ids"),
        a => transform(col("ids"), b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .filter(col("p.id_a") < col("p.id_b"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for a pair frame carrying both texts:
    * |A ∩ B| / |A ∪ B| over distinct k-shingle sets. Shingles are
    * represented by their 60-bit md5 prefixes: still portable (DuckDB:
    * `CAST(('0x'||substr(md5(s),1,15)) AS BIGINT)`), and set ops over
    * fixed-width longs run an order of magnitude faster than over
    * variable-length strings. */
  def jaccard(textA: Column, textB: Column, k: Int): Column = {
    def hs(t: Column) = array_distinct(transform(
      TextAnalysis.shingleStrings(t, k),
      s => graft.functions.Checksums.md5PrefixLong(s)))
    val sa = hs(textA)
    val sb = hs(textB)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Distinct k-shingle sets per doc, as 60-bit md5-prefix longs (see
    * [[jaccard]]), computed on the codegen-friendly explode path — one
    * shingling pass per doc instead of one per candidate pair. */
  def shingleHashSets(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val np = docs.sparkSession.sparkContext.defaultParallelism
    docs.repartition(np, col(idCol))
      .select(col(idCol).as("id"),
        explode(TextAnalysis.shingleStrings(col(textCol), k)).as("_s"))
      .select(col("id"), graft.functions.Checksums.md5PrefixLong(col("_s")).as("_h"))
      .groupBy(col("id")).agg(collect_set(col("_h")).as("_hs"))
  }

  /** Per-doc sketch frame: minhash signature AND distinct shingle hash
    * set from ONE explode + ONE aggregation. ~100 bytes per doc — cheap
    * to persist so its three consumers (banding, and both sides of the
    * verification join) don't re-run the shingling/hashing pipeline.
    * Public so long-lived callers (e.g. a streaming gate's corpus side)
    * can compute, persist, and RELEASE it on their own lifecycle. */
  def docSketches(docs: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int, md5Family: Boolean): DataFrame = {
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val exploded = docs.repartition(np, col(idCol)).select(col(idCol).as("id"),
      explode(TextAnalysis.shingleStrings(col(textCol), k)).as("_shingle"))
    val mins = (0 until numHashes).map { j =>
      min(laneHash(col("_shingle"), j, md5Family)).as(s"_m$j")
    }
    val aggs = mins :+ collect_set(
      graft.functions.Checksums.md5PrefixLong(col("_shingle"))).as("_hs")
    exploded.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(j => col(s"_m$j").cast("string")): _*).as("_sig"),
        col("_hs"))
  }

  /** Full MinHash-LSH near-dup pipeline: band -> bucket-group -> verify
    * with exact Jaccard >= `threshold`. `docs` needs (idCol, textCol).
    * The per-doc sketch frame is computed once and persisted (spilling to
    * disk if needed); verification joins its pre-hashed shingle sets so
    * the per-pair work is two long-array set ops — the interpreted
    * per-pair re-shingling this replaces was ~50x slower.
    * `maxBucket` (0 = unlimited) is forwarded to [[lshCandidatePairs]]'s
    * degenerate-bucket cap — the knob that stops a boilerplate band key
    * shared by millions of docs from expanding quadratically. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, bands: Int = 4, rows: Int = 4,
      threshold: Double = 0.7, md5Family: Boolean = false,
      maxBucket: Int = 0): DataFrame = {
    val sk = docSketches(docs, idCol, textCol, k, bands * rows, md5Family)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandsDf = sk
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(array_join(slice(col("_sig"), b * rows + 1, lit(rows)), "|")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val cands = lshCandidatePairs(bandsDf, maxBucket)
    val inter = size(array_intersect(col("_ha"), col("_hb"))).cast("double")
    val union = size(array_union(col("_ha"), col("_hb"))).cast("double")
    // no broadcast hint: the sketch frame is corpus-sized (one row per
    // doc) — at training-corpus scale it must shuffle-join; AQE broadcasts
    // it anyway when it is actually small
    cands
      .join(sk.select(col("id").as("id_a"), col("_hs").as("_ha")), Seq("id_a"))
      .join(sk.select(col("id").as("id_b"), col("_hs").as("_hb")), Seq("id_b"))
      .withColumn("jaccard", when(union > 0, inter / union).otherwise(lit(0.0)))
      .filter(col("jaccard") >= threshold)
      // floor(x*1e4+0.5)/1e4 instead of round(): identical IEEE ops in any
      // engine, so the DuckDB oracle reproduces the value bit-for-bit.
      .select(col("id_a"), col("id_b"),
        (floor(col("jaccard") * 10000 + 0.5) / 10000).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Incremental near-dup gate — the daily-ingest question: which
    * incoming docs near-duplicate a doc ALREADY IN the corpus? Incoming
    * bands equi-join the corpus band frame on (band, band_key);
    * incoming×incoming pairs are never formed and the corpus side never
    * self-joins, so per-batch cost is |batch| × bucket hit rate, not
    * |corpus|². Verification is exact Jaccard over pre-hashed shingle
    * sets. At production scale, persist the corpus's band + sketch frames
    * once (they are append-only as the corpus grows) instead of
    * recomputing them per batch as this self-contained form does. */
  def incrementalNearDups(corpus: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, k: Int = 3, bands: Int = 8,
      rows: Int = 2, threshold: Double = 0.7,
      md5Family: Boolean = false, maxBucket: Int = 0): DataFrame = {
    // one sketch pass per side (signature AND shingle set together),
    // persisted so the band derivation and the verification join both
    // read it instead of re-running the explode/hash pipeline. The
    // frames stay cached for the session (a lazy result gives no release
    // point) — callers on a lifecycle (streaming gates, repeated probes)
    // should build sketches with [[docSketches]], persist on their own
    // terms, and use [[nearDupsFromSketches]]; see
    // [[graft.streaming.StreamingSync.nearDupGate]].
    val cs = docSketches(corpus, idCol, textCol, k, bands * rows, md5Family)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ns = docSketches(incoming, idCol, textCol, k, bands * rows, md5Family)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nearDupsFromSketches(cs, ns, bands, rows, threshold, maxBucket)
  }

  /** The band-join + verify core over prebuilt sketch frames (each needs
    * `id`, `_sig`, `_hs` as produced by [[docSketches]] with
    * numHashes = bands*rows). Persistence is the caller's.
    * `maxBucket` (0 = unlimited) drops CORPUS band keys held by more than
    * that many corpus docs before the candidate join: a boilerplate band
    * key multiplies every incoming hit by its corpus-side count, so a hot
    * key turns the per-batch cost from |batch|·bucket-hit-rate into
    * |batch|·|corpus| — the same degenerate-bucket hazard
    * [[lshCandidatePairs]] caps, in join form. */
  def nearDupsFromSketches(corpusSk: DataFrame, incomingSk: DataFrame,
      bands: Int, rows: Int, threshold: Double,
      maxBucket: Int = 0): DataFrame = {
    def bandsOf(sk: DataFrame, as: String) = sk
      .select(col("id").as(as), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(array_join(slice(col("_sig"), b * rows + 1, lit(rows)), "|")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val corpusBands = bandsOf(corpusSk, "corpus_id")
    val cappedCorpusBands =
      if (maxBucket > 0) {
        // one partial-aggregated count over the corpus band frame; only
        // keys at-or-under the cap survive to the candidate join
        val keyCounts = corpusBands.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("_bc"))
          .filter(col("_bc") <= maxBucket)
          .select(col("band"), col("band_key"))
        corpusBands.join(keyCounts, Seq("band", "band_key"))
      } else corpusBands
    val cands = bandsOf(incomingSk, "new_id")
      .join(cappedCorpusBands, Seq("band", "band_key"))
      .select(col("new_id"), col("corpus_id")).distinct()
    val inter = size(array_intersect(col("_hn"), col("_hc"))).cast("double")
    val union = size(array_union(col("_hn"), col("_hc"))).cast("double")
    cands
      .join(incomingSk.select(col("id").as("new_id"), col("_hs").as("_hn")), Seq("new_id"))
      .join(corpusSk.select(col("id").as("corpus_id"), col("_hs").as("_hc")), Seq("corpus_id"))
      .withColumn("jaccard", when(union > 0, inter / union).otherwise(lit(0.0)))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"),
        (floor(col("jaccard") * 10000 + 0.5) / 10000).as("jaccard"))
  }

  /** SimHash: 60-bit sketch where bit i is the sign of the sum over token
    * hashes of (bit i ? +1 : -1); the token hash is the portable 60-bit
    * md5 prefix, so any SQL engine can recompute the sketch verbatim.
    * Near-dups have small Hamming distance.
    * Pure expression tree — wide but codegen'd, zero shuffle.
    *
    * NOTE: re-evaluates the token-hash array once per bit; for
    * whole-corpus work use [[simhashes]] (explode once + one aggregation). */
  def simhash(text: Column): Column = {
    val toks = split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")
    val hashes = transform(toks, t => graft.functions.Checksums.md5PrefixLong(t))
    val bitSum = (i: Int) => aggregate(hashes, lit(0L),
      (acc, h) => acc + (shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1))
    (0 until 60).map(i => when(bitSum(i) >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
  }

  /** Whole-corpus SimHash: explode tokens once, hash each token once, and
    * compute all 60 signed bit-sums in ONE partially-aggregated groupBy —
    * 60x less token/regex work than the scalar form, map-side combined,
    * one shuffle carrying 60 longs per doc. Sketch values match
    * [[simhash]] bit for bit. */
  def simhashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // see minhashSignatures: co-partition by id once, reuse for the agg
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val e = docs.repartition(np, col(idCol)).select(col(idCol).as("id"),
      explode(split(TextAnalysis.normText(col(textCol)), " ")).as("_tok"))
      .select(col("id"), graft.functions.Checksums.md5PrefixLong(col("_tok")).as("_h"))
    val sums = (0 until 60).map(i =>
      sum(shiftright(col("_h"), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"_b$i"))
    e.groupBy(col("id")).agg(sums.head, sums.tail: _*)
      .select(col("id"),
        (0 until 60).map(i =>
          when(col(s"_b$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("sh"))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dups: bucket on the 4 16-bit quarters (any pair within
    * Hamming distance 3 shares at least one exact quarter — pigeonhole;
    * the top quarter carries the sketch's high 12 bits), verify Hamming
    * within buckets.
    *
    * `maxBucket` (0 = unlimited) drops degenerate buckets, exactly as in
    * [[lshCandidatePairs]]: a corpus with millions of near-empty or
    * boilerplate docs collapses them onto ONE sketch (identical quarters),
    * and without the cap that bucket's collect_list + quadratic pair
    * expansion is a guaranteed executor OOM at 100 TB. Real near-dup
    * buckets are small by construction; dropping a bucket of size >
    * maxBucket loses only pairs that exact-dedup ([[exactByContent]])
    * already catches more cheaply.
    *
    * Cross-bucket dedup: uncapped, a pair sharing several quarters is
    * emitted only from its FIRST matching quarter — row-local arithmetic
    * (both sketches ride the pair row) replacing a distinct shuffle. With
    * a cap that predicate would be WRONG: a pair whose first matching
    * quarter sits in a capped-out bucket would be suppressed in its
    * surviving later-quarter bucket too (quarter equality is row-local,
    * bucket survival is not), silently losing the pair everywhere — so
    * the capped path dedups with dropDuplicates instead. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 0): DataFrame = {
    val sh = simhashes(docs, idCol, textCol)
    val quarters = sh.select(col("id"), col("sh"), posexplode(array(
      (0 until 4).map(q => shiftright(col("sh"), q * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "q").withColumnRenamed("col", "qkey")
    // one groupBy per (quarter, key) bucket; pair expansion inside the
    // bucket (no self-join -> the sketch pipeline runs once, not twice).
    // Cross-bucket dedup is a PREDICATE, not a shuffle: a pair sharing
    // several quarters is emitted only from its FIRST matching quarter
    // (both sketches ride the pair, so "does an earlier quarter match"
    // is row-local arithmetic) — the classic LSH trick that replaces the
    // distinct's full shuffle of all surviving pairs
    def quarter(sh: Column, qq: Int): Column =
      shiftright(sh, qq * 16).bitwiseAND(lit(0xFFFFL))
    val earlierQuarterMatches = (0 until 3).map { qq =>
      (col("q") > qq) && (quarter(col("p.a.sh"), qq) === quarter(col("p.b.sh"), qq))
    }.reduce(_ || _)
    val buckets = quarters.groupBy(col("q"), col("qkey"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("ds"))
      .filter(size(col("ds")) > 1)
    val capped =
      if (maxBucket > 0) buckets.filter(size(col("ds")) <= maxBucket) else buckets
    val pairs = capped
      .select(col("q"), explode(flatten(transform(col("ds"),
        a => transform(col("ds"), b => struct(a.as("a"), b.as("b")))))).as("p"))
      .filter(col("p.a.id") < col("p.b.id"))
    val deduped =
      if (maxBucket > 0) // predicate dedup unsound under the cap (see doc)
        pairs.dropDuplicates("p")
      else pairs.filter(!earlierQuarterMatches)
    deduped
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        hamming(col("p.a.sh"), col("p.b.sh")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Corpus duplication/diversity estimate WITHOUT pair expansion: the
    * mean pairwise Jaccard similarity across ALL doc pairs, estimated as
    * the minhash lane collision probability. For a random pair,
    * P(lane values collide) = J, so
    * `mean J ≈ Σ_lanes Σ_values c(c−1) / (L · N(N−1))` — pure counting:
    * an explode of the signature to (lane, value), one partial-aggregated
    * groupBy, one global sum, ONE division. The N²-pair computation this
    * estimates is infeasible at corpus scale; this is one shuffle.
    * Collision products route through DECIMAL(38,0): one value shared by
    * c docs contributes c(c−1), which overflows a long once c exceeds
    * ~3e9. Lanes use the portable md5 family so a SQL oracle reproduces
    * the exact integer counts and the single IEEE division. */
  def pairwiseJaccardEstimate(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 16): DataFrame = {
    require(numHashes > 0, s"numHashes $numHashes must be positive")
    val n = docs.count()
    require(n > 1, "pairwise estimate needs at least 2 docs")
    val denom = numHashes.toDouble * n.toDouble * (n - 1).toDouble
    docSketches(docs, idCol, textCol, k, numHashes, md5Family = true)
      .select(posexplode(col("_sig")))
      .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("c"))
      // stays DECIMAL(38,0) end-to-end — casting the sum back to long
      // would reintroduce the exact overflow the routing exists to stop
      .agg(sum(col("c").cast("decimal(38,0)") *
        (col("c") - 1).cast("decimal(38,0)")).as("collisions"))
      // final projection: BIGINT, not DECIMAL(38,0) — the decimal routing
      // above is what prevents per-value overflow; the SUM itself is
      // bounded by L·N(N−1) which fits a long until N ≈ 7.6e8 at L=16,
      // and a decimal cell hashes differently across result encoders
      .select(lit(n).as("n_docs"), lit(numHashes).as("n_lanes"),
        col("collisions").cast("long").as("collisions"),
        (col("collisions").cast("double") / lit(denom)).as("mean_jaccard_est"))
  }

  /** EXACT-threshold token-set similarity join via prefix filtering —
    * the AllPairs/PPJoin family: every doc pair with word-set Jaccard
    * >= `threshold`, with NO false negatives (the guarantee the
    * probabilistic minhash path cannot give; use this when a miss is a
    * correctness bug — e.g. benchmark decontamination sign-off).
    *
    * Principle: order each doc's distinct tokens by corpus rarity
    * (document frequency asc, token asc — one global total order). A
    * pair at Jaccard t shares at least ceil(t·|x|) tokens, so by
    * pigeonhole the two (|x| − ceil(t·|x|) + 1)-token PREFIXES must
    * intersect — candidates come from ONE equi-join on prefix tokens
    * only. Rare tokens sort INTO prefixes and common tokens out of
    * them, so join fan-out concentrates where df is small — the inverse
    * of the boilerplate hazard; the size filter
    * (t·|x| <= |y| <= |x|/t, applied inside the join condition) prunes
    * mismatched lengths before the shuffle materializes them. Verify is
    * exact: |A∩B| computed on the full sorted-token arrays, union by
    * |A| + |B| − |A∩B| (sets are distinct by construction).
    *
    * Scale shape: one distinct-token explode, one df aggregation, one
    * prefix equi-join, one pair-sized verify join — all hash
    * exchanges. Tokens travel as their portable 60-bit md5 hashes
    * end-to-end (the q25/q48 hash family): the candidate join keys on
    * LONGs and the verify arrays are 8 bytes per element instead of
    * full strings — soundness is unaffected because prefix filtering
    * only needs SOME global total order, and (df, hash) is one.
    *
    * Exact-set collapse: docs with IDENTICAL token sets (boilerplate
    * clones, template pages — routinely a large corpus fraction)
    * group to ONE representative before the quadratic stages, so the
    * prefix join and verify run on distinct SETS; within-group pairs
    * are Jaccard 1.0 by definition and cross-group verdicts expand to
    * member pairs by two explodes at the end. The candidate join cost
    * scales with distinct-set count squared, not doc count squared —
    * the difference between "the crawl has a million template clones"
    * being a disaster and being free.
    *
    * Jaccard lands on the 1e-4 lattice; column order (id_a < id_b) and
    * the final sort are deterministic. */
  def prefixFilterPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    prefixFilterPairsTokens(docs, idCol,
      split(TextAnalysis.normText(col(textCol)), " "), threshold)

  /** [[prefixFilterPairs]] under a caller-chosen tokenization: `tokensCol`
    * is any array-of-string expression (word split, k-shingles, CDC
    * chunks), so the exact-threshold join serves every set-similarity
    * definition the sketch family approximates — including as the
    * ground-truth side of a sketch-recall audit (q166). */
  def prefixFilterPairsTokens(docs: DataFrame, idCol: String,
      tokensCol: org.apache.spark.sql.Column, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold $threshold must be in (0, 1]")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs.repartition(np, col(idCol))
      .select(col(idCol).as("id"), explode(tokensCol).as("_tok"))
      .select(col("id"),
        graft.functions.Checksums.md5PrefixLong(col("_tok")).as("h"))
      .distinct()
    // df attached as a window count over the hash — the shingleNovelty
    // single-lineage trick: a join against a separate df aggregate would
    // re-run the whole tokenize/explode/hash pass once per consumer
    val ordered = toks
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("_o"))
      .select(col("id"),
        transform(col("_o"), s => s.getField("h")).as("toks"),
        size(col("_o")).cast("long").as("n"))
    // identical rarity-ordered arrays ⇔ identical token sets (df is a
    // global function of h, so equal sets sort identically): one group
    // per distinct set, min-id representative, members kept for the
    // final expansion
    val sets = ordered
      .groupBy(col("toks"), col("n"))
      .agg(min(col("id")).as("sid"), collect_list(col("id")).as("ids"),
        count(lit(1)).as("m"))
      .persist(sl)
    val prefixLen = col("n") - ceil(lit(threshold) * col("n").cast("double")) + 1
    val prefixes = sets.select(col("sid"), col("n"),
      posexplode(slice(col("toks"), lit(1), prefixLen.cast("int"))))
      .select(col("sid"), col("n"), col("pos").as("p"), col("col").as("h"))
    // PAIR-VOLUME FENCE: this join is output-quadratic in duplication
    // density BY DESIGN (an exact all-pairs result cannot be smaller
    // than the true pair volume), so a boilerplate-heavy corpus must
    // refuse LOUDLY before the candidate join materializes — the
    // forecast is the q144 machinery (sum over shared prefix tokens of
    // cnt·(cnt−1)/2, decimal-routed), computed from per-token counts
    // without running the join. An over-budget corpus should run the
    // SAMPLED exactness auditor ([[auditRecall]], q256 — fixed budget,
    // flat in corpus size) instead, or raise the cap deliberately.
    val maxCand = docs.sparkSession.conf
      .getOption("spark.graft.prefixJoin.maxCandidatePairs")
      .map(_.toLong).getOrElse(MaxCandidatePairs)
    // cheap pre-check before the forecast pass: C(P, 2) over the TOTAL
    // prefix-token count P bounds the per-token sum from above (the sum
    // is maximized when every token shares one hash), and P needs only
    // a scalar aggregate over the persisted `sets` frame — no explode,
    // no groupBy. A corpus that cannot trip the cap even in the
    // all-one-bucket worst case skips the forecast job entirely; the
    // grouped forecast runs only where the refusal is actually in play.
    val pRow = sets.agg(sum((col("n") -
        ceil(lit(threshold) * col("n").cast("double")) + 1)
      .cast("decimal(38,0)")).as("p")).collect()(0)
    val pTotal = if (pRow.isNullAt(0)) java.math.BigDecimal.ZERO
      else pRow.getDecimal(0)
    val pBound = pTotal.multiply(
        pTotal.subtract(java.math.BigDecimal.ONE))
      .divide(new java.math.BigDecimal(2))
    if (sys.env.contains("GRAFT_FENCE_DEBUG"))
      System.err.println(s"[fence] P=$pTotal bound=$pBound cap=$maxCand " +
        s"skip=${pBound.compareTo(new java.math.BigDecimal(maxCand)) <= 0}")
    val estCand = if (pBound.compareTo(
        new java.math.BigDecimal(maxCand)) <= 0) null
      else prefixes.groupBy(col("h"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).as("pairs"))
        .collect()(0).getDecimal(0)
    if (estCand != null &&
        estCand.compareTo(new java.math.BigDecimal(maxCand)) > 0)
      throw new IllegalStateException(
        s"prefix-filter join refused: forecast candidate pair volume " +
          s"~$estCand exceeds the cap $maxCand (the corpus is too " +
          s"duplication-dense for an exact all-pairs join at threshold " +
          s"$threshold). Run the sampled exactness auditor instead " +
          "(DedupApprox.auditRecall — fixed budget, flat in corpus " +
          "size), or raise spark.graft.prefixJoin.maxCandidatePairs " +
          "if the cluster can really verify that many pairs")
    // PPJoin positional filter: both arrays share the (df, h) total
    // order, so a pair's overlap tokens all sit at or after the shared
    // token's position on each side — overlap <= min(n_a - p_a, n_b -
    // p_b) (p 0-based, count includes the shared token). Jaccard >= t
    // forces overlap >= ceil(t/(1+t)·(n_a+n_b)) = alpha, so join rows
    // whose positional bound is under alpha cannot be the pair's first
    // shared token and are dropped BEFORE the pair ever materializes;
    // a true pair always survives at its first shared prefix token.
    // The 1e-9 backoff keeps ceil from rounding an epsilon-above-
    // integer double product up (which would over-prune).
    val alpha = ceil((col("a.n") + col("b.n")).cast("double") *
      lit(threshold / (1.0 + threshold)) - lit(1e-9))
    val cands = prefixes.as("a").join(prefixes.as("b"),
        col("a.h") === col("b.h") && col("a.sid") < col("b.sid") &&
          col("b.n").cast("double") >= lit(threshold) * col("a.n").cast("double") &&
          col("a.n").cast("double") >= lit(threshold) * col("b.n").cast("double") &&
          least(col("a.n") - col("a.p"), col("b.n") - col("b.p"))
            .cast("double") >= alpha)
      .select(col("a.sid").as("sid_a"), col("b.sid").as("sid_b")).distinct()
    val setSides = sets.select(col("sid"), col("toks"), col("n"), col("ids"))
    val inter = size(array_intersect(col("_ta"), col("_tb"))).cast("long")
    // cross-set verdicts on the distinct-set frame, then expansion to
    // member doc pairs (the set-level jaccard IS every member pair's)
    val crossPairs = cands
      .join(setSides.select(col("sid").as("sid_a"), col("toks").as("_ta"),
        col("n").as("_na"), col("ids").as("_ia")), "sid_a")
      .join(setSides.select(col("sid").as("sid_b"), col("toks").as("_tb"),
        col("n").as("_nb"), col("ids").as("_ib")), "sid_b")
      .withColumn("_i", inter)
      .withColumn("jaccard", col("_i").cast("double") /
        (col("_na") + col("_nb") - col("_i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(explode(col("_ia")).as("_da"), col("_ib"), col("jaccard"))
      .select(col("_da"), explode(col("_ib")).as("_db"), col("jaccard"))
      .select(least(col("_da"), col("_db")).as("id_a"),
        greatest(col("_da"), col("_db")).as("id_b"),
        (floor(col("jaccard") * 10000 + 0.5) / 10000).as("jaccard"))
    // within-set pairs: every member pair of a multi-doc set, Jaccard
    // exactly 1.0 (>= any valid threshold); pos ordering avoids emitting
    // both orientations
    val withinPairs = sets.filter(col("m") > 1)
      .select(posexplode(col("ids")).as(Seq("_pa", "_da")), col("ids"))
      .select(col("_pa"), col("_da"), posexplode(col("ids")).as(Seq("_pb", "_db")))
      .filter(col("_pa") < col("_pb"))
      .select(least(col("_da"), col("_db")).as("id_a"),
        greatest(col("_da"), col("_db")).as("id_b"), lit(1.0).as("jaccard"))
    crossPairs.unionByName(withinPairs)
  }

  /** Asymmetric shingle CONTAINMENT — excerpt/quote detection. For the
    * ORDERED doc pair (a, b), `containment = |Sa ∩ Sb| / |Sa|` over
    * distinct k-shingle sets: ~1.0 when a is quoted inside b, even though
    * the Jaccard that minhash LSH is tuned for is tiny for a small excerpt
    * of a big doc. Candidates therefore do NOT come from minhash bands —
    * docs pair when they SHARE a shingle, via one equi-join of the
    * exploded distinct-shingle frames on the 60-bit shingle hash.
    *
    * Scale shape: one explode + distinct per doc; shingles occurring in
    * more than `maxShingleDf` docs (boilerplate n-grams — the quadratic
    * hazard: one shared stop-phrase would pair every doc with every other)
    * are dropped BEFORE the self-join, bounding per-shingle pair fan-out
    * at maxShingleDf². Both numerator and denominator are computed over
    * the surviving INFORMATIVE shingle set — sizing |Sa| on the uncapped
    * set would deflate containment for boilerplate-heavy docs and miss
    * true excerpts. The shared-count is a partial-aggregatable count on
    * (id_a, id_b); per-doc set sizes join back once. Both directions are
    * emitted, so the threshold reads directionally ("a is ≥ t inside b").
    * The ratio is snapped to the 1e-4 lattice with IEEE-exact ops, so a
    * SQL oracle reproduces it bit-for-bit. The cached shingle frame is
    * released by Spark's ContextCleaner once the result frame is
    * unreferenced; long-lived pipelines wanting explicit lifecycle should
    * build from [[shingleHashSets]] and persist/release themselves. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5,
      maxShingleDf: Int = 100): DataFrame = {
    require(maxShingleDf > 1, s"maxShingleDf $maxShingleDf must exceed 1")
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold $threshold outside [0, 1]")
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val sh = docs.repartition(np, col(idCol))
      .select(col(idCol).as("id"),
        explode(TextAnalysis.shingleStrings(col(textCol), k)).as("_s"))
      .select(col("id"), graft.functions.Checksums.md5PrefixLong(col("_s")).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf).select(col("h"))
    val cool = sh.join(hot, Seq("h"), "left_anti")
    // denominator over the SAME capped set as the numerator: sizing |Sa|
    // on the uncapped frame would deflate containment for docs whose
    // shingles are mostly boilerplate (a true excerpt would score 0.4
    // and slip the threshold). Containment is therefore over each doc's
    // INFORMATIVE (df <= cap) shingles; an all-boilerplate doc has no
    // informative set and produces no pairs.
    val sizes = cool.groupBy(col("id")).agg(count(lit(1)).as("n"))
    cool.select(col("h"), col("id").as("id_a"))
      .join(cool.select(col("h"), col("id").as("id_b")), Seq("h"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .withColumn("containment",
        floor(col("shared").cast("double") / col("n_a").cast("double") *
          10000 + 0.5) / 10000)
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared"), col("n_a"),
        col("containment"))
  }

  /** Sampled EXACTNESS AUDITOR — the corpus-safe form of the recall
    * audit (q166). The exact prefix-filter join is output-quadratic in
    * duplication density (measured 73× at a 10× corpus), so run whole it
    * is a one-off forensic, not a pipeline stage. This operator makes the
    * sampled mode first-class: hash-sample each stratum at its own rate
    * ([[Sampling.stratifiedHashSample]] — md5-cutoff membership, so any
    * SQL engine reproduces the exact sample), then run BOTH the exact
    * ground-truth join ([[prefixFilterPairsTokens]]) and the banded
    * MinHash screen ([[minhashNearDups]]) INSIDE the sample, and report
    * per-stratum recall from the sample's exact pair counts.
    *
    * Validity: a pair verdict (exact Jaccard ≥ t) depends only on the two
    * docs, so truth restricted to the sample IS the sample's truth; the
    * banded screen is likewise per-pair (signature bucketing), so in-
    * sample banding equals corpus banding restricted to sampled pairs
    * (run with no degenerate-bucket cap — the one banding step whose
    * verdict depends on OTHER docs). found ⊆ truth (the prefix filter has
    * no false negatives at equal tokenization), so per-stratum
    * recall = (n_true − n_missed) / n_true; a stratum with no true pairs
    * reads 1.0 (vacuously complete — its n_true column says why).
    *
    * Scale shape: cost is the exact join over rate² of each stratum's
    * pair volume — a FIXED budget chosen by `rates`, flat in corpus size
    * at fixed sample size, which is the whole point. Strata with known
    * heavy duplication get small rates; rare strata can run at 1.0. */
  def auditRecall(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, rates: Map[String, Double], defaultRate: Double,
      threshold: Double = 0.6, shingleK: Int = 3,
      bands: Int = 8, rows: Int = 2, md5Family: Boolean = true): DataFrame = {
    val sample = Sampling.stratifiedHashSample(docs.select(
        col(idCol), col(textCol), col(strataCol)),
        strataCol, rates, defaultRate, Seq(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truth = prefixFilterPairsTokens(sample, idCol,
        TextAnalysis.shingleStrings(col(textCol), shingleK), threshold)
      .select("id_a", "id_b")
    val found = minhashNearDups(sample, idCol, textCol,
        k = shingleK, bands = bands, rows = rows, threshold = threshold,
        md5Family = md5Family, maxBucket = 0)
      .select("id_a", "id_b")
    // a pair audits under its SMALLER id's stratum: deterministic, and
    // within-stratum pairs (the common case — dupes share provenance)
    // land where a reader expects them
    val strata = sample.select(col(idCol).as("id_a"),
      col(strataCol).as("stratum"))
    val truthS = truth.join(strata, "id_a")
    val missed = truthS.join(found, Seq("id_a", "id_b"), "left_anti")
      .groupBy("stratum").agg(count(lit(1)).as("n_missed"))
    val trues = truthS.groupBy("stratum").agg(count(lit(1)).as("n_true"))
    val docsPer = sample.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
    docsPer
      .join(trues, Seq("stratum"), "left")
      .join(missed, Seq("stratum"), "left")
      .select(col("stratum"), col("n_docs"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        (coalesce(col("n_true"), lit(0L)) -
          coalesce(col("n_missed"), lit(0L))).as("n_found"),
        when(coalesce(col("n_true"), lit(0L)) === 0, lit(1.0))
          .otherwise(floor((col("n_true") -
              coalesce(col("n_missed"), lit(0L))).cast("double") /
            col("n_true").cast("double") * 1000000 + 0.5) / 1000000)
          .as("recall"))
      .orderBy("stratum")
  }
}
