package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Checksums, Normalize}
import graft.operators.{Dedup, DedupApprox, Export, Multimodal, Similarity, Strategies, TextAnalysis}
import graft.sources.Sources

import QueryShared._

/** Text-analysis and text-dedup queries: token/quality/language
  * signals, exact + MinHash/SimHash near-dup, BM25 (scan, indexed,
  * incremental), containment, PII, URLs, diversity. */
private[graft] object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- bigram-LM fluency scoring (CCNet/KenLM-style filter) ------
    "q266_lm_fluency" -> ((s, dir) => {
      // model trained on the doc_id % 3 == 0 reference slice, every doc
      // scored under it: n_pairs, OOV bigrams, and the integer-scaled
      // add-one-smoothed transition-probability sum (log-free by
      // design — BIGINT division end to end, so the fluency signal is
      // bit-identical across engines and partition orders). The train
      // and score tokenizations, the smoothing denominator V, and the
      // floor division are all mirrored exactly in the oracle
      val docs = rd(s, dir, "documents").select("doc_id", "text")
      val model = graft.operators.LanguageModel.train(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
      graft.operators.LanguageModel.score(docs, "doc_id", "text", model)
        .orderBy("doc_id")
    }),


    // ----- text stats: token counting (training-data ops) ------------
    "q21_text_stats" -> ((s, dir) => {
      rd(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_calc"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    }),


    // ----- text quality scoring --------------------------------------
    "q22_text_quality" -> ((s, dir) => {
      val t = col("text")
      val n = length(t).cast("double")
      val alpha = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
      val punct = length(regexp_replace(t, "[^.,;:!?]", "")).cast("double")
      val toks = TextAnalysis.tokenCount(t).cast("double")
      val stop = TextAnalysis.stopwordCount(t, TextAnalysis.EnglishStopwords).cast("double")
      rd(s, dir, "documents").select(
        col("doc_id"),
        r(alpha / greatest(n, lit(1.0)), 4).as("alpha_ratio"),
        r(punct / greatest(n, lit(1.0)), 4).as("punct_ratio"),
        r(stop / greatest(toks, lit(1.0)), 4).as("stopword_ratio"),
        r(alpha / greatest(toks, lit(1.0)), 4).as("mean_token_len"))
        .orderBy("doc_id")
    }),


    // ----- language ID (n-gram heuristic) ----------------------------
    "q23_lang_id" -> ((s, dir) => {
      rd(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.languageId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),


    // ----- language-ID confusion matrix (classifier evaluation) ------
    "q235_lang_confusion" -> ((s, dir) => {
      // q23's language classifier EVALUATED against the corpus's own
      // labels: the (label, prediction) confusion matrix plus per-cell
      // corpus share — which languages leak into which, and how much
      // of the corpus a langID gate would misroute. One aggregation;
      // the share is an exact integer ratio on the 1e-6 lattice.
      val docs = rd(s, dir, "documents")
      val n = docs.count() // corpus size: one scalar, literal thereafter
      docs.select(col("lang"),
          TextAnalysis.languageId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("share",
          expr(s"(n_docs * 1000000) div $n")) // exact integer ppm
        .orderBy("lang", "lang_pred")
    }),


    // ----- per-source language purity (feed QC) ----------------------
    "q237_source_purity" -> ((s, dir) => {
      // is each feed linguistically coherent? — per source: doc count,
      // distinct languages, the DOMINANT language (ties break to the
      // lexicographically larger code — the struct-max order — so the
      // answer is deterministic) and its share as exact integer ppm.
      // Two aggregations: (source, lang) cells, then
      // a max_by reduction per source — cells are tiny, nothing joins
      // back to the corpus.
      val cells = rd(s, dir, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("n"))
      cells.groupBy("source")
        .agg(sum(col("n")).as("n_docs"),
          count(lit(1)).as("n_langs"),
          max(struct(col("n"), col("lang"))).as("top"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          col("top.lang").as("dominant_lang"),
          expr("(top.n * 1000000) div n_docs").as("purity_ppm"))
        .orderBy("source")
    }),


    // ----- exact dedup by content hash -------------------------------
    "q24_dedup_exact" -> ((s, dir) => {
      DedupApprox.exactByContent(docsWithExactDups(s, dir), "doc_id", "text",
        md5Family = true).orderBy("fp")
    }),


    // ----- MinHash+LSH near-dup detection ----------------------------
    "q25_minhash_neardup" -> ((s, dir) => {
      DedupApprox.minhashNearDups(docsWithNearDups(s, dir), "doc_id", "text",
        k = 3, bands = 8, rows = 2, threshold = 0.6, md5Family = true)
    }),


    // ----- SimHash near-dup (xxhash64 — rows-only check) -------------
    "q26_simhash_neardup" -> ((s, dir) => {
      // maxBucket caps degenerate sketch buckets (boilerplate corpora); far
      // above any real bucket at this SF, so results are unaffected
      DedupApprox.simhashNearDups(docsWithNearDups(s, dir), "doc_id", "text",
        maxHamming = 12, maxBucket = 100000).orderBy("id_a", "id_b")
    }),


    // ----- generator: explode tokens + top-k frequency ---------------
    "q46_token_freq" -> ((s, dir) => {
      rd(s, dir, "documents")
        .select(explode(split(TextAnalysis.normText(col("text")), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    }),


    // ----- TF-IDF top terms per doc (exact-IEEE log-free idf) --------
    "q47_tfidf_terms" -> ((s, dir) => {
      TextAnalysis.tfIdfTopTerms(docsBase(s, dir), "doc_id", "text", topK = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rnk")
    }),


    // ----- cross-doc shingle novelty / contamination fraction --------
    "q48_shingle_novelty" -> ((s, dir) => {
      TextAnalysis.shingleNovelty(docsWithNearDups(s, dir), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),


    // ----- corpus-duplicated substring spans (exact-substring dedup) -
    "q121_duplicate_spans" -> ((s, dir) => {
      // the token-offset intervals to CUT, not just a score: every
      // 3-token window occurring more than once corpus-wide, merged into
      // maximal per-doc spans (gaps-and-islands, key-partitioned)
      TextAnalysis.duplicateSpans(docsWithNearDups(s, dir), "doc_id", "text",
        k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "span_start")
    }),


    // ----- cluster labeling terms (c-TF-IDF) -------------------------
    "q137_cluster_terms" -> ((s, dir) => {
      // top-5 characteristic terms per source "cluster": cluster term
      // count x log-free idf ratio, scores snapped to the 1e-6 lattice
      // BEFORE the per-cluster rank window — the BERTopic labeling step
      TextAnalysis.clusterTerms(
        rd(s, dir, "documents").select("doc_id", "source", "text"),
        "source", "doc_id", "text", topK = 5)
        .withColumnRenamed("cluster", "source")
        .orderBy("source", "rank")
    }),


    // ----- exact-threshold similarity join via prefix filtering ------
    // ----- Simpson lexical diversity (log-free token entropy) --------
    "q141_lexical_diversity" -> ((s, dir) => {
      // Gini impurity of each doc's token distribution — the quality
      // signal repetitionRatio's modal n-gram misses (even cycling over
      // ten phrases scores low here); exact integer moments, one IEEE
      // divide, 1e-6 lattice
      TextAnalysis.lexicalDiversity(docsBase(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),


    // ----- exact edit-distance-1 fuzzy join (SymSpell blocking) ------
    "q139_fuzzy_join" -> ((s, dir) => {
      // typo-tolerant entity matching: every customer-name pair within
      // ONE edit, found by a single equi-join on symmetric-delete
      // variants (no false negatives, no cartesian) + banded verify.
      // The oracle is the BRUTE-FORCE O(n^2) levenshtein join — equality
      // proves the blocking loses nothing
      graft.operators.FuzzyJoin.ed1Pairs(
        rd(s, dir, "customer").filter(col("c_custkey") <= 500),
        "c_custkey", "c_name")
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
        .orderBy("id_a", "id_b")
    }),


    "q128_prefix_filter_join" -> ((s, dir) => {
      // AllPairs/PPJoin: NO-false-negative word-set Jaccard >= 0.6 pairs
      // — candidates from one equi-join on rarity-ordered token
      // prefixes, exact verify; the deterministic complement to the
      // probabilistic minhash pairs (q25)
      DedupApprox.prefixFilterPairs(docsWithNearDups(s, dir), "doc_id",
        "text", threshold = 0.6)
        .orderBy("id_a", "id_b")
    }),


    // ----- incremental ingest near-dup gate (new vs corpus only) -----
    "q50_incremental_neardup" -> ((s, dir) => {
      val base = docsBase(s, dir)
      val incoming = base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
        .unionByName(base.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 20000).as("doc_id"), col("text")))
      DedupApprox.incrementalNearDups(base, incoming, "doc_id", "text",
        k = 3, bands = 8, rows = 2, threshold = 0.6, md5Family = true)
        .orderBy("new_id", "corpus_id")
    }),


    // ----- n-gram repetition ratio (quality-filter rule) -------------
    "q53_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionRatio(docsBase(s, dir), "doc_id", "text", n = 2)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),


    // ----- PII scrub: count + redact emails/phones -------------------
    // ----- record-level transform provenance (lineage masks) ---------
    "q199_provenance" -> ((s, dir) => {
      // which cleaning stages actually touched each record? — every
      // stage stamps one bit into a per-row mask IFF its output
      // differs from its input (bit 0 email redaction, bit 1 phone
      // redaction, bit 2 truncation to 300 chars), then the corpus
      // collapses to a mask histogram — the audit that catches a
      // transform silently firing on rows it shouldn't (or not firing
      // where it must). Masks are plain bitwise column arithmetic:
      // zero shuffles until the final 8-row histogram
      def stage(df: DataFrame, bit: Int, out: Column): DataFrame =
        df.withColumn("_new", out)
          .withColumn("_mask", col("_mask").bitwiseOR(
            when(col("_new") =!= col("text"), lit(1L << bit))
              .otherwise(lit(0L))))
          .withColumn("text", col("_new")).drop("_new")
      val base = docsWithPii(s, dir).withColumn("_mask", lit(0L))
      val cleaned = stage(stage(stage(base,
        0, regexp_replace(col("text"), TextAnalysis.EmailRe, "<EMAIL>")),
        1, regexp_replace(col("text"), TextAnalysis.PhoneRe, "<PHONE>")),
        2, substring(col("text"), 1, 300))
      cleaned.groupBy(col("_mask").as("mask"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
        .orderBy("mask")
    }),


    "q58_pii_redact" -> ((s, dir) => {
      docsWithPii(s, dir).select(col("doc_id"),
        TextAnalysis.patternCount(col("text"), TextAnalysis.EmailRe).as("n_emails"),
        TextAnalysis.patternCount(col("text"), TextAnalysis.PhoneRe).as("n_phones"),
        md5(TextAnalysis.redactPii(col("text"))).as("redacted_fp"))
        .orderBy("doc_id")
    }),


    // ----- URL domain extraction (corpus provenance report) ----------
    "q59_url_domains" -> ((s, dir) => {
      docsWithUrls(s, dir)
        .select(col("doc_id"), explode(TextAnalysis.urlDomains(col("text"))).as("domain"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_mentions"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("domain")
    }),


    // ----- fixed-width length histogram ------------------------------
    "q60_length_histogram" -> ((s, dir) => {
      rd(s, dir, "documents")
        .groupBy(TextAnalysis.histogramBin(col("n_chars"), 100L, 20).as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
        .orderBy("bin")
    }),


    // ----- deterministic per-group cap (max docs per source) ---------
    "q61_source_cap" -> ((s, dir) => {
      graft.operators.Sampling.capPerGroup(rd(s, dir, "documents"),
        groupCols = Seq("source"), keyCols = Seq("doc_id"), k = 10)
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    }),


    // ----- composed corpus-cleaning pipeline (C4-style) --------------
    // raw crawl stand-in (PII + exact dups injected) -> language gate ->
    // quality gate (token count, alpha ratio) -> PII redaction -> exact
    // dedup on the redacted content (min doc_id is canonical). Every
    // stage is an operator proven alone (q23, q21/q22, q58, q24); this
    // query proves the COMPOSITION end-to-end against one oracle.
    "q62_clean_pipeline" -> ((s, dir) => {
      val base = docsWithPii(s, dir)
      val raw = base.unionByName(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val t = col("text")
      val alphaRatio = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double") /
        greatest(length(t).cast("double"), lit(1.0))
      raw.filter(TextAnalysis.languageId(t) === "en")
        .filter(TextAnalysis.tokenCount(t) >= 30 && alphaRatio > lit(0.55))
        .select(col("doc_id"),
          md5(TextAnalysis.normText(TextAnalysis.redactPii(t))).as("fp"))
        .groupBy("fp")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "fp", "n_copies")
        .orderBy("doc_id")
    }),


    // ----- cross-corpus contamination (benchmark decontamination) ----
    "q64_contamination" -> ((s, dir) => {
      val d = docsBase(s, dir)
      val train = d.filter(col("doc_id") % 2 === 0)
      val eval_ = d.filter(col("doc_id") % 2 === 1)
        .unionByName(d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 30000).as("doc_id"),
            expr("substring(text, instr(text, ' ') + 1)").as("text")))
      TextAnalysis.crossContamination(train, eval_, "doc_id", "text", k = 3)
        .select(col("id").as("doc_id"), col("n_shingles"), col("contaminated_frac"))
        .orderBy("doc_id")
    }),


    // ----- sliding token-window chunking -----------------------------
    "q65_chunking" -> ((s, dir) => {
      TextAnalysis.chunkTokens(rd(s, dir, "documents"), "doc_id", "text",
        chunkSize = 40, stride = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_id")
    }),


    // ----- content-defined chunking (insertion-robust dedup unit) ----
    "q151_cdc_chunks" -> ((s, dir) => {
      // per-source chunk-level dedup accounting over CONTENT-DEFINED
      // chunks: boundaries fall where a token's hash does, so an
      // insertion reflows one chunk instead of shifting every
      // downstream one (the property fixed-size chunking q65 lacks) —
      // chunk hashes are the dedup unit that survives edits. dup_ratio
      // = share of chunks whose hash recurs within the source
      val docs = rd(s, dir, "documents")
      val chunks = TextAnalysis.cdcChunks(docs, "doc_id", "text",
        meanToks = 16)
      chunks.join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("chunk_hash")).as("n_distinct"),
          (floor((count(lit(1)) - countDistinct(col("chunk_hash")))
            .cast("double") / count(lit(1)) * 10000 + 0.5) / 10000)
            .as("dup_ratio"))
        .orderBy("source")
    }),


    // ----- markup stripping (WET-style text extraction) --------------
    "q153_markup_strip" -> ((s, dir) => {
      // crawled-HTML → training-text extraction audit, per source:
      // script/style bodies removed wholesale (the in-script '<p>' decoy
      // must NOT survive as text), comments/tags → spaces, entities
      // decoded, whitespace collapsed. fp_sum is an order-insensitive
      // content checksum (60-bit md5 prefix mod 1e9 — sums stay in
      // BIGINT at any corpus size); markup_ratio = share of page bytes
      // that were markup. Pure codegen'd scan — no shuffle before the
      // final per-source aggregate
      val ex = docsWithHtml(s, dir).select(col("source"), col("html"),
        TextAnalysis.stripMarkup(col("html")).as("text"))
      ex.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        (floor(sum((length(col("html")) - length(col("text"))).cast("long"))
          .cast("double") / sum(length(col("html")).cast("long")).cast("double")
          * 10000 + 0.5) / 10000).as("markup_ratio"),
        sum(pmod(graft.functions.Checksums.md5PrefixLong(col("text")),
          lit(1000000000L))).as("fp_sum"))
        .orderBy("source")
    }),


    // ----- line-level boilerplate removal (CCNet/C4 rule) ------------
    "q77_boilerplate_lines" -> ((s, dir) => {
      // the fixture's text is single-line, so spaces become line breaks:
      // "lines" are then words and the corpus-frequency rule drops filler
      // words present in > 50 distinct docs — same operator, same oracle
      // arithmetic as a real multi-line corpus
      val docs = rd(s, dir, "documents").select(col("doc_id"),
        translate(col("text"), " ", "\n").as("text"))
      TextAnalysis.dropBoilerplateLines(docs, "doc_id", "text", maxDocFreq = 50)
        .orderBy("doc_id")
    }),


    // ----- corpus-wide exact paragraph dedup (RefinedWeb rule) --------
    "q81_paragraph_dedup" -> ((s, dir) => {
      // single-line fixture text: spaces become paragraph breaks (same
      // trick as q77) — every repeated word keeps only its first global
      // occurrence by (doc_id, pos); blank paragraphs are structural
      val docs = rd(s, dir, "documents").select(col("doc_id"),
        translate(col("text"), " ", "\n").as("text"))
      TextAnalysis.dedupParagraphs(docs, "doc_id", "text")
        .orderBy("doc_id")
    }),


    // ----- BM25 ranking (log-free idf, integer micro-score sum) ------
    "q83_bm25" -> ((s, dir) => {
      // 'dup' is rare (df 25/500 at sf0.01) while 'vector'/'spark' are
      // common, so the idf ratio actually spreads the ranking
      TextAnalysis.bm25Rank(docsBase(s, dir), "doc_id", "text",
        Seq("dup", "vector", "spark"), topK = 15)
        .withColumnRenamed("id", "doc_id")
    }),


    // ----- vocabulary coverage curve ---------------------------------
    "q85_vocab_coverage" -> ((s, dir) => {
      TextAnalysis.vocabCoverage(docsBase(s, dir), "doc_id", "text", topK = 20)
        .orderBy("rnk")
    }),


    // ----- rare-token ratio quality signal ---------------------------
    "q86_rare_tokens" -> ((s, dir) => {
      TextAnalysis.rareTokenRatio(docsBase(s, dir), "doc_id", "text",
        maxFreq = 100)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),


    // ----- shingle containment (excerpt/quote detection) -------------
    "q87_containment" -> ((s, dir) => {
      // the injected near-dups are tail-substrings of their source doc,
      // so containment is ~1.0 in one direction — exactly the subset
      // relation Jaccard-tuned minhash banding under-recalls
      DedupApprox.containmentPairs(docsWithNearDups(s, dir), "doc_id",
        "text", k = 3, threshold = 0.5, maxShingleDf = 100)
        .orderBy("id_a", "id_b")
    }),


    // ----- URL canonicalization (provenance dedup key) ---------------
    "q90_url_canonical" -> ((s, dir) => {
      // messy synthetic URLs (mixed-case authority, tracking params,
      // fragments, trailing slashes) built deterministically from doc_id
      // so the oracle constructs the identical input strings
      val urls = rd(s, dir, "documents").select(col("doc_id"),
        concat(
          lit("HTTPS://Site"), (col("doc_id") % 5).cast("string"),
          lit(".Example.COM/Path"), (col("doc_id") % 4).cast("string"),
          when(col("doc_id") % 3 === 0,
            concat(lit("/?utm_source=x&page="), (col("doc_id") % 2).cast("string")))
            .when(col("doc_id") % 3 === 1, lit("?utm_campaign=y"))
            .otherwise(lit("/")),
          when(col("doc_id") % 2 === 0, lit("#frag")).otherwise(lit(""))
        ).as("url"))
      urls
        .select(col("doc_id"), TextAnalysis.canonicalizeUrl(col("url")).as("canon"))
        .groupBy("canon")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
        .orderBy("canon")
    }),


    // ----- persisted inverted (posting-list) index -------------------
    "q93_inverted_index" -> ((s, dir) => {
      // postings written partitionBy(term_bucket) once; the probe prunes
      // to the query terms' buckets at planning time (like q30/q49)
      val path = cachedIndexPath(s, dir, "graft_q93_inv", "documents",
        "k1_b64")(p => TextAnalysis.writeInvertedIndex(
          docsBase(s, dir), "doc_id", "text", p, nBuckets = 64))
      TextAnalysis.probePostings(TextAnalysis.readInvertedIndex(s, path),
        Seq("dup", "vector", "spark"), nBuckets = 64)
        .orderBy("term", "doc_id")
    }),


    // ----- BM25 served from the persisted index ----------------------
    "q94_bm25_indexed" -> ((s, dir) => {
      val path = cachedIndexPath(s, dir, "graft_q94_bm25", "documents",
        "k1b64")(p => TextAnalysis.writeBm25Index(
          docsBase(s, dir), "doc_id", "text", p, nBuckets = 64))
      TextAnalysis.bm25FromIndex(s, path, Seq("dup", "vector", "spark"),
        topK = 15, nBuckets = 64)
    }),


    // ----- BPE merge-candidate (adjacent-pair) counting --------------
    "q95_bigram_merges" -> ((s, dir) => {
      // the first step of a BPE-style merge loop: corpus-wide adjacent
      // token-pair frequencies, top candidates by count. One explode of
      // 2-shingles + one partial-aggregated count + a bounded top-k heap
      // — the same shape at any corpus size. Single-token docs contribute
      // no pairs (shingleStrings' degenerate case is filtered by arity).
      val toks = split(TextAnalysis.normText(col("text")), " ")
      val n = size(toks)
      // zip_with over two shifted slices: one concat per pair, no
      // per-window array allocation (shingleStrings' general-k path
      // costs ~3x here); docs with <2 tokens contribute no pairs
      val pairs = when(n < 2, array().cast("array<string>"))
        .otherwise(zip_with(
          slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
          (x, y) => concat(x, lit(" "), y)))
      docsBase(s, dir)
        .select(explode(pairs).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(20)
    }),


    // ----- corpus diversity estimate (no pair expansion) -------------
    "q97_corpus_diversity" -> ((s, dir) => {
      DedupApprox.pairwiseJaccardEstimate(docsWithNearDups(s, dir),
        "doc_id", "text", k = 3, numHashes = 16)
    }),


    // ----- incremental BM25 index (append-only corpus growth) --------
    "q98_bm25_incremental" -> ((s, dir) => {
      // index built from the even half, odd half APPENDED — must equal
      // the from-scratch full-corpus ranking (same oracle as q83/q94)
      val docs = docsBase(s, dir)
      val path = cachedIndexPath(s, dir, "graft_q98_bm25", "documents",
        "k1b64_incr") { p =>
        // markComplete=false: only the LAST step of a composed build may
        // create the completion marker the cache keys on
        TextAnalysis.writeBm25Index(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", p, nBuckets = 64, markComplete = false)
        TextAnalysis.appendToBm25Index(docs.filter(col("doc_id") % 2 =!= 0),
          "doc_id", "text", p, nBuckets = 64)
      }
      TextAnalysis.bm25FromIndex(s, path, Seq("dup", "vector", "spark"),
        topK = 15, nBuckets = 64)
    }),


    // ----- per-source corpus audit report ----------------------------
    "q99_corpus_report" -> ((s, dir) => {
      // one composed audit frame per source: volume, corpus-wide exact
      // dup count, mean alpha-ratio quality, mean rare-token ratio. All
      // means are lattice-snapped then DECIMAL-routed so aggregation
      // order can't perturb them (the q01 avg_disc parity pattern).
      val docs = rd(s, dir, "documents").select("doc_id", "source", "text")
      // r()-snapped, NOT qualitySignals' round(): round() goes through
      // the shortest decimal repr while the oracle's floor(x*1e4+0.5) is
      // raw IEEE — a 4th-digit boundary could snap differently
      val alphaRatio = r(
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
          greatest(length(col("text")).cast("double"), lit(1.0)), 4)
      val base = docs.select(col("doc_id"), col("source"),
        alphaRatio.as("alpha_ratio"),
        TextAnalysis.md5Fingerprint(col("text")).as("fp"))
      val dupFp = base.groupBy("fp").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1).select(col("fp"), lit(1).as("_dup"))
      val rare = TextAnalysis.rareTokenRatio(docs, "doc_id", "text",
          maxFreq = 100)
        .select(col("id").as("doc_id"), r(col("rare_ratio"), 6).as("rr"))
      val nRr = sum(when(col("rr").isNotNull, 1L).otherwise(0L))
      base.join(dupFp, Seq("fp"), "left")
        .join(rare, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("_dup").isNotNull, 1L).otherwise(0L)).as("n_exact_dups"),
          (sum(col("alpha_ratio").cast("decimal(18,4)")).cast("double") /
            count(lit(1)).cast("double")).as("mean_alpha_ratio"),
          when(nRr > 0, sum(col("rr").cast("decimal(28,6)")).cast("double") /
            nRr.cast("double")).as("mean_rare_ratio"))
        .orderBy("source")
    }),


    // ----- bigram-LM surprisal quality filter ------------------------
    "q173_bigram_surprise" -> ((s, dir) => {
      // perplexity-style "reads like the corpus?" signal with zero
      // floats in the decision: self-trained bigram counts, transition
      // flagged surprising when P(w2|w1) < 1/32 via the integer form
      // c(w1,·) > 32·c(w1,w2); per-doc surprise rate on the 1e-6
      // lattice
      TextAnalysis.bigramSurprise(docsBase(s, dir), "doc_id", "text",
        denom = 32)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),


    // ----- Unicode NFC normalization audit ---------------------------
    "q171_unicode_nfc" -> ((s, dir) => {
      // decomposed combining sequences (e + U+0301) split token stats
      // and defeat byte-keyed dedup; the native codegen'd nfc_normalize
      // composes them, with a quick-check fast path that returns
      // already-NFC rows untouched (the common case at corpus scale —
      // no String materialization, no allocation). Output: the docs
      // whose bytes changed, how many codepoints composed, and the
      // normalized tail so the composed content itself is under the
      // oracle's byte-compare.
      val dia = docsWithDiacritics(s, dir)
      dia.select(col("doc_id"), col("text2"),
          Normalize.nfc(col("text2")).as("norm"))
        .filter(col("text2") =!= col("norm"))
        .select(col("doc_id"),
          (length(col("text2")) - length(col("norm"))).cast("long")
            .as("chars_composed"),
          expr("right(norm, 16)").as("norm_tail"))
        .orderBy("doc_id")
    }),


    // ----- BPE tokenizer APPLICATION (q95's learning counterpart) ----
    "q216_bpe_apply" -> ((s, dir) => {
      // a trained merge table applied corpus-wide: per-doc symbol and
      // token counts plus the compression ratio the table achieves —
      // pure codegen'd string expressions, the merge table shipped as
      // plan literals (how a tokenizer artifact reaches every executor)
      TextAnalysis.bpeApply(docsBase(s, dir), "doc_id", "text", bpeMerges)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),


    // ----- tokenizer fertility per language --------------------------
    "q243_tokenizer_fertility" -> ((s, dir) => {
      // the tokenizer-efficiency readout a rollout quotes per language
      // BEFORE committing: a BPE table learned from the corpus majority
      // compresses majority-language text better, and fertility
      // (chars/token) per language is where that bias shows. One pass
      // composes q23's classifier with q216's merge application; the
      // per-language aggregate is exact integer sums + one
      // lattice-rounded division.
      val docs = docsBase(s, dir)
      val scored = docs.select(col("doc_id"),
        TextAnalysis.languageId(col("text")).as("lang_pred"))
      val bpe = TextAnalysis.bpeApply(docs, "doc_id", "text", bpeMerges)
        .withColumnRenamed("id", "doc_id")
      scored.join(bpe, "doc_id")
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("n_tokens")).as("sum_tokens"))
        .withColumn("chars_per_token",
          r(col("sum_chars").cast("double") /
            nullif(col("sum_tokens"), lit(0L)).cast("double"), 6))
        .orderBy("lang_pred")
    }),


    // ----- accent-fold + casefold canonical dedup keys ---------------
    "q217_fold_key" -> ((s, dir) => {
      // the canonicalization tier ABOVE exact dedup (q24) and NFC
      // normalization (q171): "Café", "CAFE", and decomposed "Cafe" +
      // combining acute are the same document for dedup purposes. The
      // fixture doubles the corpus with per-doc accented/uppercased
      // variants (composed é/á substitutions + an uppercased head;
      // decomposed combining marks are pinned by AccentFold's spec);
      // folding must collapse every pair back to ONE key — engine folds
      // with the native accent_fold expression (NFD, strip marks,
      // casefold), the oracle with DuckDB's independent
      // strip_accents(lower(·)) implementation.
      val base = docsBase(s, dir)
      val variants = base.select(col("doc_id"), col("text"))
        .unionByName(base.select((col("doc_id") + 50000).as("doc_id"),
          concat(upper(substring(col("text"), 1, 8)),
            translate(substring(col("text"), 9, 1000000), "ea", "éá"))
            .as("text")))
        .unionByName(base.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            upper(col("text")).as("text")))
      variants
        .select(col("doc_id"), md5(Normalize.accentFold(col("text"))).as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("canon_id"))
        .groupBy("n_variants")
        .agg(count(lit(1)).as("n_keys"), sum(col("canon_id")).as("sum_canon"))
        .orderBy("n_variants")
    }),

  )

  val oracleSql: Map[String, String] = Map(

    // the full train+score chain re-derived: reference-slice bigram and
    // prefix counts, vocabulary V, add-one smoothing with BIGINT floor
    // division (// mirrors Spark's div), left-joined back to every doc
    "q266_lm_fluency" ->
      """WITH toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |trp AS (SELECT
        |  unnest([w[i] FOR i IN range(1, len(w))]) AS w1,
        |  unnest([w[i + 1] FOR i IN range(1, len(w))]) AS w2
        |  FROM toks WHERE doc_id % 3 = 0 AND len(w) >= 2),
        |bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        |  FROM trp GROUP BY 1, 2),
        |pre AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bg GROUP BY 1),
        |voc AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM
        |  (SELECT unnest(w) AS t FROM toks WHERE doc_id % 3 = 0)
        |  WHERE t <> ''),
        |dp AS (SELECT doc_id,
        |  unnest([w[i] FOR i IN range(1, len(w))]) AS w1,
        |  unnest([w[i + 1] FOR i IN range(1, len(w))]) AS w2
        |  FROM toks WHERE len(w) >= 2),
        |j AS (SELECT doc_id, COALESCE(bg.c12, 0) AS c12,
        |  COALESCE(pre.c1, 0) AS c1
        |  FROM dp LEFT JOIN bg USING (w1, w2) LEFT JOIN pre USING (w1)),
        |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN c12 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oov,
        |  CAST(SUM((1000000 * (c12 + 1)) // (c1 + (SELECT v FROM voc)))
        |    AS BIGINT) AS fluency
        |  FROM j GROUP BY 1)
        |SELECT d.doc_id, COALESCE(n_pairs, 0) AS n_pairs,
        |  COALESCE(oov, 0) AS oov, COALESCE(fluency, 0) AS fluency
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,


    "q173_bigram_surprise" ->
      """WITH toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |bi AS (SELECT doc_id,
        |  unnest([w[i] FOR i IN range(1, len(w))]) AS w1,
        |  unnest([w[i + 1] FOR i IN range(1, len(w))]) AS w2
        |  FROM toks WHERE len(w) >= 2),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |ty AS (SELECT c2.w1, c2.w2,
        |  CASE WHEN c1.c1 > 32 * c2.c2 THEN 1 ELSE 0 END AS sur
        |  FROM c2 JOIN c1 ON c2.w1 = c1.w1),
        |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(sur) AS BIGINT) AS n_surprising
        |  FROM bi JOIN ty ON bi.w1 = ty.w1 AND bi.w2 = ty.w2 GROUP BY 1)
        |SELECT doc_id, n_bigrams, n_surprising,
        |  floor(CAST(n_surprising AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS surprise_rate
        |FROM sc ORDER BY doc_id""".stripMargin,


    "q171_unicode_nfc" -> (diacriticsCte +
      """
        |SELECT doc_id,
        |  CAST(length(text2) - length(nfc_normalize(text2)) AS BIGINT) AS chars_composed,
        |  right(nfc_normalize(text2), 16) AS norm_tail
        |FROM dia
        |WHERE text2 != nfc_normalize(text2)
        |ORDER BY doc_id""".stripMargin),

    "q21_text_stats" ->
      """WITH t AS (SELECT doc_id, text,
        |  regexp_replace(trim(text), '\s+', ' ', 'g') AS norm FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_calc,
        |  CAST(CASE WHEN norm = '' THEN 0
        |       ELSE length(norm) - length(replace(norm, ' ', '')) + 1 END AS BIGINT) AS n_tokens,
        |  CAST(floor((length(regexp_replace(text, '\s+', '', 'g')) + 3) / 4) AS BIGINT) AS n_subwords
        |FROM t ORDER BY doc_id""".stripMargin,


    "q22_text_quality" -> {
      val stopRe = "\\b(" + TextAnalysis.EnglishStopwords.mkString("|") + ")\\b"
      s"""WITH t AS (SELECT doc_id,
         |  CAST(length(text) AS DOUBLE) AS n,
         |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha,
         |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
         |  CAST(CASE WHEN regexp_replace(trim(text), '\\s+', ' ', 'g') = '' THEN 0
         |       ELSE length(regexp_replace(trim(text), '\\s+', ' ', 'g')) -
         |            length(replace(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ', '')) + 1
         |       END AS DOUBLE) AS toks,
         |  CAST(len(regexp_extract_all(lower(text), '$stopRe', 0)) AS DOUBLE) AS stop
         |FROM documents)
         |SELECT doc_id,
         |  floor(alpha / greatest(n, 1.0) * 10000 + 0.5) / 10000 AS alpha_ratio,
         |  floor(punct / greatest(n, 1.0) * 10000 + 0.5) / 10000 AS punct_ratio,
         |  floor(stop / greatest(toks, 1.0) * 10000 + 0.5) / 10000 AS stopword_ratio,
         |  floor(alpha / greatest(toks, 1.0) * 10000 + 0.5) / 10000 AS mean_token_len
         |FROM t ORDER BY doc_id""".stripMargin
    },


    "q23_lang_id" -> {
      val scores = langScores.map { case (l, e) => s"  CAST($e AS BIGINT) AS s_$l" }
        .mkString(",\n")
      val best = "greatest(" + langScores.map("s_" + _._1).mkString(", ") + ")"
      val chain = langScores.map(_._1).sorted.reverse
        .map(l => s"WHEN s_$l = best THEN '$l'").mkString("\n       ")
      s"""WITH t AS (SELECT doc_id,\n$scores\nFROM documents),
         |b AS (SELECT doc_id, *, $best AS best FROM t)
         |SELECT doc_id,
         |  CASE WHEN best = 0 THEN 'und'
         |       $chain
         |       END AS lang_pred
         |FROM b ORDER BY doc_id""".stripMargin
    },


    // the dominant pick mirrors the struct-max order: n DESC, lang DESC
    "q237_source_purity" ->
      """WITH cells AS (SELECT source, lang, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |ranked AS (SELECT source, lang, n,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY n DESC, lang DESC) AS rk,
        |  sum(n) OVER (PARTITION BY source) AS n_docs,
        |  count(*) OVER (PARTITION BY source) AS n_langs
        |  FROM cells)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_langs AS BIGINT) AS n_langs,
        |  lang AS dominant_lang,
        |  CAST((n * 1000000) // n_docs AS BIGINT) AS purity_ppm
        |FROM ranked WHERE rk = 1 ORDER BY source""".stripMargin,

    "q235_lang_confusion" -> {
      val scores = langScores.map { case (l, e) => s"  CAST($e AS BIGINT) AS s_$l" }
        .mkString(",\n")
      val best = "greatest(" + langScores.map("s_" + _._1).mkString(", ") + ")"
      val chain = langScores.map(_._1).sorted.reverse
        .map(l => s"WHEN s_$l = best THEN '$l'").mkString("\n       ")
      s"""WITH t AS (SELECT doc_id, lang,\n$scores\nFROM documents),
         |b AS (SELECT doc_id, lang, *, $best AS best FROM t),
         |p AS (SELECT lang,
         |  CASE WHEN best = 0 THEN 'und'
         |       $chain
         |       END AS lang_pred
         |  FROM b),
         |n AS (SELECT count(*) AS total FROM documents)
         |SELECT lang, lang_pred, count(*) AS n_docs,
         |  CAST((count(*) * 1000000) // (SELECT total FROM n) AS BIGINT)
         |    AS share
         |FROM p GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin
    },

    "q24_dedup_exact" -> (exactDupCte +
      """
        |SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS group_size
        |FROM corpus GROUP BY 1 ORDER BY fp""".stripMargin),


    "q25_minhash_neardup" -> (minhashPairsCtes +
      """
        |SELECT id_a, id_b, floor(j * 10000 + 0.5) / 10000 AS jaccard
        |FROM pairs WHERE j >= 0.6 ORDER BY id_a, id_b""".stripMargin),


    "q26_simhash_neardup" -> (nearDupCte +
      """,
        |th AS (SELECT doc_id, list(CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)) AS hs
        |  FROM (SELECT doc_id,
        |        unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |        FROM corpus)
        |  GROUP BY doc_id),
        |sh AS (SELECT doc_id,
        |  list_sum([CASE WHEN list_sum([((h >> i) & 1) * 2 - 1 FOR h IN hs]) >= 0
        |            THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END
        |            FOR i IN range(0, 60)]) AS sh
        |  FROM th),
        |quarters AS (SELECT doc_id, sh, q, (sh >> (q * 16)) & 65535 AS qkey
        |  FROM sh, range(0, 4) t(q)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sha, b.sh AS shb
        |  FROM quarters a JOIN quarters b
        |    ON a.q = b.q AND a.qkey = b.qkey AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(sha, shb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sha, shb)) <= 12 ORDER BY id_a, id_b""".stripMargin),


    "q46_token_freq" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,


    "q47_tfidf_terms" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
        |  WHERE term != '' GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
        |scored AS (SELECT doc_id, term,
        |  (CAST(tf AS DOUBLE) * CAST(nd + 1 AS DOUBLE)) / CAST(df + 1 AS DOUBLE) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, score,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        |  FROM scored)
        |SELECT doc_id, term, rnk, floor(score * 1000000 + 0.5) / 1000000 AS score
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,


    "q48_shingle_novelty" -> (nearDupCte +
      """,
        |toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM corpus),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
        |  END AS sh FROM toks),
        |hp AS (SELECT DISTINCT doc_id,
        |  CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
        |dfreq AS (SELECT h, COUNT(*) AS df FROM hp GROUP BY h)
        |SELECT doc_id, COUNT(*) AS n_shingles,
        |  floor(SUM(CASE WHEN df > 1 THEN 1.0 ELSE 0.0 END) /
        |    CAST(COUNT(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS dup_frac
        |FROM hp JOIN dfreq USING (h) GROUP BY doc_id ORDER BY doc_id""".stripMargin),


    "q121_duplicate_spans" -> (nearDupCte +
      """,
        |toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM corpus),
        |wins AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS start,
        |  md5(array_to_string(w[i:i+2], ' ')) AS h
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3)),
        |dup AS (SELECT doc_id, start, start + 3 AS fin FROM
        |  (SELECT doc_id, start, COUNT(*) OVER (PARTITION BY h) AS cnt FROM wins)
        |  WHERE cnt > 1),
        |isl AS (SELECT doc_id, start, fin,
        |  CASE WHEN max(fin) OVER (PARTITION BY doc_id ORDER BY start
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |       OR start > max(fin) OVER (PARTITION BY doc_id ORDER BY start
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |       THEN 1 ELSE 0 END AS newi
        |  FROM dup),
        |isl2 AS (SELECT doc_id, start, fin,
        |  SUM(newi) OVER (PARTITION BY doc_id ORDER BY start) AS island FROM isl)
        |SELECT doc_id, MIN(start) AS span_start, MAX(fin) AS span_end,
        |  COUNT(*) AS n_windows
        |FROM isl2 GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin),


    "q137_cluster_terms" ->
      """WITH toks AS (SELECT doc_id, source, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |nn AS (SELECT COUNT(*) AS n FROM documents),
        |ctf AS (SELECT source, term, COUNT(*) AS ctf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT term, COUNT(*) AS df
        |  FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
        |sc AS (SELECT source, c.term,
        |  CAST(floor(CAST(ctf AS DOUBLE) *
        |    ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |     (CAST(df AS DOUBLE) + 0.5)) * 1000000.0 + 0.5) AS BIGINT) AS ms
        |  FROM ctf c JOIN dfq d ON c.term = d.term CROSS JOIN nn),
        |rk AS (SELECT source, term, ms,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY ms DESC, term ASC) AS rank FROM sc)
        |SELECT source, CAST(rank AS BIGINT) AS rank, term,
        |  CAST(ms AS DOUBLE) / 1000000.0 AS score
        |FROM rk WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    "q141_lexical_diversity" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
        |  FROM documents),
        |tc AS (SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |agg AS (SELECT doc_id, SUM(c) AS n, SUM(c * c) AS ss FROM tc GROUP BY 1)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  floor((1.0 - CAST(ss AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) * 1000000 + 0.5)
        |    / 1000000 AS diversity
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q139_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a, customer b
        |WHERE a.c_custkey < b.c_custkey
        |  AND a.c_custkey <= 500 AND b.c_custkey <= 500
        |  AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "q128_prefix_filter_join" -> (nearDupCte +
      """,
        |tk AS (SELECT DISTINCT doc_id,
        |  CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |  FROM corpus)),
        |dfq AS (SELECT h, COUNT(*) AS df FROM tk GROUP BY 1),
        |ord AS (SELECT doc_id, list(h ORDER BY df, h) AS toks,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tk JOIN dfq USING (h) GROUP BY doc_id),
        |pfx AS (SELECT doc_id, n,
        |  unnest(toks[1 : CAST(n - CAST(ceil(0.6 * CAST(n AS DOUBLE)) AS BIGINT)
        |    + 1 AS INTEGER)]) AS h
        |  FROM ord),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM pfx a JOIN pfx b ON a.h = b.h AND a.doc_id < b.doc_id
        |   AND CAST(b.n AS DOUBLE) >= 0.6 * CAST(a.n AS DOUBLE)
        |   AND CAST(a.n AS DOUBLE) >= 0.6 * CAST(b.n AS DOUBLE)),
        |v AS (SELECT id_a, id_b,
        |  CAST(len(list_filter(x.toks, t -> list_contains(y.toks, t))) AS DOUBLE) /
        |  CAST(x.n + y.n -
        |    len(list_filter(x.toks, t -> list_contains(y.toks, t))) AS DOUBLE) AS j
        |  FROM cand JOIN ord x ON x.doc_id = cand.id_a
        |  JOIN ord y ON y.doc_id = cand.id_b)
        |SELECT id_a, id_b, floor(j * 10000 + 0.5) / 10000 AS jaccard
        |FROM v WHERE j >= 0.6 ORDER BY id_a, id_b""".stripMargin),


    "q50_incremental_neardup" ->
      """WITH tagged AS (
        |  SELECT 'c' AS side, doc_id, text FROM documents
        |  UNION ALL
        |  SELECT 'n', doc_id + 10000, substr(text, strpos(text, ' ') + 1)
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT 'n', doc_id + 20000, text FROM documents WHERE doc_id % 13 = 0),
        |toks AS (SELECT side, doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM tagged),
        |sh AS (SELECT side, doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
        |  END AS sh FROM toks),
        |sig AS (SELECT side, doc_id, sh,
        |  [CAST(list_min([CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '#' || s), 1, 15)) AS BIGINT)
        |                  FOR s IN sh]) AS VARCHAR) FOR j IN range(0, 16)] AS sg
        |  FROM sh),
        |bands AS (SELECT side, doc_id, b,
        |  md5(array_to_string(sg[b*2+1:b*2+2], '|')) AS band_key
        |  FROM sig, range(0, 8) t(b)),
        |cand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
        |  FROM bands n JOIN bands c ON n.b = c.b AND n.band_key = c.band_key
        |  WHERE n.side = 'n' AND c.side = 'c'),
        |hsh AS (SELECT side, doc_id,
        |  list_distinct([CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) FOR s IN sh]) AS hs
        |  FROM sh),
        |pairs AS (SELECT new_id, corpus_id,
        |  CAST(len(list_intersect(n.hs, c.hs)) AS DOUBLE) /
        |  CAST(len(list_distinct(list_concat(n.hs, c.hs))) AS DOUBLE) AS j
        |  FROM cand
        |  JOIN hsh n ON n.side = 'n' AND n.doc_id = cand.new_id
        |  JOIN hsh c ON c.side = 'c' AND c.doc_id = cand.corpus_id)
        |SELECT new_id, corpus_id, floor(j * 10000 + 0.5) / 10000 AS jaccard
        |FROM pairs WHERE j >= 0.6 ORDER BY new_id, corpus_id""".stripMargin,


    "q53_repetition" ->
      """WITH toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
        |  END AS sh FROM toks),
        |grams AS (SELECT doc_id, g, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(sh) AS g FROM sh) GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ngrams,
        |  floor(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS top_frac
        |FROM grams GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "q199_provenance" -> (piiCte +
      s""",
         |st AS (SELECT doc_id, text AS t0,
         |  regexp_replace(text, '${graft.operators.TextAnalysis.EmailRe}', '<EMAIL>', 'g') AS t1
         |  FROM pii),
         |st2 AS (SELECT doc_id, t0, t1,
         |  regexp_replace(t1, '${graft.operators.TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS t2
         |  FROM st),
         |st3 AS (SELECT doc_id, t0, t1, t2, substr(t2, 1, 300) AS t3 FROM st2),
         |m AS (SELECT doc_id,
         |  (CASE WHEN t1 != t0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN t2 != t1 THEN 2 ELSE 0 END)
         |  + (CASE WHEN t3 != t2 THEN 4 ELSE 0 END) AS mask FROM st3)
         |SELECT CAST(mask AS BIGINT) AS mask, count(*) AS n_docs,
         |  min(doc_id) AS min_doc_id
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin),

    "q58_pii_redact" -> (piiCte +
      s"""
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(text, '${graft.operators.TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |      '${graft.operators.TextAnalysis.PhoneRe}', '<PHONE>', 'g')) AS redacted_fp
         |FROM pii ORDER BY doc_id""".stripMargin),


    "q59_url_domains" -> (urlCte +
      s""",
         |d AS (SELECT doc_id,
         |        unnest(regexp_extract_all(text, '${graft.operators.TextAnalysis.UrlRe}', 1)) AS domain
         |      FROM u)
         |SELECT domain, count(*) AS n_mentions, count(DISTINCT doc_id) AS n_docs
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin),


    "q60_length_histogram" ->
      """SELECT CAST(least(floor(n_chars / 100.0), 19) AS BIGINT) AS bin,
        |  count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,


    "q61_source_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin,


    "q62_clean_pipeline" -> {
      val scores = langScores.map { case (l, e) => s"    CAST($e AS BIGINT) AS s_$l" }
        .mkString(",\n")
      val best = "greatest(" + langScores.map("s_" + _._1).mkString(", ") + ")"
      val chain = langScores.map(_._1).sorted.reverse
        .map(l => s"WHEN s_$l = best THEN '$l'").mkString("\n            ")
      val redacted =
        s"regexp_replace(regexp_replace(text, '${graft.operators.TextAnalysis.EmailRe}', '<EMAIL>', 'g'), " +
          s"'${graft.operators.TextAnalysis.PhoneRe}', '<PHONE>', 'g')"
      piiCte + s""",
        |raw AS (SELECT doc_id, text FROM pii
        |        UNION ALL
        |        SELECT doc_id + 10000, text FROM pii WHERE doc_id % 5 = 0),
        |sc AS (SELECT doc_id, text,
        |$scores
        |  FROM raw),
        |b AS (SELECT *, $best AS best FROM sc),
        |lng AS (SELECT doc_id, text,
        |    CASE WHEN best = 0 THEN 'und'
        |            $chain
        |            END AS lang_pred FROM b),
        |gated AS (SELECT doc_id, text,
        |    regexp_replace(trim(text), '\\s+', ' ', 'g') AS norm
        |  FROM lng WHERE lang_pred = 'en'),
        |qual AS (SELECT doc_id, text,
        |    CAST(CASE WHEN norm = '' THEN 0
        |         ELSE length(norm) - length(replace(norm, ' ', '')) + 1 END AS BIGINT) AS n_toks,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) /
        |      greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio
        |  FROM gated),
        |red AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim($redacted)), '\\s+', ' ', 'g')) AS fp
        |  FROM qual WHERE n_toks >= 30 AND alpha_ratio > 0.55)
        |SELECT min(doc_id) AS doc_id, fp, count(*) AS n_copies
        |FROM red GROUP BY fp ORDER BY doc_id""".stripMargin
    },


    "q64_contamination" -> {
      val shingle =
        """CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
          |     ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
          |     END""".stripMargin
      s"""WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
         |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
         |       UNION ALL
         |       SELECT doc_id + 30000, substr(text, strpos(text, ' ') + 1)
         |       FROM documents WHERE doc_id % 10 = 0),
         |tw AS (SELECT string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w FROM train),
         |tsh AS (SELECT DISTINCT CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
         |        FROM (SELECT unnest($shingle) AS s FROM tw)),
         |ew AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w FROM ev),
         |esh AS (SELECT DISTINCT doc_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
         |        FROM (SELECT doc_id, unnest($shingle) AS s FROM ew))
         |SELECT esh.doc_id AS doc_id, count(*) AS n_shingles,
         |  floor(CAST(sum(CASE WHEN tsh.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
         |        CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS contaminated_frac
         |FROM esh LEFT JOIN tsh ON esh.h = tsh.h
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },


    "q65_chunking" ->
      """WITH t AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |c AS (SELECT doc_id, len(w) AS n, w,
        |        unnest([i FOR i IN range(0, greatest(len(w), 1)) IF i % 10 = 0]) AS st
        |      FROM t)
        |SELECT doc_id, CAST(st // 10 AS BIGINT) AS chunk_id,
        |  CAST(least(40, n - st) AS BIGINT) AS n_toks,
        |  md5(array_to_string(w[st+1:st+40], ' ')) AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,


    "q151_cdc_chunks" ->
      """WITH toks AS (SELECT doc_id, source, tok, pos FROM (
        |  SELECT doc_id, source,
        |    unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok,
        |    generate_subscripts(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), 1) AS pos
        |  FROM documents)
        |  WHERE len(tok) > 0),
        |b AS (SELECT doc_id, source, tok, pos,
        |  CASE WHEN CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 16 = 0
        |       THEN 1 ELSE 0 END AS bd FROM toks),
        |c AS (SELECT doc_id, source, tok, pos,
        |  sum(bd) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bd AS chunk_idx
        |  FROM b),
        |ch AS (SELECT doc_id, source, chunk_idx,
        |  CAST(('0x' || substr(md5(string_agg(tok, ' ' ORDER BY pos)), 1, 15))
        |    AS BIGINT) AS chunk_hash
        |  FROM c GROUP BY 1, 2, 3)
        |SELECT source, count(*) AS n_chunks,
        |  count(DISTINCT chunk_hash) AS n_distinct,
        |  floor(CAST(count(*) - count(DISTINCT chunk_hash) AS DOUBLE)
        |    / count(*) * 10000 + 0.5) / 10000 AS dup_ratio
        |FROM ch GROUP BY 1 ORDER BY source""".stripMargin,


    "q153_markup_strip" -> (htmlCte + s""",
        |x AS (SELECT source, html,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |        '${TextAnalysis.ScriptRe}', ' ', 'g'),
        |        '${TextAnalysis.StyleRe}', ' ', 'g'),
        |        '${TextAnalysis.CommentRe}', ' ', 'g'),
        |        '${TextAnalysis.TagRe}', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&nbsp;', ' '), '&amp;', '&'),
        |    '\\s+', ' ', 'g')) AS text FROM h)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(text)) AS BIGINT) AS total_chars,
        |  floor(CAST(sum(len(html) - len(text)) AS DOUBLE)
        |    / CAST(sum(len(html)) AS DOUBLE) * 10000 + 0.5) / 10000 AS markup_ratio,
        |  CAST(sum(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
        |    % 1000000000) AS BIGINT) AS fp_sum
        |FROM x GROUP BY 1 ORDER BY source""".stripMargin),


    "q77_boilerplate_lines" ->
      """WITH d AS (SELECT doc_id, translate(text, ' ', chr(10)) AS text
        |  FROM documents),
        |lines AS (SELECT doc_id,
        |  unnest([{'pos': i - 1, 'line': sp[i]} FOR i IN range(1, len(sp) + 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS sp FROM d)),
        |boiler AS (SELECT trim(s.line) AS key FROM lines
        |  WHERE trim(s.line) <> '' GROUP BY 1
        |  HAVING count(DISTINCT doc_id) > 50),
        |j AS (SELECT l.doc_id, l.s.pos AS pos, l.s.line AS line,
        |  (b.key IS NOT NULL) AS dropped
        |  FROM lines l LEFT JOIN boiler b ON trim(l.s.line) = b.key)
        |SELECT doc_id,
        |  coalesce(array_to_string(list(line ORDER BY pos)
        |    FILTER (WHERE NOT dropped), chr(10)), '') AS clean_text,
        |  CAST(count(*) FILTER (WHERE NOT dropped) AS BIGINT) AS n_lines_kept,
        |  CAST(count(*) FILTER (WHERE dropped) AS BIGINT) AS n_lines_dropped
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "q81_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id, translate(text, ' ', chr(10)) AS text
        |  FROM documents),
        |paras AS (SELECT doc_id,
        |  unnest([{'pos': i - 1, 'para': sp[i]} FOR i IN range(1, len(sp) + 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS sp FROM d)),
        |firsts AS (SELECT key, doc_id AS fid, pos AS fpos FROM (
        |  SELECT trim(s.para) AS key, doc_id, s.pos AS pos,
        |    row_number() OVER (PARTITION BY trim(s.para)
        |      ORDER BY doc_id, s.pos) AS rn
        |  FROM paras WHERE trim(s.para) <> '') WHERE rn = 1),
        |j AS (SELECT p.doc_id, p.s.pos AS pos, p.s.para AS para,
        |  (trim(p.s.para) = '' OR (p.doc_id = f.fid AND p.s.pos = f.fpos)) AS keep
        |  FROM paras p LEFT JOIN firsts f ON trim(p.s.para) = f.key)
        |SELECT doc_id,
        |  coalesce(array_to_string(list(para ORDER BY pos)
        |    FILTER (WHERE keep), chr(10)), '') AS dedup_text,
        |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_paras_kept,
        |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_paras_dropped
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "q83_bm25" -> bm25OracleSql,



    "q85_vocab_coverage" ->
      """WITH toks AS (SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |freq AS (SELECT term, COUNT(*) AS n FROM toks
        |  WHERE term != '' GROUP BY 1),
        |tot AS (SELECT CAST(SUM(CASE WHEN norm = '' THEN 0
        |    ELSE length(norm) - length(replace(norm, ' ', '')) + 1 END)
        |    AS BIGINT) AS t
        |  FROM (SELECT regexp_replace(trim(text), '\s+', ' ', 'g') AS norm
        |        FROM documents)),
        |top AS (SELECT term, n FROM freq ORDER BY n DESC, term LIMIT 20),
        |rk AS (SELECT term, n,
        |  row_number() OVER (ORDER BY n DESC, term) AS rnk FROM top)
        |SELECT term, n, rnk,
        |  CAST(SUM(n) OVER (ORDER BY rnk) AS DOUBLE) / CAST(t AS DOUBLE)
        |    AS coverage
        |FROM rk CROSS JOIN tot ORDER BY rnk""".stripMargin,


    "q86_rare_tokens" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |ft AS (SELECT doc_id, term FROM toks WHERE term != ''),
        |freq AS (SELECT term, COUNT(*) AS cf FROM ft GROUP BY 1),
        |rare AS (SELECT term FROM freq WHERE cf <= 100),
        |pd AS (SELECT f.doc_id, COUNT(*) AS n_tokens,
        |    CAST(SUM(CASE WHEN r.term IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_rare
        |  FROM ft f LEFT JOIN rare r ON f.term = r.term GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(pd.n_rare, 0) AS BIGINT) AS n_rare,
        |  CASE WHEN COALESCE(pd.n_tokens, 0) > 0
        |       THEN CAST(pd.n_rare AS DOUBLE) / CAST(pd.n_tokens AS DOUBLE)
        |  END AS rare_ratio
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,


    "q87_containment" -> (nearDupCte +
      """,
        |toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM corpus),
        |shl AS (SELECT doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
        |  END AS sh FROM toks),
        |hs AS (SELECT DISTINCT doc_id,
        |  CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(sh) AS s FROM shl)),
        |hot AS (SELECT h FROM hs GROUP BY h HAVING COUNT(*) > 100),
        |cool AS (SELECT hs.doc_id, hs.h FROM hs
        |  LEFT JOIN hot ON hs.h = hot.h WHERE hot.h IS NULL),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM cool GROUP BY 1),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        |  FROM cool a JOIN cool b ON a.h = b.h AND a.doc_id != b.doc_id
        |  GROUP BY 1, 2),
        |sc AS (SELECT id_a, id_b, shared, n AS n_a,
        |  floor(CAST(shared AS DOUBLE) / CAST(n AS DOUBLE) * 10000 + 0.5) / 10000
        |    AS containment
        |  FROM shared JOIN sizes ON sizes.doc_id = shared.id_a)
        |SELECT id_a, id_b, shared, n_a, containment FROM sc
        |WHERE containment >= 0.5 ORDER BY id_a, id_b""".stripMargin),


    "q90_url_canonical" ->
      """WITH urls AS (SELECT doc_id,
        |  'HTTPS://Site' || CAST(doc_id % 5 AS VARCHAR) ||
        |  '.Example.COM/Path' || CAST(doc_id % 4 AS VARCHAR) ||
        |  CASE CAST(doc_id % 3 AS INTEGER)
        |    WHEN 0 THEN '/?utm_source=x&page=' || CAST(doc_id % 2 AS VARCHAR)
        |    WHEN 1 THEN '?utm_campaign=y'
        |    ELSE '/' END ||
        |  CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |c1 AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS u FROM urls),
        |c2a AS (SELECT doc_id,
        |  regexp_replace(u, '&(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*', '', 'g') AS u
        |  FROM c1),
        |c2b AS (SELECT doc_id,
        |  regexp_replace(u, '\?(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*&', '?', 'g') AS u
        |  FROM c2a),
        |c2 AS (SELECT doc_id,
        |  regexp_replace(u, '\?(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*$', '', 'g') AS u
        |  FROM c2b),
        |c3 AS (SELECT doc_id, regexp_replace(u, '[?&]+$', '', 'g') AS u FROM c2),
        |c4 AS (SELECT doc_id, u,
        |  regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0) AS auth
        |  FROM c3),
        |c5 AS (SELECT doc_id,
        |  lower(auth) || substr(u, strlen(auth) + 1, strlen(u)) AS u FROM c4),
        |c6 AS (SELECT doc_id, regexp_replace(u, '/+$', '', 'g') AS canon FROM c5)
        |SELECT canon, COUNT(*) AS n, min(doc_id) AS first_doc
        |FROM c6 GROUP BY 1 ORDER BY 1""".stripMargin,


    "q93_inverted_index" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents)
        |SELECT term, doc_id, COUNT(*) AS tf FROM toks
        |WHERE term IN ('dup', 'vector', 'spark')
        |GROUP BY 1, 2 ORDER BY term, doc_id""".stripMargin,


    // identical from-scratch SQL: the indexed path must reproduce the
    // scan path's ranking bit-for-bit
    "q94_bm25_indexed" -> bm25OracleSql,


    "q95_bigram_merges" ->
      """WITH toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |sh AS (SELECT CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
        |       END AS sh FROM toks),
        |pairs AS (SELECT unnest(sh) AS pair FROM sh)
        |SELECT pair, COUNT(*) AS n FROM pairs
        |WHERE len(string_split(pair, ' ')) = 2
        |GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin,


    "q97_corpus_diversity" -> (nearDupCte +
      """,
        |toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM corpus),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
        |  END AS sh FROM toks),
        |sig AS (SELECT doc_id,
        |  [CAST(list_min([CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '#' || s), 1, 15)) AS BIGINT)
        |                  FOR s IN sh]) AS VARCHAR) FOR j IN range(0, 16)] AS sg
        |  FROM sh),
        |lanes AS (SELECT j, sg[j + 1] AS v FROM sig, range(0, 16) t(j)),
        |counts AS (SELECT j, v, COUNT(*) AS c FROM lanes GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(c * (c - 1)) AS DECIMAL(38,0)) AS collisions FROM counts),
        |nn AS (SELECT COUNT(*) AS n FROM corpus)
        |SELECT n AS n_docs, 16 AS n_lanes, CAST(collisions AS BIGINT) AS collisions,
        |  CAST(collisions AS DOUBLE) /
        |    (16.0 * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS mean_jaccard_est
        |FROM tot CROSS JOIN nn""".stripMargin),


    // and so must the incrementally-appended index
    "q98_bm25_incremental" -> bm25OracleSql,


    "q99_corpus_report" ->
      """WITH t AS (SELECT doc_id, source, text,
        |  CAST(length(text) AS DOUBLE) AS n,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha
        |  FROM documents),
        |base AS (SELECT doc_id, source,
        |  floor(alpha / greatest(n, 1.0) * 10000 + 0.5) / 10000 AS alpha_ratio,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM t),
        |fpc AS (SELECT fp, COUNT(*) AS cnt FROM base GROUP BY 1),
        |toks AS (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |ft AS (SELECT doc_id, term FROM toks WHERE term != ''),
        |freq AS (SELECT term, COUNT(*) AS cf FROM ft GROUP BY 1),
        |rarew AS (SELECT term FROM freq WHERE cf <= 100),
        |pd AS (SELECT f.doc_id, COUNT(*) AS n_tokens,
        |    CAST(SUM(CASE WHEN r.term IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_rare
        |  FROM ft f LEFT JOIN rarew r ON f.term = r.term GROUP BY 1),
        |rr AS (SELECT doc_id,
        |  floor(CAST(n_rare AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS rr
        |  FROM pd WHERE n_tokens > 0)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
        |  CAST(SUM(CAST(alpha_ratio AS DECIMAL(18,4))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS mean_alpha_ratio,
        |  CASE WHEN SUM(CASE WHEN rr IS NOT NULL THEN 1 ELSE 0 END) > 0
        |       THEN CAST(SUM(CAST(rr AS DECIMAL(28,6))) AS DOUBLE) /
        |         CAST(SUM(CASE WHEN rr IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |  END AS mean_rare_ratio
        |FROM base JOIN fpc USING (fp) LEFT JOIN rr USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the merge chain is GENERATED from the same bpeMerges table the
    // engine ships as plan literals — one source of truth for the
    // tokenizer artifact on both sides of the gate
    // q23's classifier chain joined with q216's merge chain, aggregated
    // per predicted language — integer sums, one lattice-rounded divide
    "q243_tokenizer_fertility" -> {
      val scores = langScores.map { case (l, e) => s"  CAST($e AS BIGINT) AS s_$l" }
        .mkString(",\n")
      val best = "greatest(" + langScores.map("s_" + _._1).mkString(", ") + ")"
      val chain = langScores.map(_._1).sorted.reverse
        .map(l => s"WHEN s_$l = best THEN '$l'").mkString("\n       ")
      val applied = bpeMerges.foldLeft("s") { case (acc, (l, r)) =>
        s"replace($acc, ' $l $r ', ' $l$r ')"
      }
      raw"""WITH t AS (SELECT doc_id,
           |$scores
           |FROM documents),
           |b AS (SELECT doc_id, *, $best AS best FROM t),
           |lang AS (SELECT doc_id,
           |  CASE WHEN best = 0 THEN 'und'
           |       $chain
           |       END AS lang_pred FROM b),
           |base AS (SELECT doc_id,
           |  trim(regexp_replace(regexp_replace(lower(text),
           |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS clean
           |  FROM documents),
           |m AS (SELECT doc_id, replace(clean, ' ', '_') AS marked FROM base),
           |cs AS (SELECT doc_id, CAST(length(marked) AS BIGINT) AS n_chars,
           |  ' ' || regexp_replace(marked, '(.)', '\1 ', 'g') AS s FROM m),
           |ap AS (SELECT doc_id, n_chars, $applied AS s2 FROM cs),
           |tok AS (SELECT doc_id, n_chars,
           |  CAST(length(s2) - length(replace(s2, ' ', '')) - 1 AS BIGINT)
           |    AS n_tokens FROM ap)
           |SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           |  floor(CAST(sum(n_chars) AS DOUBLE) /
           |    nullif(CAST(sum(n_tokens) AS DOUBLE), 0) * 1000000 + 0.5)
           |    / 1000000 AS chars_per_token
           |FROM lang JOIN tok USING (doc_id)
           |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q216_bpe_apply" -> {
      val applied = bpeMerges.foldLeft("s") { case (acc, (l, r)) =>
        s"replace($acc, ' $l $r ', ' $l$r ')"
      }
      raw"""WITH base AS (SELECT doc_id,
           |  trim(regexp_replace(regexp_replace(lower(text),
           |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS clean
           |  FROM documents),
           |m AS (SELECT doc_id, replace(clean, ' ', '_') AS marked FROM base),
           |cs AS (SELECT doc_id, CAST(length(marked) AS BIGINT) AS n_chars,
           |  ' ' || regexp_replace(marked, '(.)', '\1 ', 'g') AS s FROM m),
           |ap AS (SELECT doc_id, n_chars, $applied AS s2 FROM cs)
           |SELECT doc_id, n_chars,
           |  CAST(length(s2) - length(replace(s2, ' ', '')) - 1 AS BIGINT)
           |    AS n_tokens,
           |  CAST(n_chars AS DOUBLE) /
           |    nullif(length(s2) - length(replace(s2, ' ', '')) - 1, 0)
           |    AS chars_per_token
           |FROM ap ORDER BY doc_id""".stripMargin
    },

    // DuckDB's strip_accents(lower(·)) is an INDEPENDENT implementation
    // of the fold — agreement on every variant pair is the evidence the
    // native AccentFold expression folds correctly
    "q217_fold_key" ->
      """WITH v AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 50000 AS doc_id,
        |    upper(substr(text, 1, 8)) ||
        |      translate(substr(text, 9), 'ea', 'éá') AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, upper(text) AS text
        |  FROM documents WHERE doc_id % 3 = 0),
        |k AS (SELECT doc_id, md5(strip_accents(lower(text))) AS k FROM v),
        |g AS (SELECT k, count(*) AS n_variants, min(doc_id) AS canon_id
        |  FROM k GROUP BY k)
        |SELECT n_variants, count(*) AS n_keys,
        |  CAST(sum(canon_id) AS BIGINT) AS sum_canon
        |FROM g GROUP BY n_variants ORDER BY n_variants""".stripMargin,

  )
}
