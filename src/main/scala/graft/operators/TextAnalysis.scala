package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure Catalyst expressions — codegen'd, no UDFs, embarrassingly
  * parallel (no shuffle), so they scan at parquet speed at any scale.
  */
object TextAnalysis {

  /** Whitespace token count via pure string arithmetic (identical
    * semantics in any SQL engine, unlike split() edge cases):
    * tokens = spaces-in-normalized-text + 1, 0 for blank text. */
  def tokenCount(text: Column): Column = {
    val norm = regexp_replace(trim(text), "\\s+", " ")
    when(norm === "", lit(0L))
      .otherwise(length(norm) - length(regexp_replace(norm, " ", "")) + lit(1L))
  }

  /** BPE-ish subword count: words get ceil(chars/4) pieces — a cheap,
    * deterministic proxy for tokenizer budgeting at corpus scale. */
  def subwordCount(text: Column): Column = {
    val chars = length(regexp_replace(text, "\\s+", ""))
    floor((chars + lit(3)) / lit(4)).cast("long")
  }

  /** Quality signals: length, alpha ratio, punctuation density, stopword
    * ratio, mean token length. Composable score in [0,1]. */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val n = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val toks = tokenCount(text).cast("double")
    val stop = stopwordCount(text, EnglishStopwords).cast("double")
    Seq(
      "n_chars" -> n.cast("long"),
      "n_tokens" -> toks.cast("long"),
      "alpha_ratio" -> round(alpha / greatest(n, lit(1.0)), 4),
      "punct_ratio" -> round(punct / greatest(n, lit(1.0)), 4),
      "stopword_ratio" -> round(stop / greatest(toks, lit(1.0)), 4),
      "mean_token_len" -> round(alpha / greatest(toks, lit(1.0)), 4))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

  /** Occurrences of any listed word (word-bounded). */
  def stopwordCount(text: Column, words: Seq[String]): Column = {
    val re = words.map(java.util.regex.Pattern.quote).mkString("\\b(", "|", ")\\b")
    size(regexp_extract_all(lower(text), lit(re), lit(0))).cast("long")
  }

  /** N-gram-heuristic language ID: score marker-word hit counts per
    * language, take the argmax (deterministic tie-break on language code).
    * Markers are public high-frequency function words. */
  val LanguageMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "les", "des", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "pt" -> Seq("o", "que", "de", "da", "em"))

  def languageId(text: Column): Column = {
    val scored = LanguageMarkers.map { case (lang, words) =>
      struct(stopwordCount(text, words).as("score"), lit(lang).as("lang"))
    }
    // max over (score, lang): highest score wins; lexicographically largest
    // lang breaks ties deterministically.
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Canonical text normalization shared by all fingerprints: case-fold,
    * collapse whitespace. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Document fingerprint: 64-bit content hash over normalized text
    * (case-folded, whitespace-collapsed) — the rolling-hash family's
    * fixed-window degenerate case, exact-dup robust to formatting. */
  def fingerprint(text: Column): Column = xxhash64(normText(text))

  /** Portable document fingerprint: md5 hex of the normalized text —
    * reproducible verbatim in any SQL engine for oracle checks. */
  def md5Fingerprint(text: Column): Column = md5(normText(text))

  /** Raw k-word shingle strings (each k-token window of the normalized
    * text; a single shingle of the whole text when shorter than k). */
  def shingleStrings(text: Column, k: Int): Column = {
    val toks = split(normText(text), " ")
    val n = size(toks)
    when(n < k, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), n - lit(k)),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
  }

  /** Shingle fingerprints: xxhash64 of each k-word window (rolling hash
    * over tokens) — the near-dup building block shared with MinHash. */
  def shingles(text: Column, k: Int): Column =
    transform(shingleStrings(text, k), s => xxhash64(s))

  /** Per-doc top-k terms by TF-IDF-style weighting:
    * `score = tf * (N+1)/(df+1)` — a log-free idf ratio, chosen because
    * every op (integer mul/add, one double divide) is IEEE-exact and so
    * reproduces bit-for-bit in any SQL engine, unlike ln() whose last
    * ulp is library-specific. Two shuffles: (doc,term) then term; the
    * doc-count side is one row (broadcast); the vocabulary join is left
    * to AQE (vocabulary outgrows broadcast at corpus scale). */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs.repartition(np, col(idCol))
      .select(col(idCol).as("id"),
        explode(split(normText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // doc count as a plan-time literal: the scan prunes to the id column
    // and (nd+1) constant-folds; a crossJoin(broadcast(...)) carried the
    // same scan as an extra plan branch on every downstream use
    val nd = docs.select(countDistinct(col(idCol)).as("nd")).head().getLong(0)
    val scored = tf.join(dfreq, "term")
      .withColumn("score",
        (col("tf").cast("double") * lit((nd + 1).toDouble)) /
          (col("df") + 1).cast("double"))
    val w = Window.partitionBy(col("id")).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("id"), col("term"), col("rnk"),
        (floor(col("score") * 1000000 + 0.5) / 1000000).as("score"))
  }

  /** Cross-doc n-gram novelty: per doc, the fraction of its DISTINCT
    * k-shingles that also occur in at least one other doc — the
    * duplication/contamination fraction used to gate training corpora
    * (a doc of entirely-shared shingles is boilerplate or a near-dup).
    * Shingle identities are the portable 60-bit md5 prefixes, so a SQL
    * oracle recomputes the exact same sets. Shape: one explode + distinct,
    * one df-count shuffle on the hash, one per-doc aggregation —
    * everything partial-aggregated, no self-join, no pair expansion. */
  def shingleNovelty(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val pairs = docs.repartition(np, col(idCol))
      .select(col(idCol).as("id"),
        explode(shingleStrings(col(textCol), k)).as("_s"))
      .select(col("id"), graft.functions.Checksums.md5PrefixLong(col("_s")).as("h"))
      .distinct()
    // single lineage: attach df as a window count over the hash — a join
    // of `pairs` against a separate df-count aggregate would recompute the
    // whole explode+distinct pipeline once per consumer, and a
    // collect_list-per-hash regroup would build one giant row for any
    // corpus-wide boilerplate shingle
    pairs
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        // sum of 0/1 doubles is order-exact; the divide is one rounded op
        (floor(sum(when(col("df") > 1, 1.0).otherwise(0.0)) /
          count(lit(1)).cast("double") * 1000000 + 0.5) / 1000000).as("dup_frac"))
  }

  /** N-gram repetition ratio — the published quality-filter rule family
    * (fraction of a doc's n-grams accounted for by its single most
    * frequent n-gram; high values mark looping/boilerplate text). One
    * explode + two partial-aggregated groupBys on uniform keys; the ratio
    * is an integer-valued double division, so any SQL engine reproduces
    * it bit-for-bit. */
  def repetitionRatio(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val np = docs.sparkSession.sparkContext.defaultParallelism
    docs.repartition(np, col(idCol))
      .select(col(idCol).as("id"),
        explode(shingleStrings(col(textCol), n)).as("_g"))
      .groupBy(col("id"), col("_g")).agg(count(lit(1)).as("_c"))
      .groupBy(col("id"))
      .agg(sum(col("_c")).as("n_ngrams"),
        (floor(max(col("_c")).cast("double") / sum(col("_c")).cast("double")
          * 1000000 + 0.5) / 1000000).as("top_frac"))
  }

  /** Simpson lexical diversity per doc — Gini impurity of the token
    * distribution, `1 - sum((cnt/total)^2)`: 0 for a one-token loop,
    * →1 for all-distinct text. The standard log-free stand-in for
    * token entropy in quality filtering (entropy needs ln, whose last
    * ulp is libm-specific and breaks cross-engine hashing; Simpson
    * ranks concentration the same way with only exact ops).
    * Complements [[repetitionRatio]], which sees only the modal n-gram:
    * a doc cycling ten phrases evenly has a low top_frac but still low
    * diversity here.
    *
    * Shape: one explode + two partial-aggregated groupBys (same
    * exchange profile as repetitionRatio); `sum(cnt)` and `sum(cnt²)`
    * are exact integer sums, the one divide is IEEE on integer-valued
    * doubles, and the result snaps to the 1e-6 lattice. */
  def lexicalDiversity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val np = docs.sparkSession.sparkContext.defaultParallelism
    docs.repartition(np, col(idCol))
      .select(col(idCol).as("id"),
        explode(shingleStrings(col(textCol), 1)).as("_t"))
      .groupBy(col("id"), col("_t")).agg(count(lit(1)).as("_c"))
      .groupBy(col("id"))
      .agg(sum(col("_c")).as("n_tokens"),
        sum(col("_c") * col("_c")).as("_ss"))
      .select(col("id"), col("n_tokens"),
        (floor((lit(1.0) - col("_ss").cast("double") /
          (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
          * 1000000 + lit(0.5)) / 1000000).as("diversity"))
  }

  // --- PII scrubbing + URL analysis (corpus-cleaning building blocks) ---
  // Patterns are RE2-safe (char classes, bounded repeats, no lookaround),
  // so the same pattern string runs verbatim in Spark (java.util.regex)
  // and RE2-based engines (DuckDB, Go) — oracle-portable by construction.

  /** Email address pattern (pragmatic form, lowercased text). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Phone pattern, NANP 555-prefixed exchange form (the fictional range;
    * production pipelines swap in locale-specific patterns). */
  val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** URL pattern; group 1 captures the host for domain analysis. */
  val UrlRe = "https?://([a-z0-9.-]+)[a-z0-9./_-]*"

  /** Occurrence count of a pattern — pure expression, no shuffle. */
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact emails then phones with typed placeholder tags. All
    * occurrences are replaced (Spark regexp_replace is global; RE2
    * engines need their 'g' flag to match). */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** All URL hosts mentioned in the text (capture group 1 of [[UrlRe]]) —
    * explode + groupBy downstream gives per-domain corpus composition,
    * the standard provenance/contamination report. */
  def urlDomains(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(1))

  // --- markup stripping (WET-style text extraction) ---------------------
  // The patterns avoid backreferences and lookaround, so they run
  // verbatim under java.util.regex AND RE2 (DuckDB) — script and style
  // get their own literal close-tag patterns instead of `</\1>`.

  /** Container elements whose CONTENT is noise, not text: the element is
    * removed wholesale, not just its tags. Lazy `.*?` keeps removal
    * scoped per element; `(?is)` covers case and newlines. */
  val ScriptRe = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  val StyleRe = "(?is)<style\\b[^>]*>.*?</style\\s*>"

  /** HTML comments (dotall — comments span lines). */
  val CommentRe = "(?s)<!--.*?-->"

  /** Any remaining tag. `[^>]*` (not `.*?`) so an unclosed `<` without a
    * matching `>` is left alone rather than eating the document. */
  val TagRe = "(?s)</?[a-zA-Z!][^>]*>"

  /** Markup removal — the WET-extraction step that turns crawled HTML
    * into training text: script/style elements go wholesale (their
    * content is code, not prose), comments and remaining tags become
    * spaces (so `a<br>b` stays two words), the six ubiquitous named
    * entities decode, whitespace collapses. Pure codegen'd expression —
    * scans at parquet speed, embarrassingly parallel, and the same
    * pattern strings run in any RE2 engine for cross-engine audit. */
  def stripMarkup(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(html, ScriptRe, " "), StyleRe, " ")
    val noTags = regexp_replace(regexp_replace(noBlocks, CommentRe, " "), TagRe, " ")
    // literal replaces; &amp; LAST so "&amp;lt;" decodes to "&lt;" not "<"
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = ent.foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Fixed-width histogram bin with an overflow bucket: values land in
    * `floor(v / width)` capped at `nBins - 1`. Integer arithmetic only, so
    * any engine bins identically. */
  def histogramBin(v: Column, width: Long, nBins: Int): Column =
    least(floor(v / lit(width.toDouble)), lit((nBins - 1).toDouble)).cast("long")

  /** Cross-corpus contamination: per EVAL doc, the fraction of its
    * distinct k-shingles that appear anywhere in the TRAIN corpus — the
    * benchmark-decontamination measure (an eval doc whose shingles are
    * largely in-train is leaked). Shingle identities are portable 60-bit
    * md5 prefixes. Shape: one distinct per side, one equi-join on the
    * uniform hash key (AQE picks broadcast when the train shingle set is
    * small, shuffle otherwise), one per-doc aggregation — no pair
    * expansion, linear in total shingle count. */
  def crossContamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val np = train.sparkSession.sparkContext.defaultParallelism
    def hashed(df: DataFrame, keep: Seq[String]) = df
      .select(keep.map(col) :+ explode(shingleStrings(col(textCol), k)).as("_s"): _*)
      .select(keep.map(col) :+ graft.functions.Checksums.md5PrefixLong(col("_s")).as("h"): _*)
      .distinct()
    val trainSh = hashed(train, Seq.empty).withColumn("_hit", lit(1L))
    hashed(eval.repartition(np, col(idCol)).withColumnRenamed(idCol, "id"), Seq("id"))
      .join(trainSh, Seq("h"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        (floor(sum(coalesce(col("_hit"), lit(0L))).cast("double") /
          count(lit(1)).cast("double") * 1000000 + 0.5) / 1000000)
          .as("contaminated_frac"))
  }

  /** Sliding token-window chunking — the pretraining/RAG chunker: each
    * doc becomes ceil(n/stride) windows of `chunkSize` tokens starting
    * every `stride` tokens (the final windows are shorter). Pure
    * expression work per row (split once, slice per window), one
    * generator — no shuffle; chunk ids are per-doc ordinals. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toks = split(normText(col(textCol)), " ")
    docs
      .select(col(idCol).as("id"), toks.as("_w"), size(toks).as("_n"))
      .select(col("id"), col("_w"), col("_n"),
        posexplode(sequence(lit(0), greatest(col("_n") - 1, lit(0)), lit(stride))))
      .select(col("id"), col("pos").cast("long").as("chunk_id"),
        least(lit(chunkSize), col("_n") - col("col")).cast("long").as("n_toks"),
        md5(array_join(slice(col("_w"), col("col") + 1, lit(chunkSize)), " ")).as("chunk_fp"))
  }

  /** Content-defined chunking: chunk boundaries fall where a TOKEN's
    * hash lands in a 1/`meanToks` slice of the hash space, so the
    * expected chunk length is `meanToks` tokens and — the property that
    * matters for dedup — boundaries are a function of CONTENT, not
    * position: an insertion reflows only the chunk it lands in, while
    * fixed-size chunking ([[chunkTokens]]) shifts every downstream
    * chunk (the rsync/CDC property). Chunk hashes are therefore the
    * insertion-robust dedup unit: shared chunks across docs/versions
    * dedupe even when documents differ elsewhere.
    *
    * A boundary token CLOSES its chunk (it is the chunk's last token).
    * Scale shape: one explode lineage, ONE key exchange (the per-doc
    * window and the per-(doc, chunk) reassembly aggregation share the
    * doc_id partitioning), no self-joins. Output:
    * `(idCol, chunk_idx, chunk_hash, n_toks)` — hash on the md5
    * prefix-60 lattice so any engine reproduces it. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      meanToks: Int): DataFrame = {
    require(meanToks > 1, s"meanToks $meanToks must exceed 1")
    val toks = docs
      .select(col(idCol),
        posexplode(split(normText(col(textCol)), " ")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    val bd = (pmod(graft.functions.Checksums.md5PrefixLong(col("tok")),
      lit(meanToks.toLong)) === 0).cast("long")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withChunk = toks.withColumn("chunk_idx", sum(bd).over(w) - bd)
    withChunk.groupBy(col(idCol), col("chunk_idx"))
      .agg(
        graft.functions.Checksums.md5PrefixLong(
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok")), " ")).as("chunk_hash"),
        count(lit(1)).as("n_toks"))
  }

  /** Line-level boilerplate removal — the CCNet/C4 paragraph-dedup rule:
    * a line whose TRIMMED text recurs in more than `maxDocFreq` distinct
    * documents is boilerplate (nav bars, cookie banners, license
    * footers) and is dropped from EVERY document; each document
    * reassembles from its surviving lines in original order. Blank lines
    * are structural, not content — never counted, never dropped.
    *
    * Scale shape: one explode lineage, one exact distinct-doc-count
    * aggregation on the line text, one join back (AQE broadcasts the
    * boilerplate side when small, which heavy-hitter sets above a
    * frequency threshold usually are), one per-document reassembly
    * aggregation — no self-joins, no collect to the driver. Output:
    * `(idCol, clean_text, n_lines_kept, n_lines_dropped)`. */
  def dropBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Long): DataFrame = {
    require(maxDocFreq > 0, s"maxDocFreq $maxDocFreq must be positive")
    require(!Seq("key", "pos", "col", "line", "_b").contains(idCol),
      s"idCol '$idCol' collides with an internal column name")
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n", -1)))
      .select(col(idCol), col("pos"), col("col").as("line"),
        trim(col("col")).as("key"))
    val boiler = lines.filter(col("key") =!= "")
      .groupBy(col("key"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select(col("key"), lit(1).as("_b"))
    lines.join(boiler, Seq("key"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(
            when(col("_b").isNull, struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"),
        sum(when(col("_b").isNull, 1L).otherwise(0L)).as("n_lines_kept"),
        sum(when(col("_b").isNotNull, 1L).otherwise(0L)).as("n_lines_dropped"))
  }

  /** Corpus-wide EXACT paragraph deduplication (the RefinedWeb exact
    * line/paragraph rule): every non-blank paragraph is kept only at its
    * FIRST occurrence in the whole corpus — first by `(idCol, pos)` — and
    * removed everywhere else, including later repeats inside the same
    * document. Blank paragraphs are structural and always survive.
    *
    * Scale shape: the first-occurrence reduction is `min(struct(id,pos))`
    * grouped by the trimmed paragraph — a partial-aggregatable map-side
    * combine, so a paragraph repeated a billion times costs one row per
    * partition, never a per-key buffer (the `Window.row_number` phrasing
    * would buffer the hot key). One join back on the paragraph key, one
    * per-document reassembly aggregation; three exchanges total, all on
    * keys the operator inherently requires.
    * Output: `(idCol, dedup_text, n_paras_kept, n_paras_dropped)`. */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(!Seq("key", "pos", "col", "para").contains(idCol),
      s"idCol '$idCol' collides with an internal column name")
    val paras = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n", -1)))
      .select(col(idCol), col("pos"), col("col").as("para"),
        trim(col("col")).as("key"))
    val fid = TempCols.fresh(paras, "_fid")
    val fpos = TempCols.fresh(paras, "_fpos")
    val keep = TempCols.fresh(paras, "_keep")
    val first = paras.filter(col("key") =!= "")
      .groupBy(col("key"))
      .agg(min(struct(col(idCol), col("pos"))).as("f"))
      .select(col("key"), col("f").getField(idCol).as(fid),
        col("f").getField("pos").as(fpos))
    paras.join(first, Seq("key"), "left")
      .withColumn(keep, col("key") === "" ||
        (col(idCol) === col(fid) && col("pos") === col(fpos)))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(
            when(col(keep), struct(col("pos"), col("para"))))),
          x => x.getField("para")), "\n").as("dedup_text"),
        sum(when(col(keep), 1L).otherwise(0L)).as("n_paras_kept"),
        sum(when(!col(keep), 1L).otherwise(0L)).as("n_paras_dropped"))
  }

  /** BM25 document ranking for a bag-of-words query. The idf is the same
    * LOG-FREE ratio family as [[tfIdfTopTerms]] — `(N - df + 0.5) /
    * (df + 0.5)` — because ln()'s last ulp is math-library-specific while
    * add/mul/div are correctly-rounded IEEE ops that reproduce bit-exactly
    * in any engine. Each per-term score is snapped to the 1e-6 lattice as
    * LONG micro-units BEFORE the per-doc sum: integer addition is
    * order-independent, where a double sum would hash-differently across
    * engines and partition orders. Docs sharing no query term score 0 and
    * are omitted.
    *
    * Scale shape: one tokenize+explode lineage filtered to the query
    * terms BEFORE any shuffle (selectivity ~|q|/vocab at the scan), one
    * (doc, term) aggregation carrying the doc length through the group
    * key (no re-join with a lengths frame); df is a |q|-row broadcast;
    * corpus doc count and average length fold to literals from a one-row
    * aggregate. Top-k is TakeOrderedAndProject — bounded per-partition
    * heaps, never a global sort. */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    val terms = queryTerms.distinct
    require(terms.nonEmpty, "bm25Rank needs at least one query term")
    require(topK > 0, s"topK $topK must be positive")
    val stats = docs.agg(count(lit(1)).as("n"),
      sum(tokenCount(col(textCol))).as("tot")).head()
    val n = stats.getLong(0)
    require(n > 0, "bm25Rank needs a non-empty corpus")
    val avgdl = stats.getLong(1).toDouble / n.toDouble
    val toks = docs.select(col(idCol).as("id"),
        tokenCount(col(textCol)).as("dl"),
        explode(split(normText(col(textCol)), " ")).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = toks.groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        (lit(n.toDouble) - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
    tf.join(broadcast(dfreq), "term")
      .withColumn("ms", bm25Micro(k1, b, avgdl))
      .groupBy(col("id")).agg(sum(col("ms")).as("ms"))
      .select(col("id"), (col("ms").cast("double") / lit(1000000.0)).as("bm25"))
      .orderBy(col("bm25").desc, col("id").asc)
      .limit(topK)
  }

  /** Shared BM25 per-term micro-score over columns `tf`, `dl`, `idf`:
    * the full Robertson formula as IEEE-exact ops, snapped to the 1e-6
    * lattice as a LONG so the per-doc sum is order-independent. */
  private def bm25Micro(k1: Double, b: Double, avgdl: Double): Column = {
    val core = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl)))
    floor(col("idf") * core * lit(1000000.0) + lit(0.5)).cast("long")
  }

  /** Tokenizer-vocabulary coverage curve: the `topK` most frequent corpus
    * tokens with each one's cumulative share of ALL token occurrences —
    * the vocabulary-design step ("how many types cover 95% of the
    * corpus?"). Counts are exact longs; the share is a single double
    * divide per row, so the frame hash-reproduces in any engine.
    *
    * Scale shape: one explode + one partial-aggregated term count; the
    * top-k is TakeOrderedAndProject (bounded per-partition heaps — the
    * full vocabulary is never globally sorted); the rank/cumulative
    * window then runs over `topK` rows only, where a single-partition
    * window is free. The total token count comes from a separate pure
    * column scan (no explode) and folds to a literal. */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    require(topK > 0, s"topK $topK must be positive")
    import org.apache.spark.sql.expressions.Window
    val total = docs.agg(sum(tokenCount(col(textCol)))).head().getLong(0)
    require(total > 0, "vocabCoverage needs a non-empty corpus")
    val top = docs
      .select(explode(split(normText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(topK)
    val ord = Window.orderBy(col("n").desc, col("term").asc)
    top
      .withColumn("rnk", row_number().over(ord))
      .withColumn("coverage",
        sum(col("n")).over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("double") / lit(total.toDouble))
  }

  /** Rare-token ratio: per document, the fraction of token OCCURRENCES
    * whose corpus-wide frequency is at most `maxFreq` — a Gopher/C4-style
    * quality signal (high ratio flags OCR noise, hashes, gibberish; a
    * near-zero ratio flags boilerplate vocabulary). Counts are exact
    * longs; the ratio is one guarded double divide (explicit NULL for
    * zero-token docs — engine-portable, never 0/0).
    *
    * Scale shape: one explode lineage, one exact term-frequency shuffle,
    * one join back on the term with the rare side filtered BEFORE the
    * join (AQE broadcasts it when the rare vocabulary is small), one
    * per-doc aggregation, and a final left join so token-less documents
    * surface with zero counts instead of vanishing. */
  def rareTokenRatio(docs: DataFrame, idCol: String, textCol: String,
      maxFreq: Long): DataFrame = {
    require(maxFreq > 0, s"maxFreq $maxFreq must be positive")
    val toks = docs.select(col(idCol).as("id"),
        explode(split(normText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val mark = TempCols.fresh(toks, "_r")
    val rare = toks.groupBy("term").agg(count(lit(1)).as("cf"))
      .filter(col("cf") <= maxFreq)
      .select(col("term"), lit(1).as(mark))
    val perDoc = toks.join(rare, Seq("term"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col(mark).isNotNull, 1L).otherwise(0L)).as("n_rare"))
    docs.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .withColumn("rare_ratio", when(col("n_tokens") > 0,
        col("n_rare").cast("double") / col("n_tokens").cast("double")))
  }

  /** URL canonicalization — the provenance-dedup rule: the same page
    * crawled as `HTTPS://Site.COM/p?utm_source=x#top` and
    * `https://site.com/p` must collapse to ONE canonical key before any
    * count/dedup by source. Steps: strip the fragment, remove tracking
    * parameters (utm_*, fbclid, gclid) with their separators, drop
    * dangling `?`/`&`, lowercase the scheme+authority (path and query
    * stay case-sensitive per RFC 3986), and trim trailing slashes.
    *
    * Pure codegen'd expression — no shuffle, no UDF. Every regex is
    * RE2-safe and NO replacement uses capture groups (Spark spells them
    * `$1`, other engines `\1` — the one portability trap in regex
    * replacement), so a SQL oracle reproduces the value byte-for-byte. */
  def canonicalizeUrl(url: Column): Column = {
    val track = "(utm_[a-zA-Z]+|fbclid|gclid)"
    val noFrag = regexp_replace(url, "#.*", "")
    // three anchored passes, because the portable-replacement rule (no
    // capture groups) forbids the one-regex form: an UNanchored pattern
    // would eat `?xgclid=1` or a value containing `utm_x=`. (1) params
    // preceded by `&`; (2) a first-param tracker with a successor keeps
    // the `?`; (3) a lone first-param tracker goes entirely.
    val noAmp = regexp_replace(noFrag, s"&$track=[^&]*", "")
    val noLead = regexp_replace(noAmp, s"\\?$track=[^&]*&", "?")
    val noTrack = regexp_replace(noLead, s"\\?$track=[^&]*$$", "")
    val tidy = regexp_replace(noTrack, "[?&]+$", "")
    val auth = regexp_extract(tidy, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(auth),
      tidy.substr(length(auth) + lit(1), length(tidy)))
    regexp_replace(lowered, "/+$", "")
  }

  /** Persisted inverted (posting-list) index — the lexical analog of the
    * LSH/IVF vector indexes: tokenize ONCE, write `(term, doc_id, tf)`
    * postings `partitionBy("term_bucket")` where the bucket is a hash of
    * the term, so a query-term probe prunes to |q| directories at
    * planning time instead of rescanning the corpus. Row-per-posting
    * rather than list-per-term: one boilerplate term would make a giant
    * array row, while posting rows partial-aggregate and split across
    * row groups/partitions like any other data. `nBuckets` bounds the
    * directory count (vocabulary-sized partitioning would explode the
    * file system at corpus scale). */
  def writeInvertedIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets $nBuckets must be positive")
    docs.select(col(idCol).as("doc_id"),
        explode(split(normText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(nBuckets)))
      // co-locate each bucket before the dynamic-partition write: one
      // task writes one directory (nBuckets files total) instead of
      // tasks × buckets writers each flushing a tiny parquet footer
      .repartition(nBuckets, col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket").parquet(path)
  }

  /** Open a persisted inverted index; `term_bucket` comes back as a
    * partition column, so bucket predicates prune at planning time. */
  def readInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.parquet(path)

  /** Driver-side mirror of the index's bucket hash (same XxHash64 seed
    * Spark's `xxhash64` uses) — probes enumerate their buckets without a
    * job, exactly like the ANN paths enumerate Hamming balls/cells. */
  private[graft] def termBucket(term: String, nBuckets: Int): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(term),
        org.apache.spark.sql.types.StringType)), 42L)
      .eval(null).asInstanceOf[Long]
    ((h % nBuckets) + nBuckets) % nBuckets
  }

  /** Posting probe: read only the query terms' bucket partitions
    * (PartitionFilters at the scan), then the exact term filter. MUST be
    * called with the `nBuckets` the index was written with — enforced
    * nowhere cheaper than the caller, so it is part of the signature. */
  def probePostings(index: DataFrame, terms: Seq[String],
      nBuckets: Int): DataFrame = {
    require(terms.nonEmpty, "probePostings needs at least one term")
    val buckets = terms.map(t => termBucket(t, nBuckets)).distinct
    index.filter(col("term_bucket").isin(buckets: _*) &&
      col("term").isin(terms: _*))
      .drop("term_bucket")
  }

  /** BM25-ready index: postings additionally carry the doc length (so
    * scoring needs NO doc-side join at query time), and a one-row stats
    * sidecar holds the corpus doc count and total token count that fold
    * into the idf/avgdl literals. Build cost is the same single tokenize
    * pass as [[writeInvertedIndex]]. */
  /** `markComplete = false` suppresses the final completion marker — for
    * composed builds (write a base, then [[appendToBm25Index]] batches)
    * where only the LAST step may declare the index complete; a marker
    * after the base write would validate a half-built index if the
    * process died before the appends ran. */
  def writeBm25Index(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64, markComplete: Boolean = true): Unit = {
    require(nBuckets > 0, s"nBuckets $nBuckets must be positive")
    // drop any stale completion marker FIRST: a crash mid-rebuild must
    // not leave a prior build's marker validating mixed postings/stats
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), false)
    docs.select(col(idCol).as("doc_id"), tokenCount(col(textCol)).as("dl"),
        explode(split(normText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(nBuckets)))
      .repartition(nBuckets, col("term_bucket")) // one file per directory
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$path/postings")
    docs.agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol))).as("total_tokens"))
      .write.mode("overwrite").parquet(s"$path/stats")
    // completion marker at the ROOT: the index is two datasets, so
    // neither subdir's own _SUCCESS proves the whole build finished —
    // cache checks (and crash recovery) need one marker after BOTH writes
    if (markComplete)
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
  }

  /** Append a document batch to an existing BM25 index — training corpora
    * grow append-only, and a full rebuild per ingest is exactly what a
    * persisted index exists to avoid. New postings append into the same
    * bucket directories (dynamic-partition append: old files untouched);
    * the stats sidecar becomes the sum of old and batch counts (read one
    * row, write one row). df needs NO maintenance — it is counted from
    * the probed postings at query time, so it is correct the moment the
    * postings land. Caller contract: batch ids must be NEW to the index
    * (re-ingesting an id would double its postings) — gate ingest with
    * [[graft.operators.BloomJoin.novelRows]] when in doubt. The root
    * completion marker drops at entry and reappears only after both the
    * postings and stats writes land, so a crash mid-append leaves a
    * visibly incomplete index, never a silently inconsistent one. */
  def appendToBm25Index(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets $nBuckets must be positive")
    val spark = docs.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // invalidate the marker as the FIRST filesystem action — every
    // subsequent step must happen under an incomplete-index state
    fs.delete(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), false)
    val old = spark.read.parquet(s"$path/stats").head()
    // pin the batch: postings and stats are two actions over `docs`, and
    // a non-deterministic source (sample, changing view) would otherwise
    // hand them DIFFERENT rows — stats silently inconsistent with the
    // postings actually written
    val batch = docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      batch.select(col(idCol).as("doc_id"), tokenCount(col(textCol)).as("dl"),
          explode(split(normText(col(textCol)), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(nBuckets)))
        .repartition(nBuckets, col("term_bucket"))
        .write.mode("append").partitionBy("term_bucket")
        .parquet(s"$path/postings")
      val add = batch.agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol))).as("total_tokens")).head()
      import spark.implicits._
      Seq((old.getAs[Long]("n_docs") + add.getAs[Long]("n_docs"),
        old.getAs[Long]("total_tokens") + add.getAs[Long]("total_tokens")))
        .toDF("n_docs", "total_tokens")
        .write.mode("overwrite").parquet(s"$path/stats")
    } finally batch.unpersist(false)
    fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
  }

  /** BM25 served FROM the persisted index — the retrieval scale path:
    * query cost is proportional to the probed postings (|q| bucket
    * directories, PartitionFilters at the scan), never the corpus. Same
    * IEEE-exact scoring as [[bm25Rank]] — identical results by
    * construction, which the oracle checks by running the from-scratch
    * SQL against this path's output. df comes from the probed postings
    * themselves (a posting row IS a (term, doc) occurrence). */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10, nBuckets: Int = 64): DataFrame = {
    val terms = queryTerms.distinct
    require(terms.nonEmpty, "bm25FromIndex needs at least one query term")
    require(topK > 0, s"topK $topK must be positive")
    val st = spark.read.parquet(s"$path/stats").head()
    val n = st.getAs[Long]("n_docs")
    require(n > 0, "bm25FromIndex needs a non-empty indexed corpus")
    val avgdl = st.getAs[Long]("total_tokens").toDouble / n.toDouble
    val postings =
      probePostings(readInvertedIndex(spark, s"$path/postings"), terms, nBuckets)
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        (lit(n.toDouble) - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
    postings.join(broadcast(dfreq.select(col("term"), col("idf"))), "term")
      .withColumn("ms", bm25Micro(k1, b, avgdl))
      .groupBy(col("doc_id")).agg(sum(col("ms")).as("ms"))
      .select(col("doc_id"),
        (col("ms").cast("double") / lit(1000000.0)).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Corpus-duplicated substring SPANS — the exact-substring-dedup rule
    * ("remove any 50-token run that appears more than once in the
    * corpus") at the token-window granularity it is actually applied at.
    * Where [[shingleNovelty]] SCORES a document by its duplicated-window
    * fraction, this returns the concrete token-offset intervals to cut:
    * every k-token window whose text occurs more than once corpus-wide
    * (in ANY document, including this one) is marked, and overlapping or
    * adjacent marked windows merge into maximal spans.
    *
    * Output: one row per merged span — (id, span_start, span_end,
    * n_windows) with token offsets 0-based and span_end EXCLUSIVE, so
    * `span_end - span_start` is the span's token length and a clean doc
    * has zero rows. Docs shorter than k tokens have no k-windows and
    * never appear.
    *
    * Scale shape: one explode lineage (window position + md5 of the
    * window text), the corpus occurrence count attached as a window
    * count over the hash — the same single-lineage trick as
    * [[shingleNovelty]]: a join against a separate count aggregate would
    * re-run the whole explode once per consumer. The interval merge is
    * the classic gaps-and-islands pass: per-doc running max of
    * span ends (key-partitioned window — parallel across docs), one
    * running-sum island id, one groupBy. Everything is integer
    * arithmetic on md5 strings — bit-reproducible in any engine. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"window size k=$k must be positive")
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val toks = split(normText(col(textCol)), " ")
    val wins = docs.repartition(np, col(idCol))
      .select(col(idCol).as("id"), toks.as("_w"), size(toks).as("_n"))
      .filter(col("_n") >= k)
      .select(col("id"), posexplode(transform(sequence(lit(0), col("_n") - lit(k)),
        i => md5(array_join(slice(col("_w"), i + 1, lit(k)), " ")))))
      .withColumnRenamed("pos", "start").withColumnRenamed("col", "h")
    val dup = wins
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("cnt") > 1)
      .select(col("id"), col("start").cast("long").as("start"),
        (col("start") + k).cast("long").as("end"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("start"))
    // a window at `start` extends the current span iff start <= running
    // max end (end exclusive: adjacency start == prevEnd also merges)
    val prevMaxEnd = max(col("end")).over(
      byDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    dup
      .withColumn("_new", when(prevMaxEnd.isNull || col("start") > prevMaxEnd, 1L)
        .otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(byDoc))
      .groupBy(col("id"), col("_island"))
      .agg(min(col("start")).as("span_start"), max(col("end")).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("id"), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** Cluster LABELING terms — the c-TF-IDF rule (class-based TF-IDF, the
    * BERTopic labeling step): score term t for cluster c by the
    * cluster's term count × corpus rarity, keep each cluster's top-k.
    * The "what is this cluster about" primitive a semantic-dedup or
    * topic-mining pipeline runs right after clustering.
    *
    * Rarity uses the same log-free BM25 idf ratio as [[bm25Rank]]
    * ((N − df + 0.5) / (df + 0.5)) — ln() is libm-specific, the ratio is
    * IEEE-exact and order-compatible. Scores snap to the 1e-6 lattice as
    * longs BEFORE ranking, so the top-k cut is engine-portable.
    *
    * Scale shape: one token explode feeding two partial-aggregated
    * counts (cluster-term counts; distinct-doc df), a broadcast of the
    * vocabulary-sized df frame, and a per-cluster rank window —
    * parallel across clusters. */
  def clusterTerms(docs: DataFrame, clusterCol: String, idCol: String,
      textCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK $topK must be positive")
    val n = docs.count()
    require(n > 0, "clusterTerms needs a non-empty corpus")
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs.repartition(np, col(idCol))
      .select(col(idCol).as("id"), col(clusterCol).as("cluster"),
        explode(split(normText(col(textCol)), " ")).as("term"))
    val ctf = toks.groupBy(col("cluster"), col("term"))
      .agg(count(lit(1)).as("ctf"))
    val dfreq = toks.select(col("id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        (lit(n.toDouble) - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
      .orderBy(col("ms").desc, col("term").asc)
    ctf.join(broadcast(dfreq.select(col("term"), col("idf"))), "term")
      .withColumn("ms",
        floor(col("ctf").cast("double") * col("idf") * lit(1000000.0) + lit(0.5))
          .cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("cluster"), col("rank"), col("term"),
        (col("ms").cast("double") / lit(1000000.0)).as("score"))
  }

  /** Token-pair LIFT — log-free collocation mining: for every pair of
    * distinct tokens co-occurring in a document,
    * `lift = N·df_ab / (df_a·df_b)` (the PMI exponential — >1 means the
    * pair co-occurs above independence; stop-phrase and template
    * detection reads from the top of this list). All counts are exact
    * integers; the single divide is IEEE — engines agree to the bit
    * without libm logs.
    *
    * Scale shape: per-doc pair generation is the quadratic hazard, so
    * each doc's SORTED distinct-token set is capped at
    * `maxTokensPerDoc` BEFORE pairing (deterministic lexicographic
    * truncation, and every statistic — df and pair counts alike — is
    * computed over the SAME capped sets, so lift stays internally
    * consistent). One groupBy per doc builds the capped array, one
    * double-posexplode emits C(cap,2) pairs max per doc, and two
    * broadcast-sized df joins finish — no token-level self-join ever
    * shuffles. `minSupport` prunes noise pairs before the df joins. */
  def tokenPairLift(docs: DataFrame, idCol: String, textCol: String,
      maxTokensPerDoc: Int, minSupport: Long): DataFrame = {
    require(maxTokensPerDoc >= 2,
      s"maxTokensPerDoc $maxTokensPerDoc must be >= 2 (pairs need two tokens)")
    require(minSupport >= 1, s"minSupport $minSupport must be >= 1")
    val n = docs.count()
    val capped = docs
      .select(col(idCol).as("id"),
        slice(array_sort(array_distinct(split(normText(col(textCol)), " "))),
          1, maxTokensPerDoc).as("w"))
    val toks = capped.select(col("id"), explode(col("w")).as("t"))
    val dfreq = toks.groupBy("t").agg(count(lit(1)).as("df"))
    val pairs = capped
      .select(col("id"), posexplode(col("w")).as(Seq("_pa", "ta")), col("w"))
      .select(col("id"), col("_pa"), col("ta"),
        posexplode(col("w")).as(Seq("_pb", "tb")))
      .filter(col("_pa") < col("_pb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minSupport)
    pairs
      .join(broadcast(dfreq.select(col("t").as("ta"), col("df").as("df_a"))), "ta")
      .join(broadcast(dfreq.select(col("t").as("tb"), col("df").as("df_b"))), "tb")
      .select(col("ta").as("tok_a"), col("tb").as("tok_b"),
        col("n_pairs"), col("df_a"), col("df_b"),
        (floor(lit(n) * col("n_pairs") * lit(1000000.0) /
          (col("df_a") * col("df_b")).cast("double") + lit(0.5)) /
          lit(1000000.0)).as("lift"))
  }

  /** Bigram-LM SURPRISAL filter — the perplexity-style quality signal
    * ("does this document read like the corpus?") without a language
    * model dependency and without a single float in the decision: train
    * bigram transition counts on the corpus itself, then flag each
    * token transition whose conditional probability is below
    * `1/denom`. The comparison `P(w2|w1) < 1/denom` is evaluated as
    * `c(w1,·) > denom · c(w1,w2)` — pure integer compare, so the
    * per-doc surprise rate reproduces bit-for-bit in any engine (a
    * log-prob sum would be libm-dependent in its last ulp).
    *
    * Scale shape: bigram expansion is one `transform(sequence)` per
    * doc (no self-join); transition counts are ONE partial-aggregated
    * groupBy to the |V|² type frame; the flag is decided per TYPE (the
    * tiny frame), then a single equi-join attaches it to doc bigrams —
    * shuffle keyed on the bigram, skew left to AQE. Per-doc scoring is
    * one more partial aggregation. Nothing driver-side.
    *
    * Returns (id, n_bigrams, n_surprising, surprise_rate) per doc with
    * at least one transition. */
  def bigramSurprise(docs: DataFrame, idCol: String, textCol: String,
      denom: Int): DataFrame = {
    require(denom >= 2, s"denom $denom must be >= 2 (a probability cutoff)")
    val toks = docs.select(col(idCol).as("id"),
      split(normText(col(textCol)), " ").as("w"))
    val bi = toks.filter(size(col("w")) >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))"))
        .as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val types = c2.join(c1, "w1")
      .select(col("w1"), col("w2"),
        when(col("c1") > col("c2") * denom, 1L).otherwise(0L).as("_sur"))
    bi.join(types, Seq("w1", "w2"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_sur")).as("n_surprising"))
      .select(col("id"), col("n_bigrams"), col("n_surprising"),
        (floor(col("n_surprising").cast("double") /
          col("n_bigrams").cast("double") * 1000000 + 0.5) / 1000000)
          .as("surprise_rate"))
  }

  /** Frequency-ordered VOCABULARY CUTOFF — the tokenizer-budget
    * question "how small a vocabulary still covers X% of the corpus
    * token mass?": tokens ranked by (occurrences desc, token asc), kept
    * while the EXCLUSIVE prefix mass is under `ceil(pct·total/100)` —
    * the minimal covering prefix, all in integer arithmetic (the target
    * via `(pct·total + 99) div 100`, so no double ever touches the
    * cutoff decision).
    *
    * Scale shape: one token count aggregation (partial, the only
    * data-sized shuffle), then [[GlobalOrder.withRunningTotals]] over
    * the VOCABULARY frame — global rank + running mass with no
    * SinglePartition window — and a broadcast one-row total. Returns
    * (rank, token, n_occ, cum_before) for the kept prefix. */
  def vocabCutoff(docs: DataFrame, textCol: String,
      coveragePct: Int): DataFrame = {
    require(coveragePct >= 1 && coveragePct <= 100,
      s"coveragePct $coveragePct must be in [1, 100]")
    val counts = docs
      .select(explode(split(normText(col(textCol)), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n_occ"))
    val total = counts.agg(sum(col("n_occ")).as("_total"))
    graft.operators.GlobalOrder.withRunningTotals(counts,
      Seq(col("n_occ").desc, col("token").asc), "n_occ",
      cumCol = "cum_before", posCol = "rank")
      .crossJoin(broadcast(total))
      .filter(col("cum_before") <
        expr(s"($coveragePct * _total + 99) div 100"))
      .select(col("rank"), col("token"), col("n_occ"), col("cum_before"))
  }

  /** Full per-document analysis frame. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val sig = qualitySignals(t) ++ Seq(
      "subword_count" -> subwordCount(t).cast("long"),
      "lang_pred" -> languageId(t),
      "fingerprint" -> fingerprint(t))
    docs.select((docs.columns.toSeq.map(col) ++ sig.map { case (n, c) => c.as(n) }): _*)
  }

  /** Apply a TRAINED BPE merge table to every document — the other half
    * of the tokenizer loop whose learning side is `bigramMerges`
    * (q95): a tokenizer is trained once, then applied at corpus scale
    * on every ingest. Text is lowercased, restricted to [a-z0-9 ],
    * space-marked with `_`, exploded to one character token per symbol,
    * then each merge `(l, r) -> lr` is applied corpus-wide as a literal
    * leftmost non-overlapping replacement of `" l r "` with `" lr "` —
    * the deterministic greedy-by-rank semantics (back-to-back
    * occurrences sharing a boundary token keep the shared one
    * unmerged; both engines implement the identical scan, so the
    * definition is exact, not approximate).
    *
    * Everything is a chain of codegen'd string expressions over one
    * projection — no UDF, no shuffle, no state: the merge table rides
    * into every task as plan literals, which is exactly how a trained
    * tokenizer artifact should ship to a 1000-executor ingest.
    *
    * Output: (id, n_chars, n_tokens, chars_per_token) — n_chars counts
    * the marked symbols (merges never change it), n_tokens counts
    * post-merge tokens, and their ratio is the compression the merge
    * table achieves on this corpus (empty docs yield NULL, not 0/0). */
  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val clean = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), " +", " "))
    val marked = translate(clean, " ", "_")
    // one space-separated symbol per char, with a leading sentinel space
    // so every token (first included) is " tok "-addressable
    val spaced = concat(lit(" "), regexp_replace(marked, "(.)", "$1 "))
    val merged = merges.foldLeft(spaced) { case (c, (l, r)) =>
      replace(c, lit(s" $l $r "), lit(s" $l$r "))
    }
    docs.select(col(idCol).as("id"),
        length(marked).cast("long").as("n_chars"),
        (length(merged) - length(replace(merged, lit(" "), lit(""))) - 1)
          .cast("long").as("n_tokens"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / nullif(col("n_tokens"), lit(0L)))
  }
}
