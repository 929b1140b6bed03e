package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data curation: exact hashing,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale shape: everything reduces to (a) per-row expression work (no
  * shuffle), then (b) one groupBy on a bucket key whose cardinality is
  * tuned so buckets stay small, then (c) pair verification *within*
  * buckets only. No all-pairs join ever materializes; at 100 TB the band
  * join is the only shuffle and it is uniformly hash-distributed unless
  * the corpus is pathologically self-similar (mitigate: salt the band key
  * by a shingle-count band, or cap bucket size).
  */
object DedupApprox {

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

  /** MinHash signature as `numHashes` independent min-hashes over the
    * document's k-shingle set. Hash family: xxhash64 salted by the hash
    * index (engine-fast); `md5Family=true` hashes the raw shingle STRINGS
    * with min-of-md5-hex — reproducible verbatim in any SQL engine for
    * oracle checks (no xxhash64 anywhere on that path). */
  def minhashSignature(text: Column, k: Int, numHashes: Int,
      md5Family: Boolean = false): Column = {
    val sigs = (0 until numHashes).map { j =>
      if (md5Family)
        array_min(transform(TextAnalysis.shingleStrings(text, k),
          s => md5(concat_ws("#", lit(j.toString), s))))
      else
        array_min(transform(TextAnalysis.shingles(text, k),
          s => xxhash64(lit(j.toLong), s))).cast("string")
    }
    array(sigs: _*)
  }

  /** LSH banding: split the signature into `bands` bands of `rows` hashes;
    * docs sharing any band key are candidate pairs. Returns
    * (id, band, band_key) — one output row per band per doc. */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, rows: Int, md5Family: Boolean = false): DataFrame = {
    val sig = minhashSignature(col(textCol), k, bands * rows, md5Family)
    docs.select(col(idCol).as("id"), sig.as("_sig"))
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(array_join(slice(col("_sig"), b * rows + 1, lit(rows)), "|")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  /** Candidate near-dup pairs from LSH buckets (a < b, deduped across
    * bands). The self-join happens only within (band, band_key) buckets. */
  def lshCandidatePairs(bandsDf: DataFrame): DataFrame = {
    val a = bandsDf.select(col("band"), col("band_key"), col("id").as("id_a"))
    val b = bandsDf.select(col("band"), col("band_key"), col("id").as("id_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard similarity for a pair frame carrying both texts:
    * |A ∩ B| / |A ∪ B| over distinct k-shingle STRING sets (portable —
    * the same value is recomputable in any SQL engine). */
  def jaccard(textA: Column, textB: Column, k: Int): Column = {
    val sa = array_distinct(TextAnalysis.shingleStrings(textA, k))
    val sb = array_distinct(TextAnalysis.shingleStrings(textB, k))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Full MinHash-LSH near-dup pipeline: band -> bucket-join -> verify
    * with exact Jaccard >= `threshold`. `docs` needs (idCol, textCol). */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, bands: Int = 4, rows: Int = 4,
      threshold: Double = 0.7, md5Family: Boolean = false): DataFrame = {
    val cands = lshCandidatePairs(lshBands(docs, idCol, textCol, k, bands, rows, md5Family))
    val txt = docs.select(col(idCol).as("_jid"), col(textCol).as("_jtext"))
    cands
      .join(txt.withColumnRenamed("_jid", "id_a").withColumnRenamed("_jtext", "_ta"), Seq("id_a"))
      .join(txt.withColumnRenamed("_jid", "id_b").withColumnRenamed("_jtext", "_tb"), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("_ta"), col("_tb"), k))
      .filter(col("jaccard") >= threshold)
      // floor(x*1e4+0.5)/1e4 instead of round(): identical IEEE ops in any
      // engine, so the DuckDB oracle reproduces the value bit-for-bit.
      .select(col("id_a"), col("id_b"),
        (floor(col("jaccard") * 10000 + 0.5) / 10000).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** SimHash: 64-bit sketch where bit i is the sign of the sum over token
    * hashes of (bit i ? +1 : -1). Near-dups have small Hamming distance.
    * Pure expression tree — wide but codegen'd, zero shuffle. */
  def simhash(text: Column): Column = {
    val toks = split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")
    val hashes = transform(toks, t => xxhash64(t))
    val bitSum = (i: Int) => aggregate(hashes, lit(0L),
      (acc, h) => acc + (shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1))
    (0 until 64).map(i => when(bitSum(i) >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dups: bucket on the 4 16-bit quarters (any pair within
    * Hamming distance 3 of the full 64 bits shares at least one exact
    * quarter — pigeonhole), verify Hamming within buckets. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val quarters = sh.select(col("id"), col("sh"), posexplode(array(
      (0 until 4).map(q => shiftright(col("sh"), q * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "q").withColumnRenamed("col", "qkey")
    val a = quarters.select(col("q"), col("qkey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = quarters.select(col("q"), col("qkey"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("q", "qkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
