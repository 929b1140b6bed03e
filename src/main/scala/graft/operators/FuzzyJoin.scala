package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact edit-distance-1 similarity self-join by symmetric-delete
  * (SymSpell-style) blocking — the fuzzy-matching primitive behind
  * "these two records are the same entity up to one typo" (near-
  * identical titles, keys with one corrupted character, OCR slips).
  *
  * Candidate generation is the deletion neighborhood: every string
  * emits itself plus each single-character deletion (len+1 variants).
  * Two strings within Levenshtein distance 1 ALWAYS share a variant —
  * an insertion/deletion makes one the deletion of the other, and a
  * substitution at position p makes both collapse to the same string
  * when p is deleted — so one hash equi-join on the variant finds every
  * qualifying pair with NO false negatives (the guarantee n-gram or
  * minhash blocking cannot give), and a thresholded verify discards the
  * ed=2 coincidences (e.g. "ab"/"ba" share variant "a"). No cartesian
  * anywhere.
  *
  * Scale shape for 100 TB: work is (len+1)× the input in the exploded
  * frame, one shuffle on the variant hash, and the verify is the
  * banded O(d·len) thresholded Levenshtein, not the full O(len²) DP.
  * Candidate fan-out is bounded by the true answer's neighborhood:
  * a variant shared by B strings yields B² candidates only when those
  * B strings genuinely collide within one edit of each other — the
  * quadratic term IS the output size, not an artifact (contrast the
  * degenerate LSH buckets `maxBucket` caps). Generalizing to distance
  * d uses radius-d deletion neighborhoods (len^d variants) — the
  * standard SymSpell trade; d=1 keeps the exploded frame linear.
  *
  * Reference tie: the sync engine matches records only on exact
  * normalized keys (lib/DataProcessor.py pk equality); this is the
  * typo-tolerant widening of that match, kept exact.
  */
object FuzzyJoin {

  /** All unordered pairs (id_a < id_b) whose strings are within
    * Levenshtein distance 1, with the exact distance. NULL strings are
    * dropped. Output: id_a, id_b, s_a, s_b, dist. */
  def ed1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = df.select(col(idCol).as("fj_id"), col(strCol).as("fj_s"))
      .filter(col("fj_s").isNotNull)
    // p = 0 keeps the string itself; p >= 1 deletes the p-th character
    // (1-based) via two substrings — pure codegen'd builtins, no UDF
    val variants = base
      .select(col("fj_id"), col("fj_s"),
        explode(sequence(lit(0), length(col("fj_s")))).as("p"))
      .select(col("fj_id"), col("fj_s"),
        when(col("p") === 0, col("fj_s"))
          .otherwise(concat(
            col("fj_s").substr(lit(1), col("p") - 1),
            col("fj_s").substr(col("p") + 1, length(col("fj_s")))))
          .as("variant"))
    val a = variants.select(col("variant"),
      col("fj_id").as("id_a"), col("fj_s").as("s_a"))
    val b = variants.select(col("variant"),
      col("fj_id").as("id_b"), col("fj_s").as("s_b"))
    // distinct BEFORE the verify: a pair sharing several variants
    // (equal strings share all of them) is verified once, not len times
    a.join(b, Seq("variant"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b").distinct()
      // banded DP: gives up (-1) as soon as the distance exceeds 1
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), 1))
      .filter(col("dist") >= 0)
  }
}
