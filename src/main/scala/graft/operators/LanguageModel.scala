package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language-model scoring — the fluency tier of a
  * training-data quality pipeline (the public CCNet/KenLM recipe: score
  * candidate documents under a model trained on a trusted reference
  * corpus; low-fluency and high-OOV documents are filter candidates).
  *
  * Deliberately LOG-FREE: the score is the integer-scaled sum of add-one
  * smoothed transition probabilities, `Σ floor(scale·(c12+1)/(c1+V))`,
  * computed in BIGINT integer division — a monotone fluency signal whose
  * value is bit-identical across engines and partition orders (a
  * log-perplexity variant would ride libm's last-ulp differences and sum
  * order; SURVEY §oracle-parity forbids both on gated paths). OOV rate
  * (bigrams unseen in the model) rides the same pass.
  *
  * Scale shape: the model is vocabulary-bounded — two count tables
  * (bigram, unigram-as-prefix) that at 100 TB sit on the BROADCAST side
  * of the scoring joins while documents stream; scoring is
  * tokenize → adjacent-pair explode → two equi-joins → per-doc
  * aggregate, all Catalyst-native (no UDF). Training is one
  * groupBy-count over the reference slice.
  *
  * Tokenization matches the engine's text tier (and the DuckDB oracles):
  * lower, trim, whitespace-collapse, split on single spaces.
  */
object LanguageModel {

  def tokens(c: Column): Column =
    split(regexp_replace(lower(trim(c)), "\\s+", " "), " ")

  /** Adjacent token pairs per row: (id, w1, w2); rows with fewer than
    * two tokens contribute nothing. */
  def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x AS w1, w[i + 1] AS w2))"))
        .as("pr"))
      .select(col(idCol), col("pr.w1").as("w1"), col("pr.w2").as("w2"))

  /** Trained model: bigram counts, prefix (unigram-as-w1) counts, and
    * the corpus vocabulary size `V` (the smoothing denominator). */
  final case class Model(bigramCounts: DataFrame, prefixCounts: DataFrame,
      vocab: Long)

  /** Train on `corpus`. The prefix count is the sum of bigram counts
    * sharing the w1 — the proper conditional denominator, so
    * Σ_w2 P(w2|w1) = 1 under add-one smoothing. `vocab` is one driver
    * scalar (a count, not data). */
  def train(corpus: DataFrame, idCol: String, textCol: String): Model = {
    val bg = bigrams(corpus, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val pre = bg.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val v = corpus.select(explode(tokens(col(textCol))).as("t"))
      .where(col("t") =!= "").agg(countDistinct(col("t"))).head().getLong(0)
    Model(bg, pre, v)
  }

  /** Score every document: `n_pairs`, `oov` (bigrams with no model
    * count), and `fluency` = Σ floor(scale·(c12+1)/(c1+V)) over its
    * bigrams — BIGINT arithmetic end to end. Documents with fewer than
    * two tokens score (0, 0, 0). */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model,
      scale: Long = 1000000L): DataFrame = {
    val pairs = bigrams(docs, idCol, textCol)
    val scored = pairs
      .join(model.bigramCounts, Seq("w1", "w2"), "left")
      .join(model.prefixCounts, Seq("w1"), "left")
      .select(col(idCol),
        coalesce(col("c12"), lit(0L)).as("c12"),
        coalesce(col("c1"), lit(0L)).as("c1"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("c12") === 0L, 1L).otherwise(0L)).as("oov"),
        sum(expr(s"($scale * (c12 + 1)) div (c1 + ${model.vocab})"))
          .as("fluency"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("oov"), lit(0L)).as("oov"),
        coalesce(col("fluency"), lit(0L)).as("fluency"))
  }
}
