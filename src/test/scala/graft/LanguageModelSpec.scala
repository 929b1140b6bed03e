package graft

import org.apache.spark.sql.functions._
import graft.operators.LanguageModel

/** Bigram LM fluency scoring: hand-computed smoothed sums, OOV
  * accounting, degenerate docs, and partition-order determinism (BIGINT
  * arithmetic end to end). q266 gates it against the oracle. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "the cat sat", "the cat ran" -> bigrams:
  //   (the,cat):2  (cat,sat):1  (cat,ran):1
  // prefixes: the->2, cat->2 ; vocab = {the,cat,sat,ran} -> V=4
  private lazy val corpus = Seq((1L, "the cat sat"), (2L, "the cat ran"))
    .toDF("id", "text")
  private lazy val model = LanguageModel.train(corpus, "id", "text")

  test("training counts and vocabulary are exact") {
    assert(model.vocab == 4L)
    val bg = model.bigramCounts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bg == Map(("the", "cat") -> 2L, ("cat", "sat") -> 1L,
      ("cat", "ran") -> 1L))
    val pre = model.prefixCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pre == Map("the" -> 2L, "cat" -> 2L))
  }

  test("fluency is the hand-computed smoothed integer sum; OOV counted") {
    // doc "the cat sat well": pairs (the,cat) (cat,sat) (sat,well)
    //   (the,cat): (2+1)/(2+4) -> floor(1e6*3/6)  = 500000
    //   (cat,sat): (1+1)/(2+4) -> floor(1e6*2/6)  = 333333
    //   (sat,well): unseen w1  -> floor(1e6*1/(0+4)) = 250000, oov
    val out = LanguageModel.score(
      Seq((9L, "the cat sat well")).toDF("id", "text"), "id", "text", model)
      .collect()(0)
    assert(out.getLong(1) == 3L && out.getLong(2) == 1L)
    assert(out.getLong(3) == 500000L + 333333L + 250000L)
  }

  test("degenerate docs score (0, 0, 0); normalization matches the tokenizer") {
    val out = LanguageModel.score(
      Seq((1L, "single"), (2L, "   "), (3L, "THE   CAT"))
        .toDF("id", "text"), "id", "text", model)
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 0L && out(0).getLong(3) == 0L)
    assert(out(1).getLong(1) == 0L)
    // case-folding + whitespace collapse: "THE   CAT" is (the,cat)
    assert(out(2).getLong(1) == 1L && out(2).getLong(2) == 0L &&
      out(2).getLong(3) == 500000L)
  }

  test("partition layout cannot move the score (integer sums)") {
    val docs = spark.range(200).select($"id",
      concat(lit("the cat "), ($"id" % 13).cast("string"),
        lit(" sat the cat ran end"), ($"id" % 7).cast("string")).as("text"))
    val a = LanguageModel.score(docs.repartition(1), "id", "text", model)
    val b = LanguageModel.score(docs.repartition(7), "id", "text", model)
    assertSameRows(a, b)
  }
}
