package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Annotation aggregation for labeling pipelines (RLHF preference data,
  * classification gold sets): collapse many per-rater votes into one
  * label per item, with the agreement evidence a curator needs to route
  * low-consensus items back for re-review.
  *
  * Everything is exact integer counting plus one IEEE divide per item,
  * so any engine reproduces the report bit-for-bit; ties break
  * DETERMINISTICALLY (lexicographic min among the tied labels) — a
  * "first seen wins" rule would depend on partition order and make the
  * aggregated gold set unstable across reruns.
  */
object Labels {

  /** Majority-vote aggregation: one row per item with the winning label
    * and consensus stats. Each input row is ONE vote (callers dedupe
    * per-rater revisions upstream if their tool emits them); NULL labels
    * are abstentions and are ignored, but an item whose every vote is an
    * abstention still reports (with NULL label and zero counts) — a
    * silently dropped item would read as "never annotated".
    *
    * Output per item: `n_votes` (non-null votes), `n_labels` (distinct
    * labels voted), `label` (winner), `label_votes` (winner's count),
    * `agreement` (winner share of votes, the per-item consensus signal).
    *
    * Scale shape: one partial-aggregated count per (item, label) — the
    * only data-sized shuffle — then a window over the per-item label
    * rows (bounded by the label vocabulary, not the vote count) that
    * the optimizer executes as WindowGroupLimit: each task keeps one
    * candidate winner per item before the exchange. */
  def majorityVote(votes: DataFrame, itemCol: String, labelCol: String): DataFrame = {
    val counts = votes
      .select(col(itemCol).as("item"), col(labelCol).cast("string").as("_lab"))
      .groupBy(col("item"), col("_lab"))
      .agg(count(col("_lab")).as("_c"))
    // NULL labels (abstentions) carry _c = 0 from count(col): they can
    // never beat a real label, but keep all-abstention items present
    val w = Window.partitionBy(col("item"))
      .orderBy(col("_c").desc, col("_lab").asc_nulls_last)
    counts
      .withColumn("_rn", row_number().over(w))
      .withColumn("_tot", sum(col("_c")).over(Window.partitionBy(col("item"))))
      .withColumn("_nl", sum(when(col("_lab").isNotNull, 1L).otherwise(0L))
        .over(Window.partitionBy(col("item"))))
      .filter(col("_rn") === 1)
      .select(col("item"),
        col("_tot").as("n_votes"),
        col("_nl").as("n_labels"),
        col("_lab").as("label"),
        col("_c").as("label_votes"),
        when(col("_tot") > 0, col("_c").cast("double") /
          col("_tot").cast("double")).as("agreement"))
  }

  /** FLEISS-kappa inter-rater agreement (pairwise form, variable rater
    * counts): the one-number answer to "do the annotators agree more
    * than chance?" before a vote-aggregated gold set ([[majorityVote]])
    * is trusted. Observed agreement `po` is the fraction of agreeing
    * rater PAIRS — Σ_i Σ_c n_ic(n_ic−1) / Σ_i n_i(n_i−1) — and chance
    * agreement `pe` the squared label-share sum Σ_c t_c² / T², both
    * assembled from EXACT integer sums with one IEEE divide each, so
    * every engine reproduces the report bit-for-bit (a per-item
    * double-averaged form would sum doubles in partition order).
    * NULL labels are abstentions; items with fewer than two votes have
    * no pairs and take no part (standard for the pairwise estimator).
    * Returns 1 row: (n_items, n_votes, po, pe, kappa), ratios on the
    * 1e-6 lattice; kappa is NULL when pe = 1 (a single label corpus-
    * wide — agreement beyond chance is undefined, not zero).
    *
    * Scale shape: one partial-aggregated (item, label) count, one
    * item-sized aggregation, one label-sized aggregation — nothing
    * larger than the count frame ever shuffles. */
  def fleissKappa(votes: DataFrame, itemCol: String, labelCol: String): DataFrame = {
    val counts = votes
      .select(col(itemCol).as("_it"), col(labelCol).cast("string").as("_lab"))
      .filter(col("_lab").isNotNull)
      .groupBy(col("_it"), col("_lab"))
      .agg(count(lit(1)).as("_c"))
    val perItem = counts.groupBy(col("_it")).agg(
      sum(col("_c")).as("_n"),
      sum(col("_c") * (col("_c") - 1)).as("_agree"))
      .filter(col("_n") >= 2)
    val itemSums = perItem.agg(
      count(lit(1)).as("n_items"),
      sum(col("_n")).as("n_votes"),
      sum(col("_agree")).as("_ag"),
      sum(col("_n") * (col("_n") - 1)).as("_pairs"))
    // label totals over the SAME multi-vote item set po is built from
    val labelSums = counts.join(perItem.select("_it"), "_it")
      .groupBy(col("_lab")).agg(sum(col("_c")).as("_t"))
      .agg(sum(col("_t") * col("_t")).as("_t2"), sum(col("_t")).as("_T"))
    val lattice6 = (c: Column) => floor(c * 1000000 + 0.5) / 1000000
    val po = col("_ag").cast("double") / col("_pairs").cast("double")
    val pe = col("_t2").cast("double") /
      (col("_T").cast("double") * col("_T").cast("double"))
    itemSums.crossJoin(labelSums)
      .select(col("n_items"), col("n_votes"),
        lattice6(po).as("po"), lattice6(pe).as("pe"),
        when(pe < 1.0, lattice6((po - pe) / (lit(1.0) - pe))).as("kappa"))
  }
}
