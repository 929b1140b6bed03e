package graft.operators

import org.apache.spark.sql.DataFrame
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
}
