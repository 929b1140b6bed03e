package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based dedup with latest-wins ordering
  * (reference: lib/DataProcessor.py:65-97): group by primary key, keep the
  * record with the greatest order column; records missing the order column
  * rank lowest (the reference defaults them to "now", which makes them win
  * only against other missing values — here nulls sort last, ties break on
  * a stable tiebreaker so reruns are deterministic).
  *
  * One shuffle on pk. At scale this is the same hash partitioning the
  * downstream state join needs, so Catalyst reuses the exchange when the
  * dedup feeds a join on the same key.
  */
object Dedup {

  /** Keep the latest row per `pk`, ordered by `orderCol` desc (nulls
    * last), ties broken by `tiebreak` desc for determinism. When no
    * tiebreak column is given, ties fall back to a stable content hash of
    * every column, so reruns of the same input always keep the same
    * witness row (same checksums/doc_ids downstream). */
  def latestWins(df: DataFrame, pk: String, orderCol: String,
      tiebreak: Option[String] = None): DataFrame = {
    val tb = tiebreak.map(col(_).desc).getOrElse(
      graft.functions.Checksums.portableRowChecksum(df.columns.toSeq).desc)
    val w = Window.partitionBy(col(pk)).orderBy(col(orderCol).desc_nulls_last, tb)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact whole-row dedup (keeps one arbitrary-but-deterministic witness
    * per distinct value tuple). */
  def exact(df: DataFrame): DataFrame = df.distinct()
}
