package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV export with schema union and priority column ordering
  * (reference: lib/utils.py:34-67): the header is the union of every
  * record's keys (union `:44-47`), priority columns lead in given order,
  * the rest follow sorted, missing values are empty (`:49-55`).
  */
object Export {

  /** Order columns: priority first (in order, when present), rest sorted. */
  def orderedColumns(all: Seq[String], priority: Seq[String]): Seq[String] = {
    val present = all.toSet
    val lead = priority.filter(present)
    lead ++ (all.toSet -- lead).toSeq.sorted
  }

  /** Union the schemas of many frames (ragged key-sets -> nulls), order
    * columns, export one CSV. */
  def writeCsv(frames: Seq[DataFrame], priority: Seq[String], path: String): Unit = {
    require(frames.nonEmpty, "no frames to export")
    val unioned = frames.reduce(_.unionByName(_, allowMissingColumns = true))
    val cols = orderedColumns(unioned.columns.toSeq, priority)
    unioned.select(cols.map(col): _*)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  /** The ordered projection alone (testable without IO). */
  def project(df: DataFrame, priority: Seq[String]): DataFrame =
    df.select(orderedColumns(df.columns.toSeq, priority).map(col): _*)

  /** Sharded JSONL export — the standard training-corpus handoff format:
    * one JSON object per line, files capped at `maxRecordsPerFile` so
    * shard size stays loader-friendly regardless of partition count.
    * to_json drops null fields, which matches the sparse-record shape the
    * engine ingests (absent ≡ null). Columns export in the same
    * priority-then-sorted order as the CSV path. */
  def writeJsonl(df: DataFrame, priority: Seq[String], path: String,
      maxRecordsPerFile: Long = 100000): Unit =
    project(df, priority)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .json(path)

  /** Columnar ORC export — the typed interchange format for downstream
    * engines that want schema + stats without a parquet dependency (ORC
    * readers ship in Hive/Trino/Presto). Unlike the text paths above,
    * types survive natively (timestamps keep precision, doubles are not
    * re-parsed), so round-trip fidelity is structural, not textual. Same
    * priority-then-sorted column ordering as CSV/JSONL. */
  def writeOrc(df: DataFrame, priority: Seq[String], path: String,
      maxRecordsPerFile: Long = 100000): Unit =
    project(df, priority)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .orc(path)
}
