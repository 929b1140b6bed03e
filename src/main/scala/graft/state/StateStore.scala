package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet-backed keyed state snapshot — the engine's "collection"
  * (reference: lib/FirestoreWrapper.py:37-169).
  *
  * Writes are atomic via write-temp-then-rename on the Hadoop FileSystem
  * API (works on HDFS/object stores with atomic dir rename). Readers
  * therefore always see a complete snapshot.
  *
  * The single-writer model the reference assumes implicitly
  * (one pipeline per collection) is ENFORCED here: every mutation holds
  * a `<path>.lock` lease taken with an atomic create-exclusive, so a
  * second concurrent writer fails loudly instead of silently racing the
  * snapshot swap (two interleaved retire/promote sequences can delete
  * the only live snapshot). A lease older than `staleLockMs` is broken
  * on the next acquire — a crashed writer never wedges the store,
  * because the swap protocol leaves a loadable snapshot at every step.
  *
  * Scale design: the snapshot is hash-distributed on the primary key at
  * write time, so version chains and per-key updates are partition-local.
  * At 100 TB the rewrite narrows to touched partitions (partition the
  * snapshot by bucket(pk) and use dynamic partition overwrite) — full
  * rewrites here only because the test state is small.
  */
final class StateStore(spark: SparkSession, val path: String,
    staleLockMs: Long = 30L * 60 * 1000) {

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val dst = new Path(path)
  private val old = new Path(path + ".old")
  private val lock = new Path(path + ".lock")

  private def withLease[T](f: => T): T =
    WriterLease.withLease(fs, lock,
      s"pid=${ProcessHandle.current.pid} app=${spark.sparkContext.applicationId}",
      staleLockMs)(f)

  def exists: Boolean = fs.exists(dst) || fs.exists(old)

  /** The directory a reader should see: the primary path, or the retired
    * `.old` copy while a crash-interrupted swap is pending. Reads NEVER
    * mutate the store — a reader that renamed paths could race the single
    * writer mid-swap and break its promote. */
  private def livePath: Path = if (fs.exists(dst)) dst else old

  /** Load the current snapshot; empty 0-column frame if never written.
    * Falls back to the retired `.old` snapshot if a crash interrupted a
    * swap (see [[overwrite]]). */
  def load(): DataFrame =
    if (exists) spark.read.parquet(livePath.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], new StructType())

  /** Load with a guaranteed schema (missing snapshot -> empty frame of
    * that schema, so strategy joins typecheck on first run). */
  def load(schema: StructType): DataFrame =
    if (exists) spark.read.parquet(livePath.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Atomic snapshot replacement with no zero-snapshot window
    * (reference's batch atomicity: lib/FirestoreWrapper.py:102-123;
    * truncate: :37-41): write to `<path>.tmp`, retire the live snapshot to
    * `<path>.old`, promote tmp, delete the retired copy last. A crash at
    * any point leaves either the old or the new snapshot loadable — load()
    * prefers the promoted path and falls back to `.old`. */
  def overwrite(df: DataFrame, partitions: Int = 0): Unit =
    withLease { overwriteLocked(df, partitions) }

  /** The swap body, called with the lease already held ([[overwrite]]
    * acquires it; [[applyActions]] holds ONE lease across its
    * read-modify-write so no writer can interleave between its load and
    * its swap). */
  private def overwriteLocked(df: DataFrame, partitions: Int = 0): Unit = {
    val tmp = new Path(path + ".tmp")
    val out = if (partitions > 0) df.repartition(partitions) else df
    // 1. materialize first — the plan may be reading the live snapshot
    //    (possibly .old after a crash), which must stay untouched until
    //    the job finishes
    out.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dst)) {
      // normal path: .old (if present) is stale junk because dst is live
      if (fs.exists(old)) fs.delete(old, true)
      if (!fs.rename(dst, old))
        throw new java.io.IOException(s"retire $dst -> $old failed")
    }
    // crash-recovered path: dst absent, .old is live — keep it as the
    // backup until the new snapshot is promoted, then drop it.
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"atomic rename $tmp -> $dst failed")
    if (fs.exists(old)) fs.delete(old, true)
  }

  def truncate(): Unit = withLease {
    if (fs.exists(dst)) fs.delete(dst, true)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Batch atomic write (reference: lib/FirestoreWrapper.py:102-123): a
    * heterogeneous action frame — `_action` in {create, update, delete}
    * plus data columns — applied in ONE atomic snapshot rewrite.
    *
    *  - delete: remove rows matching `pk` (reference: :64-70)
    *  - update: merge-upsert — provided non-null fields overwrite, absent
    *    fields survive, missing keys are created, matching Firestore's
    *    `set(merge=True)` (reference: :54-62)
    *  - create: append as new rows (auto-id add, reference: :43-52)
    *
    * The reference batches at most 500 ops per atomic commit; here the
    * whole frame is one commit because the snapshot swap is the atom.
    */
  def applyActions(actions: DataFrame, pk: String): Unit = withLease {
    import org.apache.spark.sql.Column
    val dataCols = actions.columns.filterNot(_ == "_action").toSeq
    val creates = actions.filter(col("_action") === "create").drop("_action")
    val updates = actions.filter(col("_action") === "update").drop("_action")
    val deletes = actions.filter(col("_action") === "delete").select(col(pk))
    val state0 = load()
    // align: add action columns missing from state as typed nulls, but
    // KEEP every existing state column — merge semantics must never drop
    // persisted columns the action frame doesn't mention
    val state =
      if (state0.columns.isEmpty) creates.limit(0)
      else dataCols.filterNot(state0.columns.contains)
        .foldLeft(state0) { (df, c) =>
          df.withColumn(c, lit(null).cast(actions.schema(c).dataType))
        }
    val outCols = state.columns.toSeq
    val kept = state.join(deletes, Seq(pk), "left_anti")
    val u = updates.select((col(pk).as("_upk") +:
      dataCols.filterNot(_ == pk).map(c => col(c).as(s"_u_$c"))): _*)
    val merged = kept.join(u, col(pk) === col("_upk"), "full_outer")
      .select(outCols.map { c =>
        val merge: Column =
          if (c == pk) coalesce(col(pk), col("_upk"))
          else if (dataCols.contains(c)) coalesce(col(s"_u_$c"), col(c))
          else col(c) // state-only column: survives untouched
        merge.as(c)
      }: _*)
    overwriteLocked(merged.unionByName(creates, allowMissingColumns = true))
  }

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
