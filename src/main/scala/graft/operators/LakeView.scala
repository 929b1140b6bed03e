package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper

/** Incrementally-maintained materialized views over a record lake: a
  * per-key additive aggregate (count + sums) that refreshes by
  * consuming ONLY the snapshot deltas since its recorded watermark —
  * [[LakeChangelog]]'s signed Z-relations folded into persisted state,
  * so keeping the view current costs ∝ what changed, never a rescan of
  * the table. The continuously-maintained-view story (q286/q288's IVM
  * algebra + q289/q294's change feeds) packaged as one operator with
  * durable state.
  *
  * Crash-safe refresh without transactions: the new state lands in a
  * versioned data directory (`data-v<toVersion>`), and a tiny pointer
  * file (`_view.json`: watermark + directory) flips LAST — a crash
  * before the flip leaves the old pointer and an orphan directory the
  * next refresh re-derives and replaces (re-consuming the same deltas
  * onto the OLD state — idempotent because the pointer and the state it
  * names always advance together); stale directories are swept on the
  * next successful flip. Readers resolve the pointer, so they never see
  * a half-written state. */
object LakeView {

  final case class Refresh(fromVersion: Long, toVersion: Long,
      groupsChanged: Long)

  private def pointerPath(viewPath: String) =
    new Path(viewPath, "_view.json")

  private case class Pointer(watermark: Long, dir: String)

  private def readPointer(spark: SparkSession,
      viewPath: String): Option[Pointer] = {
    val p = pointerPath(viewPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      in.close()
      val root = new ObjectMapper().readTree(bytes.toString("UTF-8"))
      Some(Pointer(root.get("watermark").asLong(), root.get("dir").asText()))
    }
  }

  /** The view's current contents: `keyCols`, `n` (row count), and one
    * `sum_<col>` per value column. Empty before the first refresh. */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    readPointer(spark, viewPath) match {
      case Some(ptr) => spark.read.parquet(s"$viewPath/${ptr.dir}")
      case None => throw new IllegalStateException(
        s"no materialized view at $viewPath — refreshAggregate first")
    }

  /** Advance the view to the table's newest snapshot, consuming only
    * `(watermark, head]` deltas. A no-op (0 changed) when the table has
    * not snapshotted since the last refresh. */
  def refreshAggregate(spark: SparkSession, tablePath: String,
      fieldTypes: String, viewPath: String,
      keyCols: Seq[String], sumCols: Seq[String]): Refresh = {
    require(keyCols.nonEmpty, "refreshAggregate needs key columns")
    val conf = spark.sparkContext.hadoopConfiguration
    val tdir = new Path(tablePath)
    val head = graft.sources.v2.Snapshots
      .versions(tdir.getFileSystem(conf), tdir).lastOption.getOrElse(
        throw new IllegalStateException(
          s"table $tablePath has no snapshots — LakeSnapshots.commit " +
            "first (the view watermarks on snapshot versions)"))
    val ptr = readPointer(spark, viewPath)
    val from = ptr.map(_.watermark).getOrElse(0L)
    require(head >= from,
      s"view watermark $from is ahead of the table head $head — the " +
        "table's snapshot history was reset under the view")
    if (head == from) return Refresh(from, head, 0L)

    val delta = LakeChangelog.changes(spark, tablePath, fieldTypes, from, head)
    val deltaAgg = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(col("m")).as("dn"),
        sumCols.map(c => sum(col("m") * col(c)).as(s"dsum_$c")): _*)
    val old = ptr match {
      case Some(p) => spark.read.parquet(s"$viewPath/${p.dir}")
      case None =>
        val empty = keyCols.map(k => col(k)) ++ (lit(0L).as("n") +:
          sumCols.map(c => lit(0.0).as(s"sum_$c")))
        delta.limit(0).select(empty: _*)
    }
    val merged = old.join(deltaAgg, keyCols, "full")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n")) ++
        sumCols.map(c =>
          (coalesce(col(s"sum_$c"), lit(0.0)) +
            coalesce(col(s"dsum_$c"), lit(0.0))).as(s"sum_$c")): _*)
      .filter(col("n") > 0)
    val changed = deltaAgg.count()

    // versioned state + pointer flip (see object doc for crash safety)
    val dataDir = s"data-v$head"
    merged.write.mode("overwrite").parquet(s"$viewPath/$dataDir")
    val fs = new Path(viewPath).getFileSystem(conf)
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("watermark", head)
    root.put("dir", dataDir)
    val out = fs.create(pointerPath(viewPath), true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
    // sweep superseded state directories (the pointer no longer names them)
    fs.listStatus(new Path(viewPath)).filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("data-v") && p.getName != dataDir)
      .foreach(p => fs.delete(p, true))
    Refresh(from, head, changed)
  }
}
