package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.PipelineConfig
import graft.operators.Strategies

/** The 100 TB state path: the snapshot is partitioned by
  * `_bucket = pmod(hash(pk), nBuckets)`, and an incremental run rewrites
  * ONLY the buckets that contain source keys, via dynamic partition
  * overwrite. Unlike [[StateStore]] (single-dir atomic swap, rewritten
  * whole), cost per run scales with the touched key range, not the table:
  *
  *  - the state read prunes to touched buckets (PartitionFilters on the
  *    scan — no IO for untouched buckets);
  *  - the strategy join runs only over touched-bucket state;
  *  - the write replaces only touched bucket directories (Spark's
  *    dynamic partitionOverwriteMode), each committed via the normal
  *    parquet job commit protocol.
  *
  * Bucket count is a layout decision: pick so that one bucket's data fits
  * comfortably in executor memory at target scale (e.g. 100 TB / 65536
  * buckets ~ 1.5 GB). The reference's target has no such concept — every
  * run touched every record (reference: lib/UpdateStrategies.py:216-248).
  */
final class BucketedStateStore(spark: SparkSession, val path: String, nBuckets: Int,
    staleLockMs: Long = 30L * 60 * 1000) {

  require(nBuckets > 0, "nBuckets must be positive")

  private val fs = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Same single-writer lease as [[StateStore]] — a mergeRun is a
    * read-modify-write of the touched buckets, so two interleaved
    * writers could base their rewrites on each other's pre-images. */
  private def withLease[T](f: => T): T =
    WriterLease.withLease(fs, new org.apache.hadoop.fs.Path(path + ".lock"),
      s"pid=${ProcessHandle.current.pid} app=${spark.sparkContext.applicationId}",
      staleLockMs)(f)

  def exists: Boolean = fs.exists(new org.apache.hadoop.fs.Path(path))

  private def bucketOf(pk: String) = pmod(hash(col(pk)), lit(nBuckets))

  /** Full load (all buckets). */
  def load(): DataFrame =
    if (exists) spark.read.parquet(path)
    else spark.emptyDataFrame

  /** Load only the buckets containing `src`'s keys — partition pruning
    * keeps untouched buckets unread. */
  def loadTouched(src: DataFrame, pk: String): DataFrame = {
    val touched = src.select(bucketOf(pk).as("_bucket")).distinct()
      .collect().map(_.getInt(0))
    val all = load()
    if (all.columns.isEmpty) all
    else all.filter(col("_bucket").isin(touched.toIndexedSeq: _*))
  }

  /** Initial full write, partitioned by bucket. */
  def initialize(df: DataFrame, pk: String): Unit = withLease {
    initializeLocked(df, pk)
  }

  private def initializeLocked(df: DataFrame, pk: String): Unit =
    df.withColumn("_bucket", bucketOf(pk))
      .repartition(col("_bucket"))
      .write.mode("overwrite").partitionBy("_bucket").parquet(path)

  /** Update types whose semantics are safe against a PARTIAL source: they
    * never delete/flag/demote state rows merely because a key is absent
    * from the source. Whole-source strategies (deletes, soft-delete
    * flagging, full refresh, set versioning) would silently misbehave on
    * a touched-bucket slice — keys in untouched buckets could never be
    * deleted while same-fate keys in touched buckets would be. */
  private val deltaSafe: Set[graft.UpdateType] = Set(
    graft.UpdateType.UpsertChecksum, graft.UpdateType.Append,
    graft.UpdateType.VersionedChecksum, graft.UpdateType.Replace)

  /** One incremental strategy run: read touched buckets, apply the
    * strategy to that slice, rewrite only those bucket directories.
    * Restricted to delta-safe update types (see [[deltaSafe]]); for
    * whole-source semantics use [[StateStore]] and rewrite the snapshot. */
  def mergeRun(src: DataFrame, cfg: PipelineConfig): Unit = withLease {
    require(deltaSafe(cfg.updateType),
      s"${cfg.updateType.value} needs the whole source; bucketed incremental " +
        "runs support only delta-safe update types " +
        deltaSafe.map(_.value).mkString("(", ", ", ")"))
    mergeRunLocked(src, cfg)
  }

  private def mergeRunLocked(src: DataFrame, cfg: PipelineConfig): Unit = {
    if (!exists) { initializeLocked(applyStrategy(src, spark.emptyDataFrame, cfg), cfg.primaryKey); return }
    val state = loadTouched(src, cfg.primaryKey).drop("_bucket")
    val newSlice = applyStrategy(src, state, cfg)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      newSlice.withColumn("_bucket", bucketOf(cfg.primaryKey))
        .repartition(col("_bucket"))
        .write.mode("overwrite").partitionBy("_bucket").parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  private def applyStrategy(src: DataFrame, state: DataFrame, cfg: PipelineConfig): DataFrame =
    Strategies.get(cfg.updateType)(
      src, Strategies.purgeOtherUpdateTypes(Strategies.alignState(state, src), cfg), cfg)
}
