package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational answer to the small-files
  * problem every long-running 100 TB pipeline accumulates: streaming
  * sinks, dynamic-partition appends, and per-batch index updates each
  * leave files sized by the BATCH, not by what a scan wants. Thousands
  * of tiny files tax driver-side listing, the scheduler (one task per
  * tiny split), and per-file parquet footer/dictionary overhead.
  *
  * [[compact]] rewrites one parquet directory into
  * `ceil(bytes / targetBytes)` files via `coalesce` — deliberately NOT
  * `repartition`: maintenance must not pay a network shuffle — and swaps
  * the result in with the same retire-then-promote rename shape the
  * state store uses. A crashed swap self-heals on the next call (the
  * retired copy is promoted back before anything is deleted). The swap
  * has a brief window between the two renames where the path does not
  * exist, so schedule against quiesced paths — readers AND writers, as
  * any table-maintenance job is. Operates on one leaf directory; for a
  * partitioned layout, compact the partitions whose file counts warrant
  * it. */
object Compaction {

  /** Returns the number of files written. */
  def compact(spark: SparkSession, path: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val tmp = new Path(path + "_compact_tmp")
    val retired = new Path(path + "_compact_retired")
    // crashed-swap recovery FIRST: if a prior run died between its two
    // renames, the only copy of the data lives at `retired` — promote it
    // back before any delete can touch it
    if (!fs.exists(p) && fs.exists(retired))
      require(fs.rename(retired, p), s"recovery promote failed for $retired")
    require(fs.exists(p), s"$p does not exist and no retired copy to recover")
    fs.delete(tmp, true)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong).toInt
    spark.read.parquet(path).coalesce(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // only now is dropping a leftover retired copy safe: the live dir
    // exists and the replacement is fully written
    fs.delete(retired, true)
    require(fs.rename(p, retired), s"retire failed for $p")
    require(fs.rename(tmp, p), s"promote failed for $tmp — " +
      s"previous data preserved at $retired")
    fs.delete(retired, true)
    nFiles
  }
}
