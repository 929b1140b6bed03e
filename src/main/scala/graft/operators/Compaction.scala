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
  * state store uses, so readers never observe a missing directory.
  * Operates on one leaf directory; for a partitioned layout, compact the
  * partitions that need it (their file counts are what you monitor).
  * NOT concurrent-writer safe — schedule against quiesced paths, as any
  * table-maintenance job is. */
object Compaction {

  /** Returns the number of files written. */
  def compact(spark: SparkSession, path: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong).toInt
    val tmp = new Path(path + "_compact_tmp")
    val retired = new Path(path + "_compact_retired")
    fs.delete(tmp, true)
    fs.delete(retired, true)
    spark.read.parquet(path).coalesce(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(p, retired), s"retire failed for $p")
    require(fs.rename(tmp, p), s"promote failed for $tmp — " +
      s"previous data preserved at $retired")
    fs.delete(retired, true)
    nFiles
  }
}
