package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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

  /** Snapshot RETENTION ladder — which versions a state store keeps
    * when history must be bounded (the GC plan behind the versioned
    * strategies' ever-growing version chains): per key, keep the newest
    * `keepLast` versions, plus each calendar day's newest within
    * `keepDaily` days, plus each ISO-epoch week's newest within
    * `keepWeekly` weeks — the classic last/daily/weekly backup ladder.
    * Ages are measured from the KEY'S OWN newest version (not wall
    * clock), so the plan is a pure function of the frame — rerunnable,
    * engine-checkable, and testable without freezing time.
    *
    * Returns every input row with `keep` and a precedence-ordered
    * `reason` (last > daily > weekly, NULL when dropped). All
    * arithmetic is integer floor-epoch day/week math; ties at the same
    * timestamp break by id desc (newest-id wins, deterministic).
    *
    * Scale shape: ONE hash exchange on the key reused by every window
    * (same partitioning), frames are version-chain-sized. */
  def retentionPlan(versions: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String], tsCol: String, idCol: String,
      keepLast: Int, keepDaily: Int, keepWeekly: Int): org.apache.spark.sql.DataFrame = {
    require(keepLast >= 1, s"keepLast $keepLast must be >= 1")
    require(keepDaily >= 0 && keepWeekly >= 0,
      "keepDaily/keepWeekly must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val sec = col(tsCol).cast("long")
    val day = expr(s"CAST($tsCol AS LONG) div 86400")
    val week = expr(s"CAST($tsCol AS LONG) div 604800")
    val key = keyCols.map(col)
    val newestFirst = Seq(sec.desc, col(idCol).desc)
    val wKey = Window.partitionBy(key: _*)
    val rank = row_number().over(wKey.orderBy(newestFirst: _*))
    val dayRank = row_number().over(
      Window.partitionBy((key :+ day): _*).orderBy(newestFirst: _*))
    val weekRank = row_number().over(
      Window.partitionBy((key :+ week): _*).orderBy(newestFirst: _*))
    val maxDay = max(day).over(wKey)
    val maxWeek = max(week).over(wKey)
    val isLast = rank <= keepLast
    val isDaily = lit(keepDaily > 0) && dayRank === 1 &&
      day > maxDay - keepDaily
    val isWeekly = lit(keepWeekly > 0) && weekRank === 1 &&
      week > maxWeek - keepWeekly
    versions
      .withColumn("keep", isLast || isDaily || isWeekly)
      .withColumn("reason", when(isLast, "last")
        .when(isDaily, "daily").when(isWeekly, "weekly"))
      .select((key :+ col(idCol) :+ sec.as("sec") :+ col("keep") :+
        col("reason")): _*)
  }

  /** Compaction PLANNING over a file/partition inventory — the metadata
    * half [[compact]] executes one directory at a time: assign each
    * inventory row (one file / ingest partition, with its size) to a
    * compaction group, packing ADJACENT rows in `orderCol` order:
    * `grp = floor(exclusive-prefix-sum(size) / target)`. The invariant
    * is adjacent packing with bounded overshoot — a group's byte total
    * exceeds `targetBytes` by at most one input (an input larger than
    * the target spills past its group boundary rather than forcing a
    * group of its own; its successor still starts a fresh group). Packing
    * adjacent inputs — rather than bin-packing by size — is deliberate:
    * it preserves the inventory's sort locality, so min/max pruning on
    * the order column keeps working on the compacted files (size-greedy
    * FFD would interleave time ranges and destroy pruning).
    *
    * The prefix sum rides [[GlobalOrder.withRunningTotals]] — range
    * exchange + per-partition running sums + broadcast offsets, NO
    * SinglePartition stage — so the plan holds even for a billion-file
    * lake inventory, where the naive `Window.orderBy` form would
    * silently collapse the whole inventory into one task. Exact long
    * arithmetic throughout (`div`, not a double floor — a double
    * quotient loses bits past 2^53 on a large lake's cumulative bytes).
    * Output: every input column plus `grp`. */
  def planSequential(inventory: org.apache.spark.sql.DataFrame,
      orderCol: String, sizeCol: String, targetBytes: Long): org.apache.spark.sql.DataFrame = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    GlobalOrder.withRunningTotals(inventory, Seq(col(orderCol)), sizeCol,
        cumCol = "_cum_before")
      .withColumn("grp", expr(s"_cum_before div ${targetBytes}L"))
      .drop("_cum_before")
  }

  /** The per-group rollup a compaction executor consumes: input count,
    * total bytes, and the order-column range each output file will
    * cover (the pruning-relevant metadata). */
  def planSummary(inventory: org.apache.spark.sql.DataFrame,
      orderCol: String, sizeCol: String, targetBytes: Long): org.apache.spark.sql.DataFrame =
    planSequential(inventory, orderCol, sizeCol, targetBytes)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_inputs"),
        sum(col(sizeCol).cast("long")).as("group_bytes"),
        min(col(orderCol)).as(s"${orderCol}_min"),
        max(col(orderCol)).as(s"${orderCol}_max"))
}
