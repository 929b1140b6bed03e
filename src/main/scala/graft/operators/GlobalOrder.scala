package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contiguous global sequence-id assignment under a total order — the
  * curriculum-ordering / corpus-sequencing primitive ("sort the corpus by
  * difficulty and number every document 0..N-1 so shard `i` of the
  * training run reads positions [i*S, (i+1)*S)").
  *
  * The naive formulation — `row_number() OVER (ORDER BY ...)` with an
  * empty PARTITION BY — is the single worst scale trap in Spark SQL: an
  * un-partitioned window collapses the whole dataset into ONE task
  * (Exchange SinglePartition), which at 100 TB is an executor OOM, not a
  * slow query. This operator produces the identical numbering with no
  * single-partition stage, as the reference's Python sort-and-enumerate
  * loop would be re-expressed at cluster scale
  * (`/root/reference/lib/AirtableToDatastore.py:60` iterates records in
  * one process — same semantics, zero scale).
  */
object GlobalOrder {

  /** Assign `outCol` = 0..N-1 following the total order of `sortCols`
    * (which MUST be a total order — include a unique tiebreaker column,
    * or equal rows get an arbitrary stable order within their tie group).
    *
    * Shape: range-repartition on the sort key (each partition owns a
    * contiguous key range, ranges ordered by partition id), sort within
    * partitions, then number each row as
    * `partition offset + local offset`. Local offsets come from
    * `monotonically_increasing_id()`, whose documented layout is
    * (partition id << 33) | per-partition record counter — the counter
    * IS the 0-based position within the sorted partition. Partition
    * offsets are the running sum of per-partition counts: one tiny
    * aggregate (numPartitions rows) joined back by broadcast. Total cost:
    * ONE data shuffle (the range exchange) + one numPartitions-row side
    * job — vs the naive window's all-data-to-one-task collapse.
    *
    * The frame is EAGERLY local-checkpointed before the counts job:
    * range boundaries are sampled per execution, so the two passes must
    * observe the SAME physical partitioning (a live lineage could
    * re-sample different boundaries between the counts job and the
    * output job and mis-stitch offsets). localCheckpoint truncates the
    * lineage to stored blocks, and — unlike a Dataset persist, which
    * pins a CacheManager entry until someone unpersists it — those
    * RDD-level blocks ARE released by ContextCleaner once the returned
    * frame is garbage-collected. */
  def sequenceIds(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "global_pos"): DataFrame = {
    require(sortCols.nonEmpty, "sequenceIds needs at least one sort column")
    val taken = Seq(outCol, "_pid", "_local", "_offset").filter(df.columns.contains)
    require(taken.isEmpty,
      s"input already has column(s) ${taken.mkString(", ")} that sequenceIds needs")
    val np = df.sparkSession.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_local", monotonically_increasing_id()
        .bitwiseAND(lit((1L << 33) - 1)))
      .localCheckpoint(true)
    // numPartitions rows: cumulative counts in partition-id order (range
    // partitions are emitted in key order, so pid order == key order)
    val counts = sorted.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_pid")).collect()
    val offsets = counts.scanLeft(0L)(_ + _.getLong(1)).init
    val offsetRows = counts.map(_.getInt(0)).zip(offsets).toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsetRows.toDF("_pid", "_offset")
    sorted
      .join(broadcast(offsetDf), Seq("_pid"))
      .withColumn(outCol, col("_offset") + col("_local"))
      .drop("_pid", "_local", "_offset")
  }

  /** Weight-balanced SHARD assignment under a total order — the
    * training-shard writer's planning step ("pack the ordered corpus
    * into ~`shardWeight`-char files"): each row's shard is
    * `floor(exclusive-prefix-sum(weight) / shardWeight)`, so shards are
    * contiguous runs of the global order and a row belongs to the shard
    * its first byte lands in — exactly the fixed-size-shard rule, with
    * shard boundaries DERIVED from the data instead of guessed.
    *
    * The naive form is a global-window running sum — the same
    * SinglePartition collapse [[sequenceIds]] exists to avoid. Shape
    * here: one range exchange + in-partition sort (per-partition running
    * sums are a single iterator pass — genuine per-partition imperative
    * logic, the one place `mapPartitions` is the right tool), then a
    * numPartitions-row totals job whose running sum becomes broadcast
    * offsets; `global prefix = partition offset + local prefix`. Same
    * eager localCheckpoint as [[sequenceIds]] and for the same reason:
    * both passes must observe one sampled range partitioning.
    *
    * NULL weights count as 0 (a weightless row consumes no shard
    * budget but still gets the shard at its position). */
  def prefixShards(df: DataFrame, sortCols: Seq[Column], weightCol: String,
      shardWeight: Long, outCol: String = "shard"): DataFrame = {
    require(shardWeight > 0, s"shardWeight $shardWeight must be positive")
    require(!df.columns.contains(outCol),
      s"input already has the $outCol column prefixShards emits")
    withRunningTotals(df, sortCols, weightCol, cumCol = "_cumg")
      // integer division, not a double floor: prefix sums are exact
      // longs and both operands are non-negative, so `div` is exact at
      // any corpus size (a double quotient loses bits past 2^53)
      .withColumn(outCol, expr(s"_cumg div ${shardWeight}L"))
      .drop("_cumg")
  }

  /** Global EXCLUSIVE running totals of `weightCol` under a total order
    * — the shared engine behind [[prefixShards]] and the vocabulary-
    * coverage cutoff: every row gains `cumCol` = sum of all earlier
    * rows' weights (and optionally `posCol` = its 0-based global rank),
    * with NO SinglePartition stage. Same shape as [[sequenceIds]]:
    * range exchange, one-pass per-partition running sums
    * (`mapPartitions` — genuine per-partition imperative logic),
    * broadcast per-partition offsets, eager localCheckpoint pinning the
    * sampled partitioning across the two passes. NULL weights are 0. */
  /** Global INCLUSIVE running maximum of `valueCol` (long) under a
    * total order — the watermark-progression primitive: sorted by
    * arrival, each row gains `outCol` = the largest value seen at or
    * before it (e.g. the high-water event time a streaming engine
    * would hold when this row arrives). The naive form is
    * `max() OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` — the same
    * SinglePartition collapse [[sequenceIds]] documents. Shape here:
    * range exchange + one-pass per-partition running max, then a
    * numPartitions-row maxima job whose EXCLUSIVE prefix max becomes
    * broadcast offsets; `global = max(partition offset, local)`. Same
    * eager localCheckpoint pinning as the sibling passes. NULL values
    * never advance the maximum; rows before any non-NULL value emit
    * NULL (no maximum exists yet — not a sentinel). */
  def withRunningMax(df: DataFrame, sortCols: Seq[Column],
      valueCol: String, outCol: String = "run_max"): DataFrame = {
    require(sortCols.nonEmpty, "running max needs at least one sort column")
    val taken = Seq(outCol, "_pid", "_v", "_cumm", "_offm")
      .filter(df.columns.contains)
    require(taken.isEmpty,
      s"input already has column(s) ${taken.mkString(", ")} that withRunningMax needs")
    val MinV = Long.MinValue
    val np = df.sparkSession.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", coalesce(col(valueCol).cast("long"), lit(MinV)))
      .localCheckpoint(true)
    val vIdx = sorted.schema.fieldIndex("_v")
    val withLocal = sorted.mapPartitions { it =>
      var acc = MinV
      it.map { r =>
        val v = r.getLong(vIdx)
        if (v > acc) acc = v
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }(org.apache.spark.sql.Encoders.row(sorted.schema
      .add("_cumm", org.apache.spark.sql.types.LongType, nullable = false)))
    val maxima = sorted.groupBy(col("_pid")).agg(max(col("_v")).as("_m"))
      .orderBy(col("_pid")).collect()
    val offsets = maxima.scanLeft(MinV) { (acc, r) =>
      math.max(acc, r.getLong(1)) }.init
    val offsetRows = maxima.map(_.getInt(0)).zip(offsets).toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsetRows.toDF("_pid", "_offm")
    withLocal
      .join(broadcast(offsetDf), Seq("_pid"))
      .withColumn(outCol,
        when(greatest(col("_cumm"), col("_offm")) === MinV, lit(null))
          .otherwise(greatest(col("_cumm"), col("_offm"))))
      .drop("_pid", "_v", "_cumm", "_offm")
  }

  def withRunningTotals(df: DataFrame, sortCols: Seq[Column],
      weightCol: String, cumCol: String = "cum_before",
      posCol: String = ""): DataFrame = {
    require(sortCols.nonEmpty, "running totals need at least one sort column")
    val taken = (Seq(cumCol, "_pid", "_w", "_cumw", "_local", "_offw", "_offn") ++
      (if (posCol.nonEmpty) Seq(posCol) else Nil)).filter(df.columns.contains)
    require(taken.isEmpty,
      s"input already has column(s) ${taken.mkString(", ")} that withRunningTotals needs")
    val np = df.sparkSession.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .localCheckpoint(true)
    val wIdx = sorted.schema.fieldIndex("_w")
    val withLocal = sorted.mapPartitions { it =>
      var acc = 0L
      var i = 0L
      it.map { r =>
        val out = org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(acc, i))
        acc += r.getLong(wIdx)
        i += 1L
        out
      }
    }(org.apache.spark.sql.Encoders.row(sorted.schema
      .add("_cumw", org.apache.spark.sql.types.LongType, nullable = false)
      .add("_local", org.apache.spark.sql.types.LongType, nullable = false)))
    val totals = sorted.groupBy(col("_pid"))
      .agg(sum(col("_w")).as("_t"), count(lit(1)).as("_c"))
      .orderBy(col("_pid")).collect()
    val wOffsets = totals.scanLeft(0L)(_ + _.getLong(1)).init
    val nOffsets = totals.scanLeft(0L)(_ + _.getLong(2)).init
    val offsetRows = totals.map(_.getInt(0)).zip(wOffsets.zip(nOffsets))
      .map { case (p, (w, n)) => (p, w, n) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsetRows.toDF("_pid", "_offw", "_offn")
    val joined = withLocal
      .join(broadcast(offsetDf), Seq("_pid"))
      .withColumn(cumCol, col("_offw") + col("_cumw"))
    (if (posCol.nonEmpty) joined.withColumn(posCol, col("_offn") + col("_local"))
     else joined)
      .drop("_pid", "_w", "_cumw", "_local", "_offw", "_offn")
  }
}
