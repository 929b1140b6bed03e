package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are (conceptually)
  * concatenated into a token stream that is cut into fixed-`budget` bins
  * — the standard "concat-and-chunk" shape that turns a ragged corpus
  * into dense, fixed-length training sequences. This operator computes
  * the PLACEMENT (shard, start offset, first/last bin per document); the
  * downstream writer slices the actual token arrays from it.
  *
  * Scale shape: a single global concat order would funnel 100 TB through
  * one total-order sort. Instead documents shard by id hash (uniform, and
  * rerun-stable like everything in [[Sampling]]), and offsets are a
  * cumulative window WITHIN each shard — one hash exchange, every shard's
  * stream independent, which is exactly how offline packing fans a corpus
  * across writer tasks. Determinism: in-shard order is (md5(id), id) — a
  * stable uniform shuffle that any engine reproduces, id as tiebreak for
  * hash collisions; adding documents to OTHER shards never moves this
  * shard's bins.
  *
  * Reference scope: the reference has no packing surface (its closest is
  * CSV export batching, lib/utils.py:34-67); this is beyond-parity
  * pipeline capability. NULL token counts pack as 0-length (placed, but
  * consuming no budget). */
object Packing {

  /** Placement plan: `(shard, idCol, n_toks, start_offset, first_bin,
    * last_bin)`; bins are `budget`-sized and shard-local (a global bin id,
    * if wanted, is `shard * ceil(shardTokens/budget) + bin` downstream).
    * Documents longer than `budget` legitimately span bins — that is the
    * concat-and-chunk contract (an attention mask, not the layout, deals
    * with cross-document tokens). */
  def packSequences(docs: DataFrame, idCol: String, tokCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    require(shards > 0, s"shards $shards must be positive")
    val hx = TempCols.fresh(docs, "_hx")
    // uniformLong is non-negative ([0, 2^32)), so % == pmod here
    val shard = (Sampling.uniformLong(Seq(col(idCol))) % shards).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col(hx), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol),
        coalesce(col(tokCol).cast("long"), lit(0L)).as("n_toks"),
        shard.as("shard"),
        Sampling.uniformHex(Seq(col(idCol))).as(hx))
      .withColumn("start_offset", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col("shard"), col(idCol), col("n_toks"), col("start_offset"),
        expr(s"start_offset DIV $budget").as("first_bin"),
        expr(s"(start_offset + greatest(n_toks - 1, 0)) DIV $budget").as("last_bin"))
  }

  /** Bin-level summary of a placement: how full each (shard, bin) is —
    * the packing-efficiency report (tail bins are the only ones allowed
    * to be short). Documents spanning bins contribute their overlap to
    * each bin they touch. */
  def binOccupancy(placed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    placed
      .where(col("n_toks") > 0)
      .select(col("shard"), col("n_toks"), col("start_offset"),
        explode(sequence(col("first_bin"), col("last_bin"))).as("bin"))
      .select(col("shard"), col("bin"),
        // overlap of [start, start+n) with [bin*budget, (bin+1)*budget)
        (least(col("start_offset") + col("n_toks"), (col("bin") + 1) * budget) -
          greatest(col("start_offset"), col("bin") * budget)).as("used"))
      .groupBy(col("shard"), col("bin"))
      .agg(sum(col("used")).as("tokens_used"),
        count(lit(1)).as("n_docs"))
  }

  /** LENGTH-BUCKETED BATCHING audit — the padding-waste question for
    * pipelines that pad-batch instead of concat-packing
    * ([[packSequences]]' sibling): bucket sequences into fixed
    * `width`-token length classes, pad each to its bucket ceiling, and
    * report per-bucket waste against the naive pad-everything-to-
    * global-max baseline. The bucket id is `(len + width−1) div width`
    * — pure integer, no log2, so the classing reproduces bit-for-bit
    * anywhere. Ratios are one IEEE divide each on the 1e-6 lattice.
    *
    * Scale shape: one partial-aggregated groupBy to ≤ maxLen/width
    * bucket rows plus a broadcast 1-row global max. Zero-length rows
    * drop (nothing to pad). Returns per bucket: (bucket, max_len,
    * n_docs, sum_tokens, padded_tokens, waste_pct, naive_padded_tokens,
    * saved_pct). */
  def padEfficiency(docs: DataFrame, tokCol: String,
      width: Long): DataFrame = {
    require(width > 0, s"bucket width $width must be positive")
    val len = col(tokCol).cast("long")
    val t = docs.filter(len.isNotNull && len > 0).select(len.as("_len"))
    val g = t.select(expr(s"(_len + ${width - 1}) div $width").as("bucket"),
        col("_len"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("_len")).as("sum_tokens"))
    val gm = t.agg(max(col("_len")).as("_gmax"))
    val r6 = (c: Column) => floor(c * 1000000 + 0.5) / 1000000
    g.crossJoin(broadcast(gm))
      .select(col("bucket"), (col("bucket") * width).as("max_len"),
        col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket") * width).as("padded_tokens"),
        (col("n_docs") * col("_gmax")).as("naive_padded_tokens"))
      .withColumn("waste_pct", r6(
        (col("padded_tokens") - col("sum_tokens")).cast("double") /
          col("padded_tokens").cast("double")))
      .withColumn("saved_pct", r6(
        (col("naive_padded_tokens") - col("padded_tokens")).cast("double") /
          col("naive_padded_tokens").cast("double")))
  }
}
