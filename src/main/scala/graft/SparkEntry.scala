package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the training-data-pipeline operators), each with a
  * DuckDB-equivalent `oracleSql` where SQL-expressible.
  *
  * Oracle-parity rules used throughout:
  *  - double aggregation goes through DECIMAL (exact) and back to DOUBLE,
  *    so partial-aggregation order cannot perturb the result;
  *  - rounding is `floor(x*10^k + 0.5)/10^k` — identical IEEE ops in both
  *    engines, unlike round() whose tie-handling is engine-specific;
  *  - every query ends in a deterministic ORDER BY;
  *  - hashes on oracle-checked paths are md5-over-strings (portable);
  *    xxhash64 variants exist for production speed and are checked
  *    rows-only.
  */
object SparkEntry {
  /** The flagship pipeline's config — shared with Smoke so its
    * rerun-against-existing-state check cannot drift from entry(). */
  def entryConfig(versionId: Long): PipelineConfig = {
    val dir = "/root/testdata/sf0.001"
    val statePath = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_entry_state").getAbsolutePath
    PipelineConfig(
      SourceConfig(dir, "customer"), StoreConfig(statePath, "customer"),
      UpdateType.UpsertChecksum, "c_custkey", versionId)
  }

  /** Flagship: full sync pipeline end-to-end on sf=0.001 (scan ->
    * normalize -> dedupe -> checksum upsert -> atomic state snapshot).
    * Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val c = entryConfig(1L)
    val pipe = new SyncPipeline(spark, c)
    pipe.store.truncate()
    pipe.run(spark.read.parquet(s"${c.source.path}/customer.parquet"))
  }

  /** One entry per implemented operator from SURVEY.md §2, assembled
    * from the per-domain files under graft/queries/. Key sets are
    * disjoint by construction; the size check fails the build of any
    * accidental collision instead of silently dropping a query. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val parts = Seq(ParityQueries.queries, TextQueries.queries,
      SimilarityQueries.queries, PipelineQueries.queries, SketchQueries.queries,
      StreamingQueries.queries)
    val all = parts.reduce(_ ++ _)
    require(all.size == parts.map(_.size).sum, "duplicate query keys across domain files")
    all
  }

  /** DuckDB oracle per query (same domain files). */
  def oracleSql: Map[String, String] = {
    val parts = Seq(ParityQueries.oracleSql, TextQueries.oracleSql,
      SimilarityQueries.oracleSql, PipelineQueries.oracleSql, SketchQueries.oracleSql,
      StreamingQueries.oracleSql)
    val all = parts.reduce(_ ++ _)
    require(all.size == parts.map(_.size).sum, "duplicate oracle keys across domain files")
    all
  }
}
