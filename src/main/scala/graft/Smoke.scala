package graft

import org.apache.spark.sql.SparkSession

/** Local mirror of the driver's t1 smoke gate: SparkEntry.entry must
  * return >0 rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .config(graft.plans.RewriteCountDistinctBitmap.ConfKey, "true")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", LocalScratch.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r1 = SparkEntry.entry(spark).count()
    // real rerun against the EXISTING state (entry() itself truncates, so
    // drive the pipeline directly): identical source must change nothing
    // and stamp no new versions
    val cfg = SparkEntry.entryConfig(2L)
    val rerun = new SyncPipeline(spark, cfg)
      .run(spark.read.parquet(s"${cfg.source.path}/customer.parquet"))
    val r2 = rerun.count()
    val restamped = rerun.filter(
      org.apache.spark.sql.functions.col("version_id") === 2L).count()
    println(s"SMOKE entry rows run1=$r1 rerun=$r2 restamped=$restamped cols=" +
      rerun.columns.length)
    spark.stop()
    if (r1 <= 0 || r2 != r1 || restamped != 0) sys.exit(1)
  }
}
