package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more
  * SparkEntry queries — the `.explain("formatted")` evidence PLANS.md
  * rows are built from. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ExplainQuery q304_sum_pushdown"
  *
  * Side-effectful queries (lake builders) run in full first — the plan
  * printed is the RETURNED frame's, i.e. the final read. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQuery <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .config(graft.plans.RewriteCountDistinctBitmap.ConfKey, "true")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", LocalScratch.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query '$name'"))
      val df = fn(spark, sfDir)
      println(s"==== $name ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
