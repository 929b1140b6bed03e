package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — ScalaTest
  * suites run sequentially in sbt by default). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new GraftExtensions())
      .config(graft.plans.RewriteCountDistinctBitmap.ConfKey, "true")
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.local.dir", LocalScratch.dir)
    .config("spark.ui.enabled", "false")
    // bucketed-table specs saveAsTable into the warehouse — keep it out
    // of the repo working tree
    .config("spark.sql.warehouse.dir",
      new java.io.File(sys.props("java.io.tmpdir"), "graft_test_warehouse")
        .getAbsolutePath)
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  spark.sparkContext.setLogLevel("ERROR")

  /** Rows as sorted seq of maps keyed by column — order-insensitive,
    * null-safe comparison helper. */
  def rowsOf(df: DataFrame): Seq[Map[String, Any]] = {
    val cols = df.columns.toSeq
    df.collect().toSeq
      .map(r => cols.map(c => c -> r.getAs[Any](c)).toMap)
      .sortBy(_.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("|"))
  }

  def assertSameRows(a: DataFrame, b: DataFrame): Unit =
    assert(rowsOf(a) == rowsOf(b))
}
