package graft

import org.apache.spark.sql.SparkSession

/** Local mirror of the driver's t1 smoke gate: SparkEntry.entry must
  * return >0 rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r1 = SparkEntry.entry(spark).count()
    val r2 = SparkEntry.entry(spark).count() // rerun: state already present
    println(s"SMOKE entry rows run1=$r1 run2=$r2 cols=" +
      SparkEntry.entry(spark).columns.length)
    spark.stop()
    if (r1 <= 0 || r2 != r1) sys.exit(1)
  }
}
