package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness for ANY registered query: runs
  * `SparkEntry.queries(name)` once with [[graft.operators.LakeView]]'s
  * internal phase attribution enabled and prints (count, total seconds)
  * per phase plus the query wall time — where does a slow query's time
  * actually go. `SPARK_GRAFT_QUERY=q319_...` selects the query;
  * `SPARK_GRAFT_SF_DIR` the fixture dir. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = sys.env.getOrElse("SPARK_GRAFT_QUERY",
      sys.error("set SPARK_GRAFT_QUERY"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .config(graft.plans.RewriteCountDistinctBitmap.ConfKey, "true")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", LocalScratch.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    val phases =
      new java.util.concurrent.ConcurrentHashMap[String, (Long, Double)]()
    graft.operators.LakeView.phaseSink = (p, sec) =>
      phases.merge(p, (1L, sec),
        (a, b) => (a._1 + b._1, a._2 + b._2))
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    for (r <- 1 to reps) {
      phases.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE rep=$r query=$name rows=$n wall=$wall%.2fs")
      import scala.jdk.CollectionConverters._
      phases.asScala.toSeq.sortBy(-_._2._2).foreach { case (p, (c, sec)) =>
        println(f"PROFILE   phase=$p%-28s n=$c%-4d total=$sec%.2fs")
      }
    }
    spark.stop()
  }
}
