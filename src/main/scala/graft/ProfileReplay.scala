package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes a streaming replay's cost: fixture collect, stream
  * start/stop, per-micro-batch machinery (10-row batches = pure fixed
  * cost) vs real data batches — so replay-family tuning chases the
  * actual dominator, not a guess. Iteration tool, not a gate. */
object ProfileReplay {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", LocalScratch.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[profile] $what: ${(System.nanoTime - t0) / 1e9}%.3f s")
      r
    }

    spark.range(1000).selectExpr("sum(id)").collect()
    val rows = timed("fixture collect") {
      graft.sources.Sources.readTable(spark, sfDir, "events")
        .filter(col("ts").isNotNull && col("event_type").isNotNull &&
          col("value").isNotNull)
        .select(col("ts"), col("event_type"),
          col("value").cast("double").as("value"))
        .as[(java.sql.Timestamp, String, Double)]
        .collect()
    }

    def run(tag: String, batches: Seq[Seq[(java.sql.Timestamp, String, Double)]],
        parts: String): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try timed(s"$tag (parts=$parts, nb=${batches.size})") {
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(java.sql.Timestamp, String, Double)]
        val gate = graft.streaming.StreamingSync.windowedCounts(
          in.toDF().toDF("ts", "event_type", "value"), "1 hour", "2 hours")
        val mem = s"profile_replay_${System.nanoTime}"
        val ckpt = new java.io.File(
          graft.QueryShared.scratchRoot, mem).getAbsolutePath
        val q = gate.writeStream.format("memory").queryName(mem)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try {
          batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
          spark.table(mem).count()
          if (sys.env.contains("SPARK_GRAFT_PROFILE_DURATIONS"))
            q.recentProgress.foreach { p =>
              System.err.println(s"[profile]   batch ${p.batchId} " +
                s"durationMs=${p.durationMs}")
            }
        } finally {
          q.stop(); spark.catalog.dropTempView(mem)
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    val tiny = rows.take(40).grouped(10).map(_.toSeq).toSeq
    val quarters = rows.grouped(math.max(1, rows.length / 4 + 1)).map(_.toSeq).toSeq
    val halves = rows.grouped(math.max(1, rows.length / 2 + 1)).map(_.toSeq).toSeq
    (1 to 3).foreach { i =>
      run(s"tiny-4-batches #$i", tiny, "4") // pure machinery
      run(s"data-4-batches #$i", quarters, "4")
      run(s"data-2-batches #$i", halves, "4")
      run(s"data-1-batch  #$i", Seq(rows.toSeq), "4")
      run(s"tiny-4-batches-p2 #$i", tiny, "2")
      run(s"data-4-batches-p2 #$i", quarters, "2")
      run(s"tiny-4-batches-p1 #$i", tiny, "1")
      run(s"data-4-batches-p1 #$i", quarters, "1")
    }
    spark.stop()
  }
}
