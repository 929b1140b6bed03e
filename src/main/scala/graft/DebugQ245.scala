package graft
object DebugQ245 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Sources.readTable(spark, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id").cast("long").as("k"), col("ts"), col("event_type").cast("string").as("et"))
    val minDay = all.agg(min(floor(col("ts").cast("long") / 86400))).head().getLong(0)
    val rows = all.withColumn("_day", floor(col("ts").cast("long") / 86400))
      .filter(col("_day") === minDay).drop("_day")
      .as[(Long, java.sql.Timestamp, String)].collect()
    println(s"first-day rows: ${rows.length}, users: ${rows.map(_._1).distinct.length}")
    // driver-side reference fold in (ts, event order)
    val ref = rows.groupBy(_._1).map { case (k, evs) =>
      var stage = 0
      evs.sortBy(e => (e._2.getTime, e._2.getNanos)).foreach { e =>
        val steps = Seq("view", "click", "purchase")
        if (stage < 3 && e._3 == steps(stage)) stage += 1
      }
      k -> stage
    }
    // stream fold
    val h0 = rows.iterator.map(_._2.getTime).min
    val batches = rows.groupBy(r => math.min((r._2.getTime - h0) / 21600000L, 3L))
      .toSeq.sortBy(_._1).map(_._2.toSeq)
    println(s"batches: ${batches.map(_.size)}")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
    val gate = graft.streaming.StreamingSync.funnelPerKey(
      in.toDF().toDF("k", "ts", "et"), "k", "ts", "et", Seq("view", "click", "purchase"))
      .toDF("user_id", "stage")
    val q = gate.writeStream.format("memory").queryName("dbg245").outputMode("update").start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("dbg245").groupBy("user_id").agg(max(col("stage")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val diffs = ref.filter { case (k, s) => got.get(k).map(_.toInt) != Some(s) }
    println(s"diffs: ${diffs.toSeq.sortBy(_._1).take(10)}")
    diffs.keys.take(2).foreach { k =>
      println(s"user $k events: " + rows.filter(_._1 == k).sortBy(_._2.getTime)
        .map(e => s"${e._2}|${e._3}").mkString(", ") + s" -> ref=${ref(k)} got=${got.get(k)}")
    }
    spark.stop()
  }
}
