package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingSync

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_stream_$tag").toFile.getAbsolutePath

  test("continuous sync applies the strategy per micro-batch with checkpointed state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val cfg = PipelineConfig(
      SourceConfig("/stream", "people"),
      StoreConfig(tmp("state") + "/state", "people_col"),
      UpdateType.UpsertChecksum, "id", 1L)
    val checkpoint = tmp("ckpt")

    in.addData(("a", 1.0), ("b", 2.0))
    val q1 = StreamingSync.run(spark, in.toDF().toDF("id", "score"), cfg, checkpoint)
    q1.awaitTermination(60000)
    val store = new graft.state.StateStore(spark, cfg.store.statePath)
    assert(store.load().count() == 2)

    // second batch: one update, one insert — strategy semantics preserved
    in.addData(("a", 9.0), ("c", 3.0))
    val q2 = StreamingSync.run(spark, in.toDF().toDF("id", "score"), cfg, checkpoint)
    q2.awaitTermination(60000)
    val out = store.load().select("id", "score").as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 9.0, "b" -> 2.0, "c" -> 3.0))
  }

  test("watermarked windowed counts aggregate an event stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = StreamingSync.windowedCounts(
      in.toDF().toDF("ts", "event_type", "value"), "10 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    in.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "click", 1.5),
      (java.sql.Timestamp.valueOf("2024-01-01 10:04:00"), "click", 2.5),
      (java.sql.Timestamp.valueOf("2024-01-01 10:11:00"), "view", 4.0))
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .select(col("window.start").cast("string"), col("event_type"), col("n"), col("total_value"))
      .as[(String, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 10:00:00", "click", 2L, 4.0),
      ("2024-01-01 10:10:00", "view", 1L, 4.0)))
  }
}
