package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupApprox

/** Dev profiling harness for the heavy dedup pipelines: per-stage wall
  * times for the MinHash-LSH near-dup flow on the bench corpus. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .config(graft.plans.RewriteCountDistinctBitmap.ConfKey, "true").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", LocalScratch.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val corpus = d.unionByName(d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))

    t("corpus")(corpus.count())
    t("signatures")(DedupApprox.minhashSignatures(
      corpus, "doc_id", "text", 3, 16, md5Family = true).count())
    val bands = DedupApprox.lshBands(corpus, "doc_id", "text", 3, 8, 2, md5Family = true)
    t("bands")(bands.count())
    t("cands")(DedupApprox.lshCandidatePairs(bands).count())
    t("hashsets")(DedupApprox.shingleHashSets(corpus, "doc_id", "text", 3).count())
    t("full")(DedupApprox.minhashNearDups(
      corpus, "doc_id", "text", 3, 8, 2, 0.6, md5Family = true).count())
    t("full_again")(DedupApprox.minhashNearDups(
      corpus, "doc_id", "text", 3, 8, 2, 0.6, md5Family = true).count())
    t("simhash")(DedupApprox.simhashNearDups(corpus, "doc_id", "text", 12).count())

    // streaming drive: the real events table through a file-source stream
    // -> sessionize -> memory sink (AvailableNow = process-all-then-stop)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = graft.streaming.StreamingSync.sessionize(stream, gapMinutes = 60)
      .writeStream.format("memory").queryName("profile_sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    println("PROFILE streaming_sessions rows=" +
      spark.table("profile_sessions").count())

    // DSv2 drive: export documents as record-shaped JSONL, read it back
    // through the registered graft-records format with pruning
    val recDir = java.nio.file.Files.createTempDirectory("graft_records").toFile
    val recFile = new java.io.File(recDir, "docs.jsonl").getAbsolutePath
    val jsonl = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr(
        "to_json(named_struct('id', concat('doc', doc_id), " +
          "'createdTime', '2024-01-01T00:00:00Z', " +
          "'fields', named_struct('Text', text, 'Chars', n_chars)))")
    jsonl.coalesce(1).write.mode("overwrite").text(recDir.getAbsolutePath + "/out")
    val src = spark.read.format("graft-records")
      .option("path", recDir.getAbsolutePath + "/out")
      .option("fieldTypes", "Text:singleLineText,Chars:number")
      .load()
    t("dsv2_full")(src.count())
    t("dsv2_pruned")(src.select("Chars").agg(sum("Chars")).collect().head.getDouble(0).toLong)
    println("PROFILE dsv2_plan_pruned=" +
      src.select("Chars").queryExecution.executedPlan.toString.contains("ReadSchema=struct<Chars:double>"))

    // approximate-aggregates drive on the bench tables
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    t("approx_quantiles")(graft.operators.Stats.approxQuantiles(
      ord, Seq("o_orderstatus"), "o_totalprice", Seq(0.5, 0.9)).count())
    t("approx_distinct")(graft.operators.Stats.approxDistinct(
      ord, Seq("o_orderstatus"), "o_custkey").count())
    spark.stop()
  }
}
