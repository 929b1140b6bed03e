package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Storage-partitioned joins over the graft-records lake: the clusterBy
  * write option produces key-pure files, the clusterBy read option
  * derives KeyGroupedPartitioning from zone metadata, and a same-keyed
  * join or aggregate runs with ZERO shuffle exchanges. */
class StoragePartitionJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkClustered(n: Int, keys: Int, valCol: String): String = {
    val dir = Files.createTempDirectory("graft_spj").toString + "/t"
    spark.range(0, n.toLong).select(
        concat(lit(valCol), lpad($"id".cast("string"), 4, "0")).as("_record_id"),
        concat(lit("k"), ($"id" % keys).cast("string")).as("Key"),
        $"id".cast("double").as(valCol))
      .repartition(4, col("Key"))
      .write.format("graft-records").option("path", dir)
      .option("clusterBy", "Key").mode("append").save()
    dir
  }

  private def readClustered(dir: String, valCol: String) =
    spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", s"Key:singleLineText,$valCol:number")
      .option("clusterBy", "Key").load()

  private def withSpj[A](body: => A): A = {
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "true")
    spark.conf.set(keys(1), "true")
    spark.conf.set(keys(2), "-1") // force a non-broadcast join plan
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("clustered write produces key-pure files (zone min == max == key)") {
    val dir = mkClustered(60, 5, "A")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir)).filter(_.isFile)
      .map(_.getPath.toString).filterNot(_.contains("/_"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val z = graft.sources.v2.ZoneMap.load(fs, f).get
      val st = z.stats("Key")
      assert(st.nulls == 0L && st.min == st.max && st.min != null, s"$f: $st")
    }
    // null cluster keys are rejected loudly
    val ex = intercept[Exception] {
      Seq(("r1", null: String, 1.0)).toDF("_record_id", "Key", "A")
        .write.format("graft-records")
        .option("path", dir + "_null").option("clusterBy", "Key")
        .mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs(ex).exists(_.contains("NULL in cluster column")), msgs(ex))
  }

  test("same-keyed join of two clustered tables plans ZERO shuffles") { withSpj {
    val left = mkClustered(60, 5, "A")
    val right = mkClustered(45, 5, "B")
    val j = readClustered(left, "A").as("l")
      .join(readClustered(right, "B").as("r"), "Key")
      .groupBy("Key").agg(count(lit(1)).as("n_pairs"),
        sum($"A" * $"B").as("dot"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
    val rows = j.orderBy("Key").as[(String, Long, Double)].collect()
    // oracle by hand: per key k, ids congruent to k mod 5
    val exp = (0 until 5).map { k =>
      val ls = (k until 60 by 5).map(_.toDouble)
      val rs = (k until 45 by 5).map(_.toDouble)
      (s"k$k", ls.length.toLong * rs.length,
        (for (a <- ls; b <- rs) yield a * b).sum)
    }
    assert(rows.toSeq == exp, rows.toSeq)
  }}

  test("groupBy on the cluster key needs no exchange either") { withSpj {
    val dir = mkClustered(60, 6, "A")
    val agg = readClustered(dir, "A").groupBy("Key")
      .agg(sum($"A").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free agg:\n$plan")
    assert(agg.orderBy("Key").as[(String, Double)].collect().toSeq ==
      (0 until 6).map(k => (s"k$k", (k until 60 by 6).sum.toDouble)))
  }}

  test("the STREAMING sink clusters and blooms per epoch too") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_spj_stream").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_spj_stream_ck").toString
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, Double)]
    val q = in.toDF().toDF("_record_id", "Key", "A")
      .writeStream.format("graft-records")
      .option("path", dir).option("checkpointLocation", ckpt)
      .option("clusterBy", "Key")
      .option("bloomFilterColumns", "_record_id")
      .start()
    try {
      in.addData((0 until 20).map(i => (s"r$i", s"k${i % 3}", i.toDouble)): _*)
      q.processAllAvailable()
      in.addData((20 until 30).map(i => (s"r$i", s"k${i % 3}", i.toDouble)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir)).filter(_.isFile)
      .map(_.getPath.toString).filterNot(_.contains("/_")).filterNot(_.contains("/."))
    assert(files.nonEmpty)
    files.foreach { f =>
      val st = graft.sources.v2.ZoneMap.load(fs, f).get.stats("Key")
      assert(st.min == st.max && st.nulls == 0L, s"$f not key-pure: $st")
      assert(graft.sources.v2.BloomSidecar.load(fs, f).isDefined, s"$f no bloom")
    }
    // the streamed table is immediately storage-partition-joinable
    withSpj {
      val agg = readClustered(dir, "A").groupBy("Key").agg(sum($"A").as("s"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(agg.orderBy("Key").as[(String, Double)].collect().toSeq ==
        (0 until 3).map(k => (s"k$k", (k until 30 by 3).sum.toDouble)))
    }
  }

  test("a declared clustering over impure files fails loudly") {
    val dir = Files.createTempDirectory("graft_spj_bad").toString + "/t"
    spark.range(0, 20).select(
        concat(lit("r"), $"id".cast("string")).as("_record_id"),
        concat(lit("k"), ($"id" % 3).cast("string")).as("Key"),
        $"id".cast("double").as("A"))
      .coalesce(1) // one file, three keys -> impure
      .write.format("graft-records").option("path", dir).mode("append").save()
    val ex = intercept[Exception] {
      readClustered(dir, "A").groupBy("Key").count().collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs(ex).exists(_.contains("not key-pure")), msgs(ex))
  }
}
