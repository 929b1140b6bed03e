package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors, LakeSnapshots, LakeView}

/** Incrementally-maintained materialized views: watermarked refreshes
  * consume only snapshot deltas, no-op when idle, survive the
  * crash-before-pointer-flip window, and always equal a full
  * recompute. */
class LakeViewSpec extends SparkSpec {
  import spark.implicits._

  private def append(dir: String, from: Long, until: Long): Unit =
    spark.range(from, until).select(
        concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        concat(lit("g"), ($"id" % 3).cast("string")).as("Grp"),
        $"id".cast("double").as("Score"))
      .coalesce(1)
      .write.format("graft-records").option("path", dir).mode("append").save()

  private val types = "Grp:singleLineText,Score:number"

  private def full(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", types).load()
    .groupBy("Grp").agg(count(lit(1)).as("n"), sum($"Score").as("sum_Score"))

  private def viewRows(view: String) = LakeView.read(spark, view)
    .orderBy("Grp").as[(String, Long, Double)].collect().toSeq

  private def fullRows(dir: String) = full(dir)
    .orderBy("Grp").as[(String, Long, Double)].collect().toSeq

  test("refresh chain: bootstrap, delta-only advances, idle no-op — " +
      "always equal to the full recompute") {
    val dir = Files.createTempDirectory("graft_view").toString + "/t"
    val view = Files.createTempDirectory("graft_view").toString + "/v"
    append(dir, 0, 30)
    LakeSnapshots.commit(spark, dir)
    val r1 = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score"))
    assert(r1 == LakeView.Refresh(0L, 1L, 3L))
    assert(viewRows(view) == fullRows(dir))
    // idle: no new snapshot -> no-op
    assert(LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score")) == LakeView.Refresh(1L, 1L, 0L))
    // delete + append, two snapshots, one refresh consumes both deltas
    DeletionVectors.delete(spark, dir, types,
      pmod($"Score", lit(5.0)) === 0.0)
    LakeSnapshots.commit(spark, dir)
    append(dir, 30, 40)
    LakeSnapshots.commit(spark, dir)
    val r2 = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score"))
    assert(r2.fromVersion == 1L && r2.toVersion == 3L)
    assert(viewRows(view) == fullRows(dir))
  }

  test("a crash before the pointer flip re-derives the same state " +
      "(refresh is idempotent on its delta window)") {
    val dir = Files.createTempDirectory("graft_view2").toString + "/t"
    val view = Files.createTempDirectory("graft_view2").toString + "/v"
    append(dir, 0, 10)
    LakeSnapshots.commit(spark, dir)
    LakeView.refreshAggregate(spark, dir, types, view, Seq("Grp"), Seq("Score"))
    append(dir, 10, 20)
    LakeSnapshots.commit(spark, dir)
    // simulate the crash: the NEW state directory lands but the pointer
    // never flips (write a bogus orphan where the next refresh will put
    // its state — it must be overwritten, not trusted)
    val fs = new Path(view).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$view/data-v2"))
    val out = fs.create(new Path(s"$view/data-v2/garbage"), true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    val r = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score"))
    assert(r.fromVersion == 1L && r.toVersion == 2L)
    assert(viewRows(view) == fullRows(dir))
    // superseded state dirs are swept after the flip
    val dirs = fs.listStatus(new Path(view)).filter(_.isDirectory)
      .map(_.getPath.getName).toSeq
    assert(dirs == Seq("data-v2"), dirs.toString)
  }

  test("reading an unrefreshed view fails loudly; snapshotless tables " +
      "refuse to watermark") {
    val view = Files.createTempDirectory("graft_view3").toString + "/v"
    val e = intercept[IllegalStateException] { LakeView.read(spark, view) }
    assert(e.getMessage.contains("refreshAggregate"), e.getMessage)
    val dir = Files.createTempDirectory("graft_view3").toString + "/t"
    append(dir, 0, 5)
    val e2 = intercept[IllegalStateException] {
      LakeView.refreshAggregate(spark, dir, types, view, Seq("Grp"), Seq("Score"))
    }
    assert(e2.getMessage.contains("no snapshots"), e2.getMessage)
  }
}
