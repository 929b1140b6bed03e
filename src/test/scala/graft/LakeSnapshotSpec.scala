package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors, LakeSnapshots}

/** Snapshot manifests + versionAsOf time travel on the record lake:
  * append invisibility, DV-state freezing, refusal guards, expiry. */
class LakeSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def append(dir: String, from: Long, until: Long): Unit =
    spark.range(from, until).select(
        concat(lit("r"), lpad($"id".cast("string"), 4, "0")).as("_record_id"),
        $"id".cast("double").as("Score"))
      .coalesce(1)
      .write.format("graft-records").option("path", dir).mode("append").save()

  private def read(dir: String, v: Option[Long] = None) = {
    val r = spark.read.format("graft-records")
      .option("path", dir).option("fieldTypes", "Score:number")
    v.fold(r)(n => r.option("versionAsOf", n.toString)).load()
  }

  test("versionAsOf replays the frozen file set AND frozen DV state") {
    val dir = Files.createTempDirectory("graft_snap").toString + "/t"
    append(dir, 0, 10)
    assert(LakeSnapshots.commit(spark, dir) == 1L)
    append(dir, 10, 20)
    DeletionVectors.delete(spark, dir, "Score:number", col("Score") < 5)
    assert(LakeSnapshots.commit(spark, dir) == 2L)
    DeletionVectors.delete(spark, dir, "Score:number", col("Score") === 15.0)
    append(dir, 20, 25)
    // live: 25 rows - 5 (Score<5) - 1 (15) = 19
    assert(read(dir).count() == 19L)
    // v2: files 0..19, Score<5 deleted, 15 NOT yet deleted
    assert(read(dir, Some(2L)).count() == 15L)
    assert(read(dir, Some(2L)).filter($"Score" === 15.0).count() == 1L)
    // v1: first file only, NOTHING deleted — both later deletes reverse
    assert(read(dir, Some(1L)).select($"Score").as[Double]
      .collect().sorted.toSeq == (0 until 10).map(_.toDouble))
    assert(LakeSnapshots.versions(spark, dir) == Seq(1L, 2L))
    // unknown version fails loudly
    val ex = intercept[Exception] { read(dir, Some(9L)).count() }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs(ex).exists(_.contains("no snapshot manifest")), msgs(ex))
  }

  test("destructive paths EXCLUDE snapshot-pinned files until expiry") {
    val dir = Files.createTempDirectory("graft_snap2").toString + "/t"
    append(dir, 0, 10)
    append(dir, 10, 20)
    LakeSnapshots.commit(spark, dir)
    DeletionVectors.delete(spark, dir, "Score:number", col("Score") === 3.0)
    // both files are pinned by v1: materialize SKIPS them (the vector
    // stays a live sidecar; time travel keeps working) instead of
    // rewriting a file the manifest references
    assert(DeletionVectors.materialize(spark, dir) == 0)
    assert(read(dir).count() == 19L)
    assert(read(dir, Some(1L)).count() == 20L, "v1 must still see row 3")
    // after expiry the same call rewrites; then compaction packs the two
    assert(LakeSnapshots.expire(spark, dir, keepLast = 0) == 1)
    assert(DeletionVectors.materialize(spark, dir) == 1)
    assert(graft.sources.v2.RecordCompaction.compact(spark, dir, 1 << 20) == 1)
    assert(read(dir).count() == 19L)
    // compaction likewise excludes pinned inputs: with the merged file
    // pinned and ONE new file, nothing groups; with TWO new (unpinned)
    // files, only those compact and the pinned file survives verbatim
    LakeSnapshots.commit(spark, dir)
    append(dir, 20, 30)
    assert(graft.sources.v2.RecordCompaction.compact(spark, dir, 1 << 20) == 0)
    append(dir, 30, 40)
    assert(graft.sources.v2.RecordCompaction.compact(spark, dir, 1 << 20) == 1)
    assert(read(dir).count() == 39L)
    assert(read(dir, Some(2L)).count() == 19L, "v2 unharmed by compaction")
  }

  test("versionAsOf is batch-only; streaming tails the live table") {
    val dir = Files.createTempDirectory("graft_snap3").toString + "/t"
    append(dir, 0, 5)
    LakeSnapshots.commit(spark, dir)
    val ex = intercept[Exception] {
      spark.readStream.format("graft-records").option("path", dir)
        .option("fieldTypes", "Score:number")
        .option("versionAsOf", "1").load()
        .writeStream.format("memory").queryName("snap_stream")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs(ex).exists(_.contains("batch-read option")), msgs(ex))
  }
}
