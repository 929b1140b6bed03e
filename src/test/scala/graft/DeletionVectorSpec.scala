package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.DeletionVectors
import graft.sources.v2.{DeletionVector, RecordCompaction}

/** Merge-on-read deletion vectors: metadata-only DELETE, DV-aware scan
  * (plain, pushed-aggregate, and top-N paths), strict sidecar loading,
  * materialize + compaction interplay, crash recovery. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  /** A two-file lake: f0 holds ids 0..9 (score=id), f1 holds 10..19. */
  private def mkLake(): String = {
    val dir = Files.createTempDirectory("graft_dv").toString + "/t"
    Seq(0, 1).foreach { b =>
      spark.range(b * 10L, (b + 1) * 10L).select(
          concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
          $"id".cast("double").as("Score"))
        .coalesce(1)
        .write.format("graft-records").option("path", dir).mode("append").save()
    }
    dir
  }

  private def read(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", "Score:number").load()

  test("merge is range-wise: no materialization of covered ordinals, " +
      "adjacency collapses, idempotent re-delete") {
    // a vector covering a huge contiguous delete merges new positions
    // without expanding its ranges (O(ranges + new), not O(rows deleted))
    val big = DeletionVector.parse("""{"ranges":[[0,9999999999],[20000000000,20000000005]]}""")
    val m = DeletionVector.merge(big, Array(5L, 10000000000L, 19999999999L))
    assert(m.starts.toSeq == Seq(0L, 19999999999L))
    assert(m.ends.toSeq == Seq(10000000000L, 20000000005L))
    assert(m.count == 10000000001L + 7L)
    // idempotent: merging already-deleted positions is a no-op
    val again = DeletionVector.merge(m, Array(3L, 20000000001L))
    assert(again.starts.toSeq == m.starts.toSeq && again.ends.toSeq == m.ends.toSeq)
    // interleave + bridge: [2,3]+[0,1,4] -> [0,4]; disjoint stays split
    val v2 = DeletionVector.merge(
      DeletionVector.parse("""{"ranges":[[2,3],[8,9]]}"""), Array(0L, 1L, 4L))
    assert(v2.starts.toSeq == Seq(0L, 8L) && v2.ends.toSeq == Seq(4L, 9L))
    assert(!v2.contains(5L) && v2.contains(4L) && v2.contains(9L))
  }

  test("hidden metadata columns address every row by (_file, _pos)") {
    val dir = mkLake()
    val df = read(dir)
    assert(!df.columns.contains("_pos"), "metadata cols must hide from *")
    val rows = read(dir).select($"_record_id", $"_file", $"_pos")
      .as[(String, String, Long)].collect()
    assert(rows.length == 20)
    assert(rows.map(_._2).distinct.length == 2, "two data files")
    // each file's ordinals are exactly 0..9 (one record per line)
    rows.groupBy(_._2).values.foreach { perFile =>
      assert(perFile.map(_._3).sorted.toSeq == (0L to 9L), perFile.toSeq)
    }
  }

  test("delete marks positions; scans subtract them; no data file rewrites") {
    val dir = mkLake()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(new Path(dir)).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(st => st.getPath.getName -> (st.getLen, st.getModificationTime)).toMap
    val res = DeletionVectors.delete(spark, dir, "Score:number",
      col("Score") % 2 === 0) // 10 even scores across both files
    assert(res.map(_.rowsMarked).sum == 10L && res.length == 2, res)
    val after = fs.listStatus(new Path(dir)).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(st => st.getPath.getName -> (st.getLen, st.getModificationTime)).toMap
    assert(after == before, "delete must not touch data files")
    assert(read(dir).count() == 10L)
    assert(read(dir).agg(sum($"Score")).as[Double].head() ==
      (1 to 19 by 2).sum.toDouble)
    // second wave MERGES into the existing vectors (idempotent ranges)
    val res2 = DeletionVectors.delete(spark, dir, "Score:number",
      col("Score") < 5) // 1, 3 remain odd+small -> 2 new marks in f0
    assert(res2.map(_.rowsMarked).sum == 2L, res2)
    assert(read(dir).select($"Score").as[Double].collect().sorted.toSeq ==
      Seq(5.0, 7.0, 9.0, 11.0, 13.0, 15.0, 17.0, 19.0))
    // planning-time stats see the post-delete cardinality
    val rc = read(dir).queryExecution.optimizedPlan.stats.rowCount
    assert(rc.contains(BigInt(8)), s"stats rowCount $rc")
  }

  test("pushed aggregate and top-N paths honor the vector") {
    val dir = mkLake()
    DeletionVectors.delete(spark, dir, "Score:number", col("Score") >= 15)
    val agg = read(dir).groupBy().agg(count(lit(1)).as("n"),
      max($"Score").as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"), plan) // really the pushed path
    assert(agg.as[(Long, Double)].head() == ((15L, 14.0)))
    val top = read(dir).orderBy($"Score".desc).limit(3)
    assert(top.select($"Score").as[Double].collect().toSeq ==
      Seq(14.0, 13.0, 12.0))
  }

  test("a deleted malformed line no longer aborts FAILFAST") {
    val dir = Files.createTempDirectory("graft_dv_bad").toString + "/t"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    val f = new Path(dir, "data.jsonl")
    val out = fs.create(f, true)
    out.write(
      """{"id":"a","createdTime":"2024-01-01T00:00:00Z","fields":{"Score":1}}
        |NOT JSON
        |{"id":"b","createdTime":"2024-01-01T00:00:00Z","fields":{"Score":2}}
        |""".stripMargin.getBytes("UTF-8"))
    out.close()
    intercept[Exception] { read(dir).count() } // malformed line aborts...
    DeletionVector.write(fs, new Path(dir), "data.jsonl", Array(1L))
    assert(read(dir).select($"Score").as[Double].collect().sorted.toSeq ==
      Seq(1.0, 2.0)) // ...until it is deleted
    // an unreadable sidecar fails the scan LOUDLY (correctness-critical,
    // unlike advisory zone maps)
    val sc = fs.create(DeletionVector.sidecar(new Path(dir), "data.jsonl"), true)
    sc.write("{broken".getBytes("UTF-8")); sc.close()
    val ex = intercept[Exception] { read(dir).count() }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs(ex).exists(_.contains("deletion-vector sidecar")), msgs(ex))
  }

  test("materialize folds vectors into rewrites; compaction refuses before, packs after") {
    val dir = mkLake()
    DeletionVectors.delete(spark, dir, "Score:number", col("Score") % 2 === 0)
    val refuse = intercept[IllegalArgumentException] {
      RecordCompaction.compact(spark, dir, targetBytes = 1 << 20)
    }
    assert(refuse.getMessage.contains("materialize"), refuse.getMessage)
    assert(DeletionVectors.materialize(spark, dir) == 2)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(new Path(dir), DeletionVector.Dir)) ||
      fs.listStatus(new Path(new Path(dir), DeletionVector.Dir)).isEmpty)
    assert(read(dir).select($"Score").as[Double].collect().sorted.toSeq ==
      (1 to 19 by 2).map(_.toDouble))
    assert(DeletionVectors.materialize(spark, dir) == 0) // nothing left
    assert(RecordCompaction.compact(spark, dir, targetBytes = 1 << 20) == 1)
    assert(read(dir).count() == 10L) // compaction preserves the survivors
  }

  test("overwrite clears stale vectors (and snapshots) with the data") {
    val dir = mkLake()
    DeletionVectors.delete(spark, dir, "Score:number", col("Score") < 5)
    graft.operators.LakeSnapshots.commit(spark, dir)
    spark.range(0, 7).select(
        concat(lit("n"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("Score"))
      .write.format("graft-records").option("path", dir)
      .mode("overwrite").save()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a stale vector could silently delete rows of a same-named
    // replacement file; a stale manifest references vanished files
    assert(!fs.exists(new Path(new Path(dir), DeletionVector.Dir)))
    assert(!fs.exists(new Path(new Path(dir), graft.sources.v2.Snapshots.Dir)))
    assert(read(dir).count() == 7L)
  }

  test("recover replays an interrupted swap to completion") {
    val dir = mkLake()
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    DeletionVectors.delete(spark, dir, "Score:number", col("Score") === 3)
    // simulate a crash after staging + marker, before the swap: stage a
    // rewrite of f0-without-score-3 by hand and drop a marker for it
    val name = fs.listStatus(new Path(dir)).filter(_.isFile)
      .map(_.getPath.getName).filterNot(_.startsWith("_")).sorted.head
    val dv = DeletionVector.load(fs, new Path(dir, name).toString).get
    val staged = new Path(new Path(dir, "_staging-dvmat-test"), "f0.jsonl")
    fs.mkdirs(staged.getParent)
    val out = fs.create(staged, true)
    val in = fs.open(new Path(dir, name))
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().zipWithIndex
      .foreach { case (l, i) =>
        if (!dv.contains(i.toLong)) out.write((l + "\n").getBytes("UTF-8")) }
    in.close(); out.close()
    val marker = fs.create(new Path(dir, "_dvmat-test-f0.json"), true)
    marker.write((s"""{"staging":"$staged","new":"dvmat-test-f0.jsonl",""" +
      s""""old":"$name"}""").getBytes("UTF-8"))
    marker.close()
    assert(DeletionVectors.recover(dir, conf) == 1)
    assert(!fs.exists(new Path(dir, name)), "old file must be swapped out")
    assert(!fs.exists(DeletionVector.sidecar(new Path(dir), name)))
    assert(read(dir).count() == 19L)
    assert(read(dir).filter($"Score" === 3.0).count() == 0L)
  }
}
