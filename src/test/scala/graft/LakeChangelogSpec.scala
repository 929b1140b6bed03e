package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors, IncrementalAgg, LakeChangelog, LakeSnapshots}
import graft.sources.v2.{DeletionVector, RecordCompaction}

/** Changelog (CDC) reads between record-lake snapshots: signed
  * Z-relation deltas derived from manifest + DV diffs, pruned to
  * changed files, with compaction between versions contributing ZERO
  * churn; deltas feed IncrementalAgg so a maintained view matches a
  * full recompute. */
class LakeChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def append(dir: String, from: Long, until: Long): Unit =
    spark.range(from, until).select(
        concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        $"id".cast("double").as("Score"))
      .coalesce(1)
      .write.format("graft-records").option("path", dir).mode("append").save()

  private def read(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", "Score:number").load()

  test("inserts, DV deletes, and within-window add+delete net exactly") {
    val dir = Files.createTempDirectory("graft_cdc").toString + "/t"
    append(dir, 0, 10)
    val v1 = LakeSnapshots.commit(spark, dir)
    append(dir, 10, 20)
    // 5 (pre-v1 file, DV diff) and 15 (added file, gone before v2: must
    // NOT appear at all — net zero)
    DeletionVectors.delete(spark, dir, "Score:number",
      col("Score") === 5.0 || col("Score") === 15.0)
    val v2 = LakeSnapshots.commit(spark, dir)
    val d = LakeChangelog.changes(spark, dir, "Score:number", v1, v2)
    val got = d.select($"Score", $"m").as[(Double, Long)].collect().toMap
    val want = (10 until 20).filter(_ != 15).map(i => i.toDouble -> 1L).toMap +
      (5.0 -> -1L)
    assert(got == want, s"got $got")
    // applying the delta to the v1 state reproduces the v2 state
    val v1Scores = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").option("versionAsOf", v1.toString)
      .load().select($"Score").as[Double].collect().toSeq
    val applied = (v1Scores.map(_ -> 1L) ++ got.toSeq)
      .groupMapReduce(_._1)(_._2)(_ + _).filter(_._2 != 0L).keySet
    val v2Scores = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").option("versionAsOf", v2.toString)
      .load().select($"Score").as[Double].collect().toSet
    assert(applied == v2Scores)
  }

  test("a file appended AND compacted between versions is NOT churn") {
    val dir = Files.createTempDirectory("graft_cdc2").toString + "/t"
    append(dir, 0, 10)
    val v1 = LakeSnapshots.commit(spark, dir)
    append(dir, 10, 20)
    append(dir, 20, 30)
    // the two post-v1 files merge; v1's file is pinned and excluded
    assert(RecordCompaction.compact(spark, dir, targetBytes = 1 << 20) == 1)
    val v2 = LakeSnapshots.commit(spark, dir)
    val d = LakeChangelog.changes(spark, dir, "Score:number", v1, v2)
    val got = d.select($"Score", $"m").as[(Double, Long)].collect()
    assert(got.forall(_._2 == 1L),
      s"compaction leaked churn (negative rows): ${got.filter(_._2 != 1L).toSeq}")
    assert(got.map(_._1).sorted.toSeq == (10 until 30).map(_.toDouble),
      "exactly the appended rows, once each")
  }

  test("delta scans are PRUNED to changed files (fileSubset reaches the scan)") {
    val dir = Files.createTempDirectory("graft_cdc3").toString + "/t"
    (0 until 5).foreach(b => append(dir, b * 10L, (b + 1) * 10L))
    val v1 = LakeSnapshots.commit(spark, dir)
    append(dir, 50, 60)
    val v2 = LakeSnapshots.commit(spark, dir)
    val d = LakeChangelog.changes(spark, dir, "Score:number", v1, v2)
    assert(d.count() == 10L)
    // the insert branch scans ONE file, not six: the fileSubset option
    // prunes at partition PLANNING (one partition per candidate file)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val added = (graft.sources.v2.Snapshots.load(fs, dir, v2).files.map(_._1)
      .toSet -- graft.sources.v2.Snapshots.load(fs, dir, v1).files.map(_._1)
      .toSet).toSeq
    assert(added.size == 1)
    val pruned = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number")
      .option("versionAsOf", v2.toString)
      .option("fileSubset", added.mkString(","))
      .load()
    assert(pruned.rdd.getNumPartitions == 1,
      s"fileSubset planned ${pruned.rdd.getNumPartitions} partitions for 1 file")
    assert(pruned.count() == 10L)
  }

  test("maintained aggregate over two deltas equals the full recompute") {
    val dir = Files.createTempDirectory("graft_cdc4").toString + "/t"
    append(dir, 0, 30)
    val v1 = LakeSnapshots.commit(spark, dir)
    append(dir, 30, 50)
    DeletionVectors.delete(spark, dir, "Score:number",
      pmod(col("Score"), lit(5.0)) === 0.0)
    val v2 = LakeSnapshots.commit(spark, dir)
    DeletionVectors.delete(spark, dir, "Score:number",
      pmod(col("Score"), lit(7.0)) === 3.0)
    val v3 = LakeSnapshots.commit(spark, dir)
    def grp = (col("Score").cast("long") % 3).as("g")
    val state0 = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").option("versionAsOf", v1.toString)
      .load().groupBy(grp)
      .agg(count(lit(1)).as("n"), sum($"Score").as("s"))
    val maintained = Seq((v1, v2), (v2, v3)).foldLeft(state0) {
      case (st, (a, b)) =>
        val delta = LakeChangelog.changes(spark, dir, "Score:number", a, b)
          .groupBy(grp).agg(sum($"m").as("dn"), sum($"m" * $"Score").as("ds"))
        st.join(delta, Seq("g"), "full")
          .select(col("g"),
            (coalesce($"n", lit(0L)) + coalesce($"dn", lit(0L))).as("n"),
            (coalesce($"s", lit(0.0)) + coalesce($"ds", lit(0.0))).as("s"))
          .filter($"n" > 0)
    }
    val full = read(dir).groupBy(grp)
      .agg(count(lit(1)).as("n"), sum($"Score").as("s"))
    val a = maintained.orderBy("g").as[(Long, Long, Double)].collect().toSeq
    val b = full.orderBy("g").as[(Long, Long, Double)].collect().toSeq
    assert(a == b, s"maintained $a vs full $b")
  }

  test("range subtraction: exact, boundary-clipping, never materializing") {
    def v(rs: (Long, Long)*) = {
      val s = rs.map(_._1).toArray; val e = rs.map(_._2).toArray
      new DeletionVector.Vector(s, e)
    }
    assert(LakeChangelog.subtractRanges(v((0L, 9L)), None) == Seq((0L, 9L)))
    assert(LakeChangelog.subtractRanges(v((0L, 9L)), Some(v((3L, 5L)))) ==
      Seq((0L, 2L), (6L, 9L)))
    assert(LakeChangelog.subtractRanges(v((0L, 9L)), Some(v((0L, 9L)))) ==
      Seq.empty)
    assert(LakeChangelog.subtractRanges(
      v((0L, 3L), (10L, 20L)), Some(v((2L, 12L), (18L, 19L)))) ==
      Seq((0L, 1L), (13L, 17L), (20L, 20L)))
    // giant ranges stay ranges (no per-position expansion)
    val huge = LakeChangelog.subtractRanges(
      v((0L, 10000000000L)), Some(v((1L, 9999999999L))))
    assert(huge == Seq((0L, 0L), (10000000000L, 10000000000L)))
  }
}
