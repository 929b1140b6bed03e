package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors, LakeSnapshots}

/** The `cdc=true` connector surface: batch version-window reads and the
  * streaming change feed (one snapshot transition per micro-batch),
  * over both data tiers, composing with snapshotPerEpoch. */
class LakeCdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def append(dir: String, from: Long, until: Long,
      parquet: Boolean = false): Unit = {
    val w = spark.range(from, until).select(
        concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        $"id".cast("double").as("Score"))
      .coalesce(1).write.format("graft-records").option("path", dir)
    (if (parquet) w.option("dataFormat", "parquet") else w)
      .mode("append").save()
  }

  private def cdcBatch(dir: String, from: Long, to: Long) =
    spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number")
      .option("cdc", "true")
      .option("startingVersion", from.toString)
      .option("endingVersion", to.toString).load()

  test("batch CDC window: inserts, DV deletes, version-0 bootstrap") {
    val dir = Files.createTempDirectory("graft_cdcs").toString + "/t"
    append(dir, 0, 10)
    val v1 = LakeSnapshots.commit(spark, dir)
    append(dir, 10, 20)
    DeletionVectors.delete(spark, dir, "Score:number", $"Score" === 3.0)
    val v2 = LakeSnapshots.commit(spark, dir)
    // bootstrap from 0: v1's full content as inserts
    val boot = cdcBatch(dir, 0, v1).select($"Score", $"m")
      .as[(Double, Long)].collect().toMap
    assert(boot == (0 until 10).map(i => i.toDouble -> 1L).toMap)
    // (v1, v2]: the appended file's rows +1, the DV-diff row -1
    val d = cdcBatch(dir, v1, v2).select($"Score", $"m")
      .as[(Double, Long)].collect()
    assert(d.count(_._2 == 1L) == 10 && d.count(_._2 == -1L) == 1)
    assert(d.filter(_._2 == -1L).map(_._1).toSeq == Seq(3.0))
    // netting via consolidate reproduces LakeChangelog semantics
    val net = graft.operators.IncrementalAgg.consolidate(
      cdcBatch(dir, v1, v2).select($"Score", $"m"))
    assert(net.count() == 11L)
  }

  test("streaming CDC: one snapshot transition per micro-batch, " +
      "deterministic replay into a maintained aggregate") {
    val dir = Files.createTempDirectory("graft_cdcs2").toString + "/t"
    append(dir, 0, 30)
    LakeSnapshots.commit(spark, dir) // v1
    DeletionVectors.delete(spark, dir, "Score:number",
      pmod($"Score", lit(5.0)) === 0.0)
    LakeSnapshots.commit(spark, dir) // v2
    append(dir, 30, 40)
    LakeSnapshots.commit(spark, dir) // v3
    val ckpt = Files.createTempDirectory("graft_cdcs2_ck").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = spark.readStream.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number")
      .option("cdc", "true").option("startingVersion", "0")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val r = df.agg(sum($"m"), sum($"m" * $"Score")).collect()(0)
        if (!r.isNullAt(0))
          batches.synchronized {
            batches += ((id, r.getLong(0), r.getDouble(1)))
          }
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    val got = batches.sortBy(_._1).map(t => (t._2, t._3)).toSeq
    // wave 1: 30 inserts; wave 2: -6 deletes (0,5,10,15,20,25);
    // wave 3: 10 inserts — one wave per snapshot transition
    assert(got == Seq(
      (30L, (0 until 30).sum.toDouble),
      (-6L, -(0 until 30 by 5).sum.toDouble),
      (10L, (30 until 40).sum.toDouble)), got.toString)
    // maintained state = full recompute
    val maintained = got.map(_._2).sum
    val full = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").load()
      .agg(sum($"Score")).as[Double].head()
    assert(maintained == full)
  }

  test("CDC serves the parquet tier through the same feed") {
    val dir = Files.createTempDirectory("graft_cdcs3").toString + "/t"
    append(dir, 0, 10, parquet = true)
    val v1 = LakeSnapshots.commit(spark, dir)
    DeletionVectors.delete(spark, dir, "Score:number", $"Score" < 2.0)
    append(dir, 10, 15, parquet = true)
    val v2 = LakeSnapshots.commit(spark, dir)
    val d = cdcBatch(dir, v1, v2).select($"Score", $"m")
      .as[(Double, Long)].collect().toMap
    val want = (10 until 15).map(i => i.toDouble -> 1L).toMap ++
      Map(0.0 -> -1L, 1.0 -> -1L)
    assert(d == want, d.toString)
  }

  test("pacing: maxVersionsPerBatch coalesces adjacent transitions and " +
      "initialSnapshotOneBatch backfills in one scan — every pacing " +
      "nets to the SAME Z-relation as per-version replay") {
    val dir = Files.createTempDirectory("graft_cdcs5").toString + "/t"
    // ~50 tiny commits, the shape a snapshotPerEpoch sink produces;
    // every 10th is a delete so coalescing exercises DV diffs too
    (0 until 50).foreach { k =>
      if (k % 10 == 9)
        // retract a row the PREVIOUS commit appended (4·(k−1))
        DeletionVectors.delete(spark, dir, "Score:number",
          $"Score" === ((k - 1) * 4).toDouble)
      else append(dir, k * 4L, k * 4L + 4L)
      LakeSnapshots.commit(spark, dir)
    }
    def consume(extra: Map[String, String]): (Long, Map[Double, Long]) = {
      val ckpt = Files.createTempDirectory("graft_cdcs5_ck").toString
      val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
      val acc = scala.collection.mutable.Map.empty[Double, Long]
      var r = spark.readStream.format("graft-records").option("path", dir)
        .option("fieldTypes", "Score:number")
        .option("cdc", "true").option("startingVersion", "0")
      extra.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.groupBy($"Score").agg(sum($"m").as("m"))
            .as[(Double, Long)].collect()
          acc.synchronized {
            if (rows.nonEmpty) nBatches.incrementAndGet()
            rows.foreach { case (s, m) =>
              val nm = acc.getOrElse(s, 0L) + m
              if (nm == 0L) acc.remove(s) else acc(s) = nm
            }
          }
          ()
        }.start()
      q.processAllAvailable()
      q.stop()
      (nBatches.get(), acc.toMap)
    }
    val (nPer, zPer) = consume(Map.empty)
    val (nCoal, zCoal) = consume(Map("maxVersionsPerBatch" -> "7"))
    val (nBoot, zBoot) = consume(Map("initialSnapshotOneBatch" -> "true"))
    assert(zPer == zCoal && zPer == zBoot,
      s"netted Z-relations diverge: per=${zPer.size} coal=${zCoal.size} " +
        s"boot=${zBoot.size}")
    assert(nPer == 50L, s"per-version replay: $nPer batches")
    assert(nCoal == 8L, s"ceil(50/7): $nCoal batches") // 7×7 + 1
    assert(nBoot == 1L, s"bootstrap-as-one-batch: $nBoot batches")
    // and the netted feed equals the live table
    val live = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").load()
      .groupBy($"Score").count().as[(Double, Long)].collect().toMap
    assert(zPer == live.map { case (s, n) => s -> n }, "feed != table")
  }

  test("table_changes TVF: path form, to-head default, and loud " +
      "rejection of non-literal / malformed arguments") {
    val dir = Files.createTempDirectory("graft_cdcs6").toString + "/t"
    append(dir, 0, 10)
    LakeSnapshots.commit(spark, dir) // v1
    DeletionVectors.delete(spark, dir, "Score:number", $"Score" < 3.0)
    LakeSnapshots.commit(spark, dir) // v2
    val got = spark.sql(
      s"SELECT Score, m FROM table_changes('$dir', 'Score:number', 1, 2)")
      .as[(Double, Long)].collect().toMap
    assert(got == Map(0.0 -> -1L, 1.0 -> -1L, 2.0 -> -1L), got.toString)
    // to-head default: (1, head] == (1, 2]
    val toHead = spark.sql(
      s"SELECT sum(m) FROM table_changes('$dir', 'Score:number', 1)")
      .as[Long].head()
    assert(toHead == -3L)
    // bootstrap window 0 -> v2 nets to the live table
    val boot = spark.sql(
      s"SELECT count(*), sum(m) FROM table_changes('$dir', 'Score:number', 0, 2)")
      .as[(Long, Long)].head()
    assert(boot == ((7L, 7L)), boot.toString)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$dir', 'Score:number')")
        .collect()
    }
    assert(e.getMessage.contains("table_changes"), e.getMessage)
  }

  test("the stream survives a restart from its checkpoint (offsets are " +
      "snapshot versions)") {
    val dir = Files.createTempDirectory("graft_cdcs4").toString + "/t"
    append(dir, 0, 5)
    LakeSnapshots.commit(spark, dir) // v1
    val ckpt = Files.createTempDirectory("graft_cdcs4_ck").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[Double]
    def run(): Unit = {
      val q = spark.readStream.format("graft-records").option("path", dir)
        .option("fieldTypes", "Score:number")
        .option("cdc", "true").option("startingVersion", "0")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val xs = df.select($"Score" * $"m").as[Double].collect()
          seen.synchronized { seen ++= xs }
          ()
        }.start()
      q.processAllAvailable()
      q.stop()
    }
    run()
    assert(seen.sorted.toSeq == (0 until 5).map(_.toDouble))
    append(dir, 5, 8)
    LakeSnapshots.commit(spark, dir) // v2
    run() // restart: must deliver ONLY the new transition
    assert(seen.sorted.toSeq == (0 until 8).map(_.toDouble))
  }
}
