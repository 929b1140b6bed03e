package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.Vacuum

/** VACUUM: crash-debris sweep — marker replay, dead staging dirs,
  * orphan sidecars; live state untouched, epoch markers preserved. */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  test("vacuum sweeps debris and leaves the live table intact") {
    val dir = Files.createTempDirectory("graft_vac").toString + "/t"
    spark.range(0, 20).select(
        concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        $"id".cast("double").as("Score"))
      .coalesce(2)
      .write.format("graft-records").option("path", dir)
      .option("bloomFilterColumns", "_record_id").mode("append").save()
    graft.operators.DeletionVectors.delete(spark, dir, "Score:number",
      col("Score") === 3.0)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val d = new Path(dir)
    // debris: a dead staging dir, orphan sidecars of a vanished file,
    // and a streaming epoch marker (which must SURVIVE — exactly-once
    // memory)
    val staging = new Path(d, "_staging-deadquery")
    fs.mkdirs(staging)
    val o1 = fs.create(new Path(staging, "part-00000-9.jsonl"), true)
    o1.write("{}".getBytes("UTF-8")); o1.close()
    graft.sources.v2.ZoneMap.write(fs, d, "gone.jsonl", """{"rows":1,"fields":{}}""")
    graft.sources.v2.BloomSidecar.write(fs, d, "gone.jsonl", "[]")
    val dv = new graft.sources.v2.DeletionVector.Vector(Array(0L), Array(0L))
    graft.sources.v2.DeletionVector.write(fs, d, "gone2.jsonl", Array(0L))
    val epoch = fs.create(new Path(d, "_epoch-3.committed"), true); epoch.close()
    val before = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").load()
      .agg(count(lit(1)), sum($"Score")).as[(Long, Double)].head()

    val r = Vacuum.clean(spark, dir)
    assert(r.stagingDirsRemoved == 1 && r.orphanSidecarsRemoved == 3, r)
    assert(!fs.exists(staging))
    assert(!fs.exists(graft.sources.v2.ZoneMap.sidecar(d, "gone.jsonl")))
    assert(!fs.exists(graft.sources.v2.DeletionVector.sidecar(d, "gone2.jsonl")))
    assert(fs.exists(new Path(d, "_epoch-3.committed")), "epoch marker kept")
    // live sidecars and data survive; the DV still applies
    val after = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").load()
      .agg(count(lit(1)), sum($"Score")).as[(Long, Double)].head()
    assert(after == before && after._1 == 19L, (before, after))
    assert(Vacuum.clean(spark, dir) == Vacuum.Report(0, 0, 0), "idempotent")
  }

  test("vacuum replays a pending dv-materialize marker first") {
    val dir = Files.createTempDirectory("graft_vac2").toString + "/t"
    spark.range(0, 10).select(
        concat(lit("r"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("Score"))
      .coalesce(1)
      .write.format("graft-records").option("path", dir).mode("append").save()
    graft.operators.DeletionVectors.delete(spark, dir, "Score:number",
      col("Score") === 7.0)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val name = fs.listStatus(new Path(dir)).filter(_.isFile)
      .map(_.getPath.getName).filterNot(_.startsWith("_")).head
    // stage the rewrite by hand + marker, as if materialize crashed
    val dv = graft.sources.v2.DeletionVector
      .load(fs, new Path(dir, name).toString).get
    val staged = new Path(new Path(dir, "_staging-dvmat-vac"), "f0.jsonl")
    fs.mkdirs(staged.getParent)
    val out = fs.create(staged, true)
    val in = fs.open(new Path(dir, name))
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().zipWithIndex
      .foreach { case (l, i) =>
        if (!dv.contains(i.toLong)) out.write((l + "\n").getBytes("UTF-8")) }
    in.close(); out.close()
    val marker = fs.create(new Path(dir, "_dvmat-vac-f0.json"), true)
    marker.write((s"""{"staging":"$staged","new":"dvmat-vac-f0.jsonl",""" +
      s""""old":"$name"}""").getBytes("UTF-8"))
    marker.close()
    val r = Vacuum.clean(spark, dir)
    assert(r.markersReplayed == 1, r)
    assert(spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").load().count() == 9L)
  }
}
