package graft.sources.v2

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Record-lake compaction: byte-exact merges, metadata-only sidecar
  * union (pruning keeps working), packing plan, advisory fallback, and
  * the marker recovery protocol in every crash position. q268 gates the
  * end-to-end content against the oracle. */
class RecordCompactionSpec extends graft.SparkSpec {
  import spark.implicits._

  private def writeBatches(dir: String, batches: Int = 5): Unit =
    (0 until batches).foreach { b =>
      spark.range(b * 20L, (b + 1) * 20L).select(
          concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
          $"id".cast("double").as("Score"))
        .coalesce(1)
        .write.format("graft-records").option("path", dir)
        .mode("append").save()
    }

  private def readBack(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", "Score:number").load()

  private def dataFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles.filter(_.isFile).map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSeq.sorted

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("compacts to one file, rows byte-exact, sidecars unioned") {
    val dir = Files.createTempDirectory("graft_rc").toString + "/t"
    writeBatches(dir)
    val before = readBack(dir).orderBy("_record_id").collect().toSeq
    assert(dataFiles(dir).size == 5)
    val merged = RecordCompaction.compact(spark, dir, targetBytes = 1L << 30)
    assert(merged == 1 && dataFiles(dir).size == 1)
    assert(readBack(dir).orderBy("_record_id").collect().toSeq == before)
    // merged sidecar: summed rows, spanned min/max — metadata only
    val z = ZoneMap.load(fsOf(dir), s"$dir/${dataFiles(dir).head}").get
    assert(z.rows == 100L)
    assert(z.stats("Score").min == 0.0 && z.stats("Score").max == 99.0)
    assert(z.stats("_record_id").min == "r000" && z.stats("_record_id").max == "r099")
    // no markers or staging left behind (dot-prefixed local-FS .crc
    // shadows are noise)
    val left = new java.io.File(dir).listFiles.map(_.getName)
      .filterNot(_.startsWith("."))
    assert(!left.exists(_.startsWith("_compact-")), left.mkString(","))
    assert(!left.exists(_.startsWith("_staging-compact")), left.mkString(","))
  }

  test("packing honors targetBytes; pruning still skips after compaction") {
    val dir = Files.createTempDirectory("graft_rc2").toString + "/t"
    writeBatches(dir, batches = 6)
    val per = fsOf(dir).getFileStatus(new org.apache.hadoop.fs.Path(
      s"$dir/${dataFiles(dir).head}")).getLen
    // target of ~3 files per group -> 2 merged files
    val merged = RecordCompaction.compact(spark, dir, targetBytes = per * 3)
    assert(merged == 2 && dataFiles(dir).size == 2, dataFiles(dir))
    val (rows, opened) = {
      val before = RecordSourceMetrics.filesOpened.get()
      val r = readBack(dir).filter($"Score" >= 100).collect()
      (r, RecordSourceMetrics.filesOpened.get() - before)
    }
    assert(rows.length == 20 && opened == 1,
      s"zone pruning must survive compaction: opened $opened")
  }

  test("a statless input disables the merged sidecar; data stays exact") {
    val dir = Files.createTempDirectory("graft_rc3").toString + "/t"
    writeBatches(dir, batches = 3)
    val victim = dataFiles(dir).head
    assert(new java.io.File(s"$dir/${ZoneMap.Dir}/$victim.json").delete())
    val before = readBack(dir).count()
    assert(RecordCompaction.compact(spark, dir, 1L << 30) == 1)
    val f = dataFiles(dir).head
    assert(ZoneMap.load(fsOf(dir), s"$dir/$f").isEmpty, "advisory: no sidecar")
    assert(readBack(dir).count() == before)
  }

  test("recovery replays the marker from every crash position") {
    val dir = Files.createTempDirectory("graft_rc4").toString + "/t"
    writeBatches(dir, batches = 2)
    val fs = fsOf(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val olds = dataFiles(dir)
    def marker(id: String, staging: String, newFile: String): Unit = {
      val json = s"""{"staging":"$staging","new":"$newFile","olds":[${
        olds.map(o => "\"" + o + "\"").mkString(",")}]}"""
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, s"_compact-$id.json"), true)
      out.write(json.getBytes("UTF-8")); out.close()
    }
    // position A: marker exists, nothing staged, nothing new -> the
    // group never committed; marker dropped, olds untouched
    marker("a", s"$dir/_staging-compact-x/g0.jsonl", "compact-x-g0.jsonl")
    assert(RecordCompaction.recover(dir, conf) == 1)
    assert(dataFiles(dir) == olds)
    // position B: staged file exists, rename never happened -> recovery
    // finishes the rename and the deletes
    val stagedDir = new org.apache.hadoop.fs.Path(dir, "_staging-compact-y")
    fs.mkdirs(stagedDir)
    val staged = new org.apache.hadoop.fs.Path(stagedDir, "g0.jsonl")
    val out = fs.create(staged, true)
    olds.foreach { o =>
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, o))
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
    }
    out.close()
    val before = readBack(dir).orderBy("_record_id").collect().toSeq
    marker("b", staged.toString, "compact-y-g0.jsonl")
    assert(RecordCompaction.recover(dir, conf) == 1)
    assert(dataFiles(dir) == Seq("compact-y-g0.jsonl"))
    assert(readBack(dir).orderBy("_record_id").collect().toSeq == before)
    // position C: replaying with nothing pending is a no-op
    assert(RecordCompaction.recover(dir, conf) == 0)
    // compact() on the single remaining file is a no-op too
    assert(RecordCompaction.compact(spark, dir, 1L << 30) == 0)
  }
}
