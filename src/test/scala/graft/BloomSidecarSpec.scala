package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.v2.{BloomSidecar, RecordSourceMetrics}

/** Per-file bloom sidecars: point-lookup file skipping on string ids —
  * the pruning a min/max zone cannot give over high-cardinality values. */
class BloomSidecarSpec extends SparkSpec {
  import spark.implicits._

  /** Eight files of 50 ids each; ids are random-looking (md5-prefixed)
    * so every file's zone RANGE overlaps every other's. */
  private def mkLake(): String = {
    val dir = Files.createTempDirectory("graft_bloom").toString + "/t"
    (0 until 8).foreach { b =>
      spark.range(b * 50L, (b + 1) * 50L).select(
          concat(substring(md5($"id".cast("string")), 1, 8), lit("-"),
            lpad($"id".cast("string"), 4, "0")).as("_record_id"),
          $"id".cast("double").as("Score"))
        .coalesce(1)
        .write.format("graft-records").option("path", dir)
        .option("bloomFilterColumns", "_record_id")
        .option("bloomBits", "8192")
        .mode("append").save()
    }
    dir
  }

  private def read(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", "Score:number").load()

  private def opened[A](body: => A): (A, Long) = {
    val before = RecordSourceMetrics.filesOpened.get()
    val r = body
    (r, RecordSourceMetrics.filesOpened.get() - before)
  }

  test("collector/filter round-trip: no false negatives, low fp rate") {
    val c = new BloomSidecar.Collector("id", 8192)
    (0 until 500).foreach(i => c.add(s"key-$i"))
    val f = BloomSidecar.parse(c.toJson)
    assert(f.length == 1 && f.head.column == "id")
    (0 until 500).foreach(i =>
      assert(f.head.mightContain(s"key-$i"), s"false negative key-$i"))
    val fps = (0 until 2000).count(i => f.head.mightContain(s"other-$i"))
    assert(fps < 200, s"$fps/2000 false positives at 16 bits/key")
  }

  test("a point lookup opens only the bloom-surviving files") {
    val dir = mkLake()
    // the id of row 123 (file 2): recompute its md5-prefixed form
    val id = read(dir).filter($"Score" === 123.0)
      .select($"_record_id").as[String].head()
    val (rows, n) = opened {
      read(dir).filter($"_record_id" === id).select($"Score")
        .as[Double].collect()
    }
    assert(rows.toSeq == Seq(123.0))
    assert(n < 8, s"bloom pruned nothing: opened $n of 8 files")
    // IN-lists prune to the union of their members' files
    val ids = read(dir).filter($"Score".isin(7.0, 399.0))
      .select($"_record_id").as[String].collect().toSeq
    val (inRows, inN) = opened {
      read(dir).filter($"_record_id".isin(ids: _*)).select($"Score")
        .as[Double].collect()
    }
    assert(inRows.sorted.toSeq == Seq(7.0, 399.0))
    assert(inN < 8, s"IN-list pruned nothing: opened $inN of 8")
    // a miss (no such id) should open (almost) nothing — and still
    // return no rows even when a false positive opens a file
    val (missRows, missN) = opened {
      read(dir).filter($"_record_id" === "zz-nothing").count()
    }
    assert(missRows == 0L)
    assert(missN <= 1, s"miss opened $missN files")
  }

  test("truncate drops stale blooms; unbloomed writes stay unpruned") {
    val dir = mkLake()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(dir, BloomSidecar.Dir)).length == 8)
    // overwrite WITHOUT blooms: the old sidecars must not survive to
    // describe (and mis-prune) the replacement files
    spark.range(0, 10).select(
        concat(lit("n"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("Score"))
      .write.format("graft-records").option("path", dir)
      .mode("overwrite").save()
    assert(!fs.exists(new Path(dir, BloomSidecar.Dir)) ||
      fs.listStatus(new Path(dir, BloomSidecar.Dir)).isEmpty)
    assert(read(dir).filter($"_record_id" === "n3").count() == 1L)
  }

  test("compaction and dv-materialize retire the inputs' blooms") {
    val dir = mkLake()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.DeletionVectors.delete(spark, dir, "Score:number",
      col("Score") < 10)
    assert(graft.operators.DeletionVectors.materialize(spark, dir) == 1)
    graft.sources.v2.RecordCompaction.compact(spark, dir, 1 << 20)
    val blooms = if (fs.exists(new Path(dir, BloomSidecar.Dir)))
      fs.listStatus(new Path(dir, BloomSidecar.Dir)).map(_.getPath.getName)
    else Array.empty[String]
    val live = fs.listStatus(new Path(dir)).filter(_.isFile)
      .map(_.getPath.getName).filterNot(_.startsWith("_")).toSet
    assert(blooms.forall(b => live.contains(b.stripSuffix(".json"))),
      s"orphan blooms: ${blooms.toSeq} vs live $live")
    assert(read(dir).count() == 390L)
  }
}
