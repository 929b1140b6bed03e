package graft

import java.nio.file.Files

/** SQL UPDATE / MERGE INTO / non-metadata DELETE on record lakes:
  * group-based copy-on-write through SupportsRowLevelOperations. */
class RowLevelOpsSpec extends SparkSpec {
  import spark.implicits._

  private val nonce = new java.util.concurrent.atomic.AtomicInteger(100)

  private def freshTable(): (String, String) = {
    val cat = s"rlocat${nonce.incrementAndGet()}"
    val wh = Files.createTempDirectory("graft_rlo").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.RecordCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ns.t (Name STRING, Score DOUBLE)")
    spark.sql(
      s"""INSERT INTO $cat.ns.t
         |SELECT concat('r', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  concat('n', CAST(id AS STRING)), CAST(id AS DOUBLE)
         |FROM range(10)""".stripMargin)
    (s"$cat.ns.t", s"$wh/ns/t")
  }

  test("SQL UPDATE rewrites matching rows, preserves the rest") {
    val (t, _) = freshTable()
    spark.sql(s"UPDATE $t SET Score = Score + 100, Name = 'bumped' " +
      "WHERE Score >= 7")
    val rows = spark.sql(s"SELECT Name, Score FROM $t ORDER BY Score")
      .as[(String, Double)].collect()
    assert(rows.length == 10)
    assert(rows.take(7).map(_._2).toSeq == (0 until 7).map(_.toDouble))
    assert(rows.drop(7).toSeq ==
      Seq(("bumped", 107.0), ("bumped", 108.0), ("bumped", 109.0)))
    // _record_id survives the rewrite (identity-preserving update)
    assert(spark.sql(s"SELECT _record_id FROM $t WHERE Score = 107.0")
      .as[String].head() == "r7")
  }

  test("MERGE INTO upserts: update matched, insert new, delete flagged") {
    val (t, _) = freshTable()
    Seq(("r3", "n3x", 33.0, false), ("r5", "n5", 5.0, true),
      ("r99", "n99", 99.0, false))
      .toDF("rid", "name", "score", "del").createOrReplaceTempView("rlo_src")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING rlo_src AS src
         |ON tgt._record_id = src.rid
         |WHEN MATCHED AND src.del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET Name = src.name, Score = src.score
         |WHEN NOT MATCHED THEN INSERT
         |  (_record_id, _created_time, Name, Score)
         |  VALUES (src.rid, CAST(NULL AS TIMESTAMP), src.name, src.score)
         |""".stripMargin)
    val rows = spark.sql(s"SELECT _record_id, Name, Score FROM $t ORDER BY Score")
      .as[(String, String, Double)].collect().toSeq
    assert(rows.length == 10) // 10 - 1 deleted + 1 inserted
    assert(!rows.exists(_._1 == "r5"), "r5 must be merge-deleted")
    assert(rows.contains(("r3", "n3x", 33.0)), "r3 must be updated")
    assert(rows.contains(("r99", "n99", 99.0)), "r99 must be inserted")
    spark.catalog.dropTempView("rlo_src")
  }

  test("a DELETE outside the metadata surface falls back to copy-on-write") {
    val (t, dir) = freshTable()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).toSet
    val before = dataFiles
    // `%` is not pushable -> not a deletion-vector delete; previously
    // this REFUSED — with row-level ops it rewrites, correctly
    spark.sql(s"DELETE FROM $t WHERE Score % 2 = 0 OR Score > 7")
    assert(spark.sql(s"SELECT Score FROM $t ORDER BY Score")
      .as[Double].collect().toSeq == Seq(1.0, 3.0, 5.0, 7.0))
    assert(dataFiles != before, "copy-on-write must rewrite files")
    assert(dataFiles.forall(_.startsWith("rlo-")), dataFiles)
    // while a PUSHABLE delete still takes the metadata-only path
    val mid = dataFiles
    spark.sql(s"DELETE FROM $t WHERE Score = 3.0")
    assert(dataFiles == mid, "pushable DELETE must stay metadata-only")
    assert(fs.exists(new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(dir),
      graft.sources.v2.DeletionVector.Dir)))
    assert(spark.sql(s"SELECT Score FROM $t ORDER BY Score")
      .as[Double].collect().toSeq == Seq(1.0, 5.0, 7.0))
  }

  test("copy-on-write composes with deletion vectors; group pruning rewrites only matching files") {
    val (t, dir) = freshTable()
    spark.sql(s"DELETE FROM $t WHERE Score < 2") // metadata-only (DVs)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).toSet
    val before = dataFiles
    spark.sql(s"UPDATE $t SET Score = Score * 10 WHERE Score = 9.0")
    // Spark's runtime group filter prunes the rewrite to the files that
    // CAN match: untouched files keep their names (and their vectors —
    // still applied at read), matching ones come back as rlo-*
    val after = dataFiles
    assert((before intersect after).nonEmpty,
      s"group pruning should keep non-matching files: $before -> $after")
    assert((after -- before).forall(_.startsWith("rlo-")), after)
    // a vector on an UNREWRITTEN file keeps applying; a rewritten
    // file's vector is retired with it — either way the visible rows
    // are exact
    assert(spark.sql(s"SELECT Score FROM $t ORDER BY Score")
      .as[Double].collect().toSeq ==
      Seq(2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 90.0))
    val dvDir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(dir), graft.sources.v2.DeletionVector.Dir)
    if (fs.exists(dvDir))
      fs.listStatus(dvDir).map(_.getPath.getName.stripSuffix(".json"))
        .foreach(n => assert(after.contains(n), s"orphan vector for $n"))
  }
}
