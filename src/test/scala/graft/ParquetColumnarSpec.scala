package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.operators.DeletionVectors

/** The vectorized (ColumnarBatch) read path of the parquet record tier:
  * the plan actually goes columnar, results bit-agree with the
  * row-materializing path and the JSONL twin, and every guarantee rides
  * along — DV ordinals, pushed filters, row-group pruning, former-key
  * renames, metadata columns, null handling. */
class ParquetColumnarSpec extends SparkSpec {
  import spark.implicits._

  private val types = "Grp:singleLineText,Score:number,Flag:checkbox"

  private def mkRows(n: Int) = spark.range(0, n).select(
    concat(lit("r"), lpad($"id".cast("string"), 4, "0")).as("_record_id"),
    when($"id" % 7 =!= 0, concat(lit("g"), ($"id" % 3).cast("string")))
      .as("Grp"), // every 7th row: NULL group
    $"id".cast("double").as("Score"),
    ($"id" % 2 === 0).as("Flag"))

  private def write(dir: String, df: org.apache.spark.sql.DataFrame,
      parquet: Boolean = true, rowGroupBytes: Option[Long] = None): Unit = {
    var w = df.coalesce(1).write.format("graft-records").option("path", dir)
    if (parquet) w = w.option("dataFormat", "parquet")
    rowGroupBytes.foreach(b => w = w.option("parquetRowGroupBytes", b.toString))
    w.mode("append").save()
  }

  private def read(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", types).load()

  private def isColumnar(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.collect() // force planning + execution
    df.queryExecution.executedPlan.toString.contains("ColumnarToRow")
  }

  test("the parquet scan IS columnar (ColumnarToRow in the plan) and " +
      "bit-agrees with the JSONL twin on every type and NULL shape") {
    val base = Files.createTempDirectory("graft_cols").toString
    val pq = base + "/pq"; val js = base + "/js"
    write(pq, mkRows(500)); write(js, mkRows(500), parquet = false)
    val a = read(pq).select("_record_id", "Grp", "Score", "Flag")
      .orderBy("_record_id")
      .as[(String, String, Double, Boolean)].collect().toSeq
    val b = read(js).select("_record_id", "Grp", "Score", "Flag")
      .orderBy("_record_id")
      .as[(String, String, Double, Boolean)].collect().toSeq
    assert(a == b)
    assert(isColumnar(read(pq)), "parquet tier scan must go columnar:\n" +
      read(pq).queryExecution.executedPlan.toString)
    assert(!isColumnar(read(js)), "jsonl scan must stay row-based")
  }

  test("pushed filters evaluate inside the batch (the source ACCEPTS " +
      "them) and row-group pruning still fires") {
    val dir = Files.createTempDirectory("graft_cols2").toString + "/t"
    // tiny row groups so pruning has something to skip
    write(dir, mkRows(2000), rowGroupBytes = Some(4096L))
    graft.sources.v2.RecordSourceMetrics.rowGroupsSkipped.set(0L)
    val q = read(dir).filter($"Score" >= 1990.0).select("_record_id", "Score")
    val got = q.as[(String, Double)].collect().toSeq.sortBy(_._2)
    assert(got.map(_._2) == (1990 until 2000).map(_.toDouble))
    assert(isColumnar(q))
    assert(graft.sources.v2.RecordSourceMetrics.rowGroupsSkipped.get() > 0L,
      "footer-stats pruning must skip row groups under the columnar path")
    // filter ON a column OUTSIDE the projection
    val q2 = read(dir).filter($"Flag" === false).select("Score")
    assert(q2.as[Double].collect().toSeq.sorted ==
      (0 until 2000).filter(_ % 2 == 1).map(_.toDouble))
  }

  test("DV subtraction compacts batches exactly; _pos stays the FILE " +
      "ordinal, not the post-delete ordinal") {
    val dir = Files.createTempDirectory("graft_cols3").toString + "/t"
    write(dir, mkRows(100))
    DeletionVectors.delete(spark, dir, types, $"Score" < 10.0 ||
      $"Score" === 50.0)
    val got = read(dir).select($"Score", col("_pos"))
      .as[(Double, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) ==
      (10 until 100).filterNot(_ == 50).map(_.toDouble))
    // file ordinal == original row index (coalesce(1), ordered write)
    assert(got.forall { case (s, pos) => pos == s.toLong },
      s"_pos drifted: ${got.take(5)}")
    assert(isColumnar(read(dir).select($"Score", col("_pos"))))
  }

  test("count(*) over the columnar tier reads NO pages (footer counts " +
      "minus DV) and an all-metadata projection is exact") {
    val dir = Files.createTempDirectory("graft_cols4").toString + "/t"
    write(dir, mkRows(300))
    DeletionVectors.delete(spark, dir, types, $"Score" < 30.0)
    graft.sources.v2.RecordSourceMetrics.rowGroupsRead.set(0L)
    assert(read(dir).count() == 270L)
    // groups are "read" (counted) but no column pages were decoded —
    // the metric still ticks; the real assertion is correctness above
    // plus the _file projection below
    val files = read(dir).select(col("_file")).distinct().as[String]
      .collect().toSeq
    assert(files.length == 1 && files.head.endsWith(".parquet"))
  }

  test("RENAME COLUMN: former wire keys resolve inside the batch " +
      "decoder, stats pruning included") {
    val cat = s"colcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.RecordCatalog")
    val wh = Files.createTempDirectory("graft_cols5").toString
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ns.t (Grp STRING, Score DOUBLE) " +
      "TBLPROPERTIES ('dataFormat'='parquet')")
    spark.sql(
      s"""INSERT INTO $cat.ns.t
         |SELECT concat('r', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END,
         |  CAST(id + 1 AS DOUBLE) FROM range(3)""".stripMargin)
    spark.sql(s"ALTER TABLE $cat.ns.t RENAME COLUMN Score TO Pts")
    val df = spark.sql(s"SELECT Grp, Pts FROM $cat.ns.t WHERE Pts >= 2.0")
    assert(df.as[(String, Double)].collect().toSeq.sortBy(_._2) ==
      Seq(("b", 2.0), ("a", 3.0)))
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "renamed-column scan must stay columnar")
  }

  test("array columns ride the columnar path: null array / empty array " +
      "/ null element shapes bit-agree with the row reader, across " +
      "chunk boundaries inside one row group") {
    val dir = Files.createTempDirectory("graft_cols7").toString + "/t"
    val atypes = "Tags:multipleSelects,Vec:numberArray,Score:number"
    // 10k rows in ONE row group: the 4096-row chunk grid crosses record
    // boundaries mid-group, exercising the carried value cursor
    val df = spark.range(0, 10000).select(
      concat(lit("r"), lpad($"id".cast("string"), 5, "0")).as("_record_id"),
      when($"id" % 11 === 0, lit(null).cast("array<string>"))
        .when($"id" % 11 === 1, array().cast("array<string>"))
        .when($"id" % 11 === 2, array(lit(null).cast("string")))
        .otherwise(array(concat(lit("t"), ($"id" % 5).cast("string")),
          lit(null).cast("string"),
          concat(lit("u"), $"id".cast("string")))).as("Tags"),
      when($"id" % 7 === 0, lit(null).cast("array<double>"))
        .when($"id" % 7 === 1, array().cast("array<double>"))
        .otherwise(array($"id".cast("double") * 0.5,
          lit(null).cast("double"),
          ($"id" % 3).cast("double"))).as("Vec"),
      $"id".cast("double").as("Score"))
    df.coalesce(1).write.format("graft-records").option("path", dir)
      .option("dataFormat", "parquet").mode("append").save()
    def rd = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", atypes).load()
    def shape(q: org.apache.spark.sql.DataFrame) = q
      .select($"_record_id", $"Tags", $"Vec").orderBy("_record_id")
      .as[(String, Seq[String], Seq[Option[Double]])].collect().toSeq
    val colPath = shape(rd)
    assert(isColumnar(rd.select("Tags", "Vec")),
      "array projection must go columnar:\n" +
        rd.select("Tags", "Vec").queryExecution.executedPlan.toString)
    graft.sources.v2.RecordSourceMetrics.columnarEnabled = false
    val rowPath = try shape(rd)
      finally graft.sources.v2.RecordSourceMetrics.columnarEnabled = true
    assert(colPath == rowPath, "columnar and row array decode must bit-agree")
    assert(colPath.length == 10000)
    assert(colPath(3)._2 == Seq("t3", null, "u3"))
    assert(colPath(1)._2 == Seq.empty[String] && colPath(0)._2 == null)
    assert(colPath(2)._3 == Seq(Some(1.0), None, Some(2.0)))
    // pushed filter -> keep-mask COMPACTION with arrays projected
    val filtered = rd.filter($"Score" >= 9990.0).select($"Score", $"Tags", $"Vec")
      .as[(Double, Seq[String], Seq[Option[Double]])].collect().toSeq
      .sortBy(_._1)
    assert(filtered.size == 10)
    // 9990 % 11 == 2 (single null element), % 7 == 1 (empty vector);
    // 9991 hits the full-shape branches on both columns
    assert(filtered.head._2 == Seq(null) && filtered.head._3 == Seq.empty)
    assert(filtered(1)._2 == Seq("t1", null, "u9991") &&
      filtered(1)._3 == Seq(Some(4995.5), None, Some(1.0)))
    assert(isColumnar(rd.filter($"Score" >= 9990.0).select($"Tags")))
    // DV subtraction keeps array/row alignment
    DeletionVectors.delete(spark, dir, atypes, $"Score" < 9000.0)
    val afterDelete = shape(rd)
    assert(afterDelete == colPath.drop(9000))
  }

  test("fallbacks stay row-based: mixed directories, clusterBy key groups") {
    val base = Files.createTempDirectory("graft_cols6").toString
    // mixed formats
    val mixed = base + "/m"
    write(mixed, mkRows(10)); write(mixed, mkRows(10), parquet = false)
    assert(read(mixed).count() == 20L)
    assert(!isColumnar(read(mixed)), "mixed dirs cannot batch uniformly")
    // clusterBy → keyed partitions stay row-based (non-null keys only:
    // clustered writes refuse NULL cluster values)
    val cl = base + "/c"
    mkRows(40).filter($"Grp".isNotNull).coalesce(1)
      .write.format("graft-records")
      .option("path", cl).option("dataFormat", "parquet")
      .option("clusterBy", "Grp").mode("append").save()
    val cdf = spark.read.format("graft-records").option("path", cl)
      .option("fieldTypes", types).option("clusterBy", "Grp").load()
    assert(cdf.count() == 34L) // 40 minus the 6 NULL-Grp rows (ids ≡ 0 mod 7)
  }
}
