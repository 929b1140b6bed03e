package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors, LakeChangelog, LakeSnapshots}
import graft.sources.v2.{DeletionVector, RecordSourceMetrics}

/** The columnar (parquet) data tier of the record lake: typed
  * round-trip, row-group pruning from footer stats, deletion vectors by
  * row ordinal, materialize rewrite, time travel, blooms, changelog —
  * the whole sidecar discipline over parquet files, plus mixed-format
  * directories. */
class ParquetRecordsSpec extends SparkSpec {
  import spark.implicits._

  private val types =
    "Name:singleLineText,Score:number,Flag:checkbox,At:dateTime,On:date," +
      "Tags:multipleSelects"

  private def mkRows(n: Int) = spark.range(0, n.toLong).select(
    concat(lit("r"), lpad($"id".cast("string"), 4, "0")).as("_record_id"),
    concat(lit("name"), $"id").as("Name"),
    $"id".cast("double").as("Score"),
    ($"id" % 2 === 0).as("Flag"),
    (to_timestamp(lit("2024-03-01 10:00:00")).cast("long") + $"id")
      .cast("timestamp").as("At"),
    date_add(lit(java.sql.Date.valueOf("2024-03-01")),
      ($"id" % 30).cast("int")).as("On"),
    array(concat(lit("t"), $"id" % 3), lit("all")).as("Tags"))

  private def write(dir: String, df: org.apache.spark.sql.DataFrame,
      extra: Map[String, String] = Map.empty): Unit = {
    val w = df.coalesce(1).write.format("graft-records")
      .option("path", dir).option("dataFormat", "parquet")
    extra.foldLeft(w) { case (x, (k, v)) => x.option(k, v) }
      .mode("append").save()
  }

  private def read(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", types)
    .option("dataFormat", "parquet").load()

  test("typed round-trip: every wire type survives parquet exactly") {
    val dir = Files.createTempDirectory("graft_pq").toString + "/t"
    write(dir, mkRows(50))
    val back = read(dir)
    assert(back.count() == 50L)
    val r = back.filter($"_record_id" === "r0007")
      .select($"Name", $"Score", $"Flag", $"At".cast("string"),
        $"On".cast("string"), $"Tags")
      .as[(String, Double, Boolean, String, String, Seq[String])].head()
    assert(r == (("name7", 7.0, false, "2024-03-01 10:00:07",
      "2024-03-08", Seq("t1", "all"))))
    // data files really are parquet (magic bytes)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = fs.listStatus(new Path(dir)).filter(_.isFile)
      .map(_.getPath).filterNot(_.getName.startsWith("_"))
    assert(data.nonEmpty && data.forall(_.getName.endsWith(".parquet")))
    val in = fs.open(data.head)
    val magic = new Array[Byte](4); in.readFully(magic); in.close()
    assert(new String(magic, "US-ASCII") == "PAR1")
  }

  test("row-group pruning: footer stats skip groups the filter excludes") {
    val dir = Files.createTempDirectory("graft_pq2").toString + "/t"
    // tiny row groups -> many groups per file; Score is monotone so a
    // range predicate isolates a suffix of groups
    write(dir, mkRows(2000), Map("parquetRowGroupBytes" -> "4096"))
    val before = (RecordSourceMetrics.rowGroupsRead.get(),
      RecordSourceMetrics.rowGroupsSkipped.get())
    val hits = read(dir).filter($"Score" >= 1990).select($"_record_id")
      .as[String].collect().sorted
    assert(hits.length == 10 && hits.head == "r1990")
    val readGroups = RecordSourceMetrics.rowGroupsRead.get() - before._1
    val skipped = RecordSourceMetrics.rowGroupsSkipped.get() - before._2
    assert(skipped > readGroups,
      s"expected most row groups pruned, got read=$readGroups skipped=$skipped")
    // deletion vectors survive skipping: ordinals advance across
    // skipped groups, so deleting the probe rows removes EXACTLY them
    DeletionVectors.delete(spark, dir, types, $"Score" >= 1990)
    assert(read(dir).count() == 1990L)
    assert(read(dir).filter($"Score" >= 1990).count() == 0L)
  }

  test("the q277/q282 lifecycle over parquet: DV delete, snapshot, " +
      "time travel, materialize rewrite, changelog") {
    val dir = Files.createTempDirectory("graft_pq3").toString + "/t"
    write(dir, mkRows(100))
    val v1 = LakeSnapshots.commit(spark, dir)
    val marked = DeletionVectors.delete(spark, dir, types, $"Score" < 20)
    assert(marked.map(_.rowsMarked).sum == 20L)
    assert(read(dir).count() == 80L)
    // v1 reverses the delete (manifest-inlined DV state)
    assert(spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", types).option("versionAsOf", v1.toString)
      .load().count() == 100L)
    val v2 = LakeSnapshots.commit(spark, dir)
    // changelog between the snapshots: exactly the 20 deletions
    val d = LakeChangelog.changes(spark, dir, types, v1, v2)
    assert(d.agg(sum($"m")).as[Long].head() == -20L)
    assert(d.count() == 20L)
    // materialize skips while pinned, rewrites parquet after expiry
    assert(DeletionVectors.materialize(spark, dir) == 0)
    LakeSnapshots.expire(spark, dir, keepLast = 0)
    assert(DeletionVectors.materialize(spark, dir) == 1)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = fs.listStatus(new Path(dir)).filter(_.isFile)
      .map(_.getPath.getName).filterNot(_.startsWith("_"))
    assert(data.forall(_.endsWith(".parquet")), data.toSeq.toString)
    assert(!fs.exists(DeletionVector.sidecar(new Path(dir), data.head)) ||
      read(dir).count() == 80L)
    assert(read(dir).count() == 80L)
    assert(read(dir).agg(min($"Score")).as[Double].head() == 20.0)
  }

  test("columnar projection: filter columns outside the projection " +
      "still evaluate; count(*) drives on one column") {
    val dir = Files.createTempDirectory("graft_pq9").toString + "/t"
    write(dir, mkRows(100))
    // project Name only, filter on Score (not projected): the requested
    // parquet schema must include BOTH, and rows still filter exactly
    val names = read(dir).filter($"Score" >= 95).select($"Name")
      .as[String].collect().sorted.toSeq
    assert(names == (95 until 100).map(i => s"name$i"))
    // zero-column projections (count(*)) still iterate rows
    assert(read(dir).count() == 100L)
    assert(read(dir).filter($"Flag").count() == 50L)
  }

  test("bloom sidecars ride the parquet commit; point lookups prune files") {
    val dir = Files.createTempDirectory("graft_pq4").toString + "/t"
    (0 until 4).foreach { b =>
      write(dir, mkRows(400).filter($"Score" >= b * 100 && $"Score" < (b + 1) * 100),
        Map("bloomFilterColumns" -> "_record_id"))
    }
    val before = RecordSourceMetrics.filesOpened.get()
    val got = read(dir).filter($"_record_id" === "r0123")
      .select($"Score").as[Double].collect().toSeq
    assert(got == Seq(123.0))
    val opened = RecordSourceMetrics.filesOpened.get() - before
    assert(opened <= 2, s"bloom/zone pruning opened $opened of 4 files")
  }

  test("mixed directory: jsonl and parquet files read together; " +
      "GROUPED aggregates keep the vectorized scan, GLOBAL ones push") {
    val dir = Files.createTempDirectory("graft_pq5").toString + "/t"
    mkRows(10).coalesce(1).write.format("graft-records")
      .option("path", dir).mode("append").save() // jsonl
    write(dir, mkRows(20).filter($"Score" >= 10)) // parquet
    val all = read(dir)
    assert(all.count() == 20L)
    assert(all.agg(sum($"Score")).as[Double].head() == (0 until 20).sum.toDouble)
    // a GROUPED aggregate with parquet present is deliberately NOT
    // pushed: the columnar scan + codegen aggregate beats an in-reader
    // row fold (Spark's own parquet pushdown draws the same line)
    val agg = read(dir).groupBy($"Flag").agg(count(lit(1)).as("n"))
    assert(!agg.queryExecution.executedPlan.toString
      .contains("PushedAggregation"),
      "grouped agg over parquet must keep the vectorized scan")
    assert(agg.orderBy($"Flag").as[(Boolean, Long)].collect().toSeq ==
      Seq((false, 10L), (true, 10L)))
    // a GLOBAL stats-answerable aggregate pushes (both tiers fold)
    val g = read(dir).agg(count(lit(1)), max($"Score"))
    assert(g.queryExecution.executedPlan.toString
      .contains("PushedAggregation"), "global agg must push")
    assert(g.as[(Long, Double)].head() == ((20L, 19.0)))
  }

  test("parquet aggregate pushdown: global count/min/max answer from " +
      "FOOTER STATS (zero pages); filters/DV/groups take the decode path") {
    val dir = Files.createTempDirectory("graft_pq9").toString + "/t"
    write(dir, mkRows(500))
    write(dir, mkRows(1000).filter($"Score" >= 500))
    def agg = read(dir).agg(count(lit(1)).as("n"),
      count($"Name").as("ng"), min($"Score").as("mn"), max($"Score").as("mx"))
    RecordSourceMetrics.rowGroupsRead.set(0L)
    val (n, ng, mn, mx) = agg.as[(Long, Long, Double, Double)].head()
    assert((n, ng, mn, mx) == ((1000L, 1000L, 0.0, 999.0)))
    assert(agg.queryExecution.executedPlan.toString
      .contains("PushedAggregation"), "global agg must push")
    assert(RecordSourceMetrics.rowGroupsRead.get() == 0L,
      "footer-stats aggregation must not decode any row group")
    // string min/max: truncatable binary stats -> decode path, exact
    val ids = read(dir).agg(min($"_record_id"), max($"_record_id"))
      .as[(String, String)].head()
    assert(ids == (("r0000", "r0999")))
    // a DV makes stats unsafe: falls back to decode and stays exact
    DeletionVectors.delete(spark, dir, types, $"Score" === 999.0 ||
      $"Score" === 0.0)
    val (n2, mn2, mx2) = read(dir)
      .agg(count(lit(1)), min($"Score"), max($"Score"))
      .as[(Long, Double, Double)].head()
    assert((n2, mn2, mx2) == ((998L, 1.0, 998.0)))
    // grouped aggregates decode and stay exact
    val grouped = read(dir).groupBy($"Flag").agg(count(lit(1)).as("c"))
      .orderBy($"Flag").as[(Boolean, Long)].collect().toSeq
    assert(grouped == Seq((false, 499L), (true, 499L)))
  }

  test("numberArray (array<double>) round-trips BOTH wire tiers " +
      "identically: nulls, empties, null elements, DV deletes") {
    val base = Files.createTempDirectory("graft_pqvec").toString
    val vt = "Vec:numberArray,K:number"
    val rows = spark.range(0, 200).select(
      concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
      when($"id" % 10 === 0, lit(null).cast("array<double>"))
        .when($"id" % 10 === 1, array().cast("array<double>"))
        .when($"id" % 10 === 2, array(lit(null).cast("double"), lit(1.5)))
        .otherwise(array($"id".cast("double"), ($"id" * 0.25),
          lit(null).cast("double"))).as("Vec"),
      $"id".cast("double").as("K"))
    Seq(true, false).foreach { parquet =>
      val dir = s"$base/${if (parquet) "pq" else "js"}"
      val w = rows.coalesce(1).write.format("graft-records")
        .option("path", dir)
      (if (parquet) w.option("dataFormat", "parquet") else w)
        .mode("append").save()
    }
    def rd(dir: String) = spark.read.format("graft-records")
      .option("path", s"$base/$dir").option("fieldTypes", vt).load()
      .select($"_record_id", $"Vec", $"K").orderBy("_record_id")
      .as[(String, Seq[Option[Double]], Double)].collect().toSeq
    val (pq, js) = (rd("pq"), rd("js"))
    assert(pq == js, "parquet and jsonl array<double> must bit-agree")
    assert(pq(0)._2 == null && pq(1)._2 == Seq.empty &&
      pq(2)._2 == Seq(None, Some(1.5)) &&
      pq(3)._2 == Seq(Some(3.0), Some(0.75), None))
    // the vector column survives a DV delete on both tiers
    Seq("pq", "js").foreach { d =>
      DeletionVectors.delete(spark, s"$base/$d", vt, $"K" < 100.0)
      assert(rd(d) == pq.drop(100), s"tier $d after delete")
    }
  }

  test("NaN-poisoned footer stats: parquet-java folds double min/max " +
      "with Math.min/max, so one NaN poisons both bounds — the stats " +
      "agg path must refuse and row-group pruning must keep the block") {
    val dir = Files.createTempDirectory("graft_pqnan").toString + "/t"
    // Score = id, except every id % 100 == 7 is NaN; tiny row groups so
    // MANY groups carry a NaN (their footer min/max are both NaN)
    val rows = spark.range(0, 2000).select(
      concat(lit("r"), lpad($"id".cast("string"), 4, "0")).as("_record_id"),
      when($"id" % 100 === 7, lit(Double.NaN))
        .otherwise($"id".cast("double")).as("Score"))
    rows.coalesce(1).write.format("graft-records")
      .option("path", dir).option("dataFormat", "parquet")
      .option("parquetRowGroupBytes", "4096").mode("append").save()
    def rd = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").option("dataFormat", "parquet")
      .load()
    // pruned scan bit-matches the filter semantics: Score < 50 keeps the
    // 49 non-NaN rows even though their row group's footer min is NaN
    // (pre-fix, the poisoned zone pruned the whole group)
    val under50 = rd.filter($"Score" < 50).select($"_record_id")
      .as[String].collect().sorted.toSeq
    assert(under50.length == 49 && under50.head == "r0000" &&
      !under50.contains("r0007"), s"got ${under50.length} rows")
    // NaN sorts GREATEST in Spark: Score > 1990 admits every NaN row
    assert(rd.filter($"Score" > 1990).count() == 9L + 20L)
    // pushed global agg refuses the poisoned stats path and answers
    // from data: min is the smallest NON-NaN value, max is NaN
    RecordSourceMetrics.rowGroupsRead.set(0L)
    val agg = rd.agg(count(lit(1)).as("n"), min($"Score").as("mn"),
      max($"Score").as("mx"))
    assert(agg.queryExecution.executedPlan.toString
      .contains("PushedAggregation"), "global agg must still push")
    val (n, mn, mx) = agg.as[(Long, Double, Double)].head()
    assert(n == 2000L && mn == 0.0 && mx.isNaN, s"($n, $mn, $mx)")
    assert(RecordSourceMetrics.rowGroupsRead.get() > 0L,
      "NaN-poisoned stats must fall to the decode path")
    // -0.0 in footer stats is normalized on adoption (Spark: -0.0 == 0.0)
    // and the CLEAN file still answers min/max from the footer alone
    val dir2 = Files.createTempDirectory("graft_pqnan2").toString + "/t"
    spark.range(0, 10).select(
        concat(lit("z"), $"id".cast("string")).as("_record_id"),
        when($"id" === 0, lit(-0.0d))
          .otherwise($"id".cast("double")).as("Score"))
      .coalesce(1).write.format("graft-records").option("path", dir2)
      .option("dataFormat", "parquet").mode("append").save()
    RecordSourceMetrics.rowGroupsRead.set(0L)
    val mn2 = spark.read.format("graft-records").option("path", dir2)
      .option("fieldTypes", "Score:number").option("dataFormat", "parquet")
      .load().agg(min($"Score")).as[Double].head()
    assert(mn2 == 0.0 && 1.0 / mn2 > 0, s"footer -0.0 must adopt as +0.0, got $mn2")
    assert(RecordSourceMetrics.rowGroupsRead.get() == 0L,
      "clean doubles must keep the zero-page stats path")
  }

  test("parquet compaction merges by ROW COPY, same-schema only, " +
      "never mixing with jsonl") {
    val dir = Files.createTempDirectory("graft_pq6").toString + "/t"
    // two same-schema parquet files + two jsonl files: each family
    // merges within itself (one group each), never across
    write(dir, mkRows(10))
    write(dir, mkRows(20).filter($"Score" >= 10))
    mkRows(30).filter($"Score" >= 20).coalesce(1).write
      .format("graft-records").option("path", dir).mode("append").save()
    mkRows(40).filter($"Score" >= 30).coalesce(1).write
      .format("graft-records").option("path", dir).mode("append").save()
    assert(graft.sources.v2.RecordCompaction.compact(spark, dir, 1L << 30) == 2)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = fs.listStatus(new Path(dir)).filter(_.isFile)
      .map(_.getPath.getName).filterNot(_.startsWith("_")).sorted
    assert(data.length == 2 && data.forall(_.startsWith("compact-")),
      data.toSeq.toString)
    assert(data.count(_.endsWith(".parquet")) == 1 &&
      data.count(_.endsWith(".jsonl")) == 1, data.toSeq.toString)
    assert(read(dir).count() == 40L)
    assert(read(dir).agg(sum($"Score")).as[Double].head() ==
      (0 until 40).sum.toDouble)
    // the merged parquet still row-group-prunes (real parquet, not a concat)
    assert(read(dir).filter($"Score" === 5.0).count() == 1L)
  }

  test("clusterBy over parquet: key-pure files, storage-partitioned " +
      "join with ZERO exchanges") {
    val base = Files.createTempDirectory("graft_pq8").toString
    def writeClustered(dir: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.repartition(col("Key")).write.format("graft-records")
        .option("path", dir).option("dataFormat", "parquet")
        .option("clusterBy", "Key").mode("append").save()
    val facts = spark.range(0, 40).select(
      concat(lit("f"), $"id".cast("string")).as("_record_id"),
      concat(lit("k"), ($"id" % 4).cast("string")).as("Key"),
      $"id".cast("double").as("V"))
    val dims = spark.range(0, 4).select(
      concat(lit("d"), $"id".cast("string")).as("_record_id"),
      concat(lit("k"), $"id".cast("string")).as("Key"),
      ($"id" * 100).cast("double").as("V"))
    writeClustered(s"$base/facts", facts)
    writeClustered(s"$base/dims", dims)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(s"$base/facts")).filter(_.isFile)
      .map(_.getPath).filterNot(_.getName.startsWith("_")).foreach { f =>
        assert(f.getName.endsWith(".parquet"), f.getName)
        val st = graft.sources.v2.ZoneMap.load(fs, f.toString).get.stats("Key")
        assert(st.min == st.max && st.nulls == 0L, s"$f: $st")
      }
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "true"); spark.conf.set(keys(1), "true")
    spark.conf.set(keys(2), "-1")
    try {
      def rdc(dir: String) = spark.read.format("graft-records")
        .option("path", dir).option("fieldTypes", "Key:singleLineText,V:number")
        .option("dataFormat", "parquet").option("clusterBy", "Key").load()
      val j = rdc(s"$base/facts").join(rdc(s"$base/dims"), "Key")
        .groupBy("Key").agg(count(lit(1)).as("n"))
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        j.queryExecution.executedPlan.toString)
      assert(j.orderBy("Key").as[(String, Long)].collect().toSeq ==
        (0 until 4).map(k => (s"k$k", 10L)))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("RENAME COLUMN over the parquet tier: former wire keys resolve " +
      "through footer schemas and row-group stats") {
    val cat = s"graftpq${System.nanoTime()}"
    val wh = Files.createTempDirectory("graft_pq_cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.RecordCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ns.p (Score DOUBLE) " +
      "TBLPROPERTIES ('dataFormat'='parquet')")
    spark.sql(
      s"""INSERT INTO $cat.ns.p
         |SELECT concat('r', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  CAST(id AS DOUBLE) FROM range(10)""".stripMargin)
    spark.sql(s"ALTER TABLE $cat.ns.p RENAME COLUMN Score TO Pts")
    spark.sql(
      s"""INSERT INTO $cat.ns.p
         |SELECT concat('r', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  CAST(id AS DOUBLE) FROM range(10, 15)""".stripMargin)
    // the data files really are parquet, with BOTH wire schemas present
    val fs = new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = fs.listStatus(new Path(s"$wh/ns/p")).filter(_.isFile)
      .map(_.getPath).filterNot(_.getName.startsWith("_"))
    assert(data.forall(_.getName.endsWith(".parquet")))
    val sigs = data.map(p => graft.sources.v2.ParquetRecords
      .schemaSignature(spark.sparkContext.hadoopConfiguration, p)).toSet
    assert(sigs.exists(_.contains("Score")) && sigs.exists(_.contains("Pts")),
      sigs.toString)
    // reads, filters (row-group stats under the OLD key), and deletes
    // all resolve through the rename lineage
    assert(spark.sql(s"SELECT sum(Pts) FROM $cat.ns.p")
      .as[Double].head() == (0 until 15).sum.toDouble)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.p WHERE Pts >= 8")
      .as[Long].head() == 7L)
    spark.sql(s"DELETE FROM $cat.ns.p WHERE Pts < 3")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.p").as[Long].head() == 12L)
  }

  test("user columns named 'id' or 'createdTime' are refused loudly — " +
      "they would alias the reserved wire names") {
    val dir = Files.createTempDirectory("graft_pq8").toString + "/t"
    Seq("id", "createdTime").foreach { bad =>
      val e = intercept[Exception] {
        spark.range(0, 3).select(
            concat(lit("r"), $"id".cast("string")).as("_record_id"),
            $"id".cast("double").as(bad))
          .write.format("graft-records").option("path", dir)
          .option("dataFormat", "parquet").mode("append").save()
      }
      assert(e.getMessage.contains("reserved wire name") ||
        Option(e.getCause).exists(_.getMessage.contains("reserved wire name")),
        s"'$bad': ${e.getMessage}")
    }
    // the JSONL tier accepts the same names (fields.* namespace)
    spark.range(0, 3).select(
        concat(lit("r"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("id"))
      .write.format("graft-records").option("path", dir)
      .mode("append").save()
    assert(spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "id:number").load().count() == 3L)
  }

  test("parquet compaction skips files whose schemas differ") {
    val dir = Files.createTempDirectory("graft_pq7").toString + "/t"
    write(dir, mkRows(5))
    // a second parquet file with a DIFFERENT schema (fewer columns)
    spark.range(100, 105).select(
        concat(lit("x"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("Score"))
      .coalesce(1).write.format("graft-records").option("path", dir)
      .option("dataFormat", "parquet").mode("append").save()
    assert(graft.sources.v2.RecordCompaction.compact(spark, dir, 1L << 30) == 0)
    assert(read(dir).count() == 10L)
  }
}
