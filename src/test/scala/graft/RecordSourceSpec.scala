package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** DSv2 record source: typed read of the reference's wire shape, sparse
  * fields as nulls, and column pruning pushed into the source scan. */
class RecordSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture: String = {
    val dir = Files.createTempDirectory("graft_dsv2").toFile
    val f = new java.io.File(dir, "records.jsonl")
    java.nio.file.Files.writeString(f.toPath,
      """{"id":"rec1","createdTime":"2024-01-01T00:00:00Z","fields":{"Name":"alpha","Score":5,"Active":true,"Tags":["x","y"],"Attachments":[{"url":"http://a","size":9}]}}
        |{"id":"rec2","createdTime":"2024-01-02T12:30:00Z","fields":{"Name":"beta"}}
        |{"id":"rec3","createdTime":"2024-01-03T00:00:00Z","fields":{"Name":"gamma","Score":2.5,"Active":false}}""".stripMargin)
    f.getAbsolutePath
  }

  private def read() = spark.read.format("graft-records")
    .option("path", fixture)
    .option("fieldTypes",
      "Name:singleLineText,Score:number,Active:checkbox,Tags:multipleSelects,Attachments:multipleAttachments")
    .load()

  test("reads typed records with sparse fields as nulls") {
    val df = read()
    assert(df.columns.toSeq == Seq("_record_id", "_created_time", "Name",
      "Score", "Active", "Tags", "Attachments"))
    val rows = df.orderBy("_record_id").collect()
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getString(0) == "rec1")
    assert(r1.getAs[Double]("Score") == 5.0)
    assert(r1.getAs[Boolean]("Active"))
    assert(r1.getAs[scala.collection.Seq[String]]("Tags").toSeq == Seq("x", "y"))
    assert(r1.getAs[scala.collection.Seq[String]]("Attachments").toSeq == Seq("http://a")) // urls only
    val r2 = rows(1)
    assert(r2.isNullAt(r2.fieldIndex("Score"))) // sparse -> null
    assert(r2.getTimestamp(1).toString.startsWith("2024-01-02 12:30:00"))
  }

  test("column pruning reaches the source scan") {
    val df = read().select("Name", "Score")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RecordScan"), plan)
    assert(plan.contains("ReadSchema=struct<Name:string,Score:double>"), plan)
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("predicate pushdown reaches the source scan and filters exactly") {
    // the reference's Firestore surface: eq / neq / gt (lib/FirestoreWrapper.py:86-100)
    val eq = read().filter($"Name" === "beta")
    val eqPlan = eq.queryExecution.executedPlan.toString
    assert(eqPlan.contains("PushedFilters=[") && eqPlan.contains("EqualTo(Name,beta)"), eqPlan)
    assert(eq.collect().map(_.getString(0)).toSeq == Seq("rec2"))

    val neq = read().filter($"Name" =!= "beta")
    assert(neq.collect().map(_.getString(0)).sorted.toSeq == Seq("rec1", "rec3"))

    val gt = read().filter($"Score" > 2.0)
    val gtPlan = gt.queryExecution.executedPlan.toString
    assert(gtPlan.contains("GreaterThan(Score,2.0)"), gtPlan)
    assert(gt.collect().map(_.getString(0)).sorted.toSeq == Seq("rec1", "rec3"))

    // null semantics: Score > x must NOT match the sparse (null-Score) row;
    // IS NULL must
    assert(read().filter($"Score".isNull).collect().map(_.getString(0)).toSeq == Seq("rec2"))
    // boolean + timestamp leaves
    assert(read().filter($"Active" === false).collect().map(_.getString(0)).toSeq == Seq("rec3"))
    assert(read().filter($"_created_time" >= java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
      .collect().map(_.getString(0)).sorted.toSeq == Seq("rec2", "rec3"))
  }

  test("unsupported predicates stay with Spark (residual), results still exact") {
    val df = read().filter(lower($"Name").startsWith("be"))
    val plan = df.queryExecution.executedPlan.toString
    // the StartsWith-on-expression leaf stays in Spark's own Filter node;
    // the scan pushes only what it can evaluate exactly (the null guard)
    assert(plan.contains("Filter StartsWith(lower(Name"), plan)
    val scanDesc = plan.linesIterator.find(_.contains("RecordScan(")).get
    assert(!scanDesc.contains("StartsWith"), scanDesc)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("rec2"))
  }

  test("top-N pushdown bounds the scan and keeps exact order") {
    val df = read().orderBy($"Score".desc_nulls_last).limit(2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN=PushedTopN(Score,true,false,2)"), plan)
    assert(df.collect().map(_.getString(2)).toSeq == Seq("alpha", "gamma"))
    // ascending with nulls first: the sparse row must win
    val asc = read().orderBy($"Score".asc_nulls_first).limit(1)
    assert(asc.collect().map(_.getString(2)).toSeq == Seq("beta"))
  }

  test("pushed comparisons match Spark semantics at the edges") {
    // supplementary characters: UTF8String byte order, not UTF-16 code units
    val dir = Files.createTempDirectory("graft_dsv2_edge").toFile
    val f = new java.io.File(dir, "edge.jsonl")
    java.nio.file.Files.writeString(f.toPath,
      """{"id":"e1","createdTime":"1969-12-31T23:59:59.9Z","fields":{"Name":"😀","Score":-0.0}}
        |{"id":"e2","createdTime":"1970-01-01T00:00:00.2Z","fields":{"Name":"�","Score":1.5}}""".stripMargin)
    def readEdge() = spark.read.format("graft-records")
      .option("path", f.getAbsolutePath)
      .option("fieldTypes", "Name:singleLineText,Score:number").load()
    // U+1F600 sorts ABOVE U+FFFD in code-point order (UTF-16 compareTo
    // would say the opposite and silently drop e1 at the scan)
    assert(readEdge().filter($"Name" > "￼").count() == 2)
    assert(readEdge().filter($"Name" > "�").collect()
      .map(_.getString(0)).toSeq == Seq("e1"))
    // -0.0 == 0.0 per Spark comparison semantics
    assert(readEdge().filter($"Score" === 0.0).collect()
      .map(_.getString(0)).toSeq == Seq("e1"))
    assert(readEdge().filter($"Score" >= 0.0).count() == 2)
    // pre-epoch timestamp with fractional seconds: floored micros
    val cut = java.sql.Timestamp.valueOf("1969-12-31 23:59:59.95")
    assert(readEdge().filter($"_created_time" <= cut).collect()
      .map(_.getString(0)).toSeq == Seq("e1"))
    // array-typed sort keys must NOT be pushed (JSON-text order != Spark's)
    val arr = read().orderBy($"Tags").limit(2)
    val plan = arr.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedTopN"), plan)
  }

  test("plain limit pushdown caps per-partition output") {
    val df = read().limit(2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit=2"), plan)
    assert(df.collect().length == 2)
  }

  test("source feeds the sync pipeline end-to-end") {
    val statePath = new java.io.File(
      Files.createTempDirectory("graft_dsv2_pipe").toFile, "state").getAbsolutePath
    val cfg = PipelineConfig(
      SourceConfig(fixture, "records"), StoreConfig(statePath, "records"),
      UpdateType.UpsertChecksum, "_record_id", 1L)
    val state = new SyncPipeline(spark, cfg).run(read())
    assert(state.count() == 3)
    assert(state.filter(col("Name") === "beta").count() == 1)
  }

  test("aggregate pushdown pre-aggregates in the source, exactly") {
    // grouped: count(*) / count(col) / min / max reach the scan
    val grouped = read().groupBy($"Active")
      .agg(count(lit(1)).as("n"), count($"Score").as("ns"),
        min($"Score").as("mn"), max($"Name").as("mx"))
    val plan = grouped.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation=[groupBy=Active"), plan)
    val got = grouped.collect()
      .map(r => Option(r.get(0)) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)), r.getString(4))).toMap
    assert(got(Some(true)) == ((1L, 1L, Some(5.0), "alpha")))
    assert(got(Some(false)) == ((1L, 1L, Some(2.5), "gamma")))
    assert(got(None) == ((1L, 0L, None, "beta"))) // null group, sparse Score
    // global aggregate over a fully-filtered scan still counts 0
    val empty = read().filter($"Name" === "nope")
      .agg(count(lit(1)).as("n"), max($"Score").as("mx"))
    val eplan = empty.queryExecution.executedPlan.toString
    assert(eplan.contains("PushedAggregation"), eplan)
    val er = empty.collect().head
    assert(er.getLong(0) == 0L && er.isNullAt(1))
    // count distinct must NOT push (partials don't merge); results exact
    val cd = read().agg(countDistinct($"Active").as("n"))
    assert(!cd.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(cd.collect().head.getLong(0) == 2L)
    // SUM partials push for doubles; AVG rides Spark's sum/count rewrite
    // (V2ScanRelationPushDown decomposes it before pushing partials)
    val summed = read().groupBy($"Active")
      .agg(sum($"Score").as("s"), avg($"Score").as("a"))
    val splan = summed.queryExecution.executedPlan.toString
    assert(splan.contains("PushedAggregation=[groupBy=Active; " +
      "sum(Score),count(Score)]"), splan)
    val sg = summed.collect()
      .map(r => Option(r.get(0)) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(sg(Some(true)) == ((Some(5.0), Some(5.0))))
    assert(sg(Some(false)) == ((Some(2.5), Some(2.5))))
    assert(sg(None) == ((None, None))) // all-null group sums to NULL
    // sum over a non-double (string) column must NOT push
    val sstr = read().agg(sum($"Name").as("s"))
    assert(!sstr.queryExecution.executedPlan.toString
      .contains("PushedAggregation"))
  }

  test("pushed aggregation fails loudly past the group-key bound, not OOM") {
    // the in-reader hash table cannot spill, so a high-cardinality group
    // column must hit a clear ceiling instead of growing until executor OOM
    val dir = Files.createTempDirectory("graft_dsv2_wide").toFile
    val f = new java.io.File(dir, "wide.jsonl")
    val sb = new StringBuilder
    (0 to 100000).foreach { i => // MaxPushedGroups + 1 distinct keys
      sb.append(s"""{"id":"r$i","createdTime":"2024-01-01T00:00:00Z","fields":{"Name":"k$i"}}""")
      sb.append('\n')
    }
    java.nio.file.Files.writeString(f.toPath, sb.toString)
    val wide = spark.read.format("graft-records")
      .option("path", f.getAbsolutePath)
      .option("fieldTypes", "Name:singleLineText")
      .load()
    val agg = wide.groupBy($"Name").agg(count(lit(1)).as("n"))
    assert(agg.queryExecution.executedPlan.toString
      .contains("PushedAggregation=[groupBy=Name"))
    val ex = intercept[Exception] { agg.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("MaxPushedGroups")),
      s"expected the MaxPushedGroups ceiling in: ${messages(ex)}")
  }

  test("malformed lines: FAILFAST names file+line, DROPMALFORMED skips, PERMISSIVE keeps corrupt rows") {
    val dir = Files.createTempDirectory("graft_dsv2_bad").toFile
    val f = new java.io.File(dir, "records.jsonl")
    java.nio.file.Files.writeString(f.toPath,
      """{"id":"ok1","fields":{"Name":"alpha","Score":5}}
        |{not valid json at all
        |{"id":"ok2","fields":{"Name":"beta","Score":7}}""".stripMargin)
    def readMode(mode: String, fields: String = "Name:singleLineText,Score:number") =
      spark.read.format("graft-records").option("path", f.getAbsolutePath)
        .option("fieldTypes", fields).option("mode", mode).load()
    // default (FAILFAST): loud, contextual failure
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val ex = intercept[Exception] {
      spark.read.format("graft-records").option("path", f.getAbsolutePath)
        .option("fieldTypes", "Name:singleLineText").load().collect()
    }
    assert(messages(ex).exists(m => m.contains("malformed JSON") &&
      m.contains("records.jsonl:2")), s"got: ${messages(ex)}")
    // DROPMALFORMED: the two good rows, nothing else
    assert(readMode("DROPMALFORMED").select("Name").as[String].collect().sorted
      .toSeq == Seq("alpha", "beta"))
    // PERMISSIVE: the corrupt line survives as an all-NULL row; with a
    // declared _corrupt_record column it carries the raw text
    val perm = readMode("PERMISSIVE",
      "Name:singleLineText,Score:number,_corrupt_record:singleLineText")
      .orderBy("_record_id").collect()
    assert(perm.length == 3)
    val corrupt = perm.find(_.isNullAt(0)).get
    assert(corrupt.isNullAt(corrupt.fieldIndex("Name")))
    assert(corrupt.getAs[String]("_corrupt_record").startsWith("{not valid"))
    assert(perm.count(!_.isNullAt(0)) == 2) // well-formed rows unaffected
    // corrupt rows act as all-NULL records under pushed aggregation:
    // count(*) includes them, count(field)/min/max skip them
    val agg = readMode("PERMISSIVE").agg(
      count(lit(1)).as("n"), count(col("Score")).as("n_score"),
      max(col("Score")).as("mx")).collect()(0)
    assert(agg.getLong(0) == 3L && agg.getLong(1) == 2L && agg.getDouble(2) == 7.0)
    // and a pushed filter never matches a corrupt row's NULL fields
    assert(readMode("PERMISSIVE").filter($"Score" > 0).count() == 2)
    // unknown mode: planning-time rejection
    val bad = intercept[Exception] { readMode("LENIENT").collect() }
    assert(messages(bad).exists(_.contains("not one of")))
  }

  // ----------------------------- write path -----------------------------

  private def writeDf() = Seq(
    ("w1", "2024-03-01T08:00:00Z", "alpha", Some(5.0), Some(true), Seq("x", "y")),
    ("w2", "2024-03-02T09:30:00Z", "beta", None, None, Seq.empty[String]),
    ("w3", "2024-03-03T10:45:00Z", "gamma", Some(2.5), Some(false), Seq("z")))
    .toDF("_record_id", "ct", "Name", "Score", "Active", "Tags")
    .withColumn("_created_time", col("ct").cast("timestamp")).drop("ct")
    .select("_record_id", "_created_time", "Name", "Score", "Active", "Tags")

  private def readBack(path: String) = spark.read.format("graft-records")
    .option("path", path)
    .option("fieldTypes", "Name:singleLineText,Score:number,Active:checkbox,Tags:multipleSelects")
    .load()

  test("write path round-trips records exactly (staged commit, no torn files)") {
    val dir = Files.createTempDirectory("graft_dsv2_w").toString + "/t"
    writeDf().write.format("graft-records").option("path", dir)
      .mode("append").save()
    // staging is gone after commit; only data files remain
    val left = new java.io.File(dir).listFiles.map(_.getName)
    assert(!left.exists(_.startsWith("_staging")), left.mkString(","))
    val back = readBack(dir).orderBy("_record_id").collect()
    assert(back.length == 3)
    val r1 = back(0)
    assert(r1.getString(0) == "w1")
    assert(r1.getTimestamp(1).toInstant.toString == "2024-03-01T08:00:00Z")
    assert(r1.getAs[Double]("Score") == 5.0 && r1.getAs[Boolean]("Active"))
    assert(r1.getAs[scala.collection.Seq[String]]("Tags").toSeq == Seq("x", "y"))
    // NULL fields were omitted on the wire and come back as NULLs
    val r2 = back(1)
    assert(r2.isNullAt(r2.fieldIndex("Score")) && r2.isNullAt(r2.fieldIndex("Active")))
    // empty array survives as empty, not NULL
    assert(r2.getAs[scala.collection.Seq[String]]("Tags").isEmpty)
  }

  test("overwrite truncates previous contents; append accumulates") {
    val dir = Files.createTempDirectory("graft_dsv2_w").toString + "/t"
    writeDf().write.format("graft-records").option("path", dir).mode("append").save()
    writeDf().write.format("graft-records").option("path", dir).mode("append").save()
    assert(readBack(dir).count() == 6) // append kept both rounds
    writeDf().write.format("graft-records").option("path", dir)
      .mode("overwrite").save()
    assert(readBack(dir).count() == 3) // truncate-on-overwrite
  }

  test("NULL _record_id gets an auto-generated id (S9); explicit ids kept (S10)") {
    val dir = Files.createTempDirectory("graft_dsv2_w").toString + "/t"
    writeDf().withColumn("_record_id",
        when(col("Name") === "beta", lit(null: String)).otherwise(col("_record_id")))
      .write.format("graft-records").option("path", dir).mode("append").save()
    val ids = readBack(dir).select("_record_id").as[String].collect().toSeq
    assert(ids.length == 3 && ids.distinct.length == 3 && !ids.contains(null))
    assert(ids.count(_.startsWith("rec")) == 1) // the auto-id row
    assert(ids.toSet.intersect(Set("w1", "w3")) == Set("w1", "w3"))
  }

  test("unwritable column types fail at planning, not per row") {
    val dir = Files.createTempDirectory("graft_dsv2_w").toString + "/t"
    val bad = Seq((1L, "a")).toDF("n", "Name") // bigint has no wire form
    val ex = intercept[Exception] {
      bad.write.format("graft-records").option("path", dir).mode("append").save()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("cannot write column")),
      s"expected the schema validation message in: ${messages(ex)}")
  }

  test("aborted writes leave no data behind") {
    val dir = Files.createTempDirectory("graft_dsv2_w").toString + "/t"
    writeDf().write.format("graft-records").option("path", dir).mode("append").save()
    // a mid-write task failure aborts the job: the pre-existing data must
    // survive untouched and no staged/partial files may leak
    val failing = writeDf().withColumn("Score",
      udf((n: String) => {
        if (n == "beta") throw new RuntimeException("boom")
        1.0
      }).apply(col("Name")))
    intercept[Exception] {
      failing.write.format("graft-records").option("path", dir).mode("append").save()
    }
    val files = new java.io.File(dir).listFiles.map(_.getName)
    assert(!files.exists(_.startsWith("_staging")),
      s"staging leaked: ${files.mkString(",")}")
    assert(readBack(dir).count() == 3) // original data intact
  }

  test("ParquetLayout: footer rows reconcile with data; directory paths walk part files") {
    import spark.implicits._
    val single = "/root/testdata/sf0.001/orders.parquet"
    val out = graft.sources.ParquetLayout.layout(spark, Seq("orders" -> single))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.map(_._3).sum == spark.read.parquet(single).count(),
      "footer row total must equal the scanned count")
    assert(out.forall(r => r._6 <= r._5 && r._6 > 0),
      "compressed size must be positive and <= uncompressed")
    assert(out.map(_._2).sorted == out.indices.map(_.toLong),
      "row-group ids must be contiguous from 0")
    // a DIRECTORY of part files: every part contributes its groups
    val dir = Files.createTempDirectory("graft_layout").toString
    spark.read.parquet(single).repartition(3)
      .write.mode("overwrite").parquet(dir)
    val multi = graft.sources.ParquetLayout.layout(spark, Seq("o" -> dir))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(multi.map(_._3).sum == spark.read.parquet(single).count())
    assert(multi.size >= 3, s"expected >=3 part files, saw ${multi.size}")
  }

  // Regression pin for the round-6 driver failure: the fixture generator
  // switched events.ts from TIMESTAMP(NANOS) (read as a nanosecond long
  // under nanosAsLong) to TIMESTAMP(MICROS, isAdjustedToUTC=false) (read
  // as TIMESTAMP_NTZ), and Spark 4 refuses CAST(TIMESTAMP_NTZ AS BIGINT)
  // — every ts-arithmetic query crashed. readTable owns the contract:
  // whatever the physical encoding, `ts` surfaces as session-zone
  // TimestampType and epoch-second arithmetic resolves.
  test("readTable normalizes every ts physical encoding to TimestampType") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft_tsenc").toString
    val sec = 1704067200L // 2024-01-01T00:00:00Z
    // (a) nanosecond longs — the pre-round-6 NANOS shape under nanosAsLong
    spark.range(1, 4).select(col("id").as("event_id"),
      (col("id") * 1000000000L + lit(sec * 1000000000L)).as("ts"))
      .write.mode("overwrite").parquet(s"$base/nanos.parquet")
    // (b) TIMESTAMP_NTZ — the round-6 shape that crashed 8 queries
    spark.range(1, 4).select(col("id").as("event_id"),
      timestamp_seconds(col("id") + sec).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$base/ntz.parquet")
    // (c) plain session-zone timestamp
    spark.range(1, 4).select(col("id").as("event_id"),
      timestamp_seconds(col("id") + sec).as("ts"))
      .write.mode("overwrite").parquet(s"$base/ltz.parquet")
    for (t <- Seq("nanos", "ntz", "ltz")) {
      val df = graft.sources.Sources.readTable(spark, base, t)
      assert(df.schema("ts").dataType == TimestampType,
        s"$t: ts must surface as TimestampType, got ${df.schema("ts").dataType}")
      // the exact operation that failed in round 6, value-checked: the
      // session is pinned UTC, so all three encodings mean the same instant
      val secs = df.select(col("ts").cast("long")).as[Long].collect().sorted
      assert(secs.toSeq == Seq(sec + 1, sec + 2, sec + 3), s"$t: $secs")
    }
    // the live fixture dir honors the same contract
    val ev = graft.sources.Sources.readTable(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType)
  }

  test("micro-batch streaming tail: new files only, exactly-once across restart, staged writes visible") {
    val dir = Files.createTempDirectory("graft_dsv2_stream").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_dsv2_ckpt").toFile.getAbsolutePath
    def rec(id: String, name: String, score: Double) =
      s"""{"id":"$id","createdTime":"2024-01-01T00:00:00Z","fields":{"Name":"$name","Score":$score}}"""
    def addFile(fname: String, lines: String*): Unit =
      java.nio.file.Files.writeString(
        new java.io.File(dir, fname).toPath, lines.mkString("\n"))
    addFile("batch0.jsonl", rec("r1", "alpha", 1.0), rec("r2", "beta", 9.0))
    // a marker file must never read as data (the staging convention)
    addFile("_marker", rec("rX", "ghost", 7.0))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def start() = spark.readStream.format("graft-records")
      .option("path", dir)
      .option("fieldTypes", "Name:singleLineText,Score:number")
      .load()
      .where(col("Score") > 0.5)
      .select("_record_id")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.collect().foreach(r => seen.synchronized { seen += ((id, r.getString(0))) }); ()
      }.start()
    val q1 = start()
    q1.processAllAvailable()
    assert(seen.map(_._2).sorted.toSeq == Seq("r1", "r2"))
    // a later trigger delivers ONLY the new file (r4 fails the filter)
    addFile("batch1.jsonl", rec("r3", "gamma", 3.0), rec("r4", "delta", 0.1))
    q1.processAllAvailable()
    q1.stop()
    assert(seen.map(_._2).sorted.toSeq == Seq("r1", "r2", "r3"))
    // restart from the checkpoint: nothing re-delivers; an append through
    // the DSv2 WRITE path (staged two-phase commit) lands as a new file
    // the stream picks up — write and tail compose
    Seq(("r5", 2.0)).toDF("_record_id", "Score")
      .write.format("graft-records").option("path", dir).mode("append").save()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.map(_._2).sorted.toSeq == Seq("r1", "r2", "r3", "r5"),
      s"exactly-once violated: $seen")
    // offsets round-trip through their JSON form (checkpoint recovery path)
    val off = graft.sources.v2.RecordStreamOffset(Seq("b", "a"))
    assert(graft.sources.v2.RecordStreamOffset.fromJson(off.json()).files == Seq("a", "b"))
  }

  test("streaming write: epoch commit is exactly-once across engine retries") {
    // drives the REAL retry paths, not a mock: after a successful epoch,
    // the engine's commit-log entry is deleted so a restart re-executes
    // the same epoch against the sink.
    //   retry A (post-commit crash window): marker present -> the
    //     replayed epoch's staging is dropped wholesale;
    //   retry B (mid-commit crash window): marker deleted too, one
    //     committed file left behind -> the re-commit must clear the
    //     first attempt's files (task ids differ across attempts) before
    //     renaming its own, or both attempts' rows would coexist.
    val srcDir = Files.createTempDirectory("graft_sw_src").toFile.getAbsolutePath
    val sinkDir = Files.createTempDirectory("graft_sw_sink").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_sw_ckpt").toFile.getAbsolutePath
    def rec(id: String, score: Double) =
      s"""{"id":"$id","fields":{"Score":$score}}"""
    java.nio.file.Files.writeString(
      new java.io.File(srcDir, "in.jsonl").toPath,
      Seq(rec("a", 1.0), rec("b", 2.0), rec("c", 3.0)).mkString("\n"))
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-records")
        .option("path", srcDir).option("fieldTypes", "Score:number").load()
        .select("_record_id", "Score")
        .writeStream.format("graft-records")
        .option("path", sinkDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L); q.stop()
    }
    def sinkRows() = spark.read.format("graft-records")
      .option("path", sinkDir).option("fieldTypes", "Score:number").load()
      .select("_record_id").as[String].collect().sorted.toSeq
    def dataFiles() = new java.io.File(sinkDir).listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map(_.getName)
    runOnce()
    assert(sinkRows() == Seq("a", "b", "c"))
    val marker = new java.io.File(sinkDir, "_epoch-0.committed")
    assert(marker.exists, "epoch marker missing after commit")
    assert(!new java.io.File(sinkDir).listFiles.exists(
      f => f.isDirectory && f.getName.startsWith("_staging")),
      "staging dir left behind")
    // retry A: engine re-runs epoch 0, marker intact -> no duplicates.
    // The local-FS commit log leaves a .crc sidecar next to each entry;
    // it must go with the entry or the engine's rename-on-rewrite fails.
    def dropCommit0(): Unit = {
      val commit0 = new java.io.File(ckpt, "commits/0")
      assert(commit0.exists, "test setup: expected commit log entry 0")
      assert(commit0.delete())
      new java.io.File(ckpt, "commits/.0.crc").delete()
    }
    dropCommit0()
    runOnce()
    assert(sinkRows() == Seq("a", "b", "c"),
      s"post-commit retry duplicated rows: ${sinkRows()}")
    // retry B: marker gone AND one stale file from the 'first attempt'
    // left in place — the re-commit must supersede it, not add to it
    val before = dataFiles().toSet
    assert(marker.delete())
    dropCommit0()
    runOnce()
    assert(sinkRows() == Seq("a", "b", "c"),
      s"mid-commit retry duplicated rows: ${sinkRows()}")
    assert(marker.exists, "marker not rewritten by the retried commit")
    val after = dataFiles().toSet
    assert(before.intersect(after).isEmpty,
      s"retried epoch must supersede the first attempt's files: " +
        s"kept ${before.intersect(after)}")
  }

  test("streaming write rejects complete mode (truncate-per-epoch)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sinkDir = Files.createTempDirectory("graft_sw_rej").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_sw_rej_ck").toFile.getAbsolutePath
    val in = MemoryStream[(String, Double)]
    in.addData(("a", 1.0))
    val ex = intercept[Exception] {
      val q = in.toDF().toDF("_record_id", "Score")
        .groupBy("_record_id").agg(sum(col("Score")).as("Score"))
        .writeStream.format("graft-records")
        .option("path", sinkDir).option("checkpointLocation", ckpt)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(messages(ex).exists(_.contains("append output mode only")),
      s"wrong error: ${messages(ex)}")
  }

  test("maxFilesPerTrigger: a backlog drains as bounded micro-batches") {
    val dir = Files.createTempDirectory("graft_mfpt").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_mfpt_ck").toString
    (0 until 5).foreach { b =>
      spark.range(b * 10L, (b + 1) * 10L).select(
          concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
          $"id".cast("double").as("Score"))
        .coalesce(1)
        .write.format("graft-records").option("path", dir).mode("append").save()
    }
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft-records")
      .option("path", dir)
      .option("fieldTypes", "Score:number")
      .option("maxFilesPerTrigger", "2")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val n = b.count()
        batches.synchronized { batches += ((id, n)) }; ()
      }.start()
    q.awaitTermination(120000)
    // a 5-file backlog at 2 files/trigger: 20 + 20 + 10 rows, 3 batches
    assert(batches.map(_._2).toSeq == Seq(20L, 20L, 10L), batches)
    assert(batches.map(_._1).toSeq == Seq(0L, 1L, 2L))
    // a rejected option fails at planning, not mid-stream
    val bad = intercept[Exception] {
      spark.readStream.format("graft-records").option("path", dir)
        .option("fieldTypes", "Score:number")
        .option("maxFilesPerTrigger", "0").load()
        .writeStream.option("checkpointLocation",
          Files.createTempDirectory("graft_mfpt_ck2").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .start().awaitTermination(60000)
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs(bad).exists(_.contains("must be positive")), msgs(bad))
  }
}
