package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.functions.Normalize
import graft.operators.Export
import graft.sources.{Sources, View, ViewCatalog}

class NormalizeExportSpec extends SparkSpec {
  import spark.implicits._

  test("cast matrix: text/number/checkbox/date/dateTime/selects") {
    val df = Seq(("42", "7.5", "true", "2024-03-01", "2024-03-01T10:30:00Z", "x"))
      .toDF("t", "n", "b", "d", "dt", "passthru")
    val out = df.select(
      Normalize.castTo($"t", "singleLineText").as("t"),
      Normalize.castTo($"n", "number").as("n"),
      Normalize.castTo($"b", "checkbox").as("b"),
      Normalize.castTo($"d", "date").as("d"),
      Normalize.castTo($"dt", "dateTime").as("dt"),
      Normalize.castTo($"passthru", "unknownType").as("p"))
    val r = out.head()
    assert(r.getString(0) == "42")
    assert(r.getDouble(1) == 7.5)
    assert(r.getBoolean(2))
    assert(r.getDate(3).toString == "2024-03-01")
    assert(r.getTimestamp(4) == Timestamp.valueOf("2024-03-01 10:30:00"))
    assert(r.getString(5) == "x")
  }

  test("attachment arrays keep only urls") {
    val df = spark.sql(
      "SELECT array(named_struct('url','http://a','size',1), named_struct('url','http://b','size',2)) AS att")
    val out = df.select(Normalize.castTo(col("att"), "multipleAttachments").as("urls"))
      .as[Seq[String]].head()
    assert(out == Seq("http://a", "http://b"))
  }

  test("lenient timestamp accepts ISO variants; datetime probe rejects bare numbers") {
    val df = Seq(
      "2024-03-01T10:30:00.123+02:00",
      "2024-03-01T10:30:00",
      "2024-03-01 10:30:00",
      "2024-03-01",
      "5" // the reference's dateutil hazard: parses as a date — we must not
    ).toDF("s")
    val parsed = df.select(Normalize.lenientTimestamp($"s").as("ts")).collect()
    assert(parsed.take(4).forall(_.get(0) != null))
    assert(parsed(4).get(0) == null)
    val probes = df.select(Normalize.isDatetimeLike($"s").as("p")).as[Boolean].collect()
    assert(probes.toSeq == Seq(true, true, true, true, false))
  }

  test("lenient timestamp non-ISO breadth: RFC-1123, US slash, written months") {
    val cases = Seq(
      "Thu, 01 Feb 2024 10:30:00 GMT" -> "2024-02-01 10:30:00",
      "02/01/2024 08:15:00" -> "2024-02-01 08:15:00", // US month-first by contract
      "02/01/2024" -> "2024-02-01 00:00:00",
      "01 Feb 2024" -> "2024-02-01 00:00:00",
      "Feb 1, 2024" -> "2024-02-01 00:00:00")
    val got = cases.map(_._1).toDF("s")
      .select(date_format(Normalize.lenientTimestamp($"s"),
        "yyyy-MM-dd HH:mm:ss").as("t")).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
    // anchored guards: near-misses of each shape must NOT parse — a
    // non-GMT zone name, 13th month, bare 8-digit number, trailing text
    val bad = Seq("Thu, 01 Feb 2024 10:30:00 PST", "13/01/2024",
      "20240201", "Feb 1, 2024 extra", "99/99/9999")
      .toDF("s").select(Normalize.lenientTimestamp($"s").as("ts")).collect()
    assert(bad.forall(_.get(0) == null), s"near-miss parsed: ${bad.toSeq}")
  }

  test("null pk and empty pk rows are dropped") {
    val df = Seq((Some("a"), 1), (None, 2), (Some(""), 3)).toDF("id", "v")
    assert(Normalize.filterValidPk(df, "id").as[(String, Int)].collect().toSeq == Seq(("a", 1)))
  }

  test("cleanProjection drops keys at depth and cleans strings") {
    val df = spark.sql(
      """SELECT ' padded\t' AS s,
        |  named_struct('keep', 'x\ty', 'secret', 'z') AS nested,
        |  array(named_struct('keep', ' a ', 'secret', 'b')) AS arr,
        |  'drop me' AS secret""".stripMargin)
    val out = Normalize.cleanProjection(df, Set("secret"))
    assert(out.columns.toSeq == Seq("s", "nested", "arr"))
    val r = out.head()
    assert(r.getString(0) == "padded")
    assert(r.getStruct(1).schema.fieldNames.toSeq == Seq("keep"))
    assert(r.getStruct(1).getString(0) == "xy")
    assert(r.getSeq[org.apache.spark.sql.Row](2).head.getString(0) == "a")
  }

  test("view catalog projects visible fields in order, minus hidden") {
    val df = Seq((1, "n", 2.0, "seg")).toDF("id", "name", "bal", "segment")
    val cat = new ViewCatalog(Map("v1" -> View("v1", Seq("name", "id", "bal"), Set("bal"))))
    assert(cat(df, "v1").columns.toSeq == Seq("name", "id"))
    intercept[IllegalArgumentException](cat(df, "nope"))
  }

  test("view catalog loads from a JSON sidecar (metadata-API stand-in)") {
    val f = java.nio.file.Files.createTempFile("graft_views", ".json")
    java.nio.file.Files.writeString(f,
      """[{"name": "v1", "visibleFieldOrder": ["name", "id", "bal"], "hiddenFields": ["bal"]},
        | {"name": "v2", "visibleFieldOrder": ["id"]}]""".stripMargin)
    val cat = ViewCatalog.fromSidecar(spark, f.toString)
    assert(cat.viewNames == Seq("v1", "v2"))
    val df = Seq((1, "n", 2.0, "seg")).toDF("id", "name", "bal", "segment")
    assert(cat(df, "v1").columns.toSeq == Seq("name", "id")) // order kept, hidden dropped
    assert(cat(df, "v2").columns.toSeq == Seq("id"))
    intercept[IllegalArgumentException](cat.get("nope"))
    // duplicate names must fail the load (last-write-wins would silently
    // mask a malformed sidecar), and the error names the duplicate
    val dup = java.nio.file.Files.createTempFile("graft_views_dup", ".json")
    java.nio.file.Files.writeString(dup,
      """[{"name": "v1", "visibleFieldOrder": ["a"]},
        | {"name": "v1", "visibleFieldOrder": ["b"]}]""".stripMargin)
    val err = intercept[IllegalArgumentException](
      ViewCatalog.fromSidecar(spark, dup.toString))
    assert(err.getMessage.contains("duplicate") && err.getMessage.contains("v1"))
  }

  test("content fingerprint is stable on unchanged data, moves on rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp").toFile
    val p = new java.io.File(dir, "t.parquet").getAbsolutePath
    spark.range(10).toDF("id").write.mode("overwrite").parquet(p)
    val hp = new org.apache.hadoop.fs.Path(p)
    val conf = spark.sparkContext.hadoopConfiguration
    val f1 = Sources.contentFingerprint(hp, conf)
    assert(f1 == Sources.contentFingerprint(hp, conf)) // deterministic
    spark.range(10).select(($"id" + 1).as("id")).write.mode("overwrite").parquet(p)
    assert(f1 != Sources.contentFingerprint(hp, conf)) // content change moves it
    // PARTITIONED tables nest data files under part dirs — the
    // fingerprint must see them (a flat listing would fingerprint only
    // directory metadata and never change on rewrite)
    val pp = new java.io.File(dir, "part.parquet").getAbsolutePath
    val php = new org.apache.hadoop.fs.Path(pp)
    spark.range(20).select($"id", ($"id" % 2).as("b"))
      .write.mode("overwrite").partitionBy("b").parquet(pp)
    val pf1 = Sources.contentFingerprint(php, conf)
    spark.range(20).select(($"id" + 5).as("id"), ($"id" % 2).as("b"))
      .write.mode("overwrite").partitionBy("b").parquet(pp)
    val pf2 = Sources.contentFingerprint(php, conf)
    assert(pf1 != pf2)
    // transient files NESTED under metadata dirs (a concurrent writer's
    // _temporary task outputs) must not perturb the fingerprint — the
    // leaf name alone looks like an ordinary part file
    val tmpTask = new java.io.File(pp, "_temporary/0/task_1")
    tmpTask.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(tmpTask, "part-00000.parquet").toPath, "uncommitted")
    assert(Sources.contentFingerprint(php, conf) == pf2)
    // and a RELATIVE path fingerprints identically to the absolute form
    // (no machine-specific prefix leaks into the digest)
    val rel = new org.apache.hadoop.fs.Path(
      java.nio.file.Path.of("").toAbsolutePath.relativize(
        java.nio.file.Path.of(pp)).toString)
    assert(Sources.contentFingerprint(rel, conf) == pf2)
  }

  test("export orders priority columns first, rest sorted; union fills nulls") {
    assert(Export.orderedColumns(Seq("z", "a", "id", "m"), Seq("id", "missing", "m"))
      == Seq("id", "m", "a", "z"))
    val a = Seq((1, "x")).toDF("id", "only_a")
    val b = Seq((2, "y")).toDF("id", "only_b")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toFile
    val path = new java.io.File(dir, "out").getAbsolutePath
    Export.writeCsv(Seq(a, b), Seq("id"), path)
    val back = spark.read.option("header", "true").csv(path)
    assert(back.columns.toSeq == Seq("id", "only_a", "only_b"))
    assert(back.count() == 2)
  }

  test("jsonl export shards by record cap, drops nulls, round-trips") {
    val df = (1 to 10).map(i => (i.toLong, s"doc $i",
      if (i % 2 == 0) Some(i * 1.5) else None)).toDF("doc_id", "text", "score")
    val dir = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_jsonl").toFile, "out").getAbsolutePath
    Export.writeJsonl(df, Seq("doc_id"), dir, maxRecordsPerFile = 3)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json"))
    assert(files.forall(f =>
      java.nio.file.Files.readAllLines(f.toPath).size() <= 3)) // shard cap holds
    val back = spark.read.json(dir)
    assert(back.count() == 10)
    assert(back.columns.sorted.toSeq == Seq("doc_id", "score", "text"))
    // odd rows exported without a score key (null dropped), read back null
    assert(back.filter(col("score").isNull).count() == 5)
  }

  test("record-shaped ingestion flattens sparse fields under a typed schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rec").toFile
    val f = new java.io.File(dir, "recs.json")
    java.nio.file.Files.writeString(f.toPath,
      """{"id":"rec1","createdTime":"2024-01-01T00:00:00Z","fields":{"Name":"n1","Score":5}}
        |{"id":"rec2","createdTime":"2024-01-02T00:00:00Z","fields":{"Name":"n2"}}""".stripMargin)
    val out = Sources.readRecords(spark, f.getAbsolutePath,
      Map("Name" -> "singleLineText", "Score" -> "number"))
    assert(out.columns.toSeq == Seq("_record_id", "_created_time", "Name", "Score"))
    val r = out.orderBy("_record_id").collect()
    assert(r(0).getAs[Double]("Score") == 5.0)
    assert(r(1).isNullAt(3)) // sparse field -> null
  }
}
