package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors, LakeSnapshots, LakeView}

/** The SQL surface over maintained views: create_lake_view persists the
  * fold rules, refresh_lake_view advances by the watermarked delta and
  * reports the consumed windows, lake_view reads the state — and every
  * contract the Scala API enforces (idle no-op, definition immutability,
  * defined-view-only reads) holds through SQL. */
class LakeViewSqlSpec extends SparkSpec {
  import spark.implicits._

  private val types = "Grp:singleLineText,Score:number"

  private def append(dir: String, from: Long, until: Long): Unit =
    spark.range(from, until).select(
        concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        concat(lit("g"), ($"id" % 3).cast("string")).as("Grp"),
        $"id".cast("double").as("Score"))
      .coalesce(1)
      .write.format("graft-records").option("path", dir).mode("append").save()

  test("aggregate view through SQL: create is idempotent on the same " +
      "definition, refresh reports windows, state equals full recompute") {
    val dir = Files.createTempDirectory("graft_vsql").toString + "/t"
    val view = Files.createTempDirectory("graft_vsql").toString + "/v"
    append(dir, 0, 30)
    LakeSnapshots.commit(spark, dir)
    def create() = spark.sql(
      s"""SELECT * FROM create_lake_view('$view', 'aggregate',
         |  '$dir', '$types', 'Grp', 'Score', 'Score')""".stripMargin)
      .collect()(0)
    assert(create().getBoolean(1)) // first create writes
    assert(!create().getBoolean(1)) // identical re-create no-ops
    // a CONFLICTING definition is refused
    val e = intercept[Exception](spark.sql(
      s"""SELECT * FROM create_lake_view('$view', 'aggregate',
         |  '$dir', '$types', 'Grp', '', '')""".stripMargin))
    assert(e.getMessage.contains("DIFFERENT definition"))

    def refresh() =
      spark.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
    val r1 = refresh()
    assert(r1.getString(0) == "aggregate")
    assert(r1.getLong(1) == 0L && r1.getLong(2) == 1L) // window (0,1]
    assert(r1.isNullAt(3) && r1.isNullAt(4)) // no right side
    assert(r1.getLong(5) == 3L) // three groups folded
    assert(refresh().getLong(5) == 0L) // idle no-op

    DeletionVectors.delete(spark, dir, types,
      pmod($"Score", lit(5.0)) === 0.0)
    LakeSnapshots.commit(spark, dir)
    append(dir, 30, 40)
    LakeSnapshots.commit(spark, dir)
    val r2 = refresh()
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 3L) // both deltas, once

    val got = spark.sql(
      s"""SELECT Grp, n, sum_Score, mn_Score, mx_Score
         |FROM lake_view('$view') ORDER BY Grp""".stripMargin)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val want = spark.read.format("graft-records")
      .option("path", dir).option("fieldTypes", types).load()
      .groupBy("Grp").agg(count(lit(1)).as("n"), sum($"Score"),
        min($"Score"), max($"Score"))
      .orderBy("Grp")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == want)

    // view-level time travel: the PREVIOUS generation (retention keeps
    // current + previous) reads the pre-r2 state; an expired one refuses
    assert(LakeView.generations(spark, view) == Seq(1L, 2L))
    val gen1 = spark.sql(
      s"""SELECT Grp, CAST(n AS BIGINT) AS n FROM lake_view('$view', 1)
         |ORDER BY Grp""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(gen1 == Seq(("g0", 10L), ("g1", 10L), ("g2", 10L)))
    LakeSnapshots.commit(spark, dir) // a third refresh expires gen 1
    DeletionVectors.delete(spark, dir, types, $"Score" === 1.0)
    LakeSnapshots.commit(spark, dir)
    refresh()
    val gone = intercept[Exception](spark.sql(
      s"SELECT * FROM lake_view('$view', 1)"))
    assert(gone.getMessage.contains("not live"))
    assert(spark.sql(s"SELECT * FROM lake_view('$view', 2)").count() > 0)
  }

  test("join view through SQL: bilinear refresh with both sides' " +
      "windows reported; reads refuse undefined or bare state paths") {
    val base = Files.createTempDirectory("graft_vsql").toString
    val lt = s"$base/l"; val rt = s"$base/r"; val view = s"$base/v"
    spark.range(0, 20).select(
        concat(lit("o"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("OKey"),
        ($"id" % 5).cast("double").as("K"),
        ($"id" * 2).cast("double").as("X"))
      .coalesce(1)
      .write.format("graft-records").option("path", lt).mode("append").save()
    spark.range(0, 5).select(
        concat(lit("c"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("K"),
        concat(lit("s"), ($"id" % 2).cast("string")).as("Seg"))
      .coalesce(1)
      .write.format("graft-records").option("path", rt).mode("append").save()
    LakeSnapshots.commit(spark, lt)
    LakeSnapshots.commit(spark, rt)
    val ltypes = "OKey:number,K:number,X:number"
    val rtypes = "K:number,Seg:singleLineText"
    spark.sql(
      s"""SELECT * FROM create_lake_view('$view', 'join',
         |  '$lt', '$ltypes', 'K,OKey,X',
         |  '$rt', '$rtypes', 'K,Seg', 'K')""".stripMargin).collect()
    def refresh() =
      spark.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
    val r1 = refresh()
    assert(r1.getString(0) == "join")
    assert(r1.getLong(1) == 0L && r1.getLong(2) == 1L)
    assert(r1.getLong(3) == 0L && r1.getLong(4) == 1L)
    assert(r1.getLong(5) == 20L) // every left row matches one right row
    // right-side delete retracts the joined rows through one refresh
    DeletionVectors.delete(spark, rt, rtypes, $"K" === 2.0)
    LakeSnapshots.commit(spark, rt)
    assert(refresh().getLong(5) > 0L)
    assert(refresh().getLong(5) == 0L) // idle
    val got = spark.sql(
      s"""SELECT Seg, CAST(sum(m) AS BIGINT) AS n, sum(m * X) AS sx
         |FROM lake_view('$view') GROUP BY 1 ORDER BY 1""".stripMargin)
      .as[(String, Long, Double)].collect().toSeq
    val l = spark.read.format("graft-records").option("path", lt)
      .option("fieldTypes", ltypes).load()
    val r = spark.read.format("graft-records").option("path", rt)
      .option("fieldTypes", rtypes).load()
    val want = l.join(r, "K").groupBy("Seg")
      .agg(count(lit(1)).as("n"), sum($"X").as("sx"))
      .orderBy("Seg").as[(String, Long, Double)].collect().toSeq
    assert(got == want)

    // refresh/read of an undefined path refuse loudly
    val miss = intercept[Exception](spark.sql(
      s"SELECT * FROM refresh_lake_view('$base/nope')"))
    assert(miss.getMessage.contains("create_lake_view first"))
    // a bare Scala-API view dir (state but no _view.json) is not a
    // DEFINED view — lake_view refuses rather than guessing fold rules
    val scalaOnly = s"$base/scala_only"
    LakeView.refreshAggregate(spark, lt, ltypes, scalaOnly,
      Seq("K"), Seq("X"))
    val bare = intercept[Exception](spark.sql(
      s"SELECT * FROM lake_view('$scalaOnly')"))
    assert(bare.getMessage.contains("create_lake_view first"))
  }

  test("3-way join view through SQL: 'join3' persists three tables' " +
      "fold rules; the refresh row reports all three windows") {
    val base = Files.createTempDirectory("graft_vsql3").toString
    val t0 = s"$base/f"; val t1 = s"$base/d1"; val t2 = s"$base/d2"
    val view = s"$base/v"
    spark.range(0, 30).select(
        concat(lit("o"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        $"id".cast("double").as("OKey"),
        ($"id" % 6).cast("double").as("CKey"),
        ($"id" * 10).cast("double").as("Price"))
      .coalesce(1)
      .write.format("graft-records").option("path", t0).mode("append").save()
    spark.range(0, 6).select(
        concat(lit("c"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("CKey"),
        ($"id" % 3).cast("double").as("NKey"))
      .coalesce(1)
      .write.format("graft-records").option("path", t1).mode("append").save()
    spark.range(0, 3).select(
        concat(lit("n"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("NKey"),
        concat(lit("nat"), $"id".cast("string")).as("NName"))
      .coalesce(1)
      .write.format("graft-records").option("path", t2).mode("append").save()
    Seq(t0, t1, t2).foreach(graft.operators.LakeSnapshots.commit(spark, _))
    spark.sql(
      s"""SELECT * FROM create_lake_view('$view', 'join3',
         |  '$t0', 'OKey:number,CKey:number,Price:number', 'CKey,OKey,Price',
         |  '$t1', 'CKey:number,NKey:number', 'CKey,NKey',
         |  '$t2', 'NKey:number,NName:singleLineText', 'NKey,NName',
         |  'CKey', 'NKey')""".stripMargin).collect()
    def refresh() =
      spark.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
    val r1 = refresh()
    assert(r1.getString(0) == "join3")
    assert(r1.getLong(1) == 0L && r1.getLong(2) == 1L) // t0 window
    assert(r1.getLong(3) == 0L && r1.getLong(4) == 1L) // t1 window
    assert(r1.getLong(6) == 0L && r1.getLong(7) == 1L) // t2 window
    assert(r1.getLong(5) == 30L) // every fact row joins once
    // middle-table delete retracts through BOTH joins via SQL refresh
    graft.operators.DeletionVectors.delete(spark, t1,
      "CKey:number,NKey:number", $"CKey" === 2.0)
    graft.operators.LakeSnapshots.commit(spark, t1)
    assert(refresh().getLong(5) > 0L)
    assert(refresh().getLong(5) == 0L) // idle
    val got = spark.sql(
      s"""SELECT NName, CAST(sum(m) AS BIGINT) AS n, sum(m * Price) AS p
         |FROM lake_view('$view') GROUP BY 1 ORDER BY 1""".stripMargin)
      .as[(String, Long, Double)].collect().toSeq
    def tbl(p: String, t: String) = spark.read.format("graft-records")
      .option("path", p).option("fieldTypes", t).load()
    val want = tbl(t0, "OKey:number,CKey:number,Price:number")
      .join(tbl(t1, "CKey:number,NKey:number"), "CKey")
      .join(tbl(t2, "NKey:number,NName:singleLineText"), "NKey")
      .groupBy("NName")
      .agg(count(lit(1)).as("n"), sum($"Price").as("p"))
      .orderBy("NName").as[(String, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("view_changes: the generation feed in FROM position — signed " +
      "rows equal to the Scala feed, toGen defaults to the head, " +
      "bootstrap window 0 = the whole state as inserts, undefined " +
      "paths refuse") {
    val base = Files.createTempDirectory("graft_vsqlfeed").toString
    val dir = s"$base/t"
    val view = s"$base/v"
    append(dir, 0, 30)
    LakeSnapshots.commit(spark, dir)
    spark.sql(
      s"""SELECT * FROM create_lake_view('$view', 'aggregate',
         |  '$dir', '$types', 'Grp', 'Score')""".stripMargin).collect()
    def refresh() =
      spark.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()
    refresh() // generation 1
    // partial per-group deletes: every group keeps rows, so the feed
    // carries a −1 (old state row) AND a +1 (its rewrite) per group
    DeletionVectors.delete(spark, dir, types,
      pmod($"Score", lit(5.0)) === 1.0)
    LakeSnapshots.commit(spark, dir)
    refresh() // generation 2
    def rows(sql: String): Set[Seq[Any]] =
      spark.sql(sql).collect()
        .map(_.toSeq.toIndexedSeq: Seq[Any]).toSet
    val feed = rows(s"SELECT Grp, n, sum_Score, m " +
      s"FROM view_changes('$view', 1, 2)")
    assert(feed.nonEmpty && feed.exists(_.last == -1L) &&
      feed.exists(_.last == 1L),
      s"a rewrite wave must emit signed rows both ways: $feed")
    // ≡ the Scala surface
    val scalaFeed = graft.operators.LakeChangelog
      .viewChanges(spark, view, 1L, 2L)
      .select($"Grp", $"n", $"sum_Score", $"m").collect()
      .map(_.toSeq.toIndexedSeq: Seq[Any]).toSet
    assert(feed == scalaFeed)
    // toGen defaults to the newest generation
    assert(rows(s"SELECT Grp, n, sum_Score, m " +
      s"FROM view_changes('$view', 1)") == feed)
    // bootstrap window: the whole current state as +1 rows
    val boot = rows(s"SELECT Grp, n, sum_Score, m " +
      s"FROM view_changes('$view', 0, 2)")
    val state = rows(s"SELECT Grp, n, sum_Score, CAST(1 AS BIGINT) " +
      s"FROM lake_view('$view')")
    assert(boot == state)
    // EXPLAIN of the read-only TVF plans without touching anything
    assert(spark.sql(s"EXPLAIN SELECT * FROM view_changes('$view', 1, 2)")
      .collect().nonEmpty)
    // an undefined path refuses at analysis, like a missing table
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM view_changes('$base/nowhere', 0)"))
    assert(e.getMessage.contains("no lake view defined"), e.getMessage)
    // an expired generation refuses with the retention contract
    refresh() // idle: no flip
    DeletionVectors.delete(spark, dir, types,
      pmod($"Score", lit(7.0)) === 2.0)
    LakeSnapshots.commit(spark, dir)
    refresh() // generation 3 reclaims 1
    val e2 = intercept[IllegalStateException](spark.sql(
      s"SELECT * FROM view_changes('$view', 1, 2)"))
    assert(e2.getMessage.contains("not live"), e2.getMessage)
  }

  test("drop_lake_view removes definition + state, is idempotent, and " +
      "refuses foreign directories") {
    val base = Files.createTempDirectory("graft_vsql").toString
    val dir = s"$base/t"; val view = s"$base/v"
    append(dir, 0, 10)
    LakeSnapshots.commit(spark, dir)
    spark.sql(
      s"""SELECT * FROM create_lake_view('$view', 'aggregate',
         |  '$dir', '$types', 'Grp', '', '')""".stripMargin).collect()
    spark.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()
    assert(spark.sql(s"SELECT * FROM drop_lake_view('$view')")
      .collect()(0).getBoolean(0))
    // gone: reads refuse, a re-create starts fresh, re-drop is a no-op
    intercept[Exception](spark.sql(s"SELECT * FROM lake_view('$view')"))
    assert(!spark.sql(s"SELECT * FROM drop_lake_view('$view')")
      .collect()(0).getBoolean(0))
    // a directory this surface did not create is refused
    val foreign = s"$base/foreign"
    new java.io.File(foreign).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(foreign, "data.txt"), "not a view")
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM drop_lake_view('$foreign')"))
    assert(e.getMessage.contains("no view definition"))
    assert(new java.io.File(foreign, "data.txt").exists())
  }

  test("EXPLAIN of side-effecting TVFs is INERT: no layout change, no " +
      "watermark advance, no definition write — while plain execution " +
      "still runs the work exactly once") {
    val base = Files.createTempDirectory("graft_vsql_ex").toString
    val dir = s"$base/t"; val view = s"$base/v"; val fresh = s"$base/w"
    append(dir, 0, 10)
    append(dir, 10, 20)
    append(dir, 20, 30)
    LakeSnapshots.commit(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Int = fs.listStatus(
      new org.apache.hadoop.fs.Path(dir)).count(st =>
        st.isFile && st.getPath.getName.endsWith(".jsonl"))
    assert(dataFiles() == 3)
    // EXPLAIN a compaction: the plan prints, the layout stands still
    val plan = spark.sql(
      s"EXPLAIN SELECT * FROM optimize_lake('$dir')")
      .collect()(0).getString(0)
    assert(plan.contains("LakeCommand(optimize_lake)"),
      s"the command node must be visible in the plan: $plan")
    assert(dataFiles() == 3, "EXPLAIN must not compact")
    // EXPLAIN a refresh: the view's watermark stands still
    spark.sql(
      s"""SELECT * FROM create_lake_view('$view', 'aggregate',
         |  '$dir', '$types', 'Grp', 'Score')""".stripMargin).collect()
    spark.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()
    val gen = LakeView.currentGeneration(spark, view)
    append(dir, 30, 40)
    LakeSnapshots.commit(spark, dir)
    spark.sql(s"EXPLAIN SELECT * FROM refresh_lake_view('$view')")
      .collect()
    assert(LakeView.currentGeneration(spark, view) == gen,
      "EXPLAIN must not advance the view")
    // EXPLAIN a create: no definition lands
    spark.sql(
      s"""EXPLAIN SELECT * FROM create_lake_view('$fresh', 'aggregate',
         |  '$dir', '$types', 'Grp', 'Score')""".stripMargin).collect()
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$fresh/_view.json")),
      "EXPLAIN must not write a definition")
    // and plain execution still does the work, exactly once per call
    val r = spark.sql(s"SELECT * FROM refresh_lake_view('$view')")
      .collect()(0)
    assert(r.getLong(5) > 0L, "the real refresh must fold the append")
    assert(LakeView.currentGeneration(spark, view) == gen + 1)
    // compaction refuses files live manifests pin — expire them first
    // (the expire TVF is itself one of the commands under test)
    spark.sql(s"SELECT * FROM expire_lake_snapshots('$dir', 0)").collect()
    assert(spark.sql(s"SELECT * FROM optimize_lake('$dir')")
      .collect()(0).getInt(0) == 1)
    assert(dataFiles() == 1, "the real call must compact")
  }

  test("argument shape errors are loud: non-literal args, bad kind, " +
      "wrong arity") {
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM lake_view(1)"))
    assert(e1.getMessage.contains("string literal"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM create_lake_view('/x', 'snapshot', '/t', 'A:number', " +
        "'A', '')"))
    assert(e2.getMessage.contains("'join_aggregate'"))
    val e3 = intercept[Exception](spark.sql(
      "SELECT * FROM create_lake_view('/x', 'aggregate', '/t')"))
    assert(e3.getMessage.contains("aggregate"))
  }
}
