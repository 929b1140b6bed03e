package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors, LakeSnapshots, LakeView}

/** Incrementally-maintained materialized views: watermarked refreshes
  * consume only snapshot deltas, no-op when idle, survive the
  * crash-before-pointer-flip window, keep NULL-keyed groups merged,
  * extend to min/max (touched-group recompute) and two-table joins
  * (bilinear delta rule), and always equal a full recompute. Readers
  * racing refreshes never see a torn pointer or a missing file. */
class LakeViewSpec extends SparkSpec {
  import spark.implicits._

  private def append(dir: String, from: Long, until: Long): Unit =
    spark.range(from, until).select(
        concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        concat(lit("g"), ($"id" % 3).cast("string")).as("Grp"),
        $"id".cast("double").as("Score"))
      .coalesce(1)
      .write.format("graft-records").option("path", dir).mode("append").save()

  private val types = "Grp:singleLineText,Score:number"

  private def full(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", types).load()
    .groupBy("Grp").agg(count(lit(1)).as("n"), sum($"Score").as("sum_Score"))

  private def viewRows(view: String) = LakeView.read(spark, view)
    .select("Grp", "n", "sum_Score")
    .orderBy("Grp").as[(String, Long, Double)].collect().toSeq

  private def fullRows(dir: String) = full(dir)
    .orderBy("Grp").as[(String, Long, Double)].collect().toSeq

  test("refresh chain: bootstrap, delta-only advances, idle no-op — " +
      "always equal to the full recompute") {
    val dir = Files.createTempDirectory("graft_view").toString + "/t"
    val view = Files.createTempDirectory("graft_view").toString + "/v"
    append(dir, 0, 30)
    LakeSnapshots.commit(spark, dir)
    val r1 = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score"))
    assert(r1 == LakeView.Refresh(0L, 1L, 3L))
    assert(viewRows(view) == fullRows(dir))
    // idle: no new snapshot -> no-op
    assert(LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score")) == LakeView.Refresh(1L, 1L, 0L))
    // delete + append, two snapshots, one refresh consumes both deltas
    DeletionVectors.delete(spark, dir, types,
      pmod($"Score", lit(5.0)) === 0.0)
    LakeSnapshots.commit(spark, dir)
    append(dir, 30, 40)
    LakeSnapshots.commit(spark, dir)
    val r2 = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score"))
    assert(r2.fromVersion == 1L && r2.toVersion == 3L)
    assert(viewRows(view) == fullRows(dir))
  }

  test("a crash before the pointer flip re-derives the same state " +
      "(refresh is idempotent on its delta window)") {
    val dir = Files.createTempDirectory("graft_view2").toString + "/t"
    val view = Files.createTempDirectory("graft_view2").toString + "/v"
    append(dir, 0, 10)
    LakeSnapshots.commit(spark, dir)
    LakeView.refreshAggregate(spark, dir, types, view, Seq("Grp"), Seq("Score"))
    append(dir, 10, 20)
    LakeSnapshots.commit(spark, dir)
    // simulate the crash: the NEW generation's state directory lands
    // but the pointer never flips (write a bogus orphan where the next
    // refresh will put its state — it must be overwritten, not trusted)
    val fs = new Path(view).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$view/data-g2"))
    val out = fs.create(new Path(s"$view/data-g2/garbage"), true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    val r = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score"))
    assert(r.fromVersion == 1L && r.toVersion == 2L)
    assert(viewRows(view) == fullRows(dir))
    // retention: current + previous generation survive, nothing older
    val dirs = fs.listStatus(new Path(view)).filter(_.isDirectory)
      .map(_.getPath.getName).toSeq.sorted
    assert(dirs == Seq("data-g1", "data-g2"), dirs.toString)
    // a third refresh reclaims generation 1
    append(dir, 20, 25)
    LakeSnapshots.commit(spark, dir)
    LakeView.refreshAggregate(spark, dir, types, view, Seq("Grp"), Seq("Score"))
    val dirs2 = fs.listStatus(new Path(view)).filter(_.isDirectory)
      .map(_.getPath.getName).toSeq.sorted
    assert(dirs2 == Seq("data-g2", "data-g3"), dirs2.toString)
  }

  test("reading an unrefreshed view fails loudly; snapshotless tables " +
      "refuse to watermark") {
    val view = Files.createTempDirectory("graft_view3").toString + "/v"
    val e = intercept[IllegalStateException] { LakeView.read(spark, view) }
    assert(e.getMessage.contains("refreshAggregate"), e.getMessage)
    val dir = Files.createTempDirectory("graft_view3").toString + "/t"
    append(dir, 0, 5)
    val e2 = intercept[IllegalStateException] {
      LakeView.refreshAggregate(spark, dir, types, view, Seq("Grp"), Seq("Score"))
    }
    assert(e2.getMessage.contains("no snapshots"), e2.getMessage)
  }

  test("NULL-keyed groups merge across refreshes (null-safe key join)") {
    val dir = Files.createTempDirectory("graft_view4").toString + "/t"
    val view = Files.createTempDirectory("graft_view4").toString + "/v"
    def appendNulls(from: Long, until: Long): Unit =
      spark.range(from, until).select(
          concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
          when($"id" % 2 === 0, concat(lit("g"), ($"id" % 3).cast("string")))
            .as("Grp"), // odd ids -> NULL group key
          $"id".cast("double").as("Score"))
        .coalesce(1)
        .write.format("graft-records").option("path", dir).mode("append").save()
    appendNulls(0, 20)
    LakeSnapshots.commit(spark, dir)
    LakeView.refreshAggregate(spark, dir, types, view, Seq("Grp"), Seq("Score"))
    appendNulls(20, 40)
    LakeSnapshots.commit(spark, dir)
    LakeView.refreshAggregate(spark, dir, types, view, Seq("Grp"), Seq("Score"))
    val got = LakeView.read(spark, view)
    // exactly ONE row for the NULL group, with the merged totals
    val nulls = got.filter($"Grp".isNull)
      .as[(String, Long, Double)].collect().toSeq
    assert(nulls.length == 1, s"NULL group split: $nulls")
    assert(nulls.head._2 == 20L, nulls.toString) // 20 odd ids in 0..40
    val expect = spark.read.format("graft-records")
      .option("path", dir).option("fieldTypes", types).load()
      .groupBy("Grp").agg(count(lit(1)).as("n"), sum($"Score").as("s"))
      .orderBy("Grp").as[(String, Long, Double)].collect().toSeq
    assert(got.orderBy("Grp").as[(String, Long, Double)].collect().toSeq
      == expect)
  }

  test("min/max view: touched-group recompute tracks deletes that " +
      "remove the extremum; untouched groups keep theirs") {
    val dir = Files.createTempDirectory("graft_view5").toString + "/t"
    val view = Files.createTempDirectory("graft_view5").toString + "/v"
    append(dir, 0, 30) // groups g0,g1,g2; max of g0 = 27, min = 0
    LakeSnapshots.commit(spark, dir)
    LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score"), minMaxCols = Seq("Score"))
    def expectRows = spark.read.format("graft-records")
      .option("path", dir).option("fieldTypes", types).load()
      .groupBy("Grp").agg(count(lit(1)).as("n"), sum($"Score").as("s"),
        min($"Score").as("mn"), max($"Score").as("mx"))
      .orderBy("Grp").as[(String, Long, Double, Double, Double)]
      .collect().toSeq
    def gotRows = LakeView.read(spark, view)
      .select($"Grp", $"n", $"sum_Score", $"mn_Score", $"mx_Score")
      .orderBy("Grp").as[(String, Long, Double, Double, Double)]
      .collect().toSeq
    assert(gotRows == expectRows)
    // delete g0's current maximum (27) and minimum (0): only g0 is
    // touched; its extrema must be RECOMPUTED, not kept
    DeletionVectors.delete(spark, dir, types,
      $"Score" === 27.0 || $"Score" === 0.0)
    LakeSnapshots.commit(spark, dir)
    val r = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score"), minMaxCols = Seq("Score"))
    assert(r.groupsChanged == 1L, r.toString)
    assert(gotRows == expectRows)
    // append a new global max to g1 only
    append(dir, 100, 101) // id 100 -> g1
    LakeSnapshots.commit(spark, dir)
    LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score"), minMaxCols = Seq("Score"))
    assert(gotRows == expectRows)
  }

  test("filtered view (rowFilter): deltas fold through the predicate, " +
      "excluded-row deletes no-op, extrema rescan honors the filter") {
    val dir = Files.createTempDirectory("graft_view").toString + "/t"
    val view = Files.createTempDirectory("graft_view").toString + "/v"
    append(dir, 0, 30) // Score 0..29, filter keeps 10..29
    LakeSnapshots.commit(spark, dir)
    def refresh() = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("Grp"), Seq("Score"), minMaxCols = Seq("Score"),
      rowFilter = Some("Score >= 10.0"))
    def want() = spark.read.format("graft-records")
      .option("path", dir).option("fieldTypes", types).load()
      .where($"Score" >= 10.0)
      .groupBy("Grp").agg(count(lit(1)).as("n"), sum($"Score"),
        min($"Score"), max($"Score"))
      .orderBy("Grp").as[(String, Long, Double, Double, Double)]
      .collect().toSeq
    def got() = LakeView.read(spark, view)
      .select("Grp", "n", "sum_Score", "mn_Score", "mx_Score")
      .orderBy("Grp").as[(String, Long, Double, Double, Double)]
      .collect().toSeq
    assert(refresh().groupsChanged == 3L)
    assert(got() == want())
    // delete ONLY excluded rows: zero groups fold, watermark advances
    DeletionVectors.delete(spark, dir, types, $"Score" < 10.0)
    LakeSnapshots.commit(spark, dir)
    val r2 = refresh()
    assert(r2.groupsChanged == 0L && r2.toVersion == 2L)
    assert(got() == want())
    // delete in-filter maxima: the touched-group rescan must apply the
    // filter, or sub-10 rows would resurface as minima
    DeletionVectors.delete(spark, dir, types, $"Score" >= 27.0)
    LakeSnapshots.commit(spark, dir)
    assert(refresh().groupsChanged > 0L)
    assert(got() == want())
    assert(got().forall { case (_, _, _, mn, _) => mn >= 10.0 })
  }

  test("join view: three refreshes over appends and deletes on both " +
      "sides equal the full join recompute") {
    val base = Files.createTempDirectory("graft_view6").toString
    val lt = base + "/l"; val rt = base + "/r"; val view = base + "/v"
    val ltypes = "K:number,Price:number"
    val rtypes = "K:number,Seg:singleLineText"
    def appendL(from: Long, until: Long): Unit =
      spark.range(from, until).select(
          concat(lit("o"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
          ($"id" % 7).cast("double").as("K"),
          ($"id" * 10).cast("double").as("Price"))
        .coalesce(1)
        .write.format("graft-records").option("path", lt).mode("append").save()
    def appendR(from: Long, until: Long): Unit =
      spark.range(from, until).select(
          concat(lit("c"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
          $"id".cast("double").as("K"),
          concat(lit("s"), ($"id" % 2).cast("string")).as("Seg"))
        .coalesce(1)
        .write.format("graft-records").option("path", rt).mode("append").save()
    def refresh() = LakeView.refreshJoin(spark, view,
      lt, ltypes, Seq("K", "Price"), rt, rtypes, Seq("K", "Seg"), Seq("K"))
    def expectRows = {
      val l = spark.read.format("graft-records")
        .option("path", lt).option("fieldTypes", ltypes).load()
        .select("K", "Price")
      val r = spark.read.format("graft-records")
        .option("path", rt).option("fieldTypes", rtypes).load()
        .select("K", "Seg")
      l.join(r, "K").groupBy("Seg")
        .agg(count(lit(1)).as("n"), sum($"Price").as("p"))
        .orderBy("Seg").as[(String, Long, Double)].collect().toSeq
    }
    def gotRows = LakeView.read(spark, view).groupBy("Seg")
      .agg(sum($"m").as("n"), sum($"m" * $"Price").as("p"))
      .orderBy("Seg").as[(String, Long, Double)].collect().toSeq

    appendL(0, 20); appendR(0, 7)
    LakeSnapshots.commit(spark, lt); LakeSnapshots.commit(spark, rt)
    val j1 = refresh()
    assert(j1.fromLeft == 0 && j1.toLeft == 1 &&
      j1.fromRight == 0 && j1.toRight == 1, j1.toString)
    assert(gotRows == expectRows)
    // left-only append (right idle)
    appendL(20, 35)
    LakeSnapshots.commit(spark, lt)
    val j2 = refresh()
    assert(j2.toLeft == 2 && j2.toRight == 1, j2.toString)
    assert(gotRows == expectRows)
    // right-side delete: retracts every joined row of the deleted keys
    DeletionVectors.delete(spark, rt, rtypes, $"K" === 3.0 || $"K" === 5.0)
    LakeSnapshots.commit(spark, rt)
    val j3 = refresh()
    assert(j3.toLeft == 2 && j3.toRight == 2, j3.toString)
    assert(gotRows == expectRows)
    // idle no-op
    assert(refresh().deltaRows == 0L)
  }

  test("join-view state is hash-bucketed: a single-key delta rewrites " +
      "ONLY its bucket; untouched buckets carry forward by reference") {
    val base = Files.createTempDirectory("graft_view8").toString
    val lt = base + "/l"; val rt = base + "/r"; val view = base + "/v"
    val ltypes = "K:number,Price:number"
    val rtypes = "K:number,Seg:singleLineText"
    spark.range(0, 200).select(
        concat(lit("o"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        ($"id" % 40).cast("double").as("K"),
        ($"id" * 10).cast("double").as("Price"))
      .coalesce(1)
      .write.format("graft-records").option("path", lt).mode("append").save()
    spark.range(0, 40).select(
        concat(lit("c"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        $"id".cast("double").as("K"),
        concat(lit("s"), ($"id" % 4).cast("string")).as("Seg"))
      .coalesce(1)
      .write.format("graft-records").option("path", rt).mode("append").save()
    LakeSnapshots.commit(spark, lt); LakeSnapshots.commit(spark, rt)
    def refresh() = LakeView.refreshJoin(spark, view,
      lt, ltypes, Seq("K", "Price"), rt, rtypes, Seq("K", "Seg"),
      Seq("K"), stateBuckets = 16)
    refresh() // bootstrap: every populated bucket written under gen 1
    val fs = new Path(view).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketDirs(gen: Long): Seq[String] = {
      val d = new Path(s"$view/data-g$gen")
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d).filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("_bucket=")).toSeq.sorted
    }
    val gen1Buckets = bucketDirs(1)
    assert(gen1Buckets.size > 4, s"bootstrap buckets: $gen1Buckets")
    // delete ONE right-side key: the delta touches exactly one bucket
    DeletionVectors.delete(spark, rt, rtypes, $"K" === 7.0)
    LakeSnapshots.commit(spark, rt)
    refresh()
    val gen2Buckets = bucketDirs(2)
    assert(gen2Buckets.size <= 1,
      s"single-key delta must rewrite at most one bucket: $gen2Buckets")
    // gen-1 buckets survive (inherited by reference, and the previous
    // pointer still pins them)
    assert(bucketDirs(1).size >= gen1Buckets.size - 1)
    // correctness: view == full recompute
    def expectRows = {
      val l = spark.read.format("graft-records")
        .option("path", lt).option("fieldTypes", ltypes).load()
        .select("K", "Price")
      val r = spark.read.format("graft-records")
        .option("path", rt).option("fieldTypes", rtypes).load()
        .select("K", "Seg")
      l.join(r, "K").groupBy("Seg")
        .agg(count(lit(1)).as("n"), sum($"Price").as("p"))
        .orderBy("Seg").as[(String, Long, Double)].collect().toSeq
    }
    def gotRows = LakeView.read(spark, view).groupBy("Seg")
      .agg(sum($"m").as("n"), sum($"m" * $"Price").as("p"))
      .orderBy("Seg").as[(String, Long, Double)].collect().toSeq
    assert(gotRows == expectRows)
    // two more single-key refreshes: retention (keep 2 generations of
    // POINTERS) must never reclaim an inherited gen-1 bucket a live
    // pointer still references
    DeletionVectors.delete(spark, rt, rtypes, $"K" === 11.0)
    LakeSnapshots.commit(spark, rt)
    refresh()
    DeletionVectors.delete(spark, rt, rtypes, $"K" === 23.0)
    LakeSnapshots.commit(spark, rt)
    refresh()
    assert(bucketDirs(1).nonEmpty,
      "inherited gen-1 buckets must survive by-reference retention")
    assert(gotRows == expectRows)
  }

  test("join-view modulus is recorded in the pointer: a refresh under a " +
      "DIFFERENT stateBuckets migrates instead of mixing hash spaces") {
    val base = Files.createTempDirectory("graft_view9").toString
    val lt = base + "/l"; val rt = base + "/r"; val view = base + "/v"
    val ltypes = "K:number,Price:number"
    val rtypes = "K:number,Seg:singleLineText"
    spark.range(0, 200).select(
        concat(lit("o"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        ($"id" % 40).cast("double").as("K"),
        ($"id" * 10).cast("double").as("Price"))
      .coalesce(1)
      .write.format("graft-records").option("path", lt).mode("append").save()
    spark.range(0, 40).select(
        concat(lit("c"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        $"id".cast("double").as("K"),
        concat(lit("s"), ($"id" % 4).cast("string")).as("Seg"))
      .coalesce(1)
      .write.format("graft-records").option("path", rt).mode("append").save()
    LakeSnapshots.commit(spark, lt); LakeSnapshots.commit(spark, rt)
    def refresh(buckets: Int) = LakeView.refreshJoin(spark, view,
      lt, ltypes, Seq("K", "Price"), rt, rtypes, Seq("K", "Seg"),
      Seq("K"), stateBuckets = buckets)
    refresh(16) // bootstrap under modulus 16
    // delete one key, then refresh under modulus 4: K=7's old +1 rows
    // hash under 16, its -1 delta under 4 — without migration they land
    // in different buckets and never net (duplicate un-cancelled rows)
    DeletionVectors.delete(spark, rt, rtypes, $"K" === 7.0)
    LakeSnapshots.commit(spark, rt)
    refresh(4)
    def expectRows = {
      val l = spark.read.format("graft-records")
        .option("path", lt).option("fieldTypes", ltypes).load()
        .select("K", "Price")
      val r = spark.read.format("graft-records")
        .option("path", rt).option("fieldTypes", rtypes).load()
        .select("K", "Seg")
      l.join(r, "K").groupBy("Seg")
        .agg(count(lit(1)).as("n"), sum($"Price").as("p"))
        .orderBy("Seg").as[(String, Long, Double)].collect().toSeq
    }
    def gotRows = LakeView.read(spark, view).groupBy("Seg")
      .agg(sum($"m").as("n"), sum($"m" * $"Price").as("p"))
      .orderBy("Seg").as[(String, Long, Double)].collect().toSeq
    assert(gotRows == expectRows)
    // the migrated state hashes under the NEW modulus: no bucket id >= 4
    val fs = new Path(view).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val g2 = fs.listStatus(new Path(s"$view/data-g2")).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("_bucket="))
      .map(_.stripPrefix("_bucket=").toInt).toSeq
    assert(g2.nonEmpty && g2.forall(b => b >= 0 && b < 4), g2.toString)
    // and a further single-key delta under the SAME modulus is again
    // incremental: at most one bucket rewritten
    DeletionVectors.delete(spark, rt, rtypes, $"K" === 11.0)
    LakeSnapshots.commit(spark, rt)
    refresh(4)
    val g3 = fs.listStatus(new Path(s"$view/data-g3")).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("_bucket=")).toSeq
    assert(g3.size <= 1, g3.toString)
    assert(gotRows == expectRows)
  }

  test("adaptive stateBuckets: a small view bootstraps to ONE bucket, " +
      "keeps it across refreshes, and stays correct") {
    val base = Files.createTempDirectory("graft_view10").toString
    val lt = base + "/l"; val rt = base + "/r"; val view = base + "/v"
    val ltypes = "K:number,Price:number"
    val rtypes = "K:number,Seg:singleLineText"
    spark.range(0, 50).select(
        concat(lit("o"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        ($"id" % 10).cast("double").as("K"),
        ($"id" * 10).cast("double").as("Price"))
      .coalesce(1)
      .write.format("graft-records").option("path", lt).mode("append").save()
    spark.range(0, 10).select(
        concat(lit("c"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        $"id".cast("double").as("K"),
        concat(lit("s"), ($"id" % 2).cast("string")).as("Seg"))
      .coalesce(1)
      .write.format("graft-records").option("path", rt).mode("append").save()
    LakeSnapshots.commit(spark, lt); LakeSnapshots.commit(spark, rt)
    def refresh() = LakeView.refreshJoin(spark, view,
      lt, ltypes, Seq("K", "Price"), rt, rtypes, Seq("K", "Seg"), Seq("K"))
    refresh()
    val fs = new Path(view).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def buckets(gen: Long) =
      fs.listStatus(new Path(s"$view/data-g$gen")).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("_bucket=")).toSeq
    assert(buckets(1).size == 1, s"small bootstrap: ${buckets(1)}")
    DeletionVectors.delete(spark, rt, rtypes, $"K" === 3.0)
    LakeSnapshots.commit(spark, rt)
    refresh() // recorded modulus honored: still one bucket, no migration churn
    assert(buckets(2).size == 1, s"steady small state: ${buckets(2)}")
    def expectRows = {
      val l = spark.read.format("graft-records")
        .option("path", lt).option("fieldTypes", ltypes).load()
        .select("K", "Price")
      val r = spark.read.format("graft-records")
        .option("path", rt).option("fieldTypes", rtypes).load()
        .select("K", "Seg")
      l.join(r, "K").groupBy("Seg")
        .agg(count(lit(1)).as("n"), sum($"Price").as("p"))
        .orderBy("Seg").as[(String, Long, Double)].collect().toSeq
    }
    val gotRows = LakeView.read(spark, view).groupBy("Seg")
      .agg(sum($"m").as("n"), sum($"m" * $"Price").as("p"))
      .orderBy("Seg").as[(String, Long, Double)].collect().toSeq
    assert(gotRows == expectRows)
    assert(refresh().deltaRows == 0L)
  }

  test("aggregate-view state is hash-bucketed: a single-group delta " +
      "rewrites ONLY its bucket; untouched buckets carry forward by " +
      "reference; a zero-fold refresh rewrites nothing") {
    val base = Files.createTempDirectory("graft_view11").toString
    val dir = base + "/t"; val view = base + "/v"
    // 40 distinct groups so a 16-bucket modulus populates many buckets
    spark.range(0, 200).select(
        concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        concat(lit("g"), lpad(($"id" % 40).cast("string"), 2, "0")).as("Grp"),
        $"id".cast("double").as("Score"))
      .coalesce(1)
      .write.format("graft-records").option("path", dir).mode("append").save()
    LakeSnapshots.commit(spark, dir)
    def refresh(filter: Option[String] = None) =
      LakeView.refreshAggregate(spark, dir, types, view,
        Seq("Grp"), Seq("Score"), rowFilter = filter, stateBuckets = 16)
    refresh()
    val fs = new Path(view).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketDirs(gen: Long): Seq[String] = {
      val d = new Path(s"$view/data-g$gen")
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d).filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("_bucket=")).toSeq.sorted
    }
    val gen1 = bucketDirs(1)
    assert(gen1.size > 4, s"bootstrap buckets: $gen1")
    // delete ONE group's rows: the delta touches exactly one bucket
    DeletionVectors.delete(spark, dir, types, $"Grp" === "g07")
    LakeSnapshots.commit(spark, dir)
    val r2 = refresh()
    assert(r2.groupsChanged == 1L, r2.toString)
    assert(bucketDirs(2).size <= 1,
      s"single-group delta must rewrite at most one bucket: ${bucketDirs(2)}")
    assert(bucketDirs(1).size >= gen1.size - 1,
      "untouched gen-1 buckets must survive by reference")
    assert(viewRows(view) == fullRows(dir))
    // a refresh whose delta folds ZERO groups (every changed row
    // excluded by the view filter) advances the watermark on fully
    // inherited state — no data directory written at all.
    // (fresh view: fold rules incl. the filter are fixed at creation)
    val fview = base + "/vf"
    LakeView.refreshAggregate(spark, dir, types, fview,
      Seq("Grp"), Seq("Score"), rowFilter = Some("Score >= 100.0"),
      stateBuckets = 16)
    DeletionVectors.delete(spark, dir, types,
      $"Score" < 50.0 && $"Grp" =!= "g07")
    LakeSnapshots.commit(spark, dir)
    val r3 = LakeView.refreshAggregate(spark, dir, types, fview,
      Seq("Grp"), Seq("Score"), rowFilter = Some("Score >= 100.0"),
      stateBuckets = 16)
    assert(r3.groupsChanged == 0L && r3.toVersion == 3L, r3.toString)
    val ffs = new Path(fview).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dataDirs = ffs.listStatus(new Path(fview)).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("data-g")).toSeq.sorted
    assert(dataDirs == Seq("data-g1"),
      s"zero-fold refresh must not write a state dir: $dataDirs")
    // and the inherited state still equals the filtered recompute
    val want = spark.read.format("graft-records")
      .option("path", dir).option("fieldTypes", types).load()
      .filter($"Score" >= 100.0)
      .groupBy("Grp").agg(count(lit(1)).as("n"), sum($"Score").as("s"))
      .orderBy("Grp").as[(String, Long, Double)].collect().toSeq
    val got = LakeView.read(spark, fview).select("Grp", "n", "sum_Score")
      .orderBy("Grp").as[(String, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("adaptive modulus DOUBLES when per-bucket state outgrows the " +
      "growth bound: one migration, then bounded touched-bucket " +
      "rewrites; the grown modulus never shrinks") {
    val base = Files.createTempDirectory("graft_view14").toString
    val dir = base + "/t"; val view = base + "/v"
    val keyedTypes = "K:number,Score:number"
    // 200k distinct groups: the bootstrap delta crosses AutoBucketRows,
    // so the adaptive view starts at DefaultBuckets
    spark.range(0, 200000).select(
        concat(lit("r"), lpad($"id".cast("string"), 7, "0")).as("_record_id"),
        $"id".cast("double").as("K"),
        ($"id" % 97).cast("double").as("Score"))
      .coalesce(4)
      .write.format("graft-records").option("path", dir)
      .option("dataFormat", "parquet").mode("append").save()
    LakeSnapshots.commit(spark, dir)
    def refresh() = LakeView.refreshAggregate(spark, dir, keyedTypes, view,
      Seq("K"), Seq("Score"))
    refresh()
    val fs = new Path(view).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketDirs(gen: Long): Int = {
      val d = new Path(s"$view/data-g$gen")
      if (!fs.exists(d)) 0
      else fs.listStatus(d).filter(_.isDirectory)
        .count(_.getPath.getName.startsWith("_bucket="))
    }
    assert(bucketDirs(1) == LakeView.DefaultBuckets,
      s"200k-group bootstrap must open at DefaultBuckets: ${bucketDirs(1)}")
    // shrink the growth bound: the next refresh must migrate to a
    // DOUBLED modulus (per-bucket bytes exceed the bound at 32)
    val key = "spark.graft.view.targetBucketBytes"
    spark.conf.set(key, "16384")
    try {
      DeletionVectors.delete(spark, dir, keyedTypes, $"K" === 7.0)
      LakeSnapshots.commit(spark, dir)
      refresh()
    } finally spark.conf.unset(key)
    val grown = bucketDirs(2)
    assert(grown > LakeView.DefaultBuckets,
      s"growth must double past DefaultBuckets, got $grown")
    // back under the DEFAULT bound the grown modulus STICKS (never
    // shrinks), and a single-key delta touches at most one bucket
    DeletionVectors.delete(spark, dir, keyedTypes, $"K" === 11.0)
    LakeSnapshots.commit(spark, dir)
    refresh()
    assert(bucketDirs(3) <= 1,
      s"single-key refresh after growth must stay bounded: ${bucketDirs(3)}")
    // correctness through migration + growth
    val want = spark.read.format("graft-records")
      .option("path", dir).option("fieldTypes", keyedTypes).load()
      .groupBy("K").agg(count(lit(1)).as("n"), sum($"Score").as("s"))
      .agg(count(lit(1)), sum($"n"), sum($"s"))
      .as[(Long, Long, Double)].collect().head
    val got = LakeView.read(spark, view)
      .agg(count(lit(1)), sum($"n"), sum($"sum_Score"))
      .as[(Long, Long, Double)].collect().head
    assert(got == want)
  }

  test("extrema-rescan broadcast is gated by changed-group count: the " +
      "shuffled fallback path produces the identical state") {
    val base = Files.createTempDirectory("graft_view12").toString
    val dir = base + "/t"
    spark.range(0, 120).select(
        concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        concat(lit("g"), lpad(($"id" % 30).cast("string"), 2, "0")).as("Grp"),
        $"id".cast("double").as("Score"))
      .coalesce(1)
      .write.format("graft-records").option("path", dir).mode("append").save()
    LakeSnapshots.commit(spark, dir)
    def run(view: String): Unit = {
      LakeView.refreshAggregate(spark, dir, types, view,
        Seq("Grp"), Seq("Score"), minMaxCols = Seq("Score"))
      ()
    }
    val limitKey = "spark.graft.view.broadcastKeyLimit"
    // bootstrap + a delete-the-maximum refresh under limit 0 (every
    // semi join takes the shuffled path — the bootstrap's touched set
    // is EVERY group, the shape the gate exists for)
    spark.conf.set(limitKey, "0")
    try run(base + "/v_shuffled")
    finally spark.conf.unset(limitKey)
    run(base + "/v_broadcast") // default: hinted broadcast path
    DeletionVectors.delete(spark, dir, types, $"Score" >= 110.0)
    LakeSnapshots.commit(spark, dir)
    spark.conf.set(limitKey, "0")
    try run(base + "/v_shuffled")
    finally spark.conf.unset(limitKey)
    run(base + "/v_broadcast")
    def rows(view: String) = LakeView.read(spark, view)
      .select("Grp", "n", "sum_Score", "mn_Score", "mx_Score")
      .orderBy("Grp")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val (s, b) = (rows(base + "/v_shuffled"), rows(base + "/v_broadcast"))
    assert(s == b, s"shuffled $s != broadcast $b")
    // and both equal the recompute
    val want = spark.read.format("graft-records")
      .option("path", dir).option("fieldTypes", types).load()
      .groupBy("Grp").agg(count(lit(1)).as("n"), sum($"Score"),
        min($"Score"), max($"Score"))
      .orderBy("Grp")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(s == want)
  }

  test("composed view (aggregate over join): chained folds across " +
      "appends and deletes equal the recompute; a lagging aggregate " +
      "watermark heals from the tables' changelog") {
    val base = Files.createTempDirectory("graft_view13").toString
    val lt = base + "/l"; val rt = base + "/r"; val view = base + "/v"
    val ltypes = "K:number,Price:number"
    val rtypes = "K:number,Seg:singleLineText"
    def appendL(from: Long, until: Long): Unit =
      spark.range(from, until).select(
          concat(lit("o"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
          ($"id" % 7).cast("double").as("K"),
          ($"id" * 10).cast("double").as("Price"))
        .coalesce(1)
        .write.format("graft-records").option("path", lt).mode("append").save()
    spark.range(0, 7).select(
        concat(lit("c"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        $"id".cast("double").as("K"),
        concat(lit("s"), ($"id" % 2).cast("string")).as("Seg"))
      .coalesce(1)
      .write.format("graft-records").option("path", rt).mode("append").save()
    // derived-column sum (SumSpec expression) + extrema over the join
    def refresh() = LakeView.refreshJoinAggregate(spark, view,
      lt, ltypes, Seq("K", "Price"), rt, rtypes, Seq("K", "Seg"),
      keys = Seq("K"), aggKeys = Seq("Seg"),
      aggSums = Seq("Price", "half:Price * 0.5"),
      minMaxCols = Seq("Price"))
    def expectRows = {
      val l = spark.read.format("graft-records")
        .option("path", lt).option("fieldTypes", ltypes).load()
        .select("K", "Price")
      val r = spark.read.format("graft-records")
        .option("path", rt).option("fieldTypes", rtypes).load()
        .select("K", "Seg")
      l.join(r, "K").groupBy("Seg")
        .agg(count(lit(1)).as("n"), sum($"Price").as("p"),
          sum($"Price" * 0.5).as("h"), min($"Price").as("mn"),
          max($"Price").as("mx"))
        .orderBy("Seg")
        .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    }
    def gotRows = LakeView.read(spark, view)
      .select($"Seg", $"n", $"sum_Price", $"sum_half",
        $"mn_Price", $"mx_Price")
      .orderBy("Seg")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq

    appendL(0, 20)
    LakeSnapshots.commit(spark, lt); LakeSnapshots.commit(spark, rt)
    val c1 = refresh()
    assert(c1.deltaRows > 0L && c1.groupsChanged == 2L, c1.toString)
    assert(gotRows == expectRows)
    // the inner Z-relation is maintained alongside and stays readable
    assert(LakeView.read(spark, s"$view/inner").columns.contains("m"))
    // cycle 2: left append; cycle 3: right delete retracts joined rows
    appendL(20, 35)
    LakeSnapshots.commit(spark, lt)
    refresh()
    assert(gotRows == expectRows)
    DeletionVectors.delete(spark, rt, rtypes, $"K" === 3.0 || $"K" === 5.0)
    LakeSnapshots.commit(spark, rt)
    refresh()
    assert(gotRows == expectRows)
    assert(refresh().deltaRows == 0L) // idle no-op
    // crash between the two publishes: inner advanced, aggregate did
    // not (simulated by deleting the aggregate's newest pointer). The
    // next refresh must recompute the aggregate's LAGGING window from
    // the tables' changelog and converge.
    val fs = new Path(view).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aggGens = LakeView.generations(spark, view)
    fs.delete(new Path(s"$view/_ptr-${aggGens.last}.json"), false)
    appendL(35, 45)
    LakeSnapshots.commit(spark, lt)
    val c4 = refresh()
    assert(c4.groupsChanged > 0L, c4.toString)
    assert(gotRows == expectRows)
  }

  test("3-way join view: chained folds across appends and deletes on " +
      "every level equal the recompute; a lagging root heals by " +
      "Z-algebra from the tables' changelog") {
    val base = Files.createTempDirectory("graft_view15").toString
    val t0 = base + "/f"; val t1 = base + "/d1"; val t2 = base + "/d2"
    val view = base + "/v"
    val types0 = "OKey:number,CKey:number,Price:number"
    val types1 = "CKey:number,NKey:number"
    val types2 = "NKey:number,NName:singleLineText"
    def appendFact(from: Long, until: Long): Unit =
      spark.range(from, until).select(
          concat(lit("o"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
          $"id".cast("double").as("OKey"),
          ($"id" % 11).cast("double").as("CKey"),
          ($"id" * 10).cast("double").as("Price"))
        .coalesce(1)
        .write.format("graft-records").option("path", t0).mode("append").save()
    spark.range(0, 11).select(
        concat(lit("c"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
        $"id".cast("double").as("CKey"),
        ($"id" % 4).cast("double").as("NKey"))
      .coalesce(1)
      .write.format("graft-records").option("path", t1).mode("append").save()
    spark.range(0, 4).select(
        concat(lit("n"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("NKey"),
        concat(lit("nat"), $"id".cast("string")).as("NName"))
      .coalesce(1)
      .write.format("graft-records").option("path", t2).mode("append").save()
    def refresh() = LakeView.refreshJoin3(spark, view,
      t0, types0, Seq("CKey", "OKey", "Price"),
      t1, types1, Seq("CKey", "NKey"),
      t2, types2, Seq("NKey", "NName"),
      keys01 = Seq("CKey"), keys12 = Seq("NKey"))
    def expectRows = {
      def tbl(p: String, t: String) = spark.read.format("graft-records")
        .option("path", p).option("fieldTypes", t).load()
      tbl(t0, types0).join(tbl(t1, types1), "CKey")
        .join(tbl(t2, types2), "NKey")
        .groupBy("NName")
        .agg(count(lit(1)).as("n"), sum($"Price").as("p"))
        .orderBy("NName").as[(String, Long, Double)].collect().toSeq
    }
    def gotRows = LakeView.read(spark, view).groupBy("NName")
      .agg(sum($"m").as("n"), sum($"m" * $"Price").as("p"))
      .orderBy("NName").as[(String, Long, Double)].collect().toSeq

    appendFact(0, 40)
    Seq(t0, t1, t2).foreach(LakeSnapshots.commit(spark, _))
    val c1 = refresh()
    assert(c1.deltaRows > 0L && c1.innerDeltaRows > 0L, c1.toString)
    assert(gotRows == expectRows)
    // middle delete retracts through both joins
    DeletionVectors.delete(spark, t1, types1, $"CKey" === 3.0)
    LakeSnapshots.commit(spark, t1)
    refresh()
    assert(gotRows == expectRows)
    // last-table delete retracts whole NName groups
    DeletionVectors.delete(spark, t2, types2, $"NKey" === 1.0)
    LakeSnapshots.commit(spark, t2)
    refresh()
    assert(gotRows == expectRows)
    assert(refresh().deltaRows == 0L)
    // crash between the two publishes: inner advanced, root did not
    // (delete the root's newest pointer) — the next refresh must
    // recompute the root's lagging window from the tables and rebuild
    // the inner-old side by Z-algebra (current ∪ negate(Δ))
    val fs = new Path(view).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootGens = LakeView.generations(spark, view)
    fs.delete(new Path(s"$view/_ptr-${rootGens.last}.json"), false)
    appendFact(40, 55)
    LakeSnapshots.commit(spark, t0)
    val c4 = refresh()
    assert(c4.deltaRows > 0L, c4.toString)
    assert(gotRows == expectRows)
  }

  test("chaos: readers racing refreshes never observe a torn pointer " +
      "or a reclaimed state directory") {
    val dir = Files.createTempDirectory("graft_view7").toString + "/t"
    val view = Files.createTempDirectory("graft_view7").toString + "/v"
    append(dir, 0, 10)
    LakeSnapshots.commit(spark, dir)
    LakeView.refreshAggregate(spark, dir, types, view, Seq("Grp"), Seq("Score"))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val readers = (1 to 3).map { _ =>
      new Thread(() => {
        try while (!stop.get()) {
          val n = LakeView.read(spark, view).count()
          assert(n > 0 && n <= 3, s"view rows $n")
        } catch { case t: Throwable => failure.set(t); stop.set(true) }
      })
    }
    readers.foreach(_.start())
    try (1 to 6).foreach { i =>
      append(dir, 10L * i, 10L * (i + 1))
      LakeSnapshots.commit(spark, dir)
      LakeView.refreshAggregate(spark, dir, types, view,
        Seq("Grp"), Seq("Score"))
      if (failure.get() != null) throw failure.get()
    } finally { stop.set(true); readers.foreach(_.join(30000)) }
    if (failure.get() != null) throw failure.get()
    assert(viewRows(view) == fullRows(dir))
  }

  test("sequential tiny fold ≡ parallel fold: identical state and " +
      "refresh accounting with the tiny plan disabled") {
    // same data through the same mutation cycles, one view with the
    // tiny single-task plan armed (metadata-proven small windows), one
    // with it disabled (tinyFoldRows=0 -> no window is ever 'tiny') —
    // the plan shape must be invisible in every observable
    val base = Files.createTempDirectory("graft_view_tiny").toString
    val dir = base + "/t"; val vTiny = base + "/vt"; val vPar = base + "/vp"
    def cycle(i: Int): Unit = {
      append(dir, 40L * i, 40L * (i + 1))
      if (i % 2 == 1)
        DeletionVectors.delete(spark, dir, types,
          pmod($"Score", lit(7.0)) === 0.0)
      LakeSnapshots.commit(spark, dir)
    }
    // additive-only: table-sourced minMax folds take the counted path
    // at steady either way (no bounded rescan), which would leave the
    // tiny plan unexercised — the rescan-tiny shape is pinned by the
    // oracle-gated view queries instead
    def refresh(view: String) = LakeView.refreshAggregate(spark, dir,
      types, view, Seq("Grp"), Seq("Score"))
    cycle(0)
    val key = "spark.graft.view.tinyFoldRows"
    val rTiny = scala.collection.mutable.ArrayBuffer.empty[LakeView.Refresh]
    val rPar = scala.collection.mutable.ArrayBuffer.empty[LakeView.Refresh]
    rTiny += refresh(vTiny)
    spark.conf.set(key, "0")
    try rPar += refresh(vPar) finally spark.conf.unset(key)
    (1 to 3).foreach { i =>
      cycle(i)
      rTiny += refresh(vTiny)
      spark.conf.set(key, "0")
      try rPar += refresh(vPar) finally spark.conf.unset(key)
    }
    assert(rTiny.toSeq == rPar.toSeq,
      s"refresh accounting diverged: $rTiny vs $rPar")
    assert(viewRows(vTiny) == viewRows(vPar))
    assert(viewRows(vTiny).nonEmpty && viewRows(vTiny) == fullRows(dir))
  }

  test("pointer-recorded row counts make the fused-bootstrap gate " +
      "exact: a dictionary-packed source view with AutoBucketRows-scale " +
      "rows cannot spoof it (the old bytes/8 bound could)") {
    val base = Files.createTempDirectory("graft_view_rows").toString
    val dir = base + "/t"; val vA = base + "/va"; val vB = base + "/vb"
    val keyedTypes = "K:number,Score:number"
    // 200k distinct keys, low-entropy values: parquet packs this far
    // denser than 8 B/row, which is exactly how a bytes-derived row
    // bound under-counts
    spark.range(0, 200000).select(
        concat(lit("r"), lpad($"id".cast("string"), 7, "0")).as("_record_id"),
        $"id".cast("double").as("K"),
        lit(1.0).as("Score"))
      .coalesce(4)
      .write.format("graft-records").option("path", dir)
      .option("dataFormat", "parquet").mode("append").save()
    LakeSnapshots.commit(spark, dir)
    // A: pinned single bucket, 200k state rows in few bytes
    LakeView.refreshAggregate(spark, dir, keyedTypes, vA,
      Seq("K"), Seq("Score"), stateBuckets = 1)
    assert(LakeView.read(spark, vA).count() == 200000L)
    // B over A's feed: the bootstrap gate must see A's TRUE row count
    // (pointer-recorded) and refuse the fused mod-1 bootstrap — B's
    // 200k-group first delta opens at DefaultBuckets
    LakeView.refreshAggregateOverView(spark, vA, vB, Seq("K"), Seq("n"))
    val fs = new Path(vB).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val bBuckets = fs.listStatus(new Path(s"$vB/data-g1"))
      .filter(_.isDirectory)
      .count(_.getPath.getName.startsWith("_bucket="))
    assert(bBuckets == LakeView.DefaultBuckets,
      s"a 200k-row source must take the counted bucketed bootstrap, " +
        s"got $bBuckets bucket(s)")
  }
}
