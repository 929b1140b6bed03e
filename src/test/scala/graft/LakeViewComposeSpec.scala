package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors, IncrementalAgg, LakeChangelog,
  LakeSnapshots, LakeView}

/** Views as first-class change-feed SOURCES: a maintained view emits
  * the same signed Z-relation feed a table does (generation-pointer
  * diff ≡ snapshot-manifest diff), so any view form composes over any
  * other — aggregate over aggregate, join of two maintained views —
  * with per-level generation watermarks and the same loud retention
  * contract tables have. Plus the round's pointer upgrades: explicit
  * `kind` guards and per-bucket byte counts that keep the adaptive
  * growth check off the filesystem. */
class LakeViewComposeSpec extends SparkSpec {
  import spark.implicits._

  private val types = "G5:singleLineText,G2:singleLineText,Score:number"

  private def append(dir: String, from: Long, until: Long): Unit =
    spark.range(from, until).select(
        concat(lit("r"), lpad($"id".cast("string"), 4, "0")).as("_record_id"),
        concat(lit("g"), ($"id" % 5).cast("string")).as("G5"),
        concat(lit("h"), ($"id" % 2).cast("string")).as("G2"),
        $"id".cast("double").as("Score"))
      .coalesce(1)
      .write.format("graft-records").option("path", dir).mode("append").save()

  private def table(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", types).load()

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString

  /** Z-relation set equality (order- and layout-free). */
  private def zSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toSeq.toIndexedSeq: Seq[Any])
      .toSet
  }

  test("changesBetween: a view's generation feed is the exact signed " +
      "content diff — old ∪ feed consolidates to new, for aggregate " +
      "and join (Z-relation) state alike") {
    val dir = tmp("feed") + "/t"
    val view = tmp("feed") + "/v"
    append(dir, 0, 40)
    LakeSnapshots.commit(spark, dir)
    LakeView.refreshAggregate(spark, dir, types, view,
      Seq("G5"), Seq("Score"))
    val g1 = LakeView.currentGeneration(spark, view)
    // bootstrap feed = the whole state as inserts
    val boot = LakeChangelog.viewChanges(spark, view, 0L, g1)
    assert(zSet(boot) ==
      zSet(LakeView.read(spark, view).withColumn("m", lit(1L))))
    // mutate: delete wave + append, one refresh window
    DeletionVectors.delete(spark, dir, types,
      pmod($"Score", lit(3.0)) === 0.0)
    LakeSnapshots.commit(spark, dir)
    append(dir, 40, 55)
    LakeSnapshots.commit(spark, dir)
    val oldState = LakeView.read(spark, view).withColumn("m", lit(1L))
      .collect() // capture before the flip retires nothing (2 kept)
    LakeView.refreshAggregate(spark, dir, types, view,
      Seq("G5"), Seq("Score"))
    val g2 = LakeView.currentGeneration(spark, view)
    val feed = LakeChangelog.viewChanges(spark, view, g1, g2)
    val newState = LakeView.read(spark, view).withColumn("m", lit(1L))
    val replayed = IncrementalAgg.consolidate(
      spark.createDataFrame(
        spark.sparkContext.parallelize(oldState.toIndexedSeq),
        newState.schema).unionByName(feed))
    assert(zSet(replayed) == zSet(newState),
      "old ∪ feed must consolidate to exactly the new state")
    // untouched buckets never enter the feed: every feed row's group
    // actually changed between the generations
    assert(feed.count() > 0)

    // join-view feed: rows carry ± their stored multiplicity
    val dirR = tmp("feedr") + "/t"
    spark.range(0, 5).select(
        concat(lit("k"), $"id".cast("string")).as("_record_id"),
        concat(lit("g"), $"id".cast("string")).as("G5"),
        lit("x").as("Tag"))
      .coalesce(1)
      .write.format("graft-records").option("path", dirR).mode("append").save()
    LakeSnapshots.commit(spark, dirR)
    val jview = tmp("feedj") + "/v"
    def refreshJ() = LakeView.refreshJoin(spark, jview,
      dir, types, Seq("G5", "Score"),
      dirR, "G5:singleLineText,Tag:singleLineText", Seq("G5", "Tag"),
      Seq("G5"))
    refreshJ()
    val jg1 = LakeView.currentGeneration(spark, jview)
    val jOld = LakeView.read(spark, jview).collect()
    val jSchema = LakeView.read(spark, jview).schema
    DeletionVectors.delete(spark, dir, types, $"Score" >= 50.0)
    LakeSnapshots.commit(spark, dir)
    refreshJ()
    val jg2 = LakeView.currentGeneration(spark, jview)
    val jFeed = LakeChangelog.viewChanges(spark, jview, jg1, jg2)
    val jNew = LakeView.read(spark, jview)
    val jReplayed = IncrementalAgg.consolidate(
      spark.createDataFrame(
        spark.sparkContext.parallelize(jOld.toIndexedSeq), jSchema)
        .unionByName(jFeed))
    assert(zSet(jReplayed) == zSet(jNew),
      "join-view feed must replay old state to new by Z-algebra")
  }

  test("aggregate over a maintained aggregate: generation-feed folds " +
      "across cycles equal the recompute; a lagging consumer heals " +
      "across a multi-generation window; past retention it refuses") {
    spark.conf.set("spark.graft.view.keepGenerations", "4")
    try {
      val dir = tmp("aoa") + "/t"
      val a = tmp("aoa") + "/va"
      val b = tmp("aoa") + "/vb"
      def refreshA() = LakeView.refreshAggregate(spark, dir, types, a,
        Seq("G2", "G5"), Seq("Score"))
      def refreshB() = LakeView.refreshAggregateOverView(spark, a, b,
        Seq("G2"), Seq("rows:n", "score:sum_Score"))
      def gate(): Unit = {
        val got = LakeView.read(spark, b)
          .select($"G2", $"n", $"sum_rows", $"sum_score")
          .orderBy("G2").collect().toSeq
        val want = table(dir)
          .groupBy("G2", "G5")
          .agg(count(lit(1)).as("n"), sum($"Score").as("s"))
          .groupBy("G2")
          .agg(count(lit(1)).as("n"), sum($"n").as("sum_rows"),
            sum($"s").as("sum_score"))
          .select($"G2", $"n", $"sum_rows", $"sum_score")
          .orderBy("G2").collect().toSeq
        assert(got == want, s"got $got, want $want")
      }
      append(dir, 0, 40)
      LakeSnapshots.commit(spark, dir)
      refreshA()
      val r1 = refreshB()
      assert(r1.groupsChanged > 0L)
      gate()
      // cycle 2: delete wave flows A -> B
      DeletionVectors.delete(spark, dir, types,
        pmod($"Score", lit(4.0)) === 1.0)
      LakeSnapshots.commit(spark, dir)
      refreshA()
      refreshB()
      gate()
      // idle: B sees no new A generation... but A's idle refresh DOES
      // publish a new (inherited) generation, whose feed is empty —
      // B must fold zero groups either way
      assert(refreshA().groupsChanged == 0L)
      assert(refreshB().groupsChanged == 0L)
      gate()
      // lagging consumer: TWO A refreshes, then one B refresh spanning
      // both generations
      append(dir, 40, 50)
      LakeSnapshots.commit(spark, dir)
      refreshA()
      DeletionVectors.delete(spark, dir, types, $"Score" < 5.0)
      LakeSnapshots.commit(spark, dir)
      refreshA()
      val lag = refreshB()
      assert(lag.toVersion - lag.fromVersion >= 2L,
        s"the window must span both source generations: $lag")
      gate()
      // past retention: shrink retention, advance A until B's
      // watermark generation expires, then B must refuse loudly
      spark.conf.set("spark.graft.view.keepGenerations", "2")
      append(dir, 50, 52); LakeSnapshots.commit(spark, dir); refreshA()
      append(dir, 52, 54); LakeSnapshots.commit(spark, dir); refreshA()
      append(dir, 54, 56); LakeSnapshots.commit(spark, dir); refreshA()
      val e = intercept[IllegalStateException](refreshB())
      assert(e.getMessage.contains("keepGenerations"),
        s"retention refusal must name the knob: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.view.keepGenerations")
  }

  test("join of two maintained views: bilinear folds across cycles " +
      "equal the recompute, including a one-side-idle window") {
    val dirL = tmp("jov") + "/tl"
    val dirR = tmp("jov") + "/tr"
    val vl = tmp("jov") + "/vl"
    val vr = tmp("jov") + "/vr"
    val j = tmp("jov") + "/vj"
    val typesR = "G5:singleLineText,W:number"
    def appendR(from: Long, until: Long): Unit =
      spark.range(from, until).select(
          concat(lit("s"), lpad($"id".cast("string"), 4, "0"))
            .as("_record_id"),
          concat(lit("g"), ($"id" % 5).cast("string")).as("G5"),
          ($"id" * 2).cast("double").as("W"))
        .coalesce(1)
        .write.format("graft-records").option("path", dirR)
        .mode("append").save()
    def refreshSources(): Unit = {
      LakeView.refreshAggregate(spark, dirL, types, vl,
        Seq("G5"), Seq("Score"))
      LakeView.refreshAggregate(spark, dirR, typesR, vr,
        Seq("G5"), Seq("w:W"))
      ()
    }
    def refreshJ() = LakeView.refreshJoinOfViews(spark, j,
      vl, Seq("G5", "n", "sum_Score"),
      vr, Seq("G5", "sum_w"), Seq("G5"))
    def gate(): Unit = {
      val got = LakeView.read(spark, j)
      val want = LakeView.read(spark, vl)
        .select($"G5", $"n", $"sum_Score")
        .join(LakeView.read(spark, vr).select($"G5", $"sum_w"), Seq("G5"))
        .withColumn("m", lit(1L))
      assert(zSet(IncrementalAgg.consolidate(got)) == zSet(want),
        "join-of-views state must equal the recomputed join of the " +
          "current source states")
    }
    append(dirL, 0, 30)
    appendR(0, 20)
    Seq(dirL, dirR).foreach(LakeSnapshots.commit(spark, _))
    refreshSources()
    assert(refreshJ().deltaRows > 0L)
    gate()
    // one-side-idle: only the LEFT table moves; the right view's idle
    // refresh publishes an inherited generation with an empty feed
    append(dirL, 30, 45)
    LakeSnapshots.commit(spark, dirL)
    refreshSources()
    assert(refreshJ().deltaRows > 0L)
    gate()
    // retraction through the join: delete right-table rows
    DeletionVectors.delete(spark, dirR, typesR, $"W" >= 20.0)
    LakeSnapshots.commit(spark, dirR)
    refreshSources()
    assert(refreshJ().deltaRows > 0L)
    gate()
    // idle end-to-end
    refreshSources()
    assert(refreshJ().deltaRows == 0L)
    gate()
  }

  test("three-level chain: an aggregate maintained over a JOIN OF TWO " +
      "MAINTAINED VIEWS — the generation feed composes through " +
      "Z-relation sources with multiplicities intact") {
    val dirL = tmp("l3") + "/tl"
    val dirR = tmp("l3") + "/tr"
    val vl = tmp("l3") + "/vl"
    val vr = tmp("l3") + "/vr"
    val vj = tmp("l3") + "/vj"
    val vc = tmp("l3") + "/vc"
    val typesR = "G5:singleLineText,Cat:singleLineText,W:number"
    def appendR(from: Long, until: Long): Unit =
      spark.range(from, until).select(
          concat(lit("s"), lpad($"id".cast("string"), 4, "0"))
            .as("_record_id"),
          concat(lit("g"), ($"id" % 5).cast("string")).as("G5"),
          concat(lit("c"), ($"id" % 2).cast("string")).as("Cat"),
          ($"id" * 2).cast("double").as("W"))
        .coalesce(1)
        .write.format("graft-records").option("path", dirR)
        .mode("append").save()
    def gate(): Unit = {
      val got = LakeView.read(spark, vc)
        .select($"Cat", $"n", $"sum_cnt", $"sum_score")
        .orderBy("Cat").collect().toSeq
      val want = LakeView.read(spark, vj).filter($"m" > 0)
        .groupBy("Cat")
        .agg(sum($"m").as("n"), sum($"m" * $"n").as("sum_cnt"),
          sum($"m" * $"sum_Score").as("sum_score"))
        .select($"Cat", $"n", $"sum_cnt", $"sum_score")
        .orderBy("Cat").collect().toSeq
      assert(got == want, s"got $got, want $want")
    }
    append(dirL, 0, 30)
    appendR(0, 20)
    Seq(dirL, dirR).foreach(LakeSnapshots.commit(spark, _))
    LakeView.refreshAggregate(spark, dirL, types, vl,
      Seq("G5"), Seq("Score"))
    LakeView.refreshAggregate(spark, dirR, typesR, vr,
      Seq("G5", "Cat"), Seq("w:W"))
    LakeView.refreshJoinOfViews(spark, vj,
      vl, Seq("G5", "n", "sum_Score"),
      vr, Seq("G5", "Cat", "sum_w"), Seq("G5"))
    val c1 = LakeView.refreshAggregateOverView(spark, vj, vc,
      Seq("Cat"), Seq("cnt:n", "score:sum_Score"))
    assert(c1.groupsChanged > 0L)
    gate()
    // mutate BOTH base tables; the wave flows four levels
    DeletionVectors.delete(spark, dirL, types,
      pmod($"Score", lit(3.0)) === 0.0)
    LakeSnapshots.commit(spark, dirL)
    appendR(20, 28)
    LakeSnapshots.commit(spark, dirR)
    LakeView.refreshAggregate(spark, dirL, types, vl,
      Seq("G5"), Seq("Score"))
    LakeView.refreshAggregate(spark, dirR, typesR, vr,
      Seq("G5", "Cat"), Seq("w:W"))
    LakeView.refreshJoinOfViews(spark, vj,
      vl, Seq("G5", "n", "sum_Score"),
      vr, Seq("G5", "Cat", "sum_w"), Seq("G5"))
    val c2 = LakeView.refreshAggregateOverView(spark, vj, vc,
      Seq("Cat"), Seq("cnt:n", "score:sum_Score"))
    assert(c2.groupsChanged > 0L)
    gate()
    // and the whole chain no-ops when idle
    LakeView.refreshAggregate(spark, dirL, types, vl,
      Seq("G5"), Seq("Score"))
    LakeView.refreshAggregate(spark, dirR, typesR, vr,
      Seq("G5", "Cat"), Seq("w:W"))
    assert(LakeView.refreshJoinOfViews(spark, vj,
      vl, Seq("G5", "n", "sum_Score"),
      vr, Seq("G5", "Cat", "sum_w"), Seq("G5")).deltaRows == 0L)
    gate()
  }

  test("distinct-count fold rules: exact across appends and a delete " +
      "wave (touched-group recompute), coexisting with sums and " +
      "extrema; untouched groups carry forward") {
    val dir = tmp("dc") + "/t"
    val view = tmp("dc") + "/v"
    def refresh() = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("G2"), Seq("Score"), minMaxCols = Seq("Score"),
      distinctCols = Seq("G5"))
    def gate(): Unit = {
      val got = LakeView.read(spark, view)
        .select($"G2", $"n", $"sum_Score", $"mn_Score", $"mx_Score",
          $"dc_G5")
        .orderBy("G2").collect().toSeq
      val want = table(dir).groupBy("G2")
        .agg(count(lit(1)).as("n"), sum($"Score").as("s"),
          min($"Score").as("mn"), max($"Score").as("mx"),
          countDistinct($"G5").as("dc"))
        .orderBy("G2").collect().toSeq
      assert(got == want, s"got $got, want $want")
    }
    append(dir, 0, 30)
    LakeSnapshots.commit(spark, dir)
    assert(refresh().groupsChanged > 0L)
    gate()
    // delete a whole G5 slice: distinct counts must DROP (the
    // non-invertible case a register-merge would get wrong)
    DeletionVectors.delete(spark, dir, types,
      pmod($"Score", lit(5.0)) === 2.0)
    LakeSnapshots.commit(spark, dir)
    refresh()
    gate()
    append(dir, 30, 42)
    LakeSnapshots.commit(spark, dir)
    refresh()
    gate()
    assert(refresh().groupsChanged == 0L, "idle refresh must no-op")
    gate()
  }

  test("top-k-distinct fold rules: tk_ keeps the k largest distinct " +
      "values exactly across appends and a delete wave that kills a " +
      "stored top value (touched-group rescan), coexisting with sums, " +
      "extrema, and distinct counts") {
    val dir = tmp("tk") + "/t"
    val view = tmp("tk") + "/v"
    def refresh() = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("G2"), Seq("Score"), minMaxCols = Seq("Score"),
      distinctCols = Seq("G5"), topKs = Seq(("Score", 3)))
    def gate(): Unit = {
      val got = LakeView.read(spark, view)
        .select($"G2", $"tk_Score").orderBy("G2").collect().toSeq
        .map(r => (r.getString(0), r.getSeq[Double](1).toList))
      val want = table(dir).select($"G2", $"Score").collect().toSeq
        .map(r => (r.getString(0), r.getDouble(1)))
        .groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.sorted(Ordering[Double].reverse)
          .take(3).toList)
        .toSeq.sortBy(_._1)
      assert(got == want, s"got $got, want $want")
    }
    append(dir, 0, 30)
    LakeSnapshots.commit(spark, dir)
    assert(refresh().groupsChanged > 0L)
    gate()
    // the delete wave kills the TOP score of each parity group (29, 28
    // are the two maxima) — the replacement values must surface from
    // the rescan, which the stored k-element state alone cannot supply
    DeletionVectors.delete(spark, dir, types, $"Score" >= 28.0)
    LakeSnapshots.commit(spark, dir)
    refresh()
    gate()
    append(dir, 30, 40)
    LakeSnapshots.commit(spark, dir)
    refresh()
    gate()
    assert(refresh().groupsChanged == 0L, "idle refresh must no-op")
    gate()
  }

  test("histogram fold rules: hs_ bin counts stay exact across appends " +
      "and a delete wave with NO rescan (additive and invertible), " +
      "coexisting with sums; NULL-range rows bind no bin") {
    val dir = tmp("hist") + "/t"
    val view = tmp("hist") + "/v"
    val spec = LakeView.HistSpec("Score", 10.0, 30.0, 4)
    def refresh() = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("G2"), Seq("Score"), hists = Seq(spec))
    def gate(): Unit = {
      val got = LakeView.read(spark, view)
        .select($"G2", $"hs_Score").orderBy("G2").collect().toSeq
        .map(r => (r.getString(0), r.getSeq[Long](1).toList))
      val want = table(dir).select($"G2", $"Score").collect().toSeq
        .map(r => (r.getString(0), r.getDouble(1)))
        .groupBy(_._1).view.mapValues { vs =>
          val counts = Array.fill(6)(0L)
          vs.foreach { case (_, v) =>
            val b = if (v < 10.0) 0
              else if (v >= 30.0) 5
              else ((v - 10.0) / 5.0).toInt + 1
            counts(b) += 1
          }
          counts.toList
        }.toSeq.sortBy(_._1)
      assert(got == want, s"got $got, want $want")
    }
    append(dir, 0, 40)
    LakeSnapshots.commit(spark, dir)
    assert(refresh().groupsChanged > 0L)
    gate()
    // the delete wave empties specific bins — counts must DECREMENT
    // through the additive fold, never a recompute
    DeletionVectors.delete(spark, dir, types,
      $"Score" >= 15.0 && $"Score" < 25.0)
    LakeSnapshots.commit(spark, dir)
    refresh()
    gate()
    append(dir, 40, 50)
    LakeSnapshots.commit(spark, dir)
    refresh()
    gate()
    assert(refresh().groupsChanged == 0L, "idle refresh must no-op")
    gate()
  }

  test("composed join_aggregate carries top-k and histogram rules over " +
      "the joined rows: exact across a right-side retraction wave") {
    val base = tmp("jath")
    val lt = s"$base/l"; val rt = s"$base/r"; val view = s"$base/v"
    val ltypes = "K:number,Score:number"
    val rtypes = "K:number,Grp:singleLineText"
    spark.range(0, 40).select(
        concat(lit("l"), $"id".cast("string")).as("_record_id"),
        ($"id" % 10).cast("double").as("K"),
        $"id".cast("double").as("Score"))
      .coalesce(1)
      .write.format("graft-records").option("path", lt).mode("append").save()
    spark.range(0, 10).select(
        concat(lit("r"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("K"),
        concat(lit("g"), ($"id" % 2).cast("string")).as("Grp"))
      .coalesce(1)
      .write.format("graft-records").option("path", rt).mode("append").save()
    Seq(lt, rt).foreach(p => LakeSnapshots.commit(spark, p))
    def refresh() = LakeView.refreshJoinAggregate(spark, view,
      lt, ltypes, Seq("K", "Score"), rt, rtypes, Seq("K", "Grp"),
      Seq("K"), Seq("Grp"), Seq("Score"),
      topKs = Seq(("Score", 3)),
      hists = Seq(LakeView.HistSpec("Score", 0.0, 40.0, 4)))
    def gate(): Unit = {
      val inner = LakeView.read(spark, s"$view/inner")
      val got = LakeView.read(spark, view)
        .select($"Grp", $"tk_Score", $"hs_Score")
        .orderBy("Grp").collect().toSeq
        .map(r => (r.getString(0), r.getSeq[Double](1).toList,
          r.getSeq[Long](2).toList))
      val want = inner.select($"Grp", $"Score", $"m").collect().toSeq
        .flatMap(r => Seq.fill(r.getLong(2).toInt)(
          (r.getString(0), r.getDouble(1))))
        .groupBy(_._1).view.mapValues { vs =>
          val tk = vs.map(_._2).distinct
            .sorted(Ordering[Double].reverse).take(3).toList
          val hs = Array.fill(6)(0L)
          vs.foreach { case (_, v) =>
            val b = if (v < 0.0) 0 else if (v >= 40.0) 5
              else (v / 10.0).toInt + 1
            hs(b) += 1
          }
          (tk, hs.toList)
        }.toSeq.sortBy(_._1).map { case (g, (tk, hs)) => (g, tk, hs) }
      assert(got == want, s"got $got, want $want")
    }
    assert(refresh().groupsChanged > 0L)
    gate()
    // right-side retraction: K % 3 == 0 rows leave the join — stored
    // top scores die (rescan refills) and their bins decrement
    DeletionVectors.delete(spark, rt, rtypes, pmod($"K", lit(3.0)) === 0.0)
    LakeSnapshots.commit(spark, rt)
    refresh()
    gate()
  }

  test("distinct-count CHAIN: two additive levels stay exact across " +
      "appends and a whole-value-class delete wave with NO rescan, and " +
      "a crash between the levels heals by catch-up on the next call") {
    val dir = tmp("dcc") + "/t"
    val chain = tmp("dcc") + "/v"
    def refresh() = LakeView.refreshDistinctCount(spark, dir, types,
      chain, Seq("G2"), "G5")
    def gate(): Unit = {
      val got = LakeView.read(spark, chain)
        .select($"G2", $"n").orderBy("G2").collect().toSeq
      val want = table(dir).filter($"G5".isNotNull).groupBy("G2")
        .agg(countDistinct($"G5").as("n")).orderBy("G2").collect().toSeq
      assert(got == want, s"got $got, want $want")
    }
    append(dir, 0, 30)
    LakeSnapshots.commit(spark, dir)
    assert(refresh().groupsChanged > 0L)
    gate()
    // kill the whole G5 = "g2" value class (every id % 5 == 2 row):
    // each dead class reaches the outer fold as a lone −1 from the
    // value level's feed — the count DROPS with no recompute anywhere
    DeletionVectors.delete(spark, dir, types,
      pmod($"Score", lit(5.0)) === 2.0)
    LakeSnapshots.commit(spark, dir)
    refresh()
    gate()
    // crash between the levels: the value level advances, the count
    // level does not — the next wrapper call must catch the outer up
    // BEFORE consuming the new window (retention never outruns it)
    append(dir, 30, 42)
    LakeSnapshots.commit(spark, dir)
    LakeView.refreshAggregate(spark, dir, types, s"$chain/_values",
      Seq("G2", "G5"), Seq.empty, rowFilter = Some("`G5` IS NOT NULL"))
    val healed = refresh()
    assert(healed.groupsChanged > 0L, "catch-up must fold the orphan window")
    gate()
    assert(refresh().groupsChanged == 0L, "idle refresh must no-op")
    gate()
  }

  test("distinct-count chain OVER a maintained join view: liveness " +
      "transitions of the join result arrive as ±1s — a key losing its " +
      "LAST contributing row ticks the count down, no rescan") {
    val base = tmp("dcj")
    val lt = s"$base/l"; val rt = s"$base/r"
    val jv = s"$base/j"; val chain = s"$base/c"
    val ltypes = "K:number,Tag:singleLineText"
    val rtypes = "K:number,Grp:singleLineText"
    // left: two rows per key (multiplicity matters); right: key -> group
    spark.range(0, 20).select(
        concat(lit("l"), $"id".cast("string")).as("_record_id"),
        ($"id" % 10).cast("double").as("K"),
        concat(lit("t"), ($"id" % 3).cast("string")).as("Tag"))
      .coalesce(1)
      .write.format("graft-records").option("path", lt).mode("append").save()
    spark.range(0, 10).select(
        concat(lit("r"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("K"),
        concat(lit("g"), ($"id" % 2).cast("string")).as("Grp"))
      .coalesce(1)
      .write.format("graft-records").option("path", rt).mode("append").save()
    Seq(lt, rt).foreach(p => LakeSnapshots.commit(spark, p))
    def refresh(): Long = {
      LakeView.refreshJoin(spark, jv, lt, ltypes, Seq("K", "Tag"),
        rt, rtypes, Seq("K", "Grp"), Seq("K"))
      LakeView.refreshDistinctCountOverView(spark, jv, chain,
        Seq("Grp"), "K").groupsChanged
    }
    def gate(): Unit = {
      val got = LakeView.read(spark, chain)
        .select($"Grp", $"n").orderBy("Grp").collect().toSeq
      val want = LakeView.read(spark, jv).groupBy("Grp")
        .agg(countDistinct($"K").as("n")).orderBy("Grp").collect().toSeq
      assert(got == want, s"got $got, want $want")
    }
    assert(refresh() > 0L)
    gate()
    // kill ONE of key 4's two left rows: multiplicity 2 -> 1, the
    // distinct count must NOT move (the -1/+1 pair nets at the value
    // level's feed)
    DeletionVectors.delete(spark, lt, ltypes,
      $"K" === 4.0 && $"Tag" === "t1")
    LakeSnapshots.commit(spark, lt)
    val before = LakeView.read(spark, chain)
      .select($"Grp", $"n").orderBy("Grp").collect().toSeq
    refresh()
    gate()
    assert(LakeView.read(spark, chain)
      .select($"Grp", $"n").orderBy("Grp").collect().toSeq == before,
      "a multiplicity-only change must not move the distinct count")
    // kill key 4's LAST left row: liveness transition, count ticks down
    DeletionVectors.delete(spark, lt, ltypes, $"K" === 4.0)
    LakeSnapshots.commit(spark, lt)
    refresh()
    gate()
    assert(refresh() == 0L, "idle refresh must no-op")
  }

  test("composed distinct-count through SQL: the 16th join_aggregate " +
      "argument maintains exact COUNT(DISTINCT) over the joined rows " +
      "across a retraction wave") {
    val base = tmp("jadc")
    val dirL = s"$base/tl"; val dirR = s"$base/tr"; val v = s"$base/v"
    val typesR = "G5:singleLineText,Cat:singleLineText"
    append(dirL, 0, 30)
    spark.range(0, 5).select(
        concat(lit("k"), $"id".cast("string")).as("_record_id"),
        concat(lit("g"), $"id".cast("string")).as("G5"),
        concat(lit("c"), ($"id" % 2).cast("string")).as("Cat"))
      .coalesce(1)
      .write.format("graft-records").option("path", dirR).mode("append").save()
    Seq(dirL, dirR).foreach(LakeSnapshots.commit(spark, _))
    spark.sql(
      s"""SELECT * FROM create_lake_view('$v', 'join_aggregate',
         |  '$dirL', '$types', 'G5,G2,Score',
         |  '$dirR', '$typesR', 'G5,Cat', 'G5',
         |  'Cat', 'Score', '', 0, '', '', 'G5')""".stripMargin).collect()
    def refresh(): Unit =
      { spark.sql(s"SELECT * FROM refresh_lake_view('$v')").collect(); () }
    def gate(): Unit = {
      val got = LakeView.read(spark, v)
        .select($"Cat", $"dc_G5").orderBy("Cat").collect().toSeq
      val want = LakeView.read(spark, s"$v/inner").filter($"m" > 0)
        .groupBy("Cat").agg(countDistinct($"G5").as("dc"))
        .orderBy("Cat").collect().toSeq
      assert(got == want, s"got $got, want $want")
    }
    refresh(); gate()
    // retract one whole join key: its Cat's distinct count must DROP
    DeletionVectors.delete(spark, dirL, types, $"G5" === "g2")
    LakeSnapshots.commit(spark, dirL)
    refresh(); gate()
    append(dirL, 30, 40)
    LakeSnapshots.commit(spark, dirL)
    refresh(); gate()
  }

  test("join of a join-of-views: a Z-relation view is itself a join " +
      "side — the star composes as two nested join_of_views levels " +
      "with multiplicities multiplying through") {
    val b = tmp("jj")
    val (tf, td, tn) = (s"$b/f", s"$b/d", s"$b/n")
    val (vf, vd, vn, j1, j2) =
      (s"$b/vf", s"$b/vd", s"$b/vn", s"$b/j1", s"$b/j2")
    val typesD = "G5:singleLineText,NK:number"
    val typesN = "NK:number,NName:singleLineText"
    append(tf, 0, 40)
    spark.range(0, 5).select(
        concat(lit("d"), $"id".cast("string")).as("_record_id"),
        concat(lit("g"), $"id".cast("string")).as("G5"),
        ($"id" % 3).cast("double").as("NK"))
      .coalesce(1)
      .write.format("graft-records").option("path", td).mode("append").save()
    spark.range(0, 3).select(
        concat(lit("n"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("NK"),
        concat(lit("nat"), $"id".cast("string")).as("NName"))
      .coalesce(1)
      .write.format("graft-records").option("path", tn).mode("append").save()
    Seq(tf, td, tn).foreach(LakeSnapshots.commit(spark, _))
    def chain(): Unit = {
      LakeView.refreshAggregate(spark, tf, types, vf,
        Seq("G5"), Seq("Score"))
      LakeView.refreshAggregate(spark, td, typesD, vd,
        Seq("G5", "NK"), Seq.empty)
      LakeView.refreshAggregate(spark, tn, typesN, vn,
        Seq("NK", "NName"), Seq.empty)
      LakeView.refreshJoinOfViews(spark, j1,
        vf, Seq("G5", "n", "sum_Score"),
        vd, Seq("G5", "NK"), Seq("G5"))
      // LEFT SIDE IS ITSELF A join_of_views (Z-relation source): its
      // feed carries ± stored multiplicities and its old side reads at
      // the watermarked generation like any other source
      LakeView.refreshJoinOfViews(spark, j2,
        j1, Seq("NK", "G5", "n", "sum_Score"),
        vn, Seq("NK", "NName"), Seq("NK"))
      ()
    }
    def gate(): Unit = {
      val want = LakeView.read(spark, j1)
        .join(LakeView.read(spark, vn).select($"NK", $"NName"), Seq("NK"))
      val g = IncrementalAgg.consolidate(LakeView.read(spark, j2))
        .withColumnRenamed("m", "gm")
      val w = IncrementalAgg.consolidate(want).withColumnRenamed("m", "wm")
      // full-join on all data cols: a row on one side only (or a
      // multiplicity mismatch) surfaces as gm <≠> wm
      val bad = g.join(w,
          Seq("NK", "G5", "n", "sum_Score", "NName"), "full")
        .filter(!($"gm" <=> $"wm"))
      assert(bad.isEmpty,
        "nested join-of-views diverged from the recomputed join")
    }
    chain()
    gate()
    // retraction three levels down: delete fact rows, flow up the chain
    DeletionVectors.delete(spark, tf, types,
      pmod($"Score", lit(3.0)) === 0.0)
    LakeSnapshots.commit(spark, tf)
    chain()
    gate()
    // dimension retraction through the OUTER join
    DeletionVectors.delete(spark, tn, typesN, $"NK" === 1.0)
    LakeSnapshots.commit(spark, tn)
    chain()
    gate()
  }

  test("keepGenerations guard: values below 2 (or non-numeric) refuse " +
      "LOUDLY before any retention runs") {
    val dir = tmp("kg") + "/t"
    val view = tmp("kg") + "/v"
    append(dir, 0, 10)
    LakeSnapshots.commit(spark, dir)
    def refresh() = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("G5"), Seq("Score"))
    refresh() // healthy baseline
    var lo = 10L
    for (bad <- Seq("0", "1", "-3", "two")) {
      spark.conf.set("spark.graft.view.keepGenerations", bad)
      try {
        append(dir, lo, lo + 5)
        lo += 5
        LakeSnapshots.commit(spark, dir)
        val e = intercept[IllegalArgumentException](refresh())
        assert(e.getMessage.contains("keepGenerations"),
          s"'$bad' must refuse by name: ${e.getMessage}")
      } finally spark.conf.unset("spark.graft.view.keepGenerations")
      refresh() // and the view still works after the refusal
    }
    // the state survived every refused attempt
    assert(LakeView.read(spark, view).count() > 0)
  }

  test("kind guards: the wrong refresh form refuses with the recorded " +
      "kind instead of failing deep in the fold") {
    val dirL = tmp("kind") + "/tl"
    val dirR = tmp("kind") + "/tr"
    val v = tmp("kind") + "/v"
    val typesR = "G5:singleLineText,Tag:singleLineText"
    append(dirL, 0, 10)
    spark.range(0, 5).select(
        concat(lit("k"), $"id".cast("string")).as("_record_id"),
        concat(lit("g"), $"id".cast("string")).as("G5"),
        lit("x").as("Tag"))
      .coalesce(1)
      .write.format("graft-records").option("path", dirR).mode("append").save()
    Seq(dirL, dirR).foreach(LakeSnapshots.commit(spark, _))
    // a composed view's outer aggregate marks {left,right} exactly like
    // a join view — the kind field is what tells them apart
    LakeView.refreshJoinAggregate(spark, v,
      dirL, types, Seq("G5", "Score"),
      dirR, typesR, Seq("G5", "Tag"),
      keys = Seq("G5"), aggKeys = Seq("Tag"), aggSums = Seq("Score"))
    val e = intercept[IllegalArgumentException] {
      LakeView.refreshJoin(spark, v,
        dirL, types, Seq("G5", "Score"),
        dirR, typesR, Seq("G5", "Tag"), Seq("G5"))
    }
    assert(e.getMessage.contains("join_aggregate"),
      s"the guard must name the recorded kind: ${e.getMessage}")
    // and the aggregate guard catches a join target
    val e2 = intercept[IllegalArgumentException] {
      LakeView.refreshAggregate(spark, dirL, types, s"$v/inner",
        Seq("G5"), Seq("Score"))
    }
    assert(e2.getMessage.contains("'join'"),
      s"the guard must name the recorded kind: ${e2.getMessage}")
  }

  test("concurrent level folds: a crash that lands the OUTER level but " +
      "not the inner (the ordering the concurrency permits) heals on " +
      "the next refresh — join3 root-ahead and composed agg-ahead") {
    // join3: refresh, then regress the INNER pointer one generation
    // (simulating root-published-inner-not); a refresh with no new
    // commits must fold the inner forward and leave root ≡ recompute
    val b = tmp("ahead")
    val (t0, t1, t2, v3) = (s"$b/f", s"$b/d1", s"$b/d2", s"$b/v3")
    append(t0, 0, 30)
    spark.range(0, 5).select(
        concat(lit("k"), $"id".cast("string")).as("_record_id"),
        concat(lit("g"), $"id".cast("string")).as("G5"),
        ($"id" % 3).cast("double").as("NK"))
      .coalesce(1)
      .write.format("graft-records").option("path", t1).mode("append").save()
    spark.range(0, 3).select(
        concat(lit("n"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("NK"),
        concat(lit("nat"), $"id".cast("string")).as("NName"))
      .coalesce(1)
      .write.format("graft-records").option("path", t2).mode("append").save()
    Seq(t0, t1, t2).foreach(LakeSnapshots.commit(spark, _))
    val types1 = "G5:singleLineText,NK:number"
    val types2 = "NK:number,NName:singleLineText"
    def refresh3() = LakeView.refreshJoin3(spark, v3,
      t0, types, Seq("G5", "G2", "Score"),
      t1, types1, Seq("G5", "NK"),
      t2, types2, Seq("NK", "NName"),
      keys01 = Seq("G5"), keys12 = Seq("NK"))
    def gate3(): Unit = {
      val inner = LakeView.read(spark, s"$v3/inner")
      val nat = spark.read.format("graft-records").option("path", t2)
        .option("fieldTypes", types2).load()
      val want = inner.join(nat, "NK").withColumn("wm", $"m")
        .groupBy("NName").agg(sum($"wm").as("w"))
      val got = LakeView.read(spark, v3)
        .groupBy("NName").agg(sum($"m").as("g"))
      val mism = got.join(want, Seq("NName"), "full")
        .filter(!($"g" <=> $"w"))
      assert(mism.isEmpty, "root diverged from inner ⋈ live recompute")
    }
    refresh3()
    // second window so the inner has a generation to regress past
    DeletionVectors.delete(spark, t0, types,
      pmod($"Score", lit(4.0)) === 1.0)
    LakeSnapshots.commit(spark, t0)
    refresh3()
    gate3()
    val fs = new Path(s"$v3/inner").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val newest = fs.listStatus(new Path(s"$v3/inner")).filter(_.isFile)
      .map(_.getPath).filter(_.getName.startsWith("_ptr-"))
      .maxBy(_.getName.stripPrefix("_ptr-").stripSuffix(".json").toLong)
    assert(fs.delete(newest, false)) // inner regresses; root stays ahead
    val healed = refresh3()
    assert(healed.innerDeltaRows > 0L,
      s"the lagging inner must re-fold its window: $healed")
    assert(healed.deltaRows == 0L,
      s"the already-current root must fold nothing: $healed")
    gate3()

    // composed: same regression on the inner under a join_aggregate
    val (cl, cr, cv) = (s"$b/cl", s"$b/cr", s"$b/cv")
    append(cl, 0, 30)
    spark.range(0, 5).select(
        concat(lit("k"), $"id".cast("string")).as("_record_id"),
        concat(lit("g"), $"id".cast("string")).as("G5"),
        concat(lit("c"), ($"id" % 2).cast("string")).as("Cat"))
      .coalesce(1)
      .write.format("graft-records").option("path", cr).mode("append").save()
    Seq(cl, cr).foreach(LakeSnapshots.commit(spark, _))
    def refreshC() = LakeView.refreshJoinAggregate(spark, cv,
      cl, types, Seq("G5", "G2", "Score"),
      cr, "G5:singleLineText,Cat:singleLineText", Seq("G5", "Cat"),
      keys = Seq("G5"), aggKeys = Seq("Cat"), aggSums = Seq("Score"),
      minMaxCols = Seq("Score"))
    def gateC(): Unit = {
      val want = LakeView.read(spark, s"$cv/inner").filter($"m" > 0)
        .groupBy("Cat").agg(sum($"m").as("wn"),
          sum($"m" * $"Score").as("ws"),
          min($"Score").as("wmn"), max($"Score").as("wmx"))
      val got = LakeView.read(spark, cv)
      val mism = got.join(want, Seq("Cat"), "full")
        .filter(!($"n" <=> $"wn") || !($"sum_Score" <=> $"ws") ||
          !($"mn_Score" <=> $"wmn") || !($"mx_Score" <=> $"wmx"))
      assert(mism.isEmpty, "composed agg diverged from inner recompute")
    }
    refreshC()
    DeletionVectors.delete(spark, cl, types,
      pmod($"Score", lit(5.0)) === 2.0)
    LakeSnapshots.commit(spark, cl)
    refreshC()
    gateC()
    val newestC = fs.listStatus(new Path(s"$cv/inner")).filter(_.isFile)
      .map(_.getPath).filter(_.getName.startsWith("_ptr-"))
      .maxBy(_.getName.stripPrefix("_ptr-").stripSuffix(".json").toLong)
    assert(fs.delete(newestC, false))
    val healedC = refreshC()
    assert(healedC.deltaRows > 0L,
      s"the lagging inner must re-fold its window: $healedC")
    assert(healedC.groupsChanged == 0L,
      s"the already-current aggregate must fold nothing: $healedC")
    gateC()
  }

  test("a join3 ROOT is itself a feed source: an aggregate maintained " +
      "over the composed Z-relation folds stored multiplicities " +
      "through a delete wave (fold ≡ recompute) — the Z side of the " +
      "kind partition pinned by an actual consumer") {
    val b = tmp("j3src")
    val (t0, t1, t2, v3, agg) =
      (s"$b/f", s"$b/d1", s"$b/d2", s"$b/v3", s"$b/agg")
    append(t0, 0, 40)
    spark.range(0, 5).select(
        concat(lit("k"), $"id".cast("string")).as("_record_id"),
        concat(lit("g"), $"id".cast("string")).as("G5"),
        ($"id" % 3).cast("double").as("NK"))
      .coalesce(1)
      .write.format("graft-records").option("path", t1).mode("append").save()
    spark.range(0, 3).select(
        concat(lit("n"), $"id".cast("string")).as("_record_id"),
        $"id".cast("double").as("NK"),
        concat(lit("nat"), $"id".cast("string")).as("NName"))
      .coalesce(1)
      .write.format("graft-records").option("path", t2).mode("append").save()
    Seq(t0, t1, t2).foreach(LakeSnapshots.commit(spark, _))
    val types1 = "G5:singleLineText,NK:number"
    val types2 = "NK:number,NName:singleLineText"
    def refresh3() = LakeView.refreshJoin3(spark, v3,
      t0, types, Seq("G5", "Score"),
      t1, types1, Seq("G5", "NK"),
      t2, types2, Seq("NK", "NName"),
      keys01 = Seq("G5"), keys12 = Seq("NK"))
    // the consumer: per-nation rollup folding the ROOT's generation
    // feed — a Z-relation source, so n folds as Σm and sums as Σ m·expr
    def refreshAgg() = LakeView.refreshAggregateOverView(spark, v3, agg,
      Seq("NName"), Seq("score:Score"))
    def gate(): Unit = {
      val want = LakeView.read(spark, v3).groupBy("NName")
        .agg(sum($"m").as("wn"), sum($"m" * $"Score").as("ws"))
      val got = LakeView.read(spark, agg)
      val mism = got.join(want, Seq("NName"), "full")
        .filter(!($"n" <=> $"wn") || !($"sum_score" <=> $"ws"))
      assert(mism.isEmpty,
        "the rollup over the join3 root diverged from a recompute")
    }
    assert(LakeView.viewKind(spark, v3).isEmpty)
    refresh3()
    assert(LakeView.viewKind(spark, v3).contains("join3"))
    assert(refreshAgg().groupsChanged > 0L)
    gate()
    // delete wave through the MIDDLE table retracts joined rows with
    // their multiplicities — the feed must carry ±m, not ±1
    DeletionVectors.delete(spark, t1, types1, $"NK" === 1.0)
    LakeSnapshots.commit(spark, t1)
    refresh3()
    assert(refreshAgg().groupsChanged > 0L)
    gate()
    // idle window through the whole chain
    refresh3()
    assert(refreshAgg().groupsChanged == 0L)
    gate()
  }

  test("per-bucket bytes ride the pointer: steady adaptive refreshes " +
      "take ZERO filesystem content-summary sweeps; a pointer with " +
      "stripped bytes falls back to sweeping until restamped") {
    val dir = tmp("bytes") + "/t"
    val view = tmp("bytes") + "/v"
    def refresh() = LakeView.refreshAggregate(spark, dir, types, view,
      Seq("G5"), Seq("Score")) // adaptive modulus — the path that sizes
    append(dir, 0, 30)
    LakeSnapshots.commit(spark, dir)
    refresh() // bootstrap (no pointer yet: no sizing either)
    append(dir, 30, 60)
    LakeSnapshots.commit(spark, dir)
    val before = LakeView.contentSweeps.get()
    refresh() // steady: sizes state from the pointer's recorded bytes
    assert(LakeView.contentSweeps.get() == before,
      "a steady refresh must not sweep the filesystem for state sizes")
    // strip the bytes field (simulate a pre-upgrade pointer): the next
    // refresh sweeps exactly the unstamped buckets, then restamps
    val fs = new Path(view).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ptrFile = fs.listStatus(new Path(view)).filter(_.isFile)
      .map(_.getPath).filter(_.getName.startsWith("_ptr-"))
      .maxBy(_.getName)
    val in = fs.open(ptrFile)
    val raw = scala.io.Source.fromInputStream(in).mkString
    in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(raw)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("bytes")
    val out = fs.create(ptrFile, true)
    out.write(mapper.writeValueAsString(node).getBytes("UTF-8"))
    out.close()
    append(dir, 60, 90)
    LakeSnapshots.commit(spark, dir)
    val b2 = LakeView.contentSweeps.get()
    refresh()
    assert(LakeView.contentSweeps.get() > b2,
      "an unstamped pointer must fall back to sweeping")
    append(dir, 90, 120)
    LakeSnapshots.commit(spark, dir)
    val b3 = LakeView.contentSweeps.get()
    refresh() // restamped by the previous rewrite: steady again
    assert(LakeView.contentSweeps.get() == b3,
      "a rewrite must restamp its buckets (fallback decays to nothing)")
  }
}
