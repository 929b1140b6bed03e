package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, Sampling, TextAnalysis}

class ComponentsSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("connected components label every node with its cluster minimum") {
    // chain 1-2-3-4 (transitive closure: 4 never pairs with 1 directly)
    // plus a separate pair and an implicit singleton via canonicalize
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (6L, 5L)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connected components fail loudly when maxIter is too small") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val err = intercept[IllegalArgumentException] {
      Components.connectedComponents(path, "a", "b", maxIter = 2)
    }
    assert(err.getMessage.contains("converge"))
    // and with room to converge the same graph labels fine
    val ok = Components.connectedComponents(path, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet == Set(1L))
  }

  test("connected components reject non-numeric node ids up front") {
    val strEdges = Seq(("a", "b")).toDF("id_a", "id_b")
    val err = intercept[IllegalArgumentException] {
      Components.connectedComponents(strEdges, "id_a", "id_b")
    }
    // a silent long cast would null every id and return an EMPTY labeling
    assert(err.getMessage.contains("non-numeric"))
  }

  test("reliable-checkpoint mode labels identically to localCheckpoint mode") {
    // same graph through both truncation modes — the labeling must be
    // bit-identical; only the fault-tolerance of round state differs
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (6L, 5L), (9L, 8L))
      .toDF("id_a", "id_b")
    val ckDir = java.nio.file.Files.createTempDirectory("graft_cc_ck").toString
    try {
      val local = Components.connectedComponents(edges, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      val reliable = Components.connectedComponents(edges, "id_a", "id_b",
        checkpointDir = Some(ckDir)).as[(Long, Long)].collect().toMap
      assert(reliable == local)
      // round state actually went through the reliable dir
      assert(new java.io.File(ckDir).listFiles != null &&
        new java.io.File(ckDir).listFiles.nonEmpty,
        s"no checkpoint data written under $ckDir")
      val star = Components.connectedComponentsStar(edges, "id_a", "id_b",
        checkpointDir = Some(ckDir)).as[(Long, Long)].collect().toMap
      assert(star == local)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckDir))
    }
  }

  test("exactNSample: exact size, rerun-stable, bounded-heap plan, n > rows returns all") {
    val docs = spark.range(500).select($"id".as("doc_id"),
      ($"id" % 7).as("grp"))
    val s1 = Sampling.exactNSample(docs, Seq("doc_id"), 50)
    assert(s1.count() == 50)
    // rerun-stable: the same 50 rows every time
    val ids = s1.select("doc_id").as[Long].collect().toSet
    assert(Sampling.exactNSample(docs, Seq("doc_id"), 50)
      .select("doc_id").as[Long].collect().toSet == ids)
    // growing n only ADDS rows (monotone, like the rate samplers)
    val ids80 = Sampling.exactNSample(docs, Seq("doc_id"), 80)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(ids80))
    // bounded-heap plan: TakeOrderedAndProject, never a global Sort
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // n past the table returns everything
    assert(Sampling.exactNSample(docs, Seq("doc_id"), 10000).count() == 500)
  }

  test("connected components of an empty edge list is the empty labeling") {
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Components.connectedComponents(none, "id_a", "id_b").count() == 0)
    // canonicalize over no pairs: every doc is its own canonical
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val got = Components.canonicalize(docs, none, "doc_id", "id_a", "id_b")
      .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("large-star/small-star converges on a path deeper than maxIter rounds") {
    // a 200-deep path graph needs ~200 min-propagation rounds (so
    // connectedComponents at maxIter=50 refuses it) but only O(log n)
    // star alternations
    val deep = spark.range(199).select($"id".as("a"), ($"id" + 1).as("b"))
    intercept[IllegalArgumentException] {
      Components.connectedComponents(deep, "a", "b", maxIter = 50)
    }
    val labels = Components.connectedComponentsStar(deep, "a", "b", maxIter = 50)
      .as[(Long, Long)].collect()
    assert(labels.length == 200)
    assert(labels.forall(_._2 == 0L)) // one component, min id 0
  }

  test("star and propagate algorithms produce identical labelings") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (6L, 5L), (8L, 8L),
      (10L, 7L), (7L, 11L)).toDF("id_a", "id_b")
    val prop = Components.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val star = Components.connectedComponentsStar(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
    // empty edge list: empty labeling, same as propagate
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Components.connectedComponentsStar(none, "id_a", "id_b").count() == 0)
    // non-numeric ids rejected up front, same as propagate
    intercept[IllegalArgumentException] {
      Components.connectedComponentsStar(Seq(("a", "b")).toDF("id_a", "id_b"),
        "id_a", "id_b")
    }
  }

  test("incrementalComponents folds a delta into a prior assignment == full rebuild") {
    val base = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val prev = Components.connectedComponents(base, "id_a", "id_b")
    // delta merges the two old components (2-3), spans old->new (4-7),
    // creates a brand-new component (5-6), and attaches a node the base
    // edges never saw (9) to an old component (1-9)
    val delta = Seq((2L, 3L), (5L, 6L), (4L, 7L), (1L, 9L)).toDF("id_a", "id_b")
    val got = Components.incrementalComponents(prev, delta,
      "node", "label", "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val full = Components.connectedComponents(
      base.unionByName(delta), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == full)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 1L,
      9L -> 1L, 5L -> 5L, 6L -> 5L))
    // empty delta: the assignment passes through unchanged
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val same = Components.incrementalComponents(prev, none,
      "node", "label", "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(same == prev.as[(Long, Long)].collect().toMap)
    // delta entirely inside one old component: labels stay put
    val inner = Seq((1L, 2L)).toDF("id_a", "id_b")
    val innerOut = Components.incrementalComponents(prev, inner,
      "node", "label", "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(innerOut == prev.as[(Long, Long)].collect().toMap)
  }

  test("canonicalize maps unpaired docs to themselves, paired to cluster min") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "alone")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Components.canonicalize(docs, pairs, "doc_id", "id_a", "id_b")
      .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
    // keep-rule: exactly one survivor per cluster + the singleton
    assert(Components.canonicalize(docs, pairs, "doc_id", "id_a", "id_b")
      .filter(col("doc_id") === col("canonical_id")).count() == 2)
  }

  test("canonicalizeBy keeps the best-scoring cluster member, not the min id") {
    val docs = Seq((1L, "short", 5.0), (2L, "the longest doc", 9.0),
      (3L, "mid", 7.0), (9L, "alone", 1.0)).toDF("doc_id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Components.canonicalizeBy(docs, pairs, "doc_id", "id_a", "id_b",
      col("quality"))
      .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 9L -> 9L))
    // score ties break to the smallest id, deterministically
    val tied = Components.canonicalizeBy(docs, pairs, "doc_id", "id_a", "id_b",
      lit(1.0)).select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(tied == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
    // keep-rule filter yields one survivor per cluster plus the singleton
    assert(Components.canonicalizeBy(docs, pairs, "doc_id", "id_a", "id_b",
      col("quality")).filter(col("doc_id") === col("canonical_id")).count() == 2)
    // a docs frame with its own 'label' column must not make the
    // component join ambiguous, and the column must survive untouched
    val labeledDocs = docs.withColumn("label", concat(lit("L"), col("doc_id")))
    val withLabel = Components.canonicalizeBy(labeledDocs, pairs,
      "doc_id", "id_a", "id_b", col("quality"))
    assert(withLabel.columns.count(_ == "label") == 1)
    assert(withLabel.select("doc_id", "label").as[(Long, String)]
      .collect().toMap.apply(3L) == "L3")
    assert(withLabel.select("doc_id", "canonical_id").as[(Long, Long)]
      .collect().toMap == got)
  }

  test("hash sampling is deterministic, rate-bounded, and engine-portable") {
    val df = spark.range(2000).select($"id".as("k"))
    assert(Sampling.hashSample(df, Seq("k"), 1.0).count() == 2000)
    assert(Sampling.hashSample(df, Seq("k"), 0.0).count() == 0)
    val a = Sampling.hashSample(df, Seq("k"), 0.3).as[Long].collect().toSet
    val b = Sampling.hashSample(df, Seq("k"), 0.3).as[Long].collect().toSet
    assert(a == b) // rerun-stable: membership is a function of the key
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
    // a smaller rate's sample is a SUBSET of a larger rate's (nested
    // samples — the property that makes rate changes incremental)
    val c = Sampling.hashSample(df, Seq("k"), 0.1).as[Long].collect().toSet
    assert(c.subsetOf(a))
    // rate 1.0's cutoff sorts above every hex draw (a "ffffffff" cutoff
    // would drop rows whose hash IS ffffffff); rate 0 keeps nothing
    assert(Sampling.hexCutoff(0.0) == "00000000" && Sampling.hexCutoff(1.0) == "g")
    assert("ffffffff" < Sampling.hexCutoff(1.0))
  }

  test("dataset split is exhaustive, disjoint, and nested with sampling") {
    val df = spark.range(5000).select($"id".as("k"))
    val s = Sampling.splitAssign(df, Seq("k"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 5000) // exhaustive: no row unassigned
    assert(math.abs(counts("train") / 5000.0 - 0.8) < 0.03)
    assert(counts.keySet == Set("train", "val", "test"))
    // the train split IS the rate-0.8 hash sample: one draw, consecutive
    // ranges — so sampling and splitting stay mutually consistent
    val trainKeys = s.filter($"split" === "train").select("k").as[Long].collect().toSet
    val sampled = Sampling.hashSample(df, Seq("k"), 0.8).as[Long].collect().toSet
    assert(trainKeys == sampled)
    // float-error accumulation in fractions must not break the last range
    assert(Sampling.splitAssign(df, Seq("k"),
      Seq("a" -> 0.3, "b" -> 0.3, "c" -> 0.4)).filter($"split".isNull).count() == 0)
    // zero key columns would hash a constant -> one split gets everything
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(df, Seq.empty, Seq("train" -> 1.0))
    }
  }

  test("weighted sampling keeps rows at their own per-row rate") {
    val df = spark.range(4000).select($"id".as("k"),
      when($"id" % 2 === 0, 1.0).otherwise(0.1).as("w"))
    val kept = Sampling.weightedHashSample(df, Seq("k"), col("w"))
      .groupBy($"w").count().as[(Double, Long)].collect().toMap
    assert(kept(1.0) == 2000) // rate 1.0 keeps every row (no ffffffff loss)
    assert(math.abs(kept(0.1) / 2000.0 - 0.1) < 0.05)
    // rates outside [0,1] clamp instead of corrupting the cutoff
    val wild = spark.range(100).select($"id".as("k"), lit(7.5).as("w"))
    assert(Sampling.weightedHashSample(wild, Seq("k"), col("w")).count() == 100)
    assert(Sampling.weightedHashSample(wild, Seq("k"), lit(-3.0)).count() == 0)
    // monotone: a row kept at rate r stays kept at any higher rate
    val at03 = Sampling.weightedHashSample(df, Seq("k"), lit(0.3))
      .select("k").as[Long].collect().toSet
    val at06 = Sampling.weightedHashSample(df, Seq("k"), lit(0.6))
      .select("k").as[Long].collect().toSet
    assert(at03.subsetOf(at06))
    // NULL rate is an explicit rate 0: the row drops by coalesce, not by
    // incidental null-comparison semantics
    val withNullRate = spark.range(100).select($"id".as("k"),
      when($"id" < 50, 1.0).as("w")) // ids 50+ get a NULL rate
    assert(Sampling.weightedHashSample(withNullRate, Seq("k"), col("w"))
      .count() == 50)
  }

  test("stratified sampling applies per-stratum rates with a default") {
    val df = spark.range(3000).select($"id".as("k"),
      when($"id" % 3 === 0, "big").when($"id" % 3 === 1, "small")
        .otherwise("other").as("stratum"))
    val s = Sampling.stratifiedHashSample(df, "stratum",
      Map("big" -> 1.0, "small" -> 0.2), defaultRate = 0.0, keyCols = Seq("k"))
    val byStratum = s.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(byStratum("big") == 1000)
    assert(byStratum.get("other").isEmpty) // default 0.0 drops unlisted strata
    assert(math.abs(byStratum("small") / 1000.0 - 0.2) < 0.06)
  }

  test("scd2 collapses duplicate states into ranges closed by the next change") {
    val events = Seq(
      (1L, 10L, "A", 100L), (1L, 11L, "A", 200L), // consecutive dup collapses
      (1L, 12L, "B", 300L), (1L, 13L, "A", 400L), // A can recur after B
      (2L, 20L, "X", 100L),                        // single-state key
      (3L, 30L, null.asInstanceOf[String], 100L),  // NULL state drops
      (3L, 31L, "Y", 200L),
      // same-second tie: event_id order decides (32 before 33 -> Z then W)
      (4L, 32L, "Z", 500L), (4L, 33L, "W", 500L))
      .toDF("user_id", "event_id", "event_type", "sec")
    val got = graft.operators.Sequence.scd2(events,
      "user_id", "event_type", "sec", "event_id")
      .orderBy("key", "valid_from", "state").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "A", 100L, 300L, false),
      (1L, "B", 300L, 400L, false),
      (1L, "A", 400L, -1L, true),
      (2L, "X", 100L, -1L, true),
      (3L, "Y", 200L, -1L, true),
      (4L, "W", 500L, -1L, true),
      (4L, "Z", 500L, 500L, false)))
  }

  test("per-group cap keeps at most k rows per group, deterministically") {
    val df = spark.range(500).select($"id".as("k"),
      ($"id" % 5).cast("string").as("g"))
    val capped = Sampling.capPerGroup(df, Seq("g"), Seq("k"), k = 7)
    val sizes = capped.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 7) && sizes.size == 5)
    // deterministic: same kept set on rerun
    val a = capped.select("k").as[Long].collect().toSet
    assert(a == Sampling.capPerGroup(df, Seq("g"), Seq("k"), 7)
      .select("k").as[Long].collect().toSet)
    // groups smaller than k survive whole
    val small = Sampling.capPerGroup(df.filter($"k" < 3), Seq("g"), Seq("k"), 7)
    assert(small.count() == 3)
    // plan: the window group limit prunes before the final sort
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("PII patterns count and redact emails and phones") {
    val df = Seq(
      (1L, "write to alice.smith+x@mail.example.org or call 555-0199 today"),
      (2L, "no pii here"),
      (3L, "two mails a@b.io c@d.co one phone 555-0000")).toDF("doc_id", "text")
    val got = df.select($"doc_id",
      TextAnalysis.patternCount($"text", TextAnalysis.EmailRe).as("e"),
      TextAnalysis.patternCount($"text", TextAnalysis.PhoneRe).as("p"),
      TextAnalysis.redactPii($"text").as("red"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 == 1 && got(0)._3 == 1)
    assert(got(0)._4 == "write to <EMAIL> or call <PHONE> today")
    assert(got(1)._2 == 0 && got(1)._3 == 0 && got(1)._4 == "no pii here")
    assert(got(2)._2 == 2 && got(2)._3 == 1)
  }

  test("cross-corpus contamination separates leaked from fresh eval docs") {
    val train = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // verbatim leak
      (11L, "totally fresh words nowhere in train corpus ever"),
      (12L, "alpha beta gamma delta unrelated tail here now")) // partial
      .toDF("doc_id", "text")
    val got = TextAnalysis.crossContamination(train, eval_, "doc_id", "text", k = 3)
      .select("id", "contaminated_frac").as[(Long, Double)].collect().toMap
    assert(got(10L) == 1.0)
    assert(got(11L) == 0.0)
    assert(got(12L) > 0.0 && got(12L) < 1.0) // only the shared prefix's shingles hit
  }

  test("token chunking emits stride-spaced windows with short tails") {
    val df = Seq((1L, (1 to 25).map(i => s"w$i").mkString(" ")), (2L, "only two"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(df, "doc_id", "text", chunkSize = 10, stride = 5)
      .select("id", "chunk_id", "n_toks").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // 25 tokens, size 10 / stride 5: starts 0,5,10,15,20 -> 10,10,10,10,5
    assert(got(1L) == Seq(10L, 10L, 10L, 10L, 5L))
    assert(got(2L) == Seq(2L)) // shorter than one window: a single short chunk
    // chunks re-assemble the doc: every token appears in ceil(size/stride) windows
    val fps = TextAnalysis.chunkTokens(df, "doc_id", "text", 10, 5)
      .select("chunk_fp").distinct().count()
    assert(fps == 6) // 5 + 1 distinct windows
  }

  test("funnel stages advance only on in-order steps") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1 completes the funnel, with noise events interleaved
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "error"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "click"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "purchase"),
      // user 2 purchases BEFORE viewing: strictly ordered -> stalls at 1
      (2L, ts("2024-01-01 10:00:00"), 5L, "purchase"),
      (2L, ts("2024-01-01 10:01:00"), 6L, "view"),
      // user 3 never clicks
      (3L, ts("2024-01-01 10:00:00"), 7L, "view"),
      (3L, ts("2024-01-01 10:01:00"), 8L, "purchase"),
      // user 4 does nothing relevant
      (4L, ts("2024-01-01 10:00:00"), 9L, "signup"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.Sequence.funnelStages(ev, "user_id",
      Seq("ts", "event_id"), "event_type", Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    val counts = graft.operators.Sequence.funnelCounts(ev, "user_id",
      Seq("ts", "event_id"), "event_type", Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(0L -> 1L, 1L -> 2L, 3L -> 1L))
    // bounded-key contract: a pathological hot key fails loudly up front
    // (named in the error) instead of OOMing inside collect_list
    val err = intercept[IllegalArgumentException] {
      graft.operators.Sequence.funnelStages(ev, "user_id",
        Seq("ts", "event_id"), "event_type", Seq("view"), maxEventsPerKey = 2)
    }
    assert(err.getMessage.contains("maxEventsPerKey"))
    // a sufficient cap changes nothing
    val capped = graft.operators.Sequence.funnelStages(ev, "user_id",
      Seq("ts", "event_id"), "event_type", Seq("view", "click", "purchase"),
      maxEventsPerKey = 10).as[(Long, Long)].collect().toMap
    assert(capped == got)
  }

  test("boilerplate lines drop corpus-wide; documents reassemble in order") {
    val docs = Seq(
      (1L, "unique one\n COOKIE BANNER \nbody text 1"),
      (2L, "COOKIE BANNER\nbody text 2\n\nunique two"),
      (3L, "body text 3\nCOOKIE BANNER"),
      (4L, "all original here"),
      (5L, "COOKIE BANNER")).toDF("doc_id", "text")
    val out = TextAnalysis.dropBoilerplateLines(docs, "doc_id", "text",
      maxDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // the banner recurs in 4 docs (> 2) -> dropped everywhere, matching on
    // TRIMMED text; originals reassemble in line order
    assert(out(1L) == (("unique one\nbody text 1", 2L, 1L)))
    // blank lines are structural: kept, never counted as boilerplate
    assert(out(2L) == (("body text 2\n\nunique two", 3L, 1L)))
    assert(out(3L) == (("body text 3", 1L, 1L)))
    assert(out(4L) == (("all original here", 1L, 0L)))
    // an all-boilerplate doc survives as an empty (not missing) row
    assert(out(5L) == (("", 0L, 1L)))
    // under the threshold nothing drops
    val loose = TextAnalysis.dropBoilerplateLines(docs, "doc_id", "text",
      maxDocFreq = 10).select(sum("n_lines_dropped")).as[Long].head()
    assert(loose == 0L)
  }

  test("paragraph dedup keeps only the first global occurrence by (doc, pos)") {
    val docs = Seq(
      (1L, "alpha\nshared para\nbeta"),
      (2L, "shared para\ngamma\n\nshared para"),
      (3L, " shared para \ndelta"),
      (4L, "shared para")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // first occurrence is (doc 1, pos 1) -> kept there, dropped everywhere
    // else INCLUDING the within-doc repeat in doc 2; match is on TRIMMED
    // text (doc 3's padded copy still drops) but originals reassemble
    assert(out(1L) == (("alpha\nshared para\nbeta", 3L, 0L)))
    // blank paragraphs are structural: kept, never dedup keys
    assert(out(2L) == (("gamma\n", 2L, 2L)))
    assert(out(3L) == (("delta", 1L, 1L)))
    // an all-duplicate doc survives as an empty (not missing) row
    assert(out(4L) == (("", 0L, 1L)))
  }

  test("leakageSafeSplit: near-dup pairs never straddle splits; singletons covered") {
    // 60 docs; 15 pair-edges forming chains plus 30 singletons — enough
    // components that every split is non-empty under 80/10/10
    val docs = (1L to 60L).toDF("doc_id")
    val pairs = (1L to 30L by 2).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Sampling.leakageSafeSplit(docs, "doc_id", pairs, "id_a", "id_b",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val bySplit = got.select($"doc_id", $"split").as[(Long, String)]
      .collect().toMap
    // every doc assigned exactly once
    assert(bySplit.keySet == (1L to 60L).toSet)
    // the leakage invariant: both endpoints of every pair share a split
    for ((a, b) <- (1L to 30L by 2).map(i => (i, i + 1)))
      assert(bySplit(a) == bySplit(b), s"pair ($a,$b) straddles splits")
    // singleton components keep their own id; paired docs the pair min
    val comp = got.select($"doc_id", $"component").as[(Long, Long)]
      .collect().toMap
    for (i <- 31L to 60L) assert(comp(i) == i)
    for (i <- 1L to 30L by 2) { assert(comp(i) == i); assert(comp(i + 1) == i) }
    // assignment is a pure function of the component -> rerun-stable
    val again = Sampling.leakageSafeSplit(docs, "doc_id", pairs, "id_a", "id_b",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(again == bySplit)
  }

  test("sequence packing: contiguous per-shard offsets, correct bin spans, stable") {
    import graft.operators.Packing
    val docs = spark.range(60).select($"id".as("doc_id"),
      (($"id" % 7) * 3 + 1).as("n_toks")) // lengths 1..19
    val placed = Packing.packSequences(docs, "doc_id", "n_toks",
      budget = 16L, shards = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(placed.length == 60)
    // per shard: offsets are a contiguous concat (each start = previous
    // start + previous length, first starts at 0)
    placed.groupBy(_._1).values.foreach { sh =>
      val ordered = sh.sortBy(_._4)
      assert(ordered.head._4 == 0L)
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(b._4 == a._4 + a._3, s"gap between $a and $b")
      }
    }
    // bin spans: first/last derive from offset arithmetic; docs longer
    // than the budget legitimately span multiple bins
    placed.foreach { case (_, _, n, start, first, last) =>
      assert(first == start / 16)
      assert(last == (start + math.max(n - 1, 0)) / 16)
    }
    assert(placed.exists { case (_, _, n, start, first, last) =>
      last > first }) // 19-token docs must straddle a 16-token bin
    // rerun-stable, and NULL lengths pack as 0-length at the same spot
    val again = Packing.packSequences(docs, "doc_id", "n_toks", 16L, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(again.toSet == placed.map(p => (p._1, p._2, p._4)).toSet)
    val withNull = docs.withColumn("n_toks",
      when($"doc_id" === 0, lit(null)).otherwise($"n_toks"))
    val pn = Packing.packSequences(withNull, "doc_id", "n_toks", 16L, 3)
      .filter($"doc_id" === 0).head()
    assert(pn.getLong(2) == 0L && pn.getLong(4) == pn.getLong(5))
    // occupancy: every bin holds exactly budget tokens except each
    // shard's tail bin, and totals reconcile with the input
    val occ = Packing.binOccupancy(
      Packing.packSequences(docs, "doc_id", "n_toks", 16L, 3), 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val totalTokens = docs.select(sum($"n_toks")).as[Long].head()
    assert(occ.values.sum == totalTokens)
    val lastBinPerShard = occ.keys.groupBy(_._1).map { case (s0, ks) =>
      s0 -> ks.map(_._2).max }
    occ.foreach { case ((s0, b), used) =>
      if (b < lastBinPerShard(s0)) assert(used == 16L, s"non-tail bin ($s0,$b) short: $used")
      else assert(used <= 16L)
    }
  }

  test("capPerGroup and zorder temp columns never clobber input columns") {
    // an input column named like the operator's internal temp column must
    // survive to the output unchanged
    val df = spark.range(20).select(($"id" % 2).as("g"), $"id".as("k"),
      ($"id" * 100).as("_rn"))
    val out = Sampling.capPerGroup(df, Seq("g"), Seq("k"), k = 3)
    assert(out.columns.contains("_rn"))
    assert(out.select(sum($"_rn")).as[Long].head() > 0) // values intact
    val zin = Seq((1.0, 2.0, 7L)).toDF("x", "y", "_z")
    val zout = graft.operators.ZOrder.cluster(zin,
      Seq(("x", 0.0, 10.0), ("y", 0.0, 10.0)), bitsPerDim = 8)
    assert(zout.columns.toSeq == Seq("x", "y", "_z"))
    assert(zout.select("_z").as[Long].head() == 7L)
  }

  test("URL domain extraction and histogram binning") {
    val doms = Seq("visit https://a.example.com/x and http://b.org then no-url")
      .toDF("text").select(TextAnalysis.urlDomains($"text"))
      .as[Seq[String]].head()
    assert(doms == Seq("a.example.com", "b.org"))
    val bins = Seq(0L, 99L, 100L, 1999L, 2000L, 99999L).toDF("v")
      .select(TextAnalysis.histogramBin($"v", 100L, 20)).as[Long].collect().toSeq
    assert(bins == Seq(0L, 0L, 1L, 19L, 19L, 19L)) // overflow capped at last bin
  }

  test("negativeSample: deterministic, in-domain, never self, payload joined") {
    val docs = (0L until 10L).map(i => (i, i * 100L)).toDF("doc_id", "payload")
    val out = Sampling.negativeSample(docs, "doc_id", k = 2,
      payloadCols = Seq("payload")).orderBy("anchor_id", "slot").collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      val (anchor, slot, neg, pay) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(neg >= 0 && neg < 10 && neg != anchor, r.toString)
      assert(slot >= 0 && slot < 2, r.toString)
      assert(pay == neg * 100L, s"payload must come from the negative row: $r")
    }
    // rerun-stability: pure hash arithmetic, no RNG state
    val again = Sampling.negativeSample(docs, "doc_id", k = 2,
      payloadCols = Seq("payload")).orderBy("anchor_id", "slot").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // two-row domain: every draw is the peer or a dropped self-draw
    val tiny = Seq((0L, 1L), (1L, 2L)).toDF("doc_id", "payload")
    val t = Sampling.negativeSample(tiny, "doc_id", k = 3,
      payloadCols = Seq("payload")).collect()
    t.foreach(r => assert(r.getLong(2) == 1L - r.getLong(0), r.toString))
  }

  test("mixtureSample: budget-proportional rates, clamping, absent sources dropped") {
    val docs = (1L to 300L).map(i => (i, s"s${i % 3}", 10L)).toDF("id", "src", "w")
    // s0: 100 docs x weight 10 = 1000; target 0.5 of budget 600 -> rate 0.3
    val kept = Sampling.mixtureSample(docs, "src", Seq("id"), "w",
      Map("s0" -> 0.5, "s1" -> 0.5), budget = 600L)
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("s2"), "untargeted source must be dropped")
    assert(bySrc.getOrElse("s0", 0L) > 10 && bySrc("s0") < 60,
      s"~30 of 100 expected at rate 0.3: $bySrc")
    // rerun-stable (pure hash membership)
    val again = Sampling.mixtureSample(docs, "src", Seq("id"), "w",
      Map("s0" -> 0.5, "s1" -> 0.5), budget = 600L).count()
    assert(again == kept.count())
    // rate clamps at 1.0: an oversized budget keeps every targeted row
    val all = Sampling.mixtureSample(docs, "src", Seq("id"), "w",
      Map("s0" -> 1.0), budget = 1000000L)
    assert(all.count() == 100L)
  }

  test("compaction: many tiny files become few, content byte-identical") {
    import graft.operators.Compaction
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    spark.range(10000).selectExpr("id", "id * 2 AS v")
      .repartition(64).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts() = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(_.getPath.getName.startsWith("part-"))
    assert(parts() == 64)
    val before = spark.read.parquet(dir).orderBy("id")
      .collect().map(_.toString).toSeq
    val n = Compaction.compact(spark, dir, targetBytes = 1L << 30)
    assert(n == 1 && parts() == 1, s"wrote $n files, dir has ${parts()}")
    val after = spark.read.parquet(dir).orderBy("id")
      .collect().map(_.toString).toSeq
    assert(after == before)
  }

  test("compaction planner: adjacent packing, bounded overshoot, range metadata") {
    import graft.operators.Compaction
    import spark.implicits._
    // days 1..6 sized 30/30/50/200/10/10 at target 100:
    // grp = floor((cum - size)/100): cum 30,60,110,310,320,330
    // -> grp 0,0,0,1,3,3 — HERE the 200-byte day lands alone in grp 1
    // because its start offset (110) already crossed the boundary; the
    // invariant is NOT isolation but adjacent packing with overshoot
    // bounded by one input (see the (10, 200) case below, where an
    // oversized input shares its group with a preceding small one)
    val inv = Seq((1L, 30L), (2L, 30L), (3L, 50L), (4L, 200L),
      (5L, 10L), (6L, 10L)).toDF("day", "bytes")
    val plan = Compaction.planSequential(inv, "day", "bytes", 100L)
      .orderBy("day").select("day", "grp")
      .as[(Long, Long)].collect().toSeq
    assert(plan == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L),
      (5L, 3L), (6L, 3L)), s"plan $plan")
    // groups pack ADJACENT days only: each group's day range never
    // overlaps another's (the pruning-locality invariant)
    val sm = Compaction.planSummary(inv, "day", "bytes", 100L)
      .orderBy("grp")
      .select("grp", "n_inputs", "group_bytes", "day_min", "day_max")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(sm == Seq((0L, 3L, 110L, 1L, 3L), (1L, 1L, 200L, 4L, 4L),
      (3L, 2L, 20L, 5L, 6L)), s"summary $sm")
    assert(sm.sliding(2).forall {
      case Seq(a, b) => a._5 < b._4; case _ => true
    }, "group day ranges must not interleave")
    // the documented invariant, not isolation: sizes (10, 200) at target
    // 100 share grp 0 (start offsets 0 and 10 both precede the first
    // boundary) — the group overshoots by one input, by design
    val shared = Compaction.planSequential(
        Seq((1L, 10L), (2L, 200L)).toDF("day", "bytes"), "day", "bytes", 100L)
      .orderBy("day").select("day", "grp").as[(Long, Long)].collect().toSeq
    assert(shared == Seq((1L, 0L), (2L, 0L)), s"shared-group case: $shared")
    // scale shape: the prefix sum must ride the range-exchange engine,
    // never an unpartitioned window (Exchange SinglePartition would
    // collapse a billion-file inventory into one task)
    val phys = Compaction.planSequential(inv, "day", "bytes", 100L)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("SinglePartition"),
      s"planSequential must not plan a SinglePartition exchange:\n$phys")
    intercept[IllegalArgumentException] {
      Compaction.planSequential(inv, "day", "bytes", 0L)
    }
  }

  test("neymanSample: allocation tracks stratum stddev, rerun-stable") {
    import spark.implicits._
    import graft.operators.Sampling
    // A alternates 0/10, B alternates 0/20 (twice the stddev, same size),
    // C is constant: hand-computed rates are A: 60·(1/3)/100 = 0.2,
    // B: 60·(2/3)/100 = 0.4, C: 0 (zero variance — pure Neyman)
    val df = (1 to 100).map(i => ("A", i.toLong, if (i % 2 == 0) 10.0 else 0.0))
      .++((101 to 200).map(i => ("B", i.toLong, if (i % 2 == 0) 20.0 else 0.0)))
      .++((201 to 250).map(i => ("C", i.toLong, 7.0)))
      .toDF("stratum", "id", "value")
    val got = Sampling.neymanSample(df, "stratum", Seq("id"), "value",
      totalN = 60L)
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(!rows.exists(_._1 == "C")) // constant stratum contributes nothing
    // exact membership: the same md5 cutoff at the hand-computed rates
    def expect(s: String, rate: Double) =
      df.filter(col("stratum") === s)
        .filter(Sampling.uniformLong(Seq(col("id"))) <
          floor(lit(rate) * 4294967296.0 + 0.5))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == expect("A", 0.2) ++ expect("B", 0.4))
    // rerun-stable
    assert(Sampling.neymanSample(df, "stratum", Seq("id"), "value", 60L)
      .collect().map(_.getLong(1)).toSet == rows.map(_._2))
    intercept[IllegalArgumentException] {
      Sampling.neymanSample(df.filter(col("stratum") === "C"),
        "stratum", Seq("id"), "value", 10L).collect()
    }
  }

  test("sessionize: gap rule, 1-based per-key ids, same-second ties merge") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, 0L), (2L, 7L, 100L),     // session 1: gap 100 <= 1800
      (3L, 7L, 2000L),                  // gap 1900 > 1800 -> session 2
      (4L, 7L, 2000L),                  // same second: stays in session 2
      (5L, 9L, 50L))                    // other key: its own session 1
      .toDF("event_id", "user_id", "sec")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    val got = graft.operators.Sequence.sessionize(ev, "user_id", "ts",
      "event_id", gapSec = 1800L)
      .orderBy("key", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (7L, 1L, 0L, 100L, 2L), (7L, 2L, 2000L, 2000L, 2L),
      (9L, 1L, 50L, 50L, 1L)))
    // a gap of exactly gapSec does NOT split (rule is strictly greater)
    val edge = Seq((1L, 1L, 0L), (2L, 1L, 1800L))
      .toDF("event_id", "user_id", "sec")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    assert(graft.operators.Sequence.sessionize(edge, "user_id", "ts",
      "event_id", gapSec = 1800L).count() == 1)
  }

  test("prioritySample: exact k, brute-force rank agreement, zero/NULL weights excluded") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, (i % 7 + 1).toDouble))
      .toDF("id", "w")
      .unionByName(Seq((900L, 0.0), (901L, -1.0)).toDF("id", "w"))
      .unionByName(Seq((902L, Option.empty[Double])).toDF("id", "w"))
    val got = Sampling.prioritySample(df, Seq("id"), "w", 10)
      .select("id").as[Long].collect().toSeq
    assert(got.size == 10)
    assert(!got.exists(Seq(900L, 901L, 902L).contains(_)),
      "weightless rows must never be sampled")
    // brute-force: same draw/weight ranking computed independently
    val brute = df.filter(col("w") > 0)
      .select($"id", (Sampling.uniformLong(Seq(col("id"))).cast("double") /
        $"w").as("p"))
      .as[(Long, Double)].collect().sortBy(t => (t._2, t._1)).take(10)
      .map(_._1).toSeq
    assert(got.sorted == brute.sorted, "sample must equal the brute-force top-k")
    // rerun-stable
    val again = Sampling.prioritySample(df, Seq("id"), "w", 10)
      .select("id").as[Long].collect().toSeq
    assert(again.sorted == got.sorted)
  }

  test("importanceResample: binding bin keeps all, others thin at the exact md5 cutoff") {
    import spark.implicits._
    // a: 100 rows, b: 50 rows, equal targets -> b binds (50/1 < 100/1);
    // a thins at cutoff floor(2^32 * 50 / 100) = 2^31; z is not a target
    val df = ((1 to 100).map(i => ("a", i)) ++ (101 to 150).map(i => ("b", i))
      ++ (151 to 160).map(i => ("z", i))).toDF("bin", "id")
    val kept = Sampling.importanceResample(df, col("bin"), Seq("id"),
      Seq("a" -> 1L, "b" -> 1L))
    val counts = kept.groupBy("bin").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("b", 0L) == 50L, "binding bin must keep everything")
    assert(!counts.contains("z"), "non-target bins must drop")
    val gotA = kept.filter(col("bin") === "a").select("id").as[Int].collect().toSet
    val expectA = df.filter(col("bin") === "a")
      .filter(Sampling.uniformLong(Seq(col("id"))) < 2147483648L)
      .select("id").as[Int].collect().toSet
    assert(gotA == expectA, "kept set must be exactly the md5-cutoff subset")
    // a target bin the data lacks makes the match infeasible -> empty
    assert(Sampling.importanceResample(df, col("bin"), Seq("id"),
      Seq("a" -> 1L, "missing" -> 1L)).count() == 0L)
    // degenerate targets rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.importanceResample(df, col("bin"), Seq("id"),
        Seq("a" -> 1L, "a" -> 2L))
    }
    intercept[IllegalArgumentException] {
      Sampling.importanceResample(df, col("bin"), Seq("id"), Seq("a" -> 0L))
    }
  }

  test("coalesceIntervals: overlap, abutment, containment, gaps, zero length") {
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L),   // overlap -> [0,15)
      (1L, 15L, 20L),                 // abuts -> still [0,20)
      (1L, 2L, 4L),                   // contained: no effect
      (1L, 30L, 40L),                 // gap -> second span
      (1L, 35L, 35L),                 // zero-length inside: no split
      (2L, 100L, 101L)                // other key untouched
    ).toDF("k", "s", "e")
    val out = graft.operators.Sequence.coalesceIntervals(iv, "k", "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map((1L, 1L) -> (0L, 20L), (1L, 2L) -> (30L, 40L),
      (2L, 1L) -> (100L, 101L)), s"got $out")
    // invalid (end < start) and NULL intervals are dropped, not merged
    val bad = Seq((1L, Some(10L), Some(5L)), (1L, None, Some(5L)))
      .toDF("k", "s", "e")
    assert(graft.operators.Sequence.coalesceIntervals(bad, "k", "s", "e").isEmpty)
  }
}
