package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors, Vacuum}
import graft.sources.v2.{OptimisticCommit, RecordCompaction}

/** Multi-writer chaos over one record lake: nondeterministic REAL
  * interleavings (threads, no injected hooks) whose FINAL state is
  * deterministic by construction — concurrent appends of disjoint
  * ranges, then concurrent disjoint deletes racing a compaction loop.
  * Every conflict resolution path (CAS retry, vectored-input refusal,
  * applied-marker waits) runs under load; the verdict is the row
  * multiset, the commit log's consistency, and a debris-free vacuum. */
class LakeChaosSpec extends SparkSpec {
  import spark.implicits._

  private def read(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", "Score:number").load()

  /** A scan of an UN-SNAPSHOTTED table racing the compaction loop can
    * lose a planned file mid-scan (compaction deletes its inputs right
    * after its commit; only live snapshot manifests freeze files — the
    * snapshot tier exists precisely to pin scans, and every declared
    * query path reads through it or without concurrent compaction).
    * The operational answer for a raw-table reader is RE-PLAN, same as
    * every other optimistic-concurrency loser in this suite — so the
    * mid-race verdicts re-read on exactly that signature. Bounded: the
    * compactor loop quiesces in milliseconds, so a second plan racing
    * the same window twice in a row is astronomically unlikely (and
    * the retry cap keeps a real bug loud). */
  private def rereadOnCompactRace[T](body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: org.apache.spark.SparkException
            if attempt < 3 && Option(e.getMessage).exists(
              _.contains("FileNotFoundException")) =>
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  private def runChaos(dir: String, parquet: Boolean): Unit = {
    // seed so every thread finds the directory
    val seed = spark.range(0, 1).select(lit("seed").as("_record_id"),
        lit(-1.0).as("Score"))
      .write.format("graft-records").option("path", dir)
    (if (parquet) seed.option("dataFormat", "parquet") else seed)
      .mode("append").save()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def spawn(body: => Unit): Thread = {
      val t = new Thread(() => try body catch {
        case e: Throwable => errs.add(e)
      })
      t.start(); t
    }
    // phase 1: 4 appenders × 3 waves of disjoint ranges, racing one
    // compaction loop (appends commute; compaction merges behind them)
    val compacting = new java.util.concurrent.atomic.AtomicBoolean(true)
    def compactLoop(): Unit =
      while (compacting.get()) {
        try RecordCompaction.compact(spark, dir, targetBytes = 1L << 20)
        catch {
          // a DELETE winning the race leaves vectored inputs: the
          // documented answer is materialize-then-retry — for the loop,
          // skipping this round is the operational equivalent
          case e: IllegalArgumentException
            if e.getMessage.contains("materialize") => ()
        }
        Thread.sleep(20)
      }
    val compactor1 = spawn(compactLoop())
    val appenders = (0 until 4).map { a =>
      spawn {
        (0 until 3).foreach { wave =>
          val base = (a * 3 + wave) * 100L
          val w = spark.range(base, base + 100).select(
              concat(lit("r"), lpad($"id".cast("string"), 5, "0"))
                .as("_record_id"),
              $"id".cast("double").as("Score"))
            .coalesce(1).write.format("graft-records")
            .option("path", dir)
          (if (parquet) w.option("dataFormat", "parquet") else w)
            .mode("append").save()
        }
      }
    }
    appenders.foreach(_.join(300000))
    assert(errs.isEmpty, s"phase 1 failed: ${errs.peek()}")
    // the compactor loop is STILL RUNNING here by design — re-plan if
    // it reclaims a planned input mid-scan (see rereadOnCompactRace)
    assert(rereadOnCompactRace(read(dir).count()) == 1201L) // seed + 12 × 100

    // phase 2: 4 deleters with disjoint predicates race the compactor
    // (dv-vs-dv and dv-vs-compact conflicts both retry internally)
    val deleters = (0 until 4).map { k =>
      spawn {
        DeletionVectors.delete(spark, dir, "Score:number",
          pmod($"Score", lit(40.0)) === k * 10.0 && $"Score" >= 0.0)
      }
    }
    deleters.foreach(_.join(300000))
    compacting.set(false)
    compactor1.join(300000)
    assert(errs.isEmpty, s"phase 2 failed: ${errs.peek()}")

    // the deterministic verdict: every Score ≡ 0,10,20,30 (mod 40) gone
    val survivors = read(dir).filter($"Score" >= 0.0)
      .select($"Score").as[Double].collect().sorted.toSeq
    val expected = (0L until 1200L).map(_.toDouble)
      .filterNot(v => v % 40 == 0 || v % 40 == 10 || v % 40 == 20 ||
        v % 40 == 30)
    assert(survivors == expected,
      s"${survivors.length} survivors vs ${expected.length} expected")

    // commit-log consistency: contiguous versions, everything applied
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = OptimisticCommit.versions(fs, new Path(dir))
    assert(vs == (1L to vs.length.toLong), s"log gap: $vs")
    assert(OptimisticCommit.unapplied(fs, new Path(dir)).isEmpty)

    // quiesced vacuum leaves no debris and changes nothing
    val before = read(dir).count()
    val rep = Vacuum.clean(spark, dir)
    assert(rep.stagingDirsRemoved == 0 && rep.markersReplayed == 0,
      rep.toString)
    assert(read(dir).count() == before)
  }

  test("concurrent appenders + deleters + compactors converge to the " +
      "deterministic final state") {
    runChaos(Files.createTempDirectory("graft_chaos").toString + "/t",
      parquet = false)
  }

  test("the same chaos under the CONDITIONAL-PUT arbiter: the protocol " +
      "holds with no filesystem atomicity at all (object-store shape)") {
    // every claim routes through the store-arbitrated CAS double whose
    // payloads land with plain non-atomic writes — green here means the
    // commit protocol needs only conditional put from its store, which
    // is what an S3-class deployment plugs into this seam. (AtomicCreate
    // is NOT raced locally: its exclusivity is the NameNode's, a
    // property the local filesystem does not provide.)
    OptimisticCommit.CommitArbiter.set(
      Some(new OptimisticCommit.CommitArbiter.ConditionalPut))
    try runChaos(
      Files.createTempDirectory("graft_chaos_cp").toString + "/t",
      parquet = false)
    finally OptimisticCommit.CommitArbiter.set(None)
  }

  test("a conditional PUT that dies mid-upload claims nothing (the " +
      "store discards incomplete puts): the failed commit is invisible, " +
      "racing committers keep the log contiguous, vacuum sweeps the " +
      "dead writer's staging") {
    val dir = Files.createTempDirectory("graft_chaos_cpc").toString + "/t"
    spark.range(0, 300).select(
        concat(lit("r"), lpad($"id".cast("string"), 5, "0")).as("_record_id"),
        $"id".cast("double").as("Score"))
      .repartition(3)
      .write.format("graft-records").option("path", dir).mode("append").save()
    // Fault model: a single-shot conditional PUT is atomic at the
    // store — a writer that dies mid-upload materializes NOTHING and
    // holds NO claim (the store discards the incomplete put). The
    // injected arbiter surfaces that as a storage error on the dying
    // writer's claim; the slot stays free for whoever commits next.
    val inner = new OptimisticCommit.CommitArbiter.ConditionalPut
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    OptimisticCommit.CommitArbiter.set(Some(
      new OptimisticCommit.CommitArbiter {
        override def tryClaim(fs: org.apache.hadoop.fs.FileSystem,
            p: Path, bytes: Array[Byte]): Boolean = {
          if (Thread.currentThread().getName == "dying-writer" &&
              fired.compareAndSet(false, true))
            throw new java.io.IOException(
              "simulated writer death mid conditional PUT")
          inner.tryClaim(fs, p, bytes)
        }
      }))
    try {
      val death = new java.util.concurrent.atomic
        .AtomicReference[Throwable]()
      val dying = new Thread(() =>
        try DeletionVectors.delete(spark, dir, "Score:number",
          pmod($"Score", lit(3.0)) === 0.0)
        catch { case t: Throwable => death.set(t) }, "dying-writer")
      dying.start(); dying.join(120000)
      assert(fired.get(), "the fault must actually fire")
      assert(death.get() != null &&
        death.get().getMessage.contains("mid conditional PUT"),
        s"the dying writer must die on its claim: ${death.get()}")
      // a real process death runs no abort hooks — materialize the
      // staging debris a dead writer leaves (the documented
      // _staging-* shape the in-JVM exception path cleans up)
      val fs = new Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val dead = new Path(dir, "_staging-deadwriter")
      fs.mkdirs(dead)
      val o = fs.create(new Path(dead, "part-0.jsonl"), true)
      o.write("{\"_record_id\":\"zombie\"}\n".getBytes("UTF-8")); o.close()
      // racing committers proceed under the SAME arbiter: the slot the
      // dead writer aimed at is simply taken by the next commit
      DeletionVectors.delete(spark, dir, "Score:number",
        pmod($"Score", lit(100.0)) === 1.0)
      spark.range(1000, 1100).select(
          concat(lit("a"), lpad($"id".cast("string"), 5, "0"))
            .as("_record_id"),
          $"id".cast("double").as("Score"))
        .coalesce(1)
        .write.format("graft-records").option("path", dir)
        .mode("append").save()
      // the failed commit is INVISIBLE: its predicate never applied
      val scores = read(dir).select($"Score").as[Double].collect().toSet
      assert(scores.contains(0.0) && scores.contains(3.0),
        "the dead writer's delete must not have landed")
      assert(!scores.contains(1.0) && !scores.contains(101.0),
        "the healthy delete must have landed")
      assert(scores.contains(1000.0), "the healthy append must have landed")
      assert(read(dir).count() == 300L - 3L + 100L)
      // the log is DENSE: every version slot from 1..head holds a
      // complete, parsable entry (no burned slot, no torn payload)
      val (vs, _) = OptimisticCommit.logState(fs, new Path(dir))
      assert(vs == (1L to vs.length), s"log not contiguous: $vs")
      vs.foreach(v => OptimisticCommit.load(fs, new Path(dir), v))
      // vacuum sweeps the dead writer's staging and changes nothing
      val before = read(dir).count()
      val rep = Vacuum.clean(spark, dir)
      assert(rep.stagingDirsRemoved >= 1, rep.toString)
      assert(!fs.exists(dead))
      assert(read(dir).count() == before)
    } finally OptimisticCommit.CommitArbiter.set(None)
  }

  test("4x contention: 16 all-overlapping deleters + 2 compactors — " +
      "no writer exhausts its attempts, total retries stay bounded") {
    val dir = Files.createTempDirectory("graft_chaos4x").toString + "/t"
    spark.range(0, 1200).select(
        concat(lit("r"), lpad($"id".cast("string"), 5, "0")).as("_record_id"),
        $"id".cast("double").as("Score"))
      .repartition(6)
      .write.format("graft-records").option("path", dir).mode("append").save()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def spawn(body: => Unit): Thread = {
      val t = new Thread(() => try body catch {
        case e: Throwable => errs.add(e)
      })
      t.start(); t
    }
    val retriesBefore = OptimisticCommit.retriesObserved.get()
    val compacting = new java.util.concurrent.atomic.AtomicBoolean(true)
    val compactors = (0 until 2).map { _ =>
      spawn {
        while (compacting.get()) {
          try RecordCompaction.compact(spark, dir, targetBytes = 1L << 20)
          catch {
            case e: IllegalArgumentException
              if e.getMessage.contains("materialize") => ()
          }
          Thread.sleep(20)
        }
      }
    }
    // every deleter's predicate hits rows in EVERY file, so all 16 dv
    // commits pairwise conflict (worst case: strict serialization); the
    // jittered backoff must get each one through within MaxAttempts
    val deleters = (0 until 16).map { k =>
      spawn {
        DeletionVectors.delete(spark, dir, "Score:number",
          pmod($"Score", lit(80.0)) === k.toDouble)
      }
    }
    deleters.foreach(_.join(600000))
    compacting.set(false)
    compactors.foreach(_.join(300000))
    assert(errs.isEmpty, s"a writer failed (attempt exhaustion?): " +
      s"${errs.peek()}")
    val survivors = read(dir).select($"Score").as[Double]
      .collect().sorted.toSeq
    val expected = (0L until 1200L).map(_.toDouble).filterNot(_ % 80 < 16)
    assert(survivors == expected,
      s"${survivors.length} survivors vs ${expected.length} expected")
    val retries = OptimisticCommit.retriesObserved.get() - retriesBefore
    // bounded: 16 serialized writers re-planning against each other plus
    // compactor interference — well under attempt exhaustion territory
    assert(retries <= 16L * 20L, s"retry storm: $retries re-plans")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(OptimisticCommit.unapplied(fs, new Path(dir)).isEmpty)
  }

  test("the same chaos over the PARQUET tier (row-copy compaction, " +
      "ordinal DVs) converges identically") {
    runChaos(Files.createTempDirectory("graft_chaospq").toString + "/t",
      parquet = true)
  }

  test("view feed scans survive a concurrent maintainer at default " +
      "retention: pins defer reclaim for the in-flight scan (never a " +
      "FileNotFoundException); unpinned lag past retention refuses " +
      "loudly at resolve") {
    import graft.operators.{LakeSnapshots, LakeView}
    val base = Files.createTempDirectory("graft_feedrace").toString
    val (tbl, src, dst) = (s"$base/t", s"$base/src", s"$base/dst")
    val types = "K:number,X:number"
    def append(from: Long, until: Long): Unit = {
      spark.range(from, until).select(
          concat(lit("r"), lpad($"id".cast("string"), 6, "0"))
            .as("_record_id"),
          ($"id" % 97).cast("double").as("K"),
          $"id".cast("double").as("X"))
        .coalesce(1)
        .write.format("graft-records").option("path", tbl)
        .option("dataFormat", "parquet").mode("append").save()
      LakeSnapshots.commit(spark, tbl)
    }
    def refreshSrc() =
      LakeView.refreshAggregate(spark, tbl, types, src, Seq("K"), Seq("X"))
    append(0, 2000); refreshSrc() // gen 1
    append(2000, 3000); refreshSrc() // gen 2

    // 1) the deterministic race: resolve a feed over (1, 2], then let
    // the maintainer flip PAST default retention while the window is
    // pinned — the scan must still find its files
    val fed = LakeView.withPinnedGenerations(spark, src, Seq(1L, 2L)) {
      val feed = LakeView.changesBetween(spark, src, 1L, 2L)
      append(3000, 3200); refreshSrc() // gen 3
      append(3200, 3400); refreshSrc() // gen 4 — without pins, 1 and 2
      // would both be reclaimed by now (keepGenerations = 2)
      feed.count() // the scan that would otherwise FileNotFound
    }
    assert(fed > 0L, "the pinned feed scan must read its window")
    // pins released: the next flip reclaims the old generations, and
    // the same feed now refuses LOUDLY at resolve
    append(3400, 3600); refreshSrc() // gen 5 sweeps 1 and 2
    val e = intercept[IllegalStateException](
      LakeView.changesBetween(spark, src, 1L, 2L))
    assert(e.getMessage.contains("not live"), e.getMessage)

    // 2) racing maintainer + downstream consumer at default retention:
    // the consumer folds the source's feed while the maintainer flips —
    // every outcome must be a success or the loud lag refusal, never a
    // scan dying on reclaimed files
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintainer = new Thread(() => {
      try {
        var next = 4000L
        while (!stop.get()) {
          append(next, next + 200); next += 200
          refreshSrc()
        }
      } catch { case t: Throwable => errs.add(t); stop.set(true) }
    })
    var refusals = 0
    val consumer = new Thread(() => {
      try (0 until 5).foreach { _ =>
        try LakeView.refreshAggregateOverView(spark, src, dst,
          Seq("K"), Seq("sum_X"))
        catch {
          case e: IllegalStateException
            if e.getMessage.contains("not live") => refusals += 1
        }
        Thread.sleep(25)
      } catch { case t: Throwable => errs.add(t) }
    })
    maintainer.start(); consumer.start()
    consumer.join(180000); stop.set(true); maintainer.join(180000)
    assert(errs.isEmpty, s"feed race surfaced: ${errs}")
    // quiescent catch-up: either the consumer converges to the source's
    // current per-key sums, or (having lagged past retention mid-run)
    // it keeps refusing loudly — both contracts, nothing silent
    val converged =
      try {
        LakeView.refreshAggregateOverView(spark, src, dst,
          Seq("K"), Seq("sum_X"))
        true
      } catch {
        case e: IllegalStateException if e.getMessage.contains("not live") =>
          false
      }
    if (converged) {
      val want = LakeView.read(spark, src).select($"K", $"sum_X")
      val got = LakeView.read(spark, dst)
        .select($"K", $"sum_sum_X".as("sum_X"))
      val mism = got.join(want, Seq("K"), "full")
        .filter(!(got("sum_X") <=> want("sum_X")))
      assert(mism.limit(1).isEmpty,
        "consumer diverged from the source under the race")
    }
  }
}
