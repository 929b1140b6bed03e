package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.DeletionVectors
import graft.sources.v2.{DeletionVector, OptimisticCommit, RecordCompaction, Snapshots}

/** Optimistic multi-writer commits for the record lake: concurrent
  * appenders land without serializing, destructive ops conflict on
  * overlapping file sets and recheck-and-retry, crashed commits replay,
  * and the sharded snapshot manifests stay exact. */
class OptimisticCommitSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkLake(nFiles: Int = 2): String = {
    val dir = Files.createTempDirectory("graft_occ").toString + "/t"
    (0 until nFiles).foreach { b =>
      spark.range(b * 10L, (b + 1) * 10L).select(
          concat(lit("r"), lpad($"id".cast("string"), 3, "0")).as("_record_id"),
          $"id".cast("double").as("Score"))
        .coalesce(1)
        .write.format("graft-records").option("path", dir).mode("append").save()
    }
    dir
  }

  private def read(dir: String) = spark.read.format("graft-records")
    .option("path", dir).option("fieldTypes", "Score:number").load()

  private def logOps(dir: String): Seq[String] = {
    val f = fs(dir); val d = new Path(dir)
    OptimisticCommit.versions(f, d).map(OptimisticCommit.load(f, d, _).op)
  }

  test("two concurrent appenders both land — no lease, no lost write") {
    val dir = Files.createTempDirectory("graft_occ").toString + "/t"
    // pre-create so neither thread races the mkdirs
    spark.range(0, 1).select(lit("seed").as("_record_id"),
        lit(0.0).as("Score"))
      .write.format("graft-records").option("path", dir).mode("append").save()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(100L, 200L).map { base =>
      new Thread(() => {
        try {
          barrier.await() // both writers in flight together
          spark.range(base, base + 10).select(
              concat(lit("r"), $"id".cast("string")).as("_record_id"),
              $"id".cast("double").as("Score"))
            .coalesce(1).write.format("graft-records")
            .option("path", dir).mode("append").save()
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent append failed: ${errs.peek()}")
    assert(read(dir).count() == 21L) // seed + 10 + 10
    val ops = logOps(dir)
    assert(ops == Seq("append", "append", "append"), s"log: $ops")
    // appends never conflict: every entry applied, versions contiguous
    assert(OptimisticCommit.unapplied(fs(dir), new Path(dir)).isEmpty)
  }

  test("compaction-vs-DELETE race: the loser detects the conflict and " +
      "retries against the compacted state") {
    val dir = mkLake()
    // deterministic interleaving through the REAL code paths: the
    // DELETE plans and stages its vectors, and just before its CAS a
    // compaction commits underneath it (the hook fires inside
    // OptimisticCommit.commit). The DELETE must lose validation
    // (dv ∩ removed ≠ ∅), abandon its stage, re-plan against the
    // merged file, and land.
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    OptimisticCommit.beforeCasHook = { op =>
      if (op == "dv" && fired.getAndIncrement() == 0) {
        val merged = RecordCompaction.compact(spark, dir, targetBytes = 1 << 20)
        assert(merged == 1, "the interleaved compaction must merge both files")
      }
    }
    try {
      val out = DeletionVectors.delete(spark, dir, "Score:number",
        col("Score") >= 15.0)
      assert(out.map(_.rowsMarked).sum == 5L)
      // the retry landed on the COMPACTED file, not the originals
      assert(out.forall(_.file.startsWith("compact-")), s"touched: $out")
    } finally OptimisticCommit.beforeCasHook = _ => ()
    assert(fired.get() >= 2, "the dv commit must have been attempted twice")
    assert(read(dir).count() == 15L)
    assert(read(dir).agg(sum($"Score")).as[Double].head() == (0 until 15).sum.toDouble)
    val ops = logOps(dir)
    assert(ops == Seq("append", "append", "compact", "dv"), s"log: $ops")
    // no debris: the abandoned first-attempt staging is gone
    val staging = fs(dir).listStatus(new Path(dir)).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("_staging"))
    assert(staging.isEmpty, s"staging debris: ${staging.toSeq}")
  }

  test("a commit crashed between CAS and flip is replayed by the next " +
      "writer's awaitApplied") {
    val dir = mkLake()
    val f = fs(dir); val d = new Path(dir)
    // simulate the crash: stage a merged vector for file f0 and commit
    // the entry, but never flip (owner died)
    val dataFile = f.listStatus(d).filter(_.isFile)
      .map(_.getPath.getName).filterNot(_.startsWith("_")).sorted.head
    val stagingName = "_staging-dv-crashed"
    val staged = new Path(new Path(d, stagingName), dataFile + ".json")
    f.mkdirs(staged.getParent)
    val out = f.create(staged, true)
    out.write("""{"rows_deleted":2,"ranges":[[0,1]]}""".getBytes("UTF-8"))
    out.close()
    val v = OptimisticCommit.commit(f, d, OptimisticCommit.head(f, d),
      op = "dv", dv = Seq(dataFile), staging = Some(stagingName))
    assert(OptimisticCommit.unapplied(f, d) == Seq(v))
    // next writer replays it (stale immediately with staleMs=0)
    OptimisticCommit.awaitApplied(f, d, OptimisticCommit.standardRecover(
      dir, spark.sparkContext.hadoopConfiguration), staleMs = 0L)
    assert(OptimisticCommit.unapplied(f, d).isEmpty)
    assert(f.exists(DeletionVector.sidecar(d, dataFile)), "flip replayed")
    assert(!f.exists(new Path(d, stagingName)), "staging consumed")
    assert(read(dir).count() == 18L) // ids 0,1 now deleted
  }

  test("commit-log retention: expire keeps unapplied entries and the " +
      "validation window fails LOUDLY past retention") {
    val dir = mkLake(nFiles = 4)
    val f = fs(dir); val d = new Path(dir)
    assert(OptimisticCommit.expire(f, d, keepLast = 2) == 2)
    assert(OptimisticCommit.versions(f, d) == Seq(3L, 4L))
    // a readVersion predating retention cannot validate
    val e = intercept[IllegalArgumentException] {
      OptimisticCommit.commit(f, d, readVersion = 0L, op = "compact",
        removed = Seq("x.jsonl"))
    }
    assert(e.getMessage.contains("predates retention"), e.getMessage)
    // appends (empty touched set) skip validation and still commit
    OptimisticCommit.commit(f, d, readVersion = 0L, op = "append",
      added = Seq("new.jsonl"))
  }

  test("sharded snapshot manifests: commit splits past shardSize, load " +
      "and time travel see every file, expire drops the shards") {
    val dir = mkLake(nFiles = 5)
    val f = fs(dir); val d = new Path(dir)
    val v = Snapshots.commit(f, dir,
      spark.sparkContext.hadoopConfiguration, shardSize = 2)
    val shards = f.listStatus(new Path(d, Snapshots.Dir))
      .map(_.getPath.getName).filter(_.startsWith("s-")).sorted
    assert(shards.length == 3, s"5 files / shardSize 2: ${shards.toSeq}") // 2+2+1
    assert(Snapshots.load(f, dir, v).files.length == 5)
    assert(Snapshots.referencedFiles(f, d).size == 5)
    // time travel through the sharded manifest is exact
    val asOf = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").option("versionAsOf", v.toString)
      .load()
    assert(asOf.count() == 50L)
    // a later delete is reversed by the inlined DV state
    DeletionVectors.delete(spark, dir, "Score:number", col("Score") < 10.0)
    assert(read(dir).count() == 40L)
    assert(spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number").option("versionAsOf", v.toString)
      .load().count() == 50L)
    assert(Snapshots.expire(f, d, keepLast = 0) == 1)
    assert(f.listStatus(new Path(d, Snapshots.Dir))
      .map(_.getPath.getName).forall(_.startsWith("_")), // only the hwm marker
      "shards must expire with their manifest")
  }

  test("the local claim is exclusive AND content-complete: N racing " +
      "claimants -> one winner, no empty-slot crash window") {
    val dir = Files.createTempDirectory("graft_occ_arb").toString
    val f = fs(dir)
    val slot = new Path(dir, "c1.json")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val ts = (0 until 8).map { i =>
      new Thread(() => {
        barrier.await()
        val payload = s"""{"writer":$i}""" * 200 // big enough to tear
        if (OptimisticCommit.CommitArbiter.LocalLink.tryClaim(
            f, slot, payload.getBytes("UTF-8")))
          wins.incrementAndGet()
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(30000))
    assert(wins.get() == 1, s"${wins.get()} claimants won the same slot")
    // the visible slot is COMPLETE (hard-link publish: content lands
    // before the name) and from exactly one writer
    val content = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(slot.toUri.getPath)), "UTF-8")
    val writers = """"writer":(\d)""".r.findAllMatchIn(content)
      .map(_.group(1)).toSet
    assert(writers.size == 1 && content.length == s"""{"writer":0}""".length * 200,
      s"torn content: writers=$writers len=${content.length}")
    // losers leave no temp debris
    val debris = f.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.endsWith(".tmp"))
    assert(debris.isEmpty, s"tmp debris: ${debris.toSeq}")
  }

  test("conditional-put arbiter: N racing claimants -> one winner; a " +
      "pre-existing durable slot refuses a fresh arbiter instance") {
    val dir = Files.createTempDirectory("graft_occ_cp").toString
    val f = fs(dir)
    val arb = new OptimisticCommit.CommitArbiter.ConditionalPut
    val slot = new Path(dir, "c1.json")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val ts = (0 until 8).map { i =>
      new Thread(() => {
        barrier.await()
        if (arb.tryClaim(f, slot, (s"""{"writer":$i}""" * 200).getBytes("UTF-8")))
          wins.incrementAndGet()
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(30000))
    assert(wins.get() == 1, s"${wins.get()} claimants won the same slot")
    // after all claimants finish, the winning payload is complete and
    // from exactly one writer (DURING the write a partial is observable
    // — that is the in-flight window load() retries, by design)
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(slot.toUri.getPath)), "UTF-8")
    val writers = """"writer":(\d)""".r.findAllMatchIn(content)
      .map(_.group(1)).toSet
    assert(writers.size == 1 &&
      content.length == s"""{"writer":0}""".length * 200,
      s"torn content: writers=$writers len=${content.length}")
    // a FRESH arbiter (simulated process restart) must not re-claim the
    // durable slot its table never saw
    val fresh = new OptimisticCommit.CommitArbiter.ConditionalPut
    assert(!fresh.tryClaim(f, slot, "usurper".getBytes("UTF-8")))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(slot.toUri.getPath)), "UTF-8") == content)
  }

  test("the full conflict protocol carries over the conditional-put " +
      "arbiter: delete + interleaved compaction + snapshot withdraw") {
    OptimisticCommit.CommitArbiter.set(
      Some(new OptimisticCommit.CommitArbiter.ConditionalPut))
    try {
      val dir = mkLake()
      val f = fs(dir); val d = new Path(dir)
      val conf = spark.sparkContext.hadoopConfiguration
      // snapshot racing a destructive flip: read-set skew detected, the
      // manifest WITHDRAWN (a plain delete under this arbiter), retried
      val fired = new java.util.concurrent.atomic.AtomicInteger(0)
      OptimisticCommit.beforeCasHook = { op =>
        if (op == "snapshot" && fired.getAndIncrement() == 0) {
          DeletionVectors.delete(spark, dir, "Score:number",
            col("Score") < 5.0)
        }
      }
      val v = try Snapshots.commit(f, dir, conf)
        finally { OptimisticCommit.beforeCasHook = _ => () }
      assert(fired.get() >= 2, "the snapshot entry must have retried")
      assert(spark.read.format("graft-records").option("path", dir)
        .option("fieldTypes", "Score:number")
        .option("versionAsOf", v.toString).load().count() == 15L)
      // and a compaction lands on top, all through conditional puts
      assert(graft.sources.v2.Snapshots.expire(f, d, keepLast = 0) == 1)
      assert(DeletionVectors.materialize(spark, dir) >= 1)
      assert(RecordCompaction.compact(spark, dir, targetBytes = 1 << 20) == 1)
      assert(read(dir).count() == 15L)
      assert(OptimisticCommit.unapplied(f, d).isEmpty)
    } finally OptimisticCommit.CommitArbiter.set(None)
  }

  test("vacuum sweeps STALE arbiter temp debris from _commits, keeps " +
      "fresh ones (a live claimant links within milliseconds)") {
    val dir = mkLake()
    val f = fs(dir)
    val logDir = new Path(dir, OptimisticCommit.Dir)
    val stale = new Path(logDir, ".c9.json.deadbeef.tmp")
    val out = f.create(stale, true); out.write("{}".getBytes); out.close()
    f.setTimes(stale,
      System.currentTimeMillis - OptimisticCommit.DefaultStaleMs - 1000L, -1)
    val freshTmp = new Path(logDir, ".c10.json.cafebabe.tmp")
    val out2 = f.create(freshTmp, true); out2.write("{}".getBytes); out2.close()
    val rep = graft.operators.Vacuum.clean(spark, dir)
    assert(rep.staleTmpSwept == 1, rep.toString)
    assert(!f.exists(stale) && f.exists(freshTmp))
    assert(read(dir).count() == 20L)
  }

  test("the commit arbiter is a seam: a custom arbiter (conditional-put " +
      "stand-in) carries the whole protocol") {
    val dir = mkLake()
    val claims = new java.util.concurrent.atomic.AtomicInteger(0)
    val counting = new OptimisticCommit.CommitArbiter {
      override def tryClaim(f: org.apache.hadoop.fs.FileSystem,
          p: Path, bytes: Array[Byte]): Boolean = {
        claims.incrementAndGet()
        OptimisticCommit.CommitArbiter.LocalLink.tryClaim(f, p, bytes)
      }
    }
    OptimisticCommit.CommitArbiter.set(Some(counting))
    try {
      DeletionVectors.delete(spark, dir, "Score:number", col("Score") < 3.0)
      assert(read(dir).count() == 17L)
    } finally OptimisticCommit.CommitArbiter.set(None)
    assert(claims.get() >= 1, "the custom arbiter never saw a claim")
  }

  test("snapshot commit racing a destructive flip: the read-set skew is " +
      "detected, the manifest is withdrawn, re-listed, and retried") {
    val dir = mkLake() // 2 files
    val f = fs(dir); val d = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    // interleave a DELETE between the snapshot's consistent listing
    // (+ manifest CAS) and its log-entry commit: the entry's read-set
    // validation must see the dv entry touching listed files, withdraw
    // the manifest, and re-render from the post-delete state — as if
    // the snapshot serialized AFTER the delete
    OptimisticCommit.beforeCasHook = { op =>
      if (op == "snapshot" && fired.getAndIncrement() == 0) {
        val out = DeletionVectors.delete(spark, dir, "Score:number",
          col("Score") < 5.0)
        assert(out.map(_.rowsMarked).sum == 5L)
      }
    }
    val v = try Snapshots.commit(f, dir, conf)
      finally { OptimisticCommit.beforeCasHook = _ => () }
    assert(fired.get() >= 2, "the snapshot entry must have retried")
    val m = Snapshots.load(f, dir, v)
    assert(m.files.forall { case (n, _) => f.exists(new Path(d, n)) },
      s"dangling manifest: ${m.files}")
    // the frozen state is post-delete, not the torn pre-delete listing
    assert(spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", "Score:number")
      .option("versionAsOf", v.toString).load().count() == 15L)
    // the withdrawn version number is burnt, never reused
    assert(Snapshots.versions(f, d) == Seq(v) && v >= 2L,
      s"first manifest attempt must burn its number: v=$v, " +
        s"versions=${Snapshots.versions(f, d)}")
  }

  test("a destructive commit planned BEFORE a snapshot landed conflicts " +
      "at ITS commit (the other half of the write skew)") {
    val dir = mkLake()
    val f = fs(dir); val d = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val planTimeHead = OptimisticCommit.head(f, d) // "compaction plans here"
    val dataFile = f.listStatus(d).filter(_.isFile)
      .map(_.getPath.getName).filterNot(_.startsWith("_")).sorted.head
    Snapshots.commit(f, dir, conf) // snapshot lands after the plan
    val e = intercept[OptimisticCommit.CommitConflictException] {
      OptimisticCommit.commit(f, d, planTimeHead, op = "compact",
        added = Seq("compact-x.jsonl"), removed = Seq(dataFile))
    }
    assert(e.getMessage.contains("snapshot"), e.getMessage)
  }

  test("racing snapshot committers: both land on distinct versions") {
    val dir = mkLake()
    val conf = spark.sparkContext.hadoopConfiguration
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (1 to 2).map(_ => new Thread(() => {
      try { barrier.await(); got.add(Snapshots.commit(fs(dir), dir, conf)) }
      catch { case t: Throwable => errs.add(t) }
    }))
    ts.foreach(_.start()); ts.foreach(_.join(60000))
    assert(errs.isEmpty, s"racing snapshot commit failed: ${errs.peek()}")
    assert(got.toArray.toSet == Set(1L, 2L), s"versions: ${got.toArray.toSeq}")
  }
}
