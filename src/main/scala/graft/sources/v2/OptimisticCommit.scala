package graft.sources.v2

import org.apache.hadoop.fs.{FileSystem, Path}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Optimistic multi-writer concurrency for the record lake — the
  * Iceberg/Delta commit-protocol pattern re-expressed over this lake's
  * sidecar layout. Replaces the blocking single-writer discipline on
  * every lake mutation path: writers never hold a lease; instead each
  * mutation CAS-appends an ENTRY to `_commits/c<k>.json` (atomic
  * create-exclusive — the filesystem arbitrates the race) naming the
  * files it adds, removes, and mutates deletion vectors for. Validation
  * at commit time rejects an entry whose touched set overlaps anything
  * committed since the writer planned; the writer then RETRIES the whole
  * operation against fresh state.
  *
  * Conflict rules (the Iceberg semantics, scoped to file granularity):
  *  - an APPEND (touches nothing, adds new uniquely-named files)
  *    commutes with everything — two concurrent appenders both land,
  *    serialized only on the tiny version-slot CAS, never on data work;
  *  - COMPACTION / DV-DELETE / DV-MATERIALIZE / COPY-ON-WRITE conflict
  *    exactly when their touched file sets overlap: `mine.(removed ∪
  *    dv)` intersecting `theirs.(added ∪ removed ∪ dv)` aborts the
  *    commit with [[CommitConflictException]] and the caller re-plans.
  *
  * Two-phase shape per destructive op:
  *  1. read `head` (the readVersion), [[awaitApplied]] so the directory
  *     reflects every committed entry, plan, stage invisible work;
  *  2. [[commit]] (validate + CAS) — losing the validation means
  *     re-running step 1 against the new state;
  *  3. apply the directory flips (each op's existing idempotent marker
  *     protocol), then [[markApplied]].
  * Between 2 and 3 the entry SHIELDS the flips: any competing writer
  * whose set overlaps validates against the committed entry and backs
  * off, so nobody else can touch those files mid-flip. A writer that
  * crashes between 2 and 3 leaves an unapplied entry; the next writer's
  * [[awaitApplied]] replays it to completion via [[standardRecover]]
  * (each flip protocol is replayable by anyone) once it turns stale.
  *
  * Appends declare AFTER flipping (their renames are invisible-to-
  * visible and conflict-free), so readers never depend on the log; the
  * log exists for writers and is safe to [[expire]] behind retention.
  *
  * Reference basis: the reference is a single Python process with no
  * concurrent writers (lib/AirtableToDatastore.py sync loop); this is
  * the ambition layer a shared 100 TB lake needs — concurrent ingest,
  * compaction, and retention without a serializing lease. */
private[graft] object OptimisticCommit {

  val Dir = "_commits"

  /** Give up after this many whole-operation re-plans. File-overlapping
    * writers serialize one-commit-per-round, so the attempts a tail
    * writer needs grows with the contender count — 20 survives ~16-way
    * all-touch-the-same-files contention (the chaos spec's worst case)
    * with the jittered backoff in [[withRetry]] spreading the herd. */
  val MaxAttempts = 20

  /** An unapplied entry older than this is presumed crashed and is
    * replayed by the next writer. Flips are metadata-only (renames +
    * sidecar writes), so seconds of headroom is already generous. */
  val DefaultStaleMs = 60000L

  final case class Entry(version: Long, op: String, tsMs: Long,
      added: Seq[String], removed: Seq[String], dv: Seq[String],
      staging: Option[String]) {
    def touched: Set[String] = (removed ++ dv).toSet
    def changed: Set[String] = (added ++ removed ++ dv).toSet
  }

  final class CommitConflictException(msg: String)
      extends RuntimeException(msg)

  /** The storage-specific atomic put-if-absent the whole protocol rests
    * on — the Delta `LogStore` seam. An implementation must make `p`
    * appear EXCLUSIVELY (exactly one concurrent claimant wins) and,
    * ideally, CONTENT-COMPLETE (no observable empty/partial window).
    * File:/HDFS impls ship below; an object store without atomic
    * create-if-absent (S3 standalone) plugs a conditional-put or
    * DynamoDB-arbitered impl in through [[CommitArbiter.set]] instead
    * of rewriting the protocol. */
  trait CommitArbiter {
    /** Claim `p` with `bytes`: true = claimed, false = slot taken.
      * Must never leave a HALF-claimed slot on success or failure. */
    def tryClaim(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean
  }

  object CommitArbiter {
    /** `file:` — hard-link publish: content lands fully in a temp file,
      * then `link(tmp, slot)` makes it visible; link(2) is atomic AND
      * fails with EEXIST when the slot is taken, so the claim is both
      * exclusive and content-complete — no empty-slot crash window for
      * `load` to wedge on. (A bare `createNewFile` claim would leave a
      * permanently-empty `c<v>.json` if the committer died before its
      * content write, blocking every later writer.) */
    object LocalLink extends CommitArbiter {
      override def tryClaim(fs: FileSystem, p: Path,
          bytes: Array[Byte]): Boolean = {
        val slot = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.createDirectories(slot.getParent)
        val tmp = slot.resolveSibling(
          s".${slot.getFileName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
        java.nio.file.Files.write(tmp, bytes)
        try {
          java.nio.file.Files.createLink(slot, tmp)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        } finally java.nio.file.Files.deleteIfExists(tmp)
      }
    }

    /** HDFS (and stores with atomic create-if-absent): the NameNode
      * arbitrates `create(overwrite=false)`; content streams after the
      * claim, so readers retry the brief in-flight window ([[load]]). */
    object AtomicCreate extends CommitArbiter {
      override def tryClaim(fs: FileSystem, p: Path,
          bytes: Array[Byte]): Boolean =
        try {
          val out = fs.create(p, false)
          try out.write(bytes) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
    }

    /** Object-store conditional put (S3 `If-None-Match: *`, GCS
      * `ifGenerationMatch=0`, Azure `If-None-Match`): the STORE
      * arbitrates the claim, not the filesystem. This implementation is
      * the protocol-complete local double — arbitration lives in a
      * process-wide CAS table standing in for the store's strong
      * conditional PUT, and the payload then lands with a PLAIN
      * non-atomic write, deliberately the weakest possible visibility
      * (a reader can observe an empty or partial slot — exactly the
      * in-flight window [[load]] already retries, and what a real
      * multipart PUT shows a list-then-get reader). Green chaos over
      * this arbiter proves the commit protocol needs only conditional
      * put from its store, never filesystem rename/link atomicity — the
      * property that makes the lake S3-deployable behind this seam.
      * Pre-existing durable slots (a previous process's claims) refuse
      * before the table is consulted, so a fresh arbiter instance never
      * double-claims persisted state. */
    final class ConditionalPut extends CommitArbiter {
      private val table =
        java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      override def tryClaim(fs: FileSystem, p: Path,
          bytes: Array[Byte]): Boolean = {
        if (fs.exists(p)) return false // durable slot taken
        if (!table.add(p.toUri.toString)) return false // lost the CAS
        // claimed: land the payload with no atomicity at all (two
        // writes + flush widen the observable-partial window on
        // purpose); a failed upload releases the claim whole
        try {
          val out = fs.create(p, true)
          try {
            val half = bytes.length / 2
            out.write(bytes, 0, half)
            out.hflush()
            out.write(bytes, half, bytes.length - half)
          } finally out.close()
          true
        } catch {
          case e: Throwable =>
            try fs.delete(p, false) catch { case _: Exception => () }
            table.remove(p.toUri.toString)
            throw e
        }
      }
    }

    @volatile private var overrideArbiter: Option[CommitArbiter] = None

    /** Deployment/test seam: route every claim through a custom
      * arbiter (e.g. a conditional-put impl for an object store).
      * `None` restores scheme dispatch. */
    def set(a: Option[CommitArbiter]): Unit = overrideArbiter = a

    def forScheme(fs: FileSystem): CommitArbiter =
      overrideArbiter.getOrElse(
        if (fs.getScheme == "file") LocalLink else AtomicCreate)
  }

  /** Atomic put-if-absent via the scheme's [[CommitArbiter]]. */
  private[v2] def createExclusive(fs: FileSystem, p: Path,
      bytes: Array[Byte]): Boolean =
    CommitArbiter.forScheme(fs).tryClaim(fs, p, bytes)

  private def entryPath(dir: Path, v: Long): Path =
    new Path(new Path(dir, Dir), s"c$v.json")
  private def appliedPath(dir: Path, v: Long): Path =
    new Path(new Path(dir, Dir), s"c$v.applied")

  /** (committed versions ascending, applied subset) from ONE directory
    * listing — the planners poll this on every read/commit, so the
    * per-entry `exists()` probes a naive scan would issue are hoisted
    * into a single `listStatus`. */
  def logState(fs: FileSystem, dir: Path): (Seq[Long], Set[Long]) = {
    val d = new Path(dir, Dir)
    if (!fs.exists(d)) return (Seq.empty, Set.empty)
    val names = fs.listStatus(d).filter(_.isFile).map(_.getPath.getName)
    val vs = names.collect {
      case n if n.startsWith("c") && n.endsWith(".json") =>
        n.stripPrefix("c").stripSuffix(".json").toLong
    }.sorted.toSeq
    val applied = names.collect {
      case n if n.startsWith("c") && n.endsWith(".applied") =>
        n.stripPrefix("c").stripSuffix(".applied").toLong
    }.toSet
    (vs, applied)
  }

  def versions(fs: FileSystem, dir: Path): Seq[Long] =
    logState(fs, dir)._1

  def head(fs: FileSystem, dir: Path): Long =
    versions(fs, dir).lastOption.getOrElse(0L)

  /** An entry becomes VISIBLE (create-exclusive claims the version
    * slot) before its content lands — a concurrent reader can observe
    * the in-flight window. Readers therefore retry a briefly-unparsable
    * entry; one that stays unparsable is real corruption and throws. */
  def load(fs: FileSystem, dir: Path, v: Long): Entry = {
    val deadline = System.currentTimeMillis + 10000L
    while (true) {
      try {
        val root = new ObjectMapper().readTree(readFully(fs, entryPath(dir, v)))
        def arr(k: String): Seq[String] =
          root.get(k).elements().asScala.map(_.asText()).toSeq
        return Entry(root.get("version").asLong(), root.get("op").asText(),
          root.get("ts").asLong(), arr("added"), arr("removed"), arr("dv"),
          if (root.get("staging").isNull) None
          else Some(root.get("staging").asText()))
      } catch {
        case scala.util.control.NonFatal(e) =>
          if (System.currentTimeMillis > deadline)
            throw new IllegalStateException(
              s"commit entry c$v.json at $dir stayed unparsable past the " +
                s"in-flight window — corrupted log: ${e.getMessage}", e)
          Thread.sleep(10)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Entries in `(after, head]`, ascending — failing LOUDLY if any
    * version in the window was expired (a readVersion predating retained
    * history cannot be validated and must re-plan from scratch). */
  def entriesAfter(fs: FileSystem, dir: Path, after: Long): Seq[Entry] = {
    val vs = versions(fs, dir).filter(_ > after)
    vs.headOption.foreach(first => require(first == after + 1,
      s"commit log at $dir retains c$first.. but validation needs " +
        s"c${after + 1}.. — readVersion $after predates retention " +
        "(raise Vacuum's commit-log keepLast, or re-plan)"))
    require(vs == (vs.headOption.getOrElse(0L) to vs.lastOption.getOrElse(-1L)),
      s"commit log at $dir has a gap in ${vs.mkString(",")}")
    vs.map(load(fs, dir, _))
  }

  /** Validate-and-CAS: every entry committed after `readVersion` must be
    * DISJOINT from this op's touched set, then the next version slot is
    * claimed by atomic create-exclusive. A slot collision (someone else
    * won the number) revalidates and retries the CAS internally; an
    * OVERLAP throws [[CommitConflictException]] for the caller to
    * re-plan the whole operation. Returns the committed version. */
  /** Test seam: invoked with the op name before validation — specs use
    * it to interleave a competing commit deterministically between an
    * operation's plan and its CAS (reproducing a real race without
    * sleeps). No-op in production. */
  @volatile private[graft] var beforeCasHook: String => Unit = _ => ()

  def commit(fs: FileSystem, dir: Path, readVersion: Long, op: String,
      added: Seq[String] = Seq.empty, removed: Seq[String] = Seq.empty,
      dv: Seq[String] = Seq.empty, staging: Option[String] = None,
      reads: Set[String] = Set.empty): Long = {
    beforeCasHook(op)
    val mine = (removed ++ dv).toSet
    fs.mkdirs(new Path(dir, Dir))
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 1000, s"commit CAS at $dir livelocked") // unreachable backstop
      val h = head(fs, dir)
      if (mine.nonEmpty || reads.nonEmpty) {
        // two validation axes: write-write (my touched files vs anything
        // the window changed) and read stability (`reads` — files whose
        // OBSERVED state this commit depends on, e.g. a snapshot's
        // listing — vs the window's destructive touches; pure additions
        // never destabilize a read set)
        val clash = entriesAfter(fs, dir, readVersion)
          .map(e => e -> (e.changed.intersect(mine) ++
            e.touched.intersect(reads))).filter(_._2.nonEmpty)
        if (clash.nonEmpty) {
          val (e, files) = clash.head
          throw new CommitConflictException(
            s"$op at $dir conflicts with concurrent ${e.op} (c${e.version})" +
              s" on ${files.take(3).mkString(", ")}" +
              s"${if (files.size > 3) s" (+${files.size - 3} more)" else ""}" +
              " — re-planning against current state")
        }
      }
      val v = h + 1
      val mapper = new ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("version", v)
      root.put("op", op)
      root.put("ts", System.currentTimeMillis)
      Seq("added" -> added, "removed" -> removed, "dv" -> dv).foreach {
        case (k, xs) =>
          val a = root.putArray(k); xs.foreach(a.add)
      }
      staging match {
        case Some(s) => root.put("staging", s)
        case None => root.putNull("staging")
      }
      val claimed = createExclusive(fs, entryPath(dir, v),
        mapper.writeValueAsString(root).getBytes("UTF-8"))
      if (claimed) return v
      // lost the slot: loop — revalidates the (now longer) window
    }
    throw new IllegalStateException("unreachable")
  }

  def markApplied(fs: FileSystem, dir: Path, v: Long): Unit =
    fs.create(appliedPath(dir, v), true).close()

  def isApplied(fs: FileSystem, dir: Path, v: Long): Boolean =
    fs.exists(appliedPath(dir, v))

  /** Entry versions committed but not yet applied (flips possibly in
    * flight or crashed). */
  def unapplied(fs: FileSystem, dir: Path): Seq[Long] = {
    val (vs, applied) = logState(fs, dir)
    vs.filterNot(applied.contains)
  }

  /** Block until every committed entry's flips are visible: a LIVE
    * owner marks its entry applied within moments (flips are metadata
    * ops); an entry still unapplied past `staleMs` is presumed crashed
    * and replayed here via `recover` (every flip protocol is
    * idempotent and replayable by anyone). Mutation planners call this
    * so the directory they list reflects the full committed history. */
  def awaitApplied(fs: FileSystem, dir: Path, recover: Entry => Unit,
      staleMs: Long = DefaultStaleMs): Unit =
    unapplied(fs, dir).foreach { v =>
      val e = load(fs, dir, v)
      while (!isApplied(fs, dir, v) &&
          System.currentTimeMillis - e.tsMs <= staleMs)
        Thread.sleep(25)
      if (!isApplied(fs, dir, v)) {
        recover(e)
        markApplied(fs, dir, v)
      }
    }

  /** The lake's flip-replay dispatch, by op. Ops that declare AFTER
    * flipping (append, epoch, truncate) need nothing; marker-protocol
    * ops replay through their own `recover`; a `dv` entry replays its
    * staged sidecars (content is the FULL merged vector, so the copy is
    * idempotent at any crash point). */
  def standardRecover(path: String,
      conf: org.apache.hadoop.conf.Configuration): Entry => Unit = { e =>
    e.op match {
      case "compact" => RecordCompaction.recover(path, conf)
      case "dvmat" => graft.operators.DeletionVectors.recover(path, conf)
      case "replace" => RecordReplaceDataWrite.recover(path, conf)
      case "dv" => e.staging.foreach(s => replayDvStaging(
        new Path(path).getFileSystem(conf), new Path(path), s))
      case _ => () // append / epoch / truncate: flip-before-declare
    }
  }

  /** Flip a `dv` entry's staged sidecars into `_dv/` (overwrite — the
    * staged content is the post-merge vector) and drop the staging dir.
    * Idempotent: replayable from any crash point; a missing staging dir
    * means the flip already completed. */
  def replayDvStaging(fs: FileSystem, dir: Path, stagingName: String): Unit = {
    val st = new Path(dir, new Path(stagingName).getName)
    if (!fs.exists(st)) return
    fs.listStatus(st).filter(_.isFile).foreach { s =>
      val name = s.getPath.getName.stripSuffix(".json")
      val content = readFully(fs, s.getPath)
      val out = fs.create(DeletionVector.sidecar(dir, name), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    fs.delete(st, true)
  }

  /** Retire all but the newest `keepLast` APPLIED entries (an unapplied
    * entry is never expired — it may still need replay). Returns how
    * many were dropped. Validation windows reaching past retention fail
    * loudly in [[entriesAfter]] and re-plan. */
  def expire(fs: FileSystem, dir: Path, keepLast: Int): Int = {
    require(keepLast >= 0, s"keepLast $keepLast must be >= 0")
    val vs = versions(fs, dir)
    val cut = vs.dropRight(keepLast).filter(isApplied(fs, dir, _))
    // only a contiguous prefix may go — a retained entry below a dropped
    // one would make the gap look like corruption
    val prefix = cut.zip(vs).takeWhile { case (c, v) => c == v }.map(_._1)
    prefix.foreach { v =>
      fs.delete(entryPath(dir, v), false)
      fs.delete(appliedPath(dir, v), false)
    }
    prefix.length
  }

  /** Staging directory names referenced by committed-but-unapplied
    * entries — debris sweeps must NOT touch these (their flips are
    * pending replay). */
  def protectedStaging(fs: FileSystem, dir: Path): Set[String] =
    unapplied(fs, dir).map(load(fs, dir, _))
      .flatMap(_.staging).map(s => new Path(s).getName).toSet

  /** Conflicted re-plans observed process-wide — contention telemetry
    * (the chaos specs bound it; a deployment graphs it). */
  val retriesObserved = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run `body` (the whole plan→stage→commit→flip cycle), re-planning on
    * [[CommitConflictException]] up to [[MaxAttempts]] times with
    * jittered exponential backoff between attempts — without it a herd
    * of conflicted writers re-plans in lockstep and burns its whole
    * attempt budget on plan→stage→abort cycles. */
  def withRetry[T](what: String, maxAttempts: Int = MaxAttempts)(body: => T): T = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return body
      catch {
        case e: CommitConflictException =>
          if (attempt >= maxAttempts) throw new IllegalStateException(
            s"$what gave up after $maxAttempts conflicted attempts — " +
              s"the table is under sustained contention: ${e.getMessage}", e)
          retriesObserved.incrementAndGet()
          // full jitter over an exponentially-growing window, capped:
          // desynchronizes the herd while keeping p50 wait small
          val cap = math.min(2000L, 25L << math.min(attempt, 6))
          Thread.sleep(1L + java.util.concurrent.ThreadLocalRandom
            .current().nextLong(cap))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }
}
