package graft.sources.v2

import org.apache.hadoop.fs.{FileSystem, Path}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Snapshot manifests + time travel for the record lake: `commit`
  * freezes the CURRENT table state — the data-file set AND each file's
  * deletion-vector state — into `_snapshots/v<k>.json`; the
  * `versionAsOf` read option replays exactly that state, so a scan of
  * v1 still sees rows a later merge-on-read DELETE removed (the
  * manifest inlines the DV json, which is range-encoded and tiny).
  * The Iceberg/Delta snapshot-isolation pattern at the granularity this
  * lake's single-writer discipline needs: appends after a snapshot are
  * invisible to it (new file names), deletes after it are reversed by
  * the inlined DV state, and the destructive paths (compaction,
  * dv-materialize) REFUSE to touch files any live manifest references —
  * `expire` retires old manifests first, exactly vacuum's contract.
  *
  * Reference basis: the reference keeps per-run version stamps on rows
  * (lib/UpdateStrategies.py version fields) — this is the same idea
  * lifted from row stamps to whole-table states. */
private[graft] object Snapshots {

  val Dir = "_snapshots"

  /** One-entry-per-file JSON stays driver-resident at commit/load — the
    * Iceberg manifest-list answer bounds it: past `ShardSize` files the
    * version manifest becomes a LIST of shard files (each ≤ ShardSize
    * entries), and past `MaxFiles` the commit refuses LOUDLY (at that
    * point the table needs compaction, not a bigger manifest). */
  val ShardSize = 100000
  val MaxFiles = 10000000

  final case class Manifest(version: Long,
      files: Seq[(String, Option[String])]) // (fileName, dvJson at commit)

  private def manifestPath(tableDir: Path, v: Long): Path =
    new Path(new Path(tableDir, Dir), s"v$v.json")

  /** High-water mark surviving full expiry: snapshot versions are NEVER
    * reused (a reused id would silently alias two different table
    * states for time-travel and changelog consumers). */
  private def hwmPath(tableDir: Path): Path =
    new Path(new Path(tableDir, Dir), "_hwm")

  private def hwm(fs: FileSystem, tableDir: Path): Long = {
    val p = hwmPath(tableDir)
    if (!fs.exists(p)) 0L else readFully(fs, p).trim.toLong
  }

  private def raiseHwm(fs: FileSystem, tableDir: Path, v: Long): Unit =
    if (v > hwm(fs, tableDir)) {
      val out = fs.create(hwmPath(tableDir), true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    }

  def versions(fs: FileSystem, tableDir: Path): Seq[Long] = {
    val d = new Path(tableDir, Dir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).filter(_.isFile).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && !n.contains("-") &&
          n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong
      }.sorted.toSeq
  }

  /** The newest version whose manifest is STILL PRESENT — the
    * resolution head-consumers should use. [[commit]] WITHDRAWS an
    * already-visible manifest when its log entry loses read-set
    * validation (the number burns; hwm forbids reuse), so a raw
    * `versions(...).last` taken in that window can name a manifest that
    * vanishes before it is loaded. Re-listing is the whole cure: a
    * withdrawn version disappears from the listing, and the conflicting
    * committer's retry lands a higher number. The loop is bounded —
    * withdrawal is a rare conflict path, never a steady state. */
  def headVersion(fs: FileSystem, tableDir: Path): Option[Long] = {
    val deadline = System.currentTimeMillis + 10000L
    while (true) {
      versions(fs, tableDir).lastOption match {
        case None => return None
        case Some(v) =>
          if (fs.exists(manifestPath(tableDir, v))) return Some(v)
          if (System.currentTimeMillis > deadline)
            throw new IllegalStateException(
              s"snapshot head of $tableDir kept vanishing for 10s — " +
                "withdrawal is a conflict path, not a steady state")
          Thread.sleep(5)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def renderFiles(fs: FileSystem, dir: Path, mapper: ObjectMapper,
      arr: com.fasterxml.jackson.databind.node.ArrayNode,
      files: Seq[String]): Unit =
    files.foreach { f =>
      val name = new Path(f).getName
      val e = arr.addObject()
      e.put("name", name)
      val dvp = DeletionVector.sidecar(dir, name)
      if (fs.exists(dvp)) e.put("dv", readFully(fs, dvp))
      else e.putNull("dv")
    }

  /** Freeze the current state as the next version; returns it.
    *
    * Participates in the optimistic commit protocol on BOTH ends:
    * the file set comes from a log-consistent listing
    * ([[RecordScan.consistentDataFiles]] — a raw listing taken
    * mid-compaction-flip would freeze the merged file AND its inputs,
    * silently duplicating rows for time travel/CDC), and after the
    * manifest lands an `op=snapshot` entry commits to the SAME log with
    * the listing as its read set — a destructive entry that slipped in
    * between listing and manifest CAS invalidates the manifest (it may
    * pin files the flip deleted), so the manifest is withdrawn and the
    * whole cycle retries. Conversely the snapshot entry's `added` set
    * makes any in-flight destructive writer that planned BEFORE this
    * snapshot conflict at ITS commit, re-plan, and see the new manifest
    * in its refusal set — closing the plan-time `referencedFiles` /
    * delete-time write skew from both sides.
    *
    * Concurrent committers race on an atomic create-exclusive of the
    * version manifest (CAS) — the loser recomputes the number and
    * retries; both snapshots land, ordered by who won each slot. */
  def commit(fs: FileSystem, path: String,
      conf: org.apache.hadoop.conf.Configuration,
      shardSize: Int = ShardSize): Long = {
    val dir = new Path(path)
    val mapper = new ObjectMapper()
    fs.mkdirs(new Path(dir, Dir))
    while (true) {
      val (listed, logHead) = RecordScan.consistentDataFiles(path, conf)
      val files = listed.sorted.toSeq
      require(files.length <= MaxFiles,
        s"snapshot commit on $path covers ${files.length} data files, over " +
          s"MaxFiles=$MaxFiles — compact the table before snapshotting " +
          "(a manifest this size is a table-layout problem, not a " +
          "metadata-format problem)")
      val root = mapper.createObjectNode()
      val shardNames =
        if (files.length <= shardSize) {
          renderFiles(fs, dir, mapper, root.putArray("files"), files)
          Seq.empty
        } else {
          // shard names carry a token so two racing committers at the
          // same v never overwrite each other's shards
          val token = java.util.UUID.randomUUID().toString.take(8)
          val names = files.grouped(shardSize).zipWithIndex.map {
            case (chunk, i) =>
              val sname = s"s-$token-$i.json"
              val sroot = mapper.createObjectNode()
              renderFiles(fs, dir, mapper, sroot.putArray("files"), chunk)
              val out = fs.create(new Path(new Path(dir, Dir), sname), true)
              try out.write(mapper.writeValueAsString(sroot).getBytes("UTF-8"))
              finally out.close()
              sname
          }.toSeq
          val arr = root.putArray("shards")
          names.foreach(arr.add)
          names
        }
      def dropShards(): Unit = shardNames.foreach(n =>
        fs.delete(new Path(new Path(dir, Dir), n), false))

      // inner CAS loop: the rendered state is listing-dependent only,
      // so losing a version SLOT (another snapshot won the number)
      // re-claims under the next number without re-listing
      var v = 0L
      var claimed = false
      while (!claimed) {
        v = math.max(versions(fs, dir).lastOption.getOrElse(0L),
          hwm(fs, dir)) + 1L
        root.put("version", v)
        claimed = OptimisticCommit.createExclusive(fs, manifestPath(dir, v),
          mapper.writeValueAsString(root).getBytes("UTF-8"))
      }
      // serialize against destructive flips: conflict = some entry in
      // (logHead, now] touched a listed file — the manifest may pin
      // files that flip deleted, so withdraw it (version number burns;
      // hwm forbids reuse) and re-list
      val fileNames = files.map(f => new Path(f).getName)
      try {
        val entry = OptimisticCommit.commit(fs, dir, logHead,
          op = "snapshot", added = fileNames, reads = fileNames.toSet)
        OptimisticCommit.markApplied(fs, dir, entry)
        return v
      } catch {
        case _: OptimisticCommit.CommitConflictException =>
          raiseHwm(fs, dir, v)
          fs.delete(manifestPath(dir, v), false)
          dropShards()
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def fileEntries(fs: FileSystem, dir: Path,
      root: com.fasterxml.jackson.databind.JsonNode)
      : Iterator[(String, Option[String])] = {
    val inline = Option(root.get("files")).map(_.elements().asScala)
      .getOrElse(Iterator.empty)
    val sharded = Option(root.get("shards")).map(_.elements().asScala)
      .getOrElse(Iterator.empty).flatMap { s =>
        new ObjectMapper()
          .readTree(readFully(fs, new Path(new Path(dir, Dir), s.asText())))
          .get("files").elements().asScala
      }
    (inline ++ sharded).map { e =>
      (e.get("name").asText(),
        if (e.get("dv").isNull) None else Some(e.get("dv").asText()))
    }
  }

  /** Load manifest v, failing LOUDLY when absent or when a referenced
    * data file no longer exists (expired out from under the snapshot —
    * only possible if the refusal guards were bypassed). A version that
    * was WITHDRAWN by [[commit]]'s conflict path (listed, then its
    * manifest vanished, or its manifest resolved but pins files the
    * conflicting flip deleted) reports itself as such: the caller
    * resolved a head that never became durable and must re-resolve
    * ([[headVersion]] does). */
  def load(fs: FileSystem, path: String, v: Long): Manifest = {
    val dir = new Path(path)
    val p = manifestPath(dir, v)
    require(fs.exists(p),
      s"versionAsOf $v: no snapshot manifest at $p (existing: " +
        s"${versions(fs, dir).mkString(", ")})" +
        (if (v <= hwm(fs, dir))
          " — the version number is burnt (hwm): it was withdrawn by a " +
            "conflicting snapshot commit or expired; re-resolve the head"
        else ""))
    val root = parseManifest(fs, p)
    val files = fileEntries(fs, dir, root).map { case (name, dv) =>
      if (!fs.exists(new Path(dir, name))) {
        if (!fs.exists(p)) throw new IllegalStateException(
          s"versionAsOf $v was WITHDRAWN mid-read by a conflicting " +
            "snapshot commit (its manifest is gone) — re-resolve the " +
            "head and retry")
        throw new IllegalArgumentException(
          s"versionAsOf $v references $name which no longer exists — " +
            "the snapshot was expired out from under this read")
      }
      (name, dv)
    }.toSeq
    Manifest(root.get("version").asLong(), files)
  }

  /** Every file name referenced by any live manifest (the destructive
    * paths' refusal set). */
  def referencedFiles(fs: FileSystem, tableDir: Path): Set[String] = {
    val d = new Path(tableDir, Dir)
    if (!fs.exists(d)) return Set.empty
    versions(fs, tableDir).flatMap { v =>
      val root = parseManifest(fs, manifestPath(tableDir, v))
      fileEntries(fs, tableDir, root).map(_._1)
    }.toSet
  }

  /** Retire all but the newest `keepLast` manifests (and their shards);
    * returns how many were dropped. Files themselves are reclaimed by
    * the next compaction/materialize (they refuse only LIVE
    * references). */
  def expire(fs: FileSystem, tableDir: Path, keepLast: Int): Int = {
    require(keepLast >= 0, s"keepLast $keepLast must be >= 0")
    val vs = versions(fs, tableDir)
    val drop = vs.dropRight(keepLast)
    drop.lastOption.foreach(raiseHwm(fs, tableDir, _)) // never reuse ids
    drop.foreach { v =>
      val root = parseManifest(fs, manifestPath(tableDir, v))
      Option(root.get("shards")).foreach(_.elements().asScala.foreach(s =>
        fs.delete(new Path(new Path(tableDir, Dir), s.asText()), false)))
      fs.delete(manifestPath(tableDir, v), false)
    }
    drop.length
  }

  /** A manifest is VISIBLE (create-exclusive claims the version) before
    * its JSON lands; readers retry the in-flight window, then fail. */
  private def parseManifest(fs: FileSystem, p: Path)
      : com.fasterxml.jackson.databind.JsonNode = {
    val deadline = System.currentTimeMillis + 10000L
    while (true) {
      try {
        val root = new ObjectMapper().readTree(readFully(fs, p))
        if (root != null && root.get("version") != null) return root
      } catch { case scala.util.control.NonFatal(_) => () }
      if (System.currentTimeMillis > deadline)
        throw new IllegalStateException(
          s"snapshot manifest $p stayed unparsable past the in-flight " +
            "window — corrupted manifest")
      Thread.sleep(10)
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
