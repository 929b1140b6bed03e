package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

import graft.sources.v2.{DeletionVector, OptimisticCommit, ZoneMap}

/** Merge-on-read DELETE for the graft-records lake (the Delta/Iceberg
  * deletion-vector pattern): a predicate delete writes row positions to
  * per-file `_dv/` sidecars instead of rewriting data files, every scan
  * subtracts them ([[graft.sources.v2.DeletionVector]]), and a later
  * `materialize` folds the vectors into rewritten files. At 100 TB a
  * predicate touching 1% of rows in every file costs one tiny metadata
  * write per file here versus a full rewrite of the table the
  * copy-on-write path (StateStore.applyActions' anti-join) would pay.
  *
  * The row address (`_file`, `_pos`) comes from the source's hidden
  * metadata columns, so the delete scan itself enjoys the full pushdown
  * stack — zone-map file pruning and row-level filters mean only files
  * that CAN match are listed and only rows that DO match flow out.
  *
  * Concurrency is optimistic ([[graft.sources.v2.OptimisticCommit]]):
  * no lease — the mark stages merged vectors, CAS-commits a `dv` entry,
  * and retries the whole plan when a concurrent commit touched the same
  * files. Crash-safety follows the record-compaction marker protocol: a
  * rewritten file lands under a NEW name behind a `_dvmat-` marker;
  * [[recover]] replays interrupted swaps to completion.
  */
object DeletionVectors {

  /** One touched file's outcome: positions newly marked deleted. */
  final case class FileDelete(file: String, rowsMarked: Long)

  private val MarkerPrefix = "_dvmat-"

  /** DELETE FROM the lake at `path` WHERE `condition` — metadata-only:
    * marks matching rows' positions in per-file deletion vectors,
    * merging with any existing vector (re-deleting an already-deleted
    * row is impossible: it never reaches the scan). `fieldTypes` is the
    * table's reader option (the predicate references typed fields).
    * Sidecar writes run ON THE EXECUTORS, one task per touched file;
    * the returned summary is one row per touched file. */
  def delete(spark: SparkSession, path: String, fieldTypes: String,
      condition: Column): Seq[FileDelete] =
    mark(spark, path, () => spark.read.format("graft-records")
      .option("path", path).option("fieldTypes", fieldTypes).load()
      .where(condition))

  /** The SQL-DELETE entry ([[graft.sources.v2.RecordTable]] implements
    * `SupportsDelete` with this): the analyzer hands the WHERE clause as
    * source `Filter`s (pre-gated by `canDeleteWhere` = the pushdown
    * surface), which re-enter the same metadata-only path. An EMPTY
    * filter set is SQL's unconditional `DELETE FROM t` — every row
    * marks. */
  def deleteWhere(spark: SparkSession, path: String,
      fullSchema: org.apache.spark.sql.types.StructType,
      filters: Array[org.apache.spark.sql.sources.Filter],
      readOptions: Map[String, String] = Map.empty): Seq[FileDelete] =
    mark(spark, path, () => spark.read.format("graft-records")
      .schema(fullSchema).option("path", path).options(readOptions).load()
      .where(filters.map(filterToColumn).reduceOption(_ && _)
        .getOrElse(lit(true))))

  /** The optimistic two-phase mark ([[graft.sources.v2
    * .OptimisticCommit]]): the scan runs against the APPLIED head, the
    * merged vectors are STAGED invisibly on the executors
    * (`_staging-dv-<run>/<file>.json`, full post-merge content), one
    * CAS entry (`dv` = touched file names) claims them, and only then
    * do the sidecars flip in. A concurrent compaction/rewrite touching
    * the same files either loses the CAS (re-plans) or makes THIS
    * commit lose — the retry re-scans, finding the rows in their new
    * files. Staged content stays valid through the flip because the
    * committed entry shields the touched set. */
  private def mark(spark: SparkSession, path: String,
      matching: () => org.apache.spark.sql.DataFrame): Seq[FileDelete] =
    OptimisticCommit.withRetry(s"DELETE (deletion vectors) on $path") {
      markOnce(spark, path, matching())
    }

  private def markOnce(spark: SparkSession, path: String,
      matching: org.apache.spark.sql.DataFrame): Seq[FileDelete] = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val confProps = conf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
    val dir = new Path(path)
    val dirFs = dir.getFileSystem(conf)
    val readVersion = OptimisticCommit.head(dirFs, dir)
    OptimisticCommit.awaitApplied(dirFs, dir,
      OptimisticCommit.standardRecover(path, conf))
    val runId = java.util.UUID.randomUUID().toString.take(12)
    val stagingName = s"_staging-dv-$runId"
    val hits = matching
      .select(col("_file"), col("_pos"))
      .groupBy("_file")
      .agg(sort_array(collect_list(col("_pos"))).as("positions"))
      .as[(String, Array[Long])]
    // executor phase: merge against the current sidecar, stage the FULL
    // merged vector (idempotent flip content)
    val touched = hits.map { case (file, positions) =>
      val p = new Path(file)
      val fs = p.getFileSystem(confFrom(confProps))
      val merged = DeletionVector.load(fs, file) match {
        case Some(v) => DeletionVector.merge(v, positions)
        case None => DeletionVector.fromPositions(positions)
      }
      val staged = new Path(new Path(p.getParent, stagingName),
        p.getName + ".json")
      fs.mkdirs(staged.getParent)
      val out = fs.create(staged, true)
      try out.write(DeletionVector.render(merged)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      (p.getName, positions.length.toLong)
    }.collect().toSeq.sortBy(_._1)
    if (touched.isEmpty) return Seq.empty
    val v = try OptimisticCommit.commit(dirFs, dir, readVersion, op = "dv",
        dv = touched.map(_._1), staging = Some(stagingName))
      catch { case e: OptimisticCommit.CommitConflictException =>
        dirFs.delete(new Path(dir, stagingName), true) // abandon the stage
        throw e
      }
    OptimisticCommit.replayDvStaging(dirFs, dir, stagingName) // the flip
    OptimisticCommit.markApplied(dirFs, dir, v)
    touched.map((FileDelete.apply _).tupled)
  }

  /** Source `Filter` -> `Column`, for the shapes `canDeleteWhere`
    * admits (the RecordFilterEval.pushable surface). */
  private def filterToColumn(
      f: org.apache.spark.sql.sources.Filter): Column = {
    import org.apache.spark.sql.sources._
    f match {
      case _: AlwaysTrue => lit(true)
      case _: AlwaysFalse => lit(false)
      case EqualTo(a, v) => col(a) === lit(v)
      case EqualNullSafe(a, v) => col(a) <=> lit(v)
      case GreaterThan(a, v) => col(a) > lit(v)
      case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
      case LessThan(a, v) => col(a) < lit(v)
      case LessThanOrEqual(a, v) => col(a) <= lit(v)
      case In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
      case IsNull(a) => col(a).isNull
      case IsNotNull(a) => col(a).isNotNull
      case Not(i) => !filterToColumn(i)
      case And(l, r) => filterToColumn(l) && filterToColumn(r)
      case Or(l, r) => filterToColumn(l) || filterToColumn(r)
      case other => throw new IllegalArgumentException(
        s"DELETE condition $other is outside the supported surface " +
          "(canDeleteWhere should have refused it)")
    }
  }

  /** Fold every deletion vector into a rewritten data file and drop the
    * sidecars — the compaction-prep step ([[graft.sources.v2
    * .RecordCompaction.compact]] refuses vectored inputs, since byte
    * concatenation would shift the ordinals the vectors index). Each
    * vectored file is rewritten WITHOUT its deleted lines on the
    * executors under a new `dvmat-` name; the swap (marker → rename →
    * delete old file + both sidecars → drop marker) runs on the driver.
    * The rewritten file gets NO zone sidecar: post-delete min/max are
    * unknown without a typed rescan, and absent stats are merely
    * unpruned, never wrong (the next compaction rebuilds nothing — zone
    * absence is advisory throughout). Returns files rewritten. */
  def materialize(spark: SparkSession, path: String): Int =
    OptimisticCommit.withRetry(s"dv-materialize of $path") {
      materializeOnce(spark, path)
    }

  private def materializeOnce(spark: SparkSession, path: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val confProps = conf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    recover(path, conf)
    val readVersion = OptimisticCommit.head(fs, dir)
    OptimisticCommit.awaitApplied(fs, dir,
      OptimisticCommit.standardRecover(path, conf))
    val dvDir = new Path(dir, DeletionVector.Dir)
    if (!fs.exists(dvDir)) return 0
    val vectored = fs.listStatus(dvDir).filter(_.isFile)
      .map(_.getPath.getName.stripSuffix(".json")).sorted.toSeq
      .filter { n =>
        val live = fs.exists(new Path(dir, n))
        // a sidecar whose data file is gone is an orphan of a completed
        // swap — drop it instead of rewriting nothing
        if (!live) fs.delete(DeletionVector.sidecar(dir, n), false)
        live
      }
    // materialize DELETES the vectored originals — a file a live
    // snapshot manifest references is FROZEN and skipped (its vector
    // stays a live sidecar; it materializes after Snapshots.expire),
    // keeping time travel and changelog reads working around
    // maintenance, matching compaction's exclusion semantics
    val snapRefs = graft.sources.v2.Snapshots.referencedFiles(fs, dir)
    val candidates = vectored.filterNot(snapRefs.contains)
    if (candidates.isEmpty) return 0
    val runId = java.util.UUID.randomUUID().toString.take(12)
    val stagingName = s"_staging-dvmat-$runId"

    // executor phase: rewrite each candidate file without its deleted
    // rows — line-filtered for JSONL, row-copied for parquet (the
    // columnar tier shares the whole DV/materialize protocol; only the
    // byte-level rewrite differs)
    def ext(name: String): String =
      if (name.endsWith(graft.sources.v2.ParquetRecords.Extension))
        graft.sources.v2.ParquetRecords.Extension
      else ".jsonl"
    spark.sparkContext
      .parallelize(candidates.zipWithIndex, math.min(candidates.length, 64))
      .foreach { case (name, k) =>
        val c = confFrom(confProps)
        val d = new Path(path)
        val f = d.getFileSystem(c)
        val src = new Path(d, name)
        val dv = DeletionVector.load(f, src.toString).getOrElse(
          throw new java.io.IOException(s"vector vanished mid-run: $name"))
        val staged = new Path(new Path(path, stagingName), s"f$k${ext(name)}")
        f.mkdirs(staged.getParent)
        if (ext(name) == graft.sources.v2.ParquetRecords.Extension) {
          graft.sources.v2.ParquetRecords.rewriteWithoutDeleted(c, src, staged, dv)
        } else {
          val out = f.create(staged, true)
          val in = f.open(src)
          try {
            scala.io.Source.fromInputStream(in, "UTF-8").getLines()
              .zipWithIndex.foreach { case (l, i) =>
                if (!dv.contains(i.toLong))
                  out.write((l + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
              }
          } finally { in.close(); out.close() }
        }
      }

    // CAS one entry for the whole run before any swap (shields the
    // vectored inputs from concurrent writers; a lost validation
    // abandons the stage and re-plans)
    val newNames = candidates.zipWithIndex.map { case (n, k) =>
      s"dvmat-$runId-f$k${ext(n)}" }
    val committed = try OptimisticCommit.commit(fs, dir, readVersion,
        op = "dvmat", added = newNames, removed = candidates,
        dv = candidates, staging = Some(stagingName))
      catch { case e: OptimisticCommit.CommitConflictException =>
        fs.delete(new Path(path, stagingName), true)
        throw e
      }

    // driver phase: swap each rewrite in behind a marker (idempotent
    // replay in recover): rename staged -> new name, then delete the old
    // file and BOTH its sidecars, then drop the marker
    candidates.zipWithIndex.foreach { case (name, k) =>
      val newName = s"dvmat-$runId-f$k${ext(name)}"
      val staged = new Path(new Path(path, stagingName), s"f$k${ext(name)}")
      writeMarker(fs, dir, s"$runId-f$k", staged.toString, newName, name)
      if (!fs.rename(staged, new Path(dir, newName)))
        throw new java.io.IOException(
          s"dv-materialize rename failed: $staged -> $newName")
      fs.delete(DeletionVector.sidecar(dir, name), false)
      fs.delete(ZoneMap.sidecar(dir, name), false)
      fs.delete(graft.sources.v2.BloomSidecar.sidecar(dir, name), false)
      fs.delete(new Path(dir, name), false)
      fs.delete(markerPath(dir, s"$runId-f$k"), false)
    }
    fs.delete(new Path(path, stagingName), true)
    OptimisticCommit.markApplied(fs, dir, committed)
    candidates.length
  }

  private def markerPath(dir: Path, id: String): Path =
    new Path(dir, s"$MarkerPrefix$id.json")

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      id: String, staging: String, newFile: String, old: String): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("staging", staging)
    root.put("new", newFile)
    root.put("old", old)
    val out = fs.create(markerPath(dir, id), true)
    out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    out.close()
  }

  /** Replay pending materialize markers to completion (idempotent). */
  def recover(path: String, conf: org.apache.hadoop.conf.Configuration): Int = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return 0
    val markers = fs.listStatus(dir).filter(_.isFile)
      .map(_.getPath).filter(_.getName.startsWith(MarkerPrefix))
    markers.foreach { mp =>
      val in = fs.open(mp)
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      in.close()
      val root = new ObjectMapper().readTree(bytes.toString("UTF-8"))
      val staged = new Path(root.get("staging").asText())
      val newFile = new Path(dir, root.get("new").asText())
      val old = root.get("old").asText()
      if (!fs.exists(newFile) && fs.exists(staged)) {
        if (!fs.rename(staged, newFile))
          throw new java.io.IOException(s"dv recovery rename failed: $staged")
      }
      if (fs.exists(newFile)) {
        fs.delete(DeletionVector.sidecar(dir, old), false)
        fs.delete(ZoneMap.sidecar(dir, old), false)
        fs.delete(graft.sources.v2.BloomSidecar.sidecar(dir, old), false)
        fs.delete(new Path(dir, old), false)
      } else fs.delete(staged, false) // never committed; old is intact
      fs.delete(mp, false)
    }
    markers.length
  }

  private def confFrom(props: Map[String, String]) = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }
}
