package graft.sources.v2

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Small-file compaction for `graft-records` directories — the lake
  * maintenance a streaming sink makes necessary (every epoch lands a
  * file; a year of 1-minute triggers is half a million files whose
  * LISTING costs more than their reading). JSONL is concatenable, so
  * compaction here is pure byte-level merge: no parse, no Spark
  * shuffle, and — because the zone-map sidecars are unioniable
  * ([[ZoneMap.merge]]) — the merged file's stats derive from METADATA
  * alone. File skipping keeps working across compactions with zero
  * re-scan (coarser, since merged ranges union — the documented
  * trade: fewer files to open vs tighter zones to skip).
  *
  * Crash safety, without a table format: each group commits through a
  * marker protocol under the single-writer discipline the sinks
  * already assume:
  *
  *  1. the merged file is staged (invisible: `_staging-compact-*`);
  *  2. a marker `_compact-<id>.json` records {staging, new, olds};
  *  3. merged sidecar written, staged file renamed in — from here the
  *     records exist TWICE (the one documented duplication window);
  *  4. old files + their sidecars deleted; marker deleted.
  *
  * [[recover]] replays any marker to completion idempotently: new file
  * visible → finish the deletes; only staged → finish rename then
  * deletes; neither → the group never committed and every old is still
  * in place (deletes happen strictly after the rename), so the marker
  * and staging are dropped. Raw-scan readers must tolerate the window
  * in 3-4 (or be quiesced, as for any maintenance job); record-level
  * consumers ([[graft.Pipeline]] strategies) are pk-idempotent and
  * unaffected. Runs the grouping through
  * [[graft.operators.Compaction.planSequential]] — the no-driver-bound
  * prefix-sum planner — then caps the COLLECTED plan loudly.
  */
object RecordCompaction {

  /** Driver-side plan-collection bound (the Stats.scala discipline):
    * one maintenance call compacts at most this many files. */
  val MaxFilesPerCall: Int = 100000

  private val MarkerPrefix = "_compact-"

  /** Compact `path`, packing adjacent (by name) data files into groups
    * of ~`targetBytes`. Returns the number of groups merged (groups of
    * one file are left untouched).
    *
    * Concurrency: optimistic ([[OptimisticCommit]]) — the plan is made
    * against the applied head, the whole batch CAS-commits one entry
    * (removed=olds, added=merged) before any flip, and a conflicting
    * concurrent commit (a DV DELETE landing on an input, another
    * compaction overlapping) re-plans from scratch. A DELETE that wins
    * the race surfaces on the retry as the vectored-inputs refusal —
    * run DeletionVectors.materialize first, as ever. */
  def compact(spark: SparkSession, path: String, targetBytes: Long): Int =
    OptimisticCommit.withRetry(s"compaction of $path") {
      compactOnce(spark, path, targetBytes)
    }

  private def compactOnce(spark: SparkSession, path: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val confProps = conf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    recover(path, conf) // finish any crashed run first
    val readVersion = OptimisticCommit.head(fs, dir)
    OptimisticCommit.awaitApplied(fs, dir,
      OptimisticCommit.standardRecover(path, conf))
    // orphaned staging from a CRASHED run is debris, but sweeping it
    // here is not this writer's call: a CONCURRENT compactor's
    // pre-commit staging is indistinguishable from an orphan (its entry
    // doesn't exist yet, so protectedStaging can't shield it), and the
    // 16-writer chaos run caught this sweep deleting a live peer's
    // stage mid-write. Debris collection belongs to Vacuum.clean, which
    // quiesces first — a writer only ever touches ITS OWN staging.

    val listed = fs.listStatus(dir).filter(_.isFile)
      .filterNot(st => st.getPath.getName.startsWith("_") ||
        st.getPath.getName.startsWith("."))
      .map(st => (st.getPath.getName, st.getLen)).sortBy(_._1)
    require(listed.length <= MaxFilesPerCall,
      s"${listed.length} files exceed MaxFilesPerCall=$MaxFilesPerCall — " +
        "compact in batches (the collected plan is driver-resident)")
    // compaction DELETES its inputs — a file a live snapshot manifest
    // references is FROZEN and simply excluded from the plan (it
    // compacts after Snapshots.expire retires the manifest); this keeps
    // time travel AND changelog reads (LakeChangelog) working while the
    // table compacts around them
    val snapRefs = Snapshots.referencedFiles(fs, dir)
    val unpinned = listed.filterNot { case (n, _) => snapRefs.contains(n) }
    // merging re-bases row ordinals either way (line concat or row
    // copy), which would desync deletion vectors: refuse loudly while
    // any candidate carries one — materialize first, as ever
    val dvd = unpinned.map(_._1).filter(n =>
      fs.exists(DeletionVector.sidecar(dir, n)))
    require(dvd.isEmpty,
      s"graft-records compaction: ${dvd.length} input file(s) carry " +
        s"deletion vectors (${dvd.take(3).mkString(", ")}…) — run " +
        "DeletionVectors.materialize first (it rewrites those files " +
        "without the deleted rows and drops the sidecars)")
    // two families: JSONL byte-concats; parquet merges by ROW COPY, and
    // only among files with IDENTICAL footer schemas (schema evolution
    // legitimately mixes schemas — cross-schema merge stays unplanned)
    val jsonlFiles = unpinned
      .filterNot(_._1.endsWith(ParquetRecords.Extension))
    val pqFamilies = unpinned
      .filter(_._1.endsWith(ParquetRecords.Extension))
      .groupBy { case (n, _) =>
        ParquetRecords.schemaSignature(conf, new Path(dir, n)) }
      .toSeq.sortBy(_._1).map(_._2)

    import spark.implicits._
    def planFamily(fam: Seq[(String, Long)]): Seq[Seq[String]] =
      if (fam.length < 2) Seq.empty
      else graft.operators.Compaction.planSequential(
          fam.toDF("name", "bytes"), "name", "bytes", targetBytes)
        .select("name", "grp").as[(String, Long)].collect()
        .groupBy(_._2).values
        .map(_.map(_._1).sorted.toSeq).filter(_.length >= 2).toSeq.sortBy(_.head)
    val groups: Seq[(Seq[String], String)] =
      planFamily(jsonlFiles.toSeq).map(_ -> ".jsonl") ++
        pqFamilies.flatMap(f => planFamily(f.toSeq))
          .map(_ -> ParquetRecords.Extension)
    if (groups.isEmpty) return 0

    val runId = java.util.UUID.randomUUID().toString.take(12)
    val stagingName = s"_staging-compact-$runId"
    // executor phase: merge each group into its staged file (byte
    // concat for JSONL, row copy for parquet) and union the inputs'
    // zones (metadata only — format-agnostic); a group with ANY
    // statless input yields no merged sidecar (advisory contract)
    val staged: Array[(Int, Option[String])] = spark.sparkContext
      .parallelize(groups.zipWithIndex.map { case ((names, ext), g) =>
        (g, names, ext) }, math.min(groups.length, 64))
      .map { case (g, names, ext) =>
        val c = RecordSource.confFrom(confProps)
        val d = new Path(path)
        val f = d.getFileSystem(c)
        val stagedFile = new Path(new Path(path, stagingName), s"g$g$ext")
        f.mkdirs(stagedFile.getParent)
        if (ext == ParquetRecords.Extension) {
          ParquetRecords.mergeFiles(c, names.map(new Path(d, _)), stagedFile)
        } else {
          val out = f.create(stagedFile, true)
          val buf = new Array[Byte](1 << 20)
          names.foreach { name =>
            val in = f.open(new Path(d, name))
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
            in.close()
          }
          out.close()
        }
        val zones = names.map(n => ZoneMap.load(f, new Path(d, n).toString))
        val merged =
          if (zones.forall(_.isDefined))
            Some(ZoneMap.render(ZoneMap.merge(zones.map(_.get))))
          else None
        (g, merged)
      }.collect()
    val mergedZones = staged.toMap

    // CAS the whole batch as ONE entry before any flip: from here the
    // inputs are shielded (a competing writer touching them validates
    // against this entry and backs off); losing the validation here
    // throws CommitConflictException and the caller re-plans
    val newNames = groups.zipWithIndex.map { case ((_, ext), g) =>
      s"compact-$runId-g$g$ext" }
    val committed = try OptimisticCommit.commit(fs, dir, readVersion,
        op = "compact", added = newNames, removed = groups.flatMap(_._1),
        staging = Some(stagingName))
      catch { case e: OptimisticCommit.CommitConflictException =>
        fs.delete(new Path(path, stagingName), true) // abandon the stage
        throw e
      }

    // driver phase: marker -> sidecar -> rename -> deletes, per group
    groups.zipWithIndex.foreach { case ((names, ext), g) =>
      val newName = s"compact-$runId-g$g$ext"
      val stagedFile = new Path(new Path(path, stagingName), s"g$g$ext")
      writeMarker(fs, dir, s"$runId-g$g", Marker(
        staging = stagedFile.toString, newFile = newName, olds = names))
      mergedZones(g).foreach(json => ZoneMap.write(fs, dir, newName, json))
      if (!fs.rename(stagedFile, new Path(dir, newName)))
        throw new java.io.IOException(
          s"compaction rename failed: $stagedFile -> $newName")
      names.foreach { n =>
        fs.delete(ZoneMap.sidecar(dir, n), false)
        // a merged file gets no bloom (advisory — absent is unpruned,
        // never wrong); the inputs' blooms must not outlive them
        fs.delete(BloomSidecar.sidecar(dir, n), false)
        fs.delete(new Path(dir, n), false)
      }
      fs.delete(markerPath(dir, s"$runId-g$g"), false)
    }
    fs.delete(new Path(path, stagingName), true)
    OptimisticCommit.markApplied(fs, dir, committed)
    groups.length
  }

  private case class Marker(staging: String, newFile: String, olds: Seq[String])

  private def markerPath(dir: Path, id: String): Path =
    new Path(dir, s"$MarkerPrefix$id.json")

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      id: String, m: Marker): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("staging", m.staging)
    root.put("new", m.newFile)
    val arr = root.putArray("olds")
    m.olds.foreach(arr.add)
    val out = fs.create(markerPath(dir, id), true)
    out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    out.close()
  }

  /** Replay pending compaction markers to completion (idempotent).
    * Returns the number of markers resolved. */
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
      val olds = root.get("olds").elements().asScala.map(_.asText()).toSeq
      if (!fs.exists(newFile) && fs.exists(staged)) {
        // crashed between marker and rename: finish the rename (the
        // merged sidecar may or may not have landed — advisory)
        if (!fs.rename(staged, newFile))
          throw new java.io.IOException(s"recovery rename failed: $staged")
      }
      if (fs.exists(newFile)) {
        olds.foreach { o =>
          fs.delete(ZoneMap.sidecar(dir, o), false)
          fs.delete(BloomSidecar.sidecar(dir, o), false)
          fs.delete(new Path(dir, o), false)
        }
      } else {
        // group never committed: every old is still in place (deletes
        // run strictly after the rename) — drop the leftovers
        fs.delete(staged, false)
        fs.delete(ZoneMap.sidecar(dir, root.get("new").asText()), false)
      }
      fs.delete(mp, false)
    }
    markers.length
  }
}
