package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.v2.{BloomSidecar, DeletionVector, OptimisticCommit, RecordCompaction, RecordReplaceDataWrite, ZoneMap}

/** VACUUM for a record lake: replay every pending marker protocol to
  * completion, then sweep the debris a crash can leave behind —
  * orphan `_staging-*` directories (a task set that died before its
  * commit) and orphan sidecars (zone/bloom/deletion-vector jsons whose
  * data file is gone). Each sweep class is SAFE by the invariants the
  * writers maintain:
  *
  *  - staging dirs are invisible to readers (`_`-prefix) and only the
  *    writing query ever moves files out of them — under the lake's
  *    single-writer discipline, any staging dir seen by vacuum is dead;
  *  - a sidecar without its data file can never affect a scan (zones
  *    and blooms are looked up per live file; deletion vectors load by
  *    live file path too) — deleting them reclaims metadata only;
  *  - epoch `.committed` markers are NOT swept: they are the streaming
  *    sink's exactly-once memory across restarts.
  *
  * Run it like any maintenance op: single-writer, no concurrent writes.
  * The reference has no equivalent (its state is one Firestore
  * collection); this is the operational tooling the file-based layout
  * needs at fleet scale, where crash debris otherwise accumulates
  * forever. */
object Vacuum {

  final case class Report(markersReplayed: Int, stagingDirsRemoved: Int,
      orphanSidecarsRemoved: Int, commitEntriesExpired: Int = 0,
      staleTmpSwept: Int = 0)

  /** `commitLogKeepLast` bounds the optimistic-commit history retained
    * for conflict validation — entries older than the newest N applied
    * ones are expired (a writer whose readVersion predates retention
    * fails loudly and re-plans, never silently). */
  def clean(spark: SparkSession, path: String,
      commitLogKeepLast: Int = 1000): Report = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Report(0, 0, 0)
    // 1) finish what crashed mid-protocol (each is idempotent); replay
    //    any committed-but-unapplied optimistic entries first so their
    //    staging is consumed, not swept
    OptimisticCommit.awaitApplied(fs, dir,
      OptimisticCommit.standardRecover(path, conf), staleMs = 0L)
    val replayed = RecordCompaction.recover(path, conf) +
      DeletionVectors.recover(path, conf) +
      RecordReplaceDataWrite.recover(path, conf)
    // 2) dead staging directories (none are shielded now — every
    //    committed entry was just applied; vacuum is quiesce-first)
    val staging = fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("_staging-"))
    staging.foreach(p => fs.delete(p, true))
    val expired = OptimisticCommit.expire(fs, dir, commitLogKeepLast)
    // 2b) stale arbiter temp files: LocalLink stages each claim payload
    //     as a dot-prefixed `.c<v>.json.<uuid>.tmp` sibling before the
    //     atomic link — a crash between the temp write and the link
    //     strands it (inert to readers, but debris accumulates across
    //     crashes). Age-gated by the same staleness bound as crashed
    //     commits: a live claimant links within milliseconds.
    var tmpSwept = 0
    val logDir = new Path(dir, OptimisticCommit.Dir)
    if (fs.exists(logDir)) {
      val cutoff = System.currentTimeMillis - OptimisticCommit.DefaultStaleMs
      fs.listStatus(logDir).filter(_.isFile).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(".") && n.endsWith(".tmp") &&
            st.getModificationTime < cutoff) {
          fs.delete(st.getPath, false); tmpSwept += 1
        }
      }
    }
    // 3) orphan sidecars (their data file is gone)
    val live = fs.listStatus(dir).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    var orphans = 0
    Seq(ZoneMap.Dir, BloomSidecar.Dir, DeletionVector.Dir).foreach { d =>
      val sd = new Path(dir, d)
      if (fs.exists(sd)) fs.listStatus(sd).filter(_.isFile).foreach { st =>
        val owner = st.getPath.getName.stripSuffix(".json")
        if (!live.contains(owner)) { fs.delete(st.getPath, false); orphans += 1 }
      }
    }
    Report(replayed, staging.length, orphans, expired, tmpSwept)
  }
}
