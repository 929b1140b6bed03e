package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.v2.{DeletionVector, Snapshots}

/** Changelog (CDC) reads between record-lake snapshots: the multiset
  * delta `table@toVersion − table@fromVersion` as a signed Z-relation —
  * one row per distinct changed row content with an integer net
  * multiplicity `m` (+k inserts, −k deletes) — the exact shape
  * [[IncrementalAgg.joinDelta]]/[[IncrementalAgg.consolidate]] consume,
  * so a downstream view maintains itself from snapshots without ever
  * rescanning the table.
  *
  * Derivation is METADATA-FIRST (the Iceberg incremental-read pattern):
  * the two manifests diff to
  *  - files only in v2 → their v2-live rows are inserts;
  *  - files only in v1 → their v1-live rows are deletes;
  *  - files in both → the deletion-vector RANGE DIFF (positions deleted
  *    in v2 but not in v1) names the deleted rows exactly.
  * Every scan is pruned to the changed files via the source's
  * `fileSubset` option, so CDC costs ∝ the delta, not the table — the
  * property that makes incremental consumers affordable at 100 TB.
  * A file that was appended AND compacted away between the snapshots
  * appears in NEITHER manifest and contributes no churn: only the
  * merged file's rows surface, once. The final content-level netting
  * (`groupBy` all columns, `sum(m) ≠ 0`) additionally cancels
  * delete-then-reinsert of identical rows — multiset semantics, which
  * is what Z-relation consumers require.
  *
  * Reference basis: the reference's change detection diffs full table
  * states per run (lib/UpdateStrategies.py compare loops); this derives
  * the same deltas from snapshot metadata instead of rescans. */
object LakeChangelog {

  /** Driver-side bound on changed files per changelog read (the
    * Stats.scala loud-cap discipline — the file-name list rides a read
    * option). */
  val MaxChangedFiles = 100000

  /** The signed changes from snapshot `fromV` to `toV` (live manifests;
    * `fromV = 0` is the bootstrap — "before the first snapshot", so the
    * delta is toV's full content as inserts): the table's columns plus
    * `m`. */
  def changes(spark: SparkSession, path: String, fieldTypes: String,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV, s"changes: fromV $fromV must precede toV $toV")
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val m1 =
      if (fromV == 0L) Snapshots.Manifest(0L, Seq.empty)
      else Snapshots.load(fs, path, fromV)
    val m2 = Snapshots.load(fs, path, toV)
    val f1 = m1.files.toMap
    val f2 = m2.files.toMap
    val removed = (f1.keySet -- f2.keySet).toSeq.sorted
    val added = (f2.keySet -- f1.keySet).toSeq.sorted
    // retained files: positions deleted at v2 but not at v1, as ranges
    val dvGrew = (f1.keySet & f2.keySet).toSeq.sorted.flatMap { n =>
      val d2 = f2(n).map(DeletionVector.parse)
      val d1 = f1(n).map(DeletionVector.parse)
      d2 match {
        case None => Seq.empty
        case Some(v2) =>
          val diff = subtractRanges(v2, d1)
          diff.map { case (s, e) => (n, s, e) }
      }
    }
    val changedCount = removed.length + added.length +
      dvGrew.map(_._1).distinct.length
    require(changedCount <= MaxChangedFiles,
      s"changelog v$fromV→v$toV touches $changedCount files, over " +
        s"MaxChangedFiles=$MaxChangedFiles — consume smaller snapshot " +
        "windows (the changed-file list is driver-resident)")

    def reader(v: Long, names: Seq[String]) = spark.read
      .format("graft-records").option("path", path)
      .option("fieldTypes", fieldTypes).option("versionAsOf", v.toString)
      .option("fileSubset", names.mkString(","))
      .load()

    // template for empty branches (schema only; the manifest-pinned
    // listing is metadata, and lit(false) prunes every row)
    lazy val template = spark.read.format("graft-records")
      .option("path", path).option("fieldTypes", fieldTypes)
      .option("versionAsOf", toV.toString).load().where(lit(false))

    val inserts =
      if (added.isEmpty) template
      else reader(toV, added)
    val fileDeletes =
      if (removed.isEmpty) template
      else reader(fromV, removed)
    val dvDeletes =
      if (dvGrew.isEmpty) template
      else {
        import spark.implicits._
        val ranges = broadcast(dvGrew.toDF("_cdc_name", "_cdc_s", "_cdc_e"))
        val base = reader(fromV, dvGrew.map(_._1).distinct)
        base.select(col("*"),
            substring_index(col("_file"), "/", -1).as("_cdc_f"),
            col("_pos").as("_cdc_p"))
          .join(ranges, col("_cdc_f") === col("_cdc_name") &&
            col("_cdc_p") >= col("_cdc_s") && col("_cdc_p") <= col("_cdc_e"))
          .drop("_cdc_f", "_cdc_p", "_cdc_name", "_cdc_s", "_cdc_e")
      }

    val signed = inserts.withColumn("m", lit(1L))
      .unionByName(fileDeletes.withColumn("m", lit(-1L)))
      .unionByName(dvDeletes.withColumn("m", lit(-1L)))
    IncrementalAgg.consolidate(signed)
  }

  /** Ranges of `v` not covered by `minus` (None = subtract nothing) —
    * linear in the two range counts, never materializing positions. */
  private[graft] def subtractRanges(v: DeletionVector.Vector,
      minus: Option[DeletionVector.Vector]): Seq[(Long, Long)] = minus match {
    case None =>
      v.starts.indices.map(i => (v.starts(i), v.ends(i)))
    case Some(m) =>
      val out = Seq.newBuilder[(Long, Long)]
      var j = 0
      var i = 0
      while (i < v.starts.length) {
        var s = v.starts(i)
        val e = v.ends(i)
        while (j < m.starts.length && m.ends(j) < s) j += 1
        var k = j
        while (s <= e) {
          if (k >= m.starts.length || m.starts(k) > e) {
            out += ((s, e)); s = e + 1
          } else {
            if (m.starts(k) > s) out += ((s, m.starts(k) - 1))
            s = math.max(s, m.ends(k) + 1)
            k += 1
          }
        }
        i += 1
      }
      out.result()
  }
}
