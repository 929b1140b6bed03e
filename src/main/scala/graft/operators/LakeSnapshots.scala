package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Public facade over [[graft.sources.v2.Snapshots]]: snapshot commits,
  * retention, and version listing for a graft-records lake. Reads time
  * travel via the `versionAsOf` option:
  * {{{
  * LakeSnapshots.commit(spark, path)           // -> v1
  * spark.read.format("graft-records")
  *   .option("path", path).option("versionAsOf", "1").load()
  * }}}
  * A snapshot freezes the file set AND each file's deletion-vector
  * state, so v1 still sees rows a later merge-on-read DELETE removed.
  * Compaction and dv-materialize refuse to reclaim files a live
  * manifest references — [[expire]] is vacuum's first step. */
object LakeSnapshots {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Freeze the current table state; returns the new version number. */
  def commit(spark: SparkSession, path: String): Long =
    graft.sources.v2.Snapshots.commit(fs(spark, path), path,
      spark.sparkContext.hadoopConfiguration)

  /** Live snapshot versions, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Long] =
    graft.sources.v2.Snapshots.versions(fs(spark, path), new Path(path))

  /** Retire all but the newest `keepLast` manifests. */
  def expire(spark: SparkSession, path: String, keepLast: Int): Int =
    graft.sources.v2.Snapshots.expire(fs(spark, path), new Path(path), keepLast)
}
