package graft.operators

import org.apache.spark.SparkContext

/** Shared guard for the reliable-checkpoint truncation mode used by the
  * iterative operators ([[Components]], [[Hierarchy]], [[Graph]]).
  *
  * `SparkContext.setCheckpointDir(dir)` stores a QUALIFIED
  * `dir/<random-UUID>` path (e.g. `file:/tmp/ck/6e88b8f1-…`), so neither
  * an equality test nor a raw string `startsWith(dir)` ever matches the
  * caller's `dir` — and a per-round guard that never matches re-calls
  * setCheckpointDir every truncation, minting one orphaned UUID
  * subdirectory per round. Compare scheme-stripped URI paths instead. */
private[operators] object Checkpointing {

  private def uriPath(p: String): String =
    Option(new org.apache.hadoop.fs.Path(p).toUri.getPath).getOrElse(p)

  /** True when the context's current checkpoint dir already lives under
    * `dir` (by URI path, scheme ignored). Compares whole path COMPONENTS,
    * not a raw prefix: `/tmp/ck` must not match a current dir under the
    * sibling `/tmp/ck2` (a raw startsWith would, silently landing
    * reliable checkpoints under the wrong root). */
  def underDir(sc: SparkContext, dir: String): Boolean = {
    val root = uriPath(dir).stripSuffix("/")
    sc.getCheckpointDir.exists { cur =>
      val c = uriPath(cur)
      c == root || c.startsWith(root + "/")
    }
  }

  /** Idempotently point the context's checkpoint dir at `dir`: set it
    * only when the current dir is not already a `dir/<UUID>` child, so
    * repeated truncations share ONE checkpoint root. */
  def ensureDir(sc: SparkContext, dir: String): Unit =
    if (!underDir(sc, dir)) sc.setCheckpointDir(dir)
}
