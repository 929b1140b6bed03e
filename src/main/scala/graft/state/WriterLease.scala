package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}

/** Single-writer lease over a filesystem path, shared by the state
  * stores: the claim is an atomic create-exclusive of a lock file, so a
  * second concurrent writer fails loudly instead of silently racing a
  * snapshot swap or a bucket rewrite. A lease older than `staleLockMs`
  * is broken on the next acquire — a crashed writer never wedges the
  * store (both stores' write protocols leave loadable state at every
  * step, so breaking a dead writer's lease is always safe). */
private[state] object WriterLease {

  private def tryCreate(fs: FileSystem, lock: Path, owner: String): Boolean =
    try {
      val out = fs.create(lock, false) // create-exclusive: atomic claim
      try out.writeBytes(owner + "\n") finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  def withLease[T](fs: FileSystem, lock: Path, owner: String,
      staleLockMs: Long)(f: => T): T = {
    if (!tryCreate(fs, lock, owner)) {
      val age =
        try System.currentTimeMillis - fs.getFileStatus(lock).getModificationTime
        catch { case _: java.io.FileNotFoundException => Long.MaxValue }
      // stale (or just-released): break and re-claim ONCE; a live
      // contender re-claims first and the create-exclusive fails again
      if (age <= staleLockMs ||
          { fs.delete(lock, false); !tryCreate(fs, lock, owner) })
        throw new IllegalStateException(
          s"state at ${lock.toString.stripSuffix(".lock")} is locked by " +
            s"another writer ($lock, age ${age / 1000}s, stale threshold " +
            s"${staleLockMs / 1000}s); the store is single-writer — " +
            "serialize the pipelines, or delete the lock only if the " +
            "owner is known dead")
    }
    try f finally fs.delete(lock, false)
  }
}
