package graft

/** Shuffle/spill scratch location for the engine's local sessions.
  *
  * Shuffle-block and spill-file CREATION is the hidden fixed cost of
  * small shuffles: stack-sampling the bench showed executor tasks
  * blocked in `FileOutputStream.open0` via
  * `DiskBlockManager.createTempShuffleBlock` — with 32-way task
  * concurrency an ext4 create runs ~5 ms p50 (~22 ms p99), and a
  * 32-reducer bypass-merge map task pays it 32×. Shuffle scratch is
  * ephemeral by definition, so when the box offers a memory-backed
  * filesystem with headroom we put `spark.local.dir` there (~1.3 ms
  * p50 create under the same concurrency; measured ~15-20% off a
  * fold-heavy query's wall at sf0.1).
  *
  * Scale honesty: this is an I/O-LAYOUT choice, not an algorithm —
  * production boxes shuffling real volumes point `SPARK_LOCAL_DIRS`
  * (which Spark itself reads FIRST, overriding `spark.local.dir`) at
  * fast NVMe, exactly as the Spark docs recommend. The default below
  * only engages when a memory-backed dir exists with generous free
  * space; everything stays overridable per the normal Spark contract:
  * SPARK_LOCAL_DIRS > SPARK_GRAFT_LOCAL_DIR > /dev/shm (if roomy) >
  * java.io.tmpdir.
  *
  * FAILURE MODE operators must know: the headroom check runs ONCE, at
  * session build. A shuffle/spill that later outgrows the tmpfs fails
  * the job with ENOSPC (Spark does not fail over between local dirs)
  * and, being RAM-backed, competes with the page cache while it grows.
  * `SPARK_GRAFT_LOCAL_DIR` (or `SPARK_LOCAL_DIRS`) pointed at disk is
  * the escape hatch; the 8 GiB gate keeps small boxes off tmpfs
  * entirely. Two hygiene measures bound the leftover-RAM risk:
  *  - each JVM gets its OWN subdirectory (`jvm-<pid>`), and
  *  - at first use every sibling `jvm-<pid>` whose process is gone is
  *    deleted, so a crashed run's shuffle scratch is reclaimed by the
  *    next session instead of holding RAM until reboot. Live JVMs'
  *    dirs are never touched (liveness = /proc/<pid> exists).
  */
object LocalScratch {
  /** Minimum free bytes before memory-backed scratch is considered:
    * local-mode shuffles the bench shapes produce are MBs; 8 GiB of
    * headroom keeps a surprise spill from evicting the page cache. */
  private val MinFreeBytes = 8L << 30

  private def pid: Long = ProcessHandle.current().pid()

  /** Reap sibling per-JVM scratch dirs whose owning process is dead —
    * crash leftovers on a RAM-backed fs otherwise hold memory until
    * reboot. Best-effort: IO errors are ignored (scratch hygiene must
    * never fail a session build). */
  private def reapStale(root: java.io.File): Unit = {
    val sibs = root.listFiles()
    if (sibs == null) return
    sibs.foreach { f =>
      val name = f.getName
      if (f.isDirectory && name.startsWith("jvm-")) {
        val alive = name.stripPrefix("jvm-").toLongOption.exists(p =>
          p == pid || new java.io.File(s"/proc/$p").exists())
        if (!alive)
          try org.apache.commons.io.FileUtils.deleteDirectory(f)
          catch { case _: java.io.IOException => }
      }
    }
  }

  /** Stable within a JVM: the session builder may ask several times and
    * every caller must configure the SAME directory. */
  lazy val dir: String = sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite && shm.getUsableSpace > MinFreeBytes) {
      val root = new java.io.File(shm, "graft-spark-local")
      root.mkdirs()
      reapStale(root)
      val d = new java.io.File(root, s"jvm-$pid")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }
}
