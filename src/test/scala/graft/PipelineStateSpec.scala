package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.state.StateStore

class PipelineStateSpec extends SparkSpec {
  import spark.implicits._

  private def tmpPath(tag: String): String =
    new java.io.File(Files.createTempDirectory(s"graft_$tag").toFile, "state").getAbsolutePath

  private def cfgFor(path: String, ut: UpdateType) = PipelineConfig(
    SourceConfig("/src", "people"), StoreConfig(path, "people_col"), ut, "id", 1L)

  test("state store: overwrite/load round-trip, no .old residue, query surface") {
    val store = new StateStore(spark, tmpPath("store"))
    val df = Seq(("d1", "upsert_checksum", 5L), ("d2", "upsert_checksum", 9L))
      .toDF("doc_id", "update_type", "version_id")
    store.overwrite(df)
    assert(store.load().count() == 2)
    store.overwrite(df.withColumn("version_id", $"version_id" + 1))
    assert(store.load().filter($"version_id" === 10L).count() == 1)
    // retired copy cleaned up after successful promote
    val fsPath = new Path(store.path + ".old")
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(fsPath))
    assert(store.getDocument("d1").count() == 1)
    assert(store.queryDocuments("version_id", ">", 9L).count() == 1)
    assert(store.queryDocumentsNotEqual("doc_id", "d1").count() == 1)
    val versions = store.queryAllVersions("upsert_checksum")
      .select("version_id").as[Long].collect()
    assert(versions.toSeq == versions.sorted.reverse.toSeq)
  }

  test("single-writer lease: concurrent writer fails loudly, stale lock breaks, lease released") {
    val p = tmpPath("lease")
    val store = new StateStore(spark, p)
    val df = Seq(("d1", 1L)).toDF("doc_id", "version_id")
    val lockPath = new Path(p + ".lock")
    val fs = lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a held lease blocks every mutator with a loud, named failure
    fs.create(lockPath, false).close()
    val err = intercept[IllegalStateException] { store.overwrite(df) }
    assert(err.getMessage.contains("another writer"))
    intercept[IllegalStateException] { store.truncate() }
    intercept[IllegalStateException] {
      store.applyActions(Seq(("create", "x", 1L)).toDF("_action", "doc_id", "version_id"), "doc_id")
    }
    // ...and reads never need the lease
    assert(store.load().columns.isEmpty)
    fs.delete(lockPath, false)
    store.overwrite(df)
    assert(!fs.exists(lockPath)) // lease released after the swap
    assert(store.load().count() == 1)
    // a STALE lock (crashed writer) is broken on the next acquire
    val fast = new StateStore(spark, p, staleLockMs = 0L)
    fs.create(lockPath, false).close()
    Thread.sleep(5) // age > 0ms threshold
    fast.overwrite(df.withColumn("version_id", lit(2L)))
    assert(fast.load().filter($"version_id" === 2L).count() == 1)
    assert(!fs.exists(lockPath))
    // the lease is also released when the write itself fails
    intercept[Exception] {
      store.overwrite(spark.sql("select assert_true(false) as x"))
    }
    assert(!fs.exists(lockPath))
    assert(store.load().count() == 1) // prior snapshot intact
  }

  test("batch atomic write: create/update/delete in one snapshot rewrite") {
    val store = new StateStore(spark, tmpPath("batch"))
    store.overwrite(Seq(
      ("a", Some("Alice"), Some(1.0)),
      ("b", Some("Bob"), Some(2.0)),
      ("c", Some("Cara"), Some(3.0))).toDF("id", "name", "score"))
    val actions = Seq(
      ("create", "d", Some("Dan"), Some(4.0)),
      ("update", "a", None, Some(9.0)),      // partial: name survives merge
      ("update", "e", Some("Eve"), None),    // merge-upsert creates missing key
      ("delete", "c", None, None)
    ).toDF("_action", "id", "name", "score")
    store.applyActions(actions, "id")
    val out = store.load().as[(String, Option[String], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      "a" -> ((Some("Alice"), Some(9.0))), // score updated, name kept
      "b" -> ((Some("Bob"), Some(2.0))),
      "d" -> ((Some("Dan"), Some(4.0))),
      "e" -> ((Some("Eve"), None))))
    // batch against an empty store: only creates land
    val fresh = new StateStore(spark, tmpPath("batch_empty"))
    fresh.applyActions(actions, "id")
    val ids = fresh.load().select("id").as[String].collect().toSet
    assert(ids == Set("a", "d", "e")) // creates + both merge-upserts land
  }

  test("batch write preserves state columns the action frame doesn't carry") {
    val store = new StateStore(spark, tmpPath("batch_keep"))
    store.overwrite(Seq(("a", Some(1.0), "docA", 7L))
      .toDF("id", "score", "doc_id", "version_id"))
    store.applyActions(Seq(
      ("update", "a", Some(9.0)),
      ("create", "b", Some(2.0))).toDF("_action", "id", "score"), "id")
    val rows = store.load().select("id", "score", "doc_id", "version_id")
      .as[(String, Option[Double], Option[String], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(rows("a") == (("a", Some(9.0), Some("docA"), Some(7L)))) // survive
    assert(rows("b") == (("b", Some(2.0), None, None)))
  }

  test("bucketed store rejects whole-source strategies on delta runs") {
    import graft.state.BucketedStateStore
    val store = new BucketedStateStore(spark, tmpPath("bucket_guard"), 4)
    val cfg = cfgFor("/na", UpdateType.UpsertChecksumWithDelete)
    val e = intercept[IllegalArgumentException](
      store.mergeRun(Seq(("a", 1.0)).toDF("id", "score"), cfg))
    assert(e.getMessage.contains("delta-safe"))
  }

  test("state store: load falls back to retired snapshot after simulated crash") {
    val store = new StateStore(spark, tmpPath("crash"))
    store.overwrite(Seq(("d1", 1L)).toDF("doc_id", "v"))
    // simulate a crash between retire and promote: live dir renamed aside
    val fs = new Path(store.path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new Path(store.path), new Path(store.path + ".old"))
    assert(store.exists)
    assert(store.load().count() == 1) // reader still sees a snapshot
    store.overwrite(Seq(("d1", 2L), ("d2", 2L)).toDF("doc_id", "v"))
    assert(store.load().count() == 2)
  }

  test("sync pipeline end-to-end: load, idempotent rerun, mutation, table-level") {
    val path = tmpPath("pipe")
    val cfg = cfgFor(path, UpdateType.UpsertChecksum)
    val pipe = new SyncPipeline(spark, cfg)
    val raw = Seq(("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("id", "score") // dup pk collapses? no Created col -> kept
    val st1 = pipe.run(Seq(("a", 1.0), ("b", 2.0)).toDF("id", "score"))
    assert(st1.count() == 2)
    // rerun identical: same data survives, no new version stamps
    val pipe2 = new SyncPipeline(spark, cfg.copy(versionId = 2L))
    val st2 = pipe2.run(Seq(("a", 1.0), ("b", 2.0)).toDF("id", "score"))
    assert(st2.count() == 2)
    assert(st2.filter($"version_id" === 2L).isEmpty)
    // mutate one row
    val pipe3 = new SyncPipeline(spark, cfg.copy(versionId = 3L))
    val st3 = pipe3.run(Seq(("a", 8.0), ("b", 2.0)).toDF("id", "score"))
    assert(st3.filter($"version_id" === 3L).select("id").as[String].collect().toSeq == Seq("a"))
    assert(raw.count() == 3)
  }

  test("pipeline dedupes on Created latest-wins before strategy") {
    val path = tmpPath("dedup")
    val cfg = cfgFor(path, UpdateType.FullRefresh)
    val pipe = new SyncPipeline(spark, cfg)
    val raw = Seq(
      ("a", "2024-01-02", 2.0),
      ("a", "2024-01-01", 1.0),
      ("", "2024-01-01", 9.0) // invalid pk dropped
    ).toDF("id", "Created", "score")
    val st = pipe.run(raw)
    assert(st.count() == 1)
    assert(st.select("score").as[Double].head() == 2.0)
  }

  test("pipeline surfaces skip counts and schema drift as run metrics") {
    val path = tmpPath("metrics")
    val cfg = cfgFor(path, UpdateType.UpsertChecksum)
    val pipe = new SyncPipeline(spark, cfg)
    pipe.run(Seq(("a", 1.0), ("", 2.0), (null, 3.0), ("b", 4.0))
      .toDF("id", "score"))
    assert(pipe.lastRunMetrics("skipped_rows") == 2L) // "" and null pks
    assert(pipe.lastRunMetrics("input_rows") == 4L)
    assert(pipe.lastRunMetrics("added_fields") == Set.empty[String]) // first run: no drift baseline
    // second run with a grown+shrunk schema: drift vs prior state columns
    val pipe2 = new SyncPipeline(spark, cfg.copy(versionId = 2L))
    pipe2.run(Seq(("a", "x")).toDF("id", "label"))
    assert(pipe2.lastRunMetrics("skipped_rows") == 0L)
    assert(pipe2.lastRunMetrics("added_fields") == Set("label"))
    assert(pipe2.lastRunMetrics("removed_fields") == Set("score"))
  }

  test("pipeline run on an empty source: zero metrics, state intact") {
    val path = tmpPath("empty_src")
    val cfg = cfgFor(path, UpdateType.UpsertChecksum)
    val pipe = new SyncPipeline(spark, cfg)
    pipe.run(Seq(("a", 1.0), ("b", 2.0)).toDF("id", "score"))
    val pipe2 = new SyncPipeline(spark, cfg.copy(versionId = 2L))
    val st = pipe2.run(Seq.empty[(String, Double)].toDF("id", "score"))
    assert(st.count() == 2) // upsert without delete: state survives
    assert(pipe2.lastRunMetrics("skipped_rows") == 0L)
    assert(pipe2.lastRunMetrics("input_rows") == 0L)
  }

  test("bucketed state: incremental run rewrites only touched buckets") {
    import graft.state.BucketedStateStore
    val path = tmpPath("buckets")
    val cfg = cfgFor(path, UpdateType.UpsertChecksum)
    val store = new BucketedStateStore(spark, path, nBuckets = 8)
    val keys = (1 to 64).map(i => (s"k$i", i.toDouble))
    store.mergeRun(keys.toDF("id", "score"), cfg)
    assert(store.load().count() == 64)
    // record per-bucket file state before the incremental run
    def bucketFiles(): Map[String, Set[String]] = {
      val base = new java.io.File(path)
      base.listFiles().filter(_.getName.startsWith("_bucket=")).map { d =>
        d.getName -> d.listFiles().map(f => f.getName + ":" + f.lastModified()).toSet
      }.toMap
    }
    val before = bucketFiles()
    // touch exactly one key -> exactly one bucket
    val src2 = Seq(("k1", 999.0)).toDF("id", "score")
    store.mergeRun(src2, cfg.copy(versionId = 2L))
    val after = bucketFiles()
    val changed = before.keySet.filter(b => before(b) != after.getOrElse(b, Set()))
    assert(changed.size == 1, s"expected 1 rewritten bucket, got $changed")
    // merged content: k1 updated, every other key intact
    val out = store.load().select("id", "score").as[(String, Double)].collect().toMap
    assert(out("k1") == 999.0)
    assert(out.size == 64)
    assert(out("k2") == 2.0)
    // and the touched-bucket read prunes partitions at the scan
    val pruned = store.loadTouched(src2, "id")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("_bucket"), scan)
  }

  test("table-level pipeline run: snapshot state, unchanged rerun keeps version") {
    val path = tmpPath("tbl")
    val cfg = cfgFor(path, UpdateType.VersionedTableChecksum)
    val src = Seq(("a", 1.0), ("b", 2.0)).toDF("id", "score")
    val st1 = new SyncPipeline(spark, cfg).run(src)
    assert(st1.count() == 1)
    assert(!st1.columns.contains("id")) // snapshot schema, not aligned with source
    val st2 = new SyncPipeline(spark, cfg.copy(versionId = 2L)).run(src)
    assert(st2.count() == 1) // unchanged -> no new version
    val st3 = new SyncPipeline(spark, cfg.copy(versionId = 3L))
      .run(Seq(("a", 5.0), ("b", 2.0)).toDF("id", "score"))
    assert(st3.count() == 2) // changed -> appended version (round-1 crash regression)
    assert(st3.filter($"latest").select("version_id").as[Long].head() == 3L)
  }
}
