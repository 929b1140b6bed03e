package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Strategies

/** Strategy state-machine tests: run sequences (initial load -> no-change
  * rerun -> mutate -> remove) asserting exact state after each step.
  * Encodes the reference README strategy contract
  * (reference: README.md:48-78) as golden state. */
class StrategiesSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(ut: UpdateType, v: Long) = PipelineConfig(
    SourceConfig("/src", "people"), StoreConfig("/na", "people_col"), ut, "id", v)

  private def src(rows: (String, String, Double)*): DataFrame =
    rows.toSeq.toDF("id", "name", "score")

  private val s0 = src(("a", "Alice", 1.0), ("b", "Bob", 2.0), ("c", "Cara", 3.0))
  private val s1 = src(("a", "Alice", 9.0), ("b", "Bob", 2.0), ("d", "Dan", 4.0)) // a changed, c gone, d new
  private val empty = TestSpark.spark.emptyDataFrame

  private def dataOf(state: DataFrame): Seq[(String, String, Double)] =
    state.select("id", "name", "score").as[(String, String, Double)]
      .collect().toSeq.sortBy(_._1)

  test("FULL_REFRESH replaces everything") {
    val c = cfg(UpdateType.FullRefresh, 1)
    val st1 = Strategies.fullRefresh(s0, empty, c)
    assert(dataOf(st1) == Seq(("a", "Alice", 1.0), ("b", "Bob", 2.0), ("c", "Cara", 3.0)))
    val st2 = Strategies.fullRefresh(s1, st1, c.copy(versionId = 2))
    assert(dataOf(st2) == Seq(("a", "Alice", 9.0), ("b", "Bob", 2.0), ("d", "Dan", 4.0)))
  }

  test("REPLACE rewrites matched pks, keeps unmatched target rows") {
    val c = cfg(UpdateType.Replace, 1)
    val st1 = Strategies.replace(s0, Strategies.alignState(empty, s0), c)
    val st2 = Strategies.replace(s1, st1, c.copy(versionId = 2))
    // c survives (target-only), a/b replaced, d inserted
    assert(dataOf(st2) == Seq(("a", "Alice", 9.0), ("b", "Bob", 2.0),
      ("c", "Cara", 3.0), ("d", "Dan", 4.0)))
  }

  test("APPEND only inserts new pks") {
    val c = cfg(UpdateType.Append, 1)
    val st1 = Strategies.append(s0, empty, c)
    val st2 = Strategies.append(s1, st1, c.copy(versionId = 2))
    // a keeps OLD value (append never updates), d inserted, c kept
    assert(dataOf(st2) == Seq(("a", "Alice", 1.0), ("b", "Bob", 2.0),
      ("c", "Cara", 3.0), ("d", "Dan", 4.0)))
  }

  test("UPSERT_CHECKSUM: insert/update/keep; rerun is a no-op on data+version") {
    val c = cfg(UpdateType.UpsertChecksum, 1)
    val st1 = Strategies.upsertChecksum(s0, Strategies.alignState(empty, s0), c)
    assert(dataOf(st1) == Seq(("a", "Alice", 1.0), ("b", "Bob", 2.0), ("c", "Cara", 3.0)))
    val st2 = Strategies.upsertChecksum(s1, st1, c.copy(versionId = 2))
    assert(dataOf(st2) == Seq(("a", "Alice", 9.0), ("b", "Bob", 2.0),
      ("c", "Cara", 3.0), ("d", "Dan", 4.0)))
    // only a (changed) and d (new) carry version 2
    val v2 = st2.filter($"version_id" === 2).select("id").as[String].collect().sorted
    assert(v2.toSeq == Seq("a", "d"))
    // rerun with identical source: same data, no new version stamps
    val st3 = Strategies.upsertChecksum(s1, st2, c.copy(versionId = 3))
    assert(dataOf(st3) == dataOf(st2))
    assert(st3.filter($"version_id" === 3).isEmpty)
  }

  test("UPSERT_CHECKSUM_WITH_DELETE converges to source") {
    val c = cfg(UpdateType.UpsertChecksumWithDelete, 1)
    val st1 = Strategies.upsertChecksumWithDelete(s0, Strategies.alignState(empty, s0), c)
    val st2 = Strategies.upsertChecksumWithDelete(s1, st1, c.copy(versionId = 2))
    assert(dataOf(st2) == Seq(("a", "Alice", 9.0), ("b", "Bob", 2.0), ("d", "Dan", 4.0)))
  }

  test("SOFT_DELETE flags departures and resurrects returners") {
    val c = cfg(UpdateType.SoftDelete, 1)
    val st1 = Strategies.softDelete(s0, Strategies.alignState(empty, s0), c)
    val st2 = Strategies.softDelete(s1, st1, c.copy(versionId = 2))
    val flags = st2.select("id", "is_deleted").as[(String, Option[Boolean])]
      .collect().toMap
    assert(flags("c").contains(true))   // departed -> flagged
    assert(flags("a").contains(false))  // updated -> live
    assert(flags("d").contains(false))  // inserted -> live
    // c returns in run 3 -> undeleted, data refreshed
    val s2 = src(("c", "Cara", 7.0))
    val st3 = Strategies.softDelete(s2, st2, c.copy(versionId = 3))
    val c3 = st3.filter($"id" === "c").select("score", "is_deleted")
      .as[(Double, Option[Boolean])].head()
    assert(c3 == ((7.0, Some(false))))
    // a/b/d departed in run 3 -> flagged but retained
    assert(st3.count() == 4)
    assert(st3.filter(coalesce($"is_deleted", lit(false))).count() == 3)
  }

  test("VERSIONED appends a full new version set each run") {
    val c = cfg(UpdateType.Versioned, 1)
    val st1 = Strategies.versioned(s0, empty, c)
    val st2 = Strategies.versioned(s1, st1, c.copy(versionId = 2))
    assert(st2.count() == 6)
    assert(st2.filter($"latest").count() == 3)
    assert(st2.filter($"latest" && $"version" === 2).count() == 3)
  }

  test("VERSIONED_CHECKSUM: new version only for changed pks; one latest per pk") {
    val c = cfg(UpdateType.VersionedChecksum, 1)
    val st1 = Strategies.versionedChecksum(s0, empty, c)
    val st2 = Strategies.versionedChecksum(s1, st1, c.copy(versionId = 2))
    // a: 2 versions; b: 1; c: chain kept; d: 1 new
    assert(st2.count() == 5)
    val latest = st2.filter($"latest")
      .select("id", "score").as[(String, Double)].collect().toMap
    assert(latest == Map("a" -> 9.0, "b" -> 2.0, "c" -> 3.0, "d" -> 4.0))
    // exactly one latest per pk
    val perPk = st2.filter($"latest").groupBy("id").count()
      .filter($"count" > 1)
    assert(perPk.isEmpty)
    // rerun: nothing changes
    val st3 = Strategies.versionedChecksum(s1, st2, c.copy(versionId = 3))
    assert(st3.count() == 5)
    assert(st3.filter($"version_id" === 3).isEmpty)
  }

  test("VERSIONED_SET: any change demotes all and appends whole set; none is a no-op") {
    val c = cfg(UpdateType.VersionedSet, 1)
    val st1 = Strategies.versionedSet(s0, empty, c)
    assert(st1.count() == 3)
    val st2 = Strategies.versionedSet(s0, st1, c.copy(versionId = 2)) // identical
    assert(st2.count() == 3)
    assert(st2.filter($"version_id" === 2).isEmpty)
    val st3 = Strategies.versionedSet(s1, st2, c.copy(versionId = 3)) // changed
    assert(st3.count() == 6)
    assert(st3.filter($"latest").count() == 3)
    assert(st3.filter($"latest" && $"version_id" === 3).count() == 3)
  }

  test("UPSERT_TABLE_CHECKSUM short-circuits on unchanged table, keyed by table name") {
    val c = cfg(UpdateType.UpsertTableChecksum, 1)
    val st1 = Strategies.upsertTableChecksum(s0, empty, c)
    assert(st1.select("doc_id").as[String].head() == "people")
    val st2 = Strategies.upsertTableChecksum(s0, st1, c.copy(versionId = 2))
    assert(st2.select("version_id").as[Long].head() == 1L) // unchanged -> kept
    val st3 = Strategies.upsertTableChecksum(s1, st2, c.copy(versionId = 3))
    assert(st3.select("version_id").as[Long].head() == 3L) // changed -> replaced
    assert(st3.count() == 1)
  }

  test("VERSIONED_TABLE_CHECKSUM appends snapshot versions across changed runs") {
    // regression for the round-1 crash: second changed run with prior state
    val c = cfg(UpdateType.VersionedTableChecksum, 1)
    val st1 = Strategies.versionedTableChecksum(s0, empty, c)
    val st2 = Strategies.versionedTableChecksum(s1, st1, c.copy(versionId = 2))
    assert(st2.count() == 2)
    val st3 = Strategies.versionedTableChecksum(s1, st2, c.copy(versionId = 3))
    assert(st3.count() == 2) // unchanged -> no new version
    val st4 = Strategies.versionedTableChecksum(s0, st3, c.copy(versionId = 4))
    assert(st4.count() == 3) // changed again -> third version
    val latest = st4.filter($"latest")
    assert(latest.count() == 1)
    assert(latest.select("version_id").as[Long].head() == 4L)
  }

  test("table-checksum strategies fold the snapshot once and cap its size up front") {
    val c = cfg(UpdateType.UpsertTableChecksum, 1)
    // changed path returns a LOCAL one-row frame: the whole-table pivot ran
    // exactly once (at collect) — persisting it again re-reads local rows,
    // never the aggregation; and nothing is left in the CacheManager
    val st = Strategies.upsertTableChecksum(s0, empty, c)
    val leaves = st.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      s"snapshot should be collected to a local relation, got $leaves")
    assert(st.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    // size guard: beyond the cap, fail loudly (BEFORE the fold) and point
    // at the scale path; the cap is per-pipeline config, not JVM-global
    val err = intercept[IllegalArgumentException] {
      Strategies.upsertTableChecksum(s0, empty, c.copy(maxSnapshotRows = 2))
    }
    assert(err.getMessage.contains("orderInsensitiveChecksum"))
    val vc = cfg(UpdateType.VersionedTableChecksum, 1)
    val err2 = intercept[IllegalArgumentException] {
      Strategies.versionedTableChecksum(s0, empty, vc.copy(maxSnapshotRows = 2))
    }
    assert(err2.getMessage.contains("orderInsensitiveChecksum"))
    // an un-capped config over the same rows still snapshots fine
    assert(Strategies.upsertTableChecksum(s0, empty, c).count() == 1)
  }

  test("classify labels insert/update/delete/unchanged by pk") {
    val c = cfg(UpdateType.UpsertChecksum, 2)
    val m = Strategies.classify(s1, Strategies.alignState(
      Strategies.fullRefresh(s0, empty, c), s1), c)
      .as[(String, String)].collect().toMap
    assert(m == Map("a" -> "update", "b" -> "unchanged", "c" -> "delete", "d" -> "insert"))
  }

  test("purge drops rows of foreign update types") {
    val c = cfg(UpdateType.UpsertChecksum, 1)
    val other = Strategies.fullRefresh(s0, empty, cfg(UpdateType.FullRefresh, 1))
    assert(Strategies.purgeOtherUpdateTypes(other, c).isEmpty)
    assert(Strategies.purgeOtherUpdateTypes(empty, c).columns.isEmpty) // no-op on schemaless
  }

  test("strategy registry is extensible") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    Strategies.register(UpdateType.FullRefresh, (src, _, c) => {
      calls.incrementAndGet(); Strategies.fullRefresh(src, empty, c)
    })
    Strategies.get(UpdateType.FullRefresh)(s0, empty, cfg(UpdateType.FullRefresh, 1)).count()
    assert(calls.get() == 1)
    Strategies.register(UpdateType.FullRefresh, Strategies.fullRefresh) // restore
  }
}
