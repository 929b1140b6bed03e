package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper

/** Incrementally-maintained materialized views over a record lake:
  * per-key aggregates (count + sums + optional min/max) and two-table
  * join views that refresh by consuming ONLY the snapshot deltas since
  * their recorded watermarks — [[LakeChangelog]]'s signed Z-relations
  * folded into persisted state, so keeping a view current costs ∝ what
  * changed, never a rescan of the table. The continuously-maintained-
  * view story (q286/q288's IVM algebra + q289/q294's change feeds)
  * packaged as one operator with durable state.
  *
  * Crash-safe refresh without transactions: each refresh lands its new
  * state in a fresh GENERATION directory (`data-g<gen>`), then flips a
  * generation-numbered pointer (`_ptr-<gen>.json`) into place by
  * temp-write + atomic rename — the rename target never pre-exists, so
  * the flip is atomic on `file:` and HDFS alike and a reader can never
  * observe a torn pointer. A crash before the flip leaves the old
  * pointer and an orphan directory the next refresh overwrites
  * (re-consuming the same deltas onto the OLD state — idempotent
  * because a pointer and the state it names always advance together).
  * Readers resolve the HIGHEST pointer; retention keeps the current
  * AND previous generation (pointer + data), so a reader that resolved
  * the old pointer can finish its scan while one refresh lands — only
  * the generation after that reclaims it. */
object LakeView {

  /** How many generations (pointer + state dir) survive a flip. 2 =
    * current + previous: an in-flight reader of the superseded state
    * survives one concurrent refresh; its files are reclaimed only by
    * the NEXT one. */
  val KeepGenerations = 2

  final case class Refresh(fromVersion: Long, toVersion: Long,
      groupsChanged: Long)

  /** One join-view refresh: the consumed snapshot windows of both
    * sides and the (un-netted) delta row count folded into the state. */
  final case class JoinRefresh(fromLeft: Long, toLeft: Long,
      fromRight: Long, toRight: Long, deltaRows: Long)

  /** `stateBuckets` sentinel: pick the modulus adaptively — ONE bucket
    * while the state is small (bucket machinery is pure overhead at toy
    * scale: 16+ dirs, 16+ files, 16+ read tasks for kilobytes), growing
    * to [[DefaultBuckets]] once the bootstrap delta reaches
    * [[AutoBucketRows]] rows or the persisted state reaches
    * [[AutoBucketBytes]] — the scale where ∝-touched-bucket refreshes
    * start paying for themselves. A modulus change migrates by treating
    * every bucket as touched (one full rewrite), then sticks. */
  val AutoBuckets = 0
  val DefaultBuckets = 32
  // thresholds sized so the single-bucket form never writes big state
  // SERIALLY: past ~128k delta rows / 8 MB persisted state the bucketed
  // form's parallel writes beat coalesce(1) by more than the per-dir
  // overhead costs (measured: a 1M-row bootstrap under modulus 1 paid a
  // single-task state write per refresh plus a mid-chain migration —
  // 2.2× the whole q297 10× probe)
  val AutoBucketRows: Long = 1L << 17
  val AutoBucketBytes: Long = 8L << 20

  /** A generation pointer: aggregate views name ONE state directory
    * (`dir`); join views name one file path PER HASH BUCKET (`buckets`)
    * — mostly inherited from earlier generations, so a refresh rewrites
    * only the buckets its delta touched (the snapshot-manifest trick
    * one level up). `mod` records the hash modulus the bucket paths
    * were written under: inherited buckets only net against deltas
    * hashed with the SAME modulus, so a refresh under a different one
    * must migrate (rewrite everything) rather than silently mix. */
  private case class Pointer(gen: Long, dir: Option[String],
      buckets: Map[Int, String], marks: Map[String, Long],
      mod: Option[Int])

  private val PtrPrefix = "_ptr-"

  private def ptrGen(name: String): Option[Long] =
    if (name.startsWith(PtrPrefix) && name.endsWith(".json"))
      scala.util.Try(
        name.stripPrefix(PtrPrefix).stripSuffix(".json").toLong).toOption
    else None

  private def parsePointer(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path, g: Long): Pointer = {
    val root = new ObjectMapper().readTree(
      readFully(fs, new Path(dir, s"$PtrPrefix$g.json")))
    import scala.jdk.CollectionConverters._
    val marks = root.get("marks").fields().asScala
      .map(e => e.getKey -> e.getValue.asLong()).toMap
    val d = Option(root.get("dir")).filterNot(_.isNull).map(_.asText())
    val buckets = Option(root.get("buckets")).filterNot(_.isNull)
      .map(_.fields().asScala
        .map(e => e.getKey.toInt -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty[Int, String])
    val mod = Option(root.get("stateBuckets")).filterNot(_.isNull)
      .map(_.asInt())
    Pointer(g, d, buckets, marks, mod)
  }

  private def readPointer(spark: SparkSession,
      viewPath: String): Option[Pointer] = {
    val dir = new Path(viewPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return None
    fs.listStatus(dir).filter(_.isFile)
      .flatMap(st => ptrGen(st.getPath.getName)).sorted
      .lastOption.map(parsePointer(fs, dir, _))
  }

  /** Atomically publish the pointer for `gen` (temp-write + rename to a
    * never-pre-existing name), then reclaim state no live pointer
    * references: retention is BY REFERENCE — the newest
    * [[KeepGenerations]] pointers pin whole dirs (aggregate form) and
    * individual bucket dirs (join form); a bucket dir an old generation
    * wrote stays alive for as long as a live pointer inherits it. */
  private def publish(spark: SparkSession, viewPath: String, gen: Long,
      marks: Map[String, Long], dataDir: Option[String],
      buckets: Map[Int, String], mod: Option[Int] = None): Unit = {
    val dir = new Path(viewPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("gen", gen)
    dataDir match {
      case Some(d) => root.put("dir", d)
      case None =>
        val b = root.putObject("buckets")
        buckets.foreach { case (k, v) => b.put(k.toString, v) }
    }
    mod.foreach(m => root.put("stateBuckets", m))
    val mnode = root.putObject("marks")
    marks.foreach { case (k, v) => mnode.put(k, v) }
    val tmp = new Path(dir, s".ptr-$gen.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(dir, s"$PtrPrefix$gen.json")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(
        s"view pointer flip failed: $tmp -> $dst (concurrent refresh?)")

    // retention by reference
    val liveGens = fs.listStatus(dir).filter(_.isFile)
      .flatMap(st => ptrGen(st.getPath.getName)).sorted
      .takeRight(KeepGenerations).toSet
    val refs: Set[String] = liveGens.flatMap { g =>
      val p = parsePointer(fs, dir, g)
      p.dir.toSeq ++ p.buckets.values
    }
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (ptrGen(n).exists(!liveGens.contains(_)))
        fs.delete(st.getPath, false)
      else if (st.isDirectory && n.startsWith("data-g")) {
        if (!refs.contains(n)) {
          // sweep unreferenced bucket subdirs; drop the dir when no
          // referenced subdir survives
          val anyRef = refs.exists(_.startsWith(n + "/"))
          if (!anyRef) fs.delete(st.getPath, true)
          else fs.listStatus(st.getPath).filter(_.isDirectory).foreach { sub =>
            if (!refs.contains(s"$n/${sub.getPath.getName}"))
              fs.delete(sub.getPath, true)
          }
        }
      }
    }
  }

  /** Land `state` as the next generation (aggregate form: one whole
    * directory) and flip the pointer. */
  private def flip(spark: SparkSession, viewPath: String,
      prev: Option[Pointer], marks: Map[String, Long],
      state: DataFrame): Unit = {
    val gen = prev.map(_.gen).getOrElse(0L) + 1L
    val dataDir = s"data-g$gen"
    state.write.mode("overwrite").parquet(s"$viewPath/$dataDir")
    publish(spark, viewPath, gen, marks, Some(dataDir), Map.empty)
  }

  /** The view's current contents (aggregate views: `keyCols`, `n`, one
    * `sum_<col>` per sum column, `mn_<col>`/`mx_<col>` per min-max
    * column; join views: the joined columns plus the net multiplicity
    * `m`). Empty before the first refresh.
    *
    * `generationAsOf` reads a SPECIFIC generation instead of the newest
    * — view-level time travel, symmetric with the table's
    * `versionAsOf`. Only the newest [[KeepGenerations]] generations are
    * resolvable (retention reclaims older state); an expired or unknown
    * generation refuses loudly, listing what is live. */
  def read(spark: SparkSession, viewPath: String,
      generationAsOf: Option[Long] = None): DataFrame = {
    val dir = new Path(viewPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = generationAsOf match {
      case Some(g) =>
        val live = generations(spark, viewPath)
        if (!live.contains(g)) throw new IllegalStateException(
          s"view generation $g is not live at $viewPath (live: " +
            s"${live.mkString(", ")}) — retention keeps the newest " +
            s"$KeepGenerations generations")
        Some(parsePointer(fs, dir, g))
      case None => readPointer(spark, viewPath)
    }
    ptr match {
      case Some(p) =>
        val paths = p.dir.map(d => Seq(s"$viewPath/$d"))
          .getOrElse(p.buckets.values.toSeq.sorted.map(b => s"$viewPath/$b"))
        spark.read.parquet(paths: _*)
      case None => throw new IllegalStateException(
        s"no materialized view at $viewPath — refreshAggregate first")
    }
  }

  /** Live (resolvable) generation numbers at `viewPath`, ascending. */
  def generations(spark: SparkSession, viewPath: String): Seq[Long] = {
    val dir = new Path(viewPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).filter(_.isFile)
      .flatMap(st => ptrGen(st.getPath.getName)).sorted.toSeq
  }

  private def tableHead(spark: SparkSession, tablePath: String): Long = {
    val tdir = new Path(tablePath)
    // headVersion: tolerant of a conflicting committer WITHDRAWING a
    // just-listed manifest (the version number burns; re-listing heals)
    graft.sources.v2.Snapshots
      .headVersion(tdir.getFileSystem(
        spark.sparkContext.hadoopConfiguration), tdir)
      .getOrElse(throw new IllegalStateException(
        s"table $tablePath has no snapshots — LakeSnapshots.commit " +
          "first (the view watermarks on snapshot versions)"))
  }

  /** Null-safe equi-join condition on `keys` between `l` and `r` —
    * USING-joins and plain `===` never match NULL key values, which
    * would split a NULL-keyed group into a fresh row every refresh. */
  private def nullSafeOn(l: DataFrame, r: DataFrame,
      keys: Seq[String]): Column =
    keys.map(k => l(k) <=> r(k)).reduce(_ && _)

  /** Advance the view to the table's newest snapshot, consuming only
    * `(watermark, head]` deltas. Count and sums fold additively from
    * the signed delta; `minMaxCols` (non-invertible under deletes)
    * recompute ONLY the touched groups from the live table, pruned by
    * a broadcast semi join on the delta's keys. A no-op (0 changed)
    * when the table has not snapshotted since the last refresh. */
  /** `rowFilter`: an optional SQL predicate restricting the view to
    * matching rows (`SELECT keys, aggs FROM t WHERE pred GROUP BY keys`,
    * maintained incrementally). Aggregation is LINEAR over the signed
    * delta, so filtering the delta row-wise is exactly filtering the
    * table — a delete of rows the predicate excludes folds as a no-op.
    * The predicate is part of the view's FOLD RULES: pass the same one
    * every refresh (the SQL surface persists it in the definition and
    * enforces this structurally). */
  def refreshAggregate(spark: SparkSession, tablePath: String,
      fieldTypes: String, viewPath: String,
      keyCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Seq.empty,
      rowFilter: Option[String] = None): Refresh = {
    require(keyCols.nonEmpty, "refreshAggregate needs key columns")
    val head = tableHead(spark, tablePath)
    val ptr = readPointer(spark, viewPath)
    val from = ptr.map(_.marks.getOrElse("watermark", 0L)).getOrElse(0L)
    require(head >= from,
      s"view watermark $from is ahead of the table head $head — the " +
        "table's snapshot history was reset under the view")
    if (head == from) return Refresh(from, head, 0L)

    def filtered(df: DataFrame): DataFrame =
      rowFilter.fold(df)(f => df.where(expr(f)))
    val delta = filtered(
      LakeChangelog.changes(spark, tablePath, fieldTypes, from, head))
    // checkpointed: the folded delta feeds the merge join, the touched-
    // group semi join, AND the changed-count — one CDC read, not three
    val deltaAgg = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(col("m")).as("dn"),
        sumCols.map(c => sum(col("m") * col(c)).as(s"dsum_$c")): _*)
      .localCheckpoint()
    val old = ptr match {
      case Some(p) => spark.read.parquet(s"$viewPath/${p.dir.getOrElse(
        throw new IllegalStateException(
          s"$viewPath is a bucketed JOIN view — refreshAggregate cannot " +
            "advance it"))}")
      case None =>
        val empty = keyCols.map(k => col(k)) ++ (lit(0L).as("n") +:
          sumCols.map(c => lit(0.0).as(s"sum_$c"))) ++
          minMaxCols.flatMap(c =>
            Seq(col(c).as(s"mn_$c"), col(c).as(s"mx_$c")))
        delta.limit(0).select(empty: _*)
    }
    // delta keys ride under _d_ names so the null-safe join condition
    // and the coalesced output keys stay unambiguous
    val deltaR = deltaAgg.select(
      keyCols.map(k => col(k).as(s"_d_$k")) ++
        (col("dn") +: sumCols.map(c => col(s"dsum_$c"))): _*)
    val joined = old.join(deltaR,
      keyCols.map(k => old(k) <=> deltaR(s"_d_$k")).reduce(_ && _), "full")
    val additive = joined.select(
      keyCols.map(k => coalesce(col(k), col(s"_d_$k")).as(k)) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n")) ++
      sumCols.map(c =>
        (coalesce(col(s"sum_$c"), lit(0.0)) +
          coalesce(col(s"dsum_$c"), lit(0.0))).as(s"sum_$c")) ++
      minMaxCols.flatMap(c => Seq(col(s"mn_$c"), col(s"mx_$c"))): _*)
      .filter(col("n") > 0)

    val merged =
      if (minMaxCols.isEmpty) additive
      else {
        // extrema: deletes are non-invertible, so recompute exactly the
        // groups the delta touched from the table AT the new watermark
        // (versionAsOf pins the state; concurrent appends past `head`
        // stay invisible), pruned to those groups by a broadcast
        // null-safe semi join — cost ∝ touched groups' rows, not the
        // table
        val touched = deltaAgg.select(keyCols.map(col): _*).distinct()
        // the rescan sees the VIEW's row population: rowFilter applies
        // here too, or a touched group's extrema would resurrect
        // filtered-out rows
        val live = filtered(spark.read.format("graft-records")
          .option("path", tablePath).option("fieldTypes", fieldTypes)
          .option("versionAsOf", head.toString).load())
        val pruned = live.join(broadcast(touched),
          nullSafeOn(live, touched, keyCols), "left_semi")
        val rescanned = pruned.groupBy(keyCols.map(col): _*)
          .agg(lit(true).as("_touched"),
            minMaxCols.flatMap(c => Seq(min(col(c)).as(s"_mn_new_$c"),
              max(col(c)).as(s"_mx_new_$c"))): _*)
          .select(keyCols.map(k => col(k).as(s"_r_$k")) ++
            (col("_touched") +: minMaxCols.flatMap(c =>
              Seq(col(s"_mn_new_$c"), col(s"_mx_new_$c")))): _*)
        val j = additive.join(broadcast(rescanned),
          keyCols.map(k => additive(k) <=> rescanned(s"_r_$k"))
            .reduce(_ && _), "left")
        // a touched group takes its recomputed extrema even when they
        // are NULL (all surviving values null); an untouched group
        // keeps its old ones — coalesce alone would wrongly resurrect
        // a deleted minimum
        j.select(keyCols.map(col) ++
          Seq(col("n")) ++ sumCols.map(c => col(s"sum_$c")) ++
          minMaxCols.flatMap(c => Seq(
            when(col("_touched"), col(s"_mn_new_$c"))
              .otherwise(col(s"mn_$c")).as(s"mn_$c"),
            when(col("_touched"), col(s"_mx_new_$c"))
              .otherwise(col(s"mx_$c")).as(s"mx_$c"))): _*)
      }
    val changed = deltaAgg.count()
    flip(spark, viewPath, ptr, Map("watermark" -> head), merged)
    Refresh(from, head, changed)
  }

  /** Advance a JOIN view — the persisted Z-relation of
    * `left ⋈ right on keys` — to both tables' newest snapshots,
    * folding in the bilinear delta rule
    * `Δ(L⋈R) = ΔL⋈R@old + L@old⋈ΔR + ΔL⋈ΔR`
    * ([[IncrementalAgg.joinDelta]], multiplicities multiplying across
    * the join) with each table's changes derived from its snapshot
    * metadata ([[LakeChangelog.changes]]). The old-side scans are
    * version-pinned (`versionAsOf` the previous watermark) and join a
    * small broadcast delta, so the source's runtime-filter pushdown
    * prunes them to the keys that changed.
    *
    * State is HASH-BUCKETED (`stateBuckets` by join key): a refresh
    * rewrites ONLY the buckets its delta touches; untouched buckets
    * carry forward BY REFERENCE in the generation pointer, so the
    * materialization cost is ∝ |touched buckets' state|, never the
    * whole view — the property that keeps a big join view refreshable
    * at 100 TB. Bucket dirs are immutable once written (the atomic
    * pointer flip + by-reference retention give the same crash story
    * as the aggregate form). Non-key columns of the two sides must be
    * disjoint; `leftCols`/`rightCols` must include `keys`. NULL join
    * keys never match (standard join semantics).
    *
    * `stateBuckets` defaults to [[AutoBuckets]] (adaptive: 1 bucket
    * while small, [[DefaultBuckets]] once the state crosses the
    * documented thresholds); an explicit value pins the modulus. Either
    * way the modulus in force is RECORDED in the generation pointer:
    * a later refresh under a different modulus migrates by treating
    * every inherited bucket as touched — mixing moduli would hash a
    * key's old +1 rows and its new −1 delta into different buckets,
    * where they silently never net. */
  /** `leftFilter`/`rightFilter`: optional SQL predicates restricting
    * each side's row population (the join of two filtered relations,
    * maintained incrementally). The bilinear rule is linear in each
    * side, so filtering a side's OLD scan and its DELTA row-wise is
    * exactly joining the filtered sides; excluded-row churn folds as a
    * no-op. Part of the fold rules — pass the same predicates every
    * refresh (the SQL surface persists them in the definition). */
  def refreshJoin(spark: SparkSession, viewPath: String,
      leftPath: String, leftTypes: String, leftCols: Seq[String],
      rightPath: String, rightTypes: String, rightCols: Seq[String],
      keys: Seq[String], stateBuckets: Int = AutoBuckets,
      leftFilter: Option[String] = None,
      rightFilter: Option[String] = None): JoinRefresh = {
    require(keys.nonEmpty, "refreshJoin needs join keys")
    require(stateBuckets >= 0,
      s"stateBuckets $stateBuckets must be >= 1 (or 0 = adaptive)")
    require(keys.forall(leftCols.contains) && keys.forall(rightCols.contains),
      s"join keys ${keys.mkString(",")} must appear in both column lists")
    val overlap = (leftCols.toSet & rightCols.toSet) -- keys.toSet
    require(overlap.isEmpty,
      s"non-key columns ${overlap.mkString(",")} appear on both sides — " +
        "project disjoint names")
    val headL = tableHead(spark, leftPath)
    val headR = tableHead(spark, rightPath)
    val ptr = readPointer(spark, viewPath)
    val wl = ptr.map(_.marks.getOrElse("left", 0L)).getOrElse(0L)
    val wr = ptr.map(_.marks.getOrElse("right", 0L)).getOrElse(0L)
    require(headL >= wl && headR >= wr,
      s"view watermarks ($wl,$wr) ahead of table heads ($headL,$headR)" +
        " — a table's snapshot history was reset under the view")
    if (headL == wl && headR == wr)
      return JoinRefresh(wl, headL, wr, headR, 0L)

    def side(path: String, types: String, cols: Seq[String],
        w: Long, head: Long,
        rowFilter: Option[String]): (DataFrame, DataFrame) = {
      // the side's row population: rowFilter applies to the old scan
      // AND the delta alike — filter-then-project on a Z-relation is
      // linear, so the filtered fold equals the filtered join
      def keep(df: DataFrame): DataFrame =
        rowFilter.fold(df)(f => df.where(expr(f)))
      // the table AT the previous watermark (the "old" side of the
      // bilinear rule), as a Z-relation with m=+1 per stored row
      val reader = spark.read.format("graft-records")
        .option("path", path).option("fieldTypes", types)
      val old =
        if (w == 0L)
          reader.option("versionAsOf", head.toString).load()
            .where(lit(false))
            .select(cols.map(col): _*).withColumn("m", lit(1L))
        else keep(reader.option("versionAsOf", w.toString).load())
          .select(cols.map(col): _*).withColumn("m", lit(1L))
      // the signed delta, projected to the view's columns (projection
      // of a Z-relation sums multiplicities). Netting BEFORE the
      // bilinear join is pure optimization — the algebra is linear and
      // the final consolidate nets regardless — so the extra shuffle is
      // paid only for multi-version catch-up windows, where churn
      // across versions can actually cancel; a single-version window
      // (the steady refresh cadence) feeds the join raw.
      val d =
        if (head == w) old.where(lit(false))
        else {
          val raw = keep(LakeChangelog.changes(spark, path, types, w, head))
            .select((cols.map(col) :+ col("m")): _*)
          if (head - w > 1) IncrementalAgg.consolidate(raw) else raw
        }
      (old, d)
    }
    val (oldL, dL) = side(leftPath, leftTypes, leftCols, wl, headL,
      leftFilter)
    val (oldR, dR) = side(rightPath, rightTypes, rightCols, wr, headR,
      rightFilter)
    val delta = IncrementalAgg.joinDelta(oldL, oldR, dL, dR, keys)
      .localCheckpoint()

    val fs = new Path(viewPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // ONE job computes the delta row count AND the touched-bucket set:
    // per-bucket counts under the modulus that WILL apply if no
    // migration happens (migration paths below never consult `touched`
    // — they treat all state as touched — so a modulus the growth check
    // overrides makes this grouping advisory, never wrong)
    val groupMod: Int =
      if (stateBuckets > 0) stateBuckets
      else ptr.flatMap(_.mod).getOrElse(DefaultBuckets)
    val bucketCounts: Map[Int, Long] = delta
      .groupBy(pmod(xxhash64(keys.map(col): _*), lit(groupMod.toLong))
        .cast("int").as("_b"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val deltaRows: Long = bucketCounts.values.sum
    // the modulus in force: explicit pins; adaptive keeps the recorded
    // one (growing 1 -> DefaultBuckets when the persisted state crosses
    // AutoBucketBytes) and bootstraps from the first delta's row count
    val effective: Int =
      if (stateBuckets > 0) stateBuckets
      else ptr match {
        case Some(p) => p.mod match {
          case Some(1) =>
            val bytes = p.buckets.values.map { b =>
              val bp = new Path(s"$viewPath/$b")
              if (fs.exists(bp)) fs.getContentSummary(bp).getLength else 0L
            }.sum
            if (bytes > AutoBucketBytes) DefaultBuckets else 1
          case Some(m) => m // never shrinks: stability beats reclaiming dirs
          case None => DefaultBuckets // LEGACY pointer (mod unrecorded):
            // never shrink existing state to the serial single-bucket
            // form — migrate once under the default modulus instead
        }
        case None => // true bootstrap: size off the first delta
          if (deltaRows >= AutoBucketRows) DefaultBuckets else 1
      }
    val bucketExpr = pmod(xxhash64(keys.map(col): _*),
      lit(effective.toLong)).cast("int")
    val touched: Set[Int] = bucketCounts.keySet
    // old state restricted to the touched buckets — by construction a
    // bucketed pointer's untouched buckets cannot change; a pre-bucketed
    // (dir-form) pointer, or one written under a DIFFERENT modulus
    // (incl. legacy pointers that recorded none), migrates by treating
    // ALL its state as touched: its bucket paths hash under the old
    // modulus, so inheriting them next to new-modulus deltas would
    // leave a key's +1 rows and -1 deltas in different buckets, never
    // netting
    val (oldTouched, inherited) = ptr match {
      case Some(p) if p.dir.isDefined =>
        (spark.read.parquet(s"$viewPath/${p.dir.get}"), Map.empty[Int, String])
      case Some(p) if !p.mod.contains(effective) =>
        val paths = p.buckets.values.toSeq.sorted.map(b => s"$viewPath/$b")
        val old = if (paths.isEmpty) delta.limit(0)
          else spark.read.parquet(paths: _*)
        (old, Map.empty[Int, String])
      case Some(p) =>
        val paths = p.buckets.filter { case (k, _) => touched.contains(k) }
          .values.toSeq.sorted.map(b => s"$viewPath/$b")
        val old = if (paths.isEmpty) delta.limit(0)
          else spark.read.parquet(paths: _*)
        (old, p.buckets.filterNot { case (k, _) => touched.contains(k) })
      case None => (delta.limit(0), Map.empty[Int, String])
    }
    // every delta row is in a touched bucket by construction, so the
    // rewrite set is exactly: touched buckets' old state + the delta
    val rewrite = IncrementalAgg.consolidate(oldTouched.unionByName(delta))
    val gen = ptr.map(_.gen).getOrElse(0L) + 1L
    val dataDir = s"data-g$gen"
    // bucket-aligned layout: ONE file per bucket dir (a scattered
    // partitionBy would write files-per-task-per-bucket, and the next
    // refresh pays the small-file tax reading them back). At modulus 1
    // a narrow coalesce replaces the hash shuffle outright.
    val laid = rewrite.withColumn("_bucket", bucketExpr)
    (if (effective == 1) laid.coalesce(1)
     else laid.repartition(math.min(effective, 200), col("_bucket")))
      .write.partitionBy("_bucket").mode("overwrite")
      .parquet(s"$viewPath/$dataDir")
    // what actually landed (a touched bucket whose rows all cancelled
    // writes no dir and drops out of the pointer)
    val present = fs.listStatus(new Path(s"$viewPath/$dataDir"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("_bucket="))
      .map(n => n.stripPrefix("_bucket=").toInt)
      .map(k => k -> s"$dataDir/_bucket=$k").toMap
    val buckets = inherited ++ present
    if (buckets.isEmpty) {
      // empty view: land a schema-bearing empty bucket so read() keeps
      // its shape
      rewrite.limit(0).write.mode("overwrite")
        .parquet(s"$viewPath/$dataDir/_bucket=-1")
      publish(spark, viewPath, gen,
        Map("left" -> headL, "right" -> headR), None,
        Map(-1 -> s"$dataDir/_bucket=-1"), Some(effective))
    } else
      publish(spark, viewPath, gen,
        Map("left" -> headL, "right" -> headR), None, buckets,
        Some(effective))
    JoinRefresh(wl, headL, wr, headR, deltaRows)
  }

  private def readFully(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }
}
