package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper

/** Incrementally-maintained materialized views over a record lake:
  * per-key aggregates (count + sums + optional min/max + exact
  * distinct counts), two-table join views, and COMPOSED views (an
  * aggregate maintained over a join view; three-table chains) that
  * refresh by consuming ONLY the snapshot deltas since their recorded
  * watermarks — [[LakeChangelog]]'s signed Z-relations folded into
  * persisted state, so keeping a view current costs ∝ what changed,
  * never a rescan of the table. The continuously-maintained-view story
  * (q286/q288's IVM algebra + q289/q294's change feeds) packaged as
  * one operator with durable state.
  *
  * Views are themselves CHANGE-FEED SOURCES: [[changesBetween]] diffs
  * two generation pointers exactly as the table changelog diffs
  * snapshot manifests, so ANY view form composes over any other. There
  * is ONE fold engine per state shape, written against the [[ZSource]]
  * seam (a lake table or a maintained view, each exposing a head, a
  * versioned Z-relation, and a signed change feed): every public
  * refresh form is sugar binding sources to it —
  * [[refreshAggregate]]/[[refreshAggregateOverView]] are the aggregate
  * fold over a table/view source, [[refreshJoin]]/[[refreshJoinOfViews]]
  * the bilinear join fold over two of them, and the pre-packaged chains
  * ([[refreshJoinAggregate]], [[refreshJoin3]]) are LITERALLY
  * compositions: refresh the inner join at `<viewPath>/inner`, then
  * fold the outer level from the inner's generation feed. Each level
  * watermarks on its source's generation; consumer lag is bounded by
  * `spark.graft.view.keepGenerations`, refusing loudly past it. A crash
  * between the two publishes leaves the outer exactly one source
  * generation behind, and the next chained refresh CATCHES UP from the
  * feed before advancing the inner — so the lag never outruns default
  * retention and heals without bespoke Z-algebra.
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
  * the generation after that reclaims it.
  *
  * BOTH forms hash-bucket their state by key (`stateBuckets`): a
  * refresh rewrites ONLY the buckets its delta touches, and untouched
  * buckets carry forward BY REFERENCE in the generation pointer — the
  * materialization cost is ∝ |touched buckets' state|, never the whole
  * view. For the aggregate form this is what makes a per-document /
  * per-URL keyed view (the reference's per-pk keyed target collection,
  * `lib/FirestoreWrapper.py:37-169`, at training-data cardinality)
  * refreshable forever: a bounded delta touches a bounded bucket set
  * no matter how many groups the state holds. */
object LakeView {

  /** How many generations (pointer + state dir) survive a flip. 2 =
    * current + previous: an in-flight reader of the superseded state
    * survives one concurrent refresh; its files are reclaimed only by
    * the NEXT one. Overridable per session via
    * `spark.graft.view.keepGenerations` — raise it when DOWNSTREAM
    * views consume this view's change feed ([[changesBetween]]) on a
    * slower cadence than it refreshes: a consumer's generation
    * watermark must still be live when it catches up, exactly a lake
    * table's snapshot-retention contract. */
  val KeepGenerations = 2

  private def keepGenerations(spark: SparkSession): Int = {
    val raw = spark.conf.getOption("spark.graft.view.keepGenerations")
      .getOrElse(KeepGenerations.toString)
    val k = try raw.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"spark.graft.view.keepGenerations must be an integer >= 2, " +
          s"got '$raw'")
    }
    // below 2 the invariants break outright: 0 would make publish
    // reclaim the just-flipped pointer and all state; 1 would reclaim
    // the superseded generation DURING the one concurrent refresh its
    // readers (and the concurrent level folds' pre-fold captures) are
    // entitled to survive
    require(k >= 2,
      s"spark.graft.view.keepGenerations must be >= 2 (got $k) — " +
        "retention below current+previous breaks in-flight readers")
    k
  }

  /** One aggregate-form refresh: the consumed snapshot window and the
    * TOUCHED-group count. `groupsChanged` counts groups the delta
    * touched, not groups whose stored values changed: a churn window
    * (insert + delete of identical rows) touches its group with a
    * net-zero delta, which folds to the same values but still reports —
    * and, under minMax/distinct rules, still rescans — that group.
    * `0` still means exactly "nothing to fold, nothing rewritten". */
  final case class Refresh(fromVersion: Long, toVersion: Long,
      groupsChanged: Long)

  /** One join-view refresh: the consumed snapshot windows of both
    * sides and the (un-netted) delta row count folded into the state. */
  final case class JoinRefresh(fromLeft: Long, toLeft: Long,
      fromRight: Long, toRight: Long, deltaRows: Long)

  /** One composed (aggregate-over-join) refresh: the inner join fold's
    * consumed windows and delta row count, plus the aggregate fold's
    * changed-group count. */
  final case class ComposedRefresh(fromLeft: Long, toLeft: Long,
      fromRight: Long, toRight: Long, deltaRows: Long,
      groupsChanged: Long)

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

  /** SEQUENTIAL-TINY-FOLD bounds: when a steady refresh's delta window
    * AND old-side scans are metadata-proven under these (manifest-diff
    * lengths + parquet-footer rows; pointer-recorded bucket bytes/rows),
    * every exchange in the fold plan is pure fixed cost — one task
    * chews through ≤ half a million narrow rows in a few hundred ms,
    * while the parallel plan pays several 32-way shuffle stages plus
    * their AQE rounds for the same kilobytes. Above the bounds the
    * parallel plan is untouched, so a 100 TB refresh never serializes:
    * the gate is a DATA bound, not a core-count tune. Overridable per
    * session (`spark.graft.view.tinyFoldBytes` / `...tinyFoldRows`);
    * 0 disables the tiny plan outright. */
  val TinyFoldBytes: Long = 32L << 20
  val TinyFoldRows: Long = 1L << 19

  private def tinySmall(spark: SparkSession,
      hint: Option[(Long, Long)]): Boolean = {
    val bb = spark.conf.getOption("spark.graft.view.tinyFoldBytes")
      .map(_.toLong).getOrElse(TinyFoldBytes)
    val rb = spark.conf.getOption("spark.graft.view.tinyFoldRows")
      .map(_.toLong).getOrElse(TinyFoldRows)
    hint.exists { case (bytes, rows) => bytes <= bb && rows < rb }
  }

  /** Adaptive-modulus GROWTH bound: keep per-bucket state under this
    * many bytes by doubling the modulus (hash-table-resize discipline —
    * one amortized full migration per doubling, the same migration path
    * a pinned-modulus change takes). Without growth a fixed modulus
    * makes a single-key refresh cost state/modulus — which is ∝ state
    * in disguise once the view outgrows its bucket count; with it a
    * touched-bucket rewrite is bounded no matter how big the view
    * grows. Overridable per session via
    * `spark.graft.view.targetBucketBytes` (specs shrink it to exercise
    * the doubling); [[MaxBuckets]] caps the directory fan-out. */
  val TargetBucketBytes: Long = 32L << 20
  val MaxBuckets: Int = 4096

  private def targetBucketBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.view.targetBucketBytes")
      .map(_.toLong).getOrElse(TargetBucketBytes)

  /** Smallest power-of-two multiple of `cur` (never shrinking) that
    * keeps bytes/modulus under the growth bound, capped.
    *
    * Cost note: the adaptive path sizes the persisted state from the
    * generation pointer's recorded per-bucket byte counts (inherited
    * buckets keep theirs verbatim; written buckets record at land time
    * off the landing listing — ∝ delta) — ZERO filesystem metadata
    * calls on the steady path. Only state written by a pre-`bytes`
    * pointer falls back to a per-bucket content-summary sweep, and
    * each rewrite stamps its buckets, so the fallback decays to
    * nothing ([[contentSweeps]] counts it). */
  private def grownModulus(spark: SparkSession, cur: Int,
      bytes: Long): Int = {
    val bound = targetBucketBytes(spark)
    var m = math.max(cur, 1)
    while (m < MaxBuckets && bytes / m > bound) m = math.min(m * 2, MaxBuckets)
    m
  }

  /** Broadcast gate for the extrema-rescan joins: the delta's distinct
    * key set (and the per-group recomputed extrema frame, same
    * cardinality) is broadcast only while the changed-group count stays
    * under this bound. An explicit `broadcast()` hint OVERRIDES
    * `autoBroadcastJoinThreshold`, so an unbounded key set — the
    * bootstrap refresh of a min/max view touches EVERY group in the
    * table, and a long catch-up window can too — would ship the whole
    * key dimension to every executor and can kill the driver building
    * it. Above the bound the semi join falls through to a plain
    * shuffled join (the planner's choice). Overridable per session via
    * `spark.graft.view.broadcastKeyLimit`. */
  val BroadcastKeyLimit: Long = 1L << 18

  private def broadcastLimit(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.view.broadcastKeyLimit")
      .map(_.toLong).getOrElse(BroadcastKeyLimit)

  /** A sum-column spec: either a bare column name (`Chars` → state
    * column `sum_Chars`) or `alias:expression`
    * (`rev:CAST(Price AS DECIMAL(18,2))` → state column `sum_rev`,
    * folding `sum(m * (expression))`). Any deterministic row-level
    * expression is fair game because aggregation over the signed delta
    * is LINEAR — filtering and projecting a Z-relation commute with the
    * fold. The expression's TYPE is preserved in the state schema (the
    * merged sum is cast back to the delta aggregate's type so the
    * schema cannot drift across generations): decimals give exact,
    * fold-order-independent money sums; doubles stay doubles. */
  private[graft] final case class SumSpec(alias: String, sql: String)

  /** A maintained per-group HISTOGRAM fold rule: fixed bin edges over
    * `[lo, hi)` in `bins` equal steps, stored as `hs_<col>` —
    * `array<long>` of length `bins + 2` (index 0 = underflow,
    * 1..bins = in-range, bins+1 = overflow; NULLs contribute nothing).
    * Bin counts are ADDITIVE in the signed delta — invertible under
    * deletes, unlike extrema/top-k — so histograms ride the pure
    * additive fold: no rescan ever, cost ∝ delta at any scale. */
  final case class HistSpec(col: String, lo: Double, hi: Double, bins: Int) {
    require(bins >= 1 && bins <= 512,
      s"histogram bins for '$col' must be in [1, 512], got $bins")
    require(hi > lo,
      s"histogram range for '$col' must have hi > lo, got [$lo, $hi)")
    private[graft] def width: Int = bins + 2
  }

  private[graft] def parseSum(spec: String): SumSpec = {
    val i = spec.indexOf(':')
    if (i > 0 && i < spec.length - 1 &&
        spec.take(i).trim.matches("[A-Za-z_][A-Za-z0-9_]*"))
      SumSpec(spec.take(i).trim, spec.drop(i + 1).trim)
    else SumSpec(spec.trim, spec.trim)
  }

  /** A generation pointer: one state-file path PER HASH BUCKET
    * (`buckets`) — mostly inherited from earlier generations, so a
    * refresh rewrites only the buckets its delta touched (the
    * snapshot-manifest trick one level up). Legacy aggregate pointers
    * (pre-bucketing) name ONE whole directory (`dir`) and migrate on
    * their next refresh. `mod` records the hash modulus the bucket
    * paths were written under: inherited buckets only net against
    * deltas hashed with the SAME modulus, so a refresh under a
    * different one must migrate (rewrite everything) rather than
    * silently mix.
    *
    * `kind` records which refresh form owns the state ("aggregate",
    * "join", "join_aggregate", "join3", "aggregate_over_view",
    * "join_of_views") — the wrong-refresh guard checks it explicitly
    * instead of inferring from mark names (a composed view's outer
    * aggregate and a plain join view both mark {left,right}, so marks
    * alone cannot tell them apart). It also tells [[changesBetween]]
    * whether the state is a Z-relation (rows carry `m`) or plain rows.
    *
    * `bytes` records each bucket's persisted size AT LAND TIME:
    * inherited buckets keep their recorded bytes verbatim, so the
    * adaptive growth check reads the pointer instead of sweeping the
    * filesystem — zero metadata RPCs on the steady path (a bucket a
    * pre-`bytes` pointer wrote falls back to a per-bucket sweep until
    * its next rewrite stamps it).
    *
    * `rows` records each bucket's EXACT row count at land time (parquet
    * footer of the landed file — one driver-local footer read per
    * written bucket, skipped past 64 touched buckets), inherited
    * verbatim like `bytes`: the "plainly small" gates get a sound row
    * bound instead of guessing rows from bytes (dictionary/RLE parquet
    * packs far more than bytes/8 rows — the round-15 advice hole).
    *
    * `schema` records the state schema AT LAND TIME (the writing
    * frame's schema, nullable-normalized to match parquet inference):
    * every state read passes it to the reader explicitly, so the
    * steady path never pays driver-side footer schema inference — a
    * measurable per-refresh fixed cost when a composed chain reads
    * state, feeds, and rescans several times per fold. */
  private case class Pointer(gen: Long, dir: Option[String],
      buckets: Map[Int, String], marks: Map[String, Long],
      mod: Option[Int], kind: Option[String],
      bytes: Map[Int, Long], rows: Map[Int, Long],
      schema: Option[org.apache.spark.sql.types.StructType])

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
    val kind = Option(root.get("kind")).filterNot(_.isNull).map(_.asText())
    val bytes = Option(root.get("bytes")).filterNot(_.isNull)
      .map(_.fields().asScala
        .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap)
      .getOrElse(Map.empty[Int, Long])
    val rows = Option(root.get("rows")).filterNot(_.isNull)
      .map(_.fields().asScala
        .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap)
      .getOrElse(Map.empty[Int, Long])
    val schema = Option(root.get("schema")).filterNot(_.isNull)
      .flatMap(s => scala.util.Try(
        org.apache.spark.sql.types.DataType.fromJson(s.asText())
          .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
    Pointer(g, d, buckets, marks, mod, kind, bytes, rows, schema)
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

  // ---- feed pins ----------------------------------------------------------

  /** In-JVM generation pins: a feed consumer registers the generations
    * its scan needs and retention ([[publish]]) DEFERS reclaiming them —
    * pointer file and state dirs — until the pin drops, so a same-process
    * maintainer can flip as often as it likes without pulling files out
    * from under an in-flight feed scan (the engine's concurrency model
    * is one driver JVM, many threads — exactly the chained-view and
    * maintainer/consumer shapes). Keyed by the fs-qualified view URI.
    * A maintainer in ANOTHER process cannot see these pins: there the
    * contract stays `spark.graft.view.keepGenerations` — raise it to
    * cover the consumer's lag, as [[changesBetween]]'s refusal says. */
  private val feedPins =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentHashMap[java.lang.Long,
        java.lang.Integer]]()

  private def pinKey(spark: SparkSession, viewPath: String): String = {
    val p = new Path(viewPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  private def pinnedGens(key: String): Set[Long] = {
    import scala.jdk.CollectionConverters._
    Option(feedPins.get(key))
      .map(_.keySet().asScala.map(Long2long).toSet)
      .getOrElse(Set.empty)
  }

  /** Run `f` with `gens` pinned at `viewPath`: a concurrent SAME-JVM
    * refresh can flip past them, but retention will not reclaim their
    * pointer or state until `f` returns. The internal fold drivers pin
    * their source windows automatically; scope an EXTERNAL consumer's
    * whole action (resolve feed → run the job) in this when a
    * concurrent maintainer is possible. Reentrant (pins count). */
  def withPinnedGenerations[T](spark: SparkSession, viewPath: String,
      gens: Seq[Long])(f: => T): T = {
    val key = pinKey(spark, viewPath)
    val held = gens.filter(_ > 0L).distinct
    val m = feedPins.computeIfAbsent(key,
      _ => new java.util.concurrent.ConcurrentHashMap())
    held.foreach(g => m.compute(g,
      (_, c) => Integer.valueOf(if (c == null) 1 else c.intValue() + 1)))
    try f
    finally held.foreach(g => m.compute(g,
      (_, c) => if (c == null || c.intValue() <= 1) null
        else Integer.valueOf(c.intValue() - 1)))
  }

  /** Atomically publish the pointer for `gen` (temp-write + rename to a
    * never-pre-existing name), then reclaim state no live pointer
    * references: retention is BY REFERENCE — the newest
    * [[KeepGenerations]] pointers pin whole dirs (legacy aggregate
    * form) and individual bucket dirs; a bucket dir an old generation
    * wrote stays alive for as long as a live pointer inherits it. */
  private def publish(spark: SparkSession, viewPath: String, gen: Long,
      marks: Map[String, Long], dataDir: Option[String],
      buckets: Map[Int, String], mod: Option[Int] = None,
      kind: Option[String] = None,
      bytes: Map[Int, Long] = Map.empty,
      rows: Map[Int, Long] = Map.empty,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Unit = phase("publish") {
    // validate the retention conf BEFORE the pointer flips: a bad value
    // leaves the view at its previous generation with an orphan data
    // dir (the crash-before-flip shape the next refresh overwrites),
    // never a flipped pointer whose retention half was skipped
    val keep = keepGenerations(spark)
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
    kind.foreach(root.put("kind", _))
    if (bytes.nonEmpty) {
      val bn = root.putObject("bytes")
      // only buckets the pointer actually references (a dropped bucket's
      // recorded size must not survive it)
      bytes.filter { case (k, _) => buckets.contains(k) }
        .foreach { case (k, v) => bn.put(k.toString, v) }
    }
    if (rows.nonEmpty) {
      val rn = root.putObject("rows")
      rows.filter { case (k, _) => buckets.contains(k) }
        .foreach { case (k, v) => rn.put(k.toString, v) }
    }
    schema.foreach(s => root.put("schema", s.json))
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

    // retention by reference; in-flight feed scans PIN generations
    // (same-JVM), deferring their reclaim to a post-release publish
    val allGens = fs.listStatus(dir).filter(_.isFile)
      .flatMap(st => ptrGen(st.getPath.getName)).sorted
    val liveGens = allGens.takeRight(keep).toSet ++
      (pinnedGens(pinKey(spark, viewPath)) & allGens.toSet)
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

  /** The view's current contents (aggregate views: `keyCols`, `n`, one
    * `sum_<alias>` per sum spec, `mn_<col>`/`mx_<col>` per min-max
    * column; join views: the joined columns plus the net multiplicity
    * `m`; composed views: the aggregate shape over the aggregate keys).
    * Empty before the first refresh.
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
            s"${keepGenerations(spark)} generations (raise " +
            "spark.graft.view.keepGenerations for slower consumers)")
        Some(parsePointer(fs, dir, g))
      case None => readPointer(spark, viewPath)
    }
    ptr match {
      case Some(p) => readFrom(spark, viewPath, p)
      case None => throw new IllegalStateException(
        s"no materialized view at $viewPath — refreshAggregate first")
    }
  }

  /** Parquet reader primed with the pointer-recorded state schema when
    * present — skips driver-side footer schema inference on every
    * steady-path state read (legacy pointers fall back to inference). */
  private def stateReader(spark: SparkSession,
      schema: Option[org.apache.spark.sql.types.StructType])
      : org.apache.spark.sql.DataFrameReader =
    schema.fold(spark.read)(s => spark.read.schema(s))

  /** The state a RESOLVED pointer names — the one read path under
    * [[read]] and [[readKeys]], so a caller that already holds a
    * pointer can never mix two generations within one call.
    *
    * A single-bucket state under the growth bound reads as one scan
    * partition anyway; COALESCE(1) exposes that fact to the planner as
    * SinglePartition (which satisfies every non-broadcast required
    * distribution), so a downstream global sort or aggregation skips
    * its exchange outright — tiny readouts drop a 32-way
    * rangepartitioning plus the range-bounds sampling job it needs.
    * Multi-bucket or unbounded state keeps its parallel scan. */
  private def readFrom(spark: SparkSession, viewPath: String,
      p: Pointer): DataFrame = {
    val paths = p.dir.map(d => Seq(s"$viewPath/$d"))
      .getOrElse(p.buckets.values.toSeq.sorted.map(b => s"$viewPath/$b"))
    val df = phase("read.plan")(stateReader(spark, p.schema).parquet(paths: _*))
    if (p.dir.isEmpty && p.buckets.size <= 1 &&
        p.buckets.keySet.subsetOf(p.bytes.keySet) &&
        p.bytes.values.sum <= AutoBucketBytes) df.coalesce(1) else df
  }

  /** Point/key reads served from the BUCKETED layout: hash the probe
    * keys under the pointer's recorded modulus and read ONLY the bucket
    * directories those keys land in — a key lookup against a huge
    * maintained view costs ∝ touched buckets (bounded per bucket by the
    * growth rule), never a state scan. The hash is evaluated through a
    * tiny Spark plan over the probe values AT THE STATE'S KEY TYPES, so
    * driver arithmetic can never drift from the xxhash64 the writer
    * bucketed with. Falls back to a filtered full read for legacy
    * whole-dir or single-bucket state (nothing to prune). Matching is
    * null-safe equality on `keyCols`, like the fold's key join. */
  def readKeys(spark: SparkSession, viewPath: String,
      keyCols: Seq[String], keyValues: Seq[Seq[Any]]): DataFrame = {
    require(keyCols.nonEmpty && keyValues.nonEmpty,
      "readKeys needs key columns and at least one probe row")
    require(keyValues.forall(_.length == keyCols.length),
      "every probe row must bind every key column")
    // ONE pointer resolve: both the pruned path and the fallback read
    // come from the same Pointer, so a refresh landing mid-call can
    // never mix one generation's bucket map with another's full read
    val ptr = readPointer(spark, viewPath).getOrElse(
      throw new IllegalStateException(
        s"no materialized view at $viewPath — refreshAggregate first"))
    val full = readFrom(spark, viewPath, ptr)
    def matches(df: DataFrame): Column = keyValues.map { vs =>
      keyCols.zip(vs).map { case (k, v) => df(k) <=> lit(v) }
        .reduce(_ && _)
    }.reduce(_ || _)
    val mod = ptr.mod.getOrElse(1)
    if (ptr.dir.isDefined || mod <= 1 || ptr.buckets.size <= 1)
      return full.filter(matches(full))
    // probe rows at the state's key types -> bucket ids (one tiny job)
    val keyFields = keyCols.map(k => full.schema(k))
    val probeRows = keyValues.map(vs =>
      org.apache.spark.sql.Row.fromSeq(vs)).toList
    import scala.jdk.CollectionConverters._
    val probes = spark.createDataFrame(probeRows.asJava,
      org.apache.spark.sql.types.StructType(keyFields))
    val touched: Set[Int] = probes
      .select(pmod(xxhash64(keyCols.map(col): _*), lit(mod.toLong))
        .cast("int").as("_b"))
      .collect().map(_.getInt(0)).toSet
    val paths = ptr.buckets.filter { case (b, _) => touched.contains(b) }
      .values.toSeq.sorted.map(p => s"$viewPath/$p")
    if (paths.isEmpty) return full.filter(lit(false))
    val pruned = stateReader(spark, ptr.schema).parquet(paths: _*)
    pruned.filter(matches(pruned))
  }

  /** Live (resolvable) generation numbers at `viewPath`, ascending. */
  def generations(spark: SparkSession, viewPath: String): Seq[Long] = {
    val dir = new Path(viewPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).filter(_.isFile)
      .flatMap(st => ptrGen(st.getPath.getName)).sorted.toSeq
  }

  /** The view's newest generation number — its "snapshot head" as a
    * change-feed source (0 = nothing materialized yet). Downstream
    * consumers watermark on this exactly as table consumers watermark
    * on snapshot versions. */
  def currentGeneration(spark: SparkSession, viewPath: String): Long =
    readPointer(spark, viewPath).map(_.gen).getOrElse(0L)

  /** The refresh form that owns the state at `viewPath` ("aggregate",
    * "join", "join_aggregate", "join3", "aggregate_over_view",
    * "join_of_views"). None for a legacy pointer that predates kind
    * stamping — one refresh under this build stamps it. */
  def viewKind(spark: SparkSession, viewPath: String): Option[String] =
    readPointer(spark, viewPath).flatMap(_.kind)

  /** Kinds whose state is a Z-relation (rows carry a net multiplicity
    * `m`) rather than plain rows. */
  private def isZRelation(kind: String): Boolean =
    kind == "join" || kind == "join3" || kind == "join_of_views"

  /** The signed content delta of a maintained view between two LIVE
    * generations — the view's CHANGE FEED, same Z-relation shape as a
    * table's [[LakeChangelog.changes]], which is what makes views
    * first-class IVM sources: any view form can consume any other view
    * exactly as it consumes a table.
    *
    * Derivation is metadata-first at the view layer: the two generation
    * pointers are manifests (one immutable state path per bucket,
    * untouched buckets inherited BY REFERENCE), so the pointer diff
    * names exactly the rewritten buckets — their old paths read with
    * multiplicity −1, their new paths +1, content-netted so unchanged
    * rows inside a rewritten bucket cancel. Cost ∝ touched buckets'
    * state (bounded per bucket by the growth rule), never the view.
    * Aggregate-shaped state emits rows ± 1; Z-relation state (join
    * kinds) emits each row at ± its stored multiplicity — in both
    * cases the columns are the view's own plus `m`.
    *
    * `fromGen = 0` is the bootstrap window ("before the first
    * generation"): the whole current state as inserts. Both named
    * generations must still be live — a consumer lagging past
    * retention fails loudly (raise `spark.graft.view.keepGenerations`,
    * the view-layer analog of snapshot retention). Liveness is checked
    * at RESOLVE time; against a concurrent SAME-JVM maintainer the scan
    * itself is protected by pinning: the internal fold drivers pin
    * their source windows automatically, and an external consumer
    * scopes its action in [[withPinnedGenerations]] — retention defers
    * reclaiming a pinned generation, so a flip can never pull files out
    * from under the scan (never a file-not-found; lagging past
    * retention before the pin still refuses loudly at resolve). A
    * maintainer in ANOTHER process cannot see pins — there, size
    * `keepGenerations >= 3` (current + the feed's two) to guarantee a
    * concurrent consumer its files. Requires a kind-stamped pointer
    * (any refresh under this build stamps it). */
  def changesBetween(spark: SparkSession, viewPath: String,
      fromGen: Long, toGen: Long): DataFrame = {
    require(fromGen >= 0 && fromGen < toGen,
      s"changesBetween: need 0 <= fromGen < toGen, got ($fromGen, $toGen)")
    val dir = new Path(viewPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = generations(spark, viewPath)
    def resolve(g: Long): Pointer = {
      if (!live.contains(g)) throw new IllegalStateException(
        s"view generation $g is not live at $viewPath (live: " +
          s"${live.mkString(", ")}) — a change-feed consumer lagging " +
          "past retention must either raise " +
          "spark.graft.view.keepGenerations or rebuild from generation 0")
      parsePointer(fs, dir, g)
    }
    val to = resolve(toGen)
    val kind = to.kind.getOrElse(throw new IllegalStateException(
      s"the pointer at $viewPath predates kind stamping — refresh the " +
        "view once under this build before consuming its change feed"))
    val z = isZRelation(kind)
    def pathsOf(p: Pointer): Set[String] =
      (p.dir.toSeq ++ p.buckets.values.toSeq).toSet
    val toPaths = pathsOf(to)
    val fromPtr = if (fromGen == 0L) None else Some(resolve(fromGen))
    val fromPaths = fromPtr.map(pathsOf).getOrElse(Set.empty[String])
    def side(rel: Set[String], sign: Long,
        schema: Option[org.apache.spark.sql.types.StructType])
        : Option[DataFrame] =
      if (rel.isEmpty) None
      else {
        val df = stateReader(spark, schema).parquet(
          rel.toSeq.sorted.map(r => s"$viewPath/$r"): _*)
        Some(if (z) df.withColumn("m", col("m") * lit(sign))
        else df.withColumn("m", lit(sign)))
      }
    val added = side(toPaths -- fromPaths, 1L, to.schema)
    val removed = side(fromPaths -- toPaths, -1L, fromPtr.flatMap(_.schema))
    val raw = (added, removed) match {
      case (Some(a), Some(r)) => a.unionByName(r)
      case (Some(a), None) => a
      case (None, Some(r)) => r
      case (None, None) =>
        // identical path sets: nothing changed between the generations
        val cur = read(spark, viewPath, Some(toGen))
        (if (z) cur else cur.withColumn("m", lit(1L))).where(lit(false))
    }
    IncrementalAgg.consolidate(raw)
  }

  // ---- the source seam ---------------------------------------------------

  /** A Z-relation change-feed SOURCE for the generic fold drivers: a
    * lake TABLE (watermarks = snapshot versions, feed = the manifest
    * CDC) or a maintained VIEW (watermarks = generation numbers, feed =
    * the pointer diff, [[changesBetween]]). The aggregate and join
    * drivers ([[refreshAggFrom]], [[refreshJoinFrom]]) are written ONCE
    * against this seam; every public refresh form is sugar binding
    * sources to them — one fold engine per state shape, one crash story
    * for all six view kinds. */
  private sealed trait ZSource {
    def describe: String
    /** Newest consumable version/generation; refuses loudly when the
      * source has nothing to consume yet. */
    def head(spark: SparkSession): Long
    /** Rows at version `v` as a Z-relation (`m` = stored multiplicity;
      * +1 per row for plain-row sources). */
    def rowsAt(spark: SparkSession, v: Long): DataFrame
    /** The source's live row population at `v` (no signed rows) — the
      * extrema/distinct rescan input. */
    def liveRowsAt(spark: SparkSession, v: Long): DataFrame
    /** Signed delta over `(from, to]`. [[netted]] tells the caller
      * whether content-level netting already happened (view feeds) or
      * the rows are the raw CDC (table feeds — netting a single window
      * there would be a pure extra shuffle; the folds' own grouping
      * subsumes it). */
    def changes(spark: SparkSession, from: Long, to: Long): DataFrame
    def netted: Boolean
    /** True when the rescan source is BOUNDED (a maintained state under
      * the single-bucket growth bound) — frees the aggregate fold to
      * recompute every group in one job instead of gating a semi-join
      * prune behind a count job. */
    def rescanBounded(spark: SparkSession): Boolean
    /** Run `f` with the source versions a fold scans PINNED against
      * concurrent reclaim ([[withPinnedGenerations]]) — a no-op for
      * tables (snapshot retention is the table tier's contract). */
    def withPins[T](spark: SparkSession, vers: Seq[Long])(f: => T): T = f
    /** `(bytes, rowsUpperBound)` of the source's state at version `v`,
      * when the source's metadata can answer WITHOUT a Spark job (a
      * table's manifest file list + parquet footers, a view pointer's
      * recorded bucket bytes) — the BOOTSTRAP size signal that lets a
      * fold skip its separate count action when the whole source is
      * plainly small. None means "unknown, take the counted path". */
    def sizeHint(spark: SparkSession, v: Long): Option[(Long, Long)] = None
    /** `(bytes, rowsUpperBound)` of the signed delta over `(from, to]`,
      * when source metadata can bound it without a Spark job — for a
      * table, the manifest diff's changed files (exactly the file set
      * the CDC scan will read: added, removed, dv-grown); for a view,
      * the generation pointers' differing buckets with their recorded
      * bytes/rows. The STEADY-path size signal behind the sequential
      * tiny fold (guide §2.4): a provably-tiny delta folding into a
      * provably-tiny state needs no exchanges at all. None means
      * "unknown, keep the parallel plan" — the scale-safe default. */
    def windowHint(spark: SparkSession, from: Long, to: Long)
        : Option[(Long, Long)] = None
    /** True when this source VOUCHES for a fused bootstrap despite
      * having no numeric size hint: the chained forms set it on the
      * fed inner feed when the inner join itself was gated smallBoot —
      * the outer aggregate's bootstrap volume is bounded by the SAME
      * join rows the inner fold just accepted for a serial
      * single-bucket landing, so fusing the outer adds no exposure the
      * inner did not already take (and the growth check migrates a
      * wrong guess at the next refresh either way). */
    def bootVouched: Boolean = false
  }

  private final case class TableZ(path: String, fieldTypes: String)
      extends ZSource {
    def describe = s"table $path"
    def head(spark: SparkSession): Long = tableHead(spark, path)
    def rowsAt(spark: SparkSession, v: Long): DataFrame =
      liveRowsAt(spark, v).withColumn("m", lit(1L))
    def liveRowsAt(spark: SparkSession, v: Long): DataFrame =
      spark.read.format("graft-records")
        .option("path", path).option("fieldTypes", fieldTypes)
        .option("versionAsOf", v.toString).load()
    def changes(spark: SparkSession, from: Long, to: Long): DataFrame =
      rawChanges(spark, path, fieldTypes, from, to)
    def netted = false
    def rescanBounded(spark: SparkSession) = false
    /** `(len, rowsUpper)` of one data file — stat + parquet footer (a
      * jsonl file bounds rows by bytes/3 — the only PROVABLE per-row
      * floor is the `{}` + newline framing; /20 assumed a record id,
      * which a minimal row need not carry, and the gate must never
      * UNDERcount rows). Driver metadata only. */
    private def fileHint(hfs: org.apache.hadoop.fs.FileSystem,
        conf: org.apache.hadoop.conf.Configuration, dir: Path,
        name: String): (Long, Long) = {
      val p = new Path(dir, name)
      val len = hfs.getFileStatus(p).getLen
      val rows =
        if (name.endsWith(".jsonl")) len / 3 + 1
        else {
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(p, conf))
          try r.getRecordCount finally r.close()
        }
      (len, rows)
    }

    private def sumHints(hfs: org.apache.hadoop.fs.FileSystem,
        conf: org.apache.hadoop.conf.Configuration, dir: Path,
        names: Iterable[String]): (Long, Long) =
      names.iterator.map(fileHint(hfs, conf, dir, _))
        .foldLeft((0L, 0L)) { case ((b, r), (db, dr)) => (b + db, r + dr) }

    /** Manifest file lengths + row counts from parquet footers —
      * driver metadata only. Capped: a manifest past 64 files is never
      * "plainly small", so answer None without stat-ing anything. */
    override def sizeHint(spark: SparkSession, v: Long)
        : Option[(Long, Long)] = {
      val dir = new Path(path)
      val conf = spark.sparkContext.hadoopConfiguration
      val hfs = dir.getFileSystem(conf)
      try {
        val m = graft.sources.v2.Snapshots.load(hfs, path, v)
        if (m.files.size > 64) None
        else Some(sumHints(hfs, conf, dir, m.files.map(_._1)))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** The manifest DIFF's changed files — exactly the set the CDC
      * scan of `(from, to]` will read (added, removed, and dv-changed
      * files; a dv-diff scan reads at most the whole file, so the full
      * length/rows are a sound upper bound). Capped at 64 changed
      * files, mirroring [[sizeHint]]. */
    override def windowHint(spark: SparkSession, from: Long, to: Long)
        : Option[(Long, Long)] = {
      if (to <= from) return Some((0L, 0L))
      val dir = new Path(path)
      val conf = spark.sparkContext.hadoopConfiguration
      val hfs = dir.getFileSystem(conf)
      try {
        def mf(v: Long): Map[String, Option[String]] =
          if (v == 0L) Map.empty
          else graft.sources.v2.Snapshots.load(hfs, path, v).files.toMap
        val f1 = mf(from)
        val f2 = mf(to)
        val changed = (f2.keySet -- f1.keySet) ++ (f1.keySet -- f2.keySet) ++
          (f1.keySet & f2.keySet).filter(n => f1(n) != f2(n))
        if (changed.size > 64) None
        else Some(sumHints(hfs, conf, dir, changed))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  private final case class ViewZ(path: String) extends ZSource {
    def describe = s"view $path"
    def head(spark: SparkSession): Long = {
      val g = currentGeneration(spark, path)
      require(g > 0L,
        s"source view $path has no materialized generation — refresh " +
          "it before folding a view over it")
      g
    }
    private def isZ(spark: SparkSession): Boolean =
      viewKind(spark, path).exists(isZRelation)
    def rowsAt(spark: SparkSession, v: Long): DataFrame = {
      val df = read(spark, path, Some(v))
      if (isZ(spark)) df else df.withColumn("m", lit(1L))
    }
    def liveRowsAt(spark: SparkSession, v: Long): DataFrame = {
      val df = read(spark, path, Some(v))
      if (isZ(spark)) df.filter(col("m") > 0) else df
    }
    def changes(spark: SparkSession, from: Long, to: Long): DataFrame =
      changesBetween(spark, path, from, to)
    def netted = true
    def rescanBounded(spark: SparkSession): Boolean =
      readPointer(spark, path).exists { p =>
        val fs = new Path(path).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        stateBytes(fs, path, p) <= AutoBucketBytes
      }
    override def withPins[T](spark: SparkSession, vers: Seq[Long])(
        f: => T): T = withPinnedGenerations(spark, path, vers)(f)
    /** The pointer's recorded per-bucket bytes AND rows — one pointer
      * JSON read, zero data I/O, and the row count is EXACT
      * (landed-footer counts carried in the pointer), closing the
      * round-15 advice hole where bytes/8 under-counted
      * dictionary/RLE-packed rows. Answers for ANY live generation
      * whose pointer carries full bytes+rows (a legacy pointer would
      * need a sweep — that's the counted path's job). */
    override def sizeHint(spark: SparkSession, v: Long)
        : Option[(Long, Long)] = {
      val dir = new Path(path)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      try {
        if (!generations(spark, path).contains(v)) return None
        parsePointer(fs, dir, v) match {
          case p if p.dir.isEmpty &&
              p.buckets.keySet.subsetOf(p.bytes.keySet) &&
              p.buckets.keySet.subsetOf(p.rows.keySet) =>
            Some((p.bytes.values.sum, p.rows.values.sum))
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** The generation-pointer DIFF's bytes/rows — exactly the buckets
      * [[changesBetween]] will read for `(from, to]`, from each
      * pointer's recorded per-bucket sizes. Zero data I/O; None when
      * either pointer predates rows recording or uses the legacy
      * whole-dir form. */
    override def windowHint(spark: SparkSession, from: Long, to: Long)
        : Option[(Long, Long)] = {
      if (from <= 0L) return None // bootstrap window: sizeHint's job
      val dir = new Path(path)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      try {
        val live = generations(spark, path)
        if (!live.contains(from) || !live.contains(to)) return None
        def entries(p: Pointer): Option[Map[String, (Long, Long)]] =
          if (p.dir.isEmpty &&
              p.buckets.keySet.subsetOf(p.bytes.keySet) &&
              p.buckets.keySet.subsetOf(p.rows.keySet))
            Some(p.buckets.map { case (k, rel) =>
              rel -> ((p.bytes(k), p.rows(k))) })
          else None
        for (ef <- entries(parsePointer(fs, dir, from));
             et <- entries(parsePointer(fs, dir, to))) yield {
          val diff = (et.keySet -- ef.keySet).toSeq.map(et) ++
            (ef.keySet -- et.keySet).toSeq.map(ef)
          diff.foldLeft((0L, 0L)) { case ((b, r), (db, dr)) =>
            (b + db, r + dr) }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** A view source whose NEWEST window's feed is already in hand: the
    * chained refreshes hold the signed delta they just folded into the
    * source view, and by Z-algebra `new − old ≡ that delta` (the
    * pointer diff content-nets to exactly what the fold consumed), so
    * serving it for THAT window skips re-reading the rewritten buckets
    * — the fused fast path of the composition. Any other window
    * (catch-up after a crash, consumer lag) falls through to the
    * generic pointer diff, so the crash story stays the feed's. The
    * delta may be un-netted; every consumer is linear in the
    * Z-relation. */
  private final case class FedViewZ(src: ViewZ, from: Long, to: Long,
      feed: DataFrame, innerSmallBoot: Boolean = false) extends ZSource {
    def describe = src.describe
    /** `to` IS the head by construction — the inner fold that produces
      * generation `to` may still be LANDING (the chained folds overlap),
      * so the pointer cannot be consulted. */
    def head(spark: SparkSession): Long = to
    /** The state at `to` by Z-ALGEBRA (pre-fold state ∪ feed,
      * consolidated) — generation `to`'s files may not exist yet (the
      * inner fold is landing concurrently); the identity `new ≡ old ∪ Δ`
      * frees the outer level from waiting on the inner level's I/O. */
    def rowsAt(spark: SparkSession, v: Long): DataFrame =
      if (v == to) {
        val old = if (from == 0L) feed.where(lit(false))
          else src.rowsAt(spark, from)
        IncrementalAgg.consolidate(old.unionByName(feed))
      } else src.rowsAt(spark, v)
    def liveRowsAt(spark: SparkSession, v: Long): DataFrame =
      if (v == to) rowsAt(spark, v).filter(col("m") > 0)
      else src.liveRowsAt(spark, v)
    def changes(spark: SparkSession, f: Long, t: Long): DataFrame =
      if (f == from && t == to) feed else src.changes(spark, f, t)
    def netted = true
    def rescanBounded(spark: SparkSession): Boolean =
      src.rescanBounded(spark)
    override def withPins[T](spark: SparkSession, vers: Seq[Long])(
        f: => T): T = src.withPins(spark, vers)(f)
    /** `to`'s files may still be landing; the pre-fold generation's
      * recorded bytes stand in (an underestimate by one delta — the
      * growth check on the NEXT refresh self-heals a wrong guess). */
    override def sizeHint(spark: SparkSession, v: Long)
        : Option[(Long, Long)] =
      src.sizeHint(spark, if (v == to) from else v)
        .filter(_ => from > 0L)
    /** The fed window's delta is an in-flight JOIN delta — no sound
      * metadata bound exists for a join's output volume, so the fed
      * window never claims tiny (None keeps the parallel plan); other
      * windows delegate to the real pointers. */
    override def windowHint(spark: SparkSession, f: Long, t: Long)
        : Option[(Long, Long)] =
      if (f == from && t == to) None else src.windowHint(spark, f, t)
    /** The inner fold's smallBoot gate carries over: see
      * [[ZSource.bootVouched]]. Only meaningful at the fed BOOTSTRAP
      * window (from == 0) — steady windows keep the hint discipline. */
    override def bootVouched: Boolean = innerSmallBoot && from == 0L
  }

  /** One side of a bilinear join fold: the source's Z-relation at the
    * old watermark and its signed delta over `(w, head]`, row-filtered
    * then projected to the view's columns. `w == 0` is the bootstrap —
    * an empty old side carrying the head's schema. Multi-version table
    * windows net early (churn across versions can actually cancel);
    * single windows and view feeds (already netted) feed the join raw —
    * the fold's final consolidate subsumes any remaining netting. */
  private def zSide(spark: SparkSession, src: ZSource,
      colNames: Seq[String], w: Long, head: Long,
      rowFilter: Option[String], tiny: Boolean = false)
      : (DataFrame, DataFrame) = {
    def keep(df: DataFrame): DataFrame =
      rowFilter.fold(df)(f => df.where(expr(f)))
    def project(df: DataFrame): DataFrame =
      df.select((colNames.map(col) :+ col("m")): _*)
    // tiny (sequential tiny fold): the caller metadata-proved this
    // side's old scan and delta window small — SinglePartition inputs
    // let every downstream join/agg skip its exchange
    def lay(df: DataFrame): DataFrame = if (tiny) df.coalesce(1) else df
    val old =
      if (w == 0L) project(src.rowsAt(spark, head)).where(lit(false))
      else lay(project(keep(src.rowsAt(spark, w))))
    val d =
      if (head == w) old.where(lit(false))
      else {
        val raw = lay(project(keep(src.changes(spark, w, head))))
        if (!src.netted && head - w > 1) IncrementalAgg.consolidate(raw)
        else raw
      }
    (old, d)
  }

  /** The ONE aggregate-refresh driver: advance the keyed aggregate
    * state at `viewPath` to `src`'s newest head, folding only the
    * signed feed of `(watermark, head]` ([[foldAggState]]); extrema/
    * distinct recomputes rescan `src`'s live rows at the new head,
    * pruned to the touched groups. [[refreshAggregate]] binds a table
    * source, [[refreshAggregateOverView]] a view source, and the
    * composed chain's outer level ([[refreshJoinAggregate]]) the inner
    * join view — same engine, same crash story. */
  private def refreshAggFrom(spark: SparkSession, src: ZSource,
      viewPath: String, keyCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String], rowFilter: Option[String],
      stateBuckets: Int, distinctCols: Seq[String],
      kind: String, mark: String, op: String,
      extraMarks: Map[String, Long] = Map.empty,
      topKs: Seq[(String, Int)] = Seq.empty,
      hists: Seq[HistSpec] = Seq.empty): Refresh = {
    require(keyCols.nonEmpty, s"$op needs key columns")
    val head = src.head(spark)
    val ptr = readPointer(spark, viewPath)
    requireKind(ptr, viewPath, kind, mark, op)
    val from = ptr.map(_.marks.getOrElse(mark, 0L)).getOrElse(0L)
    require(head >= from,
      s"view watermark $from is ahead of ${src.describe}'s head $head " +
        "— the source's history was reset under this view")
    if (head == from) return Refresh(from, head, 0L)
    // the window's generations stay pinned against a concurrent
    // same-JVM maintainer reclaiming them mid-scan
    src.withPins(spark, Seq(from, head)) {
      def filtered(df: DataFrame): DataFrame =
        rowFilter.fold(df)(f => df.where(expr(f)))
      val delta = filtered(src.changes(spark, from, head))
      def rescan: DataFrame = filtered(src.liveRowsAt(spark, head))
      // a bounded rescan source frees the fold to recompute all groups
      // in one job. Only computed when a rescan fold exists (dead
      // pointer-parse work on the additive-only steady path otherwise).
      // bootstrap-only size signal: grouped state cannot exceed the
      // source's bytes/rows, so a plainly-small source fuses the
      // bootstrap
      val smallBoot = ptr.isEmpty && stateBuckets == AutoBuckets &&
        (plainlySmall(src.sizeHint(spark, head)) || src.bootVouched)
      // a mod-1 pointer is the precondition for every fused/tiny form —
      // checked once, cheap (the pointer is already in hand)
      val mod1 = ptr.exists(p => p.dir.isEmpty && p.mod.contains(1))
      // a STEADY rescan fold is also bounded when the source itself is
      // metadata-proven tiny at the new head: recomputing every group
      // costs one scan of a tiny input, so the semi-join prune (and the
      // count job that gates its broadcast hint) buys nothing — at
      // scale the hint answers None/large and the two-phase path is
      // untouched
      val tinyRescan = mod1 && tinySmall(spark, src.sizeHint(spark, head))
      val bounded = (minMaxCols.nonEmpty || distinctCols.nonEmpty ||
          topKs.nonEmpty) &&
        (src.rescanBounded(spark) ||
          // at a small bootstrap the rescan source IS the small input
          // and every group is touched — all-group recompute is exact
          smallBoot || tinyRescan)
      // steady-path tiny-window signal (sequential tiny fold): only
      // probed when the pointer could fuse at all (mod-1 bucketed) —
      // the hint costs manifest/pointer metadata reads
      val tinyWin = mod1 &&
        tinySmall(spark, src.windowHint(spark, from, head))
      val changed = foldAggState(spark, viewPath, ptr, delta, keyCols,
        sumCols.map(parseSum), minMaxCols, rescan,
        Map(mark -> head) ++ extraMarks, stateBuckets, kind, distinctCols,
        rescanBounded = bounded, topKs = topKs, hists = hists,
        fusedBootstrap = smallBoot, tinyWindow = tinyWin)
      Refresh(from, head, changed)
    }
  }

  /** The ONE join-refresh driver: advance the Z-relation state at
    * `viewPath` to both sources' newest heads, folding the bilinear
    * delta `Δ(L⋈R) = ΔL⋈R@old + L@old⋈ΔR + ΔL⋈ΔR`
    * ([[IncrementalAgg.joinDelta]], multiplicities multiplying across
    * the join) into the bucketed state ([[foldJoinState]]). Old-side
    * scans are version/generation-pinned and join a small broadcast
    * delta, so a table source's runtime-filter pushdown prunes them to
    * the keys that changed. [[refreshJoin]] binds two tables,
    * [[refreshJoinOfViews]] two views, and [[refreshJoin3]]'s root an
    * inner view and a table. */
  private def refreshJoinFrom(spark: SparkSession, viewPath: String,
      left: ZSource, leftCols: Seq[String],
      right: ZSource, rightCols: Seq[String], keys: Seq[String],
      stateBuckets: Int, leftFilter: Option[String],
      rightFilter: Option[String], kind: String,
      markL: String, markR: String, op: String,
      extraMarks: Map[String, Long] = Map.empty): JoinRefresh = {
    val p = planJoin(spark, viewPath, left, leftCols, right, rightCols,
      keys, stateBuckets, leftFilter, rightFilter, kind, markL, markR,
      op, extraMarks)
    val rows =
      try p.fold()
      finally p.delta.foreach(_.unpersist(false))
    JoinRefresh(p.wl, p.headL, p.wr, p.headR, rows)
  }

  /** A PLANNED (not yet executed) join refresh: the resolved windows,
    * the CACHED signed delta (None = idle), and the fold to run. The
    * split lets the chained forms overlap the inner's fold with the
    * outer level's — the outer consumes the cached delta and the
    * PRE-fold state ([[FedViewZ]]), never the inner fold's output, so
    * the two levels' Spark jobs share the cluster instead of
    * serializing. The planner's caller owns the cached delta's
    * unpersist — a cache entry must never outlive the refresh that made
    * it (a later run over the same mutable paths could plan-match the
    * stale relation). `fold()` publishes generation `gen+1` and returns
    * the (un-netted) delta row count; with no delta it returns 0
    * without publishing. */
  private final case class PlannedJoin(wl: Long, headL: Long, wr: Long,
      headR: Long, delta: Option[DataFrame], fold: () => Long,
      smallBoot: Boolean = false)

  private def planJoin(spark: SparkSession, viewPath: String,
      left: ZSource, leftCols: Seq[String],
      right: ZSource, rightCols: Seq[String], keys: Seq[String],
      stateBuckets: Int, leftFilter: Option[String],
      rightFilter: Option[String], kind: String,
      markL: String, markR: String, op: String,
      extraMarks: Map[String, Long],
      shared: Boolean = false): PlannedJoin = {
    require(stateBuckets >= 0,
      s"stateBuckets $stateBuckets must be >= 1 (or 0 = adaptive)")
    validateJoinCols(leftCols, rightCols, keys)
    val headL = left.head(spark)
    val headR = right.head(spark)
    val ptr = readPointer(spark, viewPath)
    requireKind(ptr, viewPath, kind, markL, op)
    val wl = ptr.map(_.marks.getOrElse(markL, 0L)).getOrElse(0L)
    val wr = ptr.map(_.marks.getOrElse(markR, 0L)).getOrElse(0L)
    require(headL >= wl && headR >= wr,
      s"view watermarks ($wl,$wr) ahead of source heads ($headL,$headR)" +
        s" — a source's history (${left.describe}; ${right.describe}) " +
        "was reset under the view")
    if (headL == wl && headR == wr)
      return PlannedJoin(wl, headL, wr, headR, None, () => 0L)
    // bootstrap-only size signal: both sides' metadata must answer
    val smallBoot = ptr.isEmpty && stateBuckets == AutoBuckets &&
      plainlySmall(for (l <- left.sizeHint(spark, headL);
        r <- right.sizeHint(spark, headR))
        yield (l._1 + r._1, l._2 + r._2))
    // steady-path tiny signal (sequential tiny fold): the state could
    // fuse (mod-1 pointer), AND both sides' delta windows AND old-side
    // scans are metadata-proven tiny — then no exchange in the bilinear
    // fold pays for itself. A side's missing hint keeps the parallel
    // plan (None never claims tiny).
    val tinySteady = ptr.exists(p => p.dir.isEmpty && p.mod.contains(1)) &&
      tinySmall(spark, for {
        lw <- left.windowHint(spark, wl, headL)
        rw <- right.windowHint(spark, wr, headR)
        lo <- if (wl == 0L) Some((0L, 0L)) else left.sizeHint(spark, wl)
        ro <- if (wr == 0L) Some((0L, 0L)) else right.sizeHint(spark, wr)
      } yield (lw._1 + rw._1 + lo._1 + ro._1,
        lw._2 + rw._2 + lo._2 + ro._2))
    val tiny = smallBoot || tinySteady
    val (oldL, dL) = zSide(spark, left, leftCols, wl, headL, leftFilter,
      tiny)
    val (oldR, dR) = zSide(spark, right, rightCols, wr, headR, rightFilter,
      tiny)
    val delta0 = IncrementalAgg.joinDelta(oldL, oldR, dL, dR, keys)
    // cached only when a SECOND consumer exists: the chained forms feed
    // the same delta to the outer fold (shared), and the counted path
    // reads it twice (bucket counts + rewrite). The fused unchained
    // fold consumes it exactly once — an InMemoryRelation there is a
    // columnar materialization bought for nothing.
    val fs = new Path(viewPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val willFuse = (smallBoot && ptr.isEmpty) ||
      fusedMod1(spark, fs, viewPath, ptr, stateBuckets)
    val delta = if (shared || !willFuse) delta0.cache() else delta0
    // view-source windows stay pinned for the fold's scans against a
    // concurrent same-JVM maintainer reclaiming them (no-op for tables)
    PlannedJoin(wl, headL, wr, headR, Some(delta),
      () => left.withPins(spark, Seq(wl, headL)) {
        right.withPins(spark, Seq(wr, headR)) {
          foldJoinState(spark, viewPath, ptr, delta, keys, stateBuckets,
            Map(markL -> headL, markR -> headR) ++ extraMarks, kind,
            fusedBootstrap = smallBoot, tinyWindow = tinySteady)
        }
      }, smallBoot = smallBoot)
  }

  /** Executor for the CONCURRENT level folds of the chained forms: the
    * two levels' Spark jobs are independent (the outer consumes the
    * pre-fold state and the cached delta, never the inner fold's
    * output), so they overlap on the cluster's slack instead of
    * serializing two ~equal-sized jobs. Daemon threads; the shared
    * cached delta dedupes at the block-manager level. */
  private lazy val foldEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(
        (r: Runnable) => {
          val t = new Thread(r, "lakeview-fold")
          t.setDaemon(true)
          t
        }))

  /** The shared two-level chain driver under [[refreshJoinAggregate]]
    * and [[refreshJoin3]]: catch the outer level up from the inner's
    * generation feed when a crash left it BEHIND (before the inner
    * advances, while default retention still holds the window); plan
    * the inner table-join fold; run it concurrently with the outer
    * fold (the outer consumes the cached delta as the feed of
    * `(preGen, preGen+1]` — [[FedViewZ]]); await both. Either level may
    * therefore publish first, and both crash orderings heal: a lagging
    * OUTER catches up from the feed; a lagging INNER refolds its
    * window deterministically while the outer idles at the matched
    * generation — guarded by the source heads stamped on the outer's
    * pointer (`src_left`/`src_right`), because a refold after FURTHER
    * source commits would contain more than the outer consumed and the
    * difference would otherwise be skipped silently.
    *
    * Returns (inner refresh, outer units — whatever `foldOuter`
    * reports, changed groups or delta rows, summed across the catch-up
    * and steady folds). */
  private def chainedRefresh(spark: SparkSession, viewPath: String,
      innerPath: String, mark: String, op: String,
      planInner: () => PlannedJoin,
      foldOuter: (ZSource, Map[String, Long]) => Long)
      : (JoinRefresh, Long) = {
    def srcMarks(): Map[String, Long] =
      readPointer(spark, innerPath).map(ip => Map(
        "src_left" -> ip.marks.getOrElse("left", 0L),
        "src_right" -> ip.marks.getOrElse("right", 0L)))
        .getOrElse(Map.empty)
    val outerPtr = readPointer(spark, viewPath)
    val outerGen = outerPtr.map(_.marks.getOrElse(mark, 0L)).getOrElse(0L)
    val preGen = currentGeneration(spark, innerPath)
    var outerUnits = 0L
    if (preGen > outerGen)
      outerUnits += foldOuter(ViewZ(innerPath), srcMarks())
    val p = planInner()
    if (outerGen > preGen) {
      require(outerGen == preGen + 1,
        s"$op: the outer level at $viewPath is ${outerGen - preGen} " +
          s"source generations ahead of $innerPath — the inner's " +
          "generation history was reset under it; rebuild the view")
      val okL = outerPtr.flatMap(_.marks.get("src_left"))
        .forall(_ == p.headL)
      val okR = outerPtr.flatMap(_.marks.get("src_right"))
        .forall(_ == p.headR)
      require(okL && okR,
        s"$op: a crashed chained refresh left $viewPath one source " +
          s"generation ahead of $innerPath AND the source tables " +
          "advanced since — the inner refold can no longer reproduce " +
          "the exact window the outer consumed; rebuild the view from " +
          "generation 0")
    }
    p.delta match {
      case None =>
        // inner idle: the outer is current (or just caught up) — its
        // no-op check costs a pointer read
        outerUnits += foldOuter(ViewZ(innerPath), srcMarks())
        (JoinRefresh(p.wl, p.headL, p.wr, p.headR, 0L), outerUnits)
      case Some(d) =>
        try {
          import scala.concurrent.{Await, Future}
          import scala.concurrent.duration.Duration
          val innerF = Future(p.fold())(foldEc)
          val steady =
            try foldOuter(FedViewZ(ViewZ(innerPath), preGen, preGen + 1, d,
                innerSmallBoot = p.smallBoot),
              Map("src_left" -> p.headL, "src_right" -> p.headR))
            catch { case t: Throwable =>
              // let the inner settle (ready, not result: a failed fold
              // must not mask the outer's exception) before rethrowing
              scala.util.Try(Await.ready(innerF, Duration.Inf))
              throw t
            }
          outerUnits += steady
          val rows = Await.result(innerF, Duration.Inf)
          (JoinRefresh(p.wl, p.headL, p.wr, p.headR, rows), outerUnits)
        } finally d.unpersist(false)
    }
  }

  /** Advance an aggregate view maintained OVER ANOTHER MAINTAINED VIEW
    * — general composition: the source view's generation feed
    * ([[changesBetween]]) plays the role a table's changelog plays in
    * [[refreshAggregate]], folded by the SAME engine into the same
    * hash-bucketed state. Aggregate-over-aggregate, rollups over
    * composed views, arbitrary depth — each level watermarks on its
    * source's generation number and refreshes ∝ the source's touched
    * state. `minMaxCols`/`distinctCols` recompute touched groups from
    * the SOURCE VIEW's current contents (its row population), the same
    * rescan discipline as the table form. Refresh the SOURCE first,
    * then this view — a consumer lagging more than
    * `spark.graft.view.keepGenerations − 1` source refreshes must raise
    * that retention (the loud failure names it). */
  def refreshAggregateOverView(spark: SparkSession,
      sourceViewPath: String, viewPath: String,
      keyCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Seq.empty,
      rowFilter: Option[String] = None,
      stateBuckets: Int = AutoBuckets,
      distinctCols: Seq[String] = Seq.empty,
      topKs: Seq[(String, Int)] = Seq.empty,
      hists: Seq[HistSpec] = Seq.empty): Refresh =
    refreshAggFrom(spark, ViewZ(sourceViewPath), viewPath, keyCols,
      sumCols, minMaxCols, rowFilter, stateBuckets, distinctCols,
      "aggregate_over_view", "srcgen", "refreshAggregateOverView",
      topKs = topKs, hists = hists)

  /** Advance a JOIN view whose BOTH sides are maintained views — the
    * other half of general composition. The bilinear rule is the same
    * as [[refreshJoin]]'s, with each side's "table at the old
    * watermark" being the source view READ AT ITS WATERMARKED
    * GENERATION (retention keeps it live across one source refresh;
    * raise `spark.graft.view.keepGenerations` for slower cadences) and
    * each side's delta the generation feed ([[changesBetween]]).
    * Z-relation sources contribute their stored multiplicities;
    * aggregate-shaped sources contribute each row once. Non-key
    * columns of the two sides must be disjoint; `leftCols`/`rightCols`
    * must include `keys` and name columns of the source views' states
    * (an aggregate source exposes its keys, `n`, `sum_*`, `mn_*`/
    * `mx_*`, `dc_*`). */
  def refreshJoinOfViews(spark: SparkSession, viewPath: String,
      leftViewPath: String, leftCols: Seq[String],
      rightViewPath: String, rightCols: Seq[String],
      keys: Seq[String], stateBuckets: Int = AutoBuckets,
      leftFilter: Option[String] = None,
      rightFilter: Option[String] = None): JoinRefresh =
    refreshJoinFrom(spark, viewPath, ViewZ(leftViewPath), leftCols,
      ViewZ(rightViewPath), rightCols, keys, stateBuckets, leftFilter,
      rightFilter, "join_of_views", "lgen", "rgen", "refreshJoinOfViews")

  /** One distinct-count chain refresh: the table snapshot window the
    * value level consumed, the touched (group, value) multiplicity rows,
    * and the outer level's changed-group count. */
  final case class ChainRefresh(fromVersion: Long, toVersion: Long,
      valuesChanged: Long, groupsChanged: Long)

  /** Exact per-group `COUNT(DISTINCT valueCol)` maintained FULLY
    * INCREMENTALLY — no rescan under inserts OR retractions — by the
    * classic IVM factorization into two chained ADDITIVE views:
    *
    *  - the VALUE level (state at `chainPath/_values`): multiplicities
    *    keyed by `(keyCols..., valueCol)` via [[refreshAggregate]] —
    *    a state row is live ⟺ its value still occurs (the fold drops
    *    `n = 0` rows);
    *  - the COUNT level (state at `chainPath`): an aggregate over the
    *    value level's GENERATION FEED via [[refreshAggregateOverView]]
    *    — aggregate-shaped state emits ±1 per row, so the per-group
    *    `n` is exactly the number of live `(group, value)` rows =
    *    `COUNT(DISTINCT valueCol)`. A value whose multiplicity merely
    *    CHANGED emits a −1/+1 pair that folds to zero; a value born
    *    (or killed — a delete wave removing a whole value class) emits
    *    a lone +1 (−1), moving the count by exactly one.
    *
    * Contrast with `distinctCols` on [[refreshAggregate]] (the `dc_`
    * rule): that form recomputes TOUCHED groups by rescanning the
    * source's rows for those groups — exact and self-contained, but a
    * HOT group pays its full history on every window that touches it.
    * Here both folds are ∝ delta (the feed reads only rewritten value-
    * level buckets, bounded by the growth rule), at the price of the
    * value-level state (∝ live distinct `(group, value)` pairs — the
    * information-theoretic floor for exactness under retraction; an
    * HLL register carry would be smaller but approximate AND wrong
    * under deletes). NULLs are excluded, matching `COUNT(DISTINCT)`;
    * a group whose every value is NULL has no row (its count is 0 by
    * absence, not a stored 0). Read the counts with
    * `read(spark, chainPath)`: `(keyCols..., n)` where `n` IS the
    * distinct count.
    *
    * Crash discipline is catch-up-before-advance, like the composed
    * kinds: the outer level folds to the inner's CURRENT head before
    * the inner advances, so the outer's watermark never lags more than
    * one value-level generation and default retention (2) always keeps
    * its feed window live — a crash between the two level refreshes
    * heals on the next call with no bespoke recovery. */
  def refreshDistinctCount(spark: SparkSession, tablePath: String,
      fieldTypes: String, chainPath: String, keyCols: Seq[String],
      valueCol: String, rowFilter: Option[String] = None,
      stateBuckets: Int = AutoBuckets): ChainRefresh =
    refreshDistinctChain(spark, chainPath, keyCols, valueCol, rowFilter,
      stateBuckets, (valuesPath, filter) =>
        refreshAggregate(spark, tablePath, fieldTypes, valuesPath,
          keyCols :+ valueCol, Seq.empty, rowFilter = filter,
          stateBuckets = stateBuckets))

  /** [[refreshDistinctCount]] with ANOTHER MAINTAINED VIEW as the
    * source — `COUNT(DISTINCT valueCol)` over a view's rows, ∝ delta.
    * Z-relation sources (join kinds) contribute their stored
    * multiplicities to the value level, so over a maintained JOIN view
    * this counts distinct values of the JOIN RESULT per group —
    * e.g. distinct customers per segment over orders ⋈ customer —
    * with retractions on either base table flowing through the join's
    * feed into a lone −1 per dying value class. Refresh the source
    * view first, then this chain. */
  def refreshDistinctCountOverView(spark: SparkSession,
      sourceViewPath: String, chainPath: String, keyCols: Seq[String],
      valueCol: String, rowFilter: Option[String] = None,
      stateBuckets: Int = AutoBuckets): ChainRefresh =
    refreshDistinctChain(spark, chainPath, keyCols, valueCol, rowFilter,
      stateBuckets, (valuesPath, filter) =>
        refreshAggregateOverView(spark, sourceViewPath, valuesPath,
          keyCols :+ valueCol, Seq.empty, rowFilter = filter,
          stateBuckets = stateBuckets))

  private def refreshDistinctChain(spark: SparkSession, chainPath: String,
      keyCols: Seq[String], valueCol: String, rowFilter: Option[String],
      stateBuckets: Int,
      foldValues: (String, Option[String]) => Refresh): ChainRefresh = {
    require(!valueCol.contains("`"),
      s"distinct-count chain: backtick in value column name '$valueCol'")
    val valuesPath = s"$chainPath/_values"
    val notNull = s"`$valueCol` IS NOT NULL"
    val filter = rowFilter.map(f => s"($f) AND $notNull").orElse(Some(notNull))
    def foldOuter(): Long =
      refreshAggregateOverView(spark, valuesPath, chainPath,
        keyCols, Seq.empty, stateBuckets = stateBuckets).groupsChanged
    // catch-up: heal a crash that advanced the value level but not the
    // count level (idle cost = one pointer read); skipped before the
    // value level's very first generation exists
    val caughtUp =
      if (readPointer(spark, valuesPath).isDefined) foldOuter() else 0L
    val inner = foldValues(valuesPath, filter)
    val steady = foldOuter()
    ChainRefresh(inner.fromVersion, inner.toVersion, inner.groupsChanged,
      caughtUp + steady)
  }

  private def tableHead(spark: SparkSession, tablePath: String): Long =
    phase("head") {
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

  /** The RAW (un-netted) CDC feed of `(fromV, toV]` — the fold paths
    * read this instead of [[LakeChangelog.changes]] because every fold
    * is LINEAR in the delta: the aggregate fold's own group-by and the
    * join fold's final consolidate subsume content-level netting, so
    * paying `changes`' groupBy-all-columns shuffle up front would be a
    * pure extra stage per delta side per refresh. Multi-version windows
    * still net early where churn can actually cancel (the existing
    * joinDeltaBetween optimization). */
  private def rawChanges(spark: SparkSession, path: String,
      fieldTypes: String, fromV: Long, toV: Long): DataFrame =
    spark.read.format("graft-records")
      .option("path", path).option("fieldTypes", fieldTypes)
      .option("cdc", "true")
      .option("startingVersion", fromV.toString)
      .option("endingVersion", toV.toString)
      .load()

  /** Null-safe equi-join condition on `keys` between `l` and `r` —
    * USING-joins and plain `===` never match NULL key values, which
    * would split a NULL-keyed group into a fresh row every refresh. */
  private def nullSafeOn(l: DataFrame, r: DataFrame,
      keys: Seq[String]): Column =
    keys.map(k => l(k) <=> r(k)).reduce(_ && _)

  /** Test hook: counts filesystem content-summary sweeps taken because
    * a pointer lacked a recorded byte size (legacy pointers only — the
    * steady path reads sizes from the pointer and never sweeps). */
  private[graft] val contentSweeps =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Dev profiling sink: when set (ProfileLakeView), every internal
    * phase reports its wall time; nil by default — one volatile read
    * per phase on the production path. */
  @volatile private[graft] var phaseSink: (String, Double) => Unit = null

  @inline private def phase[T](name: String)(f: => T): T = {
    val sink = phaseSink
    if (sink == null) f
    else {
      val t0 = System.nanoTime()
      val r = f
      sink(name, (System.nanoTime() - t0) / 1e9)
      r
    }
  }

  /** Persisted bytes of the state a pointer references: recorded
    * per-bucket sizes from the pointer where present (inherited buckets
    * carry them verbatim — zero metadata RPCs), a content-summary sweep
    * only for state a pre-`bytes` pointer wrote (each rewrite stamps
    * its buckets, so the fallback decays to nothing). */
  private def stateBytes(fs: org.apache.hadoop.fs.FileSystem,
      viewPath: String, p: Pointer): Long = {
    def sweep(rel: String): Long = {
      contentSweeps.incrementAndGet()
      val bp = new Path(s"$viewPath/$rel")
      if (fs.exists(bp)) fs.getContentSummary(bp).getLength else 0L
    }
    p.dir.map(sweep).getOrElse(0L) +
      p.buckets.iterator.map { case (k, rel) =>
        p.bytes.getOrElse(k, sweep(rel))
      }.sum
  }

  /** Land `rows` as generation `gen`'s bucketed state and flip the
    * pointer. Bucket-aligned layout: ONE file per bucket dir (a
    * scattered partitionBy would write files-per-task-per-bucket, and
    * the next refresh pays the small-file tax reading them back); at
    * modulus 1 a narrow coalesce replaces the hash shuffle outright.
    * A touched bucket whose rows all cancelled writes no dir and drops
    * out of the pointer; `inherited` buckets carry forward untouched. */
  private def landBuckets(spark: SparkSession, viewPath: String,
      gen: Long, rows: DataFrame, keyCols: Seq[String], effective: Int,
      inherited: Map[Int, String], marks: Map[String, Long],
      kind: String, inheritedBytes: Map[Int, Long],
      inheritedRows: Map[Int, Long]): Unit = {
    val fs = new Path(viewPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val bucketExpr = pmod(xxhash64(keyCols.map(col): _*),
      lit(effective.toLong)).cast("int")
    val dataDir = s"data-g$gen"
    val stateSchema = Some(org.apache.spark.sql.types.StructType(
      rows.schema.map(_.copy(nullable = true))))
    val (landedBytes, landedRows): (Map[Int, Long], Map[Int, Long]) =
      if (effective == 1) {
        val (b, r) = landSingle(spark, fs, viewPath, gen, rows)
        (Map(0 -> b), Map(0 -> r))
      } else {
        phase("land.write")(
          rows.withColumn("_bucket", bucketExpr)
            .repartition(math.min(effective, 200), col("_bucket"))
            .write.partitionBy("_bucket").mode("overwrite")
            .parquet(s"$viewPath/$dataDir"))
        // what actually landed, with per-bucket bytes off the SAME
        // listing (recorded in the pointer so the growth check never
        // sweeps), and per-bucket footer row counts (recorded so the
        // size gates get exact rows — skipped past 64 touched buckets,
        // where the view is plainly not "small" anyway)
        val acc = scala.collection.mutable.Map.empty[Int, Long]
        val paths = scala.collection.mutable.ArrayBuffer.empty[(Int, Path)]
        phase("land.list") {
          val files = fs.listFiles(new Path(s"$viewPath/$dataDir"), true)
          while (files.hasNext) {
            val st = files.next()
            val parent = st.getPath.getParent.getName
            if (st.isFile && parent.startsWith("_bucket=") &&
                !st.getPath.getName.startsWith("_")) {
              val k = parent.stripPrefix("_bucket=").toInt
              acc.update(k, acc.getOrElse(k, 0L) + st.getLen)
              paths += ((k, st.getPath))
            }
          }
        }
        val rAcc =
          if (paths.size > 64) Map.empty[Int, Long]
          else phase("land.rows")(paths.foldLeft(Map.empty[Int, Long]) {
            case (m, (k, p)) =>
              m.updated(k, m.getOrElse(k, 0L) + footerRows(spark, p))
          })
        (acc.toMap, rAcc)
      }
    val present = landedBytes.keysIterator
      .map(k => k -> s"$dataDir/_bucket=$k").toMap
    val buckets = inherited ++ present
    if (buckets.isEmpty) {
      // empty view: land a schema-bearing empty bucket so read() keeps
      // its shape
      rows.limit(0).write.mode("overwrite")
        .parquet(s"$viewPath/$dataDir/_bucket=-1")
      publish(spark, viewPath, gen, marks, None,
        Map(-1 -> s"$dataDir/_bucket=-1"), Some(effective), Some(kind),
        Map(-1 -> 0L), Map(-1 -> 0L), stateSchema)
    } else
      publish(spark, viewPath, gen, marks, None, buckets, Some(effective),
        Some(kind),
        inheritedBytes.filter { case (k, _) => inherited.contains(k) } ++
          landedBytes,
        inheritedRows.filter { case (k, _) => inherited.contains(k) } ++
          landedRows,
        stateSchema)
  }

  /** Advance the view to the table's newest snapshot, consuming only
    * `(watermark, head]` deltas. Count and sums fold additively from
    * the signed delta; `minMaxCols` (non-invertible under deletes)
    * recompute ONLY the touched groups from the live table, pruned by
    * a semi join on the delta's keys (broadcast while the changed-group
    * count is under [[BroadcastKeyLimit]], shuffled above it). A no-op
    * (0 changed) when the table has not snapshotted since the last
    * refresh.
    *
    * `sumCols` entries are [[SumSpec]] strings: a bare column name or
    * `alias:expression` for derived-column sums (the expression string
    * is part of the view's fold rules — pass the same one every
    * refresh; the SQL surface persists it in the definition).
    *
    * `rowFilter`: an optional SQL predicate restricting the view to
    * matching rows (`SELECT keys, aggs FROM t WHERE pred GROUP BY keys`,
    * maintained incrementally). Aggregation is LINEAR over the signed
    * delta, so filtering the delta row-wise is exactly filtering the
    * table — a delete of rows the predicate excludes folds as a no-op.
    * The predicate is part of the view's FOLD RULES: pass the same one
    * every refresh (the SQL surface enforces this structurally). */
  def refreshAggregate(spark: SparkSession, tablePath: String,
      fieldTypes: String, viewPath: String,
      keyCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Seq.empty,
      rowFilter: Option[String] = None,
      stateBuckets: Int = AutoBuckets,
      distinctCols: Seq[String] = Seq.empty,
      topKs: Seq[(String, Int)] = Seq.empty,
      hists: Seq[HistSpec] = Seq.empty): Refresh =
    refreshAggFrom(spark, TableZ(tablePath, fieldTypes), viewPath,
      keyCols, sumCols, minMaxCols, rowFilter, stateBuckets,
      distinctCols, "aggregate", "watermark", "refreshAggregate",
      topKs = topKs, hists = hists)

  /** Wrong-refresh guard: a pointer stamped with a `kind` must match
    * the refresh form exactly; a legacy pointer (pre-kind) falls back
    * to its distinguishing mark name. Explicit kinds close the marks
    * ambiguity (a composed view's outer aggregate and a plain join view
    * both mark {left,right}). */
  private def requireKind(ptr: Option[Pointer], viewPath: String,
      expected: String, legacyMark: String, op: String): Unit =
    ptr.foreach { p =>
      p.kind match {
        case Some(k) => require(k == expected,
          s"$viewPath holds a '$k' view — $op advances only " +
            s"'$expected' views")
        case None => require(p.marks.contains(legacyMark),
          s"$viewPath is not a '$expected' view (marks: " +
            s"${p.marks.keys.mkString(",")}) — $op cannot advance it")
      }
    }

  /** Fold a signed Z-relation `delta` (columns ⊇ keys ++ sum inputs,
    * plus multiplicity `m`) into hash-bucketed aggregate state at
    * `viewPath`. The shared engine under [[refreshAggregate]] (delta =
    * the table changelog) and [[refreshJoinAggregate]] (delta = the
    * bilinear join delta). One checkpointed grouped delta feeds the
    * merge join, the touched-bucket counts, AND the changed count;
    * only the touched buckets' old state is read, merged by a
    * null-safe full-outer join, and rewritten — untouched buckets are
    * inherited by reference. `rescanSource` (forced only when
    * `minMaxCols` is non-empty) is the view's row population at the
    * NEW watermark, for the touched-group extrema recompute. Returns
    * the changed-group count. */
  private def foldAggState(spark: SparkSession, viewPath: String,
      ptr: Option[Pointer], delta: DataFrame, keyCols: Seq[String],
      sums: Seq[SumSpec], minMaxCols: Seq[String],
      rescanSource: => DataFrame, marks: Map[String, Long],
      stateBuckets: Int, kind: String,
      distinctCols: Seq[String] = Seq.empty,
      rescanBounded: Boolean = false,
      topKs: Seq[(String, Int)] = Seq.empty,
      hists: Seq[HistSpec] = Seq.empty,
      fusedBootstrap: Boolean = false,
      tinyWindow: Boolean = false): Long = {
    val fs = new Path(viewPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val additiveOnly = minMaxCols.isEmpty && distinctCols.isEmpty &&
      topKs.isEmpty
    // a BOOTSTRAP qualifies for the fused form when the source's own
    // metadata says the whole input is plainly small (well under the
    // single-bucket growth bound AND the bucketed-bootstrap row bound):
    // the separate changed-count action exists only to size the modulus
    // and prune the old-state read, and a pointerless view has no old
    // state to prune. A wrong guess self-heals — the next refresh's
    // growth check reads the ACTUAL persisted bytes and migrates.
    val fused = (additiveOnly || rescanBounded) &&
      ((fusedBootstrap && ptr.isEmpty) ||
        fusedMod1(spark, fs, viewPath, ptr, stateBuckets))
    // SEQUENTIAL TINY FOLD (guide §2.4): when the DELTA WINDOW itself is
    // metadata-proven tiny (bootstrap: the whole source; steady: the
    // manifest/pointer diff — `tinyWindow`) on top of the fused gate's
    // tiny STATE, every exchange in the fold plan is pure fixed cost:
    // coalesce(1) on the inputs makes each operator's SinglePartition
    // satisfy its required distribution, so the whole fold (delta agg,
    // full-outer merge, rescan join, landing write) runs as ONE
    // exchange-free single-task stage — no AQE stage rounds, no 32-task
    // shuffle fan-out for kilobytes. At scale the hints exceed the
    // bounds and the parallel plan below is untouched.
    val tiny = fused && (if (ptr.isEmpty) fusedBootstrap else tinyWindow)
    def binIdx(h: HistSpec): Column = {
      val step = (h.hi - h.lo) / h.bins
      when(col(h.col) < h.lo, 0)
        .when(col(h.col) >= h.hi, h.bins + 1)
        .otherwise(floor((col(h.col) - h.lo) / step).cast("int") + 1)
    }
    val deltaAgg0 = (if (tiny) delta.coalesce(1) else delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("m")).as("dn"),
        sums.map(sp =>
          sum(col("m") * expr(sp.sql)).as(s"dsum_${sp.alias}")) ++
        // signed per-bin counts in one pass (a NULL value binds no bin:
        // the when-condition goes NULL -> otherwise(0))
        hists.map(h => array((0 until h.width).map(b =>
          sum(when(binIdx(h) === b, col("m")).otherwise(0L))): _*)
          .as(s"dhs_${h.col}")): _*)
    // cached ONLY on the counted path, where the folded delta feeds the
    // merge join, the touched-group semi join, AND the changed-count —
    // one CDC read, not three. The fused path has exactly ONE consumer
    // (the landing write), so an InMemoryRelation there is pure
    // overhead (a columnar materialization plus a CacheManager entry
    // per fold). cache (not localCheckpoint) so the FIRST consumer
    // materializes it — no separate eager job — and eviction recomputes
    // safely: the lineage reads version-pinned snapshots and a fixed
    // changelog window, both deterministic
    val deltaAgg = if (fused) deltaAgg0 else deltaAgg0.cache()
    // unpersisted in the finally below: a cached plan outliving its
    // refresh would stay registered in the session CacheManager keyed
    // by canonicalized plan, and a LATER run over the same (mutable)
    // paths could plan-match it and replay stale snapshot versions —
    // cache entries must not outlive the fold that made them
    try {
    // the fold preserves each sum expression's type (decimal sums stay
    // exact and fold-order-independent); merged sums cast back so the
    // state schema cannot drift across generations
    val sumType: Map[String, org.apache.spark.sql.types.DataType] =
      sums.map(sp =>
        sp.alias -> deltaAgg.schema(s"dsum_${sp.alias}").dataType).toMap
    def mergeAdditive(deltaGrouped: DataFrame, old: DataFrame): DataFrame = {
      // delta keys ride under _d_ names so the null-safe join condition
      // and the coalesced output keys stay unambiguous
      val deltaR = deltaGrouped.select(
        keyCols.map(k => col(k).as(s"_d_$k")) ++
          (col("dn") +: (sums.map(sp => col(s"dsum_${sp.alias}")) ++
            hists.map(h => col(s"dhs_${h.col}")))): _*)
      val joined = old.join(deltaR,
        keyCols.map(k => old(k) <=> deltaR(s"_d_$k")).reduce(_ && _), "full")
      joined.select(
        keyCols.map(k => coalesce(col(k), col(s"_d_$k")).as(k)) ++ Seq(
          (coalesce(col("n"), lit(0L)) +
            coalesce(col("dn"), lit(0L))).as("n")) ++
        sums.map { sp =>
          val z = lit(0).cast(sumType(sp.alias))
          (coalesce(col(s"sum_${sp.alias}"), z) +
            coalesce(col(s"dsum_${sp.alias}"), z))
            .cast(sumType(sp.alias)).as(s"sum_${sp.alias}")
        } ++
        hists.map { h =>
          val zero = array_repeat(lit(0L), lit(h.width))
          zip_with(coalesce(col(s"hs_${h.col}"), zero),
            coalesce(col(s"dhs_${h.col}"), zero),
            (x, y) => x + y).as(s"hs_${h.col}")
        } ++
        minMaxCols.flatMap(c => Seq(col(s"mn_$c"), col(s"mx_$c"))) ++
        distinctCols.map(c => col(s"dc_$c")) ++
        topKs.map { case (c, _) => col(s"tk_$c") }: _*)
        .filter(col("n") > 0)
    }
    // rescan-merge: additive state joined with per-group recomputed
    // extrema/distinct counts. `hintGate = Some(changed)` is the
    // two-phase shape — the semi-join prune with the count-gated
    // broadcast hint (runtime-filter pushdown into a BIG rescan source
    // needs the forced broadcast, and forcing it is only safe under the
    // key-count gate). `hintGate = None` skips the prune entirely and
    // recomputes EVERY group — correct always, and the right plan when
    // the rescan source is a maintained state under the single-bucket
    // bound (pruning a few-MB scan buys nothing; dropping the gate
    // frees the fold from needing the count before the write).
    def mergeWithRescan(deltaGrouped: DataFrame, old: DataFrame,
        hintGate: Option[Long]): DataFrame = {
      val additive = mergeAdditive(deltaGrouped, old)
      val live = if (tiny) rescanSource.coalesce(1) else rescanSource
      val pruned = hintGate match {
        case Some(changed) =>
          def hinted(df: DataFrame): DataFrame =
            if (changed <= broadcastLimit(spark)) broadcast(df) else df
          val touched = deltaGrouped.select(keyCols.map(col): _*)
          live.join(hinted(touched),
            nullSafeOn(live, touched, keyCols), "left_semi")
        case None => live
      }
      def maybeHint(df: DataFrame): DataFrame = hintGate match {
        case Some(changed) if changed <= broadcastLimit(spark) =>
          broadcast(df)
        case _ => df
      }
      val rescanAggs = minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"_mn_new_$c"),
            max(col(c)).as(s"_mx_new_$c"))) ++
        distinctCols.map(c => countDistinct(col(c)).as(s"_dc_new_$c")) ++
        topKs.map { case (c, k) =>
          graft.functions.TopKDistinct.topKDistinct(col(c), k)
            .as(s"_tk_new_$c") }
      val rescanned = pruned.groupBy(keyCols.map(col): _*)
        .agg(lit(true).as("_touched"), rescanAggs: _*)
        .select(keyCols.map(k => col(k).as(s"_r_$k")) ++
          (col("_touched") +: (minMaxCols.flatMap(c =>
            Seq(col(s"_mn_new_$c"), col(s"_mx_new_$c"))) ++
            distinctCols.map(c => col(s"_dc_new_$c")) ++
            topKs.map { case (c, _) => col(s"_tk_new_$c") })): _*)
      val j = additive.join(maybeHint(rescanned),
        keyCols.map(k => additive(k) <=> rescanned(s"_r_$k"))
          .reduce(_ && _), "left")
      // a touched group takes its recomputed extrema even when they
      // are NULL (all surviving values null); an untouched group
      // keeps its old ones — coalesce alone would wrongly resurrect
      // a deleted minimum. Distinct counts follow the same rule
      // (a touched group with only NULL values recomputes to 0).
      j.select(keyCols.map(col) ++
        Seq(col("n")) ++ sums.map(sp => col(s"sum_${sp.alias}")) ++
        hists.map(h => col(s"hs_${h.col}")) ++
        minMaxCols.flatMap(c => Seq(
          when(col("_touched"), col(s"_mn_new_$c"))
            .otherwise(col(s"mn_$c")).as(s"mn_$c"),
          when(col("_touched"), col(s"_mx_new_$c"))
            .otherwise(col(s"mx_$c")).as(s"mx_$c"))) ++
        distinctCols.map(c =>
          when(col("_touched"), col(s"_dc_new_$c"))
            .otherwise(col(s"dc_$c")).as(s"dc_$c")) ++
        topKs.map { case (c, _) =>
          when(col("_touched"), col(s"_tk_new_$c"))
            .otherwise(col(s"tk_$c")).as(s"tk_$c") }: _*)
    }
    if (fused) {
      // FUSED single-bucket fold: one job, the changed-group count
      // observed on the write. Pure-additive folds qualify outright;
      // rescan folds qualify when the CALLER vouches the rescan source
      // is bounded (a maintained state under the single-bucket growth
      // bound) — then every group recomputes and no count is needed
      // before the write. Zero-change windows roll back like the join
      // form.
      val obs = new org.apache.spark.sql.Observation()
      val observed = deltaAgg.observe(obs, count(lit(1)).as("groups"))
      val oldPaths = ptr.toSeq.flatMap(_.buckets.values).sorted
        .map(b => s"$viewPath/$b")
      val old0 = if (oldPaths.isEmpty) emptyStateOf(delta, keyCols, sums,
        sumType, minMaxCols, distinctCols, topKs, hists)
      else stateReader(spark, ptr.flatMap(_.schema)).parquet(oldPaths: _*)
      val old = if (tiny) old0.coalesce(1) else old0
      val gen = ptr.map(_.gen).getOrElse(0L) + 1
      val outFrame =
        if (additiveOnly) mergeAdditive(observed, old)
        else mergeWithRescan(observed, old, None)
      val (bytes, outRows) = landSingle(spark, fs, viewPath, gen, outFrame)
      // AQE's empty-relation propagation PRUNES the CollectMetrics node
      // exactly when the observed delta turned out runtime-empty (an
      // all-filtered churn window) — a missing key therefore MEANS zero
      val changed = obs.get.getOrElse("groups", 0L).asInstanceOf[Long]
      ptr match {
        case Some(p) if changed == 0L =>
          fs.delete(new Path(s"$viewPath/data-g$gen"), true)
          publish(spark, viewPath, gen, marks, None, p.buckets, p.mod,
            Some(kind), p.bytes, p.rows, p.schema)
        case _ =>
          // a zero-change BOOTSTRAP keeps the landed schema-bearing
          // empty bucket — the empty-view shape, just keyed 0
          publish(spark, viewPath, gen, marks, None,
            Map(0 -> s"data-g$gen/_bucket=0"), Some(1), Some(kind),
            Map(0 -> bytes), Map(0 -> outRows),
            Some(org.apache.spark.sql.types.StructType(
              outFrame.schema.map(_.copy(nullable = true)))))
      }
      return changed
    }
    // ONE job computes the changed-group count AND the touched-bucket
    // set: per-bucket group counts under the modulus that WILL apply if
    // no migration happens (migration paths never consult `touched`)
    val groupMod: Int =
      if (stateBuckets > 0) stateBuckets
      else ptr.flatMap(_.mod).getOrElse(DefaultBuckets)
    val bucketCounts: Map[Int, Long] = phase("afold.counts")(deltaAgg
      .groupBy(pmod(xxhash64(keyCols.map(col): _*), lit(groupMod.toLong))
        .cast("int").as("_b"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val changed: Long = bucketCounts.values.sum
    if (changed == 0L && ptr.isDefined) {
      // nothing to fold: advance the watermark on the INHERITED state
      // (every bucket carries forward by reference — no data rewrite;
      // recorded byte sizes carry verbatim)
      val p = ptr.get
      if (p.dir.isDefined)
        publish(spark, viewPath, p.gen + 1, marks, p.dir, Map.empty,
          p.mod, Some(kind), p.bytes, p.rows, p.schema)
      else
        publish(spark, viewPath, p.gen + 1, marks, None, p.buckets,
          p.mod, Some(kind), p.bytes, p.rows, p.schema)
      return 0L
    }
    // the modulus in force: explicit pins; adaptive keeps the recorded
    // one (growing 1 -> DefaultBuckets when the persisted state crosses
    // AutoBucketBytes; a legacy whole-dir pointer migrates either way,
    // sized by its state) and bootstraps from the first delta's groups
    val effective: Int =
      if (stateBuckets > 0) stateBuckets
      else ptr match {
        case Some(p) => p.mod match {
          case Some(m) if m > 1 => // never shrinks; DOUBLES when the
            // per-bucket state outgrows the growth bound, so a
            // touched-bucket rewrite stays bounded as the view grows
            grownModulus(spark, m, stateBytes(fs, viewPath, p))
          case _ => // mod 1, or a legacy dir-form pointer (migrating
            // regardless): grow once the persisted state crosses the
            // serial-write bound
            val bytes = stateBytes(fs, viewPath, p)
            if (bytes > AutoBucketBytes)
              grownModulus(spark, DefaultBuckets, bytes)
            else 1
        }
        case None => // true bootstrap: size off the first delta
          if (changed >= AutoBucketRows) DefaultBuckets else 1
      }
    val touchedSet: Set[Int] = bucketCounts.keySet
    def emptyState: DataFrame =
      emptyStateOf(delta, keyCols, sums, sumType, minMaxCols, distinctCols,
        topKs, hists)
    // old state restricted to the touched buckets — by construction a
    // bucketed pointer's untouched buckets cannot change; a legacy
    // whole-dir pointer, or one written under a DIFFERENT modulus,
    // migrates by treating ALL its state as touched (mixing moduli
    // would put a key's old row and its delta in different buckets,
    // where they silently never meet)
    val (old, inherited) = ptr match {
      case Some(p) if p.dir.isDefined =>
        (stateReader(spark, p.schema).parquet(s"$viewPath/${p.dir.get}"),
          Map.empty[Int, String])
      case Some(p) if !p.mod.contains(effective) =>
        val paths = p.buckets.values.toSeq.sorted.map(b => s"$viewPath/$b")
        (if (paths.isEmpty) emptyState
          else stateReader(spark, p.schema).parquet(paths: _*),
          Map.empty[Int, String])
      case Some(p) =>
        val paths = p.buckets.filter { case (k, _) => touchedSet(k) }
          .values.toSeq.sorted.map(b => s"$viewPath/$b")
        (if (paths.isEmpty) emptyState
          else stateReader(spark, p.schema).parquet(paths: _*),
          p.buckets.filterNot { case (k, _) => touchedSet(k) })
      case None => (emptyState, Map.empty[Int, String])
    }
    // extrema and distinct counts: deletes are non-invertible, so
    // recompute exactly the groups the delta touched from the view's
    // row population AT the new watermark, pruned to those groups by a
    // null-safe semi join (mergeWithRescan above) — cost ∝ touched
    // groups' rows, not the table (untouched groups' populations
    // cannot have changed, so their stored values stay exact).
    val merged =
      if (additiveOnly) mergeAdditive(deltaAgg, old)
      else mergeWithRescan(deltaAgg, old, Some(changed))
    landBuckets(spark, viewPath, ptr.map(_.gen).getOrElse(0L) + 1L,
      merged, keyCols, effective, inherited, marks, kind,
      ptr.map(_.bytes).getOrElse(Map.empty),
      ptr.map(_.rows).getOrElse(Map.empty))
    changed
    } finally deltaAgg.unpersist(false)
  }

  /** Schema-bearing empty aggregate state (bootstrap's "old" side). */
  private def emptyStateOf(delta: DataFrame, keyCols: Seq[String],
      sums: Seq[SumSpec],
      sumType: Map[String, org.apache.spark.sql.types.DataType],
      minMaxCols: Seq[String], distinctCols: Seq[String],
      topKs: Seq[(String, Int)] = Seq.empty,
      hists: Seq[HistSpec] = Seq.empty): DataFrame = {
    val empty = keyCols.map(k => col(k)) ++ (lit(0L).as("n") +:
      sums.map(sp =>
        lit(null).cast(sumType(sp.alias)).as(s"sum_${sp.alias}"))) ++
      minMaxCols.flatMap(c =>
        Seq(col(c).as(s"mn_$c"), col(c).as(s"mx_$c"))) ++
      distinctCols.map(c => lit(0L).as(s"dc_$c")) ++
      topKs.map { case (c, _) =>
        lit(null).cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)).as(s"tk_$c") } ++
      hists.map(h =>
        lit(null).cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)).as(s"hs_${h.col}"))
    delta.limit(0).select(empty: _*)
  }

  /** "Plainly small" gate for the FUSED BOOTSTRAP: the source metadata's
    * byte count is well under the single-bucket growth bound AND its
    * row upper bound is under the bucketed-bootstrap threshold — both
    * halves of the adaptive-modulus contract hold without a count job.
    * Rows matter independently of bytes: dictionary/RLE-heavy parquet
    * packs AutoBucketRows-scale row counts into very few bytes, and a
    * single-task write of that many rows is the serial-write trap the
    * row bound exists to avoid. */
  private def plainlySmall(hint: Option[(Long, Long)]): Boolean =
    hint.exists { case (bytes, rows) =>
      bytes <= AutoBucketBytes / 2 && rows < AutoBucketRows
    }

  /** True when a steady refresh of this pointer resolves to modulus 1
    * and stays there — the precondition for the FUSED one-job fold
    * (the per-bucket count pass exists only to prune the old-state
    * read, and a single-bucket pointer has nothing to prune). Pinned
    * modulus 1 qualifies outright; adaptive qualifies while the
    * recorded state bytes stay under the growth bound. */
  private def fusedMod1(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, viewPath: String,
      ptr: Option[Pointer], stateBuckets: Int): Boolean =
    ptr.exists(p => p.dir.isEmpty && p.mod.contains(1) &&
      (stateBuckets == 1 ||
        (stateBuckets == AutoBuckets &&
          stateBytes(fs, viewPath, p) <= AutoBucketBytes)))

  /** Exact row count of one landed parquet file, off its footer — a
    * driver-local metadata read that makes the pointer's recorded
    * per-bucket `rows` exact (the "plainly small" gates' row bound). */
  private def footerRows(spark: SparkSession, p: Path): Long = {
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        p, spark.sparkContext.hadoopConfiguration))
    try r.getRecordCount finally r.close()
  }

  /** Land `rows` as generation `gen`'s SINGLE bucket and return its
    * (bytes, rowCount) off the landing listing + footer (the fused
    * fold's write step — same layout [[landBuckets]]'s modulus-1
    * branch produces). */
  private def landSingle(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, viewPath: String, gen: Long,
      rows: DataFrame): (Long, Long) = {
    val dataDir = s"data-g$gen"
    // coalesce, not repartition: the single-bucket state is small by
    // construction (the fused path engages only under AutoBucketBytes),
    // so collapsing the LAST stage to one task is free — repartition(1)
    // would add a whole round-robin exchange (plus its sort-before-
    // repartition pass) just to land one file
    phase("land.write")(
      rows.coalesce(1).write.mode("overwrite")
        .parquet(s"$viewPath/$dataDir/_bucket=0"))
    phase("land.list") {
      val files = fs.listStatus(new Path(s"$viewPath/$dataDir/_bucket=0"))
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      (files.map(_.getLen).sum,
        files.map(st => footerRows(spark, st.getPath)).sum)
    }
  }

  private def foldJoinState(spark: SparkSession, viewPath: String,
      ptr: Option[Pointer], delta: DataFrame, keys: Seq[String],
      stateBuckets: Int, marks: Map[String, Long],
      kind: String, fusedBootstrap: Boolean = false,
      tinyWindow: Boolean = false): Long = {
    val fs = new Path(viewPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // bootstrap-fusion gate: both sides' metadata said "plainly small"
    // (see foldAggState — same self-healing growth story; a join's
    // output can exceed its inputs, which the NEXT refresh's byte check
    // corrects by migrating)
    if ((fusedBootstrap && ptr.isEmpty) ||
        fusedMod1(spark, fs, viewPath, ptr, stateBuckets)) {
      // FUSED single-bucket fold: ONE Spark job — the delta row count
      // rides the WRITE job as an observed metric instead of paying a
      // second action's plan/schedule/shuffle fixed cost (measured
      // ~25-40% of a steady composed/join3 refresh). A zero-delta
      // window is detected AFTER the write (rare — idle windows
      // short-circuit before the fold) and rolls the orphan directory
      // back, publishing the inherited state exactly like the
      // two-phase path.
      // Sequential tiny fold on top: when the caller metadata-proved
      // the windows/old scans tiny (zSide already laid the delta's
      // inputs out as SinglePartition), coalescing the union before
      // the consolidate keeps the WHOLE rewrite exchange-free — one
      // single-task stage instead of 3-5 AQE shuffle rounds.
      val tiny = if (ptr.isEmpty) fusedBootstrap else tinyWindow
      val obs = new org.apache.spark.sql.Observation()
      val observed = delta.observe(obs, count(lit(1)).as("rows"))
      val oldPaths = ptr.toSeq.flatMap(_.buckets.values).sorted
        .map(b => s"$viewPath/$b")
      val old = if (oldPaths.isEmpty) delta.limit(0)
        else stateReader(spark, ptr.flatMap(_.schema)).parquet(oldPaths: _*)
      val unioned = old.unionByName(observed)
      val rewrite = IncrementalAgg.consolidate(
        if (tiny) unioned.coalesce(1) else unioned)
      val gen = ptr.map(_.gen).getOrElse(0L) + 1
      val (bytes, outRows) = landSingle(spark, fs, viewPath, gen, rewrite)
      // missing key = the metrics node was pruned by AQE's
      // empty-relation propagation = the delta was runtime-empty
      val deltaRows = obs.get.getOrElse("rows", 0L).asInstanceOf[Long]
      ptr match {
        case Some(p) if deltaRows == 0L =>
          fs.delete(new Path(s"$viewPath/data-g$gen"), true)
          publish(spark, viewPath, gen, marks, None, p.buckets, p.mod,
            Some(kind), p.bytes, p.rows, p.schema)
        case _ =>
          // a zero-delta BOOTSTRAP keeps the landed schema-bearing
          // empty bucket — the empty-view shape, just keyed 0
          publish(spark, viewPath, gen, marks, None,
            Map(0 -> s"data-g$gen/_bucket=0"), Some(1), Some(kind),
            Map(0 -> bytes), Map(0 -> outRows),
            Some(org.apache.spark.sql.types.StructType(
              rewrite.schema.map(_.copy(nullable = true)))))
      }
      return deltaRows
    }
    // ONE job computes the delta row count AND the touched-bucket set:
    // per-bucket counts under the modulus that WILL apply if no
    // migration happens (migration paths below never consult `touched`
    // — they treat all state as touched — so a modulus the growth check
    // overrides makes this grouping advisory, never wrong)
    val groupMod: Int =
      if (stateBuckets > 0) stateBuckets
      else ptr.flatMap(_.mod).getOrElse(DefaultBuckets)
    val bucketCounts: Map[Int, Long] = phase("jfold.counts")(delta
      .groupBy(pmod(xxhash64(keys.map(col): _*), lit(groupMod.toLong))
        .cast("int").as("_b"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val deltaRows: Long = bucketCounts.values.sum
    if (deltaRows == 0L && ptr.isDefined) {
      // nothing to fold (e.g. every changed row excluded by a side
      // filter): advance the watermarks on the INHERITED state — every
      // bucket carries forward by reference, no data rewrite; recorded
      // byte sizes carry verbatim
      val p = ptr.get
      if (p.dir.isDefined)
        publish(spark, viewPath, p.gen + 1, marks, p.dir, Map.empty,
          p.mod, Some(kind), p.bytes, p.rows, p.schema)
      else
        publish(spark, viewPath, p.gen + 1, marks, None, p.buckets,
          p.mod, Some(kind), p.bytes, p.rows, p.schema)
      return 0L
    }
    // the modulus in force: explicit pins; adaptive keeps the recorded
    // one (growing 1 -> DefaultBuckets when the persisted state crosses
    // AutoBucketBytes) and bootstraps from the first delta's row count
    val effective: Int =
      if (stateBuckets > 0) stateBuckets
      else ptr match {
        case Some(p) => p.mod match {
          case Some(1) =>
            val bytes = stateBytes(fs, viewPath, p)
            if (bytes > AutoBucketBytes)
              grownModulus(spark, DefaultBuckets, bytes)
            else 1
          case Some(m) => // never shrinks; DOUBLES when per-bucket
            // state outgrows the growth bound (bounded rewrites)
            grownModulus(spark, m, stateBytes(fs, viewPath, p))
          case None => DefaultBuckets // LEGACY pointer (mod unrecorded):
            // never shrink existing state to the serial single-bucket
            // form — migrate once under the default modulus instead
        }
        case None => // true bootstrap: size off the first delta
          if (deltaRows >= AutoBucketRows) DefaultBuckets else 1
      }
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
        (stateReader(spark, p.schema).parquet(s"$viewPath/${p.dir.get}"),
          Map.empty[Int, String])
      case Some(p) if !p.mod.contains(effective) =>
        val paths = p.buckets.values.toSeq.sorted.map(b => s"$viewPath/$b")
        val old = if (paths.isEmpty) delta.limit(0)
          else stateReader(spark, p.schema).parquet(paths: _*)
        (old, Map.empty[Int, String])
      case Some(p) =>
        val paths = p.buckets.filter { case (k, _) => touched.contains(k) }
          .values.toSeq.sorted.map(b => s"$viewPath/$b")
        val old = if (paths.isEmpty) delta.limit(0)
          else stateReader(spark, p.schema).parquet(paths: _*)
        (old, p.buckets.filterNot { case (k, _) => touched.contains(k) })
      case None => (delta.limit(0), Map.empty[Int, String])
    }
    // every delta row is in a touched bucket by construction, so the
    // rewrite set is exactly: touched buckets' old state + the delta
    val rewrite = IncrementalAgg.consolidate(oldTouched.unionByName(delta))
    landBuckets(spark, viewPath, ptr.map(_.gen).getOrElse(0L) + 1L,
      rewrite, keys, effective, inherited, marks, kind,
      ptr.map(_.bytes).getOrElse(Map.empty),
      ptr.map(_.rows).getOrElse(Map.empty))
    deltaRows
  }

  private def validateJoinCols(leftCols: Seq[String],
      rightCols: Seq[String], keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "a join view needs join keys")
    require(keys.forall(leftCols.contains) && keys.forall(rightCols.contains),
      s"join keys ${keys.mkString(",")} must appear in both column lists")
    val overlap = (leftCols.toSet & rightCols.toSet) -- keys.toSet
    require(overlap.isEmpty,
      s"non-key columns ${overlap.mkString(",")} appear on both sides — " +
        "project disjoint names")
  }

  /** Advance a JOIN view — the persisted Z-relation of
    * `left ⋈ right on keys` — to both tables' newest snapshots, folding
    * the bilinear delta ([[joinDeltaBetween]]) into the hash-bucketed
    * state ([[foldJoinState]]): a refresh rewrites ONLY the buckets its
    * delta touches; untouched buckets carry forward BY REFERENCE in the
    * generation pointer, so the materialization cost is ∝ |touched
    * buckets' state|, never the whole view — the property that keeps a
    * big join view refreshable at 100 TB. Bucket dirs are immutable
    * once written (the atomic pointer flip + by-reference retention
    * give the same crash story as the aggregate form). Non-key columns
    * of the two sides must be disjoint; `leftCols`/`rightCols` must
    * include `keys`. NULL join keys never match (standard join
    * semantics).
    *
    * `stateBuckets` defaults to [[AutoBuckets]] (adaptive: 1 bucket
    * while small, [[DefaultBuckets]] once the state crosses the
    * documented thresholds); an explicit value pins the modulus. Either
    * way the modulus in force is RECORDED in the generation pointer:
    * a later refresh under a different modulus migrates by treating
    * every inherited bucket as touched — mixing moduli would hash a
    * key's old +1 rows and its new −1 delta into different buckets,
    * where they silently never net.
    *
    * `leftFilter`/`rightFilter`: optional SQL predicates restricting
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
      rightFilter: Option[String] = None): JoinRefresh =
    refreshJoinFrom(spark, viewPath, TableZ(leftPath, leftTypes),
      leftCols, TableZ(rightPath, rightTypes), rightCols, keys,
      stateBuckets, leftFilter, rightFilter, "join", "left", "right",
      "refreshJoin")

  final case class Join3Refresh(fromHeads: (Long, Long, Long),
      toHeads: (Long, Long, Long), innerDeltaRows: Long, deltaRows: Long)

  /** Advance a THREE-TABLE join view — the persisted Z-relation of
    * `t0 ⋈ t1 ⋈ t2` chained by `keys01` then `keys12` (the star shape:
    * fact ⋈ dim ⋈ dim) — to all three tables' newest snapshots at cost
    * ∝ the deltas. LITERALLY a composition of the join primitives
    * under one definition:
    *
    *  1. the INNER pair `t0 ⋈ t1` maintains its Z-relation at
    *     `<viewPath>/inner` exactly like [[refreshJoin]];
    *  2. the ROOT is a bilinear join fold ([[refreshJoinFrom]]) whose
    *     LEFT source is the inner VIEW (old side = the inner read at
    *     the root's watermarked generation, delta = the inner's
    *     generation feed, [[changesBetween]]) and whose RIGHT source
    *     is `t2` — the same driver every other join form binds.
    *
    * Watermarks are per-level and SELF-HEAL: the root watermarks the
    * inner's GENERATION, and a crash between the two publishes leaves
    * it exactly one generation behind — the next refresh CATCHES UP
    * from the feed BEFORE the inner advances again, so the lag never
    * outruns default retention. This chains: an N-way view is N−1
    * nested levels of the same fold (scoped to three tables here — the
    * star-join shape). Non-key columns of all three tables must be
    * mutually disjoint; `keys12` may draw from either side of the
    * inner pair. NULL join keys never match. */
  def refreshJoin3(spark: SparkSession, viewPath: String,
      p0: String, types0: String, cols0: Seq[String],
      p1: String, types1: String, cols1: Seq[String],
      p2: String, types2: String, cols2: Seq[String],
      keys01: Seq[String], keys12: Seq[String],
      stateBuckets: Int = AutoBuckets,
      filter0: Option[String] = None, filter1: Option[String] = None,
      filter2: Option[String] = None): Join3Refresh = {
    require(stateBuckets >= 0,
      s"stateBuckets $stateBuckets must be >= 1 (or 0 = adaptive)")
    validateJoinCols(cols0, cols1, keys01)
    val innerCols = (cols0 ++ cols1).distinct
    validateJoinCols(innerCols, cols2, keys12)
    val innerPath = s"$viewPath/inner"
    val rptr = readPointer(spark, viewPath)
    requireKind(rptr, viewPath, "join3", "lgen", "refreshJoin3")
    val w2Before = rptr.map(_.marks.getOrElse("w2", 0L)).getOrElse(0L)
    var h2 = w2Before
    // the root: inner view ⋈ t2 through the generic driver. Filters 0/1
    // are already part of the inner's fold rules; only t2's applies here.
    val (jr, rows) = chainedRefresh(spark, viewPath, innerPath,
      "lgen", "refreshJoin3",
      planInner = () => planJoin(spark, innerPath,
        TableZ(p0, types0), cols0, TableZ(p1, types1), cols1, keys01,
        stateBuckets, filter0, filter1, "join", "left", "right",
        "refreshJoin", Map.empty, shared = true),
      foldOuter = (src, marks) => {
        val r = refreshJoinFrom(spark, viewPath, src, innerCols,
          TableZ(p2, types2), cols2, keys12, stateBuckets,
          leftFilter = None, rightFilter = filter2,
          "join3", "lgen", "w2", "refreshJoin3", extraMarks = marks)
        h2 = r.toRight
        r.deltaRows
      })
    Join3Refresh((jr.fromLeft, jr.fromRight, w2Before),
      (jr.toLeft, jr.toRight, h2), jr.deltaRows, rows)
  }

  /** Advance a COMPOSED view — a maintained aggregate OVER a maintained
    * join (the classic star-rollup: `orders ⋈ customer` grouped to
    * per-segment sums) — to both tables' newest snapshots. LITERALLY a
    * composition of the two primitives under one definition:
    *
    *  1. the INNER join Z-relation at `<viewPath>/inner` folds the
    *     bilinear delta exactly like [[refreshJoin]];
    *  2. the OUTER aggregate state at `<viewPath>` folds the inner's
    *     GENERATION FEED ([[refreshAggFrom]] over a view source) —
    *     aggregation is linear, so folding the join's signed feed IS
    *     maintaining the aggregate of the join — grouped by `aggKeys`
    *     with `aggSums` ([[SumSpec]] strings, so derived columns like
    *     `rev:CAST(Price AS DECIMAL(18,2))` fold exactly).
    *
    * Both folds keep their OWN watermarks (inner lands first): a crash
    * between the two publishes leaves the aggregate exactly one source
    * generation behind, and the next refresh CATCHES UP from the feed
    * BEFORE the inner advances again — the lag never outruns default
    * retention and heals with no bespoke recovery algebra. `minMaxCols`
    * extrema (and `distinctCols` counts) recompute touched groups from
    * the INNER state (the view's row population) — the same rescan
    * discipline as the aggregate form.
    *
    * Reading `<viewPath>` returns the maintained AGGREGATE — the
    * readout is ∝ |groups|, never a scan of the join's Z-relation
    * (q303's decade-dominating readout, served from maintained state).
    * The inner Z-relation stays readable via `read(<viewPath>/inner)`. */
  def refreshJoinAggregate(spark: SparkSession, viewPath: String,
      leftPath: String, leftTypes: String, leftCols: Seq[String],
      rightPath: String, rightTypes: String, rightCols: Seq[String],
      keys: Seq[String], aggKeys: Seq[String], aggSums: Seq[String],
      minMaxCols: Seq[String] = Seq.empty,
      stateBuckets: Int = AutoBuckets,
      leftFilter: Option[String] = None,
      rightFilter: Option[String] = None,
      distinctCols: Seq[String] = Seq.empty,
      topKs: Seq[(String, Int)] = Seq.empty,
      hists: Seq[HistSpec] = Seq.empty): ComposedRefresh = {
    require(stateBuckets >= 0,
      s"stateBuckets $stateBuckets must be >= 1 (or 0 = adaptive)")
    validateJoinCols(leftCols, rightCols, keys)
    require(aggKeys.nonEmpty, "refreshJoinAggregate needs aggregate keys")
    val joinedCols = (leftCols ++ rightCols).toSet
    require(aggKeys.forall(joinedCols.contains),
      s"aggregate keys ${aggKeys.mkString(",")} must appear in the " +
        "joined columns")
    val innerPath = s"$viewPath/inner"
    requireKind(readPointer(spark, viewPath), viewPath, "join_aggregate",
      "srcgen", "refreshJoinAggregate")
    val (jr, groups) = chainedRefresh(spark, viewPath, innerPath,
      "srcgen", "refreshJoinAggregate",
      planInner = () => planJoin(spark, innerPath,
        TableZ(leftPath, leftTypes), leftCols,
        TableZ(rightPath, rightTypes), rightCols, keys, stateBuckets,
        leftFilter, rightFilter, "join", "left", "right", "refreshJoin",
        Map.empty, shared = true),
      foldOuter = (src, marks) => refreshAggFrom(spark, src, viewPath,
        aggKeys, aggSums, minMaxCols, rowFilter = None, stateBuckets,
        distinctCols, "join_aggregate", "srcgen", "refreshJoinAggregate",
        extraMarks = marks, topKs = topKs, hists = hists).groupsChanged)
    ComposedRefresh(jr.fromLeft, jr.toLeft, jr.fromRight, jr.toRight,
      jr.deltaRows, groups)
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
