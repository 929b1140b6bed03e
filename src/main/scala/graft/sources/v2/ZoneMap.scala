package graft.sources.v2

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** File-level zone maps for the `graft-records` source — the statistics
  * sidecar that makes a 100 TB record lake scannable: per data file, the
  * min/max/null-count of every field plus the row count, written by the
  * SAME commit that makes the data file visible and consulted at scan
  * planning to skip files no pushed (or runtime) filter can match.
  *
  * This is the engine-native analogue of parquet row-group statistics /
  * Delta-Iceberg file stats, applied to the reference's JSONL wire shape
  * (lib/AirtableDataFetcher.py:27-34 — a format with no embedded stats):
  * without it, a point lookup over a year of synced records opens every
  * file ever written; with it, the scan opens only files whose [min,max]
  * straddles the predicate. Runtime (DPP-style) filters ride the same
  * evaluator: a join against a filtered dimension hands the scan an
  * `In(key, …)` at execution, and whole files fall out of the plan.
  *
  * Layout: `<table>/_zonemaps/<dataFileName>.json` — `_`-prefixed, so
  * [[RecordScan.listDataFiles]] never reads sidecars as data. Stats are
  * ADVISORY: a file without a sidecar (hand-landed, foreign writer) is
  * always scanned; a sidecar without its file is inert. Data files are
  * immutable once committed (the write path renames whole files in and
  * never rewrites them), so a sidecar cannot go stale. A deployment with
  * millions of files would compact sidecars into a manifest log — same
  * graduation path [[RecordStreamOffset]] documents — with identical
  * semantics.
  *
  * Conservatism contract: [[mayMatch]] answers "could ANY row of this
  * file satisfy the filter?" and errs toward true — an unknown filter
  * shape, an incomparable literal, or a missing sidecar keeps the file.
  * Pruning decisions reuse [[RecordFilterEval]]'s comparators, so the
  * zone order is bit-identical to the row-filter order (UTF8 byte order
  * for strings, Spark's -0.0 == 0.0 / NaN-greatest for doubles).
  */
private[graft] object ZoneMap {

  val Dir = "_zonemaps"

  /** Per-field stats. `min`/`max` are raw comparable values (String /
    * Double / Boolean / Long epoch-micros / Int epoch-days) or null when
    * untracked (array fields) or all-null. */
  final case class FieldStats(min: Any, max: Any, nulls: Long,
      tag: String = "other")

  /** One file's zone. A field ABSENT from `fields` was not in the write
    * schema, so every record lacks it — reads as all-NULL (the writer
    * records stats for every schema field, including all-null ones). */
  final case class FileZone(rows: Long, fields: Map[String, FieldStats]) {
    def stats(name: String): FieldStats =
      fields.getOrElse(name, FieldStats(null, null, rows))
  }

  // -------------------------------------------------------------- collect

  /** Writer-side accumulator: one per open data file. Values arrive in
    * the raw comparable types listed on [[FieldStats]]; ordering reuses
    * [[RecordFilterEval.nullAwareCompare]] so the recorded min/max sort
    * exactly like the scan-side filter evaluation. */
  final class Collector(schema: StructType) {
    private var rows = 0L
    private val nulls = new Array[Long](schema.length)
    private val mins = new Array[Any](schema.length)
    private val maxs = new Array[Any](schema.length)
    private val tracked: Array[Boolean] = schema.fields.map(_.dataType match {
      case StringType | DoubleType | BooleanType | TimestampType | DateType => true
      case _ => false // arrays: null counts only — filters never compare them
    })

    /** Record field `i`'s raw value for the current row (null for NULL). */
    def observe(i: Int, v: Any): Unit =
      if (v == null) nulls(i) += 1
      else if (tracked(i)) {
        if (mins(i) == null || RecordFilterEval.nullAwareCompare(
          v, mins(i), descending = false, nullsFirst = false) < 0) mins(i) = v
        if (maxs(i) == null || RecordFilterEval.nullAwareCompare(
          v, maxs(i), descending = false, nullsFirst = false) > 0) maxs(i) = v
      }

    def rowDone(): Unit = rows += 1

    /** Serialize: timestamps/dates stay in their integer raw forms (no
      * formatting round trip to drift through). */
    def toJson: String = {
      val mapper = new ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("rows", rows)
      val fs = root.putObject("fields")
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        val n = fs.putObject(f.name)
        n.put("nulls", nulls(i))
        def putVal(key: String, v: Any): Unit = v match {
          case null => ()
          case s: String => n.put(key, s)
          case d: java.lang.Double => n.put(key, d.doubleValue())
          case b: java.lang.Boolean => n.put(key, b.booleanValue())
          case l: java.lang.Long => n.put(key, l.longValue())
          case x: java.lang.Integer => n.put(key, x.intValue())
          case other => throw new IllegalStateException(
            s"untracked zone value type: ${other.getClass}") // defensive
        }
        // type tag drives parse-side reconstruction of the raw type
        val tag = f.dataType match {
          case StringType => "string"
          case DoubleType => "double"
          case BooleanType => "boolean"
          case TimestampType => "timestamp"
          case DateType => "date"
          case _ => "other"
        }
        n.put("t", tag)
        putVal("min", mins(i))
        putVal("max", maxs(i))
      }
      mapper.writeValueAsString(root)
    }
  }

  // ---------------------------------------------------------------- serde

  def parse(json: String): FileZone = {
    val root = new ObjectMapper().readTree(json)
    val fields = scala.collection.mutable.Map.empty[String, FieldStats]
    val fobj = root.get("fields")
    val it = fobj.fieldNames()
    while (it.hasNext) {
      val key = it.next()
      val n = fobj.get(key)
      def rawOf(k: String): Any = {
        val v = n.get(k)
        if (v == null || v.isNull) null
        else n.get("t").asText() match {
          case "string" => v.asText()
          case "double" => java.lang.Double.valueOf(v.asDouble())
          case "boolean" => java.lang.Boolean.valueOf(v.asBoolean())
          case "timestamp" => java.lang.Long.valueOf(v.asLong())
          case "date" => java.lang.Integer.valueOf(v.asInt())
          case _ => null
        }
      }
      fields(key) = FieldStats(rawOf("min"), rawOf("max"),
        n.get("nulls").asLong(), n.get("t").asText())
    }
    FileZone(root.get("rows").asLong(), fields.toMap)
  }

  /** Sidecar path for a data file in `tableDir`. */
  def sidecar(tableDir: Path, dataFileName: String): Path =
    new Path(new Path(tableDir, Dir), dataFileName + ".json")

  def write(fs: FileSystem, tableDir: Path, dataFileName: String,
      json: String): Unit = {
    val p = sidecar(tableDir, dataFileName)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Load the zone for `dataFile` (a full path string), or None when the
    * sidecar is absent or unreadable — advisory stats never fail a scan. */
  def load(fs: FileSystem, dataFile: String): Option[FileZone] = {
    val f = new Path(dataFile)
    val p = sidecar(f.getParent, f.getName)
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val bytes = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
          Some(parse(bytes.toString("UTF-8")))
        } finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Union of file zones — the compaction path's metadata-only stats
    * derivation: a concatenation of record files has the summed rows /
    * nulls and the elementwise min/max of its inputs, with a field
    * ABSENT from one input counting as all-null there (the same rule
    * [[FileZone.stats]] applies at read time). No data re-scan. */
  def merge(zones: Seq[FileZone]): FileZone = {
    val allFields = zones.flatMap(_.fields.keys).distinct
    val rows = zones.map(_.rows).sum
    val fields = allFields.map { name =>
      val per = zones.map(z => (z.stats(name), z.rows))
      val tag = per.collectFirst {
        case (st, _) if st.tag != "other" => st.tag
      }.getOrElse("other")
      val mins = per.map(_._1.min).filter(_ != null)
      val maxs = per.map(_._1.max).filter(_ != null)
      val nulls = per.map(_._1.nulls).sum
      val mn = if (mins.isEmpty) null else mins.reduce((a, b) =>
        if (RecordFilterEval.nullAwareCompare(a, b, descending = false,
          nullsFirst = false) <= 0) a else b)
      val mx = if (maxs.isEmpty) null else maxs.reduce((a, b) =>
        if (RecordFilterEval.nullAwareCompare(a, b, descending = false,
          nullsFirst = false) >= 0) a else b)
      name -> FieldStats(mn, mx, nulls, tag)
    }.toMap
    FileZone(rows, fields)
  }

  /** Serialize a (merged) zone in the sidecar format [[parse]] reads. */
  def render(zone: FileZone): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("rows", zone.rows)
    val fs = root.putObject("fields")
    zone.fields.toSeq.sortBy(_._1).foreach { case (name, st) =>
      val n = fs.putObject(name)
      n.put("nulls", st.nulls)
      n.put("t", st.tag)
      def putVal(key: String, v: Any): Unit = v match {
        case null => ()
        case s: String => n.put(key, s)
        case d: java.lang.Double => n.put(key, d.doubleValue())
        case b: java.lang.Boolean => n.put(key, b.booleanValue())
        case l: java.lang.Long => n.put(key, l.longValue())
        case x: java.lang.Integer => n.put(key, x.intValue())
        case other => throw new IllegalStateException(
          s"unrenderable zone value: ${other.getClass}") // defensive
      }
      putVal("min", st.min)
      putVal("max", st.max)
    }
    mapper.writeValueAsString(root)
  }

  // ---------------------------------------------------------------- prune

  /** Could any row of `z` satisfy `f`? Conservative: unknown → true.
    * `former` is the renamed-column fallback: a file written before a
    * RENAME keeps its stats under the old key, and "no entry under any
    * known key" still means all-NULL (sparse records: the column did
    * not exist when the file was written). */
  def mayMatch(f: Filter, z: FileZone,
      former: Map[String, Seq[String]] = Map.empty): Boolean = {
    def stats(a: String): FieldStats =
      (a +: former.getOrElse(a, Seq.empty)).iterator
        .flatMap(z.fields.get).nextOption()
        .getOrElse(FieldStats(null, null, z.rows))
    f match {
      case EqualTo(a, v) => rangeContains(stats(a), v, z.rows)
      case EqualNullSafe(a, v) =>
        if (v == null) stats(a).nulls > 0
        else rangeContains(stats(a), v, z.rows)
      case In(a, vs) =>
        val st = stats(a)
        vs.exists(v => v != null && rangeContains(st, v, z.rows))
      case GreaterThan(a, v) => boundCheck(stats(a), z.rows) { st =>
        RecordFilterEval.cmp(st.max, v).forall(_ > 0)
      }
      case GreaterThanOrEqual(a, v) => boundCheck(stats(a), z.rows) { st =>
        RecordFilterEval.cmp(st.max, v).forall(_ >= 0)
      }
      case LessThan(a, v) => boundCheck(stats(a), z.rows) { st =>
        RecordFilterEval.cmp(st.min, v).forall(_ < 0)
      }
      case LessThanOrEqual(a, v) => boundCheck(stats(a), z.rows) { st =>
        RecordFilterEval.cmp(st.min, v).forall(_ <= 0)
      }
      case IsNull(a) => stats(a).nulls > 0
      case IsNotNull(a) => stats(a).nulls < z.rows
      case And(l, r) => mayMatch(l, z, former) && mayMatch(r, z, former)
      case Or(l, r) => mayMatch(l, z, former) || mayMatch(r, z, former)
      // Not(x) would need "do ALL rows match x" stats; keep the file
      case _ => true
    }
  }

  /** Value predicates match no row when every value is NULL; otherwise
    * defer to the bound test (itself conservative via cmp's None). */
  private def boundCheck(st: FieldStats, rows: Long)(
      ok: FieldStats => Boolean): Boolean =
    if (st.nulls >= rows) false // no non-null values at all
    else if (st.min == null || st.max == null) true // untracked type
    else ok(st)

  private def rangeContains(st: FieldStats, v: Any, rows: Long): Boolean =
    boundCheck(st, rows) { s =>
      (RecordFilterEval.cmp(s.min, v), RecordFilterEval.cmp(s.max, v)) match {
        case (Some(lo), Some(hi)) => lo <= 0 && hi >= 0
        case _ => true // incomparable literal: keep the file
      }
    }

  /** Apply zone pruning to a file list: keep files whose zone may match
    * every conjunct (absent sidecar → keep). Returns (kept, zones-seen)
    * where zones-seen maps kept files to their loaded zones for reuse by
    * statistics estimation. */
  def pruneFiles(files: Array[String], filters: Array[Filter],
      fs: FileSystem,
      former: Map[String, Seq[String]] = Map.empty)
      : Array[(String, Option[FileZone])] = {
    val withZones = files.map(f => (f, load(fs, f)))
    if (filters.isEmpty) withZones
    else withZones.filter {
      case (_, Some(z)) => filters.forall(mayMatch(_, z, former))
      case (_, None) => true
    }
  }
}
