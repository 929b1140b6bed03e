package graft.sources.v2

import org.apache.hadoop.fs.{FileSystem, Path}
import com.fasterxml.jackson.databind.ObjectMapper

/** Merge-on-read deletion vectors for the graft-records lake: a DELETE
  * marks row positions in a per-file sidecar instead of rewriting data
  * files, and every scan subtracts the marked rows — the Delta/Iceberg
  * deletion-vector design re-expressed for this engine's JSONL layout.
  * At 100 TB this is the difference between a predicate delete costing
  * one metadata write per touched file and costing a full rewrite of
  * every touched file.
  *
  * A position is the 0-based PHYSICAL LINE ordinal in the data file —
  * stable across parse modes (blank and malformed lines consume
  * ordinals too) and across column pruning. Positions are stored as
  * sorted inclusive ranges (`[[start,end],…]`), so contiguous deletes
  * (the common case: a predicate wiping a value cluster) cost two longs
  * per run; membership is a binary search.
  *
  * Unlike zone maps (advisory — a lost sidecar only loses pruning), a
  * deletion vector is CORRECTNESS-critical: an unreadable sidecar fails
  * the scan loudly rather than silently resurrecting deleted rows.
  * Sidecars live under `_dv/<dataFileName>.json` (the `_`-prefix keeps
  * them out of [[RecordScan.listDataFiles]]). Single-writer discipline,
  * like every mutation path of this lake (reference: the per-table sync
  * loop in lib/AirtableToDatastore.py:28-49 is single-writer too).
  */
private[graft] object DeletionVector {

  val Dir = "_dv"

  /** Loaded vector: parallel sorted arrays of inclusive range bounds. */
  final class Vector(val starts: Array[Long], val ends: Array[Long]) {
    val count: Long = {
      var i = 0; var c = 0L
      while (i < starts.length) { c += ends(i) - starts(i) + 1; i += 1 }
      c
    }
    /** Is `pos` deleted? Binary search for the last range start <= pos. */
    def contains(pos: Long): Boolean = {
      var lo = 0; var hi = starts.length - 1; var idx = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (starts(mid) <= pos) { idx = mid; lo = mid + 1 } else hi = mid - 1
      }
      idx >= 0 && pos <= ends(idx)
    }
    def positions: Iterator[Long] =
      starts.iterator.zip(ends.iterator).flatMap { case (s, e) => (s to e).iterator }
  }

  def sidecar(tableDir: Path, dataFileName: String): Path =
    new Path(new Path(tableDir, Dir), dataFileName + ".json")

  /** Collapse sorted distinct positions into inclusive ranges. */
  def fromPositions(sorted: Array[Long]): Vector = {
    val starts = Array.newBuilder[Long]
    val ends = Array.newBuilder[Long]
    var i = 0
    while (i < sorted.length) {
      val s = sorted(i)
      var e = s
      while (i + 1 < sorted.length && sorted(i + 1) == e + 1) { i += 1; e += 1 }
      starts += s; ends += e; i += 1
    }
    new Vector(starts.result(), ends.result())
  }

  /** Load the vector for `dataFile` (full path string). None = no
    * sidecar (nothing deleted). A sidecar may be mid-OVERWRITE by a
    * concurrent DELETE's flip (deletes only grow, so pre- and post-flip
    * contents are both consistent reads — read-committed); a transient
    * partial read retries until stable. One that stays unreadable
    * throws — deletes must never silently un-apply. */
  def load(fs: FileSystem, dataFile: String): Option[Vector] = {
    val f = new Path(dataFile)
    val p = sidecar(f.getParent, f.getName)
    if (!fs.exists(p)) return None
    val deadline = System.currentTimeMillis + 10000L
    var last: Throwable = null
    while (System.currentTimeMillis <= deadline) {
      try {
        val in = fs.open(p)
        val text =
          try {
            val bytes = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
            bytes.toString("UTF-8")
          } finally in.close()
        return Some(parse(text))
      } catch {
        case scala.util.control.NonFatal(e) => last = e; Thread.sleep(10)
      }
    }
    throw new java.io.IOException(
      s"graft-records: deletion-vector sidecar $p stayed unreadable past " +
        "the flip window — refusing to scan (a skipped vector would " +
        "resurrect deleted rows). Restore or remove the sidecar. " +
        s"Cause: ${last.getMessage}", last)
  }

  def parse(json: String): Vector = {
    val root = new ObjectMapper().readTree(json)
    val ranges = root.get("ranges")
    require(ranges != null && ranges.isArray, "missing 'ranges' array")
    val starts = new Array[Long](ranges.size())
    val ends = new Array[Long](ranges.size())
    var i = 0
    while (i < ranges.size()) {
      val r = ranges.get(i)
      require(r.isArray && r.size() == 2, s"range $i is not a pair")
      starts(i) = r.get(0).asLong(); ends(i) = r.get(1).asLong()
      require(starts(i) >= 0 && ends(i) >= starts(i), s"range $i malformed")
      require(i == 0 || starts(i) > ends(i - 1) + 1,
        s"range $i overlaps or touches its predecessor (must be merged)")
      i += 1
    }
    new Vector(starts, ends)
  }

  def render(v: Vector): String = {
    val sb = new StringBuilder("{\"rows_deleted\":").append(v.count)
    sb.append(",\"ranges\":[")
    var i = 0
    while (i < v.starts.length) {
      if (i > 0) sb.append(',')
      sb.append('[').append(v.starts(i)).append(',').append(v.ends(i)).append(']')
      i += 1
    }
    sb.append("]}").toString()
  }

  /** Merge an existing range list with sorted new positions WITHOUT
    * materializing individual deleted ordinals — linear in
    * (#ranges + #new positions), so merging into a vector that already
    * covers a huge contiguous delete stays cheap (the range encoding is
    * the whole point at 100 TB; expanding it would be O(rows deleted)). */
  def merge(v: Vector, sorted: Array[Long]): Vector = {
    val starts = Array.newBuilder[Long]
    val ends = Array.newBuilder[Long]
    var curS = -1L; var curE = -2L // current open run (empty sentinel)
    def push(s: Long, e: Long): Unit =
      if (s <= curE + 1) { if (e > curE) curE = e } // extend/absorb
      else { if (curS >= 0) { starts += curS; ends += curE }; curS = s; curE = e }
    var i = 0; var j = 0
    while (i < v.starts.length || j < sorted.length) {
      if (j >= sorted.length ||
          (i < v.starts.length && v.starts(i) <= sorted(j))) {
        push(v.starts(i), v.ends(i)); i += 1
      } else { push(sorted(j), sorted(j)); j += 1 }
    }
    if (curS >= 0) { starts += curS; ends += curE }
    new Vector(starts.result(), ends.result())
  }

  /** Merge `newPositions` (sorted, distinct, 0-based line ordinals) into
    * the file's vector and (re)write the sidecar. Idempotent: positions
    * already deleted merge silently. */
  def write(fs: FileSystem, tableDir: Path, dataFileName: String,
      newPositions: Array[Long]): Vector = {
    require(newPositions.nonEmpty, "empty position set")
    val existing = load(fs, new Path(tableDir, dataFileName).toString)
    val merged = existing match {
      case None => fromPositions(newPositions)
      case Some(v) => merge(v, newPositions)
    }
    val p = sidecar(tableDir, dataFileName)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.write(render(merged).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    merged
  }
}
