package graft.sources.v2

import org.apache.hadoop.fs.{FileSystem, Path}
import com.fasterxml.jackson.databind.ObjectMapper

/** Per-file Bloom filters for POINT-LOOKUP file skipping on
  * high-cardinality string columns — the pruning zone maps cannot give:
  * a min/max range over a fleet of random ids spans everything, so an
  * `id = 'rec123'` scan opens every file; a 10-bits-per-key bloom says
  * "definitely not here" for ~99% of them. The Delta/Iceberg bloom-index
  * pattern on this engine's sidecar stack.
  *
  * ADVISORY like zone maps: a missing or unreadable sidecar only loses
  * pruning (the row filter still runs in the reader), so hashing choices
  * are free of cross-engine constraints — MD5 double hashing
  * (h_i = h1 + i·h2, the Kirsch-Mitzenmacher construction) keeps the
  * bits deterministic across JVMs. Filters are FIXED-SIZE per file
  * (`bits` at write time, default 2^17 = 16 KiB), so the writer never
  * needs the row count up front; fpp degrades gracefully if a file far
  * outgrows ~bits/10 rows. Sidecars live under `_bloom/<file>.json`
  * and ride the write's commit protocol exactly like zones. */
private[graft] object BloomSidecar {

  val Dir = "_bloom"
  val HashCount = 7
  val DefaultBits = 1 << 17

  def sidecar(tableDir: Path, dataFileName: String): Path =
    new Path(new Path(tableDir, Dir), dataFileName + ".json")

  private def hashes(value: String): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bb = java.nio.ByteBuffer.wrap(d)
    (bb.getLong(0), bb.getLong(8))
  }

  /** One column's under-construction filter (writer side). */
  final class Collector(val column: String, val bits: Int) {
    require(bits >= 64 && (bits & 63) == 0,
      s"bloom bits $bits must be a positive multiple of 64")
    private val words = new Array[Long](bits / 64)
    def add(value: String): Unit = {
      val (h1, h2) = hashes(value)
      var i = 0
      while (i < HashCount) {
        val bit = Math.floorMod(h1 + i.toLong * h2, bits.toLong).toInt
        words(bit >> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    def toJson: String = {
      val sb = new StringBuilder("{\"col\":\"").append(column)
      sb.append("\",\"bits\":").append(bits).append(",\"k\":").append(HashCount)
      sb.append(",\"words\":\"")
      words.foreach(w => sb.append(f"$w%016x"))
      sb.append("\"}").toString()
    }
  }

  /** A loaded filter (scan side). */
  final class Filter(val column: String, bits: Int, words: Array[Long]) {
    def mightContain(value: String): Boolean = {
      val (h1, h2) = hashes(value)
      var i = 0
      while (i < HashCount) {
        val bit = Math.floorMod(h1 + i.toLong * h2, bits.toLong).toInt
        if ((words(bit >> 6) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  def parse(json: String): Seq[Filter] = {
    val root = new ObjectMapper().readTree(json)
    val arr = if (root.isArray) root else {
      val a = new ObjectMapper().createArrayNode(); a.add(root); a
    }
    (0 until arr.size()).map { i =>
      val n = arr.get(i)
      val bits = n.get("bits").asInt()
      val hex = n.get("words").asText()
      require(n.get("k").asInt() == HashCount, "foreign hash count")
      require(hex.length == bits / 4, "bitset length mismatch")
      val words = Array.tabulate(bits / 64)(j =>
        java.lang.Long.parseUnsignedLong(hex.substring(j * 16, j * 16 + 16), 16))
      new Filter(n.get("col").asText(), bits, words)
    }
  }

  def render(collectors: Seq[Collector]): String =
    collectors.map(_.toJson).mkString("[", ",", "]")

  def write(fs: FileSystem, tableDir: Path, dataFileName: String,
      json: String): Unit = {
    val p = sidecar(tableDir, dataFileName)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Load the filters for `dataFile`, or None when absent/unreadable —
    * advisory stats never fail a scan (unlike deletion vectors). */
  def load(fs: FileSystem, dataFile: String): Option[Seq[Filter]] = {
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

  /** Can the file hold rows matching `f`? "Maybe" on anything but a
    * definite bloom miss for a point predicate on a filtered column.
    * Only plain EqualTo / EqualNullSafe(non-null) / In prune — a
    * negation or range says nothing a bloom can answer. */
  def mayMatch(f: org.apache.spark.sql.sources.Filter,
      filters: Seq[Filter]): Boolean = {
    import org.apache.spark.sql.sources.{And, EqualNullSafe, EqualTo, In}
    def filterFor(attr: String): Option[BloomSidecar.Filter] =
      filters.find(_.column == attr)
    f match {
      case EqualTo(a, v: String) =>
        filterFor(a).forall(_.mightContain(v))
      case EqualNullSafe(a, v: String) if v != null =>
        filterFor(a).forall(_.mightContain(v))
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        filterFor(a).forall(b => vs.exists(v => b.mightContain(v.asInstanceOf[String])))
      case And(l, r) => mayMatch(l, filters) && mayMatch(r, filters)
      case _ => true
    }
  }
}
