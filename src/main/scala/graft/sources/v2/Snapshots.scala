package graft.sources.v2

import org.apache.hadoop.fs.{FileSystem, Path}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Snapshot manifests + time travel for the record lake: `commit`
  * freezes the CURRENT table state — the data-file set AND each file's
  * deletion-vector state — into `_snapshots/v<k>.json`; the
  * `versionAsOf` read option replays exactly that state, so a scan of
  * v1 still sees rows a later merge-on-read DELETE removed (the
  * manifest inlines the DV json, which is range-encoded and tiny).
  * The Iceberg/Delta snapshot-isolation pattern at the granularity this
  * lake's single-writer discipline needs: appends after a snapshot are
  * invisible to it (new file names), deletes after it are reversed by
  * the inlined DV state, and the destructive paths (compaction,
  * dv-materialize) REFUSE to touch files any live manifest references —
  * `expire` retires old manifests first, exactly vacuum's contract.
  *
  * Reference basis: the reference keeps per-run version stamps on rows
  * (lib/UpdateStrategies.py version fields) — this is the same idea
  * lifted from row stamps to whole-table states. */
private[graft] object Snapshots {

  val Dir = "_snapshots"

  final case class Manifest(version: Long,
      files: Seq[(String, Option[String])]) // (fileName, dvJson at commit)

  private def manifestPath(tableDir: Path, v: Long): Path =
    new Path(new Path(tableDir, Dir), s"v$v.json")

  def versions(fs: FileSystem, tableDir: Path): Seq[Long] = {
    val d = new Path(tableDir, Dir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).filter(_.isFile).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong
      }.sorted.toSeq
  }

  /** Freeze the current state as the next version; returns it. */
  def commit(fs: FileSystem, path: String,
      conf: org.apache.hadoop.conf.Configuration): Long = {
    val dir = new Path(path)
    val v = versions(fs, dir).lastOption.getOrElse(0L) + 1L
    val files = RecordScan.listDataFiles(path, conf).sorted.toSeq
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", v)
    val arr = root.putArray("files")
    files.foreach { f =>
      val name = new Path(f).getName
      val e = arr.addObject()
      e.put("name", name)
      val dvp = DeletionVector.sidecar(dir, name)
      if (fs.exists(dvp)) e.put("dv", readFully(fs, dvp))
      else e.putNull("dv")
    }
    val p = manifestPath(dir, v)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    out.close()
    v
  }

  /** Load manifest v, failing LOUDLY when absent or when a referenced
    * data file no longer exists (expired out from under the snapshot —
    * only possible if the refusal guards were bypassed). */
  def load(fs: FileSystem, path: String, v: Long): Manifest = {
    val dir = new Path(path)
    val p = manifestPath(dir, v)
    require(fs.exists(p),
      s"versionAsOf $v: no snapshot manifest at $p (existing: " +
        s"${versions(fs, dir).mkString(", ")})")
    val root = new ObjectMapper().readTree(readFully(fs, p))
    val files = root.get("files").elements().asScala.map { e =>
      val name = e.get("name").asText()
      require(fs.exists(new Path(dir, name)),
        s"versionAsOf $v references $name which no longer exists — the " +
          "snapshot was expired out from under this read")
      (name, if (e.get("dv").isNull) None else Some(e.get("dv").asText()))
    }.toSeq
    Manifest(root.get("version").asLong(), files)
  }

  /** Every file name referenced by any live manifest (the destructive
    * paths' refusal set). */
  def referencedFiles(fs: FileSystem, tableDir: Path): Set[String] = {
    val d = new Path(tableDir, Dir)
    if (!fs.exists(d)) return Set.empty
    fs.listStatus(d).filter(_.isFile).map(_.getPath)
      .filter(_.getName.startsWith("v")).flatMap { p =>
        new ObjectMapper().readTree(readFully(fs, p))
          .get("files").elements().asScala.map(_.get("name").asText())
      }.toSet
  }

  /** Retire all but the newest `keepLast` manifests; returns how many
    * were dropped. Files themselves are reclaimed by the next
    * compaction/materialize (they refuse only LIVE references). */
  def expire(fs: FileSystem, tableDir: Path, keepLast: Int): Int = {
    require(keepLast >= 0, s"keepLast $keepLast must be >= 0")
    val vs = versions(fs, tableDir)
    val drop = vs.dropRight(keepLast)
    drop.foreach(v => fs.delete(manifestPath(tableDir, v), false))
    drop.length
  }

  private def readFully(fs: FileSystem, p: Path): String = {
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
