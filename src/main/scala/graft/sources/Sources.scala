package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.SchemaMapper

/** A named projection over a table: ordered visible fields minus hidden
  * ones (reference: lib/UpdateStrategies.py:379-418). Catalyst's
  * ColumnPruning pushes the resulting `select` into the parquet scan, which
  * is the Spark-native form of the reference passing a field list to the
  * source API (reference: lib/UpdateStrategies.py:365). */
final case class View(
    name: String,
    visibleFieldOrder: Seq[String],
    hiddenFields: Set[String] = Set.empty) {
  /** Visible fields in view order (reference: lib/UpdateStrategies.py:408-418). */
  def visibleFields: Seq[String] = visibleFieldOrder.filterNot(hiddenFields)
}

/** View catalog, the engine's stand-in for the reference's view-metadata
  * API scan (reference: lib/UpdateStrategies.py:379-406). Construct
  * in-memory, or resolve from a JSON sidecar via [[ViewCatalog.fromSidecar]]
  * — the fixture-world equivalent of the metadata REST endpoint. */
final class ViewCatalog(views: Map[String, View]) {
  def get(name: String): View =
    views.getOrElse(name, throw new IllegalArgumentException(s"View '$name' not found"))
  def viewNames: Seq[String] = views.keys.toSeq.sorted
  def apply(df: DataFrame, viewName: String): DataFrame =
    Sources.applyView(df, get(viewName))
}

object ViewCatalog {
  /** Load views from a JSON sidecar — an array of
    * `{"name": ..., "visibleFieldOrder": [...], "hiddenFields": [...]}`
    * objects, mirroring the reference's view-metadata response shape
    * (`visibleFieldOrder` minus `hiddenFields`,
    * lib/UpdateStrategies.py:408-418). Metadata is tiny by construction;
    * the collect here is a catalog load, not a data scan. */
  def fromSidecar(spark: SparkSession, path: String): ViewCatalog = {
    val df = spark.read.option("multiLine", "true").json(path)
    require(df.columns.contains("name") && df.columns.contains("visibleFieldOrder"),
      s"view sidecar $path needs 'name' and 'visibleFieldOrder' per view")
    val hasHidden = df.columns.contains("hiddenFields")
    val views = df.collect().zipWithIndex.map { case (r, i) =>
      val name = r.getAs[String]("name")
      require(name != null && name.nonEmpty,
        s"view sidecar $path: entry $i has a null/empty 'name'")
      require(!r.isNullAt(r.fieldIndex("visibleFieldOrder")),
        s"view sidecar $path: view '$name' has no 'visibleFieldOrder'")
      val vis = r.getAs[scala.collection.Seq[String]]("visibleFieldOrder").toSeq
      val hidden =
        if (hasHidden && !r.isNullAt(r.fieldIndex("hiddenFields")))
          r.getAs[scala.collection.Seq[String]]("hiddenFields").toSet
        else Set.empty[String]
      name -> View(name, vis, hidden)
    }
    // a duplicated name would silently last-write-win through toMap,
    // masking a malformed sidecar — fail with the offending names instead
    val dups = views.map(_._1).groupBy(identity).collect {
      case (n, occ) if occ.length > 1 => n
    }.toSeq.sorted
    require(dups.isEmpty,
      s"view sidecar $path: duplicate view name(s) ${dups.mkString(", ")}")
    new ViewCatalog(views.toMap)
  }
}

object Sources {

  /** Full table scan of a driver-generated parquet table
    * (reference: lib/AirtableDataFetcher.py:14-37). Timestamp physical
    * encodings vary across fixture generations and are normalized to one
    * logical type (session-zone TimestampType, with the session pinned to
    * UTC) so every downstream query sees a single contract:
    *   - TIMESTAMP(NANOS) `ts` (read as nanosecond longs under
    *     `spark.sql.legacy.parquet.nanosAsLong`) → microsecond
    *     TimestampType via integer division — a double-based division
    *     would lose precision above 2^53 ns;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    *     TimestampNTZType) → TimestampType. The cast re-labels the naive
    *     datetime in the session zone (UTC), which is exactly how DuckDB
    *     reads the same column, and is required because Spark 4 forbids
    *     casting TIMESTAMP_NTZ directly to numeric epoch seconds. */
  def readTable(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.LongType if f.name == "ts" =>
          acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          acc.withColumn(f.name,
            col(f.name).cast(org.apache.spark.sql.types.TimestampType))
        case _ => acc
      }
    }
  }

  /** Record-shaped ingestion: JSON rows `{id, createdTime, fields:{...}}`
    * as produced by the reference's fetcher
    * (reference: lib/AirtableDataFetcher.py:27-34). Flattens `fields.*` to
    * top-level columns and casts per the discovered field-type map —
    * sparse keys become nulls under a fixed nullable schema. */
  def readRecords(spark: SparkSession, path: String,
      fieldTypes: Map[String, String]): DataFrame = {
    val raw = spark.read.json(path)
    val fieldCols = raw.select(col("fields.*")).columns
    val typed = fieldCols.toSeq.map { f =>
      val t = fieldTypes.getOrElse(f, SchemaMapper.DefaultType)
      graft.functions.Normalize.castTo(col(s"fields.`$f`"), t).as(f)
    }
    raw.select(
      (Seq(col("id").as("_record_id"), col("createdTime").cast("timestamp").as("_created_time"))
        ++ typed): _*)
  }

  /** Content fingerprint of a parquet table (file or directory): md5 over
    * each data file's name, length, and tail bytes. A parquet footer lives
    * in the tail and carries per-row-group stats, so any data change moves
    * the fingerprint even when byte length and mtime stay identical —
    * unlike len+mtime keys, which go stale on same-second in-place
    * regeneration. Reads at most [[FingerprintTailBytes]] per file (a
    * metadata-sized read, not a data scan). */
  val FingerprintTailBytes: Int = 64 * 1024
  def contentFingerprint(path: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): String = {
    val fs = path.getFileSystem(conf)
    val rootSt = fs.getFileStatus(path)
    // relativize against the QUALIFIED root (listFiles returns fully
    // qualified paths, so stripping the caller's possibly-relative or
    // differently-qualified form would leak machine-specific absolute
    // prefixes into the digest)
    val root = rootSt.getPath.toUri.getPath
    def rel(st: org.apache.hadoop.fs.FileStatus): String =
      st.getPath.toUri.getPath.stripPrefix(root)
    // metadata/transient entries (_SUCCESS, _temporary/..., .staging/...)
    // are excluded by ANY path component, not just the leaf — a task file
    // nested under _temporary has an ordinary leaf name
    def isMeta(st: org.apache.hadoop.fs.FileStatus): Boolean =
      rel(st).split('/').exists(seg => seg.startsWith("_") || seg.startsWith("."))
    // recursive: a partitioned table nests its data files under
    // part_col=... directories, which a flat listStatus would miss
    // (leaving a content-INDEPENDENT fingerprint — the stale-index bug
    // this function exists to prevent)
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    if (rootSt.isFile) files += rootSt
    else {
      val it = fs.listFiles(path, true)
      while (it.hasNext) {
        val st = it.next()
        if (!isMeta(st)) files += st
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    // root-relative path (not bare name): part files in different
    // partition dirs may share names
    md.update(java.nio.ByteBuffer.allocate(4).putInt(files.size).array())
    files.sortBy(st => rel(st)).foreach { st =>
      md.update(rel(st).getBytes("UTF-8"))
      md.update(java.nio.ByteBuffer.allocate(8).putLong(st.getLen).array())
      val tail = math.min(st.getLen, FingerprintTailBytes.toLong).toInt
      if (tail > 0) {
        val buf = new Array[Byte](tail)
        val in = fs.open(st.getPath)
        try { in.readFully(st.getLen - tail, buf, 0, tail) } finally in.close()
        md.update(buf)
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** View scan = projection pushdown
    * (reference: lib/UpdateStrategies.py:353-377). Only view-visible fields
    * survive; Catalyst prunes the scan to exactly those columns. */
  def applyView(df: DataFrame, view: View): DataFrame = {
    val present = df.columns.toSet
    val cols = view.visibleFields.filter(present)
    df.select(cols.map(col): _*)
  }
}
