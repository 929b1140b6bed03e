package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** A `TableCatalog` over record lakes, giving the engine a full SQL
  * surface by name:
  * {{{
  * spark.conf.set("spark.sql.catalog.graft",
  *   "graft.sources.v2.RecordCatalog")
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/lakes")
  * spark.sql("CREATE TABLE graft.ns.t (Name STRING, Score DOUBLE)")
  * spark.sql("INSERT INTO graft.ns.t SELECT ...")
  * spark.sql("DELETE FROM graft.ns.t WHERE Score < 0")   // -> DVs
  * spark.sql("SELECT ... FROM graft.ns.t VERSION AS OF 2") // -> snapshots
  * }}}
  * A table is a directory `<warehouse>/<ns...>/<name>` holding the
  * record files plus a `_table.json` carrying the declared field types
  * (the catalog's only metadata — everything else lives in the lake's
  * own sidecars). The declared columns are the USER columns; the system
  * columns `_record_id`/`_created_time` are prepended automatically,
  * exactly as the path-based reads do. DELETE routes through deletion
  * vectors ([[RecordTable.deleteWhere]]); `VERSION AS OF` pins the
  * snapshot manifest into the loaded table's properties.
  *
  * Reference basis: the reference addresses tables by name through the
  * Airtable metadata API (lib/AirtableDataFetcher.py:50); this is the
  * same by-name surface on the engine's own storage. */
class RecordCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse"))
  }
  override def name(): String = catalogName

  private def conf = org.apache.spark.sql.SparkSession.active
    .sparkContext.hadoopConfiguration
  private def tableDir(ident: Identifier): Path =
    new Path((warehouse +: ident.namespace().toSeq :+ ident.name())
      .mkString("/"))
  private def metaPath(d: Path): Path = new Path(d, "_table.json")

  /** Spark type -> source field-type tag (SchemaMapper's inverse). */
  private def fieldTag(dt: DataType): String = dt match {
    case StringType => "singleLineText"
    case DoubleType => "number"
    case BooleanType => "checkbox"
    case DateType => "date"
    case TimestampType => "dateTime"
    case ArrayType(StringType, _) => "multipleSelects"
    case ArrayType(DoubleType, _) => "numberArray"
    case other => throw new IllegalArgumentException(
      s"graft catalog: unsupported column type $other (supported: " +
        "STRING, DOUBLE, BOOLEAN, DATE, TIMESTAMP, ARRAY<STRING>, " +
        "ARRAY<DOUBLE>)")
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) Array.empty
    else fs.listStatus(d).filter(_.isDirectory).map(_.getPath)
      .filter(p => fs.exists(metaPath(p)))
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    d.getFileSystem(conf).exists(metaPath(d))
  }

  override def loadTable(ident: Identifier): Table = loadWith(ident, Map.empty)

  /** SQL `VERSION AS OF <v>` time travel: the version pins the snapshot
    * manifest into the table's properties, which the scan honors. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadWith(ident, Map("versionAsOf" -> version))

  private def loadWith(ident: Identifier,
      extraProps: Map[String, String]): Table = {
    val d = tableDir(ident)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(metaPath(d)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace().toSeq :+ ident.name()))
    val in = fs.open(metaPath(d))
    val bytes = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
    in.close()
    val root = new ObjectMapper().readTree(bytes.toString("UTF-8"))
    val fields = root.get("fields").elements().asScala.map(e =>
      e.get("name").asText() -> e.get("type").asText()).toSeq
    // RENAME COLUMN is metadata-only: the current name maps to the
    // former wire keys old rows still carry ("Cur:Old1|Old0,...")
    val formers = root.get("fields").elements().asScala.flatMap { e =>
      Option(e.get("former")).filterNot(_.isNull).filter(_.size() > 0)
        .map(f => e.get("name").asText() ->
          f.elements().asScala.map(_.asText()).mkString("|"))
    }.toSeq
    val formerProp =
      if (formers.isEmpty) Seq.empty
      else Seq("formerNames" ->
        formers.map { case (k, v) => s"$k:$v" }.mkString(","))
    val layoutProps = Seq("clusterBy", "bloomFilterColumns", "dataFormat")
      .flatMap { k =>
        Option(root.get(k)).filterNot(_.isNull).map(k -> _.asText())
      }
    new RecordTable(RecordSource.fullSchema(fields),
      Map("path" -> d.toString,
        "fieldTypes" -> fields.map { case (k, v) => s"$k:$v" }.mkString(","))
        ++ formerProp ++ layoutProps ++ extraProps)
  }

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    require(info.partitions().isEmpty,
      "graft catalog: partition transforms are unsupported — cluster " +
        "with the clusterBy WRITE option (storage-partitioned joins) " +
        "or ZOrder.cluster instead")
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException((ident.namespace().toSeq :+ ident.name()))
    // declared columns are the USER fields; system columns are implied
    // (declaring them explicitly is tolerated and skipped)
    val system = Set("_record_id", "_created_time")
    val fields = info.schema().fields.toSeq
      .filterNot(f => system.contains(f.name))
      .map(f => f.name -> fieldTag(f.dataType))
    val d = tableDir(ident)
    val fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val arr = root.putArray("fields")
    fields.foreach { case (k, v) =>
      val e = arr.addObject(); e.put("name", k); e.put("type", v)
    }
    // TBLPROPERTIES that shape the physical layout persist with the
    // table: every SQL INSERT then clusters/blooms without the writer
    // restating options, and reads derive KeyGroupedPartitioning —
    // storage-partitioned joins in pure SQL
    val layoutProps = Seq("clusterBy", "bloomFilterColumns", "dataFormat")
      .flatMap { k =>
        Option(info.properties().get(k)).map(k -> _)
      }
    layoutProps.foreach { case (k, v) => root.put(k, v) }
    layoutProps.toMap.get("clusterBy").foreach { k =>
      require(fields.exists(_._1 == k),
        s"TBLPROPERTIES clusterBy '$k' is not a declared column")
    }
    val out = fs.create(metaPath(d), false) // no clobber: create-once
    out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    out.close()
    new RecordTable(RecordSource.fullSchema(fields), Map(
      "path" -> d.toString,
      "fieldTypes" -> fields.map { case (k, v) => s"$k:$v" }.mkString(","))
      ++ layoutProps)
  }

  /** ADD / RENAME / DROP COLUMN — all pure metadata edits on a sparse
    * record lake (no data file is ever touched):
    *  - ADD: every existing row already reads the new field as NULL;
    *  - RENAME: the field keeps its data under the former wire key(s);
    *    reads fall back through the `former` list ([[RecordSource]]'s
    *    `formerNames`), so old and new rows join under the new name —
    *    including time travel to pre-rename snapshots;
    *  - DROP: the field leaves the schema (a projection mask); its name
    *    and former keys are tombstoned in `dropped` so a later ADD can
    *    never silently RESURRECT the orphaned values under a reused
    *    name (the classic rename/drop hazard — refused loudly instead).
    * Retype stays refused (it would strand committed data). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = tableDir(ident)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(metaPath(d)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace().toSeq :+ ident.name()))
    val mapper = new ObjectMapper()
    val root = mapper.readTree(readMeta(fs, d))
    // working model: (name, type, formerKeys), plus the tombstone set
    var fields = root.get("fields").elements().asScala.map { e =>
      (e.get("name").asText(), e.get("type").asText(),
        Option(e.get("former")).filterNot(_.isNull)
          .map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(Seq.empty))
    }.toSeq
    var dropped = Option(root.get("dropped")).filterNot(_.isNull)
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
    def allWireNames: Set[String] =
      fields.flatMap(f => f._1 +: f._3).toSet ++ dropped
    def one(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        "graft catalog: nested columns are unsupported")
      fieldNames(0)
    }
    changes.foreach {
      case a: TableChange.AddColumn =>
        val n = one(a.fieldNames())
        require(!fields.exists(_._1 == n),
          s"graft catalog: column '$n' already exists")
        require(!allWireNames.contains(n),
          s"graft catalog: '$n' was a former or dropped column name — " +
            "re-adding it would resurrect orphaned values old rows " +
            "still carry under that key; pick a fresh name")
        fields = fields :+ ((n, fieldTag(a.dataType()), Seq.empty[String]))
      case r: TableChange.RenameColumn =>
        val from = one(r.fieldNames()); val to = r.newName()
        val idx = fields.indexWhere(_._1 == from)
        require(idx >= 0, s"graft catalog: no column '$from' to rename")
        require(!fields.exists(_._1 == to),
          s"graft catalog: rename target '$to' already exists")
        require(!allWireNames.contains(to),
          s"graft catalog: '$to' was a former or dropped column name — " +
            "reusing it would make old rows' orphaned values resurrect")
        val (_, tpe, formers) = fields(idx)
        fields = fields.updated(idx, (to, tpe, from +: formers))
        // layout props follow the rename
        Seq("clusterBy", "bloomFilterColumns").foreach { k =>
          Option(root.get(k)).filterNot(_.isNull).map(_.asText()).foreach {
            v =>
              val nv = v.split(",").map(c => if (c == from) to else c)
                .mkString(",")
              root.asInstanceOf[com.fasterxml.jackson.databind.node
                .ObjectNode].put(k, nv)
          }
        }
      case del: TableChange.DeleteColumn =>
        val n = one(del.fieldNames())
        val idx = fields.indexWhere(_._1 == n)
        require(idx >= 0, s"graft catalog: no column '$n' to drop")
        Option(root.get("clusterBy")).filterNot(_.isNull)
          .map(_.asText()).foreach(k => require(k != n,
            s"graft catalog: '$n' is the clusterBy column — the physical" +
              " layout depends on it; re-cluster before dropping"))
        val (_, _, formers) = fields(idx)
        dropped = (dropped :+ n) ++ formers
        fields = fields.patch(idx, Nil, 1)
        Option(root.get("bloomFilterColumns")).filterNot(_.isNull)
          .map(_.asText()).foreach { v =>
            val nv = v.split(",").filterNot(_ == n).mkString(",")
            val rn = root.asInstanceOf[com.fasterxml.jackson.databind.node
              .ObjectNode]
            if (nv.isEmpty) rn.remove("bloomFilterColumns")
            else rn.put("bloomFilterColumns", nv)
          }
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER ($other) — ADD, RENAME and " +
          "DROP COLUMN are metadata-only on a sparse record lake; a " +
          "retype would strand committed data")
    }
    val out = mapper.createObjectNode()
    val arr = out.putArray("fields")
    fields.foreach { case (k, v, formers) =>
      val e = arr.addObject(); e.put("name", k); e.put("type", v)
      if (formers.nonEmpty) {
        val fa = e.putArray("former"); formers.foreach(fa.add)
      }
    }
    if (dropped.nonEmpty) {
      val da = out.putArray("dropped"); dropped.distinct.foreach(da.add)
    }
    Seq("clusterBy", "bloomFilterColumns", "dataFormat").foreach { k =>
      Option(root.get(k)).filterNot(_.isNull).foreach(v =>
        out.put(k, v.asText()))
    }
    val w = fs.create(metaPath(d), true)
    w.write(mapper.writeValueAsString(out).getBytes("UTF-8"))
    w.close()
    loadWith(ident, Map.empty)
  }

  private def readMeta(fs: org.apache.hadoop.fs.FileSystem, d: Path): String = {
    val in = fs.open(metaPath(d))
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(metaPath(d))) false
    else fs.delete(d, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val fd = tableDir(from)
    val td = tableDir(to)
    val fs = fd.getFileSystem(conf)
    if (!fs.exists(metaPath(fd)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (from.namespace().toSeq :+ from.name()))
    if (fs.exists(td))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException((to.namespace().toSeq :+ to.name()))
    fs.mkdirs(td.getParent)
    if (!fs.rename(fd, td))
      throw new java.io.IOException(s"rename $fd -> $td failed")
  }
}
