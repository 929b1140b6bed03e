package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** Change-data-capture reads over the record lake's snapshot history —
  * the `cdc=true` read option turns the table into its own CHANGE FEED:
  * every row of `table@toVersion − table@fromVersion` with a signed
  * multiplicity column `m` (+1 insert, −1 delete), derived entirely
  * from snapshot-manifest file diffs and deletion-vector range
  * subtraction ([[graft.operators.LakeChangelog]]'s metadata-first
  * algebra, here as a connector surface):
  *
  *  - batch: `startingVersion` → `endingVersion` (default: current head)
  *    in one scan;
  *  - streaming: offsets ARE snapshot versions; each micro-batch is
  *    exactly ONE version transition (deterministic replay — a consumer
  *    maintaining a view applies the same deltas in the same waves on
  *    every run), composing with the sink's `snapshotPerEpoch` so one
  *    stream's epochs become another stream's change feed.
  *
  * `startingVersion = 0` means "before the first snapshot": the first
  * delta is v1's full content as inserts. Scans prune to CHANGED files
  * only, so a consumer's cost is ∝ the delta however big the table —
  * rows are emitted raw (un-netted); `IncrementalAgg.consolidate` is
  * the netting step, exactly as Z-relation consumers expect. Both data
  * tiers (JSONL and parquet) serve the feed through their ordinary
  * readers. */
private[v2] object RecordCdc {

  val MultCol = "m"

  def cdcSchema(tableSchema: StructType): StructType =
    tableSchema.add(StructField(MultCol, LongType, nullable = false))

  final case class CdcVersionOffset(version: Long) extends Offset {
    override def json(): String = s"""{"version":$version}"""
  }

  def parseOffset(json: String): CdcVersionOffset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    CdcVersionOffset(m.get("version").asLong())
  }

  /** One changed file's partition: `sign` rides to every row; `dvJson`
    * is the deletion-vector state to SUBTRACT (the from/to manifest's
    * frozen state); `includeJson` restricts to the positions of a
    * DV-growth diff (ranges, the inverse use of the DV codec). */
  final case class CdcInputPartition(file: String, sign: Long,
      dvJson: Option[String], includeJson: Option[String])
      extends InputPartition

  private def manifestOrEmpty(fs: org.apache.hadoop.fs.FileSystem,
      path: String, v: Long): Snapshots.Manifest =
    if (v == 0L) Snapshots.Manifest(0L, Seq.empty)
    else Snapshots.load(fs, path, v)

  /** The changed-file partitions of `(fromV, toV]`. */
  def planDiff(path: String, conf: org.apache.hadoop.conf.Configuration,
      fromV: Long, toV: Long): Array[InputPartition] = {
    require(fromV <= toV, s"cdc: fromV $fromV must not exceed toV $toV")
    if (fromV == toV) return Array.empty
    val fs = new Path(path).getFileSystem(conf)
    val f1 = manifestOrEmpty(fs, path, fromV).files.toMap
    val f2 = manifestOrEmpty(fs, path, toV).files.toMap
    def full(n: String) = new Path(path, n).toString
    val added = (f2.keySet -- f1.keySet).toSeq.sorted.map { n =>
      CdcInputPartition(full(n), 1L, f2(n), None): InputPartition
    }
    val removed = (f1.keySet -- f2.keySet).toSeq.sorted.map { n =>
      CdcInputPartition(full(n), -1L, f1(n), None): InputPartition
    }
    val dvGrew = (f1.keySet & f2.keySet).toSeq.sorted.flatMap { n =>
      f2(n).map(DeletionVector.parse) match {
        case None => None
        case Some(v2) =>
          val diff = graft.operators.LakeChangelog.subtractRanges(
            v2, f1(n).map(DeletionVector.parse))
          if (diff.isEmpty) None
          else {
            val ranges = diff.map { case (s, e) => s"[$s,$e]" }
              .mkString("[", ",", "]")
            Some(CdcInputPartition(full(n), -1L, None,
              Some(s"""{"ranges":$ranges}""")): InputPartition)
          }
      }
    }
    (added ++ removed ++ dvGrew).toArray
  }
}

/** The CDC face of a record lake (`cdc=true`): batch reads a version
  * window, streaming replays one snapshot transition per micro-batch. */
private[v2] class RecordCdcTable(tableSchema: StructType,
    props: Map[String, String]) extends Table with SupportsRead {
  private def path = props.getOrElse("path",
    throw new IllegalStateException("cdc read needs a table path"))
  override def name(): String = s"graft-records-cdc($path)"
  override def schema(): StructType = RecordCdc.cdcSchema(tableSchema)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new RecordCdcScan(tableSchema, path, merged)
  }
}

private[v2] class RecordCdcScan(tableSchema: StructType, path: String,
    opts: Map[String, String]) extends ScanBuilder with Scan with Batch {
  private val confProps = {
    val c = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    c.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
  }
  private def conf = RecordSource.confFrom(confProps)
  private val former = RecordSource.parseFormer(opts.get("formerNames"))

  override def build(): Scan = this
  override def readSchema(): StructType = RecordCdc.cdcSchema(tableSchema)
  override def description(): String = s"RecordCdcScan(path=$path)"
  override def toBatch: Batch = this

  // headVersion, not versions(...).last: a conflicting snapshot commit
  // can WITHDRAW a just-listed head; the stable head re-resolves
  private def head: Long = Snapshots
    .headVersion(new Path(path).getFileSystem(conf), new Path(path))
    .getOrElse(0L)

  override def planInputPartitions(): Array[InputPartition] = {
    val from = opts.get("startingVersion").map(_.toLong).getOrElse(
      throw new IllegalArgumentException(
        "cdc batch read needs startingVersion (0 = before the first " +
          "snapshot); add endingVersion to bound the window"))
    val to = opts.get("endingVersion").map(_.toLong).getOrElse(head)
    RecordCdc.planDiff(path, conf, from, to)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RecordCdcReaderFactory(tableSchema, confProps, former)

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream = new MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
    import RecordCdc.CdcVersionOffset
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    private val startVersion =
      opts.get("startingVersion").map(_.toLong).getOrElse(head)
    // PACING: by default each micro-batch is exactly ONE snapshot
    // transition (deterministic replay — a consumer maintaining a view
    // applies the same deltas in the same waves on every run).
    // `maxVersionsPerBatch=k` coalesces up to k adjacent transitions
    // into one batch — the manifest diff COMPOSES (within-window churn
    // nets away), so a table with thousands of tiny per-epoch commits
    // (snapshotPerEpoch sinks) doesn't force thousands of micro-batches;
    // replay stays deterministic because offsets are still version
    // numbers laid down by this same rule. `initialSnapshotOneBatch`
    // additionally jumps the FIRST batch straight to the live head —
    // the bootstrap backfill as one scan, then per-`k` tailing.
    private val maxVersions = {
      val k = opts.get("maxVersionsPerBatch").map(_.toLong).getOrElse(1L)
      require(k >= 1L, s"maxVersionsPerBatch $k must be >= 1")
      k
    }
    private val initialOneBatch =
      opts.get("initialSnapshotOneBatch").exists(_.toBoolean)
    override def initialOffset(): Offset = CdcVersionOffset(startVersion)
    // the engine drives the 2-arg latestOffset because
    // SupportsAdmissionControl is present
    override def latestOffset(): Offset =
      throw new UnsupportedOperationException(
        "admission-controlled: latestOffset(start, limit)")
    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val s = start.asInstanceOf[CdcVersionOffset].version
      if (initialOneBatch && s == startVersion) CdcVersionOffset(head)
      else CdcVersionOffset(math.min(head, s + maxVersions))
    }
    override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
    override def reportLatestOffset(): Offset = CdcVersionOffset(head)
    override def deserializeOffset(json: String): Offset =
      RecordCdc.parseOffset(json)
    override def planInputPartitions(start: Offset, end: Offset)
        : Array[InputPartition] =
      RecordCdc.planDiff(path, conf,
        start.asInstanceOf[CdcVersionOffset].version,
        end.asInstanceOf[CdcVersionOffset].version)
    override def createReaderFactory(): PartitionReaderFactory =
      new RecordCdcReaderFactory(tableSchema, confProps, former)
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }
}

private[v2] class RecordCdcReaderFactory(tableSchema: StructType,
    confProps: Map[String, String],
    former: Map[String, Seq[String]]) extends PartitionReaderFactory {
  @transient private lazy val conf = RecordSource.confFrom(confProps)

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RecordCdc.CdcInputPartition]
    // inner reader: the ordinary format reader over the table columns
    // plus `_pos` (for the inclusion mask), with the partition's frozen
    // DV state — both data tiers serve CDC through their normal paths
    val innerSchema = tableSchema
      .add(StructField(RecordSource.PosCol, LongType, nullable = false))
    val dvOverride = Some(Map(p.file -> p.dvJson))
    val inner: PartitionReader[InternalRow] =
      if (p.file.endsWith(ParquetRecords.Extension))
        new ParquetRecordPartitionReader(p.file, innerSchema, tableSchema,
          conf, Array.empty, "FAILFAST", dvOverride, former)
      else
        new RecordPartitionReader(p.file, innerSchema, tableSchema, conf,
          Array.empty, None, None, None, "FAILFAST", dvOverride, former)
    val include = p.includeJson.map(DeletionVector.parse)
    val nCols = tableSchema.length
    val posIdx = nCols // _pos rides last in innerSchema
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (include.forall(_.contains(r.getLong(posIdx)))) {
            val vals = new Array[Any](nCols + 1)
            var i = 0
            while (i < nCols) {
              vals(i) = r.get(i, tableSchema(i).dataType)
              i += 1
            }
            vals(nCols) = p.sign
            current = InternalRow.fromSeq(vals.toIndexedSeq)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = inner.close()
    }
  }
}
