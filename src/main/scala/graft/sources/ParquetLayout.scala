package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout audit over parquet FOOTERS — the metadata pass a
  * 100-TB table owner runs before anything else: row-group sizes decide
  * split granularity (`spark.sql.files.maxPartitionBytes` tuning), and
  * footer row counts must reconcile with the data (a mismatch means a
  * truncated or corrupt write). Footers are read DISTRIBUTED — one task
  * per file batch via `mapPartitions`, so a million-file lake audits in
  * parallel; only the per-row-group summary rows (a few per file) ever
  * move.
  *
  * Reference ties: the sync engine trusts its store's document counts
  * when reconciling batches (lib/DataProcessor.py key-set compare);
  * at parquet scale the footer IS that count, and this operator is the
  * reconciliation's storage side. */
object ParquetLayout {

  /** One row per (table, row group): footer row count, top-level column
    * count, uncompressed/compressed byte totals. `tables` is
    * (name, path) pairs; paths may be single files or directories of
    * part-files (each data file contributes its groups, group ids
    * numbered per file in footer order). */
  def layout(spark: SparkSession, tables: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val hconfSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bc = spark.sparkContext.broadcast(hconfSer)
    tables.toDF("tbl", "path").as[(String, String)]
      .repartition(math.min(tables.size, spark.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val conf = bc.value.value
        it.flatMap { case (tbl, p) =>
          val root = new org.apache.hadoop.fs.Path(p)
          val fs = root.getFileSystem(conf)
          val files =
            if (fs.getFileStatus(root).isDirectory)
              fs.listStatus(root).toSeq.map(_.getPath)
                .filter(f => f.getName.endsWith(".parquet"))
                .sortBy(_.getName)
            else Seq(root)
          files.flatMap { f =>
            val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
            try {
              val footer = reader.getFooter
              val nCols = footer.getFileMetaData.getSchema.getFieldCount
              import scala.jdk.CollectionConverters._
              footer.getBlocks.asScala.toSeq.zipWithIndex.map { case (b, i) =>
                (tbl, i.toLong, b.getRowCount,
                  nCols.toLong, b.getTotalByteSize,
                  b.getColumns.asScala.map(_.getTotalSize).sum)
              }
            } finally reader.close()
          }
        }
      }
      .toDF("tbl", "row_group", "n_rows", "n_cols",
        "bytes_uncompressed", "bytes_compressed")
  }
}
