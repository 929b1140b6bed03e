package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for CO-LOCATED joins — the 100 TB fact-to-fact join
  * path. A shuffle join moves both sides over the network every time;
  * writing each table `bucketBy(n, key)` fixes the key-to-file layout at
  * WRITE time, so every later join (or aggregation) on the key plans with
  * NO Exchange on either side: the bucket layout IS the hash
  * partitioning, paid once instead of per query. `sortBy` inside buckets
  * additionally lets sort-merge join skip its per-task sort.
  *
  * This is the "pre-partition the big tables" answer the reference cannot
  * express (its store is a document DB, one RPC per record —
  * lib/FirestoreClient.py); on Spark it is catalog metadata plus file
  * naming. Bucket counts must match across tables meant to join (document
  * the convention per subject area; a mismatch silently reintroduces the
  * shuffle on one side). */
object Bucketing {

  /** Persist `df` as a bucketed+sorted catalog table; joins and
    * aggregations on `keyCols` then shuffle nothing. `nBuckets` sizes
    * parallelism at read time — pick ~(table bytes / target partition
    * bytes), and keep it IDENTICAL across tables that join. */
  def writeBucketed(df: DataFrame, table: String, keyCols: Seq[String],
      nBuckets: Int, path: Option[String] = None): Unit = {
    require(keyCols.nonEmpty, "bucketing needs key columns")
    require(nBuckets > 0, s"nBuckets $nBuckets must be positive")
    // co-locate each bucket's rows in ONE task before the write: without
    // this, every task writes a file per bucket it touches (tasks x
    // buckets small files), and with more than one file per bucket Spark
    // drops the sorted-bucket property — voiding the sortBy's
    // skip-the-SMJ-sort promise. repartition's HashPartitioning is the
    // same murmur3 bucket hash, so each task lands exactly one bucket.
    val w = df.repartition(nBuckets, keyCols.map(df.col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
    // explicit path -> external table (data location decoupled from the
    // session's warehouse directory)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their bucket key. Provided for
    * symmetry/discoverability — the point is that this is a PLAIN join:
    * co-location comes from the tables' write-time layout, not from any
    * runtime hint. */
  def joinBucketed(spark: SparkSession, leftTable: String,
      rightTable: String, keyCols: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCols)

  /** Re-attach an EXISTING bucketed dataset (files written earlier by
    * [[writeBucketed]] with an explicit path) as an external catalog
    * table — the read side of write-once/join-many: a fresh session (or
    * an in-memory catalog that forgot the table) reuses the bucket files
    * without rewriting them. The bucket spec must match the one the files
    * were written with: Spark maps a file to its bucket by the `_NNNNN`
    * id in the file name and trusts the declared CLUSTERED BY — a wrong
    * spec silently mis-buckets every later join. */
  def registerBucketed(spark: SparkSession, table: String, schemaDdl: String,
      keyCols: Seq[String], nBuckets: Int, path: String): Unit = {
    require(keyCols.nonEmpty, "bucketing needs key columns")
    val keys = keyCols.map(k => s"`$k`").mkString(", ")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS `$table` ($schemaDdl)
         |USING parquet
         |CLUSTERED BY ($keys) SORTED BY ($keys) INTO $nBuckets BUCKETS
         |LOCATION '$path'""".stripMargin)
  }
}
