package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for the parquet record tier's scan inner loop:
  * the same wide-table scans through the vectorized (ColumnarBatch)
  * reader and the row-materializing fallback, min-of-K wall times. The
  * SCALE.md "columnar vs row path" rows come from here. */
object ProfileParquet {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", LocalScratch.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    // a WIDE record table: 12 numeric + 4 string + flag/date columns,
    // scaled off the documents fixture
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val repl = sys.env.getOrElse("SPARK_GRAFT_PQ_REPL", "8").toInt
    val wide = docs
      .crossJoin(spark.range(repl).select(col("id").as("r")))
      .select(
        concat(lit("d"), col("r").cast("string"), lit("-"),
          lpad(col("doc_id").cast("string"), 7, "0")).as("_record_id"),
        (col("doc_id") * col("r")).cast("double").as("N0"),
        (col("n_chars")).cast("double").as("N1"),
        (col("n_chars") * 2).cast("double").as("N2"),
        (col("n_chars") % 97).cast("double").as("N3"),
        (col("doc_id") % 1001).cast("double").as("N4"),
        (col("doc_id") % 13).cast("double").as("N5"),
        (col("doc_id") % 7).cast("double").as("N6"),
        (col("doc_id") % 3).cast("double").as("N7"),
        rint(col("doc_id") / 10).as("N8"),
        rint(col("n_chars") / 100).as("N9"),
        (col("doc_id") + col("r")).cast("double").as("N10"),
        (col("n_chars") + col("r")).cast("double").as("N11"),
        col("lang").as("S0"),
        substring(col("text"), 1, 64).as("S1"),
        upper(col("lang")).as("S2"),
        concat(col("lang"), lit("-"), (col("doc_id") % 5).cast("string"))
          .as("S3"),
        (col("doc_id") % 2 === 0).as("Flag"),
        // embedding-shaped payload: a 32-wide double vector per record
        array((0 until 32).map(k =>
          ((col("doc_id") + lit(k)) % 997).cast("double")): _*).as("Emb"),
        split(substring(col("text"), 1, 64), " ").as("Toks"))

    val dir = java.nio.file.Files.createTempDirectory("graft_pq_prof")
      .toString + "/t"
    // SPARK_GRAFT_PQ_FILES scales the FILE count at constant rows (the
    // 100×-files probe: per-file overheads — footer reads, reader
    // instantiation, DV lookups — must not erode the columnar gain)
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_PQ_FILES", "8").toInt
    wide.repartition(nFiles).write.format("graft-records")
      .option("path", dir).option("dataFormat", "parquet")
      .mode("append").save()
    val types = (0 to 11).map(i => s"N$i:number").mkString(",") + "," +
      (0 to 3).map(i => s"S$i:singleLineText").mkString(",") +
      ",Flag:checkbox,Emb:numberArray,Toks:multipleSelects"
    def rd = spark.read.format("graft-records").option("path", dir)
      .option("fieldTypes", types).load()
    println(s"PROFILE corpus rows=${rd.count()} files=$nFiles repl=$repl")

    def minOfK(k: Int)(f: => Long): Double =
      (0 until k).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        require(n > 0)
        (System.nanoTime() - t0) / 1e9
      }.min

    val scans: Seq[(String, () => Long)] = Seq(
      ("full_width_agg", () => rd.agg(
        (0 to 11).map(i => sum(col(s"N$i"))).reduce(_ + _)).collect()
        .length.toLong),
      ("narrow_2col", () => rd.select(sum(col("N1")), count(col("S0")))
        .collect().length.toLong),
      ("string_heavy", () => rd.select(sum(length(col("S1"))) +
        sum(length(col("S3")))).as[Double](spark.implicits.newDoubleEncoder)
        .collect().head.toLong),
      ("filtered_10pct", () => rd.filter(col("N4") < 100.0)
        .agg(sum(col("N1"))).collect().length.toLong),
      // array decode: fold the whole embedding column (the ANN
      // brute-force shape) and a string-array length scan
      ("embedding_fold", () => rd.select(
        sum(aggregate(col("Emb"), lit(0.0d),
          (acc, x) => acc + x * x))).collect().length.toLong),
      ("string_array_scan", () => rd.select(sum(size(col("Toks"))))
        .collect().length.toLong),
      ("count_star", () => rd.count()))

    val results = scans.map { case (name, f) =>
      graft.sources.v2.RecordSourceMetrics.columnarEnabled = true
      val tCol = minOfK(3)(f())
      graft.sources.v2.RecordSourceMetrics.columnarEnabled = false
      val tRow = minOfK(3)(f())
      graft.sources.v2.RecordSourceMetrics.columnarEnabled = true
      println(f"PROFILE $name columnar=$tCol%.3fs row=$tRow%.3fs " +
        f"speedup=${tRow / tCol}%.2fx")
      (name, tCol, tRow)
    }
    val js = results.map { case (n, c, r) =>
      f""""$n":{"columnar":$c%.3f,"row":$r%.3f,"speedup":${r / c}%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"parquet_columnar_vs_row","scans":$js}""")
    spark.stop()
  }
}
