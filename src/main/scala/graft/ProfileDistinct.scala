package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for exact per-group COUNT(DISTINCT) under a
  * HOT GROUP: one group holds 90% of all rows, and the probe measures
  * what an insert-only window costs as that group's HISTORY grows.
  *
  * Two maintenance strategies race on the same mutation schedule:
  *
  *  - `rescan`  — the `distinctCols` path inside [[graft.operators.LakeView.refreshAggregate]]:
  *    touched groups recompute `dc_` by rescanning the SOURCE's rows
  *    for those groups. Correct under any retraction, but a window
  *    that touches the hot group rescans the hot group's FULL history
  *    — cost ∝ table, not delta.
  *  - `chain`   — COUNT(DISTINCT v) GROUP BY g factored into TWO
  *    ADDITIVE maintained views (the classic IVM factorization):
  *    V1 = count by (g, v) (a state row is live ⟺ multiplicity > 0),
  *    V2 = aggregate over V1's generation feed counting live rows per
  *    g. Both folds are purely additive — no rescan anywhere — so an
  *    insert window costs ∝ delta and a retraction costs ∝ delta too
  *    (the feed emits the killed value-rows as −1s).
  *
  * Scale with SPARK_GRAFT_DC_ROWS (default 500k); run at 1×/10×/100×
  * for the decade rows in SCALE.md. Prints per-window seconds for both
  * strategies plus a final equality check of the two dc states against
  * a direct recompute.
  */
object ProfileDistinct {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_DC_ROWS", "500000").toLong
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", LocalScratch.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val base = java.nio.file.Files.createTempDirectory("graft_pdc").toString
    val tbl = s"$base/t"
    val rescanView = s"$base/rescan"
    val chainRoot = s"$base/chain"
    val types = "G:singleLineText,Val:number"

    // 90% of rows land in group "hot"; values repeat ~4× inside the hot
    // group (distinct count ≪ row count, the shape where a rescan is
    // pure waste); 10% spread over 100 cold groups. `vmod` controls a
    // window's VALUE SPREAD: narrow insert windows (vmod=1000) repeat a
    // small value set — the common telemetry shape and the chain's best
    // case (few touched value-level buckets); broad windows (vmod=rows/4)
    // touch ~every bucket — the chain's worst case.
    def mkRows(from: Long, until: Long, vmod: Long) =
      spark.range(from, until).select(
        concat(lit("r"), lpad(col("id").cast("string"), 12, "0"))
          .as("_record_id"),
        when(col("id") % 10 < 9, lit("hot"))
          .otherwise(concat(lit("g"), (col("id") % 100).cast("string")))
          .as("G"),
        (col("id") % vmod).cast("double").as("Val"))
    val broadMod = math.max(rows / 4, 1L)

    def refreshRescan(tag: String) = t(s"rescan_$tag") {
      graft.operators.LakeView.refreshAggregate(spark, tbl, types,
        rescanView, Seq("G"), Seq.empty, distinctCols = Seq("Val"))
    }
    def refreshChain(tag: String) = t(s"chain_$tag") {
      graft.operators.LakeView.refreshDistinctCount(spark, tbl, types,
        chainRoot, Seq("G"), "Val")
    }

    t("seed_write")(mkRows(0L, rows, broadMod).coalesce(8)
      .write.format("graft-records").option("path", tbl)
      .option("dataFormat", "parquet").mode("append").save())
    t("seed_snap")(graft.operators.LakeSnapshots.commit(spark, tbl))
    refreshRescan("bootstrap")
    refreshChain("bootstrap")

    // insert-only windows, each ∼2% of the seed: two NARROW (the delta
    // repeats ~1000 existing values — rescan still pays the hot group's
    // whole history, the chain touches ~1000 value-level rows), then one
    // BROAD (delta spans the whole value space — the chain's worst case)
    val step = math.max(rows / 50, 1L)
    var head = rows
    for ((vmod, w) <- Seq(1000L, 1000L, broadMod).zipWithIndex) {
      val tag = if (vmod == broadMod) s"broad_${w + 1}" else s"narrow_${w + 1}"
      t(s"insert_write_$tag")(mkRows(head, head + step, vmod).coalesce(2)
        .write.format("graft-records").option("path", tbl)
        .option("dataFormat", "parquet").mode("append").save())
      t(s"insert_snap_$tag")(graft.operators.LakeSnapshots.commit(spark, tbl))
      refreshRescan(s"insert_$tag")
      refreshChain(s"insert_$tag")
      head += step
    }

    // one retraction wave: kill a 1-in-13 slice of ALL rows (hot group
    // included) — whole value classes vanish, the case register merges
    // get wrong and the rescan path exists for
    t("delete_wave")(graft.operators.DeletionVectors.delete(spark, tbl,
      types, pmod(col("Val"), lit(13.0)) === 5.0))
    t("delete_snap")(graft.operators.LakeSnapshots.commit(spark, tbl))
    refreshRescan("delete")
    refreshChain("delete")

    // equality: both maintained answers against a direct recompute
    val direct = spark.read.format("graft-records")
      .option("path", tbl).option("fieldTypes", types).load()
      .filter(col("Val").isNotNull)
      .groupBy("G").agg(countDistinct(col("Val")).as("dc"))
    val viaRescan = graft.operators.LakeView.read(spark, rescanView)
      .select(col("G"), col("dc_Val").as("dc"))
    val viaChain = graft.operators.LakeView.read(spark, chainRoot)
      .select(col("G"), col("n").as("dc"))
    val d1 = viaRescan.join(direct, Seq("G"), "full")
      .filter(!(viaRescan("dc") <=> direct("dc"))).count()
    val d2 = viaChain.join(direct, Seq("G"), "full")
      .filter(!(viaChain("dc") <=> direct("dc"))).count()
    println(s"PROFILE rescan_mismatches $d1")
    println(s"PROFILE chain_mismatches $d2")
    require(d1 == 0 && d2 == 0, "maintained distinct counts drifted")
    spark.stop()
  }
}
