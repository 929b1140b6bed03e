package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for the q297-shaped JOIN-view lifecycle:
  * per-phase wall times (table builds, snapshot commits, each bilinear
  * refresh) so the decade ratios in SCALE.md attribute time to the
  * right phase — fixture building vs the view machinery under test. */
object ProfileJoinView {
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
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val base = java.nio.file.Files.createTempDirectory("graft_pjv").toString
    val lt = s"$base/l"; val rt = s"$base/r"; val view = s"$base/v"
    val ltypes = "OKey:number,CKey:number,Price:number"
    val rtypes = "CKey:number,Seg:singleLineText"
    val orders = graft.sources.Sources.readTable(spark, sfDir, "orders")
      .select(
        concat(lit("o"), col("o_orderkey").cast("string")).as("_record_id"),
        col("o_orderkey").cast("double").as("OKey"),
        col("o_custkey").cast("double").as("CKey"),
        col("o_totalprice").cast("double").as("Price"))
    val cust = graft.sources.Sources.readTable(spark, sfDir, "customer")
      .select(
        concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
        col("c_custkey").cast("double").as("CKey"),
        col("c_mktsegment").as("Seg"))
    def refresh(tag: String) = t(s"refresh_$tag") {
      graft.operators.LakeView.refreshJoin(spark, view,
        lt, ltypes, Seq("CKey", "OKey", "Price"),
        rt, rtypes, Seq("CKey", "Seg"), Seq("CKey"))
    }
    t("build_left_wave1") {
      orders.filter(col("OKey") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", lt)
        .option("dataFormat", "parquet").mode("append").save()
    }
    t("build_right") {
      cust.coalesce(1)
        .write.format("graft-records").option("path", rt)
        .option("dataFormat", "parquet").mode("append").save()
    }
    t("commits_1") {
      graft.operators.LakeSnapshots.commit(spark, lt)
      graft.operators.LakeSnapshots.commit(spark, rt)
    }
    refresh("bootstrap")
    t("build_left_wave2") {
      orders.filter(col("OKey") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", lt)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(spark, lt)
    }
    refresh("left_append")
    t("right_delete") {
      graft.operators.DeletionVectors.delete(spark, rt, rtypes,
        col("CKey") % 5 === 0)
      graft.operators.LakeSnapshots.commit(spark, rt)
    }
    refresh("right_delete")
    refresh("idle")
    t("read_agg") {
      graft.operators.LakeView.read(spark, view)
        .groupBy(col("Seg")).agg(sum(col("m"))).collect()
    }
    spark.stop()
  }
}
