package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for the q295-shaped lake-view lifecycle: per-
  * phase wall times (seed write, delete, snapshot commits, each
  * refresh) at one SF dir — run at sf0.1 / 10× / 100× to see which
  * phase drives the decade ratios in SCALE.md. */
object ProfileLakeView {
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

    val out = java.nio.file.Files.createTempDirectory("graft_plv").toString + "/t"
    val view = java.nio.file.Files.createTempDirectory("graft_plv").toString + "/v"
    val types = "DocId:number,Chars:number,Lang:singleLineText"
    val docs = graft.sources.Sources.readTable(spark, sfDir, "documents")
      .filter(col("lang").isNotNull)
      .select(
        concat(lit("d"), lpad(col("doc_id").cast("string"), 9, "0"))
          .as("_record_id"),
        col("doc_id").cast("double").as("DocId"),
        col("n_chars").cast("double").as("Chars"),
        col("lang").as("Lang"))
    def refresh(tag: String) = t(s"refresh_$tag") {
      graft.operators.LakeView.refreshAggregate(
        spark, out, types, view, Seq("Lang"), Seq("Chars", "DocId"))
    }
    t("write_01")(docs.filter(col("DocId") % 3 < 2).coalesce(2)
      .write.format("graft-records").option("path", out)
      .mode("append").save())
    t("snap1")(graft.operators.LakeSnapshots.commit(spark, out))
    refresh("1")
    t("delete")(graft.operators.DeletionVectors.delete(spark, out, types,
      col("Chars") < 200))
    t("snap2")(graft.operators.LakeSnapshots.commit(spark, out))
    refresh("2")
    t("write_2")(docs.filter(col("DocId") % 3 === 2).coalesce(1)
      .write.format("graft-records").option("path", out)
      .mode("append").save())
    t("snap3")(graft.operators.LakeSnapshots.commit(spark, out))
    refresh("3")
    t("read_view")(graft.operators.LakeView.read(spark, view).count())

    // ---- q297-shaped JOIN view ------------------------------------
    val base = java.nio.file.Files.createTempDirectory("graft_plvj").toString
    val lt = s"$base/l"; val rt = s"$base/r"; val jview = s"$base/v"
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
    def jrefresh(tag: String) = t(s"jrefresh_$tag") {
      graft.operators.LakeView.refreshJoin(spark, jview,
        lt, ltypes, Seq("CKey", "OKey", "Price"),
        rt, rtypes, Seq("CKey", "Seg"), Seq("CKey"))
    }
    t("jwrite_1")(orders.filter(col("OKey") % 3 < 2).coalesce(2)
      .write.format("graft-records").option("path", lt).mode("append").save())
    t("jwrite_r")(cust.coalesce(1)
      .write.format("graft-records").option("path", rt).mode("append").save())
    t("jsnap_1") {
      graft.operators.LakeSnapshots.commit(spark, lt)
      graft.operators.LakeSnapshots.commit(spark, rt)
    }
    jrefresh("1")
    t("jwrite_2")(orders.filter(col("OKey") % 3 === 2).coalesce(1)
      .write.format("graft-records").option("path", lt).mode("append").save())
    t("jsnap_2")(graft.operators.LakeSnapshots.commit(spark, lt))
    jrefresh("2")
    t("jdelete")(graft.operators.DeletionVectors.delete(spark, rt, rtypes,
      col("CKey") % 5 === 0))
    t("jsnap_3")(graft.operators.LakeSnapshots.commit(spark, rt))
    jrefresh("3")
    jrefresh("idle")
    t("jread_view")(graft.operators.LakeView.read(spark, jview).count())

    // ---- KEYED aggregate view (group count ∝ SF) --------------------
    // The training-data shape: one group PER DOCUMENT (the reference's
    // per-pk keyed target collection at corpus cardinality). The probe
    // separates bootstrap (∝ table) from the steady refreshes the
    // bucketed state exists for: a single-key delta and a spread 1%-of-
    // keys delta — refresh cost must track the DELTA (touched buckets'
    // state, bounded per bucket by the growth rule), never |groups|.
    val kbase = java.nio.file.Files.createTempDirectory("graft_plvk").toString
    val kt = s"$kbase/t"; val kview = s"$kbase/v"
    val ktypes = "DocId:number,Chars:number"
    val kdocs = graft.sources.Sources.readTable(spark, sfDir, "documents")
      .select(
        concat(lit("d"), lpad(col("doc_id").cast("string"), 9, "0"))
          .as("_record_id"),
        col("doc_id").cast("double").as("DocId"),
        col("n_chars").cast("double").as("Chars"))
    def krefresh(tag: String) = t(s"krefresh_$tag") {
      graft.operators.LakeView.refreshAggregate(spark, kt, ktypes, kview,
        Seq("DocId"), Seq("Chars"))
    }
    t("kwrite")(kdocs.coalesce(4)
      .write.format("graft-records").option("path", kt)
      .option("dataFormat", "parquet").mode("append").save())
    t("ksnap_1")(graft.operators.LakeSnapshots.commit(spark, kt))
    krefresh("bootstrap")
    t("kdelete_1key")(graft.operators.DeletionVectors.delete(spark, kt,
      ktypes, col("DocId") === 42.0))
    t("ksnap_2")(graft.operators.LakeSnapshots.commit(spark, kt))
    krefresh("1key")
    t("kdelete_1pct")(graft.operators.DeletionVectors.delete(spark, kt,
      ktypes, pmod(col("DocId"), lit(100.0)) === 7.0))
    t("ksnap_3")(graft.operators.LakeSnapshots.commit(spark, kt))
    krefresh("1pct")
    krefresh("idle")
    t("kread_view")(graft.operators.LakeView.read(spark, kview).count())

    // ---- q312-shaped JOIN3 + q309-shaped COMPOSED, with per-phase
    // attribution from LakeView.phaseSink: where does a chained
    // refresh's wall time actually go (delta jobs vs state write vs
    // metadata)? ------------------------------------------------------
    val phases = new java.util.concurrent.ConcurrentHashMap[String, (Long, Double)]()
    graft.operators.LakeView.phaseSink = (name, sec) =>
      phases.merge(name, (1L, sec),
        (a, b) => (a._1 + b._1, a._2 + b._2))
    def dumpPhases(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      phases.asScala.toSeq.sortBy(-_._2._2).foreach { case (n, (c, s)) =>
        println(f"PROFILE   $tag.phase $n%-14s n=$c%-3d ${s}%.2fs")
      }
      phases.clear()
    }

    val profBuckets =
      sys.env.getOrElse("SPARK_GRAFT_PROFILE_BUCKETS", "0").toInt
    val b3 = java.nio.file.Files.createTempDirectory("graft_plv3").toString
    val (t0p, t1p, t2p, v3) = (s"$b3/f", s"$b3/d1", s"$b3/d2", s"$b3/v")
    val nat = graft.sources.Sources.readTable(spark, sfDir, "nation")
      .select(concat(lit("n"), col("n_nationkey").cast("string"))
          .as("_record_id"),
        col("n_nationkey").cast("double").as("NKey"),
        col("n_name").as("NName"))
    val cust3 = graft.sources.Sources.readTable(spark, sfDir, "customer")
      .select(concat(lit("c"), col("c_custkey").cast("string"))
          .as("_record_id"),
        col("c_custkey").cast("double").as("CKey"),
        col("c_nationkey").cast("double").as("NKey"))
    def refresh3(tag: String) = {
      t(s"j3refresh_$tag")(graft.operators.LakeView.refreshJoin3(spark, v3,
        t0p, "OKey:number,CKey:number,Price:number",
        Seq("CKey", "OKey", "Price"),
        t1p, "CKey:number,NKey:number", Seq("CKey", "NKey"),
        t2p, "NKey:number,NName:singleLineText", Seq("NKey", "NName"),
        keys01 = Seq("CKey"), keys12 = Seq("NKey"),
        stateBuckets = profBuckets))
      dumpPhases(s"j3_$tag")
    }
    t("j3fixtures") {
      orders.filter(col("OKey") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", t0p)
        .option("dataFormat", "parquet").mode("append").save()
      cust3.coalesce(1).write.format("graft-records").option("path", t1p)
        .option("dataFormat", "parquet").mode("append").save()
      nat.coalesce(1).write.format("graft-records").option("path", t2p)
        .option("dataFormat", "parquet").mode("append").save()
      Seq(t0p, t1p, t2p).foreach(graft.operators.LakeSnapshots.commit(spark, _))
    }
    refresh3("boot")
    t("j3append")(orders.filter(col("OKey") % 3 === 2).coalesce(1)
      .write.format("graft-records").option("path", t0p)
      .option("dataFormat", "parquet").mode("append").save())
    t("j3snap")(graft.operators.LakeSnapshots.commit(spark, t0p))
    refresh3("append")
    t("j3del_mid")(graft.operators.DeletionVectors.delete(spark, t1p,
      "CKey:number,NKey:number", col("CKey") % 7 === 0))
    t("j3snap2")(graft.operators.LakeSnapshots.commit(spark, t1p))
    refresh3("mid_del")
    t("j3del_dim")(graft.operators.DeletionVectors.delete(spark, t2p,
      "NKey:number,NName:singleLineText", col("NKey") % 5 === 2))
    t("j3snap3")(graft.operators.LakeSnapshots.commit(spark, t2p))
    refresh3("dim_del")
    refresh3("idle")

    // composed (q309 shape, filters + extrema elided for the cost core)
    val bc = java.nio.file.Files.createTempDirectory("graft_plvc").toString
    val (clt, crt, cv) = (s"$bc/l", s"$bc/r", s"$bc/v")
    def crefresh(tag: String) = {
      t(s"crefresh_$tag")(graft.operators.LakeView.refreshJoinAggregate(
        spark, cv,
        clt, ltypes, Seq("CKey", "OKey", "Price"),
        crt, rtypes, Seq("CKey", "Seg"), Seq("CKey"),
        aggKeys = Seq("Seg"),
        aggSums = Seq("price:CAST(Price AS DECIMAL(18,2))"),
        minMaxCols = sys.env.get("SPARK_GRAFT_PROFILE_MINMAX")
          .map(_ => Seq("Price")).getOrElse(Seq.empty),
        stateBuckets = profBuckets))
      dumpPhases(s"c_$tag")
    }
    t("cfixtures") {
      orders.filter(col("OKey") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", clt)
        .option("dataFormat", "parquet").mode("append").save()
      cust.coalesce(1).write.format("graft-records").option("path", crt)
        .option("dataFormat", "parquet").mode("append").save()
      Seq(clt, crt).foreach(graft.operators.LakeSnapshots.commit(spark, _))
    }
    crefresh("boot")
    t("cappend")(orders.filter(col("OKey") % 3 === 2).coalesce(1)
      .write.format("graft-records").option("path", clt)
      .option("dataFormat", "parquet").mode("append").save())
    t("csnap")(graft.operators.LakeSnapshots.commit(spark, clt))
    crefresh("append")
    t("cdel")(graft.operators.DeletionVectors.delete(spark, crt, rtypes,
      col("CKey") % 5 === 0))
    t("csnap2")(graft.operators.LakeSnapshots.commit(spark, crt))
    crefresh("del")
    crefresh("idle")
    graft.operators.LakeView.phaseSink = null
    spark.stop()
  }
}
