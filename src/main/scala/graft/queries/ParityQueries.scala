package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Checksums, Normalize}
import graft.operators.{Dedup, DedupApprox, Export, Multimodal, Similarity, Strategies, TextAnalysis}
import graft.sources.Sources

import QueryShared._

/** Reference-parity queries: scans, sinks, joins, windows, set ops,
  * aggregates, functions, export round trips, and the DSv2 source/sink
  * gates (SURVEY.md §2 rows S/P/J/A/W/O/E/F). */
private[graft] object ParityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- aggregation (A1/A4) + scan --------------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      val l = rd(s, dir, "lineitem")
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_discount").cast("decimal(18,4)")).cast("double") /
            count(lit(1)).cast("double")).as("avg_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),


    // ----- predicate + projection pushdown (S2/S6/P3) ----------------
    "q02_filter_pushdown" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-07-01").cast("timestamp") &&
          col("l_discount") > lit(0.03))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    }),


    // ----- multi-way join + agg (J1-family physical: broadcast dims) --
    "q03_join_agg" -> ((s, dir) => {
      val n = broadcast(rd(s, dir, "nation"))
      val rg = broadcast(rd(s, dir, "region"))
      rd(s, dir, "orders")
        .join(rd(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(rg, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name", "n_name")
    }),


    // ----- source<->target diff classification (J1/J5) ---------------
    "q04_diff_classify" -> ((s, dir) => {
      val c = cfg(UpdateType.UpsertChecksum, 2L, "c_custkey", "customer")
      Strategies.classify(custSrc(s, dir), custState(s, dir), c).orderBy("c_custkey")
    }),


    // ----- UPSERT_CHECKSUM strategy (J1 + merge) ---------------------
    "q05_upsert" -> ((s, dir) => {
      val c1 = cfg(UpdateType.UpsertChecksum, 1L, "c_custkey", "customer")
      val state = Strategies.fullRefresh(custState(s, dir), s.emptyDataFrame, c1)
      Strategies.upsertChecksum(custSrc(s, dir), state, c1.copy(versionId = 2L))
        .select((custCols.map(col) :+ col("version_id")): _*)
        .orderBy("c_custkey")
    }),


    // ----- UPSERT_CHECKSUM_WITH_DELETE (J1 + J2) ---------------------
    "q06_upsert_delete" -> ((s, dir) => {
      val c1 = cfg(UpdateType.UpsertChecksumWithDelete, 1L, "c_custkey", "customer")
      val state = Strategies.fullRefresh(custState(s, dir), s.emptyDataFrame, c1)
      Strategies.upsertChecksumWithDelete(custSrc(s, dir), state, c1.copy(versionId = 2L))
        .select((custCols.map(col) :+ col("version_id")): _*)
        .orderBy("c_custkey")
    }),


    // ----- SOFT_DELETE strategy --------------------------------------
    "q07_soft_delete" -> ((s, dir) => {
      val c1 = cfg(UpdateType.SoftDelete, 1L, "c_custkey", "customer")
      val state = Strategies.fullRefresh(custState(s, dir), s.emptyDataFrame, c1)
      Strategies.softDelete(custSrc(s, dir), state, c1.copy(versionId = 2L))
        .select(col("c_custkey"), col("c_acctbal"), col("is_deleted"))
        .orderBy("c_custkey")
    }),


    // ----- VERSIONED_CHECKSUM strategy (SCD-2 chains, W1) ------------
    "q08_versioned_checksum" -> ((s, dir) => {
      val c1 = cfg(UpdateType.VersionedChecksum, 1L, "c_custkey", "customer")
      val run1 = Strategies.versionedChecksum(custState(s, dir), s.emptyDataFrame, c1)
      Strategies.versionedChecksum(custSrc(s, dir), run1, c1.copy(versionId = 2L))
        .select(col("c_custkey"), col("version_id"), col("latest"), col("c_acctbal"))
        .orderBy("c_custkey", "version_id")
    }),


    // ----- anti-join (J2/E1) -----------------------------------------
    "q09_anti_join" -> ((s, dir) => {
      rd(s, dir, "customer")
        .join(rd(s, dir, "orders").filter(col("o_totalprice") > 350000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),


    // ----- NULL-safe equality join (<=>) -----------------------------
    "q101_nullsafe_join" -> ((s, dir) => {
      // NULL keys MATCH each other under <=> — the semantics merge/dedup
      // pipelines need when NULL is a real key value (a plain equi-join
      // silently drops those rows). EqualNullSafe is still a hash-join
      // key in Spark: this plans as a broadcast/sort-merge join, never a
      // nested loop.
      val o = rd(s, dir, "orders").select(col("o_orderkey"),
        when(col("o_orderkey") % 97 === 0, lit(null))
          .otherwise(col("o_custkey")).as("k"))
      val c = rd(s, dir, "customer").select(
        when(col("c_custkey") % 89 === 0, lit(null))
          .otherwise(col("c_custkey")).as("ck"),
        col("c_custkey"))
      o.join(c, o("k") <=> c("ck"))
        .groupBy(col("k").isNull.as("null_key"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("c_custkey")).as("n_cust"))
        .orderBy("null_key")
    }),


    // ----- JSON payload extraction (typed props) ---------------------
    "q102_json_extract" -> ((s, dir) => {
      // typed extraction from the record's JSON props column — one
      // codegen'd get_json_object per row, no UDF, aggregated per type
      rd(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),


    // ----- analytic-window breadth: percent_rank/cume_dist/nth_value -
    "q103_rank_extras" -> ((s, dir) => {
      // deterministic rationals over a UNIQUE total order per group:
      // percent_rank = (rank-1)/(n-1), cume_dist = peers/n — exact IEEE
      // divisions, so the frame hash-reproduces anywhere
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      rd(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          nth_value(col("l_quantity"), 2)
            .over(w.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as("second_qty"))
        .orderBy("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    }),


    // ----- CSV export round-trip fidelity ----------------------------
    "q104_csv_roundtrip" -> ((s, dir) => {
      // export -> re-read -> aggregate must equal aggregating the source
      // directly: proves the CSV path's fidelity for strings, doubles
      // (shortest round-trip repr), and timestamps (ISO format) — the
      // oracle never sees the CSV, only the source table
      val src = rd(s, dir, "orders").select("o_orderkey", "o_orderstatus",
        "o_totalprice", "o_orderdate")
      val out = scratchPath(dir, "q104_csv")
      graft.operators.Export.writeCsv(Seq(src), Seq("o_orderkey"), out)
      s.read.option("header", "true")
        .schema("o_orderkey LONG, o_orderdate TIMESTAMP, " +
          "o_orderstatus STRING, o_totalprice DOUBLE")
        .csv(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          max(col("o_orderdate")).as("max_date"))
        .orderBy("o_orderstatus")
    }),


    // ----- sharded JSONL round-trip (training-corpus handoff) --------
    "q105_jsonl_roundtrip" -> ((s, dir) => {
      // the corpus handoff format: sharded JSONL out, schema re-read,
      // aggregate ≡ source aggregate — the oracle never sees the files.
      // Shards are capped small so the round-trip crosses file splits.
      val src = docsBase(s, dir).join(
        rd(s, dir, "documents").select("doc_id", "source", "n_chars"),
        Seq("doc_id"))
      val out = scratchPath(dir, "q105_jsonl")
      graft.operators.Export.writeJsonl(src, Seq("doc_id"), out,
        maxRecordsPerFile = 100)
      s.read.schema("doc_id LONG, n_chars LONG, source STRING, text STRING")
        .json(out)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("source")
    }),


    // ----- ORC round-trip (typed columnar interchange) ---------------
    // ----- storage-layout audit (footer-vs-data reconciliation) ------
    "q201_storage_audit" -> ((s, dir) => {
      // per table, the row total the parquet FOOTERS claim must equal
      // what scanning the data counts — the oracle only ever scans the
      // data, so a truncated write or corrupt footer fails the gate;
      // column counts ride along. Footers are read DISTRIBUTED
      // (ParquetLayout.layout — one task per file batch), the shape a
      // million-file lake audit needs
      val tables = Seq("region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "events", "documents", "embeddings")
      graft.sources.ParquetLayout.layout(s,
          tables.map(t => t -> s"$dir/$t.parquet"))
        .groupBy("tbl")
        .agg(sum(col("n_rows")).as("n_rows"),
          max(col("n_cols")).as("n_cols"))
        .orderBy("tbl")
    }),


    // ----- compaction planner (small-files maintenance) --------------
    "q244_compaction_plan" -> ((s, dir) => {
      // the planning half of lake OPTIMIZE: a per-day ingest inventory
      // (one row per daily partition, deterministic byte estimate) packs
      // into target-size output groups by the running-total rule —
      // ADJACENT days only, so min/max pruning on day keeps working on
      // the compacted files (size-greedy FFD would interleave time
      // ranges). The window runs over the METADATA inventory (30 rows),
      // never the data.
      val inv = rd(s, dir, "events").filter(col("ts").isNotNull)
        .groupBy(floor(col("ts").cast("long") / 86400).cast("long").as("day"))
        .agg(sum(lit(32) + length(col("event_type")) +
          length(coalesce(col("props"), lit("")))).cast("long").as("bytes"))
      graft.operators.Compaction.planSummary(inv, "day", "bytes", 40000L)
        .orderBy("grp")
    }),


    "q129_orc_roundtrip" -> ((s, dir) => {
      // ORC out (capped shards, so the re-read crosses file splits),
      // re-read, aggregate ≡ source aggregate — types survive
      // structurally (timestamps keep precision, doubles are never
      // re-parsed), completing the CSV (q104) / JSONL (q105) export
      // family; the oracle only ever sees the source table
      val src = rd(s, dir, "events")
        .select("event_id", "ts", "event_type", "value")
      val out = scratchPath(dir, "q129_orc")
      graft.operators.Export.writeOrc(src, Seq("event_id"), out,
        maxRecordsPerFile = 2000)
      s.read.orc(out)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,12)")).cast("double")
            .as("sum_value"),
          max(col("ts").cast("long")).as("max_sec"))
        .orderBy("event_type")
    }),


    // ----- Avro container round-trip (ingest-tier format breadth) ----
    "q281_avro_roundtrip" -> ((s, dir) => {
      // Avro OCF out (4 deflate containers, nullable lang as a null
      // union), re-read one task per container, aggregate ≡ source
      // aggregate — the row-major interchange format the CSV/JSONL/ORC
      // family lacked. The writer/reader pair is the upstream Avro Java
      // library already on Spark's classpath; the engine work is the
      // task-parallel plumbing and the Catalyst↔Avro schema mapping.
      // NULL langs round-trip through the union (grouped under the
      // oracle's NULL row), so sparsity survives structurally.
      val out = scratchPath(dir, "q281_avro")
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      val src = rd(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          // the fixture has no null langs — inject some so the union
          // branch is genuinely exercised, not just declared
          when(col("doc_id") % 11 === 0, lit(null))
            .otherwise(col("lang")).as("lang"),
          col("n_chars").cast("long").as("n_chars"),
          (col("doc_id") % 3 === 0).as("flagged"))
      graft.operators.AvroIngest.writeContainers(src.repartition(4), out)
      graft.operators.AvroIngest.readContainers(s, out,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("lang",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("n_chars",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("flagged",
              org.apache.spark.sql.types.BooleanType))))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(when(col("flagged"), col("doc_id")).otherwise(0L))
            .as("flagged_id_sum"))
        .orderBy("lang")
    }),


    // ----- semi-join (E2) --------------------------------------------
    "q10_semi_join" -> ((s, dir) => {
      rd(s, dir, "customer")
        .join(rd(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    }),


    // ----- int8 embedding quantization (4x size cut) ------------------
    // ----- the custom DSv2 source under the oracle gate --------------
    "q110_dsv2_source" -> ((s, dir) => {
      // documents re-shaped to the reference's record wire format by a
      // DISTRIBUTED text write, read back through the graft-records DSv2
      // source with a pushed filter + pruned columns, and aggregated —
      // the oracle only ever sees the original table, so the source's
      // typed parse, pushdown, and null semantics are all on the hook
      val out = scratchPath(dir, "q110_records")
      rd(s, dir, "documents").select(concat(
          lit("{\"id\":\"doc"), col("doc_id"),
          lit("\",\"createdTime\":\"2024-01-01T00:00:00Z\"," +
            "\"fields\":{\"Source\":\""),
          col("source"), lit("\",\"NChars\":"), col("n_chars"),
          lit("}}")).as("value"))
        .write.mode("overwrite").text(out)
      s.read.format("graft-records").option("path", out)
        .option("fieldTypes", "Source:singleLineText,NChars:number")
        .load()
        .filter(col("NChars") > 300) // pushed into the source scan
        .groupBy(col("Source").as("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("NChars").cast("long")).as("sum_chars"))
        .orderBy("source")
    }),


    // ----- DSv2 WRITE path: staged-commit sink round trip ------------
    "q112_dsv2_write" -> ((s, dir) => {
      // documents written through the graft-records DSv2 WRITER (the
      // production sink: two-phase staged commit, truncate-on-overwrite,
      // wire-shape records), then read back through the same source with
      // a pushed filter — the oracle only ever sees the original table,
      // so the writer's serialization AND the reader's parse are both on
      // the hook. mode=overwrite exercises the truncate path, keeping
      // reruns exact.
      val out = scratchPath(dir, "q112_records")
      rd(s, dir, "documents").select(
          concat(lit("doc"), col("doc_id")).as("_record_id"),
          lit("2024-01-01T00:00:00Z").cast("timestamp").as("_created_time"),
          col("source").as("Source"),
          col("n_chars").cast("double").as("NChars"))
        .write.format("graft-records").option("path", out)
        .mode("overwrite").save()
      s.read.format("graft-records").option("path", out)
        .option("fieldTypes", "Source:singleLineText,NChars:number")
        .load()
        .filter(col("NChars") <= 300) // pushed into the source scan
        .groupBy(col("Source").as("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("NChars").cast("long")).as("sum_chars"),
          max(col("_record_id")).as("max_id"))
        .orderBy("source")
    }),


    // ----- DSv2 zone-map file skipping under the oracle --------------
    "q259_zonemap_pruned_scan" -> ((s, dir) => {
      // documents range-partitioned by DocId into 8 record files, so the
      // sink's zone-map sidecars (per-file min/max/null stats written by
      // the SAME commit that lands each file) carry disjoint DocId
      // ranges; the read's range predicate then plans only the 2-3
      // straddling files (ZoneMapSpec asserts the skip count — here the
      // ORACLE is on the hook for pruning's correctness: a zone evaluator
      // that wrongly drops a boundary file loses rows and hash-fails).
      // At 100 TB this is the difference between opening every file of a
      // year's sync log and opening the predicate's range.
      val out = scratchPath(dir, "q259_records")
      rd(s, dir, "documents").select(
          concat(lit("d"), col("doc_id")).as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("lang").as("Lang"),
          col("n_chars").cast("double").as("Chars"))
        .repartitionByRange(8, col("DocId"))
        .write.format("graft-records").option("path", out)
        .mode("overwrite").save()
      s.read.format("graft-records").option("path", out)
        .option("fieldTypes", "DocId:number,Lang:singleLineText,Chars:number")
        .load()
        .filter(col("DocId") >= 100 && col("DocId") < 220 &&
          col("Lang").isNotNull) // both pushed AND zone-evaluated
        .groupBy(col("Lang").as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("Chars").cast("long")).as("sum_chars"),
          min(col("DocId")).cast("long").as("min_id"),
          max(col("DocId")).cast("long").as("max_id"))
        .orderBy("lang")
    }),


    // ----- record-lake compaction: byte merge + sidecar union --------
    "q268_record_compaction" -> ((s, dir) => {
      // documents landed as FIVE small record files (the streaming-sink
      // accumulation shape), compacted through the marker protocol —
      // byte-level JSONL concat, zone sidecars unioned from METADATA —
      // then read back through the source with a pushed range filter
      // (still pruned, post-compaction, by the merged zones). The
      // oracle sees only the original table: content must survive the
      // append/compact/prune chain exactly
      val out = scratchPath(dir, "q268_records")
      val docs = rd(s, dir, "documents").select(
        concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
          .as("_record_id"),
        col("doc_id").cast("double").as("DocId"),
        col("lang").as("Lang"),
        col("n_chars").cast("double").as("Chars"))
      // deterministic rebuild per run: clear, then five slice appends
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      (0 until 5).foreach { b =>
        docs.filter(col("DocId") % 5 === b).coalesce(1)
          .write.format("graft-records").option("path", out)
          .mode("append").save()
      }
      graft.sources.v2.RecordCompaction.compact(s, out, targetBytes = 1L << 30)
      s.read.format("graft-records").option("path", out)
        .option("fieldTypes", "DocId:number,Lang:singleLineText,Chars:number")
        .load()
        .filter(col("DocId") >= 50 && col("DocId") < 300)
        .groupBy(col("Lang").as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("Chars").cast("long")).as("sum_chars"),
          max(col("_record_id")).as("max_id"))
        .orderBy("lang")
    }),


    // ----- storage-partitioned join: zero-exchange DSv2 join ---------
    "q278_storage_partitioned_join" -> ((s, dir) => {
      // two lakes clustered on Lang (the clusterBy WRITE option makes
      // every file key-pure; the clusterBy READ option derives
      // KeyGroupedPartitioning from zone metadata alone) joined on
      // their cluster key: Spark's storage-partitioned join machinery
      // (v2 bucketing) plans the fact-dim join AND the final per-lang
      // aggregate with ZERO shuffle exchanges — the gate REQUIRES the
      // exchange-free plan before returning rows, so a silent fallback
      // to shuffling fails correctness, not just a benchmark. At
      // 100 TB: co-located storage beats reshuffling both sides every
      // query.
      val outL = scratchPath(dir, "q278_docs")
      val outR = scratchPath(dir, "q278_dims")
      val docs = rd(s, dir, "documents")
        .filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("lang").as("Lang"),
          col("n_chars").cast("double").as("Chars"))
      val fs = new org.apache.hadoop.fs.Path(outL)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(outL, outR).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      docs.repartition(4, col("Lang"))
        .write.format("graft-records").option("path", outL)
        .option("clusterBy", "Lang").mode("append").save()
      docs.groupBy("Lang")
        .agg(count(lit(1)).cast("double").as("DimDocs"))
        .select(concat(lit("m"), col("Lang")).as("_record_id"),
          col("Lang"), col("DimDocs"))
        .repartition(4, col("Lang"))
        .write.format("graft-records").option("path", outR)
        .option("clusterBy", "Lang").mode("append").save()
      def rdc(p: String, types: String) =
        s.read.format("graft-records").option("path", p)
          .option("fieldTypes", types).option("clusterBy", "Lang").load()
      val confs = Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        val j = rdc(outL, "Lang:singleLineText,Chars:number")
          .join(rdc(outR, "Lang:singleLineText,DimDocs:number"), "Lang")
          .groupBy(col("Lang").as("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("Chars").cast("long")).as("sum_chars"),
            max(col("DimDocs").cast("long")).as("dim_docs"))
        // plan-gate BEFORE the presentational orderBy (whose range
        // exchange is the output sort, not the join)
        val plan = j.queryExecution.executedPlan.toString
        require(!plan.contains("Exchange"),
          s"storage-partitioned join fell back to shuffling:\n$plan")
        j.orderBy("lang").localCheckpoint()
      } finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),


    // ----- right-to-be-forgotten purge (lake-lifecycle capstone) -----
    "q287_gdpr_purge" -> ((s, dir) => {
      // the GDPR bar is BYTES, not query results: after purging a key
      // set, no surviving data file may contain the ids at all. The
      // chain composes the whole mutation stack — bloom-pruned
      // point DELETE (metadata-only) → snapshot pins EXCLUDE the files
      // from physical erase (materialize skips them: 0 rewrites while
      // pinned) → expire → materialize (rewrites without the rows) →
      // compact — and the gate REQUIRES byte-level absence on the
      // executors before returning the survivor aggregate the oracle
      // recomputes. Merge-on-read alone is NOT a purge (the bytes
      // remain); this is the operator sequence that makes it one.
      val out = scratchPath(dir, "q287_records")
      val cust = rd(s, dir, "customer").select(
        concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
        col("c_mktsegment").as("Segment"),
        col("c_acctbal").cast("double").as("Bal"),
        col("c_custkey").cast("double").as("Key"))
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      (0 until 6).foreach { b =>
        cust.filter(col("Key") % 6 === b).coalesce(1)
          .write.format("graft-records").option("path", out)
          .option("bloomFilterColumns", "_record_id")
          .mode("append").save()
      }
      graft.operators.LakeSnapshots.commit(s, out)
      val purgeIds = rd(s, dir, "customer")
        .filter(col("c_custkey") % 13 === 0)
        .select(concat(lit("c"), col("c_custkey").cast("string")))
        .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
      require(purgeIds.nonEmpty, "purge fixture must be non-empty")
      val types = "Segment:singleLineText,Bal:number,Key:number"
      graft.operators.DeletionVectors.delete(s, out, types,
        col("_record_id").isin(purgeIds: _*)) // bloom-pruned point marks
      // physical erase SKIPS pinned files while a snapshot holds them:
      // zero rewrites, bytes protected until expiry
      require(graft.operators.DeletionVectors.materialize(s, out) == 0,
        "a pinned purge must rewrite nothing until expiry")
      graft.operators.LakeSnapshots.expire(s, out, keepLast = 0)
      require(graft.operators.DeletionVectors.materialize(s, out) > 0,
        "post-expiry materialize must rewrite the marked files")
      graft.sources.v2.RecordCompaction.compact(s, out, 1L << 30)
      // byte-level absence, checked ON THE EXECUTORS over every
      // surviving data file (the ids are JSON-delimited, so the
      // substring probe is exact)
      val confProps = {
        import scala.jdk.CollectionConverters._
        s.sparkContext.hadoopConfiguration
          .iterator().asScala.map(e => e.getKey -> e.getValue).toMap
      }
      val survivors = fs.listStatus(new org.apache.hadoop.fs.Path(out))
        .filter(_.isFile).map(_.getPath)
        .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
        .map(_.toString).toSeq
      // one regex pass per file + set lookups — O(bytes + ids), never
      // O(ids × bytes); the purge list rides a broadcast
      val purgedSet = s.sparkContext.broadcast(purgeIds.toSet)
      val hits = s.sparkContext
        .parallelize(survivors, math.max(1, survivors.length))
        .map { f =>
          val c = new org.apache.hadoop.conf.Configuration(false)
          confProps.foreach { case (k, v) => c.set(k, v) }
          val p = new org.apache.hadoop.fs.Path(f)
          val in = p.getFileSystem(c).open(p)
          val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          val m = java.util.regex.Pattern
            .compile("\"id\":\"([^\"]+)\"").matcher(text)
          var n = 0L
          while (m.find()) if (purgedSet.value.contains(m.group(1))) n += 1
          n
        }.sum()
      require(hits == 0.0, s"purged ids still present in $hits byte spans")
      s.read.format("graft-records").option("path", out)
        .option("fieldTypes", types).load()
        .groupBy(col("Segment").as("segment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("Bal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
        .orderBy("segment")
    }),


    // ----- incremental JOIN maintenance (signed Z-relations) ---------
    "q286_join_ivm" -> ((s, dir) => {
      // a continuously-maintained join view under two delta waves with
      // RETRACTIONS: Δ(L⋈R) = ΔL⋈R + L⋈ΔR + ΔL⋈ΔR with multiplicities
      // multiplying (the DBSP bilinear rule) — inserts and -1 deletes
      // flow through the SAME algebra, no rescan of the joined state.
      // The oracle joins the NET final sides directly; any drift in
      // either delta application flips a count or a decimal sum.
      import graft.operators.IncrementalAgg.{consolidate, joinDelta}
      val orders = rd(s, dir, "orders").select(
        col("o_custkey").cast("long").as("k"),
        col("o_orderkey").cast("long").as("okey"),
        col("o_totalprice").cast("double").as("price"))
      val cust = rd(s, dir, "customer").select(
        col("c_custkey").cast("long").as("k"),
        col("c_mktsegment").as("seg"))
      def m1(df: org.apache.spark.sql.DataFrame) = df.withColumn("m", lit(1L))
      val l0 = m1(orders.filter(col("okey") % 3 === 0))
      val r0 = m1(cust.filter(col("k") % 2 === 0))
      // bootstrap = one delta from the empty state (ΔL⋈ΔR is the join)
      val j0 = joinDelta(l0.limit(0), r0.limit(0), l0, r0, Seq("k"))
      // wave 1: new orders (%3=1) arrive; some seed orders retract
      val dl1 = m1(orders.filter(col("okey") % 3 === 1)).unionByName(
        l0.filter(col("okey") % 7 === 0).withColumn("m", lit(-1L)))
      val dr1 = m1(cust.filter(col("k") % 2 === 1))
      val j1 = consolidate(j0.unionByName(joinDelta(l0, r0, dl1, dr1, Seq("k"))))
      val l1 = consolidate(l0.unionByName(dl1)).localCheckpoint()
      val r1 = consolidate(r0.unionByName(dr1)).localCheckpoint()
      // wave 2: the last order tranche; every fifth customer retracts
      val dl2 = m1(orders.filter(col("okey") % 3 === 2))
      val dr2 = cust.filter(col("k") % 5 === 0).withColumn("m", lit(-1L))
      val j2 = consolidate(j1.unionByName(joinDelta(l1, r1, dl2, dr2, Seq("k"))))
      j2.groupBy(col("seg").as("segment"))
        .agg(sum(col("m")).as("n_rows"),
          sum((col("m") * col("price")).cast("decimal(28,2)"))
            .cast("double").as("sum_price"))
        .orderBy("segment")
    }),


    // ----- schema evolution: ADD COLUMNS over committed data ---------
    "q295_lake_view" -> ((s, dir) => {
      // the continuously-maintained materialized view packaged as one
      // operator: three refreshes each consume ONLY their snapshot
      // window (the persisted watermark proves it: 0→1, 1→2, 2→3), an
      // idle refresh is a no-op, and the final persisted state must
      // equal the oracle's full recompute — wrong deltas, a stale
      // watermark, or a half-flipped pointer all break the totals.
      val out = scratchPath(dir, "q295_records")
      val view = scratchPath(dir, "q295_view")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      fs.delete(new org.apache.hadoop.fs.Path(view), true)
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      def refresh() = graft.operators.LakeView.refreshAggregate(
        s, out, types, view, Seq("Lang"), Seq("Chars", "DocId"))
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      val r1 = refresh()
      require(r1.fromVersion == 0L && r1.toVersion == 1L, r1.toString)
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out)
      val r2 = refresh()
      require(r2.fromVersion == 1L && r2.toVersion == 2L, r2.toString)
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      val r3 = refresh()
      require(r3.fromVersion == 2L && r3.toVersion == 3L, r3.toString)
      require(refresh().groupsChanged == 0L, "idle refresh must no-op")
      graft.operators.LakeView.read(s, view)
        .select(col("Lang").as("lang"), col("n").as("n_docs"),
          col("sum_Chars").cast("long").as("sum_chars"),
          col("sum_DocId").cast("long").as("id_sum"))
        .orderBy("lang")
    }),

    "q296_lake_view_minmax" -> ((s, dir) => {
      // min/max in a maintained view: non-invertible under deletes, so
      // the refresh recomputes ONLY the delta-touched groups from the
      // version-pinned table (a broadcast semi-join prune), while count
      // and sum stay additive. The middle delete REMOVES each touched
      // group's minimum (Chars < 200), so a view that kept old extrema
      // — or rescanned the wrong version — breaks against the oracle's
      // full recompute.
      val out = scratchPath(dir, "q296_records")
      val view = scratchPath(dir, "q296_view")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      fs.delete(new org.apache.hadoop.fs.Path(view), true)
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      def refresh() = graft.operators.LakeView.refreshAggregate(
        s, out, types, view, Seq("Lang"), Seq("Chars"),
        minMaxCols = Seq("Chars"))
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      require(refresh().groupsChanged == 0L, "idle refresh must no-op")
      graft.operators.LakeView.read(s, view)
        .select(col("Lang").as("lang"), col("n").as("n_docs"),
          col("sum_Chars").cast("long").as("sum_chars"),
          col("mn_Chars").cast("long").as("min_chars"),
          col("mx_Chars").cast("long").as("max_chars"))
        .orderBy("lang")
    }),

    "q297_lake_view_join" -> ((s, dir) => {
      // a maintained JOIN view between two lake tables: the persisted
      // Z-relation of orders ⋈ customer advances by the bilinear delta
      // rule (ΔL⋈R + L⋈ΔR + ΔL⋈ΔR) with each side's changes derived
      // from ITS snapshot metadata — a left append then a right DELETE,
      // each folded by one refresh. The right-side delete must retract
      // every joined row of the deleted keys; the oracle recomputes the
      // final join from the predicates alone.
      val lt = scratchPath(dir, "q297_orders")
      val rt = scratchPath(dir, "q297_cust")
      val view = scratchPath(dir, "q297_view")
      val fs = new org.apache.hadoop.fs.Path(lt)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(lt, rt, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val ltypes = "OKey:number,CKey:number,Price:number"
      val rtypes = "CKey:number,Seg:singleLineText"
      val orders = rd(s, dir, "orders").select(
        concat(lit("o"), col("o_orderkey").cast("string")).as("_record_id"),
        col("o_orderkey").cast("double").as("OKey"),
        col("o_custkey").cast("double").as("CKey"),
        col("o_totalprice").cast("double").as("Price"))
      val cust = rd(s, dir, "customer").select(
        concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
        col("c_custkey").cast("double").as("CKey"),
        col("c_mktsegment").as("Seg"))
      def refresh() = graft.operators.LakeView.refreshJoin(s, view,
        lt, ltypes, Seq("CKey", "OKey", "Price"),
        rt, rtypes, Seq("CKey", "Seg"), Seq("CKey"))
      orders.filter(col("OKey") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", lt)
        .option("dataFormat", "parquet").mode("append").save()
      cust.coalesce(1)
        .write.format("graft-records").option("path", rt)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(s, lt)
      graft.operators.LakeSnapshots.commit(s, rt)
      refresh()
      orders.filter(col("OKey") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", lt)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(s, lt)
      refresh()
      graft.operators.DeletionVectors.delete(s, rt, rtypes,
        col("CKey") % 5 === 0)
      graft.operators.LakeSnapshots.commit(s, rt)
      refresh()
      require(refresh().deltaRows == 0L, "idle join refresh must no-op")
      graft.operators.LakeView.read(s, view)
        .groupBy(col("Seg").as("segment"))
        .agg(sum(col("m")).as("n_rows"),
          sum((col("m") * col("Price")).cast("decimal(28,2)"))
            .cast("double").as("sum_price"))
        .orderBy("segment")
    }),

    "q298_cdc_paced_replay" -> ((s, dir) => {
      // CDC micro-batch pacing: a table built by MANY small commits (the
      // shape a snapshotPerEpoch sink produces) is consumed with
      // maxVersionsPerBatch=3 — adjacent version transitions coalesce
      // into one manifest diff per batch (within-window churn nets
      // away), so thousands of tiny commits never force thousands of
      // micro-batches. The run GATES the equivalence internally
      // (coalesced netted feed == per-version netted feed, batch counts
      // 3 vs 8) and the oracle recomputes the final state from the
      // mutation predicates.
      val out = scratchPath(dir, "q298_records")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      (0 until 6).foreach { k => // 6 append commits
        docs.filter(col("DocId") % 6 === k).coalesce(1)
          .write.format("graft-records").option("path", out)
          .mode("append").save()
        graft.operators.LakeSnapshots.commit(s, out)
      }
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out) // v7
      graft.operators.DeletionVectors.delete(s, out, types,
        col("DocId") % 10 === 7)
      graft.operators.LakeSnapshots.commit(s, out) // v8
      def consume(extra: Map[String, String]): (Long, DataFrame) = {
        val ckpt = scratchPath(dir, s"q298_ck_${extra.hashCode}")
        fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
        val n = new java.util.concurrent.atomic.AtomicLong(0L)
        val acc = new java.util.concurrent.atomic.AtomicReference[DataFrame](
          null)
        var r = s.readStream.format("graft-records").option("path", out)
          .option("fieldTypes", types)
          .option("cdc", "true").option("startingVersion", "0")
        extra.foreach { case (k, v) => r = r.option(k, v) }
        val q = r.load()
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (df: DataFrame, _: Long) =>
            val d = df.groupBy("Lang")
              .agg(sum(col("m")).as("dn"),
                sum(col("m") * col("Chars")).as("dsc")).localCheckpoint()
            if (d.limit(1).count() > 0) {
              n.incrementAndGet()
              acc.getAndUpdate(st =>
                if (st == null) d
                else st.unionByName(d).groupBy("Lang")
                  .agg(sum(col("dn")).as("dn"), sum(col("dsc")).as("dsc"))
                  .localCheckpoint())
            }
            ()
          }.start()
        q.processAllAvailable()
        q.stop()
        (n.get(), acc.get().filter(col("dn") > 0))
      }
      val (nCoal, coal) = consume(Map("maxVersionsPerBatch" -> "3"))
      require(nCoal == 3L,
        s"pacing batch count: coalesced $nCoal (want 3)")
      // the per-version replay exists purely as the equivalence GATE
      // (coalesced netted feed == per-version netted feed) — the q306
      // discipline: it runs at the correctness SFs, where the driver's
      // oracle gate executes; the bench SF measures the coalesced
      // consumption production actually pays
      if (isCorrectnessSf(dir)) {
        val (nPer, per) = consume(Map.empty)
        require(nPer == 8L,
          s"pacing batch count: per-version $nPer (want 8)")
        val diff = coal.join(per.withColumnRenamed("dn", "pn")
            .withColumnRenamed("dsc", "psc"), Seq("Lang"), "full")
          .filter(col("dn") =!= col("pn") ||
            col("dsc") =!= col("psc"))
        require(diff.limit(1).isEmpty,
          "coalesced and per-version replay diverged")
      }
      coal.select(col("Lang").as("lang"), col("dn").as("n_docs"),
          col("dsc").cast("long").as("sum_chars"))
        .orderBy("lang")
    }),

    "q299_sql_table_changes" -> ((s, dir) => {
      // the change feed in FROM position: table_changes('cat.ns.t', a, b)
      // resolves the catalog table (path, field types, rename lineage)
      // and returns the signed delta of (a, b] — here the bootstrap
      // window (0 → v1: the insert wave) and the delete window
      // (v1 → v2: −1 retractions from the DV diff), each aggregated in
      // PLAIN SQL. The run gates the TVF against the DataFrame cdc
      // option path; the oracle recomputes both windows from the
      // predicates.
      val wh = scratchPath(dir, "q299_wh")
      val cat = "g299c" + (wh.hashCode.toLong & 0xffffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.RecordCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"DROP TABLE IF EXISTS $cat.ns.docs_t")
      s.sql(s"CREATE TABLE $cat.ns.docs_t " +
        "(DocId DOUBLE, Chars DOUBLE, Lang STRING)")
      val view = s"q299_docs_${wh.hashCode.toLong & 0xffffffffL}"
      rd(s, dir, "documents").createOrReplaceTempView(view)
      s.sql(
        s"""INSERT INTO $cat.ns.docs_t
           |SELECT concat('d', CAST(doc_id AS STRING)),
           |  CAST(NULL AS TIMESTAMP),
           |  CAST(doc_id AS DOUBLE), CAST(n_chars AS DOUBLE), lang
           |FROM $view WHERE lang IS NOT NULL""".stripMargin)
      val path = s"$wh/ns/docs_t"
      val v1 = graft.operators.LakeSnapshots.commit(s, path)
      s.sql(s"DELETE FROM $cat.ns.docs_t WHERE Chars < 200.0")
      val v2 = graft.operators.LakeSnapshots.commit(s, path)
      val out = s.sql(
        s"""SELECT 'boot' AS phase, Lang AS lang, sum(m) AS net_rows,
           |  CAST(sum(m * Chars) AS BIGINT) AS net_chars
           |FROM table_changes('$cat.ns.docs_t', 0, $v1) GROUP BY 2
           |UNION ALL
           |SELECT 'delta', Lang, sum(m),
           |  CAST(sum(m * Chars) AS BIGINT)
           |FROM table_changes('$cat.ns.docs_t', $v1, $v2) GROUP BY 2
           |ORDER BY 1, 2""".stripMargin).localCheckpoint()
      // gate: the TVF result equals the DataFrame cdc-option path
      val dfPath = s.read.format("graft-records").option("path", path)
        .option("fieldTypes", "DocId:number,Chars:number,Lang:singleLineText")
        .option("cdc", "true").option("startingVersion", v1.toString)
        .option("endingVersion", v2.toString).load()
        .groupBy("Lang").agg(sum(col("m")).as("net_rows"),
          sum(col("m") * col("Chars")).cast("long").as("net_chars"))
      val sqlDelta = out.filter(col("phase") === "delta")
        .select("lang", "net_rows", "net_chars")
      val mism = sqlDelta.join(
          dfPath.select(col("Lang").as("lang"),
            col("net_rows").as("r2"), col("net_chars").as("c2")),
          Seq("lang"), "full")
        .filter(col("net_rows") =!= col("r2") ||
          col("net_chars") =!= col("c2"))
      require(mism.limit(1).isEmpty,
        "table_changes TVF diverged from the DataFrame cdc path")
      s.catalog.dropTempView(view)
      out
    }),

    "q300_parquet_agg_stats" -> ((s, dir) => {
      // aggregate pushdown over the parquet tier: the PRE phase (no
      // filters, no deletion vectors) answers count(*), count(col), and
      // numeric min/max entirely from FOOTER STATISTICS — zero pages
      // decoded (ParquetRecordsSpec pins the metric); the POST phase
      // runs after a DV delete, which REJECTS the pushdown at planning
      // (stats can't see deleted rows), so the vectorized columnar scan
      // + Spark's aggregate answer it. Both phases must match the
      // oracle's recompute: a stats path that miscounts nulls, trusts a
      // stale extremum, or ignores the DV breaks a row.
      val out = scratchPath(dir, "q300_records")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      val docs = rd(s, dir, "documents").select(
        concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
          .as("_record_id"),
        col("doc_id").cast("double").as("DocId"),
        col("n_chars").cast("double").as("Chars"),
        col("lang").as("Lang")) // Lang NULLs survive into the lake
      Seq(0, 1, 2).foreach { k =>
        docs.filter(col("DocId") % 3 === k).coalesce(1)
          .write.format("graft-records").option("path", out)
          .option("dataFormat", "parquet").mode("append").save()
      }
      def rdOut = s.read.format("graft-records").option("path", out)
        .option("fieldTypes", types).option("dataFormat", "parquet").load()
      def aggOf(df: org.apache.spark.sql.DataFrame, phase: String) =
        df.agg(count(lit(1)).as("n_docs"),
            count(col("Lang")).as("n_lang"),
            min(col("Chars")).cast("long").as("min_chars"),
            max(col("Chars")).cast("long").as("max_chars"),
            max(col("DocId")).cast("long").as("max_id"))
          .select(lit(phase).as("phase"), col("n_docs"), col("n_lang"),
            col("min_chars"), col("max_chars"), col("max_id"))
      val pre = aggOf(rdOut, "pre").localCheckpoint()
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      val post = aggOf(rdOut, "zpost").localCheckpoint()
      pre.unionByName(post).orderBy("phase")
    }),

    "q301_lake_embedding_vectors" -> ((s, dir) => {
      // embeddings as a FIRST-CLASS record-lake column: numberArray
      // (array<double>) rides the parquet wire as a 3-level list and
      // decodes through the VECTORIZED array path (ParquetColumnar) —
      // the fixture's float vectors cast to double (exact), land in a
      // parquet record table, lose every 7th label to a deletion
      // vector, and fold back per label bucket. The per-element fold
      // stays in the integer domain (floor(x*100 + 0.5)) so the
      // oracle's recompute from the source parquet is IEEE-exact
      // across engines; a decode that shifts one array boundary, drops
      // a null element, or misaligns the DV ordinals moves a bucket
      // sum.
      val out = scratchPath(dir, "q301_records")
      val types = "Vec:numberArray,Label:number"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      val vecs = rd(s, dir, "embeddings")
      Seq(0, 1).foreach { k =>
        vecs.filter(col("vec_id") % 2 === k)
          .select(
            concat(lit("v"), lpad(col("vec_id").cast("string"), 7, "0"))
              .as("_record_id"),
            col("embedding").cast("array<double>").as("Vec"),
            col("label").cast("double").as("Label"))
          .coalesce(1)
          .write.format("graft-records").option("path", out)
          .option("dataFormat", "parquet").mode("append").save()
      }
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Label") % 7 === 0)
      s.read.format("graft-records").option("path", out)
        .option("fieldTypes", types).option("dataFormat", "parquet").load()
        .groupBy((col("Label") % 4).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(size(col("Vec")).cast("long")).as("dims"),
          sum(aggregate(col("Vec"), lit(0L),
            (acc, x) => acc + floor(x * 100 + lit(0.5)))).as("qsum"))
        .orderBy("bucket")
    }),

    "q302_sql_lake_view_agg" -> ((s, dir) => {
      // the maintained-view surface in PURE SQL: create_lake_view
      // persists the fold rules (_view.json), refresh_lake_view
      // advances to the table head consuming only the snapshot delta,
      // lake_view reads the state — same machinery as q296 but the
      // Scala API never appears on the view path. The run gates the
      // SQL-maintained state against a TWIN view advanced through the
      // Scala API over the identical commit sequence (byte-equal
      // rows), plus the create-idempotence and idle-no-op contracts;
      // the oracle recomputes the final aggregates from the
      // predicates.
      val out = scratchPath(dir, "q302_records")
      val view = scratchPath(dir, "q302_view")
      val twin = scratchPath(dir, "q302_twin")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, view, twin).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      val created = s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'aggregate',
           |  '$out', '$types', 'Lang', 'Chars', 'Chars')""".stripMargin)
        .collect()(0)
      require(created.getBoolean(1), "first create must write the definition")
      val re = s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'aggregate',
           |  '$out', '$types', 'Lang', 'Chars', 'Chars')""".stripMargin)
        .collect()(0)
      require(!re.getBoolean(1), "identical re-create must be a no-op")
      def refresh(): org.apache.spark.sql.Row =
        s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
      def twinRefresh() = graft.operators.LakeView.refreshAggregate(
        s, out, types, twin, Seq("Lang"), Seq("Chars"),
        minMaxCols = Seq("Chars"))
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh(); twinRefresh()
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out)
      refresh(); twinRefresh()
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      val r3 = refresh(); twinRefresh()
      require(r3.getLong(5) > 0L, "third refresh must fold a delta")
      require(refresh().getLong(5) == 0L, "idle SQL refresh must no-op")
      val sqlState = s.sql(s"SELECT * FROM lake_view('$view')")
      val mism = sqlState.join(
          graft.operators.LakeView.read(s, twin)
            .select(col("Lang"), col("n").as("tn"),
              col("sum_Chars").as("ts"), col("mn_Chars").as("tmn"),
              col("mx_Chars").as("tmx")),
          Seq("Lang"), "full")
        .filter(!(col("n") <=> col("tn")) ||
          !(col("sum_Chars") <=> col("ts")) ||
          !(col("mn_Chars") <=> col("tmn")) ||
          !(col("mx_Chars") <=> col("tmx")))
      require(mism.limit(1).isEmpty,
        "SQL-maintained view diverged from the Scala-API twin")
      def shape(df: org.apache.spark.sql.DataFrame, phase: String) =
        df.select(lit(phase).as("phase"), col("Lang").as("lang"),
          col("n").as("n_docs"),
          col("sum_Chars").cast("long").as("sum_chars"),
          col("mn_Chars").cast("long").as("min_chars"),
          col("mx_Chars").cast("long").as("max_chars"))
      // view-level TIME TRAVEL under the oracle: generation 2 (the
      // state after the delete refresh, retained as the previous
      // generation) reads back alongside the live state — both phases
      // recomputed by the oracle from the predicates alone
      val prev = shape(s.sql(s"SELECT * FROM lake_view('$view', 2)"), "v2")
      shape(sqlState, "zlive").unionByName(prev)
        .orderBy("phase", "lang")
    }),

    "q303_sql_lake_view_join" -> ((s, dir) => {
      // the maintained JOIN view COMPOSED with its rollup through the
      // SQL surface: kind 'join_aggregate' chains a per-segment
      // aggregate fold off the join view's OWN signed delta, persisted
      // under one definition — so the READOUT reads the maintained
      // per-segment state (∝ |segments|) instead of aggregating the
      // whole Z-relation per query (∝ |join rows| — the cost that
      // dominated this query's decade probe). Same three-refresh
      // commit sequence as q297 (left append, right delete-with-
      // retraction), defined/advanced/read entirely in SQL; the
      // consumed snapshot windows stay gated; the price sum folds in
      // DECIMAL via a SumSpec expression (exact and fold-order-
      // independent, so three incremental folds reproduce the oracle's
      // one-shot decimal sum bit-for-bit); the oracle recomputes the
      // join from the predicates.
      val lt = scratchPath(dir, "q303_orders")
      val rt = scratchPath(dir, "q303_cust")
      val view = scratchPath(dir, "q303_view")
      val fs = new org.apache.hadoop.fs.Path(lt)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(lt, rt, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val ltypes = "OKey:number,CKey:number,Price:number"
      val rtypes = "CKey:number,Seg:singleLineText"
      val orders = rd(s, dir, "orders").select(
        concat(lit("o"), col("o_orderkey").cast("string")).as("_record_id"),
        col("o_orderkey").cast("double").as("OKey"),
        col("o_custkey").cast("double").as("CKey"),
        col("o_totalprice").cast("double").as("Price"))
      val cust = rd(s, dir, "customer").select(
        concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
        col("c_custkey").cast("double").as("CKey"),
        col("c_mktsegment").as("Seg"))
      s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'join_aggregate',
           |  '$lt', '$ltypes', 'CKey,OKey,Price',
           |  '$rt', '$rtypes', 'CKey,Seg', 'CKey',
           |  'Seg', 'price:CAST(Price AS DECIMAL(18,2))')""".stripMargin)
        .collect()
      def refresh(): org.apache.spark.sql.Row =
        s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
      orders.filter(col("OKey") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", lt)
        .option("dataFormat", "parquet").mode("append").save()
      cust.coalesce(1)
        .write.format("graft-records").option("path", rt)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(s, lt)
      graft.operators.LakeSnapshots.commit(s, rt)
      val r1 = refresh()
      require(r1.getString(0) == "join_aggregate" && r1.getLong(5) > 0L,
        "bootstrap refresh must fold the initial join")
      orders.filter(col("OKey") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", lt)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(s, lt)
      val r2 = refresh()
      require(r2.getLong(1) == 1L && r2.getLong(2) == 2L &&
        r2.getLong(4) == 1L,
        s"second refresh must consume the left (1,2] window: $r2")
      graft.operators.DeletionVectors.delete(s, rt, rtypes,
        col("CKey") % 5 === 0)
      graft.operators.LakeSnapshots.commit(s, rt)
      refresh()
      require(refresh().getLong(5) == 0L, "idle SQL join refresh must no-op")
      // the readout IS the maintained per-segment state — no Z-relation
      // scan (the inner Z-relation stays readable at <view>/inner)
      s.sql(
        s"""SELECT Seg AS segment, CAST(n AS BIGINT) AS n_rows,
           |  CAST(sum_price AS DOUBLE) AS sum_price
           |FROM lake_view('$view') ORDER BY 1""".stripMargin)
    }),

    "q304_sum_pushdown" -> ((s, dir) => {
      // grouped SUM/AVG aggregate pushdown on the JSONL record tier:
      // sum partials fold in-reader (one double slot per group buffer)
      // and AVG rides Spark's sum/count decomposition — the run GATES
      // that the plan actually pushed (PushedAggregation naming the
      // sums), and integer-valued doubles keep the partial-merge
      // IEEE-exact against the oracle's recompute. The parquet tier
      // deliberately refuses this shape (codegen agg over the
      // vectorized scan beats a row-materializing fold), so the gate
      // also pins the JSONL tier as the decode path that carries it.
      val out = scratchPath(dir, "q304_records")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
        .coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      val q = s.read.format("graft-records").option("path", out)
        .option("fieldTypes", types).load()
        .groupBy("Lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("Chars")).cast("long").as("sum_chars"),
          avg(col("Chars")).as("avg_chars"),
          sum(col("DocId")).cast("long").as("id_sum"))
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains("PushedAggregation=[groupBy=Lang") &&
        plan.contains("sum(Chars)") && plan.contains("count(Chars)"),
        s"sum/avg pushdown missing from the plan:\n$plan")
      q.select(col("Lang").as("lang"), col("n_docs"), col("sum_chars"),
          col("avg_chars"), col("id_sum"))
        .orderBy("lang")
    }),

    "q305_sql_lake_maintenance" -> ((s, dir) => {
      // the lake's MAINTENANCE plane in pure SQL: a 6-small-file table
      // takes a DV delete, then materialize_lake_dvs rewrites the
      // vectored files (DV sidecars gone), optimize_lake compacts the
      // debris to ONE file, snapshots straddle a second delete and
      // expire_lake_snapshots retires the older manifest, and
      // vacuum_lake confirms a debris-free table — every effect gated
      // in-run (file counts, sidecar absence, surviving versions) and
      // the final state ≡ the oracle's recompute from the two delete
      // predicates. Maintenance must never change WHAT the table says,
      // only how it's laid out.
      val out = scratchPath(dir, "q305_records")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      (0 until 6).foreach { k =>
        docs.filter(col("DocId") % 6 === k).coalesce(1)
          .write.format("graft-records").option("path", out)
          .mode("append").save()
      }
      def dataFiles(): Int = fs.listStatus(p).count(st =>
        st.isFile && st.getPath.getName.endsWith(".jsonl"))
      require(dataFiles() == 6, s"expected 6 small files, got ${dataFiles()}")
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      val mat = s.sql(s"SELECT * FROM materialize_lake_dvs('$out')")
        .collect()(0)
      require(mat.getInt(0) > 0, "materialize must rewrite vectored files")
      val dvDir = new org.apache.hadoop.fs.Path(p,
        graft.sources.v2.DeletionVector.Dir)
      require(!fs.exists(dvDir) || fs.listStatus(dvDir).forall(!_.isFile),
        "DV sidecars must be gone after materialization")
      val opt = s.sql(s"SELECT * FROM optimize_lake('$out')").collect()(0)
      require(opt.getInt(0) == 1 && dataFiles() == 1,
        s"compaction must leave ONE file (wrote ${opt.getInt(0)}, " +
          s"have ${dataFiles()})")
      val v1 = graft.operators.LakeSnapshots.commit(s, out)
      graft.operators.DeletionVectors.delete(s, out, types,
        col("DocId") % 10 === 7)
      val v2 = graft.operators.LakeSnapshots.commit(s, out)
      val exp = s.sql(s"SELECT * FROM expire_lake_snapshots('$out', 1)")
        .collect()(0)
      require(exp.getInt(0) == 1 &&
        graft.operators.LakeSnapshots.versions(s, out) == Seq(v2),
        s"expire must retire exactly v$v1 and keep v$v2")
      val vac = s.sql(s"SELECT * FROM vacuum_lake('$out')").collect()(0)
      require(vac.getInt(1) == 0, "a healthy table has no staging debris")
      s.read.format("graft-records").option("path", out)
        .option("fieldTypes", types).load()
        .groupBy(col("Lang").as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("Chars")).cast("long").as("sum_chars"),
          sum(col("DocId")).cast("long").as("id_sum"))
        .orderBy("lang")
    }),

    "q307_lake_view_filtered" -> ((s, dir) => {
      // a FILTERED maintained view (WHERE in the fold rules): the view
      // is `... FROM t WHERE Chars >= 300 GROUP BY Lang`, maintained by
      // filtering the SIGNED delta row-wise — aggregation is linear, so
      // the filtered fold is exactly the filtered table. The middle
      // delete removes ONLY filtered-out rows (Chars < 200): the
      // refresh must fold ZERO groups (gated) while still advancing the
      // watermark; the last delete removes in-filter maxima
      // (Chars >= 800), driving the extrema recompute THROUGH the
      // filter — a rescan that forgot it would resurrect sub-300 rows
      // into mn_Chars. Defined/advanced/read in pure SQL; the oracle
      // recomputes from the predicates.
      val out = scratchPath(dir, "q307_records")
      val view = scratchPath(dir, "q307_view")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'aggregate',
           |  '$out', '$types', 'Lang', 'Chars', 'Chars',
           |  'Chars >= 300.0')""".stripMargin).collect()
      def refresh(): org.apache.spark.sql.Row =
        s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
      docs.coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      require(refresh().getLong(5) > 0L, "bootstrap must fold groups")
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out)
      val r2 = refresh()
      require(r2.getLong(5) == 0L && r2.getLong(2) == 2L,
        s"deleting only filtered-out rows must fold zero groups while " +
          s"advancing the watermark: $r2")
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") >= 800)
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      s.sql(
        s"""SELECT Lang AS lang, CAST(n AS BIGINT) AS n_docs,
           |  CAST(sum_Chars AS BIGINT) AS sum_chars,
           |  CAST(mn_Chars AS BIGINT) AS min_chars,
           |  CAST(mx_Chars AS BIGINT) AS max_chars
           |FROM lake_view('$view') ORDER BY lang""".stripMargin)
    }),

    "q308_lake_view_join_filtered" -> ((s, dir) => {
      // a FILTERED join view: the persisted Z-relation of
      // `orders ⋈ customer WHERE Price >= 10000 AND Seg <> 'BUILDING'`
      // — the bilinear rule is linear in each side, so each side's OLD
      // scan and DELTA filter row-wise and the fold equals the filtered
      // join. The middle delete removes ONLY left rows the filter
      // excludes (Price < 10000): that refresh must fold ZERO delta
      // rows (gated) while advancing the left watermark; the last
      // delete retracts in-filter right keys through the join. Defined,
      // advanced, and read in pure SQL; the oracle recomputes the
      // filtered join from the predicates.
      val lt = scratchPath(dir, "q308_orders")
      val rt = scratchPath(dir, "q308_cust")
      val view = scratchPath(dir, "q308_view")
      val fs = new org.apache.hadoop.fs.Path(lt)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(lt, rt, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val ltypes = "OKey:number,CKey:number,Price:number"
      val rtypes = "CKey:number,Seg:singleLineText"
      rd(s, dir, "orders").select(
          concat(lit("o"), col("o_orderkey").cast("string")).as("_record_id"),
          col("o_orderkey").cast("double").as("OKey"),
          col("o_custkey").cast("double").as("CKey"),
          col("o_totalprice").cast("double").as("Price"))
        .coalesce(2)
        .write.format("graft-records").option("path", lt)
        .option("dataFormat", "parquet").mode("append").save()
      rd(s, dir, "customer").select(
          concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
          col("c_custkey").cast("double").as("CKey"),
          col("c_mktsegment").as("Seg"))
        .coalesce(1)
        .write.format("graft-records").option("path", rt)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(s, lt)
      graft.operators.LakeSnapshots.commit(s, rt)
      s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'join',
           |  '$lt', '$ltypes', 'CKey,OKey,Price',
           |  '$rt', '$rtypes', 'CKey,Seg', 'CKey', 0,
           |  'Price >= 10000.0', 'Seg <> \\'BUILDING\\'')""".stripMargin)
        .collect()
      def refresh(): org.apache.spark.sql.Row =
        s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
      require(refresh().getLong(5) > 0L, "bootstrap must fold the join")
      // delete ONLY left rows the view's filter excludes: zero fold
      graft.operators.DeletionVectors.delete(s, lt, ltypes,
        col("Price") < 10000)
      graft.operators.LakeSnapshots.commit(s, lt)
      val r2 = refresh()
      require(r2.getLong(5) == 0L && r2.getLong(2) == 2L,
        s"excluded-row churn must fold zero delta rows: $r2")
      graft.operators.DeletionVectors.delete(s, rt, rtypes,
        col("CKey") % 5 === 0)
      graft.operators.LakeSnapshots.commit(s, rt)
      require(refresh().getLong(5) > 0L, "in-filter retraction must fold")
      s.sql(
        s"""SELECT Seg AS segment, CAST(sum(m) AS BIGINT) AS n_rows,
           |  CAST(sum(CAST(m * Price AS DECIMAL(28,2))) AS DOUBLE)
           |    AS sum_price
           |FROM lake_view('$view')
           |GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    "q309_lake_view_composed" -> ((s, dir) => {
      // the COMPOSED maintained view at full strength: per-side WHERE
      // filters, a derived-column DECIMAL sum (SumSpec expression), and
      // extrema — `SELECT Seg, count, sum(price), sum(2*price),
      // min/max(Price) FROM orders ⋈ customer WHERE Price >= 10000 AND
      // Seg <> 'BUILDING' GROUP BY Seg`, maintained through three
      // refresh cycles by chaining the aggregate fold off the join
      // view's signed delta. Gated in-run: excluded-row churn folds
      // ZERO delta rows while advancing the watermark; after every
      // fold the maintained aggregate must equal a recompute over the
      // inner Z-relation (fold ≡ recompute, the q303 discipline); the
      // oracle recomputes everything from the predicates.
      val lt = scratchPath(dir, "q309_orders")
      val rt = scratchPath(dir, "q309_cust")
      val view = scratchPath(dir, "q309_view")
      val fs = new org.apache.hadoop.fs.Path(lt)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(lt, rt, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val ltypes = "OKey:number,CKey:number,Price:number"
      val rtypes = "CKey:number,Seg:singleLineText"
      val orders = rd(s, dir, "orders").select(
        concat(lit("o"), col("o_orderkey").cast("string")).as("_record_id"),
        col("o_orderkey").cast("double").as("OKey"),
        col("o_custkey").cast("double").as("CKey"),
        col("o_totalprice").cast("double").as("Price"))
      orders.filter(col("OKey") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", lt)
        .option("dataFormat", "parquet").mode("append").save()
      rd(s, dir, "customer").select(
          concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
          col("c_custkey").cast("double").as("CKey"),
          col("c_mktsegment").as("Seg"))
        .coalesce(1)
        .write.format("graft-records").option("path", rt)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(s, lt)
      graft.operators.LakeSnapshots.commit(s, rt)
      s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'join_aggregate',
           |  '$lt', '$ltypes', 'CKey,OKey,Price',
           |  '$rt', '$rtypes', 'CKey,Seg', 'CKey',
           |  'Seg', 'price:CAST(Price AS DECIMAL(18,2)),
           |         dbl:CAST(Price * 2 AS DECIMAL(19,2))',
           |  'Price', 0,
           |  'Price >= 10000.0', 'Seg <> \\'BUILDING\\'')""".stripMargin)
        .collect()
      def refresh(): org.apache.spark.sql.Row =
        s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
      // the recompute-equality gates run at the correctness SFs (the
      // driver's oracle gate executes there) — the q306 discipline:
      // production pays only the folds, so the bench SF measures those
      val gateSf = isCorrectnessSf(dir)
      def gateFoldEqualsRecompute(): Unit = if (gateSf) {
        // the maintained aggregate ≡ a recompute over the inner
        // Z-relation (both read maintained state; nothing rescans the
        // base tables)
        val inner = graft.operators.LakeView.read(s, s"$view/inner")
        val re = inner.filter(col("m") > 0).groupBy("Seg")
          .agg(sum(col("m")).as("rn"),
            sum(col("m") * expr("CAST(Price AS DECIMAL(18,2))")).as("rp"),
            sum(col("m") * expr("CAST(Price * 2 AS DECIMAL(19,2))")).as("rd"),
            min(col("Price")).as("rmn"), max(col("Price")).as("rmx"))
        val st = graft.operators.LakeView.read(s, view)
        val mism = st.join(re, Seq("Seg"), "full")
          .filter(!(col("n") <=> col("rn")) ||
            !(col("sum_price") <=> col("rp").cast("decimal(38,2)")) ||
            !(col("sum_dbl") <=> col("rd").cast("decimal(38,2)")) ||
            !(col("mn_Price") <=> col("rmn")) ||
            !(col("mx_Price") <=> col("rmx")))
        require(mism.limit(1).isEmpty,
          "composed fold diverged from a recompute over the inner state")
      }
      require(refresh().getLong(5) > 0L, "bootstrap must fold the join")
      gateFoldEqualsRecompute()
      // cycle 2: the remaining left third appends THROUGH the filter
      orders.filter(col("OKey") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", lt)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(s, lt)
      require(refresh().getLong(5) > 0L, "in-filter append must fold")
      gateFoldEqualsRecompute()
      // excluded-row churn: deleting only sub-filter left rows must
      // fold ZERO delta rows while the watermark still advances
      graft.operators.DeletionVectors.delete(s, lt, ltypes,
        col("Price") < 10000)
      graft.operators.LakeSnapshots.commit(s, lt)
      val r3 = refresh()
      require(r3.getLong(5) == 0L && r3.getLong(2) == 3L,
        s"excluded-row churn must fold zero delta rows: $r3")
      // cycle 3: in-filter right retraction through the join AND the
      // aggregate (extrema recompute from the inner state)
      graft.operators.DeletionVectors.delete(s, rt, rtypes,
        col("CKey") % 5 === 0)
      graft.operators.LakeSnapshots.commit(s, rt)
      require(refresh().getLong(5) > 0L, "in-filter retraction must fold")
      gateFoldEqualsRecompute()
      require(refresh().getLong(5) == 0L, "idle refresh must no-op")
      s.sql(
        s"""SELECT Seg AS segment, CAST(n AS BIGINT) AS n_rows,
           |  CAST(sum_price AS DOUBLE) AS sum_price,
           |  CAST(sum_dbl AS DOUBLE) AS sum_dbl,
           |  mn_Price AS min_price, mx_Price AS max_price
           |FROM lake_view('$view') ORDER BY 1""".stripMargin)
    }),

    "q313_lake_view_over_view" -> ((s, dir) => {
      // VIEW OVER VIEW — the general composition primitive: a
      // maintained per-document rollup (view A) is itself the SOURCE
      // of a maintained per-language rollup (view B). B consumes A's
      // GENERATION FEED (LakeChangelog.viewChanges — generation
      // pointers diffed exactly like snapshot manifests) the same way
      // A consumes the table's snapshot feed, so composition is the
      // same fold at every level and costs ∝ touched state, never a
      // rescan. Three mutation cycles flow table -> A -> B with
      // B ≡ recompute-from-A gated each cycle at the correctness SFs;
      // the oracle recomputes the two-level rollup from the predicates.
      val out = scratchPath(dir, "q313_records")
      val va = scratchPath(dir, "q313_va")
      val vb = scratchPath(dir, "q313_vb")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, va, vb).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      s.sql(
        s"""SELECT * FROM create_lake_view('$va', 'aggregate',
           |  '$out', '$types', 'Lang,DocId', 'Chars')""".stripMargin)
        .collect()
      s.sql(
        s"""SELECT * FROM create_lake_view('$vb', 'aggregate_over_view',
           |  '$va', 'Lang', 'docs:n,chars:sum_Chars')""".stripMargin)
        .collect()
      def refresh(): Long = {
        s.sql(s"SELECT * FROM refresh_lake_view('$va')").collect()
        s.sql(s"SELECT * FROM refresh_lake_view('$vb')").collect()(0)
          .getLong(5)
      }
      val gateSf = isCorrectnessSf(dir)
      def gate(): Unit = if (gateSf) {
        val got = graft.operators.LakeView.read(s, vb)
          .select(col("Lang"), col("n"), col("sum_docs"), col("sum_chars"))
        val want = graft.operators.LakeView.read(s, va)
          .groupBy("Lang").agg(count(lit(1)).as("wn"),
            sum(col("n")).as("wdocs"), sum(col("sum_Chars")).as("wchars"))
        val mism = got.join(want, Seq("Lang"), "full")
          .filter(!(col("n") <=> col("wn")) ||
            !(col("sum_docs") <=> col("wdocs")) ||
            !(col("sum_chars") <=> col("wchars")))
        require(mism.limit(1).isEmpty,
          "view-over-view fold diverged from the recompute over its source")
      }
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      require(refresh() > 0L, "bootstrap must fold groups through B")
      gate()
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out)
      require(refresh() > 0L, "the delete wave must flow table -> A -> B")
      gate()
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      gate()
      require(refresh() == 0L, "idle refresh must no-op through the chain")
      s.sql(
        s"""SELECT Lang AS lang, CAST(n AS BIGINT) AS n_docs,
           |  CAST(sum_chars AS BIGINT) AS sum_chars
           |FROM lake_view('$vb') ORDER BY lang""".stripMargin)
    }),

    "q314_lake_view_join_of_views" -> ((s, dir) => {
      // a JOIN OF TWO MAINTAINED VIEWS: the per-customer order rollup
      // (view L, decimal SumSpec) joined to a per-customer dimension
      // view (view R) under the bilinear rule, each side's delta being
      // its GENERATION FEED and each side's old state its watermarked
      // generation (view-level time travel). Cycle 2 moves only the
      // fact table — the right feed is idle and its watermark must not
      // move; cycle 3 retracts customers through the join. J ≡
      // recompute(L ⋈ R) gates each cycle at the correctness SFs.
      val to = scratchPath(dir, "q314_orders")
      val tc = scratchPath(dir, "q314_cust")
      val vl = scratchPath(dir, "q314_vl")
      val vr = scratchPath(dir, "q314_vr")
      val vj = scratchPath(dir, "q314_vj")
      val fs = new org.apache.hadoop.fs.Path(to)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(to, tc, vl, vr, vj).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val typesO = "OKey:number,CKey:number,Price:number"
      val typesC = "CKey:number,Seg:singleLineText"
      val orders = rd(s, dir, "orders").select(
        concat(lit("o"), col("o_orderkey").cast("string")).as("_record_id"),
        col("o_orderkey").cast("double").as("OKey"),
        col("o_custkey").cast("double").as("CKey"),
        col("o_totalprice").cast("double").as("Price"))
      rd(s, dir, "customer").select(
          concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
          col("c_custkey").cast("double").as("CKey"),
          col("c_mktsegment").as("Seg"))
        .coalesce(1)
        .write.format("graft-records").option("path", tc)
        .option("dataFormat", "parquet").mode("append").save()
      orders.filter(col("OKey") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", to)
        .option("dataFormat", "parquet").mode("append").save()
      Seq(to, tc).foreach(p => graft.operators.LakeSnapshots.commit(s, p))
      def refreshSources(): Unit = {
        graft.operators.LakeView.refreshAggregate(s, to, typesO, vl,
          Seq("CKey"), Seq("price:CAST(Price AS DECIMAL(18,2))"))
        graft.operators.LakeView.refreshAggregate(s, tc, typesC, vr,
          Seq("CKey", "Seg"), Seq.empty)
        ()
      }
      def refreshJ() = graft.operators.LakeView.refreshJoinOfViews(s, vj,
        vl, Seq("CKey", "n", "sum_price"),
        vr, Seq("CKey", "Seg"), Seq("CKey"))
      val gateSf = isCorrectnessSf(dir)
      def gate(): Unit = if (gateSf) {
        val l = graft.operators.LakeView.read(s, vl)
          .select(col("CKey"), col("n"), col("sum_price"))
        val r = graft.operators.LakeView.read(s, vr)
          .select(col("CKey"), col("Seg"))
        val want = l.join(r, Seq("CKey")).withColumn("wm", lit(1L))
        val got = graft.operators.LakeView.read(s, vj)
        val mism = got.join(want, Seq("CKey"), "full")
          .filter(!(col("m") <=> col("wm")) ||
            !(got("n") <=> want("n")) ||
            !(got("sum_price") <=> want("sum_price")) ||
            !(got("Seg") <=> want("Seg")))
        require(mism.limit(1).isEmpty,
          "join-of-views state diverged from the recomputed join of " +
            "the current source states")
      }
      refreshSources()
      require(refreshJ().deltaRows > 0L, "bootstrap must fold the join")
      gate()
      // cycle 2: only the fact table moves — the right generation feed
      // is idle, and the join's right watermark must stand still
      orders.filter(col("OKey") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", to)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(s, to)
      refreshSources()
      val r2 = refreshJ()
      require(r2.deltaRows > 0L && r2.fromRight == r2.toRight,
        s"a one-side window must not advance the idle side: $r2")
      gate()
      // cycle 3: customer retraction flows dimension-view -> join
      graft.operators.DeletionVectors.delete(s, tc, typesC,
        col("CKey") % 5 === 0)
      graft.operators.LakeSnapshots.commit(s, tc)
      refreshSources()
      require(refreshJ().deltaRows > 0L, "the retraction must fold")
      gate()
      refreshSources()
      require(refreshJ().deltaRows == 0L, "idle refresh must no-op")
      graft.operators.LakeView.read(s, vj)
        .groupBy(col("Seg").as("segment"))
        .agg(sum(col("m")).cast("bigint").as("n_cust"),
          sum(col("m") * col("n")).cast("bigint").as("n_orders"),
          sum(col("m") * col("sum_price")).cast("double").as("total_price"))
        .orderBy("segment")
    }),

    "q315_lake_view_distinct" -> ((s, dir) => {
      // DISTINCT-COUNT in the view fold rules: per-language
      // COUNT(DISTINCT n_chars) maintained EXACTLY — non-invertible
      // under deletes like extrema, so inserts and the delete wave
      // alike recompute only the TOUCHED groups from the
      // version-pinned table, and untouched groups carry their stored
      // exact count forward (their populations cannot have changed).
      // The delete wave removes whole value classes, the case a
      // register-merge design would get wrong. The 10th
      // create_lake_view argument persists the rule.
      val out = scratchPath(dir, "q315_records")
      val view = scratchPath(dir, "q315_view")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'aggregate',
           |  '$out', '$types', 'Lang', 'Chars', '', '', 0,
           |  'Chars')""".stripMargin).collect()
      def refresh(): Long =
        s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
          .getLong(5)
      val gateSf = isCorrectnessSf(dir)
      def gate(): Unit = if (gateSf) {
        val got = graft.operators.LakeView.read(s, view)
          .select(col("Lang"), col("dc_Chars"))
        val want = s.read.format("graft-records").option("path", out)
          .option("fieldTypes", types).load()
          .groupBy("Lang").agg(countDistinct(col("Chars")).as("wdc"))
        val mism = got.join(want, Seq("Lang"), "full")
          .filter(!(col("dc_Chars") <=> col("wdc")))
        require(mism.limit(1).isEmpty,
          "maintained distinct counts diverged from the recompute")
      }
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      require(refresh() > 0L, "bootstrap must fold groups")
      gate()
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      gate()
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      gate()
      require(refresh() == 0L, "idle refresh must no-op")
      s.sql(
        s"""SELECT Lang AS lang, CAST(n AS BIGINT) AS n_docs,
           |  CAST(dc_Chars AS BIGINT) AS dc_chars,
           |  CAST(sum_Chars AS BIGINT) AS sum_chars
           |FROM lake_view('$view') ORDER BY lang""".stripMargin)
    }),

    "q316_view_changes_sql" -> ((s, dir) => {
      // the view-layer CHANGE FEED in SQL: `view_changes(path, from,
      // to)` mirrors table_changes one level up — the signed content
      // delta of a maintained view between two generations, derived by
      // diffing generation pointers (reads only rewritten buckets,
      // never the view). One mutation wave (delete + append in a
      // single snapshot window) advances the view one generation; the
      // readout is the signed per-group delta, and the oracle
      // recomputes both states from the predicates and diffs them.
      // In-run gate at the correctness SFs: state@1 ∪ feed consolidates
      // to state@2 (the algebra the SQL surface now exposes).
      val out = scratchPath(dir, "q316_records")
      val view = scratchPath(dir, "q316_view")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'aggregate',
           |  '$out', '$types', 'Lang',
           |  'chars:CAST(Chars AS BIGINT)')""".stripMargin).collect()
      def refresh(): Unit =
        s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh() // generation 1
      // one wave: retract small docs AND append the remaining third,
      // committed as a single snapshot window
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh() // generation 2
      if (isCorrectnessSf(dir)) {
        // the feed IS the algebraic difference: state@1 ∪ feed ≡ state@2
        val g1 = graft.operators.LakeView.read(s, view, Some(1L))
          .withColumn("m", lit(1L))
        val feed = s.sql(s"SELECT * FROM view_changes('$view', 1, 2)")
        val rebuilt = graft.operators.IncrementalAgg
          .consolidate(g1.unionByName(feed))
        val g2 = graft.operators.LakeView.read(s, view, Some(2L))
          .withColumn("m", lit(1L))
        val mism = rebuilt.unionByName(g2.withColumn("m", -col("m")))
        require(graft.operators.IncrementalAgg.consolidate(mism)
          .limit(1).isEmpty,
          "state@1 ∪ view_changes(1,2) must consolidate to state@2")
      }
      s.sql(
        s"""SELECT Lang AS lang, CAST(n AS BIGINT) AS n_docs,
           |  CAST(sum_chars AS BIGINT) AS sum_chars, CAST(m AS BIGINT) AS m
           |FROM view_changes('$view', 1, 2)
           |ORDER BY lang, m""".stripMargin)
    }),

    "q317_composed_view_as_source" -> ((s, dir) => {
      // a COMPOSED kind as a FEED SOURCE: the 'join_aggregate' view C
      // (orders ⋈ customer rolled up per segment × customer) is itself
      // the source of a maintained per-segment rollup D, consumed
      // through C's generation feed exactly like any other view — the
      // kind partition (join_aggregate state is plain rows, not a
      // Z-relation) pinned by an actual downstream consumer. Three
      // mutation cycles (bootstrap, fact append, customer retraction)
      // flow tables -> C -> D with D ≡ recompute-from-C gated each
      // cycle at the correctness SFs; the oracle recomputes the
      // two-level rollup from the predicates.
      val to = scratchPath(dir, "q317_orders")
      val tc = scratchPath(dir, "q317_cust")
      val vc = scratchPath(dir, "q317_vc")
      val vd = scratchPath(dir, "q317_vd")
      val fs = new org.apache.hadoop.fs.Path(to)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(to, tc, vc, vd).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val typesO = "OKey:number,CKey:number,Price:number"
      val typesC = "CKey:number,Seg:singleLineText"
      val orders = rd(s, dir, "orders").select(
        concat(lit("o"), col("o_orderkey").cast("string")).as("_record_id"),
        col("o_orderkey").cast("double").as("OKey"),
        col("o_custkey").cast("double").as("CKey"),
        col("o_totalprice").cast("double").as("Price"))
      rd(s, dir, "customer").select(
          concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
          col("c_custkey").cast("double").as("CKey"),
          col("c_mktsegment").as("Seg"))
        .coalesce(1)
        .write.format("graft-records").option("path", tc)
        .option("dataFormat", "parquet").mode("append").save()
      orders.filter(col("OKey") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", to)
        .option("dataFormat", "parquet").mode("append").save()
      Seq(to, tc).foreach(p => graft.operators.LakeSnapshots.commit(s, p))
      s.sql(
        s"""SELECT * FROM create_lake_view('$vc', 'join_aggregate',
           |  '$to', '$typesO', 'OKey,CKey,Price',
           |  '$tc', '$typesC', 'CKey,Seg', 'CKey',
           |  'Seg,CKey', 'price:CAST(Price AS DECIMAL(18,2))')"""
          .stripMargin).collect()
      s.sql(
        s"""SELECT * FROM create_lake_view('$vd', 'aggregate_over_view',
           |  '$vc', 'Seg', 'orders:n,price:sum_price')""".stripMargin)
        .collect()
      def refresh(): Long = {
        s.sql(s"SELECT * FROM refresh_lake_view('$vc')").collect()
        s.sql(s"SELECT * FROM refresh_lake_view('$vd')").collect()(0)
          .getLong(5)
      }
      val gateSf = isCorrectnessSf(dir)
      def gate(): Unit = if (gateSf) {
        val got = graft.operators.LakeView.read(s, vd)
          .select(col("Seg"), col("n"), col("sum_orders"), col("sum_price"))
        val want = graft.operators.LakeView.read(s, vc)
          .groupBy("Seg").agg(count(lit(1)).as("wn"),
            sum(col("n")).as("worders"), sum(col("sum_price")).as("wprice"))
        val mism = got.join(want, Seq("Seg"), "full")
          .filter(!(col("n") <=> col("wn")) ||
            !(col("sum_orders") <=> col("worders")) ||
            !(col("sum_price") <=>
              col("wprice").cast(got.schema("sum_price").dataType)))
        require(mism.limit(1).isEmpty,
          "rollup over the composed view diverged from its source")
      }
      require(refresh() > 0L, "bootstrap must fold through C into D")
      gate()
      orders.filter(col("OKey") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", to)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(s, to)
      require(refresh() > 0L, "the fact append must flow C -> D")
      gate()
      graft.operators.DeletionVectors.delete(s, tc, typesC,
        col("CKey") % 5 === 0)
      graft.operators.LakeSnapshots.commit(s, tc)
      require(refresh() > 0L, "the retraction wave must flow C -> D")
      gate()
      require(refresh() == 0L, "idle refresh must no-op through the chain")
      s.sql(
        s"""SELECT Seg AS segment, CAST(n AS BIGINT) AS n_cust,
           |  CAST(sum_orders AS BIGINT) AS n_orders,
           |  CAST(sum_price AS DOUBLE) AS total_price
           |FROM lake_view('$vd') ORDER BY 1""".stripMargin)
    }),

    "q318_distinct_count_chain" -> ((s, dir) => {
      // the FULLY-INCREMENTAL exact distinct count: q315's answer
      // (per-language COUNT(DISTINCT n_chars)) maintained with NO
      // rescan anywhere — the 'distinct_count' kind chains two ADDITIVE
      // views (multiplicities by (Lang, Chars) at _values; an aggregate
      // over that level's ±1 generation feed, so the outer n IS the
      // live-value count). The delete wave removes whole value classes
      // — each dead class reaches the outer fold as a lone −1 from the
      // feed, no recompute; chain ≡ recompute gated per cycle at the
      // correctness SFs. This is the hot-group scale path: a window's
      // cost is ∝ touched value-level buckets, never a group's row
      // history (decade table in SCALE.md).
      val out = scratchPath(dir, "q318_records")
      val chain = scratchPath(dir, "q318_chain")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, chain).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      s.sql(
        s"""SELECT * FROM create_lake_view('$chain', 'distinct_count',
           |  '$out', '$types', 'Lang', 'Chars')""".stripMargin).collect()
      def refresh(): Long =
        s.sql(s"SELECT * FROM refresh_lake_view('$chain')").collect()(0)
          .getLong(5)
      val gateSf = isCorrectnessSf(dir)
      def gate(): Unit = if (gateSf) {
        val got = graft.operators.LakeView.read(s, chain)
          .select(col("Lang"), col("n"))
        val want = s.read.format("graft-records").option("path", out)
          .option("fieldTypes", types).load()
          .filter(col("Chars").isNotNull)
          .groupBy("Lang").agg(countDistinct(col("Chars")).as("wdc"))
        val mism = got.join(want, Seq("Lang"), "full")
          .filter(!(col("n") <=> col("wdc")))
        require(mism.limit(1).isEmpty,
          "chained distinct counts diverged from the recompute")
      }
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      require(refresh() > 0L, "bootstrap must fold through the chain")
      gate()
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      gate()
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      gate()
      require(refresh() == 0L, "idle refresh must no-op through the chain")
      s.sql(
        s"""SELECT Lang AS lang, CAST(n AS BIGINT) AS dc_chars
           |FROM lake_view('$chain') ORDER BY lang""".stripMargin)
    }),

    "q319_distinct_over_join_view" -> ((s, dir) => {
      // COUNT(DISTINCT) over a maintained JOIN's result, ∝ delta: the
      // 'distinct_count_over_view' chain counts distinct CUSTOMERS per
      // segment among those holding ≥1 live order — the value level
      // folds the join view's Z-relation feed (stored multiplicities),
      // so an order append, an order retraction that kills a customer's
      // LAST order, and a customer retraction all flow join → chain as
      // ±1s per (segment, customer) liveness transition, no rescan of
      // anything. Chain ≡ recompute-from-join gated per cycle at the
      // correctness SFs; the oracle recomputes from the predicates.
      val to = scratchPath(dir, "q319_orders")
      val tc = scratchPath(dir, "q319_cust")
      val jv = scratchPath(dir, "q319_join")
      val chain = scratchPath(dir, "q319_chain")
      val fs = new org.apache.hadoop.fs.Path(to)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(to, tc, jv, chain).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val typesO = "OKey:number,CKey:number"
      val typesC = "CKey:number,Seg:singleLineText"
      // the even-orderkey HALF of the fact table: every liveness
      // transition the gate needs survives, the bench-SF state stays
      // under the adaptive bucket threshold (no mid-chain migration)
      val orders = rd(s, dir, "orders")
        .filter(col("o_orderkey") % 4 === 0).select(
        concat(lit("o"), col("o_orderkey").cast("string")).as("_record_id"),
        col("o_orderkey").cast("double").as("OKey"),
        col("o_custkey").cast("double").as("CKey"))
      rd(s, dir, "customer").select(
          concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
          col("c_custkey").cast("double").as("CKey"),
          col("c_mktsegment").as("Seg"))
        .coalesce(1)
        .write.format("graft-records").option("path", tc)
        .option("dataFormat", "parquet").mode("append").save()
      orders.filter(col("OKey") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", to)
        .option("dataFormat", "parquet").mode("append").save()
      Seq(to, tc).foreach(p => graft.operators.LakeSnapshots.commit(s, p))
      s.sql(
        s"""SELECT * FROM create_lake_view('$jv', 'join',
           |  '$to', '$typesO', 'CKey,OKey',
           |  '$tc', '$typesC', 'CKey,Seg', 'CKey')""".stripMargin).collect()
      s.sql(
        s"""SELECT * FROM create_lake_view('$chain',
           |  'distinct_count_over_view', '$jv', 'Seg', 'CKey')"""
          .stripMargin).collect()
      def refresh(): Long = {
        s.sql(s"SELECT * FROM refresh_lake_view('$jv')").collect()
        s.sql(s"SELECT * FROM refresh_lake_view('$chain')").collect()(0)
          .getLong(5)
      }
      val gateSf = isCorrectnessSf(dir)
      def gate(): Unit = if (gateSf) {
        val got = graft.operators.LakeView.read(s, chain)
          .select(col("Seg"), col("n"))
        // recompute from the join view's LIVE rows (multiplicity > 0
        // by construction) — the chain must agree with its source
        val want = graft.operators.LakeView.read(s, jv)
          .groupBy("Seg").agg(countDistinct(col("CKey")).as("wdc"))
        val mism = got.join(want, Seq("Seg"), "full")
          .filter(!(col("n") <=> col("wdc")))
        require(mism.limit(1).isEmpty,
          "distinct-over-join chain diverged from its source view")
      }
      require(refresh() > 0L, "bootstrap must fold join -> chain")
      gate()
      // ONE combined mutation window, both sides and both directions:
      // order appends (customers gaining their FIRST order tick up),
      // an order retraction of OKey % 7 == 0 (customers losing their
      // LAST live order tick down), and a customer retraction of
      // CKey % 5 == 0 (their join rows vanish wholesale) — the
      // bilinear fold consumes both sides' deltas in a single refresh,
      // and all three liveness-transition shapes reach the chain
      // through one feed window
      orders.filter(col("OKey") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", to)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.DeletionVectors.delete(s, to, typesO,
        pmod(col("OKey"), lit(7.0)) === 0.0)
      graft.operators.DeletionVectors.delete(s, tc, typesC,
        pmod(col("CKey"), lit(5.0)) === 0.0)
      Seq(to, tc).foreach(p => graft.operators.LakeSnapshots.commit(s, p))
      refresh()
      gate()
      require(refresh() == 0L, "idle refresh must no-op through the chain")
      s.sql(
        s"""SELECT Seg AS segment, CAST(n AS BIGINT) AS n_customers
           |FROM lake_view('$chain') ORDER BY 1""".stripMargin)
    }),

    "q321_lake_view_histogram" -> ((s, dir) => {
      // HISTOGRAMS in the view fold rules: per-language doc-length
      // histograms maintained as hs_<col> (the 12th create_lake_view
      // argument, entries `col:lo:hi:bins`). Bin counts are ADDITIVE
      // in the signed delta — invertible under deletes, unlike
      // extrema/top-k — so the delete wave DECREMENTS the emptied bins
      // through the pure additive fold; no rescan exists on this path
      // at any scale. Readout explodes (lang, bin, cnt); bin 0 is
      // underflow, bins+1 overflow.
      val out = scratchPath(dir, "q321_records")
      val view = scratchPath(dir, "q321_view")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'aggregate',
           |  '$out', '$types', 'Lang', '', '', '', 0, '', '',
           |  'Chars:0:4000:8')""".stripMargin).collect()
      def refresh(): Long =
        s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
          .getLong(5)
      val gateSf = isCorrectnessSf(dir)
      def gate(): Unit = if (gateSf) {
        val got = s.sql(
          s"""SELECT Lang, pos, v FROM lake_view('$view')
             |LATERAL VIEW posexplode(hs_Chars) AS pos, v""".stripMargin)
        val want = s.read.format("graft-records").option("path", out)
          .option("fieldTypes", types).load()
          .filter(col("Chars").isNotNull)
          .withColumn("pos",
            when(col("Chars") < 0, 0).when(col("Chars") >= 4000, 9)
              .otherwise(floor(col("Chars") / 500).cast("int") + 1))
          .groupBy("Lang", "pos").agg(count(lit(1)).as("wv"))
        val mism = got.join(want, Seq("Lang", "pos"), "full")
          .filter(!(coalesce(col("v"), lit(0L)) <=>
            coalesce(col("wv"), lit(0L))))
        require(mism.limit(1).isEmpty,
          "maintained histogram diverged from the recompute")
      }
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      require(refresh() > 0L, "bootstrap must fold groups")
      gate()
      // empty out the low bins: the additive fold must decrement
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 500)
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      gate()
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      gate()
      require(refresh() == 0L, "idle refresh must no-op")
      s.sql(
        s"""SELECT Lang AS lang, CAST(pos AS BIGINT) AS bin,
           |  CAST(v AS BIGINT) AS cnt,
           |  CAST(hist_quantile(hs_Chars, 0, 4000, 0.5) AS DOUBLE)
           |    AS p50_est
           |FROM lake_view('$view')
           |LATERAL VIEW posexplode(hs_Chars) AS pos, v
           |WHERE v <> 0 ORDER BY lang, bin""".stripMargin)
    }),

    "q320_lake_view_topk" -> ((s, dir) => {
      // TOP-K in the view fold rules: the k LARGEST DISTINCT values
      // per group maintained EXACTLY as tk_<col> (the 11th
      // create_lake_view argument, entries `col:k`). Non-invertible
      // under deletes like extrema — when a stored top value's class
      // dies, the replacement comes from the touched-group rescan
      // (the stored k-element state cannot supply it); the rescan
      // primitive is the native bounded-heap top_k_distinct, O(k)
      // state per group, never collect_set of the full value set. The
      // delete wave here kills the globally largest Chars values, so
      // every group's stored top-k loses members in one window.
      val out = scratchPath(dir, "q320_records")
      val view = scratchPath(dir, "q320_view")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'aggregate',
           |  '$out', '$types', 'Lang', 'Chars', '', '', 0, '',
           |  'Chars:3')""".stripMargin).collect()
      def refresh(): Long =
        s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
          .getLong(5)
      val gateSf = isCorrectnessSf(dir)
      def gate(): Unit = if (gateSf) {
        val got = s.sql(
          s"""SELECT Lang, pos, v FROM lake_view('$view')
             |LATERAL VIEW posexplode(tk_Chars) AS pos, v""".stripMargin)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("Lang").orderBy(col("Chars").desc)
        val want = s.read.format("graft-records").option("path", out)
          .option("fieldTypes", types).load()
          .filter(col("Chars").isNotNull)
          .select(col("Lang"), col("Chars")).distinct()
          .withColumn("pos", row_number().over(w) - 1)
          .filter(col("pos") < 3)
          .select(col("Lang"), col("pos"), col("Chars").as("wv"))
        val mism = got.join(want, Seq("Lang", "pos"), "full")
          .filter(!(col("v") <=> col("wv")))
        require(mism.limit(1).isEmpty,
          "maintained top-k diverged from the recompute")
      }
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      require(refresh() > 0L, "bootstrap must fold groups")
      gate()
      // kill the global top of the Chars distribution: every group's
      // stored top-k must refill from below via the rescan
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") >= 2000)
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      gate()
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      gate()
      require(refresh() == 0L, "idle refresh must no-op")
      s.sql(
        s"""SELECT Lang AS lang, CAST(pos + 1 AS BIGINT) AS rk,
           |  CAST(v AS BIGINT) AS chars
           |FROM lake_view('$view')
           |LATERAL VIEW posexplode(tk_Chars) AS pos, v
           |ORDER BY lang, rk""".stripMargin)
    }),

    "q312_lake_view_join3" -> ((s, dir) => {
      // a THREE-TABLE maintained join view (orders ⋈ customer ⋈ nation
      // — the star shape): two chained bilinear folds under one
      // definition, the root treating the maintained inner pair as its
      // left relation (its delta is the checkpointed inner delta, its
      // old state the pre-fold generation — never a state diff). The
      // middle-table delete retracts through BOTH joins in one
      // refresh; the fold ≡ recompute gate runs over the inner state
      // after every cycle; the oracle recomputes the 3-way join from
      // the predicates.
      val t0 = scratchPath(dir, "q312_orders")
      val t1 = scratchPath(dir, "q312_cust")
      val t2 = scratchPath(dir, "q312_nation")
      val view = scratchPath(dir, "q312_view")
      val fs = new org.apache.hadoop.fs.Path(t0)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(t0, t1, t2, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val types0 = "OKey:number,CKey:number,Price:number"
      val types1 = "CKey:number,NKey:number"
      val types2 = "NKey:number,NName:singleLineText"
      val orders = rd(s, dir, "orders").select(
        concat(lit("o"), col("o_orderkey").cast("string")).as("_record_id"),
        col("o_orderkey").cast("double").as("OKey"),
        col("o_custkey").cast("double").as("CKey"),
        col("o_totalprice").cast("double").as("Price"))
      rd(s, dir, "customer").select(
          concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
          col("c_custkey").cast("double").as("CKey"),
          col("c_nationkey").cast("double").as("NKey"))
        .coalesce(1)
        .write.format("graft-records").option("path", t1)
        .option("dataFormat", "parquet").mode("append").save()
      rd(s, dir, "nation").select(
          concat(lit("n"), col("n_nationkey").cast("string")).as("_record_id"),
          col("n_nationkey").cast("double").as("NKey"),
          col("n_name").as("NName"))
        .coalesce(1)
        .write.format("graft-records").option("path", t2)
        .option("dataFormat", "parquet").mode("append").save()
      orders.filter(col("OKey") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", t0)
        .option("dataFormat", "parquet").mode("append").save()
      Seq(t0, t1, t2).foreach(p =>
        graft.operators.LakeSnapshots.commit(s, p))
      def refresh() = graft.operators.LakeView.refreshJoin3(s, view,
        t0, types0, Seq("CKey", "OKey", "Price"),
        t1, types1, Seq("CKey", "NKey"),
        t2, types2, Seq("NKey", "NName"),
        keys01 = Seq("CKey"), keys12 = Seq("NKey"))
      // recompute-equality at the correctness SFs only (q306
      // discipline): the bench SF measures the chained folds alone
      val gateSf = isCorrectnessSf(dir)
      def gate(): Unit = if (gateSf) {
        // root ≡ recompute over (inner state ⋈ live nation): the
        // chained fold must agree with a one-shot join of its inputs
        val inner = graft.operators.LakeView.read(s, s"$view/inner")
        val nat = s.read.format("graft-records").option("path", t2)
          .option("fieldTypes", types2).load()
        val want = inner.join(nat, "NKey")
          .groupBy("NName")
          .agg(sum(col("m")).as("wn"),
            sum(col("m") * expr("CAST(Price AS DECIMAL(18,2))")).as("wp"))
        val got = graft.operators.LakeView.read(s, view)
          .groupBy("NName")
          .agg(sum(col("m")).as("gn"),
            sum(col("m") * expr("CAST(Price AS DECIMAL(18,2))")).as("gp"))
        val mism = got.join(want, Seq("NName"), "full")
          .filter(!(col("gn") <=> col("wn")) || !(col("gp") <=> col("wp")))
        require(mism.limit(1).isEmpty,
          "3-way fold diverged from inner ⋈ live recompute")
      }
      val r1 = refresh()
      require(r1.deltaRows > 0L && r1.innerDeltaRows > 0L,
        s"bootstrap must fold both levels: $r1")
      gate()
      // cycle 2: fact append flows through both joins
      orders.filter(col("OKey") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", t0)
        .option("dataFormat", "parquet").mode("append").save()
      graft.operators.LakeSnapshots.commit(s, t0)
      require(refresh().deltaRows > 0L, "fact append must fold")
      gate()
      // cycle 3: MIDDLE-table delete retracts through both joins
      graft.operators.DeletionVectors.delete(s, t1, types1,
        col("CKey") % 7 === 0)
      graft.operators.LakeSnapshots.commit(s, t1)
      require(refresh().deltaRows > 0L, "middle retraction must fold")
      gate()
      // cycle 4: LAST-table delete retracts whole nations
      graft.operators.DeletionVectors.delete(s, t2, types2,
        col("NKey") % 5 === 2)
      graft.operators.LakeSnapshots.commit(s, t2)
      require(refresh().deltaRows > 0L, "dim retraction must fold")
      gate()
      val idle = refresh()
      require(idle.deltaRows == 0L && idle.innerDeltaRows == 0L,
        s"idle refresh must no-op: $idle")
      graft.operators.LakeView.read(s, view)
        .groupBy(col("NName").as("nation"))
        .agg(sum(col("m")).cast("bigint").as("n_rows"),
          sum(col("m") * expr("CAST(Price AS DECIMAL(18,2))"))
            .cast("double").as("sum_price"))
        .orderBy("nation")
    }),

    "q311_lake_view_lookup" -> ((s, dir) => {
      // BUCKET-PRUNED point reads of a maintained view: a per-document
      // keyed aggregate (group count ∝ corpus) is probed for three
      // keys, and the lookup reads ONLY the bucket files those keys
      // hash into — gated in-run by inputFiles (strictly fewer files
      // than the full state) AND by equivalence to the filtered full
      // read. The 100-TB shape: serving key lookups from a huge
      // maintained view without scanning its state. Oracle recomputes
      // the probed groups from the delete predicate.
      val out = scratchPath(dir, "q311_records")
      val view = scratchPath(dir, "q311_view")
      val types = "DocId:number,Chars:number"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      rd(s, dir, "documents")
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"))
        .coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      // pinned 16-bucket modulus: the pruning is the point at ANY size
      s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'aggregate',
           |  '$out', '$types', 'DocId', 'Chars', '', '', 16)""".stripMargin)
        .collect()
      def refresh(): Unit =
        { s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect(); () }
      refresh()
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      val probes = Seq(Seq[Any](5.0), Seq[Any](8.0), Seq[Any](13.0))
      val looked = graft.operators.LakeView.readKeys(s, view,
        Seq("DocId"), probes)
      // gate 1: the lookup read strictly fewer state files than the
      // full view holds (bucket pruning actually happened)
      val fullFiles = graft.operators.LakeView.read(s, view)
        .inputFiles.length
      val lookFiles = looked.inputFiles.length
      require(lookFiles > 0 && lookFiles < fullFiles,
        s"lookup must prune buckets: read $lookFiles of $fullFiles files")
      // gate 2: pruned ≡ filtered full read
      val fullRead = graft.operators.LakeView.read(s, view)
        .filter(col("DocId").isin(5.0, 8.0, 13.0))
      val mism = looked.select(col("DocId"), col("n"), col("sum_Chars"))
        .exceptAll(fullRead.select(col("DocId"), col("n"), col("sum_Chars")))
        .unionByName(fullRead.select(col("DocId"), col("n"), col("sum_Chars"))
          .exceptAll(looked.select(col("DocId"), col("n"), col("sum_Chars"))))
      require(mism.limit(1).isEmpty,
        "bucket-pruned lookup diverged from the filtered full read")
      looked.select(col("DocId").cast("bigint").as("doc_id"),
          col("n").as("n_docs"),
          col("sum_Chars").cast("bigint").as("sum_chars"))
        .orderBy("doc_id")
    }),

    "q310_lake_view_expr" -> ((s, dir) => {
      // a DERIVED-COLUMN maintained aggregate through pure SQL: the
      // sums list carries a SumSpec expression (`wsum:Chars * DocId`),
      // persisted in the fold rules — aggregation over the signed
      // delta is linear, so an arbitrary row-level expression folds
      // exactly like a plain column. Same commit shape as q302
      // (append, delete, append); integer-valued products keep the
      // double fold IEEE-exact against the oracle's one-shot recompute.
      val out = scratchPath(dir, "q310_records")
      val view = scratchPath(dir, "q310_view")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(out, view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      s.sql(
        s"""SELECT * FROM create_lake_view('$view', 'aggregate',
           |  '$out', '$types', 'Lang',
           |  'Chars,wsum:Chars * DocId')""".stripMargin).collect()
      def refresh(): org.apache.spark.sql.Row =
        s.sql(s"SELECT * FROM refresh_lake_view('$view')").collect()(0)
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      require(refresh().getLong(5) > 0L, "bootstrap must fold groups")
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.LakeSnapshots.commit(s, out)
      refresh()
      require(refresh().getLong(5) == 0L, "idle refresh must no-op")
      s.sql(
        s"""SELECT Lang AS lang, CAST(n AS BIGINT) AS n_docs,
           |  CAST(sum_Chars AS BIGINT) AS sum_chars,
           |  CAST(sum_wsum AS BIGINT) AS wsum
           |FROM lake_view('$view') ORDER BY lang""".stripMargin)
    }),

    "q292_parquet_tier" -> ((s, dir) => {
      // the record lake's COLUMNAR data tier (dataFormat=parquet):
      // same sidecar discipline — deletion vectors by row ordinal,
      // snapshot manifests, bloom sidecars — over parquet files with
      // footer-statistics row-group pruning. Two deletes straddle a
      // snapshot; the oracle recomputes both states from the predicates
      // alone, so a wrong ordinal mapping, a mis-skipped row group, or
      // a DV that drifted across the format boundary all surface.
      val out = scratchPath(dir, "q292_records")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      Seq(0, 1, 2).foreach { k =>
        docs.filter(col("DocId") % 3 === k).coalesce(1)
          .write.format("graft-records").option("path", out)
          .option("dataFormat", "parquet")
          .option("bloomFilterColumns", "_record_id")
          .mode("append").save()
      }
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      val v1 = graft.operators.LakeSnapshots.commit(s, out)
      graft.operators.DeletionVectors.delete(s, out, types,
        col("DocId") % 10 === 7)
      def agg(df: org.apache.spark.sql.DataFrame, phase: String) =
        df.groupBy(col("Lang").as("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("Chars").cast("long")).as("sum_chars"),
            sum(col("DocId").cast("long")).as("id_sum"))
          .select(lit(phase).as("phase"), col("lang"), col("n_docs"),
            col("sum_chars"), col("id_sum"))
      val pq = s.read.format("graft-records").option("path", out)
        .option("fieldTypes", types).option("dataFormat", "parquet")
      agg(pq.load(), "zlive")
        .unionByName(agg(pq.option("versionAsOf", v1.toString).load(), "v1"))
        .orderBy("phase", "lang")
    }),

    "q291_sql_rename_column" -> ((s, dir) => {
      // RENAME COLUMN on a sparse record lake is metadata-only: rows
      // written BEFORE the rename keep their old wire key and read
      // through the former-name fallback; rows written AFTER use the
      // new key. The gate mixes both generations, deletes through the
      // NEW name (the predicate must find old rows via the fallback,
      // and zone pruning must not wrongly drop pre-rename files), and
      // time-travels to a PRE-rename snapshot read under the new name.
      val wh = scratchPath(dir, "q291_wh")
      val cat = "g291c" + (wh.hashCode.toLong & 0xffffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.RecordCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"DROP TABLE IF EXISTS $cat.ns.docs")
      s.sql(s"CREATE TABLE $cat.ns.docs (Lang STRING, Chars DOUBLE)")
      val view = s"q291_docs_${wh.hashCode.toLong & 0xffffffffL}"
      rd(s, dir, "documents").createOrReplaceTempView(view)
      s.sql(
        s"""INSERT INTO $cat.ns.docs
           |SELECT concat('d', CAST(doc_id AS STRING)),
           |  CAST(NULL AS TIMESTAMP), lang, CAST(n_chars AS DOUBLE)
           |FROM $view WHERE doc_id % 2 = 0""".stripMargin)
      graft.operators.LakeSnapshots.commit(s, s"$wh/ns/docs") // pre-rename
      s.sql(s"ALTER TABLE $cat.ns.docs RENAME COLUMN Chars TO Size")
      s.sql(
        s"""INSERT INTO $cat.ns.docs
           |SELECT concat('d', CAST(doc_id AS STRING)),
           |  CAST(NULL AS TIMESTAMP), lang, CAST(n_chars AS DOUBLE)
           |FROM $view WHERE doc_id % 2 = 1""".stripMargin)
      // the delete predicate names the NEW column; pre-rename rows must
      // match through the former wire key
      s.sql(s"DELETE FROM $cat.ns.docs WHERE Size < 200")
      val out = s.sql(
        s"""SELECT 'live' AS phase, Lang AS lang, count(*) AS n_docs,
           |  CAST(sum(CAST(Size AS BIGINT)) AS BIGINT) AS sum_size
           |FROM $cat.ns.docs GROUP BY 2
           |UNION ALL
           |SELECT 'v1', Lang, count(*),
           |  CAST(sum(CAST(Size AS BIGINT)) AS BIGINT)
           |FROM $cat.ns.docs VERSION AS OF 1 GROUP BY 2
           |ORDER BY phase, lang""".stripMargin)
        .localCheckpoint()
      s.catalog.dropTempView(view)
      out
    }),

    "q285_schema_evolution" -> ((s, dir) => {
      // sparse records make ADD COLUMNS metadata-only: half the corpus
      // lands BEFORE the column exists, half after (with values) — the
      // old rows must read NULL in the new column without any rewrite,
      // and aggregates over the union must match the oracle's phase
      // split exactly.
      val wh = scratchPath(dir, "q285_wh")
      val cat = "g285c" + (wh.hashCode.toLong & 0xffffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.RecordCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"DROP TABLE IF EXISTS $cat.ns.docs")
      s.sql(s"CREATE TABLE $cat.ns.docs (Lang STRING, Chars DOUBLE)")
      val view = s"q285_docs_${wh.hashCode.toLong & 0xffffffffL}"
      rd(s, dir, "documents").createOrReplaceTempView(view)
      s.sql(
        s"""INSERT INTO $cat.ns.docs
           |SELECT concat('d', CAST(doc_id AS STRING)),
           |  CAST(NULL AS TIMESTAMP), lang, CAST(n_chars AS DOUBLE)
           |FROM $view WHERE doc_id % 2 = 0""".stripMargin)
      s.sql(s"ALTER TABLE $cat.ns.docs ADD COLUMNS (Quality DOUBLE)")
      s.sql(
        s"""INSERT INTO $cat.ns.docs
           |SELECT concat('d', CAST(doc_id AS STRING)),
           |  CAST(NULL AS TIMESTAMP), lang, CAST(n_chars AS DOUBLE),
           |  CAST(doc_id % 5 AS DOUBLE)
           |FROM $view WHERE doc_id % 2 = 1""".stripMargin)
      val out = s.sql(
        s"""SELECT Lang AS lang, count(*) AS n_docs,
           |  CAST(sum(CAST(Chars AS BIGINT)) AS BIGINT) AS sum_chars,
           |  count(Quality) AS n_quality,
           |  CAST(sum(CAST(Quality AS BIGINT)) AS BIGINT) AS sum_quality
           |FROM $cat.ns.docs GROUP BY 1 ORDER BY 1""".stripMargin)
        .localCheckpoint()
      s.catalog.dropTempView(view)
      out
    }),


    // ----- SQL MERGE INTO: the reference's upsert, as SQL ------------
    "q284_sql_merge" -> ((s, dir) => {
      // the reference's core operation — upsert-with-deletes
      // (lib/UpdateStrategies.py) — expressed as one SQL MERGE against
      // the catalog: seed = even customers; source = every third
      // customer with a bumped balance; matched+negative deletes,
      // matched updates, unmatched non-negative inserts. Runs as
      // group-based copy-on-write through SupportsRowLevelOperations;
      // the oracle recomputes the final state from the same set
      // algebra over the source table alone.
      val wh = scratchPath(dir, "q284_wh")
      val cat = "g284c" + (wh.hashCode.toLong & 0xffffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.RecordCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"DROP TABLE IF EXISTS $cat.ns.cust")
      s.sql(s"CREATE TABLE $cat.ns.cust (Segment STRING, Bal DOUBLE)")
      val view = s"q284_cust_${wh.hashCode.toLong & 0xffffffffL}"
      rd(s, dir, "customer").createOrReplaceTempView(view)
      s.sql(
        s"""INSERT INTO $cat.ns.cust
           |SELECT concat('c', CAST(c_custkey AS STRING)),
           |  CAST(NULL AS TIMESTAMP), c_mktsegment,
           |  CAST(c_acctbal AS DOUBLE)
           |FROM $view WHERE c_custkey % 2 = 0""".stripMargin)
      s.sql(
        s"""MERGE INTO $cat.ns.cust AS t
           |USING (SELECT concat('c', CAST(c_custkey AS STRING)) AS rid,
           |         c_mktsegment AS seg,
           |         CAST(c_acctbal AS DOUBLE) + 1000.0 AS bal2,
           |         (c_acctbal < 0) AS del
           |       FROM $view WHERE c_custkey % 3 = 0) AS src
           |ON t._record_id = src.rid
           |WHEN MATCHED AND src.del THEN DELETE
           |WHEN MATCHED THEN UPDATE SET Bal = src.bal2
           |WHEN NOT MATCHED AND NOT src.del THEN INSERT
           |  (_record_id, _created_time, Segment, Bal)
           |  VALUES (src.rid, CAST(NULL AS TIMESTAMP), src.seg, src.bal2)
           |""".stripMargin)
      val out = s.sql(
        s"""SELECT Segment AS segment, count(*) AS n_cust,
           |  CAST(sum(CAST(Bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
           |  min(_record_id) AS min_id
           |FROM $cat.ns.cust GROUP BY 1 ORDER BY 1""".stripMargin)
        .localCheckpoint()
      s.catalog.dropTempView(view)
      out
    }),


    // ----- SQL catalog: CREATE/INSERT/DELETE/SELECT by name ----------
    "q283_sql_catalog" -> ((s, dir) => {
      // the whole lifecycle in SQL against the RecordCatalog: CREATE
      // TABLE (field types derived from the declared columns), INSERT
      // INTO from a view of the fixture, DELETE WHERE (routed through
      // deletion vectors — metadata-only, and the strict V2→V1
      // predicate conversion refuses anything outside the surface
      // rather than half-applying), then the SELECT aggregate the
      // oracle reproduces from the source table and the delete
      // predicate alone. Catalog name is keyed by the warehouse (a
      // catalog instance pins its warehouse at first use per session).
      val wh = scratchPath(dir, "q283_wh")
      val cat = "g283c" + (wh.hashCode.toLong & 0xffffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.RecordCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"DROP TABLE IF EXISTS $cat.ns.orders_t")
      s.sql(s"CREATE TABLE $cat.ns.orders_t " +
        "(Status STRING, Price DOUBLE, Custkey DOUBLE)")
      val view = s"q283_orders_${(wh.hashCode.toLong & 0xffffffffL)}"
      rd(s, dir, "orders").createOrReplaceTempView(view)
      s.sql(
        s"""INSERT INTO $cat.ns.orders_t
           |SELECT concat('o', CAST(o_orderkey AS STRING)),
           |  CAST(NULL AS TIMESTAMP),
           |  o_orderstatus, CAST(o_totalprice AS DOUBLE),
           |  CAST(o_custkey AS DOUBLE)
           |FROM $view""".stripMargin)
      s.sql(s"DELETE FROM $cat.ns.orders_t WHERE Price < 50000.0")
      val out = s.sql(
        s"""SELECT Status AS status, count(*) AS n_orders,
           |  CAST(sum(CAST(Price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           |  min(_record_id) AS min_id
           |FROM $cat.ns.orders_t GROUP BY 1 ORDER BY 1""".stripMargin)
        .localCheckpoint()
      s.catalog.dropTempView(view)
      out
    }),


    // ----- changelog (CDC) reads between snapshots --------------------
    "q289_lake_cdc" -> ((s, dir) => {
      // the lake's own change feed: three snapshot states (append,
      // merge-on-read delete, second delete), consumed INCREMENTALLY —
      // the maintained per-language aggregate starts from the v1 scan
      // and applies ONLY the signed Z-relation deltas LakeChangelog
      // derives from manifest + deletion-vector diffs (never rescanning
      // the live table). The oracle recomputes the final state from the
      // append/delete ordering alone: any wrong delta row breaks the
      // totals.
      val out = scratchPath(dir, "q289_records")
      val types = "DocId:number,Chars:number,Lang:singleLineText"
      val docs = rd(s, dir, "documents").filter(col("lang").isNotNull)
        .select(
          concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
            .as("_record_id"),
          col("doc_id").cast("double").as("DocId"),
          col("n_chars").cast("double").as("Chars"),
          col("lang").as("Lang"))
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      docs.filter(col("DocId") % 3 < 2).coalesce(2)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      val v1 = graft.operators.LakeSnapshots.commit(s, out)
      docs.filter(col("DocId") % 3 === 2).coalesce(1)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      val v2 = graft.operators.LakeSnapshots.commit(s, out)
      graft.operators.DeletionVectors.delete(s, out, types,
        col("DocId") % 10 === 7)
      val v3 = graft.operators.LakeSnapshots.commit(s, out)
      val state0 = s.read.format("graft-records").option("path", out)
        .option("fieldTypes", types).option("versionAsOf", v1.toString)
        .load().groupBy("Lang")
        .agg(count(lit(1)).as("n"), sum(col("Chars")).as("sc"),
          sum(col("DocId")).as("si"))
      val maintained = Seq((v1, v2), (v2, v3)).foldLeft(state0) {
        case (st, (a, b)) =>
          val delta = graft.operators.LakeChangelog
            .changes(s, out, types, a, b)
            .groupBy("Lang")
            .agg(sum(col("m")).as("dn"),
              sum(col("m") * col("Chars")).as("dsc"),
              sum(col("m") * col("DocId")).as("dsi"))
          st.join(delta, Seq("Lang"), "full")
            .select(col("Lang"),
              (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
                .as("n"),
              (coalesce(col("sc"), lit(0.0)) + coalesce(col("dsc"), lit(0.0)))
                .as("sc"),
              (coalesce(col("si"), lit(0.0)) + coalesce(col("dsi"), lit(0.0)))
                .as("si"))
            .filter(col("n") > 0)
      }
      maintained.select(col("Lang").as("lang"), col("n").as("n_docs"),
          col("sc").cast("long").as("sum_chars"),
          col("si").cast("long").as("id_sum"))
        .orderBy("lang")
    }),


    // ----- snapshot manifests + versionAsOf time travel --------------
    "q282_time_travel" -> ((s, dir) => {
      // three table states, one directory: v1 freezes the first slice
      // BEFORE any delete; v2 freezes slices 0+1 after the first
      // merge-on-read delete; live adds a second delete and a third
      // slice. Each versionAsOf read must replay its frozen file set
      // AND frozen deletion-vector state — v1 still sees rows both
      // later deletes removed, v2 sees the first delete but not the
      // second. The oracle recomputes all three states from the
      // append/delete ordering alone.
      val out = scratchPath(dir, "q282_records")
      val types = "DocId:number,Chars:number"
      val docs = rd(s, dir, "documents").select(
        concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
          .as("_record_id"),
        col("doc_id").cast("double").as("DocId"),
        col("n_chars").cast("double").as("Chars"))
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      def slice(k: Int): Unit =
        docs.filter(col("DocId") % 3 === k).coalesce(1)
          .write.format("graft-records").option("path", out)
          .mode("append").save()
      slice(0)
      graft.operators.LakeSnapshots.commit(s, out) // v1
      slice(1)
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.LakeSnapshots.commit(s, out) // v2
      graft.operators.DeletionVectors.delete(s, out, types,
        col("DocId") % 10 === 7)
      slice(2)
      def phase(tag: String, v: Option[Long]) = {
        val r = s.read.format("graft-records").option("path", out)
          .option("fieldTypes", types)
        v.fold(r)(n => r.option("versionAsOf", n.toString)).load()
          .agg(count(lit(1)).as("n_docs"),
            sum(col("Chars").cast("long")).as("sum_chars"),
            sum(col("DocId").cast("long")).as("id_sum"))
          .withColumn("phase", lit(tag))
      }
      phase("v1", Some(1L))
        .unionByName(phase("v2", Some(2L)))
        .unionByName(phase("zlive", None))
        .select("phase", "n_docs", "sum_chars", "id_sum")
        .orderBy("phase")
    }),


    // ----- bloom-sidecar point-lookup index (lakehouse) --------------
    "q280_bloom_index_lookup" -> ((s, dir) => {
      // customer landed as SIX record files with a bloom sidecar on
      // _record_id (16 bits/key MD5 double hashing): point and IN-list
      // lookups prune files by definite bloom misses before any byte is
      // read (BloomSidecarSpec pins the opened-file counts; here the
      // oracle pins that pruning loses nothing). Zone maps cannot give
      // this: random-looking ids make every file's min/max range
      // overlap every other's. At 100 TB an id probe opens a handful
      // of files instead of the fleet.
      val out = scratchPath(dir, "q280_records")
      val cust = rd(s, dir, "customer").select(
        concat(lit("c"), col("c_custkey").cast("string")).as("_record_id"),
        col("c_mktsegment").as("Segment"),
        col("c_acctbal").cast("double").as("Bal"),
        col("c_custkey").cast("double").as("Key"))
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      (0 until 6).foreach { b =>
        cust.filter(col("Key") % 6 === b).coalesce(1)
          .write.format("graft-records").option("path", out)
          .option("bloomFilterColumns", "_record_id")
          .mode("append").save()
      }
      s.read.format("graft-records").option("path", out)
        .option("fieldTypes", "Segment:singleLineText,Bal:number,Key:number")
        .load()
        .filter(col("_record_id")
          .isin("c1", "c7", "c42", "c139", "c-no-such-id"))
        .select(col("_record_id"), col("Segment"),
          col("Bal"), col("Key").cast("long").as("custkey"))
        .orderBy("_record_id")
    }),


    // ----- merge-on-read DELETE via deletion vectors (lakehouse) -----
    "q277_deletion_vectors" -> ((s, dir) => {
      // two DELETE waves write per-file deletion vectors — metadata
      // only, zero data-file rewrites (DeletionVectorSpec pins the
      // bytes) — and the merge-on-read aggregate must equal the SQL
      // truth over the survivor predicate; then materialize folds the
      // vectors into rewritten files and the SAME aggregate must hold
      // again (phase 'mor' vs 'cow'). The row addresses come from the
      // source's hidden (_file, _pos) metadata columns, so the delete
      // scan itself rides the pushdown stack. At 100 TB: a predicate
      // delete costs one sidecar write per touched file, not a rewrite.
      val out = scratchPath(dir, "q277_records")
      val docs = rd(s, dir, "documents").select(
        concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
          .as("_record_id"),
        col("doc_id").cast("double").as("DocId"),
        col("lang").as("Lang"),
        col("n_chars").cast("double").as("Chars"))
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      (0 until 4).foreach { b =>
        docs.filter(col("DocId") % 4 === b).coalesce(1)
          .write.format("graft-records").option("path", out)
          .mode("append").save()
      }
      val types = "DocId:number,Lang:singleLineText,Chars:number"
      graft.operators.DeletionVectors.delete(s, out, types,
        col("Chars") < 200)
      graft.operators.DeletionVectors.delete(s, out, types,
        col("DocId") % 10 === 3)
      def readBack(phase: String) =
        s.read.format("graft-records").option("path", out)
          .option("fieldTypes", types).load()
          .groupBy(col("Lang").as("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("Chars").cast("long")).as("sum_chars"),
            max(col("_record_id")).as("max_id"))
          .withColumn("phase", lit(phase))
      val mor = readBack("mor").localCheckpoint() // before materialize
      graft.operators.DeletionVectors.materialize(s, out)
      mor.unionByName(readBack("cow"))
        .select("phase", "lang", "n_docs", "sum_chars", "max_id")
        .orderBy("phase", "lang")
    }),


    // ----- exact weighted quantiles (declarative, no driver state) ---
    "q274_weighted_quantile" -> ((s, dir) => {
      // per-language weighted median and p90 of document length under
      // integer multiplicities: the cumulative-weight window crossing,
      // integer arithmetic end to end (cumw·den >= num·W), one hash
      // exchange per quantile — the weighted ORDER STATISTIC the
      // histogram-refinement path doesn't cover, with no group cap
      val d = rd(s, dir, "documents").select(col("lang"),
        col("n_chars"), (col("doc_id") % 7 + 1).as("w"))
      def q(num: Long, den: Long, tag: String) =
        graft.operators.Stats.weightedQuantilePerGroup(
          d, "lang", "n_chars", "w", num, den)
          .withColumn("q", lit(tag))
      q(1, 2, "p50").unionByName(q(9, 10, "p90"))
        .select(col("lang"), col("q"), col("value"), col("total_weight"))
        .orderBy("lang", "q")
    }),


    // ----- z-order layout × zone-map pruning (2-D file skipping) -----
    "q273_zorder_zonemap_scan" -> ((s, dir) => {
      // documents Z-ORDER-clustered on (DocId, Chars) into 8 record
      // files: Morton interleaving makes every file's zone tight in
      // BOTH dimensions at once, so the sidecars prune a box predicate
      // on either column — the lakehouse OPTIMIZE-ZORDER story running
      // on this engine's own layout + stats stack (ZoneMapSpec pins the
      // open counts; here the oracle pins that the clustered write,
      // sidecars, and pruned read lose nothing). Quantization bounds
      // come from two driver scalars — yesterday's observed max at
      // 100 TB, exact here
      val out = scratchPath(dir, "q273_records")
      val docs = rd(s, dir, "documents").select(
        concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
          .as("_record_id"),
        col("doc_id").cast("double").as("DocId"),
        col("n_chars").cast("double").as("Chars"))
      val bounds = docs.agg(max(col("DocId")), max(col("Chars"))).head()
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      graft.operators.ZOrder.cluster(docs,
          Seq(("DocId", 0.0, bounds.getDouble(0) + 1.0),
            ("Chars", 0.0, bounds.getDouble(1) + 1.0)),
          bitsPerDim = 8, nFiles = 8)
        .write.format("graft-records").option("path", out)
        .mode("append").save()
      s.read.format("graft-records").option("path", out)
        .option("fieldTypes", "DocId:number,Chars:number")
        .load()
        .filter(col("DocId") >= 100 && col("DocId") < 220 &&
          col("Chars") >= 100 && col("Chars") < 300)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("Chars").cast("long")).as("sum_chars"),
          min(col("_record_id")).as("min_id"),
          max(col("_record_id")).as("max_id"))
    }),


    // ----- set ops: EXCEPT/symmetric difference (E1/E3) --------------
    "q11_set_ops" -> ((s, dir) => {
      val a = rd(s, dir, "orders").select(col("o_custkey").as("key")).distinct()
      val b = rd(s, dir, "customer").filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("key")).distinct()
      a.except(b).withColumn("side", lit("only_orders"))
        .unionByName(b.except(a).withColumn("side", lit("only_customers")))
        .orderBy("key", "side")
    }),


    // ----- latest-wins dedup (A3/W2) ---------------------------------
    "q12_dedup_latest" -> ((s, dir) => {
      Dedup.latestWins(rd(s, dir, "events"), "user_id", "ts", Some("event_id"))
        .select("user_id", "event_id", "event_type").orderBy("user_id")
    }),


    // ----- portable row checksum (A1/F6) -----------------------------
    "q13_row_checksum" -> ((s, dir) => {
      rd(s, dir, "customer")
        .select(col("c_custkey"), Checksums.portableRowChecksum(custCols).as("ck"))
        .orderBy("c_custkey")
    }),


    // ----- table checksum (A2) ---------------------------------------
    "q14_table_checksum" -> ((s, dir) => {
      Checksums.portableTableChecksum(rd(s, dir, "nation"), "n_nationkey",
        Seq("n_nationkey", "n_name", "n_regionkey"))
    }),


    // ----- scalar string functions (F1/F8/F13) -----------------------
    "q15_string_funcs" -> ((s, dir) => {
      rd(s, dir, "nation").select(
        col("n_nationkey"),
        upper(col("n_name")).as("u"),
        lower(col("n_name")).as("lo"),
        concat(upper(substring(col("n_name"), 1, 1)),
          lower(substring(col("n_name"), 2, 1000))).as("capped"),
        Normalize.cleanString(concat(lit("\t "), col("n_name"), lit("\t"))).as("cleaned"),
        lpad(col("n_name"), 12, ".").as("padded"),
        regexp_replace(col("n_name"), "[AEIOU]", "_").as("devoweled"),
        length(col("n_name")).cast("long").as("len"))
        .orderBy("n_nationkey")
    }),


    // ----- top-k (O1/O3) ---------------------------------------------
    "q16_topk" -> ((s, dir) => {
      rd(s, dir, "orders").select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(10)
    }),


    // ----- window analytics (W1 + lag) -------------------------------
    "q17_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      rd(s, dir, "orders").select(
        col("o_orderkey"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"),
        row_number().over(w).cast("long").as("seq"))
        .orderBy("o_orderkey")
    }),


    // ----- schema-union export projection (E4/S16) -------------------
    "q18_schema_union" -> ((s, dir) => {
      val c = rd(s, dir, "customer").select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("bal"), col("c_mktsegment").as("segment"),
        lit("customer").as("src_table"))
      val sup = rd(s, dir, "supplier").select(
        col("s_suppkey").as("id"), col("s_name").as("name"),
        col("s_acctbal").as("bal"), col("s_nationkey").as("nationkey"),
        lit("supplier").as("src_table"))
      Export.project(
        c.unionByName(sup, allowMissingColumns = true), Seq("src_table", "id"))
        .orderBy("src_table", "id")
    }),


    // ----- UPSERT_TABLE_CHECKSUM: snapshot + checksum short-circuit --
    "q19_table_snapshot" -> ((s, dir) => {
      val c1 = cfg(UpdateType.UpsertTableChecksum, 1L, "n_nationkey", "nation")
      val nation = rd(s, dir, "nation")
      val run1 = Strategies.upsertTableChecksum(nation, s.emptyDataFrame, c1)
      // second run with identical data: checksum short-circuit keeps run1
      Strategies.upsertTableChecksum(nation, run1, c1.copy(versionId = 2L))
        .select(col("doc_id"), col("update_type"), col("version_id"),
          col("latest"), size(col("table_data")).as("n_entries"))
    }),


    // ----- VERSIONED_TABLE_CHECKSUM: changed second run (SCD-2 snap) --
    "q20_versioned_snapshot" -> ((s, dir) => {
      val c1 = cfg(UpdateType.VersionedTableChecksum, 1L, "n_nationkey", "nation")
      val nation = rd(s, dir, "nation")
      val changed = nation.withColumn("n_name",
        when(col("n_nationkey") === 0, concat(col("n_name"), lit("_x")))
          .otherwise(col("n_name")))
      val run1 = Strategies.versionedTableChecksum(nation, s.emptyDataFrame, c1)
      Strategies.versionedTableChecksum(changed, run1, c1.copy(versionId = 2L))
        .select(col("version_id"), col("latest"), size(col("table_data")).as("n_entries"))
        .orderBy("version_id")
    }),


    // ----- hierarchical rollup aggregation ---------------------------
    "q33_rollup" -> ((s, dir) => {
      rd(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    }),


    // ----- exact percentile (interpolated median) --------------------
    "q34_percentile" -> ((s, dir) => {
      rd(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(r(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
          r(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"))
        .orderBy("o_orderstatus")
    }),


    // ----- replica divergence localization (Merkle bucket diff) ------
    "q223_replica_diff" -> ((s, dir) => {
      // the table checksum (q14) scaled into a REPAIR PLAN: source vs a
      // drifted replica (missing rows, a silent value corruption, extra
      // rows) fold into 256 order-insensitive bucket digests per side;
      // only diverged buckets surface, so an anti-entropy job rescans
      // ~n/256 rows per hit instead of the table. The oracle rebuilds
      // the same digests in SQL — a digest that misses any perturbation
      // class fails the gate.
      val src = rd(s, dir, "customer").select(custCols.map(col): _*)
      val tgt = src.filter(col("c_custkey") % 89 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 97 === 0, col("c_acctbal") + 1.0)
            .otherwise(col("c_acctbal")))
        .unionByName(src.filter(col("c_custkey") % 83 === 0)
          .withColumn("c_custkey", col("c_custkey") + 500000))
      Checksums.bucketDivergence(src, tgt, "c_custkey", custCols, nBuckets = 256)
    }),


    // ----- column encoding advisor (storage layout planning) ---------
    "q225_encoding_advisor" -> ((s, dir) => {
      // the q211/q212 advisor family applied to STORAGE: per column,
      // exact NDV and the dictionary-vs-plain call with its bit budget
      // — dictionary pays when the distinct set is small, and the
      // per-value index width is ceil(log2 ndv), computed EXACTLY as
      // length(bin(ndv-1)) so no libm log enters the gate. One
      // Expand-based aggregation pass computes every column's NDV
      // together, then the 1-ROW result folds to driver literals (the
      // q94 stats-sidecar discipline) and the per-column report is a
      // LocalRelation unpivot — the round-8 stack()-over-aggregate form
      // kept the whole Expand pass inside the report plan and re-paid it
      // at 7x the round-7 time; here the data pass runs exactly once.
      import s.implicits._
      val li = rd(s, dir, "lineitem")
      val cols = Seq("l_orderkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus")
      val row = li.agg(count(lit(1)).as("n"),
        cols.map(c => countDistinct(col(c)).as(s"d_$c")): _*).head()
      val n = row.getLong(0)
      cols.zipWithIndex.map { case (c, i) => (c, n, row.getLong(i + 1)) }
        .toDF("column_name", "n", "ndv")
        .select(col("column_name"), col("n"), col("ndv"),
          when(col("ndv") * 20 <= col("n"), lit("dictionary"))
            .otherwise(lit("plain")).as("advice"),
          when(col("ndv") < 2, lit(1))
            .otherwise(length(bin(col("ndv") - 1))).cast("long").as("dict_bits"))
        .orderBy("column_name")
    }),


    // ----- exact quantiles WITHOUT a global sort ---------------------
    "q221_exact_quantiles" -> ((s, dir) => {
      // p50/p90/p99 of 600k extendedprices by histogram refinement: one
      // min/max/count reduce, one 1024-bucket histogram, then ONE
      // pruned-bucket top-k per quantile (~n/1024 rows each) — no range
      // exchange ever ships the column, which is what makes the same
      // plan answer "exact p99 of 100 TB". DuckDB's quantile_disc (a
      // full sort) must agree on every value exactly.
      graft.operators.Stats.exactQuantiles(
        rd(s, dir, "lineitem"), "l_extendedprice", Seq(0.5, 0.9, 0.99))
        .orderBy("q")
    }),


    // ----- exact PER-GROUP quantiles, no global sort -----------------
    "q227_group_quantiles_exact" -> ((s, dir) => {
      // q221's histogram refinement generalized across groups with no
      // per-group driver loop: one stats pass, one (group, bucket)
      // histogram pass, then a single pruned scan + one window inside
      // each group's target bucket — "exact per-tenant p99" where q34's
      // percentile() sorts every group and q134's binned form is
      // approximate. DuckDB's per-group full-sort quantile_disc must
      // agree on every value.
      val ord = rd(s, dir, "orders")
      val p50 = graft.operators.Stats.exactQuantilesPerGroup(
        ord, "o_orderstatus", "o_totalprice", 0.5)
      val p90 = graft.operators.Stats.exactQuantilesPerGroup(
        ord, "o_orderstatus", "o_totalprice", 0.9)
      p50.unionByName(p90).orderBy("o_orderstatus", "q")
    }),


    // ----- schema-drift audit between record batches -----------------
    "q228_schema_drift" -> ((s, dir) => {
      // the reference DISCOVERS its schema from record payloads
      // (lib/AirtableDataFetcher.py:39-63); this is that discovery made
      // operational: two wire-format batches (yesterday's and today's),
      // field names discovered FROM THE DATA (no declared universe),
      // per-field observed type inferred from the values (all-integer →
      // bigint, else string), and the drift report — added / removed /
      // type_changed / stable. Today's batch turns `score` from a
      // number into a "NNpt" string (the silent breakage this audit
      // exists to catch), drops `legacy`, and adds `fresh`. Integer
      // detection is a regex, not a cast: DuckDB's try_cast ROUNDS
      // '1.5' to 2 while Spark nulls it — the one semantic the two
      // engines disagree on.
      val docs = rd(s, dir, "documents").select("doc_id", "n_chars")
      val batchA = docs.select(concat(lit("{\"id\":"), col("doc_id"),
        lit(",\"score\":"), col("n_chars"), lit(",\"tag\":\"s"),
        col("doc_id"), lit("\",\"legacy\":1}")).as("js"))
      val batchB = docs.select(concat(lit("{\"id\":"), col("doc_id"),
        lit(",\"score\":\""), col("n_chars"), lit("pt\",\"tag\":\"s"),
        col("doc_id"), lit("\",\"fresh\":"), col("doc_id") % 7,
        lit("}")).as("js"))
      def profile(df: DataFrame, nCol: String, tCol: String): DataFrame = df
        .select(explode(from_json(col("js"), "map<string,string>",
          Map.empty[String, String])).as(Seq("field", "v")))
        .groupBy("field")
        .agg(count(lit(1)).as(nCol),
          when(min(when(col("v").rlike("^-?[0-9]+$"), 1).otherwise(0)) === 1,
            lit("bigint")).otherwise(lit("string")).as(tCol))
      profile(batchA, "n_a", "type_a")
        .join(profile(batchB, "n_b", "type_b"), Seq("field"), "full")
        .select(col("field"),
          coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"),
          col("type_a"), col("type_b"),
          when(col("n_a").isNull, lit("added"))
            .when(col("n_b").isNull, lit("removed"))
            .when(col("type_a") =!= col("type_b"), lit("type_changed"))
            .otherwise(lit("stable")).as("status"))
        .orderBy("field")
    }),


    // ----- A/B experiment readout (deterministic assignment) ---------
    "q231_ab_readout" -> ((s, dir) => {
      // the experimentation primitive: customers land in arm A or B by
      // a salted md5 coin (deterministic — re-running the readout can
      // never reshuffle arms), per-customer spend aggregates once, and
      // the readout is arm sizes, DECIMAL-exact means, population
      // variances, the lift, and its z-statistic. Everything up to the
      // final sqrt/divide is exact decimal arithmetic; sqrt and divide
      // are correctly-rounded IEEE, identical in any engine, and the
      // result snaps to the 1e-6 lattice.
      val spend = rd(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("spend"))
        .withColumn("arm",
          when(substring(md5(concat(lit("exp42:"),
            col("o_custkey").cast("string"))), 1, 1) < "8", lit("A"))
            .otherwise(lit("B")))
      def m(a: String, c: Column) = sum(when(col("arm") === a, c).otherwise(lit(0)))
      val agg = spend.agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        m("A", col("spend").cast("decimal(28,6)")).cast("double").as("s1_a"),
        m("B", col("spend").cast("decimal(28,6)")).cast("double").as("s1_b"),
        m("A", (col("spend") * col("spend")).cast("decimal(38,6)"))
          .cast("double").as("s2_a"),
        m("B", (col("spend") * col("spend")).cast("decimal(38,6)"))
          .cast("double").as("s2_b"))
      val meanA = col("s1_a") / col("n_a")
      val meanB = col("s1_b") / col("n_b")
      val varA = (col("s2_a") - col("s1_a") * col("s1_a") / col("n_a")) / col("n_a")
      val varB = (col("s2_b") - col("s1_b") * col("s1_b") / col("n_b")) / col("n_b")
      agg.select(col("n_a"), col("n_b"),
        r(meanA, 6).as("mean_a"), r(meanB, 6).as("mean_b"),
        r(meanB - meanA, 6).as("lift"),
        r((meanB - meanA) / sqrt(varA / col("n_a") + varB / col("n_b")), 6)
          .as("z"))
    }),


    // ----- corpus concentration report -------------------------------
    "q236_concentration" -> ((s, dir) => {
      // how top-heavy is the corpus? — the share of total characters
      // held by documents above the exact p50/p90/p99 length
      // thresholds, plus the doc counts above each. Thresholds come
      // from the no-sort histogram quantiles (q221's machinery);
      // everything after is one conditional-aggregation pass with
      // decimal-exact sums. The report that decides whether a handful
      // of giant documents dominate training mass.
      val docs = rd(s, dir, "documents").select(col("n_chars"))
      val qs = graft.operators.Stats.exactQuantiles(docs, "n_chars",
        Seq(0.5, 0.9, 0.99)).collect()
        .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val total = docs.agg(sum(col("n_chars").cast("decimal(28,0)"))
        .cast("double").as("t")).head().getDouble(0)
      def share(q: Double) = {
        val thr = qs(q)
        docs.filter(col("n_chars") > thr)
          .agg(count(lit(1)).as("n_above"),
            sum(col("n_chars").cast("decimal(28,0)")).cast("double").as("c"))
          .select(lit(q).as("q"), lit(thr).cast("long").as("threshold"),
            coalesce(col("n_above"), lit(0L)).as("n_above"),
            r(coalesce(col("c"), lit(0.0)) / lit(total), 6).as("char_share"))
      }
      share(0.5).unionByName(share(0.9)).unionByName(share(0.99))
        .orderBy("q")
    }),


    // ----- cube aggregation ------------------------------------------
    "q37_cube" -> ((s, dir) => {
      rd(s, dir, "customer")
        .cube(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
        .orderBy(col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first)
    }),


    // ----- edit-distance verification (another near-dup verifier) ----
    "q38_edit_distance" -> ((s, dir) => {
      val n = rd(s, dir, "nation").select(col("n_nationkey").as("ka"), col("n_name").as("na"))
      val m = rd(s, dir, "nation").select(col("n_nationkey").as("kb"), col("n_name").as("nb"))
      n.join(m, col("ka") < col("kb"))
        .select(col("ka"), col("kb"), levenshtein(col("na"), col("nb")).as("dist"))
        .filter(col("dist") <= 4)
        .orderBy("ka", "kb")
    }),


    // ----- ranking window suite --------------------------------------
    "q39_rank_suite" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      rd(s, dir, "orders").select(
        col("o_orderkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"))
        .filter(col("rnk") <= 100)
        .orderBy("o_orderkey")
    }),


    // ----- datetime function breadth ---------------------------------
    "q40_datetime_funcs" -> ((s, dir) => {
      rd(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
        unix_timestamp(date_trunc("month", col("o_orderdate"))).as("month_start_epoch"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_98"))
        .orderBy("o_orderkey").limit(5000)
    }),


    // ----- lenient non-ISO datetime breadth (F2 widened) -------------
    "q257_lenient_dates" -> ((s, dir) => {
      // five wire shapes built deterministically from o_orderdate (ISO,
      // RFC-1123, US slash datetime, "dd MMM yyyy", "MMM d, yyyy"),
      // parsed back through the widened lenientTimestamp: per-shape
      // parse counts plus min/max round-tripped values prove each
      // format branch fires AND lands on the exact instant. Shape 5 is
      // the bare-number hazard (dateutil's parse("5") succeeds —
      // lib/DataProcessor.py:135-140): it must stay entirely NULL.
      val o = rd(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
        .withColumn("shape", (col("o_orderkey") % 6).cast("long"))
      val d = col("o_orderdate")
      val wire = when(col("shape") === 0, date_format(d, "yyyy-MM-dd"))
        .when(col("shape") === 1,
          concat(date_format(d, "EEE, dd MMM yyyy"), lit(" 10:30:00 GMT")))
        .when(col("shape") === 2,
          concat(date_format(d, "MM/dd/yyyy"), lit(" 08:15:00")))
        .when(col("shape") === 3, date_format(d, "dd MMM yyyy"))
        .when(col("shape") === 4, date_format(d, "MMM d, yyyy"))
        .otherwise(col("o_orderkey").cast("string"))
      o.select(col("shape"),
          graft.functions.Normalize.lenientTimestamp(wire).as("ts"))
        .groupBy("shape")
        .agg(count(lit(1)).as("n"),
          count(col("ts")).as("n_parsed"),
          min(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("min_ts"),
          max(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("max_ts"))
        .orderBy("shape")
    }),


    // ----- batch atomic write: heterogeneous actions in one commit ---
    "q42_batch_actions" -> ((s, dir) => {
      val path = scratchPath(dir, "q42_state")
      val store = new graft.state.StateStore(s, path)
      store.truncate()
      store.overwrite(custState(s, dir))
      // create: new ids above the key space; update: partial acctbal merge
      // on %13 keys; delete: %19 keys
      val creates = rd(s, dir, "customer").filter(col("c_custkey") % 23 === 0)
        .select((col("c_custkey") + 100000).as("c_custkey"), col("c_name"),
          col("c_acctbal"), col("c_mktsegment"), col("c_nationkey"))
        .withColumn("_action", lit("create"))
      val updates = rd(s, dir, "customer").filter(col("c_custkey") % 13 === 0)
        .select(col("c_custkey"), lit(null).cast("string").as("c_name"),
          (col("c_acctbal") + lit(50.0)).as("c_acctbal"),
          lit(null).cast("string").as("c_mktsegment"),
          lit(null).cast("int").as("c_nationkey"))
        .withColumn("_action", lit("update"))
      val deletes = rd(s, dir, "customer").filter(col("c_custkey") % 19 === 0)
        .select(col("c_custkey"), lit(null).cast("string").as("c_name"),
          lit(null).cast("double").as("c_acctbal"),
          lit(null).cast("string").as("c_mktsegment"),
          lit(null).cast("int").as("c_nationkey"))
        .withColumn("_action", lit("delete"))
      store.applyActions(creates.unionByName(updates).unionByName(deletes), "c_custkey")
      store.load().select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey")
    }),


    // ----- correlated subquery (Catalyst decorrelation) via spark.sql -
    "q43_correlated_subquery" -> ((s, dir) => {
      rd(s, dir, "orders").createOrReplaceTempView("orders_v")
      // orders priced above their customer's average: the correlated
      // scalar subquery decorrelates to an aggregate + join
      s.sql(
        """SELECT o_orderkey,
          |  CAST(o_totalprice AS DOUBLE) AS price
          |FROM orders_v o
          |WHERE o_totalprice > 1.5 * (
          |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) /
          |         CAST(COUNT(*) AS DOUBLE)
          |  FROM orders_v i WHERE i.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),


    // ----- INTERSECT set operation -----------------------------------
    "q44_intersect" -> ((s, dir) => {
      val big = rd(s, dir, "orders").filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("key"))
      val urgent = rd(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("key"))
      big.intersect(urgent).orderBy("key")
    }),


    // ----- wide pivot ------------------------------------------------
    "q45_pivot" -> ((s, dir) => {
      rd(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority")
    }),


    // ----- explicit grouping sets + grouping_id ----------------------
    "q51_grouping_sets" -> ((s, dir) => {
      rd(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderpriority, o_orderstatus,
          |  CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
          |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
    }),


    // ----- unpivot (inverse of q45's pivot) --------------------------
    "q52_unpivot" -> ((s, dir) => {
      rd(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal").as("acctbal"),
          col("c_nationkey").cast("double").as("nationkey"))
        .unpivot(Array(col("c_custkey")), Array(col("acctbal"), col("nationkey")),
          "measure", "value")
        .orderBy("c_custkey", "measure")
    }),


    // ----- as-of join (composed: union + running last, one shuffle) --
    "q54_asof_join" -> ((s, dir) => {
      val ev = rd(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts") // unique per (key, ts): as-of contract
        .agg(max(col("value").cast("decimal(18,4)")).cast("double").as("click_value"))
      graft.operators.AsofJoin.backward(
        purchases, clicks, "user_id", "ts", "ts", Seq("click_value"))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("purchase_epoch"),
          r(col("value"), 4).as("purchase_value"),
          unix_timestamp(col("asof_ts")).as("click_epoch"),
          r(col("click_value"), 4).as("click_value"))
        .orderBy("event_id")
    }),


    // ----- optimizer-rule rewrite: COUNT(DISTINCT) -> bitmap ---------
    "q263_bitmap_count_distinct" -> ((s, dir) => {
      // two integral distinct counts + mixed plain aggregates: exactly
      // the shape Catalyst plans as an Expand (every row duplicated per
      // aggregate group) with a doubled keyed shuffle. The injected
      // optimizer rule (plans/RewriteCountDistinctBitmap, ON in every
      // engine session) rewrites both to mergeable bitmap aggregates —
      // one partial-aggregated pass, one exchange — and this gate holds
      // the rewritten plan to DuckDB's exact COUNT(DISTINCT). The
      // string distinct stays Spark-planned (scope guard), proving the
      // two plannings compose in one Aggregate
      rd(s, dir, "orders").groupBy(col("o_orderpriority").as("priority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderkey") % 1000).as("n_okmod"),
          countDistinct(col("o_orderstatus")).as("n_status"),
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy("priority")
    }),


    // ----- NATIVE as-of join: custom LogicalPlan/Strategy/SparkPlan --
    "q260_asof_native" -> ((s, dir) => {
      // the same fixture and oracle shape as q54, but through the
      // whole-operator extension stack (graft.plans.AsofJoinNative:
      // AsofJoinPlan -> AsofJoinStrategy -> AsofJoinExec, registered by
      // GraftExtensions.injectPlannerStrategy) — one co-partitioned
      // forward merge instead of q54's union + running-last window.
      // Agreement with DuckDB's ASOF LEFT JOIN gates the exec's merge
      // loop (equal-ts match, null-key/ts exclusions, left-outer nulls)
      // through Catalyst's planner rather than around it
      val ev = rd(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts") // unique per (key, ts): as-of contract
        .agg(max(col("value").cast("decimal(18,4)")).cast("double").as("click_value"))
      graft.plans.AsofJoinNative.backward(
        purchases, clicks, "user_id", "ts", "ts", Seq("click_value"))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("purchase_epoch"),
          r(col("value"), 4).as("purchase_value"),
          unix_timestamp(col("asof_ts")).as("click_epoch"),
          r(col("click_value"), 4).as("click_value"))
        .orderBy("event_id")
    }),


    // ----- FORWARD as-of through the native exec ---------------------
    "q265_asof_forward" -> ((s, dir) => {
      // the mirrored direction: for each purchase, the EARLIEST click
      // at-or-after it — the native exec's forward merge (no candidate
      // buffering: the lookahead right row is the match) against
      // DuckDB's ASOF LEFT JOIN with l.ts <= r.ts
      val ev = rd(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg(max(col("value").cast("decimal(18,4)")).cast("double").as("click_value"))
      graft.plans.AsofJoinNative.forward(
        purchases, clicks, "user_id", "ts", "ts", Seq("click_value"))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("purchase_epoch"),
          r(col("value"), 4).as("purchase_value"),
          unix_timestamp(col("asof_ts")).as("click_epoch"),
          r(col("click_value"), 4).as("click_value"))
        .orderBy("event_id")
    }),


    // ----- range join (binned interval join, no nested loop) ---------
    "q55_range_join" -> ((s, dir) => {
      val ev = rd(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("value").as("cv"))
      graft.operators.RangeJoin.byKeyAndWindow(
        p, c, "user_id", "ts", "cts", beforeSec = 1800, afterSec = 0)
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("cv").cast("decimal(18,4)")).cast("double").as("click_value_sum"))
        .orderBy("event_id")
    }),

  )

  val oracleSql: Map[String, String] = Map(

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-07-01'
        |  AND l_discount > 0.03
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,


    "q03_join_agg" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "q04_diff_classify" -> (custCtes +
      s"""
        |SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN t.c_custkey IS NULL THEN 'insert'
        |       WHEN s.c_custkey IS NULL THEN 'delete'
        |       WHEN $anyColChanged THEN 'update'
        |       ELSE 'unchanged' END AS action
        |FROM src s FULL OUTER JOIN state t ON s.c_custkey = t.c_custkey
        |ORDER BY 1""".stripMargin),


    "q05_upsert" -> (custCtes +
      s"""
        |SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
        |  CASE WHEN s.c_custkey IS NOT NULL AND (t.c_custkey IS NULL OR $anyColChanged)
        |       THEN CAST(2 AS BIGINT) ELSE CAST(NULL AS BIGINT) END AS version_id
        |FROM src s FULL OUTER JOIN state t ON s.c_custkey = t.c_custkey
        |ORDER BY 1""".stripMargin),


    "q06_upsert_delete" -> (custCtes +
      s"""
        |SELECT s.c_custkey, s.c_name, s.c_acctbal, s.c_mktsegment, s.c_nationkey,
        |  CASE WHEN t.c_custkey IS NULL OR $anyColChanged
        |       THEN CAST(2 AS BIGINT) ELSE CAST(NULL AS BIGINT) END AS version_id
        |FROM src s LEFT OUTER JOIN state t ON s.c_custkey = t.c_custkey
        |ORDER BY 1""".stripMargin),


    "q07_soft_delete" -> (custCtes +
      s"""
        |SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        |  CASE WHEN s.c_custkey IS NOT NULL AND (t.c_custkey IS NULL OR $anyColChanged)
        |         THEN false
        |       WHEN s.c_custkey IS NULL THEN true
        |       ELSE CAST(NULL AS BOOLEAN) END AS is_deleted
        |FROM src s FULL OUTER JOIN state t ON s.c_custkey = t.c_custkey
        |ORDER BY 1""".stripMargin),


    "q08_versioned_checksum" -> (custCtes.replace("WITH state AS", "WITH s1 AS")
      .replace("src AS", "s2 AS") +
      """,
        |chg AS (SELECT s2.c_custkey FROM s2 JOIN s1 USING (c_custkey)
        |        WHERE s2.c_acctbal IS DISTINCT FROM s1.c_acctbal)
        |SELECT c_custkey, CAST(1 AS BIGINT) AS version_id,
        |  c_custkey NOT IN (SELECT c_custkey FROM chg) AS latest, c_acctbal
        |FROM s1
        |UNION ALL
        |SELECT c_custkey, CAST(2 AS BIGINT), true, c_acctbal
        |FROM s2 WHERE c_custkey IN (SELECT c_custkey FROM chg)
        |   OR c_custkey NOT IN (SELECT c_custkey FROM s1)
        |ORDER BY c_custkey, version_id""".stripMargin),


    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        |ORDER BY c_custkey""".stripMargin,


    "q101_nullsafe_join" ->
      """WITH o AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
        |  FROM orders),
        |c AS (SELECT
        |  CASE WHEN c_custkey % 89 = 0 THEN NULL ELSE c_custkey END AS ck,
        |  c_custkey FROM customer)
        |SELECT o.k IS NULL AS null_key, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT c.c_custkey) AS n_cust
        |FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.ck
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q102_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,


    "q103_rank_extras" ->
      """WITH t AS (SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity
        |  FROM lineitem WHERE l_orderkey % 50 = 0)
        |SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(l_quantity, 2) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_qty
        |FROM t
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_quantity, l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""".stripMargin,


    "q104_csv_roundtrip" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  MAX(o_orderdate) AS max_date
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,


    "q105_jsonl_roundtrip" ->
      """SELECT source, COUNT(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,


    // identical running-total group arithmetic over the same derived
    // per-day inventory
    "q244_compaction_plan" ->
      """WITH inv AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |  CAST(sum(32 + length(event_type) + length(coalesce(props, '')))
        |    AS BIGINT) AS bytes
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |c AS (SELECT day, bytes,
        |  sum(bytes) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM inv),
        |g AS (SELECT day, bytes,
        |  CAST(floor(CAST(cum - bytes AS DOUBLE) / 40000.0) AS BIGINT) AS grp
        |  FROM c)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_inputs,
        |  CAST(sum(bytes) AS BIGINT) AS group_bytes,
        |  min(day) AS day_min, max(day) AS day_max
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q201_storage_audit" ->
      """SELECT 'region' AS tbl, (SELECT count(*) FROM region) AS n_rows,
        |  (SELECT count(*) FROM pragma_table_info('region')) AS n_cols
        |UNION ALL
        |SELECT 'nation', (SELECT count(*) FROM nation),
        |  (SELECT count(*) FROM pragma_table_info('nation'))
        |UNION ALL
        |SELECT 'customer', (SELECT count(*) FROM customer),
        |  (SELECT count(*) FROM pragma_table_info('customer'))
        |UNION ALL
        |SELECT 'supplier', (SELECT count(*) FROM supplier),
        |  (SELECT count(*) FROM pragma_table_info('supplier'))
        |UNION ALL
        |SELECT 'part', (SELECT count(*) FROM part),
        |  (SELECT count(*) FROM pragma_table_info('part'))
        |UNION ALL
        |SELECT 'orders', (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM pragma_table_info('orders'))
        |UNION ALL
        |SELECT 'lineitem', (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM pragma_table_info('lineitem'))
        |UNION ALL
        |SELECT 'events', (SELECT count(*) FROM events),
        |  (SELECT count(*) FROM pragma_table_info('events'))
        |UNION ALL
        |SELECT 'documents', (SELECT count(*) FROM documents),
        |  (SELECT count(*) FROM pragma_table_info('documents'))
        |UNION ALL
        |SELECT 'embeddings', (SELECT count(*) FROM embeddings),
        |  (SELECT count(*) FROM pragma_table_info('embeddings'))
        |ORDER BY tbl""".stripMargin,

    "q129_orc_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS sum_value,
        |  CAST(floor(epoch(MAX(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS max_sec
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle only ever sees the source table: content must survive
    // the write-containers/read-containers chain exactly, nulls included
    "q281_avro_roundtrip" ->
      """SELECT CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN doc_id ELSE 0 END) AS BIGINT)
        |    AS flagged_id_sum
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,


    "q110_dsv2_source" ->
      """SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars > 300
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q112_dsv2_write" ->
      """SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MAX('doc' || CAST(doc_id AS VARCHAR)) AS max_id
        |FROM documents WHERE n_chars <= 300
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q274_weighted_quantile" ->
      """WITH d AS (SELECT lang, CAST(n_chars AS DOUBLE) AS v,
        |    doc_id % 7 + 1 AS w FROM documents),
        |c AS (SELECT lang, v, w,
        |    SUM(w) OVER (PARTITION BY lang ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    SUM(w) OVER (PARTITION BY lang) AS tot
        |  FROM d),
        |pick AS (
        |  SELECT lang, 'p50' AS q, MIN(v) AS value,
        |    CAST(MAX(tot) AS BIGINT) AS total_weight
        |  FROM c WHERE cumw * 2 >= 1 * tot GROUP BY lang
        |  UNION ALL
        |  SELECT lang, 'p90' AS q, MIN(v) AS value,
        |    CAST(MAX(tot) AS BIGINT) AS total_weight
        |  FROM c WHERE cumw * 10 >= 9 * tot GROUP BY lang)
        |SELECT lang, q, value, total_weight
        |FROM pick ORDER BY lang, q""".stripMargin,


    "q273_zorder_zonemap_scan" ->
      """SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN('d' || lpad(CAST(doc_id AS VARCHAR), 6, '0')) AS min_id,
        |  MAX('d' || lpad(CAST(doc_id AS VARCHAR), 6, '0')) AS max_id
        |FROM documents
        |WHERE doc_id >= 100 AND doc_id < 220
        |  AND n_chars >= 100 AND n_chars < 300""".stripMargin,


    "q268_record_compaction" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MAX('d' || lpad(CAST(doc_id AS VARCHAR), 6, '0')) AS max_id
        |FROM documents
        |WHERE doc_id >= 50 AND doc_id < 300
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // the oracle sees only the survivor predicate; the byte-level
    // absence requirement is enforced inside the gate itself
    "q287_gdpr_purge" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |WHERE NOT (c_custkey % 13 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // the oracle joins the NET final sides: all orders except the
    // retracted (%3=0 AND %7=0) tranche, all customers except %5=0
    "q286_join_ivm" ->
      """WITH l AS (SELECT o_custkey AS k, o_totalprice AS price
        |  FROM orders
        |  WHERE NOT (o_orderkey % 3 = 0 AND o_orderkey % 7 = 0)),
        |r AS (SELECT c_custkey AS k, c_mktsegment AS seg
        |  FROM customer WHERE NOT (c_custkey % 5 = 0))
        |SELECT r.seg AS segment, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l.price AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        |FROM l JOIN r ON l.k = r.k
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // the phase split recomputed directly: even doc_ids predate the
    // column (NULL quality), odd ones carry doc_id % 5
    // the oracle recomputes the final state from the mutation ordering;
    // the engine must get there through three watermark-windowed
    // incremental refreshes of the persisted view
    "q295_lake_view" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE doc_id % 3 = 2 OR NOT coalesce(n_chars < 200, FALSE))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,

    // same mutation ordering as q295; the engine must additionally keep
    // min/max right through a delete that removes each group's minimum
    // (touched-group recompute, not additive folding)
    "q296_lake_view_minmax" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE doc_id % 3 = 2 OR NOT coalesce(n_chars < 200, FALSE))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the final JOIN from the predicates; the
    // engine gets there through three incremental refreshes of a
    // persisted Z-relation (left append, right delete-with-retraction)
    "q297_lake_view_join" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE NOT (c_custkey % 5 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the final aggregates; the engine gets there
    // through the SQL-only view surface (create_lake_view /
    // refresh_lake_view / lake_view) and internally gates byte-equality
    // against a Scala-API twin advanced over the same commits
    "q302_sql_lake_view_agg" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE doc_id % 3 = 2 OR NOT coalesce(n_chars < 200, FALSE)),
        |v2 AS (SELECT * FROM base
        |  WHERE doc_id % 3 < 2 AND NOT coalesce(n_chars < 200, FALSE)),
        |agg_live AS (SELECT 'zlive' AS phase, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |    CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |    CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |  FROM live GROUP BY 2),
        |agg_v2 AS (SELECT 'v2', lang, COUNT(*),
        |    CAST(SUM(n_chars) AS BIGINT),
        |    CAST(MIN(n_chars) AS BIGINT),
        |    CAST(MAX(n_chars) AS BIGINT)
        |  FROM v2 GROUP BY 2)
        |SELECT * FROM agg_live UNION ALL SELECT * FROM agg_v2
        |ORDER BY 1, 2""".stripMargin,

    // the oracle recomputes the final join+rollup; the engine's SQL
    // surface reaches it through three incremental refreshes of a
    // COMPOSED view (join Z-relation + chained per-segment aggregate
    // fold), windows gated in-run, readout from the maintained
    // aggregate state (never a Z-relation scan)
    "q303_sql_lake_view_join" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE NOT (c_custkey % 5 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the filtered join + derived-column rollup
    // from the predicates; the engine maintains it as a composed view
    // (per-side filtered bilinear folds chained into a decimal
    // aggregate fold with extrema), gated fold ≡ recompute in-run
    "q309_lake_view_composed" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price,
        |  CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(19,2))) AS DOUBLE)
        |    AS sum_dbl,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice >= 10000
        |  AND c_mktsegment <> 'BUILDING'
        |  AND NOT (c_custkey % 5 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the two-level rollup from the predicates;
    // the engine maintains it as a view OVER a view — the outer
    // aggregate consumes the inner view's generation feed (pointer
    // diff), never rescanning either level
    "q313_lake_view_over_view" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE doc_id % 3 = 2 OR NOT coalesce(n_chars < 200, FALSE)),
        |per_doc AS (SELECT lang, doc_id, COUNT(*) AS n,
        |  SUM(n_chars) AS s FROM live GROUP BY 1, 2)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(s) AS BIGINT) AS sum_chars
        |FROM per_doc GROUP BY 1 ORDER BY lang""".stripMargin,

    // the oracle recomputes the per-customer rollup joined to the
    // dimension from the predicates; the engine maintains it as a JOIN
    // OF TWO MAINTAINED VIEWS folding both sides' generation feeds
    "q314_lake_view_join_of_views" ->
      """WITH per_cust AS (SELECT o_custkey AS ck, COUNT(*) AS n,
        |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
        |  FROM orders GROUP BY 1)
        |SELECT c_mktsegment AS segment, COUNT(*) AS n_cust,
        |  CAST(SUM(n) AS BIGINT) AS n_orders,
        |  CAST(SUM(sp) AS DOUBLE) AS total_price
        |FROM per_cust JOIN customer ON ck = c_custkey
        |WHERE NOT (c_custkey % 5 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes COUNT(DISTINCT) per group; the engine
    // maintains it exactly in the view state via touched-group
    // recompute (the extrema discipline — deletes are non-invertible)
    "q315_lake_view_distinct" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE doc_id % 3 = 2 OR NOT coalesce(n_chars < 200, FALSE))
        |SELECT lang, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT n_chars) AS dc_chars,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM live GROUP BY 1 ORDER BY lang""".stripMargin,

    // the oracle recomputes the view's state at BOTH generations from
    // the predicates and diffs them (EXCEPT both ways, signed); the
    // engine serves the same rows from the generation-pointer diff —
    // the SQL change feed one level up from table_changes
    "q316_view_changes_sql" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |s1 AS (SELECT lang, COUNT(*) AS n,
        |    CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
        |  FROM base WHERE doc_id % 3 < 2 GROUP BY 1),
        |live AS (SELECT * FROM base
        |  WHERE doc_id % 3 = 2 OR NOT coalesce(n_chars < 200, FALSE)),
        |s2 AS (SELECT lang, COUNT(*) AS n,
        |    CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
        |  FROM live GROUP BY 1)
        |SELECT lang, n AS n_docs, sum_chars, CAST(1 AS BIGINT) AS m
        |  FROM (SELECT * FROM s2 EXCEPT SELECT * FROM s1)
        |UNION ALL
        |SELECT lang, n AS n_docs, sum_chars, CAST(-1 AS BIGINT) AS m
        |  FROM (SELECT * FROM s1 EXCEPT SELECT * FROM s2)
        |ORDER BY lang, m""".stripMargin,

    // the oracle recomputes the two-level rollup from the predicates;
    // the engine maintains the outer level OVER the composed
    // ('join_aggregate') view's generation feed — a composed kind as a
    // first-class feed source
    "q317_composed_view_as_source" ->
      """WITH per AS (SELECT c_mktsegment AS seg, o_custkey AS ck,
        |    COUNT(*) AS n,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE NOT (c_custkey % 5 = 0) GROUP BY 1, 2)
        |SELECT seg AS segment, COUNT(*) AS n_cust,
        |  CAST(SUM(n) AS BIGINT) AS n_orders,
        |  CAST(SUM(sp) AS DOUBLE) AS total_price
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes COUNT(DISTINCT) per group; the engine
    // maintains it with NO rescan as a chain of two additive views
    // (value-level multiplicities, then a count over that level's ±1
    // generation feed)
    "q318_distinct_count_chain" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE doc_id % 3 = 2 OR NOT coalesce(n_chars < 200, FALSE))
        |SELECT lang, COUNT(DISTINCT n_chars) AS dc_chars
        |FROM live GROUP BY 1 ORDER BY lang""".stripMargin,

    // the oracle recomputes distinct customers-with-orders per segment
    // from the predicates; the engine maintains it as a chain over the
    // join view's Z-relation feed — liveness transitions arrive as ±1s
    "q319_distinct_over_join_view" ->
      """SELECT c_mktsegment AS segment,
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 4 = 0
        |  AND NOT (o_orderkey % 7 = 0) AND NOT (c_custkey % 5 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the bin counts from the predicates; the
    // engine maintains them additively in the view state (invertible
    // under deletes — the emptied bins decrement, no rescan)
    "q321_lake_view_histogram" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE doc_id % 3 = 2 OR NOT coalesce(n_chars < 500, FALSE)),
        |b AS (SELECT lang,
        |    CASE WHEN n_chars < 0 THEN 0 WHEN n_chars >= 4000 THEN 9
        |      ELSE CAST(floor(n_chars / 500.0) AS INT) + 1 END AS bin
        |  FROM live WHERE n_chars IS NOT NULL),
        |counts AS (SELECT lang, CAST(bin AS BIGINT) AS bin,
        |    COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        |-- the deterministic bin-midpoint median the engine's
        |-- hist_quantile computes from the same stored counts
        |ranked AS (SELECT lang, bin, cnt,
        |    SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
        |    SUM(cnt) OVER (PARTITION BY lang) AS total FROM counts),
        |med AS (SELECT lang, MIN(bin) AS mbin FROM ranked
        |  WHERE cum >= CAST(ceil(0.5 * total) AS BIGINT) GROUP BY lang)
        |SELECT c.lang, c.bin, c.cnt,
        |  CASE WHEN m.mbin = 0 THEN 0.0 WHEN m.mbin = 9 THEN 4000.0
        |    ELSE (CAST(m.mbin AS DOUBLE) - 0.5) * 500.0 END AS p50_est
        |FROM counts c JOIN med m ON c.lang = m.lang
        |ORDER BY c.lang, c.bin""".stripMargin,

    // the oracle recomputes the per-group top-k distinct values with a
    // window over the distinct set; the engine maintains them in the
    // view state via the bounded-heap rescan (extrema discipline)
    "q320_lake_view_topk" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE doc_id % 3 = 2 OR NOT coalesce(n_chars >= 2000, FALSE)),
        |dv AS (SELECT DISTINCT lang, n_chars FROM live
        |  WHERE n_chars IS NOT NULL),
        |r AS (SELECT lang, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC)
        |      AS rk FROM dv)
        |SELECT lang, CAST(rk AS BIGINT) AS rk,
        |  CAST(n_chars AS BIGINT) AS chars
        |FROM r WHERE rk <= 3 ORDER BY lang, rk""".stripMargin,

    // the oracle recomputes the 3-way star join from the predicates;
    // the engine maintains it as two chained bilinear folds (the root
    // consuming the maintained inner pair's delta), with middle- and
    // last-table retractions flowing through both joins
    "q312_lake_view_join3" ->
      """SELECT n_name AS nation, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT (c_custkey % 7 = 0) AND NOT (n_nationkey % 5 = 2)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the probed groups; the engine serves them
    // by bucket-pruned point reads of the maintained state (inputFiles
    // pruning + full-read equivalence gated in-run)
    "q311_lake_view_lookup" ->
      """WITH live AS (SELECT doc_id, n_chars FROM documents
        |  WHERE NOT coalesce(n_chars < 200, FALSE))
        |SELECT doc_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM live WHERE doc_id IN (5, 8, 13)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the derived-column aggregates; the engine
    // maintains them through a SumSpec expression persisted in the
    // view's fold rules (linearity makes any row-level expression fold
    // exactly like a plain column)
    "q310_lake_view_expr" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE doc_id % 3 = 2 OR NOT coalesce(n_chars < 200, FALSE))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(n_chars * doc_id) AS BIGINT) AS wsum
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the grouped sums; the engine's plan is
    // run-gated to have PUSHED them (in-reader sum partials + AVG via
    // Spark's sum/count decomposition), integer-domain so the partial
    // merge is IEEE-exact across engines
    "q304_sum_pushdown" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS avg_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the filtered aggregates from the view
    // predicate + both delete predicates; the engine maintains them
    // through filtered signed-delta folds (zero-group middle refresh
    // gated in-run) and a filter-aware extrema recompute
    "q307_lake_view_filtered" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE n_chars >= 300 AND NOT coalesce(n_chars >= 800, FALSE))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the filtered join from the predicates; the
    // engine maintains its Z-relation through per-side filtered deltas
    // (excluded-row churn gated to fold zero rows in-run)
    "q308_lake_view_join_filtered" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice >= 10000
        |  AND c_mktsegment <> 'BUILDING'
        |  AND NOT (c_custkey % 5 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the final state from the two delete
    // predicates; the engine gets there through SQL-driven maintenance
    // (DV materialize, compaction, snapshot expiry, vacuum) whose
    // layout effects are gated in-run — maintenance must never change
    // what the table says
    "q305_sql_lake_maintenance" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE NOT coalesce(n_chars < 200, FALSE)
        |    AND NOT (doc_id % 10 = 7))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes the final state; the engine reaches it by a
    // COALESCED change-feed replay (3 micro-batches over 8 commits) and
    // internally gates coalesced == per-version netting
    "q298_cdc_paced_replay" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE NOT coalesce(n_chars < 200, FALSE)
        |    AND NOT (doc_id % 10 = 7))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes both phases; the engine's PRE phase answers
    // from footer statistics alone and the POST phase decode-folds
    // around the deletion vector
    "q300_parquet_agg_stats" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents),
        |pre AS (SELECT 'pre' AS phase, COUNT(*) AS n_docs,
        |    COUNT(lang) AS n_lang,
        |    CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |    CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        |    CAST(MAX(doc_id) AS BIGINT) AS max_id
        |  FROM base),
        |post AS (SELECT 'zpost' AS phase, COUNT(*), COUNT(lang),
        |    CAST(MIN(n_chars) AS BIGINT), CAST(MAX(n_chars) AS BIGINT),
        |    CAST(MAX(doc_id) AS BIGINT)
        |  FROM base WHERE NOT coalesce(n_chars < 200, FALSE))
        |SELECT * FROM pre UNION ALL SELECT * FROM post
        |ORDER BY 1""".stripMargin,

    // both TVF windows recomputed from the predicates: the bootstrap
    // window is the insert wave (+1 per live-at-v1 row), the delete
    // window is pure retraction (−1 per DV-diff row)
    "q299_sql_table_changes" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |boot AS (SELECT 'boot' AS phase, lang, COUNT(*) AS net_rows,
        |    CAST(SUM(n_chars) AS BIGINT) AS net_chars
        |  FROM base GROUP BY 2),
        |del AS (SELECT 'delta' AS phase, lang, -COUNT(*) AS net_rows,
        |    CAST(-SUM(n_chars) AS BIGINT) AS net_chars
        |  FROM base WHERE n_chars < 200 GROUP BY 2)
        |SELECT phase, lang, net_rows, net_chars FROM boot
        |UNION ALL
        |SELECT phase, lang, net_rows, net_chars FROM del
        |ORDER BY 1, 2""".stripMargin,

    // the oracle recomputes the bucket folds straight off the source
    // parquet; the engine must get there through the lake's list-typed
    // wire column, the vectorized array decode, and the DV ordinals —
    // integer-domain per-element math keeps both engines IEEE-exact
    "q301_lake_embedding_vectors" ->
      """SELECT CAST(label % 4 AS BIGINT) AS bucket,
        |  COUNT(*) AS n_vecs,
        |  CAST(SUM(len(embedding)) AS BIGINT) AS dims,
        |  CAST(SUM(list_sum(list_transform(embedding,
        |    e -> CAST(floor(CAST(e AS DOUBLE) * 100 + 0.5) AS BIGINT))))
        |    AS BIGINT) AS qsum
        |FROM embeddings
        |WHERE NOT coalesce(label % 7 = 0, FALSE)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle recomputes both states from the straddling delete
    // predicates; the engine must get there through parquet row groups,
    // ordinal-keyed deletion vectors, and manifest-frozen DV state
    "q292_parquet_tier" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |v1 AS (SELECT 'v1' AS phase, lang, count(*) AS n_docs,
        |    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
        |    CAST(sum(doc_id) AS BIGINT) AS id_sum
        |  FROM base WHERE NOT coalesce(n_chars < 200, FALSE) GROUP BY 2),
        |live AS (SELECT 'zlive', lang, count(*),
        |    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT),
        |    CAST(sum(doc_id) AS BIGINT)
        |  FROM base WHERE NOT coalesce(n_chars < 200, FALSE)
        |    AND NOT (doc_id % 10 = 7) GROUP BY 2)
        |SELECT * FROM v1 UNION ALL SELECT * FROM live
        |ORDER BY phase, lang""".stripMargin,

    // the oracle recomputes both phases from the half-split and delete
    // predicate; the engine must get there through a metadata-only
    // rename (former-key fallback + pre-rename time travel)
    "q291_sql_rename_column" ->
      """WITH live AS (SELECT lang, n_chars FROM documents
        |  WHERE NOT coalesce(n_chars < 200, FALSE)),
        |a AS (SELECT 'live' AS phase, lang, count(*) AS n_docs,
        |    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_size
        |  FROM live GROUP BY 2),
        |b AS (SELECT 'v1', lang, count(*),
        |    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT)
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 2)
        |SELECT * FROM a UNION ALL SELECT * FROM b
        |ORDER BY phase, lang""".stripMargin,

    "q285_schema_evolution" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_quality,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN doc_id % 5 END) AS BIGINT)
        |    AS sum_quality
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,


    // the MERGE's set algebra recomputed over the source table: kept
    // seeds (even, not in src), updated intersections (non-negative),
    // deletions (negative intersections vanish), inserts (src-only,
    // non-negative) — one wrong branch anywhere flips a count or a sum
    "q284_sql_merge" ->
      """WITH seed AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |    CAST(c_acctbal AS DOUBLE) AS bal
        |  FROM customer WHERE c_custkey % 2 = 0),
        |src AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |    CAST(c_acctbal AS DOUBLE) + 1000.0 AS bal2,
        |    (c_acctbal < 0) AS del
        |  FROM customer WHERE c_custkey % 3 = 0),
        |fin AS (
        |  SELECT s.k, s.seg, s.bal FROM seed s
        |    LEFT JOIN src x ON s.k = x.k WHERE x.k IS NULL
        |  UNION ALL
        |  SELECT s.k, s.seg, x.bal2 FROM seed s
        |    JOIN src x ON s.k = x.k WHERE NOT x.del
        |  UNION ALL
        |  SELECT x.k, x.seg, x.bal2 FROM src x
        |    LEFT JOIN seed s ON s.k = x.k WHERE s.k IS NULL AND NOT x.del)
        |SELECT seg AS segment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |  MIN('c' || CAST(k AS VARCHAR)) AS min_id
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,


    // the oracle sees only the source table and the delete predicate:
    // the SQL CREATE/INSERT/DELETE/SELECT chain must reproduce it
    "q283_sql_catalog" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price,
        |  MIN('o' || CAST(o_orderkey AS VARCHAR)) AS min_id
        |FROM orders
        |WHERE NOT coalesce(o_totalprice < 50000.0, FALSE)
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // the three frozen states recomputed from the append/delete order:
    // v1 = slice 0 untouched; v2 = slices 0+1 minus the chars delete;
    // live = slices 0+1 minus both deletes, plus slice 2 untouched
    // (the second delete ran BEFORE slice 2 landed, so slice 2 keeps
    // its doc_id%10=7 rows — position-based deletes never chase
    // the oracle recomputes the FINAL state from the mutation ordering;
    // the engine must get there by applying only snapshot-diff deltas
    "q289_lake_cdc" ->
      """WITH base AS (SELECT doc_id, n_chars, lang FROM documents
        |  WHERE lang IS NOT NULL),
        |live AS (SELECT * FROM base
        |  WHERE NOT coalesce(n_chars < 200, FALSE)
        |    AND NOT (doc_id % 10 = 7))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,


    // late-arriving data)
    "q282_time_travel" ->
      """WITH s01 AS (SELECT doc_id, n_chars FROM documents
        |  WHERE doc_id % 3 IN (0, 1)),
        |v1 AS (SELECT 'v1' AS phase, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |    CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |  FROM documents WHERE doc_id % 3 = 0),
        |v2 AS (SELECT 'v2', COUNT(*),
        |    CAST(SUM(n_chars) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
        |  FROM s01 WHERE NOT coalesce(n_chars < 200, FALSE)),
        |live AS (SELECT 'zlive', COUNT(*),
        |    CAST(SUM(n_chars) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
        |  FROM (SELECT doc_id, n_chars FROM s01
        |        WHERE NOT coalesce(n_chars < 200, FALSE)
        |          AND NOT (doc_id % 10 = 7)
        |        UNION ALL
        |        SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 2))
        |SELECT * FROM v1 UNION ALL SELECT * FROM v2
        |UNION ALL SELECT * FROM live ORDER BY phase""".stripMargin,


    // the oracle never sees the bloom sidecars: pruned point lookups
    // must reproduce a plain key filter (c_acctbal is DOUBLE both ways)
    "q280_bloom_index_lookup" ->
      """SELECT 'c' || CAST(c_custkey AS VARCHAR) AS _record_id,
        |  c_mktsegment AS Segment,
        |  CAST(c_acctbal AS DOUBLE) AS Bal,
        |  CAST(c_custkey AS BIGINT) AS custkey
        |FROM customer
        |WHERE c_custkey IN (1, 7, 42, 139)
        |ORDER BY _record_id""".stripMargin,


    // the oracle never sees the clustered layout: the write→cluster→
    // zero-exchange-join→aggregate chain must reproduce a plain join
    "q278_storage_partitioned_join" ->
      """WITH d AS (SELECT lang, n_chars FROM documents
        |  WHERE lang IS NOT NULL),
        |m AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS dim_docs
        |  FROM d GROUP BY 1)
        |SELECT d.lang, COUNT(*) AS n_docs,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
        |  MAX(m.dim_docs) AS dim_docs
        |FROM d JOIN m ON d.lang = m.lang
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // the oracle sees only the survivor predicate: merge-on-read and
    // post-materialize reads must BOTH reproduce it (phases are twins)
    "q277_deletion_vectors" ->
      """WITH surv AS (SELECT lang, n_chars, doc_id FROM documents
        |  WHERE NOT coalesce(n_chars < 200, FALSE)
        |    AND NOT (doc_id % 10 = 3)),
        |a AS (SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MAX('d' || lpad(CAST(doc_id AS VARCHAR), 6, '0')) AS max_id
        |FROM surv GROUP BY 1)
        |SELECT 'cow' AS phase, * FROM a
        |UNION ALL SELECT 'mor' AS phase, * FROM a
        |ORDER BY phase, lang""".stripMargin,


    // the oracle never sees the record files: the whole write→stats→
    // prune→read chain must reproduce a plain filtered aggregate
    "q259_zonemap_pruned_scan" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_id
        |FROM documents
        |WHERE doc_id >= 100 AND doc_id < 220 AND lang IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q11_set_ops" ->
      """SELECT key, side FROM (
        |  SELECT key, 'only_orders' AS side FROM
        |    (SELECT DISTINCT o_custkey AS key FROM orders
        |     EXCEPT
        |     SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 0)
        |  UNION ALL
        |  SELECT key, 'only_customers' AS side FROM
        |    (SELECT DISTINCT c_custkey AS key FROM customer WHERE c_acctbal > 0
        |     EXCEPT
        |     SELECT DISTINCT o_custkey FROM orders)
        |) ORDER BY key, side""".stripMargin,


    "q12_dedup_latest" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,


    "q13_row_checksum" -> {
      val fields = custCols.sorted.map(enc).mkString(" || '|' || ")
      s"""SELECT c_custkey, md5($fields) AS ck FROM customer ORDER BY c_custkey"""
    },


    "q14_table_checksum" -> {
      val fields = Seq("n_nationkey", "n_name", "n_regionkey").map(enc).mkString(" || '|' || ")
      s"""SELECT md5(string_agg(e, chr(10) ORDER BY e)) AS table_checksum
         |FROM (SELECT $fields AS e FROM nation)""".stripMargin
    },


    "q15_string_funcs" ->
      """SELECT n_nationkey,
        |  upper(n_name) AS u,
        |  lower(n_name) AS lo,
        |  upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2)) AS capped,
        |  trim(regexp_replace(chr(9) || ' ' || n_name || chr(9), '[\t]+', '', 'g')) AS cleaned,
        |  lpad(n_name, 12, '.') AS padded,
        |  regexp_replace(n_name, '[AEIOU]', '_', 'g') AS devoweled,
        |  CAST(length(n_name) AS BIGINT) AS len
        |FROM nation ORDER BY n_nationkey""".stripMargin,


    "q16_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,


    "q17_window_lag" ->
      """SELECT o_orderkey,
        |  o_totalprice - lag(o_totalprice) OVER w AS delta,
        |  CAST(row_number() OVER w AS BIGINT) AS seq
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,


    "q18_schema_union" ->
      """SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal,
        |  c_mktsegment AS segment, 'customer' AS src_table,
        |  CAST(NULL AS INTEGER) AS nationkey
        |FROM customer
        |UNION ALL
        |SELECT s_suppkey, s_name, s_acctbal, CAST(NULL AS VARCHAR),
        |  'supplier', s_nationkey
        |FROM supplier
        |ORDER BY src_table, id""".stripMargin,


    "q19_table_snapshot" ->
      """SELECT 'nation' AS doc_id, 'upsert_table_checksum' AS update_type,
        |  CAST(1 AS BIGINT) AS version_id, true AS latest,
        |  CAST(count(*) AS INTEGER) AS n_entries
        |FROM nation""".stripMargin,


    "q20_versioned_snapshot" ->
      """SELECT CAST(1 AS BIGINT) AS version_id, false AS latest,
        |  CAST(count(*) AS INTEGER) AS n_entries FROM nation
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), true, CAST(count(*) AS INTEGER) FROM nation
        |ORDER BY version_id""".stripMargin,


    "q33_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,


    "q34_percentile" ->
      """SELECT o_orderstatus,
        |  floor(quantile_cont(o_totalprice, 0.5) * 10000 + 0.5) / 10000 AS median_price,
        |  floor(quantile_cont(o_totalprice, 0.9) * 10000 + 0.5) / 10000 AS p90_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,


    "q37_cube" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
        |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin,


    "q38_edit_distance" ->
      """SELECT a.n_nationkey AS ka, b.n_nationkey AS kb,
        |  CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS dist
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |WHERE levenshtein(a.n_name, b.n_name) <= 4
        |ORDER BY ka, kb""".stripMargin,


    "q39_rank_suite" ->
      """SELECT o_orderkey,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)
        |QUALIFY rnk <= 100
        |ORDER BY o_orderkey""".stripMargin,


    "q40_datetime_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |  CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_epoch,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98
        |FROM orders ORDER BY o_orderkey LIMIT 5000""".stripMargin,


    // strftime builds the same five wire shapes; the try_strptime chain
    // is the oracle's independent formulation of the widened parser
    "q257_lenient_dates" ->
      """WITH base AS (SELECT o_orderkey, o_orderdate,
        |    o_orderkey % 6 AS shape FROM orders),
        |w AS (SELECT shape, CASE shape
        |    WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |    WHEN 1 THEN strftime(o_orderdate, '%a, %d %b %Y') || ' 10:30:00 GMT'
        |    WHEN 2 THEN strftime(o_orderdate, '%m/%d/%Y') || ' 08:15:00'
        |    WHEN 3 THEN strftime(o_orderdate, '%d %b %Y')
        |    WHEN 4 THEN strftime(o_orderdate, '%b %-d, %Y')
        |    ELSE CAST(o_orderkey AS VARCHAR) END AS s
        |  FROM base),
        |p AS (SELECT shape, coalesce(
        |    try_strptime(s, '%Y-%m-%d'),
        |    try_strptime(s, '%a, %d %b %Y %H:%M:%S GMT'),
        |    try_strptime(s, '%m/%d/%Y %H:%M:%S'),
        |    try_strptime(s, '%d %b %Y'),
        |    try_strptime(s, '%b %-d, %Y')) AS ts
        |  FROM w)
        |SELECT CAST(shape AS BIGINT) AS shape,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(ts) AS BIGINT) AS n_parsed,
        |  min(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS min_ts,
        |  max(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS max_ts
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,


    "q42_batch_actions" ->
      """WITH state AS (SELECT c_custkey, c_name, c_acctbal
        |               FROM customer WHERE c_custkey % 11 != 3),
        |kept AS (SELECT * FROM state WHERE c_custkey % 19 != 0),
        |upd AS (SELECT c_custkey, c_acctbal + 50.0 AS u_acctbal
        |        FROM customer WHERE c_custkey % 13 = 0),
        |merged AS (
        |  SELECT coalesce(k.c_custkey, u.c_custkey) AS c_custkey,
        |         k.c_name AS c_name,
        |         coalesce(u.u_acctbal, k.c_acctbal) AS c_acctbal
        |  FROM kept k FULL OUTER JOIN upd u ON k.c_custkey = u.c_custkey)
        |SELECT c_custkey, c_name, c_acctbal FROM merged
        |UNION ALL
        |SELECT c_custkey + 100000, c_name, c_acctbal
        |FROM customer WHERE c_custkey % 23 = 0
        |ORDER BY c_custkey""".stripMargin,


    "q43_correlated_subquery" ->
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) /
        |         CAST(COUNT(*) AS DOUBLE)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,


    "q44_intersect" ->
      """SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY key""".stripMargin,


    "q45_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,


    "q51_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,


    "q52_unpivot" ->
      """SELECT c_custkey, measure, value FROM (
        |  SELECT c_custkey, c_acctbal AS acctbal,
        |    CAST(c_nationkey AS DOUBLE) AS nationkey
        |  FROM customer)
        |UNPIVOT (value FOR measure IN (acctbal, nationkey))
        |ORDER BY c_custkey, measure""".stripMargin,


    "q54_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts,
        |  CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id,
        |  CAST(epoch(date_trunc('second', p.ts)) AS BIGINT) AS purchase_epoch,
        |  floor(p.value * 10000 + 0.5) / 10000 AS purchase_value,
        |  CAST(epoch(date_trunc('second', c.ts)) AS BIGINT) AS click_epoch,
        |  floor(c.click_value * 10000 + 0.5) / 10000 AS click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY event_id""".stripMargin,


    "q263_bitmap_count_distinct" ->
      """SELECT o_orderpriority AS priority,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |  CAST(COUNT(DISTINCT o_orderkey % 1000) AS BIGINT) AS n_okmod,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,


    // q54's oracle verbatim: both implementations answer to one truth
    "q260_asof_native" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts,
        |  CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id,
        |  CAST(epoch(date_trunc('second', p.ts)) AS BIGINT) AS purchase_epoch,
        |  floor(p.value * 10000 + 0.5) / 10000 AS purchase_value,
        |  CAST(epoch(date_trunc('second', c.ts)) AS BIGINT) AS click_epoch,
        |  floor(c.click_value * 10000 + 0.5) / 10000 AS click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY event_id""".stripMargin,


    "q265_asof_forward" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts,
        |  CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id,
        |  CAST(epoch(date_trunc('second', p.ts)) AS BIGINT) AS purchase_epoch,
        |  floor(p.value * 10000 + 0.5) / 10000 AS purchase_value,
        |  CAST(epoch(date_trunc('second', c.ts)) AS BIGINT) AS click_epoch,
        |  floor(c.click_value * 10000 + 0.5) / 10000 AS click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY event_id""".stripMargin,


    "q55_range_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS cts, value AS cv FROM events
        |  WHERE event_type = 'click')
        |SELECT p.event_id, COUNT(*) AS n_clicks,
        |  CAST(SUM(CAST(c.cv AS DECIMAL(18,4))) AS DOUBLE) AS click_value_sum
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.cts >= p.ts - INTERVAL 1800 SECOND AND c.cts <= p.ts
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,

    // per-row digest = first 15 md5 hex chars of the portable encoding
    // as a 60-bit int; bucket digests are exact decimal sums of those —
    // byte-for-byte the engine's md5_prefix60 route
    "q223_replica_diff" -> {
      val fields = Seq("c_custkey", "c_acctbal", "c_mktsegment", "c_name", "c_nationkey")
      val encSql = fields.map(f => enc(f)).mkString(" || '|' || ")
      s"""WITH src AS (SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         |  c_nationkey FROM customer),
         |tgt AS (
         |  SELECT c_custkey, c_name,
         |    CASE WHEN c_custkey % 97 = 0 THEN c_acctbal + 1.0
         |         ELSE c_acctbal END AS c_acctbal,
         |    c_mktsegment, c_nationkey
         |  FROM src WHERE c_custkey % 89 != 0
         |  UNION ALL
         |  SELECT c_custkey + 500000, c_name, c_acctbal, c_mktsegment,
         |    c_nationkey FROM src WHERE c_custkey % 83 = 0),
         |ds AS (SELECT c_custkey % 256 AS bucket,
         |    sum(CAST(CAST(('0x' || substr(md5($encSql), 1, 15)) AS BIGINT)
         |      AS DECIMAL(38,0))) AS sum_src, count(*) AS n_src
         |  FROM src GROUP BY 1),
         |dt AS (SELECT c_custkey % 256 AS bucket,
         |    sum(CAST(CAST(('0x' || substr(md5($encSql), 1, 15)) AS BIGINT)
         |      AS DECIMAL(38,0))) AS sum_tgt, count(*) AS n_tgt
         |  FROM tgt GROUP BY 1)
         |SELECT coalesce(ds.bucket, dt.bucket) AS bucket,
         |  CAST(coalesce(n_src, 0) AS BIGINT) AS n_src,
         |  CAST(coalesce(n_tgt, 0) AS BIGINT) AS n_tgt
         |FROM ds FULL OUTER JOIN dt ON ds.bucket = dt.bucket
         |WHERE NOT (coalesce(n_src, 0) = coalesce(n_tgt, 0)
         |  AND coalesce(sum_src, 0) = coalesce(sum_tgt, 0))
         |ORDER BY bucket""".stripMargin
    },

    // thresholds via quantile_disc (same rank semantics as q221); the
    // shares are decimal-exact sums over the same strict > filter
    "q236_concentration" ->
      """WITH t AS (SELECT CAST(sum(CAST(n_chars AS DECIMAL(28,0))) AS DOUBLE)
        |    AS total FROM documents),
        |qv AS (SELECT CAST(0.5 AS DOUBLE) AS q,
        |    CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS threshold
        |  FROM documents
        |  UNION ALL SELECT 0.9, CAST(quantile_disc(n_chars, 0.9) AS BIGINT)
        |  FROM documents
        |  UNION ALL SELECT 0.99, CAST(quantile_disc(n_chars, 0.99) AS BIGINT)
        |  FROM documents)
        |SELECT qv.q, qv.threshold,
        |  CAST((SELECT count(*) FROM documents d
        |    WHERE d.n_chars > qv.threshold) AS BIGINT) AS n_above,
        |  floor((SELECT CAST(coalesce(sum(CAST(n_chars AS DECIMAL(28,0))), 0)
        |      AS DOUBLE) FROM documents d WHERE d.n_chars > qv.threshold)
        |    / t.total * 1000000 + 0.5) / 1000000 AS char_share
        |FROM qv CROSS JOIN t ORDER BY q""".stripMargin,

    // identical salted-md5 coin, decimal moments, and final IEEE ops
    "q231_ab_readout" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v,
        |    CASE WHEN substr(md5('exp42:' || CAST(o_custkey AS VARCHAR)), 1, 1)
        |      < '8' THEN 'A' ELSE 'B' END AS arm
        |  FROM orders GROUP BY o_custkey),
        |m AS (SELECT
        |  CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN arm = 'A'
        |    THEN CAST(v AS DECIMAL(28,6)) ELSE 0 END) AS DOUBLE) AS s1_a,
        |  CAST(sum(CASE WHEN arm = 'B'
        |    THEN CAST(v AS DECIMAL(28,6)) ELSE 0 END) AS DOUBLE) AS s1_b,
        |  CAST(sum(CASE WHEN arm = 'A'
        |    THEN CAST(v * v AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS s2_a,
        |  CAST(sum(CASE WHEN arm = 'B'
        |    THEN CAST(v * v AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS s2_b
        |  FROM spend)
        |SELECT n_a, n_b,
        |  floor(s1_a / n_a * 1000000 + 0.5) / 1000000 AS mean_a,
        |  floor(s1_b / n_b * 1000000 + 0.5) / 1000000 AS mean_b,
        |  floor((s1_b / n_b - s1_a / n_a) * 1000000 + 0.5) / 1000000 AS lift,
        |  floor((s1_b / n_b - s1_a / n_a) /
        |    sqrt((s2_a - s1_a * s1_a / n_a) / n_a / n_a +
        |         (s2_b - s1_b * s1_b / n_b) / n_b / n_b)
        |    * 1000000 + 0.5) / 1000000 AS z
        |FROM m""".stripMargin,

    // field names come from json_keys (discovered, not declared);
    // integer detection is the same regex on both engines
    "q228_schema_drift" ->
      """WITH docs AS (SELECT doc_id, n_chars FROM documents),
        |a AS (SELECT '{"id":' || doc_id || ',"score":' || n_chars ||
        |  ',"tag":"s' || doc_id || '","legacy":1}' AS js FROM docs),
        |b AS (SELECT '{"id":' || doc_id || ',"score":"' || n_chars ||
        |  'pt","tag":"s' || doc_id || '","fresh":' || (doc_id % 7) ||
        |  '}' AS js FROM docs),
        |ae AS (SELECT k AS field, json_extract_string(js, '$.' || k) AS v
        |  FROM a, unnest(json_keys(js)) AS t(k)),
        |be AS (SELECT k AS field, json_extract_string(js, '$.' || k) AS v
        |  FROM b, unnest(json_keys(js)) AS t(k)),
        |ap AS (SELECT field, count(*) AS n_a,
        |  CASE WHEN min(CASE WHEN regexp_matches(v, '^-?[0-9]+$')
        |    THEN 1 ELSE 0 END) = 1 THEN 'bigint' ELSE 'string' END AS type_a
        |  FROM ae GROUP BY field),
        |bp AS (SELECT field, count(*) AS n_b,
        |  CASE WHEN min(CASE WHEN regexp_matches(v, '^-?[0-9]+$')
        |    THEN 1 ELSE 0 END) = 1 THEN 'bigint' ELSE 'string' END AS type_b
        |  FROM be GROUP BY field)
        |SELECT coalesce(ap.field, bp.field) AS field,
        |  CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
        |  CAST(coalesce(n_b, 0) AS BIGINT) AS n_b,
        |  type_a, type_b,
        |  CASE WHEN n_a IS NULL THEN 'added'
        |       WHEN n_b IS NULL THEN 'removed'
        |       WHEN type_a != type_b THEN 'type_changed'
        |       ELSE 'stable' END AS status
        |FROM ap FULL OUTER JOIN bp ON ap.field = bp.field
        |ORDER BY field""".stripMargin,

    "q227_group_quantiles_exact" ->
      """SELECT o_orderstatus, CAST(0.5 AS DOUBLE) AS q,
        |  quantile_disc(o_totalprice, 0.5) AS value FROM orders GROUP BY 1
        |UNION ALL
        |SELECT o_orderstatus, 0.9, quantile_disc(o_totalprice, 0.9)
        |FROM orders GROUP BY 1
        |ORDER BY o_orderstatus, q""".stripMargin,

    // dict_bits = length(bin(ndv-1)) — integer-exact ceil(log2), no libm
    "q225_encoding_advisor" -> {
      val cols = Seq("l_orderkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus")
      val m = cols.map(c => s"count(DISTINCT $c) AS d_$c").mkString(", ")
      val arms = cols.map(c =>
        s"SELECT '$c' AS column_name, n, d_$c AS ndv FROM m").mkString("\nUNION ALL\n")
      s"""WITH m AS (SELECT count(*) AS n, $m FROM lineitem),
         |u AS ($arms)
         |SELECT column_name, n, ndv,
         |  CASE WHEN ndv * 20 <= n THEN 'dictionary' ELSE 'plain' END AS advice,
         |  CAST(CASE WHEN ndv < 2 THEN 1
         |    ELSE length(bin(ndv - 1)) END AS BIGINT) AS dict_bits
         |FROM u ORDER BY column_name""".stripMargin
    },

    // DuckDB sorts the whole column; the engine refines a histogram —
    // both must name the identical k-th smallest element
    "q221_exact_quantiles" ->
      """SELECT CAST(0.5 AS DOUBLE) AS q,
        |  quantile_disc(l_extendedprice, 0.5) AS value FROM lineitem
        |UNION ALL SELECT 0.9, quantile_disc(l_extendedprice, 0.9) FROM lineitem
        |UNION ALL SELECT 0.99, quantile_disc(l_extendedprice, 0.99) FROM lineitem
        |ORDER BY q""".stripMargin,

  )
}
