package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Checksums, Normalize}
import graft.operators.{Dedup, DedupApprox, Export, Multimodal, Similarity, Strategies, TextAnalysis}
import graft.sources.Sources

import QueryShared._

/** Training-data-pipeline infrastructure queries: sampling and
  * mixtures, connected components, bucketing/salting/z-order, streaming
  * analytics, multimodal headers, stats and the capstone pipeline. */
private[graft] object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- END-TO-END training-data preparation (capstone) -----------
    "q100_training_pipeline" -> ((s, dir) => {
      // the whole curation flow as ONE lineage of already-verified
      // operators: language+quality gates -> exact dedup (min-id per
      // fingerprint) -> minhash near-dup canonicalization -> determin-
      // istic split -> per-split token accounting
      val raw = docsWithNearDups(s, dir)
      val t = col("text")
      val alphaRatio = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double") /
        greatest(length(t).cast("double"), lit(1.0))
      val gated = raw.filter(TextAnalysis.languageId(t) === "en")
        .filter(TextAnalysis.tokenCount(t) >= 30 && alphaRatio > lit(0.55))
      val fp = gated.select(col("doc_id"), col("text"),
        md5(TextAnalysis.normText(t)).as("fp"))
      val keep = fp.groupBy("fp").agg(min("doc_id").as("doc_id"))
      // persisted: three consumers (sketching, component node set, final
      // accounting) would each replay the gate regex stack otherwise.
      // Invocation-scoped and small (the gated id+text frame); released
      // by the ContextCleaner when the result frame is unreferenced —
      // same lifecycle as the minhash sketch cache underneath
      val deduped = fp.join(keep, Seq("fp", "doc_id")).select("doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = DedupApprox.minhashNearDups(deduped, "doc_id", "text",
        k = 3, bands = 8, rows = 2, threshold = 0.6, md5Family = true)
      val canon = graft.operators.Components
        .canonicalize(deduped, pairs, "doc_id", "id_a", "id_b")
        .filter(col("doc_id") === col("canonical_id"))
        .select(col("doc_id"), col("text"))
      graft.operators.Sampling.splitAssign(canon, Seq("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"))
        .orderBy("split")
    }),


    // ----- per-group Pearson correlation (exact moments) -------------
    "q106_correlation" -> ((s, dir) => {
      // correlation from DECIMAL-routed raw moments: every sum is
      // aggregation-order-exact; the remaining mul/sub/div/sqrt are
      // correctly-rounded IEEE ops, so the value hash-reproduces at any
      // parallelism — the built-in corr()'s streaming covariance update
      // accumulates in partition order and would not
      val d = rd(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
      val m = d.groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x").cast("decimal(28,12)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(28,12)")).cast("double").as("sy"),
        sum((col("x") * col("y")).cast("decimal(28,12)")).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast("decimal(28,12)")).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast("decimal(28,12)")).cast("double").as("syy"))
      m.select(col("l_returnflag"),
        (floor((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))) *
          lit(1000000) + lit(0.5)) / lit(1000000)).as("corr"))
        .orderBy("l_returnflag")
    }),


    // ----- per-group OLS trend fit (integer-exact moments) -----------
    "q107_linear_fit" -> ((s, dir) => {
      // least-squares slope/intercept per key — the per-key trend
      // operator (drift detection, forecasting features). Inputs snap to
      // INTEGER lattices first (seconds since a baseline; micro-value
      // units), so every moment is an exact integer sum: no per-row
      // double->decimal rounding anywhere (q106's decimal route is exact
      // only for inputs already on the decimal's scale — full-precision
      // doubles would round differently per engine). The exact sums cast
      // to double identically everywhere; the fit is then pure IEEE.
      val d = rd(s, dir, "events").select(col("user_id"),
        (col("ts").cast("long") - lit(1704067200L)).as("x"),
        floor(col("value") * 1000000 + 0.5).cast("long").as("ym"))
        .filter(col("user_id") % 10 === 0)
      val m = d.groupBy("user_id").agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("ym").cast("decimal(38,0)")).cast("double").as("sy"),
        // cast the FACTORS before multiplying: a long×long product wraps
        // silently in non-ANSI Spark while DuckDB promotes, so the
        // "exact integer moments" guarantee would break once |x·ym|
        // exceeds 2^63 (large time deltas × micro-values)
        sum(col("x").cast("decimal(38,0)") *
          col("ym").cast("decimal(38,0)")).cast("double").as("sxy"),
        sum(col("x").cast("decimal(38,0)") *
          col("x").cast("decimal(38,0)")).cast("double").as("sxx"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")) // micro-value / sec
      // unfittable groups (one event, or zero x-variance) are 0/0 — and
      // the engines disagree on it (Spark floor(NaN)->0, IEEE NaN stays
      // NaN), so they are EXCLUDED, not fabricated as slope 0
      m.filter(col("n") * col("sxx") - col("sx") * col("sx") =!= lit(0.0))
        .select(col("user_id"),
        (floor(slope * lit(1000.0) + lit(0.5)) / lit(1000000000.0)).as("slope"),
        (floor((col("sy") - slope * col("sx")) / col("n") + lit(0.5)) /
          lit(1000000.0)).as("intercept"))
        .orderBy("user_id")
    }),


    // ----- join-order advisor from exact cardinality forecasts -------
    "q211_join_order" -> ((s, dir) => {
      // which end of lineitem ⨝ orders ⨝ customer to join first? —
      // both candidate intermediates AND the final size forecast from
      // per-key COUNT frames alone (q144's statistics discipline):
      // |L⨝O| = Σ cl(k)·co(k), |O⨝C| = Σ co(k)·cc(k), final =
      // Σ_orders cl(o_orderkey)·cc(o_custkey) — three aggregation
      // passes over count frames, no candidate join ever executes.
      // The recommended path is the smaller intermediate
      val li = rd(s, dir, "lineitem")
      val ord = rd(s, dir, "orders")
      val cust = rd(s, dir, "customer")
      def dec(c: Column) = c.cast("decimal(38,0)")
      val cl = li.groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("_nl"))
      val cc = cust.groupBy(col("c_custkey").as("k")).agg(count(lit(1)).as("_nc"))
      val lo = graft.operators.Skew.joinCardinalityTotal(
        li.select(col("l_orderkey").as("k")), ord.select(col("o_orderkey").as("k")), "k")
        .select(col("out_rows").as("_lo"))
      val oc = graft.operators.Skew.joinCardinalityTotal(
        ord.select(col("o_custkey").as("k")), cust.select(col("c_custkey").as("k")), "k")
        .select(col("out_rows").as("_oc"))
      val fin = ord
        .join(cl, col("o_orderkey") === cl("k"), "inner")
        .join(cc, col("o_custkey") === cc("k"), "inner")
        .agg(coalesce(sum(dec(col("_nl")) * dec(col("_nc"))).cast("long"),
          lit(0L)).as("_fin"))
      lo.crossJoin(oc).crossJoin(fin)
        .select(explode(array(
          struct(lit("a_lineitem_orders_first").as("path"),
            col("_lo").as("intermediate_rows")),
          struct(lit("b_orders_customer_first").as("path"),
            col("_oc").as("intermediate_rows")))).as("e"),
          col("_lo"), col("_oc"), col("_fin"))
        .select(col("e.path").as("path"),
          col("e.intermediate_rows").as("intermediate_rows"),
          col("_fin").as("final_rows"),
          (col("e.intermediate_rows") === least(col("_lo"), col("_oc")))
            .as("recommended"))
        .orderBy("path")
    }),


    // ----- per-key trend fit with R² (monitoring regression) ---------
    "q209_trend_r2" -> ((s, dir) => {
      // q107's exact-integer-moment fit extended with the fit QUALITY:
      // R² = (n·sxy − sx·sy)² / ((n·sxx − sx²)(n·syy − sy²)) — every
      // moment an exact DECIMAL integer cast to double, one IEEE
      // divide; a trend verdict (rising/falling/flat) from the exact
      // covariance sign. Zero-variance sides yield NULL R² (undefined,
      // not zero) and groups with no x-variance are excluded as in
      // q107
      val d = rd(s, dir, "events").select(col("user_id"),
        (col("ts").cast("long") - lit(1704067200L)).as("x"),
        floor(col("value") * 1000000 + 0.5).cast("long").as("ym"))
        .filter(col("user_id") % 7 === 1)
      def dec(c: Column) = c.cast("decimal(38,0)")
      val m = d.groupBy("user_id").agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("ym"))).cast("double").as("sy"),
        sum(dec(col("x")) * dec(col("ym"))).cast("double").as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).cast("double").as("sxx"),
        sum(dec(col("ym")) * dec(col("ym"))).cast("double").as("syy"))
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      m.filter(vx =!= lit(0.0))
        .select(col("user_id"),
          when(vy =!= 0.0,
            r(cov * cov / (vx * vy), 6)).as("r2"),
          when(cov > 0, "rising").when(cov < 0, "falling")
            .otherwise("flat").as("trend"))
        .orderBy("user_id")
    }),


    // ----- weekly cohort retention (event-time analytics) ------------
    "q108_retention" -> ((s, dir) => {
      // classic retention matrix: users bucketed by first-seen week
      // (floor-epoch weeks — no timezone/week-start ambiguity), counted
      // in each later active week; two aggregations, one broadcastable
      // first-seen join
      val ev = rd(s, dir, "events").select(col("user_id"),
        floor(col("ts").cast("long") / lit(604800)).cast("long").as("week"))
      val first = ev.groupBy("user_id").agg(min(col("week")).as("cohort"))
      ev.distinct().join(first, Seq("user_id"))
        .groupBy(col("cohort"), col("week"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort", "week")
    }),


    // ----- mixture sampling to a token budget (data-mix step) --------
    "q109_mixture_sample" -> ((s, dir) => {
      graft.operators.Sampling.mixtureSample(rd(s, dir, "documents"),
        "source", Seq("doc_id"), "n_chars",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), budget = 10000L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("kept_chars"))
        .orderBy("source")
    }),


    // ----- MP4 box-walk duration decode (video metadata, no codec) ---
    "q111_video_headers" -> ((s, dir) => {
      // ISO-BMFF bytes assembled in-plan (big-endian box sizes, moov/mvhd
      // timescale + duration); the decoder walks the box tree
      // (Multimodal.parseHeader) — the oracle predicts the duration from
      // doc_id arithmetic alone. Three shapes: version-0 mvhd (u32
      // fields), version-1 (u64 fields, doc_id % 5 == 0), and a moov
      // whose declared size overruns the payload (doc_id % 4 == 3):
      // recognized container, NULL duration — same honesty contract as
      // the q96 WAV junk chunk.
      def beHex(c: Column, bytes: Int) = lpad(hex(c), bytes * 2, "0")
      val ts = ((col("doc_id") % 90 + 10) * 100).cast("long")
      val durUnits = ((col("doc_id") % 50 + 1) * 1000 + col("doc_id") % 997)
        .cast("long")
      val ftyp = lit("00000010" + "66747970" + "69736F6D" + "00000000")
      val v0 = concat(ftyp,
        lit("00000024" + "6D6F6F76" +                     // moov(36)
          "0000001C" + "6D766864" + "00000000" +          // mvhd(28) v0
          "00000000" + "00000000"),                       // ctime, mtime
        beHex(ts, 4), beHex(durUnits, 4))
      val v1 = concat(ftyp,
        lit("00000030" + "6D6F6F76" +                     // moov(48)
          "00000028" + "6D766864" + "01000000" +          // mvhd(40) v1
          "0000000000000000" + "0000000000000000"),       // ctime64, mtime64
        beHex(ts, 4), beHex(durUnits, 8))
      val bad = concat(ftyp, lit("00000100" + "6D6F6F76")) // moov claims 256B
      val payload = unhex(when(col("doc_id") % 4 === 3, bad)
        .when(col("doc_id") % 5 === 0, v1).otherwise(v0))
      val media = rd(s, dir, "documents").select(col("doc_id"),
        payload.as("payload"), lit("application/octet-stream").as("mime"))
      Multimodal.withDecodedMeta(media, "payload", "mime")
        .select(col("doc_id"), col("media.mime").as("detected_mime"),
          col("media.duration_ms").as("duration_ms"),
          col("media.byte_len").as("byte_len"))
        .orderBy("doc_id")
    }),


    // ----- MP3 frame-walk duration decode (audio metadata, no codec) --
    "q192_mp3_duration" -> ((s, dir) => {
      // CBR MPEG-1 Layer III streams assembled in-plan from doc_id
      // arithmetic (bitrate/samplerate/padding cycle through the real
      // header tables), walked frame-by-frame by Multimodal.parseMp3 —
      // the oracle predicts frame count, duration, and byte length
      // from the same arithmetic without ever seeing a byte. Four
      // shapes: plain CBR, ID3v2-prefixed (tag must be skipped by its
      // syncsafe size), a reserved bitrate index (doc_id % 7 == 1:
      // recognized stream, NULL duration), and a truncated final frame
      // (doc_id % 7 == 5: same honesty contract as the WAV junk chunk)
      val d = rd(s, dir, "documents").select(col("doc_id"))
        .withColumn("n", (col("doc_id") % 4 + 2).cast("int"))
        .withColumn("br", element_at(
          array(lit(128), lit(160), lit(192), lit(224)),
          (col("doc_id") % 4 + 1).cast("int")))
        .withColumn("sr", element_at(
          array(lit(44100), lit(48000), lit(32000)),
          (col("doc_id") % 3 + 1).cast("int")))
        .withColumn("pad", (col("doc_id") % 2).cast("int"))
        .withColumn("flen", expr("CAST((144000 * br) div sr AS INT) + pad"))
        // header: FF FB (MPEG-1 Layer III), then bitrate/rate/padding
        .withColumn("b2", lpad(hex((col("doc_id") % 4 + 9) * 16 +
          (col("doc_id") % 3) * 4 + col("pad") * 2), 2, "0"))
        .withColumn("fh", concat(lit("FFFB"), col("b2"), lit("00"),
          expr("repeat('00', flen - 4)")))
        .withColumn("hexstr",
          when(col("doc_id") % 7 === 1,
            concat(lit("FFFBF400"), expr("repeat('00', 50)")))
          .when(col("doc_id") % 7 === 5,
            expr("substring(repeat(fh, n), 1, (flen * n - 10) * 2)"))
          .when(col("doc_id") % 7 === 3,
            concat(lit("494433040000" + "00000014"),
              expr("repeat('00', 20)"), expr("repeat(fh, n)")))
          .otherwise(expr("repeat(fh, n)")))
      val media = d.select(col("doc_id"), unhex(col("hexstr")).as("payload"),
        lit("application/octet-stream").as("mime"))
      Multimodal.withDecodedMeta(media, "payload", "mime")
        .select(col("doc_id"), col("media.mime").as("detected_mime"),
          col("media.n_frames").as("n_frames"),
          col("media.duration_ms").as("duration_ms"),
          col("media.byte_len").as("byte_len"))
        .orderBy("doc_id")
    }),


    // ----- seasonal (hour-of-day) baseline profile -------------------
    "q207_seasonal_baseline" -> ((s, dir) => {
      // the daily-shape profile a telemetry monitor alerts against:
      // per (event_type, hour-of-day) cell counts and DECIMAL-exact
      // mean values, flagged when a cell's mean deviates from its
      // type's overall mean by more than 20% — one partial-aggregated
      // pass to |types|·24 cells, a |types|-row broadcast join back
      val ev = rd(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_type"), hour(col("ts")).as("hod"), col("value"))
      val cells = ev.groupBy("event_type", "hod")
        .agg(count(lit(1)).as("n"),
          (sum(col("value").cast("decimal(28,12)")).cast("double") /
            count(lit(1)).cast("double")).as("_m"))
      val types = ev.groupBy("event_type")
        .agg((sum(col("value").cast("decimal(28,12)")).cast("double") /
          count(lit(1)).cast("double")).as("_mt"))
      cells.join(broadcast(types), "event_type")
        .select(col("event_type"), col("hod"), col("n"),
          r(col("_m"), 6).as("mean_value"),
          r(col("_mt"), 6).as("type_mean"),
          (abs(col("_m") - col("_mt")) > col("_mt") * 0.2).as("dev_flag"))
        .orderBy("event_type", "hod")
    }),


    // ----- per-column change histogram (update forensics) ------------
    "q208_change_columns" -> ((s, dir) => {
      // which columns drive the day's updates? — matched (source,
      // state) rows per pk, per-column IS-DISTINCT-FROM counts in ONE
      // aggregation pass, unpivoted to a (column, n_changed, share)
      // report: the forensics view behind q04's row-level classify
      val j = custSrc(s, dir).as("s")
        .join(custState(s, dir).as("t"),
          col("s.c_custkey") === col("t.c_custkey"))
      val cols = Seq("c_name", "c_acctbal", "c_mktsegment", "c_nationkey")
      val agg = j.agg(count(lit(1)).as("n_matched"),
        cols.map(c => sum(when(not(col(s"s.$c") <=> col(s"t.$c")), 1L)
          .otherwise(0L)).as(s"_ch_$c")): _*)
      agg.select(explode(array(cols.map(c =>
          struct(lit(c).as("column_name"), col(s"_ch_$c").as("n_changed"))): _*))
          .as("e"), col("n_matched"))
        .select(col("e.column_name").as("column_name"),
          col("e.n_changed").as("n_changed"), col("n_matched"),
          r(col("e.n_changed").cast("double") /
            col("n_matched").cast("double"), 6).as("change_share"))
        .orderBy("column_name")
    }),


    // ----- dedup savings ledger (rollout business case) --------------
    "q206_dedup_savings" -> ((s, dir) => {
      // what does the dedup rollout actually buy? — clusters over the
      // SHARED materialized near-dup pair set, min-id canonical per
      // cluster (Components labels ARE cluster minima, so the kept doc
      // is the one whose id equals its cluster), and the character
      // ledger: total vs kept vs savings share. One left join + one
      // 1-row aggregate beyond the cached pairs
      val pairs = nearDupPairsCached(s, dir)
      val comp = graft.operators.Components
        .connectedComponents(pairs, "id_a", "id_b")
      val docs = docsWithNearDups(s, dir)
        .select(col("doc_id"), length(col("text")).cast("long").as("chars"))
      val labeled = docs.join(comp, docs("doc_id") === comp("node"), "left")
        .select(col("doc_id"), col("chars"),
          coalesce(col("label"), col("doc_id")).as("cluster"))
      labeled.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("cluster")).as("n_clusters"),
          sum(col("chars")).as("chars_total"),
          sum(when(col("doc_id") === col("cluster"), col("chars"))
            .otherwise(lit(0L))).as("chars_kept"))
        .select(col("n_docs"), col("n_clusters"),
          (col("n_docs") - col("n_clusters")).as("n_dup_docs"),
          col("chars_total"), col("chars_kept"),
          r(lit(1.0) - col("chars_kept").cast("double") /
            col("chars_total").cast("double"), 6).as("savings_share"))
    }),


    // ----- session-quality dashboard (engagement analytics) ----------
    "q204_session_stats" -> ((s, dir) => {
      // the engagement report built ON q125's sessionizer: sessions
      // bucketed by duration (bounce / under 5 min / under 30 min /
      // longer), with counts, corpus shares, and exact DECIMAL-routed
      // mean events per bucket — one key exchange for the sessions,
      // one 4-row aggregation after
      val sess = graft.operators.Sequence.sessionize(
        rd(s, dir, "events"), "user_id", "ts", "event_id", gapSec = 1800L)
      val dur = col("end_sec") - col("start_sec")
      val b = sess.select(
        when(col("n_events") === 1, "a_bounce")
          .when(dur < 300, "b_under_5min")
          .when(dur < 1800, "c_under_30min")
          .otherwise("d_longer").as("bucket"),
        col("n_events"))
      val tot = b.agg(count(lit(1)).as("_n"))
      b.groupBy("bucket")
        .agg(count(lit(1)).as("n_sessions"),
          (sum(col("n_events").cast("decimal(28,0)")).cast("double") /
            count(lit(1)).cast("double")).as("_me"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_sessions"),
          r(col("n_sessions").cast("double") / col("_n").cast("double"), 6)
            .as("share"),
          r(col("_me"), 6).as("mean_events"))
        .orderBy("bucket")
    }),


    // ----- last-touch conversion attribution (as-of join) ------------
    "q202_attribution" -> ((s, dir) => {
      // which channel gets credit for each purchase? — the LAST click
      // or view at-or-before the purchase, per user, within a 72-hour
      // window; outside the window (or touchless) counts as
      // unattributed. The match is the as-of composition (q54's
      // operator): union + one key exchange + a running
      // last(ignoreNulls) carry — linear in touches + conversions,
      // never a per-pair theta join. Same-second touch collisions
      // dedupe to the largest event_id first, so the carry is
      // deterministic
      val ev = rd(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").cast("long").as("psec"))
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("ts").cast("long").as("tsec"),
          col("event_type").as("channel"), col("event_id"))
      val w = Window.partitionBy(col("user_id"), col("tsec"))
        .orderBy(col("event_id").desc)
      val uniq = touches.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select("user_id", "tsec", "channel")
      graft.operators.AsofJoin.backward(purchases, uniq,
          "user_id", "psec", "tsec", Seq("channel"))
        .select(when(col("asof_ts").isNotNull &&
            col("psec") - col("asof_ts") <= 259200, col("channel"))
          .otherwise(lit("unattributed")).as("attr"))
        .groupBy("attr")
        .agg(count(lit(1)).as("n_conversions"))
        .orderBy("attr")
    }),


    // ----- deterministic weighted priority sample (exact k) ----------
    "q197_priority_sample" -> ((s, dir) => {
      // exactly 15 lineitems with selection odds rising in l_quantity:
      // rank by draw/weight ascending (the priority-sampling shape,
      // md5 draw as the uniform) — one IEEE division per row, plans as
      // TakeOrderedAndProject, reproducible in any engine. Completes
      // the sampling triangle: exact-k uniform (q119), rate-weighted
      // variable-size (q67), exact-k weighted (this)
      graft.operators.Sampling.prioritySample(rd(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber"), "l_quantity", k = 15)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          r(col("_prio"), 6).as("priority"))
        .orderBy("priority", "l_orderkey", "l_linenumber")
    }),


    // ----- functional-dependency audit (schema inference gate) -------
    "q198_fd_audit" -> ((s, dir) => {
      // before declaring a key or collapsing a dimension: event_id
      // must determine user_id (it does — primary-key shape), and
      // user_id visibly does NOT determine event_type — both verdicts
      // with group counts, violation shares, and the worst group's
      // distinct count, each ONE partial-aggregated pass
      val ev = rd(s, dir, "events")
      graft.operators.Quality.functionalDependency(ev,
          Seq("event_id"), "user_id", "event_id->user_id")
        .unionByName(graft.operators.Quality.functionalDependency(ev,
          Seq("user_id"), "event_type", "user_id->event_type"))
        .orderBy("rule")
    }),


    // ----- Pareto frontier (multi-objective doc selection) -----------
    "q196_pareto_frontier" -> ((s, dir) => {
      // the skyline a data-selection pass keeps when two objectives
      // trade off — here MINIMIZE length, MAXIMIZE lexical quality
      // (distinct-token share on the 1e-6 lattice): a doc survives iff
      // no other doc is at most as long AND at least as good with one
      // strict edge. The O(n²) dominance test collapses to ONE
      // distributed running max: sorted by (len asc, q desc), a row is
      // undominated iff the inclusive running max of the packed
      // (q, -len) key is its OWN key — earlier rows are exactly the
      // candidate dominators, and key' > key is exactly strict
      // dominance. No SinglePartition stage (GlobalOrder.withRunningMax)
      val toks = rd(s, dir, "documents").select(col("doc_id"),
        col("n_chars"),
        split(TextAnalysis.normText(col("text")), " ").as("w"))
      val m = toks.select(col("doc_id"), col("n_chars"),
          size(array_distinct(col("w"))).cast("long").as("nd"),
          size(col("w")).cast("long").as("nt"))
        .filter(col("nt") > 0)
        .withColumn("q", expr("(1000000 * nd) div nt"))
      val key = col("q") * lit(1L << 21) +
        (lit((1L << 21) - 1) - least(col("n_chars").cast("long"),
          lit((1L << 21) - 1)))
      val fr = graft.operators.GlobalOrder.withRunningMax(
        m.withColumn("_key", key),
        Seq(col("n_chars").asc, col("q").desc, col("doc_id").asc),
        "_key", "hi")
      fr.filter(col("hi") === col("_key"))
        .select(col("doc_id"), col("n_chars"), col("q"))
        .orderBy("doc_id")
    }),


    // ----- event-time lateness audit (watermark planning) ------------
    "q194_lateness_audit" -> ((s, dir) => {
      // how late do events actually arrive? — the measurement a
      // streaming deployment reads BEFORE choosing its watermark. The
      // fixture stream is replayed with injected delivery delays
      // (every 10th event +90s, every 100th +900s, every 1000th
      // +7200s); each event's lateness is the high-water event time
      // at its arrival minus its own event time, bucketed to the
      // watermark ladder with corpus shares. The running max is
      // GlobalOrder.withRunningMax — no SinglePartition stage, where
      // the naive global window collapses 100 TB into one task
      val ev = rd(s, dir, "events").filter(col("ts").isNotNull)
        .select(col("event_id"), col("ts").cast("long").as("sec"))
        .withColumn("arr", col("sec") +
          when(col("event_id") % 1000 === 13, 7200L)
          .when(col("event_id") % 100 === 7, 900L)
          .when(col("event_id") % 10 === 0, 90L).otherwise(0L))
      val hi = graft.operators.GlobalOrder.withRunningMax(ev,
        Seq(col("arr").asc, col("event_id").asc), "sec", "hi")
      val b = hi.withColumn("late", col("hi") - col("sec"))
        .select(when(col("late") === 0, "a_on_time")
          .when(col("late") <= 60, "b_1min")
          .when(col("late") <= 600, "c_10min")
          .when(col("late") <= 3600, "d_1hour")
          .otherwise("e_later").as("bucket"))
      val tot = b.agg(count(lit(1)).as("_n"))
      b.groupBy("bucket").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n"),
          r(col("n").cast("double") / col("_n").cast("double"), 6).as("share"))
        .orderBy("bucket")
    }),


    // ----- ZIP central-directory census (archive ingest triage) ------
    "q210_zip_census" -> ((s, dir) => {
      // corpora often ARRIVE as archive bundles: the triage census
      // reads entry counts and size totals from the central directory
      // alone — no entry is decompressed. Archives assembled in-plan
      // (zeroed local region, real CD entries + EOCD with correct
      // offsets — the decoder only trusts the directory); the corrupt
      // class (doc_id % 11 == 7) truncates the EOCD: NULLs, never a
      // guess. The oracle predicts everything from doc_id arithmetic
      def le16(e: String) =
        s"concat(lpad(hex(($e) & 255), 2, '0'), " +
          s"lpad(hex(shiftright($e, 8) & 255), 2, '0'))"
      def le32(e: String) =
        s"concat(lpad(hex(($e) & 255), 2, '0'), " +
          s"lpad(hex(shiftright($e, 8) & 255), 2, '0'), " +
          s"lpad(hex(shiftright($e, 16) & 255), 2, '0'), " +
          s"lpad(hex(shiftright($e, 24) & 255), 2, '0'))"
      val d = rd(s, dir, "documents").select(col("doc_id"))
        .withColumn("n", (col("doc_id") % 4 + 1).cast("long"))
        .withColumn("sc", expr("aggregate(sequence(0L, n - 1), 0L, " +
          "(acc, i) -> acc + 100 + (doc_id + i) % 50)"))
        .withColumn("lsize", col("n") * 32 + col("sc"))
        .withColumn("cdhex", expr(
          s"""array_join(transform(sequence(0L, n - 1), i -> concat(
             |  '504B0102', '1400', '1400', '0000', '0000', '0000', '0000',
             |  '00000000',
             |  ${le32("100 + (doc_id + i) % 50")},
             |  ${le32("2 * (100 + (doc_id + i) % 50)")},
             |  '0200', '0000', '0000', '0000', '0000', '00000000',
             |  '00000000', '66', lpad(hex(48 + i), 2, '0'))), '')"""
            .stripMargin))
        .withColumn("eocd", expr(
          s"concat('504B0506', '0000', '0000', ${le16("n")}, ${le16("n")}, " +
            s"${le32("48 * n")}, ${le32("lsize")}, '0000')"))
        .withColumn("full", expr(
          "concat(repeat('00', CAST(lsize AS INT)), cdhex, eocd)"))
        .withColumn("hexstr", when(col("doc_id") % 11 === 7,
          expr("substring(full, 1, length(full) - 8)")).otherwise(col("full")))
      graft.operators.Archives.withZipMeta(
          d.select(col("doc_id"), unhex(col("hexstr")).as("payload")),
          "payload")
        .select(col("doc_id"), col("zip.n_entries").as("n_entries"),
          col("zip.bytes_comp").as("bytes_comp"),
          col("zip.bytes_uncomp").as("bytes_uncomp"),
          col("zip.byte_len").as("byte_len"))
        .orderBy("doc_id")
    }),


    // ----- TIFF IFD-walk dimension decode (both endians) -------------
    "q203_tiff_headers" -> ((s, dir) => {
      // TIFFs assembled in-plan in BOTH byte orders (doc_id % 2 picks
      // II vs MM — the endian dispatch is the whole point of the TIFF
      // container), dimensions decoded by Multimodal.parseTiff; the
      // corrupt class (doc_id % 9 == 4) declares an IFD offset past
      // EOF: recognized container, NULL dimensions. The oracle
      // predicts everything from doc_id arithmetic alone
      def le16h(c: Column) = concat(
        lpad(hex(c.bitwiseAND(lit(255))), 2, "0"),
        lpad(hex(shiftright(c, 8)), 2, "0"))
      def be16h(c: Column) = lpad(hex(c), 4, "0")
      val wv = (col("doc_id") % 900 + 100).cast("int")
      val hv = (col("doc_id") % 500 + 50).cast("int")
      val leHex = concat(
        lit("49492A00" + "08000000" + "0200" +
          "0001" + "0300" + "01000000"), le16h(wv), lit("0000"),
        lit("0101" + "0300" + "01000000"), le16h(hv), lit("0000"),
        lit("00000000"))
      val beHexS = concat(
        lit("4D4D002A" + "00000008" + "0002" +
          "0100" + "0003" + "00000001"), be16h(wv), lit("0000"),
        lit("0101" + "0003" + "00000001"), be16h(hv), lit("0000"),
        lit("00000000"))
      val payload = unhex(when(col("doc_id") % 9 === 4,
          lit("49492A00" + "FFFF0000"))
        .when(col("doc_id") % 2 === 0, leHex).otherwise(beHexS))
      val media = rd(s, dir, "documents").select(col("doc_id"),
        payload.as("payload"), lit("application/octet-stream").as("mime"))
      Multimodal.withDecodedMeta(media, "payload", "mime")
        .select(col("doc_id"), col("media.mime").as("detected_mime"),
          col("media.width").as("width"), col("media.height").as("height"),
          col("media.byte_len").as("byte_len"))
        .orderBy("doc_id")
    }),


    // ----- contiguous global sequence ids (curriculum ordering) ------
    "q122_global_sequence" -> ((s, dir) => {
      // number the corpus 0..N-1 by (n_chars desc, doc_id) with NO
      // single-partition stage: range exchange + per-partition offsets
      // (the un-partitioned row_number() window this replaces collapses
      // 100 TB into one task). PlanSpec asserts the shape.
      graft.operators.GlobalOrder.sequenceIds(
        rd(s, dir, "documents").select("doc_id", "source", "n_chars"),
        Seq(col("n_chars").desc, col("doc_id").asc), "global_pos")
        .select("doc_id", "n_chars", "global_pos")
        .orderBy("global_pos")
    }),


    // ----- per-key time-series gap fill (grid regularization) --------
    "q123_gap_fill" -> ((s, dir) => {
      // events per type per 15-minute bucket INCLUDING empty buckets:
      // each key's grid spans its own [min, max] bucket via sequence()
      // + explode — grid size is span-bound (constant across SFs), the
      // only data-sized shuffle is the bucket pre-aggregation
      graft.operators.Stats.gapFill(rd(s, dir, "events"),
        "event_type", "ts", "value", bucketSec = 900L)
        .select(col("key").as("event_type"), col("bucket_start"),
          col("n"), r(col("sum_val"), 6).as("sum_val"))
        .orderBy("event_type", "bucket_start")
    }),


    // ----- distribution drift between two snapshots ------------------
    "q124_distribution_drift" -> ((s, dir) => {
      // has this week's corpus moved? — l_extendedprice binned onto one
      // fixed 20-bin grid for two halves of the data, compared per bin
      // with the ln-free symmetric chi-square term (PSI/KL need libm);
      // each side collapses to <=20 rows before anything joins
      val li = rd(s, dir, "lineitem")
      graft.operators.Stats.distributionDrift(
        li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 === 1),
        "l_extendedprice", lo = 0.0, hi = 80000.0, bins = 20)
        .orderBy("bin")
    }),


    // ----- batch sessionization (gaps-and-islands) -------------------
    "q125_sessionize" -> ((s, dir) => {
      // one row per (user, session) with a 30-minute inactivity gap —
      // the batch twin of the streaming session_window path: one hash
      // exchange on the key, no global sort
      graft.operators.Sequence.sessionize(rd(s, dir, "events"),
        "user_id", "ts", "event_id", gapSec = 1800L)
        .select(col("key").as("user_id"), col("session_id"),
          col("start_sec"), col("end_sec"), col("n_events"))
        .orderBy("user_id", "session_id")
    }),


    // ----- PageRank over the customer-supplier interaction graph -----
    "q126_pagerank" -> ((s, dir) => {
      // authority scoring on the symmetric customer<->supplier graph
      // (edges from orders x lineitem, supplier ids offset into their own
      // range): 3 synchronous power steps, per-edge contributions snapped
      // to the 1e-12 lattice so the per-node sums are exact longs at any
      // parallelism — the oracle unrolls the identical three iterations.
      // The edge derivation (the fact-table join) is materialized once
      // per fixture content — the q127/q140/q161 build-once discipline,
      // shared DIRECTED with q176's HITS; symmetrizing is one cheap
      // union-of-reversal over the materialized frame
      val ed = csEdgesDirectedCached(s, dir)
      val sym = ed.unionByName(ed.select(col("b").as("a"), col("a").as("b")))
      graft.operators.Graph.pageRank(sym, "a", "b", iterations = 3)
        .orderBy(col("pr").desc, col("node"))
        .limit(25)
        .select(col("node"), r(col("pr"), 9).as("pagerank"))
    }),


    // ----- HITS hubs/authorities on the customer->supplier graph -----
    "q176_hits" -> ((s, dir) => {
      // which suppliers do the best-connected customers buy from? —
      // 2 unnormalized HITS steps over q126's DIRECTED edge frame
      // (normalization only rescales; skipping it keeps every score an
      // exact integer, so the ranking is bit-reproducible with zero
      // floats). Top 15 per role
      val scored = graft.operators.Graph.hitsBipartite(
        csEdgesDirectedCached(s, dir), "a", "b", iterations = 2)
        .select(col("role"), col("node"), col("score").cast("long").as("score"))
      val w = Window.partitionBy(col("role"))
        .orderBy(col("score").desc, col("node"))
      scored.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 15).drop("_rn")
        .orderBy(col("role"), col("score").desc, col("node"))
    }),


    // ----- triangle counting on the co-purchase graph ----------------
    "q127_triangles" -> ((s, dir) => {
      // parts CO-PURCHASED in >= 2 distinct orders form an edge (the
      // market-basket support threshold — a raw co-occurrence graph on
      // uniform baskets is near-regular and its wedge set grows as E²/V,
      // 50M rows at sf0.1; support pruning is how basket analysis keeps
      // the graph signal-bearing AND tractable); each triangle is then
      // found once from its canonical a<b<c orientation and credited to
      // its three corners with one explode — no distinct over pair sets.
      // The edge set itself comes from the build-once materialization
      // shared with q140: derive the graph once, run every metric on it
      val pairs = coPurchaseEdgesCached(s, dir)
      graft.operators.Graph.triangleCounts(pairs, "src", "dst")
        .orderBy(col("n_triangles").desc, col("node"))
        .limit(25)
    }),


    // ----- k-core peeling (dense-core extraction) --------------------
    "q140_kcore" -> ((s, dir) => {
      // the 3-core of the support-pruned co-purchase graph after three
      // synchronous peel rounds: per round one degree aggregation + two
      // left-semi joins; survivors persist so each round reads a
      // materialized frame, not a replayed lineage. The edge set comes
      // from the build-once materialization shared with q127
      val pairs = coPurchaseEdgesCached(s, dir)
      graft.operators.Graph.kCorePeel(pairs, "src", "dst", k = 3, rounds = 3)
        .orderBy("node")
    }),


    // ----- association rules from co-purchase baskets ----------------
    "q195_association_rules" -> ((s, dir) => {
      // market-basket rules over the build-once pair supports: both
      // rule directions per pair, confidence = s_pair/s_ant and
      // lift = N·s_pair/(s_ant·s_cons) — exact integer counts, one
      // IEEE divide each, lattice-snapped. Item supports and N are one
      // distinct-pass aggregation; pair supports come from the SHARED
      // materialized self-join (q127/q140/q161's graph), so the rule
      // mining never pays its own O(baskets²) pass
      val items = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val supp = items.groupBy("p").agg(count(lit(1)).as("s_item"))
      val nOrders = items.select("o").distinct().agg(count(lit(1)).as("_n"))
      val pairs = coPurchaseSupportCached(s, dir)
      val both = pairs
        .select(col("src").as("ant"), col("dst").as("cons"), col("support"))
        .unionByName(pairs
          .select(col("dst").as("ant"), col("src").as("cons"), col("support")))
      both
        .join(supp.select(col("p").as("ant"), col("s_item").as("s_ant")), "ant")
        .join(supp.select(col("p").as("cons"), col("s_item").as("s_cons")), "cons")
        .crossJoin(broadcast(nOrders))
        .select(col("ant"), col("cons"), col("support").as("s_pair"),
          col("s_ant"), col("s_cons"),
          r(col("support").cast("double") / col("s_ant").cast("double"), 6)
            .as("confidence"),
          r(col("_n").cast("double") * col("support").cast("double") /
            (col("s_ant").cast("double") * col("s_cons").cast("double")), 6)
            .as("lift"))
        .orderBy(col("lift").desc, col("ant"), col("cons"))
        .limit(25)
    }),


    // ----- robust (median/MAD) per-group scaling ---------------------
    "q130_robust_scale" -> ((s, dir) => {
      // outlier-resistant normalization of event values within each
      // type: exact interpolated median/MAD (group-sized aggregates +
      // broadcast joins — the data never shuffles on the group key)
      graft.operators.Stats.robustScalePerGroup(
        rd(s, dir, "events").select("event_id", "event_type", "value"),
        "event_type", "value")
        .select(col("event_id"), col("event_type"),
          r(col("robust_z"), 6).as("robust_z"))
        .orderBy("event_id")
    }),


    // ----- per-source quality deciles (calibration buckets) ----------
    "q131_quality_deciles" -> ((s, dir) => {
      // decile assignment WITHIN each source — the per-source calibration
      // that makes a single quality cutoff comparable across sources
      // with different score distributions; windows partition by source,
      // so they parallelize across groups
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      rd(s, dir, "documents").select("doc_id", "source", "n_chars")
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .orderBy("doc_id")
    }),


    // ----- weighted median per group ---------------------------------
    "q136_weighted_median" -> ((s, dir) => {
      // quantity-weighted median price per return flag: exact integer
      // cumulative weights, peer-inclusive RANGE frames — a data value,
      // reproducible anywhere, one exchange on the group key
      graft.operators.Stats.weightedMedianPerGroup(rd(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", "l_quantity")
        .select(col("key").as("l_returnflag"), col("weighted_median"))
        .orderBy("l_returnflag")
    }),


    // ----- Neyman-allocated stratified sample ------------------------
    "q135_neyman_sample" -> ((s, dir) => {
      // a 2000-row budget split across event types proportional to
      // N_h·S_h (= sqrt of the exact integer sum-of-squares) — the
      // allocation that minimizes downstream mean-estimator variance;
      // membership is the md5-cutoff draw, so the sample is rerun-stable
      graft.operators.Sampling.neymanSample(
        rd(s, dir, "events").select("event_id", "event_type", "value"),
        "event_type", Seq("event_id"), "value", totalN = 2000L)
        .orderBy("event_id")
    }),


    // ----- per-group binned quantiles (group-scale percentiles) ------
    "q134_group_quantiles" -> ((s, dir) => {
      // p50/p90 of value WITHIN each event type from one count pass —
      // the percentile path that scales to millions of groups: <=25
      // rows per group after the first aggregation, cumulative windows
      // partitioned BY KEY (parallel), exact integer counts
      graft.operators.Stats.binnedQuantilesPerGroup(rd(s, dir, "events"),
        "event_type", "value", lo = 0.0, hi = 500.0, bins = 25,
        qs = Seq(0.5, 0.9))
        .select(col("key").as("event_type"), col("q"), col("bin"),
          r(col("quantile_est"), 6).as("quantile_est"))
        .orderBy("event_type", "q")
    }),


    // ----- daily drift trend (the monitoring series) -----------------
    "q133_drift_trend" -> ((s, dir) => {
      // each day's value histogram scored against the previous day —
      // the dashboard series behind "did yesterday's ingest move?":
      // one pass to (day, bin) counts, predecessor via a shifted-key
      // equi-join (no window, no sort), drift on the 1e-12 lattice
      graft.operators.Stats.driftOverTime(rd(s, dir, "events"),
        "ts", "value", bucketSec = 86400L, lo = 0.0, hi = 500.0, bins = 20)
        .orderBy("bucket_start")
    }),


    // ----- native bounded-heap per-group top-k -----------------------
    "q132_topk_per_group" -> ((s, dir) => {
      // top-5 priciest lineitems per return flag via the native
      // top_k_pairs aggregate: O(k) state per group, partial heaps merge
      // map-side — the window formulation this replaces buffers and
      // sorts every row of every group before discarding all but k
      val agg = rd(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.TopKPairs.topK(
          col("l_extendedprice"), col("l_orderkey"), k = 5).as("top"))
      agg.select(col("l_returnflag"), posexplode(col("top")))
        .select(col("l_returnflag"), (col("pos") + 1).cast("long").as("rank"),
          col("col.score").as("price"), col("col.id").as("l_orderkey"))
        .orderBy("l_returnflag", "rank")
    }),


    // ----- native mergeable exact distinct-count ---------------------
    "q138_bitmap_distinct" -> ((s, dir) => {
      // distinct buying customers + order volume per priority via the
      // bitmap_distinct aggregate: exact like COUNT(DISTINCT) but ONE
      // partial-aggregated pass — no Expand duplicating every row per
      // aggregate, no (group, custkey)-keyed exchange; the shuffle
      // carries one sparse bitmap per (task, group)
      rd(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(graft.functions.BitmapDistinct.bitmapDistinct(col("o_custkey"))
          .as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),


    // ----- exactly-n deterministic sample (eval-set carving) ---------
    "q119_exact_n_sample" -> ((s, dir) => {
      // the 40 documents with the smallest uniform draw — an exact-size
      // eval set carved rerun-stably; plans as TakeOrderedAndProject
      // (bounded per-task heaps), never a full sort
      graft.operators.Sampling.exactNSample(
        rd(s, dir, "documents").select("doc_id", "source", "n_chars"),
        Seq("doc_id"), n = 40)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    }),


    // ----- binned quantile sketch (reproducible percentile at scale) -
    "q118_binned_quantiles" -> ((s, dir) => {
      // l_quantity quantiles from a 25-bin [0, 50] histogram: one count
      // pass with exact integer bin counts, then interpolation over
      // <=25 rows — the percentile path that survives 100 TB and
      // hash-reproduces anywhere (exact sort-based percentile per column
      // does not scale; approx_percentile's sketch is engine-specific)
      graft.operators.Stats.binnedQuantiles(rd(s, dir, "lineitem"),
        "l_quantity", lo = 0.0, hi = 50.0, bins = 25,
        qs = Seq(0.1, 0.5, 0.9, 0.99))
        .select(col("q"), col("bin"),
          r(col("quantile_est"), 6).as("quantile_est"))
        .orderBy("q")
    }),


    // ----- declarative data-quality expectations ---------------------
    // ----- multi-field entity resolution (Fellegi-Sunter lite) -------
    "q154_entity_resolution" -> ((s, dir) => {
      // typo-and-alias-tolerant record linkage over a dirtied customer
      // table: clones with one name typo (found by the ed1 name block)
      // and clones with a rewritten name but the same account balance
      // (found by the acctbal block); weighted agreement across four
      // fields decides. The oracle is the BRUTE-FORCE O(n^2) scorer —
      // equality proves multi-pass blocking loses no above-threshold
      // pair (guaranteed: threshold 60 > unblocked weight sum 30)
      val base = rd(s, dir, "customer").filter(col("c_custkey") <= 600)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      val typo = base.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 100000).as("c_custkey"),
          concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("x")).as("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      val alias = base.filter(col("c_custkey") % 15 === 0)
        .select((col("c_custkey") + 200000).as("c_custkey"),
          concat(col("c_name"), lit("_alt")).as("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      graft.operators.EntityResolution.linkPairs(
        base.unionByName(typo).unionByName(alias),
        "c_custkey", "c_name", nameWeight = 40,
        exactCols = Seq("c_acctbal" -> 30, "c_nationkey" -> 20, "c_mktsegment" -> 10),
        blockCols = Seq("c_acctbal"), threshold = 60)
        .orderBy("id_a", "id_b")
    }),


    // ----- k-anonymity audit (privacy gate on quasi-identifiers) -----
    "q152_k_anonymity" -> ((s, dir) => {
      // how re-identifiable is the customer table by (nation, market
      // segment)? Rows in QI groups smaller than k=10 are at risk —
      // the audit a dataset passes before those columns ship. Two
      // aggregation passes; the second touches group-count rows only
      graft.operators.Quality.kAnonymity(
        rd(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 10)
    }),


    "q145_data_quality" -> ((s, dir) => {
      // the pre-commit validation gate: five named row-level rules in
      // ONE aggregation pass (a NULL predicate counts as a violation)
      // plus a referential-integrity anti-join, one report row per rule
      val li = rd(s, dir, "lineitem")
      val rowRules = graft.operators.Quality.checkRules(li, Seq(
        "qty_in_1_50" -> col("l_quantity").between(1, 50),
        "price_positive" -> (col("l_extendedprice") > 0),
        "discount_at_most_10pct" -> (col("l_discount") <= 0.10),
        "qty_at_most_30" -> (col("l_quantity") <= 30),
        "returnflag_known" -> col("l_returnflag").isin("A", "N", "R")))
      val fk = graft.operators.Quality.checkForeignKey(
        li, "l_orderkey", rd(s, dir, "orders"), "o_orderkey",
        "orderkey_references_orders")
      rowRules.unionByName(fk).orderBy("rule")
    }),


    // ----- join-cardinality forecast (the pre-join measurement) ------
    "q144_join_cardinality" -> ((s, dir) => {
      // exact output size of the lineitem-by-partkey SELF-join (the
      // explosion behind every co-purchase/pair build) forecast from
      // per-key counts alone — two aggregation passes and one
      // key-cardinality join, never the join itself; the top keys name
      // exactly what to salt, broadcast, or support-prune
      val li = rd(s, dir, "lineitem").select("l_partkey")
      graft.operators.Skew.joinCardinality(li, li, "l_partkey", topK = 15)
    }),


    // ----- key-distribution profile (the pre-salting measurement) ----
    "q117_key_profile" -> ((s, dir) => {
      // heaviest order keys in lineitem with share + skew factor — the
      // measurement that decides whether a join needs salting at all:
      // one count-per-key aggregation, two 1-row global aggregates
      // folded in, bounded top-k; no collect, no full sort
      graft.operators.Skew.keyProfile(rd(s, dir, "lineitem"),
        "l_orderkey", topK = 25)
        .select(col("l_orderkey"), col("n"),
          r(col("share") * 1000000, 6).as("share_ppm"),
          r(col("skew_factor"), 6).as("skew_factor"))
        .orderBy(col("n").desc, col("l_orderkey").asc)
    }),


    // ----- BMP pixel-level decode: NN resize + exact channel means ---
    "q113_image_pixels" -> ((s, dir) => {
      // 2x2 uncompressed 24-bit BMPs assembled in-plan (fixed 54-byte
      // header; per-pixel BGR bytes from doc_id arithmetic), resized to
      // 1x1 by the REAL nearest-neighbor path (picks image pixel (0,0)),
      // then aggregated by the REAL pixel-stats op — the oracle predicts
      // every channel mean from doc_id arithmetic alone. doc_id % 6 == 5
      // rows carry a truncated header: stub resize path (byte_len 0) and
      // NULL stats — the honest-unknown contract.
      def b8(c: Column) = lpad(hex(pmod(c, lit(256))), 2, "0")
      val id = col("doc_id")
      def px(x: Int, y: Int) = concat(
        b8(id * 3 + 10 * x + 7 * y), b8(id * 5 + 4 * x + y),
        b8(id * 7 + x + 2 * y))
      val hdr = lit("424D" + "46000000" + "00000000" + "36000000" + // BM,70,off 54
        "28000000" + "02000000" + "02000000" + "0100" + "1800" +    // 40,2x2,24bpp
        "00000000" + "10000000" + "130B0000" + "130B0000" +         // raw,16B,2835dpi
        "00000000" + "00000000")
      // rows stored bottom-up: image y=1 first, then y=0; stride 8 = 2px + pad
      val good = concat(hdr, px(0, 1), px(1, 1), lit("0000"),
        px(0, 0), px(1, 0), lit("0000"))
      val bad = lit("424D46000000000000003600") // truncated mid-header
      val payload = unhex(when(id % 6 === 5, bad).otherwise(good))
      val media = rd(s, dir, "documents").select(id,
        payload.as("payload"), lit("application/octet-stream").as("mime"))
      val resized = Multimodal.resizeTo(
        Multimodal.withDecodedMeta(media, "payload", "mime"), 1, 1)
      Multimodal.imageStats(resized)
        .select(col("doc_id"),
          col("img.mean_b").as("mean_b"), col("img.mean_g").as("mean_g"),
          col("img.mean_r").as("mean_r"), col("img.mean_luma").as("mean_luma"),
          col("img.width").as("width"), col("img.height").as("height"),
          col("media.byte_len").as("byte_len"))
        .orderBy("doc_id")
    }),


    // ----- PNG pixel decode: real zlib inflate + unfilter ------------
    "q182_png_pixels" -> ((s, dir) => {
      // 2x2 RGB PNGs assembled in-plan: a stored-mode deflate block
      // (the one zlib form SQL arithmetic can emit) whose Adler-32 is
      // COMPUTED from the same doc_id byte formulas — the decoder runs
      // the REAL java.util.zip inflate (which verifies that checksum)
      // and the REAL scanline unfilter (row 1 uses filter 2 = Up, so
      // the stored bytes are deltas the decoder must reconstruct).
      // Three row classes: good; doc_id % 6 == 3 carries a zeroed
      // Adler (structurally perfect, checksum wrong -> decode REJECTS,
      // proving the verification actually runs); % 6 == 5 truncated.
      val id = col("doc_id")
      def pm(c: Column) = pmod(c, lit(256))
      def b8(c: Column) = lpad(hex(pm(c)), 2, "0")
      // pixel channel bytes: r = 3id+10x+7y, g = 5id+4x+y, b = 7id+x+2y
      val row0 = concat(lit("00"), b8(id * 3), b8(id * 5), b8(id * 7),
        b8(id * 3 + 10), b8(id * 5 + 4), b8(id * 7 + 1))
      val row1 = lit("02" + "070102" + "070102") // Up filter: constant deltas
      // Adler-32 over the 14 raw bytes (A = 1+Σb, B = 14+Σ(15-i)·b_i)
      val sumPx = pm(id * 3) + pm(id * 5) + pm(id * 7) +
        pm(id * 3 + 10) + pm(id * 5 + 4) + pm(id * 7 + 1)
      val a32 = pmod(lit(1) + sumPx + lit(22), lit(65521))
      val b32 = pmod(lit(108) + pm(id * 3) * 13 + pm(id * 5) * 12 +
        pm(id * 7) * 11 + pm(id * 3 + 10) * 10 + pm(id * 5 + 4) * 9 +
        pm(id * 7 + 1) * 8, lit(65521))
      val adler = lpad(hex(b32 * 65536 + a32), 8, "0")
      val sig = lit("89504E470D0A1A0A")
      val ihdr = lit("0000000D" + "49484452" + "00000002" + "00000002" +
        "08" + "02" + "00" + "00" + "00" + "00000000")
      def idat(ad: Column) = concat(lit("00000019" + "49444154" +
        "7801" + "01" + "0E00" + "F1FF"), row0, row1, ad, lit("00000000"))
      val iend = lit("00000000" + "49454E44" + "00000000")
      val good = concat(sig, ihdr, idat(adler), iend)
      val badAdler = concat(sig, ihdr, idat(lit("00000000")), iend)
      val truncated = lit("89504E470D0A1A0A0000000D49484452")
      val payload = unhex(when(id % 6 === 5, truncated)
        .when(id % 6 === 3, badAdler).otherwise(good))
      val media = rd(s, dir, "documents").select(id,
        payload.as("payload"), lit("image/png").as("mime"))
      Multimodal.imageStats(media)
        .select(col("doc_id"),
          col("img.mean_b").as("mean_b"), col("img.mean_g").as("mean_g"),
          col("img.mean_r").as("mean_r"), col("img.mean_luma").as("mean_luma"),
          col("img.width").as("width"), col("img.height").as("height"))
        .orderBy("doc_id")
    }),


    // ----- JPEG pixel decode: in-repo baseline Huffman+IDCT ----------
    "q293_jpeg_progressive" -> ((s, dir) => {
      // SOF2 progressive decode under the q258 discipline: DC-only
      // progressive fixtures (DC-first at Al=1 → DC refinement → AC
      // band as EOBn run or per-block EOBs with restart resync) whose
      // fully-refined pixels the oracle predicts from doc_id arithmetic
      // — the engine must get there through real multi-scan coefficient
      // accumulation; the truncated class must refuse (NULL stats)
      import s.implicits._
      val media = rd(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(d => (d, jpegProgressiveFixturePayload(d)))
        .toDF("doc_id", "payload")
        .withColumn("mime", lit("image/jpeg"))
      Multimodal.imageStats(media)
        .select(col("doc_id"),
          col("img.mean_luma").as("mean_luma"),
          col("img.width").as("width"), col("img.height").as("height"))
        .orderBy("doc_id")
    }),

    "q258_jpeg_pixels" -> ((s, dir) => {
      // DC-only baseline JPEGs built per doc_id by the in-repo encoder
      // (graft.operators.Jpeg) — quant step 8 makes flat 8×8 blocks
      // round-trip EXACTLY, so the oracle predicts every pixel from
      // doc_id arithmetic while the engine must arrive at them through
      // the REAL marker walk + DHT-built Huffman decode + IDCT +
      // fixed-point YCbCr→RGB (the encoder writes standard Annex K
      // tables into the file; JpegSpec cross-checks the same fixtures
      // against javax.imageio, so encoder/decoder bugs can't cancel).
      // Five row classes by doc_id % 6: grayscale (0, 1), 4:4:4 color
      // (2), 4:2:0 color with chroma replication (4), corrupt entropy
      // — a stray marker mid-scan (3), truncated mid-header (5); both
      // damage classes must refuse (NULL stats), and Malformed is
      // TERMINAL — the imageio fallback never sees them
      import s.implicits._
      val media = rd(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(d => (d, jpegFixturePayload(d)))
        .toDF("doc_id", "payload")
        .withColumn("mime", lit("image/jpeg"))
      Multimodal.imageStats(media)
        .select(col("doc_id"),
          col("img.mean_b").as("mean_b"), col("img.mean_g").as("mean_g"),
          col("img.mean_r").as("mean_r"), col("img.mean_luma").as("mean_luma"),
          col("img.width").as("width"), col("img.height").as("height"))
        .orderBy("doc_id")
    }),


    // ----- crawl-pipeline capstone: WARC → robots → LM score ---------
    "q272_crawl_pipeline" -> ((s, dir) => {
      // the composed crawl chain, every stage a proven operator: WARC
      // container walk (gzip-member per odd doc; every 7th truncated →
      // wholesale refusal) → HTTP body extraction → URL parse →
      // robots.txt admission (every domain blocks /blk/ except every
      // 5th, which has no robots) → bigram-LM fluency scored under a
      // model trained on the admitted d%3==1 slice → per-language
      // rollup. Bodies carry the real documents.text, so the oracle
      // re-derives the survivor set as arithmetic and reuses the q266
      // LM formulation over it — one hash mismatch anywhere in the
      // five-stage chain fails the gate
      import s.implicits._
      val media = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (d, t) => (d, warcCrawlPayload(d, t)) }
        .toDF("doc_id", "payload")
      val resp = graft.operators.Warc.records(media)
        .filter(col("warc_type") === "response")
        .withColumn("dec", expr("decode(payload, 'UTF-8')"))
        .withColumn("body",
          expr("substring(dec, instr(dec, '\r\n\r\n') + 4)"))
        .withColumn("domain", expr("parse_url(target_uri, 'HOST')"))
        .withColumn("upath", expr("parse_url(target_uri, 'PATH')"))
        .select("doc_id", "domain", "upath", "body")
      val robots = s.range(20).select(
        concat(lit("d"), col("id"), lit(".ex.org")).as("domain"),
        when(col("id") % 5 === 0, lit(null).cast("string"))
          .otherwise(lit("User-agent: *\nDisallow: /blk/")).as("robots_txt"))
      val admitted = graft.operators.Robots.admit(resp, robots,
          "domain", "upath", "robots_txt", agent = "graftbot/1.0")
        .filter(col("allowed"))
        .select("doc_id", "body")
      val model = graft.operators.LanguageModel.train(
        admitted.filter(col("doc_id") % 3 === 1), "doc_id", "body")
      val scored = graft.operators.LanguageModel.score(
        admitted, "doc_id", "body", model)
      scored.join(rd(s, dir, "documents").select("doc_id", "lang"), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_pairs")).as("sum_pairs"),
          sum(col("oov")).as("sum_oov"),
          sum(col("fluency")).as("sum_fluency"))
        .orderBy("lang")
    }),


    // ----- encoding triage + mojibake repair -------------------------
    "q271_encoding_repair" -> ((s, dir) => {
      // six byte classes per doc: clean UTF-8 (0), UTF-8 with a real
      // multibyte char (1), Latin-1 bytes (2), DOUBLE-ENCODED UTF-8 —
      // the "Ã©" corruption, must repair to "é" (3), BOM-prefixed (4),
      // invalid trailing bytes -> total Latin-1 fallback (5). The md5
      // of the FINAL text is gated, so the validator, the fallback
      // decode, the BOM strip, and the repair must all land exactly
      import s.implicits._
      val media = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (d, text) =>
          val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val p: Array[Byte] = (d % 6).toInt match {
            case 0 => tb
            case 1 => tb ++ Array(0xC3.toByte, 0xA9.toByte) // é
            case 2 => tb :+ 0xE9.toByte // Latin-1 é
            case 3 => tb ++ Array(0xC3.toByte, 0x83.toByte, 0xC2.toByte,
              0xA9.toByte) // UTF-8 of "Ã©": é double-encoded
            case 4 => Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ tb
            case _ => tb ++ Array(0xFF.toByte, 0xFE.toByte)
          }
          (d, p)
        }.toDF("doc_id", "payload")
      graft.operators.Encoding.decodedText(media)
        .select(col("doc_id"),
          col("ctext.encoding").as("encoding"),
          col("ctext.bom").as("bom"),
          col("ctext.repaired").as("repaired"),
          col("ctext.n_chars").as("n_chars"),
          md5(expr("encode(ctext.text, 'utf-8')")).as("text_md5"))
        .orderBy("doc_id")
    }),


    // ----- robots.txt admission (RFC 9309) ---------------------------
    "q270_robots_admission" -> ((s, dir) => {
      // 20 synthetic domains, robots bodies from domain arithmetic
      // (wildcard + $-anchored rule on every 4th domain, NO robots on
      // every 5th), six URL classes per doc exercising prefix block,
      // longer-Allow override, no-match, anchored match and anchored
      // MISS (query string defeats $), and a near-miss block prefix.
      // The oracle predicts every verdict and matched rule from the
      // same arithmetic; the engine must get there through real
      // parsing, group selection, and longest-match precedence
      import s.implicits._
      val robots = s.range(20).select(
        concat(lit("d"), col("id")).as("domain"),
        when(col("id") % 5 === 0, lit(null).cast("string")).otherwise(concat(
          lit("User-agent: *\nDisallow: /blk"), col("id") % 3,
          lit("/\nAllow: /blk"), col("id") % 3, lit("/open"),
          when(col("id") % 4 === 0, lit("\nDisallow: /*.tmp$"))
            .otherwise(lit("")))).as("robots_txt"))
      val urls = rd(s, dir, "documents").select(col("doc_id"))
        .withColumn("dm", col("doc_id") % 20)
        .select(col("doc_id"), concat(lit("d"), col("dm")).as("domain"),
          when(col("doc_id") % 6 === 0,
            concat(lit("/blk"), col("dm") % 3, lit("/page"), col("doc_id")))
          .when(col("doc_id") % 6 === 1,
            concat(lit("/blk"), col("dm") % 3, lit("/open/page"), col("doc_id")))
          .when(col("doc_id") % 6 === 2, concat(lit("/pub/page"), col("doc_id")))
          .when(col("doc_id") % 6 === 3,
            concat(lit("/x/file"), col("doc_id"), lit(".tmp")))
          .when(col("doc_id") % 6 === 4,
            concat(lit("/x/file"), col("doc_id"), lit(".tmp?x=1")))
          .otherwise(concat(lit("/blk"), (col("dm") + 1) % 3, lit("/p")))
          .as("path"))
      graft.operators.Robots.admit(urls, robots, "domain", "path",
          "robots_txt", agent = "graftbot/1.0")
        .select(col("doc_id"), col("domain"), col("path"),
          col("allowed"), col("matched_rule"))
        .orderBy("doc_id")
    }),


    // ----- WARC crawl-archive ingest ---------------------------------
    "q267_warc_ingest" -> ((s, dir) => {
      // the Common Crawl container walk: per-doc WARC fixtures whose
      // record sizes are doc_id arithmetic, in both delivery shapes —
      // plain concatenation (0) and one gzip member per record (1, the
      // crawl convention, inflated through the q261 tier); truncated
      // (2) and non-WARC (3) payloads refuse WHOLESALE (zero rows — a
      // half-parsed crawl file is corruption, not data). Response
      // records carry real HTTP messages; body_length proves the
      // header/body split
      import s.implicits._
      val media = rd(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(d => (d, warcFixturePayload(d)))
        .toDF("doc_id", "payload")
      val agg = graft.operators.Warc.records(media)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_records"),
          sum(when(col("warc_type") === "response", 1L).otherwise(0L))
            .as("n_response"),
          sum(col("content_length")).as("sum_content"),
          sum(coalesce(col("body_length"), lit(0L))).as("sum_body"))
      rd(s, dir, "documents").select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_records"), lit(0L)).as("n_records"),
          coalesce(col("n_response"), lit(0L)).as("n_response"),
          coalesce(col("sum_content"), lit(0L)).as("sum_content"),
          coalesce(col("sum_body"), lit(0L)).as("sum_body"))
        .orderBy("doc_id")
    }),


    // ----- TIFF pixel decode: strip walk + PackBits ------------------
    "q264_tiff_pixels" -> ((s, dir) => {
      // six classes by doc_id: gray LE uncompressed (0), gray BE
      // PackBits with WhiteIsZero inversion and 2-row strips (1), RGB
      // LE uncompressed (2), RGB BE PackBits multi-strip (3),
      // truncated (4) and non-TIFF bytes (5) — both refuse to NULL.
      // Pixels are doc_id arithmetic, so the oracle predicts every
      // channel mean while the engine must arrive through the real IFD
      // walk, strip assembly, PackBits expansion, and inversion
      import s.implicits._
      val media = rd(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(d => (d, tiffFixturePayload(d)))
        .toDF("doc_id", "payload")
        .withColumn("mime", lit("image/tiff"))
      Multimodal.imageStats(media)
        .select(col("doc_id"),
          col("img.mean_b").as("mean_b"), col("img.mean_g").as("mean_g"),
          col("img.mean_r").as("mean_r"), col("img.mean_luma").as("mean_luma"),
          col("img.width").as("width"), col("img.height").as("height"))
        .orderBy("doc_id")
    }),


    // ----- MP4 sample-table walk: frame census + keyframe plan -------
    "q262_mp4_sample_plan" -> ((s, dir) => {
      // ISO-BMFF fixtures whose stbl tables are pure doc_id arithmetic
      // (see mp4FixturePayload): the engine must recover frame counts,
      // keyframe sets, durations, and ABSOLUTE sample offsets through
      // the real trak/mdia/stbl walk (stts run-length expansion, stsc x
      // stco chunk mapping, stss sync table with its absent-means-all
      // default), then emit the keyframe RANGED-READ plan — offsets are
      // re-based to the first sample so the oracle stays pure
      // arithmetic. Classes: stss every 3rd (0), no stss — all sync
      // (1), video+audio two-track (2, the soun track must not leak
      // into the plan), truncated mid-moov (3, NULL census, no plan
      // rows), non-media bytes (4, same)
      import s.implicits._
      val media = rd(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(d => (d, mp4FixturePayload(d)))
        .toDF("doc_id", "payload")
      val census = graft.operators.Mp4.videoCensus(media)
        .select(col("doc_id"),
          col("video.n_frames").as("n_frames"),
          col("video.n_keyframes").as("n_keyframes"),
          col("video.duration_ms").as("duration_ms"),
          col("video.total_bytes").as("total_bytes"))
      val planAgg = graft.operators.Mp4.keyframePlan(media)
        .groupBy("doc_id")
        .agg((sum(col("offset")) - count(lit(1)) * min(col("offset")))
            .as("kf_rel_offset_sum"),
          sum(col("size")).as("kf_size_sum"),
          max(col("dts_ms")).as("max_kf_dts_ms"))
      census.join(planAgg, Seq("doc_id"), "left").orderBy("doc_id")
    }),


    // ----- compressed-text ingest (gzip/zlib decode tier) ------------
    "q261_compressed_ingest" -> ((s, dir) => {
      // six payload classes by doc_id: gzip member (0), raw zlib (1),
      // concatenated two-member gzip — text delivered twice (2), gzip
      // with a flipped CRC-32 trailer byte — MUST refuse (3), gzip
      // truncated mid-trailer — MUST refuse (4), plain passthrough (5,
      // "p "-prefixed so the magic-byte sniff cannot misread it). The
      // oracle predicts codec + decoded length from documents.text
      // alone, so the whole compress→sniff→inflate→verify chain is on
      // the hook; refusal classes must surface as NULLs, not crashes
      import s.implicits._
      val payloads = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (d, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val z = graft.operators.TextCompression
          val p: Array[Byte] = (d % 6).toInt match {
            case 0 => z.gzip(bytes)
            case 1 => z.zlib(bytes)
            case 2 => z.gzip(bytes) ++ z.gzip(bytes)
            case 3 =>
              val g = z.gzip(bytes) // trailer = CRC32(4) ++ ISIZE(4)
              g.updated(g.length - 5, (g(g.length - 5) ^ 0x55).toByte)
            case 4 => z.gzip(bytes).dropRight(6)
            case _ => ("p " + text).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
          (d, p)
        }.toDF("doc_id", "payload")
      graft.operators.TextCompression.decompressedText(payloads)
        .select(col("doc_id"),
          col("ztext.codec").as("codec"),
          length(col("ztext.text")).cast("long").as("n_chars"),
          col("ztext.text_bytes").as("text_bytes"))
        .orderBy("doc_id")
    }),


    // ----- mixed-payload decode census (the full dispatch) -----------
    "q185_media_census" -> ((s, dir) => {
      // one frame, six payload classes round-robin by doc_id: BMP
      // (pixel tier), WAV (sample tier), PNG header-only (header tier:
      // dims real, no pixels), plain text (stub tier), NULL, and a REAL
      // baseline JPEG (decoded by the in-repo Jpeg tier since q258;
      // imageio is the Unsupported-only fallback). The census counts
      // each class's sniffed mime x pixel-decodability — the triage
      // report a media-lake ingest runs first
      val id = col("doc_id")
      val bmp = "424D" + "3A000000" + "00000000" + "36000000" +
        "28000000" + "01000000" + "01000000" + "0100" + "1800" +
        "00000000" + "04000000" + "130B0000" + "130B0000" +
        "00000000" + "00000000" + "80402000"
      val wav = "52494646" + "28000000" + "57415645" +
        "666D7420" + "10000000" + "0100" + "0100" + "401F0000" + "803E0000" +
        "0200" + "1000" + "64617461" + "04000000" + "E803" + "18FC"
      val pngHdr = "89504E470D0A1A0A" + "0000000D" + "49484452" +
        "00000040" + "00000030" + "0802000000" + "00000000"
      // a REAL 8x8 baseline JPEG (solid color), bytes produced by the
      // same JDK codec that decodes it — the codec-tier class: header
      // walk yields real dims AND parseJpeg yields real pixels
      val jpeg = Multimodal.tinyJpegHex
      val payload = when(id % 6 === 0, unhex(lit(bmp)))
        .when(id % 6 === 1, unhex(lit(wav)))
        .when(id % 6 === 2, unhex(lit(pngHdr)))
        .when(id % 6 === 3, lit("plain text, not media").cast("binary"))
        .when(id % 6 === 5, unhex(lit(jpeg)))
        .otherwise(lit(null).cast("binary"))
      val media = rd(s, dir, "documents").select(id,
        payload.as("payload"), lit("application/octet-stream").as("mime"))
      val dec = Multimodal.withDecodedMeta(media, "payload", "mime")
      Multimodal.imageStats(Multimodal.audioStats(dec))
        .groupBy(col("media.mime").as("sniffed_mime"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("media.width").isNotNull, 1L).otherwise(0L))
            .as("n_with_dims"),
          sum(when(col("img").isNotNull, 1L).otherwise(0L))
            .as("n_pixel_decodable"),
          sum(when(col("audio").isNotNull, 1L).otherwise(0L))
            .as("n_sample_decodable"))
        .orderBy("sniffed_mime")
    }),


    // ----- GIF pixel decode: real LZW decompression ------------------
    "q184_gif_pixels" -> ((s, dir) => {
      // 2x2 GIFs assembled in-plan: a literal-code LZW stream (CLEAR +
      // four 9-bit pixel codes + END packs into ONE 54-bit integer
      // whose bytes SQL arithmetic can emit) over an identity-grayscale
      // 256-color table; the engine must reconstruct the pixels through
      // the REAL variable-width LZW decompressor. Row classes:
      // doc_id % 6 == 1 carries an out-of-range first code (corrupt
      // stream -> decode REJECTS), % 6 == 5 truncates mid-header.
      val id = col("doc_id")
      def pm(c: Column) = pmod(c, lit(256))
      def b8(c: Column) = lpad(hex(pmod(c, lit(256))), 2, "0")
      // pixels (0,0),(1,0),(0,1),(1,1) = r-channel formulas of q182
      val Seq(p1, p2, p3, p4) =
        Seq(id * 3, id * 3 + 10, id * 3 + 7, id * 3 + 17).map(pm)
      // codes [256, p1, p2, p3, p4, 257] @9 bits LSB-first = one long
      val v = lit(256L) + p1 * lit(512L) + p2 * lit(262144L) +
        p3 * lit(134217728L) + p4 * lit(68719476736L) +
        lit(257L * 35184372088832L)
      // byte extraction stays in LONG arithmetic (v exceeds 2^53, so a
      // double divide would round): shiftright then mod
      val codeBytes = (0 until 7).map(i =>
        b8(shiftright(v, 8 * i))).reduce(concat(_, _))
      val grayPalette = (0 until 256).map(i => f"$i%02X" * 3).mkString
      val head = "474946383961" + "0200" + "0200" + "F7" + "00" + "00" +
        grayPalette + "2C" + "00000000" + "0200" + "0200" + "00" + "08" + "07"
      val good = concat(lit(head), codeBytes, lit("00" + "3B"))
      val corrupt = lit(head + "FFFFFFFFFFFFFF" + "00" + "3B")
      val truncated = lit("47494638396102000200F7")
      val payload = unhex(when(id % 6 === 5, truncated)
        .when(id % 6 === 1, corrupt).otherwise(good))
      val media = rd(s, dir, "documents").select(id,
        payload.as("payload"), lit("image/gif").as("mime"))
      Multimodal.imageStats(media)
        .select(col("doc_id"),
          col("img.mean_b").as("mean_b"), col("img.mean_g").as("mean_g"),
          col("img.mean_r").as("mean_r"), col("img.mean_luma").as("mean_luma"),
          col("img.width").as("width"), col("img.height").as("height"))
        .orderBy("doc_id")
    }),


    // ----- WAV PCM sample decode: real amplitude analytics -----------
    "q183_audio_samples" -> ((s, dir) => {
      // 8-sample 16-bit mono WAVs assembled in-plan (samples are
      // two's-complement LE bytes of ((11·id + 17i) mod 2048) − 1024);
      // the REAL RIFF/fmt/data walk turns the data chunk back into
      // signed samples and the stats op computes exact peak /
      // zero-crossings and lattice-snapped RMS. Row classes:
      // doc_id % 6 == 2 declares IEEE-float format (format tag 3 —
      // header-tier fine, sample tier must REJECT), % 6 == 5 truncates
      // mid-header; both decode to NULL.
      val id = col("doc_id")
      def b8(c: Column) = lpad(hex(pmod(c, lit(256))), 2, "0")
      def u(i: Int) = pmod(pmod(id * 11 + lit(i * 17), lit(2048)) + 64512,
        lit(65536))
      val sampleHex = (0 until 8).map { i =>
        concat(b8(u(i)), b8(floor(u(i) / 256).cast("long")))
      }.reduce(concat(_, _))
      def wav(fmtCode: String) = concat(
        lit("52494646" + "34000000" + "57415645" +
          "666D7420" + "10000000" + fmtCode + "0100" +
          "401F0000" + "803E0000" + "0200" + "1000" +
          "64617461" + "10000000"), sampleHex)
      val payload = unhex(when(id % 6 === 5, lit("524946463400000057"))
        .when(id % 6 === 2, wav("0300")).otherwise(wav("0100")))
      val media = rd(s, dir, "documents").select(id,
        payload.as("payload"), lit("audio/wav").as("mime"))
      Multimodal.audioStats(media)
        .select(col("doc_id"),
          col("audio.n_samples").as("n_samples"),
          col("audio.sample_rate").as("sample_rate"),
          col("audio.peak").as("peak"),
          col("audio.rms").as("rms"),
          col("audio.zero_crossings").as("zero_crossings"))
        .orderBy("doc_id")
    }),


    // ----- event-time tumbling window aggregation --------------------
    "q31_events_window" -> ((s, dir) => {
      rd(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("hour_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour_start", "event_type")
    }),


    // ----- multimodal plumbing: decode meta -> resize -> features ----
    "q32_multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, rd(s, dir, "documents"))
      val decoded = Multimodal.withDecodedMeta(media, "payload", "mime")
      val resized = Multimodal.resizeTo(decoded, 64, 64)
      Multimodal.extractFeatures(resized, dim = 4)
        .select(col("doc_id"), col("mime"),
          col("media.byte_len").as("byte_len"),
          col("media.width").as("width"),
          size(col("features")).as("n_features"))
        .orderBy("doc_id")
    }),


    // ----- bucketed incremental state (the 100 TB rewrite path) ------
    "q35_bucketed_upsert" -> ((s, dir) => {
      val path = scratchPath(dir, "q35_state")
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) fs.delete(root, true)
      val c = cfg(UpdateType.UpsertChecksum, 1L, "c_custkey", "customer")
      val store = new graft.state.BucketedStateStore(s, path, nBuckets = 8)
      store.mergeRun(custState(s, dir), c)
      // incremental run touching only a key slice: only those buckets rewrite
      store.mergeRun(custSrc(s, dir).filter(col("c_custkey") % 17 === 0),
        c.copy(versionId = 2L))
      store.load().select("c_custkey", "c_acctbal", "version_id")
        .orderBy("c_custkey")
    }),


    // ----- skew-safe two-phase aggregation ---------------------------
    "q36_salted_sum" -> ((s, dir) => {
      val l = rd(s, dir, "lineitem")
        .withColumn("q", col("l_quantity").cast("decimal(18,2)"))
      graft.operators.Skew.saltedSum(l, "l_returnflag", "q", salts = 16)
        .select(col("l_returnflag"), col("sum_q").cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }),


    // ----- rendezvous sharding + rebalance-movement audit ------------
    "q187_rendezvous_shards" -> ((s, dir) => {
      // HRW (highest-random-weight) sharding: shard(key, N) =
      // argmax_s md5(s#key). Growing 8 -> 9 shards moves ONLY keys the
      // new shard wins (~1/9), where mod-hashing reshuffles ~8/9 — the
      // audit quantifies both on the same keys. The argmax is a
      // lexicographic max over (hash, shard) structs: deterministic
      // even under a hash tie, identical in both engines
      val keys = rd(s, dir, "customer").select(col("c_custkey").as("k"))
      val ex = keys
        .select(col("k"), explode(sequence(lit(0), lit(8))).as("s"))
        .withColumn("h", Checksums.md5PrefixLong(
          concat_ws("#", col("s"), col("k"))))
      def best(df: DataFrame, out: String) = df.groupBy("k")
        .agg(max(struct(col("h"), col("s"))).getField("s").cast("long").as(out))
      best(ex.filter(col("s") < 8), "shard8")
        .join(best(ex, "shard9"), "k")
        .groupBy("shard8")
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("shard9") =!= col("shard8"), 1L).otherwise(0L))
            .as("hrw_moved"),
          sum(when(pmod(col("k"), lit(8)) =!= pmod(col("k"), lit(9)), 1L)
            .otherwise(0L)).as("mod_moved"))
        .select(col("shard8"), col("n_keys"), col("hrw_moved"), col("mod_moved"),
          (floor(col("hrw_moved").cast("double") / col("n_keys").cast("double")
            * 1000000 + 0.5) / 1000000).as("hrw_moved_pct"),
          (floor(col("mod_moved").cast("double") / col("n_keys").cast("double")
            * 1000000 + 0.5) / 1000000).as("mod_moved_pct"))
        .orderBy("shard8")
    }),


    // ----- time-decayed popularity leaderboard (exact dyadic decay) --
    "q186_decayed_topk" -> ((s, dir) => {
      // recency-weighted activity ranking with a per-day half-life —
      // and ZERO floats: the decay weight is the integer 2^(20−age)
      // (ages cap at 20 days), values land on the cents lattice, so
      // the leaderboard is a DECIMAL-routed integer sum that
      // reproduces bit-for-bit at any parallelism. exp()-based decay
      // would drift in the last ulp per libm; dyadic decay cannot
      val ev = rd(s, dir, "events")
        .filter(col("ts").isNotNull && col("value").isNotNull)
      val mx = ev.agg(max(col("ts").cast("date")).as("_mx"))
      val weights = array((0 to 20).map(k => lit(1L << (20 - k))): _*)
      ev.crossJoin(broadcast(mx))
        .withColumn("_age",
          least(datediff(col("_mx"), col("ts").cast("date")), lit(20)))
        .withColumn("_w", element_at(weights, col("_age") + 1))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum((floor(col("value") * 100 + 0.5).cast("long") * col("_w"))
            .cast("decimal(38,0)")).cast("long").as("decayed_micros"))
        .orderBy(col("decayed_micros").desc, col("user_id"))
        .limit(20)
    }),


    // ----- per-user event transition matrix (Markov audit) -----------
    "q181_event_transitions" -> ((s, dir) => {
      // what follows what in a user's stream? — consecutive event-type
      // pairs per user (ts order, event_id tiebreak so same-timestamp
      // rows are deterministic), aggregated to the transition matrix
      // with per-source shares. One per-user window + one pair
      // aggregation; the matrix is |types|² rows
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = rd(s, dir, "events")
        .withColumn("_prev", lag(col("event_type"), 1).over(w))
        .filter(col("_prev").isNotNull)
        .groupBy(col("_prev").as("from_type"),
          col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTot = pairs.groupBy("from_type").agg(sum(col("n")).as("_ft"))
      pairs.join(fromTot, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          (floor(col("n").cast("double") / col("_ft").cast("double")
            * 1000000 + 0.5) / 1000000).as("share"))
        .orderBy("from_type", "to_type")
    }),


    // ----- skew salt plan (measurement -> mitigation parameters) -----
    "q179_salt_plan" -> ((s, dir) => {
      // q117 profiles the key distribution, q144 forecasts the join
      // fan-out — this emits the actual mitigation parameters: per hot
      // supplier key, the salt count that brings per-reducer load back
      // under 500 rows (integer ceiling division, capped at 32) and
      // the residual load after salting
      graft.operators.Skew.saltPlan(rd(s, dir, "lineitem"), "l_suppkey",
        targetPerTask = 500L, maxSalts = 32)
        .orderBy(col("n_rows").desc, col("l_suppkey"))
    }),


    // ----- gap-based sessionization (batch session_window) -----------
    "q41_sessionize" -> ((s, dir) => {
      rd(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "60 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
        .select(col("user_id"),
          unix_timestamp(col("w.start")).as("session_start_epoch"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start_epoch")
    }),


    // ----- near-dup clusters: pairs -> connected components ----------
    "q56_neardup_components" -> ((s, dir) => {
      // pairs from the shared materialized set (QueryShared
      // .nearDupPairsCached) — computed once, consumed by q56/q73/q78
      val pairs = nearDupPairsCached(s, dir)
      graft.operators.Components.connectedComponents(pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("label").as("component"))
        .orderBy("doc_id")
    }),


    // ----- near-dup cluster size distribution ------------------------
    "q247_cluster_sizes" -> ((s, dir) => {
      // dedup savings come in cluster-sized units: the size histogram
      // of the near-dup components (docs in at least one pair; a
      // singleton has nothing to dedup) is the shape report a rollout
      // reads first — many 2-clusters is touch-up, a giant cluster is a
      // template/boilerplate problem the banding caps must absorb. One
      // double aggregation past the shared clustering.
      val comp = graft.operators.Components.connectedComponents(
        nearDupPairsCached(s, dir), "id_a", "id_b")
      comp.groupBy("label").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size")
    }),


    // ----- sampled exactness auditor (corpus-safe recall audit) -------
    "q256_sampled_recall_audit" -> ((s, dir) => {
      // the whole-corpus exact join behind q166 is output-quadratic
      // (73x at a 10x corpus) — a one-off forensic, not a pipeline
      // stage. This is the production mode: hash-sample each provenance
      // stratum at its own rate, run ground truth AND the banded screen
      // INSIDE the sample, report per-stratum recall from exact counts.
      // Membership is the md5-cutoff draw, so the oracle reproduces the
      // exact sample; the audit budget is rate² of each stratum's pair
      // volume — fixed by the rates, flat in corpus size.
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"),
        concat(lit("s"), (col("doc_id") % 4).cast("string")).as("stratum"))
      val corpus = d.unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"),
          col("stratum")))
      graft.operators.DedupApprox.auditRecall(corpus, "doc_id", "text",
        "stratum", rates = Map("s0" -> 0.9, "s1" -> 0.75),
        defaultRate = 0.6, threshold = 0.6, shingleK = 3,
        bands = 8, rows = 2, md5Family = true)
    }),


    // ----- incremental aggregate rollup (materialized-view upkeep) ---
    "q150_incremental_rollup" -> ((s, dir) => {
      // per-user value stats folded from per-(user, day) PARTIALS built
      // as two increments (history, then the last days' delta) — the
      // materialized-rollup pattern: history is scanned once when its
      // partials are built, never again. The oracle recomputes from raw
      // in one pass; equality proves the fold loses nothing, because
      // COUNT/SUM/AVG/VAR/MIN/MAX all decompose algebraically and the
      // moments are DECIMAL-exact (the q106 parity discipline)
      val ev = rd(s, dir, "events").filter(col("user_id") % 20 === 0)
        .select(col("user_id"), col("ts"), col("value"))
      val day = to_date(col("ts"))
      val cutoff = lit("2024-01-25").cast("date")
      val hist = graft.operators.IncrementalAgg.partials(
        ev.filter(day < cutoff), Seq("user_id"), day, "value")
      val delta = graft.operators.IncrementalAgg.partials(
        ev.filter(day >= cutoff), Seq("user_id"), day, "value")
      graft.operators.IncrementalAgg
        .rollup(hist.unionByName(delta), Seq("user_id"))
        .orderBy("user_id")
    }),


    // ----- leakage-safe dataset split (component-level assignment) ---
    "q149_leakage_split" -> ((s, dir) => {
      // train/val/test split whose assignment UNIT is the near-dup
      // COMPONENT, not the document: a doc and all its near-copies land
      // in the same split by construction, so eval can never score text
      // memorized from train (the doc-level split's silent failure
      // mode). Pairs come from the shared materialized set; docs in no
      // pair are their own singleton component; the split is the
      // engine's deterministic hash assignment keyed on the COMPONENT
      graft.operators.Sampling.leakageSafeSplit(
          docsWithNearDups(s, dir), "doc_id", nearDupPairsCached(s, dir),
          "id_a", "id_b", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("component")).as("n_components"))
        .orderBy("split")
    }),


    // ----- SCD Type-2 history build (validity ranges) ----------------
    "q143_scd2" -> ((s, dir) => {
      // each user's event_type stream collapsed to state CHANGES, every
      // change opening a [valid_from, valid_to) range closed by the
      // next one; last range per user open-ended. One key exchange —
      // the change lag, the closing lead, and both filters reuse it
      graft.operators.Sequence.scd2(rd(s, dir, "events"),
        "user_id", "event_type", "ts", "event_id")
        .select(col("key").as("user_id"), col("state").as("event_type"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy("user_id", "valid_from", "event_type")
    }),


    // ----- time-travel: state as-of T from the SCD2 history ----------
    "q188_time_travel" -> ((s, dir) => {
      // reconstruct every user's state at the corpus midpoint T from
      // q143's validity ranges (valid_from <= T < valid_to). The
      // oracle derives the same answer through the INDEPENDENT path —
      // latest change row at or before T over the raw events — so the
      // gate proves range reconstruction == replay, not just that two
      // copies of one formula agree
      val ev = rd(s, dir, "events")
      val sec = col("ts").cast("long")
      val bounds = ev.filter(col("event_type").isNotNull)
        .agg(expr("(min(CAST(ts AS LONG)) + max(CAST(ts AS LONG))) div 2")
          .as("t"))
      graft.operators.Sequence.scd2(ev, "user_id", "event_type", "ts",
        "event_id")
        .crossJoin(broadcast(bounds))
        .filter(col("valid_from") <= col("t") &&
          (col("valid_to").isNull || col("valid_to") > col("t")))
        .select(col("key").as("user_id"), col("state").as("state_at_t"),
          col("valid_from"))
        .orderBy("user_id")
    }),


    // ----- incremental connected components (delta clustering) ------
    "q142_incremental_components" -> ((s, dir) => {
      // yesterday's assignment (CC over base-corpus pairs) + today's
      // delta (every pair touching a new doc) folded in by clustering
      // ONLY the quotient graph — O(|delta|) work regardless of corpus
      // size. The oracle is q56's FULL recursive-CTE rebuild over the
      // union pair set: equality proves increment == rebuild
      val pairs = nearDupPairsCached(s, dir)
      val baseEdges = pairs.filter(col("id_a") < 10000 && col("id_b") < 10000)
      val delta = pairs.filter(col("id_a") >= 10000 || col("id_b") >= 10000)
      val prev = graft.operators.Components
        .connectedComponents(baseEdges, "id_a", "id_b")
      graft.operators.Components
        .incrementalComponents(prev, delta, "node", "label", "id_a", "id_b")
        .select(col("node").as("doc_id"), col("label").as("component"))
        .orderBy("doc_id")
    }),


    // ----- deterministic stratified hash sampling --------------------
    "q57_stratified_sample" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedHashSample(rd(s, dir, "lineitem"),
        "l_returnflag", Map("A" -> 0.25, "N" -> 0.05, "R" -> 0.10),
        defaultRate = 0.0, keyCols = Seq("l_orderkey", "l_linenumber"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }),


    // ----- z-order (Morton) clustering key ---------------------------
    // the multi-dim layout key: sorting by z makes parquet row-group
    // min/max stats tight in BOTH dims, so predicates on either prune
    "q63_zorder" -> ((s, dir) => {
      val z = graft.operators.ZOrder.zValue(Seq(
        ((col("o_custkey") % 1000).cast("long"), 0.0, 1000.0),
        (col("o_totalprice"), 0.0, 600000.0)), bitsPerDim = 8)
      rd(s, dir, "orders")
        .select(col("o_orderkey"), z.as("z"))
        .orderBy("z", "o_orderkey")
    }),


    // ----- per-key EMA (order-sensitive sequential fold) -------------
    // alpha = 0.5 keeps every weight dyadic, so the left fold is
    // bit-identical across engines; ties at microsecond precision break
    // on event_id in BOTH engines (the oracle truncates its ns timestamps
    // to Spark's microsecond precision before ordering)
    "q66_ema" -> ((s, dir) => {
      graft.operators.Stats.emaPerKey(rd(s, dir, "events"), "user_id",
        Seq("ts", "event_id"), "value", alpha = 0.5)
        .orderBy("user_id")
    }),


    // ----- weighted (per-row dynamic rate) sampling ------------------
    // keep-probability = the doc's own length-derived weight: longer
    // docs survive at a higher rate, all in one scan-speed filter
    "q67_weighted_sample" -> ((s, dir) => {
      val rate = least(col("n_chars").cast("double") / lit(1000.0), lit(1.0))
      graft.operators.Sampling.weightedHashSample(
        rd(s, dir, "documents"), Seq("doc_id"), rate)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("source")
    }),


    // ----- one-pass column profile (data-audit report) ---------------
    "q69_profile" -> ((s, dir) => {
      graft.operators.Stats.columnProfile(rd(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "c_nationkey"))
        .orderBy("column")
    }),


    // ----- funnel: ordered event-sequence matching -------------------
    "q70_funnel" -> ((s, dir) => {
      val ev = rd(s, dir, "events")
      // fixture-assumption guard (round-8 advice): the oracle's strict
      // `ts >` chaining equals the engine's greedy (ts, event_id) fold
      // ONLY when no user has two funnel-step events at one timestamp —
      // a regenerated fixture with ties would silently diverge (engine
      // tie-breaks by event_id, oracle drops the tied event). Assert
      // tie-freedom loudly so a future fixture turns a hash-mismatch
      // mystery into a named failure.
      val tieFree = ev
        .filter(col("event_type").isin("view", "click", "purchase") &&
          col("ts").isNotNull && col("user_id").isNotNull)
        .groupBy("user_id", "ts").count()
        .filter(col("count") > 1).limit(1).isEmpty
      require(tieFree, "events fixture has (user_id, ts) ties among funnel " +
        "steps — q70/q245's strict-inequality oracles assume tie-freedom")
      graft.operators.Sequence.funnelCounts(ev,
        "user_id", Seq("ts", "event_id"), "event_type",
        steps = Seq("view", "click", "purchase"))
        .orderBy("funnel_stage")
    }),


    // ----- deterministic train/val/test split ------------------------
    "q71_dataset_split" -> ((s, dir) => {
      graft.operators.Sampling.splitAssign(rd(s, dir, "documents"),
        Seq("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("split", "source")
    }),


    // ----- per-group z-score normalization (feature scaling) ---------
    "q72_zscore" -> ((s, dir) => {
      graft.operators.Stats.zscorePerGroup(rd(s, dir, "lineitem"),
        Seq("l_returnflag"), "l_quantity")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(abs(col("zscore")) > 2, 1L).otherwise(0L)).as("n_outliers"),
          r(min(col("zscore")), 6).as("min_z"), r(max(col("zscore")), 6).as("max_z"))
        .orderBy("l_returnflag")
    }),


    // ----- canonical deduped corpus (the pipeline's shipped output) --
    // docs -> near-dup pairs -> connected components -> keep exactly one
    // doc per cluster (the minimum id) plus every singleton
    "q73_canonical_corpus" -> ((s, dir) => {
      val docs = docsWithNearDups(s, dir)
      val pairs = nearDupPairsCached(s, dir) // shared materialized pair set
      graft.operators.Components.canonicalize(docs, pairs, "doc_id", "id_a", "id_b")
        .filter(col("doc_id") === col("canonical_id"))
        .select(col("doc_id"), md5(TextAnalysis.normText(col("text"))).as("fp"))
        .orderBy("doc_id")
    }),


    // ----- real container header decode (PNG IHDR / JPEG SOF / GIF) --
    "q74_media_headers" -> ((s, dir) => {
      // Round-trip proof for Multimodal.parseHeader: the payload BYTES are
      // assembled in-plan (big-endian PNG/JPEG dims, little-endian GIF),
      // the decoder reads dimensions back out of them, and the oracle
      // predicts the dims from doc_id arithmetic alone. doc_id % 4 == 3
      // rows carry a truncated PNG magic — recognized container, honest
      // NULL dimensions.
      val w = (col("doc_id") % 4000 + 16).cast("int")
      val h = (col("doc_id") % 3000 + 16).cast("int")
      def beHex(c: Column, n: Int) = lpad(hex(c), n, "0")
      def le16(c: Column) = // GIF u16 is little-endian: swap the hex byte pairs
        unhex(concat(substring(beHex(c, 4), 3, 2), substring(beHex(c, 4), 1, 2)))
      val png = concat(
        unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
        unhex(beHex(w, 8)), unhex(beHex(h, 8)), unhex(lit("0806000000")))
      val jpeg = concat( // SOI, then SOF0: len=0x000B, precision 8, h, w
        unhex(lit("FFD8" + "FFC0" + "000B" + "08")),
        unhex(beHex(h, 4)), unhex(beHex(w, 4)), unhex(lit("010100")))
      val gif = concat(unhex(lit("474946383961")), le16(w), le16(h))
      val truncatedPng = unhex(lit("89504E470D0A1A0A0000"))
      val media = rd(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 4 === 0, png)
          .when(col("doc_id") % 4 === 1, jpeg)
          .when(col("doc_id") % 4 === 2, gif)
          .otherwise(truncatedPng).as("payload"),
        lit("application/octet-stream").as("mime"))
      Multimodal.withDecodedMeta(media, "payload", "mime")
        .select(col("doc_id"),
          col("media.mime").as("detected_mime"),
          col("media.width").as("width"),
          col("media.height").as("height"),
          col("media.byte_len").as("byte_len"))
        .orderBy("doc_id")
    }),


    // ----- sequence packing: concat-and-chunk placement plan ---------
    "q76_sequence_packing" -> ((s, dir) => {
      // shard by id hash, cumulative offsets within shard, budget-sized
      // bins — the LLM-pretraining packing layout; oracle replays the
      // same md5 shard/order and window arithmetic
      graft.operators.Packing.packSequences(rd(s, dir, "documents"),
        "doc_id", "n_chars", budget = 4096L, shards = 4)
        .orderBy("shard", "start_offset", "doc_id")
    }),


    // ----- keep-rule dedup: canonical = best-scoring cluster member --
    "q78_canonical_by_score" -> ((s, dir) => {
      // same near-dup clusters as q56/q73, but the survivor is the
      // LONGEST member (quality keep-rule), not the minimum id
      val docs = docsWithNearDups(s, dir)
      val pairs = nearDupPairsCached(s, dir) // shared materialized pair set
      graft.operators.Components.canonicalizeBy(docs, pairs,
        "doc_id", "id_a", "id_b", length(col("text")))
        .select(col("doc_id"), col("canonical_id"),
          (col("doc_id") === col("canonical_id")).as("kept"))
        .orderBy("doc_id")
    }),


    // ----- per-group quantile clipping (winsorization) ---------------
    "q79_winsorize" -> ((s, dir) => {
      graft.operators.Stats.winsorizePerGroup(rd(s, dir, "lineitem"),
        Seq("l_returnflag"), "l_quantity", pLo = 0.05, pHi = 0.95)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          r(min(col("winsorized")), 6).as("min_w"),
          r(max(col("winsorized")), 6).as("max_w"),
          r(sum(col("winsorized").cast("decimal(28,12)")).cast("double"), 4).as("sum_w"))
        .orderBy("l_returnflag")
    }),


    // ----- co-located (bucketed) fact-fact join ----------------------
    "q80_bucketed_join" -> ((s, dir) => {
      // both sides are written bucketBy(8, key) ONCE — content-
      // fingerprint-cached across invocations (cachedBucketedTable), so
      // repeat runs measure the zero-exchange join (asserted in
      // PlanSpec), not two table rewrites — the pre-partitioned 100 TB
      // fact-join path; results are identical to a plain shuffle join,
      // which is exactly what the oracle replays
      val li = rd(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val or = rd(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      val liT = cachedBucketedTable(s, dir, "graft_q80_li", "lineitem",
        li, Seq("l_orderkey"), 8)
      val orT = cachedBucketedTable(s, dir, "graft_q80_or", "orders",
        or, Seq("l_orderkey"), 8)
      graft.operators.Bucketing.joinBucketed(s, liT, orT,
        Seq("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("o_orderstatus")
    }),


    // ----- bloom-filter pre-filtered join ----------------------------
    "q84_bloom_join" -> ((s, dir) => {
      // selective build side (top ~10% of orders by price): the bloom
      // sketch filters lineitem BEFORE its shuffle; the trailing exact
      // join clears false positives, so the oracle is the plain join
      val hi = rd(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      val li = rd(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      graft.operators.BloomJoin.bloomJoin(li, hi, "l_orderkey",
          expectedItems = 65536)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
        .orderBy("o_orderstatus")
    }),


    // ----- per-key event-time rolling window -------------------------
    "q89_rolling_window" -> ((s, dir) => {
      graft.operators.Stats.rollingPerKey(rd(s, dir, "events"),
        "user_id", "ts", "value", windowSec = 86400L)
        .select(col("event_id"), col("user_id"), col("n_win"), col("sum_win"))
        .orderBy("event_id")
    }),


    // ----- deterministic negative sampling (contrastive pairs) -------
    "q91_negative_sample" -> ((s, dir) => {
      graft.operators.Sampling.negativeSample(
        rd(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", k = 3, payloadCols = Seq("n_chars"))
        .withColumnRenamed("n_chars", "neg_chars")
        .orderBy("anchor_id", "slot")
    }),


    // ----- bloom novelty gate (batch form of the streaming gate) -----
    "q92_bloom_novel" -> ((s, dir) => {
      // corpus = even docs; the batch replays ALL docs — the gate must
      // return exactly the anti-join survivors no matter how fp-heavy
      // the (deliberately undersized) sketch is
      val docs = rd(s, dir, "documents").select("doc_id", "n_chars")
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val sketch = graft.operators.BloomJoin.buildFilter(corpus, "doc_id",
        expectedItems = 1024, fpp = 0.2)
      graft.operators.BloomJoin.novelRows(docs, corpus, "doc_id", sketch)
        .orderBy("doc_id")
    }),


    // ----- WAV header decode (audio metadata, no codec) --------------
    "q96_audio_headers" -> ((s, dir) => {
      // RIFF/WAVE bytes assembled in-plan (little-endian chunk sizes and
      // rates); the decoder walks the chunk list and reads the duration
      // from fmt.byteRate + data.size — the oracle predicts it from
      // doc_id arithmetic alone. doc_id % 3 == 2 rows carry a WAVE magic
      // with a truncated junk chunk: recognized container, NULL duration.
      def beHex(c: Column, n: Int) = lpad(hex(c), n, "0")
      def leHex(c: Column, bytes: Int) = { // little-endian: reverse the byte pairs
        val be = beHex(c, bytes * 2)
        concat((0 until bytes).reverse.map(i => substring(be, i * 2 + 1, 2)): _*)
      }
      val rate = (col("doc_id") % 100 * 100 + 8000).cast("long") // byteRate (8-bit mono)
      val dataBytes = ((col("doc_id") % 50 + 1) * 1000).cast("long")
      val wav = concat(
        unhex(lit("52494646" + "24000000" + "57415645")),       // RIFF .. WAVE
        unhex(lit("666D7420" + "10000000" + "0100" + "0100")),  // fmt ,16,PCM,mono
        unhex(leHex(rate, 4)), unhex(leHex(rate, 4)),           // sampleRate, byteRate
        unhex(lit("0100" + "0800")),                            // blockAlign, bits
        unhex(lit("64617461")), unhex(leHex(dataBytes, 4)))     // data, size
      val bad = unhex(lit("52494646" + "24000000" + "57415645" + "6A756E6B"))
      val media = rd(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 2, bad).otherwise(wav).as("payload"),
        lit("application/octet-stream").as("mime"))
      Multimodal.withDecodedMeta(media, "payload", "mime")
        .select(col("doc_id"), col("media.mime").as("detected_mime"),
          col("media.duration_ms").as("duration_ms"),
          col("media.byte_len").as("byte_len"))
        .orderBy("doc_id")
    }),


    // ----- water-filling budget allocation (data-mix planning) -------
    "q155_fair_budget" -> ((s, dir) => {
      // split a 100k-char budget across the 20 sources: small sources
      // keep their full weight, the giants level at one derived cap —
      // the max-min-fair mix plan that precedes q109's rate execution.
      // All-integer solve over a |sources|-row frame
      graft.operators.Sampling.fairShareBudget(rd(s, dir, "documents"),
        Seq("source"), "n_chars", budget = 100000L)
        .orderBy("source")
    }),


    // ----- l-diversity audit (homogeneity-attack complement) ---------
    "q156_l_diversity" -> ((s, dir) => {
      // q152's k-anonymity passes a group that is LARGE but uniform in
      // its sensitive attribute; this audit requires each nation's
      // customers to span >= 5 market segments before the pair ships
      graft.operators.Quality.lDiversity(rd(s, dir, "customer"),
        Seq("c_nationkey"), "c_mktsegment", l = 5)
    }),


    // ----- t-closeness release audit (privacy ladder rung 3) ---------
    "q174_t_closeness" -> ((s, dir) => {
      // q152 passes big groups, q156 passes varied groups — this rung
      // requires each nation's market-segment DISTRIBUTION to track
      // the global one (total-variation distance on the 1e-6 lattice,
      // exact common-denominator integer arithmetic underneath).
      // Nations above t = 0.13 leak a skewed posterior and are flagged
      graft.operators.Quality.tCloseness(rd(s, dir, "customer"),
        Seq("c_nationkey"), "c_mktsegment")
        .select(col("c_nationkey"), col("n_g"), col("tvd"),
          (col("tvd") > 0.13).as("above_t"))
        .orderBy("c_nationkey")
    }),


    // ----- Benford first-digit audit (fabricated-numbers detector) ---
    "q190_benford" -> ((s, dir) => {
      // do order totals lead with the digits a natural multiplicative
      // process produces? — first-significant-digit shares vs the
      // hardcoded log10(1+1/d) expectations with per-digit chi-square
      // terms, everything lattice-snapped. One partial-aggregated pass
      // to 9 rows; the audit that catches unit mix-ups (cents vs
      // dollars), truncation bugs, and synthetic fills in ingested
      // numeric feeds
      graft.operators.Quality.benfordAudit(rd(s, dir, "orders"),
        "o_totalprice")
        .orderBy("digit")
    }),


    // ----- importance resampling to a target distribution ------------
    "q191_importance_resample" -> ((s, dir) => {
      // reshape the corpus to a 20/30/50 short/mid/long length mix —
      // the binding bin (long: scarcest relative to its target) keeps
      // everything, the others thin by exact integer md5 cutoffs; the
      // report shows original counts vs kept counts vs achieved shares
      // (which track 0.2/0.3/0.5 up to thinning granularity)
      val docs = rd(s, dir, "documents")
      def bin = when(col("n_chars") < 200, lit("short"))
        .when(col("n_chars") < 400, lit("mid")).otherwise(lit("long"))
      val kept = graft.operators.Sampling.importanceResample(
        docs, bin, Seq("doc_id"),
        Seq("short" -> 20L, "mid" -> 30L, "long" -> 50L))
      val orig = docs.groupBy(bin.as("bin")).agg(count(lit(1)).as("n_orig"))
      val k = kept.groupBy(bin.as("bin")).agg(count(lit(1)).as("n_kept"))
      val tot = k.agg(sum(col("n_kept")).as("_kt"))
      orig.join(k, "bin").crossJoin(broadcast(tot))
        .select(col("bin"), col("n_orig"), col("n_kept"),
          r(col("n_kept").cast("double") / col("_kt").cast("double"), 6)
            .as("kept_share"))
        .orderBy("bin")
    }),


    // ----- temperature-smoothed (alpha=0.5) mixture allocation -------
    "q178_temperature_mix" -> ((s, dir) => {
      // the multilingual upsample-the-tail rule over a deliberately
      // skewed source mix (fixture sources are doc_id % 20, so the skew
      // axis is the independent doc_id div 20: mid sources halved, tail
      // sources at a fifth): weights derive as lattice-snapped
      // sqrt(share), so tail allocations rise above their raw share —
      // q109's mixtureSample takes these fractions as input downstream
      val m = col("doc_id") % 20
      val b = expr("doc_id div 20")
      val skewed = rd(s, dir, "documents")
        .filter(m <= 4 ||
          (m.between(5, 9) && b % 2 === 0) ||
          (m >= 10 && b % 5 === 0))
      graft.operators.Sampling.temperatureAllocation(skewed, "source",
        budget = 1000L)
        .orderBy("source")
    }),


    // ----- keyed pseudonymization + referential-integrity audit ------
    "q177_pseudonymize" -> ((s, dir) => {
      // ship customers with keys replaced by salted 48-bit tokens, then
      // AUDIT the release per nation: tokens must stay collision-free
      // (n_pseudonyms == n_customers) and must still join the orders
      // fact table (n_orders survives the key swap). The join runs ON
      // the token — exactly how the released tables would be joined
      val ps = graft.operators.Quality.pseudonym("salt42", Seq(col("c_custkey")))
      val cust = rd(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), ps.as("pseud"))
      val ords = rd(s, dir, "orders")
        .select(graft.operators.Quality.pseudonym("salt42", Seq(col("o_custkey")))
          .as("pseud"))
      val perNation = cust.groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"),
          countDistinct(col("pseud")).as("n_pseudonyms"))
      val linked = cust.join(ords, "pseud")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_orders"))
      perNation.join(linked, Seq("c_nationkey"), "left")
        .select(col("c_nationkey"), col("n_customers"), col("n_pseudonyms"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("c_nationkey")
    }),


    // ----- majority-vote label aggregation (annotation pipeline) -----
    "q157_label_vote" -> ((s, dir) => {
      // collapse per-rater votes (events: one vote per row, item keyed
      // by event_id mod 997) into one label per item + consensus stats;
      // ties break lexicographically, so the gold set is rerun-stable
      val votes = rd(s, dir, "events")
        .select((col("event_id") % 997).as("item"),
          col("event_type").as("label"))
      graft.operators.Labels.majorityVote(votes, "item", "label")
        .orderBy("item")
    }),


    // ----- rolling anomaly detection (telemetry drift alert) ---------
    "q158_rolling_anomaly" -> ((s, dir) => {
      // flag events > 3 sigma from their type's trailing-100 baseline
      // (probe row excluded, >= 30-row warm-up): decimal-exact rolling
      // moments, one hash exchange + in-partition sort, O(lookback)
      // window state per task
      graft.operators.Stats.rollingAnomaly(rd(s, dir, "events"),
        "event_type", "ts", "event_id", "value",
        lookback = 100, minN = 30, z = 3.0)
        .orderBy("key", "sec", "id")
    }),


    // ----- calibration audit / reliability diagram -------------------
    "q159_calibration" -> ((s, dir) => {
      // a synthetic scored dataset whose hit-rate tracks its score by
      // construction (hash-vs-magnitude comparison), binned into the
      // 10-cell reliability diagram: integer positives, decimal-routed
      // score sums, one divide per ratio
      val ev = rd(s, dir, "events")
        .withColumn("score", col("value").cast("double") / 500.0)
        .withColumn("hit",
          (col("event_id") * 7 + col("user_id")) % 10 <
            floor(col("value").cast("double") / 50.0))
      graft.operators.Stats.calibrationBins(ev, "score", col("hit"), bins = 10)
        .orderBy("bin")
    }),


    // ----- ROC-AUC of a quality score (rank-sum, no global sort) -----
    "q172_auc" -> ((s, dir) => {
      // does the score actually rank positives above negatives? — the
      // evaluation-family companion to q159's calibration: same scored
      // fixture idea, but the metric is the tie-aware Mann-Whitney AUC.
      // Scores land on an integer cents lattice (exact in both
      // engines), positives get a +5000 shift so separation is partial
      // and the tie/crossover region is real
      val ev = rd(s, dir, "events")
      val score = floor(col("value") * 100 + 0.5).cast("long") +
        when(col("event_type") === "purchase", 5000L).otherwise(0L)
      graft.operators.Stats.rocAuc(ev, score, col("event_type") === "purchase")
    }),


    // ----- Fleiss-kappa inter-rater agreement ------------------------
    "q160_fleiss_kappa" -> ((s, dir) => {
      // q157's vote fixture, scored for agreement-beyond-chance before
      // the majority-vote gold set is trusted: exact integer pair
      // counts, label shares squared from integer totals, one divide
      // each — engine-exact to the last bit
      val votes = rd(s, dir, "events")
        .select((col("event_id") % 997).as("item"),
          col("event_type").as("label"))
      graft.operators.Labels.fleissKappa(votes, "item", "label")
    }),


    // ----- label-propagation communities (q126/q127/q140's graph) ----
    "q161_communities" -> ((s, dir) => {
      // 3 synchronous LPA rounds over the shared co-purchase edge set:
      // deterministic tie-to-smallest argmax per node per round, so the
      // unrolled oracle reproduces every label bit-for-bit
      graft.operators.Graph.labelPropagation(
        coPurchaseEdgesCached(s, dir), "src", "dst", iterations = 3)
        .select(col("node"), col("label").as("community"))
        .orderBy("node")
    }),


    // ----- token-pair lift (log-free collocation mining) -------------
    "q162_token_lift" -> ((s, dir) => {
      // which word pairs co-occur above independence? — stop-phrase /
      // template detection from exact integer counts and ONE divide;
      // per-doc pair fan-out capped before pairing
      TextAnalysis.tokenPairLift(rd(s, dir, "documents"), "doc_id", "text",
        maxTokensPerDoc = 64, minSupport = 5)
        .orderBy(col("lift").desc, col("tok_a"), col("tok_b"))
        .limit(25)
    }),


    // ----- weight-balanced shard planning (training-shard writer) ----
    "q163_shard_plan" -> ((s, dir) => {
      // pack the curriculum-ordered corpus (q122's order) into ~20k-char
      // shards: shard = exclusive-prefix-chars div 20000 with NO
      // single-partition stage — range exchange + one-pass per-partition
      // running sums + broadcast offsets
      graft.operators.GlobalOrder.prefixShards(
        rd(s, dir, "documents").select("doc_id", "n_chars"),
        Seq(col("n_chars").desc, col("doc_id").asc), "n_chars",
        shardWeight = 20000L)
        .select("doc_id", "n_chars", "shard")
        .orderBy(col("n_chars").desc, col("doc_id"))
    }),


    // ----- length-bucketed batching / padding-waste audit ------------
    "q175_pad_efficiency" -> ((s, dir) => {
      // the pad-batching sibling of q76's concat-packing: 32-token
      // length classes via integer bucket ids, per-bucket pad waste
      // vs the pad-to-global-max baseline — the number that justifies
      // length bucketing before a training run
      graft.operators.Packing.padEfficiency(
        rd(s, dir, "documents")
          .select(TextAnalysis.tokenCount(col("text")).cast("long")
            .as("n_tokens")),
        "n_tokens", width = 32L)
        .orderBy("bucket")
    }),


    // ----- per-key admission quota (batch twin of the stream gate) ---
    "q164_admission_quota" -> ((s, dir) => {
      // re-score history against a 5-events-per-type-per-day budget:
      // the first 5 by (ts, id) admit, the rest route to the deadletter
      // tier; one (key, epoch) exchange, deterministic verdicts
      graft.operators.Sampling.admitQuota(rd(s, dir, "events"),
        Seq("event_type"), "ts", "event_id", epochSec = 86400L, quota = 5L)
        .groupBy("event_type", "epoch")
        .agg(sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("admitted"), 0L).otherwise(1L)).as("n_rejected"))
        .filter(col("n_rejected") > 0)
        .orderBy("event_type", "epoch")
    }),


    // ----- snapshot profile drift (nightly promote gate) -------------
    "q165_profile_drift" -> ((s, dir) => {
      // yesterday vs today with an injected null wave and a new segment
      // value: per-column null-rate delta, distinct ratio, range
      // movement — two one-pass profiles joined on a |columns|-row frame
      val old = rd(s, dir, "customer")
      val nw = old
        .withColumn("c_acctbal", when(col("c_custkey") % 13 === 0, lit(null))
          .otherwise(col("c_acctbal")))
        .withColumn("c_mktsegment", when(col("c_custkey") % 17 === 0,
          lit("SEGMENT_X")).otherwise(col("c_mktsegment")))
      graft.operators.Stats.profileDrift(old, nw,
        Seq("c_custkey", "c_acctbal", "c_mktsegment", "c_nationkey"))
        .orderBy("column")
    }),


    // ----- sketch-recall audit (LSH banding vs exact ground truth) ---
    "q166_sketch_recall" -> ((s, dir) => {
      // the engine measures its own sketch: ground truth = the
      // NO-false-negative prefix-filter join over the SAME 3-shingle
      // sets q25's minhash approximates; found = the banded LSH pairs.
      // recall = found / true with exact integer counts — the number a
      // dedup rollout quotes before trusting the probabilistic path
      val corpus = docsWithNearDups(s, dir)
      val truth = DedupApprox.prefixFilterPairsTokens(corpus, "doc_id",
        TextAnalysis.shingleStrings(col("text"), 3), threshold = 0.6)
        .select("id_a", "id_b")
      // the identical banded pipeline q56/q73/q78 consume — served from
      // the content-fingerprinted pair cache, not re-sketched
      val found = nearDupPairsCached(s, dir).select("id_a", "id_b")
      val nTrue = truth.agg(count(lit(1)).as("n_true"))
      val nFound = found.agg(count(lit(1)).as("n_found"))
      val nMissed = truth.join(found, Seq("id_a", "id_b"), "left_anti")
        .agg(count(lit(1)).as("n_missed"))
      nTrue.crossJoin(nFound).crossJoin(nMissed)
        .select(col("n_true"), col("n_found"), col("n_missed"),
          (floor((col("n_true") - col("n_missed")).cast("double") /
            col("n_true").cast("double") * 1000000 + 0.5) / 1000000)
            .as("recall"))
    }),


    // ----- LSH banding precision (the recall audit's complement) -----
    "q246_banding_precision" -> ((s, dir) => {
      // of the pairs the banded LSH stage surfaces, how many survive
      // exact-Jaccard verification — the candidate-stage waste factor
      // that SIZES the verify join at corpus scale (q166 answers "what
      // did banding miss"; this answers "what did banding overfetch").
      // Candidates come from the same k=3/b=8/r=2 md5-family banding as
      // q25; verified pairs from the shared cached set built with
      // identical parameters, so precision = |verified| / |candidates|
      // exactly.
      val corpus = docsWithNearDups(s, dir)
      val cand = DedupApprox.lshCandidatePairs(
        DedupApprox.lshBands(corpus, "doc_id", "text",
          k = 3, bands = 8, rows = 2, md5Family = true))
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      val nVer = nearDupPairsCached(s, dir).agg(count(lit(1)).as("n_verified"))
      nCand.crossJoin(nVer)
        .select(col("n_candidates"), col("n_verified"),
          (floor(col("n_verified").cast("double") /
            col("n_candidates").cast("double") * 1000000 + 0.5) / 1000000)
            .as("precision"))
    }),


    // ----- vocabulary coverage cutoff (tokenizer budgeting) ----------
    "q167_vocab_cutoff" -> ((s, dir) => {
      // the smallest frequency-ranked vocabulary covering 90% of the
      // corpus token mass — integer cutoff arithmetic, global ranks via
      // the no-SinglePartition running-totals machinery
      TextAnalysis.vocabCutoff(rd(s, dir, "documents"), "text",
        coveragePct = 90)
        .orderBy("rank")
    }),


    // ----- snapshot retention ladder (state-store GC plan) -----------
    "q168_retention_plan" -> ((s, dir) => {
      // events as a per-type version chain: keep the newest 10, each
      // day's newest for a week, each week's newest for four — the
      // last/daily/weekly ladder, aged from each key's OWN newest
      // version so the plan is a pure function of the frame
      graft.operators.Compaction.retentionPlan(rd(s, dir, "events"),
        Seq("event_type"), "ts", "event_id",
        keepLast = 10, keepDaily = 7, keepWeekly = 4)
        .filter(col("keep"))
        .orderBy("event_type", "sec", "event_id")
    }),


    // ----- dedup threshold sensitivity sweep -------------------------
    "q170_dedup_sensitivity" -> ((s, dir) => {
      // how aggressive is each Jaccard cutoff? — cluster the SAME
      // materialized pair set at three thresholds and report pair/
      // cluster/doc counts and the largest cluster per cutoff: the
      // sweep a dedup rollout reads before committing to one number.
      // Thresholds compare on the pairs' 1e-4 jaccard lattice (what the
      // operator emits), so the cut is reproducible anywhere
      val pairs = nearDupPairsCached(s, dir)
      val frames = Seq(0.6, 0.95, 0.99).map { t =>
        val p = pairs.filter(col("jaccard") >= t)
        val comp = graft.operators.Components
          .connectedComponents(p, "id_a", "id_b")
        val nPairs = p.agg(count(lit(1)).as("n_pairs"))
        val docsClusters = comp.agg(count(lit(1)).as("n_docs"),
          countDistinct(col("label")).as("n_clusters"))
        val largest = comp.groupBy("label").agg(count(lit(1)).as("_c"))
          .agg(max(col("_c")).as("largest"))
        nPairs.crossJoin(docsClusters).crossJoin(largest)
          .select(lit(t).as("threshold"), col("n_pairs"), col("n_docs"),
            col("n_clusters"), col("largest"))
      }
      frames.reduce(_ unionByName _).orderBy("threshold")
    }),


    // ----- chi-square feature-label association audit ----------------
    "q169_chi_square" -> ((s, dir) => {
      // is order value associated with return status? — per-cell
      // observed/expected/term rows plus the decimal-summed statistic
      // folded in; all integer marginals, one divide per cell, lattice
      // terms so the sum reproduces at any parallelism
      val cells = graft.operators.Stats.chiSquareCells(
        rd(s, dir, "lineitem"), "l_extendedprice", lo = 0.0, hi = 80000.0,
        bins = 8, yCol = "l_returnflag")
      cells.agg(
        count(lit(1)).as("n_cells"),
        countDistinct(col("bin")).as("n_bins"),
        countDistinct(col("y")).as("n_labels"),
        sum(col("o")).as("n_rows"),
        sum(col("term").cast("decimal(28,12)")).cast("double").as("chi2"))
        .select(col("n_cells"), col("n_bins"), col("n_labels"), col("n_rows"),
          ((col("n_bins") - 1) * (col("n_labels") - 1)).as("dof"),
          r(col("chi2"), 6).as("chi2"),
          // Cramér's V normalizes the statistic to [0,1] across table
          // shapes: sqrt(chi2 / (N · min(r−1, c−1))) — one sqrt on
          // already-deterministic operands
          r(sqrt(r(col("chi2"), 6) /
            (col("n_rows") * least(col("n_bins") - 1, col("n_labels") - 1))
              .cast("double")), 6).as("cramers_v"))
    }),


    // ----- hierarchical rollup (the recursive-CTE surface) -----------
    "q213_org_rollup" -> ((s, dir) => {
      // org-chart report over a parent-pointer forest derived from
      // customer (parent(k) = k/3 above the 11 roots 0..10): per-root
      // node counts, max depth, exact subtree balance totals. The engine
      // resolves every chain by pointer DOUBLING — O(log2 depth) joins,
      // not O(depth) — while DuckDB's native WITH RECURSIVE walks the
      // same forest one level at a time as the oracle.
      val nodes = rd(s, dir, "customer").select(
        col("c_custkey").cast("long").as("node"),
        when(col("c_custkey") <= 10, col("c_custkey"))
          .otherwise(floor(col("c_custkey") / lit(3.0))).cast("long").as("parent"),
        col("c_acctbal"))
      graft.operators.Hierarchy.subtreeRollup(nodes, "node", "parent", "c_acctbal")
        .select(col("root"), col("n_nodes"), col("max_depth"),
          r(col("total_value"), 2).as("total_bal"))
        .orderBy("root")
    }),


    // ----- per-depth profile of the same forest ----------------------
    "q214_depth_profile" -> ((s, dir) => {
      // tree-shape audit on the per-node surface: how many nodes and
      // LEAVES (nobody's parent) sit at each depth — the histogram that
      // catches a degenerate (chain-shaped) hierarchy before a recursive
      // workload is launched against it. One doubling resolution + one
      // anti-join for leaf-ness + one aggregation.
      val cust = rd(s, dir, "customer")
      val nodes = cust.select(
        col("c_custkey").cast("long").as("node"),
        when(col("c_custkey") <= 10, col("c_custkey"))
          .otherwise(floor(col("c_custkey") / lit(3.0))).cast("long").as("parent"))
      val resolved = graft.operators.Hierarchy.rootsAndDepths(nodes, "node", "parent")
      val parents = nodes.filter(col("node") =!= col("parent"))
        .select(col("parent").as("pnode")).distinct()
      resolved.join(parents, col("node") === col("pnode"), "left")
        .groupBy("depth")
        .agg(count(lit(1)).as("n_nodes"),
          sum(when(col("pnode").isNull, 1L).otherwise(0L)).as("n_leaves"),
          countDistinct(col("root")).as("n_roots"))
        .orderBy("depth")
    }),


    // ----- VARIANT shredding (semi-structured ingestion) -------------
    "q215_variant_shred" -> ((s, dir) => {
      // semi-structured ingestion through Spark 4's VARIANT type: order
      // rows serialized to JSON in-plan, parsed ONCE into the
      // binary-encoded VARIANT (path access without re-parsing — the
      // modern answer to q102's per-path get_json_object), then shredded
      // back to typed columns with variant_get: nested-object path,
      // array index, boolean, and a MISSING path (NULL, not an error).
      // The oracle never sees JSON or VARIANT — it predicts the report
      // straight from the source columns, so a value mangled anywhere in
      // the serialize -> parse -> extract chain fails the gate (doubles
      // survive because JSON shortest-repr round-trips exactly).
      val v = rd(s, dir, "orders").select(parse_json(to_json(struct(
          col("o_orderkey").as("k"),
          col("o_totalprice").as("price"),
          struct(col("o_orderpriority").as("p"),
            col("o_orderstatus").as("st")).as("meta"),
          array((col("o_orderkey") % 7).cast("long"),
            (col("o_orderkey") % 11).cast("long")).as("arr"),
          (col("o_orderkey") % 3 === 0).as("flag")))).as("v"))
      v.select(
          variant_get(col("v"), "$.meta.p", "string").as("priority"),
          variant_get(col("v"), "$.k", "bigint").as("k"),
          variant_get(col("v"), "$.price", "double").as("price"),
          variant_get(col("v"), "$.arr[1]", "bigint").as("m11"),
          variant_get(col("v"), "$.flag", "boolean").as("flag"),
          variant_get(col("v"), "$.nope", "string").as("missing"))
        .groupBy("priority")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          sum(col("price").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum(col("m11")).as("sum_m11"),
          sum(when(col("flag"), 1L).otherwise(0L)).as("n_flag"),
          sum(when(col("missing").isNull, 1L).otherwise(0L)).as("n_missing"))
        .orderBy("priority")
    }),


    // ----- WebP header decode (all three first-chunk layouts) --------
    "q218_webp_headers" -> ((s, dir) => {
      // RIFF/WEBP bytes assembled in-plan across the three real
      // first-chunk layouts — VP8X (24-bit LE canvas dims), VP8L
      // (14-bit packed dims), lossy VP8 (14-bit LE dims behind the
      // frame sync) — plus a truncated class: recognized container,
      // NULL dims. The oracle predicts everything from doc_id
      // arithmetic; the decoder walks actual bytes.
      def beHex(c: Column, n: Int) = lpad(hex(c), n, "0")
      def leHex(c: Column, bytes: Int) = {
        val be = beHex(c, bytes * 2)
        concat((0 until bytes).reverse.map(i => substring(be, i * 2 + 1, 2)): _*)
      }
      val pre = "52494646" + "24000000" + "57454250" // RIFF size WEBP
      val vp8x = concat(unhex(lit(pre + "56503858" + "0A000000" + "00000000")),
        unhex(leHex((col("doc_id") % 300).cast("long"), 3)),
        unhex(leHex((col("doc_id") % 200).cast("long"), 3)))
      val vp8lBits = (col("doc_id") % 1000 +
        (col("doc_id") % 700) * 16384).cast("long")
      val vp8l = concat(unhex(lit(pre + "5650384C" + "05000000" + "2F")),
        unhex(leHex(vp8lBits, 4)))
      val vp8 = concat(unhex(lit(pre + "56503820" + "0A000000" +
          "000000" + "9D012A")),
        unhex(leHex((col("doc_id") % 1000 + 1).cast("long"), 2)),
        unhex(leHex((col("doc_id") % 600 + 1).cast("long"), 2)))
      val truncated = unhex(lit("52494646" + "10000000" + "57454250" + "56503858"))
      val media = rd(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 4 === 0, vp8x)
          .when(col("doc_id") % 4 === 1, vp8l)
          .when(col("doc_id") % 4 === 2, vp8)
          .otherwise(truncated).as("payload"),
        lit("application/octet-stream").as("mime"))
      Multimodal.withDecodedMeta(media, "payload", "mime")
        .select(col("doc_id"), col("media.mime").as("detected_mime"),
          col("media.width").as("width"), col("media.height").as("height"),
          col("media.byte_len").as("byte_len"))
        .orderBy("doc_id")
    }),


    // ----- strongly connected components (directed clustering) -------
    "q222_scc" -> ((s, dir) => {
      // SCC over a directed graph of 10-node cycles bridged by a
      // one-way block DAG — link-graph provenance clustering, where the
      // undirected CC (q56) would wrongly merge everything the one-way
      // bridges touch. The fixture is deliberately SF-independent (100
      // nodes): the refinement's cost axis is rounds x phases, which
      // depends on graph SHAPE, not corpus size — the per-round work is
      // one equi-join + one min-aggregation that scales with the edge
      // count. DuckDB's oracle is the full recursive-CTE transitive
      // closure: scc(u) = min of the mutually-reachable set.
      val ids = rd(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("n")).filter(col("n") < 100)
      val cyc = ids.selectExpr("n AS s", "(n - n % 10) + ((n + 1) % 10) AS d")
      val br1 = ids.filter(expr("n % 10 = 0 AND (n div 10) * 2 + 1 < 10"))
        .selectExpr("n AS s", "((n div 10) * 2 + 1) * 10 AS d")
      val br2 = ids.filter(expr("n % 10 = 0 AND (n div 10) * 3 + 2 < 10"))
        .selectExpr("n AS s", "((n div 10) * 3 + 2) * 10 AS d")
      graft.operators.Graph.stronglyConnectedComponents(
          cyc.unionByName(br1).unionByName(br2), "s", "d")
        .orderBy("node")
    }),


    // ----- bounded-hop BFS distances (blast radius) ------------------
    "q224_hop_distances" -> ((s, dir) => {
      // "everything within 12 hops of block 0" over q222's directed
      // cycle-blocks-bridged-by-DAG graph: minimum hop counts from a
      // SEED SET, unreachable nodes absent (blocks 4/6/9 have no
      // incoming bridge chain — reachability, not just distance, is on
      // the hook, and the deepest reached nodes sit EXACTLY at the
      // 12-hop cap). Fixed-hop unrolling: ~maxHops/4 jobs total, no
      // per-round convergence actions.
      val ids = rd(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("n")).filter(col("n") < 100)
      val cyc = ids.selectExpr("n AS s", "(n - n % 10) + ((n + 1) % 10) AS d")
      val br1 = ids.filter(expr("n % 10 = 0 AND (n div 10) * 2 + 1 < 10"))
        .selectExpr("n AS s", "((n div 10) * 2 + 1) * 10 AS d")
      val br2 = ids.filter(expr("n % 10 = 0 AND (n div 10) * 3 + 2 < 10"))
        .selectExpr("n AS s", "((n div 10) * 3 + 2) * 10 AS d")
      graft.operators.Graph.boundedHopDistances(
          cyc.unionByName(br1).unionByName(br2), "s", "d",
          ids.filter(col("n") < 10), "n", maxHops = 12)
        .orderBy("node")
    }),


    // ----- weighted shortest paths (Bellman-Ford relaxation) ---------
    "q226_weighted_paths" -> ((s, dir) => {
      // cheapest routes, not fewest hops: the q224 graph re-weighted
      // (w = s%5 + d%3 + 1, all-integer so every cost is an exact long)
      // — on cycles the cheap way around may be the LONG way, which
      // hop-BFS cannot see. Same lazily-unrolled relaxation: ~rounds/4
      // jobs, no per-round convergence actions.
      val ids = rd(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("n")).filter(col("n") < 100)
      val cyc = ids.selectExpr("n AS s", "(n - n % 10) + ((n + 1) % 10) AS d")
      val br1 = ids.filter(expr("n % 10 = 0 AND (n div 10) * 2 + 1 < 10"))
        .selectExpr("n AS s", "((n div 10) * 2 + 1) * 10 AS d")
      val br2 = ids.filter(expr("n % 10 = 0 AND (n div 10) * 3 + 2 < 10"))
        .selectExpr("n AS s", "((n div 10) * 3 + 2) * 10 AS d")
      val weighted = cyc.unionByName(br1).unionByName(br2)
        .withColumn("w", expr("s % 5 + d % 3 + 1"))
      graft.operators.Graph.boundedCostDistances(weighted, "s", "d", "w",
          ids.filter(col("n") < 10), "n", rounds = 16)
        .orderBy("node")
    }),


    // ----- time-respecting reachability (temporal spread) ------------
    "q229_temporal_reach" -> ((s, dir) => {
      // the q224 graph with edge TIMES (t = (s*7 + d) % 32): influence
      // flows only along nondecreasing-time paths, so blocks reachable
      // by plain BFS can be temporally UNREACHABLE (a bridge whose time
      // has already passed by the time the cycle delivers), and
      // earliest arrivals differ from hop distances. The oracle walks
      // the same time-gated recursion.
      val ids = rd(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("n")).filter(col("n") < 100)
      val cyc = ids.selectExpr("n AS s", "(n - n % 10) + ((n + 1) % 10) AS d")
      val br1 = ids.filter(expr("n % 10 = 0 AND (n div 10) * 2 + 1 < 10"))
        .selectExpr("n AS s", "((n div 10) * 2 + 1) * 10 AS d")
      val br2 = ids.filter(expr("n % 10 = 0 AND (n div 10) * 3 + 2 < 10"))
        .selectExpr("n AS s", "((n div 10) * 3 + 2) * 10 AS d")
      val timed = cyc.unionByName(br1).unionByName(br2)
        .withColumn("t", expr("(s * 7 + d) % 32"))
      graft.operators.Graph.temporalReachability(timed, "s", "d", "t",
          ids.filter(col("n") < 10), "n", startTime = 0L, rounds = 12)
        .orderBy("node")
    }),


    // ----- cross-source duplicate overlap matrix ---------------------
    "q232_source_overlap" -> ((s, dir) => {
      // which FEEDS overlap? — the near-dup pair set attributed to an
      // unordered source pair (synthetic variant ids map back to their
      // base document's source via id % 10000): pair counts and the
      // duplicated character mass per (source, source) cell. The report
      // a data buyer reads before paying twice for the same corpus.
      // Two broadcastable joins past the shared materialized pair set.
      val src = rd(s, dir, "documents").select(col("doc_id").as("bid"),
        col("source"), col("n_chars"))
      val pairs = nearDupPairsCached(s, dir)
        .select((col("id_a") % 10000).as("ba"), (col("id_b") % 10000).as("bb"))
      pairs
        .join(src.select(col("bid").as("ba"), col("source").as("sa"),
          col("n_chars").as("ca")), "ba")
        .join(src.select(col("bid").as("bb"), col("source").as("sb"),
          col("n_chars").as("cb")), "bb")
        .select(least(col("sa"), col("sb")).as("source_x"),
          greatest(col("sa"), col("sb")).as("source_y"),
          (col("ca") + col("cb")).as("pair_chars"))
        .groupBy("source_x", "source_y")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("pair_chars")).as("dup_chars"))
        .orderBy("source_x", "source_y")
    }),


    // ----- duplicate length-bias audit --------------------------------
    "q234_dup_length_bias" -> ((s, dir) => {
      // does near-duplication correlate with document LENGTH? — the
      // dedup-bias measurement behind "dedup changed my length mix":
      // base docs that participate in any near-dup pair vs those that
      // don't, compared on the n_chars distribution with the q124
      // ln-free symmetric drift term. Membership comes from the shared
      // materialized pair set (variant ids map back via % 10000); each
      // side collapses to <= 24 bins before anything joins.
      val members = nearDupPairsCached(s, dir)
        .select((col("id_a") % 10000).as("doc_id"))
        .unionByName(nearDupPairsCached(s, dir)
          .select((col("id_b") % 10000).as("doc_id")))
        .distinct()
      val docs = rd(s, dir, "documents").select("doc_id", "n_chars")
      val dup = docs.join(members, Seq("doc_id"), "left_semi")
      val uniq = docs.join(members, Seq("doc_id"), "left_anti")
      graft.operators.Stats.distributionDrift(dup, uniq, "n_chars",
          lo = 0.0, hi = 1200.0, bins = 24)
        .orderBy("bin")
    }),


    // ----- backfill planner (partition-gap audit) --------------------
    "q233_backfill_plan" -> ((s, dir) => {
      // which daily partitions need backfill? — the ingest-ops audit:
      // the expected calendar spans the observed min..max day
      // (sequence + explode, span-bounded), every day classified ok /
      // short (under half the median daily volume) / missing (absent
      // entirely). The fixture deletes every dom%7==3 day and keeps a
      // quarter of every dom%5==0 day, so all three classes appear.
      val ev = rd(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("event_id"))
        .withColumn("dom", dayofmonth(col("day")))
        .filter(col("dom") % 7 =!= 3)
        .filter(col("dom") % 5 =!= 0 || col("event_id") % 4 === 0)
      val daily = ev.groupBy("day").agg(count(lit(1)).as("cnt"))
      val med = daily.agg(expr("percentile(cnt, 0.5)").as("med"))
      val calendar = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      calendar.join(daily, Seq("day"), "left").crossJoin(broadcast(med))
        .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"),
          when(col("cnt").isNull, lit("missing"))
            .when(col("cnt") * 2 < col("med"), lit("short"))
            .otherwise(lit("ok")).as("status"))
        .orderBy("day")
    }),


    // ----- interval coalescing (activity coverage) -------------------
    "q230_interval_merge" -> ((s, dir) => {
      // each event opens a 300-second activity lease; overlapping and
      // abutting leases merge into maximal disjoint spans per user via
      // the running-max islands (one key exchange + one in-partition
      // sort — never a self-join or a per-second explode). The per-user
      // report: spans, covered seconds, longest span — covered_sec <
      // n_events*300 exactly where leases overlapped.
      val ev = rd(s, dir, "events").filter(col("user_id") % 5 === 0)
        .select(col("user_id"), col("ts").cast("long").as("start_sec"),
          (col("ts").cast("long") + 300L).as("end_sec"))
      graft.operators.Sequence.coalesceIntervals(ev, "user_id",
          "start_sec", "end_sec")
        .groupBy(col("key").as("user_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("end_sec") - col("start_sec")).as("covered_sec"),
          max(col("end_sec") - col("start_sec")).as("max_span_sec"))
        .orderBy("user_id")
    }),


    // ----- retraction-aware rollup maintenance (IVM with deletes) ----
    "q219_retract_rollup" -> ((s, dir) => {
      // q150's materialized rollup under a changelog that DELETES as
      // well as inserts (corrections / GDPR erasure / late retractions):
      // count/sum/sumsq retract algebraically from signed changelog
      // partials — no history rescan — while min/max recompute only for
      // the touched (user, day) groups via a broadcast-semi-pruned scan
      // of the post-change slice. The oracle rebuilds from the
      // post-change table directly: increment must equal rebuild
      // bit-for-bit.
      val ev = rd(s, dir, "events").filter(col("user_id") % 20 === 0)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val day = (c: Column) => to_date(c)
      val state = graft.operators.IncrementalAgg.partials(
        ev, Seq("user_id"), day(col("ts")), "value")
      val dels = ev.filter(col("event_id") % 7 === 0).withColumn("op", lit("D"))
      val ins = ev.filter(col("event_id") % 11 === 0)
        .select(col("user_id"), (col("event_id") + 1000000L).as("event_id"),
          col("ts"), (col("value") * 2).as("value"))
        .withColumn("op", lit("I"))
      val rawAfter = ev.filter(col("event_id") % 7 =!= 0)
        .unionByName(ins.drop("op"))
      val newState = graft.operators.IncrementalAgg.applyChangelog(
        state, dels.unionByName(ins), rawAfter,
        Seq("user_id"), day, "ts", "value", "op")
      graft.operators.IncrementalAgg.rollup(newState, Seq("user_id"))
        .orderBy("user_id")
    }),


    // ----- POSIX ustar census (tarball ingest triage) ----------------
    "q220_tar_census" -> ((s, dir) => {
      // real 512-byte ustar headers assembled in-plan — including the
      // format's own integrity word (the octal CHECKSUM over header
      // bytes, computed as a fixed-part constant plus an in-plan
      // octal-digit byte sum), which the walker verifies before
      // trusting any field. Three classes: a two-entry archive with
      // zero-block termination, a one-entry archive with clean-EOF
      // termination, and a truncated-data archive that must refuse
      // with NULLs. The oracle predicts counts and size totals from
      // doc_id arithmetic alone.
      def fixStr(str: String) = lit(str.getBytes("ISO-8859-1"))
      def z(n: Int) = lit(Array.fill[Byte](n)(0))
      def strSum(str: String) = str.map(_.toInt).sum
      val fixedSum = strSum("a") + strSum("0000644") + 2 * strSum("0000000") +
        strSum("00000000000") + 8 * 32 + '0'.toInt + strSum("ustar") + strSum("00")
      def octB(c: Column, w: Int) = lpad(conv(c.cast("string"), 10, 8), w, "0")
      def digitSum(c: Column) = aggregate(split(octB(c, 11), ""), lit(0),
        (a, x) => a + coalesce(ascii(x), lit(0)))
      def header(size: Column) = {
        val ck = octB((lit(fixedSum) + digitSum(size)).cast("long"), 6)
        concat(
          fixStr("a"), z(99),                                   // name
          fixStr("0000644\u0000"), fixStr("0000000\u0000"),     // mode, uid
          fixStr("0000000\u0000"),                              // gid
          octB(size, 11).cast("binary"), z(1),                  // size
          fixStr("00000000000\u0000"),                          // mtime
          ck.cast("binary"), fixStr("\u0000 "),                 // chksum
          fixStr("0"), z(100),                                  // typeflag, linkname
          fixStr("ustar\u0000"), fixStr("00"),                  // magic, version
          z(247))                                               // tail padding
      }
      def dataOf(sizeSql: String) = expr(s"cast(repeat('x', $sizeSql) as binary)")
      val s1sql = "(CAST(doc_id % 5 AS INT) + 1) * 512"
      val s2sql = "(CAST(doc_id % 4 AS INT) + 1) * 512"
      val good2 = concat(header(expr(s1sql)), dataOf(s1sql),
        header(expr(s2sql)), dataOf(s2sql), z(1024))
      val good1 = concat(header(expr(s1sql)), dataOf(s1sql))
      val trunc = concat(header(lit(1024)), dataOf("512"))
      val payload = when(col("doc_id") % 3 === 0, good2)
        .when(col("doc_id") % 3 === 1, good1)
        .otherwise(trunc)
      graft.operators.Archives.withTarMeta(
          rd(s, dir, "documents").select(col("doc_id"), payload.as("payload")),
          "payload")
        .select(col("doc_id"), col("tar.n_entries").as("n_entries"),
          col("tar.bytes_total").as("bytes_total"),
          col("tar.byte_len").as("byte_len"))
        .orderBy("doc_id")
    }),

  )

  /** q272's per-row fixture: a two-record WARC stream whose response
    * body IS the document's text, with delivery/damage/admission
    * classes from doc_id arithmetic (see the q272 banner). Survivor
    * predicate: d%7 != 0 (not truncated) AND (d%3 != 0 OR d%5 == 0)
    * (path not /blk/, or a robots-less domain — (d%20)%5 == d%5). */
  private[graft] def warcCrawlPayload(d: Long, text: String): Array[Byte] = {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + text
    val dm = d % 20
    val path = if (d % 3 == 0) s"/blk/p$d" else s"/ok/p$d"
    val recs = Seq(
      graft.operators.Warc.Record("warcinfo", s"<urn:uuid:$d-0>",
        "2024-01-01T00:00:00Z", null, 0,
        s"crawl $d".getBytes(java.nio.charset.StandardCharsets.US_ASCII)),
      graft.operators.Warc.Record("response", s"<urn:uuid:$d-1>",
        "2024-01-01T00:00:01Z", s"https://d$dm.ex.org$path", 0,
        http.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val full = graft.operators.Warc.encode(recs, gzipPerRecord = d % 2 == 1)
    if (d % 7 == 0) full.take(40) else full
  }

  /** q267's per-row fixture: a WARC stream whose record ledger is
    * doc_id arithmetic (see the q267 banner). The HTTP prefix is 45
    * bytes, so response content lengths are 45 + body. */
  private[graft] def warcFixturePayload(d: Long): Array[Byte] = {
    val cls = (d % 4).toInt
    val n = 2 + (d % 3).toInt
    def http(body: String): String =
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body
    val recs = (0 until n).map { i =>
      val (typ, payload, uri) =
        if (i == 0) ("warcinfo", "i" * (10 + (d % 20)).toInt, null)
        else if (i % 2 == 1)
          ("response", http("b" * (5 + ((d + 3 * i) % 40)).toInt),
            s"https://ex.org/$d/$i")
        else ("request", "r" * (4 + ((d + 2 * i) % 9)).toInt,
          s"https://ex.org/$d/$i")
      graft.operators.Warc.Record(typ, s"<urn:uuid:$d-$i>",
        "2024-01-01T00:00:00Z", uri, 0,
        payload.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    cls match {
      case 0 => graft.operators.Warc.encode(recs, gzipPerRecord = false)
      case 1 => graft.operators.Warc.encode(recs, gzipPerRecord = true)
      case 2 => graft.operators.Warc.encode(recs, gzipPerRecord = false).dropRight(3)
      case _ => s"no warc $d".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    }
  }

  /** q264's per-row fixture: a baseline TIFF whose pixels are doc_id
    * arithmetic (see the q264 banner). Pure and serializable. */
  private[graft] def tiffFixturePayload(d: Long): Array[Byte] = {
    def pm(x: Long): Int = (((x % 256) + 256) % 256).toInt
    val z = graft.operators.Tiff
    (d % 6).toInt match {
      case 0 => z.encode(5, 3, 1, littleEndian = true, packBits = false, 3,
        (x, y) => pm(d * 7 + x + 2 * y))
      case 1 => z.encode(6, 4, 0, littleEndian = false, packBits = true, 2,
        (x, y) => pm(d * 3 + y)) // WhiteIsZero: decoder must invert
      case 2 => z.encode(4, 2, 2, littleEndian = true, packBits = false, 2,
        (x, y) => (pm(d * 5 + x) << 16) | (pm(d * 11 + y) << 8) | pm(d + x + y))
      case 3 => z.encode(4, 4, 2, littleEndian = false, packBits = true, 2,
        (x, y) => (pm(d * 5 + x) << 16) | (pm(d * 11 + y) << 8) | pm(d + x + y))
      case 4 => z.encode(5, 3, 1, littleEndian = true, packBits = false, 3,
        (x, y) => pm(d * 7 + x + 2 * y)).take(20)
      case _ => s"not a tiff $d".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** q262's per-row fixture: a minimal ISO-BMFF file whose sample tables
    * are pure functions of doc_id (see the q262 banner). Pure and
    * serializable — runs inside the Dataset map. */
  private[graft] def mp4FixturePayload(d: Long): Array[Byte] = {
    val cls = (d % 5).toInt
    val n = 3 + (d % 4).toInt
    val m7 = d % 7
    val sizes = Array.tabulate(n)(i => 50L + 3 * i + m7)
    val delta = 30L + 5 * (d % 3)
    val deltas = Array.fill(n)(delta)
    val keys = (1 to n by 3).toArray
    cls match {
      case 0 => graft.operators.Mp4.encode(1000L, sizes, deltas, keys, withStss = true)
      case 1 => graft.operators.Mp4.encode(1000L, sizes, deltas, keys, withStss = false)
      case 2 => graft.operators.Mp4.encode(1000L, sizes, deltas, keys,
        withStss = false, audioSamples = 2)
      case 3 => graft.operators.Mp4.encode(1000L, sizes, deltas, keys,
        withStss = true).take(60)
      case _ => s"not a video $d".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** q258's per-row fixture: a DC-only baseline JPEG whose pixels are a
    * pure function of doc_id (see the q258 banner). Runs inside the
    * Dataset map — must stay a pure, serializable function. */
  /** Progressive (SOF2) fixtures for q293, classes by doc_id % 4:
    * 0 = 2×2-block gray with one spanning EOBn run; 1 = the same image
    * through per-block EOBs and restartInterval=1 (scan resync);
    * 2 = truncated mid-scan (Malformed, NULL stats); 3 = 1×1 gray.
    * All DC-only at quant 8, so pixels are doc_id arithmetic. */
  private[graft] def jpegProgressiveFixturePayload(d: Long): Array[Byte] = {
    def pm(x: Long): Int = (((x % 256) + 256) % 256).toInt
    def block(bx: Int, by: Int): Int = pm(d * 3 + 10 * bx + 20 * by)
    (d % 4).toInt match {
      case 0 => graft.operators.Jpeg.encodeDcOnlyProgressive(2, 2, block)
      case 1 => graft.operators.Jpeg.encodeDcOnlyProgressive(2, 2, block,
        eobnAcScan = false, restartInterval = 1)
      case 2 =>
        val g = graft.operators.Jpeg.encodeDcOnlyProgressive(2, 2, block)
        g.take(g.length - 8) // truncated mid-final-scan
      case _ => graft.operators.Jpeg.encodeDcOnlyProgressive(1, 1,
        (_, _) => pm(d * 11 + 23))
    }
  }

  private[graft] def jpegFixturePayload(d: Long): Array[Byte] = {
    def pm(x: Long): Int = (((x % 256) + 256) % 256).toInt
    val cls = (d % 6).toInt
    def gray() =
      graft.operators.Jpeg.encodeDcOnly(1, 1, null, (_, _, _) => pm(d * 11 + 23))
    cls match {
      case 0 | 1 => gray()
      case 3 =>
        // stray marker at entropy start (grayscale SOS header = marker
        // + 8 payload bytes) — structurally a scan that hits FF C0
        val g = gray()
        val sos = g.indices.find(i => (g(i) & 0xFF) == 0xFF &&
          (g(i + 1) & 0xFF) == 0xDA).get
        g.updated(sos + 10, 0xFF.toByte).updated(sos + 11, 0xC0.toByte)
      case 5 => gray().take(30) // truncated mid-DQT
      case c =>
        val samp =
          if (c == 2) Array((1, 1), (1, 1), (1, 1)) // 4:4:4
          else Array((2, 2), (1, 1), (1, 1)) // 4:2:0
        graft.operators.Jpeg.encodeDcOnly(2, 2, samp, (comp, bx, by) =>
          comp match {
            case 0 => pm(d * 3 + 10 * bx + 20 * by)
            case 1 => pm(d * 5)
            case _ => pm(d * 7)
          })
    }
  }

  val oracleSql: Map[String, String] = Map(

    "q100_training_pipeline" -> {
      val scores = langScores.map { case (l, e) => s"    CAST($e AS BIGINT) AS s_$l" }
        .mkString(",\n")
      val best = "greatest(" + langScores.map("s_" + _._1).mkString(", ") + ")"
      val chain = langScores.map(_._1).sorted.reverse
        .map(l => s"WHEN s_$l = best THEN '$l'").mkString("\n            ")
      val c80 = graft.operators.Sampling.hexCutoff(0.8)
      val c90 = graft.operators.Sampling.hexCutoff(math.min(0.8 + 0.1, 1.0))
      // the minhash candidate/verify chain, re-pointed at the GATED
      // deduped corpus (the tail references the `corpus` CTE by name)
      val minhashTail = minhashPairsCtes.stripPrefix(nearDupCte)
      s"""WITH RECURSIVE raw AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, substr(text, strpos(text, ' ') + 1)
         |  FROM documents WHERE doc_id % 7 = 0),
         |sc0 AS (SELECT doc_id, text,
         |$scores
         |  FROM raw),
         |bb AS (SELECT *, $best AS best FROM sc0),
         |lng AS (SELECT doc_id, text, CASE WHEN best = 0 THEN 'und'
         |            $chain END AS lang_pred FROM bb),
         |gq AS (SELECT doc_id, text,
         |    regexp_replace(trim(text), '\\s+', ' ', 'g') AS norm
         |  FROM lng WHERE lang_pred = 'en'),
         |gated AS (SELECT doc_id, text FROM gq
         |  WHERE CAST(CASE WHEN norm = '' THEN 0
         |        ELSE length(norm) - length(replace(norm, ' ', '')) + 1
         |        END AS BIGINT) >= 30
         |    AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) /
         |      greatest(CAST(length(text) AS DOUBLE), 1.0) > 0.55),
         |fpx AS (SELECT doc_id, text,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM gated),
         |keep AS (SELECT fp, min(doc_id) AS doc_id FROM fpx GROUP BY 1),
         |corpus AS (SELECT f.doc_id, f.text FROM fpx f
         |  JOIN keep k ON f.fp = k.fp AND f.doc_id = k.doc_id)$minhashTail,
         |e AS (SELECT id_a AS x, id_b AS y FROM pairs WHERE j >= 0.6
         |      UNION ALL
         |      SELECT id_b, id_a FROM pairs WHERE j >= 0.6),
         |reach(node, label) AS (
         |  SELECT x, x FROM e
         |  UNION
         |  SELECT e2.x, r.label FROM e e2 JOIN reach r ON e2.y = r.node),
         |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
         |canon AS (SELECT c.doc_id, c.text FROM corpus c
         |  LEFT JOIN comp ON comp.node = c.doc_id
         |  WHERE coalesce(comp.component, c.doc_id) = c.doc_id),
         |sp AS (SELECT doc_id, text,
         |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$c80' THEN 'train'
         |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$c90' THEN 'val'
         |       ELSE 'test' END AS split FROM canon),
         |nm AS (SELECT split,
         |  regexp_replace(trim(text), '\\s+', ' ', 'g') AS norm FROM sp)
         |SELECT split, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN norm = '' THEN 0
         |       ELSE length(norm) - length(replace(norm, ' ', '')) + 1
         |       END) AS BIGINT) AS sum_tokens
         |FROM nm GROUP BY 1 ORDER BY 1""".stripMargin
    },


    "q106_correlation" ->
      """WITH m AS (SELECT l_returnflag,
        |  CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
        |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,12))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |  floor((n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) * 1000000 + 0.5)
        |    / 1000000 AS corr
        |FROM m ORDER BY 1""".stripMargin,


    "q107_linear_fit" ->
      """WITH d AS (SELECT user_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) - 1704067200 AS x,
        |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS ym
        |  FROM events WHERE user_id % 10 = 0),
        |m AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(x) AS DOUBLE) AS sx,
        |  CAST(SUM(ym) AS DOUBLE) AS sy,
        |  CAST(SUM(x * ym) AS DOUBLE) AS sxy,
        |  CAST(SUM(x * x) AS DOUBLE) AS sxx
        |  FROM d GROUP BY 1)
        |SELECT user_id,
        |  floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
        |    * 1000.0 + 0.5) / 1000000000.0 AS slope,
        |  floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
        |    + 0.5) / 1000000.0 AS intercept
        |FROM m WHERE n * sxx - sx * sx <> 0.0 ORDER BY 1""".stripMargin,


    "q211_join_order" ->
      """WITH cl AS (SELECT l_orderkey AS k, count(*) AS nl
        |  FROM lineitem GROUP BY 1),
        |co AS (SELECT o_orderkey AS k, count(*) AS no FROM orders GROUP BY 1),
        |cc AS (SELECT c_custkey AS k, count(*) AS nc FROM customer GROUP BY 1),
        |cu AS (SELECT o_custkey AS k, count(*) AS nu FROM orders GROUP BY 1),
        |lo AS (SELECT coalesce(CAST(sum(nl * no) AS BIGINT), 0) AS v
        |  FROM cl JOIN co USING (k)),
        |oc AS (SELECT coalesce(CAST(sum(nu * nc) AS BIGINT), 0) AS v
        |  FROM cu JOIN cc USING (k)),
        |fin AS (SELECT coalesce(CAST(sum(cl.nl * cc.nc) AS BIGINT), 0) AS v
        |  FROM orders
        |  JOIN cl ON cl.k = o_orderkey
        |  JOIN cc ON cc.k = o_custkey),
        |u AS (SELECT 'a_lineitem_orders_first' AS path,
        |    (SELECT v FROM lo) AS intermediate_rows
        |  UNION ALL SELECT 'b_orders_customer_first', (SELECT v FROM oc))
        |SELECT path, intermediate_rows, (SELECT v FROM fin) AS final_rows,
        |  intermediate_rows = least((SELECT v FROM lo), (SELECT v FROM oc))
        |    AS recommended
        |FROM u ORDER BY path""".stripMargin,

    "q209_trend_r2" ->
      """WITH d AS (SELECT user_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) - 1704067200 AS x,
        |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS ym
        |  FROM events WHERE user_id % 7 = 1),
        |m AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(x) AS DOUBLE) AS sx,
        |  CAST(SUM(ym) AS DOUBLE) AS sy,
        |  CAST(SUM(x * ym) AS DOUBLE) AS sxy,
        |  CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |  CAST(SUM(ym * ym) AS DOUBLE) AS syy
        |  FROM d GROUP BY 1),
        |c AS (SELECT user_id, n * sxy - sx * sy AS cov,
        |  n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy FROM m)
        |SELECT user_id,
        |  CASE WHEN vy <> 0.0
        |       THEN floor(cov * cov / (vx * vy) * 1000000 + 0.5) / 1000000
        |  END AS r2,
        |  CASE WHEN cov > 0 THEN 'rising' WHEN cov < 0 THEN 'falling'
        |       ELSE 'flat' END AS trend
        |FROM c WHERE vx <> 0.0 ORDER BY user_id""".stripMargin,

    "q108_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |  CAST(floor(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |    / 604800) AS BIGINT) AS week
        |  FROM events),
        |first AS (SELECT user_id, MIN(week) AS cohort FROM ev GROUP BY 1)
        |SELECT cohort, week, COUNT(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN first USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "q109_mixture_sample" ->
      """WITH tot AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
        |  FROM documents GROUP BY 1),
        |r AS (SELECT source,
        |  least(10000.0 * CASE source WHEN 'src0' THEN 0.5
        |        WHEN 'src1' THEN 0.3 WHEN 'src2' THEN 0.2 ELSE 0.0 END
        |    / CAST(w AS DOUBLE), 1.0) AS rate
        |  FROM tot)
        |SELECT d.source, COUNT(*) AS n_kept,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
        |FROM documents d JOIN r ON d.source = r.source
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |  < floor(rate * 4294967296.0 + 0.5)
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q111_video_headers" ->
      """SELECT doc_id,
        |  'video/mp4' AS detected_mime,
        |  CASE WHEN doc_id % 4 = 3 THEN NULL
        |       ELSE (((doc_id % 50 + 1) * 1000 + doc_id % 997) * 1000)
        |            // ((doc_id % 90 + 10) * 100)
        |  END AS duration_ms,
        |  CAST(CASE WHEN doc_id % 4 = 3 THEN 24
        |            WHEN doc_id % 5 = 0 THEN 64
        |            ELSE 52 END AS BIGINT) AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q210_zip_census" ->
      """WITH d AS (SELECT doc_id, doc_id % 4 + 1 AS n,
        |  list_sum([100 + (doc_id + i) % 50
        |            FOR i IN range(0, CAST(doc_id % 4 + 1 AS INT))]) AS sc
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 7 THEN NULL
        |       ELSE CAST(n AS INTEGER) END AS n_entries,
        |  CASE WHEN doc_id % 11 = 7 THEN NULL
        |       ELSE CAST(sc AS BIGINT) END AS bytes_comp,
        |  CASE WHEN doc_id % 11 = 7 THEN NULL
        |       ELSE CAST(2 * sc AS BIGINT) END AS bytes_uncomp,
        |  CAST(32 * n + sc + 48 * n + 22
        |    - CASE WHEN doc_id % 11 = 7 THEN 4 ELSE 0 END AS BIGINT)
        |    AS byte_len
        |FROM d ORDER BY doc_id""".stripMargin,

    "q203_tiff_headers" ->
      """SELECT doc_id, 'image/tiff' AS detected_mime,
        |  CASE WHEN doc_id % 9 = 4 THEN NULL
        |       ELSE CAST(doc_id % 900 + 100 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 9 = 4 THEN NULL
        |       ELSE CAST(doc_id % 500 + 50 AS INTEGER) END AS height,
        |  CAST(CASE WHEN doc_id % 9 = 4 THEN 8 ELSE 38 END AS BIGINT)
        |    AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // frame length = 144000·kbps // rate + padding; duration =
    // frames·1152·1000 // rate — the oracle never sees a byte
    "q192_mp3_duration" ->
      """WITH d AS (SELECT doc_id,
        |  doc_id % 4 + 2 AS n,
        |  CASE doc_id % 4 WHEN 0 THEN 128 WHEN 1 THEN 160
        |    WHEN 2 THEN 192 ELSE 224 END AS br,
        |  CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |    ELSE 32000 END AS sr,
        |  doc_id % 2 AS pad
        |  FROM documents),
        |f AS (SELECT doc_id, n, sr, (144000 * br) // sr + pad AS flen FROM d)
        |SELECT doc_id, 'audio/mpeg' AS detected_mime,
        |  CASE WHEN doc_id % 7 IN (1, 5) THEN NULL
        |       ELSE CAST(n AS INTEGER) END AS n_frames,
        |  CASE WHEN doc_id % 7 IN (1, 5) THEN NULL
        |       ELSE CAST((n * 1152000) // sr AS BIGINT) END AS duration_ms,
        |  CAST(CASE WHEN doc_id % 7 = 1 THEN 54
        |       WHEN doc_id % 7 = 5 THEN flen * n - 10
        |       WHEN doc_id % 7 = 3 THEN 30 + flen * n
        |       ELSE flen * n END AS BIGINT) AS byte_len
        |FROM f ORDER BY doc_id""".stripMargin,

    "q204_session_stats" ->
      """WITH e AS (SELECT user_id, event_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec FROM events),
        |l AS (SELECT user_id, event_id, sec,
        |  CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |       THEN 1 ELSE 0 END AS newi
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |s AS (SELECT user_id, sec,
        |  CAST(SUM(newi) OVER (PARTITION BY user_id ORDER BY sec, event_id)
        |    AS BIGINT) AS session_id
        |  FROM l),
        |sess AS (SELECT user_id, session_id, MIN(sec) AS start_sec,
        |  MAX(sec) AS end_sec, COUNT(*) AS n_events
        |  FROM s GROUP BY 1, 2),
        |b AS (SELECT CASE WHEN n_events = 1 THEN 'a_bounce'
        |    WHEN end_sec - start_sec < 300 THEN 'b_under_5min'
        |    WHEN end_sec - start_sec < 1800 THEN 'c_under_30min'
        |    ELSE 'd_longer' END AS bucket, n_events FROM sess),
        |t AS (SELECT count(*) AS nt FROM b)
        |SELECT bucket, count(*) AS n_sessions,
        |  floor(CAST(count(*) AS DOUBLE) / CAST(nt AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS share,
        |  floor(CAST(SUM(CAST(n_events AS DECIMAL(28,0))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000
        |    AS mean_events
        |FROM b CROSS JOIN t GROUP BY bucket, nt ORDER BY bucket""".stripMargin,

    // DuckDB's NATIVE ASOF join is the oracle — the union+carry
    // composition must reproduce it exactly (the q54 discipline)
    "q202_attribution" ->
      """WITH p AS (SELECT user_id, event_id AS pid,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS psec
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |  event_type AS channel,
        |  row_number() OVER (PARTITION BY user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type IN ('click', 'view')),
        |u AS (SELECT user_id, tsec, channel FROM t WHERE rn = 1),
        |j AS (SELECT p.pid, p.psec, u.tsec, u.channel
        |  FROM p ASOF LEFT JOIN u
        |    ON p.user_id = u.user_id AND p.psec >= u.tsec),
        |a AS (SELECT CASE WHEN tsec IS NOT NULL AND psec - tsec <= 259200
        |    THEN channel ELSE 'unattributed' END AS attr FROM j)
        |SELECT attr, count(*) AS n_conversions FROM a
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q197_priority_sample" ->
      """WITH w AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '#' ||
        |    CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity > 0),
        |p AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(h AS DOUBLE) / CAST(l_quantity AS DOUBLE) AS prio FROM w),
        |t AS (SELECT * FROM p ORDER BY prio, l_orderkey, l_linenumber
        |  LIMIT 15)
        |SELECT l_orderkey, l_linenumber, l_quantity,
        |  floor(prio * 1000000 + 0.5) / 1000000 AS priority
        |FROM t ORDER BY priority, l_orderkey, l_linenumber""".stripMargin,

    "q198_fd_audit" ->
      """WITH g1 AS (SELECT event_id, count(DISTINCT user_id) AS nd
        |  FROM events GROUP BY 1),
        |a1 AS (SELECT 'event_id->user_id' AS rule, count(*) AS n_groups,
        |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_violating,
        |  max(nd) AS max_distinct FROM g1),
        |g2 AS (SELECT user_id, count(DISTINCT event_type) AS nd
        |  FROM events GROUP BY 1),
        |a2 AS (SELECT 'user_id->event_type' AS rule, count(*) AS n_groups,
        |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_violating,
        |  max(nd) AS max_distinct FROM g2),
        |u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
        |SELECT rule, CAST(n_groups AS BIGINT) AS n_groups,
        |  CAST(n_violating AS BIGINT) AS n_violating,
        |  floor(CAST(n_violating AS DOUBLE) / CAST(n_groups AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS violation_share,
        |  CAST(max_distinct AS BIGINT) AS max_distinct,
        |  n_violating = 0 AS holds
        |FROM u ORDER BY rule""".stripMargin,

    // the brute-force NOT EXISTS dominance test the running-max skyline
    // plan must reproduce exactly
    "q196_pareto_frontier" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |m AS (SELECT doc_id, n_chars,
        |  (1000000 * len(list_distinct(w))) // len(w) AS q
        |  FROM t WHERE len(w) > 0)
        |SELECT a.doc_id, a.n_chars, a.q FROM m a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM m b
        |  WHERE b.n_chars <= a.n_chars AND b.q >= a.q
        |    AND (b.n_chars < a.n_chars OR b.q > a.q))
        |ORDER BY a.doc_id""".stripMargin,

    // the naive global running-max window the two-pass plan reproduces
    "q194_lateness_audit" ->
      """WITH e AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events WHERE ts IS NOT NULL),
        |a AS (SELECT event_id, sec, sec + CASE
        |    WHEN event_id % 1000 = 13 THEN 7200
        |    WHEN event_id % 100 = 7 THEN 900
        |    WHEN event_id % 10 = 0 THEN 90 ELSE 0 END AS arr FROM e),
        |m AS (SELECT max(sec) OVER (ORDER BY arr, event_id
        |    ROWS UNBOUNDED PRECEDING) - sec AS late FROM a),
        |b AS (SELECT CASE WHEN late = 0 THEN 'a_on_time'
        |    WHEN late <= 60 THEN 'b_1min'
        |    WHEN late <= 600 THEN 'c_10min'
        |    WHEN late <= 3600 THEN 'd_1hour'
        |    ELSE 'e_later' END AS bucket FROM m),
        |t AS (SELECT count(*) AS nt FROM b)
        |SELECT bucket, count(*) AS n,
        |  floor(CAST(count(*) AS DOUBLE) / CAST(nt AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS share
        |FROM b CROSS JOIN t GROUP BY bucket, nt ORDER BY bucket""".stripMargin,

    "q122_global_sequence" ->
      """SELECT doc_id, n_chars,
        |  row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS global_pos
        |FROM documents ORDER BY global_pos""".stripMargin,

    "q123_gap_fill" ->
      """WITH e AS (SELECT event_type,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 AS BIGINT)
        |    AS bucket_start, value
        |  FROM events),
        |actual AS (SELECT event_type, bucket_start, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS sum_val
        |  FROM e GROUP BY 1, 2),
        |spans AS (SELECT event_type, min(bucket_start) AS lo,
        |  max(bucket_start) AS hi FROM actual GROUP BY 1),
        |grid AS (SELECT event_type,
        |  CAST(unnest(range(lo, hi + 900, 900)) AS BIGINT) AS bucket_start
        |  FROM spans)
        |SELECT g.event_type, g.bucket_start,
        |  COALESCE(a.n, 0) AS n,
        |  floor(COALESCE(a.sum_val, 0.0) * 1000000 + 0.5) / 1000000 AS sum_val
        |FROM grid g LEFT JOIN actual a
        |  ON g.event_type = a.event_type AND g.bucket_start = a.bucket_start
        |ORDER BY g.event_type, g.bucket_start""".stripMargin,

    "q124_distribution_drift" ->
      """WITH a AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey % 2 = 0 AND l_extendedprice IS NOT NULL),
        |b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_orderkey % 2 = 1 AND l_extendedprice IS NOT NULL),
        |ca AS (SELECT CAST(least(greatest(
        |    floor((v - 0.0) / 80000.0 * 20), 0), 19) AS BIGINT) AS bin,
        |  COUNT(*) AS cnt_a FROM a GROUP BY 1),
        |cb AS (SELECT CAST(least(greatest(
        |    floor((v - 0.0) / 80000.0 * 20), 0), 19) AS BIGINT) AS bin,
        |  COUNT(*) AS cnt_b FROM b GROUP BY 1),
        |tot AS (SELECT (SELECT COUNT(*) FROM a) AS n_a,
        |               (SELECT COUNT(*) FROM b) AS n_b),
        |j AS (SELECT COALESCE(ca.bin, cb.bin) AS bin,
        |  COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
        |  FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin),
        |rates AS (SELECT bin, cnt_a, cnt_b,
        |  CAST(cnt_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p,
        |  CAST(cnt_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS q
        |  FROM j CROSS JOIN tot)
        |SELECT bin, cnt_a, cnt_b,
        |  CAST(floor(CASE WHEN cnt_a + cnt_b = 0 THEN 0.0
        |    ELSE (p - q) * (p - q) / (p + q) END * 1e12 + 0.5) AS BIGINT)
        |    AS drift12
        |FROM rates ORDER BY bin""".stripMargin,

    "q125_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec FROM events),
        |l AS (SELECT user_id, event_id, sec,
        |  CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |       THEN 1 ELSE 0 END AS newi
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |s AS (SELECT user_id, sec,
        |  CAST(SUM(newi) OVER (PARTITION BY user_id ORDER BY sec, event_id)
        |    AS BIGINT) AS session_id
        |  FROM l)
        |SELECT user_id, session_id, MIN(sec) AS start_sec,
        |  MAX(sec) AS end_sec, COUNT(*) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    "q126_pagerank" ->
      """WITH ed AS (SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT a AS src, b AS dst FROM ed
        |      UNION ALL SELECT b, a FROM ed),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM nodes),
        |od AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM e GROUP BY 1),
        |p0 AS (SELECT node, 1.0 / nd AS pr FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS node,
        |  SUM(CAST(floor(p.pr / od.deg * 1e12 + 0.5) AS BIGINT)) AS s
        |  FROM e JOIN p0 p ON e.src = p.node JOIN od ON od.src = e.src GROUP BY 1),
        |p1 AS (SELECT nodes.node,
        |  (1.0 - 0.85) / nd + 0.85 * (CAST(COALESCE(c1.s, 0) AS DOUBLE) / 1e12) AS pr
        |  FROM nodes LEFT JOIN c1 ON nodes.node = c1.node CROSS JOIN nn),
        |c2 AS (SELECT e.dst AS node,
        |  SUM(CAST(floor(p.pr / od.deg * 1e12 + 0.5) AS BIGINT)) AS s
        |  FROM e JOIN p1 p ON e.src = p.node JOIN od ON od.src = e.src GROUP BY 1),
        |p2 AS (SELECT nodes.node,
        |  (1.0 - 0.85) / nd + 0.85 * (CAST(COALESCE(c2.s, 0) AS DOUBLE) / 1e12) AS pr
        |  FROM nodes LEFT JOIN c2 ON nodes.node = c2.node CROSS JOIN nn),
        |c3 AS (SELECT e.dst AS node,
        |  SUM(CAST(floor(p.pr / od.deg * 1e12 + 0.5) AS BIGINT)) AS s
        |  FROM e JOIN p2 p ON e.src = p.node JOIN od ON od.src = e.src GROUP BY 1),
        |p3 AS (SELECT nodes.node,
        |  (1.0 - 0.85) / nd + 0.85 * (CAST(COALESCE(c3.s, 0) AS DOUBLE) / 1e12) AS pr
        |  FROM nodes LEFT JOIN c3 ON nodes.node = c3.node CROSS JOIN nn)
        |SELECT node, floor(pr * 1e9 + 0.5) / 1e9 AS pagerank
        |FROM p3 ORDER BY p3.pr DESC, node LIMIT 25""".stripMargin,

    // 2 unnormalized HITS steps unrolled: a1 = in-degree (h0 = 1), each
    // later half-step one join + integer sum — zero floats anywhere
    "q176_hits" ->
      """WITH ed AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |a1 AS (SELECT dst, CAST(count(*) AS BIGINT) AS a FROM ed GROUP BY 1),
        |h1 AS (SELECT src, CAST(sum(a) AS BIGINT) AS h
        |  FROM ed JOIN a1 USING (dst) GROUP BY 1),
        |a2 AS (SELECT dst, CAST(sum(h) AS BIGINT) AS a
        |  FROM ed JOIN h1 USING (src) GROUP BY 1),
        |h2 AS (SELECT src, CAST(sum(a) AS BIGINT) AS h
        |  FROM ed JOIN a2 USING (dst) GROUP BY 1),
        |u AS (SELECT 'authority' AS role, dst AS node, a AS score FROM a2
        |      UNION ALL SELECT 'hub', src, h FROM h2),
        |sel AS (SELECT role, node, score, row_number() OVER (
        |  PARTITION BY role ORDER BY score DESC, node) AS rn FROM u)
        |SELECT role, node, score FROM sel WHERE rn <= 15
        |ORDER BY role, score DESC, node""".stripMargin,

    "q127_triangles" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |ed AS (SELECT x.p AS a, y.p AS b
        |  FROM items x JOIN items y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM ed e1 JOIN ed e2 ON e1.b = e2.a
        |  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tn AS (SELECT unnest([x, y, z]) AS node FROM tri)
        |SELECT node, COUNT(*) AS n_triangles FROM tn GROUP BY 1
        |ORDER BY n_triangles DESC, node LIMIT 25""".stripMargin,

    "q195_association_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |pairs AS (SELECT x.p AS src, y.p AS dst, count(*) AS support
        |  FROM items x JOIN items y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |supp AS (SELECT p, count(*) AS s_item FROM items GROUP BY 1),
        |tot AS (SELECT count(DISTINCT o) AS nn FROM items),
        |both_ AS (SELECT src AS ant, dst AS cons, support FROM pairs
        |  UNION ALL SELECT dst, src, support FROM pairs)
        |SELECT ant, cons, support AS s_pair,
        |  a.s_item AS s_ant, c.s_item AS s_cons,
        |  floor(CAST(support AS DOUBLE) / CAST(a.s_item AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS confidence,
        |  floor(CAST(nn AS DOUBLE) * CAST(support AS DOUBLE) /
        |    (CAST(a.s_item AS DOUBLE) * CAST(c.s_item AS DOUBLE))
        |    * 1000000 + 0.5) / 1000000 AS lift
        |FROM both_ JOIN supp a ON a.p = ant JOIN supp c ON c.p = cons
        |CROSS JOIN tot
        |ORDER BY lift DESC, ant, cons LIMIT 25""".stripMargin,

    "q140_kcore" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |e0 AS (SELECT x.p AS a, y.p AS b
        |  FROM items x JOIN items y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |d1 AS (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
        |k1 AS (SELECT node FROM d1 WHERE deg >= 3),
        |e1 AS (SELECT a, b FROM e0 WHERE a IN (SELECT node FROM k1)
        |  AND b IN (SELECT node FROM k1)),
        |d2 AS (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1) GROUP BY 1),
        |k2 AS (SELECT node FROM d2 WHERE deg >= 3),
        |e2 AS (SELECT a, b FROM e1 WHERE a IN (SELECT node FROM k2)
        |  AND b IN (SELECT node FROM k2)),
        |d3 AS (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2) GROUP BY 1),
        |k3 AS (SELECT node FROM d3 WHERE deg >= 3),
        |e3 AS (SELECT a, b FROM e2 WHERE a IN (SELECT node FROM k3)
        |  AND b IN (SELECT node FROM k3))
        |SELECT node, COUNT(*) AS deg FROM
        |  (SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3)
        |GROUP BY 1 ORDER BY node""".stripMargin,

    "q130_robust_scale" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
        |  FROM events GROUP BY 1),
        |mad AS (SELECT e.event_type, quantile_cont(abs(e.value - m.m), 0.5) AS d
        |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
        |SELECT event_id, e.event_type,
        |  CASE WHEN d.d = 0 OR e.value IS NULL THEN NULL
        |       ELSE floor((CAST(e.value AS DOUBLE) - m.m) / d.d * 1000000 + 0.5)
        |            / 1000000 END AS robust_z
        |FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q131_quality_deciles" ->
      """SELECT doc_id, source, n_chars,
        |  CAST(ntile(10) OVER (PARTITION BY source
        |    ORDER BY n_chars, doc_id) AS BIGINT) AS decile
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q136_weighted_median" ->
      """WITH b AS (SELECT l_returnflag AS k,
        |  CAST(l_extendedprice AS DOUBLE) AS v,
        |  CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        |c AS (SELECT k, v,
        |  SUM(w) OVER (PARTITION BY k ORDER BY v) AS cumw,
        |  SUM(w) OVER (PARTITION BY k) AS totw FROM b)
        |SELECT k AS l_returnflag,
        |  MIN(CASE WHEN cumw * 2 >= totw THEN v END) AS weighted_median
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q135_neyman_sample" ->
      """WITH v AS (SELECT event_id, event_type, value,
        |  CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vm
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |st AS (SELECT event_type, COUNT(*) AS n,
        |  SUM(CAST(vm AS HUGEINT)) AS s1,
        |  SUM(CAST(vm AS HUGEINT) * CAST(vm AS HUGEINT)) AS s2
        |  FROM v GROUP BY 1),
        |w AS (SELECT event_type, n,
        |  CAST(floor(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) * 1000 + 0.5)
        |    AS BIGINT) AS w3
        |  FROM st),
        |tw AS (SELECT CAST(SUM(w3) AS BIGINT) AS tot FROM w),
        |r AS (SELECT event_type,
        |  least(2000.0 * (CAST(w3 AS DOUBLE) / CAST(tot AS DOUBLE))
        |    / CAST(n AS DOUBLE), 1.0) AS rate
        |  FROM w CROSS JOIN tw)
        |SELECT e.event_id, e.event_type, e.value
        |FROM v e JOIN r ON e.event_type = r.event_type
        |WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |  < floor(rate * 4294967296.0 + 0.5)
        |ORDER BY event_id""".stripMargin,

    "q134_group_quantiles" ->
      """WITH v AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL),
        |b AS (SELECT event_type, CAST(least(greatest(
        |  floor((v - 0.0) / 500.0 * 25), 0), 24) AS BIGINT) AS bin FROM v),
        |counts AS (SELECT event_type, bin, COUNT(*) AS bn FROM b GROUP BY 1, 2),
        |cum AS (SELECT event_type, bin, bn,
        |  SUM(bn) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |  SUM(bn) OVER (PARTITION BY event_type ORDER BY bin) - bn AS cum_prev,
        |  SUM(bn) OVER (PARTITION BY event_type) AS n_total FROM counts),
        |qs AS (SELECT unnest([0.5, 0.9]) AS q),
        |picked AS (SELECT event_type, q, min(bin) AS bin
        |  FROM cum CROSS JOIN qs
        |  WHERE CAST(cum AS DOUBLE) >= q * CAST(n_total AS DOUBLE)
        |  GROUP BY 1, 2)
        |SELECT p.event_type, p.q AS q, p.bin AS bin,
        |  floor((0.0 + ((500.0 - 0.0) / 25) * (CAST(p.bin AS DOUBLE) +
        |    least(greatest((p.q * CAST(c.n_total AS DOUBLE)
        |                    - CAST(c.cum_prev AS DOUBLE))
        |                   / CAST(c.bn AS DOUBLE), 0.0), 1.0)))
        |    * 1000000 + 0.5) / 1000000 AS quantile_est
        |FROM picked p JOIN cum c ON p.event_type = c.event_type AND p.bin = c.bin
        |ORDER BY p.event_type, q""".stripMargin,

    "q133_drift_trend" ->
      """WITH e AS (SELECT
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) * 86400 AS BIGINT)
        |    AS bucket_start,
        |  CAST(least(greatest(
        |    floor((CAST(value AS DOUBLE) - 0.0) / 500.0 * 20), 0), 19) AS BIGINT)
        |    AS bin
        |  FROM events WHERE value IS NOT NULL),
        |counts AS (SELECT bucket_start, bin, COUNT(*) AS cnt
        |  FROM e GROUP BY 1, 2),
        |totals AS (SELECT bucket_start, CAST(SUM(cnt) AS BIGINT) AS n
        |  FROM counts GROUP BY 1),
        |pt AS (SELECT c.bucket_start, c.n AS n_cur, p.n AS n_prev
        |  FROM totals c JOIN totals p ON c.bucket_start = p.bucket_start + 86400),
        |fo AS (SELECT COALESCE(c.bucket_start, p.bucket_start + 86400)
        |    AS bucket_start,
        |  COALESCE(c.bin, p.bin) AS bin,
        |  COALESCE(c.cnt, 0) AS cnt_cur, COALESCE(p.cnt, 0) AS cnt_prev
        |  FROM counts c FULL OUTER JOIN counts p
        |    ON c.bucket_start = p.bucket_start + 86400 AND c.bin = p.bin),
        |terms AS (SELECT fo.bucket_start, pt.n_prev, pt.n_cur,
        |  CAST(floor(CASE WHEN cnt_prev + cnt_cur = 0 THEN 0.0
        |    ELSE (CAST(cnt_prev AS DOUBLE) / CAST(pt.n_prev AS DOUBLE) -
        |          CAST(cnt_cur AS DOUBLE) / CAST(pt.n_cur AS DOUBLE)) *
        |         (CAST(cnt_prev AS DOUBLE) / CAST(pt.n_prev AS DOUBLE) -
        |          CAST(cnt_cur AS DOUBLE) / CAST(pt.n_cur AS DOUBLE)) /
        |         (CAST(cnt_prev AS DOUBLE) / CAST(pt.n_prev AS DOUBLE) +
        |          CAST(cnt_cur AS DOUBLE) / CAST(pt.n_cur AS DOUBLE))
        |    END * 1e12 + 0.5) AS BIGINT) AS t12
        |  FROM fo JOIN pt ON fo.bucket_start = pt.bucket_start)
        |SELECT bucket_start, n_prev, n_cur, CAST(SUM(t12) AS BIGINT) AS drift12
        |FROM terms GROUP BY 1, 2, 3 ORDER BY bucket_start""".stripMargin,

    "q132_topk_per_group" ->
      """WITH r AS (SELECT l_returnflag,
        |  CAST(l_extendedprice AS DOUBLE) AS price, l_orderkey,
        |  row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY CAST(l_extendedprice AS DOUBLE) DESC, l_orderkey) AS rk
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(rk AS BIGINT) AS rank, price, l_orderkey
        |FROM r WHERE rk <= 5 ORDER BY l_returnflag, rank""".stripMargin,

    "q138_bitmap_distinct" ->
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q119_exact_n_sample" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars
        |  FROM documents
        |  ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
        |  LIMIT 40)
        |ORDER BY doc_id""".stripMargin,

    "q118_binned_quantiles" ->
      """WITH v AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        |  WHERE l_quantity IS NOT NULL),
        |b AS (SELECT CAST(least(greatest(
        |  floor((v - 0.0) / 50.0 * 25), 0), 24) AS BIGINT) AS bin FROM v),
        |counts AS (SELECT bin, COUNT(*) AS bn FROM b GROUP BY 1),
        |cum AS (SELECT bin, bn,
        |  SUM(bn) OVER (ORDER BY bin) AS cum,
        |  SUM(bn) OVER (ORDER BY bin) - bn AS cum_prev FROM counts),
        |tot AS (SELECT SUM(bn) AS n_total FROM counts),
        |qs AS (SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS q),
        |picked AS (SELECT q, min(bin) AS bin
        |  FROM cum CROSS JOIN tot CROSS JOIN qs
        |  WHERE CAST(cum AS DOUBLE) >= q * CAST(n_total AS DOUBLE)
        |  GROUP BY q)
        |SELECT p.q AS q, p.bin AS bin,
        |  floor((0.0 + ((50.0 - 0.0) / 25) * (CAST(p.bin AS DOUBLE) +
        |    least(greatest((p.q * CAST(t.n_total AS DOUBLE)
        |                    - CAST(c.cum_prev AS DOUBLE))
        |                   / CAST(c.bn AS DOUBLE), 0.0), 1.0)))
        |    * 1000000 + 0.5) / 1000000 AS quantile_est
        |FROM picked p JOIN cum c ON p.bin = c.bin CROSS JOIN tot t
        |ORDER BY q""".stripMargin,

    "q145_data_quality" ->
      """WITH agg AS (SELECT COUNT(*) AS n,
        |  SUM(CASE WHEN COALESCE(l_quantity BETWEEN 1 AND 50, FALSE)
        |      THEN 0 ELSE 1 END) AS v_qty,
        |  SUM(CASE WHEN COALESCE(l_extendedprice > 0, FALSE)
        |      THEN 0 ELSE 1 END) AS v_price,
        |  SUM(CASE WHEN COALESCE(l_discount <= 0.10, FALSE)
        |      THEN 0 ELSE 1 END) AS v_disc,
        |  SUM(CASE WHEN COALESCE(l_quantity <= 30, FALSE)
        |      THEN 0 ELSE 1 END) AS v_qty30,
        |  SUM(CASE WHEN COALESCE(l_returnflag IN ('A','N','R'), FALSE)
        |      THEN 0 ELSE 1 END) AS v_rf
        |  FROM lineitem),
        |fk AS (SELECT COUNT(*) AS v FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_orderkey = l.l_orderkey)
        |     OR l.l_orderkey IS NULL),
        |rep AS (
        |  SELECT 'qty_in_1_50' AS rule, n AS n_rows, v_qty AS n_violations FROM agg
        |  UNION ALL SELECT 'price_positive', n, v_price FROM agg
        |  UNION ALL SELECT 'discount_at_most_10pct', n, v_disc FROM agg
        |  UNION ALL SELECT 'qty_at_most_30', n, v_qty30 FROM agg
        |  UNION ALL SELECT 'returnflag_known', n, v_rf FROM agg
        |  UNION ALL SELECT 'orderkey_references_orders', agg.n, fk.v
        |    FROM agg, fk)
        |SELECT rule, n_rows, CAST(n_violations AS BIGINT) AS n_violations,
        |  n_violations = 0 AS pass
        |FROM rep ORDER BY rule""".stripMargin,

    "q144_join_cardinality" ->
      """WITH c AS (SELECT l_partkey, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT a.l_partkey, a.n AS n_left, b.n AS n_right,
        |  CAST(a.n * b.n AS BIGINT) AS out_rows
        |FROM c a JOIN c b ON a.l_partkey = b.l_partkey
        |ORDER BY out_rows DESC, a.l_partkey ASC LIMIT 15""".stripMargin,

    "q117_key_profile" ->
      """WITH counts AS (SELECT l_orderkey, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM counts)
        |SELECT l_orderkey, n,
        |  floor(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) * 1000000
        |        * 1000000 + 0.5) / 1000000 AS share_ppm,
        |  floor(CAST(n AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |        / CAST(total AS DOUBLE) * 1000000 + 0.5) / 1000000 AS skew_factor
        |FROM counts CROSS JOIN tot
        |ORDER BY n DESC, l_orderkey ASC LIMIT 25""".stripMargin,

    "q113_image_pixels" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 6 = 5 THEN NULL
        |       ELSE CAST((doc_id * 3) % 256 AS DOUBLE) END AS mean_b,
        |  CASE WHEN doc_id % 6 = 5 THEN NULL
        |       ELSE CAST((doc_id * 5) % 256 AS DOUBLE) END AS mean_g,
        |  CASE WHEN doc_id % 6 = 5 THEN NULL
        |       ELSE CAST((doc_id * 7) % 256 AS DOUBLE) END AS mean_r,
        |  CASE WHEN doc_id % 6 = 5 THEN NULL
        |       ELSE CAST((doc_id * 3) % 256 + (doc_id * 5) % 256
        |                 + (doc_id * 7) % 256 AS DOUBLE) / 3.0
        |  END AS mean_luma,
        |  CASE WHEN doc_id % 6 = 5 THEN NULL
        |       ELSE CAST(1 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 6 = 5 THEN NULL
        |       ELSE CAST(1 AS INTEGER) END AS height,
        |  CAST(CASE WHEN doc_id % 6 = 5 THEN 0 ELSE 58 END AS BIGINT) AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin,


    // the census is fully predictable from the class layout: BMP rows
    // pixel-decode, WAV rows sample-decode, header-only PNGs have dims
    // but no pixels, the stub class has (fake) dims, NULL payloads
    // nothing
    "q185_media_census" ->
      """WITH c AS (SELECT doc_id % 6 AS k, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1)
        |SELECT CASE k WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
        |  WHEN 2 THEN 'image/png' WHEN 3 THEN 'application/octet-stream'
        |  WHEN 5 THEN 'image/jpeg'
        |  END AS sniffed_mime,
        |  n,
        |  CASE WHEN k IN (0, 2, 3, 5) THEN n ELSE 0 END AS n_with_dims,
        |  CASE WHEN k IN (0, 5) THEN n ELSE 0 END AS n_pixel_decodable,
        |  CASE WHEN k = 1 THEN n ELSE 0 END AS n_sample_decodable
        |FROM c ORDER BY sniffed_mime""".stripMargin,


    // grayscale palette: every channel mean equals the mean pixel
    // index; the engine must reach it through real LZW decompression
    "q184_gif_pixels" ->
      """WITH px AS (SELECT doc_id,
        |  (doc_id * 3) % 256 AS p1, ((doc_id * 3) + 10) % 256 AS p2,
        |  ((doc_id * 3) + 7) % 256 AS p3, ((doc_id * 3) + 17) % 256 AS p4
        |  FROM documents),
        |m AS (SELECT doc_id, doc_id % 6 IN (1, 5) AS bad,
        |  CAST(p1 + p2 + p3 + p4 AS DOUBLE) / 4.0 AS mean_px
        |  FROM px)
        |SELECT doc_id,
        |  CASE WHEN bad THEN NULL ELSE mean_px END AS mean_b,
        |  CASE WHEN bad THEN NULL ELSE mean_px END AS mean_g,
        |  CASE WHEN bad THEN NULL ELSE mean_px END AS mean_r,
        |  CASE WHEN bad THEN NULL ELSE mean_px END AS mean_luma,
        |  CASE WHEN bad THEN NULL ELSE CAST(2 AS INTEGER) END AS width,
        |  CASE WHEN bad THEN NULL ELSE CAST(2 AS INTEGER) END AS height
        |FROM m ORDER BY doc_id""".stripMargin,


    // the oracle predicts peak/RMS/zero-crossings from the sample
    // formulas directly; the engine must reach them through the real
    // RIFF walk + two's-complement decode. Format-3 (float) and
    // truncated classes must yield NULLs
    "q183_audio_samples" ->
      """WITH s AS (SELECT doc_id, i,
        |  ((doc_id * 11 + i * 17) % 2048) - 1024 AS v
        |  FROM documents, range(0, 8) t(i)),
        |lg AS (SELECT doc_id, i, v,
        |  lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM s),
        |st AS (SELECT doc_id,
        |  CAST(max(abs(v)) AS INTEGER) AS peak,
        |  CAST(sum(v * v) AS BIGINT) AS ss,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND (pv < 0) != (v < 0)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS zc
        |  FROM lg GROUP BY 1),
        |m AS (SELECT doc_id, doc_id % 6 IN (2, 5) AS bad, peak, zc,
        |  floor(sqrt(CAST(ss AS DOUBLE) / 8.0) * 1000000 + 0.5) / 1000000 AS rms
        |  FROM st)
        |SELECT doc_id,
        |  CASE WHEN bad THEN NULL ELSE CAST(8 AS BIGINT) END AS n_samples,
        |  CASE WHEN bad THEN NULL ELSE CAST(8000 AS INTEGER) END AS sample_rate,
        |  CASE WHEN bad THEN NULL ELSE peak END AS peak,
        |  CASE WHEN bad THEN NULL ELSE rms END AS rms,
        |  CASE WHEN bad THEN NULL ELSE zc END AS zero_crossings
        |FROM m ORDER BY doc_id""".stripMargin,


    // the oracle predicts the decoded pixels from the same doc_id
    // arithmetic the fixture used — the engine must arrive at them
    // through the REAL inflate + Adler verify + Up-unfilter path.
    // Row classes % 6 == 3 (zeroed Adler) and == 5 (truncated) must
    // decode to NOTHING: checksum and structure rejection
    "q182_png_pixels" ->
      """WITH px AS (SELECT doc_id,
        |  (doc_id * 3) % 256 AS r00, ((doc_id * 3) + 10) % 256 AS r10,
        |  ((doc_id * 3) + 7) % 256 AS r01, ((doc_id * 3) + 17) % 256 AS r11,
        |  (doc_id * 5) % 256 AS g00, ((doc_id * 5) + 4) % 256 AS g10,
        |  ((doc_id * 5) + 1) % 256 AS g01, ((doc_id * 5) + 5) % 256 AS g11,
        |  (doc_id * 7) % 256 AS b00, ((doc_id * 7) + 1) % 256 AS b10,
        |  ((doc_id * 7) + 2) % 256 AS b01, ((doc_id * 7) + 3) % 256 AS b11
        |  FROM documents),
        |m AS (SELECT doc_id, doc_id % 6 IN (3, 5) AS bad,
        |  CAST(b00 + b10 + b01 + b11 AS DOUBLE) / 4.0 AS mb,
        |  CAST(g00 + g10 + g01 + g11 AS DOUBLE) / 4.0 AS mg,
        |  CAST(r00 + r10 + r01 + r11 AS DOUBLE) / 4.0 AS mr,
        |  CAST(r00 + r10 + r01 + r11 + g00 + g10 + g01 + g11
        |     + b00 + b10 + b01 + b11 AS DOUBLE) / 12.0 AS ml
        |  FROM px)
        |SELECT doc_id,
        |  CASE WHEN bad THEN NULL ELSE mb END AS mean_b,
        |  CASE WHEN bad THEN NULL ELSE mg END AS mean_g,
        |  CASE WHEN bad THEN NULL ELSE mr END AS mean_r,
        |  CASE WHEN bad THEN NULL ELSE ml END AS mean_luma,
        |  CASE WHEN bad THEN NULL ELSE CAST(2 AS INTEGER) END AS width,
        |  CASE WHEN bad THEN NULL ELSE CAST(2 AS INTEGER) END AS height
        |FROM m ORDER BY doc_id""".stripMargin,


    // the survivor set re-derived as arithmetic (truncation d%7=0;
    // robots block d%3=0 paths except robots-less d%5=0 domains —
    // (d%20)%5 == d%5), then the q266 LM formulation over it: the
    // engine must reach the same rollup through the real WARC walk,
    // HTTP split, URL parse, robots evaluation, and model scoring
    "q272_crawl_pipeline" ->
      """WITH surv AS (SELECT doc_id, text, lang FROM documents
        |  WHERE doc_id % 7 <> 0 AND (doc_id % 3 <> 0 OR doc_id % 5 = 0)),
        |toks AS (SELECT doc_id, lang,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM surv),
        |trp AS (SELECT
        |  unnest([w[i] FOR i IN range(1, len(w))]) AS w1,
        |  unnest([w[i + 1] FOR i IN range(1, len(w))]) AS w2
        |  FROM toks WHERE doc_id % 3 = 1 AND len(w) >= 2),
        |bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        |  FROM trp GROUP BY 1, 2),
        |pre AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bg GROUP BY 1),
        |voc AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM
        |  (SELECT unnest(w) AS t FROM toks WHERE doc_id % 3 = 1)
        |  WHERE t <> ''),
        |dp AS (SELECT doc_id,
        |  unnest([w[i] FOR i IN range(1, len(w))]) AS w1,
        |  unnest([w[i + 1] FOR i IN range(1, len(w))]) AS w2
        |  FROM toks WHERE len(w) >= 2),
        |j AS (SELECT doc_id, COALESCE(bg.c12, 0) AS c12,
        |  COALESCE(pre.c1, 0) AS c1
        |  FROM dp LEFT JOIN bg USING (w1, w2) LEFT JOIN pre USING (w1)),
        |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN c12 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oov,
        |  CAST(SUM((1000000 * (c12 + 1)) // (c1 + (SELECT v FROM voc)))
        |    AS BIGINT) AS fluency
        |  FROM j GROUP BY 1),
        |per AS (SELECT s.doc_id, s.lang, COALESCE(n_pairs, 0) AS np,
        |  COALESCE(oov, 0) AS ov, COALESCE(fluency, 0) AS fl
        |  FROM surv s LEFT JOIN sc USING (doc_id))
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(np) AS BIGINT) AS sum_pairs,
        |  CAST(SUM(ov) AS BIGINT) AS sum_oov,
        |  CAST(SUM(fl) AS BIGINT) AS sum_fluency
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,


    // the final text's md5 predicted per class: clean/multibyte/BOM keep
    // the base text (+é for 1/2/3 after fallback or repair), the invalid
    // class appends chr(255)chr(254) under the Latin-1 fallback
    "q271_encoding_repair" ->
      """WITH u AS (SELECT doc_id, text, CAST(doc_id % 6 AS INTEGER) AS cls
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN cls IN (2, 5) THEN 'latin-1' ELSE 'utf-8' END AS encoding,
        |  cls = 4 AS bom,
        |  cls = 3 AS repaired,
        |  CAST(CASE WHEN cls IN (0, 4) THEN length(text)
        |       WHEN cls = 5 THEN length(text) + 2
        |       ELSE length(text) + 1 END AS BIGINT) AS n_chars,
        |  CASE WHEN cls IN (0, 4) THEN md5(text)
        |       WHEN cls = 5 THEN md5(text || chr(255) || chr(254))
        |       ELSE md5(text || chr(233)) END AS text_md5
        |FROM u ORDER BY doc_id""".stripMargin,


    // every verdict and matched rule predicted from the same domain/
    // class arithmetic the fixture used; robots-less domains (dm%5=0)
    // allow everything with NULL rules
    "q270_robots_admission" ->
      """WITH u AS (SELECT doc_id, doc_id % 20 AS dm,
        |    CAST(doc_id % 6 AS INTEGER) AS cls FROM documents)
        |SELECT doc_id, 'd' || CAST(dm AS VARCHAR) AS domain,
        |  CASE cls
        |    WHEN 0 THEN '/blk' || CAST(dm % 3 AS VARCHAR) || '/page' || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN '/blk' || CAST(dm % 3 AS VARCHAR) || '/open/page' || CAST(doc_id AS VARCHAR)
        |    WHEN 2 THEN '/pub/page' || CAST(doc_id AS VARCHAR)
        |    WHEN 3 THEN '/x/file' || CAST(doc_id AS VARCHAR) || '.tmp'
        |    WHEN 4 THEN '/x/file' || CAST(doc_id AS VARCHAR) || '.tmp?x=1'
        |    ELSE '/blk' || CAST((dm + 1) % 3 AS VARCHAR) || '/p' END AS path,
        |  CASE WHEN dm % 5 = 0 THEN TRUE
        |       WHEN cls = 0 THEN FALSE
        |       WHEN cls = 3 THEN dm % 4 <> 0
        |       ELSE TRUE END AS allowed,
        |  CASE WHEN dm % 5 = 0 THEN NULL
        |       WHEN cls = 0 THEN '/blk' || CAST(dm % 3 AS VARCHAR) || '/'
        |       WHEN cls = 1 THEN '/blk' || CAST(dm % 3 AS VARCHAR) || '/open'
        |       WHEN cls = 3 AND dm % 4 = 0 THEN '/*.tmp$'
        |       ELSE NULL END AS matched_rule
        |FROM u ORDER BY doc_id""".stripMargin,


    // the record ledger re-derived as arithmetic: warcinfo/response/
    // request sizes per index, the 45-byte HTTP prefix subtracted for
    // body lengths, refusal classes all-zero
    "q267_warc_ingest" ->
      """WITH base AS (SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls,
        |    2 + CAST(doc_id % 3 AS INTEGER) AS n FROM documents),
        |r AS (SELECT b.doc_id,
        |    CASE WHEN t.i = 0 THEN 'warcinfo'
        |         WHEN t.i % 2 = 1 THEN 'response' ELSE 'request' END AS typ,
        |    CASE WHEN t.i = 0 THEN 10 + b.doc_id % 20
        |         WHEN t.i % 2 = 1 THEN 45 + 5 + (b.doc_id + 3 * t.i) % 40
        |         ELSE 4 + (b.doc_id + 2 * t.i) % 9 END AS clen,
        |    CASE WHEN t.i % 2 = 1 THEN 5 + (b.doc_id + 3 * t.i) % 40
        |         ELSE 0 END AS blen
        |  FROM base b, range(0, 4) t(i)
        |  WHERE b.cls IN (0, 1) AND t.i < b.n),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_records,
        |    CAST(SUM(CASE WHEN typ = 'response' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_response,
        |    CAST(SUM(clen) AS BIGINT) AS sum_content,
        |    CAST(SUM(blen) AS BIGINT) AS sum_body
        |  FROM r GROUP BY 1)
        |SELECT b.doc_id, COALESCE(n_records, 0) AS n_records,
        |  COALESCE(n_response, 0) AS n_response,
        |  COALESCE(sum_content, 0) AS sum_content,
        |  COALESCE(sum_body, 0) AS sum_body
        |FROM base b LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,


    // channel means re-derived by enumerating every pixel cell as
    // doc_id arithmetic (gray classes put the same value on all three
    // channels; class 1 applies the WhiteIsZero inversion)
    "q264_tiff_pixels" ->
      """WITH base AS (SELECT doc_id, CAST(doc_id % 6 AS INTEGER) AS cls
        |  FROM documents),
        |dims AS (SELECT * FROM (VALUES (0, 5, 3), (1, 6, 4), (2, 4, 2),
        |  (3, 4, 4)) d(cls, w, h)),
        |cells AS (SELECT b.doc_id, b.cls, d.w, d.h, xs.i AS x, ys.i AS y
        |  FROM base b JOIN dims d ON b.cls = d.cls,
        |       range(0, 6) xs(i), range(0, 4) ys(i)
        |  WHERE xs.i < d.w AND ys.i < d.h),
        |px AS (SELECT doc_id, cls, w, h,
        |  CASE cls WHEN 0 THEN (doc_id*7 + x + 2*y) % 256
        |           WHEN 1 THEN 255 - ((doc_id*3 + y) % 256)
        |           ELSE (doc_id + x + y) % 256 END AS bch,
        |  CASE cls WHEN 0 THEN (doc_id*7 + x + 2*y) % 256
        |           WHEN 1 THEN 255 - ((doc_id*3 + y) % 256)
        |           ELSE (doc_id*11 + y) % 256 END AS gch,
        |  CASE cls WHEN 0 THEN (doc_id*7 + x + 2*y) % 256
        |           WHEN 1 THEN 255 - ((doc_id*3 + y) % 256)
        |           ELSE (doc_id*5 + x) % 256 END AS rch
        |  FROM cells),
        |agg AS (SELECT doc_id, w, h,
        |  CAST(SUM(bch) AS DOUBLE) / (w*h) AS mb,
        |  CAST(SUM(gch) AS DOUBLE) / (w*h) AS mg,
        |  CAST(SUM(rch) AS DOUBLE) / (w*h) AS mr,
        |  CAST(SUM(bch) + SUM(gch) + SUM(rch) AS DOUBLE) / (3*w*h) AS ml
        |  FROM px GROUP BY doc_id, w, h)
        |SELECT b.doc_id, a.mb AS mean_b, a.mg AS mean_g, a.mr AS mean_r,
        |  a.ml AS mean_luma, CAST(a.w AS INTEGER) AS width,
        |  CAST(a.h AS INTEGER) AS height
        |FROM base b LEFT JOIN agg a USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,


    // every stbl quantity re-derived as closed-form arithmetic: sample
    // sizes/deltas enumerated per doc, keyframes by the class rule,
    // rebased offsets as prefix sums — the engine must reach the same
    // numbers through the real box walk
    "q262_mp4_sample_plan" ->
      """WITH base AS (SELECT doc_id, CAST(doc_id % 5 AS INTEGER) AS cls,
        |    3 + CAST(doc_id % 4 AS INTEGER) AS n,
        |    CAST(doc_id % 7 AS BIGINT) AS m7,
        |    30 + 5 * CAST(doc_id % 3 AS BIGINT) AS delta
        |  FROM documents),
        |samples AS (SELECT b.doc_id, b.n, b.delta, t.i AS i,
        |    50 + 3 * t.i + b.m7 AS sz,
        |    (b.cls <> 0 OR t.i % 3 = 0) AS is_kf
        |  FROM base b, range(0, 6) t(i) -- n = 3 + doc_id%4 <= 6
        |  WHERE b.cls IN (0, 1, 2) AND t.i < b.n),
        |cum AS (SELECT doc_id, i, sz, is_kf, delta,
        |    COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rel_off
        |  FROM samples),
        |kf AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_kf,
        |    CAST(SUM(rel_off) AS BIGINT) AS kf_rel_offset_sum,
        |    CAST(SUM(sz) AS BIGINT) AS kf_size_sum,
        |    CAST(MAX(i * delta) AS BIGINT) AS max_kf_dts_ms
        |  FROM cum WHERE is_kf GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(SUM(sz) AS BIGINT) AS total_bytes
        |  FROM samples GROUP BY doc_id)
        |SELECT b.doc_id,
        |  CASE WHEN b.cls IN (0, 1, 2) THEN b.n ELSE NULL END AS n_frames,
        |  kf.n_kf AS n_keyframes,
        |  CASE WHEN b.cls IN (0, 1, 2) THEN CAST(b.n * b.delta AS BIGINT)
        |       ELSE NULL END AS duration_ms,
        |  tot.total_bytes, kf.kf_rel_offset_sum, kf.kf_size_sum,
        |  kf.max_kf_dts_ms
        |FROM base b LEFT JOIN kf USING (doc_id) LEFT JOIN tot USING (doc_id)
        |ORDER BY doc_id""".stripMargin,


    // codec + decoded lengths predicted from documents.text alone (ASCII
    // corpus: chars == UTF-8 bytes); refusal classes are NULL rows
    "q261_compressed_ingest" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 6 AS INTEGER)
        |    WHEN 0 THEN 'gzip' WHEN 1 THEN 'zlib' WHEN 2 THEN 'gzip'
        |    WHEN 5 THEN 'plain' ELSE NULL END AS codec,
        |  CASE CAST(doc_id % 6 AS INTEGER)
        |    WHEN 0 THEN length(text) WHEN 1 THEN length(text)
        |    WHEN 2 THEN 2 * length(text) WHEN 5 THEN length(text) + 2
        |    ELSE NULL END AS n_chars,
        |  CASE CAST(doc_id % 6 AS INTEGER)
        |    WHEN 0 THEN length(text) WHEN 1 THEN length(text)
        |    WHEN 2 THEN 2 * length(text) WHEN 5 THEN length(text) + 2
        |    ELSE NULL END AS text_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,


    // the oracle predicts the decoded pixels from the same doc_id
    // arithmetic the in-repo encoder used — exact because DC-only flat
    // blocks survive quantization at step 8 losslessly, and the
    // decoder's YCbCr→RGB is 16-bit fixed-point INTEGER arithmetic
    // (x/65536 has a power-of-two denominator, so FLOOR over the
    // double division is exact). Classes % 6 == 3 (marker mid-scan)
    // and == 5 (truncated) must decode to NOTHING
    // fully-refined progressive pixels from doc_id arithmetic; the
    // truncated class is NULL (Malformed is terminal)
    "q293_jpeg_progressive" ->
      """WITH base AS (SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls
        |  FROM documents),
        |blk AS (SELECT b.doc_id,
        |    (b.doc_id * 3 + 10 * xs.bx + 20 * ys.by) % 256 AS v
        |  FROM base b, (VALUES (0), (1)) xs(bx), (VALUES (0), (1)) ys(by)
        |  WHERE b.cls IN (0, 1)),
        |cagg AS (SELECT doc_id, SUM(v) / 4.0 AS ml FROM blk GROUP BY 1)
        |SELECT b.doc_id,
        |  CASE WHEN cls = 2 THEN NULL
        |       WHEN cls = 3 THEN CAST((b.doc_id * 11 + 23) % 256 AS DOUBLE)
        |       ELSE ml END AS mean_luma,
        |  CASE WHEN cls = 2 THEN NULL
        |       WHEN cls = 3 THEN CAST(8 AS INTEGER)
        |       ELSE CAST(16 AS INTEGER) END AS width,
        |  CASE WHEN cls = 2 THEN NULL
        |       WHEN cls = 3 THEN CAST(8 AS INTEGER)
        |       ELSE CAST(16 AS INTEGER) END AS height
        |FROM base b LEFT JOIN cagg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q258_jpeg_pixels" ->
      """WITH base AS (SELECT doc_id, CAST(doc_id % 6 AS INTEGER) AS cls,
        |  (doc_id * 11 + 23) % 256 AS gy,
        |  (doc_id * 5) % 256 AS cbv, (doc_id * 7) % 256 AS crv
        |  FROM documents),
        |blk AS (SELECT b.doc_id,
        |  (b.doc_id * 3 + 10 * xs.bx + 20 * ys.by) % 256 AS y, cbv, crv
        |  FROM base b, (VALUES (0), (1)) xs(bx), (VALUES (0), (1)) ys(by)
        |  WHERE b.cls IN (2, 4)),
        |px AS (SELECT doc_id,
        |  LEAST(255.0, GREATEST(0.0,
        |    y + FLOOR((91881 * (crv - 128) + 32768) / 65536.0))) AS r,
        |  LEAST(255.0, GREATEST(0.0,
        |    y - FLOOR((22554 * (cbv - 128) + 46802 * (crv - 128) - 32768)
        |              / 65536.0))) AS g,
        |  LEAST(255.0, GREATEST(0.0,
        |    y + FLOOR((116130 * (cbv - 128) + 32768) / 65536.0))) AS b
        |  FROM blk),
        |cagg AS (SELECT doc_id, SUM(b) / 4.0 AS mb, SUM(g) / 4.0 AS mg,
        |  SUM(r) / 4.0 AS mr, (SUM(r) + SUM(g) + SUM(b)) / 12.0 AS ml
        |  FROM px GROUP BY doc_id)
        |SELECT b.doc_id,
        |  CASE WHEN cls IN (3, 5) THEN NULL
        |       WHEN cls IN (0, 1) THEN CAST(gy AS DOUBLE) ELSE mb END AS mean_b,
        |  CASE WHEN cls IN (3, 5) THEN NULL
        |       WHEN cls IN (0, 1) THEN CAST(gy AS DOUBLE) ELSE mg END AS mean_g,
        |  CASE WHEN cls IN (3, 5) THEN NULL
        |       WHEN cls IN (0, 1) THEN CAST(gy AS DOUBLE) ELSE mr END AS mean_r,
        |  CASE WHEN cls IN (3, 5) THEN NULL
        |       WHEN cls IN (0, 1) THEN CAST(gy AS DOUBLE) ELSE ml END AS mean_luma,
        |  CASE WHEN cls IN (3, 5) THEN NULL
        |       WHEN cls IN (0, 1) THEN CAST(8 AS INTEGER)
        |       ELSE CAST(16 AS INTEGER) END AS width,
        |  CASE WHEN cls IN (3, 5) THEN NULL
        |       WHEN cls IN (0, 1) THEN CAST(8 AS INTEGER)
        |       ELSE CAST(16 AS INTEGER) END AS height
        |FROM base b LEFT JOIN cagg USING (doc_id) ORDER BY doc_id""".stripMargin,


    "q31_events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "q32_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image/png'
        |       WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |  CAST(least(strlen(text), 256) AS BIGINT) AS byte_len,
        |  64 AS width,
        |  4 AS n_features
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q35_bucketed_upsert" -> (custCtes +
      s""",
        |delta AS (SELECT * FROM src WHERE c_custkey % 17 = 0)
        |SELECT coalesce(d.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN d.c_custkey IS NOT NULL THEN d.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        |  CASE WHEN d.c_custkey IS NOT NULL AND (t.c_custkey IS NULL OR
        |    (d.c_acctbal IS DISTINCT FROM t.c_acctbal OR d.c_name IS DISTINCT FROM t.c_name
        |     OR d.c_mktsegment IS DISTINCT FROM t.c_mktsegment
        |     OR d.c_nationkey IS DISTINCT FROM t.c_nationkey))
        |    THEN CAST(2 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS version_id
        |FROM delta d FULL OUTER JOIN state t ON d.c_custkey = t.c_custkey
        |ORDER BY 1""".stripMargin),


    "q36_salted_sum" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,


    "q41_sessionize" ->
      """WITH e AS (SELECT user_id, ts, value,
        |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |            >= INTERVAL 60 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM e)
        |SELECT user_id,
        |  CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS session_start_epoch,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_epoch""".stripMargin,


    // near-dup pairs -> undirected edges -> min-reachable-id per node:
    // the recursive closure IS the connected-component labeling
    "q56_neardup_components" -> (
      minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |e AS (SELECT id_a AS x, id_b AS y FROM pairs WHERE j >= 0.6
        |      UNION ALL
        |      SELECT id_b, id_a FROM pairs WHERE j >= 0.6),
        |reach(node, label) AS (
        |  SELECT x, x FROM e
        |  UNION
        |  SELECT e2.x, r.label FROM e e2 JOIN reach r ON e2.y = r.node)
        |SELECT node AS doc_id, min(label) AS component
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin),

    // q56's recursive clustering chain, aggregated twice: component ->
    // size, then size -> cluster count
    "q247_cluster_sizes" -> (
      minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |e AS (SELECT id_a AS x, id_b AS y FROM pairs WHERE j >= 0.6
        |      UNION ALL
        |      SELECT id_b, id_a FROM pairs WHERE j >= 0.6),
        |reach(node, label) AS (
        |  SELECT x, x FROM e
        |  UNION
        |  SELECT e2.x, r.label FROM e e2 JOIN reach r ON e2.y = r.node),
        |comp AS (SELECT node, min(label) AS component
        |  FROM reach GROUP BY node),
        |cs AS (SELECT component, count(*) AS cluster_size
        |  FROM comp GROUP BY 1)
        |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
        |  CAST(count(*) AS BIGINT) AS n_clusters
        |FROM cs GROUP BY 1 ORDER BY 1""".stripMargin),

    // q166's truth/found comparison re-run INSIDE a stratified hash
    // sample: corpus = the sampled docs (the shared minhash tail
    // references it by name), truth = exact Jaccard over all
    // shingle-sharing sampled pairs, found = the banded pipeline's
    // verified pairs, both attributed to the smaller id's stratum
    "q256_sampled_recall_audit" -> {
      val c90 = graft.operators.Sampling.hexCutoff(0.9)
      val c75 = graft.operators.Sampling.hexCutoff(0.75)
      val c60 = graft.operators.Sampling.hexCutoff(0.6)
      val minhashTail = minhashPairsCtes.stripPrefix(nearDupCte)
      s"""WITH raw AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, substr(text, strpos(text, ' ') + 1)
         |  FROM documents WHERE doc_id % 7 = 0),
         |strat AS (SELECT doc_id, text,
         |  's' || CAST(doc_id % 4 AS VARCHAR) AS stratum FROM raw),
         |corpus AS (SELECT doc_id, text FROM strat
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
         |    CASE stratum WHEN 's0' THEN '$c90' WHEN 's1' THEN '$c75'
         |    ELSE '$c60' END)$minhashTail,
         |samp AS (SELECT s.doc_id, s.stratum FROM strat s
         |  JOIN corpus c ON c.doc_id = s.doc_id),
         |te AS (SELECT doc_id, unnest(hs) AS h FROM hsh),
         |tc AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM te a JOIN te b ON a.h = b.h AND a.doc_id < b.doc_id),
         |tp AS (SELECT tc.id_a, tc.id_b,
         |  CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
         |  CAST(len(list_distinct(list_concat(sa.hs, sb.hs))) AS DOUBLE) AS j
         |  FROM tc JOIN hsh sa ON sa.doc_id = tc.id_a
         |  JOIN hsh sb ON sb.doc_id = tc.id_b),
         |tr AS (SELECT p.id_a, p.id_b, s.stratum FROM tp p
         |  JOIN samp s ON s.doc_id = p.id_a WHERE p.j >= 0.6),
         |ap AS (SELECT id_a, id_b FROM pairs WHERE j >= 0.6),
         |ms AS (SELECT stratum, count(*) AS n_missed FROM tr
         |  ANTI JOIN ap ON tr.id_a = ap.id_a AND tr.id_b = ap.id_b
         |  GROUP BY 1),
         |tt AS (SELECT stratum, count(*) AS n_true FROM tr GROUP BY 1),
         |sd AS (SELECT stratum, count(*) AS n_docs FROM samp GROUP BY 1)
         |SELECT sd.stratum, CAST(sd.n_docs AS BIGINT) AS n_docs,
         |  CAST(coalesce(tt.n_true, 0) AS BIGINT) AS n_true,
         |  CAST(coalesce(tt.n_true, 0) - coalesce(ms.n_missed, 0) AS BIGINT)
         |    AS n_found,
         |  CASE WHEN coalesce(tt.n_true, 0) = 0 THEN 1.0
         |       ELSE floor(CAST(tt.n_true - coalesce(ms.n_missed, 0) AS DOUBLE) /
         |         CAST(tt.n_true AS DOUBLE) * 1000000 + 0.5) / 1000000
         |  END AS recall
         |FROM sd LEFT JOIN tt ON tt.stratum = sd.stratum
         |LEFT JOIN ms ON ms.stratum = sd.stratum
         |ORDER BY sd.stratum""".stripMargin
    },


    // brute-force all-pairs weighted scorer — no blocking anywhere
    "q154_entity_resolution" ->
      """WITH base AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal,
        |    c_mktsegment FROM customer WHERE c_custkey <= 600),
        |dirty AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT c_custkey + 100000,
        |    substr(c_name, 1, len(c_name) - 1) || 'x',
        |    c_nationkey, c_acctbal, c_mktsegment
        |  FROM base WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 200000, c_name || '_alt',
        |    c_nationkey, c_acctbal, c_mktsegment
        |  FROM base WHERE c_custkey % 15 = 0),
        |sc AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  (CASE WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 40 ELSE 0 END
        |   + CASE WHEN a.c_acctbal = b.c_acctbal THEN 30 ELSE 0 END
        |   + CASE WHEN a.c_nationkey = b.c_nationkey THEN 20 ELSE 0 END
        |   + CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 10 ELSE 0 END)
        |    AS score
        |  FROM dirty a, dirty b WHERE a.c_custkey < b.c_custkey)
        |SELECT id_a, id_b, CAST(score AS BIGINT) AS score
        |FROM sc WHERE score >= 60 ORDER BY id_a, id_b""".stripMargin,


    "q152_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS sz
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_rows, count(*) AS n_groups,
        |  min(sz) AS min_group,
        |  CAST(sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_groups_below_k,
        |  CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_rows_below_k
        |FROM g""".stripMargin,

    // one-pass recompute from raw — the engine's two-increment partial
    // fold must reproduce it exactly
    "q150_incremental_rollup" ->
      """WITH e AS (SELECT user_id, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE user_id % 20 = 0),
        |m AS (SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(v * v AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |  min(v) AS min_value, max(v) AS max_value
        |  FROM e GROUP BY 1)
        |SELECT user_id, n,
        |  floor(s1 * 1000000 + 0.5) / 1000000 AS sum_value,
        |  floor(s1 / n * 1000000 + 0.5) / 1000000 AS avg_value,
        |  floor((s2 - s1 * s1 / n) / n * 1000000 + 0.5) / 1000000 AS var_value,
        |  min_value, max_value
        |FROM m ORDER BY user_id""".stripMargin,

    // q56's recursive-CTE components + singleton completion + q71's
    // hex-cutoff hash assignment, keyed on the COMPONENT
    "q207_seasonal_baseline" ->
      """WITH e AS (SELECT event_type, hour(ts) AS hod, value
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, hod, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS m
        |  FROM e GROUP BY 1, 2),
        |t AS (SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mt
        |  FROM e GROUP BY 1)
        |SELECT c.event_type, CAST(hod AS INTEGER) AS hod, n,
        |  floor(m * 1000000 + 0.5) / 1000000 AS mean_value,
        |  floor(mt * 1000000 + 0.5) / 1000000 AS type_mean,
        |  abs(m - mt) > mt * 0.2 AS dev_flag
        |FROM c JOIN t USING (event_type) ORDER BY event_type, hod""".stripMargin,

    "q208_change_columns" -> (custCtes +
      """,
        |j AS (SELECT s.c_name AS sn, t.c_name AS tn,
        |    s.c_acctbal AS sa, t.c_acctbal AS ta,
        |    s.c_mktsegment AS sm, t.c_mktsegment AS tm,
        |    s.c_nationkey AS sk, t.c_nationkey AS tk
        |  FROM src s JOIN state t ON s.c_custkey = t.c_custkey),
        |a AS (SELECT count(*) AS n_matched,
        |  sum(CASE WHEN sn IS DISTINCT FROM tn THEN 1 ELSE 0 END) AS ch_name,
        |  sum(CASE WHEN sa IS DISTINCT FROM ta THEN 1 ELSE 0 END) AS ch_acct,
        |  sum(CASE WHEN sm IS DISTINCT FROM tm THEN 1 ELSE 0 END) AS ch_seg,
        |  sum(CASE WHEN sk IS DISTINCT FROM tk THEN 1 ELSE 0 END) AS ch_nat
        |  FROM j),
        |u AS (SELECT 'c_acctbal' AS column_name, ch_acct AS n_changed,
        |    n_matched FROM a
        |  UNION ALL SELECT 'c_mktsegment', ch_seg, n_matched FROM a
        |  UNION ALL SELECT 'c_name', ch_name, n_matched FROM a
        |  UNION ALL SELECT 'c_nationkey', ch_nat, n_matched FROM a)
        |SELECT column_name, CAST(n_changed AS BIGINT) AS n_changed,
        |  CAST(n_matched AS BIGINT) AS n_matched,
        |  floor(CAST(n_changed AS DOUBLE) / CAST(n_matched AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS change_share
        |FROM u ORDER BY column_name""".stripMargin),

    "q206_dedup_savings" -> (
      minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |e AS (SELECT id_a AS x, id_b AS y FROM pairs WHERE j >= 0.6
        |      UNION ALL
        |      SELECT id_b, id_a FROM pairs WHERE j >= 0.6),
        |reach(node, label) AS (
        |  SELECT x, x FROM e
        |  UNION
        |  SELECT e2.x, r.label FROM e e2 JOIN reach r ON e2.y = r.node),
        |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
        |lab AS (SELECT c2.doc_id, length(c2.text) AS chars,
        |  coalesce(cp.component, c2.doc_id) AS cluster
        |  FROM corpus c2 LEFT JOIN comp cp ON cp.node = c2.doc_id)
        |SELECT count(*) AS n_docs,
        |  count(DISTINCT cluster) AS n_clusters,
        |  count(*) - count(DISTINCT cluster) AS n_dup_docs,
        |  CAST(sum(chars) AS BIGINT) AS chars_total,
        |  CAST(sum(CASE WHEN doc_id = cluster THEN chars ELSE 0 END)
        |    AS BIGINT) AS chars_kept,
        |  floor((1.0 - CAST(sum(CASE WHEN doc_id = cluster THEN chars ELSE 0 END)
        |      AS DOUBLE) / CAST(sum(chars) AS DOUBLE)) * 1000000 + 0.5)
        |    / 1000000 AS savings_share
        |FROM lab""".stripMargin),

    "q149_leakage_split" -> {
      val c80 = graft.operators.Sampling.hexCutoff(0.8)
      val c90 = graft.operators.Sampling.hexCutoff(math.min(0.8 + 0.1, 1.0))
      minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""",
        |e AS (SELECT id_a AS x, id_b AS y FROM pairs WHERE j >= 0.6
        |      UNION ALL
        |      SELECT id_b, id_a FROM pairs WHERE j >= 0.6),
        |reach(node, label) AS (
        |  SELECT x, x FROM e
        |  UNION
        |  SELECT e2.x, r.label FROM e e2 JOIN reach r ON e2.y = r.node),
        |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
        |lab AS (SELECT c2.doc_id, coalesce(cp.component, c2.doc_id) AS component
        |  FROM corpus c2 LEFT JOIN comp cp ON cp.node = c2.doc_id),
        |sp AS (SELECT doc_id, component,
        |  CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 8) < '$c80' THEN 'train'
        |       WHEN substr(md5(CAST(component AS VARCHAR)), 1, 8) < '$c90' THEN 'val'
        |       ELSE 'test' END AS split FROM lab)
        |SELECT split, count(*) AS n_docs,
        |  count(DISTINCT component) AS n_components
        |FROM sp GROUP BY 1 ORDER BY split""".stripMargin
    },

    "q143_scd2" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
        |  FROM events WHERE event_type IS NOT NULL),
        |c AS (SELECT user_id, event_type, event_id, sec,
        |  lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id) AS prev FROM e),
        |ch AS (SELECT user_id, event_type, event_id, sec FROM c
        |  WHERE prev IS NULL OR event_type <> prev)
        |SELECT user_id, event_type, sec AS valid_from,
        |  lead(sec) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id) AS valid_to,
        |  lead(sec) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id) IS NULL AS is_current
        |FROM ch ORDER BY user_id, valid_from, event_type""".stripMargin,

    // INDEPENDENT derivation: latest change row at or before T over the
    // raw events — no ranges anywhere, so equality proves the range
    // reconstruction against a replay
    "q188_time_travel" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
        |  FROM events WHERE event_type IS NOT NULL),
        |b AS (SELECT (min(sec) + max(sec)) // 2 AS t FROM e),
        |c AS (SELECT user_id, event_type, event_id, sec,
        |  lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id) AS prev FROM e),
        |ch AS (SELECT user_id, event_type, event_id, sec FROM c
        |  WHERE prev IS NULL OR event_type <> prev),
        |pick AS (SELECT ch.user_id,
        |  max(struct_pack(sec := ch.sec, eid := ch.event_id,
        |                  st := ch.event_type)) AS m
        |  FROM ch CROSS JOIN b WHERE ch.sec <= b.t GROUP BY 1)
        |SELECT user_id, m.st AS state_at_t, m.sec AS valid_from
        |FROM pick ORDER BY user_id""".stripMargin,


    // identical to q56's oracle: the full recursive-CTE rebuild over the
    // union pair set — the incremental path must reproduce it exactly
    "q142_incremental_components" -> (
      minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |e AS (SELECT id_a AS x, id_b AS y FROM pairs WHERE j >= 0.6
        |      UNION ALL
        |      SELECT id_b, id_a FROM pairs WHERE j >= 0.6),
        |reach(node, label) AS (
        |  SELECT x, x FROM e
        |  UNION
        |  SELECT e2.x, r.label FROM e e2 JOIN reach r ON e2.y = r.node)
        |SELECT node AS doc_id, min(label) AS component
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin),

    "q57_stratified_sample" ->
      s"""SELECT l_returnflag, count(*) AS n_sampled,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         |FROM lineitem
         |WHERE substr(md5(concat_ws('#', CAST(l_orderkey AS VARCHAR),
         |                                CAST(l_linenumber AS VARCHAR))), 1, 8) <
         |  CASE l_returnflag
         |    WHEN 'A' THEN '${graft.operators.Sampling.hexCutoff(0.25)}'
         |    WHEN 'N' THEN '${graft.operators.Sampling.hexCutoff(0.05)}'
         |    WHEN 'R' THEN '${graft.operators.Sampling.hexCutoff(0.10)}'
         |    ELSE '00000000' END
         |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q63_zorder" -> {
      def qsql(cexpr: String, mn: Double, mx: Double, bits: Int) = {
        val lv = (1L << bits) - 1
        s"least(greatest(CAST(floor((CAST($cexpr AS DOUBLE) - $mn) / ${mx - mn} * $lv.0) AS BIGINT), 0), $lv)"
      }
      val inter = (for { b <- 0 until 8; d <- 0 until 2 }
        yield s"(((q$d >> $b) & 1) << ${b * 2 + d})").mkString(" | ")
      s"""WITH q AS (SELECT o_orderkey,
         |  ${qsql("o_custkey % 1000", 0.0, 1000.0, 8)} AS q0,
         |  ${qsql("o_totalprice", 0.0, 600000.0, 8)} AS q1
         |FROM orders)
         |SELECT o_orderkey, $inter AS z FROM q ORDER BY z, o_orderkey""".stripMargin
    },


    "q66_ema" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  list_reduce(list(CAST(value AS DOUBLE)
        |                   ORDER BY CAST(ts AS TIMESTAMP), event_id),
        |              (acc, x) -> 0.5*x + 0.5*acc) AS ema
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,


    "q67_weighted_sample" ->
      """SELECT source, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) <
        |  floor(least(CAST(n_chars AS DOUBLE) / 1000.0, 1.0) * 4294967296.0 + 0.5)
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q69_profile" -> {
      def prof(c: String, num: Boolean) = {
        val minNum = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val maxNum = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val minStr = if (num) "CAST(NULL AS VARCHAR)" else s"CAST(min($c) AS VARCHAR)"
        val maxStr = if (num) "CAST(NULL AS VARCHAR)" else s"CAST(max($c) AS VARCHAR)"
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  $minNum AS min_num, $maxNum AS max_num,
           |  $minStr AS min_str, $maxStr AS max_str
           |FROM customer""".stripMargin
      }
      Seq(("c_custkey", true), ("c_name", false), ("c_acctbal", true),
        ("c_mktsegment", false), ("c_nationkey", true))
        .map((prof _).tupled).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },


    // earliest-occurrence chaining, equivalent to the engine's greedy
    // fold (which advances on the FIRST matching event): stage k iff
    // min(view) < min(click after it) < min(purchase after that). NOT a
    // list_reduce fold: DuckDB 1.0.0 mis-correlates struct accumulators
    // when several grouped lists fold in one vectorized batch (exposed
    // by q245's stage-varied subset; on this full-history fixture every
    // user reaches stage 3, which had masked it). Strict '>' matches
    // the fold because the fixture has no (user, ts) ties.
    "q70_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |st AS (SELECT u.user_id,
        |  CASE WHEN s3.user_id IS NOT NULL THEN 3
        |       WHEN s2.user_id IS NOT NULL THEN 2
        |       WHEN s1.user_id IS NOT NULL THEN 1
        |       ELSE 0 END AS stage
        |  FROM u LEFT JOIN s1 USING (user_id)
        |    LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id))
        |SELECT CAST(stage AS BIGINT) AS funnel_stage, count(*) AS n_keys
        |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,


    "q71_dataset_split" -> {
      val c80 = graft.operators.Sampling.hexCutoff(0.8)
      val c90 = graft.operators.Sampling.hexCutoff(math.min(0.8 + 0.1, 1.0))
      s"""WITH t AS (SELECT source, n_chars,
         |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$c80' THEN 'train'
         |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$c90' THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, source, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM t GROUP BY 1, 2 ORDER BY split, source""".stripMargin
    },


    "q72_zscore" ->
      """WITH g AS (SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM lineitem GROUP BY 1),
        |z AS (SELECT l.l_returnflag,
        |    (l.l_quantity - g.s1 / g.n) /
        |      sqrt((g.s2 - g.s1 * g.s1 / g.n) / g.n) AS zs
        |  FROM lineitem l JOIN g USING (l_returnflag))
        |SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CASE WHEN abs(zs) > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  floor(min(zs) * 1000000 + 0.5) / 1000000 AS min_z,
        |  floor(max(zs) * 1000000 + 0.5) / 1000000 AS max_z
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,


    "q73_canonical_corpus" -> (
      minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |e AS (SELECT id_a AS x, id_b AS y FROM pairs WHERE j >= 0.6
        |      UNION ALL
        |      SELECT id_b, id_a FROM pairs WHERE j >= 0.6),
        |reach(node, label) AS (
        |  SELECT x, x FROM e
        |  UNION
        |  SELECT e2.x, r.label FROM e e2 JOIN reach r ON e2.y = r.node),
        |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node)
        |SELECT c.doc_id,
        |  md5(regexp_replace(lower(trim(c.text)), '\s+', ' ', 'g')) AS fp
        |FROM corpus c LEFT JOIN comp ON comp.node = c.doc_id
        |WHERE coalesce(comp.component, c.doc_id) = c.doc_id
        |ORDER BY c.doc_id""".stripMargin),


    "q74_media_headers" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INTEGER)
        |       WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
        |       WHEN 2 THEN 'image/gif' ELSE 'image/png' END AS detected_mime,
        |  CASE WHEN doc_id % 4 = 3 THEN NULL
        |       ELSE CAST(doc_id % 4000 + 16 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 4 = 3 THEN NULL
        |       ELSE CAST(doc_id % 3000 + 16 AS INTEGER) END AS height,
        |  CAST(CASE CAST(doc_id % 4 AS INTEGER)
        |       WHEN 0 THEN 29 WHEN 1 THEN 14 WHEN 2 THEN 10
        |       ELSE 10 END AS BIGINT) AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q76_sequence_packing" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(coalesce(n_chars, 0) AS BIGINT) AS n_toks,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4 AS shard,
        |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hx
        |  FROM documents),
        |o AS (SELECT shard, doc_id, n_toks,
        |  CAST(coalesce(sum(n_toks) OVER (PARTITION BY shard ORDER BY hx, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM t)
        |SELECT CAST(shard AS BIGINT) AS shard, doc_id, n_toks, start_offset,
        |  start_offset // 4096 AS first_bin,
        |  (start_offset + greatest(n_toks - 1, 0)) // 4096 AS last_bin
        |FROM o ORDER BY shard, start_offset, doc_id""".stripMargin,


    "q78_canonical_by_score" -> (
      minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |e AS (SELECT id_a AS x, id_b AS y FROM pairs WHERE j >= 0.6
        |      UNION ALL
        |      SELECT id_b, id_a FROM pairs WHERE j >= 0.6),
        |reach(node, label) AS (
        |  SELECT x, x FROM e
        |  UNION
        |  SELECT e2.x, r.label FROM e e2 JOIN reach r ON e2.y = r.node),
        |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
        |labeled AS (SELECT c.doc_id, length(c.text) AS score,
        |  coalesce(comp.component, c.doc_id) AS lbl
        |  FROM corpus c LEFT JOIN comp ON comp.node = c.doc_id),
        |win AS (SELECT lbl, doc_id AS canonical_id FROM (
        |  SELECT lbl, doc_id,
        |    row_number() OVER (PARTITION BY lbl ORDER BY score DESC, doc_id ASC) AS rn
        |  FROM labeled) WHERE rn = 1)
        |SELECT l.doc_id, w.canonical_id, (l.doc_id = w.canonical_id) AS kept
        |FROM labeled l JOIN win w USING (lbl) ORDER BY l.doc_id""".stripMargin),


    "q79_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
        |    quantile_cont(l_quantity, 0.05) AS lo,
        |    quantile_cont(l_quantity, 0.95) AS hi
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT l.l_returnflag,
        |    least(greatest(CAST(l.l_quantity AS DOUBLE), b.lo), b.hi) AS wv
        |  FROM lineitem l JOIN b USING (l_returnflag))
        |SELECT l_returnflag, count(*) AS n,
        |  floor(min(wv) * 1000000 + 0.5) / 1000000 AS min_w,
        |  floor(max(wv) * 1000000 + 0.5) / 1000000 AS max_w,
        |  floor(CAST(sum(CAST(wv AS DECIMAL(28,12))) AS DOUBLE) * 10000 + 0.5) / 10000 AS sum_w
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,


    "q80_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q84_bloom_join" ->
      """WITH hi AS (SELECT o_orderkey AS l_orderkey, o_orderstatus
        |  FROM orders WHERE o_totalprice > 450000.0)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN hi USING (l_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q89_rolling_window" ->
      """WITH e AS (SELECT event_id, user_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec, value
        |  FROM events)
        |SELECT event_id, user_id,
        |  count(*) OVER w AS n_win,
        |  CAST(SUM(CAST(value AS DECIMAL(28,12))) OVER w AS DOUBLE) AS sum_win
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,


    "q91_negative_sample" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |a AS (SELECT doc_id AS anchor_id, CAST(s.slot AS BIGINT) AS slot
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 3)) AS slot) s),
        |g AS (SELECT anchor_id, slot,
        |  CAST(('0x' || substr(md5(CAST(anchor_id AS VARCHAR) || '#' ||
        |    CAST(slot AS VARCHAR)), 1, 15)) AS BIGINT) % n AS neg_id
        |  FROM a CROSS JOIN nn)
        |SELECT anchor_id, slot, neg_id, d.n_chars AS neg_chars
        |FROM g JOIN documents d ON d.doc_id = g.neg_id
        |WHERE neg_id != anchor_id
        |ORDER BY anchor_id, slot""".stripMargin,


    "q92_bloom_novel" ->
      """SELECT d.doc_id, d.n_chars FROM documents d
        |LEFT JOIN (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) c
        |  ON d.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL ORDER BY d.doc_id""".stripMargin,


    "q96_audio_headers" ->
      """SELECT doc_id,
        |  'audio/wav' AS detected_mime,
        |  CASE WHEN doc_id % 3 = 2 THEN NULL
        |       ELSE ((doc_id % 50 + 1) * 1000 * 1000) // (doc_id % 100 * 100 + 8000)
        |  END AS duration_ms,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 16 ELSE 44 END AS BIGINT) AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin,


    // the closed-form water-fill: rank sources by weight, the first
    // position whose leveled share cannot cover its own weight binds
    // the integer cap (numerator guarded non-negative BEFORE dividing —
    // `//` floors, Spark's `div` truncates; they agree only >= 0)
    "q155_fair_budget" ->
      """WITH sz AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail
        |  FROM documents GROUP BY 1),
        |rk AS (SELECT source, avail,
        |  row_number() OVER (ORDER BY avail, source) AS j,
        |  CAST(coalesce(sum(avail) OVER (ORDER BY avail, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS bef,
        |  count(*) OVER () AS n
        |  FROM sz),
        |cand AS (SELECT j, avail, (100000 - bef) // (n - j + 1) AS cap
        |  FROM rk WHERE 100000 - bef >= 0),
        |bind AS (SELECT cap FROM cand WHERE cap < avail ORDER BY j LIMIT 1)
        |SELECT s.source, s.avail,
        |  least(s.avail, coalesce((SELECT cap FROM bind), s.avail)) AS alloc,
        |  least(s.avail, coalesce((SELECT cap FROM bind), s.avail)) < s.avail
        |    AS capped
        |FROM sz s ORDER BY source""".stripMargin,


    "q156_l_diversity" ->
      """WITH g AS (SELECT c_nationkey, count(*) AS sz,
        |  count(DISTINCT c_mktsegment) AS lv
        |  FROM customer GROUP BY 1)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_rows, count(*) AS n_groups,
        |  min(lv) AS min_diversity,
        |  CAST(sum(CASE WHEN lv < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_groups_below_l,
        |  CAST(sum(CASE WHEN lv < 5 THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_rows_below_l
        |FROM g""".stripMargin,


    // integer length-class ids ((len+31)//32 — no log2), all-integer
    // padded totals, one IEEE divide per ratio on the 1e-6 lattice
    "q175_pad_efficiency" ->
      """WITH t AS (SELECT CAST(CASE WHEN norm = '' THEN 0
        |    ELSE length(norm) - length(replace(norm, ' ', '')) + 1
        |    END AS BIGINT) AS len
        |  FROM (SELECT regexp_replace(trim(text), '\s+', ' ', 'g') AS norm
        |        FROM documents)),
        |v AS (SELECT len FROM t WHERE len > 0),
        |g AS (SELECT CAST((len + 31) // 32 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len) AS BIGINT) AS sum_tokens FROM v GROUP BY 1),
        |m AS (SELECT max(len) AS gmax FROM v)
        |SELECT bucket, bucket * 32 AS max_len, n_docs, sum_tokens,
        |  n_docs * bucket * 32 AS padded_tokens,
        |  n_docs * gmax AS naive_padded_tokens,
        |  floor(CAST(n_docs * bucket * 32 - sum_tokens AS DOUBLE) /
        |    CAST(n_docs * bucket * 32 AS DOUBLE) * 1000000 + 0.5) / 1000000
        |    AS waste_pct,
        |  floor(CAST(n_docs * gmax - n_docs * bucket * 32 AS DOUBLE) /
        |    CAST(n_docs * gmax AS DOUBLE) * 1000000 + 0.5) / 1000000
        |    AS saved_pct
        |FROM g CROSS JOIN m ORDER BY bucket""".stripMargin,


    // same md5 rendezvous weights; argmax as a lexicographic struct
    // max — deterministic under ties in both engines
    "q187_rendezvous_shards" ->
      """WITH ex AS (SELECT c_custkey AS k, s,
        |  CAST(('0x' || substr(md5(CAST(s AS VARCHAR) || '#'
        |    || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM customer, range(0, 9) t(s)),
        |a8 AS (SELECT k, CAST(max(struct_pack(h := h, s := s)).s AS BIGINT)
        |  AS shard8 FROM ex WHERE s < 8 GROUP BY 1),
        |a9 AS (SELECT k, CAST(max(struct_pack(h := h, s := s)).s AS BIGINT)
        |  AS shard9 FROM ex GROUP BY 1),
        |j AS (SELECT a8.k, shard8, shard9 FROM a8 JOIN a9 ON a8.k = a9.k),
        |g AS (SELECT shard8, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(CASE WHEN shard9 != shard8 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hrw_moved,
        |  CAST(sum(CASE WHEN k % 8 != k % 9 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS mod_moved
        |  FROM j GROUP BY 1)
        |SELECT shard8, n_keys, hrw_moved, mod_moved,
        |  floor(CAST(hrw_moved AS DOUBLE) / CAST(n_keys AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS hrw_moved_pct,
        |  floor(CAST(mod_moved AS DOUBLE) / CAST(n_keys AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS mod_moved_pct
        |FROM g ORDER BY shard8""".stripMargin,


    // dyadic decay: weight = 1 << (20 - age), values on the cents
    // lattice, integer sums — no exp(), no float drift
    "q186_decayed_topk" ->
      """WITH mx AS (SELECT CAST(max(ts) AS DATE) AS m FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL),
        |e AS (SELECT user_id,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |  least(date_diff('day', CAST(ts AS DATE), m), 20) AS age
        |  FROM events CROSS JOIN mx
        |  WHERE ts IS NOT NULL AND value IS NOT NULL)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(cents * (CAST(1 AS BIGINT) << (20 - age))) AS BIGINT)
        |    AS decayed_micros
        |FROM e GROUP BY 1
        |ORDER BY decayed_micros DESC, user_id LIMIT 20""".stripMargin,


    // per-user lag window with (ts, event_id) total order; integer pair
    // counts; one divide per matrix cell
    "q181_event_transitions" ->
      """WITH p AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev
        |  FROM events),
        |m AS (SELECT prev AS from_type, event_type AS to_type,
        |  CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE prev IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS ft
        |  FROM m GROUP BY 1)
        |SELECT m.from_type, m.to_type, m.n,
        |  floor(CAST(m.n AS DOUBLE) / CAST(ft.ft AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS share
        |FROM m JOIN ft USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,


    // integer ceiling division throughout: salts = ceil(n/target)
    // capped at 32, residual = ceil(n/salts)
    "q179_salt_plan" ->
      """WITH c AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |h AS (SELECT l_suppkey, n_rows,
        |  least((n_rows + 499) // 500, 32) AS salts
        |  FROM c WHERE n_rows > 500)
        |SELECT l_suppkey, n_rows, salts,
        |  (n_rows + salts - 1) // salts AS residual_per_task,
        |  (n_rows + salts - 1) // salts <= 500 AS under_target
        |FROM h ORDER BY n_rows DESC, l_suppkey""".stripMargin,


    // sqrt(share) snapped to a 1e-9 long lattice BEFORE the
    // cross-source total (order-independent integer sum); allocation is
    // exact integer division; sqrt itself is IEEE correctly-rounded
    "q178_temperature_mix" ->
      """WITH sk AS (SELECT source, doc_id FROM documents
        |  WHERE doc_id % 20 <= 4
        |     OR (doc_id % 20 BETWEEN 5 AND 9 AND (doc_id // 20) % 2 = 0)
        |     OR (doc_id % 20 >= 10 AND (doc_id // 20) % 5 = 0)),
        |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM sk GROUP BY 1),
        |n AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn FROM c),
        |w AS (SELECT source, n_docs,
        |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE) / CAST(nn AS DOUBLE))
        |    * 1000000000 + 0.5) AS BIGINT) AS w9, nn
        |  FROM c CROSS JOIN n),
        |ws AS (SELECT CAST(sum(w9) AS BIGINT) AS wsum FROM w)
        |SELECT source, n_docs,
        |  floor(CAST(n_docs AS DOUBLE) / CAST(nn AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS share,
        |  floor(CAST(w9 AS DOUBLE) / CAST(wsum AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS weight,
        |  (1000 * w9) // wsum AS alloc_budget,
        |  floor(least(1.0, CAST((1000 * w9) // wsum AS DOUBLE) /
        |    CAST(n_docs AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS rate
        |FROM w CROSS JOIN ws ORDER BY source""".stripMargin,


    // salted md5-prefix tokens on both sides of the key; the audit join
    // runs on the token, as the released tables would be joined
    "q177_pseudonymize" ->
      """WITH m AS (SELECT c_custkey, c_nationkey,
        |  'u_' || substr(md5('salt42#' || CAST(c_custkey AS VARCHAR)), 1, 12)
        |    AS pseud
        |  FROM customer),
        |o AS (SELECT 'u_' || substr(md5('salt42#' || CAST(o_custkey AS VARCHAR)), 1, 12)
        |    AS pseud FROM orders),
        |pn AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(count(DISTINCT pseud) AS BIGINT) AS n_pseudonyms
        |  FROM m GROUP BY 1),
        |lk AS (SELECT m.c_nationkey, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM m JOIN o USING (pseud) GROUP BY 1)
        |SELECT pn.c_nationkey, pn.n_customers, pn.n_pseudonyms,
        |  COALESCE(lk.n_orders, 0) AS n_orders
        |FROM pn LEFT JOIN lk ON pn.c_nationkey = lk.c_nationkey
        |ORDER BY pn.c_nationkey""".stripMargin,


    // exact common-denominator TVD: |c_v·N − g_v·n_g| summed over
    // OBSERVED cells; absent sensitive values enter via the complement
    // identity (N − Σ_present g_v)·n_g — no groups×values cross product
    "q174_t_closeness" ->
      """WITH b AS (SELECT c_nationkey AS qi, c_mktsegment AS s
        |  FROM customer WHERE c_mktsegment IS NOT NULL),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
        |g AS (SELECT s, CAST(count(*) AS BIGINT) AS g FROM b GROUP BY 1),
        |cells AS (SELECT qi, s, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2),
        |grp AS (SELECT qi, CAST(sum(c) AS BIGINT) AS ng FROM cells GROUP BY 1),
        |per AS (SELECT cells.qi,
        |  CAST(sum(abs(cells.c * n.n - g.g * grp.ng)) AS DOUBLE) AS pres,
        |  CAST(sum(g.g) AS DOUBLE) AS presg,
        |  any_value(grp.ng) AS ng, any_value(n.n) AS n
        |  FROM cells JOIN grp USING (qi) JOIN g USING (s) CROSS JOIN n
        |  GROUP BY 1),
        |t AS (SELECT qi, ng,
        |  floor((pres + (n - presg) * ng) /
        |    (2.0 * CAST(ng AS DOUBLE) * CAST(n AS DOUBLE)) * 1000000 + 0.5)
        |    / 1000000 AS tvd
        |  FROM per)
        |SELECT qi AS c_nationkey, ng AS n_g, tvd, tvd > 0.13 AS above_t
        |FROM t ORDER BY c_nationkey""".stripMargin,


    // cutoff_b = min_c floor(2^32·n_c·t_b/(t_c·n_b)) in HUGEINT — the
    // same exact integer cross-products the engine routes through
    // DECIMAL(38,0); membership is the first-8-hex md5 draw
    "q191_importance_resample" ->
      """WITH d AS (SELECT doc_id, CASE WHEN n_chars < 200 THEN 'short'
        |    WHEN n_chars < 400 THEN 'mid' ELSE 'long' END AS bin
        |  FROM documents),
        |t AS (SELECT * FROM (VALUES ('short', 20), ('mid', 30), ('long', 50))
        |  v(bin, w)),
        |c AS (SELECT t.bin, t.w, count(d.doc_id) AS n
        |  FROM t LEFT JOIN d USING (bin) GROUP BY 1, 2),
        |cut AS (SELECT b.bin, min(CASE WHEN b.n = 0 THEN 0 ELSE
        |    (CAST(4294967296 AS HUGEINT) * c2.n * b.w) // (c2.w * b.n) END)
        |    AS cutv
        |  FROM c b CROSS JOIN c c2 GROUP BY 1),
        |kept AS (SELECT d.bin, count(*) AS n_kept
        |  FROM d JOIN cut USING (bin)
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) < cutv
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_kept) AS BIGINT) AS kt FROM kept)
        |SELECT c.bin, CAST(c.n AS BIGINT) AS n_orig,
        |  CAST(kept.n_kept AS BIGINT) AS n_kept,
        |  floor(CAST(kept.n_kept AS DOUBLE) / CAST(kt AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS kept_share
        |FROM c JOIN kept USING (bin) CROSS JOIN tot ORDER BY bin""".stripMargin,


    // Benford terms: expectation frame left-joins observed counts so a
    // never-produced digit still contributes its full N·p term; the
    // nine log10(1+1/d) literals are the same doubles Scala hardcodes
    "q190_benford" ->
      """WITH obs AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INTEGER) AS digit, count(*) AS n
        |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs),
        |exp_ AS (SELECT * FROM (VALUES
        |  (1, CAST(0.3010299956639812 AS DOUBLE)),
        |  (2, CAST(0.17609125905568124 AS DOUBLE)),
        |  (3, CAST(0.12493873660829992 AS DOUBLE)),
        |  (4, CAST(0.09691001300805642 AS DOUBLE)),
        |  (5, CAST(0.07918124604762482 AS DOUBLE)),
        |  (6, CAST(0.06694678963061322 AS DOUBLE)),
        |  (7, CAST(0.05799194697768673 AS DOUBLE)),
        |  (8, CAST(0.05115252244738129 AS DOUBLE)),
        |  (9, CAST(0.04575749056067514 AS DOUBLE))) v(digit, p))
        |SELECT e.digit, CAST(coalesce(obs.n, 0) AS BIGINT) AS n,
        |  floor(CAST(coalesce(obs.n, 0) AS DOUBLE) / CAST(t AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS share,
        |  e.p AS expected_share,
        |  floor((CAST(coalesce(obs.n, 0) AS DOUBLE) - CAST(t AS DOUBLE) * e.p)
        |    * (CAST(coalesce(obs.n, 0) AS DOUBLE) - CAST(t AS DOUBLE) * e.p)
        |    / (CAST(t AS DOUBLE) * e.p) * 1000000 + 0.5) / 1000000 AS chi2_term
        |FROM exp_ e LEFT JOIN obs ON obs.digit = e.digit CROSS JOIN tot
        |ORDER BY e.digit""".stripMargin,


    "q157_label_vote" ->
      """WITH v AS (SELECT event_id % 997 AS item, event_type AS label
        |  FROM events),
        |c AS (SELECT item, label, count(label) AS c FROM v GROUP BY 1, 2),
        |r AS (SELECT item, label, c,
        |  row_number() OVER (PARTITION BY item
        |    ORDER BY c DESC, label ASC NULLS LAST) AS rn,
        |  sum(c) OVER (PARTITION BY item) AS tot,
        |  sum(CASE WHEN label IS NOT NULL THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY item) AS nl
        |  FROM c)
        |SELECT item, CAST(tot AS BIGINT) AS n_votes,
        |  CAST(nl AS BIGINT) AS n_labels, label, c AS label_votes,
        |  CASE WHEN tot > 0 THEN CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)
        |  END AS agreement
        |FROM r WHERE rn = 1 ORDER BY item""".stripMargin,


    // trailing-frame moments through DECIMAL sums (order-exact), then
    // the same single divides / sqrt / 1e-6 lattice as the engine
    "q158_rolling_anomaly" ->
      """WITH e AS (SELECT event_type AS key,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id AS id,
        |  CAST(value AS DOUBLE) AS v FROM events),
        |w AS (SELECT key, sec, id, v,
        |  CAST(sum(CAST(v AS DECIMAL(28,12))) OVER fr AS DOUBLE) AS s1,
        |  CAST(sum(CAST(v * v AS DECIMAL(28,12))) OVER fr AS DOUBLE) AS s2,
        |  count(v) OVER fr AS n
        |  FROM e WINDOW fr AS (PARTITION BY key ORDER BY sec, id
        |    ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING))
        |SELECT key, sec, id, v AS value, CAST(n AS BIGINT) AS n_base,
        |  floor(s1 / n * 1000000 + 0.5) / 1000000 AS mean,
        |  CASE WHEN (s2 - s1 * s1 / n) / n > 0
        |    THEN floor((v - s1 / n) / sqrt((s2 - s1 * s1 / n) / n)
        |      * 1000000 + 0.5) / 1000000
        |  END AS zscore
        |FROM w
        |WHERE n >= 30 AND v IS NOT NULL
        |  AND abs(v - s1 / n) > 3.0 * sqrt(greatest((s2 - s1 * s1 / n) / n, 0))
        |ORDER BY key, sec, id""".stripMargin,


    "q159_calibration" ->
      """WITH e AS (SELECT
        |  CAST(value AS DOUBLE) / 500.0 AS s,
        |  CASE WHEN (event_id * 7 + user_id) % 10 <
        |    floor(CAST(value AS DOUBLE) / 50.0) THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT CAST(least(greatest(floor(s * 10), 0), 9) AS BIGINT)
        |    AS bin, s, y FROM e),
        |g AS (SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
        |  CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE) AS ss
        |  FROM b GROUP BY 1),
        |r AS (SELECT bin, n, n_pos,
        |  floor(ss / n * 1000000 + 0.5) / 1000000 AS confidence,
        |  floor(CAST(n_pos AS DOUBLE) / n * 1000000 + 0.5) / 1000000
        |    AS accuracy
        |  FROM g)
        |SELECT bin, n, n_pos, confidence, accuracy,
        |  accuracy - confidence AS gap
        |FROM r ORDER BY bin""".stripMargin,


    // tie-aware Mann-Whitney AUC on an integer score lattice: exclusive
    // prefix counts over distinct-score groups give every member's
    // midrank; all-integer numerator, one IEEE divide at the end
    "q172_auc" ->
      """WITH e AS (SELECT
        |  CAST(floor(value * 100 + 0.5) AS BIGINT)
        |    + CASE WHEN event_type = 'purchase' THEN 5000 ELSE 0 END AS score,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g AS (SELECT score, CAST(sum(y) AS BIGINT) AS np,
        |  CAST(count(*) - sum(y) AS BIGINT) AS nn,
        |  CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |c AS (SELECT np, nn, n,
        |  CAST(coalesce(sum(n) OVER (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        |  FROM g),
        |s AS (SELECT CAST(sum(np * (2 * cb + n + 1)) AS BIGINT) AS s2,
        |  CAST(sum(np) AS BIGINT) AS npos, CAST(sum(nn) AS BIGINT) AS nneg,
        |  count(*) AS n_scores FROM c)
        |SELECT npos AS n_pos, nneg AS n_neg, n_scores,
        |  CASE WHEN npos > 0 AND nneg > 0 THEN
        |    floor(CAST(s2 - npos * (npos + 1) AS DOUBLE) /
        |      CAST(2 * npos * nneg AS DOUBLE) * 1000000 + 0.5) / 1000000
        |  END AS auc
        |FROM s""".stripMargin,


    // pairwise-form Fleiss kappa: agreeing-pair and total-pair counts
    // as exact integer sums over multi-vote items; label shares squared
    // from integer totals; one IEEE divide per ratio
    "q160_fleiss_kappa" ->
      """WITH v AS (SELECT event_id % 997 AS item, event_type AS label
        |  FROM events WHERE event_type IS NOT NULL),
        |c AS (SELECT item, label, count(*) AS c FROM v GROUP BY 1, 2),
        |pi AS (SELECT item, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(sum(c * (c - 1)) AS BIGINT) AS agree
        |  FROM c GROUP BY 1 HAVING sum(c) >= 2),
        |its AS (SELECT count(*) AS n_items, CAST(sum(n) AS BIGINT) AS n_votes,
        |  CAST(sum(agree) AS BIGINT) AS ag,
        |  CAST(sum(n * (n - 1)) AS BIGINT) AS pairs FROM pi),
        |ls AS (SELECT CAST(sum(t * t) AS BIGINT) AS t2,
        |  CAST(sum(t) AS BIGINT) AS tt FROM (
        |  SELECT c.label, CAST(sum(c.c) AS BIGINT) AS t
        |  FROM c JOIN pi ON c.item = pi.item GROUP BY 1))
        |SELECT n_items, n_votes,
        |  floor(CAST(ag AS DOUBLE) / CAST(pairs AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS po,
        |  floor(CAST(t2 AS DOUBLE) / (CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE))
        |    * 1000000 + 0.5) / 1000000 AS pe,
        |  CASE WHEN CAST(t2 AS DOUBLE) / (CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)) < 1.0
        |    THEN floor((CAST(ag AS DOUBLE) / CAST(pairs AS DOUBLE) -
        |      CAST(t2 AS DOUBLE) / (CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE))) /
        |      (1.0 - CAST(t2 AS DOUBLE) / (CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)))
        |      * 1000000 + 0.5) / 1000000
        |  END AS kappa
        |FROM its CROSS JOIN ls""".stripMargin,


    // q127's support-2 co-purchase edges symmetrized, then the three
    // LPA rounds unrolled — each an argmax-by-(count desc, label asc)
    // window, mirroring the engine's deterministic tie rule
    "q161_communities" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |e0 AS (SELECT x.p AS a, y.p AS b
        |  FROM items x JOIN items y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sym AS (SELECT a AS s, b AS d FROM e0
        |  UNION ALL SELECT b, a FROM e0),
        |l0 AS (SELECT DISTINCT s AS node, s AS label FROM sym),
        |c1 AS (SELECT m.d AS node, l.label, count(*) AS c
        |  FROM sym m JOIN l0 l ON m.s = l.node GROUP BY 1, 2),
        |l1 AS (SELECT node, label FROM (SELECT node, label,
        |  row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        |  FROM c1) WHERE rn = 1),
        |c2 AS (SELECT m.d AS node, l.label, count(*) AS c
        |  FROM sym m JOIN l1 l ON m.s = l.node GROUP BY 1, 2),
        |l2 AS (SELECT node, label FROM (SELECT node, label,
        |  row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        |  FROM c2) WHERE rn = 1),
        |c3 AS (SELECT m.d AS node, l.label, count(*) AS c
        |  FROM sym m JOIN l2 l ON m.s = l.node GROUP BY 1, 2),
        |l3 AS (SELECT node, label FROM (SELECT node, label,
        |  row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        |  FROM c3) WHERE rn = 1)
        |SELECT node, label AS community FROM l3 ORDER BY node""".stripMargin,


    // same capped-set discipline as the engine: sorted distinct tokens
    // truncated at 64 per doc, df and pair counts BOTH over the capped
    // sets; N*c*1e6 stays exactly representable, one IEEE divide
    "q162_token_lift" ->
      """WITH capd AS (SELECT doc_id,
        |  (list_sort(list_distinct(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))))[1:64]
        |    AS w
        |  FROM documents),
        |nn AS (SELECT count(*) AS n FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS t FROM capd),
        |dfr AS (SELECT t, count(*) AS df FROM tok GROUP BY 1),
        |pc AS (SELECT a.t AS ta, b.t AS tb, count(*) AS c
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT ta AS tok_a, tb AS tok_b, c AS n_pairs,
        |  da.df AS df_a, db.df AS df_b,
        |  floor(CAST(nn.n * pc.c AS DOUBLE) * 1000000.0 /
        |    CAST(da.df * db.df AS DOUBLE) + 0.5) / 1000000.0 AS lift
        |FROM pc JOIN dfr da ON pc.ta = da.t JOIN dfr db ON pc.tb = db.t
        |CROSS JOIN nn
        |ORDER BY lift DESC, tok_a, tok_b LIMIT 25""".stripMargin,


    // the naive global-window form the engine's two-pass plan must
    // reproduce exactly: exclusive prefix sum in (n_chars desc, doc_id)
    // order, integer-divided into 20k-char shards
    "q163_shard_plan" ->
      """SELECT doc_id, n_chars,
        |  CAST(coalesce(sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    // 20000 AS shard
        |FROM documents
        |ORDER BY n_chars DESC, doc_id""".stripMargin,


    "q164_admission_quota" ->
      """WITH v AS (SELECT event_type,
        |  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS epoch,
        |  row_number() OVER (PARTITION BY event_type,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT)
        |    ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT event_type, epoch,
        |  CAST(sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_admitted,
        |  CAST(sum(CASE WHEN rn <= 5 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_rejected
        |FROM v GROUP BY 1, 2 HAVING n_rejected > 0
        |ORDER BY event_type, epoch""".stripMargin,


    // two q69-style one-pass profiles (old = customer, new = the same
    // rows with the injected null wave / segment rename) joined per
    // column; lattice rates and IS DISTINCT FROM range movement mirror
    // the engine's null-safe comparisons
    "q165_profile_drift" -> {
      def prof(rel: String, c: String, num: Boolean) = {
        val minNum = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val maxNum = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val minStr = if (num) "CAST(NULL AS VARCHAR)" else s"CAST(min($c) AS VARCHAR)"
        val maxStr = if (num) "CAST(NULL AS VARCHAR)" else s"CAST(max($c) AS VARCHAR)"
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  $minNum AS min_num, $maxNum AS max_num,
           |  $minStr AS min_str, $maxStr AS max_str
           |FROM $rel""".stripMargin
      }
      val colsSpec = Seq(("c_custkey", true), ("c_acctbal", true),
        ("c_mktsegment", false), ("c_nationkey", true))
      val newRel = """(SELECT c_custkey,
        |  CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_custkey % 17 = 0 THEN 'SEGMENT_X' ELSE c_mktsegment END
        |    AS c_mktsegment,
        |  c_nationkey FROM customer)""".stripMargin
      val po = colsSpec.map { case (c, n) => prof("customer", c, n) }
        .mkString("\nUNION ALL\n")
      val pn = colsSpec.map { case (c, n) => prof(newRel, c, n) }
        .mkString("\nUNION ALL\n")
      val r6o = "floor(CAST(po.n_nulls AS DOUBLE) / po.n_rows * 1000000 + 0.5) / 1000000"
      val r6n = "floor(CAST(pn.n_nulls AS DOUBLE) / pn.n_rows * 1000000 + 0.5) / 1000000"
      s"""WITH po AS ($po), pn AS ($pn)
         |SELECT po."column" AS "column",
         |  po.n_rows AS old_n_rows, pn.n_rows AS new_n_rows,
         |  po.n_nulls AS old_n_nulls, pn.n_nulls AS new_n_nulls,
         |  CASE WHEN po.n_rows > 0 THEN $r6o END AS old_null_rate,
         |  CASE WHEN pn.n_rows > 0 THEN $r6n END AS new_null_rate,
         |  (CASE WHEN pn.n_rows > 0 THEN $r6n END) -
         |    (CASE WHEN po.n_rows > 0 THEN $r6o END) AS null_rate_delta,
         |  po.n_distinct AS old_n_distinct, pn.n_distinct AS new_n_distinct,
         |  CASE WHEN po.n_distinct > 0 THEN
         |    floor(CAST(pn.n_distinct AS DOUBLE) / po.n_distinct * 1000000 + 0.5)
         |      / 1000000 END AS distinct_ratio,
         |  (po.min_num IS DISTINCT FROM pn.min_num OR
         |   po.max_num IS DISTINCT FROM pn.max_num OR
         |   po.min_str IS DISTINCT FROM pn.min_str OR
         |   po.max_str IS DISTINCT FROM pn.max_str) AS range_moved
         |FROM po JOIN pn ON po."column" = pn."column"
         |ORDER BY "column"""".stripMargin
    },


    // ground truth = exact Jaccard over ALL shingle-sharing pairs (any
    // shared shingle is a candidate — supersets the banded candidates);
    // found = the q25 banded pipeline's verified pairs; exact counts +
    // one lattice divide
    // the cand (banded candidates) and pairs (verified) CTEs are the
    // shared minhash chain — precision is their count ratio
    "q246_banding_precision" -> (minhashPairsCtes +
      """
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
        |  (SELECT CAST(count(*) AS BIGINT) FROM pairs WHERE j >= 0.6)
        |    AS n_verified,
        |  floor(CAST((SELECT count(*) FROM pairs WHERE j >= 0.6) AS DOUBLE) /
        |    CAST((SELECT count(*) FROM cand) AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS precision""".stripMargin),

    "q166_sketch_recall" -> (minhashPairsCtes +
      """,
        |te AS (SELECT doc_id, unnest(hs) AS h FROM hsh),
        |tc AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM te a JOIN te b ON a.h = b.h AND a.doc_id < b.doc_id),
        |tp AS (SELECT tc.id_a, tc.id_b,
        |  CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
        |  CAST(len(list_distinct(list_concat(sa.hs, sb.hs))) AS DOUBLE) AS j
        |  FROM tc
        |  JOIN hsh sa ON sa.doc_id = tc.id_a
        |  JOIN hsh sb ON sb.doc_id = tc.id_b),
        |tr AS (SELECT id_a, id_b FROM tp WHERE j >= 0.6),
        |ap AS (SELECT id_a, id_b FROM pairs WHERE j >= 0.6),
        |ms AS (SELECT count(*) AS n_missed FROM tr
        |  ANTI JOIN ap ON tr.id_a = ap.id_a AND tr.id_b = ap.id_b)
        |SELECT CAST((SELECT count(*) FROM tr) AS BIGINT) AS n_true,
        |  CAST((SELECT count(*) FROM ap) AS BIGINT) AS n_found,
        |  CAST(ms.n_missed AS BIGINT) AS n_missed,
        |  floor(CAST((SELECT count(*) FROM tr) - ms.n_missed AS DOUBLE) /
        |    CAST((SELECT count(*) FROM tr) AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS recall
        |FROM ms""".stripMargin),


    "q167_vocab_cutoff" ->
      """WITH tok AS (SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS n_occ FROM tok
        |  WHERE token != '' GROUP BY 1),
        |r AS (SELECT token, n_occ,
        |  row_number() OVER (ORDER BY n_occ DESC, token) - 1 AS rank,
        |  CAST(coalesce(sum(n_occ) OVER (ORDER BY n_occ DESC, token
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS cum_before
        |  FROM c),
        |t AS (SELECT CAST(sum(n_occ) AS BIGINT) AS total FROM c)
        |SELECT rank, token, n_occ, cum_before
        |FROM r CROSS JOIN t
        |WHERE cum_before < (90 * total + 99) // 100
        |ORDER BY rank""".stripMargin,


    // the same three ranked windows over one key partitioning; ages
    // from each key's own newest day/week; precedence last>daily>weekly
    "q168_retention_plan" ->
      """WITH v AS (SELECT event_type, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |w AS (SELECT event_type, event_id, sec,
        |  sec // 86400 AS day, sec // 604800 AS week,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY sec DESC, event_id DESC) AS rnk,
        |  row_number() OVER (PARTITION BY event_type, sec // 86400
        |    ORDER BY sec DESC, event_id DESC) AS drnk,
        |  row_number() OVER (PARTITION BY event_type, sec // 604800
        |    ORDER BY sec DESC, event_id DESC) AS wrnk,
        |  max(sec // 86400) OVER (PARTITION BY event_type) AS maxd,
        |  max(sec // 604800) OVER (PARTITION BY event_type) AS maxw
        |  FROM v),
        |f AS (SELECT event_type, event_id, sec,
        |  rnk <= 10 AS is_last,
        |  (drnk = 1 AND day > maxd - 7) AS is_daily,
        |  (wrnk = 1 AND week > maxw - 4) AS is_weekly
        |  FROM w)
        |SELECT event_type, event_id, sec,
        |  (is_last OR is_daily OR is_weekly) AS keep,
        |  CASE WHEN is_last THEN 'last' WHEN is_daily THEN 'daily'
        |       WHEN is_weekly THEN 'weekly' END AS reason
        |FROM f WHERE is_last OR is_daily OR is_weekly
        |ORDER BY event_type, sec, event_id""".stripMargin,


    // the q56 recursive-CTE clustering run at each cutoff over the
    // same verified pair set; thresholds compare on the 1e-4 lattice
    // exactly as the engine's emitted jaccard does
    "q170_dedup_sensitivity" -> {
      def block(t: String, tag: String) =
        s"""e$tag AS (SELECT id_a AS x, id_b AS y FROM lp WHERE jl >= $t
           |      UNION ALL SELECT id_b, id_a FROM lp WHERE jl >= $t),
           |reach$tag(node, label) AS (
           |  SELECT x, x FROM e$tag
           |  UNION
           |  SELECT e2.x, r.label FROM e$tag e2 JOIN reach$tag r ON e2.y = r.node),
           |comp$tag AS (SELECT node, min(label) AS lab
           |  FROM reach$tag GROUP BY node),
           |sum$tag AS (SELECT CAST($t AS DOUBLE) AS threshold,
           |  (SELECT count(*) FROM lp WHERE jl >= $t) AS n_pairs,
           |  (SELECT count(*) FROM comp$tag) AS n_docs,
           |  (SELECT count(DISTINCT lab) FROM comp$tag) AS n_clusters,
           |  (SELECT max(c) FROM (SELECT count(*) AS c FROM comp$tag
           |    GROUP BY lab)) AS largest)""".stripMargin
      minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
        ",\nlp AS (SELECT id_a, id_b, floor(j * 10000 + 0.5) / 10000 AS jl\n" +
        "  FROM pairs WHERE j >= 0.6),\n" +
        Seq("0.6" -> "a", "0.95" -> "b", "0.99" -> "c")
          .map((block _).tupled).mkString(",\n") + "\n" +
        """SELECT * FROM suma UNION ALL SELECT * FROM sumb
          |UNION ALL SELECT * FROM sumc ORDER BY threshold""".stripMargin
    },


    // identical cell pipeline: integer marginals, E = rt*ct/N one
    // divide per cell, 1e-6 lattice terms, DECIMAL-summed statistic
    "q169_chi_square" ->
      """WITH src AS (SELECT CAST(least(greatest(
        |    floor((CAST(l_extendedprice AS DOUBLE) - 0.0) / 80000.0 * 8),
        |    0), 7) AS BIGINT) AS bin,
        |  CAST(l_returnflag AS VARCHAR) AS y
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
        |cells AS (SELECT bin, y, count(*) AS o FROM src GROUP BY 1, 2),
        |rt AS (SELECT bin, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT y, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |terms AS (SELECT cells.bin, cells.y, cells.o,
        |  floor((CAST(cells.o AS DOUBLE) -
        |      CAST(rt.rt * ct.ct AS DOUBLE) / nn.n) *
        |    (CAST(cells.o AS DOUBLE) -
        |      CAST(rt.rt * ct.ct AS DOUBLE) / nn.n) /
        |    (CAST(rt.rt * ct.ct AS DOUBLE) / nn.n) * 1000000 + 0.5)
        |    / 1000000 AS term
        |  FROM cells JOIN rt ON cells.bin = rt.bin
        |  JOIN ct ON cells.y = ct.y CROSS JOIN nn),
        |agg AS (SELECT count(*) AS n_cells,
        |  count(DISTINCT bin) AS n_bins, count(DISTINCT y) AS n_labels,
        |  CAST(sum(o) AS BIGINT) AS n_rows,
        |  (count(DISTINCT bin) - 1) * (count(DISTINCT y) - 1) AS dof,
        |  floor(CAST(sum(CAST(term AS DECIMAL(28,12))) AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS chi2
        |FROM terms)
        |SELECT n_cells, n_bins, n_labels, n_rows, dof, chi2,
        |  floor(sqrt(chi2 / CAST(n_rows * least(n_bins - 1, n_labels - 1)
        |    AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS cramers_v
        |FROM agg""".stripMargin,

    // DuckDB's NATIVE recursive CTE is the oracle: same forest
    // (parent(k) = k/3 above the roots 0..10), walked one level at a
    // time — a wrong doubling composition (off-by-one depths, skipped
    // generations, dropped nodes) cannot match it.
    "q213_org_rollup" ->
      """WITH RECURSIVE walk(node, root, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey <= 10
        |  UNION ALL
        |  SELECT c.c_custkey, w.root, w.depth + 1
        |  FROM customer c JOIN walk w
        |    ON CAST(floor(c.c_custkey / 3.0) AS BIGINT) = w.node
        |  WHERE c.c_custkey > 10)
        |SELECT w.root AS root, count(*) AS n_nodes,
        |  CAST(max(w.depth) AS BIGINT) AS max_depth,
        |  floor(CAST(sum(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
        |    * 100 + 0.5) / 100 AS total_bal
        |FROM walk w JOIN customer c ON c.c_custkey = w.node
        |GROUP BY w.root ORDER BY root""".stripMargin,

    "q214_depth_profile" ->
      """WITH RECURSIVE walk(node, depth, root) AS (
        |  SELECT c_custkey, 0, c_custkey FROM customer WHERE c_custkey <= 10
        |  UNION ALL
        |  SELECT c.c_custkey, w.depth + 1, w.root
        |  FROM customer c JOIN walk w
        |    ON CAST(floor(c.c_custkey / 3.0) AS BIGINT) = w.node
        |  WHERE c.c_custkey > 10),
        |parents AS (
        |  SELECT DISTINCT CAST(floor(c_custkey / 3.0) AS BIGINT) AS pnode
        |  FROM customer WHERE c_custkey > 10)
        |SELECT w.depth AS depth, count(*) AS n_nodes,
        |  CAST(sum(CASE WHEN p.pnode IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_leaves,
        |  count(DISTINCT w.root) AS n_roots
        |FROM walk w LEFT JOIN parents p ON w.node = p.pnode
        |GROUP BY w.depth ORDER BY depth""".stripMargin,

    // the oracle predicts the variant-shred report from the raw columns:
    // serialize -> parse -> extract must be value-preserving end to end
    "q215_variant_shred" ->
      """SELECT o_orderpriority AS priority, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(o_orderkey % 11) AS BIGINT) AS sum_m11,
        |  CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flag,
        |  count(*) AS n_missing
        |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin,

    // VP8X canvas is stored minus-one (no +1 on the stored value);
    // VP8L packs w-1/h-1; lossy VP8 stores dims directly — the CASE arms
    // mirror each layout's encoding exactly
    "q218_webp_headers" ->
      """SELECT doc_id, 'image/webp' AS detected_mime,
        |  CASE doc_id % 4
        |    WHEN 0 THEN CAST(doc_id % 300 + 1 AS INTEGER)
        |    WHEN 1 THEN CAST(doc_id % 1000 + 1 AS INTEGER)
        |    WHEN 2 THEN CAST(doc_id % 1000 + 1 AS INTEGER)
        |    ELSE NULL END AS width,
        |  CASE doc_id % 4
        |    WHEN 0 THEN CAST(doc_id % 200 + 1 AS INTEGER)
        |    WHEN 1 THEN CAST(doc_id % 700 + 1 AS INTEGER)
        |    WHEN 2 THEN CAST(doc_id % 600 + 1 AS INTEGER)
        |    ELSE NULL END AS height,
        |  CAST(CASE doc_id % 4 WHEN 1 THEN 25 WHEN 3 THEN 16
        |    ELSE 30 END AS BIGINT) AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the oracle brute-forces the TRANSITIVE CLOSURE both ways and
    // takes the minimum of each node's mutually-reachable set — any
    // wrong merge or split in the distributed refinement mismatches
    "q222_scc" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS n FROM customer
        |  WHERE c_custkey < 100),
        |edges AS (
        |  SELECT n AS s, (n - n % 10) + ((n + 1) % 10) AS d FROM nodes
        |  UNION ALL
        |  SELECT n, ((n // 10) * 2 + 1) * 10 FROM nodes
        |  WHERE n % 10 = 0 AND (n // 10) * 2 + 1 < 10
        |  UNION ALL
        |  SELECT n, ((n // 10) * 3 + 2) * 10 FROM nodes
        |  WHERE n % 10 = 0 AND (n // 10) * 3 + 2 < 10),
        |reach(s, d) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
        |scc AS (
        |  SELECT a.s AS u, min(a.d) AS m
        |  FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
        |  GROUP BY a.s)
        |SELECT n AS node, least(n, coalesce(m, n)) AS scc
        |FROM nodes LEFT JOIN scc ON n = u ORDER BY node""".stripMargin,

    // membership from the recomputed MinHash pairs; then the identical
    // binned symmetric drift arithmetic as q124
    "q234_dup_length_bias" -> (minhashPairsCtes +
      """,
        |members AS (
        |  SELECT DISTINCT id_a % 10000 AS doc_id FROM pairs WHERE j >= 0.6
        |  UNION
        |  SELECT DISTINCT id_b % 10000 FROM pairs WHERE j >= 0.6),
        |a AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id IN (SELECT doc_id FROM members) AND n_chars IS NOT NULL),
        |b AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_id FROM members) AND n_chars IS NOT NULL),
        |ca AS (SELECT CAST(least(greatest(
        |    floor((v - 0.0) / 1200.0 * 24), 0), 23) AS BIGINT) AS bin,
        |  COUNT(*) AS cnt_a FROM a GROUP BY 1),
        |cb AS (SELECT CAST(least(greatest(
        |    floor((v - 0.0) / 1200.0 * 24), 0), 23) AS BIGINT) AS bin,
        |  COUNT(*) AS cnt_b FROM b GROUP BY 1),
        |tot AS (SELECT (SELECT COUNT(*) FROM a) AS n_a,
        |               (SELECT COUNT(*) FROM b) AS n_b),
        |jj AS (SELECT COALESCE(ca.bin, cb.bin) AS bin,
        |  COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
        |  FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin),
        |rates AS (SELECT bin, cnt_a, cnt_b,
        |  CAST(cnt_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p,
        |  CAST(cnt_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS q
        |  FROM jj CROSS JOIN tot)
        |SELECT bin, cnt_a, cnt_b,
        |  CAST(floor(CASE WHEN cnt_a + cnt_b = 0 THEN 0.0
        |    ELSE (p - q) * (p - q) / (p + q) END * 1e12 + 0.5) AS BIGINT)
        |    AS drift12
        |FROM rates ORDER BY bin""".stripMargin),

    // generate_series builds the same expected calendar; the short
    // threshold compares against the identical interpolated median
    "q233_backfill_plan" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_id FROM events),
        |kept AS (SELECT day, event_id FROM ev
        |  WHERE day(day) % 7 != 3
        |    AND (day(day) % 5 != 0 OR event_id % 4 = 0)),
        |daily AS (SELECT day, count(*) AS cnt FROM kept GROUP BY day),
        |med AS (SELECT quantile_cont(cnt, 0.5) AS med FROM daily),
        |cal AS (SELECT unnest(generate_series(
        |    (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
        |    INTERVAL 1 DAY)) AS day)
        |SELECT CAST(cal.day AS DATE) AS day,
        |  CAST(coalesce(daily.cnt, 0) AS BIGINT) AS cnt,
        |  CASE WHEN daily.cnt IS NULL THEN 'missing'
        |       WHEN daily.cnt * 2 < med.med THEN 'short'
        |       ELSE 'ok' END AS status
        |FROM cal LEFT JOIN daily ON cal.day = daily.day CROSS JOIN med
        |ORDER BY day""".stripMargin,

    // the oracle recomputes the full MinHash pipeline, then attributes
    // pairs to unordered source cells exactly like the engine
    "q232_source_overlap" -> (minhashPairsCtes +
      """,
        |attr AS (SELECT
        |  least(da.source, db.source) AS source_x,
        |  greatest(da.source, db.source) AS source_y,
        |  da.n_chars + db.n_chars AS pair_chars
        |  FROM pairs
        |  JOIN documents da ON da.doc_id = pairs.id_a % 10000
        |  JOIN documents db ON db.doc_id = pairs.id_b % 10000
        |  WHERE pairs.j >= 0.6)
        |SELECT source_x, source_y, count(*) AS n_pairs,
        |  CAST(sum(pair_chars) AS BIGINT) AS dup_chars
        |FROM attr GROUP BY 1, 2 ORDER BY source_x, source_y""".stripMargin),

    // same running-max islands in SQL; covered_sec is exact interval
    // arithmetic, never a per-second expansion
    "q230_interval_merge" ->
      """WITH iv AS (SELECT user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |  CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
        |  FROM events WHERE user_id % 5 = 0),
        |marked AS (SELECT user_id, s, e,
        |  CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |    OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |  THEN 1 ELSE 0 END AS ni
        |  FROM iv),
        |isl AS (SELECT user_id, s, e,
        |  sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM marked),
        |spans AS (SELECT user_id, island, min(s) AS ss, max(e) AS ee
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_spans,
        |  CAST(sum(ee - ss) AS BIGINT) AS covered_sec,
        |  CAST(max(ee - ss) AS BIGINT) AS max_span_sec
        |FROM spans GROUP BY 1 ORDER BY user_id""".stripMargin,

    // the time gate (e.t >= w.arr) inside the recursive step is what
    // separates temporal from plain reachability
    "q229_temporal_reach" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS n FROM customer
        |  WHERE c_custkey < 100),
        |edges AS (
        |  SELECT s, d, (s * 7 + d) % 32 AS t FROM (
        |    SELECT n AS s, (n - n % 10) + ((n + 1) % 10) AS d FROM nodes
        |    UNION ALL
        |    SELECT n, ((n // 10) * 2 + 1) * 10 FROM nodes
        |    WHERE n % 10 = 0 AND (n // 10) * 2 + 1 < 10
        |    UNION ALL
        |    SELECT n, ((n // 10) * 3 + 2) * 10 FROM nodes
        |    WHERE n % 10 = 0 AND (n // 10) * 3 + 2 < 10)),
        |walk(node, arr, hops) AS (
        |  SELECT n, CAST(0 AS BIGINT), 0 FROM nodes WHERE n < 10
        |  UNION
        |  SELECT e.d, e.t, w.hops + 1
        |  FROM walk w JOIN edges e ON w.node = e.s
        |  WHERE e.t >= w.arr AND w.hops < 12)
        |SELECT node, CAST(min(arr) AS BIGINT) AS arrival
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,

    // bounded recursive walk over (cost, hops) pairs — hops caps the
    // recursion, min(cost) per node is the Bellman-Ford answer over
    // paths of at most 16 edges
    "q226_weighted_paths" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS n FROM customer
        |  WHERE c_custkey < 100),
        |edges AS (
        |  SELECT s, d, s % 5 + d % 3 + 1 AS w FROM (
        |    SELECT n AS s, (n - n % 10) + ((n + 1) % 10) AS d FROM nodes
        |    UNION ALL
        |    SELECT n, ((n // 10) * 2 + 1) * 10 FROM nodes
        |    WHERE n % 10 = 0 AND (n // 10) * 2 + 1 < 10
        |    UNION ALL
        |    SELECT n, ((n // 10) * 3 + 2) * 10 FROM nodes
        |    WHERE n % 10 = 0 AND (n // 10) * 3 + 2 < 10)),
        |walk(node, cost, hops) AS (
        |  SELECT n, CAST(0 AS BIGINT), 0 FROM nodes WHERE n < 10
        |  UNION
        |  SELECT e.d, w.cost + e.w, w.hops + 1
        |  FROM walk w JOIN edges e ON w.node = e.s WHERE w.hops < 16)
        |SELECT node, CAST(min(cost) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,

    // bounded recursive walk, min hop count per reached node — the
    // WHERE d < 12 bound makes the cycle-bearing recursion finite
    "q224_hop_distances" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS n FROM customer
        |  WHERE c_custkey < 100),
        |edges AS (
        |  SELECT n AS s, (n - n % 10) + ((n + 1) % 10) AS d FROM nodes
        |  UNION ALL
        |  SELECT n, ((n // 10) * 2 + 1) * 10 FROM nodes
        |  WHERE n % 10 = 0 AND (n // 10) * 2 + 1 < 10
        |  UNION ALL
        |  SELECT n, ((n // 10) * 3 + 2) * 10 FROM nodes
        |  WHERE n % 10 = 0 AND (n // 10) * 3 + 2 < 10),
        |walk(node, hops) AS (
        |  SELECT n, 0 FROM nodes WHERE n < 10
        |  UNION
        |  SELECT e.d, w.hops + 1 FROM walk w JOIN edges e ON w.node = e.s
        |  WHERE w.hops < 12)
        |SELECT node, CAST(min(hops) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,

    // the oracle REBUILDS from the post-change table; the engine
    // retracts additively and key-prunes the extrema rescan —
    // increment must equal rebuild exactly
    "q219_retract_rollup" ->
      """WITH e AS (SELECT user_id, event_id, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE user_id % 20 = 0),
        |after AS (
        |  SELECT user_id, v FROM e WHERE event_id % 7 != 0
        |  UNION ALL
        |  SELECT user_id, v * 2 AS v FROM e WHERE event_id % 11 = 0),
        |m AS (SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(v * v AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |  min(v) AS min_value, max(v) AS max_value
        |  FROM after GROUP BY 1)
        |SELECT user_id, n,
        |  floor(s1 * 1000000 + 0.5) / 1000000 AS sum_value,
        |  floor(s1 / n * 1000000 + 0.5) / 1000000 AS avg_value,
        |  floor((s2 - s1 * s1 / n) / n * 1000000 + 0.5) / 1000000 AS var_value,
        |  min_value, max_value
        |FROM m ORDER BY user_id""".stripMargin,

    // full-block entry sizes make the layout arithmetic exact: class 0 =
    // hdr+s1+hdr+s2+two zero blocks, class 1 = hdr+s1 (clean EOF),
    // class 2 = truncated (header declares 1024, carries 512) -> NULLs
    "q220_tar_census" ->
      """WITH d AS (SELECT doc_id,
        |  (doc_id % 5 + 1) * 512 AS s1, (doc_id % 4 + 1) * 512 AS s2
        |  FROM documents)
        |SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 1
        |    ELSE NULL END AS n_entries,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN s1 + s2 WHEN 1 THEN s1
        |    ELSE NULL END AS BIGINT) AS bytes_total,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 512 + s1 + 512 + s2 + 1024
        |    WHEN 1 THEN 512 + s1 ELSE 1024 END AS BIGINT) AS byte_len
        |FROM d ORDER BY doc_id""".stripMargin,

  )
}
