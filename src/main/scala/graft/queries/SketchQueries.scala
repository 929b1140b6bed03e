package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Checksums
import graft.operators.{Sketches, TextAnalysis}

import QueryShared._

/** Portable-sketch queries: cardinality and overlap estimation whose
  * sketches an external SQL engine rebuilds bit-for-bit (md5-based
  * hashing + integer register/rank math — no engine-internal state,
  * no libm transcendentals on the oracle path). */
private[graft] object SketchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- mergeable HLL distinct-count sketch -----------------------
    "q146_hll_distinct" -> ((s, dir) => {
      // distinct orders per return flag via the 256-register portable
      // HLL aggregate (graft.functions.HllRegisters): ONE ordinary
      // partial-aggregated pass, 256 bytes of state per group — vs the
      // one-shuffle-row-per-distinct-value COUNT(DISTINCT) plan. The
      // ALL row is built by MERGING the per-flag register arrays
      // (element-wise max), not by rescanning — the persisted-sketch
      // rollup pattern; exact counts ride along to show the error.
      val li = rd(s, dir, "lineitem").select(col("l_returnflag").as("flag"),
        col("l_orderkey").cast("string").as("okey"))
      val per = li.groupBy("flag").agg(
        Sketches.hllRegisters(col("okey")).as("regs"),
        countDistinct(col("okey")).as("n_exact"))
      val perOut = per.select(col("flag"), col("n_exact"),
        Sketches.hllEstimate("regs").as("n_est"))
      val allOut = li.agg(countDistinct(col("okey")).as("n_exact"))
        .crossJoin(Sketches.hllMergeAll(per.select("regs"), "regs"))
        .select(lit("ALL").as("flag"), col("n_exact"),
          Sketches.hllEstimate("regs").as("n_est"))
      perOut.unionByName(allOut).orderBy("flag")
    }),


    // ----- sliding-window distinct from per-day HLL sketches ---------
    "q189_sliding_hll" -> ((s, dir) => {
      // distinct active user-hours per TRAILING 7-day window, answered
      // entirely from per-day mergeable sketches: raw events are touched
      // once (one partial-aggregated pass to 30 day-sketches of 256
      // registers); every window is a register-max rollup over the
      // sketch frame (hllTrailingMerge). At 100 TB this is THE shape —
      // a year of persisted daily sketches answers any trailing window
      // without rescanning; the exact countDistinct rides along as the
      // error audit. Only full-coverage windows (day >= min+6) are
      // emitted, which also keeps every estimate on the raw-formula
      // branch (the small-range ln correction differs in the last ulp
      // across libms — see hllEstimate's parity note).
      val ev = rd(s, dir, "events").select(
        floor(col("ts").cast("long") / lit(86400.0)).cast("long").as("day"),
        concat(col("user_id").cast("string"), lit(":"),
          hour(col("ts")).cast("string")).as("uh"))
      val per = ev.groupBy("day").agg(
        Sketches.hllRegisters(col("uh")).as("regs"))
      val minDay = ev.agg(min(col("day")).as("_d0"))
      val fullDays = per.select("day").crossJoin(broadcast(minDay))
        .filter(col("day") >= col("_d0") + 6).select("day")
      val slid = Sketches.hllTrailingMerge(per, fullDays, "day", "regs", 7)
      val exact = ev.distinct().as("e")
        .join(broadcast(fullDays.select(col("day").as("_wd"))),
          col("e.day") > col("_wd") - 7 && col("e.day") <= col("_wd"))
        .groupBy(col("_wd").as("day"))
        .agg(countDistinct(col("uh")).as("n_exact"))
      slid.select(col("day"), Sketches.hllEstimate("regs").as("n_est"))
        .join(exact, "day")
        .select("day", "n_exact", "n_est")
        .orderBy("day")
    }),


    // ----- incrementally-maintained sketch table ---------------------
    "q200_sliding_hll_incremental" -> ((s, dir) => {
      // the persisted-sketch-table upkeep pattern: per-day register
      // sketches for the first 25 days are MATERIALIZED once
      // (content-fingerprint-keyed, the q30/q80 build-once
      // discipline); an ingest of the remaining days sketches ONLY its
      // own days and unions with the stored table — history is never
      // rescanned. Trailing-window estimates over the merged table
      // must equal q189's from-scratch rebuild bit-for-bit (the oracle
      // IS q189's), proving increment ≡ rebuild for the sketch path
      val ev = rd(s, dir, "events").select(
        floor(col("ts").cast("long") / lit(86400.0)).cast("long").as("day"),
        concat(col("user_id").cast("string"), lit(":"),
          hour(col("ts")).cast("string")).as("uh"))
      val d0 = ev.agg(min(col("day"))).collect()(0).getLong(0)
      val cut = d0 + 25
      val basePath = cachedIndexPath(s, dir, "graft_hll_days", "events",
        "k256_uh_cut25") { p =>
        ev.filter(col("day") < cut).groupBy("day")
          .agg(Sketches.hllRegisters(col("uh")).as("regs"))
          .write.mode("overwrite").parquet(p)
      }
      val per = s.read.parquet(basePath)
        .unionByName(ev.filter(col("day") >= cut).groupBy("day")
          .agg(Sketches.hllRegisters(col("uh")).as("regs")))
      val fullDays = per.select("day")
        .filter(col("day") >= d0 + 6)
      val slid = Sketches.hllTrailingMerge(per, fullDays, "day", "regs", 7)
      // the exact verification side WITHOUT the 7x event replication +
      // re-dedup a range-join formulation pays: over the distinct
      // (day, uh) pairs, uh counts in window w iff `day` is uh's LATEST
      // active day <= w inside (w-7, w] — i.e. for w in
      // [day, min(day+6, next_day - 1)], next_day from ONE lead() over
      // uh's day sequence. Exploding <= 7 WINDOW IDS per pair (never
      // event rows) and taking a PLAIN count per window yields the same
      // exact numbers as countDistinct over the replicated frame, for
      // one key exchange + one count aggregation.
      val wnd = org.apache.spark.sql.expressions.Window
        .partitionBy("uh").orderBy("day")
      val exact = ev.distinct()
        .withColumn("_nd", lead(col("day"), 1).over(wnd))
        .select(col("uh"), explode(sequence(col("day"),
          least(col("day") + 6, coalesce(col("_nd") - 1, col("day") + 6))))
          .as("day"))
        .join(broadcast(fullDays), Seq("day"), "left_semi")
        .groupBy("day").agg(count(lit(1)).as("n_exact"))
      slid.select(col("day"), Sketches.hllEstimate("regs").as("n_est"))
        .join(exact, "day")
        .select("day", "n_exact", "n_est")
        .orderBy("day")
    }),


    // ----- bloom-filter sizing advisor (measured, not guessed) -------
    "q212_bloom_advisor" -> ((s, dir) => {
      // size the q84/q92 bloom gates from MEASURED cardinality: each
      // key column's distinct count comes from the portable HLL
      // sketch (one partial-aggregated pass, never COUNT DISTINCT at
      // scale), then the fpp ladder folds through hardcoded
      // bits-per-element literals (−ln p / ln²2 — compile-time
      // constants, no libm on data): bits = ceil(ndv·bpe), k hashes
      // from the same ladder, memory in KiB by integer division
      val ladder = Seq(("fpp_1pct", 9.585058445182247, 7),
        ("fpp_01pct", 14.37758766777337, 10))
      def advise(tbl: String, colName: String): DataFrame = {
        val ndv = rd(s, dir, tbl)
          .agg(Sketches.hllRegisters(col(colName).cast("string")).as("regs"))
          .select(Sketches.hllEstimate("regs").as("ndv_est"))
        ndv.select(lit(s"$tbl.$colName").as("key_col"), col("ndv_est"),
          explode(array(ladder.map { case (name, bpe, k) =>
            struct(lit(name).as("fpp"),
              ceil(col("ndv_est").cast("double") * lit(bpe)).cast("long")
                .as("bits"), lit(k).as("k_hashes"))
          }: _*)).as("e"))
          .select(col("key_col"), col("e.fpp").as("fpp"), col("ndv_est"),
            col("e.bits").as("bits"), col("e.k_hashes").as("k_hashes"),
            expr("CAST(e.bits div 8192 AS BIGINT)").as("kib"))
      }
      advise("events", "event_id")
        .unionByName(advise("lineitem", "l_orderkey"))
        .orderBy("key_col", "fpp")
    }),


    // ----- count-min heavy-hitter frequencies ------------------------
    "q148_cms_frequencies" -> ((s, dir) => {
      // token frequencies of the corpus-wide top-15 tokens, estimated
      // from a merged count-min sketch (4x2048 cells): per-source CMS
      // built in ONE partial-aggregated pass each, merged cell-wise
      // (the mergeable-counter artifact — per-source daily sketches
      // answer global frequency questions without re-scanning text);
      // exact counts ride along to show the one-sided error (est >=
      // exact always; equal here because 2048 cells >> top-token mass)
      val toks = rd(s, dir, "documents")
        .select(col("source").as("g"),
          explode(split(TextAnalysis.normText(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val merged = Sketches.cmsMergeAll(
        Sketches.cmsSketch(toks, "g", "tok", d = 4, w = 2048))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok")).limit(15)
      Sketches.cmsEstimate(merged, top, "tok", d = 4, w = 2048)
        .join(top, "tok")
        .select(col("tok"), col("n_exact"), col("n_est"))
        .orderBy(col("n_exact").desc, col("tok"))
    }),

    // ----- KMV pairwise vocabulary overlap ---------------------------
    "q147_kmv_overlap" -> ((s, dir) => {
      // estimated token-vocabulary overlap between every source PAIR
      // from per-source bottom-128 KMV sketches: raw text is tokenized
      // ONCE per source; all 190 pairwise union/Jaccard/intersection
      // estimates happen in sketch space (20x128 rows) — the pairwise
      // corpus-overlap matrix without 190 corpus joins
      val toks = rd(s, dir, "documents")
        .select(col("source").as("g"),
          explode(split(TextAnalysis.normText(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .select(col("g"), Checksums.md5PrefixLong(col("tok")).as("h"))
      val sk = Sketches.kmvSketches(toks, "g", "h", 128)
      Sketches.kmvPairwiseOverlap(sk, 128)
        .orderBy(col("jaccard_est").desc, col("ga"), col("gb"))
        .limit(25)
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q146_hll_distinct" ->
      """WITH h AS (SELECT l_returnflag AS flag, CAST(l_orderkey AS VARCHAR) AS okey,
        |  CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM lineitem),
        |b AS (SELECT flag, okey, hv % 256 AS bucket,
        |  CASE WHEN hv // 256 = 0 THEN 53 ELSE 53 - length(bin(hv // 256)) END AS rho
        |  FROM h),
        |regs AS (SELECT flag, bucket, max(rho) AS m FROM b GROUP BY 1, 2),
        |d AS (SELECT flag, count(*) AS nz,
        |  sum(1::BIGINT << (53 - m)) AS sden FROM regs GROUP BY 1),
        |e AS (SELECT flag, 256 - nz AS v,
        |  CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)
        |    * 65536.0 * 9007199254740992.0
        |    / CAST((256 - nz) * 9007199254740992 + sden AS DOUBLE) AS raw FROM d),
        |est AS (SELECT flag,
        |  CASE WHEN v > 0 AND raw <= 640.0 THEN 256.0 * ln(256.0 / v) ELSE raw END AS ev
        |  FROM e),
        |ex AS (SELECT flag, count(DISTINCT okey) AS n_exact FROM b GROUP BY 1),
        |ga AS (SELECT 'ALL' AS flag, bucket, max(rho) AS m FROM b GROUP BY 1, 2),
        |gd AS (SELECT flag, count(*) AS nz,
        |  sum(1::BIGINT << (53 - m)) AS sden FROM ga GROUP BY 1),
        |ge AS (SELECT flag, 256 - nz AS v,
        |  CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)
        |    * 65536.0 * 9007199254740992.0
        |    / CAST((256 - nz) * 9007199254740992 + sden AS DOUBLE) AS raw FROM gd),
        |gest AS (SELECT flag,
        |  CASE WHEN v > 0 AND raw <= 640.0 THEN 256.0 * ln(256.0 / v) ELSE raw END AS ev
        |  FROM ge),
        |gex AS (SELECT 'ALL' AS flag, count(DISTINCT okey) AS n_exact FROM b)
        |SELECT ex.flag, n_exact, CAST(floor(ev + 0.5) AS BIGINT) AS n_est
        |FROM ex JOIN est USING (flag)
        |UNION ALL
        |SELECT gex.flag, n_exact, CAST(floor(ev + 0.5) AS BIGINT) AS n_est
        |FROM gex JOIN gest USING (flag)
        |ORDER BY flag""".stripMargin,

    "q200_sliding_hll_incremental" ->
      """WITH e AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |  CAST(user_id AS VARCHAR) || ':' || CAST(hour(ts) AS VARCHAR) AS uh
        |  FROM events),
        |h AS (SELECT day, uh,
        |  CAST(('0x' || substr(md5(uh), 1, 15)) AS BIGINT) AS hv FROM e),
        |b AS (SELECT day, uh, hv % 256 AS bucket,
        |  CASE WHEN hv // 256 = 0 THEN 53 ELSE 53 - length(bin(hv // 256)) END AS rho
        |  FROM h),
        |regs AS (SELECT day, bucket, max(rho) AS m FROM b GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM e),
        |full_ AS (SELECT day FROM days
        |  WHERE day >= (SELECT min(day) + 6 FROM days)),
        |wregs AS (SELECT f.day, r.bucket, max(r.m) AS m
        |  FROM full_ f JOIN regs r ON r.day > f.day - 7 AND r.day <= f.day
        |  GROUP BY 1, 2),
        |d AS (SELECT day, count(*) AS nz,
        |  sum(1::BIGINT << (53 - m)) AS sden FROM wregs GROUP BY 1),
        |e2 AS (SELECT day, 256 - nz AS v,
        |  CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)
        |    * 65536.0 * 9007199254740992.0
        |    / CAST((256 - nz) * 9007199254740992 + sden AS DOUBLE) AS raw FROM d),
        |est AS (SELECT day,
        |  CASE WHEN v > 0 AND raw <= 640.0 THEN 256.0 * ln(256.0 / v) ELSE raw END AS ev
        |  FROM e2),
        |ex AS (SELECT f.day, count(DISTINCT x.uh) AS n_exact
        |  FROM full_ f JOIN (SELECT DISTINCT day, uh FROM e) x
        |    ON x.day > f.day - 7 AND x.day <= f.day
        |  GROUP BY 1)
        |SELECT ex.day, n_exact, CAST(floor(ev + 0.5) AS BIGINT) AS n_est
        |FROM ex JOIN est USING (day) ORDER BY day""".stripMargin,

    "q189_sliding_hll" ->
      """WITH e AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |  CAST(user_id AS VARCHAR) || ':' || CAST(hour(ts) AS VARCHAR) AS uh
        |  FROM events),
        |h AS (SELECT day, uh,
        |  CAST(('0x' || substr(md5(uh), 1, 15)) AS BIGINT) AS hv FROM e),
        |b AS (SELECT day, uh, hv % 256 AS bucket,
        |  CASE WHEN hv // 256 = 0 THEN 53 ELSE 53 - length(bin(hv // 256)) END AS rho
        |  FROM h),
        |regs AS (SELECT day, bucket, max(rho) AS m FROM b GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM e),
        |full_ AS (SELECT day FROM days
        |  WHERE day >= (SELECT min(day) + 6 FROM days)),
        |wregs AS (SELECT f.day, r.bucket, max(r.m) AS m
        |  FROM full_ f JOIN regs r ON r.day > f.day - 7 AND r.day <= f.day
        |  GROUP BY 1, 2),
        |d AS (SELECT day, count(*) AS nz,
        |  sum(1::BIGINT << (53 - m)) AS sden FROM wregs GROUP BY 1),
        |e2 AS (SELECT day, 256 - nz AS v,
        |  CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)
        |    * 65536.0 * 9007199254740992.0
        |    / CAST((256 - nz) * 9007199254740992 + sden AS DOUBLE) AS raw FROM d),
        |est AS (SELECT day,
        |  CASE WHEN v > 0 AND raw <= 640.0 THEN 256.0 * ln(256.0 / v) ELSE raw END AS ev
        |  FROM e2),
        |ex AS (SELECT f.day, count(DISTINCT x.uh) AS n_exact
        |  FROM full_ f JOIN (SELECT DISTINCT day, uh FROM e) x
        |    ON x.day > f.day - 7 AND x.day <= f.day
        |  GROUP BY 1)
        |SELECT ex.day, n_exact, CAST(floor(ev + 0.5) AS BIGINT) AS n_est
        |FROM ex JOIN est USING (day) ORDER BY day""".stripMargin,

    "q212_bloom_advisor" ->
      """WITH h1 AS (SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
        |    1, 15)) AS BIGINT) AS hv FROM events),
        |b1 AS (SELECT hv % 256 AS bucket,
        |  CASE WHEN hv // 256 = 0 THEN 53
        |       ELSE 53 - length(bin(hv // 256)) END AS rho FROM h1),
        |r1 AS (SELECT bucket, max(rho) AS m FROM b1 GROUP BY 1),
        |d1 AS (SELECT count(*) AS nz, sum(1::BIGINT << (53 - m)) AS sden FROM r1),
        |e1 AS (SELECT 256 - nz AS v,
        |  CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)
        |    * 65536.0 * 9007199254740992.0
        |    / CAST((256 - nz) * 9007199254740992 + sden AS DOUBLE) AS raw FROM d1),
        |n1 AS (SELECT CAST(floor(CASE WHEN v > 0 AND raw <= 640.0
        |    THEN 256.0 * ln(256.0 / v) ELSE raw END + 0.5) AS BIGINT) AS ndv
        |  FROM e1),
        |h2 AS (SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
        |    1, 15)) AS BIGINT) AS hv FROM lineitem),
        |b2 AS (SELECT hv % 256 AS bucket,
        |  CASE WHEN hv // 256 = 0 THEN 53
        |       ELSE 53 - length(bin(hv // 256)) END AS rho FROM h2),
        |r2 AS (SELECT bucket, max(rho) AS m FROM b2 GROUP BY 1),
        |d2 AS (SELECT count(*) AS nz, sum(1::BIGINT << (53 - m)) AS sden FROM r2),
        |e2 AS (SELECT 256 - nz AS v,
        |  CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)
        |    * 65536.0 * 9007199254740992.0
        |    / CAST((256 - nz) * 9007199254740992 + sden AS DOUBLE) AS raw FROM d2),
        |n2 AS (SELECT CAST(floor(CASE WHEN v > 0 AND raw <= 640.0
        |    THEN 256.0 * ln(256.0 / v) ELSE raw END + 0.5) AS BIGINT) AS ndv
        |  FROM e2),
        |lad AS (SELECT * FROM (VALUES
        |  ('fpp_1pct', CAST(9.585058445182247 AS DOUBLE), 7),
        |  ('fpp_01pct', CAST(14.37758766777337 AS DOUBLE), 10)) v(fpp, bpe, k)),
        |u AS (SELECT 'events.event_id' AS key_col, ndv FROM n1
        |  UNION ALL SELECT 'lineitem.l_orderkey', ndv FROM n2)
        |SELECT key_col, fpp, ndv AS ndv_est,
        |  CAST(ceil(CAST(ndv AS DOUBLE) * bpe) AS BIGINT) AS bits,
        |  k AS k_hashes,
        |  CAST(ceil(CAST(ndv AS DOUBLE) * bpe) AS BIGINT) // 8192 AS kib
        |FROM u CROSS JOIN lad ORDER BY key_col, fpp""".stripMargin,

    "q148_cms_frequencies" ->
      """WITH toks AS (SELECT source AS g, tok
        |  FROM (SELECT source, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |cells AS (SELECT r,
        |  CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 15))
        |    AS BIGINT) % 2048 AS c, count(*) AS cnt
        |  FROM toks CROSS JOIN rows_ GROUP BY 1, 2),
        |top_ AS (SELECT tok, count(*) AS n_exact FROM toks GROUP BY 1
        |  ORDER BY n_exact DESC, tok LIMIT 15),
        |probe AS (SELECT tok, n_exact, r,
        |  CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 15))
        |    AS BIGINT) % 2048 AS c
        |  FROM top_ CROSS JOIN rows_)
        |SELECT tok, n_exact, min(coalesce(cnt, 0)) AS n_est
        |FROM probe LEFT JOIN cells USING (r, c) GROUP BY 1, 2
        |ORDER BY n_exact DESC, tok""".stripMargin,

    "q147_kmv_overlap" ->
      """WITH toks AS (SELECT DISTINCT source AS g,
        |  CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT source, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |sk AS (SELECT g, h FROM (SELECT g, h,
        |    row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM toks)
        |  WHERE rn <= 128),
        |gs AS (SELECT DISTINCT g FROM sk),
        |pairs AS (SELECT x.g AS ga, y.g AS gb FROM gs x JOIN gs y ON x.g < y.g),
        |mem AS (SELECT DISTINCT ga, gb, s.h
        |  FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb),
        |u AS (SELECT ga, gb, h FROM (SELECT ga, gb, h,
        |    row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn FROM mem)
        |  WHERE rn <= 128),
        |fl AS (SELECT u.ga, u.gb, u.h,
        |  CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL THEN 1 ELSE 0 END AS inboth
        |  FROM u
        |  LEFT JOIN sk a ON a.g = u.ga AND a.h = u.h
        |  LEFT JOIN sk b ON b.g = u.gb AND b.h = u.h),
        |agg AS (SELECT ga, gb, count(*) AS cu, max(h) AS theta,
        |  sum(inboth) AS rho FROM fl GROUP BY 1, 2),
        |fin AS (SELECT ga, gb,
        |  CASE WHEN cu < 128 THEN CAST(cu AS DOUBLE)
        |       ELSE CAST(127 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
        |            / CAST(theta AS DOUBLE) END AS ue,
        |  CAST(rho AS DOUBLE) / CAST(cu AS DOUBLE) AS j FROM agg)
        |SELECT ga, gb, CAST(floor(ue + 0.5) AS BIGINT) AS union_est,
        |  floor(j * 10000 + 0.5) / 10000 AS jaccard_est,
        |  CAST(floor(j * ue + 0.5) AS BIGINT) AS intersect_est
        |FROM fin ORDER BY jaccard_est DESC, ga, gb LIMIT 25""".stripMargin
  )
}
