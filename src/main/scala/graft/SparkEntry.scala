package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Checksums, Normalize}
import graft.operators.{Dedup, DedupApprox, Export, Multimodal, Similarity, Strategies, TextAnalysis}
import graft.sources.Sources

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the training-data-pipeline operators), each with a
  * DuckDB-equivalent `oracleSql` where SQL-expressible.
  *
  * Oracle-parity rules used throughout:
  *  - double aggregation goes through DECIMAL (exact) and back to DOUBLE,
  *    so partial-aggregation order cannot perturb the result;
  *  - rounding is `floor(x*10^k + 0.5)/10^k` — identical IEEE ops in both
  *    engines, unlike round() whose tie-handling is engine-specific;
  *  - every query ends in a deterministic ORDER BY;
  *  - hashes on oracle-checked paths are md5-over-strings (portable);
  *    xxhash64 variants exist for production speed and are checked
  *    rows-only.
  */
object SparkEntry {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    Sources.readTable(s, dir, t)

  private def cfg(ut: UpdateType, v: Long, pk: String, table: String): PipelineConfig =
    PipelineConfig(SourceConfig("/", table), StoreConfig("/na", table), ut, pk, v)

  /** floor-based half-up rounding: bit-identical across engines. */
  private def r(c: Column, k: Int): Column = {
    val m = math.pow(10, k)
    floor(c * m + 0.5) / m
  }

  // --- shared synthetic source/state pair built from `customer` (the
  // upsert-strategy fixtures: ~9% deletes, ~11% inserts, ~14% updates) ---
  private val custCols = Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "c_nationkey")
  private def custState(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "customer").filter(col("c_custkey") % 11 =!= 3)
      .select(custCols.map(col): _*)
  private def custSrc(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "customer").filter(col("c_custkey") % 9 =!= 5)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(1.0)).otherwise(col("c_acctbal")))
      .select(custCols.map(col): _*)

  /** Oracle-side mirror of custState/custSrc as SQL CTEs. */
  private val custCtes =
    """WITH state AS (
      |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment, c_nationkey
      |  FROM customer WHERE c_custkey % 11 != 3),
      |src AS (
      |  SELECT c_custkey, c_name,
      |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1.0 ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment, c_nationkey
      |  FROM customer WHERE c_custkey % 9 != 5)""".stripMargin
  private val anyColChanged =
    custCols.map(c => s"s.$c IS DISTINCT FROM t.$c").mkString("(", " OR ", ")")

  /** Build-once/probe-many index caching shared by the ANN queries (q30
    * LSH, q49 IVF): the cache path embeds a CONTENT fingerprint of the
    * source table (file names, lengths, and parquet footer bytes — the
    * footer's row-group stats change with any data change) plus the
    * index's code-scheme signature, so neither regenerated fixtures (even
    * same-length within one mtime granule) nor a different scheme can
    * ever serve a stale index. `write` runs only when the _SUCCESS marker
    * is absent. */
  private def cachedIndexPath(s: SparkSession, dir: String, prefix: String,
      table: String, signature: String)(write: String => Unit): String = {
    val hconf = s.sparkContext.hadoopConfiguration
    val srcPath = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val idxPath = new java.io.File(sys.props("java.io.tmpdir"),
      prefix + "_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
        s"_${Sources.contentFingerprint(srcPath, hconf)}_" + signature).getAbsolutePath
    val fs = new org.apache.hadoop.fs.Path(idxPath).getFileSystem(hconf)
    if (!fs.exists(new org.apache.hadoop.fs.Path(idxPath, "_SUCCESS")))
      write(idxPath)
    idxPath
  }

  /** Build-once/join-many BUCKETED-table caching (q80): same content-
    * fingerprint discipline as [[cachedIndexPath]], applied to a bucketed
    * catalog table. The fingerprint rides in BOTH the data path and the
    * table name, so stale files can never be served under a fresh name;
    * when the files already exist the table is merely re-attached
    * ([[graft.operators.Bucketing.registerBucketed]]) — the bench then
    * measures the zero-exchange join, not two table rewrites. Returns the
    * catalog table name. */
  private def cachedBucketedTable(s: SparkSession, dir: String,
      prefix: String, srcTable: String, df: DataFrame,
      keyCols: Seq[String], nBuckets: Int): String = {
    val hconf = s.sparkContext.hadoopConfiguration
    val srcPath = new org.apache.hadoop.fs.Path(s"$dir/$srcTable.parquet")
    val fp = Sources.contentFingerprint(srcPath, hconf)
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      s"${prefix}_${dir.replaceAll("[^A-Za-z0-9]", "_")}_${fp}_bk$nBuckets")
      .getAbsolutePath
    val table = s"${prefix}_$fp"
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      if (s.catalog.tableExists(table)) s.sql(s"DROP TABLE `$table`")
      graft.operators.Bucketing.writeBucketed(df, table, keyCols, nBuckets,
        Some(path))
    } else if (!s.catalog.tableExists(table))
      graft.operators.Bucketing.registerBucketed(s, table, df.schema.toDDL,
        keyCols, nBuckets, path)
    table
  }

  // --- documents corpora with injected exact/near duplicates (the base
  // corpus is fully distinct, so dedup queries would otherwise be vacuous) --
  private def docsBase(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "documents").select("doc_id", "text")
  private def docsWithExactDups(s: SparkSession, dir: String): DataFrame = {
    val d = docsBase(s, dir)
    d.unionByName(d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }
  private def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = docsBase(s, dir)
    d.unionByName(d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
  }
  private val exactDupCte =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 5 = 0)""".stripMargin
  private val nearDupCte =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, substr(text, strpos(text, ' ') + 1)
      |  FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** The MinHash+LSH candidate/verify pipeline through verified `pairs`
    * (doc pairs with exact n-gram Jaccard `j`) — shared by the pair query
    * (q25) and the component-clustering query (q56). */
  private val minhashPairsCtes = nearDupCte +
    """,
      |toks AS (SELECT doc_id,
      |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
      |  FROM corpus),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      |       ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
      |  END AS sh FROM toks),
      |sig AS (SELECT doc_id, sh,
      |  [CAST(list_min([CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '#' || s), 1, 15)) AS BIGINT)
      |                  FOR s IN sh]) AS VARCHAR) FOR j IN range(0, 16)] AS sg
      |  FROM sh),
      |bands AS (SELECT doc_id, b,
      |  md5(array_to_string(sg[b*2+1:b*2+2], '|')) AS band_key
      |  FROM sig, range(0, 8) t(b)),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
      |  FROM bands a JOIN bands bb
      |    ON a.b = bb.b AND a.band_key = bb.band_key AND a.doc_id < bb.doc_id),
      |hsh AS (SELECT doc_id,
      |  list_distinct([CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) FOR s IN sh]) AS hs
      |  FROM sh),
      |pairs AS (SELECT id_a, id_b,
      |  CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
      |  CAST(len(list_distinct(list_concat(sa.hs, sb.hs))) AS DOUBLE) AS j
      |  FROM cand
      |  JOIN hsh sa ON sa.doc_id = cand.id_a
      |  JOIN hsh sb ON sb.doc_id = cand.id_b)""".stripMargin

  /** Full from-scratch BM25 oracle — shared by q83 (scan path) and
    * q94 (persisted-index path): both must reproduce it exactly. */
  private val bm25OracleSql =
      """WITH toks AS (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |ft AS (SELECT doc_id, term FROM toks
        |  WHERE term IN ('dup', 'vector', 'spark')),
        |dl AS (SELECT doc_id,
        |  CAST(CASE WHEN norm = '' THEN 0
        |       ELSE length(norm) - length(replace(norm, ' ', '')) + 1
        |       END AS BIGINT) AS dl
        |  FROM (SELECT doc_id, regexp_replace(trim(text), '\s+', ' ', 'g') AS norm
        |        FROM documents)),
        |st AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl FROM dl),
        |tf AS (SELECT f.doc_id, d.dl, f.term, COUNT(*) AS tf
        |  FROM ft f JOIN dl d ON f.doc_id = d.doc_id GROUP BY 1, 2, 3),
        |idf AS (SELECT term, df,
        |  (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |    (CAST(df AS DOUBLE) + 0.5) AS idf
        |  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1) CROSS JOIN st),
        |sc AS (SELECT tf.doc_id,
        |  CAST(floor(idf.idf *
        |    ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)) /
        |     (CAST(tf.tf AS DOUBLE) + 1.2 *
        |       ((1.0 - 0.75) + 0.75 * CAST(tf.dl AS DOUBLE) / st.avgdl))) *
        |    1000000.0 + 0.5) AS BIGINT) AS ms
        |  FROM tf JOIN idf ON tf.term = idf.term CROSS JOIN st),
        |agg AS (SELECT doc_id, CAST(SUM(ms) AS BIGINT) AS ms FROM sc GROUP BY 1)
        |SELECT doc_id, CAST(ms AS DOUBLE) / 1000000.0 AS bm25
        |FROM agg ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin

  // --- documents with injected PII / URLs (the base corpus is plain
  // lowercase words, so scrub/extract queries would otherwise be vacuous) --
  private def docsWithPii(s: SparkSession, dir: String): DataFrame =
    docsBase(s, dir)
      .withColumn("text", when(col("doc_id") % 4 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com for details"))).otherwise(col("text")))
      .withColumn("text", when(col("doc_id") % 6 === 0,
        concat(col("text"), lit(" or call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(col("text")))
  private val piiCte =
    """WITH pii AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 6 = 0
      |         THEN t2 || ' or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |         ELSE t2 END AS text
      |  FROM (SELECT doc_id,
      |          CASE WHEN doc_id % 4 = 0
      |               THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com for details'
      |               ELSE text END AS t2
      |        FROM documents))""".stripMargin
  private def docsWithUrls(s: SparkSession, dir: String): DataFrame =
    docsBase(s, dir)
      .withColumn("text", when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" see https://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"))).otherwise(col("text")))
  private val urlCte =
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0
      |         THEN text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
      |              || '.example.org/p/' || CAST(doc_id AS VARCHAR)
      |         ELSE text END AS text
      |  FROM documents)""".stripMargin

  private def probeVec(s: SparkSession, dir: String): Seq[Float] =
    rd(s, dir, "embeddings").orderBy("vec_id").limit(1)
      .select("embedding").collect()(0).getSeq[Float](0)

  /** The flagship pipeline's config — shared with Smoke so its
    * rerun-against-existing-state check cannot drift from entry(). */
  def entryConfig(versionId: Long): PipelineConfig = {
    val dir = "/root/testdata/sf0.001"
    val statePath = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_entry_state").getAbsolutePath
    PipelineConfig(
      SourceConfig(dir, "customer"), StoreConfig(statePath, "customer"),
      UpdateType.UpsertChecksum, "c_custkey", versionId)
  }

  /** Flagship: full sync pipeline end-to-end on sf=0.001 (scan ->
    * normalize -> dedupe -> checksum upsert -> atomic state snapshot).
    * Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val c = entryConfig(1L)
    val pipe = new SyncPipeline(spark, c)
    pipe.store.truncate()
    pipe.run(spark.read.parquet(s"${c.source.path}/customer.parquet"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // ----- semi-join (E2) --------------------------------------------
    "q10_semi_join" -> ((s, dir) => {
      rd(s, dir, "customer")
        .join(rd(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
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

    // ----- text stats: token counting (training-data ops) ------------
    "q21_text_stats" -> ((s, dir) => {
      rd(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_calc"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    }),

    // ----- text quality scoring --------------------------------------
    "q22_text_quality" -> ((s, dir) => {
      val t = col("text")
      val n = length(t).cast("double")
      val alpha = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
      val punct = length(regexp_replace(t, "[^.,;:!?]", "")).cast("double")
      val toks = TextAnalysis.tokenCount(t).cast("double")
      val stop = TextAnalysis.stopwordCount(t, TextAnalysis.EnglishStopwords).cast("double")
      rd(s, dir, "documents").select(
        col("doc_id"),
        r(alpha / greatest(n, lit(1.0)), 4).as("alpha_ratio"),
        r(punct / greatest(n, lit(1.0)), 4).as("punct_ratio"),
        r(stop / greatest(toks, lit(1.0)), 4).as("stopword_ratio"),
        r(alpha / greatest(toks, lit(1.0)), 4).as("mean_token_len"))
        .orderBy("doc_id")
    }),

    // ----- language ID (n-gram heuristic) ----------------------------
    "q23_lang_id" -> ((s, dir) => {
      rd(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.languageId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    // ----- exact dedup by content hash -------------------------------
    "q24_dedup_exact" -> ((s, dir) => {
      DedupApprox.exactByContent(docsWithExactDups(s, dir), "doc_id", "text",
        md5Family = true).orderBy("fp")
    }),

    // ----- MinHash+LSH near-dup detection ----------------------------
    "q25_minhash_neardup" -> ((s, dir) => {
      DedupApprox.minhashNearDups(docsWithNearDups(s, dir), "doc_id", "text",
        k = 3, bands = 8, rows = 2, threshold = 0.6, md5Family = true)
    }),

    // ----- SimHash near-dup (xxhash64 — rows-only check) -------------
    "q26_simhash_neardup" -> ((s, dir) => {
      // maxBucket caps degenerate sketch buckets (boilerplate corpora); far
      // above any real bucket at this SF, so results are unaffected
      DedupApprox.simhashNearDups(docsWithNearDups(s, dir), "doc_id", "text",
        maxHamming = 12, maxBucket = 100000).orderBy("id_a", "id_b")
    }),

    // ----- brute-force cosine top-k ----------------------------------
    "q27_cosine_topk" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      Similarity.topK(e, "vec_id", "embedding", probeVec(s, dir), 20)
        .select(col("vec_id"), r(col("cos"), 6).as("cos"))
    }),

    // ----- cosine threshold scan -------------------------------------
    "q28_cosine_threshold" -> ((s, dir) => {
      Similarity.aboveThreshold(rd(s, dir, "embeddings"), "vec_id", "embedding",
        probeVec(s, dir), 0.15)
        .select(col("vec_id"), r(col("cos"), 6).as("cos"))
        .orderBy("vec_id")
    }),

    // ----- embedding near-dup via hyperplane LSH (rows-only) ---------
    "q29_embed_neardup" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      // inject exact-duplicate vectors (scaled copies have cosine 1.0)
      val dup = e.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      Similarity.cosineNearDups(
        e.select("vec_id", "embedding").unionByName(dup),
        "vec_id", "embedding", threshold = 0.999, bits = 8,
        maxBucket = 100000)
        .select(col("id_a"), col("id_b"), r(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b")
    }),

    // ----- ANN top-k via persisted LSH index (partition-pruned probe) --
    "q30_ann_topk" -> ((s, dir) => {
      // build-once/probe-many (cachedIndexPath): codes are computed in ONE
      // indexing pass and persisted partitionBy(lsh_code); the probe
      // enumerates its Hamming ball driver-side and reads only those
      // partitions
      val idxPath = cachedIndexPath(s, dir, "graft_q30_index", "embeddings",
        Similarity.indexSignature(bits = 8, dim = 64)) { p =>
        Similarity.writeIndex(rd(s, dir, "embeddings"), "embedding", p, bits = 8)
      }
      val idx = Similarity.readIndex(s, idxPath)
      Similarity.annTopK(idx, "vec_id", "embedding", probeVec(s, dir),
        k = 10, bits = 8, probeHamming = 2, dim = 64)
        .select(col("vec_id"), r(col("cos"), 6).as("cos"))
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

    // ----- bucketed incremental state (the 100 TB rewrite path) ------
    "q35_bucketed_upsert" -> ((s, dir) => {
      val path = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q35_state").getAbsolutePath
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

    // ----- wide pivot ------------------------------------------------
    "q45_pivot" -> ((s, dir) => {
      rd(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority")
    }),

    // ----- generator: explode tokens + top-k frequency ---------------
    "q46_token_freq" -> ((s, dir) => {
      rd(s, dir, "documents")
        .select(explode(split(TextAnalysis.normText(col("text")), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    }),

    // ----- TF-IDF top terms per doc (exact-IEEE log-free idf) --------
    "q47_tfidf_terms" -> ((s, dir) => {
      TextAnalysis.tfIdfTopTerms(docsBase(s, dir), "doc_id", "text", topK = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rnk")
    }),

    // ----- cross-doc shingle novelty / contamination fraction --------
    "q48_shingle_novelty" -> ((s, dir) => {
      TextAnalysis.shingleNovelty(docsWithNearDups(s, dir), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
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

    // ----- near-dup clusters: pairs -> connected components ----------
    "q56_neardup_components" -> ((s, dir) => {
      val pairs = DedupApprox.minhashNearDups(docsWithNearDups(s, dir),
        "doc_id", "text", k = 3, bands = 8, rows = 2, threshold = 0.6,
        md5Family = true)
      graft.operators.Components.connectedComponents(pairs, "id_a", "id_b")
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

    // ----- PII scrub: count + redact emails/phones -------------------
    "q58_pii_redact" -> ((s, dir) => {
      docsWithPii(s, dir).select(col("doc_id"),
        TextAnalysis.patternCount(col("text"), TextAnalysis.EmailRe).as("n_emails"),
        TextAnalysis.patternCount(col("text"), TextAnalysis.PhoneRe).as("n_phones"),
        md5(TextAnalysis.redactPii(col("text"))).as("redacted_fp"))
        .orderBy("doc_id")
    }),

    // ----- URL domain extraction (corpus provenance report) ----------
    "q59_url_domains" -> ((s, dir) => {
      docsWithUrls(s, dir)
        .select(col("doc_id"), explode(TextAnalysis.urlDomains(col("text"))).as("domain"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_mentions"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("domain")
    }),

    // ----- canonical deduped corpus (the pipeline's shipped output) --
    // docs -> near-dup pairs -> connected components -> keep exactly one
    // doc per cluster (the minimum id) plus every singleton
    "q73_canonical_corpus" -> ((s, dir) => {
      val docs = docsWithNearDups(s, dir)
      val pairs = DedupApprox.minhashNearDups(docs, "doc_id", "text",
        k = 3, bands = 8, rows = 2, threshold = 0.6, md5Family = true)
      graft.operators.Components.canonicalize(docs, pairs, "doc_id", "id_a", "id_b")
        .filter(col("doc_id") === col("canonical_id"))
        .select(col("doc_id"), md5(TextAnalysis.normText(col("text"))).as("fp"))
        .orderBy("doc_id")
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

    // ----- deterministic train/val/test split ------------------------
    "q71_dataset_split" -> ((s, dir) => {
      graft.operators.Sampling.splitAssign(rd(s, dir, "documents"),
        Seq("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("split", "source")
    }),

    // ----- funnel: ordered event-sequence matching -------------------
    "q70_funnel" -> ((s, dir) => {
      graft.operators.Sequence.funnelCounts(rd(s, dir, "events"),
        "user_id", Seq("ts", "event_id"), "event_type",
        steps = Seq("view", "click", "purchase"))
        .orderBy("funnel_stage")
    }),

    // ----- one-pass column profile (data-audit report) ---------------
    "q69_profile" -> ((s, dir) => {
      graft.operators.Stats.columnProfile(rd(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "c_nationkey"))
        .orderBy("column")
    }),

    // ----- k-means refinement step (Lloyd iteration for IVF) ---------
    "q68_kmeans_step" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      Similarity.kmeansStep(e, "embedding", cents)
        .select(col("cell"), col("dim"), col("n_members"), r(col("mean"), 6).as("mean"))
        .orderBy("cell", "dim")
    }),

    // ----- int8 embedding quantization (4x size cut) ------------------
    // ----- the custom DSv2 source under the oracle gate --------------
    "q110_dsv2_source" -> ((s, dir) => {
      // documents re-shaped to the reference's record wire format by a
      // DISTRIBUTED text write, read back through the graft-records DSv2
      // source with a pushed filter + pruned columns, and aggregated —
      // the oracle only ever sees the original table, so the source's
      // typed parse, pushdown, and null semantics are all on the hook
      val out = sys.props("java.io.tmpdir") + "/graft_q110_records"
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
      val out = sys.props("java.io.tmpdir") + "/graft_q112_records"
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

    // ----- sharded JSONL round-trip (training-corpus handoff) --------
    "q105_jsonl_roundtrip" -> ((s, dir) => {
      // the corpus handoff format: sharded JSONL out, schema re-read,
      // aggregate ≡ source aggregate — the oracle never sees the files.
      // Shards are capped small so the round-trip crosses file splits.
      val src = docsBase(s, dir).join(
        rd(s, dir, "documents").select("doc_id", "source", "n_chars"),
        Seq("doc_id"))
      val out = sys.props("java.io.tmpdir") + "/graft_q105_jsonl"
      graft.operators.Export.writeJsonl(src, Seq("doc_id"), out,
        maxRecordsPerFile = 100)
      s.read.schema("doc_id LONG, n_chars LONG, source STRING, text STRING")
        .json(out)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("source")
    }),

    // ----- CSV export round-trip fidelity ----------------------------
    "q104_csv_roundtrip" -> ((s, dir) => {
      // export -> re-read -> aggregate must equal aggregating the source
      // directly: proves the CSV path's fidelity for strings, doubles
      // (shortest round-trip repr), and timestamps (ISO format) — the
      // oracle never sees the CSV, only the source table
      val src = rd(s, dir, "orders").select("o_orderkey", "o_orderstatus",
        "o_totalprice", "o_orderdate")
      val out = sys.props("java.io.tmpdir") + "/graft_q104_csv"
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

    // ----- per-source corpus audit report ----------------------------
    "q99_corpus_report" -> ((s, dir) => {
      // one composed audit frame per source: volume, corpus-wide exact
      // dup count, mean alpha-ratio quality, mean rare-token ratio. All
      // means are lattice-snapped then DECIMAL-routed so aggregation
      // order can't perturb them (the q01 avg_disc parity pattern).
      val docs = rd(s, dir, "documents").select("doc_id", "source", "text")
      // r()-snapped, NOT qualitySignals' round(): round() goes through
      // the shortest decimal repr while the oracle's floor(x*1e4+0.5) is
      // raw IEEE — a 4th-digit boundary could snap differently
      val alphaRatio = r(
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
          greatest(length(col("text")).cast("double"), lit(1.0)), 4)
      val base = docs.select(col("doc_id"), col("source"),
        alphaRatio.as("alpha_ratio"),
        TextAnalysis.md5Fingerprint(col("text")).as("fp"))
      val dupFp = base.groupBy("fp").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1).select(col("fp"), lit(1).as("_dup"))
      val rare = TextAnalysis.rareTokenRatio(docs, "doc_id", "text",
          maxFreq = 100)
        .select(col("id").as("doc_id"), r(col("rare_ratio"), 6).as("rr"))
      val nRr = sum(when(col("rr").isNotNull, 1L).otherwise(0L))
      base.join(dupFp, Seq("fp"), "left")
        .join(rare, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("_dup").isNotNull, 1L).otherwise(0L)).as("n_exact_dups"),
          (sum(col("alpha_ratio").cast("decimal(18,4)")).cast("double") /
            count(lit(1)).cast("double")).as("mean_alpha_ratio"),
          when(nRr > 0, sum(col("rr").cast("decimal(28,6)")).cast("double") /
            nRr.cast("double")).as("mean_rare_ratio"))
        .orderBy("source")
    }),

    // ----- incremental BM25 index (append-only corpus growth) --------
    "q98_bm25_incremental" -> ((s, dir) => {
      // index built from the even half, odd half APPENDED — must equal
      // the from-scratch full-corpus ranking (same oracle as q83/q94)
      val docs = docsBase(s, dir)
      val path = cachedIndexPath(s, dir, "graft_q98_bm25", "documents",
        "k1b64_incr") { p =>
        // markComplete=false: only the LAST step of a composed build may
        // create the completion marker the cache keys on
        TextAnalysis.writeBm25Index(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", p, nBuckets = 64, markComplete = false)
        TextAnalysis.appendToBm25Index(docs.filter(col("doc_id") % 2 =!= 0),
          "doc_id", "text", p, nBuckets = 64)
      }
      TextAnalysis.bm25FromIndex(s, path, Seq("dup", "vector", "spark"),
        topK = 15, nBuckets = 64)
    }),

    // ----- corpus diversity estimate (no pair expansion) -------------
    "q97_corpus_diversity" -> ((s, dir) => {
      DedupApprox.pairwiseJaccardEstimate(docsWithNearDups(s, dir),
        "doc_id", "text", k = 3, numHashes = 16)
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

    // ----- BPE merge-candidate (adjacent-pair) counting --------------
    "q95_bigram_merges" -> ((s, dir) => {
      // the first step of a BPE-style merge loop: corpus-wide adjacent
      // token-pair frequencies, top candidates by count. One explode of
      // 2-shingles + one partial-aggregated count + a bounded top-k heap
      // — the same shape at any corpus size. Single-token docs contribute
      // no pairs (shingleStrings' degenerate case is filtered by arity).
      val toks = split(TextAnalysis.normText(col("text")), " ")
      val n = size(toks)
      // zip_with over two shifted slices: one concat per pair, no
      // per-window array allocation (shingleStrings' general-k path
      // costs ~3x here); docs with <2 tokens contribute no pairs
      val pairs = when(n < 2, array().cast("array<string>"))
        .otherwise(zip_with(
          slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
          (x, y) => concat(x, lit(" "), y)))
      docsBase(s, dir)
        .select(explode(pairs).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(20)
    }),

    // ----- BM25 served from the persisted index ----------------------
    "q94_bm25_indexed" -> ((s, dir) => {
      val path = cachedIndexPath(s, dir, "graft_q94_bm25", "documents",
        "k1b64")(p => TextAnalysis.writeBm25Index(
          docsBase(s, dir), "doc_id", "text", p, nBuckets = 64))
      TextAnalysis.bm25FromIndex(s, path, Seq("dup", "vector", "spark"),
        topK = 15, nBuckets = 64)
    }),

    // ----- persisted inverted (posting-list) index -------------------
    "q93_inverted_index" -> ((s, dir) => {
      // postings written partitionBy(term_bucket) once; the probe prunes
      // to the query terms' buckets at planning time (like q30/q49)
      val path = cachedIndexPath(s, dir, "graft_q93_inv", "documents",
        "k1_b64")(p => TextAnalysis.writeInvertedIndex(
          docsBase(s, dir), "doc_id", "text", p, nBuckets = 64))
      TextAnalysis.probePostings(TextAnalysis.readInvertedIndex(s, path),
        Seq("dup", "vector", "spark"), nBuckets = 64)
        .orderBy("term", "doc_id")
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

    // ----- URL canonicalization (provenance dedup key) ---------------
    "q90_url_canonical" -> ((s, dir) => {
      // messy synthetic URLs (mixed-case authority, tracking params,
      // fragments, trailing slashes) built deterministically from doc_id
      // so the oracle constructs the identical input strings
      val urls = rd(s, dir, "documents").select(col("doc_id"),
        concat(
          lit("HTTPS://Site"), (col("doc_id") % 5).cast("string"),
          lit(".Example.COM/Path"), (col("doc_id") % 4).cast("string"),
          when(col("doc_id") % 3 === 0,
            concat(lit("/?utm_source=x&page="), (col("doc_id") % 2).cast("string")))
            .when(col("doc_id") % 3 === 1, lit("?utm_campaign=y"))
            .otherwise(lit("/")),
          when(col("doc_id") % 2 === 0, lit("#frag")).otherwise(lit(""))
        ).as("url"))
      urls
        .select(col("doc_id"), TextAnalysis.canonicalizeUrl(col("url")).as("canon"))
        .groupBy("canon")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
        .orderBy("canon")
    }),

    // ----- deterministic negative sampling (contrastive pairs) -------
    "q91_negative_sample" -> ((s, dir) => {
      graft.operators.Sampling.negativeSample(
        rd(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", k = 3, payloadCols = Seq("n_chars"))
        .withColumnRenamed("n_chars", "neg_chars")
        .orderBy("anchor_id", "slot")
    }),

    // ----- per-key event-time rolling window -------------------------
    "q89_rolling_window" -> ((s, dir) => {
      graft.operators.Stats.rollingPerKey(rd(s, dir, "events"),
        "user_id", "ts", "value", windowSec = 86400L)
        .select(col("event_id"), col("user_id"), col("n_win"), col("sum_win"))
        .orderBy("event_id")
    }),

    // ----- shingle containment (excerpt/quote detection) -------------
    "q87_containment" -> ((s, dir) => {
      // the injected near-dups are tail-substrings of their source doc,
      // so containment is ~1.0 in one direction — exactly the subset
      // relation Jaccard-tuned minhash banding under-recalls
      DedupApprox.containmentPairs(docsWithNearDups(s, dir), "doc_id",
        "text", k = 3, threshold = 0.5, maxShingleDf = 100)
        .orderBy("id_a", "id_b")
    }),

    // ----- per-cluster embedding outlier audit -----------------------
    "q88_centroid_outliers" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      Similarity.centroidOutliers(e, "vec_id", "embedding", cents, pctl = 0.9)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
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

    // ----- BM25 ranking (log-free idf, integer micro-score sum) ------
    "q83_bm25" -> ((s, dir) => {
      // 'dup' is rare (df 25/500 at sf0.01) while 'vector'/'spark' are
      // common, so the idf ratio actually spreads the ranking
      TextAnalysis.bm25Rank(docsBase(s, dir), "doc_id", "text",
        Seq("dup", "vector", "spark"), topK = 15)
        .withColumnRenamed("id", "doc_id")
    }),

    // ----- vocabulary coverage curve ---------------------------------
    "q85_vocab_coverage" -> ((s, dir) => {
      TextAnalysis.vocabCoverage(docsBase(s, dir), "doc_id", "text", topK = 20)
        .orderBy("rnk")
    }),

    // ----- rare-token ratio quality signal ---------------------------
    "q86_rare_tokens" -> ((s, dir) => {
      TextAnalysis.rareTokenRatio(docsBase(s, dir), "doc_id", "text",
        maxFreq = 100)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "q82_quantize_int8" -> ((s, dir) => {
      // per-vector max-abs int8: scalar order-independent summaries keep
      // the frame exact-hash comparable (floor(v+0.5) rounding and pure
      // IEEE mul/div reproduce bit-identically in DuckDB)
      graft.operators.Quantize.int8Report(rd(s, dir, "embeddings"),
        "vec_id", "embedding")
        .orderBy("vec_id")
    }),

    // ----- corpus-wide exact paragraph dedup (RefinedWeb rule) --------
    "q81_paragraph_dedup" -> ((s, dir) => {
      // single-line fixture text: spaces become paragraph breaks (same
      // trick as q77) — every repeated word keeps only its first global
      // occurrence by (doc_id, pos); blank paragraphs are structural
      val docs = rd(s, dir, "documents").select(col("doc_id"),
        translate(col("text"), " ", "\n").as("text"))
      TextAnalysis.dedupParagraphs(docs, "doc_id", "text")
        .orderBy("doc_id")
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

    // ----- keep-rule dedup: canonical = best-scoring cluster member --
    "q78_canonical_by_score" -> ((s, dir) => {
      // same near-dup clusters as q56/q73, but the survivor is the
      // LONGEST member (quality keep-rule), not the minimum id
      val docs = docsWithNearDups(s, dir)
      val pairs = DedupApprox.minhashNearDups(docs, "doc_id", "text",
        k = 3, bands = 8, rows = 2, threshold = 0.6, md5Family = true)
      graft.operators.Components.canonicalizeBy(docs, pairs,
        "doc_id", "id_a", "id_b", length(col("text")))
        .select(col("doc_id"), col("canonical_id"),
          (col("doc_id") === col("canonical_id")).as("kept"))
        .orderBy("doc_id")
    }),

    // ----- line-level boilerplate removal (CCNet/C4 rule) ------------
    "q77_boilerplate_lines" -> ((s, dir) => {
      // the fixture's text is single-line, so spaces become line breaks:
      // "lines" are then words and the corpus-frequency rule drops filler
      // words present in > 50 distinct docs — same operator, same oracle
      // arithmetic as a real multi-line corpus
      val docs = rd(s, dir, "documents").select(col("doc_id"),
        translate(col("text"), " ", "\n").as("text"))
      TextAnalysis.dropBoilerplateLines(docs, "doc_id", "text", maxDocFreq = 50)
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

    // ----- iterated k-means: refine once, then re-assign -------------
    "q75_kmeans_refine" -> ((s, dir) => {
      // one full Lloyd refinement (assign -> DECIMAL-routed means ->
      // Float-rounded centroids) and then the SECOND step's aggregation
      // over the refined geometry; the oracle unrolls both iterations as
      // CTEs, so assignment, fallback, and Float rounding all replay
      // engine-independently
      val e = rd(s, dir, "embeddings")
      val seeds = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      val (cents1, _) = Similarity.kmeansRefine(e, "embedding", seeds, iters = 1)
      Similarity.kmeansStep(e, "embedding", cents1)
        .select(col("cell"), col("dim"), col("n_members"), r(col("mean"), 6).as("mean"))
        .orderBy("cell", "dim")
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

    // ----- cross-corpus contamination (benchmark decontamination) ----
    "q64_contamination" -> ((s, dir) => {
      val d = docsBase(s, dir)
      val train = d.filter(col("doc_id") % 2 === 0)
      val eval_ = d.filter(col("doc_id") % 2 === 1)
        .unionByName(d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 30000).as("doc_id"),
            expr("substring(text, instr(text, ' ') + 1)").as("text")))
      TextAnalysis.crossContamination(train, eval_, "doc_id", "text", k = 3)
        .select(col("id").as("doc_id"), col("n_shingles"), col("contaminated_frac"))
        .orderBy("doc_id")
    }),

    // ----- sliding token-window chunking -----------------------------
    "q65_chunking" -> ((s, dir) => {
      TextAnalysis.chunkTokens(rd(s, dir, "documents"), "doc_id", "text",
        chunkSize = 40, stride = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_id")
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

    // ----- composed corpus-cleaning pipeline (C4-style) --------------
    // raw crawl stand-in (PII + exact dups injected) -> language gate ->
    // quality gate (token count, alpha ratio) -> PII redaction -> exact
    // dedup on the redacted content (min doc_id is canonical). Every
    // stage is an operator proven alone (q23, q21/q22, q58, q24); this
    // query proves the COMPOSITION end-to-end against one oracle.
    "q62_clean_pipeline" -> ((s, dir) => {
      val base = docsWithPii(s, dir)
      val raw = base.unionByName(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val t = col("text")
      val alphaRatio = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double") /
        greatest(length(t).cast("double"), lit(1.0))
      raw.filter(TextAnalysis.languageId(t) === "en")
        .filter(TextAnalysis.tokenCount(t) >= 30 && alphaRatio > lit(0.55))
        .select(col("doc_id"),
          md5(TextAnalysis.normText(TextAnalysis.redactPii(t))).as("fp"))
        .groupBy("fp")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "fp", "n_copies")
        .orderBy("doc_id")
    }),

    // ----- deterministic per-group cap (max docs per source) ---------
    "q61_source_cap" -> ((s, dir) => {
      graft.operators.Sampling.capPerGroup(rd(s, dir, "documents"),
        groupCols = Seq("source"), keyCols = Seq("doc_id"), k = 10)
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    }),

    // ----- fixed-width length histogram ------------------------------
    "q60_length_histogram" -> ((s, dir) => {
      rd(s, dir, "documents")
        .groupBy(TextAnalysis.histogramBin(col("n_chars"), 100L, 20).as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
        .orderBy("bin")
    }),

    // ----- n-gram repetition ratio (quality-filter rule) -------------
    "q53_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionRatio(docsBase(s, dir), "doc_id", "text", n = 2)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
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

    // ----- incremental ingest near-dup gate (new vs corpus only) -----
    "q50_incremental_neardup" -> ((s, dir) => {
      val base = docsBase(s, dir)
      val incoming = base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
        .unionByName(base.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 20000).as("doc_id"), col("text")))
      DedupApprox.incrementalNearDups(base, incoming, "doc_id", "text",
        k = 3, bands = 8, rows = 2, threshold = 0.6, md5Family = true)
        .orderBy("new_id", "corpus_id")
    }),

    // ----- IVF-style ANN: persisted inverted file, pruned cell probe --
    "q49_ivf_topk" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", k = 8)
      // build-once/probe-many (cachedIndexPath, keyed by the
      // centroid-value signature): the cell assignment is computed in ONE
      // indexing pass and persisted partitionBy(ivf_cell); the probe
      // reads only its nProbe cell directories
      val idxPath = cachedIndexPath(s, dir, "graft_q49_index", "embeddings",
        Similarity.ivfSignature(cents)) { p =>
        Similarity.writeIvfIndex(e, "embedding", p, cents)
      }
      val idx = Similarity.readIvfIndex(s, idxPath)
      Similarity.ivfTopKIndexed(idx, "vec_id", "embedding", cents,
        probeVec(s, dir), k = 10, nProbe = 2)
        .select(col("vec_id"), r(col("cos"), 6).as("cos"))
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

    // ----- batch atomic write: heterogeneous actions in one commit ---
    "q42_batch_actions" -> ((s, dir) => {
      val path = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q42_state").getAbsolutePath
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
    }))

  // ---------------------------------------------------------------------
  // DuckDB oracles. Portable-value encoding mirrors Checksums.portableValue.
  // ---------------------------------------------------------------------

  private def enc(x: String): String =
    s"coalesce('v' || length(CAST($x AS VARCHAR)) || ':' || CAST($x AS VARCHAR), 'n')"

  private val langScores = TextAnalysis.LanguageMarkers.map { case (lang, words) =>
    lang -> s"len(regexp_extract_all(lower(text), '\\b(${words.mkString("|")})\\b', 0))"
  }

  def oracleSql: Map[String, String] = Map(

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

    "q10_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,

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

    "q21_text_stats" ->
      """WITH t AS (SELECT doc_id, text,
        |  regexp_replace(trim(text), '\s+', ' ', 'g') AS norm FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_calc,
        |  CAST(CASE WHEN norm = '' THEN 0
        |       ELSE length(norm) - length(replace(norm, ' ', '')) + 1 END AS BIGINT) AS n_tokens,
        |  CAST(floor((length(regexp_replace(text, '\s+', '', 'g')) + 3) / 4) AS BIGINT) AS n_subwords
        |FROM t ORDER BY doc_id""".stripMargin,

    "q22_text_quality" -> {
      val stopRe = "\\b(" + TextAnalysis.EnglishStopwords.mkString("|") + ")\\b"
      s"""WITH t AS (SELECT doc_id,
         |  CAST(length(text) AS DOUBLE) AS n,
         |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha,
         |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
         |  CAST(CASE WHEN regexp_replace(trim(text), '\\s+', ' ', 'g') = '' THEN 0
         |       ELSE length(regexp_replace(trim(text), '\\s+', ' ', 'g')) -
         |            length(replace(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ', '')) + 1
         |       END AS DOUBLE) AS toks,
         |  CAST(len(regexp_extract_all(lower(text), '$stopRe', 0)) AS DOUBLE) AS stop
         |FROM documents)
         |SELECT doc_id,
         |  floor(alpha / greatest(n, 1.0) * 10000 + 0.5) / 10000 AS alpha_ratio,
         |  floor(punct / greatest(n, 1.0) * 10000 + 0.5) / 10000 AS punct_ratio,
         |  floor(stop / greatest(toks, 1.0) * 10000 + 0.5) / 10000 AS stopword_ratio,
         |  floor(alpha / greatest(toks, 1.0) * 10000 + 0.5) / 10000 AS mean_token_len
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "q23_lang_id" -> {
      val scores = langScores.map { case (l, e) => s"  CAST($e AS BIGINT) AS s_$l" }
        .mkString(",\n")
      val best = "greatest(" + langScores.map("s_" + _._1).mkString(", ") + ")"
      val chain = langScores.map(_._1).sorted.reverse
        .map(l => s"WHEN s_$l = best THEN '$l'").mkString("\n       ")
      s"""WITH t AS (SELECT doc_id,\n$scores\nFROM documents),
         |b AS (SELECT doc_id, *, $best AS best FROM t)
         |SELECT doc_id,
         |  CASE WHEN best = 0 THEN 'und'
         |       $chain
         |       END AS lang_pred
         |FROM b ORDER BY doc_id""".stripMargin
    },

    "q24_dedup_exact" -> (exactDupCte +
      """
        |SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS group_size
        |FROM corpus GROUP BY 1 ORDER BY fp""".stripMargin),

    "q25_minhash_neardup" -> (minhashPairsCtes +
      """
        |SELECT id_a, id_b, floor(j * 10000 + 0.5) / 10000 AS jaccard
        |FROM pairs WHERE j >= 0.6 ORDER BY id_a, id_b""".stripMargin),

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

    "q58_pii_redact" -> (piiCte +
      s"""
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(text, '${graft.operators.TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |      '${graft.operators.TextAnalysis.PhoneRe}', '<PHONE>', 'g')) AS redacted_fp
         |FROM pii ORDER BY doc_id""".stripMargin),

    "q59_url_domains" -> (urlCte +
      s""",
         |d AS (SELECT doc_id,
         |        unnest(regexp_extract_all(text, '${graft.operators.TextAnalysis.UrlRe}', 1)) AS domain
         |      FROM u)
         |SELECT domain, count(*) AS n_mentions, count(DISTINCT doc_id) AS n_docs
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin),

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

    "q70_funnel" ->
      """WITH seq AS (SELECT user_id,
        |    list({'t': event_type, 's': 0}
        |         ORDER BY CAST(ts AS TIMESTAMP), event_id) AS a
        |  FROM events GROUP BY user_id),
        |st AS (SELECT user_id,
        |    list_reduce(list_prepend({'t': '', 's': 0}, a),
        |      (acc, x) -> {'t': '',
        |        's': CASE WHEN acc.s = 0 AND x.t = 'view' THEN 1
        |                  WHEN acc.s = 1 AND x.t = 'click' THEN 2
        |                  WHEN acc.s = 2 AND x.t = 'purchase' THEN 3
        |                  ELSE acc.s END}).s AS stage
        |  FROM seq)
        |SELECT CAST(stage AS BIGINT) AS funnel_stage, count(*) AS n_keys
        |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q68_kmeans_step" ->
      """WITH cent AS (SELECT vec_id AS cell, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (SELECT e.vec_id, e.embedding, c.cell,
        |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(e.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(e.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
        |  FROM embeddings e CROSS JOIN cent c),
        |asg AS (SELECT vec_id, embedding, cell FROM (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
        |  FROM scored) WHERE rn = 1),
        |pts AS (SELECT cell,
        |  unnest([{'d': d, 'v': CAST(embedding[d] AS DOUBLE)}
        |          FOR d IN range(1, len(embedding) + 1)]) AS s
        |  FROM asg)
        |SELECT CAST(cell AS BIGINT) AS cell, CAST(s.d - 1 AS BIGINT) AS dim,
        |  count(*) AS n_members,
        |  floor(CAST(sum(CAST(s.v AS DECIMAL(28,12))) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean
        |FROM pts GROUP BY 1, 2 ORDER BY cell, dim""".stripMargin,

    "q67_weighted_sample" ->
      """SELECT source, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) <
        |  floor(least(CAST(n_chars AS DOUBLE) / 1000.0, 1.0) * 4294967296.0 + 0.5)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q66_ema" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  list_reduce(list(CAST(value AS DOUBLE)
        |                   ORDER BY CAST(ts AS TIMESTAMP), event_id),
        |              (acc, x) -> 0.5*x + 0.5*acc) AS ema
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q64_contamination" -> {
      val shingle =
        """CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
          |     ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
          |     END""".stripMargin
      s"""WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
         |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
         |       UNION ALL
         |       SELECT doc_id + 30000, substr(text, strpos(text, ' ') + 1)
         |       FROM documents WHERE doc_id % 10 = 0),
         |tw AS (SELECT string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w FROM train),
         |tsh AS (SELECT DISTINCT CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
         |        FROM (SELECT unnest($shingle) AS s FROM tw)),
         |ew AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w FROM ev),
         |esh AS (SELECT DISTINCT doc_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
         |        FROM (SELECT doc_id, unnest($shingle) AS s FROM ew))
         |SELECT esh.doc_id AS doc_id, count(*) AS n_shingles,
         |  floor(CAST(sum(CASE WHEN tsh.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
         |        CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS contaminated_frac
         |FROM esh LEFT JOIN tsh ON esh.h = tsh.h
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q65_chunking" ->
      """WITH t AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |c AS (SELECT doc_id, len(w) AS n, w,
        |        unnest([i FOR i IN range(0, greatest(len(w), 1)) IF i % 10 = 0]) AS st
        |      FROM t)
        |SELECT doc_id, CAST(st // 10 AS BIGINT) AS chunk_id,
        |  CAST(least(40, n - st) AS BIGINT) AS n_toks,
        |  md5(array_to_string(w[st+1:st+40], ' ')) AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

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

    "q62_clean_pipeline" -> {
      val scores = langScores.map { case (l, e) => s"    CAST($e AS BIGINT) AS s_$l" }
        .mkString(",\n")
      val best = "greatest(" + langScores.map("s_" + _._1).mkString(", ") + ")"
      val chain = langScores.map(_._1).sorted.reverse
        .map(l => s"WHEN s_$l = best THEN '$l'").mkString("\n            ")
      val redacted =
        s"regexp_replace(regexp_replace(text, '${graft.operators.TextAnalysis.EmailRe}', '<EMAIL>', 'g'), " +
          s"'${graft.operators.TextAnalysis.PhoneRe}', '<PHONE>', 'g')"
      piiCte + s""",
        |raw AS (SELECT doc_id, text FROM pii
        |        UNION ALL
        |        SELECT doc_id + 10000, text FROM pii WHERE doc_id % 5 = 0),
        |sc AS (SELECT doc_id, text,
        |$scores
        |  FROM raw),
        |b AS (SELECT *, $best AS best FROM sc),
        |lng AS (SELECT doc_id, text,
        |    CASE WHEN best = 0 THEN 'und'
        |            $chain
        |            END AS lang_pred FROM b),
        |gated AS (SELECT doc_id, text,
        |    regexp_replace(trim(text), '\\s+', ' ', 'g') AS norm
        |  FROM lng WHERE lang_pred = 'en'),
        |qual AS (SELECT doc_id, text,
        |    CAST(CASE WHEN norm = '' THEN 0
        |         ELSE length(norm) - length(replace(norm, ' ', '')) + 1 END AS BIGINT) AS n_toks,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) /
        |      greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio
        |  FROM gated),
        |red AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim($redacted)), '\\s+', ' ', 'g')) AS fp
        |  FROM qual WHERE n_toks >= 30 AND alpha_ratio > 0.55)
        |SELECT min(doc_id) AS doc_id, fp, count(*) AS n_copies
        |FROM red GROUP BY fp ORDER BY doc_id""".stripMargin
    },

    "q61_source_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin,

    "q60_length_histogram" ->
      """SELECT CAST(least(floor(n_chars / 100.0), 19) AS BIGINT) AS bin,
        |  count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q26_simhash_neardup" -> (nearDupCte +
      """,
        |th AS (SELECT doc_id, list(CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)) AS hs
        |  FROM (SELECT doc_id,
        |        unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |        FROM corpus)
        |  GROUP BY doc_id),
        |sh AS (SELECT doc_id,
        |  list_sum([CASE WHEN list_sum([((h >> i) & 1) * 2 - 1 FOR h IN hs]) >= 0
        |            THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END
        |            FOR i IN range(0, 60)]) AS sh
        |  FROM th),
        |quarters AS (SELECT doc_id, sh, q, (sh >> (q * 16)) & 65535 AS qkey
        |  FROM sh, range(0, 4) t(q)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sha, b.sh AS shb
        |  FROM quarters a JOIN quarters b
        |    ON a.q = b.q AND a.qkey = b.qkey AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(sha, shb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sha, shb)) <= 12 ORDER BY id_a, id_b""".stripMargin),

    "q29_embed_neardup" ->
      """WITH aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000, [CAST(x * CAST(2.0 AS FLOAT) AS FLOAT) FOR x IN embedding]
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |code AS (SELECT vec_id, embedding,
        |  list_sum([CASE WHEN list_sum([CAST(embedding[d] AS DOUBLE) *
        |      (CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(d - 1 AS VARCHAR)), 1, 15)) AS BIGINT)
        |       / 1152921504606846975.0 * 2 - 1)
        |      FOR d IN range(1, len(embedding) + 1)]) >= 0
        |    THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END FOR i IN range(0, 8)]) AS lsh_code
        |  FROM aug),
        |pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(b.embedding[d] AS DOUBLE)
        |            FOR d IN range(1, len(a.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(a.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(a.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(b.embedding[d] AS DOUBLE) * CAST(b.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(b.embedding) + 1)]))) AS cos
        |  FROM code a JOIN code b ON a.lsh_code = b.lsh_code AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |FROM pr WHERE cos > 0.999 ORDER BY id_a, id_b""".stripMargin,

    "q30_ann_topk" ->
      """WITH code AS (SELECT vec_id, embedding,
        |  list_sum([CASE WHEN list_sum([CAST(embedding[d] AS DOUBLE) *
        |      (CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(d - 1 AS VARCHAR)), 1, 15)) AS BIGINT)
        |       / 1152921504606846975.0 * 2 - 1)
        |      FOR d IN range(1, len(embedding) + 1)]) >= 0
        |    THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END FOR i IN range(0, 8)]) AS lsh_code
        |  FROM embeddings),
        |p AS (SELECT lsh_code AS pc, embedding AS pv FROM code ORDER BY vec_id LIMIT 1),
        |c AS (SELECT vec_id,
        |  list_sum([CAST(embedding[d] AS DOUBLE) * CAST(pv[d] AS DOUBLE)
        |            FOR d IN range(1, len(embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(embedding[d] AS DOUBLE) * CAST(embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(embedding) + 1)])) *
        |   sqrt(list_sum([CAST(pv[d] AS DOUBLE) * CAST(pv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(pv) + 1)]))) AS cos
        |  FROM code, p WHERE bit_count(xor(lsh_code, pc)) <= 2)
        |SELECT vec_id, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |FROM c ORDER BY c.cos DESC, vec_id LIMIT 10""".stripMargin,

    "q27_cosine_topk" ->
      """WITH p AS (SELECT embedding AS pv FROM embeddings ORDER BY vec_id LIMIT 1),
        |c AS (SELECT vec_id,
        |  list_sum([CAST(embedding[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |            FOR i IN range(1, len(embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |                  FOR i IN range(1, len(embedding) + 1)])) *
        |   sqrt(list_sum([CAST(pv[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |                  FOR i IN range(1, len(pv) + 1)]))) AS cos
        |  FROM embeddings, p)
        |SELECT vec_id, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |FROM c ORDER BY c.cos DESC, vec_id LIMIT 20""".stripMargin,

    "q28_cosine_threshold" ->
      """WITH p AS (SELECT embedding AS pv FROM embeddings ORDER BY vec_id LIMIT 1),
        |c AS (SELECT vec_id,
        |  list_sum([CAST(embedding[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |            FOR i IN range(1, len(embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |                  FOR i IN range(1, len(embedding) + 1)])) *
        |   sqrt(list_sum([CAST(pv[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)
        |                  FOR i IN range(1, len(pv) + 1)]))) AS cos
        |  FROM embeddings, p)
        |SELECT vec_id, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |FROM c WHERE cos > 0.15 ORDER BY vec_id""".stripMargin,

    "q31_events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

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

    "q45_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q46_token_freq" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,

    "q47_tfidf_terms" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
        |  WHERE term != '' GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
        |scored AS (SELECT doc_id, term,
        |  (CAST(tf AS DOUBLE) * CAST(nd + 1 AS DOUBLE)) / CAST(df + 1 AS DOUBLE) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, score,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        |  FROM scored)
        |SELECT doc_id, term, rnk, floor(score * 1000000 + 0.5) / 1000000 AS score
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "q48_shingle_novelty" -> (nearDupCte +
      """,
        |toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM corpus),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
        |  END AS sh FROM toks),
        |hp AS (SELECT DISTINCT doc_id,
        |  CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
        |dfreq AS (SELECT h, COUNT(*) AS df FROM hp GROUP BY h)
        |SELECT doc_id, COUNT(*) AS n_shingles,
        |  floor(SUM(CASE WHEN df > 1 THEN 1.0 ELSE 0.0 END) /
        |    CAST(COUNT(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS dup_frac
        |FROM hp JOIN dfreq USING (h) GROUP BY doc_id ORDER BY doc_id""".stripMargin),

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

    "q53_repetition" ->
      """WITH toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
        |  END AS sh FROM toks),
        |grams AS (SELECT doc_id, g, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(sh) AS g FROM sh) GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ngrams,
        |  floor(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS top_frac
        |FROM grams GROUP BY doc_id ORDER BY doc_id""".stripMargin,

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

    "q50_incremental_neardup" ->
      """WITH tagged AS (
        |  SELECT 'c' AS side, doc_id, text FROM documents
        |  UNION ALL
        |  SELECT 'n', doc_id + 10000, substr(text, strpos(text, ' ') + 1)
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT 'n', doc_id + 20000, text FROM documents WHERE doc_id % 13 = 0),
        |toks AS (SELECT side, doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM tagged),
        |sh AS (SELECT side, doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
        |  END AS sh FROM toks),
        |sig AS (SELECT side, doc_id, sh,
        |  [CAST(list_min([CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '#' || s), 1, 15)) AS BIGINT)
        |                  FOR s IN sh]) AS VARCHAR) FOR j IN range(0, 16)] AS sg
        |  FROM sh),
        |bands AS (SELECT side, doc_id, b,
        |  md5(array_to_string(sg[b*2+1:b*2+2], '|')) AS band_key
        |  FROM sig, range(0, 8) t(b)),
        |cand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
        |  FROM bands n JOIN bands c ON n.b = c.b AND n.band_key = c.band_key
        |  WHERE n.side = 'n' AND c.side = 'c'),
        |hsh AS (SELECT side, doc_id,
        |  list_distinct([CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) FOR s IN sh]) AS hs
        |  FROM sh),
        |pairs AS (SELECT new_id, corpus_id,
        |  CAST(len(list_intersect(n.hs, c.hs)) AS DOUBLE) /
        |  CAST(len(list_distinct(list_concat(n.hs, c.hs))) AS DOUBLE) AS j
        |  FROM cand
        |  JOIN hsh n ON n.side = 'n' AND n.doc_id = cand.new_id
        |  JOIN hsh c ON c.side = 'c' AND c.doc_id = cand.corpus_id)
        |SELECT new_id, corpus_id, floor(j * 10000 + 0.5) / 10000 AS jaccard
        |FROM pairs WHERE j >= 0.6 ORDER BY new_id, corpus_id""".stripMargin,

    "q49_ivf_topk" ->
      """WITH cent AS (SELECT vec_id AS cell, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |probe AS (SELECT embedding AS pv FROM embeddings ORDER BY vec_id LIMIT 1),
        |scored AS (SELECT e.vec_id, e.embedding, c.cell,
        |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(e.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(e.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
        |  FROM embeddings e CROSS JOIN cent c),
        |assigned AS (SELECT vec_id, embedding FROM (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
        |  FROM scored)
        |  WHERE rn = 1 AND cell IN (
        |    SELECT cell FROM (
        |      SELECT c.cell,
        |        list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(p.pv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]) /
        |        (sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                        FOR d IN range(1, len(c.cv) + 1)])) *
        |         sqrt(list_sum([CAST(p.pv[d] AS DOUBLE) * CAST(p.pv[d] AS DOUBLE)
        |                        FOR d IN range(1, len(p.pv) + 1)]))) AS pcos
        |      FROM cent c CROSS JOIN probe p)
        |    ORDER BY pcos DESC, cell LIMIT 2)),
        |c AS (SELECT a.vec_id,
        |  list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(p.pv[d] AS DOUBLE)
        |            FOR d IN range(1, len(a.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(a.embedding[d] AS DOUBLE) * CAST(a.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(a.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(p.pv[d] AS DOUBLE) * CAST(p.pv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(p.pv) + 1)]))) AS cos
        |  FROM assigned a CROSS JOIN probe p)
        |SELECT vec_id, floor(cos * 1000000 + 0.5) / 1000000 AS cos
        |FROM c ORDER BY c.cos DESC, vec_id LIMIT 10""".stripMargin,

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

    "q32_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image/png'
        |       WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |  CAST(least(strlen(text), 256) AS BIGINT) AS byte_len,
        |  64 AS width,
        |  4 AS n_features
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q110_dsv2_source" ->
      """SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars > 300
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q112_dsv2_write" ->
      """SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MAX('doc' || CAST(doc_id AS VARCHAR)) AS max_id
        |FROM documents WHERE n_chars <= 300
        |GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q108_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |  CAST(floor(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |    / 604800) AS BIGINT) AS week
        |  FROM events),
        |first AS (SELECT user_id, MIN(week) AS cohort FROM ev GROUP BY 1)
        |SELECT cohort, week, COUNT(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN first USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

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

    "q105_jsonl_roundtrip" ->
      """SELECT source, COUNT(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q104_csv_roundtrip" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  MAX(o_orderdate) AS max_date
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q102_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q99_corpus_report" ->
      """WITH t AS (SELECT doc_id, source, text,
        |  CAST(length(text) AS DOUBLE) AS n,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha
        |  FROM documents),
        |base AS (SELECT doc_id, source,
        |  floor(alpha / greatest(n, 1.0) * 10000 + 0.5) / 10000 AS alpha_ratio,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM t),
        |fpc AS (SELECT fp, COUNT(*) AS cnt FROM base GROUP BY 1),
        |toks AS (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |ft AS (SELECT doc_id, term FROM toks WHERE term != ''),
        |freq AS (SELECT term, COUNT(*) AS cf FROM ft GROUP BY 1),
        |rarew AS (SELECT term FROM freq WHERE cf <= 100),
        |pd AS (SELECT f.doc_id, COUNT(*) AS n_tokens,
        |    CAST(SUM(CASE WHEN r.term IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_rare
        |  FROM ft f LEFT JOIN rarew r ON f.term = r.term GROUP BY 1),
        |rr AS (SELECT doc_id,
        |  floor(CAST(n_rare AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS rr
        |  FROM pd WHERE n_tokens > 0)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
        |  CAST(SUM(CAST(alpha_ratio AS DECIMAL(18,4))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS mean_alpha_ratio,
        |  CASE WHEN SUM(CASE WHEN rr IS NOT NULL THEN 1 ELSE 0 END) > 0
        |       THEN CAST(SUM(CAST(rr AS DECIMAL(28,6))) AS DOUBLE) /
        |         CAST(SUM(CASE WHEN rr IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |  END AS mean_rare_ratio
        |FROM base JOIN fpc USING (fp) LEFT JOIN rr USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q97_corpus_diversity" -> (nearDupCte +
      """,
        |toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM corpus),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
        |  END AS sh FROM toks),
        |sig AS (SELECT doc_id,
        |  [CAST(list_min([CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '#' || s), 1, 15)) AS BIGINT)
        |                  FOR s IN sh]) AS VARCHAR) FOR j IN range(0, 16)] AS sg
        |  FROM sh),
        |lanes AS (SELECT j, sg[j + 1] AS v FROM sig, range(0, 16) t(j)),
        |counts AS (SELECT j, v, COUNT(*) AS c FROM lanes GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(c * (c - 1)) AS DECIMAL(38,0)) AS collisions FROM counts),
        |nn AS (SELECT COUNT(*) AS n FROM corpus)
        |SELECT n AS n_docs, 16 AS n_lanes, CAST(collisions AS BIGINT) AS collisions,
        |  CAST(collisions AS DOUBLE) /
        |    (16.0 * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS mean_jaccard_est
        |FROM tot CROSS JOIN nn""".stripMargin),

    "q96_audio_headers" ->
      """SELECT doc_id,
        |  'audio/wav' AS detected_mime,
        |  CASE WHEN doc_id % 3 = 2 THEN NULL
        |       ELSE ((doc_id % 50 + 1) * 1000 * 1000) // (doc_id % 100 * 100 + 8000)
        |  END AS duration_ms,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 16 ELSE 44 END AS BIGINT) AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin,

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

    "q95_bigram_merges" ->
      """WITH toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |sh AS (SELECT CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
        |       END AS sh FROM toks),
        |pairs AS (SELECT unnest(sh) AS pair FROM sh)
        |SELECT pair, COUNT(*) AS n FROM pairs
        |WHERE len(string_split(pair, ' ')) = 2
        |GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    "q93_inverted_index" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents)
        |SELECT term, doc_id, COUNT(*) AS tf FROM toks
        |WHERE term IN ('dup', 'vector', 'spark')
        |GROUP BY 1, 2 ORDER BY term, doc_id""".stripMargin,

    "q92_bloom_novel" ->
      """SELECT d.doc_id, d.n_chars FROM documents d
        |LEFT JOIN (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) c
        |  ON d.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL ORDER BY d.doc_id""".stripMargin,

    "q90_url_canonical" ->
      """WITH urls AS (SELECT doc_id,
        |  'HTTPS://Site' || CAST(doc_id % 5 AS VARCHAR) ||
        |  '.Example.COM/Path' || CAST(doc_id % 4 AS VARCHAR) ||
        |  CASE CAST(doc_id % 3 AS INTEGER)
        |    WHEN 0 THEN '/?utm_source=x&page=' || CAST(doc_id % 2 AS VARCHAR)
        |    WHEN 1 THEN '?utm_campaign=y'
        |    ELSE '/' END ||
        |  CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |c1 AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS u FROM urls),
        |c2a AS (SELECT doc_id,
        |  regexp_replace(u, '&(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*', '', 'g') AS u
        |  FROM c1),
        |c2b AS (SELECT doc_id,
        |  regexp_replace(u, '\?(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*&', '?', 'g') AS u
        |  FROM c2a),
        |c2 AS (SELECT doc_id,
        |  regexp_replace(u, '\?(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*$', '', 'g') AS u
        |  FROM c2b),
        |c3 AS (SELECT doc_id, regexp_replace(u, '[?&]+$', '', 'g') AS u FROM c2),
        |c4 AS (SELECT doc_id, u,
        |  regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0) AS auth
        |  FROM c3),
        |c5 AS (SELECT doc_id,
        |  lower(auth) || substr(u, strlen(auth) + 1, strlen(u)) AS u FROM c4),
        |c6 AS (SELECT doc_id, regexp_replace(u, '/+$', '', 'g') AS canon FROM c5)
        |SELECT canon, COUNT(*) AS n, min(doc_id) AS first_doc
        |FROM c6 GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q87_containment" -> (nearDupCte +
      """,
        |toks AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM corpus),
        |shl AS (SELECT doc_id,
        |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |       ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
        |  END AS sh FROM toks),
        |hs AS (SELECT DISTINCT doc_id,
        |  CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(sh) AS s FROM shl)),
        |hot AS (SELECT h FROM hs GROUP BY h HAVING COUNT(*) > 100),
        |cool AS (SELECT hs.doc_id, hs.h FROM hs
        |  LEFT JOIN hot ON hs.h = hot.h WHERE hot.h IS NULL),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM cool GROUP BY 1),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        |  FROM cool a JOIN cool b ON a.h = b.h AND a.doc_id != b.doc_id
        |  GROUP BY 1, 2),
        |sc AS (SELECT id_a, id_b, shared, n AS n_a,
        |  floor(CAST(shared AS DOUBLE) / CAST(n AS DOUBLE) * 10000 + 0.5) / 10000
        |    AS containment
        |  FROM shared JOIN sizes ON sizes.doc_id = shared.id_a)
        |SELECT id_a, id_b, shared, n_a, containment FROM sc
        |WHERE containment >= 0.5 ORDER BY id_a, id_b""".stripMargin),

    "q88_centroid_outliers" ->
      """WITH cent AS (SELECT vec_id AS cell, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (SELECT e.vec_id, c.cell,
        |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(e.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(e.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
        |  FROM embeddings e CROSS JOIN cent c),
        |asg AS (SELECT vec_id, cell, 1.0 - cos AS dist FROM (
        |  SELECT vec_id, cell, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
        |  FROM scored) WHERE rn = 1),
        |b AS (SELECT cell, quantile_cont(dist, 0.9) AS bound FROM asg GROUP BY 1)
        |SELECT asg.vec_id, CAST(asg.cell AS BIGINT) AS cell,
        |  floor(dist * 1000000 + 0.5) / 1000000 AS dist,
        |  floor(bound * 1000000 + 0.5) / 1000000 AS cutoff
        |FROM asg JOIN b ON asg.cell = b.cell
        |WHERE dist > bound ORDER BY asg.vec_id""".stripMargin,

    "q84_bloom_join" ->
      """WITH hi AS (SELECT o_orderkey AS l_orderkey, o_orderstatus
        |  FROM orders WHERE o_totalprice > 450000.0)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN hi USING (l_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q83_bm25" -> bm25OracleSql,

    // identical from-scratch SQL: the indexed path must reproduce the
    // scan path's ranking bit-for-bit
    "q94_bm25_indexed" -> bm25OracleSql,

    // and so must the incrementally-appended index
    "q98_bm25_incremental" -> bm25OracleSql,


    "q85_vocab_coverage" ->
      """WITH toks AS (SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |freq AS (SELECT term, COUNT(*) AS n FROM toks
        |  WHERE term != '' GROUP BY 1),
        |tot AS (SELECT CAST(SUM(CASE WHEN norm = '' THEN 0
        |    ELSE length(norm) - length(replace(norm, ' ', '')) + 1 END)
        |    AS BIGINT) AS t
        |  FROM (SELECT regexp_replace(trim(text), '\s+', ' ', 'g') AS norm
        |        FROM documents)),
        |top AS (SELECT term, n FROM freq ORDER BY n DESC, term LIMIT 20),
        |rk AS (SELECT term, n,
        |  row_number() OVER (ORDER BY n DESC, term) AS rnk FROM top)
        |SELECT term, n, rnk,
        |  CAST(SUM(n) OVER (ORDER BY rnk) AS DOUBLE) / CAST(t AS DOUBLE)
        |    AS coverage
        |FROM rk CROSS JOIN tot ORDER BY rnk""".stripMargin,

    "q86_rare_tokens" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |ft AS (SELECT doc_id, term FROM toks WHERE term != ''),
        |freq AS (SELECT term, COUNT(*) AS cf FROM ft GROUP BY 1),
        |rare AS (SELECT term FROM freq WHERE cf <= 100),
        |pd AS (SELECT f.doc_id, COUNT(*) AS n_tokens,
        |    CAST(SUM(CASE WHEN r.term IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_rare
        |  FROM ft f LEFT JOIN rare r ON f.term = r.term GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(pd.n_rare, 0) AS BIGINT) AS n_rare,
        |  CASE WHEN COALESCE(pd.n_tokens, 0) > 0
        |       THEN CAST(pd.n_rare AS DOUBLE) / CAST(pd.n_tokens AS DOUBLE)
        |  END AS rare_ratio
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q82_quantize_int8" ->
      """WITH s AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding,
        |    x -> abs(CAST(x AS DOUBLE)))) AS scale FROM embeddings),
        |z AS (SELECT vec_id, embedding, scale,
        |  CASE WHEN scale > 0 THEN list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) / scale * 127 + 0.5) AS INT))
        |  ELSE list_transform(embedding, x -> 0) END AS qv FROM s)
        |SELECT vec_id, scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  list_min(qv) AS q_min,
        |  list_max(qv) AS q_max,
        |  CAST(len(list_filter(qv, v -> abs(v) = 127)) AS BIGINT) AS n_sat,
        |  list_max([abs(CAST(embedding[i] AS DOUBLE) - qv[i] * scale / 127)
        |    FOR i IN range(1, len(embedding) + 1)]) AS max_abs_err
        |FROM z ORDER BY vec_id""".stripMargin,

    "q81_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id, translate(text, ' ', chr(10)) AS text
        |  FROM documents),
        |paras AS (SELECT doc_id,
        |  unnest([{'pos': i - 1, 'para': sp[i]} FOR i IN range(1, len(sp) + 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS sp FROM d)),
        |firsts AS (SELECT key, doc_id AS fid, pos AS fpos FROM (
        |  SELECT trim(s.para) AS key, doc_id, s.pos AS pos,
        |    row_number() OVER (PARTITION BY trim(s.para)
        |      ORDER BY doc_id, s.pos) AS rn
        |  FROM paras WHERE trim(s.para) <> '') WHERE rn = 1),
        |j AS (SELECT p.doc_id, p.s.pos AS pos, p.s.para AS para,
        |  (trim(p.s.para) = '' OR (p.doc_id = f.fid AND p.s.pos = f.fpos)) AS keep
        |  FROM paras p LEFT JOIN firsts f ON trim(p.s.para) = f.key)
        |SELECT doc_id,
        |  coalesce(array_to_string(list(para ORDER BY pos)
        |    FILTER (WHERE keep), chr(10)), '') AS dedup_text,
        |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_paras_kept,
        |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_paras_dropped
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q80_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q77_boilerplate_lines" ->
      """WITH d AS (SELECT doc_id, translate(text, ' ', chr(10)) AS text
        |  FROM documents),
        |lines AS (SELECT doc_id,
        |  unnest([{'pos': i - 1, 'line': sp[i]} FOR i IN range(1, len(sp) + 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS sp FROM d)),
        |boiler AS (SELECT trim(s.line) AS key FROM lines
        |  WHERE trim(s.line) <> '' GROUP BY 1
        |  HAVING count(DISTINCT doc_id) > 50),
        |j AS (SELECT l.doc_id, l.s.pos AS pos, l.s.line AS line,
        |  (b.key IS NOT NULL) AS dropped
        |  FROM lines l LEFT JOIN boiler b ON trim(l.s.line) = b.key)
        |SELECT doc_id,
        |  coalesce(array_to_string(list(line ORDER BY pos)
        |    FILTER (WHERE NOT dropped), chr(10)), '') AS clean_text,
        |  CAST(count(*) FILTER (WHERE NOT dropped) AS BIGINT) AS n_lines_kept,
        |  CAST(count(*) FILTER (WHERE dropped) AS BIGINT) AS n_lines_dropped
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

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

    // both Lloyd iterations unrolled: assignment (argmax cosine, ties to
    // the larger cell), DECIMAL-routed means, Float-rounded refined
    // centroids (empty cells keep their seed), then the second
    // assignment's aggregation — every stage replayed engine-side
    "q75_kmeans_refine" ->
      """WITH cent0 AS (SELECT vec_id AS cell, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |scored0 AS (SELECT e.vec_id, e.embedding, c.cell,
        |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(e.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(e.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
        |  FROM embeddings e CROSS JOIN cent0 c),
        |asg0 AS (SELECT vec_id, embedding, cell FROM (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
        |  FROM scored0) WHERE rn = 1),
        |pts0 AS (SELECT cell,
        |  unnest([{'d': d, 'v': CAST(embedding[d] AS DOUBLE)}
        |          FOR d IN range(1, len(embedding) + 1)]) AS s
        |  FROM asg0),
        |m0 AS (SELECT cell, s.d AS d,
        |  CAST(sum(CAST(s.v AS DECIMAL(28,12))) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE) AS mean
        |  FROM pts0 GROUP BY 1, 2),
        |cent1 AS (SELECT c0.cell,
        |  coalesce(m.arr, c0.cv) AS cv
        |  FROM cent0 c0 LEFT JOIN (
        |    SELECT cell, list(CAST(mean AS FLOAT) ORDER BY d) AS arr
        |    FROM m0 GROUP BY cell) m ON c0.cell = m.cell),
        |scored1 AS (SELECT e.vec_id, e.embedding, c.cell,
        |  list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |            FOR d IN range(1, len(e.embedding) + 1)]) /
        |  (sqrt(list_sum([CAST(e.embedding[d] AS DOUBLE) * CAST(e.embedding[d] AS DOUBLE)
        |                  FOR d IN range(1, len(e.embedding) + 1)])) *
        |   sqrt(list_sum([CAST(c.cv[d] AS DOUBLE) * CAST(c.cv[d] AS DOUBLE)
        |                  FOR d IN range(1, len(c.cv) + 1)]))) AS cos
        |  FROM embeddings e CROSS JOIN cent1 c),
        |asg1 AS (SELECT vec_id, embedding, cell FROM (
        |  SELECT vec_id, embedding, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
        |  FROM scored1) WHERE rn = 1),
        |pts1 AS (SELECT cell,
        |  unnest([{'d': d, 'v': CAST(embedding[d] AS DOUBLE)}
        |          FOR d IN range(1, len(embedding) + 1)]) AS s
        |  FROM asg1)
        |SELECT CAST(cell AS BIGINT) AS cell, CAST(s.d - 1 AS BIGINT) AS dim,
        |  count(*) AS n_members,
        |  floor(CAST(sum(CAST(s.v AS DECIMAL(28,12))) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean
        |FROM pts1 GROUP BY 1, 2 ORDER BY cell, dim""".stripMargin,

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
        |FROM documents ORDER BY doc_id""".stripMargin)
}
