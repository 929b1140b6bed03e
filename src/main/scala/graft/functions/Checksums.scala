package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical row/table checksums for change detection.
  *
  * The reference md5's a canonical JSON of each record: filter to a field
  * set, normalize values, sort keys, serialize, hash
  * (reference: lib/DataProcessor.py:99-168). The Spark form fixes the
  * struct field order at plan time (sorted names = sorted keys) and lets
  * `to_json` do canonical serialization — nulls are dropped, which matches
  * the reference's absent-field semantics for sparse rows.
  *
  * Checksums must be *internally* consistent (same input -> same hash on
  * both sides of a diff), not byte-identical to the reference's Python
  * json.dumps form — the oracle compares query outputs, never reference
  * hashes (SURVEY.md §7.4).
  */
object Checksums {

  /** Columns that must never feed a checksum: nondeterministic or
    * engine-managed (reference excludes them implicitly by hashing the
    * *source* record's field set — lib/UpdateStrategies.py:144,217). */
  val SystemColumns: Set[String] = Set(
    "doc_id", "update_type", "write_timestamp", "is_deleted", "version",
    "version_id", "start_date", "end_date", "latest", "table_checksum",
    "table_data", "metadata", "_record_id", "_created_time", "_ck", "_action")

  /** MD5 over canonical JSON of the given fields, key-sorted
    * (reference: lib/DataProcessor.py:99-114). Timestamps serialize as
    * ISO-8601 UTC via to_json (reference: lib/DataProcessor.py:116-133). */
  def rowChecksum(fields: Seq[String]): Column = {
    val ordered = fields.filterNot(SystemColumns).sorted
    md5(to_json(struct(ordered.map(col): _*)))
  }

  /** Row checksum over all non-system columns of `df`. */
  def rowChecksum(df: DataFrame): Column = rowChecksum(df.columns.toSeq)

  /** 60-bit numeric md5 prefix of a string — the engine's portable hash:
    * reproducible in any SQL engine (DuckDB:
    * `CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)`), and numeric, so
    * aggregations over it stay in HashAggregate and array set-ops run on
    * fixed-width values. Computed by the native [[Md5Prefix60]] expression
    * (digest bytes -> long, no hex round-trip); bit-identical to the
    * composable `conv(substring(md5(c), 1, 15), 16, 10)` form. */
  def md5PrefixLong(c: Column): Column =
    org.apache.spark.sql.graftbridge.column(Md5Prefix60(
      org.apache.spark.sql.graftbridge.expression(c.cast("string"))))

  /** Length-prefixed canonical encoding of one value: `v<len>:<text>` for
    * non-null, `n` for null. The length prefix removes delimiter-collision
    * ambiguity ("a|b"+"x" hashing like "a"+"b|x"), and the whole form is
    * reproducible verbatim in any SQL engine — the DuckDB oracle writes
    * `coalesce('v' || length(x::varchar) || ':' || x::varchar, 'n')`. */
  def portableValue(c: Column): Column = {
    val s = c.cast("string")
    coalesce(concat(lit("v"), length(s).cast("string"), lit(":"), s), lit("n"))
  }

  /** Portable canonical checksum: md5 over '|'-joined length-prefixed
    * string encodings (see [[portableValue]]). Unlike to_json (whose
    * rendering is engine-specific) this reproduces verbatim in any SQL
    * engine, so oracles can recompute it. */
  def portableRowChecksum(fields: Seq[String]): Column = {
    val ordered = fields.filterNot(SystemColumns).sorted
    md5(concat_ws("|", ordered.map(f => portableValue(col(f))): _*))
  }

  /** Table checksum: md5 over the pk-sorted concatenation of per-row
    * canonical strings (reference: lib/DataProcessor.py:150-168 hashes
    * {metadata, data:{pk -> record}} as one JSON). Aggregates partial
    * per-partition (collect_list is map-side combined); the final sort is
    * O(n log n) on the driver row only.
    *
    * At 100 TB scale prefer [[orderInsensitiveChecksum]]: a commutative
    * reduction with no collect, no sort, no single-point aggregation.
    */
  def tableChecksum(df: DataFrame, pk: String, fields: Seq[String]): DataFrame = {
    val rowJson = to_json(struct(fields.filterNot(SystemColumns).sorted.map(col): _*))
    df.select(concat_ws(":", col(pk).cast("string"), rowJson).as("_row"))
      .agg(md5(concat_ws("\n", sort_array(collect_list(col("_row"))))).as("table_checksum"))
  }

  /** Portable table checksum: md5 over the sorted '\n'-joined per-row
    * portable encodings — recomputable in DuckDB as
    * `md5(string_agg(rowenc, chr(10) ORDER BY rowenc))`. */
  def portableTableChecksum(df: DataFrame, pk: String, fields: Seq[String]): DataFrame = {
    val ordered = fields.filterNot(SystemColumns).sorted
    val enc = concat_ws("|", (pk +: ordered).distinct.map(f => portableValue(col(f))): _*)
    df.select(enc.as("_row"))
      .agg(md5(concat_ws("\n", sort_array(collect_list(col("_row"))))).as("table_checksum"))
  }

  /** Order-insensitive table digest: sum + xor of per-row xxhash64 values.
    * Commutative and associative -> partial aggregation on every executor,
    * constant-size state, no row materialization. The scale path for
    * change detection over very large tables. */
  /** Anti-entropy bucket diff — Merkle-style divergence LOCALIZATION
    * between two replicas of a keyed table (a source and a lagging or
    * corrupted copy): each side folds into `nBuckets` order-insensitive
    * bucket digests (sum of per-row portable md5-prefix hashes, plus a
    * row count), and only buckets whose digests disagree surface. The
    * reference's whole-table checksum (lib/DataProcessor.py:150-168)
    * answers "did anything change?"; this answers "WHERE?" with
    * 16 bytes of state per bucket — at 100 TB the repair job then
    * rescans ~n/nBuckets rows per diverged bucket instead of the
    * table. Digest collisions need a ~2^-60-per-bucket accident AND
    * equal row counts. Output: one row per diverged bucket
    * (bucket, n_src, n_tgt) ordered by bucket. */
  def bucketDivergence(src: DataFrame, tgt: DataFrame, pk: String,
      fields: Seq[String], nBuckets: Int = 256): DataFrame = {
    val ordered = (pk +: fields.filterNot(SystemColumns).sorted).distinct
    def side(df: DataFrame, tag: String): DataFrame = {
      val enc = concat_ws("|", ordered.map(f => portableValue(col(f))): _*)
      df.select(pmod(col(pk).cast("long"), lit(nBuckets)).as("bucket"),
          md5PrefixLong(enc).as("h"))
        .groupBy("bucket")
        .agg(sum(col("h").cast("decimal(38,0)")).as(s"sum_$tag"),
          count(lit(1)).as(s"n_$tag"))
    }
    side(src, "src").join(side(tgt, "tgt"), Seq("bucket"), "full")
      .filter(!(coalesce(col("n_src"), lit(0L)) === coalesce(col("n_tgt"), lit(0L)) &&
        coalesce(col("sum_src"), lit(0L).cast("decimal(38,0)")) ===
          coalesce(col("sum_tgt"), lit(0L).cast("decimal(38,0)"))))
      .select(col("bucket"), coalesce(col("n_src"), lit(0L)).as("n_src"),
        coalesce(col("n_tgt"), lit(0L)).as("n_tgt"))
      .orderBy("bucket")
  }

  def orderInsensitiveChecksum(df: DataFrame, fields: Seq[String]): DataFrame = {
    val ordered = fields.filterNot(SystemColumns).sorted
    val h = xxhash64(to_json(struct(ordered.map(col): _*)))
    df.agg(
      sum(h).as("sum_hash"),
      // bit_xor aggregate via expr — commutative second digest lane
      expr("bit_xor(xxhash64(to_json(struct(" + ordered.map(f => s"`$f`").mkString(",") + "))))").as("xor_hash"),
      count(lit(1)).as("n_rows"))
  }
}
