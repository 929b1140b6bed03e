package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value normalization — the Spark-native form of the reference's
  * per-record, per-field type dispatch
  * (reference: lib/DataProcessor.py:27-63). Everything here is a built-in
  * Catalyst expression: codegen'd, null-safe, no UDFs.
  */
object Normalize {

  /** Cast a column per its declared source type
    * (reference: lib/DataProcessor.py:40-63). */
  def castTo(c: Column, sourceType: String): Column = sourceType match {
    case "singleLineText" | "multilineText" => c.cast("string")
    case "number" => c.cast("double")
    case "checkbox" => c.cast("boolean")
    // Lenient datetime parsing (reference uses dateutil.parser.parse,
    // lib/DataProcessor.py:50-57) — but gated on ISO-8601 shape so that
    // bare numbers don't "parse" (reference hazard: parser.parse("5")
    // succeeds, lib/DataProcessor.py:135-140).
    case "date" => to_date(c.cast("string"))
    case "dateTime" => lenientTimestamp(c.cast("string"))
    // Attachment arrays keep only the url (reference: lib/DataProcessor.py:58-59).
    case "multipleAttachments" => transform(c, a => a.getField("url"))
    case "multipleSelects" => c.cast("array<string>")
    case _ => c // pass-through (reference: lib/DataProcessor.py:62-63)
  }

  /** Multi-format timestamp parse: ISO-8601 with/without zone or millis,
    * date-only, plus the common non-ISO shapes the reference's dateutil
    * accepts freeform (lib/DataProcessor.py:51-57) — RFC-1123, US slash
    * dates, and written-out month forms; first match wins (naive
    * datetimes are assumed UTC; session TZ is pinned to UTC).
    *
    * Every non-ISO shape sits behind an ANCHORED rlike guard: the guard
    * is the auditable contract of what this column accepts, and it makes
    * the bare-number hazard structurally impossible (dateutil's
    * parse("5") succeeds — SURVEY §2.8 F3; nothing here can match a bare
    * number). Slash dates read as US month-first by deliberate, stated
    * choice — a day-first feed must not route through this parser. */
  def lenientTimestamp(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd")),
    // RFC-1123 / HTTP-date: "Thu, 01 Feb 2024 10:30:00 GMT". Spark 3+'s
    // parser bans day-of-week fields in parse patterns, so the guarded
    // "EEE, " prefix is stripped rather than parsed — the day name is
    // decorative in RFC-1123 (the date fields alone fix the instant; an
    // inconsistent name changes nothing, exactly dateutil's behavior)
    when(c.rlike("^[A-Za-z]{3}, \\d{2} [A-Za-z]{3} \\d{4} " +
        "\\d{2}:\\d{2}:\\d{2} GMT$"),
      try_to_timestamp(regexp_replace(c, "^[A-Za-z]{3}, ", ""),
        lit("dd MMM yyyy HH:mm:ss 'GMT'"))),
    // US slash datetime / date: "02/01/2024 08:15:00", "02/01/2024"
    when(c.rlike("^\\d{2}/\\d{2}/\\d{4} \\d{2}:\\d{2}:\\d{2}$"),
      try_to_timestamp(c, lit("MM/dd/yyyy HH:mm:ss"))),
    when(c.rlike("^\\d{2}/\\d{2}/\\d{4}$"),
      try_to_timestamp(c, lit("MM/dd/yyyy"))),
    // "01 Feb 2024" and "Feb 1, 2024"
    when(c.rlike("^\\d{2} [A-Za-z]{3} \\d{4}$"),
      try_to_timestamp(c, lit("dd MMM yyyy"))),
    when(c.rlike("^[A-Za-z]{3} \\d{1,2}, \\d{4}$"),
      try_to_timestamp(c, lit("MMM d, yyyy"))))

  /** "Looks like a datetime" probe, restricted to ISO shapes — the strict
    * replacement for the reference's try-parse
    * (reference: lib/DataProcessor.py:135-140). */
  def isDatetimeLike(c: Column): Column =
    c.rlike("^\\d{4}-\\d{2}-\\d{2}([T ]\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?([+-]\\d{2}:?\\d{2}|Z)?)?$")

  /** Strip tabs and trim — applied to every string leaf on export
    * (reference: lib/utils.py:28). */
  def cleanString(c: Column): Column = trim(regexp_replace(c, "[\\t]+", ""))

  /** Unicode NFC normalization via the native codegen'd
    * [[NfcNormalize]] expression (already-NFC rows return the input
    * UTF8String untouched — quick-check only, no allocation). */
  def nfc(c: Column): Column =
    org.apache.spark.sql.graftbridge.column(NfcNormalize(
      org.apache.spark.sql.graftbridge.expression(c)))

  /** Accent-fold + casefold canonical dedup key via the native
    * codegen'd [[AccentFold]] expression (NFD, strip non-spacing marks,
    * root-locale lowercase; lowercase-ASCII rows pass through
    * untouched). */
  def accentFold(c: Column): Column =
    org.apache.spark.sql.graftbridge.column(AccentFold(
      org.apache.spark.sql.graftbridge.expression(c)))

  /** Drop rows whose primary key is null or empty; the reference counts and
    * warns per skipped record (reference: lib/DataProcessor.py:79-82,94-95). */
  def filterValidPk(df: DataFrame, pk: String): DataFrame =
    df.filter(col(pk).isNotNull && col(pk).cast("string") =!= "")

  /** [[filterValidPk]] with the reference's skip counter surfaced as
    * observed metrics (`skipped_rows`, `input_rows`) — collected as a
    * side-output of whatever action runs downstream, no extra job
    * (reference warns per skipped record: lib/DataProcessor.py:94-95). */
  def filterValidPkObserved(df: DataFrame, pk: String,
      obs: org.apache.spark.sql.Observation): DataFrame = {
    val invalid = col(pk).isNull || col(pk).cast("string") === ""
    df.observe(obs,
      sum(when(invalid, 1L).otherwise(0L)).as("skipped_rows"),
      count(lit(1)).as("input_rows"))
      .filter(!invalid)
  }

  /** Recursive key exclusion + string cleanup over nested structures
    * (reference: lib/utils.py:7-31): drop listed fields at any struct
    * depth, clean every string leaf. Arrays of structs are transformed
    * element-wise. */
  def cleanProjection(df: DataFrame, dropKeys: Set[String]): DataFrame = {
    import org.apache.spark.sql.types._
    def rewrite(c: Column, dt: DataType): Column = dt match {
      case StringType => cleanString(c)
      case st: StructType =>
        val kept = st.fields.filterNot(f => dropKeys(f.name))
        if (kept.isEmpty) lit(null) else
          struct(kept.toSeq.map(f => rewrite(c.getField(f.name), f.dataType).as(f.name)): _*)
      case ArrayType(et, _) => transform(c, e => rewrite(e, et))
      case _ => c
    }
    val cols = df.schema.fields.filterNot(f => dropKeys(f.name)).toSeq
      .map(f => rewrite(col(f.name), f.dataType).as(f.name))
    df.select(cols: _*)
  }
}
