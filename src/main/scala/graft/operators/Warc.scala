package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500, the Common Crawl wire format) record ingest — the
  * container walk a web-scale text pipeline runs before any document
  * operator can start. A WARC file is a sequence of records:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n  (+ more headers)
  * Content-Length: N\r\n
  * \r\n
  * <N payload bytes>\r\n\r\n
  * }}}
  *
  * Crawl archives deliver each record as its own gzip MEMBER inside a
  * `.warc.gz` — exactly the multi-member stream [[TextCompression.gunzip]]
  * drains, so gzipped inputs ride that tier (sniffed per payload) and
  * the parser always walks plain bytes.
  *
  * Refusal discipline matches the media tiers: bad magic, a header
  * block without CRLF termination, a missing/invalid Content-Length, a
  * payload overrunning the buffer, or a missing record separator make
  * the WHOLE payload refuse (None → zero rows) — a half-parsed crawl
  * file is corruption, not data. A record-count cap bounds memory
  * before any list materializes.
  *
  * For `response` records, [[httpBody]] splits the HTTP message at its
  * first blank line — header/body separation without any HTTP parsing
  * beyond the delimiter, which is all a text pipeline needs.
  *
  * All per-payload byte work runs inside `mapPartitions`; the explode
  * happens on parsed records.
  */
object Warc {

  val MaxRecords: Int = 100000

  final case class Record(warcType: String, recordId: String, date: String,
      targetUri: String, contentLength: Long, payload: Array[Byte])

  /** Parse a (already-inflated) WARC byte stream. None on any
    * structural damage. */
  def parseRecords(p: Array[Byte]): Option[Seq[Record]] = {
    if (p == null || p.length < 10) return None
    val out = Seq.newBuilder[Record]
    var i = 0
    var n = 0
    while (i < p.length) {
      if (n >= MaxRecords) return None // bound before growth
      // magic
      val magic = "WARC/1.0\r\n".getBytes("US-ASCII")
      if (i + magic.length > p.length ||
        !magic.indices.forall(k => p(i + k) == magic(k))) return None
      i += magic.length
      // headers until blank line
      var warcType: String = null
      var recordId: String = null
      var date: String = null
      var uri: String = null
      var len = -1L
      var blank = false
      while (!blank) {
        val eol = lineEnd(p, i)
        if (eol < 0) return None // header block never terminates
        if (eol == i) { blank = true; i = eol + 2 }
        else {
          val line = new String(p, i, eol - i, "US-ASCII")
          val sep = line.indexOf(':')
          if (sep <= 0) return None
          val k = line.substring(0, sep).trim.toLowerCase
          val v = line.substring(sep + 1).trim
          k match {
            case "warc-type" => warcType = v
            case "warc-record-id" => recordId = v
            case "warc-date" => date = v
            case "warc-target-uri" => uri = v
            case "content-length" =>
              len = try v.toLong catch { case _: NumberFormatException => return None }
            case _ => () // tolerated extension headers
          }
          i = eol + 2
        }
      }
      if (warcType == null || len < 0 || i + len > p.length) return None
      val payload = java.util.Arrays.copyOfRange(p, i, (i + len).toInt)
      i += len.toInt
      // record separator: two CRLFs (tolerating exact EOF after them)
      val sepBytes = "\r\n\r\n".getBytes("US-ASCII")
      if (i + sepBytes.length > p.length ||
        !sepBytes.indices.forall(k => p(i + k) == sepBytes(k))) return None
      i += sepBytes.length
      out += Record(warcType, recordId, date, uri, len, payload)
      n += 1
    }
    Some(out.result())
  }

  private def lineEnd(p: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < p.length) {
      if (p(i) == '\r' && p(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Split an HTTP message at its first blank line: (headerBytes,
    * bodyBytes); None when no blank line exists. */
  def httpBody(payload: Array[Byte]): Option[Array[Byte]] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return Some(java.util.Arrays.copyOfRange(payload, i + 4, payload.length))
      i += 1
    }
    None
  }

  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("warc_date", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType),
    StructField("body_length", LongType))) // response bodies; NULL otherwise

  /** One output row per WARC record of each input payload (gzip
    * payloads inflated through [[TextCompression]] first); a refused
    * payload contributes no rows. `body_length` is the HTTP body size
    * for `response` records with a well-formed header split. */
  def records(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.filterNot(_.name == payloadCol))
      .fields.foldLeft(new StructType())(_ add _)
    val full = recordSchema.fields.foldLeft(outSchema)(_ add _)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(full))
    val pIdx = df.schema.fieldIndex(payloadCol)
    val keep = df.schema.fields.indices.filterNot(_ == pIdx)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val raw = r.getAs[Array[Byte]](pIdx)
        val plain = TextCompression.decode(raw).map(_._2)
        plain.flatMap(parseRecords).getOrElse(Seq.empty).map { rec =>
          val body =
            if (rec.warcType == "response") httpBody(rec.payload).map(_.length.toLong)
            else None
          Row.fromSeq(keep.map(r.get) ++ Seq(rec.warcType, rec.recordId,
            rec.date, rec.targetUri, rec.contentLength, rec.payload,
            body.map(java.lang.Long.valueOf).orNull))
        }
      }
    }(enc)
  }

  // ------------------------------------------------------------ fixture

  /** Assemble a conformant WARC stream (optionally one gzip member per
    * record, the crawl convention) for gates/specs. */
  def encode(records: Seq[Record], gzipPerRecord: Boolean): Array[Byte] = {
    def one(r: Record): Array[Byte] = {
      val sb = new StringBuilder()
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: ${r.warcType}\r\n")
      sb.append(s"WARC-Record-ID: ${r.recordId}\r\n")
      sb.append(s"WARC-Date: ${r.date}\r\n")
      if (r.targetUri != null) sb.append(s"WARC-Target-URI: ${r.targetUri}\r\n")
      sb.append(s"Content-Length: ${r.payload.length}\r\n\r\n")
      sb.toString.getBytes("US-ASCII") ++ r.payload ++
        "\r\n\r\n".getBytes("US-ASCII")
    }
    val parts = records.map(one)
    if (gzipPerRecord) parts.map(TextCompression.gzip).reduce(_ ++ _)
    else parts.reduce(_ ++ _)
  }
}
