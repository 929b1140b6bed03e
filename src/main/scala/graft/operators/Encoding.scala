package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Character-encoding triage and mojibake repair — the text tier's
  * answer to what crawl data actually looks like: a mix of UTF-8,
  * legacy single-byte pages, and DOUBLE-ENCODED text (UTF-8 bytes that
  * some hop decoded as Latin-1 and re-encoded, the "Ã©"-for-"é"
  * corruption the public `ftfy` tool exists to fix).
  *
  *  - [[utf8Valid]]: strict RFC 3629 validation walk — overlong forms,
  *    UTF-16 surrogate range, > U+10FFFF, and truncated sequences all
  *    reject (the JDK decoder's lenient replacement behavior would
  *    silently launder damage into U+FFFD)
  *  - [[decodeBytes]]: BOM-stripped UTF-8 when valid, Latin-1
  *    otherwise (every byte sequence is valid Latin-1, so the fallback
  *    is total and deterministic — no confidence heuristics)
  *  - [[repairDoubleEncoded]]: while every char fits one byte and the
  *    Latin-1 re-encoding is valid UTF-8 that decodes to STRICTLY
  *    fewer chars (real multi-byte sequences, not ASCII identity),
  *    undo one round of the corruption; bounded rounds
  *
  * The DataFrame face tags each payload with (encoding, text, bom,
  * repaired, n_chars) inside `mapPartitions` — byte walks are
  * imperative, nothing shuffles payloads.
  */
object Encoding {

  /** Strict UTF-8 validity (RFC 3629). */
  def utf8Valid(b: Array[Byte], from: Int = 0): Boolean = {
    if (b == null) return false
    var i = from
    def cont(j: Int): Boolean = j < b.length && (b(j) & 0xC0) == 0x80
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // stray continuation / overlong C0-C1
      else if (c < 0xE0) {
        if (!cont(i + 1)) return false
        i += 2
      } else if (c < 0xF0) {
        if (!cont(i + 1) || !cont(i + 2)) return false
        val c1 = b(i + 1) & 0xFF
        if (c == 0xE0 && c1 < 0xA0) return false // overlong
        if (c == 0xED && c1 > 0x9F) return false // surrogates
        i += 3
      } else if (c < 0xF5) {
        if (!cont(i + 1) || !cont(i + 2) || !cont(i + 3)) return false
        val c1 = b(i + 1) & 0xFF
        if (c == 0xF0 && c1 < 0x90) return false // overlong
        if (c == 0xF4 && c1 > 0x8F) return false // > U+10FFFF
        i += 4
      } else return false
      }
    true
  }

  private val Bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)

  /** (encoding, text, hadBom): UTF-8 (BOM stripped) when valid, else
    * Latin-1 — total and deterministic. */
  def decodeBytes(p: Array[Byte]): (String, String, Boolean) = {
    val bom = p.length >= 3 && p(0) == Bom(0) && p(1) == Bom(1) && p(2) == Bom(2)
    val start = if (bom) 3 else 0
    if (utf8Valid(p, start))
      ("utf-8", new String(p, start, p.length - start,
        java.nio.charset.StandardCharsets.UTF_8), bom)
    else
      ("latin-1", new String(p, java.nio.charset.StandardCharsets.ISO_8859_1),
        false)
  }

  /** Undo double-encoding rounds; (repairedText, didRepair). */
  def repairDoubleEncoded(s: String, maxRounds: Int = 3): (String, Boolean) = {
    var cur = s
    var did = false
    var rounds = 0
    var again = true
    while (again && rounds < maxRounds) {
      again = false
      if (cur.nonEmpty && cur.forall(_ < 0x100) && cur.exists(_ >= 0x80)) {
        val bytes = cur.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        if (utf8Valid(bytes)) {
          val dec = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          if (dec.length < cur.length) { // real multibyte sequences undone
            cur = dec; did = true; again = true; rounds += 1
          }
        }
      }
    }
    (cur, did)
  }

  val textMetaSchema: StructType = StructType(Seq(
    StructField("encoding", StringType),
    StructField("text", StringType),
    StructField("bom", BooleanType),
    StructField("repaired", BooleanType),
    StructField("n_chars", LongType)))

  /** Decode + repair a binary payload column into a `ctext` struct;
    * NULL payload → NULL struct. */
  def decodedText(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema.add(StructField("ctext", textMetaSchema))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](pIdx)
        val meta = if (p == null) null else {
          val (encName, raw, bom) = decodeBytes(p)
          val (text, repaired) =
            if (encName == "utf-8") repairDoubleEncoded(raw) else (raw, false)
          Row(encName, text, bom, repaired, text.codePointCount(0, text.length).toLong)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }
}
