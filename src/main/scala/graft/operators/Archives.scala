package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Archive-container triage — the ingest-side census for corpora that
  * arrive as ZIP bundles (Common-Crawl-style deliveries, scanned-doc
  * batches): entry counts and size totals read from the CENTRAL
  * DIRECTORY alone, no entry is ever decompressed. The same honesty
  * contract as the media header walks: a payload whose directory is
  * truncated or inconsistent reports NULLs, never a guess. */
object Archives {

  private def le16(p: Array[Byte], i: Int): Int =
    ((p(i + 1) & 0xFF) << 8) | (p(i) & 0xFF)
  private def le32(p: Array[Byte], i: Int): Long =
    ((p(i + 3) & 0xFFL) << 24) | ((p(i + 2) & 0xFFL) << 16) |
      ((p(i + 1) & 0xFFL) << 8) | (p(i) & 0xFFL)

  final case class ZipSummary(nEntries: Int, bytesComp: Long, bytesUncomp: Long)

  /** End-of-central-directory scan (backward — archives may carry a
    * trailing comment) + central-directory walk: per entry the
    * compressed/uncompressed sizes and the variable-length tail
    * (name/extra/comment) hop. The walk REFUSES the archive (None)
    * when the directory runs past the EOCD, an entry signature is
    * wrong, or the walked count disagrees with the EOCD's total. */
  private[graft] def parseZip(p: Array[Byte]): Option[ZipSummary] = {
    var i = p.length - 22
    var found = -1
    while (i >= 0 && found < 0) {
      if (p(i) == 'P' && p(i + 1) == 'K' && p(i + 2) == 5 && p(i + 3) == 6)
        found = i
      i -= 1
    }
    if (found < 0) return None
    val nTotal = le16(p, found + 10)
    val cdSize = le32(p, found + 12)
    val cdOff = le32(p, found + 16)
    if (cdOff < 0 || cdOff + cdSize > found) return None
    var pos = cdOff.toInt
    var cnt = 0
    var comp = 0L
    var un = 0L
    while (cnt < nTotal) {
      if (pos + 46 > found || p(pos) != 'P' || p(pos + 1) != 'K' ||
          p(pos + 2) != 1 || p(pos + 3) != 2) return None
      comp += le32(p, pos + 20)
      un += le32(p, pos + 24)
      pos += 46 + le16(p, pos + 28) + le16(p, pos + 30) + le16(p, pos + 32)
      cnt += 1
    }
    Some(ZipSummary(cnt, comp, un))
  }

  val zipMetaSchema: StructType = StructType(Seq(
    StructField("n_entries", IntegerType),
    StructField("bytes_comp", LongType),
    StructField("bytes_uncomp", LongType),
    StructField("byte_len", LongType)))

  /** Attach the directory summary to a frame of binary payloads —
    * mapPartitions, byte-level work, the [[Multimodal.withDecodedMeta]]
    * batch shape. Unparseable payloads carry NULL counts/sizes with
    * their byte length intact. */
  def withZipMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = df.schema.add(StructField("zip", zipMetaSchema))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val meta =
          if (payload == null) null
          else parseZip(payload) match {
            case Some(z) => Row(Int.box(z.nEntries), Long.box(z.bytesComp),
              Long.box(z.bytesUncomp), payload.length.toLong)
            case None => Row(null, null, null, payload.length.toLong)
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }
}
