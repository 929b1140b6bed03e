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

  final case class TarSummary(nEntries: Int, bytesTotal: Long)

  /** POSIX ustar walk — the uncompressed sibling of [[parseZip]] for
    * corpora delivered as tarballs: 512-byte header blocks (name, octal
    * size, octal checksum, "ustar" magic at offset 257), each followed
    * by ceil(size/512) data blocks, terminated by a zero block (or
    * clean EOF). The walk REFUSES the archive (None) on a bad magic, a
    * malformed octal field, a failed header CHECKSUM (sum of header
    * bytes with the checksum field as spaces — the format's own
    * integrity word), or data running past the payload. Nothing is
    * ever extracted. */
  private[graft] def parseTar(p: Array[Byte]): Option[TarSummary] = {
    // octal field: leading spaces tolerated, digits, NUL/space terminated
    def octal(off: Int, len: Int): Option[Long] = {
      var i = off
      val end = off + len
      while (i < end && p(i) == ' ') i += 1
      var v = 0L
      var any = false
      while (i < end && p(i) >= '0' && p(i) <= '7') {
        v = v * 8 + (p(i) - '0'); any = true; i += 1
      }
      // the remainder must be NUL/space padding only — a stray byte in
      // an octal field is corruption, not a number
      while (i < end && (p(i) == 0 || p(i) == ' ')) i += 1
      if (any && i == end) Some(v) else None
    }
    def zeroBlock(off: Int): Boolean = {
      var i = off
      while (i < off + 512) { if (p(i) != 0) return false; i += 1 }
      true
    }
    var pos = 0
    var entries = 0
    var total = 0L
    while (pos + 512 <= p.length) {
      if (zeroBlock(pos)) return Some(TarSummary(entries, total))
      // magic "ustar" at 257 (POSIX "ustar\0" or GNU "ustar ")
      if (p(pos + 257) != 'u' || p(pos + 258) != 's' || p(pos + 259) != 't' ||
          p(pos + 260) != 'a' || p(pos + 261) != 'r') return None
      // checksum: header bytes with the chksum field (148..155) as spaces
      var sum = 0L
      var i = pos
      while (i < pos + 512) {
        sum += (if (i - pos >= 148 && i - pos < 156) ' '.toLong
                else (p(i) & 0xFF).toLong)
        i += 1
      }
      val declared = octal(pos + 148, 8).getOrElse(return None)
      if (declared != sum) return None
      val size = octal(pos + 124, 12).getOrElse(return None)
      if (size < 0) return None
      val dataBlocks = ((size + 511) / 512).toInt
      val next = pos + 512 + dataBlocks * 512
      if (next > p.length) return None // truncated data
      entries += 1
      total += size
      pos = next
    }
    // clean EOF without a zero terminator is accepted (many writers);
    // a PARTIAL trailing header is not
    if (pos == p.length && entries > 0) Some(TarSummary(entries, total))
    else None
  }

  val tarMetaSchema: StructType = StructType(Seq(
    StructField("n_entries", IntegerType),
    StructField("bytes_total", LongType),
    StructField("byte_len", LongType)))

  /** Attach the tar walk summary to a frame of binary payloads —
    * same batch shape as [[withZipMeta]]. */
  def withTarMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = df.schema.add(StructField("tar", tarMetaSchema))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val meta =
          if (payload == null) null
          else parseTar(payload) match {
            case Some(t) => Row(Int.box(t.nEntries), Long.box(t.bytesTotal),
              payload.length.toLong)
            case None => Row(null, null, payload.length.toLong)
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }
}
