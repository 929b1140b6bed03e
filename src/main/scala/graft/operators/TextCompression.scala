package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Compressed-text ingest — the decode tier a training-data lake needs
  * before any text operator can run: corpora arrive as gzip members
  * (WET/WARC-style dumps, log shippers) or raw zlib streams, one payload
  * per record. The reference ships attachments/fields as opaque values
  * (lib/DataProcessor.py treats non-scalar payloads as pass-through);
  * this engine decodes them for the text pipeline, with the same
  * discipline as the raster tier ([[Multimodal]]): refusal is honest
  * NULL (never a crash, never a half-decoded row), bombs are refused by
  * an output cap BEFORE the memory exists, and the decode runs inside
  * `mapPartitions` so codec buffers amortize per batch and nothing
  * shuffles payload bytes.
  *
  * Codec tier is the JVM's built-in `java.util.zip` (the same tier the
  * PNG decoder rides): gzip via `GZIPInputStream` — CRC-32 and ISIZE
  * trailers VERIFIED per member, concatenated multi-member streams
  * drained member by member — and raw zlib via `Inflater` (Adler-32
  * verified). Truncation, trailer mismatch, or garbage mid-stream all
  * land in the refusal class.
  */
object TextCompression {

  /** Default decompression-bomb cap: 64 MiB of output per payload. */
  val DefaultMaxOut: Int = 64 * 1024 * 1024

  /** Cheap codec sniff from magic bytes: "gzip" (1F 8B), "zlib"
    * (CMF/FLG pair: deflate method, FCHECK consistent), else "plain". */
  def sniff(p: Array[Byte]): String =
    if (p == null) "none"
    else if (p.length >= 2 && (p(0) & 0xFF) == 0x1F && (p(1) & 0xFF) == 0x8B) "gzip"
    else if (p.length >= 2 && (p(0) & 0x0F) == 8 && (p(0) & 0xFF) <= 0x78 &&
      (((p(0) & 0xFF) << 8) | (p(1) & 0xFF)) % 31 == 0) "zlib"
    else "plain"

  /** Inflate a gzip payload (all members). None on any structural damage
    * — truncation, CRC-32/ISIZE mismatch, bad header — or cap overrun. */
  def gunzip(p: Array[Byte], maxOut: Int = DefaultMaxOut): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(p))
      readCapped(in, maxOut)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Inflate a raw zlib payload. The Inflater is driven directly (not
    * through InflaterInputStream) so stream-end is checked explicitly:
    * `finished()` fires only after the Adler-32 trailer VERIFIES (a
    * mismatch throws DataFormatException), and input exhaustion before
    * that is truncation — both land in None. */
  def inflateZlib(p: Array[Byte], maxOut: Int = DefaultMaxOut): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(p)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var total = 0L
      var done = false
      while (!done) {
        val n = inf.inflate(buf)
        if (n > 0) {
          total += n
          if (total > maxOut) { inf.end(); return None } // bomb: refuse
          out.write(buf, 0, n)
        } else if (inf.finished()) done = true
        else { inf.end(); return None } // truncated / needs dictionary
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  private def readCapped(in: java.io.InputStream, maxOut: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      if (total > maxOut) { in.close(); return None } // bomb: refuse pre-alloc
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    in.close()
    Some(out.toByteArray)
  }

  /** Sniff + decode: (codec, bytes) — "plain" passes through untouched;
    * damaged compressed payloads are None (refusal, not passthrough: a
    * gzip-magic payload that fails its own CRC is damage, and feeding
    * its raw bytes to a text pipeline would poison the corpus). */
  def decode(p: Array[Byte], maxOut: Int = DefaultMaxOut): Option[(String, Array[Byte])] =
    sniff(p) match {
      case "gzip" => gunzip(p, maxOut).map(("gzip", _))
      case "zlib" => inflateZlib(p, maxOut).map(("zlib", _))
      case "plain" => Some(("plain", p))
      case _ => None
    }

  // encode side (fixtures + the export path's symmetric face)
  def gzip(p: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(p); g.close()
    bos.toByteArray
  }
  def zlib(p: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(p); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  val ztextSchema: StructType = StructType(Seq(
    StructField("codec", StringType),
    StructField("text", StringType),
    StructField("compressed_bytes", LongType),
    StructField("text_bytes", LongType)))

  /** Decode a binary payload column into `ztext` (codec, UTF-8 text,
    * size accounting): NULL struct on refusal or NULL payload. Byte
    * work stays inside the partition — the only thing that ever
    * shuffles downstream is what the caller projects. */
  def decompressedText(df: DataFrame, payloadCol: String = "payload",
      maxOut: Int = DefaultMaxOut): DataFrame = {
    val outSchema = df.schema.add(StructField("ztext", ztextSchema))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](pIdx)
        val z = if (p == null) null else decode(p, maxOut) match {
          case Some((codec, bytes)) =>
            Row(codec, new String(bytes, java.nio.charset.StandardCharsets.UTF_8),
              p.length.toLong, bytes.length.toLong)
          case None => null
        }
        Row.fromSeq(r.toSeq :+ z)
      }
    }(enc)
  }
}
