package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MP4 / ISO-BMFF sample-table (stbl) walk — the video tier's frame
  * census and frame-sampling PLAN, zero codecs involved (ISO 14496-12
  * public spec): every sample's file offset, byte size, decode
  * timestamp, and keyframe flag come from plain integer tables inside
  * `moov`, so a 100 TB video lake plans "decode every 10th keyframe of
  * every clip" by shipping (offset, length) ranged reads to decoders —
  * the payload bytes themselves never move through the plan. This
  * closes the frame-COUNT gap [[Multimodal.parseHeader]] documents
  * (mvhd gives duration only; counts need the per-track walk).
  *
  * Parsed boxes: `trak → mdia → mdhd` (media timescale + duration,
  * v0/v1), `hdlr` (handler: vide/soun), `minf → stbl →`
  *  - `stts` decode deltas (run-length (count, delta) entries → DTS)
  *  - `stsz` sample sizes (uniform or per-sample)
  *  - `stss` sync samples (1-based keyframe indices; ABSENT ⇒ every
  *    sample is a keyframe, per spec)
  *  - `stsc` sample→chunk runs + `stco`/`co64` chunk offsets → absolute
  *    per-sample file offsets (cumulative sizes within each chunk)
  *
  * Refusal discipline matches the raster tier: malformed, truncated, or
  * internally inconsistent tables (counts disagreeing across stts/stsz/
  * stsc, offsets past EOF, entry counts exceeding their box) drop the
  * TRACK, never crash; a payload without a valid `ftyp`/`moov` yields
  * no tracks. Sample counts are capped ([[MaxSamples]]) before any
  * table materializes — the decompression-bomb guard's sibling.
  *
  * Reference basis: attachments ride the reference's records as opaque
  * urls (lib/DataProcessor.py:58-59); this engine makes their media
  * plannable at scale.
  */
object Mp4 {

  /** Cap on per-track sample count — a hand-built stsz claiming 2^31
    * samples must refuse before the arrays exist. */
  val MaxSamples: Int = 1 << 20

  /** One track's full sample plan. `keyframes` are 1-based sample
    * indices (spec numbering); arrays are parallel over samples. */
  final case class Track(handler: String, timescale: Long, durationMs: Long,
      sizes: Array[Long], offsets: Array[Long], dtsMedia: Array[Long],
      keyframes: Array[Int]) {
    def nSamples: Int = sizes.length
  }

  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
      ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
  private def be64(p: Array[Byte], i: Int): Long =
    (be32(p, i) << 32) | be32(p, i + 4)
  private def fourCC(p: Array[Byte], i: Int): String =
    new String(Array(p(i), p(i + 1), p(i + 2), p(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** All boxes in [from, until): (type, payloadStart, payloadEnd).
    * Stops at the first structurally broken header. */
  private def boxes(p: Array[Byte], from: Int, until: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var i = from
    var ok = true
    while (ok && i + 8 <= until) {
      val size32 = be32(p, i)
      var hdr = 8L
      var size = size32
      if (size32 == 1L) {
        if (i + 16 > until) ok = false else { size = be64(p, i + 8); hdr = 16L }
      } else if (size32 == 0L) size = (until - i).toLong
      if (ok && (size < hdr || size > (until - i).toLong)) ok = false
      if (ok) {
        out += ((fourCC(p, i + 4), i + hdr.toInt, (i + size).toInt))
        i += size.toInt
      }
    }
    out.result()
  }

  private def firstBox(p: Array[Byte], from: Int, until: Int,
      tag: String): Option[(Int, Int)] =
    boxes(p, from, until).collectFirst { case (`tag`, s, e) => (s, e) }

  /** Parse every complete track. Empty when the payload is not ISO-BMFF
    * or carries no parseable sample table. */
  def parseTracks(p: Array[Byte]): Seq[Track] = {
    if (p == null || p.length < 12 || fourCC(p, 4) != "ftyp") return Seq.empty
    firstBox(p, 0, p.length, "moov") match {
      case None => Seq.empty
      case Some((ms, me)) =>
        boxes(p, ms, me).collect { case ("trak", ts, te) => (ts, te) }
          .flatMap { case (ts, te) => parseTrack(p, ts, te) }
    }
  }

  private def parseTrack(p: Array[Byte], ts: Int, te: Int): Option[Track] = for {
    (ds, de) <- firstBox(p, ts, te, "mdia")
    (hs, he) <- firstBox(p, ds, de, "mdhd")
    (timescale, durMedia) <- {
      if (hs + 1 > he) None
      else (p(hs) & 0xFF) match {
        case 0 if hs + 20 <= he => Some((be32(p, hs + 12), be32(p, hs + 16)))
        case 1 if hs + 32 <= he => Some((be32(p, hs + 20), be64(p, hs + 24)))
        case _ => None
      }
    }
    if timescale > 0
    handler <- firstBox(p, ds, de, "hdlr").flatMap { case (s, e) =>
      if (s + 12 <= e) Some(fourCC(p, s + 8)) else None
    }
    (fs, fe) <- firstBox(p, ds, de, "minf")
    (bs, be) <- firstBox(p, fs, fe, "stbl")
    sizes <- parseStsz(p, bs, be)
    dts <- parseStts(p, bs, be, sizes.length)
    offsets <- parseOffsets(p, bs, be, sizes)
    // a plan row pointing past EOF is table corruption, not a plan —
    // every (offset, size) range must lie inside the file
    if offsets.indices.forall(i =>
      offsets(i) >= 0 && offsets(i) + sizes(i) <= p.length)
    keyframes <- parseStss(p, bs, be, sizes.length)
  } yield Track(handler, timescale, durMedia * 1000L / timescale,
    sizes, offsets, dts, keyframes)

  private def fullBoxTable(p: Array[Byte], tag: String, bs: Int, be: Int)
      : Option[(Int, Int, Long)] = // (entryCountPos+4, payloadEnd, entryCount)
    firstBox(p, bs, be, tag).flatMap { case (s, e) =>
      if (s + 8 > e) None else Some((s + 8, e, be32(p, s + 4)))
    }

  private def parseStsz(p: Array[Byte], bs: Int, be: Int): Option[Array[Long]] =
    firstBox(p, bs, be, "stsz").flatMap { case (s, e) =>
      if (s + 12 > e) None
      else {
        val uniform = be32(p, s + 4)
        val n = be32(p, s + 8)
        if (n < 0 || n > MaxSamples) None // bomb guard
        else if (uniform != 0L) Some(Array.fill(n.toInt)(uniform))
        else if (s + 12 + 4L * n > e) None // table truncated
        else Some(Array.tabulate(n.toInt)(i => be32(p, s + 12 + 4 * i)))
      }
    }

  /** Expand stts run-length entries to per-sample DTS in media units;
    * refuses when the runs disagree with the sample count. */
  private def parseStts(p: Array[Byte], bs: Int, be: Int,
      nSamples: Int): Option[Array[Long]] =
    fullBoxTable(p, "stts", bs, be).flatMap { case (s, e, entries) =>
      if (entries < 0 || s + 8L * entries > e) None
      else {
        val dts = new Array[Long](nSamples)
        var t = 0L
        var k = 0
        var i = 0
        while (i < entries) {
          val count = be32(p, s + 8 * i)
          val delta = be32(p, s + 8 * i + 4)
          var c = 0L
          while (c < count) {
            if (k >= nSamples) return None // more deltas than samples
            dts(k) = t; t += delta; k += 1; c += 1
          }
          i += 1
        }
        if (k != nSamples) None else Some(dts) // fewer deltas than samples
      }
    }

  /** 1-based keyframe indices from stss; an absent stss means every
    * sample is sync (spec §8.6.2). Out-of-range entries refuse. */
  private def parseStss(p: Array[Byte], bs: Int, be: Int,
      nSamples: Int): Option[Array[Int]] =
    firstBox(p, bs, be, "stss") match {
      case None => Some(Array.tabulate(nSamples)(_ + 1))
      case Some((s, e)) =>
        if (s + 8 > e) None
        else {
          val n = be32(p, s + 4)
          if (n < 0 || s + 8 + 4L * n > e) None
          else {
            val ks = Array.tabulate(n.toInt)(i => be32(p, s + 8 + 4 * i).toInt)
            if (ks.exists(k => k < 1 || k > nSamples)) None else Some(ks)
          }
        }
    }

  /** Absolute file offset per sample: stsc chunk runs × stco/co64 chunk
    * starts, sizes accumulated within each chunk. */
  private def parseOffsets(p: Array[Byte], bs: Int, be: Int,
      sizes: Array[Long]): Option[Array[Long]] = {
    val chunkOffsets: Option[Array[Long]] =
      fullBoxTable(p, "stco", bs, be).flatMap { case (s, e, n) =>
        if (n < 0 || s + 4L * n > e) None
        else Some(Array.tabulate(n.toInt)(i => be32(p, s + 4 * i)))
      }.orElse(fullBoxTable(p, "co64", bs, be).flatMap { case (s, e, n) =>
        if (n < 0 || s + 8L * n > e) None
        else Some(Array.tabulate(n.toInt)(i => be64(p, s + 8 * i)))
      })
    for {
      chunks <- chunkOffsets
      runs <- fullBoxTable(p, "stsc", bs, be).flatMap { case (s, e, n) =>
        if (n < 0 || s + 12L * n > e) None
        else Some(Array.tabulate(n.toInt)(i =>
          (be32(p, s + 12 * i), be32(p, s + 12 * i + 4)))) // (first_chunk, samples_per_chunk)
      }
      out <- {
        val offsets = new Array[Long](sizes.length)
        var sample = 0
        var run = 0
        var chunk = 1L // 1-based
        var ok = runs.nonEmpty && runs.head._1 == 1L
        while (ok && sample < sizes.length) {
          if (chunk > chunks.length) ok = false // ran out of chunks
          else {
            val spc = runs(run)._2
            var within = 0L
            var off = chunks(chunk.toInt - 1)
            while (ok && within < spc && sample < sizes.length) {
              offsets(sample) = off
              off += sizes(sample)
              sample += 1; within += 1
            }
            chunk += 1
            if (run + 1 < runs.length && chunk >= runs(run + 1)._1) run += 1
          }
        }
        if (ok && sample == sizes.length) Some(offsets) else None
      }
    } yield out
  }

  // -------------------------------------------------------------- Spark

  val videoMetaSchema: StructType = StructType(Seq(
    StructField("n_tracks", IntegerType),
    StructField("handler", StringType),
    StructField("timescale", LongType),
    StructField("duration_ms", LongType),
    StructField("n_frames", IntegerType),
    StructField("n_keyframes", IntegerType),
    StructField("total_bytes", LongType)))

  /** Per-payload census of the FIRST video (`vide`) track: frame and
    * keyframe counts, duration, total sample bytes. NULL struct when no
    * parseable video track exists — honest refusal. */
  def videoCensus(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema.add(StructField("video", videoMetaSchema))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val tracks = parseTracks(r.getAs[Array[Byte]](pIdx))
        val v = tracks.find(_.handler == "vide") match {
          case Some(t) => Row(tracks.length, t.handler, t.timescale,
            t.durationMs, t.nSamples, t.keyframes.length, t.sizes.sum)
          case None => null
        }
        Row.fromSeq(r.toSeq :+ v)
      }
    }(enc)
  }

  /** The frame-sampling PLAN: one row per kept video keyframe —
    * `(sample_idx [1-based], offset, size, dts_ms)` — every `stride`-th
    * keyframe kept. This is what a 100 TB pipeline sends to its decode
    * fleet: ranged reads, not payloads; the explode happens on integer
    * tables, the clip bytes never enter the plan. */
  def keyframePlan(df: DataFrame, payloadCol: String = "payload",
      stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val planSchema = ArrayType(StructType(Seq(
      StructField("sample_idx", IntegerType),
      StructField("offset", LongType),
      StructField("size", LongType),
      StructField("dts_ms", LongType))))
    val outSchema = df.schema.add(StructField("frames", planSchema))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val tracks = parseTracks(r.getAs[Array[Byte]](pIdx))
        val plan = tracks.find(_.handler == "vide").map { t =>
          t.keyframes.zipWithIndex.collect {
            case (k, i) if i % stride == 0 =>
              Row(k, t.offsets(k - 1), t.sizes(k - 1),
                t.dtsMedia(k - 1) * 1000L / t.timescale)
          }.toSeq
        }.orNull
        Row.fromSeq(r.toSeq :+ plan)
      }
    }(enc).withColumn("frame", explode(col("frames"))).drop("frames")
      .withColumn("sample_idx", col("frame.sample_idx"))
      .withColumn("offset", col("frame.offset"))
      .withColumn("size", col("frame.size"))
      .withColumn("dts_ms", col("frame.dts_ms"))
      .drop("frame")
  }

  // ------------------------------------------------------------ fixture

  /** Assemble a minimal conformant ISO-BMFF file for the gates/specs:
    * one `vide` track (plus an optional `soun` track) whose sample
    * tables are pure functions of the arguments — the parser's tables
    * come back out as arithmetic the oracle can predict. The builder
    * writes boxes top-down (ftyp, moov, mdat) and computes the real
    * mdat payload offset for stco, so offsets in the plan are ABSOLUTE
    * file positions, as in production files. */
  def encode(timescale: Long, sampleSizes: Array[Long],
      sampleDeltas: Array[Long], keyframes: Array[Int],
      withStss: Boolean, audioSamples: Int = 0): Array[Byte] = {
    require(sampleSizes.length == sampleDeltas.length)
    def box(tag: String, payload: Array[Byte]): Array[Byte] = {
      val size = payload.length + 8
      Array[Byte]((size >> 24).toByte, (size >> 16).toByte,
        (size >> 8).toByte, size.toByte,
        tag(0).toByte, tag(1).toByte, tag(2).toByte, tag(3).toByte) ++ payload
    }
    def u32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def trak(handler: String, sizes: Array[Long], deltas: Array[Long],
        keys: Array[Int], stss: Boolean, mdatOff: Long): Array[Byte] = {
      val dur = deltas.sum
      val mdhd = box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(timescale) ++
        u32(dur) ++ u32(0x55C40000L)) // v0, lang 'und'
      val hdlr = box("hdlr", u32(0) ++ u32(0) ++
        handler.getBytes("US-ASCII") ++ new Array[Byte](13))
      val stts = box("stts", u32(0) ++ u32(deltas.length) ++
        deltas.flatMap(d => u32(1) ++ u32(d)))
      val stsz = box("stsz", u32(0) ++ u32(0) ++ u32(sizes.length) ++
        sizes.flatMap(u32))
      val stsc = box("stsc", u32(0) ++ u32(1) ++ u32(1) ++
        u32(sizes.length) ++ u32(1))
      val stco = box("stco", u32(0) ++ u32(1) ++ u32(mdatOff))
      val stssB = if (stss) box("stss", u32(0) ++ u32(keys.length) ++
        keys.flatMap(k => u32(k))) else Array.empty[Byte]
      val stbl = box("stbl", stts ++ stsz ++ stsc ++ stco ++ stssB)
      val minf = box("minf", stbl)
      box("trak", box("mdia", mdhd ++ hdlr ++ minf))
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(0x200))
    // moov size does not depend on the offset VALUES (u32 fixed width):
    // assemble once with placeholder offsets to measure, then for real
    def moovWith(vOff: Long, aOff: Long): Array[Byte] = {
      val v = trak("vide", sampleSizes, sampleDeltas, keyframes, withStss, vOff)
      val a = if (audioSamples > 0)
        trak("soun", Array.fill(audioSamples)(4L),
          Array.fill(audioSamples)(100L),
          Array.tabulate(audioSamples)(_ + 1), stss = false, aOff)
      else Array.empty[Byte]
      val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(timescale) ++
        u32(sampleDeltas.sum) ++ new Array[Byte](80))
      box("moov", mvhd ++ v ++ a)
    }
    val probe = moovWith(0, 0)
    val mdatPayloadStart = ftyp.length + probe.length + 8L
    val vBytes = sampleSizes.sum
    val moov = moovWith(mdatPayloadStart, mdatPayloadStart + vBytes)
    val mdat = box("mdat",
      new Array[Byte]((vBytes + 4L * audioSamples).toInt))
    ftyp ++ moov ++ mdat
  }
}
