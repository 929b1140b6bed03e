package graft.operators

/** In-repo baseline TIFF pixel codec (TIFF 6.0 public spec) — closes the
  * last raster format whose pixels stopped at the header tier
  * ([[Multimodal.parseTiff]] reads dimensions only). Decode tier:
  *  - both byte orders (II/MM) via the endian-tagged header
  *  - first-IFD entry walk with inline-or-offset values (SHORT/LONG),
  *    multi-count arrays read from their external value area
  *  - baseline subset: 8 bits per sample, chunky planar config,
  *    grayscale (photometric 0 WhiteIsZero — inverted — and 1
  *    BlackIsZero) or RGB (photometric 2), strip-organized
  *    (StripOffsets/StripByteCounts/RowsPerStrip), Compression 1
  *    (none) or 32773 (PackBits)
  *  - refusal discipline as everywhere in the raster tier: anything
  *    outside the subset, any truncation, out-of-file strip, PackBits
  *    stream that over/under-produces, or dimension bomb (> 64M px,
  *    checked BEFORE pixel allocation) returns None — honest unknown,
  *    never a crash, never half an image
  *
  * Encode tier ([[encode]]) assembles conformant fixtures: ascending-tag
  * IFD, external value areas where counts overflow the inline 4 bytes,
  * per-row PackBits (runs restart at row boundaries, per spec) — used by
  * q264's oracle-gated fixtures and TiffSpec, which cross-checks that
  * decode(encode(f)) reproduces f bit-for-bit in all four
  * endian × compression quadrants.
  */
object Tiff {

  val MaxPixels: Long = 64L * 1024 * 1024

  // ---------------------------------------------------------------- decode

  def decode(p: Array[Byte]): Option[Multimodal.CodecImage] = {
    if (p == null || p.length < 8) return None
    val le = p(0) == 'I' && p(1) == 'I'
    val be = p(0) == 'M' && p(1) == 'M'
    if (!le && !be) return None
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > p.length) -1
      else if (le) ((p(i + 1) & 0xFF) << 8) | (p(i) & 0xFF)
      else ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > p.length) -1L
      else if (le) ((p(i + 3) & 0xFFL) << 24) | ((p(i + 2) & 0xFFL) << 16) |
        ((p(i + 1) & 0xFFL) << 8) | (p(i) & 0xFFL)
      else ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
        ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8L || ifd + 2 > p.length) return None
    val base = ifd.toInt
    val n = u16(base)
    if (n <= 0 || base + 2 + n * 12 > p.length) return None

    // tag -> (type, count, entryValuePos); SHORT(3)/LONG(4) only
    val entries = scala.collection.mutable.Map.empty[Int, (Int, Long, Int)]
    var i = 0
    while (i < n) {
      val e = base + 2 + i * 12
      entries(u16(e)) = (u16(e + 2), u32(e + 4), e + 8)
      i += 1
    }
    /** The tag's value array; inline when it fits 4 bytes, else at the
      * stored offset. None on unknown type or out-of-file reach. */
    def values(tag: Int): Option[Array[Long]] = entries.get(tag).flatMap {
      case (typ, cnt, vpos) =>
        val width = typ match { case 3 => 2; case 4 => 4; case _ => return None }
        if (cnt <= 0 || cnt > 65536) return None
        val at = if (width * cnt <= 4) vpos.toLong else u32(vpos)
        if (at < 0 || at + width * cnt > p.length) return None
        Some(Array.tabulate(cnt.toInt) { k =>
          if (width == 2) u16((at + 2L * k).toInt).toLong else u32((at + 4L * k).toInt)
        })
    }
    def single(tag: Int, default: Long = -1L): Long =
      values(tag).filter(_.length == 1).map(_.head).getOrElse(default)

    val w = single(256)
    val h = single(257)
    if (w <= 0 || h <= 0 || w * h > MaxPixels) return None
    val compression = single(259, 1L)
    val photometric = single(262)
    val spp = single(277, 1L).toInt
    if (single(284, 1L) != 1L) return None // planar: chunky only
    val bitsOk = values(258).forall(b => b.forall(_ == 8L)) &&
      (values(258).isEmpty || values(258).get.length == spp)
    if (!bitsOk || values(258).isEmpty) return None // bilevel etc: out of subset
    val gray = photometric == 0L || photometric == 1L
    if (!(gray && spp == 1) && !(photometric == 2L && spp == 3)) return None
    if (compression != 1L && compression != 32773L) return None

    val rps = single(278, h)
    if (rps <= 0) return None
    val nStrips = ((h + rps - 1) / rps).toInt
    val offsets = values(273).getOrElse(return None)
    val counts = values(279).getOrElse(return None)
    if (offsets.length != nStrips || counts.length != nStrips) return None

    val rowBytes = (w * spp).toInt
    val pixels = new Array[Byte]((h * rowBytes).toInt)
    var row = 0L
    var s = 0
    while (s < nStrips) {
      val rowsHere = math.min(rps, h - row)
      val expect = (rowsHere * rowBytes).toInt
      val off = offsets(s)
      val cnt = counts(s)
      if (off < 0 || cnt < 0 || off + cnt > p.length) return None
      val dst = (row * rowBytes).toInt
      if (compression == 1L) {
        if (cnt != expect) return None
        System.arraycopy(p, off.toInt, pixels, dst, expect)
      } else {
        if (!unpackBits(p, off.toInt, cnt.toInt, pixels, dst, expect)) return None
      }
      row += rowsHere
      s += 1
    }

    val argb = new Array[Int]((w * h).toInt)
    var k = 0
    val np = (w * h).toInt
    while (k < np) {
      val px =
        if (gray) {
          val raw = pixels(k) & 0xFF
          val v = if (photometric == 0L) 255 - raw else raw // WhiteIsZero inverts
          (v << 16) | (v << 8) | v
        } else {
          val r = pixels(3 * k) & 0xFF
          val g = pixels(3 * k + 1) & 0xFF
          val b = pixels(3 * k + 2) & 0xFF
          (r << 16) | (g << 8) | b
        }
      argb(k) = 0xFF000000 | px
      k += 1
    }
    Some(Multimodal.CodecImage(w.toInt, h.toInt, argb))
  }

  /** PackBits: n in [0,127] → copy n+1 literals; n in [-127,-1] → repeat
    * next byte 1-n times; -128 noop. Must produce EXACTLY `expect`
    * bytes from the strip — over- or under-production is damage. */
  private def unpackBits(src: Array[Byte], start: Int, len: Int,
      dst: Array[Byte], dstStart: Int, expect: Int): Boolean = {
    var i = start
    val end = start + len
    var o = dstStart
    val dstEnd = dstStart + expect
    while (o < dstEnd) {
      if (i >= end) return false // input exhausted early
      val n = src(i); i += 1
      if (n == -128) () // noop
      else if (n >= 0) {
        val cnt = n + 1
        if (i + cnt > end || o + cnt > dstEnd) return false
        System.arraycopy(src, i, dst, o, cnt)
        i += cnt; o += cnt
      } else {
        val cnt = 1 - n
        if (i >= end || o + cnt > dstEnd) return false
        java.util.Arrays.fill(dst, o, o + cnt, src(i))
        i += 1; o += cnt
      }
    }
    true
  }

  // ---------------------------------------------------------------- encode

  /** Assemble a baseline TIFF. `photometric`: 0 gray-inverted, 1 gray,
    * 2 RGB (then `px` returns packed 0xRRGGBB; for gray the low byte).
    * PackBits compresses per ROW (runs never cross rows, per spec). */
  def encode(w: Int, h: Int, photometric: Int, littleEndian: Boolean,
      packBits: Boolean, rowsPerStrip: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && rowsPerStrip > 0)
    val spp = if (photometric == 2) 3 else 1
    val rowBytes = w * spp
    def rowData(y: Int): Array[Byte] = {
      val r = new Array[Byte](rowBytes)
      var x = 0
      while (x < w) {
        val v = px(x, y)
        if (spp == 1) r(x) = v.toByte
        else {
          r(3 * x) = ((v >> 16) & 0xFF).toByte
          r(3 * x + 1) = ((v >> 8) & 0xFF).toByte
          r(3 * x + 2) = (v & 0xFF).toByte
        }
        x += 1
      }
      r
    }
    def packRow(r: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < r.length) {
        // find run length at i
        var run = 1
        while (i + run < r.length && r(i + run) == r(i) && run < 127) run += 1
        if (run >= 2) {
          out.write(1 - run); out.write(r(i)); i += run
        } else {
          // literal stretch until the next >=3 run (2-runs inside
          // literals are cheaper left literal) or 128 cap
          var j = i + 1
          var stop = false
          while (j < r.length && j - i < 128 && !stop) {
            var rl = 1
            while (j + rl < r.length && r(j + rl) == r(j) && rl < 3) rl += 1
            if (rl >= 3) stop = true else j += 1
          }
          out.write(j - i - 1)
          out.write(r, i, j - i)
          i = j
        }
      }
      out.toByteArray
    }
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val strips = (0 until nStrips).map { s =>
      val rows = (s * rowsPerStrip) until math.min((s + 1) * rowsPerStrip, h)
      val raw = rows.map(rowData)
      if (packBits) raw.map(packRow).reduce(_ ++ _) else raw.reduce(_ ++ _)
    }

    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (littleEndian) { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      else { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def w32(v: Long): Unit =
      if (littleEndian) { out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
        out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt) }
      else { out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
        out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt) }

    out.write(if (littleEndian) 'I' else 'M')
    out.write(if (littleEndian) 'I' else 'M')
    w16(42)
    // layout: header(8) | strip data | IFD | external value area
    val stripStart = 8L
    val stripOffsets = strips.scanLeft(stripStart)(_ + _.length).init
    val ifdStart = stripStart + strips.map(_.length.toLong).sum
    w32(ifdStart)
    strips.foreach(s => out.write(s, 0, s.length))

    // entries, ascending tag order
    case class E(tag: Int, typ: Int, cnt: Int, inline: Option[Long], ext: Array[Long])
    val needExtBits = spp == 3
    val needExtStrips = nStrips > 1
    val es = Seq(
      E(256, 4, 1, Some(w.toLong), Array.empty),
      E(257, 4, 1, Some(h.toLong), Array.empty),
      if (needExtBits) E(258, 3, 3, None, Array(8L, 8L, 8L))
      else E(258, 3, 1, Some(8L), Array.empty),
      E(259, 3, 1, Some(if (packBits) 32773L else 1L), Array.empty),
      E(262, 3, 1, Some(photometric.toLong), Array.empty),
      if (needExtStrips) E(273, 4, nStrips, None, stripOffsets.toArray)
      else E(273, 4, 1, Some(stripOffsets.head), Array.empty),
      E(277, 3, 1, Some(spp.toLong), Array.empty),
      E(278, 4, 1, Some(rowsPerStrip.toLong), Array.empty),
      if (needExtStrips) E(279, 4, nStrips, None, strips.map(_.length.toLong).toArray)
      else E(279, 4, 1, Some(strips.head.length.toLong), Array.empty))
    val extStart = ifdStart + 2 + es.length * 12 + 4
    var extOff = extStart
    val withOff = es.map { e =>
      if (e.inline.isDefined) (e, -1L)
      else { val at = extOff; extOff += (if (e.typ == 3) 2 else 4) * e.cnt; (e, at) }
    }
    w16(es.length)
    withOff.foreach { case (e, at) =>
      w16(e.tag); w16(e.typ); w32(e.cnt.toLong)
      e.inline match {
        case Some(v) if e.typ == 3 && littleEndian => w16(v.toInt); w16(0)
        case Some(v) if e.typ == 3 => w16(v.toInt); w16(0) // left-justified per spec
        case Some(v) => w32(v)
        case None => w32(at)
      }
    }
    w32(0) // no next IFD
    withOff.foreach { case (e, _) =>
      if (e.inline.isEmpty)
        e.ext.foreach(v => if (e.typ == 3) w16(v.toInt) else w32(v))
    }
    out.toByteArray
  }
}
