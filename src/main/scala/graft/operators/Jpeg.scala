package graft.operators

/** In-repo baseline-sequential JPEG codec — the last raster format whose
  * pixel tier previously leaned on an external codec (`javax.imageio`).
  * Mirrors the reference's opaque-media handling (media attachments ride
  * through `Far-Finer-Airtable-Firestore-Sync`'s record payloads
  * untouched — lib/DataProcessor.py treats non-scalar fields as opaque),
  * while this engine decodes them for feature extraction at scale.
  *
  * Decode tier (ITU-T T.81 public spec, no external code):
  *  - marker walk (SOI/APPn/COM/DQT/DHT/SOF/DRI/SOS/RSTn/EOI)
  *  - canonical Huffman table construction from DHT (mincode/maxcode/
  *    valptr, T.81 Annex C) and bit-serial entropy decode with byte
  *    un-stuffing (FF 00 → FF) and restart-marker handling
  *  - dequantization (8- and 16-bit DQT), zigzag order, separable
  *    double-precision IDCT over a StrictMath cosine table (bit-stable
  *    across JVMs), level shift + round + clamp
  *  - chroma upsampling by sample replication for any integer sampling
  *    ratio (4:4:4, 4:2:2, 4:2:0, grayscale), YCbCr→RGB in libjpeg's
  *    16-bit FIXED-POINT integer arithmetic — exactly mirrorable in
  *    portable SQL, which is what lets the q258 oracle predict pixels
  *
  * The outcome is three-valued, because the CALLER must distinguish
  * "this stream is damaged" (never retry another codec — a corrupt
  * stream should be refused, not half-decoded) from "this stream uses a
  * feature outside the baseline tier" (progressive/arithmetic/12-bit —
  * a fallback codec may legally handle it):
  *  - [[Decoded]]   — pixels, via the shared [[Multimodal.CodecImage]]
  *  - [[Malformed]] — structural damage: truncation, bad lengths,
  *    invalid Huffman codes, stray markers mid-scan, checksum-class
  *    violations. Terminal.
  *  - [[Unsupported]] — valid-looking but beyond baseline sequential.
  *
  * Encode tier ([[encodeDcOnly]]): DC-only baseline fixtures — every
  * 8×8 block a constant sample value, quant step 8 at the DC slot, so
  * quantize(8·(v−128)/8) round-trips EXACTLY and any conformant IDCT
  * reconstructs the flat block bit-for-bit. Standard Annex K Huffman
  * tables are written into the file's DHT segments (so the fixtures are
  * plain interchange JPEGs that third-party decoders read — JpegSpec
  * cross-checks them against `javax.imageio`), and the decoder builds
  * its tables from the DHT bytes, never from shared constants — a
  * symmetric encoder/decoder bug cannot cancel out.
  */
object Jpeg {

  sealed trait Result
  final case class Decoded(img: Multimodal.CodecImage) extends Result
  case object Malformed extends Result
  case object Unsupported extends Result

  // ---------------------------------------------------------------- decode

  private final val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · (u == 0 ? 1/√2 : 1), via StrictMath so decode
    * is bit-identical on every JVM. */
  private lazy val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var c = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        if (u == 0) c = c / StrictMath.sqrt(2.0)
        t(u * 8 + x) = c
        x += 1
      }
      u += 1
    }
    t
  }

  /** Canonical Huffman table (T.81 Annex C): decode returns the symbol
    * for the next code on the reader, or -1 for an invalid code. */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17) // -1 = no codes at this length
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = r.nextBit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return symbols(valPtr(l) + code - minCode(l))
        l += 1
      }
      -1
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with FF-00
    * un-stuffing. Stops (returns -1) at any real marker; [[atMarker]]
    * then tells the scan loop what it hit. */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    private var markerSeen = -1
    def atMarker: Int = markerSeen
    def nextBit(): Int = {
      if (nbits == 0) {
        if (markerSeen >= 0 || pos >= p.length) return -1
        var b = p(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= p.length) { markerSeen = 0x100; return -1 } // truncated
          val b2 = p(pos) & 0xFF
          pos += 1
          if (b2 == 0x00) { /* stuffed data byte 0xFF */ }
          else if (b2 == 0xFF) { pos -= 1; return nextBit() } // fill byte
          else { markerSeen = b2; return -1 }
        }
        cur = b
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    /** Discard to the next byte boundary and consume an expected RSTn
      * marker; false on anything else. */
    def restart(expected: Int): Boolean = {
      nbits = 0
      if (markerSeen < 0) {
        // marker not yet reached: it must be the very next bytes
        while (pos + 1 < p.length && (p(pos) & 0xFF) == 0xFF &&
          (p(pos + 1) & 0xFF) == 0xFF) pos += 1 // fill
        if (pos + 1 >= p.length || (p(pos) & 0xFF) != 0xFF) return false
        markerSeen = p(pos + 1) & 0xFF
        pos += 2
      }
      val ok = markerSeen == 0xD0 + expected
      if (ok) markerSeen = -1
      ok
    }
    /** After the last MCU: discard pad bits and require the interchange
      * format's closing EOI (tolerating fill bytes) — corruption in the
      * stream tail is damage, not decor. */
    def finishEoi(): Boolean = {
      nbits = 0
      if (markerSeen < 0) {
        while (pos + 1 < p.length && (p(pos) & 0xFF) == 0xFF &&
          (p(pos + 1) & 0xFF) == 0xFF) pos += 1
        if (pos + 1 >= p.length || (p(pos) & 0xFF) != 0xFF) return false
        markerSeen = p(pos + 1) & 0xFF
        pos += 2
      }
      markerSeen == 0xD9
    }
    /** After a progressive scan's last block: discard pad bits, consume
      * fill bytes, and return the next marker (leaving pos after it),
      * or -1 on truncation. */
    def nextMarker(): Int = {
      nbits = 0
      if (markerSeen < 0) {
        while (pos + 1 < p.length && (p(pos) & 0xFF) == 0xFF &&
          (p(pos + 1) & 0xFF) == 0xFF) pos += 1
        if (pos + 1 >= p.length || (p(pos) & 0xFF) != 0xFF) return -1
        markerSeen = p(pos + 1) & 0xFF
        pos += 2
      }
      val m = markerSeen
      markerSeen = -1
      if (m == 0x100) -1 else m
    }
    /** T.81 RECEIVE+EXTEND: read `s` magnitude bits into a signed value. */
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0
      var i = 0
      while (i < s) {
        val b = nextBit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: Huff = _
    var acTab: Huff = _
    var pred: Int = 0
    var plane: Array[Int] = _
    var planeW: Int = 0
  }

  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)

  /** Decode a baseline-sequential JPEG. See the object doc for the
    * three-valued contract. `maxPixels` is the decompression-bomb guard
    * (checked from the SOF before any pixel allocation). */
  def decode(p: Array[Byte], maxPixels: Long = 64L * 1024 * 1024): Result = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8)
      return Malformed
    val qt = Array.ofDim[Int](4, 64)
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = 0; var h = 0
    var comps: Array[Component] = null
    var restartInterval = 0
    var pos = 2
    while (true) {
      // marker scan: skip fill bytes
      if (pos + 1 >= p.length) return Malformed
      if ((p(pos) & 0xFF) != 0xFF) return Malformed
      while (pos + 1 < p.length && (p(pos + 1) & 0xFF) == 0xFF) pos += 1
      if (pos + 1 >= p.length) return Malformed
      val marker = p(pos + 1) & 0xFF
      pos += 2
      marker match {
        case 0xD9 => return Malformed // EOI before any scan completed
        case 0x01 => () // TEM, standalone
        case m if m >= 0xD0 && m <= 0xD7 => () // stray RST, tolerate pre-scan
        case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended-sequential
          if (pos + 2 > p.length) return Malformed
          val len = be16(p, pos)
          if (len < 8 || pos + len > p.length) return Malformed
          val prec = p(pos + 2) & 0xFF
          if (prec != 8) return Unsupported // 12-bit
          h = be16(p, pos + 3); w = be16(p, pos + 5)
          val nc = p(pos + 7) & 0xFF
          if (h == 0) return Unsupported // DNL-deferred height
          if (w <= 0 || h <= 0) return Malformed
          if (w.toLong * h > maxPixels) return Malformed
          if (nc != 1 && nc != 3) return Unsupported // CMYK etc.
          if (len != 8 + 3 * nc) return Malformed
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = p(o + 1) & 0xFF
            Component(p(o) & 0xFF, (hv >> 4) & 0xF, hv & 0xF, p(o + 2) & 0xFF)
          }
          if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 ||
            c.tq > 3)) return Malformed
          pos += len
        case 0xC2 => // SOF2 progressive DCT, Huffman
          return decodeProgressive(p, maxPixels)
        case m if (m >= 0xC3 && m <= 0xCF) && m != 0xC4 && m != 0xC8 =>
          return Unsupported // arithmetic, lossless, hierarchical
        case 0xC4 => // DHT
          if (pos + 2 > p.length) return Malformed
          val len = be16(p, pos)
          if (len < 2 || pos + len > p.length) return Malformed
          var o = pos + 2
          val end = pos + len
          while (o < end) {
            if (o + 17 > end) return Malformed
            val tc = (p(o) >> 4) & 0xF
            val th = p(o) & 0xF
            if (tc > 1 || th > 3) return Malformed
            val counts = Array.tabulate(16)(i => p(o + 1 + i) & 0xFF)
            val total = counts.sum
            if (total > 256 || o + 17 + total > end) return Malformed
            val syms = Array.tabulate(total)(i => p(o + 17 + i) & 0xFF)
            val tab = new Huff(counts, syms)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            o += 17 + total
          }
          pos += len
        case 0xDB => // DQT
          if (pos + 2 > p.length) return Malformed
          val len = be16(p, pos)
          if (len < 2 || pos + len > p.length) return Malformed
          var o = pos + 2
          val end = pos + len
          while (o < end) {
            val pq = (p(o) >> 4) & 0xF
            val tq = p(o) & 0xF
            if (pq > 1 || tq > 3) return Malformed
            val step = if (pq == 0) 1 else 2
            if (o + 1 + 64 * step > end) return Malformed
            var k = 0
            while (k < 64) {
              qt(tq)(k) =
                if (pq == 0) p(o + 1 + k) & 0xFF else be16(p, o + 1 + 2 * k)
              k += 1
            }
            qtSeen(tq) = true
            o += 1 + 64 * step
          }
          pos += len
        case 0xDD => // DRI
          if (pos + 4 > p.length || be16(p, pos) != 4) return Malformed
          restartInterval = be16(p, pos + 2)
          pos += 4
        case 0xDA => // SOS — decode the scan and finish
          if (comps == null) return Malformed
          if (pos + 2 > p.length) return Malformed
          val len = be16(p, pos)
          if (pos + len > p.length) return Malformed
          val ns = p(pos + 2) & 0xFF
          if (ns != comps.length || len != 6 + 2 * ns)
            return Unsupported // multi-scan / partial-component scans
          var i = 0
          while (i < ns) {
            val o = pos + 3 + 2 * i
            val cid = p(o) & 0xFF
            val comp = comps.find(_.id == cid).getOrElse(return Malformed)
            val td = (p(o + 1) >> 4) & 0xF
            val ta = p(o + 1) & 0xF
            if (td > 3 || ta > 3) return Malformed
            comp.dcTab = dcTabs(td)
            comp.acTab = acTabs(ta)
            if (comp.dcTab == null || comp.acTab == null ||
              !qtSeen(comp.tq)) return Malformed
            i += 1
          }
          // spectral selection / approximation bytes must be baseline
          val ss = p(pos + 3 + 2 * ns) & 0xFF
          val se = p(pos + 4 + 2 * ns) & 0xFF
          val ah = (p(pos + 5 + 2 * ns) >> 4) & 0xF
          val al = p(pos + 5 + 2 * ns) & 0xF
          if (ss != 0 || se != 63 || ah != 0 || al != 0) return Unsupported
          return decodeScan(p, pos + len, w, h, comps, qt, restartInterval)
        case _ => // APPn, COM, and anything else with a length field
          if (pos + 2 > p.length) return Malformed
          val len = be16(p, pos)
          if (len < 2 || pos + len > p.length) return Malformed
          pos += len
      }
    }
    Malformed // unreachable
  }

  // ---------------------------------------------------------- progressive

  /** Per-component progressive state: the full coefficient plane
    * (interleaved MCU grid superset, so padded blocks have storage) plus
    * the non-interleaved block grid single-component scans walk. */
  private final class PComp(val c: Component, val bwFull: Int,
      val bhFull: Int, val bwNI: Int, val bhNI: Int) {
    val coefs = new Array[Int](bwFull * bhFull * 64)
    var eobrun = 0
  }

  /** Progressive-DCT decode (SOF2, Huffman): spectral selection +
    * successive approximation over multiple scans (T.81 Annex G).
    * Coefficients accumulate per block across scans (DC first/refine,
    * AC first with EOB runs, AC refine with correction bits — the
    * libjpeg `decode_mcu_AC_refine` algebra); dequantization + IDCT run
    * ONCE at EOI, so partial refinement chains render exactly what they
    * transmitted. Roughly 10% of web JPEGs are progressive — the last
    * volume format of the q258 codec tier. */
  private def decodeProgressive(p: Array[Byte], maxPixels: Long): Result = {
    val qt = Array.ofDim[Int](4, 64)
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = 0; var h = 0
    var comps: Array[Component] = null
    var pcs: Array[PComp] = null
    var maxH = 0; var maxV = 0; var mcusX = 0; var mcusY = 0
    var restartInterval = 0
    var scans = 0
    var pos = 2
    var pending = -2 // marker already consumed by a scan tail; -2 = none
    while (true) {
      val marker =
        if (pending != -2) { val m = pending; pending = -2; m }
        else {
          if (pos + 1 >= p.length) return Malformed
          if ((p(pos) & 0xFF) != 0xFF) return Malformed
          while (pos + 1 < p.length && (p(pos + 1) & 0xFF) == 0xFF) pos += 1
          if (pos + 1 >= p.length) return Malformed
          val m = p(pos + 1) & 0xFF; pos += 2; m
        }
      marker match {
        case -1 => return Malformed // truncated after a scan
        case 0xD9 => // EOI: dequantize + IDCT everything, render
          if (scans == 0 || comps == null) return Malformed
          var i = 0
          while (i < comps.length) {
            if (!qtSeen(comps(i).tq)) return Malformed
            renderProgressive(pcs(i), qt(comps(i).tq))
            i += 1
          }
          return toImage(w, h, comps, maxH, maxV)
        case 0x01 => ()
        case m if m >= 0xD0 && m <= 0xD7 => ()
        case 0xC2 => // SOF2
          if (comps != null) return Malformed // one frame header only
          if (pos + 2 > p.length) return Malformed
          val len = be16(p, pos)
          if (len < 8 || pos + len > p.length) return Malformed
          val prec = p(pos + 2) & 0xFF
          if (prec != 8) return Unsupported
          h = be16(p, pos + 3); w = be16(p, pos + 5)
          val nc = p(pos + 7) & 0xFF
          if (h == 0) return Unsupported
          if (w <= 0 || h <= 0) return Malformed
          if (w.toLong * h > maxPixels) return Malformed
          if (nc != 1 && nc != 3) return Unsupported
          if (len != 8 + 3 * nc) return Malformed
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = p(o + 1) & 0xFF
            Component(p(o) & 0xFF, (hv >> 4) & 0xF, hv & 0xF, p(o + 2) & 0xFF)
          }
          if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 ||
            c.tq > 3)) return Malformed
          maxH = comps.map(_.h).max; maxV = comps.map(_.v).max
          mcusX = (w + 8 * maxH - 1) / (8 * maxH)
          mcusY = (h + 8 * maxV - 1) / (8 * maxV)
          pcs = comps.map { c =>
            val compW = (w * c.h + maxH - 1) / maxH
            val compH = (h * c.v + maxV - 1) / maxV
            new PComp(c, mcusX * c.h, mcusY * c.v,
              (compW + 7) / 8, (compH + 7) / 8)
          }
          pos += len
        case m if (m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 =>
          return Malformed // a second, different frame type
        case 0xC4 => // DHT (may be redefined between scans)
          if (pos + 2 > p.length) return Malformed
          val len = be16(p, pos)
          if (len < 2 || pos + len > p.length) return Malformed
          var o = pos + 2
          val end = pos + len
          while (o < end) {
            if (o + 17 > end) return Malformed
            val tc = (p(o) >> 4) & 0xF
            val th = p(o) & 0xF
            if (tc > 1 || th > 3) return Malformed
            val counts = Array.tabulate(16)(i => p(o + 1 + i) & 0xFF)
            val total = counts.sum
            if (total > 256 || o + 17 + total > end) return Malformed
            val syms = Array.tabulate(total)(i => p(o + 17 + i) & 0xFF)
            val tab = new Huff(counts, syms)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            o += 17 + total
          }
          pos += len
        case 0xDB => // DQT
          if (pos + 2 > p.length) return Malformed
          val len = be16(p, pos)
          if (len < 2 || pos + len > p.length) return Malformed
          var o = pos + 2
          val end = pos + len
          while (o < end) {
            val pq = (p(o) >> 4) & 0xF
            val tq = p(o) & 0xF
            if (pq > 1 || tq > 3) return Malformed
            val step = if (pq == 0) 1 else 2
            if (o + 1 + 64 * step > end) return Malformed
            var k = 0
            while (k < 64) {
              qt(tq)(k) =
                if (pq == 0) p(o + 1 + k) & 0xFF else be16(p, o + 1 + 2 * k)
              k += 1
            }
            qtSeen(tq) = true
            o += 1 + 64 * step
          }
          pos += len
        case 0xDD => // DRI
          if (pos + 4 > p.length || be16(p, pos) != 4) return Malformed
          restartInterval = be16(p, pos + 2)
          pos += 4
        case 0xDA => // one progressive scan
          if (comps == null) return Malformed
          if (pos + 2 > p.length) return Malformed
          val len = be16(p, pos)
          if (pos + len > p.length) return Malformed
          val ns = p(pos + 2) & 0xFF
          if (ns < 1 || ns > comps.length || len != 6 + 2 * ns)
            return Malformed
          val scanPcs = new Array[PComp](ns)
          var i = 0
          while (i < ns) {
            val o = pos + 3 + 2 * i
            val cid = p(o) & 0xFF
            val idx = comps.indexWhere(_.id == cid)
            if (idx < 0) return Malformed
            scanPcs(i) = pcs(idx)
            val td = (p(o + 1) >> 4) & 0xF
            val ta = p(o + 1) & 0xF
            if (td > 3 || ta > 3) return Malformed
            comps(idx).dcTab = dcTabs(td)
            comps(idx).acTab = acTabs(ta)
            i += 1
          }
          val ss = p(pos + 3 + 2 * ns) & 0xFF
          val se = p(pos + 4 + 2 * ns) & 0xFF
          val ah = (p(pos + 5 + 2 * ns) >> 4) & 0xF
          val al = p(pos + 5 + 2 * ns) & 0xF
          // scan-script validity (T.81 G.1.1.1.1)
          if (ss == 0) { if (se != 0) return Malformed }
          else if (ss > se || se > 63 || ns != 1) return Malformed
          if (al > 13 || (ah != 0 && ah != al + 1)) return Malformed
          if (ss == 0 && ah == 0 && scanPcs.exists(_.c.dcTab == null))
            return Malformed
          if (ss > 0 && scanPcs(0).c.acTab == null) return Malformed
          progressiveScan(p, pos + len, scanPcs, ss, se, ah, al,
            restartInterval, mcusX, mcusY) match {
            case Left(r) => return r
            case Right((m, np)) => scans += 1; pending = m; pos = np
          }
        case _ => // APPn, COM, DNL, anything with a length field
          if (pos + 2 > p.length) return Malformed
          val len = be16(p, pos)
          if (len < 2 || pos + len > p.length) return Malformed
          pos += len
      }
    }
    Malformed // unreachable
  }

  /** Decode one progressive scan's entropy data; returns the marker that
    * terminated it and the position after that marker. */
  private def progressiveScan(p: Array[Byte], start: Int,
      scan: Array[PComp], ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int, mcusX: Int, mcusY: Int)
      : Either[Result, (Int, Int)] = {
    val r = new BitReader(p, start)
    var i = 0
    while (i < scan.length) { scan(i).c.pred = 0; scan(i).eobrun = 0; i += 1 }
    val interleaved = scan.length > 1
    val totalMcus =
      if (interleaved) mcusX * mcusY else scan(0).bwNI * scan(0).bhNI
    var rstIdx = 0
    var since = 0
    var mcu = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && since == restartInterval) {
        if (!r.restart(rstIdx)) return Left(Malformed)
        rstIdx = (rstIdx + 1) & 7
        since = 0
        var j = 0
        while (j < scan.length) {
          scan(j).c.pred = 0; scan(j).eobrun = 0; j += 1
        }
      }
      if (interleaved) {
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < scan.length) {
          val pc = scan(ci)
          var by = 0
          while (by < pc.c.v) {
            var bx = 0
            while (bx < pc.c.h) {
              val bi = (my * pc.c.v + by) * pc.bwFull + (mx * pc.c.h + bx)
              if (!progBlock(r, pc, bi * 64, ss, se, ah, al))
                return Left(Malformed)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
      } else {
        val pc = scan(0)
        val bi = (mcu / pc.bwNI) * pc.bwFull + (mcu % pc.bwNI)
        if (!progBlock(r, pc, bi * 64, ss, se, ah, al))
          return Left(Malformed)
      }
      since += 1
      mcu += 1
    }
    val m = r.nextMarker()
    Right((m, r.pos))
  }

  /** Raw (non-extended) magnitude bits, or -1 on truncation. */
  private def receiveRaw(r: BitReader, s: Int): Int = {
    var v = 0
    var i = 0
    while (i < s) {
      val b = r.nextBit()
      if (b < 0) return -1
      v = (v << 1) | b
      i += 1
    }
    v
  }

  /** One block of one progressive scan: the four T.81 G.2 cases. */
  private def progBlock(r: BitReader, pc: PComp, off: Int,
      ss: Int, se: Int, ah: Int, al: Int): Boolean = {
    val coefs = pc.coefs
    if (ss == 0) {
      if (ah == 0) { // DC first: diff at approximation al
        val s = pc.c.dcTab.decode(r)
        if (s < 0 || s > 11) return false
        val diff = r.receiveExtend(s)
        if (diff == Int.MinValue) return false
        pc.c.pred += diff
        coefs(off) = pc.c.pred << al
      } else { // DC refinement: one raw bit
        val b = r.nextBit()
        if (b < 0) return false
        if (b == 1) coefs(off) |= 1 << al
      }
      true
    } else if (ah == 0) { // AC first scan of this band
      if (pc.eobrun > 0) { pc.eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = pc.c.acTab.decode(r)
        if (rs < 0) return false
        val run = (rs >> 4) & 0xF
        val s = rs & 0xF
        if (s == 0) {
          if (run == 15) k += 16 // ZRL
          else { // EOBn: this block ends; run covers the NEXT eobrun blocks
            var e = (1 << run) - 1
            if (run > 0) {
              val bits = receiveRaw(r, run)
              if (bits < 0) return false
              e += bits
            }
            pc.eobrun = e
            return true
          }
        } else {
          k += run
          if (k > se) return false
          val v = r.receiveExtend(s)
          if (v == Int.MinValue) return false
          coefs(off + ZigZag(k)) = v << al
          k += 1
        }
      }
      true
    } else refineAc(r, pc, off, ss, se, al)
  }

  /** AC successive-approximation refinement (the libjpeg
    * `decode_mcu_AC_refine` algebra): each symbol optionally places a
    * new ±1·2^al coefficient after skipping `run` ZERO-HISTORY
    * positions, while every nonzero-history coefficient passed on the
    * way consumes a correction bit; an EOBn switches the rest of the
    * band (and the next eobrun−1 blocks) to corrections-only. */
  private def refineAc(r: BitReader, pc: PComp, off: Int,
      ss: Int, se: Int, al: Int): Boolean = {
    val coefs = pc.coefs
    val p1 = 1 << al
    val m1 = -(1 << al)
    var k = ss
    if (pc.eobrun == 0) {
      var eob = false
      while (k <= se && !eob) {
        val rs = pc.c.acTab.decode(r)
        if (rs < 0) return false
        var run = (rs >> 4) & 0xF
        val s = rs & 0xF
        var newVal = 0
        if (s != 0) {
          if (s != 1) return false // refinement sends ±1 only
          val b = r.nextBit()
          if (b < 0) return false
          newVal = if (b == 1) p1 else m1
        } else if (run != 15) { // EOBn
          pc.eobrun = 1 << run
          if (run > 0) {
            val bits = receiveRaw(r, run)
            if (bits < 0) return false
            pc.eobrun += bits
          }
          eob = true
        }
        if (!eob) {
          var advancing = true
          while (advancing && k <= se) {
            val z = off + ZigZag(k)
            if (coefs(z) != 0) {
              val b = r.nextBit()
              if (b < 0) return false
              if (b == 1 && (coefs(z) & p1) == 0)
                coefs(z) += (if (coefs(z) >= 0) p1 else m1)
              k += 1
            } else {
              run -= 1
              if (run < 0) advancing = false // place the new value HERE
              else k += 1
            }
          }
          if (newVal != 0 && k <= se) coefs(off + ZigZag(k)) = newVal
          k += 1
        }
      }
    }
    if (pc.eobrun > 0) { // corrections-only for the rest of the band
      while (k <= se) {
        val z = off + ZigZag(k)
        if (coefs(z) != 0) {
          val b = r.nextBit()
          if (b < 0) return false
          if (b == 1 && (coefs(z) & p1) == 0)
            coefs(z) += (if (coefs(z) >= 0) p1 else m1)
        }
        k += 1
      }
      pc.eobrun -= 1
    }
    true
  }

  /** Dequantize + IDCT every accumulated block into the component's
    * sample plane (the baseline layout [[toImage]] expects). */
  private def renderProgressive(pc: PComp, q: Array[Int]): Unit = {
    val c = pc.c
    c.planeW = pc.bwFull * 8
    c.plane = new Array[Int](pc.bwFull * 8 * pc.bhFull * 8)
    val deq = new Array[Int](64)
    val block = new Array[Int](64)
    var by = 0
    while (by < pc.bhFull) {
      var bx = 0
      while (bx < pc.bwFull) {
        val off = (by * pc.bwFull + bx) * 64
        var k = 0
        while (k < 64) {
          val z = ZigZag(k)
          deq(z) = pc.coefs(off + z) * q(k)
          k += 1
        }
        idct(deq, block)
        var yy = 0
        while (yy < 8) {
          System.arraycopy(block, yy * 8, c.plane,
            (by * 8 + yy) * c.planeW + bx * 8, 8)
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
  }

  private def decodeScan(p: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Component], qt: Array[Array[Int]],
      restartInterval: Int): Result = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      val planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * planeH)
      c.pred = 0
    }
    val reader = new BitReader(p, start)
    val coeffs = new Array[Int](64)
    val block = new Array[Int](64)
    var rstIdx = 0
    var sinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          if (!reader.restart(rstIdx)) return Malformed
          rstIdx = (rstIdx + 1) & 7
          sinceRestart = 0
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              if (!decodeBlock(reader, c, qt(c.tq), coeffs, block))
                return Malformed
              // place the 8×8 block into the component plane
              val px = (mx * c.h + bx) * 8
              val py = (my * c.v + by) * 8
              var yy = 0
              while (yy < 8) {
                System.arraycopy(block, yy * 8, c.plane,
                  (py + yy) * c.planeW + px, 8)
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        sinceRestart += 1
        mx += 1
      }
      my += 1
    }
    if (!reader.finishEoi()) return Malformed
    toImage(w, h, comps, maxH, maxV)
  }

  /** Huffman-decode + dequantize + IDCT one 8×8 block into `out`
    * (row-major spatial samples, level-shifted and clamped). */
  private def decodeBlock(r: BitReader, c: Component, q: Array[Int],
      coeffs: Array[Int], out: Array[Int]): Boolean = {
    java.util.Arrays.fill(coeffs, 0)
    val s = c.dcTab.decode(r)
    if (s < 0 || s > 11) return false
    val diff = r.receiveExtend(s)
    if (diff == Int.MinValue) return false
    c.pred += diff
    coeffs(0) = c.pred * q(0)
    var k = 1
    while (k < 64) {
      val rs = c.acTab.decode(r)
      if (rs < 0) return false
      val run = (rs >> 4) & 0xF
      val size = rs & 0xF
      if (size == 0) {
        if (run == 15) k += 16 // ZRL
        else k = 64 // EOB
      } else {
        k += run
        if (k > 63) return false
        val v = r.receiveExtend(size)
        if (v == Int.MinValue) return false
        coeffs(ZigZag(k)) = v * q(k)
        k += 1
      }
    }
    idct(coeffs, out)
    true
  }

  /** Separable double IDCT (T.81 A.3.3) with the StrictMath cosine
    * table; output = clamp(round(sample) + 128). For a DC-only block
    * every spatial sample is exactly dc/8 before level shift, which is
    * what makes the q258 fixtures arithmetic-predictable. */
  private def idct(coeffs: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    // rows: 1-D IDCT over u for each v
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cf = coeffs(v * 8 + u)
          if (cf != 0) s += cf * CosTable(u * 8 + x)
          u += 1
        }
        tmp(v * 8 + x) = s / 2.0
        x += 1
      }
      v += 1
    }
    // columns: 1-D IDCT over v for each y
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          s += tmp(vv * 8 + x) * CosTable(vv * 8 + y)
          vv += 1
        }
        val sample = StrictMath.round(s / 2.0 + 128.0).toInt
        out(y * 8 + x) = if (sample < 0) 0 else if (sample > 255) 255 else sample
        x += 1
      }
      y += 1
    }
  }

  /** Upsample by replication + color-convert into the shared ARGB
    * raster. YCbCr→RGB uses libjpeg's 16-bit fixed-point constants —
    * integer arithmetic end-to-end, so the oracle mirrors it in SQL. */
  private def toImage(w: Int, h: Int, comps: Array[Component],
      maxH: Int, maxV: Int): Result = {
    val argb = new Array[Int](w * h)
    val gray = comps.length == 1
    val cy = comps(0)
    val cb = if (gray) null else comps(1)
    val cr = if (gray) null else comps(2)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val yv = cy.plane((y * cy.v / maxV) * cy.planeW + x * cy.h / maxH)
        val px =
          if (gray) (yv << 16) | (yv << 8) | yv
          else {
            val cbv = cb.plane((y * cb.v / maxV) * cb.planeW + x * cb.h / maxH) - 128
            val crv = cr.plane((y * cr.v / maxV) * cr.planeW + x * cr.h / maxH) - 128
            val r = yv + ((91881 * crv + 32768) >> 16)
            val g = yv - ((22554 * cbv + 46802 * crv - 32768) >> 16)
            val b = yv + ((116130 * cbv + 32768) >> 16)
            (clamp8(r) << 16) | (clamp8(g) << 8) | clamp8(b)
          }
        argb(y * w + x) = 0xFF000000 | px
        x += 1
      }
      y += 1
    }
    Decoded(Multimodal.CodecImage(w, h, argb))
  }

  @inline private def clamp8(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  // ---------------------------------------------------------------- encode

  /** T.81 Annex K.3 typical Huffman tables (public spec data):
    * (counts[16], symbols). */
  private val DcLumaSpec: (Array[Int], Array[Int]) = (
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
  private val DcChromaSpec: (Array[Int], Array[Int]) = (
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
  /** AC tables truncated to the symbols a DC-only stream emits (EOB
    * only) — still legal DHTs; kept minimal so the fixture bytes stay
    * small. EOB = run 0 / size 0 = symbol 0x00 at length 2 (its Annex K
    * position for luma; length 2 for chroma as well). */
  private val AcLumaSpec: (Array[Int], Array[Int]) = (
    Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    Array(0x00))
  private val AcChromaSpec: (Array[Int], Array[Int]) = (
    Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    Array(0x00))

  /** Canonical (code, length) assignment for an encode-side table. */
  private def encTable(spec: (Array[Int], Array[Int])): Map[Int, (Int, Int)] = {
    val (counts, syms) = spec
    var code = 0
    var si = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < counts(l - 1)) {
        out += syms(si) -> ((code, l))
        code += 1
        si += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put(0x7F, 8 - n) } // 1-fill pad
  }

  private def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xFF); o.write(v & 0xFF)
  }

  private def writeDht(o: java.io.ByteArrayOutputStream, tc: Int, th: Int,
      spec: (Array[Int], Array[Int])): Unit = {
    val (counts, syms) = spec
    o.write(0xFF); o.write(0xC4)
    w16(o, 2 + 1 + 16 + syms.length)
    o.write((tc << 4) | th)
    counts.foreach(o.write)
    syms.foreach(o.write)
  }

  /** Emit one DC-only block: DC diff in category+magnitude bits, EOB. */
  private def putBlock(bw: BitWriter, dc: Int, pred: Int,
      dcT: Map[Int, (Int, Int)], acT: Map[Int, (Int, Int)]): Int = {
    val diff = dc - pred
    var mag = if (diff < 0) -diff else diff
    var s = 0
    while (mag != 0) { s += 1; mag >>= 1 }
    val (c, l) = dcT(s)
    bw.put(c, l)
    if (s > 0) {
      val bits = if (diff < 0) diff + (1 << s) - 1 else diff
      bw.put(bits & ((1 << s) - 1), s)
    }
    val (ec, el) = acT(0x00)
    bw.put(ec, el) // EOB
    dc
  }

  /** Encode a DC-only baseline JPEG where every 8×8 block of every
    * component is the constant sample `dcOf(comp, bx, by)` (0..255).
    * All quant steps are 8, so reconstruction is exact:
    * round(8·(v−128)/8)·8 / 8 + 128 = v. Components:
    *  - `samp = null` → grayscale (1 component)
    *  - `samp = Array((h1,v1),(1,1),(1,1))` → YCbCr with the given luma
    *    sampling (e.g. (1,1) = 4:4:4, (2,2) = 4:2:0)
    * `wBlocks`/`hBlocks` are the LUMA grid in 8-px blocks; chroma gets
    * the correspondingly smaller grid. */
  def encodeDcOnly(wBlocks: Int, hBlocks: Int,
      samp: Array[(Int, Int)], dcOf: (Int, Int, Int) => Int,
      restartInterval: Int = 0): Array[Byte] = {
    val gray = samp == null
    val comps: Array[(Int, Int)] = if (gray) Array((1, 1)) else samp
    require(comps.length == 1 || comps.length == 3, "1 or 3 components")
    val maxH = comps.map(_._1).max
    val maxV = comps.map(_._2).max
    require(wBlocks % maxH == 0 && hBlocks % maxV == 0,
      "luma grid must be whole MCUs")
    val w = wBlocks * 8
    val h = hBlocks * 8
    val o = new java.io.ByteArrayOutputStream()
    o.write(0xFF); o.write(0xD8) // SOI
    // DQT: table 0 (and 1 for color), all steps 8
    val nTables = if (gray) 1 else 2
    o.write(0xFF); o.write(0xDB)
    w16(o, 2 + nTables * 65)
    var t = 0
    while (t < nTables) {
      o.write(t)
      var k = 0
      while (k < 64) { o.write(8); k += 1 }
      t += 1
    }
    // SOF0
    o.write(0xFF); o.write(0xC0)
    w16(o, 8 + 3 * comps.length)
    o.write(8); w16(o, h); w16(o, w); o.write(comps.length)
    var ci = 0
    while (ci < comps.length) {
      o.write(ci + 1)
      o.write((comps(ci)._1 << 4) | comps(ci)._2)
      o.write(if (ci == 0) 0 else 1)
      ci += 1
    }
    // DHT
    writeDht(o, 0, 0, DcLumaSpec)
    writeDht(o, 1, 0, AcLumaSpec)
    if (!gray) { writeDht(o, 0, 1, DcChromaSpec); writeDht(o, 1, 1, AcChromaSpec) }
    // DRI (optional — exercises the decoder's restart resync path)
    if (restartInterval > 0) {
      o.write(0xFF); o.write(0xDD); w16(o, 4); w16(o, restartInterval)
    }
    // SOS
    o.write(0xFF); o.write(0xDA)
    w16(o, 6 + 2 * comps.length)
    o.write(comps.length)
    ci = 0
    while (ci < comps.length) {
      o.write(ci + 1)
      o.write(if (ci == 0) 0x00 else 0x11)
      ci += 1
    }
    o.write(0); o.write(63); o.write(0)
    // entropy: MCU-interleaved DC-only blocks
    val dcLuma = encTable(DcLumaSpec); val acLuma = encTable(AcLumaSpec)
    val dcChroma = encTable(DcChromaSpec); val acChroma = encTable(AcChromaSpec)
    var bw = new BitWriter(o)
    val preds = new Array[Int](comps.length)
    val mcusX = wBlocks / maxH
    val mcusY = hBlocks / maxV
    var mcuCount = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuCount > 0 &&
          mcuCount % restartInterval == 0) {
          bw.flush()
          o.write(0xFF); o.write(0xD0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(preds, 0)
          bw = new BitWriter(o)
        }
        mcuCount += 1
        ci = 0
        while (ci < comps.length) {
          val (chh, cv) = comps(ci)
          var by = 0
          while (by < cv) {
            var bx = 0
            while (bx < chh) {
              val v = dcOf(ci, mx * chh + bx, my * cv + by)
              require(v >= 0 && v <= 255, s"sample out of range: $v")
              preds(ci) = putBlock(bw, v - 128, preds(ci),
                if (ci == 0) dcLuma else dcChroma,
                if (ci == 0) acLuma else acChroma)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    o.write(0xFF); o.write(0xD9) // EOI
    o.toByteArray
  }

  /** AC table for the progressive fixtures: 15 length-4 symbols — plain
    * EOB (0x00) plus EOBn run symbols 0x10..0xE0 (r = 1..14). */
  private val AcProgSpec: (Array[Int], Array[Int]) = (
    Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    Array.tabulate(15)(_ << 4))

  /** Encode a DC-only PROGRESSIVE (SOF2) grayscale JPEG: three scans —
    * DC first at Al=1 (arithmetic-shifted diffs), DC refinement
    * delivering the dropped bit, and an AC first scan whose band is all
    * zeros, emitted either as one spanning EOBn run (the eobrun decode
    * path) or one plain EOB per block. Quant steps are all 8, so the
    * fully-refined reconstruction is exactly `dcOf(bx, by)` per block —
    * the q258 arithmetic-predictability discipline for SOF2. */
  def encodeDcOnlyProgressive(wBlocks: Int, hBlocks: Int,
      dcOf: (Int, Int) => Int, eobnAcScan: Boolean = true,
      restartInterval: Int = 0): Array[Byte] = {
    require(!(eobnAcScan && restartInterval > 0),
      "an EOBn run cannot span restart intervals")
    val w = wBlocks * 8
    val h = hBlocks * 8
    val o = new java.io.ByteArrayOutputStream()
    o.write(0xFF); o.write(0xD8) // SOI
    o.write(0xFF); o.write(0xDB) // DQT table 0, all steps 8
    w16(o, 2 + 65)
    o.write(0)
    var k = 0
    while (k < 64) { o.write(8); k += 1 }
    o.write(0xFF); o.write(0xC2) // SOF2 progressive
    w16(o, 8 + 3)
    o.write(8); w16(o, h); w16(o, w); o.write(1)
    o.write(1); o.write(0x11); o.write(0)
    writeDht(o, 0, 0, DcLumaSpec)
    writeDht(o, 1, 0, AcProgSpec)
    if (restartInterval > 0) {
      o.write(0xFF); o.write(0xDD); w16(o, 4); w16(o, restartInterval)
    }
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      o.write(0xFF); o.write(0xDA)
      w16(o, 8)
      o.write(1); o.write(1); o.write(0x00)
      o.write(ss); o.write(se); o.write((ah << 4) | al)
    }
    val dcT = encTable(DcLumaSpec)
    val acT = encTable(AcProgSpec)
    val total = wBlocks * hBlocks
    def eachBlock(f: (BitWriter, Int, Int, Boolean) => Unit): Unit = {
      // raster order with optional restarts; f(bw, bx, by, afterRestart)
      var bw = new BitWriter(o)
      var n = 0
      var rstIdx = 0
      var by = 0
      while (by < hBlocks) {
        var bx = 0
        while (bx < wBlocks) {
          var reset = false
          if (restartInterval > 0 && n > 0 && n % restartInterval == 0) {
            bw.flush()
            o.write(0xFF); o.write(0xD0 + rstIdx)
            rstIdx = (rstIdx + 1) & 7
            bw = new BitWriter(o)
            reset = true
          }
          f(bw, bx, by, reset)
          n += 1
          bx += 1
        }
        by += 1
      }
      bw.flush()
    }
    // scan 1: DC first, Al=1 — diffs over the arithmetic-shifted values
    sos(0, 0, 0, 1)
    var pred = 0
    eachBlock { (bw, bx, by, reset) =>
      if (reset) pred = 0
      val v = dcOf(bx, by)
      require(v >= 0 && v <= 255, s"sample out of range: $v")
      val coef = (v - 128) >> 1 // arithmetic shift, the T.81 encode pair
      val diff = coef - pred
      pred = coef
      var mag = if (diff < 0) -diff else diff
      var s = 0
      while (mag != 0) { s += 1; mag >>= 1 }
      val (c, l) = dcT(s)
      bw.put(c, l)
      if (s > 0) {
        val bits = if (diff < 0) diff + (1 << s) - 1 else diff
        bw.put(bits & ((1 << s) - 1), s)
      }
    }
    // scan 2: DC refinement, Ah=1/Al=0 — the dropped low bit, raw
    sos(0, 0, 1, 0)
    eachBlock { (bw, bx, by, _) =>
      bw.put((dcOf(bx, by) - 128) & 1, 1)
    }
    // scan 3: AC first over the whole band — all zero
    sos(1, 63, 0, 0)
    if (eobnAcScan) {
      // ONE spanning EOBn: current block + (total-1) more
      val bw = new BitWriter(o)
      val e = total - 1
      var r = 0
      while ((1 << (r + 1)) - 1 <= e) r += 1
      val extra = e - ((1 << r) - 1)
      val (c, l) = acT(r << 4)
      bw.put(c, l)
      if (r > 0) bw.put(extra, r)
      bw.flush()
    } else eachBlock { (bw, _, _, _) =>
      val (c, l) = acT(0x00)
      bw.put(c, l)
    }
    o.write(0xFF); o.write(0xD9) // EOI
    o.toByteArray
  }
}
