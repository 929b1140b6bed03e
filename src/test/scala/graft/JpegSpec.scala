package graft

import graft.operators.{Jpeg, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** In-repo baseline JPEG codec: DC-only fixtures round-trip EXACTLY
  * (quant step 8 ⇒ quantization is lossless for flat blocks), the
  * fixtures are plain interchange JPEGs a third-party decoder
  * (`javax.imageio`) agrees on, the decoder reads a third-party
  * ENCODER's output, and damage/unsupported classes are refused with
  * the right verdict (Malformed = terminal, Unsupported = fallback
  * allowed). */
class JpegSpec extends AnyFunSuite {

  private def decodeOk(p: Array[Byte]): Multimodal.CodecImage =
    Jpeg.decode(p) match {
      case Jpeg.Decoded(img) => img
      case other => fail(s"expected Decoded, got $other")
    }

  private def rgb(img: Multimodal.CodecImage, x: Int, y: Int): (Int, Int, Int) = {
    val (b, g, r) = img.pixel(x, y)
    (r, g, b)
  }

  /** The decoder's documented fixed-point YCbCr→RGB — the q258 oracle
    * mirrors this arithmetic in SQL. */
  private def ycc(y: Int, cb0: Int, cr0: Int): (Int, Int, Int) = {
    val cb = cb0 - 128; val cr = cr0 - 128
    def c8(v: Int) = math.max(0, math.min(255, v))
    (c8(y + ((91881 * cr + 32768) >> 16)),
      c8(y - ((22554 * cb + 46802 * cr - 32768) >> 16)),
      c8(y + ((116130 * cb + 32768) >> 16)))
  }

  test("grayscale DC-only round-trips exactly") {
    def v(bx: Int, by: Int) = (37 * bx + 81 * by + 5) % 256
    val bytes = Jpeg.encodeDcOnly(3, 2, null, (_, bx, by) => v(bx, by))
    val img = decodeOk(bytes)
    assert(img.width == 24 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 24) {
      val expect = v(x / 8, y / 8)
      assert(rgb(img, x, y) == ((expect, expect, expect)),
        s"pixel ($x,$y)")
    }
  }

  test("4:4:4 color DC-only matches the fixed-point conversion exactly") {
    val samp = Array((1, 1), (1, 1), (1, 1))
    def plane(c: Int, bx: Int, by: Int) =
      (17 * c + 29 * bx + 53 * by + 11) % 256
    val bytes = Jpeg.encodeDcOnly(2, 2, samp, plane)
    val img = decodeOk(bytes)
    assert(img.width == 16 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val expect = ycc(plane(0, x / 8, y / 8), plane(1, x / 8, y / 8),
        plane(2, x / 8, y / 8))
      assert(rgb(img, x, y) == expect, s"pixel ($x,$y)")
    }
  }

  test("4:2:0 DC-only upsamples by replication, exactly") {
    val samp = Array((2, 2), (1, 1), (1, 1))
    def luma(bx: Int, by: Int) = (40 * bx + 90 * by + 33) % 256
    val bytes = Jpeg.encodeDcOnly(4, 2, samp,
      (c, bx, by) => if (c == 0) luma(bx, by) else if (c == 1) 100 else 180)
    val img = decodeOk(bytes)
    assert(img.width == 32 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 32) {
      val expect = ycc(luma(x / 8, y / 8), 100, 180)
      assert(rgb(img, x, y) == expect, s"pixel ($x,$y)")
    }
  }

  test("restart markers resync predictors") {
    def v(bx: Int, by: Int) = (23 * bx + 7 * by + 100) % 256
    val bytes = Jpeg.encodeDcOnly(4, 4, null, (_, bx, by) => v(bx, by),
      restartInterval = 3)
    // the stream really contains RST markers
    assert(bytes.sliding(2).exists(s =>
      (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) >= 0xD0 && (s(1) & 0xFF) <= 0xD7))
    val img = decodeOk(bytes)
    for (y <- 0 until 32; x <- 0 until 32) {
      val e = v(x / 8, y / 8)
      assert(rgb(img, x, y) == ((e, e, e)), s"pixel ($x,$y)")
    }
  }

  test("third-party decoder agrees on the fixtures (imageio cross-check)") {
    // grayscale: exact everywhere (no color convert, flat-block IDCT is
    // exact in any conformant implementation)
    val gray = Jpeg.encodeDcOnly(2, 2, null,
      (_, bx, by) => (91 * bx + 13 * by + 60) % 256)
    val gImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gray))
    assert(gImg != null && gImg.getWidth == 16 && gImg.getHeight == 16)
    val mine = decodeOk(gray)
    for (y <- 0 until 16; x <- 0 until 16) {
      // raw raster sample, NOT getRGB — getRGB pushes gray samples
      // through the CS_GRAY→sRGB gamma curve
      val theirs = gImg.getRaster.getSample(x, y, 0)
      val (r, g, b) = rgb(mine, x, y)
      assert(theirs == r && r == g && g == b, s"gray pixel ($x,$y)")
    }
    // color: YCbCr→RGB rounding is implementation-defined in the last
    // bit (IJG's G-channel constants differ from ours by ≤2/65536), so
    // the cross-check allows ±2 per channel
    val color = Jpeg.encodeDcOnly(2, 2, Array((1, 1), (1, 1), (1, 1)),
      (c, bx, by) => (19 * c + 47 * bx + 71 * by + 25) % 256)
    val cImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(color))
    assert(cImg != null)
    val mc = decodeOk(color)
    for (y <- 0 until 16; x <- 0 until 16) {
      val t = cImg.getRGB(x, y)
      val (r, g, b) = rgb(mc, x, y)
      assert(math.abs(((t >> 16) & 0xFF) - r) <= 2 &&
        math.abs(((t >> 8) & 0xFF) - g) <= 2 &&
        math.abs((t & 0xFF) - b) <= 2, s"color pixel ($x,$y)")
    }
  }

  test("decodes a third-party encoder's output (imageio-encoded)") {
    // solid color: flat blocks survive any encoder's DCT exactly up to
    // DC quantization, so mine and imageio's decode agree within the
    // color-convert tolerance
    val bytes = Multimodal.encodeJpeg(16, 8, (_, _) => (32, 64, 128))
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val mine = decodeOk(bytes)
    assert(mine.width == 16 && mine.height == 8)
    for (y <- 0 until 8; x <- 0 until 16) {
      val t = theirs.getRGB(x, y)
      val (r, g, b) = rgb(mine, x, y)
      assert(math.abs(((t >> 16) & 0xFF) - r) <= 2 &&
        math.abs(((t >> 8) & 0xFF) - g) <= 2 &&
        math.abs((t & 0xFF) - b) <= 2, s"pixel ($x,$y)")
    }
  }

  test("truncated stream is Malformed (terminal — no codec fallback)") {
    val good = Jpeg.encodeDcOnly(2, 2, null, (_, bx, by) => 50 + bx + by)
    assert(Jpeg.decode(good.take(good.length / 2)) == Jpeg.Malformed)
    assert(Jpeg.decode(good.take(20)) == Jpeg.Malformed)
    assert(Jpeg.decode(Array[Byte](0xFF.toByte, 0xD8.toByte)) == Jpeg.Malformed)
  }

  test("corrupt entropy stream is Malformed") {
    val good = Jpeg.encodeDcOnly(4, 4, null,
      (_, bx, by) => (97 * bx + 41 * by + 3) % 256)
    // inject an unstuffed marker just after the entropy segment starts
    // (SOS header for grayscale = marker + 8 payload bytes)
    val sos = good.indices.find(i => (good(i) & 0xFF) == 0xFF &&
      i + 1 < good.length && (good(i + 1) & 0xFF) == 0xDA).get
    val corrupted = good.clone()
    corrupted(sos + 12) = 0xFF.toByte
    corrupted(sos + 13) = 0xC0.toByte // stray marker mid-scan
    assert(Jpeg.decode(corrupted) == Jpeg.Malformed)
    // damage in the stream TAIL (between last MCU and EOI) is also
    // Malformed — the interchange close is required
    val tail = good.clone()
    tail(tail.length - 1) = 0x00.toByte // EOI second byte destroyed
    assert(Jpeg.decode(tail) == Jpeg.Malformed)
  }

  test("arithmetic / 12-bit / CMYK headers are Unsupported (fallback allowed)") {
    val good = Jpeg.encodeDcOnly(2, 2, null, (_, bx, by) => 50 + bx + by)
    val sof = good.indices.find(i => (good(i) & 0xFF) == 0xFF &&
      i + 1 < good.length && (good(i + 1) & 0xFF) == 0xC0).get
    val arithmetic = good.clone()
    arithmetic(sof + 1) = 0xC9.toByte // SOF9 arithmetic sequential
    assert(Jpeg.decode(arithmetic) == Jpeg.Unsupported)
    val twelveBit = good.clone()
    twelveBit(sof + 4) = 12.toByte // precision byte in SOF
    assert(Jpeg.decode(twelveBit) == Jpeg.Unsupported)
    // an SOF2 frame whose SCAN claims the full baseline band is not a
    // legal progressive scan script: Malformed, not a silent decode
    val bogus = good.clone()
    bogus(sof + 1) = 0xC2.toByte
    assert(Jpeg.decode(bogus) == Jpeg.Malformed)
  }

  test("progressive DC-only fixtures round-trip exactly (EOBn and " +
      "per-block EOB variants, restart resync)") {
    def v(bx: Int, by: Int) = (37 * bx + 81 * by + 5) % 256
    for (eobn <- Seq(true, false)) {
      val bytes = Jpeg.encodeDcOnlyProgressive(3, 2, v, eobnAcScan = eobn)
      assert(bytes.sliding(2).exists(s =>
        (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xC2), "must be SOF2")
      val img = decodeOk(bytes)
      assert(img.width == 24 && img.height == 16)
      for (y <- 0 until 16; x <- 0 until 24) {
        val e = v(x / 8, y / 8)
        assert(rgb(img, x, y) == ((e, e, e)), s"pixel ($x,$y) eobn=$eobn")
      }
    }
    // restart markers inside progressive scans resync predictors
    val rst = Jpeg.encodeDcOnlyProgressive(4, 4, v, eobnAcScan = false,
      restartInterval = 3)
    assert(rst.sliding(2).exists(s =>
      (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) >= 0xD0 && (s(1) & 0xFF) <= 0xD7))
    val img = decodeOk(rst)
    for (y <- 0 until 32; x <- 0 until 32) {
      val e = v(x / 8, y / 8)
      assert(rgb(img, x, y) == ((e, e, e)), s"pixel ($x,$y) rst")
    }
  }

  test("progressive: third-party (imageio) progressive output decodes, " +
      "gray and color, within the cross-decoder tolerance") {
    def progressiveBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = w.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); w.dispose()
      bos.toByteArray
    }
    // smooth gradients: the comparison is decoder-vs-decoder on the SAME
    // bytes, so JPEG loss is irrelevant; ±2 covers IDCT/color rounding
    val gray = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 32; x <- 0 until 48)
      gray.getRaster.setSample(x, y, 0, (x * 3 + y * 2) % 256)
    val gb = progressiveBytes(gray)
    assert(gb.sliding(2).exists(s =>
      (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xC2),
      "imageio must have produced SOF2")
    val mineG = decodeOk(gb)
    val theirsG = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gb))
    for (y <- 0 until 32; x <- 0 until 48) {
      val (r, _, _) = rgb(mineG, x, y)
      val t = theirsG.getRaster.getSample(x, y, 0)
      assert(math.abs(t - r) <= 2, s"gray pixel ($x,$y): mine=$r theirs=$t")
    }
    // CHROMA-FLAT color (constant R−G / B−G): T.81 mandates no chroma
    // upsampling filter, and replication (ours) vs libjpeg's fancy
    // triangular filter legitimately differ by a few counts at chroma
    // gradients — flat chroma isolates the progressive pipeline itself
    val color = new java.awt.image.BufferedImage(40, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 40) {
      val v = x * 3 + y * 2
      color.setRGB(x, y, ((v + 20) << 16) | (v << 8) | (v + 40))
    }
    val cb = progressiveBytes(color)
    val mineC = decodeOk(cb)
    val theirsC = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb))
    for (y <- 0 until 24; x <- 0 until 40) {
      val (r, g, b) = rgb(mineC, x, y)
      val t = theirsC.getRGB(x, y)
      assert(math.abs(((t >> 16) & 0xFF) - r) <= 2 &&
        math.abs(((t >> 8) & 0xFF) - g) <= 2 &&
        math.abs((t & 0xFF) - b) <= 2,
        s"color pixel ($x,$y): mine=($r,$g,$b) theirs=${t.toHexString}")
    }
  }

  test("progressive damage classes: truncation and bomb stay refused") {
    val good = Jpeg.encodeDcOnlyProgressive(2, 2,
      (bx, by) => (91 * bx + 13 * by + 60) % 256)
    // truncated mid-scan
    assert(Jpeg.decode(good.take(good.length - 6)) == Jpeg.Malformed)
    // EOI destroyed
    val tail = good.clone()
    tail(tail.length - 1) = 0x00.toByte
    assert(Jpeg.decode(tail) == Jpeg.Malformed)
    // bomb guard fires from the SOF2 header
    assert(Jpeg.decode(good, maxPixels = 10) == Jpeg.Malformed)
  }

  test("decompression bomb refused from the SOF, before pixel allocation") {
    val good = Jpeg.encodeDcOnly(2, 2, null, (_, bx, by) => 50 + bx + by)
    assert(Jpeg.decode(good, maxPixels = 100) == Jpeg.Malformed)
  }

  test("pixel-tier dispatch serves JPEG through the in-repo decoder") {
    val bytes = Jpeg.encodeDcOnly(1, 1, null, (_, _, _) => 77)
    val img = Multimodal.decodeRaster(bytes)
    assert(img.isDefined)
    assert(img.get.pixel(0, 0) == ((77, 77, 77)))
  }
}
