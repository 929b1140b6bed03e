package graft

import graft.operators.Encoding._

/** Encoding triage + mojibake repair: the strict UTF-8 validator's edge
  * matrix, BOM handling, the Latin-1 total fallback, and double-encoding
  * undo (including the it-must-stop cases). q271 gates the chain. */
class EncodingSpec extends SparkSpec {
  import spark.implicits._

  test("strict UTF-8 validation: overlongs, surrogates, range, truncation") {
    assert(utf8Valid("plain ascii".getBytes))
    assert(utf8Valid("héllo — ✓ 🙂".getBytes("UTF-8")))
    assert(!utf8Valid(Array(0xE9.toByte))) // lone Latin-1 é
    assert(!utf8Valid(Array(0xC0.toByte, 0xAF.toByte))) // overlong '/'
    assert(!utf8Valid(Array(0xE0.toByte, 0x80.toByte, 0x80.toByte))) // overlong
    assert(!utf8Valid(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte))) // surrogate
    assert(!utf8Valid(Array(0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte))) // > U+10FFFF
    assert(!utf8Valid(Array(0xF5.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte)))
    assert(!utf8Valid("é".getBytes("UTF-8").take(1))) // truncated sequence
    assert(utf8Valid(Array(0xF4.toByte, 0x8F.toByte, 0xBF.toByte, 0xBF.toByte))) // U+10FFFF
  }

  test("decode: BOM-stripped UTF-8 when valid, total Latin-1 fallback") {
    val (e1, t1, b1) = decodeBytes((0xEF.toByte +: 0xBB.toByte +: 0xBF.toByte +:
      "hi".getBytes("UTF-8").toSeq).toArray)
    assert(e1 == "utf-8" && t1 == "hi" && b1)
    val (e2, t2, b2) = decodeBytes("café".getBytes("UTF-8"))
    assert(e2 == "utf-8" && t2 == "café" && !b2)
    val (e3, t3, _) = decodeBytes(Array('a'.toByte, 0xE9.toByte))
    assert(e3 == "latin-1" && t3 == "aé")
  }

  test("double-encoding repair: undoes rounds, stops at fixpoints") {
    val good = "café déjà"
    val once = new String(good.getBytes("UTF-8"),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val twice = new String(once.getBytes("UTF-8"),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(repairDoubleEncoded(once) == ((good, true)))
    assert(repairDoubleEncoded(twice) == ((good, true))) // two rounds undone
    assert(repairDoubleEncoded(good) == ((good, false))) // clean text untouched
    assert(repairDoubleEncoded("ascii only") == (("ascii only", false)))
    // genuine Latin-1-looking text whose re-encoding is NOT valid UTF-8
    assert(repairDoubleEncoded("naïve café") == (("naïve café", false)))
  }

  test("DataFrame face: encoding tags, repair flags, codepoint counts") {
    val rows = Seq(
      (1L, "plain".getBytes("UTF-8")),
      (2L, new String("é".getBytes("UTF-8"),
        java.nio.charset.StandardCharsets.ISO_8859_1).getBytes("UTF-8")), // "Ã©"
      (3L, Array('x'.toByte, 0xFF.toByte)),
      (4L, null.asInstanceOf[Array[Byte]]),
      (5L, "🙂".getBytes("UTF-8")) // astral: ONE codepoint, two UTF-16 units
    ).toDF("id", "payload")
    val out = graft.operators.Encoding.decodedText(rows)
      .selectExpr("id", "ctext.encoding", "ctext.text", "ctext.repaired",
        "ctext.n_chars")
      .orderBy("id").collect()
    assert(out(0).getString(1) == "utf-8" && !out(0).getBoolean(3))
    assert(out(1).getString(2) == "é" && out(1).getBoolean(3))
    assert(out(2).getString(1) == "latin-1" && out(2).getString(2) == "xÿ")
    assert(out(3).isNullAt(1))
    assert(out(4).getLong(4) == 1L, "codepoint count, not UTF-16 units")
  }
}
