package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupApprox, Multimodal, Similarity, TextAnalysis}

class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- text analysis ----------------------------------------------------

  test("tokenCount handles blanks, runs of whitespace") {
    val df = Seq("", "   ", "one", "a b  c", " lots   of \t space ").toDF("t")
    val out = df.select(TextAnalysis.tokenCount($"t").as("n")).as[Long].collect()
    assert(out.toSeq == Seq(0L, 0L, 1L, 3L, 3L))
  }

  test("subwordCount is ceil(chars/4) over non-space chars") {
    val df = Seq(("abcd", 1L), ("abcde", 2L), ("a b", 1L), ("", 0L)).toDF("t", "want")
    val bad = df.filter(TextAnalysis.subwordCount($"t") =!= $"want")
    assert(bad.isEmpty)
  }

  test("language ID picks marker-heavy language, und when no markers") {
    val df = Seq(
      "the cat and the dog is here",
      "el perro de la casa que ladra los dias",
      "qqq zzz xxx").toDF("text")
    val out = df.select(TextAnalysis.languageId($"text").as("l")).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("shingles: k-windows, short-text degenerate case") {
    val out = Seq("a b c d").toDF("t")
      .select(TextAnalysis.shingleStrings($"t", 3).as("sh")).as[Seq[String]].head()
    assert(out == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextAnalysis.shingleStrings($"t", 3).as("sh")).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("fingerprints are formatting-robust") {
    val df = Seq(("A  b\tC", "a b c")).toDF("x", "y")
    val same = df.select(
      (TextAnalysis.fingerprint($"x") === TextAnalysis.fingerprint($"y")).as("fx"),
      (TextAnalysis.md5Fingerprint($"x") === TextAnalysis.md5Fingerprint($"y")).as("fm"))
      .as[(Boolean, Boolean)].head()
    assert(same == ((true, true)))
  }

  // --- dedup ------------------------------------------------------------

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "quick brown fox jumps over the lazy dog near the river bank today"), // near-dup of 1
    (3L, "completely different text about spark catalyst optimizer and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact content dedup groups identical normalized texts") {
    val groups = DedupApprox.exactByContent(corpus, "doc_id", "text", md5Family = true)
    assert(groups.count() == 3)
    val big = groups.filter($"group_size" === 2).select("keep_id").as[Long].head()
    assert(big == 1L)
  }

  test("jaccard: identical=1, near-dup high, disjoint=0") {
    val pairs = corpus.as("a").crossJoin(corpus.as("b"))
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        DedupApprox.jaccard($"a.text", $"b.text", 3).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 4L)) == 1.0)
    assert(pairs((1L, 2L)) > 0.8)
    assert(pairs((1L, 3L)) == 0.0)
  }

  test("minhash LSH surfaces the near-dup and exact-dup pairs") {
    val dups = DedupApprox.minhashNearDups(corpus, "doc_id", "text",
      k = 3, bands = 8, rows = 2, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups.contains((1L, 4L)))
    assert(dups.contains((1L, 2L)))
    assert(!dups.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical at hamming 0; near-dups closer than unrelated docs") {
    val sh = corpus.select($"doc_id", DedupApprox.simhash($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(ham(1L, 4L) == 0)          // exact dup
    assert(ham(1L, 2L) < ham(1L, 3L)) // near-dup closer than unrelated
    // bucketed variant recovers exact dups (hamming 0 shares every quarter)
    val pairs = DedupApprox.simhashNearDups(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 4L)) == 0)
  }

  // --- similarity -------------------------------------------------------

  private val vecs = Seq(
    (1L, Seq(1f, 0f, 0f, 0f)),
    (2L, Seq(0f, 1f, 0f, 0f)),
    (3L, Seq(2f, 0f, 0f, 0f)),
    (4L, Seq(0.9f, 0.1f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("cosine: parallel=1, orthogonal=0") {
    val out = vecs.select($"vec_id",
      Similarity.cosine($"embedding", lit(Array(1f, 0f, 0f, 0f))).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(3L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
  }

  test("topK ranks by cosine with id tiebreak") {
    val top = Similarity.topK(vecs, "vec_id", "embedding", Seq(1f, 0f, 0f, 0f), 3)
      .select("vec_id").as[Long].collect()
    assert(top.take(2).toSet == Set(1L, 3L)) // both cosine 1.0, ids 1,3
    assert(top(2) == 4L)
  }

  test("ANN via hyperplane LSH recovers the exact-match bucket") {
    val idx = Similarity.buildIndex(vecs, "embedding", bits = 4, dim = 4)
    val hits = Similarity.annTopK(idx, "vec_id", "embedding",
      Seq(1f, 0f, 0f, 0f), k = 2, bits = 4, probeHamming = 0, dim = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(hits.contains(1L)) // identical vector always shares its own bucket
  }

  test("cosineNearDups finds scaled (cosine-1) pairs within buckets") {
    val dups = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
      threshold = 0.999, bits = 4, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups.contains((1L, 3L)))
  }

  test("maxBucket cap drops degenerate buckets; real buckets unaffected") {
    // 100k identical docs collapse onto ONE simhash sketch — uncapped, that
    // bucket expands to ~5e9 pairs; with the cap the query completes and
    // the degenerate bucket contributes nothing.
    val degenerateDocs = spark.range(100000).select($"id".as("doc_id"),
      lit("same boilerplate text repeated everywhere").as("text"))
    assert(DedupApprox.simhashNearDups(degenerateDocs, "doc_id", "text",
      maxHamming = 3, maxBucket = 64).count() == 0L)
    // small real buckets survive the cap
    val pairs = DedupApprox.simhashNearDups(corpus, "doc_id", "text",
      maxHamming = 3, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 4L)) == 0)
    // with no bucket actually over the cap, the capped path (distinct
    // dedup — the first-matching-quarter predicate is unsound under a
    // cap) must equal the uncapped path exactly, pair for pair
    val uncapped = DedupApprox.simhashNearDups(corpus, "doc_id", "text",
      maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs == uncapped)
    // same for the embedding path: 100k copies of one vector share a code
    val degenerateVecs = spark.range(100000).select($"id".as("vec_id"),
      lit(Array(1f, 0f, 0f, 0f)).as("embedding"))
    assert(Similarity.cosineNearDups(degenerateVecs, "vec_id", "embedding",
      threshold = 0.999, bits = 4, dim = 4, maxBucket = 64).count() == 0L)
    val dups = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
      threshold = 0.999, bits = 4, dim = 4, maxBucket = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups.contains((1L, 3L)))
  }

  // --- multimodal -------------------------------------------------------

  test("real header decode: PNG IHDR, JPEG SOF (marker walk), GIF; malformed -> null dims") {
    import java.nio.ByteBuffer
    def png(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(29)
      b.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      b.put(Array(8, 6, 0, 0, 0).map(_.toByte)).array()
    }
    def jpegWithApp0(w: Int, h: Int, sof: Int): Array[Byte] = {
      // SOI, APP0 segment (walk must skip it), then the SOF frame header
      val b = ByteBuffer.allocate(2 + 2 + 2 + 4 + 2 + 2 + 1 + 2 + 2 + 3)
      b.put(Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)).putShort(6.toShort)
      b.put("JFIF".getBytes)
      b.put(Array(0xFF, sof).map(_.toByte)).putShort(11.toShort)
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      b.put(Array(1, 1, 0).map(_.toByte)).array()
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort).array()
    }
    def dims(p: Array[Byte]) = Multimodal.parseHeader(p).map(r =>
      (r.getString(0), Option(r.get(1)), Option(r.get(2))))
    assert(dims(png(640, 480)) == Some(("image/png", Some(640), Some(480))))
    assert(dims(jpegWithApp0(1920, 1080, 0xC0)) == Some(("image/jpeg", Some(1920), Some(1080))))
    assert(dims(jpegWithApp0(320, 200, 0xC2)) == Some(("image/jpeg", Some(320), Some(200))))
    assert(dims(gif(17, 23)) == Some(("image/gif", Some(17), Some(23))))
    // malformed: recognized magic but truncated/SOF-less -> honest NULL dims
    assert(dims(png(640, 480).take(10)) == Some(("image/png", None, None)))
    assert(dims(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)) == Some(("image/jpeg", None, None)))
    assert(dims(gif(17, 23).take(7)) == Some(("image/gif", None, None)))
    // unrecognized magic -> None, so withDecodedMeta falls back to the stub
    assert(Multimodal.parseHeader("not an image".getBytes).isEmpty)
    // WAV: RIFF chunk walk reads duration = data.size * 1000 / fmt.byteRate
    def wav(byteRate: Int, dataSize: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      b.putInt(byteRate).putInt(byteRate).putShort(1).putShort(8)
      b.put("data".getBytes).putInt(dataSize).array()
    }
    def wavDur(p: Array[Byte]) = Multimodal.parseHeader(p).map(r =>
      (r.getString(0), Option(r.get(4))))
    assert(wavDur(wav(88200, 88200)) == Some(("audio/wav", Some(1000L))))
    assert(wavDur(wav(8000, 4000)) == Some(("audio/wav", Some(500L))))
    // junk chunk tag with no size field: recognized container, NULL duration
    assert(wavDur("RIFF$   WAVEjunk".getBytes("ISO-8859-1")) ==
      Some(("audio/wav", None)))
    // truncated fmt chunk: NULL duration, never an index crash
    assert(wavDur(wav(88200, 88200).take(20)) == Some(("audio/wav", None)))
    val mixed = Seq(
      (0L, png(12, 34), "application/octet-stream"),
      (1L, "plain text".getBytes, "text/plain"),
      (2L, png(640, 480).take(10), "application/octet-stream"))
      .toDF("doc_id", "payload", "mime")
    val out = Multimodal.withDecodedMeta(mixed, "payload", "mime")
      .select("doc_id", "media.mime", "media.width").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.get(2))))).toMap
    assert(out(0L) == ("image/png", Some(12)))
    assert(out(1L)._1 == "text/plain" && out(1L)._2.isDefined) // stub path
    assert(out(2L) == ("image/png", None))
  }

  test("MP4 box walk: mvhd v0/v1 duration, 64-bit largesize, malformed -> NULL") {
    import java.nio.ByteBuffer
    val ftyp = ByteBuffer.allocate(16)
      .putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0).array()
    def mp4v0(timescale: Int, duration: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + 36) // big-endian by default
      b.put(ftyp)
      b.putInt(36).put("moov".getBytes)
      b.putInt(28).put("mvhd".getBytes).putInt(0) // version 0 + flags
      b.putInt(0).putInt(0).putInt(timescale).putInt(duration).array()
    }
    def mp4v1(timescale: Int, duration: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + 48)
      b.put(ftyp)
      b.putInt(48).put("moov".getBytes)
      b.putInt(40).put("mvhd".getBytes).putInt(0x01000000) // version 1
      b.putLong(0L).putLong(0L).putInt(timescale).putLong(duration).array()
    }
    def dur(p: Array[Byte]) = Multimodal.parseHeader(p).map(r =>
      (r.getString(0), Option(r.get(4))))
    assert(dur(mp4v0(600, 1200)) == Some(("video/mp4", Some(2000L))))
    assert(dur(mp4v1(90000, 45000L)) == Some(("video/mp4", Some(500L))))
    // moov under a 64-bit largesize header (size==1 marker): still found
    val big = {
      val moovPayload = mp4v0(1000, 3500).drop(16 + 8) // the mvhd box bytes
      val b = ByteBuffer.allocate(16 + 16 + moovPayload.length)
      b.put(ftyp).putInt(1).put("moov".getBytes)
        .putLong(16L + moovPayload.length) // largesize = 16B header + payload
        .put(moovPayload).array()
    }
    assert(dur(big) == Some(("video/mp4", Some(3500L))))
    // moov size overruns the payload: walk stops, honest NULL
    val overrun = ByteBuffer.allocate(16 + 8)
      .put(ftyp).putInt(256).put("moov".getBytes).array()
    assert(dur(overrun) == Some(("video/mp4", None)))
    // truncated mvhd (timescale/duration missing): NULL, no index crash
    assert(dur(mp4v0(600, 1200).dropRight(6)).exists(_._2.isEmpty))
    // zero timescale: division guarded, NULL
    assert(dur(mp4v0(0, 1200)) == Some(("video/mp4", None)))
    // no ftyp magic: not recognized as a container at all
    assert(Multimodal.parseHeader("0123456789abcdef".getBytes).isEmpty)
  }

  test("BMP real decode: dims, NN resize picks exact pixels, stats are exact means") {
    // 4x4 gradient: pixel(x, y) = (b, g, r) = (10x, 10y, x+y) in image coords
    val src = Multimodal.encodeBmp(4, 4, (x, y) => (10 * x, 10 * y, x + y))
    val hdr = Multimodal.parseHeader(src)
    assert(hdr.map(r => (r.getString(0), r.get(1), r.get(2))) ==
      Some(("image/bmp", 4, 4)))
    val img = Multimodal.parseBmp(src).get
    assert(img.pixel(0, 0) == ((0, 0, 0)) && img.pixel(3, 2) == ((30, 20, 5)))
    // truncated pixel array / wrong depth: honest None, never a crash
    assert(Multimodal.parseBmp(src.dropRight(3)).isEmpty)
    assert(Multimodal.parseHeader(src.dropRight(3)).exists(_.get(1) == null))
    val df = Seq((1L, src, "image/bmp")).toDF("doc_id", "payload", "mime")
    val dec = Multimodal.withDecodedMeta(df, "payload", "mime")
    // NN 4x4 -> 2x2 picks src pixels (0,0),(2,0),(0,2),(2,2)
    val rs = Multimodal.resizeTo(dec, 2, 2)
    val outBytes = rs.select("payload").head().getAs[Array[Byte]](0)
    val out = Multimodal.parseBmp(outBytes).get
    assert(out.width == 2 && out.height == 2)
    assert(out.pixel(0, 0) == ((0, 0, 0)) && out.pixel(1, 0) == ((20, 0, 2)))
    assert(out.pixel(0, 1) == ((0, 20, 2)) && out.pixel(1, 1) == ((20, 20, 4)))
    val meta = rs.select("media.mime", "media.width", "media.height",
      "media.byte_len").head()
    assert(meta.getString(0) == "image/bmp" && meta.getInt(1) == 2 &&
      meta.getInt(2) == 2 && meta.getLong(3) == outBytes.length.toLong)
    // stats over the RESIZED pixels: sums are exact integers
    val st = Multimodal.imageStats(rs).select("img.*").head()
    assert(st.getDouble(0) == 40.0 / 4 && st.getDouble(1) == 40.0 / 4)
    assert(st.getDouble(2) == 8.0 / 4)
    assert(st.getDouble(3) == (40.0 + 40.0 + 8.0) / 12.0)
    // non-BMP payload: stub resize (byte truncation) + NULL stats
    val txt = Seq((2L, "just text bytes here".getBytes, "text/plain"))
      .toDF("doc_id", "payload", "mime")
    val trs = Multimodal.resizeTo(Multimodal.withDecodedMeta(txt, "payload", "mime"),
      8, 8)
    val trow = trs.select("payload", "media.width", "media.byte_len").head()
    assert(trow.getAs[Array[Byte]](0).length == 4) // 8*8/16 budget
    assert(trow.getInt(1) == 8 && trow.getLong(2) == 4L)
    assert(Multimodal.imageStats(trs).select("img").head().isNullAt(0))
    // top-down BMP (negative height): same image-coordinate pixels
    val td = {
      val b = java.nio.ByteBuffer.wrap(src.clone())
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(22, -4) // height = -4: rows stored top-down
      val a = b.array()
      // re-order rows so the image content is unchanged (w=4: stride 12)
      val stride = 12
      val rows = (0 until 4).map(i => a.slice(54 + i * stride, 54 + (i + 1) * stride))
      System.arraycopy(rows.reverse.flatten.toArray, 0, a, 54, 4 * stride)
      a
    }
    val tdImg = Multimodal.parseBmp(td).get
    assert(tdImg.topDown && tdImg.pixel(3, 2) == ((30, 20, 5)))
  }

  test("PNG real decode: inflate+unfilter round-trip, all five filters, Adler rejection, PNG-in PNG-out resize") {
    // Deflater-encode -> Inflater-decode round-trip on a known gradient
    val src = Multimodal.encodePng(4, 4, (x, y) => (10 * x, 10 * y, x + y))
    val img = Multimodal.parsePng(src).get
    assert(img.width == 4 && img.height == 4 && img.channels == 3)
    assert(img.pixel(0, 0) == ((0, 0, 0)) && img.pixel(3, 2) == ((30, 20, 5)))
    // the header tier agrees on dims
    assert(Multimodal.parseHeader(src)
      .map(r => (r.getString(0), r.get(1), r.get(2))) == Some(("image/png", 4, 4)))

    // hand-filtered stream exercising Sub/Up/Average/Paeth: encode a
    // known 3x4 RGB image with one filter per row (reference filter
    // math from the spec), compress with real zlib, wrap in chunks
    val w = 3; val h = 4
    val want = Array.tabulate(h, w) { (y, x) =>
      ((7 * x + 13 * y) % 256, (11 * x + 3 * y) % 256, (5 * x + 17 * y) % 256)
    } // (r, g, b)
    val stride = w * 3
    def recon(y: Int, x: Int): Int = { // raw RGB byte stream of row y
      val (r, g, b) = want(y)(x / 3)
      x % 3 match { case 0 => r; case 1 => g; case _ => b }
    }
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val filters = Array(1, 2, 3, 4) // Sub, Up, Average, Paeth — one per row
    val filtered = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      filtered(y * (stride + 1)) = filters(y).toByte
      for (x <- 0 until stride) {
        val cur = recon(y, x)
        val a = if (x >= 3) recon(y, x - 3) else 0
        val b = if (y > 0) recon(y - 1, x) else 0
        val c = if (x >= 3 && y > 0) recon(y - 1, x - 3) else 0
        val f = filters(y) match {
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 => cur - paeth(a, b, c)
        }
        filtered(y * (stride + 1) + 1 + x) = (f & 0xFF).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val cb = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) cb.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val comp = cb.toByteArray
    val bb = java.nio.ByteBuffer.allocate(8 + 25 + 12 + comp.length + 12)
    bb.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .putInt(0) // CRC unvalidated by the parser (Adler covers the pixels)
    bb.putInt(comp.length).put("IDAT".getBytes).put(comp).putInt(0)
    bb.putInt(0).put("IEND".getBytes).putInt(0)
    val handBuilt = bb.array()
    val dec = Multimodal.parsePng(handBuilt).get
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = want(y)(x)
      assert(dec.pixel(x, y) == ((b, g, r)), s"pixel($x,$y)")
    }

    // corrupt the zlib trailer (Adler-32): decode must REJECT, not return garbage
    val corrupted = src.clone()
    corrupted(corrupted.length - 13) = (corrupted(corrupted.length - 13) ^ 0x55).toByte
    assert(Multimodal.parsePng(corrupted).isEmpty ||
      // flipping may land in the IEND area on tiny files; force a hit:
      { val c2 = handBuilt.clone()
        c2(8 + 25 + 8 + comp.length - 1) = (c2(8 + 25 + 8 + comp.length - 1) ^ 0x55).toByte
        Multimodal.parsePng(c2).isEmpty })
    // truncation: honest None
    assert(Multimodal.parsePng(src.take(src.length - 5)).isEmpty)

    // resizeTo: PNG in -> REAL resample -> PNG out (decodable, right pixels)
    import spark.implicits._
    val df = Seq((1L, src, "image/png")).toDF("doc_id", "payload", "mime")
    val rs = Multimodal.resizeTo(
      Multimodal.withDecodedMeta(df, "payload", "mime"), 2, 2)
    val outBytes = rs.select("payload").head().getAs[Array[Byte]](0)
    val out = Multimodal.parsePng(outBytes).get
    assert(out.width == 2 && out.height == 2)
    assert(out.pixel(0, 0) == ((0, 0, 0)) && out.pixel(1, 0) == ((20, 0, 2)))
    assert(rs.select("media.mime").head().getString(0) == "image/png")
    // stats agree with the equivalent BMP's
    val bmpDf = Seq((2L, Multimodal.encodeBmp(4, 4, (x, y) => (10 * x, 10 * y, x + y)),
      "image/bmp")).toDF("doc_id", "payload", "mime")
    val sPng = Multimodal.imageStats(df).select("img.*").head()
    val sBmp = Multimodal.imageStats(bmpDf).select("img.*").head()
    assert(sPng == sBmp)
  }

  test("GIF real decode: LZW literal stream, dictionary growth, code==next case, corrupt rejection") {
    // tiny 4-color GIF builder: palette i -> (r,g,b) = (i*10, i*20, i*30)
    def gif(w: Int, h: Int, stream: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(13 + 12 + 10 + 1 + 2 + stream.length + 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("GIF89a".getBytes)
      bb.putShort(w.toShort).putShort(h.toShort)
      bb.put(0x81.toByte).put(0.toByte).put(0.toByte) // global table, 4 colors
      for (i <- 0 until 4) bb.put((i * 10).toByte).put((i * 20).toByte).put((i * 30).toByte)
      bb.put(0x2C.toByte).putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      bb.put(0.toByte)
      bb.put(2.toByte) // min code size
      bb.put(stream.length.toByte).put(stream).put(0.toByte).put(0x3B.toByte)
      bb.array()
    }
    // codes [CLEAR=4, 1, 1, 6, END=5] @3 bits LSB-first: dictionary
    // entry 6 = "1,1" built mid-stream -> pixels 1,1,1,1 (2x2)
    val v1 = 4L | (1L << 3) | (1L << 6) | (6L << 9) | (5L << 12)
    val s1 = Array((v1 & 0xFF).toByte, ((v1 >> 8) & 0xFF).toByte)
    val g1 = Multimodal.parseGif(gif(2, 2, s1)).get
    assert(g1.width == 2 && g1.height == 2)
    assert(g1.pixel(0, 0) == ((30, 20, 10)) && g1.pixel(1, 1) == ((30, 20, 10)))
    // codes [CLEAR, 1, 6, END]: 6 == next -> prev + prev.head (the LZW
    // special case) -> pixels 1,1,1 (3x1)
    val v2 = 4L | (1L << 3) | (6L << 6) | (5L << 9)
    val s2 = Array((v2 & 0xFF).toByte, ((v2 >> 8) & 0xFF).toByte)
    val g2 = Multimodal.parseGif(gif(3, 1, s2)).get
    assert((0 until 3).forall(x => g2.pixel(x, 0) == ((30, 20, 10))))
    // out-of-range code: corrupt stream -> None
    val bad = Array(0xFF.toByte, 0xFF.toByte)
    assert(Multimodal.parseGif(gif(2, 2, bad)).isEmpty)
    // truncation and pixel-count mismatch -> None
    assert(Multimodal.parseGif(gif(2, 2, s1).dropRight(3)).isEmpty)
    assert(Multimodal.parseGif(gif(4, 4, s1)).isEmpty) // 4 px for a 16-px frame
  }

  test("WAV PCM sample decode: signed samples, stats, float-format and truncation rejection") {
    def wav(fmt: Int, samples: Seq[Int]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(fmt.toShort).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      bb.put("data".getBytes).putInt(dataLen)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    // negative samples round-trip through two's complement
    val a = Multimodal.parseWavPcm(wav(1, Seq(-1024, 0, 1023, -1))).get
    assert(a.sampleRate == 8000 && a.samples.toSeq == Seq(-1024, 0, 1023, -1))
    // IEEE-float WAV (format 3): header tier knows it, sample tier refuses
    assert(Multimodal.parseWavPcm(wav(3, Seq(1, 2))).isEmpty)
    assert(Multimodal.parseHeader(wav(3, Seq(1, 2))).exists(_.getString(0) == "audio/wav"))
    // truncation: None
    assert(Multimodal.parseWavPcm(wav(1, Seq(1, 2)).take(30)).isEmpty)
    // stats: peak/zero-crossings exact, RMS on the 1e-6 lattice
    import spark.implicits._
    val df = Seq((1L, wav(1, Seq(3, -4, 5, -6)))).toDF("doc_id", "payload")
    val st = Multimodal.audioStats(df).select("audio.*").head()
    assert(st.getLong(0) == 4 && st.getInt(1) == 8000 && st.getInt(2) == 6)
    val expRms = math.floor(math.sqrt((9 + 16 + 25 + 36) / 4.0) * 1e6 + 0.5) / 1e6
    assert(st.getDouble(3) == expRms && st.getLong(4) == 3)
  }

  test("JPEG real decode via the JDK codec: golden raster, resize, bomb guard, corruption") {
    // solid color survives DCT almost exactly: encode with the same JDK
    // codec the engine decodes through, assert channel means within a
    // small tolerance (JPEG is lossy — exact equality is wrong to demand)
    val src = Multimodal.encodeJpeg(16, 16, (_, _) => (32, 64, 128))
    assert(Multimodal.parseHeader(src).map(r =>
      (r.getString(0), r.get(1), r.get(2))) == Some(("image/jpeg", 16, 16)))
    val img = Multimodal.parseJpeg(src).get
    assert(img.width == 16 && img.height == 16)
    val (b, g, r) = img.pixel(8, 8)
    assert(math.abs(b - 32) <= 2 && math.abs(g - 64) <= 2 &&
      math.abs(r - 128) <= 2, s"center pixel ($b, $g, $r)")
    // dispatch: decodeRaster reaches the codec tier after BMP/PNG/GIF decline
    assert(Multimodal.decodeRaster(src).exists(_.isInstanceOf[Multimodal.CodecImage]))
    // imageStats over the REAL pixels, not a stub
    val df = Seq((1L, src, "image/jpeg")).toDF("doc_id", "payload", "mime")
    val st = Multimodal.imageStats(df).select("img.*").head()
    assert(math.abs(st.getDouble(0) - 32.0) <= 2.0 &&
      math.abs(st.getDouble(1) - 64.0) <= 2.0 &&
      math.abs(st.getDouble(2) - 128.0) <= 2.0, s"means $st")
    assert(st.getInt(4) == 16 && st.getInt(5) == 16)
    // JPEG-in JPEG-out resize: output is itself a decodable JPEG at new dims
    val rs = Multimodal.resizeTo(
      Multimodal.withDecodedMeta(df, "payload", "mime"), 4, 4)
    val outBytes = rs.select("payload").head().getAs[Array[Byte]](0)
    val out = Multimodal.parseJpeg(outBytes).get
    assert(out.width == 4 && out.height == 4)
    val meta = rs.select("media.mime", "media.width").head()
    assert(meta.getString(0) == "image/jpeg" && meta.getInt(1) == 4)
    // q185's in-plan fixture is this same codec path
    val fix = Multimodal.tinyJpegHex.grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(Multimodal.parseJpeg(fix).exists(i => i.width == 8 && i.height == 8))
    // truncation before the SOF segment: honest None, never a crash
    assert(Multimodal.parseJpeg(src.take(150)).isEmpty)
    // decompression-bomb guard: a SOF claiming 65500x56575 pixels is
    // refused from the HEADER, before any pixel memory is allocated
    val bomb = Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x0B, 0x08,
      0xFF, 0xDC, 0xDC, 0xFF, 0x03).map(_.toByte)
    assert(Multimodal.parseJpeg(bomb).isEmpty)
  }

  test("multimodal metadata plumbing: deterministic stub decode, frame sampling") {
    val docs = Seq((0L, "hello world"), (1L, "audio doc"), (2L, "video doc")).toDF("doc_id", "text")
    val media = Multimodal.withDecodedMeta(
      Multimodal.syntheticMedia(spark, docs), "payload", "mime")
    val rows = media.select("doc_id", "mime", "media.byte_len", "media.n_frames")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getInt(3)))).toMap
    assert(rows(0L)._1 == "image/png" && rows(0L)._2 == 11L && rows(0L)._3 == 1)
    assert(rows(1L)._1 == "audio/wav")
    assert(rows(2L)._1 == "video/mp4" && rows(2L)._3 >= 1)
    // rerun -> identical metadata (stub is deterministic)
    val again = Multimodal.withDecodedMeta(
      Multimodal.syntheticMedia(spark, docs), "payload", "mime")
    assertSameRows(media.select("doc_id", "media.width", "media.height"),
      again.select("doc_id", "media.width", "media.height"))
    val frames = Multimodal.sampleFrames(
      media.filter($"doc_id" === 2L), stride = 10)
    assert(frames.count() >= 1)
    // resize stub: metadata really updated, payload really truncated
    val resized = Multimodal.resizeTo(media, 64, 64)
    val r0 = resized.filter($"doc_id" === 0L)
      .select("media.width", "media.height", "media.byte_len").head()
    assert(r0.getInt(0) == 64 && r0.getInt(1) == 64 && r0.getLong(2) <= 64 * 64 / 16)
    // feature-extract stub: deterministic d-dim float vector, usable by
    // the similarity operators downstream
    val feats = Multimodal.extractFeatures(media, dim = 8)
    val fv = feats.select("features").as[Seq[Float]].collect()
    assert(fv.forall(_.length == 8))
    val again2 = Multimodal.extractFeatures(media, dim = 8)
      .select("features").as[Seq[Float]].collect()
    assert(fv.toSeq == again2.toSeq)
    val sim = graft.operators.Similarity.topK(
      feats.select($"doc_id".as("vec_id"), $"features".as("embedding")),
      "vec_id", "embedding",
      fv.head, 2)
    assert(sim.count() == 2)
  }

  test("tf-idf: corpus-rare terms outrank corpus-common terms") {
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common other"),
      (3L, "common thing")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", topK = 2)
    val d1 = top.filter($"id" === 1L).orderBy("rnk")
      .select("term").as[String].collect().toSeq
    // 'common' has tf=2 but df=3; 'rare' tf=1 df=1:
    // common: 2*(4)/4 = 2.0 ; rare: 1*4/2 = 2.0 -> tie, term asc
    assert(d1 == Seq("common", "rare"))
    val d2 = top.filter($"id" === 2L).orderBy("rnk")
      .select("term").as[String].collect().toSeq
    assert(d2.head == "other") // 1*4/2=2.0 beats common 1*4/4=1.0
  }

  test("shingle novelty: duplicated docs fully shared, unique doc fully novel") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val nv = TextAnalysis.shingleNovelty(docs, "doc_id", "text", k = 3)
      .orderBy("id").collect()
    assert(nv.length == 3)
    assert(nv(0).getDouble(2) == 1.0) // every shingle shared with doc 2
    assert(nv(1).getDouble(2) == 1.0)
    assert(nv(2).getDouble(2) == 0.0) // nothing shared
    assert(nv(0).getLong(1) == 3) // 5 tokens, k=3 -> 3 shingles
  }

  test("as-of join: latest right at-or-before, equal-ts matches, left-outer nulls") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq( // right: (key, ts, px)
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 105.0),
      (2L, ts("2024-01-01 10:02:00"), 200.0)).toDF("k", "ts", "px")
    val trades = Seq( // left: (key, ts, qty)
      (1L, ts("2024-01-01 10:03:00"), 5.0), // -> 100.0 (10:00 quote)
      (1L, ts("2024-01-01 10:05:00"), 6.0), // -> 105.0 (equal ts matches)
      (2L, ts("2024-01-01 10:01:00"), 7.0), // -> null (no quote yet)
      (3L, ts("2024-01-01 10:00:00"), 8.0)  // -> null (no key 3 quotes)
    ).toDF("k", "ts", "qty")
    val out = graft.operators.AsofJoin.backward(
      trades, quotes, "k", "ts", "ts", Seq("px"))
      .select("k", "qty", "px").as[(Long, Double, Option[Double])]
      .collect().toSet
    assert(out == Set(
      (1L, 5.0, Some(100.0)), (1L, 6.0, Some(105.0)),
      (2L, 7.0, None), (3L, 8.0, None)))
  }

  test("as-of join null contracts: atomic payload, null keys/ts never match") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq( // (key, ts, px) with a NULL px on the latest row,
      (Some(1L), Some(ts("2024-01-01 10:00:00")), Some(7.0)),
      (Some(1L), Some(ts("2024-01-01 10:05:00")), None), // matched row's null stays null
      (Some(1L), None, Some(9.0)), // null ts: never matches
      (None, Some(ts("2024-01-01 09:00:00")), Some(5.0)) // null key: never matches
    ).toDF("k", "ts", "px")
    val trades = Seq(
      (Some(1L), Some(ts("2024-01-01 10:06:00")), 1.0),
      (None, Some(ts("2024-01-01 10:00:00")), 2.0), // null key left row: output, no match
      (Some(1L), Option.empty[java.sql.Timestamp], 3.0) // null ts left row: output, no match
    ).toDF("k", "ts", "qty")
    val out = graft.operators.AsofJoin.backward(
      trades, quotes, "k", "ts", "ts", Seq("px"))
      .select("qty", "asof_ts", "px")
      .as[(Double, Option[java.sql.Timestamp], Option[Double])].collect().toSet
    assert(out == Set(
      // matched the 10:05 quote ATOMICALLY: px is that row's null, not 7.0
      (1.0, Some(ts("2024-01-01 10:05:00")), None),
      (2.0, None, None),
      (3.0, None, None)))
    // output-name collision fails loudly, not with ambiguous columns
    val err = intercept[IllegalArgumentException] {
      graft.operators.AsofJoin.backward(
        trades.withColumnRenamed("qty", "px"), quotes, "k", "ts", "ts", Seq("px"))
    }
    assert(err.getMessage.contains("collide"))
  }

  test("range join: exact in-window pairs via equi-join, no nested loop") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")),
      (11L, 1L, ts("2024-01-01 11:00:00")),
      (12L, 2L, ts("2024-01-01 10:30:00"))).toDF("lid", "k", "ts")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0), // in window of 10 (30 min before)
      (1L, ts("2024-01-01 10:30:00"), 2.0), // equal ts: in window of 10; 30min before 11
      (1L, ts("2024-01-01 09:59:59"), 3.0), // just outside 10's window
      (2L, ts("2024-01-01 10:29:00"), 4.0)  // in window of 12
    ).toDF("k", "rts", "rv")
    val out = graft.operators.RangeJoin.byKeyAndWindow(
      l, r, "k", "ts", "rts", beforeSec = 1800, afterSec = 0)
    assert(out.select("lid", "rv").as[(Long, Double)].collect().toSet ==
      Set((10L, 1.0), (10L, 2.0), (11L, 2.0), (12L, 4.0)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
  }

  test("repetition ratio: looping text scores high, varied text low") {
    val docs = Seq(
      (1L, "spam ham spam ham spam ham spam ham"), // "spam ham" dominates
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionRatio(docs, "doc_id", "text", n = 2)
      .orderBy("id").collect()
    assert(r(0).getLong(1) == 7) // 8 tokens -> 7 bigrams
    assert(r(0).getDouble(2) == math.floor(4.0 / 7.0 * 1000000 + 0.5) / 1000000)
    assert(r(1).getDouble(2) == math.floor(1.0 / 7.0 * 1000000 + 0.5) / 1000000)
  }

  test("lexicalDiversity: uniform repetition scores low where top_frac cannot see it") {
    val docs = Seq(
      (1L, "x x x x"),                          // one token: diversity 0
      (2L, "one two three four"),               // all distinct: 1 - 4/16
      (3L, "aaa bbb aaa ccc"),                  // counts 2,1,1: 1 - 6/16
      (4L, "a b a b a b")).toDF("doc_id", "text") // two tokens cycling evenly
    val r = TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r(0) == ((1L, 4L, 0.0)))
    assert(r(1) == ((2L, 4L, 0.75)))
    assert(r(2) == ((3L, 4L, math.floor((1.0 - 6.0 / 16.0) * 1000000 + 0.5) / 1000000)))
    // the case repetitionRatio(n=1) underrates: modal share is only 1/2,
    // but Simpson sees the full two-token concentration
    assert(r(3)._3 == 0.5)
  }

  test("incremental near-dup gate reports new-vs-corpus matches only") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    val incoming = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (101L, "beta gamma delta epsilon zeta"), // near-dup of 1
      (102L, "fresh content with no overlap anywhere"),
      (103L, "fresh content with no overlap anywhere") // dup of 102 — but both NEW
    ).toDF("doc_id", "text")
    // 8 bands x 2 rows: ~99.9% recall at J=0.75 (4x4 banding would miss
    // ~22% of the time — LSH recall, not determinism)
    val out = DedupApprox.incrementalNearDups(corpus, incoming,
      "doc_id", "text", bands = 8, rows = 2, threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    // 102/103 duplicate EACH OTHER but neither matches the corpus: the
    // gate must not report new x new pairs
    assert(out == Set((100L, 1L), (101L, 1L)))
  }

  test("IVF ANN: self-retrieval wins, and full-probe equals brute force") {
    val n = 50
    val emb = spark.range(n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => sin($"id" * 13 + d).cast("float")).as("embedding"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 4)
    assert(cents.length == 4 && cents.forall(_.length == 8))
    val probe = emb.filter($"vec_id" === 11).select("embedding")
      .collect()(0).getSeq[Float](0)
    val hit = Similarity.ivfTopK(emb, "vec_id", "embedding", cents, probe,
      k = 1, nProbe = 1).collect()
    assert(hit.head.getLong(0) == 11L) // own cell always probed first
    // probing every cell degrades gracefully to exact brute-force top-k
    val all = Similarity.ivfTopK(emb, "vec_id", "embedding", cents, probe,
      k = 5, nProbe = 4).select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.topK(emb, "vec_id", "embedding", probe, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(all == brute)
    // one Lloyd step: per-cell per-dim means over the cosine assignment
    val emb2 = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), // the two seed centroids
      (2L, Seq(2f, 0f)), (3L, Seq(4f, 0f)), // cosine 1.0 with (1,0)
      (4L, Seq(0f, 3f))).toDF("vec_id", "embedding")
    val seeds = Similarity.ivfCentroids(emb2, "vec_id", "embedding", 2)
    val step = Similarity.kmeansStep(emb2, "embedding", seeds)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(step((0L, 0L)) == ((3L, 7.0 / 3))) // cell 0: (1,0),(2,0),(4,0)
    assert(step((0L, 1L)) == ((3L, 0.0)))
    assert(step((1L, 0L)) == ((2L, 0.0)))     // cell 1: (0,1),(0,3)
    assert(step((1L, 1L)) == ((2L, 2.0)))

    // dim mismatch must fail loudly, not silently rank against different
    // geometry (the driver-side cosine would otherwise truncate the probe)
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emb, "vec_id", "embedding", cents, probe :+ 0.5f,
        k = 1, nProbe = 1)
    }
    assert(err.getMessage.contains("dims"))
    // driver-side cosine mirrors the native expression's full-tail norms:
    // a zero-padded probe keeps the same dot but a longer-tail norm on one
    // side only — both sides must agree it changes nothing (zeros) and that
    // nonzero tails DO lower the score
    val a = Seq(1.0f, 2.0f, 3.0f)
    assert(Similarity.cosineLocal(a, a :+ 0.0f) == Similarity.cosineLocal(a, a))
    assert(Similarity.cosineLocal(a, a :+ 4.0f) < Similarity.cosineLocal(a, a))
  }

  test("kmeansRefine: movement shrinks to convergence, refined centroids beat seeds") {
    // two tight cosine clusters around (1,0,..) and (0,1,..); seeds are the
    // two smallest-id vectors, both only roughly aligned with their cluster
    val emb = spark.range(40).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(3)), d =>
        (when(($"id" % 2 === 0) && (d === 0), 10.0)
          .when(($"id" % 2 === 1) && (d === 1), 10.0)
          .otherwise(0.0) + sin($"id" * 7 + d)).cast("float")).as("embedding"))
    val seeds = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 2)
    val (refined, moves) = Similarity.kmeansRefine(emb, "embedding", seeds,
      iters = 6, tol = 1e-7)
    assert(moves.nonEmpty && moves.length <= 6)
    // movement shrinks monotonically on well-separated clusters and hits tol
    moves.sliding(2).foreach { case Seq(prevMove, nextMove) =>
      assert(nextMove <= prevMove, s"movement grew: $moves")
    }
    assert(moves.last <= 1e-7) // converged, not just ran out of iterations
    // rerunning one step from the converged centroids moves nothing
    val (_, again) = Similarity.kmeansRefine(emb, "embedding", refined, iters = 1)
    assert(again.head <= 1e-7)
    // the refined centroids align with their clusters better than the seeds
    def meanBestCos(cents: Seq[Seq[Float]]): Double = {
      val vs = emb.select("embedding").collect().map(_.getSeq[Float](0).toSeq)
      vs.map(v => cents.map(c => Similarity.cosineLocal(v, c)).max).sum / vs.length
    }
    assert(meanBestCos(refined) > meanBestCos(seeds))
  }

  test("IVF recall@nProbe pinned against brute force") {
    // deterministic corpus; recall measured once and PINNED so an index,
    // assignment, or ranking change can never silently degrade recall
    val n = 400
    val emb = spark.range(n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => sin($"id" * 13 + d).cast("float")).as("embedding"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 8)
    val k = 10
    val probes = Seq(3L, 97L, 211L, 333L)
    val recalls = probes.map { pid =>
      val probe = emb.filter($"vec_id" === pid).select("embedding")
        .collect()(0).getSeq[Float](0)
      val exact = Similarity.topK(emb, "vec_id", "embedding", probe, k)
        .select("vec_id").as[Long].collect().toSet
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding", cents, probe,
        k = k, nProbe = 2).select("vec_id").as[Long].collect().toSet
      approx.intersect(exact).size.toDouble / k
    }
    val meanRecall = recalls.sum / recalls.length
    // pinned floor: measured 2-of-8-cells recall on this corpus; a drop
    // below means the cell assignment or probe ranking regressed
    assert(meanRecall >= 0.60, s"recall@nProbe=2 fell to $meanRecall ($recalls)")
    // full probe is exact by construction — recall 1.0, no pin needed
    val probe0 = emb.filter($"vec_id" === 3L).select("embedding")
      .collect()(0).getSeq[Float](0)
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding", cents, probe0,
      k = k, nProbe = 8).select("vec_id").as[Long].collect().toSet
    val exact0 = Similarity.topK(emb, "vec_id", "embedding", probe0, k)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact0)
  }

  test("int8 quantization: half-step error bound, saturation, zero vector, cosine survives") {
    import graft.operators.Quantize
    val emb = spark.range(200).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => (sin($"id" * 7 + d) * 3.5).cast("float")).as("embedding"))
      .unionByName(Seq((999L, Seq.fill(16)(0f))).toDF("vec_id", "embedding"))
    val rep = Quantize.int8Report(emb, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r).toMap
    rep.foreach { case (id, r) =>
      val scale = r.getDouble(1)
      val (qMin, qMax) = (r.getInt(3), r.getInt(4))
      val err = r.getDouble(6)
      assert(qMin >= -127 && qMax <= 127, s"vec $id out of int8 range")
      // max-abs scaling: half a quantization step is the worst case
      assert(err <= scale / 254 + 1e-12, s"vec $id err $err > ${scale / 254}")
      if (id != 999L) {
        // the max-magnitude coordinate always saturates to +-127
        assert(r.getLong(5) >= 1L, s"vec $id never saturates")
      } else {
        // all-zero vector: scale 0, all q 0, zero error
        assert(scale == 0.0 && r.getLong(2) == 0L && err == 0.0)
      }
    }
    // round-trip: cosine(dequantized, original) stays ~1 for every vector
    val q = Quantize.quantize(emb.filter($"vec_id" =!= 999L), "embedding")
    val worst = q.select(Similarity.cosine(
        transform(Quantize.dequantize(col("qvec"), col("scale")),
          x => x.cast("float")),
        col("embedding")).as("cos"))
      .agg(min("cos")).as[Double].head()
    assert(worst > 0.9999, s"quantization broke cosine: $worst")
  }

  // --- BM25 / vocabulary / rare tokens ---------------------------------

  test("bm25Rank: exact scores on a hand-checked corpus, non-matching docs omitted") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian durian durian")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Rank(docs, "doc_id", "text", Seq("apple"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // mirror the operator's exact double math: N=3, df=2, avgdl=8/3
    val idf = (3.0 - 2.0 + 0.5) / (2.0 + 0.5)
    val avgdl = 8L.toDouble / 3L.toDouble
    def score(tf: Long, dl: Long): Double = {
      val core = (tf.toDouble * (1.2 + 1.0)) /
        (tf.toDouble + 1.2 * ((1.0 - 0.75) + 0.75 * dl.toDouble / avgdl))
      math.floor(idf * core * 1000000.0 + 0.5) / 1000000.0
    }
    assert(out.toSeq == Seq((1L, score(2, 3)), (2L, score(1, 2))))
  }

  test("bm25Rank: a term absent from the corpus contributes nothing, never errors") {
    val docs = Seq((1L, "apple banana"), (2L, "cherry date")).toDF("doc_id", "text")
    val onlyAbsent = TextAnalysis.bm25Rank(docs, "doc_id", "text",
      Seq("zzz_not_in_corpus"), topK = 5).collect()
    assert(onlyAbsent.isEmpty, "no matching docs -> empty ranking")
    val mixed = TextAnalysis.bm25Rank(docs, "doc_id", "text",
      Seq("apple", "zzz_not_in_corpus"), topK = 5)
      .collect().map(_.getLong(0))
    assert(mixed.toSeq == Seq(1L), "present terms still rank")
  }

  test("bm25Rank: rarer term outweighs common term at equal tf") {
    val docs = Seq(
      (1L, "common rare"), (2L, "common other"), (3L, "common filler"),
      (4L, "common words"), (5L, "common stuff")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Rank(docs, "doc_id", "text",
      Seq("common", "rare"), topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.head._1 == 1L, s"doc with the rare term must rank first: ${out.toSeq}")
    assert(out.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("vocabCoverage: exact cumulative shares, deterministic tie order") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, "doc_id", "text", topK = 2)
      .orderBy("rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", 3L, 1, 3.0 / 6.0), ("b", 2L, 2, 5.0 / 6.0)))
  }

  test("rareTokenRatio: counts occurrences, explicit NULL for empty docs") {
    val docs = Seq((1L, "x x y"), (2L, "z"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.rareTokenRatio(docs, "doc_id", "text", maxFreq = 1)
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 1L), (2L, 1L, 1L), (3L, 0L, 0L)))
    assert(out(0).getDouble(3) == 1.0 / 3.0 && out(1).getDouble(3) == 1.0)
    assert(out(2).isNullAt(3), "zero-token doc must get NULL ratio, not 0/0")
  }

  test("inverted index: probe equals direct recompute and prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_idx").toString
    val docs = Seq(
      (1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "delta delta delta"))
      .toDF("doc_id", "text")
    TextAnalysis.writeInvertedIndex(docs, "doc_id", "text", dir, nBuckets = 8)
    val idx = TextAnalysis.readInvertedIndex(spark, dir)
    val got = TextAnalysis.probePostings(idx, Seq("alpha", "delta"), nBuckets = 8)
      .orderBy("term", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("alpha", 1L, 2L), ("delta", 3L, 3L)))
    // the probe prunes to the terms' bucket directories at planning time
    val planned = TextAnalysis.probePostings(idx, Seq("alpha"), nBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(planned.linesIterator.exists(l =>
      l.contains("PartitionFilters:") && l.contains("term_bucket")),
      s"expected partition pruning on term_bucket in:\n$planned")
  }

  test("bm25FromIndex reproduces bm25Rank exactly (indexed path ≡ scan path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    TextAnalysis.writeBm25Index(docs, "doc_id", "text", dir, nBuckets = 16)
    val scan = TextAnalysis.bm25Rank(docs, "doc_id", "text",
      Seq("dup", "vector"), topK = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val indexed = TextAnalysis.bm25FromIndex(spark, dir,
      Seq("dup", "vector"), topK = 20, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(scan.nonEmpty && scan.toSeq == indexed.toSeq)
  }

  test("appendToBm25Index: build-then-append equals one-shot full build") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_bm25_incr").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_bm25_full").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    TextAnalysis.writeBm25Index(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dirA, nBuckets = 16)
    TextAnalysis.appendToBm25Index(docs.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", dirA, nBuckets = 16)
    TextAnalysis.writeBm25Index(docs, "doc_id", "text", dirB, nBuckets = 16)
    def rank(d: String) = TextAnalysis.bm25FromIndex(spark, d,
      Seq("dup", "vector"), topK = 20, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rank(dirA).nonEmpty && rank(dirA) == rank(dirB))
  }

  test("pairwiseJaccardEstimate: exact 1/3 for {dup, dup, disjoint} corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1: J = 1
      (3L, "one two three four five six")     // disjoint: J = 0 with both
    ).toDF("doc_id", "text")
    val r = DedupApprox.pairwiseJaccardEstimate(docs, "doc_id", "text").head()
    // identical docs collide on every lane (c=2 → 2 per lane, 32 total);
    // mean estimate = 32 / (16 · 3 · 2) = exactly the true mean J of 1/3
    assert(r.getLong(0) == 3L && r.getInt(1) == 16)
    // BIGINT in the final projection (decimal routing stays internal)
    assert(r.getLong(2) == 32L, s"collisions ${r.get(2)}")
    assert(r.getDouble(3) == 32.0 / 96.0)
  }

  // --- shingle containment / centroid outliers -------------------------

  test("containmentPairs: subset relation scores ~1 one way, partial the other") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),                // 4 shingles, all inside doc 2
      (2L, "w1 w2 w3 w4 w5 w6 x1 x2 x3"),       // 7 shingles
      (3L, "z1 z2 z3 z4 z5")).toDF("doc_id", "text")
    val out = DedupApprox.containmentPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.5, maxShingleDf = 100)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 4L, 1.0),
      (2L, 1L, 4L, math.floor(4.0 / 7.0 * 10000 + 0.5) / 10000)))
  }

  test("containmentPairs: hot-shingle cap kills boilerplate pair fan-out") {
    val docs = Seq(
      (1L, "same old boilerplate line here"),
      (2L, "same old boilerplate line there"),
      (3L, "same old boilerplate line everywhere")).toDF("doc_id", "text")
    // every SHARED shingle sits in all 3 docs (df=3 > cap 2) and is
    // dropped pre-join; the df=1 tails are unique, so no pairs survive —
    // while the uncapped run pairs everything
    val capped = DedupApprox.containmentPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.1, maxShingleDf = 2)
    assert(capped.count() == 0L)
    val uncapped = DedupApprox.containmentPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.1, maxShingleDf = 100)
    assert(uncapped.count() == 6L)
  }

  test("centroidOutliers flags the distance tail of its own cell only") {
    val e1 = Seq(1f, 0f); val e2 = Seq(0f, 1f)
    val rows = Seq(
      (10L, Seq(1.0f, 0.0f)), (11L, Seq(0.995f, 0.1f)), (12L, Seq(0.995f, -0.1f)),
      (13L, Seq(0.8f, 0.6f)),                    // cell 0 outlier (dist 0.2)
      (20L, Seq(0.0f, 1.0f)), (21L, Seq(0.1f, 0.995f)), (22L, Seq(-0.1f, 0.995f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(df, "vec_id", "embedding",
      Seq(e1, e2), pctl = 0.75).collect()
    val flagged = out.map(_.getLong(0)).toSet
    assert(flagged.contains(13L), s"true outlier must be flagged: $flagged")
    assert(!flagged.contains(10L) && !flagged.contains(20L),
      s"centroid-coincident members must not be flagged: $flagged")
    // every flagged row's distance genuinely exceeds its cell's cutoff
    out.foreach(r => assert(r.getDouble(2) >= r.getDouble(3),
      s"row $r dist below its own cutoff"))
  }

  test("canonicalizeUrl: fragment, tracking params, authority case, slashes") {
    val cases = Seq(
      ("HTTPS://WWW.Example.COM/Path/Sub/?utm_source=a&b=1#frag",
        "https://www.example.com/Path/Sub/?b=1"),      // path case preserved
      ("http://a.com/p?utm_campaign=x", "http://a.com/p"), // dangling ? dropped
      ("x://h/p?a=1&utm_x=2&b=3", "x://h/p?a=1&b=3"),   // mid-query removal
      ("HTTP://A.com/", "http://a.com"),                 // trailing slash
      ("relative/path/", "relative/path"),               // no authority: untouched case
      ("https://h.io/p?fbclid=abc#x", "https://h.io/p"),
      // boundary anchoring: params merely CONTAINING a tracker name or
      // value survive intact — only whole tracking params are removed
      ("https://s.com/p?xgclid=1&a=2", "https://s.com/p?xgclid=1&a=2"),
      ("https://s.com/p?q=utm_source=abc", "https://s.com/p?q=utm_source=abc"),
      ("https://s.com/p?utm_a=1&utm_b=2&c=3", "https://s.com/p?c=3"))
    val df = cases.toDF("url", "want")
    val bad = df.filter(TextAnalysis.canonicalizeUrl(col("url")) =!= col("want"))
      .select(col("url"), TextAnalysis.canonicalizeUrl(col("url")).as("got"), col("want"))
      .collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  // --- bloom-filter pre-filtered join ----------------------------------

  test("bloomJoin equals the plain join and actually prunes the probe side") {
    import graft.operators.BloomJoin
    val probe = (1L to 2000L).map(k => (k, s"p$k")).toDF("k", "pv")
    val build = (1L to 2000L).filter(_ % 100 == 0).map(k => (k, s"b$k"))
      .toDF("k", "bv")
    val got = BloomJoin.bloomJoin(probe, build, "k", expectedItems = 64)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = probe.join(build, Seq("k"), "inner")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == want.toSeq)
    // the sketch filter itself removes the vast majority of probe rows
    val sketch = BloomJoin.buildFilter(build, "k", expectedItems = 64, fpp = 0.03)
    val kept = probe.filter(BloomJoin.mightContain(sketch, col("k"))).count()
    assert(kept >= 20 && kept < 400, s"expected ~20 + fp of 2000 kept, got $kept")
    // and the filter is a codegen'd expression in the plan, not a udf
    // (range-backed frame: a LocalRelation would be folded away entirely)
    val plan = spark.range(2000).withColumnRenamed("id", "k")
      .filter(BloomJoin.mightContain(sketch, col("k")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("novelRows equals the exact anti-join even with a fp-heavy sketch") {
    import graft.operators.BloomJoin
    val corpus = (1L to 1000L).filter(_ % 3 == 0).map(k => (k, s"c$k"))
      .toDF("k", "v")
    val batch = (1L to 1000L).map(k => (k, s"b$k")).toDF("k", "v")
    // undersized sketch → plenty of false positives → exact path exercised
    val sketch = BloomJoin.buildFilter(corpus, "k", expectedItems = 32, fpp = 0.3)
    val got = BloomJoin.novelRows(batch, corpus, "k", sketch)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = batch.join(corpus.select(col("k")), Seq("k"), "left_anti")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
    // null keys are novel (anti-join semantics), with or without fp routing
    val nb = Seq((Some(3L), "x"), (None, "n")).toDF("k", "v")
    val gotNull = BloomJoin.novelRows(nb, corpus, "k", sketch).collect()
    assert(gotNull.map(_.getString(1)).toSeq == Seq("n"))
  }

  test("bloomJoin: NULL keys never match but never crash; outer joins rejected") {
    import graft.operators.BloomJoin
    val probe = Seq((Some(1L), "a"), (None, "n"), (Some(5L), "x"))
      .toDF("k", "pv")
    val build = Seq((Some(1L), "b"), (None, "bn")).toDF("k", "bv")
    val got = BloomJoin.bloomJoin(probe, build, "k", expectedItems = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, "a", "b")))
    intercept[IllegalArgumentException] {
      BloomJoin.bloomJoin(probe, build, "k", joinType = "left")
    }
  }

  test("duplicateSpans: corpus-duplicated windows merge into maximal spans") {
    val docs = Seq(
      (1L, "a b c d e f"),             // "a b c"@0, "b c d"@1 shared with doc 2
      (2L, "z z a b c d q"),           // ...at positions 2, 3
      (3L, "totally unrelated words here"),
      (4L, "x y"),                     // shorter than k: no windows at all
      (5L, "m m m m")).toDF("doc_id", "text") // WITHIN-doc duplication counts too
    val out = TextAnalysis.duplicateSpans(docs, "doc_id", "text", k = 3)
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // overlapping dup windows merge: doc1 [0,3)+[1,4) -> [0,4), doc2
    // [2,5)+[3,6) -> [2,6), doc5's two identical windows -> [0,4)
    assert(out.toSeq == Seq((1L, 0L, 4L, 2L), (2L, 2L, 6L, 2L), (5L, 0L, 4L, 2L)))
    // disjoint duplicated runs stay separate spans (gap of clean tokens)
    val gap = Seq(
      (1L, "a b c GAP1 GAP2 GAP3 d e f"),
      (2L, "a b c OTHER WORDS HERE d e f")).toDF("doc_id", "text")
    val spans = TextAnalysis.duplicateSpans(gap, "doc_id", "text", k = 3)
      .filter(col("id") === 1L).orderBy("span_start").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq((0L, 3L), (6L, 9L)))
  }

  test("prefixFilterPairs: equals brute force — the no-false-negative claim") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),     // J(1,2) = 4/6 = 0.6667
      (3L, "alpha beta gamma delta epsilon"),  // exact dup of 1: J = 1.0
      (4L, "omega psi chi phi"),               // J vs all = 0
      (5L, "alpha beta omega psi chi phi"))    // J(4,5) = 4/6 = 0.6667
      .toDF("doc_id", "text")
    val got = DedupApprox.prefixFilterPairs(docs, "doc_id", "text", 0.6)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute force over all 10 pairs at the same threshold
    val brute = docs.as("x").join(docs.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        DedupApprox.jaccard(col("x.text"), col("y.text"), k = 1).as("j"))
      .filter(col("j") >= 0.6).orderBy("x.doc_id", "y.doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(t => (t._1, t._2)).toSeq == brute.toSeq)
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    assert(got.find(t => t._1 == 1L && t._2 == 3L).get._3 == 1.0)
    // 4/6 = 0.6667 passes at 0.6 but not at 0.7 — the threshold is exact,
    // so tightening it must drop every non-identical pair here
    val tight = DedupApprox.prefixFilterPairs(docs, "doc_id", "text", 0.7)
    assert(tight.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L)))
    // positional-filter stress: varied lengths and partial overlaps at
    // two thresholds — the PPJoin bound may only prune, never drop a
    // qualifying pair
    val words = (0 until 40).map(i => s"w$i")
    val mixed = (1 to 12).map { i =>
      val n = 4 + (i * 7) % 17
      (i.toLong, (0 until n).map(j => words((j * i + i) % 40)).distinct.mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.8)) {
      val fast = DedupApprox.prefixFilterPairs(mixed, "doc_id", "text", t)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val slow = mixed.as("x").join(mixed.as("y"), col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id"),
          DedupApprox.jaccard(col("x.text"), col("y.text"), k = 1).as("j"))
        .filter(col("j") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == slow, s"threshold $t")
    }
  }

  test("prefixFilterPairs pair-volume fence: a duplication-dense corpus " +
      "refuses LOUDLY before the candidate join, pointing at the " +
      "sampled auditor; under the cap it runs unchanged") {
    // 40 DISTINCT token sets all sharing their rare prefix tokens (the
    // boilerplate shape: exact-set collapse cannot save this) — the
    // candidate forecast is ~40·39/2 per shared token, over a cap of 10
    val dense = (1 to 40).map(i =>
      (i.toLong, s"shared1 shared2 shared3 shared4 uniq$i"))
      .toDF("doc_id", "text")
    spark.conf.set("spark.graft.prefixJoin.maxCandidatePairs", "10")
    try {
      val e = intercept[IllegalStateException](
        DedupApprox.prefixFilterPairs(dense, "doc_id", "text", 0.6)
          .collect())
      assert(e.getMessage.contains("auditRecall") &&
        e.getMessage.contains("maxCandidatePairs"),
        s"the refusal must point at the sampled auditor and the cap: " +
          s"${e.getMessage}")
    } finally
      spark.conf.unset("spark.graft.prefixJoin.maxCandidatePairs")
    // default cap: same corpus runs and matches brute force
    val got = DedupApprox.prefixFilterPairs(dense, "doc_id", "text", 0.6)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = dense.as("x").join(dense.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        DedupApprox.jaccard(col("x.text"), col("y.text"), k = 1).as("j"))
      .filter(col("j") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
  }

  test("auditRecall: per-stratum sampled recall from exact in-sample counts") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "a"),
      (2L, "alpha beta gamma delta zeta", "a"),    // J(1,2) = 4/6 >= 0.6
      (3L, "alpha beta gamma delta epsilon", "a"), // exact dup of 1
      (4L, "omega psi chi phi lambda", "b"),
      (5L, "kappa mu nu xi omicron", "b"))         // stratum b: no pairs
      .toDF("doc_id", "text", "stratum")
    val full = DedupApprox.auditRecall(docs, "doc_id", "text", "stratum",
        rates = Map.empty, defaultRate = 1.0, threshold = 0.6,
        shingleK = 1, bands = 8, rows = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(full.map(_._1).toSeq == Seq("a", "b"))
    val (_, aDocs, aTrue, aFound, aRecall) = full(0)
    // rate-1.0 truth must equal the whole-corpus exact join: 3 docs,
    // pairs (1,2), (1,3), (2,3); found <= true (no false positives
    // survive the exact verify) and the recall lattice is consistent
    assert(aDocs == 3L && aTrue == 3L)
    assert(aFound >= 0L && aFound <= aTrue)
    assert(aRecall ==
      math.floor(aFound.toDouble / aTrue * 1000000 + 0.5) / 1000000)
    // a stratum with no true pairs audits as vacuously complete
    assert(full(1) == (("b", 2L, 0L, 0L, 1.0)))
    // rate-0 stratum is excluded entirely — membership is the
    // deterministic md5 cutoff, so this is exact, not probabilistic
    val only = DedupApprox.auditRecall(docs, "doc_id", "text", "stratum",
        rates = Map("b" -> 0.0), defaultRate = 1.0, threshold = 0.6,
        shingleK = 1, bands = 8, rows = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(only.toSeq == Seq(("a", 3L)))
    // rerun-stable: the audit is a pure function of (frame, rates)
    val again = DedupApprox.auditRecall(docs, "doc_id", "text", "stratum",
        rates = Map.empty, defaultRate = 1.0, threshold = 0.6,
        shingleK = 1, bands = 8, rows = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(again.toSeq == full.toSeq)
  }

  test("quality rules: one-pass violation counts, NULL predicate fails, FK orphans") {
    import graft.operators.Quality
    val rows = Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(-5.0), "ok"),                       // fails positive rule
      (3L, None, "ok"),                             // NULL predicate -> violation
      (4L, Some(3.0), null.asInstanceOf[String]))   // NULL label
      .toDF("id", "v", "label")
    val got = Quality.checkRules(rows, Seq(
      "v_positive" -> (col("v") > 0),
      "label_present" -> col("label").isNotNull,
      "always_true" -> lit(true)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("v_positive", 4L, 2L, false),      // -5 fails, NULL v fails
      ("label_present", 4L, 1L, false),
      ("always_true", 4L, 0L, true)))
    // FK: NULL child keys are orphans even when the parent has NULLs
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(Some(1L), Some(2L), None).toDF("pk")
    val fk = Quality.checkForeignKey(child, "fk", parent, "pk", "fk_ok")
      .collect().head
    assert((fk.getString(0), fk.getLong(1), fk.getLong(2), fk.getBoolean(3)) ==
      ("fk_ok", 4L, 2L, false)) // 99 and NULL are orphans
  }

  test("ed1Pairs: equals brute-force levenshtein — insert/delete/substitute/equal") {
    import graft.operators.FuzzyJoin
    val rows = Seq(
      (1L, "kitten"),   // vs 2: substitute -> 1
      (2L, "mitten"),
      (3L, "kitte"),    // vs 1: delete -> 1; vs 2: 2
      (4L, "kittens"),  // vs 1: insert -> 1; vs 3: 2
      (5L, "kitten"),   // equal to 1 -> 0
      (6L, "ab"), (7L, "ba"),  // share deletion variant "a" but ed = 2
      (8L, ""), (9L, "x"),     // empty vs one char -> 1
      (10L, "totally-different"))
      .toDF("id", "s")
    val got = FuzzyJoin.ed1Pairs(rows, "id", "s")
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = rows.as("x").join(rows.as("y"), col("x.id") < col("y.id"))
      .withColumn("d", levenshtein(col("x.s"), col("y.s")))
      .filter(col("d") <= 1)
      .select(col("x.id"), col("y.id"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
    assert(got.contains((1L, 5L, 0)))       // equal pair at distance 0
    assert(got.contains((8L, 9L, 1)))       // empty-string edge
    assert(!got.exists(t => t._1 == 6L && t._2 == 7L)) // verify kills ed=2
    // NULL strings are dropped, not matched
    val withNull = Seq((1L, "abc"), (2L, null.asInstanceOf[String]))
      .toDF("id", "s")
    assert(FuzzyJoin.ed1Pairs(withNull, "id", "s").count() == 0L)
  }

  test("rrfFuse: rank-reciprocal sum, absent list contributes 0, ties by id") {
    val a = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    val b = Seq((5L, 1L), (20L, 2L)).toDF("id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), "id", kRrf = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // 20 is in both lists at rank 2: 2/62; 5 and 10 tie at 1/61 -> id asc
    assert(out.map(_._1).toSeq == Seq(20L, 5L, 10L))
    assert(out(0)._2 == 1.0 / 62 + 1.0 / 62)
    assert(out(1)._2 == 1.0 / 61 && out(2)._2 == 1.0 / 61)
    intercept[IllegalArgumentException] { Similarity.rrfFuse(Seq(a), "id") }
    // N > 2 lists fold left-to-right: a doc in all three beats rank-1
    // singletons, and the rank columns stay addressable per input
    val c = Seq((20L, 1L), (7L, 2L)).toDF("id", "rank")
    val three = Similarity.rrfFuse(Seq(a, b, c), "id", kRrf = 60, topK = 10)
      .collect()
    assert(three.head.getLong(0) == 20L)
    assert(three.head.getDouble(4) == 1.0 / 62 + 1.0 / 62 + 1.0 / 61)
  }

  test("duplicateSpans: docs shorter than k never produce windows") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    // both docs are identical but have no 3-windows: empty result, not
    // a crash and not a degenerate whole-doc window
    assert(TextAnalysis.duplicateSpans(docs, "doc_id", "text", k = 3)
      .count() == 0)
  }

  // --- content-defined chunking -----------------------------------------

  test("cdcChunks: insertion reflows ONE chunk; fixed-size chunking shifts all") {
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    val edited = "zz0 zz1 zz2 " + base // insertion at the front
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = TextAnalysis.cdcChunks(df, "doc_id", "text", meanToks = 16)
      .select($"doc_id", $"chunk_hash").as[(Long, Long)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    // every chunk of the original except the one the edit landed in
    // must reappear verbatim in the edited doc
    assert((a -- b).size <= 1, s"CDC lost ${(a -- b).size} chunks to a front insertion")
    assert(a.size > 5, s"expected several chunks, got ${a.size}")
    // the fixed-size counterpart loses (nearly) everything to the shift
    val fa = TextAnalysis.chunkTokens(df.filter($"doc_id" === 1L), "doc_id", "text", 16, 16)
      .select($"chunk_fp").as[String].collect().toSet
    val fb = TextAnalysis.chunkTokens(df.filter($"doc_id" === 2L), "doc_id", "text", 16, 16)
      .select($"chunk_fp").as[String].collect().toSet
    assert((fa -- fb).size > (a -- b).size,
      "fixed-size chunking should lose more chunks than CDC under insertion")
  }

  test("cdcChunks: chunk token counts cover the doc exactly; boundary closes chunk") {
    val df = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.cdcChunks(df, "doc_id", "text", meanToks = 8)
      .select($"chunk_idx", $"n_toks").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).sum == 100L, "chunks must partition the token stream")
    assert(got.map(_._1).toSeq == got.indices.map(_.toLong), "chunk indices contiguous from 0")
  }

  // --- entity resolution ------------------------------------------------

  test("linkPairs: multi-pass blocking + weighted agreement, hand-checked") {
    val df = Seq(
      (1L, Option("jones"), Option(100.0), 1, "auto"),
      (2L, Option("jones"), Option(200.0), 1, "auto"), // name exact: 40+20+10=70
      (3L, Option("jonez"), Option(100.0), 2, "bike"), // vs 1: ed1 40 + acct 30 = 70
      (4L, Option("smith"), Option(300.0), 1, "auto"), // never blocked: 30 max
      (5L, None: Option[String], Option(100.0), 1, "auto") // NULL name, acct block: vs 1 = 60
    ).toDF("id", "name", "acct", "nat", "seg")
    val got = graft.operators.EntityResolution.linkPairs(df, "id", "name",
      nameWeight = 40, exactCols = Seq("acct" -> 30, "nat" -> 20, "seg" -> 10),
      blockCols = Seq("acct"), threshold = 60)
      .select($"id_a", $"id_b", $"score").as[(Long, Long, Long)]
      .collect().sortBy(p => (p._1, p._2)).toSeq
    assert(got == Seq((1L, 2L, 70L), (1L, 3L, 70L), (1L, 5L, 60L)), s"got $got")
  }

  test("linkPairs: threshold below unblocked weight sum is rejected") {
    val df = Seq((1L, "a", 1.0)).toDF("id", "name", "acct")
    intercept[IllegalArgumentException] {
      graft.operators.EntityResolution.linkPairs(df, "id", "name", 40,
        Seq("acct" -> 30), blockCols = Seq.empty, threshold = 30)
    }
  }

  // --- markup stripping -------------------------------------------------

  test("stripMarkup: scripts/styles/comments/tags removed, entities decoded") {
    val html = """<html><!-- note
      |spanning lines --><head><STYLE media="all">body { color: red }
      |</style></head><body><h1>Title</h1>
      |<script type="text/js">if (1 < 2) { emit("<p>decoy</p>"); }
      |</script><p class="a">alpha &amp; beta &lt;tag&gt; &quot;q&#39;s&quot;&nbsp;end</p>
      |<br/>tail</body></html>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(graft.operators.TextAnalysis.stripMarkup($"h")).as[String].head()
    assert(got == "Title alpha & beta <tag> \"q's\" end tail", s"got [$got]")
  }

  test("stripMarkup: unclosed '<' is text, double-encoded entity single-decodes") {
    val got = Seq("a < b and &amp;lt; stays encoded <b>bold</b>").toDF("h")
      .select(graft.operators.TextAnalysis.stripMarkup($"h")).as[String].head()
    assert(got == "a < b and &lt; stays encoded bold", s"got [$got]")
  }

  // --- k-anonymity ------------------------------------------------------

  test("kAnonymity: hand-checked groups, NULL QI forms its own group") {
    val df = Seq(
      ("us", "a"), ("us", "a"), ("us", "a"),       // group of 3
      ("fr", "b"), ("fr", "b"),                     // group of 2
      ("de", "c"),                                  // group of 1
      (null, "a"), (null, "a")                      // NULL group of 2
    ).toDF("country", "seg")
    val r = graft.operators.Quality.kAnonymity(df, Seq("country", "seg"), k = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((8L, 4L, 1L, 3L, 5L)),
      s"(n_rows, n_groups, min_group, n_groups_below_k, n_rows_below_k) was $r")
  }

  // --- incremental aggregate rollup -------------------------------------

  test("incremental rollup: fold of per-period partials == one-pass recompute, exactly") {
    val ev = graft.sources.Sources.readTable(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", to_date($"ts").as("day"),
        ($"value".cast("double")).as("value"))
    import graft.operators.IncrementalAgg
    // three disjoint increments, folded
    val p1 = IncrementalAgg.partials(ev.filter($"day" < "2024-01-10"), Seq("user_id"), $"day", "value")
    val p2 = IncrementalAgg.partials(ev.filter($"day" >= "2024-01-10" && $"day" < "2024-01-20"), Seq("user_id"), $"day", "value")
    val p3 = IncrementalAgg.partials(ev.filter($"day" >= "2024-01-20"), Seq("user_id"), $"day", "value")
    val inc = IncrementalAgg.rollup(p1.unionByName(p2).unionByName(p3), Seq("user_id"))
    // direct: one partials pass over everything (single period), folded
    val direct = IncrementalAgg.rollup(
      IncrementalAgg.partials(ev, Seq("user_id"), lit(0), "value"), Seq("user_id"))
    val a = inc.orderBy("user_id").collect().toSeq
    val b = direct.orderBy("user_id").collect().toSeq
    assert(a == b, "incremental fold must be bit-identical to the one-pass form")
  }

  // --- water-filling budget allocation ----------------------------------

  test("fairShareBudget: hand-checked water-fill, full-coverage and zero budgets") {
    val df = Seq(("a", 1L), ("b", 5L), ("c", 10L)).toDF("g", "w")
    def alloc(budget: Long): Map[String, (Long, Boolean)] =
      graft.operators.Sampling.fairShareBudget(df, Seq("g"), "w", budget)
        .select("g", "alloc", "capped").as[(String, Long, Boolean)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // cap binds at the largest group: 12 = 1 + 5 + cap 6
    assert(alloc(12L) == Map("a" -> ((1L, false)), "b" -> ((5L, false)),
      "c" -> ((6L, true))))
    // budget covers everything: no cap, nothing marked capped
    assert(alloc(16L) == Map("a" -> ((1L, false)), "b" -> ((5L, false)),
      "c" -> ((10L, false))))
    assert(alloc(100L).values.forall(!_._2))
    // zero budget: cap 0 binds immediately
    assert(alloc(0L).values.map(_._1).sum == 0L)
    // leveled duplicates: 7 across (5, 5) -> 3 + 3, one unit unspent by
    // the integer water-fill's definition
    val dup = Seq(("x", 5L), ("y", 5L)).toDF("g", "w")
    val d = graft.operators.Sampling.fairShareBudget(dup, Seq("g"), "w", 7L)
      .select("alloc").as[Long].collect().toSeq
    assert(d == Seq(3L, 3L))
  }

  test("fairShareBudget aggregates rows to group weights first") {
    val rows = Seq(("a", 1L), ("a", 2L), ("b", 4L)).toDF("g", "w")
    val out = graft.operators.Sampling.fairShareBudget(rows, Seq("g"), "w", 100L)
      .select("g", "avail").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 3L, "b" -> 4L))
  }

  // --- l-diversity ------------------------------------------------------

  test("lDiversity: hand-checked groups, NULL sensitive is not a value") {
    val df = Seq(
      ("n1", "s1"), ("n1", "s2"), ("n1", "s2"),   // diversity 2
      ("n2", "s1"), ("n2", "s1"),                 // diversity 1 (homogeneous)
      ("n3", null), ("n3", "s1")                  // NULL ignored -> diversity 1
    ).toDF("qi", "sens")
    val r = graft.operators.Quality.lDiversity(df, Seq("qi"), "sens", l = 2)
      .as[(Long, Long, Long, Long, Long)].head()
    // (n_rows, n_groups, min_diversity, n_groups_below_l, n_rows_below_l)
    assert(r == ((7L, 3L, 1L, 2L, 4L)), s"report was $r")
  }

  // --- t-closeness ------------------------------------------------------

  test("tCloseness: hand-checked TVD, absent values via complement, identical group reads 0") {
    // global: s1 x 4, s2 x 2, s3 x 2 (N = 8)
    val df = Seq(
      ("g1", "s1"), ("g1", "s2"), ("g1", "s1"), ("g1", "s3"), // mirrors global -> 0
      ("g2", "s1"), ("g2", "s1"),                             // all-s1: TVD = 1/2
      ("g3", "s2"), ("g3", "s3")                              // no s1: TVD = 1/2
    ).toDF("qi", "sens")
    val r = graft.operators.Quality.tCloseness(df, Seq("qi"), "sens")
      .orderBy("qi").as[(String, Long, Double)].collect().toSeq
    // g1: |2/4-4/8| + |1/4-2/8| + |1/4-2/8| = 0
    // g2: |2/2-4/8| + absent(2+2)/8 = 1/2 + 1/2 -> TVD 1/2
    // g3: |1/2-2/8|*2 + absent 4/8 = 1/2 + 1/2 -> TVD 1/2
    assert(r == Seq(("g1", 4L, 0.0), ("g2", 2L, 0.5), ("g3", 2L, 0.5)), s"was $r")
    // NULL sensitive rows drop entirely
    val withNull = Seq(("g1", "s1"), ("g1", null), ("g2", "s1")).toDF("qi", "sens")
    val r2 = graft.operators.Quality.tCloseness(withNull, Seq("qi"), "sens")
      .orderBy("qi").as[(String, Long, Double)].collect().toSeq
    assert(r2 == Seq(("g1", 1L, 0.0), ("g2", 1L, 0.0)), s"was $r2")
  }

  // --- majority-vote label aggregation ----------------------------------

  test("majorityVote: winner, lexicographic ties, abstentions kept visible") {
    val votes = Seq(
      (1L, "yes"), (1L, "yes"), (1L, "no"),            // clear winner
      (2L, "b"), (2L, "a"),                            // tie -> 'a'
      (3L, null), (3L, "z"),                           // abstention ignored
      (4L, null)                                       // all-abstention item
    ).toDF("item", "label")
    val out = graft.operators.Labels.majorityVote(votes, "item", "label")
      .orderBy("item")
      .select("item", "n_votes", "n_labels", "label", "label_votes")
      .as[(Long, Long, Long, Option[String], Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, Some("yes"), 2L),
      (2L, 2L, 2L, Some("a"), 1L),
      (3L, 1L, 1L, Some("z"), 1L),
      (4L, 0L, 0L, None, 0L)))
    val agree = graft.operators.Labels.majorityVote(votes, "item", "label")
      .orderBy("item").select("agreement").as[Option[Double]].collect().toSeq
    assert(agree == Seq(Some(2.0 / 3.0), Some(0.5), Some(1.0), None))
  }

  // --- chi-square independence ------------------------------------------

  test("chiSquareCells: independent table scores 0, hand-checked association") {
    def mk(rows: Seq[(Double, String, Int)]) =
      rows.flatMap { case (x, y, n) => Seq.fill(n)((x, y)) }.toDF("x", "y")
    val indep = mk(Seq((0.5, "a", 10), (0.5, "b", 10), (1.5, "a", 10), (1.5, "b", 10)))
    val i = graft.operators.Stats.chiSquareCells(indep, "x", 0.0, 2.0, 2, "y")
      .select("term").as[Double].collect().toSeq
    assert(i == Seq(0.0, 0.0, 0.0, 0.0))
    // 9/1 vs 1/9: every E = 5, every term (9-5)^2/5 = (1-5)^2/5 = 3.2
    val assoc = mk(Seq((0.5, "a", 9), (0.5, "b", 1), (1.5, "a", 1), (1.5, "b", 9)))
    val t = graft.operators.Stats.chiSquareCells(assoc, "x", 0.0, 2.0, 2, "y")
      .select("o", "e", "term").as[(Long, Double, Double)].collect().toSeq
    assert(t.forall(_._2 == 5.0) && t.forall(_._3 == 3.2))
    assert(t.map(_._3).sum == 12.8)
  }

  // --- snapshot retention ladder ----------------------------------------

  test("retentionPlan: last/daily/weekly ladder with precedence, drops the rest") {
    val versions = Seq(
      ("t", 1L, 100L),      // day 0 non-champion -> drop
      ("t", 2L, 200L),      // day 0 champion -> daily
      ("t", 3L, 86410L),    // day 1, rank 2 -> last
      ("t", 4L, 86500L)     // day 1 champion, rank 1 -> last (precedence)
    ).toDF("k", "id", "ts")
    val out = graft.operators.Compaction.retentionPlan(versions,
      Seq("k"), "ts", "id", keepLast = 2, keepDaily = 2, keepWeekly = 1)
      .orderBy("id")
      .select("id", "keep", "reason")
      .as[(Long, Boolean, Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, false, None),
      (2L, true, Some("daily")),
      (3L, true, Some("last")),
      (4L, true, Some("last"))))
    // keepDaily = 0 disables the daily rung entirely
    val noDaily = graft.operators.Compaction.retentionPlan(versions,
      Seq("k"), "ts", "id", keepLast = 2, keepDaily = 0, keepWeekly = 0)
      .filter(col("keep")).select("id").as[Long].collect().toSet
    assert(noDaily == Set(3L, 4L))
  }

  // --- vocabulary coverage cutoff ---------------------------------------

  test("vocabCutoff: minimal covering prefix, integer cutoff, full coverage") {
    val docs = Seq("a a a b b c").toDF("text")
    def cut(pct: Int) = TextAnalysis.vocabCutoff(docs, "text", pct)
      .orderBy("rank").select("rank", "token", "n_occ", "cum_before")
      .as[(Long, String, Long, Long)].collect().toSeq
    // 80% of 6 tokens -> target ceil(4.8) = 5: {a(3), b(2)} covers, c out
    assert(cut(80) == Seq((0L, "a", 3L, 0L), (1L, "b", 2L, 3L)))
    // 100% keeps the whole vocabulary
    assert(cut(100).map(_._2) == Seq("a", "b", "c"))
    // 1% still keeps the top token (a cutoff never returns empty on
    // non-empty input: the first row's exclusive prefix is 0)
    assert(cut(1).map(_._2) == Seq("a"))
  }

  // --- snapshot profile drift -------------------------------------------

  test("profileDrift: null wave, new category, unchanged column") {
    val old = Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
      (3L, Some(30.0), "a"), (4L, Some(40.0), "b")).toDF("id", "v", "seg")
    val nw = Seq((1L, None, "a"), (2L, Some(20.0), "b"),
      (3L, Some(30.0), "a"), (4L, Some(40.0), "c")).toDF("id", "v", "seg")
    val out = graft.operators.Stats.profileDrift(old, nw, Seq("id", "v", "seg"))
      .orderBy("column")
      .select("column", "null_rate_delta", "distinct_ratio", "range_moved")
      .as[(String, Option[Double], Option[Double], Boolean)].collect().toSeq
    // id untouched; v gains a null (delta .25) AND loses its min (range
    // moved); seg swaps b->c at one row: distinct 2 -> 3, max moved
    assert(out == Seq(
      ("id", Some(0.0), Some(1.0), false),
      ("seg", Some(0.0), Some(1.5), true),
      ("v", Some(0.25), Some(0.75), true)))
  }

  // --- weight-balanced shard planning -----------------------------------

  test("prefixShards: equals the naive global running sum, NULL weight is 0") {
    val rows = (1 to 200).map(i => (i.toLong, ((i * 13) % 50 + 10).toLong))
    val df = rows.toDF("id", "w")
    val got = graft.operators.GlobalOrder.prefixShards(df,
      Seq(col("w").desc, col("id").asc), "w", shardWeight = 300L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    // naive reference: sort, exclusive prefix, integer divide
    val expect = rows.sortBy { case (id, w) => (-w, id) }
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, w)) => (id, cum / 300L, cum + w) }
      .tail.map { case (id, shard, _) => id -> shard }.toMap
    assert(got == expect)
    // shards are contiguous runs of the order and boundaries never skip
    val shards = rows.sortBy { case (id, w) => (-w, id) }.map(r => got(r._1))
    assert(shards.zip(shards.tail).forall { case (a, b) => b == a || b == a + 1 })
    // NULL weight consumes no budget but keeps its position's shard
    val withNull = Seq((1L, Some(500L)), (2L, None), (3L, Some(100L)))
      .toDF("id", "w")
    val n = graft.operators.GlobalOrder.prefixShards(withNull,
      Seq(col("id").asc), "w", shardWeight = 200L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(n == Map(1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  // --- token-pair lift --------------------------------------------------

  test("tokenPairLift: hand-checked lifts, cap truncates sets consistently") {
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "a c"), (4L, "b c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenPairLift(docs, "doc_id", "text",
      maxTokensPerDoc = 64, minSupport = 2)
      .orderBy("tok_a", "tok_b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // every token df 3, every pair count 2: lift = 4*2/9 on the lattice
    assert(out.map(t => (t._1, t._2, t._3, t._4, t._5)) ==
      Seq(("a", "b", 2L, 3L, 3L), ("a", "c", 2L, 3L, 3L), ("b", "c", 2L, 3L, 3L)))
    assert(out.forall(_._6 == 0.888889))
    // cap 2: d1's sorted set truncates to [a, b]; df AND pair counts
    // follow the capped sets (c loses d1 everywhere, consistently)
    val capped = TextAnalysis.tokenPairLift(docs, "doc_id", "text",
      maxTokensPerDoc = 2, minSupport = 1)
      .orderBy("tok_a", "tok_b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(capped.map(t => (t._1, t._2, t._3, t._4, t._5)) ==
      Seq(("a", "b", 2L, 3L, 3L), ("a", "c", 1L, 3L, 2L), ("b", "c", 1L, 3L, 2L)))
    // lift above independence shows: (a,c) 4*1/6 vs (a,b) 4*2/9
    assert(capped(1)._6 == 0.666667 && capped(0)._6 == 0.888889)
  }

  // --- calibration audit ------------------------------------------------

  test("calibrationBins: hand-checked bins, boundary clamp, NULL drops") {
    val df = Seq(
      (0.05, Some(false)), (0.05, Some(false)),       // bin 0: conf .05 acc 0
      (0.95, Some(true)), (0.95, Some(false)),        // bin 9: conf .95 acc .5
      (1.7, Some(true)),                              // clamps into bin 9
      (-0.3, Some(true)),                             // clamps into bin 0
      (0.5, None)                                     // NULL label drops
    ).toDF("score", "label")
    val out = graft.operators.Stats.calibrationBins(df, "score",
      col("label"), bins = 10)
      .orderBy("bin")
      .select("bin", "n", "n_pos", "confidence", "accuracy", "gap")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    // bin 0: scores .05 .05 -.3 -> conf (.05+.05-.3)/3 ≈ -.066667
    assert(out.map(t => (t._1, t._2, t._3)) == Seq((0L, 3L, 1L), (9L, 3L, 2L)))
    assert(out(0)._4 == -0.066667)
    assert(out(0)._5 == 0.333333)
    assert(out(1)._4 == 1.2) // (.95+.95+1.7)/3 — the mis-scaled 1.7 is visible
    assert(out(1)._5 == 0.666667)
    assert(out(1)._6 == out(1)._5 - out(1)._4)
  }

  // --- Fleiss kappa -----------------------------------------------------

  test("fleissKappa: perfect agreement, hand-checked mixed case, single-label NULL") {
    // perfect: every item unanimous, two labels corpus-wide -> kappa 1
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")).toDF("item", "label")
    val p = graft.operators.Labels.fleissKappa(perfect, "item", "label")
      .select("po", "pe", "kappa").as[(Double, Double, Option[Double])].head()
    assert(p._1 == 1.0 && p._3.contains(1.0))
    // one label corpus-wide: pe = 1 -> kappa undefined (NULL), not 0
    val mono = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a")).toDF("item", "label")
    assert(graft.operators.Labels.fleissKappa(mono, "item", "label")
      .select("kappa").as[Option[Double]].head().isEmpty)
    // mixed, hand-computed: items {a,a,b} and {a,b} ->
    // po = (2+0+0+0) / (6+2) = 0.25; t_a=3 t_b=2 T=5 -> pe = 13/25 = 0.52
    // kappa = (0.25-0.52)/(1-0.52) = -0.5625
    val mixed = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("item", "label")
    val m = graft.operators.Labels.fleissKappa(mixed, "item", "label")
      .select("n_items", "n_votes", "po", "pe", "kappa")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(m._1 == 2L && m._2 == 5L)
    assert(m._3 == 0.25 && m._4 == 0.52)
    assert(m._5.exists(k => math.abs(k - -0.5625) < 1e-9))
    // single-vote items carry no pairs: adding one changes nothing
    val extra = mixed.unionByName(Seq((3L, "b")).toDF("item", "label"))
    val e = graft.operators.Labels.fleissKappa(extra, "item", "label")
      .select("n_items", "po", "pe").as[(Long, Double, Double)].head()
    assert(e._1 == 2L && e._2 == 0.25 && e._3 == 0.52)
  }

  // --- rolling anomaly detection ----------------------------------------

  test("rollingAnomaly: spike over constant baseline flags with NULL zscore") {
    // 40 constant rows, then a spike: baseline variance 0 -> any
    // deviation must flag (a NULL-z threshold would silently pass it)
    val rows = (1 to 40).map(i => ("k", i.toLong, i.toLong, 5.0)) :+
      (("k", 41L, 41L, 9.0))
    val df = rows.toDF("key", "ts", "id", "v")
    val out = graft.operators.Stats.rollingAnomaly(df, "key", "ts", "id", "v",
      lookback = 100, minN = 30, z = 3.0)
      .select("id", "n_base", "mean", "zscore")
      .as[(Long, Long, Double, Option[Double])].collect().toSeq
    assert(out == Seq((41L, 40L, 5.0, None)), s"flags were $out")
    // warm-up: nothing flags before minN baseline rows exist, even the
    // same spike value
    val early = (1 to 10).map(i => ("k", i.toLong, i.toLong, 5.0)) :+
      (("k", 11L, 11L, 9.0))
    assert(graft.operators.Stats.rollingAnomaly(early.toDF("key", "ts", "id", "v"),
      "key", "ts", "id", "v", 100, 30, 3.0).isEmpty)
  }

  test("rollingAnomaly: gaussian-ish baseline flags only the injected spike") {
    // deterministic pseudo-noise in [4, 6]; the injected 50.0 is the
    // only point past 3 sigma of the trailing window
    val rows = (1 to 60).map { i =>
      ("k", i.toLong, i.toLong, 5.0 + (i * 37 % 21 - 10) / 10.0)
    } :+ (("k", 61L, 61L, 50.0))
    val out = graft.operators.Stats.rollingAnomaly(rows.toDF("key", "ts", "id", "v"),
      "key", "ts", "id", "v", lookback = 100, minN = 30, z = 3.0)
      .select("id", "zscore").as[(Long, Option[Double])].collect().toSeq
    assert(out.map(_._1) == Seq(61L), s"flags were $out")
    assert(out.head._2.exists(_ > 3.0))
  }

  test("functionalDependency: held and violated rules, NULL semantics") {
    val df = Seq(
      (Some(1), Some("a"), "x"), (Some(1), Some("a"), "y"), // lhs 1: rhs {a} -> holds side
      (Some(2), Some("b"), "x"), (Some(2), Some("c"), "x"), // lhs 2: {b, c} -> violates
      (Some(3), None, "x"),                                 // NULL rhs is not a value
      (None, Some("d"), "x"), (None, Some("e"), "x"))       // NULL lhs is its own group
      .toDF("k", "v", "z")
    val r = graft.operators.Quality.functionalDependency(df, Seq("k"), "v", "k->v")
      .select($"n_groups", $"n_violating", $"max_distinct", $"holds")
      .as[(Long, Long, Long, Boolean)].head()
    // groups: 1, 2, 3, NULL -> 4; violating: 2 and NULL -> 2; worst 2
    assert(r == ((4L, 2L, 2L, false)))
    val held = graft.operators.Quality.functionalDependency(df, Seq("z"), "z", "z->z")
      .select($"holds").as[Boolean].head()
    assert(held)
  }

  test("PQ: per-subspace argmin codes; ADC exact when subvectors sit on centroids") {
    val emb = Seq(
      (1L, Seq(0f, 0f, 0f, 0f)), (2L, Seq(1f, 1f, 1f, 1f)), // seeds
      (3L, Seq(0f, 0f, 1f, 1f)), (4L, Seq(1f, 1f, 0f, 0f)),
      (5L, Seq(0.1f, 0f, 0.9f, 1f)))
      .toDF("vec_id", "embedding")
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 2, k = 2)
    assert(cbs == Seq(Seq(Seq(0f, 0f), Seq(1f, 1f)),
      Seq(Seq(0f, 0f), Seq(1f, 1f))))
    val enc = Similarity.pqEncode(emb, "embedding", cbs)
    val codes = enc.select($"vec_id", $"_code0", $"_code1")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(codes(3L) == ((0, 1)) && codes(4L) == ((1, 0)))
    assert(codes(5L) == ((0, 1)), "near-centroid subvectors snap to the nearest code")
    // probe on the (0,0)/(1,1) lattice: ADC distances are exact integers
    val got = Similarity.pqAdcTopK(enc, "vec_id", Seq(0f, 0f, 1f, 1f), cbs, 5)
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((3L, 0.0), (5L, 0.0), (1L, 2.0), (2L, 2.0), (4L, 4.0)))
    // dims must split evenly into subspaces
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 3, k = 2)
    }
  }

  test("parseZip: real ZipOutputStream archives parse; truncation/garbage refuse") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val payloads = Seq("hello world " * 10, "abc", "x" * 1000)
    payloads.zipWithIndex.foreach { case (body, i) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(s"f$i.txt"))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    val bytes = bos.toByteArray
    val z = graft.operators.Archives.parseZip(bytes).get
    assert(z.nEntries == 3)
    assert(z.bytesUncomp == payloads.map(_.length).sum.toLong)
    assert(z.bytesComp > 0 && z.bytesComp < bytes.length)
    assert(graft.operators.Archives.parseZip(bytes.dropRight(5)).isEmpty)
    assert(graft.operators.Archives.parseZip("not a zip".getBytes("UTF-8")).isEmpty)
    // a trailing archive comment must not hide the EOCD
    val commented = bytes.dropRight(2) ++ Array[Byte](4, 0) ++
      "note".getBytes("UTF-8")
    assert(graft.operators.Archives.parseZip(commented).exists(_.nEntries == 3))
  }

  test("parseTiff: both endians, SHORT and LONG entries, strict bounds") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // little-endian, SHORT dims 640x480
    val le = hx("49492A00" + "08000000" + "0200" +
      "0001" + "0300" + "01000000" + "8002" + "0000" +
      "0101" + "0300" + "01000000" + "E001" + "0000" + "00000000")
    assert(Multimodal.parseTiff(le) == Some((640L, 480L)))
    // big-endian, LONG dims 70000x2 (width exceeds u16 -> LONG type)
    val be = hx("4D4D002A" + "00000008" + "0002" +
      "0100" + "0004" + "00000001" + "00011170" +
      "0101" + "0004" + "00000001" + "00000002" + "00000000")
    assert(Multimodal.parseTiff(be) == Some((70000L, 2L)))
    // IFD offset past EOF / truncated entry table / missing height
    assert(Multimodal.parseTiff(hx("49492A00" + "FFFF0000")).isEmpty)
    assert(Multimodal.parseTiff(le.dropRight(20)).isEmpty)
    val noH = hx("49492A00" + "08000000" + "0100" +
      "0001" + "0300" + "01000000" + "8002" + "0000" + "00000000")
    assert(Multimodal.parseTiff(noH).isEmpty)
    // dispatch: parseHeader sniffs image/tiff and carries the dims
    val row = Multimodal.parseHeader(le).get
    assert(row.getString(0) == "image/tiff")
    assert(row.getInt(1) == 640 && row.getInt(2) == 480)
  }

  test("parseWebp: VP8X/VP8L/VP8 layouts, strict sync and truncation") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val pre = "52494646" + "24000000" + "57454250" // RIFF size WEBP
    // VP8X: 24-bit LE canvas, stored minus-one -> 16000x9000
    val vp8x = hx(pre + "56503858" + "0A000000" + "00000000" +
      "7F3E00" + "272300")
    assert(Multimodal.parseWebp(vp8x) == Some((16000L, 9000L)))
    // VP8L: 0x2F sig, bits = (w-1) | (h-1)<<14 -> 2048x1024
    val bits = (2047L | (1023L << 14)).toInt
    val vp8l = hx(pre + "5650384C" + "05000000" + "2F" +
      f"${bits & 0xFF}%02X${(bits >> 8) & 0xFF}%02X${(bits >> 16) & 0xFF}%02X${(bits >> 24) & 0xFF}%02X")
    assert(Multimodal.parseWebp(vp8l) == Some((2048L, 1024L)))
    // lossy VP8: frame tag + 9D 01 2A sync + LE16 dims (top 2 bits scale)
    val vp8 = hx(pre + "56503820" + "0A000000" + "000000" + "9D012A" +
      "8002" + "E001") // 640x480
    assert(Multimodal.parseWebp(vp8) == Some((640L, 480L)))
    // scale bits in the top 2 bits are masked off, not dims
    val scaled = hx(pre + "56503820" + "0A000000" + "000000" + "9D012A" +
      "8042" + "E081") // same dims with scale hints set
    assert(Multimodal.parseWebp(scaled) == Some((640L, 480L)))
    // bad VP8 sync refuses; truncated VP8X refuses; unknown chunk refuses
    assert(Multimodal.parseWebp(hx(pre + "56503820" + "0A000000" +
      "000000" + "9D012B" + "8002" + "E001")).isEmpty)
    assert(Multimodal.parseWebp(vp8x.dropRight(3)).isEmpty)
    assert(Multimodal.parseWebp(hx(pre + "414C5048" + "0A000000" +
      "00000000000000000000")).isEmpty)
    // dispatch: parseHeader sniffs image/webp for all classes, carrying
    // dims when parseWebp succeeds and NULLs when it refuses
    val ok = Multimodal.parseHeader(vp8).get
    assert(ok.getString(0) == "image/webp")
    assert(ok.getInt(1) == 640 && ok.getInt(2) == 480)
    val trunc = Multimodal.parseHeader(hx("52494646" + "10000000" +
      "57454250" + "56503858")).get
    assert(trunc.getString(0) == "image/webp")
    assert(trunc.isNullAt(1) && trunc.isNullAt(2))
  }

  test("parseTar: ustar walk, checksum verification, termination modes, strict refusals") {
    // independent hand-rolled ustar writer (the operator never sees this
    // code path): header fields at their POSIX offsets, real checksum
    def header(name: String, size: Long, breakChecksum: Boolean = false): Array[Byte] = {
      val h = new Array[Byte](512)
      def put(off: Int, s: String): Unit =
        System.arraycopy(s.getBytes("ISO-8859-1"), 0, h, off, s.length)
      put(0, name)
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"$size%011o"); put(136, "00000000000")
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = '0'; put(257, "ustar"); put(263, "00")
      val sum = h.map(_ & 0xFF).sum + (if (breakChecksum) 1 else 0)
      put(148, f"$sum%06o"); h(154) = 0; h(155) = ' '
      h
    }
    def entry(name: String, data: Array[Byte]): Array[Byte] = {
      val pad = new Array[Byte]((512 - data.length % 512) % 512)
      header(name, data.length.toLong) ++ data ++ pad
    }
    val zeros = new Array[Byte](1024)
    val two = entry("a.txt", "hello tar".getBytes) ++
      entry("b/c.bin", Array.fill[Byte](700)('x')) ++ zeros
    assert(graft.operators.Archives.parseTar(two)
      == Some(graft.operators.Archives.TarSummary(2, 709L)))
    // clean EOF without zero blocks is accepted
    assert(graft.operators.Archives.parseTar(entry("a", "hi".getBytes))
      == Some(graft.operators.Archives.TarSummary(1, 2L)))
    // a broken checksum refuses the whole archive
    val bad = header("a", 0L, breakChecksum = true) ++ zeros
    assert(graft.operators.Archives.parseTar(bad).isEmpty)
    // truncated data refuses; garbage refuses; empty archive refuses
    assert(graft.operators.Archives.parseTar(
      entry("a", Array.fill[Byte](700)('x')).dropRight(512)).isEmpty)
    assert(graft.operators.Archives.parseTar(
      "definitely not a tar archive".getBytes).isEmpty)
    assert(graft.operators.Archives.parseTar(new Array[Byte](1024))
      == Some(graft.operators.Archives.TarSummary(0, 0L)))
  }

  test("applyChangelog: retract == rebuild; groups leave and enter; extrema rescan is key-pruned") {
    import spark.implicits._
    import graft.operators.IncrementalAgg
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def row(k: Long, id: Long, v: java.lang.Double) = (k, id, ts0, v)
    val base = Seq(
      row(1L, 10L, 5.0), row(1L, 11L, 9.0), row(1L, 12L, 1.0),
      row(2L, 20L, 7.0), row(2L, 21L, 3.0),
      row(3L, 30L, 4.0) // group 3: all rows deleted below
    ).toDF("k", "id", "ts", "v")
    val day = (c: org.apache.spark.sql.Column) => to_date(c)
    val state = IncrementalAgg.partials(base, Seq("k"), day(col("ts")), "v")
    // delete 1's current MINIMUM (forces runner-up discovery), delete
    // ALL of 3; insert a new group 4 and a new row for 1
    val changes = Seq(
      (1L, 12L, ts0, java.lang.Double.valueOf(1.0), "D"),
      (3L, 30L, ts0, java.lang.Double.valueOf(4.0), "D"),
      (1L, 13L, ts0, java.lang.Double.valueOf(2.0), "I"),
      (4L, 40L, ts0, java.lang.Double.valueOf(6.0), "I")
    ).toDF("k", "id", "ts", "v", "op")
    val rawAfter = Seq(
      row(1L, 10L, 5.0), row(1L, 11L, 9.0), row(1L, 13L, 2.0),
      row(2L, 20L, 7.0), row(2L, 21L, 3.0),
      row(4L, 40L, 6.0)
    ).toDF("k", "id", "ts", "v")
    val incr = IncrementalAgg.rollup(IncrementalAgg.applyChangelog(
      state, changes, rawAfter, Seq("k"), day, "ts", "v", "op"), Seq("k"))
    val rebuild = IncrementalAgg.rollup(IncrementalAgg.partials(
      rawAfter, Seq("k"), day(col("ts")), "v"), Seq("k"))
    assertSameRows(incr, rebuild)
    val got = incr.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(5), r.getDouble(6))).toMap
    assert(!got.contains(3L), "an all-deleted group must leave the state")
    assert(got(4L) == (1L, 6.0, 6.0), "a changelog-born group must enter")
    assert(got(1L) == (3L, 2.0, 9.0), "deleting the minimum must surface the runner-up")
    assert(got(2L) == (2L, 3.0, 7.0), "untouched group keeps its extrema")
    // scale evidence: the extrema rescan is pruned by a BROADCAST semi
    // join on the changelog's touched keys — the raw slice never
    // shuffles for it
    val plan = IncrementalAgg.applyChangelog(state, changes, rawAfter,
      Seq("k"), day, "ts", "v", "op").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected a broadcast semi-pruned rescan:\n$plan")
  }

  test("bpeApply: greedy-by-rank merges, cleanup, and empty-doc honesty") {
    import spark.implicits._
    val merges = Seq(("t", "h"), ("a", "n"), ("a", "t"),
      ("th", "e"), ("an", "d"))
    val docs = Seq((1L, "the cat and the hat"),
      (2L, "The CAT!!"), (3L, "")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .bpeApply(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    // "the_cat_and_the_hat" (19 symbols) merges to
    // [the _ c at _ and _ the _ h at] = 11 tokens
    assert(out(1L) == (19L, 11L, 19.0 / 11.0))
    // case + punctuation clean first: "the cat" -> [the _ c at] = 4 tokens
    assert(out(2L) == (7L, 4L, 7.0 / 4.0))
    // empty doc: zero tokens, NULL ratio (not 0/0)
    assert(out(3L) == (0L, 0L, null))
  }

  test("parseMp3: CBR walk, ID3 skip, lenient trailing junk, strict truncation/reserved") {
    def frame(bi: Int, ri: Int, pad: Int): Array[Byte] = {
      val flen = 144000 *
        Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)(bi) /
        Array(44100, 48000, 32000)(ri) + pad
      val f = new Array[Byte](flen)
      f(0) = 0xFF.toByte; f(1) = 0xFB.toByte
      f(2) = ((bi << 4) | (ri << 2) | (pad << 1)).toByte
      f
    }
    val two = frame(9, 0, 0) ++ frame(9, 0, 0) // 128 kbps @ 44100, flen 417
    assert(Multimodal.parseMp3(two) == Some((44100, 2)))
    // ID3v2 prefix skipped by its syncsafe size (10-byte header + 20 bytes)
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 20) ++
      new Array[Byte](20) ++ two
    assert(Multimodal.parseMp3(id3) == Some((44100, 2)))
    // ID3v1-style trailing junk after complete frames is ignored
    assert(Multimodal.parseMp3(two ++ "TAGx".getBytes("UTF-8")) == Some((44100, 2)))
    // a truncated final frame refuses the whole stream
    assert(Multimodal.parseMp3(two.dropRight(5)).isEmpty)
    // reserved bitrate index refuses
    val reserved = frame(9, 0, 0); reserved(2) = 0xF0.toByte
    assert(Multimodal.parseMp3(reserved).isEmpty)
    // mid-stream sample-rate change refuses
    assert(Multimodal.parseMp3(frame(9, 0, 0) ++ frame(9, 1, 0)).isEmpty)
    // padding bit lengthens the frame by exactly one byte
    assert(Multimodal.parseMp3(frame(12, 2, 1)) == Some((32000, 1)))
    // and the duration surfaces through parseHeader
    val row = Multimodal.parseHeader(two).get
    assert(row.getString(0) == "audio/mpeg")
    assert(row.getInt(3) == 2 && row.getLong(4) == 2L * 1152L * 1000L / 44100L)
  }

  test("benfordAudit: hand-checked counts; sub-1/NULL excluded; absent digits still score") {
    // digits: 1.5 -> 1, 25.0 -> 2, 299.9 -> 2; 0.5 and NULL are excluded
    val df = Seq(Some(1.5), Some(25.0), Some(299.9), Some(0.5), None).toDF("v")
    val out = graft.operators.Quality.benfordAudit(df, "v").orderBy("digit")
      .select($"digit", $"n", $"share", $"chi2_term")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == (1 to 9))
    assert(out.map(_._2) == Seq(1L, 2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(out.head._3 == math.floor(1.0 / 3.0 * 1e6 + 0.5) / 1e6)
    // digit 2 is over-represented: term (2 - 3p)^2 / (3p) on the lattice
    val p2 = 0.17609125905568124
    assert(out(1)._4 ==
      math.floor((2.0 - 3.0 * p2) * (2.0 - 3.0 * p2) / (3.0 * p2) * 1e6 + 0.5) / 1e6)
    // absent digit 9 still contributes its full N*p term
    val p9 = 0.04575749056067514
    assert(out(8)._4 ==
      math.floor((0.0 - 3.0 * p9) * (0.0 - 3.0 * p9) / (3.0 * p9) * 1e6 + 0.5) / 1e6)
    // expectations cover the full Benford support and sum to ~1
    assert(math.abs(graft.operators.Quality.BenfordShares.map(_._2).sum - 1.0) < 1e-12)
  }
}

