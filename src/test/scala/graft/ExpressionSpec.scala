package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(0.3f, -1.2f, 4.5f, 0.01f), Seq(2.2f, 0.4f, -0.9f, 3.3f)),
    (2L, Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f)),
    (3L, Seq(0.5f, 0.5f, 0.5f, 0.5f), Seq(0.5f, 0.5f, 0.5f, 0.5f))
  ).toDF("id", "a", "b")

  test("native cosine_sim is bit-identical to the composable HOF form") {
    val both = vecs.select($"id",
      Similarity.cosine($"a", $"b").as("native"),
      Similarity.cosineHof($"a", $"b").as("hof"))
      .as[(Long, Double, Double)].collect()
    both.foreach { case (_, n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("native cosine_sim agrees between codegen and interpreted paths") {
    // wholestage off forces the interpreted/eval path
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      val on = vecs.select(Similarity.cosine($"a", $"b").as("c")).as[Double].collect()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = vecs.select(Similarity.cosine($"a", $"b").as("c")).as[Double].collect()
      assert(on.toSeq.map(java.lang.Double.doubleToLongBits)
        == off.toSeq.map(java.lang.Double.doubleToLongBits))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null vector input yields null, not a crash") {
    val df = Seq((Some(Seq(1f, 0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b").as("c")).collect()
    assert(out.head.isNullAt(0))
  }

  test("native lsh_code matches the unrolled composable form bit-for-bit") {
    // the pre-native reference form: bits sign bits of an unrolled
    // element_at * lit(plane) sum — the arithmetic LshCode must reproduce
    def unrolled(vec: org.apache.spark.sql.Column, bits: Int, dim: Int) = {
      val proj = (i: Int) =>
        (0 until dim).map(d =>
          element_at(vec, d + 1).cast("double") *
            lit(graft.functions.LshCode.planeComponent(i, d)))
          .reduce(_ + _)
      (0 until bits).map(i => when(proj(i) >= 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_))
    }
    val df = vecs.select($"id",
      Similarity.lshCode($"a", 8, 4).as("native"),
      unrolled($"a", 8, 4).as("ref"))
      .as[(Long, Long, Long)].collect()
    df.foreach { case (id, n, u) => assert(n == u, s"id=$id native=$n unrolled=$u") }
  }

  test("lsh_code agrees between codegen and interpreted paths, and with driver-side codeOf") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      val on = vecs.select($"id", Similarity.lshCode($"a", 8, 4).as("c"))
        .as[(Long, Long)].collect().toMap
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = vecs.select($"id", Similarity.lshCode($"a", 8, 4).as("c"))
        .as[(Long, Long)].collect().toMap
      assert(on == off)
      val local = Seq(
        1L -> Seq(0.3f, -1.2f, 4.5f, 0.01f),
        2L -> Seq(1f, 0f, 0f, 0f),
        3L -> Seq(0.5f, 0.5f, 0.5f, 0.5f))
      local.foreach { case (id, v) =>
        assert(graft.functions.LshCode.codeOf(v, 8, 4) == on(id), s"id=$id")
      }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("native md5_prefix60 is bit-identical to the composable conv/substr/md5 form") {
    val strs = Seq("", "a", "hello world", "héllo wörld 世界",
      "0:0", "tab\tand\nnewline", "x" * 500).toDF("s")
    val both = strs.select(
      graft.functions.Checksums.md5PrefixLong($"s").as("native"),
      conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    both.foreach { case (n, r) => assert(n == r) }
    // interpreted path (inside a HOF lambda) matches codegen'd projection
    val hof = Seq(Seq("a", "b", "c")).toDF("arr")
      .select(transform($"arr",
        x => graft.functions.Checksums.md5PrefixLong(x)).as("hs"))
      .collect().head.getSeq[Long](0)
    val direct = Seq("a", "b", "c").toDF("s")
      .select(graft.functions.Checksums.md5PrefixLong($"s")).as[Long].collect().toSeq
    assert(hof == direct)
    // null propagates
    assert(Seq(Option.empty[String]).toDF("s")
      .select(graft.functions.Checksums.md5PrefixLong($"s")).collect().head.isNullAt(0))
  }

  test("nfc_normalize composes decomposed sequences, is idempotent, and agrees between codegen and interpreted paths") {
    val decomposedE = "cafe\u0301"    // e + combining acute
    val composedE = "caf\u00e9"        // precomposed e-acute
    val strs = Seq(decomposedE, composedE, "plain ascii", "",
      "u\u0308ber d\u00e9j\u00e0", "mixed e\u0301\u0308 stack").toDF("s")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      val on = strs.select(graft.functions.Normalize.nfc($"s"))
        .as[String].collect().toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = strs.select(graft.functions.Normalize.nfc($"s"))
        .as[String].collect().toSeq
      assert(on == off)
      // the decomposed form composes to the precomposed codepoint...
      assert(on.head == composedE)
      // ...and the precomposed form is a fixed point
      assert(on(1) == composedE)
      // idempotent: normalizing twice changes nothing
      val twice = strs.select(graft.functions.Normalize.nfc(
        graft.functions.Normalize.nfc($"s"))).as[String].collect().toSeq
      assert(twice == on)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    // null propagates
    assert(Seq(Option.empty[String]).toDF("s")
      .select(graft.functions.Normalize.nfc($"s")).collect().head.isNullAt(0))
    // matches the JDK reference directly
    assert(graft.functions.NfcHelper.nfc(
      org.apache.spark.unsafe.types.UTF8String.fromString(decomposedE)).toString
      == java.text.Normalizer.normalize(decomposedE, java.text.Normalizer.Form.NFC))
  }

  test("accent_fold collapses case/diacritic variants to one key and agrees between codegen and interpreted paths") {
    val strs = Seq(
      "Caf\u00e9 LATTE",          // precomposed e-acute + uppercase
      "cafe\u0301 latte",         // decomposed combining acute
      "cafe latte",              // already folded
      "U\u0308BER \u00dcber uber", // decomposed U+umlaut, composed U-umlaut, plain
      "plain ascii stays", "").toDF("s")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      val on = strs.select(graft.functions.Normalize.accentFold($"s"))
        .as[String].collect().toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = strs.select(graft.functions.Normalize.accentFold($"s"))
        .as[String].collect().toSeq
      assert(on == off)
      // all three spellings of the same text fold to the SAME key
      assert(on(0) == "cafe latte" && on(1) == "cafe latte" && on(2) == "cafe latte")
      assert(on(3) == "uber uber uber")
      // lowercase-ASCII fast path is the identity
      assert(on(4) == "plain ascii stays" && on(5) == "")
      // idempotent: folding a folded key changes nothing
      val twice = strs.select(graft.functions.Normalize.accentFold(
        graft.functions.Normalize.accentFold($"s"))).as[String].collect().toSeq
      assert(twice == on)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    // null propagates
    assert(Seq(Option.empty[String]).toDF("s")
      .select(graft.functions.Normalize.accentFold($"s")).collect().head.isNullAt(0))
  }

  test("lsh_code degenerate inputs: short vectors project over available dims; null vec is null") {
    // shorter than dim: same as the SQL-oracle loop over len(vec) — the
    // projection uses plane components 0..len-1
    val short = Seq(Seq(1.0f, -2.0f)).toDF("v")
      .select(Similarity.lshCode($"v", 8, 64).as("c")).as[Long].head()
    assert(short == graft.functions.LshCode.codeOf(Seq(1.0f, -2.0f), 8, 2))
    val nul = Seq(Option.empty[Seq[Float]]).toDF("v")
      .select(Similarity.lshCode($"v", 8, 64)).collect().head
    assert(nul.isNullAt(0))
  }

  test("hammingBall enumerates exactly the codes within the radius") {
    val ball = graft.functions.LshCode.hammingBall(0xA5L, 8, 2)
    assert(ball.size == 1 + 8 + 28) // C(8,0)+C(8,1)+C(8,2)
    assert(ball.distinct.size == ball.size)
    assert(ball.forall(c => java.lang.Long.bitCount(c ^ 0xA5L) <= 2))
    assert(ball.contains(0xA5L))
  }

  test("annTopK over a persisted index prunes to the Hamming-ball partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_idx").toString
    val n = 200
    val emb = spark.range(n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => sin($"id" * 31 + d).cast("float")).as("embedding"))
    Similarity.writeIndex(emb, "embedding", dir, bits = 6, dim = 16)
    val idx = Similarity.readIndex(spark, dir)
    val probe = emb.filter($"vec_id" === 7).select("embedding")
      .collect()(0).getSeq[Float](0)
    val res = Similarity.annTopK(idx, "vec_id", "embedding", probe,
      k = 5, bits = 6, probeHamming = 1, dim = 16).collect()
    assert(res.length == 5)
    assert(res.head.getLong(0) == 7L) // the probe's own vector wins (cos=1)
    // the scan must carry partition filters (pruned read), not a full scan
    val planned = Similarity.annTopK(idx, "vec_id", "embedding", probe,
      k = 5, bits = 6, probeHamming = 1, dim = 16)
      .queryExecution.executedPlan.toString
    assert(planned.contains("PartitionFilters: [lsh_code"),
      s"expected partition pruning on lsh_code in:\n$planned")
  }

  test("ivfTopKIndexed over a persisted inverted file prunes to the probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    val n = 200
    val emb = spark.range(n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => sin($"id" * 31 + d).cast("float")).as("embedding"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 6)
    Similarity.writeIvfIndex(emb, "embedding", dir, cents)
    val idx = Similarity.readIvfIndex(spark, dir)
    val probe = emb.filter($"vec_id" === 7).select("embedding")
      .collect()(0).getSeq[Float](0)
    val indexed = Similarity.ivfTopKIndexed(idx, "vec_id", "embedding", cents,
      probe, k = 5, nProbe = 2)
    // identical results to the ad hoc (re-assigning) path
    val adhoc = Similarity.ivfTopK(emb, "vec_id", "embedding", cents,
      probe, k = 5, nProbe = 2)
    assert(indexed.select("vec_id").as[Long].collect().toSeq ==
      adhoc.select("vec_id").as[Long].collect().toSeq)
    assert(indexed.collect().head.getLong(0) == 7L) // self-retrieval wins
    // the scan must carry partition filters (pruned read), not a full scan
    val planned = indexed.queryExecution.executedPlan.toString
    assert(planned.contains("PartitionFilters: [ivf_cell"),
      s"expected partition pruning on ivf_cell in:\n$planned")
    // the centroid-value signature changes when geometry changes
    assert(Similarity.ivfSignature(cents) !=
      Similarity.ivfSignature(cents.map(_.map(_ + 1f))))
  }

  test("appendToIvfIndex: build-then-append equals one-shot full build; marker discipline") {
    val full = java.nio.file.Files.createTempDirectory("graft_ivf_full").toString
    val incr = java.nio.file.Files.createTempDirectory("graft_ivf_incr").toString
    val n = 120
    val emb = spark.range(n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => cos($"id" * 17 + d).cast("float")).as("embedding"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 5)
    Similarity.writeIvfIndex(emb, "embedding", full, cents)
    // composed build: base WITHOUT the completion marker, append restores it
    Similarity.writeIvfIndex(emb.filter($"vec_id" % 2 === 0), "embedding",
      incr, cents, markComplete = false)
    val marker = new org.apache.hadoop.fs.Path(incr, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(marker), "base step must not mark the index complete")
    Similarity.appendToIvfIndex(emb.filter($"vec_id" % 2 =!= 0), "embedding",
      incr, cents)
    assert(fs.exists(marker), "append must restore the completion marker")
    // identical content (same rows per cell), identical probe results
    def snap(p: String) = Similarity.readIvfIndex(spark, p)
      .select($"vec_id", $"ivf_cell").as[(Long, Long)].collect().toSet
    assert(snap(incr) == snap(full))
    val probe = emb.filter($"vec_id" === 11).select("embedding")
      .collect()(0).getSeq[Float](0)
    def top(p: String) = Similarity.ivfTopKIndexed(Similarity.readIvfIndex(spark, p),
      "vec_id", "embedding", cents, probe, k = 6, nProbe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(top(incr) == top(full))
  }

  test("applyChangesToIvfIndex: fold equals rebuild; emptied cells sweep; " +
      "re-added ids survive; marker discipline") {
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_cdc").toString
    val n = 120
    def vec(seed: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(15)),
      d => cos(seed * 17 + d).cast("float")).as("embedding")
    val emb = spark.range(n).select($"id".as("vec_id"), vec($"id"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 5)
    Similarity.writeIvfIndex(emb, "embedding", idx, cents)
    // one signed batch: delete every id in cell 0 AND ids %7==3, insert
    // new ids 1000-1019, and RE-ADD id 3 with a NEW vector (a -1 and a
    // +1 for the same id in one window — the re-added row must survive)
    val assigned = emb.withColumn("ivf_cell",
      Similarity.ivfAssign($"embedding", cents))
    val cell0 = assigned.filter($"ivf_cell" === 0)
      .select("vec_id").as[Long].collect().toSet
    assert(cell0.nonEmpty, "fixture must populate cell 0")
    val delIds = cell0 ++ (0L until n.toLong).filter(_ % 7 == 3)
    val dels = emb.filter($"vec_id".isin(delIds.toSeq: _*))
      .withColumn("m", lit(-1L))
    val ins = spark.range(1000, 1020)
      .select($"id".as("vec_id"), vec($"id"), lit(1L).as("m"))
      .unionByName(spark.range(3, 4)
        .select($"id".as("vec_id"), vec($"id" + 5000), lit(1L).as("m")))
    // a NET-ZERO id (inserted then deleted inside the window — the
    // per-version feed carries both rows): must never reach the index
    val netZero = spark.range(9000, 9001)
      .select($"id".as("vec_id"), vec($"id"), lit(1L).as("m"))
      .unionByName(spark.range(9000, 9001)
        .select($"id".as("vec_id"), vec($"id"), lit(-1L).as("m")))
    val (nIns, nDel) = Similarity.applyChangesToIvfIndex(
      dels.unionByName(ins).unionByName(netZero),
      "vec_id", "embedding", idx, cents)
    assert(nIns == 21L && nDel == delIds.size.toLong)
    assert(Similarity.readIvfIndex(spark, idx)
      .filter($"vec_id" === 9000L).isEmpty,
      "a net-zero change row must not be resurrected into the index")
    val marker = new org.apache.hadoop.fs.Path(idx, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(marker), "fold must restore the completion marker")
    // fold ≡ rebuild over the post-change corpus
    val live = emb.filter(!$"vec_id".isin(delIds.toSeq: _*))
      .unionByName(ins.drop("m"))
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft_ivf_cdc_rb").toString
    Similarity.writeIvfIndex(live, "embedding", rebuilt, cents)
    def snap(p: String) = Similarity.readIvfIndex(spark, p)
      .select($"vec_id", $"ivf_cell").as[(Long, Long)].collect().toSet
    assert(snap(idx) == snap(rebuilt))
    // the re-added id carries the NEW vector (cell of seed id+5000)
    val readded = Similarity.readIvfIndex(spark, idx)
      .filter($"vec_id" === 3L).collect()
    assert(readded.length == 1)
    // a cell whose rows ALL retracted reads back empty unless re-added
    // rows landed there (dir swap, not dynamic-overwrite retention)
    val stale = Similarity.readIvfIndex(spark, idx)
      .filter($"ivf_cell" === 0 && $"vec_id" < 1000L && $"vec_id" =!= 3L)
    assert(stale.isEmpty,
      "emptied cell 0 must not retain pre-delete rows")
  }

  test("recoverIvfIndex: a crashed fold replays from any position " +
      "(post-marker, mid-apply); pre-marker stages sweep without " +
      "faking completion") {
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_rec").toString
    def vec(seed: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(15)),
        d => cos(seed * 17 + d).cast("float")).as("embedding")
    val emb = spark.range(40).select($"id".as("vec_id"), vec($"id"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 4)
    Similarity.writeIvfIndex(emb, "embedding", idx, cents)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val assigned = emb.withColumn("ivf_cell",
      Similarity.ivfAssign($"embedding", cents)).cache()
    val byCell = assigned.groupBy("ivf_cell").count()
      .as[(Int, Long)].collect().sortBy(-_._2)
    val cA = byCell.head._1 // a populated cell to swap
    val cB = byCell.last._1 // a different cell to append into
    assert(cA != cB)
    val victim = assigned.filter($"ivf_cell" === cA)
      .select("vec_id").as[Long].collect().min
    def snap() = Similarity.readIvfIndex(spark, idx)
      .select($"vec_id", $"ivf_cell").as[(Long, Long)].collect().toSet
    val before = snap()

    def writeMarker(id: String, swapsJson: String, appendsJson: String): Unit = {
      val out = fs.create(
        new org.apache.hadoop.fs.Path(idx, s"_ivffold-$id.json"), true)
      out.write((s"""{"stage":".ivfstage-$id","swaps":[$swapsJson],""" +
        s""""appends":[$appendsJson]}""").getBytes("UTF-8"))
      out.close()
    }
    def stagedInsFile(id: String, cell: Int): String = {
      val d = new org.apache.hadoop.fs.Path(s"$idx/.ivfstage-$id/ins/ivf_cell=$cell")
      fs.listStatus(d).map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_")).min
    }

    // ---- crash position 1: marker written, NOTHING applied ----
    fs.delete(new org.apache.hadoop.fs.Path(idx, "_SUCCESS"), false)
    // staged swap: cA without its victim
    spark.read.parquet(s"$idx/cells/ivf_cell=$cA")
      .filter($"vec_id" =!= victim)
      .write.parquet(s"$idx/.ivfstage-t1/swap/ivf_cell=$cA")
    // staged append: one new vector destined for cB
    spark.range(500, 501).select($"id".as("vec_id"), vec($"id"))
      .coalesce(1) // one staged file — the marker references it by name
      .write.parquet(s"$idx/.ivfstage-t1/ins/ivf_cell=$cB")
    val f1 = stagedInsFile("t1", cB)
    writeMarker("t1", s"""{"cell":$cA,"staged":true}""",
      s"""{"src":".ivfstage-t1/ins/ivf_cell=$cB/$f1","dst":"cells/ivf_cell=$cB/fold-t1-0.parquet"}""")
    assert(Similarity.recoverIvfIndex(spark, idx) == 1)
    val want1 = before - ((victim, cA.toLong)) + ((500L, cB.toLong))
    assert(snap() == want1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(idx, "_SUCCESS")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx, ".ivfstage-t1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx, "_ivffold-t1.json")))

    // ---- crash position 2: swap already applied, append still staged ----
    fs.delete(new org.apache.hadoop.fs.Path(idx, "_SUCCESS"), false)
    val victim2 = assigned.filter($"ivf_cell" === cA && $"vec_id" =!= victim)
      .select("vec_id").as[Long].collect().min
    spark.read.parquet(s"$idx/cells/ivf_cell=$cA")
      .filter($"vec_id" =!= victim2)
      .write.parquet(s"$idx/.ivfstage-t2/swap/ivf_cell=$cA")
    spark.range(501, 502).select($"id".as("vec_id"), vec($"id"))
      .coalesce(1)
      .write.parquet(s"$idx/.ivfstage-t2/ins/ivf_cell=$cB")
    val f2 = stagedInsFile("t2", cB)
    writeMarker("t2", s"""{"cell":$cA,"staged":true}""",
      s"""{"src":".ivfstage-t2/ins/ivf_cell=$cB/$f2","dst":"cells/ivf_cell=$cB/fold-t2-0.parquet"}""")
    // apply the SWAP by hand (the crash lands between the two flips)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/cells/ivf_cell=$cA"), true)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$idx/.ivfstage-t2/swap/ivf_cell=$cA"),
      new org.apache.hadoop.fs.Path(s"$idx/cells/ivf_cell=$cA")))
    assert(Similarity.recoverIvfIndex(spark, idx) == 1)
    val want2 = want1 - ((victim2, cA.toLong)) + ((501L, cB.toLong))
    assert(snap() == want2)
    assert(fs.exists(new org.apache.hadoop.fs.Path(idx, "_SUCCESS")))

    // ---- pre-marker crash: orphan stage sweeps, index stays UNMARKED
    // (the caller re-folds; recovery must not fake completion) ----
    fs.delete(new org.apache.hadoop.fs.Path(idx, "_SUCCESS"), false)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/.ivfstage-orphan/swap"))
    assert(Similarity.recoverIvfIndex(spark, idx) == 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx, ".ivfstage-orphan")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx, "_SUCCESS")),
      "recovery must not mark an index whose fold never committed")
    assert(snap() == want2) // cells untouched either way
    assigned.unpersist()
  }

  test("applyChangesToIvfIndex windowToken: a committed window retried " +
      "is exactly-once — both after a clean commit and after a " +
      "crash-after-marker replay") {
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_tok").toString
    def vec(seed: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(15)),
        d => cos(seed * 17 + d).cast("float")).as("embedding")
    val emb = spark.range(40).select($"id".as("vec_id"), vec($"id"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 4)
    Similarity.writeIvfIndex(emb, "embedding", idx, cents)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def snap() = Similarity.readIvfIndex(spark, idx)
      .select($"vec_id", $"ivf_cell").as[(Long, Long)].collect()
    val batch = emb.filter($"vec_id" === 5L).withColumn("m", lit(-1L))
      .unionByName(spark.range(600, 601)
        .select($"id".as("vec_id"), vec($"id"), lit(1L).as("m")))
    val (i1, d1) = Similarity.applyChangesToIvfIndex(batch,
      "vec_id", "embedding", idx, cents, windowToken = Some("v1-2"))
    assert(i1 == 1L && d1 == 1L)
    val committed = snap().toSet
    assert(committed.count(_._1 == 600L) == 1)
    // clean retry of the committed window: no-op, index bit-identical
    assert(Similarity.applyChangesToIvfIndex(batch,
      "vec_id", "embedding", idx, cents,
      windowToken = Some("v1-2")) == ((0L, 0L)))
    assert(snap().toSet == committed && snap().length == committed.size,
      "a retried committed window must not duplicate inserts")
    // crash-after-marker: hand-stage window v2-3's append + marker
    // (the fold died between the marker and the sweep), then the
    // retrying caller's fold must REPLAY it and skip its own window
    val cell = Similarity.readIvfIndex(spark, idx)
      .select("ivf_cell").as[Int].collect().min
    fs.delete(new org.apache.hadoop.fs.Path(idx, "_SUCCESS"), false)
    spark.range(601, 602).select($"id".as("vec_id"), vec($"id"))
      .coalesce(1)
      .write.parquet(s"$idx/.ivfstage-tk/ins/ivf_cell=$cell")
    val staged = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$idx/.ivfstage-tk/ins/ivf_cell=$cell"))
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_")).min
    val mout = fs.create(
      new org.apache.hadoop.fs.Path(idx, "_ivffold-tk.json"), true)
    mout.write((s"""{"stage":".ivfstage-tk","token":"v2-3","swaps":[],""" +
      s""""appends":[{"src":".ivfstage-tk/ins/ivf_cell=$cell/$staged",""" +
      s""""dst":"cells/ivf_cell=$cell/fold-tk-0.parquet"}]}""")
      .getBytes("UTF-8"))
    mout.close()
    val retryBatch = spark.range(601, 602)
      .select($"id".as("vec_id"), vec($"id"), lit(1L).as("m"))
    assert(Similarity.applyChangesToIvfIndex(retryBatch,
      "vec_id", "embedding", idx, cents,
      windowToken = Some("v2-3")) == ((0L, 0L)),
      "a retry after a crash-after-marker replay must skip its window")
    val after = snap()
    assert(after.count(_._1 == 601L) == 1,
      "the replayed window's insert must land exactly once")
    assert(fs.exists(new org.apache.hadoop.fs.Path(idx, "_SUCCESS")))
    // a NEW window folds normally on top of the healed watermark
    val (i3, d3) = Similarity.applyChangesToIvfIndex(
      spark.range(602, 603)
        .select($"id".as("vec_id"), vec($"id"), lit(1L).as("m")),
      "vec_id", "embedding", idx, cents, windowToken = Some("v3-4"))
    assert(i3 == 1L && d3 == 0L)
    assert(snap().count(_._1 == 602L) == 1)
    // a token OLDER than the watermark (a rewound checkpoint replaying
    // v1-2 after the maintainer advanced to v3-4) must refuse LOUDLY —
    // re-folding it would double-append that window's inserts
    val before = snap().toSet
    val stale = intercept[IllegalStateException] {
      Similarity.applyChangesToIvfIndex(batch,
        "vec_id", "embedding", idx, cents, windowToken = Some("v1-2"))
    }
    assert(stale.getMessage.contains("older window") ||
      stale.getMessage.contains("already"), stale.getMessage)
    assert(snap().toSet == before, "a refused stale window must not fold")
  }

  test("top_k_pairs: equals the window form, merges across partitions, O(k)") {
    import graft.functions.TopKPairs
    val df = spark.range(1000).select(
      (col("id") % 7).as("g"),
      ((col("id") * 37 % 1000).cast("double")).as("score"),
      col("id"))
      // wide repartition: partial heaps MUST merge associatively
      .repartition(16)
    val got = df.groupBy("g")
      .agg(TopKPairs.topK(col("score"), col("id"), k = 3).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("pos"), col("col.score"), col("col.id"))
      .orderBy("g", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w) - 1)
      .filter(col("rn") < 3)
      .select(col("g"), col("rn"), col("score"), col("id"))
      .orderBy("g", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
    // NULL scores skipped; k larger than the group returns the whole group
    import spark.implicits._
    val nulls = Seq((1L, Some(5.0), 1L), (1L, None, 2L), (1L, Some(7.0), 3L))
      .toDF("g", "score", "id")
    val small = nulls.groupBy("g")
      .agg(TopKPairs.topK(col("score"), col("id"), k = 10).as("t"))
      .select(explode(col("t"))).collect()
    assert(small.length == 2)
  }

  test("top_k_distinct: equals the sorted-distinct-slice form, merges " +
      "across partitions, dedups heavy repetition, skips NULLs") {
    import graft.functions.TopKDistinct
    // values repeat ~8x per group (id % 125): the bounded set must
    // DEDUP, not evict a larger value to admit a duplicate
    val df = spark.range(1000).select(
      (col("id") % 7).as("g"),
      ((col("id") % 125).cast("double")).as("v"))
      .repartition(16)
    val got = df.groupBy("g")
      .agg(TopKDistinct.topKDistinct(col("v"), k = 4).as("t"))
      .select(col("g"), posexplode(col("t")))
      .orderBy("g", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val want = df.distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("v").desc)) - 1)
      .filter(col("rn") < 4)
      .select(col("g"), col("rn"), col("v"))
      .orderBy("g", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    // NULLs skipped; k beyond the distinct count returns the whole set;
    // SQL-registered form coerces integer input
    import spark.implicits._
    val nulls = Seq((1L, Some(5)), (1L, None), (1L, Some(7)), (1L, Some(7)))
      .toDF("g", "v")
    nulls.createOrReplaceTempView("tkd_in")
    val small = spark.sql(
      "SELECT top_k_distinct(v, 10) AS t FROM tkd_in GROUP BY g")
      .select(explode(col("t"))).collect().map(_.getDouble(0)).toSeq
    assert(small == Seq(7.0, 5.0))
  }

  test("histQuantile: bin-midpoint estimates off a maintained histogram " +
      "array — rank math, under/overflow clamps, empty -> NULL") {
    import graft.functions.HistQuantile.histQuantile
    import spark.implicits._
    // hs over [0, 40) x 4 bins: [uf, b1, b2, b3, b4, of]
    val df = Seq(
      ("mid", Seq(0L, 2L, 0L, 3L, 0L, 0L)),
      ("under", Seq(4L, 0L, 0L, 0L, 0L, 1L)),
      ("empty", Seq(0L, 0L, 0L, 0L, 0L, 0L))).toDF("tag", "hs")
    val got = df.select($"tag",
        histQuantile($"hs", 0.0, 40.0, 0.5).as("p50"),
        histQuantile($"hs", 0.0, 40.0, 0.2).as("p20"),
        histQuantile($"hs", 0.0, 40.0, 1.0).as("p100"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    // 2 values in [0,10), 3 in [20,30): median and max sit in bin 3
    assert(got("mid") == (Some(25.0), Some(5.0), Some(25.0)))
    // rank lands in the underflow bin -> lo; p=1.0 reaches overflow -> hi
    assert(got("under") == (Some(0.0), Some(0.0), Some(40.0)))
    assert(got("empty") == (None, None, None))
    // against an exact percentile on a folded fixture: the estimate
    // must sit within half a bin width (2.5 over [0,100) x 20 bins)
    val vals = spark.range(0, 1000)
      .select((col("id") % 100).cast("double").as("v"))
    val hs = vals.select(array((0 until 22).map { b =>
      val bin = when(col("v") < 0, 0).when(col("v") >= 100, 21)
        .otherwise(floor(col("v") / 5.0).cast("int") + 1)
      sum(when(bin === b, 1L).otherwise(0L))
    }: _*).as("hs"))
    val est = hs.select(histQuantile(col("hs"), 0.0, 100.0, 0.5))
      .head().getDouble(0)
    val exact = vals.stat.approxQuantile("v", Array(0.5), 0.0).head
    assert(math.abs(est - exact) <= 2.5, s"est $est vs exact $exact")
  }

  test("bitmap_distinct: equals countDistinct across partitions, handles negatives and NULLs") {
    import graft.functions.BitmapDistinct
    // dense ids, sparse far-apart ids, negatives, duplicates — across a
    // wide repartition so partial bitmaps MUST merge associatively
    val df = spark.range(2000).select(
      (col("id") % 5).as("g"),
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .when(col("id") % 3 === 0, -col("id") * 1000003L)
        .otherwise(col("id") % 97).as("v"))
      .repartition(16)
    val got = df.groupBy("g")
      .agg(BitmapDistinct.bitmapDistinct(col("v")).as("n"))
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = df.groupBy("g")
      .agg(countDistinct(col("v")).as("n"))
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
    // all-NULL group counts 0 (countDistinct agrees)
    import spark.implicits._
    val nulls = Seq((1L, Option.empty[Long]), (1L, Option.empty[Long]))
      .toDF("g", "v")
    val z = nulls.groupBy("g")
      .agg(BitmapDistinct.bitmapDistinct(col("v")).as("n")).collect()
    assert(z.head.getLong(1) == 0L)
  }

  test("GraftExtensions registers cosine_sim as a SQL function") {
    // a genuinely new session (getOrCreate would reuse the shared one and
    // skip extension installation); the SparkContext is shared
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_sim(array(cast(1 as float), cast(0 as float)), " +
          "array(cast(1 as float), cast(0 as float))) AS c").collect()
      assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-12)
      val lsh = s2.sql(
        "SELECT lsh_code(array(cast(1 as float), cast(0 as float)), 4, 2) AS c").collect()
      assert(lsh.head.getLong(0) ==
        graft.functions.LshCode.codeOf(Seq(1f, 0f), 4, 2))
      val m = s2.sql("SELECT md5_prefix60('abc') AS h").collect()
      assert(m.head.getLong(0) == graft.functions.Md5Hash.prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
      // no hand-written casts: ImplicitCastInputTypes coerces the DECIMAL
      // literal score and the INT id at analysis time
      val tk = s2.sql("SELECT top_k_pairs(v, id, 2) AS t " +
        "FROM VALUES (1.0, 10), (3.0, 30), (2.0, 20) AS d(v, id)").collect()
      assert(tk.head.getSeq[org.apache.spark.sql.Row](0).map(r =>
        (r.getDouble(0), r.getLong(1))) == Seq((3.0, 30L), (2.0, 20L)))
      // INT ids coerce to LONG at analysis time; duplicates collapse
      val bd = s2.sql("SELECT bitmap_distinct(v) AS n " +
        "FROM VALUES (7), (7), (9), (NULL), (-3) AS d(v)").collect()
      assert(bd.head.getLong(0) == 3L)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
