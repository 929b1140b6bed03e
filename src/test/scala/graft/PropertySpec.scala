package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Strategies

/** Property-based strategy laws (SURVEY.md §5.3): idempotence of rerun
  * under checksum strategies, FULL_REFRESH ≡ source,
  * UPSERT_CHECKSUM_WITH_DELETE converges to source, exactly one
  * latest=true per pk in versioned chains, checksum equality ⇔
  * normalized-record equality. ScalaCheck generators driven with fixed
  * seeds (deterministic across runs; no scalatest bridge dependency). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic samples from a generator (seed base separates the
    * argument positions so paired samples aren't correlated). */
  private def samples[T](g: Gen[T], n: Int, seedBase: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default.withSize(12), Seed(seedBase + i)))

  private def forAll[A](ga: Gen[A], n: Int = 5)(f: A => Unit): Unit =
    samples(ga, n, 0L).foreach(f)

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 5)(f: (A, B) => Unit): Unit =
    samples(ga, n, 0L).zip(samples(gb, n, 1000L)).foreach { case (a, b) => f(a, b) }

  private def forAll3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], n: Int = 5)(
      f: (A, B, C) => Unit): Unit =
    samples(ga, n, 0L).lazyZip(samples(gb, n, 1000L)).lazyZip(samples(gc, n, 2000L))
      .foreach { case (a, b, c) => f(a, b, c) }

  private val rowGen: Gen[(String, String, Double)] = for {
    id <- Gen.oneOf((1 to 8).map("k" + _))
    name <- Gen.oneOf("ann", "bob", "cho", "dee")
    score <- Gen.chooseNum(0, 99).map(_.toDouble)
  } yield (id, name, score)

  // one row per pk (strategies receive deduped sources)
  private val tableGen: Gen[Seq[(String, String, Double)]] =
    Gen.listOf(rowGen).map(_.groupBy(_._1).map(_._2.head).toSeq)

  private def df(rows: Seq[(String, String, Double)]): DataFrame =
    if (rows.isEmpty) Seq.empty[(String, String, Double)].toDF("id", "name", "score")
    else rows.toDF("id", "name", "score")

  private def cfg(ut: UpdateType, v: Long) = PipelineConfig(
    SourceConfig("/s", "t"), StoreConfig("/na", "c"), ut, "id", v)

  private def data(state: DataFrame): Set[(String, String, Double)] =
    state.select("id", "name", "score").as[(String, String, Double)].collect().toSet

  test("FULL_REFRESH(state) ≡ source, for any prior state") {
    forAll2(tableGen, tableGen) { (src, prior) =>
      val c = cfg(UpdateType.FullRefresh, 2)
      val st = Strategies.fullRefresh(df(src), df(prior), c)
      assert(data(st) == src.toSet)
    }
  }

  test("UPSERT_CHECKSUM_WITH_DELETE converges to source from any state") {
    forAll2(tableGen, tableGen) { (src, prior) =>
      val c = cfg(UpdateType.UpsertChecksumWithDelete, 1)
      val st0 = Strategies.fullRefresh(df(prior), spark.emptyDataFrame, c)
      val st = Strategies.upsertChecksumWithDelete(df(src), st0, c.copy(versionId = 2))
      assert(data(st) == src.toSet)
    }
  }

  test("checksum strategies are idempotent: rerunning the same source changes nothing") {
    forAll(tableGen) { src =>
      for (ut <- Seq(UpdateType.UpsertChecksum, UpdateType.UpsertChecksumWithDelete,
          UpdateType.VersionedChecksum, UpdateType.VersionedSet)) {
        val c = cfg(ut, 1)
        val s = Strategies.get(ut)
        val st1 = s(df(src), Strategies.alignState(spark.emptyDataFrame, df(src)), c)
        val st2 = s(df(src), st1, c.copy(versionId = 2))
        // no second-run stamps of any kind
        assert(st2.filter(col("version_id") === 2 || col("version") === 2).isEmpty,
          s"strategy $ut stamped on a no-change rerun")
        assert(st2.count() == st1.count(), s"strategy $ut changed row count on rerun")
      }
    }
  }

  test("versioned chains keep exactly one latest=true per pk") {
    forAll3(tableGen, tableGen, tableGen) { (s1, s2, s3) =>
      val c = cfg(UpdateType.VersionedChecksum, 1)
      val strat = Strategies.versionedChecksum
      var st = strat(df(s1), spark.emptyDataFrame, c)
      st = strat(df(s2), st, c.copy(versionId = 2))
      st = strat(df(s3), st, c.copy(versionId = 3))
      val offending = st.filter(coalesce(col("latest"), lit(false)))
        .groupBy("id").count().filter(col("count") =!= 1)
      assert(offending.isEmpty)
      // every pk ever seen still has exactly one latest row
      val pks = (s1 ++ s2 ++ s3).map(_._1).toSet
      assert(st.filter(coalesce(col("latest"), lit(false))).count() == pks.size)
    }
  }

  test("null-valued changes are detected; null vs absent cannot collide") {
    // (a, null, "x") vs (a, "x", null): same value multiset, different
    // columns — canonical key-sorted JSON keeps them distinct
    val rows = Seq(
      ("a", Option.empty[String], Some("x")),
      ("a", Some("x"), Option.empty[String])).toDF("id", "name", "tag")
    val cks = rows.select(
      graft.functions.Checksums.rowChecksum(Seq("id", "name", "tag")).as("ck"))
      .as[String].collect()
    assert(cks(0) != cks(1))
    // an upsert sees null -> value as a change
    val c = cfg(UpdateType.UpsertChecksum, 1)
    val st0 = Strategies.fullRefresh(
      Seq(("a", Option.empty[String])).toDF("id", "name"), spark.emptyDataFrame, c)
    val st1 = Strategies.upsertChecksum(
      Seq(("a", Some("now-set"))).toDF("id", "name"), st0, c.copy(versionId = 2))
    assert(st1.filter(col("version_id") === 2).count() == 1)
  }

  test("text op laws: token counts, jaccard bounds and symmetry, whitespace-robust sketches") {
    val textGen = Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "del ta", "", " "))
      .map(_.mkString(" "))
    import graft.operators.{DedupApprox, TextAnalysis}
    forAll2(textGen, textGen, n = 8) { (ta, tb) =>
      val df = Seq((ta, tb)).toDF("a", "b")
      val (j1, j2, jaa) = df.select(
        DedupApprox.jaccard($"a", $"b", 2),
        DedupApprox.jaccard($"b", $"a", 2),
        DedupApprox.jaccard($"a", $"a", 2)).as[(Double, Double, Double)].head()
      assert(j1 == j2 && j1 >= 0.0 && j1 <= 1.0)
      assert(jaa == 1.0) // identical texts: even the empty shingle-set case
      // token count equals the reference split-based count
      val n = df.select(TextAnalysis.tokenCount($"a")).as[Long].head()
      val expected = ta.trim.split("\\s+").count(_.nonEmpty)
      assert(n == expected, s"tokenCount('$ta') = $n, want $expected")
      // sketches ignore whitespace formatting
      val sp = Seq((ta, "  " + ta.replace(" ", "   ") + " ")).toDF("x", "y")
      val same = sp.select(
        (DedupApprox.simhash($"x") === DedupApprox.simhash($"y")).as("s")).as[Boolean].head()
      assert(same)
    }
  }

  test("pairwiseJaccardEstimate ≡ exact mean pairwise Jaccard on 0/1-Jaccard corpora") {
    import graft.operators.DedupApprox
    // duplicate-group corpora make the minhash estimator EXACT, not just
    // unbiased: identical docs collide on every lane (J=1), token-disjoint
    // docs on none (J=0, no shared shingles to hash). With groups of sizes
    // (3, 2, 1): ordered same-group pairs = 3·2 + 2·1 = 8, so collisions
    // must be exactly L·8 and the estimate exactly 8 / (n(n−1)) — pinning
    // the counting semantics so the BIGINT final cast can't drift them.
    val corpus = Seq(
      (1L, "alpha bravo charlie delta"), (2L, "alpha bravo charlie delta"),
      (3L, "alpha bravo charlie delta"),
      (4L, "echo foxtrot golf hotel"), (5L, "echo foxtrot golf hotel"),
      (6L, "india juliett kilo lima")).toDF("doc_id", "text")
    val r = DedupApprox.pairwiseJaccardEstimate(corpus, "doc_id", "text",
      k = 3, numHashes = 16)
    // final projection exposes BIGINT, not DECIMAL(38,0) — a decimal cell
    // hashes differently across result encoders (the q97 gate lesson)
    assert(r.schema("collisions").dataType ==
      org.apache.spark.sql.types.LongType)
    val (nDocs, nLanes, collisions, est) =
      r.as[(Long, Int, Long, Double)].head()
    assert(nDocs == 6L && nLanes == 16)
    assert(collisions == 16L * 8L, s"collisions $collisions != 128")
    val exactMean = 8.0 / (6.0 * 5.0) // ordered pairs; same as 4/15 unordered
    assert(est == exactMean, s"estimate $est != exact mean $exactMean")
    // cross-check the exact mean against the pairwise jaccard operator
    val pairs = corpus.as[(Long, String)].collect()
    val exact = (for {
      (ia, ta) <- pairs; (ib, tb) <- pairs if ia < ib
    } yield Seq((ta, tb)).toDF("a", "b")
      .select(DedupApprox.jaccard($"a", $"b", 3)).as[Double].head()).sum /
      (pairs.length * (pairs.length - 1) / 2)
    assert(math.abs(exact - est) < 1e-12)
  }

  test("native hash laws: md5_prefix60 ≡ composable form; lsh_code ≡ driver codeOf") {
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\t', '|', ':', 'é', '世')))
      .map(_.mkString)
    forAll(strGen, n = 20) { s =>
      val both = Seq(s).toDF("s").select(
        graft.functions.Checksums.md5PrefixLong($"s").as("n"),
        conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("r"))
        .as[(Long, Long)].head()
      assert(both._1 == both._2, s"mismatch for ${s.take(40)}")
    }
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1000, 1000).map(_ / 100.0f))
    forAll(vecGen, n = 15) { v =>
      val expr = Seq(v).toDF("v")
        .select(graft.operators.Similarity.lshCode($"v", 8, 16).as("c"))
        .as[Long].head()
      assert(expr == graft.functions.LshCode.codeOf(v, 8, 16))
    }
  }

  test("row checksum equality ⇔ record equality over data columns") {
    forAll2(rowGen, rowGen, n = 12) { (a, b) =>
      val ck = graft.functions.Checksums.portableRowChecksum(Seq("id", "name", "score"))
      val hashes = Seq(a, b).toDF("id", "name", "score").select(ck).as[String].collect()
      assert((hashes(0) == hashes(1)) == (a == b))
    }
  }

  test("canonicalizeUrl is idempotent: canon(canon(u)) == canon(u)") {
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTPS", "ftp")
      host <- Gen.oneOf("A.Example.COM", "b.org", "X-Y.net")
      path <- Gen.oneOf("", "/P/q", "/deep/Path/", "/p")
      track <- Gen.oneOf("", "?utm_source=Z", "?a=1&utm_x=2", "?utm_a=1&b=2&utm_c=3")
      frag <- Gen.oneOf("", "#frag", "#A/b?c")
    } yield s"$scheme://$host$path$track$frag"
    forAll(urlGen, n = 24) { u =>
      val once = Seq(u).toDF("u")
        .select(graft.operators.TextAnalysis.canonicalizeUrl(col("u")))
        .as[String].head()
      val twice = Seq(once).toDF("u")
        .select(graft.operators.TextAnalysis.canonicalizeUrl(col("u")))
        .as[String].head()
      assert(twice == once, s"not idempotent: $u -> $once -> $twice")
      assert(!once.contains("utm_") && !once.contains("#"), s"$u -> $once")
    }
  }

  test("rollingPerKey matches a brute-force frame recompute on random events") {
    val evGen = Gen.listOfN(12, for {
      key <- Gen.oneOf(1L, 2L)
      sec <- Gen.chooseNum(0, 40)
      v <- Gen.chooseNum(1, 9)
    } yield (key, sec.toLong, v.toDouble))
    forAll(evGen, n = 6) { evs =>
      val df = evs.zipWithIndex.map { case ((k, s, v), i) =>
        (i.toLong, new java.sql.Timestamp(s * 1000L), v, k)
      }.toDF("event_id", "ts", "value", "user_id")
      val got = graft.operators.Stats.rollingPerKey(df, "user_id", "ts",
        "value", windowSec = 10)
        .select("event_id", "user_id", "n_win", "sum_win")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1)
      // brute force: every same-key event within (sec-9, sec], peers incl.
      got.foreach { case (eid, n, sum) =>
        val (k, sec, _) = evs(eid.toInt)
        val in = evs.filter { case (k2, s2, _) => k2 == k && s2 > sec - 10 && s2 <= sec }
        assert(n == in.size.toLong && sum == in.map(_._3).sum,
          s"event $eid: got ($n, $sum), want (${in.size}, ${in.map(_._3).sum})")
      }
    }
  }

  test("containment is directional and bounded in [0, 1]") {
    val wordsGen = Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
      .map(_.take(10).mkString(" "))
    forAll2(wordsGen, wordsGen, n = 8) { (ta, tb) =>
      val docs = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
      val rows = graft.operators.DedupApprox.containmentPairs(
        docs, "doc_id", "text", k = 2, threshold = 0.0, maxShingleDf = 100)
        .collect()
      rows.foreach { r =>
        val c = r.getDouble(4)
        assert(c >= 0.0 && c <= 1.0, s"containment $c outside [0,1] for ($ta, $tb)")
        assert(r.getLong(2) <= r.getLong(3),
          s"shared ${r.getLong(2)} exceeds |Sa| ${r.getLong(3)}")
      }
    }
  }
}
