package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter pre-filtered joins — the manual form of Spark's own
  * injected runtime row-level filtering, for when the build side is known
  * to be selective but the optimizer can't see it (a filtered dimension,
  * an incremental batch, a sampled id list).
  *
  * At 100 TB the win is that the probe (fact) side is filtered BEFORE its
  * shuffle: rows whose keys cannot be on the build side never leave the
  * scan stage, so the exchange moves `hit-rate × |probe|` rows instead of
  * `|probe|`. The sketch itself is fixed-size (`numBits/8` bytes,
  * independent of build rows — the one driver-side collect here is the
  * sketch, never data), rides to executors as a literal, and the membership
  * probe is one codegen'd xxhash64 + bit-test per row. False positives
  * are removed by the exact equi-join that follows, so results are
  * IDENTICAL to the plain join at any fpp.
  */
object BloomJoin {

  /** Serialized bloom sketch over the build side's key column. One
    * partial-aggregated pass (each partition builds a local sketch, the
    * driver merges fixed-size bitmaps). Keys are xxhash64'd to longs —
    * works for any orderable key type; NULL keys hash to the seed and so
    * occupy at most one slot. */
  def buildFilter(build: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems $expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp $fpp must be in (0, 1)")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate SILENTLY clamps both parameters to these confs
    // (Spark's runtime-filter safety caps). A clamped sketch saturates —
    // fp rate -> 1 and the "pre-filter" passes everything while still
    // paying build+probe cost — so fail loudly and point at the knobs.
    val conf = build.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"expectedItems=$expectedItems (numBits=$numBits) exceeds the session's " +
        s"bloom caps (maxNumItems=$maxItems, maxNumBits=$maxBits); " +
        "BloomFilterAggregate would silently clamp and saturate the sketch — " +
        "raise spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits " +
        "for builds this large")
    val hashed = XxHash64(Seq(graftbridge.expression(build.col(keyCol))), 42L)
    val agg = graftbridge.column(
      new BloomFilterAggregate(hashed, Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
    build.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Membership probe column: `might_contain(sketch, xxhash64(key))` —
    * true for every key the sketch saw, true-with-probability-fpp for
    * keys it didn't (never a false negative). */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    graftbridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      XxHash64(Seq(graftbridge.expression(key)), 42L)))

  /** Novelty gate — the incremental-ingest fast path: rows whose key the
    * corpus sketch has NEVER seen are definitely new (a bloom filter has
    * no false negatives) and skip the exact check entirely; only the
    * might-contain minority anti-joins the corpus to clear false
    * positives. The result is EXACTLY `batch.join(corpus, key,
    * "left_anti")` — at a fraction of the shuffle, since the anti-join
    * moves `hit-rate × |batch|` rows, not the batch. NULL-key rows are
    * novel under anti-join semantics and survive through either branch
    * (the sketch routes them to the exact check only when the corpus
    * hashed a NULL itself, and the anti-join then keeps them). */
  def novelRows(batch: DataFrame, corpus: DataFrame, key: String,
      sketch: Array[Byte]): DataFrame = {
    val mc = mightContain(sketch, batch.col(key))
    batch.filter(!mc).unionByName(
      batch.filter(mc).join(corpus.select(col(key)), Seq(key), "left_anti")
        .select(batch.columns.map(col): _*))
  }

  /** Exact join with a bloom pre-filter on the probe side. Only join
    * types where dropping provably-unmatched probe rows is semantics-
    * preserving are allowed (`inner`, `left_semi`); the trailing exact
    * join clears the sketch's false positives, so the result equals the
    * plain `probe.join(build, key, joinType)` bit-for-bit. */
  def bloomJoin(probe: DataFrame, build: DataFrame, key: String,
      joinType: String = "inner", expectedItems: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "").replace("-", "")
    require(jt == "inner" || jt == "leftsemi" || jt == "semi",
      s"bloomJoin preserves semantics only for inner/left_semi joins, got $joinType")
    val sketch = buildFilter(build, key, expectedItems, fpp)
    probe.filter(mightContain(sketch, probe.col(key)))
      .join(build, Seq(key), joinType)
  }
}
