package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // a pathologically hot key: 90% of rows share key "hot"
  private val fact = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("key", "value")

  test("salted sum equals the direct groupBy sum") {
    val direct = fact.groupBy("key").agg(sum("value").as("sum_value"))
    val salted = Skew.saltedSum(fact, "key", "value", salts = 8)
    assertSameRows(direct, salted)
  }

  test("salted join equals the plain join, spreads the hot key") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val direct = fact.join(dim, Seq("key")).orderBy("key", "value")
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8).orderBy("key", "value")
    assertSameRows(direct, salted)
    // the salted fact really spreads the hot key across salt values
    val spread = fact.withColumn("_salt", Skew.saltOf(8, col("value")))
      .filter($"key" === "hot").select("_salt").distinct().count()
    assert(spread > 4)
  }

  test("salting is deterministic across reruns and repartitioning") {
    val a = fact.withColumn("_salt", Skew.saltOf(8, col("value"))).collect().toSeq
    val b = fact.repartition(7).withColumn("_salt", Skew.saltOf(8, col("value")))
      .collect().toSeq
    assert(a.map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSet ==
      b.map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSet)
  }

  test("join cardinality forecast equals the join it predicts, without running it") {
    val left = fact.select(col("key"))
    val right = (Seq.fill(40)("hot") ++ (1 to 20).map(i => s"k${i % 5}")
      ++ Seq("only-right")).toDF("key")
    val forecastTotal = Skew.joinCardinalityTotal(left, right, "key")
      .head().getLong(0)
    assert(forecastTotal == left.join(right, "key").count())
    // per-key rows: hot contributes 900*40; keys absent from a side
    // contribute nothing
    val top = Skew.joinCardinality(left, right, "key", topK = 3).collect()
    assert(top.head.getString(0) == "hot" && top.head.getLong(3) == 36000L)
    assert(!top.map(_.getString(0)).contains("only-right"))
    // disjoint key sets forecast exactly zero
    val none = Seq("zzz").toDF("key")
    assert(Skew.joinCardinalityTotal(left, none, "key").head().getLong(0) == 0L)
  }
}
