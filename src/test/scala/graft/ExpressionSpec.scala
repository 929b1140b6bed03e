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
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
