package graft

import org.apache.spark.sql.functions._
import graft.functions.Checksums
import graft.operators.Dedup

class ChecksumsDedupSpec extends SparkSpec {
  import spark.implicits._

  test("row checksum is field-order invariant and change-sensitive") {
    val df = Seq(("a", 1.0, "x")).toDF("id", "score", "tag")
    val ck1 = df.select(Checksums.rowChecksum(Seq("id", "score", "tag")).as("ck"))
    val ck2 = df.select(Checksums.rowChecksum(Seq("tag", "id", "score")).as("ck"))
    assertSameRows(ck1, ck2)
    val changed = Seq(("a", 2.0, "x")).toDF("id", "score", "tag")
      .select(Checksums.rowChecksum(Seq("id", "score", "tag")).as("ck"))
    assert(rowsOf(ck1) != rowsOf(changed))
  }

  test("row checksum ignores system columns") {
    val a = Seq(("a", 1.0)).toDF("id", "score")
      .withColumn("write_timestamp", current_timestamp())
      .withColumn("doc_id", lit("zzz"))
    val ck = Checksums.rowChecksum(a.columns.toSeq)
    val plain = Seq(("a", 1.0)).toDF("id", "score")
    assertSameRows(a.select(ck.as("ck")),
      plain.select(Checksums.rowChecksum(Seq("id", "score")).as("ck")))
  }

  test("portable checksum: delimiter collisions impossible, null != empty") {
    val collide = Seq(("a|b", "x"), ("a", "b|x")).toDF("f1", "f2")
      .select(Checksums.portableRowChecksum(Seq("f1", "f2")).as("ck"))
      .as[String].collect()
    assert(collide.toSet.size == 2)
    val nullVsEmpty = Seq((Option.empty[String], "x"), (Some(""), "x")).toDF("f1", "f2")
      .select(Checksums.portableRowChecksum(Seq("f1", "f2")).as("ck"))
      .as[String].collect()
    assert(nullVsEmpty.toSet.size == 2)
  }

  test("portable value encoding is length-prefixed") {
    val out = Seq(("ab", Option.empty[String])).toDF("a", "b")
      .select(Checksums.portableValue($"a").as("va"), Checksums.portableValue($"b").as("vb"))
      .as[(String, String)].head()
    assert(out == (("v2:ab", "n")))
  }

  test("table checksum detects any row change, is row-order invariant") {
    val t1 = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val t2 = Seq((2, "y"), (1, "x")).toDF("id", "v") // same rows, other order
    val t3 = Seq((1, "x"), (2, "z")).toDF("id", "v")
    def ck(df: org.apache.spark.sql.DataFrame) =
      Checksums.portableTableChecksum(df, "id", df.columns.toSeq).as[String].head()
    assert(ck(t1) == ck(t2))
    assert(ck(t1) != ck(t3))
  }

  test("order-insensitive digest: partition-order independent, change-sensitive") {
    val base = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v")
    val d1 = rowsOf(Checksums.orderInsensitiveChecksum(base, Seq("id", "v")))
    val d2 = rowsOf(Checksums.orderInsensitiveChecksum(base.repartition(3), Seq("id", "v")))
    assert(d1 == d2)
    val d3 = rowsOf(Checksums.orderInsensitiveChecksum(
      Seq((1, "x"), (2, "y"), (3, "w")).toDF("id", "v"), Seq("id", "v")))
    assert(d1 != d3)
  }

  test("latestWins keeps max order row; nulls lose; reruns deterministic on ties") {
    val df = Seq(
      ("a", Some("2024-02-01"), 1.0),
      ("a", Some("2024-01-01"), 2.0),
      ("b", None, 3.0),
      ("b", Some("2024-01-01"), 4.0),
      ("c", Some("2024-01-01"), 5.0), // tie on order col
      ("c", Some("2024-01-01"), 6.0)
    ).toDF("id", "created", "score")
    val out = Dedup.latestWins(df, "id", "created")
      .select("id", "score").as[(String, Double)].collect().toMap
    assert(out("a") == 1.0)
    assert(out("b") == 4.0)
    // tie on c: stable winner across reruns and partitionings
    val rerun = Dedup.latestWins(df.repartition(5), "id", "created")
      .select("id", "score").as[(String, Double)].collect().toMap
    assert(out("c") == rerun("c"))
  }

  test("exact dedup keeps one witness per value tuple") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    assert(Dedup.exact(df).count() == 2)
  }

  test("bucketDivergence localizes every drift class, stays silent in sync") {
    val src = Seq((0L, "a", 1.5), (1L, "b", 2.5), (2L, "c", 3.5),
      (3L, "d", 4.5), (4L, "e", 5.5)).toDF("id", "name", "bal")
    // identical replica: no diverged buckets at all
    assert(Checksums.bucketDivergence(src, src, "id",
      Seq("id", "name", "bal"), nBuckets = 4).isEmpty)
    // value corruption (same row COUNT — only the digest can see it),
    // a missing row, and an extra row, each in a distinct bucket
    val tgt = src
      .withColumn("bal", when($"id" === 1L, 99.9).otherwise($"bal")) // bucket 1
      .filter($"id" =!= 2L)                                          // bucket 2
      .unionByName(Seq((7L, "x", 0.5)).toDF("id", "name", "bal"))    // bucket 3
    val out = Checksums.bucketDivergence(src, tgt, "id",
      Seq("id", "name", "bal"), nBuckets = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == (1L, 1L), "equal counts, diverged digest: corruption caught")
    assert(out(2L) == (1L, 0L), "missing row localized")
    assert(out(3L) == (1L, 2L), "extra row localized")
  }
}
