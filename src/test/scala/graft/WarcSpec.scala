package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextCompression, Warc}

/** WARC container ingest: round trips (plain and gzip-member-per-record),
  * HTTP body splitting, the whole-payload refusal discipline, and the
  * exploded DataFrame face. q267 gates the chain against the oracle. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def http(body: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body)
      .getBytes("US-ASCII")

  private def recs = Seq(
    Warc.Record("warcinfo", "<urn:uuid:1>", "2024-01-01T00:00:00Z", null,
      9, "info data".getBytes),
    Warc.Record("response", "<urn:uuid:2>", "2024-01-01T00:00:01Z",
      "https://ex.org/a", 0, http("hello body")),
    Warc.Record("request", "<urn:uuid:3>", "2024-01-01T00:00:02Z",
      "https://ex.org/a", 3, "GET".getBytes))

  test("plain and gzip-member-per-record streams round-trip identically") {
    for (gz <- Seq(false, true)) {
      val parsed = Warc.parseRecords(
        if (gz) TextCompression.gunzip(Warc.encode(recs, gzipPerRecord = true)).get
        else Warc.encode(recs, gzipPerRecord = false)).get
      assert(parsed.length == 3)
      assert(parsed.map(_.warcType) == Seq("warcinfo", "response", "request"))
      assert(parsed(0).contentLength == 9L)
      assert(new String(parsed(0).payload) == "info data")
      assert(parsed(1).targetUri == "https://ex.org/a")
      assert(new String(Warc.httpBody(parsed(1).payload).get) == "hello body")
    }
  }

  test("refusals: damage anywhere refuses the whole payload") {
    val good = Warc.encode(recs, gzipPerRecord = false)
    assert(Warc.parseRecords(good.take(50)).isEmpty) // truncated headers
    assert(Warc.parseRecords(good.dropRight(2)).isEmpty) // separator cut
    assert(Warc.parseRecords("HTTP/1.1 not warc".getBytes).isEmpty)
    assert(Warc.parseRecords(null).isEmpty)
    // Content-Length disagreeing with the payload: the record separator
    // lands mid-payload and the walk refuses
    val cl = good.indexOfSlice("Content-Length: 9".getBytes)
    val bad = good.clone; bad(cl + 16) = '7'
    assert(Warc.parseRecords(bad).isEmpty)
    // header line without a colon
    val noColon = good.clone
    val wt = noColon.indexOfSlice("WARC-Type:".getBytes)
    noColon(wt + 9) = ' '
    assert(Warc.parseRecords(noColon).isEmpty)
  }

  test("DataFrame face: explode, body_length for responses, refusal rows absent") {
    val df = Seq(
      (1L, Warc.encode(recs, gzipPerRecord = false)),
      (2L, Warc.encode(recs, gzipPerRecord = true)), // sniffed + inflated
      (3L, "garbage".getBytes),
      (4L, Warc.encode(recs, gzipPerRecord = false).dropRight(1))
    ).toDF("id", "payload")
    val out = Warc.records(df)
    val counts = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L)) // 3 and 4 refuse wholesale
    val resp = out.filter($"warc_type" === "response" && $"id" === 1L).collect()(0)
    assert(resp.getAs[Long]("body_length") == 10L) // "hello body"
    assert(resp.getAs[Long]("content_length") == http("hello body").length.toLong)
    val info = out.filter($"warc_type" === "warcinfo" && $"id" === 1L).collect()(0)
    assert(info.isNullAt(info.fieldIndex("body_length"))) // not a response
    assert(info.isNullAt(info.fieldIndex("target_uri")))
  }
}
