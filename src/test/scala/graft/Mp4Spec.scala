package graft

import org.apache.spark.sql.functions._
import graft.operators.Mp4

/** MP4 sample-table walk: encode→parse round trip with hand-computed
  * absolute offsets, spec defaults (absent stss ⇒ all sync), multi-track
  * dispatch, the refusal matrix over damaged tables, and the Spark faces
  * (census + keyframe plan). q262 gates the pipeline against the oracle. */
class Mp4Spec extends SparkSpec {
  import spark.implicits._

  private val sizes = Array(100L, 110L, 120L, 130L, 140L)
  private val deltas = Array(40L, 40L, 40L, 40L, 40L)
  private val keys = Array(1, 4)

  private def fixture(withStss: Boolean = true, audio: Int = 0) =
    Mp4.encode(1000L, sizes, deltas, keys, withStss, audio)

  /** Index of the first occurrence of a 4CC tag in the file. */
  private def tagAt(p: Array[Byte], tag: String): Int =
    p.indices.find(i => i + 4 <= p.length &&
      p(i) == tag(0) && p(i + 1) == tag(1) &&
      p(i + 2) == tag(2) && p(i + 3) == tag(3)).get

  test("encode -> parse round trip: counts, dts, absolute offsets, keyframes") {
    val p = fixture()
    val tracks = Mp4.parseTracks(p)
    assert(tracks.length == 1)
    val t = tracks.head
    assert(t.handler == "vide" && t.timescale == 1000L)
    assert(t.nSamples == 5 && t.durationMs == 200L)
    assert(t.keyframes.toSeq == Seq(1, 4))
    assert(t.dtsMedia.toSeq == Seq(0L, 40L, 80L, 120L, 160L))
    assert(t.sizes.toSeq == sizes.toSeq)
    // offsets are ABSOLUTE file positions: first sample at mdat payload
    // start, each next shifted by the previous size
    val mdatPayload = tagAt(p, "mdat") + 4
    assert(t.offsets.toSeq == Seq(0L, 100L, 210L, 330L, 460L).map(_ + mdatPayload))
    // and the mdat box really contains those byte ranges
    assert(t.offsets.last + t.sizes.last <= p.length)
  }

  test("absent stss means every sample is a keyframe (spec default)") {
    val t = Mp4.parseTracks(fixture(withStss = false)).head
    assert(t.keyframes.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("multi-track: census picks the vide track, audio rides behind it") {
    val p = fixture(audio = 3)
    val tracks = Mp4.parseTracks(p)
    assert(tracks.map(_.handler).toSeq == Seq("vide", "soun"))
    val a = tracks(1)
    // audio chunk sits directly after the video bytes in mdat
    assert(a.offsets.head == tracks.head.offsets.last + tracks.head.sizes.last)
  }

  test("refusal matrix: damaged tables drop the track, never crash") {
    // truncated mid-moov
    assert(Mp4.parseTracks(fixture().take(80)).isEmpty)
    // not ISO-BMFF at all
    assert(Mp4.parseTracks("plain text".getBytes).isEmpty)
    assert(Mp4.parseTracks(null).isEmpty)
    val p = fixture()
    // stts/stsz disagreement: shrink the stts entry count by one
    val stts = tagAt(p, "stts")
    val fewer = p.clone(); fewer(stts + 11) = (deltas.length - 1).toByte
    assert(Mp4.parseTracks(fewer).isEmpty)
    // stss index out of range
    val stss = tagAt(p, "stss")
    val oob = p.clone(); oob(stss + 15) = 9 // first keyframe index -> 9 > 5
    assert(Mp4.parseTracks(oob).isEmpty)
    // stsz bomb: claim ~2^23 samples — refused by the cap before any
    // array materializes (payload: ver/flags +4, sample_size +8, count +12)
    val stsz = tagAt(p, "stsz")
    val bomb = p.clone(); bomb(stsz + 13) = 0x7F.toByte
    assert(Mp4.parseTracks(bomb).isEmpty)
    // uniform-size corruption pointing samples past EOF: refused by the
    // in-file range validation
    val huge = p.clone(); huge(stsz + 9) = 0x7F.toByte
    assert(Mp4.parseTracks(huge).isEmpty)
    // chunk offset table emptied: offsets unresolvable
    val stco = tagAt(p, "stco")
    val noChunks = p.clone(); noChunks(stco + 11) = 0
    assert(Mp4.parseTracks(noChunks).isEmpty)
  }

  test("Spark faces: census struct and exploded keyframe plan") {
    val df = Seq(
      (1L, fixture()),
      (2L, fixture(withStss = false)),
      (3L, "garbage".getBytes),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val census = Mp4.videoCensus(df).select($"id", $"video.n_frames",
      $"video.n_keyframes", $"video.duration_ms").orderBy("id").collect()
    assert(census(0).getInt(1) == 5 && census(0).getInt(2) == 2 &&
      census(0).getLong(3) == 200L)
    assert(census(1).getInt(2) == 5)
    assert(census(2).isNullAt(1) && census(3).isNullAt(1))

    val plan = Mp4.keyframePlan(df.filter($"id" === 1L))
      .select("id", "sample_idx", "offset", "size", "dts_ms").collect()
    assert(plan.length == 2)
    assert(plan.map(_.getInt(1)).toSeq == Seq(1, 4))
    assert(plan.map(_.getLong(4)).toSeq == Seq(0L, 120L))
    // stride keeps every 2nd keyframe
    val strided = Mp4.keyframePlan(df.filter($"id" === 2L), stride = 2)
      .select("sample_idx").collect().map(_.getInt(0)).toSeq
    assert(strided == Seq(1, 3, 5))
  }
}
