package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata structs alongside.
  *
  * The decode step is a clearly-marked STUB (no codec libraries in this
  * environment): `decodeStub` derives deterministic fake dimensions from
  * the payload bytes. Everything around it — the schema contract, the
  * per-partition batching, the partition sizing — is the real production
  * plumbing: swap `fakeDecode` for a JNI/codec call and nothing else moves.
  *
  * Scale notes: payloads dominate row size, so `maxRecordsPerBatch` /
  * `spark.sql.files.maxPartitionBytes` keep partitions bounded; metadata
  * extraction never shuffles; downstream analytics should `select` away
  * the binary column early so Parquet column pruning skips the payload IO.
  */
object Multimodal {

  /** Metadata contract for decoded media. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType),
    StructField("byte_len", LongType)))

  /** STUB decoder — deterministic fake: derives plausible metadata
    * from the payload hash. Replace with a real codec (e.g. libjpeg via
    * JNI) in production; signature and batch shape stay identical. */
  def fakeDecode(payload: Array[Byte], mime: String): Row = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 64 + math.floorMod(h, 1216) // 64..1279 "pixels"
    val hgt = 64 + math.floorMod(h >> 11, 656)
    val frames = if (mime.startsWith("video")) 1 + math.floorMod(h >> 7, 300) else 1
    Row(mime, w, hgt, frames, frames.toLong * 33L, payload.length.toLong)
  }

  /** Attach decoded metadata to a frame carrying (binary payload, mime).
    * mapPartitions keeps the decoder amortized per-batch (the real decoder
    * would reuse codec contexts across a partition). */
  def withDecodedMeta(df: DataFrame, payloadCol: String, mimeCol: String): DataFrame = {
    val outSchema = df.schema.add(StructField("media", mediaMetaSchema))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val pIdx = df.schema.fieldIndex(payloadCol)
    val mIdx = df.schema.fieldIndex(mimeCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val mime = r.getString(mIdx)
        val meta = if (payload == null) null else fakeDecode(payload, mime)
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Frame-sampling plan for video payloads: one output row per sampled
    * frame index (every `stride`-th frame). The explode happens on tiny
    * metadata, never on the payload bytes. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("media.n_frames") - 1, lit(0)), lit(stride))))

  /** Resize plan — STUB: a real implementation re-encodes the payload
    * at (w, h) via a codec; the stub deterministically truncates/pads the
    * payload to the implied byte budget so downstream size accounting is
    * exercised for real. Metadata is updated for real — schema contract
    * identical to production. */
  def resizeTo(df: DataFrame, w: Int, h: Int,
      payloadCol: String = "payload"): DataFrame = {
    val budget = lit(w * h / 16) // fake bytes-per-resized-image budget
    df.withColumn(payloadCol,
        expr(s"substring($payloadCol, 1, ${w * h / 16})"))
      .withColumn("media", col("media")
        .withField("width", lit(w))
        .withField("height", lit(h))
        .withField("byte_len", least(col("media.byte_len"), budget.cast("long"))))
  }

  /** Feature-extraction plan — STUB: a real implementation runs a
    * vision/audio encoder over the payload per partition (amortized model
    * load — same mapPartitions shape as [[withDecodedMeta]]); the stub
    * derives a deterministic d-dim pseudo-embedding from payload hashes
    * so the array schema, batching, and downstream similarity plumbing
    * are the real thing. */
  def extractFeatures(df: DataFrame, dim: Int = 8,
      payloadCol: String = "payload"): DataFrame = {
    val feats = (0 until dim).map { i =>
      (xxhash64(lit(i.toLong), col(payloadCol)).cast("double") /
        lit(Long.MaxValue.toDouble)).cast("float")
    }
    df.withColumn("features", array(feats: _*))
  }

  /** Synthesize a media table from the documents fixture (texts as fake
    * payloads) — test harness for the plumbing above. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, lit("image/png"))
        .when(col("doc_id") % 3 === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("mime"))
}
