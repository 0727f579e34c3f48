package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride along as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs partition-wise
  * over the binary batches.
  *
  * The actual image/audio codecs are NOT in this container, so `decodeStub`
  * is a clearly-marked deterministic fake — but the Spark-side contract
  * (schema, encoder, partition-wise batch processing, metadata struct) is the
  * real production shape: swap `fakeDecode` for a JNI/codec call and nothing
  * else changes.
  */
object Multimodal {

  /** A decoded-media feature row. */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      content_hash: Long,
      width: Int,
      height: Int,
      mean_luma: Double)

  /** Attach a binary payload column + metadata struct to a text frame
    * (here the payload is the utf-8 bytes themselves — the testbed has no
    * real media; schema and plan shape are what's under test). */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        length(encode(col(textCol), "UTF-8")).as("byte_len"),
        xxhash64(col(textCol)).as("content_hash"),
        lit("application/octet-stream").as("mime")).as("media_meta"))

  /** Frame sampling: chunk each payload into fixed-size frames, one output
    * row per frame with positional metadata — the video/audio "sample every
    * Nth frame" shape. Pure narrow plan (substring + posexplode Generate
    * node, zero shuffle); a real codec would replace the byte-slicing with
    * keyframe extraction and nothing else changes.
    *
    * @param stride  emit every `stride`-th frame (1 = all frames)
    */
  def sampleFrames(
      withPayload: DataFrame,
      idCol: String,
      frameBytes: Int,
      stride: Int = 1): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(frameBytes.toDouble)).cast("int")
    withPayload
      .select(
        col(idCol),
        col("payload"),
        posexplode(
          transform(
            sequence(lit(0), greatest(nFrames - 1, lit(0))),
            i => substring_index_binary(col("payload"), i, frameBytes)))
          .as(Seq("frame_pos", "frame")))
      .filter(col("frame_pos") % stride === 0 && length(col("frame")) > 0)
      .select(
        col(idCol),
        col("frame_pos"),
        col("frame"),
        struct(
          length(col("frame")).as("frame_len"),
          xxhash64(col("frame")).as("frame_hash")).as("frame_meta"))
  }

  /** Byte-range slice of a binary column: frame `i` of size `frameBytes`. */
  private def substring_index_binary(payload: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column, frameBytes: Int) =
    substring(payload, i * frameBytes + 1, lit(frameBytes))

  /** STUB decode: deterministic fake features derived from the payload bytes.
    * Replace with a real codec in production; signature and batch shape stay. */
  private def fakeDecode(id: Long, payload: Array[Byte]): MediaFeatures = {
    var h = 0xcbf29ce484222325L
    var i = 0
    var lumaAcc = 0L
    while (i < payload.length) {
      h ^= payload(i) & 0xffL
      h *= 0x100000001b3L
      lumaAcc += (payload(i) & 0xff)
      i += 1
    }
    val n = math.max(payload.length, 1)
    MediaFeatures(
      doc_id = id,
      byte_len = payload.length,
      content_hash = h,
      width = 64 + (math.abs(h) % 1024).toInt,
      height = 64 + (math.abs(h >>> 10) % 1024).toInt,
      mean_luma = lumaAcc.toDouble / n)
  }

  /** Partition-wise decode pass: binary batches in, typed feature rows out.
    * `mapPartitions` is deliberate — real decoders amortize init (codec
    * context, GPU handle) per partition, exactly like a pandas-UDF batch. */
  def decodeStub(spark: SparkSession, withPayload: DataFrame, idCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => fakeDecode(id, bytes) } }
  }

  /** BATCHED decode pass — the mapInPandas/Arrow batch shape in Scala: each
    * partition's payload stream is re-chunked into fixed-size batches and
    * the (stub) model is invoked once per BATCH, not per row — the contract
    * a GPU inference step needs (pad-to-batch, one forward pass, unpack).
    * The iterator stays lazy: only one batch of payloads is resident per
    * task at a time, so `batchSize` — not partition size — bounds task
    * memory. Output is row-identical to [[decodeStub]]; batching is an
    * execution detail, and the spec pins that. */
  def decodeStubBatched(
      spark: SparkSession,
      withPayload: DataFrame,
      idCol: String,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    require(batchSize > 0, "batchSize must be positive")
    withPayload
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real implementation replaces this with ONE vectorized call
          // over the whole batch (model.forward(stack(batch)))
          batch.iterator.map { case (id, bytes) => fakeDecode(id, bytes) }
        }
      }
  }
}
