package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image /
  * audio / video as opaque `binary` columns plus typed metadata,
  * processed in partition-local batches.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real
  * and tested; the codec itself is a STUB — this container has no
  * image/audio libraries, so [[DecodeStub]] derives deterministic fake
  * dimensions/features from the bytes. Swapping in a real codec changes
  * only the function body, never the plan shape: decode stays a
  * narrow per-partition map (no shuffle), feature vectors flow into
  * [[Similarity]] unchanged.
  */
object Multimodal {

  /** One media asset: opaque payload + envelope metadata. */
  case class MediaRow(
      media_id: Long,
      mime: String,
      payload: Array[Byte],
      source: String)

  /** Decoded/typed metadata a real codec would produce. */
  case class MediaMeta(
      media_id: Long,
      mime: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      duration_ms: Long)

  /** Extracted per-asset feature vector (embedding-shaped so it feeds
    * the [[Similarity]] operators directly). */
  case class MediaFeature(media_id: Long, embedding: Array[Float])

  /** STUB codec: deterministic pseudo-decode from the payload bytes.
    * A real implementation would parse the container header (JPEG SOF,
    * WAV fmt, MP4 moov) — the call site and batch shape are identical. */
  object DecodeStub {
    def decode(r: MediaRow): MediaMeta = {
      val n = r.payload.length
      val h = java.util.Arrays.hashCode(r.payload)
      MediaMeta(r.media_id, r.mime, n,
        width = 64 + math.floorMod(h, 512),
        height = 64 + math.floorMod(h / 512, 512),
        n_frames = if (r.mime.startsWith("video")) 1 + math.floorMod(h, 240) else 1,
        duration_ms = if (r.mime.startsWith("image")) 0L else math.floorMod(h.toLong, 30000L))
    }

    /** Fake feature extraction: a 16-dim float vector from a rolling
      * byte hash — stands in for a CNN/audio embedding. */
    def features(r: MediaRow, dim: Int = 16): MediaFeature = {
      val v = new Array[Float](dim)
      var acc = 1125899906842597L
      var i = 0
      while (i < r.payload.length) {
        acc = 31L * acc + (r.payload(i) & 0xff)
        if (i % 7 == 0) v(math.floorMod(acc, dim.toLong).toInt) += (acc % 1000L) / 1000f
        i += 1
      }
      MediaFeature(r.media_id, v)
    }
  }

  /** Synthesize a media table from the documents corpus (utf-8 payload
    * bytes) so the plumbing is exercisable without real assets. */
  def fakeMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("mime"),
      encode(col("text"), "utf-8").as("payload"),
      col("source"))
      .as[MediaRow]
  }

  /** Decode stage: partition-local batched map — the Scala analog of a
    * `mapInPandas` decode UDF. Batch shape = one iterator per parquet
    * row-group-sized partition; no shuffle, codegen resumes after. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(DecodeStub.decode))
  }

  /** Feature-extract stage, same batch shape as [[decodeMeta]]. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r => DecodeStub.features(r, dim)))
  }

  /** Frame sampling plan: every `stride`-th frame index per video —
    * pure relational explode, the real frame decode would map over
    * (media_id, frame_idx) with the payload joined back in. */
  def frameSamplePlan(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF()
      .filter(col("n_frames") > 1)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize plan: metadata-only transform (target box preserving
    * aspect), demonstrating typed-metadata flow without touching
    * payloads. */
  def resizePlan(meta: Dataset[MediaMeta], maxSide: Int): DataFrame =
    meta.toDF().withColumn("scale",
        least(lit(maxSide) / col("width"), lit(maxSide) / col("height"), lit(1.0)))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
}
