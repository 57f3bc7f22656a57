package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines at 100 TB.
  *
  * Design: media payloads are opaque `binary` columns travelling next to
  * typed metadata (width/height/duration/codec). Decode / resize /
  * feature-extract run as batched per-partition transforms (the Scala
  * analogue of `mapInPandas`): one library context per partition, vectorized
  * batches inside, never a per-row UDF crossing the serialization wall.
  *
  * The actual codec calls are STUBBED with a deterministic fake (this
  * container carries no image/audio libs — see `decodeStub`); everything
  * Spark-side — schemas, batch iteration, partition sizing, output shape —
  * is real and tested, so swapping the stub for javacpp-ffmpeg/ImageIO is a
  * one-function change.
  */
object Multimodal {

  /** Typed media record: payload + metadata. */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                               width: Int, height: Int, durationMs: Long)

  /** Decoded feature row produced by the batch decoder. */
  final case class MediaFeatures(media_id: Long, kind: String,
                                 featureDim: Int, features: Array[Float],
                                 decodeOk: Boolean)

  /** DETERMINISTIC STUB for the codec: derives a fake feature vector from a
    * rolling hash of the payload bytes. Replace with a real decoder
    * (ImageIO / ffmpeg) in production — signature and batch shape stay. */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var d = 0
    while (d < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 11) % 2000L - 1000L) / 1000.0f
      d += 1
    }
    out
  }

  /** Batched feature extraction: per-partition context, fixed-size feature
    * output. Partition count is the parallelism knob — at scale, repartition
    * upstream so each task holds O(100 MB) of payload, not O(heap). */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init of the (stubbed) codec context happens here
      it.map { m =>
        val ok = m.payload != null && m.payload.nonEmpty
        val feats = if (ok) decodeStub(m.payload, dim) else new Array[Float](dim)
        MediaFeatures(m.media_id, m.kind, dim, feats, ok)
      }
    }
  }

  /** Frame sampling plan for video payloads: every `everyMs` until
    * durationMs — pure column math, the decoder consumes the plan. */
  def frameSamplePlan(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ts",
      when(col("durationMs") > 0,
        sequence(lit(0L), col("durationMs") - 1, lit(everyMs)))
        .otherwise(array()))

  /** Thumbnail/resize request metadata (the decode stage honors it);
    * demonstrates typed-metadata propagation without touching payloads. */
  def withResizeSpec(df: DataFrame, maxSide: Int): DataFrame =
    df.withColumn("resize_scale",
      when(greatest(col("width"), col("height")) > maxSide,
        lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
        .otherwise(lit(1.0)))

  /** Synthesize a deterministic media table from any id column — test/bench
    * input in lieu of real blobs. */
  def syntheticMedia(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id"))
      .withColumn("kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("media_id") % 3 + 1).cast("int")))
      .withColumn("payload", to_binary(md5(col("media_id").cast("string")), lit("hex")))
      .withColumn("width", (col("media_id") % 640 + 1).cast("int"))
      .withColumn("height", (col("media_id") % 480 + 1).cast("int"))
      .withColumn("durationMs", col("media_id") % 10000)
      .as[MediaRecord]
  }
}
