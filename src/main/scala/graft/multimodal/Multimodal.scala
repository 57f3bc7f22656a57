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
  * The IMAGE path is a real codec: `javax.imageio` (JDK built-in —
  * PNG/JPEG/BMP/GIF) decodes payload bytes to exact per-channel pixel sums
  * and dimensions ([[decodeImage]], [[imageStats]]), oracle-verified on
  * deterministically synthesized PNGs (q76). The AUDIO path is likewise
  * real: `javax.sound.sampled` (JDK built-in — WAV/AIFF/AU PCM) decodes to
  * exact frame counts and integer amplitude aggregates ([[decodeAudio]],
  * [[audioStats]]), oracle-verified on synthesized WAVs (q81). Only VIDEO
  * decode remains a deterministic STUB (`decodeStub` — no ffmpeg in this
  * container), which is also the fallback for undecodable bytes; schemas,
  * batch iteration, partition sizing and output shape are identical across
  * all three, so swapping the stub for javacpp-ffmpeg is a one-function
  * change.
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

  /** Exact decoded-image statistics: dimensions, band count, and the
    * per-channel pixel sums (exact longs — order-independent, oracle-
    * comparable; means are sums/(w·h) and would float-drift). */
  final case class ImageStats(media_id: Long, width: Int, height: Int,
                              bands: Int, r_sum: Long, g_sum: Long, b_sum: Long,
                              decode_ok: Boolean)

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF):
    * payload bytes → (width, height, bands, Σr, Σg, Σb), reading pixels
    * through `getRGB` so the sums are sRGB-canonical regardless of the
    * decoder's internal raster layout. None when the bytes are not a
    * supported image (callers fall back to [[decodeStub]]). */
  private[multimodal] def decodeImage(payload: Array[Byte])
      : Option[(Int, Int, Int, Long, Long, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        var (rs, gs, bs) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            rs += (p >> 16) & 0xFF; gs += (p >> 8) & 0xFF; bs += p & 0xFF
            x += 1
          }
          y += 1
        }
        Some((img.getWidth, img.getHeight,
          img.getColorModel.getNumComponents, rs, gs, bs))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batched real decode → [[ImageStats]]: per-partition iteration (one
    * ImageIO context per task), undecodable payloads flagged, never thrown.
    * Partition count is the parallelism knob — repartition upstream so each
    * task holds O(100 MB) of payload, not O(heap). */
  def imageStats(media: Dataset[MediaRecord]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        decodeImage(if (m.payload == null) Array.empty else m.payload) match {
          case Some((w, h, b, rs, gs, bs)) =>
            ImageStats(m.media_id, w, h, b, rs, gs, bs, decode_ok = true)
          case None => ImageStats(m.media_id, 0, 0, 0, 0L, 0L, 0L, decode_ok = false)
        }
      }
    }
  }

  /** Batched feature extraction: per-partition context, fixed-size feature
    * output. Image payloads go through the REAL codec ([[decodeImage]]):
    * features = [r̄, ḡ, b̄ (normalized), w/h aspect] ++ 0s. Non-images and
    * undecodable bytes take the deterministic stub. Partition count is the
    * parallelism knob — at scale, repartition upstream so each task holds
    * O(100 MB) of payload, not O(heap). */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec context init happens here
      it.map { m =>
        val ok = m.payload != null && m.payload.nonEmpty
        val decoded = if (ok && m.kind == "image") decodeImage(m.payload) else None
        val feats = decoded match {
          case Some((w, h, _, rs, gs, bs)) =>
            val out = new Array[Float](dim)
            val n = (w.toLong * h).toFloat
            out(0) = rs / n / 255.0f; out(1) = gs / n / 255.0f; out(2) = bs / n / 255.0f
            if (dim > 3) out(3) = w.toFloat / h
            out
          case None =>
            if (ok) decodeStub(m.payload, dim) else new Array[Float](dim)
        }
        MediaFeatures(m.media_id, m.kind, dim, feats, ok)
      }
    }
  }

  /** Exact decoded-audio statistics: format, frame count, and integer
    * amplitude aggregates (Σ|s| and max|s| over all channel samples — exact
    * longs, order-independent, oracle-comparable). */
  final case class AudioStats(media_id: Long, sample_rate: Int, channels: Int,
                              frames: Long, sum_abs: Long, max_abs: Long,
                              decode_ok: Boolean)

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * containers, PCM payloads — no ffmpeg needed for the bread-and-butter
    * speech-corpus format): payload bytes → (sampleRate, channels, frames,
    * Σ|sample|, max|sample|) over signed 16-bit samples. None when the
    * bytes are not a supported audio stream. */
  private[multimodal] def decodeAudio(payload: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var sumAbs = 0L; var maxAbs = 0L
          var i = 0
          while (i < n) {
            val s: Int =
              if (f.isBigEndian) (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xFF)
              else (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF)
            val a = math.abs(s.toShort.toLong)
            sumAbs += a; if (a > maxAbs) maxAbs = a
            i += 1
          }
          Some((f.getSampleRate.toInt, f.getChannels,
            n.toLong / f.getChannels, sumAbs, maxAbs))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batched real audio decode → [[AudioStats]]: same per-partition batch
    * shape as [[imageStats]] — one codec context per task, undecodable
    * payloads flagged, never thrown. */
  def audioStats(media: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        decodeAudio(if (m.payload == null) Array.empty else m.payload) match {
          case Some((sr, ch, fr, sa, ma)) =>
            AudioStats(m.media_id, sr, ch, fr, sa, ma, decode_ok = true)
          case None => AudioStats(m.media_id, 0, 0, 0L, 0L, 0L, decode_ok = false)
        }
      }
    }
  }

  /** Encode signed 16-bit mono PCM samples as a WAV file through the real
    * `AudioSystem` writer — the decode round-trip recovers the exact
    * samples (PCM is lossless), the property q81's oracle checks. */
  private[multimodal] def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // little-endian
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthesize REAL (decodable) WAV payloads from an id column: mono 8 kHz,
    * id%50+10 frames, sample(i) = ((id·31 + i·7) mod 2003 − 1001)·16 —
    * integer closed form, so every decoded statistic is reproducible by a
    * SQL oracle while the payload exercises the genuine encode→decode
    * path. Encoding runs distributed in mapPartitions. */
  def syntheticWavs(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = (id % 50 + 10).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 7) % 2003 - 1001) * 16).toShort)
          MediaRecord(id, "audio", wavBytes(samples, 8000), 0, 0,
            n * 1000L / 8000L)
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

  /** Encode one uniform-color RGB PNG (headless-safe: BufferedImage +
    * ImageIO need no display). Lossless, so a decode round-trip recovers
    * the exact color — the property q76's oracle checks arithmetically. */
  private[multimodal] def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize REAL (decodable) PNG payloads from an id column: size
    * (id%16+1)×(id%12+1), uniform color (id, 7·id, 13·id) mod 256 — every
    * decoded statistic is reproducible in closed form by a SQL oracle,
    * while the payload itself exercises the genuine encode→decode codec
    * path. Encoding runs distributed in mapPartitions. */
  def syntheticPngs(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 16 + 1).toInt; val h = (id % 12 + 1).toInt
          val rgb = (((id % 256) << 16) | ((id * 7 % 256) << 8) | (id * 13 % 256)).toInt
          MediaRecord(id, "image", pngBytes(w, h, rgb), w, h, 0L)
        }
      }
  }

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
