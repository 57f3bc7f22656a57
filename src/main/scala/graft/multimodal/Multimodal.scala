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
  * [[audioStats]]), oracle-verified on synthesized WAVs (q81). The VIDEO
  * path is a real RIFF/AVI container demux ([[decodeVideo]],
  * [[videoStats]]) over TWO codecs: uncompressed 24-bit BI_RGB frames
  * (oracle-verified on synthesized AVIs, q85) and motion-JPEG — a REAL
  * compressed format whose frames are plain JPEGs decoded by the same
  * imageio path the image modality uses (oracle-verified with closed-form
  * tolerance on synthesized MJPEG AVIs, q97). Only genuinely external
  * codecs (H.264 etc.) fall back to the deterministic `decodeStub` (no
  * ffmpeg in this container), and swapping
  * that fallback for javacpp-ffmpeg is a one-function change. Schemas,
  * batch iteration, partition sizing and output shape are identical across
  * all three modalities.
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

  /** REAL pixel RESIZE — decode (ImageIO), NEAREST-NEIGHBOR downscale to
    * `maxSide` on the longest side, re-encode as PNG: the thumbnail
    * stage of every vision-data pipeline, with deterministic integer
    * source indexing (`src = (dst * srcDim) / dstDim`, floor division)
    * so the resampled pixels are bit-reproducible across runs and
    * partitionings — no AreaAveraging/bilinear float kernels whose
    * rounding could drift. New dims: unchanged when the longest side
    * already fits, else `max(1, dim * maxSide / longest)` (integer
    * division — replayable in the oracle). Aspect is preserved within
    * integer truncation. Undecodable payloads pass through unchanged
    * with `width/height` zeroed — the same never-throw contract as
    * [[imageStats]]. Per-partition batching; PNG is lossless, so a
    * downstream [[imageStats]] sees exact resampled sums. */
  def resizeImages(media: Dataset[MediaRecord],
                   maxSide: Int): Dataset[MediaRecord] = {
    require(maxSide >= 1, s"maxSide must be >= 1, got $maxSide")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val decoded =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              if (m.payload == null) Array.empty else m.payload)))
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val longest = math.max(w, h)
            if (longest <= maxSide)
              m.copy(kind = "image", width = w, height = h)
            else {
              val nw = math.max(1, w * maxSide / longest)
              val nh = math.max(1, h * maxSide / longest)
              val out = new java.awt.image.BufferedImage(nw, nh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < nh) {
                var x = 0
                while (x < nw) {
                  out.setRGB(x, y, img.getRGB(x * w / nw, y * h / nh))
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              m.copy(kind = "image", payload = bos.toByteArray,
                width = nw, height = nh)
            }
          case None => m.copy(width = 0, height = 0)
        }
      }
    }
  }

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

  /** REAL audio DECIMATION — the audio analogue of [[resizeImages]]
    * (speech pipelines downsample 44.1/48 kHz field recordings toward
    * the 16 kHz most ASR models expect): decode mono PCM16 through the
    * real `javax.sound.sampled` codec, keep every `factor`-th sample
    * (exact integer selection — no interpolation filter whose float
    * kernel could drift), re-encode WAV at `rate / factor`. Duration is
    * preserved; aliasing above the new Nyquist is the standard
    * decimation trade (the deterministic choice — a windowed-sinc
    * low-pass would be better audio and unreproducible integers).
    * Non-mono/non-16-bit/undecodable payloads pass through unchanged
    * with `durationMs` zeroed — the never-throw contract. */
  def decimateAudio(media: Dataset[MediaRecord],
                    factor: Int): Dataset[MediaRecord] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val decoded =
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(
                if (m.payload == null) Array.empty else m.payload))
            try {
              val f = ais.getFormat
              // factor beyond the rate would build a 0 Hz WAV — treat as
              // unsupported (pass-through) rather than throw in the task
              if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
                f.getSampleRate.toInt / factor < 1) None
              else {
                val bytes = ais.readAllBytes()
                val n = bytes.length / 2
                val kept = new Array[Short]((n + factor - 1) / factor)
                var i = 0
                while (i * factor < n) {
                  val j = i * factor
                  val s: Int =
                    if (f.isBigEndian)
                      (bytes(2 * j).toInt << 8) | (bytes(2 * j + 1) & 0xFF)
                    else
                      (bytes(2 * j + 1).toInt << 8) | (bytes(2 * j) & 0xFF)
                  kept(i) = s.toShort
                  i += 1
                }
                Some((kept, f.getSampleRate.toInt / factor))
              }
            } finally ais.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some((kept, rate)) =>
            m.copy(kind = "audio", payload = wavBytes(kept, rate),
              durationMs =
                if (rate > 0) kept.length.toLong * 1000 / rate else 0L)
          case None => m.copy(durationMs = 0L)
        }
      }
    }
  }

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

  /** Exact decoded-video statistics: container geometry, frame count, frame
    * interval, and per-channel pixel sums over ALL frames (exact longs —
    * order-independent, oracle-comparable). */
  final case class VideoStats(media_id: Long, width: Int, height: Int,
                              frames: Long, us_per_frame: Long,
                              r_sum: Long, g_sum: Long, b_sum: Long,
                              decode_ok: Boolean)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** biCompression fourcc for motion-JPEG streams ('MJPG', little-endian). */
  private val MJPG: Int = 'M' | ('J' << 8) | ('P' << 16) | ('G' << 24)

  /** REAL video demux: a RIFF/AVI container parser (chunk walk with sizes,
    * word alignment, nested LISTs) over TWO codecs decodable without
    * external libraries — uncompressed 24-bit BI_RGB ('DIB ') frames, and
    * motion-JPEG ('MJPG') frames whose chunks are plain JPEG images handed
    * to the SAME `javax.imageio` path [[decodeImage]] uses. That makes
    * MJPEG the honest compressed-video story of a pure-JVM engine; other
    * codecs (H.264…) still return None (callers fall back to
    * [[decodeStub]]). payload bytes → (width, height, frames, µs/frame,
    * Σr, Σg, Σb). DIB row stride is 4-byte padded per spec; pixel order in
    * a DIB frame is BGR bottom-up, irrelevant to channel sums. */
  /** The chunk walk shared by [[decodeVideo]] (whole-payload aggregates)
    * and [[sampleFrames]] (per-frame rows): `onFrame(idx, Σr, Σg, Σb)`
    * fires once per decoded frame in stream order. Returns
    * (width, height, frames, µs/frame) when the payload is a decodable
    * AVI of a supported codec, None otherwise. */
  /** One video chunk handed to a [[walkChunks]] consumer: frame index
    * (among COUNTED frames), codec (DIB vs MJPEG), the chunk's byte
    * range, and the stream dims (headers precede frame data in AVI). */
  private final case class FrameChunk(idx: Long, isDib: Boolean,
                                      off: Int, size: Int,
                                      w: Int, h: Int)

  /** Lowest-level AVI walk: `onVideoFrame` fires per video chunk of a
    * supported codec and returns whether the frame COUNTED (MJPEG
    * consumers return false for an undecodable chunk, so frame indices
    * stay consistent across every consumer). */
  private def walkChunks(payload: Array[Byte])
                        (onVideoFrame: FrameChunk => Boolean)
      : Option[(Int, Int, Long, Long)] =
    try {
      if (payload.length < 12 || fourcc(payload, 0) != "RIFF"
        || fourcc(payload, 8) != "AVI ") return None
      var width = 0; var height = 0; var usPerFrame = 0L
      var bitCount = -1; var compression = -1
      var frames = 0L

      // walk [from, to) as a sequence of (fourcc, size, data) chunks
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val cc = fourcc(payload, p)
          val size = le32(payload, p + 4)
          val data = p + 8
          if (size < 0 || data + size > to) return // malformed: stop cleanly
          cc match {
            case "LIST" => walk(data + 4, data + size) // skip list subtype
            case "avih" =>
              usPerFrame = le32(payload, data).toLong
              width = le32(payload, data + 32)
              height = le32(payload, data + 36)
            case "strf" =>
              bitCount = le32(payload, data + 12) >>> 16 // biPlanes|biBitCount
              compression = le32(payload, data + 16)
            case "00db" | "00dc" =>
              if (bitCount == 24 && compression == 0 && width > 0 && height > 0
                && size >= ((width * 3 + 3) & ~3) * height) {
                if (onVideoFrame(FrameChunk(frames, isDib = true, data,
                  size, width, height))) frames += 1
              } else if (compression == MJPG && width > 0 && height > 0) {
                if (onVideoFrame(FrameChunk(frames, isDib = false, data,
                  size, width, height))) frames += 1
              }
            case _ => ()
          }
          p = data + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, math.min(payload.length, 8 + le32(payload, 4)))
      if (width > 0 && height > 0 &&
          ((bitCount == 24 && compression == 0) || compression == MJPG))
        Some((width, height, frames, usPerFrame))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** [[walkChunks]] with per-frame channel SUMS — the callback
    * [[decodeVideo]] and [[sampleFrames]] share. DIB sums read the
    * padded-stride rows directly; MJPEG chunks are plain JPEGs decoded
    * by the same imageio path the image operators use (a bad frame is
    * skipped, not thrown). */
  private def walkVideo(payload: Array[Byte])
                       (onFrame: (Long, Long, Long, Long) => Unit)
      : Option[(Int, Int, Long, Long)] =
    walkChunks(payload) { fc =>
      if (fc.isDib) {
        val stride = (fc.w * 3 + 3) & ~3
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < fc.h) {
          var x = 0
          val row = fc.off + y * stride
          while (x < fc.w) {
            bs += payload(row + 3 * x) & 0xFF
            gs += payload(row + 3 * x + 1) & 0xFF
            rs += payload(row + 3 * x + 2) & 0xFF
            x += 1
          }
          y += 1
        }
        onFrame(fc.idx, rs, gs, bs)
        true
      } else {
        decodeImage(java.util.Arrays.copyOfRange(payload, fc.off,
          fc.off + fc.size))
          .exists { case (_, _, _, fr, fg, fb) =>
            onFrame(fc.idx, fr, fg, fb); true }
      }
    }

  /** One extracted frame: a REAL standalone image payload (PNG for DIB
    * sources — lossless; the original JPEG bytes for MJPEG sources). */
  final case class VideoFrame(media_id: Long, frame_idx: Long,
                              width: Int, height: Int,
                              payload: Array[Byte])

  /** EXTRACT every `everyN`-th frame as a standalone IMAGE payload — the
    * video → image handoff of a vision-language pipeline (sampled frames
    * flow into [[resizeImages]] / [[extractFeatures]] / [[imageStats]]
    * like any other image). DIB frames rebuild a `BufferedImage`
    * (bottom-up BGR per the BMP spec) and re-encode as lossless PNG;
    * MJPEG frames ARE JPEGs and travel byte-verbatim (no second lossy
    * pass). Frame indices match [[sampleFrames]]/[[videoStats]] exactly
    * (same walker, same counting rule). */
  def extractFrames(media: Dataset[MediaRecord],
                    everyN: Int): Dataset[VideoFrame] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val payload = if (m.payload == null) Array.empty[Byte] else m.payload
        val out = scala.collection.mutable.ArrayBuffer[VideoFrame]()
        walkChunks(payload) { fc =>
          if (fc.isDib) {
            if (fc.idx % everyN == 0) {
              val img = new java.awt.image.BufferedImage(fc.w, fc.h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val stride = (fc.w * 3 + 3) & ~3
              var y = 0
              while (y < fc.h) {
                var x = 0
                val row = fc.off + y * stride
                while (x < fc.w) {
                  val b = payload(row + 3 * x) & 0xFF
                  val g = payload(row + 3 * x + 1) & 0xFF
                  val r = payload(row + 3 * x + 2) & 0xFF
                  // DIB rows are bottom-up: data row y is image row h-1-y
                  img.setRGB(x, fc.h - 1 - y, (r << 16) | (g << 8) | b)
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              out += VideoFrame(m.media_id, fc.idx, fc.w, fc.h,
                bos.toByteArray)
            }
            true
          } else {
            val jpeg = java.util.Arrays.copyOfRange(payload, fc.off,
              fc.off + fc.size)
            val ok = decodeImage(jpeg).isDefined
            if (ok && fc.idx % everyN == 0)
              out += VideoFrame(m.media_id, fc.idx, fc.w, fc.h, jpeg)
            ok
          }
        }
        out
      }
    }
  }

  private[multimodal] def decodeVideo(payload: Array[Byte])
      : Option[(Int, Int, Long, Long, Long, Long, Long)] = {
    var rs = 0L; var gs = 0L; var bs = 0L
    walkVideo(payload) { (_, r, g, b) => rs += r; gs += g; bs += b }
      .map { case (w, h, f, us) => (w, h, f, us, rs, gs, bs) }
  }

  /** One sampled frame's exact channel sums. */
  final case class FrameStats(media_id: Long, frame_idx: Long,
                              r_sum: Long, g_sum: Long, b_sum: Long)

  /** REAL frame SAMPLING — the keyframe-extraction stage of every video
    * pipeline (vision-language training reads every Nth frame, not 30
    * fps): demux the AVI through the same chunk walker as [[videoStats]]
    * and emit a row per KEPT frame (indices 0, N, 2N, ... in stream
    * order) with its exact channel sums. Deterministic integer
    * selection; undecodable payloads emit no rows (compose with
    * [[videoStats]]' decode_ok for the audit lane). One row per kept
    * frame ≈ frames/N rows — flatMap keeps it streaming, never a
    * per-payload buffer of all frames. */
  def sampleFrames(media: Dataset[MediaRecord],
                   everyN: Int): Dataset[FrameStats] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val out = scala.collection.mutable.ArrayBuffer[FrameStats]()
        walkVideo(if (m.payload == null) Array.empty else m.payload) {
          (idx, r, g, b) =>
            if (idx % everyN == 0)
              out += FrameStats(m.media_id, idx, r, g, b)
        }
        out
      }
    }
  }

  /** Batched real video demux → [[VideoStats]]: same per-partition batch
    * shape as [[imageStats]]/[[audioStats]] — undecodable payloads flagged,
    * never thrown. */
  def videoStats(media: Dataset[MediaRecord]): Dataset[VideoStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        decodeVideo(if (m.payload == null) Array.empty else m.payload) match {
          case Some((w, h, fr, us, r, g, b)) =>
            VideoStats(m.media_id, w, h, fr, us, r, g, b, decode_ok = true)
          case None =>
            VideoStats(m.media_id, 0, 0, 0L, 0L, 0L, 0L, 0L, decode_ok = false)
        }
      }
    }
  }

  /** Shared RIFF/AVI container writer: wraps pre-encoded frame chunks in
    * hdrl (+avih/strh/strf) and movi lists for the given codec fourcc /
    * biCompression. Used by [[aviBytes]] (DIB) and [[aviMjpegBytes]]. */
  private def aviContainer(w: Int, h: Int, frameChunks: Array[Array[Byte]],
                           usPerFrame: Int, handler: String,
                           biCompression: Int, chunkId: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val frameSize = frameChunks.map(_.length).maxOption.getOrElse(0)

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ i32(body.length) ++ body ++ pad
    }
    def list(subtype: String, body: Array[Byte]): Array[Byte] =
      cc("LIST") ++ i32(body.length + 4) ++ cc(subtype) ++ body

    val avih = i32(usPerFrame) ++ i32(frameSize * 1000000 / math.max(usPerFrame, 1)) ++
      i32(0) ++ i32(0) ++ i32(frameChunks.length) ++ i32(0) ++ i32(1) ++
      i32(frameSize) ++ i32(w) ++ i32(h) ++ i32(0) ++ i32(0) ++ i32(0) ++ i32(0)
    val strh = cc("vids") ++ cc(handler) ++ i32(0) ++ i32(0) ++ i32(0) ++
      i32(usPerFrame) ++ i32(1000000) ++ i32(0) ++ i32(frameChunks.length) ++
      i32(frameSize) ++ i32(-1) ++ i32(0) ++
      Array(0, 0, 0, 0).map(_.toByte) ++ i32((h << 16) | w)
    val strf = i32(40) ++ i32(w) ++ i32(h) ++ i32((24 << 16) | 1) ++
      i32(biCompression) ++
      i32(frameSize) ++ i32(0) ++ i32(0) ++ i32(0) ++ i32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frameChunks.flatMap(chunk(chunkId, _)))
    val body = cc("AVI ") ++ hdrl ++ movi
    bos.write(cc("RIFF")); bos.write(i32(body.length)); bos.write(body)
    bos.toByteArray
  }

  /** Mux packed top-down BGR frames (w·h·3 bytes each, no padding) into a
    * RIFF/AVI container with uncompressed 24-bit BI_RGB frames — the
    * encode half of the [[decodeVideo]] round trip. Rows are written
    * bottom-up with 4-byte stride padding per the DIB spec. */
  private[multimodal] def aviBytes(w: Int, h: Int, frames: Array[Array[Byte]],
                                   usPerFrame: Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val dibs = frames.map { f =>
      val dib = new Array[Byte](stride * h)
      var y = 0
      while (y < h) { // top-down packed -> bottom-up padded
        System.arraycopy(f, y * w * 3, dib, (h - 1 - y) * stride, w * 3)
        y += 1
      }
      dib
    }
    aviContainer(w, h, dibs, usPerFrame, "DIB ", 0, "00db")
  }

  /** Encode one uniform-color (r,g,b) w×h frame as JPEG via `javax.imageio`
    * — the encode half of the MJPEG round trip. */
  private[multimodal] def jpegBytes(w: Int, h: Int, r: Int, g: Int, b: Int)
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Mux pre-encoded JPEG frames into a RIFF/AVI 'MJPG' container — a REAL
    * compressed video format assembled from parts the JVM already owns
    * (the RIFF writer above + imageio's JPEG codec). */
  private[multimodal] def aviMjpegBytes(w: Int, h: Int,
      jpegFrames: Array[Array[Byte]], usPerFrame: Int): Array[Byte] =
    aviContainer(w, h, jpegFrames, usPerFrame, "MJPG", MJPG, "00dc")

  /** Synthesize REAL (demuxable) AVI payloads from an id column: size
    * (id%8+2)×(id%6+2), id%5+2 uniform-color frames, frame f color
    * ((id+f)%256, (7id+11f)%256, (13id+17f)%256), 40 ms/frame — integer
    * closed form, so every demuxed statistic is reproducible by a SQL
    * oracle while the payload exercises the genuine mux→demux container
    * path. Muxing runs distributed in mapPartitions. */
  def syntheticAvis(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 8 + 2).toInt; val h = (id % 6 + 2).toInt
          val nf = (id % 5 + 2).toInt
          val frames = Array.tabulate(nf) { f =>
            val (r, g, b) = (((id + f) % 256).toByte,
              ((id * 7 + f * 11) % 256).toByte, ((id * 13 + f * 17) % 256).toByte)
            val px = Array(b, g, r) // BGR
            Array.fill(w * h)(px).flatten
          }
          MediaRecord(id, "video", aviBytes(w, h, frames, 40000), w, h,
            nf * 40L)
        }
      }
  }

  /** Synthesize REAL motion-JPEG AVI payloads from an id column: size
    * (id%8+2)·8 × (id%6+2)·8 (multiples of the JPEG 8×8 block so uniform
    * frames stay uniform through the DCT), id%5+2 frames, frame f uniform
    * color ((id+f)%256, (7id+11f)%256, (13id+17f)%256), 40 ms/frame. The
    * structural stats (dims, frame count, rate) are integer-exact for a
    * SQL oracle; pixel sums are JPEG-lossy, so oracles compare them with a
    * closed-form tolerance. Muxing runs distributed in mapPartitions. */
  def syntheticMjpegAvis(spark: SparkSession, ids: DataFrame, idCol: String)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 8 + 2).toInt * 8; val h = (id % 6 + 2).toInt * 8
          val nf = (id % 5 + 2).toInt
          val frames = Array.tabulate(nf) { f =>
            jpegBytes(w, h, ((id + f) % 256).toInt,
              ((id * 7 + f * 11) % 256).toInt, ((id * 13 + f * 17) % 256).toInt)
          }
          MediaRecord(id, "video", aviMjpegBytes(w, h, frames, 40000), w, h,
            nf * 40L)
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
