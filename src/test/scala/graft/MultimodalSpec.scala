package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("extractFeatures: deterministic, fixed dim, empty payload flagged") {
    val media = Seq(
      MediaRecord(1L, "image", Array[Byte](1, 2, 3), 10, 10, 0L),
      MediaRecord(2L, "image", Array[Byte](1, 2, 3), 10, 10, 0L),
      MediaRecord(3L, "audio", Array.empty[Byte], 0, 0, 1000L)).toDS()
    val out = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.media_id)
    assert(out.forall(_.featureDim == 8))
    assert(out(0).features.toSeq == out(1).features.toSeq) // same payload → same features
    assert(!out(2).decodeOk && out(2).features.forall(_ == 0.0f))
  }

  test("imageStats: real PNG encode→decode round-trip recovers exact pixels") {
    val ids = Seq(5L, 300L, 1023L).toDF("id")
    val stats = Multimodal.imageStats(Multimodal.syntheticPngs(spark, ids, "id"))
      .collect().map(s => s.media_id -> s).toMap
    Seq(5L, 300L, 1023L).foreach { id =>
      val s = stats(id)
      val (w, h) = ((id % 16 + 1).toInt, (id % 12 + 1).toInt)
      assert(s.decode_ok && s.width == w && s.height == h && s.bands == 3)
      assert(s.r_sum == w.toLong * h * (id % 256))
      assert(s.g_sum == w.toLong * h * (id * 7 % 256))
      assert(s.b_sum == w.toLong * h * (id * 13 % 256))
    }
  }

  test("imageStats flags undecodable payloads instead of throwing") {
    val junk = Seq(
      MediaRecord(1L, "image", Array[Byte](1, 2, 3), 0, 0, 0L),
      MediaRecord(2L, "image", Array.empty[Byte], 0, 0, 0L),
      MediaRecord(3L, "image", null, 0, 0, 0L)).toDS()
    val out = Multimodal.imageStats(junk).collect()
    assert(out.length == 3 && out.forall(s => !s.decode_ok && s.width == 0))
  }

  test("audioStats: real WAV encode→decode round-trip recovers exact samples") {
    val ids = Seq(3L, 47L, 199L).toDF("id")
    val stats = Multimodal.audioStats(Multimodal.syntheticWavs(spark, ids, "id"))
      .collect().map(s => s.media_id -> s).toMap
    Seq(3L, 47L, 199L).foreach { id =>
      val s = stats(id)
      val n = (id % 50 + 10).toInt
      val samples = (0 until n).map(i => ((id * 31 + i * 7) % 2003 - 1001) * 16)
      assert(s.decode_ok && s.sample_rate == 8000 && s.channels == 1)
      assert(s.frames == n.toLong)
      assert(s.sum_abs == samples.map(math.abs).sum)
      assert(s.max_abs == samples.map(math.abs).max)
    }
  }

  test("audioStats flags undecodable payloads instead of throwing") {
    val junk = Seq(
      MediaRecord(1L, "audio", Array[Byte](9, 9, 9), 0, 0, 0L),
      MediaRecord(2L, "audio", null, 0, 0, 0L)).toDS()
    val out = Multimodal.audioStats(junk).collect()
    assert(out.length == 2 && out.forall(s => !s.decode_ok && s.frames == 0L))
  }

  test("videoStats: real AVI mux→demux round-trip recovers exact pixel sums") {
    val ids = Seq(5L, 42L, 197L).toDF("id")
    val stats = Multimodal.videoStats(Multimodal.syntheticAvis(spark, ids, "id"))
      .collect().map(s => s.media_id -> s).toMap
    Seq(5L, 42L, 197L).foreach { id =>
      val s = stats(id)
      val w = (id % 8 + 2).toInt; val h = (id % 6 + 2).toInt
      val nf = (id % 5 + 2).toInt
      assert(s.decode_ok && s.width == w && s.height == h)
      assert(s.frames == nf.toLong && s.us_per_frame == 40000L)
      assert(s.r_sum == (0 until nf).map(f => w.toLong * h * ((id + f) % 256)).sum)
      assert(s.g_sum == (0 until nf).map(f => w.toLong * h * ((id * 7 + f * 11) % 256)).sum)
      assert(s.b_sum == (0 until nf).map(f => w.toLong * h * ((id * 13 + f * 17) % 256)).sum)
    }
  }

  test("videoStats demuxes per-pixel (non-uniform) frames exactly") {
    // pixel (x, y) of frame f has r = (x + y + f) % 256, g = 2x, b = 3y —
    // catches stride/padding/bottom-up mistakes a uniform frame cannot
    val (w, h, nf) = (5, 3, 2) // stride 16 > 15: row padding exercised
    val frames = Array.tabulate(nf) { f =>
      val buf = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        buf((y * w + x) * 3) = (3 * y).toByte        // B
        buf((y * w + x) * 3 + 1) = (2 * x).toByte    // G
        buf((y * w + x) * 3 + 2) = ((x + y + f) % 256).toByte // R
      }
      buf
    }
    val payload = graft.multimodal.MultimodalTestAccess.avi(w, h, frames, 40000)
    val out = Multimodal.videoStats(
      Seq(MediaRecord(1L, "video", payload, w, h, 80L)).toDS()).head()
    val expR = (for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
      yield ((x + y + f) % 256).toLong).sum
    val expG = (for (_ <- 0 until nf; _ <- 0 until h; x <- 0 until w)
      yield (2 * x).toLong).sum
    val expB = (for (_ <- 0 until nf; y <- 0 until h; _ <- 0 until w)
      yield (3 * y).toLong).sum
    assert(out.decode_ok && out.frames == nf.toLong)
    assert(out.r_sum == expR && out.g_sum == expG && out.b_sum == expB)
  }

  test("MJPEG AVI: mux->demux through the imageio JPEG codec, bounded loss") {
    // uniform frames at 8x8-block-aligned sizes: structural stats exact,
    // channel means within a small JPEG quantization tolerance
    val media = Multimodal.syntheticMjpegAvis(
      spark, (0L until 40L).toDF("id"), "id")
    val stats = Multimodal.videoStats(media).collect()
    assert(stats.length == 40 && stats.forall(_.decode_ok))
    var maxErr = 0.0
    stats.foreach { s =>
      val id = s.media_id
      val (w, h, nf) = ((id % 8 + 2) * 8, (id % 6 + 2) * 8, id % 5 + 2)
      assert(s.width == w && s.height == h && s.frames == nf &&
        s.us_per_frame == 40000L, s"structural mismatch for id $id: $s")
      val n = (w * h * nf).toDouble
      val expR = (0L until nf).map(f => (id + f) % 256).sum * w * h / n
      val expG = (0L until nf).map(f => (id * 7 + f * 11) % 256).sum * w * h / n
      val expB = (0L until nf).map(f => (id * 13 + f * 17) % 256).sum * w * h / n
      maxErr = Seq(maxErr, math.abs(s.r_sum / n - expR),
        math.abs(s.g_sum / n - expG), math.abs(s.b_sum / n - expB)).max
    }
    info(f"max per-channel mean error across 40 MJPEG AVIs: $maxErr%.2f")
    assert(maxErr < 8.0, f"JPEG loss out of family: $maxErr%.2f")
  }

  test("videoStats flags undecodable or compressed payloads instead of throwing") {
    val junk = Seq(
      MediaRecord(1L, "video", Array[Byte](9, 9, 9), 0, 0, 0L),
      MediaRecord(2L, "video", null, 0, 0, 0L),
      // valid RIFF magic, truncated body
      MediaRecord(3L, "video", "RIFF\u0000\u0000\u0000\u0000AVI ".getBytes("US-ASCII"), 0, 0, 0L)).toDS()
    val out = Multimodal.videoStats(junk).collect()
    assert(out.length == 3 && out.forall(s => !s.decode_ok && s.frames == 0L))
  }

  test("extractFeatures uses the real codec for images, stub elsewhere") {
    val ids = Seq(77L).toDF("id")
    val real = Multimodal.extractFeatures(
      Multimodal.syntheticPngs(spark, ids, "id"), dim = 8).head()
    // uniform color → normalized channel means are exactly color/255
    assert(real.decodeOk)
    assert(math.abs(real.features(0) - (77 % 256) / 255.0f) < 1e-6)
    assert(math.abs(real.features(1) - (77 * 7 % 256) / 255.0f) < 1e-6)
    assert(math.abs(real.features(3) - (77 % 16 + 1).toFloat / (77 % 12 + 1)) < 1e-6)
  }

  test("frameSamplePlan emits every-N-ms plan bounded by duration") {
    val df = Seq((1L, 950L), (2L, 0L)).toDF("media_id", "durationMs")
    val plans = Multimodal.frameSamplePlan(df, everyMs = 300)
      .select("media_id", "frame_ts").as[(Long, Seq[Long])].collect().toMap
    assert(plans(1L) == Seq(0L, 300L, 600L, 900L))
    assert(plans(2L).isEmpty)
  }

  test("withResizeSpec only downscales above maxSide") {
    val df = Seq((1L, 1280, 720), (2L, 100, 50)).toDF("media_id", "width", "height")
    val scales = Multimodal.withResizeSpec(df, maxSide = 640)
      .select("media_id", "resize_scale").as[(Long, Double)].collect().toMap
    assert(scales(1L) == 0.5 && scales(2L) == 1.0)
  }

  test("resizeImages: exact nearest-neighbor source indexing, no-op " +
      "below maxSide, undecodable pass-through") {
    // 4x2 gradient: pixel (x, y) = distinct color x*40 + y*8 in the red
    // channel — nearest-neighbor picks are hand-checkable
    def px(x: Int, y: Int): Int = (x * 40 + y * 8) << 16
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      MediaRecord(1L, "image", bos.toByteArray, 4, 2, 0L),
      MediaRecord(2L, "image", bos.toByteArray, 4, 2, 0L),
      MediaRecord(3L, "image", Array[Byte](9, 9), 0, 0, 0L)).toDS()

    val out = Multimodal.resizeImages(media.filter(col("media_id") === 1L),
      maxSide = 2).collect().head
    assert(out.width == 2 && out.height == 1,
      s"4x2 at maxSide 2 must become 2x1, got ${out.width}x${out.height}")
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    // src x = x*4/2 = {0, 2}; src y = 0*2/1 = 0 — exact picks
    assert((back.getRGB(0, 0) & 0xFFFFFF) == (px(0, 0) & 0xFFFFFF))
    assert((back.getRGB(1, 0) & 0xFFFFFF) == (px(2, 0) & 0xFFFFFF))

    // no-op path: already within maxSide — payload bytes untouched
    val same = Multimodal.resizeImages(media.filter(col("media_id") === 2L),
      maxSide = 8).collect().head
    assert(same.payload.toSeq == bos.toByteArray.toSeq &&
      same.width == 4 && same.height == 2)

    // undecodable: passes through with dims zeroed, never throws
    val bad = Multimodal.resizeImages(media.filter(col("media_id") === 3L),
      maxSide = 2).collect().head
    assert(bad.width == 0 && bad.payload.toSeq == Seq[Byte](9, 9))
  }

  test("decimateAudio keeps exactly every Nth sample; frame sampling " +
      "keeps exactly every Nth frame") {
    // synthetic wav id=9: 19 frames of the closed-form waveform
    // s(i) = ((9*31 + 7i) % 2003 - 1001) * 16; factor 3 keeps i = 0,3,...,18
    val media = Multimodal.syntheticWavs(spark, Seq(9L).toDF("id"), "id")
    val dec = Multimodal.decimateAudio(media, factor = 3)
    val stats = Multimodal.audioStats(dec).collect().head
    def s(i: Int): Long = math.abs(((9L * 31 + 7L * i) % 2003 - 1001) * 16)
    val keptIdx = 0 to 18 by 3
    assert(stats.sample_rate == 8000 / 3 && stats.frames == keptIdx.length)
    assert(stats.sum_abs == keptIdx.map(s).sum)
    assert(stats.max_abs == keptIdx.map(s).max)

    // frame sampling: 5 distinguishable frames, everyN=2 keeps 0,2,4
    val ids = Seq(7L).toDF("id")
    val avi = Multimodal.syntheticAvis(spark, ids, "id") // 7%5+2=4 frames
    val kept = Multimodal.sampleFrames(avi, everyN = 2)
      .collect().sortBy(_.frame_idx)
    assert(kept.map(_.frame_idx).toSeq == Seq(0L, 2L))
    val (w, h) = ((7 % 8 + 2), (7 % 6 + 2))
    kept.foreach { f =>
      assert(f.r_sum == w.toLong * h * ((7 + f.frame_idx) % 256))
    }

    // frame EXTRACTION: emitted payloads are real standalone images the
    // image decoder accepts, with matching dims and per-frame colors
    val frames = Multimodal.extractFrames(avi, everyN = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 2L))
    frames.foreach { vf =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(vf.payload))
      assert(img.getWidth == w && img.getHeight == h)
      val p = img.getRGB(0, 0)
      assert(((p >> 16) & 0xFF) == ((7 + vf.frame_idx) % 256),
        "extracted frame pixel must carry the frame's color")
    }
  }
}
