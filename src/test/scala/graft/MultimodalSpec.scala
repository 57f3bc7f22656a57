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
}
