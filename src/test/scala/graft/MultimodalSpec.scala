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
