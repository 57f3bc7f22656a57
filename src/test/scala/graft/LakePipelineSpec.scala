package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{MaterializedAgg, Sinks}
import graft.sinks.MaterializedAgg.Spec

/** The standing lake→view pipeline end to end: an append-grown z-lake
  * tailed by [[graft.sources.ZLakeTail]] feeds
  * [[MaterializedAgg.maintain]] — batches discovered from manifests,
  * pinned in the source log, merged into the serving view behind the
  * commit fence. Growth while the stream is live, growth while it is
  * DOWN, and a checkpoint restart must all land every fact exactly once
  * in the view. */
class LakePipelineSpec extends AnyFunSuite with SparkSpec {

  test("tail -> materialized view: exactly-once across growth and restart") {
    val facts = java.nio.file.Files
      .createTempDirectory("graft-pipe-facts").toString + "/events"
    val view = java.nio.file.Files
      .createTempDirectory("graft-pipe-view").toString + "/mv"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-pipe-ck").toString

    def winRows(w: Int): DataFrame = spark.range(w * 500, (w + 1) * 500)
      .select(col("id"),
        concat(lit("g"), (col("id") % 7).cast("string")).as("g"),
        (col("id") % 1009).as("v"))
    def writeWin(w: Int): Unit = Sinks.zorderedWrite(winRows(w),
      "id", "v", s"$facts/win=$w", numFiles = 2, bits = 8)

    val spec = Spec(groupCols = Seq("g"), sumCols = Seq("v"))
    def start() = MaterializedAgg.maintain(
      spark.readStream.format("zlake").load(facts)
        .select(col("g"), col("v")),
      view, spec, ckpt, interval = "1 second").start()
    def viewRows: Seq[(String, Long, Long)] =
      MaterializedAgg.readView(spark, view, spec).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    def recompute(upTo: Int): Seq[(String, Long, Long)] =
      (0 to upTo).map(winRows).reduce(_ union _)
        .groupBy("g").agg(count(lit(1)).as("cnt"), sum("v").as("v_sum"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)

    writeWin(0)
    val q1 = start()
    q1.processAllAvailable()
    assert(viewRows == recompute(0), "bootstrap window diverged")

    writeWin(1) // growth under the live stream
    q1.processAllAvailable()
    q1.stop()
    assert(viewRows == recompute(1), "live growth diverged")

    writeWin(2) // growth while the pipeline is DOWN
    val q2 = start()
    q2.processAllAvailable()
    writeWin(3)
    q2.processAllAvailable()
    q2.stop()
    assert(viewRows == recompute(3),
      "restarted pipeline lost or double-counted a window")
  }
}
