package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KernelAggs
import graft.sinks.Sinks

/** The incremental-sketch-lake story end to end: a live query streams
  * per-window sketch PARTIALS into the lake (idempotent `lakeWrite`,
  * window stamp = idempotency key), survives a crash injected AFTER the
  * sink write but BEFORE the commit (the replayed epoch overwrites, never
  * doubles), and the lake's partials roll up with `sketch_merge_*` to
  * sketches bit-identical to a single batch sweep of every event — the
  * "incremental distinct-count / heavy-hitters / membership over a growing
  * lake" pattern at 100 TB: each 5-minute window pays one small write, and
  * any time range is answerable later by merging fixed-size partials
  * instead of rescanning events. */
class SketchLakeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("crash-surviving sketch lake rolls up to the exact batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val (m, d, w, bits, hashes) = (16, 2, 16, 1024, 3)
    val root = java.nio.file.Files.createTempDirectory("graft-sklake").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sklake-ck").toString

    // 600 events over four 60 s windows, duplicate-heavy keys
    val rows = (0 until 600).map(i => ((i * 13 % 97).toLong, (i / 150) * 60L + i % 50))
    val mem = MemoryStream[(Long, Long)]
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val injectCrash = new java.util.concurrent.atomic.AtomicBoolean(false)

    def start() = mem.toDS().toDF("userId", "tsSec")
      .withColumn("eventTime", timestamp_seconds(col("tsSec")))
      .groupBy(window(col("eventTime"), "60 seconds").as("win"))
      .agg(
        KernelAggs.hll_registers(col("userId").cast("string"), m).as("hll"),
        KernelAggs.cms_sketch((col("userId") % 7).cast("string"), d, w).as("cms"),
        KernelAggs.bloom_sketch(col("userId").cast("string"), bits, hashes).as("bloom"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val partials = b.select(col("win.start").as("wstart"),
          col("hll"), col("cms"), col("bloom"))
        Sinks.lakeWrite(Map("sketches" -> partials), root, stampCol = "wstart")
        if (injectCrash.get() && failOnce.getAndSet(false))
          throw new RuntimeException("crash after sink write, before commit")
        ()
      }.start()

    // batch 0 lands windows 0+1; batch 1 CRASHES after writing window 2
    val q1 = start()
    mem.addData(rows.take(300): _*); q1.processAllAvailable()
    injectCrash.set(true)
    mem.addData(rows.slice(300, 450): _*)
    try { q1.processAllAvailable(); q1.stop() }
    catch { case _: Throwable => () }
    assert(!q1.isActive && !failOnce.get(), "crash must have fired")
    injectCrash.set(false)

    // restart from the checkpoint: the crashed epoch replays (idempotent
    // overwrite), then the rest of the data streams in
    val q2 = start()
    q2.processAllAvailable()
    mem.addData(rows.drop(450): _*)
    try q2.processAllAvailable() finally q2.stop()

    val lake = spark.read.parquet(s"$root/sketches")
    // exactly-once: one partial row per window, four windows, no doubles
    assert(lake.count() == 4, s"lake rows: ${lake.count()} (replay doubled?)")
    assert(lake.select("win").distinct().count() == 4)

    // roll up across windows: max for HLL registers, sum for CMS cells,
    // OR for bloom bits — and compare against ONE batch sweep of all rows
    val merged = lake.agg(
        KernelAggs.sketch_merge_max(col("hll")).as("hll"),
        KernelAggs.sketch_merge_sum(col("cms")).as("cms"),
        KernelAggs.sketch_merge_or(col("bloom")).as("bloom"))
      .as[(Seq[Long], Seq[Long], Seq[Long])].head()
    val batch = rows.toDF("userId", "tsSec").agg(
        KernelAggs.hll_registers(col("userId").cast("string"), m).as("hll"),
        KernelAggs.cms_sketch((col("userId") % 7).cast("string"), d, w).as("cms"),
        KernelAggs.bloom_sketch(col("userId").cast("string"), bits, hashes).as("bloom"))
      .as[(Seq[Long], Seq[Long], Seq[Long])].head()
    assert(merged._1 == batch._1, "merged HLL registers != batch sketch")
    assert(merged._2 == batch._2, "merged CMS cells != batch sketch")
    assert(merged._3 == batch._3, "merged bloom bits != batch sketch")
  }
}
