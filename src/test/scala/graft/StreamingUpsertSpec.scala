package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.ZLake
import graft.streaming.StreamRunner

/** Streaming CDC upsert ([[StreamRunner.upsertStream]]): micro-batches of
  * keyed updates merge into the z-lake exactly once — a crash injected
  * after the merge but before the epoch commit replays the batch, and the
  * merge's own delete-then-insert algebra converges to one row per key. */
class StreamingUpsertSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("win", StringType)))

  private def initialLake(root: String): Unit = {
    val snap = spark.range(100).select(
      col("id"), concat(lit("v0-"), col("id")).as("v"))
    for (w <- 0 to 1)
      Sinks.zorderedWrite(snap.filter(col("id") % 2 === w),
        "id", "id", s"$root/win=$w", numFiles = 2, bits = 8,
        bloomCols = Seq("id"))
  }

  private def writeBatch(dir: String, name: String,
                         rows: Seq[(Long, String)]): Unit = {
    // the file source does not recurse into non-partition subdirs: write
    // the batch as ONE parquet file directly in the stream directory
    val tmp = java.nio.file.Files.createTempDirectory("graft-sups-b").toString
    rows.map { case (id, v) => (id, v, (id % 2).toString) }
      .toDF("id", "v", "win")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, s"$name.parquet"))
    ()
  }

  test("streamed merges land exactly once across a crash-replay") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sups").toString + "/t"
    val inDir = java.nio.file.Files
      .createTempDirectory("graft-sups-in").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sups-ck").toString
    initialLake(root)

    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    StreamRunner.upsertTestHook.set(() =>
      if (failOnce.getAndSet(false))
        throw new RuntimeException("crash after merge, before commit"))
    def start() = StreamRunner.upsertStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir),
      root, "id", ckpt, interval = "0 seconds").start()

    // batch 1: update two existing keys, insert one new — clean commit
    writeBatch(inDir, "b1", Seq((10L, "v1-10"), (11L, "v1-11"),
      (200L, "v1-200")))
    val q1 = start()
    q1.processAllAvailable()
    // batch 2: re-update key 10, insert another new key — CRASH after the
    // merge lands but before the epoch commits
    failOnce.set(true)
    writeBatch(inDir, "b2", Seq((10L, "v2-10"), (201L, "v2-201")))
    try { q1.processAllAvailable(); q1.stop() }
    catch { case _: Throwable => () }
    assert(!q1.isActive && !failOnce.get(), "crash must have fired")

    val q2 = start() // same checkpoint: batch 2 replays over the merged lake
    try q2.processAllAvailable() finally q2.stop()
    StreamRunner.upsertTestHook.set(() => ())

    val got = ZLake.read(spark, root).select(col("id"), col("v"))
      .as[(Long, String)].collect()
    // exactly one row per key, despite batch 2 running twice
    assert(got.length == 102, s"row count ${got.length}")
    val byId = got.toMap
    assert(byId.size == 102, "duplicate keys after replay")
    assert(byId(10L) == "v2-10")   // replay converged to the latest value
    assert(byId(11L) == "v1-11")
    assert(byId(200L) == "v1-200")
    assert(byId(201L) == "v2-201") // the crashed batch's insert: one copy
    assert(byId(12L) == "v0-12")   // untouched snapshot rows intact
  }
}
