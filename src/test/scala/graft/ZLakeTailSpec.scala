package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks

/** [[graft.sources.ZLakeTail]]: the z-lake as a streaming source. Append
  * growth emits each file's rows exactly once (including across a
  * checkpoint restart); maintenance under the tail fails loudly by
  * default and degrades to the documented at-least-once under
  * ignoreChanges; startingOffset=latest swallows pre-existing contents. */
class ZLakeTailSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def writeWin(root: String, w: Int, n: Int, tag: Long = 0L): Unit =
    Sinks.zorderedWrite(
      spark.range(n).select((col("id") + w * 10000).as("k"),
        (col("id") % 64 + tag).as("v")),
      "k", "v", s"$root/win=$w", numFiles = 2, bits = 6)

  /** Collected (k, v, win) triples, deduplicated nowhere — duplicates are
    * the failure this spec hunts. */
  private final class Collector {
    val rows = mutable.ArrayBuffer.empty[(Long, Long, String)]
    def sink(b: DataFrame, id: Long): Unit = {
      val got = b.select(col("k"), col("v"), col("win")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      rows.synchronized { rows ++= got }
      ()
    }
  }

  private def startTail(root: String, ckpt: String, c: Collector,
                        extra: Map[String, String] = Map.empty) = {
    val r = spark.readStream.format("zlake").options(extra).load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch((b: DataFrame, id: Long) => c.sink(b, id))
    r.start()
  }

  test("append growth emits each file exactly once, restart included") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tail-ck").toString
    writeWin(root, 0, 100)

    val c = new Collector
    val q1 = startTail(root, ckpt, c)
    q1.processAllAvailable()
    assert(c.rows.size === 100)
    assert(c.rows.forall(_._3 == "0"))

    writeWin(root, 1, 50)
    q1.processAllAvailable()
    assert(c.rows.size === 150)
    assert(c.rows.count(_._3 == "1") === 50)
    q1.stop()

    // growth while the stream is DOWN, then a checkpoint restart: only
    // the new window arrives, nothing replays
    writeWin(root, 2, 30)
    val q2 = startTail(root, ckpt, c)
    q2.processAllAvailable()
    q2.stop()
    assert(c.rows.size === 180)
    assert(c.rows.groupBy(identity).forall(_._2.size == 1),
      "every (k, v, win) must arrive exactly once")
    assert(c.rows.map(_._1).sum ===
      (0L until 100).sum + (10000L until 10050).sum + (20000L until 20030).sum)
  }

  test("a rewrite under the tail aborts with guidance by default") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail-rw").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tail-rw-ck").toString
    writeWin(root, 0, 40)
    val c = new Collector
    val q = startTail(root, ckpt, c)
    q.processAllAvailable()
    assert(c.rows.size === 40)
    // stop BEFORE the rewrite: a live continuous trigger can race the
    // in-place file swap into a raw FileNotFound mid-read (still an
    // abort, but not the deterministic guided one this test pins)
    q.stop()

    writeWin(root, 0, 40, tag = 1L) // same dir, new identities = compaction
    val q2 = startTail(root, ckpt, c)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(30000)
    }
    assert(e.getMessage.contains("ignoreChanges") ||
      Option(e.getCause).exists(_.getMessage.contains("ignoreChanges")))
    q2.stop()
  }

  test("ignoreChanges re-emits a rewritten file (documented at-least-once)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail-ic").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tail-ic-ck").toString
    writeWin(root, 0, 40)
    val c = new Collector
    val q = startTail(root, ckpt, c, Map("ignoreChanges" -> "true"))
    q.processAllAvailable()
    assert(c.rows.size === 40)
    assert(c.rows.forall(_._2 < 64))

    writeWin(root, 0, 40, tag = 100L)
    q.processAllAvailable()
    q.stop()
    // the rewrite re-emitted: old rows stay collected, new rows arrive
    assert(c.rows.size === 80)
    assert(c.rows.count(_._2 >= 100) === 40)
  }

  test("a delete aborts by default and is invisible under ignoreDeletes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail-del").toString + "/t"
    writeWin(root, 0, 40)
    writeWin(root, 1, 40)

    // default: loud abort
    val ck1 = java.nio.file.Files
      .createTempDirectory("graft-tail-del-ck1").toString
    val c1 = new Collector
    val q1 = startTail(root, ck1, c1)
    q1.processAllAvailable()
    assert(c1.rows.size === 80)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/win=1"), true)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination(30000)
    }
    assert(e.getMessage.contains("ignoreDeletes") ||
      Option(e.getCause).exists(_.getMessage.contains("ignoreDeletes")))
    q1.stop()

    // opt-in: the delete is simply invisible; later appends still arrive
    val ck2 = java.nio.file.Files
      .createTempDirectory("graft-tail-del-ck2").toString
    val c2 = new Collector
    val q2 = startTail(root, ck2, c2, Map("ignoreDeletes" -> "true"))
    q2.processAllAvailable()
    assert(c2.rows.size === 40)
    writeWin(root, 2, 10)
    q2.processAllAvailable()
    q2.stop()
    assert(c2.rows.size === 50)
  }

  test("discovery is a manifest read: zero parquet footers per trigger") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail-foot").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tail-foot-ck").toString
    for (w <- 0 until 8) writeWin(root, w, 20)
    graft.sources.ZLake.consolidateManifests(spark, root)
    val c = new Collector
    val q = startTail(root, ckpt, c)
    q.processAllAvailable() // bootstrap drains all 8 windows
    writeWin(root, 8, 20) // write-time manifest pass opens footers; the
    val before = graft.sources.ZLake.footerOpens.get() // TAIL must not
    q.processAllAvailable() // discovery + read of the new window
    q.stop()
    assert(c.rows.size === 180)
    // the new window has its own sidecar manifest; everything else is
    // covered by the consolidated root manifest — the incremental
    // trigger opened NO parquet footer anywhere in discovery or planning
    assert(graft.sources.ZLake.footerOpens.get() === before,
      "tail trigger opened parquet footers despite manifest coverage")
  }

  test("latest over an EMPTY lake anchors its baseline at stream start") {
    // review-caught hole: without an eager baseline, the first files ever
    // written would be swallowed as a late 'pre-existing contents' batch
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail-empty").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tail-empty-ck").toString
    new java.io.File(root).mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("win",
        org.apache.spark.sql.types.StringType)))
    val c = new Collector
    val q = spark.readStream.format("zlake").schema(schema)
      .option("startingOffset", "latest").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch((b: DataFrame, id: Long) => c.sink(b, id))
      .start()
    q.processAllAvailable() // baseline pinned over the empty lake
    writeWin(root, 0, 30)   // the FIRST data ever — post-start, must emit
    q.processAllAvailable()
    q.stop()
    assert(c.rows.size === 30,
      "files written after a latest-start over an empty lake were swallowed")
  }

  test("maxFilesPerTrigger splits a bootstrap into bounded batches") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail-rate").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tail-rate-ck").toString
    for (w <- 0 until 3) writeWin(root, w, 20) // 3 windows x 2 files
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val c = new Collector
    val q = spark.readStream.format("zlake")
      .option("maxFilesPerTrigger", "1").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val n = b.count()
        if (n > 0) batches.synchronized { batches += n }
        c.sink(b, id)
      }.start()
    q.processAllAvailable()
    q.stop()
    // 6 files, 1 per batch: six non-empty epochs, every row exactly once
    assert(batches.size === 6, s"expected 6 rate-limited batches: $batches")
    assert(c.rows.size === 60)
    assert(c.rows.groupBy(identity).forall(_._2.size == 1))
  }

  test("maxBytesPerTrigger bounds each batch by cumulative file length") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail-bytes").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tail-bytes-ck").toString
    for (w <- 0 until 3) writeWin(root, w, 20) // 3 windows x 2 files
    val lens = graft.sources.ZLake.envelopes(spark, root)
      .map(_.status.getLen)
    assert(lens.size === 6)
    // budget of ~1.5 files: every non-baseline batch must pin exactly one
    // file (two would cross the cap), and a single file over the cap
    // would still drain alone
    val cap = (lens.min * 3) / 2
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val c = new Collector
    val q = spark.readStream.format("zlake")
      .option("maxBytesPerTrigger", cap.toString).load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val n = b.count()
        if (n > 0) batches.synchronized { batches += n }
        c.sink(b, id)
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(batches.size === 6,
      s"expected 6 byte-bounded batches of one file each: $batches")
    assert(c.rows.size === 60)
    assert(c.rows.groupBy(identity).forall(_._2.size == 1),
      "byte-bounded drain must still be exactly-once")
  }

  test("startingOffset=latest tails only post-start commits") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail-latest").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tail-latest-ck").toString
    writeWin(root, 0, 100)
    val c = new Collector
    val q = startTail(root, ckpt, c, Map("startingOffset" -> "latest"))
    q.processAllAvailable()
    assert(c.rows.isEmpty, "pre-existing contents must not emit")
    writeWin(root, 1, 25)
    q.processAllAvailable()
    q.stop()
    assert(c.rows.size === 25)
    assert(c.rows.forall(_._3 == "1"))

    // the swallowed baseline is durable: a restart must not emit win=0
    val c2 = new Collector
    val q2 = startTail(root, ckpt, c2, Map("startingOffset" -> "latest"))
    q2.processAllAvailable()
    q2.stop()
    assert(c2.rows.isEmpty)
  }

  test("streaming aggregate over the tail keeps its state: ManifestAggs " +
      "must not answer a streaming plan from the manifest") {
    // r9 advice (high): the tail's batches plan as StatsFileIndex
    // relations — the exact shape ManifestAggs rewrites for BATCH reads.
    // Rewriting the STREAMING Aggregate to a LocalRelation would erase
    // StateStore planning and emit per-batch manifest counts instead of
    // accumulated totals. complete-mode groupBy(partition col).count()
    // over a growing lake is the canonical victim.
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail-agg").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tail-agg-ck").toString
    writeWin(root, 0, 100)
    val q = spark.readStream.format("zlake").load(root)
      .groupBy(col("win")).count()
      .writeStream.outputMode("complete").format("memory")
      .queryName("tail_agg").option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    writeWin(root, 1, 50)
    q.processAllAvailable()
    val got = spark.table("tail_agg").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    // accumulated across both triggers — NOT the second batch's counts
    assert(got === Map("0" -> 100L, "1" -> 50L),
      s"streaming aggregate lost state to a manifest rewrite: $got")

    // and the SAME aggregate over the BATCH read still manifest-answers
    // (the guard must not disable the batch lane)
    val batchPlan = graft.sources.ZLake.read(spark, root)
      .groupBy(col("win")).count()
    val optimized = batchPlan.queryExecution.optimizedPlan
    assert(optimized.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"batch manifest-agg lane regressed:\n$optimized")
  }
}
