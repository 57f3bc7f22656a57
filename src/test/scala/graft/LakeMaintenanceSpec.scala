package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZLake
import graft.sinks.Sinks
import graft.streaming.StreamRunner

/** Lake maintenance wired into the streaming runner
  * ([[StreamRunner.LakeMaintenance]]): an append-grown streamed lake must
  * NOT fragment until someone remembers — every N batches the runner
  * compacts closed windows into the z-ordered manifest-covered layout and
  * re-consolidates the root manifest, the open window is never rewritten
  * mid-growth, and a maintenance interrupted at its worst points (stale
  * half-written tmp; window deleted but not yet swapped back in) heals on
  * the next cycle with no rows lost or doubled. */
class LakeMaintenanceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rowsPerWin = 256

  /** Window w's rows: a 16x16 (a, b) grid stamped inside minute-window w. */
  private def winRows(w: Int): Seq[(Long, Long, Long)] =
    (0 until rowsPerWin).map(i => (i.toLong % 16, i.toLong / 16, w * 60L + i % 50))

  private def dataFiles(path: String): Seq[String] =
    Option(new java.io.File(path).listFiles()).map(_.toSeq.map(_.getName))
      .getOrElse(Nil)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith("."))

  private def hasManifest(path: String): Boolean =
    new java.io.File(path, ZLake.ManifestName).exists()

  test("streamed lake self-maintains; interrupted maintenance heals") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-maint").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-maint-ck").toString
    val lakePath = s"$root/events"
    val mem = MemoryStream[(Long, Long, Long)]
    val maint = StreamRunner.LakeMaintenance(root, Seq("events"), "a", "b",
      every = 2, filesPerPartition = 4, bits = 8, stampCol = "eventTime")

    def start() = StreamRunner.reportEvery(
        mem.toDS().toDF("a", "b", "tsSec")
          .withColumn("eventTime", timestamp_seconds(col("tsSec"))),
        "0 seconds", ckpt, Some(maint)) { (b: DataFrame, _: Long) =>
      // land FRAGMENTED: 3 files per window per batch, no manifest — the
      // ingest-fast shape compaction exists to clean up behind
      Sinks.lakeAppend(Map("events" -> b.drop("tsSec").repartition(3)),
        root, stampCol = "eventTime")
    }.start()

    // ---- 6 windows, maintenance on every 2nd batch ----------------------
    val q = start()
    for (w <- 0 until 6) { mem.addData(winRows(w): _*); q.processAllAvailable() }
    q.stop()

    val wins = new java.io.File(lakePath).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("win=")).sorted
    assert(wins.size == 6, s"expected 6 win= dirs, got $wins")
    // last maintenance ran on batch 5 with window 5 open: windows 0-4 are
    // compact + manifest-covered, window 5 is still raw appends
    for (w <- wins.dropRight(1)) {
      assert(dataFiles(s"$lakePath/$w").size <= 4, s"$w not compacted")
      assert(hasManifest(s"$lakePath/$w"), s"$w lacks a manifest")
    }
    assert(!hasManifest(s"$lakePath/${wins.last}"),
      "the OPEN window must not be rewritten mid-growth")
    // the root manifest was consolidated and covers the whole lake:
    // planning opens zero parquet footers even for the raw open window
    assert(hasManifest(lakePath), "root manifest missing after maintenance")
    val opens0 = ZLake.footerOpens.get()
    assert(ZLake.read(spark, lakePath).count() == 6L * rowsPerWin)
    assert(ZLake.footerOpens.get() == opens0,
      "consolidated lake must plan without footer opens")

    // ---- interrupt maintenance at its two worst points ------------------
    val fs = new java.io.File(s"$lakePath/_compacting")
    // (a) stale half-written tmp (crash mid-rewrite, no manifest): discard
    val stale = new java.io.File(fs, wins.head)
    assert(stale.mkdirs())
    java.nio.file.Files.writeString(
      stale.toPath.resolve("part-junk.parquet"), "not parquet")
    // (b) crash between delete and rename: a COMPLETE compacted window
    // (manifest present) sits under _compacting/, its final dir gone
    val victim = wins(1)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$lakePath/$victim"),
      fs.toPath.resolve(victim))
    assert(!new java.io.File(s"$lakePath/$victim").exists())

    // ---- restart: two more windows; maintenance at batch 7 heals --------
    val q2 = start()
    for (w <- 6 until 8) { mem.addData(winRows(w): _*); q2.processAllAvailable() }
    q2.stop()

    assert(new java.io.File(s"$lakePath/$victim").exists(),
      "recovery must swap the completed tmp window back in")
    assert(!stale.exists(), "recovery must discard the stale tmp")
    // nothing lost, nothing doubled — through the pruning index AND raw
    val lake = ZLake.read(spark, lakePath)
    assert(lake.count() == 8L * rowsPerWin)
    val perWin = lake.groupBy("win").count().as[(String, Long)].collect().toMap
    assert(perWin.size == 8 && perWin.values.forall(_ == rowsPerWin.toLong),
      s"maintenance lost or doubled rows: $perWin")
    // pruned read still agrees with the plain scan after the heal
    val pred = col("a") >= 4 && col("a") <= 7
    val got = lake.filter(pred).agg(count(lit(1)), sum("a"), sum("b"))
      .head().toSeq
    val want = spark.read.parquet(lakePath).filter(pred)
      .agg(count(lit(1)), sum("a"), sum("b")).head().toSeq
    assert(got == want)
  }
}
