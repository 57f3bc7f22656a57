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
  * NOT fragment until someone remembers — at every `every`-th CHECKPOINTED
  * batch id the runner compacts closed windows into the z-ordered
  * manifest-covered layout and re-consolidates the root manifest, the open
  * window is never rewritten mid-growth, the cadence survives a restart
  * (r8 verdict #5: it keys off the id Structured Streaming checkpoints,
  * not an in-memory counter), a maintenance cycle runs OFF the trigger
  * thread so a slow compaction never delays ingestion, and a maintenance
  * interrupted at its worst points (stale half-written tmp; window deleted
  * but not yet swapped back in) heals on a later cycle with no rows lost
  * or doubled. */
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

  test("streamed lake self-maintains; cadence survives restart; " +
      "interrupted maintenance heals") {
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

    // ---- 6 windows (batch ids 0-5), maintenance at ids 2 and 4 ----------
    // awaitQuiescent between batches: cycles run on the worker thread and
    // a cadence point reached mid-cycle is SKIPPED (no pileup), so a
    // back-to-back feed would nondeterministically drop the id-4 cycle —
    // the busy-skip itself is asserted in the slow-cycle test below.
    val q = start()
    for (w <- 0 until 6) {
      mem.addData(winRows(w): _*); q.processAllAvailable()
      maint.awaitQuiescent()
    }
    q.stop()

    val wins = new java.io.File(lakePath).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("win=")).sorted
    assert(wins.size == 6, s"expected 6 win= dirs, got $wins")
    // last maintenance ran at batch id 4 with window 4 open: windows 0-3
    // are compact + manifest-covered, windows 4-5 are still raw appends
    for (w <- wins.dropRight(2)) {
      assert(dataFiles(s"$lakePath/$w").size <= 4, s"$w not compacted")
      assert(hasManifest(s"$lakePath/$w"), s"$w lacks a manifest")
    }
    for (w <- wins.takeRight(2))
      assert(!hasManifest(s"$lakePath/$w"),
        s"window $w past the id-4 boundary must not be rewritten")
    // everything is present and correct through the pruning index already
    assert(ZLake.read(spark, lakePath).count() == 6L * rowsPerWin)

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

    // ---- restart: ONE more window (batch id 6) --------------------------
    // The id-based cadence fires IMMEDIATELY (6 % 2 == 0) — the r8
    // in-memory counter, reset by the restart, would have counted this as
    // non-empty batch #1 and skipped it: this single-batch restart IS the
    // durability assertion. Its cycle (boundary win=6) compacts windows
    // 4-5 and heals both interruptions.
    val q2 = start()
    mem.addData(winRows(6): _*); q2.processAllAvailable()
    maint.awaitQuiescent()
    q2.stop()

    assert(new java.io.File(s"$lakePath/$victim").exists(),
      "recovery must swap the completed tmp window back in")
    assert(!stale.exists(), "recovery must discard the stale tmp")
    val winsAfter = new java.io.File(lakePath).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("win=")).sorted
    assert(winsAfter.size == 7, s"expected 7 win= dirs, got $winsAfter")
    for (w <- winsAfter.dropRight(1))
      assert(hasManifest(s"$lakePath/$w"),
        s"$w lacks a manifest after the restart cycle")
    assert(!hasManifest(s"$lakePath/${winsAfter.last}"),
      "the OPEN window must never be rewritten")
    // the root manifest was consolidated at id 6 and covers the whole lake
    // (including window 6's raw appends): planning opens zero footers
    assert(hasManifest(lakePath), "root manifest missing after maintenance")
    val opens0 = ZLake.footerOpens.get()
    assert(ZLake.read(spark, lakePath).count() == 7L * rowsPerWin)
    assert(ZLake.footerOpens.get() == opens0,
      "consolidated lake must plan without footer opens")
    // nothing lost, nothing doubled — through the pruning index AND raw
    val lake = ZLake.read(spark, lakePath)
    val perWin = lake.groupBy("win").count().as[(String, Long)].collect().toMap
    assert(perWin.size == 7 && perWin.values.forall(_ == rowsPerWin.toLong),
      s"maintenance lost or doubled rows: $perWin")
    // pruned read still agrees with the plain scan after the heal
    val pred = col("a") >= 4 && col("a") <= 7
    val got = lake.filter(pred).agg(count(lit(1)), sum("a"), sum("b"))
      .head().toSeq
    val want = spark.read.parquet(lakePath).filter(pred)
      .agg(count(lit(1)), sum("a"), sum("b")).head().toSeq
    assert(got == want)
  }

  test("maintenance with sumCols: compacted windows answer metadata sums") {
    // the streaming lake's maintenance pass forwards the stats-column
    // config to compaction, so windows it compacts serve the same
    // zero-task metadata aggregates a batch-written lake does — the plan
    // over the closed windows is pure LocalRelation, no scan node
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-msum").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-msum-ck").toString
    val lakePath = s"$root/events"
    val mem = MemoryStream[(Long, Long, Long)]
    val maint = StreamRunner.LakeMaintenance(root, Seq("events"), "a", "b",
      every = 2, filesPerPartition = 4, bits = 8, stampCol = "eventTime",
      sumCols = Seq("a", "b"))
    val q = StreamRunner.reportEvery(
        mem.toDS().toDF("a", "b", "tsSec")
          .withColumn("eventTime", timestamp_seconds(col("tsSec"))),
        "0 seconds", ckpt, Some(maint)) { (b: DataFrame, _: Long) =>
      Sinks.lakeAppend(Map("events" -> b.drop("tsSec").repartition(3)),
        root, stampCol = "eventTime")
    }.start()
    for (w <- 0 until 3) {
      mem.addData(winRows(w): _*); q.processAllAvailable()
      maint.awaitQuiescent()
    }
    q.stop()
    // id-2 cycle compacted windows 0-1 with sum manifests; window 2 is
    // open (raw appends) — exclude it the q106/q112 way (win <> open)
    val wins = new java.io.File(lakePath).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("win=")).sorted
      .map(_.stripPrefix("win="))
    assert(wins.size == 3)
    val open = wins.last
    val agg = ZLake.read(spark, lakePath)
      .filter(col("win") =!= open)
      .groupBy("win")
      .agg(count(lit(1)).as("n"), sum("a").as("sa"), sum("b").as("sb"))
    val leaves = agg.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty && leaves.forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      s"expected metadata-only plan over compacted windows:\n$leaves")
    // and the values are the scan's values
    val got = agg.orderBy("win").collect().toSeq.map(_.toSeq)
    val want = spark.read.parquet(lakePath)
      .filter(col("win") =!= open)
      .groupBy("win")
      .agg(count(lit(1)).as("n"), sum("a").as("sa"), sum("b").as("sb"))
      .orderBy("win").collect().toSeq.map(_.toSeq)
    assert(got == want)
  }

  test("a slow maintenance cycle never blocks the trigger thread") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-slow").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-slow-ck").toString
    val lakePath = s"$root/events"
    val mem = MemoryStream[(Long, Long, Long)]
    val maint = StreamRunner.LakeMaintenance(root, Seq("events"), "a", "b",
      every = 2, filesPerPartition = 4, bits = 8, stampCol = "eventTime")

    val started = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val cycles = new java.util.concurrent.atomic.AtomicInteger(0)
    StreamRunner.maintenanceTestHook.set { () =>
      cycles.incrementAndGet()
      started.countDown()
      // park the WORKER: simulates a compaction outliving the interval
      gate.await(60, java.util.concurrent.TimeUnit.SECONDS)
      ()
    }
    try {
      val q = StreamRunner.reportEvery(
          mem.toDS().toDF("a", "b", "tsSec")
            .withColumn("eventTime", timestamp_seconds(col("tsSec"))),
          "0 seconds", ckpt, Some(maint)) { (b: DataFrame, _: Long) =>
        Sinks.lakeAppend(Map("events" -> b.drop("tsSec").repartition(3)),
          root, stampCol = "eventTime")
      }.start()

      // ids 0-2: the id-2 cycle starts and parks on the gate
      for (w <- 0 until 3) { mem.addData(winRows(w): _*); q.processAllAvailable() }
      assert(started.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "maintenance cycle never started")

      // ids 3-4 while the cycle is parked: processAllAvailable RETURNING
      // is the non-blocking proof (a trigger-thread cycle would hang it);
      // id 4 is a cadence point with one in flight — skipped, no pileup
      for (w <- 3 until 5) { mem.addData(winRows(w): _*); q.processAllAvailable() }
      assert(cycles.get() == 1,
        "cadence point during an in-flight cycle must be skipped")
      // ingestion really landed while maintenance was parked
      assert(spark.read.parquet(lakePath).count() == 5L * rowsPerWin)

      gate.countDown()
      maint.awaitQuiescent()
      q.stop()
      // the parked cycle (id 2, boundary window 2) finished its real work
      val wins = new java.io.File(lakePath).listFiles().toSeq
        .map(_.getName).filter(_.startsWith("win=")).sorted
      for (w <- wins.take(2))
        assert(hasManifest(s"$lakePath/$w"), s"$w not compacted after release")
      assert(ZLake.read(spark, lakePath).count() == 5L * rowsPerWin)
    } finally {
      gate.countDown()
      StreamRunner.maintenanceTestHook.set(() => ())
    }
  }
}
