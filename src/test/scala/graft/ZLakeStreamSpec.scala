package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.ZLake

/** The streaming lake composed with the z-order read path end to end: a
  * live query lands each window's rows through `lakeWrite(zorderBy=...)`,
  * so every `win=` partition carries zorderedWrite's deterministic
  * clustered files plus a stats manifest. The grown lake then reads like
  * the batch z-lake (q96): partition pruning on `win` composes with
  * per-file envelope pruning on BOTH clustered columns, planning touches
  * zero parquet footers, and a crash replayed between sink write and
  * commit converges to one copy of the window (directory overwrite is the
  * idempotency mechanism, exactly as the plain lakeWrite path). */
class ZLakeStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rowsPerWin = 4096 // 64x64 (a, b) grid per window

  /** Window w's rows: a uniform grid over (a, b) — the adversarial case
    * for any single-column sort — stamped inside minute-window w. */
  private def winRows(w: Int): Seq[(Long, Long, Long)] =
    (0 until rowsPerWin).map { i =>
      (i.toLong % 64, i.toLong / 64, w * 60L + i % 50)
    }

  private def scanMetric(df: DataFrame, name: String): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
    scans.map(_.metrics(name).value).sum
  }

  test("streamed z-ordered lake: pruned reads, zero footers, crash-safe") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-zstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-zstream-ck").toString
    val mem = MemoryStream[(Long, Long, Long)]
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val injectCrash = new java.util.concurrent.atomic.AtomicBoolean(false)

    def start() = mem.toDS().toDF("a", "b", "tsSec")
      .withColumn("eventTime", timestamp_seconds(col("tsSec")))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        Sinks.lakeWrite(Map("events" -> b.drop("tsSec")), root,
          stampCol = "eventTime", zorderBy = Some(("a", "b")),
          filesPerWindow = 4, zorderBits = 8,
          sketchCols = Seq("a"), sumCols = Seq("b"))
        if (injectCrash.get() && failOnce.getAndSet(false))
          throw new RuntimeException("crash after sink write, before commit")
        ()
      }.start()

    // batch 0 lands windows 0+1; the batch carrying window 2 CRASHES after
    // its files are on disk; the restarted query replays it (directory
    // rewritten, not doubled) and window 3 follows
    val q1 = start()
    mem.addData(winRows(0) ++ winRows(1): _*); q1.processAllAvailable()
    injectCrash.set(true)
    mem.addData(winRows(2): _*)
    try { q1.processAllAvailable(); q1.stop() }
    catch { case _: Throwable => () }
    assert(!q1.isActive && !failOnce.get(), "crash must have fired")
    injectCrash.set(false)
    val q2 = start()
    mem.addData(winRows(3): _*)
    q2.processAllAvailable(); q2.stop()

    val path = s"$root/events"
    val opensBefore = ZLake.footerOpens.get()
    val idx = ZLake.index(spark, path)
    val lake = ZLake.readWith(spark, path, idx)

    // one copy per window despite the replay, windows intact
    val perWin = lake.groupBy("win").count()
      .as[(String, Long)].collect().toMap
    assert(perWin.size == 4, s"expected 4 win= partitions, got $perWin")
    assert(perWin.values.forall(_ == rowsPerWin.toLong),
      s"crash replay doubled or lost a window: $perWin")
    assert(idx.inputFiles.length == 16, "4 windows x 4 clustered files")

    // the manifests carry everything: planning opened ZERO parquet footers
    assert(ZLake.footerOpens.get() == opensBefore,
      "a manifest-covered streamed lake must plan without footer opens")

    val wins = perWin.keySet.toSeq.sorted
    val plain = spark.read.parquet(path)

    // partition pruning x envelope pruning: one window + a 1/4-range
    // predicate on EACH clustered column keeps ~1 of 16 files
    for (c <- Seq("a", "b")) {
      val pred = col("win") === wins(2) && col(c) >= 16 && col(c) <= 31
      val got = ZLake.readWith(spark, path, idx).filter(pred)
        .agg(count(lit(1)), sum("a"), sum("b")).head().toSeq
      val want = plain.filter(pred)
        .agg(count(lit(1)), sum("a"), sum("b")).head().toSeq
      assert(got == want, s"pruned streamed read changed the answer on $c")
      val numFiles = scanMetric(
        ZLake.readWith(spark, path, idx).filter(pred), "numFiles")
      val (kept, total) = idx.lastPrune.get()
      info(s"win + $c predicate: scan read $numFiles/16 files " +
        s"(index kept $kept/$total)")
      assert(numFiles <= 2,
        s"win x $c pruning kept $numFiles of 16 files — compose failed")
      assert(kept.toLong == numFiles && total == 16)
    }

    // and the whole lake is intact through the index (nothing over-pruned)
    assert(ZLake.readWith(spark, path, idx).count() == 4L * rowsPerWin)

    // streamed windows carry manifest SKETCHES: planning-time approx
    // distinct over any window slice, still zero footer opens (a = 64
    // distinct values per window and overall)
    val opensBeforeSketch = ZLake.footerOpens.get()
    val est = ZLake.approxDistinct(spark, path, "a").get
    assert(est.filesUsed == 16 && est.filesTotal == 16)
    assert(est.estimate > 64 * 0.8 && est.estimate < 64 * 1.25,
      s"streamed-lake sketch estimate off: ${est.estimate} vs 64 true")
    val estWin = ZLake.approxDistinct(spark, path, "a",
      Seq(s"win = '${wins(1)}'")).get
    assert(estWin.filesUsed == 4, s"window slice used ${estWin.filesUsed} files")
    assert(estWin.estimate > 64 * 0.8 && estWin.estimate < 64 * 1.25)
    assert(ZLake.footerOpens.get() == opensBeforeSketch,
      "sketch answers must come from the manifest, not footers")

    // and manifest SUMS: the grouped rollup answers from metadata with
    // zero tasks (every optimized leaf a LocalRelation), scan-identical
    val rollup = ZLake.read(spark, path)
      .groupBy("win").agg(sum("b").as("sb")).orderBy("win")
    assert(rollup.queryExecution.optimizedPlan.collectLeaves().forall {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _ => false
    }, rollup.queryExecution.optimizedPlan.toString)
    val wantRollup = plain.groupBy("win").agg(sum("b").as("sb"))
      .orderBy("win").collect().map(_.toSeq).toSeq
    assert(rollup.collect().map(_.toSeq).toSeq == wantRollup)
  }
}
