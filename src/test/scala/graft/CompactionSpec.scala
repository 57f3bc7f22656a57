package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.ZLake

/** Small-file compaction (`Sinks.compactLake`): an append-grown lake —
  * many tiny files per `win=` partition — rewritten in place into the
  * deterministic z-ordered, manifest-covered layout. Row-identical,
  * pruned-readable with zero footer opens, idempotent, and crash-safe at
  * every step of the atomic swap (the manifest is the completeness
  * marker; recovery is "run it again"). */
class CompactionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val appends = 8
  private val rowsPerAppend = 512 // per window, per append: 8x512 = 64x64 grid

  /** Append-grown lake: `appends` small batches per window, each landing
    * its own files — the streaming-ingest shape compaction exists for. */
  private def growLake(root: String, wins: Seq[Int]): Unit =
    for (a <- 0 until appends) {
      val rows = wins.flatMap { w =>
        (0 until rowsPerAppend).map { i =>
          val g = a * rowsPerAppend + i
          (g.toLong % 64, (g.toLong / 64) % 64, w * 60L + i % 50)
        }
      }
      val df = rows.toDF("a", "b", "tsSec")
        .withColumn("accesstime", timestamp_seconds(col("tsSec")))
        .drop("tsSec").repartition(3) // 3 files per append per window
      Sinks.lakeAppend(Map("events" -> df),
        root.stripSuffix("/events"))
    }

  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
  }

  private def contents(df: DataFrame): Seq[(Long, Long, String)] =
    df.select(col("a"), col("b"), col("win"))
      .as[(Long, Long, String)].collect().sorted.toSeq

  test("compaction: row-identical, few files, manifest-covered pruned reads") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-compact").toString + "/events"
    growLake(root, Seq(0, 1, 2))
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the appends really did fragment the windows
    val win0 = fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(_.startsWith("win=")).sorted
    assert(win0.length == 3)
    val beforeFiles = win0.map(w => fs.listStatus(new Path(root, w))
      .count(_.getPath.getName.endsWith(".parquet")))
    assert(beforeFiles.forall(_ >= appends * 3),
      s"expected >= ${appends * 3} files per window, got ${beforeFiles.toSeq}")
    val before = contents(spark.read.parquet(root))

    val report = Sinks.compactLake(spark, root, "a", "b",
      filesPerPartition = 4, bits = 8)
    assert(report.size == 3, s"3 windows to compact, got $report")
    assert(report.forall(r => !r.recovered && r.filesAfter <= 4
      && r.filesBefore >= appends * 3), s"unexpected report: $report")

    // row-identical through a plain reader AND through ZLake
    assert(contents(spark.read.parquet(root)) == before)
    val opens0 = ZLake.footerOpens.get()
    val idx = ZLake.index(spark, root)
    assert(contents(ZLake.readWith(spark, root, idx)) == before)
    assert(ZLake.footerOpens.get() == opens0,
      "a compacted lake must plan with zero footer opens")

    // partition pruning x envelope pruning on the compacted layout
    val wins = win0.map(_.stripPrefix("win="))
    val pred = col("win") === wins(1) && col("a") >= 16 && col("a") <= 31
    val got = ZLake.readWith(spark, root, idx).filter(pred)
      .agg(count(lit(1)), sum("a"), sum("b")).head().toSeq
    val want = spark.read.parquet(root).filter(pred)
      .agg(count(lit(1)), sum("a"), sum("b")).head().toSeq
    assert(got == want, "pruned compacted read changed the answer")
    val n = scanFiles(ZLake.readWith(spark, root, idx).filter(pred))
    assert(n <= 2, s"win x a pruning kept $n of 12 files")

    // idempotent: a second run finds nothing to do
    assert(Sinks.compactLake(spark, root, "a", "b", 4, 8).isEmpty)
  }

  test("compaction recovery: died between delete and rename -> healed") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-compact-rec").toString + "/events"
    growLake(root, Seq(0, 1))
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val winDirs = fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(_.startsWith("win=")).sorted
    val victim = winDirs.head
    val before = contents(spark.read.parquet(root))

    // simulate: the swap wrote a COMPLETE tmp (manifest present), deleted
    // the old dir, and crashed before the rename
    Sinks.zorderedWrite(
      spark.read.parquet(s"$root/$victim"), "a", "b",
      s"$root/_compacting/$victim", 4, 8)
    // mid-compaction, readers still see the intact lake (tmp is hidden)
    assert(contents(spark.read.parquet(root)) == before)
    assert(contents(ZLake.read(spark, root)) == before)
    require(fs.delete(new Path(root, victim), true))

    val report = Sinks.compactLake(spark, root, "a", "b", 4, 8)
    assert(report.exists(r => r.recovered && r.dir.endsWith(victim)),
      s"expected a recovery entry for $victim in $report")
    assert(contents(spark.read.parquet(root)) == before,
      "recovery lost or duplicated rows")
    assert(!fs.exists(new Path(s"$root/_compacting/$victim")))
  }

  test("compaction recovery: incomplete tmp (no manifest) is discarded") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-compact-inc").toString + "/events"
    growLake(root, Seq(0))
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(_.startsWith("win=")).head
    val before = contents(spark.read.parquet(root))
    // a write that died mid-flight: files but NO manifest
    spark.range(10).select(col("id").as("a"), col("id").as("b"))
      .write.parquet(s"$root/_compacting/$victim")
    assert(!fs.exists(new Path(
      s"$root/_compacting/$victim/${ZLake.ManifestName}")))

    val report = Sinks.compactLake(spark, root, "a", "b", 4, 8)
    // the real dir was fragmented, so it compacts normally — from its OWN
    // rows, never from the junk tmp
    assert(report.forall(r => !r.recovered))
    assert(contents(spark.read.parquet(root)) == before,
      "an incomplete tmp leaked into the lake")
    assert(!fs.exists(new Path(s"$root/_compacting/$victim")),
      "stale tmp must be discarded")
  }
}
