package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.ZLake

/** Date/timestamp envelopes: annotated TIMESTAMP/DATE parquet columns now
  * carry exact file envelopes (Spark's internal values ARE the raw int64
  * micros / int32 days), so the canonical lake queries work on real time
  * columns — range pruning (`ts BETWEEN`), latest-events top-k
  * (`ORDER BY ts DESC LIMIT k`), and zero-scan `min`/`max`(ts). Files
  * written under LEGACY julian rebase carry Spark's marker and get NO
  * date-time envelope — conservative, never wrong. */
class TimeEnvelopeSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  /** 2^13 rows over ~2.3 hours; ts is a real TimestampType column, d a
    * DateType column spanning ~23 days. */
  private def timeLake(): String = {
    val path = tmp("tlake")
    val df = spark.range(1 << 13).select(col("id"),
      timestamp_seconds(col("id")).as("ts"),
      date_add(lit("2026-01-01").cast("date"), (col("id") / 360).cast("int"))
        .as("d"),
      (col("id") % 97).as("v"))
    Sinks.zorderedWrite(df, "id", "v", path, numFiles = 8, bits = 13)
    path
  }

  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    scans.map(_.metrics("numFiles").value).sum
  }

  test("timestamp range predicate prunes files; rows identical") {
    val path = timeLake()
    val idx = ZLake.index(spark, path)
    assert(idx.fes.forall(_.cols.contains("ts")), "ts envelopes missing")
    assert(idx.fes.forall(_.cols.contains("d")), "date envelopes missing")
    val pred = col("ts") >= timestamp_seconds(lit(6000)) &&
      col("ts") < timestamp_seconds(lit(7000))
    val pruned = ZLake.readWith(spark, path, idx).filter(pred)
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val got = pruned.head().toSeq
    val want = spark.read.parquet(path).filter(pred)
      .agg(count(lit(1)).as("n"), sum("v").as("sv")).head().toSeq
    assert(got == want)
    val files = scanFiles(
      ZLake.readWith(spark, path, idx).filter(pred).select("id"))
    assert(files < 8, s"time-range pruning kept $files/8 files")
  }

  test("latest-events top-k: ORDER BY ts DESC LIMIT k prunes + matches") {
    val path = timeLake()
    val pruned = ZLake.read(spark, path)
      .orderBy(col("ts").desc, col("id")).limit(50)
    val files = scanFiles(pruned)
    val want = spark.read.parquet(path)
      .orderBy(col("ts").desc, col("id")).limit(50).collect()
    assert(pruned.collect().toSeq == want.toSeq)
    assert(files < 8, s"latest-events top-k scanned $files/8")
  }

  test("zero-scan min/max over timestamp and date columns") {
    val path = timeLake()
    val df = ZLake.read(spark, path)
      .agg(min("ts").as("lo"), max("ts").as("hi"),
        min("d").as("dlo"), max("d").as("dhi"))
    assert(df.queryExecution.optimizedPlan.collectLeaves().forall {
      case _: LocalRelation => true
      case _ => false
    }, df.queryExecution.optimizedPlan.toString)
    assert(df.head().toSeq ==
      spark.read.parquet(path)
        .agg(min("ts"), max("ts"), min("d"), max("d")).head().toSeq)
  }

  test("TIMESTAMP(MILLIS) files get no envelope: raw stats are not micros") {
    // Spark converts millis to micros on read, so raw millis stats are
    // 1000x off the internal values — an envelope from them would prune
    // files that hold matching rows. Flink/Hive/Connect write MILLIS.
    val path = tmp("tmillis")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try spark.range(1000).select(col("id"),
        timestamp_seconds(col("id")).as("ts"), (col("id") % 7).as("v"))
      .write.parquet(path)
    finally spark.conf.set(
      "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val fes = ZLake.envelopes(spark, path)
    assert(fes.nonEmpty)
    assert(fes.forall(!_.cols.contains("ts")),
      "MILLIS-unit files must carry no timestamp envelope")
    val pred = col("ts") >= timestamp_seconds(lit(500))
    assert(ZLake.read(spark, path).filter(pred).count() ==
      spark.read.parquet(path).filter(pred).count())
  }

  test("LEGACY-rebase files get no date-time envelope, reads stay correct") {
    val path = tmp("tlegacy")
    spark.conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "LEGACY")
    try spark.range(1000).select(col("id"),
        timestamp_seconds(col("id")).as("ts"), (col("id") % 7).as("v"))
      .write.parquet(path)
    finally spark.conf.unset("spark.sql.parquet.datetimeRebaseModeInWrite")
    val fes = ZLake.envelopes(spark, path)
    assert(fes.nonEmpty)
    assert(fes.forall(!_.cols.contains("ts")),
      "legacy-rebase files must carry no timestamp envelope")
    assert(fes.forall(_.cols.contains("id")),
      "plain integral envelopes unaffected by the rebase marker")
    // conservative: the range read keeps every file and stays correct
    val pred = col("ts") >= timestamp_seconds(lit(500))
    val got = ZLake.read(spark, path).filter(pred).count()
    assert(got == spark.read.parquet(path).filter(pred).count())
  }
}
