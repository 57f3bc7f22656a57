package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Functions => F}
import graft.sinks.Sinks
import graft.sources.ZLake

/** Per-file BLOOM filters in the write-time manifest: point predicates
  * (`col = 'x'`, `IN`) prune files past what min/max envelopes can do.
  * The fixture makes min/max USELESS on purpose — a high-cardinality id
  * scattered uniformly, so every file's [lo, hi] envelope spans the whole
  * domain and range pruning keeps all 16 files; only the bloom can skip.
  * Soundness rides the bloom's no-false-negative direction (KernelsSpec):
  * a pruned file can hold no matching row, and the answer-equality
  * assertions here prove it end-to-end through `ZLake.read`. */
class BloomPruneSpec extends AnyFunSuite with SparkSpec {

  private val files = 16

  /** 16k rows: z-order keys (a, b); `uid` (string) and `w` (long) are
    * hash-scattered so their per-file envelopes all overlap. */
  private def corpus(): DataFrame =
    spark.range(1 << 14)
      .withColumn("h", F.hash60(col("id").cast("string")))
      .select((col("id") % 128).as("a"), (col("id") / 128 % 128).as("b"),
        concat(lit("u"), (col("h") % 100000).cast("string")).as("uid"),
        (col("h") / 7 % 1000000).cast("long").as("w"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

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

  test("blooms prune files on point predicates where min/max cannot") {
    val path = tmp("bloom")
    Sinks.zorderedWrite(corpus(), "a", "b", path, files, bits = 7,
      bloomCols = Seq("uid", "w"))
    val plain = spark.read.parquet(path)

    // min/max is provably useless here: without blooms this predicate
    // keeps every file (contrast test below); with them, only the files
    // actually holding the uid (+ design-rate false positives) survive
    val uid = plain.select("uid").head().getString(0)
    val idx = ZLake.index(spark, path)
    val pruned = ZLake.readWith(spark, path, idx).filter(col("uid") === uid)
    val got = pruned.agg(count("*"), sum("a"), sum("w")).head().toSeq
    val want = plain.filter(col("uid") === uid)
      .agg(count("*"), sum("a"), sum("w")).head().toSeq
    assert(got == want, "bloom-pruned read changed the answer")
    val n = scanMetric(
      ZLake.readWith(spark, path, idx).filter(col("uid") === uid), "numFiles")
    info(s"present uid: scan read $n/$files files")
    assert(n >= 1 && n <= 6, s"expected a handful of files, got $n")

    // absent key: every file's bloom should refute it (false positives at
    // the design rate only)
    val n0 = scanMetric(ZLake.readWith(spark, path, idx)
      .filter(col("uid") === "nope"), "numFiles")
    info(s"absent uid: scan read $n0/$files files")
    assert(n0 <= 3, s"absent key kept $n0 files")
    assert(ZLake.readWith(spark, path, idx)
      .filter(col("uid") === "nope").count() == 0L)

    // integral rendering path: a long literal probes the bloom the write
    // side built from cast('string') — Long.toString == Spark's cast
    val w = plain.select("w").head().getLong(0)
    val gotW = ZLake.readWith(spark, path, idx).filter(col("w") === w)
      .agg(count("*"), sum("a")).head().toSeq
    val wantW = plain.filter(col("w") === w)
      .agg(count("*"), sum("a")).head().toSeq
    assert(gotW == wantW)
    val nW = scanMetric(
      ZLake.readWith(spark, path, idx).filter(col("w") === w), "numFiles")
    info(s"long point predicate: scan read $nW/$files files")
    assert(nW < files, "long-typed probe never pruned")
  }

  test("no false negatives: IN over many sampled keys loses no rows") {
    val path = tmp("bloomin")
    Sinks.zorderedWrite(corpus(), "a", "b", path, files, bits = 7,
      bloomCols = Seq("uid"))
    val plain = spark.read.parquet(path)
    val sample = plain.select("uid").distinct().orderBy("uid")
      .limit(50).collect().map(_.getString(0)).toSeq
    val idx = ZLake.index(spark, path)
    val pred = col("uid").isin(sample: _*)
    val got = ZLake.readWith(spark, path, idx).filter(pred)
      .orderBy("uid", "a", "b", "w").collect().toSeq
    val want = plain.filter(pred)
      .orderBy("uid", "a", "b", "w").collect().toSeq
    assert(got == want, "IN over bloomed lake lost or changed rows")
    val n = scanMetric(ZLake.readWith(spark, path, idx).filter(pred),
      "numFiles")
    info(s"IN(50 keys): scan read $n/$files files")
  }

  test("without blooms the same predicate keeps every file; unsupported " +
      "literal types keep files (conservative)") {
    val path = tmp("nobloom")
    Sinks.zorderedWrite(corpus(), "a", "b", path, files, bits = 7)
    val plain = spark.read.parquet(path)
    val uid = plain.select("uid").head().getString(0)
    val idx = ZLake.index(spark, path)
    val n = scanMetric(
      ZLake.readWith(spark, path, idx).filter(col("uid") === uid), "numFiles")
    assert(n == files,
      s"min/max alone should keep all $files files on this fixture, kept $n")
  }

  test("consolidated root manifest carries the blooms") {
    val path = tmp("bloomcons")
    Sinks.zorderedWrite(corpus(), "a", "b", path, files, bits = 7,
      bloomCols = Seq("uid"))
    ZLake.consolidateManifests(spark, path)
    val plain = spark.read.parquet(path)
    val uid = plain.select("uid").head().getString(0)
    val idx = ZLake.index(spark, path)
    val n = scanMetric(
      ZLake.readWith(spark, path, idx).filter(col("uid") === uid), "numFiles")
    info(s"post-consolidation: scan read $n/$files files")
    assert(n < files, "consolidation dropped the blooms")
    val got = ZLake.readWith(spark, path, idx).filter(col("uid") === uid)
      .agg(count("*"), sum("a")).head().toSeq
    assert(got == plain.filter(col("uid") === uid)
      .agg(count("*"), sum("a")).head().toSeq)
  }
}
