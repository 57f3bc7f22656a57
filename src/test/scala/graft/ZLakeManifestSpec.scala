package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.ZLake

/** Write-time stats manifests: [[Sinks.zorderedWrite]] persists per-file
  * envelopes + the data schema beside the data, so a [[ZLake.read]] over a
  * covered lake plans with ZERO parquet footer opens — the per-query
  * driver-side footer sweep was the 100 TB planning bottleneck. Counted via
  * the harvest counter, not inferred. */
class ZLakeManifestSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def data() = spark.range(4000)
    .select((col("id") % 64).as("a"), (col("id") / 64 % 64).as("b"),
      col("id").as("payload"))

  test("manifest-covered read opens ZERO parquet footers") {
    val path = tmp("zman")
    Sinks.zorderedWrite(data(), "a", "b", path, numFiles = 8, bits = 6)
    val before = ZLake.footerOpens.get()
    val df = ZLake.read(spark, path).filter(col("a").between(8, 15))
    val got = df.agg(count(lit(1)), sum("payload")).head().toSeq
    assert(ZLake.footerOpens.get() == before,
      s"read opened ${ZLake.footerOpens.get() - before} footers despite manifest")
    val want = spark.read.parquet(path).filter(col("a").between(8, 15))
      .agg(count(lit(1)), sum("payload")).head().toSeq
    assert(got == want)
    // schema rides the manifest too (names, order, types)
    assert(df.schema.fieldNames.toSeq == Seq("a", "b", "payload"))
  }

  test("no manifest: read falls back to footer harvest and stays correct") {
    val path = tmp("zplain")
    data().repartition(4).write.parquet(path) // foreign writer, no sidecar
    val before = ZLake.footerOpens.get()
    val got = ZLake.read(spark, path).agg(sum("payload")).head().getLong(0)
    assert(ZLake.footerOpens.get() > before, "fallback should harvest footers")
    assert(got == spark.read.parquet(path).agg(sum("payload")).head().getLong(0))
    // writing the sidecar afterwards re-covers the lake
    ZLake.writeManifest(spark, path)
    val after = ZLake.footerOpens.get()
    ZLake.read(spark, path).agg(sum("payload")).head()
    assert(ZLake.footerOpens.get() == after, "manifested lake re-opened footers")
  }

  test("files a manifest does not cover fall back per-file") {
    val path = tmp("zmixed")
    Sinks.zorderedWrite(data(), "a", "b", path, numFiles = 4, bits = 6)
    // a foreign append the sidecar knows nothing about
    spark.range(4000, 4100)
      .select((col("id") % 64).as("a"), (col("id") / 64 % 64).as("b"),
        col("id").as("payload"))
      .coalesce(1).write.mode("append").parquet(path)
    val before = ZLake.footerOpens.get()
    val got = ZLake.read(spark, path).agg(count(lit(1)), sum("payload"))
      .head().toSeq
    val opened = ZLake.footerOpens.get() - before
    // exactly the uncovered file's footer (+1 for the fallback schema read)
    assert(opened <= 2, s"expected at most 2 footer opens, got $opened")
    val want = spark.read.parquet(path).agg(count(lit(1)), sum("payload"))
      .head().toSeq
    assert(got == want, "mixed-coverage lake changed the answer")
  }

  test("consolidated root manifest: one driver read covers every partition") {
    val root = tmp("zcons")
    for (w <- 1 to 3)
      Sinks.zorderedWrite(data(), "a", "b", s"$root/win=w$w", 4, bits = 6)
    ZLake.consolidateManifests(spark, root)
    // delete the per-dir sidecars: the ROOT manifest alone must cover
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (w <- 1 to 3)
      require(fs.delete(new org.apache.hadoop.fs.Path(
        s"$root/win=w$w/${ZLake.ManifestName}"), false))
    val before = ZLake.footerOpens.get()
    val idx = ZLake.index(spark, root)
    val got = ZLake.readWith(spark, root, idx)
      .filter(col("win") === "w2" && col("a").between(8, 15))
      .agg(count(lit(1)), sum("payload")).head().toSeq
    assert(ZLake.footerOpens.get() == before,
      "consolidated manifest still opened footers")
    val want = spark.read.parquet(root)
      .filter(col("win") === "w2" && col("a").between(8, 15))
      .agg(count(lit(1)), sum("payload")).head().toSeq
    assert(got == want, "consolidated read changed the answer")
    // pruning still happens through the consolidated envelopes
    val (kept, total) = idx.lastPrune.get()
    assert(total == 12 && kept < 12,
      s"expected pruning through the root manifest, kept $kept/$total")
  }

  test("windows landed after consolidation fall back to their own sidecar") {
    val root = tmp("zcons2")
    for (w <- 1 to 2)
      Sinks.zorderedWrite(data(), "a", "b", s"$root/win=w$w", 4, bits = 6)
    ZLake.consolidateManifests(spark, root)
    // a NEW window lands afterwards, with its own per-dir sidecar
    Sinks.zorderedWrite(data(), "a", "b", s"$root/win=w3", 4, bits = 6)
    val before = ZLake.footerOpens.get()
    val got = ZLake.read(spark, root).groupBy("win").count()
      .orderBy("win").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ZLake.footerOpens.get() == before,
      "root + per-dir sidecars together must plan without footers")
    assert(got == Seq(("w1", 4000L), ("w2", 4000L), ("w3", 4000L)))
    // re-consolidating folds the new window into the root sidecar
    ZLake.consolidateManifests(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/win=w3/${ZLake.ManifestName}"), false))
    val again = ZLake.footerOpens.get()
    assert(ZLake.read(spark, root).count() == 12000L)
    assert(ZLake.footerOpens.get() == again)
  }

  test("per-partition manifests union-merge evolved schemas") {
    val root = tmp("zevo")
    Sinks.zorderedWrite(data(), "a", "b", s"$root/win=w1", 4, bits = 6)
    Sinks.zorderedWrite(
      data().withColumn("extra", col("payload") * 2),
      "a", "b", s"$root/win=w2", 4, bits = 6)
    val df = ZLake.read(spark, root)
    assert(df.columns.toSeq == Seq("a", "b", "payload", "extra", "win"))
    // rows from the older window surface the evolved column as NULL
    assert(df.filter(col("win") === "w1" && col("extra").isNull).count() == 4000)
    assert(df.filter(col("win") === "w2").agg(sum("extra")).head().getLong(0)
      == 2L * (0L until 4000L).sum)
  }
}
