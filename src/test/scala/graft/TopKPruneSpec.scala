package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKFilePrune
import graft.sinks.Sinks
import graft.sources.ZLake

/** Zone-map top-k: `ORDER BY col LIMIT k` over a stats lake must scan only
  * the files that can contribute to the top-k — asserted from the executed
  * plan's scan metrics, with the result always compared row-for-row against
  * the unpruned native sort (unique tiebreaker, so rows are deterministic). */
class TopKPruneSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  /** 2^14 rows, unique id; a and b uniform in [0, 256), decorrelated. */
  private def grid(): DataFrame =
    spark.range(1 << 14).select(col("id"),
      (col("id") % 256).as("a"), (col("id") * 7 % 256).as("b"))

  /** Files scanned by the query's FIRST execution. Must be called BEFORE
    * any other action on `df`: `numFiles` is posted when the scan's lazy
    * `selectedPartitions` first materializes, and a re-execution re-posts
    * nothing (SQL metrics reset per action) — reading after a prior
    * collect() observes 0. */
  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  /** Parquet data files actually on disk under `path` (fixtures must not
    * assume `numFiles` = file count: zPartitioned is bucket-granular at
    * shift 2*bits-16, so a small z-domain can yield fewer files). */
  private def diskFiles(path: String): Long =
    new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))

  private def sameRows(got: Array[Row], want: Array[Row]): Unit =
    assert(got.toSeq == want.toSeq)

  test("ORDER BY DESC LIMIT k scans only top-envelope files, same rows") {
    val path = tmp("topk-desc")
    Sinks.zorderedWrite(grid(), "a", "b", path, numFiles = 16, bits = 8)
    val want = spark.read.parquet(path)
      .orderBy(col("a").desc, col("id")).limit(25).collect()

    TopKFilePrune.lastPrune.set((-1, -1))
    val pruned = ZLake.read(spark, path)
      .orderBy(col("a").desc, col("id")).limit(25)
    val files = scanFiles(pruned)
    sameRows(pruned.collect(), want)
    assert(files < 16, s"expected file pruning, scanned $files/16")
    assert(TopKFilePrune.lastPrune.get()._2 == 16)
    assert(TopKFilePrune.lastPrune.get()._1.toLong == files)
  }

  test("ORDER BY ASC LIMIT k mirrors: bottom-envelope files only") {
    val path = tmp("topk-asc")
    Sinks.zorderedWrite(grid(), "a", "b", path, numFiles = 16, bits = 8)
    val want = spark.read.parquet(path)
      .orderBy(col("b"), col("id")).limit(25).collect()
    val pruned = ZLake.read(spark, path).orderBy(col("b"), col("id")).limit(25)
    val files = scanFiles(pruned)
    sameRows(pruned.collect(), want)
    assert(files < 16, s"expected file pruning, scanned $files/16")
  }

  test("range-clustered single file survives when k fits its rows") {
    // id itself z-ordered against a copy: files are disjoint id ranges, so
    // the top-25 by id live entirely in the last file
    val path = tmp("topk-range")
    val df = spark.range(1 << 14).select(col("id"), col("id").as("j"))
    Sinks.zorderedWrite(df, "id", "j", path, numFiles = 16, bits = 16)
    val pruned = ZLake.read(spark, path).orderBy(col("id").desc).limit(25)
    val want = spark.read.parquet(path).orderBy(col("id").desc).limit(25)
    val files = scanFiles(pruned)
    sameRows(pruned.collect(), want.collect())
    assert(files == 1)
  }

  test("k past the lake's row count: no pruning, full result") {
    val path = tmp("topk-all")
    val df = spark.range(100).select(col("id"), col("id").as("j"))
    Sinks.zorderedWrite(df, "id", "j", path, numFiles = 4, bits = 8)
    val onDisk = diskFiles(path)
    assert(onDisk > 1, s"fixture needs several files, got $onDisk")
    val pruned = ZLake.read(spark, path).orderBy(col("id").desc).limit(1000)
    val files = scanFiles(pruned)
    sameRows(pruned.collect(),
      spark.read.parquet(path).orderBy(col("id").desc).limit(1000).collect())
    assert(files == onDisk)
  }

  test("constant sort column: ties at the bound keep every file") {
    val path = tmp("topk-ties")
    val df = spark.range(1000).select(col("id"), lit(7L).as("c"))
    Sinks.zorderedWrite(df, "id", "id", path, numFiles = 4, bits = 8)
    val onDisk = diskFiles(path)
    assert(onDisk > 1, s"fixture needs several files, got $onDisk")
    val pruned = ZLake.read(spark, path).orderBy(col("c").desc, col("id")).limit(5)
    val files = scanFiles(pruned)
    sameRows(pruned.collect(),
      spark.read.parquet(path).orderBy(col("c").desc, col("id")).limit(5).collect())
    assert(files == onDisk) // no file is STRICTLY below the bound
  }

  test("NULLS LAST (default desc): all-null files prune, result matches") {
    val path = tmp("topk-nulls")
    // files 0..3 by id range; ids in [0, 1000) carry NULL v — after the
    // id-range write, low-id files are provably all-null in v
    val df = spark.range(1 << 12).select(col("id"),
      when(col("id") >= 1000, col("id")).as("v"))
    Sinks.zorderedWrite(df, "id", "id", path, numFiles = 8, bits = 16)
    val want = spark.read.parquet(path)
      .orderBy(col("v").desc, col("id")).limit(10).collect()
    val pruned = ZLake.read(spark, path).orderBy(col("v").desc, col("id")).limit(10)
    val files = scanFiles(pruned)
    sameRows(pruned.collect(), want)
    assert(files < 8, s"expected pruning, scanned $files/8")
  }

  test("NULLS FIRST: files that may hold a null are unprunable") {
    val path = tmp("topk-nullsfirst")
    val df = spark.range(1 << 12).select(col("id"),
      when(col("id") % 1024 === 0, lit(null).cast("long"))
        .otherwise(col("id")).as("v"))
    Sinks.zorderedWrite(df, "id", "id", path, numFiles = 8, bits = 16)
    val want = spark.read.parquet(path)
      .orderBy(col("v").desc_nulls_first, col("id")).limit(3).collect()
    val pruned = ZLake.read(spark, path)
      .orderBy(col("v").desc_nulls_first, col("id")).limit(3)
    val files = scanFiles(pruned)
    sameRows(pruned.collect(), want)
    // 4 nulls known (one per 1024-id file): the bound is met by nulls
    // alone, so exactly the null-bearing files survive
    assert(files == 4, s"scanned $files/8")
  }

  test("partition filter composes: bound counts only surviving dirs") {
    val root = tmp("topk-part")
    val df = grid()
    for (w <- 0 until 4)
      Sinks.zorderedWrite(df.filter(col("id") % 4 === w), "a", "b",
        s"$root/win=$w", numFiles = 4, bits = 8)
    val want = spark.read.parquet(root)
      .filter(col("win") === "2")
      .orderBy(col("a").desc, col("id")).limit(10)
      .drop("win").collect()
    val pruned = ZLake.read(spark, root)
      .filter(col("win") === "2")
      .orderBy(col("a").desc, col("id")).limit(10).drop("win")
    val files = scanFiles(pruned)
    sameRows(pruned.collect(), want)
    assert(files < 4, s"expected pruning within win=2, scanned $files")
  }

  test("data filter, no provably-inside file: bound unmet, no prune") {
    // b < 8 covers no file's WHOLE b-envelope in this layout, so no file's
    // rows are guaranteed to survive — the bound cannot reach k and the
    // rule must leave the plan alone (an overcounting bound would prune
    // files that still hold top-k survivors)
    val path = tmp("topk-datafilter")
    Sinks.zorderedWrite(grid(), "a", "b", path, numFiles = 16, bits = 8)
    TopKFilePrune.lastPrune.set((-1, -1))
    val q = ZLake.read(spark, path).filter(col("b") < 8)
      .orderBy(col("a").desc, col("id")).limit(5)
    sameRows(q.collect(),
      spark.read.parquet(path).filter(col("b") < 8)
        .orderBy(col("a").desc, col("id")).limit(5).collect())
    assert(TopKFilePrune.lastPrune.get() == ((-1, -1)),
      "no guaranteed rows -> bound unmet -> rule must not fire")
  }

  test("data filter with provably-inside files: bound counts them, prunes") {
    // b BETWEEN 64 AND 127 fully covers the z-cells whose b-envelope sits
    // inside the band: those files' rows are PROVEN survivors, the bound
    // reaches k, and files whose a-envelope cannot reach the threshold
    // prune — top-k under a data filter composes
    val path = tmp("topk-datafilter2")
    Sinks.zorderedWrite(grid(), "a", "b", path, numFiles = 16, bits = 8)
    val pred = col("b") >= 64 && col("b") <= 127
    val pruned = ZLake.read(spark, path).filter(pred)
      .orderBy(col("a").desc, col("id")).limit(25)
    val files = scanFiles(pruned)
    sameRows(pruned.collect(),
      spark.read.parquet(path).filter(pred)
        .orderBy(col("a").desc, col("id")).limit(25).collect())
    assert(files < 16, s"expected pruning under the data filter, " +
      s"scanned $files/16 (lastPrune=${TopKFilePrune.lastPrune.get()})")
  }

  test("SQL surface: ORDER BY ... LIMIT over a zlake view prunes too") {
    val path = tmp("topk-sql")
    Sinks.zorderedWrite(grid(), "a", "b", path, numFiles = 16, bits = 8)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW topk_sql_v " +
      s"USING zlake OPTIONS (path '$path')")
    val q = spark.sql(
      "SELECT id, a FROM topk_sql_v ORDER BY a DESC, id LIMIT 25")
    val want = spark.read.parquet(path)
      .selectExpr("id", "a").orderBy(col("a").desc, col("id")).limit(25)
    val files = scanFiles(q)
    sameRows(q.collect(), want.collect())
    assert(files < 16, s"expected file pruning via SQL, scanned $files/16")
  }

  test("aliased projection prunes: SELECT a AS s ... ORDER BY s LIMIT k") {
    val path = tmp("topk-alias")
    Sinks.zorderedWrite(grid(), "a", "b", path, numFiles = 16, bits = 8)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW topk_alias_v " +
      s"USING zlake OPTIONS (path '$path')")
    val q = spark.sql(
      "SELECT id, a AS s FROM topk_alias_v ORDER BY s DESC, id LIMIT 25")
    val want = spark.read.parquet(path).selectExpr("id", "a AS s")
      .orderBy(col("s").desc, col("id")).limit(25)
    val files = scanFiles(q)
    sameRows(q.collect(), want.collect())
    assert(files < 16, s"expected pruning through the alias, scanned $files/16")
  }

  test("partition-key top-k: ORDER BY win DESC LIMIT k reads only late windows") {
    // directory values are known exactly: the latest-windows query — the
    // most common operational top-k over a windowed lake — must plan only
    // the windows that can contribute
    val root = tmp("topk-pwin")
    val df = grid()
    for (w <- 0 until 4)
      Sinks.zorderedWrite(df.filter(col("id") % 4 === w), "a", "b",
        s"$root/win=$w", numFiles = 4, bits = 8)
    TopKFilePrune.lastPrune.set((-1, -1))
    // win=3 holds 4096 rows >= k=10: exactly its 4 files survive
    val pruned = ZLake.read(spark, root)
      .orderBy(col("win").desc, col("id")).limit(10).drop("win")
    val files = scanFiles(pruned)
    // parquet infers win as INT from the digit dir names; same ordering,
    // so compare the non-partition columns after the identical sort
    val want = spark.read.parquet(root)
      .orderBy(col("win").desc, col("id")).limit(10).drop("win").collect()
    sameRows(pruned.collect(), want)
    assert(files == 4, s"expected only win=3's 4 files, scanned $files/16 " +
      s"(lastPrune=${TopKFilePrune.lastPrune.get()})")
    assert(TopKFilePrune.lastPrune.get() == ((4, 16)))
    // k spanning two windows keeps both, still prunes the early ones
    val pruned2 = ZLake.read(spark, root)
      .orderBy(col("win").desc, col("id")).limit(5000).drop("win")
    val files2 = scanFiles(pruned2)
    sameRows(pruned2.collect(),
      spark.read.parquet(root)
        .orderBy(col("win").desc, col("id")).limit(5000).drop("win").collect())
    assert(files2 == 8, s"expected win=3+win=2 files, scanned $files2/16")
  }

  test("typed partition-key top-k: ORDER BY CAST(day AS INT) DESC prunes") {
    // integer-valued partition dirs where NUMERIC and lexicographic order
    // DISAGREE (11 > 9 numerically, "11" < "9" in UTF-8): the cast lane
    // must order by the query's own cast per directory — r8's
    // StringType-only lane could not serve this query at all (r8 #6)
    val root = tmp("topk-pint")
    val df = grid()
    for ((d, i) <- Seq(8, 9, 10, 11).zipWithIndex)
      Sinks.zorderedWrite(df.filter(col("id") % 4 === i), "a", "b",
        s"$root/day=$d", numFiles = 4, bits = 8)
    TopKFilePrune.lastPrune.set((-1, -1))
    // day=11 is the numeric latest: exactly its 4 files survive
    val pruned = ZLake.read(spark, root)
      .orderBy(col("day").cast("int").desc, col("id")).limit(10).drop("day")
    val files = scanFiles(pruned)
    // the plain reader infers day as INT from the digit dirs — identical
    // ordering, so compare the non-partition columns
    val want = spark.read.parquet(root)
      .orderBy(col("day").cast("int").desc, col("id")).limit(10)
      .drop("day").collect()
    sameRows(pruned.collect(), want)
    assert(files == 4, s"expected only day=11's 4 files, scanned $files/16" +
      s" (lastPrune=${TopKFilePrune.lastPrune.get()})")
    assert(TopKFilePrune.lastPrune.get() == ((4, 16)))
    // k spanning two windows keeps day=11 and day=10 — the pair a string
    // lane would have ordered FURTHEST apart
    val pruned2 = ZLake.read(spark, root)
      .orderBy(col("day").cast("int").desc, col("id")).limit(5000).drop("day")
    val files2 = scanFiles(pruned2)
    sameRows(pruned2.collect(),
      spark.read.parquet(root)
        .orderBy(col("day").cast("int").desc, col("id")).limit(5000)
        .drop("day").collect())
    assert(files2 == 8, s"expected day=11+day=10 files, scanned $files2/16")
  }

  test("derived top-k predicate reaches the scan: row groups skip past T") {
    // once the bound proves >= k rows at-or-above T, `a >= T` is injected
    // as a data filter — pushed to parquet it skips ROW GROUPS inside the
    // kept files, which file-level pruning alone cannot
    val path = tmp("topk-derived")
    Sinks.zorderedWrite(grid(), "a", "b", path, numFiles = 16, bits = 8)
    val pruned = ZLake.read(spark, path)
      .orderBy(col("a").desc, col("id")).limit(25)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case f: FileSourceScanExec => f }.head
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(a,"),
      s"derived bound not pushed: ${scan.metadata("PushedFilters")}")
    // and the filtered result is still exactly the native top-k
    sameRows(pruned.collect(),
      spark.read.parquet(path)
        .orderBy(col("a").desc, col("id")).limit(25).collect())
  }

  test("kill-switch restores the full scan") {
    val path = tmp("topk-off")
    Sinks.zorderedWrite(grid(), "a", "b", path, numFiles = 16, bits = 8)
    spark.conf.set(TopKFilePrune.confKey, "false")
    try {
      val q = ZLake.read(spark, path).orderBy(col("a").desc, col("id")).limit(25)
      assert(scanFiles(q) == 16)
    } finally spark.conf.unset(TopKFilePrune.confKey)
  }
}
