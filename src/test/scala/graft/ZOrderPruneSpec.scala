package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Functions => F}
import graft.sinks.Sinks
import graft.sources.ZLake

/** The read-side payoff of the z-order layout: files are SKIPPED at
  * planning time (ZLake's stats-pruning FileIndex), and row groups inside
  * surviving files are skipped by parquet's own statistics once Spark
  * pushes the filter — both measured from the executed plan's scan
  * metrics, not inferred from envelopes. */
class ZOrderPruneSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Uniform grid over (a, b) in [0, 256)^2, shuffled row order — the
    * adversarial case for any single-column sort. */
  private def grid(): DataFrame = {
    val n = 1 << 16
    spark.range(n.toLong)
      .withColumn("r", F.hash60(col("id").cast("string")))
      // floor-div keeps b integral: `/` is double division in the DataFrame
      // API, and a DOUBLE b would hit the envelope lanes' NaN-soundness
      // bail (foreign writers omit NaN from stats) — no pruning at all
      .select((col("id") % 256).as("a"), (floor(col("id") / 256) % 256).as("b"),
        (col("r") % 1000000).as("payload"))
      .orderBy("payload")
  }

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

  test("ZLake prunes FILES at planning time on predicates on EACH column") {
    val files = 16
    val zPath = tmp("zprune")
    Sinks.zorderedWrite(grid(), "a", "b", zPath, files, bits = 8)

    val idx = ZLake.index(spark, zPath)
    assert(idx.inputFiles.length == files)
    val plain = spark.read.parquet(zPath)

    for (c <- Seq("a", "b")) {
      val pred = col(c) >= 32 && col(c) <= 63 // 1/8 of the range
      val pruned = ZLake.readWith(spark, zPath, idx).filter(pred)
      // correctness first: pruning must not change the answer
      val got = pruned.agg(count("*"), sum("a"), sum("b"), sum("payload"))
        .head().toSeq
      val want = plain.filter(pred).agg(count("*"), sum("a"), sum("b"),
        sum("payload")).head().toSeq
      assert(got == want, s"pruned read changed the answer on $c")
      // the scan's OWN metric: far fewer files than the table holds
      val numFiles = scanMetric(
        ZLake.readWith(spark, zPath, idx).filter(pred), "numFiles")
      val (kept, total) = idx.lastPrune.get()
      info(s"predicate on $c: scan read $numFiles/$files files " +
        s"(index kept $kept/$total)")
      // the write's exact-quantile boundaries are DETERMINISTIC (same
      // input -> same layout every run): a 1/8-range predicate on either
      // interleaved column keeps exactly 4 of 16 files on this grid
      assert(numFiles <= 6,
        s"predicate on $c pruned too little: $numFiles of $files files")
      assert(kept.toLong == numFiles && total == files)
    }

    // no filter -> nothing pruned, full table intact through the index
    assert(ZLake.readWith(spark, zPath, idx).count() == (1 << 16))
    assert(scanMetric(ZLake.readWith(spark, zPath, idx), "numFiles") == files)
  }

  test("single-column sort cannot prune the second column; z-order can both") {
    val files = 16
    val sPath = tmp("ssort")
    grid().repartitionByRange(files, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(sPath)
    val zPath = tmp("zboth")
    Sinks.zorderedWrite(grid(), "a", "b", zPath, files, bits = 8)

    def kept(path: String, c: String): Int = {
      val idx = ZLake.index(spark, path)
      ZLake.readWith(spark, path, idx)
        .filter(col(c) >= 32 && col(c) <= 63).collect()
      idx.lastPrune.get()._1
    }
    val (sa, sb) = (kept(sPath, "a"), kept(sPath, "b"))
    val (za, zb) = (kept(zPath, "a"), kept(zPath, "b"))
    info(s"files kept of $files: single-sort a=$sa b=$sb; z-order a=$za b=$zb")
    assert(sa <= 4, "sorted column should prune nearly everything")
    assert(sb >= files - 1, "unsorted column cannot prune a single-sort layout")
    // deterministic exact-quantile layout: 4 of 16 per column on this grid
    assert(za <= 6 && zb <= 6, "z-order must prune on BOTH columns")
  }

  test("string-prefix predicates (LIKE 'x%') prune files on string envelopes") {
    // four files, each a tight sorted domain range — the natural shape of
    // a domain-sorted lake partition; a prefix filter must plan only the
    // file whose [lo, hi] envelope intersects [p, succ(p))
    val path = tmp("prefix")
    val domains = for {
      c <- Seq("a", "g", "n", "t")
      i <- 0 until 256
    } yield (s"$c${"%03d".format(i)}.example.com", c, i.toLong)
    domains.groupBy(_._2).foreach { case (_, rows) =>
      rows.toSeq.toDF("domain", "grp", "n").drop("grp")
        .coalesce(1).sortWithinPartitions("domain")
        .write.mode("append").parquet(path)
    }
    val idx = ZLake.index(spark, path)
    assert(idx.inputFiles.length == 4)
    val plain = spark.read.parquet(path)
    for ((pfx, expectFiles) <- Seq(("g0", 1L), ("n25", 1L), ("zz", 0L),
        ("t", 1L))) {
      val pred = col("domain").startsWith(pfx)
      val got = ZLake.readWith(spark, path, idx).filter(pred)
        .agg(count(lit(1)), sum("n")).head().toSeq
      val want = plain.filter(pred).agg(count(lit(1)), sum("n")).head().toSeq
      assert(got == want, s"prefix '$pfx' pruning changed the answer")
      if (expectFiles == 0L) {
        val (kept, total) = idx.lastPrune.get()
        assert(kept == 0 && total == 4, s"prefix '$pfx' kept $kept files")
      } else {
        val n = scanMetric(
          ZLake.readWith(spark, path, idx).filter(pred), "numFiles")
        assert(n == expectFiles,
          s"prefix '$pfx' planned $n of 4 files (wanted $expectFiles)")
      }
    }
  }

  test("zorderedWrite is deterministic: same input, same layout, same stats") {
    val p1 = tmp("zdet1")
    val p2 = tmp("zdet2")
    Sinks.zorderedWrite(grid(), "a", "b", p1, 16, bits = 8)
    Sinks.zorderedWrite(grid(), "a", "b", p2, 16, bits = 8)
    def shape(p: String) = ZLake.envelopes(spark, p)
      .map(fe => (fe.rows, fe.cols.toSeq.sortBy(_._1)
        .map { case (c, e) => (c, e.lo.toString, e.hi.toString) }))
      .sortBy(_.toString)
    val (s1, s2) = (shape(p1), shape(p2))
    assert(s1 == s2, "two writes of the same input produced different layouts")
    assert(s1.size == 16)
  }

  test("row groups inside kept files are skipped by pushed parquet stats") {
    // small row groups -> many per file; parquet's row-group stats then
    // skip at sub-file granularity inside the files planning kept
    val zPath = tmp("zrg")
    Sinks.zorderedWrite(grid(), "a", "b", zPath, numFiles = 4, bits = 8,
      writerOptions = Map("parquet.block.size" -> "65536"))
    val rowGroups = ZLake.envelopes(spark, zPath).map(_.rowGroups).sum
    assert(rowGroups > 16, s"fixture too coarse: $rowGroups row groups")

    val total = 1L << 16
    val pred = col("a") >= 32 && col("a") <= 63 && col("b") >= 64 && col("b") <= 127
    val exact = spark.read.parquet(zPath).filter(pred).count()
    // scan numOutputRows = rows the reader actually DECODED = rows of row
    // groups (and pages) that survived the pushed filter
    val decoded = scanMetric(spark.read.parquet(zPath).filter(pred),
      "numOutputRows")
    info(s"decoded $decoded of $total rows for $exact matches " +
      s"($rowGroups row groups over 4 files)")
    assert(decoded < total / 4,
      s"row-group skipping ineffective: decoded $decoded of $total")
    assert(decoded >= exact)
  }

  test("partition dirs and footer stats compose on the lake's win= layout") {
    // the real lake shape: win=<stamp> partition dirs, z-ordered files
    // inside — partition filters must prune whole DIRECTORIES exactly and
    // data filters must still stat-prune the files inside survivors
    val root = tmp("zpart")
    for (win <- Seq("w_a", "w_b", "w_c")) {
      Sinks.zorderedWrite(grid(), "a", "b", s"$root/win=$win", 8, bits = 8)
    }
    val idx = ZLake.index(spark, root)
    assert(idx.inputFiles.length == 24 && idx.partitionCols == Seq("win"))

    val zdf = ZLake.readWith(spark, root, idx)
    // partition column is part of the output
    assert(zdf.columns.contains("win"))
    assert(zdf.count() == 3L * (1 << 16))

    // partition filter alone: exactly one directory's files listed
    zdf.filter(col("win") === "w_b").collect()
    assert(idx.lastPrune.get() == ((8, 24)),
      s"partition filter pruned wrong: ${idx.lastPrune.get()}")
    // data filter alone: stat pruning inside EVERY partition
    zdf.filter(col("a") >= 32 && col("a") <= 63).collect()
    val dataKept = idx.lastPrune.get()._1
    assert(dataKept <= 16, s"stat pruning weak across partitions: $dataKept/24")
    // composed: both prunings multiply
    val both = zdf.filter(col("win") === "w_b" && col("a") >= 32 && col("a") <= 63)
    val rows = both.agg(count("*"), sum("payload")).head().toSeq
    assert(idx.lastPrune.get()._1 <= dataKept / 3 + 2,
      s"composed pruning weak: ${idx.lastPrune.get()}")
    // correctness: equals the plain partition-discovering read
    val want = spark.read.parquet(root)
      .filter(col("win") === "w_b" && col("a") >= 32 && col("a") <= 63)
      .agg(count("*"), sum("payload")).head().toSeq
    assert(rows == want, "partitioned pruned read changed the answer")
  }

  test("null-count stats prune IS NULL / IS NOT NULL at the file level") {
    // file 1: c fully populated; file 2: c entirely null
    val root = tmp("znull")
    spark.range(1000).select(col("id").as("a"), col("id").cast("string").as("c"))
      .coalesce(1).write.parquet(root)
    spark.range(1000, 2000).select(col("id").as("a"),
        lit(null).cast("string").as("c"))
      .coalesce(1).write.mode("append").parquet(root)
    val idx = ZLake.index(spark, root)
    assert(idx.inputFiles.length == 2)
    val zdf = ZLake.readWith(spark, root, idx)
    // IS NOT NULL skips the all-null file; IS NULL skips the full file
    assert(zdf.filter(col("c").isNotNull).count() == 1000)
    assert(idx.lastPrune.get() == ((1, 2)), s"got ${idx.lastPrune.get()}")
    assert(zdf.filter(col("c").isNull).count() == 1000)
    assert(idx.lastPrune.get() == ((1, 2)), s"got ${idx.lastPrune.get()}")
    // and a comparison on the all-null column keeps only the populated file
    // (comparisons are null-rejecting; the all-null file has no envelope
    // for c, but its zero non-null rows can never match IS NOT NULL which
    // Spark conjoins onto pushed comparisons)
    assert(zdf.filter(col("c") === "500").count() == 1)
    assert(idx.lastPrune.get()._1 <= 1, s"got ${idx.lastPrune.get()}")
  }

  test("envelope pruning is conservative: unsupported predicates keep files") {
    val zPath = tmp("zcons")
    Sinks.zorderedWrite(grid(), "a", "b", zPath, numFiles = 8, bits = 8)
    val idx = ZLake.index(spark, zPath)
    // a non-literal, non-range predicate the envelope test cannot decide
    ZLake.readWith(spark, zPath, idx)
      .filter((col("a") + col("b")) % 97 === 5).collect()
    assert(idx.lastPrune.get()._1 == 8, "undecidable predicate must keep all")
    // string-typed IN on a numeric column: no envelope comparison, keep all
    val rows = ZLake.readWith(spark, zPath, idx)
      .filter(col("a").isin(1, 2, 3)).count()
    assert(rows == spark.read.parquet(zPath)
      .filter(col("a").isin(1, 2, 3)).count())
  }

  test("3-column z-order prunes files on predicates on EACH of 3 columns") {
    // uniform (a, b, c) grid over [0, 32)^3, shuffled: with 8 files over
    // the 15-bit z3 domain each file is one octant (16x16x16 cube), so a
    // quarter-range predicate on ANY single axis keeps only the 4 octants
    // on its side — pruning in all three dimensions from one layout,
    // which neither a single sort nor 2-col z-order can give the third
    val n = 1 << 15
    val df = spark.range(n.toLong)
      .withColumn("r", F.hash60(col("id").cast("string")))
      .select((col("id") % 32).as("a"),
        (floor(col("id") / 32) % 32).as("b"),
        (floor(col("id") / 1024) % 32).as("c"),
        (col("r") % 1000000).as("payload"))
      .orderBy("payload")
    val path = tmp("z3")
    Sinks.zorderedWrite3(df, "a", "b", "c", path, numFiles = 8, bits = 5)
    val idx = ZLake.index(spark, path)
    assert(idx.inputFiles.length == 8)
    val plain = spark.read.parquet(path)
    for (cname <- Seq("a", "b", "c")) {
      val pred = col(cname) < 8 // quarter range
      val got = ZLake.readWith(spark, path, idx).filter(pred)
        .agg(count(lit(1)), sum("a"), sum("b"), sum("c")).head().toSeq
      val want = plain.filter(pred)
        .agg(count(lit(1)), sum("a"), sum("b"), sum("c")).head().toSeq
      assert(got == want, s"pruned read changed the answer on $cname")
      val (kept, total) = idx.lastPrune.get()
      info(s"predicate on $cname: kept $kept/$total files")
      assert(total == 8 && kept <= 5,
        s"quarter-range on $cname pruned too little: $kept/8")
    }
  }

  test("x <> v prunes CONSTANT files (the boilerplate-value case)") {
    // 4 files: three constant in `v` (lo = hi, zero nulls — the shape a
    // dictionary-heavy boilerplate column compacts into) and one mixed.
    // `v <> 7` must plan only the files that can hold a differing row:
    // the two constant-7 files prove EqualTo via mustMatch and prune
    // through the Not complement lane; correctness vs the plain scan.
    val path = tmp("zne")
    val parts = Seq(7L -> 0, 7L -> 1, 3L -> 2, -1L /*mixed*/ -> 3)
    for ((v, i) <- parts) {
      val df =
        if (v >= 0) spark.range(100).select((col("id") + i * 1000).as("id"),
          lit(v).as("v"))
        else spark.range(100).select((col("id") + i * 1000).as("id"),
          (col("id") % 11).as("v"))
      df.coalesce(1).write.mode("append").parquet(path)
    }
    val idx = ZLake.index(spark, path)
    assert(idx.inputFiles.length == 4)
    val got = ZLake.readWith(spark, path, idx).filter(col("v") =!= 7)
      .agg(count(lit(1)), sum("id"), sum("v")).head().toSeq
    val want = spark.read.parquet(path).filter(col("v") =!= 7)
      .agg(count(lit(1)), sum("id"), sum("v")).head().toSeq
    assert(got == want, "<>-pruned read changed the answer")
    assert(idx.lastPrune.get() == ((2, 4)),
      s"expected the two constant-7 files pruned: ${idx.lastPrune.get()}")
  }
}
