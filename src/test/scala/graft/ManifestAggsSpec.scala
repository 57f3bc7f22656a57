package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.ZLake

/** Metadata-only aggregates ([[graft.plans.ManifestAggs]]) and the `zlake`
  * SQL source ([[graft.sources.ZLakeSource]]): count/min/max over a
  * manifest-covered lake must be answered from the write-time stats with
  * NO file scan — asserted on the plan (LocalRelation / LocalTableScan),
  * not inferred — and bail to the normal pruned scan the moment exactness
  * is not provable. */
class ManifestAggsSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  /** 3 windows × 4 files; `v` is NULL on multiples of 5. */
  private def lake(): String = {
    val root = tmp("maggs")
    for (w <- 1 to 3) {
      val part = spark.range(w * 1000L, w * 1000L + 600)
        .select(col("id"), (col("id") % 32).as("a"), (col("id") % 7).as("b"),
          when(col("id") % 5 =!= 0, col("id") * 2).as("v"))
      Sinks.zorderedWrite(part, "a", "b", s"$root/win=w$w", 4, bits = 5)
    }
    root
  }

  // every leaf a LocalRelation == the answer was computed at planning
  // time from the manifest stats; no scan node survives anywhere
  private def answeredFromMetadata(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().nonEmpty &&
      df.queryExecution.optimizedPlan.collectLeaves().forall {
        case _: LocalRelation => true
        case _ => false
      }

  private def scansFiles(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case _: LogicalRelation => true
      case _ => false
    }

  test("global count/min/max answered from the manifest, zero scan") {
    val root = lake()
    val df = ZLake.read(spark, root)
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min("id").as("lo"), max("id").as("hi"))
    assert(answeredFromMetadata(df), df.queryExecution.optimizedPlan.toString)
    val got = df.head().toSeq
    val want = spark.read.parquet(root)
      .agg(count(lit(1)), count(col("v")), min("id"), max("id")).head().toSeq
    assert(got == want)
    // Dataset.count() rides the same rewrite
    val cnt = ZLake.read(spark, root)
    assert(cnt.count() == spark.read.parquet(root).count())
  }

  test("group-by partition column + partition filter, zero scan") {
    val root = lake()
    val df = ZLake.read(spark, root)
      .filter(col("win") =!= "w2")
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
      .orderBy("win")
    assert(answeredFromMetadata(df), df.queryExecution.optimizedPlan.toString)
    val got = df.collect().map(_.toSeq).toSeq
    val want = spark.read.parquet(root).filter(col("win") =!= "w2")
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
      .orderBy("win").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("all-NULL column: min/max answer NULL from stats") {
    val root = tmp("maggs-null")
    val part = spark.range(100)
      .select(col("id"), (col("id") % 8).as("a"), (col("id") % 3).as("b"),
        lit(null).cast("long").as("dead"))
    Sinks.zorderedWrite(part, "a", "b", root, 2, bits = 4)
    val df = ZLake.read(spark, root)
      .agg(min("dead").as("lo"), max("dead").as("hi"), count(col("dead")).as("n"))
    assert(answeredFromMetadata(df), df.queryExecution.optimizedPlan.toString)
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) == 0L)
  }

  test("zero surviving partitions: global answers (0, NULL); grouped emits none") {
    val root = lake()
    val g = ZLake.read(spark, root).filter(col("win") === "nope")
      .agg(count(lit(1)).as("n"), min("id").as("lo"))
    assert(answeredFromMetadata(g), g.queryExecution.optimizedPlan.toString)
    val r = g.head()
    assert(r.getLong(0) == 0L && r.isNullAt(1))
    val grouped = ZLake.read(spark, root).filter(col("win") === "nope")
      .groupBy("win").agg(count(lit(1)).as("n"))
    assert(answeredFromMetadata(grouped))
    assert(grouped.collect().isEmpty, "GROUP BY over no rows emits no groups")
  }

  test("exactness gates: unsupported shapes fall back to the scan, correctly") {
    val root = lake()
    val read = ZLake.read(spark, root)
    val full = spark.read.parquet(root)
    // a data-column filter cannot be answered from per-dir stats
    val f1 = read.filter(col("a") < 8).agg(count(lit(1)))
    assert(scansFiles(f1))
    assert(f1.head().getLong(0) == full.filter(col("a") < 8).count())
    // sum needs data
    val f2 = read.agg(sum("id"))
    assert(scansFiles(f2))
    assert(f2.head().getLong(0) == full.agg(sum("id")).head().getLong(0))
    // count distinct needs data
    val f3 = read.agg(countDistinct("b"))
    assert(scansFiles(f3))
    assert(f3.head().getLong(0) == full.agg(countDistinct("b")).head().getLong(0))
    // min over a non-integral column needs data (NaN/zero semantics)
    val f4 = read.select(col("v").cast("double").as("vd")).agg(min("vd"))
    assert(scansFiles(f4))
  }

  test("partition-column min/max/count-distinct from directory values") {
    val root = lake()
    val df = ZLake.read(spark, root).filter(col("win") =!= "w2")
      .agg(min("win").as("lo"), max("win").as("hi"),
        countDistinct("win").as("wins"), count(lit(1)).as("n"))
    assert(answeredFromMetadata(df), df.queryExecution.optimizedPlan.toString)
    val got = df.head().toSeq
    val want = spark.read.parquet(root).filter(col("win") =!= "w2")
      .agg(min("win").as("lo"), max("win").as("hi"),
        countDistinct("win").as("wins"), count(lit(1)).as("n")).head().toSeq
    assert(got == want)
    assert(got == Seq("w1", "w3", 2L, 1200L))
    // distinct over a DATA column still bails to the scan
    val f = ZLake.read(spark, root).agg(countDistinct("b"))
    assert(scansFiles(f))
  }

  /** 2 windows × 2 files with exact per-file sums in the manifest; `bal`
    * is decimal(5,2), NULL on multiples of 7; `dead` is all-NULL. */
  private def sumLake(): String = {
    val root = tmp("maggs-sum")
    for (w <- 1 to 2) {
      val part = spark.range(w * 100L, w * 100L + 80)
        .select(col("id"), (col("id") % 16).as("a"), (col("id") % 5).as("b"),
          when(col("id") % 7 =!= 0,
            (col("id") % 90).cast("decimal(5,2)")).as("bal"),
          lit(null).cast("long").as("dead"))
      Sinks.zorderedWrite(part, "a", "b", s"$root/win=w$w", 2, bits = 4,
        sumCols = Seq("id", "bal", "dead"))
    }
    root
  }

  test("sum/avg from manifest sums: zero scan, scan-identical values") {
    val root = sumLake()
    val df = ZLake.read(spark, root)
      .groupBy(col("win"))
      .agg(sum("id").as("s_id"), sum("bal").as("s_bal"),
        avg("bal").as("a_bal"), sum("dead").as("s_dead"))
      .orderBy("win")
    assert(answeredFromMetadata(df), df.queryExecution.optimizedPlan.toString)
    val got = df.collect().map(_.toSeq).toSeq
    val want = spark.read.parquet(root).groupBy(col("win"))
      .agg(sum("id").as("s_id"), sum("bal").as("s_bal"),
        avg("bal").as("a_bal"), sum("dead").as("s_dead"))
      .orderBy("win").collect().map(_.toSeq).toSeq
    assert(got == want) // incl. bit-identical decimal avg and NULL sum(dead)
    // partition filter composes
    val f = ZLake.read(spark, root).filter(col("win") === "w2")
      .agg(sum("id").as("s"), avg("bal").as("m"))
    assert(answeredFromMetadata(f))
    assert(f.head().toSeq == spark.read.parquet(root)
      .filter(col("win") === "w2")
      .agg(sum("id").as("s"), avg("bal").as("m")).head().toSeq)
  }

  test("sum gates: no manifest sums, long overflow, non-decimal avg bail") {
    // lake() writes WITHOUT sumCols: sum must fall back to the scan
    val noSums = ZLake.read(spark, lake()).agg(sum("id"))
    assert(scansFiles(noSums))
    // long-sum overflow: exact total past Long range bails to the scan
    // (which keeps Spark's native overflow behavior)
    val root = tmp("maggs-ovf")
    val part = spark.range(4).select(
      lit(Long.MaxValue / 2).as("big"), (col("id") % 2).as("a"), col("id").as("b"))
    Sinks.zorderedWrite(part, "a", "b", root, 2, bits = 2,
      sumCols = Seq("big"))
    val ovf = ZLake.read(spark, root).agg(sum("big"))
    assert(scansFiles(ovf), ovf.queryExecution.optimizedPlan.toString)
    // avg over a non-decimal column: double accumulation is row-order
    // dependent, not reproducible from stats — bail
    val avgLong = ZLake.read(spark, sumLake()).agg(avg("id"))
    assert(scansFiles(avgLong))
  }

  test("zlake is a SQL source: USING zlake keeps pruning and metadata aggs") {
    val root = lake()
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW zlake_spec_v " +
      s"USING zlake OPTIONS (path '$root')")
    // same rows as a parquet read (plus the partition column)
    val got = spark.sql(
      "SELECT win, id, a, b, v FROM zlake_spec_v WHERE a BETWEEN 8 AND 15 " +
      "ORDER BY id").collect().map(_.toSeq).toSeq
    val want = spark.read.parquet(root).filter(col("a").between(8, 15))
      .select(col("win"), col("id"), col("a"), col("b"), col("v"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(got == want)
    // file pruning happens through the SQL surface: fewer files planned
    // than the lake holds (12 files; the band predicate keeps a subset)
    val pruned = spark.sql(
      "SELECT id FROM zlake_spec_v WHERE a BETWEEN 8 AND 15")
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty)
    pruned.collect()
    val planned = scan.head.metrics("numFiles").value
    assert(planned < 12, s"expected file pruning through SQL, planned $planned")
    // metadata-only aggregate through pure SQL
    val meta = spark.sql(
      "SELECT win, count(*) AS n, max(id) AS hi FROM zlake_spec_v " +
      "GROUP BY win ORDER BY win")
    assert(answeredFromMetadata(meta), meta.queryExecution.optimizedPlan.toString)
    val mg = meta.collect().map(_.toSeq).toSeq
    val mw = full(root)
    assert(mg == mw)
  }

  private def full(root: String) =
    spark.read.parquet(root).groupBy(col("win"))
      .agg(count(lit(1)).as("n"), max("id").as("hi"))
      .orderBy("win").collect().map(_.toSeq).toSeq
}
