package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MvRewrite
import graft.sinks.{MaterializedAgg, Sinks}
import graft.sinks.MaterializedAgg.Spec

/** Materialized-view query rewriting ([[MvRewrite]]): a registered base
  * lake's GROUP BY answers from the maintained view — bit-identical
  * results, zero base files scanned — and every unsupported shape keeps
  * the scan. */
class MvRewriteSpec extends AnyFunSuite with SparkSpec {

  private def scanRoots(df: DataFrame): Seq[String] = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
  }

  private def canon(df: DataFrame): Set[Seq[String]] =
    df.collect().map(_.toSeq.toVector.map(String.valueOf)).toSet

  // base lake + maintained lattice view, registered once for the suite
  private lazy val (base, view, spec) = {
    val b = java.nio.file.Files
      .createTempDirectory("graft-mvrw-base").toString + "/t"
    val v = java.nio.file.Files
      .createTempDirectory("graft-mvrw-view").toString + "/mv"
    val data = spark.range(2000).select(
      concat(lit("g"), (col("id") % 5).cast("string")).as("g"),
      concat(lit("h"), (col("id") % 3).cast("string")).as("h"),
      (col("id") % 997).as("v"), (col("id") % 31).as("w"))
    Sinks.zorderedWrite(data, "v", "w", b, numFiles = 4, bits = 8)
    val sp = Spec(groupCols = Seq("g", "h"), sumCols = Seq("v", "w"),
      minCols = Seq("v"), maxCols = Seq("v"),
      groupingSets = Seq(Seq("g", "h"), Seq("g"), Nil))
    // maintain from the SAME lake contents the base read serves
    for (i <- 0 until 2)
      MaterializedAgg.mergeBatch(spark,
        v, graft.sources.ZLake.read(spark, b).filter(col("v") % 2 === i),
        sp, i.toLong)
    MvRewrite.register(b, v, sp)
    (b, v, sp)
  }

  private def baseRead: DataFrame = graft.sources.ZLake.read(spark, base)

  test("count/sum/min/max GROUP BY answers from the view, not the base") {
    val q = baseRead.groupBy("g", "h")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"),
        min("v").as("lo"), max("v").as("hi"), sum("w").as("sw"))
    val direct = spark.read.parquet(base).groupBy("g", "h")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"),
        min("v").as("lo"), max("v").as("hi"), sum("w").as("sw"))
    assert(canon(q) === canon(direct))
    val roots = scanRoots(q)
    assert(roots.nonEmpty && roots.forall(_.contains(view)),
      s"rewritten query still scans the base: $roots")
  }

  test("a grouping SUBSET re-aggregates from the covering grain") {
    val q = baseRead.groupBy("g").agg(sum("v").as("sv"))
    val direct = spark.read.parquet(base).groupBy("g").agg(sum("v").as("sv"))
    assert(canon(q) === canon(direct))
    assert(scanRoots(q).forall(_.contains(view)) && scanRoots(q).nonEmpty)
    // grand total too
    val t = baseRead.agg(count(lit(1)).as("n"), sum("w").as("sw"))
    val td = spark.read.parquet(base).agg(count(lit(1)).as("n"), sum("w").as("sw"))
    assert(canon(t) === canon(td))
    assert(scanRoots(t).forall(_.contains(view)))
  }

  test("filters on group columns ride the rewrite") {
    val q = baseRead.filter(col("g") =!= "g3").groupBy("g")
      .agg(count(lit(1)).as("n"), max("v").as("hi"))
    val direct = spark.read.parquet(base).filter(col("g") =!= "g3")
      .groupBy("g").agg(count(lit(1)).as("n"), max("v").as("hi"))
    assert(canon(q) === canon(direct))
    assert(scanRoots(q).forall(_.contains(view)))
  }

  test("unsupported shapes keep the base scan, bit-identical by default") {
    // count(distinct), avg, data filters, unregistered columns: NO rewrite
    val shapes = Seq(
      baseRead.groupBy("g").agg(countDistinct(col("v")).as("x")),
      baseRead.groupBy("g").agg(avg("v").as("x")),
      baseRead.filter(col("v") > 100).groupBy("g").agg(sum("v").as("x")),
      baseRead.groupBy("g").agg(min("w").as("x"))) // w not in minCols
    shapes.foreach { q =>
      val roots = scanRoots(q)
      assert(roots.nonEmpty && roots.forall(_.contains(base)),
        s"unsupported shape was rewritten: $roots")
    }
    // an unregistered lake is never touched
    MvRewrite.unregister(base)
    try {
      val q = baseRead.groupBy("g").agg(sum("v").as("sv"))
      assert(scanRoots(q).forall(_.contains(base)))
    } finally MvRewrite.register(base, view, spec)
  }

  test("SQL surface: a temp view over the lake rewrites too") {
    graft.sources.ZLake.read(spark, base).createOrReplaceTempView("mvrw_base")
    val q = spark.sql(
      "SELECT g, count(*) AS n, sum(v) AS sv FROM mvrw_base GROUP BY g")
    val direct = spark.sql(
      s"SELECT g, count(*) AS n, sum(v) AS sv FROM parquet.`$base` GROUP BY g")
    assert(canon(q) === canon(direct))
    assert(scanRoots(q).forall(_.contains(view)))
  }
}
