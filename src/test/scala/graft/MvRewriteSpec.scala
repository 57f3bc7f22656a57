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

  /** Evaluate the ORACLE side with the registration withdrawn — a
    * registered base would rewrite the oracle too, comparing the view to
    * itself (the review-caught vacuous-equality trap). */
  private def unrewritten(mk: => DataFrame): Set[Seq[String]] = {
    MvRewrite.unregister(base)
    try {
      val df = mk
      val r = canon(df)
      assert(scanRoots(df).forall(_.contains(base)),
        "oracle did not scan the base — vacuous comparison")
      r
    } finally MvRewrite.register(base, view, spec)
  }

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
    val direct = unrewritten(spark.read.parquet(base).groupBy("g", "h")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"),
        min("v").as("lo"), max("v").as("hi"), sum("w").as("sw")))
    assert(canon(q) === direct)
    val roots = scanRoots(q)
    assert(roots.nonEmpty && roots.forall(_.contains(view)),
      s"rewritten query still scans the base: $roots")
  }

  test("a grouping SUBSET re-aggregates from the covering grain") {
    val q = baseRead.groupBy("g").agg(sum("v").as("sv"))
    val direct = unrewritten(
      spark.read.parquet(base).groupBy("g").agg(sum("v").as("sv")))
    assert(canon(q) === direct)
    assert(scanRoots(q).forall(_.contains(view)) && scanRoots(q).nonEmpty)
    // grand total too
    val t = baseRead.agg(count(lit(1)).as("n"), sum("w").as("sw"))
    val td = unrewritten(
      spark.read.parquet(base).agg(count(lit(1)).as("n"), sum("w").as("sw")))
    assert(canon(t) === td)
    assert(scanRoots(t).forall(_.contains(view)))
  }

  test("filters on group columns ride the rewrite") {
    val q = baseRead.filter(col("g") =!= "g3").groupBy("g")
      .agg(count(lit(1)).as("n"), max("v").as("hi"))
    val direct = unrewritten(spark.read.parquet(base)
      .filter(col("g") =!= "g3")
      .groupBy("g").agg(count(lit(1)).as("n"), max("v").as("hi")))
    assert(canon(q) === direct)
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

  test("a STREAMING aggregate over the registered base is never rewritten") {
    // make the view deliberately STALE (half the base) — a rewrite would
    // emit the stale totals; the correct per-batch aggregation sees the
    // full base through the tail
    val staleView = java.nio.file.Files
      .createTempDirectory("graft-mvrw-stale").toString + "/mv"
    val sSpec = Spec(groupCols = Seq("g"), sumCols = Seq("v"))
    MaterializedAgg.mergeBatch(spark, staleView,
      graft.sources.ZLake.read(spark, base).filter(col("v") % 2 === 0),
      sSpec, 0L)
    MvRewrite.register(base, staleView, sSpec)
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-mvrw-stream-ck").toString
      val got = scala.collection.mutable.Map.empty[String, (Long, Long)]
      val q = spark.readStream.format("zlake").load(base)
        .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rs = b.collect()
          got.synchronized {
            got.clear()
            rs.foreach(r => got(r.getString(0)) =
              (r.getLong(1), r.getLong(2)))
          }
          ()
        }.start()
      q.processAllAvailable()
      q.stop()
      val truth = unrewritten(spark.read.parquet(base).groupBy("g")
        .agg(count(lit(1)).as("n"), sum("v").as("sv")))
        .map(r => r(0) -> ((r(1).toLong, r(2).toLong))).toMap
      assert(got.toMap === truth,
        "streaming aggregate was rewritten to the (stale) batch view")
    } finally {
      MvRewrite.register(base, view, spec) // restore the suite fixture
    }
  }

  test("the view's own maintenance is never self-rewritten") {
    // review-caught: an UNFILTERED catch-up merge's partial aggregate
    // over the registered base matches the rewrite shape exactly — if it
    // rewrites, the merge reads the (mid-maintenance, stale) view instead
    // of the batch and silently loses every row the view lacks
    val b2 = java.nio.file.Files
      .createTempDirectory("graft-mvrw-self").toString + "/t"
    val v2 = b2.stripSuffix("/t") + "/mv"
    val data = spark.range(600).select(
      concat(lit("g"), (col("id") % 4).cast("string")).as("g"),
      (col("id") % 101).as("v"))
    Sinks.zorderedWrite(data, "v", "v", b2, numFiles = 2, bits = 8)
    val sp2 = Spec(groupCols = Seq("g"), sumCols = Seq("v"))
    // view holds HALF the base, then gets registered (stale by design)
    MaterializedAgg.mergeBatch(spark, v2,
      graft.sources.ZLake.read(spark, b2).filter(col("v") % 2 === 0),
      sp2, 0L)
    MvRewrite.register(b2, v2, sp2)
    try {
      // the catch-up shape: UNFILTERED full-base merge
      MaterializedAgg.mergeBatch(spark, v2,
        graft.sources.ZLake.read(spark, b2), sp2, 1L)
      val got = MaterializedAgg.readView(spark, v2, sp2).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = data.filter(col("v") % 2 === 0).union(data)
        .groupBy("g").agg(count(lit(1)).as("cnt"), sum("v").as("v_sum"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got === want,
        "catch-up merge was self-rewritten against the stale view")
    } finally MvRewrite.unregister(b2)
  }

  test("SQL surface: a temp view over the lake rewrites too") {
    graft.sources.ZLake.read(spark, base).createOrReplaceTempView("mvrw_base")
    val q = spark.sql(
      "SELECT g, count(*) AS n, sum(v) AS sv FROM mvrw_base GROUP BY g")
    val direct = unrewritten(spark.sql(
      s"SELECT g, count(*) AS n, sum(v) AS sv FROM parquet.`$base` GROUP BY g"))
    assert(canon(q) === direct)
    assert(scanRoots(q).forall(_.contains(view)))
  }

  test("freshness guard: a base that outran maintenance keeps the scan " +
      "until refresh re-asserts coverage") {
    // r9 verdict #5: registration used to be a blind trust contract — one
    // stale registration silently served wrong aggregates. The registered
    // fingerprint now pins the base's file set; any journaled mutation
    // (here: an upsert inserting 20 new keys) flips the guard.
    val b = java.nio.file.Files
      .createTempDirectory("graft-mvrw-fresh").toString + "/t"
    val v = b.stripSuffix("/t") + "/mv"
    def mkRows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      concat(lit("g"), (col("id") % 4).cast("string")).as("g"),
      (col("id") % 53).as("v"), col("id").as("k"))
    Sinks.zorderedWrite(mkRows(0, 500), "v", "k", b, numFiles = 2, bits = 8)
    val sp = Spec(groupCols = Seq("g"), sumCols = Seq("v"))
    MaterializedAgg.mergeBatch(spark,
      v, graft.sources.ZLake.read(spark, b), sp, 0L)
    MvRewrite.register(b, v, sp)
    try {
      def q = graft.sources.ZLake.read(spark, b).groupBy("g")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      assert(scanRoots(q).forall(_.contains(v)), "fresh view must rewrite")
      // the base moves on WITHOUT maintenance
      graft.sinks.LakeDelete.upsertLake(spark, b, mkRows(500, 520), "k")
      val stale = q
      val roots = scanRoots(stale)
      assert(roots.nonEmpty && roots.forall(_.contains(b)),
        "stale view silently served a moved-on base")
      // oracle: the stale-fingerprint guard keeps this direct read on the
      // scan too (asserted), so the comparison is never view-vs-view
      val truthDf = spark.read.parquet(b).groupBy("g")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val truth = canon(truthDf)
      assert(scanRoots(truthDf).forall(_.contains(b)))
      assert(canon(stale) === truth)
      // maintenance catches up with exactly the delta, freshness re-asserts
      MaterializedAgg.mergeBatch(spark, v, mkRows(500, 520), sp, 1L)
      MvRewrite.refresh(b)
      val again = q
      assert(scanRoots(again).forall(_.contains(v)),
        "refresh did not re-arm the rewrite")
      assert(canon(again) === truth)
    } finally MvRewrite.unregister(b)
  }

  test("registry keys are fully qualified URIs: same path, different " +
      "filesystem/authority never collides") {
    // r9 advice: path-only keys collapsed s3://prod/tables/t and
    // s3://staging/tables/t to one entry, so a query over one lake could
    // be answered from the OTHER's view. Keys now carry scheme+authority
    // (unknown schemes fall back to the raw URI, preserving both).
    val spec = Spec(groupCols = Seq("g"), sumCols = Seq("v"))
    try {
      MvRewrite.register("s3a://prod/tables/t", "/views/prod_t", spec)
      MvRewrite.register("s3a://staging/tables/t", "/views/staging_t", spec)
      assert(MvRewrite.lookup("s3a://prod/tables/t")
        .map(_.viewRoot) === Some("/views/prod_t"))
      assert(MvRewrite.lookup("s3a://staging/tables/t")
        .map(_.viewRoot) === Some("/views/staging_t"),
        "staging lake's registration was clobbered by prod's (path-only key)")
      // and a scheme-less local path still agrees with its qualified form
      MvRewrite.register("/tables/local_t", "/views/local_t", spec)
      assert(MvRewrite.lookup("file:/tables/local_t")
        .map(_.viewRoot) === Some("/views/local_t"))
    } finally {
      MvRewrite.unregister("s3a://prod/tables/t")
      MvRewrite.unregister("s3a://staging/tables/t")
      MvRewrite.unregister("/tables/local_t")
    }
  }
}
