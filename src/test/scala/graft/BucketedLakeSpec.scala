package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-free bucketed lakes ([[graft.sinks.Sinks.bucketedLakeWrite]] +
  * the `_graft_buckets.json` sidecar [[graft.sources.ZLake.relationWith]]
  * surfaces as a `BucketSpec`): the co-location contract travels with the
  * PATH, so two clusters sharing object storage get exchange-free joins
  * without a Hive metastore. Proven here, not assumed:
  *  - join of two same-bucketed lakes: ZERO shuffle exchanges, rows equal
  *    the flat join;
  *  - GROUP BY the bucket key: no exchange;
  *  - `key = literal`: the scan prunes to ONE bucket at planning time;
  *  - journaled append (the one mutation a bucketed lake supports) keeps
  *    the contract — post-append joins still plan exchange-free;
  *  - every rewriting mutation refuses fail-loud; deleteMoR composes
  *    (positions touch no file). */
class BucketedLakeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def executedOf(df: DataFrame) = {
    df.collect() // materialize so AQE finalizes its stages
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def shuffleCount(df: DataFrame): Int = {
    val executed = executedOf(df)
    executed.collect {
      case s: ShuffleExchangeExec => s
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
    }.size
  }

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def facts(n: Int) =
    Seq.tabulate(n)(i => ((i % 500).toLong, i.toLong, s"d$i"))
      .toDF("k", "v", "s")

  test("same-bucketed lakes join and aggregate with zero exchanges; " +
      "point lookups prune to one bucket") {
    val left = freshRoot("bkl") + "/left"
    val right = freshRoot("bkr") + "/right"
    graft.sinks.Sinks.bucketedLakeWrite(facts(3000), Seq("k"), 8, left)
    graft.sinks.Sinks.bucketedLakeWrite(
      Seq.tabulate(500)(i => (i.toLong, s"name$i")).toDF("k", "nm"),
      Seq("k"), 8, right)

    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val l = graft.sources.ZLake.read(spark, left)
      val r = graft.sources.ZLake.read(spark, right)
      val joined = l.join(r, "k")
      assert(joined.count() == 3000L)
      assert(shuffleCount(joined) == 0,
        s"bucketed join should plan no exchanges:\n${executedOf(joined)}")
      // rows equal the flat join
      val flat = facts(3000).as("f").join(
        Seq.tabulate(500)(i => (i.toLong, s"name$i")).toDF("k", "nm"), "k")
      assert(joined.select("k", "v", "s", "nm").except(
        flat.select("k", "v", "s", "nm")).isEmpty)

      // GROUP BY the bucket key: partial+final collapse onto the buckets
      val agg = l.groupBy("k").agg(sum("v").as("sv"))
      assert(agg.count() == 500L)
      assert(shuffleCount(agg) == 0,
        s"bucketed groupBy should plan no exchange:\n${executedOf(agg)}")

      // equality filter prunes whole buckets at planning time. A bare
      // filter+scan has no operator needing the distribution, so Spark's
      // DisableUnnecessaryBucketedScan trades pruning for parallelism by
      // default — turn the auto-disable off to pin the pruning behavior
      // (the trade-off knob is Spark's own, SPARK-32859).
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val point = l.filter(col("k") === 7L)
        point.collect()
        val scanMeta = executedOf(point).toString
        assert(scanMeta.contains("SelectedBucketsCount: 1 out of 8"),
          s"expected one selected bucket in:\n$scanMeta")
      } finally spark.conf.unset(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("journaled append keeps the contract; SQL INSERT INTO works; " +
      "mutations refuse; deleteMoR composes") {
    val root = freshRoot("bka") + "/t"
    graft.sinks.Sinks.bucketedLakeWrite(facts(1000), Seq("k"), 4, root)

    // journaled append routes through the declared hash
    val rep = graft.sinks.LakeDelete.appendLake(spark, root,
      Seq((1001L % 500, 9001L, "x1"), (1002L % 500, 9002L, "x2"))
        .toDF("k", "v", "s"))
    assert(rep.rowsInserted == 2L)
    // every data file's name still parses a bucket id
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val badNames = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith("."))
      .filterNot(n => "_(\\d+)(?:\\..*)?$".r.findFirstIn(n).isDefined)
    assert(badNames.isEmpty, s"untagged files after append: $badNames")

    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val self = graft.sources.ZLake.read(spark, root)
      val agg = self.groupBy("k").agg(count(lit(1)).as("n"))
      assert(shuffleCount(agg) == 0,
        s"post-append groupBy should stay exchange-free:\n${executedOf(agg)}")
      assert(self.count() == 1002L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    // SQL INSERT INTO goes through the same journaled, bucket-aware append
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW bkl_t USING zlake OPTIONS (path '$root')")
    spark.sql("INSERT INTO bkl_t VALUES (3, 9003, 'x3')")
    spark.sql("REFRESH TABLE bkl_t")
    assert(spark.table("bkl_t").count() == 1003L)

    // rewriting mutations refuse fail-loud, lake untouched
    def refused(f: => Any): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("bucketed lake"), e.getMessage)
    }
    refused(graft.sinks.LakeDelete.deleteFromLake(spark, root,
      col("v") === 1L))
    refused(graft.sinks.LakeDelete.updateLake(spark, root,
      Seq("s" -> lit("z")), col("v") === 1L))
    refused(graft.sinks.LakeDelete.upsertLake(spark, root,
      Seq((1L, 1L, "u")).toDF("k", "v", "s"), "k"))
    refused(graft.sinks.LakeDelete.rewriteLake(spark, root, ("k", "v"), 2))
    refused(graft.sinks.Sinks.compactLake(spark, root, "k", "v"))

    // merge-on-read delete composes: positions touch no file, so the
    // contract (and the exchange-free plan) survives; dv_compact refuses
    val mor = graft.sinks.DeletionVectors.deleteMoR(spark, root,
      col("v") === 9001L)
    assert(mor.rowsDeleted == 1L)
    assert(graft.sources.ZLake.read(spark, root).count() == 1002L)
    refused(graft.sinks.DeletionVectors.compact(spark, root))

    // append spec mismatch: rows missing the bucket key refuse
    val e2 = intercept[IllegalArgumentException](
      graft.sinks.LakeDelete.appendLake(spark, root,
        Seq((9004L, "x4")).toDF("v", "s")))
    assert(e2.getMessage.contains("bucket key"), e2.getMessage)
  }

  test("within-bucket compaction pools a fragmented bucket's files, " +
      "materializes deletion vectors, keeps joins exchange-free") {
    import graft.sinks.{DeletionVectors, LakeDelete, Sinks}
    import graft.sources.ZLake
    val root = freshRoot("bkc") + "/t"
    Sinks.bucketedLakeWrite(facts(1000), Seq("k"), 4, root)
    // fragment: three appends → up to 3 extra files per touched bucket
    for (i <- 0 until 3)
      LakeDelete.appendLake(spark, root,
        Seq.tabulate(40)(j => (((i * 40 + j) % 500).toLong,
          (9000 + i * 100 + j).toLong, s"a$i-$j")).toDF("k", "v", "s"))
    // a MoR delete whose vectors must materialize through compaction
    val mor = DeletionVectors.deleteMoR(spark, root,
      col("v").isin(9000L, 9101L, 7L))
    assert(mor.rowsDeleted == 3L)
    assert(DeletionVectors.present(spark, root))
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    def dataFiles(): Seq[String] = fs.listStatus(
      new org.apache.hadoop.fs.Path(root)).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith("."))
    val before = dataFiles()
    val wantRows = ZLake.read(spark, root)
      .select("k", "v", "s").as[(Long, Long, String)].collect().toSet

    val rep = Sinks.compactBucketedLake(spark, root)
    assert(rep.bucketsCompacted == 4, rep.toString) // every bucket eligible
    assert(rep.dvRowsMaterialized == 3L, rep.toString)
    val after = dataFiles()
    assert(after.size == 4,
      s"expected one file per bucket, got ${after.size}: $after")
    assert(after.size < before.size)
    // vectors are gone; every DV-guarded capability reopens
    assert(!DeletionVectors.present(spark, root))
    // rows identical (minus nothing — the MoR rows were already hidden)
    val got = ZLake.read(spark, root)
      .select("k", "v", "s").as[(Long, Long, String)].collect().toSet
    assert(got == wantRows)
    // names still bucket-tagged; joins and aggs still exchange-free
    assert(after.forall(n => "_(\\d+)\\.parquet$".r.findFirstIn(n).isDefined),
      s"untagged: $after")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val l = ZLake.read(spark, root)
      val agg = l.groupBy("k").agg(sum("v").as("sv"))
      assert(shuffleCount(agg) == 0,
        s"post-compaction groupBy must stay exchange-free:\n${executedOf(agg)}")
      val other = freshRoot("bkc2") + "/dim"
      Sinks.bucketedLakeWrite(
        Seq.tabulate(500)(i => (i.toLong, s"n$i")).toDF("k", "nm"),
        Seq("k"), 4, other)
      val joined = l.join(ZLake.read(spark, other), "k")
      joined.collect()
      assert(shuffleCount(joined) == 0,
        s"post-compaction join must stay exchange-free:\n${executedOf(joined)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    // no-op when already compact; SQL verb round-trips
    val rep2 = Sinks.compactBucketedLake(spark, root)
    assert(rep2.bucketsCompacted == 0 && rep2.filesAfter == 4)
    LakeDelete.appendLake(spark, root,
      Seq((77L, 9999L, "tail")).toDF("k", "v", "s"))
    val sqlRep = spark.sql(s"CALL graft.bucket_compact('$root')").collect()
    assert(sqlRep(0).getInt(0) >= 1, sqlRep(0).toString)
    assert(dataFiles().size == 4)
  }
}
