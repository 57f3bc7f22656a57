package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, InSet}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Functions => F}
import graft.operators.DynamicPrune
import graft.sinks.Sinks
import graft.sources.ZLake

/** Join-driven dynamic file pruning: a selective dim's keys, planted as an
  * IN filter on the lake read, skip fact files at planning time. The key
  * lists here are past `spark.sql.optimizer.inSetConversionThreshold`
  * (default 10), so what reaches `listFiles` is the optimizer's `InSet`
  * form — the lane this spec exists to prove, in both directions:
  * envelope-range skipping (clustered keys) and bloom point skipping
  * (scattered keys, overlapping envelopes). Every pruning assertion is
  * paired with answer-equality against the unpruned join — the failure
  * mode of an unsound lane is LOSING fact rows. */
class DynamicPruneSpec extends AnyFunSuite with SparkSpec {

  private val files = 16

  /** 16k fact rows clustered by `k` (k rides the z-order), plus a
    * scattered high-cardinality `uid` whose per-file envelopes all
    * overlap (bloom territory). */
  private def fact(): DataFrame =
    spark.range(1 << 14)
      .withColumn("h", F.hash60(col("id").cast("string")))
      .select(col("id").as("fact_id"), (col("id") % 128).as("k"),
        (col("id") / 128 % 128).as("b"),
        concat(lit("u"), (col("h") % 100000).cast("string")).as("uid"),
        (col("h") % 1000).cast("long").as("v"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case f: FileSourceScanExec => f }
    if (scans.isEmpty) 0L else scans.map(_.metrics("numFiles").value).sum
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString("|"))

  test("clustered keys: InSet envelopes prune files, join answer intact") {
    val path = tmp("dfp-env")
    Sinks.zorderedWrite(fact(), "k", "b", path, files, bits = 7)
    // 12 keys from a narrow band of the clustered domain: most files'
    // k-envelopes exclude all of them
    val dim = spark.range(12).select((col("id") + 8).as("dk"),
      concat(lit("seg"), (col("id") % 2).cast("string")).as("seg"))

    val pruned = DynamicPrune.readSemiFiltered(spark, path, "k", dim, col("dk"))
    val n = filesRead(pruned)
    info(s"clustered keys: read $n/$files files")
    assert(n < files, s"expected file pruning, read $n/$files")

    val got = DynamicPrune.innerJoinPruned(spark, path, "k", dim, col("dk"))
      .groupBy("seg").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val want = spark.read.parquet(path)
      .join(dim, col("k") === col("dk"))
      .groupBy("seg").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(sortedRows(got) == sortedRows(want), "pruned join changed the answer")
  }

  test("scattered keys: InSet blooms prune where envelopes cannot") {
    val path = tmp("dfp-bloom")
    Sinks.zorderedWrite(fact(), "k", "b", path, files, bits = 7,
      bloomCols = Seq("uid"))
    val plain = spark.read.parquet(path)
    // 12 PRESENT uids: envelopes are useless (every file spans the uid
    // domain), blooms keep only the holders + design-rate false positives
    val present = plain.select("uid").distinct().limit(12)
    val nPresent = filesRead(
      DynamicPrune.readSemiFiltered(spark, path, "uid", present, col("uid")))
    info(s"12 present uids: read $nPresent/$files files")
    assert(nPresent < files, s"expected bloom pruning, read $nPresent/$files")

    val got = DynamicPrune
      .readSemiFiltered(spark, path, "uid", present, col("uid"))
      .agg(count(lit(1)), sum("v")).head().toSeq
    val want = plain.join(present.withColumnRenamed("uid", "pu"),
        col("uid") === col("pu"))
      .agg(count(lit(1)), sum("v")).head().toSeq
    assert(got == want, "bloom-pruned semi filter changed the answer")

    // 12 ABSENT uids: every file's bloom refutes them (false positives at
    // the design rate only) and the read returns nothing
    val absent = spark.range(12)
      .select(concat(lit("nope"), col("id").cast("string")).as("uid"))
    val prunedAbsent =
      DynamicPrune.readSemiFiltered(spark, path, "uid", absent, col("uid"))
    assert(prunedAbsent.count() == 0L)
    val nAbsent = filesRead(
      DynamicPrune.readSemiFiltered(spark, path, "uid", absent, col("uid")))
    info(s"12 absent uids: read $nAbsent/$files files")
    assert(nAbsent <= 4, s"absent keys kept $nAbsent files")
  }

  test("cap overflow degrades to the full lake, never a lost row") {
    val path = tmp("dfp-cap")
    Sinks.zorderedWrite(fact(), "k", "b", path, files, bits = 7)
    val dim = spark.range(40).select(col("id").as("dk"))
    val capped =
      DynamicPrune.readSemiFiltered(spark, path, "k", dim, col("dk"), maxKeys = 16)
    // superset contract: past the cap the lake comes back UNFILTERED
    assert(capped.count() == (1 << 14).toLong)
    val got = capped.join(dim, col("k") === col("dk")).count()
    val want = spark.read.parquet(path).join(dim, col("k") === col("dk")).count()
    assert(got == want)
  }

  test("empty and null-keyed dims") {
    val path = tmp("dfp-empty")
    Sinks.zorderedWrite(fact(), "k", "b", path, files, bits = 7)
    val empty = spark.range(1).select(col("id").as("dk")).filter(lit(false))
    assert(DynamicPrune
      .readSemiFiltered(spark, path, "k", empty, col("dk")).count() == 0L)
    // null keys are dropped (an equi join never matches NULL); the
    // remaining 11 real keys still filter exactly
    val withNulls = spark.range(12).select(
      when(col("id") === 0, lit(null)).otherwise(col("id")).as("dk"))
    val got = DynamicPrune
      .readSemiFiltered(spark, path, "k", withNulls, col("dk")).count()
    val want = spark.read.parquet(path)
      .filter(col("k").between(1, 11)).count()
    assert(got == want)
  }

  test("InSet lanes: mayMatch excludes disjoint sets, mustMatch proves constants") {
    val path = tmp("dfp-lanes")
    // two files: k constant 5 in one, constant 9 in the other
    spark.range(100).select(lit(5L).as("k"), col("id").as("x"))
      .coalesce(1).write.parquet(path + "/f5")
    val fes5 = ZLake.index(spark, path + "/f5").fes
    assert(fes5.nonEmpty)
    val attr = AttributeReference("k", LongType)()
    val fe = fes5.head
    assert(ZLake.mayMatch(InSet(attr, Set(5L, 77L)), fe))
    assert(!ZLake.mayMatch(InSet(attr, Set(6L, 77L)), fe),
      "disjoint InSet kept a provably-excluded file")
    // constant file, member present, zero nulls → every row provably in
    assert(ZLake.mustMatch(InSet(attr, Set(5L, 77L)), fe))
    assert(!ZLake.mustMatch(InSet(attr, Set(6L, 77L)), fe))
    // null member: never makes the predicate TRUE, never breaks the lane
    assert(!ZLake.mayMatch(InSet(attr, Set(null, 6L)), fe))
    assert(ZLake.mustMatch(InSet(attr, Set(null, 5L)), fe))
    // string attr takes the UTF8String internal-value path
    val sattr = AttributeReference("s", org.apache.spark.sql.types.StringType)()
    spark.range(10).select(lit("zz").as("s")).coalesce(1)
      .write.parquet(path + "/fs")
    val feS = ZLake.index(spark, path + "/fs").fes.head
    assert(ZLake.mayMatch(
      InSet(sattr, Set(UTF8String.fromString("zz"))), feS))
    assert(!ZLake.mayMatch(
      InSet(sattr, Set(UTF8String.fromString("aa"))), feS))
  }

  test("natural join key: dim sharing the fact key's NAME still joins") {
    // r9 advice: an unbound `col(keyCol) === dimKey` condition resolved
    // ambiguously when both sides carry the key name (the common layout —
    // fact.custkey ⨝ dim.custkey) and failed analysis. The condition now
    // binds each side explicitly through the reserved __graft_key alias.
    val path = tmp("dfp-natural")
    Sinks.zorderedWrite(fact(), "k", "b", path, files, bits = 7)
    val dim = spark.range(12).select((col("id") + 8).as("k"), // SAME name
      concat(lit("seg"), (col("id") % 2).cast("string")).as("seg"))
    val got = DynamicPrune.innerJoinPruned(spark, path, "k", dim, dim("k"))
      .groupBy("seg").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val want = spark.read.parquet(path).as("f")
      .join(dim.as("d"), col("f.k") === col("d.k"))
      .groupBy("seg").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(sortedRows(got) == sortedRows(want),
      "same-name key join diverged from the reference join")
  }
}
