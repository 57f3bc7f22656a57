package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.ZLake

/** Manifest sketch stats: per-file HLL registers written beside the data
  * answer approx COUNT(DISTINCT) over any pruned lake slice at planning
  * time. Max-merge of a file subset's registers IS the union's sketch, so
  * the manifest path must agree EXACTLY (same doubles) with sketching the
  * same rows directly — not just approximately. */
class ManifestSketchSpec extends AnyFunSuite with SparkSpec {

  private val m = 256

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  /** 3 windows × 4 files; `uid` has ~5000 distinct values overall. */
  private def lake(): String = {
    val root = tmp("sketch")
    for (w <- 0 until 3)
      Sinks.zorderedWrite(
        spark.range(w * 20000L, w * 20000L + 20000)
          .select(col("id"), (col("id") % 64).as("a"), (col("id") % 7).as("b"),
            (col("id") % 5000).as("uid")),
        "a", "b", s"$root/win=w$w", 4, bits = 6,
        sketchCols = Seq("uid"), sketchM = m)
    root
  }

  /** The raw harmonic estimate of sketching `df[colName]` directly —
    * the ground truth the manifest path must reproduce exactly. */
  private def directEstimate(df: org.apache.spark.sql.DataFrame,
                             colName: String): Double = {
    val regs = df.agg(graft.functions.KernelAggs
        .hll_registers(col(colName).cast("string"), m).as("r"))
      .head().getSeq[Long](0).toArray
    val invSum = regs.map(r => math.pow(2.0, -r.toDouble)).sum
    0.7213 / (1.0 + 1.079 / m) * m * m / invSum
  }

  test("no-predicate estimate == sketching the whole lake directly") {
    val root = lake()
    val got = ZLake.approxDistinct(spark, root, "uid").get
    assert(got.filesUsed == 12 && got.filesTotal == 12)
    val want = directEstimate(spark.read.parquet(root), "uid")
    assert(got.estimate == want, s"${got.estimate} != $want")
    // and the estimate is actually a good one (5000 distinct, m=256)
    assert(math.abs(got.estimate - 5000.0) / 5000.0 < 0.15)
  }

  test("small-range regime: linear counting replaces the biased raw estimate") {
    // n ≪ m (40 distinct, m=256): the raw harmonic estimate runs ~3x high;
    // the small-range correction (linear counting over zero registers)
    // must bring the answer near truth — the common case of estimating a
    // tiny window slice of a big lake
    val root = tmp("sketch-small")
    Sinks.zorderedWrite(
      spark.range(4096).select(col("id"), (col("id") % 16).as("a"),
        (col("id") % 7).as("b"), (col("id") % 40).as("uid")),
      "a", "b", root, 4, bits = 4, sketchCols = Seq("uid"), sketchM = m)
    val got = ZLake.approxDistinct(spark, root, "uid").get
    assert(math.abs(got.estimate - 40.0) / 40.0 < 0.25,
      s"small-range estimate off: ${got.estimate} vs 40 true")
    // the raw formula really is in the biased regime here — the correction
    // changed the answer (guards against silently losing the branch)
    val raw = directEstimate(spark.read.parquet(root), "uid")
    assert(raw > got.estimate * 1.5, s"raw $raw vs corrected ${got.estimate}")
  }

  test("partition predicate: row-exact subset, registers merge per window") {
    val root = lake()
    val got = ZLake.approxDistinct(spark, root, "uid", Seq("win = 'w1'")).get
    assert(got.filesUsed == 4 && got.filesTotal == 12)
    val want = directEstimate(
      spark.read.parquet(root).filter(col("win") === "w1"), "uid")
    assert(got.estimate == want)
  }

  test("data predicate prunes files; estimate covers the surviving files") {
    val root = lake()
    val got = ZLake.approxDistinct(spark, root, "uid",
      Seq("a >= 0", "a <= 15")).get
    assert(got.filesUsed < got.filesTotal,
      s"expected file pruning, used ${got.filesUsed}/${got.filesTotal}")
    // zone granularity: the estimate sketches surviving FILES (a superset
    // of the matching rows), so it must be at least the direct estimate of
    // the matching rows and at most the whole lake's
    val lo = directEstimate(
      spark.read.parquet(root).filter(col("a").between(0, 15)), "uid")
    val hi = directEstimate(spark.read.parquet(root), "uid")
    assert(got.estimate >= lo * 0.999 && got.estimate <= hi * 1.001,
      s"${got.estimate} outside [$lo, $hi]")
  }

  test("no surviving file: estimate 0; missing sketch: None") {
    val root = lake()
    val none = ZLake.approxDistinct(spark, root, "uid", Seq("win = 'zz'")).get
    assert(none.estimate == 0.0 && none.filesUsed == 0)
    // a foreign append without sketches poisons coverage -> None
    spark.range(5).select(col("id"), (col("id") % 64).as("a"),
        (col("id") % 7).as("b"), col("id").as("uid"))
      .coalesce(1).write.mode("append").parquet(s"$root/win=w0")
    assert(ZLake.approxDistinct(spark, root, "uid").isEmpty)
    // ...but a scope that excludes the foreign file still answers
    assert(ZLake.approxDistinct(spark, root, "uid", Seq("win = 'w2'")).isDefined)
  }

  test("unknown predicate column throws") {
    val root = lake()
    intercept[IllegalArgumentException] {
      ZLake.approxDistinct(spark, root, "uid", Seq("nope = 1"))
    }
  }
}
