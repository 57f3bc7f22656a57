package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AdaptiveSparkPlanHelper}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

/** DSIR importance resampling: the weight model must rank target-like
  * documents first, scoring must stay a zero-shuffle projection, and the
  * seeded Gumbel draw must be reproducible across partitionings. */
class DsirSpec extends AnyFunSuite with SparkSpec
    with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def corpus: DataFrame = (1L to 200L).map { i =>
    val t =
      if (i <= 60) s"alpha alpha beta quant w${i % 7}"       // target-like
      else s"gamma delta noise w${i % 11} w${i % 13}"
    (i, t)
  }.toDF("doc_id", "text")

  test("logRatioMicros: exact spelling of the smoothed log ratio") {
    val lam = Dsir.logRatioMicros(Array(8L, 0L), Array(4L, 4L))
    // Tt = 8+2 = 10, Tr = 8+2 = 10; the four-integer-log decomposition
    // lam = lnm(ct+1) − lnm(Tt) − lnm(cr+1) + lnm(Tr) (r13 — the
    // pure-integer fixed-point log, no libm, no product overflow)
    import graft.functions.Kernels.lnFixMicros
    val expect0 = lnFixMicros(9) - lnFixMicros(10) -
      lnFixMicros(5) + lnFixMicros(10)
    val expect1 = lnFixMicros(1) - lnFixMicros(10) -
      lnFixMicros(5) + lnFixMicros(10)
    assert(lam.toSeq == Seq(expect0, expect1))
    // ... and it must still BE the log ratio (±3 micros over 4 logs)
    val truth0 = math.log((9.0 / 10.0) / (5.0 / 10.0)) * 1e6
    assert(math.abs(expect0 - truth0) <= 3.0)
    assert(lam(0) > 0 && lam(1) < 0,
      "over-represented target bucket positive, absent bucket negative")
  }

  test("target-like documents out-weigh the rest; every doc is scored") {
    val d = corpus
    val target = d.filter(col("doc_id") <= 30) // half the target-like block
    val w = Dsir.scores(d, col("doc_id"), col("text"), target, col("text"),
        numBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.size == 200, "one weight per raw document")
    val tgt = (31L to 60L).map(w) // target-like docs NOT in the fit set
    val rest = (61L to 200L).map(w)
    assert(tgt.min > rest.max,
      s"target-like docs must dominate (min ${tgt.min} vs max ${rest.max})")
  }

  test("scoring is a zero-shuffle projection (log-ratio table is a plan " +
      "literal)") {
    val d = corpus
    val scored = Dsir.scores(d, col("doc_id"), col("text"),
      d.filter(col("doc_id") <= 30), col("text"), numBuckets = 32)
    scored.collect()
    val plan = scored.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val ex = collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }
    assert(ex.isEmpty, s"scoring must not shuffle:\n$plan")
  }

  test("select: k rows, keys are weight + Gumbel, partition-invariant, " +
      "seed-sensitive") {
    val d = corpus
    val target = d.filter(col("doc_id") <= 30)
    def run(df: DataFrame, seed: Long) =
      Dsir.select(df, col("doc_id"), col("text"), target, col("text"),
        k = 40, seed = seed, numBuckets = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run(d, 7L)
    assert(a.size == 40)
    assert(a == run(d.repartition(13), 7L),
      "the draw must not depend on partitioning")
    assert(a != run(d, 8L), "a different seed must draw differently")
    // Gumbel noise perturbs but the weight signal dominates on average:
    // most of the draw comes from the target-like block
    val fromTarget = a.count(_._1 <= 60)
    assert(fromTarget >= 30,
      s"importance sampling must favor target-like docs ($fromTarget/40)")
  }
}
