package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Exact-substring dedup (Lee et al. 2022 shape): duplicated n-token
  * windows keep only their first (doc, pos) occurrence; tokens covered by
  * any non-first occurrence are cut. The fixture pins the overlap
  * algebra — a duplicated span longer than the window is removed
  * wholesale from its copies, the first copy survives untouched, and
  * sub-window docs pass through — and the plan stays window-free with
  * text-free dedup exchanges (the paragraphDedup contract). */
class SubstringDedupSpec extends AnyFunSuite with SparkSpec
    with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e f g h"),             // owns the first "a b c d e f"
    (2L, "x a b c d e f y"),             // copy at pos 1 → x _ _ _ _ _ _ y
    (3L, "a b c d e f a b c d e f"),     // two copies back to back → empty
    (4L, "short one"),                   // below the window: untouched
    (5L, "")                             // empty text: zero tokens
  ).toDF("doc_id", "text")

  test("duplicated windows cut from non-first copies only") {
    val got = Dedup.substringDedup(docs, col("doc_id"), col("text"), 6)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 8L, 0L, "a b c d e f g h"),
      (2L, 8L, 6L, "x y"),
      (3L, 12L, 12L, ""),
      (4L, 2L, 0L, "short one"),
      (5L, 0L, 0L, "")))
  }

  test("within-doc duplicate: second copy cut, unique middle survives") {
    // "p q r" repeats inside one doc with unique filler between — only
    // the second window's tokens go
    val d = Seq((7L, "p q r u1 u2 u3 p q r")).toDF("doc_id", "text")
    val got = Dedup.substringDedup(d, col("doc_id"), col("text"), 3)
      .as[(Long, Long, Long, String)].head()
    assert(got == ((7L, 9L, 3L, "p q r u1 u2 u3")))
  }

  test("incremental lane equals the batch operator on the union") {
    val corpus = Seq(
      (1L, "a b c d e f g h"),
      (2L, "m n o p q r s t")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "x a b c d e f y"),          // dup of corpus doc 1's span
      (11L, "u1 u2 u3 u4 u5 u6 u7"),     // clean
      (12L, "u1 u2 u3 u4 u5 u6 u7")      // batch-internal dup of 11
    ).toDF("doc_id", "text")
    val lake = java.nio.file.Files
      .createTempDirectory("graft-gram-spec").toString + "/grams"
    Dedup.writeGramLake(corpus, col("doc_id"), col("text"), 6, lake)
    val inc = Dedup.incrementalSubstringDedup(batch, col("doc_id"),
        col("text"), 6, lake)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val full = Dedup.substringDedup(corpus.unionByName(batch),
        col("doc_id"), col("text"), 6)
      .filter(col("doc_id") >= 10L)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(inc == full, s"incremental must equal batch-over-union:\n$inc\n$full")
    assert(inc == Seq(
      (10L, 8L, 6L, "x y"),
      (11L, 7L, 0L, "u1 u2 u3 u4 u5 u6 u7"),
      (12L, 7L, 7L, "")))
  }

  test("plan: window-free, dedup exchanges are text-free") {
    val plan = Dedup.substringDedup(docs, col("doc_id"), col("text"), 6)
      .queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "substringDedup must not plan a window")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.types.StringType
    val exchanges = collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e }
    exchanges.foreach(e => e.outputPartitioning match {
      case HashPartitioning(exprs, _) =>
        assert(exprs.forall(_.dataType != StringType),
          s"text-keyed exchange: $exprs")
      case _ => ()
    })
    // the token array rides AT MOST one exchange (the doc_id join; AQE
    // may broadcast the removal starts instead, which is better still) —
    // the gram/first-occurrence lanes move only (doc_id, pos, h1, h2)
    val textExchanges = exchanges.filter(
      _.child.output.exists(_.name == "ts"))
    assert(textExchanges.size <= 1,
      s"token text must cross at most one exchange, got " +
        s"${textExchanges.size}")
  }
}
