package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{NgramLm, TrainPrep}

/** [[TrainPrep.curationBuckets]] — CCNet-style head/middle/tail by
  * per-token NLL with sketch-derived per-language cutoffs. */
class CurationSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // fluent docs repeat common patterns (low NLL); disfluent ones are
  // unique word salad (high NLL, every gram backs off to the OOV floor)
  private lazy val docs = {
    val fluent = (0 until 30).map(i =>
      (i.toLong, "the cat sat on the mat and the dog sat on the rug"))
    // 30/31/29: the 0.33/0.67 conservative ranks (30, 61) land exactly at
    // the fluent and mixed cluster boundaries
    val mixed = (30 until 61).map(i =>
      (i.toLong, s"the cat w$i sat q$i on the v$i mat"))
    val salad = (61 until 90).map(i =>
      (i.toLong, s"zq$i xv$i kj$i wp$i mn$i bl$i gh$i rt$i"))
    (fluent ++ mixed ++ salad).toDF("doc_id", "text")
  }

  private lazy val lm =
    NgramLm.train(docs, col("text"), n = 3, minCount = 2)

  private def run(d: org.apache.spark.sql.DataFrame) =
    TrainPrep.curationBuckets(d, col("doc_id"), col("text"), lm)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getString(4)))

  test("head holds the fluent docs, tail the word salad") {
    val rows = run(docs)
    val byBucket = rows.groupBy(_._4).view.mapValues(_.map(_._1).toSet).toMap
    assert((0L until 30L).toSet.subsetOf(byBucket("head")),
      "repeated fluent docs must land in head")
    assert((61L until 90L).toSet.subsetOf(byBucket("tail")),
      "OOV word salad must land in tail")
    // nll is monotone with the buckets
    val maxHead = rows.filter(_._4 == "head").map(_._3).max
    val minTail = rows.filter(_._4 == "tail").map(_._3).min
    assert(maxHead < minTail)
  }

  test("bucketing is partition-invariant") {
    val a = run(docs.repartition(7)).sortBy(_._1).toSeq
    val b = run(docs.coalesce(1)).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("token-free documents are dropped") {
    val withEmpty = docs.union(Seq((999L, "...")).toDF("doc_id", "text"))
    val rows = run(withEmpty)
    assert(!rows.exists(_._1 == 999L))
    assert(rows.length === 90)
  }

  test("the plan has no per-language sort (cutoff-and-compare shape)") {
    val df = TrainPrep.curationBuckets(docs, col("doc_id"), col("text"), lm)
    df.collect()
    def sorts(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          sorts(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          sorts(q.plan)
        case s: org.apache.spark.sql.execution.SortExec =>
          Seq(s.sortOrder.mkString(",")) ++ s.children.flatMap(sorts)
        case other => other.children.flatMap(sorts)
      }
    val found = sorts(df.queryExecution.executedPlan)
    assert(found.isEmpty, s"unexpected sorts in the curation plan: $found")
  }
}
