package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextClassifier

/** Multinomial Naive Bayes corpus classifier: separable classes recover
  * their labels, empty docs fall back to the prior argmax, ties break to
  * the smallest label, and training is partition-invariant (the whole
  * point of the closed-form trainer). */
class TextClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "aa", "apple banana cherry apple banana"),
    (2L, "aa", "apple cherry banana banana apple"),
    (3L, "aa", "banana apple apple cherry cherry"),
    (4L, "bb", "wolf bear tiger wolf bear"),
    (5L, "bb", "tiger wolf bear bear tiger"),
    (6L, "bb", "bear tiger tiger wolf wolf")
  ).toDF("doc_id", "lang", "text")

  test("separable classes classify correctly (resubstitution)") {
    val out = TextClassifier.naiveBayes(corpus, col("doc_id"), col("text"),
        col("lang"), vocabSize = 100)
      .orderBy("doc_id")
      .as[(Long, String, Double, Boolean)].collect()
    assert(out.length == 6)
    assert(out.forall(_._4), s"every doc must recover its label: ${out.toSeq}")
    assert(out.take(3).forall(_._2 == "aa"))
    assert(out.drop(3).forall(_._2 == "bb"))
  }

  test("held-out doc with mixed evidence goes to the majority tokens") {
    val test = Seq((10L, "??", "apple banana wolf apple")).toDF(
      "doc_id", "lang", "text")
    // train vocab/model on corpus ∪ test (resubstitution API); the test
    // doc's own tokens shift counts negligibly
    val out = TextClassifier.naiveBayes(corpus.unionByName(test),
        col("doc_id"), col("text"), col("lang"), vocabSize = 100)
      .filter(col("doc_id") === 10L)
      .as[(Long, String, Double, Boolean)].head()
    assert(out._2 == "??" || out._2 == "aa")
    // "??" has prior 1/7 and its only tokens are apple-class: if the
    // tiny "??" class does not win on its own three tokens, "aa" must
    assert(!out._4 || out._2 == "??")
  }

  test("empty doc scores by prior alone; ties break to smallest label") {
    val docs = Seq(
      (1L, "bb", "x y"), (2L, "bb", "x z"), (3L, "bb", "y z"),
      (4L, "aa", "p q"), (5L, "aa", "p r"), (6L, "aa", "q r"),
      (7L, "aa", "")
    ).toDF("doc_id", "lang", "text")
    val out = TextClassifier.naiveBayes(docs, col("doc_id"), col("text"),
        col("lang"), vocabSize = 100)
      .filter(col("doc_id") === 7L)
      .as[(Long, String, Double, Boolean)].head()
    // priors: aa = 4/7 > bb = 3/7 → empty doc goes to aa
    assert(out._2 == "aa" && out._4)
  }

  test("scores are partition-invariant") {
    val a = TextClassifier.naiveBayes(corpus, col("doc_id"), col("text"),
        col("lang"), vocabSize = 100)
      .orderBy("doc_id").as[(Long, String, Double, Boolean)].collect()
    val b = TextClassifier.naiveBayes(corpus.repartition(7), col("doc_id"),
        col("text"), col("lang"), vocabSize = 100)
      .orderBy("doc_id").as[(Long, String, Double, Boolean)].collect()
    assert(a.toSeq == b.toSeq)
  }
}
