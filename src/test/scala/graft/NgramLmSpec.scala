package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NgramLmTable
import graft.operators.NgramLm

/** [[NgramLm]]: distributed stupid-backoff n-gram LM — training counts,
  * backoff arithmetic, pruning/cap determinism, persistence. */
class NgramLmSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat sat on the hat"),
    (2L, "the dog sat on the mat"),
    (3L, "a cat and a dog"),
    (4L, "the cat sat quietly")
  ).toDF("doc_id", "text")

  /** Independent reference: plain-Scala counts and scorer. */
  private def refCounts(texts: Seq[String], n: Int): Map[String, Long] = {
    val grams = texts.flatMap { t =>
      val ts = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      (1 to n).flatMap(o => ts.sliding(o).filter(_.size == o)
        .map(_.mkString(" ")))
    }
    grams.groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
  }

  private def refScore(text: String, n: Int, alpha: Double,
                       counts: Map[String, Long], total: Long): (Int, Long) = {
    val ts = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    var micros = 0L
    for (i <- ts.indices) {
      var k = math.min(n, i + 1); var backoffs = 0; var ratio = -1.0
      while (ratio < 0 && k >= 2) {
        val cg = counts.getOrElse(ts.slice(i - k + 1, i + 1).mkString(" "), 0L)
        val cc = counts.getOrElse(ts.slice(i - k + 1, i).mkString(" "), 0L)
        if (cg > 0 && cc > 0) ratio = cg.toDouble / cc.toDouble
        else { backoffs += 1; k -= 1 }
      }
      if (ratio < 0) {
        val c1 = counts.getOrElse(ts(i), 0L)
        ratio = (if (c1 > 0) c1.toDouble else 1.0) / total.toDouble
      }
      var s = 1.0
      for (_ <- 0 until backoffs) s *= alpha
      s *= ratio
      micros += math.floor(math.log(s) * 1000000.0 + 0.5).toLong
    }
    (ts.length, micros)
  }

  private val texts = Seq("the cat sat on the mat", "the cat sat on the hat",
    "the dog sat on the mat", "a cat and a dog", "the cat sat quietly")

  test("trained counts match an independent reference") {
    val t = NgramLm.train(docs, col("text"), n = 3)
    val ref = refCounts(texts, 3)
    assert(t.total === texts.map(_.split(" ").length).sum)
    ref.foreach { case (g, c) => assert(t.count(g) === c, s"gram '$g'") }
    assert(t.size === ref.size)
  }

  test("scores match the independent reference scorer, in and out of corpus") {
    val t = NgramLm.train(docs, col("text"), n = 3)
    val ref = refCounts(texts, 3)
    val probes = texts :+ "the cat sat on a zebra" :+ "unseen words only"
    probes.foreach { p =>
      val (nt, m) = refScore(p, 3, 0.4, ref, t.total)
      val got = t.scoreText(UTF8String.fromString(p))
      assert(got.getInt(0) === nt, s"n_tokens for '$p'")
      assert(got.getLong(1) === m, s"micros for '$p'")
    }
  }

  test("OOV floor: a fully unseen unigram scores ln(1/total)") {
    val t = NgramLm.train(docs, col("text"), n = 2)
    val got = t.scoreText(UTF8String.fromString("zzz"))
    val expect = math.floor(
      math.log(1.0 / t.total.toDouble) * 1000000.0 + 0.5).toLong
    assert(got.getLong(1) === expect)
  }

  test("training is partition-invariant") {
    val a = NgramLm.train(docs.repartition(7), col("text"), n = 3, minCount = 2)
    val b = NgramLm.train(docs.coalesce(1), col("text"), n = 3, minCount = 2)
    assert(a.total === b.total)
    assert(a.gramEntries.toMap === b.gramEntries.toMap)
  }

  test("minCount prunes; scoring backs off through the hole") {
    val t = NgramLm.train(docs, col("text"), n = 2, minCount = 2)
    assert(t.count("quietly") === 0) // appears once
    assert(t.count("the cat") === 3)
    // "sat quietly" (cnt 1) pruned -> position backs off to the unigram
    // floor: alpha * 1/total
    val got = t.scoreText(UTF8String.fromString("sat quietly"))
    val satLn = math.floor(
      math.log(t.count("sat").toDouble / t.total) * 1e6 + 0.5).toLong
    val quietLn = math.floor(
      math.log(0.4 * (1.0 / t.total)) * 1e6 + 0.5).toLong
    assert(got.getLong(1) === satLn + quietLn)
  }

  test("maxGramsPerOrder cap keeps the (cnt desc, gram asc) head") {
    val t = NgramLm.train(docs, col("text"), n = 1, maxGramsPerOrder = 2)
    // unigram counts: the=7, cat=4, sat=4, ... -> top-2 by (cnt desc,
    // gram asc) = the, then cat (beats sat on the tiebreak)
    assert(t.count("the") === 7L)
    assert(t.count("cat") === 4L)
    assert(t.size === 2)
    assert(t.count("sat") === 0L)
  }

  test("a capped-away context is a skipped level, not a crash") {
    val m = new java.util.HashMap[String, java.lang.Long]()
    m.put("x y", 5L); m.put("y", 2L) // bigram kept, its context 'x' absent
    val t = new NgramLmTable(2, 0.4, 10L, m)
    val got = t.scoreText(UTF8String.fromString("x y"))
    val xLn = math.floor(math.log(1.0 / 10.0) * 1e6 + 0.5).toLong // OOV x
    // position 1: bigram 'x y' found but count('x')==0 -> back off to
    // unigram 'y' with one backoff factor
    val yLn = math.floor(math.log(0.4 * (2.0 / 10.0)) * 1e6 + 0.5).toLong
    assert(got.getLong(1) === xLn + yLn)
  }

  test("save/load round-trips the model and its scores") {
    val t = NgramLm.train(docs, col("text"), n = 3, minCount = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ngramlm").toString + "/lm"
    NgramLm.save(t, path)
    val l = NgramLm.load(spark, path)
    assert(l.n === t.n && l.alpha === t.alpha && l.total === t.total)
    assert(l.gramEntries.toMap === t.gramEntries.toMap)
    val a = NgramLm.scores(docs, col("doc_id"), col("text"), t).collect()
    val b = NgramLm.scores(docs, col("doc_id"), col("text"), l).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("scores frame: empty doc gets null avg, zero micros") {
    val d2 = Seq((0L, "the cat"), (1L, ""), (2L, "...")).toDF("doc_id", "text")
    val t = NgramLm.train(docs, col("text"), n = 2)
    val rows = NgramLm.scores(d2, col("doc_id"), col("text"), t)
      .orderBy(col("doc_id")).collect()
    assert(rows(0).getLong(1) === 2L)
    Seq(1, 2).foreach { i =>
      assert(rows(i).getLong(1) === 0L)
      assert(rows(i).getLong(2) === 0L)
      assert(rows(i).isNullAt(3))
    }
  }
}
