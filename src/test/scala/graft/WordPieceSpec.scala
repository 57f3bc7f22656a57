package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WordPieceTable
import graft.operators.WordPiece
import graft.operators.WordPiece.WpModel

/** [[WordPiece]]: scored merge training (likelihood ratio, exact-rational
  * compare, incremental maintenance) vs an independent per-round-rescore
  * reference; BERT greedy longest-match encoding; corpus coverage. */
class WordPieceSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** Independent reference trainer: full rescore every round. */
  private def refTrain(wordCounts: Seq[(String, Long)], numMerges: Int,
                       minFreq: Long): Vector[(String, String)] = {
    var words = wordCounts.map { case (w, c) =>
      (WordPiece.initialSymbols(w).toVector, c)
    }
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val pairFreq = scala.collection.mutable.Map[(String, String), Long]()
      val symFreq = scala.collection.mutable.Map[String, Long]()
      words.foreach { case (w, c) =>
        w.foreach(s => symFreq(s) = symFreq.getOrElse(s, 0L) + c)
        w.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1))
          pairFreq(k) = pairFreq.getOrElse(k, 0L) + c
        }
      }
      val cand = pairFreq.toSeq.filter(_._2 >= minFreq)
      if (cand.isEmpty) done = true
      else {
        val best = cand.minBy { case ((a, b), f) =>
          // maximize f/(fa*fb): order by the NEGATED exact rational,
          // then pair — encode as a sortable key via BigInt cross-compare
          ((a, b), f)
        }(Ordering.fromLessThan[((String, String), Long)] {
          case (((a1, b1), f1), ((a2, b2), f2)) =>
            val l = BigInt(f1) * BigInt(symFreq(a2)) * BigInt(symFreq(b2))
            val r = BigInt(f2) * BigInt(symFreq(a1)) * BigInt(symFreq(b1))
            if (l != r) l > r
            else if (a1 != a2) a1 < a2
            else b1 < b2
        })._1
        merges += best
        val (a, b) = best
        val m = a + b.stripPrefix("##")
        words = words.map { case (w, c) =>
          val out = Vector.newBuilder[String]
          var k = 0
          while (k < w.length) {
            if (k < w.length - 1 && w(k) == a && w(k + 1) == b) {
              out += m; k += 2
            } else { out += w(k); k += 1 }
          }
          (out.result(), c)
        }
        round += 1
      }
    }
    merges.result()
  }

  private val docTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quicker brown foxes jumped over lazy dogs",
    "quick thinking wins the day every day",
    "winners win and thinkers think every single day",
    "the winner thinks quick thoughts over long days",
    "singing dogs and jumping foxes think quick",
    "long thoughts win over quick jumps every time",
    "time and thinking make winners of dogs and foxes")
  private lazy val docs =
    docTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def wordCounts(minFreq: Long): Seq[(String, Long)] =
    docTexts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
      .filter(_._2 >= minFreq).toSeq

  test("incremental scored merges are bit-identical to the full-rescore reference") {
    val got = WordPiece.train(docs, col("text"), numMerges = 40,
      minFreq = 2L).merges
    val ref = refTrain(wordCounts(2L), 40, 2L)
    assert(got === ref)
  }

  test("the score prefers cohesive pairs over merely frequent ones") {
    val d = (Seq.fill(5)("ab") ++ Seq.fill(8)("cd") ++
      Seq.fill(6)("ce") ++ Seq.fill(6)("cf") ++
      Seq.fill(6)("ed") ++ Seq.fill(6)("fd"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = WordPiece.train(d, col("text"), numMerges = 1, minFreq = 2L)
    // (a,##b): freq 5, syms 5·5 -> 0.2; (c,##d): freq 8, syms 20·20 -> 0.02
    assert(m.merges.head === (("a", "##b")))
  }

  test("greedy longest-match-first encoding") {
    val t = new WordPieceTable(Array(
      "un", "##aff", "##able", "##ffable", "u", "##n", "##a", "##f",
      "##b", "##l", "##e"))
    assert(t.encodeWord("unaffable").toSeq ===
      Seq("un", "##aff", "##able"))
  }

  test("a word with an unseen character is wholly [UNK]") {
    val t = new WordPieceTable(Array("a", "##b"))
    assert(t.encodeWord("abz").toSeq === Seq("[UNK]"))
    assert(t.encodeWord("ab").toSeq === Seq("a", "##b"))
    assert(t.encodeWord("x" * 201).toSeq === Seq("[UNK]"))
  }

  test("training-corpus coverage: no [UNK], characters conserved") {
    val m = WordPiece.train(docs, col("text"), numMerges = 30, minFreq = 2L)
    val rows = docs.select(col("doc_id"),
        regexp_replace(col("text"), "\\s", "").as("nosp"),
        WordPiece.encode(col("text"), m).as("toks"))
      .select(col("nosp"), col("toks"),
        concat_ws("", transform(col("toks"),
          t => regexp_replace(t, "^##", ""))).as("joined"))
      .collect()
    rows.foreach { r =>
      assert(!r.getSeq[String](1).contains("[UNK]"))
      assert(r.getString(2) === r.getString(0))
    }
  }

  test("rare words still encode: alphabet is uncapped") {
    // 'zyx' appears once (below minFreq) -> excluded from merge learning
    // but its characters must still be in the alphabet
    val d = docs.union(Seq((99L, "zyxq")).toDF("doc_id", "text"))
    val m = WordPiece.train(d, col("text"), numMerges = 10, minFreq = 2L)
    assert(!m.table.encodeWord("zyxq").contains("[UNK]"))
  }

  test("training is partition-invariant") {
    val a = WordPiece.train(docs.repartition(7), col("text"), 25, minFreq = 2L)
    val b = WordPiece.train(docs.coalesce(1), col("text"), 25, minFreq = 2L)
    assert(a.merges === b.merges)
    assert(a.alphabet === b.alphabet)
  }

  test("countTokens agrees with the encode lane") {
    val m = WordPiece.train(docs, col("text"), numMerges = 20, minFreq = 2L)
    val rows = docs.select(
        size(WordPiece.encode(col("text"), m)).cast("long").as("a"),
        WordPiece.countTokens(col("text"), m).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("save/load round-trips the model") {
    val m = WordPiece.train(docs, col("text"), numMerges = 20, minFreq = 2L)
    val path = java.nio.file.Files
      .createTempDirectory("graft-wp").toString + "/wp"
    WordPiece.save(m, path)
    val l = WordPiece.load(spark, path)
    assert(l.alphabet === m.alphabet)
    assert(l.merges === m.merges)
    val a = docs.select(WordPiece.encode(col("text"), m)).collect()
    val b = docs.select(WordPiece.encode(col("text"), l)).collect()
    assert(a.map(_.getSeq[String](0)).toSeq === b.map(_.getSeq[String](0)).toSeq)
  }
}
