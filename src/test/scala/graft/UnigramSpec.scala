package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UnigramTable
import graft.operators.Unigram

/** Unigram-LM tokenizer (Kudo 2018): Viterbi argmax correctness on a
  * hand-built table, EM monotonicity, byte-exact round trips (spaces,
  * runs of spaces, CJK, punctuation), the <unk> id lane, partition
  * invariance of training, and the save/load contract. */
class UnigramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log"),
    (3L, "cats and dogs and cats"),
    (4L, "双语 text mixed 双语 tokens"),
    (5L, "punct, punct! and punct?"),
    (6L, "the the the cat cat dog")
  ).toDF("doc_id", "text")

  private lazy val model =
    Unigram.train(corpus, col("text"), vocabSize = 80,
      maxPieceLen = 6, seedSize = 512, emRounds = 2)

  test("viterbi picks the higher-probability segmentation") {
    val t = new UnigramTable(
      Array("▁ab", "▁a", "b", "c", "▁"),
      Array(-1.0, -1.0, -1.0, -1.0, -1.0))
    // one piece at -1.0 beats two pieces at -2.0
    assert(t.segmentUnit("▁ab").toSeq == Seq("▁ab"))
    // forced two-piece path when the fused piece is absent
    assert(t.segmentUnit("▁ac").toSeq == Seq("▁a", "c"))
  }

  test("EM rounds never increase corpus NLL at fixed vocabulary") {
    val h = model.nllHistory.take(2) // rounds before the first prune
    assert(h.size == 2)
    assert(h(1) <= h(0) + 1e-9, s"EM must not increase NLL: $h")
  }

  test("round trip is byte-exact on the training corpus") {
    val bad = corpus.select(col("doc_id"),
        Unigram.decode(Unigram.encode(col("text"), model), model)
          .as("rt"), col("text"))
      .filter(col("rt") =!= col("text")).count()
    assert(bad == 0)
  }

  test("round trip survives space runs, leading/trailing space, empty") {
    val t = model.table
    for (s <- Seq("", " ", "the  cat", " cat", "cat ", "a   b",
        "双语 punct!", "the cat sat")) {
      val dec = t.decodeTokens(t.encodeText(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))).toString
      assert(dec == s, s"round trip broke on '$s' -> '$dec'")
    }
  }

  test("ids: in range, byte-exact inverse, OOV char hits <unk>=0") {
    val vs = model.vocabSize
    val rows = corpus.select(col("doc_id"),
        Unigram.encodeIds(col("text"), model).as("ids"), col("text"))
      .select(col("doc_id"),
        forall(col("ids"), id => id >= 0 && id < lit(vs)).as("in_vocab"),
        (Unigram.decodeIds(col("ids"), model) === col("text")).as("rt"))
      .as[(Long, Boolean, Boolean)].collect()
    assert(rows.forall(r => r._2 && r._3))
    // a char the corpus never saw: encodes (never throws), flags unk
    val t = model.table
    val ids = t.encodeIds(
      org.apache.spark.unsafe.types.UTF8String.fromString("the ZZé"))
    val got = (0 until ids.numElements()).map(ids.getInt)
    assert(got.contains(0), s"OOV char must map to <unk>=0, got $got")
  }

  test("training is partition-invariant (bit-identical model)") {
    val a = Unigram.train(corpus.repartition(7), col("text"),
      vocabSize = 80, maxPieceLen = 6, seedSize = 512, emRounds = 2)
    assert(a.pieces == model.pieces)
    assert(a.logProbs == model.logProbs)
  }

  test("token count matches the materialized encoding") {
    val bad = corpus.select(
        Unigram.tokenCount(col("text"), model).as("n"),
        size(Unigram.encode(col("text"), model)).cast("long").as("m"))
      .filter(col("n") =!= col("m")).count()
    assert(bad == 0)
  }

  test("save/load round trip preserves the model exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-unigram").toString + "/model"
    Unigram.save(model, dir)
    val back = Unigram.load(spark, dir)
    assert(back.pieces == model.pieces)
    assert(back.logProbs == model.logProbs)
    val bad = corpus.select(
        (Unigram.decode(Unigram.encode(col("text"), back), back)
          === col("text")).as("ok"))
      .filter(!col("ok")).count()
    assert(bad == 0)
  }
}
