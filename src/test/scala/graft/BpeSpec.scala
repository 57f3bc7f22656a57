package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE tokenizer training + codegen'd encoding ([[Bpe]]): the trained
  * merges match an independently-written reference trainer, encoding
  * exactly reconstructs the input, the count lane agrees with the encode
  * lane, and training is invariant to the corpus' partitioning. */
class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Independent reference trainer: idiomatic-collections BPE (distinct
    * code shape from the production array loop). */
  private def refTrain(wordFreq: Map[String, Long], numMerges: Int,
                       minFreq: Long): Vector[(String, String)] = {
    var words: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      (w.map(String.valueOf(_)).toVector :+ "</w>") -> f
    }
    var merges = Vector.empty[(String, String)]
    var rounds = 0
    var stop = false
    while (rounds < numMerges && !stop) {
      val pairs = words.toSeq
        .flatMap { case (syms, f) =>
          syms.zip(syms.drop(1)).map(p => p -> f)
        }
        .groupBy(_._1).map { case (p, fs) => p -> fs.map(_._2).sum }
      val eligible = pairs.filter(_._2 >= minFreq)
      if (eligible.isEmpty) stop = true
      else {
        // max frequency, ties to the lexicographically smallest pair
        val best = eligible.toSeq
          .sortBy { case ((a, b), f) => (-f, a, b) }.head._1
        merges :+= best
        def applyMerge(syms: Vector[String]): Vector[String] = {
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
              syms(i + 1) == best._2) {
              out += (best._1 + best._2); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result()
        }
        words = words.groupBy { case (s, _) => applyMerge(s) }
          .map { case (s, m) => s -> m.values.sum }
        rounds += 1
      }
    }
    merges
  }

  private val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ Seq.fill(4)("nice")

  test("trained merges match an independent reference trainer") {
    val docs = corpus.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val model = Bpe.train(docs, col("text"), numMerges = 30, minFreq = 2L)
    val freq = corpus.groupBy(identity).map { case (w, ws) =>
      w -> ws.size.toLong
    }
    val want = refTrain(freq, 30, 2L)
    assert(model.merges == want,
      s"got ${model.merges.take(8)} want ${want.take(8)}")
    // the classic example learns suffix units: 'est</w>' must form
    assert(model.merges.exists { case (a, b) => a + b == "est</w>" })
  }

  test("encoding exactly reconstructs every document; count lane agrees") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(docs, col("text"), numMerges = 80,
      maxWords = 1 << 16, minFreq = 2L)
    val checked = docs.select(
        col("doc_id"),
        regexp_replace(col("text"), "\\s", "").as("nosp"),
        Bpe.encode(col("text"), model).as("toks"),
        Bpe.tokenCount(col("text"), model).as("cnt"))
      .select(col("doc_id"),
        (concat_ws("", transform(col("toks"),
          t => regexp_replace(t, "</w>", ""))) === col("nosp"))
          .as("conserved"),
        (size(col("toks")).cast("long") === col("cnt")).as("agree"),
        size(col("toks")).cast("long").as("n_tok"),
        length(col("nosp")).cast("long").as("n_chars"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      assert(r.getBoolean(1), s"doc ${r.getLong(0)} not reconstructed")
      assert(r.getBoolean(2), s"doc ${r.getLong(0)} count lane disagrees")
    }
    // compression sanity: merges actually fire (tokens < chars+words)
    val nTok = checked.map(_.getLong(3)).sum.toDouble
    val nChar = checked.map(_.getLong(4)).sum.toDouble
    assert(nTok < nChar, s"no compression: $nTok tokens vs $nChar chars")
  }

  test("training is deterministic across corpus partitionings") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.train(docs.repartition(7), col("text"), numMerges = 40)
    val b = Bpe.train(docs.repartition(3), col("text"), numMerges = 40)
    assert(a.merges == b.merges)
  }

  test("save/load round-trips the model; the loaded table encodes " +
      "identically") {
    val docs = corpus.toDF("text")
    val model = Bpe.train(docs, col("text"), numMerges = 25, minFreq = 2L)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bpe").toString + "/model"
    Bpe.save(model, path)
    val back = Bpe.load(spark, path)
    assert(back.merges == model.merges)
    val probe = Seq("newest", "widest", "offvocab").toDF("text")
    val a = probe.select(Bpe.encode(col("text"), model))
      .as[Seq[String]].collect().map(_.toList).toList
    val b = probe.select(Bpe.encode(col("text"), back))
      .as[Seq[String]].collect().map(_.toList).toList
    assert(a == b)
  }

  test("driver-side encodeWord agrees with the distributed kernel") {
    val docs = corpus.toDF("text")
    val model = Bpe.train(docs, col("text"), numMerges = 20, minFreq = 2L)
    val viaDf = Seq("newest", "lowest", "unseen")
      .toDF("text")
      .select(Bpe.encode(col("text"), model))
      .as[Seq[String]].collect()
    val viaDriver = Seq("newest", "lowest", "unseen")
      .map(w => model.encodeWord(w))
    assert(viaDf.map(_.toList).toList == viaDriver.map(_.toList))
  }
}
