package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontamination

/** Semantic decontamination ([[Decontamination.embeddingScores]]): exact
  * mode scores every pair, LSH mode flags a SUBSET of the exact flags
  * (bucket blocking only removes pairs) with usable recall, unmatched
  * docs surface unflagged, and the corpus side never shuffles before the
  * final per-doc aggregate. */
class EmbeddingDecontamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def corpus = emb.filter(col("vec_id") % 37 =!= 0)
  private def bench = emb.filter(col("vec_id") % 37 === 0)

  test("exact mode: every corpus doc scored, argmax deterministic, " +
      "threshold flags match a recomputed truth") {
    val got = Decontamination.embeddingScores(corpus, col("vec_id"),
        col("embedding"), bench, col("vec_id"), col("embedding"),
        threshold = 0.2)
      .select(col("doc_id"), col("max_cosine"), col("nearest_bench_id"),
        col("contaminated"))
      .as[(Long, Double, Long, Boolean)].collect()
    assert(got.length == corpus.count())
    got.foreach { case (_, mc, _, flag) =>
      assert(flag == (mc >= 0.2))
    }
    // determinism across partitionings
    val again = Decontamination.embeddingScores(corpus.repartition(7),
        col("vec_id"), col("embedding"), bench.repartition(2),
        col("vec_id"), col("embedding"), threshold = 0.2)
      .select(col("doc_id"), col("max_cosine"), col("nearest_bench_id"),
        col("contaminated"))
      .as[(Long, Double, Long, Boolean)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("LSH mode: flags are a subset of exact flags; recall is usable; " +
      "docs matching no bucket surface unflagged") {
    val exact = Decontamination.embeddingScores(corpus, col("vec_id"),
        col("embedding"), bench, col("vec_id"), col("embedding"), 0.2)
      .filter(col("contaminated"))
      .select("doc_id").as[Long].collect().toSet
    val lsh = Decontamination.embeddingScores(corpus, col("vec_id"),
        col("embedding"), bench, col("vec_id"), col("embedding"), 0.2,
        planes = 2)
    val flagged = lsh.filter(col("contaminated"))
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.subsetOf(exact),
      s"LSH fabricated flags: ${(flagged -- exact).take(5)}")
    if (exact.nonEmpty) {
      val recall = flagged.size.toDouble / exact.size
      assert(recall >= 0.25, // 2 planes ≈ 4 buckets: same-bucket odds for
        s"recall $recall too low") // near-identical vectors are high
    }
    // every corpus doc surfaces exactly once, matched or not
    assert(lsh.count() == corpus.count())
    assert(lsh.filter(col("max_cosine").isNull &&
      col("contaminated")).count() == 0L)
  }
}
