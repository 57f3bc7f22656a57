package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** [[Dedup.semanticDedup]] (SemDeDup): min-id keep within every cell's
  * >=threshold cosine pairs; cross-cell pairs are never compared. */
class SemanticDedupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // two tight clusters on orthogonal axes + one lone vector: seeds 0 and 3
  // pull the clusters into separate cells
  private val dim = 4
  private def v(xs: Double*): Seq[Double] = xs.padTo(dim, 0.0)
  private lazy val corpus = Seq(
    (0L, v(1.0, 0.02)),        // cluster A
    (1L, v(0.99, 0.03)),       // dup of 0 (cos ~ 1)
    (2L, v(0.98, -0.01)),      // dup of 0
    (3L, v(0.0, 1.0)),         // cluster B
    (4L, v(0.02, 0.97)),       // dup of 3
    (5L, v(-0.7, -0.7))        // lone: near nothing in its cell
  ).toDF("vec_id", "embedding")

  private def run(threshold: Double) =
    Dedup.semanticDedup(corpus, col("vec_id"), col("embedding"),
        corpus.filter(col("vec_id").isin(0L, 3L)),
        col("vec_id"), col("embedding"), threshold)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2)))
      .toMap

  test("min-id survives; later near-duplicates in the same cell drop") {
    val res = run(0.98)
    assert(res(0L)._2, "cluster A representative (lowest id) must survive")
    assert(!res(1L)._2 && !res(2L)._2, "A's near-dups must drop")
    assert(res(3L)._2, "cluster B representative must survive")
    assert(!res(4L)._2, "B's near-dup must drop")
    assert(res(5L)._2, "the lone vector has no >=threshold neighbor")
  }

  test("clusters land in different cells — cross-cell pairs never compare") {
    val res = run(0.98)
    val cellA = res(0L)._1
    val cellB = res(3L)._1
    assert(cellA != cellB)
    assert(res(1L)._1 === cellA && res(2L)._1 === cellA)
    assert(res(4L)._1 === cellB)
  }

  test("threshold above every pair keeps the whole corpus") {
    val res = run(1.1)
    assert(res.values.forall(_._2))
    assert(res.size === 6)
  }

  test("output is one row per input, exhaustively") {
    assert(run(0.5).keySet === (0L to 5L).toSet)
  }

  test("incremental vs persisted index: index wins, batch order breaks ties") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semdd-inc").toString + "/idx"
    // index = the two-cluster corpus
    graft.operators.Similarity.writeIvfIndex(
      corpus, col("vec_id"), col("embedding"),
      corpus.filter(col("vec_id").isin(0L, 3L)),
      col("vec_id"), col("embedding"), dir)
    val batch = Seq(
      (100L, v(0.97, 0.01)),  // near cluster A's indexed rows -> drop
      (101L, v(0.01, 0.99)),  // near cluster B's indexed rows -> drop
      (102L, v(0.7, 0.7)),    // novel direction -> keep
      (103L, v(0.71, 0.69))   // near 102 (batch-internal, later id) -> drop
    ).toDF("vec_id", "embedding")
    val res = Dedup.incrementalSemanticDedup(spark, dir, batch,
        col("vec_id"), col("embedding"), threshold = 0.98)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(res === Map(100L -> false, 101L -> false,
      102L -> true, 103L -> false))
  }
}
