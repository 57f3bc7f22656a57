package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels
import graft.operators.Similarity

/** Multi-vector MaxSim late interaction (ColBERT): the exact lane must
  * match an independent plain-Scala scorer bit-for-bit (integer-micros
  * scores); the IVF-pruned serving lane must return a subset ranking
  * consistent with the exact lane at usable recall, and must keep its
  * candidate stage bounded (the plan's corpus side is probed cells, not
  * the corpus). */
class MaxSimSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 30 docs × 4 token vectors, 8-dim, deterministic and lumpy enough
  // that different docs win different query tokens
  private def tokVecs(r: Range): DataFrame = r.map { i =>
    (i.toLong / 4, i.toLong, i.toLong % 4,
      Array.tabulate(8)(d => (((i % 5) * 7 + d * (1 + i % 3)) % 23).toFloat))
  }.toDF("doc", "tok", "tokpos", "embedding")

  /** Independent reference: nested loops over unquantized floats via the
    * same q6 contract ([[Kernels.cosineQ6Arrays]] on ×1000 longs). */
  private def refScores(rows: Seq[(Long, Long, Array[Float])],
                        queryDocs: Set[Long]): Map[(Long, Long), Long] = {
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.round(x * 1000.0))
    val byDoc = rows.groupBy(_._1).view
      .mapValues(_.map(r => quant(r._3))).toMap
    val out = collection.mutable.Map[(Long, Long), Long]()
    for (qd <- queryDocs; (cd, cvs) <- byDoc if cd != qd) {
      val score = byDoc(qd).map { qv =>
        val best = cvs.map(cv => Kernels.cosineQ6Arrays(cv, qv)).max
        math.floor(best * 1000000.0 + 0.5).toLong
      }.sum
      out((qd, cd)) = score
    }
    out.toMap
  }

  test("exact MaxSim matches the independent scorer, micros-exact") {
    val data = tokVecs(0 until 120)
    val queries = data.filter(col("doc") < 3)
    val got = Similarity.maxSimTopK(data, col("doc"), col("embedding"),
        queries, col("doc"), col("tokpos"), col("embedding"), k = 29)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val rows = (0 until 120).map { i =>
      (i.toLong / 4, i.toLong % 4,
        Array.tabulate(8)(d => (((i % 5) * 7 + d * (1 + i % 3)) % 23).toFloat))
    }
    val want = refScores(rows.map(r => (r._1, r._2, r._3)), Set(0L, 1L, 2L))
    assert(got.size == want.size, s"${got.size} vs ${want.size} pairs")
    got.foreach { case (k2, v) =>
      assert(want(k2) == v, s"pair $k2: got $v want ${want(k2)}")
    }
  }

  test("ranking is deterministic: score desc, neighbor asc, dense rn") {
    val data = tokVecs(0 until 80)
    val r = Similarity.maxSimTopK(data, col("doc"), col("embedding"),
        data.filter(col("doc") === 0), col("doc"), col("tokpos"),
        col("embedding"), k = 10)
      .orderBy(col("rn")).collect()
    assert(r.map(_.getLong(3)).toSeq == (1L to 10L))
    val scores = r.map(x => (x.getLong(2), x.getLong(1)))
    assert(scores.sortBy { case (s, n) => (-s, n) }.toSeq == scores.toSeq)
  }

  test("the pruned serving lane agrees with exact on the candidates it " +
      "returns, and finds most of the exact top-5") {
    val data = tokVecs(0 until 120)
    val path = java.nio.file.Files
      .createTempDirectory("graft-maxsim").toString + "/idx"
    Similarity.writeIvfIndex(data, col("tok"), col("embedding"),
      data.filter(col("tok") < 8), col("tok"), col("embedding"), path)
    val queries = data.filter(col("doc") < 3)
    val exact = Similarity.maxSimTopK(data, col("doc"), col("embedding"),
        queries, col("doc"), col("tokpos"), col("embedding"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val pruned = Similarity.maxSimTopKIndexed(spark, path,
        data, col("doc"), col("tok"), col("embedding"),
        queries, col("doc"), col("tokpos"), col("embedding"),
        k = 5, nprobe = 2, tokK = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // every pruned pair's score is the EXACT MaxSim score (the rerank is
    // exact — pruning only shrinks the candidate set)
    val exactAll = {
      val rows = (0 until 120).map { i =>
        (i.toLong / 4, i.toLong % 4,
          Array.tabulate(8)(d =>
            (((i % 5) * 7 + d * (1 + i % 3)) % 23).toFloat))
      }
      refScores(rows, Set(0L, 1L, 2L))
    }
    pruned.foreach { case (k2, v) =>
      assert(exactAll(k2) == v, s"pruned pair $k2 rescored inexactly")
    }
    // recall@5 against exact, averaged over the 3 queries
    val recall = (0L until 3L).map { qd =>
      val e = exact.keys.filter(_._1 == qd).map(_._2).toSet
      val p = pruned.keys.filter(_._1 == qd).map(_._2).toSet
      (e & p).size.toDouble / math.max(1, e.size)
    }.sum / 3
    assert(recall >= 0.6, s"recall@5 $recall below the serving floor")
  }

  test("the exact lane's corpus side reaches the cosine kernel unshuffled " +
      "(broadcast queries, no corpus exchange before the first partial agg)") {
    val data = tokVecs(0 until 120)
    val df = Similarity.maxSimTopK(data, col("doc"), col("embedding"),
      data.filter(col("doc") < 3), col("doc"), col("tokpos"),
      col("embedding"), k = 5)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastNestedLoopJoin") ||
      s.contains("BroadcastHashJoin"),
      s"queries must broadcast, never shuffle the corpus to them:\n$s")
    // the join feeding the cosine kernel sits BELOW every exchange: the
    // first shuffle in the plan (reading bottom-up) must be the partial
    // aggregate's, not a join input's
    val lines = s.linesIterator.toSeq
    val joinIdx = lines.lastIndexWhere(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("BroadcastHashJoin"))
    val exchBelowJoin = lines.drop(joinIdx)
      .exists(l => l.contains("ShuffleExchange") || l.contains("ShuffleQueryStage"))
    assert(!exchBelowJoin,
      s"no exchange may sit below the scoring join:\n$s")
  }

  test("packed probe ids can never collide with corpus token ids") {
    // doc 0, tok 0 packs to 2^20 — strictly above any corpus token < 2^20,
    // so ivfTopKIndexed's self-id exclusion is vacuous by construction
    val data = tokVecs(0 until 40)
    val path = java.nio.file.Files
      .createTempDirectory("graft-maxsim-pack").toString + "/idx"
    Similarity.writeIvfIndex(data, col("tok"), col("embedding"),
      data.filter(col("tok") < 4), col("tok"), col("embedding"), path)
    val got = Similarity.maxSimTopKIndexed(spark, path,
      data, col("doc"), col("tok"), col("embedding"),
      data.filter(col("doc") === 0), col("doc"), col("tokpos"),
      col("embedding"), k = 3, nprobe = 1, tokK = 40)
    // with tokK covering every token, candidates = all docs sharing a
    // probed cell; doc 0 itself must never appear
    assert(!got.collect().exists(_.getLong(1) == 0L))
  }
}
