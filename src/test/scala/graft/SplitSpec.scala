package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainPrep

/** Deterministic named splits (r14): the hash-threshold assignment must
  * partition the corpus, hold its proportions, and — the property eval
  * sets live on — never move a document when OTHER documents arrive.
  * The exact variant must hit its per-stratum quotas to the row. */
class SplitSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def docs(n: Int): DataFrame =
    spark.range(0, n).select(col("id").as("doc_id"),
      concat(lit("l"), (col("id") % 3).cast("string")).as("lang"))

  test("splitAssign partitions, is deterministic, and holds proportions") {
    val d = docs(20000)
    val a = TrainPrep.splitAssign(d, col("doc_id"), weights, seed = 7)
    val byName = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet === Set("train", "val", "test"))
    assert(byName.values.sum === 20000L)
    // binomial noise at n=20000: |p̂ − p| under ~5σ ≈ 0.014
    assert(math.abs(byName("train") / 20000.0 - 0.8) < 0.02, byName)
    assert(math.abs(byName("val") / 20000.0 - 0.1) < 0.02, byName)
    // partition-invariant AND repeatable
    val b = TrainPrep.splitAssign(d.repartition(13), col("doc_id"),
      weights, seed = 7)
    assert(b.orderBy("doc_id").collect().toSeq ===
      a.orderBy("doc_id").collect().toSeq)
  }

  test("splitAssign is GROWTH-STABLE: new rows never move old ones") {
    val small = TrainPrep.splitAssign(docs(2000), col("doc_id"),
      weights, seed = 7).collect().map(r => r.getLong(0) -> r.getString(2))
      .toMap
    val grown = TrainPrep.splitAssign(docs(20000), col("doc_id"),
      weights, seed = 7).collect().map(r => r.getLong(0) -> r.getString(2))
      .toMap
    small.foreach { case (id, s) =>
      assert(grown(id) === s, s"doc $id moved splits when the corpus grew")
    }
  }

  test("splitAssign: different seeds draw different assignments") {
    val a = TrainPrep.splitAssign(docs(2000), col("doc_id"), weights, 7)
      .orderBy("doc_id").collect().map(r => r.getString(2)).toSeq
    val b = TrainPrep.splitAssign(docs(2000), col("doc_id"), weights, 8)
      .orderBy("doc_id").collect().map(r => r.getString(2)).toSeq
    assert(a !== b)
  }

  test("splitExact hits per-stratum quotas to the row") {
    val d = docs(3001) // strata of 1001, 1000, 1000
    val e = TrainPrep.splitExact(d, col("doc_id"), col("lang"),
      weights, seed = 7)
    val counts = e.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    Seq("l0" -> 1001L, "l1" -> 1000L, "l2" -> 1000L).foreach {
      case (lang, n) =>
        val train = 800000L * n / 1000000L
        val valB = 900000L * n / 1000000L
        assert(counts((lang, "train")) === train, s"$lang train")
        assert(counts((lang, "val")) === valB - train, s"$lang val")
        assert(counts((lang, "test")) === n - valB, s"$lang test")
    }
    // deterministic under repartition
    val e2 = TrainPrep.splitExact(d.repartition(11), col("doc_id"),
      col("lang"), weights, seed = 7)
    assert(e2.orderBy("doc_id").collect().toSeq ===
      e.orderBy("doc_id").collect().toSeq)
  }

  test("splitExact keeps caller columns that collide with its working " +
      "names (ADVICE r14: `_rk`/`_stratum`/`_n` were silently dropped)") {
    val d = docs(300)
      .withColumn("_rk", col("doc_id") * 2)
      .withColumn("_stratum", lit("mine"))
      .withColumn("_n", col("doc_id") + 7)
    val e = TrainPrep.splitExact(d, col("doc_id"), col("lang"),
      weights, seed = 7)
    assert(Seq("_rk", "_stratum", "_n").forall(e.columns.contains))
    val row = e.filter(col("doc_id") === 5L)
      .select("_rk", "_stratum", "_n").head()
    assert(row.getLong(0) === 10L && row.getString(1) === "mine" &&
      row.getLong(2) === 12L)
    // and the split assignment itself is unchanged by the collision
    val clean = TrainPrep.splitExact(docs(300), col("doc_id"), col("lang"),
      weights, seed = 7)
    assert(e.select("doc_id", "split").orderBy("doc_id").collect().toSeq ===
      clean.select("doc_id", "split").orderBy("doc_id").collect().toSeq)
  }

  test("weights must be named uniquely, positive, and sum to exactly 1") {
    intercept[IllegalArgumentException] {
      TrainPrep.splitAssign(docs(10), col("doc_id"),
        Seq("a" -> 0.5, "b" -> 0.6))
    }
    intercept[IllegalArgumentException] {
      TrainPrep.splitAssign(docs(10), col("doc_id"),
        Seq("a" -> 0.5, "a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      TrainPrep.splitAssign(docs(10), col("doc_id"),
        Seq("a" -> 1.0, "b" -> 0.0000001))
    }
  }
}
