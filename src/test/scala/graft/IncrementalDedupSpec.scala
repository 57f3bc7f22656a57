package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Incremental MinHash dedup against a persisted signature lake
  * ([[Dedup.writeSignatureLake]] / [[Dedup.incrementalMinhashCandidates]]):
  * the new batch probes stored corpus signatures — equal to the batch
  * operator over the union restricted to pairs touching the batch, with
  * the corpus side never re-shingled, and hot corpus buckets degraded to
  * signature-group hubs. */
class IncrementalDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Seeded corpus over a small template pool, so near-dup band
    * collisions happen across any split. */
  private def docs(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    val templates = Vector.fill(15)(
      Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    (0 until n).map { i =>
      val t = templates(rnd.nextInt(templates.size))
      // a third of the docs perturb one word — near-dups, not exact
      val d = if (rnd.nextInt(3) == 0)
        t.split(" ").updated(rnd.nextInt(10), vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      else t
      (i.toLong, d)
    }
  }

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-siglake").toString + "/sigs"

  test("incremental ≡ batch over the union, restricted to batch pairs") {
    val all = docs(240, seed = 42)
    val corpus = all.filter(_._1 % 4 != 0).toDF("id", "text")
    val fresh = all.filter(_._1 % 4 == 0).toDF("id", "text")
    val lake = tmp()
    Dedup.writeSignatureLake(corpus, col("id"), col("text"),
      shingleN = 3, numHashes = 8, bands = 4, path = lake)
    val inc = Dedup.incrementalMinhashCandidates(fresh, col("id"),
        col("text"), shingleN = 3, numHashes = 8, bands = 4, sigPath = lake)
      .as[(Long, Long, Double)].collect().toSet
    val batch = Dedup.minhashCandidates(all.toDF("id", "text"),
        col("id"), col("text"), shingleN = 3, numHashes = 8, bands = 4)
      .as[(Long, Long, Double)].collect().toSet
      .filter(p => p._1 % 4 == 0 || p._2 % 4 == 0)
    assert(inc == batch,
      s"only-incremental: ${inc -- batch}\nonly-batch: ${batch -- inc}")
    assert(inc.nonEmpty, "vacuous fixture: no cross-split candidates")
  }

  test("hot corpus bucket degrades to signature-group hubs: bounded pairs") {
    val boiler = "same exact boilerplate text repeated every single time"
    val corpus = (0 until 500).map(i => (i.toLong, boiler)).toDF("id", "text")
    val fresh = (1000 until 1003).map(i => (i.toLong, boiler)).toDF("id", "text")
    val lake = tmp()
    Dedup.writeSignatureLake(corpus, col("id"), col("text"), 3, 8, 4, lake)
    val pairs = Dedup.incrementalMinhashCandidates(fresh, col("id"),
        col("text"), 3, 8, 4, lake, maxBucket = 50)
      .as[(Long, Long, Double)].collect().toSeq
    // 3 hub pairs (corpus sig-group hub 0 x each new doc) + 3 new-new
    // pairs — never 500 x 3 member pairs
    assert(pairs.size == 6, s"got ${pairs.size} pairs: $pairs")
    assert(pairs.forall(_._3 == 1.0))
    val corpusIds = pairs.map(_._1).filter(_ < 1000).toSet
    assert(corpusIds == Set(0L), s"non-hub corpus ids paired: $corpusIds")
  }

  test("appending the probed batch grows the corpus for the next batch") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val lake = tmp()
    Dedup.writeSignatureLake(Seq((1L, text)).toDF("id", "text"),
      col("id"), col("text"), 3, 8, 4, lake)
    val b = Seq((2L, text)).toDF("id", "text")
    val p1 = Dedup.incrementalMinhashCandidates(b, col("id"), col("text"),
      3, 8, 4, lake).as[(Long, Long, Double)].collect().toSet
    assert(p1 == Set((1L, 2L, 1.0)))
    Dedup.writeSignatureLake(b, col("id"), col("text"), 3, 8, 4, lake)
    val c = Seq((3L, text)).toDF("id", "text")
    val p2 = Dedup.incrementalMinhashCandidates(c, col("id"), col("text"),
      3, 8, 4, lake).as[(Long, Long, Double)].collect().toSet
    assert(p2 == Set((1L, 3L, 1.0), (2L, 3L, 1.0)))
  }

  test("corpus side plans a broadcast probe, not a corpus shuffle") {
    val lake = tmp()
    Dedup.writeSignatureLake(docs(60, 7).toDF("id", "text"),
      col("id"), col("text"), 3, 8, 4, lake)
    val fresh = docs(20, 8).map { case (i, t) => (i + 1000, t) }
      .toDF("id", "text")
    val df = Dedup.incrementalMinhashCandidates(fresh, col("id"),
      col("text"), 3, 8, 4, lake)
    df.collect()
    // the touched-corpus filter must be a broadcast join: no shuffle
    // exchange may sit between the parquet signature scan and the first
    // join it feeds
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
  }
}
