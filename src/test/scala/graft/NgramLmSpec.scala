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

  /** Independent re-derivation of [[graft.functions.Kernels.lnFixMicros]]
    * in BigInt (different coding, same recurrence) — the integer
    * fixed-point log both engines replay. */
  private def lnm(v: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    var x = if (e <= 30) BigInt(v) << (30 - e)
            else (BigInt(v) + (BigInt(1) << (e - 31))) >> (e - 30)
    var f = BigInt(0)
    for (_ <- 0 until 20) {
      x = (x * x) >> 30
      if (x >= (BigInt(1) << 31)) { x >>= 1; f = f * 2 + 1 } else f = f * 2
    }
    ((((BigInt(e) << 20) + f) * BigInt(2839130852L) + (BigInt(1) << 31)) >> 32)
      .toLong
  }
  private def pen(alpha: Double): Long =
    lnm(math.round(alpha * 1e6)) - lnm(1000000L)

  private def refScore(text: String, n: Int, alpha: Double,
                       counts: Map[String, Long], total: Long): (Int, Long) = {
    val ts = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    var micros = 0L
    for (i <- ts.indices) {
      var k = math.min(n, i + 1); var backoffs = 0
      var num = -1L; var den = -1L
      while (num < 0 && k >= 2) {
        val cg = counts.getOrElse(ts.slice(i - k + 1, i + 1).mkString(" "), 0L)
        val cc = counts.getOrElse(ts.slice(i - k + 1, i).mkString(" "), 0L)
        if (cg > 0 && cc > 0) { num = cg; den = cc }
        else { backoffs += 1; k -= 1 }
      }
      if (num < 0) {
        val c1 = counts.getOrElse(ts(i), 0L)
        num = if (c1 > 0) c1 else 1L
        den = total
      }
      micros += lnm(num) - lnm(den) + backoffs * pen(alpha)
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

  test("parts tie back to the score exactly: logscore = Σlnm(num) − " +
      "Σlnm(den) + Σbackoffs·penalty (the q167 bisection contract)") {
    val t = NgramLm.train(docs, col("text"), n = 3, minCount = 2,
      maxGramsPerOrder = 100000)
    val probes = texts :+ "the cat sat on a zebra" :+ "unseen words only" :+ ""
    probes.foreach { p =>
      val u = UTF8String.fromString(p)
      val s = t.scoreText(u)
      val q = t.scoreParts(u)
      assert(q.getInt(0) === s.getInt(0), s"n_tokens for '$p'")
      assert(q.getLong(4) - q.getLong(5) +
        q.getLong(3) * t.penaltyMicros === s.getLong(1),
        s"parts must reconstruct the score for '$p'")
      // and every per-position num/den is a real count, 1, or the total:
      // the sums are bounded by n·max(count,total) (no negative lanes)
      assert(q.getLong(1) >= 0 && q.getLong(2) >= 0 && q.getLong(3) >= 0)
    }
  }

  test("OOV floor: a fully unseen unigram scores lnm(1) - lnm(total)") {
    val t = NgramLm.train(docs, col("text"), n = 2)
    val got = t.scoreText(UTF8String.fromString("zzz"))
    assert(got.getLong(1) === -lnm(t.total))
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
    // floor: one penalty + lnm(1) - lnm(total)
    val got = t.scoreText(UTF8String.fromString("sat quietly"))
    val satLn = lnm(t.count("sat")) - lnm(t.total)
    val quietLn = -lnm(t.total) + pen(0.4)
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
    val xLn = -lnm(10L) // OOV x: lnm(1) - lnm(total)
    // position 1: bigram 'x y' found but count('x')==0 -> back off to
    // unigram 'y' with one backoff penalty
    val yLn = lnm(2L) - lnm(10L) + pen(0.4)
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

  test("integer lnm matches the independent BigInt reference and true ln") {
    val t = NgramLm.train(docs, col("text"), n = 3)
    assert(t.lnMicros(1L) === 0L)
    assert(t.penaltyMicros === pen(0.4))
    // every count a score can touch, plus a sweep across the long range
    val probes = t.gramEntries.map(_._2).toVector :+ t.total :+ 1L
    val sweep = Vector(2L, 3L, 10L, 999L, 12345L, 1000000L, 1000000007L,
      1L << 40, (1L << 62) + 12345L,
      // the old carry-form overflow zone (v + 2^(e-31) past Long.Max):
      // the carry-free kernel must stay total and equal the BigInt
      // reference all the way to the top of the positive long range
      Long.MaxValue - (1L << 32) + 1, Long.MaxValue - 1, Long.MaxValue)
    (probes ++ sweep).foreach { v =>
      assert(t.lnMicros(v) === lnm(v), s"v=$v")
      assert(graft.functions.Kernels.lnFixMicros(v) === lnm(v), s"kernel v=$v")
      // the fixed-point log must actually BE ln·10⁶ (±2 micros), so the
      // determinism contract can't be met by degenerating the function
      val truth = StrictMath.log(v.toDouble) * 1e6
      assert(math.abs(lnm(v) - truth) <= 2.0, s"accuracy at v=$v: ${lnm(v)} vs $truth")
    }
  }

  test("a gate-scale capped model stays plan-shippable (serialized size)") {
    // the model is addReferenceObj'd into every scoring plan — pin the
    // serialized footprint of a 100k-gram model (the q167 cap) so a
    // representation change that bloats plans fails here, not on a cluster
    val m = new java.util.HashMap[String, java.lang.Long]()
    (0 until 100000).foreach(i => m.put(s"token$i context$i", (i % 97 + 2).toLong))
    val t = new NgramLmTable(2, 0.4, 1000000L, m)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(t); oos.close()
    assert(bos.size() < 8 * 1024 * 1024, s"serialized ${bos.size()} bytes")
  }

  test("the concurrent cap collects run inside the caller's job group " +
      "(ADVICE r14: global-pool threads dropped localProperties)") {
    val sc = spark.sparkContext
    val groups = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        groups.add(Option(e.properties)
          .map(_.getProperty("spark.jobGroup.id", "")).getOrElse("")); ()
      }
    }
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup("graft-lm-train", "cap collects must be cancellable")
      try NgramLm.train(docs, col("text"), n = 3)
      finally sc.clearJobGroup()
      // listener delivery is async — poll for the training jobs (≥ 4:
      // the total agg + 3 cap collects)
      val deadline = System.nanoTime() + 10_000_000_000L
      while (groups.size < 4 && System.nanoTime() < deadline)
        Thread.sleep(50)
      val seen = groups.toArray(Array.empty[String]).toSeq
      assert(seen.size >= 4, s"expected >=4 training jobs, saw $seen")
      assert(seen.forall(_ == "graft-lm-train"),
        s"every training job must carry the caller's job group: $seen")
    } finally sc.removeSparkListener(listener)
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
