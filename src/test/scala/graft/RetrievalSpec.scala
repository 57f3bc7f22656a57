package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AdaptiveSparkPlanHelper}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** BM25 + inverted index + RRF hybrid: ranking behavior (tf/idf/length
  * normalization), the zero-shuffle scoring plan, bucket-pruned index
  * probes, build∘append ≡ full build, and exact integer rank fusion. */
class RetrievalSpec extends AnyFunSuite with SparkSpec
    with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/idx"

  private def scores(d: DataFrame, terms: Seq[String]): Map[Long, Long] =
    Retrieval.bm25Scores(d, col("doc_id"), col("text"), terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("tf raises the score, length normalization lowers it, rare terms " +
      "outweigh common ones") {
    val d = docs(
      1L -> "cat dog",            // tf(cat)=1, dl=2
      2L -> "cat cat dog",        // tf(cat)=2 — must beat doc 1
      3L -> "cat dog dog dog dog dog dog dog", // tf=1, longer — below doc 1
      4L -> "dog dog",
      5L -> "dog bird")
    val s = scores(d, Seq("cat"))
    assert(s.keySet == Set(1L, 2L, 3L), "only matching docs emit scores")
    assert(s(2L) > s(1L), "higher tf must score higher")
    assert(s(1L) > s(3L), "longer doc at equal tf must score lower")

    // 'bird' (df=1) must contribute more than 'dog' (df=5) at equal tf/dl
    val s2 = scores(d, Seq("bird", "dog"))
    val birdOnly = s2(5L)
    val dogOnly = s2(4L)
    assert(birdOnly > dogOnly,
      s"rare term must outweigh common term ($birdOnly vs $dogOnly)")
  }

  test("scoring is one zero-shuffle projection (stats ride as literals)") {
    val d = docs((1L to 50L).map(i => i -> s"tok$i cat dog"): _*)
    val scored = Retrieval.bm25Scores(d, col("doc_id"), col("text"),
      Seq("cat", "tok7"))
    scored.collect()
    val plan = scored.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val ex = collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }
    assert(ex.isEmpty, s"scoring must not shuffle:\n$plan")
  }

  test("index probe reads only the query terms' buckets and matches the " +
      "direct scan's top-k exactly") {
    val d = docs((1L to 200L).map(i =>
      i -> s"w${i % 31} w${i % 17} cat ${if (i % 50 == 0) "rare" else "dog"}"): _*)
    val path = tmp("bm25")
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), path,
      nBuckets = 16)
    val probe = Retrieval.searchBm25Index(spark, path, Seq("rare", "cat"), 10)
    val direct = Retrieval.bm25TopK(d, col("doc_id"), col("text"),
      Seq("rare", "cat"), 10)
    assert(probe.collect().map(_.toSeq).toSeq ==
      direct.collect().map(_.toSeq).toSeq,
      "pruned index probe must equal the direct-scan ranking")

    // the postings scan must touch ≤ 2 bucket partitions (2 query terms)
    val hits = spark.read.parquet(path)
      .filter(col("bucket").isin(Seq("rare", "cat").map(t =>
        Integer.valueOf((graft.functions.Kernels.hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
          % 16L).toInt)): _*))
    hits.collect()
    val plan = hits.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val parts = scans.map(_.metrics("numPartitions").value).sum
    assert(parts <= 2, s"probe must prune to the terms' buckets, read $parts")
  }

  test("append ≡ full build: same stats sidecar, same rankings") {
    val d = docs((1L to 120L).map(i =>
      i -> s"alpha w${i % 13} ${if (i % 3 == 0) "beta" else "gamma"}"): _*)
    val full = tmp("bm25-full"); val inc = tmp("bm25-inc")
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), full, 8)
    Retrieval.writeBm25Index(d.filter(col("doc_id") <= 60),
      col("doc_id"), col("text"), inc, 8)
    Retrieval.appendBm25Index(d.filter(col("doc_id") > 60),
      col("doc_id"), col("text"), inc)
    val q = Seq("alpha", "beta")
    assert(Retrieval.searchBm25Index(spark, inc, q, 25).collect().toSeq ==
      Retrieval.searchBm25Index(spark, full, q, 25).collect().toSeq,
      "appended index must rank identically to a fresh full build")
  }

  test("MLT term selection matches an independent tf·idf recount, " +
      "respects both gates and the top cut") {
    val d = docs((1L to 80L).map(i =>
      i -> (s"common w${i % 9} " +
        (if (i % 4 == 0) "scarce scarce " else "") +
        (if (i == 5) "cat cat cat dog dog unique bird" else "filler"))): _*)
    val path = tmp("mlt-sel")
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), path, 16)
    val src = "cat cat cat dog dog scarce scarce common unique bird bird"

    // independent recount: same tokenizer contract, df by corpus scan
    val corpus = d.collect().map(r => r.getLong(0) ->
      r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet).toMap
    val toks = src.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val tf = toks.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val expected = tf.filter(_._2 >= 2).keys.toSeq
      .map { t =>
        val df = corpus.values.count(_.contains(t)).toLong
        val m = math.floor(math.log(
          1.0 + (80.0 - df.toDouble + 0.5) / (df.toDouble + 0.5))
          * 1e6 + 0.5).toLong
        (t, tf(t), df, tf(t) * m)
      }
      .filter(_._3 >= 1)
      .sortBy { case (t, _, _, s) => (-s, t) }.take(3)
    val got = Retrieval.mltSelectTerms(spark, path, src, maxQueryTerms = 3)
      .map(m => (m.term, m.tf, m.df, m.selMicros))
    assert(got == expected, s"selection must replay the recount:\n$got\n$expected")
    // tf gate: 'unique' (tf=1) must never be a candidate even though its
    // idf is the corpus maximum
    assert(!got.exists(_._1 == "unique"))
    // high-tf·high-idf beats high-tf·low-idf: 'cat' (tf=3, df=1) first
    assert(got.head._1 == "cat")
  }

  test("moreLikeThis excludes the source document before the top-k cut " +
      "and equals the probe over the selected terms") {
    val d = docs((1L to 60L).map(i =>
      i -> (s"base w${i % 7} " +
        (if (i % 5 == 0) "topic topic " else "") +
        (if (i == 9) "topic topic theme theme motif" else ""))): _*)
    val path = tmp("mlt-probe")
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), path, 16)
    val src = d.filter(col("doc_id") === 9)
      .select(col("text")).head().getString(0)
    val sel = Retrieval.mltSelectTerms(spark, path, src, maxQueryTerms = 4)
    assert(sel.nonEmpty)
    val like = Retrieval.moreLikeThis(spark, path, src, k = 10,
      excludeDocId = Some(9L), maxQueryTerms = 4)
    val got = like.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(!got.exists(_._1 == 9L), "source doc must be excluded")
    // the source doc scores #1 on its own terms, so an exclusion applied
    // AFTER the cut would return only 9 rows here — demand the full 10
    val ref = Retrieval.searchBm25Index(spark, path, sel.map(_.term), 11)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ref.exists(_._1 == 9L),
      "fixture must put the source doc inside the raw top-k window")
    assert(got == ref.filterNot(_._1 == 9L).take(10),
      "moreLikeThis must equal the selected-term probe minus the source")
  }

  test("snippets: distinct terms beat raw hits, total hits break distinct " +
      "ties, earliest start breaks full ties, short docs are one window") {
    val d = docs(
      // window of 3: [cat dog x] has 2 distinct; [cat cat cat] has 3 hits
      // but 1 distinct — distinct must win
      1L -> "cat cat cat pad pad cat dog pad",
      // equal distinct everywhere; the window with MORE total hits wins
      2L -> "cat pad pad pad cat cat pad",
      // full tie: two identical windows — the earliest start wins
      3L -> "cat pad pad cat pad",
      // shorter than the window: the doc is its own window, start 0
      4L -> "dog cat")
    val out = Retrieval.snippets(d, col("doc_id"), col("text"),
        Seq("cat", "dog"), w = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // [pad cat dog] at 4 and [cat dog pad] at 5 both hold 2 distinct /
    // 2 hits — the 3-hit single-term [cat cat cat] window must lose to
    // both, and the tie resolves to the EARLIER of the two
    assert(out(1L) == ((4L, 2L, 2L, "pad cat dog")),
      s"distinct beats hits: ${out(1L)}")
    assert(out(2L) == ((3L, 1L, 2L, "pad cat cat")),
      s"total breaks distinct ties: ${out(2L)}")
    assert(out(3L) == ((0L, 1L, 1L, "cat pad pad")),
      s"earliest start on full tie: ${out(3L)}")
    assert(out(4L) == ((0L, 2L, 2L, "dog cat")),
      s"short doc is its own window: ${out(4L)}")
  }

  test("snippet kernel equals brute-force window enumeration on 300 " +
      "randomized documents") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val terms = Vector("a", "c")
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(12) // includes 0-token docs
      val w = 1 + rnd.nextInt(5)
      val ts = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val got = graft.functions.Kernels.bestWindow(
        new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any]),
        new GenericArrayData(terms.map(UTF8String.fromString).toArray[Any]),
        w).toLongArray.toSeq
      val starts = 0 to math.max(n - w, 0)
      val expect = starts.map { s =>
        val win = ts.slice(s, s + w)
        (terms.count(win.contains).toLong, win.count(terms.contains).toLong, s.toLong)
      }.zipWithIndex.maxBy { case ((dh, th, s), _) => (dh, th, -s) }._1
      assert(got == Seq(expect._3, expect._1, expect._2),
        s"kernel vs brute mismatch: ts=$ts w=$w got=$got expect=$expect")
    }
  }

  test("searchWithSnippets: snippets ride the top-k result rows only") {
    val d = docs((1L to 100L).map(i =>
      i -> s"w${i % 23} cat ${if (i % 10 == 0) "rare cat" else "dog"}"): _*)
    val path = tmp("snip")
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), path, 16)
    val out = Retrieval.searchWithSnippets(spark, path, d, col("doc_id"),
      col("text"), Seq("rare", "cat"), k = 7, w = 3).collect()
    assert(out.length == 7)
    // ranking identical to the plain probe; every snippet holds a term
    val plain = Retrieval.searchBm25Index(spark, path, Seq("rare", "cat"), 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == plain)
    assert(out.forall(r => r.getString(3).split(" ")
      .exists(Set("rare", "cat"))))
  }

  test("streamed index maintenance: per-batch appends converge to the " +
      "batch-built index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 90L).map(i =>
      i -> s"alpha w${i % 13} ${if (i % 3 == 0) "beta" else "gamma"}")
    val streamed = tmp("bm25-stream"); val batch = tmp("bm25-batch")
    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-bm25-ck").toString
    val q = mem.toDS().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!Retrieval.indexExists(b.sparkSession, streamed))
          Retrieval.writeBm25Index(b, col("doc_id"), col("text"),
            streamed, nBuckets = 8)
        else
          Retrieval.appendBm25Index(b, col("doc_id"), col("text"), streamed)
      }.start()
    rows.grouped(30).foreach { g =>
      mem.addData(g: _*); q.processAllAvailable()
    }
    q.stop()
    Retrieval.writeBm25Index(rows.toDF("doc_id", "text"),
      col("doc_id"), col("text"), batch, nBuckets = 8)
    val terms = Seq("alpha", "beta")
    assert(
      Retrieval.searchBm25Index(spark, streamed, terms, 25).collect().toSeq ==
      Retrieval.searchBm25Index(spark, batch, terms, 25).collect().toSeq,
      "three streamed appends must rank identically to one batch build")
  }

  test("RRF fusion: exact integer points, both-pools docs outrank " +
      "single-pool docs at similar ranks") {
    // round(1e6/(60+rank)) spot values
    def pts(rank: Long): Long = {
      val c = 60L; val num = 2L * 1000000L + (c + rank)
      (num - (num % (2L * (c + rank)))) / (2L * (c + rank))
    }
    assert(pts(1) == math.round(1e6 / 61))
    assert(pts(50) == math.round(1e6 / 110))

    val texts = docs((1L to 30L).map(i =>
      i -> (if (i <= 10) s"needle common w$i" else s"common w$i")): _*)
    // embeddings: doc 5 and 25 get the query vector (cosine 1), others noise
    val emb = (1L to 30L).map { i =>
      val v = Array.tabulate(64)(j =>
        if (i == 5 || i == 25) (if (j == 0) 1f else 0f)
        else (((i * 7 + j) % 13).toFloat - 6f) / 13f)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val qv = Seq.tabulate(64)(j => if (j == 0) 1.0 else 0.0)
    val fused = Retrieval.hybridTopK(texts, col("doc_id"), col("text"),
      emb, col("vec_id"), col("embedding"), Seq("needle"), qv,
      k = 10, poolK = 15)
    val rows = fused.collect()
    val top = rows.head
    // doc 5 is in BOTH pools (lexical match + exact cosine) — must lead
    assert(top.getLong(0) == 5L,
      s"dual-pool doc must win the fusion, got ${top.getLong(0)}")
    assert(!top.isNullAt(2) && !top.isNullAt(3),
      "winner carries both ranks")
    val expected = pts(top.getLong(2)) + pts(top.getLong(3))
    assert(top.getLong(1) == expected, "fused score is the exact point sum")
  }

  test("phrase search: exact adjacency, overlapping matches, repeated " +
      "terms, and a 3-term phrase") {
    val d = docs(
      1L -> "table scan merge",         // 1 x "table scan"
      2L -> "table scan table scan",    // 2 x
      3L -> "table merge scan",         // terms present, NOT adjacent
      4L -> "scan table",               // reversed — no match
      5L -> "a a a",                    // overlapping "a a" -> 2 matches
      6L -> "x y x",                    // repeated-term phrase "x y x"
      7L -> "table scan merge table scan merge")
    val path = tmp("bm25-phrase")
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), path, 8)

    def m(phrase: Seq[String]): Map[Long, Long] =
      Retrieval.searchPhraseIndex(spark, path, phrase, 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(m(Seq("table", "scan")) ==
      Map(1L -> 1L, 2L -> 2L, 7L -> 2L),
      "adjacency must hold exactly; non-adjacent/reversed docs excluded")
    assert(m(Seq("a", "a")) == Map(5L -> 2L),
      "overlapping occurrences both count")
    assert(m(Seq("x", "y", "x")) == Map(6L -> 1L),
      "repeated-term phrases resolve through one positions map")
    assert(m(Seq("table", "scan", "merge")) == Map(1L -> 1L, 7L -> 2L),
      "3-term phrase walks p, p+1, p+2")
    assert(m(Seq("table", "nosuch")).isEmpty, "unknown term: empty, no error")

    // ranking: phrase tf dominates at similar dl; deterministic order
    val ranked = Retrieval.searchPhraseIndex(spark, path,
      Seq("table", "scan"), 10).collect()
    assert(ranked.head.getLong(0) == 2L,
      "doc 2 (tf=2, shortest) must rank first")
    assert(ranked.map(_.getLong(2)).toSeq ==
      ranked.map(_.getLong(2)).toSeq.sorted(Ordering[Long].reverse),
      "output is score-descending")
  }

  test("boolean search: must gates and scores, mustNot excludes, " +
      "should only scores") {
    val d = docs(
      1L -> "spark fast",       // must only
      2L -> "spark vector",     // must + one should
      3L -> "spark slow fast",  // killed by mustNot
      4L -> "vector dup",       // no must term
      5L -> "spark vector dup") // must + both shoulds
    val path = tmp("bm25-bool")
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), path, 8)

    def ids(must: Seq[String], should: Seq[String],
            not: Seq[String]): Seq[Long] =
      Retrieval.searchBooleanIndex(spark, path, must, should, not, 10)
        .collect().map(_.getLong(0)).toSeq

    val r = Retrieval.searchBooleanIndex(spark, path, Seq("spark"),
      Seq("vector", "dup"), Seq("slow"), 10).collect()
    assert(r.map(_.getLong(0)).toSet == Set(1L, 2L, 5L),
      "must gates, mustNot excludes, should alone does not gate")
    val score = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(score(5L) > score(2L) && score(2L) > score(1L),
      "more matched scoring terms must score higher")

    assert(ids(Seq("spark", "vector"), Nil, Nil).toSet == Set(2L, 5L),
      "ALL must terms required")
    assert(ids(Nil, Seq("dup"), Nil).toSet == Set(4L, 5L),
      "should-only query matches any scoring term")
    assert(ids(Seq("spark"), Nil, Seq("nosuch")).toSet ==
      Set(1L, 2L, 3L, 5L), "unknown mustNot term excludes nothing")
    intercept[IllegalArgumentException](
      Retrieval.searchBooleanIndex(spark, path, Seq("x"), Nil, Seq("x"), 5))
    intercept[IllegalArgumentException](
      Retrieval.searchBooleanIndex(spark, path, Nil, Nil, Seq("slow"), 5))
  }

  test("phrase and boolean probes prune to the involved terms' buckets") {
    val d = docs((1L to 300L).map(i =>
      i -> s"w${i % 61} w${i % 23} table ${if (i % 9 == 0) "scan" else "x"}"): _*)
    val path = tmp("bm25-prune2")
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), path,
      nBuckets = 32)
    def prunedParts(terms: Seq[String]): Long = {
      val hits = spark.read.parquet(path)
        .filter(col("bucket").isin(terms.map(t =>
          Integer.valueOf((graft.functions.Kernels.hash60(
            org.apache.spark.unsafe.types.UTF8String.fromString(t))
            % 32L).toInt)): _*))
      hits.collect()
      val plan = hits.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collect { case f: FileSourceScanExec => f }
        .map(_.metrics("numPartitions").value).sum
    }
    // the probes read through this exact filter shape — the partition
    // count bound is the scale contract for both query families
    assert(prunedParts(Seq("table", "scan")) <= 2)
    assert(prunedParts(Seq("table", "scan", "w7")) <= 3)
    // and the results stay correct through the pruned read
    assert(Retrieval.searchPhraseIndex(spark, path,
      Seq("table", "scan"), 5).count() == 5)
    assert(Retrieval.searchBooleanIndex(spark, path, Seq("table"),
      Nil, Seq("scan"), 500).count() > 0)
  }

  test("MLT probes prune to the candidate terms' buckets") {
    // small vocabulary on purpose: few distinct terms -> few buckets, so
    // the bound is tight enough to prove pruning (not just "< all")
    val d = docs((1L to 300L).map(i =>
      i -> s"alpha beta w${i % 5} ${if (i % 7 == 0) "gamma gamma" else "beta"}"): _*)
    val path = tmp("mlt-prune")
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), path,
      nBuckets = 32)
    val src = "gamma gamma alpha alpha beta beta unseen"
    // candidates = {alpha, beta, gamma} (tf >= 2; 'unseen' gated by tf)
    val cands = Seq("alpha", "beta", "gamma")
    val hits = spark.read.parquet(path)
      .filter(col("bucket").isin(cands.map(t =>
        Integer.valueOf((graft.functions.Kernels.hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
          % 32L).toInt)): _*))
    hits.collect()
    val plan = hits.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val parts = plan.collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numPartitions").value).sum
    assert(parts <= 3,
      s"MLT df probe must prune to the candidates' buckets, read $parts")
    // the selection reads through this exact filter shape and the
    // scoring probe through the (narrower) selected-term shape — results
    // stay correct through both pruned reads
    val sel = Retrieval.mltSelectTerms(spark, path, src, maxQueryTerms = 3)
    assert(sel.map(_.term).toSet == Set("alpha", "beta", "gamma"))
    assert(Retrieval.moreLikeThis(spark, path, src, k = 5,
      maxQueryTerms = 3).count() == 5)
  }

  test("postings compaction: one file per bucket, identical rankings, " +
      "appends keep landing in the active version, vacuum reclaims") {
    val d = docs((1L to 150L).map(i =>
      i -> s"alpha w${i % 11} ${if (i % 4 == 0) "beta" else "gamma"}"): _*)
    val path = tmp("bm25-compact")
    Retrieval.writeBm25Index(d.filter(col("doc_id") <= 50),
      col("doc_id"), col("text"), path, 8)
    for (lo <- Seq(51L, 101L))
      Retrieval.appendBm25Index(
        d.filter(col("doc_id") > lo - 1 && col("doc_id") <= lo + 49),
        col("doc_id"), col("text"), path)
    val q = Seq("alpha", "beta")
    val before = Retrieval.searchBm25Index(spark, path, q, 30)
      .collect().toSeq

    val (nBefore, nAfter) = Retrieval.compactBm25Index(spark, path)
    assert(nAfter < nBefore, s"compaction must shrink files ($nBefore -> $nAfter)")
    assert(Retrieval.searchBm25Index(spark, path, q, 30).collect().toSeq
      == before, "compaction must not move a single ranking")
    assert(Retrieval.searchPhraseIndex(spark, path,
      Seq("alpha", "w3"), 30).count() > 0,
      "phrase probe must read through the pointer too")

    // vacuum reclaims the retired root layout; search unaffected
    assert(Retrieval.vacuumBm25Index(spark, path) > 0)
    assert(Retrieval.searchBm25Index(spark, path, q, 30).collect().toSeq
      == before)

    // appends land in the ACTIVE version and stay visible
    Retrieval.appendBm25Index(
      d.filter(col("doc_id") > 150).limit(0)
        .unionByName(docs(9001L -> "alpha beta")), // one fresh doc
      col("doc_id"), col("text"), path)
    val after = Retrieval.searchBm25Index(spark, path, q, 300).collect()
    assert(after.exists(_.getLong(0) == 9001L),
      "post-compaction append must be immediately searchable")

    // a second compaction advances the version; a rebuild resets it
    val (_, n2) = Retrieval.compactBm25Index(spark, path)
    assert(n2 <= 8 + 1)
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), path, 8)
    assert(Retrieval.searchBm25Index(spark, path, q, 30).count() == 30)
  }

  test("phrase search through append equals a fresh full build") {
    val d = docs((1L to 80L).map(i =>
      i -> (if (i % 5 == 0) s"alpha beta w${i % 7}"
            else s"beta alpha w${i % 7}")): _*)
    val full = tmp("phrase-full"); val inc = tmp("phrase-inc")
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), full, 8)
    Retrieval.writeBm25Index(d.filter(col("doc_id") <= 40),
      col("doc_id"), col("text"), inc, 8)
    Retrieval.appendBm25Index(d.filter(col("doc_id") > 40),
      col("doc_id"), col("text"), inc)
    val q = Seq("alpha", "beta")
    assert(Retrieval.searchPhraseIndex(spark, inc, q, 30).collect().toSeq ==
      Retrieval.searchPhraseIndex(spark, full, q, 30).collect().toSeq,
      "positions must ride appends unchanged")
  }

  test("hybridIndexTopK serves from the indexes only — neither corpus " +
      "is scanned — and fuses the pruned pools exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hybidx").toString
    val docsPath = s"$dir/docs"; val embPath = s"$dir/emb"
    val bm25 = s"$dir/bm25"; val ivf = s"$dir/ivf"
    docs((1L to 120L).map(i =>
      i -> s"alpha w${i % 13} ${if (i % 3 == 0) "beta" else "gamma"}"): _*)
      .write.parquet(docsPath)
    (0 until 120).map { i =>
      (i.toLong,
        (0 until 8).map(j => (math.sin(i * 0.37 + j * 1.13) * 0.9).toFloat))
    }.toDF("vec_id", "embedding").write.parquet(embPath)
    val d = spark.read.parquet(docsPath)
    val e = spark.read.parquet(embPath)
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), bm25, 8)
    graft.operators.Similarity.writeIvfIndex(e, col("vec_id"),
      col("embedding"), e.filter(col("vec_id") < 6),
      col("vec_id"), col("embedding"), ivf)
    val qv = e.filter(col("vec_id") === 7).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    val fused = Retrieval.hybridIndexTopK(spark, bm25, ivf,
      Seq("alpha", "beta"), qv, k = 10, poolK = 25, nprobe = 2)
    val got = fused.collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq
    // plan: every file scan reads an index dir, never a corpus dir
    def scanRoots(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      collectWithSubqueries(p) { case f: FileSourceScanExec => f }
        .flatMap(_.relation.location.rootPaths.map(_.toString))
    val roots = scanRoots(fused.queryExecution.executedPlan)
    assert(roots.nonEmpty)
    assert(roots.forall(r => r.contains("/bm25") || r.contains("/ivf")),
      s"hybrid serving must not touch a corpus: $roots")
    // exact fusion replay from the two pruned pools, assembled by hand
    def rrf(rank: Long): Long = {
      val num = 2L * 1000000L + (60L + rank); val den = 2L * (60L + rank)
      num / den
    }
    val lexRanks = Retrieval
      .searchBm25Index(spark, bm25, Seq("alpha", "beta"), 25)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val qvq = qv.map(x => math.floor(x.toFloat.toDouble * 1000 + 0.5).toLong)
    val cents = graft.operators.Similarity.readCentroids(spark, ivf)
    val probed = cents.map { case (id, c) =>
        (id, graft.functions.Kernels.cosineQ6Arrays(qvq.toArray, c)) }
      .sortBy { case (id, cos) => (-cos, id) }.take(2).map(_._1)
    val denseRanks = spark.read
      .parquet(graft.operators.Similarity.assignDir(spark, ivf))
      .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
      .select(col("neighbor_id").cast("long").as("id"),
        graft.functions.Functions.vec_cosine_q6(col("cv"),
          typedlit(qvq)).as("cos"))
      .orderBy(col("cos").desc, col("id")).limit(25)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val expected = (lexRanks.keySet ++ denseRanks.keySet).toSeq
      .map(id => (id, lexRanks.get(id).map(rrf).getOrElse(0L) +
        denseRanks.get(id).map(rrf).getOrElse(0L)))
      .sortBy { case (id, pts) => (-pts, id) }.take(10)
    assert(got === expected)
  }

  test("hybridIndexTopK dispatches on the index metric: an IVF,SQ8 dense " +
      "pool decodes codes and ranks ADC distance ascending") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hybsq8").toString
    val docsPath = s"$dir/docs"; val embPath = s"$dir/emb"
    val bm25 = s"$dir/bm25"; val ivf = s"$dir/ivfsq8"
    docs((1L to 120L).map(i =>
      i -> s"alpha w${i % 13} ${if (i % 3 == 0) "beta" else "gamma"}"): _*)
      .write.parquet(docsPath)
    (0 until 120).map { i =>
      (i.toLong,
        (0 until 8).map(j => (math.sin(i * 0.37 + j * 1.13) * 0.9).toFloat))
    }.toDF("vec_id", "embedding").write.parquet(embPath)
    val d = spark.read.parquet(docsPath)
    val e = spark.read.parquet(embPath)
    Retrieval.writeBm25Index(d, col("doc_id"), col("text"), bm25, 8)
    graft.operators.Similarity.writeIvfIndexSq8(e, col("vec_id"),
      col("embedding"), e.filter(col("vec_id") < 6),
      col("vec_id"), col("embedding"), ivf)
    val qv = e.filter(col("vec_id") === 7).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    val fused = Retrieval.hybridIndexTopK(spark, bm25, ivf,
      Seq("alpha", "beta"), qv, k = 10, poolK = 25, nprobe = 2)
    val got = fused.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def rrf(rank: Long): Long = {
      val num = 2L * 1000000L + (60L + rank); val den = 2L * (60L + rank)
      num / den
    }
    val lexRanks = Retrieval
      .searchBm25Index(spark, bm25, Seq("alpha", "beta"), 25)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    // expected dense pool: the ADC serving probe itself (self NOT
    // excluded by the hybrid pool, so recount from the assignment)
    val qvq = qv.map(x => math.floor(x.toFloat.toDouble * 1000 + 0.5).toLong)
    val cents = graft.operators.Similarity.readCentroids(spark, ivf)
    val probed = cents.map { case (id, c) =>
        (id, graft.functions.Kernels.l2sqArrays(qvq.toArray, c)) }
      .sortBy { case (id, dd) => (dd, id) }.take(2).map(_._1)
    val (mn, mx) = graft.operators.Similarity.readSq8Bounds(spark, ivf)
    val denseRanks = spark.read
      .parquet(graft.operators.Similarity.assignDir(spark, ivf))
      .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
      .select(col("neighbor_id").cast("long").as("id"),
        graft.functions.Functions.vec_l2sq_long(
          graft.functions.Functions.vec_sq8_recon(col("codes"),
            typedlit(mn.toSeq), typedlit(mx.toSeq)),
          typedlit(qvq)).as("dd"))
      .orderBy(col("dd").asc_nulls_last, col("id")).limit(25)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val expected = (lexRanks.keySet ++ denseRanks.keySet).toSeq
      .map(id => (id, lexRanks.get(id).map(rrf).getOrElse(0L) +
        denseRanks.get(id).map(rrf).getOrElse(0L)))
      .sortBy { case (id, pts) => (-pts, id) }.take(10)
    assert(got === expected)
  }

  test("hybridMaxSimTopK fuses the two rankings by exact RRF (independent " +
      "recount from each side's own pool)") {
    import graft.operators.Similarity
    val d = docs(
      1L -> "spark vector dup engine", 2L -> "spark spark table scan",
      3L -> "dup dup vector", 4L -> "unrelated words here",
      5L -> "vector table", 6L -> "spark dup")
    // 6 docs x 2 token vectors each, deterministic
    val toks = (0 until 12).map { i =>
      (i.toLong / 2 + 1, i.toLong % 2,
        Array.tabulate(8)(k => (((i % 5) * 3 + k * (1 + i % 3)) % 11).toFloat))
    }.toDF("doc", "tokpos", "embedding")
    val qToks = toks.filter(col("doc") === 1)
      .select(lit(1L).as("qd"), col("tokpos"), col("embedding"))
    val terms = Seq("spark", "dup")
    val got = Retrieval.hybridMaxSimTopK(d, col("doc_id"), col("text"),
        toks, col("doc"), col("embedding"),
        qToks, col("qd"), col("tokpos"), col("embedding"),
        terms, k = 6, poolK = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // independent recount: each side's own deterministic ranking
    def rrf(r: Long): Long = { val den = 2 * (60 + r); (2000000 + 60 + r) / den }
    val lexRanks = Retrieval.bm25TopK(d, col("doc_id"), col("text"), terms, 6)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val msRanks = Similarity.maxSimTopK(toks, col("doc"), col("embedding"),
        qToks, col("qd"), col("tokpos"), col("embedding"), k = 6)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val expected = (lexRanks.keySet ++ msRanks.keySet).toSeq
      .map(id => (id, lexRanks.get(id).map(rrf).getOrElse(0L) +
        msRanks.get(id).map(rrf).getOrElse(0L)))
      .sortBy { case (id, pts) => (-pts, id) }.take(6)
    assert(got == expected)
    // the MaxSim side self-excludes the query doc id
    assert(!msRanks.contains(1L))
  }

  test("crossEncoderRerank: the stub matches an independent recount, the " +
      "final order is the reranker's, and only the pool is scored") {
    val d = docs(
      1L -> "spark spark spark engine", 2L -> "spark vector engine",
      3L -> "vector vector spark dup", 4L -> "dup dup dup dup",
      5L -> "nothing relevant here", 6L -> "spark dup vector")
    val terms = Seq("spark", "dup")
    val pool = Retrieval.bm25TopK(d, col("doc_id"), col("text"), terms, 4)
    val poolIds = pool.collect().map(_.getLong(0)).toSet
    val got = Retrieval.crossEncoderRerank(d, col("doc_id"), col("text"),
        pool, col("doc_id"), col("score_micros"), terms, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // only pooled docs appear, rn is dense from 1
    assert(got.map(_._1).toSet.subsetOf(poolIds))
    assert(got.map(_._3).toSeq == (1L to got.length))
    // independent stub recount: hash60("ce:"||t) % 1000 · tf
    def w(t: String): Long = graft.functions.Kernels.hash60(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"ce:$t")) % 1000L
    val texts = Map(1L -> "spark spark spark engine",
      2L -> "spark vector engine", 3L -> "vector vector spark dup",
      4L -> "dup dup dup dup", 6L -> "spark dup vector")
    def stub(id: Long): Long = terms.map(t =>
      w(t) * texts(id).split(" ").count(_ == t)).sum
    got.foreach { case (id, ce, _) => assert(ce == stub(id), s"doc $id") }
    // the order is ce desc, doc asc — not the stage-1 order
    assert(got.map(x => (-x._2, x._1)).sortBy(identity).toSeq ==
      got.map(x => (-x._2, x._1)).toSeq)
    // a custom scorer rides the same hook (the production model slot)
    val custom = Retrieval.crossEncoderRerank(d, col("doc_id"), col("text"),
        pool, col("doc_id"), col("score_micros"), terms, k = 1,
        scorer = (text, _) => -length(text).cast("long"))
      .collect()
    assert(custom.length == 1 &&
      custom(0).getLong(0) == poolIds.minBy(id => texts(id).length))
  }
}
