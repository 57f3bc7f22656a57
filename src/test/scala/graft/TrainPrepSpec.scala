package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainPrep

/** Training-prep operators: packing must CONSERVE the corpus (every doc
  * exactly once, offsets in range, chunks contiguous per shard), and the
  * NLL scorer must behave like a quality signal (rare-token soup scores
  * high) while keeping its vocab lookup broadcast — never a shuffle of the
  * token stream. */
class TrainPrepSpec extends AnyFunSuite with SparkSpec
    with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val budget = 64

  test("packSequences: conservation + shard-local chunk arithmetic") {
    // token counts vary 1..40 so documents straddle chunk cuts
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", array_repeat(lit("tok"), (col("id") % 40 + 1).cast("int")))
        .as("text"))
    val out = TrainPrep.packSequences(docs, col("doc_id"),
      graft.functions.TextFunctions.token_count(col("text")),
      pmod(col("doc_id"), lit(4)), budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))) // doc_id, tok, shard, chunk, pos
      .sortBy(_._1)

    assert(out.length == 200, "every document packs exactly once")
    assert(out.forall { case (_, _, _, _, pos) => pos >= 0 && pos < budget })
    // recompute the greedy fill per shard in plain Scala
    out.groupBy(_._3).foreach { case (_, shardDocs) =>
      var cursor = 0L
      shardDocs.sortBy(_._1).foreach { case (id, tok, _, chunk, pos) =>
        assert(chunk == cursor / budget, s"doc $id chunk")
        assert(pos == cursor % budget, s"doc $id pos")
        cursor += tok
      }
    }
  }

  test("unigramNll: rare-token soup scores high; vocab lookup is broadcast") {
    val common = spark.range(50).select(col("id").as("doc_id"),
      lit("the cat sat on the mat and the dog sat too").as("text"))
    val rare = spark.range(50, 55).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 8).map(i =>
        concat(lit(s"zxq$i"), col("id"))): _*).as("text"))
    val scored = TrainPrep.unigramNll(common.union(rare),
      col("doc_id"), col("text"), vocabSize = 20)
    val rows = scored.collect().map(r =>
      (r.getLong(0), r.getDouble(2))).toMap
    val commonNll = rows(0L)
    val rareNll = rows(52L)
    assert(rareNll > commonNll + 1.0,
      s"rare-token doc must score much worse: $rareNll vs $commonNll")
    // every common doc scores identically (same text, order-independent sum)
    assert((0L until 50L).map(rows).distinct.size == 1)
    // plan: the token->vocab lookup broadcasts; no sort-merge join anywhere
    val plan = scored.queryExecution.executedPlan
    scored.collect()
    assert(collectWithSubqueries(plan) {
      case b: BroadcastHashJoinExec => b }.nonEmpty, "vocab join broadcasts")
    assert(collectWithSubqueries(plan) {
      case s: SortMergeJoinExec => s }.isEmpty, "no sort-merge join")
  }

  test("paragraphDedup: first occurrence survives, docs reassemble in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "intro\n\nbody one\n\nfooter"),
      (2L, "intro\n\nbody two\n\nfooter"), // intro+footer claimed by doc 1
      (3L, "body one\n\nunique"),          // body one claimed by doc 1
      (4L, "intro\n\nfooter")              // nothing survives
    ).toDF("doc_id", "text")
    val got = TrainPrep.paragraphDedup(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "intro\n\nbody one\n\nfooter", 3L, 3L),
      (2L, "body two", 3L, 1L),
      (3L, "unique", 2L, 1L),
      (4L, "", 2L, 0L)))
    // skew shape: first-occurrence is a map-side-combined aggregate —
    // no window (single-task sort on a hot paragraph key) anywhere
    val plan = TrainPrep.paragraphDedup(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "paragraphDedup must not plan a window")
    // shuffle-byte shape (r8 verdict #4): the first-occurrence exchanges
    // are keyed by the 128-bit hash pair, never by raw paragraph TEXT —
    // at 100 TB a text key would move the boilerplate-heavy corpus
    // through two extra shuffles. doc_id-keyed reassembly still carries
    // text, which is the one place it must go.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.types.{LongType, StringType}
    val exchanges = collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e.outputPartitioning }
    assert(exchanges.nonEmpty)
    exchanges.foreach {
      case HashPartitioning(exprs, _) =>
        assert(exprs.forall(_.dataType != StringType),
          s"text-keyed exchange: $exprs")
        assert(exprs.forall(_.dataType == LongType),
          s"expected long hash/doc keys: $exprs")
      case _ => // range/single partitionings don't carry the dedup keys
    }
    // r9 verdict #3: paragraph TEXT feeds exactly ONE exchange — the
    // doc_id repartition whose partitioning serves both the keep-flag
    // join and the reassembly groupBy; the first-occurrence lanes are
    // text-free
    val textExchanges = collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec
          if e.child.output.exists(_.name == "para") => e
    }
    assert(textExchanges.size == 1,
      s"expected exactly one text-bearing exchange, got " +
        s"${textExchanges.size}")
  }

  test("packSequences: one shuffle, keyed by shard") {
    val docs = spark.range(100).select(col("id").as("doc_id"), lit(7L).as("tok"))
    val out = TrainPrep.packSequences(docs, col("doc_id"), col("tok"),
      pmod(col("doc_id"), lit(4)), budget)
    out.collect()
    val shuffles = collectWithSubqueries(out.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.size == 1, s"expected exactly one shuffle, got ${shuffles.size}")
  }

  test("mixCorpus: epoch fan-out, budget tracking, and determinism") {
    // 3 domains, 100 docs of 50 tokens each → 5000 tokens/domain.
    // budget 10000: rep (1.0) → rate 2.0; sub (0.5) → rate 1.0;
    // frac (0.25) → rate 0.5; 'cold' is unweighted and must drop out.
    val docs = spark.range(400).select(col("id").as("doc_id"),
      element_at(array(lit("rep"), lit("sub"), lit("frac"), lit("cold")),
        (col("id") % 4 + 1).cast("int")).as("dom"),
      lit(50L).as("tok"))
    def run() = TrainPrep.mixCorpus(docs, col("doc_id"), col("dom"),
      col("tok"), Map("rep" -> 1.0, "sub" -> 0.5, "frac" -> 0.25),
      budget = 10000L, seed = 7)
    val rows = run().collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))

    assert(!rows.exists(_._2 == "cold"), "unweighted domain leaked in")
    // rate 2.0: every doc exactly epochs {0, 1}
    val rep = rows.filter(_._2 == "rep")
    assert(rep.length == 200)
    assert(rep.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == Seq(0L, 1L)))
    // rate 1.0: every doc exactly epoch {0}
    val sub = rows.filter(_._2 == "sub")
    assert(sub.length == 100 && sub.forall(_._3 == 0L))
    // rate 0.5: a hash-selected ~half at epoch 0 — deterministic subset,
    // mass within a loose uniform-hash band
    val frac = rows.filter(_._2 == "frac")
    assert(frac.forall(_._3 == 0L))
    assert(frac.length > 25 && frac.length < 75,
      s"fractional sample far from rate 0.5: ${frac.length}/100")
    // replay: identical selection, row for row (order-insensitive)
    assert(run().collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq ==
      rows.sorted.toSeq)
    // degenerate recipe fails fast instead of exploding epochs
    intercept[IllegalArgumentException] {
      TrainPrep.mixCorpus(docs, col("doc_id"), col("dom"), col("tok"),
        Map("rep" -> 1.0), budget = 10000000L, maxEpochs = 100)
    }
  }

  test("temperatureWeights: alpha=1 reproduces natural shares, smaller " +
      "alpha flattens toward uniform, weights sum to ~1") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val natural = TrainPrep.temperatureWeights(docs, col("source"),
      col("n_chars"), alpha = 1.0)
    val flat = TrainPrep.temperatureWeights(docs, col("source"),
      col("n_chars"), alpha = 0.3)
    assert(natural.keySet == flat.keySet && natural.size >= 2)
    assert(math.abs(natural.values.sum - 1.0) < 1e-4)
    assert(math.abs(flat.values.sum - 1.0) < 1e-4)
    // flattening: the max domain's weight shrinks, the min's grows
    val (maxD, minD) = (natural.maxBy(_._2)._1, natural.minBy(_._2)._1)
    if (natural(maxD) > natural(minD) + 1e-6) {
      assert(flat(maxD) < natural(maxD))
      assert(flat(minD) > natural(minD))
    }
    // uniform limit: spread at alpha=0.3 is strictly tighter
    def spread(m: Map[String, Double]) = m.values.max - m.values.min
    assert(spread(flat) <= spread(natural) + 1e-9)
  }

  test("packTokenIds: matches a serial reference packer exactly; every " +
      "sequence full-length; tails drop; partitioning-invariant") {
    val seqLen = 8
    val eos = -1
    val docs = spark.range(200).select(col("id").as("doc_id"),
      transform(sequence(lit(0L), pmod(col("id") * 13, lit(6L))),
        i => ((col("id") * 31 + i) % 97).cast("int")).as("ids"))
    def run(parts: Int) = TrainPrep.packTokenIds(
      docs.repartition(parts), col("doc_id"), col("ids"),
      pmod(col("doc_id"), lit(4L)), seqLen, eos)
      .orderBy(col("shard"), col("seq_id"))
      .as[(Long, Long, Seq[Int])].collect().toSeq
    val got = run(7)
    assert(got == run(3), "packing must not depend on input partitioning")
    assert(got.forall(_._3.length == seqLen), "only full sequences emit")
    // serial reference: concat (ids :+ eos) per shard in doc order, chunk
    val want = (0L until 4L).flatMap { sh =>
      val stream = (0L until 200L).filter(_ % 4 == sh).flatMap { d =>
        val n = (d * 13 % 6) + 1
        (0L until n).map(i => ((d * 31 + i) % 97).toInt) :+ eos
      }
      stream.grouped(seqLen).filter(_.length == seqLen).zipWithIndex
        .map { case (s, i) => (sh, i.toLong, s.toSeq) }
    }
    assert(got == want.sortBy(t => (t._1, t._2)))
    // the dropped tail is < seqLen tokens per shard
    val emitted = got.map(_._3.length).sum
    val total = (0L until 200L).map(d => (d * 13 % 6) + 1 + 1).sum
    assert(total - emitted < 4L * seqLen)
  }

  test("chunkTokens: coverage, overlap, short tail, empty docs") {
    val docs = Seq(
      (0L, (1 to 50).map(i => s"t$i").mkString(" ")), // 50 toks: 3 chunks
      (1L, (1 to 8).map(i => s"u$i").mkString(" ")),  // 8 toks: 1 chunk
      (2L, "   "),                                    // token-free: none
      (3L, (1 to 32).map(i => s"v$i").mkString(" "))) // exactly one window
      .toDF("doc_id", "text")
    val out = TrainPrep.chunkTokens(docs, col("doc_id"), col("text"),
        size = 32, stride = 24)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    // doc 0: k up to ceil(18/24)=1 -> chunks 0 (32 toks) and 1 (toks 25..50)
    val d0 = out.filter(_._1 == 0L)
    assert(d0.map(_._2).toSeq === Seq(0L, 1L))
    assert(d0(0)._3 === 32L && d0(1)._3 === 26L)
    assert(d0(0)._4.startsWith("t1 ") && d0(1)._4.startsWith("t25 "))
    // 8-token overlap: chunk 0's last 8 tokens reappear in chunk 1
    assert(d0(0)._4.split(" ").takeRight(8).toSeq ===
      d0(1)._4.split(" ").take(8).toSeq)
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq ===
      Seq((0L, 8L)))
    assert(!out.exists(_._1 == 2L))
    assert(out.filter(_._1 == 3L).map(t => (t._2, t._3)).toSeq ===
      Seq((0L, 32L)))
    // every token covered exactly: union of chunk tokens = original
    val covered = d0.flatMap(_._4.split(" ")).toSet
    assert(covered === (1 to 50).map(i => s"t$i").toSet)
  }

  test("chunkTokens plans with no exchange at all") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat_ws(" ", array_repeat(lit("w"), 40)).as("text"))
    val df = TrainPrep.chunkTokens(docs, col("doc_id"), col("text"), 16, 16)
    df.collect()
    val shuffles = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, "chunking must be a pure projection")
  }

  test("packWithBoundaries: ids bit-identical to packTokenIds; spans " +
      "partition each sequence; docs split exactly across cuts") {
    import spark.implicits._
    import graft.operators.TrainPrep
    val docs = (1L to 40L).map(i =>
      (i, (0 until (i % 7 + 1).toInt).map(j => (i * 3 + j).toInt % 50)))
      .toDF("doc_id", "ids")
    val plain = TrainPrep.packTokenIds(docs, col("doc_id"), col("ids"),
        pmod(col("doc_id"), lit(3L)), seqLen = 8, eosId = 99)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getSeq[Int](2).toList).toMap
    val rows = TrainPrep.packWithBoundaries(docs, col("doc_id"),
        col("ids"), pmod(col("doc_id"), lit(3L)), seqLen = 8, eosId = 99)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getSeq[Int](2).toList == plain(key),
        s"ids drifted from packTokenIds at $key")
      val spans = r.getSeq[org.apache.spark.sql.Row](3)
        .map(s => (s.getLong(0), s.getInt(1), s.getInt(2)))
      // spans tile [0, 8) contiguously, no gaps or overlaps
      assert(spans.head._2 == 0 && spans.map(_._3).sum == 8)
      spans.sliding(2).foreach {
        case Seq((_, s1, l1), (_, s2, _)) => assert(s1 + l1 == s2)
        case _ =>
      }
      assert(spans.forall(_._3 > 0))
    }
    // a document split across a cut appears in consecutive sequences
    // with its length conserved: per (shard, doc) total span length ==
    // len(ids) + 1 (EOS) for every doc NOT lost to a dropped tail whose
    // spans are all present
    val perDoc = rows.flatMap { r =>
      r.getSeq[org.apache.spark.sql.Row](3).map(s =>
        ((r.getLong(0), s.getLong(0)), s.getInt(2).toLong))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = (1L to 40L).map(i => (i % 3, i) -> (i % 7 + 1 + 1)).toMap
    // docs fully or partially in the dropped tail may undershoot; every
    // doc that appears must never OVERSHOOT its true length
    perDoc.foreach { case (k, got) =>
      assert(got <= expect(k), s"doc $k overshot: $got > ${expect(k)}")
    }
    // and at least one doc is split across a cut (sanity that the
    // fixture exercises the split path): some sequence ends mid-doc
    assert(rows.exists { r =>
      val last = r.getSeq[org.apache.spark.sql.Row](3).last
      val k = (r.getLong(0), last.getLong(0))
      perDoc(k) == expect(k) &&
        rows.exists(r2 => r2.getLong(0) == r.getLong(0) &&
          r2.getLong(1) == r.getLong(1) + 1 &&
          r2.getSeq[org.apache.spark.sql.Row](3).head.getLong(0)
            == last.getLong(0))
    }, "fixture must exercise a document split across a cut")
  }

  test("corpusReport: exact dup pressure, deterministic top-lang ties, " +
      "token extremes") {
    import spark.implicits._
    val docs = Seq(
      // src a: 3 docs, one exact dup pair; langs en=1, fr=1, de=1 — the
      // count tie must resolve to the lexicographically SMALLEST lang
      (1L, "one two", "en", "a"),
      (2L, "one two", "fr", "a"),
      (3L, "one two three four", "de", "a"),
      // src b: all unique, en dominates
      (4L, "x", "en", "b"),
      (5L, "y z", "en", "b"),
      (6L, "w", "zz", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val r = graft.operators.TrainPrep.corpusReport(docs, col("text"),
        col("source"), col("lang"))
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getAs[Long]("n_docs") == 3 && a.getAs[Long]("n_tokens") == 8)
    assert(a.getAs[Long]("n_unique_texts") == 2 &&
      a.getAs[Long]("n_dup_docs") == 1)
    assert(a.getAs[String]("top_lang") == "de",
      "count ties must resolve to the smallest lang")
    assert(a.getAs[Long]("min_tokens") == 2 && a.getAs[Long]("max_tokens") == 4)
    val b = r("b")
    assert(b.getAs[String]("top_lang") == "en" &&
      b.getAs[Long]("top_lang_docs") == 2)
    assert(b.getAs[Long]("n_dup_docs") == 0)
  }
}
