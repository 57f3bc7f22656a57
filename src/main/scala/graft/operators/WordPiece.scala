package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{KernelExprs, WordPieceTable}

/** WORDPIECE tokenizer training (Schuster & Nakajima 2012, as shipped in
  * BERT, Devlin et al. 2019) — the engine's third tokenizer family next
  * to BPE (merge by raw pair frequency) and Unigram-LM (global EM). Same
  * merge mechanics as BPE but a LIKELIHOOD score picks each merge:
  *
  *   score(a, b) = freq(ab) / (freq(a) · freq(b))
  *
  * — the pair that most exceeds what its parts' frequencies predict (the
  * mutual-information heuristic the HuggingFace trainer implements),
  * which prefers cohesive units over merely-common ones ("##ing" beats
  * "e ##e" even though the latter is more frequent).
  *
  * Distribution shape mirrors [[Bpe.train]]: ONE map-side-combined word
  * count is the only corpus-proportional step; the merge loop runs on
  * the collected vocabulary-sized table with INCREMENTAL maintenance —
  * pair frequencies, SYMBOL frequencies, and a symbol→pairs index, so a
  * merge touches only words containing the pair plus heap re-pushes for
  * pairs whose score moved because a constituent symbol's frequency
  * moved (exactly the extra invalidation WordPiece's score needs over
  * BPE's). The lazy max-heap re-validates on pop against the CURRENT
  * (freq(ab), freq(a), freq(b)) triple, so the argmax is exact —
  * bit-identical to a full per-round rescore. Scores compare as exact
  * rationals (BigInt cross-multiplication — no float ordering drift),
  * ties break on the lexicographically smallest pair: training is
  * reproducible across runs, partitionings, and cluster sizes.
  *
  * Vocabulary = every single-character piece of the counted corpus
  * (word-initial and `##`-continuation forms) + one piece per merge —
  * so encoding the training corpus never hits `[UNK]`, the coverage
  * property the conservation oracle (q168) gates.
  */
object WordPiece {

  final case class WpModel(alphabet: Vector[String],
                           merges: Vector[(String, String)]) {
    /** Merged symbol: right side sheds its continuation marker. */
    def mergedPiece(a: String, b: String): String = a + b.stripPrefix("##")
    lazy val pieces: Vector[String] =
      alphabet ++ merges.map { case (a, b) => mergedPiece(a, b) }
    lazy val table: WordPieceTable = new WordPieceTable(pieces.toArray)
  }

  /** Word → initial WordPiece symbols: first char bare, rest `##`-marked. */
  private[graft] def initialSymbols(word: String): Array[String] = {
    val out = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      out(i) = if (i == 0) word.substring(0, 1)
               else "##" + word.substring(i, i + 1)
      i += 1
    }
    out
  }

  /** Train `numMerges` scored merges from `docs`' `text` column.
    *
    * The ALPHABET comes from the UNCAPPED corpus (one distinct-chars
    * aggregation — bounded by charset size), while merge learning runs on
    * the `minFreq`/`maxWords`-capped word table: a rare word cannot
    * influence merges, but its characters are still encodable, so the
    * trained model never emits `[UNK]` on its own corpus (the coverage
    * property q168 gates; also the HuggingFace trainer's recipe —
    * alphabet first, then scored merges). */
  def train(docs: DataFrame, text: Column, numMerges: Int,
            maxWords: Int = 1 << 20, minFreq: Long = 2L): WpModel = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val pieces = docs.select(explode(split(text, "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val alphabet = pieces.select(
        explode(array_union(
          array(substring(col("word"), 1, 1)),
          transform(
            filter(split(substring(col("word"), 2, Int.MaxValue), ""),
              ch => length(ch) > 0),
            ch => concat(lit("##"), ch)))).as("sym"))
      .distinct().collect().map(_.getString(0)).sorted.toVector
    val wordCounts = TopK.global(
      pieces.groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= minFreq),
      maxWords, col("freq").desc, col("word").asc)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counts = wordCounts.map(_._2)
    val words: Array[Array[String]] = wordCounts.map { case (w, _) =>
      initialSymbols(w)
    }
    WpModel(alphabet, learnMerges(words, counts, numMerges, minFreq))
  }

  /** The scored incremental merge loop (see object doc). `words` is
    * mutated in place. */
  private def learnMerges(words: Array[Array[String]], counts: Array[Long],
                          numMerges: Int, minFreq: Long)
      : Vector[(String, String)] = {
    type P = (String, String)
    val pairFreq = new java.util.HashMap[P, java.lang.Long]()
    val symFreq = new java.util.HashMap[String, java.lang.Long]()
    val pairWords = new java.util.HashMap[P, java.util.ArrayList[Integer]]()
    // symbol → pairs ever containing it (lazily stale, validated on pop)
    val symPairs = new java.util.HashMap[String, java.util.HashSet[P]]()

    def bump(m: java.util.HashMap[P, java.lang.Long], k: P, d: Long): Unit = {
      val f = m.get(k)
      val nf = (if (f == null) 0L else f.longValue) + d
      if (nf <= 0L) { m.remove(k); () } else { m.put(k, nf); () }
    }
    def bumpSym(s: String, d: Long): Unit = {
      val f = symFreq.get(s)
      val nf = (if (f == null) 0L else f.longValue) + d
      if (nf <= 0L) { symFreq.remove(s); () } else { symFreq.put(s, nf); () }
    }
    def freqOf(k: P): Long = {
      val f = pairFreq.get(k); if (f == null) 0L else f.longValue
    }
    def symOf(s: String): Long = {
      val f = symFreq.get(s); if (f == null) 0L else f.longValue
    }
    def index(k: P): Unit = {
      Seq(k._1, k._2).foreach { s =>
        var set = symPairs.get(s)
        if (set == null) { set = new java.util.HashSet[P](); symPairs.put(s, set) }
        set.add(k); ()
      }
    }

    def addWord(wi: Int, touched: java.util.HashSet[P]): Unit = {
      val w = words(wi); val c = counts(wi)
      val seen = new java.util.HashSet[P]()
      var i = 0
      while (i < w.length) {
        bumpSym(w(i), c)
        if (i < w.length - 1) {
          val k = (w(i), w(i + 1))
          bump(pairFreq, k, c)
          index(k)
          if (touched != null) touched.add(k)
          if (seen.add(k)) {
            var lst = pairWords.get(k)
            if (lst == null) {
              lst = new java.util.ArrayList[Integer]()
              pairWords.put(k, lst)
            }
            lst.add(Integer.valueOf(wi)); ()
          }
        }
        i += 1
      }
    }
    def removeWord(wi: Int, touched: java.util.HashSet[P]): Unit = {
      val w = words(wi); val c = counts(wi)
      var i = 0
      while (i < w.length) {
        bumpSym(w(i), -c)
        if (i < w.length - 1) {
          val k = (w(i), w(i + 1))
          bump(pairFreq, k, -c)
          touched.add(k)
        }
        i += 1
      }
    }

    var wi = 0
    while (wi < words.length) { addWord(wi, null); wi += 1 }

    // heap entries snapshot (fab, fa, fb); exact-rational order:
    // fab1/(fa1·fb1) > fab2/(fa2·fb2)  ⟺  fab1·fa2·fb2 > fab2·fa1·fb1
    final case class E(fab: Long, fa: Long, fb: Long, a: String, b: String)
    def cross(x: E, y: E): Int = {
      val l = BigInt(x.fab) * BigInt(y.fa) * BigInt(y.fb)
      val r = BigInt(y.fab) * BigInt(x.fa) * BigInt(x.fb)
      l.compare(r)
    }
    val heap = new java.util.PriorityQueue[E](
      math.max(16, pairFreq.size),
      new java.util.Comparator[E] {
        def compare(x: E, y: E): Int = {
          val c = cross(y, x) // descending score
          if (c != 0) c
          else {
            val ca = x.a.compareTo(y.a)
            if (ca != 0) ca else x.b.compareTo(y.b)
          }
        }
      })
    def push(k: P): Unit = {
      val f = freqOf(k)
      if (f >= minFreq) {
        val (sa, sb) = (symOf(k._1), symOf(k._2))
        if (sa > 0 && sb > 0) { heap.add(E(f, sa, sb, k._1, k._2)); () }
      }
    }
    pairFreq.keySet().iterator().forEachRemaining(k => push(k))

    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      var best: P = null
      while (best == null && !heap.isEmpty) {
        val e = heap.poll()
        val k = (e.a, e.b)
        val (f, sa, sb) = (freqOf(k), symOf(k._1), symOf(k._2))
        if (f == e.fab && sa == e.fa && sb == e.fb && f >= minFreq) best = k
        else push(k) // stale snapshot: re-offer the current value
      }
      if (best == null) done = true
      else {
        merges += best
        val (a, b) = best
        val merged = a + b.stripPrefix("##")
        val affected = pairWords.remove(best)
        val touched = new java.util.HashSet[P]()
        if (affected != null) {
          val seenW = new java.util.HashSet[Integer]()
          val it = affected.iterator()
          while (it.hasNext) {
            val wiI = it.next()
            if (seenW.add(wiI)) {
              val w = words(wiI.intValue)
              var has = false
              var i = 0
              while (!has && i < w.length - 1) {
                has = w(i) == a && w(i + 1) == b; i += 1
              }
              if (has) {
                removeWord(wiI.intValue, touched)
                val out =
                  new scala.collection.mutable.ArrayBuffer[String](w.length)
                var k = 0
                while (k < w.length) {
                  if (k < w.length - 1 && w(k) == a && w(k + 1) == b) {
                    out += merged; k += 2
                  } else { out += w(k); k += 1 }
                }
                words(wiI.intValue) = out.toArray
                addWord(wiI.intValue, touched)
              }
            }
          }
        }
        pairFreq.remove(best)
        touched.remove(best)
        // pairs whose PAIR freq moved...
        touched.iterator().forEachRemaining(k => push(k))
        // ...plus pairs whose SCORE moved through a constituent symbol
        // (a, b lost occurrences; `merged`'s pairs are already touched)
        Seq(a, b).foreach { s =>
          val set = symPairs.get(s)
          if (set != null) {
            val si = set.iterator()
            while (si.hasNext) {
              val k = si.next()
              if (freqOf(k) <= 0L) si.remove() else push(k)
            }
          }
        }
        round += 1
      }
    }
    merges.result()
  }

  /** array<string> WordPiece tokens for `text` (codegen'd). */
  def encode(text: Column, model: WpModel): Column =
    KernelExprs.wp_encode(text, model.table)

  /** Token count without materializing the pieces (codegen'd). */
  def countTokens(text: Column, model: WpModel): Column =
    KernelExprs.wp_count(text, model.table)

  /** Persist: `(kind, rank, piece_or_left, right)` parquet — alphabet
    * rows (`kind = 'alpha'`) plus ranked merges, engine-neutral. */
  def save(model: WpModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    val rows =
      model.alphabet.zipWithIndex.map { case (p, i) => ("alpha", i, p, "") } ++
      model.merges.zipWithIndex.map { case ((a, b), r) => ("merge", r, a, b) }
    rows.toDF("kind", "rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): WpModel = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("kind"), col("rank").cast("int"), col("left"), col("right"))
      .as[(String, Int, String, String)].collect()
    WpModel(
      rows.filter(_._1 == "alpha").sortBy(_._2).map(_._3).toVector,
      rows.filter(_._1 == "merge").sortBy(_._2)
        .map(r => (r._3, r._4)).toVector)
  }
}
