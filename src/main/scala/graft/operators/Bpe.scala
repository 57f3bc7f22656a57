package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeTable, KernelExprs}

/** Byte-pair-encoding tokenizer TRAINING over a corpus (Sennrich et al.
  * 2016, arXiv:1508.07909; byte-level mode per the GPT-2 recipe, Radford
  * et al. 2019), shaped for a 100 TB corpus the way production tokenizer
  * trainers are (HuggingFace `tokenizers`, SentencePiece): the only
  * corpus-proportional work is ONE distributed word-frequency aggregation
  * (map-side-combined groupBy — the corpus is read once, shuffled as
  * (word, count) partials), and the merge-learning loop runs on the
  * COLLECTED word-frequency table, which is vocabulary-sized (Heaps' law:
  * ~10^6-10^7 distinct words for web scale), bounded here by `maxWords`
  * (top by frequency — the tail it cuts cannot influence early merges
  * anyway) and `minFreq`.
  *
  * Learning loop (driver, deterministic): words are symbol sequences
  * (chars + `</w>`, or mapped UTF-8 bytes in byte-level mode); each round
  * merges the most frequent adjacent pair (ties break on the
  * lexicographically SMALLEST pair, so training is reproducible across
  * runs, partitionings, and cluster sizes) and rewrites the affected
  * words. Pair frequencies are maintained INCREMENTALLY (r10 verdict):
  * a pair→count map plus a pair→words index mean each merge touches only
  * the words that actually contain the merged pair — a vanishing
  * fraction of the vocabulary — with a lazy max-heap serving the argmax,
  * so a production 32-64k-merge vocabulary trains in minutes of driver
  * time instead of the hours a per-round full recount costs
  * (O(Σ affected-word length) per merge vs O(Σ all-word length)).
  * Rounds that find no pair with frequency ≥ `minFreq` stop early.
  *
  * Byte-level mode (`byteLevel = true`): pieces come from the GPT-2
  * regex pre-tokenizer ([[BpeTable.PretokenPattern]], run distributed
  * via `regexp_extract_all` — same Java regex engine as the encoder),
  * symbols are UTF-8 bytes through the printable byte↔char table. The
  * 256-symbol alphabet covers ANY input — CJK, emoji, control bytes —
  * and [[decode]] losslessly reconstructs the original text, which
  * whitespace/char-level BPE cannot do for a multilingual corpus.
  *
  * Encoding/counting apply the trained table via the codegen'd
  * [[graft.functions.KernelExprs.BpeEncode]]/[[KernelExprs.BpeCount]]
  * expressions — the table serializes WITH the plan, the merge loop runs
  * inside whole-stage codegen, and a per-executor word cache makes the
  * Zipf bulk of a corpus a hash lookup per word.
  */
object Bpe {

  /** A trained model: ordered merges (earliest rank first). */
  final case class BpeModel(merges: Vector[(String, String)],
                            byteLevel: Boolean = false) {
    lazy val table: BpeTable =
      new BpeTable(merges.map { case (a, b) => s"$a $b" }.toArray, byteLevel)
    /** Driver-side reference encoder (specs, small probes). */
    def encodeWord(word: String): Seq[String] =
      table.encodeWord(word).toSeq
  }

  /** Train `numMerges` merges from `docs`' `text` column. */
  def train(docs: DataFrame, text: Column, numMerges: Int,
            maxWords: Int = 1 << 20, minFreq: Long = 2L,
            byteLevel: Boolean = false): BpeModel = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    // the distributed part: one combine-reduced word count, capped for
    // driver memory by taking the most frequent words (deterministic
    // tie-break on the word itself)
    val pieces =
      if (byteLevel)
        docs.select(explode(regexp_extract_all(text,
          lit(BpeTable.PretokenPattern), lit(0))).as("word"))
      else
        docs.select(explode(split(text, "\\s+")).as("word"))
          .filter(length(col("word")) > 0)
    val wordCounts = TopK.global(
      pieces.groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= minFreq),
      maxWords, col("freq").desc, col("word").asc)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // driver loop over the vocabulary-sized table
    val counts = wordCounts.map(_._2)
    val words: Array[Array[String]] = wordCounts.map { case (w, _) =>
      BpeTable.initialSymbols(w, byteLevel)
    }
    BpeModel(learnMerges(words, counts, numMerges, minFreq), byteLevel)
  }

  /** The incremental merge-learning loop. `words` is mutated in place.
    *
    * Invariants: `pairFreq` holds the EXACT weighted frequency of every
    * adjacent pair currently present (entries at ≤0 are removed);
    * `pairWords` maps a pair to word indices that contained it at some
    * point (lazily stale — membership is re-validated before use, never
    * removed on rewrite, so it can only over-approximate); the heap is a
    * lazy max-heap of (freq, pair) snapshots ordered (freq desc, pair
    * asc) — a popped entry counts only if it matches the pair's CURRENT
    * frequency, otherwise the current value is re-pushed and the pop
    * retries, which keeps the argmax exact (bit-identical merges to a
    * full per-round recount) at amortized O(log) per update. */
  private def learnMerges(words: Array[Array[String]], counts: Array[Long],
                          numMerges: Int, minFreq: Long)
      : Vector[(String, String)] = {
    type P = (String, String)
    val pairFreq = new java.util.HashMap[P, java.lang.Long]()
    val pairWords = new java.util.HashMap[P, java.util.ArrayList[Integer]]()

    def bump(k: P, delta: Long): Unit = {
      val f = pairFreq.get(k)
      val nf = (if (f == null) 0L else f.longValue) + delta
      if (nf <= 0L) { pairFreq.remove(k); () }
      else { pairFreq.put(k, nf); () }
    }
    /** Add word `wi`'s pair contributions (and index membership). */
    def addWord(wi: Int, touched: java.util.HashSet[P]): Unit = {
      val w = words(wi); val c = counts(wi)
      val seen = new java.util.HashSet[P]()
      var i = 0
      while (i < w.length - 1) {
        val k = (w(i), w(i + 1))
        bump(k, c)
        if (touched != null) touched.add(k)
        if (seen.add(k)) {
          var lst = pairWords.get(k)
          if (lst == null) {
            lst = new java.util.ArrayList[Integer]()
            pairWords.put(k, lst)
          }
          lst.add(Integer.valueOf(wi)); ()
        }
        i += 1
      }
    }
    def removeWord(wi: Int, touched: java.util.HashSet[P]): Unit = {
      val w = words(wi); val c = counts(wi)
      var i = 0
      while (i < w.length - 1) {
        val k = (w(i), w(i + 1))
        bump(k, -c)
        touched.add(k)
        i += 1
      }
    }

    var wi = 0
    while (wi < words.length) { addWord(wi, null); wi += 1 }

    val heap = new java.util.PriorityQueue[(Long, String, String)](
      math.max(16, pairFreq.size),
      new java.util.Comparator[(Long, String, String)] {
        def compare(x: (Long, String, String),
                    y: (Long, String, String)): Int = {
          if (x._1 != y._1) java.lang.Long.compare(y._1, x._1)
          else {
            val c = x._2.compareTo(y._2)
            if (c != 0) c else x._3.compareTo(y._3)
          }
        }
      })
    val init = pairFreq.entrySet().iterator()
    while (init.hasNext) {
      val e = init.next()
      if (e.getValue.longValue >= minFreq)
        heap.add((e.getValue.longValue, e.getKey._1, e.getKey._2))
    }

    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      var best: P = null
      while (best == null && !heap.isEmpty) {
        val e = heap.poll()
        val k = (e._2, e._3)
        val cur = pairFreq.get(k)
        val curF = if (cur == null) 0L else cur.longValue
        if (curF == e._1 && curF >= minFreq) best = k
        else if (curF >= minFreq) { heap.add((curF, e._2, e._3)); () }
      }
      if (best == null) done = true
      else {
        merges += best
        val (a, b) = best
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
              if (has) { // stale index entries skip here
                removeWord(wiI.intValue, touched)
                val out =
                  new scala.collection.mutable.ArrayBuffer[String](w.length)
                var k = 0
                while (k < w.length) {
                  if (k < w.length - 1 && w(k) == a && w(k + 1) == b) {
                    out += (a + b); k += 2
                  } else { out += w(k); k += 1 }
                }
                words(wiI.intValue) = out.toArray
                addWord(wiI.intValue, touched)
              }
            }
          }
        }
        pairFreq.remove(best) // fully consumed by the rewrites
        touched.remove(best)
        val ti = touched.iterator()
        while (ti.hasNext) {
          val k = ti.next()
          val f = pairFreq.get(k)
          if (f != null && f.longValue >= minFreq)
            heap.add((f.longValue, k._1, k._2))
        }
        round += 1
      }
    }
    merges.result()
  }

  /** Persist a trained model as a tiny parquet artifact
    * `(rank, left, right, byte_level)` — the tokenizer is trained ONCE
    * per corpus epoch and applied by every later pipeline run, so it
    * needs a durable, engine-neutral spelling (any tool can read the
    * merge list back in rank order). */
  def save(model: BpeModel, path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b, model.byteLevel) }
      .toDF("rank", "left", "right", "byte_level")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]] (pre-r11 artifacts without the
    * `byte_level` column load as classic word-level models). */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): BpeModel = {
    import spark.implicits._
    val df = spark.read.parquet(path)
    val byteLevel = df.columns.contains("byte_level") &&
      df.select(col("byte_level")).limit(1).as[Boolean]
        .collect().headOption.getOrElse(false)
    BpeModel(df
      .select(col("rank").cast("int"), col("left"), col("right"))
      .as[(Int, String, String)].collect().sortBy(_._1)
      .map { case (_, a, b) => (a, b) }.toVector, byteLevel)
  }

  /** array<string> of BPE symbols for `text` (codegen'd). */
  def encode(text: Column, model: BpeModel): Column =
    KernelExprs.bpe_encode(text, model.table)

  /** BPE token count of `text` (codegen'd, no array materialized). */
  def tokenCount(text: Column, model: BpeModel): Column =
    KernelExprs.bpe_count(text, model.table)

  /** Lossless inverse of byte-level [[encode]] (codegen'd; refuses
    * classic word-level models, whose alphabet drops whitespace). */
  def decode(tokens: Column, model: BpeModel): Column =
    KernelExprs.bpe_decode(tokens, model.table)

  /** TOKEN IDS (array<int>) — the integer sequences a training pipeline
    * actually writes. GPT-2 id space: base byte symbols take their byte
    * value (0-255), the k-th merge's output takes 256+k, so
    * `vocabSize == 256 + merges.length` and every producible token has
    * an id (closed alphabet, no unknown-token escape). Byte-level
    * models only; codegen'd. */
  def encodeIds(text: Column, model: BpeModel): Column =
    KernelExprs.bpe_encode_ids(text, model.table)

  /** Lossless inverse of [[encodeIds]] (codegen'd). */
  def decodeIds(ids: Column, model: BpeModel): Column =
    KernelExprs.bpe_decode_ids(ids, model.table)

  /** Total id-space size of a byte-level model: 256 + merges. */
  def vocabSize(model: BpeModel): Int = model.table.vocabSize
}
