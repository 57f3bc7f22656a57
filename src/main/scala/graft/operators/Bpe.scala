package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeTable, KernelExprs}

/** Byte-pair-encoding tokenizer TRAINING over a corpus (Sennrich et al.
  * 2016, arXiv:1508.07909 — the GPT-2 recipe), shaped for a 100 TB
  * corpus the way production tokenizer trainers are (HuggingFace
  * `tokenizers`, SentencePiece): the only corpus-proportional work is ONE
  * distributed word-frequency aggregation (map-side-combined groupBy —
  * the corpus is read once, shuffled as (word, count) partials), and the
  * merge-learning loop runs on the COLLECTED word-frequency table, which
  * is vocabulary-sized (Heaps' law: ~10^6-10^7 distinct words for web
  * scale), bounded here by `maxWords` (top by frequency — the tail it
  * cuts cannot influence early merges anyway) and `minFreq`.
  *
  * Learning loop (driver, deterministic): words are symbol sequences
  * (chars + `</w>`); each round counts adjacent-pair frequencies weighted
  * by word count, merges the most frequent pair (ties break on the
  * lexicographically SMALLEST pair, so training is reproducible across
  * runs, partitionings, and cluster sizes), and rewrites the table.
  * Rounds that find no pair with frequency ≥ `minFreq` stop early.
  *
  * Encoding/counting apply the trained table via the codegen'd
  * [[graft.functions.KernelExprs.BpeEncode]]/[[KernelExprs.BpeCount]]
  * expressions — the table serializes WITH the plan, the merge loop runs
  * inside whole-stage codegen, and a per-executor word cache makes the
  * Zipf bulk of a corpus a hash lookup per word.
  */
object Bpe {

  /** A trained model: ordered merges (earliest rank first). */
  final case class BpeModel(merges: Vector[(String, String)]) {
    lazy val table: BpeTable =
      new BpeTable(merges.map { case (a, b) => s"$a $b" }.toArray)
    /** Driver-side reference encoder (specs, small probes). */
    def encodeWord(word: String): Seq[String] =
      table.encodeWord(word).toSeq
  }

  /** Train `numMerges` merges from `docs`' `text` column. */
  def train(docs: DataFrame, text: Column, numMerges: Int,
            maxWords: Int = 1 << 20, minFreq: Long = 2L): BpeModel = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    // the distributed part: one combine-reduced word count, capped for
    // driver memory by taking the most frequent words (deterministic
    // tie-break on the word itself)
    val wordCounts = TopK.global(
      docs.select(explode(split(text, "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= minFreq),
      maxWords, col("freq").desc, col("word").asc)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // driver loop over the vocabulary-sized table
    val counts = wordCounts.map(_._2)
    val words: Array[Array[String]] = wordCounts.map { case (w, _) =>
      val arr = new Array[String](w.length + 1)
      var i = 0
      while (i < w.length) { arr(i) = String.valueOf(w.charAt(i)); i += 1 }
      arr(w.length) = "</w>"
      arr
    }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairFreq = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        var i = 0
        while (i < w.length - 1) {
          val k = (w(i), w(i + 1))
          val c = pairFreq.get(k)
          pairFreq.put(k, (if (c == null) 0L else c.longValue) + counts(wi))
          i += 1
        }
        wi += 1
      }
      var best: (String, String) = null
      var bestFreq = minFreq - 1 // a merge must clear minFreq
      val it = pairFreq.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        val f = e.getValue.longValue
        if (f > bestFreq || (f == bestFreq && best != null &&
          (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
          best = k; bestFreq = f
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val (a, b) = best
        wi = 0
        while (wi < words.length) {
          val w = words(wi)
          var has = false
          var i = 0
          while (!has && i < w.length - 1) {
            has = w(i) == a && w(i + 1) == b; i += 1
          }
          if (has) {
            val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
            var k = 0
            while (k < w.length) {
              if (k < w.length - 1 && w(k) == a && w(k + 1) == b) {
                out += (a + b); k += 2
              } else { out += w(k); k += 1 }
            }
            words(wi) = out.toArray
          }
          wi += 1
        }
        round += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Persist a trained model as a tiny parquet artifact
    * `(rank, left, right)` — the tokenizer is trained ONCE per corpus
    * epoch and applied by every later pipeline run, so it needs a
    * durable, engine-neutral spelling (any tool can read the merge list
    * back in rank order). */
  def save(model: BpeModel, path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): BpeModel = {
    import spark.implicits._
    BpeModel(spark.read.parquet(path)
      .select(col("rank").cast("int"), col("left"), col("right"))
      .as[(Int, String, String)].collect().sortBy(_._1)
      .map { case (_, a, b) => (a, b) }.toVector)
  }

  /** array<string> of BPE symbols for `text` (codegen'd). */
  def encode(text: Column, model: BpeModel): Column =
    KernelExprs.bpe_encode(text, model.table)

  /** BPE token count of `text` (codegen'd, no array materialized). */
  def tokenCount(text: Column, model: BpeModel): Column =
    KernelExprs.bpe_count(text, model.table)
}
