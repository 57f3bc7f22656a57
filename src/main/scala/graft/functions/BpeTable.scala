package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** A trained byte-pair-encoding merge table and its encoder — the kernel
  * behind [[KernelExprs.BpeEncode]]. Serializable: the expression holds an
  * instance, so the table ships to executors WITH the plan (via
  * `addReferenceObj` in codegen) — no static registry an executor could
  * miss, no broadcast lifecycle to manage for a table that is at most a
  * few MB (numMerges entries).
  *
  * Encoding is the standard greedy merge-by-rank loop (Sennrich et al.
  * 2016, arXiv:1508.07909 — the GPT-2 tokenizer shape): a word starts as
  * its characters plus a terminal `</w>` marker; while any adjacent
  * symbol pair appears in the merge table, the LOWEST-ranked (earliest
  * learned) pair merges everywhere in the word. Whole-text encoding
  * pre-tokenizes on whitespace — byte-identical to the `split(text,
  * "\\s+")` pre-tokenizer [[graft.operators.Bpe.train]] counts words
  * with (same Java regex engine), which is what makes train-time and
  * encode-time vocabularies agree.
  *
  * Per-executor word cache: natural text re-uses words heavily (Zipf), so
  * a bounded cache turns the per-word merge loop into a hash lookup for
  * the bulk of a corpus. The cache is an executor-local optimization —
  * results are identical with or without it.
  */
final class BpeTable(val merges: Array[String]) extends Serializable {

  /** "a b" -> rank (earlier = merges first). */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), i); i += 1 }
    m
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MaxCache = 1 << 16

  val EndOfWord = "</w>"

  /** Encode ONE word (no whitespace) to its BPE symbols. */
  def encodeWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    var symbols = new Array[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      // surrogate pairs stay split here (char-level init, like the
      // original); merges re-join any pair the corpus supports
      symbols(i) = String.valueOf(word.charAt(i))
      i += 1
    }
    symbols(word.length) = EndOfWord
    while (symbols.length > 1) {
      // find the lowest-ranked adjacent pair
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < symbols.length - 1) {
        val r = ranks.get(symbols(j) + " " + symbols(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) {
        if (cache.size < MaxCache) cache.put(word, symbols)
        return symbols
      }
      // merge EVERY occurrence of the best pair, left to right
      val a = symbols(bestAt)
      val b = symbols(bestAt + 1)
      val out = new scala.collection.mutable.ArrayBuffer[String](symbols.length)
      var k = 0
      while (k < symbols.length) {
        if (k < symbols.length - 1 && symbols(k) == a && symbols(k + 1) == b) {
          out += (a + b); k += 2
        } else { out += symbols(k); k += 1 }
      }
      symbols = out.toArray
    }
    if (cache.size < MaxCache) cache.put(word, symbols)
    symbols
  }

  /** Encode whole text: whitespace pre-tokenize, concatenate per-word
    * symbol streams. Returns an array<string> ArrayData. */
  def encodeText(text: UTF8String): ArrayData = {
    val words = text.toString.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[Any](words.length * 4)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val syms = encodeWord(words(i))
        var j = 0
        while (j < syms.length) {
          out += UTF8String.fromString(syms(j)); j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Token count without materializing the token array (the hot lane for
    * budget accounting — same loop, just a counter). */
  def countTokens(text: UTF8String): Long = {
    val words = text.toString.split("\\s+")
    var n = 0L
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) n += encodeWord(words(i)).length
      i += 1
    }
    n
  }
}
