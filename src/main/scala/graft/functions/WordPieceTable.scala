package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** A trained WordPiece vocabulary and its encoder (Schuster & Nakajima
  * 2012; the BERT tokenizer, Devlin et al. 2019) — the kernel behind
  * [[KernelExprs.WpEncode]]. Serializable, ships with the plan via
  * `addReferenceObj` (the [[BpeTable]] pattern).
  *
  * Encoding is BERT's greedy LONGEST-MATCH-FIRST: per whitespace word,
  * repeatedly take the longest vocabulary piece that prefixes the
  * remaining characters (non-initial pieces carry the `##` continuation
  * marker); if no piece matches — or the word exceeds
  * `maxInputChars` — the WHOLE word becomes `[UNK]` (BERT's rule: a
  * word is either fully tokenized or fully unknown, never half). A
  * vocabulary containing every single character of the training corpus
  * therefore never emits `[UNK]` on that corpus.
  *
  * Pre-tokenization is whitespace (`\s+`), matching the engine's classic
  * word-level BPE lane so the two tokenizer families share one
  * conservation oracle shape (whitespace-stripped characters).
  */
final class WordPieceTable(pieces: Array[String]) extends Serializable {

  val unk = "[UNK]"
  val maxInputChars = 200

  private val vocab: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(p => s.add(p))
    s
  }
  private val maxPieceLen: Int =
    if (pieces.isEmpty) 0 else pieces.iterator.map(_.length).max

  def contains(p: String): Boolean = vocab.contains(p)
  def size: Int = vocab.size
  private[graft] def entries: Iterator[String] = {
    import scala.jdk.CollectionConverters._
    vocab.iterator().asScala
  }

  /** Greedy longest-match pieces of one word. */
  def encodeWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    if (word.length > maxInputChars) return Array(unk)
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    var start = 0
    while (start < word.length) {
      // longest candidate first; the ## prefix costs 2 chars of budget
      var end = math.min(word.length,
        start + math.max(1, maxPieceLen - (if (start > 0) 2 else 0)))
      var cur: String = null
      while (cur == null && end > start) {
        val sub0 = word.substring(start, end)
        val sub = if (start > 0) "##" + sub0 else sub0
        if (vocab.contains(sub)) cur = sub else end -= 1
      }
      if (cur == null) { out.clear(); out += unk; start = word.length }
      else { out += cur; start = end }
    }
    out.toArray
  }

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Whole-text encode: whitespace pre-tokenization, per-word pieces. */
  def encodeText(text: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](16)
    ws.split(text.toString).foreach { w =>
      if (w.nonEmpty) encodeWord(w).foreach(p => out += UTF8String.fromString(p))
    }
    new GenericArrayData(out.toArray[Any])
  }

  def countTokens(text: UTF8String): Long = {
    var n = 0L
    ws.split(text.toString).foreach { w =>
      if (w.nonEmpty) n += encodeWord(w).length
    }
    n
  }
}
