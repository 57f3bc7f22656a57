package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** A trained UNIGRAM language-model tokenizer (Kudo 2018,
  * arXiv:1804.10959 — the SentencePiece `--model_type=unigram` family)
  * and its Viterbi encoder — the kernel behind
  * [[KernelExprs.UnigramEncode]]. Serializable: the expression holds an
  * instance, so the piece table ships to executors WITH the plan (via
  * `addReferenceObj` under codegen) — no registry, no broadcast
  * lifecycle.
  *
  * Text model (the SentencePiece convention): every space becomes the
  * marker `▁` (U+2581) and a dummy marker is prepended, so the marked
  * text splits into WORD UNITS each beginning with `▁` — pieces never
  * cross a word boundary (`--split_by_whitespace=true`, the default),
  * which bounds the Viterbi lattice per unit and makes a per-executor
  * unit cache effective (Zipf reuse, identical results with or without).
  * [[decodeTokens]] concatenates pieces, maps `▁` back to space and
  * drops the one dummy prefix — byte-exact inverse for ANY input text
  * that does not itself contain `▁` (runs of spaces round-trip: each
  * extra space is its own empty unit `▁`).
  *
  * Segmentation: Viterbi over the unit's character lattice — the
  * highest-log-probability piece sequence wins; exact ties break toward
  * the LONGER last piece, then recursively (a fixed rule, so encoding is
  * deterministic across runs, executors, and partitionings). Characters
  * outside the vocabulary emit as single-char pieces at
  * [[unkLogProb]] (id `0`, the `<unk>` slot, in the id space) — encode
  * never fails, but only corpus-alphabet text gets the byte-exact
  * ID round-trip (byte-level BPE is the engine's any-input-coverage
  * tokenizer; unigram trades that for probabilistic segmentation).
  *
  * Id space: `0 = <unk>`, piece `i` (trained order) `→ i + 1`;
  * `vocabSize == pieces.length + 1`.
  */
final class UnigramTable(val pieces: Array[String],
                         val logProbs: Array[Double]) extends Serializable {
  require(pieces.length == logProbs.length,
    s"pieces/logProbs length mismatch: ${pieces.length} vs ${logProbs.length}")

  /** Fallback score for out-of-vocabulary single chars — far below every
    * real piece so <unk> never beats a trained segmentation. */
  val unkLogProb: Double =
    (if (logProbs.isEmpty) 0.0 else logProbs.min) - 16.0

  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      if (!m.containsKey(pieces(i))) m.put(pieces(i), i)
      i += 1
    }
    m
  }

  @transient private lazy val maxPieceLen: Int =
    if (pieces.isEmpty) 1 else pieces.map(_.length).max

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MaxCache = 1 << 16

  def vocabSize: Int = pieces.length + 1

  /** Viterbi-segment ONE word unit (marker-prefixed, whitespace-free). */
  def segmentUnit(unit: String): Array[String] = {
    val hit = cache.get(unit)
    if (hit != null) return hit
    val L = unit.length
    val best = new Array[Double](L + 1)
    val back = new Array[Int](L + 1) // start index of the piece ending here
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var end = 1
    while (end <= L) {
      val lo = math.max(0, end - maxPieceLen)
      var start = lo
      while (start < end) {
        if (best(start) > Double.NegativeInfinity) {
          val piece = unit.substring(start, end)
          val id = index.get(piece)
          val lp =
            if (id != null) logProbs(id.intValue)
            else if (end - start == 1) unkLogProb
            else Double.NegativeInfinity
          if (lp > Double.NegativeInfinity) {
            val cand = best(start) + lp
            // strictly-greater keeps the FIRST (smallest start = longest
            // piece) candidate on exact ties — the deterministic rule
            if (cand > best(end)) {
              best(end) = cand; back(end) = start
            }
          }
        }
        start += 1
      }
      end += 1
    }
    // walk back
    var n = 0
    var at = L
    while (at > 0) { n += 1; at = back(at) }
    val out = new Array[String](n)
    at = L
    var k = n - 1
    while (at > 0) {
      out(k) = unit.substring(back(at), at); k -= 1; at = back(at)
    }
    if (cache.size < MaxCache) cache.put(unit, out)
    out
  }

  /** Marked form: dummy prefix + every space to `▁`. */
  private def marked(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length + 1)
    sb.append('▁')
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      sb.append(if (c == ' ') '▁' else c)
      i += 1
    }
    sb.toString
  }

  /** Encode whole text: mark, split into `▁`-led units, Viterbi each. */
  def encodeText(text: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](64)
    eachUnit(text.toString) { unit =>
      val syms = segmentUnit(unit)
      var j = 0
      while (j < syms.length) {
        out += UTF8String.fromString(syms(j)); j += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Token count — same lattice walk, no array materialized. */
  def countTokens(text: UTF8String): Long = {
    var n = 0L
    eachUnit(text.toString) { unit => n += segmentUnit(unit).length }
    n
  }

  private def eachUnit(text: String)(f: String => Unit): Unit = {
    val m = marked(text)
    var start = 0
    var i = 1
    while (i <= m.length) {
      if (i == m.length || m.charAt(i) == '▁') {
        f(m.substring(start, i)); start = i
      }
      i += 1
    }
  }

  /** Byte-exact inverse of [[encodeText]] for marker-free input: concat,
    * `▁`→space, drop the one dummy prefix. */
  def decodeTokens(tokens: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < tokens.numElements()) {
      sb.append(tokens.getUTF8String(i).toString); i += 1
    }
    var j = 0
    while (j < sb.length) {
      if (sb.charAt(j) == '▁') sb.setCharAt(j, ' '); j += 1
    }
    val s = sb.toString
    UTF8String.fromString(if (s.startsWith(" ")) s.substring(1) else s)
  }

  /** Encode to TOKEN IDS: `<unk>`/OOV-char pieces → 0, piece i → i+1. */
  def encodeIds(text: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](64)
    eachUnit(text.toString) { unit =>
      val syms = segmentUnit(unit)
      var j = 0
      while (j < syms.length) {
        val id = index.get(syms(j))
        out += (if (id == null) 0 else id.intValue + 1)
        j += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Inverse of [[encodeIds]] (id 0 renders as the literal `<unk>`;
    * corpus-alphabet text never produces it). */
  def decodeIds(ids: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < ids.numElements()) {
      val id = ids.getInt(i)
      require(id >= 0 && id < vocabSize,
        s"token id $id out of vocabulary (size $vocabSize)")
      sb.append(if (id == 0) "<unk>" else pieces(id - 1))
      i += 1
    }
    var j = 0
    while (j < sb.length) {
      if (sb.charAt(j) == '▁') sb.setCharAt(j, ' '); j += 1
    }
    val s = sb.toString
    UTF8String.fromString(if (s.startsWith(" ")) s.substring(1) else s)
  }
}
