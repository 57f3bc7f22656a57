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
  * Two symbol alphabets, chosen at train time:
  *
  *  - `byteLevel = false` (classic Sennrich et al. 2016,
  *    arXiv:1508.07909): a word is its chars plus a terminal `</w>`;
  *    whole-text encoding pre-tokenizes on whitespace — byte-identical to
  *    the `split(text, "\\s+")` pre-tokenizer
  *    [[graft.operators.Bpe.train]] counts words with (same Java regex
  *    engine). Whitespace itself is NOT represented, so decoding is
  *    lossy.
  *  - `byteLevel = true` (the GPT-2 recipe, Radford et al. 2019): text
  *    pre-tokenizes with the GPT-2 regex ([[BpeTable.PretokenPattern]] —
  *    contiguous letters/digits/punctuation runs with their leading
  *    space, whitespace runs), every piece becomes its UTF-8 BYTES mapped
  *    through the printable byte↔char table ([[BpeTable.byteToChar]]),
  *    and there is no end-of-word marker. The alphabet is exactly 256
  *    symbols, so ANY string — CJK, emoji, control bytes — is covered
  *    with no unknown-token escape hatch, and [[decodeTokens]] losslessly
  *    reconstructs the original bytes (the coverage guarantee a
  *    whitespace/char-level tokenizer cannot give a multilingual corpus).
  *
  * Encoding is the standard greedy merge-by-rank loop: while any adjacent
  * symbol pair appears in the merge table, the LOWEST-ranked (earliest
  * learned) pair merges everywhere in the word.
  *
  * Per-executor word cache: natural text re-uses words heavily (Zipf), so
  * a bounded cache turns the per-word merge loop into a hash lookup for
  * the bulk of a corpus. The cache is an executor-local optimization —
  * results are identical with or without it.
  */
final class BpeTable(val merges: Array[String],
                     val byteLevel: Boolean = false) extends Serializable {

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

  val EndOfWord = BpeTable.EndOfWord

  /** Encode ONE pre-tokenized piece (a whitespace-free word in classic
    * mode; any regex piece, whitespace included, in byte-level mode). */
  def encodeWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    var symbols = BpeTable.initialSymbols(word, byteLevel)
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

  /** Encode whole text: pre-tokenize (whitespace split or the GPT-2
    * regex, by mode), concatenate per-piece symbol streams. Returns an
    * array<string> ArrayData. */
  def encodeText(text: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](64)
    def emit(piece: String): Unit = {
      val syms = encodeWord(piece)
      var j = 0
      while (j < syms.length) {
        out += UTF8String.fromString(syms(j)); j += 1
      }
    }
    if (byteLevel) {
      val m = BpeTable.pretokenizer.matcher(text.toString)
      while (m.find()) emit(m.group())
    } else {
      val words = text.toString.split("\\s+")
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) emit(words(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Token count without materializing the token array (the hot lane for
    * budget accounting — same loop, just a counter). */
  def countTokens(text: UTF8String): Long = {
    var n = 0L
    if (byteLevel) {
      val m = BpeTable.pretokenizer.matcher(text.toString)
      while (m.find()) n += encodeWord(m.group()).length
    } else {
      val words = text.toString.split("\\s+")
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) n += encodeWord(words(i)).length
        i += 1
      }
    }
    n
  }

  // ---- TOKEN IDS (byte-level only): the integer space a training
  // pipeline actually emits. GPT-2's id assignment: base byte symbols
  // take their byte value (0-255), the k-th learned merge's output takes
  // 256+k — so vocabSize == 256 + merges.length, and EVERY token any
  // input can produce has an id (closed alphabet, no <unk>). Two merges
  // can produce the same output string via different split paths; the
  // EARLIEST rank owns the id (encode emits it, decode renders the same
  // string either way).

  /** vocabSize == 256 + merges.length (byte-level only). */
  def vocabSize: Int = {
    require(byteLevel, "token ids are defined for byte-level models only")
    256 + merges.length
  }

  @transient private lazy val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      val sp = merges(i).indexOf(' ')
      val out = merges(i).substring(0, sp) + merges(i).substring(sp + 1)
      if (!m.containsKey(out)) m.put(out, 256 + i)
      i += 1
    }
    m
  }

  @transient private lazy val symOfMergeId: Array[String] = {
    val arr = new Array[String](merges.length)
    var i = 0
    while (i < merges.length) {
      val sp = merges(i).indexOf(' ')
      arr(i) = merges(i).substring(0, sp) + merges(i).substring(sp + 1)
      i += 1
    }
    arr
  }

  private def tokenId(sym: String): Int =
    if (sym.length == 1) {
      val c = sym.charAt(0).toInt
      val b = if (c < BpeTable.charToByte.length) BpeTable.charToByte(c)
        else -1
      require(b >= 0, s"not a byte symbol: U+${c.toHexString}")
      b
    } else {
      val id = idOf.get(sym)
      require(id != null, s"symbol '$sym' is not in the merge vocabulary")
      id.intValue
    }

  /** Encode whole text to TOKEN IDS (array<int>; byte-level only). */
  def encodeIds(text: UTF8String): ArrayData = {
    require(byteLevel, "token ids are defined for byte-level models only")
    val out = new scala.collection.mutable.ArrayBuffer[Any](64)
    val m = BpeTable.pretokenizer.matcher(text.toString)
    while (m.find()) {
      val syms = encodeWord(m.group())
      var j = 0
      while (j < syms.length) { out += tokenId(syms(j)); j += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  /** LOSSLESS inverse of [[encodeIds]]: ids back to the original text. */
  def decodeIds(ids: ArrayData): UTF8String = {
    require(byteLevel, "token ids are defined for byte-level models only")
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < ids.numElements()) {
      val id = ids.getInt(i)
      if (id < 256) {
        require(id >= 0, s"negative token id $id")
        sb.append(BpeTable.byteToChar(id))
      } else {
        require(id - 256 < merges.length,
          s"token id $id out of vocabulary (size $vocabSize)")
        sb.append(symOfMergeId(id - 256))
      }
      i += 1
    }
    val s = sb.toString
    val bytes = new Array[Byte](s.length)
    var j = 0
    while (j < s.length) {
      val c = s.charAt(j).toInt
      val b =
        if (c < BpeTable.charToByte.length) BpeTable.charToByte(c) else -1
      require(b >= 0, s"not a byte-level symbol char: U+${c.toHexString}")
      bytes(j) = b.toByte
      j += 1
    }
    UTF8String.fromBytes(bytes)
  }

  /** LOSSLESS inverse of byte-level encoding: concatenate the tokens'
    * symbol chars, map each back to its byte, decode as UTF-8. Defined
    * for byte-level models only — the classic alphabet drops whitespace
    * and has no inverse. */
  def decodeTokens(tokens: ArrayData): UTF8String = {
    require(byteLevel,
      "decode is defined for byte-level models only (classic word-level " +
        "BPE drops whitespace and cannot reconstruct the input)")
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < tokens.numElements()) {
      sb.append(tokens.getUTF8String(i).toString); i += 1
    }
    val s = sb.toString
    val bytes = new Array[Byte](s.length)
    var j = 0
    while (j < s.length) {
      val c = s.charAt(j).toInt
      val b =
        if (c < BpeTable.charToByte.length) BpeTable.charToByte(c) else -1
      require(b >= 0, s"not a byte-level symbol char: U+${c.toHexString}")
      bytes(j) = b.toByte
      j += 1
    }
    UTF8String.fromBytes(bytes)
  }
}

object BpeTable {

  val EndOfWord = "</w>"

  /** The GPT-2 pre-tokenizer (Radford et al. 2019, public `encoder.py`):
    * common English contractions, letter runs, digit runs, and
    * punctuation runs each claim an optional LEADING space (so "world"
    * and " world" are distinct tokens — spaces ride inside tokens, which
    * is what makes decoding lossless), trailing whitespace runs match as
    * their own pieces. `(?U)` makes Java's `\s` Unicode-aware like
    * Python's. The alternation is EXHAUSTIVE: every char is a letter, a
    * digit, non-space-non-alnum, or whitespace, so the concatenation of
    * all matches is exactly the input — the coverage property the
    * round-trip spec pins. */
  val PretokenPattern: String =
    "(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+"

  private[graft] lazy val pretokenizer: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(PretokenPattern)

  /** GPT-2's bytes_to_unicode: the 188 printable single-width Latin-1
    * bytes map to themselves; the other 68 (controls, space, DEL, NBSP,
    * soft hyphen) map to 256+n — every byte gets a PRINTABLE char, so
    * merge-table entries stay debuggable strings. Bijective. */
  private[graft] val byteToChar: Array[Char] = {
    val arr = new Array[Char](256)
    val keep = (('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++
      (0xAE to 0xFF)).toSet
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  /** Inverse of [[byteToChar]] (−1 = not a symbol char). */
  private[graft] val charToByte: Array[Int] = {
    val arr = Array.fill(512)(-1)
    var b = 0
    while (b < 256) { arr(byteToChar(b).toInt) = b; b += 1 }
    arr
  }

  /** A piece's initial symbol sequence — the SHARED definition the
    * trainer ([[graft.operators.Bpe.train]]) and the encoder use, which
    * is what makes train-time and encode-time vocabularies agree. */
  private[graft] def initialSymbols(word: String,
                                    byteLevel: Boolean): Array[String] =
    if (byteLevel) {
      val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val arr = new Array[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        arr(i) = String.valueOf(byteToChar(bytes(i) & 0xFF)); i += 1
      }
      arr
    } else {
      val arr = new Array[String](word.length + 1)
      var i = 0
      while (i < word.length) {
        // surrogate pairs stay split here (char-level init, like the
        // original); merges re-join any pair the corpus supports
        arr(i) = String.valueOf(word.charAt(i)); i += 1
      }
      arr(word.length) = EndOfWord
      arr
    }
}
