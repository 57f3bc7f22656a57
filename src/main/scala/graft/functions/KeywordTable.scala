package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** AHO-CORASICK multi-pattern matcher (Aho & Corasick 1975) — dictionary
  * keyword tagging at corpus scale: which of K patterns occur as
  * substrings of a document, in ONE pass over the text regardless of K.
  * The scale-correct form of `contains(text, kw1) OR contains(text, kw2)
  * OR ...` — a 10^4-entry blocklist or topic lexicon costs the same scan
  * as a single keyword, where the OR-chain spelling rescans the document
  * K times.
  *
  * The kernel behind [[KernelExprs.KeywordHits]] — serializable, ships to
  * executors WITH the plan via `addReferenceObj` (the
  * [[BpeTable]]/[[NgramLmTable]] pattern), so matching runs inside
  * whole-stage codegen with zero joins and zero broadcast plumbing.
  *
  * Semantics (chosen to replay exactly in the SQL oracle): a keyword
  * matches iff it occurs as a SUBSTRING of the input — the caller
  * lowercases (`lower(text)`) if case-insensitive tagging is wanted, so
  * engine and oracle share one case-folding implementation. Output is
  * the DISTINCT matched keywords in lexicographic order (the dictionary
  * is sorted at build), deterministic for any input.
  *
  * Matching is over UTF-16 code units (Java chars) of the decoded
  * string: correct for any keyword set, since a match is verified by
  * position-free substring identity — surrogate pairs never split a
  * match that textual containment would not also split. */
final class KeywordTable private (
    val keywords: Array[String],
    gotoMaps: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    // per node: indices into `keywords` that END at this node, plus the
    // transitive output via fail links (pre-flattened at build)
    outputs: Array[Array[Int]]) extends Serializable {

  def size: Int = keywords.length

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val nxt = gotoMaps(s).get(c)
      if (nxt != null) return nxt.intValue()
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Distinct matched keywords, lexicographic order. */
  def hits(text: UTF8String): GenericArrayData = {
    val seen = new Array[Boolean](keywords.length)
    var found = 0
    val s = text.toString
    var state = 0
    var i = 0
    val n = s.length
    while (i < n && found < keywords.length) {
      state = step(state, s.charAt(i))
      val out = outputs(state)
      var j = 0
      while (j < out.length) {
        if (!seen(out(j))) { seen(out(j)) = true; found += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Any](found)
    var k = 0
    var w = 0
    while (k < keywords.length) {
      if (seen(k)) { res(w) = UTF8String.fromString(keywords(k)); w += 1 }
      k += 1
    }
    new GenericArrayData(res)
  }

  /** Number of DISTINCT dictionary keywords present (the cheap gate
    * column for threshold filters). */
  def hitCount(text: UTF8String): Int = hits(text).numElements()
}

object KeywordTable {

  /** Build the automaton from a dictionary (driver-side; the dictionary
    * is vocabulary-sized by definition). Keywords are deduplicated and
    * sorted; empty keywords refuse — every string contains "". */
  def build(dict: Seq[String]): KeywordTable = {
    val kws = dict.distinct.sorted.toArray
    require(kws.nonEmpty, "keyword dictionary must be non-empty")
    require(kws.forall(_.nonEmpty), "empty keyword: every string matches")

    val gotoMaps = new scala.collection.mutable.ArrayBuffer[
      java.util.HashMap[Character, Integer]]()
    val outList = new scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.ArrayBuffer[Int]]()
    def newNode(): Int = {
      gotoMaps += new java.util.HashMap[Character, Integer]()
      outList += new scala.collection.mutable.ArrayBuffer[Int]()
      gotoMaps.length - 1
    }
    newNode() // root = 0

    // trie
    kws.zipWithIndex.foreach { case (kw, ki) =>
      var s = 0
      kw.foreach { c =>
        val nxt = gotoMaps(s).get(c)
        s = if (nxt != null) nxt.intValue()
        else { val n = newNode(); gotoMaps(s).put(c, n); n }
      }
      outList(s) += ki
    }

    // fail links, BFS; outputs become transitive via the fail link
    val fail = new Array[Int](gotoMaps.length)
    val queue = new scala.collection.mutable.Queue[Int]()
    gotoMaps(0).forEach { (_, n) => fail(n) = 0; queue.enqueue(n) }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && gotoMaps(f).get(c) == null) f = fail(f)
        val fn = gotoMaps(f).get(c)
        fail(v) = if (fn != null && fn.intValue() != v) fn.intValue() else 0
        outList(v) ++= outList(fail(v))
        queue.enqueue(v)
      }
    }

    new KeywordTable(kws, gotoMaps.toArray, fail,
      outList.map(_.toArray).toArray)
  }
}
