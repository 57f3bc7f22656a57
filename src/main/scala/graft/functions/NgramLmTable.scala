package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** A counted n-gram language model scored with STUPID BACKOFF (Brants et
  * al. 2007, "Large Language Models in Machine Translation" — the scheme
  * designed for exactly this setting: distributed count-based LMs where
  * normalized Kneser-Ney smoothing is not worth its global passes). The
  * kernel behind [[KernelExprs.NgramLmScore]] — serializable, ships to
  * executors WITH the plan via `addReferenceObj`, same pattern as
  * [[BpeTable]]/[[UnigramTable]].
  *
  * Score of token w at position i (0-based), context capped at the
  * document start (no BOS padding — deterministic and engine-neutral):
  *
  *   kmax = min(n, i+1); descend k = kmax..2:
  *     S = count(w_{i-k+1..i}) / count(w_{i-k+1..i-1})   if BOTH counts
  *         are present (minCount/top-K pruning can drop a context while
  *         keeping an extension — such levels are skipped, same as "not
  *         found");
  *   each failed level adds one ln(α) penalty (α = 0.4 in the paper) to
  *   the position's log-score; the unigram base case is count(w)/total,
  *   with an OOV floor of ONE pseudo-count: 1/total. Scores are
  *   log-relative-frequencies, not normalized probabilities — exactly
  *   what corpus-quality filtering (the CCNet perplexity gate) needs.
  *
  * Determinism — the ENGINE-PROOF integer contract (r13): a per-position
  * score decomposes additively over ln-micros of INTEGER COUNTS,
  *
  *   micros(i) = lnm(num) − lnm(den) + backoffs · penalty
  *   lnm(v)    = [[Kernels.lnFixMicros]] — a PURE-INTEGER fixed-point
  *               log (bit-length + 20 repeated-squaring log₂ bits, one
  *               multiply-shift to ln-micros), zero libm
  *   penalty   = lnm(round(α·10⁶)) − lnm(10⁶)   (≈ ln(α)·10⁶)
  *
  * and a document's score is the EXACT long sum of its positions' micros
  * — order-free, so Spark partitioning and the SQL oracle's aggregation
  * order cannot move it. The oracle REPLAYS the same integer recurrence
  * as a recursive CTE over the chain's own distinct counts — no libm on
  * either side, no model-deposited literal table, no process-state-
  * dependent dump lane (the r11/r12 q167/q169 hash-red class: a fallback
  * that emitted DuckDB-`ln` SQL whenever oracle_sql.json was dumped
  * without the trained model registered in the same JVM).
  *
  * Tokenization mirrors [[TextFunctions.tokens]] (lowercase, split on
  * `[^a-z0-9]+`) — one vocabulary across the engine's text operators and
  * their oracles.
  */
final class NgramLmTable(
    val n: Int,
    val alpha: Double,
    val total: Long,
    counts: java.util.HashMap[String, java.lang.Long]) extends Serializable {

  require(n >= 1, s"ngram order must be >= 1 (got $n)")
  require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1] (got $alpha)")
  require(total > 0, s"the model must be trained on a non-empty corpus")

  def count(gram: String): Long = {
    val v = counts.get(gram)
    if (v == null) 0L else v.longValue()
  }
  def size: Int = counts.size

  /** Integer ln-micros ([[Kernels.lnFixMicros]]) — cached over the
    * model's Zipf-few distinct count values for the scoring hot loop. */
  def lnMicros(v: Long): Long = {
    val c = lnmCache.get(v)
    if (c != null) c.longValue() else Kernels.lnFixMicros(v)
  }

  /** Per-backoff-level additive penalty, libm-free:
    * lnm(round(α·10⁶)) − lnm(10⁶) ≈ ln(α)·10⁶. The oracle splices this
    * value as an integer literal (it never computes a log itself). */
  val penaltyMicros: Long = {
    val aMicros = math.round(alpha * 1000000.0)
    Kernels.lnFixMicros(aMicros) - Kernels.lnFixMicros(1000000L)
  }

  private val lnmCache: java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    val it = counts.values().iterator()
    while (it.hasNext) {
      val v = it.next().longValue()
      if (!m.containsKey(v)) m.put(v, Kernels.lnFixMicros(v))
    }
    m.put(1L, 0L)
    m.put(total, Kernels.lnFixMicros(total))
    m
  }

  private[graft] def gramEntries: Iterator[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    counts.entrySet().iterator().asScala
      .map(e => e.getKey -> e.getValue.longValue())
  }

  /** [[TextFunctions.tokens]] semantics on the JVM side: Spark's
    * UTF8String lowercase, the same Java regex engine, empties dropped
    * (split keeps a leading empty for punctuation-initial text). */
  private def tokenize(text: UTF8String): Array[String] =
    text.toLowerCase.toString.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def join(ts: Array[String], from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = from
    while (i <= to) {
      if (i > from) sb.append(' ')
      sb.append(ts(i)); i += 1
    }
    sb.toString
  }

  /** struct(n_tokens, sum_num, sum_den, sum_backoffs, sum_lnum, sum_lden)
    * — the SAME per-position walk as [[scoreText]] with the score's four
    * ingredients summed separately, so a gate divergence names its stage:
    * sum_num/sum_den/sum_backoffs need no logarithm (isolating the model
    * lookup + backoff selection), sum_lnum/sum_lden isolate the integer
    * log of exactly those arguments, and
    * logscore = sum_lnum − sum_lden + sum_backoffs · penaltyMicros ties
    * them back to [[scoreText]] (the r13 q167/q169 driver-gate
    * bisection). */
  def scoreParts(text: UTF8String): InternalRow = {
    val ts = tokenize(text)
    var sNum = 0L; var sDen = 0L; var sBack = 0L
    var sLnum = 0L; var sLden = 0L
    var i = 0
    while (i < ts.length) {
      var k = math.min(n, i + 1)
      var backoffs = 0
      var num = -1L
      var den = -1L
      while (num < 0 && k >= 2) {
        val cg = count(join(ts, i - k + 1, i))
        val cc = count(join(ts, i - k + 1, i - 1))
        if (cg > 0 && cc > 0) { num = cg; den = cc }
        else { backoffs += 1; k -= 1 }
      }
      if (num < 0) {
        val c1 = count(ts(i))
        num = if (c1 > 0) c1 else 1L
        den = total
      }
      sNum += num; sDen += den; sBack += backoffs
      sLnum += lnMicros(num); sLden += lnMicros(den)
      i += 1
    }
    val row = new GenericInternalRow(6)
    row.setInt(0, ts.length)
    row.setLong(1, sNum)
    row.setLong(2, sDen)
    row.setLong(3, sBack)
    row.setLong(4, sLnum)
    row.setLong(5, sLden)
    row
  }

  /** struct(n_tokens int, logscore_micros long) for one document. */
  def scoreText(text: UTF8String): InternalRow = {
    val ts = tokenize(text)
    var micros = 0L
    var i = 0
    while (i < ts.length) {
      var k = math.min(n, i + 1)
      var backoffs = 0
      var num = -1L
      var den = -1L
      while (num < 0 && k >= 2) {
        val cg = count(join(ts, i - k + 1, i))
        val cc = count(join(ts, i - k + 1, i - 1))
        if (cg > 0 && cc > 0) { num = cg; den = cc }
        else { backoffs += 1; k -= 1 }
      }
      if (num < 0) {
        val c1 = count(ts(i))
        num = if (c1 > 0) c1 else 1L
        den = total
      }
      micros += lnMicros(num) - lnMicros(den) + backoffs * penaltyMicros
      i += 1
    }
    val row = new GenericInternalRow(2)
    row.setInt(0, ts.length)
    row.setLong(1, micros)
    row
  }
}
