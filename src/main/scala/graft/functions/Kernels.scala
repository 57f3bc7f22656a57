package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight JVM kernels behind the native Catalyst expressions in
  * [[KernelExprs]]. Semantics are bit-identical to the column-composition
  * versions they replace (md5-prefix [[Functions.hash60]] hashing, quantized
  * integer dot products, floor-based q-rounding), so the ANSI-SQL oracles are
  * unchanged — only the evaluation strategy differs: one small JIT-friendly
  * method instead of a many-hundred-node interpreted expression tree.
  *
  * All methods are static forwarders (callable from generated Java code as
  * `graft.functions.Kernels.<name>(...)`).
  */
object Kernels {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit non-negative long = first 15 hex chars of md5(bytes), i.e.
    * bytes 0-6 (56 bits) followed by the high nibble of byte 7. */
  private def hash60Bytes(d: MessageDigest): Long = {
    val b = d.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xf0L) >>> 4)
  }

  /** Unicode NFC normalization (java.text.Normalizer — the same
    * canonical composition DuckDB's `nfc_normalize` applies), the first
    * step of text cleanup: visually-identical strings with different
    * code-point sequences (e + COMBINING ACUTE vs precomposed é) become
    * byte-identical, so dedup/fingerprint/equality see one form. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** `conv(substring(md5(s), 1, 15), 16, 10)` as a 60-bit long. */
  def hash60(s: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    d.update(s.getBytes)
    hash60Bytes(d)
  }

  /** MinHash signature: element j = min over shingles of hash60(sh + "#" + j);
    * empty shingle set → all zeros. */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val out = new Array[Long](numHashes)
    if (n == 0) return new GenericArrayData(out)
    java.util.Arrays.fill(out, Long.MaxValue)
    val suffixes = new Array[Array[Byte]](numHashes)
    var j = 0
    while (j < numHashes) {
      suffixes(j) = ("#" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      j += 1
    }
    val d = md5Local.get()
    var i = 0
    while (i < n) {
      val shBytes = shingles.getUTF8String(i).getBytes
      j = 0
      while (j < numHashes) {
        d.reset()
        d.update(shBytes)
        d.update(suffixes(j))
        val h = hash60Bytes(d)
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash from an array of token hashes: bit i set iff the sum of
    * ±1 votes (sign = bit i of each hash) is positive. */
  def simhash60(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Exact integer dot product of two long-array columns. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Exact integer SQUARED Euclidean distance of two long-array columns
    * (quantized vectors): Σ(aᵢ−bᵢ)² — EXACT, so rank order and the SQL
    * oracle agree bit-for-bit with no rounding step at all (sqrt is
    * monotone: top-k by l2² IS top-k by l2). Length mismatch truncates
    * to the shorter, like [[dotLong]]. */
  def l2sqLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** [[dotLong]] over plain JVM arrays (driver/UDF-side helper). */
  def dotArrays(a: Array[Long], b: Array[Long]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** [[l2sqLong]] over plain JVM arrays (driver/UDF-side helper). */
  def l2sqArrays(a: Array[Long], b: Array[Long]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a(i) - b(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Best snippet window (Lucene Highlighter's core selection, made
    * deterministic): over all `w`-token windows of `ts`, pick the one
    * maximizing (distinct query terms present, then total term hits),
    * ties to the SMALLEST start. Sliding-window counts — O(n·|terms|)
    * membership tests + O(1) per slide, so long documents stay linear.
    * Returns `[start, distinct_hits, total_hits]` (start 0-based; a doc
    * shorter than `w` is its own window). */
  def bestWindow(ts: ArrayData, terms: ArrayData, w: Int): ArrayData = {
    val n = ts.numElements(); val m = terms.numElements()
    // term index per position (-1 = not a query term); O(n·m), m tiny
    val tidx = new Array[Int](n)
    var i = 0
    while (i < n) {
      tidx(i) = -1
      val tok = ts.getUTF8String(i)
      var j = 0
      while (j < m && tidx(i) < 0) {
        if (tok.equals(terms.getUTF8String(j))) tidx(i) = j
        j += 1
      }
      i += 1
    }
    val win = math.min(w, math.max(n, 1))
    val cnt = new Array[Int](math.max(m, 1))
    var distinct = 0; var total = 0
    def add(p: Int): Unit = if (tidx(p) >= 0) {
      if (cnt(tidx(p)) == 0) distinct += 1
      cnt(tidx(p)) += 1; total += 1
    }
    def drop(p: Int): Unit = if (tidx(p) >= 0) {
      cnt(tidx(p)) -= 1
      if (cnt(tidx(p)) == 0) distinct -= 1
      total -= 1
    }
    i = 0
    while (i < math.min(win, n)) { add(i); i += 1 }
    var bestS = 0; var bestD = distinct; var bestT = total
    var s = 1
    while (s + win <= n) {
      drop(s - 1); add(s + win - 1)
      if (distinct > bestD || (distinct == bestD && total > bestT)) {
        bestS = s; bestD = distinct; bestT = total
      }
      s += 1
    }
    new GenericArrayData(Array(bestS.toLong, bestD.toLong, bestT.toLong))
  }

  /** SQ8 scalar-quantization encode (FAISS `IndexScalarQuantizer`
    * QT_8bit): per-dimension codes 0..255 for a quantized integer vector
    * against trained per-dim `[mn, mx]` bounds. Integer-exact
    * round-half-up — `code = floor(255·(vc−mn)/(mx−mn) + ½)` spelled as
    * `(2·255·(vc−mn) + (mx−mn)) / (2·(mx−mn))`; `vc` clamps v into
    * `[mn, mx]` FIRST so every operand is non-negative and JVM
    * truncation ≡ floor ≡ the oracle's `//`. A degenerate dimension
    * (mx == mn) codes to 0. */
  def sq8Encode(v: ArrayData, mn: ArrayData, mx: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val lo = mn.getLong(i); val hi = mx.getLong(i); val x = v.getLong(i)
      val vc = if (x < lo) lo else if (x > hi) hi else x
      if (hi != lo)
        out(i) =
          ((2L * 255L * (vc - lo) + (hi - lo)) / (2L * (hi - lo))).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SQ8 reconstruction: `recon = mn + round(code·(mx−mn)/255)`, the
    * integer spelling `mn + (2·code·(mx−mn) + 255) / 510` — exact and
    * engine-independent (all operands non-negative). */
  def sq8Recon(codes: ArrayData, mn: ArrayData, mx: ArrayData): ArrayData = {
    val n = codes.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val lo = mn.getLong(i); val hi = mx.getLong(i)
      out(i) =
        if (hi == lo) lo
        else lo + (2L * codes.getInt(i) * (hi - lo) + 255L) / 510L
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `round(ln(2)·10⁶·2¹²)` — converts a Q20 fixed-point log₂ to
    * ln-micros with one 64-bit multiply-shift (see [[lnFixMicros]]). */
  val Ln2MicrosQ12: Long = 2839130852L

  /** PURE-INTEGER fixed-point natural log in micros — zero libm:
    *
    *   e    = bitLength(v) − 1                       (integer part of log₂)
    *   x    = v normalized to Q30 in [2³⁰, 2³¹)      (round-half-up if v
    *                                                  has more than 31 bits)
    *   f    = 20 fractional log₂ bits by REPEATED SQUARING: each step
    *          squares x (Q30·Q30 ≫ 30 stays < 2⁶²) and emits 1 iff the
    *          square crossed 2 (then renormalizes) — the classic
    *          shift-and-square binary-logarithm recurrence
    *   out  = ((e·2²⁰ + f) · round(ln2·10⁶·2¹²) + 2³¹) ≫ 32
    *
    * Every step is 64-bit integer multiply/shift/compare, so ANY engine
    * replays it bit-for-bit from the definition alone — the SQL oracle
    * computes the same recurrence as a recursive CTE instead of joining a
    * model-deposited literal table (the r11/r12 q167/q169 hash-red class:
    * a DuckDB-`ln` fallback lane that fired whenever the dump ran without
    * the trained model in the same JVM). Accuracy vs true ln·10⁶ is ±1
    * micro over the full long range — irrelevant to correctness, which
    * only needs both engines to agree exactly. */
  def lnFixMicros(v: Long): Long = {
    require(v >= 1, s"lnFixMicros needs v >= 1 (got $v)")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    // round-half-up without the additive carry: (v + 2^(s-1)) >> s equals
    // (v >> s) + bit_{s-1}(v) exactly, and the latter cannot overflow —
    // the naive form raises on DuckDB's checked arithmetic (and wraps on
    // the JVM) for v within 2^(e-31) of Long.MaxValue, so the kernel and
    // its CTE replay ([[graft.OracleLnFix]]) both use the carry-free form
    // to stay total AND identical over the full positive long range
    var x = if (e <= 30) v << (30 - e)
            else (v >> (e - 30)) + ((v >> (e - 31)) & 1L)
    var f = 0L
    var i = 0
    while (i < 20) {
      x = (x * x) >> 30
      if (x >= (1L << 31)) { x >>= 1; f = f * 2 + 1 } else f = f * 2
      i += 1
    }
    (((e.toLong << 20) + f) * Ln2MicrosQ12 + (1L << 31)) >> 32
  }

  /** Engine-agnostic rounding: floor(x*10^d + 0.5)/10^d ([[Functions.qround]]). */
  def qround(x: Double, decimals: Int): Double = {
    val s = math.pow(10, decimals)
    math.floor(x * s + 0.5) / s
  }

  /** Quantized cosine rounded to 6 places; 0.0 on zero norm
    * ([[Functions.vec_cosine_q6]]). */
  def cosineQ6(a: ArrayData, b: ArrayData): Double = {
    val norm = math.sqrt(dotLong(a, a).toDouble * dotLong(b, b).toDouble)
    if (norm > 0) qround(dotLong(a, b).toDouble / norm, 6) else 0.0
  }

  /** [[cosineQ6]] over plain JVM arrays (driver/UDF-side helper). */
  def cosineQ6Arrays(a: Array[Long], b: Array[Long]): Double = {
    def dot(x: Array[Long], y: Array[Long]): Long = {
      val n = math.min(x.length, y.length)
      var acc = 0L; var i = 0
      while (i < n) { acc += x(i) * y(i); i += 1 }
      acc
    }
    val norm = math.sqrt(dot(a, a).toDouble * dot(b, b).toDouble)
    if (norm > 0) qround(dot(a, b).toDouble / norm, 6) else 0.0
  }

  // --- SRP-LSH plane components: constant per (plane, dim), cached ----------

  @volatile private var planeCache: Array[Array[Long]] = Array.empty

  /** hash60("plane_<p>_<d>") % 1000 - 500, memoized (it is row-independent). */
  private def planeComponents(p: Int, dims: Int): Array[Long] = {
    var cache = planeCache
    if (p < cache.length && cache(p).length >= dims) return cache(p)
    synchronized {
      cache = planeCache
      val grown =
        if (p < cache.length) cache.clone()
        else java.util.Arrays.copyOf(cache, p + 1)
      val old = if (grown(p) == null) new Array[Long](0) else grown(p)
      if (old.length < dims) {
        val comp = java.util.Arrays.copyOf(old, dims)
        var d = old.length
        while (d < dims) {
          comp(d) = hash60(UTF8String.fromString(s"plane_${p}_$d")) % 1000L - 500L
          d += 1
        }
        grown(p) = comp
      }
      planeCache = grown
      grown(p)
    }
  }

  /** Z-order (Morton) interleave of the low `bits` bits of two non-negative
    * coordinates: a's bit i lands at position 2i, b's at 2i+1. Locality-
    * preserving in BOTH dimensions, so range-partitioning a table by this
    * value gives every output file a tight min/max envelope on BOTH
    * columns — the multi-column pruning a single-column sort cannot give. */
  def zorder2(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Hilbert-curve index of `(a, b)` on the `2^bits × 2^bits` grid — the
    * classic iterative xy→d conversion (Hamilton's rotate-and-reflect;
    * the public-domain formulation from Warren's Hacker's Delight /
    * Wikipedia). Unlike the Morton interleave, consecutive indices are
    * always GRID NEIGHBORS (the curve never jumps), so a contiguous index
    * range covers a more compact region: files cut from sorted Hilbert
    * ranges carry tighter per-dimension envelopes at box-query corners
    * where z-order's quadrant seams inflate them (measured in
    * HilbertLayoutSpec). Inputs clamp to the low `bits` bits, exactly as
    * [[zorder2]]. */
  def hilbert2(a: Long, b: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var x = a & mask
    var y = b & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orients consistently
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Three-way Morton interleave: a's bit i lands at 3i, b's at 3i+1, c's
    * at 3i+2 — the time × tenant × key clustering a multi-dimension lake
    * wants. bits ≤ 20 keeps the interleave inside a positive long. */
  def zorder3(a: Long, b: Long, c: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (3 * i)
      z |= ((b >>> i) & 1L) << (3 * i + 1)
      z |= ((c >>> i) & 1L) << (3 * i + 2)
      i += 1
    }
    z
  }

  /** Bloom position j of `key`: hash60(key || "#" || j) mod numBits — the
    * same seeded-suffix family as the MinHash/CMS sketches, so a SQL oracle
    * reproduces every set bit. */
  def bloomPos(d: MessageDigest, keyBytes: Array[Byte], j: Int, numBits: Int): Int = {
    d.reset()
    d.update(keyBytes)
    d.update(("#" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (hash60Bytes(d) % numBits).toInt
  }

  /** Set `key`'s `numHashes` bit positions in the word array (64 bits/word,
    * bit i of word w = position 64*w + i). */
  def bloomUpdate(bits: Array[Long], key: UTF8String, numHashes: Int): Unit = {
    val numBits = bits.length * 64
    val keyBytes = key.getBytes
    val d = md5Local.get()
    var j = 0
    while (j < numHashes) {
      val pos = bloomPos(d, keyBytes, j, numBits)
      bits(pos >>> 6) |= (1L << (pos & 63))
      j += 1
    }
  }

  /** Probe: true iff ALL `numHashes` positions of `key` are set — no false
    * negatives, false positives at the sketch's design rate. */
  def bloomContains(bloom: ArrayData, key: UTF8String, numHashes: Int): Boolean = {
    val numBits = bloom.numElements() * 64
    val keyBytes = key.getBytes
    val d = md5Local.get()
    var j = 0
    while (j < numHashes) {
      val pos = bloomPos(d, keyBytes, j, numBits)
      if ((bloom.getLong(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      j += 1
    }
    true
  }

  /** DECIMAL-DIGIT histogram bucket of a non-negative long: the value
    * with all but its first `digits` significant (decimal) digits zeroed
    * — a DDSketch-flavored log-scale bucket lower bound, but on an EXACT
    * integer grid (no libm, no float rounding), so Spark and any SQL
    * engine (string prefix + zero-pad) agree bit-for-bit. Relative
    * bucket width ≤ 10^(1-digits) (digits=2 → ≤10%); values below
    * 10^digits are their own bucket (exact head). Order-independent,
    * mergeable by count-sum — the properties that make the sketch safe
    * to re-aggregate across groups and streaming batches. */
  def digitBucket(v: Long, digits: Int): Long = {
    require(v >= 0, s"digitBucket: negative value $v (counts/cents only)")
    var p = 1L
    // p = 10^(nd - digits) where nd = decimal digit count of v
    var threshold = 1L
    var d = 0
    while (d < digits) { threshold *= 10; d += 1 } // 10^digits
    var scaled = v
    while (scaled >= threshold) { scaled /= 10; p *= 10 }
    (v / p) * p
  }

  /** Quantile from a SORTED (by lb) digit-histogram array of
    * struct<lb:long, n:long>: the lower bound of the bucket holding the
    * `max(1, ceil(q·N))`-th value (the conservative rank rule every SQL
    * cume-walk reproduces exactly — 0.95·N is the same IEEE product on
    * every engine). Null on an empty histogram. */
  def digitQuantile(hist: ArrayData, q: Double): Any = {
    val m = hist.numElements()
    if (m == 0) return null
    var total = 0L
    var i = 0
    while (i < m) { total += hist.getStruct(i, 2).getLong(1); i += 1 }
    if (total == 0L) return null
    // rank via EXACT integer arithmetic on q's micros, not double
    // ceil(q·total): 0.33·total in IEEE sits ABOVE the rational value, so
    // at totals divisible by 100 the double ceil lands one rank high —
    // while the SQL oracle's `0.33 * tot` is DECIMAL-exact in DuckDB.
    // ceil(qMicros·total / 10⁶) equals the decimal semantics for every
    // q expressible in 6 decimals, on any engine version.
    val qMicros = math.round(q * 1000000.0)
    // overflow-free split of ceil(qMicros·total / 10⁶) (ADVICE r14: the
    // direct product wraps past total ≈ 9.2e12 and silently returns the
    // minimum bucket while the DuckDB twin raises on checked overflow):
    // total = a·10⁶ + b ⇒ rank = qMicros·a + ceil(qMicros·b / 10⁶).
    // Both terms stay in range for every qMicros ≤ 10⁶ and any long
    // total: qMicros·b < 10¹², qMicros·a ≤ 10⁶·(Long.Max/10⁶) < Long.Max.
    val rank = math.max(1L,
      qMicros * (total / 1000000L) +
        (qMicros * (total % 1000000L) + 999999L) / 1000000L)
    var cum = 0L
    i = 0
    while (i < m) {
      val row = hist.getStruct(i, 2)
      cum += row.getLong(1)
      if (cum >= rank) return row.getLong(0)
      i += 1
    }
    hist.getStruct(m - 1, 2).getLong(0)
  }

  /** Sign-random-projection bucket id (0 .. 2^planes-1) of a quantized
    * vector: bit p = sign of the exact integer projection onto plane p. */
  def srpBucket(qv: ArrayData, planes: Int): Long = {
    val n = qv.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val comp = planeComponents(p, n)
      var dot = 0L
      var d = 0
      while (d < n) { dot += qv.getLong(d) * comp(d); d += 1 }
      if (dot > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}
