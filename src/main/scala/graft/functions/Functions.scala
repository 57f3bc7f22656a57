package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-composition function library.
  *
  * Everything here is built from `org.apache.spark.sql.functions` so the whole
  * expression tree stays inside Catalyst whole-stage codegen (no UDF / no
  * serialization wall). Semantics derive from the reference engine's scalar
  * helpers (see /root/reference — Utils.scala:82-99 ipToLong, DNSUtils.scala:39
  * longToIp, Utils.scala:62-77 domain→authority, DNSUtils.scala:56-67 MD5) but
  * are re-expressed as declarative Spark column expressions.
  */
object Functions {

  // --------------------------------------------------------------------------
  // Portable hashing (identical result computable in ANSI SQL / DuckDB):
  // first 15 hex chars of md5 → 60-bit non-negative long.
  // Used by dedup / LSH operators so the correctness oracle can reproduce it.
  // --------------------------------------------------------------------------

  /** 60-bit stable content hash of a string column (md5-prefix based):
    * `conv(substring(md5(c),1,15),16,10)`, evaluated by the native
    * [[KernelExprs.Hash60]] expression (same value, one codegen'd call). */
  def hash60(c: Column): Column = KernelExprs.hash60(c)

  /** Let-binding for column expressions: evaluates `value` ONCE, binds it to
    * a lambda variable, and hands that variable to `body`. Without this, an
    * expression referenced inside a higher-order-function lambda is re-
    * evaluated on every lambda invocation (Catalyst does no common-
    * subexpression elimination across lambda boundaries, and higher-order
    * functions are interpreted, not codegen'd) — e.g. tokenizing a document
    * once per shingle index instead of once per row, an O(n²) blow-up. */
  def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** Engine-agnostic rounding to `decimals` places: `floor(x*s + 0.5)/s`.
    * Spark's `round` (HALF_UP via BigDecimal) and DuckDB's (half away from
    * zero) can disagree; this exact IEEE formula is identical everywhere. */
  def qround(c: Column, decimals: Int): Column = {
    val s = math.pow(10, decimals)
    floor(c * s + 0.5).cast("double") / s
  }

  /** Seeded variant: independent hash family member `seed`. */
  def hash60(c: Column, seed: Int): Column =
    hash60(concat(c, lit("#" + seed)))

  /** Exact sampling threshold: ⌊2^60·permille/1000⌋. Multiply-then-divide in
    * BigInt — the truncate-then-multiply form loses up to 976 keys per
    * permille bucket and excludes keys even at permille=1000. */
  def sampleThreshold(permille: Int): Long =
    ((BigInt(1) << 60) * permille / 1000).toLong

  /** Deterministic hash sampling: true for ~`permille`/1000 of keys, the
    * SAME keys on every run, engine, and cluster size — the reproducible
    * train/eval-split and subsampling primitive a pipeline needs instead of
    * `rand()` (which breaks retries, backfills and oracle comparison). The
    * threshold is an exact integer ([[sampleThreshold]]), so any engine
    * computing hash60 draws the identical subset; permille=1000 is
    * literally all keys. */
  def sample_hash(key: Column, permille: Int, seed: Int = 0): Column = {
    require(permille >= 0 && permille <= 1000, "permille in [0, 1000]")
    if (permille == 1000) lit(true)
    else hash60(key, seed) < lit(sampleThreshold(permille))
  }

  /** Stratified deterministic sampling: a per-stratum permille rate over the
    * [[sample_hash]] hash order — THE curriculum/rebalancing primitive of a
    * training-data pipeline (downsample boilerplate strata, keep rare ones
    * whole) with [[sample_hash]]'s replay guarantees. One hash + one chained
    * threshold per row: no join, no shuffle, the stratum column never needs
    * to leave the row. `sampleThreshold(1000)` = 2^60 exceeds every 60-bit
    * hash, so a 1000-permille stratum passes whole with no special case. */
  def stratified_sample(key: Column, strata: Column, rates: Map[String, Int],
                        defaultPermille: Int, seed: Int = 0): Column = {
    require((rates.values ++ Seq(defaultPermille)).forall(p => p >= 0 && p <= 1000),
      "permille in [0, 1000]")
    val thr = rates.foldLeft(lit(sampleThreshold(defaultPermille))) {
      case (acc, (s, p)) => when(strata === s, lit(sampleThreshold(p))).otherwise(acc)
    }
    hash60(key, seed) < thr
  }

  // --------------------------------------------------------------------------
  // IPv4 helpers (reference: Utils.scala:82-99, IpUtil.java:304-313).
  // Malformed input → 0L, matching the reference's exception-to-default.
  // --------------------------------------------------------------------------

  /** Dotted-quad IPv4 string → unsigned 32-bit value in a long; 0 if malformed. */
  def ip_to_long(ip: Column): Column = {
    val p = split(ip, "\\.")
    def oct(i: Int): Column = p.getItem(i).cast("long")
    val valid = ip.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$") &&
      oct(0) <= 255 && oct(1) <= 255 && oct(2) <= 255 && oct(3) <= 255
    when(valid,
      shiftleft(oct(0), 24) + shiftleft(oct(1), 16) + shiftleft(oct(2), 8) + oct(3)
    ).otherwise(lit(0L))
  }

  /** Inverse of [[ip_to_long]]. */
  def long_to_ip(n: Column): Column = concat_ws(".",
    shiftright(n, 24).bitwiseAND(lit(255L)),
    shiftright(n, 16).bitwiseAND(lit(255L)),
    shiftright(n, 8).bitwiseAND(lit(255L)),
    n.bitwiseAND(lit(255L)))

  /** True iff `ip` falls inside dotted-quad `cidr` (e.g. "10.1.0.0/16").
    * Reference: IpUtil.java:13-64 isInRange. */
  def ip_in_cidr(ip: Column, cidr: Column): Column = {
    val base = ip_to_long(split(cidr, "/").getItem(0))
    val bits = split(cidr, "/").getItem(1).cast("int")
    // mask = 2^32 - 2^(32-bits); pow-of-two doubles are exact below 2^53
    val mask = when(bits === 0, lit(0L))
      .otherwise(lit(4294967296L) - pow(lit(2.0), lit(32) - bits).cast("long"))
    ip_to_long(ip).bitwiseAND(mask) === base.bitwiseAND(mask)
  }

  // --------------------------------------------------------------------------
  // Domain helpers (reference: Utils.scala:62-77, Constant.scala:10-18,
  // DnsRptCH.scala:217-219).
  // --------------------------------------------------------------------------

  /** Registrable-domain ("authority domain") suffixes, longest-match-first.
    * Re-derived public-suffix-style list covering the reference's intent:
    * second-level country registries before gTLD/ccTLDs. */
  private val authoritySuffixes: Seq[String] = Seq(
    // second-level registries (must precede their parent TLDs)
    "com\\.cn", "net\\.cn", "org\\.cn", "gov\\.cn", "edu\\.cn", "ac\\.cn",
    "co\\.uk", "org\\.uk", "com\\.hk", "com\\.tw", "co\\.jp", "com\\.au",
    // generic + common country TLDs
    "com", "net", "org", "gov", "edu", "int", "mil", "arpa",
    "info", "biz", "name", "mobi", "pro", "coop", "aero", "museum",
    "cn", "hk", "tw", "jp", "kr", "us", "uk", "de", "fr", "ru", "io",
    "cc", "tv", "me", "co", "ai", "app", "dev", "xyz", "top", "vip",
    "cloud", "site", "online", "shop", "club", "fun", "ltd", "live")

  /** Regex matching `label.suffix` at end-of-string. */
  val authorityDomainRegex: String =
    "([a-zA-Z0-9-]+\\.(?:" + authoritySuffixes.mkString("|") + "))$"

  /** Extract the registrable domain: the last `label.knownSuffix` in the
    * string; the input itself when nothing matches (reference fallback,
    * Utils.scala:74-76). End-anchored, so "last match" and "first match"
    * coincide for well-formed hostnames. */
  def authority_domain(domain: Column): Column = {
    val m = regexp_extract(domain, authorityDomainRegex, 1)
    when(length(m) > 0, m).otherwise(domain)
  }

  /** Strip a leading http:// or https:// (reference: DnsRptCH.scala:217-219). */
  def strip_protocol(url: Column): Column =
    regexp_replace(url, "^https?://", "")

  // --------------------------------------------------------------------------
  // Time bucketing (reference: DNSUtils.scala:14-37 getTaskTime).
  // --------------------------------------------------------------------------

  /** Epoch-second floor to a `seconds`-sized bucket (reference 5-min grain). */
  def time_bucket(ts: Column, seconds: Int): Column =
    floor(unix_timestamp(ts) / seconds).cast("long")

  // --------------------------------------------------------------------------
  // Vector math over ArrayType(Float/Double) columns — codegen'd higher-order
  // functions, no UDFs. Used by the similarity-search operators.
  // --------------------------------------------------------------------------

  /** Element-wise dot product of two numeric array columns (double). */
  def vec_dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def vec_cosine(a: Column, b: Column): Column = {
    val d = vec_dot(a, b)
    val n = vec_norm(a) * vec_norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Quantize a float vector to longs (`floor(x*scale + 0.5)`) — makes
    * downstream dot products exact integers, so results are bit-reproducible
    * across engines (the DuckDB oracle computes the identical value). */
  def vec_quantize(a: Column, scale: Int): Column =
    transform(a, x => floor(x.cast("double") * scale + 0.5).cast("long"))

  /** Exact integer dot product of two quantized (long) vectors
    * (native [[KernelExprs.DotLong]]). */
  def vec_dot_long(a: Column, b: Column): Column = KernelExprs.dot_long(a, b)

  /** Deterministic cosine over quantized vectors: exact integer dot and
    * norms, one final IEEE-defined double division. */
  def vec_cosine_quantized(a: Column, b: Column): Column = {
    val d = vec_dot_long(a, b).cast("double")
    val n = sqrt(vec_dot_long(a, a).cast("double") * vec_dot_long(b, b).cast("double"))
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Quantized cosine rounded to 6 places with [[qround]] — the exact value
    * the similarity/dedup operators emit and oracles reproduce. Native
    * [[KernelExprs.CosineQ6]]: one codegen'd call per pair instead of three
    * interpreted array-aggregate trees. */
  def vec_cosine_q6(a: Column, b: Column): Column = KernelExprs.cosine_q6(a, b)

  /** EXACT integer squared Euclidean distance of two quantized (long)
    * vectors (native [[KernelExprs.L2sqLong]]) — the second standard ANN
    * metric next to cosine (pgvector `<->`, FAISS METRIC_L2). Squared
    * form on purpose: sqrt is monotone, so top-k by l2² is top-k by l2,
    * and the integer value replays bit-for-bit with no rounding rule. */
  def vec_l2sq_long(a: Column, b: Column): Column = KernelExprs.l2sq_long(a, b)

  /** SQ8 scalar quantization ([[KernelExprs.Sq8Encode]]/[[KernelExprs
    * .Sq8Recon]]): integer-exact encode to per-dim codes 0..255 against
    * per-dim `[mn, mx]` bounds, and the matching reconstruction. */
  def vec_sq8_encode(v: Column, mn: Column, mx: Column): Column =
    KernelExprs.sq8_encode(v, mn, mx)
  def vec_sq8_recon(codes: Column, mn: Column, mx: Column): Column =
    KernelExprs.sq8_recon(codes, mn, mx)
}
