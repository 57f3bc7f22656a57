package graft

/** The SQL spelling of [[graft.functions.Kernels.lnFixMicros]] — the
  * pure-integer fixed-point natural log (micros) both engines compute
  * from scratch: bit-length via `bin()`, Q30 normalization, 20
  * repeated-squaring log₂ bits, one multiply-shift to ln-micros. Every
  * step is 64-bit integer multiply/shift/compare, so the oracle is
  * SELF-CONTAINED and STATE-FREE — no deposited model table, no libm on
  * either side, no dump lane that depends on what ran earlier in the JVM
  * (the r11/r12 q167/q169 hash-red class, and the same latent class in
  * every idf/NLL/entropy oracle that called DuckDB's own `ln`).
  */
private[graft] object OracleLnFix {

  /** CTE block computing `<out>(v, m)` — ln-micros `m` for every BIGINT
    * `v` produced by the (caller-defined) CTE `<src>(v)`; values must be
    * ≥ 1. The enclosing query MUST open with `WITH RECURSIVE`. `out`
    * namespaces the internal CTEs so several instances can coexist. */
  def ctes(src: String, out: String = "lnm"): String = s"""
      ${out}_e AS (SELECT v, CAST(length(bin(v)) - 1 AS BIGINT) AS e FROM $src),
      ${out}_it AS (
        SELECT v, e, 0 AS i,
               CASE WHEN e <= 30 THEN v << CAST(30 - e AS INTEGER)
                    ELSE (v >> CAST(e - 30 AS INTEGER))
                         + ((v >> CAST(e - 31 AS INTEGER)) & 1) END AS x,
               CAST(0 AS BIGINT) AS f
        FROM ${out}_e
        UNION ALL
        SELECT v, e, i + 1,
               CASE WHEN ((x * x) >> 30) >= CAST(2147483648 AS BIGINT)
                    THEN ((x * x) >> 30) >> 1 ELSE (x * x) >> 30 END,
               f * 2 + CASE WHEN ((x * x) >> 30) >= CAST(2147483648 AS BIGINT)
                            THEN 1 ELSE 0 END
        FROM ${out}_it WHERE i < 20),
      $out AS (SELECT v, (((e * 1048576 + f)
                           * CAST(${graft.functions.Kernels.Ln2MicrosQ12} AS BIGINT))
                          + CAST(2147483648 AS BIGINT)) >> 32 AS m
               FROM ${out}_it WHERE i = 20)"""

  /** Scalar (correlated-subquery) ln-micros of a BIGINT SQL expression —
    * for lanes whose log arguments are per-row values rather than a
    * small distinct set: `(SELECT m FROM <out> WHERE v = <expr>)`.
    * Callers are responsible for `<out>` covering every value `<expr>`
    * can take. */
  def lookup(expr: String, out: String = "lnm"): String =
    s"(SELECT m FROM $out WHERE v = ($expr))"
}
