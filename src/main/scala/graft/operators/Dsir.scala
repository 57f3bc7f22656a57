package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.{Kernels, KernelExprs, Functions => F, TextFunctions => TF}

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents that look like a target
  * domain by importance weights under hashed-n-gram bag-of-words models.
  *
  * The recipe: featurize every document as hashed word uni+bigrams into
  * `numBuckets` buckets; fit two multinomial bucket distributions (target
  * and raw, add-one smoothed); a document's log importance weight is
  * `Σ_features log(p_target(bucket)/p_raw(bucket))`; select by
  * Gumbel-top-k over those weights (importance RESAMPLING, not plain
  * top-k — the paper's estimator needs the sampled, not the argmax, set;
  * a seeded hash-derived Gumbel makes the draw reproducible).
  *
  * Determinism: per-bucket log-ratios are integer MICROS
  * (`floor(ln(ratio)·10⁶ + 0.5)`, the repo-wide exact-replay contract), a
  * document's weight is an integer sum (order-free), and the Gumbel
  * perturbation derives from the 60-bit md5-prefix hash — every stage
  * replays bit-for-bit in the DuckDB oracle.
  *
  * Scale shape: two B-bounded aggregates (explode → groupBy(bucket) with
  * map-side combine — the exchange carries ≤ `numBuckets` rows per task),
  * then ONE zero-shuffle scoring projection: the 2·B-sized log-ratio
  * table ships as an array literal inside the plan (the BpeTable
  * pattern's cheap cousin — no join against a tiny side, no broadcast
  * machinery). Selection is TakeOrdered, never a global sort. */
object Dsir {

  /** Hashed uni+bigram feature buckets of a text column:
    * `hash60(token) mod B` for every token, `hash60(tokᵢ ⧺ ' ' ⧺ tokᵢ₊₁)
    * mod B` for every adjacent pair. */
  def featureBuckets(text: Column, numBuckets: Int): Column = {
    val b = lit(numBuckets.toLong)
    F.bind(TF.tokens(text)) { ts =>
      concat(
        transform(ts, t => pmod(F.hash60(t), b)),
        F.bind(size(ts)) { n =>
          when(n >= 2,
            transform(sequence(lit(0), n - 2),
              i => pmod(F.hash60(
                concat_ws(" ", element_at(ts, i + 1),
                  element_at(ts, i + 2))), b)))
            .otherwise(array().cast("array<bigint>"))
        })
    }
  }

  /** Per-bucket feature counts of a corpus — dense `Array[Long]` of size
    * `numBuckets` (missing buckets are 0). One explode + one map-side-
    * combined aggregate; the result is B-bounded by construction. */
  def bucketCounts(docs: DataFrame, text: Column,
                   numBuckets: Int): Array[Long] = {
    val rows = docs
      .select(explode(featureBuckets(text, numBuckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).cast("long").as("cnt"))
      .collect()
    val out = Array.fill(numBuckets)(0L)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Add-one-smoothed per-bucket log-ratio micros via the PURE-INTEGER
    * fixed-point log ([[Kernels.lnFixMicros]]) — the ratio decomposes
    * into four integer-argument logs (no products, so no overflow at any
    * corpus size):
    * `lam = lnm(ct+1) − lnm(Tt+B) − lnm(cr+1) + lnm(Tr+B)`.
    * The oracle replays the identical recurrence as a recursive CTE —
    * no libm on either side (the r11/r12 hash-red class). */
  private[graft] def logRatioMicros(target: Array[Long],
                                        raw: Array[Long]): Array[Long] = {
    val b = target.length
    val tt = Kernels.lnFixMicros(target.sum + b)
    val tr = Kernels.lnFixMicros(raw.sum + b)
    Array.tabulate(b) { i =>
      Kernels.lnFixMicros(target(i) + 1) - tt -
        Kernels.lnFixMicros(raw(i) + 1) + tr
    }
  }

  /** Log importance weight per raw document:
    * `(doc_id, n_features, weight_micros)`. Two B-bounded count
    * aggregates, then one zero-shuffle projection — the log-ratio table
    * rides the plan as a literal array indexed by bucket. */
  def scores(raw: DataFrame, id: Column, text: Column,
             target: DataFrame, targetText: Column,
             numBuckets: Int = 256): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val lam = logRatioMicros(
      bucketCounts(target, targetText, numBuckets),
      bucketCounts(raw, text, numBuckets))
    val lamCol = typedLit(lam.toSeq)
    raw.select(id.cast("long").as("doc_id"),
        featureBuckets(text, numBuckets).as("fb"))
      .select(col("doc_id"),
        size(col("fb")).cast("long").as("n_features"),
        coalesce(
          aggregate(col("fb"), lit(0L),
            (acc, bkt) => acc + element_at(lamCol, bkt.cast("int") + 1)),
          lit(0L)).as("weight_micros"))
  }

  /** Gumbel key for one scored row, all-integer: with
    * `u = (hash60(seed ':' doc_id) + 1) / 2⁶⁰ ∈ (0, 1]` (a seeded,
    * engine-independent uniform), `g = −ln(−ln(u))` decomposes into
    * nested integer logs —
    * `inner = max(lnm(2⁶⁰) − lnm(h+1), 1)` (≈ −ln(u)·10⁶; the max(·,1)
    * guards the measure-zero u=1 draw) and
    * `key = weight + lnm(10⁶) − lnm(inner)` (≈ −ln(inner/10⁶)·10⁶).
    * The Gumbel-max trick: top-k by `log w + Gumbel` IS a
    * weight-proportional sample without replacement (Vieira 2014). */
  private def gumbelKey(seed: Long): Column = {
    val h1 = F.hash60(concat_ws(":", lit(seed), col("doc_id"))) + lit(1L)
    val inner = greatest(
      lit(Kernels.lnFixMicros(1152921504606846976L /* 2^60 */)) -
        KernelExprs.ln_fix_micros(h1),
      lit(1L))
    col("weight_micros") + lit(Kernels.lnFixMicros(1000000L)) -
      KernelExprs.ln_fix_micros(inner)
  }

  /** Importance-resample `k` documents: Gumbel-top-k over the importance
    * weights, seeded so the draw is reproducible. Output
    * `(doc_id, weight_micros, key_micros)` in selection order. */
  def select(raw: DataFrame, id: Column, text: Column,
             target: DataFrame, targetText: Column,
             k: Int, seed: Long, numBuckets: Int = 256): DataFrame =
    scores(raw, id, text, target, targetText, numBuckets)
      .select(col("doc_id"), col("weight_micros"),
        gumbelKey(seed).as("key_micros"))
      .orderBy(col("key_micros").desc, col("doc_id"))
      .limit(k)
}
