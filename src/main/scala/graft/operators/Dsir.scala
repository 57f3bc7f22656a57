package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.{Functions => F, TextFunctions => TF}

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

  /** Add-one-smoothed per-bucket log-ratio micros:
    * `floor(ln(((ct+1)/(Tt+B)) / ((cr+1)/(Tr+B))) · 10⁶ + 0.5)` — the
    * EXACT association order the oracle spells. */
  private[graft] def logRatioMicros(target: Array[Long],
                                        raw: Array[Long]): Array[Long] = {
    val b = target.length
    val tt = target.sum.toDouble + b
    val tr = raw.sum.toDouble + b
    Array.tabulate(b) { i =>
      val pt = (target(i) + 1).toDouble / tt
      val pr = (raw(i) + 1).toDouble / tr
      math.floor(math.log(pt / pr) * 1e6 + 0.5).toLong
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

  /** Gumbel key for one scored row: `weight_micros +
    * floor(g·10⁶ + 0.5)` where `g = −ln(−ln(u))` and
    * `u = (hash60(seed ':' doc_id) + 1) / 2⁶⁰ ∈ (0, 1]` — a seeded,
    * engine-independent uniform (the Gumbel-max trick: top-k by
    * `log w + Gumbel` IS a weight-proportional sample without
    * replacement, Vieira 2014). */
  private def gumbelKey(seed: Long): Column = {
    val u = (F.hash60(concat_ws(":", lit(seed), col("doc_id")))
      .cast("double") + lit(1.0)) / lit(1152921504606846976.0 /* 2^60 */)
    col("weight_micros") +
      floor(-log(-log(u)) * lit(1e6) + lit(0.5)).cast("long")
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
