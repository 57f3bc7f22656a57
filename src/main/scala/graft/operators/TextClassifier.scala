package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Functions => F, TextFunctions => TF}

/** Trained TEXT CLASSIFICATION for corpus curation — the
  * fastText-style supervised filter (Joulin et al. 2016,
  * arXiv:1607.01759) used by LLaMA/CCNet-style pipelines to keep
  * "reference-like" documents, here as MULTINOMIAL NAIVE BAYES because
  * its training is CLOSED-FORM COUNTING: two map-side-combined
  * aggregations (class priors, per-class token counts), no SGD — so the
  * trained model and every score are bit-deterministic across runs,
  * partitionings, and cluster sizes, and the whole train+score pipeline
  * replays exactly in the DuckDB oracle (q163). An SGD/L-BFGS trainer's
  * float reduce order can produce a different model per run — useless
  * under this engine's determinism contract.
  *
  * Model: global top-`vocabSize` tokens ([[TF.tokens]]); add-one
  * smoothing — `P(t|c) = (cnt(c,t)+1) / (tot_c + V + 1)` with the same
  * `1/(tot_c+V+1)` floor for in-vocab-but-unseen-in-class AND
  * out-of-vocab tokens; priors `P(c) = n_c / N`. Every log-prob is an
  * INTEGER ln-micros difference of integer counts
  * ([[graft.functions.Kernels.lnFixMicros]] — the pure-integer
  * fixed-point log, no libm on either side), so per-document scores are
  * exact long sums — order-independent (the q108 recipe).
  *
  * Scale shape: the model is `vocabSize × C` rows and BROADCAST — the
  * token stream is never shuffled against it; per-document partial sums
  * combine map-side; the only full exchanges are the bounded vocab
  * top-K and the per-(doc, class) aggregation. The docs×classes frame
  * is C-fold the corpus (C = a handful of labels) — the standard
  * score-all-classes fan-out.
  */
object TextClassifier {

  /** Train on `(label, text)` and score every document against every
    * class (resubstitution when the same frame trains and scores —
    * split upstream for held-out evaluation). Output:
    * `(doc_id, pred, score, matches_label)` — winning class (ties break
    * to the smallest label), its quantized log-joint as double, and
    * whether the prediction recovers the training label. */
  def naiveBayes(docs: DataFrame, id: Column, text: Column, label: Column,
                 vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val base = docs.select(id.as("doc_id"), label.as("cls"),
      TF.tokens(text).as("toks"))
    val toks = base.select(col("doc_id"), col("cls"),
      explode(col("toks")).as("token"))

    val nDocs = base.agg(count(lit(1)).as("n_all")) // 1-row scalar
    val classCounts = base.groupBy(col("cls")).agg(count(lit(1)).as("n_docs"))
    val vocab = TopK.global(
      toks.groupBy(col("token")).agg(count(lit(1)).as("freq")),
      vocabSize, col("freq").desc, col("token").asc).select(col("token"))
    val vCount = vocab.agg(count(lit(1)).as("v")) // 1-row scalar

    val inVocab = toks.join(broadcast(vocab), Seq("token"))
    val tokCounts = inVocab.groupBy(col("cls"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val classTotals = inVocab.groupBy(col("cls"))
      .agg(count(lit(1)).as("tot"))

    def lnm(c: Column): Column =
      graft.functions.KernelExprs.ln_fix_micros(c.cast("long"))

    // (cls, token) → log P(t|c) in integer micros; vocabSize × C rows,
    // broadcast
    val model = tokCounts.join(classTotals, Seq("cls"))
      .crossJoin(broadcast(vCount))
      .select(col("cls"), col("token"),
        (lnm(col("cnt") + 1) - lnm(col("tot") + col("v") + 1)).as("logp"))
    // per class: prior + the shared unseen/OOV floor (micros)
    val classInfo = classCounts.join(classTotals, Seq("cls"), "left")
      .crossJoin(broadcast(vCount)).crossJoin(broadcast(nDocs))
      .select(col("cls"),
        (lnm(col("n_docs")) - lnm(col("n_all"))).as("prior_logp"),
        (-lnm(coalesce(col("tot"), lit(0L)) + col("v") + 1)).as("oov_logp"))

    // matched lane: one row per (doc token × class that has seen it)
    val matched = toks.select(col("doc_id"), col("token"))
      .join(broadcast(model), Seq("token"))
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("logp")).as("s_in"), count(lit(1)).as("n_in"))
    val nTok = base.select(col("doc_id"), col("cls").as("true_cls"),
      size(col("toks")).cast("long").as("n_tok"))

    val scores = nTok.crossJoin(broadcast(classInfo))
      .join(matched, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("true_cls"), col("cls"),
        (coalesce(col("s_in"), lit(0L)) +
          (col("n_tok") - coalesce(col("n_in"), lit(0L))) * col("oov_logp") +
          col("prior_logp")).as("score"))

    val best = scores.groupBy(col("doc_id"))
      .agg(max(col("score")).as("mx"))
    scores.join(best, Seq("doc_id"))
      .filter(col("score") === col("mx"))
      .groupBy(col("doc_id"))
      .agg(min(col("cls")).as("pred"),
        (max(col("score")).cast("double") / lit(1000000.0)).as("score"),
        (min(col("cls")) === min(col("true_cls"))).as("matches_label"))
  }
}
