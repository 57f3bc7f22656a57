package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{KernelExprs, UnigramTable}

/** UNIGRAM language-model tokenizer TRAINING (Kudo 2018,
  * arXiv:1804.10959 — SentencePiece's `--model_type=unigram`), shaped
  * like [[Bpe.train]] for a 100 TB corpus: the only corpus-proportional
  * work is ONE distributed word-unit frequency aggregation
  * (map-side-combined groupBy), and the EM/prune loop runs on the
  * COLLECTED unit-frequency table — vocabulary-sized by Heaps' law and
  * bounded by `maxWords` (top by frequency; the cut tail carries
  * negligible probability mass and cannot steer seeding or pruning).
  *
  * The SentencePiece recipe, driver-side and deterministic:
  *
  *  1. SEED: every substring (length ≤ `maxPieceLen`) of every unit,
  *     scored by frequency × length; all single characters are
  *     mandatory (they make every lattice completable — training never
  *     needs an <unk> fallback); the top `seedSize` multi-char
  *     candidates join them.
  *  2. EM: `emRounds` full expectation-maximization passes — the
  *     E-step runs exact forward-backward over each unit's segmentation
  *     lattice (frequency-weighted expected piece counts), the M-step
  *     renormalizes. Likelihood is non-decreasing per round (classic
  *     EM guarantee — UnigramSpec asserts it on the NLL history).
  *  3. PRUNE: drop the lowest-expected-count multi-char pieces
  *     (`shrink` of the table per round, never below the target), then
  *     re-run EM; repeat until `vocabSize - 1` pieces remain (slot 0 is
  *     <unk>). This is SentencePiece's shrink loop with expected count
  *     standing in for its exact loss-delta — the standard
  *     reimplementation trade (the two orders agree except near ties).
  *
  * All arithmetic is sequential driver IEEE binary64 over exact long
  * frequencies from the one distributed count, so the trained model is
  * BIT-IDENTICAL across runs, partitionings, and cluster sizes.
  * Encoding applies the trained table via the codegen'd
  * [[graft.functions.KernelExprs.UnigramEncode]] family — the table
  * serializes WITH the plan and the Viterbi loop runs inside
  * whole-stage codegen with a per-executor unit cache.
  */
object Unigram {

  /** A trained model: pieces in final rank order (expected count desc,
    * piece asc) with their log probabilities; `nllHistory` is the
    * corpus negative log-likelihood after each EM round (per unit
    * occurrence), kept for monotonicity checks and training forensics. */
  final case class UnigramModel(pieces: Vector[String],
                                logProbs: Vector[Double],
                                nllHistory: Vector[Double] = Vector.empty) {
    lazy val table: UnigramTable =
      new UnigramTable(pieces.toArray, logProbs.toArray)
    def vocabSize: Int = pieces.length + 1 // slot 0 = <unk>
  }

  /** Train a `vocabSize`-piece model from `docs`' `text` column. */
  def train(docs: DataFrame, text: Column, vocabSize: Int,
            maxWords: Int = 1 << 17, maxPieceLen: Int = 8,
            seedSize: Int = 1 << 13, emRounds: Int = 2,
            shrink: Double = 0.75): UnigramModel = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(shrink > 0 && shrink < 1, s"shrink must be in (0,1), got $shrink")
    // the distributed part: one combine-reduced unit count. split on
    // single spaces KEEPING empties (limit -1) so runs of spaces become
    // their own `▁` units — what makes decode byte-exact on any spacing
    val units = docs.select(
      explode(split(text, " ", -1)).as("w"))
      .select(concat(lit("▁"), col("w")).as("unit"))
    val unitCounts = TopK.global(
      units.groupBy(col("unit")).agg(count(lit(1)).as("freq")),
      maxWords, col("freq").desc, col("unit").asc)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val words = unitCounts.map(_._1)
    val freqs = unitCounts.map(_._2)

    // ---- seed --------------------------------------------------------
    val score = new java.util.HashMap[String, java.lang.Long]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi); val f = freqs(wi)
      var s = 0
      while (s < w.length) {
        var e = s + 1
        while (e <= math.min(w.length, s + maxPieceLen)) {
          val p = w.substring(s, e)
          val cur = score.get(p)
          score.put(p, if (cur == null) f else cur.longValue + f)
          e += 1
        }
        s += 1
      }
      wi += 1
    }
    import scala.jdk.CollectionConverters._
    val (chars, multi) = score.entrySet().asScala.toVector
      .map(kv => (kv.getKey, kv.getValue.longValue))
      .partition(_._1.length == 1)
    val seedMulti = multi
      .sortBy { case (p, c) => (-c * p.length, p) }
      .take(math.max(0, seedSize - chars.length))
    var pieces: Vector[String] = (chars ++ seedMulti).map(_._1)
    var logProbs: Vector[Double] = {
      val tot = (chars ++ seedMulti).map { case (p, c) =>
        c.toDouble * p.length }.sum
      (chars ++ seedMulti).map { case (p, c) =>
        math.log(c.toDouble * p.length / tot) }
    }

    // ---- EM + prune loop ----------------------------------------------
    val target = vocabSize - 1
    val nlls = Vector.newBuilder[Double]
    var done = false
    while (!done) {
      var r = 0
      while (r < emRounds) {
        val (counts, nll) = eStep(words, freqs, pieces, logProbs)
        val alive = pieces.indices.filter(i =>
          counts(i) > 0 || pieces(i).length == 1)
        val tot = alive.map(counts(_)).sum
        val floor = 1e-9 // mandatory chars with zero mass stay representable
        pieces = alive.map(pieces(_)).toVector
        logProbs = alive.map(i =>
          math.log(math.max(counts(i), floor) / tot)).toVector
        nlls += nll
        r += 1
      }
      if (pieces.length <= target) done = true
      else {
        // prune: chars are mandatory; multi-char pieces rank by expected
        // count (desc, piece asc); shed to shrink·current, never below
        // the target
        val (counts, _) = eStep(words, freqs, pieces, logProbs)
        val keepN = math.max(target, (pieces.length * shrink).toInt)
        val charIdx = pieces.indices.filter(pieces(_).length == 1)
        val multiIdx = pieces.indices.filter(pieces(_).length > 1)
          .sortBy(i => (-counts(i), pieces(i)))
          .take(math.max(0, keepN - charIdx.length))
        val keep = (charIdx ++ multiIdx).sorted
        pieces = keep.map(pieces(_)).toVector
        logProbs = keep.map(logProbs(_)).toVector
      }
    }
    // final rank order: expected count desc, piece asc — a stable,
    // data-derived id assignment
    val (finalCounts, _) = eStep(words, freqs, pieces, logProbs)
    val order = pieces.indices.sortBy(i => (-finalCounts(i), pieces(i)))
    UnigramModel(order.map(pieces(_)).toVector,
      order.map(logProbs(_)).toVector, nlls.result())
  }

  /** One exact E-step: frequency-weighted expected piece counts via
    * forward-backward over every unit's lattice, plus the corpus NLL
    * (per unit occurrence). Sequential driver arithmetic — bit-stable. */
  private def eStep(words: Array[String], freqs: Array[Long],
                    pieces: Vector[String], logProbs: Vector[Double])
      : (Array[Double], Double) = {
    val index = new java.util.HashMap[String, Integer](pieces.length * 2)
    pieces.indices.foreach(i => index.put(pieces(i), i))
    val maxLen = if (pieces.isEmpty) 1 else pieces.map(_.length).max
    val counts = new Array[Double](pieces.length)
    var nll = 0.0
    var totalFreq = 0L

    def logAdd(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))

    var wi = 0
    while (wi < words.length) {
      val w = words(wi); val f = freqs(wi); val L = w.length
      val alpha = new Array[Double](L + 1)
      val beta = new Array[Double](L + 1)
      java.util.Arrays.fill(alpha, Double.NegativeInfinity)
      java.util.Arrays.fill(beta, Double.NegativeInfinity)
      alpha(0) = 0.0; beta(L) = 0.0
      var e = 1
      while (e <= L) {
        var s = math.max(0, e - maxLen)
        while (s < e) {
          if (alpha(s) != Double.NegativeInfinity) {
            val id = index.get(w.substring(s, e))
            if (id != null)
              alpha(e) = logAdd(alpha(e), alpha(s) + logProbs(id.intValue))
          }
          s += 1
        }
        e += 1
      }
      var s2 = L - 1
      while (s2 >= 0) {
        var e2 = s2 + 1
        while (e2 <= math.min(L, s2 + maxLen)) {
          if (beta(e2) != Double.NegativeInfinity) {
            val id = index.get(w.substring(s2, e2))
            if (id != null)
              beta(s2) = logAdd(beta(s2), logProbs(id.intValue) + beta(e2))
          }
          e2 += 1
        }
        s2 -= 1
      }
      val z = alpha(L)
      if (z != Double.NegativeInfinity) {
        nll -= f * z
        totalFreq += f
        var s3 = 0
        while (s3 < L) {
          if (alpha(s3) != Double.NegativeInfinity) {
            var e3 = s3 + 1
            while (e3 <= math.min(L, s3 + maxLen)) {
              val id = index.get(w.substring(s3, e3))
              if (id != null && beta(e3) != Double.NegativeInfinity)
                counts(id.intValue) += f * math.exp(
                  alpha(s3) + logProbs(id.intValue) + beta(e3) - z)
              e3 += 1
            }
          }
          s3 += 1
        }
      }
      wi += 1
    }
    (counts, if (totalFreq == 0) 0.0 else nll / totalFreq)
  }

  /** Persist a trained model as a tiny parquet artifact
    * `(rank, piece, log_prob)` — engine-neutral, read back in rank
    * order (same contract as [[Bpe.save]]). */
  def save(model: UnigramModel, path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    model.pieces.zip(model.logProbs).zipWithIndex
      .map { case ((p, lp), r) => (r, p, lp) }
      .toDF("rank", "piece", "log_prob")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): UnigramModel = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("rank").cast("int"), col("piece"), col("log_prob"))
      .as[(Int, String, Double)].collect().sortBy(_._1)
    UnigramModel(rows.map(_._2).toVector, rows.map(_._3).toVector)
  }

  /** array<string> of unigram pieces for `text` (codegen'd Viterbi). */
  def encode(text: Column, model: UnigramModel): Column =
    KernelExprs.unigram_encode(text, model.table)

  /** Token count of `text` (codegen'd, no array materialized). */
  def tokenCount(text: Column, model: UnigramModel): Column =
    KernelExprs.unigram_count(text, model.table)

  /** Byte-exact inverse of [[encode]] for marker-free text. */
  def decode(tokens: Column, model: UnigramModel): Column =
    KernelExprs.unigram_decode(tokens, model.table)

  /** TOKEN IDS (array<int>): 0 = <unk>, piece i → i+1. */
  def encodeIds(text: Column, model: UnigramModel): Column =
    KernelExprs.unigram_encode_ids(text, model.table)

  /** Inverse of [[encodeIds]]. */
  def decodeIds(ids: Column, model: UnigramModel): Column =
    KernelExprs.unigram_decode_ids(ids, model.table)
}
