package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** IVF-PQ and the k-means-refined codebook must EARN their structure:
  * recall is gated against exact L2 ground truth on the real embeddings
  * table, and IVF's cells are compared against a blind sample of the same
  * candidate budget — pruning that does no better than random sampling
  * would be wasted machinery. */
class IvfPqSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val queries = emb.filter(col("vec_id") < 20)
  private val k = 10

  /** Exact L2 top-k per query over the quantized vectors, in memory (500
    * rows) — the PQ family ranks by L2, so cosine ground truth would
    * gate the wrong thing. */
  private lazy val exactL2: Map[Long, Set[Long]] = {
    val all = emb
      .select(col("vec_id"), graft.functions.Functions
        .vec_quantize(col("embedding"), 1000).as("qv"))
      .as[(Long, Seq[Long])].collect()
    val qs = all.filter(_._1 < 20)
    qs.map { case (qid, qv) =>
      val top = all.filter(_._1 != qid)
        .map { case (nid, nv) =>
          var s = 0L; var i = 0
          while (i < qv.length) { val d = qv(i) - nv(i); s += d * d; i += 1 }
          (s, nid)
        }
        .sortBy(identity).take(k).map(_._2).toSet
      qid -> top
    }.toMap
  }

  private def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, ns) => q -> ns.map(_._2).toSet }

  private def recall(approx: Map[Long, Set[Long]]): Double = {
    val rs = exactL2.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    rs.sum / rs.size
  }

  test("k-means-refined codebook does not degrade PQ recall vs exact L2") {
    val plain = recall(topSet(Similarity.pqTopK(
      emb, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), m = 8, numCodes = 16, k = k)))
    val refined = recall(topSet(Similarity.pqTopK(
      emb, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), m = 8, numCodes = 16, k = k,
      refineCodebook = true)))
    info(f"PQ recall@$k vs exact L2: seed codebook $plain%.3f, refined $refined%.3f")
    // measured 0.295 -> 0.325 on these embeddings: the Lloyd step is a
    // real improvement, not just determinism-preserving decoration
    assert(plain >= 0.25, s"seed-codebook PQ recall degraded to $plain")
    assert(refined >= plain,
      f"refinement must not lose recall: $plain%.3f -> $refined%.3f")
  }

  test("IVF-PQ beats PQ over a blind sample at equal candidate budget") {
    val seeds = emb.filter(col("vec_id") % 37 === 0).limit(8)
    val nprobe = 3 // candidates ~ 3/8 of the corpus
    val ivfpq = recall(topSet(Similarity.ivfPqTopK(
      emb, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"),
      seeds, col("vec_id"), col("embedding"),
      m = 8, numCodes = 16, k = k, nprobe = nprobe, refineCodebook = true)))
    // the blind control: PQ over a deterministic 3/8 sample — same ADC
    // scoring, same candidate COUNT in expectation, no cell structure
    val sampled = emb.filter(
      graft.functions.Functions.hash60(col("vec_id").cast("string")) % 8 < 3)
    val blind = recall(topSet(Similarity.pqTopK(
      sampled, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"),
      m = 8, numCodes = 16, k = k, refineCodebook = true)))
    info(f"recall@$k at a 3/8 candidate budget: IVF-PQ $ivfpq%.3f, blind sample $blind%.3f")
    assert(ivfpq > blind + 0.05,
      f"IVF cells earned nothing over blind sampling: $blind%.3f vs $ivfpq%.3f")
  }

  test("residual IVF-PQ: measured vs raw codes, floors pinned") {
    val seeds = emb.filter(col("vec_id") % 37 === 0).limit(8)
    def run(residual: Boolean): Double = recall(topSet(
      if (residual) Similarity.ivfPqResidualTopK(
        emb, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        seeds, col("vec_id"), col("embedding"),
        m = 8, numCodes = 16, k = k, nprobe = 3)
      else Similarity.ivfPqTopK(
        emb, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        seeds, col("vec_id"), col("embedding"),
        m = 8, numCodes = 16, k = k, nprobe = 3)))
    val raw = run(residual = false)
    val res = run(residual = true)
    // honest measurement, recorded every run: on these weakly-clustered
    // embeddings residuals are NOT tighter than the raw distribution, so
    // residual coding underperforms raw codes (0.190 vs 0.275) — the
    // identity d(q,x) = d(q-c, x-c) only pays when centroids are close to
    // their members. The operator is oracle-verified correct (q101); this
    // gate pins the measured floor so a real regression still surfaces.
    info(f"IVF-PQ recall@$k at nprobe=3: raw codes $raw%.3f, residual codes $res%.3f")
    assert(res >= 0.12, f"residual IVF-PQ collapsed: $res%.3f")
    assert(raw >= 0.2, f"raw IVF-PQ collapsed: $raw%.3f")
  }

  test("bench recall lane: ivfPqRecallAtK floor at the q99 operating point") {
    // the EXACT computation graft.Bench reports as `recall_ivfpq_at10`
    // every round (r8 verdict #7): IVF-PQ vs brute-force cosine top-10,
    // queries/seeds = vec_id < 8, m=8, 16 codes, nprobe=2. The q99/q101
    // oracles pin the VALUES deterministically; this pins the QUALITY, so
    // a centroid/codebook change that stays deterministic but collapses
    // recall still fails the build instead of silently shipping.
    val r = Similarity.ivfPqRecallAtK(
      emb, col("vec_id"), col("embedding"),
      queries = emb.filter(col("vec_id") < 8),
      seeds = emb.filter(col("vec_id") < 8),
      m = 8, numCodes = 16, k = 10, nprobe = 2)
    info(f"ivfPqRecallAtK(k=10, nprobe=2) = $r%.3f")
    // measured 0.362 on the sf0.001 table (deterministic); 0.3 leaves
    // room only for a driver-side testdata regeneration, not a regression
    assert(r >= 0.3, f"bench recall lane collapsed: $r%.3f")
    assert(r <= 1.0)
  }

  test("exact rerank closes most of the ADC quality gap (bench lane floor)") {
    // the EXACT computation graft.Bench reports as
    // `recall_ivfpq_rerank_at10`: same operating point as the plain lane,
    // plus ivfPqRerankTopK's k*8 candidate pool re-scored with exact
    // cosine. PQ then only has to KEEP true neighbors in the pool, not
    // rank them — recall must jump well past the code-ranked number.
    val qs = emb.filter(col("vec_id") < 8)
    val plain = Similarity.ivfPqRecallAtK(
      emb, col("vec_id"), col("embedding"), queries = qs, seeds = qs,
      m = 8, numCodes = 16, k = 10, nprobe = 2)
    val rerank = Similarity.ivfPqRecallAtK(
      emb, col("vec_id"), col("embedding"), queries = qs, seeds = qs,
      m = 8, numCodes = 16, k = 10, nprobe = 2, refineFactor = Some(8))
    info(f"recall@10 at nprobe=2: ADC-ranked $plain%.3f, exact-reranked $rerank%.3f")
    assert(rerank >= plain + 0.2,
      f"rerank bought almost nothing: $plain%.3f -> $rerank%.3f")
    assert(rerank >= 0.75, f"reranked recall collapsed: $rerank%.3f")
  }

  test("IVF-PQ probing every cell equals plain PQ exactly") {
    val seeds = emb.filter(col("vec_id") % 37 === 0).limit(8)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"), col("adc_dist"), col("rn"))
        .as[(Long, Long, Long, Int)].collect().toSet
    val all = canon(Similarity.ivfPqTopK(
      emb, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"),
      seeds, col("vec_id"), col("embedding"),
      m = 8, numCodes = 16, k = k, nprobe = 8))
    val pq = canon(Similarity.pqTopK(
      emb, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), m = 8, numCodes = 16, k = k))
    assert(all == pq, "nprobe = nlist must reduce IVF-PQ to plain PQ")
  }

  test("sf0.1 shipping operating point: reranked recall@10 holds the floor") {
    // r9 task #9: the bench artifact reported recall_ivfpq_rerank_at10 =
    // 0.738 at sf0.1; this pins >= 0.70 at the EXACT bench operating
    // point (8 seed cells, m=8, 16 codes, nprobe=2, refineFactor=8), so
    // a recall regression fails CI rather than only drifting a number in
    // the artifact. Skips cleanly where the sf0.1 fixtures are absent.
    assume(new java.io.File("/root/testdata/sf0.1/embeddings.parquet").exists)
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val r = Similarity.ivfPqRecallAtK(e, col("vec_id"), col("embedding"),
      queries = e.filter(col("vec_id") < 8),
      seeds = e.filter(col("vec_id") < 8),
      m = 8, numCodes = 16, k = 10, nprobe = 2, refineFactor = Some(8))
    info(f"sf0.1 IVF-PQ reranked recall@10: $r%.3f")
    assert(r >= 0.70, f"shipping-point recall regressed: $r%.3f < 0.70")
  }
}
