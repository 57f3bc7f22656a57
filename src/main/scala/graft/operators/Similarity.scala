package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Functions => F}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    Queries are broadcast (they're the small side); the corpus is never
  *    shuffled, each partition scores its slice and a TakeOrdered-style
  *    window keeps k per query. Fine for ≤10⁴ queries × any corpus size.
  *  - [[lshTopK]]: sign-random-projection LSH — corpus hashed once into
  *    2^planes buckets; queries probe only their bucket. The scale path:
  *    candidate count is corpus/2^planes per query instead of the corpus.
  *
  * Hyperplanes are derived deterministically from [[F.hash60]] of
  * (plane, dim) so the whole pipeline is reproducible in the SQL oracle.
  * Vectors are quantized (scale 1000) → integer dot products → deterministic
  * scores across engines.
  */
object Similarity {

  /** Exact top-k neighbors per query by quantized cosine.
    * Output: (query_id, neighbor_id, cosine, rn). */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), F.vec_quantize(corpusVec, 1000).as("cv"))
    val q = queries.select(queryId.as("query_id"), F.vec_quantize(queryVec, 1000).as("qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", F.vec_cosine_q6(col("cv"), col("qv")))
    TopK.perGroup(scored, k, Seq(col("query_id")),
        Seq(col("cosine").desc, col("neighbor_id").asc))
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rn"))
  }

  /** Sign-random-projection bucket id (0 .. 2^planes-1) for a quantized
    * vector column: bit p = sign of <v, hyperplane_p>, where hyperplane
    * component (p, d) = hash60("plane_<p>_<d>") % 1000 - 500 — deterministic,
    * so the SQL oracle reproduces it. Native
    * [[graft.functions.KernelExprs.SrpBucket]]: the plane matrix is
    * row-independent and memoized; the composed form recomputed one md5 per
    * vector element per row. */
  def srpBucket(qvec: Column, planes: Int): Column =
    graft.functions.KernelExprs.srp_bucket(qvec, planes)

  /** LSH-bucketed ANN: probe only the query's SRP bucket. Recall < 1 by
    * construction; bucket collision ⇒ similar direction. Output as
    * [[bruteForceTopK]] plus the bucket id. */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, planes: Int): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), F.vec_quantize(corpusVec, 1000).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), planes))
    val q = queries.select(queryId.as("query_id"), F.vec_quantize(queryVec, 1000).as("qv"))
      .withColumn("bucket", srpBucket(col("qv"), planes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", F.vec_cosine_q6(col("cv"), col("qv")))
    TopK.perGroup(scored, k, Seq(col("query_id")),
        Seq(col("cosine").desc, col("neighbor_id").asc))
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("cosine"), col("rn"))
  }
}
