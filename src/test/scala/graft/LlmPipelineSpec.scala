package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}
import graft.operators.{Bpe, Decontamination, Dedup, TrainPrep}

/** END-TO-END training-data pipeline: the full corpus→shards chain a
  * pretraining run needs — substring dedup → exact dedup → MinHash
  * near-dup clustering → benchmark decontamination → quality filter →
  * byte-level BPE train+encode → fixed-length packing → deterministic
  * training order — every stage the engine's own operator, chained on
  * real testdata. Each operator is oracle-gated on its own (q159, q27,
  * q30/q59, q84, q154/q156, q157, q161); this spec pins what only the
  * COMPOSITION can break: stage interface drift, survivor accounting,
  * and whole-chain determinism (two runs, byte-identical output).
  */
class LlmPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** The whole pipeline; returns (survivors, packed, order). */
  private def run(): (DataFrame, DataFrame, DataFrame) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // 1. exact-substring dedup: cut duplicated 6-token spans
    val sub = Dedup.substringDedup(docs, col("doc_id"), col("text"), 6)
      .filter(col("n_tokens") - col("n_removed") > 0)
      .select(col("doc_id"), col("kept_text").as("text"))

    // 2. exact document dedup on the cleaned text (keep first)
    val exact = sub.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))

    // 3. MinHash near-dup clusters: drop every non-representative member
    val pairs = Dedup.minhashCandidates(exact, col("doc_id"), col("text"),
        shingleN = 3, numHashes = 16, bands = 4)
      .filter(col("est_jaccard") >= 0.9)
    val clusters = Dedup.duplicateClusters(pairs)
    val nearDeduped = exact.join(clusters,
        exact("doc_id") === clusters("id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .select(exact("doc_id"), col("text"))

    // 4. decontamination: docs 0-4 (their pipeline-cleaned text, so the
    //    shingle sets match exactly) stand in for a benchmark suite
    val benchmark = sub.filter(col("doc_id") < 5).select(col("text"))
    val flags = Decontamination.bloomScores(nearDeduped, col("doc_id"),
      col("text"), benchmark, col("text"),
      shingleN = 3, numBits = 1 << 14, numHashes = 3, threshold = 0.8)
    val clean = nearDeduped.join(
      flags.filter(col("contaminated")).select(col("doc_id")),
      Seq("doc_id"), "left_anti")

    // 5. quality floor
    val survivors = clean.filter(TF.token_count(col("text")) >= 10)
      .localCheckpoint(false)

    // 6. tokenize: byte-level BPE trained on the survivors themselves
    val model = Bpe.train(survivors, col("text"), numMerges = 50,
      maxWords = 1 << 16, minFreq = 2L, byteLevel = true)
    val eos = Bpe.vocabSize(model) // one past the vocab: the EOS sentinel
    val withIds = survivors.select(col("doc_id"),
      Bpe.encodeIds(col("text"), model).as("ids"))

    // 7. pack to fixed-length rows within hash shards
    val packed = TrainPrep.packTokenIds(withIds, col("doc_id"), col("ids"),
      pmod(col("doc_id"), lit(4L)), seqLen = 64, eosId = eos)

    // 8. deterministic epoch-0 read order over the packed shards
    val order = TrainPrep.trainingOrder(
      packed.select((col("shard") * 1000000 + col("seq_id")).as("row_id"),
        lit(0L).as("epoch")),
      col("row_id"), col("epoch"), seed = 42L, numShards = 4)
    (survivors, packed, order)
  }

  test("chain composes: accounting, contamination, packing invariants") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (survivors, packed, order) = run()
    val nIn = docs.count()
    val nSurv = survivors.count()
    assert(nSurv > 0 && nSurv <= nIn)
    // the benchmark members themselves can never survive decontamination
    val leaked = survivors.filter(col("doc_id") < 5).count()
    assert(leaked == 0, s"benchmark docs leaked into the training set: $leaked")
    // packing: every row exactly 64 ids, every id inside vocab ∪ {EOS}
    val rows = packed.select(col("ids")).as[Seq[Int]].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.length == 64), "packed rows must be fixed-length")
    val model = Bpe.train(survivors, col("text"), numMerges = 50,
      maxWords = 1 << 16, minFreq = 2L, byteLevel = true)
    val vs = Bpe.vocabSize(model)
    assert(rows.forall(_.forall(id => id >= 0 && id <= vs)),
      "every packed id must be a vocab id or the EOS sentinel")
    // order: a permutation of the packed rows
    val nPacked = packed.count()
    assert(order.count() == nPacked)
    assert(order.select(col("doc_id")).distinct().count() == nPacked)
  }

  test("the whole chain is deterministic end to end") {
    val (s1, p1, o1) = run()
    val (s2, p2, o2) = run()
    def key(df: DataFrame, cols: String*): Seq[String] =
      df.select(cols.map(col): _*).collect()
        .map(_.mkString("|")).sorted.toSeq
    assert(key(s1, "doc_id", "text") == key(s2, "doc_id", "text"))
    assert(key(p1.select(col("shard"), col("seq_id"),
        concat_ws(",", col("ids")).as("ids")), "shard", "seq_id", "ids") ==
      key(p2.select(col("shard"), col("seq_id"),
        concat_ws(",", col("ids")).as("ids")), "shard", "seq_id", "ids"))
    assert(key(o1, "shard", "pos", "doc_id") == key(o2, "shard", "pos", "doc_id"))
  }
}
