package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{Candidate, Doc, ExactVerdict}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Streaming dedup == batch dedup on the same corpus, independent of how
  * the stream is chunked into micro-batches; checkpointed state carries the
  * dedup history across a restart. */
class StreamingDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def corpus(n: Int): Seq[Doc] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1).take(n).map { case (id, t) => Doc(id, t) }.toSeq

  private def runExact(batches: Seq[Seq[Doc]]): Seq[ExactVerdict] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val name = s"sdx_${System.nanoTime()}"
    val q = StreamingDedup.exactVerdicts(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[ExactVerdict].collect().toSeq
    } finally q.stop()
  }

  private def runNearDup(batches: Seq[Seq[Doc]]): Set[Candidate] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val name = s"sdn_${System.nanoTime()}"
    val q = StreamingDedup.nearDupCandidates(
        mem.toDS(), shingleN = 3, numHashes = 8, bands = 4, minEstJaccard = 0.5)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Candidate].collect().toSet
    } finally q.stop()
  }

  test("exact verdicts match batch keep-one and are chunking-independent") {
    val docs = corpus(60)
    // inject exact duplicates across chunk boundaries
    val dups = docs.take(8).map(d => Doc(d.docId + 100000, d.text))
    val all = (docs ++ dups).sortBy(_.docId)
    val expectKeep = all.groupBy(_.text).values
      .flatMap { g => val k = g.map(_.docId).min; g.map(d => (d.docId, k)) }
      .toMap
    for (chunks <- Seq(Seq(all), all.grouped(23).toSeq, all.grouped(7).toSeq)) {
      val got = runExact(chunks)
      assert(got.size == all.size)
      got.foreach { v =>
        assert(v.keepId == expectKeep(v.docId), s"doc ${v.docId}")
        assert(v.isDuplicate == (v.keepId != v.docId))
      }
    }
  }

  test("near-dup candidates equal the batch LSH pair set, any chunking") {
    val docs = corpus(80)
    val batchPairs = Dedup.minhashCandidates(
        docs.toDF("docId", "text"), col("docId"), col("text"),
        shingleN = 3, numHashes = 8, bands = 4)
      .filter(col("est_jaccard") >= 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, e) => Candidate(a, b, e) }.toSet
    assert(batchPairs.nonEmpty, "fixture yields no candidate pairs — widen it")
    for (chunks <- Seq(Seq(docs), docs.grouped(27).toSeq))
      assert(runNearDup(chunks) == batchPairs)
  }

  test("checkpointed state survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus(20)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sd-ck").toString
    val mem = MemoryStream[Doc]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[ExactVerdict]()
    def start() = StreamingDedup.exactVerdicts(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[ExactVerdict], _: Long) =>
        b.collect().foreach(got.add); ()
      }.start()
    val q1 = start()
    mem.addData(docs: _*); q1.processAllAvailable(); q1.stop()
    // duplicates of already-seen content arrive AFTER the restart
    val q2 = start()
    mem.addData(docs.take(5).map(d => Doc(d.docId + 500, d.text)): _*)
    q2.processAllAvailable()
    try {
      val late = got.toArray(Array.empty[ExactVerdict]).filter(_.docId >= 500).toSeq
      assert(late.size == 5)
      late.foreach { v =>
        assert(v.isDuplicate && v.keepId == v.docId - 500,
          s"restart lost dedup state: $v")
      }
    } finally q2.stop()
  }
}
