package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, Similarity}

/** STREAMING index maintenance (r13): a checkpointed `foreachBatch`
  * stream feeds the serving indexes through FENCED, EXACTLY-ONCE batch
  * ingest — the streamed index must equal a batch build over the same
  * corpus, a replayed batch must no-op, and a crashed half-adopted batch
  * must converge (not duplicate) on replay. */
class StreamingIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-$tag").toString

  private def docsDf(r: Range): DataFrame = r.map(i =>
    i.toLong -> s"alpha w${i % 13} ${if (i % 3 == 0) "beta" else "gamma"}")
    .toDF("doc_id", "text")
  private def vecsDf(r: Range): DataFrame = r.map { i =>
    (i.toLong, Array.tabulate(8)(d => ((i % 4) * 10 + d + (i % 7)).toFloat))
  }.toDF("vec_id", "embedding")
  private val q = Seq("alpha", "beta")

  test("BM25: streamed ingest over three micro-batches equals the batch " +
      "build; a restart replays and the fence no-ops it") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmp("sidx-bm25")
    val path = s"$base/idx"; val ckpt = s"$base/ckpt"
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS().toDF("doc_id", "text")
    val sq = Retrieval.streamIngestBm25(stream, col("doc_id"), col("text"),
      path, ckpt, nBuckets = 8)
    try {
      Seq(1 to 40, 41 to 80, 81 to 120).foreach { r =>
        mem.addData(r.map(i =>
          (i.toLong, s"alpha w${i % 13} ${if (i % 3 == 0) "beta" else "gamma"}")): _*)
        sq.processAllAvailable()
      }
    } finally sq.stop()
    val full = tmp("sidx-bm25-full") + "/idx"
    Retrieval.writeBm25Index(docsDf(1 to 120), col("doc_id"), col("text"),
      full, 8)
    val streamed = Retrieval.searchBm25Index(spark, path, q, 30)
      .collect().toSeq
    assert(streamed == Retrieval.searchBm25Index(spark, full, q, 30)
      .collect().toSeq,
      "streamed index must rank exactly like the batch build")
    // the replay path: re-running an already-committed batch no-ops
    assert(!Retrieval.ingestBatchBm25(docsDf(41 to 80), col("doc_id"),
      col("text"), path, batchId = 1, nBuckets = 8))
    assert(Retrieval.searchBm25Index(spark, path, q, 30)
      .collect().toSeq == streamed, "a fenced replay must change nothing")
  }

  test("BM25: a crash between adopt and commit converges on replay — " +
      "no duplicated postings, stats applied once") {
    val path = tmp("sidx-bm25-crash") + "/idx"
    assert(Retrieval.ingestBatchBm25(docsDf(1 to 60), col("doc_id"),
      col("text"), path, batchId = 0, nBuckets = 8))
    // simulate the crash window: batch 1 fully adopted but the fence
    // (stats overwrite) never landed — roll the stats sidecar back to
    // batch 0's committed bytes after ingesting batch 1
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val statsPath = new org.apache.hadoop.fs.Path(path, "_bm25_stats.json")
    val in = fs.open(statsPath)
    val committed = try in.readAllBytes() finally in.close()
    assert(Retrieval.ingestBatchBm25(docsDf(61 to 120), col("doc_id"),
      col("text"), path, batchId = 1, nBuckets = 8))
    val out = fs.create(statsPath, true)
    try out.write(committed) finally out.close()
    // replay of batch 1 must purge the half-committed residue and land
    // the batch exactly once
    assert(Retrieval.ingestBatchBm25(docsDf(61 to 120), col("doc_id"),
      col("text"), path, batchId = 1, nBuckets = 8))
    val full = tmp("sidx-bm25-crash-full") + "/idx"
    Retrieval.writeBm25Index(docsDf(1 to 120), col("doc_id"), col("text"),
      full, 8)
    assert(Retrieval.searchBm25Index(spark, path, q, 40).collect().toSeq ==
      Retrieval.searchBm25Index(spark, full, q, 40).collect().toSeq,
      "the replayed batch must not duplicate postings or stats")
  }

  test("IVF: streamed ingest equals batch appends; fenced replay no-ops; " +
      "selective compaction composes with the fence") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmp("sidx-ivf")
    val path = s"$base/idx"; val ckpt = s"$base/ckpt"
    val corpus = vecsDf(1 to 100)
    Similarity.writeIvfIndex(corpus, col("vec_id"), col("embedding"),
      corpus.filter(col("vec_id") < 4), col("vec_id"), col("embedding"),
      path)
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDS().toDF("vec_id", "embedding")
    val sq = Similarity.streamIngestIvf(stream, col("vec_id"),
      col("embedding"), path, ckpt)
    try {
      Seq(101 to 140, 141 to 180).foreach { r =>
        mem.addData(r.map(i => (i.toLong, Array.tabulate(8)(d =>
          ((i % 4) * 10 + d + (i % 7)).toFloat).toSeq)): _*)
        sq.processAllAvailable()
      }
    } finally sq.stop()
    val fresh = tmp("sidx-ivf-ref") + "/idx"
    Similarity.writeIvfIndex(vecsDf(1 to 180), col("vec_id"),
      col("embedding"), corpus.filter(col("vec_id") < 4),
      col("vec_id"), col("embedding"), fresh)
    val probes = vecsDf(5 to 8)
    def top(p: String) = Similarity.ivfTopKIndexed(spark, p, probes,
        col("vec_id"), col("embedding"), k = 5, nprobe = 2)
      .orderBy(col("query_id"), col("rn")).collect().toSeq
    val streamed = top(path)
    assert(streamed == top(fresh),
      "streamed index must probe exactly like a fresh build")
    // fenced replay no-ops
    assert(!Similarity.ingestBatchIvf(vecsDf(141 to 180), col("vec_id"),
      col("embedding"), path, batchId = 1))
    // maintenance composes: selective compaction + vacuum keep answers
    Similarity.compactIvfIndex(spark, path)
    Similarity.vacuumIvfIndex(spark, path)
    assert(top(path) == streamed)
  }

  test("BM25: a crash inside the bootstrap replays as a clean rebuild — " +
      "batch 0 is never appended onto its own partial build") {
    val path = tmp("sidx-bm25-boot") + "/idx"
    assert(Retrieval.ingestBatchBm25(docsDf(1 to 60), col("doc_id"),
      col("text"), path, batchId = 0, nBuckets = 8))
    // simulate the crash window: postings on disk but the stats+fence
    // overwrite (the bootstrap's single commit point) never landed
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path, "_bm25_stats.json"), false)
    assert(!Retrieval.indexExists(spark, path))
    // the streaming replay of batch 0 must rebuild, not append
    assert(Retrieval.ingestBatchBm25(docsDf(1 to 60), col("doc_id"),
      col("text"), path, batchId = 0, nBuckets = 8))
    val full = tmp("sidx-bm25-boot-full") + "/idx"
    Retrieval.writeBm25Index(docsDf(1 to 60), col("doc_id"), col("text"),
      full, 8)
    assert(Retrieval.searchBm25Index(spark, path, q, 40).collect().toSeq ==
      Retrieval.searchBm25Index(spark, full, q, 40).collect().toSeq,
      "replayed bootstrap must equal a clean build (no doubled postings)")
  }
}
