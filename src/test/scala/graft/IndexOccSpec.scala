package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IndexOcc, Retrieval, Similarity}

/** The derived-index maintenance races (VERDICT r11 #3): an append landing
  * while a compaction is staging must never be silently lost — the
  * compaction detects the conflict via its read-set (pointer + active-dir
  * fingerprint) and restages; an append overlapping a completed compaction
  * adopts into the NEW active dir re-resolved under the writer lock. Both
  * indexes (BM25 postings, IVF assignment) ride the same [[IndexOcc]]
  * machinery. */
class IndexOccSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
  private def corpus(r: Range): Seq[(Long, String)] = r.map(i =>
    i.toLong -> s"alpha w${i % 13} ${if (i % 3 == 0) "beta" else "gamma"}")
  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-$p").toString + "/idx"

  /** One-shot staged-window hook (self-resets before running, so a
    * mutation it triggers does not recurse). */
  private def onceStaged(body: => Unit): Unit =
    IndexOcc.stagedHook.set { () =>
      IndexOcc.stagedHook.set(() => ())
      body
    }

  private val q = Seq("alpha", "beta")

  test("BM25: append lands inside the compaction's staging window — " +
      "conflict detected, compaction restages, BOTH survive") {
    val path = tmp("occ-bm25"); val full = tmp("occ-bm25-full")
    Retrieval.writeBm25Index(docs(corpus(1 to 60)), col("doc_id"),
      col("text"), path, 8)
    // fragment first: an already-compact index makes compaction a no-op
    // (r13 selective semantics), which would never open the race window
    Retrieval.appendBm25Index(docs(corpus(61 to 90)), col("doc_id"),
      col("text"), path)
    val before = IndexOcc.compactionConflicts.get()
    onceStaged {
      Retrieval.appendBm25Index(docs(corpus(91 to 120)), col("doc_id"),
        col("text"), path)
    }
    try {
      val (_, after) = Retrieval.compactBm25Index(spark, path)
      assert(after > 0)
    } finally IndexOcc.stagedHook.set(() => ())
    assert(IndexOcc.compactionConflicts.get() > before,
      "the race must be detected, not silently resolved")
    Retrieval.writeBm25Index(docs(corpus(1 to 120)), col("doc_id"),
      col("text"), full, 8)
    assert(Retrieval.searchBm25Index(spark, path, q, 30).collect().toSeq ==
      Retrieval.searchBm25Index(spark, full, q, 30).collect().toSeq,
      "appended docs must survive the racing compaction")
  }

  test("BM25: compaction completes inside the append's staging window — " +
      "the append adopts into the NEW active dir, nothing stranded") {
    val path = tmp("occ-bm25-rev"); val full = tmp("occ-bm25-rev-full")
    Retrieval.writeBm25Index(docs(corpus(1 to 60)), col("doc_id"),
      col("text"), path, 8)
    // the wide corpus append fragments EVERY bucket, so the racing
    // compaction below is a FULL flatten (new version dir + pointer
    // swap) — the shape whose retired layout must stay vacuumable
    Retrieval.appendBm25Index(docs(corpus(61 to 90)), col("doc_id"),
      col("text"), path)
    onceStaged { Retrieval.compactBm25Index(spark, path); () }
    try Retrieval.appendBm25Index(docs(corpus(91 to 120)), col("doc_id"),
      col("text"), path)
    finally IndexOcc.stagedHook.set(() => ())
    Retrieval.writeBm25Index(docs(corpus(1 to 120)), col("doc_id"),
      col("text"), full, 8)
    assert(Retrieval.searchBm25Index(spark, path, q, 30).collect().toSeq ==
      Retrieval.searchBm25Index(spark, full, q, 30).collect().toSeq,
      "the append must land in the compacted version, not the retired dir")
    // and the retired pre-compaction layout is vacuumable without loss
    assert(Retrieval.vacuumBm25Index(spark, path) > 0)
    assert(Retrieval.searchBm25Index(spark, path, q, 30).collect().toSeq ==
      Retrieval.searchBm25Index(spark, full, q, 30).collect().toSeq)
  }

  private def vecs(r: Range): DataFrame =
    r.map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i % 4) * 10 + d + (i % 7)).toFloat))
    }.toDF("vec_id", "embedding")

  test("IVF: append lands inside the compaction's staging window — " +
      "conflict detected, compaction restages, BOTH survive") {
    val path = tmp("occ-ivf")
    val base = vecs(0 until 80)
    Similarity.writeIvfIndex(base, col("vec_id"), col("embedding"),
      base.filter(col("vec_id") < 8), col("vec_id"), col("embedding"), path)
    val before = IndexOcc.compactionConflicts.get()
    onceStaged {
      Similarity.appendIvfIndex(vecs(80 until 120), col("vec_id"),
        col("embedding"), path)
    }
    try Similarity.compactIvfIndex(spark, path)
    finally IndexOcc.stagedHook.set(() => ())
    assert(IndexOcc.compactionConflicts.get() > before)
    val ids = spark.read.parquet(Similarity.assignDir(spark, path))
      .select("neighbor_id").as[Long].collect().toSet
    assert(ids == (0L until 120L).toSet,
      "appended vectors must survive the racing compaction")
  }

  test("IVF: compaction completes inside the append's staging window — " +
      "the append adopts into the NEW active dir") {
    val path = tmp("occ-ivf-rev")
    val base = vecs(0 until 80)
    Similarity.writeIvfIndex(base, col("vec_id"), col("embedding"),
      base.filter(col("vec_id") < 8), col("vec_id"), col("embedding"), path)
    onceStaged { Similarity.compactIvfIndex(spark, path) }
    try Similarity.appendIvfIndex(vecs(80 until 120), col("vec_id"),
      col("embedding"), path)
    finally IndexOcc.stagedHook.set(() => ())
    assert(Similarity.assignDir(spark, path).endsWith("assign-v1"))
    val ids = spark.read.parquet(Similarity.assignDir(spark, path))
      .select("neighbor_id").as[Long].collect().toSet
    assert(ids == (0L until 120L).toSet)
  }

  test("vacuum sweeps crashed staging dirs past the stale-lock age") {
    val path = tmp("occ-sweep")
    val base = vecs(0 until 40)
    Similarity.writeIvfIndex(base, col("vec_id"), col("embedding"),
      base.filter(col("vec_id") < 4), col("vec_id"), col("embedding"), path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val crashed = new org.apache.hadoop.fs.Path(root, ".compacting-dead")
    fs.mkdirs(crashed)
    val old = graft.sinks.LakeDelete.staleLockMs.get()
    graft.sinks.LakeDelete.staleLockMs.set(0L)
    try {
      Thread.sleep(5)
      assert(Similarity.vacuumIvfIndex(spark, path) >= 1)
      assert(!fs.exists(crashed))
    } finally graft.sinks.LakeDelete.staleLockMs.set(old)
  }
}
