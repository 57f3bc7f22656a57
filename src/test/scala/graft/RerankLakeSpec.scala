package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DynamicPrune, Similarity}
import graft.sinks.Sinks
import graft.sources.ZLake

/** Rerank tails served by PRUNED POINT-READS (VERDICT r12 #5): the
  * exact-rerank fetch of the IVF,SQ8 and IVF-PQ serving paths must read
  * only the primary-lake files that can hold shortlist rows — never
  * re-scan the corpus — and stay row-identical to the corpus-DataFrame
  * lanes the oracles gate (q207/q133). */
class RerankLakeSpec extends AnyFunSuite with SparkSpec {

  private val files = 16

  /** 4k vectors in 8 dims, ids clustered so per-file id envelopes are
    * narrow (the z-order rides vec_id): a small shortlist prunes most
    * files by range alone, blooms cover the scattered residue. */
  private def corpus(): DataFrame =
    spark.range(1 << 12).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => ((col("id") % 4) * 10 + d + (col("id") % 7)).cast("float"))
        .as("embedding"))
      .withColumn("pad", (col("vec_id") % 97).cast("long"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def mkLake(): String = {
    val path = tmp("rerank-lake")
    Sinks.zorderedWrite(corpus(), "vec_id", "pad", path, files, bits = 12)
    ZLake.writeManifest(spark, path, bloomCols = Seq("vec_id"))
    path
  }

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case f: FileSourceScanExec => f }
    if (scans.isEmpty) 0L else scans.map(_.metrics("numFiles").value).sum
  }

  test("IVF,SQ8 rerank from the lake: pruned fetch, rows identical to " +
      "the corpus-scan lane") {
    val lake = mkLake()
    val all = ZLake.read(spark, lake)
    val idx = tmp("rerank-sq8") + "/idx"
    Similarity.writeIvfIndexSq8(all, col("vec_id"), col("embedding"),
      all.filter(col("vec_id") < 8), col("vec_id"), col("embedding"), idx)
    val q = all.filter(col("vec_id") < 4)

    val viaLake = Similarity.ivfSq8RerankTopKLake(spark, idx, lake,
        "vec_id", "embedding", q, col("vec_id"), col("embedding"),
        k = 5, nprobe = 2, mult = 2)
      .orderBy(col("query_id"), col("rn")).collect().toSeq
    val viaScan = Similarity.ivfSq8RerankTopKIndexed(spark, idx, all,
        col("vec_id"), col("embedding"), q, col("vec_id"), col("embedding"),
        k = 5, nprobe = 2, mult = 2)
      .orderBy(col("query_id"), col("rn")).collect().toSeq
    assert(viaLake == viaScan,
      "the lake-served rerank must be row-identical to the corpus lane")

    // the fetch itself: shortlist-pruned, reads < the full file count
    val shortlist = Similarity.ivfSq8TopKIndexed(spark, idx, q,
        col("vec_id"), col("embedding"), k = 10, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"))
    val n = filesRead(DynamicPrune.readSemiFiltered(spark, lake, "vec_id",
      shortlist, col("neighbor_id")))
    info(s"rerank fetch read $n/$files lake files")
    assert(n < files, s"the rerank fetch must prune ($n/$files files read)")
  }

  test("IVF-PQ rerank from the lake: rows identical to ivfPqRerankTopK") {
    val lake = mkLake()
    val all = ZLake.read(spark, lake)
    val seeds = all.filter(col("vec_id") < 8)
    val viaLake = Similarity.ivfPqRerankTopKLake(spark, lake,
        "vec_id", "embedding", all.filter(col("vec_id") < 4),
        col("vec_id"), col("embedding"), seeds, col("vec_id"),
        col("embedding"), m = 4, numCodes = 8, k = 5, nprobe = 2,
        refineFactor = 3)
      .orderBy(col("query_id"), col("rn")).collect().toSeq
    val viaScan = Similarity.ivfPqRerankTopK(all, col("vec_id"),
        col("embedding"), all.filter(col("vec_id") < 4), col("vec_id"),
        col("embedding"), seeds, col("vec_id"), col("embedding"),
        m = 4, numCodes = 8, k = 5, nprobe = 2, refineFactor = 3)
      .orderBy(col("query_id"), col("rn")).collect().toSeq
    assert(viaLake == viaScan)
  }
}
