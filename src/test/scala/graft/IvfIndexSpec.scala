package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Persisted IVF index ([[Similarity.writeIvfIndex]] /
  * [[Similarity.ivfTopKIndexed]] / [[Similarity.appendIvfIndex]]): the
  * indexed read equals the one-shot [[Similarity.ivfTopK]], probes read
  * only their cells' partition directories, and appends grow the corpus
  * under the stored centroids. */
class IvfIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** 4 well-separated clusters of 8-dim vectors. */
  private def vecs(n: Int, offset: Long = 0L): DataFrame =
    (0L until n.toLong).map { i =>
      val id = i + offset
      (id, Array.tabulate(8)(d => ((id % 4) * 10 + d + (id % 7)).toFloat))
    }.toDF("vec_id", "embedding")

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-ivfidx").toString + "/idx"

  test("indexed read is row-identical to the one-shot ivfTopK") {
    val corpus = vecs(80)
    val queries = corpus.filter(col("vec_id") < 5)
    val seeds = corpus.filter(col("vec_id") < 8)
    val path = tmp()
    Similarity.writeIvfIndex(corpus, col("vec_id"), col("embedding"),
      seeds, col("vec_id"), col("embedding"), path, lloydIters = 2)
    val direct = Similarity.ivfTopK(corpus, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        seeds, col("vec_id"), col("embedding"),
        k = 4, nprobe = 2, lloydIters = 2)
      .as[(Long, Int, Long, Double, Int)].collect().toSet
    val indexed = Similarity.ivfTopKIndexed(spark, path, queries,
        col("vec_id"), col("embedding"), k = 4, nprobe = 2)
      .as[(Long, Int, Long, Double, Int)].collect().toSet
    assert(indexed == direct,
      s"only-indexed: ${indexed -- direct}\nonly-direct: ${direct -- indexed}")
    assert(indexed.nonEmpty)
  }

  test("probes scan only their cells' partition directories") {
    val corpus = vecs(80)
    val path = tmp()
    Similarity.writeIvfIndex(corpus, col("vec_id"), col("embedding"),
      corpus.filter(col("vec_id") < 8), col("vec_id"), col("embedding"), path)
    val totalCells = spark.read.parquet(s"$path/assign")
      .select("cell").distinct().count()
    assert(totalCells >= 3, s"degenerate fixture: $totalCells cells")
    val one = Similarity.ivfTopKIndexed(spark, path,
      vecs(1), col("vec_id"), col("embedding"), k = 3, nprobe = 1)
    one.collect()
    // AQE hides finished stages behind QueryStageExec nodes whose plans
    // are not in `children` — descend explicitly
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = {
      val here = p match {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
        case _ => Nil
      }
      here ++ p.children.flatMap(allScans)
    }
    val scans = allScans(one.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("assign")))
    assert(scans.nonEmpty)
    val partsRead = scans.map(_.metrics("numPartitions").value).sum
    assert(partsRead == 1L,
      s"nprobe=1 read $partsRead of $totalCells cell directories")
  }

  test("append grows the corpus under the stored centroids") {
    val corpus = vecs(40)
    val path = tmp()
    Similarity.writeIvfIndex(corpus, col("vec_id"), col("embedding"),
      corpus.filter(col("vec_id") < 8), col("vec_id"), col("embedding"), path)
    // new vectors land in their (fixed-centroid) cells...
    Similarity.appendIvfIndex(vecs(20, offset = 1000),
      col("vec_id"), col("embedding"), path)
    val q = vecs(1, offset = 1000) // identical to appended id 1000
    val got = Similarity.ivfTopKIndexed(spark, path, q,
        col("vec_id"), col("embedding"), k = 3, nprobe = 1)
      .select("neighbor_id").as[Long].collect().toSet
    // ...and are immediately visible: id 1000's near-identical appended
    // twins (1004·? share the cluster pattern) or originals must rank
    assert(got.nonEmpty)
    // the appended set's own members are findable: query id 1008 (same
    // cluster residue as 1000) should surface appended neighbors
    val all = spark.read.parquet(s"$path/assign").count()
    assert(all == 60L, s"append lost rows: $all")
  }

  test("L2 indexed probe is row-identical to the one-shot ivfL2TopK") {
    val corpus = vecs(80)
    val queries = corpus.filter(col("vec_id") < 5)
    val seeds = corpus.filter(col("vec_id") < 8)
    val path = tmp()
    Similarity.writeIvfIndexL2(corpus, col("vec_id"), col("embedding"),
      seeds, col("vec_id"), col("embedding"), path)
    val direct = Similarity.ivfL2TopK(corpus, col("vec_id"),
        col("embedding"), queries, col("vec_id"), col("embedding"),
        seeds, col("vec_id"), col("embedding"), k = 4, nprobe = 2)
      .as[(Long, Int, Long, Long, Int)].collect().toSet
    val indexed = Similarity.ivfL2TopKIndexed(spark, path, queries,
        col("vec_id"), col("embedding"), k = 4, nprobe = 2)
      .as[(Long, Int, Long, Long, Int)].collect().toSet
    assert(indexed == direct,
      s"only-indexed: ${indexed -- direct}\nonly-direct: ${direct -- indexed}")
    assert(indexed.nonEmpty)
  }

  test("IP indexed probe ranks by exact integer dot within probed cells") {
    val corpus = vecs(80)
    val queries = corpus.filter(col("vec_id") < 3)
    val seeds = corpus.filter(col("vec_id") < 8)
    val path = tmp()
    Similarity.writeIvfIndexIp(corpus, col("vec_id"), col("embedding"),
      seeds, col("vec_id"), col("embedding"), path)
    val got = Similarity.ivfIpTopKIndexed(spark, path, queries,
        col("vec_id"), col("embedding"), k = 4, nprobe = 2)
      .as[(Long, Int, Long, Long, Int)].collect().toSeq
    assert(got.nonEmpty)
    // hand-replay: probe the 2 max-dot cells, rank candidates by dot
    val cents = Similarity.readCentroids(spark, path)
    val byId = corpus.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(f =>
          math.floor(f.toDouble * 1000 + 0.5).toLong).toArray).toMap
    val assigned = spark.read
      .parquet(Similarity.assignDir(spark, path))
      .select("neighbor_id", "cell")
      .as[(Long, Int)].collect().toMap
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val qv = byId(qid)
      val probed = cents
        .map { case (cid, c) =>
          (cid, graft.functions.Kernels.dotArrays(qv, c)) }
        .sortBy { case (cid, d) => (-d, cid) }.take(2).map(_._1).toSet
      val expect = assigned.collect {
        case (nid, cell) if probed.contains(cell) && nid != qid =>
          (nid, graft.functions.Kernels.dotArrays(byId(nid), qv))
      }.toSeq.sortBy { case (nid, d) => (-d, nid) }.take(4)
      assert(rows.sortBy(_._5).map(r => (r._3, r._4)) == expect,
        s"query $qid")
    }
  }

  test("driver-side probe: null query vectors probe no cells (UDF parity)") {
    // r16 optimization moved the per-query cell probe from an explode-UDF
    // job to the driver (probeQueriesDriver); the UDF path mapped a null
    // vector to Seq.empty (no probed cell, no output rows) — pin that the
    // driver path does too, alongside a live query in the same batch
    val corpus = vecs(40)
    val seeds = corpus.filter(col("vec_id") < 4)
    val path = tmp()
    Similarity.writeIvfIndex(corpus, col("vec_id"), col("embedding"),
      seeds, col("vec_id"), col("embedding"), path)
    val queries = Seq(
      (1000L, Some(Array.tabulate(8)(d => (10 + d).toFloat))),
      (1001L, Option.empty[Array[Float]])
    ).toDF("vec_id", "embedding")
    val got = Similarity.ivfTopKIndexed(spark, path, queries,
        col("vec_id"), col("embedding"), k = 3, nprobe = 2)
      .select("query_id").as[Long].collect()
    assert(got.nonEmpty && got.forall(_ == 1000L),
      s"null-vec query must emit nothing, live one must answer: ${got.toSeq}")
  }

  test("driver-side probe: all-null query batch returns an empty frame") {
    val corpus = vecs(40)
    val seeds = corpus.filter(col("vec_id") < 4)
    val path = tmp()
    Similarity.writeIvfIndex(corpus, col("vec_id"), col("embedding"),
      seeds, col("vec_id"), col("embedding"), path)
    val queries = Seq((1001L, Option.empty[Array[Float]]))
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfTopKIndexed(spark, path, queries,
      col("vec_id"), col("embedding"), k = 3, nprobe = 2)
    assert(got.isEmpty)
  }
}
