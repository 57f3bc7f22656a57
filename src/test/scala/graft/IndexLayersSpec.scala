package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IndexLayers, IndexSnapshots, Retrieval, Similarity}

/** SELECTIVE index compaction (VERDICT r12 #4): a maintenance cycle must
  * rewrite only the fragmented cells/buckets — never the whole index —
  * with untouched partitions' files left byte-identical in place (same
  * path, length, mtime), probes unchanged, snapshots spanning layers,
  * and the chain flattening at its depth bound. */
class IndexLayersSpec extends AnyFunSuite with SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def vecs(r: Range): DataFrame = r.map { i =>
    (i.toLong, Array.tabulate(8)(d => ((i % 4) * 10 + d + (i % 7)).toFloat))
  }.toDF("vec_id", "embedding")
  private def docs(r: Range): DataFrame = r.map(i =>
    i.toLong -> s"alpha w${i % 13} ${if (i % 3 == 0) "beta" else "gamma"}")
    .toDF("doc_id", "text")
  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-$p").toString + "/idx"

  private def fs(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** (absolute path → (len, mtime)) of every parquet under `dir`. */
  private def identities(dir: String): Map[String, (Long, Long)] = {
    val f = fs(dir)
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] =
      if (!f.exists(p)) Nil
      else f.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet"))
          Seq((st.getPath.toString, st.getLen, st.getModificationTime))
        else Nil
      }
    walk(new org.apache.hadoop.fs.Path(dir))
      .map(t => t._1 -> ((t._2, t._3))).toMap
  }

  private def ivfCounts(path: String): Map[String, Int] =
    IndexLayers.fileCounts(fs(path),
      Similarity.assignLayers(spark, path), "cell")

  test("IVF: selective compaction rewrites ONLY fragmented cells; " +
      "untouched cells' files stay byte-identical; probes unchanged") {
    val path = tmp("layers-ivf")
    val base = vecs(1 to 200)
    Similarity.writeIvfIndex(base, col("vec_id"), col("embedding"),
      base.filter(col("vec_id") < 4), col("vec_id"), col("embedding"), path)
    // the parallel initial write fragments every cell — one full
    // compaction gives the clean one-file-per-cell baseline
    Similarity.compactIvfIndex(spark, path)
    assert(Similarity.assignLayers(spark, path).size == 1)
    // fragment a SUBSET of cells: appended vectors reuse base patterns
    // (same vector → same cell), ids i % 4 == 1 only
    Similarity.appendIvfIndex(
      vecs(1 to 200).filter(col("vec_id") % 4 === 1)
        .select((col("vec_id") + 1000).as("vec_id"), col("embedding")),
      col("vec_id"), col("embedding"), path)
    val before = ivfCounts(path)
    val hot = before.filter(_._2 > 1).keySet
    val cold = before.keySet -- hot
    assert(hot.nonEmpty && cold.nonEmpty,
      s"fixture must fragment a strict subset of cells (counts $before)")
    val q = vecs(5 to 8)
    val probeBefore = Similarity.ivfTopKIndexed(spark, path, q,
      col("vec_id"), col("embedding"), k = 5, nprobe = 2)
      .orderBy(col("query_id"), col("rn")).collect().toSeq
    val coldFilesBefore = identities(path).filter { case (p, _) =>
      cold.exists(c => p.contains(s"/cell=$c/")) }

    Similarity.compactIvfIndex(spark, path)

    val layers = Similarity.assignLayers(spark, path)
    assert(layers.size == 2, s"selective compaction must LAYER, got $layers")
    assert(layers.head.replaces.contains(hot.map(_.toString)),
      "the new layer must replace exactly the fragmented cells")
    // the top layer holds ONLY the rewritten cells
    val topCells = fs(path).listStatus(
        new org.apache.hadoop.fs.Path(layers.head.dir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map(_.getPath.getName.stripPrefix("cell=")).toSet
    assert(topCells == hot.map(_.toString))
    // untouched cells: the EXACT same files (path + len + mtime)
    val coldFilesAfter = identities(path).filter { case (p, _) =>
      cold.exists(c => p.contains(s"/cell=$c/")) }
    assert(coldFilesAfter == coldFilesBefore,
      "untouched cells' files must not be rewritten, copied, or moved")
    // fragmentation resolved, probes bit-identical
    assert(ivfCounts(path).forall(_._2 <= 1))
    val probeAfter = Similarity.ivfTopKIndexed(spark, path, q,
      col("vec_id"), col("embedding"), k = 5, nprobe = 2)
      .orderBy(col("query_id"), col("rn")).collect().toSeq
    assert(probeAfter == probeBefore)
    // vacuum keeps every live chain layer; probes still green after
    Similarity.vacuumIvfIndex(spark, path)
    assert(Similarity.ivfTopKIndexed(spark, path, q,
      col("vec_id"), col("embedding"), k = 5, nprobe = 2)
      .orderBy(col("query_id"), col("rn")).collect().toSeq == probeBefore,
      "vacuum must keep the base generation a layered chain reads through")
  }

  test("BM25: selective compaction rewrites only fragmented buckets; " +
      "cold buckets byte-identical; rankings unchanged") {
    val path = tmp("layers-bm25")
    Retrieval.writeBm25Index(docs(1 to 120), col("doc_id"), col("text"),
      path, nBuckets = 8)
    // one narrow append: only the buckets of this batch's terms gain files
    Retrieval.appendBm25Index(
      Seq((200L, "alpha alpha"), (201L, "alpha")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    // pre-compaction the postings live in the root layout — one layer
    val counts = IndexLayers.fileCounts(fs(path),
      Seq(IndexLayers.Layer(path, None)), "bucket")
    val hot = counts.filter(_._2 > 1).keySet
    val cold = counts.keySet -- hot
    assert(hot.nonEmpty && cold.nonEmpty, s"fixture buckets: $counts")
    val top = Retrieval.searchBm25Index(spark, path, Seq("alpha", "beta"), 30)
      .collect().toSeq
    val coldBefore = identities(path).filter { case (p, _) =>
      cold.exists(b => p.contains(s"/bucket=$b/")) }

    val (before, after) = Retrieval.compactBm25Index(spark, path)
    assert(after < before, s"fragmentation must drop ($before -> $after)")
    val coldAfter = identities(path).filter { case (p, _) =>
      cold.exists(b => p.contains(s"/bucket=$b/")) }
    assert(coldAfter == coldBefore,
      "untouched buckets' files must not be rewritten")
    assert(Retrieval.searchBm25Index(spark, path, Seq("alpha", "beta"), 30)
      .collect().toSeq == top)
    Retrieval.vacuumBm25Index(spark, path)
    assert(Retrieval.searchBm25Index(spark, path, Seq("alpha", "beta"), 30)
      .collect().toSeq == top,
      "vacuum must keep the root layout while a layer reads through it")
  }

  test("IVF: a pin over a LAYERED generation restores exactly (flattened)") {
    val path = tmp("layers-pin")
    val base = vecs(1 to 200)
    Similarity.writeIvfIndex(base, col("vec_id"), col("embedding"),
      base.filter(col("vec_id") < 4), col("vec_id"), col("embedding"), path)
    Similarity.compactIvfIndex(spark, path) // flatten the initial write
    Similarity.appendIvfIndex(
      vecs(1 to 200).filter(col("vec_id") % 4 === 1)
        .select((col("vec_id") + 1000).as("vec_id"), col("embedding")),
      col("vec_id"), col("embedding"), path)
    Similarity.compactIvfIndex(spark, path) // layered now
    assert(Similarity.assignLayers(spark, path).size == 2)
    val q = vecs(5 to 8)
    val pinnedAnswers = Similarity.ivfTopKIndexed(spark, path, q,
      col("vec_id"), col("embedding"), k = 5, nprobe = 2)
      .orderBy(col("query_id"), col("rn")).collect().toSeq
    IndexSnapshots.snapshot(spark, path, "pin")
    Similarity.appendIvfIndex(
      vecs(1 to 80).select((col("vec_id") + 3000).as("vec_id"),
        col("embedding")), col("vec_id"), col("embedding"), path)
    Similarity.compactIvfIndex(spark, path)
    val rep = IndexSnapshots.restore(spark, path, "pin")
    assert(rep.filesRestored > 0)
    assert(Similarity.assignLayers(spark, path).size == 1,
      "a restored generation is a FULL layer (the chain flattens)")
    assert(Similarity.ivfTopKIndexed(spark, path, q,
      col("vec_id"), col("embedding"), k = 5, nprobe = 2)
      .orderBy(col("query_id"), col("rn")).collect().toSeq == pinnedAnswers)
  }

  test("IVF: the chain flattens at MaxLayers") {
    val path = tmp("layers-flatten")
    val base = vecs(1 to 200)
    Similarity.writeIvfIndex(base, col("vec_id"), col("embedding"),
      base.filter(col("vec_id") < 4), col("vec_id"), col("embedding"), path)
    Similarity.compactIvfIndex(spark, path) // flatten the initial write
    var next = 1000L
    var round = 0
    while (Similarity.assignLayers(spark, path).size < IndexLayers.MaxLayers
        && round < IndexLayers.MaxLayers + 2) {
      Similarity.appendIvfIndex(
        vecs(1 to 200).filter(col("vec_id") % 4 === (round % 2).toLong)
          .select((col("vec_id") + next).as("vec_id"), col("embedding")),
        col("vec_id"), col("embedding"), path)
      Similarity.compactIvfIndex(spark, path)
      next += 1000; round += 1
    }
    assert(Similarity.assignLayers(spark, path).size == IndexLayers.MaxLayers)
    // one more fragmentation cycle must FLATTEN, not deepen
    Similarity.appendIvfIndex(
      vecs(1 to 200).filter(col("vec_id") % 4 === 1)
        .select((col("vec_id") + next).as("vec_id"), col("embedding")),
      col("vec_id"), col("embedding"), path)
    Similarity.compactIvfIndex(spark, path)
    val layers = Similarity.assignLayers(spark, path)
    assert(layers.size == 1 && layers.head.replaces.isEmpty,
      s"expected a flattened full generation, got $layers")
  }

  test("fuzz: random append/compact/vacuum sequences keep IVF probes " +
      "row-identical to a fresh full build over the accumulated corpus") {
    val rnd = new scala.util.Random(13)
    val path = tmp("layers-fuzz")
    val base = vecs(1 to 160)
    val seeds = base.filter(col("vec_id") < 4)
    Similarity.writeIvfIndex(base, col("vec_id"), col("embedding"),
      seeds, col("vec_id"), col("embedding"), path)
    var corpus = base
    var next = 1000L
    val q = vecs(5 to 8)
    (1 to 8).foreach { step =>
      rnd.nextInt(3) match {
        case 0 =>
          val slice = vecs(1 to 160)
            .filter(col("vec_id") % 4 === rnd.nextInt(4).toLong)
            .select((col("vec_id") + next).as("vec_id"), col("embedding"))
          Similarity.appendIvfIndex(slice, col("vec_id"), col("embedding"),
            path)
          corpus = corpus.unionByName(slice)
          next += 1000
        case 1 => Similarity.compactIvfIndex(spark, path)
        case _ => Similarity.vacuumIvfIndex(spark, path); ()
      }
      // the maintained (possibly layered) index must answer exactly as a
      // FRESH build over everything appended so far
      val fresh = tmp(s"layers-fuzz-ref$step")
      Similarity.writeIvfIndex(corpus, col("vec_id"), col("embedding"),
        seeds, col("vec_id"), col("embedding"), fresh)
      val got = Similarity.ivfTopKIndexed(spark, path, q,
        col("vec_id"), col("embedding"), k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rn")).collect().toSeq
      val want = Similarity.ivfTopKIndexed(spark, fresh, q,
        col("vec_id"), col("embedding"), k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rn")).collect().toSeq
      assert(got == want, s"divergence after step $step " +
        s"(chain ${Similarity.assignLayers(spark, path).size} layers)")
    }
  }

  test("fuzz: random append/compact/vacuum sequences keep BM25 rankings " +
      "row-identical to a fresh full build") {
    val rnd = new scala.util.Random(29)
    val path = tmp("layers-fuzz-bm25")
    val base = docs(1 to 100)
    Retrieval.writeBm25Index(base, col("doc_id"), col("text"), path, 8)
    var corpus = base
    var next = 1000L
    (1 to 8).foreach { step =>
      rnd.nextInt(3) match {
        case 0 =>
          val lo = rnd.nextInt(80) + 1
          val slice = docs(lo to lo + 19)
            .select((col("doc_id") + next).as("doc_id"), col("text"))
          Retrieval.appendBm25Index(slice, col("doc_id"), col("text"), path)
          corpus = corpus.unionByName(slice)
          next += 1000
        case 1 => Retrieval.compactBm25Index(spark, path); ()
        case _ => Retrieval.vacuumBm25Index(spark, path); ()
      }
      val fresh = tmp(s"layers-fuzz-bm25-ref$step")
      Retrieval.writeBm25Index(corpus, col("doc_id"), col("text"), fresh, 8)
      val got = Retrieval.searchBm25Index(spark, path,
        Seq("alpha", "beta"), 30).collect().toSeq
      val want = Retrieval.searchBm25Index(spark, fresh,
        Seq("alpha", "beta"), 30).collect().toSeq
      assert(got == want, s"divergence after step $step")
    }
  }

  test("layered probes still PRUNE: every file scan of a 2-layer chain " +
      "reads only the probed cell directories") {
    val path = tmp("layers-prune")
    val base = vecs(1 to 200)
    Similarity.writeIvfIndex(base, col("vec_id"), col("embedding"),
      base.filter(col("vec_id") < 4), col("vec_id"), col("embedding"), path)
    Similarity.compactIvfIndex(spark, path)
    Similarity.appendIvfIndex(
      vecs(1 to 200).filter(col("vec_id") % 4 === 1)
        .select((col("vec_id") + 1000).as("vec_id"), col("embedding")),
      col("vec_id"), col("embedding"), path)
    Similarity.compactIvfIndex(spark, path)
    assert(Similarity.assignLayers(spark, path).size == 2)
    val q = vecs(5 to 6)
    val probe = Similarity.ivfTopKIndexed(spark, path, q,
      col("vec_id"), col("embedding"), k = 5, nprobe = 1)
    probe.collect()
    val scans = collectWithSubqueries(probe.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // the probed cells are driver-known; the isin must push through the
    // chain union into each layer's partition filters, so the assign
    // scans together read no more files than live in the probed cells
    val assignScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("/assign")))
    assert(assignScans.nonEmpty)
    assert(assignScans.forall(
      _.metadata("PartitionFilters").contains("cell")),
      "every layer scan must carry a cell partition filter")
    val probedFiles = IndexLayers.fileCounts(fs(path),
      Similarity.assignLayers(spark, path), "cell")
    val filesRead = assignScans.map(_.metrics("numFiles").value).sum
    // 2 queries x nprobe=1 -> at most 2 distinct probed cells
    val worstCase = probedFiles.values.toSeq.sorted.reverse.take(2).sum
    assert(filesRead <= worstCase,
      s"layered probe read $filesRead files (> $worstCase) — pruning lost")
  }
}
