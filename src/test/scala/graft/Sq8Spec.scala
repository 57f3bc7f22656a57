package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Functions => F}
import graft.operators.Similarity

/** SQ8 scalar quantization (FAISS IndexScalarQuantizer QT_8bit):
  * integer-exact encode/reconstruct kernels, quantization error bounds,
  * the two-stage rerank lane, and recall on real embeddings. */
class Sq8Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def naiveEncode(v: Long, lo: Long, hi: Long): Long = {
    val vc = math.max(lo, math.min(hi, v))
    if (hi == lo) 0L
    else (2L * 255L * (vc - lo) + (hi - lo)) / (2L * (hi - lo))
  }
  private def naiveRecon(c: Long, lo: Long, hi: Long): Long =
    if (hi == lo) lo else lo + (2L * c * (hi - lo) + 255L) / 510L

  test("encode/recon match the per-element integer recount, including " +
      "clamping and a degenerate dimension") {
    // dim 0: normal range; dim 1: out-of-range values (clamp both ways);
    // dim 2: degenerate (mx == mn)
    val mn = Seq(-1000L, 0L, 7L); val mx = Seq(3000L, 100L, 7L)
    val vecs = Seq(
      Seq(-1000L, -50L, 7L), Seq(0L, 0L, 7L), Seq(1234L, 100L, 7L),
      Seq(3000L, 250L, 7L), Seq(2999L, 37L, 7L))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = df.select(col("id"),
        F.vec_sq8_encode(col("v"), typedlit(mn), typedlit(mx)).as("codes"))
      .withColumn("rv",
        F.vec_sq8_recon(col("codes"), typedlit(mn), typedlit(mx)))
      .orderBy("id").collect()
    got.zip(vecs).foreach { case (row, v) =>
      val codes = row.getSeq[Int](1); val rv = row.getSeq[Long](2)
      (0 until 3).foreach { i =>
        val c = naiveEncode(v(i), mn(i), mx(i))
        assert(codes(i).toLong == c, s"code mismatch dim $i of $v")
        assert(c >= 0 && c <= 255, "codes stay in the byte range")
        assert(rv(i) == naiveRecon(c, mn(i), mx(i)),
          s"recon mismatch dim $i of $v")
        // reconstruction error <= one quantization step (+1 integer slack)
        val vc = math.max(mn(i), math.min(mx(i), v(i)))
        assert(math.abs(rv(i) - vc) <= (mx(i) - mn(i)) / 255 + 1,
          s"recon error beyond a step at dim $i of $v")
      }
    }
  }

  test("re-encoding a reconstruction is stable (codes are a fixed point)") {
    val mn = Seq(-5000L, -5000L); val mx = Seq(5000L, 4000L)
    val df = (0L until 200L).map(i =>
        (i, Seq((i * 97 % 10000) - 5000L, (i * 61 % 9000) - 5000L)))
      .toDF("id", "v")
    val enc = df.select(col("id"),
      F.vec_sq8_encode(col("v"), typedlit(mn), typedlit(mx)).as("codes"))
    val twice = enc.withColumn("rv",
        F.vec_sq8_recon(col("codes"), typedlit(mn), typedlit(mx)))
      .withColumn("codes2",
        F.vec_sq8_encode(col("rv"), typedlit(mn), typedlit(mx)))
      .filter(col("codes") =!= col("codes2"))
    assert(twice.count() == 0, "encode ∘ recon must reproduce the codes")
  }

  test("SQL spellings round-trip through the registered functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_sq8_recon(
        |  graft_sq8_encode(array(250L, 777L), array(0L, 0L), array(1000L, 1000L)),
        |  array(0L, 0L), array(1000L, 1000L)) AS rv""".stripMargin).head()
    val rv = r.getSeq[Long](0)
    assert(rv == Seq(naiveRecon(naiveEncode(250, 0, 1000), 0, 1000),
      naiveRecon(naiveEncode(777, 0, 1000), 0, 1000)))
  }

  test("a full-coverage shortlist makes the rerank equal the exact lane") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 37 + d * 11) % 100).toFloat / 10f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    // k * mult = 40 >= corpus: shortlist covers everything, so the exact
    // rerank must reproduce brute-force L2 bit-for-bit
    val rr = Similarity.sq8RerankTopK(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5, mult = 8)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val brute = Similarity.l2TopK(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(rr == brute, "covered rerank must equal the exact lane")
  }

  test("persisted IVF,SQ8 index: codes only at rest, full probe equals " +
      "the one-shot SQ8 ranking, probes survive compaction byte-identically") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d =>
        ((i * 37 + d * 11) % 100).toFloat / 10f - 5f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft-sq8idx").toString + "/idx"
    Similarity.writeIvfIndexSq8(vecs, col("vec_id"), col("embedding"),
      vecs.filter(col("vec_id") < 6), col("vec_id"), col("embedding"), path)

    // the compression claim: the assignment lake holds codes, never a
    // raw vector column
    val fields = spark.read.parquet(s"$path/assign").schema.fieldNames.toSet
    assert(fields.contains("codes") && !fields.contains("cv"),
      s"assign lake must store codes only, got $fields")

    // nprobe = nlist: candidate set is the whole corpus, so the indexed
    // ADC ranking must equal the one-shot lane trained on the same bounds
    val (mn, mx) = Similarity.sq8Train(vecs, col("embedding"))
    val full = Similarity.ivfSq8TopKIndexed(spark, path, queries,
        col("vec_id"), col("embedding"), k = 5, nprobe = 6)
      .select("query_id", "neighbor_id", "adc_dist", "rn")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val oneShot = Similarity.sq8TopKWithBounds(vecs, col("vec_id"),
        col("embedding"), queries, col("vec_id"), col("embedding"), k = 5,
        mn, mx)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(full == oneShot, "full-probe IVF,SQ8 must equal one-shot SQ8")

    // maintenance is column-agnostic: compaction + vacuum leave the
    // partial probe byte-identical
    val before = Similarity.ivfSq8TopKIndexed(spark, path, queries,
      col("vec_id"), col("embedding"), k = 5, nprobe = 2)
      .collect().map(_.toSeq).toSeq
    Similarity.compactIvfIndex(spark, path)
    Similarity.vacuumIvfIndex(spark, path)
    val after = Similarity.ivfSq8TopKIndexed(spark, path, queries,
      col("vec_id"), col("embedding"), k = 5, nprobe = 2)
      .collect().map(_.toSeq).toSeq
    assert(before == after, "compaction must not move an SQ8 probe")
  }

  test("IVF,SQ8 append: batches encode against the TRAINED bounds (never " +
      "retrained), probes equal a one-shot scan under those bounds, and " +
      "the raw-vector append verb refuses the codes-only layout") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d =>
        ((i * 29 + d * 13) % 90).toFloat / 9f - 5f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val half = vecs.filter(col("vec_id") < 30)
    val path = java.nio.file.Files
      .createTempDirectory("graft-sq8app").toString + "/idx"
    Similarity.writeIvfIndexSq8(half, col("vec_id"), col("embedding"),
      half.filter(col("vec_id") < 6), col("vec_id"), col("embedding"), path)
    Similarity.appendIvfIndexSq8(vecs.filter(col("vec_id") >= 30),
      col("vec_id"), col("embedding"), path)
    // FAISS semantics: the appended rows quantize under the HALF-trained
    // bounds, so the reference is the one-shot lane under THOSE bounds
    val (mn, mx) = Similarity.readSq8Bounds(spark, path)
    val (mnH, mxH) = Similarity.sq8Train(half, col("embedding"))
    assert(mn.toSeq == mnH.toSeq && mx.toSeq == mxH.toSeq,
      "append must never retrain the bounds")
    val probed = Similarity.ivfSq8TopKIndexed(spark, path, queries,
        col("vec_id"), col("embedding"), k = 5, nprobe = 6)
      .select("query_id", "neighbor_id", "adc_dist", "rn")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val oneShot = Similarity.sq8TopKWithBounds(vecs, col("vec_id"),
        col("embedding"), queries, col("vec_id"), col("embedding"), k = 5,
        mn, mx)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(probed == oneShot,
      "appended index must rank like a one-shot scan under its bounds")

    // cross-verb misuse refuses loudly in BOTH directions — a raw-vector
    // row in a codes-only lake (or vice versa) would corrupt every probe
    val rawErr = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(vecs.filter(col("vec_id") >= 30),
        col("vec_id"), col("embedding"), path)
    }
    assert(rawErr.getMessage.contains("appendIvfIndexSq8"))
    val l2Path = java.nio.file.Files
      .createTempDirectory("graft-sq8app-l2").toString + "/idx"
    Similarity.writeIvfIndexL2(half, col("vec_id"), col("embedding"),
      half.filter(col("vec_id") < 6), col("vec_id"), col("embedding"),
      l2Path)
    val sq8Err = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndexSq8(vecs.filter(col("vec_id") >= 30),
        col("vec_id"), col("embedding"), l2Path)
    }
    assert(sq8Err.getMessage.contains("not an IVF,SQ8 index"))
  }

  test("IVF,SQ8 generation snapshots: pin -> append -> compact -> " +
      "restore answers for the pinned corpus; a rebuild refuses restore") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d =>
        ((i * 31 + d * 17) % 80).toFloat / 8f - 5f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val half = vecs.filter(col("vec_id") < 30)
    val path = java.nio.file.Files
      .createTempDirectory("graft-sq8snap").toString + "/idx"
    Similarity.writeIvfIndexSq8(half, col("vec_id"), col("embedding"),
      half.filter(col("vec_id") < 6), col("vec_id"), col("embedding"), path)
    val pinned = Similarity.ivfSq8TopKIndexed(spark, path, queries,
      col("vec_id"), col("embedding"), k = 5, nprobe = 6)
      .collect().map(_.toSeq).toSeq
    graft.operators.IndexSnapshots.snapshot(spark, path, "pin")
    Similarity.appendIvfIndexSq8(vecs.filter(col("vec_id") >= 30),
      col("vec_id"), col("embedding"), path)
    Similarity.compactIvfIndex(spark, path)
    graft.operators.IndexSnapshots.restore(spark, path, "pin")
    val restored = Similarity.ivfSq8TopKIndexed(spark, path, queries,
      col("vec_id"), col("embedding"), k = 5, nprobe = 6)
      .collect().map(_.toSeq).toSeq
    assert(restored == pinned,
      "restored IVF,SQ8 generation must answer for the pinned corpus")

    // a full rebuild changes centroids AND bounds — the pin is
    // meaningless against them and restore must refuse
    Similarity.writeIvfIndexSq8(vecs, col("vec_id"), col("embedding"),
      vecs.filter(col("vec_id") < 6), col("vec_id"), col("embedding"), path)
    val err = intercept[IllegalArgumentException] {
      graft.operators.IndexSnapshots.restore(spark, path, "pin")
    }
    assert(err.getMessage.contains("companion dir"),
      s"rebuild must refuse via the companion guard: ${err.getMessage}")
  }

  test("SQ8 recall@10 vs brute force on real embeddings clears a floor") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = sets(Similarity.l2TopK(emb, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), k = 10))
    val sq8 = sets(Similarity.sq8TopK(emb, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), k = 10))
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) & sq8.getOrElse(q, Set.empty)).size.toDouble / 10).sum /
      exact.size
    // 8-bit per-dim quantization is near-lossless on this value range;
    // anything under 0.9 means the integer contract broke, not the data
    assert(recall >= 0.9, s"SQ8 recall@10 $recall below floor")
  }
}
