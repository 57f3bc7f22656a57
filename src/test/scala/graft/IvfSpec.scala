package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Functions => F, KernelAggs}
import graft.operators.Similarity

/** VecMeanAgg (native TypedImperativeAggregate) and IVF ANN invariants. */
class IvfSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("vec_mean: exact element-wise mean, merge-order independent") {
    val df = Seq(
      (1, Array(2L, 4L, 6L)), (1, Array(4L, 6L, 8L)),
      (2, Array(10L, 0L, -10L))
    ).toDF("g", "v").repartition(8) // force partial buffers + merges
    val got = df.groupBy(col("g")).agg(KernelAggs.vec_mean(col("v")).as("m"))
      .orderBy(col("g")).collect()
    assert(got(0).getSeq[Double](1) == Seq(3.0, 5.0, 7.0))
    assert(got(1).getSeq[Double](1) == Seq(10.0, 0.0, -10.0))
  }

  test("vec_mean: empty-group null and q6 rounding of uneven division") {
    val df = Seq((1, Array(1L, 2L)), (1, Array(2L, 2L)), (1, Array(2L, 2L)))
      .toDF("g", "v")
    val m = df.groupBy(col("g")).agg(KernelAggs.vec_mean(col("v")).as("m"))
      .head().getSeq[Double](1)
    assert(m == Seq(1.666667, 2.0)) // floor(5/3*1e6+0.5)/1e6
  }

  test("ivf: each query's neighbors all come from the query's cell, ranked") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => ((i % 4) * 10 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(
      vecs, col("vec_id"), col("embedding"),
      vecs.filter(col("vec_id") < 2), col("vec_id"), col("embedding"),
      vecs.filter(col("vec_id") < 4), col("vec_id"), col("embedding"),
      k = 3).collect()
    assert(out.nonEmpty)
    // one cell per query; ranks contiguous from 1; no self matches
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.map(_.getInt(1)).distinct.length == 1)
      assert(rows.map(_.getInt(4)).sorted.toSeq == (1 to rows.length))
      assert(!rows.exists(_.getLong(2) == qid))
    }
    // cosines non-increasing within a query
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cos = rows.sortBy(_.getInt(4)).map(_.getDouble(3)).toSeq
      assert(cos == cos.sorted.reverse)
    }
  }

  test("ivf recall@10 vs brute force clears a floor on real embeddings") {
    // the approximate path must be APPROXIMATELY RIGHT, not merely fast:
    // measure recall@k against the exact scan on the real embeddings table
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val seeds = emb.filter(col("vec_id") % 37 === 0).limit(8)
    val k = 10
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1).map { case (q, ns) =>
          q -> ns.map(_._2).toSet
        }
    val exact = topSet(Similarity.bruteForceTopK(
      emb, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), k))
    def meanRecall(nprobe: Int, lloydIters: Int = 1): Double = {
      val approx = topSet(Similarity.ivfTopK(
        emb, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        seeds, col("vec_id"), col("embedding"), k, nprobe, lloydIters))
      val recalls = exact.map { case (q, ex) =>
        approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
      }
      recalls.sum / recalls.size
    }
    // single probe scans ~1/8 of the corpus; measured 0.345 on these
    // (weakly clustered) embeddings. nprobe is the recall/cost knob: 3
    // probes must clear a real floor AND beat 1 probe by a margin.
    val r1 = meanRecall(1)
    val r3 = meanRecall(3)
    val r3i3 = meanRecall(3, lloydIters = 3)
    info(s"mean recall@$k: nprobe=1 -> $r1, nprobe=3 -> $r3, " +
      s"nprobe=3 iters=3 -> $r3i3")
    assert(r1 >= 0.2, s"nprobe=1 recall@$k degraded to $r1")
    assert(r3 >= 0.6, s"nprobe=3 recall@$k degraded to $r3")
    assert(r3 > r1 + 0.1, s"multi-probe gained nothing: $r1 -> $r3")
    // iterating Lloyd trades ~0.01 recall for tighter cells on these
    // weakly-clustered embeddings (measured 0.63 -> 0.62); it must stay
    // within noise of the single step, never collapse
    assert(r3i3 >= r3 - 0.05,
      s"lloydIters=3 recall collapsed: $r3 -> $r3i3")
  }

  test("multi-iteration Lloyd balances cells without losing recall") {
    // what extra Lloyd steps BUY at scale is balance: the largest cell
    // bounds the worst probe cost and the biggest join task. Measure the
    // cell-size distribution per iteration count on the real embeddings.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seeds = emb.filter(col("vec_id") % 37 === 0).limit(8)
    val c = emb.select(col("vec_id").as("neighbor_id"),
      graft.functions.Functions.vec_quantize(col("embedding"), 1000).as("cv"))
    def cellSizes(iters: Int): Seq[Long] = {
      val cents = Similarity.ivfCentroids(
        c, seeds, col("vec_id"), col("embedding"), iters)
      c.withColumn("cell", Similarity.assignCell(spark, cents)(col("cv")))
        .groupBy("cell").count().as[(Int, Long)].collect().map(_._2).toSeq
    }
    def imbalance(s: Seq[Long]): Double = s.max.toDouble * s.size / s.sum
    val s1 = cellSizes(1)
    val s3 = cellSizes(3)
    info(s"cell sizes iters=1: ${s1.sorted.mkString(",")} " +
      s"(imbalance ${imbalance(s1)})")
    info(s"cell sizes iters=3: ${s3.sorted.mkString(",")} " +
      s"(imbalance ${imbalance(s3)})")
    assert(s1.sum == s3.sum, "iterating must not drop corpus rows")
    // measured 1.216 -> 1.136 max/mean on these embeddings: the refined
    // layout must never be WORSE-balanced than the single step by more
    // than noise — the largest cell is the worst probe/task at scale
    assert(imbalance(s3) <= imbalance(s1) + 0.05,
      s"lloydIters=3 degraded balance: ${imbalance(s1)} -> ${imbalance(s3)}")
  }

  test("vec_mean via SQL registration") {
    GraftExtensions.register(spark)
    Seq((1, Array(2L, 4L)), (1, Array(4L, 8L))).toDF("g", "v")
      .createOrReplaceTempView("ivf_probe")
    val m = spark.sql("SELECT graft_vec_mean(v) AS m FROM ivf_probe GROUP BY g")
      .head().getSeq[Double](0)
    assert(m == Seq(3.0, 6.0))
  }

  test("L2 IVF: full probe (nprobe = nlist) equals brute-force L2 " +
      "exactly; partial probe stays within its cells") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d =>
        ((i * 37 + d * 11) % 100).toFloat / 10f - 5f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val seeds = vecs.filter(col("vec_id") < 6)
    // nprobe = nlist: every cell probed -> candidate set is the whole
    // corpus, so the ranking must equal the exact brute-force lane
    val full = Similarity.ivfL2TopK(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        seeds, col("vec_id"), col("embedding"), k = 5, nprobe = 6)
      .select("query_id", "neighbor_id", "l2sq", "rn")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val brute = Similarity.l2TopK(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(full == brute, "full-probe IVF-L2 must equal brute-force L2")

    // partial probe: every returned neighbor sits in one of the query's
    // nprobe nearest cells (candidates never leak across cells)
    val part = Similarity.ivfL2TopK(vecs, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"),
      seeds, col("vec_id"), col("embedding"), k = 5, nprobe = 2)
    val cells = part.select("query_id", "cell").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).toSet)
    cells.foreach { case (_, cs) => assert(cs.size <= 2) }
  }

  test("range search: l2Range matches a naive recount, nests by radius, " +
      "and excludes self") {
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 13 + d * 7) % 40).toFloat / 4f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    // naive recount on quantized integers (same ×1000 floor rule)
    val qz = vecs.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1)
        .map(f => math.floor(f.toDouble * 1000 + 0.5).toLong).toArray
    }.toMap
    def naive(r2: Long): Set[(Long, Long, Long)] =
      (for {
        q <- 0L until 4L; n <- qz.keys if n != q
        d = qz(n).zip(qz(q)).map { case (a, b) => (a - b) * (a - b) }.sum
        if d <= r2
      } yield (q, n, d)).toSet
    def got(r2: Long): Set[(Long, Long, Long)] =
      Similarity.l2Range(vecs, col("vec_id"), col("embedding"),
          queries, col("vec_id"), col("embedding"), r2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val small = got(300000L); val big = got(1200000L)
    assert(small == naive(300000L) && big == naive(1200000L))
    assert(small.nonEmpty && big.size > small.size,
      "fixture must make both radii informative")
    assert(small.subsetOf(big), "smaller radius must nest inside larger")
    assert(!big.exists(p => p._1 == p._2), "self-pairs excluded")
  }

  test("range search: full-probe ivfL2Range equals l2Range; partial " +
      "probe returns exactly the in-range candidates of probed cells") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d =>
        ((i * 37 + d * 11) % 100).toFloat / 10f - 5f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val seeds = vecs.filter(col("vec_id") < 6)
    val r2 = 2000000L
    val full = Similarity.ivfL2Range(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        seeds, col("vec_id"), col("embedding"), r2, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val brute = Similarity.l2Range(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), r2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == brute, "full-probe IVF range must equal brute range")
    assert(brute.nonEmpty)

    // partial probe: a subset of brute, in-range, and never from an
    // unprobed cell (replay the probe rule on the collected assignment)
    val part = Similarity.ivfL2Range(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        seeds, col("vec_id"), col("embedding"), r2, nprobe = 2)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(part.map(p => (p._1, p._3, p._4)).toSet.subsetOf(brute))
    assert(part.forall(_._4 <= r2))
    part.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).distinct.length <= 2) }
  }

  test("range search: cosineRange respects the threshold and matches " +
      "the q6-cosine recount") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d =>
        (if ((i + d) % 3 == 0) 1f else -1f) * ((d + 1).toFloat / 4f)))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val got = Similarity.cosineRange(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), minCos = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got.forall(_._3 >= 0.5))
    // recount via the exact kernel on one collected pair set
    val qz = vecs.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1)
        .map(f => math.floor(f.toDouble * 1000 + 0.5).toLong).toArray
    }.toMap
    val expect = (for {
      q <- 0L until 3L; n <- qz.keys if n != q
      c = graft.functions.Kernels.cosineQ6Arrays(qz(n), qz(q))
      if c >= 0.5
    } yield (q, n, c)).toSet
    assert(got.toSet == expect)
  }
}
