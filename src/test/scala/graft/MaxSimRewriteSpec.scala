package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KernelAggs, Kernels, Functions => F}
import graft.operators.Similarity
import graft.plans.MaxSimIndex

/** Declarative multi-vector MaxSim ([[graft.plans.MaxSimRewrite]],
  * VERDICT r15 #4/#5): `groupBy(doc).agg(maxsim_q6(vec, bag)) ORDER BY
  * score DESC LIMIT k` over a registered token corpus is answered by the
  * two-stage probe + candidate rerank; covered doc predicates ride the
  * probe (filter-then-top-k within candidates); every unsupported shape
  * keeps the brute scan. */
class MaxSimRewriteSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val dim = 8
  private val k = 5
  private val nprobe = 2
  private val tokK = 6

  // 60 docs × 4 tokens, deterministic spread; token id = global row id
  private lazy val (corpusPath, idxPath) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-maxsimrw").toString
    val cp = dir + "/toks"
    (0 until 240).map { i =>
      (i.toLong / 4, i.toLong,
        (0 until dim).map(j => math.sin(i * 0.37 + j * 1.13) * 0.9))
    }.toDF("doc", "tok", "embedding")
      .repartition(3).write.parquet(cp)
    val t = spark.read.parquet(cp)
    Similarity.writeIvfIndex(t, col("tok"), col("embedding"),
      t.filter(col("tok") < 6), col("tok"), col("embedding"),
      dir + "/idx")
    MaxSimIndex.register(spark, cp, dir + "/idx",
      docCol = "doc", tokCol = "tok", vecCol = "embedding",
      nprobe = nprobe, tokK = tokK)
    (cp, dir + "/idx")
  }

  private def reRegister(): Unit =
    MaxSimIndex.register(spark, corpusPath, idxPath,
      "doc", "tok", "embedding", nprobe = nprobe, tokK = tokK)

  // constant query bag: 3 tokens, pre-quantized like a caller would ship
  private lazy val bag: Seq[Seq[Long]] = (0 until 3).map { t =>
    (0 until dim).map(j => math.cos(t * 1.91 + j * 0.71) * 0.8)
      .map(x => math.floor(x * 1000 + 0.5).toLong)
  }

  private def declarative(scale: Int = 1000): DataFrame =
    spark.read.parquet(corpusPath)
      .groupBy(col("doc"))
      .agg(KernelAggs.maxsim_q6(
        F.vec_quantize(col("embedding"), scale),
        typedlit(bag)).as("score_micros"))
      .orderBy(col("score_micros").desc, col("doc"))
      .limit(k)

  private def scanRoots(df: DataFrame): Seq[String] = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
  }

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** The two-stage expectation, assembled independently of the rule AND
    * of maxSimServeConstQ: hand centroid probe → assign-lake window →
    * candidate docs → relational rerank (max per (doc, qtok), micro
    * rounding, sum). */
  private def expectedServe(
      pred: Long => Boolean = _ => true): Seq[(Long, Long)] = {
    val cents = Similarity.readCentroids(spark, idxPath)
    val qArr = bag.map(_.toArray).toArray
    val perTok = qArr.toSeq.zipWithIndex.flatMap { case (qv, j) =>
      val cells = cents
        .map { case (cid, c) => (cid, Kernels.cosineQ6Arrays(qv, c)) }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(nprobe).map(_._1)
      spark.read.parquet(s"$idxPath/assign")
        .filter(col("cell").isin(cells.map(Int.box).toSeq: _*))
        .select(col("neighbor_id"),
          F.vec_cosine_q6(col("cv"), typedlit(qv.toSeq)).as("cos"))
        .orderBy(col("cos").desc, col("neighbor_id"))
        .limit(tokK)
        .collect().map(_.getLong(0)).toSeq
    }.distinct
    val candDocs = spark.read.parquet(corpusPath)
      .filter(col("tok").isin(perTok.map(Long.box): _*))
      .select(col("doc")).distinct().collect().map(_.getLong(0))
      .filter(pred).toSet
    val toks = spark.read.parquet(corpusPath)
      .filter(col("doc").isin(candDocs.toSeq.map(Long.box): _*))
      .select(col("doc"),
        F.vec_quantize(col("embedding"), 1000).as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    candDocs.toSeq.map { d =>
      val dToks = toks.filter(_._1 == d).map(_._2)
      val score = bag.map { qv =>
        dToks.map(cv => math.floor(
          Kernels.cosineQ6Arrays(cv, qv.toArray) * 1000000.0 + 0.5).toLong)
          .max
      }.sum
      (d, score)
    }.sortBy { case (d, s) => (-s, d) }.take(k)
  }

  test("the aggregate alone reproduces the brute maxSimTopK scores") {
    MaxSimIndex.unregister(corpusPath)
    try {
      // brute declarative over ALL docs (no limit pruning of scores)
      val agg = spark.read.parquet(corpusPath)
        .groupBy(col("doc"))
        .agg(KernelAggs.maxsim_q6(
          F.vec_quantize(col("embedding"), 1000),
          typedlit(bag)).as("score_micros"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // operator-path scores via maxSimTopK with a sentinel query doc
      val qdf = bag.zipWithIndex
        .map { case (qv, j) =>
          (9999L, j.toLong, qv.map(_.toDouble / 1000.0)) }
        .toDF("qdoc", "qtok", "qvec")
      val op = Similarity.maxSimTopK(
        spark.read.parquet(corpusPath), col("doc"), col("embedding"),
        qdf, col("qdoc"), col("qtok"), col("qvec"), k = 60)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(agg.size == 60)
      op.foreach { case (d, s) =>
        assert(agg(d) == s, s"doc $d: agg ${agg(d)} vs operator $s")
      }
    } finally reRegister()
  }

  test("declarative MaxSim answers from the index probe (two-stage)") {
    val df = declarative()
    val got = rows(df)
    val roots = scanRoots(df)
    assert(roots.exists(_.contains("/idx")),
      s"no index probe in the plan: $roots")
    assert(got === expectedServe())
    assert(got.size === k)
  }

  test("every served score is the doc's TRUE brute score " +
      "(set approximate, values exact)") {
    val served = rows(declarative())
    MaxSimIndex.unregister(corpusPath)
    val bruteAll =
      try spark.read.parquet(corpusPath)
        .groupBy(col("doc"))
        .agg(KernelAggs.maxsim_q6(
          F.vec_quantize(col("embedding"), 1000),
          typedlit(bag)).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally reRegister()
    served.foreach { case (d, s) => assert(bruteAll(d) == s) }
  }

  test("filtered MaxSim rides the probe: filter-then-top-k within " +
      "candidates, not post-top-k (VERDICT r15 #5)") {
    val df = spark.read.parquet(corpusPath)
      .filter(col("doc") % 2 === 1)
      .groupBy(col("doc"))
      .agg(KernelAggs.maxsim_q6(
        F.vec_quantize(col("embedding"), 1000),
        typedlit(bag)).as("score_micros"))
      .orderBy(col("score_micros").desc, col("doc"))
      .limit(k)
    val got = rows(df)
    assert(scanRoots(df).exists(_.contains("/idx")),
      "the filtered shape must still probe the index")
    val rideTheProbe = expectedServe(_ % 2 == 1)
    val postFilter = expectedServe().filter(_._1 % 2 == 1)
    assert(rideTheProbe != postFilter,
      "fixture too weak: the two filter semantics coincide here")
    assert(got === rideTheProbe)
  }

  test("a filter above the aggregate (on the score) is admitted") {
    val cut = expectedServe().map(_._2).apply(1) // 2nd best score
    val df = spark.read.parquet(corpusPath)
      .groupBy(col("doc"))
      .agg(KernelAggs.maxsim_q6(
        F.vec_quantize(col("embedding"), 1000),
        typedlit(bag)).as("score_micros"))
      .filter(col("score_micros") >= cut)
      .orderBy(col("score_micros").desc, col("doc"))
      .limit(k)
    val got = rows(df)
    assert(scanRoots(df).exists(_.contains("/idx")))
    assert(got === expectedServe().filter(_._2 >= cut))
  }

  test("the SQL spelling (graft_maxsim_q6) rewrites too") {
    spark.read.parquet(corpusPath).createOrReplaceTempView("msrw_toks")
    val bagSql = bag.map(_.mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val df = spark.sql(s"""
      SELECT doc, graft_maxsim_q6(
          graft_vec_quantize(embedding, 1000), $bagSql) AS score_micros
      FROM msrw_toks GROUP BY doc
      ORDER BY score_micros DESC, doc LIMIT $k""")
    val got = rows(df)
    assert(scanRoots(df).exists(_.contains("/idx")),
      "SQL shape must hit the same rewrite")
    assert(got === expectedServe())
  }

  test("unregistered corpus keeps the brute scan") {
    MaxSimIndex.unregister(corpusPath)
    try {
      val df = declarative()
      assert(scanRoots(df).forall(_.contains("/toks")),
        "without a registration the plan must stay the corpus scan")
    } finally reRegister()
  }

  test("bails: wrong quantization scale (shared behavioral gate)") {
    val df = declarative(scale = 100)
    assert(scanRoots(df).forall(_.contains("/toks")))
  }

  test("bails: a filter on the vector column keeps the scan") {
    val df = spark.read.parquet(corpusPath)
      .filter(size(col("embedding")) === dim)
      .groupBy(col("doc"))
      .agg(KernelAggs.maxsim_q6(
        F.vec_quantize(col("embedding"), 1000),
        typedlit(bag)).as("score_micros"))
      .orderBy(col("score_micros").desc, col("doc"))
      .limit(k)
    assert(scanRoots(df).forall(_.contains("/toks")))
  }

  test("bails: wrong sort direction keeps the scan") {
    val df = spark.read.parquet(corpusPath)
      .groupBy(col("doc"))
      .agg(KernelAggs.maxsim_q6(
        F.vec_quantize(col("embedding"), 1000),
        typedlit(bag)).as("score_micros"))
      .orderBy(col("score_micros").asc, col("doc"))
      .limit(k)
    assert(scanRoots(df).forall(_.contains("/toks")))
  }

  test("cosine-sq8 token index (ColBERTv2-style compressed stage-1): the " +
      "rewrite serves from codes, reranks raw, scores stay TRUE") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-maxsim-sq8").toString
    val cp = dir + "/toks"
    spark.read.parquet(corpusPath).write.parquet(cp)
    val t = spark.read.parquet(cp)
    Similarity.writeIvfIndexSq8Cos(t, col("tok"), col("embedding"),
      t.filter(col("tok") < 6), col("tok"), col("embedding"), dir + "/idx")
    MaxSimIndex.register(spark, cp, dir + "/idx",
      "doc", "tok", "embedding", nprobe = nprobe, tokK = tokK)
    try {
      val df = spark.read.parquet(cp)
        .groupBy(col("doc"))
        .agg(KernelAggs.maxsim_q6(
          F.vec_quantize(col("embedding"), 1000),
          typedlit(bag)).as("score_micros"))
        .orderBy(col("score_micros").desc, col("doc"))
        .limit(k)
      val got = rows(df)
      assert(scanRoots(df).exists(_.contains("/idx")),
        "the sq8 registration must be served from the index")
      // stage-1 expectation: reconstruct codes, cosine-rank per token,
      // candidates, then TRUE raw-vector rerank — the serving contract
      val cents = Similarity.readCentroids(spark, dir + "/idx")
      val boundsRow = spark.read.parquet(dir + "/idx/sq8_bounds").head()
      val (mn, mx) = (boundsRow.getSeq[Long](0), boundsRow.getSeq[Long](1))
      val qArr = bag.map(_.toArray).toArray
      val perTok = qArr.toSeq.flatMap { qv =>
        val cells = cents
          .map { case (cid, c) => (cid, Kernels.cosineQ6Arrays(qv, c)) }
          .sortBy { case (cid, cos) => (-cos, cid) }.take(nprobe).map(_._1)
        spark.read.parquet(dir + "/idx/assign")
          .filter(col("cell").isin(cells.map(Int.box).toSeq: _*))
          .select(col("neighbor_id"),
            F.vec_cosine_q6(F.vec_sq8_recon(col("codes"),
              typedlit(mn), typedlit(mx)), typedlit(qv.toSeq)).as("cos"))
          .orderBy(col("cos").desc, col("neighbor_id"))
          .limit(tokK)
          .collect().map(_.getLong(0)).toSeq
      }.distinct
      val candDocs = spark.read.parquet(cp)
        .filter(col("tok").isin(perTok.map(Long.box): _*))
        .select(col("doc")).distinct().collect().map(_.getLong(0)).toSet
      val bruteAll = spark.read.parquet(cp)
        .groupBy(col("doc"))
        .agg(KernelAggs.maxsim_q6(
          F.vec_quantize(col("embedding"), 1000),
          typedlit(bag)).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = candDocs.toSeq.map(d => (d, bruteAll(d)))
        .sortBy { case (d, s) => (-s, d) }.take(k)
      assert(got === expected)
      // every served score is the doc's TRUE brute score — quantization
      // affects WHICH docs are candidates, never their scores
      got.foreach { case (d, s) => assert(bruteAll(d) == s) }
    } finally MaxSimIndex.unregister(cp)
  }

  test("autoRefresh: streamed token-index ingest re-arms the registration " +
      "and the rewrite serves the ingested document") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-maxsim-auto").toString
    val cp = s"$base/toks"; val idx = s"$base/idx"; val ckpt = s"$base/ckpt"
    (0 until 80).map { i =>
      (i.toLong / 4, i.toLong,
        (0 until dim).map(j => math.sin(i * 0.37 + j * 1.13) * 0.9))
    }.toDF("doc", "tok", "embedding").write.parquet(cp)
    val t0 = spark.read.parquet(cp)
    Similarity.writeIvfIndex(t0, col("tok"), col("embedding"),
      t0.filter(col("tok") < 6), col("tok"), col("embedding"), idx)
    MaxSimIndex.register(spark, cp, idx, "doc", "tok", "embedding",
      nprobe = 6, tokK = 8, autoRefresh = true)
    try {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Seq[Double])]
      val sq = mem.toDS().toDF("doc", "tok", "embedding").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, bid: Long) =>
          val batch = b.cache()
          batch.write.mode("append").parquet(cp)
          Similarity.ingestBatchIvf(batch, col("tok"),
            col("embedding"), idx, bid)
          batch.unpersist(); ()
        }.start()
      try {
        // the ingested doc 500's tokens ARE the bag → per-token cos 1.0,
        // the global best MaxSim score
        mem.addData(bag.zipWithIndex.map { case (qv, j) =>
          (500L, 900L + j, qv.map(_.toDouble / 1000.0))
        })
        sq.processAllAvailable()
      } finally sq.stop()
      // NO manual MaxSimIndex.refresh — onIndexAdvanced re-armed it
      val df = spark.read.parquet(cp)
        .groupBy(col("doc"))
        .agg(KernelAggs.maxsim_q6(
          F.vec_quantize(col("embedding"), 1000),
          typedlit(bag)).as("score_micros"))
        .orderBy(col("score_micros").desc, col("doc"))
        .limit(1)
      val top = rows(df)
      assert(scanRoots(df).exists(_.contains("/idx")),
        "auto-refreshed registration must still probe the index")
      assert(top.head._1 == 500L,
        s"the ingested best-match doc must surface: $top")
    } finally MaxSimIndex.unregister(cp)
  }

  test("bails: stale corpus (freshness guard)") {
    // a dedicated corpus copy, so the append can't leak into other lanes
    val cp2 = java.nio.file.Files
      .createTempDirectory("graft-maxsimrw-stale").toString + "/toks"
    spark.read.parquet(corpusPath).write.parquet(cp2)
    MaxSimIndex.register(spark, cp2, idxPath,
      "doc", "tok", "embedding", nprobe = nprobe, tokK = tokK)
    try {
      Seq((60L, 240L, (0 until dim).map(_ => 0.1)))
        .toDF("doc", "tok", "embedding")
        .write.mode("append").parquet(cp2)
      val df = spark.read.parquet(cp2)
        .groupBy(col("doc"))
        .agg(KernelAggs.maxsim_q6(
          F.vec_quantize(col("embedding"), 1000),
          typedlit(bag)).as("score_micros"))
        .orderBy(col("score_micros").desc, col("doc"))
        .limit(k)
      assert(scanRoots(df).forall(_.contains("/toks")),
        "a stale corpus must never be served from the index")
    } finally MaxSimIndex.unregister(cp2)
  }
}
