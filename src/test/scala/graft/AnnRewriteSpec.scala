package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Kernels, Functions => F}
import graft.operators.Similarity
import graft.plans.AnnIndex

/** Declarative ANN rewriting ([[graft.plans.AnnRewrite]]): `ORDER BY
  * cosine DESC LIMIT k` over a corpus with a registered IVF index is
  * answered from the cell-pruned index probe; every unsupported or
  * unverifiable shape keeps the exact scan. */
class AnnRewriteSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val dim = 8
  private val k = 10

  // deterministic spread-out corpus: 240 rows, 8 dims
  private lazy val (corpusPath, idxPath) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annrw").toString
    val cp = dir + "/emb"
    (0 until 240).map { i =>
      (i.toLong,
        (0 until dim).map(j => math.sin(i * 0.37 + j * 1.13) * 0.9))
    }.toDF("vec_id", "embedding")
      .repartition(3).write.parquet(cp)
    val emb = spark.read.parquet(cp)
    Similarity.writeIvfIndex(emb, col("vec_id"), col("embedding"),
      emb.filter(col("vec_id") < 6), col("vec_id"), col("embedding"),
      dir + "/idx")
    AnnIndex.register(spark, cp, dir + "/idx",
      idCol = "vec_id", vecCol = "embedding", nprobe = 2)
    (cp, dir + "/idx")
  }

  // fixed query vector, pre-quantized (what a caller ships to the engine)
  private lazy val qv: Array[Long] =
    Array.tabulate(dim)(j => math.cos(j * 0.71) * 0.8)
      .map(x => math.floor(x * 1000 + 0.5).toLong)

  private def declarative(scale: Int = 1000): DataFrame =
    spark.read.parquet(corpusPath)
      .select(col("vec_id"),
        F.vec_cosine_q6(F.vec_quantize(col("embedding"), scale),
          typedlit(qv.toSeq)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
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

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("declarative top-k answers from the index probe, not the corpus") {
    val df = declarative()
    val got = rows(df)
    val roots = scanRoots(df)
    assert(roots.nonEmpty && roots.forall(_.contains("/idx")),
      s"query still scans the corpus: $roots")

    // expected: the same probe assembled by hand through the operator API
    val cents = Similarity.readCentroids(spark, idxPath)
    val probed = cents
      .map { case (cid, c) => (cid, Kernels.cosineQ6Arrays(qv, c)) }
      .sortBy { case (cid, cos) => (-cos, cid) }.take(2).map(_._1)
    val expected = rows(spark.read.parquet(s"$idxPath/assign")
      .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
      .select(col("neighbor_id").as("vec_id"),
        F.vec_cosine_q6(col("cv"), typedlit(qv.toSeq)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id")).limit(k))
    assert(got === expected)
    assert(got.size === k)
  }

  test("the probe scans only the probed cell directories") {
    val df = declarative()
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan).head
    val cellDirs = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.values.getInt(0)).toSet
    assert(cellDirs.size <= 2, s"probed more than nprobe cells: $cellDirs")
  }

  test("unregistered corpus keeps the exact scan") {
    AnnIndex.unregister(corpusPath)
    try {
      val df = declarative()
      assert(scanRoots(df).forall(_.contains("/emb")))
    } finally AnnIndex.register(spark, corpusPath, idxPath,
      "vec_id", "embedding", nprobe = 2)
  }

  test("exact vs indexed: the rewrite is a declared approximation") {
    val approx = rows(declarative())
    AnnIndex.unregister(corpusPath)
    val exact =
      try rows(declarative())
      finally AnnIndex.register(spark, corpusPath, idxPath,
        "vec_id", "embedding", nprobe = 2)
    // every indexed answer is a true corpus row with its true cosine
    val exactAll = rows(spark.read.parquet(corpusPath)
      .select(col("vec_id"),
        F.vec_cosine_q6(F.vec_quantize(col("embedding"), 1000),
          typedlit(qv.toSeq)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id")).limit(240)).toMap
    approx.foreach { case (id, cos) => assert(exactAll(id) === cos) }
    assert(exact.size === k)
  }

  test("bails: wrong quantization scale (behavioral gate)") {
    val df = declarative(scale = 100)
    assert(scanRoots(df).forall(_.contains("/emb")),
      "a different quantization must keep the scan")
  }

  test("bails: extra projected column (index does not cover it)") {
    val df = spark.read.parquet(corpusPath)
      .select(col("vec_id"), col("embedding"),
        F.vec_cosine_q6(F.vec_quantize(col("embedding"), 1000),
          typedlit(qv.toSeq)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id")).limit(k)
    assert(scanRoots(df).forall(_.contains("/emb")))
  }

  test("filtered ANN: covered predicates ride the probe") {
    def filtered(probe: Boolean): Seq[(Long, Double)] = {
      if (!probe) AnnIndex.unregister(corpusPath)
      try {
        val df = spark.read.parquet(corpusPath)
          .filter(col("vec_id") % 3 === 0)
          .select(col("vec_id"),
            F.vec_cosine_q6(F.vec_quantize(col("embedding"), 1000),
              typedlit(qv.toSeq)).as("cosine"))
          .filter(col("cosine") > 0.0)
          .orderBy(col("cosine").desc, col("vec_id")).limit(k)
        val r = rows(df)
        val want = if (probe) "/idx" else "/emb"
        assert(scanRoots(df).forall(_.contains(want)))
        r
      } finally if (!probe) AnnIndex.register(spark, corpusPath, idxPath,
        "vec_id", "embedding", nprobe = 2)
    }
    val probed = filtered(probe = true)
    assert(probed.nonEmpty)
    probed.foreach { case (id, cos) =>
      assert(id % 3 == 0 && cos > 0.0, s"predicate violated: ($id, $cos)")
    }
    // probe answers are a filter of the probe universe: every id also
    // appears in the exact filtered ranking's candidate set
    val exact = filtered(probe = false).toMap
    probed.foreach { case (id, cos) => assert(exact.get(id).forall(_ == cos)) }
  }

  test("bails: a predicate on a column the index does not cover") {
    val df = spark.read.parquet(corpusPath)
      .filter(org.apache.spark.sql.functions.size(col("embedding")) > 0)
      .select(col("vec_id"),
        F.vec_cosine_q6(F.vec_quantize(col("embedding"), 1000),
          typedlit(qv.toSeq)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id")).limit(k)
    assert(scanRoots(df).forall(_.contains("/emb")))
  }

  test("bails: ascending cosine (nearest-by-distance is a different query)") {
    val df = spark.read.parquet(corpusPath)
      .select(col("vec_id"),
        F.vec_cosine_q6(F.vec_quantize(col("embedding"), 1000),
          typedlit(qv.toSeq)).as("cosine"))
      .orderBy(col("cosine").asc, col("vec_id")).limit(k)
    assert(scanRoots(df).forall(_.contains("/emb")))
  }

  test("freshness: a corpus append keeps the scan until refresh") {
    Seq((1000L, (0 until dim).map(_ => 0.5)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(corpusPath)
    try {
      val stale = declarative()
      assert(scanRoots(stale).forall(_.contains("/emb")),
        "stale index must not answer for a grown corpus")
      // catch the index up, re-assert coverage: the rewrite resumes
      val extra = spark.read.parquet(corpusPath)
        .filter(col("vec_id") === 1000L)
      Similarity.appendIvfIndex(extra, col("vec_id"), col("embedding"),
        idxPath)
      AnnIndex.refresh(spark, corpusPath)
      val freshDf = declarative()
      assert(scanRoots(freshDf).forall(_.contains("/idx")))
    } finally AnnIndex.refresh(spark, corpusPath)
  }

  test("autoRefresh: three streamed ingest batches, no manual refresh, " +
      "the rewrite still probes and serves the ingested rows") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-ann-auto").toString
    val cp = s"$base/emb"; val idx = s"$base/idx"; val ckpt = s"$base/ckpt"
    (0 until 20).map { i =>
      (i.toLong,
        (0 until dim).map(j => math.sin(i * 0.37 + j * 1.13) * 0.9))
    }.toDF("vec_id", "embedding").write.parquet(cp)
    val emb0 = spark.read.parquet(cp)
    Similarity.writeIvfIndex(emb0, col("vec_id"), col("embedding"),
      emb0.filter(col("vec_id") < 6), col("vec_id"), col("embedding"), idx)
    AnnIndex.register(spark, cp, idx, "vec_id", "embedding", nprobe = 6,
      autoRefresh = true)
    try {
      // one foreachBatch maintains corpus AND index (corpus first) — the
      // batch-synchronous contract autoRefresh declares
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val sq = mem.toDS().toDF("vec_id", "embedding").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, bid: Long) =>
          val batch = b.cache()
          batch.write.mode("append").parquet(cp)
          Similarity.ingestBatchIvf(batch, col("vec_id"),
            col("embedding"), idx, bid)
          batch.unpersist(); ()
        }.start()
      try {
        // batch 3 plants the global best match for qv
        Seq(100 until 110, 110 until 120, 120 until 121).zipWithIndex
          .foreach { case (r, bi) =>
            mem.addData(r.map { i =>
              val v =
                if (bi == 2) (0 until dim).map(j => qv(j).toDouble / 1000.0)
                else (0 until dim).map(j => math.sin(i * 0.37 + j * 1.13) * 0.9)
              (i.toLong, v)
            })
            sq.processAllAvailable()
          }
      } finally sq.stop()
      // NO manual AnnIndex.refresh — the fence advances re-armed it
      val df = spark.read.parquet(cp)
        .select(col("vec_id"),
          F.vec_cosine_q6(F.vec_quantize(col("embedding"), 1000),
            typedlit(qv.toSeq)).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(k)
      val roots = scanRoots(df)
      assert(roots.nonEmpty && roots.forall(_.contains("/idx")),
        s"auto-refreshed registration must still probe the index: $roots")
      assert(rows(df).head._1 === 120L,
        "the probe must serve the streamed-in best match")
    } finally AnnIndex.unregister(cp)
  }

  test("the pure-SQL spelling rewrites too (graft_* function surface)") {
    spark.read.parquet(corpusPath).createOrReplaceTempView("ann_corpus")
    val qlit = qv.mkString("array(", "L, ", "L)")
    val df = spark.sql(s"""
      SELECT vec_id,
             graft_cosine_q6(graft_vec_quantize(embedding, 1000),
                             $qlit) AS cosine
      FROM ann_corpus
      ORDER BY cosine DESC, vec_id LIMIT $k""")
    val got = rows(df)
    assert(scanRoots(df).forall(_.contains("/idx")),
      "SQL spelling must hit the index probe")
    assert(got === rows(declarative()),
      "SQL and DataFrame spellings must agree")
  }

  test("index compaction: pointer swap, identical answers, old dirs vacuum") {
    val before = rows(declarative())
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def files(dir: String): Int = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      var n = 0
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    val fragmented = files(s"$idxPath/assign")
    Similarity.compactIvfIndex(spark, idxPath)
    val active = Similarity.assignDir(spark, idxPath)
    assert(active.endsWith("assign-v1"), s"pointer not swapped: $active")
    assert(rows(declarative()) === before,
      "compaction must not change probe answers")
    assert(files(active) < fragmented,
      s"compaction did not reduce files: ${files(active)} vs $fragmented")
    // retired dirs removable once readers drain
    assert(Similarity.vacuumIvfIndex(spark, idxPath) === 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idxPath/assign")))
    assert(rows(declarative()) === before)
    // appends resolve the pointer and land in the ACTIVE directory
    val preAppend = files(active)
    Similarity.appendIvfIndex(
      spark.read.parquet(corpusPath).filter(col("vec_id") === 1000L),
      col("vec_id"), col("embedding"), idxPath)
    AnnIndex.refresh(spark, corpusPath)
    assert(files(active) > preAppend,
      "append must land in the active compacted directory")
    assert(rows(declarative()).size === k)
  }

  test("kill switch spark.graft.annRewrite=false keeps the scan") {
    spark.conf.set("spark.graft.annRewrite", "false")
    try {
      val df = declarative()
      assert(scanRoots(df).forall(_.contains("/emb")))
    } finally spark.conf.set("spark.graft.annRewrite", "true")
  }

  // ---- metric matrix (r12): L2 / inner-product indexes -------------------

  private lazy val (l2CorpusPath, l2IdxPath, ipCorpusPath, ipIdxPath) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annrw-metric").toString
    val cpL2 = dir + "/embl2"; val cpIp = dir + "/embip"
    val df = (0 until 240).map { i =>
      (i.toLong,
        (0 until dim).map(j => math.sin(i * 0.37 + j * 1.13) * 0.9))
    }.toDF("vec_id", "embedding")
    df.repartition(3).write.parquet(cpL2)
    df.repartition(3).write.parquet(cpIp)
    val embL2 = spark.read.parquet(cpL2)
    Similarity.writeIvfIndexL2(embL2, col("vec_id"), col("embedding"),
      embL2.filter(col("vec_id") < 6), col("vec_id"), col("embedding"),
      dir + "/idxl2")
    AnnIndex.register(spark, cpL2, dir + "/idxl2",
      idCol = "vec_id", vecCol = "embedding", nprobe = 2)
    val embIp = spark.read.parquet(cpIp)
    Similarity.writeIvfIndexIp(embIp, col("vec_id"), col("embedding"),
      embIp.filter(col("vec_id") < 6), col("vec_id"), col("embedding"),
      dir + "/idxip")
    AnnIndex.register(spark, cpIp, dir + "/idxip",
      idCol = "vec_id", vecCol = "embedding", nprobe = 2)
    (cpL2, dir + "/idxl2", cpIp, dir + "/idxip")
  }

  private def declarativeL2(cp: String): DataFrame =
    spark.read.parquet(cp)
      .select(col("vec_id"),
        F.vec_l2sq_long(F.vec_quantize(col("embedding"), 1000),
          typedlit(qv.toSeq)).as("l2sq"))
      .orderBy(col("l2sq").asc_nulls_last, col("vec_id"))
      .limit(k)

  private def declarativeIp(cp: String): DataFrame =
    spark.read.parquet(cp)
      .select(col("vec_id"),
        F.vec_dot_long(F.vec_quantize(col("embedding"), 1000),
          typedlit(qv.toSeq)).as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(k)

  private def longRows(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("L2: ORDER BY l2sq ASC answers from the L2 index probe") {
    val df = declarativeL2(l2CorpusPath)
    val got = longRows(df)
    val roots = scanRoots(df)
    assert(roots.nonEmpty && roots.forall(_.contains("/idxl2")),
      s"query still scans the corpus: $roots")
    val cents = Similarity.readCentroids(spark, l2IdxPath)
    val probed = cents
      .map { case (cid, c) => (cid, Kernels.l2sqArrays(qv, c)) }
      .sortBy { case (cid, d) => (d, cid) }.take(2).map(_._1)
    val expected = longRows(spark.read.parquet(s"$l2IdxPath/assign")
      .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
      .select(col("neighbor_id").as("vec_id"),
        F.vec_l2sq_long(col("cv"), typedlit(qv.toSeq)).as("l2sq"))
      .orderBy(col("l2sq").asc_nulls_last, col("vec_id")).limit(k))
    assert(got === expected)
  }

  test("IP: ORDER BY dot DESC answers from the IP index probe") {
    val df = declarativeIp(ipCorpusPath)
    val got = longRows(df)
    val roots = scanRoots(df)
    assert(roots.nonEmpty && roots.forall(_.contains("/idxip")),
      s"query still scans the corpus: $roots")
    val cents = Similarity.readCentroids(spark, ipIdxPath)
    val probed = cents
      .map { case (cid, c) => (cid, Kernels.dotArrays(qv, c)) }
      .sortBy { case (cid, d) => (-d, cid) }.take(2).map(_._1)
    val expected = longRows(spark.read.parquet(s"$ipIdxPath/assign")
      .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
      .select(col("neighbor_id").as("vec_id"),
        F.vec_dot_long(col("cv"), typedlit(qv.toSeq)).as("dot"))
      .orderBy(col("dot").desc, col("vec_id")).limit(k))
    assert(got === expected)
  }

  test("IVF,SQ8: ORDER BY l2sq ASC answers from the codes-only probe " +
      "(decode + ADC), not the corpus — and not the exact distances") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annrw-sq8").toString
    val cp = dir + "/emb"; val idx = dir + "/idxsq8"
    val df = (0 until 240).map { i =>
      (i.toLong,
        (0 until dim).map(j => math.sin(i * 0.37 + j * 1.13) * 0.9))
    }.toDF("vec_id", "embedding")
    df.repartition(3).write.parquet(cp)
    val emb = spark.read.parquet(cp)
    Similarity.writeIvfIndexSq8(emb, col("vec_id"), col("embedding"),
      emb.filter(col("vec_id") < 6), col("vec_id"), col("embedding"), idx)
    AnnIndex.register(spark, cp, idx,
      idCol = "vec_id", vecCol = "embedding", nprobe = 2)
    try {
      val q = declarativeL2(cp)
      val got = longRows(q)
      val roots = scanRoots(q)
      assert(roots.nonEmpty && roots.forall(_.contains("/idxsq8")),
        s"query still scans the corpus: $roots")
      // expected: decode the probed cells' CODES against the trained
      // bounds, rank by integer ADC l2²
      val cents = Similarity.readCentroids(spark, idx)
      val probed = cents
        .map { case (cid, c) => (cid, Kernels.l2sqArrays(qv, c)) }
        .sortBy { case (cid, d) => (d, cid) }.take(2).map(_._1)
      val (mn, mx) = Similarity.readSq8Bounds(spark, idx)
      val expected = longRows(spark.read.parquet(s"$idx/assign")
        .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
        .select(col("neighbor_id").as("vec_id"),
          F.vec_l2sq_long(F.vec_sq8_recon(col("codes"),
            typedlit(mn.toSeq), typedlit(mx.toSeq)),
            typedlit(qv.toSeq)).as("l2sq"))
        .orderBy(col("l2sq").asc_nulls_last, col("vec_id")).limit(k))
      assert(got === expected)
      // ... and the ADC distances differ from the exact ones, proving
      // the answer came through the quantized codes (kill switch off so
      // the control query really scans)
      spark.conf.set("spark.graft.annRewrite", "false")
      val exact = try longRows(emb
        .select(col("vec_id"),
          F.vec_l2sq_long(F.vec_quantize(col("embedding"), 1000),
            typedlit(qv.toSeq)).as("l2sq"))
        .orderBy(col("l2sq").asc_nulls_last, col("vec_id")).limit(k))
      finally spark.conf.set("spark.graft.annRewrite", "true")
      assert(got.map(_._2) != exact.map(_._2),
        "ADC distances should carry quantization error vs exact l2")
    } finally AnnIndex.unregister(cp)
  }

  test("IVF,SQ8 under COSINE (r16): ORDER BY cosine DESC answers from " +
      "the codes-only probe with reconstructed-vector scoring") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annrw-sq8cos").toString
    val cp = dir + "/emb"; val idx = dir + "/idxsq8c"
    (0 until 240).map { i =>
      (i.toLong,
        (0 until dim).map(j => math.sin(i * 0.37 + j * 1.13) * 0.9))
    }.toDF("vec_id", "embedding").repartition(3).write.parquet(cp)
    val emb = spark.read.parquet(cp)
    Similarity.writeIvfIndexSq8Cos(emb, col("vec_id"), col("embedding"),
      emb.filter(col("vec_id") < 6), col("vec_id"), col("embedding"), idx)
    AnnIndex.register(spark, cp, idx,
      idCol = "vec_id", vecCol = "embedding", nprobe = 2)
    try {
      val df = spark.read.parquet(cp)
        .select(col("vec_id"),
          F.vec_cosine_q6(F.vec_quantize(col("embedding"), 1000),
            typedlit(qv.toSeq)).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(k)
      val got = rows(df)
      val roots = scanRoots(df)
      assert(roots.nonEmpty && roots.forall(_.contains("/idxsq8c")),
        s"query still scans the corpus: $roots")
      // expected: cosine centroid probe (the cells were refined and
      // assigned under cosine), decode the probed cells' codes, rank by
      // cosine of the reconstruction
      val cents = Similarity.readCentroids(spark, idx)
      val probed = cents
        .map { case (cid, c) => (cid, Kernels.cosineQ6Arrays(qv, c)) }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(2).map(_._1)
      val (mn, mx) = Similarity.readSq8Bounds(spark, idx)
      val expected = rows(spark.read.parquet(s"$idx/assign")
        .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
        .select(col("neighbor_id").as("vec_id"),
          F.vec_cosine_q6(F.vec_sq8_recon(col("codes"),
            typedlit(mn.toSeq), typedlit(mx.toSeq)),
            typedlit(qv.toSeq)).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id")).limit(k))
      assert(got === expected)
      // the ADC cosines must carry quantization error vs the exact ones
      spark.conf.set("spark.graft.annRewrite", "false")
      val exact = try rows(emb
        .select(col("vec_id"),
          F.vec_cosine_q6(F.vec_quantize(col("embedding"), 1000),
            typedlit(qv.toSeq)).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id")).limit(k))
      finally spark.conf.set("spark.graft.annRewrite", "true")
      assert(got.map(_._2) != exact.map(_._2),
        "reconstructed cosines should differ from exact ones")
    } finally AnnIndex.unregister(cp)
  }

  test("cross-metric queries keep the scan (per-operator-class binding)") {
    // cosine query over the L2-registered corpus
    val cosOverL2 = spark.read.parquet(l2CorpusPath)
      .select(col("vec_id"),
        F.vec_cosine_q6(F.vec_quantize(col("embedding"), 1000),
          typedlit(qv.toSeq)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id")).limit(k)
    assert(scanRoots(cosOverL2).forall(_.contains("/embl2")))
    // l2 query over the cosine-registered corpus
    val l2OverCos = spark.read.parquet(corpusPath)
      .select(col("vec_id"),
        F.vec_l2sq_long(F.vec_quantize(col("embedding"), 1000),
          typedlit(qv.toSeq)).as("l2sq"))
      .orderBy(col("l2sq").asc_nulls_last, col("vec_id")).limit(k)
    assert(scanRoots(l2OverCos).forall(_.contains("/emb")))
  }

  test("L2 with plain .asc (NULLS FIRST) keeps the scan — an index " +
      "cannot surface null-vector rows the ordering puts first") {
    val df = spark.read.parquet(l2CorpusPath)
      .select(col("vec_id"),
        F.vec_l2sq_long(F.vec_quantize(col("embedding"), 1000),
          typedlit(qv.toSeq)).as("l2sq"))
      .orderBy(col("l2sq").asc, col("vec_id")).limit(k)
    assert(scanRoots(df).forall(_.contains("/embl2")))
  }

  test("filtered ANN works under the L2 metric too (covered predicates " +
      "ride the probe)") {
    val df = spark.read.parquet(l2CorpusPath)
      .filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"),
        F.vec_l2sq_long(F.vec_quantize(col("embedding"), 1000),
          typedlit(qv.toSeq)).as("l2sq"))
      .orderBy(col("l2sq").asc_nulls_last, col("vec_id"))
      .limit(k)
    val got = longRows(df)
    assert(scanRoots(df).forall(_.contains("/idxl2")),
      "covered id filter must not keep the scan")
    val cents = Similarity.readCentroids(spark, l2IdxPath)
    val probed = cents
      .map { case (cid, c) => (cid, Kernels.l2sqArrays(qv, c)) }
      .sortBy { case (cid, d) => (d, cid) }.take(2).map(_._1)
    val expected = longRows(spark.read.parquet(s"$l2IdxPath/assign")
      .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
      .filter(col("neighbor_id") % 3 === 0)
      .select(col("neighbor_id").as("vec_id"),
        F.vec_l2sq_long(col("cv"), typedlit(qv.toSeq)).as("l2sq"))
      .orderBy(col("l2sq").asc_nulls_last, col("vec_id")).limit(k))
    assert(got === expected)
  }

  test("append into an L2 index assigns under the L2 metric") {
    val extra = Seq((5000L,
      (0 until dim).map(j => math.sin(5000 * 0.37 + j * 1.13) * 0.9)))
      .toDF("vec_id", "embedding")
    Similarity.appendIvfIndex(extra, col("vec_id"), col("embedding"),
      l2IdxPath)
    val cents = Similarity.readCentroids(spark, l2IdxPath)
    val qvec = extra.select(F.vec_quantize(col("embedding"), 1000))
      .head.getSeq[Long](0).toArray
    val expectCell = cents
      .map { case (cid, c) => (cid, Kernels.l2sqArrays(qvec, c)) }
      .minBy { case (cid, d) => (d, cid) }._1
    val gotCell = spark.read.parquet(Similarity.assignDir(spark, l2IdxPath))
      .filter(col("neighbor_id") === 5000L).select("cell").head.getInt(0)
    assert(gotCell === expectCell,
      "an L2-index append must use l2 assignment, not cosine's")
  }
}
