package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{LakeDelete, MaterializedAgg}
import graft.sinks.MaterializedAgg.Spec

/** Incrementally-maintained aggregate view: batch merges must equal a full
  * recompute, and the batch-id FENCE must make every replay and crash
  * window exactly-once — the failure mode of an aggregate MV is silent
  * double-counting, so each injected crash here is followed by a replay
  * and an exact equality check against the one-copy truth. */
class MaterializedAggSpec extends AnyFunSuite with SparkSpec {

  private val spec = Spec(groupCols = Seq("g", "h"), sumCols = Seq("v"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/mv"

  /** Batch `i`: 300 rows over 12 (g, h) groups, h NULL on one lane. */
  private def batch(i: Int): DataFrame =
    spark.range(i * 300, (i + 1) * 300).select(
      concat(lit("g"), (col("id") % 4).cast("string")).as("g"),
      when(col("id") % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("h"), (col("id") % 3).cast("string"))).as("h"),
      (col("id") % 97).cast("long").as("v"))

  private def recompute(upTo: Int): Seq[(String, String, Long, Long)] =
    (0 to upTo).map(batch).reduce(_ union _)
      .groupBy("g", "h").agg(count(lit(1)).as("cnt"), sum("v").as("v_sum"))
      .collect().map(r => (r.getString(0), String.valueOf(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSeq.sortBy(t => (t._1, t._2))

  private def view(root: String): Seq[(String, String, Long, Long)] =
    MaterializedAgg.readView(spark, root, spec)
      .collect().map(r => (r.getString(0), String.valueOf(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSeq.sortBy(t => (t._1, t._2))

  test("batch merges equal a full recompute; replays are no-ops") {
    val root = tmp("mv-merge")
    assert(MaterializedAgg.mergeBatch(spark, root, batch(0), spec, 0L))
    assert(MaterializedAgg.mergeBatch(spark, root, batch(1), spec, 1L))
    assert(MaterializedAgg.mergeBatch(spark, root, batch(2), spec, 2L))
    assert(view(root) == recompute(2), "merged view != recompute")
    assert(MaterializedAgg.lastCommitted(spark, root).contains(2L))

    // replayed and stale ids do NOTHING — no read, no write, no count drift
    assert(!MaterializedAgg.mergeBatch(spark, root, batch(2), spec, 2L))
    assert(!MaterializedAgg.mergeBatch(spark, root, batch(1), spec, 1L))
    assert(view(root) == recompute(2), "replay double-counted")
  }

  test("min/max/approx-distinct columns merge exactly, replay included") {
    val root = tmp("mv-ext")
    val extSpec = Spec(groupCols = Seq("g"), sumCols = Seq("x"),
      minCols = Seq("x"), maxCols = Seq("x"), distinctCols = Seq("u"),
      hllM = 16)
    def data = spark.range(1200).select(
      concat(lit("g"), (col("id") % 5).cast("string")).as("g"),
      (col("id") * 13 % 1999).as("x"), (col("id") % 97).as("u"))
    for (i <- 0 until 3)
      MaterializedAgg.mergeBatch(spark, root,
        data.filter(col("id") % 3 === i), extSpec, i.toLong)
    // deliberate replay: register-wise max and min/max must not move
    MaterializedAgg.mergeBatch(spark, root,
      data.filter(col("id") % 3 === 1), extSpec, 1L)

    def canon(df: DataFrame) = df
      .select(col("g"), col("cnt"), col("x_sum"), col("x_min"),
        col("x_max"), col("u_hll"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getSeq[Long](5).toList))
      .toSeq.sortBy(_._1)
    val onePass = data.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("x").as("x_sum"),
        min("x").as("x_min"), max("x").as("x_max"),
        graft.functions.KernelAggs
          .hll_registers(col("u").cast("string"), 16).as("u_hll"))
    assert(canon(MaterializedAgg.readView(spark, root, extSpec)) ===
      canon(onePass),
      "incrementally-merged extrema/registers != one-pass aggregation")
    // the derived estimate is sane: 97 distinct u per group (every group
    // sees every residue at this size), HLL@16 within its error regime
    val ests = MaterializedAgg.readView(spark, root, extSpec)
      .select("u_distinct").collect().map(_.getLong(0))
    assert(ests.forall(e => e > 40 && e < 200), s"wild estimate: ${ests.toSeq}")
  }

  test("hllEstimate survives ranks 58-60 (hllM < 8) and deep-rank arrays") {
    // ADVICE r13: the 2^-r literal table stopped at r=57, but HllAgg's
    // rank = ntz(hash60/m)+1 reaches 58-60 when m < 8 — element_at past
    // the table end is a runtime error under ANSI / a silent NULL
    // estimate otherwise. Deep ranks are 2^-57-rare through real hashes,
    // so pin the estimator directly on literal register arrays.
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(StructField("regs",
      ArrayType(LongType, containsNull = false), nullable = false)))
    def est(m: Int, regs: Seq[Long]): Long =
      spark.createDataFrame(
          java.util.List.of(Row(regs)), schema)
        .select(MaterializedAgg.hllEstimate(col("regs"), m).as("e"))
        .head.getLong(0)
    assert(est(1, Seq(60L)) > 0L)
    assert(est(2, Seq(58L, 59L)) > 0L)
    assert(est(4, Seq(0L, 57L, 58L, 60L)) > 0L)
    // and the common regime is unchanged: all-zero registers estimate 0
    assert(est(4, Seq(0L, 0L, 0L, 0L)) === 0L)
  }

  test("multi-grain lattice: every grouping set equals its direct recompute") {
    val root = tmp("mv-lattice")
    val latSpec = Spec(groupCols = Seq("g", "h"), sumCols = Seq("v"),
      groupingSets = Seq(Seq("g", "h"), Seq("g"), Seq("h"), Nil))
    // h is NULL on one lane — the finest grain's genuinely-NULL h must
    // not collide with the by-g grain where h is aggregated away
    def data = spark.range(900).select(
      concat(lit("g"), (col("id") % 4).cast("string")).as("g"),
      when(col("id") % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("h"), (col("id") % 3).cast("string"))).as("h"),
      (col("id") % 97).cast("long").as("v"))
    for (i <- 0 until 3)
      MaterializedAgg.mergeBatch(spark, root,
        data.filter(col("id") % 3 === i), latSpec, i.toLong)
    MaterializedAgg.mergeBatch(spark, root,
      data.filter(col("id") % 3 === 1), latSpec, 1L) // replay no-op

    def canon(df: DataFrame, keys: Seq[String]): Set[Seq[Any]] =
      df.select((keys ++ Seq("cnt", "v_sum")).map(col): _*)
        .collect().map(_.toSeq.toVector.map(String.valueOf(_): Any)).toSet
    for (set <- latSpec.groupingSets) {
      val direct =
        if (set.isEmpty)
          data.agg(count(lit(1)).as("cnt"), sum("v").as("v_sum"))
        else data.groupBy(set.map(col): _*)
          .agg(count(lit(1)).as("cnt"), sum("v").as("v_sum"))
      assert(canon(MaterializedAgg.readGrain(spark, root, latSpec, set), set)
        === canon(direct, set), s"grain $set diverged")
    }
    // the stored lattice row count = sum of grain sizes, no cross-grain leak
    val view = MaterializedAgg.readView(spark, root, latSpec)
    assert(view.count() ===
      latSpec.groupingSets.map(s =>
        if (s.isEmpty) 1L
        else data.select(s.map(col): _*).distinct().count()).sum)
  }

  test("compactView: fewer files, same rows, fence intact, crash-safe") {
    val root = tmp("mv-compact")
    // DISJOINT key ranges per batch — the fragmenting workload: each
    // merge only ADDS files (no existing key is touched), so the view
    // accumulates one upsert file per merge
    val cSpec = Spec(groupCols = Seq("k"), sumCols = Seq("v"), files = 2)
    def cBatch(i: Int): DataFrame =
      spark.range(i * 50, (i + 1) * 50).select(
        concat(lit("k"), col("id").cast("string")).as("k"),
        (col("id") % 13).cast("long").as("v"))
    def cView: Seq[(String, Long, Long)] =
      MaterializedAgg.readView(spark, root, cSpec).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    def cRecompute(upTo: Int): Seq[(String, Long, Long)] =
      (0 to upTo).map(cBatch).reduce(_ union _)
        .groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("v_sum"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    def dataFiles(): Int = {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .count(st => st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
    }
    for (i <- 0 to 5)
      MaterializedAgg.mergeBatch(spark, root, cBatch(i), cSpec, i.toLong)
    val fragmented = dataFiles()
    assert(fragmented >= 5, s"fixture failed to fragment: $fragmented files")

    // crash INSIDE the commit window: journal published, not applied —
    // the next merge's recover() must complete the compaction first
    LakeDelete.journalPublishedHook.set(() =>
      throw new RuntimeException("crash: compaction committed, not applied"))
    intercept[RuntimeException] {
      MaterializedAgg.compactView(spark, root, cSpec)
    }
    LakeDelete.journalPublishedHook.set(() => ())
    assert(MaterializedAgg.mergeBatch(spark, root, cBatch(6), cSpec, 6L))
    assert(cView == cRecompute(6), "healed compaction lost or doubled rows")

    // a clean compaction: same rows, fewer files, fence untouched
    val r = MaterializedAgg.compactView(spark, root, cSpec)
    assert(r.filesAfter <= math.max(cSpec.files, 2) &&
      dataFiles() < fragmented,
      s"compaction did not shrink: ${r.filesAfter} files, was $fragmented")
    assert(cView == cRecompute(6))
    assert(MaterializedAgg.lastCommitted(spark, root).contains(6L),
      "compaction moved the fence")
    // exactly-once continues: replay no-ops, the next id merges
    assert(!MaterializedAgg.mergeBatch(spark, root, cBatch(6), cSpec, 6L))
    assert(MaterializedAgg.mergeBatch(spark, root, cBatch(7), cSpec, 7L))
    assert(cView == cRecompute(7))
  }

  test("key-cap fallback: full-view read still writes back only touched keys") {
    val root = tmp("mv-cap")
    assert(MaterializedAgg.mergeBatch(spark, root, batch(0), spec, 0L))
    // a read-key cap below the batch's distinct keys forces the pruned
    // current-row read to fall back to the FULL view — the merge must
    // still be exact and must not rewrite untouched keys
    assert(MaterializedAgg.mergeBatch(spark, root, batch(1), spec, 1L,
      maxReadKeys = 2))
    assert(view(root) == recompute(1), "cap-fallback merge drifted")
  }

  test("crash between journal publish and apply: replay skips, not re-merges") {
    val root = tmp("mv-crash")
    assert(MaterializedAgg.mergeBatch(spark, root, batch(0), spec, 0L))
    // crash in the durable-but-unapplied window of batch 1's merge
    LakeDelete.journalPublishedHook.set(() =>
      throw new RuntimeException("crash: journal published, not applied"))
    try {
      intercept[RuntimeException] {
        MaterializedAgg.mergeBatch(spark, root, batch(1), spec, 1L)
      }
    } finally LakeDelete.journalPublishedHook.set(() => ())
    // the fence still shows batch 0 — the commit is in the journal only
    assert(MaterializedAgg.lastCommitted(spark, root).contains(0L))

    // replay of batch 1: recovery applies the published journal (and its
    // fence) FIRST, so the merge is skipped — the double-count window
    assert(!MaterializedAgg.mergeBatch(spark, root, batch(1), spec, 1L))
    assert(MaterializedAgg.lastCommitted(spark, root).contains(1L))
    assert(view(root) == recompute(1), "crash-replay double-counted")
  }

  test("half bootstrap (marker, no fence) is wiped and redone") {
    val root = tmp("mv-boot")
    assert(MaterializedAgg.mergeBatch(spark, root, batch(0), spec, 0L))
    // simulate a bootstrap that crashed before its fence: remove the fence
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root, "_graft_fence.json"), false)
    // the replay wipes the ownerless data and bootstraps cleanly
    assert(MaterializedAgg.mergeBatch(spark, root, batch(0), spec, 0L))
    assert(view(root) == recompute(0), "bootstrap replay double-counted")
  }

  test("a root that is not an MV is refused, never wiped") {
    val root = tmp("mv-foreign")
    spark.range(10).write.parquet(root) // someone else's data, no marker
    intercept[IllegalArgumentException] {
      MaterializedAgg.mergeBatch(spark, root, batch(0), spec, 0L)
    }
    assert(spark.read.parquet(root).count() == 10L, "foreign data touched")
  }

  test("streaming maintenance: exactly-once across a crash-replay") {
    val root = tmp("mv-stream")
    val inDir = java.nio.file.Files
      .createTempDirectory("graft-mv-in").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-mv-ck").toString
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("h", StringType), StructField("v", LongType)))

    def writeBatch(name: String, i: Int): Unit = {
      val tmpd = java.nio.file.Files.createTempDirectory("graft-mv-b").toString
      batch(i).coalesce(1).write.mode("overwrite").parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"$name.parquet"))
      ()
    }
    def start() = MaterializedAgg.maintain(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir),
      root, spec, ckpt, interval = "0 seconds").start()

    writeBatch("b0", 0)
    val q1 = start()
    q1.processAllAvailable()
    // crash after batch 1's merge commits but before the EPOCH commits:
    // the restarted stream replays batch 1 with the same id
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    MaterializedAgg.mergeTestHook.set(() =>
      if (failOnce.getAndSet(false))
        throw new RuntimeException("crash after merge, before epoch commit"))
    writeBatch("b1", 1)
    try { q1.processAllAvailable(); q1.stop() }
    catch { case _: Throwable => () }
    assert(!q1.isActive && !failOnce.get(), "crash must have fired")

    val q2 = start()
    writeBatch("b2", 2)
    try q2.processAllAvailable() finally q2.stop()
    MaterializedAgg.mergeTestHook.set(() => ())

    assert(view(root) == recompute(2), "streamed view != recompute")
  }
}
