package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KernelAggs

/** The native sketch aggregates under Structured Streaming: HLL registers
  * and CMS cells accumulate across micro-batches through the state store
  * (TypedImperativeAggregate buffer serialization), and the streamed result
  * equals the batch sketch of the same rows — the per-window partials the
  * lake stores (q80's re-aggregation input) can be produced by a live query
  * rather than a batch sweep. */
class StreamingSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("streaming windowed HLL/CMS equals the batch sketch of the union") {
    implicit val sqlCtx = spark.sqlContext
    val m = 16; val d = 2; val w = 16
    // (userId, tsSec) — two 60s windows, fed across three micro-batches
    val rows = (0 until 300).map(i => (i.toLong % 37, (i % 2) * 60L + i % 50))
    val mem = MemoryStream[(Long, Long)]
    val name = s"sksk_${System.nanoTime()}"
    val q = mem.toDS().toDF("userId", "tsSec")
      .withColumn("eventTime", timestamp_seconds(col("tsSec")))
      .groupBy(window(col("eventTime"), "60 seconds").as("win"))
      .agg(KernelAggs.hll_registers(col("userId").cast("string"), m).as("regs"),
        KernelAggs.cms_sketch((col("userId") % 7).cast("string"), d, w).as("cells"))
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
    try {
      rows.grouped(110).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table(name)
        .select(col("win.start").cast("long").as("ws"), col("regs"), col("cells"))
        .as[(Long, Seq[Long], Seq[Long])].collect().sortBy(_._1)
      val batch = rows.toDF("userId", "tsSec")
        .withColumn("ws", expr("tsSec div 60 * 60"))
        .groupBy(col("ws"))
        .agg(KernelAggs.hll_registers(col("userId").cast("string"), m).as("regs"),
          KernelAggs.cms_sketch((col("userId") % 7).cast("string"), d, w).as("cells"))
        .as[(Long, Seq[Long], Seq[Long])].collect().sortBy(_._1)
      assert(streamed.length == 2)
      assert(streamed.toSeq == batch.toSeq,
        "streamed sketch state diverged from the batch sketch")
    } finally q.stop()
  }

  test("streaming KMV and bottom-k state equal the batch sketches") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 500).map(i => (s"key_${i % 211}", (i * 13 % 997).toDouble))
    val mem = MemoryStream[(String, Double)]
    val name = s"skkm_${System.nanoTime()}"
    def aggs(df: org.apache.spark.sql.DataFrame) = df
      .agg(KernelAggs.kmv_sketch(col("k"), 32).as("kmv"),
        KernelAggs.bottomk_sample(col("k"), col("v"), 16).as("bk"))
    val q = aggs(mem.toDS().toDF("k", "v"))
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
    try {
      rows.grouped(170).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table(name)
        .select(col("kmv"), col("bk"))
        .as[(Seq[Long], Seq[Double])].head()
      val batch = aggs(rows.toDF("k", "v"))
        .as[(Seq[Long], Seq[Double])].head()
      assert(streamed == batch,
        "streamed KMV/bottom-k state diverged from the batch sketches")
    } finally q.stop()
  }

  test("streaming bloom state equals the batch sketch and admits no false negatives") {
    implicit val sqlCtx = spark.sqlContext
    val keys = (0 until 400).map(i => s"k_${i % 151}") // duplicates across batches
    val mem = MemoryStream[String]
    val name = s"skbl_${System.nanoTime()}"
    val q = mem.toDS().toDF("k")
      .agg(KernelAggs.bloom_sketch(col("k"), 2048, 3).as("bloom"))
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
    try {
      keys.grouped(130).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table(name).select(col("bloom"))
        .as[Seq[Long]].head()
      val batch = keys.toDF("k")
        .agg(KernelAggs.bloom_sketch(col("k"), 2048, 3).as("bloom"))
        .as[Seq[Long]].head()
      assert(streamed == batch,
        "streamed bloom state diverged from the batch sketch")
      // every streamed-in key probes true against the streamed state
      val bloomDf = spark.table(name)
      val misses = keys.distinct.toDF("k").crossJoin(broadcast(bloomDf))
        .filter(!graft.functions.KernelExprs.bloom_contains(col("bloom"), col("k"), 3))
        .count()
      assert(misses == 0)
    } finally q.stop()
  }

  test("streaming windowed digit-hist equals batch; quantiles serve live") {
    implicit val sqlCtx = spark.sqlContext
    // heavy-tailed latencies across two 60s windows, three micro-batches
    val rows = (0 until 600).map(i =>
      ((i.toLong * i * 7) % 99991, (i % 2) * 60L + i % 55))
    val mem = MemoryStream[(Long, Long)]
    val name = s"skdh_${System.nanoTime()}"
    def render(h: org.apache.spark.sql.Column) =
      transform(h, x => concat_ws(":", x("lb"), x("n")))
    val q = mem.toDS().toDF("v", "tsSec")
      .withColumn("eventTime", timestamp_seconds(col("tsSec")))
      .groupBy(window(col("eventTime"), "60 seconds").as("win"))
      .agg(KernelAggs.digit_hist(col("v"), 2).as("h"))
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
    try {
      rows.grouped(230).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table(name)
        .select(col("win.start").cast("long").as("ws"),
          render(col("h")).as("h"),
          graft.functions.KernelExprs.digit_quantile(col("h"), 0.95).as("p95"))
        .as[(Long, Seq[String], Long)].collect().sortBy(_._1)
      val batch = rows.toDF("v", "tsSec")
        .withColumn("ws", expr("tsSec div 60 * 60"))
        .groupBy(col("ws"))
        .agg(KernelAggs.digit_hist(col("v"), 2).as("h"))
        .select(col("ws"), render(col("h")).as("h"),
          graft.functions.KernelExprs.digit_quantile(col("h"), 0.95).as("p95"))
        .as[(Long, Seq[String], Long)].collect().sortBy(_._1)
      assert(streamed.length == 2)
      assert(streamed.toSeq == batch.toSeq,
        "streamed digit-hist state diverged from the batch sketch")
      // the live per-window sketches roll up to the exact global sketch
      val global = spark.table(name)
        .groupBy().agg(KernelAggs.digit_hist_merge(col("h")).as("h"))
        .select(render(col("h"))).as[Seq[String]].head()
      val globalBatch = rows.toDF("v", "tsSec")
        .agg(KernelAggs.digit_hist(col("v"), 2).as("h"))
        .select(render(col("h"))).as[Seq[String]].head()
      assert(global == globalBatch,
        "window partials must merge to the exact global histogram")
    } finally q.stop()
  }
}
