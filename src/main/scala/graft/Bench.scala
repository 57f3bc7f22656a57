package graft

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json).
  *
  * Methodology (VERDICT r2 #2/#6, hardened again after BENCH_r04 — make the
  * numbers trustworthy on a noisy host):
  *  - per-query WARM-UP run excluded from timing (first execution pays
  *    5-8 s of JIT + codegen that is not the query's cost);
  *  - timed runs are interleaved ROUND-ROBIN (pass 1 of every query, then
  *    pass 2, then pass 3) instead of back-to-back per query: BENCH_r04
  *    billed q45/q77/q78 at 23/18/48 s — all three sub-second warm on a
  *    quiet host — because a degraded host window swallowed every
  *    consecutive run of whichever queries were scheduled inside it.
  *    Round-robin spreads each query's runs across the whole bench window,
  *    so best-of-3 survives a transient stall;
  *  - every run records wall time AND JVM process-CPU time (`runs` /
  *    `cpu` arrays): cpu ≪ wall on a run means the clock was stolen by the
  *    host, not burned by the engine — the artifact now carries its own
  *    noise diagnosis;
  *  - q68's input synthesis (a to_json round-trip that exists only in the
  *    bench) is materialized to parquet ONCE and billed to `fixtures`,
  *    not to the engine: `q68_pipeline` times raw-lines-parquet → parse →
  *    clean → enrich → reports only;
  *  - a query that throws is reported null and excluded from the total,
  *    never as a fast "success".
  */
object Bench {

  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  /** (wall sec, process-cpu sec, failed) for one execution. */
  private def time(body: => Unit): (Double, Double, Boolean) = {
    val c0 = osBean.getProcessCpuTime
    val t0 = System.nanoTime()
    val ok = try { body; true } catch { case _: Throwable => false }
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = (osBean.getProcessCpuTime - c0) / 1e9
    (wall, cpu, !ok)
  }

  private final class Timed(val name: String, body0: => Unit, val fixture: Boolean = false) {
    private def body: Unit = body0
    val wall = collection.mutable.ArrayBuffer[Double]()
    val cpu = collection.mutable.ArrayBuffer[Double]()
    var failed = false
    def warmUp(): Unit = { failed ||= time(body)._3 } // JIT + codegen, not billed
    def run(): Unit = {
      val (w, c, f) = time(body)
      wall += w; cpu += c; failed ||= f
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // session warm-up

    val engineNames = Queries.benchNames.filterNot(_ == "q68_batch_window_trend")
    val rawPath = java.nio.file.Files.createTempDirectory("graft-bench-raw")
      .resolve("raw").toString
    val timed: Seq[Timed] =
      engineNames.map(n => new Timed(n, Queries.byName(n).fn(spark, sfDir).count())) ++ Seq(
        new Timed("q68_synth", QueriesDns.synthesizeRawWindow(spark, sfDir, rawPath),
          fixture = true),
        new Timed("q68_pipeline", QueriesDns.runWindowFromRaw(spark, rawPath)),
        // the same window through Structured Streaming (file source +
        // AvailableNow + foreachBatch): the delta vs q68_pipeline is the
        // streaming machinery's own cost
        new Timed("q68_stream", QueriesDns.runWindowStreaming(spark, rawPath)))

    // q68_synth must be warmed before q68_pipeline can run at all, and the
    // round-robin passes keep that order too (synth is listed first).
    timed.foreach(_.warmUp())
    (1 to passes).foreach(_ => timed.foreach(_.run()))

    val results = timed.filterNot(_.fixture)
    val fixtures = timed.filter(_.fixture)
    def jnum(d: Double): String =
      "%.4f".formatLocal(java.util.Locale.ROOT, d) // '.' decimal regardless of locale
    def entries(rs: Seq[Timed]): String =
      rs.map { t =>
        "\"" + t.name + "\":" + (if (t.failed) "null" else jnum(t.wall.min))
      }.mkString(",")
    def arrays(f: Timed => Seq[Double]): String =
      timed.map(t => "\"" + t.name + "\":" + f(t).map(jnum).mkString("[", ",", "]"))
        .mkString("{", ",", "}")
    val failedArr = timed.collect { case t if t.failed => "\"" + t.name + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case t if !t.failed => t.wall.min }.sum
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":{${entries(results)}},"fixtures":{${entries(fixtures)}},"runs":${arrays(_.wall.toSeq)},"cpu":${arrays(_.cpu.toSeq)},"failed":$failedArr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
