package graft

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json).
  *
  * Methodology (VERDICT r2 #2/#6 — make the numbers trustworthy on a noisy
  * host):
  *  - per-query WARM-UP run excluded from timing (first execution pays
  *    5-8 s of JIT + codegen that is not the query's cost), then three
  *    timed runs; the reported number is the minimum;
  *  - every individual run time is recorded in `runs` so drift between
  *    runs — this VM's wall clock swings several-fold — is visible in the
  *    artifact instead of silently folded into one number;
  *  - q68's input synthesis (a to_json round-trip that exists only in the
  *    bench) is materialized to parquet ONCE and billed to `fixtures`,
  *    not to the engine: `q68_pipeline` times raw-lines-parquet → parse →
  *    clean → enrich → reports only.
  *  - a query that throws is reported null and excluded from the total,
  *    never as a fast "success".
  */
object Bench {

  private def time(body: => Unit): (Double, Boolean) = {
    val t0 = System.nanoTime()
    val ok = try { body; true } catch { case _: Throwable => false }
    ((System.nanoTime() - t0) / 1e9, !ok)
  }

  /** One untimed warm-up + `runs` timed executions. */
  private def bench(runs: Int)(body: => Unit): (Seq[Double], Boolean) = {
    var failed = time(body)._2 // warm-up: JIT + codegen, not billed
    val times = (1 to runs).map { _ =>
      val (t, f) = time(body)
      failed ||= f
      t
    }
    (times, failed)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // session warm-up

    val engineNames = Queries.benchNames.filterNot(_ == "q68_batch_window_trend")
    val engine: Seq[(String, Seq[Double], Boolean)] = engineNames.map { name =>
      val (times, failed) = bench(3)(Queries.byName(name).fn(spark, sfDir).count())
      (name, times, failed)
    }

    // q68 split: synthesis (fixture) vs the window pipeline (engine)
    val rawPath = java.nio.file.Files.createTempDirectory("graft-bench-raw")
      .resolve("raw").toString
    val (synthTimes, synthFailed) =
      bench(3)(QueriesDns.synthesizeRawWindow(spark, sfDir, rawPath))
    val (pipeTimes, pipeFailed) =
      bench(3)(QueriesDns.runWindowFromRaw(spark, rawPath))
    val fixtures = Seq(("q68_synth", synthTimes, synthFailed))
    val results = engine :+ ("q68_pipeline", pipeTimes, pipeFailed)

    def jnum(d: Double): String =
      "%.4f".formatLocal(java.util.Locale.ROOT, d) // '.' decimal regardless of locale
    def entries(rs: Seq[(String, Seq[Double], Boolean)]): String =
      rs.map { case (k, ts, f) =>
        "\"" + k + "\":" + (if (f) "null" else jnum(ts.min))
      }.mkString(",")
    val runsJson = (results ++ fixtures).map { case (k, ts, _) =>
      "\"" + k + "\":" + ts.map(jnum).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failedArr = (results ++ fixtures).collect { case (k, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, ts, false) => ts.min }.sum
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":{${entries(results)}},"fixtures":{${entries(fixtures)}},"runs":$runsJson,"failed":$failedArr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
