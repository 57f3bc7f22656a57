package graft

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One warm-up action so JVM/codegen startup isn't billed to the first query.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // Best-of-3 per query: this host's wall clock is noisy (identical queries
    // swing several-fold run to run) and the FIRST execution of a query pays
    // JIT + codegen compilation (profiled: q35 9.9s cold vs 1.3s warm —
    // BENCH_NOTES.md); the minimum of three is the stable estimator.
    // A query that throws is reported as null (and excluded from the total),
    // never as a fast "success" time.
    val results = Queries.benchNames.map { name =>
      var failed = false
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { Queries.byName(name).fn(spark, sfDir).count() }
        catch { case _: Throwable => failed = true }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min, failed)
    }
    val qs = results.map { case (k, v, f) => "\"" + k + "\":" + (if (f) "null" else v.toString) }
      .mkString("{", ",", "}")
    val failedArr = results.collect { case (k, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, false) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedArr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
