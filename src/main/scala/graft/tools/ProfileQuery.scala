package graft.tools

import graft.{GraftSession, Queries}

/** Time one named query N times on SPARK_GRAFT_SF_DIR — separates steady
  * state from the first run's JIT/codegen cost (see BENCH_NOTES.md). */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Queries.byName(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = q.fn(spark, sfDir).count()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
