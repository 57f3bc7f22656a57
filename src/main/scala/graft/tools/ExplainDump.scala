package graft.tools

import graft.{GraftSession, Queries}

/** Dump `.explain("formatted")` for the named queries to
  * `<outDir>/<query><suffix>.txt` — the plans/r16 evidence files the
  * optimization rounds commit (judge checks plan claims against these).
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...>
  * Reads SPARK_GRAFT_SF_DIR (default sf0.1) like Bench. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = Queries.byName(n).fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$n$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explain] wrote $outDir/$n$suffix.txt")
    }
    spark.stop()
  }
}
