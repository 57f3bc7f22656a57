package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, QueriesDns}

/** Decompose the q68 window pipeline's cost (optimization guide §1):
  * times each prefix of the parse → clean → enrich → persist → trend
  * chain against the noop sink, best-of-N warm, so the expensive stage is
  * measured rather than guessed. Reads SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS like Bench; prints one line per stage. */
object ProfileDns {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = java.nio.file.Files.createTempDirectory("graft-prof-raw")
      .resolve("raw").toString
    QueriesDns.synthesizeRawWindow(spark, sfDir, raw)
    val lines = spark.read.parquet(raw)
    val dims = QueriesDns.profileDims(spark)
    val t0ms = 1616631000000L

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(body: => Unit): Unit = {
      body // warm-up
      val runs = (1 to reps).map { _ =>
        val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
      }
      println(f"[profile] $name%-28s best ${runs.min}%6.3f s  runs ${runs.map(r => f"$r%.3f").mkString(", ")}")
    }

    time("raw_scan")(noop(lines))
    time("parse")(noop(graft.dns.Ingest.parse(lines)))
    time("clean")(noop(graft.dns.Ingest.clean(spark, lines, t0ms).toDF()))
    val cleaned = graft.dns.Ingest.clean(spark, lines, t0ms).toDF()
      .withColumn("authorityDomain",
        graft.functions.Functions.authority_domain(col("domain")))
    time("clean+authdom")(noop(cleaned))
    val enriched = graft.dns.Dims.enrichAuthDomain(
      graft.dns.Dims.enrichInNetIndexed(spark,
        graft.dns.Dims.enrichClientName(cleaned, dims.clientRules),
        dims.mediaRules, dims.businessRules),
      dims.authDomains)
    time("clean+enrich")(noop(enriched))
    time("enrich+persist+trend") {
      val rs = graft.dns.BatchRunner.run(spark, lines, dims, t0ms,
        trendThreshold = 10L)
      try rs.trend.count() finally rs.unpersist()
    }
    time("enrich+persist+ALL6") {
      val rs = graft.dns.BatchRunner.run(spark, lines, dims, t0ms,
        trendThreshold = 10L)
      try rs.all.values.foreach(noop) finally rs.unpersist()
    }
    spark.stop()
  }
}
