package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming orchestration (SURVEY §2.10).
  *
  * The reference abuses a DStream on an empty HDFS dir as a 300-second clock
  * (DnsRptCH.scala:1213-1219) and re-reads files named for the lagging 5-min
  * window. Spark-native: one Structured Streaming file source discovers
  * files itself, a watermark bounds lateness, and the SAME batch report
  * functions run inside `foreachBatch` — one code path for streaming,
  * backfill (DnsRptOffline parity) and tests. Checkpointing upgrades the
  * reference's at-most-once (skipped batches, swallowed failures,
  * DnsRptCH.scala:1146-1161) to exactly-once file tracking for free.
  */
object StreamRunner {

  /** Streaming text-line source over a log directory. */
  def rawStream(spark: SparkSession, path: String,
                maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(path).toDF("value")

  /** 5-minute tumbling event-time window counts with 5-minute lateness —
    * the reference's window/lag geometry (DnsRptCH.scala:988-994, 888). */
  def windowedCounts(facts: DataFrame,
                     windowDur: String = "5 minutes",
                     watermarkDelay: String = "5 minutes"): DataFrame =
    facts.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("clientName"))
      .agg(count(lit(1)).as("sampleNum"), sum(col("error")).as("errorNum"))

  /** Wire a per-batch report function (the batch code path, reused verbatim)
    * into `foreachBatch` with a processing-time trigger. The caller starts
    * the returned writer (`.start()` / tests use MemoryStream + awaitAny). */
  def reportEvery(facts: DataFrame, interval: String = "5 minutes",
                  checkpoint: String)(
      report: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    facts.writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // empty-batch skip (reference :1009-1012). Cost: isEmpty is one
        // executeTake(1) job per trigger — a single near-empty task every 5
        // minutes, paid deliberately so the report never runs (and never
        // appends sink rows) for an empty window.
        if (!batch.isEmpty) report(batch, id)
      }

  /** Backfill = the same report over a bounded time range, one 5-min window
    * per group (DnsRptOffline.scala:69-73 parity without the driver loop):
    * window bucketing IS the loop, distributed. */
  def backfill(facts: DataFrame, report: DataFrame => DataFrame): DataFrame =
    report(facts)
}
