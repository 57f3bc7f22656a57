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

  /** Periodic lake maintenance wired into the streaming loop — the piece a
    * real streaming lake needs so it does not fragment until someone
    * remembers (the reference's own 300 s cycle is the natural cadence
    * hook, DnsRptCH.scala:1213-1219): every `every`-th non-empty batch,
    * CLOSED windows (strictly before the batch's minimum window — the open
    * window still receiving appends is never rewritten mid-growth) of each
    * table under `root` are compacted into the z-ordered manifest-covered
    * layout, and each table's root manifest is re-consolidated so planning
    * stays one driver-side read however many windows the lake grows.
    *
    * Readers stay green throughout: compaction stages under `_compacting/`
    * (invisible to every reader) and swaps atomically per partition
    * (CompactionSpec kill-injection); a crash mid-maintenance fails the
    * batch, the replay re-runs [[graft.sinks.Sinks.compactLake]], and its
    * recovery pass heals any half-swapped window (LakeMaintenanceSpec). */
  final case class LakeMaintenance(root: String, tables: Seq[String],
      colA: String, colB: String, every: Int = 8,
      filesPerPartition: Int = 4, bits: Int = 20,
      stampCol: String = "accesstime",
      sketchCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil)

  /** Wire a per-batch report function (the batch code path, reused verbatim)
    * into `foreachBatch` with a processing-time trigger. The caller starts
    * the returned writer (`.start()` / tests use MemoryStream + awaitAny).
    * `maintenance` adds the periodic compact+consolidate cycle above. */
  def reportEvery(facts: DataFrame, interval: String = "5 minutes",
                  checkpoint: String,
                  maintenance: Option[LakeMaintenance] = None)(
      report: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    // maintenance cadence counts NON-EMPTY batches (the documented
    // contract) — raw batch ids advance on empty triggers too, and a
    // source that interleaves empty triggers would drift off cadence or
    // never fire. Restart resets the counter; the cadence is best-effort.
    val nonEmpty = new java.util.concurrent.atomic.AtomicLong(0L)
    facts.writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // empty-batch skip (reference :1009-1012). Cost: isEmpty is one
        // executeTake(1) job per trigger — a single near-empty task every 5
        // minutes, paid deliberately so the report never runs (and never
        // appends sink rows) for an empty window.
        if (!batch.isEmpty) {
          report(batch, id)
          maintenance.foreach { m =>
            if (nonEmpty.incrementAndGet() % m.every == 0L) {
              val minWin = batch
                .agg(min(date_format(col(m.stampCol),
                  graft.sinks.Sinks.WinFormat)))
                .head().getString(0)
              m.tables.foreach { t =>
                graft.sinks.Sinks.compactLake(batch.sparkSession,
                  s"${m.root}/$t", m.colA, m.colB, m.filesPerPartition,
                  m.bits, onlyBefore = Option(minWin),
                  sketchCols = m.sketchCols, bloomCols = m.bloomCols,
                  sumCols = m.sumCols)
                graft.sources.ZLake.consolidateManifests(
                  batch.sparkSession, s"${m.root}/$t")
              }
            }
          }
        }
      }
  }

  /** Backfill = the same report over a bounded time range, one 5-min window
    * per group (DnsRptOffline.scala:69-73 parity without the driver loop):
    * window bucketing IS the loop, distributed. */
  def backfill(facts: DataFrame, report: DataFrame => DataFrame): DataFrame =
    report(facts)
}
