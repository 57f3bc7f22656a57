package graft.sinks

import org.apache.spark.sql.DataFrame

/** Sink layer (SURVEY §2.2).
  *
  * K1: the reference appends each report to ClickHouse through one JDBC
  * connection with 100k-row batches and no transaction isolation
  * (ClickUtils.scala:15-33). Same operating point here, expressed as
  * `DataFrameWriter` options inside `foreachBatch` — plus a parquet mode
  * for tests/local runs.
  */
object Sinks {

  /** K1: JDBC append tuned for a columnar OLAP store (batch insert, single
    * writer connection, isolation NONE — ClickUtils.scala:24-27). */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 batchSize: Int = 100000, numPartitions: Int = 1): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", "NONE")
      .option("numPartitions", numPartitions.toString)
      .jdbc(url, table, new java.util.Properties())

  /** Parquet append (test/local stand-in for K1; also the recommended lake
    * layout at scale: partition by the 5-min bucket for pruning). */
  def parquetAppend(df: DataFrame, path: String,
                    partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Lake layout for a window's report set: every sink table appends under
    * `root/<table>/win=<yyyyMMdd_HHmm>/`, the 5-minute bucket derived from
    * the window stamp BatchRunner puts on each row. Downstream window reads
    * prune to one partition at planning time — the scale replacement for
    * the reference's filename-encoded 10-second files (DnsRptCH.scala:
    * 983-1012); see LakeLayoutSpec. */
  def lakeAppend(tables: Map[String, DataFrame], root: String,
                 stampCol: String = "accesstime"): Unit =
    tables.foreach { case (name, df) =>
      parquetAppend(
        df.withColumn("win",
          org.apache.spark.sql.functions.date_format(
            org.apache.spark.sql.functions.col(stampCol), "yyyyMMdd_HHmm")),
        s"$root/$name", Seq("win"))
    }

  /** Idempotent lake write for exactly-once streaming: same layout as
    * [[lakeAppend]], but the window stamp is the idempotency key — dynamic
    * partition overwrite replaces ONLY the `win=` partitions present in the
    * incoming data, so a foreachBatch epoch replayed after a crash (sink
    * written, commit log not) converges to one copy per window instead of
    * appending a duplicate. Different windows' partitions are untouched.
    * Exercised under an injected crash in StreamingBatchRunnerSpec. */
  def lakeWrite(tables: Map[String, DataFrame], root: String,
                stampCol: String = "accesstime"): Unit =
    tables.foreach { case (name, df) =>
      df.withColumn("win",
          org.apache.spark.sql.functions.date_format(
            org.apache.spark.sql.functions.col(stampCol), "yyyyMMdd_HHmm"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("win")
        .parquet(s"$root/$name")
    }

  /** Co-located lake layout for repeated fact/fact joins at scale: bucket +
    * sort both tables by the join key (same bucket count) and joins plan
    * WITHOUT a shuffle exchange on either side (see BucketedJoinSpec). */
  def bucketedTable(df: DataFrame, table: String, path: String,
                    buckets: Int, keys: String*): Unit =
    df.write.mode("overwrite").option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Z-order-clustered lake layout: range-partition and sort the table by
    * the Morton interleave of two filter columns, so EVERY output file (and
    * row group) carries a tight min/max envelope on BOTH columns — parquet
    * row-group skipping and file-level stats pruning then work for
    * predicates on either column, which a single-column sort gives to only
    * one of them. The interleave is a pure codegen'd expression
    * ([[graft.functions.KernelExprs.ZOrder2]]); the write is one range
    * exchange — the layout cost is paid once, every later scan benefits.
    * Clustering tightness is measured (not assumed) in ZOrderLayoutSpec;
    * the read-side skipping it buys is asserted in ZOrderPruneSpec via
    * [[graft.sources.ZLake]]. `writerOptions` pass through to the parquet
    * writer (e.g. `parquet.block.size` to bound row-group size so skipping
    * works at sub-file granularity too). */
  def zorderedWrite(df: DataFrame, colA: String, colB: String,
                    path: String, numFiles: Int, bits: Int = 20,
                    writerOptions: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.functions.col
    val z = graft.functions.KernelExprs.zorder2(
      col(colA).cast("long"), col(colB).cast("long"), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").options(writerOptions).parquet(path)
  }

  /** K2: middle-data text save — ``-separated, `numFiles` output files
    * (reference coalesce(12).saveAsTextFile, DnsRptCH.scala:131-139). */
  def middleData(df: DataFrame, path: String, numFiles: Int = 12): Unit =
    df.coalesce(numFiles).write.mode("overwrite")
      .option("sep", "").csv(path)
}
